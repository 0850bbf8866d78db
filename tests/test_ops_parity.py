"""Golden parity: vectorized JAX ops vs the reference torch implementations
(target generation, decode primitives, losses)."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, REFERENCE)
    try:
        import torch  # noqa
        from utils.target_generator import TargetGenerator  # noqa
        from utils import tensor_ops  # noqa
        import losses as ref_losses  # noqa
    finally:
        sys.path.pop(0)
    return {
        "TargetGenerator": TargetGenerator,
        "tensor_ops": tensor_ops,
        "losses": ref_losses,
    }


def random_label_batch(rng, b=2, o=30, feat_hw=(24, 80), pad_hw=(96, 320),
                       num_valid=(3, 7)):
    """Random fixed-shape label dict with *prefix* masks (so the reference's
    compaction is the identity and slot-wise comparison is valid)."""
    pad_h, pad_w = pad_hw
    label = {
        "gt_bboxes": np.zeros((b, o, 4), np.float32),
        "gt_labels": np.zeros((b, o), np.float32),
        "gt_bboxes_3d": np.zeros((b, o, 7), np.float32),
        "depths": np.zeros((b, o), np.float32),
        "gt_kpts_2d": np.zeros((b, o, 18), np.float32),
        "gt_kpts_valid_mask": np.zeros((b, o, 9), np.float32),
        "mask": np.zeros((b, o), np.float32),
    }
    for bi in range(b):
        n = int(rng.integers(*num_valid))
        for oi in range(n):
            x1 = rng.uniform(0, pad_w - 40)
            y1 = rng.uniform(0, pad_h - 30)
            w = rng.uniform(12, 120)
            h = rng.uniform(10, 60)
            label["gt_bboxes"][bi, oi] = [x1, y1, min(x1 + w, pad_w), min(y1 + h, pad_h)]
            label["gt_labels"][bi, oi] = rng.integers(0, 3)
            dims = rng.uniform(0.5, 4.0, 3)
            alpha = rng.uniform(-np.pi, np.pi)
            label["gt_bboxes_3d"][bi, oi] = [*rng.normal(0, 5, 2), rng.uniform(5, 60),
                                             *dims, alpha]
            label["depths"][bi, oi] = rng.uniform(2, 65)
            # keypoints roughly around the box, some outside the image
            cx, cy = (x1 + w / 2), (y1 + h / 2)
            kpts = np.stack(
                [rng.normal(cx, w, 9), rng.normal(cy, h, 9)], axis=-1
            )
            label["gt_kpts_2d"][bi, oi] = kpts.reshape(-1)
            label["gt_kpts_valid_mask"][bi, oi] = rng.choice(
                [0, 1, 2], size=9, p=[0.2, 0.1, 0.7]
            )
            label["mask"][bi, oi] = 1
    return label


def to_torch_input(label, pad_hw, feat_hw, b):
    import torch

    img = torch.zeros((b, 3, pad_hw[0], pad_hw[1]))
    t_label = {k: torch.from_numpy(v.copy()) for k, v in label.items()}
    return {
        "img": img,
        "img_metas": {"pad_shape": [pad_hw] * b},
        "label": t_label,
    }


def test_target_generation_parity(ref, rng):
    from monocon_tpu.ops import generate_targets

    b, o = 3, 30
    feat_hw, pad_hw = (24, 80), (96, 320)
    label = random_label_batch(rng, b=b, o=o, feat_hw=feat_hw, pad_hw=pad_hw)

    tg = ref["TargetGenerator"](num_classes=3, max_objs=o, num_kpt=9, num_alpha_bins=12)
    ref_t = tg(to_torch_input(label, pad_hw, feat_hw, b),
               feat_shape=(b, 64, *feat_hw))

    ours = generate_targets(
        {k: jnp.asarray(v) for k, v in label.items()}, feat_hw, pad_hw
    )

    # Heatmaps: ours NHWC -> compare against reference NCHW.
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours["center_heatmap_target"]), (0, 3, 1, 2)),
        ref_t["center_heatmap_target"].numpy(),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours["kpt_heatmap_target"]), (0, 3, 1, 2)),
        ref_t["kpt_heatmap_target"].numpy(),
        rtol=1e-5, atol=1e-6,
    )

    for key in [
        "wh_target", "offset_target", "dim_target", "depth_target",
        "center2kpt_offset_target", "kpt_heatmap_offset_target",
        "alpha_offset_target", "mask_center2kpt_offset",
        "mask_kpt_heatmap_offset",
    ]:
        np.testing.assert_allclose(
            np.asarray(ours[key]), ref_t[key].numpy(), rtol=1e-4, atol=1e-5,
            err_msg=key,
        )
    np.testing.assert_array_equal(
        np.asarray(ours["alpha_cls_target"]).astype(np.int64),
        ref_t["alpha_cls_target"].numpy().astype(np.int64),
    )
    np.testing.assert_array_equal(
        np.asarray(ours["indices"]), ref_t["indices"].numpy()
    )
    np.testing.assert_array_equal(
        np.asarray(ours["indices_kpt"]), ref_t["indices_kpt"].numpy()
    )
    np.testing.assert_array_equal(
        np.asarray(ours["mask_target"]), ref_t["mask_target"].numpy()
    )


def test_local_maximum_and_topk_parity(ref, rng):
    import torch

    from monocon_tpu.ops import gather_feature, local_maximum, topk_from_heatmap

    b, c, h, w = 2, 3, 24, 80
    heat = rng.random((b, c, h, w)).astype(np.float32)

    ref_keep = ref["tensor_ops"].get_local_maximum(torch.from_numpy(heat), kernel=3)
    ours_keep = local_maximum(jnp.asarray(np.transpose(heat, (0, 2, 3, 1))))
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours_keep), (0, 3, 1, 2)), ref_keep.numpy(),
        rtol=1e-6,
    )

    k = 20
    ref_scores, ref_inds, ref_cls, ref_ys, ref_xs = ref["tensor_ops"].get_topk_from_heatmap(
        ref_keep, k=k
    )
    scores, inds, cls_, ys, xs = topk_from_heatmap(ours_keep, k=k)

    # Values must match; ordering may differ on exact ties (random floats
    # have none). Compare as sorted tuples of (score, cls, y, x).
    ours_set = sorted(
        zip(np.asarray(scores).reshape(-1).tolist(),
            np.asarray(cls_).reshape(-1).tolist(),
            np.asarray(ys).reshape(-1).tolist(),
            np.asarray(xs).reshape(-1).tolist())
    )
    ref_set = sorted(
        zip(ref_scores.reshape(-1).tolist(), ref_cls.reshape(-1).tolist(),
            ref_ys.reshape(-1).tolist(), ref_xs.reshape(-1).tolist())
    )
    for a, b_ in zip(ours_set, ref_set):
        assert a[0] == pytest.approx(b_[0], rel=1e-6)
        assert a[1:] == b_[1:]

    # Gather parity at the same spatial indices.
    feat = rng.random((b, 16, h, w)).astype(np.float32)
    ref_gather = ref["tensor_ops"].transpose_and_gather_feat(
        torch.from_numpy(feat), ref_inds
    )
    ours_gather = gather_feature(
        jnp.asarray(np.transpose(feat, (0, 2, 3, 1))), jnp.asarray(ref_inds.numpy())
    )
    np.testing.assert_allclose(np.asarray(ours_gather), ref_gather.numpy(), rtol=1e-6)


def test_losses_parity(ref, rng):
    import torch

    from monocon_tpu.losses import (
        dim_aware_l1_loss,
        gaussian_focal_loss,
        laplacian_aleatoric_uncertainty_loss,
        masked_binary_cross_entropy,
        masked_l1_loss,
    )

    # Gaussian focal on a synthetic heatmap with exact-1 peaks.
    target = rng.random((2, 3, 24, 80)).astype(np.float32) ** 4
    target[0, 1, 5, 7] = 1.0
    target[1, 2, 10, 30] = 1.0
    pred = np.clip(rng.random((2, 3, 24, 80)).astype(np.float32), 1e-4, 1 - 1e-4)

    ref_loss = ref["losses"].GaussianFocalLoss(loss_weight=1.0)(
        torch.from_numpy(pred), torch.from_numpy(target)
    )
    ours = gaussian_focal_loss(jnp.asarray(pred), jnp.asarray(target))
    assert float(ours) == pytest.approx(float(ref_loss), rel=1e-5)

    # Masked L1 == reference L1 on the filtered rows.
    m = rng.random((4, 30)) < 0.3
    a = rng.normal(size=(4, 30, 2)).astype(np.float32)
    t = rng.normal(size=(4, 30, 2)).astype(np.float32)
    t[~m] = 0
    ref_l1 = ref["losses"].L1Loss(loss_weight=1.0)(
        torch.from_numpy(a[m]), torch.from_numpy(t[m])
    )
    ours_l1 = masked_l1_loss(jnp.asarray(a), jnp.asarray(t), jnp.asarray(m[..., None]))
    assert float(ours_l1) == pytest.approx(float(ref_l1), rel=1e-5)

    # Dim-aware L1.
    d = np.abs(rng.normal(size=(4, 30, 3)).astype(np.float32)) + 0.5
    t3 = np.abs(rng.normal(size=(4, 30, 3)).astype(np.float32)) + 0.5
    ref_dim = ref["losses"].DimAwareL1Loss(loss_weight=1.0)(
        torch.from_numpy(d[m]), torch.from_numpy(t3[m]), torch.from_numpy(d[m])
    )
    ours_dim = dim_aware_l1_loss(
        jnp.asarray(d), jnp.asarray(t3), jnp.asarray(d), jnp.asarray(m[..., None])
    )
    assert float(ours_dim) == pytest.approx(float(ref_dim), rel=1e-5)

    # Laplacian depth loss.
    dp = rng.normal(size=(4, 30, 1)).astype(np.float32)
    dt = rng.normal(size=(4, 30, 1)).astype(np.float32)
    lv = rng.normal(size=(4, 30, 1)).astype(np.float32)
    ref_dep = ref["losses"].LaplacianAleatoricUncertaintyLoss(loss_weight=1.0)(
        torch.from_numpy(dp[m]), torch.from_numpy(dt[m]), torch.from_numpy(lv[m])
    )
    ours_dep = laplacian_aleatoric_uncertainty_loss(
        jnp.asarray(dp), jnp.asarray(dt), jnp.asarray(lv), jnp.asarray(m[..., None])
    )
    assert float(ours_dep) == pytest.approx(float(ref_dep), rel=1e-5)

    # Sigmoid BCE vs reference CrossEntropyLoss(use_sigmoid=True).
    logits = rng.normal(size=(4, 30, 12)).astype(np.float32)
    onehot = np.eye(12, dtype=np.float32)[rng.integers(0, 12, size=(4, 30))]
    ref_bce = ref["losses"].CrossEntropyLoss(use_sigmoid=True, loss_weight=1.0)(
        torch.from_numpy(logits[m]), torch.from_numpy(onehot[m])
    )
    ours_bce = masked_binary_cross_entropy(
        jnp.asarray(logits), jnp.asarray(onehot), jnp.asarray(m[..., None])
    )
    assert float(ours_bce) == pytest.approx(float(ref_bce), rel=1e-5)


def test_angle_class_roundtrip():
    from monocon_tpu.ops import angle_to_class, class_to_angle

    alphas = jnp.asarray(np.linspace(-np.pi + 1e-3, np.pi - 1e-3, 101, dtype=np.float32))
    cls, res = angle_to_class(alphas)
    back = class_to_angle(cls, res)
    np.testing.assert_allclose(np.asarray(back), np.asarray(alphas), atol=1e-5)
