"""Eval-path consistency: mesh-sharded eval == single-device eval, and the
Resize3D scale_hw un-scaling through KITTI conversion."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_sharded_eval_matches_single_device(rng):
    from monocon_tpu.models import create_detector_state
    from monocon_tpu.ops.decode import decode_predictions
    from monocon_tpu.parallel import make_mesh, shard_batch
    from monocon_tpu.data.synthetic import DEFAULT_P2

    pad_hw = (64, 96)
    model, variables = create_detector_state(
        jax.random.PRNGKey(0), image_hw=pad_hw
    )

    @jax.jit
    def fwd(v, im, p2):
        return decode_predictions(model.apply(v, im, train=False), p2, pad_hw)

    b = 8
    img = jnp.asarray(rng.normal(size=(b, *pad_hw, 3)).astype(np.float32))
    p2 = jnp.asarray(np.tile(DEFAULT_P2[None], (b, 1, 1)))

    single = fwd(variables, img, p2)

    mesh = make_mesh(8)
    sharded_in = shard_batch({"img": img, "p2": p2}, mesh)
    with mesh:
        sharded = fwd(variables, sharded_in["img"], sharded_in["p2"])

    for k in single:
        np.testing.assert_allclose(
            np.asarray(single[k]), np.asarray(sharded[k]),
            rtol=1e-5, atol=1e-5, err_msg=k,
        )


def test_scale_hw_unscaling_in_kitti_conversion():
    from monocon_tpu.utils.convert import convert_to_kitti_2d

    det = {
        "bboxes_2d": np.array([[50.0, 20.0, 150.0, 80.0, 0.9]]),
        "bboxes_3d": np.zeros((1, 7)),
        "labels": np.array([2]),
        "scores": np.array([0.9]),
    }
    metas = {
        "sample_idx": [7],
        "ori_shape": [(192, 640)],
        # Resize3D halved the image: eval boxes must be scaled back x2.
        "scale_hw": [(0.5, 0.5)],
    }
    annos = convert_to_kitti_2d([det], metas)
    np.testing.assert_allclose(annos[0]["bbox"][0], [100, 40, 300, 160])
    # without scale_hw: unchanged
    annos2 = convert_to_kitti_2d([det], {k: v for k, v in metas.items()
                                         if k != "scale_hw"})
    np.testing.assert_allclose(annos2[0]["bbox"][0], [50, 20, 150, 80])
