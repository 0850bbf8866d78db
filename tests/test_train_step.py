"""Training objective parity (vs reference _get_losses) and train-step
mechanics (optimizer schedules, state updates)."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_ops_parity import random_label_batch, to_torch_input

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref_heads():
    sys.path.insert(0, REFERENCE)
    try:
        import torch  # noqa

        torch.manual_seed(0)
        from model.dense_heads.monocon_heads import MonoConDenseHeads
    finally:
        sys.path.pop(0)
    heads = MonoConDenseHeads(in_ch=64)
    heads.eval()
    return heads


def test_loss_parity(ref_heads, rng):
    import torch

    from monocon_tpu.engine import compute_losses
    from monocon_tpu.ops import generate_targets

    b, o = 2, 30
    feat_hw, pad_hw = (24, 80), (96, 320)
    label = random_label_batch(rng, b=b, o=o, feat_hw=feat_hw, pad_hw=pad_hw)

    # Random "predictions" in NHWC / NCHW mirrors.
    shapes = {
        "center_heatmap_pred": 3,
        "kpt_heatmap_pred": 9,
        "wh_pred": 2,
        "offset_pred": 2,
        "kpt_heatmap_offset_pred": 2,
        "center2kpt_offset_pred": 18,
        "dim_pred": 3,
        "depth_pred": 2,
        "alpha_cls_pred": 12,
        "alpha_offset_pred": 12,
    }
    pred_nhwc, pred_nchw = {}, {}
    for k, c in shapes.items():
        arr = rng.normal(size=(b, *feat_hw, c)).astype(np.float32)
        if "heatmap_pred" in k and "offset" not in k:
            arr = np.clip(1 / (1 + np.exp(-arr)), 1e-4, 1 - 1e-4)
        if k == "depth_pred":
            arr[..., 0] = np.abs(arr[..., 0]) * 20
        pred_nhwc[k] = jnp.asarray(arr)
        pred_nchw[k] = torch.from_numpy(np.transpose(arr, (0, 3, 1, 2)).copy())

    target = generate_targets(
        {k: jnp.asarray(v) for k, v in label.items()}, feat_hw, pad_hw
    )
    ours = compute_losses(pred_nhwc, target)

    ref_target = ref_heads.target_generator(
        to_torch_input(label, pad_hw, feat_hw, b), feat_shape=(b, 64, *feat_hw)
    )
    with torch.no_grad():
        theirs = ref_heads._get_losses(pred_nchw, ref_target)

    for key, ref_val in theirs.items():
        val = float(ref_val) if not hasattr(ref_val, "item") else ref_val.item()
        assert float(ours[key]) == pytest.approx(val, rel=2e-4, abs=1e-6), key


def test_schedule_parity():
    """One-cycle LR/beta1 schedules vs the reference closed forms."""
    import math

    from monocon_tpu.solver import one_cycle_momentum_schedule, one_cycle_schedule

    total, base = 1000, 2.25e-4
    steps_up = int(total * 0.4)
    lr_fn = one_cycle_schedule(base, total)
    b1_fn = one_cycle_momentum_schedule(0.95, total)

    def anneal(s, e, f):
        return e + 0.5 * (s - e) * (math.cos(math.pi * f) + 1)

    for count in [0, 1, 100, steps_up - 1, steps_up, 700, total - 1]:
        s = count + 1
        if s < steps_up:
            ref_lr = anneal(base, base * 10, s / steps_up)
            ref_b1 = anneal(0.95, 0.85, s / steps_up)
        else:
            ref_lr = anneal(base * 10, base * 1e-4, (s - steps_up) / (total - steps_up))
            ref_b1 = anneal(0.85, 0.95, (s - steps_up) / (total - steps_up))
        assert float(lr_fn(count)) == pytest.approx(ref_lr, rel=1e-6)
        assert float(b1_fn(count)) == pytest.approx(ref_b1, rel=1e-6)


def test_train_step_runs_and_descends(rng):
    """A few jitted steps on a tiny model instance must reduce total loss
    and update batch stats."""
    from monocon_tpu.engine import create_train_state, make_train_step
    from monocon_tpu.models import create_detector_state
    from monocon_tpu.solver import build_optimizer

    pad_hw = (64, 160)
    model, variables = create_detector_state(
        jax.random.PRNGKey(0), image_hw=pad_hw
    )
    optimizer = build_optimizer(lr=1e-3, total_steps=100, use_scheduler=False)
    state = create_train_state(variables, optimizer)
    step = jax.jit(make_train_step(model, optimizer))

    label = random_label_batch(rng, b=2, o=30, feat_hw=(16, 40), pad_hw=pad_hw)
    batch = {
        "img": jnp.asarray(rng.normal(size=(2, *pad_hw, 3)).astype(np.float32)),
        "label": {k: jnp.asarray(v) for k, v in label.items()},
    }

    losses0 = None
    for i in range(5):
        state, losses = step(state, batch)
        if losses0 is None:
            losses0 = {k: float(v) for k, v in losses.items()}
    assert int(state.step) == 5
    assert np.isfinite(float(losses["total_loss"]))
    assert float(losses["total_loss"]) < losses0["total_loss"]
    # batch_stats must have moved away from init (mean 0)
    bs = jax.tree.leaves(state.batch_stats)
    assert any(float(jnp.abs(x).max()) > 0 for x in bs)


@pytest.mark.parametrize("remat", ["dots"])  # one policy: numerics are
# policy-independent; each adds a full train-step CPU compile to the suite
def test_remat_step_matches_plain(rng, remat):
    """jax.checkpoint around the model apply (the HBM-pressure lever,
    make_train_step remat=) must not change step numerics: same losses and
    same updated params as the plain step from identical state/batch.

    Tolerance design (round-4 fix): comparing post-Adam float32 params is
    ill-posed — Adam's t=0 update is ~sign(g)*lr per element, so any param
    whose true gradient is zero-plus-reduction-noise can jump by ~2*lr
    between two programs that agree to the last ulp (the repo's f32 noise
    model, tests/test_train_trajectory_golden.py; the round-4 in-suite
    failure of this test at a different RNG stream was exactly that). What
    remat must preserve is the *gradient function*, so the comparison runs
    in float64 (reduction noise ~1e-15) with plain SGD, where the post-step
    param diff IS lr x the gradient diff — no sign amplification, and the
    1e-8 bound below has ~6 orders of margin over honest f64 noise while
    still catching any semantic deviation.
    """
    import optax

    from monocon_tpu.engine import create_train_state, make_train_step
    from monocon_tpu.models import create_detector_state

    pad_hw = (64, 160)
    model, variables = create_detector_state(
        jax.random.PRNGKey(0), image_hw=pad_hw
    )
    label = random_label_batch(rng, b=2, o=30, feat_hw=(16, 40),
                               pad_hw=pad_hw)
    img = rng.normal(size=(2, *pad_hw, 3)).astype(np.float64)
    variables = jax.tree.map(np.asarray, variables)

    with jax.enable_x64(True):
        optimizer = optax.sgd(1e-3)
        v64 = jax.tree.map(
            lambda a: jnp.asarray(a, jnp.float64)
            if np.issubdtype(a.dtype, np.floating) else jnp.asarray(a),
            variables,
        )
        batch = {
            "img": jnp.asarray(img, jnp.float64),
            "label": {k: jnp.asarray(v) for k, v in label.items()},
        }
        plain = jax.jit(make_train_step(model, optimizer))
        rem = jax.jit(make_train_step(model, optimizer, remat=remat))
        s_plain, l_plain = plain(create_train_state(v64, optimizer), batch)
        s_rem, l_rem = rem(create_train_state(v64, optimizer), batch)

        for k in l_plain:
            np.testing.assert_allclose(float(l_rem[k]), float(l_plain[k]),
                                       rtol=1e-9, err_msg=k)
        a = jax.tree.leaves(s_plain.params)
        b = jax.tree.leaves(s_rem.params)
        worst = max(float(jnp.max(jnp.abs(x - y))) for x, y in zip(a, b))
        assert worst < 1e-8, worst
