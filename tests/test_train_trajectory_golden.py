"""Training-stack golden vs the reference: gradients, running stats,
trajectory.

The single-point parities elsewhere in this suite (forward parity in eval
mode, target/loss parity on shared predictions, closed-form schedule
parity) leave the composite training surface unchecked: TRAIN-mode forward
(batch-stat BN/AttnBN), backward through all ten criterions, global-norm
gradient clipping, AdamW with cycled (lr, beta1) hyperparams, and the
running-statistic updates.

This test runs the reference's exact hot loop
(engine/monocon_engine.py:75-118: zero_grad -> forward_train ->
reduce_loss_dict -> backward -> clip_grad_norm_(35) -> AdamW.step ->
CyclicScheduler.step) on torch-CPU, and our jitted train step
(engine/train_step.py) from the SAME converted initial weights and the
SAME batches, and asserts:

1. The full GRADIENT trees match leaf-for-leaf in FLOAT64 on both sides
   (torch ``model.double()`` vs ``jax.enable_x64``) — a gradient-level
   golden across the whole model + ten losses at machine precision.
   f64 matters: BN scale/bias gradients are cancellation-heavy
   reductions that amplify rounding ~1e4x, so in f32 the two frameworks
   mutually disagree at up to ~1e-1 per leaf from reduction order alone
   (measured against a torch-f64 ground truth: torch-f32 carries ~3e-3
   median per-leaf relative noise, ours ~1.6e-2 via the fused one-pass
   BN moments). In f64 that noise floor drops below 1e-9 and any
   SEMANTIC deviation — a missing detach, a wrong mask or avg-factor —
   stands out at O(1).
2. The pre-clip global gradient norm matches (the input to clipping).
3. The BatchNorm running statistics after one f32 step match — momentum
   and torch's Bessel-corrected running_var (models/layers.py
   TorchBatchNorm) included.
4. The multi-step f32 loss trajectories track inside an honest envelope.
   Exact multi-step tracking is unachievable BY CONSTRUCTION: at t=0
   Adam's update is ~lr*sign(g/..), so every parameter whose gradient is
   within f32 noise of zero flips its whole lr-sized update on a 1-ulp
   difference — trajectories diverge exponentially from the first step
   no matter how exact the gradients are (measured: rel err 2e-5 at
   step 0, ~1e-3 after one update, ~1e-1 after four). The envelope
   pins the pre-update loss tight and requires later steps to track at
   the measured chaos rate; both runs must actually learn.
5. Both schedulers applied the same LR on the final step.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_ops_parity import random_label_batch, to_torch_input

REFERENCE = "/root/reference"

PAD_HW = (64, 160)
FEAT_HW = (16, 40)
B, O = 2, 30
STEPS = 5
# Schedule horizon: several cycle positions get exercised (steps_up = 8).
TOTAL_STEPS = 20
LR, WD, CLIP = 2.25e-4, 1e-5, 35.0
# Measured chaos envelope (see module docstring, point 4).
TRAJ_RTOL = (1e-4, 5e-3, 6e-2, 6e-2, 0.3)


def _make_batches():
    """STEPS batches of (image, our-format label), deterministic."""
    batches = []
    for i in range(STEPS):
        rng = np.random.default_rng(100 + i)
        img = rng.normal(size=(B, *PAD_HW, 3)).astype(np.float32)
        label = random_label_batch(rng, b=B, o=O, feat_hw=FEAT_HW,
                                   pad_hw=PAD_HW)
        batches.append((img, label))
    return batches


def _import_reference():
    sys.path.insert(0, REFERENCE)
    try:
        import torch  # noqa: F401
        from model.detector.monocon_detector import MonoConDetector
        from solver.cyclic_scheduler import CyclicScheduler
    finally:
        sys.path.pop(0)
    return MonoConDetector, CyclicScheduler


def _reference_trajectory(batches):
    import torch
    from torch.nn.utils import clip_grad_norm_

    MonoConDetector, CyclicScheduler = _import_reference()
    torch.manual_seed(0)
    model = MonoConDetector(num_dla_layers=34, pretrained_backbone=False)
    state_dict = {k: v.clone() for k, v in model.state_dict().items()}
    model.train()
    optim = torch.optim.AdamW(model.parameters(), lr=LR,
                              betas=(0.95, 0.99), weight_decay=WD)
    sched = CyclicScheduler(optim, total_steps=TOTAL_STEPS)

    losses = []
    stats1 = None
    applied_lr = None
    for step_i, (img, label) in enumerate(batches):
        data = to_torch_input(label, PAD_HW, FEAT_HW, B)
        data["img"] = torch.from_numpy(
            np.ascontiguousarray(np.transpose(img, (0, 3, 1, 2)))
        )
        optim.zero_grad()
        _, loss_dict = model(data)
        total = sum(loss_dict.values())
        total.backward()
        clip_grad_norm_(model.parameters(), max_norm=CLIP, norm_type=2.0)
        applied_lr = optim.param_groups[0]["lr"]  # lr this step applies
        optim.step()
        sched.step()
        if step_i == 0:
            # Running BN stats after exactly one train-mode forward.
            stats1 = {k: v.clone() for k, v in model.state_dict().items()
                      if "running_" in k}
        losses.append(float(total.detach()))

    return state_dict, stats1, losses, applied_lr


def _reference_grads_f64(state_dict, batch):
    """One forward/backward of the reference in float64."""
    import torch

    MonoConDetector, _ = _import_reference()
    torch.manual_seed(0)
    model = MonoConDetector(num_dla_layers=34, pretrained_backbone=False)
    model.load_state_dict(state_dict)
    model.double()
    model.train()

    img, label = batch
    data = to_torch_input(label, PAD_HW, FEAT_HW, B)
    data["img"] = torch.from_numpy(
        np.ascontiguousarray(np.transpose(img, (0, 3, 1, 2)))
    ).double()
    model.zero_grad()
    _, loss_dict = model(data)
    sum(loss_dict.values()).backward()
    # Params unused by the loss carry grad=None in torch (AdamW skips
    # them); our functional grad gives exact zeros.
    grads = {name: (p.grad.clone() if p.grad is not None
                    else torch.zeros_like(p))
             for name, p in model.named_parameters()}
    gnorm = float(torch.sqrt(sum((g * g).sum() for g in grads.values())))
    return grads, gnorm


def _our_grads_f64(variables, batch):
    """Step-0 gradients of our stack in float64 (jax.enable_x64)."""
    from monocon_tpu.engine.train_step import compute_losses
    from monocon_tpu.models import MonoConDetector
    from monocon_tpu.ops.targets import generate_targets

    img, label = batch
    # Targets in plain f32 — bit-exact with the reference's internal
    # target generator (tests/test_ops_parity.py); they enter the losses
    # as constants and promote to f64 there.
    target = generate_targets(
        {k: jnp.asarray(v) for k, v in label.items()}, FEAT_HW, PAD_HW)
    target = jax.tree.map(np.asarray, target)

    model = MonoConDetector(num_layers=34)
    with jax.enable_x64(True):
        params = jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64),
            variables["params"])
        stats = jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64),
            variables["batch_stats"])
        img64 = jnp.asarray(img, jnp.float64)
        target64 = {k: jnp.asarray(v) for k, v in target.items()}

        def loss_fn(p):
            pred, _ = model.apply(
                {"params": p, "batch_stats": stats},
                img64, train=True, mutable=["batch_stats"],
            )
            return sum(compute_losses(pred, target64).values())

        grads = jax.jit(jax.grad(loss_fn))(params)
        gnorm = float(jnp.sqrt(sum(jnp.sum(jnp.square(g))
                                   for g in jax.tree.leaves(grads))))
        grads = jax.tree.map(np.asarray, grads)
    return grads, gnorm


def _our_trajectory(variables, batches):
    from monocon_tpu.engine import create_train_state, make_train_step
    from monocon_tpu.models import MonoConDetector
    from monocon_tpu.solver import build_optimizer, peek_hyperparams

    model = MonoConDetector(num_layers=34)
    optimizer = build_optimizer(lr=LR, weight_decay=WD,
                                total_steps=TOTAL_STEPS,
                                use_scheduler=True, clip_grad_norm=CLIP)
    state = create_train_state(jax.tree.map(jnp.asarray, variables),
                               optimizer)
    step = jax.jit(make_train_step(model, optimizer))

    losses = []
    stats1 = None
    for img, label in batches:
        batch = {
            "img": jnp.asarray(img),
            "label": {k: jnp.asarray(v) for k, v in label.items()},
        }
        state, loss_dict = step(state, batch)
        if stats1 is None:
            stats1 = jax.tree.map(np.asarray, state.batch_stats)
        losses.append(float(loss_dict["total_loss"]))
    hp = peek_hyperparams(state.opt_state)

    return stats1, losses, float(hp["learning_rate"])


def _leaf_items(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {jax.tree_util.keystr(path): np.asarray(leaf)
            for path, leaf in flat}


def test_training_stack_matches_reference():
    from monocon_tpu.utils.torch_convert import convert_state_dict

    batches = _make_batches()
    state_dict, ref_stats1, ref_losses, ref_last_lr = (
        _reference_trajectory(batches))
    variables = convert_state_dict(state_dict)
    our_stats1, our_losses, our_last_lr = _our_trajectory(variables, batches)

    ref_grads, ref_gnorm = _reference_grads_f64(state_dict, batches[0])
    our_grads, our_gnorm = _our_grads_f64(variables, batches[0])

    # 1. f64 gradient golden: torch grads convert with the same layout
    # rules as the weights (NCHW->HWIO etc.), so the trees must align
    # leaf-for-leaf at machine precision (see module docstring).
    conv_grads = _leaf_items(convert_state_dict(ref_grads)["params"])
    ours = _leaf_items(our_grads)
    assert set(ours) == set(conv_grads)
    worst = ("", 0.0)
    for key, ref_g in conv_grads.items():
        rel = (np.linalg.norm(ours[key] - ref_g)
               / (np.linalg.norm(ref_g) + 1e-30))
        if rel > worst[1]:
            worst = (key, rel)
        assert rel < 1e-6, f"gradient mismatch at {key}: rel L2 {rel:.2e}"
    print(f"worst gradient leaf: {worst[0]} rel L2 {worst[1]:.2e}")

    # 2. The input to clipping: pre-clip global grad norm.
    assert our_gnorm == pytest.approx(ref_gnorm, rel=1e-7)

    # 3. Running BN statistics after one f32 step: momentum and torch's
    # Bessel-corrected running_var (TorchBatchNorm). f32 both sides; the
    # tolerance is fast-variance reduction noise.
    conv_stats = _leaf_items(convert_state_dict(ref_stats1)["batch_stats"])
    ours_stats = _leaf_items(our_stats1)
    assert set(ours_stats) == set(conv_stats)
    for key, ref_s in conv_stats.items():
        np.testing.assert_allclose(
            ours_stats[key], ref_s, rtol=2e-3, atol=1e-6,
            err_msg=f"running stats diverged at {key}",
        )

    # 4. Trajectories track inside the measured chaos envelope and both
    # runs learn.
    for i, (ours_l, ref_l) in enumerate(zip(our_losses, ref_losses)):
        rel = abs(ours_l - ref_l) / abs(ref_l)
        assert rel < TRAJ_RTOL[i], (
            f"step {i}: ours={ours_l:.6f} ref={ref_l:.6f} rel={rel:.2e} "
            f"(trajectories: {our_losses} vs {ref_losses})"
        )
    assert our_losses[-1] < our_losses[0]
    assert ref_losses[-1] < ref_losses[0]

    # 5. Both schedulers applied the same LR on the final step.
    assert our_last_lr == pytest.approx(ref_last_lr, rel=1e-5)
