"""Gradient accumulation (TPU.GRAD_ACCUM_STEPS / solver grad_accum).

The reference is single-GPU batch-8 only; accumulation is a TPU-native
addition that gives the effective large batch without its activation
memory (optax.MultiSteps around the reference-parity chain — clipping,
one-cycle LR/beta1 schedules, AdamW all see the mean gradient once per
optimizer step).
"""

import jax
import jax.numpy as jnp
import numpy as np

from monocon_tpu.solver import build_optimizer, peek_hyperparams


def tree_allclose(a, b, **kw):
    leaves = zip(jax.tree.leaves(a), jax.tree.leaves(b))
    return all(np.allclose(x, y, **kw) for x, y in leaves)


def test_accum_matches_plain_step_on_identical_microbatches():
    """k microbatches with identical gradients == one plain step with that
    gradient (mean of identical grads is the grad itself), and params do
    not move before the k-th microbatch."""
    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)}
    grads = {"w": jnp.full((2, 3), 0.5)}

    plain = build_optimizer(total_steps=10, grad_accum=1)
    accum = build_optimizer(total_steps=10, grad_accum=3)

    import optax

    s_plain = plain.init(params)
    u, s_plain = plain.update(grads, s_plain, params)
    p_plain = optax.apply_updates(params, u)

    s_acc = accum.init(params)
    p_acc = params
    for micro in range(3):
        u, s_acc = accum.update(grads, s_acc, p_acc)
        p_next = optax.apply_updates(p_acc, u)
        if micro < 2:
            assert tree_allclose(p_next, params), (
                f"params moved at microbatch {micro}"
            )
        p_acc = p_next

    assert tree_allclose(p_acc, p_plain, rtol=1e-6)
    assert int(s_acc.gradient_step) == 1
    assert int(s_acc.mini_step) == 0


def test_accum_averages_microbatch_gradients():
    """The applied update equals the plain update on the MEAN gradient."""
    import optax

    params = {"w": jnp.ones((4,))}
    micro_grads = [
        {"w": jnp.asarray(g, jnp.float32)}
        for g in ([1.0, 0, 0, 0], [0, 3.0, 0, 0])
    ]
    mean_grad = jax.tree.map(
        lambda *g: sum(g) / len(g), *micro_grads
    )

    plain = build_optimizer(total_steps=10, grad_accum=1)
    s = plain.init(params)
    u, _ = plain.update(mean_grad, s, params)
    p_plain = optax.apply_updates(params, u)

    accum = build_optimizer(total_steps=10, grad_accum=2)
    s_acc = accum.init(params)
    p_acc = params
    for g in micro_grads:
        u, s_acc = accum.update(g, s_acc, p_acc)
        p_acc = optax.apply_updates(p_acc, u)

    assert tree_allclose(p_acc, p_plain, rtol=1e-6)


def test_schedule_advances_per_optimizer_step_not_per_microbatch():
    """After 2k microbatches the one-cycle schedules sit where the plain
    optimizer sits after 2 steps — accumulation must not burn schedule
    counts on microbatches."""
    params = {"w": jnp.ones(())}
    grads = {"w": jnp.ones(())}

    plain = build_optimizer(total_steps=8, use_scheduler=True, grad_accum=1)
    s_plain = plain.init(params)
    for _ in range(2):
        _, s_plain = plain.update(grads, s_plain, params)

    accum = build_optimizer(total_steps=8, use_scheduler=True, grad_accum=4)
    s_acc = accum.init(params)
    for _ in range(8):
        _, s_acc = accum.update(grads, s_acc, params)

    hp_plain = peek_hyperparams(s_plain)
    hp_acc = peek_hyperparams(s_acc)
    assert hp_plain is not None and hp_acc is not None
    np.testing.assert_allclose(
        float(hp_acc["learning_rate"]), float(hp_plain["learning_rate"]),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(hp_acc["b1"]), float(hp_plain["b1"]), rtol=1e-6
    )


def test_peek_hyperparams_plain_and_wrapped():
    params = {"w": jnp.ones(())}
    for k in (1, 2):
        opt = build_optimizer(total_steps=4, grad_accum=k)
        hp = peek_hyperparams(opt.init(params))
        assert hp is not None and "learning_rate" in hp and "b1" in hp


def test_train_step_with_accum_optimizer(rng):
    """The real jitted train step runs with the MultiSteps optimizer:
    params frozen on microbatch 1, updated on microbatch 2 (k=2), while
    BN batch stats update every microbatch."""
    from monocon_tpu.engine import create_train_state, make_train_step
    from monocon_tpu.models import create_detector_state
    from tests.test_ops_parity import random_label_batch

    pad_hw = (32, 64)
    model, variables = create_detector_state(
        jax.random.PRNGKey(0), image_hw=pad_hw
    )
    optimizer = build_optimizer(total_steps=4, use_scheduler=False,
                                grad_accum=2)
    step = jax.jit(make_train_step(model, optimizer))

    label = random_label_batch(rng, b=2, o=30, feat_hw=(8, 16),
                               pad_hw=pad_hw)
    batch = {
        "img": jnp.asarray(
            rng.normal(size=(2, *pad_hw, 3)).astype(np.float32)
        ),
        "label": {k: jnp.asarray(v) for k, v in label.items()},
    }

    state0 = create_train_state(variables, optimizer)
    state1, losses1 = step(state0, batch)
    assert np.isfinite(float(losses1["total_loss"]))
    # Microbatch 1: gradient banked, params untouched...
    assert tree_allclose(state1.params, state0.params)
    # ...but BN stats DID update (per-microbatch semantics).
    assert not tree_allclose(state1.batch_stats, state0.batch_stats)

    state2, _ = step(state1, batch)
    # Microbatch 2: optimizer applies the mean gradient.
    assert not tree_allclose(state2.params, state0.params)
