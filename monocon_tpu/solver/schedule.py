"""One-cycle cosine LR + beta1 schedule and the optimizer chain.

Parity: reference ``solver/cyclic_scheduler.py`` — LR rises x10 over the
first 40% of total steps then falls to x1e-4, while beta1 dips
0.95 -> 0.8075 -> 0.95 on the inverse cycle. Expressed as pure optax
schedules; beta1 scheduling goes through ``optax.inject_hyperparams``.

Step convention: torch's scheduler computes values at ``_step_count = t``
with t=1 for the first optimizer step; optax passes count=0 first, so the
schedules evaluate at (count + 1).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def _cos_anneal(start, end, factor):
    return end + 0.5 * (start - end) * (jnp.cos(jnp.pi * factor) + 1.0)


def one_cycle_schedule(
    base: float,
    total_steps: int,
    up_ratio: float = 10.0,
    down_ratio: float = 1e-4,
    period_up: float = 0.4,
):
    """Value schedule base -> base*up_ratio -> base*down_ratio
    (reference get_lr, cyclic_scheduler.py:36-52)."""
    steps_up = int(total_steps * period_up)

    def schedule(count):
        s = count + 1.0
        up = _cos_anneal(base, base * up_ratio, s / max(steps_up, 1))
        down = _cos_anneal(
            base * up_ratio,
            base * down_ratio,
            (s - steps_up) / max(total_steps - steps_up, 1),
        )
        return jnp.where(s < steps_up, up, down)

    return schedule


def one_cycle_momentum_schedule(
    base: float = 0.95,
    total_steps: int = 1,
    down_ratio: float = 0.85 / 0.95,
    end_ratio: float = 1.0,
    period_up: float = 0.4,
):
    """beta1 schedule (reference set_momentum, cyclic_scheduler.py:55-71)."""
    steps_up = int(total_steps * period_up)

    def schedule(count):
        s = count + 1.0
        down = _cos_anneal(base, base * down_ratio, s / max(steps_up, 1))
        up = _cos_anneal(
            base * down_ratio,
            base * end_ratio,
            (s - steps_up) / max(total_steps - steps_up, 1),
        )
        return jnp.where(s < steps_up, down, up)

    return schedule


def build_optimizer(
    lr: float = 2.25e-4,
    weight_decay: float = 1e-5,
    total_steps: int = 1,
    use_scheduler: bool = True,
    clip_grad_norm: float = 35.0,
    grad_accum: int = 1,
) -> optax.GradientTransformation:
    """clip_by_global_norm(35) -> AdamW(betas cycled) with one-cycle LR.

    Parity: reference build_solver (engine/monocon_engine.py:35-55) +
    train_one_epoch clipping (:94-102).

    ``grad_accum > 1`` wraps the chain in ``optax.MultiSteps``: each
    ``update`` call accumulates the microbatch gradient in device memory
    and only every k-th call applies the inner chain to the *mean*
    gradient — so clipping, the one-cycle schedules, and AdamW moments
    all see the effective (k x batch) gradient, and the schedule count
    advances once per optimizer step, not per microbatch.
    ``total_steps`` is the number of OPTIMIZER steps (pass
    loader_steps // grad_accum when accumulating).
    """
    if use_scheduler:
        lr_schedule = one_cycle_schedule(lr, total_steps)
        b1_schedule = one_cycle_momentum_schedule(0.95, total_steps)
    else:
        lr_schedule = lr
        b1_schedule = 0.95

    adamw = optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr_schedule,
        b1=b1_schedule,
        b2=0.99,
        weight_decay=weight_decay,
    )
    transforms = []
    if clip_grad_norm is not None and clip_grad_norm > 0:
        transforms.append(optax.clip_by_global_norm(clip_grad_norm))
    transforms.append(adamw)
    chain = optax.chain(*transforms)
    if grad_accum > 1:
        return optax.MultiSteps(
            chain, every_k_schedule=grad_accum
        ).gradient_transformation()
    return chain


def peek_hyperparams(opt_state):
    """The materialized schedule values (lr/b1) of the upcoming step.

    The chain ends in ``inject_hyperparams(adamw)`` whose state carries
    them; under ``MultiSteps`` the chain state lives one level down in
    ``inner_opt_state``. Returns the hyperparams dict or None."""
    inner = getattr(opt_state, "inner_opt_state", opt_state)
    if not isinstance(inner, (tuple, list)) or not inner:
        return None
    return getattr(inner[-1], "hyperparams", None)
