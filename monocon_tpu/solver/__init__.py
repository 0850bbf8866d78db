from .schedule import (
    build_optimizer,
    one_cycle_momentum_schedule,
    one_cycle_schedule,
    peek_hyperparams,
)

__all__ = [
    "build_optimizer",
    "one_cycle_momentum_schedule",
    "one_cycle_schedule",
    "peek_hyperparams",
]
