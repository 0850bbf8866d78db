from .train_step import (
    TrainState,
    compute_losses,
    create_train_state,
    make_train_step,
)

__all__ = [
    "TrainState",
    "compute_losses",
    "create_train_state",
    "make_train_step",
]
