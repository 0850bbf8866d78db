from .checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    load_weights_auto,
    save_checkpoint,
)
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
    "latest_checkpoint",
    "load_checkpoint",
    "load_weights_auto",
    "save_checkpoint",
    "MonoConEngine",
]


def __getattr__(name):
    # Lazy import: engine.engine pulls the full stack (data, eval, viz).
    if name == "MonoConEngine":
        from .engine import MonoConEngine

        return MonoConEngine
    raise AttributeError(name)
