from .detector import MonoConDetector, create_detector_state
from .dla import DLA, ARCH_SETTINGS
from .heads import MonoConHeads
from .layers import AttnBatchNorm
from .neck import DLAUp, IDAUp

__all__ = [
    "MonoConDetector",
    "create_detector_state",
    "DLA",
    "ARCH_SETTINGS",
    "MonoConHeads",
    "AttnBatchNorm",
    "DLAUp",
    "IDAUp",
]
