from mcpt_tpu.utils.vec import (
    cross,
    dot,
    norm,
    normalize,
    safe_normalize,
    reflect,
)
from mcpt_tpu.utils.progress import ProgressBar, format_duration

__all__ = [
    "cross",
    "dot",
    "norm",
    "normalize",
    "safe_normalize",
    "reflect",
    "ProgressBar",
    "format_duration",
]
