"""grl_tpu.nn — minimal functional neural-net core (explicit pytrees)."""

from . import functional, init
from .conv import Conv2d, conv2d
from .linear import Linear
from .module import Lambda, Module, Sequential, init_children
from .norm import BatchNorm, BatchNorm1d, BatchNorm2d, batch_stats
from .pool import MaxPool2d, global_avg_pool, max_pool2d

__all__ = [
    "functional",
    "init",
    "Conv2d",
    "conv2d",
    "Linear",
    "Lambda",
    "Module",
    "Sequential",
    "init_children",
    "BatchNorm",
    "BatchNorm1d",
    "BatchNorm2d",
    "batch_stats",
    "MaxPool2d",
    "global_avg_pool",
    "max_pool2d",
]
