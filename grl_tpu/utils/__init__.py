"""Shared utilities: logging, meters, serialization, weight conversion."""

from .logging import Logger, ScalarWriter
from .meters import AverageMeter
from .serialization import (
    flatten_tree,
    load_checkpoint,
    mkdir_if_missing,
    read_json,
    save_checkpoint,
    unflatten_tree,
    write_json,
)

__all__ = [
    "Logger",
    "ScalarWriter",
    "AverageMeter",
    "read_json",
    "write_json",
    "mkdir_if_missing",
    "save_checkpoint",
    "load_checkpoint",
    "flatten_tree",
    "unflatten_tree",
]
