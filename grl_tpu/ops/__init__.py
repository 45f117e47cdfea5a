"""Custom TPU kernels (Pallas) for ops XLA cannot express efficiently."""

from .minplus import minplus_matmul

__all__ = ["minplus_matmul"]
