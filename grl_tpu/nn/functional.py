"""Small functional ops shared across models."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def relu(x):
    return jnp.maximum(x, 0)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def l2_normalize(x, axis=-1, eps=1e-12):
    """torch F.normalize(p=2) parity: x / max(||x||, eps)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True))
    return (x.astype(jnp.float32) / jnp.maximum(norm, eps)).astype(x.dtype)


def l2_unit(x, axis=-1):
    """x / ||x|| with no epsilon — matches the reference's bare
    ``x / x.norm(2, 1)`` division (reid/models/Siamese.py:87,93,103)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True))
    return (x.astype(jnp.float32) / norm).astype(x.dtype)
