"""Pooling ops for NHWC activations."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .module import Module


def max_pool2d(x, kernel_size, stride, padding=0):
    """torch.nn.MaxPool2d equivalent on NHWC (pads with -inf)."""
    kh, kw = (kernel_size, kernel_size) if isinstance(kernel_size, int) else kernel_size
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    ph, pw = (padding, padding) if isinstance(padding, int) else padding
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return jax.lax.reduce_window(
        x,
        neg_inf,
        jax.lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=((0, 0), (ph, ph), (pw, pw), (0, 0)),
    )


def global_avg_pool(x):
    """Spatial mean over H, W of NHWC -> (N, C)."""
    return jnp.mean(x, axis=(1, 2))


class MaxPool2d(Module):
    def __init__(self, kernel_size, stride, padding=0):
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding

    def init(self, rng):
        return {}, {}

    def apply(self, params, state, x, *, training=False):
        return max_pool2d(x, self.kernel_size, self.stride, self.padding), state
