"""2-D convolution, NHWC activations / HWIO kernels (TPU-native layout).

XLA maps NHWC convs straight onto the MXU; channels-last also makes the
(8,128)/(16,128) tile constraints line up with the channel axis. The
reference's convs are NCHW torch modules (reid/models/resnets1.py:19-22,
basebranch.py:42-50); here only the math is kept.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import init as inits
from .module import Module

_DN = ("NHWC", "HWIO", "NHWC")


def conv2d(x, kernel, *, stride=(1, 1), padding=(0, 0), compute_dtype=None):
    """Plain functional conv. ``padding`` is symmetric (ph, pw).

    Under a bf16 compute dtype the output stays bf16 (XLA's MXU still
    accumulates in fp32 internally): keeping activations narrow halves HBM
    traffic, and emitting fp32 from bf16 convs breaks the transposed-conv
    VJP (mixed cotangent/kernel dtypes).
    """
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    ph, pw = padding
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=stride,
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=_DN,
    )


class Conv2d(Module):
    """Conv layer description. Params: ``{"kernel": HWIO[, "bias": (cout,)]}``."""

    def __init__(
        self,
        in_channels,
        out_channels,
        kernel_size,
        stride=1,
        padding=0,
        bias=True,
        kernel_init=None,
        compute_dtype=None,
    ):
        ks = (kernel_size, kernel_size) if isinstance(kernel_size, int) else tuple(kernel_size)
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = ks
        self.stride = (stride, stride) if isinstance(stride, int) else tuple(stride)
        self.padding = (padding, padding) if isinstance(padding, int) else tuple(padding)
        self.use_bias = bias
        self.kernel_init = kernel_init or inits.torch_default_conv
        self.compute_dtype = compute_dtype

    @property
    def kernel_shape(self):
        return (*self.kernel_size, self.in_channels, self.out_channels)

    def init(self, rng):
        k_rng, b_rng = jax.random.split(rng)
        params = {"kernel": self.kernel_init(k_rng, self.kernel_shape)}
        if self.use_bias:
            fan_in = self.in_channels * self.kernel_size[0] * self.kernel_size[1]
            params["bias"] = inits.torch_default_bias(b_rng, (self.out_channels,), fan_in)
        return params, {}

    def apply(self, params, state, x, *, training=False):
        y = conv2d(
            x,
            params["kernel"],
            stride=self.stride,
            padding=self.padding,
            compute_dtype=self.compute_dtype,
        )
        if self.use_bias:
            y = y + params["bias"].astype(y.dtype)
        return y, state
