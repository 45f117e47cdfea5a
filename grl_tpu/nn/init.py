"""Weight initializers with PyTorch-compatible fan/gain conventions.

The reference initializes new heads with torch's kaiming variants
(reference: reid/models/grl_model.py:27-47, reid/models/Siamese.py:18-39)
and the backbone convs with ``normal(0, sqrt(2/fan_out))``
(reference: reid/models/resnets1.py:113-119). Matching the init
*distributions* (not the draws) keeps training dynamics comparable.

Conv kernels here are HWIO (height, width, in, out) — the TPU-native NHWC
layout — so fan computations account for that.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def conv_fans(shape):
    """(fan_in, fan_out) for an HWIO conv kernel shape."""
    kh, kw, cin, cout = shape
    rf = kh * kw
    return cin * rf, cout * rf


def linear_fans(shape):
    """(fan_in, fan_out) for an (in, out) linear kernel shape."""
    cin, cout = shape
    return cin, cout


def _fan(shape, mode):
    fans = conv_fans(shape) if len(shape) == 4 else linear_fans(shape)
    return fans[0] if mode == "fan_in" else fans[1]


def kaiming_normal(rng, shape, a=0.0, mode="fan_in", dtype=jnp.float32):
    """torch.nn.init.kaiming_normal_ equivalent (leaky_relu gain)."""
    gain = math.sqrt(2.0 / (1.0 + a * a))
    std = gain / math.sqrt(_fan(shape, mode))
    return std * jax.random.normal(rng, shape, dtype)


def kaiming_uniform(rng, shape, a=0.0, mode="fan_in", dtype=jnp.float32):
    """torch.nn.init.kaiming_uniform_ equivalent."""
    gain = math.sqrt(2.0 / (1.0 + a * a))
    bound = math.sqrt(3.0) * gain / math.sqrt(_fan(shape, mode))
    return jax.random.uniform(rng, shape, dtype, -bound, bound)


def normal(rng, shape, std=0.001, dtype=jnp.float32):
    return std * jax.random.normal(rng, shape, dtype)


def uniform(rng, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(rng, shape, dtype, -bound, bound)


def zeros(_rng, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(_rng, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)


def resnet_conv_normal(rng, shape, dtype=jnp.float32):
    """``normal(0, sqrt(2/ (kh*kw*cout)))`` — reference resnets1.py:113-116."""
    kh, kw, _cin, cout = shape
    std = math.sqrt(2.0 / (kh * kw * cout))
    return std * jax.random.normal(rng, shape, dtype)


def torch_default_conv(rng, shape, dtype=jnp.float32):
    """torch.nn.Conv2d default: kaiming_uniform(a=sqrt(5)) on fan_in."""
    return kaiming_uniform(rng, shape, a=math.sqrt(5.0), mode="fan_in", dtype=dtype)


def torch_default_bias(rng, shape, fan_in, dtype=jnp.float32):
    """torch default bias: uniform(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(rng, shape, dtype, -bound, bound)
