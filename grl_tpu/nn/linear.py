"""Dense layer. Kernel stored (in, out) so ``x @ kernel`` hits the MXU
without a transpose (torch stores (out, in); conversion transposes)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import init as inits
from .module import Module


class Linear(Module):
    """Params: ``{"kernel": (in, out)[, "bias": (out,)]}``."""

    def __init__(self, in_features, out_features, bias=True, kernel_init=None, compute_dtype=None):
        self.in_features = in_features
        self.out_features = out_features
        self.use_bias = bias
        # torch.nn.Linear default init: kaiming_uniform(a=sqrt(5)) on fan_in.
        self.kernel_init = kernel_init or (
            lambda rng, shape: inits.kaiming_uniform(rng, shape, a=5.0 ** 0.5, mode="fan_in")
        )
        self.compute_dtype = compute_dtype

    def init(self, rng):
        k_rng, b_rng = jax.random.split(rng)
        params = {"kernel": self.kernel_init(k_rng, (self.in_features, self.out_features))}
        if self.use_bias:
            params["bias"] = inits.torch_default_bias(b_rng, (self.out_features,), self.in_features)
        return params, {}

    def apply(self, params, state, x, *, training=False):
        kernel = params["kernel"]
        if self.compute_dtype is not None:
            # keep bf16 activations bf16 (fp32 MXU accumulation is implicit)
            x = x.astype(self.compute_dtype)
            kernel = kernel.astype(self.compute_dtype)
            y = jnp.dot(x, kernel)
        else:
            y = jnp.dot(x, kernel, preferred_element_type=jnp.float32)
        if self.use_bias:
            y = y + params["bias"].astype(y.dtype)
        return y, state
