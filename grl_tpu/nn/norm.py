"""Functional BatchNorm with PyTorch-parity semantics.

Works on channels-last inputs of any rank (stats over all axes but the
last): covers the reference's BatchNorm2d (backbone / GCE / TRL BasicBlocks)
and BatchNorm1d on (N, C) feature heads. Parity points with torch defaults:

- training normalizes with *biased* batch variance, eval with running stats;
- running stats update ``r <- (1 - m) * r + m * stat`` with ``m = 0.1`` and
  the *unbiased* batch variance (``n/(n-1)`` correction);
- eps 1e-5; affine scale init 1, bias init 0.

Statistics are always accumulated in float32 regardless of compute dtype.

Under the framework's data parallelism (sharded batch into one jitted
step — parallel/mesh.py) the ``jnp.mean`` here reduces over the *global*
batch: XLA inserts the cross-shard collective, so sharded and
single-device training see identical statistics (proven by
tests/test_sharding.py::test_batchnorm_global_stats_under_sharding and
the step-equivalence test). This is strictly better than the reference's
``nn.DataParallel``, which silently uses per-replica stats; the divergence
is accepted per SURVEY.md §7 ("BatchNorm everywhere") — replicating the
per-replica quirk would require ``shard_map`` with no ``axis_name`` here,
which nothing in this codebase does. ``axis_name`` only matters inside
``pmap``/``shard_map`` bodies, where per-shard stats would otherwise be
computed; it is unused on the jit-SPMD path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .module import Module


def batch_stats(x, axis_name=None):
    """Mean/variance over all but the channel (last) axis, in fp32.

    Returns (mean, biased_var, n) where n is the per-device element count
    per channel (multiplied by axis size when cross-replica syncing).
    """
    x32 = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    n = 1
    for a in axes:
        n *= x.shape[a]
    mean = jnp.mean(x32, axis=axes)
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
    # Two-pass variance: E[(x - mean)^2] avoids the catastrophic
    # cancellation of E[x^2] - E[x]^2 in fp32 (matters for the small
    # spatial extents this model normalizes over).
    var = jnp.mean(jnp.square(x32 - mean), axis=axes)
    if axis_name is not None:
        var = jax.lax.pmean(var, axis_name)
        n = n * jax.lax.psum(1, axis_name)
    return mean, var, n


class BatchNorm(Module):
    """Params ``{"scale","bias"}``; state ``{"mean","var"}`` (running, fp32)."""

    def __init__(self, num_features, eps=1e-5, momentum=0.1, affine=True, axis_name=None):
        self.num_features = num_features
        self.eps = eps
        self.momentum = momentum
        self.affine = affine
        self.axis_name = axis_name

    def init(self, rng):
        params = {}
        if self.affine:
            params = {
                "scale": jnp.ones((self.num_features,), jnp.float32),
                "bias": jnp.zeros((self.num_features,), jnp.float32),
            }
        state = {
            "mean": jnp.zeros((self.num_features,), jnp.float32),
            "var": jnp.ones((self.num_features,), jnp.float32),
        }
        return params, state

    def apply(self, params, state, x, *, training=False):
        if training:
            mean, var, n = batch_stats(x, self.axis_name)
            # Unbiased variance feeds the running estimate (torch parity).
            correction = n / max(n - 1, 1) if isinstance(n, int) else n / jnp.maximum(n - 1, 1)
            new_state = {
                "mean": (1.0 - self.momentum) * state["mean"] + self.momentum * mean,
                "var": (1.0 - self.momentum) * state["var"] + self.momentum * (var * correction),
            }
        else:
            mean, var = state["mean"], state["var"]
            new_state = state

        inv = jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = params["scale"] * inv
            shift = params["bias"] - mean * scale
        else:
            scale = inv
            shift = -mean * inv
        y = x.astype(jnp.float32) * scale + shift
        return y.astype(x.dtype), new_state


# Aliases matching the reference's module names for readability at call sites.
BatchNorm1d = BatchNorm
BatchNorm2d = BatchNorm
