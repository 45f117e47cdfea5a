"""OIM — Online Instance Matching loss with explicit functional state.

The reference implements OIM as a pre-1.3 stateful ``autograd.Function``
whose *backward* mutates the lookup table (reid/loss/oim.py:8-31): logits
are ``inputs @ lutᵀ`` with gradients flowing to inputs only, and during the
backward pass each batch row updates ``lut[y]`` sequentially with momentum
followed by renormalization (duplicate ids apply twice, in batch order).

TPU-native design: the lut is explicit state threaded through the train
step. ``logits`` uses ``stop_gradient(lut)`` — exactly the reference's
gradient (lut is a buffer there, never a parameter) — and ``update_lut``
reproduces the sequential momentum+renorm semantics as a ``lax.fori_loop``
applied after the loss, which is equivalent because the forward consumed the
pre-update lut. No gradient-time side effects → safe under jit/SPMD (and
fixes the latent DataParallel lut race noted in SURVEY.md §5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_lut(num_classes, num_features, dtype=jnp.float32):
    """Zero-initialized lookup table (reference oim.py:43)."""
    return jnp.zeros((num_classes, num_features), dtype)


def oim_logits(inputs, lut, scalar=30.0):
    """Scaled class logits; gradient flows to ``inputs`` only."""
    return scalar * jnp.dot(
        inputs, jax.lax.stop_gradient(lut).T, preferred_element_type=jnp.float32
    )


def update_lut(lut, inputs, targets, momentum=0.5):
    """Sequential per-row momentum update + renorm (reference oim.py:24-27).

    Batch order matters when a target id repeats — this loop preserves it.
    ``inputs`` should be the (detached) features that produced the logits.
    """
    inputs = jax.lax.stop_gradient(inputs).astype(lut.dtype)

    def body(i, lut):
        y = targets[i]
        row = momentum * lut[y] + (1.0 - momentum) * inputs[i]
        row = row / jnp.linalg.norm(row)
        return lut.at[y].set(row)

    return jax.lax.fori_loop(0, inputs.shape[0], body, lut)


def cross_entropy(logits, targets):
    """Mean softmax cross-entropy over integer targets (F.cross_entropy)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, targets[:, None], axis=-1))


class OIMLoss:
    """Callable bundle mirroring the reference OIMLoss module
    (oim.py:34-53), with the lut as an explicit argument/return.

    usage::

        loss, logits, new_lut = oim(lut, features, targets)
    """

    def __init__(self, num_features, num_classes, scalar=30.0, momentum=0.5):
        self.num_features = num_features
        self.num_classes = num_classes
        self.scalar = scalar
        self.momentum = momentum

    def init(self):
        return init_lut(self.num_classes, self.num_features)

    def __call__(self, lut, inputs, targets):
        logits = oim_logits(inputs, lut, self.scalar)
        loss = cross_entropy(logits, targets)
        new_lut = update_lut(lut, inputs, targets, self.momentum)
        return loss, logits, new_lut
