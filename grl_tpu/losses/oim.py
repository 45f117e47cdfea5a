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
    """Sequential-semantics momentum update + renorm (reference oim.py:24-27).

    Batch order matters when a target id repeats — updates to one id chain
    nonlinearly (renorm between steps) and must apply in batch order. But
    chains for DIFFERENT ids touch different lut rows and are independent,
    so instead of one fori_loop step per batch row (10x batch sequential
    tiny ops per train step — measured as the batch-scaling drag on the
    jitted step, docs/PERFORMANCE.md "Batch scaling"), rows are grouped by
    their position within their id group and applied as vectorized ROUNDS:
    round k scatters every id's (k+1)-th occurrence at once. Sequential
    depth becomes max-duplicates-per-id (2t for the frame update under the
    pair sampler) instead of the batch row count, with identical per-row
    math in identical per-id order.

    ``inputs`` should be the (detached) features that produced the logits.
    """
    inputs = jax.lax.stop_gradient(inputs).astype(lut.dtype)
    n, c = inputs.shape

    # pos[i] = how many earlier batch rows share targets[i]'s id
    same = targets[:, None] == targets[None, :]
    pos = jnp.sum(jnp.tril(same, k=-1), axis=1)
    rounds = jnp.max(pos) + 1

    # one scratch row absorbs the scatters of rows inactive in a round
    scratch = lut.shape[0]
    padded = jnp.concatenate([lut, jnp.zeros((1, c), lut.dtype)], axis=0)

    def body(state):
        k, padded = state
        active = pos == k  # at most one row per id
        rows = padded[targets]
        new = momentum * rows + (1.0 - momentum) * inputs
        new = new / jnp.linalg.norm(new, axis=1, keepdims=True)
        idx = jnp.where(active, targets, scratch)
        return k + 1, padded.at[idx].set(jnp.where(active[:, None], new, 0.0))

    _, padded = jax.lax.while_loop(lambda s: s[0] < rounds, body, (0, padded))
    return padded[:-1]


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
