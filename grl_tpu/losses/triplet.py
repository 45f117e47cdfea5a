"""Batch-hard triplet losses (reference reid/loss/triplet.py, triplet_oim.py).

Soft-margin batch-hard semantics (triplet.py:42-76):
- euclidean distance matrix with ``sqrt(sum + 1e-12)`` stabilization;
- hardest positive = max distance over same-id (diagonal excluded);
- hardest negative = min distance after adding ``1e5`` to same-id entries;
- soft margin -> ``softplus(max_pos - min_neg)`` per anchor.

Returns the per-anchor loss vector (caller means it, trainer.py:141).
"""

from __future__ import annotations

import jax.numpy as jnp


def euclidean_cdist(a, b):
    """Pairwise euclidean distances, (B1, D) x (B2, D) -> (B1, B2).

    Expressed via the gram matrix so the (B1, B2, D) difference tensor is
    never materialized (single MXU matmul + rank-1 corrections).
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    sq = (
        jnp.sum(jnp.square(a), axis=1)[:, None]
        - 2.0 * jnp.dot(a, b.T, preferred_element_type=jnp.float32)
        + jnp.sum(jnp.square(b), axis=1)[None, :]
    )
    return jnp.sqrt(jnp.maximum(sq, 0.0) + 1e-12)


def _masks(ids):
    n = ids.shape[0]
    same = ids[:, None] == ids[None, :]
    eye = jnp.eye(n, dtype=bool)
    positive = same & ~eye
    return same, positive


def batch_hard(dist, same, positive):
    max_positive = jnp.max(dist * positive.astype(dist.dtype), axis=1)
    min_negative = jnp.min(dist + 1e5 * same.astype(dist.dtype), axis=1)
    return max_positive - min_negative


def soft_margin(z):
    # log(1 + exp(z)) exactly as written in the reference (:73); inputs are
    # bounded by feature norms here so the naive form is faithful, but use
    # the stable formulation anyway.
    return jnp.logaddexp(0.0, z)


class TripletLoss:
    """Soft-margin batch-hard triplet (margin='soft', batch_hard=True)."""

    def __init__(self, margin="soft", batch_hard=True):
        if not (margin == "soft" or isinstance(margin, float)):
            raise NotImplementedError(f"margin {margin!r} not recognized")
        self.margin = margin
        self.batch_hard = batch_hard

    def __call__(self, feat, ids):
        dist = euclidean_cdist(feat, feat)
        same, positive = _masks(ids)
        z = batch_hard(dist, same, positive)
        if self.margin == "soft":
            return soft_margin(z)
        return jnp.maximum(z + self.margin, 0.0)


class TripletLossOIM:
    """Triplet against OIM lut class centers (reference triplet_oim.py:16-79):
    distances are feature -> ``lut[ids]`` rows instead of feature -> feature.

    Reference quirk reproduced: the positive mask excludes the diagonal
    (triplet_oim.py:35 ``same_id_mask ^ identity_mask``) even though here
    ``dist[i, i]`` is the distance to feat_i's OWN class center — a
    legitimate positive. For a batch-singleton id the positive term is
    therefore 0, like the reference. (ALT module: the reference's call
    site is commented out, trainer.py.)"""

    def __init__(self, margin="soft", batch_hard=True):
        self.margin = margin
        self.batch_hard = batch_hard

    def __call__(self, feat, lut, ids):
        centers = lut[ids]
        dist = euclidean_cdist(feat, centers)
        same, positive = _masks(ids)
        z = batch_hard(dist, same, positive)
        if self.margin == "soft":
            return soft_margin(z)
        return jnp.maximum(z + self.margin, 0.0)
