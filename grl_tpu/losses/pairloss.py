"""Pairwise verification BCE (reference reid/loss/pairloss.py:9-45).

Input is the (Np, Ng) matrix of softmaxed match probabilities (class-1
probability of the Siamese verification scores, trainer.py:144-149); the
label matrix is probe/gallery id equality. Returns (loss, accuracy).
"""

from __future__ import annotations

import jax.numpy as jnp


def pair_loss(scores, tar_probe, tar_gallery):
    """scores: (Np, Ng) probabilities in [0, 1]."""
    labels = (tar_probe[:, None] == tar_gallery[None, :]).astype(jnp.float32)
    p = scores.reshape(-1).astype(jnp.float32)
    y = labels.reshape(-1)
    # torch.nn.BCELoss clamps each log term at -100.
    loss = -jnp.mean(
        y * jnp.maximum(jnp.log(p), -100.0) + (1.0 - y) * jnp.maximum(jnp.log1p(-p), -100.0)
    )
    acc = jnp.mean((p > 0.5) == (y > 0.5))
    return loss, acc


class PairLoss:
    def __call__(self, scores, tar_probe, tar_gallery):
        return pair_loss(scores, tar_probe, tar_gallery)
