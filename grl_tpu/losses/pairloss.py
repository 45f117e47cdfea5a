"""Pairwise verification BCE (reference reid/loss/pairloss.py:9-45).

Input is the (Np, Ng) matrix of softmaxed match probabilities (class-1
probability of the Siamese verification scores, trainer.py:144-149); the
label matrix is probe/gallery id equality. Returns (loss, accuracy).
"""

from __future__ import annotations

import jax
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


def pair_loss_from_logits(scores, tar_probe, tar_gallery):
    """Same loss computed from the raw 2-way scores (Np, Ng, 2).

    softmax + BCE on the class-1 probability is algebraically the 2-class
    cross-entropy of the logits, so this matches the reference's
    ``BCE(softmax(scores)[..., 1])`` (trainer.py:144-149) exactly — but via
    log_softmax, whose gradient (p - y) stays finite when the probabilities
    saturate (the probability-space form yields 0 * inf = NaN there).
    """
    labels = (tar_probe[:, None] == tar_gallery[None, :]).astype(jnp.float32)
    logp = scores - jax.scipy.special.logsumexp(scores, axis=-1, keepdims=True)
    loss = -jnp.mean(labels * logp[..., 1] + (1.0 - labels) * logp[..., 0])
    p1 = jnp.exp(logp[..., 1])
    acc = jnp.mean((p1 > 0.5) == (labels > 0.5))
    return loss, acc


class PairLoss:
    def __call__(self, scores, tar_probe, tar_gallery):
        return pair_loss(scores, tar_probe, tar_gallery)
