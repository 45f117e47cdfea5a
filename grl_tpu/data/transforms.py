"""Device-side, jit-compiled clip augmentation.

Replaces the reference's per-frame PIL transform chain
(reid/data/seqtransforms.py, applied per worker process) with one fused XLA
program over the whole uint8 batch: normalize + clip-consistent horizontal
flip + per-frame random erasing run on-device, so the host pipeline only
decodes and resizes JPEGs.

Semantics mirrored from the reference:
- flip: one p=0.5 decision per clip, all frames together (seqtransforms:140-151);
- random erasing (seqtransforms:92-137): per frame with p=0.5, area ratio
  U(0.02, 0.2), aspect U(0.3, 1/0.3), solid random RGB fill. The reference
  pastes the patch at position ``(We, He)`` — a quirk (``paste`` is given the
  patch *size* as its position) explicitly not replicated (SURVEY.md §2.4);
  here the patch lands at the sampled (xe, ye) as the paper intends. Boxes
  are clamped rather than rejection-sampled (jit-safe, same distribution up
  to boundary effects);
- normalize: ImageNet mean/std after /255 (dataloader.py:53-57).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize(clips):
    """uint8/float (..., h, w, 3k) -> normalized float32.

    Channels beyond 3 are stacked modalities (RGB + optical flow on the
    two-stream path); each 3-channel group gets the same ImageNet stats —
    matching the reference, whose Normalize runs identically over every
    modality list (seqtransforms.py:195-215)."""
    x = clips.astype(jnp.float32) / 255.0
    reps = clips.shape[-1] // 3
    mean = jnp.tile(jnp.asarray(IMAGENET_MEAN, jnp.float32), reps)
    std = jnp.tile(jnp.asarray(IMAGENET_STD, jnp.float32), reps)
    return (x - mean) / std


def random_flip(rng, clips):
    """Clip-consistent horizontal flip, p=0.5 per clip. clips: (b,t,h,w,c)."""
    b = clips.shape[0]
    flip = jax.random.bernoulli(rng, 0.5, (b,))
    flipped = clips[:, :, :, ::-1, :]
    return jnp.where(flip[:, None, None, None, None], flipped, clips)


def random_erase(rng, clips, sl=0.02, sh=0.2, asratio=0.3, p=0.5):
    """Per-frame random erasing on uint8-scale values. clips: (b,t,h,w,c)."""
    b, t, h, w, c = clips.shape
    k_gate, k_area, k_aspect, k_x, k_y, k_color = jax.random.split(rng, 6)
    n = b * t

    gate = jax.random.uniform(k_gate, (n,)) <= p
    area = jax.random.uniform(k_area, (n,), minval=sl, maxval=sh) * (h * w)
    aspect = jax.random.uniform(k_aspect, (n,), minval=asratio, maxval=1.0 / asratio)
    he = jnp.minimum(jnp.sqrt(area * aspect), h - 1)
    we = jnp.minimum(jnp.sqrt(area / aspect), w - 1)
    xe = jax.random.uniform(k_x, (n,)) * (w - we)
    ye = jax.random.uniform(k_y, (n,)) * (h - he)
    color = jax.random.randint(k_color, (n, c), 0, 256).astype(clips.dtype)

    ys = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 1)
    xs = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 2)
    inside = (
        (xs >= xe[:, None, None])
        & (xs < (xe + we)[:, None, None])
        & (ys >= ye[:, None, None])
        & (ys < (ye + he)[:, None, None])
        & gate[:, None, None]
    )
    flat = clips.reshape(n, h, w, c)
    out = jnp.where(inside[..., None], color[:, None, None, :], flat)
    return out.reshape(b, t, h, w, c)


@partial(jax.jit, static_argnames=("train",))
def augment(rng, clips_u8, train=True):
    """Full device-side pipeline: (b,t,h,w,3) uint8 -> normalized float32."""
    if train:
        k_flip, k_erase = jax.random.split(rng)
        clips_u8 = random_flip(k_flip, clips_u8)
        clips_u8 = random_erase(k_erase, clips_u8)
    return normalize(clips_u8)
