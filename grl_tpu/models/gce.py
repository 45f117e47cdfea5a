"""GCE — Global Correlation Estimation.

A clip-level global feature gates every frame's feature map into a
"correlated" (person-relevant) and "uncorrelated" stream via a 1-channel
sigmoid spatial mask. Semantics follow reference reid/models/basebranch.py:
- global feature = mean over (h, w, t) of the trunk output (:58);
- ``glo_fc``: 2048 -> 1024 linear + BN + ReLU (:38-40);
- mask head ``corr_atte``: concat(frame map, broadcast global) -> 1x1 convs
  3072 -> 1024 -> 256 -> 1 with BN (incl. 1-channel BN on the logit) (:42-50);
- ``x_corr = x * sigmoid(mask)``, ``x_uncorr = x * (1 - sigmoid(mask))``
  (:63-67).

TPU-first shape discipline: everything stays NHWC; frames ride the batch
axis TIME-MAJOR as (t*b, 16, 8, 2048); the broadcastized global feature is
expanded lazily by XLA (no materialized 3072-channel concat in HBM — fused
by XLA into the first 1x1 conv's matmul).

Why time-major: the downstream TRL recurrence consumes (t, b, ...) slices.
With batch-major trunk outputs that cost two (b,t)->(t,b) transposes of
the full 2048-channel feature maps (~0.8 GB of HBM traffic per describe
micro-batch — the measured "reshape" overhead in the round-2 profile);
transposing the 3-channel INPUT clip instead moves ~5x fewer bytes and
XLA fuses it into the preceding elementwise normalize. Frame order through
the trunk is irrelevant to per-frame convs, and BN batch statistics are
order-invariant.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import nn
from ..nn import functional as F
from ..nn.conv import conv2d
from ..nn.module import Module, init_children
from .resnet import resnet50_trunk


class GCEBackbone(Module):
    """ResNet-50 trunk + global-correlation split.

    apply(...) input: (b, t, h, w, 3) clip batch.
    Returns ((x_uncorr, x_corr, corr_map), state) TIME-MAJOR:
      x_uncorr, x_corr: (t, b, 16, 8, 2048); corr_map: (t, b, 16, 8, 1)
    — free views of the trunk's (t*b, ...) frame batch, ready for the TRL
    recurrence with no full-feature-map transposes (see module docstring).
    """

    def __init__(self, trunk=None, compute_dtype=None):
        cd = compute_dtype
        self.compute_dtype = cd
        trunk = trunk if trunk is not None else resnet50_trunk(last_stride=1, compute_dtype=cd)
        ch = trunk.out_channels  # 2048 for ResNet-50
        glo = ch // 2            # 1024
        mid = ch // 8            # 256
        self.out_channels = ch
        self.children = {
            "base": trunk,
            "glo_fc": nn.Sequential(
                nn.Linear(ch, glo, compute_dtype=cd),
                nn.BatchNorm(glo),
                nn.Lambda(F.relu),
            ),
            "corr_atte": nn.Sequential(
                nn.Conv2d(ch + glo, glo, 1, bias=False, compute_dtype=cd),
                nn.BatchNorm(glo),
                nn.Conv2d(glo, mid, 1, bias=False, compute_dtype=cd),
                nn.BatchNorm(mid),
                nn.Lambda(F.relu),
                nn.Conv2d(mid, 1, 1, bias=False, compute_dtype=cd),
                nn.BatchNorm(1),
            ),
        }

    def init(self, rng):
        return init_children(rng, self.children)

    def apply(self, params, state, clips, *, training=False):
        b, t, h, w, c = clips.shape
        frames = jnp.moveaxis(clips, 1, 0).reshape(t * b, h, w, c)

        ns = {}
        x, ns["base"] = self.children["base"].apply(
            params["base"], state["base"], frames, training=training
        )
        fh, fw, fc = x.shape[1], x.shape[2], x.shape[3]

        # Clip-global feature: spatial + temporal mean of layer-4 maps.
        x_glo = jnp.mean(x.reshape(t, b, fh, fw, fc), axis=(0, 2, 3))
        glo, ns["glo_fc"] = self.children["glo_fc"].apply(
            params["glo_fc"], state["glo_fc"], x_glo, training=training
        )
        # The first mask conv consumes concat(x, broadcast(glo)) along
        # channels (reference basebranch.py:59-62). Because the conv is
        # linear, split its kernel rows: the frame half runs per pixel, the
        # global half runs ONCE per clip (a (b, glo) x (glo, out) matmul)
        # and enters as a broadcast bias — exact same math, ~2x fewer
        # first-conv FLOPs and no (b*t, h, w, 3072) concat in HBM.
        atte = self.children["corr_atte"]
        k_full = params["corr_atte"]["0"]["kernel"]  # (1, 1, ch+glo, glo)
        ch = x.shape[-1]
        k_x, k_g = k_full[:, :, :ch, :], k_full[0, 0, ch:, :]

        h0 = conv2d(x, k_x, compute_dtype=self.compute_dtype)
        g0 = jnp.dot(
            glo.astype(k_g.dtype), k_g, preferred_element_type=jnp.float32
        ).astype(h0.dtype)
        # frames are time-major (t*b): row ti*b + bi belongs to clip bi, so
        # the per-clip bias tiles over the leading t blocks
        h0 = h0 + jnp.tile(g0, (t, 1))[:, None, None, :]

        ns["corr_atte"] = dict(state["corr_atte"])
        h1, ns["corr_atte"]["1"] = atte[1].apply(
            params["corr_atte"]["1"], state["corr_atte"]["1"], h0, training=training
        )
        for i in (2, 3, 4, 5, 6):
            h1, ns["corr_atte"][str(i)] = atte[i].apply(
                params["corr_atte"][str(i)], state["corr_atte"][str(i)], h1, training=training
            )
        corr_map = F.sigmoid(h1)

        x_corr = x * corr_map
        x_uncorr = x * (1.0 - corr_map)

        to_clip = lambda a: a.reshape(t, b, fh, fw, a.shape[-1])
        return (to_clip(x_uncorr), to_clip(x_corr), to_clip(corr_map)), ns
