"""Two-stream (RGB + optical flow) per-frame re-ID model.

Functional equivalent of the reference's two-modality path: the sequence
preprocessor loads RGB and flow companions per frame
(reid/data/seqpreprocessor.py:29-44) and the legacy evaluator drove
img+flow models (reid/evaluator/evaluator.py:59-208) — all dead code on
the reference's live GRL path, so this mirrors the *intended* design, not
a bit-level port.

TPU-first packing: both modalities ride one (b, t, h, w, 6) uint8 tensor
through the host pipeline (ClipDataset(flow_map=...)); normalize tiles the
ImageNet stats over both 3-channel groups exactly like the reference's
per-modality Normalize. Each stream has its own trunk (the classic
two-stream CNN layout), per-frame global-average-pooled; fused by
channel concat -> BatchNorm -> L2 (raw head) with an optional linear
embedding head — the same head structure as ResNetBaseline, so the
Siamese/eval machinery is reused unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import nn
from ..nn import functional as F
from ..nn import init as inits
from ..nn.module import Module, init_children
from .resnet import ResNetTrunk, resnet50_trunk


class TwoStreamBaseline(Module):
    def __init__(self, num_features=512, rgb_trunk=None, flow_trunk=None, compute_dtype=None):
        rgb = rgb_trunk if rgb_trunk is not None else resnet50_trunk(
            last_stride=1, compute_dtype=compute_dtype
        )
        # the flow stream is conventionally shallower; default mirrors the
        # rgb trunk unless a lighter one is passed
        flow = flow_trunk if flow_trunk is not None else resnet50_trunk(
            last_stride=1, compute_dtype=compute_dtype
        )
        self.num_features = num_features
        self.has_embedding = num_features > 0
        self.num_feat = rgb.out_channels + flow.out_channels
        self.children = {
            "rgb": rgb,
            "flow": flow,
            "feat_bn2": nn.BatchNorm(self.num_feat),
        }
        if self.has_embedding:
            self.children["feat"] = nn.Linear(
                self.num_feat,
                num_features,
                kernel_init=lambda r, s: inits.kaiming_uniform(r, s, mode="fan_out"),
                compute_dtype=compute_dtype,
            )
            self.children["feat_bn"] = nn.BatchNorm(num_features)

    def init(self, rng):
        params, state = init_children(rng, self.children)
        if self.has_embedding:
            params["feat"]["bias"] = jnp.zeros_like(params["feat"]["bias"])
        return params, state

    def apply(self, params, state, clips, *, training=False):
        """clips: (b, t, h, w, 6) normalized float — RGB | flow on channels.

        Returns ``(embed (b,t,F), raw (b,t,C_rgb+C_flow))`` like
        ResNetBaseline's ``(x, raw)``.
        """
        b, t, h, w, c = clips.shape
        if c != 6:
            raise ValueError(f"two-stream clips need 6 channels (rgb|flow), got {c}")
        frames = clips.reshape(b * t, h, w, c)
        ns = {}
        xr, ns["rgb"] = self.children["rgb"].apply(
            params["rgb"], state["rgb"], frames[..., :3], training=training
        )
        xf, ns["flow"] = self.children["flow"].apply(
            params["flow"], state["flow"], frames[..., 3:], training=training
        )
        x = jnp.concatenate([nn.global_avg_pool(xr), nn.global_avg_pool(xf)], axis=1)

        raw, ns["feat_bn2"] = self.children["feat_bn2"].apply(
            params["feat_bn2"], state["feat_bn2"], x, training=training
        )
        raw = F.l2_unit(raw, axis=1).reshape(b, t, -1)

        if self.has_embedding:
            emb, _ = self.children["feat"].apply(params["feat"], {}, x)
            emb, ns["feat_bn"] = self.children["feat_bn"].apply(
                params["feat_bn"], state["feat_bn"], emb, training=training
            )
            emb = F.l2_unit(emb, axis=1).reshape(b, t, -1)
        else:
            emb = raw
        return (emb, raw), ns


def two_stream_tiny(num_features=16):
    """Tiny variant for tests/smoke runs."""
    return TwoStreamBaseline(
        num_features=num_features,
        rgb_trunk=ResNetTrunk(layers=(1, 1, 1, 1), width=4),
        flow_trunk=ResNetTrunk(layers=(1, 1, 1, 1), width=4),
    )
