"""Baseline per-frame ResNet-50 re-ID model (the reference's ``--arch1
resnet50`` alternative, reid/models/resnet.py:12-96).

Per-frame: trunk (last-stride-1) -> global average pool -> two heads:
- ``raw``: BN'd 2048-dim feature, L2-normalized, shaped (b, t, 2048);
- ``embed``: linear 2048 -> num_features + BN, L2-normalized, (b, t, F).

Returns ``(embed, raw)`` matching the reference's ``(x, raw)`` ordering.

The reference's ``--dropout`` flag constructs an ``nn.Dropout`` that its
forward never calls (resnet.py:59-60 vs :65-96) — dropout is dead there,
so none is implemented here either.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import nn
from ..nn import functional as F
from ..nn import init as inits
from ..nn.module import Module, init_children
from .resnet import resnet50_trunk


class ResNetBaseline(Module):
    def __init__(self, num_features=512, compute_dtype=None):
        self.num_features = num_features
        self.has_embedding = num_features > 0
        self.children = {
            "base": resnet50_trunk(last_stride=1, compute_dtype=compute_dtype),
            "feat_bn2": nn.BatchNorm(2048),
        }
        if self.has_embedding:
            self.children["feat"] = nn.Linear(
                2048,
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
        b, t, h, w, c = clips.shape
        ns = {}
        x, ns["base"] = self.children["base"].apply(
            params["base"], state["base"], clips.reshape(b * t, h, w, c), training=training
        )
        x = nn.global_avg_pool(x)

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
