"""Flagship model: ResNet-50 + GCE + TRL with BN-neck outputs.

Reference ResNet50_GRL_Model (reid/models/grl_model.py:184-229):
clips -> backbone/GCE split -> TRL -> per-stream BatchNorm1d + L2 norm.
Outputs ``x_uncorr (b, 2048)`` and ``x_corr (b, t, 2048)``.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import nn
from ..nn import functional as F
from ..nn.module import Module, init_children
from .gce import GCEBackbone
from .trl import TRLBlock


class GRLModel(Module):
    def __init__(self, trunk=None, compute_dtype=None):
        backbone = GCEBackbone(trunk=trunk, compute_dtype=compute_dtype)
        num_feat = backbone.out_channels
        self.num_feat = num_feat
        self.children = {
            "backbone": backbone,
            "temporal_learning_block": TRLBlock(num_feat, compute_dtype=compute_dtype),
            "corr_bn": nn.BatchNorm(num_feat),
            "uncorr_bn": nn.BatchNorm(num_feat),
        }

    def init(self, rng):
        return init_children(rng, self.children)

    def apply(self, params, state, clips, *, training=False):
        """clips: (b, t, h, w, 3) -> ((x_uncorr (b, C), x_corr (b, t, C)), state)."""
        b, t = clips.shape[0], clips.shape[1]
        ns = {}
        (x_uncorr, x_corr, _corr_map), ns["backbone"] = self.children["backbone"].apply(
            params["backbone"], state["backbone"], clips, training=training
        )
        (f_uncorr, f_corr), ns["temporal_learning_block"] = self.children[
            "temporal_learning_block"
        ].apply(
            params["temporal_learning_block"],
            state["temporal_learning_block"],
            (x_uncorr, x_corr),
            training=training,
        )

        f_corr_flat, ns["corr_bn"] = self.children["corr_bn"].apply(
            params["corr_bn"], state["corr_bn"], f_corr.reshape(b * t, -1), training=training
        )
        f_corr = F.l2_normalize(f_corr_flat.reshape(b, t, -1), axis=2)

        f_uncorr, ns["uncorr_bn"] = self.children["uncorr_bn"].apply(
            params["uncorr_bn"], state["uncorr_bn"], f_uncorr, training=training
        )
        f_uncorr = F.l2_normalize(f_uncorr, axis=1)

        return (f_uncorr, f_corr), ns
