"""Siamese temporal pooling + pairwise verification heads.

``Siamese`` (reference reid/models/Siamese.py:42-142): QKV self-attention
pooling over a clip's per-frame features — Q/K are 2048 -> 512 linear + BN +
row-unit-norm projections, softmax(Q Kᵀ) weights applied to the *raw*
2048-dim frames, summed over time and unit-normalized (:79-106). The forward
pass splits an interleaved (anchor, positive) batch into probe/gallery
halves, pools each, and classifies all probe x gallery squared differences
through BN + linear into 2-way verification scores (:108-142).

``SiameseVideo`` (reference reid/models/Siamese_video.py:129-184): the
degenerate head for the clip-level uncorrelated stream — no pooling (input is
already (b, c)), same pairwise-difference classifier.

Batch-layout contract: pairs are adjacent (even index = probe/anchor, odd =
gallery/positive) — produced by the pair sampler; under data parallelism the
pair axis (b/2) is what gets sharded so a pair never straddles devices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import nn
from ..nn import functional as F
from ..nn import init as inits
from ..nn.module import Module, init_children


def _kaiming_linear(rng, shape):
    # reference weights_init_kaiming for Linear: kaiming_uniform(fan_out)
    # (reid/models/Siamese.py:18-22).
    return inits.kaiming_uniform(rng, shape, a=0.0, mode="fan_out")


def _classifier_init(rng, shape):
    # reference weights_init_classifier: normal(std=0.001) (Siamese.py:33-39).
    return inits.normal(rng, shape, std=0.001)


def pairwise_verification(classifier_bn, classifier_linear, params, state, probe, gallery, *, training=False):
    """All-pairs squared-diff -> BN -> linear 2-way scores.

    probe: (Np, C), gallery: (Ng, C) -> (Np, Ng, 2).
    """
    np_, ng = probe.shape[0], gallery.shape[0]
    diff = jnp.square(probe[:, None, :] - gallery[None, :, :]).reshape(np_ * ng, -1)
    ns = {}
    diff, ns["classifierBN"] = classifier_bn.apply(
        params["classifierBN"], state["classifierBN"], diff, training=training
    )
    scores, _ = classifier_linear.apply(params["classifierlinear"], {}, diff)
    return scores.reshape(np_, ng, 2), ns


class Siamese(Module):
    def __init__(self, input_num=2048, output_num=512, class_num=2, compute_dtype=None):
        cd = compute_dtype
        self.input_num = input_num
        self.output_num = output_num
        self.children = {
            "featQ": nn.Linear(input_num, output_num, kernel_init=_kaiming_linear, compute_dtype=cd),
            "featQ_bn": nn.BatchNorm(output_num),
            "featK": nn.Linear(input_num, output_num, kernel_init=_kaiming_linear, compute_dtype=cd),
            "featK_bn": nn.BatchNorm(output_num),
            # featV exists in the reference state_dict but is never applied
            # (Siamese.py:64-67 defined, :99-100 uses raw V) — kept for
            # checkpoint-shape compatibility.
            "featV": nn.Linear(input_num, output_num, kernel_init=_kaiming_linear, compute_dtype=cd),
            "featV_bn": nn.BatchNorm(output_num),
            "classifierBN": nn.BatchNorm(input_num),
            "classifierlinear": nn.Linear(input_num, class_num, kernel_init=_classifier_init, compute_dtype=cd),
        }

    def init(self, rng):
        params, state = init_children(rng, self.children)
        # reference classifier bias init: constant 0 (Siamese.py:39)
        params["classifierlinear"]["bias"] = jnp.zeros_like(params["classifierlinear"]["bias"])
        # reference kaiming-init'd Linear biases are zeroed (Siamese.py:22)
        for k in ("featQ", "featK", "featV"):
            params[k]["bias"] = jnp.zeros_like(params[k]["bias"])
        return params, state

    def self_attention(self, params, state, x, *, training=False):
        """Attention-pool (b, t, C) -> (b, C)."""
        b, t, c = x.shape
        ns = dict(state)

        def project(name, flat):
            y, _ = self.children[name].apply(params[name], {}, flat)
            y, ns[f"{name}_bn"] = self.children[f"{name}_bn"].apply(
                params[f"{name}_bn"], state[f"{name}_bn"], y, training=training
            )
            return F.l2_unit(y, axis=1).reshape(b, t, -1)

        q = project("featQ", x.reshape(b * t, c))
        k = project("featK", x.reshape(b * t, c))
        weights = jnp.einsum("bij,bkj->bik", q, k, preferred_element_type=jnp.float32)
        weights = jax.nn.softmax(weights, axis=-1)
        pooled = jnp.einsum("bik,bkc->bic", weights, x, preferred_element_type=jnp.float32)
        pooled = jnp.sum(pooled, axis=1)
        return F.l2_unit(pooled, axis=1), ns

    def apply(self, params, state, x, *, training=False):
        """x: (b, t, C) interleaved pairs -> ((scores (b/2, b/2, 2), pooled (b, C)), state)."""
        b = x.shape[0]
        pairs = x.reshape(b // 2, 2, x.shape[1], x.shape[2])
        probe, gallery = pairs[:, 0], pairs[:, 1]

        # Probe then gallery — running-stat update order matches the
        # reference's sequential calls (Siamese.py:123-124).
        pooled_probe, ns = self.self_attention(params, state, probe, training=training)
        pooled_gallery, ns2 = self.self_attention(params, ns, gallery, training=training)

        siamese_out = jnp.concatenate([pooled_probe, pooled_gallery], axis=0)
        scores, ns_cls = pairwise_verification(
            self.children["classifierBN"],
            self.children["classifierlinear"],
            params,
            ns2,
            pooled_probe,
            pooled_gallery,
            training=training,
        )
        ns2.update(ns_cls)
        return (scores, siamese_out), ns2


class SiameseVideo(Module):
    """Verification head for the (b, C) uncorrelated stream."""

    def __init__(self, input_num=2048, output_num=2048, class_num=2, compute_dtype=None):
        self.children = {
            "classifierBN": nn.BatchNorm(input_num),
            "classifierlinear": nn.Linear(
                input_num, class_num, kernel_init=_classifier_init, compute_dtype=compute_dtype
            ),
        }

    def init(self, rng):
        params, state = init_children(rng, self.children)
        params["classifierlinear"]["bias"] = jnp.zeros_like(params["classifierlinear"]["bias"])
        return params, state

    def apply(self, params, state, x, *, training=False):
        b = x.shape[0]
        pairs = x.reshape(b // 2, 2, -1)
        probe, gallery = pairs[:, 0], pairs[:, 1]
        siamese_out = jnp.concatenate([probe, gallery], axis=0)
        scores, ns = pairwise_verification(
            self.children["classifierBN"],
            self.children["classifierlinear"],
            params,
            state,
            probe,
            gallery,
            training=training,
        )
        return (scores, siamese_out), {**state, **ns}
