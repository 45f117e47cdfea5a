"""TRL — Temporal Reciprocal Learning.

Bidirectional recurrent enhancement of the correlated stream driven by an
accumulating memory of the uncorrelated stream. Semantics follow reference
reid/models/grl_model.py:87-180:

- memories initialize to the temporal mean of the uncorrelated maps (:137-138);
- per step (one scan forward over t, one backward):
  * channel attention from the squared difference of 1x1-conv projections of
    memory vs the current correlated frame, squeezed through an SE-style MLP
    2048 -> 128 -> 2048 with sigmoid (:103-108, :146-150);
  * the enhanced frame (``x * atte + x``) is spatially pooled into a per-step
    feature (:151);
  * the memory advances through a 1x1-conv residual block fed
    ``memory + uncorrelated_frame`` (:51-85, :153);
- outputs: per-frame features = forward + time-aligned backward features
  (:170-176); clip-level uncorrelated feature = pooled final memories of both
  directions (:178).

TPU-first: the python-loop recurrences become two ``jax.lax.scan``s over the
time axis (XLA compiles one fused step; no per-step dispatch), with BatchNorm
running statistics threaded through the scan carry — reproducing torch's
sequential per-step running-stat updates exactly. All 1x1 convs are (b*h*w,
cin) x (cin, cout) matmuls on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import nn
from ..nn import functional as F
from ..nn.module import Module, init_children


class MemoryBlock(Module):
    """1x1-conv residual block advancing the uncorrelated memory.

    Reference BasicBlock (reid/models/grl_model.py:51-85): the two inputs are
    summed, then 2048 -> 512 -> 512 -> 2048 convs with BN/ReLU and a residual
    connection from the sum.
    """

    def __init__(self, channels=2048, bottleneck=512, compute_dtype=None):
        cd = compute_dtype
        self.children = {
            "conv1": nn.Conv2d(channels, bottleneck, 1, bias=False, compute_dtype=cd),
            "bn1": nn.BatchNorm(bottleneck),
            "conv2": nn.Conv2d(bottleneck, bottleneck, 1, bias=False, compute_dtype=cd),
            "bn2": nn.BatchNorm(bottleneck),
            "conv3": nn.Conv2d(bottleneck, channels, 1, bias=False, compute_dtype=cd),
            "bn3": nn.BatchNorm(channels),
        }

    def init(self, rng):
        return init_children(rng, self.children)

    def apply(self, params, state, x, *, training=False):
        c = self.children
        ns = {"conv1": {}, "conv2": {}, "conv3": {}}
        out, _ = c["conv1"].apply(params["conv1"], {}, x)
        out, ns["bn1"] = c["bn1"].apply(params["bn1"], state["bn1"], out, training=training)
        out = F.relu(out)
        out, _ = c["conv2"].apply(params["conv2"], {}, out)
        out, ns["bn2"] = c["bn2"].apply(params["bn2"], state["bn2"], out, training=training)
        out = F.relu(out)
        out, _ = c["conv3"].apply(params["conv3"], {}, out)
        out, ns["bn3"] = c["bn3"].apply(params["bn3"], state["bn3"], out, training=training)
        return F.relu(out + x), ns


class _Direction(Module):
    """One temporal direction: projections + SE attention + memory block."""

    def __init__(self, channels=2048, se_ratio=16, compute_dtype=None):
        cd = compute_dtype
        self.children = {
            "f1": nn.Conv2d(channels, channels, 1, bias=True, compute_dtype=cd),
            "f2": nn.Conv2d(channels, channels, 1, bias=True, compute_dtype=cd),
            "atte": nn.Sequential(
                nn.Linear(channels, channels // se_ratio, bias=False, compute_dtype=cd),
                nn.Lambda(F.relu),
                nn.Linear(channels // se_ratio, channels, bias=False, compute_dtype=cd),
                nn.Lambda(F.sigmoid),
            ),
            "memo": MemoryBlock(channels, channels // 4, compute_dtype=cd),
        }

    def init(self, rng):
        return init_children(rng, self.children)

    def scan(self, params, state, x_corr, x_uncorr, *, training=False, reverse=False):
        """Run the recurrence over time.

        x_corr / x_uncorr: (t, b, h, w, c) — time-major for lax.scan.
        ``reverse=True`` runs the backward temporal direction natively
        (lax.scan iterates last-to-first and writes each step's output at
        its own time position — already frame-aligned, so no reversed
        copies of the 0.5 GB clip tensors are ever materialized).
        Returns (f_steps (t, b, c), final_memo (b, h, w, c), new_state).
        """
        c = self.children
        memo0 = jnp.mean(x_uncorr, axis=0)
        t, b, h, w, ch = x_corr.shape

        # Hoist everything that does not depend on the recurrence out of the
        # scan (exact algebra, no approximation):
        #  - f2 = relu(conv(frame)) is memory-independent → one batched
        #    (t*b*h*w, C) MXU matmul instead of t sequential ones;
        #  - mean_hw(x*atte + x) == mean_hw(x) * (1 + atte), so the enhanced
        #    (b, h, w, C) map never needs materializing — the scan body
        #    touches x_corr only through f2 and its precomputed spatial mean.
        f2_all, _ = c["f2"].apply(params["f2"], state["f2"], x_corr.reshape(t * b, h, w, ch))
        f2_all = F.relu(f2_all).reshape(t, b, h, w, ch)
        xc_mean = jnp.mean(x_corr, axis=(2, 3))  # (t, b, ch)

        def step(carry, xs):
            memo, bn_state = carry
            f2, xcm, xu = xs
            f1, _ = c["f1"].apply(params["f1"], state["f1"], memo)
            f1 = F.relu(f1)
            diff = jnp.mean(jnp.square(f1 - f2), axis=(1, 2))
            atte, _ = c["atte"].apply(params["atte"], state["atte"], diff)
            f_step = xcm * (1.0 + atte)
            new_memo, new_bn = c["memo"].apply(
                params["memo"], bn_state, memo + xu, training=training
            )
            return (new_memo, new_bn), f_step

        (memo_final, memo_state_new), f_steps = jax.lax.scan(
            step, (memo0, state["memo"]), (f2_all, xc_mean, x_uncorr), reverse=reverse
        )
        return f_steps, memo_final, {**state, "memo": memo_state_new}


class TRLBlock(Module):
    """Bidirectional TRL over a clip.

    apply input: ``(x_uncorr, x_corr)`` each (b, t, h, w, c).
    Returns ``((f_uncorr (b, c), f_corr (b, t, c)), state)``.
    """

    def __init__(self, channels=2048, compute_dtype=None):
        self.children = {
            "fwd": _Direction(channels, compute_dtype=compute_dtype),
            "bwd": _Direction(channels, compute_dtype=compute_dtype),
        }

    def init(self, rng):
        return init_children(rng, self.children)

    def apply(self, params, state, x, *, training=False):
        x_uncorr, x_corr = x
        # time-major for scan
        xc = jnp.moveaxis(x_corr, 1, 0)
        xu = jnp.moveaxis(x_uncorr, 1, 0)

        f_fwd, memo_f, ns_f = self.children["fwd"].scan(
            params["fwd"], state["fwd"], xc, xu, training=training
        )
        # reverse=True runs the backward direction over the SAME clip
        # tensors (no reversed copies) and emits features already in frame
        # order — the reference's explicit re-reversal (:170-173) is the
        # identity here.
        f_bwd, memo_b, ns_b = self.children["bwd"].scan(
            params["bwd"], state["bwd"], xc, xu, training=training, reverse=True
        )
        f_corr = jnp.moveaxis(f_fwd + f_bwd, 0, 1)
        f_uncorr = jnp.mean(memo_f, axis=(1, 2)) + jnp.mean(memo_b, axis=(1, 2))
        return (f_uncorr, f_corr), {"fwd": ns_f, "bwd": ns_b}
