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

TPU-first: one shared step function runs either statically UNROLLED over
the time axis (t is a compile-time 4/8; under jit the whole chain is one
fused XLA program — no per-step dispatch) or as a ``jax.lax.scan``, with
BatchNorm running statistics threaded sequentially either way —
reproducing torch's per-step running-stat updates exactly. All 1x1 convs
are (b*h*w, cin) x (cin, cout) matmuls on the MXU.

The default picks unrolled for training, scan for eval — a MEASURED
trade-off (docs/PERFORMANCE.md round 5): training's scan pays carry/
residual stacking (``dynamic_update_slice``, ~2.9 ms/step in the round-2
train profile) that unrolling removes, while at eval the scan's holistic
operand layout wins — unrolled per-step slices forced XLA to relayout
x_corr/x_uncorr/f2 (three 402 MB copies at micro-batch 96, +3.5 ms/call)
that the scan consumes copy-free. Inputs arrive TIME-MAJOR (t, b, h, w, c)
straight from the GCE backbone (free views of its (t*b, ...) frame batch —
see gce.py), so no transposed copies of the full feature maps are ever
materialized on the way in, and the backward direction is reversed
iteration order / native scan reverse (no reversed copies either).
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

    def scan(self, params, state, x_corr, x_uncorr, *, training=False,
             reverse=False, unroll=None):
        """Run the recurrence over time.

        x_corr / x_uncorr: (t, b, h, w, c) — time-major; per-step slices
        are contiguous views. ``reverse=True`` runs the backward temporal
        direction (reversed iteration / native scan reverse), each step's
        output written at its own time position (already frame-aligned —
        the reference's explicit re-reversal, grl_model.py:170-173, is
        the identity here).

        ``unroll`` picks the loop implementation (default: unroll iff
        ``training``) — MEASURED trade-off, docs/PERFORMANCE.md round 5:
        training pays ~2.9 ms/step of scan carry/residual stacking
        (dynamic_update_slice chains saving backward residuals), which
        static unrolling removes; at eval the scan's holistic operand
        layout wins instead — unrolled per-step slices forced XLA to
        relayout x_corr/x_uncorr/f2 (three 402 MB copies at micro-batch
        96, +3.5 ms/call) while the scan consumes them copy-free.
        Returns (f_steps (t, b, c), final_memo (b, h, w, c), new_state).
        """
        c = self.children
        memo0 = jnp.mean(x_uncorr, axis=0)
        t, b, h, w, ch = x_corr.shape

        # Hoist everything that does not depend on the recurrence out of the
        # loop (exact algebra, no approximation):
        #  - f2 = relu(conv(frame)) is memory-independent → one batched
        #    (t*b*h*w, C) MXU matmul instead of t sequential ones;
        #  - mean_hw(x*atte + x) == mean_hw(x) * (1 + atte), so the enhanced
        #    (b, h, w, C) map never needs materializing — the loop body
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

        if unroll is None:
            unroll = training
        if unroll:
            carry = (memo0, state["memo"])
            f_steps = [None] * t
            order = range(t - 1, -1, -1) if reverse else range(t)
            for i in order:
                carry, f_steps[i] = step(carry, (f2_all[i], xc_mean[i], x_uncorr[i]))
            memo_final, memo_state_new = carry
            f_steps = jnp.stack(f_steps)
        else:
            (memo_final, memo_state_new), f_steps = jax.lax.scan(
                step, (memo0, state["memo"]), (f2_all, xc_mean, x_uncorr),
                reverse=reverse,
            )
        return f_steps, memo_final, {**state, "memo": memo_state_new}


class TRLBlock(Module):
    """Bidirectional TRL over a clip.

    apply input: ``(x_uncorr, x_corr)`` each (t, b, h, w, c) TIME-MAJOR
    (the GCE backbone's native output layout).
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
        x_uncorr, x_corr = x  # (t, b, h, w, c) time-major

        f_fwd, memo_f, ns_f = self.children["fwd"].scan(
            params["fwd"], state["fwd"], x_corr, x_uncorr, training=training
        )
        f_bwd, memo_b, ns_b = self.children["bwd"].scan(
            params["bwd"], state["bwd"], x_corr, x_uncorr, training=training,
            reverse=True,
        )
        # the only layout change back to batch-major is on the tiny pooled
        # features (t, b, c) — a few MB, not the full feature maps
        f_corr = jnp.moveaxis(f_fwd + f_bwd, 0, 1)
        f_uncorr = jnp.mean(memo_f, axis=(1, 2)) + jnp.mean(memo_b, axis=(1, 2))
        return (f_uncorr, f_corr), {"fwd": ns_f, "bwd": ns_b}
