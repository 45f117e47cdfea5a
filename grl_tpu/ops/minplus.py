"""Min-plus "matmul" Pallas kernel: ``S[i, j] = sum_t min(A[i, t], B[j, t])``.

This is the Jaccard min-sum at the heart of k-reciprocal re-ranking
(reference reid/evaluator/rerank.py:88-96 computes it with a python loop
over queries and a scatter-gather per sparse column — minutes of host time
at MARS scale). The contraction is a matmul-shaped reduction whose inner
op is ``min`` instead of ``multiply``, so the MXU cannot run it; this
kernel tiles it onto the VPU with fp32 accumulation in VMEM scratch,
giving the full (q, n) x (n, n) min-sum in well under a second on one
chip.

Inputs must be non-negative (true for the re-ranking membership weights):
zero-padding the contraction axis then contributes ``min(0, x) = 0``,
which keeps padding exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# fp32 tiles: sublane multiple of 8, lane multiple of 128. Lane-axis
# slices must be 128-aligned, so the contraction chunk is 128 wide. The
# B-row (lane) tile is the throughput lever: measured on v5e at MARS scale
# (1980x11310 x 11310), TN 128 -> 1.19s, 512 -> 0.33s, 2048 -> 0.17s
# (VPU-saturated; wider is flat). Mosaic pipelines the (TM, TKI, TN)
# broadcast without materializing it.
_TM = 64    # rows of A per program
_TN = 2048  # rows of B per program (lane axis)
_TK = 512   # contraction slab per program
_TK_INNER = 128


def _minplus_kernel(a_ref, bt_ref, out_ref, acc_ref):
    """Grid (mi, nj, kk). a: (TM, TK), bt: (TK, TN) [B transposed], out: (TM, TN)."""

    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(c, acc):
        # (TM, TK_INNER, 1) vs (1, TK_INNER, TN): B arrives pre-transposed so
        # TN sits on the lane axis with no in-kernel transpose, and the VPU
        # reduces over the sublane (middle) axis.
        a_c = a_ref[:, pl.ds(c * _TK_INNER, _TK_INNER)]
        bt_c = bt_ref[pl.ds(c * _TK_INNER, _TK_INNER), :]
        m = jnp.minimum(a_c[:, :, None], bt_c[None, :, :])
        return acc + jnp.sum(m, axis=1)

    acc_ref[:] = jax.lax.fori_loop(0, _TK // _TK_INNER, body, acc_ref[:])

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _pad_to(x, rows, cols):
    return jnp.pad(x, ((0, rows - x.shape[0]), (0, cols - x.shape[1])))


@functools.partial(jax.jit, static_argnames=("interpret",))
def minplus_matmul(a, b, *, interpret=False):
    """``S[i, j] = sum_t min(a[i, t], b[j, t])`` for non-negative a, b.

    a: (m, k), b: (n, k) -> (m, n), fp32. ``interpret=True`` runs the
    Pallas interpreter (CPU tests).
    """
    m, k = a.shape
    n, k2 = b.shape
    assert k == k2, (a.shape, b.shape)
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)

    mp = pl.cdiv(m, _TM) * _TM
    np_ = pl.cdiv(n, _TN) * _TN
    kp = pl.cdiv(k, _TK) * _TK
    a_p = _pad_to(a, mp, kp)
    bt_p = _pad_to(b, np_, kp).T

    out = pl.pallas_call(
        _minplus_kernel,
        grid=(mp // _TM, np_ // _TN, kp // _TK),
        in_specs=[
            pl.BlockSpec((_TM, _TK), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TK, _TN), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TM, _TN), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_TM, _TN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp, bytes_accessed=4 * (mp * kp + np_ * kp + mp * np_),
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_p, bt_p)
    return out[:m, :n]
