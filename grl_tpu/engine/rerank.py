"""k-reciprocal re-ranking (Zhong et al., CVPR 2017).

Same algorithm the reference exposes behind ``--rerank``
(reid/evaluator/rerank.py:37-104), re-designed from the paper's definition
for vector hardware: the per-sample python loops that build the
k-reciprocal sets and their 2/3-overlap expansion become three boolean
matrix products over the top-k adjacency matrix — MXU/BLAS work instead of
~11k python iterations. The final Jaccard step walks the sparse rows of the
membership-weight matrix V exactly like the original.

Definitions (n = #query + #gallery, D = column-normalized squared dist):
- A[i, j]      = j among i's k1+1 nearest (incl. self)
- R = A ∧ Aᵀ   : k-reciprocal sets
- B            : same with ⌊k1/2⌋-neighborhoods
- expansion: R'(i) = R(i) ∪ { B(c) : c ∈ R(i), |B(c) ∩ R(i)| > ⅔|B(c)| }
- V[i]         = softmax-style exp(-D[i]) masked to R'(i), row-normalized
- query expansion: V ← mean of V over each row's k2 nearest
- Jaccard dist = 1 − Σ_k min(V[i,k], V[j,k]) / (2 − Σ_k min(...))
- final = (1−λ)·Jaccard + λ·D[:q]
"""

from __future__ import annotations

import numpy as np


def re_ranking_device(
    q_g_dist, q_q_dist, g_g_dist, k1=20, k2=6, lambda_value=0.3, interpret=False,
    mesh=None,
):
    """k-reciprocal re-ranking on the TPU.

    Same math as :func:`re_ranking` (reference reid/evaluator/rerank.py:
    37-104), executed as one jit program: top-k adjacency via
    ``lax.top_k``, the k-reciprocal set algebra as MXU boolean matmuls
    (counts ≤ k1+1 are exact in fp32 accumulation), query expansion as k2
    accumulated row-gathers, and the Jaccard min-sum as the Pallas
    min-plus kernel (grl_tpu/ops/minplus.py). Seconds on one chip vs
    minutes of host numpy at MARS scale (1980 + 9330 tracklets).

    With ``mesh`` (a 1-axis ``jax.sharding.Mesh``), the Jaccard min-sum —
    the dominant cost at LS-VID scale — fans out over the mesh with query
    rows sharded and V replicated (each chip runs the Pallas kernel on its
    row block; no cross-chip traffic beyond the broadcast).
    """
    import jax.numpy as jnp

    from ..ops import minplus_matmul

    query_num = q_g_dist.shape[0]
    if (k1, k2) not in _BUILD_V_CACHE:
        _BUILD_V_CACHE[(k1, k2)] = _make_build_v(k1, k2)
    _build_v = _BUILD_V_CACHE[(k1, k2)]

    v, original = _build_v(
        jnp.asarray(q_g_dist), jnp.asarray(q_q_dist), jnp.asarray(g_g_dist)
    )
    if mesh is None:
        min_sum = minplus_matmul(v[:query_num], v, interpret=interpret)
    else:
        import jax
        from jax.sharding import PartitionSpec as P

        axis = mesh.axis_names[0]
        ndev = mesh.shape[axis]
        rows = -(-query_num // ndev) * ndev  # pad so rows shard evenly
        vq = jnp.pad(v[:query_num], ((0, rows - query_num), (0, 0)))
        min_sum = jax.shard_map(
            lambda a, b: minplus_matmul(a, b, interpret=interpret),
            mesh=mesh,
            in_specs=(P(axis, None), P(None, None)),
            out_specs=P(axis, None),
            check_vma=False,  # pallas_call outputs carry no vma annotation
        )(vq, v)[:query_num]
    jaccard = 1.0 - min_sum / (2.0 - min_sum)
    final = jaccard * (1 - lambda_value) + original[:query_num] * lambda_value
    # returned device-resident: downstream CMC/mAP also runs on device, so
    # the (q, g) matrix need never cross the host boundary
    return final[:, query_num:]


_BUILD_V_CACHE = {}


def _make_build_v(k1, k2):
    """Jitted membership-weight builder, cached per (k1, k2) — a fresh jit
    per call would recompile the whole set-algebra program every time."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _build_v(q_g, q_q, g_g):
        original = jnp.concatenate(
            [
                jnp.concatenate([q_q, q_g], axis=1),
                jnp.concatenate([q_g.T, g_g], axis=1),
            ],
            axis=0,
        )
        original = jnp.square(original).astype(jnp.float32)
        original = (original / jnp.max(original, axis=0)).T
        n = original.shape[0]
        rows = jnp.arange(n)[:, None]

        def topk_adj(k):
            _, idx = jax.lax.top_k(-original, k)
            return jnp.zeros((n, n), bool).at[rows, idx].set(True)

        reciprocal = topk_adj(k1 + 1)
        reciprocal &= reciprocal.T

        half = int(np.around(k1 / 2.0)) + 1
        b = topk_adj(half)
        b &= b.T
        b_sizes = jnp.sum(b, axis=1).astype(jnp.float32)

        rf = reciprocal.astype(jnp.bfloat16)
        bf = b.astype(jnp.bfloat16)
        overlap = jnp.dot(rf, bf.T, preferred_element_type=jnp.float32)
        qualifies = reciprocal & (overlap > (2.0 / 3.0) * b_sizes[None, :])
        expanded = jnp.dot(
            qualifies.astype(jnp.bfloat16), bf, preferred_element_type=jnp.float32
        )
        expansion = reciprocal | (expanded > 0)

        weights = jnp.exp(-original) * expansion
        v = weights / jnp.sum(weights, axis=1, keepdims=True)

        if k2 != 1:
            _, idx2 = jax.lax.top_k(-original, k2)
            acc = v[idx2[:, 0]]
            for j in range(1, k2):  # accumulated gathers: no (n, k2, n) blow-up
                acc = acc + v[idx2[:, j]]
            v = acc / k2
        return v, original

    return _build_v


def _topk_adjacency(rank, k):
    n = rank.shape[0]
    adj = np.zeros((n, n), dtype=bool)
    np.put_along_axis(adj, rank[:, :k], True, axis=1)
    return adj


def re_ranking(q_g_dist, q_q_dist, g_g_dist, k1=20, k2=6, lambda_value=0.3):
    query_num = q_g_dist.shape[0]

    original = np.concatenate(
        [
            np.concatenate([q_q_dist, q_g_dist], axis=1),
            np.concatenate([q_g_dist.T, g_g_dist], axis=1),
        ],
        axis=0,
    )
    original = np.power(original, 2).astype(np.float32)
    original = np.transpose(original / np.max(original, axis=0))
    n = original.shape[0]

    rank = np.argsort(original, axis=1).astype(np.int32)

    reciprocal = _topk_adjacency(rank, k1 + 1)
    reciprocal &= reciprocal.T

    half = int(np.around(k1 / 2.0)) + 1
    b = _topk_adjacency(rank, half)
    b &= b.T
    b_sizes = b.sum(axis=1).astype(np.float32)

    # overlap[i, c] = |R(i) ∩ B(c)|; expand R(i) by qualifying candidates'
    # B-sets in one more boolean product.
    rf = reciprocal.astype(np.float32)
    bf = b.astype(np.float32)
    overlap = rf @ bf.T
    qualifies = reciprocal & (overlap > (2.0 / 3.0) * b_sizes[None, :])
    expansion = reciprocal | ((qualifies.astype(np.float32) @ bf) > 0)

    weights = np.exp(-original) * expansion
    v = weights / weights.sum(axis=1, keepdims=True)

    if k2 != 1:
        sel = _topk_adjacency(rank, k2).astype(np.float32)
        v = (sel @ v) / k2

    original = original[:query_num]

    # Sparse min-sum: V rows touch only a few dozen columns.
    inv_index = [np.flatnonzero(v[:, j]) for j in range(n)]
    jaccard = np.zeros((query_num, n), dtype=np.float32)
    for i in range(query_num):
        min_sum = np.zeros(n, dtype=np.float32)
        for j in np.flatnonzero(v[i]):
            rows = inv_index[j]
            min_sum[rows] += np.minimum(v[i, j], v[rows, j])
        jaccard[i] = 1.0 - min_sum / (2.0 - min_sum)

    final = jaccard * (1 - lambda_value) + original * lambda_value
    return final[:, query_num:]
