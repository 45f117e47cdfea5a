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
