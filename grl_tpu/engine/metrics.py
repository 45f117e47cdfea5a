"""Retrieval metrics: CMC curves, mAP, top-k accuracy.

``evaluate`` reproduces the reference MARS protocol
(reid/evaluator/eva_functions.py:134-184) — argsort each distance row,
drop gallery entries sharing the query's pid AND camera, CMC from the first
remaining hit, AP from cumulative precision at hits — but vectorized over
all queries (the reference loops per query in Python; here it is a handful
of numpy cumsum/argsort passes, and the heavy argsort can run on device).

``cmc``/``mean_ap`` cover the open-reid variants used by the legacy
evaluator (eva_functions.py:18-115) including allshots / cuhk03 /
market1501 configurations.
"""

from __future__ import annotations

import numpy as np


def _sorted_masks(distmat, query_ids, gallery_ids, query_cams, gallery_cams):
    # stable sort: numpy's default quicksort orders exact ties arbitrarily
    # (the reference inherits that), while jnp.argsort is stable — one
    # canonical tie order keeps host == device protocols bit-equal even
    # on tie-heavy synthetic distances
    indices = np.argsort(distmat, axis=1, kind="stable")
    g_ids_s = gallery_ids[indices]
    g_cams_s = gallery_cams[indices]
    matches = g_ids_s == query_ids[:, None]
    junk = matches & (g_cams_s == query_cams[:, None])
    return indices, matches, ~junk


def evaluate(distmat, q_pids, g_pids, q_camids, g_camids, max_rank=100):
    """MARS-protocol CMC + mAP, vectorized.

    Returns (cmc_curve[max_rank], mAP) over queries that have at least one
    valid (junk-removed) gallery match — identical to the reference's
    skip-and-renormalize behavior (eva_functions.py:159-178).
    """
    distmat = np.asarray(distmat)
    q_pids, g_pids = np.asarray(q_pids), np.asarray(g_pids)
    q_camids, g_camids = np.asarray(q_camids), np.asarray(g_camids)

    num_q, num_g = distmat.shape
    max_rank = min(max_rank, num_g)

    _, matches, keep = _sorted_masks(distmat, q_pids, g_pids, q_camids, g_camids)
    kept_matches = matches & keep
    valid = kept_matches.any(axis=1)
    if not valid.any():
        raise RuntimeError("Error: all query identities do not appear in gallery")

    # Rank of each sorted column among kept entries for its query.
    pos = np.cumsum(keep, axis=1) - 1

    # CMC: first kept hit position per query.
    big = np.iinfo(np.int64).max
    first_hit = np.where(kept_matches, pos, big).min(axis=1)
    fh = first_hit[valid]
    cmc_curve = (fh[:, None] <= np.arange(max_rank)[None, :]).mean(axis=0)

    # AP: cumulative precision at each kept hit.
    cum_hits = np.cumsum(kept_matches, axis=1)
    precision = np.where(kept_matches, cum_hits / np.maximum(pos + 1.0, 1.0), 0.0)
    num_rel = kept_matches.sum(axis=1)
    ap = precision.sum(axis=1)[valid] / num_rel[valid]

    return cmc_curve.astype(np.float32), float(ap.mean())


def _device_protocol(max_rank):
    """Build the jitted device protocol once per max_rank (module-level
    cache: defining the jit inside evaluate_device would recompile the
    whole program on every call)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _protocol(distmat, q_pids, g_pids, q_camids, g_camids):
        indices = jnp.argsort(distmat, axis=1)
        matches = g_pids[indices] == q_pids[:, None]
        junk = matches & (g_camids[indices] == q_camids[:, None])
        keep = ~junk
        kept = matches & keep
        valid = kept.any(axis=1)
        nvalid = jnp.maximum(valid.sum(), 1)

        pos = jnp.cumsum(keep, axis=1) - 1
        big = jnp.iinfo(jnp.int32).max
        first_hit = jnp.where(kept, pos, big).min(axis=1)
        hits = (first_hit[:, None] <= jnp.arange(max_rank)[None, :]) & valid[:, None]
        cmc_curve = hits.sum(axis=0) / nvalid

        cum_hits = jnp.cumsum(kept, axis=1)
        precision = jnp.where(kept, cum_hits / jnp.maximum(pos + 1.0, 1.0), 0.0)
        num_rel = jnp.maximum(kept.sum(axis=1), 1)
        ap = precision.sum(axis=1) / num_rel
        mAP = jnp.where(valid, ap, 0.0).sum() / nvalid
        return cmc_curve.astype(jnp.float32), mAP, valid.any()

    return _protocol


_DEVICE_PROTOCOLS = {}


def evaluate_device(distmat, q_pids, g_pids, q_camids, g_camids, max_rank=100, mesh=None):
    """MARS-protocol CMC + mAP computed on the accelerator.

    Same semantics as :func:`evaluate` but the (q, g) distance matrix stays
    device-resident — only the max_rank CMC curve and the mAP scalar cross
    the host boundary (the matrix pull itself dominates evaluation wall
    clock on slow interconnects).

    With ``mesh`` (1-axis), query rows shard over the mesh: each chip sorts
    and scores its row block (per-query work is independent) and XLA
    reduces the CMC/mAP sums over ICI. Padded rows get a sentinel pid
    below every real pid, so they match no gallery entry and drop out of
    the valid set.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    num_g = distmat.shape[1]
    max_rank = min(max_rank, num_g)
    if max_rank not in _DEVICE_PROTOCOLS:
        _DEVICE_PROTOCOLS[max_rank] = _device_protocol(max_rank)

    distmat = jnp.asarray(distmat)
    q_pids = np.asarray(q_pids)
    q_camids = np.asarray(q_camids)
    if mesh is not None:
        axis = mesh.axis_names[0]
        ndev = mesh.shape[axis]
        q = distmat.shape[0]
        rows = -(-q // ndev) * ndev
        distmat = jnp.pad(distmat, ((0, rows - q), (0, 0)))
        # pad sentinel must match NO gallery pid — not a constant -1,
        # which a catalog passing raw pids could legitimately contain
        # (junk pid -1), turning zero-distance pad rows into fabricated
        # rank-1 hits on the mesh path only
        sentinel = int(min(q_pids.min(), np.asarray(g_pids).min())) - 1
        q_pids = np.pad(q_pids, (0, rows - q), constant_values=sentinel)
        q_camids = np.pad(q_camids, (0, rows - q), constant_values=-1)
        row_sh = NamedSharding(mesh, P(axis))
        rep = NamedSharding(mesh, P())
        distmat = jax.device_put(distmat, NamedSharding(mesh, P(axis, None)))
        q_pids = jax.device_put(jnp.asarray(q_pids), row_sh)
        q_camids = jax.device_put(jnp.asarray(q_camids), row_sh)
        g_pids = jax.device_put(jnp.asarray(np.asarray(g_pids)), rep)
        g_camids = jax.device_put(jnp.asarray(np.asarray(g_camids)), rep)
    else:
        q_pids = jnp.asarray(q_pids)
        q_camids = jnp.asarray(q_camids)
        g_pids = jnp.asarray(np.asarray(g_pids))
        g_camids = jnp.asarray(np.asarray(g_camids))

    cmc_curve, mAP, any_valid = _DEVICE_PROTOCOLS[max_rank](
        distmat, q_pids, g_pids, q_camids, g_camids
    )
    if not bool(any_valid):
        raise RuntimeError("Error: all query identities do not appear in gallery")
    return np.asarray(cmc_curve), float(mAP)


def cmc(
    distmat,
    query_ids=None,
    gallery_ids=None,
    query_cams=None,
    gallery_cams=None,
    topk=100,
    separate_camera_set=False,
    single_gallery_shot=False,
    first_match_break=False,
    seed=None,
):
    """Open-reid CMC (eva_functions.py:18-79): junk removal keeps entries
    with different pid OR different camera; supports the allshots /
    cuhk03 (single_gallery_shot) / market1501 (first_match_break) configs."""
    distmat = np.asarray(distmat)
    m, n = distmat.shape
    query_ids = np.arange(m) if query_ids is None else np.asarray(query_ids)
    gallery_ids = np.arange(n) if gallery_ids is None else np.asarray(gallery_ids)
    query_cams = np.zeros(m, np.int32) if query_cams is None else np.asarray(query_cams)
    gallery_cams = np.ones(n, np.int32) if gallery_cams is None else np.asarray(gallery_cams)
    rng = np.random.RandomState(seed)

    indices, matches, keep = _sorted_masks(distmat, query_ids, gallery_ids, query_cams, gallery_cams)
    if separate_camera_set:
        keep &= gallery_cams[indices] != query_cams[:, None]

    ret = np.zeros(topk)
    num_valid = 0
    for i in range(m):
        valid = keep[i]
        if not np.any(matches[i] & valid):
            continue
        if single_gallery_shot:
            repeat = 10
            gids = gallery_ids[indices[i][valid]]
            inds = np.where(valid)[0]
            groups = {}
            for j, x in zip(inds, gids):
                groups.setdefault(x, []).append(j)
        else:
            repeat = 1
        for _ in range(repeat):
            # ranks are positions within the junk-COMPRESSED ordering
            # (reference matches[i, valid], eva_functions.py:66-68): junk
            # entries sorted ahead of a hit must not inflate its rank
            if single_gallery_shot:
                sampled = np.zeros(len(valid), dtype=bool)
                for _, js in groups.items():
                    sampled[rng.choice(js)] = True
                index = np.nonzero(matches[i][sampled])[0]
            else:
                index = np.nonzero(matches[i][valid])[0]
            delta = 1.0 / (len(index) * repeat)
            for j, k in enumerate(index):
                if k - j >= topk:
                    break
                if first_match_break:
                    ret[k - j] += 1
                    break
                ret[k - j] += delta
        num_valid += 1
    if num_valid == 0:
        raise RuntimeError("No valid query")
    return ret.cumsum() / num_valid


def mean_ap(distmat, query_ids=None, gallery_ids=None, query_cams=None, gallery_cams=None):
    """Open-reid mAP (eva_functions.py:82-115): AP via the interpolation-free
    precision average (equivalent to sklearn average_precision_score on the
    negated distances)."""
    distmat = np.asarray(distmat)
    m, n = distmat.shape
    query_ids = np.arange(m) if query_ids is None else np.asarray(query_ids)
    gallery_ids = np.arange(n) if gallery_ids is None else np.asarray(gallery_ids)
    query_cams = np.zeros(m, np.int32) if query_cams is None else np.asarray(query_cams)
    gallery_cams = np.ones(n, np.int32) if gallery_cams is None else np.asarray(gallery_cams)

    _, matches, keep = _sorted_masks(distmat, query_ids, gallery_ids, query_cams, gallery_cams)
    kept = matches & keep
    valid = kept.any(axis=1)
    if not valid.any():
        raise RuntimeError("No valid query")
    pos = np.cumsum(keep, axis=1) - 1
    cum_hits = np.cumsum(kept, axis=1)
    precision = np.where(kept, cum_hits / np.maximum(pos + 1.0, 1.0), 0.0)
    ap = precision.sum(axis=1)[valid] / kept.sum(axis=1)[valid]
    return float(ap.mean())


def accuracy(output, target, topk=(1,)):
    """Top-k accuracy over logits (eva_functions.py:118-131)."""
    output = np.asarray(output)
    target = np.asarray(target)
    maxk = max(topk)
    pred = np.argsort(-output, axis=1)[:, :maxk]
    correct = pred == target[:, None]
    return [float(correct[:, :k].any(axis=1).mean()) for k in topk]


def evaluate_market(distmat, q_pids, g_pids, q_camids, g_camids, max_rank=100):
    """Alternate Market-1501-style protocol (reference
    eva_functions.py:187-245): good = same pid different camera; junk =
    pid -1 or same pid same camera; AP is the trapezoidal precision-recall
    integral over the junk-compressed ranking.

    Reference quirks reproduced exactly: the sort order is truncated to
    ``max_rank`` BEFORE junk skipping (eva_functions.py:203 — hits whose
    raw rank exceeds max_rank are dropped from CMC and AP), and mAP
    averages over ALL queries including invalid ones (:209)."""
    distmat = np.asarray(distmat)
    q_pids, g_pids = np.asarray(q_pids), np.asarray(g_pids)
    q_camids, g_camids = np.asarray(q_camids), np.asarray(g_camids)
    num_q = distmat.shape[0]
    cmc_rows = np.zeros((num_q, max_rank), np.float32)
    aps = np.zeros(num_q, np.float32)
    num_valid = 0

    for k in range(num_q):
        good = (q_pids[k] == g_pids) & (q_camids[k] != g_camids)
        if not good.any():
            continue
        num_valid += 1
        junk = (g_pids == -1) | ((q_pids[k] == g_pids) & (q_camids[k] == g_camids))
        order = np.argsort(distmat[k])[:max_rank]

        num_real = int(good.sum())
        old_recall, old_precision = 0.0, 1.0
        ap = 0.0
        intersect, j, njunk, good_now = 0, 0, 0, 0
        for n, gi in enumerate(order):
            hit = bool(good[gi])
            if hit:
                cmc_rows[k, n - njunk:] = 1
                good_now += 1
            if junk[gi]:
                njunk += 1
                continue
            if hit:
                intersect += 1
            recall = intersect / num_real
            precision = intersect / (j + 1)
            ap += (recall - old_recall) * (old_precision + precision) / 2
            old_recall, old_precision = recall, precision
            j += 1
            if good_now == num_real:
                break
        aps[k] = ap

    if num_valid == 0:
        raise RuntimeError("No valid query")
    return cmc_rows.sum(0) / num_valid, float(aps.mean())
