"""Metric correctness vs straightforward per-query loop oracles."""

import numpy as np
import pytest

from grl_tpu.engine import metrics
from grl_tpu.engine.rerank import re_ranking


def mars_oracle(distmat, q_pids, g_pids, q_camids, g_camids, max_rank=100):
    """Loop oracle for the MARS protocol (one query at a time)."""
    num_q, num_g = distmat.shape
    max_rank = min(max_rank, num_g)
    cmcs, aps = [], []
    for qi in range(num_q):
        order = np.argsort(distmat[qi])
        pids, cams = g_pids[order], g_camids[order]
        keep = ~((pids == q_pids[qi]) & (cams == q_camids[qi]))
        hits = (pids[keep] == q_pids[qi]).astype(np.int64)
        if hits.sum() == 0:
            continue
        curve = np.clip(np.cumsum(hits), 0, 1)[:max_rank]
        if len(curve) < max_rank:
            curve = np.pad(curve, (0, max_rank - len(curve)), constant_values=curve[-1])
        cmcs.append(curve)
        prec = np.cumsum(hits) / (np.arange(len(hits)) + 1.0)
        aps.append((prec * hits).sum() / hits.sum())
    return np.mean(cmcs, axis=0), float(np.mean(aps))


def random_protocol_case(seed, num_q=12, num_g=40, num_ids=6, num_cams=3):
    rng = np.random.RandomState(seed)
    q_pids = rng.randint(0, num_ids, num_q)
    g_pids = rng.randint(0, num_ids, num_g)
    q_cams = rng.randint(0, num_cams, num_q)
    g_cams = rng.randint(0, num_cams, num_g)
    dist = rng.rand(num_q, num_g).astype(np.float32)
    return dist, q_pids, g_pids, q_cams, g_cams


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_evaluate_matches_loop_oracle(seed):
    dist, qp, gp, qc, gc = random_protocol_case(seed)
    got_cmc, got_map = metrics.evaluate(dist, qp, gp, qc, gc, max_rank=10)
    want_cmc, want_map = mars_oracle(dist, qp, gp, qc, gc, max_rank=10)
    np.testing.assert_allclose(got_cmc, want_cmc, rtol=1e-6)
    np.testing.assert_allclose(got_map, want_map, rtol=1e-6)


def test_evaluate_perfect_ranking():
    # gallery ordered exactly by identity match -> rank-1 = 1, mAP = 1
    q_pids = np.array([0, 1])
    g_pids = np.array([0, 1, 2, 3])
    dist = np.array([[0.0, 1, 1, 1], [1, 0.0, 1, 1]], dtype=np.float32)
    cmc_curve, mAP = metrics.evaluate(dist, q_pids, g_pids, np.zeros(2), np.ones(4))
    assert cmc_curve[0] == 1.0 and mAP == 1.0


def test_evaluate_junk_removal():
    # the best match shares pid+cam with the query -> junk, so the true hit
    # is the later different-cam entry and still counts at rank 1
    q_pids, q_cams = np.array([5]), np.array([2])
    g_pids = np.array([5, 5, 7])
    g_cams = np.array([2, 0, 1])
    dist = np.array([[0.0, 0.5, 0.2]], dtype=np.float32)
    cmc_curve, mAP = metrics.evaluate(dist, q_pids, g_pids, q_cams, g_cams)
    # after junk removal the order is [pid7(0.2), pid5/cam0(0.5)]
    assert cmc_curve[0] == 0.0 and cmc_curve[1] == 1.0
    np.testing.assert_allclose(mAP, 0.5)


def test_mean_ap_matches_sklearn():
    from sklearn.metrics import average_precision_score

    dist, qp, gp, qc, gc = random_protocol_case(7)
    got = metrics.mean_ap(dist, qp, gp, qc, gc)
    aps = []
    for i in range(dist.shape[0]):
        order = np.argsort(dist[i])
        valid = (gp[order] != qp[i]) | (gc[order] != qc[i])
        y = (gp[order] == qp[i])[valid]
        s = -dist[i][order][valid]
        if y.any():
            aps.append(average_precision_score(y, s))
    np.testing.assert_allclose(got, np.mean(aps), rtol=1e-6)


def test_accuracy_topk():
    out = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1], [0.2, 0.3, 0.5]])
    tgt = np.array([1, 2, 2])
    top1, top2 = metrics.accuracy(out, tgt, topk=(1, 2))
    np.testing.assert_allclose(top1, 2 / 3)
    np.testing.assert_allclose(top2, 2 / 3)


def test_cmc_first_match_break():
    dist = np.array([[0.1, 0.2, 0.3]])
    res = metrics.cmc(
        dist, np.array([0]), np.array([1, 0, 0]),
        np.array([0]), np.array([1, 1, 1]),
        topk=3, first_match_break=True,
    )
    np.testing.assert_allclose(res, [0, 1, 1])


def test_evaluate_device_fuzz_matches_host():
    """Randomized sweep: the device protocol must equal the host numpy
    protocol across gallery shapes, pid collisions, junk densities, and
    tie-prone distances (quantized to force ties)."""
    import jax

    for seed in range(8):
        rng = np.random.RandomState(seed)
        q = rng.randint(2, 12)
        g = rng.randint(q, 40)
        n_ids = rng.randint(2, 6)
        n_cams = rng.randint(2, 4)
        # quantized distances produce frequent ties
        dist = (rng.randint(0, 12, (q, g)) / 4.0).astype(np.float32)
        q_pids = rng.randint(0, n_ids, q)
        g_pids = np.concatenate([q_pids, rng.randint(0, n_ids, g - q)])
        rng.shuffle(g_pids)
        q_cams = rng.randint(0, n_cams, q)
        g_cams = rng.randint(0, n_cams, g)
        try:
            ref = metrics.evaluate(dist, q_pids, g_pids, q_cams, g_cams, max_rank=10)
        except RuntimeError:
            continue  # no valid query in this draw; device raises too
        dev = metrics.evaluate_device(dist, q_pids, g_pids, q_cams, g_cams, max_rank=10)
        np.testing.assert_allclose(dev[0], ref[0], atol=1e-6, err_msg=f"seed {seed}")
        assert abs(dev[1] - ref[1]) < 1e-6, f"seed {seed}"


def test_rrs_grid_invariants_sweep():
    """RRS chunk-grid invariants over every (num_frames, seq_len) pair the
    workload can produce: exactly seq_len pools, pools cover prefix
    indices in order, short tracklets repeat the last frame, rrs_test
    takes each pool's first frame, dense clips are seq_len wide and cover
    every frame at least once."""
    from grl_tpu.data import sampling

    for seq_len in (2, 4, 6, 8):
        for n in range(1, 36):
            grid = sampling.rrs_grid(n, seq_len)
            assert len(grid) == seq_len, (n, seq_len)
            flat = [i for pool in grid for i in pool]
            assert max(flat) == n - 1 and min(flat) == 0
            assert flat == sorted(flat), (n, seq_len)  # in order with padding
            test_idx = sampling.rrs_test_indices(n, seq_len)
            assert list(test_idx) == [pool[0] for pool in grid]
            rng = np.random.RandomState(0)
            train_idx = sampling.rrs_train_indices(n, seq_len, rng)
            for i, pool in zip(train_idx, grid):
                assert i in pool
            clips = sampling.dense_indices(n, seq_len)
            assert clips.shape[1] == seq_len
            assert set(clips.reshape(-1)) == set(range(n)), (n, seq_len)


def test_cmc_rank_is_junk_compressed():
    """Ranks count positions in the junk-removed ordering (reference
    matches[i, valid], eva_functions.py:66-68). A same-pid/same-cam junk
    entry sorted FIRST must not push the true hit off rank-1 — with junk
    usually being the query's own tracklet at distance ~0, the
    uncompressed form systematically depressed rank-1."""
    # query pid 5 cam 0; gallery [junk(5,cam0), hit(5,cam1), other(7,cam1)]
    dist = np.array([[0.1, 0.2, 0.9]])
    qid, gid = np.array([5]), np.array([5, 5, 7])
    qc, gc = np.array([0]), np.array([0, 1, 1])
    for kwargs in (dict(first_match_break=True), dict()):
        res = metrics.cmc(dist, qid, gid, qc, gc, topk=3, **kwargs)
        np.testing.assert_allclose(res, [1, 1, 1], err_msg=str(kwargs))
    # single-gallery-shot config: the sampled set never contains junk,
    # so the hit is rank-0 in every resample
    res = metrics.cmc(dist, qid, gid, qc, gc, topk=3,
                      single_gallery_shot=True, seed=0)
    np.testing.assert_allclose(res, [1, 1, 1])


def test_evaluate_device_pad_rows_never_match_junk_pids(eightdev_mesh=None):
    """Mesh padding sentinel must not collide with a real gallery pid:
    a catalog passing raw pids can legitimately contain -1 (junk), and a
    zero-distance pad row matching it would fabricate a rank-1 hit."""
    import jax

    if len(jax.devices()) < 8:
        return
    from grl_tpu.parallel import data_mesh

    mesh = data_mesh(8)
    rng = np.random.RandomState(0)
    # 5 queries (pads to 8 on the mesh); gallery contains pid -1 entries
    dist = rng.rand(5, 6).astype(np.float32)
    q_pids = np.array([1, 2, 3, 1, 2])
    g_pids = np.array([1, 2, 3, -1, -1, 2])
    q_cams = np.zeros(5, np.int32)
    g_cams = np.ones(6, np.int32)
    host = metrics.evaluate(dist, q_pids, g_pids, q_cams, g_cams)
    dev = metrics.evaluate_device(dist, q_pids, g_pids, q_cams, g_cams, mesh=mesh)
    np.testing.assert_allclose(dev[0][: len(host[0])], host[0], atol=1e-6)
    np.testing.assert_allclose(dev[1], host[1], atol=1e-6)


def jaccard_oracle(qg, qq, gg, k1, k2, lam):
    """Tiny loop oracle following the paper definitions directly."""
    nq = qg.shape[0]
    orig = np.block([[qq, qg], [qg.T, gg]]).astype(np.float32) ** 2
    orig = (orig / orig.max(axis=0)).T
    n = orig.shape[0]
    rank = np.argsort(orig, axis=1)

    def recip(i, k):
        fwd = rank[i, : k + 1]
        return np.array([j for j in fwd if i in rank[j, : k + 1]])

    half = int(np.around(k1 / 2.0))
    v = np.zeros((n, n), np.float32)
    for i in range(n):
        r = recip(i, k1)
        expanded = set(r.tolist())
        for c in r:
            bc = recip(c, half)
            if len(np.intersect1d(bc, r)) > (2.0 / 3.0) * len(bc):
                expanded |= set(bc.tolist())
        idx = np.array(sorted(expanded))
        w = np.exp(-orig[i, idx])
        v[i, idx] = w / w.sum()
    if k2 != 1:
        v = np.stack([v[rank[i, :k2]].mean(axis=0) for i in range(n)])
    jac = np.zeros((nq, n), np.float32)
    for i in range(nq):
        ms = np.minimum(v[i][None, :], v).sum(axis=1)
        jac[i] = 1 - ms / (2 - ms)
    final = jac * (1 - lam) + orig[:nq] * lam
    return final[:, nq:]


def test_staged_rerank_cache_is_bounded():
    """A session whose gallery size keeps changing must not accumulate
    unbounded six-stage compiled programs (each n^2-scale): the staged
    cache is a small LRU, and re-using a size must not recompile."""
    import jax.numpy as jnp

    from grl_tpu.engine import rerank as R

    R._STAGED_CACHE.clear()

    def run(n):
        rng = np.random.RandomState(n)
        feats = rng.randn(n, 8).astype(np.float32)
        feats /= np.linalg.norm(feats, axis=1, keepdims=True)
        d = -feats @ feats.T
        q = n // 3
        R._build_v_staged(
            [jnp.asarray(d[:q, q:]), jnp.asarray(d[:q, :q]), jnp.asarray(d[q:, q:])],
            k1=4, k2=2,
        )

    for n in (12, 18, 24, 12):
        run(n)
    assert len(R._STAGED_CACHE) <= R._STAGED_CACHE_MAX
    # most-recently-used size (12, re-run last) is retained
    assert any(key[0] == 12 for key in R._STAGED_CACHE)


def test_chunked_minplus_path_matches_whole_matrix(monkeypatch):
    """The LS-VID chunked min-plus (B processed in row slabs to avoid a
    second full n^2 transposed copy) must equal the whole-matrix path."""
    import jax.numpy as jnp

    from grl_tpu.engine import rerank as R

    rng = np.random.RandomState(3)
    nq, ng = 10, 40
    feats = rng.randn(nq + ng, 8).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    d = np.sqrt(np.maximum(2 - 2 * (feats @ feats.T), 1e-12)).astype(np.float32)
    args = (d[:nq, nq:], d[:nq, :nq], d[nq:, nq:])

    ref = np.asarray(
        R.re_ranking_device(*map(jnp.asarray, args), k1=5, k2=3,
                            interpret=True, staged=True)
    )
    # chunk > q exercises the vq-from-slab-0 reuse; chunk < q the separate
    # (q, k2)-shaped query-row expansion fallback
    for chunk in (16, 8):
        monkeypatch.setattr(R, "_MINPLUS_CHUNK", chunk)
        got = np.asarray(
            R.re_ranking_device(*map(jnp.asarray, args), k1=5, k2=3,
                                interpret=True, staged=True)
        )
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


def test_chunked_minplus_path_with_k2_1(monkeypatch):
    """k2=1 disables query expansion: the deferred-s5 chunked path must
    fall back to slicing v directly (qexpand_idx is None) and still equal
    the whole-matrix staged path."""
    import jax.numpy as jnp

    from grl_tpu.engine import rerank as R

    rng = np.random.RandomState(5)
    nq, ng = 10, 40
    feats = rng.randn(nq + ng, 8).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    d = np.sqrt(np.maximum(2 - 2 * (feats @ feats.T), 1e-12)).astype(np.float32)
    args = (d[:nq, nq:], d[:nq, :nq], d[nq:, nq:])

    ref = np.asarray(
        R.re_ranking_device(*map(jnp.asarray, args), k1=5, k2=1,
                            interpret=True, staged=True)
    )
    monkeypatch.setattr(R, "_MINPLUS_CHUNK", 16)
    got = np.asarray(
        R.re_ranking_device(*map(jnp.asarray, args), k1=5, k2=1,
                            interpret=True, staged=True)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


def test_blockwise_staged_stages_match_at_multiblock_sizes(monkeypatch):
    """s3a/s3b/s5 run block-wise over output rows (HBM-cliff shape). On
    real problems multiple blocks only occur at n > 4096; shrink
    _STAGE_BLOCK so the multi-block + overlapping-tail paths execute at
    toy n and must equal the whole-matrix single-jit builder."""
    import jax.numpy as jnp

    from grl_tpu.engine import rerank as R

    rng = np.random.RandomState(7)
    nq, ng = 23, 82  # n=105: not a multiple of the 16-row block -> overlap
    feats = rng.randn(nq + ng, 8).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    d = np.sqrt(np.maximum(2 - 2 * (feats @ feats.T), 1e-12)).astype(np.float32)
    args = [jnp.asarray(d[:nq, nq:]), jnp.asarray(d[:nq, :nq]), jnp.asarray(d[nq:, nq:])]

    v_ref, orig_ref = R._make_build_v(20, 6)(*args)

    monkeypatch.setattr(R, "_STAGE_BLOCK", 16)
    R._STAGED_CACHE.clear()  # stages close over the block width at build time
    try:
        v_blk, orig_blk = R._build_v_staged(list(args))
    finally:
        R._STAGED_CACHE.clear()  # don't leave 16-row-block programs cached
    np.testing.assert_allclose(np.asarray(v_blk), np.asarray(v_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(orig_blk), np.asarray(orig_ref)[:nq], rtol=1e-6)


def test_padded_rerank_matches_host_on_valid_slices():
    """re_ranking_device_padded (the serve daemon's compile-once rerank
    over a capacity-padded index) must equal the host re_ranking of the
    UNPADDED inputs on the valid slices — with the padding regions filled
    with adversarial garbage (huge, tiny, negative, zero values), several
    pad geometries including zero padding, varying valid counts through
    ONE padded shape (traced scalars — growth must not retrace), and the
    k2=1 no-query-expansion case."""
    import jax.numpy as jnp

    from grl_tpu.engine import rerank as R

    rng = np.random.RandomState(11)

    def dists(nq, ng):
        feats = rng.randn(nq + ng, 8).astype(np.float32)
        feats /= np.linalg.norm(feats, axis=1, keepdims=True)
        d = np.sqrt(np.maximum(2 - 2 * (feats @ feats.T), 1e-12)).astype(np.float32)
        np.fill_diagonal(d, 0.0)
        return d[:nq, nq:], d[:nq, :nq], d[nq:, nq:]

    def pad_garbage(m, rows, cols):
        out = np.empty((rows, cols), np.float32)
        out[:] = rng.choice([1e6, -5.0, 3e-8, 0.0], size=(rows, cols))
        out[: m.shape[0], : m.shape[1]] = m
        return out

    for (nq, ng, Q, G), k2 in [
        ((6, 30, 8, 48), 3),   # both axes padded
        ((8, 30, 8, 48), 3),   # query axis full
        ((6, 48, 8, 48), 3),   # gallery axis full
        ((6, 30, 8, 48), 1),   # no query expansion
    ]:
        qg, qq, gg = dists(nq, ng)
        want = re_ranking(qg, qq, gg, k1=5, k2=k2, lambda_value=0.3)
        got = np.asarray(R.re_ranking_device_padded(
            jnp.asarray(pad_garbage(qg, Q, G)),
            jnp.asarray(pad_garbage(qq, Q, Q)),
            jnp.asarray(pad_garbage(gg, G, G)),
            nq, ng, k1=5, k2=k2, lambda_value=0.3, interpret=True,
        ))[:nq, :ng]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # growth through one padded shape: a larger valid count in the SAME
    # buffers stays correct (the jit traced nq/ng as values, not shapes)
    qg, qq, gg = dists(7, 40)
    want = re_ranking(qg, qq, gg, k1=5, k2=3, lambda_value=0.3)
    got = np.asarray(R.re_ranking_device_padded(
        jnp.asarray(pad_garbage(qg, 8, 48)),
        jnp.asarray(pad_garbage(qq, 8, 8)),
        jnp.asarray(pad_garbage(gg, 48, 48)),
        7, 40, k1=5, k2=3, lambda_value=0.3, interpret=True,
    ))[:7, :40]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_staged_padded_rerank_matches_host_on_valid_slices(monkeypatch):
    """re_ranking_device(valid=(nq, ng)) — the serve daemon's rerank route
    past the one-jit builder's scale — must equal the host re_ranking of
    the unpadded inputs on the valid slices, with adversarial garbage in
    the padding, under the same geometries as the one-jit padded test
    plus growth through ONE padded shape (the staged stage programs are
    cached per geometry; valid counts are traced scalars).

    _STAGE_BLOCK is shrunk so the masked s1's block-wise fori_loop body —
    the only path real >4096-item serve indexes use — executes with
    multiple blocks INCLUDING the overlapping tail, not just the
    single-block degenerate case."""
    import jax.numpy as jnp

    from grl_tpu.engine import rerank as R

    monkeypatch.setattr(R, "_STAGE_BLOCK", 16)
    R._STAGED_CACHE.clear()  # stages close over the block width at build time

    rng = np.random.RandomState(13)

    def dists(nq, ng):
        feats = rng.randn(nq + ng, 8).astype(np.float32)
        feats /= np.linalg.norm(feats, axis=1, keepdims=True)
        d = np.sqrt(np.maximum(2 - 2 * (feats @ feats.T), 1e-12)).astype(np.float32)
        np.fill_diagonal(d, 0.0)
        return d[:nq, nq:], d[:nq, :nq], d[nq:, nq:]

    def pad_garbage(m, rows, cols):
        out = np.empty((rows, cols), np.float32)
        out[:] = rng.choice([1e6, -5.0, 3e-8, 0.0], size=(rows, cols))
        out[: m.shape[0], : m.shape[1]] = m
        return out

    try:
        for (nq, ng, Q, G), k2 in [
            ((6, 30, 8, 48), 3),   # both axes padded; 3 aligned s1 blocks
            ((8, 30, 8, 48), 3),   # query axis full
            ((6, 48, 8, 48), 3),   # gallery axis full
            ((6, 30, 8, 48), 1),   # no query expansion
            ((6, 34, 8, 40), 3),   # G=40: s1 block starts 0,16,24 -> the
                                   # overlapping-tail rows 24-32 rewrite
        ]:
            qg, qq, gg = dists(nq, ng)
            want = re_ranking(qg, qq, gg, k1=5, k2=k2, lambda_value=0.3)
            got = np.asarray(R.re_ranking_device(
                jnp.asarray(pad_garbage(qg, Q, G)),
                jnp.asarray(pad_garbage(qq, Q, Q)),
                jnp.asarray(pad_garbage(gg, G, G)),
                k1=5, k2=k2, lambda_value=0.3, interpret=True, valid=(nq, ng),
            ))[:nq, :ng]
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

        # growth through one padded shape: a larger valid count hits the
        # SAME cached stage programs (traced scalars, no retrace) and
        # stays correct
        qg, qq, gg = dists(7, 40)
        want = re_ranking(qg, qq, gg, k1=5, k2=3, lambda_value=0.3)
        got = np.asarray(R.re_ranking_device(
            jnp.asarray(pad_garbage(qg, 8, 48)),
            jnp.asarray(pad_garbage(qq, 8, 8)),
            jnp.asarray(pad_garbage(gg, 48, 48)),
            k1=5, k2=3, lambda_value=0.3, interpret=True, valid=(7, 40),
        ))[:7, :40]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    finally:
        R._STAGED_CACHE.clear()  # don't leave 16-row-block programs cached


def test_re_ranking_matches_oracle():
    rng = np.random.RandomState(11)
    feats = rng.randn(18, 8).astype(np.float32)
    q, g = feats[:6], feats[6:]

    def cdist(a, b):
        return np.sqrt(((a[:, None] - b[None]) ** 2).sum(-1) + 1e-12)

    qg, qq, gg = cdist(q, g), cdist(q, q), cdist(g, g)
    got = re_ranking(qg, qq, gg, k1=4, k2=2, lambda_value=0.3)
    want = jaccard_oracle(qg, qq, gg, k1=4, k2=2, lam=0.3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
