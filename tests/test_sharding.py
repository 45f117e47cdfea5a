"""SPMD tests on the virtual 8-device CPU mesh: data-parallel train step
equivalence, sharded gallery distance, and the driver's multichip dryrun."""

import importlib.util
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grl_tpu import models
from grl_tpu.engine.optim import SGD
from grl_tpu.engine.train_step import init_train_state, make_train_step
from grl_tpu.parallel import (
    data_mesh,
    replicate,
    shard_batch,
    sharded_cosine_distance,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def tiny_models():
    trunk = models.ResNetTrunk(layers=(1, 1, 1, 1), width=4)
    cnn = models.GRLModel(trunk=trunk)
    sia = models.Siamese(input_num=cnn.num_feat, output_num=16)
    unc = models.SiameseVideo(input_num=cnn.num_feat)
    return cnn, sia, unc


def test_sharded_step_matches_single_device():
    cnn, sia, unc = tiny_models()
    opt = SGD()
    ts = init_train_state(jax.random.PRNGKey(0), cnn, sia, unc, 4, cnn.num_feat, opt)
    step = make_train_step(cnn, sia, unc, opt, donate=False)

    rng = np.random.RandomState(0)
    batch = 8  # 4 pairs over a 4-device mesh -> 1 pair per device
    clips = rng.randn(batch, 2, 32, 16, 3).astype(np.float32)
    pids = np.repeat(np.arange(batch // 2) % 4, 2).astype(np.int32)

    # single device
    ts1, m1 = step(ts, jnp.asarray(clips), jnp.asarray(pids), 1e-3)

    # 4-device data parallel
    mesh = data_mesh(4)
    ts_r = replicate(ts, mesh)
    clips_sh = shard_batch(jnp.asarray(clips), mesh)
    pids_sh = shard_batch(jnp.asarray(pids), mesh)
    ts2, m2 = step(ts_r, clips_sh, pids_sh, 1e-3)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    # updated parameters agree (SPMD == single-device semantics)
    l1 = jax.tree.leaves(ts1["params"])
    l2 = jax.tree.leaves(ts2["params"])
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5)
    # luts advanced identically
    np.testing.assert_allclose(
        np.asarray(ts1["luts"]["corr"]), np.asarray(ts2["luts"]["corr"]), rtol=1e-4, atol=1e-6
    )


def test_sharded_multistep_divergence_is_reduction_noise():
    """MULTI-STEP SPMD equivalence, noise-calibrated. An elementwise
    multi-step comparison is provably meaningless here: SGD chaotically
    amplifies fp reduction-order noise (measured ~1.5-40x/step on this
    model), so ANY reassociation of the batch reductions — benign or
    buggy — diverges to O(1) within a few steps. Instead, calibrate the
    noise floor with a mathematically-IDENTICAL single-device control:
    the same fixed batches with the (anchor, positive) PAIRS permuted,
    which changes only the fp summation order of the batch reductions
    (BN stats, loss means, gradient sums — every loss term and the OIM
    per-id update sequences are pair-permutation-invariant with distinct
    pids per pair). The 4-device mesh trajectory must then diverge from
    the single-device one NO FASTER than that control does at every
    step: a semantic SPMD bug (wrong psum denominator, missing
    collective, shard-local BN stats) would blow the ratio by orders of
    magnitude at step 1, while reduction-order noise keeps it near 1
    (measured max ratio 1.7 over 6 steps; asserted at 100x)."""
    cnn, sia, unc = tiny_models()
    opt = SGD()
    ts0 = init_train_state(jax.random.PRNGKey(0), cnn, sia, unc, 4,
                           cnn.num_feat, opt)
    step = make_train_step(cnn, sia, unc, opt, donate=False)

    rng = np.random.RandomState(0)
    batches = [
        (rng.randn(8, 2, 32, 16, 3).astype(np.float32),
         np.repeat(np.arange(4), 2).astype(np.int32))
        for _ in range(2)
    ]
    # permute PAIRS (anchors stay adjacent to their positives, so the
    # pair-interleaved layout and all within-id orderings are preserved)
    perm = np.array([2, 0, 3, 1])
    idx = np.stack([2 * perm, 2 * perm + 1], 1).reshape(-1)

    def dmax(a, b):
        """Largest per-element divergence, floored at atol 1e-6 so
        noise on zero-init leaves (|param| ~ 1e-10) doesn't dominate."""
        out = 0.0
        for x, y in zip(jax.tree.leaves(a["params"]),
                        jax.tree.leaves(b["params"])):
            x, y = np.asarray(x), np.asarray(y)
            out = max(out, float(np.max(np.abs(x - y) / (1e-6 + np.abs(x)))))
        return out

    mesh = data_mesh(4)
    tsA, tsB, tsC = ts0, ts0, replicate(ts0, mesh)
    for t in range(1, 7):
        clips, pids = batches[(t - 1) % 2]
        tsA, mA = step(tsA, jnp.asarray(clips), jnp.asarray(pids), 1e-3)
        tsB, mB = step(tsB, jnp.asarray(clips[idx]), jnp.asarray(pids[idx]),
                       1e-3)
        tsC, mC = step(tsC, shard_batch(jnp.asarray(clips), mesh),
                       shard_batch(jnp.asarray(pids), mesh), 1e-3)
        d_perm, d_mesh = dmax(tsA, tsB), dmax(tsA, tsC)
        assert d_mesh <= 100 * max(d_perm, 1e-4), (
            f"step {t}: mesh diverges {d_mesh:.3e} vs the benign "
            f"reassociation control's {d_perm:.3e} — an SPMD semantics "
            "bug, not reduction-order noise"
        )
        loss = abs(float(mA["loss"]))
        dl_perm = abs(float(mA["loss"]) - float(mB["loss"]))
        dl_mesh = abs(float(mA["loss"]) - float(mC["loss"]))
        assert dl_mesh <= 100 * max(dl_perm, 1e-3 * loss), (
            f"step {t}: mesh loss off by {dl_mesh:.3e} vs control "
            f"{dl_perm:.3e} (loss {loss:.3f})"
        )
        if t == 1:  # semantics are TIGHT before any amplification
            assert dl_mesh <= 1e-4 * loss
            for a, b in zip(jax.tree.leaves(tsA["params"]),
                            jax.tree.leaves(tsC["params"])):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=2e-3, atol=1e-5)


def test_batchnorm_global_stats_under_sharding():
    """BN inside a jitted step sees GLOBAL batch statistics when the batch
    axis is sharded (XLA inserts the collective) — the semantics nn/norm.py
    documents. Shards get deliberately different distributions so per-shard
    stats would visibly diverge from the global ones."""
    from grl_tpu.nn import BatchNorm

    bn = BatchNorm(3)
    params, state = bn.init(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    # each of the 8 shard-blocks has a different mean/scale
    x = np.concatenate(
        [rng.randn(2, 3).astype(np.float32) * (i + 1) + 3.0 * i for i in range(8)]
    )

    @jax.jit
    def step(p, s, x):
        return bn.apply(p, s, x, training=True)

    y_ref, st_ref = step(params, state, jnp.asarray(x))

    mesh = data_mesh(8)
    y_sh, st_sh = step(replicate(params, mesh), replicate(state, mesh),
                       shard_batch(jnp.asarray(x), mesh))
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(st_sh["mean"]), np.asarray(st_ref["mean"]), rtol=1e-5, atol=1e-6
    )
    # and the global stats really differ from any single shard's stats
    shard0 = x[:2]
    assert not np.allclose(shard0.mean(0), x.mean(0), atol=0.1)


def test_sharded_cosine_distance():
    mesh = data_mesh(8)
    rng = np.random.RandomState(1)
    qf = rng.randn(6, 12).astype(np.float32)
    gf = rng.randn(16, 12).astype(np.float32)
    out = np.asarray(sharded_cosine_distance(qf, gf, mesh))
    np.testing.assert_allclose(out, -(qf @ gf.T), rtol=1e-5, atol=1e-5)


def test_batch_not_divisible_raises():
    mesh = data_mesh(8)
    with pytest.raises(ValueError):
        shard_batch(jnp.zeros((6, 2)), mesh)


def test_graft_dryrun_multichip():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", osp.join(osp.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_sharded_device_metrics_matches_numpy():
    """CMC/mAP protocol with query rows sharded over the 8-device mesh."""
    from grl_tpu.engine import metrics

    rng = np.random.RandomState(5)
    q, g = 21, 67  # q deliberately not divisible by 8 (exercises padding)
    distmat = rng.rand(q, g).astype(np.float32)
    q_pids = rng.randint(0, 6, q)
    g_pids = rng.randint(0, 6, g)
    q_cams = rng.randint(0, 3, q)
    g_cams = rng.randint(0, 3, g)
    mesh = data_mesh(8)
    ref_cmc, ref_map = metrics.evaluate(distmat, q_pids, g_pids, q_cams, g_cams, max_rank=20)
    cmc_sh, map_sh = metrics.evaluate_device(
        distmat, q_pids, g_pids, q_cams, g_cams, max_rank=20, mesh=mesh
    )
    np.testing.assert_allclose(cmc_sh, ref_cmc, atol=1e-6)
    assert abs(map_sh - ref_map) < 1e-6


def test_sharded_device_rerank_matches_numpy():
    from grl_tpu.engine.rerank import re_ranking, re_ranking_device

    rng = np.random.RandomState(6)
    q, g = 19, 85  # q not divisible by 8
    feats = rng.randn(q + g, 16).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    d = np.linalg.norm(feats[:, None] - feats[None, :], axis=2)
    qg, qq, gg = d[:q, q:], d[:q, :q], d[q:, q:]
    mesh = data_mesh(8)
    ref = re_ranking(qg, qq, gg)
    dev = np.asarray(re_ranking_device(qg, qq, gg, interpret=True, mesh=mesh))
    np.testing.assert_allclose(dev, ref, rtol=1e-4, atol=1e-4)


def test_staged_rerank_set_algebra_sharded_matches_numpy(monkeypatch):
    """The LS-VID staged builder with its set algebra row-sharded over the
    mesh (adjacency, reciprocal AND-transpose, expansion matmuls, V) must
    reproduce host numpy exactly — including the phantom-item padding that
    makes n divisible by the mesh (n = 105 -> pad 7) AND the block-wise
    stage loops running multiple 16-row blocks under GSPMD (on real
    problems only n > 4096 takes the multi-block path)."""
    from grl_tpu.engine import rerank as R
    from grl_tpu.engine.rerank import re_ranking, re_ranking_device

    rng = np.random.RandomState(11)
    q, g = 19, 86  # n = 105: exercises the divisibility padding
    feats = rng.randn(q + g, 16).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    d = np.linalg.norm(feats[:, None] - feats[None, :], axis=2)
    qg, qq, gg = d[:q, q:], d[:q, :q], d[q:, q:]
    mesh = data_mesh(8)
    ref = re_ranking(qg, qq, gg)
    monkeypatch.setattr(R, "_STAGE_BLOCK", 16)
    R._STAGED_CACHE.clear()  # stages close over the block width at build time
    try:
        dev = np.asarray(
            re_ranking_device(qg, qq, gg, interpret=True, mesh=mesh, staged=True)
        )
    finally:
        R._STAGED_CACHE.clear()
    assert dev.shape == ref.shape
    np.testing.assert_allclose(dev, ref, rtol=1e-4, atol=1e-4)


def test_staged_masked_rerank_sharded_matches_numpy(monkeypatch):
    """The serve daemon's capacity-padded staged route (valid counts as
    traced scalars, masked s1) composed with mesh row-sharding — the shape
    a multi-chip serving deployment would run — must equal host numpy on
    the valid slices with adversarial garbage in the padding, multi-block
    s1 included."""
    import jax.numpy as jnp

    from grl_tpu.engine import rerank as R
    from grl_tpu.engine.rerank import re_ranking, re_ranking_device

    rng = np.random.RandomState(3)
    nq, ng, Q, G = 6, 41, 8, 48  # padded n0 = 56: mesh-divisible by 8
    feats = rng.randn(nq + ng, 16).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    d = np.linalg.norm(feats[:, None] - feats[None, :], axis=2).astype(np.float32)
    np.fill_diagonal(d, 0.0)
    qg, qq, gg = d[:nq, nq:], d[:nq, :nq], d[nq:, nq:]

    def pad_garbage(m, rows, cols):
        out = np.empty((rows, cols), np.float32)
        out[:] = rng.choice([1e6, -5.0, 3e-8, 0.0], size=(rows, cols))
        out[: m.shape[0], : m.shape[1]] = m
        return out

    mesh = data_mesh(8)
    ref = re_ranking(qg, qq, gg, k1=5, k2=3, lambda_value=0.3)
    monkeypatch.setattr(R, "_STAGE_BLOCK", 16)
    R._STAGED_CACHE.clear()  # stages close over the block width at build time
    try:
        dev = np.asarray(re_ranking_device(
            jnp.asarray(pad_garbage(qg, Q, G)),
            jnp.asarray(pad_garbage(qq, Q, Q)),
            jnp.asarray(pad_garbage(gg, G, G)),
            k1=5, k2=3, lambda_value=0.3, interpret=True, mesh=mesh,
            valid=(nq, ng),
        ))[:nq, :ng]
    finally:
        R._STAGED_CACHE.clear()
    np.testing.assert_allclose(dev, ref, rtol=1e-4, atol=1e-4)


def test_shard_catalog_partitions_whole_pids():
    """Multi-host catalog sharding: disjoint, complete, whole identities
    per process (the pair sampler must find a same-pid positive locally),
    and roughly balanced."""
    from grl_tpu.parallel import shard_catalog

    rng = np.random.RandomState(0)
    tracklets = []
    for pid in range(11):
        for _ in range(rng.randint(1, 7)):
            tracklets.append((f"frames_{pid}", pid, rng.randint(0, 3)))

    shards = [shard_catalog(tracklets, i, 3) for i in range(3)]
    # disjoint + complete
    seen = [id(t) for s in shards for t in s]
    assert len(seen) == len(tracklets) == len(set(seen))
    # whole pids
    pid_sets = [set(t[1] for t in s) for s in shards]
    for a in range(3):
        for b in range(a + 1, 3):
            assert not (pid_sets[a] & pid_sets[b])
    # balance within the largest pid-group size
    sizes = sorted(len(s) for s in shards)
    assert sizes[-1] - sizes[0] <= 6
    # single process: identity
    assert shard_catalog(tracklets, 0, 1) == tracklets


def test_min_shard_size_caps_all_hosts_to_equal_steps():
    """Unequal per-host shards must not yield unequal per-host step counts
    (the bigger host's extra train steps would block in the gradient psum
    forever). Every host computes the same cap locally."""
    from grl_tpu.data import ClipDataset, ClipLoader, sampling
    from grl_tpu.parallel import min_shard_size, shard_catalog

    # 3 pids with 5/2/2 tracklets over 2 processes -> greedy gives 5 vs 4
    frames = np.zeros((3, 32, 16, 3), np.uint8)
    tracklets = [(frames, 0, 0)] * 5 + [(frames, 1, 0)] * 2 + [(frames, 2, 0)] * 2
    shards = [shard_catalog(tracklets, i, 2) for i in range(2)]
    assert sorted(len(s) for s in shards) == [4, 5]
    cap = min_shard_size(tracklets, 2)
    assert cap == 4
    # with the cap, both hosts' loaders run the same number of steps
    batch = 4
    steps = []
    for shard in shards:
        cd = ClipDataset(shard, seq_len=2, sample="rrs_train", height=32, width=16)
        loader = ClipLoader(cd, batch_size=batch,
                            sampler=sampling.RandomPairSampler(shard, seed=0),
                            drop_last=True, workers=1,
                            max_batches=(2 * cap) // batch)
        steps.append(len(loader))
        assert len(list(iter(loader))) == len(loader)
    assert steps[0] == steps[1] == 2
    # single process: cap equals the full catalog (no truncation)
    assert min_shard_size(tracklets, 1) == len(tracklets)


def test_maybe_initialize_distributed_order(monkeypatch):
    """jax.distributed.initialize must be reachable: the guard must not
    itself initialize the backends (jax.process_count() does), or every
    pod worker raises at startup."""
    from grl_tpu.parallel import multihost

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize", lambda *a, **k: calls.append(1))
    # no coordinator -> no-op, initialize never called
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    multihost.maybe_initialize_distributed()
    assert not calls
    # coordinator set -> initialize called exactly once (is_initialized is
    # False in-process)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:1234")
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)
    multihost.maybe_initialize_distributed()
    assert calls == [1]
    # already initialized -> no second call
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: True)
    multihost.maybe_initialize_distributed()
    assert calls == [1]


def test_graft_xla_flag_merge():
    """dryrun_multichip must RAISE an inherited smaller device-count flag,
    not keep it (a 4-device flag would silently validate a 4-device mesh
    for a dryrun_multichip(8) call)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry_flags", osp.join(osp.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    merge = mod._merged_xla_flags
    assert merge("", 8).strip() == "--xla_force_host_platform_device_count=8"
    assert merge("--xla_force_host_platform_device_count=4", 8) == (
        "--xla_force_host_platform_device_count=8")
    assert merge("--xla_force_host_platform_device_count=16", 8) == (
        "--xla_force_host_platform_device_count=16")
    out = merge("--foo=1 --xla_force_host_platform_device_count=2 --bar=3", 8)
    assert out == "--foo=1 --xla_force_host_platform_device_count=8 --bar=3"


def test_global_batch_loader_feeds_train_step():
    """make_array_from_process_local_data batches (single-process
    degenerate case) must be byte-identical to shard_batch and feed the
    jitted train step unchanged — the multi-host input contract."""
    from grl_tpu.data import ClipDataset, ClipLoader, sampling
    from grl_tpu.data.catalogs import get_sequence
    from grl_tpu.parallel import GlobalBatchLoader

    ds = get_sequence("synthetic", seed=0)
    cd = ClipDataset(ds.train, seq_len=2, sample="rrs_train", height=32, width=16)
    mesh = data_mesh(8)

    def batches():
        # fresh loaders agree by construction: frame sampling is keyed by
        # (dataset seed, loader epoch, tracklet), not shared RNG state
        return ClipLoader(
            cd, batch_size=16,
            sampler=sampling.RandomPairSampler(ds.train, seed=0),
            drop_last=True, workers=2,
        )

    host = list(batches())
    glob = list(GlobalBatchLoader(batches(), mesh))
    assert len(glob) == len(host)
    clips_g, pids_g, _ = glob[0]
    clips_h, pids_h, _ = host[0]
    assert isinstance(clips_g, jax.Array)
    assert clips_g.sharding.is_equivalent_to(
        shard_batch(jnp.asarray(clips_h), mesh).sharding, clips_g.ndim
    )
    np.testing.assert_array_equal(np.asarray(clips_g), clips_h)
    np.testing.assert_array_equal(np.asarray(pids_g), pids_h)

    # the jitted train step consumes the global array unchanged
    cnn, sia, unc = tiny_models()
    opt = SGD()
    ts = init_train_state(jax.random.PRNGKey(0), cnn, sia, unc,
                          ds.num_train_pids, cnn.num_feat, opt)
    ts = replicate(ts, mesh)
    step = make_train_step(cnn, sia, unc, opt, donate=False)
    _, m = step(ts, jnp.asarray(clips_g, jnp.float32), pids_g % ds.num_train_pids, 1e-3)
    assert np.isfinite(float(m["loss"]))


def test_dense_packing_matches_per_tracklet_means():
    """The packed dense extractor (clips from many tracklets per
    micro-batch, segment scatter-add) must equal naive per-tracklet clip
    means of the same descriptor. micro_batch=8 forces tracklets to span
    flush boundaries and exercises the padded final flush."""
    from grl_tpu import models
    from grl_tpu.data import ClipDataset, ClipLoader
    from grl_tpu.data.catalogs import get_sequence
    from grl_tpu.engine.evaluator import Evaluator

    ds = get_sequence("synthetic", seed=3)
    cd = ClipDataset(ds.query + ds.gallery, seq_len=4, sample="dense", height=32, width=16)
    loader = ClipLoader(cd, batch_size=1, workers=2)

    trunk = models.ResNetTrunk(layers=(1, 1, 1, 1), width=4)
    cnn = models.GRLModel(trunk=trunk)
    siamese = models.Siamese(input_num=cnn.num_feat, output_num=16)
    p = {"cnn": jax.jit(cnn.init)(jax.random.PRNGKey(0))[0],
         "siamese": jax.jit(siamese.init)(jax.random.PRNGKey(1))[0]}
    s = {"cnn": jax.jit(cnn.init)(jax.random.PRNGKey(0))[1],
         "siamese": jax.jit(siamese.init)(jax.random.PRNGKey(1))[1]}

    ev = Evaluator(cnn, siamese, only_eval=True, micro_batch=8)
    feats, pids, camids = ev.extract_features(p, s, loader)
    feats = np.asarray(feats)

    # naive reference: describe every tracklet's clips alone, mean them
    fn = ev._build_descriptor()
    want = []
    for clips, pid, camid in ClipLoader(cd, batch_size=1, workers=2):
        d = fn(p["cnn"], s["cnn"], p["siamese"], s["siamese"], jnp.asarray(clips))
        want.append(np.asarray(d).mean(axis=0))
    want = np.stack(want)
    assert feats.shape == want.shape
    np.testing.assert_allclose(feats, want, rtol=2e-4, atol=2e-5)


def test_mesh_evaluator_matches_single_device():
    """Full eval protocol with mesh-sharded feature extraction + metrics."""
    import jax.numpy as jnp

    from grl_tpu import models
    from grl_tpu.data import get_data
    from grl_tpu.engine.evaluator import Evaluator

    _, _, _, query_loader, gallery_loader = get_data(
        "synthetic", "", 4, 4, 4, 2, only_eval=False, dataset_kwargs=dict(seed=0)
    )
    trunk = models.ResNetTrunk(layers=(1, 1, 1, 1), width=4)
    cnn = models.GRLModel(trunk=trunk)
    siamese = models.Siamese(input_num=cnn.num_feat, output_num=16)
    params, state = jax.jit(cnn.init)(jax.random.PRNGKey(0))
    sp, ss = jax.jit(siamese.init)(jax.random.PRNGKey(1))
    p = {"cnn": params, "siamese": sp}
    s = {"cnn": state, "siamese": ss}

    ref = Evaluator(cnn, siamese, micro_batch=8).evaluate(
        p, s, query_loader, gallery_loader
    )
    mesh = data_mesh(8)
    sharded = Evaluator(cnn, siamese, micro_batch=8, mesh=mesh).evaluate(
        p, s, query_loader, gallery_loader
    )
    assert abs(ref - sharded) < 1e-6


def test_stripe_catalog_covers_and_pads():
    from grl_tpu.parallel import stripe_catalog

    items = [(f"t{i}", i % 3, i % 2) for i in range(10)]
    stripes = [stripe_catalog(items, i, 3, local_devices=2) for i in range(3)]
    k = stripes[0][2]
    assert all(s[2] == k and len(s[0]) == k and s[1] == 10 for s in stripes)
    assert k % 2 == 0 and 3 * k >= 10
    # concatenated stripes = catalog order, pad (= repeats of the last
    # item) strictly at the tail
    flat = [t for s in stripes for t in s[0]]
    assert flat[:10] == items
    assert all(t == items[-1] for t in flat[10:])
    # degenerate single process: pad only up to device divisibility
    local, n, k1 = stripe_catalog(items, 0, 1, local_devices=2)
    assert n == 10 and local[:10] == items
    # more processes than items: trailing stripes are all-pad but every
    # process still holds k rows (required for even device sharding)
    few = items[:3]
    stripes = [stripe_catalog(few, i, 8, local_devices=2) for i in range(8)]
    k = stripes[0][2]
    flat = [t for s in stripes for t in s[0]]
    assert flat[:3] == few and all(t == few[-1] for t in flat[3:])
    assert all(len(s[0]) == k for s in stripes)


def test_multihost_striped_evaluate_degenerate_matches():
    """evaluate(multihost=...) with a single process (stripe = full
    catalog up to device-divisibility pad) must equal the plain path —
    the degenerate contract the real 2-process test builds on."""
    from grl_tpu import models
    from grl_tpu.data import get_data
    from grl_tpu.engine.evaluator import Evaluator

    ds, _, _, q_loader, g_loader = get_data(
        "synthetic", "", 4, 4, 4, 2, only_eval=False, dataset_kwargs=dict(seed=0)
    )
    ds2, _, _, q_s, g_s = get_data(
        "synthetic", "", 4, 4, 4, 2, only_eval=False, dataset_kwargs=dict(seed=0),
        eval_stripe=True,
    )
    trunk = models.ResNetTrunk(layers=(1, 1, 1, 1), width=4)
    cnn = models.GRLModel(trunk=trunk)
    siamese = models.Siamese(input_num=cnn.num_feat, output_num=16)
    params, state = jax.jit(cnn.init)(jax.random.PRNGKey(0))
    sp, ss = jax.jit(siamese.init)(jax.random.PRNGKey(1))
    p = {"cnn": params, "siamese": sp}
    s = {"cnn": state, "siamese": ss}
    mesh = data_mesh(8)

    ref = Evaluator(cnn, siamese, micro_batch=8, mesh=mesh).evaluate(
        p, s, q_loader, g_loader
    )

    from grl_tpu.parallel import eval_catalog_meta

    multihost = {"query": eval_catalog_meta(ds2.query),
                 "gallery": eval_catalog_meta(ds2.gallery)}
    striped = Evaluator(cnn, siamese, micro_batch=8, mesh=mesh).evaluate(
        p, s, q_s, g_s, multihost=multihost
    )
    assert abs(ref - striped) < 1e-6
