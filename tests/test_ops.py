"""Pallas kernels + device eval path, on CPU (interpret mode / jnp)."""

import numpy as np
import pytest

from grl_tpu.engine import metrics
from grl_tpu.engine.rerank import re_ranking, re_ranking_device
from grl_tpu.ops import minplus_matmul


def test_minplus_matmul_matches_dense_numpy():
    rng = np.random.RandomState(0)
    a = np.abs(rng.randn(37, 300)).astype(np.float32)
    b = np.abs(rng.randn(150, 300)).astype(np.float32)
    ref = np.minimum(a[:, None, :], b[None, :, :]).sum(axis=2)
    out = np.asarray(minplus_matmul(a, b, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_minplus_matmul_zero_padding_exact():
    # exercises padding in every tiled dimension (m, n, k all non-multiples)
    rng = np.random.RandomState(1)
    a = np.abs(rng.rand(5, 17)).astype(np.float32)
    b = np.abs(rng.rand(9, 17)).astype(np.float32)
    ref = np.minimum(a[:, None, :], b[None, :, :]).sum(axis=2)
    out = np.asarray(minplus_matmul(a, b, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def _synthetic_dists(q, g, dim=32, seed=0):
    rng = np.random.RandomState(seed)
    feats = rng.randn(q + g, dim).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    d = np.linalg.norm(feats[:, None] - feats[None, :], axis=2)
    return d[:q, q:], d[:q, :q], d[q:, q:]


def test_device_rerank_matches_numpy_reference():
    qg, qq, gg = _synthetic_dists(25, 90)
    ref = re_ranking(qg, qq, gg)
    dev = np.asarray(re_ranking_device(qg, qq, gg, interpret=True))
    np.testing.assert_allclose(dev, ref, rtol=1e-4, atol=1e-4)


def test_device_evaluate_matches_numpy_protocol():
    rng = np.random.RandomState(3)
    q, g = 20, 70
    distmat = rng.rand(q, g).astype(np.float32)
    q_pids = rng.randint(0, 8, q)
    g_pids = rng.randint(0, 8, g)
    q_camids = rng.randint(0, 3, q)
    g_camids = rng.randint(0, 3, g)
    cmc_ref, map_ref = metrics.evaluate(distmat, q_pids, g_pids, q_camids, g_camids, max_rank=20)
    cmc_dev, map_dev = metrics.evaluate_device(
        distmat, q_pids, g_pids, q_camids, g_camids, max_rank=20
    )
    np.testing.assert_allclose(cmc_dev, cmc_ref, atol=1e-6)
    assert abs(map_dev - map_ref) < 1e-6


def test_device_evaluate_raises_when_no_valid_query():
    distmat = np.random.RandomState(0).rand(3, 4).astype(np.float32)
    q_pids = np.array([1, 2, 3])
    g_pids = np.array([7, 8, 9, 7])  # no query pid in gallery
    cams_q = np.zeros(3, np.int32)
    cams_g = np.ones(4, np.int32)
    with pytest.raises(RuntimeError):
        metrics.evaluate_device(distmat, q_pids, g_pids, cams_q, cams_g)


def test_staged_build_v_matches_single_jit():
    """The memory-lean staged builder (LS-VID scale path) is numerically
    identical to the single-jit builder."""
    import jax.numpy as jnp

    import grl_tpu.engine.rerank as rr

    qg, qq, gg = _synthetic_dists(25, 90)
    v_ref, orig = rr._make_build_v(20, 6)(jnp.asarray(qg), jnp.asarray(qq), jnp.asarray(gg))
    v_st, orig_q = rr._build_v_staged([jnp.asarray(qg), jnp.asarray(qq), jnp.asarray(gg)])
    np.testing.assert_allclose(np.asarray(v_st), np.asarray(v_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(orig_q), np.asarray(orig)[:25], rtol=1e-6)


def test_rerank_degenerate_scale_warning(capsys):
    from grl_tpu.engine.rerank import warn_if_degenerate

    # stderr, not stdout: the serving daemon's stdout is a JSON-lines
    # protocol a warning line would corrupt
    assert warn_if_degenerate(13, k1=20)
    assert "WARNING" in capsys.readouterr().err
    assert not warn_if_degenerate(11310, k1=20)
    assert capsys.readouterr().err == ""


def test_staged_builder_caches_stage_programs():
    """The staged stages must be cached per (n, mesh): a fresh jit wrapper
    per call re-traces six n^2-scale programs on EVERY periodic rerank
    (the exact eval-tail recompile bug CLAUDE.md warns about)."""
    import jax.numpy as jnp

    import grl_tpu.engine.rerank as rr

    qg, qq, gg = _synthetic_dists(25, 90)
    rr._STAGED_CACHE.clear()
    v1, _ = rr._build_v_staged([jnp.asarray(qg), jnp.asarray(qq), jnp.asarray(gg)])
    assert len(rr._STAGED_CACHE) == 1
    stages = next(iter(rr._STAGED_CACHE.values()))
    v2, _ = rr._build_v_staged([jnp.asarray(qg), jnp.asarray(qq), jnp.asarray(gg)])
    assert len(rr._STAGED_CACHE) == 1
    assert next(iter(rr._STAGED_CACHE.values())) is stages  # same jitted fns
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)


def test_device_rerank_tiny_gallery_clamps_topk():
    """Galleries smaller than k1+1 must not crash (numpy's rank[:, :k]
    silently clamps; lax.top_k would raise) — found by the evaluate CLI
    on a toy dataset."""
    qg, qq, gg = _synthetic_dists(4, 9)  # n = 13 < k1+1 = 21
    ref = re_ranking(qg, qq, gg)
    dev = np.asarray(re_ranking_device(qg, qq, gg, interpret=True))
    np.testing.assert_allclose(dev, ref, rtol=1e-4, atol=1e-4)
