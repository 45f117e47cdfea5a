"""Reproduce the docs/PERFORMANCE.md eval-tail measurements on a TPU.

Times the device-resident evaluation tail (cosine distmat -> optional
k-reciprocal re-ranking -> CMC/mAP) at MARS scale and, with --lsvid, at
LS-VID scale (BASELINE config 5). Synthetic L2-normalized features;
wall-clock excludes the one-time feature upload.

usage: python tools/bench_eval_tail.py [--lsvid] [--rerank]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from grl_tpu.engine import metrics  # noqa: E402
from grl_tpu.engine.evaluator import _euclidean, cosine_distance  # noqa: E402
from grl_tpu.engine.rerank import re_ranking_device  # noqa: E402


def main():
    from grl_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()  # n^2-scale stage compiles persist across runs
    ap = argparse.ArgumentParser()
    ap.add_argument("--lsvid", action="store_true", help="3000x33000 instead of MARS 1980x11310")
    ap.add_argument("--rerank", action="store_true")
    ap.add_argument("--warm", action="store_true",
                    help="LS-VID rerank: add a second stage-cached pass "
                         "(features re-uploaded outside the timer)")
    ap.add_argument("--from-host", action="store_true",
                    help="rerank variant: upload precomputed distance blocks "
                         "instead of computing them from device features — "
                         "the round-2 LS-VID measurement shape, and the one "
                         "that avoids on-chip distance-temp fragmentation")
    ap.add_argument("--dim", type=int, default=6144)
    args = ap.parse_args()

    q, g = (3000, 30000) if args.lsvid else (1980, 9330)
    rng = np.random.RandomState(0)
    qf = rng.randn(q, args.dim).astype(np.float32)
    qf /= np.linalg.norm(qf, axis=1, keepdims=True)
    gfr = rng.randn(g, args.dim).astype(np.float32)
    gfr /= np.linalg.norm(gfr, axis=1, keepdims=True)
    gf = np.concatenate([qf, gfr])
    q_pids = rng.randint(0, q, q)
    g_pids = np.concatenate([q_pids, rng.randint(0, q, g)])
    q_cams = rng.randint(0, 6, q)
    g_cams = np.concatenate([q_cams, rng.randint(0, 6, g)])

    label = "LS-VID" if args.lsvid else "MARS"

    if args.rerank and args.from_host:
        # distance blocks computed on host, uploaded, re-ranked on device
        # (the measurement shape behind the round-2 LS-VID figure): the
        # device heap starts clean, so the staged builder's peaks are the
        # only allocations — no fragmentation from feature/distance temps.
        # Rerank cost is dim-independent; cap dim so the HOST n^2 matmuls
        # don't dominate the tool's wall clock on one core.
        if args.dim > 64:
            d64 = 64
            qf = qf[:, :d64] / np.linalg.norm(qf[:, :d64], axis=1, keepdims=True)
            gf = gf[:, :d64] / np.linalg.norm(gf[:, :d64], axis=1, keepdims=True)
        qq_h = np.sqrt(np.maximum(2.0 - 2.0 * (qf @ qf.T), 1e-12))
        qg_h = np.sqrt(np.maximum(2.0 - 2.0 * (qf @ gf.T), 1e-12))
        gg_h = np.sqrt(np.maximum(2.0 - 2.0 * (gf @ gf.T), 1e-12))
        cosd = -(qf @ gf.T)
        t0 = time.perf_counter()
        box = [jnp.asarray(qg_h), jnp.asarray(qq_h), jnp.asarray(gg_h)]
        dist = re_ranking_device(inputs_box=box)
        cmc, mAP = metrics.evaluate_device(dist, q_pids, g_pids, q_cams, g_cams)
        dt = time.perf_counter() - t0
        cos_rank1 = float(
            metrics.evaluate(cosd, q_pids, g_pids, q_cams, g_cams)[0][0]
        )
        print(
            f"{label} rerank from host arrays ({q}x{q + g}), COLD incl. "
            f"upload: {dt:.2f}s  (rank1={cmc[0]:.3f} vs cosine {cos_rank1:.3f} "
            f"mAP={mAP:.3f})"
        )
        return

    qf_d, gf_d = jnp.asarray(qf), jnp.asarray(gf)
    float(jnp.sum(qf_d)), float(jnp.sum(gf_d))  # finish the upload

    if args.rerank and args.lsvid:
        # the LS-VID staged re-ranking runs near the single-chip HBM
        # capacity cliff: the ~830 MB of fp32 features must be dropped
        # before the n^2 stages (exactly the Evaluator's discipline,
        # engine/evaluator.py). With --warm a second pass re-uploads the
        # features (outside the timer, matching periodic eval where each
        # eval re-extracts them) and times the stage-cached path.
        passes = 2 if args.warm else 1
        for p in range(passes):
            if p > 0:
                qf_d, gf_d = jnp.asarray(qf), jnp.asarray(gf)
                float(jnp.sum(qf_d)), float(jnp.sum(gf_d))
            t0 = time.perf_counter()
            dist = cosine_distance(qf_d, gf_d)
            qq = _euclidean(qf_d, qf_d)
            gg = _euclidean(gf_d, gf_d)
            del qf_d, gf_d
            # (re_ranking_device itself serializes the dispatch queue on
            # its boxed inputs before the n^2 stages — no caller-side
            # sync needed)
            box = [dist, qq, gg]
            dist = qq = gg = None  # boxed refs are the only ones left
            dist = re_ranking_device(inputs_box=box)
            cmc, mAP = metrics.evaluate_device(dist, q_pids, g_pids, q_cams, g_cams)
            dt = time.perf_counter() - t0
            kind = "WARM (stage-cached)" if p else "COLD (compiles included)"
            print(
                f"{label} eval tail ({q}x{q + g}) +rerank, {kind} run near the "
                f"HBM cliff: {dt:.2f}s  (rank1={cmc[0]:.3f} mAP={mAP:.3f})",
                flush=True,
            )
            del dist
        return

    def tail():
        dist = cosine_distance(qf_d, gf_d)
        if args.rerank:
            dist = re_ranking_device(dist, _euclidean(qf_d, qf_d), _euclidean(gf_d, gf_d))
        return metrics.evaluate_device(dist, q_pids, g_pids, q_cams, g_cams)

    tail()  # compile
    t0 = time.perf_counter()
    cmc, mAP = tail()
    dt = time.perf_counter() - t0
    print(
        f"{label} eval tail ({q}x{q + g}){' +rerank' if args.rerank else ''}: "
        f"{dt:.2f}s = {q / dt:.0f} queries/s  (rank1={cmc[0]:.3f} mAP={mAP:.3f})"
    )


if __name__ == "__main__":
    main()
