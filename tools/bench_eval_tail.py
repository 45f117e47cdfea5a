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
    ap = argparse.ArgumentParser()
    ap.add_argument("--lsvid", action="store_true", help="3000x33000 instead of MARS 1980x11310")
    ap.add_argument("--rerank", action="store_true")
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

    qf_d, gf_d = jnp.asarray(qf), jnp.asarray(gf)
    float(jnp.sum(qf_d)), float(jnp.sum(gf_d))  # finish the upload

    def tail():
        dist = cosine_distance(qf_d, gf_d)
        if args.rerank:
            dist = re_ranking_device(dist, _euclidean(qf_d, qf_d), _euclidean(gf_d, gf_d))
        return metrics.evaluate_device(dist, q_pids, g_pids, q_cams, g_cams)

    tail()  # compile
    t0 = time.perf_counter()
    cmc, mAP = tail()
    dt = time.perf_counter() - t0
    label = "LS-VID" if args.lsvid else "MARS"
    print(
        f"{label} eval tail ({q}x{q + g}){' +rerank' if args.rerank else ''}: "
        f"{dt:.2f}s = {q / dt:.0f} queries/s  (rank1={cmc[0]:.3f} mAP={mAP:.3f})"
    )


if __name__ == "__main__":
    main()
