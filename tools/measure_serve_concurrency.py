"""Measure the serve daemon's cross-request describe coalescing.

The daemon packs concurrent connections' clips into shared device
dispatches of the artifact's compiled batch width
(`grl_tpu/cli/extract.py::_DescribeCoalescer`). On a high-latency link
(the axon tunnel: ~16 ms per dispatch RTT) the win is dispatch-COUNT
reduction; on production host links it is padded-MXU-work reduction.
This tool drives a REAL daemon (unix socket, in-process thread, default
jax backend — the tunneled TPU on this rig) with the same total number
of single-clip describe requests issued sequentially and then from N
concurrent clients, and prints one JSON line with wall times and the
daemon's own packing counters (`stats.describe_batching`).

Builds a tiny random-init artifact when --model is omitted (descriptor
math is init-independent; program shapes are what matter). No reference
analogue: flysnowtiger/GRL stops at offline evaluation.

``--rank-every K`` makes every Kth request per client a ``rank`` (clips
-> descriptor -> gallery top-k) instead of a plain describe: rank's
descriptor stage rides the same coalescer (extract.py:912-914), so the
mixed workload measures packing under the realistic describe+rank blend.

usage:
  python tools/measure_serve_concurrency.py [--model m.npz]
      [--clients 6] [--reps 8] [--batch 8] [--seq_len 4] [--rank-every 4]
"""

import argparse
import json
import os.path as osp
import subprocess
import sys
import tempfile
import threading
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", type=str, default="",
                    help="exported artifact; omit to build a tiny one")
    ap.add_argument("--clients", type=int, default=6)
    ap.add_argument("--reps", type=int, default=8,
                    help="single-clip describes per concurrent client")
    ap.add_argument("--batch", type=int, default=8,
                    help="artifact batch width (tiny build only)")
    ap.add_argument("--seq_len", type=int, default=4)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--rank-every", type=int, default=0,
                    help="make every Kth request per client a rank "
                         "(0 = describe-only)")
    args = ap.parse_args()

    with tempfile.TemporaryDirectory(prefix="serve_conc_") as tmp:
        _run(args, tmp)


def _run(args, tmp):
    import numpy as np

    from grl_tpu.cli.extract import build_parser, serve
    from grl_tpu.cli.extract import main as extract_main
    from grl_tpu.client import ServeClient

    model = args.model
    if not model:
        ckpt = osp.join(tmp, "ckpt.npz")
        subprocess.run(
            [sys.executable, osp.join(REPO, "tools/make_random_checkpoint.py"),
             "-o", ckpt, "--tiny", "--num-classes", "4"],
            check=True,
        )
        model = osp.join(tmp, "model.npz")
        extract_main(build_parser().parse_args([
            "export-model", "--checkpoint", ckpt, "--tiny",
            "--num-classes", "4", "--batch", str(args.batch),
            "--seq_len", str(args.seq_len), "--height", str(args.height),
            "--width", str(args.width), "-o", model,
        ]))

    sock = osp.join(tmp, "serve.sock")
    argv = ["serve", "--model", model, "--listen", f"unix:{sock}", "--warmup"]
    if args.rank_every:
        argv += ["--capacity", "64", "--topk", "4"]
    serve_args = build_parser().parse_args(argv)
    daemon = threading.Thread(target=serve, args=(serve_args,), daemon=True)
    daemon.start()
    deadline = time.time() + 1200
    while not osp.exists(sock):
        assert daemon.is_alive() and time.time() < deadline, "daemon died"
        time.sleep(0.1)

    with ServeClient.connect(f"unix:{sock}", timeout=1200) as c:
        meta = c.ping()
        shape = (1, meta["seq_len"], meta["height"], meta["width"],
                 meta["channels"])
        rng = np.random.RandomState(0)
        clip = rng.randint(0, 256, shape, np.uint8)
        d0 = c.describe(clip)  # flush any residual cold cost before timing

        if args.rank_every:
            # enroll a small random gallery so rank has something to score
            dim = d0["features"].shape[-1]
            c.add(features=rng.randn(32, dim).astype(np.float32))
            c.rank(clip)  # flush rank's one-time compile before timing

        def issue(conn, j):
            if args.rank_every and (j + 1) % args.rank_every == 0:
                conn.rank(clip)
            else:
                conn.describe(clip)

        def snap():
            return c.stats()["describe_batching"]

        def delta(a, b):
            return {k: b[k] - a[k] for k in a}

        total = args.clients * args.reps

        # sequential: one connection, `total` single-clip requests
        s0, t0 = snap(), time.time()
        for j in range(total):
            issue(c, j)
        seq = {"wall_s": round(time.time() - t0, 3), **delta(s0, snap())}

        # concurrent: N connections x reps, barrier-aligned
        barrier = threading.Barrier(args.clients)
        errs = [None] * args.clients

        def worker(i):
            try:
                with ServeClient.connect(f"unix:{sock}", timeout=1200) as w:
                    barrier.wait()
                    for j in range(args.reps):
                        issue(w, j)
            except Exception as e:  # noqa: BLE001
                errs[i] = e
                # Release peers parked on the barrier so the failure
                # surfaces in `errs` instead of hanging the join below.
                barrier.abort()

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(args.clients)]
        s0, t0 = snap(), time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        conc = {"wall_s": round(time.time() - t0, 3), **delta(s0, snap())}
        assert all(e is None for e in errs), errs

        c.shutdown()

    for ph in (seq, conc):
        ph["clips_per_dispatch"] = round(ph["clips"] / max(ph["dispatches"], 1), 2)
    print(json.dumps({
        "platform": meta.get("platform", "?"), "batch": meta["batch"],
        "total_clips": total, "clients": args.clients,
        "rank_every": args.rank_every,
        "sequential": seq, "concurrent": conc,
        "dispatch_reduction": round(seq["dispatches"]
                                    / max(conc["dispatches"], 1), 2),
        "speedup": round(seq["wall_s"] / max(conc["wall_s"], 1e-9), 2),
    }))


if __name__ == "__main__":
    main()
