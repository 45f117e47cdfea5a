"""MARS-cardinality data-plane rehearsal (VERDICT round 2, item 6).

Generates a fake MARS at the REAL metadata scale — 625 train + 636 test
ids over 6 cameras, ~7.5k train / ~7.6k test tracklets, ~1.9k queries,
tiny JPEGs — then runs one full epoch of the actual '-d mars' train CLI
(catalog .mat parse, pair sampler, threaded native-JPEG loader, jitted
train step) and the complete standalone eval protocol, all in-process so
peak RSS covers everything. The small dress rehearsals use 8-16 ids;
host-side O(n^2) or per-epoch-RNG pathologies only show at this
cardinality.

Runs on the CPU backend by default — the point is the host data plane,
not device compute, and on the axon-tunneled TPU the client's documented
per-uploaded-byte RSS leak would dominate the memory reading (measured:
the same rehearsal peaks at 16.4 GB through the tunnel vs ~2 GB on CPU).
Pass --tpu to deliberately measure the tunnel path.

  python tools/rehearse_mars_scale.py /tmp/marscale

Prints one JSON line with phase wall-clocks and max RSS; results are
recorded in docs/PERFORMANCE.md.
"""

import argparse
import json
import os.path as osp
import resource
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))


def rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--train-ids", type=int, default=625)
    ap.add_argument("--test-ids", type=int, default=636)
    ap.add_argument("--cams", type=int, default=6)
    ap.add_argument("--tracklets-per-id-cam", type=int, default=2)
    # test tpic 3 + query_cams 3 at 636 ids / 6 cams lands at MARS's real
    # eval cardinality: 1908 queries x (1908 + 9540) columns (~1980+9330)
    ap.add_argument("--test-tracklets-per-id-cam", type=int, default=3)
    ap.add_argument("--query-cams", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--seq-len", type=int, default=4)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the attached TPU (tunnel costs + client "
                         "RSS leak included) instead of forcing CPU")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        # the axon plugin ignores the JAX_PLATFORMS env var; the platform
        # must be forced through jax.config BEFORE backend init
        jax.config.update("jax_platforms", "cpu")
    if jax.default_backend() != "cpu" and not args.tpu:
        raise SystemExit("backend already initialized as non-cpu; "
                         "run this tool in a fresh process")

    from make_fake_mars import make_fake_mars

    report = {}
    t0 = time.time()
    root = make_fake_mars(
        args.out,
        train_ids=args.train_ids,
        test_ids=args.test_ids,
        cams=args.cams,
        tracklets_per_id_cam=args.tracklets_per_id_cam,
        test_tracklets_per_id_cam=args.test_tracklets_per_id_cam,
        frames_range=(2, 5),
        height=32,
        width=16,
        query_cams=args.query_cams,
    )
    report["generate_s"] = round(time.time() - t0, 1)

    from grl_tpu.cli.evaluate import build_parser as eval_parser
    from grl_tpu.cli.evaluate import main as eval_main
    from grl_tpu.cli.train import build_parser as train_parser
    from grl_tpu.cli.train import main as train_main

    logs = osp.join(args.out, "run")
    stdout = sys.stdout
    t0 = time.time()
    try:
        top1 = train_main(train_parser().parse_args([
            "-d", "mars", "--data-dir", root, "--tiny",
            "-b", str(args.batch_size), "--seq_len", str(args.seq_len),
            "-j", str(args.workers), "--logs-dir", logs, "--epochs", "1",
        ]))
    finally:
        sys.stdout = stdout
    report["train_epoch_s"] = round(time.time() - t0, 1)
    report["train_top1"] = float(top1)
    report["rss_after_train_mb"] = round(rss_mb(), 1)

    t0 = time.time()
    try:
        etop1 = eval_main(eval_parser().parse_args([
            "-d", "mars", "--data-dir", root, "--tiny",
            "--seq_len", str(args.seq_len), "-j", str(args.workers),
            "--logs-dir", logs,
        ]))
    finally:
        sys.stdout = stdout
    report["eval_s"] = round(time.time() - t0, 1)
    report["eval_top1"] = float(etop1)
    report["max_rss_mb"] = round(rss_mb(), 1)

    from grl_tpu.data.catalogs import get_sequence

    ds = get_sequence("mars", root)
    report.update(
        train_tracklets=len(ds.train),
        query_tracklets=len(ds.query),
        gallery_tracklets=len(ds.gallery),
        train_steps=2 * len(ds.train) // args.batch_size,
    )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
