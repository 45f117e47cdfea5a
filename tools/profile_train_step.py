"""xprof a jitted hot program at a given batch size; print per-op stats.

Captures a jax.profiler trace of a few warm steps on the attached TPU and
converts the xplane with the xprof plugin's converters, printing the
top ops by self time — the tool behind docs/PERFORMANCE.md's train-step
breakdowns and the batch-scaling investigation (VERDICT round 2, weak 2).

``--program describe`` traces the bench.py descriptor program instead
(micro-batch 96, bf16, the scoped-VMEM compiler options) — the tool
behind the eval-side non-conv overhead hunt (VERDICT round 4, weak 2).

usage:
  python tools/profile_train_step.py --batch 16 --steps 3
  python tools/profile_train_step.py --batch 32 --steps 3 --tool hlo_op_stats
  python tools/profile_train_step.py --program describe --batch 96 --steps 3
"""

import argparse
import glob
import json
import os.path as osp
import sys
import tempfile

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def capture(batch, steps, seq_len, logdir):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from grl_tpu import models
    from grl_tpu.engine.optim import SGD
    from grl_tpu.engine.train_step import init_train_state, make_train_step
    from grl_tpu.utils.profiling import enable_compilation_cache, trace

    enable_compilation_cache()
    cd = jnp.bfloat16
    trunk = models.resnet50_trunk(last_stride=1, compute_dtype=cd)
    cnn = models.GRLModel(trunk=trunk, compute_dtype=cd)
    sia = models.Siamese(input_num=cnn.num_feat, output_num=512, compute_dtype=cd)
    unc = models.SiameseVideo(input_num=cnn.num_feat, compute_dtype=cd)
    opt = SGD()
    ts = init_train_state(jax.random.PRNGKey(0), cnn, sia, unc, 625, cnn.num_feat, opt)
    step = make_train_step(cnn, sia, unc, opt, donate=False)

    rng = np.random.RandomState(0)
    clips = jnp.asarray(rng.rand(batch, seq_len, 256, 128, 3).astype(np.float32))
    pids = jnp.asarray(np.repeat(np.arange(batch // 2) % 625, 2).astype(np.int32))

    ts, m = step(ts, clips, pids, 1e-3)
    float(m["loss"])  # compile + sync (host materialization; see CLAUDE.md)
    with trace(logdir):
        for _ in range(steps):
            ts, m = step(ts, clips, pids, 1e-3)
        float(m["loss"])


def capture_describe(batch, steps, seq_len, logdir):
    """Trace the exact bench.py descriptor program (bf16, scoped-VMEM
    compile options, uint8 input through the fused normalize)."""
    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np

    from grl_tpu import models
    from grl_tpu.data.transforms import normalize
    from grl_tpu.utils.profiling import (
        descriptor_compiler_options, enable_compilation_cache, trace,
    )

    enable_compilation_cache()
    cnn = models.create("resnet50_grl", compute_dtype=jnp.bfloat16)
    sia = models.create("siamese", input_num=cnn.num_feat, output_num=512,
                        compute_dtype=jnp.bfloat16)
    params, state = cnn.init(jax.random.PRNGKey(0))
    sp, ss = sia.init(jax.random.PRNGKey(1))

    @partial(jax.jit, compiler_options=descriptor_compiler_options())
    def describe(params, state, sp, ss, clips_u8):
        clips = normalize(clips_u8)
        (x_uncorr, x_corr), _ = cnn.apply(params, state, clips, training=False)
        pooled, _ = sia.self_attention(sp, ss, x_corr, training=False)
        return jnp.concatenate([x_uncorr, pooled, jnp.mean(x_corr, axis=1)], axis=1)

    clips = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (batch, seq_len, 256, 128, 3), np.uint8))
    float(jnp.sum(describe(params, state, sp, ss, clips)))  # compile + sync
    with trace(logdir):
        acc = jnp.float32(0)
        for _ in range(steps):
            acc = acc + jnp.sum(describe(params, state, sp, ss, clips))
        float(acc)


def report(logdir, tool, top):
    from xprof.convert import raw_to_tool_data as convert

    paths = sorted(glob.glob(osp.join(logdir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    names = convert.xspace_to_tool_names(paths)
    if tool == "list":
        print(names)
        return
    data, _ctype = convert.xspace_to_tool_data(paths, tool, {})
    out = data.decode() if isinstance(data, bytes) else data
    if tool == "hlo_stats":
        _print_hlo_stats(json.loads(out), top)
    else:
        print(out if isinstance(out, str) else json.dumps(out)[:20000])


def _recs(table):
    cols = [c["id"] for c in table["cols"]]
    recs = [
        {k: (c or {}).get("v") for k, c in zip(cols, r["c"])} for r in table["rows"]
    ]
    tkey = "total_self_time" if "total_self_time" in cols else "total_time"
    return cols, recs, tkey


def _print_hlo_stats(table, top):
    """Aggregate the hlo_stats gviz table: self time by category, then
    the top individual ops."""
    cols, recs, tkey = _recs(table)
    total = sum(float(r.get(tkey) or 0) for r in recs)
    by_cat = {}
    for r in recs:
        cat = r.get("category") or "?"
        by_cat.setdefault(cat, [0.0, 0])
        by_cat[cat][0] += float(r.get(tkey) or 0)
        by_cat[cat][1] += int(r.get("occurrences") or 0)
    print(f"total self time: {total / 1e3:.2f} ms (across traced steps)")
    print(f"{'category':<34} {'ms':>9} {'%':>6} {'#ops':>6}")
    for cat, (us, occ) in sorted(by_cat.items(), key=lambda kv: -kv[1][0]):
        print(f"{cat:<34} {us / 1e3:9.2f} {100 * us / total:6.1f} {occ:6d}")
    print(f"\ntop {top} ops by self time:")
    recs.sort(key=lambda r: -float(r.get(tkey) or 0))
    for r in recs[:top]:
        name = (r.get("hlo_op_name") or "?")[:60]
        print(
            f"{float(r.get(tkey) or 0) / 1e3:8.2f} ms  x{int(r.get('occurrences') or 0):<4}"
            f" {r.get('category', '?'):<22} {name}"
        )


# v5e peaks for the roofline columns (same anchors as
# docs/PERFORMANCE.md "Roofline anchors")
_PEAK_TFLOPS_BF16 = 197.0
_PEAK_HBM_GBS = 819.0


def _print_roofline(table, steps, pattern):
    """Per-HLO roofline table for ops matching ``pattern`` (default: the
    convolution fusions): self time, achieved TFLOP/s and HBM GB/s from
    the profiler's own flop/byte counts, and which peak binds each op.
    The table behind the conv-backward interrogation (VERDICT round 3,
    weak 5 / next 5) — the same method that exonerated conv1 from the
    space-to-depth idea (docs/PERFORMANCE.md)."""
    import re

    cols, recs, tkey = _recs(table)
    # column names vary across xprof versions; detect what exists
    def pick(r, *names):
        for n in names:
            if r.get(n) is not None:
                return float(r[n])
        return 0.0

    rx = re.compile(pattern)
    rows = []
    for r in recs:
        name = r.get("hlo_op_name") or ""
        if not (rx.search(name) or rx.search(r.get("category") or "")):
            continue
        us = pick(r, tkey)  # across all traced steps
        if us <= 0:
            continue
        gflops = pick(r, "model_flops", "flops")  # summed over occurrences
        # rates: prefer the profiler's own normalized rate columns
        tflops_s = pick(r, "measured_flop_rate", "model_flop_rate") / 1e3
        gbytes_s = pick(r, "measured_memory_bw", "memory_bw")
        if not tflops_s and gflops:
            tflops_s = gflops / us / 1e3
        rows.append({
            "name": name,
            "ms_step": us / 1e3 / max(steps, 1),
            "occ": int(r.get("occurrences") or 0),
            "tflops_s": tflops_s, "gbytes_s": gbytes_s,
            "pct_mxu": 100 * tflops_s / _PEAK_TFLOPS_BF16,
            "pct_hbm": 100 * gbytes_s / _PEAK_HBM_GBS,
        })
    rows.sort(key=lambda r: -r["ms_step"])
    tot = sum(r["ms_step"] for r in rows)
    print(f"{len(rows)} matching ops, {tot:.2f} ms/step total "
          f"(peaks: {_PEAK_TFLOPS_BF16:.0f} TFLOP/s bf16, "
          f"{_PEAK_HBM_GBS:.0f} GB/s HBM)")
    print(f"{'ms/step':>8} {'x':>4} {'TFLOP/s':>8} {'%MXU':>6} "
          f"{'GB/s':>7} {'%HBM':>6}  {'bound':<5} name")
    for r in rows:
        bound = "MXU" if r["pct_mxu"] >= r["pct_hbm"] else "HBM"
        print(f"{r['ms_step']:8.3f} {r['occ']:>4} {r['tflops_s']:8.1f} "
              f"{r['pct_mxu']:6.1f} {r['gbytes_s']:7.1f} {r['pct_hbm']:6.1f}"
              f"  {bound:<5} {r['name'][:70]}")
    if rows and not any(r["tflops_s"] for r in rows):
        print("\n(no flop-rate columns in this xprof build; available "
              "columns:)", [c for c in cols])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--seq_len", type=int, default=8)
    ap.add_argument("--tool", default="hlo_stats",
                    help="xprof tool name, or 'list' to enumerate")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--logdir", default="")
    ap.add_argument("--report-only", action="store_true",
                    help="skip capture; parse an existing --logdir")
    ap.add_argument("--roofline", default="",
                    help="per-HLO roofline table for ops whose name or "
                         "category matches this regex (e.g. 'convolution')")
    ap.add_argument("--program", default="train", choices=["train", "describe"],
                    help="which jitted program to trace")
    args = ap.parse_args()

    logdir = args.logdir or tempfile.mkdtemp(prefix=f"xprof_b{args.batch}_")
    if not args.report_only:
        if args.program == "describe":
            capture_describe(args.batch, args.steps, args.seq_len, logdir)
        else:
            capture(args.batch, args.steps, args.seq_len, logdir)
        print(f"trace captured in {logdir}", file=sys.stderr)
    if args.roofline:
        from xprof.convert import raw_to_tool_data as convert

        paths = sorted(glob.glob(osp.join(logdir, "**", "*.xplane.pb"),
                                 recursive=True))
        data, _ = convert.xspace_to_tool_data(paths, "hlo_stats", {})
        out = data.decode() if isinstance(data, bytes) else data
        _print_roofline(json.loads(out), args.steps, args.roofline)
        return
    report(logdir, args.tool, args.top)


if __name__ == "__main__":
    main()
