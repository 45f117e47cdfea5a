"""Free-running learning-equivalence: literal reference vs grl_tpu.

Every training-parity test in tests/ is per-step (the 3-step trajectory
test teacher-forces torch back onto the jax state each step — correctly,
since elementwise free-running comparison is chaotic). This tool closes
the remaining system-level gap: it trains BOTH stacks — the literal
reference (reid/train/trainer.py:25-78 loop, mars_train.py:94-142
optimizer/schedule, reid/data/dataloader.py get_data pipeline,
attevaluator.py:125-163 eval protocol; all loaded byte-for-byte from
/root/reference on torch-CPU) and the grl_tpu CLI — free-running on the
SAME fake-MARS tree through the SAME miniature schedule (several
lr-decay boundaries included), across several seeds, and compares the
*outcomes*: final rank-1/mAP and the per-step loss-trajectory envelope.
A systemic divergence that accumulates per-step-invisibly (augmentation
distribution, lr-schedule off-by-one, BN-momentum drift, lut evolution)
would pass every per-step test and still show up here.

Faithfulness notes (what is literal vs glue):
- reference side: get_data / VideoDataset / RandomPairSamplerForMars /
  seqtransforms / SEQTrainer / OIMLoss / PairLoss / torch.optim.SGD
  4-group construction / adjust_lr / ATTEvaluator(only_eval=False) are
  all the reference's own code. Glue: the Mars class's hardcoded root
  is re-pointed at the tree (documented reference bug), DataParallel is
  skipped (CPU), pretrained=False (no egress — BOTH sides train from
  random init), and the trainer's tensorboard writer is replaced by an
  in-memory recorder (observation only; the literal loop calls
  writer.add_scalar each step, trainer.py:63-65).
- the literal only_eval=False eval path (rrs_test clips, batch 30,
  gallery = query ∪ gallery, cosine distmat, MARS protocol) is exactly
  what mars_train.py's periodic eval runs; its dense path (only_eval
  =True) hard-codes .cuda() (attevaluator.py:70) and cannot run here.
- `random` is seeded too (the reference leaves its augmentation RNG
  unseeded — this tool must be reproducible).
- grl_tpu side: the real CLI (`python -m grl_tpu.cli.train -d mars`)
  in a subprocess, CPU backend by default (`--grl-tpu` to run on the
  chip), identical flags/schedule/protocol.
- known free-running behavior divergence, kept faithful here: after the
  reference's FIRST periodic eval, ATTEvaluator.extract_feature puts the
  siamese head in eval() (attevaluator.py:62-63) and BaseTrainer.train
  only flips the cnn back (`self.model.train()`, trainer.py:26) — the
  siamese heads train with eval-mode BN (running stats) for every epoch
  after the first eval. grl_tpu trains all modules in training mode
  throughout. If endpoints diverge, test this quirk first.

Runtime: the reference side is torch-CPU at ~4 frames/s forward — with
the default schedule (8 train ids x 2 cams x 2 tracklets, batch 8,
seq_len 4, 8 epochs = 64 steps, lr decays at epochs 3 and 6) one seed
is ~20-30 min on this VM; grl_tpu-CPU is similar. Results land in
OUT/summary.json + OUT/summary.md (paste into docs/PARITY.md).

usage:
  python tools/learning_equivalence.py --out /tmp/leq --seeds 0 1        # both sides
  python tools/learning_equivalence.py --out /tmp/leq --side ref --seeds 0
  python tools/learning_equivalence.py --out /tmp/leq --summarize-only
  python tools/learning_equivalence.py --out /tmp/leq --smoke            # ~3 min plumbing check
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import os.path as osp
import re
import subprocess
import sys
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, osp.join(REPO, "tests"))

import numpy as np

REF = "/root/reference"
EVAL_RE = re.compile(r"Mean AP: *([\d.]+)%")
RANK_RE = re.compile(r"Rank-(\d+) *: *([\d.]+)%")
EPOCH_LOSS_RE = re.compile(r"^epoch (\d+): loss ([\d.]+) ", re.M)


def eval_epochs(epochs):
    """The literal periodic-eval cadence (mars_train.py:135)."""
    return [e for e in range(epochs)
            if (e + 1) % 5 == 0 or (e + 1) == epochs
            or ((e + 1) > 30 and (e + 1) % 3 == 0)]


def build_tree(args):
    """One shared fake-MARS tree for every seed/side (data fixed; seeds
    vary init + sampling/augmentation RNG). 256x128 frames on disk so
    RectScale(256,128) is a no-op on both sides (removes the resize
    implementation as a confounder) and the reference's small-map
    bit-rot is never in play."""
    from tools.make_fake_mars import make_fake_mars

    tree = osp.join(args.out, "tree")
    if not osp.exists(osp.join(tree, "info", "query_IDX.mat")):
        make_fake_mars(
            tree,
            train_ids=args.train_ids,
            test_ids=args.test_ids,
            cams=2,
            tracklets_per_id_cam=args.tracklets,
            test_tracklets_per_id_cam=args.tracklets,
            frames_range=(12, 20),
            height=256,
            width=128,
            seed=args.data_seed,
            junk_tracklets=1,
            query_cams=2,
        )
        print(f"[leq] wrote tree {tree}")
    return tree


class _Recorder:
    """Stands in for the SEQTrainer's tensorboard writer — the literal
    loop calls add_scalar('train/total_loss_step', ...) every step."""

    def __init__(self):
        self.scalars = {}

    def add_scalar(self, tag, value, step):
        self.scalars.setdefault(tag, []).append([int(step), float(value)])


class _Tee(io.TextIOBase):
    def __init__(self, *sinks):
        self.sinks = sinks

    def write(self, s):
        for k in self.sinks:
            k.write(s)
        return len(s)

    def flush(self):
        for k in self.sinks:
            k.flush()


def parse_eval_block(text):
    """mAP + rank-k out of the literal evaluate_seq prints
    (attevaluator.py:24-28; grl_tpu prints the identical format)."""
    maps = [float(m) for m in EVAL_RE.findall(text)]
    ranks = {}
    for k, v in RANK_RE.findall(text):
        ranks.setdefault(int(k), []).append(float(v))
    if not maps:
        return None
    return {
        "mAP": maps[-1],
        **{f"rank{k}": v[-1] for k, v in ranks.items()},
    }


def run_reference(args, tree, seed):
    """Train + eval the literal reference stack on torch-CPU."""
    import random

    import torch

    from reference_loader import load_reference_models, load_reference_training

    t0 = time.time()
    # the literal seeding (mars_train.py:48-50) + `random` for the
    # augmentation RNG (seqtransforms uses the random module, which the
    # reference never seeds)
    np.random.seed(seed)
    torch.manual_seed(seed)
    random.seed(seed)

    ref = load_reference_models()
    tr = load_reference_training()

    # the literal data pipeline: reid.data.dataloader.get_data with the
    # Mars class's hardcoded root re-pointed at the tree. Import order
    # resolves the reid.data <-> reid.dataset cycle (see
    # reference_loader.load_reference_sequences).
    added = REF not in sys.path
    if added:
        sys.path.insert(0, REF)
    try:
        import reid.data  # noqa: F401
        import reid.data.dataloader as ref_dataloader
        import reid.dataset.mars as ref_mars
    finally:
        if added:
            sys.path.remove(REF)
    from reference_loader import point_reference_mars_at

    point_reference_mars_at(ref_mars.Mars, tree)

    dataset, num_classes, train_loader, query_loader, gallery_loader = (
        ref_dataloader.get_data("mars", 0, tree, args.batch, args.seq_len,
                                args.seq_srd, workers=0, only_eval=False)
    )

    # literal model/criterion construction (mars_train.py:76-91), sans
    # DataParallel (CPU) and with pretrained=False (no egress; the
    # loader's resnet50_s1 binding never downloads regardless)
    cnn = ref.grl_model.resnet50_grl(
        pretrained=False, num_features=2048, dropout=0, numclasses=num_classes
    ).train()
    siamese = ref.Siamese.Siamese(input_num=2048, output_num=512, class_num=2).train()
    siamese_uncorr = ref.Siamese_video.Siamese_video(
        input_num=2048, output_num=512, class_num=2
    ).train()

    crit_corr = tr.loss.OIMLoss(2048, num_classes, scalar=30.0, momentum=0.5)
    crit_uncorr = tr.loss.OIMLoss(2048, num_classes, scalar=30.0, momentum=0.5)
    crit_veri = tr.loss.PairLoss()

    # literal 4-group SGD (mars_train.py:94-108)
    base_param_ids = set(map(id, cnn.backbone.parameters()))
    new_params = [p for p in cnn.parameters() if id(p) not in base_param_ids]
    param_groups = [
        {"params": cnn.backbone.parameters(), "lr_mult": 1},
        {"params": new_params, "lr_mult": 2},
        {"params": siamese.parameters(), "lr_mult": 2},
        {"params": siamese_uncorr.parameters(), "lr_mult": 2},
    ]
    optimizer = torch.optim.SGD(param_groups, lr=args.lr, momentum=0.9,
                                weight_decay=5e-4, nesterov=True)

    def adjust_lr(epoch):  # mars_train.py:110-114
        lr = args.lr * (0.1 ** (epoch // args.lr_step))
        print(lr)
        for g in optimizer.param_groups:
            g["lr"] = lr * g.get("lr_mult", 1)

    logdir = osp.join(args.out, f"ref_seed{seed}")
    os.makedirs(logdir, exist_ok=True)
    trainer = tr.trainer.SEQTrainer(
        cnn, siamese, siamese_uncorr, crit_veri, crit_corr, crit_uncorr, logdir
    )
    recorder = _Recorder()
    trainer.writer = recorder  # observe the literal per-step add_scalar

    evaluator = make_reference_evaluator(cnn, siamese)

    evals = []
    for epoch in range(args.epochs):
        adjust_lr(epoch)
        te = time.time()
        trainer.train(epoch, train_loader, optimizer)
        steps = len(recorder.scalars.get("train/total_loss_step", []))
        print(f"[leq ref seed {seed}] epoch {epoch} done "
              f"({time.time() - te:.0f}s, {steps} total steps)")
        if epoch in eval_epochs(args.epochs):
            buf = io.StringIO()
            top1 = None
            try:
                with contextlib.redirect_stdout(_Tee(sys.__stdout__, buf)):
                    top1 = evaluator.evaluate(
                        dataset.query, dataset.gallery, query_loader,
                        gallery_loader, logdir, 0, 0,
                    )
            except IndexError:
                # literal evaluate_seq prints Rank-{1,5,10,20} unguarded
                # (attevaluator.py:27); galleries smaller than 20 index past
                # the CMC curve AFTER mAP/rank-1 are already printed —
                # smoke-scale only, recover them from the captured output
                pass
            block = parse_eval_block(buf.getvalue()) or {}
            block["epoch"] = epoch
            block["top1"] = (float(top1) if top1 is not None
                             else block.get("rank1", 0.0) / 100.0)
            evals.append(block)

    out = {
        "side": "ref",
        "seed": seed,
        "num_classes": num_classes,
        "loss_steps": recorder.scalars.get("train/total_loss_step", []),
        "evals": evals,
        "wall_s": round(time.time() - t0, 1),
        "schedule": vars(args) | {"out": None},
    }
    path = osp.join(args.out, f"ref_seed{seed}.json")
    with open(path, "w") as f:
        json.dump(out, f)
    print(f"[leq] wrote {path} ({out['wall_s']}s)")
    return out


def make_reference_evaluator(cnn, siamese):
    """The literal ATTEvaluator (only_eval=False — the mars_train.py:117
    periodic-eval construction). attevaluator.py imports `.visualize`
    (matplotlib) and package-relative siblings, so it loads through the
    reference package machinery like reference_loader's other loaders."""
    added = REF not in sys.path
    if added:
        sys.path.insert(0, REF)
    try:
        import reid.evaluator.attevaluator as att
    finally:
        if added:
            sys.path.remove(REF)
    return att.ATTEvaluator(cnn, siamese, only_eval=False)


def run_grl(args, tree, seed):
    """Train + eval grl_tpu through its real CLI in a subprocess."""
    t0 = time.time()
    logdir = osp.join(args.out, f"grl_seed{seed}")
    cmd = [
        sys.executable, osp.abspath(__file__), "--grl-worker",
        "--out", args.out, "--seeds", str(seed),
        "--epochs", str(args.epochs), "--lr-step", str(args.lr_step),
        "--lr", str(args.lr), "--batch", str(args.batch),
        "--seq-len", str(args.seq_len), "--seq-srd", str(args.seq_srd),
        "--train-ids", str(args.train_ids), "--test-ids", str(args.test_ids),
        "--tracklets", str(args.tracklets), "--data-seed", str(args.data_seed),
    ]
    if args.grl_tpu:
        cmd.append("--grl-tpu")
    if args.grl_bf16:
        cmd.append("--grl-bf16")
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    subprocess.run(cmd, check=True, env=env)

    # parse the CLI's tee log: per-epoch loss lines + the literal-format
    # eval blocks (identical cadence: (epoch+1)%5==0 or final)
    log = osp.join(logdir, "log_train0.txt")
    with open(log) as f:
        text = f.read()
    epoch_losses = [[int(e), float(l)] for e, l in EPOCH_LOSS_RE.findall(text)]
    rank_blocks: list[dict] = []
    for line in text.splitlines():
        m = EVAL_RE.search(line)
        if m:
            rank_blocks.append({"mAP": float(m.group(1))})
        m = RANK_RE.search(line)
        if m and rank_blocks:
            rank_blocks[-1][f"rank{m.group(1)}"] = float(m.group(2))
    evals = []
    for ep, block in zip(eval_epochs(args.epochs), rank_blocks):
        block["epoch"] = ep
        block["top1"] = block.get("rank1", 0.0) / 100.0
        evals.append(block)

    loss_steps = []
    scalars = osp.join(logdir, "train_log", "scalars.jsonl")
    if osp.exists(scalars):
        with open(scalars) as f:
            for line in f:
                rec = json.loads(line)
                if rec["tag"] == "train/total_loss_step":
                    loss_steps.append([rec["step"], rec["value"]])

    out = {
        "side": "grl",
        "seed": seed,
        "platform": "tpu" if args.grl_tpu else "cpu",
        "bf16": bool(args.grl_bf16),
        "loss_steps": loss_steps,
        "epoch_losses": epoch_losses,
        "evals": evals,
        "wall_s": round(time.time() - t0, 1),
        "schedule": vars(args) | {"out": None},
    }
    path = osp.join(args.out, f"grl_seed{seed}.json")
    with open(path, "w") as f:
        json.dump(out, f)
    print(f"[leq] wrote {path} ({out['wall_s']}s)")
    return out


def grl_worker(args):
    """Subprocess body: force the CPU backend (unless --grl-tpu), then run
    the real train CLI main()."""
    if not args.grl_tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from grl_tpu.cli.train import build_parser, main

    tree = osp.join(args.out, "tree")
    seed = args.seeds[0]
    logdir = osp.join(args.out, f"grl_seed{seed}")
    argv = [
        "-d", "mars", "--data-dir", tree, "-b", str(args.batch),
        "--seq_len", str(args.seq_len), "--seq_srd", str(args.seq_srd),
        "--epochs", str(args.epochs), "--lr_step", str(args.lr_step),
        "--lr", str(args.lr), "--seed", str(seed), "--logs-dir", logdir,
        "-j", "2",
    ]
    if args.grl_bf16:
        argv.append("--bf16")
    main(build_parser().parse_args(argv))


def _env(vals):
    vals = sorted(vals)
    mid = vals[len(vals) // 2] if len(vals) % 2 else 0.5 * (
        vals[len(vals) // 2 - 1] + vals[len(vals) // 2])
    return {"min": vals[0], "median": round(mid, 3), "max": vals[-1], "n": len(vals)}


def summarize(args):
    runs = {"ref": [], "grl": []}
    for name in sorted(os.listdir(args.out)):
        if name.endswith(".json") and (name.startswith("ref_seed")
                                       or name.startswith("grl_seed")):
            with open(osp.join(args.out, name)) as f:
                r = json.load(f)
            runs[r["side"]].append(r)
    summary = {"config": {k: v for k, v in vars(args).items()
                          if k not in ("side", "summarize_only", "grl_worker")}}
    lines = ["# Learning equivalence: literal reference vs grl_tpu", ""]
    lines.append(f"Shared fake-MARS tree: {args.train_ids} train ids x 2 cams x "
                 f"{args.tracklets} tracklets, {args.test_ids} test ids; batch "
                 f"{args.batch}, seq_len {args.seq_len}, {args.epochs} epochs, "
                 f"lr {args.lr} x0.1 every {args.lr_step} (decays inside the run); "
                 f"free-running, both sides from random init, seeds vary "
                 f"init+sampling+augmentation.")
    lines.append("")
    lines.append("| side | seed | final mAP % | final rank-1 % | first-step loss | final-epoch loss | wall s |")
    lines.append("|---|---|---|---|---|---|---|")
    for side in ("ref", "grl"):
        for r in runs[side]:
            fin = r["evals"][-1] if r["evals"] else {}
            ls = r["loss_steps"]
            first = ls[0][1] if ls else float("nan")
            k = max(1, len(ls) // args.epochs)
            last_ep = [v for _, v in ls[-k:]] if ls else [float("nan")]
            tag = side if side == "ref" else (
                f"grl/{r.get('platform', '?')}{'/bf16' if r.get('bf16') else ''}")
            lines.append(
                f"| {tag} | {r['seed']} | {fin.get('mAP', float('nan')):.1f} | "
                f"{fin.get('rank1', float('nan')):.1f} | {first:.1f} | "
                f"{float(np.mean(last_ep)):.2f} | {r['wall_s']:.0f} |")
    for side in ("ref", "grl"):
        if runs[side]:
            summary[side] = {
                "final_mAP": _env([r["evals"][-1]["mAP"] for r in runs[side]
                                   if r["evals"]]),
                "final_rank1": _env([r["evals"][-1].get("rank1", 0.0)
                                     for r in runs[side] if r["evals"]]),
                "first_step_loss": _env([r["loss_steps"][0][1] for r in runs[side]
                                         if r["loss_steps"]]),
                "final_step_loss": _env([r["loss_steps"][-1][1] for r in runs[side]
                                         if r["loss_steps"]]),
                "seeds": [r["seed"] for r in runs[side]],
            }
    lines.append("")
    if runs["ref"] and runs["grl"]:
        rm = summary["ref"]["final_mAP"]["median"]
        gm = summary["grl"]["final_mAP"]["median"]
        ref_span = summary["ref"]["final_mAP"]["max"] - summary["ref"]["final_mAP"]["min"]
        verdict = ("WITHIN seed noise"
                   if abs(gm - rm) <= max(ref_span, 5.0) else "DIVERGENT")
        summary["verdict"] = verdict
        lines.append(f"Median final mAP: reference {rm:.1f}% vs grl_tpu {gm:.1f}% "
                     f"(reference seed span {ref_span:.1f} pts) -> **{verdict}**")
    text = "\n".join(lines) + "\n"
    with open(osp.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    with open(osp.join(args.out, "summary.md"), "w") as f:
        f.write(text)
    print(text)
    return summary


def build_parser():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", required=True)
    ap.add_argument("--side", choices=["both", "ref", "grl"], default="both")
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1])
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--lr-step", type=int, default=3)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq-len", type=int, default=4)
    ap.add_argument("--seq-srd", type=int, default=4)
    ap.add_argument("--train-ids", type=int, default=8)
    ap.add_argument("--test-ids", type=int, default=8)
    ap.add_argument("--tracklets", type=int, default=2,
                    help="tracklets per (id, cam)")
    ap.add_argument("--data-seed", type=int, default=100)
    ap.add_argument("--grl-tpu", action="store_true",
                    help="run the grl_tpu side on the default backend "
                         "(the tunneled TPU) instead of forcing CPU")
    ap.add_argument("--grl-bf16", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="~3 min plumbing check: 2 ids, 1 epoch, 1 seed")
    ap.add_argument("--summarize-only", action="store_true")
    ap.add_argument("--grl-worker", action="store_true", help=argparse.SUPPRESS)
    return ap


def main():
    args = build_parser().parse_args()
    if args.grl_worker:
        grl_worker(args)
        return
    if args.smoke:
        # tracklets must stay 2: with 1 tracklet/(id,cam) and query_cams=2
        # every test tracklet is a query and the gallery is empty (both
        # frameworks reject that, as does the reference)
        args.train_ids, args.test_ids, args.tracklets = 2, 2, 2
        args.epochs, args.batch, args.seq_len, args.seeds = 1, 4, 2, args.seeds[:1]
    os.makedirs(args.out, exist_ok=True)
    if args.summarize_only:
        summarize(args)
        return
    tree = build_tree(args)
    for seed in args.seeds:
        if args.side in ("both", "grl"):
            run_grl(args, tree, seed)
        if args.side in ("both", "ref"):
            run_reference(args, tree, seed)
    summarize(args)


if __name__ == "__main__":
    main()
