"""End-to-end CLI tests: the reference's whole purpose is the
train -> periodic-eval -> checkpoint -> resume -> standalone-eval loop
(mars_train.py:130-142, test_all.py:49-92). These drive the actual
``main()`` entry points on the synthetic dataset, single-device and on the
virtual 8-device mesh."""

import os.path as osp
import re
import sys
import time

import jax
import numpy as np
import pytest

from grl_tpu.cli.evaluate import build_parser as eval_parser
from grl_tpu.cli.evaluate import main as eval_main
from grl_tpu.cli.train import build_parser as train_parser
from grl_tpu.cli.train import main as train_main


def run_train(tmp, logs, extra=()):
    argv = [
        "-d", "synthetic", "--tiny", "-b", "4", "--seq_len", "2", "-j", "2",
        "--logs-dir", str(logs), *extra,
    ]
    args = train_parser().parse_args(argv)
    stdout = sys.stdout
    try:
        return train_main(args)
    finally:
        sys.stdout = stdout


def epoch_losses(logfile):
    pat = re.compile(r"^epoch (\d+): loss ([0-9.]+)")
    out = {}
    with open(logfile) as f:
        for line in f:
            m = pat.match(line)
            if m:
                out[int(m.group(1))] = float(m.group(2))
    return out


def test_train_checkpoint_resume_evaluate_visual(tmp_path):
    logs = tmp_path / "run"

    # 2 epochs -> periodic eval fires at the final epoch -> checkpoints
    top1 = run_train(tmp_path, logs, ["--epochs", "2"])
    assert 0.0 <= top1 <= 1.0
    ckpt = logs / "checkpoint.npz"
    best = logs / "checkpoint_best.npz"
    assert ckpt.exists() and best.exists()

    state = np.load(ckpt, allow_pickle=False)
    assert int(state["extra_epoch"]) == 2

    # resume continues the epoch counter and rewrites the checkpoint
    run_train(tmp_path, logs, ["--epochs", "3", "--resume", str(ckpt)])
    losses = epoch_losses(logs / "log_train1.txt")
    assert list(losses) == [2], f"resume should train exactly epoch 2, got {losses}"
    state = np.load(ckpt, allow_pickle=False)
    assert int(state["extra_epoch"]) == 3

    # standalone eval loads checkpoint_best and reports CMC/mAP (+ strips
    # + k-reciprocal re-ranking through the CLI flag)
    argv = [
        "-d", "synthetic", "--tiny", "--seq_len", "2", "-j", "2",
        "--logs-dir", str(logs), "--visual", "1", "--rerank", "1",
    ]
    args = eval_parser().parse_args(argv)
    stdout = sys.stdout
    try:
        top1_eval = eval_main(args)
    finally:
        sys.stdout = stdout
    assert 0.0 <= top1_eval <= 1.0

    log = (logs / "log_test0.txt").read_text()
    assert "Mean AP" in log and "Rank-1" in log
    visual = logs / "visual"
    assert visual.exists() and any(visual.iterdir()), "no ranked strips written"


def test_evaluate_save_distmat_visual_from_roundtrip(tmp_path):
    """--save-distmat persists the final (post-rerank) distance matrix +
    ids; --visual-from re-renders ranked strips and re-runs the protocol
    from that npz with NO checkpoint, model, or feature extraction —
    completing the reference's dist.mat round-trip intent (its --visual
    loads a dist.mat nothing in its repo ever writes,
    attevaluator.py:130-135)."""
    logs = tmp_path / "run"
    run_train(tmp_path, logs, ["--epochs", "1"])

    npz = tmp_path / "dist.npz"
    argv = ["-d", "synthetic", "--tiny", "--seq_len", "2", "-j", "2",
            "--logs-dir", str(logs), "--rerank", "1",
            "--save-distmat", str(npz)]
    stdout = sys.stdout
    try:
        top1 = eval_main(eval_parser().parse_args(argv))
    finally:
        sys.stdout = stdout
    assert npz.exists()
    blob = np.load(npz)
    assert bool(blob["rerank"]) is True
    assert blob["distmat"].shape == (len(blob["q_pids"]), len(blob["g_pids"]))

    # round-trip into a FRESH logs dir: no checkpoint anywhere near it
    logs2 = tmp_path / "replay"
    argv = ["-d", "synthetic", "--tiny", "--seq_len", "2", "-j", "2",
            "--logs-dir", str(logs2), "--visual-from", str(npz)]
    try:
        top1_replay = eval_main(eval_parser().parse_args(argv))
    finally:
        sys.stdout = stdout
    assert top1_replay == pytest.approx(top1)
    visual = logs2 / "visual"
    assert visual.exists() and any(visual.iterdir()), "no ranked strips written"
    log = (logs2 / "log_test0.txt").read_text()
    assert "Mean AP" in log and "Rank-1" in log

    # a distmat saved from a different dataset/split errors loudly instead
    # of rendering garbage strips
    wrong = tmp_path / "wrong.npz"
    np.savez(wrong, distmat=blob["distmat"][:, :-1], q_pids=blob["q_pids"],
             g_pids=blob["g_pids"][:-1], q_camids=blob["q_camids"],
             g_camids=blob["g_camids"][:-1], rerank=blob["rerank"])
    argv = ["-d", "synthetic", "--tiny", "--seq_len", "2", "-j", "2",
            "--logs-dir", str(logs2), "--visual-from", str(wrong)]
    try:
        with pytest.raises(SystemExit, match="same dataset"):
            eval_main(eval_parser().parse_args(argv))
    finally:
        sys.stdout = stdout


def test_sigterm_preemption_checkpoints_and_resumes(tmp_path, monkeypatch):
    """Graceful preemption: SIGTERM mid-run must stop at a step boundary,
    write a consistent checkpoint, and return — and --resume must replay
    the interrupted epoch. The signal is raised deterministically at the
    start of epoch 1 (hooked through step_decay_lr, which main() calls
    once per epoch)."""
    import signal

    import grl_tpu.cli.train as cli_train

    logs = tmp_path / "pre"
    orig = cli_train.step_decay_lr

    def hooked(lr, epoch, step):
        if epoch == 1:
            signal.raise_signal(signal.SIGTERM)
        return orig(lr, epoch, step)

    monkeypatch.setattr(cli_train, "step_decay_lr", hooked)
    run_train(tmp_path, logs, ["--epochs", "4"])
    monkeypatch.setattr(cli_train, "step_decay_lr", orig)

    # epoch 0 completed and was checkpointed; epoch 1 was preempted before
    # its first step, so the persisted state says "redo epoch 1"
    ckpt = logs / "checkpoint.npz"
    assert ckpt.exists()
    assert int(np.load(ckpt, allow_pickle=False)["extra_epoch"]) == 1
    log = (logs / "log_train0.txt").read_text()
    assert "preempted during epoch 1" in log
    assert "stop requested" in log

    # the handler was restored after main() returned
    assert signal.getsignal(signal.SIGTERM) in (signal.SIG_DFL, signal.default_int_handler)

    # resume replays epoch 1 and runs to completion
    run_train(tmp_path, logs, ["--epochs", "2", "--resume", str(ckpt)])
    losses = epoch_losses(logs / "log_train1.txt")
    assert list(losses) == [1], f"resume should train exactly epoch 1, got {losses}"
    assert int(np.load(ckpt, allow_pickle=False)["extra_epoch"]) == 2
    assert (logs / "checkpoint_best.npz").exists()


def test_unsupported_flags_rejected():
    """Accepted-but-ignored flags are a user trap — unsupported values must
    error loudly (--loss xentropy silently trained with OIM before)."""
    from grl_tpu.cli.train import validate_args

    base = ["-d", "synthetic", "--tiny"]
    for extra in (
        ["--loss", "xentropy"],
        ["--dropout", "0.5"],
        ["--sampling-rate", "5"],
        ["--features", "512"],  # GRL arch: feature width fixed at 2048
        ["--arch1", "resnet50"],  # no live path (dead in the reference too)
        ["--ckpt-freq", "0"],  # would ZeroDivisionError at the first epoch end
    ):
        # rejection may come from argparse itself (e.g. --loss now lists
        # only supported choices) or from validate_args — either is the
        # required loud failure.
        with pytest.raises(SystemExit):
            validate_args(train_parser().parse_args(base + extra))
    # supported values pass
    validate_args(train_parser().parse_args(base + ["--sample_method", "random"]))


def test_non_zero_process_skips_checkpoint_writes(tmp_path, monkeypatch):
    """Multi-host: the train state is replicated, so only process 0 writes
    checkpoints — N hosts pulling + writing identical bytes to one shared
    path would multiply the traffic for nothing."""
    import jax

    from grl_tpu.cli import train as train_cli

    monkeypatch.setattr(jax, "process_index", lambda: 1)
    logs = tmp_path / "nonwriter"
    top1 = run_train(tmp_path, logs, ["--epochs", "1"])
    assert 0.0 <= top1 <= 1.0
    assert not (logs / "checkpoint.npz").exists()
    assert not (logs / "checkpoint_best.npz").exists()


def test_sample_method_random_trains(tmp_path):
    logs = tmp_path / "rand"
    top1 = run_train(tmp_path, logs, ["--epochs", "1", "--sample_method", "random"])
    assert 0.0 <= top1 <= 1.0


def test_real_mars_layout_end_to_end(tmp_path):
    """Dress rehearsal for the real-data round: generate the EXACT MARS
    on-disk layout (bbox dirs + info .txt/.mat) with real JPEGs and run
    the actual '-d mars' path through train + standalone eval — .mat
    parsing, junk filtering, native JPEG decode, RRS over path tuples,
    dense eval."""
    sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools"))
    from make_fake_mars import make_fake_mars

    root = make_fake_mars(str(tmp_path / "MARS"), train_ids=2, test_ids=2,
                          frames_range=(8, 11), height=64, width=32)

    logs = tmp_path / "run"
    argv = ["-d", "mars", "--data-dir", root, "--tiny", "-b", "4",
            "--seq_len", "2", "-j", "2", "--logs-dir", str(logs),
            "--epochs", "1"]
    args = train_parser().parse_args(argv)
    stdout = sys.stdout
    try:
        top1 = train_main(args)
    finally:
        sys.stdout = stdout
    assert 0.0 <= top1 <= 1.0
    assert (logs / "checkpoint_best.npz").exists()

    args = eval_parser().parse_args([
        "-d", "mars", "--data-dir", root, "--tiny", "--seq_len", "2",
        "-j", "2", "--logs-dir", str(logs),
    ])
    try:
        top1_eval = eval_main(args)
    finally:
        sys.stdout = stdout
    assert 0.0 <= top1_eval <= 1.0
    # the split cache landed next to the data like the reference
    assert any(p.suffix == ".json" for p in (tmp_path / "MARS").iterdir())


def test_real_duke_layout_end_to_end(tmp_path):
    """Same dress rehearsal for the Duke directory layout (BASELINE
    config 4: variable-length tracklets through the clip sampler)."""
    sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools"))
    from make_fake_duke import make_fake_duke

    root = make_fake_duke(str(tmp_path / "duke"), train_ids=2, test_ids=2,
                          frames_range=(6, 14), height=64, width=32)
    logs = tmp_path / "run"
    argv = ["-d", "duke", "--data-dir", root, "--tiny", "-b", "4",
            "--seq_len", "2", "-j", "2", "--logs-dir", str(logs),
            "--epochs", "1"]
    args = train_parser().parse_args(argv)
    stdout = sys.stdout
    try:
        top1 = train_main(args)
    finally:
        sys.stdout = stdout
    assert 0.0 <= top1 <= 1.0
    assert (logs / "checkpoint_best.npz").exists()


def test_pretrained_trunk_cli_flag(tmp_path):
    """--pretrained-trunk must actually land torchvision-format weights in
    the train state through the CLI (the real-data parity recipe's first
    step); only the converter function was tested before."""
    import torch

    from test_convert_torch import TorchTrunk

    torch.manual_seed(0)
    tmodel = TorchTrunk(layers=(1, 1, 1, 1), width=4)  # --tiny trunk shape
    with torch.no_grad():
        tmodel.conv1.weight.fill_(0.77)  # distinctive marker value
    flat = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    wpath = tmp_path / "trunk.npz"
    np.savez(wpath, **flat)

    logs = tmp_path / "pt"
    run_train(tmp_path, logs, ["--epochs", "1", "--pretrained-trunk", str(wpath)])
    log = (logs / "log_train0.txt").read_text()
    assert f"loaded ImageNet trunk from {wpath}" in log

    # the marker conv1 kernel reached the trained checkpoint (one epoch of
    # SGD at lr 1e-3 moves it only slightly; random kaiming init would not
    # be a near-constant 0.77)
    data = np.load(logs / "checkpoint.npz", allow_pickle=False)
    conv1_shape = (7, 7, 3, 4)  # HWIO of the tiny trunk's stem
    candidates = [
        data[k] for k in data.files
        if k.startswith("leaf_") and data[k].shape == conv1_shape
    ]
    assert candidates, "no conv1-shaped leaf in the checkpoint"
    assert any(np.abs(c - 0.77).max() < 0.1 for c in candidates), \
        "marker weights did not reach the train state through --pretrained-trunk"


def test_extract_and_rank_cli(tmp_path):
    """The deployment surface: train -> extract gallery index + queries ->
    rank, all through the extract CLI."""
    from grl_tpu.cli.extract import build_parser as extract_parser
    from grl_tpu.cli.extract import main as extract_main

    logs = tmp_path / "srv"
    run_train(tmp_path, logs, ["--epochs", "1"])

    common = ["-d", "synthetic", "--tiny", "--seq_len", "2", "-j", "2",
              "--logs-dir", str(logs)]
    for split in ("query", "gallery"):
        out = str(tmp_path / f"{split}.npz")
        args = extract_parser().parse_args(["features", *common, "--split", split, "-o", out])
        shape = extract_main(args)
        assert shape[1] > 0
        data = np.load(out)
        assert data["features"].shape == shape
        assert data["features"].shape[0] == data["pids"].shape[0] == data["camids"].shape[0]
        norms = np.linalg.norm(data["features"], axis=1)
        assert np.all(np.isfinite(norms)) and np.all(norms > 0)

    # --rrs (one RRS clip per tracklet) must work too, not just dense
    args = extract_parser().parse_args([
        "features", *common, "--split", "query", "--rrs",
        "-o", str(tmp_path / "query_rrs.npz"),
    ])
    shape = extract_main(args)
    assert shape == np.load(tmp_path / "query_rrs.npz")["features"].shape

    ranks_path = str(tmp_path / "ranks.json")
    args = extract_parser().parse_args([
        "rank", "--query", str(tmp_path / "query.npz"),
        "--gallery", str(tmp_path / "gallery.npz"), "--topk", "3", "-o", ranks_path,
    ])
    results = extract_main(args)
    import json

    on_disk = json.load(open(ranks_path))
    assert len(on_disk) == len(results) == np.load(tmp_path / "query.npz")["features"].shape[0]
    for rec in on_disk:
        assert len(rec["matches"]) == 3
        scores = [m["score"] for m in rec["matches"]]
        assert scores == sorted(scores, reverse=True)  # best (highest cos) first

    # re-ranked path (host numpy on CPU): same surface, ordinal scores
    args = extract_parser().parse_args([
        "rank", "--query", str(tmp_path / "query.npz"),
        "--gallery", str(tmp_path / "gallery.npz"), "--topk", "3",
        "--rerank", "-o", str(tmp_path / "ranks_rr.json"),
    ])
    rr = extract_main(args)
    assert len(rr) == len(results)


def step_losses(logs):
    import json

    out = {}
    with open(logs / "train_log" / "scalars.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if rec["tag"] == "train/total_loss_step":
                out[rec["step"]] = rec["value"]
    return out


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_cli_train_mesh_matches_single_device(tmp_path):
    """The mesh path (auto data-parallel over the virtual devices) must
    reproduce the single-device semantics through the full CLI. The first
    steps must agree to float noise; past that, SGD chaotically amplifies
    the SPMD reduction-order noise (measured: bit-identical at step 0,
    ~1e-4 by step 3, O(1) by step 5 — same behavior as any DP framework),
    so the trajectory check is step-local, plus both runs completing the
    train->eval->checkpoint loop with sane metrics."""
    single = tmp_path / "single"
    mesh = tmp_path / "mesh"
    # batch 8 = 4 pairs -> auto_mesh picks 4 devices
    t1 = run_train(tmp_path, single, ["--epochs", "1", "-b", "8", "--devices", "1"])
    t2 = run_train(tmp_path, mesh, ["--epochs", "1", "-b", "8"])

    log2 = (mesh / "log_train0.txt").read_text()
    assert "data-parallel mesh over 4 devices" in log2

    s1, s2 = step_losses(single), step_losses(mesh)
    assert list(s1) == list(s2) and len(s1) >= 2
    steps = sorted(s1)
    assert abs(s1[steps[0]] - s2[steps[0]]) < 1e-4, "step-0 loss must match"
    assert abs(s1[steps[1]] - s2[steps[1]]) < 1e-2, "step-1 loss must match"
    assert 0.0 <= t1 <= 1.0 and 0.0 <= t2 <= 1.0
    assert (mesh / "checkpoint_best.npz").exists()


def test_export_model_describe_matches_evaluator(tmp_path):
    """The AOT serving artifact must reproduce the Evaluator's descriptor
    math exactly: train a tiny checkpoint, `extract export-model` it
    (weights baked into the jax.export blob), run random clips through
    `extract describe` (which needs no model code), and compare with
    Evaluator.describe_clips on the same checkpoint. Six clips against a
    batch-4 export also covers the final-chunk padding path."""
    from types import SimpleNamespace

    from grl_tpu.cli.extract import build_parser as extract_parser
    from grl_tpu.cli.extract import main as extract_main

    logs = tmp_path / "run"
    run_train(tmp_path, logs, ["--epochs", "1"])
    ckpt = logs / "checkpoint.npz"

    model = tmp_path / "model.npz"
    extract_main(extract_parser().parse_args([
        "export-model", "--checkpoint", str(ckpt), "--tiny",
        "--num-classes", "4", "--batch", "4", "--seq_len", "2",
        "--height", "64", "--width", "32", "-o", str(model),
    ]))

    rng = np.random.RandomState(0)
    clips = rng.randint(0, 256, (6, 2, 64, 32, 3), np.uint8)
    np.savez(tmp_path / "clips.npz", clips=clips, pids=np.arange(6))
    out = tmp_path / "feats.npz"
    extract_main(extract_parser().parse_args([
        "describe", "--model", str(model),
        "--clips", str(tmp_path / "clips.npz"), "-o", str(out),
    ]))
    got = np.load(out)
    assert list(got["pids"]) == list(range(6))  # passthrough

    from grl_tpu.cli.train import build_models, state_to_device
    from grl_tpu.engine.evaluator import Evaluator
    from grl_tpu.engine.optim import SGD
    from grl_tpu.engine.train_step import init_train_state
    from grl_tpu.utils.serialization import load_train_state

    ns = SimpleNamespace(bf16=False, use_flow=False, arch2="siamese")
    cnn, sia, unc = build_models(ns, tiny=True)
    template = init_train_state(
        jax.random.PRNGKey(0), cnn, sia, unc, 4, cnn.num_feat, SGD()
    )
    state, _ = load_train_state(template, str(ckpt))
    state = state_to_device(state)
    ev = Evaluator(cnn, sia, micro_batch=4)
    chunks = ev.describe_clips(state["params"], state["model_state"], clips)
    ref = np.concatenate([np.asarray(d)[:sz] for d, sz in chunks])
    assert got["features"].shape == ref.shape == (6, 3 * cnn.num_feat)
    np.testing.assert_allclose(got["features"], ref, rtol=2e-5, atol=2e-5)


def test_load_artifact_rejects_wrong_platform(tmp_path):
    """An artifact exported for a platform this host's jax backend cannot
    run must fail AT LOAD with a re-export hint (a daemon started against
    it would otherwise serve an opaque per-request export error). The
    check reads the meta before deserializing, so a crafted npz with a
    garbage blob exercises it without paying an export compile. Artifacts
    listing the current backend (or with no platform record — pre-check
    artifacts) must pass through to deserialization."""
    import json

    import pytest

    from grl_tpu.cli.extract import _load_artifact

    def artifact(platforms):
        meta = {"batch": 4, "seq_len": 2, "height": 64, "width": 32,
                "channels": 3, "dim": 384}
        if platforms is not None:
            meta["platforms"] = platforms
        path = tmp_path / f"m_{'-'.join(platforms or ['none'])}.npz"
        np.savez(path, exported=np.frombuffer(b"not an export", np.uint8),
                 meta=json.dumps(meta))
        return path

    with pytest.raises(SystemExit, match=r"--platforms .*tpu"):
        _load_artifact(artifact(["tpu"]))

    # matching / absent platform records reach deserialization (which
    # rejects the garbage blob with anything BUT the platform SystemExit)
    backend = jax.default_backend()
    for platforms in ([backend], ["tpu", backend], None):
        with pytest.raises((Exception, SystemExit)) as exc:
            _load_artifact(artifact(platforms))
        assert not isinstance(exc.value, SystemExit)


def test_extract_serve_loop(tmp_path):
    """The serve daemon must answer ping/describe/rank over the JSON-lines
    protocol from a resident artifact + gallery index, match the one-shot
    describe subcommand exactly, keep serving after malformed requests,
    and stop at shutdown. Queries that ARE gallery clips must rank
    themselves first (self-similarity 3.0: three L2-normed blocks)."""
    import io
    import json

    from grl_tpu.cli.extract import build_parser as extract_parser
    from grl_tpu.cli.extract import main as extract_main
    from grl_tpu.cli.extract import serve

    logs = tmp_path / "run"
    run_train(tmp_path, logs, ["--epochs", "1"])
    model = tmp_path / "model.npz"
    extract_main(extract_parser().parse_args([
        "export-model", "--checkpoint", str(logs / "checkpoint.npz"),
        "--tiny", "--num-classes", "4", "--batch", "4", "--seq_len", "2",
        "--height", "64", "--width", "32", "-o", str(model),
    ]))

    rng = np.random.RandomState(7)
    gclips = rng.randint(0, 256, (5, 2, 64, 32, 3), np.uint8)
    np.savez(tmp_path / "gclips.npz", clips=gclips,
             pids=np.arange(10, 15), camids=np.arange(5) % 2)
    gallery = tmp_path / "gallery.npz"
    extract_main(extract_parser().parse_args([
        "describe", "--model", str(model),
        "--clips", str(tmp_path / "gclips.npz"), "-o", str(gallery),
    ]))

    # queries = gallery clips 1 and 3 -> each must retrieve itself first
    np.savez(tmp_path / "qclips.npz", clips=gclips[[1, 3]])
    reqs = "\n".join([
        json.dumps({"op": "ping"}),
        "this is not json",
        json.dumps({"op": "describe", "clips": str(tmp_path / "qclips.npz"),
                    "out": str(tmp_path / "qfeats.npz")}),
        json.dumps({"op": "rank", "clips": str(tmp_path / "qclips.npz"),
                    "topk": 2}),
        json.dumps({"op": "rank", "clips": str(tmp_path / "qclips.npz"),
                    "topk": 0}),  # per-request validation, not a clamp
        json.dumps({"op": "frobnicate"}),
        json.dumps({"op": "shutdown"}),
        json.dumps({"op": "ping"}),  # after shutdown: must NOT be answered
    ]) + "\n"
    out = io.StringIO()
    n = serve(
        extract_parser().parse_args([
            "serve", "--model", str(model), "--gallery", str(gallery),
            "--topk", "3",
        ]),
        inp=io.StringIO(reqs), out=out,
    )
    resps = [json.loads(line) for line in out.getvalue().splitlines()]
    assert n == len(resps) == 7  # nothing served past shutdown
    ping, bad, desc, rank_r, rank_k0, unknown, bye = resps
    assert all("ms" in r for r in resps)

    assert ping == {"ok": True, "op": "ping", "dim": desc["dim"],
                    "batch": 4, "seq_len": 2, "height": 64, "width": 32,
                    "channels": 3, "platform": "cpu",
                    "gallery": 5, "capacity": 5,
                    "rerank": True, "rerank_queries": 16,
                    "rerank_staged": False, "rerank_devices": 1,
                    "ms": ping["ms"]}
    assert bad["ok"] is False and "JSONDecodeError" in bad["error"]
    assert rank_k0["ok"] is False and "topk must be >= 1" in rank_k0["error"]
    assert unknown["ok"] is False and "frobnicate" in unknown["error"]
    assert bye == {"ok": True, "op": "shutdown", "ms": bye["ms"]}

    # daemon describe == one-shot describe subcommand, bit for bit
    assert desc["ok"] and desc["n"] == 2
    extract_main(extract_parser().parse_args([
        "describe", "--model", str(model),
        "--clips", str(tmp_path / "qclips.npz"),
        "-o", str(tmp_path / "qfeats_oneshot.npz"),
    ]))
    np.testing.assert_array_equal(
        np.load(tmp_path / "qfeats.npz")["features"],
        np.load(tmp_path / "qfeats_oneshot.npz")["features"],
    )

    assert rank_r["ok"] and len(rank_r["results"]) == 2
    qf = np.load(tmp_path / "qfeats.npz")["features"]
    gfts = np.load(gallery)["features"]
    sims = qf @ gfts.T
    for qi, (rec, expect_g) in enumerate(zip(rank_r["results"], (1, 3))):
        assert len(rec["matches"]) == 2  # request topk=2 < compiled 3
        top = rec["matches"][0]
        assert top["gallery"] == expect_g
        assert top["pid"] == 10 + expect_g and top["camid"] == expect_g % 2
        # self-match similarity: two unit blocks + the clip-mean block
        # (mean of per-frame unit vectors, norm <= 1) -> in (2, 3]
        assert 2.0 < top["score"] <= 3.0 + 1e-5
        assert abs(top["score"] - sims[qi, expect_g]) < 1e-4
        scores = [m["score"] for m in rec["matches"]]
        assert scores == sorted(scores, reverse=True)

    # startup validation: a bad --topk or an empty/mis-shaped gallery must
    # fail BEFORE serving, not as an opaque error on the first request
    for argv, pat in [
        (["--gallery", str(gallery), "--topk", "0"], "topk"),
        (["--gallery", str(tmp_path / "empty.npz")], "empty"),
        (["--gallery", str(tmp_path / "badim.npz")], "descriptors"),
    ]:
        np.savez(tmp_path / "empty.npz",
                 features=np.zeros((0, desc["dim"]), np.float32))
        np.savez(tmp_path / "badim.npz",
                 features=np.zeros((3, desc["dim"] + 1), np.float32))
        with pytest.raises(SystemExit, match=pat):
            serve(extract_parser().parse_args(
                ["serve", "--model", str(model)] + argv),
                inp=io.StringIO(""), out=io.StringIO())

    # unlabeled gallery (features only, the describe-passthrough-optional
    # case): still ranks, labels report as -1
    np.savez(tmp_path / "unlabeled.npz", features=gfts)
    out2 = io.StringIO()
    serve(extract_parser().parse_args([
        "serve", "--model", str(model),
        "--gallery", str(tmp_path / "unlabeled.npz"), "--topk", "1",
    ]), inp=io.StringIO(json.dumps(
        {"op": "rank", "clips": str(tmp_path / "qclips.npz")}) + "\n"),
        out=out2)
    r2 = json.loads(out2.getvalue().splitlines()[0])
    assert r2["ok"]
    tops = [rec["matches"][0] for rec in r2["results"]]
    assert [m["gallery"] for m in tops] == [1, 3]
    assert all(m["pid"] == -1 and m["camid"] == -1 for m in tops)


def test_extract_serve_enrollment(tmp_path):
    """Incremental enrollment: a daemon started with --capacity and NO
    gallery begins empty, `add` ops grow the device-resident index (from
    descriptor npz files AND from raw clips, crossing the fixed update
    block width), rank answers reflect every enrollment immediately and
    never surface masked padding rows, capacity overflow is rejected per
    request, and `save` persists exactly the enrolled index."""
    import io
    import json

    from grl_tpu.cli.extract import build_parser as extract_parser
    from grl_tpu.cli.extract import main as extract_main
    from grl_tpu.cli.extract import serve

    logs = tmp_path / "run"
    run_train(tmp_path, logs, ["--epochs", "1"])
    model = tmp_path / "model.npz"
    extract_main(extract_parser().parse_args([
        "export-model", "--checkpoint", str(logs / "checkpoint.npz"),
        "--tiny", "--num-classes", "4", "--batch", "4", "--seq_len", "2",
        "--height", "64", "--width", "32", "-o", str(model),
    ]))
    meta = json.loads(str(np.load(model)["meta"]))
    dim = meta["dim"]

    rng = np.random.RandomState(3)
    clip = rng.randint(0, 256, (1, 2, 64, 32, 3), np.uint8)
    np.savez(tmp_path / "newclip.npz", clips=clip,
             pids=np.array([777]), camids=np.array([2]))
    extract_main(extract_parser().parse_args([
        "describe", "--model", str(model),
        "--clips", str(tmp_path / "newclip.npz"),
        "-o", str(tmp_path / "clipfeat.npz"),
    ]))
    qf0 = np.load(tmp_path / "clipfeat.npz")["features"][0]
    # 299 synthetic descriptors (crossing the 256-row ADD_BLOCK boundary)
    # with STRICTLY NEGATIVE similarity to the query: -qf plus noise small
    # against ||qf||^2 ~ 2-3. If the valid-count mask failed, the
    # zero-padding rows (sim exactly 0) would outrank every one of them.
    base = (-qf0[None, :] + 1e-3 * rng.randn(299, dim)).astype(np.float32)
    np.savez(tmp_path / "batch1.npz", features=base,
             pids=np.arange(299), camids=np.arange(299) % 6)
    np.savez(tmp_path / "overflow.npz",
             features=np.zeros((1, dim), np.float32))

    reqs = "\n".join(json.dumps(r) for r in [
        {"op": "ping"},
        {"op": "rank", "clips": str(tmp_path / "newclip.npz")},  # empty
        {"op": "add", "features": str(tmp_path / "batch1.npz")},
        {"op": "add"},                                    # no payload
        {"op": "add", "clips": str(tmp_path / "newclip.npz")},
        {"op": "rank", "clips": str(tmp_path / "newclip.npz"), "topk": 5},
        {"op": "add", "features": str(tmp_path / "overflow.npz")},
        {"op": "save", "out": str(tmp_path / "index.npz")},
        {"op": "shutdown"},
    ]) + "\n"
    out = io.StringIO()
    serve(extract_parser().parse_args([
        "serve", "--model", str(model), "--capacity", "300", "--topk", "5",
    ]), inp=io.StringIO(reqs), out=out)
    (ping, empty, add1, addbad, add2, rank_r, overflow, save_r,
     bye) = [json.loads(l) for l in out.getvalue().splitlines()]

    assert ping["ok"] and ping["gallery"] == 0 and ping["capacity"] == 300
    assert empty["ok"] is False and "empty" in empty["error"]
    assert add1["ok"] and add1["added"] == 299 and add1["gallery"] == 299
    assert addbad["ok"] is False and "npz path" in addbad["error"]
    assert add2["ok"] and add2["gallery"] == 300
    assert overflow["ok"] is False and "capacity" in overflow["error"]
    assert save_r["ok"] and save_r["n"] == 300 and bye["ok"]

    # the saved index must be exactly what was enrolled: the synthetic
    # rows bit-for-bit, the clip row equal to the one-shot describe
    saved = np.load(tmp_path / "index.npz")
    np.testing.assert_array_equal(saved["features"][:299], base)
    np.testing.assert_array_equal(
        saved["features"][299:], np.load(tmp_path / "clipfeat.npz")["features"])
    assert saved["pids"][299] == 777 and saved["camids"][299] == 2

    # the rank answer must match a host oracle over the saved index —
    # the top-1 is the just-enrolled clip itself, every other hit is a
    # negative-sim synthetic row, and no masked padding row (index >=
    # 300, whose sim 0 beats every negative row) leaks through
    matches = rank_r["results"][0]["matches"]
    assert len(matches) == 5
    assert matches[0]["gallery"] == 299 and matches[0]["pid"] == 777
    assert 2.0 < matches[0]["score"] <= 3.0 + 1e-5
    assert all(m["gallery"] < 300 for m in matches)
    assert all(m["score"] < 0 for m in matches[1:])
    qf = np.load(tmp_path / "clipfeat.npz")["features"].astype(np.float32)
    sim = (qf @ saved["features"].T)[0]
    np.testing.assert_array_equal(
        [m["gallery"] for m in matches], np.argsort(-sim)[:5])


def test_extract_serve_listen_socket(tmp_path):
    """--listen unix:PATH serves the same JSON-lines protocol over a
    socket: multiple sequential clients connect, get answers, and
    disconnect (EOF returns the daemon to accept()); a shutdown op from
    any client stops the daemon; the socket file is cleaned up."""
    import json
    import socket
    import threading

    from grl_tpu.cli.extract import build_parser as extract_parser
    from grl_tpu.cli.extract import main as extract_main
    from grl_tpu.cli.extract import serve

    logs = tmp_path / "run"
    run_train(tmp_path, logs, ["--epochs", "1"])
    model = tmp_path / "model.npz"
    extract_main(extract_parser().parse_args([
        "export-model", "--checkpoint", str(logs / "checkpoint.npz"),
        "--tiny", "--num-classes", "4", "--batch", "4", "--seq_len", "2",
        "--height", "64", "--width", "32", "-o", str(model),
    ]))
    rng = np.random.RandomState(5)
    np.savez(tmp_path / "g.npz",
             clips=rng.randint(0, 256, (3, 2, 64, 32, 3), np.uint8))
    extract_main(extract_parser().parse_args([
        "describe", "--model", str(model), "--clips", str(tmp_path / "g.npz"),
        "-o", str(tmp_path / "gal.npz"),
    ]))

    sock_path = str(tmp_path / "serve.sock")
    result = {}

    def run_daemon():
        result["n"] = serve(extract_parser().parse_args([
            "serve", "--model", str(model),
            "--gallery", str(tmp_path / "gal.npz"),
            "--listen", f"unix:{sock_path}",
        ]))

    t = threading.Thread(target=run_daemon)
    t.start()
    deadline = time.time() + 120
    while not osp.exists(sock_path):
        assert time.time() < deadline and t.is_alive()
        time.sleep(0.05)

    def client(reqs):
        with socket.socket(socket.AF_UNIX) as c:
            c.connect(sock_path)
            fin = c.makefile("r", encoding="utf-8")
            fout = c.makefile("w", encoding="utf-8")
            resps = []
            for r in reqs:
                fout.write(json.dumps(r) + "\n")
                fout.flush()
                resps.append(json.loads(fin.readline()))
            return resps

    # client 1 pings, then goes idle HOLDING its connection — with one
    # thread per connection it must not block client 2's requests
    c1 = socket.socket(socket.AF_UNIX)
    c1.connect(sock_path)
    f1in = c1.makefile("r", encoding="utf-8")
    f1out = c1.makefile("w", encoding="utf-8")
    f1out.write(json.dumps({"op": "ping"}) + "\n")
    f1out.flush()
    ping = json.loads(f1in.readline())
    assert ping["ok"] and ping["gallery"] == 3

    # client 2 is served while client 1 idles connected
    rank_r, stats_r = client([
        {"op": "rank", "clips": str(tmp_path / "g.npz"), "topk": 2},
        {"op": "stats"},
    ])
    assert rank_r["ok"]
    # gallery clips rank themselves first
    assert [r["matches"][0]["gallery"] for r in rank_r["results"]] == [0, 1, 2]
    assert stats_r["ok"] and stats_r["uptime_s"] >= 0
    assert stats_r["ops"]["ping"]["n"] == 1
    assert stats_r["ops"]["ping"]["errors"] == 0
    assert set(stats_r["ops"]["ping"]) == {"n", "errors", "ms_mean", "ms_max"}
    assert stats_r["ops"]["rank"]["n"] == 1

    # client 3: shutdown stops the daemon; the idle client 1 gets EOF
    (bye,) = client([{"op": "shutdown"}])
    assert bye["ok"]
    assert f1in.readline() == ""  # EOF delivered to the idle reader
    c1.close()
    t.join(timeout=120)
    assert not t.is_alive() and result["n"] == 4
    assert not osp.exists(sock_path)  # cleaned up

    # TCP leg: same protocol over host:port (pre-probed free port — the
    # daemon resolves port 0 itself but only reports it on stderr)
    with socket.socket(socket.AF_INET) as probe:
        probe.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        probe.bind(("127.0.0.1", 0))
        port = probe.getsockname()[1]

    def run_tcp_daemon():
        result["tcp"] = serve(extract_parser().parse_args([
            "serve", "--model", str(model),
            "--listen", f"127.0.0.1:{port}",
        ]))

    t2 = threading.Thread(target=run_tcp_daemon)
    t2.start()
    deadline = time.time() + 120
    resps = None
    while resps is None:
        assert time.time() < deadline and t2.is_alive()
        try:
            with socket.socket(socket.AF_INET) as c:
                c.connect(("127.0.0.1", port))
                fout = c.makefile("w", encoding="utf-8")
                fin = c.makefile("r", encoding="utf-8")
                for r in [{"op": "ping"}, {"op": "shutdown"}]:
                    fout.write(json.dumps(r) + "\n")
                    fout.flush()
                resps = [json.loads(fin.readline()) for _ in range(2)]
        except ConnectionRefusedError:
            time.sleep(0.05)
    assert resps[0]["ok"] and resps[0]["batch"] == 4
    assert resps[1] == {"ok": True, "op": "shutdown", "ms": resps[1]["ms"]}
    t2.join(timeout=120)
    assert not t2.is_alive() and result["tcp"] == 2


def test_extract_serve_sigterm_graceful(tmp_path):
    """A SIGTERM to the serve daemon (socket mode, blocked in accept())
    must shut it down cleanly: exit code 0, the unix socket file
    unlinked, the shutdown logged. This is the process-manager stop path
    (systemd et al deliver TERM) — it has no stdin EOF and never sends a
    polite {"op": "shutdown"}, so without the handler the daemon dies
    mid-accept and leaves the socket file behind."""
    import json
    import os
    import signal
    import socket
    import subprocess

    from grl_tpu.cli.extract import build_parser as extract_parser
    from grl_tpu.cli.extract import main as extract_main

    logs = tmp_path / "run"
    run_train(tmp_path, logs, ["--epochs", "1"])
    model = tmp_path / "model.npz"
    extract_main(extract_parser().parse_args([
        "export-model", "--checkpoint", str(logs / "checkpoint.npz"),
        "--tiny", "--num-classes", "4", "--batch", "4", "--seq_len", "2",
        "--height", "64", "--width", "32", "-o", str(model),
    ]))

    sock_path = str(tmp_path / "serve.sock")
    script = tmp_path / "daemon.py"
    script.write_text(
        "import sys\n"
        "import jax\n"
        # the axon plugin ignores JAX_PLATFORMS; force CPU pre-init
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from grl_tpu.cli.extract import build_parser, serve\n"
        f"serve(build_parser().parse_args(['serve', '--model', {str(model)!r},"
        f" '--listen', 'unix:{sock_path}']))\n"
        "sys.exit(0)\n"
    )
    repo_root = osp.dirname(osp.dirname(osp.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [repo_root, env.get("PYTHONPATH", "")] if p)
    proc = subprocess.Popen([sys.executable, str(script)], env=env,
                            stderr=subprocess.PIPE, text=True)
    try:
        deadline = time.time() + 300
        while not osp.exists(sock_path):
            assert time.time() < deadline and proc.poll() is None
            time.sleep(0.05)
        # one served request proves the daemon is live before the signal
        with socket.socket(socket.AF_UNIX) as c:
            c.connect(sock_path)
            c.sendall(b'{"op": "ping"}\n')
            assert json.loads(c.makefile("r").readline())["ok"]
        proc.send_signal(signal.SIGTERM)
        stderr = proc.communicate(timeout=120)[1]
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, stderr
    assert "caught signal 15" in stderr
    assert not osp.exists(sock_path)  # unlinked on the signal path


def test_extract_serve_rerank(tmp_path, monkeypatch):
    """The daemon's {"rerank": true} rank must reproduce the one-shot
    `rank --rerank` math (k-reciprocal re-ranking) against the grown
    index through the compile-once masked builders — BOTH routes: the
    one-jit padded builder at default scale and the staged memory-lean
    builder past _RERANK_ONEJIT_MAX (threshold shrunk to run it at toy
    n). Scores equal the host re_ranking oracle at the returned indices,
    the order matches the oracle's, and an index below k1+1 total items
    is rejected per request (the padded top-k clamps would diverge from
    the reference below that)."""
    import io
    import json

    from grl_tpu.cli.extract import build_parser as extract_parser
    from grl_tpu.cli.extract import main as extract_main
    from grl_tpu.cli.extract import serve

    logs = tmp_path / "run"
    run_train(tmp_path, logs, ["--epochs", "1"])
    model = tmp_path / "model.npz"
    extract_main(extract_parser().parse_args([
        "export-model", "--checkpoint", str(logs / "checkpoint.npz"),
        "--tiny", "--num-classes", "4", "--batch", "4", "--seq_len", "2",
        "--height", "64", "--width", "32", "-o", str(model),
    ]))
    meta = json.loads(str(np.load(model)["meta"]))

    rng = np.random.RandomState(17)
    qclips = rng.randint(0, 256, (2, 2, 64, 32, 3), np.uint8)
    np.savez(tmp_path / "qclips.npz", clips=qclips)
    np.savez(tmp_path / "qclip1.npz", clips=qclips[:1])
    np.savez(tmp_path / "qclips6.npz",
             clips=rng.randint(0, 256, (6, 2, 64, 32, 3), np.uint8))
    synth = rng.randn(40, meta["dim"]).astype(np.float32)
    synth /= np.linalg.norm(synth, axis=1, keepdims=True)
    np.savez(tmp_path / "few.npz", features=synth[:10])
    np.savez(tmp_path / "rest.npz", features=synth[10:],
             pids=np.arange(10, 40), camids=np.arange(30) % 2)

    reqs = "\n".join(json.dumps(r) for r in [
        {"op": "add", "features": str(tmp_path / "few.npz")},
        {"op": "rank", "clips": str(tmp_path / "qclips.npz"),
         "rerank": True},                       # 10 + 2 < 21: rejected
        {"op": "add", "features": str(tmp_path / "rest.npz")},
        {"op": "rank", "clips": str(tmp_path / "qclip1.npz"),
         "rerank": True},          # 40 + 1 < 42: served WITH a warning
        {"op": "rank", "clips": str(tmp_path / "qclips6.npz"),
         "rerank": True},          # 6 queries > compiled width 4
        {"op": "add", "clips": str(tmp_path / "qclips.npz")},
        {"op": "rank", "clips": str(tmp_path / "qclips.npz"),
         "rerank": True, "topk": 5},
        {"op": "rank", "clips": str(tmp_path / "qclips.npz"), "topk": 5},
        {"op": "save", "out": str(tmp_path / "index.npz")},
        {"op": "shutdown"},
    ]) + "\n"
    out = io.StringIO()
    serve(extract_parser().parse_args([
        "serve", "--model", str(model), "--capacity", "64", "--topk", "5",
        "--rerank-queries", "4", "--warmup",
    ]), inp=io.StringIO(reqs), out=out)
    (_a1, small, _a2, degen, wide, _a3, rr, plain, save_r,
     _bye) = [json.loads(l) for l in out.getvalue().splitlines()]

    assert small["ok"] is False and ">= 21" in small["error"]
    assert degen["ok"] and degen["reranked"] and "degenerate" in degen["warning"]
    assert wide["ok"] is False and "--rerank-queries" in wide["error"]
    assert save_r["ok"] and save_r["n"] == 42
    assert rr["ok"] and rr.get("reranked") is True
    assert "warning" not in rr  # 44 items: out of the degenerate regime
    assert plain["ok"] and "reranked" not in plain

    # host oracle: the reference's re_ranking over the exact distance
    # recipe the one-shot `rank --rerank` uses (negative-cosine q_g,
    # euclidean q_q / g_g) on the saved index + described queries
    from grl_tpu.engine.evaluator import _euclidean, cosine_distance
    from grl_tpu.engine.rerank import re_ranking

    extract_main(extract_parser().parse_args([
        "describe", "--model", str(model),
        "--clips", str(tmp_path / "qclips.npz"),
        "-o", str(tmp_path / "qf.npz"),
    ]))
    qf = np.load(tmp_path / "qf.npz")["features"].astype(np.float32)
    gf = np.load(tmp_path / "index.npz")["features"].astype(np.float32)
    dist = re_ranking(
        np.asarray(cosine_distance(qf, gf)),
        np.asarray(_euclidean(qf, qf)),
        np.asarray(_euclidean(gf, gf)),
    )
    for qi, rec in enumerate(rr["results"]):
        got = [m["gallery"] for m in rec["matches"]]
        scores = np.array([m["score"] for m in rec["matches"]])
        assert len(got) == 5
        np.testing.assert_array_equal(got, np.argsort(dist[qi])[:5])
        np.testing.assert_allclose(scores, -dist[qi][got],
                                   rtol=1e-4, atol=1e-5)
        # plain cosine ranking puts the enrolled query clip (40 + qi)
        # first; the re-ranked order is whatever the reference math says
        # (on random synthetic neighborhoods it may legitimately demote
        # the self-match), which the oracle equality above pins
        assert plain["results"][qi]["matches"][0]["gallery"] == 40 + qi
    # rerank and plain scores live on different scales by design
    assert rr["results"][0]["matches"][0]["score"] != pytest.approx(
        plain["results"][0]["matches"][0]["score"])

    # past the one-jit builder's scale the daemon routes rerank through
    # the staged memory-lean builder (engine/rerank.py) — same capacity-
    # padded convention, same reference math. Shrink the route threshold
    # so the staged path runs at toy n, seed from the saved index, and
    # pin the answers against the SAME host oracle (incl. --warmup
    # compiling the staged stages before readiness).
    from grl_tpu.cli import extract as extract_mod
    monkeypatch.setattr(extract_mod, "_RERANK_ONEJIT_MAX", 8)
    out2 = io.StringIO()
    serve(extract_parser().parse_args([
        "serve", "--model", str(model),
        "--gallery", str(tmp_path / "index.npz"),
        "--topk", "5", "--rerank-queries", "4", "--warmup",
    ]), inp=io.StringIO("\n".join(json.dumps(r) for r in [
        {"op": "ping"},
        {"op": "rank", "clips": str(tmp_path / "qclips.npz"),
         "rerank": True, "topk": 5},
    ]) + "\n"), out=out2)
    ping2, rr2 = [json.loads(l) for l in out2.getvalue().splitlines()]
    assert ping2["ok"] and ping2["rerank"] and ping2["rerank_staged"]
    assert ping2["rerank_devices"] == 1
    assert rr2["ok"] and rr2.get("reranked") is True
    for qi, rec in enumerate(rr2["results"]):
        got = [m["gallery"] for m in rec["matches"]]
        np.testing.assert_array_equal(got, np.argsort(dist[qi])[:5])
        np.testing.assert_allclose(
            [m["score"] for m in rec["matches"]], -dist[qi][got],
            rtol=1e-4, atol=1e-5)

    # --devices: the rerank set algebra row-shards over the (virtual)
    # device mesh — mesh forces the staged route at ANY scale (restore
    # the default threshold to prove that), same oracle answers
    monkeypatch.setattr(extract_mod, "_RERANK_ONEJIT_MAX", 16384)
    out3 = io.StringIO()
    serve(extract_parser().parse_args([
        "serve", "--model", str(model),
        "--gallery", str(tmp_path / "index.npz"),
        "--topk", "5", "--rerank-queries", "4",
        "--devices", str(len(jax.devices())),
    ]), inp=io.StringIO("\n".join(json.dumps(r) for r in [
        {"op": "ping"},
        {"op": "rank", "clips": str(tmp_path / "qclips.npz"),
         "rerank": True, "topk": 5},
    ]) + "\n"), out=out3)
    ping3, rr3 = [json.loads(l) for l in out3.getvalue().splitlines()]
    assert ping3["ok"] and ping3["rerank_staged"]
    assert ping3["rerank_devices"] == len(jax.devices())
    assert rr3["ok"] and rr3.get("reranked") is True
    for qi, rec in enumerate(rr3["results"]):
        got = [m["gallery"] for m in rec["matches"]]
        np.testing.assert_array_equal(got, np.argsort(dist[qi])[:5])
        np.testing.assert_allclose(
            [m["score"] for m in rec["matches"]], -dist[qi][got],
            rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_resume_across_mesh_sizes(tmp_path):
    """Elastic resume: a checkpoint written under one device count must
    resume under a DIFFERENT one (pods shrink/grow between preemptions).
    This works because checkpoints are mesh-agnostic host-side full state
    (params/BN/luts/optimizer/epoch) and the loader re-shards per run —
    pinned here so a future device-placed checkpoint format can't silently
    break it. Grow (1 -> 4 devices) and shrink (4 -> 2) both continue the
    epoch counter and train with finite losses."""
    logs = tmp_path / "elastic"
    run_train(tmp_path, logs, ["--epochs", "1", "-b", "8", "--devices", "1"])
    ckpt = logs / "checkpoint.npz"
    assert int(np.load(ckpt)["extra_epoch"]) == 1

    # grow: resume the single-device checkpoint on the 4-device mesh
    run_train(tmp_path, logs, ["--epochs", "2", "-b", "8", "--resume", str(ckpt)])
    log = (logs / "log_train1.txt").read_text()
    assert "data-parallel mesh over 4 devices" in log
    losses = epoch_losses(logs / "log_train1.txt")
    assert list(losses) == [1] and np.isfinite(losses[1])
    assert int(np.load(ckpt)["extra_epoch"]) == 2

    # shrink: resume the mesh checkpoint on 2 devices
    run_train(tmp_path, logs,
              ["--epochs", "3", "-b", "8", "--devices", "2", "--resume", str(ckpt)])
    log = (logs / "log_train2.txt").read_text()
    assert "data-parallel mesh over 2 devices" in log
    losses = epoch_losses(logs / "log_train2.txt")
    assert list(losses) == [2] and np.isfinite(losses[2])
    assert int(np.load(ckpt)["extra_epoch"]) == 3
