"""grl_tpu.client.ServeClient against a REAL serve daemon.

The client is the numpy-in/numpy-out wrapper over the daemon's
JSON-lines protocol; these tests pin its whole surface — inline npz
encoding both directions (no shared filesystem needed), path
passthrough, label ride-along, error mapping to ServeError, and the
spawn-mode subprocess lifecycle — against the same daemon the protocol
tests in test_cli.py cover wire-level."""

import os.path as osp
import subprocess
import sys
import threading
import time
from contextlib import contextmanager

import numpy as np
import pytest

from test_cli import run_train

from grl_tpu.client import ServeClient, ServeError


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    """One tiny trained + exported model for every client test."""
    from grl_tpu.cli.extract import build_parser as extract_parser
    from grl_tpu.cli.extract import main as extract_main

    tmp = tmp_path_factory.mktemp("client_artifact")
    run_train(tmp, tmp / "run", ["--epochs", "1"])
    model = tmp / "model.npz"
    extract_main(extract_parser().parse_args([
        "export-model", "--checkpoint", str(tmp / "run" / "checkpoint.npz"),
        "--tiny", "--num-classes", "4", "--batch", "4", "--seq_len", "2",
        "--height", "64", "--width", "32", "-o", str(model),
    ]))
    rng = np.random.RandomState(11)
    gclips = rng.randint(0, 256, (5, 2, 64, 32, 3), np.uint8)
    np.savez(tmp / "gclips.npz", clips=gclips,
             pids=np.arange(10, 15), camids=np.arange(5) % 2)
    extract_main(extract_parser().parse_args([
        "describe", "--model", str(model),
        "--clips", str(tmp / "gclips.npz"), "-o", str(tmp / "gallery.npz"),
    ]))
    return {"dir": tmp, "model": model, "gclips": gclips,
            "gallery": tmp / "gallery.npz"}


@contextmanager
def _daemon_over_unix(artifact, tmp_path, extra=()):
    """In-process serve thread on a unix socket; yields (path, thread).

    The thread is daemonic AND shut down on exit even when the test body
    raises — a live accept loop would otherwise hang the interpreter at
    pytest exit with the failure already printed (observed: "1 failed in
    15s" then a forever-blocked process)."""
    from grl_tpu.cli.extract import build_parser as extract_parser
    from grl_tpu.cli.extract import serve

    sock = str(tmp_path / "serve.sock")
    args = extract_parser().parse_args([
        "serve", "--model", str(artifact["model"]),
        "--gallery", str(artifact["gallery"]), "--capacity", "8",
        "--topk", "8", "--listen", f"unix:{sock}", *extra,
    ])
    t = threading.Thread(target=serve, args=(args,), daemon=True)
    t.start()
    try:
        deadline = time.time() + 120
        while not osp.exists(sock):
            assert time.time() < deadline and t.is_alive()
            time.sleep(0.05)
        yield sock, t
    finally:
        if t.is_alive():
            try:
                ServeClient.connect(f"unix:{sock}", timeout=120).shutdown()
            except (OSError, ServeError):
                pass  # already stopping (e.g. the test shut it down)
        t.join(timeout=120)


def test_client_socket_roundtrip(artifact, tmp_path):
    """The full client surface over a real unix socket, arrays inline
    both ways — the remote-client deployment shape (no shared
    filesystem assumed except where a path is explicitly passed)."""
    gclips = artifact["gclips"]
    oracle = np.load(artifact["gallery"])["features"]

    with _daemon_over_unix(artifact, tmp_path) as (sock, t), \
            ServeClient.connect(f"unix:{sock}", timeout=600) as c:
        ping = c.ping()
        assert ping["dim"] == oracle.shape[1] and ping["gallery"] == 5
        assert ping["capacity"] == 8 and ping["batch"] == 4

        # describe: inline clips + label ride-along -> inline features,
        # bit-equal to the one-shot subcommand's output (same program)
        got = c.describe(gclips, pids=np.arange(10, 15),
                         camids=np.arange(5) % 2)
        np.testing.assert_array_equal(got["features"], oracle)
        np.testing.assert_array_equal(got["pids"], np.arange(10, 15))
        np.testing.assert_array_equal(got["camids"], np.arange(5) % 2)

        # describe: daemon-side path in, daemon-side npz out
        out = tmp_path / "feats.npz"
        resp = c.describe(str(artifact["dir"] / "gclips.npz"), out=out)
        assert resp["n"] == 5 and osp.exists(out)
        np.testing.assert_array_equal(np.load(out)["features"], oracle)

        # labels cannot ride with a path (they belong inside that npz)
        with pytest.raises(ValueError, match="in-memory"):
            c.describe(str(artifact["dir"] / "gclips.npz"),
                       pids=np.arange(5))

        # rank: gallery clips retrieve themselves first; the self-match
        # score is the 3-block cosine similarity — two unit blocks + the
        # clip-mean block (norm <= 1), so it lives in (2, 3] and equals
        # the host dot product of the descriptor with itself
        hits = c.rank(gclips[[1, 3]], topk=2)["results"]
        assert [h["matches"][0]["gallery"] for h in hits] == [1, 3]
        assert [h["matches"][0]["pid"] for h in hits] == [11, 13]
        for h, g in zip(hits, (1, 3)):
            top = h["matches"][0]
            assert 2.0 < top["score"] <= 3.0 + 1e-5
            assert top["score"] == pytest.approx(
                float(oracle[g] @ oracle[g]), abs=1e-4)

        # add: enroll descriptors from memory with labels, index grows
        new = np.stack([oracle[0] * 0.9 + oracle[4] * 0.1,
                        oracle[2] * 0.8 + oracle[3] * 0.2])
        resp = c.add(features=new, pids=[77, 78], camids=[1, 0])
        assert resp["added"] == 2 and resp["gallery"] == 7
        hits = c.rank(gclips[[0]], topk=7)["results"][0]["matches"]
        assert {m["gallery"] for m in hits} == set(range(7))
        assert any(m["pid"] == 77 for m in hits)

        # save: fetch the grown index inline; also write daemon-side
        idx = c.save()
        assert idx["features"].shape == (7, oracle.shape[1])
        np.testing.assert_array_equal(idx["pids"],
                                      [10, 11, 12, 13, 14, 77, 78])
        np.testing.assert_array_equal(idx["features"][:5], oracle)
        np.testing.assert_allclose(idx["features"][5:], new, rtol=1e-6)
        resp = c.save(out=tmp_path / "grown.npz")
        assert resp["n"] == 7
        np.testing.assert_array_equal(
            np.load(tmp_path / "grown.npz")["features"], idx["features"])

        # error mapping: daemon-side failures raise ServeError with the
        # op attributed; the connection survives for the next request
        with pytest.raises(ServeError, match="21 total items") as e:
            c.rank(gclips[[0]], rerank=True)  # 1 + 7 < k1 + 1
        assert e.value.op == "rank"
        with pytest.raises(ServeError, match="clips shaped"):
            c.rank(np.zeros((1, 2, 16, 16, 3), np.uint8))
        with pytest.raises(ValueError, match="exactly one"):
            c.add()

        stats = c.stats()
        assert stats["ops"]["rank"]["errors"] == 2
        assert stats["ops"]["describe"]["n"] == 2

        c.shutdown()
        assert c._closed
        with pytest.raises(ServeError, match="closed"):
            c.ping()
    t.join(timeout=120)
    assert not t.is_alive()


def test_client_spawn_lifecycle(artifact, tmp_path):
    """spawn() owns the daemon subprocess over stdin/stdout pipes:
    requests answer, close() shuts it down politely and reaps it (exit
    0). The wrapper script stands in for the `command=` production knob
    (here: pinning the CPU platform — the axon plugin ignores
    JAX_PLATFORMS)."""
    repo_root = osp.dirname(osp.dirname(osp.abspath(__file__)))
    wrapper = tmp_path / "serve_cpu.py"
    wrapper.write_text(
        "import sys\n"
        f"sys.path.insert(0, {repo_root!r})\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from grl_tpu.cli.extract import build_parser, main\n"
        # swallow main()'s API return (a served-request count) like the
        # cli() console-script entry does — it is not an exit code
        "main(build_parser().parse_args(sys.argv[1:]))\n"
    )
    with ServeClient.spawn(
        artifact["model"], gallery=artifact["gallery"], topk=2,
        command=[sys.executable, str(wrapper)], stderr=subprocess.DEVNULL,
    ) as c:
        assert c.ping()["gallery"] == 5
        got = c.describe(artifact["gclips"][:2])
        np.testing.assert_array_equal(
            got["features"], np.load(artifact["gallery"])["features"][:2])
        proc = c._proc
    assert proc.returncode == 0  # polite shutdown + reaped by close()


def test_client_transport_loss(artifact, tmp_path):
    """A daemon that vanishes mid-conversation surfaces as ServeError,
    not a hang or a raw EOF crash."""
    with _daemon_over_unix(artifact, tmp_path) as (sock, t):
        c = ServeClient.connect(f"unix:{sock}", timeout=120)
        assert c.ping()["ok"]
        # another client stops the daemon; this one's next request gets EOF
        ServeClient.connect(f"unix:{sock}", timeout=120).shutdown()
        t.join(timeout=120)
        with pytest.raises(ServeError,
                           match="closed the connection|transport lost"):
            c.ping()
        c.close()


def test_client_rank_by_features(artifact, tmp_path):
    """rank(features=...) skips the CNN pass but must retrieve exactly
    what rank(clips) does — plain AND re-ranked routes — since the
    descriptors it takes are the same program's output. Geometry sized
    past the rerank degeneracy floor (>= 21 total items)."""
    gclips = artifact["gclips"]
    rng = np.random.RandomState(3)
    qclips = rng.randint(0, 256, (3, 2, 64, 32, 3), np.uint8)

    with _daemon_over_unix(
        artifact, tmp_path, extra=("--capacity", "40"),
    ) as (sock, t), ServeClient.connect(f"unix:{sock}", timeout=600) as c:
        dim = c.ping()["dim"]
        # enroll synthetic descriptors up to rerank-viable scale
        extra = rng.standard_normal((20, dim)).astype(np.float32)
        assert c.add(features=extra)["gallery"] == 25

        qf = c.describe(qclips)["features"]

        by_clips = c.rank(qclips, topk=5)["results"]
        by_feats = c.rank(features=qf, topk=5)["results"]
        for a, b in zip(by_clips, by_feats):
            assert [m["gallery"] for m in a["matches"]] == \
                   [m["gallery"] for m in b["matches"]]
            for ma, mb in zip(a["matches"], b["matches"]):
                assert ma["score"] == pytest.approx(mb["score"], abs=1e-4)

        rr_clips = c.rank(qclips, topk=5, rerank=True)
        rr_feats = c.rank(features=qf, topk=5, rerank=True)
        assert rr_clips["reranked"] and rr_feats["reranked"]
        for a, b in zip(rr_clips["results"], rr_feats["results"]):
            assert [m["gallery"] for m in a["matches"]] == \
                   [m["gallery"] for m in b["matches"]]
            for ma, mb in zip(a["matches"], b["matches"]):
                assert ma["score"] == pytest.approx(mb["score"], abs=1e-4)

        # operand validation, client- and daemon-side
        with pytest.raises(ValueError, match="exactly one"):
            c.rank(qclips, features=qf)
        with pytest.raises(ValueError, match="exactly one"):
            c.rank()
        with pytest.raises(ServeError, match="features shaped") as e:
            c.rank(features=qf[:, : dim // 2])
        assert e.value.op == "rank"
        with pytest.raises(ServeError, match="empty"):
            c.rank(features=np.zeros((0, dim), np.float32))
        c.shutdown()


def test_client_concurrent_requests_coalesce(artifact, tmp_path):
    """Concurrent clients' describe/rank requests must return exactly
    the sequential answers (per-request routing through the shared
    dispatches is invisible), and the daemon must account all clips in
    the describe_batching counters. Packing itself is timing-dependent
    on 1 core, so it is asserted deterministically in
    test_serve_coalescer.py; here `packed` merely rides along."""
    import threading

    gclips = artifact["gclips"]

    with _daemon_over_unix(artifact, tmp_path) as (sock, t):
        with ServeClient.connect(f"unix:{sock}", timeout=600) as c0:
            want_desc = [c0.describe(gclips[[i]])["features"]
                         for i in range(5)]
            want_rank = [
                [m["gallery"]
                 for m in c0.rank(gclips[[i]], topk=3)["results"][0]["matches"]]
                for i in range(5)
            ]
            base_clips = c0.stats()["describe_batching"]["clips"]

        got = {}

        def worker(i):
            with ServeClient.connect(f"unix:{sock}", timeout=600) as c:
                feats = c.describe(gclips[[i]])["features"]
                hits = [m["gallery"] for m in
                        c.rank(gclips[[i]], topk=3)["results"][0]["matches"]]
                got[i] = (feats, hits)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(5)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        assert not any(th.is_alive() for th in threads)

        for i in range(5):
            np.testing.assert_array_equal(got[i][0], want_desc[i])
            assert got[i][1] == want_rank[i]

        with ServeClient.connect(f"unix:{sock}", timeout=600) as c0:
            snap = c0.stats()["describe_batching"]
            # 10 more clips described since the sequential pass
            # (5 describe + 5 rank-by-clips), regardless of packing
            assert snap["clips"] == base_clips + 10
            c0.shutdown()


def test_oversize_request_bounded(artifact, tmp_path):
    """A multi-hundred-MB request line neither OOMs nor kills the daemon.

    Inline operands ride base64-npz ON the request line, so before the
    --max-request-mb cap one runaway client could balloon host RSS with a
    single write. This streams a 320 MiB line at the daemon (cap 4 MB):
    the daemon must answer a clean {"ok": false}, keep the SAME connection
    serving, count the event in stats, and — the OOM proof — the process
    peak RSS must not grow by anything near the line size (the drain is
    1 MiB-chunked, never buffered whole; the sender reuses one chunk)."""
    import json
    import resource
    import socket as socklib

    with _daemon_over_unix(artifact, tmp_path,
                           extra=["--max-request-mb", "4"]) as (sock, t):
        conn = socklib.socket(socklib.AF_UNIX)
        conn.settimeout(600)
        conn.connect(sock)
        try:
            fin = conn.makefile("r", encoding="utf-8")
            rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB
            chunk = b"x" * (1 << 20)
            for _ in range(320):
                conn.sendall(chunk)
            conn.sendall(b"\n")
            resp = json.loads(fin.readline())
            assert resp["ok"] is False
            assert "max-request-mb" in resp["error"]

            # same connection still serves
            conn.sendall(b'{"op": "ping"}\n')
            ping = json.loads(fin.readline())
            assert ping["ok"] is True and ping["op"] == "ping"

            conn.sendall(b'{"op": "stats"}\n')
            stats = json.loads(fin.readline())
            assert stats["ops"]["oversize"]["n"] == 1

            rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
            # daemon thread shares this process; 320 MiB flowed through
            # but peak RSS may grow only by buffers, not the line
            assert rss1 - rss0 < 100 * 1024, (rss0, rss1)
        finally:
            conn.close()

        with ServeClient.connect(f"unix:{sock}", timeout=600) as c:
            c.shutdown()
