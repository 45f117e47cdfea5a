"""Mixed-op concurrency stress for the serve daemon's per-op locking.

The daemon serves connections concurrently: clip description rides the
cross-request coalescer while index reads/writes (add/rank/save)
serialize on their own lock. These tests hammer a REAL daemon (unix
socket, one thread per client) with interleaved describe/rank/add/
stats/ping traffic — plus deliberately-bad requests — and assert the
aggregate invariants hold: every enrollment lands exactly once, the
coalescer accounts every described clip, errors stay request-local, and
the index answers deterministically once the storm settles. Guards the
lock split introduced with the coalescer (a deadlock here hangs the
join and fails the deadline). The serving layer has no reference
analogue (flysnowtiger/GRL stops at offline evaluation)."""

import threading

import numpy as np
import pytest

from test_client import _daemon_over_unix, artifact  # noqa: F401

from grl_tpu.client import ServeClient, ServeError

WORKERS = 6


def _worker_script(i, sock, dim, gclips, errs, adds):
    """One client connection's fixed op mix; records its enrolled pids
    in `adds[i]` and any unexpected exception in `errs[i]`."""
    rng = np.random.RandomState(100 + i)
    try:
        with ServeClient.connect(f"unix:{sock}", timeout=600) as c:
            # describes (2 x 1 clip) — pure coalescer traffic
            for _ in range(2):
                f = c.describe(gclips[[i % len(gclips)]])["features"]
                assert f.shape == (1, dim)
            # rank by raw clips (describe + index read)
            r = c.rank(gclips[[i % len(gclips)]], topk=3)["results"]
            assert len(r) == 1 and len(r[0]["matches"]) == 3
            # enroll: 2 feature rows + 1 raw clip (3 index writes' worth)
            pids = np.array([1000 + 10 * i, 1001 + 10 * i], np.int64)
            c.add(features=rng.randn(2, dim).astype(np.float32),
                  pids=pids, camids=np.zeros(2, np.int64))
            c.add(clips=gclips[[i % len(gclips)]],
                  pids=np.array([1002 + 10 * i], np.int64),
                  camids=np.ones(1, np.int64))
            adds[i] = [1000 + 10 * i, 1001 + 10 * i, 1002 + 10 * i]
            # rank by precomputed features (index read, no CNN)
            r = c.rank(features=rng.randn(1, dim).astype(np.float32),
                       topk=2)["results"]
            assert len(r) == 1 and len(r[0]["matches"]) == 2
            # monitoring ops interleave freely
            assert c.ping()["ok"] and c.stats()["ok"]
            if i == 0:
                # bad requests must stay request-local: the connection
                # (and every other client) keeps working afterwards
                with pytest.raises(ServeError):
                    c.request("no_such_op")
                with pytest.raises(ServeError, match="clips"):
                    c.describe(np.zeros((1, 2), np.uint8))
                assert c.ping()["ok"]
    except Exception as e:  # noqa: BLE001 — surfaced by the main thread
        errs[i] = e


def test_mixed_ops_under_concurrency(artifact, tmp_path):  # noqa: F811
    gclips = artifact["gclips"]
    n_seed = len(gclips)

    with _daemon_over_unix(artifact, tmp_path,
                           extra=("--capacity", "64")) as (sock, _t):
        with ServeClient.connect(f"unix:{sock}", timeout=600) as c0:
            dim = c0.ping()["dim"]
            base = c0.stats()["describe_batching"]["clips"]

        errs, adds = [None] * WORKERS, [None] * WORKERS
        threads = [
            threading.Thread(target=_worker_script,
                             args=(i, sock, dim, gclips, errs, adds))
            for i in range(WORKERS)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not any(t.is_alive() for t in threads), "worker deadlocked"
        assert all(e is None for e in errs), errs

        with ServeClient.connect(f"unix:{sock}", timeout=600) as c:
            # every enrollment landed exactly once, none lost or doubled
            idx = c.save()
            assert idx["features"].shape == (n_seed + 3 * WORKERS, dim)
            got_pids = sorted(int(p) for p in idx["pids"][n_seed:])
            want_pids = sorted(p for a in adds for p in a)
            assert got_pids == want_pids
            # the coalescer accounted every described clip: per worker
            # 2 describe + 1 rank-by-clips + 1 add-by-clips (+ nothing
            # from the bad-shape describe, rejected before dispatch)
            snap = c.stats()
            assert (snap["describe_batching"]["clips"]
                    == base + 4 * WORKERS)
            # errors attributed to their ops, not binned as invalid
            assert snap["ops"]["describe"]["errors"] == 1
            # settled index answers deterministically
            q = np.load(artifact["gallery"])["features"][:2]
            r1 = c.rank(features=q, topk=5)["results"]
            r2 = c.rank(features=q, topk=5)["results"]
            assert r1 == r2
            c.shutdown()
