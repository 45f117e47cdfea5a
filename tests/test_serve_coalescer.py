"""The serve daemon's cross-request descriptor coalescer.

Deterministic unit coverage of `_DescribeCoalescer` (packing forced by
holding the device lock, so no timing races): FIFO packing up to the
batch width, result routing back to each waiter, sequential-identical
chunking when uncontended, counter accounting, and error propagation to
every waiter of a failed dispatch. The e2e concurrent-clients path is
covered in test_client.py against a real daemon."""

import threading
import time

import numpy as np
import pytest

from grl_tpu.cli.extract import _DescribeCoalescer, _describe_chunked

DIM = 3  # fake descriptor dim == channel count of the 1x1x1 clips


def fake_call(calls):
    """Records each dispatched chunk; 'describes' a (k, 1, 1, 1, 3)
    uint8 clip as its float32 pixel * 2 (clip-identifying, so routing
    mistakes are visible in the outputs)."""

    def call(chunk):
        calls.append(np.array(chunk))
        return chunk.reshape(chunk.shape[0], -1).astype(np.float32) * 2

    return call


def clips_of(values):
    """Distinct recognizable clips: one per value, pixel = value."""
    v = np.asarray(values, np.uint8)
    return np.broadcast_to(
        v[:, None, None, None, None], (len(values), 1, 1, 1, DIM)
    ).copy()


def test_uncontended_matches_sequential_chunking():
    """A lone request dispatches immediately with exactly the
    sequential path's fixed-width padded chunks — bit-identical."""
    calls = []
    call = fake_call(calls)
    co = _DescribeCoalescer(call, batch=4)
    clips = clips_of([1, 2, 3, 4, 5, 6])  # 2 chunks: 4 + 2(padded)

    got = co.describe(clips)
    meta = {"batch": 4}
    want = _describe_chunked(call, meta, clips)
    np.testing.assert_array_equal(got, want)

    # same dispatch geometry as the sequential path: 4-wide, zero-padded
    assert [c.shape[0] for c in calls] == [4, 4, 4, 4]
    np.testing.assert_array_equal(calls[0], calls[2])
    np.testing.assert_array_equal(calls[1], calls[3])
    assert calls[1][2:].max() == 0  # pad rows are zeros
    snap = co.snapshot()
    assert snap == {"dispatches": 2, "clips": 6, "packed": 0}


def test_concurrent_waiters_pack_one_dispatch():
    """Three 1-clip requests queued while the device is busy share ONE
    dispatch, each getting its own rows back."""
    calls = []
    co = _DescribeCoalescer(fake_call(calls), batch=4)
    out = {}

    co._device.acquire()  # the "device is busy" window
    try:
        threads = [
            threading.Thread(
                target=lambda v=v: out.update({v: co.describe(clips_of([v]))})
            )
            for v in (10, 20, 30)
        ]
        for t in threads:
            t.start()
        deadline = time.time() + 10
        while True:
            with co._qlock:
                if len(co._q) == 3:
                    break
            assert time.time() < deadline, "waiters never queued"
            time.sleep(0.005)
    finally:
        co._device.release()
    for t in threads:
        t.join(timeout=30)
    assert not any(t.is_alive() for t in threads)

    assert len(calls) == 1 and calls[0].shape[0] == 4  # one shared dispatch
    for v in (10, 20, 30):
        np.testing.assert_array_equal(out[v], np.full((1, DIM), 2.0 * v))
    assert co.snapshot() == {"dispatches": 1, "clips": 3, "packed": 1}


def test_packing_respects_batch_width():
    """Six queued 1-clip waiters with batch 4 -> a 4-pack then a 2-pack
    (FIFO, no request split mid-dispatch, no overflow)."""
    calls = []
    co = _DescribeCoalescer(fake_call(calls), batch=4)
    out = {}

    co._device.acquire()
    try:
        threads = [
            threading.Thread(
                target=lambda v=v: out.update({v: co.describe(clips_of([v]))})
            )
            for v in (1, 2, 3, 4, 5, 6)
        ]
        for t in threads:
            t.start()
        deadline = time.time() + 10
        while True:
            with co._qlock:
                if len(co._q) == 6:
                    break
            assert time.time() < deadline
            time.sleep(0.005)
    finally:
        co._device.release()
    for t in threads:
        t.join(timeout=30)

    assert len(calls) == 2
    assert sorted(c.shape[0] for c in calls) == [4, 4]  # width-4, padded
    for v in (1, 2, 3, 4, 5, 6):
        np.testing.assert_array_equal(out[v], np.full((1, DIM), 2.0 * v))
    snap = co.snapshot()
    assert snap["dispatches"] == 2 and snap["clips"] == 6
    assert snap["packed"] == 2


def test_dispatch_error_reaches_every_waiter():
    """A failing device call must surface in EVERY waiter of that
    dispatch (not hang them), and the coalescer stays usable after."""

    boom = {"on": True}

    def call(chunk):
        if boom["on"]:
            raise RuntimeError("device fell over")
        return chunk.reshape(chunk.shape[0], -1).astype(np.float32)

    co = _DescribeCoalescer(call, batch=4)
    errs = []

    co._device.acquire()
    try:
        threads = [
            threading.Thread(
                target=lambda v=v: errs.append(
                    pytest.raises(RuntimeError, co.describe, clips_of([v]))
                )
            )
            for v in (7, 8)
        ]
        for t in threads:
            t.start()
        deadline = time.time() + 10
        while True:
            with co._qlock:
                if len(co._q) == 2:
                    break
            assert time.time() < deadline
            time.sleep(0.005)
    finally:
        co._device.release()
    for t in threads:
        t.join(timeout=30)
    assert len(errs) == 2  # both raised

    boom["on"] = False  # next request works
    np.testing.assert_array_equal(
        co.describe(clips_of([9])), np.full((1, DIM), 9.0))
