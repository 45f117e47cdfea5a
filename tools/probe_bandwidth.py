"""Probe host->device and device->host bandwidth + per-dispatch latency.

The axon tunnel's bandwidth varies wildly between sessions (measured
12-97 MB/s on different hours of the same day) and its per-dispatch RTT
is ~ms, both of which shape every wall-clock number taken through it.
Run this first and annotate any measurement session with its output
(docs/PERFORMANCE.md numbers assume the recorded conditions).
"""

import sys
import time

import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    # warm the channel (first transfer pays init)
    t0 = time.perf_counter()
    float(jnp.sum(jnp.asarray(np.zeros(1024, np.float32))))
    print(f"channel init: {time.perf_counter() - t0:.1f}s", flush=True)

    mb = 16
    host = np.random.RandomState(0).randint(0, 255, (mb << 20,), np.uint8)
    t0 = time.perf_counter()
    darr = jnp.asarray(host)
    float(jnp.sum(darr[:: 1 << 20].astype(jnp.float32)))  # true sync
    up = time.perf_counter() - t0
    print(f"host->device: {mb / up:.1f} MB/s ({mb} MB in {up:.2f}s)", flush=True)

    t0 = time.perf_counter()
    back = np.asarray(darr)
    down = time.perf_counter() - t0
    assert back[0] == host[0]
    print(f"device->host: {mb / down:.1f} MB/s ({mb} MB in {down:.2f}s)", flush=True)

    # per-dispatch latency: tiny op round trips
    x = jnp.zeros((8, 8), jnp.float32)
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        x = x + 1.0
    float(jnp.sum(x))
    rtt = (time.perf_counter() - t0) / n
    print(f"per-dispatch: {rtt * 1e3:.1f} ms ({n} chained tiny ops)")


if __name__ == "__main__":
    main()
