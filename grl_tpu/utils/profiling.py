"""Tracing / profiling hooks.

The reference's only observability is wall-clock AverageMeters printed
every 100 steps (reid/train/trainer.py:28-39,68-78). Here that surface is
kept (Trainer meters) and extended with the TPU-native tools:

- ``trace(logdir)``: context manager around ``jax.profiler`` producing a
  TensorBoard-loadable device trace of whatever runs inside;
- ``ThroughputMeter``: clips/sec & steps/sec counters (the BASELINE.json
  headline metric) with host-sync-aware timing — on the axon-tunneled TPU
  ``block_until_ready`` returns early, so callers must time around a host
  materialization (see bench.py).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir):
    """Capture a jax.profiler device trace into ``logdir``."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Aggregate items/sec over update() calls."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.items = 0
        self.steps = 0
        self.elapsed = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def update(self, n_items):
        if self._t0 is None:
            raise RuntimeError("call start() before update()")
        self.elapsed += time.perf_counter() - self._t0
        self.items += n_items
        self.steps += 1
        self._t0 = time.perf_counter()

    @property
    def items_per_sec(self):
        return self.items / self.elapsed if self.elapsed > 0 else 0.0

    @property
    def steps_per_sec(self):
        return self.steps / self.elapsed if self.elapsed > 0 else 0.0


def descriptor_compiler_options():
    """Compiler options for the eval/serving descriptor program.

    Measured on v5e (tools/sweep_compiler_options.py, alternating trials):
    a 32 MiB scoped-VMEM limit lifts descriptor throughput ~1.5% (median
    1114 vs 1096 clips/s at micro-batch 96); 64/96 MiB regress, and the
    TRAIN step is slightly slower under 32 MiB
    (tools/sweep_train_compiler_options.py), so only the descriptor jit
    uses this. ``xla_tpu_*`` options fail non-TPU compiles — None there.
    """
    import jax

    if jax.default_backend() != "tpu":
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": "32768"}


def _machine_tag():
    """Fingerprint of the host CPU feature set (+ jax version).

    XLA:CPU AOT cache entries bake in the compiling host's CPU features
    and the upstream cache key does NOT fully cover them: entries written
    on a different host still load, with "Machine type used for XLA:CPU
    compilation doesn't match ... could lead to execution errors such as
    SIGILL" warnings, multi-second degraded loads, and — observed after a
    VM migration — the two workers of a 2-process gloo run resolving
    DIFFERENT communicator sequences and deadlocking their 30 s
    rendezvous. Keying the cache directory by this tag keeps warm caches
    warm on one machine and makes them cleanly cold after a migration."""
    import hashlib
    import platform

    import jax

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):  # x86 / arm
                    flags = line.strip()
                    break
    except OSError:
        pass
    key = f"{platform.machine()}|{flags}|{jax.__version__}"
    return hashlib.sha1(key.encode()).hexdigest()[:10]


def enable_compilation_cache(path=None):
    """Persist XLA compilations across processes (first full-model compile
    on the tunneled TPU costs minutes; cached reloads cost seconds).

    The directory is partitioned by a host-CPU fingerprint — see
    :func:`_machine_tag` for why stale-machine entries are poison."""
    import os

    import jax

    path = path or os.path.join(
        os.path.expanduser("~"), ".cache", "grl_tpu_xla", _machine_tag()
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
