"""Multi-host (DCN-scale) input pipeline: per-process catalog shards
feeding globally-sharded device arrays.

The reference's scaling story stops at single-process DataParallel with
multi-process *decode* workers (mars_train.py:52,80, dataloader.py:74).
The TPU-native pod-scale equivalent (SURVEY.md §2.9 "Grain/tf.data-style
parallel host pipeline feeding device-sharded arrays"):

1. every process (host) takes a disjoint slice of the train catalog —
   sliced by IDENTITY, so the pair sampler can always find a same-pid
   positive inside the local shard and (anchor, positive) pairs never
   straddle hosts;
2. each process runs its own ClipLoader over its shard with
   ``global_batch / process_count`` items per step;
3. ``jax.make_array_from_process_local_data`` assembles the per-host
   batches into one global jax.Array sharded over the mesh's data axis —
   no cross-host data movement; each host's bytes land on its own chips;
4. the jitted train step consumes the global array exactly like a
   single-host sharded batch (XLA inserts the gradient psum over ICI/DCN).

Degenerate single-process behavior is identical to ``shard_batch``; this
is what the virtual-mesh tests pin down. On a real pod, call
``maybe_initialize_distributed()`` before any jax use.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def maybe_initialize_distributed():
    """Call ``jax.distributed.initialize`` when a coordinator is configured.

    Env contract:
    - ``JAX_COORDINATOR_ADDRESS`` set -> initialize, passing
      ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` through when present
      (jax itself reads only the address env; the process count/id would
      otherwise rely on a Slurm/OMPI/k8s/TPU-metadata cluster detector).
    - ``GRL_DISTRIBUTED_AUTODETECT=1`` -> argless initialize, for Cloud
      TPU pods whose launchers set no JAX_* envs (jax's cluster detection
      reads the TPU metadata server). Opt-in because detection probes
      the environment and is wrong to attempt on tunneled dev setups.
    - neither -> no-op (single-process).

    Order matters: ``jax.distributed.initialize`` must run before ANY
    backend-initializing jax call (``jax.devices``, ``jax.process_count``,
    ...) or it raises — so the initialized-check here must not itself
    touch the backends.
    """
    if jax.distributed.is_initialized():
        return
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs = {}
        if os.environ.get("JAX_NUM_PROCESSES"):
            kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        if os.environ.get("JAX_PROCESS_ID"):
            kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
        jax.distributed.initialize(**kwargs)
        _harden_cpu_gloo()
        establish_collectives()
    elif os.environ.get("GRL_DISTRIBUTED_AUTODETECT") == "1":
        jax.distributed.initialize()
        _harden_cpu_gloo()
        establish_collectives()


def _harden_cpu_gloo():
    """Disable async dispatch when the CPU gloo collectives backend is
    configured (before the first collective runs).

    XLA:CPU creates gloo communicator INSTANCES per concurrent in-flight
    collective program. With async dispatch, processes whose pipelines
    drift to different in-flight counts rendezvous on communicator
    instances their peers never create — a 30 s GetKeyValue deadlock,
    reproduced in the 2-process tests ("cpu:gloo/.../2" requested by one
    worker only). Synchronous dispatch keeps every process's communicator
    sequence identical. TPU/GPU backends are untouched (their collectives
    don't rendezvous through gloo)."""
    if jax.config.jax_cpu_collectives_implementation == "gloo":
        jax.config.update("jax_cpu_enable_async_dispatch", False)


def establish_collectives():
    """Run one tiny barrier collective immediately after
    ``jax.distributed.initialize``, while every process is still in
    lockstep from the coordinator rendezvous.

    The comm backend builds its cross-process transport lazily at the
    FIRST collective (the CPU gloo backend opens its TCP full mesh there,
    with a non-configurable connect timeout). Deferring that to the first
    REAL collective — typically reached only after minutes of
    per-process jit compiles whose durations skew between hosts — means
    one process can sit in the transport handshake while a straggler is
    still compiling, and time out (observed as "Gloo context
    initialization failed: Connect timeout" on a contended 1-core CI
    host). Establishing the mesh here, when inter-process skew is
    milliseconds, lets every later collective reuse it. Harmless on TPU
    pods (ICI/DCN), where a post-init barrier is standard practice
    anyway."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("grl_tpu:establish_collectives")


_BARRIER_SEQ = {}


def coordination_barrier(name, timeout_s=600.0):
    """Block until EVERY process reaches this barrier, via the
    coordination service (a host RPC — no device collectives involved).
    No-op single-process.

    Use before entering a collective program after a phase whose duration
    skews between hosts (large jit compiles with heterogeneous cache
    state, catalog builds, ...): the comm backend creates communicators
    lazily INSIDE the first program that uses them, with a short fixed
    rendezvous deadline — the CPU gloo backend's KV-store GetKeyValue
    times out at 30 s, observed in CI as "Gloo context initialization
    failed: DEADLINE_EXCEEDED" whenever one 1-core worker compiled
    ~minutes longer than its peer (establish_collectives cannot cover
    this: later programs make FRESH communicators, e.g.
    ``cpu:gloo/.../2``). This barrier's timeout IS configurable, so the
    straggler wait happens here with slack instead of inside the 30 s
    window.

    Barrier ids are one-shot in the coordination service, so each
    (name)'s uses are sequence-numbered — processes must call with the
    same names in the same order, which barrier semantics require anyway.
    """
    if jax.process_count() <= 1:
        return
    from jax._src import distributed

    seq = _BARRIER_SEQ.get(name, 0)
    _BARRIER_SEQ[name] = seq + 1
    distributed.global_state.client.wait_at_barrier(
        f"grl_tpu:{name}:{seq}", timeout_in_ms=int(timeout_s * 1000)
    )


def shard_catalog(tracklets, process_index=None, process_count=None):
    """Deterministic per-process slice of a train catalog, by identity.

    Identities are greedily balanced by tracklet count (largest first) so
    hosts get near-equal work. Keeping whole pids on one host preserves
    the pair sampler's contract: a same-pid positive for every anchor
    exists locally (reference sampler.py:98-125 semantics, per host).

    pids keep their GLOBAL relabeled values — the OIM lookup tables are
    replicated global state, so loss targets must be global class ids.
    """
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    if process_count == 1:
        return list(tracklets)
    assignment, _ = _assign_pids(tracklets, process_count)
    return [item for item in tracklets if assignment[item[1]] == process_index]


def _assign_pids(tracklets, process_count):
    """Deterministic greedy balance: biggest pid groups first, each to the
    currently lightest process (ties by process id). Returns
    (pid -> process, per-process tracklet loads)."""
    by_pid = {}
    for item in tracklets:
        by_pid.setdefault(item[1], []).append(item)
    loads = [0] * process_count
    assignment = {}
    for pid in sorted(by_pid, key=lambda p: (-len(by_pid[p]), p)):
        target = min(range(process_count), key=lambda i: (loads[i], i))
        assignment[pid] = target
        loads[target] += len(by_pid[pid])
    return assignment, loads


def min_shard_size(tracklets, process_count=None):
    """Smallest per-process tracklet count under :func:`shard_catalog`'s
    assignment. Every host can compute this locally (the greedy balance is
    deterministic over the full catalog), so all hosts can cap their epoch
    to the same step count — unequal per-host step counts would leave the
    faster hosts' last train steps blocked in the gradient psum forever
    (the slower host never dispatches them)."""
    if process_count is None:
        process_count = jax.process_count()
    if process_count == 1:
        return len(tracklets)
    _, loads = _assign_pids(tracklets, process_count)
    return min(loads)


def stripe_catalog(tracklets, process_index=None, process_count=None,
                   local_devices=None):
    """Equal CONTIGUOUS stripes of an eval catalog, one per process.

    Eval extraction has no pair/identity constraint (unlike
    :func:`shard_catalog`), so tracklets split by position: every process
    takes ``k = ceil(n / P)`` consecutive items (k rounded up to a
    multiple of the local device count so each host's feature block
    device-shards evenly), with trailing processes repeating the LAST
    catalog item as padding. Because stripes are contiguous and only
    trailing positions pad, the globally assembled feature array is the
    catalog order with all pad rows at the tail —
    :func:`gather_striped_rows` slices them off.

    Returns (local_tracklets, n_total, k).
    """
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    if local_devices is None:
        local_devices = jax.local_device_count()
    n = len(tracklets)
    if n == 0:
        raise ValueError("cannot stripe an empty catalog")
    k = -(-n // process_count)
    k = -(-k // local_devices) * local_devices
    start = process_index * k
    local = [tracklets[min(i, n - 1)] for i in range(start, start + k)]
    return local, n, k


def eval_catalog_meta(tracklets):
    """(n_total, pids, camids) for one FULL eval catalog — the per-split
    value of ``Evaluator.evaluate``'s ``multihost`` dict. Lives here so
    the CLI and tests share one definition of the tracklet-tuple layout."""
    return (
        len(tracklets),
        np.asarray([t[1] for t in tracklets]),
        np.asarray([t[2] for t in tracklets]),
    )


def gather_striped_rows(local_rows, n_total, mesh, axis="data"):
    """Per-process (k, C) feature blocks -> global (n_total, C) jax.Array
    row-sharded over ``mesh``.

    Each host contributes exactly its stripe (no cross-host data
    movement: every host's rows land on its own devices); the tail pad
    rows from :func:`stripe_catalog` are sliced off. Downstream device
    math (distance matmul, protocol, re-ranking) consumes the sharded
    array directly.
    """
    import jax.numpy as jnp

    local_rows = np.ascontiguousarray(local_rows)
    sharding = NamedSharding(mesh, P(axis, *([None] * (local_rows.ndim - 1))))
    arr = jax.make_array_from_process_local_data(sharding, local_rows)
    return jnp.asarray(arr[:n_total])


def global_batch_loader(loader, mesh, axis="data"):
    """Wrap a per-host ClipLoader into a global-array iterator.

    Yields ``(clips, pids, camids)`` as jax.Arrays whose leading axis is
    the GLOBAL batch (local batch x process_count), sharded over ``axis``.
    Each host contributes exactly its local block; with one process this
    equals ``shard_batch`` on every array.
    """
    clip_sharding = None
    flat_sharding = NamedSharding(mesh, P(axis))
    for clips, pids, camids in loader:
        if clip_sharding is None:
            clip_sharding = NamedSharding(mesh, P(axis, *([None] * (clips.ndim - 1))))
        yield (
            jax.make_array_from_process_local_data(clip_sharding, np.ascontiguousarray(clips)),
            jax.make_array_from_process_local_data(flat_sharding, np.ascontiguousarray(pids)),
            jax.make_array_from_process_local_data(flat_sharding, np.ascontiguousarray(camids)),
        )


class GlobalBatchLoader:
    """len()-preserving wrapper around :func:`global_batch_loader` so the
    Trainer's per-epoch step count stays correct."""

    def __init__(self, loader, mesh, axis="data"):
        self.loader = loader
        self.mesh = mesh
        self.axis = axis
        self.dataset = loader.dataset

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        return global_batch_loader(self.loader, self.mesh, self.axis)
