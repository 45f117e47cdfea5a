"""Device mesh + sharding helpers.

The reference's only parallelism is single-process two-GPU
``nn.DataParallel`` (mars_train.py:52,80): replicate module, scatter the
batch, gather outputs. The TPU-native equivalent is SPMD over a
``jax.sharding.Mesh``: parameters and all training state are replicated,
the batch's *pair* axis is sharded over the ``data`` axis, and XLA inserts
the gradient all-reduce (psum over ICI) where DataParallel would gather.

One jitted train step serves both single-chip and mesh execution — the
sharding of its *inputs* decides the partitioning; no separate distributed
code path exists. Batch-norm statistics under pjit are global-batch
(jnp.mean over a sharded axis is the global mean — XLA adds the
collective), which is strictly better than DataParallel's per-replica
stats; SURVEY.md §7 flags this as an accepted divergence.

The layout contract from the pair sampler holds automatically: with
``batch = 2 * pairs`` and ``pairs % n_devices == 0``, sharding the leading
axis keeps every (anchor, positive) pair on one device.

Gallery-side evaluation shards the cosine distance matmul over gallery
columns — the LS-VID-scale path where the gallery outgrows one chip's HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices=None, axis="data"):
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def auto_mesh(pairs=None, axis="data", limit=None):
    """Default data-parallel mesh for the CLIs (None on a single device).

    This is the TPU-native stand-in for the reference's implicit
    ``nn.DataParallel(model)`` default (mars_train.py:80, test_all.py:81):
    a user on a multi-chip host gets all chips without asking. When
    ``pairs`` (= train batch_size // 2) is given, the mesh uses the largest
    device count that divides it, so shards hold whole (anchor, positive)
    pairs — the layout contract the Siamese pair split relies on.
    ``limit`` caps the device count (CLI ``--devices``; 1 forces
    single-device execution).
    """
    ndev = len(jax.devices())
    if limit:
        ndev = min(ndev, limit)
    if pairs is not None:
        while ndev > 1 and pairs % ndev != 0:
            ndev -= 1
    if ndev < 2:
        return None
    return data_mesh(ndev, axis=axis)


def replicate(tree, mesh):
    """Replicate every leaf of a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(array, mesh, axis="data"):
    """Shard the leading (batch/pair) axis of an array over the mesh."""
    n = mesh.shape[axis]
    if array.shape[0] % n != 0:
        raise ValueError(f"batch {array.shape[0]} not divisible by mesh axis {n}")
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(array, sharding)


def sharded_train_state(train_state, mesh):
    """Replicated train state (params, BN stats, luts, optimizer)."""
    return replicate(train_state, mesh)


@jax.jit
def _neg_cosine(q, g):
    # module-level jit: defined in-function it would retrace per call
    # (CLAUDE.md eval-tail recompile bug class)
    return -jnp.dot(q, g.T, preferred_element_type=jnp.float32)


def sharded_cosine_distance(qf, gf, mesh, axis="data"):
    """-qf @ gfᵀ with gallery columns sharded over the mesh.

    Each device holds a slice of the gallery features and computes its
    column block; the result is left sharded so the host can fetch it (or
    downstream top-k can run shard-local).
    """
    gf_sh = jax.device_put(jnp.asarray(gf), NamedSharding(mesh, P(axis, None)))
    qf_r = jax.device_put(jnp.asarray(qf), NamedSharding(mesh, P()))
    return _neg_cosine(qf_r, gf_sh)
