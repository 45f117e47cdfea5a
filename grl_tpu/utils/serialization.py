"""JSON + checkpoint serialization utilities.

JSON helpers mirror reference utils/serialization.py:9-22. Checkpoints go
further than the reference (torch.save of model state_dicts only,
:25-59): ``save_checkpoint`` captures the *entire* train state — params, BN
running stats, OIM luts, optimizer state, counters — as a flat .npz, so a
resumed run continues bit-for-bit (the reference silently rebuilds losses
and optimizer from scratch; SURVEY.md §5).
"""

from __future__ import annotations

import json
import os
import os.path as osp
import shutil

import numpy as np


def mkdir_if_missing(path):
    os.makedirs(path, exist_ok=True)


def read_json(fpath):
    with open(fpath) as f:
        return json.load(f)


def write_json(obj, fpath):
    mkdir_if_missing(osp.dirname(fpath) or ".")
    with open(fpath, "w") as f:
        json.dump(obj, f, indent=4, separators=(",", ": "))


# -- pytree <-> flat npz ------------------------------------------------


def flatten_tree(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}/{k}" if prefix else str(k)))
    else:
        out[prefix] = np.asarray(tree)
    return out


def unflatten_tree(flat):
    tree = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def _atomic_savez(fpath, payload):
    """np.savez to a temp file in the same directory, then os.replace.

    Checkpoint writes overlap live training (AsyncCheckpointer) and the
    SIGTERM grace window; a kill landing mid-write must leave the previous
    checkpoint intact, not a truncated file.
    """
    mkdir_if_missing(osp.dirname(fpath) or ".")
    if not fpath.endswith(".npz"):
        fpath = fpath + ".npz"  # np.savez appends it; mirror for the rename
    tmp = fpath + f".tmp{os.getpid()}"
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, fpath)
    except BaseException:
        try:
            os.remove(tmp)
        except OSError:
            pass
        raise
    return fpath


def _copy_best(fpath, best_name):
    best = osp.join(osp.dirname(fpath), best_name)
    tmp = best + f".tmp{os.getpid()}"
    shutil.copy(fpath, tmp)
    os.replace(tmp, best)


def save_checkpoint(state, fpath, is_best=False, best_name=None):
    """Save a (nested-dict) state pytree plus scalars to ``fpath`` (.npz)."""
    fpath = _atomic_savez(fpath, flatten_tree(state))
    if is_best and best_name:
        _copy_best(fpath, best_name)


def load_checkpoint(fpath):
    if not osp.isfile(fpath):
        raise ValueError(f"=> No checkpoint found at '{fpath}'")
    with np.load(fpath, allow_pickle=False) as data:
        return unflatten_tree({k: data[k] for k in data.files})


# -- arbitrary-pytree checkpoints (train state incl. optax tuples) ------


def save_train_state(train_state, extras, fpath, is_best=False, best_name=None):
    """Checkpoint an arbitrary pytree (params / BN stats / OIM luts /
    optimizer NamedTuples / counters) + scalar ``extras`` to one .npz."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(train_state)
    payload = {f"leaf_{i:05d}": np.asarray(l) for i, l in enumerate(leaves)}
    payload["treedef"] = np.asarray(str(treedef))
    for k, v in extras.items():
        payload[f"extra_{k}"] = np.asarray(v)
    fpath = _atomic_savez(fpath, payload)
    if is_best and best_name:
        _copy_best(fpath, best_name)


def _concat_flat(leaves):
    """One jitted program concatenating same-dtype leaves into a flat
    vector. jax.jit caches by (structure, shapes, dtypes), so per save
    this is ONE device dispatch per dtype group — not one per leaf."""
    import jax.numpy as jnp

    return jnp.concatenate([l.reshape(-1) for l in leaves])


class AsyncCheckpointer:
    """Checkpoint writer that does not block the train loop.

    The synchronous ``save_train_state`` pulls every leaf device->host
    before writing — seconds of dead time per save serialized into the
    epoch loop. ``save`` instead snapshots the state on device and hands
    the device->host pull + npz write to a single worker thread.

    The snapshot is PACKED: all leaves of one dtype concatenate into one
    flat device buffer (a single jitted dispatch per dtype — the GRL train
    state is ~820 leaves, and on high-latency links ~820 per-leaf
    dispatches/pulls cost far more than the bytes; measured on the axon
    tunnel: 15 s of per-leaf copy dispatches vs ~0 s packed, and the
    worker's pull runs at full bandwidth on one big array). The packed
    buffers are new allocations, which also makes the snapshot safe
    against buffer donation: the jitted train step consumes its
    ``train_state`` argument (engine/train_step.py donate_argnums), so by
    the time the worker pulls, the *live* state buffers may already be
    invalidated.

    One save is in flight at a time; a second ``save`` joins the previous
    one first, so files appear in submission order. Call ``wait()`` before
    reading a checkpoint back or exiting the process; worker exceptions
    re-raise there.
    """

    def __init__(self):
        self._pending = None
        self._executor = None
        self._jit_concat = None

    def save(self, train_state, extras, fpath, is_best=False, best_name=None):
        import concurrent.futures

        import jax

        self.wait()
        if self._jit_concat is None:
            self._jit_concat = jax.jit(_concat_flat)

        leaves, treedef = jax.tree_util.tree_flatten(train_state)
        groups = {}  # dtype str -> list of leaf indices
        for i, leaf in enumerate(leaves):
            if isinstance(leaf, jax.Array):
                groups.setdefault(str(leaf.dtype), []).append(i)
        shapes = {i: leaves[i].shape for ixs in groups.values() for i in ixs}
        packed = {
            dt: self._jit_concat([leaves[i] for i in ixs]) for dt, ixs in groups.items()
        }

        def write():
            out = list(leaves)  # host leaves (python/np scalars) pass through
            for dt, ixs in groups.items():
                buf = np.asarray(packed[dt])  # ONE pull per dtype group
                offset = 0
                for i in ixs:
                    size = int(np.prod(shapes[i], dtype=np.int64))
                    out[i] = buf[offset : offset + size].reshape(shapes[i])
                    offset += size
            save_train_state(
                jax.tree_util.tree_unflatten(treedef, out), extras, fpath,
                is_best, best_name,
            )

        if self._executor is None:
            self._executor = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="ckpt-writer"
            )
        self._pending = self._executor.submit(write)

    def wait(self):
        if self._pending is not None:
            fut, self._pending = self._pending, None
            fut.result()


def load_train_state(template, fpath):
    """Restore a checkpoint into the structure of ``template``.

    Returns (train_state, extras). Structure mismatches fail loudly.
    """
    import jax

    if not osp.isfile(fpath):
        raise ValueError(f"=> No checkpoint found at '{fpath}'")
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    with np.load(fpath, allow_pickle=False) as data:
        leaf_keys = sorted(k for k in data.files if k.startswith("leaf_"))
        if len(leaf_keys) != len(t_leaves):
            raise ValueError(
                f"checkpoint has {len(leaf_keys)} leaves, template expects {len(t_leaves)}"
            )
        leaves = []
        for k, t in zip(leaf_keys, t_leaves):
            v = data[k]
            if np.shape(t) != v.shape:
                raise ValueError(f"shape mismatch at {k}: {np.shape(t)} vs {v.shape}")
            # a dtype-mismatched restore would silently recompile the
            # train step under different dtypes and diverge from the
            # template configuration. Python-scalar template leaves (e.g.
            # lr multipliers) carry no dtype — they become weak-typed
            # anyway and are exempt.
            if hasattr(t, "dtype") and t.dtype != v.dtype:
                raise ValueError(f"dtype mismatch at {k}: {t.dtype} vs {v.dtype}")
            leaves.append(v)
        extras = {
            k[len("extra_"):]: data[k] for k in data.files if k.startswith("extra_")
        }
    return jax.tree_util.tree_unflatten(treedef, leaves), extras
