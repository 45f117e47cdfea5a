"""Worker process for the REAL 2-process jax.distributed tests.

Launched by tests/test_multiprocess.py as ``python multiprocess_worker.py
--process-id I ...``. Each worker initializes jax.distributed against a
localhost coordinator (CPU backend, gloo collectives, 2 virtual devices
per process -> a 4-device global mesh), then exercises the actual
multi-host stack: ``get_data(process_shard=True)`` (identity-sharded
catalog + equal step caps), ``GlobalBatchLoader``
(make_array_from_process_local_data assembly), the jitted train step over
the global mesh, and the Trainer's collective stop.

Modes:
- ``train``: one epoch; records the local batches this process produced
  and (process 0) the final parameters, so the parent can replay the
  assembled global batches single-process and assert parity.
- ``preempt``: epochs until stopped; the parent SIGTERMs ONE process and
  both must stop via Trainer._collective_stop.
"""

import argparse
import json
import os
import os.path as osp
import signal
import sys
import threading

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

DATASET_KW = dict(
    num_train_ids=8, num_test_ids=2, tracklets_per_id=3, height=16, width=8, seed=0
)
SEQ_LEN = 2
LOCAL_BATCH = 4


class RecordingLoader:
    """Pass-through ClipLoader wrapper capturing the numpy batches.

    ``limit`` caps the steps per epoch (equally on every process): the
    parity mode replays the run single-process, and beyond a couple of
    steps fp32 reduction-order differences (cross-process psum vs one
    device) amplify chaotically through the tiny model's batch statistics
    — the same reason test_sharding.py compares after ONE step.
    """

    def __init__(self, loader, limit=None):
        self.loader = loader
        self.dataset = loader.dataset
        self.limit = limit
        self.batches = []

    def __len__(self):
        n = len(self.loader)
        return n if self.limit is None else min(n, self.limit)

    def __iter__(self):
        for i, (clips, pids, camids) in enumerate(self.loader):
            if self.limit is not None and i >= self.limit:
                break
            self.batches.append(
                (np.array(clips), np.array(pids), np.array(camids))
            )
            yield clips, pids, camids


def build(args, limit=None):
    import jax

    from grl_tpu import models
    from grl_tpu.data import get_data
    from grl_tpu.engine.optim import SGD
    from grl_tpu.engine.train_step import init_train_state, make_train_step
    from grl_tpu.parallel import GlobalBatchLoader, data_mesh, replicate

    ds, num_classes, train_loader, _q, _g = get_data(
        "synthetic",
        batch_size=LOCAL_BATCH,
        seq_len=SEQ_LEN,
        workers=1,
        seed=0,
        dataset_kwargs=DATASET_KW,
        process_shard=True,
    )
    rec = RecordingLoader(train_loader, limit=limit)
    mesh = data_mesh(4)
    glob = GlobalBatchLoader(rec, mesh)

    trunk = models.ResNetTrunk(layers=(1, 1, 1, 1), width=4)
    cnn = models.GRLModel(trunk=trunk)
    sia = models.Siamese(input_num=cnn.num_feat, output_num=16)
    unc = models.SiameseVideo(input_num=cnn.num_feat)
    opt = SGD()
    ts = init_train_state(
        jax.random.PRNGKey(0), cnn, sia, unc, num_classes, cnn.num_feat, opt
    )
    ts = replicate(ts, mesh)
    step = make_train_step(cnn, sia, unc, opt, donate=False)

    # AOT-compile the collective train programs BEFORE the post_build
    # barrier. The barrier bounds build()-time skew, but the first
    # trainer step used to COMPILE augment + the psum train step right
    # before executing them — on a contended single core two concurrent
    # cold compiles skew the workers' first executions past gloo's fixed
    # 30 s communicator rendezvous window (GetKeyValue timeout on
    # cpu:gloo/...), killing one worker. lower().compile() builds the
    # programs without executing any collective (and seeds the persistent
    # XLA cache, so the real first step is a fast cache load on both
    # workers), leaving the barrier as the only pre-execution skew. The
    # batch specs come from a throwaway loader through the REAL global
    # assembly path so shapes/dtypes/shardings match exactly.
    from grl_tpu.data.transforms import augment

    _d, _n, warm_loader, _wq, _wg = get_data(
        "synthetic", batch_size=LOCAL_BATCH, seq_len=SEQ_LEN, workers=1,
        seed=0, dataset_kwargs=DATASET_KW, process_shard=True,
    )
    wclips, wpids, _wc = next(iter(GlobalBatchLoader(warm_loader, mesh)))
    wx = augment(jax.random.split(jax.random.PRNGKey(0))[1], wclips,
                 train=True)  # executes, but is collective-free
    step.lower(ts, wx, wpids, 1e-3).compile()
    return ds, rec, glob, mesh, ts, step


def mode_train(args):
    import jax
    from jax.experimental import multihost_utils

    from grl_tpu.engine.trainer import Trainer

    ds, rec, glob, mesh, ts, step = build(args, limit=2)
    from grl_tpu.parallel import coordination_barrier

    # lockstep re-entry before the first post-build collective: build()
    # durations skew between workers on a contended core, and the gloo
    # communicator rendezvous inside the next collective has a fixed 30 s
    # window (parallel/multihost.py::coordination_barrier)
    coordination_barrier("post_build", timeout_s=1200)

    # (iii) equal step caps: every process computes the same UNCAPPED
    # epoch length locally (min_shard_size), checked collectively
    lens = multihost_utils.process_allgather(np.int32(len(rec.loader)))
    assert (lens == lens[0]).all(), f"unequal per-process step counts: {lens}"

    class StepLossShim:
        """Minimal ScalarWriter surface capturing per-step losses."""

        def __init__(self):
            self.steps = []

        def add_scalar(self, tag, value, step):
            if tag == "train/total_loss_step":
                self.steps.append(float(value))

        def flush(self):
            pass

    shim = StepLossShim()
    trainer = Trainer(step, scalar_writer=shim, seed=0, mesh=mesh, print_freq=1000)
    ts, stats = trainer.train(0, ts, glob, lr=1e-3)

    out = {}
    for i, (clips, pids, camids) in enumerate(rec.batches):
        out[f"clips_{i}"] = clips
        out[f"pids_{i}"] = pids
    out["num_batches"] = np.int32(len(rec.batches))
    out["epoch_len"] = np.int32(len(rec.loader))
    out["loss"] = np.float64(stats["loss"])
    out["step_losses"] = np.asarray(shim.steps, np.float64)
    np.savez(osp.join(args.out, f"batches_{args.process_id}.npz"), **out)

    if args.process_id == 0:
        leaves = jax.tree.leaves(ts["params"])
        np.savez(
            osp.join(args.out, "final_params.npz"),
            **{f"leaf_{i:04d}": np.asarray(l) for i, l in enumerate(leaves)},
        )
        np.savez(
            osp.join(args.out, "final_luts.npz"),
            corr=np.asarray(ts["luts"]["corr"]),
        )
    print(f"[worker {args.process_id}] train mode done: {len(rec.batches)} steps",
          flush=True)


def mode_eval(args):
    """Multi-host striped evaluation WITH re-ranking: each process
    extracts only its contiguous stripe of the eval catalogs; features
    assemble into globally-sharded arrays and the distance matmul +
    k-reciprocal re-ranking + protocol run SPMD over both processes.
    Compared in-worker against the single-host evaluation of the full
    catalogs (each process can do that locally at this scale), whose
    rerank takes the HOST numpy path — an independent oracle.

    More test ids than the train modes (18 test tracklets): the set
    algebra needs q+gallery comfortably past 2*(k1+1) to be
    non-degenerate at k1=5/k2=3."""
    import jax

    from grl_tpu import models
    from grl_tpu.data import get_data
    from grl_tpu.engine.evaluator import Evaluator
    from grl_tpu.parallel import data_mesh, eval_catalog_meta

    eval_kw = dict(DATASET_KW, num_test_ids=6)
    ds, _n, _t, q_full, g_full = get_data(
        "synthetic", batch_size=LOCAL_BATCH, seq_len=SEQ_LEN, workers=1,
        seed=0, dataset_kwargs=eval_kw,
    )
    _ds2, _n2, _t2, q_s, g_s = get_data(
        "synthetic", batch_size=LOCAL_BATCH, seq_len=SEQ_LEN, workers=1,
        seed=0, dataset_kwargs=eval_kw, eval_stripe=True,
    )
    trunk = models.ResNetTrunk(layers=(1, 1, 1, 1), width=4)
    cnn = models.GRLModel(trunk=trunk)
    sia = models.Siamese(input_num=cnn.num_feat, output_num=16)
    cp, cs = jax.jit(cnn.init)(jax.random.PRNGKey(0))
    sp, ss = jax.jit(sia.init)(jax.random.PRNGKey(1))
    p, s = {"cnn": cp, "siamese": sp}, {"cnn": cs, "siamese": ss}

    mesh = data_mesh(4)
    from grl_tpu.parallel import coordination_barrier

    # lockstep re-entry before the first post-build collective: build()
    # durations skew between workers on a contended core, and the gloo
    # communicator rendezvous inside the next collective has a fixed 30 s
    # window (parallel/multihost.py::coordination_barrier)
    coordination_barrier("post_build", timeout_s=1200)
    multihost = {"query": eval_catalog_meta(ds.query),
                 "gallery": eval_catalog_meta(ds.gallery)}
    rr = dict(rerank=True, rerank_k1=5, rerank_k2=3)
    striped = Evaluator(cnn, sia, micro_batch=8, mesh=mesh, **rr).evaluate(
        p, s, q_s, g_s, multihost=multihost
    )
    # single-host reference: full catalogs, local-devices-only execution,
    # rerank via the host numpy path (mesh=None, CPU backend)
    local_mesh = None
    ref = Evaluator(cnn, sia, micro_batch=8, mesh=local_mesh, **rr).evaluate(
        p, s, q_full, g_full
    )
    import json as _json

    with open(osp.join(args.out, f"eval_{args.process_id}.json"), "w") as f:
        _json.dump({"striped_top1": float(striped), "ref_top1": float(ref)}, f)
    print(f"[worker {args.process_id}] eval mode done: striped={striped} ref={ref}",
          flush=True)


def mode_preempt(args):
    from grl_tpu.engine.trainer import Trainer

    stop = threading.Event()
    saw_signal = {"v": False}

    def handler(signum, _frame):
        saw_signal["v"] = True
        stop.set()

    signal.signal(signal.SIGTERM, handler)

    ds, rec, glob, mesh, ts, step = build(args)
    from grl_tpu.parallel import coordination_barrier

    # lockstep re-entry before the first post-build collective: build()
    # durations skew between workers on a contended core, and the gloo
    # communicator rendezvous inside the next collective has a fixed 30 s
    # window (parallel/multihost.py::coordination_barrier)
    coordination_barrier("post_build", timeout_s=1200)
    trainer = Trainer(step, seed=0, mesh=mesh, print_freq=1000, stop_event=stop)

    max_epochs = 200
    epochs_done = 0
    for epoch in range(max_epochs):
        ts, _ = trainer.train(epoch, ts, glob, lr=1e-3)
        epochs_done += 1
        # tell the parent we're through the compile + at least one epoch
        # (it waits for this before delivering SIGTERM)
        ready = osp.join(args.out, f"ready_{args.process_id}")
        if not osp.exists(ready):
            with open(ready, "w") as f:
                f.write("1")
        # the caller-side gate, exactly as the CLI runs it
        # (cli/train.py: checkpoint-and-exit when stop is set)
        if stop.is_set():
            break
    result = {
        "stopped": stop.is_set(),
        "saw_signal": saw_signal["v"],
        "epochs_done": epochs_done,
    }
    with open(osp.join(args.out, f"preempt_{args.process_id}.json"), "w") as f:
        json.dump(result, f)
    print(f"[worker {args.process_id}] preempt mode done: {result}", flush=True)


def main():
    # die with the spawning pytest: wait_all() kills workers on ITS
    # timeout, but an outer kill of pytest itself (CI runner timeout)
    # used to orphan both workers — two live jax processes holding a
    # gloo mesh and stealing the single core from every subsequent run.
    # Set here (single-threaded, straight after exec) rather than via a
    # Popen preexec_fn, which is fork-unsafe under a threaded parent.
    import ctypes

    PR_SET_PDEATHSIG = 1
    ctypes.CDLL("libc.so.6", use_errno=True).prctl(
        PR_SET_PDEATHSIG, signal.SIGKILL
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--port", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--mode", choices=["train", "preempt", "eval"], required=True)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    # SYNCHRONOUS dispatch, for cross-process communicator determinism:
    # XLA:CPU creates gloo communicator INSTANCES per concurrent in-flight
    # collective program. With async dispatch the trainer's one-step-
    # deferred metrics keep 2 steps in flight, and under CPU contention
    # the two workers drift to DIFFERENT in-flight counts — one requests
    # communicator .../2 while the other never does, deadlocking its
    # 30 s gloo rendezvous ("GetKeyValue() timed out with key:
    # cpu:gloo/0,1,2048,2049/2"; worker 1's log showed contexts /0 and /1
    # fully connected). Sync dispatch runs one program at a time, so both
    # workers enlist in the same communicator sequence. TPU pods are
    # unaffected (their collectives don't rendezvous through gloo).
    jax.config.update("jax_cpu_enable_async_dispatch", False)
    from grl_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()  # share compiles across the 2x2 worker runs
    # ALWAYS the PRODUCTION init contract: coordinator + process identity
    # from env vars through the library's own entry — the path a real pod
    # launcher takes, carrying the gloo sync-dispatch hardening and the
    # early collective establishment (the gloo TCP mesh must build while
    # the workers are in rendezvous lockstep; multihost.py)
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{args.port}"
    os.environ["JAX_NUM_PROCESSES"] = str(args.num_processes)
    os.environ["JAX_PROCESS_ID"] = str(args.process_id)
    from grl_tpu.parallel import maybe_initialize_distributed

    maybe_initialize_distributed()
    assert jax.process_count() == args.num_processes
    assert jax.device_count() == 2 * args.num_processes

    if args.mode == "train":
        mode_train(args)
    elif args.mode == "eval":
        mode_eval(args)
    else:
        mode_preempt(args)


if __name__ == "__main__":
    main()
