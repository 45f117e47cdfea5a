"""Descriptor extraction + retrieval — the deployment surface.

The reference couples feature extraction to the benchmark protocol
(test_all.py always runs CMC/mAP). Production re-ID deploys differently:
extract the 6144-d tracklet descriptors ONCE into an index, then serve
retrieval queries against it. Subcommands (see also ``export-model`` /
``describe`` for the AOT serving artifact and ``serve`` for the
persistent daemon over it):

  # build a gallery index (and a query set) from a dataset split
  python -m grl_tpu.cli.extract features -d mars --data-dir ... \\
      --logs-dir log/grl --split gallery -o gallery.npz
  python -m grl_tpu.cli.extract features -d mars --data-dir ... \\
      --logs-dir log/grl --split query -o query.npz

  # rank queries against the index (optionally k-reciprocal re-ranked)
  python -m grl_tpu.cli.extract rank --query query.npz \\
      --gallery gallery.npz --topk 10 -o ranks.json

``features`` reuses the evaluator's packed dense extraction (one compiled
shape, descriptors device-resident until the final save); ``rank`` is a
cosine matmul on device. Unlike the benchmark protocol (attevaluator.py:
143-150), ``rank`` does NOT prepend queries to the gallery and does not
junk-filter — it is retrieval, not CMC.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import os.path as osp

import numpy as np

# serve's rerank routes through the one-jit capacity-padded builder up to
# this many total items (padded queries + capacity + enrollment block);
# past it, the staged memory-lean builder (engine/rerank.py) takes over —
# the one-jit program holds ~6 n^2 fp32 buffers live (26 GB at n=33k vs
# ~11-15.75 GB HBM), the staged one frees each stage's temporaries.
# Module-level so tests can shrink it to drive the staged route at toy n.
_RERANK_ONEJIT_MAX = 16384


def extract_split(args):
    import jax

    from ..data import get_data
    from ..engine.evaluator import Evaluator
    from ..engine.optim import SGD
    from ..engine.train_step import init_train_state
    from ..parallel import auto_mesh
    from ..utils.serialization import load_train_state
    from .train import _synthetic_kwargs, build_models, state_to_device

    if jax.process_count() > 1:
        # extraction is single-host by design: loaders are host-local and
        # -o is one file. On a pod, run one extract per host over disjoint
        # catalogs (or use cli.evaluate, whose mesh path is multi-host).
        raise SystemExit("extract is single-host; multi-host pods should "
                         "run per-host extracts or cli.evaluate")

    dataset, num_classes, _train, query_loader, gallery_loader = get_data(
        args.dataset,
        args.data_dir,
        # train loaders are unused here, but get_data validates the train
        # batch when only_eval=False (--rrs): any even value satisfies it
        2,
        args.seq_len,
        args.seq_srd,
        args.workers,
        only_eval=not args.rrs,
        split_id=args.split_id,
        dataset_kwargs=_synthetic_kwargs(args),
        use_flow=bool(getattr(args, "use_flow", False)),
    )
    loader = {"query": query_loader, "gallery": gallery_loader}[args.split]

    cnn, siamese, siamese_uncorr = build_models(args, tiny=args.tiny)
    template = init_train_state(
        jax.random.PRNGKey(args.seed), cnn, siamese, siamese_uncorr,
        num_classes, num_feat=cnn.num_feat, optimizer=SGD(),
    )
    ckpt = args.checkpoint or osp.join(args.logs_dir, "checkpoint_best.npz")
    state, _ = load_train_state(template, ckpt)
    state = state_to_device(state)
    print(f"loaded {ckpt}")

    mesh = auto_mesh(limit=args.devices or None)
    evaluator = Evaluator(cnn, siamese, only_eval=not args.rrs,
                          micro_batch=args.micro_batch, mesh=mesh)
    feats, pids, camids = evaluator.extract_features(
        state["params"], state["model_state"], loader
    )
    feats = np.asarray(feats, np.float32)
    np.savez(args.out, features=feats, pids=pids, camids=camids)
    print(f"wrote {feats.shape[0]} x {feats.shape[1]} descriptors to {args.out}")
    return feats.shape


def rank(args):
    import jax
    import jax.numpy as jnp

    from ..engine.evaluator import cosine_distance

    q = np.load(args.query)
    g = np.load(args.gallery)
    qf, gf = q["features"], g["features"]
    # device-resident until the rerank decision: pulling the (q, g) matrix
    # to host only to re-upload it for device re-ranking costs two full
    # transfers (~80 s at 2k x 20k on a slow tunnel link)
    distmat_d = cosine_distance(jnp.asarray(qf), jnp.asarray(gf))
    if args.rerank:
        # same backend dispatch as the evaluator: the device path (MXU set
        # algebra + Pallas min-sum) is seconds where host numpy is minutes
        # at MARS scale; the Pallas kernel is TPU-only
        from ..engine.evaluator import _euclidean
        from ..engine.rerank import re_ranking, re_ranking_device, warn_if_degenerate

        warn_if_degenerate(qf.shape[0] + gf.shape[0])

        qq = _euclidean(jnp.asarray(qf), jnp.asarray(qf))
        gg = _euclidean(jnp.asarray(gf), jnp.asarray(gf))
        if jax.default_backend() == "tpu":
            # boxed hand-over, same as the Evaluator: the staged builder
            # (auto above n=16384) runs at the HBM cliff and the n^2
            # distance matrices only free once no python frame references
            # them — holding gg (~4 GB fp32 at LS-VID scale) through the
            # stages OOMs reduced-ceiling sessions
            box = [distmat_d, qq, gg]
            qq = gg = distmat_d = None
            distmat = np.asarray(re_ranking_device(inputs_box=box))
        else:
            distmat = re_ranking(
                np.asarray(distmat_d), np.asarray(qq), np.asarray(gg)
            )
            distmat_d = None
    else:
        distmat = np.asarray(distmat_d)
        distmat_d = None
    topk = min(args.topk, gf.shape[0])
    order = np.argsort(distmat, axis=1)[:, :topk]
    results = [
        {
            "query": i,
            "query_pid": int(q["pids"][i]),
            "matches": [
                {
                    "gallery": int(j),
                    "pid": int(g["pids"][j]),
                    "camid": int(g["camids"][j]),
                    # similarity = negative distance. Without --rerank:
                    # the dot of the 6144-d descriptor (3 L2-normed blocks
                    # -> range [-3, 3]). With --rerank: the blended
                    # Jaccard/original scale — ordinal only, NOT comparable
                    # to non-reranked scores or absolute thresholds.
                    "score": float(-distmat[i, j]),
                }
                for j in order[i]
            ],
        }
        for i in range(order.shape[0])
    ]
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote top-{topk} rankings for {order.shape[0]} queries to {args.out}")
    return results


def export_model(args):
    """Serialize the descriptor program as a self-contained AOT artifact.

    ``jax.export`` captures the jitted descriptor computation (uint8
    clips -> 6144-d descriptors) as StableHLO with the checkpoint's
    weights baked in as constants. The artifact is loadable with ONLY
    jax installed — no grl_tpu model code, no checkpoint, no retracing —
    which is the shape production serving wants (and what the reference,
    which couples extraction to its benchmark script, has no answer to).
    Batch is fixed at export time; ``describe`` pads the final chunk."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from ..engine.evaluator import make_descriptor_fn
    from ..engine.optim import SGD
    from ..engine.train_step import init_train_state
    from ..utils.serialization import load_train_state
    from .train import build_models

    cnn, siamese, siamese_uncorr = build_models(args, tiny=args.tiny)
    template = init_train_state(
        jax.random.PRNGKey(args.seed), cnn, siamese, siamese_uncorr,
        args.num_classes, num_feat=cnn.num_feat, optimizer=SGD(),
    )
    ckpt = args.checkpoint or osp.join(args.logs_dir, "checkpoint_best.npz")
    # host numpy leaves, deliberately: export traces on host constants, so
    # device_put-ing the whole train state would round-trip hundreds of MB
    # over the accelerator link for nothing
    state, _ = load_train_state(template, ckpt)
    print(f"loaded {ckpt}")
    params, mstate = state["params"], state["model_state"]

    # weights closed over the shared descriptor recipe (they serialize as
    # constants inside the artifact)
    describe = functools.partial(
        make_descriptor_fn(cnn, siamese),
        params["cnn"], mstate["cnn"], params["siamese"], mstate["siamese"],
    )

    channels = 6 if args.use_flow else 3
    spec = jax.ShapeDtypeStruct(
        (args.batch, args.seq_len, args.height, args.width, channels), jnp.uint8
    )
    platforms = [p.strip() for p in args.platforms.split(",") if p.strip()] or None
    exp = jexport.export(jax.jit(describe), platforms=platforms)(spec)
    blob = exp.serialize()
    meta = {
        "batch": args.batch, "seq_len": args.seq_len, "height": args.height,
        "width": args.width, "channels": channels,
        "platforms": list(exp.platforms), "dim": int(3 * cnn.num_feat),
    }
    np.savez(args.out, exported=np.frombuffer(blob, np.uint8),
             meta=json.dumps(meta))
    print(f"exported descriptor program ({len(blob) / 1e6:.1f} MB, "
          f"platforms {list(exp.platforms)}, batch {args.batch}) to {args.out}")
    return meta


def _load_artifact(path):
    """Deserialize an ``export-model`` artifact -> (call, meta, raw_call).

    ``call`` is the jitted wrapper (every padded chunk hits ONE compiled
    program, carrying the same measured compiler options as the in-process
    eval jit); ``raw_call`` is the unjitted exported function for callers
    that compose it INSIDE their own top-level jit (compiler options are
    rejected on nested jits).
    """
    import jax
    from jax import export as jexport

    from ..utils.profiling import descriptor_compiler_options

    with np.load(path, allow_pickle=False) as z:
        blob = z["exported"].tobytes()
        meta = json.loads(str(z["meta"]))
    # fail at load, not at the first request: an artifact exported for the
    # wrong platform would otherwise serve an opaque per-call export error
    # (a daemon started on a CPU-only host against a tpu-only artifact)
    platforms = meta.get("platforms")
    if platforms:
        backend = jax.default_backend()
        try:
            # resolves 'gpu' to the concrete export platform this host's
            # plugin lowers for ('cuda' vs 'rocm' — export platform names
            # are concrete; a cuda-only artifact must NOT load on rocm)
            from jax._src.xla_bridge import canonicalize_platform

            accepted = (canonicalize_platform(backend),)
        except Exception:
            accepted = {"gpu": ("cuda", "rocm")}.get(backend, (backend,))
        if not any(p in platforms for p in accepted):
            raise SystemExit(
                f"{path} was exported for platforms {platforms} but this "
                f"host's jax backend is '{backend}' — re-export with "
                f"--platforms {','.join(sorted({*platforms, *accepted}))} "
                "for a cross-platform artifact"
            )
    exp = jexport.deserialize(blob)
    call = jax.jit(exp.call, compiler_options=descriptor_compiler_options())
    return call, meta, exp.call


def _check_clips(clips, meta):
    expect = (meta["seq_len"], meta["height"], meta["width"], meta["channels"])
    if clips.shape[1:] != expect:
        raise ValueError(
            f"clips shaped {clips.shape[1:]} but the artifact was exported "
            f"for {expect} (seq_len, height, width, channels)"
        )
    if clips.dtype != np.uint8:
        raise ValueError(
            f"clips dtype {clips.dtype} but the artifact expects uint8 raw "
            "frames (normalization happens inside the exported program)"
        )
    if clips.shape[0] == 0:
        raise ValueError("clips array is empty (0 clips)")


def _artifact_chunks(clips, batch):
    """Yield (chunk padded to the export batch, valid row count)."""
    for i in range(0, clips.shape[0], batch):
        chunk = clips[i : i + batch]
        size = chunk.shape[0]
        if size < batch:
            chunk = np.concatenate(
                [chunk, np.zeros((batch - size,) + chunk.shape[1:], chunk.dtype)]
            )
        yield chunk, size


class _DescribeCoalescer:
    """Cross-request descriptor batching for the serve daemon.

    Concurrent connections' clips pack into shared device dispatches of
    the artifact's compiled batch width — the classic serving batcher,
    with no timers and no background thread: whichever waiter takes the
    device lock first leads a dispatch, draining queued work FIFO up to
    the batch width; everyone else either sees their rows arrive or
    leads the next dispatch. A lone request therefore dispatches
    immediately with exactly the sequential path's chunking/padding
    (bit-identical results, zero added latency when idle); under
    concurrent load, small requests share MXU batches instead of each
    paying a padded dispatch. No reference analogue (the reference
    serves nothing); the packing idea is standard inference-server
    continuous batching.
    """

    def __init__(self, call, batch):
        import threading

        self._call, self._batch = call, batch
        self._q = []
        self._qlock = threading.Lock()
        self._device = threading.Lock()
        # observability (reported by the daemon's stats op)
        self.dispatches = 0   # device calls issued
        self.clips = 0        # valid clips described
        self.packed = 0       # dispatches carrying >1 waiter's clips

    def describe(self, clips):
        """(n, S, H, W, C) uint8 -> (n, dim) float32 descriptors."""
        import threading

        items = [
            {"clips": clips[i : i + self._batch],
             "done": threading.Event(), "out": None, "err": None}
            for i in range(0, clips.shape[0], self._batch)
        ]
        with self._qlock:
            self._q.extend(items)
        for item in items:
            while not item["done"].is_set():
                # lead a dispatch (of the FIFO head, not necessarily of
                # this item) or wait for one to finish
                if self._device.acquire(timeout=0.05):
                    try:
                        if not item["done"].is_set():
                            self._lead()
                    finally:
                        self._device.release()
        for item in items:
            if item["err"] is not None:
                raise item["err"]
        return np.concatenate([item["out"] for item in items])

    def _lead(self):
        """One dispatch: drain the FIFO head up to the batch width.
        Caller holds the device lock."""
        with self._qlock:
            take, used = [], 0
            while self._q and used + self._q[0]["clips"].shape[0] <= self._batch:
                item = self._q.pop(0)
                take.append(item)
                used += item["clips"].shape[0]
        if not take:
            return
        chunk = np.concatenate(
            [item["clips"] for item in take]
            + ([np.zeros((self._batch - used,) + take[0]["clips"].shape[1:],
                         take[0]["clips"].dtype)]
               if used < self._batch else [])
        )
        try:
            feats = np.asarray(self._call(chunk)).astype(np.float32)
        except Exception as e:  # noqa: BLE001 — propagate to every waiter
            for item in take:
                item["err"] = e
                item["done"].set()
            return
        off = 0
        for item in take:
            k = item["clips"].shape[0]
            item["out"] = feats[off : off + k]
            off += k
        with self._qlock:
            self.dispatches += 1
            self.clips += used
            self.packed += len(take) > 1
        for item in take:
            item["done"].set()

    def snapshot(self):
        """Packing counters for the daemon's stats op."""
        with self._qlock:
            return {"dispatches": self.dispatches, "clips": self.clips,
                    "packed": self.packed}


def _load_npz_any(spec):
    """An npz operand in a daemon request: a filesystem path string (the
    shared-filesystem handoff, the default) or an inline payload
    ``{"npz_b64": <base64 of the npz file bytes>}`` so socket clients on
    OTHER machines need no shared filesystem (``grl_tpu.client`` encodes
    numpy arrays this way)."""
    if isinstance(spec, dict):
        if "npz_b64" not in spec:
            raise ValueError(
                "inline npz operand must be {'npz_b64': <base64 bytes>}, "
                f"got keys {sorted(spec)}"
            )
        import base64
        import io

        raw = base64.b64decode(spec["npz_b64"], validate=True)
        return np.load(io.BytesIO(raw))
    return np.load(spec)


def _npz_b64(payload):
    """Arrays -> base64 of the npz file bytes (inline response body)."""
    import base64
    import io

    buf = io.BytesIO()
    np.savez(buf, **payload)
    return base64.b64encode(buf.getvalue()).decode("ascii")


def _describe_chunked(call, meta, clips):
    """Sequential describe: clips -> (n, dim) float32 via fixed-width
    padded chunks of the artifact's compiled batch."""
    return np.concatenate(
        [np.asarray(call(chunk))[:size]
         for chunk, size in _artifact_chunks(clips, meta["batch"])]
    ).astype(np.float32)


def _describe_payload(describe_fn, meta, clips_src):
    """Clips npz (``clips`` (n, S, h, w, c) uint8, optional ``pids``/
    ``camids`` passthrough) -> descriptor payload dict.

    The single assembly used by the one-shot ``describe`` subcommand and
    the daemon's describe op (pinned bit-for-bit equal in CI);
    ``describe_fn`` is the sequential chunked path or the daemon's
    cross-request coalescer (identical chunking when uncontended)."""
    src = _load_npz_any(clips_src)
    clips = src["clips"]
    _check_clips(clips, meta)
    payload = {"features": describe_fn(clips)}
    for k in ("pids", "camids"):
        if k in src.files:
            payload[k] = src[k]
    return payload


def _describe_to_npz(call, meta, clips_path, out_path):
    payload = _describe_payload(
        functools.partial(_describe_chunked, call, meta), meta, clips_path)
    np.savez(out_path, **payload)
    return payload["features"]


def describe_with_export(args):
    """Run clips through an ``export-model`` artifact -> descriptor npz.
    Needs only jax at runtime."""
    call, meta, _ = _load_artifact(args.model)
    try:
        feats = _describe_to_npz(call, meta, args.clips, args.out)
    except ValueError as e:
        raise SystemExit(str(e))
    print(f"wrote {feats.shape[0]} x {feats.shape[1]} descriptors to {args.out}")
    return feats.shape


def serve(args, inp=None, out=None):
    """Persistent descriptor/retrieval daemon over an ``export-model``
    artifact.

    One-shot CLI invocations pay process start + weight upload + compile
    (or cache load) PER CALL — on a tunneled link the weight upload alone
    is ~115 MB (docs/PERFORMANCE.md). ``serve`` pays it once, then answers
    requests over a JSON-lines protocol: one request object per line, one
    response object per line (logs go to stderr) — over stdin/stdout by
    default, or over a TCP/unix socket with ``--listen`` (concurrent
    clients, one thread per connection; device work is serialized, so an
    idle client never blocks another's requests). Ops:

      {"op": "ping"}
      {"op": "stats"}                                   # per-op counters
      {"op": "describe", "clips": "in.npz", "out": "feats.npz"}
      {"op": "rank", "clips": "in.npz", "topk": 5}      # needs an index
      {"op": "rank", "clips": "in.npz", "rerank": true} # k-reciprocal
      {"op": "add", "clips": "new.npz"}                 # or "features"
      {"op": "save", "out": "index.npz"}
      {"op": "shutdown"}

    ``describe`` behaves like the one-shot subcommand (descriptor npz with
    pids/camids passthrough, file-based handoff so clip tensors never ride
    the protocol channel); ``rank`` describes the clips and answers inline
    with the ``rank`` subcommand's match schema against the resident index
    (gallery features device-resident; similarities + top-k on device).

    Every npz operand (``clips``/``features``) also accepts an INLINE
    payload ``{"npz_b64": <base64 of the npz bytes>}`` in place of the
    path, and ``describe``/``save`` answer inline (``npz_b64`` in the
    response) when ``out`` is omitted — socket clients on other machines
    have no shared filesystem. ``grl_tpu.client.ServeClient`` wraps the
    whole protocol with a numpy-in/numpy-out API.

    ``rank`` queries with raw ``clips`` or with precomputed ``features``
    (skips the CNN pass — e.g. descriptors from a prior describe); both
    take ``"rerank": true``.

    Concurrency: connections are served by one thread each; clip
    description (describe/add/rank operands) runs through a cross-request
    coalescer that packs concurrent clips into shared device dispatches
    of the artifact's batch width (zero added latency when idle —
    sequential-identical chunking), while index reads/writes and the
    similarity/rerank programs serialize on one lock. ``stats`` reports
    the packing counters under ``describe_batching``.

    The index seeds from --gallery and grows in place: ``add`` enrolls new
    descriptors (raw clips are described first) up to --capacity — the
    device buffer is capacity-padded and rank masks rows past the valid
    count, so enrollment never recompiles; ``save`` persists the grown
    index as a gallery npz. --capacity without --gallery starts an empty
    index (enroll-from-scratch). A malformed request gets ``{"ok": false,
    "error": ...}`` and the loop continues — a daemon must not die on one
    bad request. Request lines are size-capped (``--max-request-mb``,
    default 256 MB): an oversize line — e.g. a runaway inline npz_b64 —
    is drained in bounded 1 MiB chunks (never buffered whole), answered
    with a clean error, and the connection stays alive. Every response
    carries ``ms`` (request wall time).

    Lifecycle: SIGTERM/SIGINT shut the daemon down cleanly — the in-flight
    request finishes (its response is still written), the listening socket
    closes, unix socket files are unlinked, and the process exits 0. This
    is the process-manager path (systemd et al deliver TERM, not a polite
    ``{"op": "shutdown"}``). In stdin/stdout mode a signal takes effect at
    the next request boundary; EOF on stdin remains the normal stop.
    """
    import signal
    import socket as socklib
    import sys
    import time

    import jax
    import jax.numpy as jnp

    inp = inp if inp is not None else sys.stdin
    out = out if out is not None else sys.stdout

    call, meta, _ = _load_artifact(args.model)
    # every clip-describe site (describe/add/rank) funnels through the
    # coalescer: concurrent connections' clips share device dispatches;
    # uncontended it chunks exactly like the sequential path
    coalescer = _DescribeCoalescer(call, meta["batch"])
    idx = rank_topk_feats = None
    rerank_unavailable, q_pad = "rank needs serve --gallery or --capacity", 0
    rr_staged, rr_mesh = False, None
    ADD_BLOCK = 256  # fixed enrollment granularity: one compiled update
    if args.gallery or args.capacity:
        if args.topk < 1:
            raise SystemExit("serve --topk must be >= 1 (the on-device "
                             "top-k is compiled at this width)")
        if args.capacity < 0:
            raise SystemExit("serve --capacity must be >= 0")
        if args.gallery:
            g = np.load(args.gallery)
            feats = g["features"]
            if feats.ndim != 2 or feats.shape[1] != meta["dim"]:
                raise SystemExit(
                    f"gallery features are shaped {feats.shape} but the "
                    f"artifact produces {meta['dim']}-d descriptors"
                )
            if feats.shape[0] == 0 and not args.capacity:
                raise SystemExit(f"gallery index {args.gallery} is empty")
            # pids/camids are passthrough-optional in describe outputs; an
            # unlabeled index still ranks (labels report as -1)
            labels = {
                k: (np.asarray(g[k]) if k in g.files
                    else np.full(feats.shape[0], -1, np.int64))
                for k in ("pids", "camids")
            }
        else:  # enroll-from-scratch index
            feats = np.zeros((0, meta["dim"]), np.float32)
            labels = {k: np.zeros(0, np.int64) for k in ("pids", "camids")}
        n0 = feats.shape[0]
        capacity = max(args.capacity, n0)
        # the device buffer carries one spare ADD_BLOCK so enrollment's
        # fixed-width dynamic_update_slice never clamps its start offset
        # (a clamp would silently overwrite live rows near capacity)
        buf = np.zeros((capacity + ADD_BLOCK, meta["dim"]), np.float32)
        buf[:n0] = feats
        idx = {"n": n0, "capacity": capacity, "gf": jnp.asarray(buf),
               "pids": labels["pids"], "camids": labels["camids"]}
        k_max = min(args.topk, capacity)  # capacity >= 1 here
        # rerank geometry is fixed at startup so serving never recompiles:
        # queries pad to a fixed width, the index to capacity
        if args.rerank_queries < 1:
            raise SystemExit("serve --rerank-queries must be >= 1")
        q_pad = meta["batch"] * -(-args.rerank_queries // meta["batch"])
        rerank_unavailable = None
        # --devices > 1: row-shard the n^2 rerank set algebra over a
        # device mesh (the headroom path past the single-chip HBM ceiling
        # that engine/rerank.py's warning points at). The mesh only exists
        # in the staged builder, so a mesh forces the staged route.
        rr_mesh = None
        if getattr(args, "devices", 1) and args.devices > 1:
            from ..parallel import auto_mesh

            rr_mesh = auto_mesh(limit=args.devices)
        # past the one-jit padded builder's scale (it holds ~6 n^2 fp32
        # buffers live), rerank routes through the staged memory-lean
        # builder with the same capacity-padding convention — still
        # compile-once at the padded geometry, valid counts traced
        rr_staged = (rr_mesh is not None
                     or q_pad + buf.shape[0] > _RERANK_ONEJIT_MAX)

        # gallery rides as an argument (a closed-over array would be baked
        # into the program as a constant); scores are the same negative-
        # cosine convention as the rank subcommand, so top-k of +similarity.
        # Rows past the valid count are masked to -inf (the padded region
        # is zeros, whose similarity 0 would otherwise beat genuinely
        # negative matches). Rank queries arrive as descriptors — raw
        # clips are described first (through the coalescer, so concurrent
        # rank/describe requests share the CNN dispatches); either way
        # this program is chunked to the artifact batch width, so request
        # sizes never recompile.
        @jax.jit
        def rank_topk_feats(qf, gf, n_valid):
            sim = jnp.dot(qf, gf.T, preferred_element_type=jnp.float32)
            cols = jnp.arange(gf.shape[0])[None, :]
            sim = jnp.where(cols < n_valid, sim, -jnp.inf)
            return jax.lax.top_k(sim, k_max)

        # donated: enrollment updates the resident buffer in place
        gf_update = jax.jit(
            lambda gf, block, off: jax.lax.dynamic_update_slice(
                gf, block, (off, 0)),
            donate_argnums=0,
        )

        @jax.jit
        def rerank_topk(dist, n_valid):
            # top-k of the re-ranked distances with the padding columns
            # masked out; scores reported as -distance (ordinal only —
            # the blended Jaccard/original scale, like `rank --rerank`)
            cols = jnp.arange(dist.shape[1])[None, :]
            neg = jnp.where(cols < n_valid, -dist, -jnp.inf)
            return jax.lax.top_k(neg, k_max)

    # the Pallas min-plus kernel inside the padded rerank is TPU-only;
    # other backends run it in interpret mode (slow — CPU serving of
    # rerank is a test/degenerate configuration)
    rr_interpret = jax.default_backend() != "tpu"

    def enroll(feats, pids, camids):
        """Append descriptor rows to the device-resident index."""
        n, n_add = idx["n"], feats.shape[0]
        if n + n_add > idx["capacity"]:
            raise ValueError(
                f"index at {n}/{idx['capacity']}: adding {n_add} exceeds "
                "capacity — restart serve with a larger --capacity"
            )
        for i in range(0, n_add, ADD_BLOCK):
            block = feats[i : i + ADD_BLOCK]
            if block.shape[0] < ADD_BLOCK:  # zero-pad: rows past the new
                block = np.concatenate(    # count stay masked out of rank
                    [block, np.zeros((ADD_BLOCK - block.shape[0],
                                      block.shape[1]), np.float32)]
                )
            idx["gf"] = gf_update(idx["gf"], jnp.asarray(block),
                                  np.int32(n + i))
        idx["n"] = n + n_add
        idx["pids"] = np.concatenate([idx["pids"], pids])
        idx["camids"] = np.concatenate([idx["camids"], camids])

    def load_add_features(req):
        """An add request carries either descriptors or raw clips."""
        src = _load_npz_any(
            req["features"] if "features" in req else req["clips"])
        if "features" in req:
            feats = np.asarray(src["features"], np.float32)
            if feats.ndim != 2 or feats.shape[1] != meta["dim"]:
                raise ValueError(
                    f"add features shaped {feats.shape}, need "
                    f"(n, {meta['dim']})"
                )
        else:
            clips = src["clips"]
            _check_clips(clips, meta)
            feats = coalescer.describe(clips)
        labels = {}
        for k in ("pids", "camids"):
            labels[k] = (np.asarray(src[k], np.int64) if k in src.files
                         else np.full(feats.shape[0], -1, np.int64))
            if labels[k].shape != (feats.shape[0],):
                raise ValueError(
                    f"{k} shaped {labels[k].shape}, need ({feats.shape[0]},)"
                )
        return feats, labels["pids"], labels["camids"]

    def matches_of(order_row, scores_row, topk):
        return [
            {"gallery": int(j), "pid": int(idx["pids"][j]),
             "camid": int(idx["camids"][j]), "score": float(s)}
            for j, s in zip(order_row[:topk], scores_row[:topk])
        ]

    def rerank_dist(qf, n_q):
        """(q_pad, dim) padded query features -> (q_pad, G) re-ranked
        distances; rows past n_q / columns past idx["n"] are garbage.
        Routes by geometry: the one-jit padded builder below
        _RERANK_ONEJIT_MAX total items, the staged memory-lean builder
        (identical capacity-padding convention, valid counts traced)
        above it. Either way every program compiles once at the padded
        geometry — enrollment and varying request sizes never recompile."""
        from ..engine.evaluator import _euclidean, cosine_distance

        n = idx["n"]
        if rr_staged:
            from ..engine.rerank import re_ranking_device

            # gg is NOT cached on this path: the staged stages need the
            # distance matrices to FREE after s1 (a resident gg copy
            # would pin an extra n^2 fp32 buffer across every stage —
            # 4.4 GB at n=33k); recomputing it is one MXU matmul.
            box = [cosine_distance(qf, idx["gf"]), _euclidean(qf, qf),
                   _euclidean(idx["gf"], idx["gf"])]
            qf = None
            return re_ranking_device(
                inputs_box=box, valid=(n_q, n), interpret=rr_interpret,
                mesh=rr_mesh,
            )
        from ..engine.rerank import re_ranking_device_padded

        # the gallery-gallery euclidean matrix only changes on enrollment;
        # cache it device-resident per valid count
        if idx.get("gg_n") != n:
            idx["gg"] = _euclidean(idx["gf"], idx["gf"])
            idx["gg_n"] = n
        return re_ranking_device_padded(
            cosine_distance(qf, idx["gf"]), _euclidean(qf, qf), idx["gg"],
            n_q, n, interpret=rr_interpret,
        )

    def rank_reranked(feats, topk):
        """k-reciprocal re-ranked retrieval (the `rank --rerank` math)
        against the resident index, compiled ONCE: queries are padded to
        the fixed --rerank-queries width and the masked builders take the
        valid counts as traced scalars, so neither enrollment nor varying
        request sizes recompile the n^2 set-algebra programs. Scores are
        -distance on the blended Jaccard/original scale — ordinal only,
        not comparable to plain rank similarities."""
        n = idx["n"]
        n_q = feats.shape[0]
        if n_q + n < 21:  # k1 + 1: below this the padded top-k clamps
            raise ValueError(  # diverge from the reference's math
                "rerank needs >= 21 total items (k1=20) — enroll more or "
                "rank without rerank"
            )
        if n_q > q_pad:
            raise ValueError(
                f"rerank request has {n_q} queries but the daemon's "
                f"compiled query width is {q_pad} — restart with "
                f"--rerank-queries {n_q} or use 'extract rank --rerank'"
            )
        qf = np.zeros((q_pad, feats.shape[1]), np.float32)
        qf[:n_q] = feats
        dist = rerank_dist(jnp.asarray(qf), n_q)
        scores, order = rerank_topk(dist, np.int32(n))
        scores = np.asarray(scores)[:n_q]
        order = np.asarray(order)[:n_q]
        resp = {
            "ok": True, "op": "rank", "reranked": True,
            "results": [
                {"query": r, "matches": matches_of(order[r], scores[r], topk)}
                for r in range(n_q)
            ],
        }
        if n_q + n < 42:  # 2 * (k1 + 1), warn_if_degenerate's regime:
            # neighborhoods cover most of the set and re-ranking can
            # scramble an otherwise-correct ranking. The one-shot CLI
            # warns on stderr; a daemon client only sees the response.
            resp["warning"] = (
                f"re-ranking {n_q + n} items is degenerate below 42 "
                "(2*(k1+1)) — results may be worse than plain rank"
            )
        return resp

    def handle(req):
        op = req.get("op")
        if op == "ping":
            return {
                "ok": True, "op": "ping", "dim": meta["dim"],
                "batch": meta["batch"],
                # clip geometry: a remote client (inline-npz transport,
                # no shared filesystem) has no other way to learn the
                # shape the artifact was exported for
                "seq_len": meta["seq_len"], "height": meta["height"],
                "width": meta["width"], "channels": meta["channels"],
                "platform": jax.default_backend(),
                "gallery": idx["n"] if idx is not None else 0,
                "capacity": idx["capacity"] if idx is not None else 0,
                # client discoverability: whether rerank requests can
                # succeed on this config, and the compiled query width
                "rerank": bool(idx is not None and not rerank_unavailable),
                "rerank_queries": q_pad if (
                    idx is not None and not rerank_unavailable) else 0,
                # which builder answers rerank requests (observability:
                # staged trades warm latency for n^2-stage memory headroom)
                "rerank_staged": bool(idx is not None and rr_staged),
                # devices the n^2 rerank set algebra row-shards over
                # (1 = single-device; >1 only with --devices and a mesh)
                "rerank_devices": (
                    rr_mesh.devices.size
                    if idx is not None and rr_mesh is not None else 1
                ),
            }
        if op == "stats":
            # monitoring surface: per-op counters + latency aggregates
            # (request wall time incl. the device-serialization wait)
            with lifecycle["lock"]:
                ops = {
                    name: {"n": s["n"], "errors": s["errors"],
                           "ms_mean": round(s["ms_total"] / s["n"], 2),
                           "ms_max": s["ms_max"]}
                    for name, s in stats.items()
                }
            resp = {"ok": True, "op": "stats", "ops": ops,
                    "uptime_s": round(time.time() - lifecycle["t0"], 1),
                    "gallery": idx["n"] if idx is not None else 0}
            resp["describe_batching"] = coalescer.snapshot()
            return resp
        if op == "shutdown":
            return {"ok": True, "op": "shutdown"}
        if op == "describe":
            # no index state touched: describes run concurrently, the
            # coalescer packs them into shared device dispatches
            payload = _describe_payload(coalescer.describe, meta,
                                        req["clips"])
            feats = payload["features"]
            resp = {"ok": True, "op": "describe", "n": int(feats.shape[0]),
                    "dim": int(feats.shape[1])}
            if req.get("out"):
                np.savez(req["out"], **payload)
                resp["out"] = req["out"]
            else:
                # no "out": answer inline (remote clients have no shared
                # filesystem to hand the descriptor npz back through)
                resp["npz_b64"] = _npz_b64(payload)
            return resp
        if op == "add":
            if idx is None:
                raise ValueError("add needs serve --gallery or --capacity")
            if not ("features" in req or "clips" in req):
                raise ValueError("add needs a 'features' or 'clips' npz path")
            feats, pids, camids = load_add_features(req)  # describe: no lock
            with lifecycle["handle"]:
                enroll(feats, pids, camids)
                return {"ok": True, "op": "add",
                        "added": int(feats.shape[0]),
                        "gallery": idx["n"], "capacity": idx["capacity"]}
        if op == "save":
            if idx is None:
                raise ValueError("save needs serve --gallery or --capacity")
            with lifecycle["handle"]:  # consistent (gf, n, labels) snapshot
                payload = {"features": np.asarray(idx["gf"])[: idx["n"]],
                           "pids": idx["pids"], "camids": idx["camids"]}
                n = idx["n"]
            if req.get("out"):
                np.savez(req["out"], **payload)
                return {"ok": True, "op": "save", "n": n,
                        "out": req["out"]}
            # no "out": ship the index inline (remote clients)
            return {"ok": True, "op": "save", "n": n,
                    "npz_b64": _npz_b64(payload)}
        if op == "rank":
            if idx is None:
                raise ValueError("rank needs serve --gallery or --capacity")
            if req.get("rerank") and rerank_unavailable:
                raise ValueError(rerank_unavailable)  # config error first
            if ("features" in req) == ("clips" in req):
                raise ValueError(
                    "rank takes exactly one of 'clips' (raw frames) / "
                    "'features' (precomputed descriptors)")
            topk = int(req.get("topk", args.topk))
            if topk < 1:
                raise ValueError("topk must be >= 1")
            if idx["n"] == 0:  # early + cheap; re-checked under the lock
                raise ValueError("index is empty — enroll with add first")
            if "features" in req:
                # precomputed descriptors: the CNN pass is skipped
                src = _load_npz_any(req["features"])
                qf = np.asarray(src["features"], np.float32)
                if qf.ndim != 2 or qf.shape[1] != meta["dim"]:
                    raise ValueError(
                        f"rank features shaped {qf.shape}, need "
                        f"(n, {meta['dim']})")
                if qf.shape[0] == 0:
                    raise ValueError("rank features array is empty")
            else:
                src = _load_npz_any(req["clips"])
                clips = src["clips"]
                _check_clips(clips, meta)
                # raw clips describe OUTSIDE the index lock, through the
                # coalescer — concurrent rank/describe/add requests share
                # the CNN dispatches
                qf = coalescer.describe(clips)
            with lifecycle["handle"]:  # index reads + similarity program
                if idx["n"] == 0:
                    raise ValueError(
                        "index is empty — enroll with add first")
                topk = min(topk, k_max, idx["n"])
                if req.get("rerank"):
                    return rank_reranked(qf, topk)
                results = []
                for ci, (chunk, size) in enumerate(
                    _artifact_chunks(qf, meta["batch"])
                ):
                    base = ci * meta["batch"]
                    # scores: cosine similarity of the 6144-d descriptor
                    # (3 L2-normed blocks -> range [-3, 3]); same
                    # convention as the rank subcommand's score
                    scores, order = rank_topk_feats(chunk, idx["gf"],
                                                    np.int32(idx["n"]))
                    scores = np.asarray(scores)[:size]
                    order = np.asarray(order)[:size]
                    results.extend(
                        {"query": base + r,
                         "matches": matches_of(order[r], scores[r], topk)}
                        for r in range(size)
                    )
                return {"ok": True, "op": "rank", "results": results}
        raise ValueError(f"unknown op {op!r}")

    if getattr(args, "warmup", False):
        # pre-compile every serving program before accepting requests:
        # first-request colds measured 278-402 s on a tunnel session at
        # MARS scale (docs/PERFORMANCE.md) — a production daemon should
        # pay them before it declares readiness, not on a live query
        t0 = time.time()
        dummy = np.zeros((meta["batch"], meta["seq_len"], meta["height"],
                          meta["width"], meta["channels"]), np.uint8)
        float(call(dummy)[0, 0])  # descriptor program
        if idx is not None:
            n1 = np.int32(max(idx["n"], 1))
            float(rank_topk_feats(
                jnp.zeros((meta["batch"], meta["dim"]), jnp.float32),
                idx["gf"], n1)[0][0, 0])
            # enrollment update: writing zeros at offset n touches only
            # the invalid region (rows >= n are zeros already)
            idx["gf"] = gf_update(
                idx["gf"], jnp.zeros((ADD_BLOCK, meta["dim"]), jnp.float32),
                np.int32(idx["n"]),
            )
            if not rerank_unavailable:
                qf0 = jnp.zeros((q_pad, meta["dim"]), jnp.float32)
                d = rerank_dist(qf0, 1)
                float(rerank_topk(d, n1)[0][0, 0])
        print(f"warmup done in {time.time() - t0:.1f}s", file=sys.stderr)

    print(
        f"serving {args.model} (batch {meta['batch']}, dim {meta['dim']}"
        + (f", gallery {idx['n']}/{idx['capacity']}"
           if idx is not None else "")
        + ") — one JSON request per line",
        file=sys.stderr,
    )
    import threading

    # graceful shutdown state, shared by the signal handler, the shutdown
    # op, and every connection thread. A signal handler may only be
    # installed from the main thread (in-process tests drive serve() from
    # worker threads — there the shutdown op / EOF path still applies).
    lifecycle = {
        "stop": False,
        "srv": None,
        "conns": set(),
        "lock": threading.Lock(),     # conns set + stats aggregates
        "handle": threading.Lock(),   # serializes device work across clients
        "t0": time.time(),
    }
    stats = {}

    def _stop_everything(why):
        # Finish in-flight requests, then exit cleanly. Blocked syscalls
        # must FAIL rather than be retried (the signal case runs mid-
        # syscall and PEP 475 silently retries after the handler returns):
        # full shutdown on the listening socket aborts accept(); read-side
        # shutdown on live connections turns their blocked readline into
        # EOF while each response side still flushes.
        lifecycle["stop"] = True
        print(f"{why}: shutting down", file=sys.stderr)
        if lifecycle["srv"] is not None:
            try:
                lifecycle["srv"].shutdown(socklib.SHUT_RDWR)
            except OSError:
                pass
        with lifecycle["lock"]:
            live = list(lifecycle["conns"])
        for conn in live:
            try:
                conn.shutdown(socklib.SHUT_RD)
            except OSError:
                pass

    # Self-pipe teardown: the handler frame may be interrupting a holder
    # of ANY non-reentrant lock on the main thread — lifecycle["lock"]
    # (accept loop, stats update), threading's _active_limbo_lock (the
    # accept loop's own Thread.start()), or a buffered-stderr write — so
    # the handler must not acquire locks, start threads, or print. It sets
    # the stop flag (dict write, GIL-atomic) and pokes a pipe with
    # os.write (async-signal-safe); a PRE-SPAWNED waiter thread blocked in
    # os.read runs the actual socket teardown.
    _sig_r, _sig_w = os.pipe()

    def _signal_waiter():
        data = os.read(_sig_r, 1)
        if data:  # empty read = pipe closed on the no-signal exit path
            _stop_everything(f"caught signal {int(data[0])}")

    def _graceful(signum, _frame):
        lifecycle["stop"] = True
        try:
            os.write(_sig_w, bytes([signum]))
        except OSError:
            pass  # pipe already closed during shutdown

    prev_handlers = {}
    try:
        for sig in (signal.SIGTERM, signal.SIGINT):
            prev_handlers[sig] = signal.signal(sig, _graceful)
        threading.Thread(target=_signal_waiter, daemon=True).start()
    except ValueError:  # not the main thread
        prev_handlers = {}

    # request lines are read with a hard size cap: inline operands ride
    # base64-npz ON the line, so an unbounded readline would let one buggy
    # or hostile client balloon host RSS before json.loads even runs. An
    # oversize line is drained in bounded chunks (never buffered whole),
    # answered with a clean {"ok": false}, and the connection stays alive.
    max_request_mb = getattr(args, "max_request_mb", 256.0)
    max_line_chars = int(max_request_mb * (1 << 20))

    def _read_bounded_line(fin):
        """readline with a cap; returns (line, oversize?)."""
        line = fin.readline(max_line_chars + 1)
        if len(line) <= max_line_chars or line.endswith("\n"):
            return line, False
        while True:  # discard the rest of the oversize line, 1 MiB at a time
            chunk = fin.readline(1 << 20)
            if not chunk or chunk.endswith("\n"):
                return "", True

    def serve_lines(fin, fout):
        """One JSON-lines conversation; returns (#served, shutdown?)."""
        served = 0
        while True:
            line, oversize = _read_bounded_line(fin)
            if oversize:
                resp = {
                    "ok": False,
                    "error": f"request line exceeds --max-request-mb "
                             f"({max_request_mb:g} MB); send large "
                             f"operands as file paths instead of inline "
                             f"npz_b64, or raise the cap",
                    "ms": 0.0,
                }
                with lifecycle["lock"]:
                    s = stats.setdefault("oversize", {"n": 0, "errors": 0,
                                                      "ms_total": 0.0,
                                                      "ms_max": 0.0})
                    s["n"] += 1
                    s["errors"] += 1
                fout.write(json.dumps(resp) + "\n")
                fout.flush()  # OSError here = client vanished; conversation logs it
                continue
            if not line:  # EOF
                break
            line = line.strip()
            if not line:
                continue
            t0 = time.perf_counter()
            req = None
            try:
                req = json.loads(line)
                # locking is per-op inside handle(): index state rides
                # lifecycle["handle"], clip description runs concurrently
                # through the coalescer (shared device dispatches)
                resp = handle(req)
            except Exception as e:  # noqa: BLE001 — per-request isolation
                resp = {"ok": False, "error": f"{type(e).__name__}: {e}"}
                if isinstance(req, dict):  # attribute the error to its op
                    resp["op"] = req.get("op")
            resp["ms"] = round((time.perf_counter() - t0) * 1e3, 2)
            with lifecycle["lock"]:
                s = stats.setdefault(resp.get("op") or "invalid",
                                     {"n": 0, "errors": 0,
                                      "ms_total": 0.0, "ms_max": 0.0})
                s["n"] += 1
                s["errors"] += 0 if resp.get("ok") else 1
                s["ms_total"] += resp["ms"]
                s["ms_max"] = max(s["ms_max"], resp["ms"])
            # decide BEFORE the reply write: a client that disconnects
            # without reading its shutdown response must still stop the
            # daemon (the BrokenPipeError would otherwise discard it)
            stopping = (
                (resp.get("op") == "shutdown" and resp.get("ok"))
                or lifecycle["stop"]
            )
            try:
                fout.write(json.dumps(resp) + "\n")
                fout.flush()
                served += 1
            except OSError:
                if not stopping:
                    raise  # client vanished mid-reply; conversation logs it
            if stopping:
                return served, True
        return served, False

    def serve_transport():
        if not getattr(args, "listen", ""):
            n, _ = serve_lines(inp, out)
            return n

        # socket mode: clients connect and disconnect freely;
        # {"op": "shutdown"} from any client stops the DAEMON. TCP binds
        # are for trusted networks (no auth on the protocol); unix:PATH
        # scopes by filesystem perms.
        if args.listen.startswith("unix:"):
            path = args.listen[5:]
            try:
                os.unlink(path)
            except OSError:
                pass
            srv = socklib.socket(socklib.AF_UNIX)
            srv.bind(path)
            bound = args.listen
        else:
            host, _, port = args.listen.rpartition(":")
            srv = socklib.socket(socklib.AF_INET)
            srv.setsockopt(socklib.SOL_SOCKET, socklib.SO_REUSEADDR, 1)
            srv.bind((host or "127.0.0.1", int(port)))
            bound = "%s:%d" % srv.getsockname()[:2]  # resolves port 0
        srv.listen(16)
        lifecycle["srv"] = srv
        print(f"listening on {bound}", file=sys.stderr, flush=True)
        n_req = [0]
        threads = []

        def conversation(conn):
            # one thread per connected client: an idle client must not
            # block other clients' requests (index state serializes on
            # lifecycle["handle"] inside handle(); clip description
            # coalesces across clients into shared device dispatches)
            stopped = False
            with conn:
                try:
                    served, stopped = serve_lines(
                        conn.makefile("r", encoding="utf-8"),
                        conn.makefile("w", encoding="utf-8"),
                    )
                    with lifecycle["lock"]:
                        n_req[0] += served
                except OSError as e:  # client vanished mid-reply
                    print(f"client dropped: {e}", file=sys.stderr)
                finally:
                    with lifecycle["lock"]:
                        lifecycle["conns"].discard(conn)
            if stopped and not lifecycle["stop"]:
                _stop_everything("shutdown op")  # from any client

        try:
            while not lifecycle["stop"]:
                try:
                    conn, _peer = srv.accept()
                except OSError:
                    if lifecycle["stop"]:  # _stop_everything aborted accept
                        break
                    raise
                with lifecycle["lock"]:
                    lifecycle["conns"].add(conn)
                if lifecycle["stop"]:
                    # raced _stop_everything's conns snapshot: deliver the
                    # EOF it would have sent, or this reader blocks forever
                    try:
                        conn.shutdown(socklib.SHUT_RD)
                    except OSError:
                        pass
                t = threading.Thread(target=conversation, args=(conn,),
                                     daemon=True)
                t.start()
                # reap finished conversations so a long-lived daemon's
                # thread list doesn't grow with every connect/disconnect
                threads[:] = [x for x in threads if x.is_alive()]
                threads.append(t)
            for t in threads:  # in-flight requests finish; readers got EOF
                t.join()
        finally:
            srv.close()
            if args.listen.startswith("unix:"):
                try:
                    os.unlink(args.listen[5:])
                except OSError:
                    pass
        return n_req[0]

    try:
        return serve_transport()
    finally:
        for sig, handler in prev_handlers.items():
            signal.signal(sig, handler)
        # unblock the signal waiter (os.read returns b"" on writer close).
        # The read end is deliberately NOT closed: the waiter may still be
        # blocked on it, and closing an fd under a blocked reader leaves
        # the read hanging while the fd number gets reused. One fd per
        # serve() lifetime.
        try:
            os.close(_sig_w)
        except OSError:
            pass


def build_parser():
    from ..config import ExperimentConfig

    cfg = ExperimentConfig()
    parser = argparse.ArgumentParser(description="GRL-TPU descriptor extraction / retrieval")
    sub = parser.add_subparsers(dest="command", required=True)

    f = sub.add_parser("features", help="extract tracklet descriptors to .npz")
    f.add_argument("-d", "--dataset", type=str, default=cfg.data.dataset,
                   choices=["ilidsvidsequence", "prid2011sequence", "mars", "duke", "synthetic"])
    f.add_argument("--data-dir", type=str, default="")
    f.add_argument("--split", type=str, default="gallery", choices=["query", "gallery"])
    f.add_argument("--split-id", type=int, default=0, dest="split_id")
    f.add_argument("--seq_len", type=int, default=cfg.data.seq_len)
    f.add_argument("--seq_srd", type=int, default=cfg.data.seq_srd)
    f.add_argument("-j", "--workers", type=int, default=cfg.data.workers)
    f.add_argument("--logs-dir", type=str, default="log/grl")
    f.add_argument("--checkpoint", type=str, default="",
                   help="explicit checkpoint (default: logs-dir/checkpoint_best.npz)")
    f.add_argument("-o", "--out", type=str, required=True)
    f.add_argument("--micro-batch", type=int, default=cfg.eval.micro_batch)
    f.add_argument("--rrs", action="store_true",
                   help="one RRS clip per tracklet instead of dense (faster, lossier)")
    f.add_argument("--arch1", type=str, default=cfg.model.arch1)
    f.add_argument("--arch2", type=str, default=cfg.model.arch2)
    f.add_argument("--features", type=int, default=cfg.model.features)
    f.add_argument("--bf16", action="store_true")
    f.add_argument("--tiny", action="store_true")
    f.add_argument("--use-flow", action="store_true",
                   help="sequence datasets only: extract from a flow-trained "
                        "checkpoint on 6-channel (RGB|flow) clips")
    f.add_argument("--seed", type=int, default=cfg.seed)
    f.add_argument("--synthetic-ids", type=int, default=0,
                   help="-d synthetic: must match the value the checkpoint "
                        "was trained with (regenerates the same catalog)")
    f.add_argument("--devices", type=int, default=0)

    r = sub.add_parser("rank", help="rank queries against a gallery index")
    r.add_argument("--query", type=str, required=True)
    r.add_argument("--gallery", type=str, required=True)
    r.add_argument("--topk", type=int, default=10)
    r.add_argument("--rerank", action="store_true")
    r.add_argument("-o", "--out", type=str, required=True)

    e = sub.add_parser(
        "export-model",
        help="serialize the descriptor program (weights baked in) as a "
             "jax.export artifact runnable with only jax installed",
    )
    e.add_argument("--logs-dir", type=str, default="log/grl")
    e.add_argument("--checkpoint", type=str, default="",
                   help="explicit checkpoint (default: logs-dir/checkpoint_best.npz)")
    e.add_argument("--num-classes", type=int, default=625,
                   help="train-id count baked into the checkpoint's OIM "
                        "tables (MARS: 625 — printed in the dataset stats "
                        "banner at train time); a wrong value fails the "
                        "checkpoint load with a shape mismatch")
    e.add_argument("--batch", type=int, default=cfg.eval.micro_batch,
                   help="fixed clip batch the program is exported at "
                        "(describe pads the final chunk)")
    e.add_argument("--seq_len", type=int, default=cfg.data.seq_len)
    e.add_argument("--height", type=int, default=cfg.data.height)
    e.add_argument("--width", type=int, default=cfg.data.width)
    e.add_argument("--platforms", type=str, default="",
                   help="comma-separated lowering targets, e.g. 'tpu' or "
                        "'cpu,tpu' (default: the current backend)")
    e.add_argument("--arch1", type=str, default=cfg.model.arch1)
    e.add_argument("--arch2", type=str, default=cfg.model.arch2)
    e.add_argument("--bf16", action="store_true")
    e.add_argument("--tiny", action="store_true")
    e.add_argument("--use-flow", action="store_true")
    e.add_argument("--seed", type=int, default=cfg.seed)
    e.add_argument("-o", "--out", type=str, required=True)

    d = sub.add_parser(
        "describe",
        help="run a clips .npz through an export-model artifact "
             "(needs only jax — no model code, no checkpoint)",
    )
    d.add_argument("--model", type=str, required=True)
    d.add_argument("--clips", type=str, required=True,
                   help=".npz with 'clips' (n, seq_len, h, w, c) uint8 "
                        "(+ optional pids/camids, passed through)")
    d.add_argument("-o", "--out", type=str, required=True)

    s = sub.add_parser(
        "serve",
        help="persistent descriptor/retrieval daemon over an export-model "
             "artifact: JSON-lines requests on stdin, responses on stdout",
    )
    s.add_argument("--model", type=str, required=True,
                   help="export-model artifact (.npz)")
    s.add_argument("--gallery", type=str, default="",
                   help="gallery index .npz (features/pids/camids, e.g. from "
                        "'features' or 'describe') enabling the rank op; "
                        "held device-resident for the session")
    s.add_argument("--topk", type=int, default=10,
                   help="max matches per rank query (the on-device top-k "
                        "is compiled at this width; requests may ask less)")
    s.add_argument("--capacity", type=int, default=0,
                   help="index capacity for add-op enrollment (device "
                        "buffer is padded to this once, so growth never "
                        "recompiles); 0 = frozen at the --gallery size; "
                        "with no --gallery, starts an empty index")
    s.add_argument("--rerank-queries", type=int, default=16,
                   dest="rerank_queries",
                   help="max queries per rerank request (the k-reciprocal "
                        "program is compiled once at this width; larger "
                        "requests are rejected so serving never stalls on "
                        "a recompile)")
    s.add_argument("--warmup", action="store_true",
                   help="pre-compile every serving program (describe, "
                        "rank, enrollment, rerank) before accepting "
                        "requests — first-request compiles otherwise cost "
                        "minutes at full model size")
    s.add_argument("--devices", type=int, default=1,
                   help="row-shard the n^2 rerank set algebra over up to "
                        "this many local devices (forces the staged "
                        "builder; the headroom path past the single-chip "
                        "HBM ceiling at very large --capacity). Descriptor "
                        "extraction stays on one device (the AOT artifact "
                        "is a single-device program)")
    s.add_argument("--listen", type=str, default="",
                   help="serve over a socket instead of stdin/stdout: "
                        "'host:port' (port 0 picks one; the bound address "
                        "prints to stderr) or 'unix:/path'. Clients "
                        "connect/disconnect freely and are served "
                        "concurrently (device work serialized); a "
                        "shutdown op from any client, or SIGTERM/SIGINT, "
                        "stops the daemon cleanly. TRUST MODEL: the "
                        "protocol has no auth and file-path operands read "
                        "the daemon's filesystem — bind TCP only on "
                        "trusted networks; unix:PATH scopes by filesystem "
                        "permissions")
    s.add_argument("--max-request-mb", type=float, default=256.0,
                   dest="max_request_mb",
                   help="hard cap on one request line (MB). Inline "
                        "operands ride base64-npz on the line, so this "
                        "bounds daemon memory per request; an oversize "
                        "line is drained in bounded chunks and answered "
                        "{\"ok\": false} with the connection kept alive. "
                        "Larger operands should go via file paths")
    return parser


def main(args):
    from ..parallel import maybe_initialize_distributed
    from ..utils.profiling import enable_compilation_cache

    if args.command == "rank":
        # rank needs the persistent cache MOST: --rerank past n=16384
        # compiles the six n^2-scale staged programs (~minutes cold,
        # docs/PERFORMANCE.md), and serving invocations are one-shot
        # processes
        enable_compilation_cache()
        return rank(args)
    if args.command == "export-model":
        return export_model(args)
    if args.command == "describe":
        enable_compilation_cache()  # the deserialized call compiles once
        return describe_with_export(args)
    if args.command == "serve":
        enable_compilation_cache()  # first request compiles the artifact
        return serve(args)
    maybe_initialize_distributed()  # must precede any backend init
    enable_compilation_cache()
    return extract_split(args)


def cli():
    """Console-script entry point (pyproject [project.scripts]).

    Swallows main()'s python-API return value: the pip wrapper runs
    ``sys.exit(cli())``, and sys.exit treats any non-None, non-int value
    (a float top1, a results list) as failure with the repr on stderr."""
    main(build_parser().parse_args())


if __name__ == "__main__":
    cli()
