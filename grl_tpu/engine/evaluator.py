"""Retrieval evaluator: descriptor extraction + cosine ranking + CMC/mAP.

Reproduces ATTEvaluator (reference reid/evaluator/attevaluator.py:49-163):

- descriptor per clip = concat(x_uncorr, attention-pooled x_corr, temporal
  mean of x_corr) -> 3*C dims (6144 for ResNet-50, attevaluator.py:79-80);
- dense path: every consecutive clip of a tracklet is described and the
  descriptors averaged (micro-batched by 8, attevaluator.py:72-87);
- rrs_test path: one RRS clip per tracklet, batch 30;
- gallery := query ∪ gallery (attevaluator.py:143-145), cosine distance
  ``-qf @ gfᵀ`` (:44-46), optional k-reciprocal re-ranking, MARS-protocol
  CMC/mAP report.

TPU-first: the descriptor function is one jitted program at a fixed
micro-batch shape (padded + masked, so ragged dense tracklets never force
recompilation); the distance matrix is a single device matmul that pjit
shards over gallery columns on a mesh.
"""

from __future__ import annotations

import math
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..data.transforms import normalize
from . import metrics
from .rerank import re_ranking as _re_ranking


def cosine_distance(qf, gf):
    """Negative cosine similarity (features are L2-normalized)."""
    return -jnp.dot(qf, gf.T, preferred_element_type=jnp.float32)


# module-level jits (per-call definitions recompile every step — CLAUDE.md).
# These keep descriptor accumulation device-resident: the only host pulls in
# the whole eval are the CMC/mAP scalars.


def make_descriptor_fn(cnn, siamese):
    """The 6144-d descriptor recipe (reference attevaluator.py:77-80):
    normalize -> CNN -> attention-pooled corr -> concat[x_uncorr, pooled,
    mean-over-t corr]. The SINGLE source of truth for this parity-critical
    math — used by the Evaluator's jitted descriptor AND the AOT serving
    export (cli/extract.py export-model); CI pins the two equal."""

    def describe(cnn_params, cnn_state, sia_params, sia_state, clips_u8):
        clips = normalize(clips_u8)
        (x_uncorr, x_corr), _ = cnn.apply(cnn_params, cnn_state, clips, training=False)
        pooled, _ = siamese.self_attention(sia_params, sia_state, x_corr, training=False)
        return jnp.concatenate([x_uncorr, pooled, jnp.mean(x_corr, axis=1)], axis=1)

    return describe


@partial(jax.jit, donate_argnums=0)
def _write_rows(buf, rows, offset):
    """Write ``rows`` into the donated feature buffer at row ``offset``.

    ``offset`` is a traced scalar so every tracklet reuses one compiled
    program; the buffer is oversized by one bucket so a final padded chunk
    can spill into scratch rows that are trimmed afterwards.
    """
    return jax.lax.dynamic_update_slice(buf, rows, (offset, 0))


@partial(jax.jit, donate_argnums=0)
def _scatter_add_rows(buf, rows, ids):
    """Segment-accumulate descriptor rows into per-tracklet sums.

    The dense path packs clips from MANY tracklets into each full
    micro-batch (real MARS tracklets yield ~8 clips; per-tracklet calls
    padded 8 -> 32 wasted ~75% of the MXU work) and scatter-adds each
    clip's descriptor into its tracklet's row; padding rows carry a
    scratch id one past the last real row.
    """
    return buf.at[ids].add(rows)


def print_protocol(cmc_curve, mAP, cmc_topk=(1, 5, 10, 20)):
    """Reference-format CMC/mAP console block (test_all.py output). Shared
    by the live evaluation and the --visual-from distmat replay so the two
    paths cannot drift in format."""
    print("Mean AP: {:4.1%}".format(mAP))
    for r in cmc_topk:
        if r <= len(cmc_curve):
            print("Rank-{:<3}: {:.1%}".format(r, cmc_curve[r - 1]))


def eval_items(query_loader, gallery_loader):
    """Ranked-strip item lists. Gallery items = query ∪ gallery, matching
    the distmat columns (the reference evaluates against the union,
    attevaluator.py:125-163). Shared by --visual and --visual-from."""
    q_items = list(query_loader.dataset.tracklets)
    return q_items, q_items + list(gallery_loader.dataset.tracklets)


class Evaluator:
    def __init__(
        self, cnn, siamese, only_eval=False, micro_batch=64, rerank=False, visual_dir=None,
        mesh=None, rerank_k1=20, rerank_k2=6, rerank_lambda=0.3, save_distmat=None,
    ):
        self.cnn = cnn
        self.siamese = siamese
        self.only_eval = only_eval
        self.rerank = rerank
        self.rerank_k1 = rerank_k1
        self.rerank_k2 = rerank_k2
        self.rerank_lambda = rerank_lambda
        self.visual_dir = visual_dir  # save ranked-result strips (test_all.py --visual)
        # npz path: persist the final (post-rerank) distance matrix +
        # pids/camids so ranked strips can be re-rendered and the protocol
        # re-run without re-extracting (the dist.mat round-trip the
        # reference's --visual intends, attevaluator.py:130-135, but whose
        # writer it never shipped)
        self.save_distmat = save_distmat
        self.mesh = mesh  # multi-chip: clips sharded over the batch axis
        if mesh is not None:
            ndev = mesh.shape[mesh.axis_names[0]]
            micro_batch = -(-micro_batch // ndev) * ndev  # divisible by mesh
        self.micro_batch = micro_batch
        self._descriptor_fn = None

    # -- descriptor ------------------------------------------------------

    def _build_descriptor(self):
        from ..utils.profiling import descriptor_compiler_options

        return jax.jit(
            make_descriptor_fn(self.cnn, self.siamese),
            compiler_options=descriptor_compiler_options(),
        )

    def _bucket(self, size):
        """Smallest jit bucket (micro_batch, its half, or its third)
        covering ``size``: a 30-clip rrs_test batch pads to 32 (96/3)
        instead of burning most of a 96-wide descriptor call on zeros. At
        most two shapes actually compile per run (full chunks use
        micro_batch; only the final partial chunk picks a sub-bucket)."""
        mb = self.micro_batch
        ndev = (self.mesh.shape[self.mesh.axis_names[0]]
                if self.mesh is not None else 1)
        for denom in (3, 2):
            b = -(-(mb // denom) // ndev) * ndev
            if 0 < size <= b:
                return b
        return mb

    def describe_clips(self, params, state, clips_u8):
        """(n, S, h, w, 3) uint8 -> list of ((bucket, 3C) device array,
        valid row count) descriptor chunks. Chunks stay on device."""
        if self._descriptor_fn is None:
            self._descriptor_fn = self._build_descriptor()
        n = clips_u8.shape[0]
        mb = self.micro_batch
        outs = []
        for i in range(0, n, mb):
            chunk = clips_u8[i : i + mb]
            size = chunk.shape[0]
            bucket = self._bucket(size)
            pad = bucket - size
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            chunk = jnp.asarray(chunk)
            if self.mesh is not None:
                # pure data-parallel extraction: clips shard over the batch
                # axis, the jitted descriptor auto-partitions (no collectives)
                from jax.sharding import NamedSharding, PartitionSpec as P

                chunk = jax.device_put(
                    chunk, NamedSharding(self.mesh, P(self.mesh.axis_names[0]))
                )
            d = self._descriptor_fn(
                params["cnn"], state["cnn"], params["siamese"], state["siamese"], chunk
            )
            outs.append((d, size))
        return outs

    def _new_buffer(self, rows_shape, dtype, n_rows):
        buf = jnp.zeros((n_rows,) + rows_shape, dtype)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            buf = jax.device_put(buf, NamedSharding(self.mesh, P()))
        return buf

    def extract_features(self, params, state, loader):
        """Loader -> (features (N, 3C) DEVICE array, pids, camids); dense
        tracklets are clip-averaged (attevaluator.py:84,95).

        Features accumulate into a preallocated device buffer — they never
        round-trip the host (at MARS scale that round-trip was ~556 MB over
        a 20-35 MB/s tunnel). The dense path packs clips from many
        tracklets into every micro-batch (one compiled descriptor shape,
        zero padding waste except the final flush) and segment-adds each
        clip's descriptor into its tracklet's sum; the rrs path writes rows
        at a running offset.
        """
        n_items = len(loader.dataset)
        pids, camids = [], []
        if loader.dataset.sample == "dense":
            feats = self._extract_dense(params, state, loader, n_items, pids, camids)
        else:
            feats = self._extract_rows(params, state, loader, n_items, pids, camids)
        return feats, np.asarray(pids), np.asarray(camids)

    def _extract_rows(self, params, state, loader, n_items, pids, camids):
        buf = None
        offset = 0
        for clips, pid, camid in loader:
            for rows, size in self.describe_clips(params, state, clips):
                if buf is None:
                    # oversized by one bucket so padded tail chunks can
                    # spill into scratch rows (trimmed below)
                    buf = self._new_buffer(rows.shape[1:], rows.dtype, n_items + rows.shape[0])
                buf = _write_rows(buf, rows, np.int32(offset))
                offset += size
            pids.extend(np.atleast_1d(pid).tolist())
            camids.extend(np.atleast_1d(camid).tolist())
        assert offset == n_items, f"extracted {offset} rows, expected {n_items}"
        return buf[:n_items]

    def _extract_dense(self, params, state, loader, n_items, pids, camids):
        if self._descriptor_fn is None:
            self._descriptor_fn = self._build_descriptor()
        mb = self.micro_batch
        buf = None
        counts = np.zeros(n_items, np.float32)
        pend_clips, pend_ids, pending = [], [], 0
        item = 0

        def flush(clips_np, ids_np):
            nonlocal buf
            chunk = jnp.asarray(clips_np)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                chunk = jax.device_put(
                    chunk, NamedSharding(self.mesh, P(self.mesh.axis_names[0]))
                )
            d = self._descriptor_fn(
                params["cnn"], state["cnn"], params["siamese"], state["siamese"], chunk
            )
            if buf is None:
                # one scratch row (id = n_items) absorbs the padding clips
                buf = self._new_buffer(d.shape[1:], d.dtype, n_items + 1)
            buf = _scatter_add_rows(buf, d, jnp.asarray(ids_np))

        for clips, pid, camid in loader:
            n_clips = clips.shape[0]
            counts[item] = n_clips
            pend_clips.append(clips)
            pend_ids.append(np.full(n_clips, item, np.int32))
            pending += n_clips
            pids.extend(np.atleast_1d(pid).tolist())
            camids.extend(np.atleast_1d(camid).tolist())
            item += 1
            while pending >= mb:
                clips_np = np.concatenate(pend_clips)
                ids_np = np.concatenate(pend_ids)
                flush(clips_np[:mb], ids_np[:mb])
                pend_clips, pend_ids = [clips_np[mb:]], [ids_np[mb:]]
                pending -= mb
        if pending:
            clips_np = np.concatenate(pend_clips)
            ids_np = np.concatenate(pend_ids)
            pad = mb - pending
            clips_np = np.concatenate(
                [clips_np, np.zeros((pad,) + clips_np.shape[1:], clips_np.dtype)]
            )
            ids_np = np.concatenate([ids_np, np.full(pad, n_items, np.int32)])
            flush(clips_np, ids_np)
        assert item == n_items, f"extracted {item} tracklets, expected {n_items}"
        return buf[:n_items] / jnp.asarray(counts)[:, None]

    # -- full protocol ---------------------------------------------------

    def evaluate(self, params, state, query_loader, gallery_loader, cmc_topk=(1, 5, 10, 20),
                 multihost=None):
        """Full retrieval protocol.

        ``multihost``: optional ``{"query": (n_total, pids, camids),
        "gallery": (n_total, pids, camids)}`` built from the FULL
        catalogs. The loaders must then hold THIS process's contiguous
        stripe (``parallel.stripe_catalog``): every host extracts only
        its stripe and the per-process feature blocks assemble into
        globally-sharded arrays (``parallel.gather_striped_rows``) — the
        distance matmul, protocol, and re-ranking below then run SPMD
        over the whole pod. Requires ``mesh``.
        """
        if multihost is not None and self.mesh is None:
            raise ValueError("multihost evaluation requires a device mesh")
        t0 = time.time()

        def fetch(loader, split):
            if multihost is None:
                feats, pids, camids = self.extract_features(params, state, loader)
                return feats, np.asarray(pids), np.asarray(camids)
            # multi-host: extraction is process-LOCAL (each host's stripe
            # clips exist only on that host — a global-mesh device_put
            # would demand identical data everywhere), data-parallel over
            # this host's devices; only the assembled feature blocks form
            # a global array, sharded so each host's rows stay on its own
            # chips.
            from jax.sharding import Mesh

            from ..parallel import gather_striped_rows

            global_mesh = self.mesh
            axis = global_mesh.axis_names[0]
            self.mesh = Mesh(np.asarray(jax.local_devices()), (axis,))
            try:
                feats, _pids, _camids = self.extract_features(params, state, loader)
                feats = np.asarray(feats)
            finally:
                self.mesh = global_mesh
            n_total, pids, camids = multihost[split]
            feats = gather_striped_rows(feats, n_total, self.mesh, axis=axis)
            return feats, np.asarray(pids), np.asarray(camids)

        qf, q_pids, q_camids = fetch(query_loader, "query")
        print(f"Done, obtained {qf.shape[0]}-by-{qf.shape[1]} matrix")
        gf, g_pids, g_camids = fetch(gallery_loader, "gallery")
        # gallery includes the queries (attevaluator.py:143-145); the concat
        # happens on device — features never visit the host
        gf = jnp.concatenate([qf, gf], axis=0)
        g_pids = np.append(q_pids, g_pids)
        g_camids = np.append(q_camids, g_camids)
        print(f"Done, obtained {gf.shape[0]}-by-{gf.shape[1]} matrix")

        print("Computing distance matrix")
        # Pallas min-plus is a TPU kernel: device re-ranking only on tpu
        # backends; anything else (cpu, gpu) takes the host numpy path.
        on_tpu = jax.default_backend() == "tpu"
        qf_d, gf_d = qf, gf
        distmat = cosine_distance(qf_d, gf_d)
        if self.rerank:
            print("Applying person re-ranking ...")
            from .rerank import warn_if_degenerate

            warn_if_degenerate(qf.shape[0] + gf.shape[0], self.rerank_k1, self.rerank_k2)
            if on_tpu or multihost is not None:
                # On-device set algebra + Pallas Jaccard min-sum. The n^2
                # distance matrices never leave the chip — only features go
                # up; ranking below also runs on device. Drop EVERY
                # reference first, features AND distances: XLA cannot
                # donate the three differently-shaped distance matrices
                # into the staged builder's concat, so they (and the
                # ~860 MB of fp32 features) only free once no python frame
                # references them — hence the box hand-over below, which
                # re_ranking_device empties on entry. At LS-VID scale the
                # staged re-ranking runs at the HBM capacity cliff and
                # keeping any of these alive OOMs reduced-ceiling sessions.
                from .rerank import re_ranking_device

                box = [distmat, _euclidean(qf_d, qf_d), _euclidean(gf_d, gf_d)]
                del qf_d, gf_d
                qf = gf = distmat = None  # boxed refs are the only ones left
                # multihost off-TPU (the 2-process CPU test rig): the host
                # algorithm cannot pull a cross-process distance matrix, so
                # the device path runs with the Pallas kernel interpreted
                distmat = re_ranking_device(
                    inputs_box=box,
                    k1=self.rerank_k1, k2=self.rerank_k2,
                    lambda_value=self.rerank_lambda, mesh=self.mesh,
                    interpret=not on_tpu,
                )
            else:
                qq = np.asarray(_euclidean(qf_d, qf_d))
                gg = np.asarray(_euclidean(gf_d, gf_d))
                distmat = _re_ranking(
                    np.asarray(distmat), qq, gg,
                    k1=self.rerank_k1, k2=self.rerank_k2,
                    lambda_value=self.rerank_lambda,
                )

        if self.save_distmat:
            if multihost is not None:
                print("--save-distmat skipped under multi-host (the "
                      "distance matrix spans non-addressable devices); "
                      "re-run single-host to save it")
            else:
                np.savez(self.save_distmat, distmat=np.asarray(distmat),
                         q_pids=q_pids, q_camids=q_camids,
                         g_pids=g_pids, g_camids=g_camids,
                         rerank=np.bool_(self.rerank))
                print(f"saved distance matrix to {self.save_distmat}")

        if on_tpu or self.mesh is not None:
            # device protocol: only the CMC curve + mAP scalars come back
            cmc_curve, mAP = metrics.evaluate_device(
                distmat, q_pids, g_pids, q_camids, g_camids, mesh=self.mesh
            )
        else:
            cmc_curve, mAP = metrics.evaluate(
                np.asarray(distmat), q_pids, g_pids, q_camids, g_camids
            )
        print_protocol(cmc_curve, mAP, cmc_topk)
        print("------------------")

        if self.visual_dir and multihost is not None:
            print("visualizations skipped under multi-host (the distance "
                  "matrix spans non-addressable devices and each host holds "
                  "only its catalog stripe); re-run single-host for --visual")
        if self.visual_dir and multihost is None:
            # ranked-result strips (reference attevaluator.py:130-135 +
            # evaluator/visualize.py). Skipped under multihost: the
            # distmat spans non-addressable devices and the loaders hold
            # only this host's stripe — render from a single-host run.
            from .visualize import visualize_ranked_results

            q_items, g_items = eval_items(query_loader, gallery_loader)
            visualize_ranked_results(np.asarray(distmat), q_items, g_items, self.visual_dir)
            print(f"saved ranked visualizations to {self.visual_dir}")

        print(f"(evaluation took {time.time() - t0:.1f}s)")
        return float(cmc_curve[0])


@jax.jit
def _euclidean(a, b):
    """Pairwise euclidean for the re-ranking inputs.

    Deliberately NOT losses.triplet.euclidean_cdist: that one adds the
    eps INSIDE the sqrt to mirror the reference's TripletLoss.cdist
    (torch-oracle-pinned), while this clamps the squared distance — the
    form the device/numpy re-ranking equivalence tests pin to 3e-7.
    Keep the two parities separate. Module-level jit: eagerly this chain
    materializes several unfused n^2 temporaries (4.4 GB EACH at LS-VID's
    33k gallery); fused, the peak is the output plus one dot temp."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    sq = (
        jnp.sum(a * a, axis=1)[:, None]
        - 2.0 * jnp.dot(a, b.T, preferred_element_type=jnp.float32)
        + jnp.sum(b * b, axis=1)[None, :]
    )
    return jnp.sqrt(jnp.maximum(sq, 1e-12))
