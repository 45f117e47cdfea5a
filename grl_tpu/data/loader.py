"""Host-side clip pipeline: decode -> resize -> batch, with prefetch.

Replaces torch ``DataLoader`` + worker processes (reference
reid/data/dataloader.py, video_loader.py) with a thread-pool decode stage
and a one-batch-ahead prefetch thread: JPEG decode and the RectScale resize
(seqtransforms.py:30-49) happen on host; all randomized augmentation runs
on-device (see transforms.augment), so batches leave here as uint8 —
4x less host->device traffic than the reference's normalized float tensors.

Tracklet frames may be path tuples (decoded via PIL) or uint8 arrays
(synthetic / pre-decoded), transparently.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from .sampling import (
    RandomPairSampler,
    dense_indices,
    random_window_indices,
    rrs_test_indices,
    rrs_train_indices,
)


def _decode_frame(source, index, height, width):
    if isinstance(source, np.ndarray):
        frame = source[index]
        if frame.shape[0] != height or frame.shape[1] != width:
            from PIL import Image

            frame = np.asarray(
                Image.fromarray(frame).resize((width, height), Image.BILINEAR)
            )
        return frame
    from .jpeg import decode_resize

    return decode_resize(source[index], height, width)


def _num_frames(source):
    return source.shape[0] if isinstance(source, np.ndarray) else len(source)


class ClipDataset:
    """Catalog + sampling mode -> per-index uint8 clip arrays.

    sample modes (reference video_loader.py:52-155): 'rrs_train',
    'rrs_test', 'dense', 'random'.

    ``flow_map`` (optional) maps a tracklet's frame source to its optical-
    flow companion (e.g. ``SequenceDataset.flow_paths_for``); when set,
    clips carry 6 channels — RGB + flow stacked on the channel axis, the
    TPU-native packing of the reference's two-modality item
    (seqpreprocessor.py:29-44 returns separate img/flow tensors).
    """

    def __init__(self, tracklets, seq_len=8, sample="rrs_train", height=256, width=128, seed=0,
                 flow_map=None):
        self.tracklets = tracklets
        self.seq_len = seq_len
        self.sample = sample
        self.height = height
        self.width = width
        self.seed = seed
        self.flow_map = flow_map

    def _frame(self, source, flow_source, index):
        frame = _decode_frame(source, index, self.height, self.width)
        if flow_source is not None:
            flow = _decode_frame(flow_source, index, self.height, self.width)
            frame = np.concatenate([frame, flow], axis=-1)
        return frame

    def __len__(self):
        return len(self.tracklets)

    def _item_rng(self, index, epoch):
        """Deterministic RNG per (seed, epoch, tracklet): the loader's
        thread pool calls get() concurrently, and draws from one shared
        RandomState would land on tracklets in scheduling order — frame
        sampling would differ between identically-seeded runs."""
        # splitmix64 over the packed (seed, epoch, index) triple: a linear
        # epoch*K + index mix collides whenever the catalog outgrows K (or
        # modularly at high epochs), correlating frame draws across epochs.
        x = (self.seed * (2**42) + epoch * (2**28) + index) & 0xFFFFFFFFFFFFFFFF
        x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        return np.random.RandomState((x ^ (x >> 31)) % (2**31 - 1))

    def get(self, index, epoch=0):
        source, pid, camid = self.tracklets[index]
        flow_source = self.flow_map(source) if self.flow_map is not None else None
        n = _num_frames(source)
        if self.sample == "rrs_train":
            idx = rrs_train_indices(n, self.seq_len, self._item_rng(index, epoch))
        elif self.sample == "rrs_test":
            idx = rrs_test_indices(n, self.seq_len)
        elif self.sample == "random":
            idx = random_window_indices(n, self.seq_len, self._item_rng(index, epoch))
        elif self.sample == "dense":
            grid = dense_indices(n, self.seq_len)
            clips = np.stack(
                [
                    np.stack([self._frame(source, flow_source, int(i)) for i in row])
                    for row in grid
                ]
            )
            return clips, pid, camid
        else:
            raise KeyError(f"Unknown sample method: {self.sample}")
        clip = np.stack([self._frame(source, flow_source, int(i)) for i in idx])
        return clip, pid, camid


class ClipLoader:
    """Batched iterator with threaded decode and one-batch prefetch.

    Yields ``(clips uint8 (b, S, h, w, 3), pids (b,), camids (b,))``;
    with ``sample='dense'`` batch_size must be 1 and clips are
    ``(n_clips, S, h, w, 3)``.
    """

    def __init__(
        self,
        dataset: ClipDataset,
        batch_size=16,
        sampler=None,
        shuffle=False,
        drop_last=False,
        workers=4,
        prefetch=2,
        seed=0,
        max_batches=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.workers = max(workers, 1)
        self.prefetch = prefetch
        self.rng = np.random.RandomState(seed)
        # multi-host: every process must run the SAME number of steps per
        # epoch (a host with a bigger catalog shard would dispatch extra
        # sharded train steps whose collectives block forever); the caller
        # caps all hosts to the smallest shard's step count
        self.max_batches = max_batches
        # epoch counter: salts the per-item sampling RNG so rrs_train
        # draws differ across epochs (one loader is iterated per epoch)
        self._epoch = 0
        if dataset.sample == "dense" and batch_size != 1:
            raise ValueError("dense sampling requires batch_size=1")

    def _indices(self):
        if self.sampler is not None:
            return list(iter(self.sampler))
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            self.rng.shuffle(idx)
        return idx

    def __len__(self):
        # len(sampler), never a materialized pass: list(iter(sampler))
        # would consume sampler RNG as a side effect of len(), silently
        # shifting every later epoch's batch composition
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        n = n // self.batch_size if self.drop_last else -(-n // self.batch_size)
        return n if self.max_batches is None else min(n, self.max_batches)

    def __iter__(self):
        indices = self._indices()
        epoch = self._epoch
        self._epoch += 1
        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        if self.max_batches is not None:
            batches = batches[: self.max_batches]

        q = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        err = []

        def produce():
            try:
                with ThreadPoolExecutor(max_workers=self.workers) as pool:
                    for batch in batches:
                        if stop.is_set():
                            break
                        items = list(
                            pool.map(lambda i: self.dataset.get(i, epoch), batch)
                        )
                        if self.dataset.sample == "dense":
                            clips = items[0][0]
                        else:
                            clips = np.stack([c for c, _, _ in items])
                        pids = np.asarray([p for _, p, _ in items], np.int32)
                        cams = np.asarray([c for _, _, c in items], np.int32)
                        q.put((clips, pids, cams))
            except BaseException as e:  # noqa: BLE001
                # a decode error must surface in the consumer, not leave it
                # blocked in q.get() forever with a dead producer
                err.append(e)
            finally:
                q.put(None)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
            if err:
                raise RuntimeError("ClipLoader producer failed") from err[0]
        finally:
            stop.set()
            # Keep draining until the producer thread has actually exited:
            # a single drain-until-Empty pass races with a producer blocked
            # in q.put re-filling the queue between checks.
            while thread.is_alive():
                try:
                    q.get(timeout=0.05)
                except queue.Empty:
                    pass
            thread.join()


def get_data(
    name,
    root=None,
    batch_size=16,
    seq_len=8,
    seq_srd=4,
    workers=4,
    only_eval=False,
    split_id=0,
    height=256,
    width=128,
    eval_batch=30,
    seed=0,
    dataset_kwargs=None,
    train_sample="rrs_train",
    process_shard=False,
    use_flow=False,
    eval_stripe=False,
):
    """Build (dataset, num_classes, train_loader, query_loader, gallery_loader)
    — the reference's get_data surface (reid/data/dataloader.py:12-81)."""
    from .catalogs import get_sequence

    kwargs = dict(dataset_kwargs or {})
    flow_map = None
    if name in ("ilidsvidsequence", "prid2011sequence"):
        dataset = get_sequence(name, root, split_id=split_id, seq_len=seq_len, seq_srd=seq_srd, **kwargs)
        train_list = dataset.trainval
        num_classes = dataset.num_trainval_ids
        if use_flow:
            # two-modality items: RGB + optical-flow companions, packed on
            # channels (reference seqpreprocessor.py:29-44)
            flow_map = dataset.flow_paths_for
    elif use_flow:
        raise ValueError(f"{name} has no optical-flow companions (sequence datasets only)")
    elif name == "synthetic":
        dataset = get_sequence(name, **kwargs)
        train_list = dataset.train
        num_classes = dataset.num_train_pids
        height, width = dataset.height, dataset.width
    else:
        dataset = get_sequence(name, root, **kwargs)
        train_list = dataset.train
        num_classes = dataset.num_train_pids

    if only_eval:
        train_loader = None
    else:
        if batch_size % 2 != 0:
            raise ValueError("train batch_size must be even (anchor/positive pairs)")
        max_batches = None
        if process_shard:
            # multi-host: this process decodes only its identity shard
            # (parallel/multihost.py); batch_size here is the LOCAL batch.
            # All hosts cap their epoch to the SMALLEST shard's step count
            # (computable locally — the greedy balance is deterministic):
            # otherwise hosts with bigger shards dispatch extra train steps
            # whose gradient psum waits on the exhausted hosts forever.
            from ..parallel import min_shard_size, shard_catalog

            max_batches = (2 * min_shard_size(train_list)) // batch_size
            if max_batches == 0:
                raise ValueError(
                    "multi-host: the smallest identity shard "
                    f"({min_shard_size(train_list)} tracklets) cannot fill one "
                    f"local batch of {batch_size} — every epoch would run zero "
                    "steps; use fewer hosts or a smaller per-host batch"
                )
            train_list = shard_catalog(train_list)
        train_set = ClipDataset(train_list, seq_len, train_sample, height, width, seed=seed,
                                flow_map=flow_map)
        train_loader = ClipLoader(
            train_set,
            batch_size=batch_size,
            sampler=RandomPairSampler(train_list, seed=seed),
            drop_last=True,
            workers=workers,
            max_batches=max_batches,
        )

    eval_sample = "dense" if only_eval else "rrs_test"
    eval_bs = 1 if only_eval else eval_batch
    query_list, gallery_list = dataset.query, dataset.gallery
    if eval_stripe:
        # multi-host evaluation: each process decodes only its contiguous
        # stripe of the eval catalogs (parallel.stripe_catalog); the
        # caller assembles the per-process feature blocks into global
        # arrays via Evaluator.evaluate(multihost=...)
        from ..parallel import stripe_catalog

        query_list, _, _ = stripe_catalog(query_list)
        gallery_list, _, _ = stripe_catalog(gallery_list)
    query_loader = ClipLoader(
        ClipDataset(query_list, seq_len, eval_sample, height, width, flow_map=flow_map),
        batch_size=eval_bs,
        workers=workers,
    )
    gallery_loader = ClipLoader(
        ClipDataset(gallery_list, seq_len, eval_sample, height, width, flow_map=flow_map),
        batch_size=eval_bs,
        workers=workers,
    )
    return dataset, num_classes, train_loader, query_loader, gallery_loader
