"""Input pipeline tests: RRS sampling semantics, pair sampler invariants,
loader batching, device transforms, MARS catalog parsing on a synthesized
metadata tree."""

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grl_tpu.data import ClipDataset, ClipLoader, get_data, sampling, transforms
from grl_tpu.data.catalogs import Mars, SyntheticVideoReID


# -- sampling ----------------------------------------------------------


def test_rrs_grid_short_tracklet():
    # num < S: pad with last frame, one frame per chunk (video_loader.py:38-42)
    grid = sampling.rrs_grid(3, 8)
    assert [g[0] for g in grid] == [0, 1, 2, 2, 2, 2, 2, 2]


def test_rrs_grid_long_tracklet():
    # num=27, S=8 -> inter_val=4, strip = 27 indices + 5 pads of frame 26
    # (video_loader.py:43-48)
    grid = sampling.rrs_grid(27, 8)
    assert len(grid) == 8 and all(len(g) == 4 for g in grid)
    assert grid[0] == [0, 1, 2, 3]
    assert grid[6] == [24, 25, 26, 26]
    assert grid[7] == [26, 26, 26, 26]


def test_rrs_test_takes_chunk_heads():
    idx = sampling.rrs_test_indices(27, 8)
    np.testing.assert_array_equal(idx, [0, 4, 8, 12, 16, 20, 24, 26])


def test_dense_indices_cyclic_padding():
    # 26 frames, S=8: [0..7], [8..15], [16..23], [24,25,24,25,...]
    clips = sampling.dense_indices(26, 8)
    assert clips.shape == (4, 8)
    np.testing.assert_array_equal(clips[3], [24, 25, 24, 25, 24, 25, 24, 25])


def test_dense_indices_exact_multiple():
    clips = sampling.dense_indices(16, 8)
    # reference keeps the last window as the cyclic remainder even when the
    # tracklet divides evenly (while guard is strict >)
    assert clips.shape == (2, 8)
    np.testing.assert_array_equal(clips[0], np.arange(8))


def test_pair_sampler_interleaves_same_pid():
    ds = [(None, pid, cam) for pid in range(4) for cam in range(2)]
    s = sampling.RandomPairSampler(ds, seed=0)
    idx = list(iter(s))
    assert len(idx) == 2 * len(ds)
    for a, p in zip(idx[0::2], idx[1::2]):
        assert ds[a][1] == ds[p][1]  # same pid
        if len({c for _, pid2, c in ds if pid2 == ds[a][1]}) > 1:
            assert ds[a][2] != ds[p][2]  # different camera when possible


def test_pair_sampler_single_tracklet_pid():
    ds = [(None, 0, 0)]
    s = sampling.RandomPairSampler(ds, seed=1)
    assert list(iter(s)) == [0, 0]


def test_random_identity_sampler_k_instances_per_pid():
    """Intended N-id x K-instance semantics (the reference's own
    RandomIdentitySampler, sampler.py:31-42, indexes pids[i] with a
    tracklet-range permutation and crashes whenever tracklets > pids —
    dead code there; implemented as intended here)."""
    # pid 0 has 5 tracklets (sampled without replacement), pid 1 only 2
    # (sampled with replacement)
    ds = [(None, 0, c) for c in range(5)] + [(None, 1, c) for c in range(2)]
    s = sampling.RandomIdentitySampler(ds, num_instances=4, seed=0)
    idx = list(iter(s))
    assert len(idx) == len(s) == 2 * 4
    by_pid = [[ds[i][1] for i in idx[k : k + 4]] for k in (0, 4)]
    assert sorted(g[0] for g in by_pid) == [0, 1]
    for g in by_pid:
        assert len(set(g)) == 1  # each K-block is one identity
    pid0_block = idx[0:4] if by_pid[0][0] == 0 else idx[4:8]
    assert len(set(pid0_block)) == 4  # no replacement when enough tracklets


def test_loader_deterministic_under_threads_and_len():
    """Identically-seeded runs must produce identical batches regardless
    of decode-thread scheduling (frame sampling is keyed by (seed, epoch,
    tracklet), not a shared RandomState), and len(loader) must not burn
    sampler RNG (it used to materialize a full sampler pass)."""
    ds = synth()

    def run(extra_len_calls):
        cd = ClipDataset(ds.train, seq_len=4, sample="rrs_train",
                         height=32, width=16, seed=3)
        loader = ClipLoader(
            cd, batch_size=4,
            sampler=sampling.RandomPairSampler(ds.train, seed=1),
            drop_last=True, workers=4,
        )
        epochs = []
        for _ in range(2):
            for _ in range(extra_len_calls):
                len(loader)
            epochs.append([clips.copy() for clips, _, _ in loader])
        return epochs

    a, b = run(0), run(3)
    for ep_a, ep_b in zip(a, b):
        assert len(ep_a) == len(ep_b)
        for ca, cb in zip(ep_a, ep_b):
            np.testing.assert_array_equal(ca, cb)
    # rrs_train re-draws across epochs (epoch salt)
    assert any(
        not np.array_equal(x, y) for x, y in zip(a[0], a[1])
    ), "epoch 0 and 1 sampled identical frames — epoch salt not applied"


def test_clip_loader_propagates_producer_errors():
    """A decode failure in the producer thread must raise in the consumer,
    not leave it blocked in q.get() forever with a dead producer."""
    import pytest

    bad = [("/nonexistent/frame.jpg", 0, 0)]  # string source -> decode fails
    cd = ClipDataset(bad, seq_len=2, sample="rrs_train", height=32, width=16)
    loader = ClipLoader(cd, batch_size=1, workers=1)
    with pytest.raises(RuntimeError, match="producer failed"):
        list(iter(loader))


# -- loader ------------------------------------------------------------


def synth():
    return SyntheticVideoReID(num_train_ids=3, num_test_ids=2, tracklets_per_id=2,
                              height=32, width=16, seed=0)


def test_clip_loader_train_batches():
    ds = synth()
    cd = ClipDataset(ds.train, seq_len=4, sample="rrs_train", height=32, width=16)
    loader = ClipLoader(cd, batch_size=4, sampler=sampling.RandomPairSampler(ds.train, seed=0),
                        drop_last=True, workers=2)
    batches = list(loader)
    assert len(batches) == len(loader)
    clips, pids, cams = batches[0]
    assert clips.shape == (4, 4, 32, 16, 3) and clips.dtype == np.uint8
    # pair interleaving survives batching
    assert pids[0] == pids[1] and pids[2] == pids[3]


def test_clip_loader_early_exit_joins_producer():
    """Breaking out of the batch loop must not strand the producer thread
    (it can be blocked in q.put when the consumer leaves)."""
    import threading

    ds = synth()
    cd = ClipDataset(ds.train, seq_len=4, sample="rrs_train", height=32, width=16)
    loader = ClipLoader(cd, batch_size=2, workers=2, prefetch=1)
    before = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()  # GeneratorExit -> finally must join the producer
    assert threading.active_count() <= before


def test_clip_loader_dense():
    ds = synth()
    cd = ClipDataset(ds.query, seq_len=4, sample="dense", height=32, width=16)
    loader = ClipLoader(cd, batch_size=1)
    clips, pid, cam = next(iter(loader))
    n_frames = ds.query[0][0].shape[0]
    assert clips.ndim == 4 + 1 or clips.ndim == 5  # (n, S, h, w, 3)
    assert clips.shape[1:] == (4, 32, 16, 3)
    assert clips.shape[0] == len(sampling.dense_indices(n_frames, 4))


def test_get_data_synthetic_roundtrip():
    dataset, num_classes, train_loader, query_loader, gallery_loader = get_data(
        "synthetic", batch_size=4, seq_len=4, workers=2,
        dataset_kwargs=dict(num_train_ids=3, num_test_ids=2, height=32, width=16, seed=0),
    )
    assert num_classes == 3
    clips, pids, cams = next(iter(train_loader))
    assert clips.shape == (4, 4, 32, 16, 3)
    q = list(query_loader)
    assert len(q) == len(dataset.query) // 30 + (1 if len(dataset.query) % 30 else 0)


def test_get_data_rejects_odd_batch():
    with pytest.raises(ValueError):
        get_data("synthetic", batch_size=3, dataset_kwargs=dict(num_train_ids=2, num_test_ids=1))


# -- device transforms -------------------------------------------------


def test_normalize_matches_imagenet():
    x = jnp.full((1, 1, 2, 2, 3), 255, jnp.uint8)
    y = transforms.normalize(x)
    want = (1.0 - np.array(transforms.IMAGENET_MEAN)) / np.array(transforms.IMAGENET_STD)
    np.testing.assert_allclose(np.asarray(y)[0, 0, 0, 0], want, rtol=1e-5)


def test_random_flip_clip_consistent():
    rng = jax.random.PRNGKey(0)
    clips = jnp.arange(2 * 2 * 2 * 4 * 3, dtype=jnp.uint8).reshape(2, 2, 2, 4, 3)
    out = transforms.random_flip(rng, clips)
    for b in range(2):
        flipped = bool((out[b] == clips[b, :, :, ::-1]).all())
        identity = bool((out[b] == clips[b]).all())
        assert flipped or identity


def test_random_erase_only_touches_box():
    rng = jax.random.PRNGKey(3)
    clips = jnp.zeros((2, 2, 16, 8, 3), jnp.uint8)
    out = np.asarray(transforms.random_erase(rng, clips, p=1.0))
    # every frame gets exactly one solid-color rectangle
    for b in range(2):
        for t in range(2):
            changed = (out[b, t] != 0).any(-1)
            ys, xs = np.nonzero(changed)
            if len(ys) == 0:
                continue
            h = ys.max() - ys.min() + 1
            w = xs.max() - xs.min() + 1
            assert changed.sum() == h * w  # contiguous rectangle


def test_augment_shapes_and_dtype():
    rng = jax.random.PRNGKey(1)
    clips = jnp.zeros((2, 3, 16, 8, 3), jnp.uint8)
    out = transforms.augment(rng, clips, train=True)
    assert out.shape == clips.shape and out.dtype == jnp.float32
    out_eval = transforms.augment(rng, clips, train=False)
    np.testing.assert_allclose(
        np.asarray(out_eval),
        np.asarray(transforms.normalize(clips)),
        rtol=1e-6,  # jit vs eager fma differences
    )


# -- MARS catalog on synthesized metadata ------------------------------


def make_fake_mars(tmp_path):
    from scipy.io import savemat

    root = tmp_path / "MARS"
    info = root / "info"
    info.mkdir(parents=True)

    def names_for(split, spec):
        # spec: list of (pid, cam, num_frames); returns names + meta rows
        names, rows, start = [], [], 1
        for pid, cam, nf in spec:
            for f in range(nf):
                names.append(f"{pid:04d}C{cam}T0001F{f + 1:03d}.jpg")
            rows.append([start, start + nf - 1, pid, cam])
            start += nf
        return names, np.array(rows)

    train_spec = [(1, 1, 5), (1, 2, 4), (3, 1, 6), (3, 2, 3)]
    test_spec = [(7, 1, 4), (7, 2, 5), (9, 1, 3), (9, 2, 6), (-1, 1, 2)]
    train_names, train_rows = names_for("train", train_spec)
    test_names, test_rows = names_for("test", test_spec)

    (info / "train_name.txt").write_text("\n".join(train_names) + "\n")
    (info / "test_name.txt").write_text("\n".join(test_names) + "\n")
    savemat(info / "tracks_train_info.mat", {"track_train_info": train_rows})
    savemat(info / "tracks_test_info.mat", {"track_test_info": test_rows})
    # queries: first tracklet of pid 7 and pid 9 (1-based indices 1 and 3)
    savemat(info / "query_IDX.mat", {"query_IDX": np.array([[1, 3]])})
    return str(root)


def test_mars_catalog(tmp_path):
    root = make_fake_mars(tmp_path)
    ds = Mars(root, use_cache=True)
    assert ds.num_train_pids == 2
    assert len(ds.train) == 4
    # relabeled pids are 0-based contiguous
    assert sorted({pid for _, pid, _ in ds.train}) == [0, 1]
    # junk (-1) filtered from gallery, queries excluded positionally
    assert len(ds.query) == 2
    assert len(ds.gallery) == 2
    assert all(pid in (7, 9) for _, pid, _ in ds.query)
    # camids 0-based
    assert {cam for _, _, cam in ds.train} == {0, 1}
    # paths follow bbox_train/<pid4>/<name>
    p0 = ds.train[0][0][0]
    assert "bbox_train" in p0 and osp.basename(p0).startswith("0001")

    # cache round-trip gives identical catalogs
    ds2 = Mars(root, use_cache=True)
    assert ds2.train == ds.train and ds2.query == ds.query


def test_duke_catalog(tmp_path):
    """Duke directory-walk catalog: F-index frame ordering (frames are
    written in shuffled order), camid parsing for BOTH filename formats,
    relabeling, dense sub-tracklet slicing, JSON cache round-trip."""
    import sys as _sys

    _sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools"))
    from make_fake_duke import make_fake_duke

    from grl_tpu.data.catalogs import DukeMTMCVidReID

    root = make_fake_duke(str(tmp_path / "duke"), train_ids=3, test_ids=2,
                          frames_range=(8, 12), height=32, width=16)
    ds = DukeMTMCVidReID(root, verbose=False)
    assert ds.num_train_pids == 3
    assert len(ds.train) == 6  # one tracklet per (pid, cam)
    assert sorted({pid for _, pid, _ in ds.train}) == [0, 1, 2]  # relabeled
    # frames ordered by F-index despite shuffled write order
    for paths, _, cam in ds.train:
        import re

        idx = [int(re.search(r"F(\d{4})", osp.basename(p)).group(1)) for p in paths]
        assert idx == sorted(idx)
        # camid parsed from the first frame name (old or new format), 0-based
        assert cam in (0, 1)
    # both camids present (both filename formats parsed)
    assert {cam for _, _, cam in ds.train} == {0, 1}
    # query keeps original pids; every query pid has a cross-camera
    # gallery tracklet
    q_pids = {pid for _, pid, _ in ds.query}
    for _, pid, cam in ds.query:
        assert any(g_pid == pid and g_cam != cam for _, g_pid, g_cam in ds.gallery)
    assert q_pids == {pid for _, pid, _ in ds.gallery}
    # dense variant slices long tracklets into sampling_step chunks
    ds_dense = DukeMTMCVidReID(root, dense_sampling_step=4, use_cache=False, verbose=False)
    assert len(ds_dense.train_dense) > len(ds.train)
    for paths, _, _ in ds_dense.train_dense:
        assert len(paths) >= 4
    # cache round-trip
    ds2 = DukeMTMCVidReID(root, verbose=False)
    assert ds2.train == ds.train and ds2.query == ds.query


# -- two-stream (RGB + optical flow) path -------------------------------


def test_flow_clips_pack_six_channels(tmp_path):
    """ClipDataset(flow_map=...) stacks the flow companion on channels;
    both halves match their own decode."""
    from PIL import Image

    from grl_tpu.data.jpeg import decode_resize

    rng = np.random.RandomState(0)
    (tmp_path / "images").mkdir()
    (tmp_path / "others").mkdir()
    paths = []
    for i in range(5):
        p = tmp_path / "images" / f"f{i}.jpg"
        Image.fromarray(rng.randint(0, 255, (32, 16, 3), np.uint8)).save(p)
        Image.fromarray(rng.randint(0, 255, (32, 16, 3), np.uint8)).save(
            tmp_path / "others" / f"f{i}.jpg"
        )
        paths.append(str(p))

    def flow_map(img_paths):
        return tuple(p.replace("/images/", "/others/") for p in img_paths)

    cd = ClipDataset([(tuple(paths), 3, 1)], seq_len=2, sample="rrs_test",
                     height=32, width=16, flow_map=flow_map)
    clip, pid, cam = cd.get(0)
    assert clip.shape == (2, 32, 16, 6) and pid == 3
    np.testing.assert_array_equal(clip[0, ..., :3], decode_resize(paths[0], 32, 16))
    np.testing.assert_array_equal(
        clip[0, ..., 3:], decode_resize(flow_map(paths)[0], 32, 16)
    )
    # dense path carries flow too
    cd.sample = "dense"
    dense, _, _ = cd.get(0)
    assert dense.shape[-1] == 6


def test_normalize_tiles_stats_over_modalities():
    clips = (np.random.RandomState(1).rand(1, 2, 4, 4, 6) * 255).astype(np.uint8)
    out = np.asarray(transforms.normalize(jnp.asarray(clips)))
    ref3 = np.asarray(transforms.normalize(jnp.asarray(clips[..., :3])))
    np.testing.assert_allclose(out[..., :3], ref3, rtol=1e-6)
    np.testing.assert_allclose(
        out[..., 3:], np.asarray(transforms.normalize(jnp.asarray(clips[..., 3:]))), rtol=1e-6
    )


def test_two_stream_model_forward():
    """TwoStreamBaseline consumes (b,t,h,w,6) and yields per-frame
    embed/raw heads like ResNetBaseline."""
    import jax

    from grl_tpu import models

    m = models.two_stream_tiny(num_features=16)
    params, state = jax.jit(m.init)(jax.random.PRNGKey(0))
    clips = jnp.asarray(
        np.random.RandomState(2).rand(2, 3, 32, 16, 6).astype(np.float32)
    )
    (emb, raw), ns = jax.jit(lambda p, s, x: m.apply(p, s, x, training=True))(
        params, state, clips
    )
    assert emb.shape == (2, 3, 16)
    assert raw.shape == (2, 3, m.num_feat)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=-1), 1.0, rtol=1e-4
    )
    # factory registration
    assert "two_stream" in models.names()


def test_get_data_use_flow_rejected_for_mars():
    with np.testing.assert_raises(ValueError):
        get_data("synthetic", "", 4, 4, 4, 1, use_flow=True,
                 dataset_kwargs=dict(seed=0))
