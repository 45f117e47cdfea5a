"""iLIDS-VID / PRID-2011 catalog tests on a synthesized extracted layout."""

import json
import os.path as osp

import numpy as np
import pytest

from grl_tpu.data import get_data
from grl_tpu.data.catalogs import iLIDSVIDSequence


def make_layout(tmp_path, num_ids=6, frames_per_cam=12):
    root = tmp_path / "ilids"
    (root / "images").mkdir(parents=True)
    from PIL import Image

    identities = []
    for pid in range(num_ids):
        cams = []
        for cam in range(2):
            names = []
            for i in range(frames_per_cam):
                name = f"{pid:08d}_{cam:02d}_{i:04d}.jpg"
                img = (np.random.RandomState(pid * 100 + i).rand(64, 32, 3) * 255).astype(np.uint8)
                Image.fromarray(img).save(root / "images" / name)
                names.append(name)
            cams.append(names)
        identities.append(cams)

    (root / "meta.json").write_text(json.dumps({"identities": identities}))
    splits = [
        {
            "trainval": list(range(num_ids // 2)),
            "query": list(range(num_ids // 2, num_ids)),
            "gallery": list(range(num_ids // 2, num_ids)),
        }
    ]
    (root / "splits.json").write_text(json.dumps(splits))
    return str(root)


def test_sequence_catalog_windows(tmp_path):
    root = make_layout(tmp_path)
    ds = iLIDSVIDSequence(root, split_id=0, seq_len=8, seq_srd=4, num_val=0.3)
    # 12 frames, seq_len 8, stride 4 -> windows at 0 (range(0, 4, 4) = [0])
    paths, pid, cam = ds.trainval[0]
    assert len(paths) == 8
    assert osp.exists(paths[0])
    # query windows all from camera 0, gallery from camera 1
    assert all(cam == 0 for _, _, cam in ds.query)
    assert all(cam == 1 for _, _, cam in ds.gallery)
    assert len(ds.queryinfo.pid) == 3


def test_sequence_catalog_missing_layout(tmp_path):
    with pytest.raises(RuntimeError):
        iLIDSVIDSequence(str(tmp_path / "nope"))


def test_sequence_catalog_bad_split(tmp_path):
    root = make_layout(tmp_path)
    with pytest.raises(ValueError):
        iLIDSVIDSequence(root, split_id=99)


def test_get_data_ilids_roundtrip(tmp_path):
    root = make_layout(tmp_path)
    dataset, num_classes, train_loader, query_loader, gallery_loader = get_data(
        "ilidsvidsequence", root, batch_size=4, seq_len=8, seq_srd=4, workers=2,
        height=64, width=32,
    )
    assert num_classes == dataset.num_trainval_ids == 3
    clips, pids, cams = next(iter(train_loader))
    assert clips.shape == (4, 8, 64, 32, 3)
    # pair interleaving holds for windowed records too
    assert pids[0] == pids[1]


def test_flow_path_companions(tmp_path):
    root = make_layout(tmp_path)
    ds = iLIDSVIDSequence(root, split_id=0)
    paths = ds.trainval[0][0]
    flows = ds.flow_paths_for(paths)
    assert all("others" in f for f in flows)
    assert len(flows) == len(paths)
