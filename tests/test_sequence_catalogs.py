"""iLIDS-VID / PRID-2011 catalog tests on a synthesized extracted layout."""

import json
import os.path as osp

import numpy as np
import pytest

from grl_tpu.data import get_data
from grl_tpu.data.catalogs import iLIDSVIDSequence


def make_layout(tmp_path, num_ids=6, frames_per_cam=12, flow=False):
    root = tmp_path / "ilids"
    (root / "images").mkdir(parents=True)
    if flow:
        (root / "others").mkdir(parents=True)
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
                if flow:
                    # flow companions under others/ with identical names
                    # (reference ilidsvidsequence.py:70-177 re-layout)
                    Image.fromarray(255 - img).save(root / "others" / name)
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


def make_raw_ilids(tmp_path, num_ids=4, frames=10):
    """Synthesize the published raw layout: sequences/cam{1,2}/person***/
    cam*_person*_*.png plus the fixed-splits .mat."""
    from PIL import Image
    from scipy.io import savemat

    root = tmp_path / "ilids_raw"
    ex = root / "raw" / "iLIDS-VID" / "i-LIDS-VID"
    for cam in (1, 2):
        for pid in range(1, num_ids + 1):
            d = ex / "sequences" / f"cam{cam}" / f"person{pid:03d}"
            d.mkdir(parents=True)
            for f in range(frames):
                img = (np.random.RandomState(f).rand(32, 16, 3) * 255).astype(np.uint8)
                Image.fromarray(img).save(d / f"cam{cam}_person{pid:03d}_{f:05d}.png")
    mat_dir = ex / "train-test people splits"
    mat_dir.mkdir(parents=True)
    # ls_set rows: permutations of 1-based pids (first half trainval)
    ls = np.stack([np.roll(np.arange(1, num_ids + 1), i) for i in range(3)])
    savemat(mat_dir / "train_test_splits_ilidsvid.mat", {"ls_set": ls})
    return str(root)


def test_ilids_cli_end_to_end(tmp_path):
    """The full '-d ilidsvidsequence' CLI path over a prepared raw layout:
    raw tar tree -> prepare -> windowed catalog -> train + periodic eval
    + checkpoint, all through main(). Closes the CLI loop for the
    sequence-dataset family (mars/duke have their own e2e tests)."""
    import sys

    from grl_tpu.cli.train import build_parser, main
    from grl_tpu.data.catalogs import prepare_ilidsvid

    root = make_raw_ilids(tmp_path, num_ids=4, frames=10)
    prepare_ilidsvid(root)

    logs = tmp_path / "run"
    args = build_parser().parse_args([
        "-d", "ilidsvidsequence", "--data-dir", root, "--tiny", "-b", "4",
        "--seq_len", "2", "--seq_srd", "2", "-j", "2",
        "--logs-dir", str(logs), "--epochs", "1",
    ])
    stdout = sys.stdout
    try:
        top1 = main(args)
    finally:
        sys.stdout = stdout
    assert 0.0 <= top1 <= 1.0
    # per-epoch checkpoint always lands; the best copy only when top1 > 0
    assert (logs / "checkpoint.npz").exists()
    if top1 > 0:
        assert (logs / "checkpoint_best.npz").exists()


def test_use_flow_cli_end_to_end(tmp_path):
    """--use-flow through BOTH CLIs: 6-channel (RGB|flow) clips feed the
    6-input-channel GRL trunk for train + periodic eval, then the
    standalone evaluator loads the flow checkpoint. The last §2 inventory
    capability (reference seqpreprocessor.py:29-44) made user-reachable."""
    import sys

    from grl_tpu.cli import evaluate as eval_cli
    from grl_tpu.cli.train import build_parser, main

    root = make_layout(tmp_path, num_ids=4, frames_per_cam=8, flow=True)
    logs = tmp_path / "flowrun"
    args = build_parser().parse_args([
        "-d", "ilidsvidsequence", "--data-dir", root, "--tiny", "--use-flow",
        "-b", "4", "--seq_len", "2", "--seq_srd", "2", "-j", "2",
        "--logs-dir", str(logs), "--epochs", "1",
    ])
    stdout = sys.stdout
    try:
        top1 = main(args)
        assert 0.0 <= top1 <= 1.0
        assert (logs / "checkpoint.npz").exists()

        eargs = eval_cli.build_parser().parse_args([
            "-d", "ilidsvidsequence", "--data-dir", root, "--tiny", "--use-flow",
            "--seq_len", "2", "--seq_srd", "2", "-j", "2",
            "--logs-dir", str(logs), "--checkpoint", str(logs / "checkpoint.npz"),
        ])
        etop1 = eval_cli.main(eargs)
        assert 0.0 <= etop1 <= 1.0

        # serving surface too: descriptor extraction from the flow checkpoint
        from grl_tpu.cli import extract as extract_cli

        xargs = extract_cli.build_parser().parse_args([
            "features", "-d", "ilidsvidsequence", "--data-dir", root,
            "--tiny", "--use-flow", "--seq_len", "2", "--seq_srd", "2",
            "-j", "2", "--logs-dir", str(logs),
            "--checkpoint", str(logs / "checkpoint.npz"),
            "--split", "gallery", "-o", str(tmp_path / "flow_gallery.npz"),
        ])
        shape = extract_cli.main(xargs)
        import numpy as _np

        blob = _np.load(tmp_path / "flow_gallery.npz")
        # tiny trunk: 128-ch features -> 3*128 descriptor (6144 full-size)
        assert tuple(blob["features"].shape) == tuple(shape) and shape[1] == 384
    finally:
        sys.stdout = stdout


def test_use_flow_rejected_off_sequence_datasets():
    """--use-flow must fail loudly on datasets without flow archives."""
    import pytest

    from grl_tpu.cli.train import build_parser, validate_args

    args = build_parser().parse_args(
        ["-d", "synthetic", "--tiny", "--use-flow", "--epochs", "1"]
    )
    with pytest.raises(SystemExit, match="flow"):
        validate_args(args)


def test_prepare_ilidsvid_builds_canonical_layout(tmp_path):
    from grl_tpu.data.catalogs import iLIDSVIDSequence, prepare_ilidsvid

    root = make_raw_ilids(tmp_path)
    n_ids, n_splits = prepare_ilidsvid(root)
    assert n_ids == 4 and n_splits == 3
    assert osp.exists(osp.join(root, "images", "00000000_00_0000.png"))
    assert osp.exists(osp.join(root, "meta.json"))
    # the prepared layout loads straight into the catalog
    ds = iLIDSVIDSequence(root, split_id=0, seq_len=4, seq_srd=2, num_val=0.0)
    assert ds.num_trainval_ids == 2
    assert len(ds.query) > 0 and len(ds.gallery) > 0


def make_raw_prid(tmp_path, num_ids=5, frames=8):
    from PIL import Image

    root = tmp_path / "prid_raw"
    ex = root / "raw" / "prid_2011" / "prid_2011"
    for cam in ("cam_a", "cam_b"):
        for pid in range(1, num_ids + 1):
            d = ex / "multi_shot" / cam / f"person_{pid:04d}"
            d.mkdir(parents=True)
            for f in range(frames):
                img = (np.random.RandomState(f).rand(32, 16, 3) * 255).astype(np.uint8)
                Image.fromarray(img).save(d / f"{f + 1:04d}.png")
    return str(root)


def test_prepare_prid2011_builds_canonical_layout(tmp_path):
    from grl_tpu.data.catalogs import PRID2011Sequence, prepare_prid2011

    root = make_raw_prid(tmp_path)
    n_ids, n_splits = prepare_prid2011(root, num_splits=4, seed=0)
    assert n_ids == 5 and n_splits == 4
    ds = PRID2011Sequence(root, split_id=1, seq_len=4, seq_srd=2, num_val=0.0)
    # no -1 pids (the reference's permutation(num)-1 bug is fixed)
    import json
    splits = json.loads(open(osp.join(root, "splits.json")).read())
    for s in splits:
        assert min(s["trainval"] + s["query"]) >= 0
    assert len(ds.trainval) > 0


def test_prid_cli_end_to_end(tmp_path):
    """'-d prid2011sequence' through the full train CLI over a prepared
    raw layout — the PRID counterpart of the iLIDS e2e above (same
    Datasequence machinery, different raw layout + random splits)."""
    import sys

    from grl_tpu.cli.train import build_parser, main
    from grl_tpu.data.catalogs import prepare_prid2011

    root = make_raw_prid(tmp_path, num_ids=4, frames=10)
    prepare_prid2011(root, num_splits=2, seed=0)

    logs = tmp_path / "prid_run"
    args = build_parser().parse_args([
        "-d", "prid2011sequence", "--data-dir", root, "--tiny", "-b", "4",
        "--seq_len", "2", "--seq_srd", "2", "-j", "2",
        "--logs-dir", str(logs), "--epochs", "1", "--split", "1",
    ])
    stdout = sys.stdout
    try:
        top1 = main(args)
    finally:
        sys.stdout = stdout
    assert 0.0 <= top1 <= 1.0
    assert (logs / "checkpoint.npz").exists()


def test_prepare_from_tarball(tmp_path):
    """The raw tree can also arrive as a tarball under raw/."""
    import shutil as sh
    import tarfile

    from grl_tpu.data.catalogs import prepare_ilidsvid

    staged = make_raw_ilids(tmp_path)
    inner = osp.join(staged, "raw", "iLIDS-VID", "i-LIDS-VID")
    root = tmp_path / "from_tar"
    (root / "raw").mkdir(parents=True)
    with tarfile.open(root / "raw" / "iLIDS-VID.tar", "w") as tar:
        tar.add(inner, arcname="i-LIDS-VID")
    n_ids, n_splits = prepare_ilidsvid(str(root))
    assert n_ids == 4 and n_splits == 3
