"""Real-dataset readiness tool: verify layout, warm split caches, print
the parity-run recipe.

When MARS / DukeMTMC-VideoReID land on disk, run this FIRST so the first
training round spends its time training, not plumbing:

    python tools/prepare_real_data.py mars  --data-dir /data/MARS
    python tools/prepare_real_data.py duke  --data-dir /data/DukeMTMC-VideoReID
    python tools/prepare_real_data.py ilidsvidsequence --data-dir /data/iLIDS-VID
    python tools/prepare_real_data.py prid2011sequence --data-dir /data/PRID2011

It (1) checks the expected directory/metadata layout with actionable
errors, (2) builds the catalog — which parses the .mat/.txt metadata,
runs every per-tracklet consistency assert, and writes the JSON split
caches next to the data, (3) spot-decodes frames from each split through
the real decode path (native libjpeg kernel incl. resize), and (4) prints
the dataset stats banner plus the exact train/eval commands for a
reference-parity run (mars_train.py:146-204 defaults).
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

EXPECTED = {
    "mars": [
        "bbox_train",
        "bbox_test",
        "info/train_name.txt",
        "info/test_name.txt",
        "info/tracks_train_info.mat",
        "info/tracks_test_info.mat",
        "info/query_IDX.mat",
    ],
    "duke": ["train", "gallery", "query"],
    "ilidsvidsequence": [],  # prepare.py extracts from the raw tar itself
    "prid2011sequence": [],
}

RECIPES = {
    "mars": (
        "python -m grl_tpu.cli.train -d mars --data-dir {root} "
        "--logs-dir log/mars_grl --pretrained-trunk resnet50_imagenet.npz "
        "-b 16 --seq_len 8 --epochs 60\n"
        "python -m grl_tpu.cli.evaluate -d mars --data-dir {root} "
        "--logs-dir log/mars_grl"
    ),
    "duke": (
        "python -m grl_tpu.cli.train -d duke --data-dir {root} "
        "--logs-dir log/duke_grl --pretrained-trunk resnet50_imagenet.npz "
        "-b 16 --seq_len 8 --epochs 60\n"
        "python -m grl_tpu.cli.evaluate -d duke --data-dir {root} "
        "--logs-dir log/duke_grl"
    ),
    "ilidsvidsequence": (
        "python -m grl_tpu.cli.train -d ilidsvidsequence --data-dir {root} "
        "--split 0 --logs-dir log/ilids_grl -b 16 --seq_len 8 --epochs 60"
    ),
    "prid2011sequence": (
        "python -m grl_tpu.cli.train -d prid2011sequence --data-dir {root} "
        "--split 0 --logs-dir log/prid_grl -b 16 --seq_len 8 --epochs 60"
    ),
}


def check_layout(name, root):
    missing = [p for p in EXPECTED[name] if not osp.exists(osp.join(root, p))]
    if not osp.isdir(root):
        raise SystemExit(f"--data-dir {root} does not exist")
    if missing:
        raise SystemExit(
            f"{name} layout incomplete under {root}; missing:\n  "
            + "\n  ".join(missing)
            + "\n(expected the official distribution layout; see "
            "grl_tpu/data/catalogs/" + ("mars.py" if name == "mars" else "duke.py")
            + " docstrings)"
        )


def spot_decode(tracklets, label, k=3):
    from grl_tpu.data.jpeg import decode_resize, native_available

    t0 = time.time()
    n = 0
    for frames, _pid, _camid in tracklets[:k]:
        if isinstance(frames, (list, tuple)):
            for f in frames[:2]:
                img = decode_resize(f, 256, 128)
                assert img.shape == (256, 128, 3)
                n += 1
    dt = time.time() - t0
    kind = "native" if native_available() else "PIL-fallback"
    print(f"  {label}: decoded {n} frames through the {kind} path ({dt:.2f}s)")


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("dataset", choices=list(EXPECTED))
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--split", type=int, default=0)
    ap.add_argument("--seq_len", type=int, default=8)
    ap.add_argument("--seq_srd", type=int, default=4)
    args = ap.parse_args()

    root = osp.abspath(args.data_dir)
    check_layout(args.dataset, root)

    from grl_tpu.data.catalogs import get_sequence

    print(f"building {args.dataset} catalog (writes JSON split caches) ...")
    t0 = time.time()
    if args.dataset in ("ilidsvidsequence", "prid2011sequence"):
        ds = get_sequence(args.dataset, root, split_id=args.split,
                          seq_len=args.seq_len, seq_srd=args.seq_srd)
        splits = [("trainval", ds.trainval), ("query", ds.query), ("gallery", ds.gallery)]
    else:
        ds = get_sequence(args.dataset, root)
        splits = [("train", ds.train), ("query", ds.query), ("gallery", ds.gallery)]
    print(f"catalog ok in {time.time() - t0:.1f}s")

    for label, items in splits:
        if not items:
            raise SystemExit(f"split {label!r} is empty — check the metadata files")
        spot_decode(items, label)

    print("\nready. reference-parity run:")
    print(RECIPES[args.dataset].format(root=root))
    print(
        "\n(convert ImageNet weights once: python -m grl_tpu.utils.convert_torch "
        "--src resnet50-19c8e357.pth --out resnet50_imagenet.npz; "
        "multi-chip hosts are used automatically — cap with --devices N)"
    )


if __name__ == "__main__":
    main()
