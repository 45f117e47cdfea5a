"""Generate a small on-disk dataset in the EXACT DukeMTMC-VideoReID layout.

Companion to make_fake_mars.py for the other primary dataset: real JPEGs
under ``root/{train,query,gallery}/<pid>/<tracklet>/``, with frame names
in BOTH filename formats the reference parses (old ``0001C6F0099X...jpg``
and new ``0001_C6_F0099_X...jpg``, reference reid/dataset/duke.py:140-146)
so the camid/F-index parsing is exercised end to end. Frames are written
in shuffled order to prove the catalog's F-index ordering.

usage:
  python tools/make_fake_duke.py /tmp/fakeduke --train-ids 8 --test-ids 4
  python -m grl_tpu.cli.train -d duke --data-dir /tmp/fakeduke ...
"""

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def make_fake_duke(
    root,
    train_ids=4,
    test_ids=3,
    cams=2,
    frames_range=(12, 20),
    height=128,
    width=64,
    seed=0,
):
    """Write the dataset; returns ``root``.

    train/<pid>: one tracklet per camera. Test pids appear in query
    (camera 1 tracklet) and gallery (all cameras) — every query has a
    valid cross-camera match. Odd pids use the old filename format, even
    pids the new underscore format.
    """
    from PIL import Image

    from grl_tpu.data.catalogs.synthetic import _template

    rng = np.random.RandomState(seed)
    root = osp.abspath(root)

    all_ids = list(range(1, train_ids + test_ids + 1))
    templates = {pid: _template(rng, height, width) for pid in all_ids}

    def frame_name(pid, cam, f):
        if pid % 2:  # old format: camid = name[5]
            return f"{pid:04d}C{cam}F{f:04d}X{f:05d}.jpg"
        return f"{pid:04d}_C{cam}_F{f:04d}_X{f:05d}.jpg"  # new: name[6]

    def write_tracklet(split, pid, cam, tid):
        tdir = osp.join(root, split, f"{pid:04d}", f"{tid:04d}")
        os.makedirs(tdir, exist_ok=True)
        tint = 0.9 + 0.2 * (cam - 1) / max(cams - 1, 1)
        n = rng.randint(*frames_range)
        order = rng.permutation(n)  # shuffled write order; catalog re-sorts
        for f in order:
            img = np.clip(
                (templates[pid] * tint + 0.08 * rng.randn(height, width, 3)) * 255,
                0, 255,
            ).astype(np.uint8)
            Image.fromarray(img).save(osp.join(tdir, frame_name(pid, cam, int(f) + 1)))

    train_pids = all_ids[:train_ids]
    test_pids = all_ids[train_ids:]
    for pid in train_pids:
        for cam in range(1, cams + 1):
            write_tracklet("train", pid, cam, cam)
    for pid in test_pids:
        write_tracklet("query", pid, 1, 1)
        for cam in range(1, cams + 1):
            write_tracklet("gallery", pid, cam, cam)
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--train-ids", type=int, default=4)
    ap.add_argument("--test-ids", type=int, default=3)
    ap.add_argument("--cams", type=int, default=2)
    ap.add_argument("--frames", type=int, nargs=2, default=(12, 20))
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    root = make_fake_duke(
        args.out, train_ids=args.train_ids, test_ids=args.test_ids,
        cams=args.cams, frames_range=tuple(args.frames),
        height=args.height, width=args.width, seed=args.seed,
    )
    n = sum(len(files) for _, _, files in os.walk(root))
    print(f"wrote fake DukeMTMC-VideoReID ({n} files) to {root}")
    print(f"try: python -m grl_tpu.cli.train -d duke --data-dir {root} "
          "--tiny -b 4 --seq_len 4 --epochs 2 --logs-dir /tmp/fakeduke_run")


if __name__ == "__main__":
    main()
