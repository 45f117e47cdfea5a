"""Qualitative visualization: ranked retrieval results + GCE attention maps.

Covers the reference's visualization surface:
- ``visualize_ranked_results`` (reid/evaluator/visualize.py:17-81): copy the
  top-k ranked gallery tracklets' first frames per query into a directory
  tree;
- ``visualize_in_pic`` (reid/evaluator/visualize.py:84-148): one matplotlib
  strip per query with green/red titles for correct/wrong identities;
- CAM-style heatmap overlays (root visualize.py:17-65, cam_functions.py):
  here the visualized saliency is the GCE correlation mask itself (the
  quantity the reference's CAM grids render), overlaid per frame with a
  jet colormap.

Tracklet items are ``(frames, pid, camid)`` where frames is a path tuple or
a uint8 array — same contract as the loaders.
"""

from __future__ import annotations

import os.path as osp

import numpy as np

from ..data.transforms import IMAGENET_MEAN as _MEAN, IMAGENET_STD as _STD
from ..utils.serialization import mkdir_if_missing

# single source of truth with the input normalization (transforms.py:28):
# reverse_normalize must undo exactly what normalize applied
IMAGENET_MEAN = np.asarray(_MEAN, np.float32)
IMAGENET_STD = np.asarray(_STD, np.float32)


def _first_frame(item):
    frames = item[0]
    if isinstance(frames, np.ndarray):
        return frames[0]
    from PIL import Image

    with Image.open(frames[0]) as img:
        return np.asarray(img.convert("RGB"))


def reverse_normalize(x):
    """Undo ImageNet normalization -> uint8 image (reference visualize.py:10-14)."""
    img = np.asarray(x, np.float32) * IMAGENET_STD + IMAGENET_MEAN
    return np.clip(img * 255.0, 0, 255).astype(np.uint8)


def visualize_ranked_results(distmat, query, gallery, save_dir, topk=10):
    """Copy per-query ranked gallery frames into ``save_dir/<qidx>_pid<k>/``."""
    distmat = np.asarray(distmat)
    mkdir_if_missing(save_dir)
    indices = np.argsort(distmat, axis=1)
    for qi, item in enumerate(query):
        _, qpid, qcam = item
        qdir = osp.join(save_dir, f"query{qi:04d}_pid{qpid}")
        mkdir_if_missing(qdir)
        _save_frame(_first_frame(item), osp.join(qdir, "query.png"))
        rank = 0
        for gi in indices[qi]:
            gframes, gpid, gcam = gallery[gi]
            if gpid == qpid and gcam == qcam:
                continue  # junk by protocol
            flag = "good" if gpid == qpid else "bad"
            _save_frame(
                _first_frame(gallery[gi]),
                osp.join(qdir, f"rank{rank + 1:02d}_{flag}_pid{gpid}.png"),
            )
            rank += 1
            if rank >= topk:
                break
    print(f"ranked results written to {save_dir}")


def visualize_in_pic(distmat, query, gallery, save_dir, topk=10, query_ids=None):
    """One horizontal strip per query: query frame + top-k gallery frames,
    titles green for matches and red otherwise."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    distmat = np.asarray(distmat)
    mkdir_if_missing(save_dir)
    indices = np.argsort(distmat, axis=1)
    q_iter = range(len(query)) if query_ids is None else np.atleast_1d(query_ids)
    for qi in q_iter:
        item = query[qi]
        _, qpid, qcam = item
        fig, axes = plt.subplots(1, topk + 1, figsize=(2 * (topk + 1), 4))
        axes[0].imshow(_first_frame(item))
        axes[0].set_title(f"query\npid {qpid}", color="blue")
        axes[0].axis("off")
        rank = 0
        for gi in indices[qi]:
            gframes, gpid, gcam = gallery[gi]
            if gpid == qpid and gcam == qcam:
                continue
            ax = axes[rank + 1]
            ax.imshow(_first_frame(gallery[gi]))
            ax.set_title(f"r{rank + 1}\npid {gpid}", color="green" if gpid == qpid else "red")
            ax.axis("off")
            rank += 1
            if rank >= topk:
                break
        fig.tight_layout()
        fig.savefig(osp.join(save_dir, f"query{qi:04d}.png"))
        plt.close(fig)
    print(f"ranked strips written to {save_dir}")


def attention_overlay(frame_u8, mask, alpha=0.5):
    """Overlay a (h', w') attention map on a frame with a jet colormap."""
    import matplotlib.cm as cm
    from PIL import Image

    h, w = frame_u8.shape[:2]
    m = np.asarray(mask, np.float32)
    m = (m - m.min()) / max(m.max() - m.min(), 1e-6)
    m_img = np.asarray(Image.fromarray((m * 255).astype(np.uint8)).resize((w, h), Image.BILINEAR))
    heat = (cm.jet(m_img / 255.0)[..., :3] * 255).astype(np.uint8)
    return ((1 - alpha) * frame_u8 + alpha * heat).astype(np.uint8)


def visualize_attention(cnn, params, state, clips_u8, save_dir, prefix="cam"):
    """Render the GCE correlation mask over each frame of a clip batch.

    clips_u8: (b, t, h, w, 3) uint8. Saves one grid image per clip —
    the TPU-native equivalent of the reference's CAM batch grids
    (cam_functions.py:21-90).
    """
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..data.transforms import normalize

    mkdir_if_missing(save_dir)
    clips = normalize(jnp.asarray(clips_u8))
    (_, _, corr_map), _ = cnn.children["backbone"].apply(
        params["backbone"], state["backbone"], clips, training=False
    )
    # the backbone emits time-major (t, b, h', w', 1) — see gce.py
    corr_map = np.moveaxis(np.asarray(corr_map)[..., 0], 0, 1)  # (b, t, h', w')
    b, t = clips_u8.shape[0], clips_u8.shape[1]
    for bi in range(b):
        fig, axes = plt.subplots(2, t, figsize=(2 * t, 5), squeeze=False)
        for ti in range(t):
            axes[0][ti].imshow(clips_u8[bi, ti])
            axes[1][ti].imshow(attention_overlay(clips_u8[bi, ti], corr_map[bi, ti]))
            for row in (0, 1):
                axes[row][ti].axis("off")
        fig.tight_layout()
        fig.savefig(osp.join(save_dir, f"{prefix}_{bi:03d}.png"))
        plt.close(fig)
    print(f"attention grids written to {save_dir}")


def _save_frame(frame_u8, path):
    from PIL import Image

    Image.fromarray(np.asarray(frame_u8)).save(path)
