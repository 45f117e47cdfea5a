"""PyTorch state_dict -> grl_tpu pytree conversion.

Supports importing torchvision ImageNet ResNet-50 weights into the trunk
(the reference's pretrained init, reid/models/resnets1.py:180-189) and full
reference GRL/Siamese checkpoints. Works on plain numpy arrays so the
framework itself never needs torch; callers do
``{k: v.numpy() for k, v in torch.load(p)["state_dict"].items()}`` first.

Layout rules:
- 4-D conv weights OIHW -> HWIO;
- 2-D linear weights (out, in) -> (in, out);
- 1-D ``weight``/``bias`` on norm layers -> ``scale``/``bias`` params;
- ``running_mean``/``running_var`` -> state ``mean``/``var``;
- ``num_batches_tracked`` dropped.
"""

from __future__ import annotations

import numpy as np

# Reference ResNet50_GRL_Model wraps the trunk in an anonymous
# nn.Sequential (reid/models/basebranch.py:27-36) and names the TRL
# submodules differently (reid/models/grl_model.py:93-128); map those
# prefixes onto this framework's structured names.
GRL_ALIASES = {
    "backbone.base.0": "backbone.base.conv1",
    "backbone.base.1": "backbone.base.bn1",
    "backbone.base.4": "backbone.base.layer1",
    "backbone.base.5": "backbone.base.layer2",
    "backbone.base.6": "backbone.base.layer3",
    "backbone.base.7": "backbone.base.layer4",
    "temporal_learning_block.forward_f1.0": "temporal_learning_block.fwd.f1",
    "temporal_learning_block.forward_f2.0": "temporal_learning_block.fwd.f2",
    "temporal_learning_block.channel_atte_foreward_corr": "temporal_learning_block.fwd.atte",
    "temporal_learning_block.uncorr_memo_forward": "temporal_learning_block.fwd.memo",
    "temporal_learning_block.backward_f1.0": "temporal_learning_block.bwd.f1",
    "temporal_learning_block.backward_f2.0": "temporal_learning_block.bwd.f2",
    "temporal_learning_block.channel_atte_backward_corr": "temporal_learning_block.bwd.atte",
    "temporal_learning_block.uncorr_memo_backward": "temporal_learning_block.bwd.memo",
}


def _apply_aliases(key, aliases):
    if not aliases:
        return key
    for src in sorted(aliases, key=len, reverse=True):
        if key == src or key.startswith(src + "."):
            return aliases[src] + key[len(src):]
    return key


def _set_path(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def torch_to_pytree(flat, aliases=None, strip_prefix="module."):
    """Convert a flat torch state_dict (numpy values) to (params, state)."""
    params, state = {}, {}
    for key, value in flat.items():
        if key.startswith(strip_prefix):
            key = key[len(strip_prefix):]
        key = _apply_aliases(key, aliases)
        parts = key.split(".")
        leaf = parts[-1]
        path = parts[:-1]
        value = np.asarray(value)

        if leaf == "num_batches_tracked":
            continue
        if leaf == "running_mean":
            _set_path(state, path + ["mean"], value.astype(np.float32))
        elif leaf == "running_var":
            _set_path(state, path + ["var"], value.astype(np.float32))
        elif leaf == "weight":
            if value.ndim == 4:
                _set_path(params, path + ["kernel"], np.transpose(value, (2, 3, 1, 0)))
            elif value.ndim == 2:
                _set_path(params, path + ["kernel"], value.T)
            elif value.ndim == 1:
                _set_path(params, path + ["scale"], value.astype(np.float32))
            else:
                raise ValueError(f"Unhandled weight rank for {key}: {value.shape}")
        elif leaf == "bias":
            _set_path(params, path + ["bias"], value)
        elif leaf == "lut":
            # OIM lookup table buffer (reid/loss/oim.py:43)
            _set_path(state, path + ["lut"], value)
        else:
            raise ValueError(f"Unhandled state_dict leaf: {key}")
    return params, state


def _fetch_path(tree, path):
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            raise KeyError(f"path {'.'.join(path)} not in pytree (missing {p!r})")
        node = node[p]
    return node


def pytree_to_torch_state(params, state, torch_keys, aliases=None):
    """Inverse of :func:`torch_to_pytree`: emit a flat torch-style
    state_dict (numpy values) covering exactly ``torch_keys``.

    ``torch_keys`` is the key list of the *target* torch module's
    state_dict — typically obtained from the literal reference module —
    so a strict ``load_state_dict`` afterwards proves the alias table and
    layout rules against the reference's real structure (the parity
    harness drives reference reid/models/grl_model.py:184-229 with
    grl_tpu-initialized weights this way). ``num_batches_tracked``
    counters, which torch_to_pytree drops, are emitted as zeros.
    """
    flat = {}
    for tkey in torch_keys:
        key = _apply_aliases(tkey, aliases)
        parts = key.split(".")
        leaf, path = parts[-1], parts[:-1]
        if leaf == "num_batches_tracked":
            flat[tkey] = np.asarray(0, dtype=np.int64)
        elif leaf == "running_mean":
            flat[tkey] = np.asarray(_fetch_path(state, path + ["mean"]))
        elif leaf == "running_var":
            flat[tkey] = np.asarray(_fetch_path(state, path + ["var"]))
        elif leaf == "weight":
            node = _fetch_path(params, path)
            if "kernel" in node:
                v = np.asarray(node["kernel"])
                flat[tkey] = np.transpose(v, (3, 2, 0, 1)) if v.ndim == 4 else v.T
            else:
                flat[tkey] = np.asarray(node["scale"])
        elif leaf == "bias":
            flat[tkey] = np.asarray(_fetch_path(params, path + ["bias"]))
        elif leaf == "lut":
            flat[tkey] = np.asarray(_fetch_path(state, path + ["lut"]))
        else:
            raise ValueError(f"Unhandled state_dict leaf: {tkey}")
    return flat


def merge_pytree(base, overlay):
    """Recursively overlay converted leaves onto an init'd pytree.

    Raises on structure mismatch so silent partial loads can't happen
    (the reference's copy_state_dict silently skips — here it is explicit).
    """
    out = dict(base)
    for k, v in overlay.items():
        if k not in base:
            raise KeyError(f"Converted key {k!r} not present in target tree "
                           f"(have {sorted(base.keys())})")
        if isinstance(v, dict):
            out[k] = merge_pytree(base[k], v)
        else:
            if np.shape(base[k]) != np.shape(v):
                raise ValueError(f"Shape mismatch at {k}: {np.shape(base[k])} vs {np.shape(v)}")
            out[k] = np.asarray(v, dtype=np.asarray(base[k]).dtype)
    return out


def load_imagenet_resnet50(trunk_params, trunk_state, flat):
    """Overlay torchvision ImageNet resnet50 weights onto a trunk pytree.

    Handles wider trunk inputs (the --use-flow 6-channel RGB|flow packing):
    when the target conv1 kernel has k x 3 input channels, the 3-channel
    ImageNet kernel is tiled k times and scaled by 1/k — the standard
    channel-inflation init (each modality starts as a scaled copy of the
    RGB filters, keeping conv1's output magnitude at its ImageNet scale).
    """
    drop = {k: v for k, v in flat.items() if not k.startswith(("fc.",))}
    p, s = torch_to_pytree(drop)
    src = p["conv1"]["kernel"]  # HWIO
    tgt_in = np.shape(trunk_params["conv1"]["kernel"])[2]
    if tgt_in != src.shape[2]:
        if tgt_in % src.shape[2]:
            raise ValueError(
                f"trunk conv1 expects {tgt_in} input channels; cannot inflate "
                f"the {src.shape[2]}-channel ImageNet kernel to a non-multiple"
            )
        k = tgt_in // src.shape[2]
        p["conv1"]["kernel"] = np.tile(src, (1, 1, k, 1)) / k
    return merge_pytree(trunk_params, p), merge_pytree(trunk_state, s)


def load_grl_checkpoint(params, state, flat):
    """Overlay a reference cnn checkpoint onto GRLModel pytrees."""
    p, s = torch_to_pytree(flat, aliases=GRL_ALIASES)
    return merge_pytree(params, p), merge_pytree(state, s)


def _main():
    """CLI: flatten a torch .pth/.pth.tar into a numpy .npz that
    --pretrained-trunk / load_grl_checkpoint can consume.

    python -m grl_tpu.utils.convert_torch --src resnet50-19c8e357.pth \
        --out resnet50_imagenet.npz
    """
    import argparse

    ap = argparse.ArgumentParser(description=_main.__doc__.split("\n")[0])
    ap.add_argument("--src", required=True, help="torch checkpoint (.pth / .pth.tar)")
    ap.add_argument("--out", required=True, help="output .npz of numpy arrays")
    args = ap.parse_args()

    import torch

    blob = torch.load(args.src, map_location="cpu", weights_only=False)
    state = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    flat = {k: np.asarray(v.detach().numpy() if hasattr(v, "detach") else v)
            for k, v in state.items()}
    np.savez(args.out, **flat)
    print(f"wrote {len(flat)} arrays to {args.out}")


if __name__ == "__main__":
    _main()
