"""Torch state_dict conversion parity.

Builds a native torch ResNet (torchvision module naming — the format of
both the ImageNet model_zoo weights the reference loads at
resnets1.py:180-189 and its saved cnn checkpoints), converts the
state_dict with grl_tpu.utils.convert_torch, and checks the JAX trunk
reproduces the torch forward exactly.
"""

import numpy as np
import torch
import torch.nn as nn

from grl_tpu.models.resnet import ResNetTrunk
from grl_tpu.utils.convert_torch import (
    _apply_aliases,
    GRL_ALIASES,
    load_imagenet_resnet50,
    torch_to_pytree,
)


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + r)


class TorchTrunk(nn.Module):
    """torchvision-format ResNet trunk (keys: conv1, bn1, layer1..4)."""

    def __init__(self, layers=(1, 1, 1, 1), width=8, last_stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        inplanes = width
        strides = [1, 2, 2, last_stride]
        for li, (blocks, stride) in enumerate(zip(layers, strides), start=1):
            planes = width * (2 ** (li - 1))
            mods = []
            for b in range(blocks):
                s = stride if b == 0 else 1
                ds = None
                if s != 1 or inplanes != planes * 4:
                    ds = nn.Sequential(
                        nn.Conv2d(inplanes, planes * 4, 1, stride=s, bias=False),
                        nn.BatchNorm2d(planes * 4),
                    )
                mods.append(TorchBottleneck(inplanes, planes, s, ds))
                inplanes = planes * 4
            setattr(self, f"layer{li}", nn.Sequential(*mods))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
        return x


def test_imagenet_conversion_forward_parity():
    torch.manual_seed(0)
    tmodel = TorchTrunk(layers=(1, 1, 1, 1), width=8).eval()
    # randomize BN running stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.1)
                m.bias.normal_(0, 0.1)

    flat = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    flat["fc.weight"] = np.zeros((10, 32), np.float32)  # dropped by the loader
    flat["fc.bias"] = np.zeros((10,), np.float32)

    import jax

    trunk = ResNetTrunk(layers=(1, 1, 1, 1), width=8, last_stride=1)
    params, state = trunk.init(jax.random.PRNGKey(0))
    to_np = lambda t: jax.tree.map(np.asarray, t)
    params, state = load_imagenet_resnet50(to_np(params), to_np(state), flat)

    x = np.random.RandomState(1).randn(2, 3, 64, 32).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    out, _ = trunk.apply(params, state, np.transpose(x, (0, 2, 3, 1)), training=False)
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_imagenet_conv1_inflates_to_flow_channels():
    """--use-flow trunks take 6-channel (RGB|flow) input: the 3-channel
    ImageNet conv1 kernel is tiled over the flow group and scaled by 1/2,
    so conv1's response to a duplicated input matches the RGB original."""
    import jax

    w = np.random.RandomState(0).randn(8, 3, 7, 7).astype(np.float32)  # OIHW
    flat = {
        "conv1.weight": w,
        "bn1.weight": np.ones(8, np.float32),
        "bn1.bias": np.zeros(8, np.float32),
        "bn1.running_mean": np.zeros(8, np.float32),
        "bn1.running_var": np.ones(8, np.float32),
    }
    trunk = ResNetTrunk(layers=(1, 1, 1, 1), width=8, in_channels=6)
    params, state = trunk.init(jax.random.PRNGKey(0))
    to_np = lambda t: jax.tree.map(np.asarray, t)
    p, s = load_imagenet_resnet50(to_np(params), to_np(state), flat)
    got = p["conv1"]["kernel"]  # HWIO
    assert got.shape == (7, 7, 6, 8)
    src = np.transpose(w, (2, 3, 1, 0))
    np.testing.assert_allclose(got[:, :, :3], src / 2)
    np.testing.assert_allclose(got[:, :, 3:], src / 2)

    # non-multiple widths fail loudly
    trunk5 = ResNetTrunk(layers=(1, 1, 1, 1), width=8, in_channels=5)
    p5, s5 = trunk5.init(jax.random.PRNGKey(0))
    with np.testing.assert_raises(ValueError):
        load_imagenet_resnet50(to_np(p5), to_np(s5), flat)


def test_conversion_rejects_unknown_and_mismatched_keys():
    import jax
    import pytest

    trunk = ResNetTrunk(layers=(1, 1, 1, 1), width=8)
    params, state = trunk.init(jax.random.PRNGKey(0))
    to_np = lambda t: __import__("jax").tree.map(np.asarray, t)
    with pytest.raises(KeyError):
        load_imagenet_resnet50(
            to_np(params), to_np(state), {"nonexistent.weight": np.zeros((4, 4, 1, 1), np.float32)}
        )
    with pytest.raises(ValueError):
        load_imagenet_resnet50(
            to_np(params), to_np(state), {"conv1.weight": np.zeros((9, 9, 9, 9), np.float32)}
        )


def test_grl_checkpoint_aliases_map_reference_names():
    # reference module names (grl_model.py / basebranch.py) -> ours
    assert _apply_aliases("backbone.base.0.weight", GRL_ALIASES) == "backbone.base.conv1.weight"
    assert _apply_aliases("backbone.base.7.2.conv3.weight", GRL_ALIASES) == (
        "backbone.base.layer4.2.conv3.weight"
    )
    assert _apply_aliases(
        "temporal_learning_block.uncorr_memo_forward.conv1.weight", GRL_ALIASES
    ) == "temporal_learning_block.fwd.memo.conv1.weight"


def test_torch_to_pytree_layout_rules():
    flat = {
        "m.weight": np.arange(24, dtype=np.float32).reshape(2, 3, 2, 2),  # conv OIHW
        "l.weight": np.arange(6, dtype=np.float32).reshape(2, 3),         # linear (out,in)
        "l.bias": np.zeros(2, np.float32),
        "b.weight": np.ones(4, np.float32),                                # norm scale
        "b.running_mean": np.zeros(4, np.float32),
        "b.running_var": np.ones(4, np.float32),
        "b.num_batches_tracked": np.int64(7),
    }
    p, s = torch_to_pytree(flat)
    assert p["m"]["kernel"].shape == (2, 2, 3, 2)  # HWIO
    assert p["l"]["kernel"].shape == (3, 2)        # (in, out)
    assert p["b"]["scale"].shape == (4,)
    assert set(s["b"]) == {"mean", "var"}
