"""ResNet backbone (v1.5 bottlenecks), NHWC, last-stage stride configurable.

Re-designs the reference's from-scratch ResNet (reid/models/resnets1.py:96-153)
for TPU: channels-last activations, HWIO kernels, all compute expressible as
XLA convolutions that tile onto the MXU. The re-ID variant fixes layer4 at
stride 1 (resnets1.py:109) so a 256x128 input yields a 16x8x2048 feature map.

Param tree keys mirror the torch module names (``conv1``, ``bn1``,
``layer1.{0..}.conv1`` ...) so torchvision ImageNet checkpoints convert 1:1
(see grl_tpu/utils/convert_torch.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import nn
from ..nn import functional as F
from ..nn import init as inits
from ..nn.module import Module, init_children


def _conv(cin, cout, ks, stride=1, padding=0, compute_dtype=None):
    return nn.Conv2d(
        cin, cout, ks, stride=stride, padding=padding, bias=False,
        kernel_init=inits.resnet_conv_normal, compute_dtype=compute_dtype,
    )


class Bottleneck(Module):
    """1x1 -> 3x3(stride) -> 1x1 bottleneck with optional downsample."""

    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=False, compute_dtype=None):
        self.stride = stride
        self.has_downsample = downsample
        cd = compute_dtype
        self.children = {
            "conv1": _conv(inplanes, planes, 1, compute_dtype=cd),
            "bn1": nn.BatchNorm(planes),
            "conv2": _conv(planes, planes, 3, stride=stride, padding=1, compute_dtype=cd),
            "bn2": nn.BatchNorm(planes),
            "conv3": _conv(planes, planes * 4, 1, compute_dtype=cd),
            "bn3": nn.BatchNorm(planes * 4),
        }
        if downsample:
            self.children["downsample"] = nn.Sequential(
                _conv(inplanes, planes * 4, 1, stride=stride, compute_dtype=cd),
                nn.BatchNorm(planes * 4),
            )

    def init(self, rng):
        return init_children(rng, self.children)

    def apply(self, params, state, x, *, training=False):
        c = self.children
        ns = {}
        out, _ = c["conv1"].apply(params["conv1"], {}, x)
        out, ns["bn1"] = c["bn1"].apply(params["bn1"], state["bn1"], out, training=training)
        out = F.relu(out)
        out, _ = c["conv2"].apply(params["conv2"], {}, out)
        out, ns["bn2"] = c["bn2"].apply(params["bn2"], state["bn2"], out, training=training)
        out = F.relu(out)
        out, _ = c["conv3"].apply(params["conv3"], {}, out)
        out, ns["bn3"] = c["bn3"].apply(params["bn3"], state["bn3"], out, training=training)
        if self.has_downsample:
            residual, ns["downsample"] = c["downsample"].apply(
                params["downsample"], state["downsample"], x, training=training
            )
        else:
            residual = x
        for k in ("conv1", "conv2", "conv3"):
            ns[k] = {}
        return F.relu(out + residual), ns


class ResNetTrunk(Module):
    """conv1..layer4 feature trunk (no avgpool/fc — the re-ID path never
    uses them; reference strips them at reid/models/basebranch.py:27-36)."""

    def __init__(self, layers=(3, 4, 6, 3), last_stride=1, width=64, compute_dtype=None,
                 in_channels=3):
        self.compute_dtype = compute_dtype
        cd = compute_dtype
        # in_channels=6 is the two-modality packing (RGB | optical flow on
        # channels, reference seqpreprocessor.py:29-44) consumed by the
        # --use-flow CLI path
        self.in_channels = in_channels
        self.children = {
            "conv1": _conv(in_channels, width, 7, stride=2, padding=3, compute_dtype=cd),
            "bn1": nn.BatchNorm(width),
        }
        inplanes = width
        strides = (1, 2, 2, last_stride)
        planes_list = (width, width * 2, width * 4, width * 8)
        for li, (planes, blocks, stride) in enumerate(zip(planes_list, layers, strides), start=1):
            mods = []
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                ds = bi == 0 and (s != 1 or inplanes != planes * 4)
                mods.append(Bottleneck(inplanes, planes, stride=s, downsample=ds, compute_dtype=cd))
                inplanes = planes * 4
            self.children[f"layer{li}"] = nn.Sequential(*mods)
        self.out_channels = inplanes

    def init(self, rng):
        return init_children(rng, self.children)

    def apply(self, params, state, x, *, training=False):
        c = self.children
        ns = {"conv1": {}}
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        x, _ = c["conv1"].apply(params["conv1"], {}, x)
        x, ns["bn1"] = c["bn1"].apply(params["bn1"], state["bn1"], x, training=training)
        x = F.relu(x)
        x = nn.max_pool2d(x, 3, 2, 1)
        for li in range(1, 5):
            k = f"layer{li}"
            x, ns[k] = c[k].apply(params[k], state[k], x, training=training)
        return x, ns


def resnet50_trunk(last_stride=1, compute_dtype=None, in_channels=3):
    return ResNetTrunk((3, 4, 6, 3), last_stride=last_stride, compute_dtype=compute_dtype,
                       in_channels=in_channels)
