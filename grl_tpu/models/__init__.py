"""Model factory (reference reid/models/__init__.py:8-49 semantics)."""

from .gce import GCEBackbone
from .grl import GRLModel
from .resnet import Bottleneck, ResNetTrunk, resnet50_trunk
from .resnet_baseline import ResNetBaseline
from .siamese import Siamese, SiameseVideo
from .trl import MemoryBlock, TRLBlock
from .two_stream import TwoStreamBaseline, two_stream_tiny

_factory = {
    "resnet50_grl": GRLModel,
    "resnet50": ResNetBaseline,
    "siamese": Siamese,
    "siamese_video": SiameseVideo,
    "two_stream": TwoStreamBaseline,
}


def names():
    return sorted(_factory.keys())


def create(name, **kwargs):
    """Instantiate a registered model description by name."""
    if name not in _factory:
        raise KeyError(f"Unknown model: {name}; available: {names()}")
    return _factory[name](**kwargs)


__all__ = [
    "create",
    "names",
    "GRLModel",
    "GCEBackbone",
    "TRLBlock",
    "MemoryBlock",
    "Siamese",
    "SiameseVideo",
    "ResNetTrunk",
    "ResNetBaseline",
    "TwoStreamBaseline",
    "two_stream_tiny",
    "Bottleneck",
    "resnet50_trunk",
]
