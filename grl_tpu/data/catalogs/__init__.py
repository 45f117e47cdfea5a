"""Dataset catalog factory (reference reid/dataset/__init__.py:8-18)."""

from .duke import DukeMTMCVidReID
from .mars import Mars
from .prepare import prepare_ilidsvid, prepare_prid2011
from .sequence import PRID2011Sequence, SequenceDataset, iLIDSVIDSequence
from .synthetic import SyntheticVideoReID

_factory = {
    "mars": Mars,
    "duke": DukeMTMCVidReID,
    "ilidsvidsequence": iLIDSVIDSequence,
    "prid2011sequence": PRID2011Sequence,
    "synthetic": SyntheticVideoReID,
}


def names():
    return sorted(_factory.keys())


def get_sequence(name, *args, **kwargs):
    if name not in _factory:
        raise KeyError(f"Unknown dataset: {name}; available: {names()}")
    return _factory[name](*args, **kwargs)


__all__ = [
    "get_sequence",
    "names",
    "Mars",
    "DukeMTMCVidReID",
    "iLIDSVIDSequence",
    "PRID2011Sequence",
    "SequenceDataset",
    "SyntheticVideoReID",
]
