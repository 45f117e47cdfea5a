"""Training losses (reference reid/loss/__init__.py surface)."""

from .oim import OIMLoss, cross_entropy, init_lut, oim_logits, update_lut
from .pairloss import PairLoss, pair_loss, pair_loss_from_logits
from .triplet import TripletLoss, TripletLossOIM, euclidean_cdist

__all__ = [
    "OIMLoss",
    "init_lut",
    "oim_logits",
    "update_lut",
    "cross_entropy",
    "PairLoss",
    "pair_loss",
    "pair_loss_from_logits",
    "TripletLoss",
    "TripletLossOIM",
    "euclidean_cdist",
]
