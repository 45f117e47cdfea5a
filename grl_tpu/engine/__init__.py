"""Training/evaluation engine: metrics, re-ranking, trainer, evaluator."""

from . import metrics, visualize
from .evaluator import Evaluator
from .optim import SGD, lr_mult_tree, step_decay_lr
from .rerank import re_ranking
from .train_step import grl_loss_fn, init_train_state, make_train_step
from .trainer import Trainer

__all__ = [
    "metrics",
    "visualize",
    "re_ranking",
    "Evaluator",
    "Trainer",
    "SGD",
    "lr_mult_tree",
    "step_decay_lr",
    "init_train_state",
    "make_train_step",
    "grl_loss_fn",
]
