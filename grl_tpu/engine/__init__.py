"""Training/evaluation engine: metrics, re-ranking, trainer, evaluator."""

from . import metrics
from .rerank import re_ranking

__all__ = ["metrics", "re_ranking"]
