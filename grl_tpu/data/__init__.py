"""Input pipeline: catalogs, clip sampling, loaders, device transforms."""

from . import catalogs, sampling, transforms
from .loader import ClipDataset, ClipLoader, get_data

__all__ = ["catalogs", "sampling", "transforms", "ClipDataset", "ClipLoader", "get_data"]
