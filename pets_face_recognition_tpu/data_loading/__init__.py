"""Data loading: datasets, pair sampler, loader.

Export surface mirrors the reference ``data_loading/__init__.py:1-5``.
"""

from .dataset import (
    ConcatDataset,
    RecDataset,
    RecSubset,
    SimpleDataset,
    check_dir,
    check_images,
    init_dataset,
    simple_init_dataset,
)
from .pairs import PairGenerator
from .loader import DataLoader, default_collate

__all__ = [
    "ConcatDataset",
    "RecDataset",
    "RecSubset",
    "SimpleDataset",
    "PairGenerator",
    "DataLoader",
    "default_collate",
    "init_dataset",
    "simple_init_dataset",
    "check_dir",
    "check_images",
]
