"""Domain-classified tile datasets (reference `classified_dataloader.py`).

Tiles grouped into per-domain subdirectories; `get_categories` lists the
domain names (`classified_dataloader.py:14-19`), `ClassifiedTileDataset`
serves one category (`:22-66`, same id/watermark semantics as the main
loader), and `ClassifiedLoader` batches with the few-shot batch size and
supports `reshuffle()` (`:72-94`).
"""

from __future__ import annotations

import os
from typing import List, Optional

from semisupervisedobjectdetection_tpu.core.config import DataConfig
from semisupervisedobjectdetection_tpu.data.loader import TileLoader
from semisupervisedobjectdetection_tpu.data.tiles import TileDataset


def get_categories(cfg: DataConfig, flag: str = "labeled") -> List[str]:
    root = (cfg.unlabeled_classified if flag == "unlabeled"
            else cfg.labeled_classified)
    if root is None or not os.path.isdir(root):
        return []
    return sorted(d for d in os.listdir(root)
                  if os.path.isdir(os.path.join(root, d)))


class ClassifiedTileDataset(TileDataset):
    """One domain-category directory of tiles."""

    def __init__(self, root: str, category: str,
                 mask_dir: Optional[str] = None, canvas: int = 512,
                 cache_mb: float = 0.0):
        super().__init__(os.path.join(root, category), mask_dir,
                         canvas=canvas, has_mask=mask_dir is not None,
                         cache_mb=cache_mb)
        self.category = category


def category_loaders(cfg: DataConfig, flag: str = "labeled",
                     seed: int = 0) -> List[TileLoader]:
    """One loader per domain with `few_shot_batch_size` (`:85-91`)."""
    root = (cfg.unlabeled_classified if flag == "unlabeled"
            else cfg.labeled_classified)
    mask_dir = cfg.maskdir if flag == "labeled" else None
    loaders = []
    for i, cat in enumerate(get_categories(cfg, flag)):
        ds = ClassifiedTileDataset(root, cat, mask_dir, canvas=cfg.canvas,
                                   cache_mb=cfg.cache_mb)
        loaders.append(TileLoader(ds, cfg.few_shot_batch_size,
                                  shuffle=cfg.shuffle,
                                  drop_last=cfg.drop_last,
                                  seed=seed * 1000 + i,
                                  on_bad_tile=cfg.bad_tile_policy))
    return loaders
