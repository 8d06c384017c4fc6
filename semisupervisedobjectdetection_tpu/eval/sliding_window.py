"""Sliding-window inference over large rasters.

The reference only ever predicts on whole 512x512 tiles; production
remote-sensing inference needs arbitrarily large scenes. This runs the
model over overlapping fixed-size windows (static shapes — one compile),
batches the windows, and blends overlaps with a separable Hann weight so
window seams vanish. For scenes too large for window batching on one chip,
combine with `parallel/context.py` spatial sharding instead.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _hann2d(size: int) -> np.ndarray:
    w = 0.5 - 0.5 * np.cos(2 * np.pi * (np.arange(size) + 0.5) / size)
    return np.outer(w, w).astype(np.float32)


def sliding_window_predict(predict_fn, image: np.ndarray,
                           window: int = 512, overlap: int = 64,
                           batch: int = 8) -> np.ndarray:
    """Blend `predict_fn` over overlapping windows of a large image.

    predict_fn: (B, window, window, 3) float32 -> (B, window, window)
        sigmoid masks (e.g. a partial of `train.supervised.predict_step`).
    image: (H, W, 3) float32 in [0, 1], H/W >= window.
    Returns (H, W) float32 blended mask.
    """
    h, w, _ = image.shape
    stride = window - overlap
    ys = list(range(0, max(h - window, 0) + 1, stride))
    xs = list(range(0, max(w - window, 0) + 1, stride))
    if ys[-1] + window < h:
        ys.append(h - window)
    if xs[-1] + window < w:
        xs.append(w - window)

    coords = [(y, x) for y in ys for x in xs]
    weight = _hann2d(window) + 1e-3
    acc = np.zeros((h, w), np.float32)
    norm = np.zeros((h, w), np.float32)

    for start in range(0, len(coords), batch):
        chunk = coords[start:start + batch]
        tiles = np.stack([image[y:y + window, x:x + window] for y, x in
                          chunk])
        if len(chunk) < batch:  # pad to the compiled batch size
            pad = np.zeros((batch - len(chunk), window, window, 3),
                           np.float32)
            tiles = np.concatenate([tiles, pad])
        preds = np.asarray(predict_fn(jnp.asarray(tiles)))
        for (y, x), p in zip(chunk, preds):
            acc[y:y + window, x:x + window] += p * weight
            norm[y:y + window, x:x + window] += weight
    return acc / np.maximum(norm, 1e-8)
