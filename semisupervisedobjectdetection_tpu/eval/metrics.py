"""Evaluation metrics: dice and mIoU for binary site masks.

The reference's only metric is `1 - binarized dice`
(`models/Loss.py:84-86` via `SegFormerModel.eval_one_epoch`); mIoU is the
driver's parity metric (BASELINE.json) so it is provided here as well:
per-class IoU over {background, site} at threshold 0.5, averaged — the
standard segmentation definition the reference's commented
`load_metric("mean_iou")` (`segFormer_main.py:41`) would have computed.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

Array = jax.Array


def dice_score(pred: Array, gt: Array, threshold: float = 0.5) -> Array:
    """Binarized dice (the reference eval metric, higher is better)."""
    p = (pred >= threshold).astype(jnp.float32).reshape(pred.shape[0], -1)
    g = gt.astype(jnp.float32).reshape(gt.shape[0], -1)
    tp = jnp.sum(p * g, axis=1)
    return jnp.mean((2 * tp + 1.0) /
                    (jnp.sum(p, axis=1) + jnp.sum(g, axis=1) + 1.0))


def binary_miou(pred: Array, gt: Array, threshold: float = 0.5,
                eps: float = 1e-8) -> Array:
    """Mean IoU over {background, foreground}, batch-aggregated.

    All pixels in the batch are pooled into one confusion matrix before the
    per-class IoUs are computed (the "global" / dataset-level convention,
    what e.g. `evaluate`'s ``mean_iou`` computes over an accumulated epoch).
    For the convention most segmentation papers report — IoU per image, then
    averaged — use :func:`per_image_miou`.
    """
    p = (pred >= threshold).astype(jnp.float32)
    g = (gt >= 0.5).astype(jnp.float32)
    inter_fg = jnp.sum(p * g)
    union_fg = jnp.sum(jnp.maximum(p, g))
    pn, gn = 1.0 - p, 1.0 - g
    inter_bg = jnp.sum(pn * gn)
    union_bg = jnp.sum(jnp.maximum(pn, gn))
    iou_fg = inter_fg / jnp.maximum(union_fg, eps)
    iou_bg = inter_bg / jnp.maximum(union_bg, eps)
    return (iou_fg + iou_bg) / 2.0


def per_image_miou(pred: Array, gt: Array, threshold: float = 0.5,
                   eps: float = 1e-8) -> Array:
    """Mean IoU computed per image, then averaged over the batch.

    The per-image convention most segmentation papers report. Differs from
    :func:`binary_miou` whenever per-image foreground fractions vary: images
    with little foreground get equal weight here instead of being swamped by
    foreground-heavy ones. An image with an empty class on BOTH sides scores
    IoU 1.0 for that class (vacuous agreement), matching the common
    "skip/perfect on absent class" handling.
    """
    b = pred.shape[0]
    p = (pred >= threshold).astype(jnp.float32).reshape(b, -1)
    g = (gt >= 0.5).astype(jnp.float32).reshape(b, -1)
    inter_fg = jnp.sum(p * g, axis=1)
    union_fg = jnp.sum(jnp.maximum(p, g), axis=1)
    pn, gn = 1.0 - p, 1.0 - g
    inter_bg = jnp.sum(pn * gn, axis=1)
    union_bg = jnp.sum(jnp.maximum(pn, gn), axis=1)
    # Empty-union classes (absent in both pred and gt) count as IoU 1.
    iou_fg = jnp.where(union_fg > 0, inter_fg / jnp.maximum(union_fg, eps), 1.0)
    iou_bg = jnp.where(union_bg > 0, inter_bg / jnp.maximum(union_bg, eps), 1.0)
    return jnp.mean((iou_fg + iou_bg) / 2.0)


def pixel_accuracy(pred: Array, gt: Array, threshold: float = 0.5) -> Array:
    p = (pred >= threshold).astype(jnp.float32)
    g = (gt >= 0.5).astype(jnp.float32)
    return jnp.mean((p == g).astype(jnp.float32))


@jax.jit
def segmentation_metrics(pred: Array, gt: Array) -> Dict[str, Array]:
    return {
        "dice": dice_score(pred, gt),
        "miou": binary_miou(pred, gt),
        "miou_per_image": per_image_miou(pred, gt),
        "pixel_acc": pixel_accuracy(pred, gt),
    }
