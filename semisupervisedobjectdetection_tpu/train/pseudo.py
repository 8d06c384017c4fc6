"""Confidence-thresholded pseudo-labeling as static-shape masked arithmetic.

Rebuilds `threshold_pseudo_masks`
(`main_segformer/segFormer_semi_teacherstudent_main.py:24-56`) without the
reference's Python-list batch filtering (which produces dynamic shapes):
samples that fail the confidence gate get weight 0 instead of being dropped,
so the whole computation stays inside one compiled step on TPU.

Reference semantics reproduced:
- per-sample "pixel_num" = sum of soft probabilities (`:28`)
- per-sample confidence = fraction of pixels with p >= thr or p <= 1-thr (`:29-31`)
- pseudo mask = p >= thr binarized (`:33`)
- keep iff pixel_num > 1000 AND confidence >= confident_thr (`:43`), unless
  allow_throw_sample=False (every sample kept)
- loss = mean over KEPT samples of per-sample dice(pred, pseudo) (`:47-56`);
  the reference divides by the kept count and yields inf when none are kept —
  we return the count separately and guard the division.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from semisupervisedobjectdetection_tpu import losses

Array = jax.Array

PSEUDO_MASK_THRESHOLD = 0.7     # ref `:18`
CONFIDENT_THRESHOLD = 0.7       # ref `:19`
MIN_FG_SOFT_PIXELS = 1000.0     # ref `:43`


class PseudoLabels(NamedTuple):
    pseudo_mask: Array      # (B,H,W) {0,1} binarized at threshold
    keep: Array             # (B,) f32 {0,1} confidence gate
    confidence: Array       # (B,) f32 per-sample confidence
    loss: Array             # scalar: mean per-sample dice loss over kept
    n_kept: Array           # scalar f32


def _per_sample_dice_loss(pred: Array, target: Array) -> Array:
    """Per-sample 1-dice, vectorized (each sample is its own 'batch' exactly
    as the reference's per-sample `loss_func(masks[n], pseudo_mask[n])`)."""
    b = pred.shape[0]
    p = pred.reshape(b, -1).astype(jnp.float32)
    t = target.reshape(b, -1).astype(jnp.float32)
    tp = jnp.abs(jnp.sum(t * p, axis=1))
    fp = jnp.sum(jnp.abs(p), axis=1)
    fn = jnp.sum(t, axis=1)
    return 1.0 - (2.0 * tp + 1.0) / (fp + fn + 1.0)


def threshold_pseudo_masks(soft_masks: Array,
                           threshold: float = PSEUDO_MASK_THRESHOLD,
                           confident_threshold: float = CONFIDENT_THRESHOLD,
                           allow_throw_sample: bool = True) -> PseudoLabels:
    """soft_masks: (B, H, W) sigmoid teacher predictions in [0, 1]."""
    b = soft_masks.shape[0]
    flat = soft_masks.reshape(b, -1).astype(jnp.float32)
    pixel_num = jnp.sum(jnp.abs(flat), axis=1)
    confident_px = jnp.logical_or(flat >= threshold,
                                  flat <= 1.0 - threshold)
    confidence = jnp.mean(confident_px.astype(jnp.float32), axis=1)
    pseudo = jnp.where(soft_masks >= threshold, 1.0, 0.0)

    if allow_throw_sample:
        keep = jnp.logical_and(pixel_num > MIN_FG_SOFT_PIXELS,
                               confidence >= confident_threshold)
        keep = keep.astype(jnp.float32)
    else:
        keep = jnp.ones((b,), jnp.float32)

    per_sample = _per_sample_dice_loss(soft_masks,
                                       jax.lax.stop_gradient(pseudo))
    n_kept = jnp.sum(keep)
    loss = jnp.sum(per_sample * keep) / jnp.maximum(n_kept, 1.0)
    # Reference divides by len(kept) -> inf when empty; emit NaN so the
    # NaN-skip update gate treats it as "no step", preserving behavior.
    loss = jnp.where(n_kept > 0, loss, jnp.nan)
    return PseudoLabels(pseudo_mask=pseudo, keep=keep,
                        confidence=confidence, loss=loss, n_kept=n_kept)


def denoise_labels(teacher_pred: Array, ground_truth: Array,
                   threshold: float = PSEUDO_MASK_THRESHOLD) -> Array:
    """Label denoising (`segFormer_semi_teacherstudent_main.py:110-118`):
    blend teacher prediction with 0.2*GT - 0.1, clamp to [0,1], then
    re-binarize at the pseudo threshold. Returns the denoised {0,1} mask."""
    blended = teacher_pred + 0.2 * ground_truth - 0.1
    blended = jnp.clip(blended, 0.0, 1.0)
    return jnp.where(blended >= threshold, 1.0, 0.0)
