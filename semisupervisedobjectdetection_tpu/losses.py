"""Segmentation losses, rebuilt in JAX.

Reproduces the reference loss library (`models/Loss.py`) numerics exactly:
dice with smooth=1 (`Loss.py:16-41`), binarized "argmax" dice used as the
eval metric (`Loss.py:84-86`), the idiosyncratic MSE normalization that
divides per-sample sums by batch*channels (`Loss.py:44-54`), plus BCE and the
cosine inter/intra domain losses of the few-shot path
(`main_segformer/segFormer_fewshot_learning.py:219-225`).

All functions are pure, jit-safe and support an optional per-sample weight
vector so semi-supervised sample filtering (reference
`segFormer_semi_teacherstudent_main.py:42-48` drops batch rows in Python)
becomes masked arithmetic with static shapes on TPU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _flatten_per_sample(x: Array) -> Array:
    return x.reshape(x.shape[0], -1)


def dice_coeff(pred: Array, gt: Array, smooth: float = 1.0,
               sample_weight: Optional[Array] = None) -> Array:
    """Per-batch mean dice coefficient, (2*tp + s) / (fp + fn + s).

    Matches reference `diceCoeff` with activation='none' (`Loss.py:16-41`):
    tp = |sum(gt*pred)|, fp = sum(|pred|), fn = sum(gt), per sample, then
    score = (2*tp + smooth)/(fp + fn + smooth), averaged over the batch.
    `sample_weight` re-weights the batch mean (weights are normalized).
    """
    pred_flat = _flatten_per_sample(pred).astype(jnp.float32)
    gt_flat = _flatten_per_sample(gt).astype(jnp.float32)
    tp = jnp.abs(jnp.sum(gt_flat * pred_flat, axis=1))
    fp = jnp.sum(jnp.abs(pred_flat), axis=1)
    fn = jnp.sum(gt_flat, axis=1)
    score = (2.0 * tp + smooth) / (fp + fn + smooth)
    if sample_weight is None:
        return jnp.mean(score)
    w = sample_weight.astype(jnp.float32)
    return jnp.sum(score * w) / jnp.maximum(jnp.sum(w), 1e-8)


def dice_loss(pred: Array, gt: Array,
              sample_weight: Optional[Array] = None) -> Array:
    """1 - mean dice (reference `SegmentationLoss` with loss_type='dice',
    num_classes=1, activation='none' — `Loss.py:80-95`)."""
    return 1.0 - dice_coeff(pred, gt, sample_weight=sample_weight)


def dice_argmax_loss(pred: Array, gt: Array,
                     sample_weight: Optional[Array] = None) -> Array:
    """1 - dice of predictions binarized at 0.5 — the reference eval metric
    (`Loss.py:84-86`, called via `SegFormerModel.eval_one_epoch`)."""
    pred_bin = jnp.where(pred >= 0.5, 1.0, 0.0)
    return 1.0 - dice_coeff(pred_bin, gt, sample_weight=sample_weight)


def mse_loss(pred: Array, gt: Array,
             sample_weight: Optional[Array] = None,
             divisor: Optional[int] = None) -> Array:
    """Reference MSE (`Loss.py:44-54`): per-sample sum of squared error over
    all pixels, divided by (batch * channels) — NOT by pixel count — then
    batch-averaged. Reproduced exactly for loss-curve parity.

    The reference computes the divisor as gt.shape[0] * gt.shape[1] with gt
    in torch's (B, C, H, W) layout. Our tensors are NHWC, so autoencoder call
    sites pass `divisor=B*C` explicitly; the default mirrors the reference
    formula on whatever layout is given.
    """
    n = gt.shape[0]
    if divisor is None:
        divisor = gt.shape[0] * gt.shape[1]
    gt_flat = gt.reshape(n, -1).astype(jnp.float32)
    pred_flat = pred.reshape(n, -1).astype(jnp.float32)
    err = jnp.sum((gt_flat - pred_flat) ** 2, axis=1) / divisor
    if sample_weight is None:
        return jnp.mean(err)
    w = sample_weight.astype(jnp.float32)
    return jnp.sum(err * w) / jnp.maximum(jnp.sum(w), 1e-8)


def bce_with_logits_loss(logits: Array, labels: Array,
                         valid_mask: Optional[Array] = None) -> Array:
    """Binary cross-entropy on logits, mean over valid pixels.

    Matches the vendored SegFormer num_labels==1 loss
    (`modeling_segformer.py:863-868`): BCEWithLogits per pixel, multiplied by
    a validity mask (labels >= 0 and != ignore_index), then `.mean()` over
    ALL pixels (the reference averages the masked loss over the full tensor,
    not the valid count — reproduced).
    """
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    # Numerically stable BCE-with-logits.
    per_pixel = jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    if valid_mask is not None:
        per_pixel = per_pixel * valid_mask.astype(jnp.float32)
    return jnp.mean(per_pixel)


def cosine_similarity(a: Array, b: Array, axis: int = -1,
                      eps: float = 1e-8) -> Array:
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    dot = jnp.sum(a * b, axis=axis)
    na = jnp.sqrt(jnp.sum(a * a, axis=axis))
    nb = jnp.sqrt(jnp.sum(b * b, axis=axis))
    return dot / jnp.maximum(na * nb, eps)


def inter_domain_loss(cls_a: Array, cls_b: Array) -> Array:
    """0.5 + 0.5*mean(cos(cls_a, cls_b)) — pushes the CLS embeddings of two
    different domains apart (`segFormer_fewshot_learning.py:219-220`).

    cls_* have shape (B, 1, C) (carried CLS token per sample); the reference
    squeezes dim 1 and uses CosineSimilarity(dim=1) over channels.
    """
    a = cls_a.squeeze(1)
    b = cls_b.squeeze(1)
    return 0.5 + 0.5 * jnp.mean(cosine_similarity(a, b, axis=1))


def intra_domain_loss(cls_tokens: Array) -> Array:
    """0.5 - 0.5*mean(cos(first_half, second_half)) — pulls within-domain CLS
    embeddings together (`segFormer_fewshot_learning.py:222-225`)."""
    b = cls_tokens.shape[0]
    half = b // 2
    first = cls_tokens[:half].squeeze(1)
    second = cls_tokens[-half:].squeeze(1)
    return 0.5 - 0.5 * jnp.mean(cosine_similarity(first, second, axis=1))


def cross_entropy_loss(pred: Array, gt: Array, axis: int = -1) -> Array:
    """Softmax cross-entropy with probability targets over `axis`.

    Matches torch `F.cross_entropy(y_pred, y_true.float())` as called by the
    reference dispatcher (`models/Loss.py:88-92`): with float (probability)
    targets torch computes -sum_c(target_c * log_softmax(pred)_c) per pixel,
    then means over all remaining dims (`ignore_index` has no effect on
    probability targets). Single-channel inputs (B, H, W) get a trailing
    class axis, where log_softmax over one class is identically 0 — the
    reference has the same degenerate behavior for num_classes=1.
    """
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    if pred.ndim == 3:
        pred = pred[..., None]
        gt = gt[..., None]
        axis = -1
    logp = jax.nn.log_softmax(pred, axis=axis)
    return jnp.mean(-jnp.sum(gt * logp, axis=axis))


def segmentation_loss(pred: Array, gt: Array, loss_type: str = "dice",
                      sample_weight: Optional[Array] = None) -> Array:
    """Dispatching front-end mirroring reference `SegmentationLoss.forward`
    (`Loss.py:66-95`) for num_classes=1."""
    if loss_type == "dice":
        return dice_loss(pred, gt, sample_weight)
    if loss_type == "dice_argmax" or loss_type == "argmax":
        return dice_argmax_loss(pred, gt, sample_weight)
    if loss_type == "mse":
        return mse_loss(pred, gt, sample_weight)
    if loss_type == "cross_entropy":
        # The reference appends CE into class_score and returns
        # `1 - mean(class_score)` like the dice branches (`Loss.py:88-95`)
        # — i.e. it literally returns 1 - CE. Reproduced verbatim.
        return 1.0 - cross_entropy_loss(pred, gt)
    raise ValueError(f"unknown loss_type: {loss_type}")
