"""Shared forward helpers for the jitted train steps."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from semisupervisedobjectdetection_tpu.core.config import MiTConfig
from semisupervisedobjectdetection_tpu.models.segformer import (
    SegFormer,
    predict_masks,
)

Array = jax.Array


def forward_masks(cfg: MiTConfig, variables: dict, images: Array, *,
                  train_mode: bool = False, rng=None,
                  want_cls: bool = False):
    """Run the model and return sigmoid masks at image resolution.

    `train_mode=False` reproduces the reference quirk of supervised training
    forward passes running in eval mode (`models/SegFormerModel.py:104-105`):
    dropout/drop-path off, BatchNorm running stats. `train_mode=True` is the
    torch `model.train()` path used by the autoencoder workload
    (`SegFormerModel.py:198-202`): dropout on, BN batch stats updated.

    Returns (masks, cls_list, new_batch_stats|None). masks has shape
    (B, H, W) for num_labels=1 else (B, H, W, L).
    """
    model = SegFormer(cfg, deterministic=not train_mode,
                      train_bn=train_mode)
    rngs = None
    if train_mode and rng is not None:
        r1, r2 = jax.random.split(rng)
        rngs = {"dropout": r1, "droppath": r2}
    if train_mode:
        (logits, cls_list), mutated = model.apply(
            variables, images, rngs=rngs, mutable=["batch_stats"])
        new_stats = mutated["batch_stats"]
    else:
        logits, cls_list = model.apply(variables, images, rngs=rngs)
        new_stats = None
    masks = predict_masks(logits, images.shape[1:3])
    return masks, cls_list, new_stats


def accumulate_microbatches(micro_fn, params, init_stats, sums_zero, xs):
    """Gradient-accumulation scan shared by the supervised, autoencoder
    and EMA train steps.

    Runs ``micro_fn(stats, *x) -> (grads, new_stats, sums, out)`` over the
    leading (microbatch) axis of ``xs`` inside one `lax.scan` — so peak
    activation memory is a single microbatch's — summing ``grads`` (tree
    of ``params``' structure) and ``sums`` (any scalar pytree, structure
    of ``sums_zero``), threading BatchNorm stats through the carry exactly
    as sequential forwards would (``new_stats=None`` keeps the carried
    stats), and stacking ``out`` along the scan axis.

    Returns ``(summed_grads, final_stats, summed_sums, stacked_out)``.
    Callers divide by the microbatch count for means (the EMA step's
    kept-counts stay true sums) and reshape the stacked outputs. No
    reference counterpart (the reference is single-GPU batch-bound).
    """

    def body(carry, x):
        stats, gsum, ssum = carry
        grads, new_stats, sums, out = micro_fn(stats, *x)
        stats = new_stats if new_stats is not None else stats
        gsum = jax.tree.map(jnp.add, gsum, grads)
        ssum = jax.tree.map(jnp.add, ssum, sums)
        return (stats, gsum, ssum), out

    gzero = jax.tree.map(jnp.zeros_like, params)
    (stats, gsum, ssum), outs = jax.lax.scan(
        body, (init_stats, gzero, sums_zero), xs)
    return gsum, stats, ssum, outs


def forward_logits(cfg: MiTConfig, variables: dict, images: Array, *,
                   train_mode: bool = False, rng=None):
    """Run the model and return raw upsampled logits (pre-sigmoid), used by
    the few-shot MSE path (`SegFormerModel.predict` use_loss='mse' compares
    the image against raw upsampled logits — `SegFormerModel.py:133`)."""
    from semisupervisedobjectdetection_tpu.models.segformer import (
        upsample_bilinear,
    )

    model = SegFormer(cfg, deterministic=not train_mode,
                      train_bn=train_mode)
    rngs = None
    if train_mode and rng is not None:
        r1, r2 = jax.random.split(rng)
        rngs = {"dropout": r1, "droppath": r2}
    if train_mode:
        (logits, cls_list), mutated = model.apply(
            variables, images, rngs=rngs, mutable=["batch_stats"])
        new_stats = mutated["batch_stats"]
    else:
        logits, cls_list = model.apply(variables, images, rngs=rngs)
        new_stats = None
    up = upsample_bilinear(logits, images.shape[1:3]).astype(jnp.float32)
    return up, cls_list, new_stats
