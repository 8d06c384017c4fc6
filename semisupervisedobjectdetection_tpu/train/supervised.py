"""Supervised SegFormer fine-tune workload — the reference's
`main_segformer/segFormer_main.py` path as two jitted steps.

train step = forward + dice loss + clipped Adam update (ref call stack in
SURVEY.md §3.1); eval step = forward + binarized-dice metric
(`SegFormerModel.eval_one_epoch`, `models/SegFormerModel.py:141-144`).

Both steps are donatable and mesh-ready: batches sharded over the `data`
axis, params replicated; XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from semisupervisedobjectdetection_tpu.core.config import MiTConfig
from semisupervisedobjectdetection_tpu import losses
from semisupervisedobjectdetection_tpu.train.common import (
    accumulate_microbatches,
    forward_masks,
)
from semisupervisedobjectdetection_tpu.train.state import TrainState

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("cfg", "loss_type",
                                             "train_mode", "accum"),
                   donate_argnames=("state",))
def train_step(state: TrainState, images: Array, masks: Array, rng,
               cfg: MiTConfig, loss_type: str = "dice",
               train_mode: bool = False, accum: int = 1
               ) -> Tuple[TrainState, Array, Array]:
    """One supervised update. Returns (state, loss, predicted_masks).

    `train_mode=False` is reference-quirks parity (forward in eval mode,
    `SegFormerModel.py:104-105`); True enables dropout/drop-path/BN-update.

    `accum > 1` = gradient accumulation: the batch is split into `accum`
    microbatches scanned sequentially inside this ONE jitted step
    (`lax.scan`, so peak activation memory is one microbatch's), grads
    and losses are averaged, and a single optimizer update is applied —
    the standard way to train effective batches that do not fit HBM (no
    reference counterpart; the reference is single-GPU batch-bound).
    Note the per-microbatch loss mean is not bit-identical to the
    full-batch loss for batch-nonlinear losses (dice normalizes over the
    batch), matching the usual accumulation semantics. BatchNorm stats
    (train_mode=True) thread through the scan carry, i.e. update
    sequentially exactly as `accum` separate forwards would.
    """

    def loss_fn(params, stats, imgs, msks, r):
        variables = {"params": params}
        if stats:
            variables["batch_stats"] = stats
        pred, _, new_stats = forward_masks(
            cfg, variables, imgs, train_mode=train_mode, rng=r)
        loss = losses.segmentation_loss(pred, msks, loss_type)
        return loss, (pred, new_stats)

    if accum <= 1:
        (loss, (pred, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   images, masks, rng)
    else:
        b = images.shape[0]
        if b % accum:
            raise ValueError(f"batch {b} not divisible by accum={accum}")
        mb = b // accum
        xs = (images.reshape(accum, mb, *images.shape[1:]),
              masks.reshape(accum, mb, *masks.shape[1:]),
              jax.random.split(rng, accum))

        def micro(stats, imgs, msks, r):
            (loss, (pred, new_stats)), g = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, stats, imgs, msks, r)
            return g, new_stats, loss, pred

        gsum, new_stats, lsum, preds = accumulate_microbatches(
            micro, state.params, state.batch_stats, jnp.zeros(()), xs)
        grads = jax.tree.map(lambda g: g / accum, gsum)
        loss = lsum / accum
        pred = preds.reshape(b, *preds.shape[2:])
        new_stats = new_stats if train_mode else None
    state = state.apply_gradients(grads, loss)
    if new_stats is not None and new_stats:
        state = state.replace(batch_stats=new_stats)
    return state, loss, pred


@functools.partial(jax.jit, static_argnames=("cfg", "loss_type"))
def eval_step(state: TrainState, images: Array, masks: Array,
              cfg: MiTConfig, loss_type: str = "dice_argmax"
              ) -> Tuple[Array, Array]:
    """Eval: forward in eval mode + binarized dice loss (the reference eval
    metric — dice of pred>=0.5, `models/Loss.py:84-86`)."""
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    pred, _, _ = forward_masks(cfg, variables, images, train_mode=False)
    loss = losses.segmentation_loss(pred, masks, loss_type)
    return loss, pred


@functools.partial(jax.jit, static_argnames=("cfg",))
def predict_step(state: TrainState, images: Array, cfg: MiTConfig) -> Array:
    """Inference only: sigmoid masks at input resolution
    (`SegFormerModel.predict` with mask=None, `SegFormerModel.py:126-127`)."""
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    pred, _, _ = forward_masks(cfg, variables, images, train_mode=False)
    return pred
