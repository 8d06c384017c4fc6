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
from semisupervisedobjectdetection_tpu.train.common import forward_masks
from semisupervisedobjectdetection_tpu.train.state import TrainState

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("cfg", "loss_type",
                                             "train_mode"),
                   donate_argnames=("state",))
def train_step(state: TrainState, images: Array, masks: Array, rng,
               cfg: MiTConfig, loss_type: str = "dice",
               train_mode: bool = False
               ) -> Tuple[TrainState, Array, Array]:
    """One supervised update. Returns (state, loss, predicted_masks).

    `train_mode=False` is reference-quirks parity (forward in eval mode,
    `SegFormerModel.py:104-105`); True enables dropout/drop-path/BN-update.
    """

    def loss_fn(params):
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        pred, _, new_stats = forward_masks(
            cfg, variables, images, train_mode=train_mode, rng=rng)
        loss = losses.segmentation_loss(pred, masks, loss_type)
        return loss, (pred, new_stats)

    (loss, (pred, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads, loss)
    if new_stats is not None:
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
