"""Autoencoder pretraining workload (`segFormer_autoencoder_main.py`).

The SegFormer decode head with num_labels=3 reconstructs the input tile:
forward -> upsample logits to image size -> sigmoid -> reference-MSE against
the input image (`models/SegFormerModel.py:198-219`). Unlike the supervised
path, the reference trains this in true train mode (`model.train()`,
`SegFormerModel.py:199`), so dropout/drop-path are ON and BatchNorm batch
stats update — reproduced via `train_mode=True`.
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


def _recon_loss(recon: Array, images: Array) -> Array:
    """Reference MSE with the (B, C, ...) divisor: the torch call sites pass
    (B,3,H,W) tensors so the divisor is B*3 (`models/Loss.py:48-52`)."""
    b = images.shape[0]
    return losses.mse_loss(recon, images, divisor=b * 3)


@functools.partial(jax.jit, static_argnames=("cfg", "accum"),
                   donate_argnames=("state",))
def ae_train_step(state: TrainState, images: Array, rng, cfg: MiTConfig,
                  accum: int = 1) -> Tuple[TrainState, Array, Array]:
    """One reconstruction update (`SegFormerModel.train_one_epoch_without_
    mask`, `:198-219`). Returns (state, loss, reconstruction).

    `accum > 1` = gradient accumulation, same semantics as
    `train/supervised.py::train_step`: `accum` microbatches scanned inside
    this one jitted step (one microbatch's activation memory), grads and
    losses averaged, one optimizer update; BN stats thread sequentially
    through the scan carry. Each microbatch keeps the FULL batch's
    reference divisor (B*3, `models/Loss.py:48-52`), so — the MSE being
    batch-linear under that fixed divisor — the accumulated loss and
    grads equal the full-batch computation exactly (unlike dice, which is
    batch-nonlinear)."""

    full_divisor = images.shape[0] * 3

    def loss_fn(params, stats, imgs, r):
        variables = {"params": params}
        if stats:
            variables["batch_stats"] = stats
        recon, _, new_stats = forward_masks(
            cfg, variables, imgs, train_mode=True, rng=r)
        loss = losses.mse_loss(recon, imgs, divisor=full_divisor)
        return loss, (recon, new_stats)

    if accum <= 1:
        (loss, (recon, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   images, rng)
    else:
        b = images.shape[0]
        if b % accum:
            raise ValueError(f"batch {b} not divisible by accum={accum}")
        mb = b // accum
        xs = (images.reshape(accum, mb, *images.shape[1:]),
              jax.random.split(rng, accum))

        def micro(stats, imgs, r):
            (loss, (recon, new_stats)), g = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, stats, imgs, r)
            return g, new_stats, loss, recon

        gsum, new_stats, lsum, recons = accumulate_microbatches(
            micro, state.params, state.batch_stats, jnp.zeros(()), xs)
        grads = jax.tree.map(lambda g: g / accum, gsum)
        loss = lsum / accum
        recon = recons.reshape(b, *recons.shape[2:])
    state = state.apply_gradients(grads, loss)
    if new_stats is not None and new_stats:
        state = state.replace(batch_stats=new_stats)
    return state, loss, recon


@functools.partial(jax.jit, static_argnames=("cfg",))
def ae_eval_step(state: TrainState, images: Array, cfg: MiTConfig
                 ) -> Tuple[Array, Array]:
    """Reconstruction eval (`SegFormerModel.eval_one_epoch_without_mask`,
    `:177-196`): eval mode, sigmoid recon, reference MSE."""
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    recon, _, _ = forward_masks(cfg, variables, images, train_mode=False)
    return _recon_loss(recon, images), recon
