"""CNN-baseline workload (`main_other/baseline_segmentation.py`).

One jitted train step per architecture: forward (true train mode — the
reference calls `model.train()`, `:99`), dice loss WITH sigmoid activation
inside the loss (`SegmentationLoss(1, 'dice', activation='sigmoid')`,
`:86`), grad-NORM clip 35 (`:111` — note: norm clip, unlike the SegFormer
path's value clip 1.2), Adam(0.5, 0.999) + per-epoch exponential decay.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from semisupervisedobjectdetection_tpu import losses
from semisupervisedobjectdetection_tpu.core.config import TrainConfig
from semisupervisedobjectdetection_tpu.models.cnn import SegmentationCNN
from semisupervisedobjectdetection_tpu.train.state import TrainState

Array = jax.Array


_CNN_TRANSFORM_CACHE: dict = {}


def make_cnn_transform(tc: TrainConfig) -> optax.GradientTransformation:
    """Like the SegFormer chain but with the baseline script's grad-NORM
    clip of 35 (`baseline_segmentation.py:111`). Memoized like
    `state.make_transform` (tx is jit-static)."""
    key = (tc.weight_decay, tc.adam_b1, tc.adam_b2)
    tx = _CNN_TRANSFORM_CACHE.get(key)
    if tx is None:
        tx = optax.chain(
            optax.clip_by_global_norm(35.0),
            optax.add_decayed_weights(tc.weight_decay),
            optax.scale_by_adam(b1=tc.adam_b1, b2=tc.adam_b2),
            optax.scale(-1.0),
        )
        _CNN_TRANSFORM_CACHE[key] = tx
    return tx


def create_cnn_state(arch: str, tc: TrainConfig, rng,
                     input_hw=(512, 512), num_labels: int = 1,
                     dtype: str = "float32",
                     encoder_depths=(3, 4, 23, 3), groups: int = 32,
                     base_width: int = 8) -> Tuple[TrainState, dict]:
    import jax.numpy as jnp

    meta = {"arch": arch, "num_labels": num_labels, "dtype": dtype,
            "encoder_depths": tuple(encoder_depths), "groups": groups,
            "base_width": base_width}
    model = _model(meta)
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, jnp.zeros((1, *input_hw, 3)), train=False)
    state = TrainState.create(variables, tc)
    tx = make_cnn_transform(tc)
    state = state.replace(tx=tx, opt_state=tx.init(state.params))
    return state, meta


def _model(meta) -> SegmentationCNN:
    return SegmentationCNN(
        arch=meta["arch"], num_labels=meta["num_labels"],
        encoder_depths=meta.get("encoder_depths", (3, 4, 23, 3)),
        groups=meta.get("groups", 32),
        base_width=meta.get("base_width", 8),
        dtype=jnp.bfloat16 if meta["dtype"] == "bfloat16" else jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("arch", "num_labels", "dtype",
                                    "encoder_depths", "groups",
                                    "base_width", "accum"),
                   donate_argnames=("state",))
def cnn_train_step(state: TrainState, images: Array, masks: Array, rng,
                   arch: str, num_labels: int = 1, dtype: str = "float32",
                   encoder_depths=(3, 4, 23, 3), groups: int = 32,
                   base_width: int = 8, accum: int = 1):
    meta = {"arch": arch, "num_labels": num_labels, "dtype": dtype,
            "encoder_depths": encoder_depths, "groups": groups,
            "base_width": base_width}
    model = _model(meta)

    def loss_grad(params, stats, im, mk, r):
        def loss_fn(p):
            variables = {"params": p, "batch_stats": stats}
            logits, mutated = model.apply(variables, im, train=True,
                                          mutable=["batch_stats"],
                                          rngs={"dropout": r})
            pred = logits[..., 0] if num_labels == 1 else logits
            # dice with sigmoid activation applied inside the loss (`:86`)
            loss = losses.dice_loss(jax.nn.sigmoid(pred), mk)
            return loss, (pred, mutated["batch_stats"])

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    if accum > 1:
        # gradient accumulation: microbatches scanned via the shared
        # helper (mean grads/loss, one norm-clipped Adam step, BN stats
        # threaded sequentially) — standard accum semantics, no reference
        # counterpart (the baseline script is single-GPU batch-bound)
        from semisupervisedobjectdetection_tpu.train.common import (
            accumulate_microbatches,
        )

        b = images.shape[0]
        if b % accum:
            raise ValueError(f"batch {b} not divisible by accum={accum}")
        mb = b // accum
        xs = (images.reshape(accum, mb, *images.shape[1:]),
              masks.reshape(accum, mb, *masks.shape[1:]),
              jax.random.split(rng, accum))

        def micro(stats, im, mk, r):
            (loss, (pred, new_stats)), grads = loss_grad(
                state.params, stats, im, mk, r)
            return grads, new_stats, dict(loss=loss), pred

        gsum, new_stats, sums, preds = accumulate_microbatches(
            micro, state.params, state.batch_stats,
            dict(loss=jnp.zeros(())), xs)
        grads = jax.tree.map(lambda g: g / accum, gsum)
        loss = sums["loss"] / accum
        pred = preds.reshape(b, *preds.shape[2:])
    else:
        (loss, (pred, new_stats)), grads = loss_grad(
            state.params, state.batch_stats, images, masks, rng)

    state = state.apply_gradients(grads, loss)
    state = state.replace(batch_stats=new_stats)
    return state, loss, jax.nn.sigmoid(pred)


@functools.partial(jax.jit,
                   static_argnames=("arch", "num_labels", "dtype",
                                    "encoder_depths", "groups",
                                    "base_width"))
def cnn_eval_step(state: TrainState, images: Array, masks: Array,
                  arch: str, num_labels: int = 1, dtype: str = "float32",
                  encoder_depths=(3, 4, 23, 3), groups: int = 32,
                  base_width: int = 8):
    meta = {"arch": arch, "num_labels": num_labels, "dtype": dtype,
            "encoder_depths": encoder_depths, "groups": groups,
            "base_width": base_width}
    model = _model(meta)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    logits = model.apply(variables, images, train=False)
    pred = logits[..., 0] if num_labels == 1 else logits
    loss = losses.dice_loss(jax.nn.sigmoid(pred), masks)
    return loss, jax.nn.sigmoid(pred)
