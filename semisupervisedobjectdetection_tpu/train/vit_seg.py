"""ViT-pipeline workloads: segmentation, autoencoder, teacher-student.

Rebuilds the reference's abandoned-but-shipped DINOv2 path
(`models/VitSegModel.py`, `main_vit_based/`): a DINOv2 encoder + token
decoder trained with dice loss (value-clip 1.2, Adam(0.5, 0.999) — same
constants as the SegFormer wrapper, `VitSegModel.py:34-41`), an autoencoder
variant with the per-patch L1 / cycle losses, and a pseudo-label
teacher-student variant reusing `train/pseudo.py`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from semisupervisedobjectdetection_tpu import losses
from semisupervisedobjectdetection_tpu.core.config import TrainConfig
from semisupervisedobjectdetection_tpu.models.vit import DinoViT, vit_base
from semisupervisedobjectdetection_tpu.models.vit_decoder import (
    TokenDecoder,
    ViTEncoderDecoder,
    patch_loss,
)
from semisupervisedobjectdetection_tpu.train import pseudo
from semisupervisedobjectdetection_tpu.train.state import TrainState

Array = jax.Array


def build_vit_seg(img_size: int = 512, patch_size: int = 14,
                  out_chans: int = 1, variant: str = "base",
                  dtype: str = "float32",
                  depth: int | None = None) -> ViTEncoderDecoder:
    """Encoder+decoder pair mirroring `VitSegModel.__init__`
    (`VitSegModel.py:20-27`): decoder depth/width matches the encoder."""
    from semisupervisedobjectdetection_tpu.models import vit as vit_lib

    kw = dict(img_size=img_size, patch_size=patch_size, dtype_str=dtype)
    if depth is not None:
        kw["depth"] = depth
    enc = getattr(vit_lib, f"vit_{variant}")(**kw)
    dec = TokenDecoder(
        img_size=(img_size, img_size), patch_size=patch_size,
        out_chans=out_chans, embed_dim=enc.embed_dim,
        depth=enc.depth if depth is None else depth,
        num_heads=enc.num_heads, dtype_str=dtype)
    return ViTEncoderDecoder(enc, dec)


def create_vit_state(model: ViTEncoderDecoder, tc: TrainConfig, rng,
                     img_size: int = 512,
                     froze_encoder: bool = False) -> TrainState:
    """`froze_encoder=True` freezes the whole DINOv2 encoder (the
    reference freezes all encoder blocks / parameters —
    `ViT_EncoderDecoder.py:19-24`, `feature_points_matching_main.py:104`,
    `ViT_AutoEncoder.py:18-20`)."""
    from semisupervisedobjectdetection_tpu.train.state import (
        trainable_mask_from,
    )

    variables = jax.jit(model.init)(rng,
                                    jnp.zeros((1, img_size, img_size, 3)))
    mask = None
    if froze_encoder:
        mask = trainable_mask_from(
            variables["params"], lambda path: path and
            path[0] == "encoder")
    return TrainState.create(variables, tc, trainable_mask=mask)


def _apply(model, state, images):
    out, tokens = model.apply({"params": state.params}, images)
    return out, tokens


def make_vit_steps(model: ViTEncoderDecoder):
    """Build the jitted steps for one ViT model instance. (The model is a
    Python-side constant; closures keep the steps cache-friendly.)"""

    @functools.partial(jax.jit, donate_argnames=("state",))
    def seg_train_step(state: TrainState, images: Array, masks: Array
                       ) -> Tuple[TrainState, Array, Array]:
        """Dice training like `VitSegModel.train_one_epoch`
        (`VitSegModel.py:50-63`): sigmoid(decoder output) vs mask."""

        def loss_fn(params):
            out, _ = model.apply({"params": params}, images)
            pred = jax.nn.sigmoid(out[..., 0])
            return losses.dice_loss(pred, masks), pred

        (loss, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads, loss)
        return state, loss, pred

    @jax.jit
    def seg_eval_step(state: TrainState, images: Array, masks: Array):
        out, _ = model.apply({"params": state.params}, images)
        pred = jax.nn.sigmoid(out[..., 0])
        return losses.dice_argmax_loss(pred, masks), pred

    @functools.partial(jax.jit, donate_argnames=("state",))
    def ae_train_step(state: TrainState, images: Array
                      ) -> Tuple[TrainState, Array, Array]:
        """Reconstruction with per-patch L1 (`main_vit_based/
        vit_autoencoder_main.py` uses EncoderDecoder.patch_loss)."""

        def loss_fn(params):
            out, _ = model.apply({"params": params}, images)
            return patch_loss(out, images, model.decoder.patch_size), out

        (loss, recon), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads, loss)
        return state, loss, recon

    @functools.partial(jax.jit, donate_argnames=("state",))
    def pseudo_step(state: TrainState, images: Array, update: Array):
        """Teacher pseudo phase for the ViT variant: self-train on
        confidence-gated pseudo-labels of the unlabeled batch
        (`main_vit_based/vit_semi_teacherstudent_main.py:81-94` — the ViT
        script updates on EVERY batch, no epoch gating)."""

        def loss_fn(params):
            out, _ = model.apply({"params": params}, images)
            soft = jax.nn.sigmoid(out[..., 0])
            labels = pseudo.threshold_pseudo_masks(soft)
            return labels.loss, labels

        (loss, labels), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads, loss, enable=update)
        return state, loss, labels

    @functools.partial(jax.jit,
                       donate_argnames=("teacher_state", "student_state"))
    def ts_labeled_step(teacher_state: TrainState,
                        student_state: TrainState, images: Array,
                        ground_truth: Array, supervise_weight: Array):
        """ViT teacher-student labeled phase (`vit_semi_teacherstudent_
        main.py:99-115`): teacher trains on GT; student trains on
        supervise_weight*dice(student,GT) +
        (1-supervise_weight)*dice(student, teacher_pred)."""

        def t_loss_fn(params):
            out, _ = model.apply({"params": params}, images)
            pred = jax.nn.sigmoid(out[..., 0])
            return losses.dice_loss(pred, ground_truth), \
                jax.lax.stop_gradient(pred)

        (t_loss, teacher_pred), t_grads = jax.value_and_grad(
            t_loss_fn, has_aux=True)(teacher_state.params)
        teacher_state = teacher_state.apply_gradients(t_grads, t_loss)

        def s_loss_fn(params):
            out, _ = model.apply({"params": params}, images)
            pred = jax.nn.sigmoid(out[..., 0])
            sup = losses.dice_loss(pred, ground_truth)
            self_sup = losses.dice_loss(pred, teacher_pred)
            return (supervise_weight * sup
                    + (1.0 - supervise_weight) * self_sup), (sup, self_sup)

        (s_loss, (sup, self_sup)), s_grads = jax.value_and_grad(
            s_loss_fn, has_aux=True)(student_state.params)
        student_state = student_state.apply_gradients(s_grads, s_loss)
        return teacher_state, student_state, s_loss, t_loss

    return (seg_train_step, seg_eval_step, ae_train_step, pseudo_step,
            ts_labeled_step)
