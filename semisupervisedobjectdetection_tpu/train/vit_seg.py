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
    Python-side constant; closures keep the steps cache-friendly.)

    Every gradient step takes `accum` (static): >1 scans microbatches for
    gradient accumulation — mean of microbatch grads (exact pooled-kept
    division for the pseudo step), ONE optimizer update. The ViT forwards
    are deterministic (no BN, no dropout rngs in these steps), so
    accumulation is bitwise-equivalent to averaging full-batch microbatch
    grads. No reference counterpart (single-GPU batch-bound)."""

    def _microbatch(xs, accum):
        b = xs[0].shape[0]
        if b % accum:
            raise ValueError(f"batch {b} not divisible by accum={accum}")
        mb = b // accum
        return tuple(x.reshape(accum, mb, *x.shape[1:]) for x in xs)

    def _accum_grads(micro_fn, params, xs):
        """Scan `micro_fn(*x) -> (loss_like, aux, grads)`, summing losses
        and grads, stacking aux (`train/common.accumulate_microbatches`
        without the BN-stats carry these stateless steps don't need)."""

        def body(carry, x):
            gsum, lsum = carry
            loss, aux, g = micro_fn(*x)
            return (jax.tree.map(jnp.add, gsum, g), lsum + loss), aux

        gzero = jax.tree.map(jnp.zeros_like, params)
        (gsum, lsum), auxs = jax.lax.scan(body, (gzero, jnp.zeros(())), xs)
        return gsum, lsum, auxs

    @functools.partial(jax.jit, donate_argnames=("state",),
                       static_argnames=("accum",))
    def seg_train_step(state: TrainState, images: Array, masks: Array,
                       accum: int = 1) -> Tuple[TrainState, Array, Array]:
        """Dice training like `VitSegModel.train_one_epoch`
        (`VitSegModel.py:50-63`): sigmoid(decoder output) vs mask."""

        def loss_fn(params, im, mk):
            out, _ = model.apply({"params": params}, im)
            pred = jax.nn.sigmoid(out[..., 0])
            return losses.dice_loss(pred, mk), pred

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if accum > 1:
            b = images.shape[0]
            xs = _microbatch((images, masks), accum)

            def micro(im, mk):
                (loss, pred), g = grad_fn(state.params, im, mk)
                return loss, pred, g

            gsum, lsum, preds = _accum_grads(micro, state.params, xs)
            grads = jax.tree.map(lambda g: g / accum, gsum)
            loss = lsum / accum
            pred = preds.reshape(b, *preds.shape[2:])
        else:
            (loss, pred), grads = grad_fn(state.params, images, masks)
        state = state.apply_gradients(grads, loss)
        return state, loss, pred

    @jax.jit
    def seg_eval_step(state: TrainState, images: Array, masks: Array):
        out, _ = model.apply({"params": state.params}, images)
        pred = jax.nn.sigmoid(out[..., 0])
        return losses.dice_argmax_loss(pred, masks), pred

    @functools.partial(jax.jit, donate_argnames=("state",),
                       static_argnames=("accum",))
    def ae_train_step(state: TrainState, images: Array, accum: int = 1
                      ) -> Tuple[TrainState, Array, Array]:
        """Reconstruction with per-patch L1 (`main_vit_based/
        vit_autoencoder_main.py` uses EncoderDecoder.patch_loss)."""

        def loss_fn(params, im):
            out, _ = model.apply({"params": params}, im)
            return patch_loss(out, im, model.decoder.patch_size), out

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if accum > 1:
            b = images.shape[0]
            (xs,) = _microbatch((images,), accum)

            def micro(im):
                (loss, recon), g = grad_fn(state.params, im)
                return loss, recon, g

            gsum, lsum, recons = _accum_grads(micro, state.params, (xs,))
            grads = jax.tree.map(lambda g: g / accum, gsum)
            loss = lsum / accum
            recon = recons.reshape(b, *recons.shape[2:])
        else:
            (loss, recon), grads = grad_fn(state.params, images)
        state = state.apply_gradients(grads, loss)
        return state, loss, recon

    @functools.partial(jax.jit, donate_argnames=("state",),
                       static_argnames=("accum",))
    def pseudo_step(state: TrainState, images: Array, update: Array,
                    accum: int = 1):
        """Teacher pseudo phase for the ViT variant: self-train on
        confidence-gated pseudo-labels of the unlabeled batch
        (`main_vit_based/vit_semi_teacherstudent_main.py:81-94` — the ViT
        script updates on EVERY batch, no epoch gating). Accumulation is
        EXACT: grads of the undivided kept dice sum pool over microbatches
        and divide by the pooled kept count (the loss is sum-over-kept /
        kept-count — see `train/teacher_student.py::_pseudo_accum`)."""

        def labels_of(params, im):
            out, _ = model.apply({"params": params}, im)
            soft = jax.nn.sigmoid(out[..., 0])
            return pseudo.threshold_pseudo_masks(soft)

        if accum > 1:
            b = images.shape[0]
            (xs,) = _microbatch((images,), accum)

            def micro(im):
                def psum_fn(params):
                    labels = labels_of(params, im)
                    return jnp.where(labels.n_kept > 0,
                                     labels.loss * labels.n_kept, 0.0), \
                        labels

                (psum, labels), g = jax.value_and_grad(
                    psum_fn, has_aux=True)(state.params)
                return psum, (labels.pseudo_mask, labels.keep,
                              labels.confidence, labels.n_kept), g

            gsum, psum, (pm, keep, conf, kept) = _accum_grads(
                micro, state.params, (xs,))
            n_kept = jnp.sum(kept)
            grads = jax.tree.map(lambda g: g / jnp.maximum(n_kept, 1.0),
                                 gsum)
            loss = jnp.where(n_kept > 0, psum / jnp.maximum(n_kept, 1.0),
                             jnp.nan)
            labels = pseudo.PseudoLabels(
                pseudo_mask=pm.reshape(b, *pm.shape[2:]),
                keep=keep.reshape(b), confidence=conf.reshape(b),
                loss=loss, n_kept=n_kept)
        else:
            def loss_fn(params):
                labels = labels_of(params, images)
                return labels.loss, labels

            (loss, labels), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads, loss, enable=update)
        return state, loss, labels

    @functools.partial(jax.jit,
                       donate_argnames=("teacher_state", "student_state"),
                       static_argnames=("accum",))
    def ts_labeled_step(teacher_state: TrainState,
                        student_state: TrainState, images: Array,
                        ground_truth: Array, supervise_weight: Array,
                        accum: int = 1):
        """ViT teacher-student labeled phase (`vit_semi_teacherstudent_
        main.py:99-115`): teacher trains on GT; student trains on
        supervise_weight*dice(student,GT) +
        (1-supervise_weight)*dice(student, teacher_pred). Accumulated
        microbatches use each microbatch's PRE-update teacher prediction
        as the student target (the full-batch step's convention too)."""

        def t_loss_fn(params, im, gt):
            out, _ = model.apply({"params": params}, im)
            pred = jax.nn.sigmoid(out[..., 0])
            return losses.dice_loss(pred, gt), jax.lax.stop_gradient(pred)

        def s_loss_fn(params, im, gt, teacher_pred):
            out, _ = model.apply({"params": params}, im)
            pred = jax.nn.sigmoid(out[..., 0])
            sup = losses.dice_loss(pred, gt)
            self_sup = losses.dice_loss(pred, teacher_pred)
            return (supervise_weight * sup
                    + (1.0 - supervise_weight) * self_sup), (sup, self_sup)

        t_grad = jax.value_and_grad(t_loss_fn, has_aux=True)
        s_grad = jax.value_and_grad(s_loss_fn, has_aux=True)
        if accum > 1:
            xs = _microbatch((images, ground_truth), accum)
            both = {"t": teacher_state.params, "s": student_state.params}

            def micro(im, gt):
                (tl, tp), tg = t_grad(both["t"], im, gt)
                (sl, _), sg = s_grad(both["s"], im, gt, tp)
                return tl, sl, {"t": tg, "s": sg}

            gsum, tlsum, sls = _accum_grads(micro, both, xs)
            t_grads = jax.tree.map(lambda g: g / accum, gsum["t"])
            s_grads = jax.tree.map(lambda g: g / accum, gsum["s"])
            t_loss, s_loss = tlsum / accum, jnp.mean(sls)
        else:
            (t_loss, teacher_pred), t_grads = t_grad(
                teacher_state.params, images, ground_truth)
            (s_loss, _), s_grads = s_grad(
                student_state.params, images, ground_truth, teacher_pred)
        teacher_state = teacher_state.apply_gradients(t_grads, t_loss)
        student_state = student_state.apply_gradients(s_grads, s_loss)
        return teacher_state, student_state, s_loss, t_loss

    return (seg_train_step, seg_eval_step, ae_train_step, pseudo_step,
            ts_labeled_step)
