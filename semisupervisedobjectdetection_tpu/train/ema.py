"""EMA (mean-teacher) semi-supervised step — the flagship TPU workload.

The driver's north-star names an "EMA teacher-student semi-supervised loop
with pseudo-label thresholding" (BASELINE.json). The reference script's
teacher instead takes its own gradient steps
(`main_segformer/segFormer_semi_teacherstudent_main.py:80-129`, SURVEY.md
§3.2) — but its phase-A teacher update is dead code (the loss is built under
`torch.no_grad`, `:81-90`), so the *executed* reference semantics per step
are: teacher forward → pseudo-label thresholding (`:24-56`), teacher forward
on the labeled batch → label denoising (`:110-118`), student update on
  supervise_weight * dice(student, GT)
  + (1-supervise_weight) * dice(student, denoised_teacher_mask)   (`:123-127`)
plus a phase-B teacher gradient step. This module keeps everything except
that teacher gradient step, replacing it with a per-step EMA of the student
(the torch mean-teacher convention) — which removes the teacher's entire
backward pass and Adam moments from the step. The student update is
IDENTICAL to `labeled_step`'s student math (asserted by
tests/test_ema.py::test_ema_student_update_matches_labeled_step).

TPU shape of the step: ONE fused jitted step per (unlabeled, labeled) batch
pair — a single no-grad teacher forward over the concatenated batches (one
dispatch, full-width MXU matmuls), pseudo thresholding + denoising as masked
arithmetic, one student forward/backward, optimizer update, and the EMA
write, all compiled together. The teacher has no optimizer state in the hot
path; `ema_update` moves params AND batch_stats.

Optional int8 teacher (`ema_semi_step_int8`): the teacher forward runs
through the int8 serving path (`ops/quant.py`) on a snapshot quantized once
per epoch — the f32 EMA teacher params remain the ground truth and keep
updating every step; only the forward's view of them is stale-quantized.
Pseudo-label quality under int8 is bounded by
tests/test_quant.py (mask agreement + dice-delta bound).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from semisupervisedobjectdetection_tpu.core.config import MiTConfig
from semisupervisedobjectdetection_tpu import losses
from semisupervisedobjectdetection_tpu.train import pseudo
from semisupervisedobjectdetection_tpu.train.common import (
    accumulate_microbatches,
    forward_masks,
)
from semisupervisedobjectdetection_tpu.train.state import TrainState
from semisupervisedobjectdetection_tpu.train.teacher_student import (
    ema_update,
)

Array = jax.Array


class EmaStepOut(NamedTuple):
    teacher_state: TrainState
    student_state: TrainState
    student_loss_total: Array      # w*sup + (1-w)*self_sup
    student_sup_loss: Array
    self_supervise_loss: Array
    pseudo_loss: Array             # phase-A metric (NaN when none kept)
    n_kept: Array                  # unlabeled images passing the gate
    pseudo_mask: Array             # (Bu, H, W) thresholded pseudo labels


def _teacher_soft_masks(t_cfg: MiTConfig, t_vars: dict, unlabeled: Array,
                        images: Array):
    """No-grad teacher forward over both batches; one concatenated forward
    when the spatial shapes match (one dispatch, batch-32-wide MXU work)."""
    if unlabeled.shape[1:] == images.shape[1:]:
        both = jnp.concatenate([unlabeled, images], axis=0)
        soft, _, _ = forward_masks(t_cfg, t_vars, both, train_mode=False)
        soft = jax.lax.stop_gradient(soft)
        return soft[: unlabeled.shape[0]], soft[unlabeled.shape[0]:]
    u_soft, _, _ = forward_masks(t_cfg, t_vars, unlabeled, train_mode=False)
    l_soft, _, _ = forward_masks(t_cfg, t_vars, images, train_mode=False)
    return (jax.lax.stop_gradient(u_soft), jax.lax.stop_gradient(l_soft))


def _ema_semi_impl(t_cfg: MiTConfig, t_vars: dict,
                   teacher_state: TrainState, student_state: TrainState,
                   unlabeled: Array, images: Array, ground_truth: Array,
                   supervise_weight: Array, ema_decay: Array,
                   cfg: MiTConfig, denoise_label: bool, threshold: float,
                   confident_threshold: float, train_mode: bool,
                   rng, accum: int = 1) -> EmaStepOut:
    if accum > 1:
        return _ema_semi_accum(t_cfg, t_vars, teacher_state, student_state,
                               unlabeled, images, ground_truth,
                               supervise_weight, ema_decay, cfg,
                               denoise_label, threshold,
                               confident_threshold, train_mode, rng, accum)
    u_soft, l_soft = _teacher_soft_masks(t_cfg, t_vars, unlabeled, images)

    # Phase A: confidence-thresholded pseudo labels (ref `:24-56`). With the
    # teacher's gradient step gone this is a quality metric + the kept-count
    # statistic; semantics (thresholds, gate, per-sample dice) unchanged.
    labels = pseudo.threshold_pseudo_masks(
        u_soft, threshold, confident_threshold, allow_throw_sample=True)

    # Phase B target: denoised teacher mask (ref `:110-118`), or the raw
    # soft prediction when denoising is off (`labeled_step`'s convention).
    if denoise_label:
        teacher_mask = pseudo.denoise_labels(l_soft, ground_truth,
                                             threshold)
    else:
        teacher_mask = l_soft

    def student_loss_fn(params):
        v = {"params": params}
        if student_state.batch_stats:
            v["batch_stats"] = student_state.batch_stats
        pred, _, s_stats = forward_masks(cfg, v, images,
                                         train_mode=train_mode, rng=rng)
        sup = losses.dice_loss(pred, ground_truth)
        self_sup = losses.dice_loss(pred, teacher_mask)
        total = (supervise_weight * sup
                 + (1.0 - supervise_weight) * self_sup)
        return total, (sup, self_sup, s_stats)

    (total, (sup, self_sup, s_stats)), s_grads = jax.value_and_grad(
        student_loss_fn, has_aux=True)(student_state.params)
    student_state = student_state.apply_gradients(s_grads, total)
    if s_stats is not None:
        student_state = student_state.replace(batch_stats=s_stats)

    teacher_state = ema_update(teacher_state, student_state, ema_decay)
    return EmaStepOut(teacher_state, student_state, total, sup, self_sup,
                      labels.loss, labels.n_kept, labels.pseudo_mask)


def _ema_semi_accum(t_cfg: MiTConfig, t_vars: dict,
                    teacher_state: TrainState, student_state: TrainState,
                    unlabeled: Array, images: Array, ground_truth: Array,
                    supervise_weight: Array, ema_decay: Array,
                    cfg: MiTConfig, denoise_label: bool, threshold: float,
                    confident_threshold: float, train_mode: bool,
                    rng, accum: int) -> EmaStepOut:
    """Gradient-accumulated EMA step: both batches split into `accum`
    microbatch pairs scanned inside the one jitted step (peak activation
    memory of a single pair — the lever for >512² tiles or big effective
    batches), student grads and losses averaged, ONE optimizer update and
    ONE EMA write. The phase-A pseudo metric aggregates exactly as the
    full batch would (per-sample dice sums and kept counts are pooled
    before the kept-count division); the student dice losses follow the
    standard mean-of-microbatch accumulation semantics (dice is
    batch-nonlinear). Only the student carries grads, as in the unfused
    step."""
    bu, bl = unlabeled.shape[0], images.shape[0]
    if bu % accum or bl % accum:
        raise ValueError(f"batches ({bu} unlabeled, {bl} labeled) not "
                         f"divisible by accum={accum}")
    mu, ml = bu // accum, bl // accum
    use_rng = rng is not None
    keys = (jax.random.split(rng, accum) if use_rng
            else jnp.zeros((accum,), jnp.uint32))
    xs = (unlabeled.reshape(accum, mu, *unlabeled.shape[1:]),
          images.reshape(accum, ml, *images.shape[1:]),
          ground_truth.reshape(accum, ml, *ground_truth.shape[1:]),
          keys)

    def micro(stats, u_mb, i_mb, g_mb, k):
        u_soft, l_soft = _teacher_soft_masks(t_cfg, t_vars, u_mb, i_mb)
        labels = pseudo.threshold_pseudo_masks(
            u_soft, threshold, confident_threshold,
            allow_throw_sample=True)
        if denoise_label:
            teacher_mask = pseudo.denoise_labels(l_soft, g_mb, threshold)
        else:
            teacher_mask = l_soft

        def student_loss_fn(params):
            v = {"params": params}
            if stats:
                v["batch_stats"] = stats
            pred, _, s_stats = forward_masks(
                cfg, v, i_mb, train_mode=train_mode,
                rng=k if use_rng else None)
            sup = losses.dice_loss(pred, g_mb)
            self_sup = losses.dice_loss(pred, teacher_mask)
            total = (supervise_weight * sup
                     + (1.0 - supervise_weight) * self_sup)
            return total, (sup, self_sup, s_stats)

        (total, (sup, self_sup, s_stats)), g = jax.value_and_grad(
            student_loss_fn, has_aux=True)(student_state.params)
        sums = dict(
            total=total, sup=sup, self_sup=self_sup,
            # pooled pseudo stats: undo the per-microbatch kept division
            # (the NaN convention re-applies on the pooled count below)
            p_sum=jnp.where(labels.n_kept > 0,
                            labels.loss * labels.n_kept, 0.0),
            kept=labels.n_kept)
        return g, s_stats, sums, labels.pseudo_mask

    z = jnp.zeros(())
    sums_zero = dict(total=z, sup=z, self_sup=z, p_sum=z, kept=z)
    gsum, s_stats, sums, p_masks = accumulate_microbatches(
        micro, student_state.params, student_state.batch_stats,
        sums_zero, xs)
    grads = jax.tree.map(lambda g: g / accum, gsum)
    total, sup, self_sup = (sums["total"] / accum, sums["sup"] / accum,
                            sums["self_sup"] / accum)
    n_kept = sums["kept"]
    pseudo_loss = jnp.where(n_kept > 0,
                            sums["p_sum"] / jnp.maximum(n_kept, 1.0),
                            jnp.nan)
    pseudo_mask = p_masks.reshape(bu, *p_masks.shape[2:])

    student_state = student_state.apply_gradients(grads, total)
    if train_mode and s_stats:
        student_state = student_state.replace(batch_stats=s_stats)
    teacher_state = ema_update(teacher_state, student_state, ema_decay)
    return EmaStepOut(teacher_state, student_state, total, sup, self_sup,
                      pseudo_loss, n_kept, pseudo_mask)


@functools.partial(jax.jit, static_argnames=("cfg", "denoise_label",
                                             "threshold",
                                             "confident_threshold",
                                             "train_mode", "accum"),
                   donate_argnames=("teacher_state", "student_state"))
def ema_semi_step(teacher_state: TrainState, student_state: TrainState,
                  unlabeled: Array, images: Array, ground_truth: Array,
                  supervise_weight: Array, ema_decay: Array,
                  cfg: MiTConfig, denoise_label: bool = True,
                  threshold: float = pseudo.PSEUDO_MASK_THRESHOLD,
                  confident_threshold: float = pseudo.CONFIDENT_THRESHOLD,
                  train_mode: bool = False,
                  rng: Optional[Array] = None,
                  accum: int = 1) -> EmaStepOut:
    """One fused EMA semi-supervised step: teacher no-grad forward on the
    unlabeled+labeled batches, pseudo thresholding + denoising, student
    forward/backward/update, then `teacher <- decay*teacher +
    (1-decay)*student` on params and batch_stats. `accum > 1` scans
    microbatch pairs for gradient accumulation (see `_ema_semi_accum`)."""
    t_vars = {"params": teacher_state.params}
    if teacher_state.batch_stats:
        t_vars["batch_stats"] = teacher_state.batch_stats
    return _ema_semi_impl(cfg, t_vars, teacher_state, student_state,
                          unlabeled, images, ground_truth,
                          supervise_weight, ema_decay, cfg, denoise_label,
                          threshold, confident_threshold, train_mode, rng,
                          accum)


@functools.partial(jax.jit, static_argnames=("cfg", "qcfg", "denoise_label",
                                             "threshold",
                                             "confident_threshold",
                                             "train_mode", "accum"),
                   donate_argnames=("teacher_state", "student_state"))
def ema_semi_step_int8(teacher_qvars: dict, teacher_state: TrainState,
                       student_state: TrainState, unlabeled: Array,
                       images: Array, ground_truth: Array,
                       supervise_weight: Array, ema_decay: Array,
                       cfg: MiTConfig, qcfg: MiTConfig,
                       denoise_label: bool = True,
                       threshold: float = pseudo.PSEUDO_MASK_THRESHOLD,
                       confident_threshold: float =
                       pseudo.CONFIDENT_THRESHOLD,
                       train_mode: bool = False,
                       rng: Optional[Array] = None,
                       accum: int = 1) -> EmaStepOut:
    """`ema_semi_step` with the teacher forward running int8 (serving path).

    `teacher_qvars` is a per-epoch snapshot from
    `make_teacher_int8_snapshot`; the f32 `teacher_state` still receives the
    per-step EMA update (it is the source of the next snapshot)."""
    return _ema_semi_impl(qcfg, teacher_qvars, teacher_state, student_state,
                          unlabeled, images, ground_truth,
                          supervise_weight, ema_decay, cfg, denoise_label,
                          threshold, confident_threshold, train_mode, rng,
                          accum)


def make_teacher_int8_snapshot(teacher_state: TrainState,
                               cfg: MiTConfig):
    """(qvars, qcfg) for `ema_semi_step_int8`, quantizing the EMA teacher's
    dense kernels to int8 with per-channel scales (`ops/quant.py`).
    Refresh once per epoch (ref teacher predicts under `no_grad`,
    `segFormer_semi_teacherstudent_main.py:81-83,105-108`; the int8 forward
    is this framework's serving-path substitute)."""
    from semisupervisedobjectdetection_tpu.ops.quant import (
        quantize_dense_params,
    )

    qvars = {"params": quantize_dense_params(teacher_state.params)}
    if teacher_state.batch_stats:
        qvars["batch_stats"] = teacher_state.batch_stats
    # Deep-copy: quantize_dense_params passes non-dense leaves (convs, LN,
    # biases, stats) through by reference, and the snapshot outlives the
    # donated teacher_state of each step — it must not alias its buffers.
    return (jax.tree.map(jnp.copy, qvars), cfg.replace(quant="int8"))
