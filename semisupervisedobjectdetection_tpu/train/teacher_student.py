"""Teacher-student semi-supervised workload as two jitted steps.

Rebuilds `main_segformer/segFormer_semi_teacherstudent_main.py` (call stack
in SURVEY.md §3.2) TPU-first: each reference phase becomes ONE compiled
step — teacher forward, confidence thresholding, loss and optimizer update
all fused; no host round-trips inside the epoch loop.

Phase A (`:80-97`): teacher predicts soft masks on an unlabeled batch,
confidence-gated pseudo-label dice loss, teacher self-training update only
on every 4th epoch (`:89-90` — here a traced `update_teacher` gate).

Phase B (`:99-129`): with label denoising (default), the teacher's
prediction is blended with the ground truth, re-thresholded, and the teacher
trains on dice(orig_pred, denoised); the student trains on
  supervise_weight * dice(student, GT)
  + (1-supervise_weight) * dice(student, teacher_mask).

NOTE: the reference is NOT mean-teacher/EMA — the teacher takes its own
gradient steps, with an optional hard copy-from-student every 5 epochs
(`:202-204`, `reset_teacher`); `copy_student_to_teacher` provides that.

Train-mode semantics: the reference semi script calls `model.train()` at
epoch start (`:77-78`) and `predict()` with default `isEval=True`, so —
unlike the supervised workload's eval-mode quirk — its semi forwards run in
TRAIN mode: drop-path/dropout active, decode-head BatchNorm using batch
stats and updating running stats. Every step here takes a `train_mode` flag
(+ `rng` when True) reproducing that; the CLI threads
`TrainConfig.reference_quirks` into it. `train_mode=False` is the
deliberate improved mode (stable eval-mode pseudo-labels).

Documented deltas from the reference (kept in BOTH modes):
- Phase A every-4th-epoch teacher "self-training" is dead code in the
  reference: the loss is built from `predict()` under `torch.no_grad`, so
  backward populates no grads and the optimizer step is a no-op
  (`:81-90`). With `reference_quirks=True` the CLI reproduces the no-op by
  never gradient-updating the teacher in phase A; `pseudo_label_step`'s
  real update is the improved mode.
- In the `denoise_label=False` branch the student's target is the
  teacher's PRE-update prediction (one forward serves both the teacher
  loss and the target), whereas the reference runs a fresh `no_grad`
  predict AFTER the teacher update (`:105-108`) — and also calls
  `train_from_loss` twice on the same loss there (double Adam step on
  identical grads), which is not reproducible under optax without
  contrivance. Single-update + pre-update-mask is the chosen
  interpretation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

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

Array = jax.Array


class PseudoStepOut(NamedTuple):
    teacher_state: TrainState
    loss: Array           # teacher pseudo loss (NaN when no sample kept)
    n_kept: Array         # images used this batch
    pseudo_mask: Array
    keep: Array


@functools.partial(jax.jit, static_argnames=("cfg", "threshold",
                                             "confident_threshold",
                                             "train_mode", "accum"),
                   donate_argnames=("teacher_state",))
def pseudo_label_step(teacher_state: TrainState, images: Array,
                      update_teacher: Array, cfg: MiTConfig,
                      threshold: float = pseudo.PSEUDO_MASK_THRESHOLD,
                      confident_threshold: float =
                      pseudo.CONFIDENT_THRESHOLD,
                      train_mode: bool = False,
                      rng: Array | None = None,
                      accum: int = 1) -> PseudoStepOut:
    """Phase A: pseudo-label an unlabeled batch; optionally self-train the
    teacher on the confident samples (`:80-97`).

    `accum > 1` scans microbatches for gradient accumulation (see
    `_pseudo_accum`) — EXACT: the pseudo loss is linear in per-sample dice
    (sum over kept / kept count), so summing per-sample-dice gradients and
    dividing by the pooled kept count reproduces the full-batch gradient."""
    if accum > 1:
        return _pseudo_accum(teacher_state, images, update_teacher, cfg,
                             threshold, confident_threshold, train_mode,
                             rng, accum)

    def loss_fn(params):
        variables = {"params": params}
        if teacher_state.batch_stats:
            variables["batch_stats"] = teacher_state.batch_stats
        soft, _, new_stats = forward_masks(cfg, variables, images,
                                           train_mode=train_mode, rng=rng)
        labels = pseudo.threshold_pseudo_masks(
            soft, threshold, confident_threshold, allow_throw_sample=True)
        return labels.loss, (labels, new_stats)

    (loss, (labels, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(teacher_state.params)
    new_state = teacher_state.apply_gradients(grads, loss,
                                              enable=update_teacher)
    if new_stats is not None:
        # BN running stats update on every train-mode forward regardless of
        # the optimizer gate (torch semantics).
        new_state = new_state.replace(batch_stats=new_stats)
    return PseudoStepOut(new_state, loss, labels.n_kept,
                         labels.pseudo_mask, labels.keep)


def _pseudo_accum(teacher_state: TrainState, images: Array,
                  update_teacher: Array, cfg: MiTConfig, threshold: float,
                  confident_threshold: float, train_mode: bool,
                  rng, accum: int) -> PseudoStepOut:
    """Gradient-accumulated phase A: microbatches scanned inside the one
    jitted step (peak activation memory of a single microbatch).

    Each microbatch differentiates the UNDIVIDED kept-sample dice sum
    (`loss * n_kept`, gated to 0 when nothing is kept so the scan never
    touches the NaN branch); the summed gradients divided by the POOLED
    kept count equal the full-batch `pseudo_label_step` gradient exactly
    (the reference loss at `segFormer_semi_teacherstudent_main.py:47-56`
    is sum-over-kept / kept-count). BN stats thread sequentially through
    the scan carry in train mode."""
    b = images.shape[0]
    if b % accum:
        raise ValueError(f"unlabeled batch {b} not divisible by "
                         f"accum={accum}")
    mb = b // accum
    use_rng = rng is not None
    keys = (jax.random.split(rng, accum) if use_rng
            else jnp.zeros((accum,), jnp.uint32))
    xs = (images.reshape(accum, mb, *images.shape[1:]), keys)

    def micro(stats, i_mb, k):
        def psum_fn(params):
            variables = {"params": params}
            if stats:
                variables["batch_stats"] = stats
            soft, _, new_stats = forward_masks(
                cfg, variables, i_mb, train_mode=train_mode,
                rng=k if use_rng else None)
            labels = pseudo.threshold_pseudo_masks(
                soft, threshold, confident_threshold,
                allow_throw_sample=True)
            # undivided kept dice sum; the kept==0 NaN convention
            # re-applies on the pooled count after the scan
            psum = jnp.where(labels.n_kept > 0,
                             labels.loss * labels.n_kept, 0.0)
            return psum, (labels, new_stats)

        (psum, (labels, new_stats)), g = jax.value_and_grad(
            psum_fn, has_aux=True)(teacher_state.params)
        sums = dict(psum=psum, kept=labels.n_kept)
        return g, new_stats, sums, (labels.pseudo_mask, labels.keep)

    z = jnp.zeros(())
    gsum, new_stats, sums, (p_masks, keeps) = accumulate_microbatches(
        micro, teacher_state.params, teacher_state.batch_stats,
        dict(psum=z, kept=z), xs)
    n_kept = sums["kept"]
    grads = jax.tree.map(lambda g: g / jnp.maximum(n_kept, 1.0), gsum)
    loss = jnp.where(n_kept > 0, sums["psum"] / jnp.maximum(n_kept, 1.0),
                     jnp.nan)
    new_state = teacher_state.apply_gradients(grads, loss,
                                              enable=update_teacher)
    if train_mode and new_stats:
        new_state = new_state.replace(batch_stats=new_stats)
    return PseudoStepOut(new_state, loss, n_kept,
                         p_masks.reshape(b, *p_masks.shape[2:]),
                         keeps.reshape(b))


@functools.partial(jax.jit, static_argnames=("cfg", "threshold",
                                             "confident_threshold",
                                             "train_mode"))
def pseudo_label_infer_step(teacher_state: TrainState, images: Array,
                            cfg: MiTConfig,
                            threshold: float =
                            pseudo.PSEUDO_MASK_THRESHOLD,
                            confident_threshold: float =
                            pseudo.CONFIDENT_THRESHOLD,
                            train_mode: bool = False,
                            rng: Array | None = None) -> PseudoStepOut:
    """Phase A without a teacher update: the reference's phase-A step is a
    no-op (grads disconnected under `no_grad`, ref `:81-90`), so host code
    under `reference_quirks` always uses this variant; improved mode uses it
    on non-update epochs (3 of every 4, ref `:89`) to skip the backward."""
    variables = {"params": teacher_state.params}
    if teacher_state.batch_stats:
        variables["batch_stats"] = teacher_state.batch_stats
    soft, _, new_stats = forward_masks(cfg, variables, images,
                                       train_mode=train_mode, rng=rng)
    labels = pseudo.threshold_pseudo_masks(
        soft, threshold, confident_threshold, allow_throw_sample=True)
    if new_stats is not None:
        teacher_state = teacher_state.replace(batch_stats=new_stats)
    return PseudoStepOut(teacher_state, labels.loss, labels.n_kept,
                         labels.pseudo_mask, labels.keep)


class LabeledStepOut(NamedTuple):
    teacher_state: TrainState
    student_state: TrainState
    student_loss_total: Array
    teacher_loss: Array
    student_sup_loss: Array
    self_supervise_loss: Array


@functools.partial(jax.jit, static_argnames=("cfg", "denoise_label",
                                             "threshold", "train_mode",
                                             "accum"),
                   donate_argnames=("teacher_state", "student_state"))
def labeled_step(teacher_state: TrainState, student_state: TrainState,
                 images: Array, ground_truth: Array,
                 supervise_weight: Array, cfg: MiTConfig,
                 denoise_label: bool = True,
                 threshold: float = pseudo.PSEUDO_MASK_THRESHOLD,
                 train_mode: bool = False,
                 rng: Array | None = None,
                 accum: int = 1) -> LabeledStepOut:
    """Phase B: one labeled batch updates BOTH models (`:99-129`).
    `accum > 1` scans microbatches for gradient accumulation (see
    `_labeled_accum`)."""
    if accum > 1:
        return _labeled_accum(teacher_state, student_state, images,
                              ground_truth, supervise_weight, cfg,
                              denoise_label, threshold, train_mode, rng,
                              accum)
    t_rng = s_rng = None
    if rng is not None:
        t_rng, s_rng = jax.random.split(rng)

    def t_variables(params):
        v = {"params": params}
        if teacher_state.batch_stats:
            v["batch_stats"] = teacher_state.batch_stats
        return v

    if denoise_label:
        def teacher_loss_fn(params):
            orig, _, t_stats = forward_masks(cfg, t_variables(params),
                                             images, train_mode=train_mode,
                                             rng=t_rng)
            denoised = pseudo.denoise_labels(
                jax.lax.stop_gradient(orig), ground_truth, threshold)
            # dice(orig_pred, denoised_mask) (`:117`)
            loss = losses.dice_loss(orig, denoised)
            return loss, (denoised, t_stats)

        (teacher_loss, (teacher_mask, t_stats)), t_grads = \
            jax.value_and_grad(teacher_loss_fn, has_aux=True)(
                teacher_state.params)
    else:
        def teacher_loss_fn(params):
            pred, _, t_stats = forward_masks(cfg, t_variables(params),
                                             images, train_mode=train_mode,
                                             rng=t_rng)
            # plain supervised teacher update (`:105`); the student's target
            # is the teacher's PRE-update prediction under stop-grad (see
            # module docstring for the delta vs the reference's post-update
            # fresh predict at `:107-108`).
            loss = losses.dice_loss(pred, ground_truth)
            return loss, (jax.lax.stop_gradient(pred), t_stats)

        (teacher_loss, (teacher_mask, t_stats)), t_grads = \
            jax.value_and_grad(teacher_loss_fn, has_aux=True)(
                teacher_state.params)

    teacher_state = teacher_state.apply_gradients(t_grads, teacher_loss)
    if t_stats is not None:
        teacher_state = teacher_state.replace(batch_stats=t_stats)

    def student_loss_fn(params):
        v = {"params": params}
        if student_state.batch_stats:
            v["batch_stats"] = student_state.batch_stats
        pred, _, s_stats = forward_masks(cfg, v, images,
                                         train_mode=train_mode, rng=s_rng)
        sup = losses.dice_loss(pred, ground_truth)
        self_sup = losses.dice_loss(pred, teacher_mask)
        total = supervise_weight * sup + (1.0 - supervise_weight) * self_sup
        return total, (sup, self_sup, s_stats)

    (total, (sup, self_sup, s_stats)), s_grads = jax.value_and_grad(
        student_loss_fn, has_aux=True)(student_state.params)
    student_state = student_state.apply_gradients(s_grads, total)
    if s_stats is not None:
        student_state = student_state.replace(batch_stats=s_stats)

    return LabeledStepOut(teacher_state, student_state, total, teacher_loss,
                          sup, self_sup)


def _labeled_accum(teacher_state: TrainState, student_state: TrainState,
                   images: Array, ground_truth: Array,
                   supervise_weight: Array, cfg: MiTConfig,
                   denoise_label: bool, threshold: float, train_mode: bool,
                   rng, accum: int) -> LabeledStepOut:
    """Gradient-accumulated phase B: both models' microbatch gradients are
    summed inside ONE `lax.scan` (peak activation memory of a single
    microbatch fwd+bwd — the lever that lets the two-gradient-model loop
    escape the OOMs that cap it at unroll 2 / 512² batches), then one Adam
    step per model on the averaged gradients.

    Semantics match the unfused `labeled_step` composition: every
    microbatch's teacher mask comes from the PRE-update teacher params
    (the full-batch step also builds the student target before the teacher
    update), dice losses follow the standard mean-of-microbatch
    accumulation convention (dice is batch-nonlinear), NaN-skip gating
    applies per model on its mean loss, and BN stats thread sequentially
    per model through the scan carry in train mode.

    Behavioral delta vs the reference NaN-skip quirk
    (`models/SegFormerModel.py:160` skips per BATCH): gating on the mean
    loss means ONE non-finite microbatch loss skips the whole
    accumulated update for that model, where N sequential full-batch
    steps would only skip the offending batch. Unreachable in practice
    (dice losses are smoothed), documented for completeness."""
    b = images.shape[0]
    if b % accum:
        raise ValueError(f"labeled batch {b} not divisible by "
                         f"accum={accum}")
    mb = b // accum
    use_rng = rng is not None
    keys = (jax.random.split(rng, accum) if use_rng
            else jnp.zeros((accum,), jnp.uint32))
    xs = (images.reshape(accum, mb, *images.shape[1:]),
          ground_truth.reshape(accum, mb, *ground_truth.shape[1:]),
          keys)
    both_params = {"t": teacher_state.params, "s": student_state.params}

    def micro(stats, i_mb, g_mb, k):
        t_rng = s_rng = None
        if use_rng:
            t_rng, s_rng = jax.random.split(k)

        def teacher_loss_fn(params):
            v = {"params": params}
            if stats["t"]:
                v["batch_stats"] = stats["t"]
            pred, _, t_stats = forward_masks(cfg, v, i_mb,
                                             train_mode=train_mode,
                                             rng=t_rng)
            if denoise_label:
                mask = pseudo.denoise_labels(
                    jax.lax.stop_gradient(pred), g_mb, threshold)
                loss = losses.dice_loss(pred, mask)
            else:
                loss = losses.dice_loss(pred, g_mb)
                mask = jax.lax.stop_gradient(pred)
            return loss, (mask, t_stats)

        (t_loss, (teacher_mask, t_stats)), t_g = jax.value_and_grad(
            teacher_loss_fn, has_aux=True)(both_params["t"])

        def student_loss_fn(params):
            v = {"params": params}
            if stats["s"]:
                v["batch_stats"] = stats["s"]
            pred, _, s_stats = forward_masks(cfg, v, i_mb,
                                             train_mode=train_mode,
                                             rng=s_rng)
            sup = losses.dice_loss(pred, g_mb)
            self_sup = losses.dice_loss(pred, teacher_mask)
            total = (supervise_weight * sup
                     + (1.0 - supervise_weight) * self_sup)
            return total, (sup, self_sup, s_stats)

        (total, (sup, self_sup, s_stats)), s_g = jax.value_and_grad(
            student_loss_fn, has_aux=True)(both_params["s"])
        new_stats = {"t": t_stats if t_stats is not None else stats["t"],
                     "s": s_stats if s_stats is not None else stats["s"]}
        sums = dict(t_loss=t_loss, total=total, sup=sup,
                    self_sup=self_sup)
        return {"t": t_g, "s": s_g}, new_stats, sums, jnp.zeros(())

    z = jnp.zeros(())
    gsum, stats, sums, _ = accumulate_microbatches(
        micro, both_params,
        {"t": teacher_state.batch_stats, "s": student_state.batch_stats},
        dict(t_loss=z, total=z, sup=z, self_sup=z), xs)
    t_loss, total = sums["t_loss"] / accum, sums["total"] / accum
    sup, self_sup = sums["sup"] / accum, sums["self_sup"] / accum

    teacher_state = teacher_state.apply_gradients(
        jax.tree.map(lambda g: g / accum, gsum["t"]), t_loss)
    student_state = student_state.apply_gradients(
        jax.tree.map(lambda g: g / accum, gsum["s"]), total)
    if train_mode:
        if stats["t"]:
            teacher_state = teacher_state.replace(batch_stats=stats["t"])
        if stats["s"]:
            student_state = student_state.replace(batch_stats=stats["s"])
    return LabeledStepOut(teacher_state, student_state, total, t_loss,
                          sup, self_sup)


@functools.partial(jax.jit, static_argnames=("cfg", "denoise_label",
                                             "threshold", "train_mode"),
                   donate_argnames=("teacher_state", "student_state"))
def labeled_step_stacked(teacher_state: TrainState,
                         student_state: TrainState,
                         images: Array, ground_truth: Array,
                         supervise_weight: Array, cfg: MiTConfig,
                         denoise_label: bool = True,
                         threshold: float = pseudo.PSEUDO_MASK_THRESHOLD,
                         train_mode: bool = False,
                         rng: Array | None = None) -> LabeledStepOut:
    """Phase B fused across the two models: ONE vmapped forward/backward
    over stacked [teacher, student] params.

    Teacher and student share the architecture and the input batch, so
    stacking their params on a leading axis turns two sequential
    fwd+bwd passes into one batched pass — every matmul/scan runs once at
    double width, halving kernel-dispatch and scan-loop overhead (a TPU
    throughput optimization over `labeled_step`; no reference analogue).

    The math is IDENTICAL to `labeled_step`: the combined loss
    `teacher_loss + student_total` only couples the models through
    stop-gradients (the denoised target and the student's self-supervision
    mask), so d(total)/d(teacher params) == d(teacher_loss)/d(teacher
    params) and likewise for the student — verified against `labeled_step`
    in tests/test_stacked_step.py. NaN-skip gating stays per-model
    (teacher on its own loss, student on its total, ref
    `SegFormerModel.py:160`)."""
    t_rng = s_rng = None
    if rng is not None:
        t_rng, s_rng = jax.random.split(rng)

    stacked_params = jax.tree.map(lambda a, b: jnp.stack([a, b]),
                                  teacher_state.params,
                                  student_state.params)
    has_stats = bool(teacher_state.batch_stats)
    stacked_stats = None
    if has_stats:
        stacked_stats = jax.tree.map(lambda a, b: jnp.stack([a, b]),
                                     teacher_state.batch_stats,
                                     student_state.batch_stats)
    rngs = None
    if train_mode and rng is not None:
        rngs = jnp.stack([t_rng, s_rng])

    def fwd_one(params, stats, r):
        variables = {"params": params}
        if stats is not None:
            variables["batch_stats"] = stats
        return forward_masks(cfg, variables, images, train_mode=train_mode,
                             rng=r)

    def loss_fn(sp):
        preds, _, new_stats = jax.vmap(
            fwd_one, in_axes=(0, 0 if has_stats else None,
                              0 if rngs is not None else None)
        )(sp, stacked_stats, rngs)
        t_pred, s_pred = preds[0], preds[1]
        if denoise_label:
            teacher_mask = pseudo.denoise_labels(
                jax.lax.stop_gradient(t_pred), ground_truth, threshold)
            teacher_loss = losses.dice_loss(t_pred, teacher_mask)
        else:
            teacher_loss = losses.dice_loss(t_pred, ground_truth)
            teacher_mask = jax.lax.stop_gradient(t_pred)
        sup = losses.dice_loss(s_pred, ground_truth)
        self_sup = losses.dice_loss(s_pred, teacher_mask)
        total = supervise_weight * sup + (1.0 - supervise_weight) * self_sup
        return teacher_loss + total, (teacher_loss, sup, self_sup, total,
                                      new_stats)

    (_, (teacher_loss, sup, self_sup, total, new_stats)), grads = \
        jax.value_and_grad(loss_fn, has_aux=True)(stacked_params)

    teacher_state = teacher_state.apply_gradients(
        jax.tree.map(lambda g: g[0], grads), teacher_loss)
    student_state = student_state.apply_gradients(
        jax.tree.map(lambda g: g[1], grads), total)
    if new_stats is not None:
        teacher_state = teacher_state.replace(
            batch_stats=jax.tree.map(lambda s: s[0], new_stats))
        student_state = student_state.replace(
            batch_stats=jax.tree.map(lambda s: s[1], new_stats))
    return LabeledStepOut(teacher_state, student_state, total, teacher_loss,
                          sup, self_sup)


def copy_student_to_teacher(teacher_state: TrainState,
                            student_state: TrainState) -> TrainState:
    """Hard teacher reset from the student every 5 epochs when enabled
    (`segFormer_semi_teacherstudent_main.py:202-204`). Optimizer state is
    kept (the reference only copies the state_dict, not Adam moments).
    Leaves are deep-copied — torch `load_state_dict` copies data, and the
    two states must not alias buffers (both are donated per step)."""
    return teacher_state.replace(
        params=jax.tree.map(jnp.copy, student_state.params),
        batch_stats=jax.tree.map(jnp.copy, student_state.batch_stats))


def ema_update(teacher_state: TrainState, student_state: TrainState,
               decay: float = 0.999) -> TrainState:
    """Mean-teacher EMA update — a build-side addition the reference lacks
    (its teacher trains by gradient); offered because the driver's north-star
    names an 'EMA teacher-student' loop (BASELINE.json).

    Both params AND batch_stats are EMA'd (the torch mean-teacher convention
    EMAs buffers alongside weights); without this the EMA teacher's
    decode-head BatchNorm statistics would never move."""
    ema = lambda t, s: decay * t + (1.0 - decay) * s
    return teacher_state.replace(
        params=jax.tree.map(ema, teacher_state.params,
                            student_state.params),
        batch_stats=jax.tree.map(ema, teacher_state.batch_stats,
                                 student_state.batch_stats))
