"""Teacher-student semi-supervised CLI —
`main_segformer/segFormer_semi_teacherstudent_main.py`.

Run:  python -m semisupervisedobjectdetection_tpu.cli.teacher_student \
          --synthetic --variant b0 --img-size 128 --epochs 2

Implements the reference's full loop (SURVEY.md §3.2): per epoch, Phase A
pseudo-labels the unlabeled set (teacher self-trains every 4th epoch,
`:89-90`), Phase B trains teacher (label denoising by default, `:110-120`)
and student (supervised + self-supervised mix, `:123-127`) on the labeled
set; both models evaluate with binarized dice; optional hard teacher reset
from the student every 5 epochs (`:202-204`) or EMA (build addition).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from semisupervisedobjectdetection_tpu.checkpoint.orbax_io import (
    BestCheckpointer,
)
from semisupervisedobjectdetection_tpu.cli import common
from semisupervisedobjectdetection_tpu.core.config import MIT_VARIANTS
from semisupervisedobjectdetection_tpu.eval.metrics import (
    binary_miou,
    per_image_miou,
)
from semisupervisedobjectdetection_tpu.models.segformer import SegFormer
from semisupervisedobjectdetection_tpu.train.state import TrainState
from semisupervisedobjectdetection_tpu.train.supervised import eval_step
from semisupervisedobjectdetection_tpu.train import teacher_student as ts
from semisupervisedobjectdetection_tpu.utils import preemption
from semisupervisedobjectdetection_tpu.utils.logging import MetricLogger


def _preempt_exit(args, teacher, student, epoch, best_s, best_t):
    """Mid-epoch preemption: save BOTH `_last` checkpoints and exit 0
    (cli/common.preempt_exit semantics — `--resume` redoes the epoch)."""
    common.preempt_exit(args, [("ts_teacher", teacher, best_t),
                               ("ts_student", student, best_s)], epoch,
                        tuning=args.tune)


def train_run(args, dcfg, tc, loaders, cfg, logger, *, teacher_lr,
              student_lr, supervise_weight, threshold, epochs):
    """One full teacher-student training run; returns best eval loss."""
    model = SegFormer(cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((1, dcfg.img_h, dcfg.img_w, 3)))
    teacher = TrainState.create(variables, tc, lr=teacher_lr)
    student = TrainState.create(variables, tc, lr=student_lr)
    if args.pretrain_weight:
        from semisupervisedobjectdetection_tpu.checkpoint.orbax_io import (
            restore_state,
        )
        # warm start = reference transfer semantics: weights+BN stats from
        # the checkpoint, FRESH Adam and a scheduler at epoch 0 (the
        # checkpoint's epoch would silently decay the requested lrs)
        teacher = restore_state(args.pretrain_weight, teacher,
                                load_opt_state=False, load_epoch=False)
        student = restore_state(args.pretrain_weight, student,
                                load_opt_state=False, load_epoch=False)
        print("warm-started teacher+student from", args.pretrain_weight)

    ckpt_s = BestCheckpointer(args.checkpoint_dir, "ts_student")
    ckpt_t = BestCheckpointer(args.checkpoint_dir, "ts_teacher")
    # --tune grid points never write checkpoints (reference
    # Hyperparameter_Tuning passes save_model=False, `:274-290`)
    save_model = args.checkpoint_dir and not getattr(args, "tune", False)
    rng = jax.random.PRNGKey(args.seed)
    sup_w = jnp.asarray(supervise_weight)
    # The reference semi script runs its forwards in TRAIN mode
    # (`model.train()` at `:77-78` + default `isEval=True` predicts);
    # reference_quirks threads that through. Improved mode (quirks off)
    # uses eval-mode forwards for stable pseudo-labels.
    train_mode = tc.reference_quirks
    (teacher, student, start_epoch, best_s, best_t,
     rng) = _try_resume(args, teacher, student, ckpt_s, ckpt_t, rng)
    pp_req = getattr(args, "parallel", "none")
    if pp_req in ("pp", "dp_pp") and not args.ema_mode:
        print("warning: --parallel pp/dp_pp here supports --ema-mode "
              "only (parallel/pipeline_ema.py; the gradient-teacher loop "
              "is supervised-CLI-only); running single-device")
    _, (teacher, student) = common.setup_parallel(
        args, (teacher, student), cfg)

    if args.ema_mode:
        return _ema_train_loop(args, dcfg, tc, loaders, cfg, logger,
                               teacher=teacher, student=student,
                               sup_w=sup_w, threshold=threshold,
                               epochs=epochs, rng=rng, ckpt_s=ckpt_s,
                               ckpt_t=ckpt_t, start_epoch=start_epoch,
                               best_s=best_s, best_t=best_t,
                               save_model=save_model)

    from semisupervisedobjectdetection_tpu.data.prefetch import (
        prefetch_train_batches,
    )

    depth = getattr(args, "prefetch", 1)
    for epoch in range(start_epoch, epochs):
        # -------- Phase A: unlabeled pseudo-labeling (`:80-97`).
        # Reference quirk: its every-4th-epoch teacher "update" is a no-op
        # (loss built under `no_grad`, `:81-90`), so quirks mode never
        # gradient-updates here; improved mode self-trains every 4th epoch.
        # Batches are staged by a background thread (data/prefetch.py) and
        # metrics stay on device until one per-epoch sync (host_floats) —
        # per-step float() would idle the chip a tunnel round trip each.
        kept, pseudo_losses = [], []
        update_epoch = (epoch % 4 == 0) and not tc.reference_quirks
        rng, aug_rng_a, step_rng_a = jax.random.split(rng, 3)
        for bi, (imgs, _) in enumerate(prefetch_train_batches(
                loaders["pseudo"], aug_rng_a, dcfg, depth=depth)):
            step_rng = jax.random.fold_in(step_rng_a, bi)
            if update_epoch:
                out = ts.pseudo_label_step(teacher, imgs,
                                           jnp.asarray(True), cfg,
                                           threshold=threshold,
                                           train_mode=train_mode,
                                           rng=step_rng,
                                           accum=max(args.grad_accum, 1))
            else:
                out = ts.pseudo_label_infer_step(
                    teacher, imgs, cfg, threshold=threshold,
                    train_mode=train_mode, rng=step_rng)
            teacher = out.teacher_state
            kept.append(out.n_kept)
            pseudo_losses.append(out.loss)
            if preemption.stop_requested():
                break
        if preemption.stop_requested():
            _preempt_exit(args, teacher, student, epoch, best_s, best_t)
        images_used = int(sum(common.host_floats(kept)))
        pseudo_losses = [x for x in common.host_floats(pseudo_losses)
                         if np.isfinite(x)]
        print(f"epoch {epoch}: {images_used} unlabeled images used")

        # -------- Phase B: labeled set trains both models (`:99-129`)
        s_losses, t_losses = [], []
        rng, aug_rng_b, step_rng_b = jax.random.split(rng, 3)
        for bi, (imgs, masks) in enumerate(prefetch_train_batches(
                loaders["train"], aug_rng_b, dcfg, depth=depth)):
            step_rng = jax.random.fold_in(step_rng_b, bi)
            lout = ts.labeled_step(teacher, student, imgs, masks, sup_w,
                                   cfg, denoise_label=not args.no_denoise,
                                   threshold=threshold,
                                   train_mode=train_mode, rng=step_rng,
                                   accum=max(args.grad_accum, 1))
            teacher, student = lout.teacher_state, lout.student_state
            s_losses.append(lout.student_loss_total)
            t_losses.append(lout.teacher_loss)
            if preemption.stop_requested():
                break
        if preemption.stop_requested():
            _preempt_exit(args, teacher, student, epoch, best_s, best_t)
        teacher = teacher.scheduler_step()
        student = student.scheduler_step()
        if args.ema > 0:
            teacher = ts.ema_update(teacher, student, args.ema)
        s_losses = common.host_floats(s_losses)
        t_losses = common.host_floats(t_losses)

        # -------- eval both models (`:147-172`)
        t0 = time.time()
        ev_s, ev_t, mious, pi_mious = [], [], [], []
        for images_u8, masks_u8 in loaders["eval"]:
            imgs, masks = common.device_eval_batch(images_u8, masks_u8,
                                                   dcfg)
            tl, _ = eval_step(teacher, imgs, masks, cfg)
            sl, pred = eval_step(student, imgs, masks, cfg)
            ev_t.append(tl)
            ev_s.append(sl)
            mious.append(binary_miou(pred, masks))
            pi_mious.append(per_image_miou(pred, masks))
        ev_t, ev_s = common.host_floats(ev_t), common.host_floats(ev_s)
        mious = common.host_floats(mious)
        pi_mious = common.host_floats(pi_mious)
        fps = len(loaders["eval"]) / max(time.time() - t0, 1e-9)

        train_loss = float(np.mean(s_losses)) if s_losses else 0.0
        eval_s = float(np.mean(ev_s)) if ev_s else 0.0
        eval_t = float(np.mean(ev_t)) if ev_t else 0.0
        logger.log(epoch, train_loss=train_loss, eval_loss=eval_s,
                   teacher_train=float(np.mean(t_losses)) if t_losses
                   else 0.0,
                   teacher_eval=eval_t, images_used=images_used,
                   miou=float(np.mean(mious)) if mious else 0.0,
                   miou_per_image=(float(np.mean(pi_mious))
                                   if pi_mious else 0.0),
                   fps=fps)

        # Per-model bests (ref `:175-186` keeps independent teacher/student
        # best checkpoints).
        if eval_s < best_s:
            best_s = eval_s
            if save_model:
                ckpt_s.maybe_save(student, epoch, train_loss, eval_s, fps)
        if eval_t < best_t:
            best_t = eval_t
            if save_model:
                ckpt_t.maybe_save(teacher, epoch, train_loss, eval_t, fps)

        if args.reset_teacher and epoch != 0 and epoch % 5 == 0:
            teacher = ts.copy_student_to_teacher(teacher, student)
            print("!!! teacher reset !!!")
        _save_lasts(args, teacher, student, epoch, best_s, best_t)
    _wait_saves(args)
    return min(best_s, best_t)


def _ema_train_loop(args, dcfg, tc, loaders, cfg, logger, *, teacher,
                    student, sup_w, threshold, epochs, rng, ckpt_s,
                    ckpt_t, start_epoch=0, best_s=float("inf"),
                    best_t=float("inf"), save_model=True):
    """The flagship EMA (mean-teacher) loop (train/ema.py): per step, ONE
    fused (unlabeled, labeled) batch-pair update — no-grad teacher
    forwards, pseudo thresholding + denoising, student fwd/bwd, per-step
    EMA. Unlabeled batches restart from the loader when the labeled loader
    is longer (re-iterated, NOT itertools.cycle — cycle() would pin every
    decoded uint8 batch in host RAM for the whole epoch)."""
    from semisupervisedobjectdetection_tpu.data.prefetch import (
        prefetch_paired_batches,
    )
    from semisupervisedobjectdetection_tpu.train import ema as ema_mod

    # Reference-quirks parity applies in EMA mode too: the reference semi
    # script runs its forwards in TRAIN mode (`model.train()`, `:77-78`).
    train_mode = tc.reference_quirks
    decay = jnp.asarray(args.ema)
    depth = getattr(args, "prefetch", 1)

    # --parallel pp / dp_pp: stage-per-device EMA pipeline
    # (pipeline_ema.py) — teacher+student stage params on their stage's
    # device, optimizer state for the student only; dp_pp composes
    # --dp replica groups of that pipeline. Merged params sync back into
    # the teacher/student TrainStates each epoch for eval/checkpointing.
    trainer = None
    pp_mode = getattr(args, "parallel", "none")
    if pp_mode in ("pp", "dp_pp"):
        if args.int8_teacher:
            raise SystemExit(
                f"--int8-teacher is not supported with --parallel "
                f"{pp_mode} (the int8 teacher forward is a fused-step "
                f"path)")
        if train_mode:
            raise SystemExit(
                f"--parallel {pp_mode} EMA training implements eval-mode "
                "forwards only; pass --no-quirks, or use the "
                "single-device fused step for reference-quirks "
                "train-mode forwards")
        from semisupervisedobjectdetection_tpu.parallel.pipeline_ema \
            import DataParallelEmaPipelinedTrainer, EmaPipelinedTrainer

        tc_pp = tc.replace(lr=float(student.base_lr))
        kw = dict(denoise_label=not args.no_denoise, threshold=threshold)
        if pp_mode == "pp":
            trainer = EmaPipelinedTrainer(
                cfg, teacher.variables(), student.variables(), tc_pp,
                **kw)
        else:
            trainer = DataParallelEmaPipelinedTrainer(
                cfg, teacher.variables(), student.variables(), tc_pp,
                dp=max(1, getattr(args, "dp", 2)), **kw)
        # resumed runs rebuild the trainer at epoch 0: fast-forward the
        # exponential lr schedule (optimizer moments restart fresh — still
        # strictly more than the reference, which never saves them)
        for _ in range(start_epoch):
            trainer.scheduler_step()
        print(f"--parallel {pp_mode}: EMA pipeline training, "
              f"{cfg.num_stages} stages + head"
              + (f" x {trainer.dp} replica groups"
                 if pp_mode == "dp_pp" else "")
              + f", micro={max(args.grad_accum, 1)}")

    for epoch in range(start_epoch, epochs):
        qvars = qcfg = None
        if args.int8_teacher:
            # Teacher forwards run int8 on a snapshot refreshed per epoch.
            qvars, qcfg = ema_mod.make_teacher_int8_snapshot(teacher, cfg)
        s_losses, p_losses, kept = [], [], []
        # (labeled, unlabeled) batch pairs staged ahead by a background
        # thread (data/prefetch.py: empty unlabeled loader degrades to the
        # labeled images standing in — pseudo stats are metrics only);
        # metrics stay on device until ONE per-epoch sync (host_floats).
        rng, aug_rng, step_rng_e = jax.random.split(rng, 3)
        for bi, (imgs, masks, u_imgs) in enumerate(prefetch_paired_batches(
                loaders["train"], loaders["pseudo"], aug_rng, dcfg,
                depth=depth)):
            r3 = jax.random.fold_in(step_rng_e, bi)
            if trainer is not None:
                out = trainer.step(u_imgs, imgs, masks, sup_w, decay,
                                   micro=max(args.grad_accum, 1))
            elif args.int8_teacher:
                out = ema_mod.ema_semi_step_int8(
                    qvars, teacher, student, u_imgs, imgs, masks, sup_w,
                    decay, cfg, qcfg,
                    denoise_label=not args.no_denoise,
                    threshold=threshold, train_mode=train_mode,
                    rng=r3 if train_mode else None,
                    accum=args.grad_accum)
            else:
                out = ema_mod.ema_semi_step(
                    teacher, student, u_imgs, imgs, masks, sup_w, decay,
                    cfg, denoise_label=not args.no_denoise,
                    threshold=threshold, train_mode=train_mode,
                    rng=r3 if train_mode else None,
                    accum=args.grad_accum)
            if trainer is None:
                teacher, student = out.teacher_state, out.student_state
            s_losses.append(out.student_loss_total)
            kept.append(out.n_kept)
            p_losses.append(out.pseudo_loss)
            if preemption.stop_requested():
                break
        if preemption.stop_requested():
            if trainer is not None:
                teacher, student = _merge_ema_pp(trainer, teacher, student)
            _preempt_exit(args, teacher, student, epoch, best_s, best_t)
        if trainer is not None:
            # merge the per-stage params back for eval + checkpointing
            trainer.scheduler_step()
            teacher, student = _merge_ema_pp(trainer, teacher, student)
        teacher = teacher.scheduler_step()
        student = student.scheduler_step()
        s_losses = common.host_floats(s_losses)
        images_used = int(sum(common.host_floats(kept)))
        p_losses = [x for x in common.host_floats(p_losses)
                    if np.isfinite(x)]

        t0 = time.time()
        ev_s, ev_t, mious, pi_mious = [], [], [], []
        for images_u8, masks_u8 in loaders["eval"]:
            imgs, masks = common.device_eval_batch(images_u8, masks_u8,
                                                   dcfg)
            tl, _ = eval_step(teacher, imgs, masks, cfg)
            sl, pred = eval_step(student, imgs, masks, cfg)
            ev_t.append(tl)
            ev_s.append(sl)
            mious.append(binary_miou(pred, masks))
            pi_mious.append(per_image_miou(pred, masks))
        ev_t, ev_s = common.host_floats(ev_t), common.host_floats(ev_s)
        mious = common.host_floats(mious)
        pi_mious = common.host_floats(pi_mious)
        fps = len(loaders["eval"]) / max(time.time() - t0, 1e-9)

        train_loss = float(np.mean(s_losses)) if s_losses else 0.0
        eval_s = float(np.mean(ev_s)) if ev_s else 0.0
        eval_t = float(np.mean(ev_t)) if ev_t else 0.0
        logger.log(epoch, train_loss=train_loss, eval_loss=eval_s,
                   teacher_eval=eval_t, images_used=images_used,
                   pseudo_loss=float(np.mean(p_losses)) if p_losses
                   else 0.0,
                   miou=float(np.mean(mious)) if mious else 0.0,
                   miou_per_image=(float(np.mean(pi_mious))
                                   if pi_mious else 0.0),
                   fps=fps)
        print(f"epoch {epoch}: {images_used} unlabeled images used "
              f"(ema), student eval {eval_s:.4f}")
        if eval_s < best_s:
            best_s = eval_s
            if save_model:
                ckpt_s.maybe_save(student, epoch, train_loss, eval_s, fps)
        if eval_t < best_t:
            best_t = eval_t
            if save_model:
                ckpt_t.maybe_save(teacher, epoch, train_loss, eval_t, fps)
        _save_lasts(args, teacher, student, epoch, best_s, best_t)
    _wait_saves(args)
    return min(best_s, best_t)


def _merge_ema_pp(trainer, teacher, student):
    """Pull the pipeline trainer's per-stage params back into the two
    TrainStates, committed to one device so the jitted eval/checkpoint
    path ships each model's params host->device ONCE, not per batch."""
    dev0 = jax.devices()[0]
    student = student.replace(
        params=jax.device_put(trainer.merged_student_params(), dev0))
    tvars = jax.device_put(trainer.merged_teacher_variables(), dev0)
    teacher = teacher.replace(
        params=tvars["params"],
        batch_stats=tvars.get("batch_stats", teacher.batch_stats))
    return teacher, student


def _try_resume(args, teacher, student, ckpt_s, ckpt_t, rng):
    """Restore `ts_{teacher,student}_last` when --resume is set and both
    exist: returns (teacher, student, start_epoch, best_s, best_t, rng).
    The rng is folded with the restart epoch so the resumed augment
    stream is deterministic (exact uninterrupted-run keys are not part of
    the contract — the reference cannot resume at all, SURVEY.md §5)."""
    fresh = (teacher, student, 0, float("inf"), float("inf"), rng)
    if not (getattr(args, "resume", False) and args.checkpoint_dir
            and not getattr(args, "tune", False)):
        return fresh
    from semisupervisedobjectdetection_tpu.checkpoint.orbax_io import (
        load_last,
    )
    got_t = load_last(args.checkpoint_dir, "ts_teacher", teacher)
    got_s = load_last(args.checkpoint_dir, "ts_student", student)
    if got_t is None or got_s is None:
        return fresh
    teacher, _, best_t = got_t
    student, start_epoch, best_s = got_s
    ckpt_t.best_loss, ckpt_s.best_loss = best_t, best_s
    rng = jax.random.fold_in(rng, start_epoch)
    print(f"resumed teacher+student from epoch {start_epoch} "
          f"(best student eval {best_s:.4f}, teacher {best_t:.4f})")
    return teacher, student, start_epoch, best_s, best_t, rng


def _save_lasts(args, teacher, student, epoch, best_s, best_t):
    """Write both `_last` resume checkpoints (only in --resume mode; the
    B5 full-state write costs seconds per epoch, so it is opt-in —
    --async-checkpoint moves it to a background thread overlapped with
    the next epoch)."""
    if not (getattr(args, "resume", False) and args.checkpoint_dir
            and not getattr(args, "tune", False)):
        return
    from semisupervisedobjectdetection_tpu.checkpoint.orbax_io import (
        save_last,
        save_last_async,
    )
    save = (save_last_async if getattr(args, "async_checkpoint", False)
            else save_last)
    save(args.checkpoint_dir, "ts_teacher", teacher, epoch, best_t)
    save(args.checkpoint_dir, "ts_student", student, epoch, best_s)


def _wait_saves(args):
    """Make any --async-checkpoint writes durable before returning."""
    if getattr(args, "async_checkpoint", False):
        from semisupervisedobjectdetection_tpu.checkpoint.orbax_io import (
            wait_pending_saves,
        )
        wait_pending_saves()


def main(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--teacher-lr", type=float, default=5e-7)
    p.add_argument("--student-lr", type=float, default=3e-5)
    p.add_argument("--supervise-weight", type=float, default=0.8)
    p.add_argument("--threshold", type=float, default=0.75,
                   help="pseudo-mask threshold (best grid point `:289`)")
    p.add_argument("--no-denoise", action="store_true")
    p.add_argument("--reset-teacher", action="store_true",
                   help="hard copy student->teacher every 5 epochs")
    p.add_argument("--ema", type=float, default=0.0,
                   help=">0 enables EMA teacher updates (build addition)")
    p.add_argument("--ema-mode", action="store_true",
                   help="run the fused mean-teacher loop (train/ema.py): "
                        "per-step EMA with decay --ema, no teacher "
                        "gradients — the flagship TPU mode")
    p.add_argument("--int8-teacher", action="store_true",
                   help="ema-mode teacher forwards through the int8 "
                        "serving path (snapshot refreshed per epoch)")
    p.add_argument("--resume", action="store_true",
                   help="crash-safe mode: write ts_{teacher,student}_last "
                        "checkpoints every epoch and continue from them "
                        "when present (both loops; disabled under --tune)")
    p.add_argument("--async-checkpoint", action="store_true",
                   help="with --resume: write the per-epoch _last "
                        "checkpoints on a background thread (device-side "
                        "snapshot now, d2h + disk write overlapped with "
                        "the next epoch)")
    p.add_argument("--tune", action="store_true",
                   help="random-order grid over supervise_weight x "
                        "threshold (reference grid `:274-280`)")
    args = p.parse_args(argv)
    if args.ema_mode and args.ema <= 0:
        args.ema = 0.999          # mean-teacher default decay
    dcfg, tc = common.configs_from_args(args)
    dcfg = common.ensure_data(args, dcfg, need_unlabeled=True)
    loaders = common.make_loaders(dcfg, args.seed,
                                  flags=("train", "eval", "pseudo"))
    if args.ema_mode:
        # the EMA step microbatches BOTH halves of the (unlabeled,
        # labeled) pair — validate each loader's effective batch;
        # --parallel dp_pp additionally shards each dp-ways first
        common.check_grad_accum(args, loaders["train"],
                                dp_pp_capable=True)
        common.check_grad_accum(args, loaders["pseudo"],
                                dp_pp_capable=True)
    else:
        # two-gradient-model loop: phase B microbatches the labeled batch
        # (both models' grads accumulated in one scan), phase A the
        # unlabeled batch on teacher-update epochs
        common.check_grad_accum(args, loaders["train"])
        common.check_grad_accum(args, loaders["pseudo"])
    cfg = MIT_VARIANTS[args.variant](dtype=args.dtype)
    cfg = common.apply_perf_preset(cfg, args)
    logger = MetricLogger(args.metrics_csv)

    if args.tune:
        from semisupervisedobjectdetection_tpu.core.config import (
            product_grid,
        )

        grid = product_grid([5e-7], [3e-5], [0.8, 0.7],
                            [0.8, 0.85, 0.87], shuffle=True,
                            seed=args.seed)

        def point(pt, plog):
            t_lr, s_lr, w, thr = pt
            return train_run(args, dcfg, tc, loaders, cfg, plog,
                             teacher_lr=t_lr, student_lr=s_lr,
                             supervise_weight=w, threshold=thr,
                             epochs=max(tc.epochs // 5, 1))

        # tag carries EVERY grid axis — singleton lr axes included — so
        # widening the grid can never alias two points' CSVs
        common.sweep_grid(
            args, grid, point,
            tag_of=lambda p: f"tlr{p[0]}_slr{p[1]}_w{p[2]}_thr{p[3]}",
            show_of=lambda p: (f"t_lr={p[0]} s_lr={p[1]} w={p[2]} "
                               f"thr={p[3]}"))
    else:
        train_run(args, dcfg, tc, loaders, cfg, logger,
                  teacher_lr=args.teacher_lr, student_lr=args.student_lr,
                  supervise_weight=args.supervise_weight,
                  threshold=args.threshold, epochs=tc.epochs)
    logger.close()
    common.maybe_plot_curves(args)


if __name__ == "__main__":
    preemption.install()
    main()
