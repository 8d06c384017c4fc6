"""Supervised SegFormer fine-tune CLI — `main_segformer/segFormer_main.py`.

Run:  python -m semisupervisedobjectdetection_tpu.cli.supervised \
          --synthetic --variant b0 --img-size 128 --epochs 2

Provides the reference script's Train / Prediction / Hyperparameter_Tuning
capabilities (`segFormer_main.py:21-144`) as flags: `--predict` runs
eval-only from a checkpoint; `--tune-lr a,b,c` grid-searches like
`Hyperparameter_Tuning` on an 80/20 split (`:103-144`).
"""

from __future__ import annotations

import time

import jax
import numpy as np

from semisupervisedobjectdetection_tpu.api import SegFormerModel
from semisupervisedobjectdetection_tpu.checkpoint.orbax_io import (
    BestCheckpointer,
)
from semisupervisedobjectdetection_tpu.cli import common
from semisupervisedobjectdetection_tpu.core.config import MIT_VARIANTS
from semisupervisedobjectdetection_tpu.eval.metrics import (
    binary_miou,
    per_image_miou,
    dice_score,
)
from semisupervisedobjectdetection_tpu.utils import preemption
from semisupervisedobjectdetection_tpu.utils.logging import (
    MetricLogger,
    profile_trace,
)


def train_loop(model: SegFormerModel, loaders, dcfg, tc, args,
               logger: MetricLogger, loss_type: str = "dice",
               save_model: bool = True):
    """Epoch loop mirroring `Train` (`segFormer_main.py:35-100`).
    `save_model=False` (tuning) skips every checkpoint write like the
    reference's `Hyperparameter_Tuning(save_model=False)` (`:125-142`)."""
    from semisupervisedobjectdetection_tpu.data.prefetch import (
        prefetch_train_batches,
    )

    ckpt = BestCheckpointer(args.checkpoint_dir, prefix="segformer")
    rng = jax.random.PRNGKey(args.seed)
    depth = getattr(args, "prefetch", 1)
    best = float("inf")
    start_epoch = 0
    # --tune-lr reruns this loop per grid point: resuming them all from
    # one shared `_last` would be wrong, so tuning disables resume.
    resume = (save_model and getattr(args, "resume", False)
              and args.checkpoint_dir
              and not getattr(args, "tune_lr", None))
    if resume:
        from semisupervisedobjectdetection_tpu.checkpoint.orbax_io import (
            load_last,
        )
        got = load_last(args.checkpoint_dir, "segformer", model.state)
        if got is not None:
            model.state, start_epoch, best = got
            ckpt.best_loss = best
            # Deterministic restart point for the augment stream; the
            # exact uninterrupted-run keys are not part of the resume
            # contract (the reference cannot resume AT ALL — it loses
            # optimizer/scheduler state, SURVEY.md §5 checkpoint row).
            rng = jax.random.fold_in(rng, start_epoch)
            print(f"resumed from epoch {start_epoch} "
                  f"(best eval {best:.4f})")

    # --parallel pp / dp_pp: stage-per-device GPipe pipeline training
    # (parallel/pipeline_train.py). The trainer owns per-stage params +
    # optimizer moments; merged params sync back into model.state each
    # epoch for eval/checkpointing (note: a saved checkpoint therefore
    # carries fresh optimizer moments — resume restarts them, which is
    # still strictly more than the reference, which never saves them).
    pp_mode = getattr(args, "parallel", "none")
    trainer = pt = None
    if pp_mode in ("pp", "dp_pp"):
        from semisupervisedobjectdetection_tpu.parallel.pipeline_train \
            import DataParallelPipelinedTrainer, PipelinedTrainer

        # tc carries the run lr except under --tune-lr, where the grid
        # point lives in model.state.base_lr — honor it.
        tc_pp = tc.replace(lr=float(model.state.base_lr))
        if pp_mode == "pp":
            trainer = PipelinedTrainer(model.cfg, model.state.variables(),
                                       tc_pp, loss_type=loss_type,
                                       trainable_mask=model.state
                                       .trainable_mask)
        else:
            trainer = DataParallelPipelinedTrainer(
                model.cfg, model.state.variables(), tc_pp,
                dp=max(1, getattr(args, "dp", 2)), loss_type=loss_type,
                trainable_mask=model.state.trainable_mask)
        pt = trainer.pt if pp_mode == "dp_pp" else trainer
        # A resumed run restarts the trainer at epoch 0 — fast-forward the
        # exponential lr schedule to the checkpointed epoch (optimizer
        # moments DO restart fresh, per the note above; the lr must not).
        for _ in range(start_epoch):
            trainer.scheduler_step()
        ndev = len({d for st in pt.stage_states
                    for leaf in jax.tree.leaves(st.params)
                    for d in leaf.devices()} | {pt.head_device})
        print(f"--parallel {pp_mode}: GPipe pipeline training, "
              f"{model.cfg.num_stages} stages + head over {ndev} "
              f"device(s)"
              + (f" x {trainer.dp} replica groups"
                 if pp_mode == "dp_pp" else "")
              + f", micro={max(getattr(args, 'grad_accum', 1), 1)}")

    for epoch in range(start_epoch, tc.epochs):
        train_losses = []
        rng, epoch_rng = jax.random.split(rng)
        # Batches are decoded + staged to device on a background thread
        # (data/prefetch.py) so the step dispatch never waits on host IO.
        # Metrics stay on device (lazy=True) and sync ONCE per epoch —
        # per-step float() would idle the chip for a tunnel round trip
        # (~32ms) every step (see common.host_floats).
        for imgs, masks in prefetch_train_batches(loaders["train"],
                                                  epoch_rng, dcfg,
                                                  depth=depth):
            if trainer is not None:
                loss = trainer.step(
                    imgs, masks,
                    micro=max(getattr(args, "grad_accum", 1), 1))
            else:
                loss, _ = model.train_one_epoch(imgs, masks,
                                                use_loss=loss_type,
                                                lazy=True)
            train_losses.append(loss)
            if preemption.stop_requested():
                break
        if preemption.stop_requested():
            # mid-epoch preemption: pull pp stage params back first so the
            # checkpoint carries the trained weights, then save-and-exit 0
            if trainer is not None:
                model.state = model.state.replace(
                    params=jax.device_put(trainer.merged_params(),
                                          jax.devices()[0]))
            common.preempt_exit(args, [("segformer", model.state, best)],
                                epoch, tuning=not save_model)
        if trainer is not None:
            trainer.scheduler_step()
            # merged_params() is a host tree: commit it to one device NOW
            # so the jitted eval below doesn't re-upload the full param
            # tree every eval batch (at B5 scale that is ~300MB/batch
            # through the tunnel)
            model.state = model.state.replace(
                params=jax.device_put(trainer.merged_params(),
                                      jax.devices()[0]))
        else:
            model.scheduler_step()
        train_losses = common.host_floats(train_losses)

        t0 = time.time()
        eval_losses, dices, mious, pi_mious = [], [], [], []
        for images_u8, masks_u8 in loaders["eval"]:
            imgs, masks = common.device_eval_batch(images_u8, masks_u8,
                                                   dcfg)
            loss, pred = model.eval_one_epoch(imgs, masks, lazy=True)
            eval_losses.append(loss)
            dices.append(dice_score(pred, masks))
            mious.append(binary_miou(pred, masks))
            pi_mious.append(per_image_miou(pred, masks))
        eval_losses = common.host_floats(eval_losses)
        dices, mious = common.host_floats(dices), common.host_floats(mious)
        pi_mious = common.host_floats(pi_mious)
        fps = len(loaders["eval"]) / max(time.time() - t0, 1e-9)

        train_loss = float(np.mean(train_losses)) if train_losses else 0.0
        eval_loss = float(np.mean(eval_losses)) if eval_losses else 0.0
        lr_now = float(pt.head_state.lr if trainer is not None
                       else model.state.lr)
        logger.log(epoch, train_loss=train_loss, eval_loss=eval_loss,
                   dice=float(np.mean(dices)) if dices else 0.0,
                   miou=float(np.mean(mious)) if mious else 0.0,
                   miou_per_image=(float(np.mean(pi_mious))
                                   if pi_mious else 0.0),
                   fps=fps, lr=lr_now)
        if eval_loss < best:
            best = eval_loss
            if save_model and args.checkpoint_dir:
                ckpt.maybe_save(model.state, epoch, train_loss, eval_loss,
                                fps)
        if resume:
            from semisupervisedobjectdetection_tpu.checkpoint.orbax_io \
                import save_last, save_last_async

            if getattr(args, "async_checkpoint", False):
                # device-side snapshot now, d2h + disk write overlapped
                # with the next epoch (orbax_io._AsyncSaver)
                save_last_async(args.checkpoint_dir, "segformer",
                                model.state, epoch, best)
            else:
                save_last(args.checkpoint_dir, "segformer", model.state,
                          epoch, best)
    if resume and getattr(args, "async_checkpoint", False):
        from semisupervisedobjectdetection_tpu.checkpoint.orbax_io import (
            wait_pending_saves,
        )
        wait_pending_saves()
    return best


def main(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--loss", default="dice",
                   choices=["dice", "dice_argmax", "bce"])
    p.add_argument("--predict", action="store_true",
                   help="eval-only from --pretrain-weight")
    p.add_argument("--dump-masks",
                   help="with --predict: dir for GT/pred mask overlays")
    p.add_argument("--int8", action="store_true",
                   help="with --predict: serve through the int8 snapshot "
                   "(SegFormerModel.quantize — ~2x MXU rate on v5e)")
    p.add_argument("--fp8", action="store_true",
                   help="with --predict: serve through an fp8 (e4m3) "
                   "snapshot — native-rate on fp8-MXU TPUs (v6e+), "
                   "upcast-executed elsewhere")
    p.add_argument("--int8-snapshot",
                   help="with --int8/--fp8: persisted snapshot dir — "
                   "loaded if it exists (width auto-detected), else "
                   "written after quantize() "
                   "(SegFormerModel.save_quantized/load_quantized)")
    p.add_argument("--sliding-raster",
                   help="with --predict: path to one large RGB raster; "
                   "predicts via Hann-blended sliding windows "
                   "(eval/sliding_window.py) and writes "
                   "<dump-masks>/raster_mask.png")
    p.add_argument("--window", type=int, default=512,
                   help="sliding-raster window size")
    p.add_argument("--overlap", type=int, default=64,
                   help="sliding-raster window overlap")
    p.add_argument("--resume", action="store_true",
                   help="crash-safe mode: write a <ckpt-dir>/*_last "
                        "checkpoint (full state + epoch + best gate) every "
                        "epoch and continue from it when present — the "
                        "reference cannot resume (optimizer/scheduler "
                        "state is never saved)")
    p.add_argument("--async-checkpoint", action="store_true",
                   help="with --resume: write the per-epoch _last "
                        "checkpoint on a background thread (device-side "
                        "snapshot now, d2h + disk write overlapped with "
                        "the next epoch — at B5 scale the synchronous "
                        "write costs seconds per epoch)")
    p.add_argument("--tune-lr",
                   help="comma-separated lrs for grid search on 80/20 split")
    args = p.parse_args(argv)
    dcfg, tc = common.configs_from_args(args)
    if args.predict and args.sliding_raster:
        loaders = None          # raster serving needs no tile dataset
    else:
        dcfg = common.ensure_data(args, dcfg)
        loaders = common.make_loaders(dcfg, args.seed)
        if not args.predict:
            common.check_grad_accum(args, loaders["train"],
                                    dp_pp_capable=True)
    cfg = MIT_VARIANTS[args.variant](dtype=args.dtype)
    cfg = common.apply_perf_preset(cfg, args)
    logger = MetricLogger(args.metrics_csv)

    if args.tune_lr:
        sub = common.split_loaders(dcfg, loaders["train"].dataset,
                                   args.seed)
        common.check_grad_accum(args, sub["train"], dp_pp_capable=True)

        def point(pt, plog):
            (lr,) = pt
            model = SegFormerModel(lr=lr, train_config=tc, config=cfg,
                                   grad_accum=args.grad_accum)
            _, (model.state,) = common.setup_parallel(
                args, (model.state,), cfg)
            return train_loop(
                model, sub, dcfg,
                tc.replace(epochs=max(tc.epochs // 5, 1)),
                args, plog, args.loss, save_model=False)

        common.sweep_grid(
            args, [(float(x),) for x in args.tune_lr.split(",") if x],
            point, tag_of=lambda p: f"lr{p[0]}",
            show_of=lambda p: f"lr={p[0]}",
            objective="best eval loss", empty_hint="check --tune-lr")
        return

    model = SegFormerModel(pretrain_weight=args.pretrain_weight,
                           train_config=tc, config=cfg,
                           hf_weights=args.hf_weights,
                           grad_accum=args.grad_accum)
    if args.predict:
        if args.int8 and args.fp8:
            raise SystemExit("--int8 and --fp8 are mutually exclusive")
        if args.int8 or args.fp8:
            import os as _os

            kind = "fp8" if args.fp8 else "int8"
            if args.int8_snapshot and _os.path.exists(args.int8_snapshot):
                model.load_quantized(args.int8_snapshot)
                print(f"quantized snapshot loaded: {args.int8_snapshot}")
            else:
                model.quantize(kind=kind)
                if args.int8_snapshot:
                    model.save_quantized(args.int8_snapshot)
                    print(f"{kind} snapshot written: "
                          f"{args.int8_snapshot}")
        if args.sliding_raster:
            import os

            from PIL import Image

            from semisupervisedobjectdetection_tpu.eval.sliding_window \
                import sliding_window_predict

            img = np.asarray(Image.open(args.sliding_raster).convert(
                "RGB"), np.float32) / 255.0
            mask = sliding_window_predict(
                lambda tiles: model.predict(np.asarray(tiles)),
                img, window=args.window, overlap=args.overlap)
            out = args.dump_masks or "figures"
            os.makedirs(out, exist_ok=True)
            path = os.path.join(out, "raster_mask.png")
            Image.fromarray((mask * 255).astype(np.uint8)).save(path)
            print(f"raster mask written: {path} "
                  f"({img.shape[0]}x{img.shape[1]}, window {args.window}, "
                  f"overlap {args.overlap}"
                  + (", int8" if args.int8 else "")
                  + (", fp8" if args.fp8 else "") + ")")
            return
        losses = []
        dumped = 0
        for bi, (images_u8, masks_u8) in enumerate(loaders["eval"]):
            imgs, masks = common.device_eval_batch(images_u8, masks_u8,
                                                   dcfg)
            if args.int8 or args.fp8:
                from semisupervisedobjectdetection_tpu import losses as L

                pred = model.predict(np.asarray(imgs))
                loss = L.dice_argmax_loss(pred, np.asarray(masks))
            else:
                loss, pred = model.eval_one_epoch(imgs, masks)
            losses.append(float(loss))
            if args.dump_masks:
                # deterministic overlay dumps replacing the reference's
                # visdom panels (`segFormer_main.py:26-32`)
                for i in range(np.asarray(imgs).shape[0]):
                    model.show_mask(
                        f"{args.dump_masks}/b{bi:03d}_{i:02d}_gt.png",
                        np.asarray(imgs)[i], np.asarray(masks)[i])
                    model.show_mask(
                        f"{args.dump_masks}/b{bi:03d}_{i:02d}_pred.png",
                        np.asarray(imgs)[i], pred[i])
                    dumped += 1
        print(f"eval loss: {np.mean(losses):.4f} "
              f"(dice ~ {1 - np.mean(losses):.4f})"
              + (f"; dumped {dumped} mask overlays" if dumped else ""))
        return

    _, (model.state,) = common.setup_parallel(args, (model.state,), cfg)
    with profile_trace(args.profile_dir):
        train_loop(model, loaders, dcfg, tc, args, logger, args.loss)
    logger.close()
    common.maybe_plot_curves(args)


if __name__ == "__main__":
    preemption.install()
    main()
