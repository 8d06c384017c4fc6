"""Autoencoder pretrain CLI — `main_segformer/segFormer_autoencoder_main.py`.

Run:  python -m semisupervisedobjectdetection_tpu.cli.autoencoder \
          --synthetic --variant b0 --img-size 128 --epochs 2

Trains a num_labels=3 SegFormer to reconstruct tiles (labeled then
unlabeled loops per epoch, ref `:49-68`); best checkpoint gated on
train+eval loss like the reference (`:107-108`). The resulting checkpoint
warm-starts the transfer-learning CLI. `--tune` sweeps
lr x weight-decay x scheduler-gamma on an 80/20 labeled split like
`Hyperparameter_Tuning` (`:133-170`: shuffled grid, first
`--tune-max`(=9) points, no unlabeled loop, no checkpoints).
"""

from __future__ import annotations

import time

import jax
import numpy as np

from semisupervisedobjectdetection_tpu.api import SegFormerModel
from semisupervisedobjectdetection_tpu.checkpoint.orbax_io import (
    best_checkpoint_name,
    save_state,
)
from semisupervisedobjectdetection_tpu.cli import common
from semisupervisedobjectdetection_tpu.core.config import MIT_VARIANTS
from semisupervisedobjectdetection_tpu.utils import preemption
from semisupervisedobjectdetection_tpu.utils.logging import MetricLogger


def train_loop(model, loaders, dcfg, tc, args, logger,
               save_model=True) -> float:
    """The reference `Train` loop (`:30-131`): labeled then unlabeled
    reconstruction passes per epoch, eval MSE, best gated on
    train+eval loss. Returns the best train+eval loss (the tuning
    objective, ref `:161-166`). `save_model=False` (tuning) skips all
    checkpoint writes like the reference's `save_model=False`."""
    rng = jax.random.PRNGKey(args.seed)
    best = float("inf")
    start_epoch = 0
    resume = save_model and args.resume and args.checkpoint_dir
    if resume:
        from semisupervisedobjectdetection_tpu.checkpoint.orbax_io import (
            load_last,
        )
        got = load_last(args.checkpoint_dir, "segformer_autoencoder",
                        model.state)
        if got is not None:
            model.state, start_epoch, best = got
            rng = jax.random.fold_in(rng, start_epoch)
            print(f"resumed from epoch {start_epoch} "
                  f"(best train+eval {best:.4f})")

    from semisupervisedobjectdetection_tpu.data.prefetch import (
        prefetch_train_batches,
    )

    flags = [f for f in ("train", "unlabeled") if f in loaders]
    for epoch in range(start_epoch, tc.epochs):
        train_losses = []
        # labeled tiles then unlabeled tiles (ref `:49-68`); batches staged
        # by a background thread, metrics synced once per epoch
        # (per-step float() costs a tunnel round trip — common.host_floats).
        for flag in flags:
            rng, epoch_rng = jax.random.split(rng)
            # masks stripped: the AE reconstructs images (ref `:49-68`)
            imgs_only = ((im, None) for im, _ in loaders[flag])
            for imgs, _ in prefetch_train_batches(
                    imgs_only, epoch_rng, dcfg,
                    depth=getattr(args, "prefetch", 1)):
                loss, _ = model.train_one_epoch_without_mask(imgs,
                                                             lazy=True)
                train_losses.append(loss)
                if preemption.stop_requested():
                    break
            if preemption.stop_requested():
                break
        if preemption.stop_requested():
            common.preempt_exit(
                args, [("segformer_autoencoder", model.state, best)],
                epoch, tuning=not save_model)
        model.scheduler_step()
        train_losses = common.host_floats(train_losses)

        t0 = time.time()
        eval_losses = []
        for images_u8, _ in loaders["eval"]:
            imgs, _ = common.device_eval_batch(images_u8, None, dcfg)
            loss, _ = model.eval_one_epoch_without_mask(imgs, lazy=True)
            eval_losses.append(loss)
        eval_losses = common.host_floats(eval_losses)
        # NOTE: reference logs sec/batch here, not batches/sec (`:102`)
        spb = (time.time() - t0) / max(len(loaders["eval"]), 1)

        train_loss = float(np.mean(train_losses))
        eval_loss = float(np.mean(eval_losses))
        logger.log(epoch, train_loss=train_loss, eval_loss=eval_loss,
                   sec_per_batch=spb)
        if train_loss + eval_loss < best:
            best = train_loss + eval_loss
            if save_model and args.checkpoint_dir:
                name = best_checkpoint_name("segformer_autoencoder", epoch,
                                            train_loss, eval_loss, spb)
                save_state(f"{args.checkpoint_dir}/{name}", model.state)
        if resume:
            from semisupervisedobjectdetection_tpu.checkpoint.orbax_io \
                import save_last

            save_last(args.checkpoint_dir, "segformer_autoencoder",
                      model.state, epoch, best)
    return best


def main(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--resume", action="store_true",
                   help="crash-safe mode: write a *_last checkpoint every "
                        "epoch and continue from it when present "
                        "(ignored under --tune)")
    p.add_argument("--tune", action="store_true",
                   help="grid search lr x weight-decay x scheduler-gamma "
                        "on an 80/20 labeled split "
                        "(ref Hyperparameter_Tuning, `:133-170`)")
    p.add_argument("--tune-lrs", default="1e-4,5e-5,1e-5")
    p.add_argument("--tune-wds", default="5e-5")
    p.add_argument("--tune-gammas", default="0.97")
    p.add_argument("--tune-max", type=int, default=9,
                   help="cap on shuffled grid points (ref takes the "
                        "first 9, `:157`)")
    args = p.parse_args(argv)
    common.warn_parallel_unsupported(args, 'autoencoder')
    if args.tune and args.resume:
        print("--resume is ignored under --tune (grid points must not "
              "share one _last checkpoint)")
        args.resume = False
    dcfg, tc = common.configs_from_args(args)
    cfg = MIT_VARIANTS[args.variant](num_labels=3, dtype=args.dtype)
    cfg = common.apply_perf_preset(cfg, args)
    logger = MetricLogger(args.metrics_csv)

    if args.tune:
        # Reference tuning splits the LABELED set 80/20 and never touches
        # the unlabeled tiles (`:133-143` passes unlabel_dataloader=None).
        dcfg = common.ensure_data(args, dcfg)
        loaders = common.make_loaders(dcfg, args.seed, flags=("train",))
        sub = common.split_loaders(dcfg, loaders["train"].dataset,
                                   args.seed)
        common.check_grad_accum(args, sub["train"])

        def run_point(tci, plog):
            # --pretrain-weight warm-starts every grid point, same as the
            # real run it tunes for (and as the sibling fewshot --tune)
            model = SegFormerModel(pretrain_weight=args.pretrain_weight,
                                   num_labels=3, train_config=tci,
                                   config=cfg, grad_accum=args.grad_accum)
            return train_loop(model, sub, dcfg, tci, args, plog,
                              save_model=False)

        common.run_tune_grid(args, tc, run_point,
                             objective="best train+eval")
        logger.close()
        return

    dcfg = common.ensure_data(args, dcfg, need_unlabeled=True)
    loaders = common.make_loaders(dcfg, args.seed,
                                  flags=("train", "eval", "unlabeled"))
    common.check_grad_accum(args, loaders["train"])
    common.check_grad_accum(args, loaders["unlabeled"])
    model = SegFormerModel(pretrain_weight=args.pretrain_weight,
                           num_labels=3, train_config=tc, config=cfg,
                           grad_accum=args.grad_accum)
    train_loop(model, loaders, dcfg, tc, args, logger)
    logger.close()
    common.maybe_plot_curves(args)


if __name__ == "__main__":
    preemption.install()
    main()
