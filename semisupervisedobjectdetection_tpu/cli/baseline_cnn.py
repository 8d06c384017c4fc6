"""CNN baseline CLI — `main_other/baseline_segmentation.py`.

Run:  python -m semisupervisedobjectdetection_tpu.cli.baseline_cnn \
          --synthetic --img-size 128 --epochs 1 --archs deeplabv3p

Sequentially trains the requested baseline architectures (reference trains
all five in one run, `:78-144`), each with dice-with-sigmoid loss and
grad-norm clip 35.
"""

from __future__ import annotations

import time

import jax
import numpy as np

from semisupervisedobjectdetection_tpu.checkpoint.orbax_io import (
    BestCheckpointer,
)
from semisupervisedobjectdetection_tpu.cli import common
from semisupervisedobjectdetection_tpu.models.cnn import BASELINE_ARCHS
from semisupervisedobjectdetection_tpu.train.baseline_cnn import (
    cnn_eval_step,
    cnn_train_step,
    create_cnn_state,
)
from semisupervisedobjectdetection_tpu.utils import preemption
from semisupervisedobjectdetection_tpu.utils.logging import MetricLogger


def main(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--archs", default=",".join(BASELINE_ARCHS),
                   help="comma-separated subset of " +
                        ",".join(BASELINE_ARCHS))
    p.add_argument("--encoder-depths", default="3,4,23,3",
                   help="ResNeXt stage depths (default = ResNeXt101)")
    p.add_argument("--encoder-weights",
                   help="torchvision-format ResNeXt .pth/.safetensors to "
                        "warm-start the encoder — the reference's "
                        "encoder_weights='imagenet' "
                        "(baseline_segmentation.py:154-162)")
    p.add_argument("--encoder-groups", type=int, default=32)
    p.add_argument("--encoder-base-width", type=int, default=8)
    p.add_argument("--resume", action="store_true",
                   help="crash-safe mode: write a per-arch "
                        "<ckpt-dir>/<arch>_last checkpoint every epoch and "
                        "continue from it when present — the reference "
                        "cannot resume (optimizer state is never saved)")
    args = p.parse_args(argv)
    dcfg, tc = common.configs_from_args(args)
    dcfg = common.ensure_data(args, dcfg)
    common.warn_perf_unsupported(args, 'baseline_cnn')
    common.warn_parallel_unsupported(args, 'baseline_cnn')
    loaders = common.make_loaders(dcfg, args.seed)
    common.check_grad_accum(args, loaders["train"])
    logger = MetricLogger(args.metrics_csv)
    depths = tuple(int(x) for x in args.encoder_depths.split(","))
    enc_kw = dict(encoder_depths=depths, groups=args.encoder_groups,
                  base_width=args.encoder_base_width)

    for arch in args.archs.split(","):
        print(f"======== {arch} ========")
        state, _ = create_cnn_state(
            arch, tc, jax.random.PRNGKey(args.seed),
            input_hw=(dcfg.img_h, dcfg.img_w), dtype=args.dtype, **enc_kw)
        if args.encoder_weights:
            from semisupervisedobjectdetection_tpu.checkpoint \
                .resnext_import import (
                    import_resnext_state_dict,
                    load_resnext_checkpoint,
                )

            sd = load_resnext_checkpoint(args.encoder_weights)
            enc_p, enc_s = import_resnext_state_dict(
                sd, state.params["encoder"],
                state.batch_stats["encoder"], depths=depths)
            state = state.replace(
                params={**state.params, "encoder": enc_p},
                batch_stats={**state.batch_stats, "encoder": enc_s})
            print(f"encoder warm-started from {args.encoder_weights}")
        ckpt = BestCheckpointer(args.checkpoint_dir, prefix=arch)
        rng = jax.random.PRNGKey(args.seed)
        best = float("inf")
        start_epoch = 0
        resume = args.resume and args.checkpoint_dir
        if resume:
            from semisupervisedobjectdetection_tpu.checkpoint.orbax_io \
                import load_last

            got = load_last(args.checkpoint_dir, arch, state)
            if got is not None:
                state, start_epoch, best = got
                ckpt.best_loss = best
                # deterministic restart point for the augment stream
                # (same convention as cli/supervised.py train_loop)
                rng = jax.random.fold_in(rng, start_epoch)
                print(f"{arch}: resumed from epoch {start_epoch} "
                      f"(best eval {best:.4f})")
        from semisupervisedobjectdetection_tpu.data.prefetch import (
            prefetch_train_batches,
        )

        for epoch in range(start_epoch, tc.epochs):
            tl = []
            # background-staged batches + one metric sync per epoch
            # (per-step float() costs a tunnel round trip — host_floats)
            rng, aug_rng_e, step_rng_e = jax.random.split(rng, 3)
            for bi, (imgs, masks) in enumerate(prefetch_train_batches(
                    loaders["train"], aug_rng_e, dcfg,
                    depth=getattr(args, "prefetch", 1))):
                d_rng = jax.random.fold_in(step_rng_e, bi)
                state, loss, _ = cnn_train_step(
                    state, imgs, masks, d_rng, arch, dtype=args.dtype,
                    accum=max(args.grad_accum, 1), **enc_kw)
                tl.append(loss)
                if preemption.stop_requested():
                    break
            if preemption.stop_requested():
                # completed archs already wrote their own _last (resume
                # mode) or best checkpoints; save only the interrupted one
                common.preempt_exit(args, [(arch, state, best)], epoch)
            state = state.scheduler_step()
            tl = common.host_floats(tl)
            t0 = time.time()
            ev = []
            for images_u8, masks_u8 in loaders["eval"]:
                imgs, masks = common.device_eval_batch(images_u8, masks_u8,
                                                       dcfg)
                loss, _ = cnn_eval_step(state, imgs, masks, arch,
                                        dtype=args.dtype, **enc_kw)
                ev.append(loss)
            ev = common.host_floats(ev)
            fps = len(loaders["eval"]) / max(time.time() - t0, 1e-9)
            train_loss = float(np.mean(tl)) if tl else 0.0
            eval_loss = float(np.mean(ev)) if ev else 0.0
            logger.log(epoch, arch=arch, train_loss=train_loss,
                       eval_loss=eval_loss, fps=fps)
            if eval_loss < best and args.checkpoint_dir:
                best = eval_loss
                ckpt.maybe_save(state, epoch, train_loss, eval_loss, fps)
            if resume:
                from semisupervisedobjectdetection_tpu.checkpoint.orbax_io \
                    import save_last

                save_last(args.checkpoint_dir, arch, state, epoch, best)
    logger.close()
    common.maybe_plot_curves(args)


if __name__ == "__main__":
    preemption.install()
    main()
