"""ViT (DINOv2) pipeline CLI — the reference's `main_vit_based/` scripts
(`vit_segmentation_main.py`, `vit_autoencoder_main.py`,
`vit_semi_teacherstudent_main.py`) under one entry point.

Run:  python -m semisupervisedobjectdetection_tpu.cli.vit_pipeline \
          --synthetic --img-size 126 --epochs 1 --mode seg --vit small
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
from semisupervisedobjectdetection_tpu.core.config import TrainConfig
from semisupervisedobjectdetection_tpu.train.vit_seg import (
    build_vit_seg,
    create_vit_state,
    make_vit_steps,
)
from semisupervisedobjectdetection_tpu.utils import preemption
from semisupervisedobjectdetection_tpu.utils.logging import MetricLogger


def main(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--mode", default="seg", choices=["seg", "ae", "semi"])
    p.add_argument("--vit", default="base",
                   choices=["small", "base", "large", "giant2"])
    p.add_argument("--patch-size", type=int, default=14)
    p.add_argument("--vit-depth", type=int, default=0,
                   help="override encoder/decoder depth (0 = variant)")
    p.add_argument("--dinov2-weights",
                   help="facebookresearch-format DINOv2 checkpoint "
                        "(.pth/.safetensors) to warm-start the encoder, "
                        "the reference's torch.hub dinov2_vitb14 load "
                        "(VitSegModel.py:20)")
    p.add_argument("--resume", action="store_true",
                   help="crash-safe mode: write <ckpt-dir>/vit_<mode>_last "
                        "checkpoints every epoch (both models in --mode "
                        "semi) and continue from them when present — the "
                        "reference cannot resume (optimizer state is "
                        "never saved)")
    args = p.parse_args(argv)
    dcfg, tc = common.configs_from_args(args)
    # ViT needs img size divisible by the patch size
    size = (dcfg.img_h // args.patch_size) * args.patch_size
    dcfg = dcfg.replace(img_h=size, img_w=size)
    common.warn_perf_unsupported(args, 'vit_pipeline')
    common.warn_parallel_unsupported(args, 'vit_pipeline')
    dcfg = common.ensure_data(args, dcfg,
                              need_unlabeled=args.mode != "seg")
    flags = ("train", "eval") if args.mode == "seg" else (
        "train", "eval", "unlabeled")
    loaders = common.make_loaders(dcfg, args.seed, flags=flags)
    common.check_grad_accum(args, loaders["train"])
    if "unlabeled" in loaders:
        common.check_grad_accum(args, loaders["unlabeled"])
    accum = max(args.grad_accum, 1)
    logger = MetricLogger(args.metrics_csv)

    out_chans = 3 if args.mode == "ae" else 1
    model = build_vit_seg(img_size=size, patch_size=args.patch_size,
                          out_chans=out_chans, variant=args.vit,
                          dtype=args.dtype,
                          depth=args.vit_depth or None)
    state = create_vit_state(model, tc, jax.random.PRNGKey(args.seed),
                             img_size=size)
    if args.dinov2_weights:
        from semisupervisedobjectdetection_tpu.checkpoint.dinov2_import \
            import import_dinov2_state_dict, load_dinov2_checkpoint

        sd = load_dinov2_checkpoint(args.dinov2_weights)
        enc = import_dinov2_state_dict(sd, state.params["encoder"])
        state = state.replace(params={**state.params, "encoder": enc})
        print(f"DINOv2 encoder warm-started from {args.dinov2_weights}")
    (seg_train, seg_eval, ae_train, pseudo_step,
     ts_labeled) = make_vit_steps(model)
    # semi mode keeps a separate student (ref vit_semi_teacherstudent:
    # teacher trains on GT+pseudo, student on the mixed loss)
    student = None
    if args.mode == "semi":
        student = create_vit_state(model, tc, jax.random.PRNGKey(args.seed),
                                   img_size=size)
        if args.dinov2_weights:
            # deep-copy: both states are donated per step and must not alias
            student = student.replace(params=jax.tree.map(
                jnp.copy, state.params))
    ckpt = BestCheckpointer(args.checkpoint_dir, prefix=f"vit_{args.mode}")
    rng = jax.random.PRNGKey(args.seed)
    best = float("inf")
    start_epoch = 0
    resume = args.resume and args.checkpoint_dir
    if resume:
        from semisupervisedobjectdetection_tpu.checkpoint.orbax_io import (
            load_last,
        )

        got = load_last(args.checkpoint_dir, f"vit_{args.mode}", state)
        got_s = (load_last(args.checkpoint_dir, "vit_semi_student", student)
                 if student is not None else None)
        # semi mode only resumes when BOTH _last checkpoints exist: a
        # teacher restored against a fresh student (or vice versa) is a
        # different optimization trajectory, not a continuation.
        if got is not None and (student is None or got_s is not None):
            state, start_epoch, best = got
            if got_s is not None:
                student = got_s[0]
            ckpt.best_loss = best
            # deterministic restart point for the augment stream (same
            # convention as cli/supervised.py train_loop)
            rng = jax.random.fold_in(rng, start_epoch)
            print(f"resumed from epoch {start_epoch} "
                  f"(best eval {best:.4f})")
    sup_w = jnp.asarray(0.5)

    from semisupervisedobjectdetection_tpu.data.prefetch import (
        prefetch_train_batches,
    )

    depth = getattr(args, "prefetch", 1)
    for epoch in range(start_epoch, tc.epochs):
        tl = []
        # background-staged batches + one metric sync per epoch
        # (per-step float() costs a tunnel round trip — host_floats)
        if args.mode == "semi":
            rng, epoch_rng = jax.random.split(rng)
            for imgs, _ in prefetch_train_batches(
                    loaders["unlabeled"], epoch_rng, dcfg, depth=depth):
                state, loss, _ = pseudo_step(state, imgs,
                                             jnp.asarray(True),
                                             accum=accum)
                if preemption.stop_requested():
                    break
        rng, epoch_rng = jax.random.split(rng)
        train_src = (((im, None) for im, _ in loaders["train"])
                     if args.mode == "ae" else loaders["train"])
        for imgs, masks in prefetch_train_batches(train_src, epoch_rng,
                                                  dcfg, depth=depth):
            if args.mode == "ae":
                state, loss, _ = ae_train(state, imgs, accum=accum)
            elif args.mode == "semi":
                state, student, loss, _ = ts_labeled(state, student,
                                                     imgs, masks, sup_w,
                                                     accum=accum)
            else:
                state, loss, _ = seg_train(state, imgs, masks,
                                           accum=accum)
            tl.append(loss)
            if preemption.stop_requested():
                break
        if preemption.stop_requested():
            saves = [(f"vit_{args.mode}", state, best)]
            if student is not None:
                saves.append(("vit_semi_student", student, best))
            common.preempt_exit(args, saves, epoch)
        state = state.scheduler_step()
        if student is not None:
            student = student.scheduler_step()
        tl = common.host_floats(tl)

        t0 = time.time()
        ev = []
        for images_u8, masks_u8 in loaders["eval"]:
            imgs, masks = common.device_eval_batch(images_u8, masks_u8,
                                                   dcfg)
            if args.mode == "ae":
                from semisupervisedobjectdetection_tpu.models.vit_decoder \
                    import patch_loss
                out, _ = model.apply({"params": state.params}, imgs)
                loss = patch_loss(out, imgs, args.patch_size)
            else:
                # semi mode evaluates the student (the reference's best
                # checkpoints come from the student)
                loss, _ = seg_eval(student if student is not None
                                   else state, imgs, masks)
            ev.append(loss)
        ev = common.host_floats(ev)
        fps = len(loaders["eval"]) / max(time.time() - t0, 1e-9)
        train_loss = float(np.mean(tl)) if tl else 0.0
        eval_loss = float(np.mean(ev)) if ev else 0.0
        logger.log(epoch, train_loss=train_loss, eval_loss=eval_loss,
                   fps=fps)
        if eval_loss < best and args.checkpoint_dir:
            best = eval_loss
            # semi mode checkpoints the STUDENT — the reference saves
            # student_model.state_dict() on the student's best eval
            # (vit_semi_teacherstudent_main.py:159-164)
            ckpt.maybe_save(student if student is not None else state,
                            epoch, train_loss, eval_loss, fps)
        if resume:
            from semisupervisedobjectdetection_tpu.checkpoint.orbax_io \
                import save_last

            save_last(args.checkpoint_dir, f"vit_{args.mode}", state,
                      epoch, best)
            if student is not None:
                save_last(args.checkpoint_dir, "vit_semi_student", student,
                          epoch, best)
    logger.close()
    common.maybe_plot_curves(args)


if __name__ == "__main__":
    preemption.install()
    main()
