"""Few-shot domain-prompting CLI —
`main_segformer/segFormer_fewshot_learning.py`.

Run:  python -m semisupervisedobjectdetection_tpu.cli.fewshot \
          --synthetic --variant b0 --img-size 128 --epochs 2 --mode ae

Two modes mirroring the reference's two loops: `--mode ae` trains the
domain-prompt autoencoder (per iteration: one category pair from the
labeled-classified group + one from the unlabeled-classified group, loss =
recon + 100*inter + 100*intra, ref `:240-344`); `--mode seg` runs the
supervised per-domain fine-tune (`:44-133`). With --synthetic, domains are
synthesized as directory groups.
"""

from __future__ import annotations

import os
import random
import tempfile
import time

import jax
import numpy as np

from semisupervisedobjectdetection_tpu.cli import common
from semisupervisedobjectdetection_tpu.core.config import MIT_VARIANTS
from semisupervisedobjectdetection_tpu.data.classified import (
    category_loaders,
    get_categories,
)
from semisupervisedobjectdetection_tpu.data.synthetic import (
    write_synthetic_dataset,
)
from semisupervisedobjectdetection_tpu.models.segformer import SegFormer
from semisupervisedobjectdetection_tpu.train.state import TrainState
from semisupervisedobjectdetection_tpu.train import fewshot as fw
from semisupervisedobjectdetection_tpu.train.supervised import eval_step
from semisupervisedobjectdetection_tpu.utils import preemption
from semisupervisedobjectdetection_tpu.utils.logging import MetricLogger


import functools


@functools.partial(jax.jit, static_argnames=("cfg",))
def _eval_ae_recon(cfg, variables, imgs):
    """Few-shot AE eval = reconstruction MSE only (the reference's eval
    calls predict(use_loss='mse') without the inter/intra terms,
    `segFormer_fewshot_learning.py:303-311`)."""
    from semisupervisedobjectdetection_tpu import losses
    from semisupervisedobjectdetection_tpu.train.common import (
        forward_logits,
    )

    logits, _, _ = forward_logits(cfg, variables, imgs, train_mode=False)
    return losses.mse_loss(imgs, logits, divisor=imgs.shape[0] * 3)


class RoundRobin:
    """Round-robin category iterator with StopIteration restart
    (ref `:70-81,193-204`)."""

    def __init__(self, loaders):
        self.loaders = loaders
        self.iters = [iter(l) for l in loaders]

    def next_from(self, idx):
        try:
            return next(self.iters[idx])
        except StopIteration:
            self.iters[idx] = iter(self.loaders[idx])
            return next(self.iters[idx])


def synth_classified(args, dcfg, n_domains=3):
    root = tempfile.mkdtemp(prefix="sso_classified_")
    size = max(dcfg.canvas, 64)
    for grp, unlab in (("labeled", False), ("unlabeled", True)):
        for d in range(n_domains):
            write_synthetic_dataset(
                os.path.join(root, grp, f"domain{d}"),
                os.path.join(root, "masks") if not unlab else None,
                n=max(args.synthetic_n // 3, 6), size=size,
                seed=args.seed + 17 * d + (100 if unlab else 0),
                unlabeled=unlab)
    return dcfg.replace(labeled_classified=os.path.join(root, "labeled"),
                        unlabeled_classified=os.path.join(root,
                                                          "unlabeled"),
                        maskdir=os.path.join(root, "masks"))


def main(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--mode", default="ae", choices=["ae", "seg"])
    p.add_argument("--iterations", type=int, default=0,
                   help="iterations per epoch (0 = reference defaults: "
                        "101 for ae `:241`, 35 for seg `:45`)")
    p.add_argument("--labeled-classified")
    p.add_argument("--unlabeled-classified")
    p.add_argument("--cls-loss-weight", type=float, default=0.0)
    p.add_argument("--predict", action="store_true",
                   help="eval-only from --pretrain-weight with CLS tokens "
                        "(reference `prediction`, "
                        "segFormer_fewshot_learning.py:27-41)")
    p.add_argument("--tune", action="store_true",
                   help="grid search lr x weight-decay x scheduler-gamma "
                        "over the selected --mode loop (reference grid "
                        "`:362-363`: lr {8e-5,5e-5,2e-5,5e-6} x wd 5e-5 "
                        "x gamma 0.97, shuffled, first --tune-max points)")
    p.add_argument("--tune-lrs", default="8e-5,5e-5,2e-5,5e-6")
    p.add_argument("--tune-wds", default="5e-5")
    p.add_argument("--tune-gammas", default="0.97")
    p.add_argument("--tune-max", type=int, default=18,
                   help="cap on shuffled grid points (the reference's "
                        "tuning loop takes the first 18, `:387`)")
    p.add_argument("--resume", action="store_true",
                   help="crash-safe mode: write a "
                        "<ckpt-dir>/fewshot_<mode>_last checkpoint every "
                        "epoch and continue from it when present — the "
                        "reference cannot resume (optimizer state is "
                        "never saved)")
    args = p.parse_args(argv)
    common.warn_parallel_unsupported(args, 'fewshot')
    if args.tune and args.resume:
        print("--resume is ignored under --tune (grid points must not "
              "share one _last checkpoint)")
        args.resume = False
    dcfg, tc = common.configs_from_args(args)
    # --grad-accum (round 5): microbatch the category batches inside the
    # jitted steps. Fail fast the way check_grad_accum does for the tile
    # loaders — the few-shot loaders use few_shot_batch_size, not
    # --batch-size.
    accum = max(getattr(args, "grad_accum", 1), 1)
    if accum > 1:
        fsb = dcfg.few_shot_batch_size
        if fsb % accum:
            raise SystemExit(
                f"--grad-accum {accum} does not divide the few-shot "
                f"batch size {fsb} (DataConfig.few_shot_batch_size)")
        if fsb // accum < 2 and (
                args.mode == "ae" or args.cls_loss_weight > 0.0):
            raise SystemExit(
                f"--grad-accum {accum} leaves microbatches of "
                f"{fsb // accum} < 2 samples; the intra-domain cosine "
                f"loss pairs the first/second half of each microbatch")
    if args.labeled_classified:
        dcfg = dcfg.replace(labeled_classified=args.labeled_classified,
                            unlabeled_classified=args.unlabeled_classified)
    else:
        dcfg = synth_classified(args, dcfg)
    dcfg2 = common.ensure_data(args, dcfg)
    dcfg = dcfg.replace(evalset=dcfg2.evalset, dataset=dcfg2.dataset,
                        maskdir=dcfg.maskdir or dcfg2.maskdir)
    eval_loaders = common.make_loaders(dcfg, args.seed, flags=("eval",))

    iters = args.iterations or (101 if args.mode == "ae" else 35)
    num_labels = 3 if args.mode == "ae" else 1
    cfg = MIT_VARIANTS[args.variant](
        num_labels=num_labels, cls_tokens=(1, 1, 1, 1), dtype=args.dtype)
    cfg = common.apply_perf_preset(cfg, args)
    logger = MetricLogger(args.metrics_csv)

    if args.predict:
        import numpy as _np

        state = _build_state(args, dcfg, tc, cfg)
        ev = []
        for images_u8, masks_u8 in eval_loaders["eval"]:
            imgs, masks = common.device_eval_batch(images_u8, masks_u8,
                                                   dcfg)
            loss, _ = eval_step(state, imgs, masks, cfg)
            ev.append(float(loss))
        print(f"eval loss: {_np.mean(ev):.4f} "
              f"(dice ~ {1 - _np.mean(ev):.4f})")
        return

    lab = category_loaders(dcfg, "labeled", args.seed)
    unlab = category_loaders(dcfg, "unlabeled", args.seed)
    print(f"{len(lab)} labeled domains, {len(unlab)} unlabeled domains")

    if args.tune:
        def run_point(tci, plog):
            return train_run(args, dcfg, tci, cfg, plog, eval_loaders,
                             lab, unlab, iters, save_model=False)

        common.run_tune_grid(args, tc, run_point)
        logger.close()
        return

    train_run(args, dcfg, tc, cfg, logger, eval_loaders, lab, unlab,
              iters)
    logger.close()
    common.maybe_plot_curves(args)


def _build_state(args, dcfg, tc, cfg):
    import jax.numpy as jnp

    model = SegFormer(cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((1, dcfg.img_h, dcfg.img_w, 3)))
    state = TrainState.create(variables, tc)
    if args.pretrain_weight:
        from semisupervisedobjectdetection_tpu.checkpoint.orbax_io import (
            restore_state,
        )
        # warm start: weights only — fresh Adam, scheduler at epoch 0
        # (reference ctor loads the .pth THEN builds optimizer+scheduler)
        state = restore_state(args.pretrain_weight, state,
                              load_opt_state=False, load_epoch=False)
        print("Pretrained model loaded")
    return state


def train_run(args, dcfg, tc, cfg, logger, eval_loaders, lab, unlab,
              iters, save_model=True) -> float:
    """One full few-shot training run (`--mode ae` or `seg`); returns
    the best eval loss (the tuning objective, ref `:387-396`).
    `save_model=False` (tuning) skips all checkpoint writes like the
    reference's `save_model=False`."""
    accum = max(getattr(args, "grad_accum", 1), 1)  # validated in main()
    state = _build_state(args, dcfg, tc, cfg)
    rng = jax.random.PRNGKey(args.seed)
    pyrng = random.Random(args.seed)
    rr_lab, rr_unlab = RoundRobin(lab), RoundRobin(unlab)

    # Best-eval checkpointing mirrors the reference's save_model gate
    # (`segFormer_fewshot_learning.py:160-166` seg, `:323-328` ae).
    from semisupervisedobjectdetection_tpu.checkpoint.orbax_io import (
        BestCheckpointer,
    )

    ckpt = BestCheckpointer(args.checkpoint_dir,
                            prefix=f"fewshot_{args.mode}")
    best = float("inf")
    start_epoch = 0
    resume = save_model and args.resume and args.checkpoint_dir
    if resume:
        from semisupervisedobjectdetection_tpu.checkpoint.orbax_io import (
            load_last,
        )

        got = load_last(args.checkpoint_dir, f"fewshot_{args.mode}", state)
        if got is not None:
            state, start_epoch, best = got
            ckpt.best_loss = best
            # deterministic restart points for both sampling streams
            # (same convention as cli/supervised.py train_loop)
            rng = jax.random.fold_in(rng, start_epoch)
            pyrng = random.Random(args.seed + start_epoch)
            print(f"resumed from epoch {start_epoch} "
                  f"(best eval {best:.4f})")

    for epoch in range(start_epoch, tc.epochs):
        ep_losses = []
        for it in range(iters):
            def draw_pair(rr, n):
                a, b = pyrng.sample(range(n), 2)
                (i1, m1), (i2, m2) = rr.next_from(a), rr.next_from(b)
                return (i1, m1), (i2, m2)

            rng, r1, r2, r3, r4 = jax.random.split(rng, 5)
            if args.mode == "ae":
                (a1, _), (a2, _) = draw_pair(rr_lab, len(lab))
                (b1, _), (b2, _) = draw_pair(rr_unlab, len(unlab))
                g11, _ = common.device_train_batch(r1, a1, None, dcfg)
                g12, _ = common.device_train_batch(r2, a2, None, dcfg)
                g21, _ = common.device_train_batch(r3, b1, None, dcfg)
                g22, _ = common.device_train_batch(r4, b2, None, dcfg)
                out = fw.fewshot_ae_step(state, g11, g12, g21, g22, cfg,
                                         accum=accum)
                state = out.state
                ep_losses.append(out.loss)
            else:
                (a1, m1), (a2, m2) = draw_pair(rr_lab, len(lab))
                i1, mm1 = common.device_train_batch(r1, a1, m1, dcfg)
                i2, mm2 = common.device_train_batch(r2, a2, m2, dcfg)
                out = fw.fewshot_seg_step(state, i1, mm1, i2, mm2, cfg,
                                          args.cls_loss_weight,
                                          accum=accum)
                state = out.state
                ep_losses.append(out.loss)
            if preemption.stop_requested():
                break
        if preemption.stop_requested():
            common.preempt_exit(
                args, [(f"fewshot_{args.mode}", state, best)], epoch,
                tuning=not save_model)
        state = state.scheduler_step()
        # one device->host sync per epoch (tunnel round trips are ~32ms)
        ep_losses = common.host_floats(ep_losses)

        t0 = time.time()
        ev = []
        for images_u8, masks_u8 in eval_loaders["eval"]:
            imgs, masks = common.device_eval_batch(images_u8, masks_u8,
                                                   dcfg)
            if args.mode == "seg":
                loss, _ = eval_step(state, imgs, masks, cfg)
            else:
                v = {"params": state.params,
                     "batch_stats": state.batch_stats}
                loss = _eval_ae_recon(cfg, v, imgs)
            ev.append(loss)
        ev = common.host_floats(ev)
        fps = len(eval_loaders["eval"]) / max(time.time() - t0, 1e-9)
        train_loss = float(np.mean(ep_losses)) if ep_losses else 0.0
        eval_loss = float(np.mean(ev)) if ev else 0.0
        logger.log(epoch, train_loss=train_loss, eval_loss=eval_loss,
                   fps=fps)
        if eval_loss < best:
            best = eval_loss
            if save_model and args.checkpoint_dir:
                ckpt.maybe_save(state, epoch, train_loss, eval_loss, fps)
        if resume:
            from semisupervisedobjectdetection_tpu.checkpoint.orbax_io \
                import save_last

            save_last(args.checkpoint_dir, f"fewshot_{args.mode}", state,
                      epoch, best)
    return best


if __name__ == "__main__":
    preemption.install()
    main()
