"""Quality check: EMA mean-teacher loop vs the gradient-teacher loop.

Trains both semi-supervised modes from the same warm start on the same
synthetic data and prints final binarized-dice eval per mode — evidence
that switching the benched flagship to EMA (train/ema.py) preserves
segmentation quality, not just throughput. CPU-runnable in ~3-5 min:

    python scripts/ema_quality_check.py [--epochs 6] [--size 64]

The gradient-teacher loop follows the reference algorithm
(`main_segformer/segFormer_semi_teacherstudent_main.py`, SURVEY.md §3.2);
the EMA loop replaces the teacher's gradient step with a per-step EMA.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--ema", type=float, default=0.95)
    args = p.parse_args()

    import jax

    # Always CPU: this is a tiny-model quality comparison, and the single
    # tunneled TPU must stay free for benchmark processes.
    jax.config.update("jax_platforms", "cpu")
    from semisupervisedobjectdetection_tpu.utils.cache import (
        setup_compile_cache,
    )

    setup_compile_cache("/tmp/jax_test_cache", min_compile_secs=0.5)
    import jax.numpy as jnp

    from semisupervisedobjectdetection_tpu.core.config import (
        TrainConfig,
        mit_b0,
    )
    from semisupervisedobjectdetection_tpu.data.synthetic import (
        synthetic_batch,
    )
    from semisupervisedobjectdetection_tpu.losses import dice_argmax_loss
    from semisupervisedobjectdetection_tpu.models.segformer import SegFormer
    from semisupervisedobjectdetection_tpu.train import ema as ema_mod
    from semisupervisedobjectdetection_tpu.train import (
        teacher_student as ts,
    )
    from semisupervisedobjectdetection_tpu.train.state import TrainState
    from semisupervisedobjectdetection_tpu.train.supervised import eval_step

    cfg = mit_b0(depths=(1, 1, 1, 1), hidden_sizes=(8, 16, 32, 64),
                 num_heads=(1, 2, 4, 8), decoder_hidden=32)
    tc = TrainConfig(lr=args.lr)
    s = args.size

    def batch(seed):
        imgs, masks = synthetic_batch(seed=seed, batch=args.batch, size=s)
        return (jnp.asarray(imgs, jnp.float32) / 255.0,
                jnp.asarray(masks, jnp.float32))

    labeled = [batch(i) for i in range(3)]
    unlabeled = [batch(100 + i)[0] for i in range(3)]
    ev_imgs, ev_masks = batch(999)

    variables = jax.jit(SegFormer(cfg).init)(jax.random.PRNGKey(0),
                                             labeled[0][0][:1])
    sup_w = jnp.asarray(0.8)

    def evaluate(state):
        loss, pred = eval_step(state, ev_imgs, ev_masks, cfg)
        return 1.0 - float(dice_argmax_loss(pred, ev_masks))

    # ---- gradient-teacher loop (reference algorithm, improved mode)
    t = TrainState.create(variables, tc)
    st = TrainState.create(variables, tc)
    for epoch in range(args.epochs):
        for ui in unlabeled:
            out = ts.pseudo_label_step(t, ui, jnp.asarray(epoch % 4 == 0),
                                       cfg, confident_threshold=0.0)
            t = out.teacher_state
        for imgs, masks in labeled:
            lout = ts.labeled_step(t, st, imgs, masks, sup_w, cfg)
            t, st = lout.teacher_state, lout.student_state
        t, st = t.scheduler_step(), st.scheduler_step()
    grad_dice = max(evaluate(t), evaluate(st))

    # ---- EMA mean-teacher loop (flagship benched mode)
    t2 = TrainState.create(variables, tc)
    s2 = TrainState.create(variables, tc)
    decay = jnp.asarray(args.ema)
    for epoch in range(args.epochs):
        for (imgs, masks), ui in zip(labeled, unlabeled):
            out = ema_mod.ema_semi_step(t2, s2, ui, imgs, masks, sup_w,
                                        decay, cfg,
                                        confident_threshold=0.0)
            t2, s2 = out.teacher_state, out.student_state
        t2, s2 = t2.scheduler_step(), s2.scheduler_step()
    ema_dice = max(evaluate(t2), evaluate(s2))

    print(f"gradient-teacher best eval dice: {grad_dice:.4f}")
    print(f"EMA mean-teacher  best eval dice: {ema_dice:.4f}")
    print(f"delta (ema - grad): {ema_dice - grad_dice:+.4f}")
    if ema_dice + 0.05 < grad_dice:
        print("WARNING: EMA mode trails the gradient loop by >0.05 dice")
        raise SystemExit(1)
    print("OK: EMA mode quality within tolerance of the gradient loop")


if __name__ == "__main__":
    main()
