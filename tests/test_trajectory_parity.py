"""N-step training-TRAJECTORY parity vs the reference's own torch loops.

Single-forward logits parity (test_hf_parity.py), single-step gradient
parity (test_modified_parity.py) and optimizer-chain parity
(test_optimizer_parity.py) each isolate one piece; these tests compose the
FULL loop the way the reference runs it — scheduler + weight decay +
NaN gate + clip + (for the semi loop) BN-stat updates interacting over
many steps — and bound the drift:

- supervised: `main_segformer/segFormer_main.py:35-57` semantics
  (train()-then-eval()-mode forwards, dice, clip_grad_value 1.2,
  Adam(0.5, 0.999) + weight decay, ExponentialLR per epoch) vs
  `train/supervised.train_step` with reference quirks on.
- teacher-student: `segFormer_semi_teacherstudent_main.py:59-129`
  (phase A no-grad pseudo labeling with the no-op teacher "update"
  quirk, phase B label denoising + blended student loss, TRAIN-mode
  forwards) vs `train/teacher_student.{pseudo_label_infer_step,
  labeled_step}` with train_mode=True.

Both stacks start from IDENTICAL imported weights (tests/_ref_oracle.py)
on identical fixed batches. Without the private Georgia data this is the
strongest attainable mIoU-parity evidence: per-step losses must stay
within an fp32-drift bound and the final binarized eval masks must agree
>99.9%. A B5-dims supervised slice runs in a fresh interpreter
(tests/_traj_b5_main.py — big new jits inside long-lived xdist workers
trip the XLA:CPU compile-cache serializer SIGSEGV, CLAUDE.md round-3).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semisupervisedobjectdetection_tpu.core.config import (
    MiTConfig,
    TrainConfig,
)
from semisupervisedobjectdetection_tpu.train import teacher_student as ts
from semisupervisedobjectdetection_tpu.train.state import TrainState
from semisupervisedobjectdetection_tpu.train.supervised import (
    eval_step,
    train_step,
)

from _ref_oracle import (  # noqa: E402
    RefTrainer,
    build_pair,
    ref_threshold_pseudo_masks,
)

TINY = dict(depths=(2, 2, 2, 2), hidden_sizes=(8, 16, 32, 64),
            num_heads=(1, 2, 4, 8), sr_ratios=(8, 4, 2, 1),
            decoder_hidden=32, num_labels=1,
            classifier_dropout=0.0, drop_path_rate=0.0)
LR, WD, GAMMA = 1e-4, 5e-5, 0.97


def _batches(n, batch, size, seed):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        img = rng.uniform(0, 1, (batch, 3, size, size)).astype(np.float32)
        mask = (rng.uniform(0, 1, (batch, size, size)) > 0.6
                ).astype(np.float32)
        out.append((img, mask))
    return out


def _nhwc(x):
    return jnp.asarray(x.transpose(0, 2, 3, 1))


def _mask_agreement(a, b):
    return float(np.mean((np.asarray(a) >= 0.5) == (np.asarray(b) >= 0.5)))


def test_supervised_trajectory_matches_reference_loop():
    import torch

    cfg = MiTConfig(**TINY)
    ref, fm, variables = build_pair(cfg, seed=0)
    trainer = RefTrainer(ref, lr=LR, weight_decay=WD, gamma=GAMMA)

    tc = TrainConfig(lr=LR, weight_decay=WD, lr_decay=GAMMA,
                     reference_quirks=True)
    state = TrainState.create(variables, tc)

    batches = _batches(5, 2, 64, seed=3)
    ev_img, ev_mask = _batches(1, 2, 64, seed=99)[0]

    diffs = []
    step = 0
    for epoch in range(2):       # 2 epochs x 5 batches = 10 steps
        for img, mask in batches:
            ref_loss, _ = trainer.train_one_epoch(
                torch.tensor(img), torch.tensor(mask))
            state, loss, _ = train_step(state, _nhwc(img),
                                        jnp.asarray(mask),
                                        jax.random.PRNGKey(0), cfg)
            step += 1
            d = abs(ref_loss.item() - float(loss))
            diffs.append(d)
            assert d < 1e-3, (
                f"step {step}: loss drift {d:.2e} "
                f"(ref {ref_loss.item():.6f} vs ours {float(loss):.6f})")
        trainer.scheduler_step()
        state = state.scheduler_step()

    # drift must not EXPLODE over the trajectory (fp32 noise compounds
    # roughly linearly; 10x headroom over the observed scale)
    assert diffs[-1] < 1e-3, f"final-step drift {diffs[-1]:.2e}"

    # final models produce near-identical binarized eval masks
    _, ref_pred = trainer.eval_one_epoch(torch.tensor(ev_img),
                                         torch.tensor(ev_mask))
    _, pred = eval_step(state, _nhwc(ev_img), jnp.asarray(ev_mask), cfg)
    agree = _mask_agreement(ref_pred.numpy(), pred)
    assert agree > 0.999, f"binarized masks agree only {agree:.4%}"


def test_teacher_student_trajectory_matches_reference_loop():
    """Phase A + phase B composed for 2 epochs: pseudo losses, teacher
    denoise losses, student blended losses, and both models' final eval
    masks must track the torch loop. TRAIN-mode forwards (the semi
    script's quirk) — the decode-head BatchNorm updates its running
    stats every forward on BOTH sides, so this also locks BN-momentum
    trajectory parity. confident_threshold=0 keeps every sample (both
    sides parameterized identically; random-init-scale teachers predict
    ~0.5 everywhere, the reference's 0.7 gate would keep none)."""
    import torch

    cfg = MiTConfig(**TINY)
    ref_t, fm, var_t = build_pair(cfg, seed=0)
    ref_s, _, _ = build_pair(cfg, seed=0)   # same seed -> same weights
    sup_w, thr, conf = 0.8, 0.7, 0.0
    teacher = RefTrainer(ref_t, lr=LR, weight_decay=WD, gamma=GAMMA)
    student = RefTrainer(ref_s, lr=LR, weight_decay=WD, gamma=GAMMA)

    tc = TrainConfig(lr=LR, weight_decay=WD, lr_decay=GAMMA,
                     reference_quirks=True)
    t = TrainState.create(var_t, tc)
    st = TrainState.create(var_t, tc)

    labeled = _batches(2, 2, 64, seed=5)
    unlabeled = [img for img, _ in _batches(2, 2, 64, seed=6)]
    ev_img, ev_mask = _batches(1, 2, 64, seed=98)[0]
    sup_w_j = jnp.asarray(sup_w)

    for epoch in range(2):
        teacher.model.train()   # ref `:77-78`: semi forwards in TRAIN mode
        student.model.train()
        # ---- phase A (`:80-97`): pseudo losses must match; the teacher
        # "update" is the documented no-op quirk on both sides
        for img in unlabeled:
            with torch.no_grad():
                masks = teacher.predict(torch.tensor(img))
            _, _, _, ref_ploss = ref_threshold_pseudo_masks(
                torch.tensor(img), masks, thr, conf)
            if epoch % 4 == 0:
                teacher.train_from_loss(ref_ploss)   # no-op (no grad path)
            out = ts.pseudo_label_infer_step(
                t, _nhwc(img), cfg, threshold=thr,
                confident_threshold=conf, train_mode=True,
                rng=jax.random.PRNGKey(0))
            t = out.teacher_state
            d = abs(float(ref_ploss) - float(out.loss))
            assert d < 1e-3, f"epoch {epoch} pseudo loss drift {d:.2e}"

        # ---- phase B (`:99-129`): denoise path, both models update
        for img, mask in labeled:
            img_t = torch.tensor(img)
            gt_t = torch.tensor(mask)
            origin = teacher.predict(img_t)              # grad, train mode
            den = (origin + 0.2 * gt_t - 0.1).clamp(0.0, 1.0)
            _, conf_mask, _, _ = ref_threshold_pseudo_masks(
                img_t, den, thr, conf, allow_throw_sample=False)
            from _ref_oracle import ref_dice_loss

            t_loss = ref_dice_loss(origin, conf_mask)
            teacher.train_from_loss(t_loss)
            s_loss, s_pred = student.predict(img_t, gt_t)
            self_sup = ref_dice_loss(s_pred, conf_mask)
            total = sup_w * s_loss + (1 - sup_w) * self_sup
            student.train_from_loss(total)

            lout = ts.labeled_step(t, st, _nhwc(img), jnp.asarray(mask),
                                   sup_w_j, cfg, denoise_label=True,
                                   threshold=thr, train_mode=True,
                                   rng=jax.random.PRNGKey(1))
            t, st = lout.teacher_state, lout.student_state
            dt = abs(t_loss.item() - float(lout.teacher_loss))
            ds = abs(total.item() - float(lout.student_loss_total))
            assert dt < 1e-3, f"epoch {epoch} teacher loss drift {dt:.2e}"
            assert ds < 1e-3, f"epoch {epoch} student loss drift {ds:.2e}"
        teacher.scheduler_step()
        student.scheduler_step()
        t, st = t.scheduler_step(), st.scheduler_step()

    for name, rt, js in (("teacher", teacher, t), ("student", student, st)):
        _, ref_pred = rt.eval_one_epoch(torch.tensor(ev_img),
                                        torch.tensor(ev_mask))
        _, pred = eval_step(js, _nhwc(ev_img), jnp.asarray(ev_mask), cfg)
        agree = _mask_agreement(ref_pred.numpy(), pred)
        assert agree > 0.999, (
            f"{name} binarized masks agree only {agree:.4%}")


def test_autoencoder_trajectory_matches_reference_loop():
    """The AE pretrain loop (`segFormer_autoencoder_main.py:30-131` via
    `train_one_epoch_without_mask`, `SegFormerModel.py:198-219`) — the
    ONE workload the reference trains in true TRAIN mode (no eval()
    inversion), so BN running stats update during training on both
    sides. num_labels=3, loss = reference-MSE (B*3 divisor) between the
    sigmoid recon and the input."""
    import torch

    from semisupervisedobjectdetection_tpu.train.autoencoder import (
        ae_eval_step,
        ae_train_step,
    )

    cfg = MiTConfig(num_labels=3, **{k: v for k, v in TINY.items()
                                     if k != "num_labels"})
    ref, fm, variables = build_pair(cfg, seed=0)
    trainer = RefTrainer(ref, lr=LR, weight_decay=WD, gamma=GAMMA)
    tc = TrainConfig(lr=LR, weight_decay=WD, lr_decay=GAMMA)
    state = TrainState.create(variables, tc)

    batches = [img for img, _ in _batches(3, 2, 64, seed=7)]
    ev_img = _batches(1, 2, 64, seed=97)[0][0]

    step = 0
    for epoch in range(2):
        for img in batches:
            ref_loss, _ = trainer.train_one_epoch_without_mask(
                torch.tensor(img))
            state, loss, _ = ae_train_step(state, _nhwc(img),
                                           jax.random.PRNGKey(0), cfg)
            step += 1
            d = abs(ref_loss.item() - float(loss))
            assert d < 1e-3, (
                f"AE step {step}: loss drift {d:.2e} "
                f"(ref {ref_loss.item():.6f} vs ours {float(loss):.6f})")
        trainer.scheduler_step()
        state = state.scheduler_step()

    ref_eval, ref_recon = trainer.eval_one_epoch_without_mask(
        torch.tensor(ev_img))
    eval_loss, recon = ae_eval_step(state, _nhwc(ev_img), cfg)
    assert abs(ref_eval.item() - float(eval_loss)) < 1e-3
    # recon maps are continuous: compare directly (NCHW <-> NHWC)
    np.testing.assert_allclose(
        np.asarray(recon).transpose(0, 3, 1, 2), ref_recon.numpy(),
        atol=5e-3)


def test_supervised_trajectory_b5_dims_slice():
    """3 supervised steps at REAL B5 widths/heads/sr and 512^2 input in a
    FRESH interpreter (cache-serializer hazard + torch B5 fwd/bwd on this
    1-vCPU host): per-step loss drift < 1e-3, final masks agree >99.9%."""
    import os
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(__file__), "_traj_b5_main.py")
    proc = subprocess.run([sys.executable, script], capture_output=True,
                          text=True, timeout=3000)
    assert proc.returncode == 0, (
        f"B5-dims trajectory failed:\n{proc.stdout[-3000:]}\n"
        f"{proc.stderr[-3000:]}")
    assert "traj-b5-ok" in proc.stdout
