"""labeled_step_stacked must be bit-equivalent (up to f32 reduction order)
to labeled_step: same losses, same updated params/opt-state/BN stats."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semisupervisedobjectdetection_tpu.core.config import TrainConfig, mit_b0
from semisupervisedobjectdetection_tpu.models.segformer import SegFormer
from semisupervisedobjectdetection_tpu.train.state import TrainState
from semisupervisedobjectdetection_tpu.train.teacher_student import (
    labeled_step,
    labeled_step_stacked,
)

CFG = mit_b0(depths=(1, 1, 1, 1), hidden_sizes=(8, 16, 32, 64),
             num_heads=(1, 2, 4, 8), decoder_hidden=32)


def _states():
    x = jnp.zeros((1, 64, 64, 3))
    v1 = jax.jit(SegFormer(CFG).init)(jax.random.PRNGKey(0), x)
    v2 = jax.jit(SegFormer(CFG).init)(jax.random.PRNGKey(1), x)
    tc = TrainConfig()
    return (TrainState.create(v1, tc, lr=5e-4),
            TrainState.create(v2, tc, lr=3e-4))


def _batch():
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)
    masks = jnp.asarray(rng.uniform(size=(2, 64, 64)) > 0.6, jnp.float32)
    return images, masks


@pytest.mark.parametrize("denoise", [True, False])
@pytest.mark.parametrize("train_mode", [False, True])
def test_stacked_matches_sequential(denoise, train_mode):
    images, masks = _batch()
    sup_w = jnp.asarray(0.8)
    rng = jax.random.PRNGKey(7) if train_mode else None

    t1, s1 = _states()
    out_seq = labeled_step(t1, s1, images, masks, sup_w, CFG,
                           denoise_label=denoise, train_mode=train_mode,
                           rng=rng)
    t2, s2 = _states()
    out_stk = labeled_step_stacked(t2, s2, images, masks, sup_w, CFG,
                                   denoise_label=denoise,
                                   train_mode=train_mode, rng=rng)

    for name in ("student_loss_total", "teacher_loss", "student_sup_loss",
                 "self_supervise_loss"):
        np.testing.assert_allclose(
            float(getattr(out_seq, name)), float(getattr(out_stk, name)),
            rtol=1e-5, atol=1e-6, err_msg=name)

    # Post-Adam params: near-zero grads differ at f32 reduction-order level
    # between the batched (vmapped) and sequential reductions — especially
    # through train-mode BatchNorm — and Adam's m/sqrt(v) normalization
    # amplifies those to O(lr). Losses above match at 1e-5 (identical
    # forwards); params must agree within half an optimizer step
    # (lr <= 5e-4 here), which any wiring bug (wrong mask/target/lane)
    # would exceed by orders of magnitude.
    atol = 5e-4 if train_mode else 1e-6
    rtol = 0 if train_mode else 2e-4
    for which in ("teacher_state", "student_state"):
        seq_s, stk_s = getattr(out_seq, which), getattr(out_stk, which)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rtol, atol=atol),
            seq_s.params, stk_s.params)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5),
            seq_s.batch_stats, stk_s.batch_stats)
