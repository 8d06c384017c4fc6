"""EMA (mean-teacher) semi-supervised step (train/ema.py).

Key guarantee (VERDICT round 2 #1): the student update inside
`ema_semi_step` is IDENTICAL to `labeled_step`'s student math — the EMA mode
only removes the teacher's gradient step, it does not change what the
student learns from (ref `segFormer_semi_teacherstudent_main.py:110-127`).
"""

import numpy as np
import jax
import jax.numpy as jnp

from semisupervisedobjectdetection_tpu.core.config import (
    TrainConfig,
    mit_b0,
)
from semisupervisedobjectdetection_tpu.models.segformer import SegFormer
from semisupervisedobjectdetection_tpu.train.state import TrainState
from semisupervisedobjectdetection_tpu.train import ema as ema_mod
from semisupervisedobjectdetection_tpu.train import teacher_student as ts

TINY = mit_b0(depths=(1, 1, 1, 1), hidden_sizes=(8, 16, 32, 64),
              num_heads=(1, 2, 4, 8), decoder_hidden=32)


def _setup(b=2, s=64, seed=0):
    rng = np.random.default_rng(seed)
    imgs = jnp.asarray(rng.uniform(0, 1, (b, s, s, 3)), jnp.float32)
    masks = jnp.asarray(rng.uniform(0, 1, (b, s, s)) > 0.6, jnp.float32)
    unlabeled = jnp.asarray(rng.uniform(0, 1, (b, s, s, 3)), jnp.float32)
    variables = jax.jit(SegFormer(TINY).init)(jax.random.PRNGKey(1),
                                              imgs[:1])
    tc = TrainConfig()
    return variables, tc, unlabeled, imgs, masks


def test_ema_student_update_matches_labeled_step():
    variables, tc, unlabeled, imgs, masks = _setup()
    sup_w = jnp.asarray(0.8)

    # Reference-loop step (teacher trains by gradient).
    t1 = TrainState.create(variables, tc, lr=5e-7)
    s1 = TrainState.create(variables, tc, lr=3e-5)
    lout = ts.labeled_step(t1, s1, imgs, masks, sup_w, TINY,
                           denoise_label=True)

    # EMA step from the same warm start: the labeled-phase student update
    # must match exactly (the teacher mask is the pre-update teacher's
    # denoised forward in both paths).
    t2 = TrainState.create(variables, tc, lr=5e-7)
    s2 = TrainState.create(variables, tc, lr=3e-5)
    eout = ema_mod.ema_semi_step(t2, s2, unlabeled, imgs, masks, sup_w,
                                 jnp.asarray(0.999), TINY,
                                 denoise_label=True)

    np.testing.assert_allclose(float(lout.student_loss_total),
                               float(eout.student_loss_total), atol=1e-6)
    np.testing.assert_allclose(float(lout.student_sup_loss),
                               float(eout.student_sup_loss), atol=1e-6)
    for a, b in zip(jax.tree.leaves(lout.student_state.params),
                    jax.tree.leaves(eout.student_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_ema_teacher_is_decay_blend_of_params_and_stats():
    variables, tc, unlabeled, imgs, masks = _setup()
    decay = 0.9
    t0 = TrainState.create(variables, tc, lr=5e-7)
    t0_params = jax.tree.map(np.asarray, t0.params)
    t0_stats = jax.tree.map(np.asarray, t0.batch_stats)
    s0 = TrainState.create(variables, tc, lr=3e-5)
    # train_mode=True so the student's BN batch_stats actually move and the
    # EMA of batch_stats is exercised (VERDICT round 2 weak #3).
    eout = ema_mod.ema_semi_step(t0, s0, unlabeled, imgs, masks,
                                 jnp.asarray(0.8), jnp.asarray(decay),
                                 TINY, train_mode=True,
                                 rng=jax.random.PRNGKey(7))

    expect_p = jax.tree.map(
        lambda t, s: decay * t + (1 - decay) * np.asarray(s),
        t0_params, eout.student_state.params)
    for a, b in zip(jax.tree.leaves(expect_p),
                    jax.tree.leaves(eout.teacher_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    expect_s = jax.tree.map(
        lambda t, s: decay * t + (1 - decay) * np.asarray(s),
        t0_stats, eout.student_state.batch_stats)
    moved = False
    for a, b, orig in zip(jax.tree.leaves(expect_s),
                          jax.tree.leaves(eout.teacher_state.batch_stats),
                          jax.tree.leaves(t0_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        moved = moved or not np.allclose(np.asarray(b), orig)
    assert moved, "teacher batch_stats never moved under EMA"


def test_ema_update_carries_batch_stats():
    variables, tc, _, imgs, _ = _setup()
    t = TrainState.create(variables, tc, lr=5e-7)
    s = TrainState.create(variables, tc, lr=3e-5)
    s = s.replace(batch_stats=jax.tree.map(lambda a: a + 1.0,
                                           s.batch_stats))
    out = ts.ema_update(t, s, decay=0.5)
    for a, b in zip(jax.tree.leaves(t.batch_stats),
                    jax.tree.leaves(out.batch_stats)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a) + 0.5,
                                   atol=1e-6)


def test_ema_int8_teacher_step():
    variables, tc, unlabeled, imgs, masks = _setup()
    t = TrainState.create(variables, tc, lr=5e-7)
    s = TrainState.create(variables, tc, lr=3e-5)
    qvars, qcfg = ema_mod.make_teacher_int8_snapshot(t, TINY)
    eout = ema_mod.ema_semi_step_int8(qvars, t, s, unlabeled, imgs, masks,
                                      jnp.asarray(0.8), jnp.asarray(0.99),
                                      TINY, qcfg)
    assert np.isfinite(float(eout.student_loss_total))
    assert eout.pseudo_mask.shape == unlabeled.shape[:3]
    # The f32 EMA teacher still moved (it is the next snapshot's source).
    diff = [np.max(np.abs(np.asarray(a) - np.asarray(b))) for a, b in zip(
        jax.tree.leaves(TrainState.create(variables, tc, lr=5e-7).params),
        jax.tree.leaves(eout.teacher_state.params))]
    assert max(diff) > 0


def test_ema_separate_shape_batches():
    """Unlabeled and labeled batches with different spatial sizes take the
    two-forward path."""
    variables, tc, _, imgs, masks = _setup(s=64)
    rng = np.random.default_rng(3)
    unlabeled = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), jnp.float32)
    t = TrainState.create(variables, tc, lr=5e-7)
    s = TrainState.create(variables, tc, lr=3e-5)
    eout = ema_mod.ema_semi_step(t, s, unlabeled, imgs, masks,
                                 jnp.asarray(0.8), jnp.asarray(0.99), TINY)
    assert eout.pseudo_mask.shape == (2, 32, 32)
    assert np.isfinite(float(eout.student_loss_total))


def test_ema_mode_cli_smoke(tmp_path):
    """End-to-end --ema-mode loop (incl. per-epoch int8 teacher snapshot
    refresh and metric logging) on synthetic data."""
    from semisupervisedobjectdetection_tpu.cli import (
        teacher_student as cli_ts,
    )

    cli_ts.main([
        "--synthetic", "--synthetic-n", "8", "--img-size", "64",
        "--batch-size", "4", "--epochs", "1", "--dtype", "float32",
        "--ema-mode", "--int8-teacher", "--perf",
        "--checkpoint-dir", str(tmp_path / "ck"),
        "--metrics-csv", str(tmp_path / "m.csv"),
    ])
    assert (tmp_path / "m.csv").exists()
    text = (tmp_path / "m.csv").read_text()
    assert "eval_loss" in text and len(text.splitlines()) >= 2
    # epoch 0 always improves on best_s=inf, so the best-student
    # checkpoint must land (regression: save_model was once unbound in
    # _ema_train_loop and this very path raised NameError)
    ck = tmp_path / "ck"
    assert ck.exists() and any(
        p.name.startswith("ts_student") for p in ck.iterdir())


def test_ema_mode_cli_empty_pseudo_loader(tmp_path, monkeypatch):
    """--ema-mode degrades gracefully when the unlabeled loader yields no
    batches (the gradient-teacher loop just skips phase A; the EMA loop
    substitutes the labeled batch as the teacher-forward input)."""
    from semisupervisedobjectdetection_tpu.cli import common as cli_common
    from semisupervisedobjectdetection_tpu.cli import (
        teacher_student as cli_ts,
    )

    real_make_loaders = cli_common.make_loaders

    def patched(dcfg, seed, flags=()):
        loaders = real_make_loaders(dcfg, seed, flags=flags)
        loaders["pseudo"] = []
        return loaders

    monkeypatch.setattr(cli_common, "make_loaders", patched)
    cli_ts.main([
        "--synthetic", "--synthetic-n", "8", "--img-size", "64",
        "--batch-size", "4", "--epochs", "1", "--dtype", "float32",
        "--ema-mode",
        "--checkpoint-dir", str(tmp_path / "ck"),
        "--metrics-csv", str(tmp_path / "m.csv"),
    ])
    assert (tmp_path / "m.csv").exists()
