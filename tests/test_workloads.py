"""End-to-end contracts of the five workload train steps + API surface +
checkpointing, on tiny configs (CPU virtual mesh via conftest)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from semisupervisedobjectdetection_tpu.core.config import (
    TrainConfig,
    mit_b0,
)
from semisupervisedobjectdetection_tpu.models.segformer import SegFormer
from semisupervisedobjectdetection_tpu.train.state import TrainState
from semisupervisedobjectdetection_tpu.train import supervised as sup
from semisupervisedobjectdetection_tpu.train import teacher_student as ts
from semisupervisedobjectdetection_tpu.train import autoencoder as ae
from semisupervisedobjectdetection_tpu.train import fewshot as fw

TINY = mit_b0(depths=(1, 1, 1, 1), hidden_sizes=(8, 16, 32, 64),
              num_heads=(1, 2, 4, 8), decoder_hidden=32)
TC = TrainConfig(lr=1e-3)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (4, 64, 64, 3)), jnp.float32)
    masks = jnp.asarray(rng.uniform(0, 1, (4, 64, 64)) > 0.6, jnp.float32)
    return imgs, masks


def make_state(cfg, tc=TC):
    variables = jax.jit(SegFormer(cfg).init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return TrainState.create(variables, tc)


def test_supervised_step_reduces_loss(batch):
    imgs, masks = batch
    state = make_state(TINY)
    losses = []
    for i in range(12):
        state, loss, pred = sup.train_step(
            state, imgs, masks, jax.random.PRNGKey(i), TINY)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert pred.shape == (4, 64, 64)


def test_nan_images_skip_update(batch):
    imgs, masks = batch
    state = make_state(TINY)
    before = np.asarray(
        state.params["decode_head"]["classifier"]["kernel"]).copy()
    nan_imgs = jnp.full_like(imgs, jnp.nan)
    state, loss, _ = sup.train_step(state, nan_imgs, masks,
                                    jax.random.PRNGKey(0), TINY)
    assert not np.isfinite(float(loss))
    after = np.asarray(state.params["decode_head"]["classifier"]["kernel"])
    np.testing.assert_array_equal(before, after)


def test_teacher_student_both_update(batch):
    imgs, masks = batch
    teacher = make_state(TINY, TC.replace(lr=1e-4))
    student = make_state(TINY, TC.replace(lr=1e-3))
    t_before = np.asarray(jax.tree.leaves(teacher.params)[0]).copy()
    s_before = np.asarray(jax.tree.leaves(student.params)[0]).copy()
    out = ts.pseudo_label_step(teacher, imgs, jnp.asarray(True), TINY)
    lout = ts.labeled_step(out.teacher_state, student, imgs, masks,
                           jnp.asarray(0.8), TINY, denoise_label=True)
    t_after = np.asarray(jax.tree.leaves(lout.teacher_state.params)[0])
    s_after = np.asarray(jax.tree.leaves(lout.student_state.params)[0])
    assert not np.allclose(t_before, t_after)   # teacher updated (denoise)
    assert not np.allclose(s_before, s_after)   # student updated
    # student total = w*sup + (1-w)*self
    np.testing.assert_allclose(
        float(lout.student_loss_total),
        0.8 * float(lout.student_sup_loss)
        + 0.2 * float(lout.self_supervise_loss), rtol=1e-5)


def test_teacher_update_gated_by_epoch_flag(batch):
    imgs, _ = batch
    teacher = make_state(TINY, TC.replace(lr=1e-3))
    before = np.asarray(jax.tree.leaves(teacher.params)[0]).copy()
    out = ts.pseudo_label_step(teacher, imgs, jnp.asarray(False), TINY)
    after = np.asarray(jax.tree.leaves(out.teacher_state.params)[0])
    np.testing.assert_array_equal(before, after)


def test_teacher_reset_copies_student(batch):
    teacher = make_state(TINY)
    student = make_state(TINY, TC.replace(lr=1e-3))
    t2 = ts.copy_student_to_teacher(teacher, student)
    for a, b in zip(jax.tree.leaves(t2.params),
                    jax.tree.leaves(student.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_autoencoder_reconstruction_improves(batch):
    imgs, _ = batch
    cfg3 = TINY.replace(num_labels=3)
    state = make_state(cfg3, TC.replace(lr=3e-3))
    losses = []
    for i in range(10):
        state, loss, recon = ae.ae_train_step(state, imgs,
                                              jax.random.PRNGKey(i), cfg3)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert recon.shape == (4, 64, 64, 3)
    # AE trains in true train mode -> BN stats must have updated
    bn_mean = np.asarray(
        state.batch_stats["decode_head"]["batch_norm"]["mean"])
    assert not np.allclose(bn_mean, 0.0)


def test_fewshot_ae_step_runs_and_cls_losses_sane(batch):
    imgs, _ = batch
    cfg = TINY.replace(num_labels=3, cls_tokens=(1, 1, 1, 1))
    state = make_state(cfg)
    out = fw.fewshot_ae_step(state, imgs[:2], imgs[2:], imgs[:2], imgs[2:],
                             cfg)
    # identical cls params at init -> inter loss = 0.5+0.5*cos(1) = 1
    np.testing.assert_allclose(np.asarray(out.inter_losses), 1.0, atol=1e-4)
    assert np.isfinite(float(out.loss))


def test_fewshot_seg_step_mean_of_pair(batch):
    imgs, masks = batch
    cfg = TINY.replace(cls_tokens=(1, 1, 1, 1))
    state = make_state(cfg)
    out = fw.fewshot_seg_step(state, imgs[:2], masks[:2], imgs[2:],
                              masks[2:], cfg)
    np.testing.assert_allclose(
        float(out.loss),
        (float(out.loss_1) + float(out.loss_2)) / 2, rtol=1e-5)


def test_api_surface_roundtrip(tmp_path, batch):
    from semisupervisedobjectdetection_tpu.api import SegFormerModel

    imgs, masks = batch
    model = SegFormerModel(lr=1e-3, weight_decay=5e-5, scheduler=0.97,
                           config=TINY)
    loss1, pred = model.train_one_epoch(np.asarray(imgs), np.asarray(masks))
    assert pred.shape == (4, 64, 64)
    eloss, _ = model.eval_one_epoch(np.asarray(imgs), np.asarray(masks))
    assert np.isfinite(float(eloss))
    model.scheduler_step()
    assert abs(float(model.state.lr) - 1e-3 * 0.97) < 1e-9

    # prompt tokens + frozen encoder reshape the state
    model.frozen_encoder(layers=[0, 1])
    model.add_prompt_token([2, 2, 2, 2])
    assert "prompt_tokens_0" in model.state.params["encoder"]
    loss2, _ = model.train_one_epoch(np.asarray(imgs), np.asarray(masks))
    assert np.isfinite(float(loss2))

    # NCHW input compatibility (reference layout)
    pred_chw = model.predict(np.asarray(imgs).transpose(0, 3, 1, 2))
    assert pred_chw.shape == (4, 64, 64)

    # mask dump
    p = model.show_mask(str(tmp_path / "m.png"), np.asarray(imgs)[0],
                        np.asarray(masks)[0])
    assert os.path.exists(p)


def test_orbax_checkpoint_roundtrip(tmp_path, batch):
    from semisupervisedobjectdetection_tpu.checkpoint.orbax_io import (
        restore_state,
        save_state,
    )

    imgs, masks = batch
    state = make_state(TINY)
    state, _, _ = sup.train_step(state, imgs, masks, jax.random.PRNGKey(0),
                                 TINY)
    state = state.scheduler_step()
    path = str(tmp_path / "ckpt")
    save_state(path, state)

    fresh = make_state(TINY)
    restored = restore_state(path, fresh)
    assert float(restored.epoch) == 1.0
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer moments restored too (resume continues optimization)
    for a, b in zip(jax.tree.leaves(restored.opt_state),
                    jax.tree.leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_metrics():
    from semisupervisedobjectdetection_tpu.eval.metrics import (
        binary_miou,
        dice_score,
    )

    gt = np.zeros((1, 8, 8), np.float32)
    gt[:, :4] = 1.0
    perfect = jnp.asarray(gt)
    assert float(dice_score(perfect, jnp.asarray(gt))) > 0.99
    assert float(binary_miou(perfect, jnp.asarray(gt))) > 0.99
    wrong = jnp.asarray(1.0 - gt)
    assert float(binary_miou(wrong, jnp.asarray(gt))) < 0.01
