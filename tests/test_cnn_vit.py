"""CNN baselines and ViT pipeline: shape contracts + one-step training."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from semisupervisedobjectdetection_tpu.core.config import TrainConfig


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 56, 56, 3)), jnp.float32)
    masks = jnp.asarray(rng.uniform(0, 1, (2, 56, 56)) > 0.5, jnp.float32)
    return imgs, masks


@pytest.mark.parametrize("arch", ["deeplabv3p", "pspnet", "unetpp",
                                  "linknet", "pan"])
def test_cnn_baseline_trains(arch, batch):
    from semisupervisedobjectdetection_tpu.train.baseline_cnn import (
        cnn_eval_step,
        cnn_train_step,
        create_cnn_state,
    )

    imgs, masks = batch
    tc = TrainConfig(lr=1e-3)
    state, meta = create_cnn_state(arch, tc, jax.random.PRNGKey(0),
                                   input_hw=(56, 56))
    state, loss, pred = cnn_train_step(state, imgs, masks,
                                       jax.random.PRNGKey(1), arch)
    assert pred.shape == (2, 56, 56)
    assert np.isfinite(float(loss))
    eloss, epred = cnn_eval_step(state, imgs, masks, arch)
    assert np.isfinite(float(eloss))
    assert float(jnp.min(epred)) >= 0.0 and float(jnp.max(epred)) <= 1.0


def test_vit_forward_features():
    from semisupervisedobjectdetection_tpu.models.vit import vit_small

    enc = vit_small(img_size=56, patch_size=14, depth=2)
    x = jnp.zeros((2, 56, 56, 3))
    v = jax.jit(enc.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(enc.apply)(v, x)
    assert out["x_norm_clstoken"].shape == (2, 384)
    assert out["x_norm_patchtokens"].shape == (2, 16, 384)


def test_vit_pos_embed_interpolation():
    from semisupervisedobjectdetection_tpu.models.vit import vit_small

    enc = vit_small(img_size=56, patch_size=14, depth=1)
    x56 = jnp.zeros((1, 56, 56, 3))
    v = jax.jit(enc.init)(jax.random.PRNGKey(0), x56)
    # different input size reuses the same params via bicubic interpolation
    x84 = jnp.zeros((1, 84, 84, 3))
    out = jax.jit(enc.apply)(v, x84)
    assert out["x_norm_patchtokens"].shape == (1, 36, 384)


def test_vit_seg_pipeline_trains(batch):
    from semisupervisedobjectdetection_tpu.train.vit_seg import (
        build_vit_seg,
        create_vit_state,
        make_vit_steps,
    )

    imgs, masks = batch
    model = build_vit_seg(img_size=56, patch_size=14, variant="small",
                          depth=2)
    state = create_vit_state(model, TrainConfig(lr=1e-3),
                             jax.random.PRNGKey(0), img_size=56)
    (seg_train, seg_eval, _, pseudo_step,
     ts_labeled) = make_vit_steps(model)
    state, loss, pred = seg_train(state, imgs, masks)
    assert pred.shape == (2, 56, 56)
    assert np.isfinite(float(loss))
    state, ploss, labels = pseudo_step(state, imgs, jnp.asarray(True))
    assert labels.pseudo_mask.shape == (2, 56, 56)

    # teacher-student labeled phase updates both models
    student = create_vit_state(model, TrainConfig(lr=1e-3),
                               jax.random.PRNGKey(9), img_size=56)
    t2, s2, s_loss, t_loss = ts_labeled(state, student, imgs, masks,
                                        jnp.asarray(0.5))
    assert np.isfinite(float(s_loss)) and np.isfinite(float(t_loss))
    state = t2

    # autoencoder variant reconstructs 3 channels (ref out_chans=3)
    ae_model = build_vit_seg(img_size=56, patch_size=14, variant="small",
                             depth=2, out_chans=3)
    ae_state = create_vit_state(ae_model, TrainConfig(lr=1e-3),
                                jax.random.PRNGKey(1), img_size=56)
    _, _, ae_train, _, _ = make_vit_steps(ae_model)
    ae_state, ae_loss, recon = ae_train(ae_state, imgs)
    assert recon.shape == (2, 56, 56, 3)
    assert np.isfinite(float(ae_loss))


def test_cycle_loss():
    """Re-encode consistency loss (ref `ViT_EncoderDecoder.py:69-75`)."""
    from semisupervisedobjectdetection_tpu.models.vit_decoder import (
        cycle_loss,
    )
    from semisupervisedobjectdetection_tpu.train.vit_seg import (
        build_vit_seg,
        create_vit_state,
    )

    model = build_vit_seg(img_size=28, patch_size=14, variant="small",
                          depth=1, out_chans=3)
    state = create_vit_state(model, TrainConfig(), jax.random.PRNGKey(0),
                             img_size=28)
    imgs = jnp.asarray(np.random.default_rng(4).uniform(
        size=(2, 28, 28, 3)), jnp.float32)

    def encode(x):
        return model.apply({"params": state.params}, x,
                           method=model.encode)

    tokens = encode(imgs)
    # identical reconstruction -> zero cycle loss
    assert float(cycle_loss(encode, imgs, tokens)) < 1e-5
    other = jnp.asarray(np.random.default_rng(5).uniform(
        size=(2, 28, 28, 3)), jnp.float32)
    assert float(cycle_loss(encode, other, tokens)) > 1e-3


def test_patch_loss_zero_for_identical():
    from semisupervisedobjectdetection_tpu.models.vit_decoder import (
        patch_loss,
    )

    x = jnp.ones((2, 28, 28, 3))
    assert float(patch_loss(x, x, 14)) == 0.0
    y = x + 1.0
    # |diff|=1 everywhere: per-patch mean 1, / n_patches, summed over B,N
    expected = 2 * 4 * (1.0 / 4)
    assert abs(float(patch_loss(y, x, 14)) - expected) < 1e-5
