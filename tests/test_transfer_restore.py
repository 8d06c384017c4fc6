"""Cross-num_labels checkpoint warm start: the AE (3-channel) checkpoint
must load into the 1-channel segmentation model with the reference's
classifier-slice surgery (`SegFormerModel.py:24-28`) — the transfer
learning workflow's critical path (`segFormer_transfer_learning_main.py:
199-206`)."""

import numpy as np
import jax
import jax.numpy as jnp

from semisupervisedobjectdetection_tpu.core.config import (
    TrainConfig,
    mit_b0,
)
from semisupervisedobjectdetection_tpu.checkpoint.orbax_io import (
    restore_state,
    save_state,
)
from semisupervisedobjectdetection_tpu.models.segformer import SegFormer
from semisupervisedobjectdetection_tpu.train.state import TrainState

TINY = mit_b0(depths=(1, 1, 1, 1), hidden_sizes=(8, 16, 32, 64),
              num_heads=(1, 2, 4, 8), decoder_hidden=32)


def test_ae_checkpoint_into_seg_model(tmp_path):
    tc = TrainConfig()
    # autoencoder model: num_labels=3
    ae_cfg = TINY.replace(num_labels=3)
    ae_vars = jax.jit(SegFormer(ae_cfg).init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    ae_state = TrainState.create(ae_vars, tc)
    path = str(tmp_path / "ae_ckpt")
    save_state(path, ae_state)

    # segmentation model: num_labels=1, warm-started from the AE ckpt
    seg_vars = jax.jit(SegFormer(TINY).init)(
        jax.random.PRNGKey(7), jnp.zeros((1, 64, 64, 3)))
    seg_state = TrainState.create(seg_vars, tc)
    restored = restore_state(path, seg_state)

    # encoder weights come from the AE checkpoint
    np.testing.assert_array_equal(
        np.asarray(restored.params["encoder"]["patch_embed_0"]["proj"]
                   ["kernel"]),
        np.asarray(ae_state.params["encoder"]["patch_embed_0"]["proj"]
                   ["kernel"]))
    # classifier sliced to channel 0 (shape (1,1,D,3) -> (1,1,D,1))
    ae_cls = np.asarray(
        ae_state.params["decode_head"]["classifier"]["kernel"])
    got_cls = np.asarray(
        restored.params["decode_head"]["classifier"]["kernel"])
    assert got_cls.shape[-1] == 1
    np.testing.assert_array_equal(got_cls, ae_cls[..., 0:1])

    # restored model must run
    logits, _ = jax.jit(SegFormer(TINY).apply)(
        {"params": restored.params,
         "batch_stats": restored.batch_stats},
        jnp.zeros((1, 64, 64, 3)))
    assert logits.shape == (1, 16, 16, 1)


def test_matching_restore_keeps_opt_state(tmp_path):
    tc = TrainConfig()
    variables = jax.jit(SegFormer(TINY).init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    state = TrainState.create(variables, tc)
    path = str(tmp_path / "ck")
    save_state(path, state)
    fresh = TrainState.create(variables, tc)
    restored = restore_state(path, fresh)
    for a, b in zip(jax.tree.leaves(restored.opt_state),
                    jax.tree.leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
