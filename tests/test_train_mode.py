"""Non-quirks training mode (`reference_quirks=False`): real dropout /
drop-path / BN updates — the "fixed" variant of the reference's
train-in-eval-mode quirk (SURVEY.md §2.4)."""

import numpy as np
import jax
import jax.numpy as jnp

from semisupervisedobjectdetection_tpu.core.config import (
    TrainConfig,
    mit_b0,
)
from semisupervisedobjectdetection_tpu.models.segformer import SegFormer
from semisupervisedobjectdetection_tpu.train.state import TrainState
from semisupervisedobjectdetection_tpu.train.supervised import train_step

CFG = mit_b0(depths=(1, 1, 1, 1), hidden_sizes=(8, 16, 32, 64),
             num_heads=(1, 2, 4, 8), decoder_hidden=32,
             hidden_dropout=0.1, attention_dropout=0.1,
             drop_path_rate=0.1)


def _data():
    rng = np.random.default_rng(0)
    return (jnp.asarray(rng.uniform(0, 1, (4, 64, 64, 3)), jnp.float32),
            jnp.asarray(rng.uniform(0, 1, (4, 64, 64)) > 0.5, jnp.float32))


def test_train_mode_updates_bn_and_is_stochastic():
    imgs, masks = _data()
    v = jax.jit(SegFormer(CFG).init)(jax.random.PRNGKey(0), imgs[:1])
    state = TrainState.create(v, TrainConfig(lr=1e-3,
                                             reference_quirks=False))
    bn0 = np.asarray(
        state.batch_stats["decode_head"]["batch_norm"]["mean"]).copy()
    state, loss, _ = train_step(state, imgs, masks, jax.random.PRNGKey(1),
                                CFG, train_mode=True)
    bn1 = np.asarray(state.batch_stats["decode_head"]["batch_norm"]["mean"])
    assert not np.allclose(bn0, bn1)

    s2 = TrainState.create(v, TrainConfig(lr=1e-3))
    _, l1, _ = train_step(s2, imgs, masks, jax.random.PRNGKey(10), CFG,
                          train_mode=True)
    s3 = TrainState.create(v, TrainConfig(lr=1e-3))
    _, l2, _ = train_step(s3, imgs, masks, jax.random.PRNGKey(20), CFG,
                          train_mode=True)
    assert float(l1) != float(l2)  # dropout/droppath live


def test_quirks_mode_is_deterministic_and_bn_frozen():
    """Default reference parity: eval-mode forward in training
    (`SegFormerModel.py:104-105`) — deterministic, BN stats untouched."""
    imgs, masks = _data()
    v = jax.jit(SegFormer(CFG).init)(jax.random.PRNGKey(0), imgs[:1])
    s1 = TrainState.create(v, TrainConfig(lr=1e-3))
    s2 = TrainState.create(v, TrainConfig(lr=1e-3))
    s1, l1, _ = train_step(s1, imgs, masks, jax.random.PRNGKey(1), CFG,
                           train_mode=False)
    s2, l2, _ = train_step(s2, imgs, masks, jax.random.PRNGKey(99), CFG,
                           train_mode=False)
    assert float(l1) == float(l2)   # rng has no effect in quirks mode
    bn = np.asarray(s1.batch_stats["decode_head"]["batch_norm"]["mean"])
    np.testing.assert_array_equal(bn, 0.0)  # stats never updated
