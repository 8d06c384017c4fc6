"""Checkpoint restore across parallel placements (orbax_io._place_like).

A resumed `--parallel` run restores into sharded templates, and the
checkpoint may have been written under a different placement (plain run
preempted then resumed with --parallel fsdp, or the reverse). Orbax's
default restore pins the FILE's sharding (and warns it is topology-unsafe);
`restore_state` must instead commit every leaf to the TEMPLATE's sharding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semisupervisedobjectdetection_tpu.checkpoint.orbax_io import (
    restore_state,
    save_state,
)
from semisupervisedobjectdetection_tpu.core.config import TrainConfig
from semisupervisedobjectdetection_tpu.parallel.mesh import (
    fsdp_shard,
    get_mesh,
    replicate,
)
from semisupervisedobjectdetection_tpu.train.state import TrainState

needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 devices")


def _tiny_state(seed=0):
    k = jax.random.PRNGKey(seed)
    params = {
        "dense": {"kernel": jax.random.normal(k, (256, 128)),
                  "bias": jnp.zeros((128,))},
        "head": {"kernel": jax.random.normal(k, (128, 8))},
    }
    return TrainState.create({"params": params}, TrainConfig(lr=1e-3))


def _shard_state(mesh, state, mode):
    state = replicate(mesh, state)
    if mode == "fsdp":
        state = fsdp_shard(mesh, state)
    return state


def _assert_same_values_and_placement(got: TrainState, want: TrainState):
    for g, w in zip(jax.tree.leaves(got.params),
                    jax.tree.leaves(want.params)):
        assert g.sharding == w.sharding, (g.sharding, w.sharding)
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=0)
    for g, w in zip(jax.tree.leaves(got.opt_state),
                    jax.tree.leaves(want.opt_state)):
        if hasattr(g, "sharding"):
            assert g.sharding == w.sharding


@needs8
@pytest.mark.parametrize("save_mode,restore_mode", [
    ("single", "fsdp"),       # preempted plain run resumed with --parallel
    ("fsdp", "single"),       # sharded run resumed on one device
    ("fsdp", "fsdp"),         # same placement round-trip
    ("dp", "fsdp"),           # replicated checkpoint into a sharded run
])
def test_restore_commits_to_template_sharding(tmp_path, save_mode,
                                              restore_mode):
    mesh = get_mesh()
    src = _tiny_state()
    if save_mode != "single":
        src = _shard_state(mesh, src, save_mode)
    src = src.replace(epoch=jnp.asarray(3.0))
    save_state(str(tmp_path / "ck"), src)

    template = _tiny_state(seed=1)
    if restore_mode != "single":
        template = _shard_state(mesh, template, restore_mode)
    got = restore_state(str(tmp_path / "ck"), template)

    # values come from the checkpoint, placement from the template
    _assert_same_values_and_placement(got, template.replace(
        params=jax.tree.map(
            lambda t, s: jax.device_put(np.asarray(s),
                                        t.sharding), template.params,
            src.params)))
    assert float(got.epoch) == 3.0
    # the restored state must be directly consumable by a jitted update
    # without any re-placement (this is what a resumed epoch does)
    grads = jax.tree.map(jnp.ones_like, got.params)
    stepped = jax.jit(lambda s: s.apply_gradients(grads, jnp.asarray(0.5))
                      )(got)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(stepped.params))
