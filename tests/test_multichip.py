"""Data-parallel correctness on the 8-device virtual mesh: a sharded train
step must match the single-device result (XLA inserts the grad all-reduce;
results identical up to fp reduction order)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from semisupervisedobjectdetection_tpu.core.config import (
    TrainConfig,
    mit_b0,
)
from semisupervisedobjectdetection_tpu.models.segformer import SegFormer
from semisupervisedobjectdetection_tpu.parallel.mesh import (
    get_mesh,
    replicate,
    shard_batch,
)
from semisupervisedobjectdetection_tpu.train.state import TrainState
from semisupervisedobjectdetection_tpu.train.supervised import train_step

TINY = mit_b0(depths=(1, 1, 1, 1), hidden_sizes=(8, 16, 32, 64),
              num_heads=(1, 2, 4, 8), decoder_hidden=32)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_step_matches_single_device():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (8, 64, 64, 3)), jnp.float32)
    masks = jnp.asarray(rng.uniform(0, 1, (8, 64, 64)) > 0.5, jnp.float32)
    variables = jax.jit(SegFormer(TINY).init)(
        jax.random.PRNGKey(0), imgs[:1])
    tc = TrainConfig(lr=1e-3)

    # single device
    s1 = TrainState.create(variables, tc)
    s1, loss1, _ = train_step(s1, imgs, masks, jax.random.PRNGKey(1), TINY)

    # 8-device mesh
    mesh = get_mesh()
    s8 = replicate(mesh, TrainState.create(variables, tc))
    bi, bm = shard_batch(mesh, (imgs, masks))
    assert len(bi.sharding.device_set) == 8
    s8, loss8, _ = train_step(s8, bi, bm, jax.random.PRNGKey(1), TINY)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_fsdp_step_matches_replicated():
    """ZeRO-style param/opt-state sharding must be numerically transparent:
    GSPMD all-gathers the sharded params for compute and reduce-scatters
    grads, so one step from identical starts must match the replicated
    data-parallel step."""
    from semisupervisedobjectdetection_tpu.parallel.mesh import fsdp_shard

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (8, 64, 64, 3)), jnp.float32)
    masks = jnp.asarray(rng.uniform(0, 1, (8, 64, 64)) > 0.5, jnp.float32)
    variables = jax.jit(SegFormer(TINY).init)(
        jax.random.PRNGKey(0), imgs[:1])
    tc = TrainConfig(lr=1e-3)
    mesh = get_mesh()
    bi, bm = shard_batch(mesh, (imgs, masks))

    srep = replicate(mesh, TrainState.create(variables, tc))
    srep, loss_rep, _ = train_step(srep, bi, bm, jax.random.PRNGKey(1),
                                   TINY)

    sfsdp = fsdp_shard(mesh, TrainState.create(variables, tc),
                       min_leaf_size=128)
    # at least one large leaf must actually be sharded
    shardings = [x.sharding.spec for x in jax.tree.leaves(sfsdp.params)
                 if hasattr(x, "sharding")]
    assert any(any(s is not None for s in spec) for spec in shardings)
    sfsdp, loss_fsdp, _ = train_step(sfsdp, bi, bm, jax.random.PRNGKey(1),
                                     TINY)

    np.testing.assert_allclose(float(loss_rep), float(loss_fsdp), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(srep.params),
                    jax.tree.leaves(sfsdp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


def test_graft_entry_dryrun():
    """Runs in a fresh interpreter (tests/_dryrun_main.py): the dryrun's
    many back-to-back large compiles hit the XLA:CPU executable-cache
    serializer segfault in long-lived suite workers (CLAUDE.md round-3
    hazard; same isolation as test_quant's delta bound)."""
    import os
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_dryrun_main.py")
    proc = subprocess.run([sys.executable, script], env=dict(os.environ),
                          capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    assert "dryrun-ok" in proc.stdout


def test_graft_entry_lowers():
    import __graft_entry__ as g

    fn, (variables, images) = g.entry()
    lowered = jax.jit(fn).lower(variables, images)
    assert "512" in str(lowered.out_info.shape)
