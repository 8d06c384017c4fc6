"""Context (spatial) parallelism: sharding the image height across the
mesh must reproduce replicated results — forward AND a full train step on
a combined (data x space) mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from semisupervisedobjectdetection_tpu.core.config import (
    TrainConfig,
    mit_b0,
)
from semisupervisedobjectdetection_tpu.models.segformer import SegFormer
from semisupervisedobjectdetection_tpu.parallel.context import (
    get_mesh_2d,
    shard_spatial_batch,
)
from semisupervisedobjectdetection_tpu.train.state import TrainState
from semisupervisedobjectdetection_tpu.train.supervised import train_step

TINY = mit_b0(depths=(1, 1, 1, 1), hidden_sizes=(8, 16, 32, 64),
              num_heads=(1, 2, 4, 8), decoder_hidden=32)

needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 devices")


@needs8
def test_spatial_forward_matches_replicated():
    model = SegFormer(TINY)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        size=(2, 128, 128, 3)), jnp.float32)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    ref, _ = jax.jit(model.apply)(v, x)

    mesh = get_mesh_2d(dp=1, sp=8)
    xs, _ = shard_spatial_batch(mesh, x)
    vs = jax.tree.map(
        lambda a: jax.device_put(a, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec())), v)
    out, _ = jax.jit(model.apply)(vs, xs)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=1e-5)


@needs8
def test_dp_x_sp_gradients_match_single_device():
    """Loss and gradients on a (data=2, space=4) mesh must match the
    single-device values. (Gradients, not post-Adam params: Adam's first
    step is ~sign(grad)*lr, which amplifies fp reduction-order noise on
    near-zero gradient elements into full ±lr discrepancies.)"""
    from semisupervisedobjectdetection_tpu import losses
    from semisupervisedobjectdetection_tpu.train.common import forward_masks

    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.uniform(0, 1, (4, 64, 64, 3)), jnp.float32)
    masks = jnp.asarray(rng.uniform(0, 1, (4, 64, 64)) > 0.5, jnp.float32)
    variables = jax.jit(SegFormer(TINY).init)(
        jax.random.PRNGKey(0), imgs[:1])

    @jax.jit
    def loss_and_grads(variables, images, masks):
        def loss_fn(params):
            pred, _, _ = forward_masks(
                TINY, {**variables, "params": params}, images)
            return losses.dice_loss(pred, masks)

        return jax.value_and_grad(loss_fn)(variables["params"])

    loss_ref, grads_ref = loss_and_grads(variables, imgs, masks)

    mesh = get_mesh_2d(dp=2, sp=4)
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    v_par = jax.tree.map(lambda a: jax.device_put(a, rep), variables)
    bi, bm = shard_spatial_batch(mesh, imgs, masks)
    loss_par, grads_par = loss_and_grads(v_par, bi, bm)

    np.testing.assert_allclose(float(loss_ref), float(loss_par), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(grads_ref), jax.tree.leaves(grads_par)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)
