"""FFN tensor parallelism (parallel/tp.py): sharded params reproduce the
replicated model's outputs and gradients on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from semisupervisedobjectdetection_tpu.core.config import mit_b0
from semisupervisedobjectdetection_tpu.models.segformer import SegFormer
from semisupervisedobjectdetection_tpu.parallel.tp import (
    dp_tp_mesh,
    tp_shard,
    tp_spec_for,
)

CFG = mit_b0(depths=(1, 1, 2, 1), hidden_sizes=(16, 32, 64, 128),
             num_heads=(1, 2, 4, 8), decoder_hidden=32)


def test_spec_rules():
    assert tp_spec_for(("encoder", "block_2", "mlp", "dense1", "kernel"),
                       (2, 64, 256), 4) == P(None, None, "tp")
    assert tp_spec_for(("encoder", "block_2", "mlp", "dense1", "bias"),
                       (2, 256), 4) == P(None, "tp")
    assert tp_spec_for(("encoder", "block_2", "mlp", "dwconv", "kernel"),
                       (2, 3, 3, 1, 256), 4) == P(None, None, None, None,
                                                  "tp")
    assert tp_spec_for(("encoder", "block_2", "mlp", "dense2", "kernel"),
                       (2, 256, 64), 4) == P(None, "tp", None)
    assert tp_spec_for(("encoder", "block_2", "mlp", "dense2", "bias"),
                       (2, 64), 4) == P()
    assert tp_spec_for(("encoder", "block_2", "attention", "query",
                        "kernel"), (2, 64, 64), 4) == P()
    # indivisible hidden dim stays replicated
    assert tp_spec_for(("encoder", "block_0", "mlp", "dense1", "kernel"),
                       (1, 16, 36), 8) == P()


def test_tp_forward_and_grads_match_replicated():
    mesh = dp_tp_mesh(dp=2, tp=4)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(4, 64, 64, 3)),
                    jnp.float32)
    variables = jax.jit(SegFormer(CFG).init)(jax.random.PRNGKey(0), x)
    stats = variables["batch_stats"]

    def loss_fn(params):
        logits, _ = SegFormer(CFG).apply(
            {"params": params, "batch_stats": stats}, x)
        return jnp.mean(logits ** 2), logits

    (l_ref, logits_ref), g_ref = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(variables["params"])

    with mesh:
        tparams = tp_shard(mesh, variables["params"])
        xb = jax.device_put(x, NamedSharding(mesh, P("data")))
        (l_tp, logits_tp), g_tp = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(tparams)

    np.testing.assert_allclose(float(l_ref), float(l_tp), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(logits_tp),
                               np.asarray(logits_ref),
                               rtol=1e-5, atol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        g_tp, g_ref)
    del xb


def test_tp_param_memory_is_sharded():
    mesh = dp_tp_mesh(dp=1, tp=8)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(SegFormer(CFG).init)(jax.random.PRNGKey(0), x)
    tparams = tp_shard(mesh, variables["params"])
    k = tparams["encoder"]["block_2"]["mlp"]["dense1"]["kernel"]
    # (depth=2, 64, 256) sharded over tp=8 on the last dim
    shard_shape = k.sharding.shard_shape(k.shape)
    assert shard_shape == (2, 64, 32), shard_shape
