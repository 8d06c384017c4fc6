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


def test_attention_tp_spec_rules():
    heads = (1, 2, 4, 8)
    # stage 2 (4 heads) divides tp=4: q/k/v column, out row.
    assert tp_spec_for(("encoder", "block_2", "attention", "query",
                        "kernel"), (2, 64, 64), 4,
                       num_heads_by_stage=heads) == P(None, None, "tp")
    assert tp_spec_for(("encoder", "block_2", "attention", "out",
                        "kernel"), (2, 64, 64), 4,
                       num_heads_by_stage=heads) == P(None, "tp", None)
    # stage 1 (2 heads) does NOT divide tp=4: replicated.
    assert tp_spec_for(("encoder", "block_1", "attention", "query",
                        "kernel"), (1, 32, 32), 4,
                       num_heads_by_stage=heads) == P()
    # SR conv always replicated.
    assert tp_spec_for(("encoder", "block_2", "attention", "sr",
                        "kernel"), (2, 2, 2, 64, 64), 4,
                       num_heads_by_stage=heads) == P()
    # without num_heads_by_stage attention stays replicated (old default)
    assert tp_spec_for(("encoder", "block_2", "attention", "query",
                        "kernel"), (2, 64, 64), 4) == P()


def test_attention_tp_forward_and_grads_match_replicated():
    mesh = dp_tp_mesh(dp=2, tp=4)
    x = jnp.asarray(np.random.default_rng(3).uniform(size=(4, 64, 64, 3)),
                    jnp.float32)
    variables = jax.jit(SegFormer(CFG).init)(jax.random.PRNGKey(1), x)
    stats = variables["batch_stats"]

    def loss_fn(params):
        logits, _ = SegFormer(CFG).apply(
            {"params": params, "batch_stats": stats}, x)
        return jnp.mean(logits ** 2), logits

    (l_ref, logits_ref), g_ref = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(variables["params"])

    with mesh:
        tparams = tp_shard(mesh, variables["params"],
                           num_heads_by_stage=CFG.num_heads)
        (l_tp, logits_tp), g_tp = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(tparams)

    np.testing.assert_allclose(float(l_ref), float(l_tp), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(logits_tp),
                               np.asarray(logits_ref),
                               rtol=1e-5, atol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        g_tp, g_ref)


def test_ffn_flop_share_measured():
    """Back the docstring's FLOP-share claim with an XLA cost-analysis
    measurement at MiT-B5 stage-3 dims (1024 tokens, 320 ch, 5 heads,
    sr 2, mlp_ratio 4)."""
    from semisupervisedobjectdetection_tpu.models.segformer import (
        Block,
        MixFFN,
    )

    c, h, w = 320, 32, 32
    x = jnp.zeros((1, h, w, c), jnp.float32)
    carry = (x, None)
    per_layer = (jnp.zeros(()), None, None)
    blk = Block(hidden_size=c, num_heads=5, sr_ratio=2, mlp_ratio=4.0,
                attention_dropout=0.0, hidden_dropout=0.0, eps=1e-6,
                dtype=jnp.float32, deterministic=True)
    bv = jax.jit(blk.init)(jax.random.PRNGKey(0), carry, per_layer)
    full = jax.jit(lambda v: blk.apply(v, carry, per_layer)).lower(
        bv).compile().cost_analysis()

    ffn = MixFFN(hidden_size=c, mlp_hidden=4 * c, hidden_dropout=0.0,
                 dtype=jnp.float32)
    tokens = jnp.zeros((1, h * w, c), jnp.float32)
    fv = jax.jit(lambda r: ffn.init(r, tokens, h, w, True))(
        jax.random.PRNGKey(0))
    part = jax.jit(lambda v: ffn.apply(v, tokens, h, w, True)).lower(
        fv).compile().cost_analysis()

    if isinstance(full, list):
        full, part = full[0], part[0]
    share = part["flops"] / full["flops"]
    print(f"measured stage-3 FFN FLOP share: {share:.3f}")
    assert 0.45 < share < 0.70, share
