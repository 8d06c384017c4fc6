"""Parity of the fused MixFFN Pallas kernels (ops/fused_ffn.py) against the
XLA chain dense1 -> dwconv -> gelu -> dense2 — forward and all 7 gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semisupervisedobjectdetection_tpu.ops.fused_ffn import fused_ffn, xla_ffn


def _args(b=2, h=8, w=8, c=64, seed=0):
    m = 4 * c
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(b, h * w, c)) * 0.5, jnp.float32),
        jnp.asarray(rng.normal(size=(c, m)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(m,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(3, 3, m)) * 0.3, jnp.float32),
        jnp.asarray(rng.normal(size=(m,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(m, c)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32),
    )


@pytest.mark.parametrize("approx", [False, True])
def test_forward_matches_xla(approx):
    args = _args()
    y = jax.jit(lambda *a: fused_ffn(*a, 8, 8, approx))(*args)
    r = xla_ffn(*args, 8, 8, approx)
    np.testing.assert_allclose(np.asarray(y), np.asarray(r),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("approx", [False, True])
def test_grads_match_xla(approx):
    args = _args(seed=1)
    cot = jnp.asarray(np.random.default_rng(9).normal(
        size=args[0].shape), jnp.float32)

    def make(fn):
        def loss(*a):
            return jnp.sum(fn(*a, 8, 8, approx) * cot)
        return jax.jit(jax.grad(loss, argnums=tuple(range(7))))

    ours = make(fused_ffn)(*args)
    ref = make(xla_ffn)(*args)
    names = ["dx", "dw1", "db1", "dk", "dbk", "dw2", "db2"]
    for n, a, b in zip(names, ours, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=n)


def test_nonsquare_hw_and_bigger_batch():
    # h != w exercises the flat-token row stride; batch 3 exercises the
    # dW accumulation across more than two grid steps.
    b, h, w, c = 3, 4, 16, 64
    m = 4 * c
    rng = np.random.default_rng(3)
    args = (
        jnp.asarray(rng.normal(size=(b, h * w, c)) * 0.5, jnp.float32),
        jnp.asarray(rng.normal(size=(c, m)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(m,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(3, 3, m)) * 0.3, jnp.float32),
        jnp.asarray(rng.normal(size=(m,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(m, c)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32),
    )
    y = jax.jit(lambda *a: fused_ffn(*a, h, w, False))(*args)
    r = xla_ffn(*args, h, w, False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(r),
                               rtol=2e-5, atol=2e-5)
    g = jax.jit(jax.grad(lambda *a: jnp.sum(fused_ffn(*a, h, w, False)),
                         argnums=(0, 3)))(*args)
    gr = jax.jit(jax.grad(lambda *a: jnp.sum(xla_ffn(*a, h, w, False)),
                          argnums=(0, 3)))(*args)
    for a, b_ in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_model_level_fused_ffn_parity():
    """SegFormer with dwconv_impl='fused' shares the unfused param pytree
    and matches logits + grads within bf16-chain tolerance."""
    from semisupervisedobjectdetection_tpu.core.config import mit_b0
    from semisupervisedobjectdetection_tpu.models.segformer import SegFormer

    cfg = mit_b0(depths=(1, 1, 1, 1), hidden_sizes=(32, 64, 128, 256),
                 num_heads=(1, 2, 4, 8), decoder_hidden=32)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 64, 64, 3)),
                    jnp.float32)
    variables = jax.jit(SegFormer(cfg).init)(jax.random.PRNGKey(0), x)

    outs, grads = {}, {}
    for impl in ("xla", "fused"):
        c = cfg.replace(dwconv_impl=impl)

        def f(params):
            logits, _ = SegFormer(c).apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]}, x)
            return jnp.mean(logits ** 2), logits

        (_, logits), g = jax.jit(
            jax.value_and_grad(f, has_aux=True))(variables["params"])
        outs[impl], grads[impl] = logits, g

    np.testing.assert_allclose(np.asarray(outs["fused"]),
                               np.asarray(outs["xla"]),
                               rtol=1e-3, atol=1e-4)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4),
        grads["fused"], grads["xla"])
