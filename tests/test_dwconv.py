"""Parity of the Pallas token-layout depthwise conv (ops/dwconv.py) against
XLA's NHWC depthwise conv — forward AND custom-VJP gradients — plus its
integration into MixFFN via MiTConfig.dwconv_impl."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semisupervisedobjectdetection_tpu.ops.dwconv import (
    _xla_dwconv,
    dwconv3x3,
    pallas_fits,
)


def _data(b=2, h=8, w=8, c=128, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, h * w, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, c)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    return x, k, bias


def test_fits_expected_shapes():
    # B5 @ 512x512 stage maps: only stage 1 (128x128) falls back.
    assert not pallas_fits(128, 128, 256)
    assert pallas_fits(64, 64, 512)
    assert pallas_fits(32, 32, 1280)
    assert pallas_fits(16, 16, 2048)


def test_forward_matches_xla():
    x, k, bias = _data()
    assert pallas_fits(8, 8, 128)
    y_ref = _xla_dwconv(x, k, bias, 8, 8)
    y = jax.jit(lambda *a: dwconv3x3(*a, 8, 8))(x, k, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_grads_match_xla():
    x, k, bias = _data(seed=1)
    cot = jnp.asarray(np.random.default_rng(2).normal(size=x.shape),
                      jnp.float32)

    def loss(fn):
        def f(xx, kk, bb):
            return jnp.sum(fn(xx, kk, bb, 8, 8) * cot)
        return jax.jit(jax.grad(f, argnums=(0, 1, 2)))

    gx, gk, gb = loss(dwconv3x3)(x, k, bias)
    rx, rk, rb = loss(_xla_dwconv)(x, k, bias)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb),
                               rtol=1e-4, atol=1e-3)


def test_fallback_shape_still_differentiates():
    # (h*w) % 8 != 0 routes through the XLA fallback inside the custom vjp.
    x, k, bias = _data(h=3, w=3, c=64, seed=3)
    assert not pallas_fits(3, 3, 64)
    g = jax.jit(jax.grad(
        lambda xx: jnp.sum(dwconv3x3(xx, k, bias, 3, 3))))(x)
    r = jax.jit(jax.grad(
        lambda xx: jnp.sum(_xla_dwconv(xx, k, bias, 3, 3))))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                               rtol=1e-5, atol=1e-5)


def test_model_level_parity():
    """SegFormer logits + grads with dwconv_impl=pallas match xla (the
    two implementations share one param pytree)."""
    from semisupervisedobjectdetection_tpu.core.config import mit_b0
    from semisupervisedobjectdetection_tpu.models.segformer import SegFormer

    cfg = mit_b0(depths=(1, 1, 1, 1), hidden_sizes=(32, 64, 128, 256),
                 num_heads=(1, 2, 4, 8), decoder_hidden=32)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 64, 64, 3)),
                    jnp.float32)
    variables = jax.jit(SegFormer(cfg).init)(jax.random.PRNGKey(0), x)

    outs, grads = {}, {}
    for impl in ("xla", "pallas"):
        c = cfg.replace(dwconv_impl=impl)

        def f(params):
            logits, _ = SegFormer(c).apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]}, x)
            return jnp.mean(logits ** 2), logits

        (loss, logits), g = jax.jit(
            jax.value_and_grad(f, has_aux=True))(variables["params"])
        outs[impl], grads[impl] = logits, g

    np.testing.assert_allclose(np.asarray(outs["pallas"]),
                               np.asarray(outs["xla"]),
                               rtol=1e-4, atol=1e-4)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4),
        grads["pallas"], grads["xla"])
