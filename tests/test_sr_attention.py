"""Pallas SR-attention kernel vs plain XLA attention (interpret mode on
CPU; the real-TPU path is exercised by bench.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from semisupervisedobjectdetection_tpu.ops import sr_attention
from semisupervisedobjectdetection_tpu.ops.sr_attention import (
    _reference_attention,
)
from semisupervisedobjectdetection_tpu.models.segformer import xla_attention


@pytest.mark.parametrize("b,nq,nk,c,h", [
    (2, 256, 256, 64, 1),     # stage-4-like: square attention
    (1, 1024, 266, 64, 1),    # stage-1-like with prompt prefix (nk=266)
    (2, 128, 96, 128, 2),     # multi-head, unaligned nk
])
def test_pallas_matches_xla(b, nq, nk, c, h):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, nq, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, nk, c)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, nk, c)), jnp.float32)

    expected = np.asarray(xla_attention(q, k, v, h, 0.0, True, None))
    with jax.disable_jit():  # run pallas in interpret-able eager mode
        pass
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(sr_attention(q, k, v, h))
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=1e-4)


def test_gradients_match_xla():
    rng = np.random.default_rng(1)
    b, nq, nk, c, h = 1, 64, 40, 32, 2
    q = jnp.asarray(rng.normal(size=(b, nq, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, nk, c)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, nk, c)), jnp.float32)

    def loss_ours(q, k, v):
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(sr_attention(q, k, v, h) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v, h, 0.0, True, None) ** 2)

    g_ours = jax.grad(loss_ours, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=1e-3)


def test_reference_attention_helper_consistent():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 32, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 8, 16)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 8, 16)), jnp.float32)
    a = np.asarray(_reference_attention(q, k, v, 2))
    b = np.asarray(xla_attention(q, k, v, 2, 0.0, True, None))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_pallas_backward_matches_xla_blocks_and_padding():
    """Direct parity of the Pallas backward (_backward) vs the XLA-einsum
    VJP at a shape exercising key padding (nk=200 -> 256), multiple query
    blocks with a ragged tail (nq=520 over block_q=256), and dk/dv
    accumulation across the q-block grid axis."""
    from semisupervisedobjectdetection_tpu.ops.sr_attention import (
        _backward,
        _xla_vjp_bwd,
    )
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(5)
    h, c = 4, 64
    q = jnp.asarray(rng.normal(size=(2, 520, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 200, c)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 200, c)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(2, 520, c)), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        dq, dk, dv = _backward(q, k, v, g, h)
    rq, rk, rv = _xla_vjp_bwd(q, k, v, g, h)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv),
                               atol=2e-4, rtol=1e-3)
