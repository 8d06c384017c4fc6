"""Ring-overlapped collective matmuls (`parallel/collective.py`) match the
unsharded math on the 8-device virtual mesh.

The reference has no distributed code at all (SURVEY.md §5); these
primitives are the explicit TPU collective-matmul recipe, so the oracle is
plain jnp matmul on replicated arrays."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from semisupervisedobjectdetection_tpu.parallel.collective import (
    all_gather_matmul,
    matmul_reduce_scatter,
    mixffn_collective,
    sequence_parallel_ffn,
)

needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 devices")


def _mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]), ("tp",))


def _put(mesh, x, spec):
    return jax.device_put(x, NamedSharding(mesh, spec))


@needs8
@pytest.mark.parametrize("n", [2, 8])
def test_all_gather_matmul_matches_dense(n):
    mesh = _mesh(n)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 12)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((12, 24)), jnp.float32)
    y = all_gather_matmul(mesh,
                          _put(mesh, x, P(None, "tp", None)),
                          _put(mesh, w, P(None, "tp")))
    assert y.shape == (2, 16, 24)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x @ w),
                               rtol=1e-6, atol=1e-6)


@needs8
@pytest.mark.parametrize("n", [2, 8])
def test_matmul_reduce_scatter_matches_dense(n):
    mesh = _mesh(n)
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.standard_normal((2, 16, 24)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((24, 12)), jnp.float32)
    y = matmul_reduce_scatter(mesh,
                              _put(mesh, h, P(None, None, "tp")),
                              _put(mesh, w, P("tp", None)))
    assert y.shape == (2, 16, 12)
    # ring accumulation reorders the fp sum across shards
    np.testing.assert_allclose(np.asarray(y), np.asarray(h @ w),
                               rtol=1e-5, atol=1e-5)


@needs8
def test_sequence_parallel_ffn_matches_dense():
    mesh = _mesh(8)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 32, 16)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((16, 64)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((64,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((64, 16)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((16,)) * 0.1, jnp.float32)
    y = sequence_parallel_ffn(mesh,
                              _put(mesh, x, P(None, "tp", None)),
                              _put(mesh, w1, P(None, "tp")), b1,
                              _put(mesh, w2, P("tp", None)), b2)
    want = jax.nn.gelu(x @ w1 + b1[None, None]) @ w2 + b2[None, None]
    assert y.shape == x.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # output stays sequence-sharded for the next block's LN/residual
    assert len(y.sharding.device_set) == 8


@needs8
def test_mixffn_collective_matches_model_block():
    # the real FLOP-dominant block: dense1 -> 3x3 depthwise -> GELU ->
    # dense2, driven by the model's own param pytree
    from semisupervisedobjectdetection_tpu.models.segformer import MixFFN

    mesh = _mesh(8)
    h_, w_ = 8, 8
    c, m = 16, 64
    block = MixFFN(hidden_size=c, mlp_hidden=m, hidden_dropout=0.0,
                   dtype=jnp.float32)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, h_ * w_, c)) * 0.5,
                    jnp.float32)
    variables = jax.jit(block.init, static_argnums=(2, 3, 4))(
        jax.random.PRNGKey(0), x, h_, w_, True)
    want = block.apply(variables, x, h_, w_, True)

    xs = _put(mesh, x, P(None, "tp", None))
    got = mixffn_collective(mesh, xs, variables["params"], h_, w_)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    assert len(got.sharding.device_set) == 8


@needs8
def test_collectives_jit_and_grad():
    # the primitives must compose with jit + autodiff (the training path)
    mesh = _mesh(8)
    rng = np.random.default_rng(3)
    x = _put(mesh, jnp.asarray(rng.standard_normal((1, 16, 8)),
                               jnp.float32), P(None, "tp", None))
    w = _put(mesh, jnp.asarray(rng.standard_normal((8, 16)),
                               jnp.float32), P(None, "tp"))

    def loss(w):
        return jnp.sum(all_gather_matmul(mesh, x, w) ** 2)

    g = jax.jit(jax.grad(loss))(w)
    want = 2.0 * jnp.einsum("bsc,bsm->cm", np.asarray(x),
                            np.asarray(x) @ np.asarray(w))
    np.testing.assert_allclose(np.asarray(g), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


TINY = None  # built lazily; importing config at module import keeps CPU conftest first


def _tiny_cfg():
    from semisupervisedobjectdetection_tpu.core.config import mit_b0

    return mit_b0(depths=(1, 1, 1, 1), hidden_sizes=(8, 16, 32, 64),
                  num_heads=(1, 2, 4, 8), decoder_hidden=32)


@needs8
@pytest.mark.parametrize("mesh_shape,axes", [((8,), ("tp",)),
                                             ((2, 4), ("dp", "tp"))])
def test_model_ffn_impl_collective_matches_xla(mesh_shape, axes):
    """`MiTConfig.ffn_impl='collective'` routes every divisible stage's
    MixFFN through `mixffn_collective_ctx` under the ambient mesh; logits
    AND parameter gradients must match the XLA chain.

    The grad check is load-bearing: leaking a sequence-sharded activation
    across the shard_map boundary (either direction) reshards degenerate
    tiny-tile shardings through XLA's SPMD replicate-and-repartition
    fallback (b/433785288) and silently corrupts upstream gradients by
    O(1) — caught only by exactly this comparison."""
    from semisupervisedobjectdetection_tpu.models.segformer import SegFormer

    cfg = _tiny_cfg()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 64, 3)),
                    jnp.float32)
    m_x = SegFormer(cfg)
    m_c = SegFormer(cfg.replace(ffn_impl="collective"))
    v = jax.jit(m_x.init)(jax.random.PRNGKey(0), x)

    def loss(mod, p, xin):
        lg, _ = mod.apply({**v, "params": p}, xin)
        return jnp.sum(lg ** 2)

    want, _ = jax.jit(m_x.apply)(v, x)
    g1 = jax.jit(jax.grad(lambda p: loss(m_x, p, x)))(v["params"])

    # no ambient mesh: the collective config must fall back bit-exactly
    out, _ = jax.jit(m_c.apply)(v, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))

    mesh = jax.make_mesh(mesh_shape, axes,
                         axis_types=(jax.sharding.AxisType.Auto,) * len(axes))
    with jax.set_mesh(mesh):
        rep = NamedSharding(mesh, P())
        xs = jax.device_put(x, NamedSharding(mesh, P("dp"))
                            if "dp" in axes else rep)
        got, _ = jax.jit(m_c.apply)(v, xs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
        # pin grad out-shardings: unconstrained tiny-leaf outputs can hit
        # a jax GSPMD->NamedSharding parse failure (KeyError) unrelated
        # to the numerics under test
        g2 = jax.jit(jax.grad(lambda p: loss(m_c, p, xs)),
                     out_shardings=rep)(v["params"])
    flat1 = jax.tree_util.tree_flatten_with_path(g1)[0]
    flat2 = jax.tree.leaves(g2)
    for (kp, a), b in zip(flat1, flat2):
        scale = max(float(jnp.max(jnp.abs(a))), 1.0)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=5e-5 * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(kp)}")
