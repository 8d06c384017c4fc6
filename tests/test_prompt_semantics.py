"""Deep parity tests for the prompt/CLS token machinery (SURVEY.md §2.3):
the behaviors that distinguish the project's modified SegFormer from stock
upstream."""

import numpy as np
import jax
import jax.numpy as jnp

from semisupervisedobjectdetection_tpu.models.segformer import (
    EfficientSelfAttention,
)


def test_prefix_tokens_skip_sequence_reduction():
    """With sr_ratio>1, the KV stream must be prefix + conv-reduced spatial
    (ref `modeling_segformer.py:194-205`): prompt tokens are attended at
    full fidelity, not strided away."""
    h = w = 8
    sr = 4
    c = 16
    n_prefix = 3
    attn = EfficientSelfAttention(hidden_size=c, num_heads=2, sr_ratio=sr,
                                  attention_dropout=0.0, hidden_dropout=0.0,
                                  eps=1e-6, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, n_prefix + h * w, c)), jnp.float32)
    variables = jax.jit(attn.init, static_argnames=("h", "w", "n_prefix",
                                                    "deterministic"))(
        jax.random.PRNGKey(0), x, h=h, w=w, n_prefix=n_prefix,
        deterministic=True)
    # The sr_norm LayerNorm sees prefix + reduced tokens: check the key
    # projection's input length via the captured intermediate shape.
    out, mods = attn.apply(variables, x, h, w, n_prefix, True,
                           capture_intermediates=True)
    assert out.shape == x.shape

    # Zeroing a prompt token must change attention output everywhere even
    # though sr_ratio strides the spatial grid: it survives the reduction.
    x2 = x.at[:, 0, :].set(0.0)
    out2 = attn.apply(variables, x2, h, w, n_prefix, True)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_prompt_influence_is_full_fidelity_not_strided():
    """A SPATIAL token that the sr-conv stride folds away influences KV
    only through the reduction; a PROMPT token influences KV directly.
    Verify the prompt path exists by comparing sr>1 with n_prefix=0 vs 1
    on the same underlying spatial content."""
    h = w = 8
    c = 8
    attn = EfficientSelfAttention(hidden_size=c, num_heads=1, sr_ratio=8,
                                  attention_dropout=0.0, hidden_dropout=0.0,
                                  eps=1e-6, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    spatial = jnp.asarray(rng.normal(size=(1, h * w, c)), jnp.float32)
    prompt = jnp.asarray(rng.normal(size=(1, 1, c)), jnp.float32)
    stream = jnp.concatenate([prompt, spatial], axis=1)
    variables = jax.jit(attn.init, static_argnames=("h", "w", "n_prefix",
                                                    "deterministic"))(
        jax.random.PRNGKey(0), stream, h=h, w=w, n_prefix=1,
        deterministic=True)
    out_with = attn.apply(variables, stream, h, w, 1, True)
    # sr=8 on 8x8 -> single reduced spatial token + 1 prompt = KV len 2.
    # An additive change of direction on the prompt token (LayerNorm is
    # scale-invariant, so use a shift) must influence the outputs of
    # SPATIAL tokens through K/V — proof it sits in the un-reduced KV.
    shifted = jnp.concatenate(
        [prompt + jnp.asarray(rng.normal(size=(1, 1, c)), jnp.float32),
         spatial], axis=1)
    out_shift = attn.apply(variables, shifted, h, w, 1, True)
    spatial_delta = np.abs(np.asarray(out_with[:, 1:])
                           - np.asarray(out_shift[:, 1:])).mean()
    assert spatial_delta > 1e-4


def test_carried_cls_evolves_across_layers():
    """The CLS token carried across layers must change layer to layer
    (ref `:455-465`: output CLS of layer i feeds layer i+1)."""
    from semisupervisedobjectdetection_tpu.core.config import mit_b0
    from semisupervisedobjectdetection_tpu.models.segformer import (
        MiTEncoder,
    )

    cfg = mit_b0(depths=(3, 1, 1, 1), hidden_sizes=(8, 16, 32, 64),
                 num_heads=(1, 2, 4, 8), cls_tokens=(1, 1, 1, 1))
    enc = MiTEncoder(cfg)
    x = jnp.asarray(np.random.default_rng(2).uniform(
        size=(1, 32, 32, 3)), jnp.float32)
    variables = jax.jit(enc.init)(jax.random.PRNGKey(0), x)
    _, cls_list = enc.apply(variables, x)
    # carried CLS after 3 layers differs from the raw parameter broadcast
    raw = np.asarray(variables["params"]["cls_token_0"])
    carried = np.asarray(cls_list[0][0])
    assert not np.allclose(raw, carried, atol=1e-4)


def test_prompt_tokens_do_not_change_spatial_token_count():
    """Prefix tokens are stripped before the FFN and never reach the next
    stage's patch embedding (ref `:352-363`)."""
    from semisupervisedobjectdetection_tpu.core.config import mit_b0
    from semisupervisedobjectdetection_tpu.models.segformer import (
        MiTEncoder,
    )

    base = mit_b0(depths=(1, 1, 1, 1), hidden_sizes=(8, 16, 32, 64),
                  num_heads=(1, 2, 4, 8))
    with_prompts = base.replace(prompt_tokens=(7, 7, 7, 7),
                                cls_tokens=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 64, 3))
    for cfg in (base, with_prompts):
        enc = MiTEncoder(cfg)
        v = jax.jit(enc.init)(jax.random.PRNGKey(0), x)
        hs, _ = enc.apply(v, x)
        assert [tuple(h.shape[1:3]) for h in hs] == [
            (16, 16), (8, 8), (4, 4), (2, 2)]


def test_scan_unroll_numerically_invariant():
    """unroll only changes XLA scheduling, never results."""
    from semisupervisedobjectdetection_tpu.core.config import mit_b0
    from semisupervisedobjectdetection_tpu.models.segformer import SegFormer

    x = jnp.asarray(np.random.default_rng(6).uniform(
        size=(1, 32, 32, 3)), jnp.float32)
    cfg1 = mit_b0(depths=(4, 1, 1, 1), hidden_sizes=(8, 16, 32, 64),
                  num_heads=(1, 2, 4, 8), decoder_hidden=16)
    m1 = SegFormer(cfg1)
    v = jax.jit(m1.init)(jax.random.PRNGKey(0), x)
    l1, _ = jax.jit(m1.apply)(v, x)
    m2 = SegFormer(cfg1.replace(scan_unroll=2))
    l2, _ = jax.jit(m2.apply)(v, x)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_gelu_approx_close_to_exact():
    from semisupervisedobjectdetection_tpu.core.config import mit_b0
    from semisupervisedobjectdetection_tpu.models.segformer import SegFormer

    x = jnp.asarray(np.random.default_rng(3).uniform(
        size=(1, 32, 32, 3)), jnp.float32)
    cfg = mit_b0(depths=(1, 1, 1, 1), hidden_sizes=(8, 16, 32, 64),
                 num_heads=(1, 2, 4, 8), decoder_hidden=16)
    m_exact = SegFormer(cfg)
    v = jax.jit(m_exact.init)(jax.random.PRNGKey(0), x)
    l_exact, _ = m_exact.apply(v, x)
    m_approx = SegFormer(cfg.replace(gelu_approx=True))
    l_approx, _ = m_approx.apply(v, x)
    np.testing.assert_allclose(np.asarray(l_exact), np.asarray(l_approx),
                               atol=5e-3)
