"""Shape/semantics contracts of the SegFormer rebuild (SURVEY.md §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semisupervisedobjectdetection_tpu.core.config import mit_b0, mit_b5
from semisupervisedobjectdetection_tpu.models.segformer import (
    SegFormer,
    predict_masks,
)

TINY = mit_b0(depths=(1, 1, 1, 1), hidden_sizes=(8, 16, 32, 64),
              num_heads=(1, 2, 4, 8), decoder_hidden=32)


def init_apply(cfg, x, seed=0):
    model = SegFormer(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(seed), x)
    out = jax.jit(model.apply)(variables, x)
    return variables, out


def test_logits_quarter_resolution():
    x = jnp.zeros((2, 64, 64, 3))
    _, (logits, cls_list) = init_apply(TINY, x)
    # decode head emits H/4 x W/4 (ref modeling_segformer.py:782 comment)
    assert logits.shape == (2, 16, 16, 1)
    assert all(c is None for c in cls_list)


def test_stage_resolutions_match_reference():
    """Strides (4,2,2,2): 64 -> 16,8,4,2 token grids."""
    from semisupervisedobjectdetection_tpu.models.segformer import MiTEncoder

    x = jnp.zeros((1, 64, 64, 3))
    enc = MiTEncoder(TINY)
    variables = jax.jit(enc.init)(jax.random.PRNGKey(0), x)
    hs, _ = jax.jit(enc.apply)(variables, x)
    assert [h.shape[1] for h in hs] == [16, 8, 4, 2]
    assert [h.shape[-1] for h in hs] == list(TINY.hidden_sizes)


def test_prompt_tokens_are_params_and_change_output():
    cfg = TINY.replace(prompt_tokens=(4, 4, 4, 4))
    x = jnp.zeros((1, 64, 64, 3)) + 0.5
    variables, (logits, _) = init_apply(cfg, x)
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    prompt_paths = [kp for kp, _ in flat
                    if any("prompt_tokens" in str(k) for k in kp)]
    assert len(prompt_paths) == 4  # one per stage

    # zeroing the prompts must change the logits (they participate in attn)
    def zero_prompts(path, leaf):
        if any("prompt_tokens" in str(k) for k in path):
            return jnp.zeros_like(leaf)
        return leaf

    zeroed = jax.tree_util.tree_map_with_path(zero_prompts,
                                              variables["params"])
    model = SegFormer(cfg)
    logits2, _ = jax.jit(model.apply)(
        {**variables, "params": zeroed}, x)
    assert not np.allclose(np.asarray(logits), np.asarray(logits2))


def test_prompt_per_layer_shapes():
    cfg = TINY.replace(depths=(2, 2, 2, 2), prompt_tokens=(3, 3, 3, 3),
                       prompt_per_layer=True)
    x = jnp.zeros((1, 32, 32, 3))
    variables, _ = init_apply(cfg, x)
    p0 = variables["params"]["encoder"]["prompt_tokens_0"]
    assert p0.shape == (2, 3, 8)  # (depth, tokens, hidden)


def test_cls_token_carried_and_injected():
    cfg = TINY.replace(cls_tokens=(1, 1, 1, 1))
    x = jnp.ones((2, 64, 64, 3)) * 0.3
    variables, (logits, cls_list) = init_apply(cfg, x)
    assert [c.shape for c in cls_list] == [
        (2, 1, 8), (2, 1, 16), (2, 1, 32), (2, 1, 64)]
    # decode head grew cls_proj params
    assert "cls_proj_0" in variables["params"]["decode_head"]

    # CLS value must influence the logits (domain prompting mechanism)
    params2 = jax.tree_util.tree_map_with_path(
        lambda p, l: l + 2.0 if any("cls_token" in str(k) for k in p) else l,
        variables["params"])
    model = SegFormer(cfg)
    logits2, _ = jax.jit(model.apply)(
        {**variables, "params": params2}, x)
    assert not np.allclose(np.asarray(logits), np.asarray(logits2))


def test_prompt_token_invariance_of_spatial_shape():
    """Prompt/CLS tokens never leak into the spatial grid."""
    cfg = TINY.replace(prompt_tokens=(5, 5, 5, 5), cls_tokens=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 64, 3))
    _, (logits, _) = init_apply(cfg, x)
    assert logits.shape == (1, 16, 16, 1)


def test_predict_masks_range_and_shape():
    x = jnp.zeros((2, 64, 64, 3))
    _, (logits, _) = init_apply(TINY, x)
    masks = predict_masks(logits, (64, 64))
    assert masks.shape == (2, 64, 64)
    assert float(jnp.min(masks)) >= 0.0 and float(jnp.max(masks)) <= 1.0


def test_autoencoder_head_three_channels():
    cfg = TINY.replace(num_labels=3)
    x = jnp.zeros((1, 64, 64, 3))
    _, (logits, _) = init_apply(cfg, x)
    assert logits.shape == (1, 16, 16, 3)
    masks = predict_masks(logits, (64, 64))
    assert masks.shape == (1, 64, 64, 3)


def test_b5_config_constants():
    cfg = mit_b5()
    assert cfg.depths == (3, 6, 40, 3)
    assert cfg.hidden_sizes == (64, 128, 320, 512)
    assert cfg.sr_ratios == (8, 4, 2, 1)
    assert cfg.decoder_hidden == 768


def test_deterministic_forward_is_deterministic():
    x = jnp.ones((1, 32, 32, 3)) * 0.7
    variables, (l1, _) = init_apply(TINY, x)
    model = SegFormer(TINY)
    l2, _ = jax.jit(model.apply)(variables, x)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


@pytest.mark.parametrize("remat", [
    "none", "full", "dots", "save:gelu+dwconv+ffn1",
    "full,full,save:gelu+ln2+ctx,none",
])
def test_remat_policies_grads_match(remat):
    """Every remat spec (including selective save:<names> and per-stage
    lists) must produce identical loss AND grads — remat only trades
    memory for recompute, never numerics (on CPU, deterministic)."""
    cfg_base = TINY.replace(depths=(1, 2, 2, 1))
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 64, 64, 3)),
                    jnp.float32)
    y = jnp.asarray(np.random.default_rng(1).uniform(size=(2, 16, 16, 1)),
                    jnp.float32)

    def loss_for(cfg, variables):
        def loss_fn(params):
            logits, _ = SegFormer(cfg).apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]}, x)
            return jnp.mean((logits - y) ** 2)
        return jax.jit(jax.value_and_grad(loss_fn))(variables["params"])

    variables = jax.jit(SegFormer(cfg_base).init)(jax.random.PRNGKey(0), x)
    l_ref, g_ref = loss_for(cfg_base.replace(remat="none"), variables)
    l, g = loss_for(cfg_base.replace(remat=remat), variables)
    assert np.allclose(float(l_ref), float(l), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6), g_ref, g)


def test_remat_bad_spec_raises():
    with pytest.raises(ValueError):
        cfg = TINY.replace(remat="bogus")
        x = jnp.zeros((1, 32, 32, 3))
        jax.jit(SegFormer(cfg).init)(jax.random.PRNGKey(0), x)
