"""DINOv2 weight-import numeric parity: a torch Dinov2 (transformers, random
init — no network) is converted to the facebookresearch hub key layout, run
through `checkpoint.dinov2_import`, and our DinoViT must reproduce its
token outputs — the same cross-implementation check `test_hf_parity.py`
does for SegFormer (reference load site: `models/VitSegModel.py:20`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semisupervisedobjectdetection_tpu.checkpoint.dinov2_import import (
    import_dinov2_state_dict,
    normalize_hub_keys,
)
from semisupervisedobjectdetection_tpu.models.vit import DinoViT

DIM, DEPTH, HEADS, PATCH, IMG = 32, 2, 2, 8, 32


def hf_to_hub(sd):
    """transformers Dinov2 state_dict -> facebookresearch hub key layout
    (fused qkv, ls{1,2}.gamma, flat blocks.{i} keys)."""
    import torch

    out = {
        "cls_token": sd["embeddings.cls_token"],
        "mask_token": sd["embeddings.mask_token"],
        "pos_embed": sd["embeddings.position_embeddings"],
        "patch_embed.proj.weight":
            sd["embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias":
            sd["embeddings.patch_embeddings.projection.bias"],
        "norm.weight": sd["layernorm.weight"],
        "norm.bias": sd["layernorm.bias"],
    }
    i = 0
    while f"encoder.layer.{i}.norm1.weight" in sd:
        p, b = f"encoder.layer.{i}", f"blocks.{i}"
        a = f"{p}.attention.attention"
        out[f"{b}.attn.qkv.weight"] = torch.cat(
            [sd[f"{a}.query.weight"], sd[f"{a}.key.weight"],
             sd[f"{a}.value.weight"]], dim=0)
        out[f"{b}.attn.qkv.bias"] = torch.cat(
            [sd[f"{a}.query.bias"], sd[f"{a}.key.bias"],
             sd[f"{a}.value.bias"]], dim=0)
        out[f"{b}.attn.proj.weight"] = sd[f"{p}.attention.output.dense.weight"]
        out[f"{b}.attn.proj.bias"] = sd[f"{p}.attention.output.dense.bias"]
        out[f"{b}.ls1.gamma"] = sd[f"{p}.layer_scale1.lambda1"]
        out[f"{b}.ls2.gamma"] = sd[f"{p}.layer_scale2.lambda1"]
        for ln in ("norm1", "norm2"):
            out[f"{b}.{ln}.weight"] = sd[f"{p}.{ln}.weight"]
            out[f"{b}.{ln}.bias"] = sd[f"{p}.{ln}.bias"]
        for fc in ("fc1", "fc2"):
            out[f"{b}.mlp.{fc}.weight"] = sd[f"{p}.mlp.{fc}.weight"]
            out[f"{b}.mlp.{fc}.bias"] = sd[f"{p}.mlp.{fc}.bias"]
        i += 1
    return out


@pytest.fixture(scope="module")
def torch_model():
    import torch
    from transformers import Dinov2Config, Dinov2Model

    cfg = Dinov2Config(hidden_size=DIM, num_hidden_layers=DEPTH,
                       num_attention_heads=HEADS, image_size=IMG,
                       patch_size=PATCH, layerscale_value=1.0,
                       mlp_ratio=4, hidden_act="gelu",
                       hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0,
                       drop_path_rate=0.0)
    torch.manual_seed(0)
    return Dinov2Model(cfg).eval()


def test_tokens_match_torch(torch_model):
    import torch

    x = np.random.default_rng(0).uniform(-1, 1, (2, 3, IMG, IMG)) \
        .astype(np.float32)
    with torch.no_grad():
        want = torch_model(torch.tensor(x)).last_hidden_state.numpy()

    model = DinoViT(img_size=IMG, patch_size=PATCH, embed_dim=DIM,
                    depth=DEPTH, num_heads=HEADS, init_values=1.0)
    xn = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), xn)
    params = import_dinov2_state_dict(hf_to_hub(torch_model.state_dict()),
                                      variables["params"])
    out = jax.jit(model.apply)({"params": params}, xn)
    got = np.concatenate([np.asarray(out["x_norm_clstoken"])[:, None],
                          np.asarray(out["x_norm_patchtokens"])], axis=1)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_chunked_key_normalization():
    sd = {"blocks.0.3.norm1.weight": 1, "blocks.1.7.attn.qkv.weight": 2,
          "cls_token": 3}
    flat = normalize_hub_keys(sd)
    assert flat == {"blocks.3.norm1.weight": 1,
                    "blocks.7.attn.qkv.weight": 2, "cls_token": 3}


def test_pos_embed_interpolated_on_mismatch(torch_model):
    # import into a model with a DIFFERENT patch grid (16x16 -> 4 patches
    # per side becomes 2): importer must resample instead of failing
    model = DinoViT(img_size=16, patch_size=PATCH, embed_dim=DIM,
                    depth=DEPTH, num_heads=HEADS, init_values=1.0)
    xn = jnp.zeros((1, 16, 16, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), xn)
    params = import_dinov2_state_dict(hf_to_hub(torch_model.state_dict()),
                                      variables["params"])
    assert params["pos_embed"].shape == variables["params"]["pos_embed"].shape
    jax.jit(model.apply)({"params": params}, xn)  # must run
