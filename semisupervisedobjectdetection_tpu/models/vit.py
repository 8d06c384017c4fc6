"""DINOv2-style Vision Transformer, rebuilt in Flax (NHWC, TPU-first).

Covers the behavior of the reference's vendored DINOv2
(`dinov2_source/vision_transformer.py`, `dinov2_source/layers/`): conv
patchify (`layers/patch_embed.py:26-84`), cls token + bicubically
interpolated position embeddings (`vision_transformer.py:165-189`), pre-LN
blocks with LayerScale (`layers/layer_scale.py:16-28`) and per-sample
stochastic depth (`layers/block.py:36-107`), MLP or SwiGLU FFN
(`layers/swiglu_ffn.py:13-33`), and `forward_features` returning the
normalized cls + patch tokens (`vision_transformer.py:221-236`).

TPU-first: layers run under `nn.scan` with stacked params (jax attention
einsums on the MXU replace xformers memory_efficient_attention — at ViT-B/14
on 512^2 inputs the 1370-token sequences are comfortably XLA-fusible).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array

trunc_init = nn.initializers.truncated_normal(stddev=0.02)


class ViTBlock(nn.Module):
    """Pre-LN block with LayerScale + drop-path, as an nn.scan body."""

    dim: int
    num_heads: int
    mlp_ratio: float
    ffn_layer: str          # "mlp" | "swiglu"
    init_values: Optional[float]
    dtype: Any
    deterministic: bool = True

    @nn.compact
    def __call__(self, carry, per_layer):
        x = carry
        (dpr,) = per_layer
        d = self.dim
        h = self.num_heads

        def drop_path(v, rng_name):
            if self.deterministic:
                return v
            keep = 1.0 - dpr
            rng = self.make_rng("droppath")
            shape = (v.shape[0],) + (1,) * (v.ndim - 1)
            mask = jax.random.bernoulli(rng, keep, shape).astype(v.dtype)
            return v / keep * mask

        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        qkv = nn.Dense(3 * d, dtype=self.dtype, kernel_init=trunc_init,
                       name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, n, _ = q.shape
        dh = d // h
        q = q.reshape(b, n, h, dh)
        k = k.reshape(b, n, h, dh)
        v = v.reshape(b, n, h, dh)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) / np.sqrt(dh)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, n, d)
        attn = nn.Dense(d, dtype=self.dtype, kernel_init=trunc_init,
                        name="proj")(ctx)
        if self.init_values is not None:
            gamma1 = self.param("ls1", nn.initializers.constant(
                self.init_values), (d,))
            attn = attn * gamma1.astype(attn.dtype)
        x = x + drop_path(attn, "dp1")

        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        hidden = int(d * self.mlp_ratio)
        if self.ffn_layer == "swiglu":
            hidden = (int(hidden * 2 / 3) + 7) // 8 * 8
            w12 = nn.Dense(2 * hidden, dtype=self.dtype,
                           kernel_init=trunc_init, name="w12")(y)
            a, bgate = jnp.split(w12, 2, axis=-1)
            y = nn.Dense(d, dtype=self.dtype, kernel_init=trunc_init,
                         name="w3")(nn.silu(a) * bgate)
        else:
            y = nn.Dense(hidden, dtype=self.dtype, kernel_init=trunc_init,
                         name="fc1")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(d, dtype=self.dtype, kernel_init=trunc_init,
                         name="fc2")(y)
        if self.init_values is not None:
            gamma2 = self.param("ls2", nn.initializers.constant(
                self.init_values), (d,))
            y = y * gamma2.astype(y.dtype)
        x = x + drop_path(y, "dp2")
        return x, None


def interpolate_pos_embed(pos_embed: Array, n_patches: int, w: int, h: int,
                          patch_size: int) -> Array:
    """Bicubic pos-embed interpolation for off-grid input sizes
    (ref `vision_transformer.py:165-189`)."""
    n = pos_embed.shape[1] - 1
    if n_patches == n and w == h:
        return pos_embed
    cls_pe = pos_embed[:, :1]
    patch_pe = pos_embed[:, 1:]
    dim = pos_embed.shape[-1]
    m = int(math.sqrt(n))
    w0 = w // patch_size
    h0 = h // patch_size
    grid = patch_pe.reshape(1, m, m, dim)
    grid = jax.image.resize(grid, (1, w0, h0, dim), method="bicubic")
    return jnp.concatenate([cls_pe, grid.reshape(1, w0 * h0, dim)], axis=1)


class DinoViT(nn.Module):
    """DINOv2-style ViT; `__call__` == reference `forward_features`."""

    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    ffn_layer: str = "mlp"
    init_values: Optional[float] = 1.0
    drop_path_rate: float = 0.0
    dtype_str: str = "float32"
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: Array) -> dict:
        dtype = jnp.bfloat16 if self.dtype_str == "bfloat16" \
            else jnp.float32
        b, h, w, _ = x.shape
        p = self.patch_size
        d = self.embed_dim
        x = nn.Conv(d, (p, p), strides=(p, p), padding="VALID",
                    dtype=dtype, name="patch_embed")(x.astype(dtype))
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, d)

        cls_token = self.param("cls_token", trunc_init, (1, 1, d))
        n_base = (self.img_size // p) ** 2
        pos_embed = self.param("pos_embed", trunc_init,
                               (1, n_base + 1, d))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(dtype), (b, 1, d)), x],
            axis=1)
        pe = interpolate_pos_embed(pos_embed.astype(jnp.float32),
                                   gh * gw, w, h, p)
        x = x + pe.astype(dtype)

        dprs = jnp.asarray(
            np.linspace(0.0, self.drop_path_rate, self.depth), dtype)
        Scanned = nn.scan(
            ViTBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True, "droppath": True},
            in_axes=(((0,),)),
            length=self.depth)
        x, _ = Scanned(d, self.num_heads, self.mlp_ratio, self.ffn_layer,
                       self.init_values, dtype, self.deterministic,
                       name="blocks")(x, (dprs,))
        # x_prenorm is the token stream BEFORE the final LayerNorm
        # (ref `dinov2_source/vision_transformer.py:230-234`).
        x_prenorm = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=dtype, name="norm")(x)
        return {
            "x_norm_clstoken": x[:, 0],
            "x_norm_patchtokens": x[:, 1:],
            "x_prenorm": x_prenorm,
        }


def _variant(defaults: dict, kw: dict) -> DinoViT:
    return DinoViT(**{**defaults, **kw})


def vit_small(**kw) -> DinoViT:
    return _variant(dict(embed_dim=384, depth=12, num_heads=6), kw)


def vit_base(**kw) -> DinoViT:
    return _variant(dict(embed_dim=768, depth=12, num_heads=12), kw)


def vit_large(**kw) -> DinoViT:
    return _variant(dict(embed_dim=1024, depth=24, num_heads=16), kw)


def vit_giant2(**kw) -> DinoViT:
    return _variant(dict(embed_dim=1536, depth=40, num_heads=24,
                         ffn_layer="swiglu"), kw)
