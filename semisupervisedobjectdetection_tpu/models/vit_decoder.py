"""Token decoder for the ViT segmentation/autoencoder pipeline.

Rebuilds the behavior of the reference `models/ViT_Decoder.py` Decoder and
the `models/ViT_EncoderDecoder.py` glue: a depth-N transformer over
[cls + patch] tokens with its own (bicubically interpolated) position
embedding (`ViT_Decoder.py:129-153`), LayerScale blocks, and either a
linear patchify head (Linear dim -> p^2*C + unpatchify, `:102-108`) or a
ConvTranspose head with channel LayerNorm (`:110-117`). The encoder-decoder
losses: per-patch L1 (`ViT_EncoderDecoder.py:49-58`) and the re-encode
cycle loss (`:69-75`).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from semisupervisedobjectdetection_tpu.models.vit import (
    DinoViT,
    ViTBlock,
    interpolate_pos_embed,
    trunc_init,
)

Array = jax.Array


class TokenDecoder(nn.Module):
    """Transformer decoder over encoder tokens -> image."""

    img_size: Tuple[int, int] = (512, 512)
    patch_size: int = 14
    out_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    init_values: Optional[float] = 1e-5
    dtype_str: str = "float32"
    deterministic: bool = True
    needs_fc: bool = False

    @nn.compact
    def __call__(self, tokens: Array, linear_head: bool = True) -> Array:
        dtype = jnp.bfloat16 if self.dtype_str == "bfloat16" \
            else jnp.float32
        x = tokens.astype(dtype)
        b, n, d = x.shape
        p = self.patch_size
        gh = self.img_size[0] // p
        gw = self.img_size[1] // p

        if self.needs_fc:
            x = nn.Dense(d, dtype=dtype, name="fc1")(x)

        pos_embed = self.param("pos_embed", trunc_init,
                               (1, gh * gw + 1, self.embed_dim))
        pe = interpolate_pos_embed(pos_embed.astype(jnp.float32), n - 1,
                                   self.img_size[1], self.img_size[0], p)
        x = x + pe.astype(dtype)
        x = nn.LayerNorm(epsilon=1e-6, dtype=dtype, name="norm_token_pre")(x)

        dprs = jnp.zeros((self.depth,), dtype)
        Scanned = nn.scan(
            ViTBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True, "droppath": True},
            in_axes=(((0,),)),
            length=self.depth)
        x, _ = Scanned(self.embed_dim, self.num_heads, self.mlp_ratio,
                       "mlp", self.init_values, dtype, self.deterministic,
                       name="blocks")(x, (dprs,))
        x = nn.LayerNorm(epsilon=1e-6, dtype=dtype, name="norm_token")(x)
        x = x[:, 1:, :]  # drop cls (ref `ViT_Decoder.py:99`)

        if linear_head:
            # Linear patchify head + unpatchify (ref `:102-108`)
            x = nn.Dense(p * p * self.out_chans, dtype=dtype,
                         name="decoder_pred_linear")(x)
            x = x.reshape(b, gh, gw, p, p, self.out_chans)
            x = x.transpose(0, 1, 3, 2, 4, 5)
            x = x.reshape(b, gh * p, gw * p, self.out_chans)
        else:
            # ConvTranspose head + channel LayerNorm (ref `:110-117`)
            x = x.reshape(b, gh, gw, self.embed_dim)
            x = nn.ConvTranspose(self.out_chans, (p, p), strides=(p, p),
                                 dtype=dtype,
                                 name="decoder_pred_conv")(x)
            x = nn.LayerNorm(epsilon=1e-6, dtype=dtype,
                             name="norm_image")(x)
        return x.astype(jnp.float32)


class ViTEncoderDecoder(nn.Module):
    """Glue: DINOv2 features -> [cls|patch] token stream -> decoder
    (ref `ViT_EncoderDecoder.py:30-41`)."""

    encoder: DinoViT
    decoder: TokenDecoder

    def encode(self, images: Array) -> Array:
        feats = self.encoder(images)
        cls = feats["x_norm_clstoken"][:, None, :]
        return jnp.concatenate([cls, feats["x_norm_patchtokens"]], axis=1)

    def __call__(self, images: Array, linear_head: bool = True
                 ) -> Tuple[Array, Array]:
        tokens = self.encode(images)
        out = self.decoder(tokens, linear_head)
        return out, tokens


def patch_loss(pred: Array, target: Array, patch_size: int) -> Array:
    """Per-patch L1 (ref `ViT_EncoderDecoder.py:49-58`): flatten to
    (B, n_patches, p*p*C), |diff| mean over the patch dim, divided by the
    patch count, summed."""
    def flatten(x):
        b, h, w, c = x.shape
        gh, gw = h // patch_size, w // patch_size
        x = x.reshape(b, gh, patch_size, gw, patch_size, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, gh * gw, patch_size * patch_size * c)

    p = flatten(pred.astype(jnp.float32))
    t = flatten(target.astype(jnp.float32))
    n_patches = p.shape[1]
    per_patch = jnp.mean(jnp.abs(p - t), axis=-1) / n_patches
    return jnp.sum(per_patch)


def cycle_loss(encode_fn, pred_images: Array,
               original_tokens: Array) -> Array:
    """Re-encode the reconstruction and L1 against the original tokens
    (ref `ViT_EncoderDecoder.py:69-75`)."""
    re_tokens = encode_fn(pred_images)
    return jnp.sum(jnp.mean(jnp.abs(re_tokens - original_tokens), axis=-1))
