"""Device-side fused augmentation (jitted, static shapes).

Reimplements the reference's albumentations chain (`config.py:27-38`):
  RandomCrop(500,500) ->
  OneOf([HorizontalFlip, VerticalFlip, RandomRotate90], p=0.75) ->
  Normalize(mean=0, std=255, max_pixel_value=1)  (i.e. x/255) ->
  Resize(512,512)
plus the post-transform mask min-max binarization
(`archaeological_georgia_biostyle_dataloader.py:89-90`).

TPU-first: the host ships fixed-size uint8 canvases; crop offsets and the
one-of op selection are per-sample `jax.random` draws inside one jitted,
vmapped kernel, so augmentation fuses with the /255 normalize and bilinear
resize and HBM only ever sees uint8 input. OneOf probabilities match
albumentations semantics: with p=0.75 one of {hflip, vflip, rot90(k~U{0..3})}
is chosen uniformly, else identity.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _rot90_k(x: Array, k: Array) -> Array:
    """rot90 by a traced k in {0,1,2,3} (square spatial dims, HWC or HW)."""
    return jax.lax.switch(
        k,
        [lambda a: a,
         lambda a: jnp.rot90(a, 1, axes=(0, 1)),
         lambda a: jnp.rot90(a, 2, axes=(0, 1)),
         lambda a: jnp.rot90(a, 3, axes=(0, 1))],
        x)


def _one_of(rng, img: Array, mask: Optional[Array], prob: float):
    r_apply, r_op, r_k = jax.random.split(rng, 3)
    apply = jax.random.bernoulli(r_apply, prob)
    op = jax.random.randint(r_op, (), 0, 3)
    k = jax.random.randint(r_k, (), 1, 4)  # RandomRotate90 draws k; k=0 folded
    # branch index: 0=identity, 1=hflip, 2=vflip, 3=rot90(k)
    branch = jnp.where(apply, op + 1, 0)
    # RandomRotate90 picks k in {0..3}; fold its k=0 case into identity by
    # drawing k in {1..3} and adding 1/4 of rot90 mass to identity.
    r_id = jax.random.uniform(jax.random.fold_in(rng, 7), ())
    branch = jnp.where((branch == 3) & (r_id < 0.25), 0, branch)

    def apply_op(x, flip_axis_ok=True):
        return jax.lax.switch(
            branch,
            [lambda a: a,
             lambda a: jnp.flip(a, axis=1),   # horizontal = flip width
             lambda a: jnp.flip(a, axis=0),   # vertical = flip height
             lambda a: _rot90_k(a, k)],
            x)

    img = apply_op(img)
    if mask is not None:
        mask = apply_op(mask)
    return img, mask


def _resize_img(x: Array, hw: Tuple[int, int]) -> Array:
    return jax.image.resize(x, (hw[0], hw[1], x.shape[-1]), method="bilinear")


def _resize_mask(x: Array, hw: Tuple[int, int]) -> Array:
    return jax.image.resize(x, (hw[0], hw[1]), method="nearest")


def _augment_sample(rng, img_u8: Array, mask: Optional[Array],
                    crop: int, out_hw: Tuple[int, int], prob: float):
    h0, w0 = img_u8.shape[0], img_u8.shape[1]
    r_crop, r_op = jax.random.split(rng)
    oy = jax.random.randint(r_crop, (), 0, h0 - crop + 1)
    ox = jax.random.randint(jax.random.fold_in(r_crop, 1), (), 0,
                            w0 - crop + 1)
    img = jax.lax.dynamic_slice(img_u8, (oy, ox, 0), (crop, crop, 3))
    if mask is not None:
        mask = jax.lax.dynamic_slice(mask, (oy, ox), (crop, crop))
    img, mask = _one_of(r_op, img, mask, prob)
    img = img.astype(jnp.float32) / 255.0
    img = _resize_img(img, out_hw)
    if mask is not None:
        mask = _resize_mask(mask.astype(jnp.float32), out_hw)
        # Post-transform min-max binarization
        # (`archaeological_georgia_biostyle_dataloader.py:89-90`), guarded
        # against constant masks (the reference would emit NaN there).
        mn, mx = jnp.min(mask), jnp.max(mask)
        mask = jnp.where(mx > mn, (mask - mn) / jnp.maximum(mx - mn, 1e-8),
                         jnp.zeros_like(mask))
    return img, mask


@functools.partial(jax.jit, static_argnames=("crop", "out_h", "out_w",
                                             "prob", "with_mask"))
def augment_batch(rng, images_u8: Array, masks: Optional[Array] = None, *,
                  crop: int = 500, out_h: int = 512, out_w: int = 512,
                  prob: float = 0.75, with_mask: bool = True):
    """Fused train-time augmentation for a uint8 batch.

    images_u8: (B, H0, W0, 3) uint8; masks: (B, H0, W0) any numeric dtype.
    Returns (images f32 in [0,1] NHWC at (out_h,out_w), masks f32 {0,1}).
    """
    b = images_u8.shape[0]
    rngs = jax.random.split(rng, b)
    if with_mask and masks is not None:
        return jax.vmap(
            lambda r, i, m: _augment_sample(r, i, m, crop, (out_h, out_w),
                                            prob))(rngs, images_u8, masks)
    imgs, _ = jax.vmap(
        lambda r, i: _augment_sample(r, i, None, crop, (out_h, out_w),
                                     prob))(rngs, images_u8)
    return imgs, None


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "with_mask"))
def eval_batch(images_u8: Array, masks: Optional[Array] = None, *,
               out_h: int = 512, out_w: int = 512, with_mask: bool = True):
    """Eval-time path: normalize + resize only (no random ops).

    The reference applies the SAME randomized chain at eval time
    (`config.py:27-38` is used for every flag) — a quirk we do not reproduce
    by default because it makes eval metrics stochastic; set
    `DataConfig.reference_eval_aug` (CLI `--reference-eval-aug`) to route
    eval batches through `augment_batch` and match the reference exactly.
    """
    imgs = images_u8.astype(jnp.float32) / 255.0
    b = imgs.shape[0]
    imgs = jax.image.resize(imgs, (b, out_h, out_w, imgs.shape[-1]),
                            method="bilinear")
    out_masks = None
    if with_mask and masks is not None:
        m = masks.astype(jnp.float32)
        m = jax.image.resize(m, (b, out_h, out_w), method="nearest")
        mn = jnp.min(m, axis=(1, 2), keepdims=True)
        mx = jnp.max(m, axis=(1, 2), keepdims=True)
        out_masks = jnp.where(mx > mn, (m - mn) / jnp.maximum(mx - mn, 1e-8),
                              jnp.zeros_like(m))
    return imgs, out_masks
