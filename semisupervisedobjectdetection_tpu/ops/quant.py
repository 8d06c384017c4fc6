"""Low-precision inference paths: int8 and fp8 weight quantization +
dynamic-activation low-precision matmul for the SegFormer dense layers.

TPU v5e executes int8 x int8 -> int32 on the MXU at ~2x the bf16 rate
(394 vs 197 TOPS), so for serving we quantize the dense kernels (q/k/v/
attention-out, MixFFN dense1/dense2, decode-head linear_c) per-output-
channel to int8 and quantize activations dynamically per-tensor at run
time. Convs (patch embeds, SR reduction, dwconv, classifier) stay in
bf16 — they are a small FLOP share and more accuracy-sensitive.

The fp8 variant (float8_e4m3fn kernels + activations, same per-channel /
per-token scaling) targets TPU generations with a native fp8 MXU (v6e+:
fp8 runs at the int8 rate there); on v5e and CPU, XLA upcasts fp8 inputs,
so the path is numerically exercised everywhere but only pays off on fp8
hardware. e4m3's ~2-bit mantissa keeps relative error near int8's while
the wide exponent removes the clip risk of symmetric int8 on
heavy-tailed activations.

No reference analogue (the reference serves f32 torch); this is a
TPU-serving addition. Accuracy is guarded by tests/test_quant.py
(kernel-level relative error and model-level mask agreement for both
widths).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def quantize_weight(w: Array) -> tuple[Array, Array]:
    """Per-output-channel symmetric int8 quantization of a (in, out)
    kernel. Returns (int8 kernel, f32 per-out-channel scale)."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale.astype(jnp.float32)


def int8_matmul(x: Array, wq: Array, wscale: Array) -> Array:
    """Dynamic-activation int8 matmul: x (..., in) f32/bf16 against an
    int8 kernel (in, out) with per-out-channel scales. Activations are
    quantized per-token (symmetric abs-max per row — an outlier token
    cannot degrade the rest of the batch); accumulation is int32 on the
    MXU; output dequantizes as xscale[row] * wscale[col]."""
    x32 = x.astype(jnp.float32)
    xmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    xscale = jnp.maximum(xmax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x32 / xscale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * xscale * wscale


# float8_e4m3fn finite max (jnp.finfo(float8_e4m3fn).max); the scale maps
# each channel's/token's abs-max onto it, mirroring int8's /127 mapping.
FP8_MAX = 448.0


def quantize_weight_fp8(w: Array) -> tuple[Array, Array]:
    """Per-output-channel symmetric fp8 (e4m3) quantization of an
    (in, out) kernel. Returns (fp8 kernel, f32 per-out-channel scale).
    The cast itself performs round-to-nearest-even; only the clip to the
    finite range is explicit."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(amax, 1e-8) / FP8_MAX
    q = jnp.clip(w.astype(jnp.float32) / scale, -FP8_MAX, FP8_MAX)
    return q.astype(jnp.float8_e4m3fn), scale.astype(jnp.float32)


def fp8_matmul(x: Array, wq: Array, wscale: Array) -> Array:
    """Dynamic-activation fp8 matmul: x (..., in) f32/bf16 against an fp8
    kernel (in, out) with per-out-channel scales. Activations scale
    per-token (abs-max per row) exactly like `int8_matmul`; accumulation
    is f32 (`preferred_element_type`), native-rate on fp8-MXU TPUs
    (v6e+), upcast-executed elsewhere."""
    x32 = x.astype(jnp.float32)
    xmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    xscale = jnp.maximum(xmax, 1e-8) / FP8_MAX
    xq = jnp.clip(x32 / xscale, -FP8_MAX, FP8_MAX).astype(
        jnp.float8_e4m3fn)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return acc * xscale * wscale


class QDense(nn.Module):
    """Drop-in for `nn.Dense` serving int8 weights.

    Param pytree: {kernel: int8 (in, out), kernel_scale: f32 (out,),
    bias: f32 (out,)} — produced from a trained f32 checkpoint by
    `quantize_dense_params`. Fresh `init` yields zero weights (the int8
    path is inference-only; training runs the f32/bf16 modules)."""

    features: int
    dtype: Any = jnp.float32
    kernel_init: Any = None    # signature parity with nn.Dense; unused
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", lambda key, shape: jnp.zeros(shape, jnp.int8),
            (in_features, self.features))
        scale = self.param("kernel_scale", nn.initializers.ones,
                           (self.features,))
        y = int8_matmul(x, kernel, scale)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            y = y + bias.astype(jnp.float32)
        return y.astype(self.dtype)


class F8Dense(nn.Module):
    """Drop-in for `nn.Dense` serving fp8 (e4m3) weights.

    Param pytree: {kernel: fp8 (in, out), kernel_scale: f32 (out,),
    bias: f32 (out,)} — produced from a trained f32 checkpoint by
    `quantize_dense_params(params, kind='fp8')`. Inference-only, like
    QDense."""

    features: int
    dtype: Any = jnp.float32
    kernel_init: Any = None    # signature parity with nn.Dense; unused
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            lambda key, shape: jnp.zeros(shape, jnp.float8_e4m3fn),
            (in_features, self.features))
        scale = self.param("kernel_scale", nn.initializers.ones,
                           (self.features,))
        y = fp8_matmul(x, kernel, scale)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            y = y + bias.astype(jnp.float32)
        return y.astype(self.dtype)


def quantize_dense_params(params: dict, kind: str = "int8") -> dict:
    """Convert a trained f32 SegFormer param tree into the low-precision
    serving tree: every 2-D `kernel` leaf (a Dense) becomes
    {kernel: int8|fp8, kernel_scale}; conv kernels (ndim != 2) and all
    other leaves pass through unchanged. Stacked scan params (leading
    layer axes with a trailing (in, out)) are quantized per layer via
    vmap. `kind` selects the width: 'int8' (QDense) or 'fp8'
    (F8Dense, e4m3)."""
    if kind not in ("int8", "fp8"):
        raise ValueError(f"kind must be 'int8' or 'fp8', got {kind!r}")
    quantizer = quantize_weight if kind == "int8" else quantize_weight_fp8

    def convert(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for name, leaf in tree.items():
            if isinstance(leaf, dict):
                out[name] = convert(leaf)
                continue
            if name == "kernel" and leaf.ndim >= 2 and _is_dense_kernel(
                    tree):
                q = quantizer
                for _ in range(leaf.ndim - 2):
                    q = jax.vmap(q)
                wq, scale = q(leaf)
                out["kernel"] = wq
                out["kernel_scale"] = scale
            else:
                out[name] = leaf
        return out

    def _is_dense_kernel(tree) -> bool:
        # Dense kernels are (in, out), or (depth, in, out) when stacked
        # by the per-stage scan. Conv kernels carry spatial dims and are
        # 4-D (unstacked) or 5-D (stacked) — never 2-D/3-D.
        return tree["kernel"].ndim in (2, 3)

    return convert(params)
