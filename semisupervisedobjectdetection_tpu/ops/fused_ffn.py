"""Fused MixFFN (dense1 -> 3x3 depthwise conv -> GELU -> dense2) as Pallas
TPU kernels with a custom VJP.

Motivation (profiled on MiT-B5 @512, batch 16, v5e): the stage-3 backward
scan spends ~1.28 ms/layer in the FFN — 6 near-roofline matmuls PLUS ~0.6
ms of glue XLA cannot fuse away (f32 depthwise weight-grad conv at
263us/layer, bias-grad reduction fusions, gelu backward, and layout copies
between the token-major matmuls and the NHWC depthwise conv). The fused
kernels keep the whole chain in VMEM per image:

  forward:  h1 = x W1 + b1; d = dwconv3x3(h1) + bk; a = gelu(d)
            out = a W2 + b2                                (per image tile)
  backward: recompute h1, d, a;  da = g W2^T;  dW2 += a^T g;  db2 += sum g
            dd = da * gelu'(d);  dbk += sum dd; dk[t] += sum h1[p+t] dd[p]
            dh1 = conv_flip(dd); db1 += sum dh1; dW1 += x^T dh1
            dx = dh1 W1^T

The depthwise conv uses the flat-token formulation from ops/dwconv.py
(sublane shifts + border-column masks — no NHWC layout change); matmuls
run on the MXU with f32 accumulation; dW1/dW2/dk/db* accumulate in f32
VMEM across the (innermost) batch grid axis. Parity vs the XLA chain is
tested in tests/test_fused_ffn.py.

STATUS: CPU-parity-verified; taps are statically unrolled (Mosaic
rejects dynamic sublane offsets that are not provably 8-aligned, and the
horizontal +-1 token shift cannot be). An early compile of this kernel
appeared to wedge the remote axon compile service (see CLAUDE.md); the
service has since been observed failing fast instead.

Reference math: `modeling_segformer.py:283-317` (SegformerMixFFN).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_SQRT_2_OVER_PI = float(np.sqrt(2.0 / np.pi))
_INV_SQRT2 = float(1.0 / np.sqrt(2.0))
_INV_SQRT_2PI = float(1.0 / np.sqrt(2.0 * np.pi))


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _gelu(z, approx: bool):
    if approx:
        u = _SQRT_2_OVER_PI * (z + 0.044715 * z * z * z)
        return 0.5 * z * (1.0 + jnp.tanh(u))
    return 0.5 * z * (1.0 + jax.lax.erf(z * _INV_SQRT2))


def _gelu_grad(z, approx: bool):
    if approx:
        u = _SQRT_2_OVER_PI * (z + 0.044715 * z * z * z)
        t = jnp.tanh(u)
        du = _SQRT_2_OVER_PI * (1.0 + 3.0 * 0.044715 * z * z)
        return 0.5 * (1.0 + t) + 0.5 * z * (1.0 - t * t) * du
    cdf = 0.5 * (1.0 + jax.lax.erf(z * _INV_SQRT2))
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * z * z)
    return cdf + z * pdf


def _col_masks(n: int, w: int):
    col = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) % w
    return col != 0, col != (w - 1)


def _colsum(x32):
    """Column sum as a (1, n) x (n, m) MXU dot — a cross-sublane
    jnp.sum(axis=0) lowers to a slow VPU reduction tree (~250us for
    (1024, 1280) f32); the MXU does it in single-digit us."""
    ones = jnp.ones((1, x32.shape[0]), jnp.float32)
    return jax.lax.dot_general(ones, x32, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _tap_read(pad_ref, n: int, w: int, dy: int, dx: int, not_l, not_r,
              flip: bool):
    """Read one shifted tap (static offsets — Mosaic requires dynamic
    sublane offsets to be 8-aligned, which the +-1 horizontal shift can
    never be) from the zero-padded flat-token buffer, with the border-
    column mask (mask sides swap for the flipped/backward correlation)."""
    sign = -1 if flip else 1
    o = w + 1 + sign * (dy * w + dx)
    t = pad_ref[o:o + n, :].astype(jnp.float32)
    lmask, rmask = (dx == 1, dx == -1) if flip else (dx == -1, dx == 1)
    if lmask:
        t = jnp.where(not_l, t, 0.0)
    if rmask:
        t = jnp.where(not_r, t, 0.0)
    return t


def _dw_fwd(pad_ref, k_ref, n: int, w: int, not_l, not_r):
    """9-tap depthwise conv from a zero-padded (n + 2w + 2, m) buffer
    (statically unrolled taps — see _tap_read)."""
    acc = None
    for i in range(9):
        dy, dx = i // 3 - 1, i % 3 - 1
        t = _tap_read(pad_ref, n, w, dy, dx, not_l, not_r, flip=False)
        term = t * k_ref[dy + 1, dx + 1, :].astype(jnp.float32)
        acc = term if acc is None else acc + term
    return acc


def _ffn_fwd_kernel(x_ref, w1_ref, b1_ref, k_ref, bk_ref, w2_ref, b2_ref,
                    o_ref, pad, *, h: int, w: int, approx: bool):
    n = x_ref.shape[1]
    x = x_ref[0]
    h1 = jax.lax.dot_general(x, w1_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    h1 = (h1 + b1_ref[0].astype(jnp.float32)).astype(x.dtype)
    pad[:] = jnp.zeros(pad.shape, pad.dtype)
    pad[w + 1:w + 1 + n, :] = h1
    not_l, not_r = _col_masks(n, w)
    d = _dw_fwd(pad, k_ref, n, w, not_l, not_r) \
        + bk_ref[0].astype(jnp.float32)
    a = _gelu(d, approx).astype(x.dtype)
    out = jax.lax.dot_general(a, w2_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0] = (out + b2_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def _ffn_bwd_kernel(x_ref, g_ref, w1_ref, b1_ref, k_ref, bk_ref, w2_ref,
                    dx_ref, dw1_ref, db1_ref, dk_ref, dbk_ref, dw2_ref,
                    db2_ref, pad, *, h: int, w: int, approx: bool):
    n = x_ref.shape[1]
    x = x_ref[0]
    g = g_ref[0]
    not_l, not_r = _col_masks(n, w)

    # Recompute h1, d, a (full remat wraps the layer anyway — cheaper to
    # re-derive in VMEM than to round-trip 42MB/layer through HBM).
    h1 = jax.lax.dot_general(x, w1_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    h1 = (h1 + b1_ref[0].astype(jnp.float32)).astype(x.dtype)
    pad[:] = jnp.zeros(pad.shape, pad.dtype)
    pad[w + 1:w + 1 + n, :] = h1
    d = _dw_fwd(pad, k_ref, n, w, not_l, not_r) \
        + bk_ref[0].astype(jnp.float32)
    a = _gelu(d, approx).astype(x.dtype)

    # dense2 grads.
    g32 = g.astype(jnp.float32)
    da = jax.lax.dot_general(g, w2_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dw2 = jax.lax.dot_general(a, g, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db2 = _colsum(g32)

    # GELU.
    dd = (da * _gelu_grad(d, approx)).astype(x.dtype)
    dd32 = dd.astype(jnp.float32)
    dbk = _colsum(dd32)

    # Depthwise conv grads: dk via fwd-mask taps of h1 against dd; dh1 via
    # flipped taps of dd (masks swap sides — see ops/dwconv.py). Both tap
    # groups run as fori_loops (see _tap_read).
    m = pad.shape[-1]
    taps = []
    for i in range(9):
        dy, dx = i // 3 - 1, i % 3 - 1
        t = _tap_read(pad, n, w, dy, dx, not_l, not_r, flip=False)
        taps.append(_colsum(t * dd32)[0])
    dk = jnp.stack(taps).reshape(3, 3, m)

    pad[:] = jnp.zeros(pad.shape, pad.dtype)
    pad[w + 1:w + 1 + n, :] = dd

    dh1 = None
    for i in range(9):
        dy, dx = i // 3 - 1, i % 3 - 1
        t = _tap_read(pad, n, w, dy, dx, not_l, not_r, flip=True)
        term = t * k_ref[dy + 1, dx + 1, :].astype(jnp.float32)
        dh1 = term if dh1 is None else dh1 + term
    dh1 = dh1.astype(x.dtype)

    # dense1 grads + input grad.
    db1 = _colsum(dh1.astype(jnp.float32))
    dw1 = jax.lax.dot_general(x, dh1, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dx_ref[0] = jax.lax.dot_general(
        dh1, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)

    # Per-step partial weight grads (summed over the batch OUTSIDE the
    # kernel by XLA): revisited accumulator output blocks disable Mosaic's
    # output pipelining — every grid step serializes on a blocking
    # read-modify-write of the shared block (~ms/step measured).
    dw1_ref[0] = dw1
    db1_ref[0] = db1
    dk_ref[0] = dk
    dbk_ref[0] = dbk
    dw2_ref[0] = dw2
    db2_ref[0] = db2


def fused_fits(h: int, w: int, c: int, m: int) -> bool:
    """VMEM feasibility of the fused kernels for one stage: the backward
    holds ~6 f32 (n, m) temporaries plus the padded tile and io blocks.
    Stage 1 of a 512 input (n=16384) exceeds the budget and must use the
    unfused XLA chain."""
    n = h * w
    need = n * m * 4 * 6 + (n + 2 * w + 2) * m * 2 + n * c * 2 * 4
    return need <= 85 * 1024 * 1024 and (h * w) % 8 == 0


def _full(shape):
    return pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _per_b(shape):
    """Output block indexed by the batch grid step (leading axis 1)."""
    return pl.BlockSpec((1,) + shape,
                        lambda b: (b,) + tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _fwd_impl(x, w1, b1, k, bk, w2, b2, h, w, approx):
    bsz, n, c = x.shape
    m = w1.shape[1]
    return pl.pallas_call(
        functools.partial(_ffn_fwd_kernel, h=h, w=w, approx=approx),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            _full((c, m)), _full((1, m)), _full((3, 3, m)), _full((1, m)),
            _full((m, c)), _full((1, c)),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((n + 2 * w + 2, m), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n * c * m * 2 + 18 * bsz * n * m,
            bytes_accessed=2 * bsz * n * c * 2 + 2 * (2 * c * m),
            transcendentals=bsz * n * m),
        interpret=_interpret(),
    )(x, w1, b1.reshape(1, m), k, bk.reshape(1, m), w2, b2.reshape(1, c))


def _bwd_impl(x, g, w1, b1, k, bk, w2, h, w, approx):
    bsz, n, c = x.shape
    m = w1.shape[1]
    xspec = pl.BlockSpec((1, n, c), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_ffn_bwd_kernel, h=h, w=w, approx=approx),
        grid=(bsz,),
        in_specs=[xspec, xspec, _full((c, m)), _full((1, m)),
                  _full((3, 3, m)), _full((1, m)), _full((m, c))],
        out_specs=(xspec, _per_b((c, m)), _per_b((1, m)),
                   _per_b((3, 3, m)), _per_b((1, m)), _per_b((m, c)),
                   _per_b((1, c))),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, n, c), x.dtype),
            jax.ShapeDtypeStruct((bsz, c, m), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, m), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 3, 3, m), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, m), jnp.float32),
            jax.ShapeDtypeStruct((bsz, m, c), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((n + 2 * w + 2, m), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n * c * m * 5 + 40 * bsz * n * m,
            bytes_accessed=3 * bsz * n * c * 2 + 4 * c * m,
            transcendentals=bsz * n * m),
        interpret=_interpret(),
    )(x, g, w1, b1.reshape(1, m), k, bk.reshape(1, m), w2)
    dx, dw1p, db1p, dkp, dbkp, dw2p, db2p = outs
    # Batch-sum the per-step partials (cheap XLA reductions; keeps every
    # kernel output block per-grid-step so Mosaic pipelines the DMA).
    return (dx, dw1p.sum(0), db1p.sum(0).reshape(m), dkp.sum(0),
            dbkp.sum(0).reshape(m), dw2p.sum(0), db2p.sum(0).reshape(c))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_ffn(x: Array, w1: Array, b1: Array, k: Array, bk: Array,
              w2: Array, b2: Array, h: int, w: int,
              approx: bool = False) -> Array:
    """MixFFN on (B, H*W, C) tokens: gelu(dwconv(x W1 + b1) + bk) W2 + b2.

    w1: (C, M); k: (3, 3, M) depthwise; w2: (M, C). Matches the XLA chain
    dense1 -> NHWC dwconv -> gelu -> dense2 (ref modeling_segformer.py:
    283-317) without leaving token layout.
    """
    return _fwd_impl(x, w1, b1, k, bk, w2, b2, h, w, approx)


def _vjp_fwd(x, w1, b1, k, bk, w2, b2, h, w, approx):
    return fused_ffn(x, w1, b1, k, bk, w2, b2, h, w, approx), \
        (x, w1, b1, k, bk, w2)


def _vjp_bwd(h, w, approx, res, g):
    x, w1, b1, k, bk, w2 = res
    dx, dw1, db1, dk, dbk, dw2, db2 = _bwd_impl(
        x, g, w1, b1, k, bk, w2, h, w, approx)
    return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dk.astype(k.dtype), dbk.astype(bk.dtype),
            dw2.astype(w2.dtype), db2.astype(b1.dtype))


fused_ffn.defvjp(_vjp_fwd, _vjp_bwd)


def xla_ffn(x, w1, b1, k, bk, w2, b2, h, w, approx=False):
    """XLA reference chain (test oracle), mirroring MixFFN's lowering."""
    bsz, n, c = x.shape
    m = w1.shape[1]
    h1 = (x @ w1 + b1).reshape(bsz, h, w, m)
    d = jax.lax.conv_general_dilated(
        h1, k.reshape(3, 3, 1, m), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=m) + bk
    a = jax.nn.gelu(d.reshape(bsz, n, m).astype(jnp.float32),
                    approximate=approx).astype(x.dtype)
    return a @ w2 + b2
