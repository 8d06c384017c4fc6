"""3x3 depthwise convolution on token-major layout as Pallas TPU kernels.

SegFormer's MixFFN applies a 3x3 depthwise conv between the two FFN denses
(ref `modeling_segformer.py:283-317`). Under XLA this forces the sequence
stream (B, N, C) through NHWC layout copies on every layer (the profiler
shows ~5ms/step of pure copies in the MiT-B5 stage-3 backward scan), and
the depthwise weight-gradient lowers to an f32 conv with a HxW-sized kernel
(263us/layer at stage 3, ~2.5x the bandwidth bound).

These kernels instead treat x as (B, H*W, C) directly — the layout the
surrounding matmuls already use, so XLA inserts NO transposes — and express
the conv as 9 shifted multiply-accumulates over a zero-padded VMEM tile:

  forward:  y[p] = bias + sum_t x[p + t - 1] * k[t]       (f32 accum)
  backward: dx[p] = sum_t g[p - t + 1] * k[t]             (flipped taps)
            dk[t] = sum_p g[p] * x[p + t - 1]             (f32, over batch)
            db    = sum_p g[p]

Grid is (channel_blocks, batch) with batch innermost so dk/db accumulate
into a revisited output block (TPU grid iterations are sequential). The
channel block size is chosen to fit padded x/g tiles + f32 accumulators in
VMEM; shapes whose fit would drop below 64 lanes (e.g. stage 1's 128x128
maps) fall back to XLA's conv, which is near-bandwidth-bound there.

Numerics match XLA's depthwise conv (bf16 inputs, f32 accumulation); grads
are exact (the op is linear in x and k). Parity is tested against
`nn.Conv(feature_group_count=C)` in tests/test_dwconv.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_VMEM_BUDGET = 10 * 1024 * 1024


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _cblock(h: int, w: int, c: int, *, bwd: bool) -> int:
    """Largest channel block whose working set fits the VMEM budget.

    TPU lowering requires the block's last (lane) dim be a multiple of 128
    or the full array dim, so candidates are 128·2^k divisors of c plus c
    itself. Returns 0 when nothing fits (caller falls back to XLA)."""
    pad_bytes = (h * w + 2 * w + 2) * 2            # one padded bf16 tile (shared)
    acc_bytes = h * w * 4                      # one f32 accumulator
    io_bytes = h * w * 2 * 2                   # one in/out block, dbl-buffered
    per_c = pad_bytes + acc_bytes + io_bytes * (3 if bwd else 2)
    cands = {c} | {m for m in (128, 256, 512, 1024, 2048)
                   if m <= c and c % m == 0}
    fits = [cb for cb in cands if cb * per_c <= _VMEM_BUDGET]
    return max(fits) if fits else 0


def _col_masks(n: int, w: int):
    """(n, 1) masks for tokens on the left/right image border: a flat-token
    shift of ±1 wraps across rows, so those taps must contribute zero."""
    col = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) % w
    return col != 0, col != (w - 1)


def _colsum(x32):
    """Column sum as an MXU dot (cross-sublane VPU reductions are slow)."""
    ones = jnp.ones((1, x32.shape[0]), jnp.float32)
    return jax.lax.dot_general(ones, x32, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _fwd_kernel(x_ref, k_ref, b_ref, o_ref, xp, *, h: int, w: int):
    """2D formulation: the (H, W) neighborhood becomes flat-token sublane
    shifts of dy*w + dx on an (n + 2w, cb) zero-padded buffer, with border
    columns masked — every access is a well-tiled 2D slice."""
    n, cb = x_ref.shape[1], x_ref.shape[2]
    xp[:] = jnp.zeros(xp.shape, xp.dtype)
    xp[w + 1:w + 1 + n, :] = x_ref[0]
    not_l, not_r = _col_masks(n, w)
    acc = jnp.broadcast_to(b_ref[0].astype(jnp.float32), (n, cb))
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            o = w + 1 + dy * w + dx
            t = xp[o:o + n, :]
            t = t.astype(jnp.float32)
            if dx == -1:
                t = jnp.where(not_l, t, 0.0)
            elif dx == 1:
                t = jnp.where(not_r, t, 0.0)
            acc = acc + t * k_ref[dy + 1, dx + 1, :].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def _bwd_kernel(x_ref, g_ref, k_ref, dx_ref, dk_ref, db_ref, pad,
                *, h: int, w: int):
    n, cb = x_ref.shape[1], x_ref.shape[2]
    not_l, not_r = _col_masks(n, w)

    # Phase 1 — pad holds the cotangent: dx[p] = sum_t g[p - t] k[t].
    # A tap (dy, dx) read from g at p - dy*w - dx is valid iff the source
    # column col(p) - dx stays in-row: mask not_l for dx=+1, not_r for -1.
    pad[:] = jnp.zeros(pad.shape, pad.dtype)
    g = g_ref[0]
    pad[w + 1:w + 1 + n, :] = g
    g32 = g.astype(jnp.float32)

    dxa = jnp.zeros((n, cb), jnp.float32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            o = w + 1 - dy * w - dx
            t = pad[o:o + n, :]
            t = t.astype(jnp.float32)
            if dx == 1:
                t = jnp.where(not_l, t, 0.0)
            elif dx == -1:
                t = jnp.where(not_r, t, 0.0)
            dxa = dxa + t * k_ref[dy + 1, dx + 1, :].astype(jnp.float32)
    dx_ref[0] = dxa.astype(dx_ref.dtype)

    # Phase 2 — pad re-holds x: dk[t] = sum_p g[p] x[p + t] (fwd masks),
    # db = sum_p g[p]; both accumulated across the (innermost) batch axis.
    pad[:] = jnp.zeros(pad.shape, pad.dtype)
    pad[w + 1:w + 1 + n, :] = x_ref[0]
    taps = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            o = w + 1 + dy * w + dx
            t = pad[o:o + n, :]
            t = t.astype(jnp.float32)
            if dx == -1:
                t = jnp.where(not_l, t, 0.0)
            elif dx == 1:
                t = jnp.where(not_r, t, 0.0)
            taps.append(_colsum(t * g32)[0])
    dk = jnp.stack(taps).reshape(3, 3, cb)
    db = _colsum(g32)

    # Per-step partials (summed over batch outside): a revisited
    # accumulator output block serializes Mosaic's DMA pipeline.
    dk_ref[0] = dk
    db_ref[0] = db


def _fwd_impl(x: Array, kernel: Array, bias: Array, h: int, w: int) -> Array:
    bsz, n, c = x.shape
    cb = _cblock(h, w, c, bwd=False)
    grid = (c // cb, bsz)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((bsz, n, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n, cb), lambda i, b: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cb), lambda i, b: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb), lambda i, b: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, cb), lambda i, b: (b, 0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((h * w + 2 * w + 2, cb), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * bsz * n * c,
            bytes_accessed=2 * bsz * n * c * x.dtype.itemsize,
            transcendentals=0),
        interpret=_interpret(),
    )(x, kernel, bias.reshape(1, c))


def _bwd_impl(x: Array, kernel: Array, g: Array, h: int, w: int):
    bsz, n, c = x.shape
    cb = _cblock(h, w, c, bwd=True)
    grid = (c // cb, bsz)
    dx, dk, db = pl.pallas_call(
        functools.partial(_bwd_kernel, h=h, w=w),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, n, c), x.dtype),
            jax.ShapeDtypeStruct((bsz, 3, 3, c), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n, cb), lambda i, b: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, cb), lambda i, b: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cb), lambda i, b: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n, cb), lambda i, b: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 3, cb), lambda i, b: (b, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cb), lambda i, b: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((h * w + 2 * w + 2, cb), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * bsz * n * c * 3,
            bytes_accessed=3 * bsz * n * c * x.dtype.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(x, g, kernel)
    return dx, dk.sum(0), db.sum(0).reshape(c)


def _xla_dwconv(x: Array, kernel: Array, bias: Array, h: int, w: int
                ) -> Array:
    bsz, n, c = x.shape
    y = jax.lax.conv_general_dilated(
        x.reshape(bsz, h, w, c), kernel.reshape(3, 3, 1, c),
        window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    return (y + bias).reshape(bsz, n, c)


def pallas_fits(h: int, w: int, c: int) -> bool:
    """True when the Pallas path supports this shape (VMEM fit)."""
    return _cblock(h, w, c, bwd=True) > 0 and (h * w) % 8 == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def dwconv3x3(x: Array, kernel: Array, bias: Array, h: int, w: int) -> Array:
    """3x3 same-padding depthwise conv on (B, H*W, C) tokens.

    kernel: (3, 3, C); bias: (C,). Equivalent to the reference MixFFN's
    `nn.Conv2d(dim, dim, 3, padding=1, groups=dim)` on the NHWC view
    (ref `modeling_segformer.py:283-294`) without leaving token layout.
    """
    if not pallas_fits(h, w, c=x.shape[-1]):
        return _xla_dwconv(x, kernel, bias, h, w)
    return _fwd_impl(x, kernel, bias, h, w)


def _vjp_fwd(x, kernel, bias, h, w):
    return dwconv3x3(x, kernel, bias, h, w), (x, kernel)


def _vjp_bwd(h, w, res, g):
    x, kernel = res
    if not pallas_fits(h, w, c=x.shape[-1]):
        _, vjp = jax.vjp(
            lambda xx, kk, bb: _xla_dwconv(xx, kk, bb, h, w),
            x, kernel, jnp.zeros((x.shape[-1],), kernel.dtype))
        return vjp(g)
    dx, dk, db = _bwd_impl(x, kernel, g, h, w)
    return dx, dk.astype(kernel.dtype), db.astype(kernel.dtype)


dwconv3x3.defvjp(_vjp_fwd, _vjp_bwd)
