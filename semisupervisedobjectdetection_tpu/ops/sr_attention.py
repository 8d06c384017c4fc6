"""Fused sequence-reduction attention as a Pallas TPU kernel.

SegFormer's SR-attention (ref `modeling_segformer.py:207-230`) has a long
query stream (H*W tokens: 16k at stage 1 of a 512x512 input) attending to a
SHORT reduced key/value stream (~256 tokens + prompt prefix). Under plain
XLA the (B, heads, Nq, Nk) probability tensor round-trips HBM (134 MB per
stage-1 forward at batch 8); this kernel keeps scores/softmax in VMEM and
streams Q blocks, writing only the (Nq, head_dim) output.

Layout: the whole K/V block fits VMEM (Nk <= a few hundred), so no
flash-attention running-max streaming is needed — one softmax per Q tile
over the full key axis, masked over the padded key tail.

Backward: custom VJP recomputing scores with plain XLA einsums (the
forward dominates wall-clock: it runs again under remat plus in the
no-grad teacher passes). All matmuls accumulate in f32 on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, nk: int):
    """One (batch*head, q_block) tile: softmax(q k^T * scale) v.

    q_ref: (1, BQ, dh); k_ref/v_ref: (1, NKP, dh); o_ref: (1, BQ, dh)
    (leading axis is the batch*head grid dim of the block).
    Keys beyond `nk` are padding and masked to -inf before softmax.
    """
    q = q_ref[0]
    k = k_ref[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    nkp = k.shape[0]
    if nkp != nk:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < nk, scores, -1e30)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / l).astype(v_ref.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _split_heads(x: Array, h: int) -> Array:
    b, n, c = x.shape
    d = c // h
    return x.reshape(b, n, h, d).transpose(0, 2, 1, 3).reshape(b * h, n, d)


def _merge_heads(x: Array, b: int, h: int) -> Array:
    bh, n, d = x.shape
    return x.reshape(b, h, n, d).transpose(0, 2, 1, 3).reshape(b, n, h * d)


def _forward(q: Array, k: Array, v: Array, num_heads: int,
             block_q: int = 256) -> Array:
    b, nq, c = q.shape
    nk = k.shape[1]
    d = c // num_heads
    scale = 1.0 / np.sqrt(d)

    qh = _split_heads(q, num_heads)
    kh = _split_heads(k, num_heads)
    vh = _split_heads(v, num_heads)

    nkp = _round_up(nk, 128)
    if nkp != nk:
        pad = [(0, 0), (0, nkp - nk), (0, 0)]
        kh = jnp.pad(kh, pad)
        vh = jnp.pad(vh, pad)

    bq = min(block_q, _round_up(nq, 8))
    grid = (b * num_heads, pl.cdiv(nq, bq))

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkp, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkp, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * num_heads, nq, d), q.dtype),
        interpret=_interpret(),
    )(qh, kh, vh)
    return _merge_heads(out, b, num_heads)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float, nk: int, nq: int):
    """One (batch*head, q_block) tile of the attention backward.

    Recomputes the block's probabilities (k/v fit VMEM — no flash running
    max needed), then forms all gradients as MXU matmuls:
      dv += p^T g;  dp = g v^T;  ds = p * (dp - rowsum(dp * p)) * scale
      dq = ds k;    dk += ds^T q
    dk/dv accumulate into revisited output blocks across the (innermost)
    q-block grid axis — TPU grid iterations are sequential.
    """
    j = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    g = g_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    nkp = k.shape[0]
    if nkp != nk:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < nk, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)          # (bq, nkp) f32

    # Query rows beyond nq are block padding (uninitialized): they must not
    # contribute to the accumulated dk/dv, and any NaN they carry must be
    # replaced (where-select, since NaN * 0 == NaN).
    bq = q.shape[0]
    row = (jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
           + pl.program_id(1) * bq)
    valid = row < nq
    p = jnp.where(valid, p, 0.0)
    g = jnp.where(valid, g, 0.0)
    q = jnp.where(valid, q, jnp.zeros((), q.dtype))  # 0*NaN taints dk

    dv = jax.lax.dot_general(p, g, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(g, v_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
    ds = jnp.where(valid, ds, 0.0)
    dq = jax.lax.dot_general(ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)

    dq_ref[0] = dq.astype(dq_ref.dtype)

    @pl.when(j == 0)
    def _():
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv.astype(dv_ref.dtype)

    @pl.when(j != 0)
    def _():
        dk_ref[0] = dk_ref[0] + dk.astype(dk_ref.dtype)
        dv_ref[0] = dv_ref[0] + dv.astype(dv_ref.dtype)


def _backward(q: Array, k: Array, v: Array, g: Array, num_heads: int,
              block_q: int = 256):
    b, nq, c = q.shape
    nk = k.shape[1]
    d = c // num_heads
    scale = 1.0 / np.sqrt(d)

    qh = _split_heads(q, num_heads)
    kh = _split_heads(k, num_heads)
    vh = _split_heads(v, num_heads)
    gh = _split_heads(g, num_heads)

    nkp = _round_up(nk, 128)
    if nkp != nk:
        pad = [(0, 0), (0, nkp - nk), (0, 0)]
        kh = jnp.pad(kh, pad)
        vh = jnp.pad(vh, pad)

    bq = min(block_q, _round_up(nq, 8))
    grid = (b * num_heads, pl.cdiv(nq, bq))
    qspec = pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, nkp, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    dqh, dkh, dvh = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, nk=nk, nq=nq),
        grid=grid,
        in_specs=[qspec, kspec, kspec, qspec],
        out_specs=(qspec, kspec, kspec),
        out_shape=(
            jax.ShapeDtypeStruct((b * num_heads, nq, d), q.dtype),
            jax.ShapeDtypeStruct((b * num_heads, nkp, d), jnp.float32),
            jax.ShapeDtypeStruct((b * num_heads, nkp, d), jnp.float32),
        ),
        interpret=_interpret(),
    )(qh, kh, vh, gh)

    dq = _merge_heads(dqh, b, num_heads)
    dk = _merge_heads(dkh[:, :nk, :], b, num_heads).astype(k.dtype)
    dv = _merge_heads(dvh[:, :nk, :], b, num_heads).astype(v.dtype)
    return dq, dk, dv


def _reference_attention(q, k, v, num_heads):
    """XLA einsum attention (used for the backward pass + testing)."""
    b, nq, c = q.shape
    d = c // num_heads
    qh = q.reshape(b, nq, num_heads, d)
    kh = k.reshape(b, -1, num_heads, d)
    vh = v.reshape(b, -1, num_heads, d)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32) / np.sqrt(d)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), vh,
                   preferred_element_type=jnp.float32)
    return o.reshape(b, nq, c).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def sr_attention(q: Array, k: Array, v: Array, num_heads: int) -> Array:
    """Fused SR attention: q (B,Nq,C) x k,v (B,Nk,C) -> (B,Nq,C)."""
    return _forward(q, k, v, num_heads)


def _fwd(q, k, v, num_heads):
    return _forward(q, k, v, num_heads), (q, k, v)


def _bwd(num_heads, res, g):
    q, k, v = res
    return _backward(q, k, v, g, num_heads)


sr_attention.defvjp(_fwd, _bwd)


def _xla_vjp_bwd(q, k, v, g, num_heads):
    """XLA-einsum backward (kept as the test oracle for `_backward`)."""
    def f(q, k, v):
        return _reference_attention(q, k, v, num_heads)

    _, vjp = jax.vjp(f, q, k, v)
    return vjp(g)


def _pallas_kernel_kernel_size_bytes(nq, nk, d, bq):  # pragma: no cover
    """VMEM budget helper for tuning block_q."""
    return 4 * (bq * d + 2 * nk * d + bq * nk)
