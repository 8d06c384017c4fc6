"""Explicit collective matmuls: ring-overlapped AG-matmul / matmul-RS.

The dp x tp path (`parallel/tp.py`) lets GSPMD insert one all-reduce per
FFN (row-parallel dense2) and relies on XLA's latency-hiding scheduler to
overlap it with compute. This module is the *explicit* version of that
overlap — the "collective matmul" recipe (Wang et al., ASPLOS'23; the
scaling-book sharding chapter) written with `shard_map` + `lax.ppermute`
so the communication schedule is under our control instead of the
scheduler's:

  all_gather_matmul:   y_i = all_gather(x) @ W_i, where x is
      sequence-sharded and W column-sharded over `tp`. The ring rotates
      x shards device-to-device; each hop's matmul runs while the next
      shard is in flight, so the gather is hidden behind (n-1)/n of the
      FLOPs instead of preceding them.
  matmul_reduce_scatter:   y = reduce_scatter(sum_i h_i @ W_i) with h
      hidden-sharded and W row-sharded. Each partial-sum chunk rides the
      ring once around, visiting every device exactly once and picking up
      that device's local partial — the classic reduce-scatter ring fused
      into the matmul's output loop.
  sequence_parallel_ffn:   AG-matmul -> GELU -> matmul-RS: the
      Megatron-SP MixFFN dataflow where activations stay sequence-sharded
      *between* layers (LN/elementwise run on 1/n of the tokens) and the
      only full-width tensor ever materialised is the FFN's own input.

Per-chip comm volume matches GSPMD's choice (an all-reduce equals
AG+RS), but the explicit ring exposes each hop to the compiler as an
independent ppermute that overlaps with the chunk matmul next to it —
on ICI this approaches the no-comm roofline when
(bytes/hop / ICI_bw) < (chunk FLOPs / MXU rate).

The reference is single-GPU (SURVEY.md §5 distributed row: "Absent");
this is TPU-scaling capability with no reference counterpart. Numerics
are validated against the unsharded matmul on the 8-device CPU mesh
(tests/test_collective.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _ring_fwd(n):
    """d -> d+1 permutation (one hop around the ring)."""
    return [(j, (j + 1) % n) for j in range(n)]


def _ring_bwd(n):
    """d -> d-1 permutation."""
    return [(j, (j - 1) % n) for j in range(n)]


def _ag_matmul_local(x_local, w_local, n: int, axis_name: str):
    """Per-device body of all_gather_matmul.

    x_local: (B, S/n, C) — this device's sequence shard.
    w_local: (C, M/n)    — this device's column shard of W.
    returns  (B, S, M/n) — the FULL sequence against the local columns.
    """
    idx = jax.lax.axis_index(axis_name)
    b, s_local, _ = x_local.shape
    m_local = w_local.shape[-1]
    # mark the output buffer as device-varying over the ring axis up
    # front — the loop carry must keep one replication type across
    # iterations (shard_map's vma check). Under a PARTIAL-manual
    # shard_map (manual over the ring axis only, e.g. the dp x tp model
    # path via `mixffn_collective_ctx`) x_local still carries explicit
    # sharding on its batch dim; the buffer must match it or the
    # dynamic_update_slice below rejects the mixed shardings.
    spec0 = jax.typeof(x_local).sharding.spec[0]
    kw = {"out_sharding": P(spec0, None, None)} if spec0 is not None else {}
    out0 = jax.lax.pcast(
        jnp.zeros((b, s_local * n, m_local), dtype=x_local.dtype, **kw),
        axis_name, to="varying")

    def body(i, carry):
        buf, out = carry
        # after i backward hops this device holds shard (idx + i) % n
        src = (idx + i) % n
        out = jax.lax.dynamic_update_slice(
            out, (buf @ w_local).astype(out.dtype), (0, src * s_local, 0))
        # send the shard onward while the NEXT iteration's matmul runs;
        # the compiler schedules the ppermute async against it
        buf = jax.lax.ppermute(buf, axis_name, _ring_bwd(n))
        return buf, out

    # n-1 overlapped hops + the final local matmul (no send needed after
    # the last chunk, but keeping the loop uniform lets XLA unroll it;
    # the trailing ppermute is dead and DCE'd only if we drop it, so we
    # run n-1 ring steps and one tail step explicitly)
    buf, out = jax.lax.fori_loop(0, n - 1, body, (x_local, out0))
    src = (idx + n - 1) % n
    out = jax.lax.dynamic_update_slice(
        out, (buf @ w_local).astype(out.dtype), (0, src * s_local, 0))
    return out


def _matmul_rs_local(h_local, w_local, n: int, axis_name: str):
    """Per-device body of matmul_reduce_scatter.

    h_local: (B, S, M/n) — full sequence, this device's hidden shard.
    w_local: (M/n, C)    — this device's row shard of W.
    returns  (B, S/n, C) — this device's sequence chunk of the REDUCED y.

    Chunk j of the output starts on device j+1 and rides the forward
    ring once around; every device adds its own partial when the chunk
    passes through, so chunk j arrives complete at device j after n-1
    hops with each hop hidden behind the next chunk-matmul.
    """
    idx = jax.lax.axis_index(axis_name)
    b, s, _ = h_local.shape
    s_local = s // n

    def partial(c):
        # this device's contribution to output rows [c*s_local, ...)
        rows = jax.lax.dynamic_slice_in_dim(h_local, c * s_local, s_local,
                                            axis=1)
        return rows @ w_local

    acc = partial((idx - 1) % n)

    def body(i, acc):
        acc = jax.lax.ppermute(acc, axis_name, _ring_fwd(n))
        return acc + partial((idx - 1 - i) % n)

    # acc after the loop sits on device idx holding chunk idx, fully
    # reduced: (idx-1-(n-1)) % n == idx
    return jax.lax.fori_loop(1, n, body, acc)


def all_gather_matmul(mesh: Mesh, x, w, axis_name: str = "tp"):
    """y_i = all_gather_{seq}(x) @ W_i with the gather overlapped into the
    matmul. x: (B, S, C) sharded P(None, axis, None); w: (C, M) sharded
    P(None, axis). Returns (B, S, M) sharded P(None, None, axis)."""
    f = shard_map(
        functools.partial(_ag_matmul_local, n=mesh.shape[axis_name],
                          axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(None, axis_name, None), P(None, axis_name)),
        out_specs=P(None, None, axis_name))
    return f(x, w)


def matmul_reduce_scatter(mesh: Mesh, h, w, axis_name: str = "tp"):
    """y = reduce_scatter_{seq}(h @ W) for hidden-sharded h: (B, S, M)
    P(None, None, axis) and row-sharded w: (M, C) P(axis, None).
    Returns (B, S, C) sharded P(None, axis, None)."""
    f = shard_map(
        functools.partial(_matmul_rs_local, n=mesh.shape[axis_name],
                          axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(None, None, axis_name), P(axis_name, None)),
        out_specs=P(None, axis_name, None))
    return f(h, w)


def _mixffn_local(x_local, w1, b1, kd, bk, w2, b2, n: int,
                  axis_name: str, h: int, w: int, gelu_approx: bool):
    """Per-device sequence-parallel MixFFN (dense1 -> 3x3 depthwise conv
    -> GELU -> dense2, `models/segformer.py::MixFFN` / ref
    `modeling_segformer.py:283-317`).

    The depthwise conv is per-channel, and after the AG-matmul each
    device holds the FULL token grid over its hidden shard — so the conv
    runs entirely locally: the block's only communication is the two
    ring collectives, same volume as GSPMD's single all-reduce.
    """
    hid = _ag_matmul_local(x_local, w1, n, axis_name)
    hid = hid + b1[None, None, :]
    b, s, m_local = hid.shape
    hid = jax.lax.conv_general_dilated(
        hid.reshape(b, h, w, m_local), kd,
        window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        feature_group_count=m_local,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).reshape(b, s, m_local) + bk[None, None, :]
    hid = jax.nn.gelu(hid, approximate=gelu_approx)
    y = _matmul_rs_local(hid, w2, n, axis_name)
    return y + jax.lax.pcast(b2, axis_name, to="varying")[None, None, :]


def mixffn_collective(mesh: Mesh, x, params, h: int, w: int,
                      axis_name: str = "tp", gelu_approx: bool = False):
    """Sequence-parallel SegFormer MixFFN from the model's own param
    leaves: `params` is one layer's MixFFN dict
    {dense1: {kernel,bias}, dwconv: {kernel,bias}, dense2: {kernel,bias}}
    (kernel shapes (C,M), (3,3,1,M), (M,C)). x: (B, H*W, C) sharded
    P(None, axis, None); returns the same sharding. Numerically equal to
    `MixFFN.__call__`'s XLA path (tests/test_collective.py)."""
    f = shard_map(
        functools.partial(_mixffn_local, n=mesh.shape[axis_name],
                          axis_name=axis_name, h=h, w=w,
                          gelu_approx=gelu_approx),
        mesh=mesh,
        in_specs=(P(None, axis_name, None),          # x: sequence-sharded
                  P(None, axis_name), P(axis_name),  # dense1 col-parallel
                  P(None, None, None, axis_name),    # dwconv per-channel
                  P(axis_name),
                  P(axis_name, None), P(None)),      # dense2 row-parallel
        out_specs=P(None, axis_name, None))
    d1, dw, d2 = params["dense1"], params["dwconv"], params["dense2"]
    return f(x, d1["kernel"], d1["bias"], dw["kernel"], dw["bias"],
             d2["kernel"], d2["bias"])


def context_tp_size(axis_name: str = "tp") -> int:
    """Size of `axis_name` in the ambient context mesh (`jax.set_mesh`),
    or 0 when no mesh / no such axis is active. Readable inside jit
    tracing, so the model can STATICALLY pick the collective MixFFN path
    only when a tp mesh is actually in scope (`MiTConfig.ffn_impl`)."""
    am = jax.sharding.get_abstract_mesh()
    if am is None or axis_name not in am.axis_names:
        return 0
    return am.shape[axis_name]


def _mixffn_local_ar(x_full, w1, b1, kd, bk, w2, b2, n: int,
                     axis_name: str, h: int, w: int, gelu_approx: bool):
    """`_mixffn_local` with REPLICATED activation boundaries: x arrives
    full-width (sliced to this device's sequence chunk here, inside the
    manual region) and dense2 closes row-parallel with one `psum`, so
    both the input and the output the surrounding GSPMD program sees
    are device-invariant over the ring axis. Activation shardings must
    not leak across the shard_map boundary in EITHER direction: a
    sequence-sharded in_spec/out_spec hands GSPMD an S-sharded
    (co)tangent whose backward reshards degenerate tiny-tile shardings
    through the SPMD partitioner's replicate-and-repartition fallback,
    silently corrupting gradients (XLA b/433785288; reproduced via the
    tp>=4 grad mismatch in tests/test_collective.py's model-path test
    when either boundary is left sharded). Weight in_specs stay
    tp-sharded — they are leaves, matching `parallel/tp.py`'s param
    shardings, and their cotangents reshard without touching the buggy
    reshape path."""
    idx = jax.lax.axis_index(axis_name)
    s_local = x_full.shape[1] // n
    x_local = jax.lax.dynamic_slice_in_dim(
        jax.lax.pcast(x_full, axis_name, to="varying"),
        idx * s_local, s_local, axis=1)
    hid = _ag_matmul_local(x_local, w1, n, axis_name)
    hid = hid + b1[None, None, :]
    b, s, m_local = hid.shape
    hid = jax.lax.conv_general_dilated(
        hid.reshape(b, h, w, m_local), kd,
        window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        feature_group_count=m_local,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).reshape(b, s, m_local) + bk[None, None, :]
    hid = jax.nn.gelu(hid, approximate=gelu_approx)
    y = jax.lax.psum(hid @ w2, axis_name)
    return y + b2[None, None, :]


def mixffn_collective_ctx(x, w1, b1, kd, bk, w2, b2, h: int, w: int,
                          gelu_approx: bool = False,
                          axis_name: str = "tp"):
    """Collective MixFFN against the AMBIENT mesh (`jax.set_mesh`),
    manual only over `axis_name` — every other mesh axis (e.g. the data
    axis of a dp x tp mesh) stays in GSPMD auto mode, so the batch
    dimension keeps its dp sharding straight through the ring. This is
    the entry point the model itself calls (`models/segformer.py::MixFFN`
    with `ffn_impl='collective'`); weight/activation dtypes are the
    caller's. Raw kernel/bias leaves in, same shapes as
    `mixffn_collective`.

    Comm accounting: entering the shard_map only SLICES x (no comm);
    the dense1 input gather rides the ring hidden behind the chunk
    matmuls; the row-parallel dense2 close costs one all-reduce of a
    C-width activation — the same exposed collective GSPMD inserts for
    `parallel/tp.py`'s row-parallel dense2, with the gather made
    explicit and overlapped. The replicated output (see
    `_mixffn_local_ar`) drops into the existing scan carry / attention
    shardings unchanged. The pure Megatron-SP dataflow (tokens staying
    sequence-sharded between layers, matmul-RS close) remains available
    as `mixffn_collective` for full-manual callers."""
    n = context_tp_size(axis_name)
    f = jax.shard_map(
        functools.partial(_mixffn_local_ar, n=n, axis_name=axis_name,
                          h=h, w=w, gelu_approx=gelu_approx),
        in_specs=(P(None, None, None),               # x: replicated in
                  P(None, axis_name), P(axis_name),  # dense1 col-parallel
                  P(None, None, None, axis_name),    # dwconv per-channel
                  P(axis_name),
                  P(axis_name, None), P(None)),      # dense2 row-parallel
        out_specs=P(None, None, None),
        axis_names={axis_name})
    return f(x, w1, b1, kd, bk, w2, b2)


def sequence_parallel_ffn(mesh: Mesh, x, w1, b1, w2, b2,
                          axis_name: str = "tp",
                          act=jax.nn.gelu):
    """Megatron-SP FFN: tokens stay sequence-sharded outside the block.

    x  (B, S, C)  P(None, tp, None)   sequence-sharded residual stream
    w1 (C, M)     P(None, tp)         column-parallel in-projection
    w2 (M, C)     P(tp, None)         row-parallel out-projection
    b1 (M,) split over tp, b2 (C,) replicated (added post-reduce-scatter
    on 1/n of the tokens — adding it inside the ring would count it n
    times).

    Equivalent to act(x @ w1 + b1) @ w2 + b2 with x fully gathered, but
    the only all-width activation ever built is the FFN input, and both
    collectives are ring-overlapped with their matmuls.
    """
    h = all_gather_matmul(mesh, x, w1, axis_name)
    b1s = jax.device_put(b1, NamedSharding(mesh, P(axis_name)))
    h = act(h + b1s[None, None, :])
    y = matmul_reduce_scatter(mesh, h, w2, axis_name)
    return y + b2[None, None, :]
