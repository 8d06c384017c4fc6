"""Tensor (model) parallelism for SegFormer via GSPMD sharding rules.

Megatron-style sharding of the MixFFN — the FLOP-dominant block (measured
via XLA cost analysis at MiT-B5 stage-3 dims: dense1+dwconv+dense2 are
62.3% of a layer's FLOPs, attention the rest incl. its SR conv —
tests/test_tp.py::test_ffn_flop_share_measured):

  dense1 kernel (.., C, M): column-parallel — M split over the `tp` axis
  dwconv kernel/bias (per-channel): split over M (depthwise conv is
    elementwise in channels, so no halo in the channel dim)
  gelu: elementwise on the M-sharded activation
  dense2 kernel (.., M, C): row-parallel — M split; GSPMD inserts ONE
    all-reduce (psum over `tp`) on dense2's output per layer

Attention is additionally sharded head-parallel where the stage's head
count divides tp (pass `num_heads_by_stage`): q/k/v kernels column-split
on the out dim — a contiguous channel block split equals a head-group
split since the (B, N, C) -> (B, N, H, C/H) reshape is row-major — and the
out-projection row-split on its in dim, yielding one more all-reduce per
layer. Stages whose head count does not divide tp (MiT-B5 stages 1/3 have
1/5 heads) stay replicated, as does the SR-reduction conv (its K/V input
feeds every head). The decode head stays replicated: its per-stage fuse
reads row-slices of the shared linear_fuse kernel, which sharding would
turn into gathers for a small FLOP share.

No hand-written collectives: `tp_shard` only places parameter leaves with
the right `PartitionSpec`s; the jitted step's GSPMD partitioner derives the
activation shardings and inserts the all-reduces on ICI. Combine with the
data axis (mesh ("data", "tp")) for dp x tp.

The reference is single-GPU (SURVEY.md §5) — this is a TPU scaling
addition. Correctness vs the replicated model: tests/test_tp.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _stage_of(path: tuple) -> Optional[int]:
    for p in path:
        if p.startswith("block_"):
            try:
                return int(p.split("_")[1])
            except ValueError:
                return None
    return None


def tp_spec_for(path: tuple, shape: tuple, tp_size: int,
                axis_name: str = "tp",
                num_heads_by_stage: Optional[Tuple[int, ...]] = None) -> P:
    """PartitionSpec for one SegFormer param leaf under tensor parallelism.
    `path` is the tuple of str keys into the params dict;
    `num_heads_by_stage` enables head-parallel attention for stages whose
    head count divides tp (None = FFN-only, the conservative default)."""
    if not shape:
        return P()

    def axis(i):
        spec = [None] * len(shape)
        spec[i] = axis_name
        return P(*spec)

    leaf = path[-1]
    module = path[-2] if len(path) >= 2 else ""

    if any(p == "mlp" for p in path):
        if module == "dense1":
            # kernel (.., C, M) / bias (.., M): split the hidden (out) dim.
            if shape[-1] % tp_size != 0:
                return P()
            return axis(len(shape) - 1)
        if module == "dwconv":
            # kernel (.., 3, 3, 1, M) / bias (.., M): per-channel split.
            if shape[-1] % tp_size != 0:
                return P()
            return axis(len(shape) - 1)
        if module == "dense2" and leaf == "kernel":
            # kernel (.., M, C): split the contracting (in) dim.
            if shape[-2] % tp_size != 0:
                return P()
            return axis(len(shape) - 2)
        # dense2 bias and anything else in the FFN: replicated.
        return P()

    if num_heads_by_stage is not None and any(
            p == "attention" for p in path):
        stage = _stage_of(path)
        if stage is None or stage >= len(num_heads_by_stage):
            return P()
        if num_heads_by_stage[stage] % tp_size != 0:
            return P()   # head groups must align with channel blocks
        if module in ("query", "key", "value"):
            # kernel (.., C, C) / bias (.., C): head-column split.
            if shape[-1] % tp_size != 0:
                return P()
            return axis(len(shape) - 1)
        if module == "out" and leaf == "kernel":
            # kernel (.., C, C): row-split on the contracting dim; GSPMD
            # all-reduces the out-projection output.
            if shape[-2] % tp_size != 0:
                return P()
            return axis(len(shape) - 2)
    return P()


def tp_shard(mesh: Mesh, params, axis_name: str = "tp",
             num_heads_by_stage: Optional[Tuple[int, ...]] = None):
    """Place a SegFormer params pytree onto the mesh with FFN (and, when
    `num_heads_by_stage` is given, head-parallel attention) tensor
    parallelism over `axis_name` (other mesh axes untouched/replicated)."""
    tp_size = mesh.shape[axis_name]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def keys(kp):
        out = []
        for k in kp:
            out.append(str(getattr(k, "key", getattr(k, "idx", k))))
        return tuple(out)

    placed = {}
    for kp, leaf in flat:
        spec = tp_spec_for(keys(kp), getattr(leaf, "shape", ()), tp_size,
                           axis_name, num_heads_by_stage)
        placed[kp] = jax.device_put(leaf, NamedSharding(mesh, spec))
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [placed[kp] for kp, _ in flat])


def dp_tp_mesh(dp: int, tp: int, devices=None) -> Mesh:
    """2-D (data, tp) mesh; tp is the fast (adjacent-device) axis so the
    per-layer all-reduce rides the shortest ICI links."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= dp * tp, (len(devices), dp, tp)
    arr = np.asarray(devices[:dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("data", "tp"))
