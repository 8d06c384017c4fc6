"""Tensor (model) parallelism for SegFormer via GSPMD sharding rules.

Megatron-style sharding of the MixFFN — the FLOP-dominant block (dense1 +
dense2 are ~60% of an MiT-B5 layer's FLOPs):

  dense1 kernel (.., C, M): column-parallel — M split over the `tp` axis
  dwconv kernel/bias (per-channel): split over M (depthwise conv is
    elementwise in channels, so no halo in the channel dim)
  gelu: elementwise on the M-sharded activation
  dense2 kernel (.., M, C): row-parallel — M split; GSPMD inserts ONE
    all-reduce (psum over `tp`) on dense2's output per layer

Attention and the decode head stay replicated over `tp`: SegFormer's head
counts (1, 2, 5, 8) don't divide a tp axis evenly and attention is a small
FLOP share — sharding it would trade an awkward head split for little gain.

No hand-written collectives: `tp_shard` only places parameter leaves with
the right `PartitionSpec`s; the jitted step's GSPMD partitioner derives the
activation shardings and inserts the all-reduce on ICI. Combine with the
data axis (mesh ("data", "tp")) for dp x tp.

The reference is single-GPU (SURVEY.md §5) — this is a TPU scaling
addition. Correctness vs the replicated model: tests/test_tp.py.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_spec_for(path: tuple, shape: tuple, tp_size: int,
                axis_name: str = "tp") -> P:
    """PartitionSpec for one SegFormer param leaf under FFN tensor
    parallelism. `path` is the tuple of str keys into the params dict."""
    in_mlp = any(p == "mlp" for p in path)
    if not in_mlp or not shape:
        return P()

    def axis(i):
        spec = [None] * len(shape)
        spec[i] = axis_name
        return P(*spec)

    leaf = path[-1]
    module = path[-2] if len(path) >= 2 else ""
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


def tp_shard(mesh: Mesh, params, axis_name: str = "tp"):
    """Place a SegFormer params pytree onto the mesh with FFN tensor
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
                           axis_name)
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
