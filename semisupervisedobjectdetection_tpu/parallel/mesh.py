"""Device-mesh utilities: the distributed layer the reference never had.

The reference is strictly single-GPU (`SURVEY.md §5`: no DDP/NCCL anywhere,
`cuda:0` hardcoded at `main_segformer/segFormer_main.py:148`). The TPU-native
rebuild scales via a `jax.sharding.Mesh` with a data axis: batches are
sharded over `data`, parameters are replicated, and XLA inserts the gradient
all-reduce over ICI when the jitted train step consumes sharded batches and
produces replicated parameter updates.

At MiT-B5 scale (~82M params) data parallelism is the right default
training strategy; the framework additionally provides FFN tensor
parallelism (`parallel/tp.py`), spatial/sequence parallelism
(`parallel/context.py`), inference pipeline parallelism
(`parallel/pipeline.py`), and here `fsdp_shard`, which shards parameters and
optimizer state over the data axis (ZeRO-3 style): each leaf is split on
its largest mesh-divisible axis, GSPMD inserts the all-gather before use
and the reduce-scatter on the gradients, halving/eighth-ing per-chip
optimizer memory for very large batch runs.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(devices: Optional[Sequence[jax.Device]] = None,
             axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all local devices (or the given ones)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Sharding for batched arrays: leading axis split over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place a host batch onto the mesh, sharded over the data axis.

    Works for pytrees; every leaf's leading dim must divide by mesh size.
    """
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (e.g. params) across the mesh."""
    sharding = replicate_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def fsdp_spec(shape, n_shards: int, axis_name: str = "data",
              min_leaf_size: int = 2 ** 14) -> P:
    """ZeRO-style PartitionSpec for one array: shard the largest axis that
    divides the mesh size; small/indivisible leaves stay replicated.

    `min_leaf_size` keeps tiny leaves (biases, LN scales) replicated — the
    all-gather latency would dominate any memory saved.
    """
    if not shape or int(np.prod(shape)) < min_leaf_size:
        return P()
    # prefer the largest dimension for an even split
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % n_shards == 0:
            spec = [None] * len(shape)
            spec[i] = axis_name
            return P(*spec)
    return P()


def fsdp_shard(mesh: Mesh, tree, axis_name: str = "data",
               min_leaf_size: int = 2 ** 14):
    """Place a params/opt-state pytree onto the mesh FSDP-style.

    Each leaf large enough is split over the data axis on its largest
    divisible dimension; the jitted train step consuming these arrays gets
    GSPMD-inserted all-gathers (forward/backward) and reduce-scatters
    (gradients), i.e. ZeRO-3 semantics without touching the step code.
    Numerics match the replicated path up to fp reduction order
    (`tests/test_multichip.py::test_fsdp_step_matches_replicated`).
    """
    n = mesh.devices.size

    def place(x):
        spec = fsdp_spec(getattr(x, "shape", ()), n, axis_name,
                         min_leaf_size)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, tree)
