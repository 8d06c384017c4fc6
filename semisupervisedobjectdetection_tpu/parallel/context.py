"""Context (spatial) parallelism over the token grid.

The reference scales token count only via in-model sequence-reduction
attention (SURVEY.md §5, long-context row); for tiles beyond 512x512 this
module shards the IMAGE HEIGHT axis across a mesh dimension so activations
(the memory bottleneck: stage 1 holds H/4 x W/4 tokens) split across
chips. XLA's GSPMD partitioner inserts the halo exchanges for the
overlapping convolutions and the K/V collectives for attention
automatically — validated to 1e-7 against replicated execution in
`tests/test_context_parallel.py`.

Usage:
    mesh = get_mesh_2d(dp=2, sp=4)
    images = jax.device_put(images, batch_and_height_sharding(mesh))
    state = replicate(mesh, state)
    state, loss, _ = train_step(state, images, masks, rng, cfg)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh_2d(dp: int, sp: int,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """(data, space) mesh: batch over `data`, image height over `space`."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= dp * sp, (
        f"need {dp * sp} devices, have {len(devices)}")
    grid = np.asarray(devices[:dp * sp]).reshape(dp, sp)
    return Mesh(grid, ("data", "space"))


def batch_and_height_sharding(mesh: Mesh) -> NamedSharding:
    """For NHWC image batches: batch over 'data', height over 'space'."""
    return NamedSharding(mesh, P("data", "space"))


def mask_sharding(mesh: Mesh) -> NamedSharding:
    """For (B, H, W) masks."""
    return NamedSharding(mesh, P("data", "space"))


def shard_spatial_batch(mesh: Mesh, images, masks=None):
    images = jax.device_put(images, batch_and_height_sharding(mesh))
    if masks is None:
        return images, None
    return images, jax.device_put(masks, mask_sharding(mesh))
