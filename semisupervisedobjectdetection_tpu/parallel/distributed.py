"""Multi-host bootstrap: `jax.distributed` initialization for pod runs.

The reference is strictly single-process/single-GPU (SURVEY.md §5
distributed row); this is the build-side runtime that lets every CLI run
across hosts. Call `init_distributed()` before any jax device use: it wires
`jax.distributed.initialize` from env vars (or explicit args) so that
`jax.process_count()/process_index()` drive the per-host data sharding in
`data/loader.py` and the global mesh in `mesh.get_mesh`.

Env contract (either the SSOD_* names or JAX's own):
  SSOD_COORDINATOR / JAX_COORDINATOR_ADDRESS  host:port of process 0
  SSOD_NUM_PROCESSES / JAX_NUM_PROCESSES      world size
  SSOD_PROCESS_ID / JAX_PROCESS_ID            this process's rank

Two-process CPU smoke (no TPU pod needed):
  scripts/smoke_multihost.sh  — launches 2 processes with 4 virtual CPU
  devices each (gloo collectives), asserts jax.device_count() == 8 and a
  psum over the global mesh returns the world sum.
"""

from __future__ import annotations

import os
from typing import Optional


def _env(*names: str) -> Optional[str]:
    for n in names:
        v = os.environ.get(n)
        if v:
            return v
    return None


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when a multi-process env is configured.

    Returns True when a multi-process runtime was initialized, False when
    running single-process (the default; nothing happens). Safe to call
    more than once (subsequent calls no-op once initialized).
    """
    import jax

    coordinator_address = coordinator_address or _env(
        "SSOD_COORDINATOR", "JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        v = _env("SSOD_NUM_PROCESSES", "JAX_NUM_PROCESSES")
        num_processes = int(v) if v else None
    if process_id is None:
        v = _env("SSOD_PROCESS_ID", "JAX_PROCESS_ID")
        process_id = int(v) if v else None

    if not coordinator_address or not num_processes or num_processes <= 1:
        return False
    from jax._src import distributed as _dist

    if _dist.global_state.client is not None:  # already initialized
        return True
    # NOTE: must not touch jax.devices()/default_backend() here — that would
    # initialize the XLA backend before jax.distributed.initialize.
    platforms = (jax.config.jax_platforms
                 or os.environ.get("JAX_PLATFORMS", ""))
    if str(platforms).startswith("cpu"):
        # CPU collectives need an explicit implementation.
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    print(f"jax.distributed initialized: process {jax.process_index()}"
          f"/{jax.process_count()}, {jax.local_device_count()} local / "
          f"{jax.device_count()} global devices")
    return True
