#!/usr/bin/env bash
# Two-process CPU smoke of the multi-host bootstrap: each process gets 4
# virtual CPU devices, jax.distributed wires them into one 8-device world,
# and a psum over the global mesh must return the world sum.
set -euo pipefail
cd "$(dirname "$0")/.."

PORT=${PORT:-12357}

run_rank() {
  SSOD_COORDINATOR=localhost:$PORT SSOD_NUM_PROCESSES=2 SSOD_PROCESS_ID=$1 \
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
  python - <<'EOF'
import os
import jax
jax.config.update("jax_platforms", "cpu")
from semisupervisedobjectdetection_tpu.parallel.distributed import (
    init_distributed,
)
assert init_distributed(), "distributed init did not trigger"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from semisupervisedobjectdetection_tpu.parallel.mesh import get_mesh

mesh = get_mesh()
# Each process contributes its local slice of a global length-8 array.
import numpy as np
local = np.arange(4, dtype=np.float32) + 4 * jax.process_index()
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local, (8,))
total = jax.jit(lambda x: jnp.sum(x),
                out_shardings=NamedSharding(mesh, P()))(garr)
assert float(total) == float(np.arange(8).sum()), float(total)
print(f"rank {jax.process_index()}: psum over 2x4 virtual devices OK")
EOF
}

run_rank 1 &
BG=$!
run_rank 0
wait $BG
echo "multihost smoke OK"
