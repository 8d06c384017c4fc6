"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(`--xla_force_host_platform_device_count=8`) since only one physical TPU is
attached; see SURVEY.md §4.

NOTE: this environment pre-registers the tunneled-TPU PJRT plugin from
sitecustomize at interpreter start and pins JAX_PLATFORMS=axon, so plain
env-var overrides are ignored; `jax.config.update('jax_platforms', 'cpu')`
is the reliable way to keep tests off the (single, contended) TPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: CPU compiles dominate suite runtime. The
# dir is keyed by host CPU fingerprint — XLA:CPU cache entries are AOT
# machine code and loading a foreign machine's entry SIGSEGVs
# (utils/cache.py has the full story) — AND by xdist worker id: four
# workers sharing one dir is the common factor in every nondeterministic
# put/get_executable_and_time SIGSEGV this suite has seen (standalone
# single-process runs never crash; CLAUDE.md round-3 hazard notes), so
# each worker gets a private cache and concurrent access never happens.
from semisupervisedobjectdetection_tpu.utils.cache import (  # noqa: E402
    setup_compile_cache,
)

_worker = os.environ.get("PYTEST_XDIST_WORKER", "main")
setup_compile_cache(f"/tmp/jax_test_cache_{_worker}",
                    min_compile_secs=0.5)
