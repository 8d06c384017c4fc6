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

# Persistent compilation cache: CPU compiles dominate suite runtime.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
