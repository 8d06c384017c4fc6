"""Persistent-compile-cache setup keyed by host CPU fingerprint.

XLA:CPU persistent-cache entries are AOT machine code. Loading an entry
that another machine type compiled SIGSEGVs (observed round 3:
cpu_aot_loader logs a feature mismatch such as "+prefer-no-scatter ... not
supported on the host machine", then `get_executable_and_time` crashes).
Build rounds can run on different hosts sharing /tmp snapshots, so every
cache dir gets a suffix derived from the host's CPU flags; TPU executables
are device code and unaffected, they just land in the same per-host dir.
"""

from __future__ import annotations

import hashlib


def host_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
        return "noflags"
    except OSError:
        return "nocpuinfo"


def setup_compile_cache(base: str = "/tmp/jax_cache",
                        min_compile_secs: float = 2.0) -> str:
    """Point jax's persistent compilation cache at `{base}_{cpu-fp}`."""
    import jax

    path = f"{base}_{host_fingerprint()}"
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path
