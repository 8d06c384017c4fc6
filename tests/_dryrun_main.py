"""Subprocess body of test_multichip.py::test_graft_entry_dryrun.

Runs in a FRESH interpreter: the full 5-phase dryrun compiles many large
jits back-to-back, and the XLA:CPU executable-cache serializer segfaults
nondeterministically in long-lived full-suite worker processes (observed
at `__graft_entry__.py` dryrun's EMA-step compile in
`backend_compile_and_load`; standalone runs pass) — the same hazard and
fix as tests/_quant_delta_main.py (CLAUDE.md round-3 notes). This also
matches how the driver itself invokes the dryrun: as its own process.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from semisupervisedobjectdetection_tpu.utils.cache import (  # noqa: E402
    setup_compile_cache,
)

# private persistent cache: warm repeat runs without sharing a dir
# with the xdist workers (concurrent access is the suite's
# cache-serializer SIGSEGV trigger - see tests/conftest.py)
setup_compile_cache("/tmp/jax_test_cache_dryrun", min_compile_secs=0.5)

import __graft_entry__ as g  # noqa: E402


def main() -> None:
    g.dryrun_multichip(min(8, len(jax.devices())))
    print("dryrun-ok")


if __name__ == "__main__":
    main()
