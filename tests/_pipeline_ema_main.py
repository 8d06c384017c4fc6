"""Subprocess body of test_pipeline_ema.py::test_ema_pipeline_subprocess.

Runs in a FRESH interpreter: the pipelined-EMA equivalence checks compile
many brand-new executables (per-stage fwd/bwd jits, the fused head-phase
program, the fused-step oracle), and the XLA:CPU executable-cache
serializer segfaults nondeterministically on exactly such fresh large
compiles inside long-lived xdist workers (CLAUDE.md round-3 hazard;
standalone runs always pass).

Prints `pipeline-ema-ok` and exits 0 iff the stage-per-device EMA step
matches the fused `ema_semi_step` oracle at micro 1 and 2 and training
makes progress with correct memory placement.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from semisupervisedobjectdetection_tpu.utils.cache import (  # noqa: E402
    setup_compile_cache,
)

# private persistent cache: warm repeat runs without sharing a dir with
# the xdist workers (concurrent access is the suite's cache-serializer
# SIGSEGV trigger — see tests/conftest.py)
setup_compile_cache("/tmp/jax_test_cache_pipeema", min_compile_secs=0.5)

import test_pipeline_ema as t  # noqa: E402


def main() -> None:
    t.check_matches_fused_step(1)
    t.check_matches_fused_step(2)
    t.check_trains_and_places_memory()
    t.check_dp_matches_fused_step()
    print("pipeline-ema-ok")


if __name__ == "__main__":
    main()
