"""Subprocess body of
test_pipeline_train.py::test_pipeline_trainable_mask_subprocess.

Runs in a FRESH interpreter: the prompt-token config compiles brand-new
per-stage pipeline executables, and the XLA:CPU executable-cache
serializer segfaults nondeterministically on exactly such fresh large
compiles inside long-lived xdist workers (CLAUDE.md round-3 hazard; a
gw worker died on this test in the round-5 full-suite run while
standalone runs pass).

Prints `pipeline-mask-ok` and exits 0 iff the pipeline optimizer
freezes exactly the params the single-device trainable mask freezes.
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
setup_compile_cache("/tmp/jax_test_cache_pipemask", min_compile_secs=0.5)

import test_pipeline_train as t  # noqa: E402


def main() -> None:
    t.check_pipeline_respects_trainable_mask()
    print("pipeline-mask-ok")


if __name__ == "__main__":
    main()
