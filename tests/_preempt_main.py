"""Subprocess body of tests/test_preemption.py: runs the supervised CLI
exactly like `python -m semisupervisedobjectdetection_tpu.cli.supervised`
would — preemption guard installed — but pinned to CPU with a private
compile cache (the test sends this process a real SIGTERM mid-training).
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

setup_compile_cache("/tmp/jax_test_cache_preempt", min_compile_secs=0.5)

from semisupervisedobjectdetection_tpu.cli import supervised  # noqa: E402
from semisupervisedobjectdetection_tpu.utils import preemption  # noqa: E402

if __name__ == "__main__":
    preemption.install()
    supervised.main(sys.argv[1:])
