"""Two-process gloo-bootstrap smoke (`parallel/distributed.py`) as a
pytest: runs scripts/smoke_multihost.sh in a subprocess — each rank gets 4
virtual CPU devices, jax.distributed joins them into one 8-device world and
a global-mesh reduction must return the world sum. Skipped where
subprocesses/ports are unavailable."""

import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "smoke_multihost.sh")


@pytest.mark.skipif(not shutil.which("bash"), reason="no bash")
def test_two_process_bootstrap_psum():
    env = dict(os.environ, PORT="12861")
    # The rank subprocesses must not inherit this test run's pinned
    # platform; the script sets its own JAX_PLATFORMS/XLA_FLAGS.
    env.pop("XLA_FLAGS", None)
    try:
        proc = subprocess.run(
            ["bash", SCRIPT], env=env, cwd=REPO, capture_output=True,
            text=True, timeout=600)
    except subprocess.TimeoutExpired:
        pytest.fail("multihost smoke timed out (coordinator hang?)")
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    assert "multihost smoke OK" in proc.stdout
