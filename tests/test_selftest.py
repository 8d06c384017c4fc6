"""`python -m semisupervisedobjectdetection_tpu` install self-test smoke.

The reference has no environment check short of editing a main script and
launching real training (`readme.md:18-19`); the rebuild ships a
`python -m` self-test instead. This drives it exactly as a user would —
a fresh subprocess — which also keeps its new-jit compiles out of the
long-lived pytest worker (the XLA:CPU cache-serializer hazard pattern,
see CLAUDE.md round-3 notes).
"""

import os
import subprocess
import sys


def test_selftest_cli_passes():
    env = dict(os.environ)
    # The self-test manages its own platform (--cpu) and compile cache;
    # a stale harness device-count flag must be overridden by --cpu N
    # (regression: a substring check once skipped the append, so the
    # multi-device check silently never ran).
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    out = subprocess.run(
        [sys.executable, "-m", "semisupervisedobjectdetection_tpu",
         "--cpu", "2", "--size", "32"],
        capture_output=True, text=True, timeout=1800, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    assert "0 failed" in out.stdout
    assert "data-parallel step (2 devices)" in out.stdout
    assert "bit-identical" in out.stdout
