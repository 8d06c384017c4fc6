"""Subprocess body of test_cli_parallel.py::test_ema_mode_parallel_pp.

Runs in a FRESH interpreter: the pp EMA CLI epoch loop compiles a fresh
set of stage/head executables on the 8-device virtual mesh, the exact
profile of the XLA:CPU executable-cache serializer SIGSEGV in long-lived
xdist workers (CLAUDE.md round-3 hazard; standalone runs always pass).

Prints `ema-pp-cli-ok` and exits 0 iff the quirks config fails fast and
the --no-quirks run produces finite train/eval losses.
"""

import os
import shutil
import sys
import tempfile

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

setup_compile_cache("/tmp/jax_test_cache_emappcli", min_compile_secs=0.5)

import numpy as np  # noqa: E402

ARGS = ["--synthetic", "--synthetic-n", "8", "--img-size", "64",
        "--batch-size", "8", "--epochs", "1", "--dtype", "float32"]


def main() -> None:
    from semisupervisedobjectdetection_tpu.cli import common
    from semisupervisedobjectdetection_tpu.cli import (
        teacher_student as cli_ts,
    )

    tmp = tempfile.mkdtemp(prefix="sso_emapp_")
    try:
        csv = os.path.join(tmp, "m.csv")
        base = ARGS + ["--ema-mode", "--parallel", "pp",
                       "--checkpoint-dir", os.path.join(tmp, "ck"),
                       "--metrics-csv", csv]
        # quirks mode (train-mode forwards) must fail fast, not silently
        # train with eval-mode semantics
        try:
            cli_ts.main(base)
            raise AssertionError("expected SystemExit for quirks + pp")
        except SystemExit as e:
            assert "no-quirks" in str(e), e
        try:
            cli_ts.main(base + ["--no-quirks", "--grad-accum", "2"])
        finally:
            common.teardown_parallel()
        lines = open(csv).read().splitlines()
        assert len(lines) >= 2, lines
        row = dict(zip(lines[0].split(","), lines[1].split(",")))
        assert np.isfinite(float(row["train_loss"]))
        assert np.isfinite(float(row["eval_loss"]))

        # dp x pp composition from the CLI (2 replica groups x 4 stages)
        csv2 = os.path.join(tmp, "m2.csv")
        try:
            cli_ts.main(ARGS + ["--ema-mode", "--parallel", "dp_pp",
                                "--dp", "2", "--no-quirks",
                                "--checkpoint-dir",
                                os.path.join(tmp, "ck2"),
                                "--metrics-csv", csv2])
        finally:
            common.teardown_parallel()
        lines2 = open(csv2).read().splitlines()
        assert len(lines2) >= 2, lines2
        row2 = dict(zip(lines2[0].split(","), lines2[1].split(",")))
        assert np.isfinite(float(row2["train_loss"]))
        assert np.isfinite(float(row2["eval_loss"]))
        print("ema-pp-cli-ok")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
