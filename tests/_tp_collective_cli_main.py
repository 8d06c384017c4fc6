"""Subprocess body of test_cli_parallel.py::test_supervised_parallel_tp_
collective.

Runs in a FRESH interpreter: this test compiles the biggest new
executables in the file (dp x tp mesh + ring collective MixFFN through
the real CLI epoch loop, then the single-device comparison run), and the
XLA:CPU executable-cache serializer segfaults nondeterministically on
exactly such fresh large compiles inside long-lived xdist workers —
third victim after test_quant's delta bound and the graft-entry dryrun
(CLAUDE.md round-3 hazard notes; standalone runs always pass).

Prints `tp-collective-ok` and exits 0 iff the tp+collective CLI run and
the single-device run produce train losses within 5e-2.
"""

import os
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

# private persistent cache: warm repeat runs without sharing a dir
# with the xdist workers (concurrent access is the suite's
# cache-serializer SIGSEGV trigger - see tests/conftest.py)
setup_compile_cache("/tmp/jax_test_cache_tpcoll", min_compile_secs=0.5)

import numpy as np  # noqa: E402

ARGS = ["--synthetic", "--synthetic-n", "8", "--img-size", "64",
        "--batch-size", "8", "--epochs", "1", "--dtype", "float32"]


def _run(tmp, extra, module="supervised"):
    import importlib

    from semisupervisedobjectdetection_tpu.cli import common

    cli = importlib.import_module(
        f"semisupervisedobjectdetection_tpu.cli.{module}")
    csv = os.path.join(tmp, f"m{module}{len(extra)}.csv")
    try:
        cli.main(ARGS + ["--checkpoint-dir", os.path.join(tmp, "ck"),
                         "--metrics-csv", csv] + extra)
    finally:
        common.teardown_parallel()
    lines = open(csv).read().splitlines()
    assert len(lines) >= 2, lines
    row = dict(zip(lines[0].split(","), lines[1].split(",")))
    assert np.isfinite(float(row["train_loss"]))
    assert np.isfinite(float(row["eval_loss"]))
    return row


def main() -> None:
    import shutil

    tmp = tempfile.mkdtemp(prefix="sso_tpcoll_")
    try:
        row_tp = _run(tmp, ["--parallel", "tp", "--tp", "2",
                            "--ffn-impl", "collective"])
        row_1 = _run(tmp, [])
        delta = abs(float(row_tp["train_loss"])
                    - float(row_1["train_loss"]))
        assert delta < 5e-2, (row_tp, row_1)
        print(f"tp-collective-ok delta={delta:.2e}")

        # The FLAGSHIP EMA mean-teacher CLI composed with dp x tp +
        # collective MixFFN (the dryrun proves step-level numerics;
        # this proves the real CLI epoch loop wires it end-to-end).
        row_ema_tp = _run(tmp, ["--ema-mode", "--parallel", "tp",
                                "--tp", "2", "--ffn-impl", "collective"],
                          module="teacher_student")
        row_ema_1 = _run(tmp, ["--ema-mode"], module="teacher_student")
        delta_ema = abs(float(row_ema_tp["train_loss"])
                        - float(row_ema_1["train_loss"]))
        assert delta_ema < 5e-2, (row_ema_tp, row_ema_1)
        print(f"ema-tp-collective-ok delta={delta_ema:.2e}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
