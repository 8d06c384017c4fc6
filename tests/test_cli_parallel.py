"""--parallel CLI smokes: the training entry points provision a device
mesh (dp / FSDP / dp x tp) and run the real epoch loop SPMD on the
8-device virtual CPU mesh.

The reference is strictly single-GPU (SURVEY.md §5, `cuda:0` hardcoded at
`main_segformer/segFormer_main.py:148`); these flags are TPU-scaling
capability with no reference counterpart, layered over `parallel/mesh.py`,
`parallel/tp.py` and (for --ffn-impl collective) `parallel/collective.py`.
"""

import jax
import numpy as np
import pytest

needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 devices")

ARGS = ["--synthetic", "--synthetic-n", "8", "--img-size", "64",
        "--batch-size", "8", "--epochs", "1", "--dtype", "float32"]


def _run_supervised(tmp_path, extra):
    from semisupervisedobjectdetection_tpu.cli import common
    from semisupervisedobjectdetection_tpu.cli import supervised as cli_sup

    csv = tmp_path / "m.csv"
    try:
        cli_sup.main(ARGS + ["--checkpoint-dir", str(tmp_path / "ck"),
                             "--metrics-csv", str(csv)] + extra)
    finally:
        common.teardown_parallel()
    assert csv.exists()
    lines = csv.read_text().splitlines()
    assert len(lines) >= 2, lines
    header = lines[0].split(",")
    row = dict(zip(header, lines[1].split(",")))
    assert np.isfinite(float(row["train_loss"]))
    assert np.isfinite(float(row["eval_loss"]))
    return row


@needs8
def test_supervised_parallel_dp(tmp_path):
    _run_supervised(tmp_path, ["--parallel", "dp"])


@needs8
def test_supervised_parallel_fsdp(tmp_path):
    _run_supervised(tmp_path, ["--parallel", "fsdp"])


@needs8
def test_supervised_parallel_tp_collective(tmp_path):
    """dp x tp mesh + tensor-parallel params + the explicit ring
    collective MixFFN (--ffn-impl collective) through the real CLI epoch
    loop. Loss must match the single-device run bit-for-bit in intent
    (same data/augment keys) — asserted loosely since GSPMD reduction
    orders differ."""
    row_tp = _run_supervised(tmp_path, ["--parallel", "tp", "--tp", "2",
                                        "--ffn-impl", "collective"])
    row_1 = _run_supervised(tmp_path, [])
    assert abs(float(row_tp["train_loss"]) -
               float(row_1["train_loss"])) < 5e-2, (row_tp, row_1)


@needs8
def test_ema_mode_parallel_dp(tmp_path):
    """Flagship EMA mean-teacher loop over the dp mesh from the CLI."""
    from semisupervisedobjectdetection_tpu.cli import common
    from semisupervisedobjectdetection_tpu.cli import (
        teacher_student as cli_ts,
    )

    csv = tmp_path / "m.csv"
    try:
        cli_ts.main(ARGS + ["--ema-mode", "--parallel", "dp",
                            "--checkpoint-dir", str(tmp_path / "ck"),
                            "--metrics-csv", str(csv)])
    finally:
        common.teardown_parallel()
    assert csv.exists()
    assert len(csv.read_text().splitlines()) >= 2
