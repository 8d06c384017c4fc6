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
    loop, compared against the single-device run (loose: GSPMD reduction
    orders differ).

    Runs in a fresh interpreter (tests/_tp_collective_cli_main.py): its
    fresh large compiles hit the XLA:CPU executable-cache serializer
    segfault in long-lived xdist workers — third victim after
    test_quant's delta bound and the graft-entry dryrun (CLAUDE.md)."""
    import os
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_tp_collective_cli_main.py")
    proc = subprocess.run([sys.executable, script], env=dict(os.environ),
                          capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    assert "tp-collective-ok" in proc.stdout
    # the flagship EMA CLI composed with dp x tp + collective MixFFN
    assert "ema-tp-collective-ok" in proc.stdout


@needs8
def test_supervised_parallel_pp(tmp_path):
    """GPipe pipeline training (--parallel pp) through the real CLI epoch
    loop: stage-per-device params/optimizer, --grad-accum as the
    microbatch count, merged params synced back for eval."""
    _run_supervised(tmp_path, ["--parallel", "pp", "--grad-accum", "2"])


@needs8
def test_supervised_parallel_dp_pp(tmp_path):
    """dp x pp (--parallel dp_pp --dp 2): two replica groups of the
    pipeline, one update == train_step(accum=dp*micro)."""
    _run_supervised(tmp_path, ["--parallel", "dp_pp", "--dp", "2",
                               "--grad-accum", "2"])


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


@needs8
def test_ema_mode_parallel_pp():
    """Flagship EMA loop over the stage-per-device pipeline
    (parallel/pipeline_ema.py): teacher+student stage params on their
    own devices, student-only optimizer, per-stage EMA writes, merged
    params synced back for eval/checkpointing. Eval-mode forwards only
    (--no-quirks; the quirks config must fail fast).

    Runs in a fresh interpreter (tests/_ema_pp_cli_main.py): the pp EMA
    CLI compiles a fresh set of stage/head executables, the profile of
    the XLA:CPU compile-cache serializer segfault in long-lived xdist
    workers (CLAUDE.md round-3 hazard)."""
    import os
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_ema_pp_cli_main.py")
    proc = subprocess.run([sys.executable, script], env=dict(os.environ),
                          capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    assert "ema-pp-cli-ok" in proc.stdout
