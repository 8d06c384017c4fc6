"""Graceful-preemption tests (utils/preemption.py + cli wiring).

TPU VMs get SIGTERM with a short grace window on spot preemption /
maintenance; the training loops must checkpoint mid-epoch and exit 0 so a
supervisor reschedules with --resume. The reference has no counterpart —
any kill loses everything since the last best-eval save
(`/root/reference/main_segformer/segFormer_main.py:79-86`, SURVEY.md §5
checkpoint row).

The end-to-end test sends a REAL SIGTERM to a training CLI subprocess
(tests/_preempt_main.py — fresh interpreter, which also keeps the
cache-serializer hazard pattern: it compiles new executables).
"""

import json
import os
import signal
import subprocess
import sys
import time

import jax.numpy as jnp
import pytest

from semisupervisedobjectdetection_tpu.utils import preemption

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))


def test_request_stop_roundtrip():
    preemption.reset()
    assert not preemption.stop_requested()
    assert preemption.signal_name() == "stop"
    preemption.request_stop("drain")
    assert preemption.stop_requested()
    assert preemption.signal_name() == "drain"
    preemption.reset()
    assert not preemption.stop_requested()


def test_sigterm_handler_sets_flag_and_uninstall_restores():
    prev = signal.getsignal(signal.SIGTERM)
    assert preemption.install()  # pytest runs tests on the main thread
    try:
        os.kill(os.getpid(), signal.SIGTERM)
        # CPython delivers the handler at the next bytecode boundary
        deadline = time.time() + 5
        while not preemption.stop_requested() and time.time() < deadline:
            time.sleep(0.01)
        assert preemption.stop_requested()
        assert preemption.signal_name() == "SIGTERM"
    finally:
        preemption.uninstall()
    assert signal.getsignal(signal.SIGTERM) is prev
    assert not preemption.stop_requested()


def test_preempt_exit_saves_last_and_exits_zero(tmp_path):
    """common.preempt_exit writes a loadable `*_last` with meta epoch-1
    (the interrupted epoch is redone on --resume) and raises SystemExit(0),
    even though --resume was never passed."""
    import argparse

    from semisupervisedobjectdetection_tpu.checkpoint.orbax_io import (
        load_last,
    )
    from semisupervisedobjectdetection_tpu.cli import common
    from semisupervisedobjectdetection_tpu.core.config import TrainConfig
    from semisupervisedobjectdetection_tpu.train.state import TrainState

    state = TrainState.create(
        {"params": {"w": jnp.ones((2, 2))}}, TrainConfig())
    args = argparse.Namespace(checkpoint_dir=str(tmp_path))
    preemption.request_stop("SIGTERM")
    try:
        with pytest.raises(SystemExit) as ex:
            common.preempt_exit(args, [("toy", state, 0.5)], epoch=3)
    finally:
        preemption.reset()
    assert ex.value.code == 0
    got = load_last(str(tmp_path), "toy", state)
    assert got is not None
    _, start_epoch, best = got
    assert start_epoch == 3          # meta epoch 2 -> redo epoch 3
    assert best == 0.5
    with open(os.path.join(str(tmp_path), "toy_last.meta.json")) as f:
        assert json.load(f)["epoch"] == 2


def test_preempt_exit_without_checkpoint_dir_still_exits_zero(capsys):
    import argparse

    from semisupervisedobjectdetection_tpu.cli import common

    preemption.request_stop("SIGTERM")
    try:
        with pytest.raises(SystemExit) as ex:
            common.preempt_exit(argparse.Namespace(checkpoint_dir=None),
                                [], epoch=0)
    finally:
        preemption.reset()
    assert ex.value.code == 0
    assert "NOT saved" in capsys.readouterr().out


def test_cli_sigterm_checkpoints_and_resumes(tmp_path):
    """End-to-end: SIGTERM a real training run mid-flight -> exit 0 +
    `segformer_last` written (no --resume on the first run, so only the
    preempt path can have written it) -> a --resume rerun continues from
    the interrupted epoch."""
    ck = tmp_path / "ck"
    csv = tmp_path / "m.csv"
    script = os.path.join(TESTS_DIR, "_preempt_main.py")
    base = [sys.executable, script, "--synthetic", "--synthetic-n", "6",
            "--variant", "b0", "--img-size", "64", "--batch-size", "2",
            "--dtype", "float32", "--seed", "3",
            "--checkpoint-dir", str(ck)]
    proc = subprocess.Popen(
        base + ["--epochs", "500", "--metrics-csv", str(csv)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=dict(os.environ))
    try:
        # wait for >= 1 completed epoch (header + 1 row in the csv);
        # generous deadline: a cold compile cache on a contended host
        deadline = time.time() + 900
        while time.time() < deadline:
            if proc.poll() is not None:
                out = proc.stdout.read()
                raise AssertionError(f"CLI died early: {out[-3000:]}")
            if csv.exists() and len(csv.read_text().splitlines()) >= 2:
                break
            time.sleep(0.5)
        else:
            raise AssertionError("no epoch completed within the deadline")
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=600)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()
    assert proc.returncode == 0, out[-3000:]
    assert "SIGTERM received" in out, out[-3000:]
    assert "preempted (SIGTERM)" in out, out[-3000:]
    last = ck / "segformer_last"
    assert last.is_dir()
    with open(str(last) + ".meta.json") as f:
        meta = json.load(f)
    interrupted = meta["epoch"] + 1   # preempt saves epoch-1

    res = subprocess.run(
        base + ["--epochs", str(interrupted + 2), "--resume"],
        capture_output=True, text=True, timeout=900,
        env=dict(os.environ))
    assert res.returncode == 0, (res.stdout[-3000:], res.stderr[-2000:])
    assert f"resumed from epoch {interrupted}" in res.stdout, \
        res.stdout[-3000:]
