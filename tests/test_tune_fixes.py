"""Regression tests for the --tune sweep fixes (round-4 review):

- grid points never write checkpoints (best OR preemption `_last`) —
  reference Hyperparameter_Tuning runs with save_model=False
  (`segFormer_main.py:125-142`, `segFormer_autoencoder_main.py:133-170`);
- a sweep where no point produces a finite objective reports that instead
  of crashing on `best_pt[0]`;
- each grid point logs to its own suffixed --metrics-csv (one shared CSV
  interleaves unidentifiable runs).
"""

import argparse
import math
import os

import pytest

from semisupervisedobjectdetection_tpu.cli import common
from semisupervisedobjectdetection_tpu.core.config import TrainConfig


def _tune_args(tmp_path, **kw):
    d = dict(seed=0, tune_lrs="1e-3,1e-5", tune_wds="5e-5",
             tune_gammas="0.97", tune_max=9,
             metrics_csv=str(tmp_path / "m.csv"),
             checkpoint_dir=str(tmp_path / "ck"), tune=True)
    d.update(kw)
    return argparse.Namespace(**d)


def test_run_tune_grid_no_finite_point_reports(tmp_path, capsys):
    args = _tune_args(tmp_path)
    best, best_pt = common.run_tune_grid(
        args, TrainConfig(epochs=5), lambda tci, plog: float("nan"))
    assert best_pt is None and math.isinf(best)
    assert "no grid point produced a finite" in capsys.readouterr().out


def test_run_tune_grid_empty_grid_fails_fast(tmp_path):
    args = _tune_args(tmp_path, tune_max=0)
    with pytest.raises(SystemExit, match="grid is empty"):
        common.run_tune_grid(args, TrainConfig(epochs=5),
                             lambda tci, plog: 0.0)


def test_run_tune_grid_per_point_csv_and_epochs(tmp_path):
    seen = []

    def run_point(tci, plog):
        seen.append((tci.lr, tci.weight_decay, tci.lr_decay, tci.epochs,
                     plog.path))
        plog.log(0, train_loss=tci.lr)
        return tci.lr

    best, best_pt = common.run_tune_grid(args=_tune_args(tmp_path),
                                         tc=TrainConfig(epochs=10),
                                         run_point=run_point)
    assert best_pt == (1e-5, 5e-5, 0.97) and best == 1e-5
    assert len(seen) == 2
    paths = {s[4] for s in seen}
    assert len(paths) == 2                       # one CSV per grid point
    for lr, wd, g, ep, path in seen:
        assert ep == 2                           # epochs//5
        assert f"lr{lr}" in path and path.endswith(".csv")
        assert os.path.exists(path)


def test_preempt_exit_under_tune_saves_nothing(tmp_path, capsys):
    args = _tune_args(tmp_path)
    with pytest.raises(SystemExit) as e:
        common.preempt_exit(args, [("segformer", object(), 1.0)], epoch=3,
                            tuning=True)
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert "tune grid point state NOT saved" in out
    ck = tmp_path / "ck"
    assert not ck.exists() or not any(ck.iterdir())


def test_supervised_tune_lr_writes_no_checkpoints(tmp_path, capsys):
    from semisupervisedobjectdetection_tpu.cli import supervised

    ckdir = str(tmp_path / "ck")
    csv = str(tmp_path / "m.csv")
    supervised.main([
        "--synthetic", "--synthetic-n", "6", "--variant", "b0",
        "--img-size", "64", "--batch-size", "2", "--dtype", "float32",
        "--epochs", "1", "--checkpoint-dir", ckdir,
        "--metrics-csv", csv, "--tune-lr", "1e-3,1e-5"])
    out = capsys.readouterr().out
    assert "best: lr=" in out
    assert not os.path.exists(ckdir) or not os.listdir(ckdir)
    # per-point CSVs, not one interleaved file
    made = sorted(os.listdir(tmp_path))
    assert any(f.startswith("m.lr0.001") for f in made)
    assert any(f.startswith("m.lr1e-05") for f in made)
    assert not os.path.exists(csv)


def test_autoencoder_tune_warm_starts_from_pretrain(tmp_path, monkeypatch):
    """--pretrain-weight must reach every grid-point model (it was
    silently dropped before)."""
    from semisupervisedobjectdetection_tpu.cli import autoencoder

    seen = []
    import semisupervisedobjectdetection_tpu.api as api_mod

    def spy(self, *a, **kw):    # ctor stub: train_loop is stubbed too,
        seen.append(kw.get("pretrain_weight"))   # the model is never used

    monkeypatch.setattr(autoencoder, "train_loop",
                        lambda *a, **kw: 0.5)
    monkeypatch.setattr(api_mod.SegFormerModel, "__init__", spy)
    autoencoder.main([
        "--synthetic", "--synthetic-n", "6", "--variant", "b0",
        "--img-size", "64", "--batch-size", "2", "--dtype", "float32",
        "--epochs", "1", "--pretrain-weight", "/tmp/does_not_matter",
        "--tune", "--tune-lrs", "1e-3", "--tune-wds", "5e-5",
        "--tune-gammas", "0.97"])
    assert seen and all(w == "/tmp/does_not_matter" for w in seen)
