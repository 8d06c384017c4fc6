"""Crash-safe resume (`--resume`): `_last` checkpoints + epoch restart.

The reference cannot resume mid-run — `torch.save(state_dict)` keeps only
best-eval params and never the optimizer/scheduler state
(`segFormer_main.py:79-86`, SURVEY.md §5 checkpoint row). These tests
cover the rebuild's resume contract: full state round-trips through
`save_last`/`load_last`, and the supervised / EMA teacher-student CLIs
continue at the saved epoch with the best-gate re-armed."""

import csv
import os

import jax
import jax.numpy as jnp
import numpy as np

from semisupervisedobjectdetection_tpu.checkpoint.orbax_io import (
    load_last,
    save_last,
)
from semisupervisedobjectdetection_tpu.core.config import (
    TrainConfig,
    mit_b0,
)
from semisupervisedobjectdetection_tpu.models.segformer import SegFormer
from semisupervisedobjectdetection_tpu.train.state import TrainState

CFG = mit_b0(depths=(1, 1, 1, 1), hidden_sizes=(8, 16, 32, 64),
             num_heads=(1, 2, 4, 8), decoder_hidden=32)


def _tiny_state(seed=0):
    variables = jax.jit(SegFormer(CFG).init)(
        jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3)))
    return TrainState.create(variables, TrainConfig())


def test_save_load_last_roundtrip(tmp_path):
    state = _tiny_state()
    state = state.replace(epoch=jnp.asarray(3.0))
    save_last(str(tmp_path), "seg", state, epoch=3, best_loss=0.42)
    got = load_last(str(tmp_path), "seg", _tiny_state(seed=1))
    assert got is not None
    restored, next_epoch, best = got
    assert next_epoch == 4 and abs(best - 0.42) < 1e-9
    # params and epoch actually came from the saved state, not template
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(restored.epoch) == 3.0


def test_load_last_absent_returns_none(tmp_path):
    assert load_last(str(tmp_path), "seg", _tiny_state()) is None


def _read_epochs(csv_path):
    with open(csv_path) as f:
        return [int(float(r["step"])) for r in csv.DictReader(f)]


def test_supervised_cli_resumes_at_saved_epoch(tmp_path):
    from semisupervisedobjectdetection_tpu.cli import supervised

    ckdir = str(tmp_path / "ck")
    base = ["--synthetic", "--synthetic-n", "6", "--variant", "b0",
            "--img-size", "64", "--batch-size", "2", "--dtype", "float32",
            "--checkpoint-dir", ckdir, "--resume"]
    supervised.main(base + ["--epochs", "2",
                            "--metrics-csv", str(tmp_path / "a.csv")])
    assert os.path.isdir(os.path.join(ckdir, "segformer_last"))
    supervised.main(base + ["--epochs", "4",
                            "--metrics-csv", str(tmp_path / "b.csv")])
    # first run logged epochs 0,1; the resumed run continues at 2,3
    assert _read_epochs(str(tmp_path / "a.csv")) == [0, 1]
    assert _read_epochs(str(tmp_path / "b.csv")) == [2, 3]


def test_autoencoder_cli_resumes(tmp_path):
    from semisupervisedobjectdetection_tpu.cli import autoencoder

    ckdir = str(tmp_path / "ck")
    base = ["--synthetic", "--synthetic-n", "6", "--variant", "b0",
            "--img-size", "64", "--batch-size", "2", "--dtype", "float32",
            "--checkpoint-dir", ckdir, "--resume"]
    autoencoder.main(base + ["--epochs", "1",
                             "--metrics-csv", str(tmp_path / "a.csv")])
    assert os.path.isdir(os.path.join(ckdir, "segformer_autoencoder_last"))
    autoencoder.main(base + ["--epochs", "2",
                             "--metrics-csv", str(tmp_path / "b.csv")])
    assert _read_epochs(str(tmp_path / "a.csv")) == [0]
    assert _read_epochs(str(tmp_path / "b.csv")) == [1]


def test_transfer_cli_resumes(tmp_path):
    from semisupervisedobjectdetection_tpu.cli import transfer

    ckdir = str(tmp_path / "ck")
    base = ["--synthetic", "--synthetic-n", "6", "--variant", "b0",
            "--img-size", "64", "--batch-size", "2", "--dtype", "float32",
            "--frozen", "0", "--prompt-tokens", "1,1,1,1",
            "--checkpoint-dir", ckdir, "--resume"]
    transfer.main(base + ["--epochs", "2",
                          "--metrics-csv", str(tmp_path / "a.csv")])
    assert os.path.isdir(os.path.join(ckdir, "segformer_last"))
    transfer.main(base + ["--epochs", "4",
                          "--metrics-csv", str(tmp_path / "b.csv")])
    assert _read_epochs(str(tmp_path / "a.csv")) == [0, 1]
    assert _read_epochs(str(tmp_path / "b.csv")) == [2, 3]


def test_baseline_cnn_cli_resumes(tmp_path):
    from semisupervisedobjectdetection_tpu.cli import baseline_cnn

    ckdir = str(tmp_path / "ck")
    base = ["--synthetic", "--synthetic-n", "4", "--img-size", "64",
            "--batch-size", "2", "--dtype", "float32",
            "--archs", "deeplabv3p", "--encoder-depths", "1,1,1,1",
            "--encoder-groups", "2", "--encoder-base-width", "8",
            "--checkpoint-dir", ckdir, "--resume"]
    baseline_cnn.main(base + ["--epochs", "1",
                              "--metrics-csv", str(tmp_path / "a.csv")])
    assert os.path.isdir(os.path.join(ckdir, "deeplabv3p_last"))
    baseline_cnn.main(base + ["--epochs", "2",
                              "--metrics-csv", str(tmp_path / "b.csv")])
    assert _read_epochs(str(tmp_path / "a.csv")) == [0]
    assert _read_epochs(str(tmp_path / "b.csv")) == [1]


def test_fewshot_cli_saves_best_and_resumes(tmp_path):
    # The reference fewshot loops save best-eval checkpoints too
    # (segFormer_fewshot_learning.py:160-166,323-328); this covers both
    # that parity (a best checkpoint appears) and the --resume contract.
    from semisupervisedobjectdetection_tpu.cli import fewshot

    ckdir = str(tmp_path / "ck")
    base = ["--synthetic", "--synthetic-n", "6", "--variant", "b0",
            "--img-size", "64", "--batch-size", "2", "--dtype", "float32",
            "--mode", "ae", "--iterations", "2",
            "--checkpoint-dir", ckdir, "--resume"]
    fewshot.main(base + ["--epochs", "1",
                         "--metrics-csv", str(tmp_path / "a.csv")])
    assert os.path.isdir(os.path.join(ckdir, "fewshot_ae_last"))
    best = [d for d in os.listdir(ckdir)
            if d.startswith("fewshot_ae") and not d.endswith("_last")]
    assert best, "no best-eval checkpoint was written"
    fewshot.main(base + ["--epochs", "2",
                         "--metrics-csv", str(tmp_path / "b.csv")])
    assert _read_epochs(str(tmp_path / "a.csv")) == [0]
    assert _read_epochs(str(tmp_path / "b.csv")) == [1]


def test_vit_semi_cli_resumes_both_models(tmp_path):
    from semisupervisedobjectdetection_tpu.cli import vit_pipeline

    ckdir = str(tmp_path / "ck")
    base = ["--synthetic", "--synthetic-n", "4", "--img-size", "32",
            "--patch-size", "8", "--vit", "small", "--vit-depth", "1",
            "--batch-size", "2", "--dtype", "float32", "--mode", "semi",
            "--checkpoint-dir", ckdir, "--resume"]
    vit_pipeline.main(base + ["--epochs", "1",
                              "--metrics-csv", str(tmp_path / "a.csv")])
    for p in ("vit_semi_last", "vit_semi_student_last"):
        assert os.path.isdir(os.path.join(ckdir, p))
    vit_pipeline.main(base + ["--epochs", "2",
                              "--metrics-csv", str(tmp_path / "b.csv")])
    assert _read_epochs(str(tmp_path / "a.csv")) == [0]
    assert _read_epochs(str(tmp_path / "b.csv")) == [1]


def test_ema_cli_resumes_both_models(tmp_path):
    from semisupervisedobjectdetection_tpu.cli import teacher_student

    ckdir = str(tmp_path / "ck")
    base = ["--synthetic", "--synthetic-n", "6", "--variant", "b0",
            "--img-size", "64", "--batch-size", "2", "--dtype", "float32",
            "--ema-mode", "--checkpoint-dir", ckdir, "--resume"]
    teacher_student.main(base + ["--epochs", "1",
                                 "--metrics-csv", str(tmp_path / "a.csv")])
    for p in ("ts_teacher_last", "ts_student_last"):
        assert os.path.isdir(os.path.join(ckdir, p))
    teacher_student.main(base + ["--epochs", "2",
                                 "--metrics-csv", str(tmp_path / "b.csv")])
    assert _read_epochs(str(tmp_path / "a.csv")) == [0]
    assert _read_epochs(str(tmp_path / "b.csv")) == [1]


def test_async_save_last_roundtrip_and_coalesce(tmp_path):
    """save_last_async (orbax_io._AsyncSaver): the background write lands
    after wait_pending_saves() and round-trips through load_last; rapid
    re-submits for the same (dir, prefix) coalesce to the NEWEST state
    (the _last contract only needs the latest)."""
    from semisupervisedobjectdetection_tpu.checkpoint.orbax_io import (
        save_last_async,
        wait_pending_saves,
    )

    state = _tiny_state()
    save_last_async(str(tmp_path), "async", state, epoch=1, best_loss=0.9)
    save_last_async(str(tmp_path), "async", state, epoch=2, best_loss=0.7)
    save_last_async(str(tmp_path), "async", state, epoch=5, best_loss=0.4)
    wait_pending_saves()
    got = load_last(str(tmp_path), "async", _tiny_state(seed=1))
    assert got is not None
    restored, start_epoch, best = got
    assert start_epoch == 6 and best == 0.4
    np.testing.assert_array_equal(
        np.asarray(restored.params["decode_head"]["classifier"]["kernel"]),
        np.asarray(state.params["decode_head"]["classifier"]["kernel"]))


def test_async_save_is_donation_safe(tmp_path):
    """The async writer must snapshot device-side BEFORE returning: the
    caller's buffers are donated by the next train step while the write
    is still in flight. Donate (delete) the original buffers right after
    submit and assert the checkpoint still carries the pre-donation
    values."""
    from semisupervisedobjectdetection_tpu.checkpoint.orbax_io import (
        save_last_async,
        wait_pending_saves,
    )

    state = _tiny_state()
    key = state.params["decode_head"]["classifier"]["kernel"]
    expect = np.asarray(key).copy()

    save_last_async(str(tmp_path), "donated", state, epoch=0)
    # donate every param buffer the saver was handed (x+1 overwrites
    # in place under donation; the originals are deleted)
    bump = jax.jit(lambda t: jax.tree.map(lambda x: x + 1, t),
                   donate_argnums=0)
    new_params = bump(state.params)
    jax.block_until_ready(new_params)
    wait_pending_saves()

    got = load_last(str(tmp_path), "donated", _tiny_state(seed=1))
    assert got is not None
    np.testing.assert_array_equal(
        np.asarray(got[0].params["decode_head"]["classifier"]["kernel"]),
        expect)
