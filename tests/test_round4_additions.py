"""Round-4 parity/polish additions.

Covers: per-image mIoU (the paper convention, alongside the
batch-aggregated driver metric), the loss-curve PNG artifact
(`utils/plot_metrics.py`, replacing the reference's
`segFormer_main.py:88-98` figures), and the --plot-curves CLI wiring.
"""

import os

import jax.numpy as jnp
import numpy as np

from semisupervisedobjectdetection_tpu.eval.metrics import (
    binary_miou,
    per_image_miou,
)
from semisupervisedobjectdetection_tpu.utils.plot_metrics import plot_metrics


def test_per_image_miou_matches_batch_on_identical_images():
    # When every image has the same confusion counts, both conventions
    # must agree.
    gt = np.zeros((4, 8, 8), np.float32)
    gt[:, :4, :] = 1.0
    pred = np.zeros((4, 8, 8), np.float32)
    pred[:, :2, :] = 1.0  # half the foreground, no false positives
    a = float(binary_miou(jnp.asarray(pred), jnp.asarray(gt)))
    b = float(per_image_miou(jnp.asarray(pred), jnp.asarray(gt)))
    assert abs(a - b) < 1e-6


def test_per_image_miou_weights_images_equally():
    # Image 0: tiny foreground, fully missed. Image 1: huge foreground,
    # fully hit. Batch-aggregated IoU is dominated by image 1's pixels;
    # per-image averages the 0-ish and 1.0 scores instead.
    gt = np.zeros((2, 16, 16), np.float32)
    gt[0, 0, 0] = 1.0          # 1 fg pixel
    gt[1, :, :8] = 1.0         # 128 fg pixels
    pred = np.zeros((2, 16, 16), np.float32)
    pred[1, :, :8] = 1.0       # perfect on image 1, miss on image 0
    agg = float(binary_miou(jnp.asarray(pred), jnp.asarray(gt)))
    per = float(per_image_miou(jnp.asarray(pred), jnp.asarray(gt)))
    # aggregated: fg IoU = 128/129 ~ 0.992 -> miou ~ 0.994
    assert agg > 0.98
    # per-image: image0 fg IoU 0 (bg ~ 255/256), image1 1.0 -> ~0.75
    assert 0.7 < per < 0.8
    # absent-in-both class is vacuous-perfect: empty pred+gt scores 1.0
    z = jnp.zeros((1, 4, 4))
    assert float(per_image_miou(z, z)) == 1.0


def test_plot_metrics_renders_png(tmp_path):
    csv_path = str(tmp_path / "run.csv")
    with open(csv_path, "w") as f:
        f.write("step,wall_s,train_loss,eval_loss,dice,miou,"
                "miou_per_image,fps,lr\n")
        for e in range(3):
            f.write(f"{e},{e * 2.0},{1.0 - 0.1 * e},{1.1 - 0.1 * e},"
                    f"{0.2 + 0.1 * e},{0.15 + 0.1 * e},"
                    f"{0.17 + 0.1 * e},3.0,1e-5\n")
    out = plot_metrics(csv_path)
    assert out == str(tmp_path / "run.png")
    assert os.path.getsize(out) > 1000  # a real PNG, not a stub


def test_plot_metrics_missing_csv_is_soft(tmp_path, capsys):
    assert plot_metrics(str(tmp_path / "nope.csv")) is None
    assert "skipping" in capsys.readouterr().out


def test_autoencoder_cli_tune_grid(tmp_path, capsys):
    # `--tune` closes the C10 gap: the reference AE script's
    # Hyperparameter_Tuning grid (segFormer_autoencoder_main.py:133-170,
    # lr x weight_decay x scheduler on an 80/20 labeled split, shuffled,
    # save_model=False).
    from semisupervisedobjectdetection_tpu.cli import autoencoder

    ckdir = str(tmp_path / "ck")
    autoencoder.main([
        "--synthetic", "--synthetic-n", "6", "--variant", "b0",
        "--img-size", "64", "--batch-size", "2", "--dtype", "float32",
        "--epochs", "1", "--checkpoint-dir", ckdir,
        "--tune", "--tune-lrs", "1e-3,1e-5", "--tune-wds", "5e-5",
        "--tune-gammas", "0.97"])
    out = capsys.readouterr().out
    assert out.count("best train+eval") == 2  # both grid points ran
    assert "best: lr=" in out
    # tuning never writes checkpoints (reference save_model=False)
    assert not os.path.exists(ckdir) or not os.listdir(ckdir)


def test_fewshot_cli_tune_grid(tmp_path, capsys):
    # Reference grid `segFormer_fewshot_learning.py:362-363` (consumed by
    # the tuning loop at `:387-396`): lr sweep over the few-shot AE loop.
    from semisupervisedobjectdetection_tpu.cli import fewshot

    ckdir = str(tmp_path / "ck")
    fewshot.main([
        "--synthetic", "--synthetic-n", "6", "--variant", "b0",
        "--img-size", "64", "--batch-size", "2", "--dtype", "float32",
        "--epochs", "1", "--mode", "ae", "--iterations", "2",
        "--checkpoint-dir", ckdir,
        "--tune", "--tune-lrs", "1e-3,1e-5"])
    out = capsys.readouterr().out
    assert out.count("best eval") == 2
    assert "best: lr=" in out
    assert not os.path.exists(ckdir) or not os.listdir(ckdir)


def test_supervised_cli_plot_curves_smoke(tmp_path):
    from semisupervisedobjectdetection_tpu.cli import supervised

    csv_path = str(tmp_path / "m.csv")
    supervised.main([
        "--synthetic", "--synthetic-n", "4", "--variant", "b0",
        "--img-size", "64", "--batch-size", "2", "--dtype", "float32",
        "--epochs", "1", "--checkpoint-dir", str(tmp_path / "ck"),
        "--metrics-csv", csv_path, "--plot-curves"])
    assert os.path.exists(str(tmp_path / "m.png"))
    # the CSV now carries both mIoU conventions
    with open(csv_path) as f:
        header = f.readline()
    assert "miou" in header and "miou_per_image" in header
