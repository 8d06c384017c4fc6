"""AOT serving artifacts (checkpoint/serving_export.py).

The reference has no deployment story (SURVEY.md L4 — a hand-edited
Prediction() mode); the artifact path is the TPU-native addition: one
self-contained file (weights baked into StableHLO) whose loaded predict
must match the live model's predict bit-for-bit on the same backend."""

import numpy as np
import pytest

from semisupervisedobjectdetection_tpu.api import SegFormerModel
from semisupervisedobjectdetection_tpu.checkpoint.serving_export import (
    ExportedPredictor,
    load_serving,
    read_header,
)
from semisupervisedobjectdetection_tpu.core.config import mit_b0

CFG = mit_b0(depths=(1, 1, 1, 1), hidden_sizes=(8, 16, 32, 64),
             num_heads=(1, 2, 4, 8), decoder_hidden=32)
SIZE = 64
BATCH = 4


@pytest.fixture(scope="module")
def model():
    return SegFormerModel(config=CFG)


@pytest.fixture(scope="module")
def artifact(model, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("aot") / "tiny.ssod")
    header = model.export_serving(path, batch_size=BATCH, img_size=SIZE,
                                  platforms=("cpu",))
    return path, header


def _images(b, seed=0):
    rng = np.random.default_rng(seed)
    return rng.random((b, SIZE, SIZE, 3), np.float32)


def test_header_roundtrip(artifact):
    path, header = artifact
    assert read_header(path) == header
    assert header["batch"] == BATCH
    assert header["img_size"] == SIZE
    assert header["quant"] == "none"
    assert "cpu" in header["platforms"]


def test_loaded_predict_matches_model(artifact, model):
    path, _ = artifact
    pred = load_serving(path)
    assert isinstance(pred, ExportedPredictor)
    x = _images(BATCH)
    got = pred.predict(x)
    want = np.asarray(model.predict(x))
    assert got.shape == want.shape == (BATCH, SIZE, SIZE)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_partial_batch_pads_and_slices(artifact, model):
    path, _ = artifact
    pred = load_serving(path)
    x = _images(BATCH - 1, seed=1)
    got = pred.predict(x)
    assert got.shape == (BATCH - 1, SIZE, SIZE)
    np.testing.assert_allclose(got, np.asarray(model.predict(x)),
                               atol=1e-6)


def test_shape_contract_errors(artifact):
    path, _ = artifact
    pred = load_serving(path)
    with pytest.raises(ValueError, match="exceeds"):
        pred.predict(_images(BATCH + 1))
    with pytest.raises(ValueError, match="compiled"):
        pred.predict(np.zeros((1, SIZE, SIZE + 8, 3), np.float32))


def test_not_an_artifact(tmp_path):
    bad = tmp_path / "bad.ssod"
    bad.write_bytes(b"not an artifact at all")
    with pytest.raises(ValueError, match="magic"):
        read_header(str(bad))


def test_int8_export_serves_quantized_weights(model, tmp_path):
    model.quantize()
    try:
        path = str(tmp_path / "tiny_int8.ssod")
        header = model.export_serving(path, batch_size=2, img_size=SIZE,
                                      platforms=("cpu",))
        assert header["quant"] == "int8"
        x = _images(2, seed=2)
        got = load_serving(path).predict(x)
        want = np.asarray(model.predict(x))  # int8 snapshot active
        np.testing.assert_allclose(got, want, atol=1e-6)
    finally:
        model.dequantize()


def test_artifact_drives_inference_server(artifact):
    """cli.serve accepts the loaded artifact as its model."""
    from semisupervisedobjectdetection_tpu.cli.serve import InferenceServer

    path, header = artifact
    pred = load_serving(path)
    srv = InferenceServer(pred, img_size=header["img_size"],
                          max_batch=header["batch"], batch_window_ms=1.0,
                          variant="artifact")
    srv.start()
    try:
        mask = srv.submit(_images(1, seed=3)[0])
        assert mask.shape == (SIZE, SIZE)
        assert np.all((mask >= 0) & (mask <= 1))
    finally:
        srv.stop()


def test_export_cli_writes_artifact(tmp_path):
    from semisupervisedobjectdetection_tpu.cli import export as export_cli

    out = str(tmp_path / "cli.ssod")
    export_cli.main(["--variant", "b0", "--img-size", "32", "--batch", "2",
                     "--platforms", "cpu", "--out", out])
    hdr = read_header(out)
    assert hdr["batch"] == 2 and hdr["img_size"] == 32


def test_fp8_export_serves_quantized_weights(model, tmp_path):
    """fp8 (e4m3) snapshots export through jax.export like int8: the
    baked StableHLO carries the fp8 kernels and the loaded artifact
    predicts bit-identically to the live quantized model."""
    model.quantize(kind="fp8")
    try:
        path = str(tmp_path / "tiny_fp8.ssod")
        header = model.export_serving(path, batch_size=2, img_size=SIZE,
                                      platforms=("cpu",))
        assert header["quant"] == "fp8"
        x = _images(2, seed=2)
        got = load_serving(path).predict(x)
        want = np.asarray(model.predict(x))  # fp8 snapshot active
        np.testing.assert_allclose(got, want, atol=1e-6)
    finally:
        model.dequantize()
