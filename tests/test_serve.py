"""HTTP inference server (cli/serve.py): routes, batching, formats.

The reference has no serving path (SURVEY.md L4 row — visdom panels and a
hand-edited Prediction() mode); these tests cover the serving addition:
fixed-shape batched predict, PNG/npy responses, health/stats routes."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from semisupervisedobjectdetection_tpu.api import SegFormerModel
from semisupervisedobjectdetection_tpu.cli.serve import InferenceServer
from semisupervisedobjectdetection_tpu.core.config import mit_b0

CFG = mit_b0(depths=(1, 1, 1, 1), hidden_sizes=(8, 16, 32, 64),
             num_heads=(1, 2, 4, 8), decoder_hidden=32)
SIZE = 64


@pytest.fixture(scope="module")
def server():
    model = SegFormerModel(config=CFG)
    srv = InferenceServer(model, img_size=SIZE, max_batch=4,
                          batch_window_ms=20.0, variant="b0-tiny")
    port = srv.start()
    yield srv, f"http://127.0.0.1:{port}"
    srv.stop()


def _png_bytes(h=80, w=96, seed=0) -> bytes:
    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _post(url: str, body: bytes):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_healthz(server):
    _, base = server
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        obj = json.loads(r.read())
    assert obj["status"] == "ok"
    assert obj["img_size"] == SIZE
    assert obj["max_batch"] == 4


def test_predict_png_roundtrip(server):
    _, base = server
    status, ctype, body = _post(base + "/predict", _png_bytes(80, 96))
    assert status == 200 and ctype == "image/png"
    mask = np.asarray(Image.open(io.BytesIO(body)))
    # mask comes back at the ORIGINAL image size, binarized
    assert mask.shape == (80, 96)
    assert set(np.unique(mask)) <= {0, 255}


def test_predict_npy_probabilities(server):
    _, base = server
    status, ctype, body = _post(base + "/predict?format=npy",
                                _png_bytes(seed=1))
    assert status == 200 and ctype == "application/octet-stream"
    probs = np.load(io.BytesIO(body))
    # npy format returns the model-resolution float probability map
    assert probs.shape == (SIZE, SIZE) and probs.dtype == np.float32
    assert float(probs.min()) >= 0.0 and float(probs.max()) <= 1.0


def test_concurrent_requests_share_batches(server):
    srv, base = server
    before = dict(srv.stats)
    results = [None] * 6

    def worker(i):
        results[i] = _post(base + "/predict", _png_bytes(seed=10 + i))

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r[0] == 200 for r in results)
    with urllib.request.urlopen(base + "/stats", timeout=30) as r:
        stats = json.loads(r.read())
    new_batches = stats["batches"] - before["batches"]
    # 6 requests against max_batch=4 with a 20ms window must coalesce
    # into fewer steps than requests (>= 2 batches, <= 6)
    assert 2 <= new_batches <= 6
    assert stats["requests"] - before["requests"] == 6
    # end-to-end latency percentiles (submit -> result) are reported
    lat = stats["latency_ms"]
    assert lat["n"] >= 6
    assert 0 < lat["p50"] <= lat["p90"] <= lat["p99"]


def test_batched_result_matches_direct_predict(server):
    """The padded fixed-shape batch must return the same mask as calling
    model.predict directly on the single image (padding rows can't leak
    into real outputs — no cross-batch ops in the model)."""
    srv, base = server
    png = _png_bytes(64, 64, seed=42)
    img = np.asarray(Image.open(io.BytesIO(png)).convert("RGB"),
                     np.float32) / 255.0
    direct = np.asarray(srv.model.predict(
        np.broadcast_to(img, (4, SIZE, SIZE, 3)).copy()))[0]
    _, _, body = _post(base + "/predict?format=npy", png)
    served = np.load(io.BytesIO(body))
    np.testing.assert_allclose(served, direct, atol=2e-5)


def _post_raw(url: str, body: bytes):
    req = urllib.request.Request(
        url, data=body, method="POST",
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_predict_raw_tensor_roundtrip(server):
    """The codec-free fast path: uint8 HWC bytes in, uint8 mask bytes out
    (no PNG encode/decode on either side), numerically identical to the
    image-body path on the same pixels."""
    srv, base = server
    rng = np.random.default_rng(7)
    img_u8 = rng.integers(0, 255, (SIZE, SIZE, 3), dtype=np.uint8)
    status, ctype, body = _post_raw(base + "/predict", img_u8.tobytes())
    assert status == 200 and ctype == "application/octet-stream"
    mask = np.frombuffer(body, np.uint8)
    assert mask.shape == (SIZE * SIZE,)
    assert set(np.unique(mask)) <= {0, 255}

    # same pixels through the raw path with format=npy == direct predict
    _, _, body_npy = _post_raw(base + "/predict?format=npy",
                               img_u8.tobytes())
    probs = np.load(io.BytesIO(body_npy))
    direct = np.asarray(srv.model.predict(np.broadcast_to(
        img_u8.astype(np.float32) / 255.0, (4, SIZE, SIZE, 3)).copy()))[0]
    np.testing.assert_allclose(probs, direct, atol=2e-5)
    # and the raw binarized bytes agree with thresholding those probs
    np.testing.assert_array_equal(
        mask.reshape(SIZE, SIZE), (probs >= 0.5).astype(np.uint8) * 255)


def test_predict_raw_tensor_wrong_length_is_400(server):
    _, base = server
    req = urllib.request.Request(
        base + "/predict", data=b"\x00" * 100, method="POST",
        headers={"Content-Type": "application/octet-stream"})
    try:
        urllib.request.urlopen(req, timeout=30)
        raised = None
    except urllib.error.HTTPError as e:
        raised = e.code
    assert raised == 400


def test_bad_image_400_and_unknown_route_404(server):
    _, base = server
    req = urllib.request.Request(base + "/predict", data=b"not an image",
                                 method="POST")
    try:
        urllib.request.urlopen(req, timeout=30)
        raised = None
    except urllib.error.HTTPError as e:
        raised = e.code
    assert raised == 400
    try:
        urllib.request.urlopen(base + "/nope", timeout=30)
        raised = None
    except urllib.error.HTTPError as e:
        raised = e.code
    assert raised == 404


def test_stop_drains_queued_requests():
    """stop(drain=True): the listener closes first, then every queued
    request is answered before the model thread exits — a SIGTERM'd
    serving VM (cli/serve._serve_until_signal) must not time out
    in-flight clients. A fresh server (not the module fixture) because
    stop() is the behavior under test."""
    import time

    model = SegFormerModel(config=CFG)
    srv = InferenceServer(model, img_size=SIZE, max_batch=2,
                          batch_window_ms=1.0, variant="b0-tiny")
    srv.start()

    n = 6
    results, errors = [None] * n, [None] * n

    def client(i):
        arr = np.random.default_rng(i).uniform(
            size=(SIZE, SIZE, 3)).astype(np.float32)
        try:
            results[i] = srv.submit(arr, timeout=120.0)
        except BaseException as e:
            errors[i] = e

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n)]
    for t in threads:
        t.start()
    time.sleep(0.05)          # let the submits queue up
    srv.stop(drain=True)      # must answer all six, then return
    for t in threads:
        t.join(timeout=120)
    assert all(e is None for e in errors), errors
    assert all(r is not None and r.shape == (SIZE, SIZE)
               for r in results)
    # post-drain submits are refused, not silently queued forever
    with pytest.raises(RuntimeError):
        srv.submit(np.zeros((SIZE, SIZE, 3), np.float32), timeout=1.0)


def test_raw_content_type_is_case_insensitive(server):
    """Media types are case-insensitive (RFC 9110 §8.3.1): an oddly-cased
    octet-stream header must still route to the raw-tensor path, not fall
    through to PIL (which would 400 on the raw bytes)."""
    _, base = server
    rng = np.random.default_rng(11)
    img_u8 = rng.integers(0, 255, (SIZE, SIZE, 3), dtype=np.uint8)
    req = urllib.request.Request(
        base + "/predict", data=img_u8.tobytes(), method="POST",
        headers={"Content-Type": "Application/Octet-Stream"})
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.status == 200
        assert r.headers.get("X-Mask-Shape") == f"{SIZE}x{SIZE}"
        body = r.read()
    assert len(body) == SIZE * SIZE


def test_png_input_with_raw_format_returns_original_size(server):
    """?format=raw on a codec-decoded input must (like the png path)
    return the mask at the ORIGINAL image size, with X-Mask-Shape naming
    the dims — not an undocumented img_size^2 blob."""
    _, base = server
    h, w = 40, 72                                    # non-square, != SIZE
    req = urllib.request.Request(
        base + "/predict?format=raw", data=_png_bytes(h, w, seed=3),
        method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.status == 200
        assert r.headers.get("X-Mask-Shape") == f"{h}x{w}"
        body = r.read()
    mask = np.frombuffer(body, np.uint8).reshape(h, w)
    assert set(np.unique(mask)) <= {0, 255}
    # consistent with the png path on the same payload
    _, _, png_body = _post(base + "/predict", _png_bytes(h, w, seed=3))
    png_mask = np.asarray(Image.open(io.BytesIO(png_body)))
    np.testing.assert_array_equal(mask, png_mask)
