"""HTTP inference server: serve a trained SegFormer over REST.

The reference has NO serving path — inference is the hand-edited
`Prediction()` mode of `main_segformer/segFormer_main.py:103-144` plus
visdom panels for visual inspection. This module is the production-serving
addition: a dependency-free (stdlib `http.server`) daemon around the
library's serving paths.

TPU-first design decisions:

- **One compiled batch shape.** Requests are decoded on HTTP worker
  threads, then queued; a single model thread drains the queue into
  fixed-size batches, zero-padding partial ones to ``--max-batch``. XLA
  compiles exactly one predict executable — serving each request at its
  natural batch size would recompile per distinct size and destroy tail
  latency.
- **Dynamic batching.** The model thread waits up to ``--batch-window-ms``
  after the first queued request for more to arrive, so concurrent clients
  share a step (MXU utilization scales with batch) while a lone request
  still sees near-zero queueing delay.
- **int8 serving.** ``--int8`` serves through the per-channel int8
  snapshot (`ops/quant.py` — the measured ~271 img/s batch-16 path on
  v5e vs ~74 ms f32); ``--int8-snapshot DIR`` persists/loads the
  quantized weights so a serving process never needs the f32 checkpoint.
- **Single device owner.** All model work happens on the one model
  thread: the axon TPU tunnel serializes clients, so funneling every
  predict through one thread is required, not just tidy.

Endpoints:
  GET  /healthz           -> {"status": "ok", platform, variant, int8, ...}
  GET  /stats             -> request/batch counters incl. mean batch fill
  POST /predict           -> body: PNG/JPEG image (any size; resized to
                             the model's input, mask resized back), OR
                             Content-Type: application/octet-stream with
                             one raw uint8 HWC image at exactly
                             img_size x img_size x 3 — the codec-free
                             fast path for throughput clients (host PNG
                             decode/encode is the measured bottleneck on
                             weak serving hosts).
                             Query: ?format=png (default for image
                             bodies; binarized L mask), ?format=npy
                             (float32 probability map), or ?format=raw
                             (default for octet-stream bodies; uint8
                             binarized mask bytes, img_size^2),
                             &threshold=0.5 (binarize level).
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from typing import Optional

import numpy as np


class _Pending:
    """A queued request: input array + a slot for the result."""

    __slots__ = ("arr", "done", "result", "error")

    def __init__(self, arr: np.ndarray):
        self.arr = arr
        self.done = threading.Event()
        self.result: Optional[np.ndarray] = None
        self.error: Optional[BaseException] = None


class InferenceServer:
    """Batching HTTP server around a `SegFormerModel`-like object.

    `model` only needs a `predict(batch_nhwc) -> (B,H,W) float` method;
    construction/checkpoint loading stays in `main()` so tests can drive
    the server in-process with a tiny CPU model.
    """

    def __init__(self, model, img_size: int, max_batch: int = 8,
                 batch_window_ms: float = 5.0, quant: str = "none",
                 variant: str = "?"):
        self.model = model
        self.img_size = int(img_size)
        self.max_batch = max(int(max_batch), 1)
        self.batch_window_s = batch_window_ms / 1e3
        self.quant = quant or "none"
        self.variant = variant
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        self._draining = threading.Event()
        self._httpd = None
        self._threads: list = []
        self.stats = {"requests": 0, "batches": 0, "errors": 0,
                      "images_in_batches": 0}
        self._stats_lock = threading.Lock()
        # end-to-end submit latencies (seconds), last 1024 — enough for
        # stable p50/p99 in /stats without unbounded growth
        from collections import deque

        self._lat = deque(maxlen=1024)

    # ---------------------------------------------------------- model thread
    def _warmup(self) -> None:
        z = np.zeros((self.max_batch, self.img_size, self.img_size, 3),
                     np.float32)
        self.model.predict(z)

    def _model_loop(self) -> None:
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                if self._draining.is_set():
                    return   # graceful stop: queue drained, we are done
                continue
            batch = [first]
            deadline = time.monotonic() + self.batch_window_s
            while len(batch) < self.max_batch:
                wait = deadline - time.monotonic()
                if wait <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=wait))
                except queue.Empty:
                    break
            n = len(batch)
            padded = np.zeros(
                (self.max_batch, self.img_size, self.img_size, 3),
                np.float32)
            for i, p in enumerate(batch):
                padded[i] = p.arr
            try:
                masks = np.asarray(self.model.predict(padded))
                for i, p in enumerate(batch):
                    p.result = masks[i]
            except BaseException as e:  # surface per-request
                for p in batch:
                    p.error = e
                with self._stats_lock:
                    self.stats["errors"] += n
            finally:
                for p in batch:
                    p.done.set()
                with self._stats_lock:
                    self.stats["batches"] += 1
                    self.stats["images_in_batches"] += n

    def submit(self, arr: np.ndarray, timeout: float = 60.0) -> np.ndarray:
        """Queue one (H,W,3) float image sized to img_size; block for the
        (img_size, img_size) probability mask."""
        if self._draining.is_set() or self._stop.is_set():
            raise RuntimeError("server is shutting down")
        t0 = time.monotonic()
        p = _Pending(arr)
        self._q.put(p)
        with self._stats_lock:
            self.stats["requests"] += 1
        if not p.done.wait(timeout):
            raise TimeoutError("predict timed out")
        if p.error is not None:
            raise p.error
        with self._stats_lock:
            self._lat.append(time.monotonic() - t0)
        return p.result

    # ------------------------------------------------------------- http part
    def _make_handler(server):  # noqa: N805 — bound as a class factory
        from http.server import BaseHTTPRequestHandler

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet; stats carry the signal
                pass

            def _json(self, code: int, obj) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                path = self.path.split("?")[0]
                if path == "/healthz":
                    import jax

                    self._json(200, {
                        "status": "ok",
                        "platform": jax.devices()[0].platform,
                        "variant": server.variant,
                        "img_size": server.img_size,
                        "max_batch": server.max_batch,
                        "quant": server.quant,
                        "int8": server.quant == "int8",
                    })
                elif path == "/stats":
                    with server._stats_lock:
                        s = dict(server.stats)
                        lat = sorted(server._lat)
                    s["mean_batch_fill"] = (
                        s["images_in_batches"] / s["batches"]
                        if s["batches"] else 0.0)
                    if lat:
                        def q(p):
                            return round(
                                lat[min(int(p * (len(lat) - 1)),
                                        len(lat) - 1)] * 1e3, 2)
                        s["latency_ms"] = {"p50": q(0.50), "p90": q(0.90),
                                           "p99": q(0.99),
                                           "n": len(lat)}
                    self._json(200, s)
                else:
                    self._json(404, {"error": f"no route {path}"})

            def do_POST(self):
                path, _, qs = self.path.partition("?")
                if path != "/predict":
                    self._json(404, {"error": f"no route {path}"})
                    return
                params = {}
                for kv in qs.split("&"):
                    if "=" in kv:
                        k, _, v = kv.partition("=")
                        params[k] = v
                # media types are case-insensitive (RFC 9110 §8.3.1)
                raw_input = self.headers.get(
                    "Content-Type", "").split(";")[0].strip().lower() \
                    == "application/octet-stream"
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    raw = self.rfile.read(length)
                    if raw_input:
                        # Raw-tensor fast path: body is one uint8 HWC
                        # image at exactly the model's input size —
                        # bypasses the host PNG/JPEG codec + resize
                        # entirely (the measured bottleneck on weak
                        # serving hosts; device predict is ~59ms/batch-16
                        # while host PNG decode alone starves the batch).
                        s = server.img_size
                        expect = s * s * 3
                        if length != expect:
                            raise ValueError(
                                f"raw payload must be uint8 HWC "
                                f"({s}x{s}x3 = {expect} bytes), "
                                f"got {length}")
                        arr = np.frombuffer(raw, np.uint8).reshape(
                            s, s, 3).astype(np.float32) / 255.0
                        orig_w = orig_h = s
                    else:
                        from PIL import Image

                        img = Image.open(io.BytesIO(raw)).convert("RGB")
                        orig_w, orig_h = img.size
                        resized = img.resize(
                            (server.img_size, server.img_size),
                            Image.BILINEAR)
                        arr = np.asarray(resized, np.float32) / 255.0
                except Exception as e:
                    self._json(400, {"error": f"bad image: {e}"})
                    return
                try:
                    mask = server.submit(arr)
                except Exception as e:
                    self._json(500, {"error": str(e)})
                    return
                # raw input defaults to raw output (no codec either way)
                fmt = params.get("format", "raw" if raw_input else "png")
                mask_h = mask_w = server.img_size
                if fmt == "raw":
                    # binarized uint8 mask (0/255), zero encode cost.
                    # Like the png path, a codec-decoded input gets its
                    # mask back at the ORIGINAL image size (raw-tensor
                    # inputs are already exactly img_size, so this is
                    # free on the fast path); X-Mask-Shape names the
                    # actual dims either way.
                    thr = float(params.get("threshold", 0.5))
                    m = (np.asarray(mask) >= thr).astype(np.uint8) * 255
                    if (orig_h, orig_w) != m.shape:
                        m = np.asarray(Image.fromarray(m, mode="L").resize(
                            (orig_w, orig_h), Image.NEAREST))
                    mask_h, mask_w = m.shape
                    body = m.tobytes()
                    ctype = "application/octet-stream"
                elif fmt == "npy":
                    buf = io.BytesIO()
                    np.save(buf, np.asarray(mask, np.float32))
                    body = buf.getvalue()
                    ctype = "application/octet-stream"
                else:
                    thr = float(params.get("threshold", 0.5))
                    m = (np.asarray(mask) >= thr).astype(np.uint8) * 255
                    out = Image.fromarray(m, mode="L").resize(
                        (orig_w, orig_h), Image.NEAREST)
                    buf = io.BytesIO()
                    out.save(buf, format="PNG")
                    body = buf.getvalue()
                    ctype = "image/png"
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                if fmt == "raw":
                    # raw bytes carry no shape — name it (npy and png
                    # are self-describing)
                    self.send_header("X-Mask-Shape",
                                     f"{mask_h}x{mask_w}")
                self.end_headers()
                self.wfile.write(body)

        return Handler

    def start(self, host: str = "127.0.0.1", port: int = 0) -> int:
        """Warm up the compiled predict, start the model thread and a
        threading HTTP server; returns the bound port (ephemeral if 0)."""
        from http.server import ThreadingHTTPServer

        self._warmup()
        t = threading.Thread(target=self._model_loop, daemon=True,
                             name="sso-serve-model")
        t.start()
        self._threads.append(t)
        self._httpd = ThreadingHTTPServer((host, port),
                                          self._make_handler())
        ht = threading.Thread(target=self._httpd.serve_forever,
                              daemon=True, name="sso-serve-http")
        ht.start()
        self._threads.append(ht)
        return self._httpd.server_address[1]

    def stop(self, drain: bool = True) -> None:
        """Stop serving. With `drain` (default) the HTTP listener closes
        FIRST (no new requests land), then the model thread answers
        everything already queued before exiting — so a SIGTERM'd serving
        VM (spot preemption / maintenance) finishes its in-flight work
        instead of timing those requests out. `drain=False` aborts
        immediately (queued requests hit their submit timeout)."""
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
        if drain:
            self._draining.set()
            for t in self._threads:
                if t.name == "sso-serve-model":
                    t.join(timeout=120.0)
        self._stop.set()


def _serve_until_signal(srv: InferenceServer) -> None:
    """Block until SIGTERM/SIGINT (utils/preemption.py — TPU VM preemption
    sends SIGTERM with a grace window), then drain-stop: the listener
    closes, queued predicts finish, exit 0."""
    from semisupervisedobjectdetection_tpu.utils import preemption

    preemption.install()
    try:
        while not preemption.stop_requested():
            time.sleep(0.2)
    except KeyboardInterrupt:
        pass
    print(f"\nshutting down ({preemption.signal_name()}): draining "
          "in-flight requests", flush=True)
    srv.stop(drain=True)
    print("drained; bye", flush=True)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="Serve a trained SegFormer checkpoint over HTTP "
                    "(POST /predict with a PNG/JPEG body).")
    p.add_argument("--variant", default="b5")
    p.add_argument("--img-size", type=int, default=512)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--pretrain-weight", help="orbax checkpoint to restore")
    p.add_argument("--hf-weights",
                   help="torch .pth/.safetensors SegFormer weights")
    p.add_argument("--artifact",
                   help="AOT serving artifact (cli.export / "
                        "SegFormerModel.export_serving) — serves the "
                        "baked-in weights; no checkpoint or model build")
    p.add_argument("--int8", action="store_true",
                   help="serve through the int8 snapshot (~2x MXU rate)")
    p.add_argument("--fp8", action="store_true",
                   help="serve through an fp8 (e4m3) snapshot — native-"
                        "rate on fp8-MXU TPUs (v6e+), upcast elsewhere")
    p.add_argument("--int8-snapshot",
                   help="with --int8/--fp8: snapshot dir — loaded if "
                        "present (width auto-detected), else written "
                        "after quantize()")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--batch-window-ms", type=float, default=5.0)
    p.add_argument("--perf", action="store_true",
                   help="tanh-approx GELU preset")
    args = p.parse_args(argv)

    import os

    if args.artifact:
        from semisupervisedobjectdetection_tpu.checkpoint.serving_export \
            import load_serving

        predictor = load_serving(args.artifact)
        hdr = predictor.header
        srv = InferenceServer(
            predictor, img_size=hdr["img_size"],
            max_batch=hdr["batch"],
            batch_window_ms=args.batch_window_ms,
            quant=hdr.get("quant") or "none",
            variant=f"artifact:{os.path.basename(args.artifact)}")
        port = srv.start(args.host, args.port)
        print(f"serving artifact {args.artifact} on "
              f"http://{args.host}:{port}  (batch {hdr['batch']}, "
              f"quant {hdr.get('quant')})")
        _serve_until_signal(srv)
        return

    from semisupervisedobjectdetection_tpu.api import SegFormerModel
    from semisupervisedobjectdetection_tpu.core.config import MIT_VARIANTS

    cfg = MIT_VARIANTS[args.variant](dtype=args.dtype)
    if args.perf:
        cfg = cfg.replace(gelu_approx=True)
    model = SegFormerModel(pretrain_weight=args.pretrain_weight,
                           config=cfg, hf_weights=args.hf_weights)
    if not (args.pretrain_weight or args.hf_weights):
        print("WARNING: serving randomly initialized weights "
              "(no --pretrain-weight / --hf-weights)")
    if args.int8 and args.fp8:
        raise SystemExit("--int8 and --fp8 are mutually exclusive")
    quant = "fp8" if args.fp8 else ("int8" if args.int8 else "none")
    if quant != "none":
        if args.int8_snapshot and os.path.exists(args.int8_snapshot):
            model.load_quantized(args.int8_snapshot)
            print(f"quantized snapshot loaded: {args.int8_snapshot}")
        else:
            model.quantize(kind=quant)
            if args.int8_snapshot:
                model.save_quantized(args.int8_snapshot)
                print(f"{quant} snapshot written: {args.int8_snapshot}")

    srv = InferenceServer(model, img_size=args.img_size,
                          max_batch=args.max_batch,
                          batch_window_ms=args.batch_window_ms,
                          quant=quant, variant=args.variant)
    port = srv.start(args.host, args.port)
    print(f"serving on http://{args.host}:{port}  "
          f"(batch {args.max_batch}, window {args.batch_window_ms}ms"
          + (f", {quant}" if quant != "none" else "") + ")")
    _serve_until_signal(srv)


if __name__ == "__main__":
    main()
