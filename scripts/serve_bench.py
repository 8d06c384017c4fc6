"""Serving-daemon throughput A/B: PNG bodies vs raw uint8 tensors.

Measures the host-codec cost the raw-tensor input path (cli/serve.py,
`Content-Type: application/octet-stream`) removes: starts the daemon
in-process, drives it with N concurrent clients posting (a) PNG-encoded
images with PNG responses and (b) raw uint8 HWC payloads with raw mask
responses, and prints img/s + latency for each. On the 1-vCPU axon
harness the daemon is host-bound (round-3 note: 3.2 img/s at 32
concurrent, device predict 271 img/s), so the delta here is the codec
share specifically.

    python scripts/serve_bench.py [--variant b5 --img-size 512 --int8]
    python scripts/serve_bench.py --tiny          # CPU smoke (~1 min)

Runs the model on whatever platform jax selects (the TPU under axon) —
do NOT run while another process owns the tunnel.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def drive(base: str, payloads, n_clients: int, reqs_per_client: int,
          raw: bool):
    import urllib.request

    lat = []
    lock = threading.Lock()

    def worker(ci):
        for r in range(reqs_per_client):
            body = payloads[(ci * reqs_per_client + r) % len(payloads)]
            req = urllib.request.Request(
                base + "/predict", data=body, method="POST",
                headers=({"Content-Type": "application/octet-stream"}
                         if raw else {}))
            t0 = time.monotonic()
            with urllib.request.urlopen(req, timeout=300) as resp:
                resp.read()
            with lock:
                lat.append(time.monotonic() - t0)

    t0 = time.monotonic()
    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0
    n = n_clients * reqs_per_client
    lat.sort()
    def q(p):
        return lat[min(int(p * (len(lat) - 1)), len(lat) - 1)] * 1e3

    return dict(img_per_s=n / wall, wall_s=wall, n=n,
                p50_ms=q(0.50), p99_ms=q(0.99))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="b5")
    p.add_argument("--img-size", type=int, default=512)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--reqs", type=int, default=4,
                   help="requests per client per mode")
    p.add_argument("--tiny", action="store_true",
                   help="tiny b0 on CPU (smoke)")
    args = p.parse_args()

    if args.tiny:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_"
                                     "count=1")
        import jax

        jax.config.update("jax_platforms", "cpu")

    from PIL import Image

    from semisupervisedobjectdetection_tpu.api import SegFormerModel
    from semisupervisedobjectdetection_tpu.cli.serve import InferenceServer
    from semisupervisedobjectdetection_tpu.core.config import (
        MIT_VARIANTS,
        mit_b0,
    )

    if args.tiny:
        cfg = mit_b0(depths=(1, 1, 1, 1), hidden_sizes=(8, 16, 32, 64),
                     num_heads=(1, 2, 4, 8), decoder_hidden=32)
        args.img_size = 64
        args.variant = "b0-tiny"
    else:
        cfg = MIT_VARIANTS[args.variant](dtype="bfloat16",
                                         gelu_approx=True)
    model = SegFormerModel(config=cfg)
    if args.int8:
        model.quantize()
    srv = InferenceServer(model, img_size=args.img_size,
                          max_batch=args.max_batch,
                          batch_window_ms=10.0,
                          quant="int8" if args.int8 else "none",
                          variant=args.variant)
    port = srv.start()
    base = f"http://127.0.0.1:{port}"
    print(f"daemon up on {base} (batch {args.max_batch}"
          + (", int8" if args.int8 else "") + ")", flush=True)

    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (args.img_size, args.img_size, 3),
                         dtype=np.uint8) for _ in range(8)]
    png_payloads = []
    for im in imgs:
        buf = io.BytesIO()
        Image.fromarray(im).save(buf, format="PNG")
        png_payloads.append(buf.getvalue())
    raw_payloads = [im.tobytes() for im in imgs]

    # warm each path once
    drive(base, png_payloads[:1], 1, 1, raw=False)
    drive(base, raw_payloads[:1], 1, 1, raw=True)

    png = drive(base, png_payloads, args.clients, args.reqs, raw=False)
    raw = drive(base, raw_payloads, args.clients, args.reqs, raw=True)
    srv.stop(drain=True)

    for name, r in (("png", png), ("raw", raw)):
        print(f"{name}: {r['img_per_s']:.2f} img/s  "
              f"(n={r['n']}, wall {r['wall_s']:.1f}s, "
              f"p50 {r['p50_ms']:.0f}ms, p99 {r['p99_ms']:.0f}ms)")
    print(f"raw/png speedup: {raw['img_per_s'] / png['img_per_s']:.2f}x")


if __name__ == "__main__":
    main()
