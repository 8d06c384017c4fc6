"""AOT serving artifacts: serialize the compiled predict to one file.

The reference's only "deployment" story is re-running its hand-edited
`Prediction()` mode with the full training codebase + torch + the HF
snapshot on the path (`main_segformer/segFormer_main.py:103-144`). A
production TPU serving process wants the opposite: a single self-contained
artifact — weights baked in, input/output contract pinned — that loads and
runs WITHOUT the model code, flax, or a checkpoint tree.

`jax.export` gives exactly that on TPU: the jitted predict closure
(weights as embedded constants) is lowered once to StableHLO and
serialized; `deserialize(...).call(x)` recompiles it on the serving host's
backend. Because StableHLO is versioned and platform-checked, the artifact
is forward-compatible across jax releases and can be lowered for several
platforms at once — we default to ("cpu", "tpu") so the same file smoke-
tests on a CPU host and serves on TPU.

Artifact layout (one file):

    8-byte magic  b"SSODTPU1"
    u32 little-endian header length
    header JSON   {"batch", "img_size", "channels", "num_labels",
                   "platforms", "quant", "jax_version"}
    serialized jax.export blob (the rest of the file)

Int8 serving: exporting from a quantized snapshot
(`SegFormerModel.quantize()` → `export_serving(...)`) bakes the int8
kernels + scales in as constants, so the artifact keeps the serving-path
MXU rate AND is ~4× smaller than an f32 export.

Loaders return an `ExportedPredictor` whose `.predict(batch_nhwc)` pads
partial batches to the compiled batch size (one executable, no per-size
recompiles — the same contract as `cli/serve.py`'s dynamic batcher, which
accepts this object as its model).
"""

from __future__ import annotations

import json
import struct
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from semisupervisedobjectdetection_tpu.core.config import MiTConfig

_MAGIC = b"SSODTPU1"


def _predict_fn(cfg: MiTConfig, variables: dict):
    """Serving closure: f32 NHWC images -> sigmoid probability masks,
    eval mode (the reference predict path, `SegFormerModel.py:103-139`)."""
    from semisupervisedobjectdetection_tpu.train.common import forward_masks

    def fn(images):
        masks, _, _ = forward_masks(cfg, variables, images,
                                    train_mode=False)
        return masks.astype(jnp.float32)

    return fn


def export_serving(cfg: MiTConfig, variables: dict, path: str, *,
                   batch_size: int, img_size: Optional[int] = None,
                   channels: int = 3,
                   platforms: Sequence[str] = ("cpu", "tpu")) -> dict:
    """Export one compiled predict at a pinned (batch, H, W, C) shape.

    `variables` may be the live f32 train variables or an int8 snapshot
    (`ops/quant.py`); `cfg.quant` records which. Returns the header dict.
    """
    size = int(img_size if img_size is not None else cfg.img_size)
    spec = jax.ShapeDtypeStruct((int(batch_size), size, size, channels),
                                jnp.float32)
    # Constants must be host numpy: device arrays would pin the export to
    # this process's backend (and a donated-buffer state could alias).
    host_vars = jax.tree.map(np.asarray, variables)
    exported = jax.export.export(
        jax.jit(_predict_fn(cfg, host_vars)),
        platforms=tuple(platforms))(spec)
    header = {
        "batch": int(batch_size),
        "img_size": size,
        "channels": int(channels),
        "num_labels": int(cfg.num_labels),
        "platforms": list(exported.platforms),
        "quant": cfg.quant,
        "jax_version": jax.__version__,
    }
    blob = bytes(exported.serialize())
    hdr = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(hdr)))
        f.write(hdr)
        f.write(blob)
    return header


def read_header(path: str) -> dict:
    """Artifact header without deserializing the program."""
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a serving artifact "
                             f"(magic {magic!r})")
        (n,) = struct.unpack("<I", f.read(4))
        return json.loads(f.read(n))


class ExportedPredictor:
    """A loaded artifact; duck-types the `predict(batch)->masks` surface
    `cli/serve.py` and `eval/sliding_window.py` consume."""

    def __init__(self, header: dict, exported):
        self.header = header
        self._exported = exported
        self.batch = header["batch"]
        self.img_size = header["img_size"]

    def predict(self, images) -> np.ndarray:
        """Predict a (B,H,W,C) f32 batch; B <= compiled batch (smaller
        batches are zero-padded to the one compiled shape and sliced
        back — never a recompile)."""
        arr = np.asarray(images, np.float32)
        if arr.ndim == 3:
            arr = arr[None]
        b = arr.shape[0]
        if b > self.batch:
            raise ValueError(
                f"batch {b} exceeds the artifact's compiled batch "
                f"{self.batch}; split the batch or re-export")
        if arr.shape[1:] != (self.img_size, self.img_size,
                             self.header["channels"]):
            raise ValueError(
                f"input shape {arr.shape[1:]} != compiled "
                f"({self.img_size}, {self.img_size}, "
                f"{self.header['channels']})")
        if b < self.batch:
            pad = np.zeros((self.batch - b,) + arr.shape[1:], np.float32)
            arr = np.concatenate([arr, pad], axis=0)
        out = np.asarray(self._exported.call(arr))
        return out[:b]


def load_serving(path: str) -> ExportedPredictor:
    """Load an artifact for serving. Requires only jax (+ a backend the
    artifact was lowered for) — no model code, flax, or checkpoint tree."""
    header = read_header(path)
    with open(path, "rb") as f:
        f.seek(len(_MAGIC))
        (n,) = struct.unpack("<I", f.read(4))
        f.seek(len(_MAGIC) + 4 + n)
        blob = f.read()
    backend = jax.default_backend()
    if backend not in header["platforms"]:
        raise ValueError(
            f"artifact was lowered for {header['platforms']}, but this "
            f"process's backend is {backend!r}; re-export with "
            f"platforms including it")
    exported = jax.export.deserialize(bytearray(blob))
    return ExportedPredictor(header, exported)
