"""ctypes binding for the native C++ tile loader.

`semisupervisedobjectdetection_tpu/native/tileloader.cc` provides threaded
PNG decode + watermark crop + resize; this module loads it (building it on
first use if a toolchain is present) and exposes `NativeBatchLoader`, a
drop-in accelerated alternative to the Python `TileLoader` decode path
with a one-batch background prefetch thread.

Falls back cleanly: `available()` is False when the shared library can't
be built/loaded, and callers keep using the PIL path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtileloader.so")
_lib = None
_lib_error: Optional[str] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_error
    if _lib is not None or _lib_error is not None:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.sso_decode_tile.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.sso_decode_mask.argtypes = lib.sso_decode_tile.argtypes
        lib.sso_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8)]
        _lib = lib
    except Exception as e:  # pragma: no cover - toolchain-dependent
        _lib_error = str(e)
    return _lib


def available() -> bool:
    return _load() is not None


def _as_u8_ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def decode_tile(path: str, watermark_px: int = 23,
                canvas: int = 512) -> np.ndarray:
    lib = _load()
    assert lib is not None, f"native loader unavailable: {_lib_error}"
    out = np.empty((canvas, canvas, 3), np.uint8)
    rc = lib.sso_decode_tile(path.encode(), watermark_px, canvas,
                             _as_u8_ptr(out))
    if rc != 0:
        raise IOError(f"native decode failed ({rc}): {path}")
    return out


def decode_mask(path: str, watermark_px: int = 23,
                canvas: int = 512) -> np.ndarray:
    lib = _load()
    assert lib is not None, f"native loader unavailable: {_lib_error}"
    out = np.empty((canvas, canvas), np.uint8)
    rc = lib.sso_decode_mask(path.encode(), watermark_px, canvas,
                             _as_u8_ptr(out))
    if rc != 0:
        raise IOError(f"native decode failed ({rc}): {path}")
    return out


def load_batch(paths, mask_paths=None, watermark_px: int = 23,
               canvas: int = 512, threads: int = 8
               ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    lib = _load()
    assert lib is not None, f"native loader unavailable: {_lib_error}"
    n = len(paths)
    images = np.empty((n, canvas, canvas, 3), np.uint8)
    masks = np.empty((n, canvas, canvas), np.uint8) if mask_paths else None
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_masks = ((ctypes.c_char_p * n)(*[p.encode() for p in mask_paths])
               if mask_paths else None)
    failures = lib.sso_load_batch(
        c_paths, c_masks, n, watermark_px, canvas, threads,
        _as_u8_ptr(images),
        _as_u8_ptr(masks) if masks is not None else
        ctypes.cast(None, ctypes.POINTER(ctypes.c_uint8)))
    if failures:
        raise IOError(f"native batch load: {failures} failures")
    return images, masks


class NativeBatchLoader:
    """Batch iterator over a TileDataset using the native decoder, with a
    one-batch background prefetch thread (keeps the host decode off the
    device-feed critical path)."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0, threads: int = 8):
        from semisupervisedobjectdetection_tpu.data.tiles import (
            BING_WATERMARK_PX,
        )

        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.threads = threads
        self.watermark = BING_WATERMARK_PX

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(
            -n // self.batch_size)

    def _load(self, sel):
        paths = [self.dataset.image_path(int(i)) for i in sel]
        mask_paths = ([self.dataset.mask_path(int(i)) for i in sel]
                      if self.dataset.has_mask else None)
        return load_batch(paths, mask_paths, self.watermark,
                          self.dataset.canvas, self.threads)

    def __iter__(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        nb = len(self)
        if nb == 0:
            return
        result = {}

        def prefetch(b):
            sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
            result[b] = self._load(sel)

        t = threading.Thread(target=prefetch, args=(0,))
        t.start()
        for b in range(nb):
            t.join()
            batch = result.pop(b)
            if b + 1 < nb:
                t = threading.Thread(target=prefetch, args=(b + 1,))
                t.start()
            yield batch
