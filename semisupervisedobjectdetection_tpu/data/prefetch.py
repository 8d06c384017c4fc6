"""Background device prefetch: overlap host decode + H2D staging with compute.

The reference's input path is synchronous (`num_workers=0`,
`/root/reference/config.py:41` — every batch is decoded and moved to the
GPU while the accelerator idles). The TPU build already decodes off the hot
path (native C++ pool, `data/native.py`); this module closes the remaining
gap: a worker thread *stages* upcoming batches — host→device transfer plus
the jitted augment dispatch (`data/augment.py`) — while the current train
step is still executing. JAX dispatch is asynchronous, so by the time the
train loop asks for batch N+1 its device buffers are already in flight and
the step launches back-to-back instead of waiting on the tunnel/PCIe copy.

Usage:

    pf = DevicePrefetcher(loader, stage_fn, depth=1)
    for staged in pf:            # staged = stage_fn(idx, *host_item)
        ...

`stage_fn(idx, *item)` runs on the worker thread; it should call
`jnp.asarray`/the augment jit and return device arrays. Exceptions raised
by the loader or stage_fn surface in the consuming thread. The prefetcher
is re-iterable (a fresh worker per epoch) and tolerates early `break`
(the worker is signalled to stop and the queue drained).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator

_SENTINEL = object()


def _as_args(item) -> tuple:
    """Normalize a loader item to a `stage_fn(idx, *args)` argument tuple.
    Shared by the worker and the depth<1 inline paths so the documented
    "depth=0 and depth>=1 are bit-identical" contract holds for ANY item
    kind: tuple/list collates unpack to positional args, a bare array is
    one arg (not iterated along axis 0)."""
    return tuple(item) if isinstance(item, (tuple, list)) else (item,)


class DevicePrefetcher:
    """Wrap a re-iterable host loader with `depth` batches of device-side
    lookahead staged on a background thread."""

    def __init__(self, loader: Iterable, stage_fn: Callable[..., Any],
                 depth: int = 1):
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        self.loader = loader
        self.stage_fn = stage_fn
        self.depth = depth

    def __len__(self) -> int:
        return len(self.loader)  # type: ignore[arg-type]

    def __iter__(self) -> Iterator[Any]:
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        stop = threading.Event()

        def worker() -> None:
            try:
                for idx, item in enumerate(self.loader):
                    if stop.is_set():
                        return
                    staged = self.stage_fn(idx, *_as_args(item))
                    # Bounded put that still notices a consumer that broke
                    # out of the loop (stop set + queue full would deadlock
                    # a plain blocking put).
                    while not stop.is_set():
                        try:
                            q.put(staged, timeout=0.1)
                            break
                        except queue.Full:
                            continue
            except BaseException as e:  # surfaced in the consumer
                q.put(_SENTINEL)  # unblock the consumer first
                err[0] = e
                return
            q.put(_SENTINEL)

        err: list = [None]
        t = threading.Thread(target=worker, daemon=True,
                             name="sso-prefetch")
        t.start()
        try:
            while True:
                staged = q.get()
                if staged is _SENTINEL:
                    t.join()
                    if err[0] is not None:
                        raise err[0]
                    return
                yield staged
        finally:
            stop.set()
            # Drain so a blocked worker can exit before we drop the queue.
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            # Bounded join: an early break (e.g. preemption) may leave the
            # worker mid-stage_fn (jit dispatch / H2D in native code);
            # exiting the interpreter under it risks a teardown crash that
            # turns a clean preemption exit 0 into an apparent segfault.
            t.join(timeout=10.0)


def prefetch_train_batches(loader: Iterable, rng, dcfg, depth: int = 1):
    """Device-staged train batches: yields (imgs, masks) with the augment
    chain (`cli/common.device_train_batch`) dispatched ahead of use.

    Per-batch augment keys are `fold_in(rng, batch_idx)` — a derivation
    that does not depend on prefetch depth, so depth=0 (inline) and any
    depth>=1 produce bit-identical batches for the same `rng`.
    """
    import jax

    from semisupervisedobjectdetection_tpu.cli.common import (
        device_train_batch,
    )

    def stage(idx, images_u8, masks_u8=None):
        aug_rng = jax.random.fold_in(rng, idx)
        return device_train_batch(aug_rng, images_u8, masks_u8, dcfg)

    if depth < 1:  # prefetch disabled: stage inline, same rng derivation
        return (stage(i, *_as_args(item)) for i, item in enumerate(loader))
    return iter(DevicePrefetcher(loader, stage, depth=depth))


def paired_host_batches(train_loader: Iterable, pseudo_loader: Iterable
                        ) -> Iterator[tuple]:
    """(images_u8, masks_u8, unlabeled_u8 | None) per labeled batch, with
    the unlabeled loader re-iterated when the labeled one is longer (the
    EMA loop's pairing rule — re-iterate, not itertools.cycle, so decoded
    uint8 batches are not pinned in host RAM for the whole epoch)."""
    pseudo_iter = iter(pseudo_loader)
    for images_u8, masks_u8 in train_loader:
        try:
            u_images_u8, _ = next(pseudo_iter)
        except StopIteration:
            pseudo_iter = iter(pseudo_loader)
            u_images_u8 = next(pseudo_iter, (None, None))[0]
        yield images_u8, masks_u8, u_images_u8


def prefetch_paired_batches(train_loader: Iterable, pseudo_loader: Iterable,
                            rng, dcfg, depth: int = 1):
    """Device-staged (imgs, masks, u_imgs) triples for the fused
    semi-supervised step: labeled batch through the train augment chain,
    the paired unlabeled batch likewise (falling back to the labeled
    images when the unlabeled loader is empty). Augment keys are
    `fold_in(rng, 2*idx)` / `fold_in(rng, 2*idx + 1)` — depth-independent,
    so depth=0 and depth>=1 are bit-identical."""
    import jax

    from semisupervisedobjectdetection_tpu.cli.common import (
        device_train_batch,
    )

    def stage(idx, images_u8, masks_u8, u_images_u8):
        r1 = jax.random.fold_in(rng, 2 * idx)
        r2 = jax.random.fold_in(rng, 2 * idx + 1)
        imgs, masks = device_train_batch(r1, images_u8, masks_u8, dcfg)
        if u_images_u8 is not None:
            u_imgs, _ = device_train_batch(r2, u_images_u8, None, dcfg)
        else:
            u_imgs = imgs
        return imgs, masks, u_imgs

    pairs = paired_host_batches(train_loader, pseudo_loader)
    if depth < 1:
        return (stage(i, *_as_args(item)) for i, item in enumerate(pairs))
    return iter(DevicePrefetcher(pairs, stage, depth=depth))
