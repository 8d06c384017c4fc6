"""Device prefetcher: ordering, determinism vs the inline path, error
propagation, early-exit shutdown, and the paired-batch wrap rule."""

import numpy as np
import pytest

from semisupervisedobjectdetection_tpu.data.prefetch import (
    DevicePrefetcher,
    paired_host_batches,
    prefetch_paired_batches,
    prefetch_train_batches,
)


class ListLoader:
    """Re-iterable loader stub yielding (images_u8, masks_u8) tuples."""

    def __init__(self, n, batch=2, size=16, seed=0, masks=True):
        rng = np.random.default_rng(seed)
        self.items = [
            (rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8),
             rng.integers(0, 2, (batch, size, size), dtype=np.uint8)
             if masks else None)
            for _ in range(n)
        ]

    def __len__(self):
        return len(self.items)

    def __iter__(self):
        return iter(self.items)


def test_prefetcher_preserves_order_and_items():
    loader = ListLoader(7)
    seen = list(DevicePrefetcher(loader, lambda i, im, m: (i, im.sum()),
                                 depth=3))
    assert [i for i, _ in seen] == list(range(7))
    assert [s for _, s in seen] == [im.sum() for im, _ in loader.items]


def test_prefetcher_reiterable_and_len():
    loader = ListLoader(4)
    pf = DevicePrefetcher(loader, lambda i, im, m: i, depth=2)
    assert len(pf) == 4
    assert list(pf) == list(range(4))
    assert list(pf) == list(range(4))  # fresh worker per epoch


def test_prefetcher_propagates_stage_errors():
    loader = ListLoader(3)

    def bad_stage(i, im, m):
        if i == 1:
            raise RuntimeError("decode failed")
        return i

    it = iter(DevicePrefetcher(loader, bad_stage, depth=2))
    assert next(it) == 0
    with pytest.raises(RuntimeError, match="decode failed"):
        list(it)


def test_prefetcher_early_break_shuts_down():
    loader = ListLoader(50)
    pf = DevicePrefetcher(loader, lambda i, im, m: i, depth=2)
    for v in pf:
        if v == 3:
            break
    # A second full pass still works (no wedged worker/queue).
    assert list(pf) == list(range(50))


def test_prefetch_train_batches_matches_inline():
    import jax

    from semisupervisedobjectdetection_tpu.core.config import DataConfig

    loader = ListLoader(3, batch=2, size=32)
    dcfg = DataConfig(img_h=16, img_w=16, canvas=32, crop=24)
    rng = jax.random.PRNGKey(7)
    inline = list(prefetch_train_batches(loader, rng, dcfg, depth=0))
    threaded = list(prefetch_train_batches(loader, rng, dcfg, depth=2))
    assert len(inline) == len(threaded) == 3
    for (ia, ma), (ib, mb) in zip(inline, threaded):
        np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
        np.testing.assert_array_equal(np.asarray(ma), np.asarray(mb))


def test_paired_host_batches_wraps_shorter_pseudo_loader():
    train = ListLoader(5, seed=1)
    pseudo = ListLoader(2, seed=2, masks=False)
    triples = list(paired_host_batches(train, pseudo))
    assert len(triples) == 5
    u = [t[2] for t in triples]
    # unlabeled stream restarts: batches 0,1,0,1,0
    np.testing.assert_array_equal(u[0], pseudo.items[0][0])
    np.testing.assert_array_equal(u[1], pseudo.items[1][0])
    np.testing.assert_array_equal(u[2], pseudo.items[0][0])
    np.testing.assert_array_equal(u[4], pseudo.items[0][0])
    # labeled side passes through
    for (im, m, _), (ei, em) in zip(triples, train.items):
        np.testing.assert_array_equal(im, ei)
        np.testing.assert_array_equal(m, em)


def test_paired_empty_pseudo_falls_back_to_labeled():
    import jax

    from semisupervisedobjectdetection_tpu.core.config import DataConfig

    train = ListLoader(2, batch=2, size=32)
    pseudo = ListLoader(0, masks=False)
    dcfg = DataConfig(img_h=16, img_w=16, canvas=32, crop=24)
    rng = jax.random.PRNGKey(3)
    out = list(prefetch_paired_batches(train, pseudo, rng, dcfg, depth=2))
    assert len(out) == 2
    for imgs, masks, u_imgs in out:
        np.testing.assert_array_equal(np.asarray(u_imgs), np.asarray(imgs))


def test_prefetch_paired_matches_inline():
    import jax

    from semisupervisedobjectdetection_tpu.core.config import DataConfig

    train = ListLoader(4, batch=2, size=32, seed=5)
    pseudo = ListLoader(3, batch=2, size=32, seed=6, masks=False)
    dcfg = DataConfig(img_h=16, img_w=16, canvas=32, crop=24)
    rng = jax.random.PRNGKey(11)
    inline = list(prefetch_paired_batches(train, pseudo, rng, dcfg,
                                          depth=0))
    threaded = list(prefetch_paired_batches(train, pseudo, rng, dcfg,
                                            depth=3))
    assert len(inline) == len(threaded) == 4
    for a, b in zip(inline, threaded):
        for xa, xb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
