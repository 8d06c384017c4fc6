"""Decoded-tile RAM cache (`TileDataset(cache_mb=...)`, CLI --cache-tiles).

The reference re-decodes every tile every epoch
(`archaeological_georgia_biostyle_dataloader.py:59-69`); the cache amortizes
decode+crop+resize across epochs under ONE process-wide byte budget
(`tiles.shared_cache`). Tests that assert hit/entry counts inject an
isolated `_DecodedCache` so they stay order-independent.
"""

import numpy as np
import pytest

from semisupervisedobjectdetection_tpu.data import tiles as tiles_mod
from semisupervisedobjectdetection_tpu.data.loader import (
    TileLoader,
    split_dataset,
)
from semisupervisedobjectdetection_tpu.data.tiles import (
    TileDataset,
    _DecodedCache,
)
from semisupervisedobjectdetection_tpu.data.synthetic import (
    write_synthetic_dataset,
)


@pytest.fixture()
def tile_root(tmp_path):
    write_synthetic_dataset(str(tmp_path / "t"), str(tmp_path / "m"),
                            n=6, size=96, seed=0)
    return tmp_path


def _cached_ds(tile_root, mb=64):
    return TileDataset(str(tile_root / "t"), str(tile_root / "m"),
                       canvas=96, cache=_DecodedCache(mb))


def test_cache_hit_returns_identical_item(tile_root):
    ds = _cached_ds(tile_root)
    img1, mask1 = ds[0]
    img2, mask2 = ds[0]
    assert img2 is img1 and mask2 is mask1           # served from cache
    assert ds.cache.hits == 1 and ds.cache.misses == 1
    cold = TileDataset(str(tile_root / "t"), str(tile_root / "m"),
                       canvas=96)
    img3, mask3 = cold[0]
    np.testing.assert_array_equal(img1, img3)
    np.testing.assert_array_equal(mask1, mask3)


def test_cache_survives_file_deletion(tile_root):
    """Strong proof the second epoch never touches the file system."""
    ds = _cached_ds(tile_root)
    items = [ds[i] for i in range(len(ds))]
    for f in (tile_root / "t").iterdir():
        f.unlink()
    for f in (tile_root / "m").iterdir():
        f.unlink()
    for i in range(len(ds)):
        img, mask = ds[i]
        np.testing.assert_array_equal(img, items[i][0])
        np.testing.assert_array_equal(mask, items[i][1])


def test_budget_eviction(tile_root):
    item_mb = (96 * 96 * 3 + 96 * 96) / 2 ** 20
    ds = _cached_ds(tile_root, mb=2.5 * item_mb)
    for i in range(len(ds)):
        ds[i]
    assert len(ds.cache._items) == 2                 # LRU kept the last 2
    assert ds.cache._bytes <= ds.cache.budget
    # an item bigger than the whole budget is simply not cached
    tiny = _cached_ds(tile_root, mb=0.5 * item_mb)
    tiny[0]
    assert len(tiny.cache._items) == 0


def test_cache_mb_joins_one_shared_budget(tile_root):
    """cache_mb>0 datasets all share the process-wide cache: a CLI run
    builds several datasets and --cache-tiles promises ONE RAM budget,
    not budget x dataset-count."""
    a = TileDataset(str(tile_root / "t"), str(tile_root / "m"),
                    canvas=96, cache_mb=16)
    b = TileDataset(str(tile_root / "t"), None, canvas=96,
                    has_mask=False, cache_mb=48)
    assert a.cache is b.cache is tiles_mod._SHARED_CACHE
    assert a.cache.budget >= 48 * 2 ** 20            # largest request wins
    # path-keyed with mode flags: the labeled and unlabeled views of the
    # same file don't collide
    img_a, _ = a[0]
    img_b, _ = b[0]
    assert a[0][0] is img_a and b[0][0] is img_b
    assert not (img_a is img_b)


def test_mask_dir_is_part_of_the_cache_key(tile_root, tmp_path):
    """Two cache-sharing datasets over the SAME images but different mask
    directories must not serve each other's masks (regression: the key
    once omitted mask_dir, so the second dataset silently got labels
    decoded from the first's directory)."""
    import shutil

    write_synthetic_dataset(str(tile_root / "t2"), str(tmp_path / "m2"),
                            n=6, size=96, seed=7)
    # same image dir as ds_a, different mask dir (seed-7 masks copied in
    # under the seed-0 ids so the ids line up)
    (tile_root / "m_alt").mkdir()
    for f, orig in zip(sorted((tmp_path / "m2").iterdir()),
                       sorted((tile_root / "m").iterdir())):
        shutil.copy(f, tile_root / "m_alt" / orig.name)

    cache = _DecodedCache(64)
    ds_a = TileDataset(str(tile_root / "t"), str(tile_root / "m"),
                       canvas=96, cache=cache)
    ds_b = TileDataset(str(tile_root / "t"), str(tile_root / "m_alt"),
                       canvas=96, cache=cache)
    _, mask_a = ds_a[0]
    _, mask_b = ds_b[0]                       # must MISS, not hit a's entry
    assert mask_b is not mask_a
    cold = TileDataset(str(tile_root / "t"), str(tile_root / "m_alt"),
                       canvas=96)
    np.testing.assert_array_equal(mask_b, cold[0][1])


def test_split_dataset_shares_cache_without_collisions(tile_root):
    ds = _cached_ds(tile_root)
    train, val = split_dataset(ds, frac=0.5, seed=0)
    assert train.cache is val.cache is ds.cache      # shared budget
    t_items = [train[i][0] for i in range(len(train))]
    v_items = [val[i][0] for i in range(len(val))]
    # path-keyed: same index in the two splits must NOT alias
    for ti, vi in zip(t_items, v_items):
        assert not np.array_equal(ti, vi)
    # and re-reads hit the shared cache
    assert train[0][0] is t_items[0]
    assert val[0][0] is v_items[0]


def test_loader_batches_identical_with_and_without_cache(tile_root):
    a = TileDataset(str(tile_root / "t"), str(tile_root / "m"), canvas=96)
    b = _cached_ds(tile_root)
    la = TileLoader(a, 2, shuffle=True, seed=3)
    lb = TileLoader(b, 2, shuffle=True, seed=3)
    for _ in range(2):   # two epochs: epoch 2 is all cache hits for lb
        for (ia, ma), (ib, mb) in zip(la, lb):
            np.testing.assert_array_equal(ia, ib)
            np.testing.assert_array_equal(ma, mb)
    assert b.cache.hits > 0


def test_cli_flag_routes_to_python_loader(tile_root):
    from semisupervisedobjectdetection_tpu.cli import common as cli_common

    args = cli_common.base_parser("t").parse_args(
        ["--synthetic", "--cache-tiles", "32", "--img-size", "64"])
    dcfg, _ = cli_common.configs_from_args(args)
    assert dcfg.cache_mb == 32
    dcfg = dcfg.replace(dataset=str(tile_root / "t"),
                        evalset=str(tile_root / "t"),
                        maskdir=str(tile_root / "m"), canvas=96)
    loaders = cli_common.make_loaders(dcfg, flags=("train",))
    loader = loaders["train"]
    assert isinstance(loader, TileLoader)            # native path bypassed
    assert loader.dataset.cache is tiles_mod._SHARED_CACHE
    assert loader.dataset.cache.budget >= 32 * 2 ** 20


def test_rewritten_file_invalidates_cache_entry(tile_root):
    """A tile rewritten at the same path in-process (tune sweeps,
    notebooks regenerating tiles) must be re-decoded, not served stale —
    while DELETED files still serve from cache (the filesystem-free
    epoch-2 guarantee above)."""
    import os
    import shutil

    ds = _cached_ds(tile_root)
    img_old, _ = ds[0]
    # rewrite image 0 with image 1's bytes (bump mtime in case the fs
    # granularity would otherwise alias the signatures)
    p0, p1 = ds.image_path(0), ds.image_path(1)
    shutil.copy(p1, p0)
    st = os.stat(p0)
    os.utime(p0, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    img_new, _ = ds[0]
    assert img_new is not img_old
    np.testing.assert_array_equal(img_new, ds[1][0])
    assert ds[0][0] is img_new                       # re-cached under new sig


def test_shared_budget_shrinks_on_explicit_lower_request(tile_root):
    """A later, explicitly lower --cache-tiles in the same process must
    cap RAM (evicting down), not be overridden by an earlier larger run."""
    tiles_mod._SHARED_CACHE = None                   # isolate from suite order
    try:
        big = TileDataset(str(tile_root / "t"), str(tile_root / "m"),
                          canvas=96, cache_mb=64)
        for i in range(len(big)):
            big[i]
        assert big.cache._bytes > 0
        item_mb = (96 * 96 * 3 + 96 * 96) / 2 ** 20
        small = TileDataset(str(tile_root / "t"), str(tile_root / "m"),
                            canvas=96, cache_mb=2.5 * item_mb)
        assert small.cache is big.cache
        assert small.cache.budget == int(2.5 * item_mb * 2 ** 20)
        assert small.cache._bytes <= small.cache.budget
        assert len(small.cache._items) == 2          # evicted down to fit
    finally:
        tiles_mod._SHARED_CACHE = None
