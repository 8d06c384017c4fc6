"""bound2mask, feature matching, data pipeline, config grid tests."""

import json
import os

import numpy as np
import pytest


def test_rasterize_polygon_square():
    from semisupervisedobjectdetection_tpu.utils.bound2mask import (
        rasterize_polygon,
    )

    mask = rasterize_polygon([(2, 2), (7, 2), (7, 7), (2, 7)], (10, 10))
    assert mask[4, 4] and mask[3, 3]
    assert not mask[0, 0] and not mask[9, 9]
    # area ~ 5x5
    assert 20 <= mask.sum() <= 30


def test_labelme_folder_conversion(tmp_path):
    from PIL import Image

    from semisupervisedobjectdetection_tpu.utils.bound2mask import (
        convert_folder,
    )

    img = np.zeros((20, 20, 3), np.uint8)
    Image.fromarray(img).save(tmp_path / "tile.png")
    ann = {"shapes": [{"label": "site",
                       "points": [[5, 5], [15, 5], [15, 15], [5, 15]]}]}
    (tmp_path / "tile.json").write_text(json.dumps(ann))
    n = convert_folder(str(tmp_path))
    assert n == 1
    mask = np.asarray(Image.open(tmp_path / "tile_mask.png"))
    assert mask.max() == 255 and mask[10, 10] == 255 and mask[0, 0] == 0


def test_sift_match_identical_images():
    from semisupervisedobjectdetection_tpu.data.synthetic import (
        synthetic_tile,
    )
    from semisupervisedobjectdetection_tpu.utils.feature_matching import (
        sift_match,
    )

    rng = np.random.default_rng(5)
    img, _ = synthetic_tile(3, 128)
    # add texture so SIFT finds plenty of keypoints
    img = np.clip(img.astype(np.int16)
                  + rng.integers(-40, 40, img.shape), 0, 255).astype(
        np.uint8)
    src, dst = sift_match(img, img)
    # identical images: matched points coincide
    assert len(src) >= 3
    for (x1, y1), (x2, y2) in zip(src, dst):
        assert abs(x1 - x2) < 1.0 and abs(y1 - y2) < 1.0


def test_vit_patch_match_identity():
    from semisupervisedobjectdetection_tpu.utils.feature_matching import (
        vit_patch_match,
    )

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(16, 32)).astype(np.float32)
    pairs = vit_patch_match(feats, feats, top_k=5)
    for sim, i, j in pairs:
        assert i == j and sim > 0.999


def test_tile_dataset_reference_semantics(tmp_path):
    """Id parsing + watermark crop follow the reference
    (`archaeological_georgia_biostyle_dataloader.py:42-69`)."""
    from semisupervisedobjectdetection_tpu.data.synthetic import (
        write_synthetic_dataset,
    )
    from semisupervisedobjectdetection_tpu.data.tiles import TileDataset

    data = str(tmp_path / "tiles")
    masks = str(tmp_path / "masks")
    write_synthetic_dataset(data, masks, n=3, size=64)
    ds = TileDataset(data, masks, canvas=64)
    assert len(ds) == 3 and not ds.unlabeled
    img, mask = ds[0]
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert mask.shape == (64, 64)

    unlab = str(tmp_path / "unlab")
    write_synthetic_dataset(unlab, None, n=2, size=64, unlabeled=True)
    ds2 = TileDataset(unlab, None, canvas=64, has_mask=False)
    assert ds2.unlabeled and len(ds2) == 2
    img2, mask2 = ds2[0]
    assert img2.shape == (64, 64, 3) and mask2 is None


def test_loader_sharding(tmp_path):
    from semisupervisedobjectdetection_tpu.data.loader import TileLoader
    from semisupervisedobjectdetection_tpu.data.synthetic import (
        write_synthetic_dataset,
    )
    from semisupervisedobjectdetection_tpu.data.tiles import TileDataset

    data = str(tmp_path / "tiles")
    write_synthetic_dataset(data, str(tmp_path / "m"), n=8, size=48)
    ds = TileDataset(data, str(tmp_path / "m"), canvas=48)
    l0 = TileLoader(ds, 2, shuffle=False, num_shards=2, shard_index=0)
    l1 = TileLoader(ds, 2, shuffle=False, num_shards=2, shard_index=1)
    assert len(l0) == 2 and len(l1) == 2
    b0 = next(iter(l0))[0]
    b1 = next(iter(l1))[0]
    assert not np.array_equal(b0, b1)   # disjoint shards


def test_product_grid():
    from semisupervisedobjectdetection_tpu.core.config import product_grid

    grid = product_grid([1, 2], ["a", "b", "c"])
    assert len(grid) == 6 and (1, "a") in grid and (2, "c") in grid
    shuffled = product_grid([1, 2], ["a", "b", "c"], shuffle=True, seed=1)
    assert sorted(map(str, shuffled)) == sorted(map(str, grid))


def test_classified_categories(tmp_path):
    from semisupervisedobjectdetection_tpu.core.config import DataConfig
    from semisupervisedobjectdetection_tpu.data.classified import (
        category_loaders,
        get_categories,
    )
    from semisupervisedobjectdetection_tpu.data.synthetic import (
        write_synthetic_dataset,
    )

    root = tmp_path / "classified"
    for d in ("domainA", "domainB"):
        write_synthetic_dataset(str(root / d), str(tmp_path / "masks"),
                                n=4, size=48)
    cfg = DataConfig(labeled_classified=str(root),
                     maskdir=str(tmp_path / "masks"), canvas=48,
                     few_shot_batch_size=2)
    cats = get_categories(cfg, "labeled")
    assert cats == ["domainA", "domainB"]
    loaders = category_loaders(cfg, "labeled")
    assert len(loaders) == 2
    imgs, masks = next(iter(loaders[0]))
    assert imgs.shape == (2, 48, 48, 3)


def test_book_scan_decode(tmp_path):
    """Grayscale book scans: 75-px watermark crop + replication to 3
    channels (ref `archaeological_georgia_biostyle_dataloader.py:66,72-77`)."""
    from PIL import Image

    from semisupervisedobjectdetection_tpu.data.tiles import TileDataset

    gray = (np.arange(200 * 150, dtype=np.uint32).reshape(200, 150)
            % 255).astype(np.uint8)
    d = tmp_path / "book"
    d.mkdir()
    Image.fromarray(gray).save(d / "site0001_bing.png")
    ds = TileDataset(str(d), None, canvas=64, has_mask=False, book=True)
    img, _ = ds[0]
    assert img.shape == (64, 64, 3)
    # channels replicated from the grayscale source
    assert np.array_equal(img[..., 0], img[..., 1])


def test_match_pair_writes_outputs(tmp_path):
    from semisupervisedobjectdetection_tpu.data.synthetic import (
        synthetic_tile,
    )
    from semisupervisedobjectdetection_tpu.utils.feature_matching import (
        match_pair,
    )

    rng = np.random.default_rng(9)
    img, _ = synthetic_tile(11, 128)
    img = np.clip(img.astype(np.int16)
                  + rng.integers(-40, 40, img.shape), 0, 255).astype(
        np.uint8)
    out = match_pair(img, img, str(tmp_path / "m"))
    assert out["sift_matches"] >= 1
    assert os.path.exists(out["sift_png"])


def test_bad_tile_substitution(tmp_path, capsys):
    """--skip-bad-tiles (TileLoader on_bad_tile='substitute'): a corrupt
    tile is replaced by a readable one — batch shapes stay static, the
    epoch completes, ONE warning per bad file — while the default policy
    raises like the reference would
    (`archaeological_georgia_biostyle_dataloader.py:59-69`)."""
    from semisupervisedobjectdetection_tpu.data.loader import TileLoader
    from semisupervisedobjectdetection_tpu.data.synthetic import (
        write_synthetic_dataset,
    )
    from semisupervisedobjectdetection_tpu.data.tiles import TileDataset

    train = str(tmp_path / "train")
    masks = str(tmp_path / "masks")
    write_synthetic_dataset(train, masks, n=6, size=64, seed=0)
    ds = TileDataset(train, masks, canvas=64)
    with open(ds.image_path(2), "wb") as f:
        f.write(b"not a png at all")

    ld = TileLoader(ds, 3, shuffle=False, drop_last=False,
                    on_bad_tile="substitute")
    batches = list(ld)
    assert sum(b[0].shape[0] for b in batches) == 6
    for imgs, msk in batches:
        assert imgs.shape[1:] == (64, 64, 3)
        assert msk is not None and msk.shape[1:] == (64, 64)
    out = capsys.readouterr().out
    assert out.count("WARNING: bad tile") == 1, out

    list(ld)  # second epoch: the bad index is remembered, no new warning
    assert "WARNING" not in capsys.readouterr().out

    with pytest.raises(Exception):
        list(TileLoader(ds, 3, shuffle=False, on_bad_tile="raise"))
    with pytest.raises(ValueError):
        TileLoader(ds, 3, on_bad_tile="drop")


def test_bad_tile_all_unreadable_raises(tmp_path):
    from semisupervisedobjectdetection_tpu.data.loader import TileLoader
    from semisupervisedobjectdetection_tpu.data.synthetic import (
        write_synthetic_dataset,
    )
    from semisupervisedobjectdetection_tpu.data.tiles import TileDataset

    train = str(tmp_path / "train")
    masks = str(tmp_path / "masks")
    write_synthetic_dataset(train, masks, n=3, size=64, seed=0)
    ds = TileDataset(train, masks, canvas=64)
    for i in range(3):
        with open(ds.image_path(i), "wb") as f:
            f.write(b"junk")
    ld = TileLoader(ds, 3, shuffle=False, on_bad_tile="substitute")
    with pytest.raises(RuntimeError, match="no readable tile"):
        list(ld)
