"""Simultaneous bing+book pair items (reference 4-tuple,
`archaeological_georgia_biostyle_dataloader.py:51-112`) + the
feature-matching dataset entry that consumes them."""

import numpy as np
import pytest

from semisupervisedobjectdetection_tpu.data.synthetic import (
    write_synthetic_dataset,
)
from semisupervisedobjectdetection_tpu.data.tiles import TileDataset


@pytest.fixture(scope="module")
def pair_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("pairs")
    write_synthetic_dataset(str(root / "data"), str(root / "masks"),
                            n=3, size=96, seed=4, pair=True)
    return root


def test_pair_item_returns_4_tuple(pair_root):
    ds = TileDataset(str(pair_root / "data"), str(pair_root / "masks"),
                     canvas=96, pair=True)
    assert len(ds) == 3
    bing, bing_mask, book, book_mask = ds[0]
    assert bing.shape == (96, 96, 3) and bing.dtype == np.uint8
    assert book.shape == (96, 96, 3) and book.dtype == np.uint8
    assert bing_mask.shape == (96, 96)
    assert book_mask.shape == (96, 96)
    # Greyscale book scans expand to 3 identical channels (ref `:72-77`).
    assert np.array_equal(book[..., 0], book[..., 1])
    # The two sides are different tiles of the same id (different content).
    assert not np.array_equal(bing, book)


def test_pair_item_without_masks(pair_root):
    ds = TileDataset(str(pair_root / "data"), None, canvas=64,
                     has_mask=False, pair=True)
    bing, bing_mask, book, book_mask = ds[1]
    assert bing_mask is None and book_mask is None
    assert bing.shape == (64, 64, 3) and book.shape == (64, 64, 3)


def test_feature_matching_dataset_entry(pair_root, tmp_path):
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    from semisupervisedobjectdetection_tpu.utils.feature_matching import (
        run_dataset,
    )

    results = run_dataset(str(pair_root / "data"), str(tmp_path / "out"),
                          str(pair_root / "masks"), canvas=96, limit=2)
    assert len(results) == 2
    for r in results:
        assert "sift_matches" in r and "id" in r
        assert (tmp_path / "out").exists()


def test_decode_16bit_greyscale_rescales(tmp_path):
    """16-bit greyscale scans rescale by dtype max — a raw *255 would wrap
    modulo 65536 before clipping."""
    from PIL import Image

    from semisupervisedobjectdetection_tpu.data.tiles import _decode_rgb

    arr = np.zeros((100, 80), np.uint16)
    arr[:50] = 65535          # full white
    arr[50:] = 32768          # mid grey
    path = tmp_path / "scan.png"
    Image.fromarray(arr).save(path)
    out = _decode_rgb(str(path), watermark_px=23)
    assert out.dtype == np.uint8 and out.shape == (77, 80, 3)
    assert out[0, 0, 0] == 255
    assert 120 <= out[60, 0, 0] <= 132
