"""Native C++ tile loader vs the PIL decode path."""

import numpy as np
import pytest

from semisupervisedobjectdetection_tpu.data import native
from semisupervisedobjectdetection_tpu.data.synthetic import (
    write_synthetic_dataset,
)
from semisupervisedobjectdetection_tpu.data.tiles import TileDataset

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native loader not built")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("tiles")
    write_synthetic_dataset(str(root / "t"), str(root / "m"), n=6, size=96)
    return TileDataset(str(root / "t"), str(root / "m"), canvas=96)


def test_native_matches_pil(dataset):
    img_py, mask_py = dataset[0]
    img_c = native.decode_tile(dataset.image_path(0), canvas=96)
    mask_c = native.decode_mask(dataset.mask_path(0), canvas=96)
    # PIL applies a triangle filter on downscale; our 2x2 bilinear differs
    # by a few levels on edge pixels but matches in the mean
    diff = np.abs(img_py.astype(int) - img_c.astype(int))
    assert diff.mean() < 1.0 and diff.max() <= 8
    np.testing.assert_array_equal(mask_py, mask_c)


def test_native_batch_loader(dataset):
    loader = native.NativeBatchLoader(dataset, 3, shuffle=False, seed=0)
    batches = list(loader)
    assert len(batches) == 2
    imgs, masks = batches[0]
    assert imgs.shape == (3, 96, 96, 3) and imgs.dtype == np.uint8
    assert masks.shape == (3, 96, 96)


def test_native_unlabeled(dataset, tmp_path):
    write_synthetic_dataset(str(tmp_path / "u"), None, n=2, size=96,
                            unlabeled=True)
    ds = TileDataset(str(tmp_path / "u"), None, canvas=96, has_mask=False)
    loader = native.NativeBatchLoader(ds, 2, shuffle=False)
    imgs, masks = next(iter(loader))
    assert imgs.shape == (2, 96, 96, 3) and masks is None
