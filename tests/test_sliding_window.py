"""Sliding-window inference: seamless blending and constant-field
consistency."""

import numpy as np
import jax.numpy as jnp

from semisupervisedobjectdetection_tpu.eval.sliding_window import (
    sliding_window_predict,
)


def test_constant_predictor_gives_constant_field():
    def predict_fn(tiles):
        return jnp.full(tiles.shape[:3], 0.7)

    img = np.zeros((150, 200, 3), np.float32)
    out = sliding_window_predict(predict_fn, img, window=64, overlap=16,
                                 batch=4)
    assert out.shape == (150, 200)
    np.testing.assert_allclose(out, 0.7, atol=1e-5)


def test_content_dependent_predictor_matches_direct():
    """A per-pixel function of the image must be reproduced exactly even
    through overlaps (blending of identical values is identity)."""
    def predict_fn(tiles):
        return jnp.mean(tiles, axis=-1)

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (130, 96, 3)).astype(np.float32)
    out = sliding_window_predict(predict_fn, img, window=64, overlap=32,
                                 batch=2)
    np.testing.assert_allclose(out, img.mean(-1), atol=1e-4)


def test_window_equal_to_image():
    def predict_fn(tiles):
        return jnp.mean(tiles, axis=-1)

    img = np.random.default_rng(1).uniform(
        0, 1, (64, 64, 3)).astype(np.float32)
    out = sliding_window_predict(predict_fn, img, window=64, overlap=16)
    np.testing.assert_allclose(out, img.mean(-1), atol=1e-4)


def test_sliding_raster_cli(tmp_path):
    """`cli.supervised --predict --sliding-raster` serves one large raster
    through Hann-blended windows without needing a tile dataset."""
    import numpy as np
    from PIL import Image

    from semisupervisedobjectdetection_tpu.cli import supervised as cli_sup

    rng = np.random.default_rng(0)
    raster = (rng.uniform(0, 255, (200, 176, 3))).astype(np.uint8)
    rp = tmp_path / "raster.png"
    Image.fromarray(raster).save(rp)
    cli_sup.main([
        "--predict", "--sliding-raster", str(rp),
        "--window", "128", "--overlap", "32",
        "--variant", "b0", "--img-size", "128", "--dtype", "float32",
        "--dump-masks", str(tmp_path / "out"),
    ])
    out = tmp_path / "out" / "raster_mask.png"
    assert out.exists()
    mask = np.asarray(Image.open(out))
    assert mask.shape == (200, 176)
