"""Sliding-window inference: seamless blending and constant-field
consistency, plus the large-raster composition with context-parallel
spatial sharding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_2048_raster_with_context_parallel_matches_single_device():
    """1024²+ end-to-end composition: Hann-blended sliding-window predict
    over a synthetic 2048² raster with each window BATCH sharded over
    'data' and window HEIGHT sharded over 'space' (parallel/context.py —
    GSPMD inserts the conv halo exchanges) must equal the single-device
    blend. This is the production path for scenes whose window batches
    exceed one chip's HBM (eval/sliding_window.py docstring)."""
    from semisupervisedobjectdetection_tpu.core.config import (
        TrainConfig,
        mit_b0,
    )
    from semisupervisedobjectdetection_tpu.models.segformer import SegFormer
    from semisupervisedobjectdetection_tpu.parallel.context import (
        batch_and_height_sharding,
        get_mesh_2d,
    )
    from semisupervisedobjectdetection_tpu.train.state import TrainState
    from semisupervisedobjectdetection_tpu.train.supervised import (
        predict_step,
    )

    tiny = mit_b0(depths=(1, 1, 1, 1), hidden_sizes=(8, 16, 32, 64),
                  num_heads=(1, 2, 4, 8), decoder_hidden=32)
    variables = jax.jit(SegFormer(tiny).init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3)))
    state = TrainState.create(variables, TrainConfig())

    raster = np.random.default_rng(0).uniform(
        0, 1, (2048, 2048, 3)).astype(np.float32)

    def predict_single(tiles):
        return predict_step(state, tiles, tiny)

    ref = sliding_window_predict(predict_single, raster,
                                 window=512, overlap=64, batch=8)
    assert ref.shape == (2048, 2048)

    mesh = get_mesh_2d(dp=4, sp=2)
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    state_sh = jax.tree.map(lambda a: jax.device_put(a, rep), state)
    xsh = batch_and_height_sharding(mesh)

    def predict_sharded(tiles):
        return predict_step(state_sh, jax.device_put(tiles, xsh), tiny)

    got = sliding_window_predict(predict_sharded, raster,
                                 window=512, overlap=64, batch=8)
    np.testing.assert_allclose(got, ref, atol=1e-5)


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
