"""Device-side fused augmentation semantics (`data/augment.py` vs the
reference albumentations chain `config.py:27-38`)."""

import numpy as np
import jax
import jax.numpy as jnp

from semisupervisedobjectdetection_tpu.data.augment import (
    augment_batch,
    eval_batch,
)


def _batch(b=8, size=64):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (b, size, size, 3)).astype(np.uint8)
    masks = (rng.uniform(size=(b, size, size)) > 0.5).astype(
        np.float32) * 255
    return jnp.asarray(imgs), jnp.asarray(masks)


def test_output_ranges_and_shapes():
    imgs, masks = _batch()
    out_i, out_m = augment_batch(jax.random.PRNGKey(0), imgs, masks,
                                 crop=56, out_h=48, out_w=48)
    assert out_i.shape == (8, 48, 48, 3)
    assert out_m.shape == (8, 48, 48)
    assert float(out_i.min()) >= 0.0 and float(out_i.max()) <= 1.0
    vals = np.unique(np.asarray(out_m))
    assert len(vals) <= 2 and vals.min() >= 0.0 and vals.max() <= 1.0


def test_image_mask_joint_geometry():
    """The same crop/flip/rot must be applied to image and mask: encode the
    mask into the red channel and verify alignment after augmentation."""
    rng = np.random.default_rng(1)
    b, size = 16, 64
    masks = np.zeros((b, size, size), np.float32)
    masks[:, 10:40, 5:25] = 255.0
    imgs = np.zeros((b, size, size, 3), np.uint8)
    imgs[..., 0] = masks.astype(np.uint8)
    out_i, out_m = augment_batch(jax.random.PRNGKey(3), jnp.asarray(imgs),
                                 jnp.asarray(masks), crop=56, out_h=56,
                                 out_w=56)
    red = np.asarray(out_i[..., 0])
    m = np.asarray(out_m)
    # wherever the mask is 1 the red channel must be 1 (and vice versa),
    # modulo bilinear-vs-nearest edge pixels
    agree = np.mean((red > 0.5) == (m > 0.5))
    assert agree > 0.98


def test_same_key_is_deterministic():
    imgs, masks = _batch()
    a = augment_batch(jax.random.PRNGKey(7), imgs, masks, crop=56,
                      out_h=48, out_w=48)
    b = augment_batch(jax.random.PRNGKey(7), imgs, masks, crop=56,
                      out_h=48, out_w=48)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_different_keys_differ():
    imgs, masks = _batch()
    a, _ = augment_batch(jax.random.PRNGKey(1), imgs, masks, crop=32,
                         out_h=48, out_w=48)
    b, _ = augment_batch(jax.random.PRNGKey(2), imgs, masks, crop=32,
                         out_h=48, out_w=48)
    assert not np.array_equal(np.asarray(a), np.asarray(b))


def test_eval_batch_no_randomness():
    imgs, masks = _batch()
    a_i, a_m = eval_batch(imgs, masks, out_h=48, out_w=48)
    assert a_i.shape == (8, 48, 48, 3)
    assert float(a_i.max()) <= 1.0
    vals = np.unique(np.asarray(a_m))
    assert vals.max() <= 1.0


def test_normalization_is_div255():
    imgs = jnp.full((2, 32, 32, 3), 255, jnp.uint8)
    out, _ = eval_batch(imgs, None, out_h=32, out_w=32, with_mask=False)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)
