"""Pseudo-label thresholding vs hand-computed expectations
(`segFormer_semi_teacherstudent_main.py:24-56` semantics)."""

import numpy as np
import jax.numpy as jnp

from semisupervisedobjectdetection_tpu.train.pseudo import (
    denoise_labels,
    threshold_pseudo_masks,
)


def test_confident_sample_kept_unconfident_dropped():
    h = w = 64
    # sample 0: fully confident (all probs 0.95 or 0.05), lots of fg soft mass
    m0 = np.full((h, w), 0.05, np.float32)
    m0[:32] = 0.95                       # soft pixel_num = 32*64*0.95+... > 1000
    # sample 1: everything at 0.5 -> zero confident pixels
    m1 = np.full((h, w), 0.5, np.float32)
    out = threshold_pseudo_masks(jnp.asarray(np.stack([m0, m1])))
    keep = np.asarray(out.keep)
    assert keep.tolist() == [1.0, 0.0]
    assert int(out.n_kept) == 1
    # pseudo mask binarizes at 0.7
    pm = np.asarray(out.pseudo_mask)
    assert pm[0, :32].min() == 1.0 and pm[0, 32:].max() == 0.0


def test_confidence_fraction_matches_hand_computation():
    h = w = 64
    m = np.full((h, w), 0.5, np.float32)
    m[:16] = 0.9            # a quarter of rows confident
    out = threshold_pseudo_masks(jnp.asarray(m[None]))
    assert abs(float(out.confidence[0]) - 0.25) < 1e-6


def test_small_foreground_dropped():
    """pixel_num (sum of soft probs) must exceed 1000 (`:43`)."""
    h = w = 32   # 1024 pixels; all at 0.9 -> soft sum ~921.6 < 1000
    m = np.full((h, w), 0.9, np.float32)
    out = threshold_pseudo_masks(jnp.asarray(m[None]))
    assert int(out.n_kept) == 0
    assert not np.isfinite(float(out.loss))  # reference would emit inf


def test_allow_throw_false_keeps_everything():
    m = np.full((8, 8), 0.5, np.float32)
    out = threshold_pseudo_masks(jnp.asarray(m[None]),
                                 allow_throw_sample=False)
    assert int(out.n_kept) == 1
    assert np.isfinite(float(out.loss))


def test_loss_is_mean_per_sample_dice_over_kept():
    h = w = 64
    m = np.full((h, w), 0.05, np.float32)
    m[:32] = 0.95
    out = threshold_pseudo_masks(jnp.asarray(np.stack([m, m])))
    # both identical & kept -> loss = per-sample dice loss of either
    p = m.reshape(-1)
    t = (m >= 0.7).reshape(-1).astype(np.float32)
    tp = np.abs(np.sum(p * t))
    expected = 1.0 - (2 * tp + 1) / (np.sum(np.abs(p)) + np.sum(t) + 1)
    assert abs(float(out.loss) - expected) < 1e-5


def test_denoise_blend_and_clamp():
    """denoised = clamp(pred + 0.2*gt - 0.1, 0, 1) >= 0.7 (`:110-118`)."""
    pred = np.asarray([[[0.65, 0.65], [0.95, 0.02]]], np.float32)
    gt = np.asarray([[[1.0, 0.0], [1.0, 0.0]]], np.float32)
    out = np.asarray(denoise_labels(jnp.asarray(pred), jnp.asarray(gt)))
    # 0.65+0.2-0.1=0.75 -> 1 ; 0.65-0.1=0.55 -> 0 ; 0.95+0.1=1.0(clamp) -> 1;
    # 0.02-0.1 -> clamp 0 -> 0
    np.testing.assert_array_equal(out, [[[1, 0], [1, 0]]])
