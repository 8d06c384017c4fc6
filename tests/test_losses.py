"""Loss-library parity tests against hand-computed values and the torch
formulas of the reference (`models/Loss.py`). torch (CPU) is only used here
as an independent oracle; the framework itself is torch-free."""

import numpy as np
import jax.numpy as jnp
import pytest

from semisupervisedobjectdetection_tpu import losses


def torch_dice_oracle(pred, gt, smooth=1.0):
    import torch

    p = torch.tensor(pred).reshape(pred.shape[0], -1)
    g = torch.tensor(gt).reshape(gt.shape[0], -1)
    tp = torch.abs(torch.sum(g * p, dim=1))
    fp = torch.sum(torch.abs(p), dim=1)
    fn = torch.sum(g, dim=1)
    return float(torch.mean((2 * tp + smooth) / (fp + fn + smooth)))


def test_dice_matches_reference_formula():
    rng = np.random.default_rng(0)
    pred = rng.uniform(0, 1, (4, 32, 32)).astype(np.float32)
    gt = (rng.uniform(0, 1, (4, 32, 32)) > 0.5).astype(np.float32)
    ours = float(losses.dice_coeff(jnp.asarray(pred), jnp.asarray(gt)))
    oracle = torch_dice_oracle(pred, gt)
    assert abs(ours - oracle) < 1e-5


def test_dice_perfect_prediction():
    gt = np.zeros((2, 8, 8), np.float32)
    gt[:, 2:6, 2:6] = 1.0
    loss = float(losses.dice_loss(jnp.asarray(gt), jnp.asarray(gt)))
    assert loss < 1e-6


def test_dice_argmax_binarizes():
    gt = np.ones((1, 4, 4), np.float32)
    pred = np.full((1, 4, 4), 0.6, np.float32)  # binarizes to 1 -> perfect
    loss = float(losses.dice_argmax_loss(jnp.asarray(pred), jnp.asarray(gt)))
    assert loss < 1e-6
    pred_soft = float(losses.dice_loss(jnp.asarray(pred), jnp.asarray(gt)))
    assert pred_soft > 0.1  # soft dice penalizes 0.6


def test_mse_reference_normalization():
    """Reference mse divides per-sample SSE by batch*channels
    (`Loss.py:48-52`), not by pixel count."""
    rng = np.random.default_rng(1)
    pred = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    gt = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    ours = float(losses.mse_loss(jnp.asarray(pred), jnp.asarray(gt)))
    expected = np.mean(
        np.sum((gt.reshape(2, -1) - pred.reshape(2, -1)) ** 2, axis=1)
        / (2 * 3))
    assert abs(ours - expected) < 1e-4


def test_sample_weighted_dice():
    gt = np.zeros((2, 8, 8), np.float32)
    gt[0, :4] = 1.0
    pred = gt.copy()
    pred[1] = 1.0 - gt[1]  # sample 1 totally wrong
    w_both = float(losses.dice_loss(jnp.asarray(pred), jnp.asarray(gt)))
    w_first = float(losses.dice_loss(
        jnp.asarray(pred), jnp.asarray(gt),
        sample_weight=jnp.asarray([1.0, 0.0])))
    assert w_first < 1e-6
    assert w_both > 0.2


def test_bce_matches_torch():
    import torch

    rng = np.random.default_rng(2)
    logits = rng.normal(size=(2, 16, 16)).astype(np.float32)
    labels = (rng.uniform(size=(2, 16, 16)) > 0.5).astype(np.float32)
    ours = float(losses.bce_with_logits_loss(
        jnp.asarray(logits), jnp.asarray(labels),
        valid_mask=jnp.ones_like(jnp.asarray(labels))))
    oracle = float(torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(labels)))
    assert abs(ours - oracle) < 1e-5


def test_inter_intra_domain_losses():
    a = jnp.asarray(np.tile([[1.0, 0.0, 0.0, 0.0]], (4, 1))[:, None, :])
    b = jnp.asarray(np.tile([[0.0, 1.0, 0.0, 0.0]], (4, 1))[:, None, :])
    # orthogonal -> cos 0 -> inter = 0.5
    assert abs(float(losses.inter_domain_loss(a, b)) - 0.5) < 1e-6
    # identical -> cos 1 -> inter = 1 (maximally penalized)
    assert abs(float(losses.inter_domain_loss(a, a)) - 1.0) < 1e-6
    # intra with identical halves -> cos 1 -> 0 loss
    assert abs(float(losses.intra_domain_loss(a))) < 1e-6
