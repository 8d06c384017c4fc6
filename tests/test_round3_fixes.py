"""Round-3 fixes: cross_entropy loss dispatch (torch oracle), remat-spec
validation, fused-FFN/int8 gating, and stale int8 snapshot invalidation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from semisupervisedobjectdetection_tpu import losses
from semisupervisedobjectdetection_tpu.core.config import mit_b0
from semisupervisedobjectdetection_tpu.models.segformer import _remat_block


def test_cross_entropy_matches_torch_oracle():
    """`cross_entropy_loss` vs torch F.cross_entropy with probability
    targets, the exact call the reference dispatcher makes
    (`models/Loss.py:88-92`: F.cross_entropy(y_pred, y_true.float()))."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    pred = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)   # B,C,H,W
    tgt = rng.uniform(size=(2, 4, 8, 8)).astype(np.float32)

    want = float(F.cross_entropy(torch.from_numpy(pred),
                                 torch.from_numpy(tgt)))
    # Our layout is NHWC; CE runs over the channel axis.
    got = float(losses.cross_entropy_loss(
        jnp.asarray(pred.transpose(0, 2, 3, 1)),
        jnp.asarray(tgt.transpose(0, 2, 3, 1)), axis=-1))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # Dispatch returns 1 - CE exactly like the reference's
    # `1 - mean(class_score)` tail (`Loss.py:93-95`).
    disp = float(losses.segmentation_loss(
        jnp.asarray(pred.transpose(0, 2, 3, 1)),
        jnp.asarray(tgt.transpose(0, 2, 3, 1)),
        loss_type="cross_entropy"))
    np.testing.assert_allclose(disp, 1.0 - want, rtol=1e-5)


def test_cross_entropy_single_channel_degenerate():
    # num_classes=1: log_softmax over one class is 0 -> CE 0 -> loss 1,
    # the reference's own degenerate behavior.
    pred = jnp.asarray(np.random.default_rng(1).normal(size=(2, 8, 8)),
                       jnp.float32)
    gt = jnp.ones((2, 8, 8), jnp.float32)
    assert float(losses.segmentation_loss(pred, gt, "cross_entropy")) == 1.0


def test_remat_spec_list_too_short_raises():
    with pytest.raises(ValueError, match="per-stage"):
        _remat_block("full,none", stage=2)
    # Single policy broadcasts to any stage; full list indexes fine.
    _remat_block("full", stage=3)
    _remat_block("full,none,dots,full", stage=3)


def test_structural_rebuild_invalidates_int8_snapshot():
    from semisupervisedobjectdetection_tpu.api import SegFormerModel

    tiny = mit_b0(depths=(1, 1, 1, 1), hidden_sizes=(8, 16, 32, 64),
                  num_heads=(1, 2, 4, 8), decoder_hidden=32)
    m = SegFormerModel(config=tiny)
    m.quantize()
    assert m._qvars is not None
    m.add_prompt_token((2, 2, 2, 2))
    assert m._qvars is None and m._qcfg is None
