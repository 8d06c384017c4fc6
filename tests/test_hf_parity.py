"""Cross-implementation numeric parity: stock transformers SegFormer (torch
CPU, random init — no network) vs our Flax rebuild with imported weights.

This is the north-star parity check of SURVEY.md §4(d): identical weights
must produce matching logits/masks. The stock HF model covers the
non-prompt path; prompt/CLS extensions are unit-tested separately
(test_model.py) since upstream transformers lacks them.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semisupervisedobjectdetection_tpu.core.config import MiTConfig
from semisupervisedobjectdetection_tpu.checkpoint.hf_import import (
    import_hf_model,
)
from semisupervisedobjectdetection_tpu.models.segformer import SegFormer

TINY = MiTConfig(depths=(2, 2, 2, 2), hidden_sizes=(8, 16, 32, 64),
                 num_heads=(1, 2, 4, 8), sr_ratios=(8, 4, 2, 1),
                 decoder_hidden=32, num_labels=1, drop_path_rate=0.0)


@pytest.fixture(scope="module")
def torch_pair():
    import torch
    from transformers import SegformerConfig
    from transformers import SegformerForSemanticSegmentation

    hf_cfg = SegformerConfig(
        num_channels=3, num_encoder_blocks=4,
        depths=list(TINY.depths), sr_ratios=list(TINY.sr_ratios),
        hidden_sizes=list(TINY.hidden_sizes),
        num_attention_heads=list(TINY.num_heads),
        patch_sizes=list(TINY.patch_sizes), strides=list(TINY.strides),
        decoder_hidden_size=TINY.decoder_hidden, num_labels=TINY.num_labels,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        classifier_dropout_prob=0.0, drop_path_rate=0.0,
        reshape_last_stage=True)
    torch.manual_seed(0)
    model = SegformerForSemanticSegmentation(hf_cfg).eval()
    return model, hf_cfg


def test_logits_match_torch_reference(torch_pair):
    import torch

    hf_model, _ = torch_pair
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)

    with torch.no_grad():
        torch_logits = hf_model(torch.tensor(x)).logits.numpy()

    flax_model = SegFormer(TINY)
    variables = jax.jit(flax_model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    params, batch_stats = import_hf_model(
        hf_model, TINY, variables["params"], variables["batch_stats"])
    logits, cls_list = jax.jit(flax_model.apply)(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    ours = np.asarray(logits).transpose(0, 3, 1, 2)

    assert ours.shape == torch_logits.shape
    np.testing.assert_allclose(ours, torch_logits, atol=2e-4, rtol=1e-3)


def test_masks_and_metrics_bitwise_comparable(torch_pair):
    """End-to-end: same weights + same input -> identical binarized masks
    and matching dice/mIoU between the torch reference pipeline
    (interpolate + sigmoid + >=0.5, `SegFormerModel.py:117-125` +
    `Loss.py:84-86`) and ours."""
    import torch

    from semisupervisedobjectdetection_tpu.eval.metrics import (
        binary_miou,
        dice_score,
    )
    from semisupervisedobjectdetection_tpu.models.segformer import (
        predict_masks,
    )

    hf_model, _ = torch_pair
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    gt = (rng.uniform(size=(2, 64, 64)) > 0.5).astype(np.float32)

    with torch.no_grad():
        t_logits = hf_model(torch.tensor(x)).logits
        t_masks = torch.sigmoid(torch.nn.functional.interpolate(
            t_logits, size=(64, 64), mode="bilinear",
            align_corners=False)).squeeze(1).numpy()

    flax_model = SegFormer(TINY)
    variables = jax.jit(flax_model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    params, batch_stats = import_hf_model(
        hf_model, TINY, variables["params"], variables["batch_stats"])
    logits, _ = jax.jit(flax_model.apply)(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    ours = np.asarray(predict_masks(logits, (64, 64)))

    # soft masks agree tightly; binarized masks agree bitwise
    np.testing.assert_allclose(ours, t_masks, atol=5e-5)
    np.testing.assert_array_equal(ours >= 0.5, t_masks >= 0.5)

    # and therefore the metrics match exactly at threshold 0.5
    def np_dice(p, g):
        pb = (p >= 0.5).astype(np.float64).reshape(2, -1)
        gb = g.reshape(2, -1)
        tp = (pb * gb).sum(1)
        return np.mean((2 * tp + 1) / (pb.sum(1) + gb.sum(1) + 1))

    assert abs(float(dice_score(jnp.asarray(ours), jnp.asarray(gt)))
               - np_dice(t_masks, gt)) < 1e-6
    assert abs(float(binary_miou(jnp.asarray(ours), jnp.asarray(gt)))
               - float(binary_miou(jnp.asarray(t_masks),
                                   jnp.asarray(gt)))) < 1e-7


def test_classifier_mismatch_keeps_fresh_init(torch_pair):
    """HF ignore_mismatched_sizes semantics: a 150-class source classifier
    must NOT overwrite our 1-class head (`modeling_utils.py:3156-3159`)."""
    import torch
    from transformers import SegformerConfig
    from transformers import SegformerForSemanticSegmentation

    hf_model, hf_cfg = torch_pair
    d = {k: v for k, v in hf_cfg.to_dict().items()
         if k not in ("id2label", "label2id", "num_labels")}
    cfg150 = SegformerConfig(**d, num_labels=150)
    torch.manual_seed(1)
    model150 = SegformerForSemanticSegmentation(cfg150).eval()

    flax_model = SegFormer(TINY)
    variables = jax.jit(flax_model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    fresh = np.asarray(
        variables["params"]["decode_head"]["classifier"]["kernel"])
    params, _ = import_hf_model(model150, TINY, variables["params"],
                                variables["batch_stats"])
    kept = np.asarray(params["decode_head"]["classifier"]["kernel"])
    np.testing.assert_array_equal(fresh, kept)

    # slice0 policy instead takes channel 0 (`SegFormerModel.py:24-28`)
    params2, _ = import_hf_model(model150, TINY, variables["params"],
                                 variables["batch_stats"],
                                 classifier_policy="slice0")
    sliced = np.asarray(params2["decode_head"]["classifier"]["kernel"])
    src = model150.decode_head.classifier.weight.detach().numpy()
    np.testing.assert_allclose(
        sliced, src[0:1].transpose(2, 3, 1, 0), atol=1e-7)
