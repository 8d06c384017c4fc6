"""Shared torch-oracle scaffolding: the reference's OWN modified model +
weight-matched flax twin + a faithful replica of its training-loop
semantics.

Used by test_modified_parity.py (single-forward/single-step parity) and
test_trajectory_parity.py (N-step composed-loop parity). Imports the
reference's vendored modified SegFormer from /root/reference (read-only);
the only stubbed piece is `dependency_versions_check`, a pure version
assert incompatible with the installed (newer) tokenizers.

`RefTrainer` reproduces `models/SegFormerModel.py`'s training semantics —
Adam(0.5, 0.999) + weight decay over requires_grad params (`:32-37`),
ExponentialLR (`:36-37`), predict = forward -> bilinear upsample ->
sigmoid -> dice (`:103-139`), train_one_epoch's train()-then-eval()
inversion (`:146-156` + `:104-105`), and train_from_loss's
NaN-skip + clip_grad_value_(1.2) + step (`:158-162`). The dice formula is
`models/Loss.py:16-41,57-95` (smooth 1.0, per-batch mean, `1 - mean`).
`ref_threshold_pseudo_masks` replicates
`segFormer_semi_teacherstudent_main.py:24-56`.
"""

from __future__ import annotations

import functools
import sys
import types

import numpy as np

import jax
import jax.numpy as jnp

from semisupervisedobjectdetection_tpu.core.config import MiTConfig
from semisupervisedobjectdetection_tpu.checkpoint.hf_import import (
    import_hf_model,
)
from semisupervisedobjectdetection_tpu.models.segformer import SegFormer

REF_ROOT = "/root/reference"


@functools.lru_cache(maxsize=1)
def load_reference_segformer():
    """Import the reference's modified model classes, or pytest-skip.

    The vendored transformers snapshot pins tokenizers<0.14; the installed
    one is newer, so `dependency_versions_check` (a pure version assert) is
    replaced with a no-op stub before import. Only the reference's own
    model code runs."""
    import pytest

    pytest.importorskip("torch")
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    stub = types.ModuleType("segformer_source.dependency_versions_check")
    stub.dep_version_check = lambda *a, **k: None
    sys.modules.setdefault("segformer_source.dependency_versions_check",
                           stub)
    try:
        from segformer_source.models.segformer.configuration_segformer \
            import SegformerConfig
        from segformer_source.models.segformer.modeling_segformer import (
            SegformerForSemanticSegmentation,
        )
    except Exception as e:  # pragma: no cover - environment-dependent
        pytest.skip(f"reference vendored model unimportable: {e}")
    return SegformerConfig, SegformerForSemanticSegmentation


def build_pair(cfg: MiTConfig, prompt=None, per_layer=False, cls=False,
               seed=0, init_size=64):
    """(torch reference model, our flax model, our variables) with
    identical weights, prompt tokens, and CLS tokens."""
    import torch

    RefConfig, RefModel = load_reference_segformer()
    hf_cfg = RefConfig(
        num_channels=3, num_encoder_blocks=4,
        depths=list(cfg.depths), sr_ratios=list(cfg.sr_ratios),
        hidden_sizes=list(cfg.hidden_sizes),
        num_attention_heads=list(cfg.num_heads),
        patch_sizes=list(cfg.patch_sizes), strides=list(cfg.strides),
        decoder_hidden_size=cfg.decoder_hidden, num_labels=cfg.num_labels,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        classifier_dropout_prob=0.0, drop_path_rate=0.0,
        reshape_last_stage=True)
    torch.manual_seed(seed)
    ref = RefModel(hf_cfg).eval()

    flax_model = SegFormer(cfg)
    variables = jax.jit(flax_model.init)(
        jax.random.PRNGKey(seed), jnp.zeros((1, init_size, init_size, 3)))
    params, batch_stats = import_hf_model(
        ref, cfg, variables["params"], variables["batch_stats"])

    # Prompt/CLS tokens live OUTSIDE the torch state_dict (the reference
    # writes raw tensors into encoder-owned python lists,
    # `models/SegFormerModel.py:69-101`); copy our fresh-initialized flax
    # token params into those lists so both sides run identical values.
    enc_list = ref.segformer.encoder
    for i in range(cfg.num_stages):
        if prompt and prompt[i] > 0:
            tok = np.asarray(params["encoder"][f"prompt_tokens_{i}"],
                             np.float32)
            enc_list.prompt_tokens[i] = torch.tensor(tok)
        if cls:
            tok = np.asarray(params["encoder"][f"cls_token_{i}"],
                             np.float32)
            enc_list.cls_token[i] = torch.tensor(tok)
    return ref, flax_model, {"params": params, "batch_stats": batch_stats}


# ---------------------------------------------------------------- losses
def ref_dice_loss(pred, gt, smooth: float = 1.0):
    """`SegmentationLoss(1, loss_type='dice', activation='none')`:
    diceCoeff per sample flattened, batch mean, `1 - mean`
    (`models/Loss.py:16-41,93-95`)."""
    import torch

    n = gt.shape[0]
    p = pred.reshape(n, -1)
    g = gt.reshape(n, -1).to(pred.dtype)
    tp = torch.abs(torch.sum(g * p, dim=1))
    fp = torch.sum(torch.abs(p), dim=1)
    fn = torch.sum(g, dim=1)
    score = (2.0 * tp + smooth) / (fp + fn + smooth)
    return 1.0 - torch.mean(score)


def ref_mse_loss(pred, gt):
    """`SegmentationLoss(1, loss_type='mse')` -> `mse()` with the
    reference's (B, C) divisor (`models/Loss.py:44-54`); call sites pass
    (B, 3, H, W) tensors so the divisor is B*3."""
    import torch

    n = gt.shape[0]
    err = torch.sum((gt.reshape(n, -1) - pred.reshape(n, -1)) ** 2, dim=1)
    err = err / (gt.shape[0] * gt.shape[1])
    return torch.mean(err)


def ref_dice_argmax_loss(pred, gt):
    """`loss_type='dice_argmax'`: binarize pred at 0.5 then dice
    (`models/Loss.py:84-86`) — the reference eval metric."""
    import torch

    return ref_dice_loss(torch.where(pred >= 0.5, 1.0, 0.0), gt)


def ref_threshold_pseudo_masks(img, masks, threshold: float = 0.7,
                               confident_threshold: float = 0.7,
                               allow_throw_sample: bool = True):
    """Replica of `threshold_pseudo_masks`
    (`segFormer_semi_teacherstudent_main.py:24-56`): per-sample soft-pixel
    count (> 1000) + confident-fraction gate, pseudo mask = soft >= thr,
    per-kept-sample dice losses summed / kept count. Returns
    (kept_img|None, kept_pseudo_mask|None, confidence, mean_loss)."""
    import torch

    n = masks.shape[0]
    flat = masks.reshape(n, -1)
    pixel_num = torch.sum(torch.abs(flat), dim=1)
    confident = torch.where(
        (flat >= threshold) | (flat <= 1.0 - threshold), 1, 0)
    confidence = torch.sum(confident, dim=1) / masks[0].numel()
    pseudo_mask = torch.where(masks >= threshold, 1, 0)

    kept_img, kept_mask, kept = [], [], 0
    losses = torch.tensor(0.0)
    for i in range(n):
        if (not allow_throw_sample
                or (pixel_num[i] > 1000
                    and confidence[i] >= confident_threshold)):
            kept_img.append(img[i])
            kept_mask.append(pseudo_mask[i])
            losses = losses + ref_dice_loss(masks[i:i + 1],
                                            pseudo_mask[i:i + 1])
            kept += 1
    if kept:
        return (torch.stack(kept_img), torch.stack(kept_mask),
                confidence, losses / kept)
    # reference divides by len([]) -> the caller sees inf/nan semantics
    return None, None, confidence, losses / max(kept, 1) * float("nan")


def freeze_encoder_blocks(ref, layers):
    """`SegFormerModel.frozen_encoder(layers=[...])`
    (`models/SegFormerModel.py:56-59`): requires_grad=False on
    `encoder.block[i]` ONLY — the stage's patch embedding and final layer
    norm stay trainable."""
    for layer_id in layers:
        for p in ref.segformer.encoder.block[layer_id].parameters():
            p.requires_grad = False


# ---------------------------------------------------------------- trainer
class RefTrainer:
    """`models/SegFormerModel.py` training semantics around a modified
    torch SegFormer (optimizer `:32-37`, predict `:103-139`,
    train_one_epoch `:146-156`, train_from_loss `:158-162`)."""

    def __init__(self, model, lr: float, weight_decay: float = 5e-5,
                 gamma: float = 0.97):
        import torch

        self.model = model
        self.opt = torch.optim.Adam(
            [p for p in model.parameters() if p.requires_grad is not False],
            lr=lr, weight_decay=weight_decay, betas=(0.5, 0.999))
        self.sch = torch.optim.lr_scheduler.ExponentialLR(self.opt,
                                                          gamma=gamma)

    def predict(self, img, mask=None, isEval=True):
        import torch
        import torch.nn.functional as F

        if not isEval:
            self.model.eval()   # the train-in-eval-mode quirk (`:104-105`)
        out, _ = self.model(pixel_values=img)
        up = F.interpolate(out.logits, size=img.shape[2:],
                           mode="bilinear", align_corners=False)
        pred = torch.sigmoid(up).squeeze(1)
        if mask is None:
            return pred
        return ref_dice_loss(pred, mask.to(torch.int64)), pred

    def predict_ref(self, img, mask=None, isEval=True, use_loss="dice",
                    output_cls_token=False):
        """Full replica of `SegFormerModel.predict` (`:103-139`): the
        eval()-inversion quirk, int64 mask cast, bilinear upsample,
        sigmoid, loss dispatch (dice / mse-vs-RAW-logits / argmax), and
        the forward's sigmoid(final-stage CLS) second return."""
        import torch
        import torch.nn.functional as F

        if not isEval:
            self.model.eval()
        if mask is not None:
            mask = mask.to(torch.int64)
        out, cls_token = self.model(pixel_values=img)
        up = F.interpolate(out.logits, size=img.shape[2:],
                           mode="bilinear", align_corners=False)
        pred = torch.sigmoid(up).squeeze(1)
        if mask is None:
            return pred
        if use_loss == "dice":
            loss = ref_dice_loss(pred, mask)
        elif use_loss == "mse":
            loss = ref_mse_loss(img, up)   # RAW logits (`:133`)
        else:
            loss = ref_dice_argmax_loss(pred, mask)
        if output_cls_token:
            return loss, pred, cls_token
        return loss, pred

    def train_one_epoch(self, img, mask):
        self.model.train()
        loss, pred = self.predict(img, mask, isEval=False)
        self.train_from_loss(loss)
        return loss, pred

    def eval_one_epoch(self, img, mask):
        import torch

        self.model.eval()
        with torch.no_grad():
            out, _ = self.model(pixel_values=img)
            import torch.nn.functional as F

            up = F.interpolate(out.logits, size=img.shape[2:],
                               mode="bilinear", align_corners=False)
            pred = torch.sigmoid(up).squeeze(1)
            return ref_dice_argmax_loss(pred, mask), pred

    def train_one_epoch_without_mask(self, img):
        """AE reconstruction step (`:198-219`): TRAIN-mode forward (no
        eval() inversion here — the one workload the reference trains in
        true train mode), upsample, sigmoid, reference-MSE vs the input."""
        import torch
        import torch.nn.functional as F

        self.model.train()
        out, _ = self.model(pixel_values=img)
        up = F.interpolate(out.logits, size=img.shape[2:],
                           mode="bilinear", align_corners=False)
        up = torch.sigmoid(up)
        loss = ref_mse_loss(img, up)
        self.train_from_loss(loss)
        return loss, up

    def eval_one_epoch_without_mask(self, img):
        """AE reconstruction eval (`:177-196`)."""
        import torch
        import torch.nn.functional as F

        self.model.eval()
        with torch.no_grad():
            out, _ = self.model(pixel_values=img)
            up = F.interpolate(out.logits, size=img.shape[2:],
                               mode="bilinear", align_corners=False)
            up = torch.sigmoid(up)
            return ref_mse_loss(img, up), up

    def train_from_loss(self, loss):
        import torch

        self.opt.zero_grad()
        # The reference backward()s unconditionally on non-NaN losses; its
        # phase-A pseudo loss is graph-disconnected from the model (built
        # under no_grad + the Loss.py:94 requires_grad_(True) hack), so
        # backward populates NO model grads and step() is a no-op. A plain
        # replica tensor has requires_grad=False there, so gate on it —
        # identical net effect (zero model grads) without the hack.
        if not torch.isnan(loss) and loss.requires_grad:
            loss.backward()
        if any(p.grad is not None for p in self.model.parameters()):
            torch.nn.utils.clip_grad_value_(self.model.parameters(),
                                            clip_value=1.2)
            self.opt.step()
        # else: the no-grad no-op (phase-A quirk). The reference's torch
        # 2.0 clip_grad_value_ looped over an empty grad list and step()
        # skipped grad-less params — a no-op; the installed torch's
        # foreach path RAISES on the empty list, so skip explicitly.

    def scheduler_step(self):
        self.sch.step()
