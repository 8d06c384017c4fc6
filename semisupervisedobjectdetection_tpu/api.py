"""Reference-surface API: a `SegFormerModel` class mirroring the reference's
`models/SegFormerModel.py` public methods on top of the jitted TPU steps.

Method-for-method parity (reference `models/SegFormerModel.py`):
  predict / train_one_epoch / eval_one_epoch / scheduler_step /
  frozen_encoder / unfroze_encoder / add_prompt_token / add_cls_token /
  train_one_epoch_without_mask / eval_one_epoch_without_mask / show_mask /
  save / load.

Design deltas (all documented):
- `train_from_loss` does not exist standalone: on TPU the loss and update
  fuse into one compiled step (loss graphs can't cross the jit boundary);
  every `train_one_epoch*` method already applies the update.
- prompt/CLS tokens are REAL parameters. With
  `TrainConfig.reference_quirks=True` (default) they are masked out of the
  optimizer, reproducing the reference's untrained-prompt quirk
  (SURVEY.md §2.4); set reference_quirks=False to actually train them.
- `frozen_encoder`/`add_prompt_token`/`add_cls_token` rebuild the optimizer
  (fresh Adam moments). The reference calls them before training starts, so
  this is observationally identical in every reference workflow.
- show_mask writes a PNG overlay (red channel := mask, like the reference's
  visdom panel at `SegFormerModel.py:167-175`) instead of HTTP-posting to a
  visdom server.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from semisupervisedobjectdetection_tpu.core.config import (
    MiTConfig,
    TrainConfig,
    mit_b5,
)
from semisupervisedobjectdetection_tpu.models.segformer import SegFormer
from semisupervisedobjectdetection_tpu.train import state as state_lib
from semisupervisedobjectdetection_tpu.train import (
    autoencoder as ae_steps,
)
from semisupervisedobjectdetection_tpu.train import supervised as sup_steps
from semisupervisedobjectdetection_tpu.train.state import TrainState


import functools


@functools.partial(jax.jit, static_argnames=("cfg", "train_mode"))
def _jit_forward_masks(cfg, variables, images, train_mode=False):
    from semisupervisedobjectdetection_tpu.train.common import forward_masks

    return forward_masks(cfg, variables, images, train_mode=train_mode)


@functools.partial(jax.jit, static_argnames=("cfg", "train_mode"))
def _jit_forward_logits(cfg, variables, images, train_mode=False):
    from semisupervisedobjectdetection_tpu.train.common import (
        forward_logits,
    )

    return forward_logits(cfg, variables, images, train_mode=train_mode)


def _to_nhwc(img: np.ndarray) -> np.ndarray:
    """Accept NHWC or (reference-style) NCHW float batches."""
    img = np.asarray(img, np.float32)
    if img.ndim == 4 and img.shape[1] == 3 and img.shape[-1] != 3:
        img = img.transpose(0, 2, 3, 1)
    return img


class SegFormerModel:
    """Drop-in-shaped replacement for the reference model wrapper."""

    def __init__(self, pretrain_weight: Optional[str] = None,
                 lr: Optional[float] = None,
                 weight_decay: Optional[float] = None,
                 scheduler: Optional[float] = None,
                 num_labels: int = 1,
                 use_dice_loss: bool = True,
                 config: Optional[MiTConfig] = None,
                 train_config: Optional[TrainConfig] = None,
                 hf_weights: Optional[str] = None,
                 seed: int = 0,
                 grad_accum: int = 1):
        tc = train_config or TrainConfig()
        if lr is not None:
            tc = tc.replace(lr=lr)
        if weight_decay is not None:
            tc = tc.replace(weight_decay=weight_decay)
        if scheduler is not None:
            tc = tc.replace(lr_decay=scheduler)
        self.tc = tc
        self.cfg = (config or mit_b5()).replace(num_labels=num_labels)
        self.num_labels = num_labels
        self.use_dice_loss = use_dice_loss
        self.seed = seed
        # Microbatch count per update (train/supervised.py::train_step
        # accum — one optimizer step over `grad_accum` scanned forwards).
        self.grad_accum = max(1, int(grad_accum))
        self._frozen_stages: List[int] = []
        self._rng = jax.random.PRNGKey(seed)
        self._qvars = None           # int8 serving snapshot (see quantize)
        self._qcfg = None
        self._init_state()

        if hf_weights:
            self.load_hf(hf_weights)
        if pretrain_weight:
            self.load(pretrain_weight)

    # ------------------------------------------------------------------ init
    def _init_variables(self, cfg: MiTConfig):
        model = SegFormer(cfg)
        dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
        return jax.jit(model.init)(jax.random.PRNGKey(self.seed), dummy)

    def _trainable_mask(self, params):
        quirks = self.tc.reference_quirks
        predicate = state_lib.frozen_stage_predicate(
            self._frozen_stages, freeze_prompts=quirks, freeze_cls=quirks)
        mask = state_lib.trainable_mask_from(params, predicate)
        if not any(not m for m in jax.tree.leaves(mask)):
            return None
        return mask

    def _init_state(self, keep_params=None, keep_stats=None):
        # Any structural rebuild (frozen_encoder, add_prompt_token, ...)
        # invalidates the int8 serving snapshot; drop it so predict cannot
        # silently serve stale quantized weights (call quantize() again).
        self._qvars = None
        self._qcfg = None
        variables = self._init_variables(self.cfg)
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        if keep_params is not None:
            params = _merge_trees(params, keep_params)
        if keep_stats is not None:
            stats = _merge_trees(stats, keep_stats)
        self.state = TrainState.create(
            {"params": params, "batch_stats": stats}, self.tc,
            trainable_mask=self._trainable_mask(params))

    # -------------------------------------------------- reference surface
    def frozen_encoder(self, layers_num: Optional[int] = None,
                       layers: Optional[Sequence[int]] = None) -> None:
        """Freeze encoder stages (ref `SegFormerModel.py:46-63`):
        `layers_num=k` freezes the first k stages; `layers=[...]` freezes the
        listed stage indices."""
        if layers is not None:
            self._frozen_stages = list(layers)
        else:
            k = layers_num if layers_num is not None else self.cfg.num_stages
            self._frozen_stages = list(range(k))
        self._init_state(keep_params=self.state.params,
                         keep_stats=self.state.batch_stats)

    def unfroze_encoder(self) -> None:
        self._frozen_stages = []
        self._init_state(keep_params=self.state.params,
                         keep_stats=self.state.batch_stats)

    def add_prompt_token(self, token_num_per_block=(10, 10, 10, 10),
                        isSamePerLayer: bool = True) -> None:
        """Add learnable prompt tokens per stage (ref `:69-91`)."""
        self.cfg = self.cfg.replace(
            prompt_tokens=tuple(token_num_per_block),
            prompt_per_layer=not isSamePerLayer)
        self._init_state(keep_params=self.state.params,
                         keep_stats=self.state.batch_stats)

    def add_cls_token(self, token_num_per_block=(1, 1, 1, 1)) -> None:
        """Add per-stage domain CLS tokens (ref `:93-101`)."""
        self.cfg = self.cfg.replace(
            cls_tokens=tuple(token_num_per_block))
        self._init_state(keep_params=self.state.params,
                         keep_stats=self.state.batch_stats)

    def quantize(self, kind: str = "int8") -> None:
        """Snapshot the current weights into a low-precision serving path
        (`ops/quant.py`): dense kernels become `kind` ('int8' — ~2x MXU
        rate on TPU v5e — or 'fp8' e4m3, native-rate on fp8-MXU TPUs,
        v6e+) with per-channel scales, activations quantize dynamically
        at run time. `predict` then runs quantized; training methods keep
        the f32 state (call `quantize()` again to refresh the snapshot,
        `dequantize()` to serve f32 again). TPU-serving addition; no
        reference analogue."""
        from semisupervisedobjectdetection_tpu.ops.quant import (
            quantize_dense_params,
        )
        self._qvars = {"params": quantize_dense_params(self.state.params,
                                                       kind=kind)}
        if self.state.batch_stats:
            self._qvars["batch_stats"] = self.state.batch_stats
        self._qcfg = self.cfg.replace(quant=kind)

    def dequantize(self) -> None:
        self._qvars = None
        self._qcfg = None

    def save_quantized(self, path: str) -> None:
        """Persist the quantized serving snapshot (quantize() first) so a
        serving process can load weights without the f32 checkpoint —
        the on-disk artifact is ~4x smaller for the dense kernels.
        TPU-serving addition; no reference analogue."""
        import os

        import orbax.checkpoint as ocp

        if self._qvars is None:
            raise ValueError("no quantized snapshot — call quantize() "
                             "first")
        ocp.PyTreeCheckpointer().save(os.path.abspath(path), self._qvars,
                                      force=True)

    def load_quantized(self, path: str) -> None:
        """Load a snapshot written by `save_quantized`; `predict` serves
        it until `dequantize()`. The width (int8 vs fp8) is recovered
        from the stored kernel dtypes; the model config must match the
        one the snapshot was quantized from."""
        import os

        import orbax.checkpoint as ocp

        restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
        self._qvars = jax.tree.map(jnp.asarray, restored)
        kinds = {("fp8" if l.dtype == jnp.float8_e4m3fn else "int8")
                 for l in jax.tree.leaves(self._qvars["params"])
                 if l.dtype in (jnp.int8, jnp.float8_e4m3fn)}
        if len(kinds) != 1:
            raise ValueError(
                f"cannot infer snapshot width from {path}: found "
                f"quantized kernel dtypes {sorted(kinds) or 'none'}")
        self._qcfg = self.cfg.replace(quant=kinds.pop())

    def _serving(self):
        """(cfg, variables) used by predict: the int8 snapshot when
        `quantize()` is active, else the live train state."""
        if self._qvars is not None:
            return self._qcfg, self._qvars
        return self.cfg, self.state.variables()

    def export_serving(self, path: str, batch_size: int,
                       img_size: int | None = None,
                       platforms=("cpu", "tpu")) -> dict:
        """Write a self-contained AOT serving artifact: the compiled
        predict (weights baked in as StableHLO constants) at one pinned
        batch shape, loadable by `checkpoint.serving_export.load_serving`
        with no model code or checkpoint tree. Exports the int8 snapshot
        when `quantize()` is active, else the live f32 weights. Returns
        the artifact header. TPU-serving addition; no reference
        analogue."""
        from semisupervisedobjectdetection_tpu.checkpoint.serving_export \
            import export_serving

        scfg, svars = self._serving()
        return export_serving(scfg, svars, path, batch_size=batch_size,
                              img_size=img_size, platforms=platforms)

    def predict(self, img, mask=None, isEval: bool = True,
                use_loss: str = "dice", output_cls_token: bool = False):
        """Forward + loss selection (ref `:103-139`). Returns masks, or
        (loss, masks[, cls_token]) when a target is given."""
        images = jnp.asarray(_to_nhwc(img))
        scfg, svars = self._serving()
        need_logits = use_loss in ("mse", "bce")
        if need_logits or (output_cls_token and self.cfg.use_cls):
            # One forward returning raw upsampled logits; masks derive from
            # them so no second pass is needed.
            logits, cls_list, _ = _jit_forward_logits(
                scfg, svars, images, train_mode=False)
            pred = jax.nn.sigmoid(logits)
            if pred.ndim == 4 and pred.shape[-1] == 1:
                pred = pred[..., 0]
            # The reference forward returns sigmoid(cls_token[-1])
            # (modeling_segformer.py:848-850).
            cls_for_output = (jax.nn.sigmoid(
                cls_list[-1].astype(jnp.float32))
                if self.cfg.use_cls else None)
        else:
            logits = None
            masks_, _, _ = _jit_forward_masks(scfg, svars, images,
                                              train_mode=False)
            pred = masks_
            cls_for_output = None
        if mask is None and use_loss != "mse":
            return np.asarray(pred)
        from semisupervisedobjectdetection_tpu import losses as L

        if use_loss == "mse":
            # image vs raw upsampled logits (ref `:133`)
            loss = L.mse_loss(images, logits,
                              divisor=images.shape[0] * 3)
        else:
            target = jnp.asarray(np.asarray(mask, np.float32))
            if use_loss == "dice":
                loss = L.dice_loss(pred, target)
            elif use_loss == "bce":
                # Real logits + the valid-pixel mask of the vendored model
                # (labels >= 0 and != 255 — modeling_segformer.py:863-868).
                lg = logits[..., 0] if logits.ndim == 4 else logits
                valid = (target >= 0) & (target != 255)
                loss = L.bce_with_logits_loss(lg, target, valid_mask=valid)
            else:
                loss = L.dice_argmax_loss(pred, target)
        cls = cls_for_output
        if output_cls_token:
            return loss, np.asarray(pred), cls
        return loss, np.asarray(pred)

    def train_one_epoch(self, imgs, masks, use_loss: str = "dice",
                        output_cls_token: bool = False,
                        lazy: bool = False):
        """One fused train step on a batch (ref `:146-156`; the name matches
        the reference, which also steps per batch).

        `lazy=True` returns the loss/prediction as device arrays without a
        host transfer — the default `np.asarray(pred)` ships the full
        (B,H,W) prediction through the TPU tunnel every step (~16MB at B16
        512², dwarfing the step's useful host work). Hot loops pass
        lazy=True and sync metrics once per epoch (`cli/common.host_floats`).
        """
        images = jnp.asarray(_to_nhwc(imgs))
        target = jnp.asarray(np.asarray(masks, np.float32))
        self._rng, step_rng = jax.random.split(self._rng)
        self.state, loss, pred = sup_steps.train_step(
            self.state, images, target, step_rng, self.cfg,
            loss_type=use_loss,
            train_mode=not self.tc.reference_quirks,
            accum=self.grad_accum)
        pred_out = pred if lazy else np.asarray(pred)
        if output_cls_token:
            # CLS tokens of the last forward (separate pass; only used by
            # the few-shot workload which has its own fused step)
            return loss, pred_out, None
        return loss, pred_out

    def eval_one_epoch(self, imgs, masks, lazy: bool = False):
        """Binarized-dice eval step (ref `:141-144`). `lazy=True` skips the
        per-step prediction host transfer (see train_one_epoch)."""
        images = jnp.asarray(_to_nhwc(imgs))
        target = jnp.asarray(np.asarray(masks, np.float32))
        loss, pred = sup_steps.eval_step(self.state, images, target,
                                         self.cfg)
        return loss, (pred if lazy else np.asarray(pred))

    def train_one_epoch_without_mask(self, imgs, lazy: bool = False):
        """Autoencoder train step: reconstruct the input (ref `:198-219`).
        `lazy=True` skips the per-step reconstruction host transfer
        ((B,H,W,3) f32 — see train_one_epoch)."""
        images = jnp.asarray(_to_nhwc(imgs))
        self._rng, step_rng = jax.random.split(self._rng)
        self.state, loss, recon = ae_steps.ae_train_step(
            self.state, images, step_rng, self.cfg,
            accum=self.grad_accum)
        return loss, (recon if lazy else np.asarray(recon))

    def eval_one_epoch_without_mask(self, imgs, lazy: bool = False):
        images = jnp.asarray(_to_nhwc(imgs))
        loss, recon = ae_steps.ae_eval_step(self.state, images, self.cfg)
        return loss, (recon if lazy else np.asarray(recon))

    def scheduler_step(self) -> None:
        """Per-epoch ExponentialLR step (ref `:164-165`)."""
        self.state = self.state.scheduler_step()

    def show_mask(self, out_path: str, img, mask=None,
                  title: str = "") -> str:
        """Deterministic mask dump replacing the visdom overlay
        (ref `:167-175`): red channel := mask, saved as PNG."""
        from PIL import Image

        arr = _to_nhwc(np.asarray(img)[None])[0].copy()
        if mask is not None:
            arr[..., 0] = np.asarray(mask, np.float32)
        arr = np.clip(arr * 255, 0, 255).astype(np.uint8)
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        Image.fromarray(arr).save(out_path)
        return out_path

    # ------------------------------------------------------- checkpointing
    def save(self, path: str) -> None:
        from semisupervisedobjectdetection_tpu.checkpoint.orbax_io import (
            save_state,
        )
        save_state(path, self.state)

    def load(self, path: str, *, full_state: bool = False) -> None:
        """Warm-start load (the reference ctor's `.pth` load,
        `SegFormerModel.py:21-30`): weights+BN stats from the checkpoint,
        fresh Adam, scheduler at epoch 0 — the checkpoint's saved epoch
        would otherwise silently decay the configured lr
        (`base_lr * gamma^epoch`, train/state.py). `full_state=True`
        additionally adopts the optimizer state and epoch (resume
        semantics; the `--resume` CLI paths use `load_last` instead)."""
        from semisupervisedobjectdetection_tpu.checkpoint.orbax_io import (
            restore_state,
        )
        self.state = restore_state(
            path, self.state,
            load_opt_state=None if full_state else False,
            load_epoch=full_state)
        print("Pretrained model loaded")

    def export_hf(self, path: str) -> None:
        """Write the current weights as a torch/HF-layout checkpoint
        (`.safetensors` or `.pth`) loadable by the reference stack —
        the inverse of `load_hf` (checkpoint/hf_export.py). Prompt/CLS
        tokens have no torch state_dict home (the reference keeps them in
        encoder-owned lists, `SegFormerModel.py:69-101`); recover them
        with `checkpoint.hf_export.export_prompt_tokens`."""
        from semisupervisedobjectdetection_tpu.checkpoint.hf_export import (
            export_torch_state_dict,
            save_torch_checkpoint,
        )
        sd = export_torch_state_dict(self.cfg, self.state.params,
                                     self.state.batch_stats)
        save_torch_checkpoint(path, sd)

    def load_hf(self, path_or_model) -> None:
        """Import torch SegFormer weights (file path or live HF model),
        with the classifier-head policy of `SegFormerModel.py:21-30`."""
        from semisupervisedobjectdetection_tpu.checkpoint.hf_import import (
            import_hf_model,
            import_torch_state_dict,
            load_torch_checkpoint,
        )
        if isinstance(path_or_model, str):
            sd = load_torch_checkpoint(path_or_model)
            params, stats = import_torch_state_dict(
                sd, self.cfg, self.state.params, self.state.batch_stats,
                classifier_policy="slice0" if self.num_labels == 1
                else "auto")
        else:
            params, stats = import_hf_model(
                path_or_model, self.cfg, self.state.params,
                self.state.batch_stats)
        self.state = self.state.replace(params=params,
                                        batch_stats=stats or
                                        self.state.batch_stats)
        print("Pretrained model loaded")


def _merge_trees(fresh, old):
    """Overlay `old` leaves onto `fresh` wherever path+shape match (used
    when the param structure grows, e.g. add_prompt_token)."""
    if isinstance(fresh, dict):
        out = {}
        for k, v in fresh.items():
            if isinstance(old, dict) and k in old:
                out[k] = _merge_trees(v, old[k])
            else:
                out[k] = v
        return out
    if old is not None and hasattr(old, "shape") and \
            getattr(old, "shape", None) == getattr(fresh, "shape", None):
        return old
    return fresh
