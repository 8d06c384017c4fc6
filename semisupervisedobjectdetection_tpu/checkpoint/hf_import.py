"""Import torch SegFormer weights (nvidia/mit-b5 et al.) into the Flax tree.

Reproduces the load path of the reference (`SegFormerModel.__init__`,
`models/SegFormerModel.py:14-30`): HF `from_pretrained` weights with
`ignore_mismatched_sizes` head-reinit semantics
(`segformer_source/modeling_utils.py:3156-3159` — mismatched classifier
keeps the fresh init) plus the num_labels==1 classifier-slice surgery the
reference applies to its own checkpoints (`SegFormerModel.py:24-28` — take
output channel 0 of a multi-channel classifier).

Layout translation torch -> flax (NHWC):
  Linear  (O, I)        -> kernel (I, O)
  Conv2d  (O, I, kh, kw)-> kernel (kh, kw, I, O)
  Depthwise Conv2d (C, 1, kh, kw) -> kernel (kh, kw, 1, C)
  LayerNorm/BN weight/bias -> scale/bias; BN running stats -> batch_stats
Per-layer weights of a stage are STACKED along a leading depth axis
(our encoder scans over layers with stacked params).

Works from a torch state_dict (``.pth``/``.bin``), a safetensors file, or a
live ``transformers`` model instance (used by the numeric-parity tests; no
network needed).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from semisupervisedobjectdetection_tpu.core.config import MiTConfig


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach")
                      else x)


def _linear(sd, name):
    return {"kernel": _t(sd[f"{name}.weight"]).T,
            "bias": _t(sd[f"{name}.bias"])}


def _conv(sd, name, bias=True):
    out = {"kernel": _t(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if bias:
        out["bias"] = _t(sd[f"{name}.bias"])
    return out


def _ln(sd, name):
    return {"scale": _t(sd[f"{name}.weight"]),
            "bias": _t(sd[f"{name}.bias"])}


def _stack(dicts):
    """[{'kernel':...}, ...] per layer -> {'kernel': stacked, ...}."""
    out = {}
    for k in dicts[0]:
        out[k] = np.stack([d[k] for d in dicts])
    return out


def import_torch_state_dict(state_dict: Dict, cfg: MiTConfig,
                            target_params: Dict,
                            target_batch_stats: Optional[Dict] = None,
                            classifier_policy: str = "auto"):
    """Map a torch SegFormer state_dict onto our (params, batch_stats).

    `target_params` supplies the destination structure and the fresh values
    kept wherever the source has no matching tensor (prompt/CLS tokens,
    cls_proj for stock checkpoints, reinitialized classifier heads).

    classifier_policy:
      - 'auto': copy when shapes match, else keep fresh init (HF
        ignore_mismatched_sizes semantics).
      - 'slice0': take source output-channel 0 when our num_labels==1
        (the reference's checkpoint surgery, `SegFormerModel.py:24-28`).
    """
    import jax

    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}
    n_stages = cfg.num_stages

    params = jax.tree.map(np.asarray, target_params)
    batch_stats = jax.tree.map(np.asarray, target_batch_stats or {})
    enc = params["encoder"]

    for i in range(n_stages):
        pe = f"segformer.encoder.patch_embeddings.{i}"
        enc[f"patch_embed_{i}"]["proj"] = _conv(sd, f"{pe}.proj")
        enc[f"patch_embed_{i}"]["layer_norm"] = _ln(sd, f"{pe}.layer_norm")
        enc[f"layer_norm_{i}"] = _ln(sd, f"segformer.encoder.layer_norm.{i}")

        depth = cfg.depths[i]
        block = enc[f"block_{i}"]
        pfx = f"segformer.encoder.block.{i}"
        block["layer_norm_1"] = _stack(
            [_ln(sd, f"{pfx}.{j}.layer_norm_1") for j in range(depth)])
        block["layer_norm_2"] = _stack(
            [_ln(sd, f"{pfx}.{j}.layer_norm_2") for j in range(depth)])
        attn = block["attention"]
        for ours, theirs in (("query", "attention.self.query"),
                             ("key", "attention.self.key"),
                             ("value", "attention.self.value"),
                             ("out", "attention.output.dense")):
            attn[ours] = _stack(
                [_linear(sd, f"{pfx}.{j}.{theirs}") for j in range(depth)])
        if cfg.sr_ratios[i] > 1:
            attn["sr"] = _stack(
                [_conv(sd, f"{pfx}.{j}.attention.self.sr")
                 for j in range(depth)])
            attn["sr_norm"] = _stack(
                [_ln(sd, f"{pfx}.{j}.attention.self.layer_norm")
                 for j in range(depth)])
        mlp = block["mlp"]
        mlp["dense1"] = _stack(
            [_linear(sd, f"{pfx}.{j}.mlp.dense1") for j in range(depth)])
        mlp["dense2"] = _stack(
            [_linear(sd, f"{pfx}.{j}.mlp.dense2") for j in range(depth)])
        mlp["dwconv"] = _stack(
            [_conv(sd, f"{pfx}.{j}.mlp.dwconv.dwconv")
             for j in range(depth)])

    head = params["decode_head"]
    for i in range(n_stages):
        head[f"linear_c_{i}"] = _linear(sd, f"decode_head.linear_c.{i}.proj")
        cls_key = f"decode_head.linear_c.{i}.cls_proj.weight"
        if f"cls_proj_{i}" in head and cls_key in sd:
            head[f"cls_proj_{i}"] = _linear(
                sd, f"decode_head.linear_c.{i}.cls_proj")
    head["linear_fuse"] = _conv(sd, "decode_head.linear_fuse", bias=False)
    bn = "decode_head.batch_norm"
    head["batch_norm"] = {"scale": _t(sd[f"{bn}.weight"]),
                          "bias": _t(sd[f"{bn}.bias"])}
    if batch_stats:
        batch_stats["decode_head"]["batch_norm"] = {
            "mean": _t(sd[f"{bn}.running_mean"]),
            "var": _t(sd[f"{bn}.running_var"])}

    src_cls_w = _t(sd["decode_head.classifier.weight"])  # (O, I, 1, 1)
    src_cls_b = _t(sd["decode_head.classifier.bias"])
    dst_cls = head["classifier"]
    if src_cls_w.shape[0] == cfg.num_labels:
        head["classifier"] = {
            "kernel": src_cls_w.transpose(2, 3, 1, 0),
            "bias": src_cls_b}
    elif classifier_policy == "slice0" and cfg.num_labels == 1:
        head["classifier"] = {
            "kernel": src_cls_w[0:1].transpose(2, 3, 1, 0),
            "bias": src_cls_b[0:1]}
    # else: keep fresh init (ignore_mismatched_sizes semantics)

    # Restore original leaf dtypes/types (jnp arrays)
    import jax.numpy as jnp

    params = jax.tree.map(lambda a: jnp.asarray(np.asarray(a, np.float32)),
                          params)
    if batch_stats:
        batch_stats = jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a, np.float32)), batch_stats)
    return params, batch_stats


def import_hf_model(hf_model, cfg: MiTConfig, target_params,
                    target_batch_stats=None, classifier_policy="auto"):
    """Import directly from a live transformers SegformerForSemantic-
    Segmentation instance (test path; avoids any hub download)."""
    return import_torch_state_dict(hf_model.state_dict(), cfg,
                                   target_params, target_batch_stats,
                                   classifier_policy)


def load_torch_checkpoint(path: str):
    """Load a ``.pth``/``.bin`` torch checkpoint or ``.safetensors`` file
    into a plain dict of numpy arrays (host-side, no GPU)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v for k, v in sd.items()}
