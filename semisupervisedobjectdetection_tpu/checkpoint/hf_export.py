"""Export the Flax SegFormer tree back to a torch/HF-layout state_dict.

The exact inverse of `checkpoint/hf_import.py`: a checkpoint trained in
this framework becomes loadable by the reference stack
(`SegformerForSemanticSegmentation.load_state_dict` /
`from_pretrained(..., state_dict=...)`, incl. the reference's MODIFIED
vendored model with its decode-head `cls_proj`,
`segformer_source/models/segformer/modeling_segformer.py:711-715`) — so a
reference user can take results back into their torch tooling. Round-trip
and torch-oracle logit tests: tests/test_hf_export.py.

Layout translation flax (NHWC) -> torch:
  Linear  kernel (I, O)          -> weight (O, I)
  Conv2d  kernel (kh, kw, I, O)  -> weight (O, I, kh, kw)
  Depthwise kernel (kh, kw, 1, C)-> weight (C, 1, kh, kw)
  LayerNorm/BN scale/bias -> weight/bias; batch_stats -> running_mean/var
Stage params are stored STACKED along a leading depth axis (the encoder
scans over layers); export unstacks them into per-layer torch keys.

Prompt/CLS token params have NO torch state_dict home — the reference
keeps them in encoder-owned python lists invisible to `state_dict()`
(`models/SegFormerModel.py:69-101`); `export_prompt_tokens` returns them
separately for hand-assignment to `encoder.prompt_tokens[i]` /
`encoder.cls_token[i]`.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from semisupervisedobjectdetection_tpu.core.config import MiTConfig


def _np(x) -> np.ndarray:
    # C-contiguous copy: transposed VIEWS must not reach the writers
    # (safetensors serializes the underlying buffer, so a view would be
    # saved untransposed with transposed shape metadata)
    return np.ascontiguousarray(np.asarray(x, np.float32))


def _lin(out: Dict, name: str, leaf: Dict, j: Optional[int] = None):
    k = leaf["kernel"] if j is None else leaf["kernel"][j]
    b = leaf["bias"] if j is None else leaf["bias"][j]
    out[f"{name}.weight"] = _np(np.asarray(k, np.float32).T)
    out[f"{name}.bias"] = _np(b)


def _conv(out: Dict, name: str, leaf: Dict, j: Optional[int] = None):
    k = leaf["kernel"] if j is None else leaf["kernel"][j]
    out[f"{name}.weight"] = _np(
        np.asarray(k, np.float32).transpose(3, 2, 0, 1))
    if "bias" in leaf:
        b = leaf["bias"] if j is None else leaf["bias"][j]
        out[f"{name}.bias"] = _np(b)


def _ln(out: Dict, name: str, leaf: Dict, j: Optional[int] = None):
    s = leaf["scale"] if j is None else leaf["scale"][j]
    b = leaf["bias"] if j is None else leaf["bias"][j]
    out[f"{name}.weight"] = _np(s)
    out[f"{name}.bias"] = _np(b)


def export_torch_state_dict(cfg: MiTConfig, params: Dict,
                            batch_stats: Optional[Dict] = None
                            ) -> Dict[str, np.ndarray]:
    """Flax (params, batch_stats) -> flat {torch key: numpy array}."""
    sd: Dict[str, np.ndarray] = {}
    enc = params["encoder"]

    for i in range(cfg.num_stages):
        pe = f"segformer.encoder.patch_embeddings.{i}"
        _conv(sd, f"{pe}.proj", enc[f"patch_embed_{i}"]["proj"])
        _ln(sd, f"{pe}.layer_norm", enc[f"patch_embed_{i}"]["layer_norm"])
        _ln(sd, f"segformer.encoder.layer_norm.{i}", enc[f"layer_norm_{i}"])

        block = enc[f"block_{i}"]
        pfx = f"segformer.encoder.block.{i}"
        for j in range(cfg.depths[i]):
            _ln(sd, f"{pfx}.{j}.layer_norm_1", block["layer_norm_1"], j)
            _ln(sd, f"{pfx}.{j}.layer_norm_2", block["layer_norm_2"], j)
            attn = block["attention"]
            for ours, theirs in (("query", "attention.self.query"),
                                 ("key", "attention.self.key"),
                                 ("value", "attention.self.value"),
                                 ("out", "attention.output.dense")):
                _lin(sd, f"{pfx}.{j}.{theirs}", attn[ours], j)
            if cfg.sr_ratios[i] > 1:
                _conv(sd, f"{pfx}.{j}.attention.self.sr", attn["sr"], j)
                _ln(sd, f"{pfx}.{j}.attention.self.layer_norm",
                    attn["sr_norm"], j)
            mlp = block["mlp"]
            _lin(sd, f"{pfx}.{j}.mlp.dense1", mlp["dense1"], j)
            _lin(sd, f"{pfx}.{j}.mlp.dense2", mlp["dense2"], j)
            _conv(sd, f"{pfx}.{j}.mlp.dwconv.dwconv", mlp["dwconv"], j)

    head = params["decode_head"]
    for i in range(cfg.num_stages):
        _lin(sd, f"decode_head.linear_c.{i}.proj", head[f"linear_c_{i}"])
        if f"cls_proj_{i}" in head:
            _lin(sd, f"decode_head.linear_c.{i}.cls_proj",
                 head[f"cls_proj_{i}"])
    _conv(sd, "decode_head.linear_fuse", head["linear_fuse"])
    bn = "decode_head.batch_norm"
    sd[f"{bn}.weight"] = _np(head["batch_norm"]["scale"])
    sd[f"{bn}.bias"] = _np(head["batch_norm"]["bias"])
    stats = (batch_stats or {}).get("decode_head", {}).get("batch_norm")
    if stats is not None:
        sd[f"{bn}.running_mean"] = _np(stats["mean"])
        sd[f"{bn}.running_var"] = _np(stats["var"])
    else:
        n = sd[f"{bn}.weight"].shape[0]
        sd[f"{bn}.running_mean"] = np.zeros(n, np.float32)
        sd[f"{bn}.running_var"] = np.ones(n, np.float32)
    sd[f"{bn}.num_batches_tracked"] = np.zeros((), np.int64)
    _conv(sd, "decode_head.classifier", head["classifier"])
    return sd


def export_prompt_tokens(cfg: MiTConfig, params: Dict):
    """(prompt_tokens, cls_tokens) lists for the reference's encoder-owned
    slots (`SegFormerModel.py:69-101` writes raw tensors into
    `encoder.prompt_tokens[i]` / `encoder.cls_token[i]`; they are NOT in
    `state_dict()`). Entries are numpy arrays or None per stage."""
    enc = params["encoder"]
    prompts = [None] * cfg.num_stages
    cls = [None] * cfg.num_stages
    for i in range(cfg.num_stages):
        if f"prompt_tokens_{i}" in enc:
            prompts[i] = _np(enc[f"prompt_tokens_{i}"])
        if f"cls_token_{i}" in enc:
            cls[i] = _np(enc[f"cls_token_{i}"])
    return prompts, cls


def save_torch_checkpoint(path: str, sd: Dict[str, np.ndarray]) -> None:
    """Write `.safetensors` (numpy, no torch needed) or `.pth`/`.bin`
    (torch.save of cpu tensors — the reference's load format,
    `SegFormerModel.py:21-23`)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import save_file

        save_file(sd, path)
        return
    import torch

    # copy: jax-backed numpy views are read-only, from_numpy would warn
    torch.save({k: torch.from_numpy(np.array(v)) for k, v in sd.items()},
               path)
