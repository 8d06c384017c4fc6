"""Import DINOv2 (facebookresearch torch.hub format) weights into DinoViT.

The reference warm-starts its ViT pipeline from
`torch.hub.load('facebookresearch/dinov2', 'dinov2_vitb14')`
(`models/VitSegModel.py:20`, `main_vit_based/vit_autoencoder_main.py`);
this maps that checkpoint's state_dict onto our Flax `models.vit.DinoViT`
(stacked `nn.scan` block params), file-based and zero-egress like
`hf_import.py`.

Hub key layout handled (`dinov2_source/vision_transformer.py`):
  patch_embed.proj.{weight,bias}      Conv2d (D,3,p,p)  -> kernel (p,p,3,D)
  cls_token (1,1,D), pos_embed (1,N+1,D), mask_token (unused)
  blocks.{i}.norm1|norm2.{weight,bias}
  blocks.{i}.attn.qkv.{weight,bias}   fused (3D,D)      -> kernel (D,3D)
  blocks.{i}.attn.proj.{weight,bias}
  blocks.{i}.ls1|ls2.gamma            LayerScale
  blocks.{i}.mlp.fc1|fc2.{weight,bias}            (mlp variants)
  blocks.{i}.mlp.w12|w3.{weight,bias}             (swiglu variants)
  norm.{weight,bias}
Chunked checkpoints (`block_chunks>0`, keys `blocks.{chunk}.{j}.*` with
globally-numbered j — `vision_transformer.py:141-148`) are normalized to the
flat layout first.

A pos_embed grid mismatch (pretrained 518/14 vs a different model img_size)
is resolved with the same bicubic interpolation the model applies at
runtime (`interpolate_pos_embed`).
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach")
                      else x)


def _ln(sd, name):
    return {"scale": _t(sd[f"{name}.weight"]),
            "bias": _t(sd[f"{name}.bias"])}


def _linear(sd, name):
    return {"kernel": _t(sd[f"{name}.weight"]).T,
            "bias": _t(sd[f"{name}.bias"])}


def _stack(dicts):
    out = {}
    for k in dicts[0]:
        if isinstance(dicts[0][k], dict):
            out[k] = _stack([d[k] for d in dicts])
        else:
            out[k] = np.stack([d[k] for d in dicts])
    return out


def normalize_hub_keys(sd: Dict) -> Dict:
    """Flatten chunked `blocks.{chunk}.{j}.*` keys to `blocks.{j}.*`.

    In chunked DINOv2 the inner index j is already the GLOBAL block index
    (identity placeholders fill the gaps and have no params), so dropping
    the chunk level is lossless.
    """
    out = {}
    pat = re.compile(r"^blocks\.(\d+)\.(\d+)\.(.*)$")
    for k, v in sd.items():
        m = pat.match(k)
        out[f"blocks.{m.group(2)}.{m.group(3)}" if m else k] = v
    return out


def import_dinov2_state_dict(state_dict: Dict, target_params: Dict) -> Dict:
    """Map a hub-format DINOv2 state_dict onto DinoViT params.

    `target_params` is the DinoViT param subtree (keys `patch_embed`,
    `cls_token`, `pos_embed`, `blocks`, `norm`); unmatched leaves keep
    their fresh init. Returns a new tree of jnp arrays.
    """
    import jax
    import jax.numpy as jnp

    sd = normalize_hub_keys(
        {k.removeprefix("backbone."): v for k, v in state_dict.items()})
    params = jax.tree.map(np.asarray, target_params)

    w = _t(sd["patch_embed.proj.weight"])            # (D, 3, p, p)
    params["patch_embed"] = {"kernel": w.transpose(2, 3, 1, 0),
                             "bias": _t(sd["patch_embed.proj.bias"])}
    params["cls_token"] = _t(sd["cls_token"])
    params["norm"] = _ln(sd, "norm")

    pe = _t(sd["pos_embed"]).astype(np.float32)      # (1, N+1, D)
    tgt_n = params["pos_embed"].shape[1] - 1
    if pe.shape[1] - 1 != tgt_n:
        from semisupervisedobjectdetection_tpu.models.vit import (
            interpolate_pos_embed,
        )
        side = int(round(tgt_n ** 0.5))
        pe = np.asarray(interpolate_pos_embed(
            jnp.asarray(pe), tgt_n, side, side, patch_size=1))
    params["pos_embed"] = pe

    depth = 1 + max(int(m.group(1)) for k in sd
                    if (m := re.match(r"^blocks\.(\d+)\.", k)))
    tgt_depth = target_params["blocks"]["norm1"]["scale"].shape[0]
    if depth != tgt_depth:
        raise ValueError(
            f"checkpoint has {depth} blocks but the model scans "
            f"{tgt_depth}; build the DinoViT with depth={depth} "
            f"(e.g. vit_base for dinov2_vitb14)")
    layers = []
    for i in range(depth):
        b = f"blocks.{i}"
        layer = {
            "norm1": _ln(sd, f"{b}.norm1"),
            "norm2": _ln(sd, f"{b}.norm2"),
            "qkv": _linear(sd, f"{b}.attn.qkv"),
            "proj": _linear(sd, f"{b}.attn.proj"),
        }
        if f"{b}.ls1.gamma" in sd:
            layer["ls1"] = _t(sd[f"{b}.ls1.gamma"])
            layer["ls2"] = _t(sd[f"{b}.ls2.gamma"])
        if f"{b}.mlp.fc1.weight" in sd:
            layer["fc1"] = _linear(sd, f"{b}.mlp.fc1")
            layer["fc2"] = _linear(sd, f"{b}.mlp.fc2")
        else:  # SwiGLU (giant2)
            layer["w12"] = _linear(sd, f"{b}.mlp.w12")
            layer["w3"] = _linear(sd, f"{b}.mlp.w3")
        layers.append(layer)
    stacked = _stack(layers)
    for k, v in stacked.items():
        params["blocks"][k] = v

    return jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a, np.float32)), params)


def load_dinov2_checkpoint(path: str) -> Dict:
    """Load a hub-format DINOv2 checkpoint file (``.pth`` torch or
    ``.safetensors``) into a dict of numpy arrays."""
    from semisupervisedobjectdetection_tpu.checkpoint.hf_import import (
        load_torch_checkpoint,
    )
    sd = load_torch_checkpoint(path)
    # hub files sometimes nest under 'model' / 'teacher'
    for key in ("model", "teacher", "state_dict"):
        if key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    return sd
