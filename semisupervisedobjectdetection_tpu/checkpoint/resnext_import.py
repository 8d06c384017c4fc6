"""Import torchvision ResNet/ResNeXt ImageNet weights into ResNetEncoder.

The reference's CNN baselines all use an `encoder_weights='imagenet'`
ResNeXt101-32x8d encoder (`main_other/baseline_segmentation.py:154-162` via
segmentation_models_pytorch, which wraps the torchvision checkpoint). This
maps a torchvision-format state_dict file onto our Flax
`models.cnn.ResNetEncoder` (file-based, zero-egress — conventions of
`hf_import.py`).

torchvision key layout -> Flax module tree:
  conv1 / bn1                      -> ConvBN_0 (stem)
  layer{s}.{j}.conv{1,2,3}/bn{1,2,3} -> Bottleneck_{k}.ConvBN_{0,1,2}
  layer{s}.{j}.downsample.{0,1}    -> Bottleneck_{k}.ConvBN_3
with k the global block index in call order (layers concatenated), conv
weights (O,I,kh,kw) -> kernel (kh,kw,I,O) (grouped convs transpose the
same way), BN weight/bias -> scale/bias and running stats -> batch_stats.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach")
                      else x)


def _convbn(sd, conv, bn):
    params = {
        "Conv_0": {"kernel": _t(sd[f"{conv}.weight"]).transpose(2, 3, 1, 0)},
        "BatchNorm_0": {"scale": _t(sd[f"{bn}.weight"]),
                        "bias": _t(sd[f"{bn}.bias"])},
    }
    stats = {"BatchNorm_0": {"mean": _t(sd[f"{bn}.running_mean"]),
                             "var": _t(sd[f"{bn}.running_var"])}}
    return params, stats


def import_resnext_state_dict(state_dict: Dict, target_params: Dict,
                              target_batch_stats: Dict,
                              depths: Sequence[int] = (3, 4, 23, 3)
                              ) -> Tuple[Dict, Dict]:
    """Map a torchvision ResNet-family state_dict onto the encoder subtree.

    `target_params`/`target_batch_stats` are the `ResNetEncoder` subtrees
    (keys `ConvBN_0`, `Bottleneck_{k}`); the classifier `fc.*` source keys
    are ignored. Returns new (params, batch_stats) trees of jnp arrays.
    """
    import jax
    import jax.numpy as jnp

    sd = {k.removeprefix("module."): v for k, v in state_dict.items()}
    params = jax.tree.map(np.asarray, target_params)
    stats = jax.tree.map(np.asarray, target_batch_stats)

    params["ConvBN_0"], stats["ConvBN_0"] = _convbn(sd, "conv1", "bn1")

    k = 0
    for s, depth in enumerate(depths, start=1):
        for j in range(depth):
            blk, bst = {}, {}
            pfx = f"layer{s}.{j}"
            if f"{pfx}.conv1.weight" not in sd:
                raise ValueError(
                    f"source checkpoint has no {pfx}: depths mismatch "
                    f"(importer {tuple(depths)} vs checkpoint)")
            for c in range(3):
                blk[f"ConvBN_{c}"], bst[f"ConvBN_{c}"] = _convbn(
                    sd, f"{pfx}.conv{c + 1}", f"{pfx}.bn{c + 1}")
            if f"{pfx}.downsample.0.weight" in sd:
                blk["ConvBN_3"], bst["ConvBN_3"] = _convbn(
                    sd, f"{pfx}.downsample.0", f"{pfx}.downsample.1")
            name = f"Bottleneck_{k}"
            if name not in params:
                raise ValueError(
                    f"target encoder has no {name}: depths mismatch "
                    f"(importer {tuple(depths)} vs model)")
            params[name] = blk
            stats[name] = bst
            k += 1

    params = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a, np.float32)), params)
    stats = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a, np.float32)), stats)
    return params, stats


def load_resnext_checkpoint(path: str) -> Dict:
    """Load a torchvision ``.pth`` checkpoint (or safetensors) into a dict
    of numpy arrays."""
    from semisupervisedobjectdetection_tpu.checkpoint.hf_import import (
        load_torch_checkpoint,
    )
    return load_torch_checkpoint(path)
