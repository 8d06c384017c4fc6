"""Configuration tree for the TPU-native framework.

Replaces the reference's module-of-dicts (`config.py:8-45` in the reference)
with frozen dataclasses: a model config (MiT variants B0..B5), a data config
(tile directories + augmentation constants) and a train config (optimizer
constants mirroring reference `models/SegFormerModel.py:32-37` and
`config.py:11-18`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class MiTConfig:
    """Mix Transformer (SegFormer encoder) + all-MLP decode head configuration.

    Constants follow the reference's vendored SegFormer
    (`segformer_source/models/segformer/configuration_segformer.py:105-125`
    for B0 defaults; B5 from the nvidia/mit-b5 hub config as asserted by
    `models/SegFormerModel.py:72`).
    """

    num_channels: int = 3
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    hidden_sizes: Tuple[int, ...] = (32, 64, 160, 256)
    patch_sizes: Tuple[int, ...] = (7, 3, 3, 3)
    strides: Tuple[int, ...] = (4, 2, 2, 2)
    num_heads: Tuple[int, ...] = (1, 2, 5, 8)
    sr_ratios: Tuple[int, ...] = (8, 4, 2, 1)
    mlp_ratio: float = 4.0
    hidden_dropout: float = 0.0
    attention_dropout: float = 0.0
    classifier_dropout: float = 0.1
    drop_path_rate: float = 0.1
    layer_norm_eps: float = 1e-6
    decoder_hidden: int = 256
    num_labels: int = 1

    # Prompt tuning extensions (reference `modeling_segformer.py:391-394,444-465`).
    # prompt_tokens[i] = number of learnable prompt tokens prepended at every
    # layer of stage i. cls_tokens[i] = number of domain-CLS tokens prepended at
    # the first layer of stage i and carried across layers within the stage.
    prompt_tokens: Tuple[int, ...] = (0, 0, 0, 0)
    prompt_per_layer: bool = False  # distinct prompt tokens per layer if True
    cls_tokens: Tuple[int, ...] = (0, 0, 0, 0)

    # Compute dtype for the forward pass ("bfloat16" or "float32"). Params are
    # always stored in float32.
    dtype: str = "float32"

    # Rematerialization policy for the scanned encoder blocks: trades FLOPs
    # for HBM so MiT-B5 @ 512x512 fits large batches on a 16G v5e chip.
    # "none" | "full" (save nothing) | "dots" (save matmul outputs) |
    # "save:a+b+c" (save only named activations: ln1 q kv_in k v ctx ln2
    # ffn1 dwconv gelu). A comma-separated list gives a per-stage policy,
    # e.g. "full,full,save:gelu+ln2,none".
    remat: str = "full"

    # Attention implementation: "xla" (einsum) or "pallas" (fused VMEM
    # softmax kernel, `ops/sr_attention.py`). Pallas path requires
    # attention_dropout == 0 (the reference default).
    attn_impl: str = "xla"

    # (The former `dwconv_impl` knob — token-layout Pallas dwconv and the
    # whole-FFN fused kernel — was removed in round 5: both were measured
    # dead ends vs XLA's native-MXU conv lowering; CLAUDE.md round-2
    # notes keep the numbers.)

    # Whole-MixFFN dataflow: "xla" (dense/conv chain; under `tp_shard`
    # GSPMD inserts one all-reduce per layer) or "collective" (explicit
    # ring-overlapped AG-matmul -> local dwconv/GELU -> matmul-RS via
    # shard_map over the ambient mesh's `tp` axis,
    # `parallel/collective.py::mixffn_collective_ctx`). "collective"
    # activates only when a `jax.set_mesh` context mesh with a `tp` axis
    # is in scope and the stage's token/hidden counts divide it; it falls
    # back to the XLA chain otherwise, so one config runs anywhere.
    ffn_impl: str = "xla"

    # GELU flavor: False = exact erf (matches HF/reference numerics), True
    # = tanh approximation (~27% faster encoder forward on TPU — the erf
    # transcendental dominates the VPU; approx differs by ~1e-3 relative).
    gelu_approx: bool = False

    # Unroll factor for the per-stage layer scan (lets XLA fuse across
    # consecutive layers at the cost of compile time / code size).
    scan_unroll: int = 1

    # Serving quantization: "none" (train/predict in cfg.dtype), "int8"
    # (dense kernels as int8 with per-channel scales + dynamic activation
    # quantization — ~2x MXU rate on v5e), or "fp8" (e4m3 kernels +
    # activations — native-rate on fp8-MXU TPUs, v6e+; upcast elsewhere).
    # Inference only; convert a trained checkpoint with
    # `ops.quant.quantize_dense_params(params, kind=...)`.
    quant: str = "none"

    @property
    def num_stages(self) -> int:
        return len(self.depths)

    @property
    def use_cls(self) -> bool:
        # Reference only injects CLS into the decode head when EVERY stage has
        # a CLS token (`modeling_segformer.py:483-484`: None in list -> None).
        return all(c > 0 for c in self.cls_tokens)

    def replace(self, **kw) -> "MiTConfig":
        return dataclasses.replace(self, **kw)


def mit_b0(**kw) -> MiTConfig:
    return MiTConfig(**kw)


def mit_b1(**kw) -> MiTConfig:
    return MiTConfig(
        hidden_sizes=(64, 128, 320, 512), decoder_hidden=256, **kw)


def mit_b2(**kw) -> MiTConfig:
    return MiTConfig(
        hidden_sizes=(64, 128, 320, 512), depths=(3, 4, 6, 3),
        decoder_hidden=768, **kw)


def mit_b3(**kw) -> MiTConfig:
    return MiTConfig(
        hidden_sizes=(64, 128, 320, 512), depths=(3, 4, 18, 3),
        decoder_hidden=768, **kw)


def mit_b4(**kw) -> MiTConfig:
    return MiTConfig(
        hidden_sizes=(64, 128, 320, 512), depths=(3, 8, 27, 3),
        decoder_hidden=768, **kw)


def mit_b5(**kw) -> MiTConfig:
    """MiT-B5, the reference's production encoder (nvidia/mit-b5)."""
    return MiTConfig(
        hidden_sizes=(64, 128, 320, 512), depths=(3, 6, 40, 3),
        decoder_hidden=768, **kw)


MIT_VARIANTS = {
    "b0": mit_b0, "b1": mit_b1, "b2": mit_b2,
    "b3": mit_b3, "b4": mit_b4, "b5": mit_b5,
}


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Tile dataset + augmentation configuration.

    Mirrors the reference `config.py:19-45` semantics with TPU-first handling:
    host decodes tiles to a fixed-size uint8 canvas, the device applies a fused
    random-crop / flip-rot90 / normalize / resize augmentation
    (reference albumentations chain at `config.py:27-38`).
    """

    dataset: Optional[str] = None           # labeled train tiles
    evalset: Optional[str] = None           # labeled eval tiles
    unlabeledset: Optional[str] = None      # unlabeled tiles
    pseudoset: Optional[str] = None         # unlabeled tiles for pseudo-labeling
    labeled_classified: Optional[str] = None    # per-domain labeled dirs
    unlabeled_classified: Optional[str] = None  # per-domain unlabeled dirs
    maskdir: Optional[str] = None           # ground-truth masks

    img_h: int = 512
    img_w: int = 512
    canvas: int = 512        # host-side fixed canvas fed to the device augmenter
    crop: int = 500          # RandomCrop size (reference config.py:28)
    aug_prob: float = 0.75   # OneOf(hflip, vflip, rot90) probability (config.py:33)
    batch_size: int = 20     # reference Linux batch (config.py:39)
    few_shot_batch_size: int = 2
    drop_last: bool = True
    shuffle: bool = True
    # Reference quirk: the albumentations chain (random crop + flips) runs
    # at EVAL time too (`config.py:27-38` is the transform for every loader
    # flag). Off by default because it makes eval metrics stochastic; turn
    # on (CLI --reference-eval-aug) for a full-parity run.
    reference_eval_aug: bool = False
    # "raise" (reference parity: a corrupt tile kills the run) or
    # "substitute" (CLI --skip-bad-tiles: warn once and batch a readable
    # tile in its place — batch shapes stay static for the compiled steps).
    bad_tile_policy: str = "raise"
    # >0 (CLI --cache-tiles MB): LRU-cache decoded canvas tiles in host RAM
    # up to this budget, so epochs after the first skip PNG decode entirely
    # (the reference re-decodes every epoch; decode dominates epoch wall
    # time on weak hosts once the compiled step is fast). ~1 MB per 512²
    # labeled tile.
    cache_mb: float = 0.0

    def replace(self, **kw) -> "DataConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimizer/trainer constants (reference `config.py:11-18`,
    `models/SegFormerModel.py:32-37,161`)."""

    lr: float = 1e-5
    weight_decay: float = 5e-5
    epochs: int = 50
    lr_decay: float = 0.97      # ExponentialLR gamma, stepped per epoch
    adam_b1: float = 0.5
    adam_b2: float = 0.999
    grad_clip_value: float = 1.2

    # Reference behavioral quirks (SURVEY.md §2.4), reproduced when True:
    #  - supervised forward passes run with dropout/drop-path OFF
    #    (`SegFormerModel.py:104-105` calls model.eval() for isEval=False)
    #  - prompt/CLS tokens are excluded from the optimizer
    #    (`SegFormerModel.py:32` builds the optimizer before `add_prompt_token`)
    #  - backward is skipped (zero grads) when the loss is NaN
    #    (`SegFormerModel.py:160`)
    reference_quirks: bool = True

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)


def product_grid(*iterables: Sequence, repeat: int = 1, shuffle: bool = False,
                 seed: int = 0):
    """Cartesian product with optional deterministic shuffle.

    Generalizes the reference grid-search helper (`Utils.py:7-16`), used for
    random-order hyperparameter sweeps
    (`main_segformer/segFormer_semi_teacherstudent_main.py:277-280`).
    """
    import random as _random

    pools = [tuple(pool) for pool in iterables] * repeat
    result = [[]]
    for pool in pools:
        result = [x + [y] for x in result for y in pool]
    if shuffle:
        _random.Random(seed).shuffle(result)
    return [tuple(r) for r in result]
