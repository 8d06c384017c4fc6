"""SegFormer (MiT encoder + all-MLP decode head) rebuilt TPU-first in Flax.

This is a from-scratch reimplementation of the *behavior* of the reference's
modified vendored SegFormer (`segformer_source/models/segformer/
modeling_segformer.py`), including the project's prompt-tuning / domain-CLS
extensions (SURVEY.md §2.3):

1. Prompt tokens are prepended fresh at every layer of a stage and skip the
   spatial sequence-reduction conv inside attention (ref `:186,194-205`).
2. The carried CLS token is prepended at the front of the stream, carried
   across layers *within* a stage (layer i's output CLS feeds layer i+1,
   ref `:444-465`), and the prefix tokens do NOT pass through the MixFFN
   (ref `:352-363`).
3. The decode head projects the sigmoid of the final-stage CLS token and adds
   it to every spatial token of every stage's unified features (ref
   `:711-724,848-850`).

TPU-first design choices (NOT in the reference):
- NHWC layout throughout; convs map directly onto XLA's TPU conv lowering.
- Layers of a stage run under `flax.linen.scan` (single trace per stage,
  stacked params) instead of 40 unrolled Python modules — compile-friendly
  for MiT-B5's depth-40 stage 3.
- bf16 compute / fp32 params via the `dtype` field of `MiTConfig`.
- Prompt/CLS tokens are REAL parameters (the reference's are raw tensors
  invisible to the optimizer — SURVEY.md §2.4); reference-quirk parity is
  obtained by masking them out of the optimizer in the train step.
- Attention is pluggable: plain XLA einsum attention or a fused Pallas kernel
  (`ops/sr_attention.py`).
"""

from __future__ import annotations

import functools
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from semisupervisedobjectdetection_tpu.core.config import MiTConfig

Array = jax.Array

# HF SegformerPreTrainedModel._init_weights uses normal(std=0.02) for Linear.
dense_init = nn.initializers.normal(stddev=0.02)


def uniform01_init(key, shape, dtype=jnp.float32):
    """Mirror of `torch.rand` init used for prompt/CLS tokens
    (`models/SegFormerModel.py:83-99`)."""
    return jax.random.uniform(key, shape, dtype)


def _dtype_of(cfg: MiTConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


def _dense_cls(quant: str):
    """nn.Dense for training; QDense (int8) or F8Dense (fp8 e4m3, for
    fp8-MXU TPUs, v6e+) with dynamic activation quantization —
    ops/quant.py — for the serving paths."""
    if quant == "int8":
        from semisupervisedobjectdetection_tpu.ops.quant import QDense
        return QDense
    if quant == "fp8":
        from semisupervisedobjectdetection_tpu.ops.quant import F8Dense
        return F8Dense
    if quant != "none":
        # fail fast: a typo'd quant would otherwise silently serve f32
        raise ValueError(
            f"MiTConfig.quant must be 'none', 'int8' or 'fp8', "
            f"got {quant!r}")
    return nn.Dense


def drop_path(x: Array, rate: Array, deterministic: bool, rng) -> Array:
    """Per-sample stochastic depth (ref `modeling_segformer.py:85-117`)."""
    if deterministic:
        return x
    keep_prob = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep_prob, shape).astype(x.dtype)
    return x / keep_prob * mask


def upsample_bilinear(x: Array, size: Tuple[int, int]) -> Array:
    """Bilinear NHWC resize with half-pixel centers — matches
    `torch.nn.functional.interpolate(mode='bilinear', align_corners=False)`
    as used throughout the reference (`SegFormerModel.py:117-120`,
    `modeling_segformer.py:770-772`)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size[0], size[1], c), method="bilinear")


class OverlapPatchEmbed(nn.Module):
    """Overlapping patch embedding (ref `modeling_segformer.py:120-142`)."""

    hidden_size: int
    patch_size: int
    stride: int
    eps: float
    dtype: Any

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, int, int]:
        p = self.patch_size // 2
        x = nn.Conv(
            self.hidden_size, (self.patch_size, self.patch_size),
            strides=(self.stride, self.stride), padding=[(p, p), (p, p)],
            dtype=self.dtype, name="proj")(x)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        x = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                         name="layer_norm")(x)
        return x, h, w


def xla_attention(q: Array, k: Array, v: Array, num_heads: int,
                  dropout_rate: float, deterministic: bool,
                  rng) -> Array:
    """Plain multi-head attention via XLA einsums (MXU-friendly shapes).

    q: (B, Nq, C), k/v: (B, Nk, C). Returns (B, Nq, C).
    Matches the reference math (`modeling_segformer.py:207-230`).
    """
    b, nq, c = q.shape
    nk = k.shape[1]
    d = c // num_heads
    q = q.reshape(b, nq, num_heads, d)
    k = k.reshape(b, nk, num_heads, d)
    v = v.reshape(b, nk, num_heads, d)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d).astype(q.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    probs = checkpoint_name(probs, "probs")
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep.astype(probs.dtype) / (1.0 - dropout_rate)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    return ctx.reshape(b, nq, c)


class EfficientSelfAttention(nn.Module):
    """Sequence-reduction self-attention with prompt-token-aware reduction.

    The first `n_prefix` tokens (CLS + prompt) are split off before the
    strided reduction conv and re-concatenated in front of the reduced
    spatial tokens, so they attend and are attended-to at full fidelity
    (ref `modeling_segformer.py:186-205`).
    """

    hidden_size: int
    num_heads: int
    sr_ratio: int
    attention_dropout: float
    hidden_dropout: float
    eps: float
    dtype: Any
    attn_impl: str = "xla"
    quant: str = "none"

    @nn.compact
    def __call__(self, x: Array, h: int, w: int, n_prefix: int,
                 deterministic: bool) -> Array:
        b, n, c = x.shape
        Dense = _dense_cls(self.quant)
        q = checkpoint_name(
            Dense(self.hidden_size, dtype=self.dtype,
                  kernel_init=dense_init, name="query")(x), "q")
        kv_in = x
        if self.sr_ratio > 1:
            prefix = x[:, :n_prefix, :]
            spatial = x[:, n_prefix:, :].reshape(b, h, w, c)
            spatial = nn.Conv(
                c, (self.sr_ratio, self.sr_ratio),
                strides=(self.sr_ratio, self.sr_ratio), padding="VALID",
                dtype=self.dtype, name="sr")(spatial)
            spatial = spatial.reshape(b, -1, c)
            if n_prefix > 0:
                kv_in = jnp.concatenate([prefix, spatial], axis=1)
            else:
                kv_in = spatial
            kv_in = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                                 name="sr_norm")(kv_in)
        kv_in = checkpoint_name(kv_in, "kv_in")
        k = checkpoint_name(
            Dense(self.hidden_size, dtype=self.dtype,
                  kernel_init=dense_init, name="key")(kv_in), "k")
        v = checkpoint_name(
            Dense(self.hidden_size, dtype=self.dtype,
                  kernel_init=dense_init, name="value")(kv_in), "v")

        rng = None
        if self.attention_dropout > 0.0 and not deterministic:
            rng = self.make_rng("dropout")
        impl = self.attn_impl
        if impl == "auto":
            # Pallas wins when the query stream is long (stages 1-2 of a
            # 512x512 input); XLA's fused attention is faster on the small
            # late-stage shapes. Dropout requires the XLA path.
            long_q = q.shape[1] >= 4096
            impl = "pallas" if (long_q and rng is None) else "xla"
        if impl == "pallas":
            from semisupervisedobjectdetection_tpu.ops.sr_attention import (
                sr_attention,
            )
            ctx = sr_attention(q, k, v, self.num_heads)
        else:
            ctx = xla_attention(q, k, v, self.num_heads,
                                self.attention_dropout, deterministic, rng)
        ctx = checkpoint_name(ctx, "ctx")
        # SelfOutput projection (ref `modeling_segformer.py:233-242`).
        out = Dense(self.hidden_size, dtype=self.dtype,
                    kernel_init=dense_init, name="out")(ctx)
        out = nn.Dropout(self.hidden_dropout, deterministic=deterministic)(out)
        return out


class _FFNParams(nn.Module):
    """Param holder matching nn.Dense/nn.Conv pytrees ({kernel, bias}) for
    the collective-FFN path, so checkpoints are interchangeable with the
    unfused chain."""

    spec: Tuple   # (kernel_shape, kernel_init)

    @nn.compact
    def __call__(self):
        shape, init = self.spec
        kernel = self.param("kernel", init, shape)
        bias = self.param("bias", nn.initializers.zeros, (shape[-1],))
        return kernel, bias


class MixFFN(nn.Module):
    """Mix-FFN: dense -> 3x3 depthwise conv -> GELU -> dense
    (ref `modeling_segformer.py:283-317`)."""

    hidden_size: int
    mlp_hidden: int
    hidden_dropout: float
    dtype: Any
    gelu_approx: bool = False
    quant: str = "none"
    ffn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: Array, h: int, w: int,
                 deterministic: bool) -> Array:
        b, n, c = x.shape
        # Explicit ring collective-matmul MixFFN (parallel/collective.py):
        # ring-overlapped AG-matmul (dense1) -> local depthwise conv +
        # GELU on the hidden shard -> row-parallel dense2 closed by one
        # psum, over the ambient mesh's tp axis. Activation boundaries
        # stay replicated (see `_mixffn_local_ar` for why that is a
        # correctness requirement, not a style choice). Static guards —
        # resolved at trace time — fall back to the XLA chain when no tp
        # mesh is in scope or the shapes don't divide it, so a
        # ffn_impl="collective" config still runs single-chip.
        if self.ffn_impl == "collective" and self.quant == "none":
            from semisupervisedobjectdetection_tpu.parallel.collective import (
                context_tp_size,
                mixffn_collective_ctx,
            )
            tp = context_tp_size()
            if tp > 1 and n % tp == 0 and self.mlp_hidden % tp == 0:
                if self.hidden_dropout > 0.0 and not deterministic:
                    raise ValueError(
                        "ffn_impl='collective' requires inactive hidden "
                        "dropout (the reference trains with 0.0)")
                m = self.mlp_hidden
                w1, b1 = _FFNParams(((c, m), dense_init), name="dense1")()
                kd, bk = _FFNParams(((3, 3, 1, m),
                                     nn.initializers.lecun_normal()),
                                    name="dwconv")()
                w2, b2 = _FFNParams(((m, self.hidden_size), dense_init),
                                    name="dense2")()
                dt = self.dtype
                return mixffn_collective_ctx(
                    x, w1.astype(dt), b1.astype(dt), kd.astype(dt),
                    bk.astype(dt), w2.astype(dt), b2.astype(dt),
                    h, w, self.gelu_approx).astype(dt)
        # NOTE (round 5): the whole-FFN fused Pallas kernel
        # (ops/fused_ffn.py) and the token-layout Pallas dwconv
        # (ops/dwconv.py) were DELETED after two rounds of measurement:
        # the fused step was a wash (184.97 vs 183.98 ms) with a standing
        # Mosaic compile-service wedge hazard, and XLA's native-MXU conv
        # beat the VPU shift-MAC kernel everywhere (CLAUDE.md round-2
        # perf notes record the numbers). TPU convs belong on the MXU —
        # the XLA chain below IS the fast path.
        Dense = _dense_cls(self.quant)
        x = Dense(self.mlp_hidden, dtype=self.dtype,
                  kernel_init=dense_init, name="dense1")(x)
        x = checkpoint_name(x, "ffn1")
        x = x.reshape(b, h, w, self.mlp_hidden)
        x = nn.Conv(self.mlp_hidden, (3, 3), padding=[(1, 1), (1, 1)],
                    feature_group_count=self.mlp_hidden,
                    dtype=self.dtype, name="dwconv")(x)
        x = x.reshape(b, h * w, self.mlp_hidden)
        x = checkpoint_name(x, "dwconv")
        x = nn.gelu(x, approximate=self.gelu_approx)
        x = checkpoint_name(x, "gelu")
        x = nn.Dropout(self.hidden_dropout, deterministic=deterministic)(x)
        x = Dense(self.hidden_size, dtype=self.dtype,
                  kernel_init=dense_init, name="dense2")(x)
        x = nn.Dropout(self.hidden_dropout, deterministic=deterministic)(x)
        return x


class Block(nn.Module):
    """One SegFormer layer, written as a `nn.scan` body.

    Carry: (spatial NHWC feature map, carried CLS token or None).
    Scanned inputs: (drop-path rate scalar, per-layer prompt tokens or None,
    shared prompt tokens or None).

    Semantics follow ref `modeling_segformer.py:337-365`: pre-LN attention on
    the full [cls, prompt, spatial] stream, residual on the full stream, then
    the prefix is sliced off (becoming the carried CLS source) and only the
    spatial tokens pass through the MixFFN.
    """

    hidden_size: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: float
    attention_dropout: float
    hidden_dropout: float
    eps: float
    dtype: Any
    deterministic: bool
    attn_impl: str = "xla"
    gelu_approx: bool = False
    quant: str = "none"
    ffn_impl: str = "xla"

    @nn.compact
    def __call__(self, carry, per_layer):
        spatial, carried_cls = carry
        dpr, prompt_layer, prompt_shared = per_layer
        b, h, w, c = spatial.shape
        tokens = spatial.reshape(b, h * w, c)

        n_prefix = 0
        stream = tokens
        prompt = prompt_layer if prompt_layer is not None else prompt_shared
        if prompt is not None:
            t = prompt.shape[-2]
            pt = jnp.broadcast_to(prompt.astype(stream.dtype)[None],
                                  (b, t, c))
            stream = jnp.concatenate([pt, stream], axis=1)
            n_prefix += t
        if carried_cls is not None:
            stream = jnp.concatenate(
                [carried_cls.astype(stream.dtype), stream], axis=1)
            n_prefix += carried_cls.shape[1]

        attn_out = EfficientSelfAttention(
            self.hidden_size, self.num_heads, self.sr_ratio,
            self.attention_dropout, self.hidden_dropout, self.eps,
            self.dtype, self.attn_impl, self.quant, name="attention")(
                checkpoint_name(
                    nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                                 name="layer_norm_1")(stream), "ln1"),
                h, w, n_prefix, self.deterministic)
        rng = None if self.deterministic else self.make_rng("droppath")
        attn_out = drop_path(attn_out, dpr, self.deterministic, rng)
        stream = stream + attn_out

        prefix = stream[:, :n_prefix, :]
        tokens = stream[:, n_prefix:, :]

        mlp_out = MixFFN(self.hidden_size, int(self.hidden_size *
                                               self.mlp_ratio),
                         self.hidden_dropout, self.dtype,
                         self.gelu_approx, self.quant,
                         self.ffn_impl, name="mlp")(
            checkpoint_name(
                nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                             name="layer_norm_2")(tokens), "ln2"),
            h, w, self.deterministic)
        rng = None if self.deterministic else self.make_rng("droppath")
        mlp_out = drop_path(mlp_out, dpr, self.deterministic, rng)
        tokens = tokens + mlp_out

        new_spatial = tokens.reshape(b, h, w, c)
        # Only the FIRST prefix token is carried across layers
        # (ref `modeling_segformer.py:461-463`).
        new_carried = prefix[:, :1, :] if carried_cls is not None else None
        return (new_spatial, new_carried), None


def _remat_block(remat_spec: str, stage: int):
    """Resolve `MiTConfig.remat` into the (possibly remat-wrapped) Block class
    for one encoder stage.

    `remat_spec` is either one policy for all stages or a comma-separated
    per-stage list. Each policy is one of:
      - "none": no rematerialization (all activations saved)
      - "full": save nothing; backward re-runs the layer forward
      - "dots": `dots_with_no_batch_dims_saveable`
      - "save:a+b+c": save only the named checkpoints (names annotated via
        `checkpoint_name` in the layer: ln1 q kv_in k v ctx ln2 ffn1 dwconv
        gelu) — selective remat trading HBM for backward recompute.
    """
    specs = remat_spec.split(",")
    if len(specs) > 1 and stage >= len(specs):
        raise ValueError(
            f"MiTConfig.remat per-stage list {remat_spec!r} has "
            f"{len(specs)} entries but the model has more stages (needs "
            f"index {stage}); give one policy or one per stage")
    spec = specs[stage] if len(specs) > 1 else specs[0]
    if spec == "none":
        return Block
    if spec == "full":
        return nn.remat(Block, prevent_cse=False)
    if spec == "dots":
        return nn.remat(
            Block, prevent_cse=False,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    if spec.startswith("save:"):
        names = tuple(spec[len("save:"):].split("+"))
        return nn.remat(
            Block, prevent_cse=False,
            policy=jax.checkpoint_policies.save_only_these_names(*names))
    raise ValueError(f"unknown remat spec {spec!r}")


def _stage_body(mdl: nn.Module, cfg: MiTConfig, i: int, x: Array,
                deterministic: bool) -> Tuple[Array, Optional[Array]]:
    """One encoder stage (patch embed -> scanned blocks -> LayerNorm),
    executed inside the caller's compact scope — shared by `MiTEncoder`
    (all stages, one scope) and `EncoderStage` (pipeline parallelism:
    one stage per device, same param names so the pytrees slice apart)."""
    dtype = _dtype_of(cfg)
    total_depth = sum(cfg.depths)
    dprs = np.linspace(0.0, cfg.drop_path_rate, total_depth)
    cur = sum(cfg.depths[:i])
    b = x.shape[0]

    c = cfg.hidden_sizes[i]
    tokens, h, w = OverlapPatchEmbed(
        c, cfg.patch_sizes[i], cfg.strides[i], cfg.layer_norm_eps,
        dtype, name=f"patch_embed_{i}")(x.astype(dtype))
    depth = cfg.depths[i]

    prompt_shared = prompt_per_layer = None
    t = cfg.prompt_tokens[i]
    if t > 0:
        if cfg.prompt_per_layer:
            prompt_per_layer = mdl.param(
                f"prompt_tokens_{i}", uniform01_init, (depth, t, c))
        else:
            prompt_shared = mdl.param(
                f"prompt_tokens_{i}", uniform01_init, (t, c))

    carried = None
    if cfg.cls_tokens[i] > 0:
        if cfg.cls_tokens[i] != 1:
            raise NotImplementedError(
                "cls_tokens per stage must be 0 or 1; the reference "
                "only ever carries a single CLS token "
                "(modeling_segformer.py:461-463)")
        cls_param = mdl.param(f"cls_token_{i}", uniform01_init, (1, c))
        carried = jnp.broadcast_to(
            cls_param.astype(dtype)[None], (b, 1, c))

    stage_dprs = jnp.asarray(dprs[cur:cur + depth], dtype=dtype)

    block_cls = _remat_block(cfg.remat, i)
    ScannedBlock = nn.scan(
        block_cls,
        variable_axes={"params": 0},
        split_rngs={"params": True, "dropout": True, "droppath": True},
        in_axes=((0, 0, nn.broadcast),),
        length=depth,
        unroll=min(cfg.scan_unroll, depth),
    )
    (spatial, carried), _ = ScannedBlock(
        c, cfg.num_heads[i], cfg.sr_ratios[i], cfg.mlp_ratio,
        cfg.attention_dropout, cfg.hidden_dropout,
        cfg.layer_norm_eps, dtype, deterministic,
        cfg.attn_impl, cfg.gelu_approx,
        cfg.quant, cfg.ffn_impl, name=f"block_{i}")(
            (tokens.reshape(b, h, w, c), carried),
            (stage_dprs, prompt_per_layer, prompt_shared))

    tokens = spatial.reshape(b, h * w, c)
    tokens = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                          name=f"layer_norm_{i}")(tokens)
    return tokens.reshape(b, h, w, c), carried


class MiTEncoder(nn.Module):
    """Hierarchical Mix-Transformer encoder (ref `modeling_segformer.py:
    366-487`), stages scanned over their layers."""

    cfg: MiTConfig
    deterministic: bool = True

    @nn.compact
    def __call__(self, pixel_values: Array
                 ) -> Tuple[List[Array], List[Optional[Array]]]:
        x = pixel_values
        hidden_states: List[Array] = []
        cls_out: List[Optional[Array]] = []
        for i in range(self.cfg.num_stages):
            x, carried = _stage_body(self, self.cfg, i, x,
                                     self.deterministic)
            hidden_states.append(x)
            cls_out.append(carried)
        return hidden_states, cls_out


class EncoderStage(nn.Module):
    """A single encoder stage as a standalone module whose param names
    match the slice of `MiTEncoder`'s tree for that stage — apply it with
    {k: encoder_params[k] for k ending in _i} (used by
    `parallel/pipeline.py` to place one stage per device)."""

    cfg: MiTConfig
    stage: int
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Optional[Array]]:
        return _stage_body(self, self.cfg, self.stage, x,
                           self.deterministic)


class FuseKernel(nn.Module):
    """Holds the linear_fuse 1x1-conv kernel in the reference's layout
    ({kernel: (1, 1, in, out)}) while exposing row slices so the fuse can
    run per-stage at native resolution (see DecodeHead.__call__)."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self, row_start: int, rows: int, dtype) -> Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, self.in_features, self.out_features))
        return kernel[0, 0, row_start:row_start + rows, :].astype(dtype)


class DecodeHead(nn.Module):
    """All-MLP decode head with optional CLS-token injection
    (ref `modeling_segformer.py:706-784`)."""

    cfg: MiTConfig
    deterministic: bool = True
    train_bn: bool = False

    @nn.compact
    def __call__(self, hidden_states: Sequence[Array],
                 cls_final: Optional[Array]) -> Array:
        cfg = self.cfg
        dtype = _dtype_of(cfg)
        d = cfg.decoder_hidden
        n = len(hidden_states)
        target = hidden_states[0].shape[1:3]

        # The reference computes linear_fuse(concat(upsample(f_i)[::-1]))
        # (ref `modeling_segformer.py:757-776`). A 1x1 conv distributes over
        # concat and commutes with bilinear upsampling (both are linear and
        # the conv mixes channels per-pixel), so each stage's fuse slice is
        # applied AT ITS NATIVE RESOLUTION and the upsampled results are
        # summed — mathematically identical with ~6x fewer fuse FLOPs (the
        # conv runs on the 16x16..128x128 grids instead of four
        # full-resolution 768-channel maps). The kernel is stored in the
        # reference's conv layout {kernel: (1, 1, n*d, d)} so HF import and
        # checkpoints are unchanged; stage i reads rows
        # [(n-1-i)*d : (n-i)*d] (reversed concat order, ref `:776`).
        fuse = FuseKernel(d * n, d, name="linear_fuse")
        Dense = _dense_cls(cfg.quant)

        acc = None
        for i, hs in enumerate(hidden_states):
            b, h, w, c = hs.shape
            x = Dense(d, dtype=dtype, kernel_init=dense_init,
                      name=f"linear_c_{i}")(hs.reshape(b, h * w, c))
            if cls_final is not None:
                # cls_proj: Linear(last_hidden -> decoder_hidden), added to
                # every spatial token (ref `modeling_segformer.py:717-724`).
                cls_states = Dense(d, dtype=dtype, kernel_init=dense_init,
                                   name=f"cls_proj_{i}")(
                    cls_final.astype(dtype))
                x = x + cls_states  # (B,1,D) broadcasts over tokens
            w_slice = fuse((n - 1 - i) * d, d, dtype)
            x = jnp.dot(x, w_slice,
                        preferred_element_type=jnp.float32).astype(dtype)
            x = x.reshape(b, h, w, d)
            if (h, w) != tuple(target):
                x = upsample_bilinear(x, tuple(target))
            acc = x if acc is None else acc + x
        x = acc
        x = nn.BatchNorm(use_running_average=not self.train_bn,
                         momentum=0.9, epsilon=1e-5, dtype=dtype,
                         name="batch_norm")(x)
        x = nn.relu(x)
        x = nn.Dropout(cfg.classifier_dropout,
                       deterministic=self.deterministic)(x)
        logits = nn.Conv(cfg.num_labels, (1, 1), dtype=dtype,
                         name="classifier")(x)
        return logits


class SegFormer(nn.Module):
    """SegFormer for semantic segmentation, NHWC in / NHWC logits out.

    `__call__(pixel_values)` returns `(logits, cls_list)` where logits have
    shape (B, H/4, W/4, num_labels) — mirroring the reference 2-tuple return
    (ref `modeling_segformer.py:877-882`) with the per-stage carried CLS
    tokens (each (B, 1, C_i) or None).
    """

    cfg: MiTConfig
    deterministic: bool = True
    train_bn: bool = False

    @nn.compact
    def __call__(self, pixel_values: Array
                 ) -> Tuple[Array, List[Optional[Array]]]:
        hidden_states, cls_list = MiTEncoder(
            self.cfg, self.deterministic, name="encoder")(pixel_values)
        cls_final = None
        if self.cfg.use_cls:
            # Sigmoid of the final stage's carried CLS
            # (ref `modeling_segformer.py:848-850`).
            cls_final = jax.nn.sigmoid(
                cls_list[-1].astype(jnp.float32))
        logits = DecodeHead(self.cfg, self.deterministic, self.train_bn,
                            name="decode_head")(hidden_states, cls_final)
        return logits.astype(jnp.float32), cls_list


def predict_masks(logits: Array, out_hw: Tuple[int, int]) -> Array:
    """Upsample logits to image size and apply sigmoid
    (ref `SegFormerModel.predict` — `models/SegFormerModel.py:117-125`).

    logits: (B, h, w, L) NHWC -> (B, H, W) when L == 1 else (B, H, W, L).
    """
    up = upsample_bilinear(logits, out_hw)
    masks = jax.nn.sigmoid(up.astype(jnp.float32))
    if masks.shape[-1] == 1:
        masks = masks[..., 0]
    return masks
