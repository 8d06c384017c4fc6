"""Inference pipeline parallelism: one encoder stage per device.

The four MiT stages + decode head are placed round-robin across devices
(each holding only its stage's params) and microbatches are streamed
through: JAX's async dispatch naturally overlaps microbatch k's stage j
with microbatch k+1's stage j-1 on a different device, giving GPipe-style
wavefront execution without hand-written schedules — device-to-device
transfers are issued asynchronously between stage calls.

This targets serving very large models / small-memory devices; for the
82M-param MiT-B5, data parallelism remains the training strategy (see
parallel/mesh.py). Expert parallelism is n/a — the architecture has no
MoE layers. The reference is single-GPU; this is a TPU scaling addition.

Numerics match the single-device forward exactly (same modules, same
params — `EncoderStage` shares `MiTEncoder`'s stage body and param
names); tests/test_pipeline.py checks masks to 1e-5 and verifies each
device holds only its own stage's parameters.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from semisupervisedobjectdetection_tpu.core.config import MiTConfig
from semisupervisedobjectdetection_tpu.models.segformer import (
    DecodeHead,
    EncoderStage,
    predict_masks,
)

Array = jax.Array


def _stage_params(encoder_params: dict, i: int) -> dict:
    suffix = f"_{i}"
    return {k: v for k, v in encoder_params.items() if k.endswith(suffix)}


class PipelinedSegFormer:
    """Stage-per-device pipelined SegFormer inference.

    variables: the ordinary single-model variables dict; params are
    re-placed so device d holds only stage d's weights (round-robin when
    fewer devices than stages; the decode head lives on the last device).
    """

    def __init__(self, cfg: MiTConfig, variables: dict,
                 devices: Optional[Sequence[jax.Device]] = None):
        self.cfg = cfg
        devices = list(devices if devices is not None else jax.devices())
        n = cfg.num_stages
        self.stage_devices = [devices[i % len(devices)] for i in range(n)]
        self.head_device = devices[(n - 1) % len(devices)]

        enc = variables["params"]["encoder"]
        self.stage_params = [
            jax.device_put(_stage_params(enc, i), self.stage_devices[i])
            for i in range(n)
        ]
        head_vars = {"params": variables["params"]["decode_head"]}
        stats = variables.get("batch_stats", {})
        if stats:
            # Fail fast on a malformed variables dict rather than passing
            # the whole model batch_stats tree as the head's stats (which
            # would only surface later as a confusing flax scope error).
            head_vars["batch_stats"] = stats["decode_head"]
        self.head_vars = jax.device_put(head_vars, self.head_device)

        self._stage_fns = [
            jax.jit(lambda p, x, i=i: EncoderStage(cfg, i).apply(
                {"params": p}, x))
            for i in range(n)
        ]

        def head(v, feats, cls_final, out_hw):
            logits = DecodeHead(cfg).apply(v, feats, cls_final)
            return predict_masks(logits, out_hw)

        self._head_fn = jax.jit(head, static_argnames=("out_hw",))

    def _forward_micro(self, images: Array) -> Array:
        feats: List[Array] = []
        cls_list = []
        x = jax.device_put(images, self.stage_devices[0])
        for i in range(self.cfg.num_stages):
            if i > 0:
                x = jax.device_put(x, self.stage_devices[i])
            x, carried = self._stage_fns[i](self.stage_params[i], x)
            feats.append(jax.device_put(x, self.head_device))
            cls_list.append(carried)
        cls_final = None
        if self.cfg.use_cls:
            cls_final = jax.nn.sigmoid(
                jax.device_put(cls_list[-1],
                               self.head_device).astype(jnp.float32))
        return self._head_fn(self.head_vars, feats, cls_final,
                             tuple(images.shape[1:3]))

    def predict(self, images: Array, micro_batch: int = 0) -> Array:
        """Sigmoid masks at input resolution; `micro_batch` > 0 streams
        the batch through the pipeline in chunks (async dispatch overlaps
        consecutive microbatches across stage devices)."""
        images = jnp.asarray(images)
        if micro_batch <= 0 or images.shape[0] <= micro_batch:
            return self._forward_micro(images)
        outs = [self._forward_micro(images[s:s + micro_batch])
                for s in range(0, images.shape[0], micro_batch)]
        return jnp.concatenate(outs, axis=0)
