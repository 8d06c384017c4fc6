"""Pipeline-parallel TRAINING: one encoder stage (+ the decode head) per
device, GPipe-style microbatch schedule, recompute-in-backward.

Extends `parallel/pipeline.py`'s inference placement to the supervised
training step: device d holds ONLY stage d's parameters AND optimizer
state (Adam moments), so model memory scales down with the pipeline
degree — the actual value proposition of pipeline parallelism. Activation
memory is bounded by keeping only each stage's microbatch INPUT alive
between the forward and backward wavefronts; stage internals are
recomputed inside the backward VJP (the same full-remat policy the
single-device step ships with).

Schedule: the host streams `micro` microbatches forward (JAX async
dispatch overlaps microbatch k's stage j with microbatch k+1's stage j-1
— a GPipe fill), then drives the backward wavefront in reverse; gradient
contributions accumulate on each stage's own device and ONE optimizer
update per stage applies the microbatch-mean gradient. The update is
therefore numerically the single-device `train/supervised.py::
train_step(accum=micro)` update (asserted by tests/test_pipeline_train.py
— dice is batch-nonlinear, so microbatched training means mean-of-
microbatch grads on both sides).

Like the inference pipeline this is host-orchestrated rather than a
shard_map program: MiT stages are architecturally heterogeneous
(widths 64..512, depths 3..40 at B5), so an SPMD formulation would need
shape padding to a common stage signature; per-stage executables with
async dispatch express the wavefront naturally and keep every tensor at
its native shape. Cross-device hops ride ICI via `jax.device_put`
between stage calls.

Reference: single-GPU, no parallelism of any kind (SURVEY.md §5); this
is a TPU scaling addition. Forward passes run in eval mode — which IS
the reference's supervised-training quirk (`SegFormerModel.py:104-105`),
so no dropout rng or BN-stats threading crosses stage boundaries.
CLS-token configs are not supported (the carried-CLS edge from the last
stage into the decode head would add a second backward path; use the
data-parallel step for domain-prompting workloads).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from semisupervisedobjectdetection_tpu.core.config import (
    MiTConfig,
    TrainConfig,
)
from semisupervisedobjectdetection_tpu import losses
from semisupervisedobjectdetection_tpu.models.segformer import (
    DecodeHead,
    EncoderStage,
    predict_masks,
)
from semisupervisedobjectdetection_tpu.parallel.pipeline import (
    _stage_params,
)
from semisupervisedobjectdetection_tpu.train.state import TrainState

Array = jax.Array


class PipelinedTrainer:
    """Stage-per-device supervised training (dice/BCE/MSE loss).

    variables: the ordinary single-model variables dict. Each stage's
    params become their own `TrainState` (optimizer chain identical to
    the single-device step) placed on that stage's device; the decode
    head (with its BN stats) lives on the last device.
    """

    def __init__(self, cfg: MiTConfig, variables: dict, tc: TrainConfig,
                 devices: Optional[Sequence[jax.Device]] = None,
                 loss_type: str = "dice"):
        if cfg.use_cls:
            raise NotImplementedError(
                "CLS-token configs: the carried-CLS edge into the decode "
                "head is not wired through the pipeline backward; use the "
                "data-parallel step")
        self.cfg = cfg
        self.loss_type = loss_type
        devices = list(devices if devices is not None else jax.devices())
        n = cfg.num_stages
        self.stage_devices = [devices[i % len(devices)] for i in range(n)]
        self.head_device = devices[n % len(devices)]

        enc = variables["params"]["encoder"]
        self.stage_states: List[TrainState] = [
            jax.device_put(
                TrainState.create({"params": _stage_params(enc, i)}, tc),
                self.stage_devices[i])
            for i in range(n)
        ]
        head_vars = {"params": variables["params"]["decode_head"]}
        stats = variables.get("batch_stats", {})
        if stats:
            head_vars["batch_stats"] = stats["decode_head"]
        self.head_state = jax.device_put(
            TrainState.create(head_vars, tc), self.head_device)

        def stage_fwd(p, x, i):
            return EncoderStage(cfg, i).apply({"params": p}, x)

        self._stage_fwd = [
            jax.jit(lambda p, x, i=i: stage_fwd(p, x, i))
            for i in range(n)
        ]

        def stage_bwd(p, x, gy, gcls, i):
            # recompute-in-backward: the VJP recomputes the stage forward
            # from its input, so no internal activations persist between
            # the wavefronts (the single-device step's remat policy)
            _, vjp_fn = jax.vjp(lambda pp, xx: stage_fwd(pp, xx, i), p, x)
            gp, gx = vjp_fn((gy, gcls))
            return gp, gx

        self._stage_bwd = [
            jax.jit(lambda p, x, gy, gcls, i=i: stage_bwd(p, x, gy, gcls, i))
            for i in range(n)
        ]

        def head_loss(params, feats, stats, masks):
            v = {"params": params}
            if stats:
                v["batch_stats"] = stats
            logits = DecodeHead(cfg).apply(v, list(feats), None)
            pred = predict_masks(logits, masks.shape[1:3])
            return losses.segmentation_loss(pred, masks, self.loss_type)

        self._head_grad = jax.jit(
            jax.value_and_grad(head_loss, argnums=(0, 1)))

    # ----------------------------------------------------------- helpers
    def merged_params(self) -> dict:
        """Reassemble the single-model params tree (host-side; tests and
        checkpointing)."""
        enc = {}
        for st in self.stage_states:
            enc.update(jax.device_get(st.params))
        return {"encoder": enc,
                "decode_head": jax.device_get(self.head_state.params)}

    def _forward_micro(self, images: Array):
        """One microbatch forward wavefront. Returns (stage_inputs, feats):
        stage_inputs[i] stays on stage i's device (the backward recompute
        anchor); feats collect on the head device."""
        xs, feats = [], []
        x = jax.device_put(images, self.stage_devices[0])
        for i in range(self.cfg.num_stages):
            if i > 0:
                x = jax.device_put(x, self.stage_devices[i])
            xs.append(x)
            x, _ = self._stage_fwd[i](self.stage_states[i].params, x)
            feats.append(jax.device_put(x, self.head_device))
        return xs, feats

    # -------------------------------------------------------------- step
    def step(self, images: Array, masks: Array, micro: int = 1
             ) -> float:
        """One optimizer update from `micro` pipelined microbatches.
        Numerically equals `train_step(..., accum=micro)`. Returns the
        mean loss (host float; the per-step sync is the caller's epoch
        cadence concern, as in the CLIs)."""
        images = jnp.asarray(images)
        masks = jnp.asarray(masks)
        b = images.shape[0]
        if b % micro:
            raise ValueError(f"batch {b} not divisible by micro={micro}")
        mb = b // micro
        n = self.cfg.num_stages

        stage_gsums = [None] * n
        head_gsum = None
        loss_sum = None

        # GPipe: fill the pipeline with all microbatch forwards (async
        # dispatch overlaps stages across devices), keeping only the
        # per-stage inputs, then drain with the backward wavefront.
        fwd = [self._forward_micro(images[s * mb:(s + 1) * mb])
               for s in range(micro)]

        for s in range(micro):
            xs, feats = fwd[s]
            m = jax.device_put(masks[s * mb:(s + 1) * mb],
                               self.head_device)
            loss, (g_head, g_feats) = self._head_grad(
                self.head_state.params, tuple(feats),
                self.head_state.batch_stats, m)
            loss_sum = loss if loss_sum is None else loss_sum + loss
            head_gsum = (g_head if head_gsum is None else
                         jax.tree.map(jnp.add, head_gsum, g_head))

            gx_next = None
            for i in reversed(range(n)):
                gy = jax.device_put(g_feats[i], self.stage_devices[i])
                if gx_next is not None:
                    gy = gy + jax.device_put(gx_next, self.stage_devices[i])
                gp, gx_next = self._stage_bwd[i](
                    self.stage_states[i].params, xs[i], gy, None)
                stage_gsums[i] = (gp if stage_gsums[i] is None else
                                  jax.tree.map(jnp.add, stage_gsums[i], gp))

        mean_loss = loss_sum / micro
        for i in range(n):
            grads = jax.tree.map(lambda g: g / micro, stage_gsums[i])
            self.stage_states[i] = self.stage_states[i].apply_gradients(
                grads, jax.device_put(mean_loss, self.stage_devices[i]))
        head_grads = jax.tree.map(lambda g: g / micro, head_gsum)
        self.head_state = self.head_state.apply_gradients(
            head_grads, mean_loss)
        return float(mean_loss)

    def scheduler_step(self) -> None:
        self.stage_states = [st.scheduler_step()
                             for st in self.stage_states]
        self.head_state = self.head_state.scheduler_step()
