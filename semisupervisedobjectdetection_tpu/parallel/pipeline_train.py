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

`DataParallelPipelinedTrainer` composes this with data parallelism
(dp x pp): the device list splits into dp replica groups, each replica
runs the wavefronts on a batch shard with mirrored params, gradient sums
reduce onto the owning group's devices, and one optimizer update equals
`train_step(accum=dp*micro)`.

Reference: single-GPU, no parallelism of any kind (SURVEY.md §5); this
is a TPU scaling addition. Forward passes run in eval mode — which IS
the reference's supervised-training quirk (`SegFormerModel.py:104-105`),
so no dropout rng or BN-stats threading crosses stage boundaries.
CLS-token (domain-prompting) configs ARE supported: the CLS never
crosses a stage boundary (each stage prepends its own cls_token param,
ref `modeling_segformer.py:455-465`), so the only extra pipeline edge is
the final stage's carried CLS into the decode head's sigmoid+cls_proj
injection (`:848-850,711-724`) — its cotangent returns on the same hop,
and earlier stages take a zero CLS-output cotangent (their cls params
still get real gradients through the token stream).
"""

from __future__ import annotations

import functools
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


# The jitted stage/head callables are module-level and memoized on
# (cfg, stage) so rebuilding a trainer — e.g. `--tune-lr` constructing one
# per grid point — reuses the compiled executables instead of re-tracing
# 2*num_stages+1 programs per instance (~200s per B5 compile on TPU; the
# same rationale as train/state.py's optax-transform memoization).
@functools.lru_cache(maxsize=None)
def _fwd_jit(cfg: MiTConfig, i: int):
    return jax.jit(
        lambda p, x: EncoderStage(cfg, i).apply({"params": p}, x))


@functools.lru_cache(maxsize=None)
def _bwd_jit(cfg: MiTConfig, i: int):
    def bwd(p, x, gy, gcls):
        # recompute-in-backward: the VJP recomputes the stage forward
        # from its input, so no internal activations persist between
        # the wavefronts (the single-device step's remat policy)
        _, vjp_fn = jax.vjp(
            lambda pp, xx: EncoderStage(cfg, i).apply({"params": pp}, xx),
            p, x)
        return vjp_fn((gy, gcls))

    return jax.jit(bwd)


@functools.lru_cache(maxsize=None)
def _head_grad_jit(cfg: MiTConfig, loss_type: str, has_stats: bool):
    if cfg.use_cls:
        # CLS-injection head: the final stage's raw carried CLS enters
        # through sigmoid (ref `modeling_segformer.py:848-850`) and its
        # cotangent (argnums 2) flows back into the last stage's backward.
        def head_loss_cls(params, feats, cls_raw, stats, masks):
            v = {"params": params}
            if has_stats:
                v["batch_stats"] = stats
            cls_final = jax.nn.sigmoid(cls_raw.astype(jnp.float32))
            logits = DecodeHead(cfg).apply(v, list(feats), cls_final)
            pred = predict_masks(logits, masks.shape[1:3])
            return losses.segmentation_loss(pred, masks, loss_type)

        return jax.jit(jax.value_and_grad(head_loss_cls,
                                          argnums=(0, 1, 2)))

    def head_loss(params, feats, stats, masks):
        v = {"params": params}
        if has_stats:
            v["batch_stats"] = stats
        logits = DecodeHead(cfg).apply(v, list(feats), None)
        pred = predict_masks(logits, masks.shape[1:3])
        return losses.segmentation_loss(pred, masks, loss_type)

    return jax.jit(jax.value_and_grad(head_loss, argnums=(0, 1)))


def _nontrivial(mask):
    """None if the mask pytree is absent or all-True (keeps the optax
    transform cache key shared across stages with nothing frozen)."""
    if mask is None:
        return None
    leaves = jax.tree.leaves(mask)
    if all(bool(m) for m in leaves):
        return None
    return mask


def _drain_backward(stage_bwd, stage_devices, stage_params, xs, g_feats,
                    stage_gsums, g_cls=None):
    """One microbatch's backward wavefront: walk the stages in reverse,
    summing each stage's head-side feature cotangent with the downstream
    stage's input cotangent, and accumulate parameter gradients into
    `stage_gsums` (mutated in place; None entries start fresh). Shared by
    the supervised (`PipelinedTrainer`) and EMA (`pipeline_ema`) trainers
    so the cotangent summing / device-hop order lives in ONE place.

    `g_cls`: per-stage cotangents for the stages' carried-CLS outputs
    (None when the config carries no CLS). The CLS never crosses a stage
    boundary — each stage prepends its OWN cls_token param and only the
    final stage's CLS feeds the decode head (ref
    `modeling_segformer.py:455-465,848-850`) — so only the last entry is
    nonzero; earlier stages get a zeros cotangent for their unused CLS
    output (their cls params still receive real gradients through the
    token-stream path)."""
    gx_next = None
    for i in reversed(range(len(stage_params))):
        gy = jax.device_put(g_feats[i], stage_devices[i])
        if gx_next is not None:
            gy = gy + jax.device_put(gx_next, stage_devices[i])
        gc = (jax.device_put(g_cls[i], stage_devices[i])
              if g_cls is not None and g_cls[i] is not None else None)
        gp, gx_next = stage_bwd[i](stage_params[i], xs[i], gy, gc)
        stage_gsums[i] = (gp if stage_gsums[i] is None else
                          jax.tree.map(jnp.add, stage_gsums[i], gp))


def _merge_stage_params(stage_states, head_params) -> dict:
    """Reassemble the single-model params tree from per-stage TrainStates
    + the head's params (host-side; eval sync, tests, checkpointing)."""
    enc = {}
    for st in stage_states:
        enc.update(jax.device_get(st.params))
    return {"encoder": enc, "decode_head": jax.device_get(head_params)}


class PipelinedTrainer:
    """Stage-per-device supervised training (dice/BCE/MSE loss).

    variables: the ordinary single-model variables dict. Each stage's
    params become their own `TrainState` (optimizer chain identical to
    the single-device step) placed on that stage's device; the decode
    head (with its BN stats) lives on the last device.
    """

    def __init__(self, cfg: MiTConfig, variables: dict, tc: TrainConfig,
                 devices: Optional[Sequence[jax.Device]] = None,
                 loss_type: str = "dice", trainable_mask=None):
        if not tc.reference_quirks:
            # The stage forwards below run deterministic/eval-mode — which
            # IS the reference quirk. --no-quirks promises dropout/droppath
            # + BN-stat updates, which would need rng and mutable-stats
            # threading across stage boundaries; fail fast rather than
            # silently handing the quirk semantics back.
            raise NotImplementedError(
                "pipeline training implements the reference-quirks "
                "(eval-mode) training forward only; use the data-parallel "
                "step for reference_quirks=False")
        self.cfg = cfg
        self.loss_type = loss_type
        devices = list(devices if devices is not None else jax.devices())
        n = cfg.num_stages
        self.stage_devices = [devices[i % len(devices)] for i in range(n)]
        self.head_device = devices[n % len(devices)]

        # trainable_mask: the single-model bool pytree (api.SegFormerModel
        # builds it for frozen stages and the untrained-prompt-token quirk);
        # split per stage like the params so the pipeline optimizer freezes
        # exactly what the single-device state freezes.
        mask_enc = trainable_mask.get("encoder") if trainable_mask else None
        enc = variables["params"]["encoder"]
        self.stage_states: List[TrainState] = [
            jax.device_put(
                TrainState.create(
                    {"params": _stage_params(enc, i)}, tc,
                    trainable_mask=_nontrivial(
                        _stage_params(mask_enc, i)
                        if mask_enc is not None else None)),
                self.stage_devices[i])
            for i in range(n)
        ]
        head_vars = {"params": variables["params"]["decode_head"]}
        stats = variables.get("batch_stats", {})
        if stats:
            head_vars["batch_stats"] = stats["decode_head"]
        self.head_state = jax.device_put(
            TrainState.create(
                head_vars, tc,
                trainable_mask=_nontrivial(
                    trainable_mask.get("decode_head")
                    if trainable_mask else None)),
            self.head_device)

        self._stage_fwd = [_fwd_jit(cfg, i) for i in range(n)]
        self._stage_bwd = [_bwd_jit(cfg, i) for i in range(n)]
        self._head_grad = _head_grad_jit(cfg, loss_type, bool(stats))

    # ----------------------------------------------------------- helpers
    def merged_params(self) -> dict:
        """Reassemble the single-model params tree (host-side; tests and
        checkpointing)."""
        return _merge_stage_params(self.stage_states,
                                   self.head_state.params)

    # ------------------------------------------------------- wavefronts
    def _wavefronts(self, images: Array, masks: Array, micro: int,
                    stage_params: Sequence[dict], head_params: dict,
                    head_stats, stage_devices: Sequence[jax.Device],
                    head_device: jax.Device
                    ) -> Tuple[list, dict, Array]:
        """GPipe forward fill + backward drain over `micro` microbatches
        with the given parameters/devices (the compiled stage callables
        are device-agnostic — jit dispatches wherever the args live, which
        is what lets a data-parallel replica reuse them on its own device
        group). Returns (stage grad sums, head grad sum, loss sum); no
        optimizer update."""
        b = images.shape[0]
        mb = b // micro
        n = self.cfg.num_stages
        stage_gsums = [None] * n
        head_gsum = None
        loss_sum = None

        # Fill: all microbatch forwards first (async dispatch overlaps
        # microbatch k's stage j with k+1's stage j-1), keeping only the
        # per-stage inputs as backward recompute anchors (plus, for CLS
        # configs, the per-stage carried-CLS outputs — needed to shape the
        # zero cotangents and to feed the head).
        use_cls = self.cfg.use_cls
        fwd = []
        for s in range(micro):
            xs, feats, clss = [], [], []
            x = jax.device_put(images[s * mb:(s + 1) * mb],
                               stage_devices[0])
            for i in range(n):
                if i > 0:
                    x = jax.device_put(x, stage_devices[i])
                xs.append(x)
                x, cls = self._stage_fwd[i](stage_params[i], x)
                clss.append(cls)
                feats.append(jax.device_put(x, head_device))
            fwd.append((xs, feats, clss))

        for s in range(micro):
            xs, feats, clss = fwd[s]
            m = jax.device_put(masks[s * mb:(s + 1) * mb], head_device)
            if use_cls:
                loss, (g_head, g_feats, g_cls_last) = self._head_grad(
                    head_params, tuple(feats),
                    jax.device_put(clss[-1], head_device), head_stats, m)
                # only the FINAL stage's CLS feeds the head; earlier
                # stages' CLS outputs are unused -> zero cotangent
                g_cls = [jnp.zeros_like(c) if c is not None else None
                         for c in clss[:-1]] + [g_cls_last]
            else:
                loss, (g_head, g_feats) = self._head_grad(
                    head_params, tuple(feats), head_stats, m)
                g_cls = None
            loss_sum = loss if loss_sum is None else loss_sum + loss
            head_gsum = (g_head if head_gsum is None else
                         jax.tree.map(jnp.add, head_gsum, g_head))

            _drain_backward(self._stage_bwd, stage_devices, stage_params,
                            xs, g_feats, stage_gsums, g_cls=g_cls)
        return stage_gsums, head_gsum, loss_sum

    def _apply(self, stage_gsums: list, head_gsum: dict, loss_sum: Array,
               denom: int) -> Array:
        """ONE optimizer update per stage from summed gradients over
        `denom` microbatch contributions (mean-of-microbatch-grads).
        Returns the mean loss as a LAZY device scalar — a float() here
        would block the host on every stage update finishing before the
        next batch's wavefront can dispatch (plus the ~32ms tunnel sync);
        callers pick their own sync cadence (the CLIs: once per epoch)."""
        mean_loss = loss_sum / denom
        for i in range(self.cfg.num_stages):
            grads = jax.tree.map(lambda g: g / denom, stage_gsums[i])
            self.stage_states[i] = self.stage_states[i].apply_gradients(
                grads, jax.device_put(mean_loss, self.stage_devices[i]))
        head_grads = jax.tree.map(lambda g: g / denom, head_gsum)
        self.head_state = self.head_state.apply_gradients(
            head_grads, mean_loss)
        return mean_loss

    # -------------------------------------------------------------- step
    def step(self, images: Array, masks: Array, micro: int = 1
             ) -> Array:
        """One optimizer update from `micro` pipelined microbatches.
        Numerically equals `train_step(..., accum=micro)`. Returns the
        mean loss as a lazy device scalar (sync cadence is the caller's
        concern, as in the CLIs — see _apply)."""
        images = jnp.asarray(images)
        masks = jnp.asarray(masks)
        b = images.shape[0]
        if b % micro:
            raise ValueError(f"batch {b} not divisible by micro={micro}")
        stage_gsums, head_gsum, loss_sum = self._wavefronts(
            images, masks, micro,
            [st.params for st in self.stage_states],
            self.head_state.params, self.head_state.batch_stats,
            self.stage_devices, self.head_device)
        return self._apply(stage_gsums, head_gsum, loss_sum, micro)

    def scheduler_step(self) -> None:
        self.stage_states = [st.scheduler_step()
                             for st in self.stage_states]
        self.head_state = self.head_state.scheduler_step()


class DataParallelPipelinedTrainer:
    """2D dp x pp: `dp` data-parallel replicas of the stage-per-device
    pipeline, one optimizer.

    The device list splits into `dp` groups; group 0 owns the single
    `PipelinedTrainer` (stage params + Adam moments), groups 1..dp-1 hold
    read-only parameter mirrors. Each step shards the batch across
    replicas, every replica runs its own GPipe wavefronts on its devices
    (the jitted stage callables are shared — jit dispatches by argument
    placement), replica gradient sums reduce onto group 0's stage devices,
    ONE update applies the dp x micro microbatch-mean gradient, and the
    updated params re-mirror. Numerically this is
    `train_step(accum=dp*micro)` — asserted by tests/test_pipeline_train.py
    — i.e. the same contract as the plain pipeline, scaled out.

    The reduce + re-mirror is the host-orchestrated analogue of dp's
    gradient all-reduce + FSDP's param broadcast; transfers ride ICI via
    `jax.device_put` like the pipeline's activation hops. The reference
    has no distributed training at all (SURVEY.md §5)."""

    def __init__(self, cfg: MiTConfig, variables: dict, tc: TrainConfig,
                 dp: int = 2,
                 devices: Optional[Sequence[jax.Device]] = None,
                 loss_type: str = "dice", trainable_mask=None):
        devices = list(devices if devices is not None else jax.devices())
        if dp < 1 or len(devices) % dp:
            raise ValueError(
                f"{len(devices)} devices not divisible into dp={dp} groups")
        per = len(devices) // dp
        groups = [devices[r * per:(r + 1) * per] for r in range(dp)]
        self.dp = dp
        self.pt = PipelinedTrainer(cfg, variables, tc, devices=groups[0],
                                   loss_type=loss_type,
                                   trainable_mask=trainable_mask)
        n = cfg.num_stages
        self.rep_stage_devices = [
            [g[i % len(g)] for i in range(n)] for g in groups]
        self.rep_head_devices = [g[n % len(g)] for g in groups]
        self._mirror()

    def _mirror(self) -> None:
        """Copy group 0's current params (and head BN stats) to every
        other replica's devices."""
        pt = self.pt
        n = pt.cfg.num_stages
        self._rep_stage_params = []
        self._rep_head_params = []
        self._rep_head_stats = []
        for r in range(1, self.dp):
            self._rep_stage_params.append([
                jax.device_put(pt.stage_states[i].params,
                               self.rep_stage_devices[r][i])
                for i in range(n)])
            self._rep_head_params.append(
                jax.device_put(pt.head_state.params,
                               self.rep_head_devices[r]))
            self._rep_head_stats.append(
                jax.device_put(pt.head_state.batch_stats,
                               self.rep_head_devices[r])
                if pt.head_state.batch_stats else
                pt.head_state.batch_stats)

    def merged_params(self) -> dict:
        return self.pt.merged_params()

    def step(self, images: Array, masks: Array, micro: int = 1) -> Array:
        """One update from dp x micro pipelined microbatches (batch shards
        across replicas, then microbatches within each). Returns the mean
        loss as a lazy device scalar (see PipelinedTrainer._apply)."""
        images = jnp.asarray(images)
        masks = jnp.asarray(masks)
        b = images.shape[0]
        if b % (self.dp * micro):
            raise ValueError(f"batch {b} not divisible by "
                             f"dp*micro={self.dp}*{micro}")
        shard = b // self.dp
        pt = self.pt
        n = pt.cfg.num_stages

        results = []
        for r in range(self.dp):
            if r == 0:
                sp = [st.params for st in pt.stage_states]
                hp, hs = pt.head_state.params, pt.head_state.batch_stats
            else:
                sp = self._rep_stage_params[r - 1]
                hp = self._rep_head_params[r - 1]
                hs = self._rep_head_stats[r - 1]
            results.append(pt._wavefronts(
                images[r * shard:(r + 1) * shard],
                masks[r * shard:(r + 1) * shard], micro, sp, hp, hs,
                self.rep_stage_devices[r], self.rep_head_devices[r]))

        # reduce replica grad sums onto group 0's devices
        stage_gsums, head_gsum, loss_sum = results[0]
        for r in range(1, self.dp):
            sg, hg, ls = results[r]
            for i in range(n):
                stage_gsums[i] = jax.tree.map(
                    lambda a, b, i=i: a + jax.device_put(
                        b, pt.stage_devices[i]),
                    stage_gsums[i], sg[i])
            head_gsum = jax.tree.map(
                lambda a, b: a + jax.device_put(b, pt.head_device),
                head_gsum, hg)
            loss_sum = loss_sum + jax.device_put(ls, pt.head_device)

        out = pt._apply(stage_gsums, head_gsum, loss_sum,
                        self.dp * micro)
        self._mirror()
        return out

    def scheduler_step(self) -> None:
        self.pt.scheduler_step()
