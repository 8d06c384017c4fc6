"""Pipeline-parallel EMA (mean-teacher) training: the flagship workload
(`train/ema.py`) with one encoder stage (+ decode head) per device.

Teacher AND student stage parameters live on their stage's device; only
the student carries optimizer state (the whole point of the EMA step —
no teacher backward or Adam moments), so per-device memory is one
stage's params x2 + one stage's Adam moments. Per microbatch pair the
host drives:

  1. a no-grad teacher stage wavefront over concat(unlabeled, labeled)
     (one dispatch per stage, full-width MXU work — `train/ema.py`'s
     `_teacher_soft_masks` fusion, expressed as a pipeline),
  2. ONE fused head-device program: teacher decode head -> soft masks,
     pseudo thresholding (`train/pseudo.py` semantics, ref
     `segFormer_semi_teacherstudent_main.py:24-56`), label denoising
     (`:110-118`), and the student head loss
     w*dice(pred, GT) + (1-w)*dice(pred, denoised_teacher) with its
     gradient w.r.t. head params and stage features,
  3. the student stage backward wavefront (recompute-in-backward, as in
     `pipeline_train.py`),

then ONE optimizer update per stage from the microbatch-mean gradient
and ONE per-stage EMA write `teacher <- d*teacher + (1-d)*student`
(params and head batch_stats — `ema_update`'s convention). Loss /
pseudo-metric pooling matches `train/ema.py::_ema_semi_accum` exactly,
so `step(micro=m)` is numerically `ema_semi_step(..., accum=m,
train_mode=False)` (asserted by tests/test_pipeline_ema.py).

Scope: eval-mode forwards only (the benched/improved EMA semantics,
`train_mode=False`). Reference-quirks EMA mode runs its forwards in
TRAIN mode (`segFormer_semi_teacherstudent_main.py:77-78` —
`model.train()`), which would need dropout rng and mutable-BN threading
across stage boundaries; use the single-device fused step for that.
CLS-token configs are rejected for the same reason as
`pipeline_train.py`.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from semisupervisedobjectdetection_tpu.core.config import (
    MiTConfig,
    TrainConfig,
)
from semisupervisedobjectdetection_tpu import losses
from semisupervisedobjectdetection_tpu.models.segformer import (
    DecodeHead,
    predict_masks,
)
from semisupervisedobjectdetection_tpu.parallel.pipeline import (
    _stage_params,
)
from semisupervisedobjectdetection_tpu.parallel.pipeline_train import (
    _bwd_jit,
    _drain_backward,
    _fwd_jit,
    _merge_stage_params,
    _nontrivial,
)
from semisupervisedobjectdetection_tpu.train import pseudo
from semisupervisedobjectdetection_tpu.train.state import TrainState

Array = jax.Array


class EmaPipeStepOut(NamedTuple):
    student_loss_total: Array      # lazy device scalars (sync is the
    student_sup_loss: Array        # caller's cadence concern)
    self_supervise_loss: Array
    pseudo_loss: Array             # NaN when nothing passed the gate
    n_kept: Array
    pseudo_mask: Array             # (Bu, H, W)


@functools.lru_cache(maxsize=None)
def _head_phase_jit(cfg: MiTConfig, has_stats: bool, hw: tuple, bu: int,
                    denoise: bool, threshold: float, confident: float):
    """ONE head-device program per microbatch: teacher soft masks over the
    concat batch, pseudo thresholding + denoising, student head loss +
    gradient w.r.t. (head params, stage features)."""

    def phase(t_head, t_stats, t_feats, s_head, s_stats, s_feats,
              gt, sup_w):
        tv = {"params": t_head}
        if has_stats:
            tv["batch_stats"] = t_stats
        soft = predict_masks(
            DecodeHead(cfg).apply(tv, list(t_feats), None), hw)
        soft = jax.lax.stop_gradient(soft)
        u_soft, l_soft = soft[:bu], soft[bu:]

        labels = pseudo.threshold_pseudo_masks(
            u_soft, threshold, confident, allow_throw_sample=True)
        tmask = (pseudo.denoise_labels(l_soft, gt, threshold)
                 if denoise else l_soft)

        def head_loss(params, feats):
            v = {"params": params}
            if has_stats:
                v["batch_stats"] = s_stats
            pred = predict_masks(
                DecodeHead(cfg).apply(v, list(feats), None), hw)
            sup = losses.dice_loss(pred, gt)
            self_sup = losses.dice_loss(pred, tmask)
            return sup_w * sup + (1.0 - sup_w) * self_sup, (sup, self_sup)

        ((total, (sup, self_sup)), (g_head, g_feats)) = jax.value_and_grad(
            head_loss, argnums=(0, 1), has_aux=True)(s_head, tuple(s_feats))
        # pooled pseudo stats (undo the kept division; the NaN convention
        # re-applies on the pooled count) — `_ema_semi_accum`'s convention
        p_sum = jnp.where(labels.n_kept > 0,
                          labels.loss * labels.n_kept, 0.0)
        return (total, sup, self_sup, p_sum, labels.n_kept,
                labels.pseudo_mask, g_head, g_feats)

    return jax.jit(phase)


@functools.lru_cache(maxsize=None)
def _ema_write_jit():
    """teacher <- d*teacher + (1-d)*student, elementwise over one stage's
    (or the head's) param/stat tree. One cached jit serves every stage —
    XLA specializes per tree structure."""
    return jax.jit(lambda t, s, d: jax.tree.map(
        lambda a, b: d * a + (1.0 - d) * b, t, s))


class EmaPipelinedTrainer:
    """Stage-per-device EMA mean-teacher training (see module docstring).

    teacher_variables / student_variables: ordinary single-model variables
    dicts (typically the same warm start; leaves are copied by
    TrainState.create / jnp.array so the two never alias)."""

    def __init__(self, cfg: MiTConfig, teacher_variables: dict,
                 student_variables: dict, tc: TrainConfig,
                 devices: Optional[Sequence[jax.Device]] = None,
                 denoise_label: bool = True,
                 threshold: float = pseudo.PSEUDO_MASK_THRESHOLD,
                 confident_threshold: float = pseudo.CONFIDENT_THRESHOLD,
                 trainable_mask=None):
        if cfg.use_cls:
            # The supervised pipeline trainer DOES wire the carried-CLS
            # head edge (parallel/pipeline_train.py), so domain-prompting
            # workloads pipeline there. HERE the edge would have to thread
            # through the fused head-device program (teacher-head/pseudo/
            # denoise/student-head-grads) for BOTH models, and no reference
            # workload combines EMA semi-training with CLS domain prompts
            # (fewshot uses its own loops, segFormer_fewshot_learning.py) —
            # a cost with no user until such a workload exists.
            raise NotImplementedError(
                "CLS-token configs: use --parallel pp on the supervised "
                "CLI (pipeline_train.py wires the CLS head edge) or the "
                "fused single-device EMA step; no reference workload "
                "combines EMA semi-training with domain-CLS prompts")
        if tc.reference_quirks:
            # In EMA mode the reference QUIRK is train-mode forwards
            # (`segFormer_semi_teacherstudent_main.py:77-78`, the inverse
            # of the supervised quirk); this trainer runs eval-mode
            # forwards (the improved/benched semantics), so a quirks
            # TrainConfig must fail fast, not silently train differently.
            raise NotImplementedError(
                "pipelined EMA training implements eval-mode forwards "
                "(reference_quirks=False semantics) only; use the fused "
                "single-device ema_semi_step for quirks train-mode "
                "forwards")
        self.cfg = cfg
        self.denoise_label = bool(denoise_label)
        self.threshold = float(threshold)
        self.confident_threshold = float(confident_threshold)
        devices = list(devices if devices is not None else jax.devices())
        n = cfg.num_stages
        self.stage_devices = [devices[i % len(devices)] for i in range(n)]
        self.head_device = devices[n % len(devices)]

        # student: per-stage TrainStates (optimizer chain == single-device
        # step) + head TrainState with the decode-head BN stats
        mask_enc = trainable_mask.get("encoder") if trainable_mask else None
        s_enc = student_variables["params"]["encoder"]
        self.stage_states: List[TrainState] = [
            jax.device_put(
                TrainState.create(
                    {"params": _stage_params(s_enc, i)}, tc,
                    trainable_mask=_nontrivial(
                        _stage_params(mask_enc, i)
                        if mask_enc is not None else None)),
                self.stage_devices[i])
            for i in range(n)
        ]
        head_vars = {"params": student_variables["params"]["decode_head"]}
        s_stats = student_variables.get("batch_stats", {})
        if s_stats:
            head_vars["batch_stats"] = s_stats["decode_head"]
        self.head_state = jax.device_put(
            TrainState.create(
                head_vars, tc,
                trainable_mask=_nontrivial(
                    trainable_mask.get("decode_head")
                    if trainable_mask else None)),
            self.head_device)

        # teacher: plain param trees (NO optimizer state — the EMA step's
        # memory win), placed like the student's
        t_enc = teacher_variables["params"]["encoder"]
        self.teacher_stage_params = [
            jax.device_put(jax.tree.map(jnp.array, _stage_params(t_enc, i)),
                           self.stage_devices[i])
            for i in range(n)
        ]
        self.teacher_head_params = jax.device_put(
            jax.tree.map(jnp.array,
                         teacher_variables["params"]["decode_head"]),
            self.head_device)
        t_stats = teacher_variables.get("batch_stats", {})
        self.teacher_head_stats = (
            jax.device_put(jax.tree.map(jnp.array, t_stats["decode_head"]),
                           self.head_device) if t_stats else {})
        self._has_stats = bool(s_stats)

        self._stage_fwd = [_fwd_jit(cfg, i) for i in range(n)]
        self._stage_bwd = [_bwd_jit(cfg, i) for i in range(n)]

    # ----------------------------------------------------------- helpers
    def merged_student_params(self) -> dict:
        return _merge_stage_params(self.stage_states,
                                   self.head_state.params)

    def merged_teacher_variables(self) -> dict:
        enc = {}
        for p in self.teacher_stage_params:
            enc.update(jax.device_get(p))
        out = {"params": {
            "encoder": enc,
            "decode_head": jax.device_get(self.teacher_head_params)}}
        if self.teacher_head_stats:
            out["batch_stats"] = {
                "decode_head": jax.device_get(self.teacher_head_stats)}
        return out

    def _encoder_wavefront(self, params: Sequence[dict], x: Array,
                           keep_inputs: bool, stage_devices=None,
                           head_device=None):
        """Run one batch through the encoder stages on the given devices
        (defaults: this trainer's — a dp replica passes its own group;
        the compiled stage callables dispatch wherever the args live).
        Returns (feats on head device, per-stage inputs or None)."""
        stage_devices = stage_devices or self.stage_devices
        head_device = head_device or self.head_device
        xs = [] if keep_inputs else None
        feats = []
        x = jax.device_put(x, stage_devices[0])
        for i in range(self.cfg.num_stages):
            if i > 0:
                x = jax.device_put(x, stage_devices[i])
            if keep_inputs:
                xs.append(x)
            x, _ = self._stage_fwd[i](params[i], x)
            feats.append(jax.device_put(x, head_device))
        return feats, xs

    # -------------------------------------------------------------- step
    def step(self, unlabeled: Array, images: Array, ground_truth: Array,
             supervise_weight, ema_decay, micro: int = 1
             ) -> EmaPipeStepOut:
        """One EMA mean-teacher update from `micro` pipelined microbatch
        pairs; numerically `ema_semi_step(..., accum=micro,
        train_mode=False)` (losses averaged, pseudo stats pooled, ONE
        optimizer update + ONE EMA write)."""
        unlabeled = jnp.asarray(unlabeled)
        images = jnp.asarray(images)
        ground_truth = jnp.asarray(ground_truth)
        bu, bl = unlabeled.shape[0], images.shape[0]
        if bu % micro or bl % micro:
            raise ValueError(f"batches ({bu} unlabeled, {bl} labeled) "
                             f"not divisible by micro={micro}")
        if unlabeled.shape[1:] != images.shape[1:]:
            # the fused step falls back to two teacher forwards here; the
            # pipeline's one-wavefront concat forward requires one shape
            raise ValueError(
                f"unlabeled {unlabeled.shape[1:]} and labeled "
                f"{images.shape[1:]} spatial shapes must match for the "
                f"pipelined EMA step (use the fused single-device step "
                f"for mixed-shape batches)")
        stage_gsums, head_gsum, sums, p_masks = self._replica_pass(
            unlabeled, images, ground_truth, micro, supervise_weight,
            self.teacher_stage_params, self.teacher_head_params,
            self.teacher_head_stats,
            [st.params for st in self.stage_states],
            self.head_state.params, self.head_state.batch_stats,
            self.stage_devices, self.head_device)
        return self._apply_and_ema(stage_gsums, head_gsum, sums, p_masks,
                                   micro, ema_decay)

    def _replica_pass(self, unlabeled: Array, images: Array,
                      ground_truth: Array, micro: int, supervise_weight,
                      t_stage_params, t_head_params, t_head_stats,
                      s_stage_params, s_head_params, s_head_stats,
                      stage_devices, head_device):
        """`micro` microbatch-pair wavefronts with the given parameters /
        devices (device-agnostic, like `PipelinedTrainer._wavefronts` — a
        dp replica reuses the compiled callables on its own device group).
        Returns (stage grad sums, head grad sum, pooled loss/pseudo sums,
        per-microbatch pseudo masks); no optimizer update or EMA write."""
        bu, bl = unlabeled.shape[0], images.shape[0]
        mu, ml = bu // micro, bl // micro
        n = self.cfg.num_stages
        hw = tuple(ground_truth.shape[1:3])
        sup_w = jax.device_put(jnp.asarray(supervise_weight, jnp.float32),
                               head_device)
        head_phase = _head_phase_jit(
            self.cfg, self._has_stats, hw, mu, self.denoise_label,
            self.threshold, self.confident_threshold)

        stage_gsums = [None] * n
        head_gsum = None
        sums = {k: None for k in ("total", "sup", "self", "p_sum", "kept")}
        p_masks = []

        for s in range(micro):
            u_mb = unlabeled[s * mu:(s + 1) * mu]
            l_mb = images[s * ml:(s + 1) * ml]
            g_mb = jax.device_put(ground_truth[s * ml:(s + 1) * ml],
                                  head_device)

            # 1) teacher wavefront over concat(unlabeled, labeled)
            t_feats, _ = self._encoder_wavefront(
                t_stage_params,
                jnp.concatenate([u_mb, l_mb], axis=0), keep_inputs=False,
                stage_devices=stage_devices, head_device=head_device)
            # 2) student forward wavefront (keep recompute anchors)
            s_feats, xs = self._encoder_wavefront(
                s_stage_params, l_mb, keep_inputs=True,
                stage_devices=stage_devices, head_device=head_device)
            # 3) fused head phase: teacher head + pseudo + denoise +
            #    student head loss/grads
            (total, sup, self_sup, p_sum, kept, pmask, g_head,
             g_feats) = head_phase(
                t_head_params, t_head_stats, tuple(t_feats),
                s_head_params, s_head_stats, tuple(s_feats), g_mb, sup_w)
            p_masks.append(pmask)
            for k, v in zip(("total", "sup", "self", "p_sum", "kept"),
                            (total, sup, self_sup, p_sum, kept)):
                sums[k] = v if sums[k] is None else sums[k] + v
            head_gsum = (g_head if head_gsum is None else
                         jax.tree.map(jnp.add, head_gsum, g_head))

            # 4) student backward wavefront (shared drain helper — one
            # place owns the cotangent summing / device-hop order)
            _drain_backward(self._stage_bwd, stage_devices,
                            s_stage_params, xs, g_feats, stage_gsums)
        return stage_gsums, head_gsum, sums, p_masks

    def _apply_and_ema(self, stage_gsums, head_gsum, sums, p_masks,
                       denom: int, ema_decay) -> EmaPipeStepOut:
        """ONE optimizer update per stage from gradients summed over
        `denom` microbatch contributions, then ONE per-stage EMA write."""
        n = self.cfg.num_stages
        total = sums["total"] / denom
        decay = jnp.asarray(ema_decay, jnp.float32)
        ema = _ema_write_jit()
        for i in range(n):
            grads = jax.tree.map(lambda g: g / denom, stage_gsums[i])
            self.stage_states[i] = self.stage_states[i].apply_gradients(
                grads, jax.device_put(total, self.stage_devices[i]))
            self.teacher_stage_params[i] = ema(
                self.teacher_stage_params[i], self.stage_states[i].params,
                jax.device_put(decay, self.stage_devices[i]))
        head_grads = jax.tree.map(lambda g: g / denom, head_gsum)
        self.head_state = self.head_state.apply_gradients(head_grads, total)
        d_head = jax.device_put(decay, self.head_device)
        self.teacher_head_params = ema(
            self.teacher_head_params, self.head_state.params, d_head)
        if self.teacher_head_stats:
            self.teacher_head_stats = ema(
                self.teacher_head_stats, self.head_state.batch_stats,
                d_head)

        n_kept = sums["kept"]
        pseudo_loss = jnp.where(
            n_kept > 0, sums["p_sum"] / jnp.maximum(n_kept, 1.0), jnp.nan)
        return EmaPipeStepOut(
            student_loss_total=total,
            student_sup_loss=sums["sup"] / denom,
            self_supervise_loss=sums["self"] / denom,
            pseudo_loss=pseudo_loss, n_kept=n_kept,
            pseudo_mask=jnp.concatenate(p_masks, axis=0))

    def scheduler_step(self) -> None:
        self.stage_states = [st.scheduler_step()
                             for st in self.stage_states]
        self.head_state = self.head_state.scheduler_step()


class DataParallelEmaPipelinedTrainer:
    """2D dp x pp for the EMA workload: `dp` replicas of the
    stage-per-device EMA pipeline, one student optimizer, one EMA write.

    The device list splits into `dp` groups; group 0 owns the single
    `EmaPipelinedTrainer` (student stage TrainStates + teacher param
    trees), groups 1..dp-1 hold read-only mirrors of BOTH models. Each
    step shards the (unlabeled, labeled) batch pair across replicas,
    every replica runs its own wavefronts on its devices, student
    gradient sums and pooled loss/pseudo stats reduce onto group 0, ONE
    update applies the dp x micro microbatch-mean gradient, ONE EMA write
    moves the teacher, and the updated params re-mirror. Numerically
    `ema_semi_step(accum=dp*micro, train_mode=False)` — the same
    contract as `DataParallelPipelinedTrainer` scaled to the flagship
    workload (asserted by tests/test_pipeline_ema.py)."""

    def __init__(self, cfg: MiTConfig, teacher_variables: dict,
                 student_variables: dict, tc: TrainConfig, dp: int = 2,
                 devices: Optional[Sequence[jax.Device]] = None,
                 **kw):
        devices = list(devices if devices is not None else jax.devices())
        if dp < 1 or len(devices) % dp:
            raise ValueError(
                f"{len(devices)} devices not divisible into dp={dp} groups")
        per = len(devices) // dp
        groups = [devices[r * per:(r + 1) * per] for r in range(dp)]
        self.dp = dp
        self.pt = EmaPipelinedTrainer(cfg, teacher_variables,
                                      student_variables, tc,
                                      devices=groups[0], **kw)
        n = cfg.num_stages
        self.rep_stage_devices = [
            [g[i % len(g)] for i in range(n)] for g in groups]
        self.rep_head_devices = [g[n % len(g)] for g in groups]
        self._mirror()

    def _mirror(self) -> None:
        """Copy group 0's current teacher AND student params (and head
        stats) to every other replica's devices."""
        pt = self.pt
        n = pt.cfg.num_stages
        self._rep = []      # per replica: dict of mirrored trees
        for r in range(1, self.dp):
            sd = self.rep_stage_devices[r]
            hd = self.rep_head_devices[r]
            self._rep.append(dict(
                t_stage=[jax.device_put(pt.teacher_stage_params[i], sd[i])
                         for i in range(n)],
                t_head=jax.device_put(pt.teacher_head_params, hd),
                t_stats=(jax.device_put(pt.teacher_head_stats, hd)
                         if pt.teacher_head_stats else
                         pt.teacher_head_stats),
                s_stage=[jax.device_put(pt.stage_states[i].params, sd[i])
                         for i in range(n)],
                s_head=jax.device_put(pt.head_state.params, hd),
                s_stats=(jax.device_put(pt.head_state.batch_stats, hd)
                         if pt.head_state.batch_stats else
                         pt.head_state.batch_stats),
            ))

    def merged_student_params(self) -> dict:
        return self.pt.merged_student_params()

    def merged_teacher_variables(self) -> dict:
        return self.pt.merged_teacher_variables()

    def step(self, unlabeled: Array, images: Array, ground_truth: Array,
             supervise_weight, ema_decay, micro: int = 1
             ) -> EmaPipeStepOut:
        """One EMA update from dp x micro pipelined microbatch pairs
        (both batches shard across replicas, then microbatch within)."""
        unlabeled = jnp.asarray(unlabeled)
        images = jnp.asarray(images)
        ground_truth = jnp.asarray(ground_truth)
        bu, bl = unlabeled.shape[0], images.shape[0]
        if bu % (self.dp * micro) or bl % (self.dp * micro):
            raise ValueError(
                f"batches ({bu} unlabeled, {bl} labeled) not divisible "
                f"by dp*micro={self.dp}*{micro}")
        if unlabeled.shape[1:] != images.shape[1:]:
            # same guard as EmaPipelinedTrainer.step — _replica_pass would
            # otherwise fail deep inside the wavefront concat, after the
            # (long) compile, with an unactionable shape error
            raise ValueError(
                f"unlabeled {unlabeled.shape[1:]} and labeled "
                f"{images.shape[1:]} spatial shapes must match for the "
                f"pipelined EMA step (use the fused single-device step "
                f"for mixed-shape batches)")
        su, sl = bu // self.dp, bl // self.dp
        pt = self.pt
        n = pt.cfg.num_stages

        results = []
        for r in range(self.dp):
            if r == 0:
                t_stage, t_head, t_stats = (pt.teacher_stage_params,
                                            pt.teacher_head_params,
                                            pt.teacher_head_stats)
                s_stage = [st.params for st in pt.stage_states]
                s_head, s_stats = (pt.head_state.params,
                                   pt.head_state.batch_stats)
            else:
                m = self._rep[r - 1]
                t_stage, t_head, t_stats = (m["t_stage"], m["t_head"],
                                            m["t_stats"])
                s_stage, s_head, s_stats = (m["s_stage"], m["s_head"],
                                            m["s_stats"])
            results.append(pt._replica_pass(
                unlabeled[r * su:(r + 1) * su],
                images[r * sl:(r + 1) * sl],
                ground_truth[r * sl:(r + 1) * sl], micro,
                supervise_weight, t_stage, t_head, t_stats,
                s_stage, s_head, s_stats,
                self.rep_stage_devices[r], self.rep_head_devices[r]))

        # reduce replica grad sums + pooled stats onto group 0's devices
        stage_gsums, head_gsum, sums, p_masks = results[0]
        for r in range(1, self.dp):
            sg, hg, sm, pm = results[r]
            for i in range(n):
                stage_gsums[i] = jax.tree.map(
                    lambda a, b, i=i: a + jax.device_put(
                        b, pt.stage_devices[i]),
                    stage_gsums[i], sg[i])
            head_gsum = jax.tree.map(
                lambda a, b: a + jax.device_put(b, pt.head_device),
                head_gsum, hg)
            for k in sums:
                sums[k] = sums[k] + jax.device_put(sm[k], pt.head_device)
            p_masks.extend(jax.device_put(x, pt.head_device) for x in pm)

        out = pt._apply_and_ema(stage_gsums, head_gsum, sums, p_masks,
                                self.dp * micro, ema_decay)
        self._mirror()
        return out

    def scheduler_step(self) -> None:
        self.pt.scheduler_step()
