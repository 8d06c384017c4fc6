"""Pipeline-parallel EMA training (`parallel/pipeline_ema.py`).

The stage-per-device EMA step must match the fused single-device
`ema_semi_step(train_mode=False, accum=micro)` — same student update,
same EMA teacher write (params + head BN stats), same loss/pseudo-metric
pooling. The oracle is this repo's own tested step (train/ema.py);
the reference has no distributed training at all (SURVEY.md §5).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from semisupervisedobjectdetection_tpu.core.config import (
    TrainConfig,
    mit_b0,
)
from semisupervisedobjectdetection_tpu.models.segformer import SegFormer
from semisupervisedobjectdetection_tpu import losses
from semisupervisedobjectdetection_tpu.parallel.pipeline_ema import (
    DataParallelEmaPipelinedTrainer,
    EmaPipelinedTrainer,
)
from semisupervisedobjectdetection_tpu.train import ema as ema_mod
from semisupervisedobjectdetection_tpu.train.common import forward_masks
from semisupervisedobjectdetection_tpu.train.state import TrainState

needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 devices")

# The heavy checks below (check_*) compile many brand-new executables
# (per-stage fwd/bwd jits, the fused head-phase program, the fused-step
# oracle) — exactly the profile of the XLA:CPU compile-cache serializer
# SIGSEGV in long-lived xdist workers (CLAUDE.md round-3 hazard), so they
# are NOT collected directly; test_ema_pipeline_subprocess runs them in a
# fresh interpreter via tests/_pipeline_ema_main.py.

TINY = mit_b0(depths=(1, 1, 1, 1), hidden_sizes=(8, 16, 32, 64),
              num_heads=(1, 2, 4, 8), decoder_hidden=32)
SUP_W, DECAY = 0.6, 0.9


def _setup(bu=4, bl=4, size=64):
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.uniform(0, 1, (bu, size, size, 3)), jnp.float32)
    imgs = jnp.asarray(rng.uniform(0, 1, (bl, size, size, 3)), jnp.float32)
    masks = jnp.asarray(rng.uniform(0, 1, (bl, size, size)) > 0.5,
                        jnp.float32)
    variables = jax.jit(SegFormer(TINY).init)(jax.random.PRNGKey(0),
                                              imgs[:1])
    return u, imgs, masks, variables


def _oracle(variables, u, imgs, masks, accum):
    teacher = TrainState.create(jax.tree.map(jnp.copy, variables),
                                TrainConfig())
    student = TrainState.create(jax.tree.map(jnp.copy, variables),
                                TrainConfig())
    return ema_mod.ema_semi_step(
        teacher, student, u, imgs, masks, jnp.asarray(SUP_W),
        jnp.asarray(DECAY), TINY, denoise_label=True,
        confident_threshold=0.0,    # keep every unlabeled sample so the
        train_mode=False,           # pseudo metric path is exercised
        accum=accum)


def _grad_mask(variables, u, imgs, masks):
    """Noise-floor mask: compare post-Adam params only where the combined
    loss gradient is nontrivial (Adam's first step is ~sign(g); see
    test_grad_accum for the rationale)."""
    t_vars = {"params": variables["params"],
              "batch_stats": variables["batch_stats"]}
    _, l_soft = ema_mod._teacher_soft_masks(TINY, t_vars, u, imgs)
    from semisupervisedobjectdetection_tpu.train import pseudo
    tmask = pseudo.denoise_labels(l_soft, masks, pseudo.PSEUDO_MASK_THRESHOLD)

    def loss_fn(params):
        pred, _, _ = forward_masks(
            TINY, {"params": params,
                   "batch_stats": variables["batch_stats"]},
            imgs, train_mode=False)
        return (SUP_W * losses.dice_loss(pred, masks)
                + (1 - SUP_W) * losses.dice_loss(pred, tmask))

    return jax.jit(jax.grad(loss_fn))(variables["params"])


def check_matches_fused_step(micro):
    u, imgs, masks, variables = _setup()
    want_g = _grad_mask(variables, u, imgs, masks)
    oracle = _oracle(variables, u, imgs, masks, accum=micro)

    pt = EmaPipelinedTrainer(TINY, variables, variables,
                             TrainConfig(reference_quirks=False),
                             confident_threshold=0.0)
    out = pt.step(u, imgs, masks, SUP_W, DECAY, micro=micro)

    np.testing.assert_allclose(out.student_loss_total,
                               float(oracle.student_loss_total),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out.student_sup_loss,
                               float(oracle.student_sup_loss),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out.self_supervise_loss,
                               float(oracle.self_supervise_loss),
                               rtol=1e-5, atol=1e-6)
    assert int(out.n_kept) == int(oracle.n_kept) == u.shape[0]
    np.testing.assert_allclose(out.pseudo_loss, float(oracle.pseudo_loss),
                               rtol=1e-5, atol=1e-6)
    # binarized masks: the two compute paths may flip pixels sitting
    # exactly at the 0.5 boundary; bound the disagreement instead
    disagree = np.mean(np.asarray(out.pseudo_mask)
                       != np.asarray(oracle.pseudo_mask))
    assert disagree < 5e-3, f"pseudo masks disagree on {disagree:.2%}"

    # student params match the fused update above the noise floor
    merged = pt.merged_student_params()
    flat_o = jax.tree_util.tree_flatten_with_path(
        oracle.student_state.params)[0]
    flat_m = jax.tree_util.tree_flatten_with_path(merged)[0]
    checked = 0
    for (kp, a), (_, b), g in zip(flat_o, flat_m,
                                  jax.tree.leaves(want_g)):
        sel = np.abs(np.asarray(g)) > 1e-6
        checked += int(sel.sum())
        np.testing.assert_allclose(
            np.asarray(a)[sel], np.asarray(b)[sel], rtol=2e-5, atol=2e-6,
            err_msg=f"student param mismatch at {jax.tree_util.keystr(kp)}")
    assert checked > 1000

    # teacher EMA write: exactly d*t0 + (1-d)*student_pipeline, params AND
    # head BN stats (internal consistency — the student side is already
    # oracle-checked above)
    tv = pt.merged_teacher_variables()
    flat_t0 = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flat_t = jax.tree_util.tree_flatten_with_path(tv["params"])[0]
    for ((kp, t0), (_, t1), (_, s1)) in zip(flat_t0, flat_t, flat_m):
        np.testing.assert_allclose(
            np.asarray(t1),
            DECAY * np.asarray(t0) + (1 - DECAY) * np.asarray(s1),
            rtol=1e-5, atol=1e-7,
            err_msg=f"teacher EMA mismatch at {jax.tree_util.keystr(kp)}")
    for (kp, st0), st1, ss1 in zip(
            jax.tree_util.tree_flatten_with_path(
                variables["batch_stats"]["decode_head"])[0],
            jax.tree.leaves(tv["batch_stats"]["decode_head"]),
            jax.tree.leaves(pt.head_state.batch_stats)):
        np.testing.assert_allclose(
            np.asarray(st1),
            DECAY * np.asarray(st0) + (1 - DECAY) * np.asarray(ss1),
            rtol=1e-5, atol=1e-7,
            err_msg=f"teacher stat EMA mismatch at "
                    f"{jax.tree_util.keystr(kp)}")


def check_trains_and_places_memory():
    """Loss decreases over steps; teacher params live stage-per-device
    with NO optimizer state; scheduler smoke."""
    u, imgs, masks, variables = _setup()
    pt = EmaPipelinedTrainer(TINY, variables, variables,
                             TrainConfig(lr=3e-3, reference_quirks=False),
                             confident_threshold=0.0)
    for i, p in enumerate(pt.teacher_stage_params):
        devs = {d for leaf in jax.tree.leaves(p) for d in leaf.devices()}
        assert devs == {pt.stage_devices[i]}
    first = pt.step(u, imgs, masks, SUP_W, DECAY, micro=2)
    for _ in range(6):
        last = pt.step(u, imgs, masks, SUP_W, DECAY, micro=2)
    assert last.student_loss_total < first.student_loss_total, (
        float(first.student_loss_total), float(last.student_loss_total))
    pt.scheduler_step()
    with pytest.raises(ValueError, match="divisible"):
        pt.step(u[:3], imgs, masks, SUP_W, DECAY, micro=2)


def check_dp_matches_fused_step():
    """dp x pp (2 replicas x 4 stages on 8 devices) must equal
    ema_semi_step(accum=dp*micro) — same contract as the supervised
    DataParallelPipelinedTrainer, scaled to the flagship workload."""
    u, imgs, masks, variables = _setup()
    oracle = _oracle(variables, u, imgs, masks, accum=2)

    dpt = DataParallelEmaPipelinedTrainer(
        TINY, variables, variables, TrainConfig(reference_quirks=False),
        dp=2, confident_threshold=0.0)

    # mixed spatial shapes must fail fast (same guard as the single
    # pipeline), not deep inside the wavefront concat after a compile
    try:
        dpt.step(u[:, : u.shape[1] // 2], imgs, masks, SUP_W, DECAY,
                 micro=1)
        raise AssertionError("mixed-shape batches should be rejected")
    except ValueError as e:
        assert "spatial shapes must match" in str(e)

    out = dpt.step(u, imgs, masks, SUP_W, DECAY, micro=1)

    np.testing.assert_allclose(out.student_loss_total,
                               float(oracle.student_loss_total),
                               rtol=1e-5, atol=1e-6)
    assert int(out.n_kept) == int(oracle.n_kept) == u.shape[0]
    np.testing.assert_allclose(out.pseudo_loss, float(oracle.pseudo_loss),
                               rtol=1e-5, atol=1e-6)

    # replica groups are disjoint; mirrors of BOTH models live off-group-0
    g0, g1 = set(dpt.rep_stage_devices[0]), set(dpt.rep_stage_devices[1])
    assert not (g0 & g1)
    for key in ("t_stage", "s_stage"):
        for i, ptree in enumerate(dpt._rep[0][key]):
            devs = {d for leaf in jax.tree.leaves(ptree)
                    for d in leaf.devices()}
            assert devs == {dpt.rep_stage_devices[1][i]}, key

    # student params match the fused update above the noise floor
    want_g = _grad_mask(variables, u, imgs, masks)
    merged = dpt.merged_student_params()
    checked = 0
    for (kp, a), b, g in zip(
            jax.tree_util.tree_flatten_with_path(
                oracle.student_state.params)[0],
            jax.tree.leaves(merged), jax.tree.leaves(want_g)):
        sel = np.abs(np.asarray(g)) > 1e-6
        checked += int(sel.sum())
        np.testing.assert_allclose(
            np.asarray(a)[sel], np.asarray(b)[sel], rtol=2e-5, atol=2e-6,
            err_msg=f"student param mismatch at {jax.tree_util.keystr(kp)}")
    assert checked > 1000

    with pytest.raises(ValueError, match="divisible"):
        dpt.step(u[:3], imgs, masks, SUP_W, DECAY, micro=1)


def test_ema_pipeline_subprocess():
    """Heavy equivalence + training checks in a fresh interpreter (see
    note at top; helper: tests/_pipeline_ema_main.py)."""
    import os
    import subprocess
    import sys

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_pipeline_ema_main.py")
    proc = subprocess.run([sys.executable, script], env=dict(os.environ),
                          capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    assert "pipeline-ema-ok" in proc.stdout


def test_ema_pipeline_rejects_cls():
    u, imgs, masks, variables = _setup(bu=1, bl=1)
    cfg = TINY.replace(cls_tokens=(1, 1, 1, 1))
    with pytest.raises(NotImplementedError, match="CLS"):
        EmaPipelinedTrainer(cfg, variables, variables,
                            TrainConfig(reference_quirks=False))


def test_ema_pipeline_rejects_quirks():
    """In EMA mode the reference quirk is TRAIN-mode forwards; the
    pipeline runs eval-mode only and must fail fast on a quirks
    TrainConfig (the inverse of PipelinedTrainer's guard)."""
    u, imgs, masks, variables = _setup(bu=1, bl=1)
    with pytest.raises(NotImplementedError, match="quirks"):
        EmaPipelinedTrainer(TINY, variables, variables, TrainConfig())
