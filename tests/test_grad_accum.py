"""Gradient accumulation (`train/supervised.py::train_step(accum=N)`).

The update with accum=N must equal a hand-accumulated update: mean of the
N microbatch grads (same per-microbatch rng split), one optimizer step.
No reference counterpart (the reference is single-GPU batch-bound); this
is the standard TPU-side lever for effective batches that exceed HBM.
"""

import jax
import jax.numpy as jnp
import numpy as np

from semisupervisedobjectdetection_tpu.core.config import (
    TrainConfig,
    mit_b0,
)
from semisupervisedobjectdetection_tpu.models.segformer import SegFormer
from semisupervisedobjectdetection_tpu import losses
from semisupervisedobjectdetection_tpu.train.common import forward_masks
from semisupervisedobjectdetection_tpu.train.state import TrainState
from semisupervisedobjectdetection_tpu.train.supervised import train_step

TINY = mit_b0(depths=(1, 1, 1, 1), hidden_sizes=(8, 16, 32, 64),
              num_heads=(1, 2, 4, 8), decoder_hidden=32)


def _data(b=4, size=64, seed=0):
    rng = np.random.default_rng(seed)
    imgs = jnp.asarray(rng.uniform(0, 1, (b, size, size, 3)), jnp.float32)
    masks = jnp.asarray(rng.uniform(0, 1, (b, size, size)) > 0.5,
                        jnp.float32)
    return imgs, masks


def _fresh_state(variables, lr=1e-3):
    return TrainState.create(jax.tree.map(jnp.copy, variables),
                             TrainConfig(), lr=lr)


def test_accum_matches_manual_mean_of_microbatch_grads():
    imgs, masks = _data()
    variables = jax.jit(SegFormer(TINY).init)(jax.random.PRNGKey(0),
                                              imgs[:1])
    rng = jax.random.PRNGKey(7)

    # hand-accumulated oracle: mean of the two microbatch grads with the
    # same split keys train_step uses internally
    def loss_fn(params, im, mk, r):
        pred, _, _ = forward_masks(
            TINY, {"params": params,
                   "batch_stats": variables["batch_stats"]},
            im, train_mode=False, rng=r)
        return losses.segmentation_loss(pred, mk, "dice")

    keys = jax.random.split(rng, 2)
    g0 = jax.jit(jax.grad(loss_fn))(variables["params"], imgs[:2],
                                    masks[:2], keys[0])
    g1 = jax.jit(jax.grad(loss_fn))(variables["params"], imgs[2:],
                                    masks[2:], keys[1])
    want = jax.tree.map(lambda a, b: (a + b) / 2.0, g0, g1)

    oracle = _fresh_state(variables)
    oracle = oracle.apply_gradients(want, jnp.zeros(()))

    state = _fresh_state(variables)
    state, loss, pred = train_step(state, imgs, masks, rng, TINY, accum=2)
    assert pred.shape[0] == 4
    assert np.isfinite(float(loss))

    for (kp, a), b in zip(
            jax.tree_util.tree_flatten_with_path(oracle.params)[0],
            jax.tree.leaves(state.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6,
            err_msg=f"param mismatch at {jax.tree_util.keystr(kp)}")


def test_accum_one_unchanged_and_divisibility_guard():
    imgs, masks = _data()
    variables = jax.jit(SegFormer(TINY).init)(jax.random.PRNGKey(0),
                                              imgs[:1])
    rng = jax.random.PRNGKey(3)
    s1 = _fresh_state(variables)
    s1, l1, _ = train_step(s1, imgs, masks, rng, TINY)
    s2 = _fresh_state(variables)
    s2, l2, _ = train_step(s2, imgs, masks, rng, TINY, accum=1)
    assert float(l1) == float(l2)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    import pytest

    s3 = _fresh_state(variables)
    with pytest.raises(ValueError, match="not divisible"):
        train_step(s3, imgs, masks, rng, TINY, accum=3)


def test_accum_batchnorm_stats_thread_sequentially():
    """train_mode=True: the decode-head BN stats must update through the
    scan carry exactly as `accum` sequential forwards would."""
    imgs, masks = _data()
    variables = jax.jit(SegFormer(TINY).init)(jax.random.PRNGKey(0),
                                              imgs[:1])
    rng = jax.random.PRNGKey(5)
    stats = variables["batch_stats"]
    for half_i, half_m, key in zip((imgs[:2], imgs[2:]),
                                   (masks[:2], masks[2:]),
                                   jax.random.split(rng, 2)):
        _, _, stats = forward_masks(
            TINY, {"params": variables["params"], "batch_stats": stats},
            half_i, train_mode=True, rng=key)

    state = _fresh_state(variables)
    state, _, _ = train_step(state, imgs, masks, rng, TINY,
                             train_mode=True, accum=2)
    for (kp, a), b in zip(
            jax.tree_util.tree_flatten_with_path(stats)[0],
            jax.tree.leaves(state.batch_stats)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6,
            err_msg=f"batch_stats mismatch at {jax.tree_util.keystr(kp)}")


def test_ae_accum_matches_manual_sequential_oracle():
    """Autoencoder accumulation (`train/autoencoder.py::ae_train_step`):
    equals the hand-accumulated update — mean of the microbatch grads with
    the FULL batch's reference MSE divisor (B*3) and BN stats threaded
    sequentially (microbatch 2 normalizes with microbatch 1's updated
    stats, exactly as the scan carry does)."""
    from semisupervisedobjectdetection_tpu import losses as L
    from semisupervisedobjectdetection_tpu.train.autoencoder import (
        ae_train_step,
    )

    cfg3 = TINY.replace(num_labels=3)
    imgs, _ = _data(b=4)
    variables = jax.jit(SegFormer(cfg3).init)(jax.random.PRNGKey(0),
                                              imgs[:1])
    rng = jax.random.PRNGKey(11)
    keys = jax.random.split(rng, 2)
    full_div = imgs.shape[0] * 3

    def loss_fn(params, stats, im, r):
        recon, _, new_stats = forward_masks(
            cfg3, {"params": params, "batch_stats": stats},
            im, train_mode=True, rng=r)
        return L.mse_loss(recon, im, divisor=full_div), new_stats

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    (l0, stats), g0 = grad_fn(variables["params"],
                              variables["batch_stats"], imgs[:2], keys[0])
    (l1, stats), g1 = grad_fn(variables["params"], stats, imgs[2:],
                              keys[1])
    want = jax.tree.map(lambda a, b: (a + b) / 2.0, g0, g1)
    oracle = _fresh_state(variables)
    oracle = oracle.apply_gradients(want, jnp.zeros(()))

    state = _fresh_state(variables)
    state, loss, recon = ae_train_step(state, imgs, rng, cfg3, accum=2)
    assert recon.shape[0] == 4
    np.testing.assert_allclose(float(loss), (float(l0) + float(l1)) / 2.0,
                               rtol=1e-5, atol=1e-6)
    # Compare params only where the oracle grad is above the fp noise
    # floor: Adam's first step is ~sign(g), so a mathematically-zero grad
    # (e.g. attention key bias — softmax is invariant to a per-query
    # constant) flips sign on bf16 rounding noise and lands a full
    # lr-scale apart between two compilations of the same math.
    checked = 0
    for (kp, a), b, g in zip(
            jax.tree_util.tree_flatten_with_path(oracle.params)[0],
            jax.tree.leaves(state.params),
            jax.tree.leaves(want)):
        sel = np.abs(np.asarray(g)) > 1e-6
        checked += int(sel.sum())
        np.testing.assert_allclose(
            np.asarray(a)[sel], np.asarray(b)[sel], rtol=2e-5, atol=2e-6,
            err_msg=f"param mismatch at {jax.tree_util.keystr(kp)}")
    assert checked > 1000  # the mask must not trivialize the comparison
    for (kp, a), b in zip(
            jax.tree_util.tree_flatten_with_path(stats)[0],
            jax.tree.leaves(state.batch_stats)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6,
            err_msg=f"batch_stats mismatch at {jax.tree_util.keystr(kp)}")


def test_ema_accum_pseudo_stats_and_student_update():
    """EMA-step accumulation (`train/ema.py::_ema_semi_accum`):

    - phase-A pseudo stats pool exactly (per-sample dice sums and kept
      counts are batch-independent): n_kept and pseudo_loss match the
      accum=1 step, pseudo_mask shape is the full unlabeled batch;
    - the student update equals the hand-accumulated oracle (mean of the
      per-microbatch grads, each with its own microbatch teacher mask),
      compared above the grad noise floor (see the AE test for why).
    """
    from semisupervisedobjectdetection_tpu.train.ema import (
        _teacher_soft_masks,
        ema_semi_step,
    )
    from semisupervisedobjectdetection_tpu.train import pseudo as P

    imgs, masks = _data(b=4)
    u_imgs, _ = _data(b=4, seed=3)
    variables = jax.jit(SegFormer(TINY).init)(jax.random.PRNGKey(0),
                                              imgs[:1])
    sup_w = jnp.asarray(0.8)
    decay = jnp.asarray(0.99)

    def fresh_pair():
        return (_fresh_state(variables), _fresh_state(variables))

    t1, s1 = fresh_pair()
    out1 = ema_semi_step(t1, s1, u_imgs, imgs, masks, sup_w, decay, TINY)
    t2, s2 = fresh_pair()
    out2 = ema_semi_step(t2, s2, u_imgs, imgs, masks, sup_w, decay, TINY,
                         accum=2)

    assert out2.pseudo_mask.shape == out1.pseudo_mask.shape
    np.testing.assert_allclose(float(out2.n_kept), float(out1.n_kept))
    if np.isfinite(float(out1.pseudo_loss)):
        np.testing.assert_allclose(float(out2.pseudo_loss),
                                   float(out1.pseudo_loss),
                                   rtol=1e-4, atol=1e-6)

    # hand-accumulated student oracle (train_mode=False: deterministic)
    t_vars = {"params": variables["params"],
              "batch_stats": variables["batch_stats"]}

    def micro_grad(u_mb, i_mb, g_mb):
        _, l_soft = _teacher_soft_masks(TINY, t_vars, u_mb, i_mb)
        tm = P.denoise_labels(l_soft, g_mb)

        def loss_fn(params):
            pred, _, _ = forward_masks(
                TINY, {"params": params,
                       "batch_stats": variables["batch_stats"]},
                i_mb, train_mode=False)
            return (sup_w * losses.dice_loss(pred, g_mb)
                    + (1.0 - sup_w) * losses.dice_loss(pred, tm))

        return jax.jit(jax.grad(loss_fn))(variables["params"])

    g0 = micro_grad(u_imgs[:2], imgs[:2], masks[:2])
    g1 = micro_grad(u_imgs[2:], imgs[2:], masks[2:])
    want = jax.tree.map(lambda a, b: (a + b) / 2.0, g0, g1)
    oracle = _fresh_state(variables)
    oracle = oracle.apply_gradients(want, jnp.zeros(()))

    checked = 0
    for (kp, a), b, g in zip(
            jax.tree_util.tree_flatten_with_path(oracle.params)[0],
            jax.tree.leaves(out2.student_state.params),
            jax.tree.leaves(want)):
        sel = np.abs(np.asarray(g)) > 1e-6
        checked += int(sel.sum())
        np.testing.assert_allclose(
            np.asarray(a)[sel], np.asarray(b)[sel], rtol=2e-5, atol=2e-6,
            err_msg=f"student param mismatch at {jax.tree_util.keystr(kp)}")
    assert checked > 1000

    # the EMA write composes the (verified) student update with decay
    for (kp, t0), tv, sv in zip(
            jax.tree_util.tree_flatten_with_path(variables["params"])[0],
            jax.tree.leaves(out2.teacher_state.params),
            jax.tree.leaves(out2.student_state.params)):
        wantt = 0.99 * np.asarray(t0) + 0.01 * np.asarray(sv)
        np.testing.assert_allclose(
            np.asarray(tv), wantt, rtol=1e-5, atol=1e-7,
            err_msg=f"teacher EMA mismatch at {jax.tree_util.keystr(kp)}")


def test_ts_pseudo_accum_exact_vs_full_batch():
    """Phase-A accumulation (`train/teacher_student.py::_pseudo_accum`) is
    EXACT: the pseudo loss is (sum of kept per-sample dice)/kept-count, so
    summed microbatch gradients of the undivided dice sum, divided by the
    pooled kept count, equal the full-batch gradient. Verified against
    both the accum=1 step's outputs and a hand-accumulated oracle."""
    from semisupervisedobjectdetection_tpu.train import pseudo as P
    from semisupervisedobjectdetection_tpu.train.teacher_student import (
        pseudo_label_step,
    )

    imgs, _ = _data(b=4)
    variables = jax.jit(SegFormer(TINY).init)(jax.random.PRNGKey(0),
                                              imgs[:1])
    # confident_threshold=0: a fresh model predicts ~0.5 everywhere, so the
    # reference confidence gate would keep nothing and NaN-skip the update
    kw = dict(threshold=0.7, confident_threshold=0.0)

    t1 = _fresh_state(variables)
    out1 = pseudo_label_step(t1, imgs, jnp.asarray(True), TINY, **kw)
    t2 = _fresh_state(variables)
    out2 = pseudo_label_step(t2, imgs, jnp.asarray(True), TINY, **kw,
                             accum=2)

    np.testing.assert_allclose(float(out2.n_kept), float(out1.n_kept))
    np.testing.assert_allclose(float(out2.loss), float(out1.loss),
                               rtol=1e-5, atol=1e-7)
    # binarization at 0.7 can flip isolated boundary pixels between batch
    # tilings; bound the disagreement instead of exact equality
    flips = np.mean(np.asarray(out2.pseudo_mask)
                    != np.asarray(out1.pseudo_mask))
    assert flips < 1e-3, flips
    assert out2.pseudo_mask.shape[0] == 4 and out2.keep.shape == (4,)

    # hand-accumulated oracle: grads of the undivided kept dice sum per
    # microbatch, pooled kept-count division
    def psum_fn(params, im):
        soft, _, _ = forward_masks(
            TINY, {"params": params,
                   "batch_stats": variables["batch_stats"]},
            im, train_mode=False)
        labels = P.threshold_pseudo_masks(soft, 0.7, 0.0)
        return jnp.where(labels.n_kept > 0,
                         labels.loss * labels.n_kept, 0.0), labels.n_kept

    gfn = jax.jit(jax.value_and_grad(psum_fn, has_aux=True))
    (_, k0), g0 = gfn(variables["params"], imgs[:2])
    (_, k1), g1 = gfn(variables["params"], imgs[2:])
    tot = max(float(k0 + k1), 1.0)
    want = jax.tree.map(lambda a, b: (a + b) / tot, g0, g1)
    oracle = _fresh_state(variables)
    oracle = oracle.apply_gradients(want, jnp.zeros(()))

    checked = 0
    for (kp, a), b, g in zip(
            jax.tree_util.tree_flatten_with_path(oracle.params)[0],
            jax.tree.leaves(out2.teacher_state.params),
            jax.tree.leaves(want)):
        sel = np.abs(np.asarray(g)) > 1e-6
        checked += int(sel.sum())
        np.testing.assert_allclose(
            np.asarray(a)[sel], np.asarray(b)[sel], rtol=2e-5, atol=2e-6,
            err_msg=f"teacher param mismatch at {jax.tree_util.keystr(kp)}")
    assert checked > 1000


def test_ts_labeled_accum_matches_manual_oracle():
    """Phase-B accumulation (`train/teacher_student.py::_labeled_accum`):
    BOTH models' updates equal the hand-accumulated oracle — mean of the
    per-microbatch grads, the student's target being each microbatch's
    PRE-update teacher mask (the full-batch step's convention too)."""
    from semisupervisedobjectdetection_tpu.train import pseudo as P
    from semisupervisedobjectdetection_tpu.train.teacher_student import (
        labeled_step,
    )

    imgs, masks = _data(b=4)
    variables = jax.jit(SegFormer(TINY).init)(jax.random.PRNGKey(0),
                                              imgs[:1])
    sup_w = jnp.asarray(0.8)

    def t_grad(im, mk):
        def loss_fn(params):
            pred, _, _ = forward_masks(
                TINY, {"params": params,
                       "batch_stats": variables["batch_stats"]},
                im, train_mode=False)
            mask = P.denoise_labels(jax.lax.stop_gradient(pred), mk)
            return losses.dice_loss(pred, mask), mask

        return jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(
            variables["params"])

    def s_grad(im, mk, teacher_mask):
        def loss_fn(params):
            pred, _, _ = forward_masks(
                TINY, {"params": params,
                       "batch_stats": variables["batch_stats"]},
                im, train_mode=False)
            return (sup_w * losses.dice_loss(pred, mk)
                    + (1.0 - sup_w) * losses.dice_loss(pred, teacher_mask))

        return jax.jit(jax.grad(loss_fn))(variables["params"])

    (tl0, m0), tg0 = t_grad(imgs[:2], masks[:2])
    (tl1, m1), tg1 = t_grad(imgs[2:], masks[2:])
    want_t = jax.tree.map(lambda a, b: (a + b) / 2.0, tg0, tg1)
    sg0 = s_grad(imgs[:2], masks[:2], m0)
    sg1 = s_grad(imgs[2:], masks[2:], m1)
    want_s = jax.tree.map(lambda a, b: (a + b) / 2.0, sg0, sg1)

    oracle_t = _fresh_state(variables)
    oracle_t = oracle_t.apply_gradients(want_t, jnp.zeros(()))
    oracle_s = _fresh_state(variables)
    oracle_s = oracle_s.apply_gradients(want_s, jnp.zeros(()))

    t, s = _fresh_state(variables), _fresh_state(variables)
    out = labeled_step(t, s, imgs, masks, sup_w, TINY, accum=2)
    np.testing.assert_allclose(
        float(out.teacher_loss), (float(tl0) + float(tl1)) / 2.0,
        rtol=1e-5, atol=1e-7)

    for name, oracle, got, wg in (
            ("teacher", oracle_t, out.teacher_state, want_t),
            ("student", oracle_s, out.student_state, want_s)):
        checked = 0
        for (kp, a), b, g in zip(
                jax.tree_util.tree_flatten_with_path(oracle.params)[0],
                jax.tree.leaves(got.params), jax.tree.leaves(wg)):
            sel = np.abs(np.asarray(g)) > 1e-6
            checked += int(sel.sum())
            np.testing.assert_allclose(
                np.asarray(a)[sel], np.asarray(b)[sel],
                rtol=2e-5, atol=2e-6,
                err_msg=f"{name} param mismatch at "
                        f"{jax.tree_util.keystr(kp)}")
        assert checked > 1000, name

    import pytest

    t, s = _fresh_state(variables), _fresh_state(variables)
    with pytest.raises(ValueError, match="not divisible"):
        labeled_step(t, s, imgs, masks, sup_w, TINY, accum=3)


def test_cnn_accum_matches_manual_oracle():
    """CNN-baseline accumulation (`train/baseline_cnn.py::cnn_train_step`
    accum=N): mean of the microbatch grads with BN stats threaded
    sequentially, ONE norm-clipped (35) Adam step."""
    from semisupervisedobjectdetection_tpu.models.cnn import (
        SegmentationCNN,
    )
    from semisupervisedobjectdetection_tpu.train.baseline_cnn import (
        cnn_train_step,
        create_cnn_state,
    )

    arch = "linknet"
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.uniform(0, 1, (4, 56, 56, 3)), jnp.float32)
    masks = jnp.asarray(rng.uniform(0, 1, (4, 56, 56)) > 0.5, jnp.float32)
    tc = TrainConfig(lr=1e-3)

    def fresh():
        return create_cnn_state(arch, tc, jax.random.PRNGKey(0),
                                input_hw=(56, 56))[0]

    model = SegmentationCNN(arch=arch)
    base = fresh()

    def loss_fn(params, stats, im, mk, r):
        logits, mutated = model.apply(
            {"params": params, "batch_stats": stats}, im, train=True,
            mutable=["batch_stats"], rngs={"dropout": r})
        return (losses.dice_loss(jax.nn.sigmoid(logits[..., 0]), mk),
                mutated["batch_stats"])

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    (l0, stats), g0 = grad_fn(base.params, base.batch_stats, imgs[:2],
                              masks[:2], keys[0])
    (l1, stats), g1 = grad_fn(base.params, stats, imgs[2:], masks[2:],
                              keys[1])
    want = jax.tree.map(lambda a, b: (a + b) / 2.0, g0, g1)
    oracle = fresh()
    oracle = oracle.apply_gradients(want, jnp.zeros(()))

    state = fresh()
    state, loss, pred = cnn_train_step(state, imgs, masks,
                                       jax.random.PRNGKey(1), arch,
                                       accum=2)
    assert pred.shape == (4, 56, 56)
    np.testing.assert_allclose(float(loss), (float(l0) + float(l1)) / 2.0,
                               rtol=1e-5, atol=1e-6)
    checked = 0
    # looser than the SegFormer accum tests: clip_by_global_norm(35)
    # rescales EVERY element by a norm whose fp reduce order differs
    # between the scan and the oracle, so tiny relative drift is global
    # (observed max 1.6e-4 rel / 6e-6 abs; a wrong update would be ~lr).
    # The floor is 1e-5 (not 1e-6): Adam's first step is ~sign(g)*lr, and
    # for |g| within ~10x of fp noise the clip+rsqrt pipeline's reduce
    # order alone flips elements past rtol (observed 1.35e-3 rel on a
    # 5.5e-5 update — numerical noise, not a wrong update).
    for (kp, a), b, g in zip(
            jax.tree_util.tree_flatten_with_path(oracle.params)[0],
            jax.tree.leaves(state.params), jax.tree.leaves(want)):
        sel = np.abs(np.asarray(g)) > 1e-5
        checked += int(sel.sum())
        np.testing.assert_allclose(
            np.asarray(a)[sel], np.asarray(b)[sel], rtol=5e-4, atol=2e-5,
            err_msg=f"param mismatch at {jax.tree_util.keystr(kp)}")
    assert checked > 1000
    for (kp, a), b in zip(
            jax.tree_util.tree_flatten_with_path(stats)[0],
            jax.tree.leaves(state.batch_stats)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6,
            err_msg=f"batch_stats mismatch at {jax.tree_util.keystr(kp)}")


def test_vit_steps_accum():
    """ViT pipeline accumulation (`train/vit_seg.py::make_vit_steps`):
    deterministic forwards (no BN/dropout) make accum=N equal the mean of
    microbatch grads; the pseudo step pools kept counts exactly (matches
    accum=1); the ts step's student targets each microbatch's pre-update
    teacher prediction."""
    from semisupervisedobjectdetection_tpu.train.vit_seg import (
        build_vit_seg,
        create_vit_state,
        make_vit_steps,
    )

    rng = np.random.default_rng(4)
    imgs = jnp.asarray(rng.uniform(0, 1, (4, 28, 28, 3)), jnp.float32)
    masks = jnp.asarray(rng.uniform(0, 1, (4, 28, 28)) > 0.5, jnp.float32)
    model = build_vit_seg(img_size=28, patch_size=14, variant="small",
                          depth=1)
    tc = TrainConfig(lr=1e-3)

    def fresh():
        return create_vit_state(model, tc, jax.random.PRNGKey(0),
                                img_size=28)

    seg_train, _, ae_train, pseudo_step, ts_labeled = make_vit_steps(model)
    base = fresh()

    # seg: accum=2 equals the hand-accumulated oracle
    def loss_fn(params, im, mk):
        out, _ = model.apply({"params": params}, im)
        return losses.dice_loss(jax.nn.sigmoid(out[..., 0]), mk)

    g0 = jax.jit(jax.grad(loss_fn))(base.params, imgs[:2], masks[:2])
    g1 = jax.jit(jax.grad(loss_fn))(base.params, imgs[2:], masks[2:])
    want = jax.tree.map(lambda a, b: (a + b) / 2.0, g0, g1)
    oracle = fresh().apply_gradients(want, jnp.zeros(()))
    got, loss, pred = seg_train(fresh(), imgs, masks, accum=2)
    assert pred.shape == (4, 28, 28) and np.isfinite(float(loss))
    checked = 0
    for (kp, a), b, g in zip(
            jax.tree_util.tree_flatten_with_path(oracle.params)[0],
            jax.tree.leaves(got.params), jax.tree.leaves(want)):
        sel = np.abs(np.asarray(g)) > 1e-6
        checked += int(sel.sum())
        np.testing.assert_allclose(
            np.asarray(a)[sel], np.asarray(b)[sel], rtol=2e-5, atol=2e-6,
            err_msg=f"seg param mismatch at {jax.tree_util.keystr(kp)}")
    assert checked > 500

    # pseudo: exact pooled-kept accumulation matches the full-batch step
    s1, l1, lab1 = pseudo_step(fresh(), imgs, jnp.asarray(True))
    s2, l2, lab2 = pseudo_step(fresh(), imgs, jnp.asarray(True), accum=2)
    np.testing.assert_allclose(float(lab2.n_kept), float(lab1.n_kept))
    assert lab2.pseudo_mask.shape == lab1.pseudo_mask.shape
    if np.isfinite(float(l1)):
        np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5,
                                   atol=1e-7)

    # ae + ts: run and shape-check (same _accum_grads machinery as seg)
    cfg3 = build_vit_seg(img_size=28, patch_size=14, variant="small",
                         depth=1, out_chans=3)
    _, _, ae_train3, _, _ = make_vit_steps(cfg3)
    st3 = create_vit_state(cfg3, tc, jax.random.PRNGKey(0), img_size=28)
    st3, ael, recon = ae_train3(st3, imgs, accum=2)
    assert recon.shape[0] == 4 and np.isfinite(float(ael))
    t, s, sl, tl = ts_labeled(fresh(), fresh(), imgs, masks,
                              jnp.asarray(0.8), accum=2)
    assert np.isfinite(float(sl)) and np.isfinite(float(tl))

    import pytest

    with pytest.raises(ValueError, match="not divisible"):
        seg_train(fresh(), imgs, masks, accum=3)


def test_cli_grad_accum_fail_fast():
    """`cli.common.check_grad_accum`: a --grad-accum that cannot divide
    the effective train batch must die at startup with a clear message,
    not as a ValueError mid-trace after a multi-minute B5 compile (the
    tiny-dataset clamp in make_loaders can shrink the batch below the
    requested --batch-size)."""
    import types

    import pytest

    from semisupervisedobjectdetection_tpu.cli import common as c

    def loader(bs, drop_last=True, n=None):
        return types.SimpleNamespace(batch_size=bs, drop_last=drop_last,
                                     num_shards=1,
                                     dataset=list(range(n or bs)))

    args = types.SimpleNamespace(grad_accum=2)
    with pytest.raises(SystemExit, match="does not divide"):
        c.check_grad_accum(args, loader(3))
    with pytest.raises(SystemExit, match="partial final batch"):
        c.check_grad_accum(args, loader(4, drop_last=False, n=6))
    c.check_grad_accum(args, loader(4, n=8))           # divisible: ok
    c.check_grad_accum(types.SimpleNamespace(grad_accum=1), loader(3))
    c.check_grad_accum(args, None)                     # predict mode: ok

    # --parallel dp_pp shards batches dp-ways BEFORE microbatching, so
    # the divisor is dp*accum — and applies even at --grad-accum 1
    # (previously this crashed mid-run in DataParallelPipelinedTrainer).
    # Only the supervised CLI constructs the dp x pp trainer; it passes
    # dp_pp_capable=True. CLIs that fall back to single-device must NOT
    # get the dp factor (a valid accum-only config would be rejected).
    dpp = types.SimpleNamespace(grad_accum=1, parallel="dp_pp", dp=2)
    with pytest.raises(SystemExit, match="dp_pp"):
        c.check_grad_accum(dpp, loader(9), dp_pp_capable=True)
    c.check_grad_accum(dpp, loader(9))                 # fallback CLI: ok
    c.check_grad_accum(dpp, loader(8, n=8), dp_pp_capable=True)
    dpp2 = types.SimpleNamespace(grad_accum=3, parallel="dp_pp", dp=2)
    with pytest.raises(SystemExit, match="does not divide"):
        c.check_grad_accum(dpp2, loader(9), dp_pp_capable=True)  # 9 % 6
    c.check_grad_accum(dpp2, loader(9, n=9))           # fallback: 9 % 3 ok


def test_accum_api_and_cli_flag(tmp_path):
    """--grad-accum threads through SegFormerModel into the jitted step."""
    from semisupervisedobjectdetection_tpu.api import SegFormerModel

    imgs, masks = _data(b=4)
    m = SegFormerModel(config=TINY, grad_accum=2)
    loss, pred = m.train_one_epoch(np.asarray(imgs), np.asarray(masks))
    assert np.isfinite(float(loss)) and pred.shape[0] == 4


def test_fewshot_accum_oracles_subprocess():
    """Few-shot grad-accum oracles + the --grad-accum seg CLI smoke, in a
    FRESH interpreter (tests/_fewshot_accum_main.py): these compile
    several new executables, and new compiles inside long-lived xdist
    workers trip the XLA:CPU compile-cache serializer SIGSEGV — two
    workers died exactly here in the first round-5 full-suite runs
    (CLAUDE.md hazard pattern)."""
    import os
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(__file__),
                          "_fewshot_accum_main.py")
    proc = subprocess.run([sys.executable, script], capture_output=True,
                          text=True, timeout=3000)
    assert proc.returncode == 0, (
        f"fewshot accum body failed:\n{proc.stdout[-3000:]}\n"
        f"{proc.stderr[-3000:]}")
    for marker in ("fewshot-seg-accum-oracle-ok",
                   "fewshot-ae-accum-guards-ok",
                   "fewshot-cli-accum-smoke-ok"):
        assert marker in proc.stdout, marker
