"""Subprocess body for the few-shot grad-accum oracle tests + the
--grad-accum seg CLI smoke.

Fresh interpreter: these compile several NEW executables (fewshot accum
scan jits, the fewshot CLI's steps) and big new compiles inside
long-lived xdist workers trip the XLA:CPU compile-cache serializer
SIGSEGV (CLAUDE.md round-3 pattern; two workers died exactly here in the
first round-5 full-suite runs).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from semisupervisedobjectdetection_tpu.core.config import (  # noqa: E402
    TrainConfig,
    mit_b0,
)
from semisupervisedobjectdetection_tpu.models.segformer import (  # noqa: E402
    SegFormer,
)
from semisupervisedobjectdetection_tpu import losses  # noqa: E402
from semisupervisedobjectdetection_tpu.train.common import (  # noqa: E402
    forward_masks,
)
from semisupervisedobjectdetection_tpu.train.fewshot import (  # noqa: E402
    fewshot_ae_step,
    fewshot_seg_step,
)
from semisupervisedobjectdetection_tpu.train.state import (  # noqa: E402
    TrainState,
)
from semisupervisedobjectdetection_tpu.utils.cache import (  # noqa: E402
    setup_compile_cache,
)

setup_compile_cache("/tmp/jax_test_cache_fewshot", min_compile_secs=0.5)

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


def seg_accum_matches_manual_oracle() -> None:
    """`fewshot_seg_step(accum=2)` == mean of the two microbatch pair
    grads (the loss replicated by hand), ONE optimizer step. Eval-mode
    forwards, so no BN threading — the comparison is tight."""
    cfg = TINY.replace(cls_tokens=(1, 1, 1, 1))
    imgs1, masks1 = _data(4, 64, seed=11)
    imgs2, masks2 = _data(4, 64, seed=12)
    variables = jax.jit(SegFormer(cfg).init)(jax.random.PRNGKey(0),
                                             imgs1[:1])

    def pair_loss(params, i1, m1, i2, m2):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        p1, _, _ = forward_masks(cfg, v, i1, train_mode=False)
        p2, _, _ = forward_masks(cfg, v, i2, train_mode=False)
        return (losses.dice_loss(p1, m1) + losses.dice_loss(p2, m2)) / 2.0

    grad_fn = jax.jit(jax.value_and_grad(pair_loss))
    l0, g0 = grad_fn(variables["params"], imgs1[:2], masks1[:2],
                     imgs2[:2], masks2[:2])
    l1, g1 = grad_fn(variables["params"], imgs1[2:], masks1[2:],
                     imgs2[2:], masks2[2:])
    want = jax.tree.map(lambda a, b: (a + b) / 2.0, g0, g1)
    oracle = _fresh_state(variables)
    oracle = oracle.apply_gradients(want, jnp.zeros(()))

    state = _fresh_state(variables)
    out = fewshot_seg_step(state, imgs1, masks1, imgs2, masks2, cfg,
                           accum=2)
    np.testing.assert_allclose(float(out.loss),
                               (float(l0) + float(l1)) / 2.0,
                               rtol=1e-5, atol=1e-6)
    assert out.pred_1.shape == (4, 64, 64)
    for a, b in zip(jax.tree.leaves(oracle.params),
                    jax.tree.leaves(out.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
    print("fewshot-seg-accum-oracle-ok", flush=True)


def ae_accum_recon_exact_and_guards() -> None:
    """The AE accum path holds the reference MSE divisor at the FULL
    batch's B*3, so the mean of microbatch recon losses equals the
    accum=1 value exactly. Divisibility + microbatch>=2 fail fast."""
    cfg = TINY.replace(cls_tokens=(1, 1, 1, 1), num_labels=3)
    imgs = [_data(4, 64, seed=20 + i)[0] for i in range(4)]
    variables = jax.jit(SegFormer(cfg).init)(jax.random.PRNGKey(0),
                                             imgs[0][:1])

    o1 = fewshot_ae_step(_fresh_state(variables), *imgs, cfg)
    o2 = fewshot_ae_step(_fresh_state(variables), *imgs, cfg, accum=2)
    np.testing.assert_allclose(np.asarray(o2.recon_losses),
                               np.asarray(o1.recon_losses),
                               rtol=1e-5, atol=1e-6)
    assert np.isfinite(float(o2.loss))

    for bad_accum, match in ((3, "not divisible"), (4, "< 2 samples")):
        try:
            fewshot_ae_step(_fresh_state(variables), *imgs, cfg,
                            accum=bad_accum)
        except ValueError as e:
            assert match in str(e), (match, str(e))
        else:
            raise AssertionError(f"accum={bad_accum} did not fail fast")
    cfg1 = TINY.replace(cls_tokens=(1, 1, 1, 1))
    v1 = jax.jit(SegFormer(cfg1).init)(jax.random.PRNGKey(0), imgs[0][:1])
    _, masks = _data(4, 64, seed=30)
    try:
        fewshot_seg_step(_fresh_state(v1), imgs[0], masks, imgs[1], masks,
                         cfg1, 0.5, accum=4)
    except ValueError as e:
        assert "< 2 samples" in str(e)
    else:
        raise AssertionError("seg accum=4 with cls losses did not fail")
    print("fewshot-ae-accum-guards-ok", flush=True)


def seg_cli_grad_accum_smoke() -> None:
    from semisupervisedobjectdetection_tpu.cli import fewshot

    with tempfile.TemporaryDirectory() as td:
        fewshot.main([
            "--synthetic", "--synthetic-n", "6", "--variant", "b0",
            "--img-size", "64", "--batch-size", "2", "--dtype",
            "float32", "--epochs", "1", "--mode", "seg", "--iterations",
            "2", "--grad-accum", "2",
            "--checkpoint-dir", os.path.join(td, "ck")])
    print("fewshot-cli-accum-smoke-ok", flush=True)


if __name__ == "__main__":
    seg_accum_matches_manual_oracle()
    ae_accum_recon_exact_and_guards()
    seg_cli_grad_accum_smoke()
