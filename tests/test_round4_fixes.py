"""Regression tests for the round-4 review findings:

1. Warm starts (`--pretrain-weight`) must get the reference's transfer
   semantics — weights+BN stats from the checkpoint, FRESH Adam, scheduler
   at epoch 0 (`SegFormerModel.py:21-37` loads the .pth THEN constructs
   Adam + ExponentialLR). restore_state once adopted the checkpoint's
   epoch (which drives `lr = base_lr * gamma^epoch`) and its Adam moments
   unconditionally, silently decaying every warm-started run's lr.
2. BestCheckpointer's `eval_loss >= best` gate saved a NaN epoch as best
   and then poisoned all later comparisons.
3. preemption: a programmatic request_stop() must not make the FIRST real
   signal take the second-signal hard-kill path (which skips the save).
4. DevicePrefetcher item normalization must match between the depth<1
   inline path and the worker path for list/bare-array loader items.
"""

import os
import signal

import jax
import jax.numpy as jnp
import numpy as np

from semisupervisedobjectdetection_tpu.checkpoint.orbax_io import (
    BestCheckpointer,
    restore_state,
    save_state,
)
from semisupervisedobjectdetection_tpu.core.config import (
    TrainConfig,
    mit_b0,
)
from semisupervisedobjectdetection_tpu.models.segformer import SegFormer
from semisupervisedobjectdetection_tpu.train.state import TrainState
from semisupervisedobjectdetection_tpu.utils import preemption

TINY = mit_b0(depths=(1, 1, 1, 1), hidden_sizes=(8, 16, 32, 64),
              num_heads=(1, 2, 4, 8), decoder_hidden=32)


def _tiny_state(seed=0):
    variables = jax.jit(SegFormer(TINY).init)(
        jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3)))
    return TrainState.create(variables, TrainConfig(lr=1e-3, lr_decay=0.9))


def test_warm_start_resets_epoch_and_opt_state(tmp_path):
    state = _tiny_state()
    # simulate a pretrain run that advanced the schedule and Adam moments
    aged = state.replace(
        epoch=jnp.asarray(40.0, jnp.float32),
        opt_state=jax.tree.map(lambda x: x + 1.0, state.opt_state))
    path = str(tmp_path / "ck")
    save_state(path, aged)

    fresh = _tiny_state(seed=7)
    warm = restore_state(path, fresh, load_opt_state=False,
                         load_epoch=False)
    # params come from the checkpoint...
    np.testing.assert_array_equal(
        np.asarray(warm.params["decode_head"]["classifier"]["kernel"]),
        np.asarray(aged.params["decode_head"]["classifier"]["kernel"]))
    # ...but the schedule starts at epoch 0 (full base lr, not gamma^40)
    assert float(warm.epoch) == 0.0
    assert float(warm.lr) == float(fresh.lr)
    # and Adam is fresh, not the pretrain run's moments
    for a, b in zip(jax.tree.leaves(warm.opt_state),
                    jax.tree.leaves(fresh.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # default (resume) semantics are unchanged: full adoption
    resumed = restore_state(path, _tiny_state(seed=7))
    assert float(resumed.epoch) == 40.0


def test_best_checkpointer_never_saves_nan(tmp_path):
    ck = BestCheckpointer(str(tmp_path), "t")
    state = _tiny_state()
    assert ck.maybe_save(state, 0, 0.5, float("nan")) is None
    assert ck.best_loss == float("inf")          # gate not poisoned
    first = ck.maybe_save(state, 1, 0.5, 0.4)
    assert first is not None and ck.best_loss == 0.4
    assert ck.maybe_save(state, 2, 0.5, 0.9) is None   # worse: rejected
    assert ck.maybe_save(state, 3, 0.5, float("nan")) is None
    assert ck.best_loss == 0.4 and ck.best_path == first


def test_request_stop_then_first_signal_stays_graceful():
    """install() + request_stop() + ONE real SIGTERM must leave the
    process alive with the stop flag set (the old handler treated the
    programmatic stop as a first signal and hard-killed on the real
    one, skipping the checkpoint save)."""
    if not preemption.install():
        import pytest

        pytest.skip("not on the main thread")
    try:
        preemption.request_stop()
        os.kill(os.getpid(), signal.SIGTERM)   # would kill pre-fix
        assert preemption.stop_requested()
        assert preemption.signal_name() == "SIGTERM"
    finally:
        preemption.uninstall()
    assert not preemption.stop_requested()


def test_prefetch_normalizes_list_and_bare_items():
    from semisupervisedobjectdetection_tpu.data.prefetch import (
        DevicePrefetcher,
        _as_args,
    )

    # list collate unpacks like a tuple; a bare array is ONE argument
    arr = np.arange(12).reshape(3, 4)
    assert _as_args((arr, None))[1] is None
    assert len(_as_args([arr, arr])) == 2
    assert _as_args(arr) == (arr,)

    def stage(idx, a, b=None):
        return (idx, np.asarray(a).sum(), None if b is None
                else np.asarray(b).sum())

    loader = [[arr, arr + 1], [arr + 2, arr + 3]]   # torch-style lists
    inline = [stage(i, *_as_args(it)) for i, it in enumerate(loader)]
    staged = list(DevicePrefetcher(loader, stage, depth=1))
    assert staged == inline
    bare = [arr, arr + 1]                           # bare-array items
    inline_b = [stage(i, *_as_args(it)) for i, it in enumerate(bare)]
    assert list(DevicePrefetcher(bare, stage, depth=1)) == inline_b
