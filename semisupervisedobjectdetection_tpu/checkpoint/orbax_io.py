"""Orbax checkpointing of full train state.

Upgrades the reference's checkpoint story (`torch.save(state_dict)` of
params only, gated on best eval loss, with metric-bearing filenames —
`main_segformer/segFormer_main.py:79-86`): here (params, batch_stats,
opt_state, epoch) are saved together, so resume continues optimization
instead of restarting it (the reference loses optimizer/scheduler state —
SURVEY.md §5 checkpoint row).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from semisupervisedobjectdetection_tpu.train.state import TrainState


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_state(path: str, state: TrainState) -> None:
    """Save (params, batch_stats, opt_state, epoch) to an Orbax dir."""
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "epoch": state.epoch,
    }
    path = os.path.abspath(path)
    _ckptr().save(path, payload, force=True)


def _merge_restore(template_tree, restored_tree, path=()):
    """Overlay restored leaves onto the template wherever path+shape match
    — the reference's strict=False semantics
    (`segFormer_transfer_learning_main.py:26-27`) — with the num_labels
    classifier-slice surgery (`SegFormerModel.py:24-28`): a checkpointed
    multi-channel classifier head restores into a 1-channel model by
    taking output channel 0."""
    if isinstance(template_tree, dict):
        out = {}
        for k, v in template_tree.items():
            if isinstance(restored_tree, dict) and k in restored_tree:
                out[k] = _merge_restore(v, restored_tree[k], path + (k,))
            else:
                out[k] = v
        return out
    t_shape = getattr(template_tree, "shape", None)
    r_shape = getattr(restored_tree, "shape", None)
    if t_shape == r_shape:
        return restored_tree
    if ("classifier" in path and t_shape is not None
            and r_shape is not None and t_shape[-1] == 1
            and len(t_shape) == len(r_shape)
            and t_shape[:-1] == r_shape[:-1]):
        return np.asarray(restored_tree)[..., 0:1]
    return template_tree  # shape mismatch: keep fresh init


def _place_like(template_tree, tree):
    """Re-place restored leaves onto the template leaves' shardings.

    A resumed `--parallel` run restores into FSDP/TP-sharded templates
    (cli/common.setup_parallel runs before the resume load), and the
    checkpoint may have been written under a DIFFERENT placement: a plain
    single-device run preempted then resumed with --parallel fsdp, a
    changed device count, or vice versa. Orbax restores each leaf with the
    sharding recorded in the file and warns that is "unsafe when restoring
    on a different topology" — committing every leaf to the TEMPLATE's
    sharding instead makes the restored state indistinguishable from the
    freshly-sharded one, on any topology. Single-device templates make
    this a plain device placement."""
    def place(t, r):
        if isinstance(t, jax.Array) and getattr(r, "shape", None) == t.shape:
            return jax.device_put(r, t.sharding)
        return jnp_asarray(r)

    return jax.tree.map(place, template_tree, tree)


def restore_state(path: str, template: TrainState,
                  load_opt_state: Optional[bool] = None,
                  load_epoch: bool = True) -> TrainState:
    """Restore into the structure of `template` (which supplies tx/config
    AND the target sharding of every leaf — see `_place_like`).

    Partial/mismatched loads follow the reference's strict=False behavior:
    missing or shape-incompatible leaves keep the template's values, and a
    multi-channel classifier restores into num_labels=1 via channel-0
    slicing. By default the optimizer state is adopted when its structure
    matches and the saved epoch (which drives the exponential lr schedule,
    train/state.py) is restored — the `--resume` semantics. WARM STARTS
    (`--pretrain-weight`) must pass `load_opt_state=False, load_epoch=False`
    to get the reference's transfer semantics instead: params+BN stats from
    the checkpoint, fresh Adam and a scheduler starting at epoch 0
    (`SegFormerModel.py:21-37` loads the state dict, then CONSTRUCTS the
    optimizer and ExponentialLR).
    """
    path = os.path.abspath(path)
    restored = _ckptr().restore(path)

    params = _merge_restore(template.params, restored.get("params", {}))
    batch_stats = _merge_restore(template.batch_stats,
                                 restored.get("batch_stats", {}))

    new = template.replace(
        params=_place_like(template.params, params),
        batch_stats=_place_like(template.batch_stats, batch_stats),
    )
    if load_epoch:
        new = new.replace(epoch=_place_like(
            template.epoch, restored.get("epoch", template.epoch)))
    if load_opt_state is False:
        return new
    try:
        t_leaves = jax.tree.leaves(template.opt_state)
        r_leaves = jax.tree.leaves(restored.get("opt_state"))
        if len(t_leaves) == len(r_leaves) and all(
                getattr(a, "shape", None) == getattr(b, "shape", None)
                for a, b in zip(t_leaves, r_leaves)):
            flat_t = jax.tree_util.tree_structure(template.opt_state)
            new = new.replace(opt_state=_place_like(
                template.opt_state,
                jax.tree_util.tree_unflatten(flat_t, r_leaves)))
    except Exception:
        pass
    return new


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


def best_checkpoint_name(prefix: str, epoch: int, train_loss: float,
                         eval_loss: float, fps: float) -> str:
    """Metric-bearing checkpoint names, like the reference's
    'segFormer_epoch_{e}_train_{t:.3f}_eval_{v:.3f}_fps_{f:.2f}'
    (`segFormer_main.py:85-86`)."""
    return (f"{prefix}_epoch_{epoch}_train_{train_loss:.3f}"
            f"_eval_{eval_loss:.3f}_fps_{fps:.2f}")


class BestCheckpointer:
    """Keep the best-eval-loss checkpoint (ref `segFormer_main.py:79-86`)."""

    def __init__(self, directory: str, prefix: str = "segformer"):
        self.directory = directory
        self.prefix = prefix
        self.best_loss = float(np.inf)
        self.best_path: Optional[str] = None

    def maybe_save(self, state: TrainState, epoch: int, train_loss: float,
                   eval_loss: float, fps: float = 0.0) -> Optional[str]:
        # NaN-robust gate: `not (x < best)` rejects NaN, where the naive
        # `x >= best` would save a NaN epoch as "best" and then poison
        # every later comparison (anything >= NaN is False)
        if not (eval_loss < self.best_loss):
            return None
        self.best_loss = eval_loss
        name = best_checkpoint_name(self.prefix, epoch, train_loss,
                                    eval_loss, fps)
        path = os.path.join(self.directory, name)
        save_state(path, state)
        self.best_path = path
        return path


def save_last(directory: str, prefix: str, state: TrainState, epoch: int,
              best_loss: float = float("inf")) -> str:
    """Overwrite `{directory}/{prefix}_last` with the full train state plus
    a JSON sidecar `(epoch, best_loss)` — the crash/preemption-resume
    artifact. The reference keeps only best-eval checkpoints and always
    restarts optimization at epoch 0 (`segFormer_main.py:79-86`, SURVEY.md
    §5 checkpoint row); `_last` lets `--resume` continue mid-run with
    optimizer/scheduler state and the best-gate intact."""
    import json

    path = os.path.join(os.path.abspath(directory), f"{prefix}_last")
    save_state(path, state)
    with open(path + ".meta.json", "w") as f:
        json.dump({"epoch": int(epoch), "best_loss": float(best_loss)}, f)
    return path


class _AsyncSaver:
    """Background `save_last` writer: overlaps the device→host transfer +
    disk write of the per-epoch resume checkpoint with the next epoch's
    compute (at B5 scale the synchronous write costs seconds per epoch —
    mostly d2h through the tunnel).

    Donation safety: `submit` snapshots the state with a device-side
    `jnp.copy` BEFORE returning — the caller's buffers are donated by the
    next train step while the worker is still reading, so saving the
    original arrays would read deleted buffers. The copy is an on-device
    HBM→HBM transfer (fast, dispatched async); only the snapshot crosses
    to host on the worker thread.

    Saves coalesce per (directory, prefix): if epoch N's write is still
    running when epoch N+1 ends, the queued-but-unstarted N write is
    replaced — `_last` semantics only need the newest state. `wait()`
    blocks until everything queued/running has landed (call before
    process exit and before a preemption save to the same path)."""

    def __init__(self):
        import threading

        self._jobs: dict = {}          # (dir, prefix) -> job tuple
        self._cv = threading.Condition()
        self._busy = 0
        self._started = False

    def _run(self) -> None:
        while True:
            with self._cv:
                while not self._jobs:
                    self._cv.wait()
                key = next(iter(self._jobs))
                job = self._jobs.pop(key)
                self._busy += 1
            try:
                save_last(*job)
            except Exception as e:  # surface, don't kill the worker
                print(f"WARNING: async checkpoint save of "
                      f"{key[1]}_last failed: {type(e).__name__}: {e}",
                      flush=True)
            finally:
                with self._cv:
                    self._busy -= 1
                    self._cv.notify_all()

    def submit(self, directory: str, prefix: str, state: TrainState,
               epoch: int, best_loss: float = float("inf")) -> None:
        import threading

        import jax
        import jax.numpy as jnp

        snap = jax.tree.map(jnp.copy, state)
        with self._cv:
            if not self._started:
                t = threading.Thread(target=self._run, daemon=True,
                                     name="sso-async-ckpt")
                t.start()
                self._started = True
            self._jobs[(directory, prefix)] = (
                directory, prefix, snap, epoch, best_loss)
            self._cv.notify_all()

    def wait(self) -> None:
        with self._cv:
            while self._jobs or self._busy:
                self._cv.wait()


_ASYNC = _AsyncSaver()


def save_last_async(directory: str, prefix: str, state: TrainState,
                    epoch: int, best_loss: float = float("inf")) -> None:
    """`save_last` on a background thread (see _AsyncSaver). The write is
    durable only after `wait_pending_saves()`; training loops call that at
    loop end and before any preemption save."""
    _ASYNC.submit(directory, prefix, state, epoch, best_loss)


def wait_pending_saves() -> None:
    """Block until every `save_last_async` has landed on disk."""
    _ASYNC.wait()


def load_last(directory: str, prefix: str, template: TrainState):
    """Restore `{prefix}_last` if present: returns
    (state, next_epoch, best_loss) or None. `next_epoch` is the epoch to
    START at (saved epoch + 1); `best_loss` re-arms the best-checkpoint
    gate so a resumed run cannot overwrite a better pre-crash best."""
    import json

    path = os.path.join(os.path.abspath(directory), f"{prefix}_last")
    if not os.path.isdir(path):
        return None
    state = restore_state(path, template)
    meta = {"epoch": -1, "best_loss": float("inf")}
    try:
        with open(path + ".meta.json") as f:
            meta.update(json.load(f))
    except (OSError, ValueError):
        pass
    return state, int(meta["epoch"]) + 1, float(meta["best_loss"])
