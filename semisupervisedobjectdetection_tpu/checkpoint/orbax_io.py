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


def restore_state(path: str, template: TrainState) -> TrainState:
    """Restore into the structure of `template` (which supplies tx/config).

    Partial loads are allowed like the reference's strict=False
    (`segFormer_transfer_learning_main.py:26-27`): missing subtrees keep the
    template's values.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    template_payload = {
        "params": template.params,
        "batch_stats": template.batch_stats,
        "opt_state": template.opt_state,
        "epoch": template.epoch,
    }
    restored = _ckptr().restore(path, item=template_payload)
    return template.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        epoch=restored["epoch"],
    )


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
        if eval_loss >= self.best_loss:
            return None
        self.best_loss = eval_loss
        name = best_checkpoint_name(self.prefix, epoch, train_loss,
                                    eval_loss, fps)
        path = os.path.join(self.directory, name)
        save_state(path, state)
        self.best_path = path
        return path
