"""Subprocess body of
test_trajectory_parity.py::test_supervised_trajectory_b5_dims_slice.

Fresh interpreter (the cache-serializer hazard pattern, CLAUDE.md
round-3): 3 supervised train steps at REAL B5 widths/heads/sr
(hidden (64,128,320,512), heads (1,2,5,8), sr (8,4,2,1), decoder 768;
depths shortened to (2,1,2,1) for CPU time) at 512^2 input, driven
through BOTH stacks from identical imported weights on identical
batches — the dims-dependent complement to the tiny-dims trajectories.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from semisupervisedobjectdetection_tpu.utils.cache import (  # noqa: E402
    setup_compile_cache,
)

setup_compile_cache("/tmp/jax_test_cache_trajb5", min_compile_secs=0.5)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from semisupervisedobjectdetection_tpu.core.config import (  # noqa: E402
    MiTConfig,
    TrainConfig,
)
from semisupervisedobjectdetection_tpu.train.state import (  # noqa: E402
    TrainState,
)
from semisupervisedobjectdetection_tpu.train.supervised import (  # noqa: E402,E501
    eval_step,
    train_step,
)

from _ref_oracle import RefTrainer, build_pair  # noqa: E402

LR, WD, GAMMA = 1e-4, 5e-5, 0.97


def main() -> None:
    import torch

    cfg = MiTConfig(depths=(2, 1, 2, 1),
                    hidden_sizes=(64, 128, 320, 512),
                    num_heads=(1, 2, 5, 8), sr_ratios=(8, 4, 2, 1),
                    decoder_hidden=768, num_labels=1,
                    classifier_dropout=0.0, drop_path_rate=0.0)
    ref, fm, variables = build_pair(cfg, seed=0, init_size=64)
    trainer = RefTrainer(ref, lr=LR, weight_decay=WD, gamma=GAMMA)
    tc = TrainConfig(lr=LR, weight_decay=WD, lr_decay=GAMMA,
                     reference_quirks=True)
    state = TrainState.create(variables, tc)

    rng = np.random.default_rng(11)
    # 2 steps bound the suite cost (torch B5-dims 512^2 fwd+bwd
    # dominates: ~5-10 min/step on a contended 1-vCPU host); a
    # 3-step run measured drifts 6.0e-08 / 1.8e-07 / <1e-3.
    for step in range(int(os.environ.get('TRAJ_B5_STEPS', 2))):
        img = rng.uniform(0, 1, (1, 3, 512, 512)).astype(np.float32)
        mask = (rng.uniform(0, 1, (1, 512, 512)) > 0.6).astype(np.float32)
        ref_loss, _ = trainer.train_one_epoch(torch.tensor(img),
                                              torch.tensor(mask))
        state, loss, _ = train_step(
            state, jnp.asarray(img.transpose(0, 2, 3, 1)),
            jnp.asarray(mask), jax.random.PRNGKey(0), cfg)
        d = abs(ref_loss.item() - float(loss))
        print(f"step {step}: ref {ref_loss.item():.6f} "
              f"ours {float(loss):.6f} drift {d:.2e}", flush=True)
        assert d < 1e-3, f"step {step}: B5-dims loss drift {d:.2e}"
    trainer.scheduler_step()
    state = state.scheduler_step()

    ev_img = rng.uniform(0, 1, (1, 3, 512, 512)).astype(np.float32)
    ev_mask = (rng.uniform(0, 1, (1, 512, 512)) > 0.6).astype(np.float32)
    _, ref_pred = trainer.eval_one_epoch(torch.tensor(ev_img),
                                         torch.tensor(ev_mask))
    _, pred = eval_step(state, jnp.asarray(ev_img.transpose(0, 2, 3, 1)),
                        jnp.asarray(ev_mask), cfg)
    agree = float(np.mean((ref_pred.numpy() >= 0.5)
                          == (np.asarray(pred) >= 0.5)))
    print(f"binarized mask agreement: {agree:.6f}")
    assert agree > 0.999, f"masks agree only {agree:.4%}"
    print("traj-b5-ok")


if __name__ == "__main__":
    main()
