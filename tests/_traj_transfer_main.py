"""Subprocess body: N-step trajectory parity for the PROMPT-TUNING
TRANSFER loop (`segFormer_transfer_learning_main.py:199-206`) —
frozen encoder stages [0,1] + prompt tokens [10,10,10,10] + the standard
supervised Train loop (`:38-106`).

Composes the machinery single-step parity can't: the frozen-block mask x
weight decay x ExponentialLR x untrained-prompt-token quirk interacting
over 10 steps. Runs in a FRESH interpreter (new big jits inside
long-lived xdist workers trip the XLA:CPU compile-cache serializer
SIGSEGV — CLAUDE.md round-3 pattern).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from semisupervisedobjectdetection_tpu.core.config import (  # noqa: E402
    MiTConfig,
    TrainConfig,
)
from semisupervisedobjectdetection_tpu.train import state as state_lib  # noqa: E402
from semisupervisedobjectdetection_tpu.train.state import TrainState  # noqa: E402
from semisupervisedobjectdetection_tpu.train.supervised import (  # noqa: E402
    eval_step,
    train_step,
)
from semisupervisedobjectdetection_tpu.utils.cache import (  # noqa: E402
    setup_compile_cache,
)

from _ref_oracle import (  # noqa: E402
    RefTrainer,
    build_pair,
    freeze_encoder_blocks,
)

setup_compile_cache("/tmp/jax_test_cache_traj", min_compile_secs=0.5)

LR, WD, GAMMA = 1e-4, 5e-5, 0.97
FROZEN = (0, 1)          # ref `:202` best_hyperparameters['frozen']
PROMPT = (10, 10, 10, 10)  # ref `:203-205`


def main() -> None:
    import torch

    cfg = MiTConfig(depths=(2, 2, 2, 2), hidden_sizes=(8, 16, 32, 64),
                    num_heads=(1, 2, 4, 8), sr_ratios=(8, 4, 2, 1),
                    decoder_hidden=32, num_labels=1,
                    classifier_dropout=0.0, drop_path_rate=0.0,
                    prompt_tokens=PROMPT, prompt_per_layer=False)
    ref, fm, variables = build_pair(cfg, prompt=PROMPT, seed=0)
    # Reference order: ctor builds Adam over everything, THEN
    # frozen_encoder flips requires_grad (`:199-205`). torch Adam skips
    # grad-less params (no update, no weight decay), so freezing before
    # the optimizer build is equivalent — and matches RefTrainer's
    # requires_grad filter.
    freeze_encoder_blocks(ref, FROZEN)
    trainer = RefTrainer(ref, lr=LR, weight_decay=WD, gamma=GAMMA)

    tc = TrainConfig(lr=LR, weight_decay=WD, lr_decay=GAMMA,
                     reference_quirks=True)
    mask = state_lib.trainable_mask_from(
        variables["params"],
        state_lib.frozen_stage_predicate(FROZEN, freeze_prompts=True,
                                         freeze_cls=True))
    state = TrainState.create(variables, tc, trainable_mask=mask)
    # (depth, in, out): the scanned stage stacks its layers on axis 0.
    frozen_before = np.asarray(
        variables["params"]["encoder"]["block_0"]["attention"]["query"]
        ["kernel"])
    prompt_before = np.asarray(
        variables["params"]["encoder"]["prompt_tokens_2"])

    rng = np.random.default_rng(3)
    batches = []
    for _ in range(5):
        img = rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
        msk = (rng.uniform(0, 1, (2, 64, 64)) > 0.6).astype(np.float32)
        batches.append((img, msk))
    ev_img = rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    ev_mask = (rng.uniform(0, 1, (2, 64, 64)) > 0.6).astype(np.float32)

    step = 0
    for epoch in range(2):        # 2 epochs x 5 batches = 10 steps
        for img, msk in batches:
            ref_loss, _ = trainer.train_one_epoch(torch.tensor(img),
                                                  torch.tensor(msk))
            state, loss, _ = train_step(
                state, jnp.asarray(img.transpose(0, 2, 3, 1)),
                jnp.asarray(msk), jax.random.PRNGKey(0), cfg)
            step += 1
            d = abs(ref_loss.item() - float(loss))
            print(f"transfer step {step}: ref {ref_loss.item():.6f} "
                  f"ours {float(loss):.6f} drift {d:.2e}", flush=True)
            assert d < 1e-3, f"step {step}: loss drift {d:.2e}"
        trainer.scheduler_step()
        state = state.scheduler_step()

    # Frozen machinery really froze: stage-0 attention weights and the
    # prompt tokens are bit-identical after 10 updates on BOTH sides.
    assert np.array_equal(
        frozen_before,
        np.asarray(state.params["encoder"]["block_0"]["attention"]
                   ["query"]["kernel"])), "frozen stage-0 weights moved"
    t0 = ref.segformer.encoder.block[0][0].attention.self.query.weight
    assert np.array_equal(
        frozen_before[0].T,
        t0.detach().numpy()), "torch frozen stage-0 weights moved"
    assert np.array_equal(
        prompt_before,
        np.asarray(state.params["encoder"]["prompt_tokens_2"])), (
        "prompt tokens trained under reference quirks")

    _, ref_pred = trainer.eval_one_epoch(torch.tensor(ev_img),
                                         torch.tensor(ev_mask))
    _, pred = eval_step(state, jnp.asarray(ev_img.transpose(0, 2, 3, 1)),
                        jnp.asarray(ev_mask), cfg)
    agree = float(np.mean((np.asarray(pred) >= 0.5)
                          == (ref_pred.numpy() >= 0.5)))
    print(f"transfer final mask agreement {agree:.4%}", flush=True)
    assert agree > 0.999, f"binarized masks agree only {agree:.4%}"
    print("traj-transfer-ok")


if __name__ == "__main__":
    main()
