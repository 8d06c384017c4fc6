"""Few-shot domain-prompting workloads (`segFormer_fewshot_learning.py`).

Two jitted steps rebuild the two reference training loops:

- `fewshot_ae_step`: the domain-prompt autoencoder (`train_autoencoder`,
  ref `:191-237,240-344`). Per iteration the reference draws one category
  pair from each of two loader groups and performs ONE optimizer step on
  the mean of both pairs' summation losses, where each pair's loss is
    recon_mse + 100*inter + 100*intra
  with recon = reference-MSE of the image against RAW upsampled logits
  (`SegFormerModel.predict` use_loss='mse' passes pre-sigmoid logits,
  `SegFormerModel.py:133`), inter = 0.5+0.5*cos(cls_1, cls_2) and intra =
  0.5-0.5*cos(first_half, second_half) on the final carried CLS token
  (`:219-229`). The forward runs in eval mode — `predict(isEval=False)`
  triggers `model.eval()` (the reference quirk, `SegFormerModel.py:104-105`).

- `fewshot_seg_step`: the supervised per-domain fine-tune (`train`, ref
  `:44-133`): dice loss per category pair, inter/intra terms zeroed in the
  shipped code (`:110-114`) but available via `cls_loss_weight`.

Category sampling (random 2 of N domains, round-robin iterators with
restart — ref `:70-81,193-204`) stays host-side in the workload driver;
the compiled steps take already-assembled batches.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from semisupervisedobjectdetection_tpu.core.config import MiTConfig
from semisupervisedobjectdetection_tpu import losses
from semisupervisedobjectdetection_tpu.train.common import (
    accumulate_microbatches,
    forward_logits,
    forward_masks,
)
from semisupervisedobjectdetection_tpu.train.state import TrainState

Array = jax.Array


def _pair_ae_loss(cfg: MiTConfig, variables: dict, img1: Array,
                  img2: Array,
                  mse_divisor: int = None) -> Tuple[Array, Array, Array,
                                                    Array]:
    """Loss of one category pair for the AE path; returns
    (summation, recon1, recon2, inter). `mse_divisor` overrides the
    reference's B*C MSE divisor — the grad-accumulation path holds it at
    the FULL batch's B*3 so the mean of microbatch recon losses equals
    the full-batch value exactly (same convention as the AE train step,
    `train/autoencoder.py`)."""
    b = img1.shape[0]
    logits1, cls1, _ = forward_logits(cfg, variables, img1,
                                      train_mode=False)
    logits2, cls2, _ = forward_logits(cfg, variables, img2,
                                      train_mode=False)
    div = mse_divisor if mse_divisor is not None else b * 3
    recon1 = losses.mse_loss(img1, logits1, divisor=div)
    recon2 = losses.mse_loss(img2, logits2, divisor=div)
    # The reference forward returns sigmoid(cls_token[-1])
    # (modeling_segformer.py:848-850), so the cosine losses see the
    # activated token, not the raw carried CLS.
    c1 = jax.nn.sigmoid(cls1[-1].astype(jnp.float32))
    c2 = jax.nn.sigmoid(cls2[-1].astype(jnp.float32))
    inter = losses.inter_domain_loss(c1, c2)
    intra1 = losses.intra_domain_loss(c1)
    intra2 = losses.intra_domain_loss(c2)
    sum1 = recon1 + 100.0 * inter + 100.0 * intra1
    sum2 = recon2 + 100.0 * inter + 100.0 * intra2
    return (sum1 + sum2) / 2.0, recon1, recon2, inter


class FewshotAEOut(NamedTuple):
    state: TrainState
    loss: Array
    recon_losses: Array     # (4,) per-category reconstruction losses
    inter_losses: Array     # (2,) per-group inter-domain losses


@functools.partial(jax.jit, static_argnames=("cfg", "accum"),
                   donate_argnames=("state",))
def fewshot_ae_step(state: TrainState, g1_img1: Array, g1_img2: Array,
                    g2_img1: Array, g2_img2: Array,
                    cfg: MiTConfig, accum: int = 1) -> FewshotAEOut:
    """One iteration of the domain-prompt autoencoder: two category pairs
    (one per loader group), combined loss = mean of the two pair losses
    (`segFormer_fewshot_learning.py:268-279`).

    `accum > 1` splits all four category batches into `accum`
    microbatches scanned inside this one jitted update (peak activation
    memory of a single microbatch), grads/losses averaged, ONE optimizer
    step. The recon-MSE term accumulates EXACTLY (its B*3 divisor makes
    the microbatch mean equal the full-batch value); the inter/intra
    cosine terms follow the standard mean-of-microbatch convention (the
    intra loss pairs first/second half WITHIN each microbatch, so
    microbatches must keep >= 2 samples). Forwards are eval-mode (the
    reference quirk), so there are no BN stats to thread."""

    full_b = g1_img1.shape[0]

    def loss_fn(params, a1, a2, b1, b2):
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        s1, r1a, r1b, i1 = _pair_ae_loss(cfg, variables, a1, a2,
                                         mse_divisor=full_b * 3)
        s2, r2a, r2b, i2 = _pair_ae_loss(cfg, variables, b1, b2,
                                         mse_divisor=full_b * 3)
        total = (s1 + s2) / 2.0
        return total, (jnp.stack([r1a, r1b, r2a, r2b]), jnp.stack([i1, i2]))

    if accum <= 1:
        (loss, (recons, inters)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, g1_img1, g1_img2,
                                   g2_img1, g2_img2)
    else:
        b = g1_img1.shape[0]
        if b % accum:
            raise ValueError(f"few-shot batch {b} not divisible by "
                             f"accum={accum}")
        if b // accum < 2:
            raise ValueError(
                f"few-shot AE accum={accum} leaves microbatches of "
                f"{b // accum} < 2 samples — the intra-domain cosine "
                f"loss pairs the first/second half of each microbatch")
        mb = b // accum
        xs = tuple(x.reshape(accum, mb, *x.shape[1:])
                   for x in (g1_img1, g1_img2, g2_img1, g2_img2))

        def micro(stats, a1, a2, b1, b2):
            (total, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, a1, a2, b1, b2)
            return g, None, (total,) + aux, 0.0

        gsum, _, (lsum, rsum, isum), _ = accumulate_microbatches(
            micro, state.params, state.batch_stats,
            (jnp.zeros(()), jnp.zeros((4,)), jnp.zeros((2,))), xs)
        grads = jax.tree.map(lambda g: g / accum, gsum)
        loss = lsum / accum
        recons, inters = rsum / accum, isum / accum
    state = state.apply_gradients(grads, loss)
    return FewshotAEOut(state, loss, recons, inters)


class FewshotSegOut(NamedTuple):
    state: TrainState
    loss: Array
    loss_1: Array
    loss_2: Array
    pred_1: Array


@functools.partial(jax.jit,
                   static_argnames=("cfg", "accum", "cls_loss_weight"),
                   donate_argnames=("state",))
def fewshot_seg_step(state: TrainState, img1: Array, mask1: Array,
                     img2: Array, mask2: Array, cfg: MiTConfig,
                     cls_loss_weight: float = 0.0,
                     accum: int = 1) -> FewshotSegOut:
    """Supervised per-domain step (`segFormer_fewshot_learning.py:88-121`):
    dice per category, mean; optional inter/intra terms (zeroed in the
    shipped reference, `:110-115`) re-enabled with cls_loss_weight > 0,
    reproducing the commented-out formula
    (cat_loss + inter + intra) / 3 at `:98-108`.

    `accum > 1` scans microbatches of both category batches inside this
    one update (mean-of-microbatch convention for the batch-nonlinear
    dice/cosine terms; with cls_loss_weight > 0 microbatches must keep
    >= 2 samples for the intra halves). Eval-mode forwards — no BN stats
    to thread. `cls_loss_weight` is STATIC: it gates a python branch at
    trace time (a traced weight crashed the jit for any explicitly
    passed value — latent bug fixed round 5)."""

    def loss_fn(params, i1, m1, i2, m2):
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        pred1, cls1, _ = forward_masks(cfg, variables, i1,
                                       train_mode=False, want_cls=True)
        pred2, cls2, _ = forward_masks(cfg, variables, i2,
                                       train_mode=False, want_cls=True)
        l1 = losses.dice_loss(pred1, m1)
        l2 = losses.dice_loss(pred2, m2)
        if cls_loss_weight > 0.0:
            # sigmoid first, matching the reference forward's returned token
            # (modeling_segformer.py:848-850).
            c1 = jax.nn.sigmoid(cls1[-1].astype(jnp.float32))
            c2 = jax.nn.sigmoid(cls2[-1].astype(jnp.float32))
            inter = losses.inter_domain_loss(c1, c2)
            s1 = (l1 + cls_loss_weight * inter
                  + cls_loss_weight * losses.intra_domain_loss(c1)) / 3.0
            s2 = (l2 + cls_loss_weight * inter
                  + cls_loss_weight * losses.intra_domain_loss(c2)) / 3.0
        else:
            s1, s2 = l1, l2
        total = (s1 + s2) / 2.0
        return total, (l1, l2, pred1)

    if accum <= 1:
        (loss, (l1, l2, pred1)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, img1, mask1, img2, mask2)
    else:
        b = img1.shape[0]
        if b % accum:
            raise ValueError(f"few-shot batch {b} not divisible by "
                             f"accum={accum}")
        if cls_loss_weight > 0.0 and b // accum < 2:
            raise ValueError(
                f"few-shot seg accum={accum} with cls losses leaves "
                f"microbatches of {b // accum} < 2 samples")
        mb = b // accum
        xs = tuple(x.reshape(accum, mb, *x.shape[1:])
                   for x in (img1, mask1, img2, mask2))

        def micro(stats, i1, m1, i2, m2):
            (total, (l1, l2, pred1)), g = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, i1, m1, i2, m2)
            return g, None, (total, l1, l2), pred1

        gsum, _, (lsum, l1sum, l2sum), preds = accumulate_microbatches(
            micro, state.params, state.batch_stats,
            (jnp.zeros(()), jnp.zeros(()), jnp.zeros(())), xs)
        grads = jax.tree.map(lambda g: g / accum, gsum)
        loss, l1, l2 = lsum / accum, l1sum / accum, l2sum / accum
        pred1 = preds.reshape(b, *preds.shape[2:])
    state = state.apply_gradients(grads, loss)
    return FewshotSegOut(state, loss, l1, l2, pred1)
