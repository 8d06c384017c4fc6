"""Train state + optimizer matching the reference's optimization semantics.

Reference optimizer (`models/SegFormerModel.py:32-37,158-165`):
  Adam(lr, weight_decay, betas=(0.5, 0.999)) over params with
  requires_grad=True, ExponentialLR(gamma) stepped once per epoch,
  gradient-VALUE clip at 1.2 applied before the step, and backward skipped
  entirely when the loss is NaN (`:160` — in torch 2.0 zero_grad leaves
  grads as None, so a NaN loss makes optimizer.step() a no-op).

The optax chain reproduces torch-Adam ordering exactly: clip(grad) ->
add L2 (torch Adam weight_decay folds wd*p into the gradient) ->
scale_by_adam(b1=0.5) -> -lr. The epoch-indexed exponential learning rate
lives in the TrainState (`epoch` field) so `scheduler_step()` is a pure
state update, and the whole update is a single jittable function.

Frozen parameters (frozen encoder stages — `SegFormerModel.frozen_encoder`,
`:46-63` — and, in reference-quirks mode, prompt/CLS tokens) are masked out
of the transform with `optax.masked`, which also skips their Adam moments —
matching torch's "not in the optimizer" semantics including no weight decay.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from semisupervisedobjectdetection_tpu.core.config import TrainConfig


_TRANSFORM_CACHE: dict = {}


def make_transform(tc: TrainConfig, trainable_mask=None
                   ) -> optax.GradientTransformation:
    """Gradient transform WITHOUT the learning rate (applied separately so
    the per-epoch exponential decay stays a TrainState scalar).

    Memoized on the optimizer constants (+ mask structure): `tx` is a static
    field of TrainState, and a fresh closure per `TrainState.create` would
    re-trace every jitted step — tune loops (`cli/* --tune`) would recompile
    each grid point (~200s per B5 compile on TPU).
    """
    key = (tc.grad_clip_value, tc.weight_decay, tc.adam_b1, tc.adam_b2)
    if trainable_mask is not None:
        flat, treedef = jax.tree_util.tree_flatten(trainable_mask)
        key = key + (tuple(flat), treedef)
    tx = _TRANSFORM_CACHE.get(key)
    if tx is None:
        tx = optax.chain(
            optax.clip(tc.grad_clip_value),
            optax.add_decayed_weights(tc.weight_decay),
            optax.scale_by_adam(b1=tc.adam_b1, b2=tc.adam_b2),
            optax.scale(-1.0),
        )
        if trainable_mask is not None:
            tx = optax.masked(tx, trainable_mask)
        _TRANSFORM_CACHE[key] = tx
    return tx


class TrainState(struct.PyTreeNode):
    """Functional train state for one model (params + BN stats + opt)."""

    params: Any
    batch_stats: Any
    opt_state: Any
    epoch: jax.Array                       # f32 scalar, drives lr decay
    # base_lr / lr_decay are TRACED leaves, not static fields: tune grids
    # (`cli/* --tune`) sweep lr, and a static lr would re-jit every step
    # per grid point (~200s per B5 compile on TPU).
    base_lr: jax.Array
    lr_decay: jax.Array
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    trainable_mask: Any = struct.field(pytree_node=False, default=None)

    @property
    def lr(self) -> jax.Array:
        return self.base_lr * jnp.power(self.lr_decay, self.epoch)

    @classmethod
    def create(cls, variables, tc: TrainConfig, lr: Optional[float] = None,
               trainable_mask=None) -> "TrainState":
        # Copy leaves: train steps donate their TrainState, and two states
        # built from the same `variables` (e.g. teacher+student warm-started
        # from one checkpoint, `segFormer_semi_teacherstudent_main.py:66-67`)
        # must not alias buffers or the first donated step would delete the
        # other state's params.
        params = jax.tree.map(jnp.array, variables["params"])
        batch_stats = jax.tree.map(jnp.array, variables.get("batch_stats",
                                                            {}))
        tx = make_transform(tc, trainable_mask)
        return cls(
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            epoch=jnp.zeros((), jnp.float32),
            base_lr=jnp.asarray(lr if lr is not None else tc.lr,
                                jnp.float32),
            lr_decay=jnp.asarray(tc.lr_decay, jnp.float32),
            tx=tx,
            trainable_mask=trainable_mask,
        )

    def apply_gradients(self, grads, loss: jax.Array,
                        enable=None) -> "TrainState":
        """One optimizer step with the reference's NaN-skip semantics:
        if the loss is non-finite the whole update is a no-op
        (`models/SegFormerModel.py:160`). `enable` (traced bool) gates the
        update entirely — used for conditional teacher updates
        (`segFormer_semi_teacherstudent_main.py:89-90`)."""
        if self.trainable_mask is not None:
            grads = jax.tree.map(
                lambda g, m: jnp.where(m, g, 0.0), grads,
                self.trainable_mask)

        def do_update(operand):
            params, opt_state, g = operand
            updates, new_opt = self.tx.update(g, opt_state, params)
            updates = jax.tree.map(lambda u: self.lr * u, updates)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_opt

        def skip(operand):
            params, opt_state, _ = operand
            return params, opt_state

        pred = jnp.isfinite(loss)
        if enable is not None:
            pred = jnp.logical_and(pred, enable)
        new_params, new_opt = jax.lax.cond(
            pred, do_update, skip,
            (self.params, self.opt_state, grads))
        return self.replace(params=new_params, opt_state=new_opt)

    def scheduler_step(self) -> "TrainState":
        """Per-epoch ExponentialLR step (`SegFormerModel.py:164-165`)."""
        return self.replace(epoch=self.epoch + 1.0)

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def trainable_mask_from(params, frozen_predicate: Callable[[tuple], bool]):
    """Build a bool pytree: False where `frozen_predicate(path)` is True.

    `path` is a tuple of str keys into the nested params dict, e.g.
    ('encoder', 'block_0', 'attention', 'query', 'kernel').
    Generalizes the reference's `frozen_encoder(layers_num/layers)` and the
    untrained-prompt-token quirk (SURVEY.md §2.4).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_keys(kp):
        out = []
        for k in kp:
            if hasattr(k, "key"):
                out.append(str(k.key))
            elif hasattr(k, "idx"):
                out.append(str(k.idx))
            else:
                out.append(str(k))
        return tuple(out)

    mask_flat = [not frozen_predicate(path_keys(kp)) for kp, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, mask_flat)


def frozen_stage_predicate(frozen_stages, freeze_prompts: bool = False,
                           freeze_cls: bool = False):
    """Predicate for `trainable_mask_from` freezing encoder stages.

    `frozen_stages`: iterable of stage indices whose transformer blocks are
    frozen (ref `frozen_encoder(layers=[...])`, `SegFormerModel.py:56-59`;
    NOTE the reference freezes only `encoder.block[i]`, not the stage's
    patch embedding or final layer norm — reproduced here).
    `freeze_prompts`/`freeze_cls` reproduce the reference quirk of prompt/CLS
    tokens being invisible to the optimizer (SURVEY.md §2.4).
    """
    frozen = set(int(i) for i in frozen_stages)

    def predicate(path) -> bool:
        for part in path:
            if part.startswith("prompt_tokens_") and freeze_prompts:
                return True
            if part.startswith("cls_token_") and freeze_cls:
                return True
            if part.startswith("block_"):
                try:
                    if int(part.split("_")[1]) in frozen:
                        return True
                except ValueError:
                    pass
        return False

    return predicate
