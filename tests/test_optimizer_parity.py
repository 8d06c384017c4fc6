"""Optimizer-chain parity vs torch: the reference's exact update rule is
clip_grad_value_(1.2) -> Adam(lr, weight_decay, betas=(0.5, 0.999))
(`models/SegFormerModel.py:32-37,158-162`). Our optax chain must produce
bitwise-comparable steps for identical params/grads."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from semisupervisedobjectdetection_tpu.core.config import TrainConfig
from semisupervisedobjectdetection_tpu.train.state import (
    TrainState,
    make_transform,
)


def torch_reference_steps(p0, grads_seq, lr, wd, clip):
    import torch

    p = torch.nn.Parameter(torch.tensor(p0.copy()))
    opt = torch.optim.Adam([p], lr=lr, weight_decay=wd, betas=(0.5, 0.999))
    out = []
    for g in grads_seq:
        opt.zero_grad()
        p.grad = torch.tensor(g.copy())
        torch.nn.utils.clip_grad_value_([p], clip)
        opt.step()
        out.append(p.detach().numpy().copy())
    return out


def test_adam_chain_matches_torch():
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(7, 5)).astype(np.float32)
    grads_seq = [rng.normal(size=(7, 5)).astype(np.float32) * 3
                 for _ in range(4)]
    lr, wd, clip = 1e-3, 5e-5, 1.2

    expected = torch_reference_steps(p0, grads_seq, lr, wd, clip)

    tc = TrainConfig(lr=lr, weight_decay=wd, grad_clip_value=clip)
    state = TrainState.create({"params": {"w": jnp.asarray(p0)}}, tc)
    got = []
    for g in grads_seq:
        state = state.apply_gradients({"w": jnp.asarray(g)},
                                      jnp.asarray(0.0))
        got.append(np.asarray(state.params["w"]))

    for a, b in zip(got, expected):
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-5)


def test_lr_schedule_matches_exponential():
    tc = TrainConfig(lr=1e-3, lr_decay=0.97)
    state = TrainState.create({"params": {"w": jnp.zeros(3)}}, tc)
    lrs = []
    for _ in range(3):
        lrs.append(float(state.lr))
        state = state.scheduler_step()
    np.testing.assert_allclose(lrs, [1e-3, 1e-3 * 0.97, 1e-3 * 0.97 ** 2],
                               rtol=1e-6)


def test_value_clip_is_elementwise():
    """clip_grad_value_ clips per element at ±1.2, unlike norm clipping."""
    tc = TrainConfig(lr=1.0, weight_decay=0.0)
    tx = make_transform(tc)
    params = {"w": jnp.zeros(3)}
    opt = tx.init(params)
    g = {"w": jnp.asarray([100.0, -100.0, 0.5])}
    updates, _ = tx.update(g, opt, params)
    u = np.asarray(updates["w"])
    # after clip both big grads become ±1.2 -> same |update| magnitude
    assert abs(abs(u[0]) - abs(u[1])) < 1e-6
