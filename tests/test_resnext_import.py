"""ResNeXt ImageNet-weight import parity: a torch bottleneck trunk in
torchvision's exact key layout (independent oracle; torchvision itself is
not installed) is imported via `checkpoint.resnext_import` and our Flax
`ResNetEncoder` must reproduce its per-stage features. Covers the CNN
baselines' `encoder_weights='imagenet'` warm start
(`main_other/baseline_segmentation.py:154-162`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semisupervisedobjectdetection_tpu.checkpoint.resnext_import import (
    import_resnext_state_dict,
)
from semisupervisedobjectdetection_tpu.models.cnn import ResNetEncoder

DEPTHS, GROUPS, BASE_W = (1, 1, 1, 1), 2, 8


def build_torch_trunk():
    """Bottleneck trunk with torchvision's module names/state_dict keys."""
    import torch
    from torch import nn

    class Bottleneck(nn.Module):
        def __init__(self, inp, planes, stride, groups, base_width):
            super().__init__()
            width = int(planes * (base_width / 64.0)) * groups
            self.conv1 = nn.Conv2d(inp, width, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(width)
            self.conv2 = nn.Conv2d(width, width, 3, stride, 1,
                                   groups=groups, bias=False)
            self.bn2 = nn.BatchNorm2d(width)
            self.conv3 = nn.Conv2d(width, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.relu = nn.ReLU()
            if stride != 1 or inp != planes * 4:
                self.downsample = nn.Sequential(
                    nn.Conv2d(inp, planes * 4, 1, stride, bias=False),
                    nn.BatchNorm2d(planes * 4))
            else:
                self.downsample = None

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return self.relu(y + idt)

    class Trunk(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU()
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            inp, f = 64, 64
            for s, depth in enumerate(DEPTHS, start=1):
                blocks = []
                for j in range(depth):
                    stride = 2 if (j == 0 and s > 1) else 1
                    blocks.append(Bottleneck(inp, f, stride, GROUPS,
                                             BASE_W))
                    inp = f * 4
                setattr(self, f"layer{s}", nn.Sequential(*blocks))
                f *= 2

        def forward(self, x):
            feats = []
            x = self.relu(self.bn1(self.conv1(x)))
            feats.append(x)
            x = self.maxpool(x)
            for s in range(1, 5):
                x = getattr(self, f"layer{s}")(x)
                feats.append(x)
            return feats

    torch.manual_seed(0)
    trunk = Trunk()
    # populate non-trivial BN running stats with one train-mode pass
    trunk.train()
    with torch.no_grad():
        trunk(torch.randn(2, 3, 64, 64))
    return trunk.eval()


def test_encoder_features_match_torch():
    import torch

    trunk = build_torch_trunk()
    x = np.random.default_rng(0).uniform(-1, 1, (2, 3, 64, 64)) \
        .astype(np.float32)
    with torch.no_grad():
        want = [f.numpy() for f in trunk(torch.tensor(x))]

    enc = ResNetEncoder(depths=DEPTHS, groups=GROUPS, base_width=BASE_W)
    xn = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = jax.jit(enc.init)(jax.random.PRNGKey(0), xn)
    params, stats = import_resnext_state_dict(
        trunk.state_dict(), variables["params"], variables["batch_stats"],
        depths=DEPTHS)
    feats = jax.jit(enc.apply)({"params": params, "batch_stats": stats}, xn)
    assert len(feats) == len(want)
    for got, w in zip(feats, want):
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), w,
                                   atol=2e-4, rtol=1e-3)


def test_depth_mismatch_raises():
    enc = ResNetEncoder(depths=(1, 1, 1, 1), groups=GROUPS,
                        base_width=BASE_W)
    variables = jax.jit(enc.init)(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 64, 64, 3)))
    trunk = build_torch_trunk()
    with pytest.raises(ValueError, match="depths mismatch"):
        import_resnext_state_dict(trunk.state_dict(), variables["params"],
                                  variables["batch_stats"],
                                  depths=(2, 2, 2, 2))
