"""CNN segmentation baselines, rebuilt in Flax (NHWC, TPU-first).

The reference benchmarks five `segmentation_models_pytorch` architectures —
PAN, PSPNet, LinkNet, Unet++ and DeepLabV3+ — all with a ResNeXt101-32x8d
ImageNet encoder, sigmoid dice loss and grad-norm clip 35
(`main_other/baseline_segmentation.py:86,111,154-171`). This module
provides the same five heads over a shared ResNet/ResNeXt encoder:

- encoder: ResNet-v1 bottleneck trunk with optional grouped convs
  (ResNeXt); stages output strides {4, 8, 16, 32}.
- `unetpp`: Unet++ nested dense skip decoder.
- `deeplabv3p`: ASPP (rates 12/24/36) + low-level fusion decoder.
- `pspnet`: pyramid pooling module (1/2/3/6 bins).
- `linknet`: transposed-conv decoder with additive skips.
- `pan`: Pyramid Attention Network — published FPA pyramid block + GAU
  global-attention upsampling (Li et al. 2018).

ImageNet weights are not bundled (zero-egress build); encoders initialize
randomly, and `checkpoint/resnext_import.py` imports a torchvision-format
ResNeXt checkpoint file (`cli/baseline_cnn.py --encoder-weights`) for the
reference's `encoder_weights='imagenet'` warm start. The decoders follow
the published architectures; where smp has implementation quirks we follow
the paper, noted per class.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class ConvBN(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    groups: int = 1
    dtype: Any = jnp.float32
    use_relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = [(k // 2, k // 2) for k in self.kernel]
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=pad, feature_group_count=self.groups,
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return nn.relu(x) if self.use_relu else x


class Bottleneck(nn.Module):
    """ResNet-v1 bottleneck; groups>1 + width_per_group gives ResNeXt."""

    features: int
    strides: Tuple[int, int] = (1, 1)
    groups: int = 1
    base_width: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.features * (self.base_width / 64.0)) * self.groups
        out = ConvBN(width, (1, 1), dtype=self.dtype)(x, train)
        out = ConvBN(width, (3, 3), strides=self.strides,
                     groups=self.groups, dtype=self.dtype)(out, train)
        out = ConvBN(self.features * 4, (1, 1), dtype=self.dtype,
                     use_relu=False)(out, train)
        if x.shape[-1] != self.features * 4 or self.strides != (1, 1):
            x = ConvBN(self.features * 4, (1, 1), strides=self.strides,
                       dtype=self.dtype, use_relu=False)(x, train)
        return nn.relu(out + x)


class ResNetEncoder(nn.Module):
    """Bottleneck trunk; depths (3,4,23,3) + groups 32 + base_width 8 ==
    ResNeXt101-32x8d, the reference's encoder
    (`baseline_segmentation.py:156`)."""

    depths: Tuple[int, ...] = (3, 4, 23, 3)
    groups: int = 32
    base_width: int = 8
    stem_features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[Array]:
        feats = []
        x = ConvBN(self.stem_features, (7, 7), strides=(2, 2),
                   dtype=self.dtype)(x, train)
        feats.append(x)                              # stride 2
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        f = 64
        for i, depth in enumerate(self.depths):
            for j in range(depth):
                stride = (2, 2) if (j == 0 and i > 0) else (1, 1)
                x = Bottleneck(f, stride, self.groups, self.base_width,
                               self.dtype)(x, train)
            feats.append(x)                          # strides 4,8,16,32
            f *= 2
        return feats


def _resize_to(x: Array, hw: Tuple[int, int]) -> Array:
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, hw[0], hw[1], c), method="bilinear")


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (DeepLabV3+), rates 12/24/36."""

    features: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        branches = [ConvBN(self.features, (1, 1), dtype=self.dtype)(x,
                                                                    train)]
        for rate in (12, 24, 36):
            y = nn.Conv(self.features, (3, 3),
                        kernel_dilation=(rate, rate),
                        padding=[(rate, rate), (rate, rate)],
                        use_bias=False, dtype=self.dtype)(x)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype)(y)
            branches.append(nn.relu(y))
        gp = jnp.mean(x, axis=(1, 2), keepdims=True)
        gp = ConvBN(self.features, (1, 1), dtype=self.dtype)(gp, train)
        branches.append(jnp.broadcast_to(gp, (b, h, w, self.features)))
        y = jnp.concatenate(branches, axis=-1)
        return ConvBN(self.features, (1, 1), dtype=self.dtype)(y, train)


class PPM(nn.Module):
    """Pyramid pooling module (PSPNet), bins 1/2/3/6."""

    features: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        outs = [x]
        for bins in (1, 2, 3, 6):
            y = nn.avg_pool(x, (max(h // bins, 1), max(w // bins, 1)),
                            strides=(max(h // bins, 1), max(w // bins, 1)))
            y = ConvBN(self.features, (1, 1), dtype=self.dtype)(y, train)
            outs.append(_resize_to(y, (h, w)))
        return jnp.concatenate(outs, axis=-1)


class FPA(nn.Module):
    """Feature Pyramid Attention (PAN, Li et al. 2018, §3.1): a U-shaped
    7x7/5x5/3x3 stride-2 pyramid whose fused attention map multiplies the
    1x1-conv'd mid branch, plus a broadcast global-pooling branch."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        gp = jnp.mean(x, axis=(1, 2), keepdims=True)
        gp = ConvBN(self.features, (1, 1), dtype=self.dtype)(gp, train)
        gp = jnp.broadcast_to(gp, (b, h, w, self.features))

        mid = ConvBN(self.features, (1, 1), dtype=self.dtype)(x, train)

        d1 = ConvBN(self.features, (7, 7), strides=(2, 2),
                    dtype=self.dtype)(x, train)
        d2 = ConvBN(self.features, (5, 5), strides=(2, 2),
                    dtype=self.dtype)(d1, train)
        d3 = ConvBN(self.features, (3, 3), strides=(2, 2),
                    dtype=self.dtype)(d2, train)
        c1 = ConvBN(self.features, (7, 7), dtype=self.dtype)(d1, train)
        c2 = ConvBN(self.features, (5, 5), dtype=self.dtype)(d2, train)
        c3 = ConvBN(self.features, (3, 3), dtype=self.dtype)(d3, train)
        u = _resize_to(c3, d2.shape[1:3]) + c2
        u = _resize_to(u, d1.shape[1:3]) + c1
        u = _resize_to(u, (h, w))
        return mid * u + gp


class GAU(nn.Module):
    """Global Attention Upsample (PAN §3.2): the high-level feature's
    global context gates the 3x3-conv'd low-level feature; the gated skip
    adds to the upsampled high-level stream."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, low, y, train: bool = False):
        low2 = ConvBN(self.features, (3, 3), dtype=self.dtype)(low, train)
        att = jnp.mean(y, axis=(1, 2), keepdims=True)
        att = nn.Conv(self.features, (1, 1), use_bias=False,
                      dtype=self.dtype)(att)
        att = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype)(att)
        att = jax.nn.sigmoid(att)
        y_up = _resize_to(y, low.shape[1:3])
        return y_up + low2 * att


class SegmentationCNN(nn.Module):
    """One of the five baseline architectures over the shared encoder."""

    arch: str = "deeplabv3p"     # unetpp|deeplabv3p|pspnet|linknet|pan
    num_labels: int = 1
    encoder_depths: Tuple[int, ...] = (3, 4, 23, 3)
    groups: int = 32
    base_width: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Array:
        in_hw = x.shape[1:3]
        feats = ResNetEncoder(self.encoder_depths, self.groups,
                              self.base_width, dtype=self.dtype,
                              name="encoder")(x, train)
        f2, f4, f8, f16, f32 = feats
        d = self.dtype

        if self.arch == "deeplabv3p":
            y = ASPP(256, d)(f32, train)
            y = _resize_to(y, f4.shape[1:3])
            low = ConvBN(48, (1, 1), dtype=d)(f4, train)
            y = jnp.concatenate([y, low], axis=-1)
            y = ConvBN(256, (3, 3), dtype=d)(y, train)
            y = ConvBN(256, (3, 3), dtype=d)(y, train)
        elif self.arch == "pspnet":
            y = PPM(128, d)(f32, train)
            y = ConvBN(256, (3, 3), dtype=d)(y, train)
        elif self.arch == "unetpp":
            # Nested dense skips X^{i,j}; decoder channels 256..16.
            chans = [256, 128, 64, 32]
            grid = {(0, 0): f4, (1, 0): f8, (2, 0): f16, (3, 0): f32}
            for j in range(1, 4):
                for i in range(4 - j):
                    ups = _resize_to(grid[(i + 1, j - 1)],
                                     grid[(i, 0)].shape[1:3])
                    cat = jnp.concatenate(
                        [grid[(i, k)] for k in range(j)] + [ups], axis=-1)
                    grid[(i, j)] = ConvBN(chans[i], (3, 3), dtype=d)(
                        ConvBN(chans[i], (3, 3), dtype=d)(cat, train),
                        train)
            y = grid[(0, 3)]
        elif self.arch == "linknet":
            y = f32
            for skip, ch in ((f16, 256), (f8, 128), (f4, 64)):
                b_, h_, w_, c_ = y.shape
                y = ConvBN(c_ // 4, (1, 1), dtype=d)(y, train)
                y = nn.ConvTranspose(c_ // 4, (3, 3), strides=(2, 2),
                                     padding="SAME", dtype=d)(y)
                if y.shape[1:3] != skip.shape[1:3]:
                    y = _resize_to(y, skip.shape[1:3])
                y = ConvBN(skip.shape[-1], (1, 1), dtype=d)(y, train)
                y = y + skip
            y = ConvBN(64, (3, 3), dtype=d)(y, train)
        elif self.arch == "pan":
            # Published PAN: FPA on the stride-32 map, then GAU upsampling
            # through the skips (Li et al. 2018; smp's decoder_channels
            # default 32 — `baseline_segmentation.py:154-162` uses smp.PAN
            # defaults).
            dc = 32
            y = FPA(dc, d)(f32, train)
            for skip in (f16, f8, f4):
                y = GAU(dc, d)(skip, y, train)
        else:
            raise ValueError(f"unknown arch: {self.arch}")

        logits = nn.Conv(self.num_labels, (3, 3),
                         padding=[(1, 1), (1, 1)], dtype=d)(y)
        logits = _resize_to(logits.astype(jnp.float32), in_hw)
        return logits


BASELINE_ARCHS = ("pan", "pspnet", "linknet", "unetpp", "deeplabv3p")
