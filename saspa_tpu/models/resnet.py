"""Flax ResNet backbones (NHWC, TPU-native).

Functional equivalent of the reference's custom torchvision-style ResNet
(fgvc/models/resnet.py): bottleneck v1 with optional CBAM, layer4 at stride 1
by default (overall stride 16 — the reference's universal configuration, see
ResNet docstring), and a `features only` mode that strips avgpool/fc
(fgvc/models/resnet.py:168-178) — WSDAN consumes the (B, H/16, W/16, 2048)
feature map directly.

Convs ride the MXU via XLA; BatchNorm runs in inference stats mode by default
for fine-tuning parity (torch fine-tunes BN too — we expose `use_running_average`
so callers choose; the train loop trains BN like the reference).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    expansion: int = 4
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm
    use_cbam: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = self.conv(self.features, (3, 3), strides=(self.strides, self.strides), padding=1, use_bias=False, name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = self.conv(self.features * self.expansion, (1, 1), use_bias=False, name="conv3")(y)
        y = self.norm(name="bn3")(y)

        if residual.shape != y.shape:
            residual = self.conv(
                self.features * self.expansion, (1, 1), strides=(self.strides, self.strides), use_bias=False, name="downsample_conv"
            )(x)
            residual = self.norm(name="downsample_bn")(residual)

        if self.use_cbam:
            from saspa_tpu.models.blocks import CBAMLayer

            y = CBAMLayer(channel=self.features * self.expansion, name="cbam")(y)

        return nn.relu(y + residual)


class ResNet(nn.Module):
    """ResNet v1. `features_only=True` returns the stage-4 feature map.

    `layer4_stride` mirrors the reference's `stride` ctor arg
    (fgvc/models/resnet.py:108-119): the DEFAULT is 1, i.e. layer4 does NOT
    downsample and the backbone is overall stride 16 — every reference
    WSDAN_CAL (train, baseline checkpoints, filters) runs this way, giving
    feature maps 4x larger than a standard torchvision stride-32 ResNet.
    Verified against the executed reference model in
    tests/test_reference_oracle.py."""

    stage_sizes: Sequence[int]
    num_classes: Optional[int] = None
    features_only: bool = True
    use_cbam: bool = False
    layer4_stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, dtype=self.dtype)
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )

        x = x.astype(self.dtype)
        x = conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False, name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for i, block_count in enumerate(self.stage_sizes):
            for j in range(block_count):
                strides = 2 if i > 0 and j == 0 else 1
                if i == 3 and j == 0:
                    strides = self.layer4_stride
                x = Bottleneck(
                    features=64 * 2**i,
                    strides=strides,
                    conv=conv,
                    norm=norm,
                    use_cbam=self.use_cbam,
                    name=f"layer{i + 1}_{j}",
                )(x)

        if self.features_only:
            return x  # (B, H/16, W/16, 2048) at the default layer4_stride=1

        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)
        return x


def resnet50(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), **kw)


def resnet101(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 23, 3), **kw)


NUM_FEATURES = {"resnet50": 2048, "resnet101": 2048}

BACKBONES: dict[str, Callable[..., ResNet]] = {
    "resnet50": resnet50,
    "resnet101": resnet101,
    "resnet50_cbam": partial(resnet50, use_cbam=True),
    "resnet101_cbam": partial(resnet101, use_cbam=True),
}
