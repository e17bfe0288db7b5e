"""Inception-v3 backbone in Flax with the WS-DAN truncation points.

Reference: fgvc/models/inception.py — standard Inception3 exposing
get_features_mixed_6e (num_features 768) and get_features_mixed_7c (2048)
(fgvc/models/inception.py:130-170); selected by net='inception_mixed_6e' /
'inception_mixed_7c' in WSDAN_CAL (fgvc/models/cal.py:140-147).  The shipped
configs use resnet only, so this is the optional backbone.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class BasicConv2d(nn.Module):
    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.features, self.kernel, strides=self.strides, padding=self.padding, use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        b1 = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch1x1")(x, train)
        b5 = BasicConv2d(48, (1, 1), dtype=self.dtype, name="branch5x5_1")(x, train)
        b5 = BasicConv2d(64, (5, 5), padding=2, dtype=self.dtype, name="branch5x5_2")(b5, train)
        b3 = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x, train)
        b3 = BasicConv2d(96, (3, 3), padding=1, dtype=self.dtype, name="branch3x3dbl_2")(b3, train)
        b3 = BasicConv2d(96, (3, 3), padding=1, dtype=self.dtype, name="branch3x3dbl_3")(b3, train)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=self.dtype, name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), dtype=self.dtype, name="branch3x3")(x, train)
        bd = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x, train)
        bd = BasicConv2d(96, (3, 3), padding=1, dtype=self.dtype, name="branch3x3dbl_2")(bd, train)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), dtype=self.dtype, name="branch3x3dbl_3")(bd, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch1x1")(x, train)
        b7 = BasicConv2d(c7, (1, 1), dtype=self.dtype, name="branch7x7_1")(x, train)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype, name="branch7x7_2")(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype, name="branch7x7_3")(b7, train)
        bd = BasicConv2d(c7, (1, 1), dtype=self.dtype, name="branch7x7dbl_1")(x, train)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype, name="branch7x7dbl_2")(bd, train)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype, name="branch7x7dbl_3")(bd, train)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype, name="branch7x7dbl_4")(bd, train)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype, name="branch7x7dbl_5")(bd, train)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        b3 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch3x3_1")(x, train)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), dtype=self.dtype, name="branch3x3_2")(b3, train)
        b7 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch7x7x3_1")(x, train)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype, name="branch7x7x3_2")(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype, name="branch7x7x3_3")(b7, train)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), dtype=self.dtype, name="branch7x7x3_4")(b7, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        b1 = BasicConv2d(320, (1, 1), dtype=self.dtype, name="branch1x1")(x, train)
        b3 = BasicConv2d(384, (1, 1), dtype=self.dtype, name="branch3x3_1")(x, train)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), dtype=self.dtype, name="branch3x3_2a")(b3, train)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype, name="branch3x3_2b")(b3, train)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x, train)
        bd = BasicConv2d(384, (3, 3), padding=1, dtype=self.dtype, name="branch3x3dbl_2")(bd, train)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), dtype=self.dtype, name="branch3x3dbl_3a")(bd, train)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype, name="branch3x3dbl_3b")(bd, train)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """Feature extractor truncated at mixed_6e (768ch) or mixed_7c (2048ch)."""

    truncate_at: str = "mixed_6e"  # mixed_6e | mixed_7c
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = BasicConv2d(32, (3, 3), strides=(2, 2), dtype=d, name="Conv2d_1a_3x3")(x, train)
        x = BasicConv2d(32, (3, 3), dtype=d, name="Conv2d_2a_3x3")(x, train)
        x = BasicConv2d(64, (3, 3), padding=1, dtype=d, name="Conv2d_2b_3x3")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1), dtype=d, name="Conv2d_3b_1x1")(x, train)
        x = BasicConv2d(192, (3, 3), dtype=d, name="Conv2d_4a_3x3")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, d, name="Mixed_5b")(x, train)
        x = InceptionA(64, d, name="Mixed_5c")(x, train)
        x = InceptionA(64, d, name="Mixed_5d")(x, train)
        x = InceptionB(d, name="Mixed_6a")(x, train)
        x = InceptionC(128, d, name="Mixed_6b")(x, train)
        x = InceptionC(160, d, name="Mixed_6c")(x, train)
        x = InceptionC(160, d, name="Mixed_6d")(x, train)
        x = InceptionC(192, d, name="Mixed_6e")(x, train)
        if self.truncate_at == "mixed_6e":
            return x  # (B, H/16, W/16, 768)
        x = InceptionD(d, name="Mixed_7a")(x, train)
        x = InceptionE(d, name="Mixed_7b")(x, train)
        x = InceptionE(d, name="Mixed_7c")(x, train)
        return x  # (B, H/32, W/32, 2048)


NUM_FEATURES_INCEPTION = {"inception_mixed_6e": 768, "inception_mixed_7c": 2048}
