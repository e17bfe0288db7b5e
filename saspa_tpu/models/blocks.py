"""Attention blocks: CBAM + SPP (reference: fgvc/models/blocks.py:14,50).

Unused in the shipped default path (resnet without CBAM), but exposed because
the reference exposes CBAM backbones (fgvc/models/resnet.py:231-255)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class CBAMLayer(nn.Module):
    channel: int
    reduction: int = 16
    spatial_kernel: int = 7

    @nn.compact
    def __call__(self, x):
        # channel attention: shared MLP over max- and avg-pooled descriptors
        max_pool = jnp.max(x, axis=(1, 2), keepdims=True)
        avg_pool = jnp.mean(x, axis=(1, 2), keepdims=True)
        mlp = nn.Sequential(
            [
                nn.Conv(self.channel // self.reduction, (1, 1), use_bias=False, name="mlp_down"),
                nn.relu,
                nn.Conv(self.channel, (1, 1), use_bias=False, name="mlp_up"),
            ]
        )
        channel_att = nn.sigmoid(mlp(max_pool) + mlp(avg_pool))
        x = x * channel_att

        # spatial attention over channel-pooled maps
        max_sp = jnp.max(x, axis=-1, keepdims=True)
        avg_sp = jnp.mean(x, axis=-1, keepdims=True)
        sp = jnp.concatenate([max_sp, avg_sp], axis=-1)
        k = self.spatial_kernel
        spatial_att = nn.sigmoid(
            nn.Conv(1, (k, k), padding=(k - 1) // 2, use_bias=False, name="spatial_conv")(sp)
        )
        return x * spatial_att


class SPPLayer(nn.Module):
    """Spatial pyramid pooling producing a fixed-length vector."""

    num_levels: int = 3

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        feats = []
        for level in range(1, self.num_levels + 1):
            kh, kw = -(-h // level), -(-w // level)
            pooled = nn.max_pool(x, (kh, kw), strides=(kh, kw))
            feats.append(pooled.reshape(b, -1))
        return jnp.concatenate(feats, axis=-1)
