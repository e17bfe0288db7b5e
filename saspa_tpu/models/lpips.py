"""LPIPS perceptual distance (AlexNet backbone) in Flax.

Optional filter in the reference (lpips.LPIPS(net='alex'),
all_utils/utils.py:270,576-590; disabled in the shipped config).  Weights
port from the lpips package's alexnet + linear heads; random init keeps the
path runnable without them.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# lpips normalization
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)

_ALEX_CHANNELS = (64, 192, 384, 256, 256)


class AlexNetFeatures(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, ...]:
        feats = []
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=2, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        feats.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(nn.Conv(192, (5, 5), padding=2, dtype=self.dtype, name="conv2")(x))
        feats.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(nn.Conv(384, (3, 3), padding=1, dtype=self.dtype, name="conv3")(x))
        feats.append(x)
        x = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="conv4")(x))
        feats.append(x)
        x = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="conv5")(x))
        feats.append(x)
        return tuple(feats)


class LPIPS(nn.Module):
    """lpips(img1, img2): images (B, H, W, 3) in [-1, 1] -> (B,) distances."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x0, x1):
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        net = AlexNetFeatures(self.dtype, name="alex")

        def normed_feats(x):
            x = (x - shift) / scale
            return net(x)

        f0s, f1s = normed_feats(x0), normed_feats(x1)
        total = 0.0
        for i, (f0, f1) in enumerate(zip(f0s, f1s)):
            u0 = f0 / (jnp.linalg.norm(f0, axis=-1, keepdims=True) + 1e-10)
            u1 = f1 / (jnp.linalg.norm(f1, axis=-1, keepdims=True) + 1e-10)
            diff = (u0 - u1) ** 2
            w = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                        kernel_init=nn.initializers.constant(1.0 / _ALEX_CHANNELS[i]),
                        name=f"lin{i}")(diff)
            total = total + jnp.mean(w, axis=(1, 2))[:, 0]
        return total
