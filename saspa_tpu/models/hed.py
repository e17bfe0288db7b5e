"""HED (Holistically-Nested Edge Detection) in Flax.

The reference's optional second ControlNet conditioner
(HEDdetector.from_pretrained('lllyasviel/ControlNet'), run_aug/run_aug.py:312,
438-439; canny is the paper default :522).  VGG-16 backbone with 5 side
outputs fused by a learned 1x1 conv — weight-convertible from the
ControlNet-annotator checkpoint.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

_VGG_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class HED(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, H, W, 3) float [0,1] RGB -> (B, H, W) edge probability."""
        b, h, w, _ = x.shape
        x = x * 255.0 - jnp.asarray([104.0, 117.0, 123.0])[::-1]  # BGR-mean style norm
        sides = []
        for si, (ch, n_convs) in enumerate(_VGG_STAGES):
            for ci in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name=f"conv{si + 1}_{ci + 1}")(x)
                x = nn.relu(x)
            side = nn.Conv(1, (1, 1), dtype=self.dtype, name=f"score_dsn{si + 1}")(x)
            side = jax.image.resize(side, (b, h, w, 1), method="linear")
            sides.append(side)
            if si < len(_VGG_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        fused = nn.Conv(
            1, (1, 1), use_bias=False, dtype=self.dtype,
            kernel_init=nn.initializers.constant(0.2), name="score_final",
        )(jnp.concatenate(sides, axis=-1))
        return nn.sigmoid(fused[..., 0].astype(jnp.float32))


def hed_control_image(model: HED, variables, images: jax.Array) -> jax.Array:
    """(B, H, W, 3) [0,1] -> (B, H, W, 3) [0,1] ControlNet conditioning."""
    edges = model.apply(variables, images)
    return jnp.repeat(edges[..., None], 3, axis=-1)
