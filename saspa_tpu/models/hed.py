"""HED (Holistically-Nested Edge Detection) in Flax.

The reference's optional second ControlNet conditioner is controlnet_aux's
HEDdetector (run_aug/run_aug.py:20,312,438-439; canny is the paper default
:522), whose network is ControlNetHED_Apache2: a learned per-channel input
offset ("norm"), five VGG-style DoubleConvBlocks each ending in a 1-channel
projection, side outputs resized to the input size, then fused by a plain
MEAN followed by sigmoid — there is no learned fusion conv in this variant
(unlike classic Caffe HED).  Inputs are 0-255 floats, matching the
annotator's preprocessing.

Weights port from the public lllyasviel/Annotators ControlNetHED.pth via
tools/convert_weights.py (kind `hed`); the exact key layout
(norm, blockN.convs.M.{weight,bias}, blockN.projection.{weight,bias}) is
proven offline in tests/test_convert_real_layout.py.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class HED(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, H, W, 3) float [0,1] RGB -> (B, H, W) edge probability."""
        b, h, w, _ = x.shape
        # learned per-channel offset, stored in the checkpoint as (1,3,1,1)
        norm = self.param("norm", nn.initializers.zeros, (1, 1, 1, 3), jnp.float32)
        x = x * 255.0 - norm.astype(x.dtype)
        sides = []
        for si, (ch, n_convs) in enumerate(_STAGES):
            for ci in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name=f"block{si + 1}_conv{ci + 1}")(x)
                x = nn.relu(x)
            side = nn.Conv(1, (1, 1), dtype=self.dtype, name=f"block{si + 1}_projection")(x)
            side = jax.image.resize(side.astype(jnp.float32), (b, h, w, 1), method="linear")
            sides.append(side)
            if si < len(_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # ControlNetHED_Apache2 fusion: mean of the resized side outputs,
        # then sigmoid (controlnet_aux HEDdetector.__call__)
        fused = jnp.mean(jnp.concatenate(sides, axis=-1), axis=-1)
        return nn.sigmoid(fused)


def hed_control_image(model: HED, variables, images: jax.Array) -> jax.Array:
    """(B, H, W, 3) [0,1] -> (B, H, W, 3) [0,1] ControlNet conditioning."""
    edges = model.apply(variables, images)
    return jnp.repeat(edges[..., None], 3, axis=-1)
