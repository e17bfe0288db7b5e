"""WS-DAN attention crop / attention drop under XLA static shapes.

The reference loops over the batch in Python, extracts a data-dependent bbox
with torch.nonzero, and crop-resizes each sample (fgvc/util.py:209-249) — a
host-sync per sample.  Here the bbox comes from masked min/max reductions and
the crop-resize is a fixed-output-shape bilinear gather under vmap: one fused
XLA program, no host round-trips, fully differentiable-free (used under
stop_gradient like the reference's torch.no_grad).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple, Union

import jax
import jax.numpy as jnp


def _upsample_bilinear(attn: jax.Array, h: int, w: int) -> jax.Array:
    """(B, ah, aw) -> (B, h, w) bilinear."""
    return jax.image.resize(attn, (attn.shape[0], h, w), method="linear")


def _theta(key, theta: Union[float, Tuple[float, float]], batch: int, dtype):
    if isinstance(theta, tuple):
        lo, hi = theta
        return jax.random.uniform(key, (batch,), dtype, lo, hi)
    return jnp.full((batch,), theta, dtype)


def _bbox_from_mask(mask: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """mask: (H, W) bool -> (ymin, ymax, xmin, xmax) inclusive-exclusive floats.

    Equivalent to torch.nonzero(...).min()/.max() in the reference; empty masks
    cannot happen (the max-attention pixel always satisfies >= theta*max)."""
    h, w = mask.shape
    rows = jnp.any(mask, axis=1)
    cols = jnp.any(mask, axis=0)
    ridx = jnp.arange(h)
    cidx = jnp.arange(w)
    ymin = jnp.min(jnp.where(rows, ridx, h))
    ymax = jnp.max(jnp.where(rows, ridx, -1)) + 1
    xmin = jnp.min(jnp.where(cols, cidx, w))
    xmax = jnp.max(jnp.where(cols, cidx, -1)) + 1
    return ymin.astype(jnp.float32), ymax.astype(jnp.float32), xmin.astype(jnp.float32), xmax.astype(jnp.float32)


def _bilinear_crop_resize(img: jax.Array, ymin, ymax, xmin, xmax) -> jax.Array:
    """Resample img[ymin:ymax, xmin:xmax] to the full (H, W) grid.

    img: (H, W, C). Half-pixel-center convention (align_corners=False)."""
    h, w, _ = img.shape
    sy = (ymax - ymin) / h
    sx = (xmax - xmin) / w
    ys = ymin + (jnp.arange(h, dtype=jnp.float32) + 0.5) * sy - 0.5
    xs = xmin + (jnp.arange(w, dtype=jnp.float32) + 0.5) * sx - 0.5

    y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)
    wx = jnp.clip(xs - x0, 0.0, 1.0)

    y0i, y1i, x0i, x1i = y0.astype(jnp.int32), y1.astype(jnp.int32), x0.astype(jnp.int32), x1.astype(jnp.int32)

    top = img[y0i][:, x0i] * (1 - wx)[None, :, None] + img[y0i][:, x1i] * wx[None, :, None]
    bot = img[y1i][:, x0i] * (1 - wx)[None, :, None] + img[y1i][:, x1i] * wx[None, :, None]
    return top * (1 - wy)[:, None, None] + bot * wy[:, None, None]


@partial(jax.jit, static_argnames=("mode", "theta", "padding_ratio"))
def batch_augment(
    images: jax.Array,
    attention_map: jax.Array,
    key: jax.Array,
    mode: str = "crop",
    theta: Union[float, Tuple[float, float]] = 0.5,
    padding_ratio: float = 0.1,
) -> jax.Array:
    """Attention-guided crop or drop.

    images: (B, H, W, C) NHWC; attention_map: (B, ah, aw) one map per sample.
    Train defaults mirror fgvc/train.py:465-466 (crop theta (0.4, 0.6) pad 0.1;
    drop theta (0.2, 0.5)); eval uses crop theta 0.1 pad 0.05 (fgvc/train.py:616).
    """
    b, h, w, _ = images.shape
    up = _upsample_bilinear(attention_map.astype(jnp.float32), h, w)  # (B, H, W)
    amax = jnp.max(up, axis=(1, 2))
    thetas = _theta(key, theta, b, jnp.float32) * amax

    if mode == "crop":
        masks = up >= thetas[:, None, None]

        def one(img, mask):
            ymin, ymax, xmin, xmax = _bbox_from_mask(mask)
            ymin = jnp.maximum(ymin - padding_ratio * h, 0.0)
            ymax = jnp.minimum(ymax + padding_ratio * h, float(h))
            xmin = jnp.maximum(xmin - padding_ratio * w, 0.0)
            xmax = jnp.minimum(xmax + padding_ratio * w, float(w))
            return _bilinear_crop_resize(img.astype(jnp.float32), ymin, ymax, xmin, xmax)

        return jax.vmap(one)(images, masks).astype(images.dtype)

    if mode == "drop":
        masks = (up < thetas[:, None, None]).astype(images.dtype)
        return images * masks[..., None]

    raise ValueError(f"mode must be 'crop' or 'drop', got {mode!r}")
