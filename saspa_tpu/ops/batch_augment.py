"""WS-DAN attention crop / attention drop under XLA static shapes.

The reference loops over the batch in Python, extracts a data-dependent bbox
with torch.nonzero, and crop-resizes each sample (fgvc/util.py:209-249) — a
host-sync per sample.  Here the bbox comes from masked min/max reductions and
the crop-resize is a fixed-output-shape bilinear gather under vmap: one fused
XLA program, no host round-trips, fully differentiable-free (used under
stop_gradient like the reference's torch.no_grad).

Numerical contract (verified against the EXECUTED reference code in
tests/test_reference_oracle.py — fgvc/util.py's batch_augment, the one
fgvc/train.py imports, mixes conventions and we mirror each exactly):
  * thresholds scale the RAW attention map's max, not the upsampled one
    (fgvc/util.py:216-219, 234-237);
  * the CROP MASK comes from F.interpolate(..., align_corners=False)
    — half-pixel centers (fgvc/util.py:221);
  * the CROP RESIZE is F.upsample_bilinear = align_corners=True
    (fgvc/util.py:228-229);
  * the DROP MASK upsample is F.upsample_bilinear = align_corners=True
    (fgvc/util.py:239);
  * bbox bounds are int() TRUNCATIONS of (nonzero min - pad*H) and
    (nonzero max + pad*H), the max bound using the max INDEX (no +1), used
    as an exclusive slice end (fgvc/util.py:223-226).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple, Union

import jax
import jax.numpy as jnp


def _upsample_halfpixel(attn: jax.Array, h: int, w: int) -> jax.Array:
    """(B, ah, aw) -> (B, h, w) bilinear, half-pixel centers
    (= F.interpolate(..., mode='bilinear', align_corners=False))."""
    return jax.image.resize(attn, (attn.shape[0], h, w), method="linear")


def _gather_bilinear(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Sample img at the (ys x xs) grid with bilinear weights, edge-clamped.

    img: (H, W) or (H, W, C); ys: (outH,) float; xs: (outW,) float."""
    h, w = img.shape[0], img.shape[1]
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]

    y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)
    wx = jnp.clip(xs - x0, 0.0, 1.0)

    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)

    top = img[y0i][:, x0i] * (1 - wx)[None, :, None] + img[y0i][:, x1i] * wx[None, :, None]
    bot = img[y1i][:, x0i] * (1 - wx)[None, :, None] + img[y1i][:, x1i] * wx[None, :, None]
    out = top * (1 - wy)[:, None, None] + bot * wy[:, None, None]
    return out[:, :, 0] if squeeze else out


def _align_corners_grid(lo: jax.Array, length: jax.Array, out: int) -> jax.Array:
    """Sample positions of F.upsample_bilinear (align_corners=True) mapping a
    source span [lo, lo+length) onto `out` output points."""
    dt = jnp.result_type(lo, jnp.float32)
    return lo + jnp.arange(out, dtype=dt) * (length - 1.0) / max(out - 1, 1)


def _theta(key, theta: Union[float, Tuple[float, float]], batch: int, dtype):
    if isinstance(theta, tuple):
        lo, hi = theta
        return jax.random.uniform(key, (batch,), dtype, lo, hi)
    return jnp.full((batch,), theta, dtype)


def _bbox_from_mask(mask: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """mask: (H, W) bool -> (ymin, ymax, xmin, xmax) min/max nonzero INDICES
    as floats (reference: torch.nonzero(...)[:,d].min()/.max(),
    fgvc/util.py:222-226).  Empty masks cannot happen (the max-attention pixel
    always satisfies >= theta*max for theta <= 1)."""
    h, w = mask.shape
    rows = jnp.any(mask, axis=1)
    cols = jnp.any(mask, axis=0)
    ridx = jnp.arange(h)
    cidx = jnp.arange(w)
    ymin = jnp.min(jnp.where(rows, ridx, h))
    ymax = jnp.max(jnp.where(rows, ridx, -1))
    xmin = jnp.min(jnp.where(cols, cidx, w))
    xmax = jnp.max(jnp.where(cols, cidx, -1))
    return (ymin.astype(jnp.float32), ymax.astype(jnp.float32),
            xmin.astype(jnp.float32), xmax.astype(jnp.float32))


@partial(jax.jit, static_argnames=("mode", "theta", "padding_ratio"))
def batch_augment(
    images: jax.Array,
    attention_map: jax.Array,
    key: jax.Array,
    mode: str = "crop",
    theta: Union[float, Tuple[float, float]] = 0.5,
    padding_ratio: float = 0.1,
    thetas: jax.Array = None,
) -> jax.Array:
    """Attention-guided crop or drop.

    images: (B, H, W, C) NHWC; attention_map: (B, ah, aw) one map per sample.
    Train defaults mirror fgvc/train.py:465-466 (crop theta (0.4, 0.6) pad 0.1;
    drop theta (0.2, 0.5)); eval uses crop theta 0.1 pad 0.05 (fgvc/train.py:616).
    `thetas` (B,) overrides the per-sample theta draw (pre-scaling by the map
    max) — deterministic injection for oracle-parity tests.
    """
    b, h, w, _ = images.shape
    compute = jnp.promote_types(attention_map.dtype, jnp.float32)
    attn = attention_map.astype(compute)
    # thresholds scale the RAW map's max (fgvc/util.py:216-219, 234-237)
    amax = jnp.max(attn, axis=(1, 2))
    if thetas is None:
        thetas = _theta(key, theta, b, compute)
    thetas = thetas.astype(compute) * amax

    if mode == "crop":
        # mask from the half-pixel (align_corners=False) upsample
        up = _upsample_halfpixel(attn, h, w)
        masks = up >= thetas[:, None, None]

        def one(img, mask):
            ymin, ymax, xmin, xmax = _bbox_from_mask(mask)
            # int() truncation + clamp, max bound exclusive (fgvc/util.py:223-226)
            ymin = jnp.maximum(jnp.trunc(ymin - padding_ratio * h), 0.0)
            ymax = jnp.minimum(jnp.trunc(ymax + padding_ratio * h), float(h))
            xmin = jnp.maximum(jnp.trunc(xmin - padding_ratio * w), 0.0)
            xmax = jnp.minimum(jnp.trunc(xmax + padding_ratio * w), float(w))
            # crop-resize = F.upsample_bilinear -> align_corners=True grid
            ys = _align_corners_grid(ymin.astype(compute), (ymax - ymin).astype(compute), h)
            xs = _align_corners_grid(xmin.astype(compute), (xmax - xmin).astype(compute), w)
            return _gather_bilinear(img.astype(compute), ys, xs)

        return jax.vmap(one)(images, masks).astype(images.dtype)

    if mode == "drop":
        # drop mask uses the align_corners=True upsample (fgvc/util.py:239)
        ah, aw = attn.shape[1], attn.shape[2]
        zero = jnp.zeros((), compute)
        ys = _align_corners_grid(zero, jnp.asarray(ah, compute), h)
        xs = _align_corners_grid(zero, jnp.asarray(aw, compute), w)
        up = jax.vmap(lambda a: _gather_bilinear(a, ys, xs))(attn)
        masks = (up < thetas[:, None, None]).astype(images.dtype)
        return images * masks[..., None]

    raise ValueError(f"mode must be 'crop' or 'drop', got {mode!r}")
