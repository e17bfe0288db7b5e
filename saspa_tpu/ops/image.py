"""Image geometry + resize ops.

`resize_shape_multiple_of_64` reproduces the reference's aspect-preserving
resize-to-multiple-of-64 geometry exactly (all_utils/utils.py:58-79) — an
artifact contract: the `_source.png` files and ControlNet conditioning images
are produced at these sizes.  The pixel resampling itself runs on-device via
`jax.image.resize` (antialiased linear ~ cv2.INTER_AREA for downscale,
lanczos3 ~ INTER_LANCZOS4 for upscale) and is batched: the reference resizes
one image at a time on the CPU.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

MAX_RES_SIZE = 1_200_000  # 1200*1000 pixel cap (all_utils/utils.py:65)


def HWC3(x: np.ndarray) -> np.ndarray:
    """Grayscale/RGBA -> RGB uint8 (all_utils/utils.py:39-55 semantics)."""
    assert x.dtype == np.uint8
    if x.ndim == 2:
        x = x[:, :, None]
    assert x.ndim == 3
    _, _, c = x.shape
    assert c in (1, 3, 4)
    if c == 3:
        return x
    if c == 1:
        return np.concatenate([x, x, x], axis=2)
    color = x[:, :, 0:3].astype(np.float32)
    alpha = x[:, :, 3:4].astype(np.float32) / 255.0
    y = color * alpha + 255.0 * (1.0 - alpha)
    return y.clip(0, 255).astype(np.uint8)


def resize_shape_multiple_of_64(h: int, w: int, smaller_side_res: int) -> Tuple[int, int, float]:
    """Target (H, W) after the reference's geometry; also returns the scale k.

    Steps: scale so min side == smaller_side_res; if area > 1.2MP rescale down;
    round each side to the nearest multiple of 64.
    """
    H, W = float(h), float(w)
    k = float(smaller_side_res) / min(H, W)
    H *= k
    W *= k
    if H * W > MAX_RES_SIZE:
        k2 = np.sqrt(MAX_RES_SIZE / (H * W))
        H *= k2
        W *= k2
        k *= k2
    H = int(np.round(H / 64.0)) * 64
    W = int(np.round(W / 64.0)) * 64
    return H, W, k


def resize_image(img: np.ndarray, smaller_side_res: int) -> np.ndarray:
    """Single-image resize with the reference geometry; uint8 in/out.

    Runs ON HOST: the generation driver calls this per image inside its
    host loop, and a per-image device dispatch is a full relay round-trip
    (~0.9 s each on axon — the r5 soak measured 967 s of it across a
    1,100-aug run, collapsing steady-state to 0.88 img/s).  With cv2 the
    resampling is the reference's own call (INTER_LANCZOS4 up /
    INTER_AREA down, all_utils/utils.py:77-78) — bit-exact parity; PIL
    LANCZOS/BOX is the cv2-free fallback.  Identity geometry (already at
    target size) short-circuits: every linear/lanczos kernel is exact
    identity at scale 1.  Batched ON-DEVICE resizing stays available as
    resize_image_batch."""
    h, w = img.shape[:2]
    out_h, out_w, k = resize_shape_multiple_of_64(h, w, smaller_side_res)
    x = HWC3(np.asarray(img, np.uint8))
    if (out_h, out_w) == (h, w):
        return x
    # interp selection mirrors the reference's k REBINDING quirk
    # (all_utils/utils.py:71-77): when the 1.2MP cap fires, k is overwritten
    # by the (always <1) cap factor, so capped UPSCALES use INTER_AREA too
    capped = (float(h) * k0_scale(h, w, smaller_side_res)) * (
        float(w) * k0_scale(h, w, smaller_side_res)) > MAX_RES_SIZE
    upscale = (not capped) and k > 1
    try:
        import cv2

        interp = cv2.INTER_LANCZOS4 if upscale else cv2.INTER_AREA
        return cv2.resize(x, (out_w, out_h), interpolation=interp)
    except ImportError:
        from PIL import Image as PILImage

        method = PILImage.LANCZOS if upscale else PILImage.BOX
        return np.asarray(PILImage.fromarray(x).resize((out_w, out_h), method))


def k0_scale(h: int, w: int, smaller_side_res: int) -> float:
    """The PRE-cap scale factor (reference's first k, all_utils/utils.py:68)."""
    return float(smaller_side_res) / min(float(h), float(w))


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_image_batch(imgs: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Batched on-device resize (N,H,W,C) float -> (N,out_h,out_w,C) float.

    Assumes all images were host-decoded to one bucket shape; downscale path
    (the generation default) uses antialiased linear.
    """
    n, h, w, c = imgs.shape
    up = out_h * out_w > h * w
    method = "lanczos3" if up else "linear"
    return jax.image.resize(
        imgs.astype(jnp.float32), (n, out_h, out_w, c), method=method, antialias=not up
    )


def normalize_imagenet(x: jax.Array) -> jax.Array:
    """[0,1] float image -> ImageNet-normalized (fgvc/util.py:266-267)."""
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


def center_crop_resize(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Val transform: resize to size/0.875 then center-crop to size
    (fgvc/util.py:310-315). x: (..., H, W, C) in [0,1]."""
    th, tw = size
    rh, rw = int(th / 0.875), int(tw / 0.875)
    batch_shape = x.shape[:-3]
    flat = x.reshape((-1,) + x.shape[-3:])
    flat = jax.image.resize(flat, (flat.shape[0], rh, rw, flat.shape[-1]), method="linear", antialias=True)
    y0, x0 = (rh - th) // 2, (rw - tw) // 2
    flat = flat[:, y0 : y0 + th, x0 : x0 + tw, :]
    return flat.reshape(batch_shape + (th, tw, x.shape[-1]))
