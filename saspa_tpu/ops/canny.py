"""Batched on-device Canny edge detection.

The reference outsources Canny to OpenCV's C++ (all_utils/utils.py:81-85) and
recomputes it per generated image on the host (run_aug/run_aug.py:436-437).
Here it is a pure-JAX batched op that runs on TPU right next to the diffusion
model, so the ControlNet conditioning never leaves the device.

Semantics follow cv2.Canny(aperture=3, L2gradient=False):
  * 3x3 Sobel per channel, L1 magnitude |gx|+|gy|
  * per-pixel channel with max magnitude wins (multi-channel input rule)
  * non-maximum suppression with the 4-sector integer-arithmetic rule
  * double threshold + hysteresis (8-connected flood from strong pixels),
    implemented as an iterated 3x3 dilation fixpoint under lax.while_loop —
    compiler-friendly, no host sync.

Parity with cv2 is statistical, not bitwise (boundary handling and NMS tie
rules differ slightly); tests assert high F1 overlap on real images.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


_SOBEL_X = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
_SOBEL_Y = jnp.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], jnp.float32)


def _conv3x3(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depthwise 3x3 convolution with edge replication. img: (H, W, C)."""
    h, w, c = img.shape
    x = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    x = x.transpose(2, 0, 1)[:, None]  # (C, 1, H+2, W+2)
    k = kernel[None, None]  # (1, 1, 3, 3)
    out = jax.lax.conv_general_dilated(x, k, (1, 1), "VALID")
    return out[:, 0].transpose(1, 2, 0)


def _dilate8(mask: jax.Array) -> jax.Array:
    """8-neighbourhood binary dilation via 3x3 max pool."""
    return jax.lax.reduce_window(
        mask, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )


@partial(jax.jit, static_argnames=("max_hysteresis_iters",))
def canny(
    img: jax.Array,
    low_threshold: float,
    high_threshold: float,
    max_hysteresis_iters: int = 0,
) -> jax.Array:
    """Canny edges for one image.

    img: (H, W, C) float or uint8 in [0, 255]. Returns (H, W) uint8 {0, 255}.

    max_hysteresis_iters=0 means H+W dilations — enough for any contour to
    flood across the image (cv2's hysteresis always completes; the loop
    exits early on convergence, so the higher bound is free when converged).
    """
    if max_hysteresis_iters == 0:
        max_hysteresis_iters = img.shape[0] + img.shape[1]
    x = img.astype(jnp.float32)
    if x.ndim == 2:
        x = x[..., None]

    gx = _conv3x3(x, _SOBEL_X)
    gy = _conv3x3(x, _SOBEL_Y)
    mag_c = jnp.abs(gx) + jnp.abs(gy)  # L1 gradient, cv2 default

    # multi-channel rule: the channel with max |g| supplies (gx, gy).
    # Elementwise selects, not argmax+take_along_axis: gathers lower to
    # scalar loads on TPU (measured 47 ms/batch-4 program for the three
    # gathers); first-max-wins matches jnp.argmax's tie rule.
    mag = jnp.max(mag_c, axis=-1)
    c = mag_c.shape[-1]
    win_prev = mag_c[..., 0] >= mag
    gx_s, gy_s = gx[..., 0], gy[..., 0]
    for i in range(1, c):
        win_i = (mag_c[..., i] >= mag) & ~win_prev
        gx_s = jnp.where(win_i, gx[..., i], gx_s)
        gy_s = jnp.where(win_i, gy[..., i], gy_s)
        win_prev = win_prev | win_i
    gx, gy = gx_s, gy_s

    # --- non-maximum suppression, cv2's integer sector logic ---
    # sector 0: |gy| < TG22*|gx|           -> horizontal gradient, compare L/R
    # sector 2: |gy| > TG67*|gx|           -> vertical gradient, compare U/D
    # else diagonal, sign(gx*gy) picks which diagonal
    TG22 = 0.4142135623730951  # tan(22.5 deg)
    ax, ay = jnp.abs(gx), jnp.abs(gy)
    pad = jnp.pad(mag, 1, mode="constant")

    def sh(dy, dx):  # shifted magnitude
        return jax.lax.dynamic_slice(pad, (1 + dy, 1 + dx), mag.shape)

    horiz = ay < TG22 * ax
    vert = ay > (ax / TG22)
    diag_main = (gx * gy) >= 0  # gradient along main diagonal (\)

    n1 = jnp.where(horiz, sh(0, -1), jnp.where(vert, sh(-1, 0), jnp.where(diag_main, sh(-1, -1), sh(-1, 1))))
    n2 = jnp.where(horiz, sh(0, 1), jnp.where(vert, sh(1, 0), jnp.where(diag_main, sh(1, 1), sh(1, -1))))

    is_max = (mag > n1) & (mag >= n2)

    strong = is_max & (mag > high_threshold)
    weak = is_max & (mag > low_threshold)

    # --- hysteresis: flood strong through weak via dilation fixpoint ---
    def cond(state):
        i, cur, changed = state
        return changed & (i < max_hysteresis_iters)

    def body(state):
        i, cur, _ = state
        nxt = jnp.minimum(_dilate8(cur), weak.astype(jnp.float32))
        nxt = jnp.maximum(nxt, cur)
        return i + 1, nxt, jnp.any(nxt != cur)

    init = strong.astype(jnp.float32)
    _, edges, _ = jax.lax.while_loop(cond, body, (0, init, jnp.array(True)))
    return (edges > 0).astype(jnp.uint8) * 255


@partial(jax.jit, static_argnames=("max_hysteresis_iters",))
def canny_batch(
    imgs: jax.Array,
    low_threshold: float,
    high_threshold: float,
    max_hysteresis_iters: int = 0,
) -> jax.Array:
    """Batched Canny: (N, H, W, C) -> (N, H, W) uint8."""
    return jax.vmap(lambda im: canny(im, low_threshold, high_threshold, max_hysteresis_iters))(imgs)


def canny_control_image(imgs: jax.Array, low: float, high: float) -> jax.Array:
    """(N,H,W,C) image batch -> (N,H,W,3) float32 in [0,1] ControlNet cond."""
    e = canny_batch(imgs, low, high).astype(jnp.float32) / 255.0
    return jnp.repeat(e[..., None], 3, axis=-1)


def canny_numpy(img: np.ndarray, low: float, high: float) -> np.ndarray:
    """Host convenience wrapper returning a uint8 edge map."""
    return np.asarray(canny(jnp.asarray(img), low, high))
