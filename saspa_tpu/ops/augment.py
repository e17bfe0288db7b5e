"""Train-time image augmentation as batched on-device ops.

The reference runs torchvision transforms per sample in DataLoader workers
(fgvc/util.py:255-315): Resize(1/0.875) -> RandomCrop -> HFlip -> ColorJitter
('classic'), RandAugment, AutoAugment, or none; CutMix wraps the dataset
(fgvc/datasets/__init__.py:49-53).  Here the host pipeline only decodes and
resizes to the pre-crop size; everything stochastic runs on device over the
whole batch under one jit, keyed per-sample with fold_in so results are
independent of batch composition.

Presets (names match the reference's --special_aug values):
  classic          random crop + hflip + ColorJitter(brightness=0.126, saturation=0.5)
  classic_no_color random crop + hflip
  randaug          random crop + RandAugment(N=2, M=9) (torchvision magnitudes)
  autoaug          random crop + AutoAugment (subset policy; see autoaugment note)
  none / no / None center crop only
All end with /255 + ImageNet normalize.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from saspa_tpu.ops.image import IMAGENET_MEAN, IMAGENET_STD


# --------------------------------------------------------------------------
# geometry primitives
# --------------------------------------------------------------------------
def _affine_sample(img: jax.Array, mat: jax.Array, fill: float = 0.0) -> jax.Array:
    """Inverse-warp img (H, W, C) by the 2x3 affine `mat` mapping output
    (y, x, 1) -> input coords. Bilinear, constant fill outside."""
    h, w, c = img.shape
    ys = jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2.0
    xs = jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    iy = mat[0, 0] * gy + mat[0, 1] * gx + mat[0, 2] + (h - 1) / 2.0
    ix = mat[1, 0] * gy + mat[1, 1] * gx + mat[1, 2] + (w - 1) / 2.0

    y0 = jnp.floor(iy)
    x0 = jnp.floor(ix)
    wy = iy - y0
    wx = ix - x0

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = img[yc, xc]
        return jnp.where(valid[..., None], vals, fill)

    top = gather(y0, x0) * (1 - wx)[..., None] + gather(y0, x0 + 1) * wx[..., None]
    bot = gather(y0 + 1, x0) * (1 - wx)[..., None] + gather(y0 + 1, x0 + 1) * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


def random_crop_batch(imgs: jax.Array, key: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """(B, H, W, C) -> (B, th, tw, C) random crop per sample."""
    b, h, w, c = imgs.shape
    th, tw = out_hw
    ky, kx = jax.random.split(key)
    oy = jax.random.randint(ky, (b,), 0, h - th + 1)
    ox = jax.random.randint(kx, (b,), 0, w - tw + 1)

    def one(img, y0, x0):
        return jax.lax.dynamic_slice(img, (y0, x0, 0), (th, tw, c))

    return jax.vmap(one)(imgs, oy, ox)


def center_crop_batch(imgs: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    b, h, w, c = imgs.shape
    th, tw = out_hw
    y0, x0 = (h - th) // 2, (w - tw) // 2
    return imgs[:, y0 : y0 + th, x0 : x0 + tw, :]


def hflip_batch(imgs: jax.Array, key: jax.Array, p: float = 0.5) -> jax.Array:
    b = imgs.shape[0]
    flip = jax.random.bernoulli(key, p, (b,))
    return jnp.where(flip[:, None, None, None], imgs[:, :, ::-1, :], imgs)


# --------------------------------------------------------------------------
# photometric primitives (float images in [0, 1])
# --------------------------------------------------------------------------
def _grayscale(img):
    g = img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114
    return g[..., None]


def adjust_brightness(img, factor):
    return jnp.clip(img * factor, 0.0, 1.0)


def adjust_saturation(img, factor):
    g = _grayscale(img)
    return jnp.clip(g + factor * (img - g), 0.0, 1.0)


def adjust_contrast(img, factor):
    mean = jnp.mean(_grayscale(img))
    return jnp.clip(mean + factor * (img - mean), 0.0, 1.0)


def adjust_sharpness(img, factor):
    # PIL smooth kernel: [[1,1,1],[1,5,1],[1,1,1]] / 13
    k = jnp.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    x = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge").transpose(2, 0, 1)[:, None]
    smooth = jax.lax.conv_general_dilated(x, k[None, None], (1, 1), "VALID")[:, 0].transpose(1, 2, 0)
    out = jnp.clip(smooth + factor * (img - smooth), 0.0, 1.0)
    # PIL/torchvision paste the original back over the 1-px border (the
    # blurred result's border row/col is never blended)
    h, w = img.shape[0], img.shape[1]
    ii = jnp.arange(h)[:, None, None]
    jj = jnp.arange(w)[None, :, None]
    interior = (ii > 0) & (ii < h - 1) & (jj > 0) & (jj < w - 1)
    return jnp.where(interior, out, img)


def posterize(img, bits):
    q = 2.0 ** (8 - bits)
    return jnp.floor(img * 255.0 / q) * q / 255.0


def solarize(img, threshold):
    return jnp.where(img >= threshold, 1.0 - img, img)


def autocontrast(img):
    """torchvision/PIL autocontrast (cutoff=0): stretch each channel to the
    full range; a FLAT channel (min == max) is returned unchanged (torchvision
    substitutes minimum=0, maximum=bound there — identity), not zeroed."""
    lo = jnp.min(img, axis=(0, 1), keepdims=True)
    hi = jnp.max(img, axis=(0, 1), keepdims=True)
    flat = hi <= lo
    lo = jnp.where(flat, 0.0, lo)
    scale = jnp.where(flat, 1.0, 1.0 / jnp.maximum(hi - lo, 1e-12))
    return jnp.clip((img - lo) * scale, 0.0, 1.0)


def equalize(img):
    """Per-channel histogram equalization with PIL/torchvision's STEP-based
    LUT (ImageOps.equalize / torchvision _equalize), not the OpenCV
    (cdf-cdf_min) remap: step = (npixels - count(last nonzero bin)) // 255,
    lut[i] = (step//2 + cumsum(hist[:i])) // step (cumulative EXCLUDES bin i),
    identity when step == 0.  Equalize is the most frequent AutoAugment op,
    so the exact LUT shape matters for distribution parity."""

    def chan(c):
        u8 = jnp.clip(jnp.round(c * 255.0), 0, 255).astype(jnp.int32)
        hist = jnp.zeros(256, jnp.int32).at[u8.reshape(-1)].add(1)
        idx = jnp.arange(256)
        last_nz = jnp.max(jnp.where(hist > 0, idx, -1))
        step = (jnp.sum(hist) - hist[last_nz]) // 255
        cum = jnp.cumsum(hist)
        lut = (cum + step // 2) // jnp.maximum(step, 1)
        lut = jnp.clip(jnp.concatenate([jnp.zeros((1,), lut.dtype), lut[:-1]]), 0, 255)
        out = lut[u8].astype(c.dtype) / 255.0
        return jnp.where(step == 0, c, out)

    return jnp.stack([chan(img[..., i]) for i in range(img.shape[-1])], axis=-1)


def color_jitter_batch(imgs: jax.Array, key: jax.Array, brightness: float = 0.126, saturation: float = 0.5) -> jax.Array:
    """torchvision ColorJitter(brightness=0.126, saturation=0.5)
    (fgvc/util.py:296).  torchvision randomizes the op ORDER per call; since
    each op clips to [0,1], order matters for saturated pixels — a fixed
    order is a systematically different distribution."""
    b = imgs.shape[0]
    kb, ks, ko = jax.random.split(key, 3)
    bf = jax.random.uniform(kb, (b, 1, 1, 1), minval=1 - brightness, maxval=1 + brightness)
    sf = jax.random.uniform(ks, (b, 1, 1, 1), minval=1 - saturation, maxval=1 + saturation)
    bright_first = jax.random.bernoulli(ko, 0.5, (b, 1, 1, 1))

    # the shared adjust ops broadcast against the (B,1,1,1) factor arrays
    def _sat(x):
        return adjust_saturation(x, sf)

    def _bri(x):
        return adjust_brightness(x, bf)

    return jnp.where(bright_first, _sat(_bri(imgs)), _bri(_sat(imgs)))


# --------------------------------------------------------------------------
# RandAugment (torchvision op set, num_ops=2, magnitude=9, 31 bins)
# --------------------------------------------------------------------------
def _randaug_ops(size: int):
    """Op table at FULL torchvision strength: every op consumes a signed
    fraction s in [-1, 1] of its maximum magnitude (RandAugment passes
    sign * magnitude/30, AutoAugment sign * bin/9 — both spaces map onto the
    same maxima in torchvision's _augmentation_space tables)."""
    shear = 0.3
    translate = 150.0 / 331.0 * size
    rotate = 30.0
    enhance = 0.9

    def aff(img, mat):
        return _affine_sample(img, mat, fill=0.0)

    def identity(img, s):
        return img

    def shear_x(img, s):
        return aff(img, jnp.array([[1.0, 0.0, 0.0], [s * shear, 1.0, 0.0]]))

    def shear_y(img, s):
        return aff(img, jnp.array([[1.0, s * shear, 0.0], [0.0, 1.0, 0.0]]))

    def translate_x(img, s):
        return aff(img, jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, -s * translate]]))

    def translate_y(img, s):
        return aff(img, jnp.array([[1.0, 0.0, -s * translate], [0.0, 1.0, 0.0]]))

    def rot(img, s):
        a = jnp.deg2rad(s * rotate)
        ca, sa = jnp.cos(a), jnp.sin(a)
        return aff(img, jnp.array([[ca, -sa, 0.0], [sa, ca, 0.0]]))

    def brightness(img, s):
        return adjust_brightness(img, 1.0 + s * enhance)

    def color(img, s):
        return adjust_saturation(img, 1.0 + s * enhance)

    def contrast(img, s):
        return adjust_contrast(img, 1.0 + s * enhance)

    def sharpness(img, s):
        return adjust_sharpness(img, 1.0 + s * enhance)

    def posterize_op(img, s):
        # torchvision: 8 - round(4 * fraction) bits (unsigned op)
        return posterize(img, 8.0 - jnp.round(4.0 * jnp.abs(s)))

    def solarize_op(img, s):
        # torchvision: linspace(255, 0) -> threshold 1 - fraction (unsigned)
        return solarize(img, 1.0 - jnp.abs(s))

    def autocontrast_op(img, s):
        return autocontrast(img)

    def equalize_op(img, s):
        return equalize(img)

    return [
        identity, shear_x, shear_y, translate_x, translate_y, rot,
        brightness, color, contrast, sharpness, posterize_op, solarize_op,
        autocontrast_op, equalize_op,
    ]


def randaugment_batch(imgs: jax.Array, key: jax.Array, num_ops: int = 2, magnitude: int = 9) -> jax.Array:
    """Batched RandAugment; each sample draws `num_ops` ops with random sign.
    torchvision semantics: 31 bins, strength fraction = magnitude / 30."""
    b, h, w, c = imgs.shape
    ops = _randaug_ops(max(h, w))
    n_kinds = len(ops)
    frac = magnitude / 30.0

    def apply_one(img, op_idx, strength):
        return jax.lax.switch(op_idx, ops, img, strength)

    def per_sample(img, k):
        for i in range(num_ops):
            ki, ks, k = jax.random.split(jax.random.fold_in(k, i), 3)
            op_idx = jax.random.randint(ki, (), 0, n_kinds)
            sign = jnp.where(jax.random.bernoulli(ks, 0.5), 1.0, -1.0)
            img = apply_one(img, op_idx, sign * frac)
        return img

    keys = jax.random.split(key, b)
    return jax.vmap(per_sample)(imgs, keys)


# --------------------------------------------------------------------------
# AutoAugment (ImageNet policy, 25 sub-policies of two (op, p, magnitude))
# --------------------------------------------------------------------------
# (op_name, probability, magnitude_bin/9) pairs — torchvision's ImageNet policy
_AA_POLICY = [
    (("posterize", 0.4, 8), ("rotate", 0.6, 9)),
    (("solarize", 0.6, 5), ("autocontrast", 0.6, 5)),
    (("equalize", 0.8, 8), ("equalize", 0.6, 3)),
    (("posterize", 0.6, 7), ("posterize", 0.6, 6)),
    (("equalize", 0.4, 7), ("solarize", 0.2, 4)),
    (("equalize", 0.4, 4), ("rotate", 0.8, 8)),
    (("solarize", 0.6, 3), ("equalize", 0.6, 7)),
    (("posterize", 0.8, 5), ("equalize", 1.0, 2)),
    (("rotate", 0.2, 3), ("solarize", 0.6, 8)),
    (("equalize", 0.6, 8), ("posterize", 0.4, 6)),
    (("rotate", 0.8, 8), ("color", 0.4, 0)),
    (("rotate", 0.4, 9), ("equalize", 0.6, 2)),
    (("equalize", 0.0, 7), ("equalize", 0.8, 8)),
    (("invert", 0.6, 4), ("equalize", 1.0, 8)),
    (("color", 0.6, 4), ("contrast", 1.0, 8)),
    (("rotate", 0.8, 8), ("color", 1.0, 2)),
    (("color", 0.8, 8), ("solarize", 0.8, 7)),
    (("sharpness", 0.4, 7), ("invert", 0.6, 8)),
    (("shear_x", 0.6, 5), ("equalize", 1.0, 9)),
    (("color", 0.4, 0), ("equalize", 0.6, 3)),
    (("equalize", 0.4, 7), ("solarize", 0.2, 4)),
    (("solarize", 0.6, 5), ("autocontrast", 0.6, 5)),
    (("invert", 0.6, 4), ("equalize", 1.0, 8)),
    (("color", 0.6, 4), ("contrast", 1.0, 8)),
    (("equalize", 0.8, 8), ("equalize", 0.6, 3)),
]

_AA_OP_NAMES = [
    "identity", "shear_x", "shear_y", "translate_x", "translate_y", "rotate",
    "brightness", "color", "contrast", "sharpness", "posterize", "solarize",
    "autocontrast", "equalize", "invert",
]


def _autoaug_apply_table(size: int):
    """Op table shared with RandAugment plus invert; the AutoAugment 10-bin
    magnitude rides the signed-strength argument as bin/9 — the ops are
    full-strength, so no double scaling."""
    ops = _randaug_ops(size)

    def invert_op(img, s):
        return 1.0 - img

    return ops + [invert_op]


def autoaugment_batch(imgs: jax.Array, key: jax.Array) -> jax.Array:
    """Batched AutoAugment: per sample pick one of the 25 ImageNet
    sub-policies; apply each of its two ops with its probability; magnitude
    scaling rides on the signed-strength argument (mag_bin/9 in [-1, 1])."""
    b, h, w, c = imgs.shape
    table = _autoaug_apply_table(max(h, w))
    name_to_idx = {n: i for i, n in enumerate(_AA_OP_NAMES)}

    # policy tensors: (25, 2) op index / prob / magnitude fraction
    op_idx = jnp.asarray([[name_to_idx[a[0]], name_to_idx[b_[0]]] for a, b_ in _AA_POLICY])
    op_p = jnp.asarray([[a[1], b_[1]] for a, b_ in _AA_POLICY], jnp.float32)
    op_m = jnp.asarray([[a[2] / 9.0, b_[2] / 9.0] for a, b_ in _AA_POLICY], jnp.float32)

    def per_sample(img, k):
        kp, k1, k2, ks1, ks2 = jax.random.split(k, 5)
        pol = jax.random.randint(kp, (), 0, len(_AA_POLICY))
        for j, (kk, kss) in enumerate(((k1, ks1), (k2, ks2))):
            do = jax.random.bernoulli(kk, op_p[pol, j])
            sign = jnp.where(jax.random.bernoulli(kss, 0.5), 1.0, -1.0)
            strength = sign * op_m[pol, j]
            applied = jax.lax.switch(op_idx[pol, j], table, img, strength)
            img = jnp.where(do, applied, img)
        return img

    keys = jax.random.split(key, b)
    return jax.vmap(per_sample)(imgs, keys)


# --------------------------------------------------------------------------
# CutMix (beta=1, prob=0.5, num_mix=2 like DA-Fusion / ALIA)
# --------------------------------------------------------------------------
def cutmix_batch(
    imgs: jax.Array, labels: jax.Array, key: jax.Array, num_classes: int,
    beta: float = 1.0, prob: float = 0.5, num_mix: int = 2,
):
    """In-batch CutMix. Returns (mixed images, hard labels, soft labels).

    NOTE: the reference's CutMix call returns `.dataset` — the *unwrapped*
    dataset (fgvc/datasets/__init__.py:53), so its cutmix path is a no-op.
    We implement the real thing (params cited from DA-Fusion) since that is
    clearly the intent; the flag still defaults off everywhere it did.
    """
    b, h, w, c = imgs.shape
    y_soft = jax.nn.one_hot(labels, num_classes)
    for i in range(num_mix):
        k = jax.random.fold_in(key, i)
        kp, kl, kperm, ky, kx = jax.random.split(k, 5)
        do = jax.random.bernoulli(kp, prob, (b,))
        lam = jax.random.beta(kl, beta, beta, (b,))
        perm = jax.random.permutation(kperm, b)

        cut_rat = jnp.sqrt(1.0 - lam)
        cut_h = (h * cut_rat).astype(jnp.int32)
        cut_w = (w * cut_rat).astype(jnp.int32)
        cy = jax.random.randint(ky, (b,), 0, h)
        cx = jax.random.randint(kx, (b,), 0, w)
        y1 = jnp.clip(cy - cut_h // 2, 0, h)
        y2 = jnp.clip(cy + cut_h // 2, 0, h)
        x1 = jnp.clip(cx - cut_w // 2, 0, w)
        x2 = jnp.clip(cx + cut_w // 2, 0, w)

        ys = jnp.arange(h)[None, :, None]
        xs = jnp.arange(w)[None, None, :]
        box = (ys >= y1[:, None, None]) & (ys < y2[:, None, None]) & (xs >= x1[:, None, None]) & (xs < x2[:, None, None])
        box = box & do[:, None, None]
        imgs = jnp.where(box[..., None], imgs[perm], imgs)

        area = ((y2 - y1) * (x2 - x1)) / float(h * w)
        lam_adj = jnp.where(do, 1.0 - area, 1.0)
        y_soft = lam_adj[:, None] * y_soft + (1.0 - lam_adj)[:, None] * y_soft[perm]
    return imgs, labels, y_soft


# --------------------------------------------------------------------------
# preset pipelines
# --------------------------------------------------------------------------
def _finalize(imgs: jax.Array) -> jax.Array:
    return (imgs - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


@partial(jax.jit, static_argnames=("preset", "out_h", "out_w"))
def train_transform_batch(imgs_u8: jax.Array, key: jax.Array, preset: Optional[str], out_h: int, out_w: int) -> jax.Array:
    """Device half of the train transform. imgs_u8: (B, H, W, C) uint8 already
    resized to size/0.875 by the host loader. Returns normalized float32."""
    x = imgs_u8.astype(jnp.float32) / 255.0
    kc, kf, kj = jax.random.split(key, 3)
    if preset in ("classic", "classic_no_color", "randaug", "autoaug"):
        x = random_crop_batch(x, kc, (out_h, out_w))
    else:
        x = center_crop_batch(x, (out_h, out_w))
    if preset in ("classic", "classic_no_color"):
        x = hflip_batch(x, kf)
    if preset == "classic":
        x = color_jitter_batch(x, kj)
    elif preset == "randaug":
        x = randaugment_batch(x, kj)
    elif preset == "autoaug":
        x = autoaugment_batch(x, kj)
    return _finalize(x)


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def val_transform_batch(imgs_u8: jax.Array, out_h: int, out_w: int) -> jax.Array:
    x = imgs_u8.astype(jnp.float32) / 255.0
    x = center_crop_batch(x, (out_h, out_w))
    return _finalize(x)
