"""Batched LPIPS distance between original and augmented images.

Reference behavior (all_utils/utils.py:576-590): both images grayscale->RGB,
resized to 256², scaled to [-1, 1], AlexNet-LPIPS distance; the keep rule is
lpips_min <= d <= lpips_max (applied by the aug-JSON builder).
"""

from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from saspa_tpu.models.lpips import LPIPS

_POOL = ThreadPoolExecutor(max_workers=16)
_CACHE = {}


def _load_gray_rgb(path: str, resize: Tuple[int, int]) -> np.ndarray:
    img = Image.open(path).convert("L").convert("RGB").resize(resize)
    x = np.asarray(img, np.float32) / 255.0
    return x * 2.0 - 1.0


def _get_model(weights_dir: Optional[str]):
    if "model" in _CACHE:
        return _CACHE["model"]
    from saspa_tpu.utils.checkpoint import restore_checkpoint

    model = LPIPS(dtype=jnp.bfloat16)
    variables = None
    if weights_dir and (Path(weights_dir) / "lpips_alex").exists():
        variables = {"params": restore_checkpoint(str(Path(weights_dir) / "lpips_alex"))["params"]}
    if variables is None:
        logging.warning("no LPIPS weights — seeded random init")
        dummy = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), dummy, dummy)

    @jax.jit
    def dist(a, b):
        return model.apply(variables, a, b)

    _CACHE["model"] = dist
    return dist


def batched_lpips(
    orig_paths: Sequence[str],
    aug_paths: Sequence[str],
    resize: Tuple[int, int] = (256, 256),
    weights_dir: Optional[str] = None,
    batch_size: int = 32,
) -> np.ndarray:
    assert len(orig_paths) == len(aug_paths)
    dist = _get_model(weights_dir)
    out = []
    for lo in range(0, len(aug_paths), batch_size):
        o_chunk = orig_paths[lo : lo + batch_size]
        a_chunk = aug_paths[lo : lo + batch_size]
        A = np.stack(list(_POOL.map(lambda p: _load_gray_rgb(p, resize), o_chunk)))
        B = np.stack(list(_POOL.map(lambda p: _load_gray_rgb(p, resize), a_chunk)))
        n = len(o_chunk)
        if n < batch_size:
            pad = np.zeros((batch_size - n, *A.shape[1:]), A.dtype)
            A, B = np.concatenate([A, pad]), np.concatenate([B, pad])
        d = np.asarray(dist(jnp.asarray(A), jnp.asarray(B)), np.float32)[:n]
        out.append(d)
    return np.concatenate(out) if out else np.zeros(0, np.float32)


def calc_lpips_given_aug_json(dataset, aug_json, net="alex", compute_on=3000, resize_to=None, seed=0, weights_dir=None):
    """Offline metric: mean/std LPIPS over an aug-JSON (all_utils/utils.py:789-817)."""
    import json
    import random as pyrandom

    from saspa_tpu.data.registry import DS_UTILS_DICT

    with open(aug_json) as f:
        aug_data = json.load(f)
    if len(aug_data) > compute_on:
        rng = pyrandom.Random(seed)
        aug_data = dict(rng.sample(sorted(aug_data.items()), compute_on))
    ds_utils = DS_UTILS_DICT[dataset]()
    by_name = {Path(p).name: p for p in ds_utils.original_images_paths}
    origs, augs = [], []
    for name, aug_list in aug_data.items():
        src = by_name.get(name)
        if src is None:
            continue
        for a in aug_list:
            origs.append(src)
            augs.append(a)
    values = batched_lpips(origs, augs, resize=resize_to or (256, 256), weights_dir=weights_dir)
    mean, std = float(np.mean(values)), float(np.std(values))
    logging.info("LPIPS mean %.4f std %.4f over %d pairs", mean, std, len(values))
    return mean, std, values.tolist()
