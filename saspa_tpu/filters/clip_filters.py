"""CLIP zero-shot filter scoring, batched.

Reference semantics (all_utils/utils.py:139-191,272-312):
  * semantic filter: prompts = [dataset basic prompt] + 6 fixed negatives;
    keep iff argmax(logits) == 0
  * per-class filter: prompts = one per class; keep iff
    softmax(logits)[true class] >= 1 / num_classes / discount

Text features are encoded once per battery; image features once per aug
image; logits are one matmul.  The reference runs a full CLIP text+image
forward per image per filter.
"""

from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from saspa_tpu.gen.tokenizer import default_tokenizer
from saspa_tpu.models.clip import CLIPModel, CLIP_MEAN, CLIP_STD

NEGATIVE_SEMANTIC_PROMPTS = [
    "a photo of an object",
    "a photo of a scene",
    "a photo of geometric shapes",
    "a photo",
    "an image",
    "a black photo",
]

_POOL = ThreadPoolExecutor(max_workers=16)


def clip_preprocess_path(path: str, size: int = 224) -> np.ndarray:
    """Host-side CLIP preprocess: resize (bicubic, short side) -> center crop
    -> normalize."""
    img = Image.open(path).convert("RGB")
    w, h = img.size
    scale = size / min(w, h)
    img = img.resize((max(size, int(round(w * scale))), max(size, int(round(h * scale)))), Image.BICUBIC)
    w, h = img.size
    x0, y0 = (w - size) // 2, (h - size) // 2
    img = img.crop((x0, y0, x0 + size, y0 + size))
    x = np.asarray(img, np.float32) / 255.0
    return (x - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(CLIP_STD, np.float32)


class CLIPScorer:
    """Owns a CLIP model + params; scores image paths against prompt batteries."""

    def __init__(self, vision_kind: str = "rn50", weights_dir: Optional[str] = None, seed: int = 0):
        self.vision_kind = vision_kind
        import os

        from saspa_tpu.utils.checkpoint import restore_checkpoint

        weights_dir = weights_dir or os.environ.get("SASPA_WEIGHTS_DIR")
        self.model = CLIPModel(vision_kind=vision_kind, dtype=jnp.bfloat16)
        self.tokenizer = default_tokenizer(weights_dir)
        loaded = False
        if weights_dir:
            ckpt = Path(weights_dir) / f"clip_{vision_kind}"
            if ckpt.exists():
                restored = restore_checkpoint(str(ckpt))
                self.variables = {"params": restored["params"]}
                if "batch_stats" in restored:
                    self.variables["batch_stats"] = restored["batch_stats"]
                loaded = True
        if not loaded:
            if os.environ.get("SASPA_STRICT_WEIGHTS", "") == "1":
                raise FileNotFoundError(
                    f"no converted CLIP {vision_kind} checkpoint under "
                    f"{weights_dir or '$SASPA_WEIGHTS_DIR (unset)'} and "
                    f"SASPA_STRICT_WEIGHTS=1 — filter scores would be noise"
                )
            logging.warning("no CLIP %s weights — seeded random init", vision_kind)
            self.variables = self.model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, 77), jnp.int32)
            )

        # variables passed as an argument (not a closure) so the DP path can
        # swap in mesh-replicated copies without recompiling
        @jax.jit
        def _encode_images(variables, X):
            return self.model.apply(variables, X, method=CLIPModel.encode_image)

        @jax.jit
        def _encode_text(variables, ids):
            return self.model.apply(variables, ids, method=CLIPModel.encode_text)

        self._encode_images = lambda X: _encode_images(self.variables, X)
        self._encode_text = lambda ids: _encode_text(self.variables, ids)
        ls = self.variables["params"]["logit_scale"]
        self._logit_scale = float(np.exp(np.asarray(ls)))

    def text_features(self, prompts: Sequence[str]) -> np.ndarray:
        ids = jnp.asarray(self.tokenizer(list(prompts)))
        return np.asarray(self._encode_text(ids), np.float32)

    def image_features(self, paths: Sequence[str], batch_size: int = 64) -> np.ndarray:
        """DP-shards each image batch over the data axis when more than one
        local device is visible (replicated params) — the CLIP-filter leg of
        the multi-chip filter stage; single-device runs are unchanged."""
        from saspa_tpu.parallel import data_sharding, local_device_count, make_mesh, replicated

        mesh = None
        if local_device_count() > 1 and batch_size % local_device_count() == 0:
            mesh = make_mesh()
            if not hasattr(self, "_replicated_variables"):
                self._replicated_variables = jax.device_put(self.variables, replicated(mesh))
                self.variables = self._replicated_variables
        feats = []
        for lo in range(0, len(paths), batch_size):
            chunk = paths[lo : lo + batch_size]
            X = np.stack(list(_POOL.map(clip_preprocess_path, chunk)))
            if len(chunk) < batch_size:
                X = np.concatenate([X, np.zeros((batch_size - len(chunk), *X.shape[1:]), X.dtype)])
            X = jax.device_put(X, data_sharding(mesh, 4)) if mesh is not None else jnp.asarray(X)
            f = np.asarray(self._encode_images(X), np.float32)[: len(chunk)]
            feats.append(f)
        if feats:
            return np.concatenate(feats)
        # empty input still needs the real feature width for downstream matmuls
        dim = 512 if self.vision_kind != "rn50" else 1024
        return np.zeros((0, dim), np.float32)

    def logits(self, image_features: np.ndarray, text_features: np.ndarray) -> np.ndarray:
        return self._logit_scale * image_features @ text_features.T


def semantic_keep(logits: np.ndarray) -> np.ndarray:
    """(N, 1+6) semantic-battery logits -> keep mask (argmax == 0)."""
    return logits.argmax(axis=-1) == 0


def per_class_keep(logits: np.ndarray, class_idx: np.ndarray, threshold: float) -> np.ndarray:
    """(N, C) class-battery logits + per-image true class -> keep mask."""
    probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    conf = np.asarray(probs)[np.arange(len(class_idx)), class_idx]
    return conf >= threshold
