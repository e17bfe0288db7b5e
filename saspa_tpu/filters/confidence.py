"""Baseline-classifier confidence scoring, batched.

The reference loads the dataset's released WSDAN_CAL checkpoint and scores
generated images ONE AT A TIME (all_utils/utils.py:357-375: a full model
forward per image at batch size 1).  Here every aug image in the sweep goes
through one batched jitted forward — the predicates (top-k membership,
too-high-confidence, ALIA per-class thresholds) consume precomputed logits.

Checkpoints are saspa-format orbax dirs at checkpoints/<dataset>/ converted
from the released .pth files with tools/convert_cal.py; the resnet101-else-
resnet50 retry of the reference (all_utils/dataset_utils.py:99-109) becomes an
explicit `net` field in the converted checkpoint metadata.
"""

from __future__ import annotations

import json
import logging
from concurrent.futures import ThreadPoolExecutor
from functools import partial
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from saspa_tpu.data.registry import CHECKPOINTS_DIR
from saspa_tpu.models.cal import WSDAN_CAL
from saspa_tpu.ops.image import IMAGENET_MEAN, IMAGENET_STD

_POOL = ThreadPoolExecutor(max_workers=16)


def val_preprocess(path: str, resize: Tuple[int, int] = (224, 224)) -> np.ndarray:
    """Reference val transform: resize/0.875 -> center crop -> normalize
    (all_utils/dataset_utils.py:78-85)."""
    th, tw = resize
    rh, rw = int(th / 0.875), int(tw / 0.875)
    img = Image.open(path).convert("RGB").resize((rw, rh), Image.BILINEAR)
    x = np.asarray(img, np.float32) / 255.0
    y0, x0 = (rh - th) // 2, (rw - tw) // 2
    x = x[y0 : y0 + th, x0 : x0 + tw]
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def load_cal_baseline(name: str, num_classes: int, resize: Tuple[int, int] = (224, 224)):
    """Returns (model, variables, preprocess_fn). Uses a converted checkpoint
    under checkpoints/<name>/ when present, else seeded random init."""
    from saspa_tpu.utils.checkpoint import restore_checkpoint

    net = "resnet101"
    variables = None
    cp_dir = CHECKPOINTS_DIR / name
    meta_path = cp_dir / "meta.json"
    if meta_path.exists():
        meta = json.load(open(meta_path))
        net = meta.get("net", net)
        restored = restore_checkpoint(str(cp_dir / "ckpt"))
        variables = {"params": restored["params"]}
        if "batch_stats" in restored:
            variables["batch_stats"] = restored["batch_stats"]
        logging.info("loaded baseline CAL (%s) from %s", net, cp_dir)
    model = WSDAN_CAL(num_classes=num_classes, M=32, net=net, dtype=jnp.bfloat16)
    if variables is None:
        import os

        if os.environ.get("SASPA_STRICT_WEIGHTS", "") == "1":
            # the reference asserts exactly one .pth exists
            # (all_utils/dataset_utils.py:89-93); SASPA_STRICT_WEIGHTS restores
            # that loud failure for production filter runs
            raise FileNotFoundError(
                f"no converted baseline CAL checkpoint under {cp_dir} and "
                f"SASPA_STRICT_WEIGHTS=1 — confidence filtering would be noise"
            )
        logging.warning("no baseline checkpoint for %s — seeded random init", name)
        variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, *resize, 3)), train=False)
    return model, variables, partial(val_preprocess, resize=resize)


def batched_logits(
    model: WSDAN_CAL,
    variables: dict,
    paths: Sequence[str],
    preprocess: Callable[[str], np.ndarray],
    batch_size: int = 64,
    mesh=None,
) -> np.ndarray:
    """Score image paths -> (N, num_classes) logits, padded batches, one jit.

    Multi-device: batches DP-shard over the mesh's data axis with replicated
    params — the filter-stage counterpart of the sharded generation path
    (the reference scores one image per forward on one GPU,
    all_utils/utils.py:357-375).  `mesh=None` auto-builds a mesh when more
    than one local device is visible and the batch divides evenly."""
    from saspa_tpu.parallel import data_sharding, local_device_count, make_mesh, replicated

    if mesh is None and local_device_count() > 1 and batch_size % local_device_count() == 0:
        mesh = make_mesh()
    if mesh is not None:
        variables = jax.device_put(variables, replicated(mesh))
        x_sharding = data_sharding(mesh, 4)

    @jax.jit
    def forward(X):
        p, _, _, _ = model.apply(variables, X, train=False)
        return p

    out = []
    n = len(paths)
    for lo in range(0, n, batch_size):
        chunk = paths[lo : lo + batch_size]
        arrays = list(_POOL.map(preprocess, chunk))
        X = np.stack(arrays)
        if len(chunk) < batch_size:  # pad to avoid recompilation
            X = np.concatenate([X, np.zeros((batch_size - len(chunk), *X.shape[1:]), X.dtype)])
        X = jax.device_put(X, x_sharding) if mesh is not None else jnp.asarray(X)
        logits = np.asarray(forward(X))[: len(chunk)]
        out.append(logits)
    return np.concatenate(out) if out else np.zeros((0, model.num_classes), np.float32)


def compute_alia_thresholds(ds_utils) -> Dict[str, float]:
    """Per-class mean confidence of the baseline on original train images
    (all_utils/dataset_utils.py:117-146)."""
    model, variables, preprocess = ds_utils.load_baseline_model()
    path_to_class = ds_utils.get_image_path_to_class_id_dict()
    paths = list(ds_utils.original_images_paths)
    logits = batched_logits(model, variables, paths, preprocess)
    per_class: Dict[int, List[float]] = {i: [] for i in range(ds_utils.num_classes)}
    for p, lg in zip(paths, logits):
        cid = path_to_class[p]
        per_class[cid].append(float(lg[cid]))
    empty = [cid for cid, v in per_class.items() if not v]
    if empty:
        # the reference fails loudly here too (ZeroDivisionError on an empty
        # class, all_utils/dataset_utils.py:117-146); a silent 0.0 threshold
        # would drop nearly every augmentation of that class downstream
        raise ValueError(
            f"ALIA thresholds: classes {empty[:5]}{'...' if len(empty) > 5 else ''} "
            f"have no original train images (utils {ds_utils.name!r} with "
            f"{ds_utils.num_classes} classes) — class ids and the utils class "
            "disagree"
        )
    return {str(cid): sum(v) / len(v) for cid, v in per_class.items()}
