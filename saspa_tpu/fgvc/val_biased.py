"""Contextual-bias evaluation on planes_biased (fgvc/val_biased.py parity).

OOD definition (fgvc/val_biased.py:55-57): Boeing-on-road and Airbus-on-grass
are out-of-domain, the rest in-domain.  Reports mean-class / overall / ID /
OOD top-1, sweeping checkpoint folders like the reference __main__ (:80-93).
"""

from __future__ import annotations

import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from saspa_tpu.data.datasets import FGVCDataset, PlanesBiasedFiles
from saspa_tpu.data.pipeline import InputPipeline
from saspa_tpu.fgvc.metrics import MeanClassAccuracy, TopKAccuracy, per_class_stats, topk_correct
from saspa_tpu.models.cal import WSDAN_CAL
from saspa_tpu.utils.checkpoint import restore_checkpoint


def _ood_flags(files: PlanesBiasedFiles) -> np.ndarray:
    df = files.df
    is_ood = np.zeros(len(df), np.int32)
    is_ood[(df["Plane"] == "Boeing").values & df["Ground"].isin(["road"]).values] = 1
    is_ood[(df["Plane"] == "Airbus").values & df["Ground"].isin(["grass"]).values] = 1
    return is_ood


def evaluate_checkpoint(ckpt_path: str, net: str = "resnet50", batch_size: int = 16,
                        image_size=(224, 224), num_attentions: int = 32) -> dict:
    files = PlanesBiasedFiles(split="test")
    is_ood = _ood_flags(files)
    num_classes = files.num_classes

    model = WSDAN_CAL(num_classes=num_classes, M=num_attentions, net=net, dtype=jnp.bfloat16)
    dummy = jnp.zeros((1, *image_size, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, dummy, train=False)
    # strict: the reference's load_state_dict raises on mismatch and main()
    # prints "Failed to load model" (val_biased.py:21,72-74) — a size-tolerant
    # load here would score random weights and print plausible garbage
    # target includes batch_stats so strict mode also catches a checkpoint
    # saved without BN running statistics (evaluating on init-value stats
    # prints plausible garbage)
    restored = restore_checkpoint(
        ckpt_path,
        target={"params": variables["params"], "batch_stats": variables["batch_stats"]},
        strict=True,
    )
    variables = dict(variables)
    variables["params"] = restored["params"]
    variables["batch_stats"] = restored["batch_stats"]

    @jax.jit
    def forward(X):
        # RAW logits only — the reference's validate_model scores y_pred_raw
        # with no attention-crop TTA (val_biased.py:35-43), unlike train.py's
        # two-view validate; keep the protocols distinct for parity
        p, _, _, _ = model.apply(variables, X, train=False)
        return p

    ds = FGVCDataset(files, split="test")
    pipe = InputPipeline(ds, batch_size=batch_size, resize=image_size, drop_last=False)

    mca = MeanClassAccuracy(num_classes)
    overall, id_acc, ood_acc = TopKAccuracy(), TopKAccuracy(), TopKAccuracy()
    cursor = 0
    for X, y in pipe.iter_eval():
        logits = forward(X)
        n = len(np.asarray(y))
        flags = is_ood[cursor : cursor + n]
        cursor += n
        yj = jnp.asarray(y)
        overall.update(np.asarray(topk_correct(logits, yj)), n)
        c, cnt = per_class_stats(logits, yj, num_classes)
        mca.update(np.asarray(c), np.asarray(cnt))
        for subset, metric in ((flags == 0, id_acc), (flags == 1, ood_acc)):
            if subset.any():
                idx = jnp.asarray(np.where(subset)[0])
                metric.update(np.asarray(topk_correct(logits[idx], yj[idx])), int(subset.sum()))

    result = {
        "mean_class_acc": mca.value,
        "overall_acc": overall.value[0],
        "id_acc": id_acc.value[0],
        "ood_acc": ood_acc.value[0],
        "n_id": id_acc.num_samples,
        "n_ood": ood_acc.num_samples,
    }
    logging.info("val_biased %s: %s", ckpt_path, result)
    return result


def main(ckpt_folder: str, net: str = "resnet50", batch_size: int = 16):
    """Sweep subfolders for checkpoints, like the reference __main__."""
    results = {}
    root = Path(ckpt_folder)
    candidates = []
    if (root / "ckpt").exists() or (root / "_METADATA").exists():
        candidates = [root]
    else:
        for folder in sorted(root.iterdir()):
            if folder.is_dir():
                for c in sorted(folder.iterdir()):
                    if c.is_dir() and ((c / "_METADATA").exists() or (c / "ckpt").exists()):
                        candidates.append(c)
    for ckpt in candidates:
        print(f"Running on {ckpt}")
        try:
            results[str(ckpt)] = evaluate_checkpoint(str(ckpt), net=net, batch_size=batch_size)
        except ValueError as e:  # strict-load mismatch: skip like the
            print(f"Failed to load model: {e}")  # reference main (:72-74)
            continue
        print(results[str(ckpt)])
    return results
