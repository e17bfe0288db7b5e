"""End-to-end training-runner integration test on a synthetic dataset."""

import json
from argparse import Namespace
from pathlib import Path

import numpy as np
import pytest
from PIL import Image


@pytest.fixture()
def planes_tree(tmp_path, monkeypatch):
    import saspa_tpu.data.datasets as D
    from saspa_tpu.data.datasets import FGVCAircraftFiles

    root = tmp_path / "FGVC-Aircraft"
    data = root / "fgvc-aircraft-2013b/data"
    (data / "images").mkdir(parents=True)
    classes = ["a", "b"]
    (data / "variants.txt").write_text("\n".join(classes) + "\n")
    rng = np.random.RandomState(0)
    i = 0
    for split, n in [("train", 16), ("val", 4), ("test", 4)]:
        lines = []
        for j in range(n):
            i += 1
            cls = classes[j % 2]
            lines.append(f"{i} {cls}")
            arr = (rng.rand(64, 64, 3) * 80).astype(np.uint8)
            arr[..., j % 2] += 120
            Image.fromarray(arr).save(data / "images" / f"{i}.jpg")
        (data / f"images_variant_{split}.txt").write_text("\n".join(lines))

    monkeypatch.setitem(
        D.FILES_REGISTRY, "planes", lambda split: FGVCAircraftFiles(root=str(root), split=split)
    )
    return tmp_path


@pytest.mark.slow
def test_run_training_end_to_end(planes_tree, tmp_path):
    from saspa_tpu.fgvc.runner import run_training

    args = Namespace(
        dataset="planes", seed=1, logdir=str(tmp_path / "logs/run"),
        epochs=1, learning_rate=1e-3, batch_size=8, weight_decay=None,
        net="resnet50", aug_json=None, aug_sample_ratio=None,
        limit_aug_per_image=None, stop_aug_after_epoch=None,
        special_aug="classic", train_sample_ratio=1.0,
        dont_use_wsdan=False, use_cutmix=False, use_target_soft_cross_entropy=False,
        few_shot=None, ckpt=None, wandb=False, image_size=(64, 64),
    )
    logs = run_training(args)
    assert "train_train_loss" in logs or "train_loss" in str(logs)
    # metrics.jsonl written
    metrics_files = list(Path(tmp_path / "logs").glob("**/metrics.jsonl"))
    assert metrics_files, "metrics.jsonl missing"
    lines = [json.loads(l) for l in open(metrics_files[0])]
    assert any("val_topk_accuracy" in l for l in lines)
    # best checkpoint saved (epoch 0 validates)
    ckpts = list(Path(tmp_path / "logs").glob("**/model.ckpt*"))
    assert ckpts, "no checkpoint saved"


def test_early_stop_semantics():
    """Plateaued best-val history stops after `patience` stale validations;
    an improving one never stops (the reference's own comparison is dead code
    — see Trainer.should_stop_early docstring)."""
    from types import SimpleNamespace

    from saspa_tpu.fgvc.train import Trainer

    def stops(history, patience=3):
        stub = SimpleNamespace(best_val_history=list(history),
                               cfg=SimpleNamespace(early_stop_patience=patience))
        return Trainer.should_stop_early(stub)

    assert not stops([10, 10, 10])          # too short: len must exceed patience
    assert stops([10, 10, 10, 10])          # 3 stale validations
    assert not stops([10, 11, 12, 13])      # still improving
    assert not stops([10, 10, 10, 11])      # improved on the last one
    assert stops([5, 11, 11, 11, 11])       # plateau after an early improvement
    # running-max history is monotone, so the reference's h[-1] < h[-p] never fires
    assert not stops([10, 12, 12, 13], patience=2)
