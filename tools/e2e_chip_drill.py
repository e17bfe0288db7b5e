"""On-chip end-to-end drill: gen -> filter -> train through the REAL CLI.

The CPU integration test (tests/test_full_pipeline.py) drives the three-stage
loop with tiny model configs through the library APIs.  This drill is the
production-shaped counterpart: it builds a synthetic FGVC-Aircraft tree, then
shells out to `python -m saspa_tpu.cli` exactly as a user would — full-size
SD1.5 + canny ControlNet generation at 512２ on the real chip, the chained
semantic + model-confidence filter, and a WSDAN-CAL r101 training run on the
produced aug-JSON.  (Reference equivalent: a DEBUG=1 run of run_aug/run_aug.py
:50,351-355 followed by fgvc/train.py — the reference's only integration path.)

Weights: whatever SASPA_WEIGHTS / checkpoints/ provide; in the zero-egress dev
environment every model falls back to seeded random init (mechanics are real,
pixels are not).  Prints ONE JSON line with per-stage wall times.

    python -m tools.e2e_chip_drill [--images 16] [--root /tmp/saspa_e2e] [--keep]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
from PIL import Image

REPO = Path(__file__).resolve().parent.parent
CLASSES = [("Boeing", "707-320"), ("Airbus", "A320")]


def build_tree(root: Path, n_train: int) -> Path:
    """Synthetic FGVC-Aircraft tree with the real annotation-file layout
    (same shape as the torchvision download PlanesUtils expects —
    all_utils/dataset_utils.py:180-223)."""
    data = root / "FGVC-Aircraft/fgvc-aircraft-2013b/data"
    if data.exists():
        shutil.rmtree(root)
    (data / "images").mkdir(parents=True)
    (data / "variants.txt").write_text("\n".join(v for _, v in CLASSES) + "\n")
    rng = np.random.RandomState(0)
    i = 2000000
    # val/test must be >= 2x the train batch (config_planes bs=4 -> eval batch
    # 8 with drop_last, reference fgvc/train.py:316-319) or val reads 0
    for split, n in [("train", n_train), ("val", 8), ("test", 8)]:
        names, manu, var = [], [], []
        for j in range(n):
            i += 1
            m, v = CLASSES[j % 2]
            names.append(str(i))
            manu.append(f"{i} {m}")
            var.append(f"{i} {v}")
            # photo-like smooth image (pure noise makes canny hysteresis
            # iterate to its worst case) with a class-colored band
            g = np.linspace(40, 215, 448, dtype=np.float32)
            arr = np.stack([np.tile(g, (336, 1))] * 3, -1)
            arr[100:200, :, j % 2] += 40
            arr += rng.rand(336, 448, 3).astype(np.float32) * 8
            Image.fromarray(arr.clip(0, 255).astype(np.uint8)).save(
                data / "images" / f"{i}.jpg"
            )
        (data / f"images_{split}.txt").write_text("\n".join(names) + "\n")
        (data / f"images_manufacturer_{split}.txt").write_text("\n".join(manu) + "\n")
        (data / f"images_variant_{split}.txt").write_text("\n".join(var) + "\n")
    return data


def run_cli(args: list[str], env: dict) -> float:
    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, "-m", "saspa_tpu.cli", *args],
        cwd=str(REPO), env=env, text=True, capture_output=True,
    )
    dt = time.perf_counter() - t0
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:] + "\n" + r.stderr[-8000:] + "\n")
        raise SystemExit(f"cli {args[0]} failed (rc={r.returncode})")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=16, help="train images in the synthetic tree")
    ap.add_argument("--num_per_image", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--root", default="/tmp/saspa_e2e")
    ap.add_argument("--keep", action="store_true", help="don't delete the tree afterwards")
    args = ap.parse_args()

    root = Path(args.root)
    data = build_tree(root, args.images)

    env = dict(os.environ, SASPA_DATA_ROOT=str(root))
    result = {"images": args.images, "num_per_image": args.num_per_image}

    # ---- stage 1: generate (run_aug.py:713 parity)
    result["gen_s"] = round(run_cli([
        "gen", "--dataset", "planes", "--num_per_image", str(args.num_per_image),
        "--seed", "1", "--batch_size", "8", "--skip_filter",
    ], env), 1)
    pngs = sorted((root / "FGVC-Aircraft").rglob("*_prompt_*.png"))
    assert len(pngs) == args.images * args.num_per_image, f"expected {args.images * args.num_per_image} augs, got {len(pngs)}"

    # ---- stage 2: standalone filter (all_utils/utils.py:821-839 parity).
    # Confidence-only: the semantic filter's argmax-of-7-prompts verdict is
    # meaningless under random CLIP weights (it can kill every aug and an
    # all-empty aug-JSON correctly refuses to train — aug_wrapper_dataset.py
    # :114), while top-10-of-2-classes membership always keeps, so the drill
    # stays deterministic whatever weights are present.
    aug_images_dir = str(pngs[0].parent)
    result["filter_s"] = round(run_cli([
        "filter", "--dataset", "planes", "--aug_folder", aug_images_dir,
        "--no_semantic_filtering",
    ], env), 1)

    # the filter writes the aug-JSON with the deterministic name encoding the
    # filter config (all_utils/utils.py:194)
    jsons = sorted((root / "FGVC-Aircraft").rglob("*aug.json"), key=lambda p: p.stat().st_mtime)
    assert jsons, "no aug-JSON produced"
    aug_json = str(jsons[-1])
    mapping = json.load(open(aug_json))
    result["aug_json"] = os.path.basename(aug_json)
    result["originals_with_augs"] = sum(1 for v in mapping.values() if v)
    result["surviving_augs"] = sum(len(v) for v in mapping.values())
    assert result["surviving_augs"] > 0, "confidence-only filter kept nothing"

    # ---- stage 3: train on the artifact (fgvc/train.py flag parity)
    logdir = str(root / "logs")
    result["train_s"] = round(run_cli([
        "train", "--dataset", "planes", "--aug_json", aug_json,
        "--aug_sample_ratio", "0.4", "--limit_aug_per_image", "2",
        "--special_aug", "classic", "--seed", "1",
        "--epochs", str(args.epochs), "--logdir", logdir,
    ], env), 1)

    # init_logging timestamps the last path component: <root>/<date>_logs
    metrics = sorted(root.rglob("metrics.jsonl"), key=lambda p: p.stat().st_mtime)
    assert metrics, "training wrote no metrics.jsonl"
    rows = [json.loads(l) for l in open(metrics[-1])]
    val_rows = [r for r in rows if "val_topk_accuracy" in r]
    assert val_rows, "no validation metrics logged"
    result["last_val"] = val_rows[-1]
    result["ok"] = True
    if not args.keep:
        shutil.rmtree(root)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
