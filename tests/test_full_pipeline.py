"""Full three-stage pipeline integration: generate -> filter -> train.

The reference's only integration path is manual: a DEBUG run of
run_aug/run_aug.py, the filter call it makes at the end (run_aug.py:721),
then fgvc/train.py pointed at the produced aug-JSON.  This test drives the
same loop through the library APIs the CLI wraps, on a synthetic
FGVC-Aircraft tree with the tiny model configs:

  1. the generation driver writes the exact reference aug-folder layout,
  2. the filter stage builds the aug-JSON artifact from that folder,
  3. the training dataset consumes the artifact and actually substitutes
     augmented paths, and a full training run completes on it.

Uses the REAL PlanesUtils / FGVCAircraftFiles against the synthetic tree
(not stubs), so the split-file parsing and the 40-char stem matching
contract (all_utils/utils.py:342-354) are exercised end to end.
"""

import json
from argparse import Namespace
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from saspa_tpu.diffusion.pipelines import DiffusionPipeline
from saspa_tpu.gen.driver import run_generation
from saspa_tpu.utils.config import GenerationConfig
from tests.test_diffusion_pipeline import TINY_TEXT, TINY_UNET, TINY_VAE

CLASSES = [("Boeing", "707-320"), ("Airbus", "A320")]


@pytest.fixture()
def fgvc_tree(tmp_path, monkeypatch):
    """Synthetic FGVC-Aircraft tree with the real annotation-file layout.
    7-digit ids (like the real dataset) keep the 40-char stem substring
    match unambiguous."""
    root = tmp_path / "FGVC-Aircraft"
    data = root / "fgvc-aircraft-2013b/data"
    (data / "images").mkdir(parents=True)
    (data / "variants.txt").write_text("\n".join(v for _, v in CLASSES) + "\n")
    rng = np.random.RandomState(0)
    i = 2000000
    for split, n in [("train", 8), ("val", 4), ("test", 4)]:
        names, manu, var = [], [], []
        for j in range(n):
            i += 1
            m, v = CLASSES[j % 2]
            names.append(str(i))
            manu.append(f"{i} {m}")
            var.append(f"{i} {v}")
            arr = (rng.rand(64, 64, 3) * 80).astype(np.uint8)
            arr[..., j % 2] += 120
            Image.fromarray(arr).save(data / "images" / f"{i}.jpg")
        (data / f"images_{split}.txt").write_text("\n".join(names) + "\n")
        (data / f"images_manufacturer_{split}.txt").write_text("\n".join(manu) + "\n")
        (data / f"images_variant_{split}.txt").write_text("\n".join(var) + "\n")

    import saspa_tpu.data.datasets as D
    import saspa_tpu.data.registry as R

    monkeypatch.setitem(
        R.DS_UTILS_DICT, "planes",
        lambda print_func=print: R.PlanesUtils(root_path=str(data), print_func=print_func),
    )
    monkeypatch.setitem(
        D.FILES_REGISTRY, "planes",
        lambda split: D.FGVCAircraftFiles(root=str(root), split=split),
    )
    return data


def test_generate_filter_train(fgvc_tree, tmp_path):
    # ---- stage 1: generate (tiny SD pipe, reference folder/naming contract)
    cfg = GenerationConfig(
        dataset="planes", base_model="sd_v1.5", controlnet=None, num_per_image=2,
        seed=1, prompt_type="gpt-meta_class", prompt_with_sub_class=True,
        use_artistic_prompts=True, artistic_prompts_prob=0.5,
        resolution=64, guidance_scale=7.5, num_inference_steps=2, batch_size=4,
    )
    pipe = DiffusionPipeline(
        base_model="sd_v1.5", controlnet=None, sampler="ddim", dtype=jnp.float32,
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfgs=TINY_TEXT,
    )
    out_folder = run_generation(cfg, pipe=pipe)
    gen_files = [
        f for f in Path(out_folder).glob("*.png")
        if "_source" not in f.name and "_control" not in f.name
    ]
    assert len(gen_files) == 16  # 8 train images x 2 prompts

    # ---- stage 2: filter -> aug-JSON artifact (scoring filters off: the
    # contract under test is collection/matching/side-file exclusion)
    from saspa_tpu.filters.aug_json import create_json_of_image_name_to_augmented_images_paths

    jp = create_json_of_image_name_to_augmented_images_paths(
        "planes", out_folder, semantic_filtering=False,
        model_confidence_based_filtering=False, init_log=False,
    )
    mapping = json.load(open(jp))
    assert len(mapping) == 8 and all(len(v) == 2 for v in mapping.values())

    # ---- stage 3a: the training dataset consumes the artifact and swaps
    from saspa_tpu.data.datasets import get_datasets

    train, _, _, _ = get_datasets(
        "planes", resize=(64, 64), aug_json=jp, aug_sample_ratio=1.0,
        limit_aug_per_image=2, seed=1, print_func=lambda *a: None,
    )
    paths = [train.item_path(i)[0] for i in range(len(train))]
    assert len(paths) == 8  # ratio-1 drop kept all (every image has augs)
    assert all("aug_data" in p for p in paths)  # ratio 1.0 => every sample swapped

    # ---- stage 3b: full training run on the generated artifact
    from saspa_tpu.fgvc.runner import run_training

    args = Namespace(
        dataset="planes", seed=1, logdir=str(tmp_path / "logs/full_pipeline"),
        epochs=1, learning_rate=1e-3, batch_size=8, weight_decay=None,
        net="resnet50", aug_json=jp, aug_sample_ratio=0.5,
        limit_aug_per_image=2, stop_aug_after_epoch=None,
        special_aug="classic", train_sample_ratio=1.0,
        dont_use_wsdan=False, use_cutmix=False, use_target_soft_cross_entropy=False,
        few_shot=None, ckpt=None, wandb=False, image_size=(64, 64),
    )
    logs = run_training(args)
    assert logs  # finished an epoch
    metrics_files = list((tmp_path / "logs").glob("**/metrics.jsonl"))
    assert metrics_files, "metrics.jsonl missing"
