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


@pytest.mark.slow
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


@pytest.fixture()
def biased_tree(tmp_path, monkeypatch):
    """Synthetic planes tree where aug-training MUST beat no-aug:

    the class signal is a channel-mean shift; train ORIGINALS carry it on the
    WRONG channel (anti-correlated with val/test), while the augmented images
    are fresh draws with the signal on the right one.  A model trained on the
    originals learns the inverted rule and scores ~0 on val; only the augs
    lead to val accuracy.  (A first design used a brightness-spurious cue
    instead — the resnet generalized around it to 100/100; anti-correlation
    leaves no such escape.)  This makes the aug sampling + loss wiring
    OBSERVABLE: if the AugSampler silently stopped swapping (or the aug-JSON
    stopped resolving), the aug run would collapse to the inverted-rule score
    (VERDICT r3 item 8)."""
    root = tmp_path / "FGVC-Aircraft"
    data = root / "fgvc-aircraft-2013b/data"
    (data / "images").mkdir(parents=True)
    (data / "variants.txt").write_text("\n".join(v for _, v in CLASSES) + "\n")
    rng = np.random.RandomState(7)

    def true_signal_img(cls):
        arr = rng.randint(40, 150, size=(64, 64, 3)).astype(np.int32)
        arr[..., cls] += 100  # the TRUE class signal: one channel shifted
        return np.clip(arr, 0, 255).astype(np.uint8)

    def anti_img(cls):
        return true_signal_img(1 - cls)  # signal on the WRONG channel

    i = 2000000
    stems = {"train": [], "val": [], "test": []}
    for split, n in [("train", 8), ("val", 16), ("test", 16)]:
        names, manu, var = [], [], []
        for j in range(n):
            i += 1
            cls = j % 2
            m, v = CLASSES[cls]
            names.append(str(i))
            manu.append(f"{i} {m}")
            var.append(f"{i} {v}")
            img = anti_img(cls) if split == "train" else true_signal_img(cls)
            Image.fromarray(img).save(data / "images" / f"{i}.jpg")
            stems[split].append((str(i), cls))
        (data / f"images_{split}.txt").write_text("\n".join(names) + "\n")
        (data / f"images_manufacturer_{split}.txt").write_text("\n".join(manu) + "\n")
        (data / f"images_variant_{split}.txt").write_text("\n".join(var) + "\n")

    # augmented images: true-signal fresh draws, driver naming contract
    aug_folder = tmp_path / "aug_data/planes/images"
    aug_folder.mkdir(parents=True)
    for stem, cls in stems["train"]:
        for k in range(2):
            Image.fromarray(true_signal_img(cls)).save(
                aug_folder / f"{stem}_prompt_a photo of an airplane_{k}.png"
            )

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
    return data, str(aug_folder)


def _train_and_val_acc(tmp_path, tag, aug_json, epochs=40):
    """Returns the FINAL validation's top-1 (not the best — the no-aug run
    starts near chance and converges to ~0 as it learns the inverted rule;
    the endpoint is the trained behavior under test).  40 epochs: BN running
    stats (momentum 0.9) need ~35 updates before eval-mode accuracy reflects
    the trained model at all."""
    from saspa_tpu.fgvc.runner import run_training

    args = Namespace(
        dataset="planes", seed=3, logdir=str(tmp_path / f"logs/{tag}"),
        epochs=epochs, learning_rate=1e-3, batch_size=8, weight_decay=None,
        net="resnet50", aug_json=aug_json, aug_sample_ratio=1.0,
        limit_aug_per_image=2, stop_aug_after_epoch=None,
        special_aug=None, train_sample_ratio=1.0,
        dont_use_wsdan=False, use_cutmix=False, use_target_soft_cross_entropy=False,
        few_shot=None, ckpt=None, wandb=False, image_size=(32, 32),
        plot_per_class_acc=(aug_json is not None),  # drives the plot hook too
    )
    logs = run_training(args)
    acc = logs["val_topk_accuracy"]
    return acc[0] if isinstance(acc, list) else acc


@pytest.mark.slow
def test_aug_training_beats_no_aug(biased_tree, tmp_path):
    """Accuracy-direction rehearsal without real weights: same seeds, same
    budget, the ONLY difference is the aug-JSON — mirrors the reference's
    claim that SaSPA augmentation lifts accuracy (BASELINE.md table;
    fgvc/train.py:496-500 wiring)."""
    data, aug_folder = biased_tree

    from saspa_tpu.filters.aug_json import create_json_of_image_name_to_augmented_images_paths

    jp = create_json_of_image_name_to_augmented_images_paths(
        "planes", aug_folder, semantic_filtering=False,
        model_confidence_based_filtering=False, init_log=False,
    )
    mapping = json.load(open(jp))
    assert len(mapping) == 8 and all(len(v) == 2 for v in mapping.values())

    acc_no_aug = _train_and_val_acc(tmp_path, "no_aug", None)
    acc_aug = _train_and_val_acc(tmp_path, "aug", jp)

    # no-aug learns the anti-correlated rule -> ~0 on val; aug sees the true
    # signal -> high. Measured on TPU: 100.0 vs 0.0 (seed 3). Wide margins
    # keep the guard robust to backend numerics.
    assert acc_aug > acc_no_aug + 40.0, (acc_aug, acc_no_aug)
    assert acc_aug >= 85.0, acc_aug
    assert acc_no_aug <= 35.0, acc_no_aug

    # the --plot_per_class_acc hook was active on the aug run (init_logging
    # nests a timestamped save_dir under the logdir)
    plots = list((tmp_path / "logs").glob("**/plots/val/*.png"))
    assert plots, "per-class accuracy plot PNG missing"
