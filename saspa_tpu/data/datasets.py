"""Dataset file lists + the AugWrapper sampling semantics (training-side).

Replaces the reference's torch Dataset hierarchy (fgvc/datasets/*): the six
dataset classes become plain file-list providers (no torchvision dependency —
annotation files are parsed directly), and AugWrapperDataset's stochastic
original/augmented swap (fgvc/datasets/aug_wrapper_dataset.py:144-185) becomes
`AugSampler`, a host-side index resolver feeding the batched input pipeline.

All split semantics are preserved: val carve-outs from datasets_files/*.txt,
few-shot K/class, train_sample_ratio subsetting, limit_aug_per_image, the
ratio==1 drop-images-without-augs rule, and the stop_aug kill-switch.
"""

from __future__ import annotations

import json
import logging
import random as pyrandom
import warnings
from pathlib import Path
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from saspa_tpu.data.registry import DATA_ROOT, DATASETS_FILES


# --------------------------------------------------------------------------
# file-list providers (one per dataset)
# --------------------------------------------------------------------------
class _Files:
    image_files: List[str]
    labels: List[int]
    classes: List[str]
    dataset_name: str

    @property
    def num_classes(self) -> int:
        return len(set(self.labels)) if not self.classes else len(self.classes)


class FGVCAircraftFiles(_Files):
    """FGVC-Aircraft variant-level annotations (torchvision-compatible)."""

    dataset_name = "planes"

    def __init__(self, root: Optional[str] = None, split: str = "train"):
        root = Path(root or (DATA_ROOT / "FGVC-Aircraft")) / "fgvc-aircraft-2013b/data"
        with open(root / "variants.txt") as f:
            self.classes = [l.strip() for l in f if l.strip()]
        class_to_idx = {c: i for i, c in enumerate(self.classes)}
        self.image_files, self.labels = [], []
        with open(root / f"images_variant_{split}.txt") as f:
            for line in f:
                image_id, variant = line.strip().split(" ", 1)
                self.image_files.append(str(root / "images" / f"{image_id}.jpg"))
                self.labels.append(class_to_idx[variant])


class CUBFiles(_Files):
    """CUB-200-2011 with the repo's val carve-out (fgvc/datasets/cub_dataset.py:18-89)."""

    dataset_name = "cub"

    def __init__(self, root: Optional[str] = None, split: str = "train"):
        root = Path(root or (DATA_ROOT / "CUB/CUB_200_2011"))
        image_path, image_label = {}, {}
        with open(root / "images.txt") as f:
            for line in f:
                i, p = line.strip().split(" ")
                image_path[i] = str(root / "images" / p)
        with open(root / "image_class_labels.txt") as f:
            for line in f:
                i, l = line.strip().split(" ")
                image_label[i] = int(l) - 1
        self.image_files, self.labels = [], []
        with open(root / "train_test_split.txt") as f:
            for line in f:
                i, is_train = line.strip().split(" ")
                want = int(is_train) if split in ("train", "val") else not int(is_train)
                if want:
                    self.image_files.append(image_path[i])
                    self.labels.append(image_label[i])
        if split in ("train", "val"):
            with open(DATASETS_FILES / "cub_val.txt") as f:
                val_files = set(l.strip() for l in f)
            keep_files, keep_labels = [], []
            for p, l in zip(self.image_files, self.labels):
                tail = str(Path(*Path(p).parts[-2:]))
                if (split == "val") == (tail in val_files):
                    keep_files.append(p)
                    keep_labels.append(l)
            self.image_files, self.labels = keep_files, keep_labels
        self.classes = [str(i) for i in range(200)]


class StanfordCarsFiles(_Files):
    """Stanford Cars via the devkit .mat annotations + cars_val.txt carve-out."""

    dataset_name = "cars"

    def __init__(self, root: Optional[str] = None, split: str = "train"):
        import scipy.io as sio

        root = Path(root or (DATA_ROOT / "stanford_cars")) / "stanford_cars"
        split_to_load = "train" if split == "val" else split
        devkit = root / "devkit"
        meta = sio.loadmat(devkit / "cars_meta.mat")["class_names"]
        self.classes = [str(c[0]) for c in meta[0]]
        if split_to_load == "test":
            annos_path = root / "cars_test_annos_withlabels.mat"
            if not annos_path.exists():
                # the devkit's cars_test_annos.mat has NO class field (only
                # bbox + fname) — parsing it would silently yield garbage
                # labels; torchvision's StanfordCars requires the
                # withlabels file for the test split too
                raise FileNotFoundError(
                    f"{annos_path} is required for the cars test split "
                    "(the devkit cars_test_annos.mat carries no class labels)"
                )
            images_dir = root / "cars_test"
        else:
            annos_path = devkit / "cars_train_annos.mat"
            images_dir = root / "cars_train"
        self.image_files, self.labels = [], []
        for ann in sio.loadmat(annos_path)["annotations"][0]:
            assert len(ann) >= 6, f"annotation in {annos_path} lacks a class field"
            fname = str(ann[-1][0])
            self.image_files.append(str(images_dir / fname))
            self.labels.append(int(ann[4][0][0]) - 1)
        if split in ("train", "val"):
            with open(DATASETS_FILES / "cars_val.txt") as f:
                val_files = set(l.strip() for l in f)
            keep_f, keep_l = [], []
            for p, l in zip(self.image_files, self.labels):
                if (split == "val") == (Path(p).name in val_files):
                    keep_f.append(p)
                    keep_l.append(l)
            self.image_files, self.labels = keep_f, keep_l


class DTDFiles(_Files):
    """DTD partition-1 splits (labels/{split}1.txt)."""

    dataset_name = "dtd"

    def __init__(self, root: Optional[str] = None, split: str = "train", partition: int = 1):
        root = Path(root or (DATA_ROOT / "DTD/dtdataset/dtd"))
        images = root / "images"
        self.classes = sorted(p.name for p in images.iterdir() if p.is_dir())
        class_to_idx = {c: i for i, c in enumerate(self.classes)}
        self.image_files, self.labels = [], []
        with open(root / "labels" / f"{split}{partition}.txt") as f:
            for line in f:
                rel = line.strip()
                if not rel:
                    continue
                self.image_files.append(str(images / rel))
                self.labels.append(class_to_idx[rel.split("/")[0]])


class CompCarsFiles(_Files):
    """CompCars parts dataset from the shipped csv splits
    (fgvc/datasets/compcars_dataset.py:19-90)."""

    dataset_name = "compcars"

    def __init__(self, root: Optional[str] = None, split: str = "train", dataset_type: str = "parts"):
        assert dataset_type == "parts"
        root = Path(root or (DATA_ROOT / "compcars/part"))
        split_to_load = "train" if split == "val" else split
        csv_path = DATASETS_FILES / "compcars-parts" / f"{split_to_load}.csv"
        files, raw_labels = [], []
        with open(csv_path) as f:
            for line in f:
                path, label = line.strip().split(",")
                files.append(str(root / path))
                raw_labels.append(label)
        # NOTE: label ids are derived from the split's OWN csv, exactly like
        # the reference (fgvc/datasets/compcars_dataset.py:52-55 sorts the
        # loaded split's unique labels) — train and test ids only agree
        # because both csvs carry the same label set; kept for parity
        label_map = {l: i for i, l in enumerate(sorted(set(raw_labels)))}
        self.label_to_class_id_map = label_map
        self.image_files = files
        self.labels = [label_map[l] for l in raw_labels]
        if split in ("train", "val"):
            with open(DATASETS_FILES / "compcars_parts_val.txt") as f:
                val_files = set(l.strip() for l in f)
            keep_f, keep_l = [], []
            for p, l in zip(self.image_files, self.labels):
                tail = str(Path(*Path(p).parts[-5:]))
                if (split == "val") == (tail in val_files):
                    keep_f.append(p)
                    keep_l.append(l)
            self.image_files, self.labels = keep_f, keep_l
        self.classes = sorted(label_map, key=label_map.get)


class PlanesBiasedFiles(_Files):
    """ALIA contextual-bias planes split (2 classes, airbus/boeing)."""

    dataset_name = "planes-biased"

    def __init__(self, root: Optional[str] = None, split: str = "train"):
        import pandas as pd

        root = Path(root or (DATA_ROOT / "FGVC-Aircraft"))
        images_path = root / "fgvc-aircraft-2013b/data/images"
        df = pd.read_csv(DATASETS_FILES / "aircraft_biased_dataset/alia_cotextual_bias_split.csv")
        if split in ("train", "test"):
            df = df[df["Split"] == split]
        elif split == "val":
            df = df[df["Split"] == "val"][::2]
        elif split == "extra":
            df = df[df["Split"] == "val"][1::2]
        self.df = df
        self.image_files = [str(images_path / Path(f).name) for f in df["Filename"]]
        self.labels = [int(l) for l in df["Label"]]
        self.classes = ["airbus", "boeing"]


FILES_REGISTRY = {
    "planes": FGVCAircraftFiles,
    "cub": CUBFiles,
    "cars": StanfordCarsFiles,
    "dtd": DTDFiles,
    "compcars-parts": CompCarsFiles,
    "planes_biased": PlanesBiasedFiles,
}


# --------------------------------------------------------------------------
# AugWrapper sampling semantics
# --------------------------------------------------------------------------
class AugSampler:
    """Stochastic original->augmented path substitution.

    Semantics from fgvc/datasets/aug_wrapper_dataset.py:106-171:
      * aug-JSON keys are original file *names*; values truncated to
        limit_aug_per_image; empty-valued keys dropped
      * with prob aug_sample_ratio pick a random aug path, else the original
      * usage-ratio telemetry warns if the observed swap rate < ratio/3
      * `stop_aug` disables substitution (stop_aug_after_epoch kill-switch)
    """

    def __init__(
        self,
        aug_json: str,
        aug_sample_ratio: float,
        limit_aug_per_image: Optional[int] = None,
        seed: int = 1,
        print_func=logging.info,
    ):
        assert 0 < aug_sample_ratio <= 1
        with open(aug_json) as f:
            mapping = json.load(f)
        mapping = {k: v[:limit_aug_per_image] for k, v in mapping.items() if v}
        assert len(mapping) > 0, "aug_json is empty"
        if limit_aug_per_image is not None:
            assert max(len(v) for v in mapping.values()) <= limit_aug_per_image
        self.aug_json = mapping
        self.aug_sample_ratio = aug_sample_ratio
        self.stop_aug = False
        self.times_used_orig_images = 0
        self.times_used_aug_images = 0
        self.print_func = print_func
        self._rng = pyrandom.Random(seed)

    def __call__(self, image_path: str, idx: int = 0) -> str:
        if self.stop_aug:
            return image_path
        used_aug = False
        out = image_path
        if self._rng.random() < self.aug_sample_ratio:
            candidates = self.aug_json.get(Path(image_path).name, [image_path]) or [image_path]
            out = self._rng.choice(candidates)
            used_aug = out != image_path
        if used_aug:
            self.times_used_aug_images += 1
        else:
            self.times_used_orig_images += 1
        total = self.times_used_aug_images + self.times_used_orig_images
        ratio_used = self.times_used_aug_images / total
        if idx % 100 == 0 and idx > 99 and ratio_used < self.aug_sample_ratio / 3:
            warnings.warn(
                f"Using augmented images might be lacking, ratio: {ratio_used:.4f} when it "
                f"should be around {self.aug_sample_ratio}."
            )
        return out


class FGVCDataset:
    """File-list dataset with AugWrapper behaviors; yields (path, label)."""

    def __init__(
        self,
        files: _Files,
        split: str = "train",
        train_sample_ratio: float = 1.0,
        aug_json: Optional[str] = None,
        aug_sample_ratio: Optional[float] = None,
        limit_aug_per_image: Optional[int] = None,
        few_shot: Optional[int] = None,
        seed: int = 1,
        print_func=logging.info,
        create_val_split: bool = False,
    ):
        assert not (few_shot and train_sample_ratio < 1)
        if few_shot is not None:
            create_val_split = False  # few-shot is train-only (aug_wrapper_dataset.py:19-20)
        self.files = files
        self.split = split
        self.is_train = "train" in split
        self.num_classes = files.num_classes
        self.dataset_name = files.dataset_name
        self._image_files = list(files.image_files)
        self._labels = list(files.labels)
        self.print_func = print_func
        self.seed = seed

        self._val_image_files: List[str] = []
        self._val_labels: List[int] = []
        if split == "train" and create_val_split:
            # carve a 33% val split out of train for K-fold style validation
            # (aug_wrapper_dataset.py:33-48)
            n = len(self._image_files)
            rng = pyrandom.Random(seed)
            val_idx = set(rng.sample(range(n), int(n * 0.33)))
            self._val_image_files = [self._image_files[i] for i in sorted(val_idx)]
            self._val_labels = [self._labels[i] for i in sorted(val_idx)]
            self._image_files = [f for i, f in enumerate(self._image_files) if i not in val_idx]
            self._labels = [l for i, l in enumerate(self._labels) if i not in val_idx]
            print_func(f"create_val_split: {len(self._val_image_files)} val / {len(self._image_files)} train")

        if self.is_train and train_sample_ratio < 1:
            self._use_subset(train_sample_ratio)
        if self.is_train and few_shot:
            self._use_few_shot(few_shot)

        print_func(f"DATASET: {self.dataset_name}, SPLIT: {split}")
        print_func(f"LEN DATASET: {len(self._image_files)}")
        print_func(f"NUM CLASSES: {self.num_classes}")

        self.aug_sampler: Optional[AugSampler] = None
        if self.is_train and aug_json and aug_sample_ratio and aug_sample_ratio > 0:
            self.aug_sampler = AugSampler(
                aug_json, aug_sample_ratio, limit_aug_per_image, seed=seed, print_func=print_func
            )
            if aug_sample_ratio == 1:
                # drop originals without augmentations (aug_wrapper_dataset.py:126-133)
                names = set(Path(p).name for p in self.aug_sampler.aug_json)
                keep = [i for i, p in enumerate(self._image_files) if Path(p).name in names]
                before = len(self._image_files)
                self._image_files = [self._image_files[i] for i in keep]
                self._labels = [self._labels[i] for i in keep]
                print_func(f"Using only images with augs: {len(keep)} of {before}")
            print_func(f"Using augmented images with ratio {aug_sample_ratio}")
        else:
            print_func("Not using DiffusionAug images")

    @property
    def stop_aug(self) -> bool:
        return self.aug_sampler.stop_aug if self.aug_sampler else True

    @stop_aug.setter
    def stop_aug(self, value: bool):
        if self.aug_sampler:
            self.aug_sampler.stop_aug = value

    def _use_subset(self, ratio: float):
        assert 0 < ratio <= 1
        n = int(len(self._image_files) * ratio)
        rng = np.random.RandomState(self.seed)
        idx = rng.choice(len(self._image_files), n, replace=False)
        self.print_func(f"With ratio {ratio}, using {n}/{len(self._image_files)} train images")
        self._image_files = [self._image_files[i] for i in idx]
        self._labels = [self._labels[i] for i in idx]

    def _use_few_shot(self, k: int):
        assert k > 0
        by_label: dict = {}
        for p, l in zip(self._image_files, self._labels):
            by_label.setdefault(l, []).append(p)
        files, labels = [], []
        short = {l: len(p) for l, p in by_label.items() if len(p) < k}
        for l, paths in by_label.items():
            taken = paths[:k]
            files += taken
            labels += [l] * len(taken)  # keep (file, label) aligned even short
        self._image_files, self._labels = files, labels
        # the reference asserts k images exist per class
        # (fgvc/datasets/aug_wrapper_dataset.py:89); name the deficient
        # classes instead of failing with a bare assert
        assert len(files) == self.num_classes * k, (
            f"few_shot={k} needs {k} train images per class; short classes "
            f"(label -> available): {short}"
        )
        self.print_func(f"Few-shot: {len(files)} images ({k}/class)")

    def __len__(self):
        return len(self._image_files)

    @property
    def labels(self) -> List[int]:
        """Post-filter (subset/few-shot/ratio-1-drop) label list — e.g. for
        samples-per-class statistics."""
        return list(self._labels)

    def item_path(self, idx: int) -> Tuple[str, int]:
        path, label = str(self._image_files[idx]), int(self._labels[idx])
        if self.is_train and self.aug_sampler is not None:
            path = self.aug_sampler(path, idx)
        return path, label


def get_datasets(
    dataset: str,
    resize: Tuple[int, int] = (224, 224),
    train_sample_ratio: float = 1.0,
    aug_json: Optional[str] = None,
    aug_sample_ratio: Optional[float] = None,
    limit_aug_per_image: Optional[int] = None,
    special_aug: Optional[str] = None,
    use_cutmix: bool = False,
    few_shot: Optional[int] = None,
    seed: int = 1,
    print_func=logging.info,
):
    """Factory mirroring fgvc/datasets/__init__.py:23-55.

    Returns (train, val, test, info) where info carries the transform names +
    cutmix flag for the input pipeline ('classic-cutmix' style combos split
    exactly like the reference)."""
    if special_aug is not None:
        # normalize case up front: an unrecognized preset string would fall
        # through train_transform_batch silently (center-crop only), so a
        # miscased flag must not disable augmentation
        special_aug = special_aug.lower()
    if special_aug is not None and "-" in special_aug:
        special_aug, cutmix_aug = special_aug.split("-")
        assert cutmix_aug == "cutmix", f"Unsupported cutmix augmentation {cutmix_aug}"
        use_cutmix = True
    if special_aug == "cutmix":
        # bare "cutmix" trains with NO stochastic transform: the reference's
        # get_transform(special_aug="cutmix") falls to its "Not using ANY
        # augmentation" center-crop branch (fgvc/util.py:301-309) while the
        # CutMix flag rides separately (fgvc/datasets/__init__.py:49-53)
        use_cutmix = True
        special_aug = None
    if special_aug not in (None, "classic", "classic_no_color", "randaug", "autoaug"):
        raise ValueError(
            f"unknown special_aug {special_aug!r}; expected one of classic / "
            f"classic_no_color / randaug / autoaug / cutmix or a '-cutmix' combo "
            f"(fgvc/util.py:255-315)"
        )

    if dataset not in FILES_REGISTRY:
        raise ValueError(f"Unsupported dataset {dataset}")
    cls = FILES_REGISTRY[dataset]

    def make(split, **kw):
        return FGVCDataset(cls(split=split), split=split, seed=seed, print_func=print_func, **kw)

    train = make(
        "train",
        train_sample_ratio=train_sample_ratio,
        aug_json=aug_json,
        aug_sample_ratio=aug_sample_ratio,
        limit_aug_per_image=limit_aug_per_image,
        few_shot=few_shot,
    )
    val = make("val")
    test = make("test")
    info = {
        "train_transform": special_aug,
        "resize": resize,
        "use_cutmix": use_cutmix,
        "num_classes": train.num_classes,
        # label-id order (class j == label j) — consumers that build per-class
        # batteries (e.g. the CLIP soft-target teacher) must use THIS order
        "classes": list(train.files.classes),
    }
    return train, val, test, info
