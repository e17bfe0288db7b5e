"""Per-dataset metadata registry (generation-side).

Framework-free port of the reference's BaseUtils hierarchy
(all_utils/dataset_utils.py:28-554): original train paths, class lists,
image->class dicts, basic prompts, meta classes, same-class sampling, and the
val-split-from-file carve-outs.  No torch anywhere: baseline-model loading
returns a Flax WSDAN_CAL (saspa_tpu.filters.confidence owns the actual
batched scoring).

Filesystem contracts (dataset roots, split-file formats, val txt files) are
identical to the reference so the same downloaded datasets work unchanged.
Split-definition assets live in <repo>/datasets_files/ (copied data files).
"""

from __future__ import annotations

import glob
import json
import logging
import os
from pathlib import Path
from typing import Dict, List, Optional

from saspa_tpu.utils.config import DATASETS_SUPPORTED  # single source of truth

REPO_ROOT = Path(__file__).resolve().parent.parent.parent
DATASETS_FILES = REPO_ROOT / "datasets_files"
DATA_ROOT = Path(os.environ.get("SASPA_DATA_ROOT", "data"))
CHECKPOINTS_DIR = Path(os.environ.get("SASPA_CHECKPOINTS", str(REPO_ROOT / "checkpoints")))


def load_kv_file(file_path) -> Dict[str, str]:
    """'<id> <info...>' lines -> dict (all_utils/utils.py:615-621)."""
    data = {}
    with open(file_path, "r") as f:
        for line in f:
            image_id, info = line.strip().split(" ", 1)
            data[image_id] = info
    return data


def _download_and_extract(url: str, root: Path) -> None:
    """Stream `url` to a temp file, extract (tar/zip) into a scratch dir, then
    MOVE the directory matching `root`'s name into place — archives carry
    their own top-level folder (e.g. fgvc-aircraft-2013b/data/...), so a
    blind extract-into-parent lands one level too deep for nested roots.
    file:// URLs work, which is how tests run this offline."""
    import shutil
    import tarfile
    import tempfile
    import urllib.request
    import zipfile

    root.parent.mkdir(parents=True, exist_ok=True)
    suffix = Path(url.split("?")[0]).name
    with tempfile.NamedTemporaryFile(dir=root.parent, suffix=f"_{suffix}", delete=False) as tmp:
        tmp_path = Path(tmp.name)
        with urllib.request.urlopen(url) as resp:
            shutil.copyfileobj(resp, tmp, length=1 << 20)
    scratch = Path(tempfile.mkdtemp(dir=root.parent, prefix="_extract_"))
    try:
        if tarfile.is_tarfile(tmp_path):
            with tarfile.open(tmp_path) as tf:
                tf.extractall(scratch, filter="data")
        elif zipfile.is_zipfile(tmp_path):
            with zipfile.ZipFile(tmp_path) as zf:
                zf.extractall(scratch)
        else:
            raise ValueError(f"unrecognized archive format: {url}")
        # locate the extracted dir that IS the expected root: shallowest dir
        # named root.name, preferring one whose parent matches root.parent
        cands = sorted(
            (p for p in scratch.rglob(root.name) if p.is_dir()),
            key=lambda p: len(p.parts),
        )
        best = next((p for p in cands if p.parent.name == root.parent.name), None)
        best = best or (cands[0] if cands else None)
        if best is None:
            raise FileNotFoundError(
                f"archive from {url} contains no directory named {root.name!r} "
                f"for expected root {root}"
            )
        shutil.move(str(best), str(root))
    finally:
        tmp_path.unlink(missing_ok=True)
        shutil.rmtree(scratch, ignore_errors=True)


class BaseUtils:
    name: str = ""
    meta_class: str = ""

    def __init__(self, split: str = "train", root_path: str = "", print_func=print):
        self.root_path = Path(root_path)
        self.split = split
        self.print_func = print_func
        self.original_images_paths: List[str] = []
        self.image_path_to_class_str_dict: Dict[str, str] = {}
        # download-on-construction, like the reference's
        # download_torchvision_dataset_if_needed in each Utils __init__
        # (all_utils/dataset_utils.py:164-177,184,309) — runs before the
        # subclass reads split files; manual datasets raise a pointed error
        # here instead of a bare FileNotFoundError later
        if self.name and str(root_path) and not self.root_path.exists():
            self.download_dataset_if_needed()

    # ---- interface -------------------------------------------------------
    def get_classes(self) -> List[str]:
        raise NotImplementedError

    @property
    def num_classes(self) -> int:
        return len(self.get_classes())

    def get_image_path_to_class_str_dict(self) -> Dict[str, str]:
        raise NotImplementedError

    def get_image_stem_to_class_str_dict(self) -> Dict[str, str]:
        raise NotImplementedError

    def get_image_path_to_class_id_dict(self, split: str = "train") -> Dict[str, int]:
        raise NotImplementedError

    def get_basic_prompt(self) -> str:
        raise NotImplementedError

    def get_image_path_with_same_class(self, image_path: str) -> List[str]:
        """Same-class image paths (BLIP-diffusion subject refs,
        all_utils/dataset_utils.py:67-76).  The class -> [keys] index is
        built lazily once: the driver calls this per (image, prompt) work
        item, and a full-dict scan per call is O(N^2) at worklist build."""
        key = Path(image_path).stem if self.name in ("planes", "cars") else image_path
        class_str = self.image_path_to_class_str_dict[key]
        if not hasattr(self, "_class_to_keys"):
            idx: Dict[str, List[str]] = {}
            for p, c in self.image_path_to_class_str_dict.items():
                idx.setdefault(c, []).append(p)
            self._class_to_keys = idx
        same = self._class_to_keys[class_str]
        if self.name in ("planes", "cars"):
            same = [str(self.images_folder / f"{p}.jpg") for p in same]
        return same

    # ---- shared helpers ---------------------------------------------------
    def _val_split_filter(self, split: str, paths: List[str], dataset_name: str, match="name") -> List[str]:
        """Carve a val split out of train using datasets_files/<ds>_val.txt
        (all_utils/dataset_utils.py:148-162)."""
        file_path = DATASETS_FILES / f"{dataset_name}_val.txt"
        with open(file_path) as f:
            val_files = set(line.strip() for line in f)

        def key(p):
            if match == "name":
                return Path(p).name
            if match == "full":
                return p
            raise ValueError(match)

        if split == "val":
            return [p for p in paths if key(p) in val_files]
        return [p for p in paths if key(p) not in val_files]

    def load_baseline_model(self, resize=(224, 224)):
        """Load the dataset's pre-trained WSDAN_CAL baseline for
        confidence-based filtering (all_utils/dataset_utils.py:87-115).

        Returns (model, params_variables, preprocess_fn). Checkpoints are
        saspa-format orbax dirs under checkpoints/<name>/ (one per dataset,
        converted from the released torch .pth with tools/convert_cal.py)."""
        from saspa_tpu.filters.confidence import load_cal_baseline

        name = "compcars" if "compcars" in self.name else self.name
        return load_cal_baseline(name, self.num_classes, resize=resize)

    def download_dataset_if_needed(self, root_path=None) -> None:
        """Fetch + extract the public dataset archive when the root is absent
        (all_utils/dataset_utils.py:164-177, sans torchvision).

        planes/planes_biased and dtd have stable public tarballs; cub and
        compcars-parts must be fetched manually (same error as the
        reference); cars' original Stanford URL is dead upstream (torchvision's
        download=True fails there too), so we point at the mirror.
        SASPA_DATASET_URL_<NAME> overrides the archive URL (also how tests
        exercise the fetch path offline, via file:// URLs)."""
        root = Path(root_path) if root_path is not None else self.root_path
        if root.exists():
            return
        urls = {
            "planes": "https://www.robots.ox.ac.uk/~vgg/data/fgvc-aircraft/archives/fgvc-aircraft-2013b.tar.gz",
            "planes_biased": "https://www.robots.ox.ac.uk/~vgg/data/fgvc-aircraft/archives/fgvc-aircraft-2013b.tar.gz",
            "dtd": "https://www.robots.ox.ac.uk/~vgg/data/dtd/download/dtd-r1.0.1.tar.gz",
        }
        env_key = f"SASPA_DATASET_URL_{self.name.replace('-', '_').upper()}"
        url = os.environ.get(env_key) or urls.get(self.name)
        if url is None:
            raise ValueError(
                f"{self.name} dataset has no auto-download source "
                "(compcars-parts/cub: download from the link in the README; "
                "cars: the Stanford URL is dead — use the Kaggle mirror)"
            )
        self.print_func(f"Dataset {self.name} not found at {root}; downloading {url}")
        _download_and_extract(url, root)

    def get_baseline_conf_threshold(self) -> Dict[str, float]:
        """Per-class mean-confidence thresholds for ALIA filtering, computed
        once and cached (all_utils/dataset_utils.py:117-146)."""
        json_path = Path(f"alia_confidence_thresholds/{self.name}.json")
        if json_path.exists():
            return json.load(open(json_path))
        from saspa_tpu.filters.confidence import compute_alia_thresholds

        thresholds = compute_alia_thresholds(self)
        json_path.parent.mkdir(parents=True, exist_ok=True)
        json.dump(thresholds, open(json_path, "w"))
        self.print_func(f"Saved baseline mean confidences to {json_path}")
        return thresholds


class PlanesUtils(BaseUtils):
    name = "planes"
    meta_class = "airplane"

    def __init__(self, split="train", root_path=None, print_func=print):
        root_path = root_path or str(DATA_ROOT / "FGVC-Aircraft/fgvc-aircraft-2013b/data")
        super().__init__(split, root_path, print_func)
        self.images_folder = self.root_path / "images"
        self.manufacturers_file_path = self.root_path / f"images_manufacturer_{split}.txt"
        self.variants_file_path = self.root_path / f"images_variant_{split}.txt"
        with open(self.root_path / f"images_{split}.txt") as f:
            self.image_names = f.read().splitlines()
        self.original_images_paths = [str(self.images_folder / f"{n}.jpg") for n in self.image_names]
        self.print_func(f"Loaded {len(self.original_images_paths)} images for planes")
        self.image_path_to_class_str_dict = self.get_image_stem_to_class_str_dict()

    def get_image_stem_to_class_str_dict(self):
        manufacturers = load_kv_file(self.manufacturers_file_path)
        variants = load_kv_file(self.variants_file_path)
        return {
            i: f"{manufacturers[i]} {variants[i]}" for i in manufacturers if i in variants
        }

    def get_image_path_to_class_id_dict(self, split="train"):
        from saspa_tpu.data.datasets import FGVCAircraftFiles

        ds = FGVCAircraftFiles(split=split)
        return dict(zip(ds.image_files, ds.labels))

    def get_classes(self):
        return list(set(self.image_path_to_class_str_dict.values()))

    def get_basic_prompt(self):
        return "a photo of an aircraft"


class CarsUtils(BaseUtils):
    name = "cars"
    meta_class = "car"

    def __init__(self, split="train", root_path=None, print_func=print):
        root_path = root_path or str(DATA_ROOT / "stanford_cars/stanford_cars")
        super().__init__(split, root_path, print_func)
        assert split in ("train", "val", "test")
        split_to_use = "train" if split == "val" else split
        self.devkit = self.root_path / "devkit"
        self.meta_file_path = self.devkit / "cars_meta.mat"
        self.annots_path = self.devkit / f"cars_{split_to_use}_annos.mat"
        self.images_folder = self.root_path / f"cars_{split_to_use}"
        self.original_images_paths = sorted(glob.glob(f"{self.images_folder}/*.jpg"))
        if split in ("train", "val"):
            self.original_images_paths = self._val_split_filter(split, self.original_images_paths, "cars")
        self.print_func(f"Loaded {len(self.original_images_paths)} images for cars, split {split}")
        self.image_path_to_class_str_dict = self.get_image_stem_to_class_str_dict()

    def get_image_stem_to_class_str_dict(self):
        import scipy.io as sio

        meta = sio.loadmat(self.meta_file_path)["class_names"]
        id_to_name = {i + 1: str(info[0]) for i, info in enumerate(meta[0])}
        out = {}
        for ann in sio.loadmat(self.annots_path)["annotations"][0]:
            image_id = Path(str(ann[-1][0])).stem
            class_id = int(ann[4][0][0])
            if class_id in id_to_name:
                out[image_id] = id_to_name[class_id]
        return out

    def get_image_path_to_class_id_dict(self, split="train"):
        from saspa_tpu.data.datasets import StanfordCarsFiles

        ds = StanfordCarsFiles(split=split)
        return dict(zip(ds.image_files, ds.labels))

    def get_classes(self):
        return list(set(self.get_image_stem_to_class_str_dict().values()))

    def get_basic_prompt(self):
        return "a photo of a car"


class DTDUtils(BaseUtils):
    name = "dtd"
    meta_class = "texture"

    def __init__(self, split="train", partition=1, root_path=None, print_func=print):
        root_path = root_path or str(DATA_ROOT / "DTD/dtdataset/dtd")
        super().__init__(split, root_path, print_func)
        self.images_folder = self.root_path / "images"
        self.all_original_images_paths = sorted(glob.glob(f"{self.images_folder}/*/*.jpg"))
        with open(self.root_path / "labels" / f"{split}{partition}.txt") as f:
            names = f.read().splitlines()
        self.original_images_paths = [str(self.images_folder / n) for n in names]
        self.print_func(
            f"Loaded {len(self.original_images_paths)} images for DTD split {split} partition {partition}"
        )
        self.image_path_to_class_str_dict = self.get_image_path_to_class_str_dict()

    def get_classes(self):
        return sorted(os.listdir(self.images_folder))

    def get_image_path_to_class_str_dict(self):
        return {p: Path(p).parent.name for p in self.all_original_images_paths}

    def get_image_path_to_class_id_dict(self, split="train"):
        from saspa_tpu.data.datasets import DTDFiles

        files, labels = [], []
        for s in ("train", "val", "test"):
            ds = DTDFiles(split=s)
            files.extend(ds.image_files)
            labels.extend(ds.labels)
        return dict(zip(files, labels))

    def get_basic_prompt(self):
        return "a photo of a texture"


class CompCarsPartsUtils(BaseUtils):
    name = "compcars-parts"
    meta_class = "car"
    part_to_string = {
        "1": "Headlight",
        "2": "Taillight",
        "3": "Fog light",
        "4": "front",
    }

    def __init__(self, split="train", root_path=None, print_func=print):
        root_path = root_path or str(DATA_ROOT / "compcars")
        super().__init__(split, root_path, print_func)
        assert split in ("train", "val", "test")
        split_to_use = "train" if split == "val" else split
        self.images_folder = self.root_path / "part"

        make_model = self._load_make_model_names()
        all_folders = glob.glob(f"{self.images_folder}/*/*")
        self.full_folder_path_to_make_model = {}
        for folder in all_folders:
            make_idx, model_idx = int(folder.split("/")[-2]), int(folder.split("/")[-1])
            self.full_folder_path_to_make_model[folder] = (
                f"{make_model['makes'].get(make_idx, '')} {make_model['models'].get(model_idx, '')}"
            )

        split_csv = DATASETS_FILES / "compcars-parts" / f"{split_to_use}.csv"
        all_csv = DATASETS_FILES / "compcars-parts" / "train_and_test.csv"
        self.original_images_paths = [
            str(self.images_folder / line.split(",")[0])
            for line in open(split_csv).read().splitlines()
        ]
        rows = [line.split(",") for line in open(all_csv).read().splitlines()]
        self.all_original_images_paths = [str(self.images_folder / r[0]) for r in rows]
        self.all_classes = sorted(set(r[1] for r in rows))

        if split in ("train", "val"):
            self.original_images_paths = self._val_split_filter(
                split, self.original_images_paths, "compcars_parts", match="tail5"
            )

        # NOTE: derived from THIS split's post-carve-out paths, exactly like
        # the reference (all_utils/dataset_utils.py:394-395 builds it from
        # self.original_images_paths too) — different splits can disagree on
        # class count/order; filtering always instantiates split='train' so
        # the baseline-model head matches.  We sort where the reference keeps
        # hash order (determinism improvement, same membership).
        self.all_classes_as_strings = sorted(
            set(
                self.full_folder_path_to_make_model.get(str(Path(p).parent.parent.parent), "")
                for p in self.original_images_paths
            )
        )
        self.print_func(f"Loaded {len(self.original_images_paths)} compcars-parts images, split {split}")
        self.image_path_to_class_str_dict = self.get_image_path_to_class_str_dict()

    def _load_make_model_names(self):
        import scipy.io as sio

        mat_path = self.root_path / "misc/make_model_name.mat"
        if not mat_path.exists():
            # the reference fails loudly here (all_utils/dataset_utils.py:357);
            # empty maps would silently collapse every class to " "
            raise FileNotFoundError(
                f"{mat_path} is required for compcars-parts class names "
                "(ships inside the CompCars misc/ folder)"
            )
        mat = sio.loadmat(mat_path)

        def clean(arr):
            out = {}
            for i, x in enumerate(arr):
                v = x[0]
                out[i + 1] = str(v.item() if hasattr(v, "item") and getattr(v, "size", 1) == 1 else v) if getattr(v, "size", 1) else ""
            return out

        return {"makes": clean(mat["make_names"]), "models": clean(mat["model_names"])}

    def _val_split_filter(self, split, paths, dataset_name, match="tail5"):
        file_path = DATASETS_FILES / f"{dataset_name}_val.txt"
        with open(file_path) as f:
            val_files = set(line.strip() for line in f)

        def key(p):
            return str(Path(*Path(p).parts[-5:]))

        if split == "val":
            return [p for p in paths if key(p) in val_files]
        return [p for p in paths if key(p) not in val_files]

    def get_classes(self):
        return self.all_classes_as_strings

    def get_image_path_to_class_str_dict(self):
        return {
            p: self.full_folder_path_to_make_model.get(str(Path(p).parent.parent.parent), "")
            for p in self.all_original_images_paths
        }

    def get_image_path_to_class_id_dict(self, split="train"):
        split_csv = DATASETS_FILES / "compcars-parts" / f"{split}.csv"
        files, labels = [], []
        for line in open(split_csv).read().splitlines():
            path, label = line.strip().split(",")
            files.append(str(self.images_folder / path))
            labels.append(label)
        label_map = {l: i for i, l in enumerate(sorted(set(labels)))}
        return {f: label_map[l] for f, l in zip(files, labels)}

    def get_basic_prompt(self, part: Optional[str] = None):
        if part:
            return f"close up of the {self.part_to_string[str(part)]} of a"
        return "close up of a car"

    def get_image_path_with_same_class(self, image_path: str):
        """Same class AND same car part (all_utils/dataset_utils.py:439-444)."""
        class_str = self.image_path_to_class_str_dict[image_path]
        part = image_path.split("/")[-2]
        return [
            p
            for p, c in self.image_path_to_class_str_dict.items()
            if c == class_str and p.split("/")[-2] == part
        ]


class CUBUtils(BaseUtils):
    name = "cub"
    meta_class = "bird"

    def __init__(self, split="train", root_path=None, print_func=print):
        root_path = root_path or str(DATA_ROOT / "CUB/CUB_200_2011")
        super().__init__(split, root_path, print_func)
        self.images_folder = self.root_path / "images"
        from saspa_tpu.data.datasets import CUBFiles

        ds = CUBFiles(split=split, root=str(self.root_path))
        self.original_images_paths = list(ds.image_files)
        self.print_func(f"Loaded {len(self.original_images_paths)} images for CUB")
        self.image_path_to_class_str_dict = self.get_image_path_to_class_str_dict()

    def get_image_path_to_class_str_dict(self):
        id_to_name = {}
        with open(self.root_path / "classes.txt") as f:
            for line in f:
                cid, cname = line.strip().split(" ", 1)
                id_to_name[int(cid) - 1] = cname.split(".", 1)[1]
        out = {}
        for p in self.original_images_paths:
            class_id = int(Path(p).parent.name.split(".")[0]) - 1
            out[p] = id_to_name[class_id]
        return out

    def get_image_path_to_class_id_dict(self, split="train"):
        from saspa_tpu.data.datasets import CUBFiles

        ds = CUBFiles(split=split, root=str(self.root_path))
        return dict(zip(ds.image_files, ds.labels))

    def get_classes(self):
        return list(set(self.image_path_to_class_str_dict.values()))

    def get_basic_prompt(self):
        return "a photo of a bird"


class PlanesBiasedUtils(BaseUtils):
    name = "planes"  # reference keeps name='planes' (all_utils/dataset_utils.py:493)
    meta_class = "airplane"

    def __init__(self, split="train", root_path=None, print_func=print):
        root_path = root_path or str(DATA_ROOT / "FGVC-Aircraft/fgvc-aircraft-2013b/data")
        super().__init__(split, root_path, print_func)
        self.images_folder = self.root_path / "images"
        # 'extra' rows are carved FROM the csv's val rows, and FGVC-Aircraft
        # ships no images_*_extra.txt — the reference crashes with
        # FileNotFoundError on split='extra' (all_utils/dataset_utils.py:
        # 502-503 builds the same nonexistent path); use the val annotation
        # files, which cover exactly those images
        ann_split = "val" if split == "extra" else split
        self.manufacturers_file_path = self.root_path / f"images_manufacturer_{ann_split}.txt"
        self.variants_file_path = self.root_path / f"images_variant_{ann_split}.txt"

        import pandas as pd

        csv_file = DATASETS_FILES / "aircraft_biased_dataset/alia_cotextual_bias_split.csv"
        df = pd.read_csv(csv_file)
        # split slicing rules (all_utils/dataset_utils.py:505-512)
        if split in ("train", "test"):
            df = df[df["Split"] == split]
        elif split == "val":
            df = df[df["Split"] == "val"][::2]
        elif split == "extra":
            df = df[df["Split"] == "val"][1::2]
        self.df = df
        self.image_names = [Path(f).stem for f in df["Filename"]]
        self.original_images_paths = [str(self.images_folder / f"{n}.jpg") for n in self.image_names]
        self.print_func(f"Loaded {len(self.original_images_paths)} images for planes biased {split}")
        self.image_path_to_class_str_dict = self.get_image_stem_to_class_str_dict()

    def get_image_stem_to_class_str_dict(self):
        manufacturers = load_kv_file(self.manufacturers_file_path)
        variants = load_kv_file(self.variants_file_path)
        return {i: f"{manufacturers[i]} {variants[i]}" for i in manufacturers if i in variants}

    def get_image_path_to_class_id_dict(self, split="train"):
        from saspa_tpu.data.datasets import PlanesBiasedFiles

        ds = PlanesBiasedFiles(split=split)
        return dict(zip(ds.image_files, ds.labels))

    def get_classes(self):
        return list(set(self.image_path_to_class_str_dict.values()))

    def get_basic_prompt(self):
        return "a photo of an aircraft"


DS_UTILS_DICT = {
    "planes": PlanesUtils,
    "cars": CarsUtils,
    "dtd": DTDUtils,
    "compcars-parts": CompCarsPartsUtils,
    "cub": CUBUtils,
    "planes_biased": PlanesBiasedUtils,
}
