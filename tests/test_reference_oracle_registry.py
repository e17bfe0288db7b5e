"""Reference-as-oracle parity for the dataset-utils REGISTRY.

Executes the reference's own `all_utils/dataset_utils.py` classes (strictly
as untrusted data + an executable oracle; torchvision/clip/lpips stubbed at
sys.modules, torchvision auto-download no-op'd) on synthetic dataset trees
built in the EXACT on-disk formats — Stanford-Cars devkit .mat cell/struct
arrays written via scipy.io.savemat, DTD labels/<split><partition>.txt —
and asserts our registry (saspa_tpu/data/registry.py) reproduces:

  * original_images_paths (set equality — the reference uses unordered
    glob, ours sorts; sortedness asserted separately)
  * the train/val carve-out against the reference's REAL
    fgvc/datasets_files/cars_val.txt (we plant filenames from it)
  * image-stem/path -> class-string dicts (exact), class sets, num_classes,
    basic prompts, meta_class
  * same-class sampling (get_image_path_with_same_class) path sets

Refs: all_utils/dataset_utils.py:28-90 (BaseUtils), :148-162 (val carve),
:225-301 (CarsUtils .mat parsing), :302-341 (DTDUtils).

Skips cleanly without the reference checkout.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest
import scipy.io as sio

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not (REFERENCE / "all_utils" / "dataset_utils.py").exists(),
    reason="reference checkout not available",
)


@pytest.fixture()
def ref_du(monkeypatch):
    for name in (
        "torchvision", "torchvision.transforms", "clip", "clip.clip",
        "lpips", "wandb", "fgvc.datasets",
    ):
        sys.modules.setdefault(name, types.ModuleType(name))
    if str(REFERENCE) not in sys.path:
        sys.path.append(str(REFERENCE))
    import all_utils.dataset_utils as du

    # env-specific behavior, not dataset semantics: never try to download
    monkeypatch.setattr(
        du.BaseUtils, "download_torchvision_dataset_if_needed",
        lambda self, p: None,
    )
    return du


# --------------------------------------------------------------------------
# Stanford Cars: devkit .mat trees in the real format
# --------------------------------------------------------------------------
CARS_CLASSES = ["Acura TL Sedan 2012", "BMW M3 Coupe 2012", "Kia Rio Sedan 2011"]


def _make_cars_tree(root: Path):
    devkit = root / "devkit"
    devkit.mkdir(parents=True)
    (root / "cars_train").mkdir()

    # two real filenames from the reference's own val split file, so the
    # carve-out exercises the REAL datasets_files/cars_val.txt on both sides
    val_names = []
    with open(REFERENCE / "fgvc" / "datasets_files" / "cars_val.txt") as f:
        for line in f:
            line = line.strip()
            if line:
                val_names.append(line)
            if len(val_names) == 2:
                break
    assert len(val_names) == 2

    train_names = [f"{90000 + i:05d}.jpg" for i in range(5)]
    all_names = train_names + val_names
    for n in all_names:
        (root / "cars_train" / n).write_bytes(b"x")

    cell = np.empty((1, len(CARS_CLASSES)), dtype=object)
    for i, n in enumerate(CARS_CLASSES):
        cell[0, i] = np.array([n])
    sio.savemat(str(devkit / "cars_meta.mat"), {"class_names": cell})

    rec = np.zeros(
        (1, len(all_names)),
        dtype=[("bbox_x1", "O"), ("bbox_y1", "O"), ("bbox_x2", "O"),
               ("bbox_y2", "O"), ("class", "O"), ("fname", "O")],
    )
    for i, n in enumerate(all_names):
        for fld in ("bbox_x1", "bbox_y1", "bbox_x2", "bbox_y2"):
            rec[0, i][fld] = np.array([[10 * i]], dtype=np.uint16)
        rec[0, i]["class"] = np.array([[i % len(CARS_CLASSES) + 1]], dtype=np.uint8)
        rec[0, i]["fname"] = np.array([n])
    sio.savemat(str(devkit / "cars_train_annos.mat"), {"annotations": rec})
    return val_names


def test_cars_utils_matches_reference(tmp_path, ref_du):
    from saspa_tpu.data.registry import CarsUtils as OursCars

    val_names = _make_cars_tree(tmp_path)
    quiet = lambda *a, **k: None  # noqa: E731

    for split in ("train", "val"):
        ref = ref_du.CarsUtils(split=split, root_path=str(tmp_path), print_func=quiet)
        got = OursCars(split=split, root_path=str(tmp_path), print_func=quiet)

        assert set(ref.original_images_paths) == set(got.original_images_paths)
        assert got.original_images_paths == sorted(got.original_images_paths)
        if split == "val":
            assert sorted(Path(p).name for p in ref.original_images_paths) == sorted(val_names)

        assert ref.get_image_stem_to_class_str_dict() == got.get_image_stem_to_class_str_dict()
        assert set(ref.get_classes()) == set(got.get_classes())
        assert ref.num_classes == got.num_classes
        assert ref.get_basic_prompt() == got.get_basic_prompt()
        assert ref.meta_class == got.meta_class

    # same-class sampling (BLIP subject refs): path sets equal for every stem
    ref = ref_du.CarsUtils(split="train", root_path=str(tmp_path), print_func=quiet)
    got = OursCars(split="train", root_path=str(tmp_path), print_func=quiet)
    for p in ref.original_images_paths:
        assert set(ref.get_image_path_with_same_class(p)) == set(
            got.get_image_path_with_same_class(p)), p


# --------------------------------------------------------------------------
# DTD: labels/<split><partition>.txt trees
# --------------------------------------------------------------------------
def _make_dtd_tree(root: Path):
    classes = {"banded": 3, "dotted": 2, "zigzagged": 2}
    (root / "labels").mkdir(parents=True)
    rel = []
    for cls, n in classes.items():
        d = root / "images" / cls
        d.mkdir(parents=True)
        for i in range(n):
            name = f"{cls}_{i:04d}.jpg"
            (d / name).write_bytes(b"x")
            rel.append(f"{cls}/{name}")
    train = [r for i, r in enumerate(rel) if i % 3 != 0]
    val = [r for i, r in enumerate(rel) if i % 3 == 0]
    (root / "labels" / "train1.txt").write_text("\n".join(train) + "\n")
    (root / "labels" / "val1.txt").write_text("\n".join(val) + "\n")
    return train, val


def test_dtd_utils_matches_reference(tmp_path, ref_du):
    from saspa_tpu.data.registry import DTDUtils as OursDTD

    train, val = _make_dtd_tree(tmp_path)
    quiet = lambda *a, **k: None  # noqa: E731

    for split, names in (("train", train), ("val", val)):
        ref = ref_du.DTDUtils(split=split, partition=1, root_path=str(tmp_path), print_func=quiet)
        got = OursDTD(split=split, partition=1, root_path=str(tmp_path), print_func=quiet)

        # split lists come straight from the txt file: exact ORDER parity
        assert ref.original_images_paths == got.original_images_paths
        assert [Path(p).parent.name + "/" + Path(p).name for p in ref.original_images_paths] == names

        assert set(ref.all_original_images_paths) == set(got.all_original_images_paths)
        assert ref.get_image_path_to_class_str_dict() == got.get_image_path_to_class_str_dict()
        # reference get_classes is os.listdir (arbitrary order); ours sorts
        assert set(ref.get_classes()) == set(got.get_classes())
        assert sorted(got.get_classes()) == got.get_classes()
        assert ref.num_classes == got.num_classes
        assert ref.get_basic_prompt() == got.get_basic_prompt()
        assert ref.meta_class == got.meta_class


def test_compcars_parts_class_id_contract(ref_du):
    """The baseline-confidence filter keys on class IDS; for compcars-parts
    both sides derive them from the real datasets_files CSVs by
    sorted-unique-label order (all_utils/dataset_utils.py:416-434).  The
    methods are constructor-independent (they only read the CSV), so call
    them unbound on dummies — with images_folder pinned to the reference's
    literal 'data/compcars/part' prefix the returned dicts must be EQUAL,
    which also proves our datasets_files CSV copies match the reference's."""
    from saspa_tpu.data.registry import CompCarsPartsUtils

    ref_self = types.SimpleNamespace()
    ours_self = types.SimpleNamespace(images_folder=Path("data/compcars/part"))
    for split in ("train", "test"):
        ref = ref_du.CompCarsPartsUtils.get_image_path_to_class_id_dict(ref_self, split=split)
        got = CompCarsPartsUtils.get_image_path_to_class_id_dict(ours_self, split=split)
        assert ref == got
        assert len(ref) > 100  # the real CSVs, not a stub
        assert set(ref.values()) == set(range(max(ref.values()) + 1))


def test_planes_utils_matches_reference(tmp_path, ref_du):
    """PlanesUtils on a synthetic FGVC-Aircraft annotation tree: split file
    order, manufacturer+variant class join (all_utils/dataset_utils.py:180-223
    via utils.load_data), class sets, same-class sampling."""
    from saspa_tpu.data.registry import PlanesUtils as OursPlanes

    stems = ["1000001", "1000002", "1000003", "1000004"]
    makers = {"1000001": "Boeing", "1000002": "Airbus", "1000003": "Boeing",
              "1000004": "Boeing"}
    variants = {"1000001": "737-700", "1000002": "A320", "1000003": "737-700"}
    # 1000004 has a manufacturer but NO variant line -> excluded from the
    # class dict on both sides (reference joins on intersection)
    (tmp_path / "images").mkdir()
    (tmp_path / "images_train.txt").write_text("\n".join(stems) + "\n")
    (tmp_path / "images_manufacturer_train.txt").write_text(
        "".join(f"{s} {makers[s]}\n" for s in stems))
    (tmp_path / "images_variant_train.txt").write_text(
        "".join(f"{s} {variants[s]}\n" for s in stems if s in variants))

    quiet = lambda *a, **k: None  # noqa: E731
    ref = ref_du.PlanesUtils(split="train", root_path=str(tmp_path), print_func=quiet)
    got = OursPlanes(split="train", root_path=str(tmp_path), print_func=quiet)

    assert ref.original_images_paths == got.original_images_paths  # txt order
    assert ref.get_image_stem_to_class_str_dict() == got.get_image_stem_to_class_str_dict()
    assert "1000004" not in ref.get_image_stem_to_class_str_dict()
    assert set(ref.get_classes()) == set(got.get_classes())
    assert ref.num_classes == got.num_classes == 2
    assert ref.get_basic_prompt() == got.get_basic_prompt()
    assert ref.meta_class == got.meta_class
    for p in ref.original_images_paths[:3]:  # 1000004 has no class entry
        assert set(ref.get_image_path_with_same_class(p)) == set(
            got.get_image_path_with_same_class(p)), p


def _load_ref_cub_cls():
    """Load the reference CUB dataset class file directly (going through the
    fgvc.datasets package would import torchvision datasets)."""
    import importlib.util

    spec_w = importlib.util.spec_from_file_location(
        "fgvc.datasets.aug_wrapper_dataset",
        REFERENCE / "fgvc" / "datasets" / "aug_wrapper_dataset.py")
    wrapper = importlib.util.module_from_spec(spec_w)
    spec_w.loader.exec_module(wrapper)
    saved = sys.modules.get("fgvc.datasets.aug_wrapper_dataset")
    sys.modules["fgvc.datasets.aug_wrapper_dataset"] = wrapper
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_cub_dataset", REFERENCE / "fgvc" / "datasets" / "cub_dataset.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        if saved is None:
            sys.modules.pop("fgvc.datasets.aug_wrapper_dataset", None)
        else:
            sys.modules["fgvc.datasets.aug_wrapper_dataset"] = saved
    return mod.CUB


def test_cub_files_match_reference_class(tmp_path):
    """Our CUBFiles vs the reference's CUB dataset class on a synthetic
    CUB_200_2011 tree: images.txt/image_class_labels.txt/train_test_split.txt
    parsing, 0-based labels, and the val carve-out against the REAL
    datasets_files/cub_val.txt (planted tails). Exact order + label parity
    (fgvc/datasets/cub_dataset.py:39-82)."""
    from saspa_tpu.data.datasets import CUBFiles

    CUB = _load_ref_cub_cls()

    val_tails = []
    with open(REFERENCE / "fgvc" / "datasets_files" / "cub_val.txt") as f:
        for line in f:
            line = line.strip()
            if line:
                val_tails.append(line)
            if len(val_tails) == 2:
                break
    assert len(val_tails) == 2

    entries = [(f"{i:03d}", f"00{i}.SomeBird_{i}/img_{i:04d}.jpg", i % 3 + 1, 1 if i % 4 else 0)
               for i in range(1, 9)]
    # plant the two real val tails as extra TRAIN rows (is_training=1)
    for j, tail in enumerate(val_tails):
        entries.append((f"9{j:02d}", tail, j + 1, 1))

    (tmp_path / "images").mkdir()
    (tmp_path / "images.txt").write_text(
        "".join(f"{i} {p}\n" for i, p, _, _ in entries))
    (tmp_path / "image_class_labels.txt").write_text(
        "".join(f"{i} {l}\n" for i, _, l, _ in entries))
    (tmp_path / "train_test_split.txt").write_text(
        "".join(f"{i} {t}\n" for i, _, _, t in entries))

    for split in ("train", "val", "test"):
        ref = CUB(root=str(tmp_path), split=split, print_func=lambda *a, **k: None)
        got = CUBFiles(root=str(tmp_path), split=split)
        assert list(ref._image_files) == list(got.image_files), split
        assert list(ref._labels) == list(got.labels), split
    # the planted real-val-tail rows landed in val, nowhere else
    val = CUB(root=str(tmp_path), split="val", print_func=lambda *a, **k: None)
    assert sorted(str(Path(*Path(p).parts[-2:])) for p in val._image_files) == sorted(val_tails)


def _load_ref_compcars_cls():
    import importlib.util

    spec_w = importlib.util.spec_from_file_location(
        "fgvc.datasets.aug_wrapper_dataset",
        REFERENCE / "fgvc" / "datasets" / "aug_wrapper_dataset.py")
    wrapper = importlib.util.module_from_spec(spec_w)
    spec_w.loader.exec_module(wrapper)
    saved = sys.modules.get("fgvc.datasets.aug_wrapper_dataset")
    sys.modules["fgvc.datasets.aug_wrapper_dataset"] = wrapper
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_compcars_dataset",
            REFERENCE / "fgvc" / "datasets" / "compcars_dataset.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        if saved is None:
            sys.modules.pop("fgvc.datasets.aug_wrapper_dataset", None)
        else:
            sys.modules["fgvc.datasets.aug_wrapper_dataset"] = saved
    return mod.CompCars


def test_compcars_files_match_reference_class(monkeypatch):
    """Our CompCarsFiles vs the reference CompCars dataset class, both on the
    REAL compcars-parts CSVs: exact file/label order, sorted-unique label->id
    map, val carve-out on 5-part tails (fgvc/datasets/compcars_dataset.py:40-80).
    The reference resolves its csv path relative to CWD — chdir there."""
    from saspa_tpu.data.datasets import CompCarsFiles

    CompCars = _load_ref_compcars_cls()
    monkeypatch.chdir(REFERENCE)
    quiet = lambda *a, **k: None  # noqa: E731
    for split in ("train", "val", "test"):
        ref = CompCars(root="data/compcars/part", split=split, print_func=quiet)
        got = CompCarsFiles(root="data/compcars/part", split=split)
        assert list(ref._image_files) == list(got.image_files), split
        assert list(ref._labels) == list(got.labels), split
        assert ref.label_to_class_id_map == got.label_to_class_id_map
        assert ref.num_classes == len(set(got.labels)) or split == "val"
