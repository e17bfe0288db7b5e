import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from saspa_tpu.data.datasets import AugSampler, FGVCAircraftFiles, FGVCDataset, get_datasets
from saspa_tpu.data.pipeline import InputPipeline

CLASSES = ["707-320", "A300B4", "BAE 146-200"]


@pytest.fixture(scope="module")
def aircraft_root(tmp_path_factory):
    """Mini FGVC-Aircraft-format tree with 12 train / 3 val / 3 test images."""
    root = tmp_path_factory.mktemp("FGVC-Aircraft")
    data = root / "fgvc-aircraft-2013b/data"
    (data / "images").mkdir(parents=True)
    (data / "variants.txt").write_text("\n".join(CLASSES) + "\n")
    rng = np.random.RandomState(0)
    entries = {"train": [], "val": [], "test": []}
    i = 1000000
    for split, count in [("train", 12), ("val", 3), ("test", 3)]:
        for j in range(count):
            i += 1
            cls = CLASSES[j % 3]
            entries[split].append(f"{i} {cls}")
            img = Image.fromarray(rng.randint(0, 255, (80, 100, 3), np.uint8))
            img.save(data / "images" / f"{i}.jpg")
    for split in entries:
        (data / f"images_variant_{split}.txt").write_text("\n".join(entries[split]) + "\n")
    return str(root)


def test_aircraft_files_parse(aircraft_root):
    ds = FGVCAircraftFiles(root=aircraft_root, split="train")
    assert len(ds.image_files) == 12
    assert ds.num_classes == 3
    assert set(ds.labels) == {0, 1, 2}


def test_fgvc_dataset_few_shot(aircraft_root):
    files = FGVCAircraftFiles(root=aircraft_root, split="train")
    ds = FGVCDataset(files, split="train", few_shot=2)
    assert len(ds) == 6  # 2 per class x 3 classes


def test_fgvc_dataset_train_sample_ratio(aircraft_root):
    files = FGVCAircraftFiles(root=aircraft_root, split="train")
    ds = FGVCDataset(files, split="train", train_sample_ratio=0.5)
    assert len(ds) == 6


@pytest.fixture()
def aug_json_file(aircraft_root, tmp_path):
    files = FGVCAircraftFiles(root=aircraft_root, split="train")
    mapping = {}
    augdir = tmp_path / "augs"
    augdir.mkdir()
    for p in files.image_files[:8]:  # 8 of 12 images have augs
        augs = []
        for k in range(3):
            ap = augdir / f"{Path(p).stem}_prompt_x_{k}.png"
            Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(ap)
            augs.append(str(ap))
        mapping[Path(p).name] = augs
    mapping[Path(files.image_files[8]).name] = []  # empty list entry
    jp = tmp_path / "aug.json"
    jp.write_text(json.dumps(mapping))
    return str(jp)


def test_aug_sampler_limit_and_ratio(aug_json_file):
    s = AugSampler(aug_json_file, aug_sample_ratio=0.5, limit_aug_per_image=2, seed=3)
    assert max(len(v) for v in s.aug_json.values()) <= 2
    assert all(v for v in s.aug_json.values())  # empty entries dropped

    # swap-rate statistics over many draws
    some_key = next(iter(s.aug_json))
    n, used = 4000, 0
    for i in range(n):
        out = s(f"/orig/{some_key}", idx=i)
        used += out != f"/orig/{some_key}"
    assert abs(used / n - 0.5) < 0.05


def test_aug_sampler_miss_returns_original(aug_json_file):
    s = AugSampler(aug_json_file, aug_sample_ratio=1.0, seed=0)
    out = s("/orig/not_in_json.jpg", idx=0)
    assert out == "/orig/not_in_json.jpg"


def test_aug_sampler_stop_aug(aug_json_file):
    s = AugSampler(aug_json_file, aug_sample_ratio=1.0, seed=0)
    s.stop_aug = True
    key = next(iter(s.aug_json))
    assert s(f"/x/{key}", 0) == f"/x/{key}"


def test_ratio_one_drops_images_without_augs(aircraft_root, aug_json_file):
    files = FGVCAircraftFiles(root=aircraft_root, split="train")
    ds = FGVCDataset(files, split="train", aug_json=aug_json_file, aug_sample_ratio=1.0)
    assert len(ds) == 8  # only the 8 with non-empty aug lists survive


def test_get_datasets_special_aug_combo(aircraft_root, monkeypatch):
    import saspa_tpu.data.datasets as D

    monkeypatch.setitem(D.FILES_REGISTRY, "planes", lambda split: FGVCAircraftFiles(root=aircraft_root, split=split))
    train, val, test, info = get_datasets("planes", special_aug="classic-cutmix")
    assert info["use_cutmix"] is True
    assert info["train_transform"] == "classic"
    assert len(train) == 12 and len(val) == 3 and len(test) == 3


def test_input_pipeline_shapes(aircraft_root):
    files = FGVCAircraftFiles(root=aircraft_root, split="train")
    ds = FGVCDataset(files, split="train")
    pipe = InputPipeline(ds, batch_size=4, resize=(32, 32), train_transform="classic", seed=1)
    batches = list(pipe.iter_train(epoch=0))
    assert len(batches) == 3
    X, y, y_soft = batches[0]
    assert X.shape == (4, 32, 32, 3)
    assert y.shape == (4,)
    assert y_soft is None
    # normalized floats, not uint8
    assert float(np.asarray(X).min()) < 0


def test_input_pipeline_cutmix_soft_labels(aircraft_root):
    files = FGVCAircraftFiles(root=aircraft_root, split="train")
    ds = FGVCDataset(files, split="train")
    pipe = InputPipeline(ds, batch_size=4, resize=(32, 32), train_transform="classic", use_cutmix=True, seed=1)
    X, y, y_soft = next(iter(pipe.iter_train(epoch=0)))
    soft = np.asarray(y_soft)
    assert soft.shape == (4, 3)
    assert np.allclose(soft.sum(-1), 1.0, atol=1e-5)


def test_input_pipeline_eval_deterministic(aircraft_root):
    files = FGVCAircraftFiles(root=aircraft_root, split="val")
    ds = FGVCDataset(files, split="val")
    pipe = InputPipeline(ds, batch_size=3, resize=(32, 32), drop_last=False)
    a = [np.asarray(x) for x, _ in pipe.iter_eval()]
    b = [np.asarray(x) for x, _ in pipe.iter_eval()]
    assert all(np.array_equal(x, y) for x, y in zip(a, b))


def test_create_val_split(aircraft_root):
    files = FGVCAircraftFiles(root=aircraft_root, split="train")
    ds = FGVCDataset(files, split="train", create_val_split=True, seed=1)
    assert len(ds._val_image_files) == int(12 * 0.33)
    assert len(ds) + len(ds._val_image_files) == 12
    # no overlap
    assert not set(ds._image_files) & set(ds._val_image_files)


def test_download_dataset_if_needed(tmp_path, monkeypatch):
    """Offline exercise of the auto-download path (dataset_utils.py:164-177)
    via a file:// tarball: fetch, extract, root appears; existing root
    short-circuits; unsupported datasets raise like the reference."""
    import tarfile

    from saspa_tpu.data.registry import BaseUtils

    # build a tiny archive whose top-level folder is the expected root name
    src = tmp_path / "stage" / "fgvc-aircraft-2013b"
    (src / "data").mkdir(parents=True)
    (src / "data" / "images_variant_train.txt").write_text("0001 707-320\n")
    tarball = tmp_path / "ds.tar.gz"
    with tarfile.open(tarball, "w:gz") as tf:
        tf.add(src, arcname="fgvc-aircraft-2013b")

    u = BaseUtils.__new__(BaseUtils)
    u.name = "planes"
    u.print_func = lambda *a: None
    root = tmp_path / "out" / "fgvc-aircraft-2013b"
    monkeypatch.setenv("SASPA_DATASET_URL_PLANES", tarball.as_uri())
    u.download_dataset_if_needed(root)
    assert (root / "data" / "images_variant_train.txt").read_text().startswith("0001")

    # existing root: no fetch attempted even with a bogus URL
    monkeypatch.setenv("SASPA_DATASET_URL_PLANES", "file:///nonexistent")
    u.download_dataset_if_needed(root)

    # datasets with no public archive raise with guidance
    u2 = BaseUtils.__new__(BaseUtils)
    u2.name = "cub"
    u2.print_func = lambda *a: None
    try:
        u2.download_dataset_if_needed(tmp_path / "nope")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "README" in str(e)


def test_get_datasets_special_aug_case_and_validation(aircraft_root, monkeypatch):
    """Miscased presets must still augment (a silently-ignored 'CLASSIC'
    would train center-crop-only); unknown presets must raise."""
    import saspa_tpu.data.datasets as D

    monkeypatch.setitem(D.FILES_REGISTRY, "planes", lambda split: FGVCAircraftFiles(root=aircraft_root, split=split))
    _, _, _, info = get_datasets("planes", special_aug="CLASSIC")
    assert info["train_transform"] == "classic"
    _, _, _, info = get_datasets("planes", special_aug="RandAug-CutMix".replace("CutMix", "cutmix"))
    assert info["train_transform"] == "randaug" and info["use_cutmix"] is True
    with pytest.raises(ValueError, match="special_aug"):
        get_datasets("planes", special_aug="not_a_preset")
