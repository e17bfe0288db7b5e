"""Reference-as-oracle parity for the DATA layer.

The reference's AugWrapperDataset (fgvc/datasets/aug_wrapper_dataset.py) is
pure Python + numpy + PIL and runs in this environment as-is — so instead of
builder-authored both-sides equivalence, these tests execute the reference
class directly (strictly as untrusted data + an executable oracle) and
assert OUR data layer reproduces it:

  * aug-path substitution is EXACT-STREAM parity: both sides draw from
    CPython's Mersenne Twister with the same call sequence
    (random() -> maybe choice()), so with equal seeds every chosen path and
    both usage counters must match draw for draw
    (aug_wrapper_dataset.py:144-171 vs saspa_tpu/data/datasets.py AugSampler)
  * ratio-1 drop, few-shot selection, train_sample_ratio subset and the
    create_val_split carve-out are deterministic-given-seed list transforms —
    compared exactly (val-split item ORDER is an implementation detail:
    reference keeps draw order, we sort; membership and the train list are
    exact).

Skips cleanly without the reference checkout.
"""

import json
import random
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not (REFERENCE / "fgvc" / "datasets" / "aug_wrapper_dataset.py").exists(),
    reason="reference checkout not available",
)


def _ref_cls():
    # load the module FILE directly: going through the fgvc.datasets package
    # would execute its __init__, which imports torchvision dataset classes
    # this environment does not have.  aug_wrapper_dataset.py itself is
    # stdlib + numpy + PIL only.
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_aug_wrapper_dataset",
        REFERENCE / "fgvc" / "datasets" / "aug_wrapper_dataset.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    AugWrapperDataset = mod.AugWrapperDataset

    class StubRef(AugWrapperDataset):
        """Child-class contract: the 4 attrs children must define
        (aug_wrapper_dataset.py:22-27) set before super().__init__."""

        def __init__(self, files, labels, num_classes, **kw):
            self._image_files = list(files)
            self._labels = list(labels)
            self.num_classes = num_classes
            self.dataset_name = "stub"
            super().__init__(root="stub", split=kw.pop("split", "train"),
                             print_func=lambda *a, **k: None, **kw)

    return StubRef


def _tree(tmp_path, n=12, n_classes=4, augs=None):
    """n originals + an aug json with edge cases: empty-list key, missing
    keys, a key with MORE augs than the limit."""
    imgs = []
    for i in range(n):
        p = tmp_path / f"img_{i:03d}.jpg"
        p.write_bytes(b"")  # get_aug_image never opens files
        imgs.append(str(p))
    labels = [i % n_classes for i in range(n)]
    mapping = {}
    if augs is not None:
        for i, k in augs:
            mapping[Path(imgs[i]).name] = [
                str(tmp_path / f"aug_{i:03d}_{j}.png") for j in range(k)]
    aug_json = tmp_path / "aug.json"
    aug_json.write_text(json.dumps(mapping))
    return imgs, labels, str(aug_json)


def _files_stub(imgs, labels, n_classes=4):
    """_Files is an attribute-contract base (subclasses fill the fields in
    their own __init__) — build one directly for the stub dataset."""
    from saspa_tpu.data.datasets import _Files

    f = _Files.__new__(_Files)
    f.image_files = list(imgs)
    f.labels = list(labels)
    f.classes = [f"c{i}" for i in range(n_classes)]
    f.dataset_name = "stub"
    return f


def test_aug_sampler_trajectory_exact(tmp_path):
    from saspa_tpu.data.datasets import AugSampler

    # keys: img 0 with 3 augs (limit truncates to 2), img 1 with 1 aug,
    # img 2 empty list (dropped at load), others missing
    imgs, labels, aug_json = _tree(
        tmp_path, augs=[(0, 3), (1, 1), (2, 0), (5, 2)])

    StubRef = _ref_cls()
    SEED = 11
    random.seed(SEED)  # the reference draws from the GLOBAL stream
    ref = StubRef(imgs, labels, 4, aug_json=aug_json, aug_sample_ratio=0.4,
                  limit_aug_per_image=2)
    ours = AugSampler(aug_json, 0.4, limit_aug_per_image=2, seed=SEED,
                      print_func=lambda *a, **k: None)

    # effective pools must agree after truncation + empty-drop
    assert ours.aug_json == ref.aug_json

    for step in range(400):
        path = imgs[step % len(imgs)]
        want = ref.get_aug_image(path, step)
        got = ours(path, step)
        assert got == want, (step, got, want)
    assert ours.times_used_aug_images == ref.times_used_aug_images
    assert ours.times_used_orig_images == ref.times_used_orig_images
    # sanity: the swap rate is in the ratio's neighborhood (not all-orig)
    assert ref.times_used_aug_images > 0


def test_ratio1_drop_parity(tmp_path):
    from saspa_tpu.data.datasets import FGVCDataset

    imgs, labels, aug_json = _tree(tmp_path, augs=[(0, 1), (3, 2), (7, 1)])
    StubRef = _ref_cls()
    random.seed(0)
    ref = StubRef(imgs, labels, 4, aug_json=aug_json, aug_sample_ratio=1.0)
    files = _files_stub(imgs, labels)
    ours = FGVCDataset(files, split="train", aug_json=aug_json,
                       aug_sample_ratio=1.0, print_func=lambda *a, **k: None)
    assert ours._image_files == [str(p) for p in ref._image_files]
    assert ours._labels == list(ref._labels)


def test_few_shot_parity(tmp_path):
    from saspa_tpu.data.datasets import FGVCDataset

    imgs, labels, _ = _tree(tmp_path, n=16, n_classes=4)
    StubRef = _ref_cls()
    ref = StubRef(imgs, labels, 4, few_shot=2)
    files = _files_stub(imgs, labels)
    ours = FGVCDataset(files, split="train", few_shot=2,
                       print_func=lambda *a, **k: None)
    assert ours._image_files == [str(p) for p in ref._image_files]
    assert ours._labels == list(ref._labels)


def test_subset_parity(tmp_path):
    from saspa_tpu.data.datasets import FGVCDataset

    imgs, labels, _ = _tree(tmp_path, n=12, n_classes=4)
    StubRef = _ref_cls()
    SEED = 3
    np.random.seed(SEED)  # the reference draws from the GLOBAL numpy stream
    ref = StubRef(imgs, labels, 4, train_sample_ratio=0.5)
    files = _files_stub(imgs, labels)
    ours = FGVCDataset(files, split="train", train_sample_ratio=0.5,
                       seed=SEED, print_func=lambda *a, **k: None)
    assert ours._image_files == [str(p) for p in ref._image_files]
    assert [int(l) for l in ours._labels] == [int(l) for l in ref._labels]


def test_val_split_parity(tmp_path):
    from saspa_tpu.data.datasets import FGVCDataset

    imgs, labels, _ = _tree(tmp_path, n=12, n_classes=4)
    StubRef = _ref_cls()
    SEED = 5
    random.seed(SEED)
    ref = StubRef(imgs, labels, 4, create_val_split=True)
    files = _files_stub(imgs, labels)
    ours = FGVCDataset(files, split="train", create_val_split=True,
                       seed=SEED, print_func=lambda *a, **k: None)
    # train list: exact (both preserve original order after exclusion)
    assert ours._image_files == [str(p) for p in ref._image_files]
    assert ours._labels == list(ref._labels)
    # val: same MEMBERSHIP (reference keeps draw order, we keep sorted order
    # — an implementation detail with no training-semantics consequence)
    assert set(ours._val_image_files) == set(str(p) for p in ref._val_image_files)
    assert sorted(zip(ours._val_image_files, ours._val_labels)) == sorted(
        zip((str(p) for p in ref._val_image_files), ref._val_labels))
