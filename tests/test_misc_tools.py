import numpy as np
import pytest
from PIL import Image

from saspa_tpu.utils.misc_tools import (
    create_dict_image_path_to_augmented_images_paths,
    delete_files_in_folder_with_substr,
    get_same_class_image_names,
)


def test_delete_files_with_substr(tmp_path):
    for n in ["a_source.png", "b_source.png", "keep.png"]:
        (tmp_path / n).write_bytes(b"x")
    n = delete_files_in_folder_with_substr(str(tmp_path), "_source", max_num_files_to_delete=10)
    assert n == 2
    assert (tmp_path / "keep.png").exists()


def test_create_dict_image_path_to_aug_paths(tmp_path):
    (tmp_path / "12345_prompt_x_0.png").write_bytes(b"x")
    (tmp_path / "12345_source.png").write_bytes(b"x")
    d = create_dict_image_path_to_augmented_images_paths(str(tmp_path), ["/orig/12345.jpg"])
    assert len(d["/orig/12345.jpg"]) == 1
    assert "_source" not in d["/orig/12345.jpg"][0]


def test_same_class_sampling_with_stub(monkeypatch, tmp_path):
    import saspa_tpu.data.registry as R

    class StubPlanes:
        def __init__(self, split="train"):
            pass

        def get_image_stem_to_class_str_dict(self):
            return {"a1": "X", "a2": "X", "b1": "Y"}

    monkeypatch.setattr(R, "PlanesUtils", StubPlanes)
    d = get_same_class_image_names("planes", num_per_image=1, seed=0)
    assert set(d) == {"a1", "a2", "b1"}
    assert d["b1"] == ["b1"]  # only member of class Y
    assert d["a1"][0] in ("a1", "a2")
