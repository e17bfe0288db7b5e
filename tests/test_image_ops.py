import numpy as np
import pytest

from saspa_tpu.ops.image import (
    HWC3,
    resize_shape_multiple_of_64,
    resize_image,
    center_crop_resize,
    normalize_imagenet,
)


def _reference_geometry(h, w, res):
    """Independent reimplementation of the reference's resize math
    (all_utils/utils.py:58-79) used as the test oracle."""
    H, W = float(h), float(w)
    k = float(res) / min(H, W)
    H *= k
    W *= k
    if H * W > 1_200_000:
        k2 = np.sqrt(1_200_000 / (H * W))
        H *= k2
        W *= k2
    return int(np.round(H / 64.0)) * 64, int(np.round(W / 64.0)) * 64


@pytest.mark.parametrize(
    "h,w,res",
    [
        (1024, 768, 512),
        (768, 1024, 512),
        (333, 500, 512),  # upscale
        (4000, 3000, 512),
        (2000, 3000, 1024),  # triggers the 1.2MP cap
        (512, 512, 512),
        (100, 3000, 512),  # extreme aspect
    ],
)
def test_resize_geometry_matches_reference(h, w, res):
    eh, ew = _reference_geometry(h, w, res)
    gh, gw, _ = resize_shape_multiple_of_64(h, w, res)
    assert (gh, gw) == (eh, ew)
    assert gh % 64 == 0 and gw % 64 == 0


def test_resize_image_shapes_and_dtype():
    img = (np.random.rand(333, 500, 3) * 255).astype(np.uint8)
    out = resize_image(img, 512)
    eh, ew = _reference_geometry(333, 500, 512)
    assert out.shape == (eh, ew, 3)
    assert out.dtype == np.uint8


def test_hwc3_variants():
    g = (np.random.rand(8, 8) * 255).astype(np.uint8)
    assert HWC3(g).shape == (8, 8, 3)
    rgba = (np.random.rand(8, 8, 4) * 255).astype(np.uint8)
    out = HWC3(rgba)
    assert out.shape == (8, 8, 3) and out.dtype == np.uint8
    rgb = (np.random.rand(8, 8, 3) * 255).astype(np.uint8)
    assert np.array_equal(HWC3(rgb), rgb)


def test_center_crop_resize_shape():
    x = np.random.rand(2, 300, 400, 3).astype(np.float32)
    out = center_crop_resize(x, (224, 224))
    assert out.shape == (2, 224, 224, 3)


def test_normalize_imagenet_zero_mean_on_mean_image():
    x = np.ones((4, 4, 3), np.float32) * np.array([0.485, 0.456, 0.406], np.float32)
    out = np.asarray(normalize_imagenet(x))
    assert np.allclose(out, 0, atol=1e-6)
