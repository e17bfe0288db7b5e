import numpy as np
import pytest

from saspa_tpu.native import (
    canny_u8,
    native_available,
    normalize_crop_batch_f32,
    resize_batch_u8,
    resize_bilinear_u8,
)


def test_native_builds():
    assert native_available(), "g++ build of libsaspa_host.so failed"


def test_resize_downscale_matches_cv2_area_exactly():
    # the reference resizes with cv2.INTER_AREA on downscale
    # (all_utils/utils.py:78); our native area kernel is bit-exact vs it
    cv2 = pytest.importorskip("cv2")
    img = (np.random.RandomState(0).rand(90, 120, 3) * 255).astype(np.uint8)
    ours = resize_bilinear_u8(img, 64, 64)
    ref = cv2.resize(img, (64, 64), interpolation=cv2.INTER_AREA)
    assert np.array_equal(ours, ref)


def test_batch_resize_consistent():
    imgs = (np.random.RandomState(1).rand(4, 50, 70, 3) * 255).astype(np.uint8)
    batch = resize_batch_u8(imgs, 32, 32)
    for i in range(4):
        assert np.array_equal(batch[i], resize_bilinear_u8(imgs[i], 32, 32))


def test_normalize_crop():
    imgs = np.full((2, 40, 40, 3), 255, np.uint8)
    out = normalize_crop_batch_f32(imgs, 4, 4, 32, 32, [0.5, 0.5, 0.5], [0.5, 0.5, 0.5])
    assert out.shape == (2, 32, 32, 3)
    assert np.allclose(out, 1.0, atol=1e-5)  # (1.0 - 0.5) / 0.5


def test_native_canny_vs_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(0)
    img = np.zeros((80, 80, 3), np.uint8)
    cv2.circle(img, (40, 40), 20, (255, 255, 255), -1)
    img = (img.astype(np.float32) + rng.randn(80, 80, 3) * 2).clip(0, 255).astype(np.uint8)
    ours = canny_u8(img, 120, 200)
    ref = cv2.Canny(img, 120, 200)
    both = ((ours > 0) & (ref > 0)).sum()
    union = ((ours > 0) | (ref > 0)).sum()
    assert both / max(union, 1) > 0.8
