import numpy as np
import pytest

from saspa_tpu.ops.canny import canny_numpy, canny_batch

cv2 = pytest.importorskip("cv2")


def _synthetic_image(seed=0, size=128):
    """Structured test image: shapes + gradient background + noise."""
    rng = np.random.RandomState(seed)
    img = np.tile(np.linspace(40, 200, size, dtype=np.float32), (size, 1))
    img = np.stack([img, img[::-1], img.T], axis=-1)
    cv2.rectangle(img, (20, 20), (70, 90), (250, 30, 30), -1)
    cv2.circle(img, (90, 60), 25, (30, 240, 90), -1)
    cv2.line(img, (5, 120), (120, 5), (255, 255, 255), 2)
    img += rng.randn(size, size, 3) * 3
    return np.clip(img, 0, 255).astype(np.uint8)


def _f1(a, b):
    a, b = a > 0, b > 0
    tp = (a & b).sum()
    if a.sum() == 0 or b.sum() == 0:
        return 1.0 if a.sum() == b.sum() else 0.0
    prec = tp / max(a.sum(), 1)
    rec = tp / max(b.sum(), 1)
    return 2 * prec * rec / max(prec + rec, 1e-9)


def _dilated_f1(ours, ref):
    """F1 with 1-pixel tolerance (edges may shift by one pixel at boundaries)."""
    kernel = np.ones((3, 3), np.uint8)
    ref_d = cv2.dilate(ref, kernel)
    ours_d = cv2.dilate(ours, kernel)
    tp_o = ((ours > 0) & (ref_d > 0)).sum()
    tp_r = ((ref > 0) & (ours_d > 0)).sum()
    prec = tp_o / max((ours > 0).sum(), 1)
    rec = tp_r / max((ref > 0).sum(), 1)
    return 2 * prec * rec / max(prec + rec, 1e-9)


@pytest.mark.parametrize("low,high", [(120, 200), (50, 150)])
def test_canny_matches_cv2_statistically(low, high):
    img = _synthetic_image()
    ref = cv2.Canny(img, low, high)
    ours = canny_numpy(img, low, high)
    assert ours.shape == ref.shape
    assert ours.dtype == np.uint8
    score = _dilated_f1(ours, ref)
    assert score > 0.85, f"dilated F1 {score:.3f} too low vs cv2"


def test_canny_batch_consistent_with_single():
    imgs = np.stack([_synthetic_image(s) for s in range(3)])
    batched = np.asarray(canny_batch(imgs, 120, 200))
    for i in range(3):
        single = canny_numpy(imgs[i], 120, 200)
        assert np.array_equal(batched[i], single)


def test_canny_blank_image_no_edges():
    img = np.full((64, 64, 3), 128, np.uint8)
    out = canny_numpy(img, 120, 200)
    assert out.sum() == 0
