import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saspa_tpu.ops.augment import (
    autocontrast,
    center_crop_batch,
    color_jitter_batch,
    cutmix_batch,
    equalize,
    hflip_batch,
    posterize,
    randaugment_batch,
    random_crop_batch,
    solarize,
    train_transform_batch,
    val_transform_batch,
)


def _imgs(n=4, h=40, w=40, seed=0):
    return jnp.asarray(np.random.RandomState(seed).rand(n, h, w, 3).astype(np.float32))


def test_random_crop_shapes_and_determinism():
    x = _imgs()
    a = random_crop_batch(x, jax.random.PRNGKey(0), (32, 32))
    b = random_crop_batch(x, jax.random.PRNGKey(0), (32, 32))
    c = random_crop_batch(x, jax.random.PRNGKey(1), (32, 32))
    assert a.shape == (4, 32, 32, 3)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_hflip_half_rate():
    x = _imgs(n=256, h=4, w=4)
    out = hflip_batch(x, jax.random.PRNGKey(0))
    flipped = np.mean([
        np.array_equal(np.asarray(out[i]), np.asarray(x[i, :, ::-1])) for i in range(256)
    ])
    assert 0.35 < flipped < 0.65


def test_color_jitter_bounds():
    x = _imgs()
    out = np.asarray(color_jitter_batch(x, jax.random.PRNGKey(0)))
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_photometric_ops_identity_edges():
    x = _imgs(n=1)[0]
    assert np.allclose(np.asarray(posterize(x, 8.0)), np.asarray(x), atol=1 / 255)
    assert np.allclose(np.asarray(solarize(x, 1.01)), np.asarray(x))
    ac = np.asarray(autocontrast(x))
    assert ac.min() >= 0 and ac.max() <= 1
    eq = np.asarray(equalize(x))
    assert eq.shape == x.shape


def test_randaugment_runs_and_varies():
    x = _imgs()
    a = np.asarray(randaugment_batch(x, jax.random.PRNGKey(0)))
    b = np.asarray(randaugment_batch(x, jax.random.PRNGKey(7)))
    assert a.shape == x.shape
    assert np.isfinite(a).all()
    assert not np.allclose(a, b)


def test_cutmix_soft_labels_consistent():
    x = _imgs(n=8)
    y = jnp.arange(8) % 3
    mixed, y_hard, y_soft = cutmix_batch(x, y, jax.random.PRNGKey(0), num_classes=3)
    soft = np.asarray(y_soft)
    assert mixed.shape == x.shape
    assert np.allclose(soft.sum(-1), 1.0, atol=1e-5)
    assert np.array_equal(np.asarray(y_hard), np.asarray(y))


@pytest.mark.parametrize("preset", ["classic", "classic_no_color", "randaug", None])
def test_train_transform_presets(preset):
    x = jnp.asarray((np.random.rand(2, 36, 36, 3) * 255).astype(np.uint8))
    out = train_transform_batch(x, jax.random.PRNGKey(0), preset, 32, 32)
    assert out.shape == (2, 32, 32, 3)
    assert out.dtype == jnp.float32


def test_val_transform_center_crop():
    x = jnp.asarray((np.random.rand(2, 36, 36, 3) * 255).astype(np.uint8))
    out = val_transform_batch(x, 32, 32)
    assert out.shape == (2, 32, 32, 3)
    # deterministic
    out2 = val_transform_batch(x, 32, 32)
    assert np.array_equal(np.asarray(out), np.asarray(out2))


def test_autoaugment_runs_and_varies():
    from saspa_tpu.ops.augment import autoaugment_batch

    x = _imgs(n=6)
    a = np.asarray(autoaugment_batch(x, jax.random.PRNGKey(0)))
    b = np.asarray(autoaugment_batch(x, jax.random.PRNGKey(3)))
    assert a.shape == x.shape
    assert np.isfinite(a).all()
    assert not np.allclose(a, b)


def test_autoaug_preset_in_transform():
    x = jnp.asarray((np.random.rand(2, 36, 36, 3) * 255).astype(np.uint8))
    out = train_transform_batch(x, jax.random.PRNGKey(0), "autoaug", 32, 32)
    assert out.shape == (2, 32, 32, 3)


def test_autoaugment_bin_formulas_match_torchvision():
    """AutoAugment 10-bin magnitude space (torchvision _augmentation_space):
    posterize bits 8 - round(4*bin/9) -> [8,8,7,7,6,6,5,5,4,4]; solarize
    threshold linspace(255,0,10)/255 = 1 - bin/9.  The ops consume the
    fraction directly — a fixed-at-build value was the round-3 double-scaling
    bug (ops ran at 30% strength)."""
    import jax.numpy as jnp

    from saspa_tpu.ops.augment import posterize, solarize

    # keep below 1.0: PIL solarize inverts pixels >= threshold, so an exact
    # 1.0 pixel flips even at the bin-0 threshold of 1.0
    x = jnp.asarray(np.linspace(0, 0.99, 256, dtype=np.float32).reshape(16, 16, 1))
    for mag_bin, want_bits in enumerate([8, 8, 7, 7, 6, 6, 5, 5, 4, 4]):
        s = mag_bin / 9.0
        got = np.asarray(posterize(x, 8.0 - np.round(4.0 * s)))
        want = np.asarray(posterize(x, float(want_bits)))
        np.testing.assert_array_equal(got, want)
    # bin 0 (threshold 1.0): nothing below 1.0 inverts; bin 9 (threshold 0):
    # everything inverts to 1-x
    assert np.allclose(np.asarray(solarize(x, 1.0 - 0.0)), np.asarray(x))
    np.testing.assert_allclose(np.asarray(solarize(x, 1.0 - 1.0)), 1.0 - np.asarray(x), atol=1e-6)


def test_randaugment_strength_fraction():
    """RandAugment magnitude 9 of 31 bins = 0.3 of max; rotation at that
    strength must actually move pixels ~9 degrees (the double-scaling bug
    capped it at ~2.7)."""
    import jax

    from saspa_tpu.ops.augment import _randaug_ops

    ops = _randaug_ops(64)
    rot = ops[5]
    img = np.zeros((64, 64, 3), np.float32)
    img[28:36, :, :] = 1.0  # horizontal bar
    out9 = np.asarray(rot(jnp.asarray(img), 9 / 30.0))
    out30 = np.asarray(rot(jnp.asarray(img), 1.0))
    # 9-degree rotation displaces the bar ends by ~|x|*sin(9deg) ~ 5px at the
    # edge; 30-degree much more. Compare column-wise mass displacement.
    def vertical_spread(a):
        ys = np.where(a[..., 0] > 0.5)[0]
        return ys.max() - ys.min()

    base = vertical_spread(img)
    assert vertical_spread(out9) > base + 6   # ~64*tan(9deg)=10 rows
    assert vertical_spread(out30) > vertical_spread(out9) + 10


def test_equalize_matches_pil_exactly():
    """PIL/torchvision equalize uses a STEP-based LUT (identity when
    step == 0, cumulative-histogram-excluding-self otherwise) — assert exact
    uint8 agreement with ImageOps.equalize, including a skewed histogram."""
    from PIL import Image as PILImage
    from PIL import ImageOps

    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 256, (37, 23, 3), np.uint8)
    u8[:10] = 250  # heavy top bin exercises the (total - last_bin) step math
    pil = np.asarray(ImageOps.equalize(PILImage.fromarray(u8)))
    got = np.asarray(equalize(jnp.asarray(u8, jnp.float32) / 255.0))
    got_u8 = np.clip(np.round(got * 255.0), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got_u8, pil)


def test_equalize_flat_image_identity():
    x = jnp.full((16, 16, 3), 0.5)
    np.testing.assert_allclose(np.asarray(equalize(x)), np.asarray(x), atol=1e-6)


def test_autocontrast_flat_channel_identity():
    """torchvision autocontrast leaves a constant channel UNCHANGED
    (minimum substituted with 0, maximum with bound); it must not zero a
    saturated channel."""
    x = jnp.ones((8, 8, 3)) * jnp.asarray([1.0, 0.25, 0.0])
    np.testing.assert_allclose(np.asarray(autocontrast(x)), np.asarray(x), atol=1e-6)


def test_autocontrast_stretches_to_full_range():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.uniform(0.2, 0.7, (16, 16, 3)).astype(np.float32))
    out = np.asarray(autocontrast(x))
    assert out.min() < 1e-6 and out.max() > 1 - 1e-6
