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
