import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saspa_tpu.ops.attention import _xla_attention, attention, flash_attention


def _qkv(b=2, lq=256, lk=256, h=2, d=40, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, lq, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, lk, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, lk, h, d).astype(np.float32))
    return q, k, v


def test_flash_attention_matches_xla_interpret():
    """Pallas kernel vs plain XLA attention, via the TPU interpreter on CPU."""
    from jax.experimental.pallas import tpu as pltpu

    q, k, v = _qkv()
    scale = 1.0 / np.sqrt(q.shape[-1])
    ref = _xla_attention(q * scale, k, v, 1.0)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, scale)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-3), (
        float(np.abs(np.asarray(out) - np.asarray(ref)).max())
    )


def test_flash_attention_padded_head_dim_exact():
    # head dim 40 (SD1.5) pads to 64; zero-padding must not change the result
    from jax.experimental.pallas import tpu as pltpu

    q, k, v = _qkv(d=40)
    q64, k64, v64 = _qkv(d=64, seed=0)
    scale = 1.0 / np.sqrt(40)
    ref = _xla_attention(q * scale, k, v, 1.0)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, scale)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_attention_wrapper_cross_attn_shapes():
    # short-kv cross attention takes the XLA path regardless of backend
    b, lq, lk, h, d = 2, 64, 77, 4, 16
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(b, lq, h * d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, lk, h * d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, lk, h * d).astype(np.float32))
    out = attention(q, k, v, num_heads=h)
    assert out.shape == (b, lq, h * d)
    # softmax rows sum to one -> output within value range
    assert np.isfinite(np.asarray(out)).all()


def test_flash_attention_compiled_tpu_tolerance():
    """On real TPU hardware, both the Pallas kernel and XLA attention use
    default MXU precision (bf16 multiply, fp32 accumulate), so they agree to
    ~bf16 rounding (rel ~3e-3 measured). Skipped off-TPU (interpret-mode tests
    above check exactness)."""
    if jax.default_backend() != "tpu":
        pytest.skip("compiled-kernel check needs TPU")
    q, k, v = _qkv(b=1, lq=512, lk=512, h=4, d=40, seed=3)
    scale = 1.0 / np.sqrt(40)
    ref = np.asarray(_xla_attention(q * scale, k, v, 1.0))
    out = np.asarray(flash_attention(q, k, v, scale))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 1e-2, rel
