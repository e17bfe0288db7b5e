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


def test_packed_flash_matches_xla_interpret():
    """Packed-heads kernel (weight-padded head dim, exp2 softmax) vs plain
    XLA attention, in interpret mode so it runs on CPU."""
    import math

    from jax.experimental.pallas import tpu as pltpu

    from saspa_tpu.ops.attention import LOG2E, flash_attention_packed

    b, l, heads, d_pad = 2, 256, 4, 64
    d = 40  # real head dim; padded columns are zero
    hd = heads * d_pad
    q = jax.random.normal(jax.random.PRNGKey(0), (b, l, heads, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, l, heads, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, l, heads, d), jnp.float32)

    def padded(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, d_pad - d))).reshape(b, l, hd)

    scale = 1.0 / math.sqrt(d)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention_packed(padded(q) * (scale * LOG2E), padded(k), padded(v), heads)
    got = got.reshape(b, l, heads, d_pad)[..., :d]
    ref = _xla_attention(q * scale, k, v, 1.0)
    assert jnp.max(jnp.abs(got - ref)) < 2e-3
    # padded output columns are exactly zero
    with pltpu.force_tpu_interpret_mode():
        full = flash_attention_packed(padded(q), padded(k), padded(v), heads)
    assert jnp.all(full.reshape(b, l, heads, d_pad)[..., d:] == 0)


@pytest.mark.parametrize("l", [768, 1152])
def test_packed_flash_non_divisible_block(l):
    """lq divisible by 128 but NOT by the auto-picked block (512 for l<=1024,
    256 above): every query row must still be written (regression for the
    uninitialized-remainder bug — grid must use a block that divides lq)."""
    import math

    from jax.experimental.pallas import tpu as pltpu

    from saspa_tpu.ops.attention import LOG2E, _packed_block_q, flash_attention_packed

    assert l % _packed_block_q(l) == 0
    b, heads, d = 1, 2, 64
    hd = heads * d
    q = jax.random.normal(jax.random.PRNGKey(0), (b, l, hd), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, l, hd), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, l, hd), jnp.float32)
    scale = 1.0 / math.sqrt(d)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention_packed(q * (scale * LOG2E), k, v, heads)
    qh = (q * scale).reshape(b, l, heads, d)
    ref = _xla_attention(qh, k.reshape(b, l, heads, d), v.reshape(b, l, heads, d), 1.0)
    err = jnp.max(jnp.abs(got.reshape(b, l, heads, d) - ref))
    assert err < 2e-3, float(err)


def test_packed_block_q_selection():
    from saspa_tpu.ops.attention import _packed_block_q

    assert _packed_block_q(4096) == 256
    assert _packed_block_q(1024) == 512
    assert _packed_block_q(512) == 512
    assert _packed_block_q(768) == 256
    assert _packed_block_q(3456) == 128  # 3456 = 27*128
    assert _packed_block_q(256) == 256
    assert _packed_block_q(4096, block_q=512) == 512
    assert _packed_block_q(768, block_q=512) == 256


def test_packed_flash_vae_single_head():
    """The VAE's mid-block attention (1 head, d=512, 4096 tokens) takes the
    packed kernel on TPU (attention(): d == pad_head_dim(d)); pin its
    numerics in interpret mode."""
    import math

    from jax.experimental.pallas import tpu as pltpu

    from saspa_tpu.ops.attention import LOG2E, flash_attention_packed

    b, l, d = 1, 1024, 512  # smaller l for interpret-mode speed; same 1-head layout
    q = jax.random.normal(jax.random.PRNGKey(0), (b, l, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, l, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, l, d), jnp.float32)
    scale = 1.0 / math.sqrt(d)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention_packed(q * (scale * LOG2E), k, v, 1)
    ref = _xla_attention(
        (q * scale)[:, :, None, :].transpose(0, 1, 2, 3).reshape(b, l, 1, d),
        k.reshape(b, l, 1, d), v.reshape(b, l, 1, d), 1.0,
    )
    err = jnp.max(jnp.abs(got.reshape(b, l, 1, d) - ref))
    assert err < 2e-3, float(err)


@pytest.mark.parametrize("l", [256, 768])
def test_attention_block_megakernel_matches_separate_ops(l):
    """QKV+attention+to_out+residual megakernel vs the separate-op path."""
    import math

    from jax.experimental.pallas import tpu as pltpu

    from saspa_tpu.ops.attention import LOG2E, attention_block_fused

    b, heads, d_pad, c = 2, 2, 64, 96
    hd = heads * d_pad
    rng = np.random.RandomState(7)
    x_ln = jnp.asarray(rng.randn(b, l, c).astype(np.float32) * 0.3)
    res = jnp.asarray(rng.randn(b, l, c).astype(np.float32))
    wq = jnp.asarray(rng.randn(c, hd).astype(np.float32) * 0.05)
    wk = jnp.asarray(rng.randn(c, hd).astype(np.float32) * 0.05)
    wv = jnp.asarray(rng.randn(c, hd).astype(np.float32) * 0.05)
    wo = jnp.asarray(rng.randn(hd, c).astype(np.float32) * 0.05)
    bo = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    scale = 1.0 / math.sqrt(d_pad)

    q, k, v = x_ln @ wq, x_ln @ wk, x_ln @ wv
    ref_attn = _xla_attention(
        (q * scale).reshape(b, l, heads, d_pad),
        k.reshape(b, l, heads, d_pad), v.reshape(b, l, heads, d_pad), 1.0,
    ).reshape(b, l, hd)
    ref = res + (ref_attn @ wo + bo)

    with pltpu.force_tpu_interpret_mode():
        got = attention_block_fused(x_ln, res, wq * (scale * LOG2E), wk, wv, wo, bo, heads)
    err = np.abs(np.asarray(got) - np.asarray(ref)).max()
    scale_out = np.abs(np.asarray(ref)).max() + 1e-9
    assert err / scale_out < 2e-3, float(err / scale_out)


def test_packed_flash_compiled_tpu_tolerance():
    import math

    from saspa_tpu.ops.attention import LOG2E, flash_attention_packed, packed_flash_eligible

    if jax.default_backend() != "tpu":
        pytest.skip("compiled-kernel check needs TPU")
    b, l, heads, d_pad = 4, 1024, 8, 64
    hd = heads * d_pad
    assert packed_flash_eligible(l, l, heads, 40)
    q = jax.random.normal(jax.random.PRNGKey(0), (b, l, hd), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, l, hd), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, l, hd), jnp.bfloat16)
    scale = 1.0 / math.sqrt(64)
    got = flash_attention_packed((q * (scale * LOG2E)).astype(q.dtype), k, v, heads)
    qh = (q * scale).reshape(b, l, heads, 64)
    ref = _xla_attention(qh, k.reshape(b, l, heads, 64), v.reshape(b, l, heads, 64), 1.0)
    rel = jnp.max(jnp.abs(got.reshape(b, l, heads, 64).astype(jnp.float32) - ref.astype(jnp.float32)))
    rel = rel / (jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-9)
    assert rel < 0.02, float(rel)


def test_head_padded_proj_bias_pads_per_head():
    """use_bias=True with head padding: the (H*D,) bias must be zero-padded
    per head to the (H*D_pad,) output columns (a flat broadcast would either
    shape-error or bias the pad columns)."""
    from saspa_tpu.models.unet import _HeadPaddedProj

    heads, d, d_pad, cin = 2, 40, 64, 16
    m = _HeadPaddedProj(
        features=heads * d, heads=heads, d_pad=d_pad, in_features=cin,
        use_bias=True, dtype=jnp.float32,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 5, cin), jnp.float32)
    params = m.init(jax.random.PRNGKey(1), x)["params"]
    params = dict(params, bias=jax.random.normal(jax.random.PRNGKey(2), (heads * d,), jnp.float32))
    y = m.apply({"params": params}, x)
    assert y.shape == (3, 5, heads * d_pad)
    ref = x @ params["kernel"] + params["bias"]  # unpadded dense semantics
    yr = np.asarray(y).reshape(3, 5, heads, d_pad)
    np.testing.assert_allclose(
        yr[..., :d].reshape(3, 5, -1), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
    assert np.all(yr[..., d:] == 0.0)


def test_disable_pallas_env_read_at_trace_time(monkeypatch):
    """The SASPA_DISABLE_PALLAS escape hatch must observe env changes made
    AFTER import (tools/ab_interleave.py flips it per-arm in one process)."""
    from saspa_tpu.ops import attention as A
    from saspa_tpu.ops import groupnorm as G

    monkeypatch.delenv("SASPA_DISABLE_PALLAS", raising=False)
    monkeypatch.delenv("SASPA_DISABLE_PALLAS_GN", raising=False)
    monkeypatch.setenv("SASPA_PALLAS_GN", "1")  # GN defaults OFF since r4
    assert not A._disabled() and not G._disabled()
    monkeypatch.setenv("SASPA_DISABLE_PALLAS", "1")
    monkeypatch.setenv("SASPA_DISABLE_PALLAS_GN", "1")
    assert A._disabled() and G._disabled()
    # r4 default: kernel off unless opted in; force-disable wins over opt-in
    monkeypatch.delenv("SASPA_DISABLE_PALLAS_GN", raising=False)
    monkeypatch.delenv("SASPA_PALLAS_GN", raising=False)
    assert G._disabled()
