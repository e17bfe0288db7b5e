"""Fused LN+GEGLU kernel vs the separate-op path (interpret mode on CPU).

The kernel fuses norm3 + proj_in + gelu-gate + proj_out + residual
(models/unet.py BasicTransformerBlock); reference engine: diffusers
BasicTransformerBlock norm3/FeedForward(GEGLU).  Differences vs the
separate-op path are bf16 rounding only (the kernel's gelu-gate runs on the
fp32 dot accumulators — strictly tighter than the fallback's bf16 gelu).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from saspa_tpu.ops.geglu import _pick_block_q, fused_ln_geglu


def _reference(x, lns, lnb, w1, b1, w2, b2, eps=1e-5):
    """The exact separate-op fallback: LayerNorm32 bf16-normalize + bf16
    Dense GEGLU + residual."""
    d = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean)
    mul = jax.lax.rsqrt(var + eps) * lns
    xn = (x - mean.astype(d)) * mul.astype(d) + lnb.astype(d)
    h = xn @ w1.astype(d) + b1.astype(d)
    h, gate = jnp.split(h, 2, axis=-1)
    h = h * jax.nn.gelu(gate, approximate=False)
    return x + (h @ w2.astype(d) + b2.astype(d))


@pytest.mark.parametrize("b,l,c", [(2, 256, 128), (1, 512, 64), (2, 64, 256)])
def test_fused_ln_geglu_matches_reference(b, l, c):
    rng = np.random.RandomState(0)
    f = 4 * c
    x = jnp.asarray(rng.randn(b, l, c), jnp.bfloat16)
    lns = jnp.asarray(1.0 + 0.1 * rng.randn(c), jnp.float32)
    lnb = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
    w1 = jnp.asarray(rng.randn(c, 2 * f) / np.sqrt(c), jnp.float32)
    b1 = jnp.asarray(0.1 * rng.randn(2 * f), jnp.float32)
    w2 = jnp.asarray(rng.randn(f, c) / np.sqrt(f), jnp.float32)
    b2 = jnp.asarray(0.1 * rng.randn(c), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        got = fused_ln_geglu(x, lns, lnb, w1, b1, w2, b2)
    want = _reference(x, lns, lnb, w1, b1, w2, b2)
    assert got.shape == want.shape and got.dtype == want.dtype
    g, w = np.asarray(got, np.float32), np.asarray(want, np.float32)
    # bf16 rounding differences only (the residual keeps magnitudes ~1)
    np.testing.assert_allclose(g, w, atol=0.06, rtol=0.06)
    assert np.mean(np.abs(g - w)) < 5e-3


def test_enable_knob_read_at_call_time(monkeypatch):
    """tools/ab_interleave.py flips SASPA_* knobs per-arm inside one process;
    the eligibility gate must observe that (a module-import read would trace
    both A/B arms identically and silently void the experiment)."""
    import saspa_tpu.ops.geglu as geglu_mod

    monkeypatch.setenv("SASPA_PALLAS_GEGLU", "0")
    assert not geglu_mod._enabled()
    assert not geglu_mod.ln_geglu_eligible(4096, 320, 8, jnp.bfloat16)
    monkeypatch.setenv("SASPA_PALLAS_GEGLU", "1")
    assert geglu_mod._enabled()
    monkeypatch.delenv("SASPA_PALLAS_GEGLU", raising=False)
    assert geglu_mod._enabled()  # default ON since the 2026-08-18 on-chip A/B
    if jax.default_backend() == "tpu":
        assert geglu_mod.ln_geglu_eligible(4096, 320, 8, jnp.bfloat16)


def test_lowers_for_tpu_without_a_chip():
    """Interpret mode skips Mosaic lowering entirely — the first on-chip A/B
    died on an unimplemented `erf` primitive that every CPU test had passed.
    jax.export cross-lowers the real Mosaic pipeline host-side, so 'the
    kernel compiles for TPU' is now asserted in the CPU suite."""
    from jax import export

    b, l, c = 2, 256, 320
    f = 4 * c
    x = jnp.zeros((b, l, c), jnp.bfloat16)
    args = (
        x, jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32),
        jnp.zeros((c, 2 * f), jnp.float32), jnp.zeros((2 * f,), jnp.float32),
        jnp.zeros((f, c), jnp.float32), jnp.zeros((c,), jnp.float32),
    )
    exp = export.export(jax.jit(fused_ln_geglu), platforms=["tpu"])(*args)
    assert exp.out_avals[0].shape == (b, l, c)


def test_block_q_divides():
    for l in (64, 256, 768, 1024, 3456, 4096):
        bq = _pick_block_q(l)
        assert l % bq == 0 and bq >= 64


def test_transformer_block_wiring(monkeypatch):
    """Force the fused path through the REAL BasicTransformerBlock (interpret
    mode) so a param-order/layout bug in the fused_ln_geglu call site shows up
    on CPU, not just on chip."""
    import saspa_tpu.ops.geglu as geglu_mod
    from saspa_tpu.models.unet import BasicTransformerBlock

    block = BasicTransformerBlock(num_heads=2, dtype=jnp.bfloat16)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 128, 64), jnp.bfloat16)
    ctx = jnp.asarray(rng.randn(2, 77, 96), jnp.bfloat16)
    params = block.init(jax.random.PRNGKey(0), x, ctx)

    want = np.asarray(block.apply(params, x, ctx), np.float32)  # fallback path
    monkeypatch.setattr(geglu_mod, "ln_geglu_eligible", lambda *a: True)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(block.apply(params, x, ctx), np.float32)
    np.testing.assert_allclose(got, want, atol=0.06, rtol=0.06)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="real-chip numerics")
def test_fused_ln_geglu_on_chip():
    rng = np.random.RandomState(1)
    b, l, c = 2, 1024, 320
    f = 4 * c
    x = jnp.asarray(rng.randn(b, l, c), jnp.bfloat16)
    lns = jnp.asarray(1.0 + 0.1 * rng.randn(c), jnp.float32)
    lnb = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
    w1 = jnp.asarray(rng.randn(c, 2 * f) / np.sqrt(c), jnp.float32)
    b1 = jnp.asarray(0.1 * rng.randn(2 * f), jnp.float32)
    w2 = jnp.asarray(rng.randn(f, c) / np.sqrt(f), jnp.float32)
    b2 = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
    got = np.asarray(fused_ln_geglu(x, lns, lnb, w1, b1, w2, b2), np.float32)
    want = np.asarray(_reference(x, lns, lnb, w1, b1, w2, b2), np.float32)
    np.testing.assert_allclose(got, want, atol=0.08, rtol=0.08)
