"""LayerNorm32 (models/unet.py) — transformer-block LayerNorm with fp32
statistics and a compute-dtype normalize pass.

Contract: for fp32 inputs (all golden fixtures) it is BIT-identical to the
flax nn.LayerNorm(dtype=fp32) island it replaced; for bf16 inputs the
normalize pass runs in bf16 (recipe-faithful: the reference runs the whole
SD pipe fp16, run_aug/run_aug.py:149-211) within bf16 rounding of the fp32
pass, and SASPA_LN_FP32_NORM=1 reverts to the exact fp32 pass.  The param
tree ({scale, bias} at the module name) is pinned so converted checkpoints
keep loading.
"""

import os

import flax.linen as nn
import jax
import jax.numpy as jnp

from saspa_tpu.models.unet import LayerNorm32


def _rand(dtype):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 320), jnp.float32) * 3 + 0.5
    g = jax.random.normal(jax.random.PRNGKey(1), (320,), jnp.float32) * 0.2 + 1.0
    b = jax.random.normal(jax.random.PRNGKey(2), (320,), jnp.float32) * 0.2
    return x.astype(dtype), g, b


def _flax_ref(x, g, b):
    ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
    return ln.apply({"params": {"scale": g, "bias": b}}, x)


def _ln32(x, g, b):
    return LayerNorm32().apply({"params": {"scale": g, "bias": b}}, x)


def test_fp32_bit_identical_to_flax():
    x, g, b = _rand(jnp.float32)
    assert jnp.all(_flax_ref(x, g, b) == _ln32(x, g, b))


def test_bf16_norm_within_bf16_tolerance():
    x, g, b = _rand(jnp.bfloat16)
    got = _ln32(x, g, b)
    assert got.dtype == jnp.bfloat16
    ref = _flax_ref(x, g, b)  # fp32 pass on the same bf16 input
    err = jnp.max(jnp.abs(ref - got.astype(jnp.float32)))
    scale = jnp.max(jnp.abs(ref)) + 1e-9
    assert err / scale < 0.02, float(err / scale)


def test_fp32_norm_env_revert(monkeypatch):
    """SASPA_LN_FP32_NORM=1 must reproduce the old fp32 pass exactly."""
    x, g, b = _rand(jnp.bfloat16)
    monkeypatch.setenv("SASPA_LN_FP32_NORM", "1")
    got = _ln32(x, g, b)
    ref = _flax_ref(x, g, b).astype(jnp.bfloat16)
    assert jnp.all(ref == got)


def test_param_tree_contract():
    p = LayerNorm32().init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 64)))["params"]
    assert set(p.keys()) == {"scale", "bias"}
    assert p["scale"].shape == (64,) and p["scale"].dtype == jnp.float32


def test_one_pass_kernel_matches_ln32(monkeypatch):
    """ops/layernorm.py one-pass Pallas kernel (SASPA_PALLAS_LN probe) vs
    the XLA _ln32_forward path, interpret mode: identical math/association.
    bf16 matches bit-for-bit (the bf16 round absorbs sub-ulp noise); fp32
    differs only by jit-vs-eager FMA contraction — tight allclose."""
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from saspa_tpu.ops.layernorm import layer_norm_one_pass

    for dtype, exact in ((jnp.bfloat16, True), (jnp.float32, False)):
        x, g, b = _rand(dtype)
        want = _ln32(x, g, b)
        with pltpu.force_tpu_interpret_mode():
            got = layer_norm_one_pass(x, g, b, 1e-5)
        assert got.dtype == want.dtype
        if exact:
            assert jnp.all(got == want), dtype
        else:
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6)
