"""Fused Pallas GroupNorm(+SiLU) kernel (ops/groupnorm.py).

Numerics are checked three ways: the XLA fallback must be BIT-identical to
flax nn.GroupNorm on an fp32 upcast (golden-fixture stability), the Pallas
kernel is run in interpret mode on CPU against that reference, and on real
TPU a compiled-tolerance check runs (skipped elsewhere).  The param-tree
contract (<norm>/GroupNorm_0/{scale,bias}) is pinned so converted
checkpoints keep loading.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saspa_tpu.ops import groupnorm as G


def _flax_ref(x, gamma, beta, groups=32, eps=1e-5, silu=False):
    gn = nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=jnp.float32)
    out = gn.apply(
        {"params": {"scale": gamma, "bias": beta}}, x.astype(jnp.float32)
    ).astype(x.dtype)
    return nn.silu(out) if silu else out


def _rand(shape, dtype=jnp.bfloat16):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32) * 3 + 0.5
    c = shape[-1]
    g = jax.random.normal(jax.random.PRNGKey(1), (c,), jnp.float32) * 0.2 + 1.0
    b = jax.random.normal(jax.random.PRNGKey(2), (c,), jnp.float32) * 0.2
    return x.astype(dtype), g, b


def test_fallback_bit_identical_to_flax():
    x, g, b = _rand((2, 16, 16, 64))
    ref = _flax_ref(x, g, b)
    got = G._xla_group_norm(x, g, b, 32, 1e-5, None)
    assert jnp.all(ref == got)
    ref_s = _flax_ref(x, g, b, silu=True)
    got_s = G._xla_group_norm(x, g, b, 32, 1e-5, "silu")
    assert jnp.all(ref_s == got_s)


@pytest.mark.parametrize("shape", [(2, 16, 16, 64), (2, 8, 8, 320), (1, 32, 32, 128)])
@pytest.mark.parametrize("act", [None, "silu"])
def test_kernel_interpret_matches_flax(shape, act):
    from jax.experimental.pallas import tpu as pltpu

    x, g, b = _rand(shape)
    c = shape[-1]
    groups = 32
    hw = shape[1] * shape[2]
    onehot = jnp.asarray(np.repeat(np.eye(groups, dtype=np.float32), c // groups, axis=0))
    with pltpu.force_tpu_interpret_mode():
        got = G._gn_pallas(
            x.reshape(shape[0], hw, c), g.reshape(1, c), b.reshape(1, c), onehot,
            groups, 1e-5, act, G._pick_chunk(hw, c), 1, G._bf16_norm(),
        ).reshape(shape)
    ref = _flax_ref(x, g, b, groups=groups, silu=act == "silu")
    err = jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)))
    scale = jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-9
    assert err / scale < 0.02, float(err / scale)


def test_kernel_channel_split_interpret():
    """n_split=2 path (128-multiple channel blocks covering whole groups)."""
    from jax.experimental.pallas import tpu as pltpu

    shape = (2, 8, 8, 256)
    x, g, b = _rand(shape)
    groups, c, hw = 32, 256, 64
    onehot = jnp.asarray(np.repeat(np.eye(groups // 2, dtype=np.float32), c // groups, axis=0))
    with pltpu.force_tpu_interpret_mode():
        got = G._gn_pallas(
            x.reshape(2, hw, c), g.reshape(1, c), b.reshape(1, c), onehot,
            groups, 1e-5, None, 8, 2, G._bf16_norm(),
        ).reshape(shape)
    ref = _flax_ref(x, g, b, groups=groups)
    err = jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)))
    assert err / (jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-9) < 0.02


def test_kernel_bf16_norm_within_bf16_tolerance():
    """The bf16 normalize pass (recipe-faithful: the reference runs the
    whole pipe fp16) must stay within bf16 rounding of the fp32 pass;
    statistics are fp32 in both."""
    from jax.experimental.pallas import tpu as pltpu

    shape = (2, 8, 8, 320)
    x, g, b = _rand(shape)
    hw, c, groups = 64, 320, 32
    onehot = jnp.asarray(np.repeat(np.eye(groups, dtype=np.float32), c // groups, axis=0))
    args = (x.reshape(2, hw, c), g.reshape(1, c), b.reshape(1, c), onehot,
            groups, 1e-5, "silu", 8, 1)
    with pltpu.force_tpu_interpret_mode():
        got16 = G._gn_pallas(*args, True)
        got32 = G._gn_pallas(*args, False)
    err = jnp.max(jnp.abs(got16.astype(jnp.float32) - got32.astype(jnp.float32)))
    scale = jnp.max(jnp.abs(got32.astype(jnp.float32))) + 1e-9
    assert err / scale < 0.02, float(err / scale)


def test_groupnorm32_param_tree_contract():
    """Converted checkpoints write <norm>/GroupNorm_0/{scale,bias} — pinned."""
    from saspa_tpu.models.unet import GroupNorm32

    m = GroupNorm32(32, act="silu")
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 64)))["params"]
    assert set(p.keys()) == {"GroupNorm_0"}
    assert set(p["GroupNorm_0"].keys()) == {"scale", "bias"}
    assert p["GroupNorm_0"]["scale"].shape == (64,)


def test_compiled_tpu_tolerance():
    if jax.default_backend() != "tpu":
        pytest.skip("compiled-kernel check needs TPU")
    x, g, b = _rand((8, 64, 64, 320))
    ref = _flax_ref(x, g, b, silu=True)
    got = G.group_norm(x, g, b, 32, 1e-5, "silu")
    err = jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)))
    assert err / (jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-9) < 0.02
