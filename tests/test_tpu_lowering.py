"""Cross-lower every Pallas kernel for TPU on the CPU suite.

Interpret-mode tests execute kernel *math* but skip Mosaic lowering entirely;
the GEGLU kernel shipped green on CPU and then died on-chip with
"Unimplemented primitive in Pallas TPU lowering: erf".  jax.export runs the
real Mosaic pipeline host-side, so "this kernel compiles for TPU" is now a
CPU-suite invariant for every kernel, at the exact shapes the fused SD1.5
@512 program uses.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import export


def _lower_tpu(fn, *args):
    exp = export.export(jax.jit(fn), platforms=["tpu"])(*args)
    return exp.out_avals


def test_flash_attention_packed_lowers():
    from saspa_tpu.ops.attention import flash_attention_packed

    b, l, heads, d = 2, 4096, 8, 64  # level-0 self-attention shape
    q = jnp.zeros((b, l, heads * d), jnp.bfloat16)
    outs = _lower_tpu(lambda q, k, v: flash_attention_packed(q, k, v, heads=heads), q, q, q)
    assert outs[0].shape == (b, l, heads * d)


def test_attention_megakernel_lowers():
    from saspa_tpu.ops.attention import attention_block_fused

    b, l, heads, d = 2, 1024, 8, 64
    c = heads * d
    x = jnp.zeros((b, l, c), jnp.bfloat16)
    w = jnp.zeros((c, c), jnp.bfloat16)
    bias = jnp.zeros((1, c), jnp.bfloat16)
    outs = _lower_tpu(
        lambda x, r, wq, wk, wv, wo, bo: attention_block_fused(x, r, wq, wk, wv, wo, bo, heads=heads),
        x, x, w, w, w, w, bias,
    )
    assert outs[0].shape == (b, l, c)


def test_groupnorm_kernel_lowers():
    from saspa_tpu.ops import groupnorm as gn

    b, hw, c, groups = 2, 4096, 320, 32  # level-0 resnet GN(+SiLU) shape
    x3 = jnp.zeros((b, hw, c), jnp.bfloat16)
    plan = gn._split_plan(x3, groups)
    assert plan is not None, "level-0 shape must take the kernel path on TPU"
    n_split, chunk = plan
    onehot = jnp.asarray(
        np.repeat(np.eye(groups // n_split, dtype=np.float32), c // groups, axis=0)
    )
    gamma = jnp.ones((1, c), jnp.float32)
    beta = jnp.zeros((1, c), jnp.float32)
    outs = _lower_tpu(
        lambda x, g, bta, oh: gn._gn_pallas(
            x, g, bta, oh, groups, 1e-5, "silu", chunk, n_split, True
        ),
        x3, gamma, beta, onehot,
    )
    assert outs[0].shape == (b, hw, c)


def test_geglu_kernel_lowers():
    from saspa_tpu.ops.geglu import fused_ln_geglu

    b, l, c = 2, 4096, 320  # level-0 transformer FF shape
    f = 4 * c
    args = (
        jnp.zeros((b, l, c), jnp.bfloat16),
        jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32),
        jnp.zeros((c, 2 * f), jnp.float32), jnp.zeros((2 * f,), jnp.float32),
        jnp.zeros((f, c), jnp.float32), jnp.zeros((c,), jnp.float32),
    )
    outs = _lower_tpu(fused_ln_geglu, *args)
    assert outs[0].shape == (b, l, c)


def test_layernorm_kernel_lowers():
    from saspa_tpu.ops.layernorm import layer_norm_one_pass

    b, l, c = 8, 4096, 320  # level-0 transformer norm1 shape, CFG-tiled batch
    x = jnp.zeros((b, l, c), jnp.bfloat16)
    scale = jnp.ones((c,), jnp.float32)
    bias = jnp.zeros((c,), jnp.float32)
    outs = _lower_tpu(lambda x, s, b_: layer_norm_one_pass(x, s, b_), x, scale, bias)
    assert outs[0].shape == (b, l, c)
