"""One-pass Pallas LayerNorm probe for the UNet transformer norm1/norm2 sites.

The r4 xplane trace puts LN statistics (convert_reduce) at ~70 ms of the
4.7 s SD1.5 program; the roadmap's floor annotation ("one-pass LN saves
<=1/3 of the slice") was an estimate, not a measurement.  XLA compiles
LayerNorm32 as (at least) two HBM passes over x — a convert+stats reduce
and a separate normalize fusion; this kernel does stats + normalize in one
VMEM-resident pass per q-block (one read, one write), exactly
_ln32_forward's math: fp32 fast-variance stats, compute-dtype normalize,
flax's ((x - mean) * (rsqrt * scale) + bias) association.

A measurement probe first (SASPA_PALLAS_LN=1), default OFF until an
interleaved A/B (tools/ab_interleave.py) says otherwise — the r4 GN lesson
is that a pallas_call boundary can cost more in lost XLA fusion than it
saves in HBM traffic (the LN output feeds attention QKV projections the
compiler would otherwise fuse into).

Reference semantics anchored to diffusers BasicTransformerBlock norm1/norm2
(run_aug/run_aug.py:128-215 runs those pipes fp16; fp32 stats are strictly
tighter).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _enabled() -> bool:
    # read at trace time so tools/ab_interleave.py can flip it per-arm
    return os.environ.get("SASPA_PALLAS_LN", "") == "1"


def _ln_kernel(x_ref, s_ref, b_ref, o_ref, *, eps):
    """x/o: (1, bq, C); s/b: (1, C) f32."""
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    mul = jax.lax.rsqrt(var + eps) * s_ref[...]
    d = x.dtype
    if d == jnp.float32:
        o_ref[0] = (xf - mean) * mul + b_ref[...]
    else:
        o_ref[0] = (x - mean.astype(d)) * mul.astype(d) + b_ref[...].astype(d)


def _pick_block_q(l: int) -> int:
    bq = int(os.environ.get("SASPA_LN_BLOCK_Q", "0")) or 1024
    for cand in (min(bq, l), 512, 256, 128, 64):
        if cand <= l and l % cand == 0:
            return cand
    return l


@functools.partial(jax.jit, static_argnames=("eps", "block_q"))
def _ln_pallas(x, scale, bias, eps, block_q):
    b, l, c = x.shape
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        grid_spec=pl.GridSpec(
            grid=(b, l // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
    )(x, scale, bias)


def layer_norm_eligible(x) -> bool:
    """Static predicate: TPU, 3-D (B, L, C) activations, lane-aligned C,
    sublane-aligned L (the transformer shapes: L in {4096,1024,256,64},
    C in {320,640,1280})."""
    if not _enabled() or jax.default_backend() != "tpu":
        return False
    if x.ndim != 3:
        return False
    _, l, c = x.shape
    return l >= 64 and l % 64 == 0 and c % 128 == 0


def layer_norm_one_pass(x, scale, bias, eps: float = 1e-5):
    """x: (B, L, C); scale/bias: (C,) fp32 masters.  Matches _ln32_forward
    bit-for-bit in fp32 and to the same association in bf16."""
    _, l, c = x.shape
    return _ln_pallas(
        x,
        scale.astype(jnp.float32).reshape(1, c),
        bias.astype(jnp.float32).reshape(1, c),
        float(eps), _pick_block_q(l),
    )
