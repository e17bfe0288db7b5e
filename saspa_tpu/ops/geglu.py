"""Fused LayerNorm + GEGLU feed-forward Pallas kernel for the UNet transformer.

The round-3 device trace (tools/profile_fused.py --trace, batch 8) showed the
GEGLU hidden tensor is the largest remaining HBM round-trip in the fused
generation program: `proj_in` writes a (2B, L, 8C) hidden activation (336 MB
at the 512² level-0 shape) and the `proj_out` fusion reads every byte back —
~300 ms (6%) of the 4.8 s program across all transformer blocks × 30 steps.
Both dots run well below the HBM roof at level 0 (proj_out measured exactly
memory-bound: 420 MB moved in 0.54 ms).

This kernel runs norm3 + proj_in + gelu-gate + proj_out + the residual add in
ONE pass: the hidden lives in VMEM per q-block and never touches HBM, and the
input block doubles as the residual (one read).  HBM traffic per block drops
from (read x, write x_ln?, write hidden 8C, read hidden 8C, read residual,
write out) to (read x, read weights once — Mosaic keeps constant-index blocks
resident across grid steps, write out).

Semantics (reference engine: diffusers BasicTransformerBlock norm3 + GEGLU
FeedForward, run_aug/run_aug.py:128-215 pipelines run it fp16):
  out = x + W2 @ (h * gelu_erf(g)) + b2,   [h; g] = LN(x) @ W1 + b1
LN statistics in fp32 with the bf16 normalize pass (exactly LayerNorm32's
default); the gelu gate is computed on the fp32 dot accumulators (strictly
tighter than the separate-op path's bf16 gelu; the proj biases are applied in
bf16 to match nn.Dense).  Falls back to the separate-op path off-TPU, for
fp32 activations, or when SASPA_LN_FP32_NORM=1 requests the fp32 LN island.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _enabled() -> bool:
    # Default ON: interleaved on-chip A/B (tools/ab_interleave.py, 6 rounds,
    # chip_session_results.jsonl 2026-08-18) measured +5.6% e2e — 5.279 s ->
    # 5.001 s median per 8-image program, every round faster.  SASPA_PALLAS_GEGLU=0
    # reverts to the separate-op path.  Read at trace time, not import time,
    # so tools/ab_interleave.py can flip the knob per-arm inside one process.
    return os.environ.get("SASPA_PALLAS_GEGLU", "1") == "1"


_SCOPED_VMEM = int(os.environ.get("SASPA_GEGLU_SCOPED_VMEM", str(100 * 1024 * 1024)))


def _erf_f32(x):
    """Eigen generic_fast_erf_float — the rational polynomial XLA's own f32
    erf lowering uses.  Pallas-TPU (this jaxlib) has no erf primitive
    (NotImplementedError: "Unimplemented primitive ... erf"), so the kernel
    carries the polynomial itself.  Validated against jax.lax.erf over
    [-6, 6]: max 11 ulp / 6.6e-7 abs; after the bf16 cast the only product
    differences sit in the |gate| > 3 cancellation tail where gelu ~ 1e-7."""
    x = jnp.clip(x, -3.832506856900711, 3.832506856900711)
    x2 = x * x
    a = jnp.float32(-2.72614225801306e-10)
    for c in (2.77068142495902e-08, -2.10102402082508e-06, -5.69250639462346e-05,
              -7.34990630326855e-04, -2.95459980854025e-03, -1.60960333262415e-02):
        a = a * x2 + jnp.float32(c)
    a = a * x
    b = jnp.float32(-1.45660718464996e-05)
    for c in (-2.13374055278905e-04, -1.68282697438203e-03, -7.37332916720468e-03,
              -1.42647390514189e-02):
        b = b * x2 + jnp.float32(c)
    return a / b


def _gelu_exact_f32(x):
    # exact erf gelu in fp32 (diffusers GEGLU uses F.gelu, approximate='none')
    inv_sqrt2 = np.float32(1.0 / np.sqrt(2.0))
    return 0.5 * x * (1.0 + _erf_f32(x * inv_sqrt2))


def _ln_geglu_kernel(x_ref, lns_ref, lnb_ref, w1h_ref, b1h_ref, w1g_ref, b1g_ref,
                     w2_ref, b2_ref, o_ref, *, eps):
    """x/o: (1, bq, C) bf16; lns/lnb: (1, C) f32; w1h/w1g: (C, F) bf16;
    b1h/b1g: (1, F) bf16; w2: (F, C) bf16; b2: (1, C) bf16."""
    x = x_ref[0]  # (bq, C) bf16 — LN input AND residual
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    # LayerNorm32's exact fast-variance + normalize association
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    mul = jax.lax.rsqrt(var + eps) * lns_ref[...]  # (bq, 1)*(1, C) -> (bq, C) f32
    d = x.dtype
    xn = (x - mean.astype(d)) * mul.astype(d) + lnb_ref[...].astype(d)

    h = jax.lax.dot_general(
        xn, w1h_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b1h_ref[...].astype(jnp.float32)
    g = jax.lax.dot_general(
        xn, w1g_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b1g_ref[...].astype(jnp.float32)
    if os.environ.get("SASPA_GEGLU_NOGELU", "") == "1":
        # MEASUREMENT PROBE ONLY (numerics-breaking): drop the gelu VPU
        # polynomial so an interleaved A/B can bound how much of the kernel's
        # wall clock the VPU work costs e2e — i.e. whether Mosaic already
        # overlaps it with the MXU dots (r4 roadmap's "unproven ~300 ms floor")
        hid = (h * g).astype(d)
    else:
        hid = (h * _gelu_exact_f32(g)).astype(d)  # (bq, F) — never leaves VMEM

    out = jax.lax.dot_general(
        hid, w2_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = (out.astype(d) + b2_ref[...].astype(d)) + x


def _pick_block_q(l: int) -> int:
    bq = int(os.environ.get("SASPA_GEGLU_BLOCK_Q", "0"))
    if bq == 0:
        bq = 512
    for cand in (min(bq, l), 256, 128, 64):
        if cand <= l and l % cand == 0:
            return cand
    return l


@functools.partial(jax.jit, static_argnames=("eps", "block_q"))
def _ln_geglu_pallas(x, lns, lnb, w1h, b1h, w1g, b1g, w2, b2, eps, block_q):
    b, l, c = x.shape
    f = w1h.shape[1]
    return pl.pallas_call(
        functools.partial(_ln_geglu_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_SCOPED_VMEM,
        ),
        grid_spec=pl.GridSpec(
            grid=(b, l // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((c, f), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, f), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((c, f), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, f), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((f, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
    )(x, lns, lnb, w1h, b1h, w1g, b1g, w2, b2)


def ln_geglu_eligible(l: int, c: int, mult: int, dtype) -> bool:
    """Static predicate.  bf16-on-TPU only (the fp32-LN island env knob and
    fp32 activations take the separate-op fallback, preserving the exact
    LayerNorm32 fp32 semantics)."""
    if not _enabled() or jax.default_backend() != "tpu":
        return False
    if dtype != jnp.bfloat16 or os.environ.get("SASPA_LN_FP32_NORM", "") == "1":
        return False
    if l < 64 or l % 64:
        return False
    f = c * mult
    bq = _pick_block_q(l)
    vmem = (
        2 * 3 * c * f          # w1h + w1g + w2 (bf16, grid-resident)
        + 2 * 2 * f + 2 * 2 * c + 4 * 2 * c  # biases + LN params
        + 2 * 2 * 2 * bq * c   # x block + out block (double-buffered)
        + 2 * 4 * bq * f       # h + g fp32 accumulators
        + 2 * bq * f           # hid bf16
        + 2 * 4 * bq * c       # xn/out temporaries
    )
    return vmem <= 88 * 1024 * 1024


def fused_ln_geglu(x, ln_scale, ln_bias, w1, b1, w2, b2, eps: float = 1e-5):
    """x: (B, L, C) bf16.  w1: (C, 2F) fp32 master (GEGLU packs [value; gate]
    halves, diffusers GEGLU.proj layout); b1: (2F,); w2: (F, C); b2: (C,).
    Returns x + proj_out(geglu(LN(x))), matching the separate-op path to bf16
    rounding.  Weight casts/splits happen outside the kernel — XLA hoists
    them out of the denoise scan (loop-invariant)."""
    b, l, c = x.shape
    f = w1.shape[1] // 2
    d = x.dtype
    w1c = w1.astype(d)
    b1c = b1.astype(d)
    return _ln_geglu_pallas(
        x,
        ln_scale.astype(jnp.float32).reshape(1, c),
        ln_bias.astype(jnp.float32).reshape(1, c),
        w1c[:, :f], b1c[:f].reshape(1, f),
        w1c[:, f:], b1c[f:].reshape(1, f),
        w2.astype(d), b2.astype(d).reshape(1, c),
        float(eps), _pick_block_q(l),
    )
