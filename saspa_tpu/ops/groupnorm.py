"""Fused GroupNorm(+SiLU) Pallas kernel for NHWC activations.

The round-1 device trace showed XLA's GroupNorm stat fusions eating 22% of
the fused generation program's wall clock at ~4% of HBM bandwidth (the
fp32-island converts + strided reduces don't fuse well).  This kernel keeps
one sample's activations VMEM-resident, accumulates per-channel moments in
fp32 over row chunks, folds the per-group statistics into a per-CHANNEL
affine (scale, shift) with a tiny (C, G) one-hot matmul, and applies
normalize(+SiLU) on the way out — one HBM read + one HBM write total.

Semantics match flax nn.GroupNorm (reference engine: torch GroupNorm inside
diffusers' UNet/VAE blocks): fp32 statistics via E[x^2]-E[x]^2, epsilon
inside rsqrt, channels-last grouping.

Falls back to the plain XLA fp32-island implementation off-TPU or when a
sample doesn't fit the VMEM budget (e.g. the 512x512 VAE decoder tail).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _disabled() -> bool:
    """Kernel default flipped OFF in round 4: the r4 interleaved A/B
    (SASPA_DISABLE_PALLAS_GN, 6/6 rounds, 2026-08-19) measured the pure-XLA
    path at 4.746 s vs 5.060 s with the kernel — +6.6% e2e.  This jaxlib's
    XLA fuses the GN normalize(+SiLU) into the neighboring convs, and the
    pallas_call boundary was blocking those fusions across ~1350 small
    calls/program (the kernel's win was measured against the r1 XLA).
    SASPA_PALLAS_GN=1 re-enables for A/B on other hardware;
    SASPA_DISABLE_PALLAS_GN=1 still force-disables (highest precedence).
    Read at trace time so tools/ab_interleave.py can flip per-arm."""
    if os.environ.get("SASPA_DISABLE_PALLAS_GN", "") == "1":
        return True
    return os.environ.get("SASPA_PALLAS_GN", "0") != "1"



# normalize(+SiLU) pass in bf16 (statistics stay fp32).  The reference runs
# the whole SD pipe fp16 (run_aug/run_aug.py:149-211), so bf16 normalize is
# no looser than the recipe; fp32 stats are strictly tighter.  r2 A/B: +1.2%.
# Read at trace time so tools/ab_interleave.py can flip it per arm.
def _bf16_norm() -> bool:
    return os.environ.get("SASPA_GN_FP32_NORM", "") != "1"
# per-sample block budget; in-block + out-block + row temps must fit VMEM
_VMEM_LIMIT = int(os.environ.get("SASPA_GN_VMEM_LIMIT", str(44 * 1024 * 1024)))
# raise Mosaic's default 16MB scoped-vmem ceiling: v5e has far more physical
# VMEM; 2x'd block buffers for the big up-block GNs need ~44MB
_SCOPED_VMEM = int(os.environ.get("SASPA_GN_SCOPED_VMEM", str(96 * 1024 * 1024)))


def _gn_kernel(x_ref, gamma_ref, beta_ref, onehot_ref, o_ref, *, groups, eps, act, chunk, bf16_norm):
    """x_ref/o_ref: (1, HW, C); gamma/beta: (1, C) f32; onehot: (C, G) f32."""
    hw, c = x_ref.shape[1], x_ref.shape[2]
    n_chunks = hw // chunk

    def acc(i, carry):
        s1, s2 = carry
        xa = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        return s1 + jnp.sum(xa, axis=0, keepdims=True), s2 + jnp.sum(xa * xa, axis=0, keepdims=True)

    z = jnp.zeros((1, c), jnp.float32)
    s1, s2 = jax.lax.fori_loop(0, n_chunks, acc, (z, z))

    onehot = onehot_ref[:]  # (C, G)
    n = jnp.float32(hw * (c // groups))
    g1 = jax.lax.dot_general(s1, onehot, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) / n  # (1, G) mean
    g2 = jax.lax.dot_general(s2, onehot, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) / n  # (1, G) E[x^2]
    var = g2 - g1 * g1
    rstd = jax.lax.rsqrt(var + eps)  # (1, G)
    # broadcast group stats back to channels: (1, G) @ (G, C)
    mean_c = jax.lax.dot_general(g1, onehot.T, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    rstd_c = jax.lax.dot_general(rstd, onehot.T, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    scale = gamma_ref[:] * rstd_c            # (1, C)
    shift = beta_ref[:] - mean_c * scale     # (1, C)

    if bf16_norm and o_ref.dtype == jnp.bfloat16:
        scale_n, shift_n = scale.astype(jnp.bfloat16), shift.astype(jnp.bfloat16)
    else:
        scale_n, shift_n = scale, shift

    def norm(i, _):
        xa = x_ref[0, pl.ds(i * chunk, chunk), :]
        if not (bf16_norm and o_ref.dtype == jnp.bfloat16):
            xa = xa.astype(jnp.float32)
        o = xa * scale_n + shift_n
        if act == "silu":
            # dtype-matched logistic: jax.nn.sigmoid's f32 literals trip a
            # Mosaic verifier error when o is bf16 (f32 scalar broadcast
            # into a bf16 vector)
            one = jnp.ones((), o.dtype)
            o = o * (one / (one + jnp.exp(-o)))
        o_ref[0, pl.ds(i * chunk, chunk), :] = o.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, norm, 0)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "act", "chunk", "n_split", "bf16_norm"))
def _gn_pallas(x3, gamma, beta, onehot, groups, eps, act, chunk, n_split, bf16_norm):
    """Grid (B, n_split): each program owns a contiguous channel slice that
    covers whole groups, so group statistics never cross programs and the
    per-program VMEM block shrinks by n_split."""
    b, hw, c = x3.shape
    cblk = c // n_split
    gblk = groups // n_split
    return pl.pallas_call(
        functools.partial(_gn_kernel, groups=gblk, eps=eps, act=act, chunk=chunk,
                          bf16_norm=bf16_norm),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_SCOPED_VMEM,
        ),
        grid_spec=pl.GridSpec(
            grid=(b, n_split),
            in_specs=[
                pl.BlockSpec((1, hw, cblk), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cblk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cblk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((cblk, gblk), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, hw, cblk), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ),
    )(x3, gamma, beta, onehot)


def _xla_group_norm(x, gamma, beta, groups: int, eps: float, act):
    """BIT-IDENTICAL to the pre-kernel GroupNorm32 behavior: flax
    nn.GroupNorm on an fp32 upcast, cast back, then SiLU on the cast value
    (that is the exact op order the callers used before the fusion)."""
    import flax.linen as nn

    gn = nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=jnp.float32)
    out = gn.apply(
        {"params": {"scale": gamma.astype(jnp.float32), "bias": beta.astype(jnp.float32)}},
        x.astype(jnp.float32),
    ).astype(x.dtype)
    if act == "silu":
        out = nn.silu(out)
    return out


def _pick_chunk(hw: int, c: int) -> int:
    # power-of-two row chunk (sublane-provable, divides the 2^k spatial dim)
    # bounding the fp32 row temp to ~2MB
    budget = max(8, (1 << 19) // max(c, 1))
    chunk = 8
    while chunk * 2 <= min(512, hw, budget):
        chunk *= 2
    return chunk


def _split_plan(x, groups: int):
    """Smallest power-of-2 channel split (covering whole groups) whose
    per-program block fits the VMEM budget; None if impossible.

    SASPA_GN_MIN_SPLIT forces a larger split for A/B: smaller blocks let
    Pallas double-buffer the HBM->VMEM DMA across grid steps (a full-sample
    level-0 block is up to 44MB — 2x in + 2x out exceeds VMEM, so the r3
    kernel may serialize DMA with compute)."""
    hw = int(np.prod(x.shape[1:-1]))
    c = x.shape[-1]
    if hw & (hw - 1) or hw < 8:  # power-of-two spatial only (all SD cases)
        return None
    n_split = int(os.environ.get("SASPA_GN_MIN_SPLIT", "1"))
    while n_split <= groups:
        # Mosaic needs the last block dim to be the full C or a multiple of 128
        if groups % n_split == 0 and (n_split == 1 or (c // n_split) % 128 == 0):
            cblk = c // n_split
            chunk = _pick_chunk(hw, cblk)
            vmem = 2 * hw * cblk * x.dtype.itemsize + 2 * chunk * cblk * 4 + cblk * 4 * 4
            if vmem <= _VMEM_LIMIT:
                return n_split, chunk
        n_split *= 2
    return None


def _kernel_ok(x, groups: int = 32) -> bool:
    if _disabled() or jax.default_backend() != "tpu":
        return False
    return _split_plan(x, groups) is not None


def group_norm(x, gamma, beta, num_groups: int = 32, eps: float = 1e-5, activation=None):
    """GroupNorm(+optional SiLU) over channels-last x of any spatial rank.

    x: (B, ..., C); gamma/beta: (C,) f32. Stats in fp32, output in x.dtype."""
    c = x.shape[-1]
    groups = min(num_groups, c)
    if c % groups:
        groups = 1
    plan = _split_plan(x, groups) if not _disabled() and jax.default_backend() == "tpu" else None
    if plan is None:
        return _xla_group_norm(x, gamma, beta, groups, eps, activation)
    n_split, chunk = plan
    b = x.shape[0]
    hw = int(np.prod(x.shape[1:-1]))
    x3 = x.reshape(b, hw, c)
    gblk = groups // n_split
    onehot = jnp.asarray(
        np.repeat(np.eye(gblk, dtype=np.float32), c // groups, axis=0)
    )  # (C_blk, G_blk)
    out = _gn_pallas(
        x3, gamma.astype(jnp.float32).reshape(1, c), beta.astype(jnp.float32).reshape(1, c),
        onehot, groups, float(eps), activation, chunk, n_split, _bf16_norm(),
    )
    return out.reshape(x.shape)
