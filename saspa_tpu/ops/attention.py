"""Multi-head attention for the diffusion stack: Pallas flash kernel + XLA path.

The UNet's hot op is self-attention over image tokens (4096 tokens at 512²
latents).  `flash_attention` is a Pallas TPU kernel that keeps K/V for one
(batch, head) slice resident in VMEM and streams Q blocks through the MXU with
fp32 softmax; head dims that aren't lane-aligned (SD1.5 uses 40/80/160) are
zero-padded to a multiple of 128 lanes-compatible size — zero-padded Q/K
columns contribute nothing to the logits and padded V columns are sliced off,
so the result is exact.

`attention()` picks the kernel when shapes qualify (TPU, seq long enough) and
otherwise falls back to a plain XLA einsum implementation (which XLA already
fuses well for short kv like cross-attention's 77 text tokens).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _xla_attention(q, k, v, scale):
    """q: (B, Lq, H, D), k/v: (B, Lk, H, D) -> (B, Lq, H, D)."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _pad_dim(x, target, axis):
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, block_kv):
    """Online-softmax flash attention: Q block resident, K/V streamed in
    `block_kv` chunks with running (max, denom, accum) — VMEM use is bounded
    by block sizes, not sequence length.

    refs carry a leading (1,) block dim; q: (BLK_Q, D), k/v: (Lk, D)."""
    q = q_ref[0].astype(jnp.float32)
    lk = k_ref.shape[1]
    blk_q, d = q.shape
    n_kv = lk // block_kv

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * block_kv, block_kv), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_kv, block_kv), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (BLK_Q, block_kv)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    init = (
        jnp.full((blk_q, 1), -jnp.inf, jnp.float32),
        jnp.zeros((blk_q, 1), jnp.float32),
        jnp.zeros((blk_q, d), jnp.float32),
    )
    m, l, acc = jax.lax.fori_loop(0, n_kv, body, init)
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_kv"))
def _flash_attention_padded(q, k, v, block_q: int = 256, block_kv: int = 512):
    """q: (BH, Lq, D), k/v: (BH, Lk, D) with D already lane-aligned and
    Lk a multiple of block_kv (caller guarantees both)."""
    bh, lq, d = q.shape
    lk = k.shape[1]
    scale = 1.0  # caller pre-scales
    grid = (bh, pl.cdiv(lq, block_q))
    return pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_kv=block_kv),
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ),
    )(q, k, v)


def flash_attention(q, k, v, scale: float):
    """q: (B, Lq, H, D), k/v: (B, Lk, H, D) -> (B, Lq, H, D), exact."""
    b, lq, h, d = q.shape
    lk = k.shape[1]
    d_pad = pad_head_dim(d)
    # fold scale into q before padding (zero pads stay zero)
    qs = (q * scale).astype(q.dtype)
    qf = _pad_dim(qs.transpose(0, 2, 1, 3).reshape(b * h, lq, d), d_pad, 2)
    kf = _pad_dim(k.transpose(0, 2, 1, 3).reshape(b * h, lk, d), d_pad, 2)
    vf = _pad_dim(v.transpose(0, 2, 1, 3).reshape(b * h, lk, d), d_pad, 2)
    # defaults tuned on v5e (SD1.5 @512: block_q 512 beat 256 by ~4% e2e)
    bq = int(os.environ.get("SASPA_ATTN_BLOCK_Q", "512"))
    bkv = int(os.environ.get("SASPA_ATTN_BLOCK_KV", "512"))
    block_q = min(bq, lq) if lq % min(bq, lq) == 0 else lq
    block_kv = bkv if lk % bkv == 0 else (256 if lk % 256 == 0 else lk)
    out = _flash_attention_padded(qf, kf, vf, block_q=block_q, block_kv=block_kv)
    out = out[..., :d].reshape(b, h, lq, d).transpose(0, 2, 1, 3)
    return out


def _disabled() -> bool:
    """SASPA_DISABLE_PALLAS A/B escape hatch — read at TRACE time, not import
    time, so tools/ab_interleave.py can flip it per-arm inside one process
    (same rule as geglu._enabled; an import-time constant would freeze
    whichever value was set when the module first loaded and make the A/B
    compare an arm against itself)."""
    return os.environ.get("SASPA_DISABLE_PALLAS", "") == "1"

LOG2E = math.log2(math.e)


def _packed_kernel(q_ref, k_ref, v_ref, o_ref, *, heads, d_pad):
    """Packed-heads single-pass attention: refs are (1, L, H*D_pad) so no
    (b, h) transpose is needed outside the kernel; the head loop is unrolled
    inside.  The whole KV (bounded: <=4096 image tokens) is VMEM-resident,
    so one max pass suffices — no online-softmax rescale chain.  exp2 with
    the log2(e) factor pre-folded into q saves a VPU multiply per score.
    Measured 89.5 TFLOPS on the SD1.5 level-0 shape (b8 x h8 x 4096 x d64)
    vs 61.5 for the streamed per-(b,h) kernel this replaces."""
    for h in range(heads):
        sl = pl.ds(h * d_pad, d_pad)
        q = q_ref[0, :, sl].astype(jnp.float32)
        k = k_ref[0, :, sl].astype(jnp.float32)
        v = v_ref[0, :, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (acc / l).astype(o_ref.dtype)


def _env_block_q() -> int:
    """SASPA_PACKED_BLOCK_Q override for the packed kernel's q-block size
    (0 = auto per the on-chip sweep).  Read by the NON-jitted callers and
    passed as a static arg — reading it inside the jitted kernel body would
    be frozen into the first trace and ignored by later env changes (the
    jit cache keys on static args, not on environment)."""
    return int(os.environ.get("SASPA_PACKED_BLOCK_Q", "0"))


def _packed_block_q(lq: int, block_q: int = 0) -> int:
    """The q-block size flash_attention_packed will actually run with: the
    preferred size (auto-picked per the on-chip sweep unless overridden),
    stepped down to the largest of {preferred, 256, 128} that DIVIDES lq —
    the grid is (b, lq // bq), so a non-dividing block would leave remainder
    query rows unwritten.  lq % 128 == 0 is guaranteed by
    packed_flash_eligible, so a divisor always exists."""
    if block_q == 0:
        block_q = 256 if lq > 1024 else 512
    for cand in (min(block_q, lq), 256, 128):
        if cand <= lq and lq % cand == 0:
            return cand
    return lq


@functools.partial(jax.jit, static_argnames=("heads", "block_q"))
def flash_attention_packed(q, k, v, heads: int, block_q: int = 0):
    """q: (B, Lq, H*D_pad) with scale*log2(e) pre-folded into q and D_pad
    lane-aligned (pad lives in the projection WEIGHTS, models/unet.py);
    k/v: (B, Lk, H*D_pad). Returns (B, Lq, H*D_pad); padded output columns
    are exactly zero (zero-padded V).

    block_q=0 auto-picks per the on-chip sweep (tools/kernel_bench.py):
    256 for the 4096-token level-0 shape (92.4 TFLOPS, vs 77.6 at 512),
    512 for lq<=1024 (level 1: 157.6 vs 140.9 TFLOPS at 256); either way
    the block is stepped down to one that divides lq (see _packed_block_q)
    so non-square resolutions (e.g. lq=768 or 3456) cover every row."""
    b, lq, hd = q.shape
    lk = k.shape[1]
    bq = _packed_block_q(lq, block_q)
    return pl.pallas_call(
        functools.partial(_packed_kernel, heads=heads, d_pad=hd // heads),
        out_shape=jax.ShapeDtypeStruct((b, lq, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=int(os.environ.get("SASPA_ATTN_SCOPED_VMEM", str(64 * 1024 * 1024))),
        ),
        grid_spec=pl.GridSpec(
            grid=(b, lq // bq),
            in_specs=[
                pl.BlockSpec((1, bq, hd), lambda b_, i: (b_, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lk, hd), lambda b_, i: (b_, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lk, hd), lambda b_, i: (b_, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, hd), lambda b_, i: (b_, i, 0), memory_space=pltpu.VMEM),
        ),
    )(q, k, v)


def _block_kernel(xf_ref, xb_ref, res_ref, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref,
                  o_ref, k_scr, v_scr, *, heads, d_pad):
    """Self-attention BLOCK megakernel: QKV projections + packed-heads
    attention + to_out + residual add in ONE kernel.

    Grid (B, Lq/bq), sequential over q-blocks within a batch row.  On the
    first q-block of each row the full (L, C) post-LN activations project to
    K/V once into VMEM scratch (persisting across that row's q-blocks); each
    q-block then projects its own Q slice, runs the one-pass exp2 softmax per
    head against the resident K/V, applies to_out, adds the bias and the
    pre-LN residual, and writes the block output.  Eliminates the q/k/v/attn
    HBM round-trips and kernel-boundary copies of the separate-op path.

    wq comes PRE-SCALED by softmax_scale*log2(e); padded weight columns make
    padded q/k columns zero (exact, see _HeadPaddedProj)."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _project_kv():
        xf = xf_ref[0]  # (L, C)
        k_scr[...] = jax.lax.dot_general(
            xf, wk_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(k_scr.dtype)
        v_scr[...] = jax.lax.dot_general(
            xf, wv_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(v_scr.dtype)

    xb = xb_ref[0]  # (bq, C)
    q = jax.lax.dot_general(
        xb, wq_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(xb.dtype)  # (bq, H*D_pad), scale*log2e pre-folded into wq
    outs = []
    for h in range(heads):
        sl = slice(h * d_pad, (h + 1) * d_pad)
        qh = q[:, sl].astype(jnp.float32)
        kh = k_scr[:, sl].astype(jnp.float32)
        vh = v_scr[:, sl]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, L)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jnp.dot(p.astype(vh.dtype), vh, preferred_element_type=jnp.float32)
        outs.append((acc / l).astype(xb.dtype))
    packed = jnp.concatenate(outs, axis=-1)  # (bq, H*D_pad)
    out = jax.lax.dot_general(
        packed, wo_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    out = out + bo_ref[...] + res_ref[0].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "block_q"))
def attention_block_fused(x_ln, residual, wq_scaled, wk, wv, wo, bo, heads: int, block_q: int = 0):
    """x_ln: (B, L, C) post-LayerNorm hidden states; residual: (B, L, C)
    pre-LN input; wq_scaled/wk/wv: (C, H*D_pad) with softmax_scale*log2(e)
    folded into wq; wo: (H*D_pad, C); bo: (C,).
    Returns residual + to_out(self_attention(x_ln))."""
    b, l, c = x_ln.shape
    hd = wq_scaled.shape[1]
    d_pad = hd // heads
    bq = _packed_block_q(l, block_q)
    bo2 = bo.reshape(1, c).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_block_kernel, heads=heads, d_pad=d_pad),
        out_shape=jax.ShapeDtypeStruct((b, l, c), x_ln.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=int(os.environ.get("SASPA_ATTN_SCOPED_VMEM", str(100 * 1024 * 1024))),
        ),
        grid_spec=pl.GridSpec(
            grid=(b, l // bq),
            in_specs=[
                pl.BlockSpec((1, l, c), lambda b_, i: (b_, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, c), lambda b_, i: (b_, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, c), lambda b_, i: (b_, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((c, hd), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((c, hd), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((c, hd), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((hd, c), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, c), lambda b_, i: (b_, i, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((l, hd), x_ln.dtype),
                pltpu.VMEM((l, hd), x_ln.dtype),
            ],
        ),
    )(x_ln, x_ln, residual, wq_scaled, wk, wv, wo, bo2)


def attention_block_eligible(lq: int, lk: int, heads: int, d: int, c: int, dtype=None) -> bool:
    """Megakernel predicate: packed-eligible self-attention whose full-row
    activations + K/V scratch + weights fit VMEM.  Off by default until the
    interleaved A/B proves it on-chip (SASPA_ATTN_MEGAKERNEL=1).

    `dtype` is the activation dtype — the kernel allocates its blocks and K/V
    scratch in x_ln.dtype, so fp32 activations double every activation term
    (None keeps the historical bf16 assumption for callers that pre-cast)."""
    if os.environ.get("SASPA_ATTN_MEGAKERNEL", "0") != "1":
        return False
    if not packed_flash_eligible(lq, lk, heads, d, dtype):
        return False
    a = 2 if dtype is None else jnp.dtype(dtype).itemsize  # activation bytes
    hd = heads * pad_head_dim(d)
    bq = _packed_block_q(lq)
    vmem = (
        a * lq * c            # x_ln full row
        + 2 * a * lq * hd     # K/V scratch (x_ln.dtype)
        + a * (3 * c * hd + hd * c)  # weights (cast to activation dtype)
        + 2 * a * bq * c      # x block + residual block
        + bq * lq * 4 + bq * lq * a  # scores (f32) + probs
        + 4 * bq * hd + 4 * bq * c   # q + out accum (f32)
    )
    return vmem <= 80 * 1024 * 1024


def pad_head_dim(d: int) -> int:
    """Lane-aligned head dim the packed kernel wants (40->64, 80->128, ...)."""
    return max(64, ((d + 63) // 64) * 64)


def packed_flash_eligible(lq: int, lk: int, heads: int, d: int, dtype=None) -> bool:
    """Static predicate for the packed kernel (self-attention over image
    tokens).  Cross-attention's 77-token kv goes to XLA (measured 3x faster
    there); the VAE's single 512-dim-head 4096-token attention DOES take the
    packed kernel when its weights carry lane-aligned dims (d == pad_head_dim
    check in attention()) — that routing was a measured +2% e2e in round 2
    and is pinned by test_packed_flash_vae_single_head.

    `dtype` is the activation dtype: the kernel's K/V refs and probs live in
    the input dtype, so fp32 activations (e.g. the XL VAE's fp32 decode)
    double those terms (None keeps the bf16 assumption)."""
    if _disabled() or jax.default_backend() != "tpu":
        return False
    if not (lq >= 256 and lk >= 256 and lq == lk and lq % 128 == 0):
        return False
    a = 2 if dtype is None else jnp.dtype(dtype).itemsize
    d_pad = pad_head_dim(d)
    hd = heads * d_pad
    # estimate with the SAME block size the kernel will actually pick so the
    # guard and the kernel can't drift apart (incl. the env override)
    bq = _packed_block_q(lq, _env_block_q())
    vmem = a * (2 * lk * hd) + bq * lk * 4 + bq * lk * a + 4 * bq * hd
    return vmem <= 48 * 1024 * 1024


def _kernel_ok(q, k) -> bool:
    if _disabled() or jax.default_backend() != "tpu":
        return False
    lq, lk, d = q.shape[1], k.shape[1], q.shape[3]
    # kernel pays off for long self-attention; short kv (cross-attn) -> XLA
    if not (lq >= 256 and lk >= 256 and lq % 128 == 0):
        return False
    # VMEM budget: K/V blocks are VMEM-resident; scores are bounded by
    # block_q x block_kv thanks to online softmax. (the VAE's 1-head x
    # 512-dim x 4096-token attention never reaches here — attention() routes
    # it to the packed kernel; the UNet's 40-160-dim heads fit comfortably)
    # estimate with the SAME block sizes flash_attention will actually pick
    # (including env overrides) so the guard can't under-count VMEM
    d_pad = pad_head_dim(d)
    bq = int(os.environ.get("SASPA_ATTN_BLOCK_Q", "512"))
    bkv = int(os.environ.get("SASPA_ATTN_BLOCK_KV", "512"))
    block_q = min(bq, lq) if lq % min(bq, lq) == 0 else lq
    block_kv = bkv if lk % bkv == 0 else (256 if lk % 256 == 0 else lk)
    vmem_bytes = 4 * (2 * lk * d_pad + 3 * block_q * d_pad + block_q * block_kv)
    return vmem_bytes <= 12 * 1024 * 1024


def attention(q, k, v, num_heads: int, use_pallas: bool = True):
    """Inputs (B, L, H*D) packed; returns (B, Lq, H*D)."""
    b, lq, hd = q.shape
    d = hd // num_heads
    scale = 1.0 / math.sqrt(d)
    if (
        use_pallas
        and d == pad_head_dim(d)
        and packed_flash_eligible(lq, k.shape[1], num_heads, d, q.dtype)
    ):
        # already lane-aligned (e.g. the VAE's single 512-dim head): the
        # packed kernel takes the (B, L, H*D) layout directly, no transposes
        qs = (q * (scale * LOG2E)).astype(q.dtype)
        return flash_attention_packed(qs, k, v, num_heads, _env_block_q()).astype(q.dtype)
    qh = q.reshape(b, lq, num_heads, d)
    kh = k.reshape(b, k.shape[1], num_heads, d)
    vh = v.reshape(b, v.shape[1], num_heads, d)
    if use_pallas and _kernel_ok(qh, kh):
        out = flash_attention(qh, kh, vh, scale)
    else:
        out = _xla_attention(qh * scale, kh, vh, 1.0)
    return out.astype(q.dtype).reshape(b, lq, hd)
