"""Conditional diffusion UNet in Flax (SD v1.5 / v2.1 / SDXL / SDXL-Turbo).

A from-scratch NHWC implementation of the denoising UNet family the reference
drives through diffusers (run_aug/run_aug.py:53-62 model zoo; pipe call at
:278).  One configurable module covers:
  * SD v1.5: blocks (320,640,1280,1280), 8 heads, cross-dim 768
  * SD v2.1-base: same blocks, head-dim 64, cross-dim 1024, linear proj
  * SDXL(-Turbo): blocks (320,640,1280), transformer depth (1,2,10),
    cross-dim 2048, text_time addition embeddings

TPU-first choices: NHWC convs (MXU-native), Pallas flash attention for
image-token self-attention (ops/attention.py), fp32 GroupNorm/softmax islands
inside a bf16 network.  (A fused-QKV variant was benchmarked and REGRESSED
1.34 -> 1.30 img/s/chip end-to-end — XLA already schedules the separate
projections well — so q/k/v stay separate, matching diffusers' weight layout.)
"""

from __future__ import annotations

import dataclasses
import math
import os
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from saspa_tpu.ops.attention import attention


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    layers_per_block: int = 2
    transformer_layers_per_block: Tuple[int, ...] = (1, 1, 1, 1)
    # diffusers' "attention_head_dim" for the SD family is actually the head
    # COUNT per block (SD1.5: 8 everywhere; SD2.1: (5,10,20,20); SDXL: (5,10,20)),
    # giving per-head dims of ch/count (40/80/160 for SD1.5, 64 for the rest).
    num_attention_heads: Tuple[int, ...] = (8, 8, 8, 8)
    cross_attention_dim: int = 768
    use_linear_projection: bool = False
    addition_embed_type: Optional[str] = None  # None | "text_time" (SDXL)
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: Optional[int] = None  # SDXL: 2816
    norm_num_groups: int = 32
    freq_shift: int = 0
    flip_sin_to_cos: bool = True

    def num_heads(self, block_idx: int, channels: int) -> int:
        return self.num_attention_heads[block_idx]


SD15_UNET = UNetConfig()

SD21_UNET = UNetConfig(
    num_attention_heads=(5, 10, 20, 20),  # head dim 64 per block
    cross_attention_dim=1024,
    use_linear_projection=True,
)

SDXL_UNET = UNetConfig(
    block_out_channels=(320, 640, 1280),
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D"),
    transformer_layers_per_block=(1, 2, 10),
    num_attention_heads=(5, 10, 20),
    cross_attention_dim=2048,
    use_linear_projection=True,
    addition_embed_type="text_time",
    projection_class_embeddings_input_dim=2816,
)

# SDXL refiner (stabilityai/stable-diffusion-xl-refiner-1.0): bigG-only text
# conditioning (1280), 4-deep transformers in the two cross-attn stages,
# add_embedding input 2560 = pooled(1280) + 5 time ids x 256 (incl. the
# aesthetic score). Cross-checked against the public config layout:
# tests/test_convert_real_layout.py converts a full synthetic refiner state
# dict (tools/synth_checkpoints.SDXL_REFINER_TORCH_CFG) into exactly this
# module's init tree.
SDXL_REFINER_UNET = UNetConfig(
    block_out_channels=(384, 768, 1536, 1536),
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D"),
    # diffusers' refiner config is scalar transformer_layers_per_block=4 —
    # expanded per level; entries 0/3 are plain blocks (unused) and the MID
    # block reads [-1], so it must be 4 (1 would silently drop the refiner's
    # mid transformer_blocks.1-3, ~140M params; with them the total lands at
    # ~2.26B = the published "2.3B" refiner UNet)
    transformer_layers_per_block=(1, 4, 4, 4),
    num_attention_heads=(6, 12, 24, 24),
    cross_attention_dim=1280,
    use_linear_projection=True,
    addition_embed_type="text_time",
    projection_class_embeddings_input_dim=2560,
)

UNET_CONFIGS = {
    "sd_v1.5": SD15_UNET,
    "sd_v2.1": SD21_UNET,
    "sd_xl": SDXL_UNET,
    "sd_xl-turbo": SDXL_UNET,
    "sd_xl-refiner": SDXL_REFINER_UNET,
    "blip_diffusion": SD15_UNET,  # BLIP-Diffusion rides an SD1.5 UNet
    "blip_diffusion-controlnet": SD15_UNET,
    "ip2p": dataclasses.replace(SD15_UNET, in_channels=8),  # image-conditioned
}


def timestep_embedding(t: jax.Array, dim: int, flip_sin_to_cos=True, freq_shift=0.0, max_period=10000.0):
    """Sinusoidal timestep embedding (diffusers get_timestep_embedding semantics)."""
    half = dim // 2
    exponent = -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / (half - freq_shift)
    emb = t.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    return jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)


class TimestepEmbedding(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(x)
        x = nn.silu(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(x)


class _GNParams(nn.Module):
    """Owns GroupNorm's {scale, bias} under the exact flax nn.GroupNorm param
    names/paths (converters write to <norm>/GroupNorm_0/{scale,bias}) while
    routing the computation through ops.groupnorm (fused Pallas kernel on
    TPU, bit-identical flax fallback elsewhere)."""

    num_groups: int
    epsilon: float
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x, x2=None):
        from saspa_tpu.ops.groupnorm import group_norm

        c = x.shape[-1] + (0 if x2 is None else x2.shape[-1])
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if x2 is None:
            return group_norm(x, scale, bias, self.num_groups, self.epsilon, self.act)
        # split-skip path: normalize the two concat halves WITHOUT
        # materializing the concatenation.  Caller guarantees the seam sits
        # on a group boundary, so per-group statistics are untouched — this
        # is EXACT, not an approximation (each group lives wholly inside one
        # half; scale/bias just slice).
        c1 = x.shape[-1]
        g1 = self.num_groups * c1 // c
        h1 = group_norm(x, scale[:c1], bias[:c1], g1, self.epsilon, self.act)
        h2 = group_norm(x2, scale[c1:], bias[c1:], self.num_groups - g1, self.epsilon, self.act)
        return h1, h2


class GroupNorm32(nn.Module):
    """GroupNorm with fp32 statistics (stability island inside bf16 nets).

    On TPU this runs the fused Pallas GroupNorm(+SiLU) kernel
    (ops/groupnorm.py — the round-1 trace showed XLA's GN stat fusions at 22%
    of generation wall clock); elsewhere it is bit-identical to flax
    nn.GroupNorm on an fp32 upcast.  `act="silu"` fuses the activation the
    ResnetBlock/conv_out callers apply right after the norm.

    A second input `x2` engages the split-skip path (same params, seam must
    be group-aligned): returns the pair (norm(x half), norm(x2 half))."""

    num_groups: int = 32
    epsilon: float = 1e-5
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x, x2=None):
        c = x.shape[-1] + (0 if x2 is None else x2.shape[-1])
        groups = min(self.num_groups, c)  # tiny test configs only; real nets use 32
        return _GNParams(groups, self.epsilon, self.act, name="GroupNorm_0")(x, x2)


def _ln32_forward(x, scale, bias, epsilon: float):
    """LayerNorm with fp32 statistics and a compute-dtype normalize pass
    (shared by LayerNorm32 and the param-owning _LNParams)."""
    from saspa_tpu.ops.layernorm import layer_norm_eligible, layer_norm_one_pass

    if os.environ.get("SASPA_LN_FP32_NORM", "") != "1" and layer_norm_eligible(x):
        return layer_norm_one_pass(x, scale, bias, epsilon)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    # flax _compute_stats fast-variance form + its exact normalize
    # association ((x-mean) * (rsqrt*scale) + bias), so the fp32 path is
    # bit-identical to the nn.LayerNorm island it replaces
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean)
    mul = jax.lax.rsqrt(var + epsilon) * scale
    if os.environ.get("SASPA_LN_FP32_NORM", "") == "1" or x.dtype == jnp.float32:
        return ((xf - mean) * mul + bias).astype(x.dtype)
    d = x.dtype
    return (x - mean.astype(d)) * mul.astype(d) + bias.astype(d)


class LayerNorm32(nn.Module):
    """LayerNorm with fp32 statistics and a compute-dtype normalize pass.

    Same param names/paths as flax nn.LayerNorm ({scale, bias}), so the
    weight converters are unaffected.  For fp32 inputs this is bit-identical
    to the previous nn.LayerNorm(dtype=fp32) island; for bf16 inputs the
    subtract/scale/shift pass runs in bf16 (stats still fp32) — the same
    recipe-faithful trade the GN kernel made in r3 (the reference runs the
    whole pipe fp16, run_aug/run_aug.py:149-211; fp32 stats are strictly
    tighter).  SASPA_LN_FP32_NORM=1 reverts to the full-fp32 pass."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return _ln32_forward(x, scale, bias, self.epsilon)


class _LNParams(nn.Module):
    """LayerNorm32 with setup-declared params so a parent module can read
    {scale, bias} directly (the fused LN+GEGLU kernel consumes raw params).
    Same param names/paths as LayerNorm32 / flax nn.LayerNorm."""

    features: int
    epsilon: float = 1e-5

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

    def __call__(self, x):
        return _ln32_forward(x, self.scale, self.bias, self.epsilon)


class _SplitInputConv(nn.Module):
    """nn.Conv-compatible conv (same param names {kernel, bias}, same init,
    same dtype-promotion numerics) whose (kh, kw, c1+c2, out) kernel is
    applied to an UNMATERIALIZED channel concatenation: conv([x1; x2]) ==
    conv(x1, K[..., :c1, :]) + conv(x2, K[..., c1:, :]).  Exact up to float
    summation order (the fused conv accumulates all c1+c2 input channels in
    one dot; this accumulates two partial sums)."""

    features: int
    kernel_size: Tuple[int, int]
    in_features: int
    padding: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, self.in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        c1 = x1.shape[-1]
        assert c1 + x2.shape[-1] == self.in_features
        dn = jax.lax.conv_dimension_numbers(x1.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
        pad = [(self.padding, self.padding)] * 2

        def _conv(x, k):
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), k.astype(self.dtype), (1, 1), pad,
                dimension_numbers=dn)

        out = _conv(x1, kernel[:, :, :c1, :]) + _conv(x2, kernel[:, :, c1:, :])
        return out + bias.astype(self.dtype)


class ResnetBlock2D(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32
    groups: int = 32

    @nn.compact
    def __call__(self, x, temb, skip=None):
        if skip is None:
            h = GroupNorm32(self.groups, act="silu", name="norm1")(x)
            h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        else:
            # split-skip path (SASPA_SPLIT_SKIP_CONCAT): the up-block's
            # concat([x, skip]) is never materialized — norm1 normalizes the
            # halves separately (exact: caller guarantees a group-aligned
            # seam) and conv1 runs as two sliced-kernel convs summed.  Param
            # tree identical to the concat path.
            h1, h2 = GroupNorm32(self.groups, act="silu", name="norm1")(x, skip)
            h = _SplitInputConv(
                self.out_channels, (3, 3), x.shape[-1] + skip.shape[-1],
                padding=1, dtype=self.dtype, name="conv1")(h1, h2)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
        h = h + cfg_tile(t, h.shape[0])[:, None, None, :]
        h = GroupNorm32(self.groups, act="silu", name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        in_ch = x.shape[-1] + (0 if skip is None else skip.shape[-1])
        if in_ch != self.out_channels:
            if skip is None:
                x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
            else:
                x = _SplitInputConv(
                    self.out_channels, (1, 1), in_ch, padding=0,
                    dtype=self.dtype, name="conv_shortcut")(x, skip)
        elif skip is not None:  # pragma: no cover - SD shapes always project
            x = jnp.concatenate([x, skip], axis=-1)
        return x + h


def _split_skip_eligible(cx: int, cs: int, groups: int) -> bool:
    """SASPA_SPLIT_SKIP_CONCAT=1 probe (read at trace time so
    tools/ab_interleave.py can flip it per arm; default OFF pending the
    interleaved A/B): elide an up-block skip concat iff the seam falls on a
    GroupNorm group boundary, which makes the split normalization EXACT.
    For SD1.5's 32 groups that is every same-width seam (320+320, 640+640,
    1280+1280 — 9 of 12) but not the mixed-level ones (1280+640, 640+320)."""
    if os.environ.get("SASPA_SPLIT_SKIP_CONCAT", "") != "1":
        return False
    c = cx + cs
    return c % groups == 0 and cx % (c // groups) == 0


def cfg_tile(x, n: int):
    """CFG shared-prefix helper: tile a pre-fork (B) tensor to the post-fork
    batch n=2B.  Under classifier-free guidance both halves of the model
    batch share ONE latent (the CFG combination collapses eps to a single
    update), so every activation before the first cross-attention is
    bit-identical across halves — the network runs at batch B until the
    first cross-attention 'forks' it to 2B, and pre-fork tensors are tiled
    wherever they join post-fork ones."""
    if x.shape[0] == n:
        return x
    assert 2 * x.shape[0] == n, (x.shape, n)
    return jnp.concatenate([x, x], axis=0)


class _HeadPaddedProj(nn.Module):
    """nn.Dense-compatible projection (param path <name>/kernel, lecun-normal
    init, optional bias) that can emit head-PADDED outputs: the (in, H, D)
    kernel is zero-padded to (in, H, D_pad) at apply time.  XLA hoists the
    tiny weight pad out of the denoise scan (loop-invariant), so the
    per-step 20MB activation pads the old kernel needed simply disappear.
    Zero-padded q/k columns contribute nothing to attention logits and
    zero-padded v columns produce exactly-zero output columns — exact."""

    features: int
    heads: int
    d_pad: int  # per-head output dim (== features//heads when not padding)
    in_features: int = 0
    use_bias: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        assert self.in_features > 0, "in_features required (setup-based params)"
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_features, self.features), jnp.float32
        )
        if self.use_bias:
            self.bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

    def padded_weights(self):
        """The head-padded (in, H*D_pad) kernel itself — the fused
        attention-block megakernel consumes raw weights, not a matmul."""
        inner = self.features
        d = inner // self.heads
        w = self.kernel.astype(self.dtype)
        if self.d_pad != d:
            w = w.reshape(self.in_features, self.heads, d)
            w = jnp.pad(w, ((0, 0), (0, 0), (0, self.d_pad - d)))
            w = w.reshape(self.in_features, self.heads * self.d_pad)
        return w

    def __call__(self, x):
        y = x.astype(self.dtype) @ self.padded_weights()
        if self.use_bias:
            b = self.bias.astype(self.dtype)
            d = self.features // self.heads
            if self.d_pad != d:
                # pad the (H*D,) bias per head to (H*D_pad,), matching the
                # padded kernel columns (zero bias on pad columns keeps them
                # exactly zero)
                b = jnp.pad(b.reshape(self.heads, d), ((0, 0), (0, self.d_pad - d))).reshape(-1)
            y = y + b
        return y


class _HeadPaddedOutProj(nn.Module):
    """to_out for head-padded attention output: the kernel's INPUT rows are
    zero-padded per head ((H, D, out) -> (H, D_pad, out)); since the padded
    input columns are exactly zero, the product equals the unpadded one."""

    features: int
    heads: int
    d_pad: int
    dtype: Any = jnp.float32

    def setup(self):
        inner = self.features
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(), (inner, inner), jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros, (inner,), jnp.float32)

    def padded_weights(self):
        inner = self.features
        d = inner // self.heads
        w = self.kernel.astype(self.dtype)
        if self.d_pad != d:
            w = w.reshape(self.heads, d, inner)
            w = jnp.pad(w, ((0, 0), (0, self.d_pad - d), (0, 0)))
            w = w.reshape(self.heads * self.d_pad, inner)
        return w

    def __call__(self, x):
        return x.astype(self.dtype) @ self.padded_weights() + self.bias.astype(self.dtype)


class CrossAttention(nn.Module):
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, residual=None):
        """residual, when given, is added to the attention output (fused into
        the megakernel when eligible; otherwise a plain add)."""
        from saspa_tpu.ops.attention import (
            LOG2E,
            attention_block_eligible,
            attention_block_fused,
            flash_attention_packed,
            pad_head_dim,
            packed_flash_eligible,
        )

        is_self = context is None
        context = x if context is None else context
        inner = x.shape[-1]
        heads = self.num_heads
        d = inner // heads
        lq, lk = x.shape[1], context.shape[1]
        use_flash = packed_flash_eligible(lq, lk, heads, d, x.dtype)
        d_pad = pad_head_dim(d) if use_flash else d

        to_q = _HeadPaddedProj(inner, heads, d_pad, in_features=inner, dtype=self.dtype, name="to_q")
        to_k = _HeadPaddedProj(inner, heads, d_pad, in_features=context.shape[-1], dtype=self.dtype, name="to_k")
        to_v = _HeadPaddedProj(inner, heads, d_pad, in_features=context.shape[-1], dtype=self.dtype, name="to_v")
        to_out = _HeadPaddedOutProj(inner, heads, d_pad, dtype=self.dtype, name="to_out")

        if (
            is_self and residual is not None and use_flash
            and attention_block_eligible(lq, lk, heads, d, inner, x.dtype)
        ):
            # QKV + attention + to_out + residual in ONE kernel; the
            # scale*log2e prefold moves into wq (hoisted out of the scan)
            wq = (to_q.padded_weights() * (LOG2E / math.sqrt(d))).astype(self.dtype)
            return attention_block_fused(
                x, residual, wq, to_k.padded_weights(), to_v.padded_weights(),
                to_out.padded_weights(), to_out.bias, heads,
            )

        q = to_q(x)
        k = to_k(context)
        v = to_v(context)
        # CFG fork: a pre-fork (B) query stream meets a (2B) context — both
        # CFG halves share the same queries, so project once and tile
        q = cfg_tile(q, context.shape[0])
        if use_flash:
            from saspa_tpu.ops.attention import _env_block_q

            qs = (q * (LOG2E / math.sqrt(d))).astype(q.dtype)
            out = flash_attention_packed(qs, k, v, heads, _env_block_q())
        else:
            # cross-attention's 77-token kv stays on XLA: a packed Pallas
            # cross kernel was A/B'd at 0.274 ms vs XLA's 0.089 ms on the
            # level-0 shape (b8 h8 4096q 77kv) - XLA's short-kv softmax
            # fusion wins, so the kernel was removed
            out = attention(q, k, v, heads)
        out = to_out(out)
        return out if residual is None else residual + out


class _DenseParams(nn.Module):
    """nn.Dense-equivalent (same param names/init/promote-to-dtype numerics)
    with setup-declared params so a parent can read kernel/bias directly."""

    features: int
    in_features: int
    dtype: Any = jnp.float32

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_features, self.features), jnp.float32
        )
        self.bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

    def __call__(self, x):
        return x.astype(self.dtype) @ self.kernel.astype(self.dtype) + self.bias.astype(self.dtype)


class FeedForwardGEGLU(nn.Module):
    dim: int
    dtype: Any = jnp.float32
    mult: int = 4

    def setup(self):
        self.proj_in = _DenseParams(self.dim * self.mult * 2, self.dim, self.dtype)
        self.proj_out = _DenseParams(self.dim, self.dim * self.mult, self.dtype)

    def __call__(self, x):
        h = self.proj_in(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # diffusers GEGLU applies F.gelu (exact erf), not the tanh approximation
        h = h * nn.gelu(gate, approximate=False)
        return self.proj_out(h)


class BasicTransformerBlock(nn.Module):
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        from saspa_tpu.ops.geglu import fused_ln_geglu, ln_geglu_eligible

        x = CrossAttention(self.num_heads, self.dtype, name="attn1")(
            LayerNorm32(name="norm1")(x).astype(x.dtype),
            residual=x,
        )
        a2 = CrossAttention(self.num_heads, self.dtype, name="attn2")(
            LayerNorm32(name="norm2")(x).astype(x.dtype), context
        )
        x = cfg_tile(x, a2.shape[0]) + a2  # CFG fork point (B -> 2B)
        c = x.shape[-1]
        norm3 = _LNParams(c, name="norm3")
        ff = FeedForwardGEGLU(c, self.dtype, name="ff")
        if ln_geglu_eligible(x.shape[1], c, ff.mult, x.dtype):
            # norm3 + proj_in + gelu-gate + proj_out + residual in one Pallas
            # kernel: the (2B, L, 8C) GEGLU hidden stays in VMEM (the r3 trace
            # measured its HBM round-trip at ~6% of the fused program)
            x = fused_ln_geglu(
                x, norm3.scale, norm3.bias,
                ff.proj_in.kernel, ff.proj_in.bias,
                ff.proj_out.kernel, ff.proj_out.bias,
            )
        else:
            x = x + ff(norm3(x).astype(x.dtype))
        return x


class Transformer2D(nn.Module):
    num_heads: int
    depth: int = 1
    use_linear_projection: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        residual = x
        # diffusers Transformer2DModel hardcodes eps=1e-6 for this norm
        # (unlike the ResnetBlock GNs' 1e-5)
        x = GroupNorm32(32, epsilon=1e-6, name="norm")(x)
        if self.use_linear_projection:
            x = x.reshape(b, h * w, c)
            x = nn.Dense(c, dtype=self.dtype, name="proj_in")(x)
        else:
            x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(x)
            x = x.reshape(b, h * w, c)
        for i in range(self.depth):
            x = BasicTransformerBlock(self.num_heads, self.dtype, name=f"blocks_{i}")(x, context)
        # batch may have grown B -> 2B at the CFG fork inside the blocks
        if self.use_linear_projection:
            x = nn.Dense(c, dtype=self.dtype, name="proj_out")(x)
            x = x.reshape(x.shape[0], h, w, c)
        else:
            x = x.reshape(x.shape[0], h, w, c)
            x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + cfg_tile(residual, x.shape[0])


class Downsample2D(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv")(x)


class Upsample2D(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class UNetMidBlock2DCrossAttn(nn.Module):
    cfg: UNetConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context):
        cfg = self.cfg
        ch = cfg.block_out_channels[-1]
        heads = cfg.num_heads(len(cfg.block_out_channels) - 1, ch)
        depth = cfg.transformer_layers_per_block[-1]
        x = ResnetBlock2D(ch, self.dtype, name="resnets_0")(x, temb)
        x = Transformer2D(heads, depth, cfg.use_linear_projection, self.dtype, name="attentions_0")(x, context)
        x = ResnetBlock2D(ch, self.dtype, name="resnets_1")(x, temb)
        return x


class UNet2DCondition(nn.Module):
    """Returns the predicted noise (epsilon) in NHWC.

    down/mid residual injection hooks (`down_block_additional_residuals`,
    `mid_block_additional_residual`) carry ControlNet conditioning, matching
    diffusers' contract.
    """

    cfg: UNetConfig = SD15_UNET
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,  # (B, H, W, C_in) latents
        timesteps: jax.Array,  # (B,) int or scalar
        encoder_hidden_states: jax.Array,  # (B, L, cross_dim)
        added_cond: Optional[dict] = None,  # SDXL: {"text_embeds": (B,1280), "time_ids": (B,6)}
        down_block_additional_residuals: Optional[Sequence[jax.Array]] = None,
        mid_block_additional_residual: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.cfg
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        # time embedding
        t_emb_dim = cfg.block_out_channels[0] * 4
        t_freq = timestep_embedding(timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift)
        temb = TimestepEmbedding(t_emb_dim, self.dtype, name="time_embedding")(t_freq.astype(self.dtype))

        if cfg.addition_embed_type == "text_time":
            assert added_cond is not None, "SDXL needs added_cond {text_embeds, time_ids}"
            # added conds enter temb, which feeds every resnet — the CFG
            # shared-prefix trick (sample at B, context at 2B) cannot apply
            assert added_cond["text_embeds"].shape[0] == sample.shape[0], \
                "text_time added_cond batch must match sample batch (no CFG shared prefix for XL)"
            time_ids = added_cond["time_ids"].reshape(-1)
            tid_emb = timestep_embedding(time_ids, cfg.addition_time_embed_dim, cfg.flip_sin_to_cos, cfg.freq_shift)
            tid_emb = tid_emb.reshape(sample.shape[0], -1)
            add_embeds = jnp.concatenate([added_cond["text_embeds"], tid_emb], axis=-1).astype(self.dtype)
            temb = temb + TimestepEmbedding(t_emb_dim, self.dtype, name="add_embedding")(add_embeds)

        context = encoder_hidden_states.astype(self.dtype)
        sample = sample.astype(self.dtype)

        # conv_in
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(sample)
        down_res = [x]

        # down blocks
        for i, block_type in enumerate(cfg.down_block_types):
            ch = cfg.block_out_channels[i]
            heads = cfg.num_heads(i, ch)
            depth = cfg.transformer_layers_per_block[min(i, len(cfg.transformer_layers_per_block) - 1)]
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(ch, self.dtype, name=f"down_{i}_resnets_{j}")(x, temb)
                if block_type == "CrossAttnDownBlock2D":
                    x = Transformer2D(heads, depth, cfg.use_linear_projection, self.dtype, name=f"down_{i}_attentions_{j}")(x, context)
                down_res.append(x)
            if i < len(cfg.block_out_channels) - 1:
                x = Downsample2D(ch, self.dtype, name=f"down_{i}_downsample")(x)
                down_res.append(x)

        # controlnet residual injection (down): residuals feed the SKIP list
        # only — the mid-block input stays the raw last down output, matching
        # diffusers UNet2DConditionModel (mid conditioning arrives solely via
        # mid_block_additional_residual).
        if down_block_additional_residuals is not None:
            # with the CFG shared prefix both lists carry pre-fork (B) heads
            # and post-fork (2B) tails; tile whichever side is pre-fork
            down_res = [
                cfg_tile(r, max(r.shape[0], c.shape[0])) + cfg_tile(c, max(r.shape[0], c.shape[0]))
                for r, c in zip(down_res, down_block_additional_residuals)
            ]

        # mid
        x = UNetMidBlock2DCrossAttn(cfg, self.dtype, name="mid_block")(x, temb, context)
        if mid_block_additional_residual is not None:
            x = x + cfg_tile(mid_block_additional_residual, x.shape[0])

        # up blocks
        rev_channels = list(cfg.block_out_channels)[::-1]
        for i, block_type in enumerate(cfg.up_block_types):
            ch = rev_channels[i]
            block_idx = len(cfg.block_out_channels) - 1 - i
            heads = cfg.num_heads(block_idx, ch)
            depth = cfg.transformer_layers_per_block[min(block_idx, len(cfg.transformer_layers_per_block) - 1)]
            for j in range(cfg.layers_per_block + 1):
                skip = cfg_tile(down_res.pop(), x.shape[0])  # pre-fork skips are (B)
                if _split_skip_eligible(x.shape[-1], skip.shape[-1], cfg.norm_num_groups):
                    # skip-concat elision: 9 of SD1.5's 12 up-concat seams are
                    # group-aligned (same-width levels); the concat is never
                    # materialized — norm1 splits, conv1/shortcut run as
                    # sliced-kernel conv pairs (see ResnetBlock2D)
                    x = ResnetBlock2D(ch, self.dtype, name=f"up_{i}_resnets_{j}")(x, temb, skip=skip)
                else:
                    x = jnp.concatenate([x, skip], axis=-1)
                    x = ResnetBlock2D(ch, self.dtype, name=f"up_{i}_resnets_{j}")(x, temb)
                if block_type == "CrossAttnUpBlock2D":
                    x = Transformer2D(heads, depth, cfg.use_linear_projection, self.dtype, name=f"up_{i}_attentions_{j}")(x, context)
            if i < len(cfg.up_block_types) - 1:
                x = Upsample2D(ch, self.dtype, name=f"up_{i}_upsample")(x)

        # out
        x = GroupNorm32(cfg.norm_num_groups, act="silu", name="conv_norm_out")(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        return x.astype(jnp.float32)
