"""ControlNet in Flax (canny / hed conditioning for the SD family).

A trainable copy of the UNet encoder + zero-initialized output convs
(Zhang et al., "Adding Conditional Control...", the
lllyasviel/control_v11p_sd15_canny weights the reference loads at
run_aug/run_aug.py:64-67,184-186).  Produces per-skip residuals and a mid
residual consumed by UNet2DCondition's additional_residuals hooks, each scaled
by `conditioning_scale` (CONTROLNET_CONDITIONING_SCALE=0.75 default,
run_aug/run_aug.py:545).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from saspa_tpu.models.unet import (
    ResnetBlock2D,
    Downsample2D,
    TimestepEmbedding,
    Transformer2D,
    UNetConfig,
    UNetMidBlock2DCrossAttn,
    SD15_UNET,
    timestep_embedding,
)

zeros_init = nn.initializers.zeros


class ControlNetConditioningEmbedding(nn.Module):
    """Maps the (B, H, W, 3) conditioning image (canny edges in [0,1]) to the
    latent resolution feature map; final conv zero-initialized."""

    out_channels: int = 320
    block_channels: Tuple[int, ...] = (16, 32, 96, 256)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cond):
        x = nn.Conv(self.block_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(cond)
        x = nn.silu(x)
        for i in range(len(self.block_channels) - 1):
            x = nn.Conv(self.block_channels[i], (3, 3), padding=1, dtype=self.dtype, name=f"blocks_{2 * i}")(x)
            x = nn.silu(x)
            x = nn.Conv(self.block_channels[i + 1], (3, 3), strides=(2, 2), padding=1, dtype=self.dtype, name=f"blocks_{2 * i + 1}")(x)
            x = nn.silu(x)
        return nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype,
            kernel_init=zeros_init, bias_init=zeros_init, name="conv_out",
        )(x)


class ControlNet(nn.Module):
    cfg: UNetConfig = SD15_UNET
    dtype: Any = jnp.float32

    def setup(self):
        # defined in setup (not inline in the compact __call__) so embed_cond
        # can expose it separately: the conditioning embedding is timestep-
        # invariant and the sampler hoists it OUT of the denoise scan — one
        # full-resolution conv stack per batch instead of one per step
        self.controlnet_cond_embedding = ControlNetConditioningEmbedding(
            self.cfg.block_out_channels[0], dtype=self.dtype
        )

    def embed_cond(self, controlnet_cond: jax.Array) -> jax.Array:
        """(B, 8H, 8W, 3) cond image in [0,1] -> (B, H, W, C0) embedding."""
        return self.controlnet_cond_embedding(controlnet_cond.astype(self.dtype))

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,  # (B, H, W, 4) latents
        timesteps: jax.Array,
        encoder_hidden_states: jax.Array,
        controlnet_cond: Optional[jax.Array] = None,  # (B, 8H, 8W, 3) cond image in [0,1]
        conditioning_scale: float = 1.0,
        added_cond: Optional[dict] = None,
        cond_emb: Optional[jax.Array] = None,  # precomputed embed_cond output
    ) -> Tuple[List[jax.Array], jax.Array]:
        cfg = self.cfg
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        t_emb_dim = cfg.block_out_channels[0] * 4
        t_freq = timestep_embedding(timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift)
        temb = TimestepEmbedding(t_emb_dim, self.dtype, name="time_embedding")(t_freq.astype(self.dtype))

        if cfg.addition_embed_type == "text_time":
            assert added_cond is not None
            time_ids = added_cond["time_ids"].reshape(-1)
            tid_emb = timestep_embedding(time_ids, cfg.addition_time_embed_dim, cfg.flip_sin_to_cos, cfg.freq_shift)
            tid_emb = tid_emb.reshape(sample.shape[0], -1)
            add_embeds = jnp.concatenate([added_cond["text_embeds"], tid_emb], axis=-1).astype(self.dtype)
            temb = temb + TimestepEmbedding(t_emb_dim, self.dtype, name="add_embedding")(add_embeds)

        context = encoder_hidden_states.astype(self.dtype)
        sample = sample.astype(self.dtype)

        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(sample)
        if cond_emb is None:
            assert controlnet_cond is not None, "need controlnet_cond or cond_emb"
            cond_emb = self.embed_cond(controlnet_cond)
        x = x + cond_emb.astype(x.dtype)

        down_res = [x]
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

        x = UNetMidBlock2DCrossAttn(cfg, self.dtype, name="mid_block")(x, temb, context)

        # zero convs
        out_res = []
        for idx, r in enumerate(down_res):
            zc = nn.Conv(
                r.shape[-1], (1, 1), dtype=self.dtype,
                kernel_init=zeros_init, bias_init=zeros_init, name=f"controlnet_down_blocks_{idx}",
            )(r)
            out_res.append(zc * conditioning_scale)
        mid = nn.Conv(
            x.shape[-1], (1, 1), dtype=self.dtype,
            kernel_init=zeros_init, bias_init=zeros_init, name="controlnet_mid_block",
        )(x) * conditioning_scale
        return out_res, mid
