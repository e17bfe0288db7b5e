"""AutoencoderKL (Stable Diffusion VAE) in Flax, NHWC.

Decode (latents -> image) is the hot path after every generation; encode is
needed for SDEdit/img2img and the `upcast_vae` fp32 decode fix the reference
applies for SDXL-Turbo (run_aug/run_aug.py:224) is the default here: the VAE
runs fp32 regardless of the UNet dtype (cheap — it runs once per image, not
per step).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from saspa_tpu.models.unet import GroupNorm32
from saspa_tpu.ops.attention import attention


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    scaling_factor: float = 0.18215  # SD1.5/2.1; SDXL: 0.13025


SD_VAE = VAEConfig()
SDXL_VAE = VAEConfig(scaling_factor=0.13025)
# name registry for the converter CLI (tools/convert_weights.py vae kind's
# optional arch arg) — tests register tiny entries here
VAE_CONFIGS = {"sd": SD_VAE, "sdxl": SDXL_VAE}


class VAEResnetBlock(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = GroupNorm32(32, epsilon=1e-6, act="silu", name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm32(32, epsilon=1e-6, act="silu", name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class VAEAttentionBlock(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        x = GroupNorm32(32, epsilon=1e-6, name="group_norm")(x).reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(x)
        out = attention(q, k, v, num_heads=1)
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out)
        return res + out.reshape(b, h, w, c)


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = VAEResnetBlock(ch, self.dtype, name=f"down_{i}_block_{j}")(x)
            if i < len(cfg.block_out_channels) - 1:
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)), dtype=self.dtype, name=f"down_{i}_downsample")(x)
        ch = cfg.block_out_channels[-1]
        x = VAEResnetBlock(ch, self.dtype, name="mid_block_1")(x)
        x = VAEAttentionBlock(self.dtype, name="mid_attn")(x)
        x = VAEResnetBlock(ch, self.dtype, name="mid_block_2")(x)
        x = GroupNorm32(32, epsilon=1e-6, act="silu", name="conv_norm_out")(x)
        x = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        return nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=self.dtype, name="quant_conv")(x)


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        z = nn.Conv(cfg.latent_channels, (1, 1), dtype=self.dtype, name="post_quant_conv")(z)
        ch = cfg.block_out_channels[-1]
        x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        x = VAEResnetBlock(ch, self.dtype, name="mid_block_1")(x)
        x = VAEAttentionBlock(self.dtype, name="mid_attn")(x)
        x = VAEResnetBlock(ch, self.dtype, name="mid_block_2")(x)
        for i, ch in enumerate(reversed(cfg.block_out_channels)):
            for j in range(cfg.layers_per_block + 1):
                x = VAEResnetBlock(ch, self.dtype, name=f"up_{i}_block_{j}")(x)
            if i < len(cfg.block_out_channels) - 1:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
                x = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name=f"up_{i}_upsample")(x)
        x = GroupNorm32(32, epsilon=1e-6, act="silu", name="conv_norm_out")(x)
        return nn.Conv(cfg.in_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)


class AutoencoderKL(nn.Module):
    """encode(x) -> (mean, logvar); decode(z) -> image in [-1, 1].

    Latent scaling (z * scaling_factor after encode, / before decode) follows
    the SD convention and lives in the pipeline, not here.
    """

    cfg: VAEConfig = SD_VAE
    dtype: Any = jnp.float32  # fp32 by default (upcast_vae semantics)

    def setup(self):
        self.encoder = Encoder(self.cfg, self.dtype)
        self.decoder = Decoder(self.cfg, self.dtype)

    def encode(self, x):
        moments = self.encoder(x.astype(self.dtype))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z):
        return self.decoder(z.astype(self.dtype)).astype(jnp.float32)

    def __call__(self, x, key=None):
        mean, logvar = self.encode(x)
        z = mean if key is None else mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape)
        return self.decode(z), mean, logvar
