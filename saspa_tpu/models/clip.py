"""CLIP in Flax: ModifiedResNet-50 + ViT image towers, combined similarity model.

The reference loads OpenAI CLIP RN50 for its filtering stages
(all_utils/utils.py:253: clip.load('RN50')) and re-wraps its pieces in
TextEncoder/CLIP_selector (all_utils/utils.py:113-166).  Here the full model
is native Flax; zero-shot scoring is a single batched matmul of normalized
embeddings, so the whole filter sweep over thousands of generated images is a
handful of XLA forward passes instead of the reference's one-image-at-a-time
loop.

ModifiedResNet quirks faithfully reproduced: 3-conv stem with avgpool
downsampling, antialiased stride (avgpool before conv in downsample), and the
attention-pool head with positional embedding.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from saspa_tpu.models.text_encoder import CLIPTextConfig, CLIPTextEncoder, CLIP_RN50_TEXT
from saspa_tpu.ops.attention import attention

# OpenAI CLIP preprocessing constants
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_preprocess(images: jax.Array, size: int = 224) -> jax.Array:
    """(B, H, W, 3) float [0,1] -> resized, center-cropped, CLIP-normalized."""
    b, h, w, c = images.shape
    scale = size / min(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    x = jax.image.resize(images, (b, nh, nw, c), method="cubic")
    y0, x0 = (nh - size) // 2, (nw - size) // 2
    x = x[:, y0 : y0 + size, x0 : x0 + size, :]
    return (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)


@dataclass(frozen=True)
class CLIPVisionRNConfig:
    layers: Tuple[int, ...] = (3, 4, 6, 3)  # RN50
    width: int = 64
    output_dim: int = 1024
    heads: int = 32  # attnpool heads = width * 32 // 64
    image_size: int = 224


class _RNBottleneck(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        norm = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name=name)
        out = nn.relu(norm("bn1")(nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)))
        out = nn.relu(norm("bn2")(nn.Conv(self.features, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(out)))
        if self.stride > 1:  # antialiased: avgpool then conv
            out = nn.avg_pool(out, (self.stride, self.stride), strides=(self.stride, self.stride))
        out = norm("bn3")(nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out))
        if x.shape[-1] != self.features * 4 or self.stride > 1:
            sc = x
            if self.stride > 1:
                sc = nn.avg_pool(sc, (self.stride, self.stride), strides=(self.stride, self.stride))
            sc = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype, name="downsample_conv")(sc)
            x = norm("downsample_bn")(sc)
        return nn.relu(x + out)


class AttentionPool2d(nn.Module):
    output_dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        mean = jnp.mean(tokens, axis=1, keepdims=True)
        tokens = jnp.concatenate([mean, tokens], axis=1)  # (B, 1+HW, C)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01), (h * w + 1, c))
        tokens = tokens + pos[None].astype(tokens.dtype)
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(tokens[:, :1])
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(tokens)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(tokens)
        out = attention(q, k, v, self.heads, use_pallas=False)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="c_proj")(out[:, 0])


class CLIPVisionRN(nn.Module):
    cfg: CLIPVisionRNConfig = CLIPVisionRNConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        cfg = self.cfg
        norm = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name=name)
        # 3-conv stem
        x = nn.relu(norm("bn1")(nn.Conv(cfg.width // 2, (3, 3), strides=(2, 2), padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)))
        x = nn.relu(norm("bn2")(nn.Conv(cfg.width // 2, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(x)))
        x = nn.relu(norm("bn3")(nn.Conv(cfg.width, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv3")(x)))
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        for i, blocks in enumerate(cfg.layers):
            feats = cfg.width * 2**i
            for j in range(blocks):
                stride = 2 if j == 0 and i > 0 else 1
                x = _RNBottleneck(feats, stride, self.dtype, name=f"layer{i + 1}_{j}")(x, train)
        heads = cfg.width * 32 // 64
        return AttentionPool2d(cfg.output_dim, heads, self.dtype, name="attnpool")(x)


@dataclass(frozen=True)
class CLIPVisionViTConfig:
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: Optional[int] = 512


class CLIPVisionViT(nn.Module):
    cfg: CLIPVisionViTConfig = CLIPVisionViTConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, return_tokens: bool = False):
        cfg = self.cfg
        b = x.shape[0]
        x = nn.Conv(cfg.width, (cfg.patch_size, cfg.patch_size), strides=(cfg.patch_size, cfg.patch_size), use_bias=False, dtype=self.dtype, name="patch_embed")(x)
        x = x.reshape(b, -1, cfg.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (cfg.width,))
        x = jnp.concatenate([jnp.tile(cls[None, None], (b, 1, 1)).astype(x.dtype), x], axis=1)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01), (x.shape[1], cfg.width))
        x = x + pos[None].astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_pre")(x).astype(x.dtype)
        for i in range(cfg.layers):
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=f"blk_{i}_ln1")(x).astype(x.dtype)
            q = nn.Dense(cfg.width, dtype=self.dtype, name=f"blk_{i}_q")(h)
            k = nn.Dense(cfg.width, dtype=self.dtype, name=f"blk_{i}_k")(h)
            v = nn.Dense(cfg.width, dtype=self.dtype, name=f"blk_{i}_v")(h)
            x = x + nn.Dense(cfg.width, dtype=self.dtype, name=f"blk_{i}_attn_out")(attention(q, k, v, cfg.heads, use_pallas=False))
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=f"blk_{i}_ln2")(x).astype(x.dtype)
            h = nn.Dense(cfg.width * 4, dtype=self.dtype, name=f"blk_{i}_mlp_fc")(h)
            h = h * nn.sigmoid(1.702 * h)  # quick_gelu
            x = x + nn.Dense(cfg.width, dtype=self.dtype, name=f"blk_{i}_mlp_proj")(h)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(x).astype(x.dtype)
        if return_tokens:
            return x  # (B, 1+N, width) for Qformer cross-attention
        pooled = x[:, 0]
        if cfg.output_dim is not None:
            pooled = nn.Dense(cfg.output_dim, use_bias=False, dtype=self.dtype, name="proj")(pooled)
        return pooled


class CLIPModel(nn.Module):
    """Image+text similarity model (zero-shot scorer for the filters)."""

    vision_kind: str = "rn50"  # rn50 | vit-b-16
    text_cfg: CLIPTextConfig = CLIP_RN50_TEXT
    dtype: Any = jnp.float32

    def setup(self):
        if self.vision_kind == "rn50":
            self.visual = CLIPVisionRN(dtype=self.dtype)
            text_cfg = self.text_cfg
        else:
            from saspa_tpu.models.text_encoder import CLIP_VITB16_TEXT

            self.visual = CLIPVisionViT(dtype=self.dtype)
            # ViT-B/16 projects to 512, not RN50's 1024 — the text tower must
            # match or encode_image @ encode_text.T is a shape error
            text_cfg = CLIP_VITB16_TEXT if self.text_cfg is CLIP_RN50_TEXT else self.text_cfg
        self.text = CLIPTextEncoder(cfg=text_cfg, dtype=self.dtype)
        self.logit_scale = self.param("logit_scale", nn.initializers.constant(4.6052), ())

    def encode_image(self, images):
        feats = self.visual(images)
        return feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-8)

    def encode_text(self, token_ids):
        out = self.text(token_ids)
        feats = out["proj"]
        return feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-8)

    def __call__(self, images, token_ids):
        """Returns zero-shot logits (B_img, B_txt), scaled."""
        img = self.encode_image(images)
        txt = self.encode_text(token_ids)
        return jnp.exp(self.logit_scale) * img @ txt.T
