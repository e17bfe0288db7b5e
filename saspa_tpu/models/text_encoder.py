"""CLIP-family text transformers in Flax.

One configurable module covers every text tower the framework needs:
  * SD v1.5 conditioning: CLIP ViT-L/14 text (12L x 768, quick-gelu),
    last_hidden_state
  * SD v2.1: OpenCLIP ViT-H text (23 of 24L x 1024, gelu), penultimate layer
  * SDXL: dual towers — ViT-L (768) + OpenCLIP bigG (32L x 1280), hidden
    states concatenated to 2048 + bigG pooled output for the added embeddings
  * CLIP RN50 filtering: 12L x 512 text tower with a 1024-dim projection
    (the reference's TextEncoder wrapper, all_utils/utils.py:113-136)

Causal masking, EOT pooling (argmax over token ids), final LN, optional
text_projection — matching CLIP semantics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from saspa_tpu.ops.attention import attention


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    width: int = 768
    layers: int = 12
    heads: int = 12
    context_length: int = 77
    projection_dim: Optional[int] = None  # set for CLIP similarity towers
    act: str = "quick_gelu"  # quick_gelu (OpenAI) | gelu (OpenCLIP)
    output_layer: int = -1  # -1 = last; -2 = penultimate (SD2.x/SDXL style)


SD15_TEXT = CLIPTextConfig()
# SD2.1 conditioning: HF ships a 23-layer CLIPTextModel (OpenCLIP ViT-H minus
# its last block) and the pipeline consumes last_hidden_state, i.e. ln_final
# IS applied — equivalent to LDM's FrozenOpenCLIPEmbedder('penultimate').
# Model it as 23 layers + output_layer=-1 so the ln_final path is taken.
SD21_TEXT = CLIPTextConfig(width=1024, layers=23, heads=16, act="gelu", output_layer=-1)
SDXL_TEXT_L = CLIPTextConfig(output_layer=-2)
SDXL_TEXT_BIGG = CLIPTextConfig(width=1280, layers=32, heads=20, act="gelu", output_layer=-2, projection_dim=1280)
CLIP_RN50_TEXT = CLIPTextConfig(width=512, layers=12, heads=8, projection_dim=1024)
CLIP_VITB16_TEXT = CLIPTextConfig(width=512, layers=12, heads=8, projection_dim=512)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * nn.sigmoid(1.702 * x)
    # OpenCLIP towers use torch nn.GELU() = exact erf (flax's default is the
    # tanh approximation — a systematic per-layer deviation from the weights)
    return lambda x: nn.gelu(x, approximate=False)


class CLIPTextBlock(nn.Module):
    cfg: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask_bias):
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")(x).astype(x.dtype)
        # causal self-attention (explicit, short seq of 77 -> plain XLA path)
        b, l, w = h.shape
        d = w // cfg.heads
        qkv = nn.Dense(3 * w, dtype=self.dtype, name="attn_qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, l, cfg.heads, d)
        k = k.reshape(b, l, cfg.heads, d)
        v = v.reshape(b, l, cfg.heads, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) / jnp.sqrt(d)
        logits = logits + mask_bias
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, l, w)
        x = x + nn.Dense(w, dtype=self.dtype, name="attn_out")(out)

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(x).astype(x.dtype)
        h = nn.Dense(4 * w, dtype=self.dtype, name="mlp_fc")(h)
        h = _act(cfg.act)(h)
        x = x + nn.Dense(w, dtype=self.dtype, name="mlp_proj")(h)
        return x


class CLIPTextEncoder(nn.Module):
    cfg: CLIPTextConfig = SD15_TEXT
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, token_ids: jax.Array, spliced_embeddings: Optional[jax.Array] = None):
        """token_ids: (B, 77) int32. Returns dict with:
        hidden: (B, 77, width) per output_layer; pooled: (B, width) EOT token;
        proj: (B, projection_dim) if configured.

        `spliced_embeddings` replaces the token-embedding lookup (BLIP-Diffusion
        subject-context injection); must be (B, 77, width)."""
        cfg = self.cfg
        b, l = token_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.width, dtype=self.dtype, name="token_embedding")(token_ids)
        if spliced_embeddings is not None:
            tok = spliced_embeddings.astype(tok.dtype)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01), (cfg.context_length, cfg.width))
        x = tok + pos[None, :l].astype(tok.dtype)

        causal = jnp.triu(jnp.full((l, l), -1e9, jnp.float32), k=1)[None, None]
        hiddens = []
        for i in range(cfg.layers):
            x = CLIPTextBlock(cfg, self.dtype, name=f"resblocks_{i}")(x, causal)
            hiddens.append(x)

        selected = hiddens[cfg.output_layer]
        # final LN applies to the LAST layer for pooling (CLIP semantics).
        # SDXL towers take the RAW penultimate layer (diffusers pipeline reads
        # hidden_states[-2] with no ln_final); SD2.1 uses output_layer=-1 on a
        # 23-layer tower so its hidden output IS ln_final'd (HF semantics).
        final = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final")(hiddens[-1]).astype(x.dtype)
        hidden_out = final if cfg.output_layer == -1 else selected

        eot_idx = jnp.argmax(token_ids, axis=-1)
        pooled = final[jnp.arange(b), eot_idx]
        out = {"hidden": hidden_out, "pooled": pooled}
        if cfg.projection_dim is not None:
            out["proj"] = nn.Dense(cfg.projection_dim, use_bias=False, dtype=self.dtype, name="text_projection")(pooled)
        return out
