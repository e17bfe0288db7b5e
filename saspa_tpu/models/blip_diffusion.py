"""BLIP-Diffusion: subject-conditioned SD1.5 via Q-Former embeddings.

The reference's best backbone for CompCars/Cars/DTD (README.md:115; pipeline
init at run_aug/run_aug.py:171-181,210-211): a frozen SD1.5 UNet whose text
conditioning is augmented with 16 "subject" embeddings produced by a BLIP-2
style Q-Former attending over a reference image of the same class
(run_aug/run_aug.py:444-456 picks that image).

Structure (faithful to Salesforce/blipdiffusion; weight-convertible):
  * vision tower: ViT (returns patch tokens)
  * Q-Former: 16 learned query tokens; per layer [self-attn over queries,
    cross-attn to image tokens, FFN]; output projected to the CLIP text width
  * CtxCLIPTextEncoder: CLIP text encoder whose token-embedding sequence gets
    the 16 subject embeddings spliced in at ctx_begin_pos=2 (after "a <sot>")
  * the combined hidden states condition the standard SD1.5 UNet; the
    -controlnet variant adds the canny ControlNet unchanged.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from saspa_tpu.diffusion.pipelines import DiffusionPipeline
from saspa_tpu.models.clip import CLIPVisionViT, CLIPVisionViTConfig, clip_preprocess
from saspa_tpu.models.text_encoder import CLIPTextConfig, SD15_TEXT
from saspa_tpu.ops.attention import attention

CTX_BEGIN_POS = 2
NUM_QUERY_TOKENS = 16


class QFormerLayer(nn.Module):
    width: int = 768
    heads: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, queries, image_tokens):
        h = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="ln_self")(queries).astype(queries.dtype)
        q = nn.Dense(self.width, dtype=self.dtype, name="self_q")(h)
        k = nn.Dense(self.width, dtype=self.dtype, name="self_k")(h)
        v = nn.Dense(self.width, dtype=self.dtype, name="self_v")(h)
        queries = queries + nn.Dense(self.width, dtype=self.dtype, name="self_out")(
            attention(q, k, v, self.heads, use_pallas=False)
        )
        h = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="ln_cross")(queries).astype(queries.dtype)
        q = nn.Dense(self.width, dtype=self.dtype, name="cross_q")(h)
        k = nn.Dense(self.width, dtype=self.dtype, name="cross_k")(image_tokens)
        v = nn.Dense(self.width, dtype=self.dtype, name="cross_v")(image_tokens)
        queries = queries + nn.Dense(self.width, dtype=self.dtype, name="cross_out")(
            attention(q, k, v, self.heads, use_pallas=False)
        )
        h = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="ln_ffn")(queries).astype(queries.dtype)
        h = nn.Dense(self.width * 4, dtype=self.dtype, name="ffn_fc")(h)
        h = nn.gelu(h)
        queries = queries + nn.Dense(self.width, dtype=self.dtype, name="ffn_proj")(h)
        return queries


class QFormer(nn.Module):
    width: int = 768
    layers: int = 12
    heads: int = 12
    num_queries: int = NUM_QUERY_TOKENS
    out_dim: int = 768  # CLIP text width
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_tokens):
        b = image_tokens.shape[0]
        queries = self.param("query_tokens", nn.initializers.normal(0.02), (self.num_queries, self.width))
        x = jnp.tile(queries[None], (b, 1, 1)).astype(image_tokens.dtype)
        for i in range(self.layers):
            x = QFormerLayer(self.width, self.heads, self.dtype, name=f"layer_{i}")(x, image_tokens)
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="ln_out")(x).astype(x.dtype)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(x)


class BlipDiffusionPipeline(DiffusionPipeline):
    """SD1.5 pipeline + subject embedding injection.

    generate() gains `reference_images`, `source_subject_category`,
    `target_subject_category` mirroring the reference's pipe args
    (run_aug/run_aug.py:243-250)."""

    def __init__(self, controlnet: Optional[str] = None, sampler: str = "ddim",
                 weights_dir: Optional[str] = None, dtype: Any = jnp.bfloat16, init_seed: int = 0):
        base = "blip_diffusion-controlnet" if controlnet else "blip_diffusion"
        super().__init__(
            base_model=base, controlnet=controlnet, sdedit=False, sampler=sampler,
            dtype=dtype, weights_dir=weights_dir, init_seed=init_seed,
        )
        self.vision = CLIPVisionViT(cfg=CLIPVisionViTConfig(patch_size=14, output_dim=None), dtype=dtype)
        self.qformer = QFormer(dtype=dtype)
        if "blip_vision" not in self.params:
            k1, k2 = jax.random.split(jax.random.PRNGKey(init_seed + 11))
            dummy = jnp.zeros((1, 224, 224, 3))
            self.params["blip_vision"] = self.vision.init(k1, dummy, return_tokens=True)["params"]
            tokens = jnp.zeros((1, 257, 768))
            self.params["blip_qformer"] = self.qformer.init(k2, tokens)["params"]

        @jax.jit
        def _subject_embeds(params, images):
            tokens = self.vision.apply({"params": params["blip_vision"]}, images, return_tokens=True)
            return self.qformer.apply({"params": params["blip_qformer"]}, tokens)

        self._subject_embeds = _subject_embeds

    def encode_prompts_with_subject(self, prompts: List[str], subject_embeds: jax.Array,
                                    target_subject: str, negative_prompt: Optional[str]):
        """CLIP text encode with ctx embeddings spliced at CTX_BEGIN_POS."""
        texts = [f"a {target_subject}, {p}" for p in prompts]
        ids = jnp.asarray(self.tokenizer(texts))
        nids = jnp.asarray(self.tokenizer([negative_prompt or ""] * len(prompts)))

        te, tp = self.text_encoders[0], self.params["text"][0]

        def encode_with_ctx(token_ids, ctx):
            # splice ctx embeddings into the token embedding sequence
            emb_table = tp["token_embedding"]["embedding"]
            tok = jnp.take(emb_table, token_ids, axis=0).astype(ctx.dtype)
            spliced = jnp.concatenate(
                [tok[:, :CTX_BEGIN_POS], ctx, tok[:, CTX_BEGIN_POS:]], axis=1
            )[:, : token_ids.shape[1]]
            return te.apply({"params": tp}, token_ids, spliced_embeddings=spliced)["hidden"]

        ctx_hidden = encode_with_ctx(ids, subject_embeds)
        n_out = te.apply({"params": tp}, nids)
        return ctx_hidden, n_out["hidden"]

    def invert(self, images: jax.Array, context: jax.Array, num_inversion_steps: int = 50) -> jax.Array:
        """DDIM inversion: image -> noise latent along the deterministic DDIM
        trajectory (the 'blip_diffusion-edit' path, run_aug/run_aug.py:97-125,
        LAVIS model.edit with num_inversion_steps=50)."""
        from saspa_tpu.models.vae import AutoencoderKL

        mean, _ = self.vae.apply(
            {"params": self.params["vae"]}, images * 2.0 - 1.0, method=AutoencoderKL.encode
        )
        z = mean * self.spec.vae_cfg.scaling_factor
        ts = self.scheduler.timesteps(num_inversion_steps)[::-1]  # ascending
        ac = self.scheduler.alphas_cumprod

        def unet_eps(lat, t):
            return self.unet.apply({"params": self.params["unet"]}, lat, t, context)

        def step(lat, i):
            t = ts[i]
            t_next = jnp.where(i + 1 < len(ts), ts[jnp.minimum(i + 1, len(ts) - 1)], ts[-1])
            eps = unet_eps(lat, t)
            a_t = ac[t]
            a_next = ac[t_next]
            x0 = (lat - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
            lat = jnp.sqrt(a_next) * x0 + jnp.sqrt(1 - a_next) * eps
            return lat, None

        z, _ = jax.lax.scan(step, z, jnp.arange(len(ts)))
        return z

    def edit(self, source_images, subject_images, prompts, key,
             source_subject: str, target_subject: str,
             guidance_scale: float = 7.5, num_inference_steps: int = 50,
             num_inversion_steps: int = 50, negative_prompt: Optional[str] = None):
        """Subject-swap edit: DDIM-invert the source under its own description,
        then regenerate conditioned on the new subject's embeddings
        (pass_through_lavis_edit semantics, run_aug/run_aug.py:104-125)."""
        ref = clip_preprocess(subject_images)
        subject = self._subject_embeds(self.params, ref)
        ctx, nctx = self.encode_prompts_with_subject(list(prompts), subject, target_subject, negative_prompt)
        inv_latents = self.invert(source_images, nctx, num_inversion_steps)
        timesteps = self.scheduler.timesteps(num_inference_steps)
        return self._sample_jit(
            self.params, inv_latents, ctx, nctx if guidance_scale > 1 else None, timesteps,
            guidance_scale=float(guidance_scale), control_image=None,
            controlnet_scale=1.0, added_cond=None, uncond_added_cond=None,
        )

    def generate(self, prompts, key, reference_images=None, source_subject_category="",
                 target_subject_category="", negative_prompt=None, height=512, width=512,
                 num_inference_steps=30, guidance_scale=7.5, control_image=None,
                 controlnet_scale=0.75, latents=None, **kw):
        assert reference_images is not None, "blip_diffusion needs reference (subject) images"
        ref = clip_preprocess(reference_images)
        subject = self._subject_embeds(self.params, ref)
        ctx, nctx = self.encode_prompts_with_subject(
            list(prompts), subject, target_subject_category, negative_prompt
        )
        if not guidance_scale > 1.0:
            nctx = None
        from saspa_tpu.diffusion.sampler import initial_latents

        timesteps = self.scheduler.timesteps(num_inference_steps)
        if latents is None:
            latents = initial_latents(key, len(prompts), height, width, factor=self.latent_factor)
        return self._sample_jit(
            self.params, latents, ctx, nctx, timesteps,
            guidance_scale=float(guidance_scale),
            control_image=control_image, controlnet_scale=float(controlnet_scale),
            added_cond=None, uncond_added_cond=None,
        )
