"""BLIP-Diffusion: subject-conditioned SD1.5 via Q-Former embeddings.

The reference's best backbone for CompCars/Cars/DTD (README.md:115; pipeline
init at run_aug/run_aug.py:171-181,210-211): a frozen SD1.5 UNet whose text
conditioning is augmented with 16 "subject" embeddings produced by a BLIP-2
style Q-Former attending over a reference image of the same class
(run_aug/run_aug.py:444-456 picks that image).

Structure (faithful to Salesforce/blipdiffusion; weight-convertible via
tools/convert_weights.py blip_diffusion_qformer; query-path logits parity vs
torch Blip2QFormerModel in tests/test_qformer_parity.py):
  * vision tower: CLIP ViT-L/14 (LAVIS vit_model="clip_L"), patch tokens
  * Q-Former: 16 learned query tokens + the SOURCE subject category as BERT
    text; post-LN layers with cross-attention to the image every 2nd layer,
    split query/text FFNs; ProjLayer head to the CLIP text width
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
from saspa_tpu.gen.tokenizer import CONTEXT_LENGTH
from saspa_tpu.models.clip import CLIPVisionViT, CLIPVisionViTConfig, clip_preprocess
from saspa_tpu.models.text_encoder import CLIPTextConfig, SD15_TEXT

CTX_BEGIN_POS = 2
NUM_QUERY_TOKENS = 16
# fixed BERT-token budget for the source subject category (the reference pads
# dynamically without truncation; 24 WordPieces covers every FGVC class name —
# e.g. 'aston martin v8 vantage convertible 2012' needs ~10)
_CAT_LEN = 24


def _bert_attn(x, kv, heads, dtype, prefix, mask_bias=None):
    """Post-LN BERT attention minus the output block (caller adds it)."""
    w = x.shape[-1]
    d = w // heads
    b, lq, _ = x.shape
    lk = kv.shape[1]
    q = nn.Dense(w, dtype=dtype, name=f"{prefix}_query")(x).reshape(b, lq, heads, d)
    k = nn.Dense(w, dtype=dtype, name=f"{prefix}_key")(kv).reshape(b, lk, heads, d)
    v = nn.Dense(w, dtype=dtype, name=f"{prefix}_value")(kv).reshape(b, lk, heads, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) / np.sqrt(d)
    if mask_bias is not None:
        logits = logits + mask_bias
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, lq, w)


class QFormerLayer(nn.Module):
    """One Blip2QFormerLayer (transformers/diffusers/LAVIS share the math):
    post-LN self-attention over [queries ; text], cross-attention to image
    tokens for the QUERY part only (layers where idx % cross_freq == 0),
    then SPLIT feed-forwards — *_query for the query part, the plain
    intermediate/output for the text part."""

    width: int = 768
    heads: int = 12
    has_cross: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, image_tokens, query_len: int, mask_bias=None):
        w = self.width
        a = _bert_attn(hidden, hidden, self.heads, self.dtype, "self", mask_bias)
        a = nn.Dense(w, dtype=self.dtype, name="self_out_dense")(a)
        hidden = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="self_out_ln")(hidden + a).astype(a.dtype)

        hq = hidden[:, :query_len]
        if self.has_cross:
            c = _bert_attn(hq, image_tokens, self.heads, self.dtype, "cross")
            c = nn.Dense(w, dtype=self.dtype, name="cross_out_dense")(c)
            hq = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="cross_out_ln")(hq + c).astype(c.dtype)

        f = nn.Dense(4 * w, dtype=self.dtype, name="ffn_q_fc")(hq)
        f = nn.Dense(w, dtype=self.dtype, name="ffn_q_proj")(nn.gelu(f, approximate=False))
        hq = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="ffn_q_ln")(hq + f).astype(f.dtype)
        if hidden.shape[1] == query_len:
            return hq
        ht = hidden[:, query_len:]
        f = nn.Dense(4 * w, dtype=self.dtype, name="ffn_t_fc")(ht)
        f = nn.Dense(w, dtype=self.dtype, name="ffn_t_proj")(nn.gelu(f, approximate=False))
        ht = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="ffn_t_ln")(ht + f).astype(f.dtype)
        return jnp.concatenate([hq, ht], axis=1)


class QFormer(nn.Module):
    """BLIP-Diffusion Q-Former (LAVIS blip2_qformer / diffusers
    Blip2QFormerModel): 16 learned query tokens, optional source-category
    text tokens concatenated behind them, embedding LayerNorm over the
    concatenation, cross-attention to the vision tower every
    `cross_freq` layers, and the ProjLayer head
    (LN(dense2(gelu(dense1(x))) + x)) mapping to the CLIP text width."""

    width: int = 768
    layers: int = 12
    heads: int = 12
    num_queries: int = NUM_QUERY_TOKENS
    out_dim: int = 768  # CLIP text width
    cross_freq: int = 2
    vocab_size: int = 30523
    max_positions: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_tokens, text_ids=None, text_mask=None):
        """image_tokens: (B, L, E) vision-tower output; text_ids: optional
        (B, T) BERT ids of the source subject category; text_mask: (B, T)
        1=real token (padded positions are masked out of self-attention and
        their garbage FFN outputs are dropped with the text half)."""
        b = image_tokens.shape[0]
        queries = self.param(
            "query_tokens", nn.initializers.normal(0.02), (1, self.num_queries, self.width)
        )
        x = jnp.tile(queries, (b, 1, 1)).astype(image_tokens.dtype)
        mask_bias = None
        if text_ids is not None:
            tok = nn.Embed(self.vocab_size, self.width, dtype=self.dtype, name="word_embeddings")(text_ids)
            pos = self.param(
                "position_embeddings", nn.initializers.normal(0.02), (self.max_positions, self.width)
            )
            tok = tok + pos[None, : text_ids.shape[1]].astype(tok.dtype)
            x = jnp.concatenate([x, tok], axis=1)
            if text_mask is not None:
                full = jnp.concatenate(
                    [jnp.ones((b, self.num_queries), text_mask.dtype), text_mask], axis=1
                )
                mask_bias = (1.0 - full[:, None, None, :].astype(jnp.float32)) * -1e9
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="embeddings_ln")(x).astype(x.dtype)
        for i in range(self.layers):
            x = QFormerLayer(
                self.width, self.heads, has_cross=(i % self.cross_freq == 0),
                dtype=self.dtype, name=f"layer_{i}",
            )(x, image_tokens, self.num_queries, mask_bias)
        x = x[:, : self.num_queries]
        # ProjLayer (diffusers blip_diffusion ProjLayer): PRE-LN residual MLP
        # with QuickGELU and no trailing norm —
        # x + dense2(quick_gelu(dense1(LayerNorm(x))))
        xn = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="proj_ln")(x).astype(x.dtype)
        f = nn.Dense(4 * self.width, dtype=self.dtype, name="proj_dense1")(xn)
        f = f * nn.sigmoid(1.702 * f)  # QuickGELU
        f = nn.Dense(self.out_dim, dtype=self.dtype, name="proj_dense2")(f)
        return x + f


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
        # LAVIS blip-diffusion's vision tower is CLIP ViT-L/14 (vit_model=
        # "clip_L": width 1024, 24 layers, 16 heads -> 257 tokens of 1024)
        self.vision = CLIPVisionViT(
            cfg=CLIPVisionViTConfig(patch_size=14, width=1024, layers=24, heads=16, output_dim=None),
            dtype=dtype,
        )
        self.qformer = QFormer(dtype=dtype)
        if "blip_vision" not in self.params:
            k1, k2 = jax.random.split(jax.random.PRNGKey(init_seed + 11))
            dummy = jnp.zeros((1, 224, 224, 3))
            self.params["blip_vision"] = self.vision.init(k1, dummy, return_tokens=True)["params"]
            tokens = jnp.zeros((1, 257, 1024))
            self.params["blip_qformer"] = self.qformer.init(
                k2, tokens, jnp.zeros((1, _CAT_LEN), jnp.int32), jnp.ones((1, _CAT_LEN), jnp.int32)
            )["params"]

        from saspa_tpu.models.blip_caption import WordPieceTokenizer

        vocab = Path(weights_dir or "") / "tokenizer" / "vocab.txt"
        self._bert_tok = WordPieceTokenizer(str(vocab) if vocab.exists() else None)

        @jax.jit
        def _subject_embeds(params, images, text_ids, text_mask):
            tokens = self.vision.apply({"params": params["blip_vision"]}, images, return_tokens=True)
            return self.qformer.apply(
                {"params": params["blip_qformer"]}, tokens, text_ids, text_mask
            )

        self._subject_embeds_jit = _subject_embeds

    def bert_category_ids(self, category: str, batch: int):
        """(ids, mask) of the BERT-tokenized subject category — [CLS] tokens
        [SEP] padded to a fixed length for one compiled shape."""
        ids = [101] + self._bert_tok.encode(category or "")[: _CAT_LEN - 2] + [102]
        n = len(ids)
        arr = np.zeros((batch, _CAT_LEN), np.int32)
        arr[:, :n] = ids
        mask = np.zeros((batch, _CAT_LEN), np.int32)
        mask[:, :n] = 1
        return arr, mask

    def _subject_embeds(self, params, images, source_category: str = ""):
        """LAVIS forward_ctx_embeddings: the Q-Former also reads the SOURCE
        subject category as BERT text."""
        tids, tmask = self.bert_category_ids(source_category, images.shape[0])
        return self._subject_embeds_jit(params, images, jnp.asarray(tids), jnp.asarray(tmask))

    def build_subject_prompt_ids(self, prompts: List[str], target_subject: str,
                                 prompt_strength: float = 1.0, prompt_reps: int = 20):
        """diffusers BlipDiffusionPipeline._build_prompt: 'a {subject} {prompt}'
        comma-joined prompt_reps (20) times, then tokenized to 77 - 16 = 61
        positions so the 16 subject queries splice to exactly 77 and the EOT
        always survives (the reference tokenizes with
        max_length = model_max_length - num_query_tokens)."""
        reps = max(int(prompt_strength * prompt_reps), 1)
        texts = [", ".join([f"a {target_subject} {p}"] * reps) for p in prompts]
        return jnp.asarray(self.tokenizer(
            texts, context_length=CONTEXT_LENGTH - self.qformer.num_queries, pad="eot"
        ))

    def _encode_with_ctx(self, params, token_ids, ctx):
        """CLIP text encode with the 16 subject embeddings spliced into the
        token-embedding sequence at CTX_BEGIN_POS (jit-safe: params are an
        argument, not `self.params`).  token_ids are (B, 77-16) — the splice
        restores the full 77 positions, dropping nothing."""
        te, tp = self.text_encoders[0], params["text"][0]
        b = token_ids.shape[0]
        nq = ctx.shape[1]
        want = CONTEXT_LENGTH - nq
        if token_ids.shape[1] != want:
            raise ValueError(
                f"ctx-splice token_ids must be ({b}, {want}) = context_length - "
                f"num_query_tokens (use build_subject_prompt_ids), got "
                f"{tuple(token_ids.shape)} — full-length ids would splice past "
                f"the {CONTEXT_LENGTH}-position table"
            )
        emb_table = tp["token_embedding"]["embedding"]
        tok = jnp.take(emb_table, token_ids, axis=0).astype(ctx.dtype)
        spliced = jnp.concatenate(
            [tok[:, :CTX_BEGIN_POS], ctx, tok[:, CTX_BEGIN_POS:]], axis=1
        )
        # full-length ids for position/causal shapes + EOT pooling position
        ids_full = jnp.concatenate(
            [token_ids[:, :CTX_BEGIN_POS],
             jnp.zeros((b, nq), token_ids.dtype),
             token_ids[:, CTX_BEGIN_POS:]], axis=1
        )
        return te.apply({"params": tp}, ids_full, spliced_embeddings=spliced)["hidden"]

    def encode_prompts_with_subject(self, prompts: List[str], subject_embeds: jax.Array,
                                    target_subject: str, negative_prompt: Optional[str],
                                    with_negative: bool = True):
        """CLIP text encode with ctx embeddings spliced at CTX_BEGIN_POS."""
        ids = self.build_subject_prompt_ids(prompts, target_subject)
        ctx_hidden = self._encode_with_ctx(self.params, ids, subject_embeds)
        if not with_negative:
            return ctx_hidden, None
        nids = jnp.asarray(self.tokenizer([negative_prompt or ""] * len(prompts), pad="eot"))
        te, tp = self.text_encoders[0], self.params["text"][0]
        n_out = te.apply({"params": tp}, nids)
        return ctx_hidden, n_out["hidden"]

    # ------------------------------------------------------------------ fused
    def make_fused_generate(
        self,
        height: int,
        width: int,
        num_inference_steps: int,
        guidance_scale: float,
        controlnet_scale: float = 0.75,
        canny_low: float = 120.0,
        canny_high: float = 200.0,
    ):
        """ONE jitted program per generation batch for the paper's best
        backbone (blip_diffusion[-controlnet], README.md:115): CLIP-ViT-L
        vision tower + Q-Former subject embeddings + ctx-spliced text encode +
        on-device Canny + the scanned CFG denoise + VAE decode.  The Q-Former
        runs once per batch (not per step), so this is structurally the SD
        fused path with a precomputed context.

        Returns fn(params, ids, neg_ids, cat_ids, cat_mask,
        ref_images_0_1, src_images_0_255, latents) -> uint8 images."""
        key = ("blip", height, width, num_inference_steps, float(guidance_scale),
               float(controlnet_scale), float(canny_low), float(canny_high))
        if key in self._fused_cache:
            return self._fused_cache[key]

        timesteps = self.scheduler.timesteps(num_inference_steps)
        do_cfg = guidance_scale > 1.0

        def fused(params, ids, neg_ids, cat_ids, cat_mask, ref_images, src_images, latents):
            # accept uint8 source uploads (4x less relay traffic; exact cast)
            src_images = src_images.astype(jnp.float32)
            ref = clip_preprocess(ref_images)
            tokens = self.vision.apply({"params": params["blip_vision"]}, ref, return_tokens=True)
            subject = self.qformer.apply({"params": params["blip_qformer"]}, tokens, cat_ids, cat_mask)
            ctx = self._encode_with_ctx(params, ids, subject)
            nctx = None
            if do_cfg:
                te, tp = self.text_encoders[0], params["text"][0]
                nctx = te.apply({"params": tp}, neg_ids)["hidden"]
            control = self._control_from_src(params, src_images, height, width, canny_low, canny_high)
            out = self._sample(
                params, latents, ctx, nctx, timesteps,
                guidance_scale=float(guidance_scale),
                control_image=control,
                controlnet_scale=float(controlnet_scale),
                added_cond=None, uncond_added_cond=None,
            )
            return jnp.clip(jnp.round(out * 255.0), 0, 255).astype(jnp.uint8)

        fn = jax.jit(fused)
        self._fused_cache[key] = fn
        return fn

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
            t, t_next = ts[i], ts[i + 1]
            eps = unet_eps(lat, t)
            a_t = ac[t]
            a_next = ac[t_next]
            x0 = (lat - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
            lat = jnp.sqrt(a_next) * x0 + jnp.sqrt(1 - a_next) * eps
            return lat, None

        # len(ts)-1 transitions t_i -> t_{i+1}; a final t==t_next step would
        # be an algebraic no-op costing one full UNet forward
        z, _ = jax.lax.scan(step, z, jnp.arange(len(ts) - 1))
        return z

    def edit(self, source_images, subject_images, prompts, key,
             source_subject: str, target_subject: str,
             guidance_scale: float = 7.5, num_inference_steps: int = 50,
             num_inversion_steps: int = 50, negative_prompt: Optional[str] = None):
        """Subject-swap edit: DDIM-invert the source under its own description,
        then regenerate conditioned on the new subject's embeddings
        (pass_through_lavis_edit semantics, run_aug/run_aug.py:104-125)."""
        ref = clip_preprocess(subject_images)
        subject = self._subject_embeds(self.params, ref, source_subject)
        ctx, nctx = self.encode_prompts_with_subject(list(prompts), subject, target_subject, negative_prompt)
        # invert under the SOURCE's own description (plain text encode, no
        # ctx splice) — decoupled from negative_prompt, which only steers the
        # CFG at regeneration time
        te, tp = self.text_encoders[0], self.params["text"][0]
        src_ids = jnp.asarray(self.tokenizer([f"a {source_subject}"] * len(prompts), pad="eot"))
        inv_ctx = te.apply({"params": tp}, src_ids)["hidden"]
        inv_latents = self.invert(source_images, inv_ctx, num_inversion_steps)
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
        subject = self._subject_embeds(self.params, ref, source_subject_category)
        ctx, nctx = self.encode_prompts_with_subject(
            list(prompts), subject, target_subject_category, negative_prompt,
            with_negative=guidance_scale > 1.0,
        )
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
