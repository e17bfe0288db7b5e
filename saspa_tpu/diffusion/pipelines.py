"""Pipeline zoo: model-key -> assembled TPU diffusion pipeline.

Covers the reference's BASE_MODEL_DICT / CONTROLNET_DICT_* zoo and
init_pipeline() switchboard (run_aug/run_aug.py:53-72,128-230): SD v1.5 /
v2.1 / SDXL / SDXL-Turbo / BLIP-Diffusion(+controlnet) / ip2p, canny or hed
ControlNet, SDEdit img2img, DDIM or UniPC sampling, negative prompts, the
SDXL-Turbo gs=0 special case, and fp32 VAE decode (upcast_vae).

Weights load from a converted-checkpoint directory (tools/convert_weights.py
maps the public torch checkpoints to these module trees); absent weights fall
back to seeded random init so every code path stays executable in a
zero-egress environment.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from saspa_tpu.diffusion.sampler import initial_latents, make_sample_loop
from saspa_tpu.diffusion.schedulers import (
    DDIMScheduler,
    SchedulerConfig,
    UniPCScheduler,
    sdedit_start_step,
)
from saspa_tpu.gen.tokenizer import EOT, default_tokenizer
from saspa_tpu.models.controlnet import ControlNet
from saspa_tpu.models.text_encoder import (
    CLIPTextEncoder,
    SD15_TEXT,
    SD21_TEXT,
    SDXL_TEXT_BIGG,
    SDXL_TEXT_L,
)
from saspa_tpu.models.unet import UNET_CONFIGS, UNet2DCondition
from saspa_tpu.models.vae import SD_VAE, SDXL_VAE, AutoencoderKL
from saspa_tpu.utils.config import NEGATIVE_PROMPT


@dataclass
class PipelineSpec:
    base_model: str
    is_xl: bool
    text_cfgs: Tuple
    vae_cfg: Any
    scheduler_cfg: SchedulerConfig


def _spec(base_model: str) -> PipelineSpec:
    is_xl = base_model in ("sd_xl", "sd_xl-turbo", "sd_xl-refiner")
    if base_model in ("sd_v1.5", "blip_diffusion", "blip_diffusion-controlnet", "ip2p"):
        text_cfgs = (SD15_TEXT,)
    elif base_model == "sd_v2.1":
        text_cfgs = (SD21_TEXT,)
    elif base_model == "sd_xl-refiner":
        text_cfgs = (SDXL_TEXT_BIGG,)  # refiner conditions on bigG only
    elif is_xl:
        text_cfgs = (SDXL_TEXT_L, SDXL_TEXT_BIGG)
    else:
        raise ValueError(base_model)
    sched_cfg = SchedulerConfig(
        timestep_spacing="trailing" if base_model == "sd_xl-turbo" else "leading"
    )
    return PipelineSpec(base_model, is_xl, text_cfgs, SDXL_VAE if is_xl else SD_VAE, sched_cfg)


def _openclip_pad(ids):
    """Rewrite EOT padding to OpenCLIP's zero padding.

    OpenAI-CLIP towers (SD1.5) pad with <|endoftext|>, but the OpenCLIP
    towers' shipped tokenizers pad with "!" = id 0 (SD2.x tokenizer and SDXL
    tokenizer_2 both set pad_token "!"), and padded positions feed
    cross-attention.  Input rows look like [SOT, toks..., EOT, EOT, ...]; only
    the FIRST EOT is real — later ones are padding and become 0."""
    is_eot = ids == EOT
    first_eot = is_eot & (jnp.cumsum(is_eot.astype(jnp.int32), axis=1) == 1)
    return jnp.where(is_eot & ~first_eot, 0, ids)


class DiffusionPipeline:
    """TPU-native counterpart of init_pipeline() + pipe(**args).

    One instance owns module defs + params; `generate()` is the jitted
    batched entry point.
    """

    def __init__(
        self,
        base_model: str = "sd_v1.5",
        controlnet: Optional[str] = None,
        sdedit: bool = False,
        sampler: str = "ddim",
        dtype: Any = jnp.bfloat16,
        weights_dir: Optional[str] = None,
        init_seed: int = 0,
        unet_cfg=None,
        vae_cfg=None,
        text_cfgs=None,
    ):
        assert sampler in ("ddim", "unipcmultistep")
        self.base_model = base_model
        self.spec = _spec(base_model)
        if vae_cfg is not None:
            self.spec.vae_cfg = vae_cfg
        if text_cfgs is not None:
            self.spec.text_cfgs = tuple(text_cfgs)
        self.controlnet_kind = controlnet
        self.sdedit = sdedit
        self.dtype = dtype
        self.tokenizer = default_tokenizer(weights_dir)

        unet_cfg = unet_cfg if unet_cfg is not None else UNET_CONFIGS[base_model]
        self.unet = UNet2DCondition(cfg=unet_cfg, dtype=dtype)
        # The reference runs the SD1.5-family VAE in fp16 (whole pipe fp16)
        # and upcasts only the XL VAE to fp32 (upcast_vae, run_aug:189,224).
        # That fix addresses fp16's 5-bit-exponent RANGE overflow in the XL
        # decoder's activations — bf16 carries fp32's 8-bit exponent, so the
        # overflow the fix exists for cannot happen in bf16.  TPU-first
        # default: the XL VAE follows the pipeline dtype (bf16), which the r4
        # trace measured as ~2/3 of the whole 2-step turbo program in fp32.
        # SASPA_XL_VAE_FP32=1 restores the reference's upcast recipe
        # (weights-day must re-verify bf16 decode quality on real weights —
        # docs/weights_day_runbook.md).
        import os as _os

        if self.spec.is_xl and (dtype == jnp.float32 or _os.environ.get("SASPA_XL_VAE_FP32", "") == "1"):
            vae_dtype = jnp.float32
        else:
            vae_dtype = dtype
        self.vae = AutoencoderKL(cfg=self.spec.vae_cfg, dtype=vae_dtype)
        self.text_encoders = [CLIPTextEncoder(cfg=c, dtype=dtype) for c in self.spec.text_cfgs]
        self.controlnet = ControlNet(cfg=unet_cfg, dtype=dtype) if controlnet else None
        self.hed = None
        if controlnet == "hed":
            from saspa_tpu.models.hed import HED

            self.hed = HED(dtype=dtype)

        sched_cls = DDIMScheduler if sampler == "ddim" else UniPCScheduler
        self.scheduler = sched_cls(self.spec.scheduler_cfg)
        # spatial ratio between pixel space and latent space (8 for SD VAEs)
        self.latent_factor = 2 ** (len(self.spec.vae_cfg.block_out_channels) - 1)

        self.params = self._init_params(weights_dir, init_seed)

        # jitted closures -----------------------------------------------------
        def unet_apply(p, lat, t, ctx, ac, down_res, mid_res):
            return self.unet.apply(
                {"params": p}, lat, t, ctx, added_cond=ac,
                down_block_additional_residuals=down_res,
                mid_block_additional_residual=mid_res,
            )

        cn_apply = cn_embed = None
        if self.controlnet is not None:
            def cn_apply(p, lat, t, ctx, cimg, scale, ac, cond_emb=None):
                return self.controlnet.apply(
                    {"params": p}, lat, t, ctx, cimg, scale, added_cond=ac, cond_emb=cond_emb
                )

            def cn_embed(p, cimg):
                return self.controlnet.apply({"params": p}, cimg, method=ControlNet.embed_cond)

        def vae_decode(p, z):
            # module picked at TRACE time so tools/ab_interleave.py can flip
            # SASPA_XL_VAE_FP32 per arm (flax dtype only affects compute
            # casts — the param tree is dtype-independent, so both modules
            # share self.params["vae"])
            return self._vae_env().apply({"params": p}, z, method=AutoencoderKL.decode)

        self._sample = make_sample_loop(
            unet_apply, self.scheduler, cn_apply, vae_decode, self.spec.vae_cfg.scaling_factor,
            controlnet_embed=cn_embed,
        )
        self._sample_jit = jax.jit(
            self._sample, static_argnames=("guidance_scale", "controlnet_scale", "image_guidance_scale")
        )
        self._fused_cache: dict = {}

    def _vae_env(self) -> AutoencoderKL:
        """The decode-path VAE module under the CURRENT env knobs (see the
        __init__ dtype comment).  Cached per dtype; params are shared."""
        import os as _os

        if self.spec.is_xl and (self.dtype == jnp.float32
                                or _os.environ.get("SASPA_XL_VAE_FP32", "") == "1"):
            want = jnp.float32
        else:
            want = jnp.float32 if (not self.spec.is_xl and self.vae.dtype == jnp.float32) else self.dtype
        cache = getattr(self, "_vae_by_dtype", None)
        if cache is None:
            cache = self._vae_by_dtype = {self.vae.dtype: self.vae}
        if want not in cache:
            cache[want] = AutoencoderKL(cfg=self.spec.vae_cfg, dtype=want)
        return cache[want]

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
        """ONE jitted program for a whole generation batch: on-device Canny
        (or the HED forward) + both text towers + the scanned CFG denoise +
        VAE decode.  Eliminates the 4-5 separate dispatches of generate() —
        significant when each dispatch pays a host<->device round trip (the
        production driver uses this per shape bucket).

        Returns fn(params, ids, neg_ids, src_images_0_255, latents) -> uint8
        images; pass neg_ids=None-like zeros when guidance_scale <= 1."""
        key = (height, width, num_inference_steps, float(guidance_scale), float(controlnet_scale), float(canny_low), float(canny_high))
        if key in self._fused_cache:
            return self._fused_cache[key]

        timesteps = self.scheduler.timesteps(num_inference_steps)
        do_cfg = guidance_scale > 1.0
        is_xl = self.spec.is_xl

        def fused(params, ids, neg_ids, src_images, latents):
            # accept uint8 sources: the driver uploads uint8 (4x less relay
            # traffic than float32 at 8x512x512x3 — 6.3 vs 25 MB/batch, and
            # relay upload rides serially with device compute); values 0-255
            # are exact in f32 so the cast is bit-identical
            src_images = src_images.astype(jnp.float32)
            b = ids.shape[0]
            tids, ntids = self._make_time_ids(b, height, width)
            ctx, pooled = self._encode_ids(params["text"], ids)
            ac = {"text_embeds": pooled, "time_ids": tids} if is_xl else None
            nctx, nac = None, None
            if do_cfg:
                nctx, npooled = self._encode_ids(params["text"], neg_ids)
                if is_xl:
                    nac = {"text_embeds": npooled, "time_ids": ntids}
            control = self._control_from_src(params, src_images, height, width, canny_low, canny_high)
            out = self._sample(
                params, latents, ctx, nctx, timesteps,
                guidance_scale=float(guidance_scale),
                control_image=control,
                controlnet_scale=float(controlnet_scale),
                added_cond=ac, uncond_added_cond=nac,
            )
            # uint8 on device: 4x less data over the host fetch, and PNGs want
            # uint8 anyway
            return jnp.clip(jnp.round(out * 255.0), 0, 255).astype(jnp.uint8)

        fn = jax.jit(fused)
        self._fused_cache[key] = fn
        return fn

    def _control_from_src(self, params, src_images, height, width, canny_low, canny_high):
        """ControlNet conditioning computed INSIDE the fused program: batched
        device Canny, or the HED forward (run_aug/run_aug.py:436-439), resized
        to latent_size*8 (identity for real SD VAEs)."""
        if self.controlnet_kind == "canny":
            from saspa_tpu.ops.canny import canny_control_image

            control = canny_control_image(src_images, canny_low, canny_high)
        elif self.controlnet_kind == "hed":
            from saspa_tpu.models.hed import hed_control_image

            control = hed_control_image(self.hed, {"params": params["hed"]}, src_images / 255.0)
        else:
            return None
        lf = self.latent_factor
        ch, cw = (height // lf) * 8, (width // lf) * 8
        if (ch, cw) != (height, width):
            control = jax.image.resize(control, (control.shape[0], ch, cw, 3), method="nearest")
        return control

    # ------------------------------------------------------------------ params
    def _init_params(self, weights_dir: Optional[str], seed: int) -> dict:
        from saspa_tpu.utils.checkpoint import restore_checkpoint

        params = {}
        loaded = False
        if weights_dir:
            # blip_diffusion-controlnet shares blip_diffusion's weights (the
            # reference loads the same LAVIS model either way and adds the
            # canny ControlNet on top, run_aug/run_aug.py:171-181)
            names = [self.base_model.replace("/", "_")]
            if names[0].endswith("-controlnet"):
                names.append(names[0][: -len("-controlnet")])
            for name in names:
                ckpt = Path(weights_dir) / name
                if ckpt.exists():
                    restored = restore_checkpoint(str(ckpt))
                    params = restored["params"] if "params" in restored else restored
                    loaded = True
                    logging.info("loaded diffusion weights from %s", ckpt)
                    break
        self.weights_loaded = loaded  # bench/weights-day introspection
        if not loaded:
            logging.warning(
                "no converted weights found for %s — using seeded random init "
                "(every path stays runnable; outputs are not meaningful images)",
                self.base_model,
            )
            params = self._random_init(seed)

        if self.controlnet is not None and "controlnet" not in params:
            cn_path = Path(weights_dir or "") / f"controlnet_{self.controlnet_kind}_{'xl' if self.spec.is_xl else 'sd15'}"
            if weights_dir and cn_path.exists():
                from saspa_tpu.utils.checkpoint import restore_checkpoint as rc

                params["controlnet"] = rc(str(cn_path))["params"]
            else:
                k = jax.random.PRNGKey(seed + 7)
                lat = jnp.zeros((1, 8, 8, 4))
                ctx = jnp.zeros((1, 77, self.unet.cfg.cross_attention_dim))
                cond = jnp.zeros((1, 64, 64, 3))
                ac = self._dummy_added_cond(1)
                params["controlnet"] = self.controlnet.init(k, lat, jnp.zeros((1,), jnp.int32), ctx, cond, 1.0, added_cond=ac)["params"]
        if self.hed is not None and "hed" not in params:
            hed_path = Path(weights_dir or "") / "hed"
            if weights_dir and hed_path.exists():
                from saspa_tpu.utils.checkpoint import restore_checkpoint as rc

                params["hed"] = rc(str(hed_path))["params"]
            else:
                logging.warning("no HED weights — seeded random init")
                params["hed"] = self.hed.init(jax.random.PRNGKey(seed + 13), jnp.zeros((1, 64, 64, 3)))["params"]
        return params

    def _dummy_added_cond(self, b):
        if not self.spec.is_xl:
            return None
        n_time_ids = 5 if self.base_model == "sd_xl-refiner" else 6
        # add_embedding input = pooled text embeds ++ Fourier-embedded time
        # ids; derive the pooled width from the config so tiny test configs
        # init correctly (full SDXL: 2816 - 6*256 = 1280)
        cfg = self.unet.cfg
        if cfg.projection_class_embeddings_input_dim is not None:
            pooled_dim = cfg.projection_class_embeddings_input_dim - n_time_ids * cfg.addition_time_embed_dim
        else:
            # XL-family tiny test configs without text_time embeds: the UNet
            # ignores added_cond entirely, any width initializes
            pooled_dim = 1280
        return {"text_embeds": jnp.zeros((b, pooled_dim)), "time_ids": jnp.zeros((b, n_time_ids))}

    def _random_init(self, seed: int) -> dict:
        import os

        k = jax.random.PRNGKey(seed)
        ks = jax.random.split(k, 4)
        lat = jnp.zeros((1, 8, 8, self.unet.cfg.in_channels))
        ctx = jnp.zeros((1, 77, self.unet.cfg.cross_attention_dim))
        ac = self._dummy_added_cond(1)

        def make():
            return {
                "unet": self.unet.init(ks[0], lat, jnp.zeros((1,), jnp.int32), ctx, added_cond=ac)["params"],
                "vae": self.vae.init(ks[1], jnp.zeros((1, 32, 32, 3)))["params"],
                "text": [
                    te.init(ks[2 + i % 2], jnp.zeros((1, 77), jnp.int32))["params"]
                    for i, te in enumerate(self.text_encoders)
                ],
            }

        if os.environ.get("SASPA_INIT_BF16", "") == "1":
            # Benchmark-only init for models whose fp32 random masters would
            # not fit HBM (SDXL: 2.57B-param UNet + bigG tower ~14 GB fp32):
            # derive the param TREE abstractly, then materialize every leaf
            # directly in bf16. Statistically NOT the real initializers (all
            # leaves ~N(0, 0.02)) — fine for throughput, meaningless for
            # quality; converted real weights never take this path.
            tree = jax.eval_shape(make)
            leaves, treedef = jax.tree_util.tree_flatten(tree)
            key = jax.random.PRNGKey(seed)

            @jax.jit
            def material():
                return [
                    jax.random.normal(jax.random.fold_in(key, i), l.shape, jnp.bfloat16) * 0.02
                    for i, l in enumerate(leaves)
                ]

            return jax.tree_util.tree_unflatten(treedef, material())
        return make()

    # ------------------------------------------------------------------ prompts
    def _encode_ids(self, text_params, ids):
        """Run every text tower on EOT-padded ids.  OpenAI-CLIP towers
        (act=quick_gelu) consume the EOT padding directly (SD1.5 pad_token =
        <|endoftext|>); OpenCLIP towers (SD2.x tower, SDXL bigG tokenizer_2)
        ship pad_token "!" = id 0, so their padding is rewritten on the fly —
        padded positions feed cross-attention, so the pad id matters."""
        hiddens, pooled = [], None
        for te, cfg, p in zip(self.text_encoders, self.spec.text_cfgs, text_params):
            tower_ids = _openclip_pad(ids) if cfg.act == "gelu" else ids
            out = te.apply({"params": p}, tower_ids)
            hiddens.append(out["hidden"])
            pooled = out.get("proj", out["pooled"])  # bigG pooled for SDXL
        return jnp.concatenate(hiddens, axis=-1), pooled

    def _make_time_ids(self, b: int, height: int, width: int):
        """(cond, uncond) XL time_ids.  Base XL: (orig_h, orig_w, crop_top,
        crop_left, target_h, target_w).  The refiner replaces the target pair
        with the aesthetic score — 6.0 for cond, 2.5 for UNcond (diffusers XL
        img2img aesthetic_score / negative_aesthetic_score defaults)."""
        if self.base_model == "sd_xl-refiner":
            row, nrow = [height, width, 0, 0, 6.0], [height, width, 0, 0, 2.5]
        else:
            row = nrow = [height, width, 0, 0, height, width]
        tile = lambda r: jnp.tile(jnp.asarray([r], jnp.float32), (b, 1))
        return tile(row), tile(nrow)

    def encode_prompts(self, prompts, negative_prompt: Optional[str] = NEGATIVE_PROMPT,
                       with_negative: bool = True, token_ids=None, negative_token_ids=None):
        """Returns (context, uncond_context, added_cond, uncond_added_cond);
        the negative towers are skipped (None returns) when with_negative is
        False (guidance disabled — e.g. sdxl-turbo gs=0).  Precomputed
        `token_ids`/`negative_token_ids` (B, 77) bypass the tokenizer — golden
        fixtures pin ids as data so the model nets stay valid across the
        hash-fallback -> real-BPE tokenizer transition on weights day."""
        ids = jnp.asarray(
            token_ids if token_ids is not None else self.tokenizer(list(prompts), pad="eot")
        )
        ctx, pooled = self._encode_ids(self.params["text"], ids)
        nctx = npooled = None
        if with_negative:
            if negative_token_ids is not None:
                nids = jnp.asarray(negative_token_ids)
            else:
                neg = [negative_prompt or ""] * len(prompts)
                nids = jnp.asarray(self.tokenizer(neg, pad="eot"))
            nctx, npooled = self._encode_ids(self.params["text"], nids)
        if self.spec.is_xl:
            ac = {"text_embeds": pooled, "time_ids": None}  # time_ids filled at generate()
            nac = {"text_embeds": npooled, "time_ids": None} if with_negative else None
            return ctx, nctx, ac, nac
        return ctx, nctx, None, None

    # ------------------------------------------------------------------ generate
    def generate(
        self,
        prompts,
        key: jax.Array,
        height: int = 512,
        width: int = 512,
        num_inference_steps: int = 30,
        guidance_scale: float = 7.5,
        negative_prompt: Optional[str] = NEGATIVE_PROMPT,
        control_image: Optional[jax.Array] = None,  # (B,H,W,3) float [0,1]
        controlnet_scale: float = 0.75,
        init_image: Optional[jax.Array] = None,  # (B,H,W,3) in [0,1] for SDEdit
        sdedit_strength: float = 0.85,
        latents: Optional[jax.Array] = None,  # caller-supplied initial noise
        image_guidance_scale: float = 1.3,  # ip2p only (run_aug/run_aug.py:253)
        token_ids=None,  # precomputed (B,77) ids bypass the tokenizer
        negative_token_ids=None,
    ) -> jax.Array:
        """Batched text(+control)->image. Returns (B, H, W, 3) float in [0,1]."""
        b = len(prompts)
        is_ip2p = self.base_model == "ip2p"
        # diffusers ip2p: do_classifier_free_guidance requires BOTH scales
        # active (guidance_scale > 1 AND image_guidance_scale >= 1)
        do_cfg = guidance_scale > 1.0 and (not is_ip2p or image_guidance_scale >= 1.0)
        ctx, nctx, ac, nac = self.encode_prompts(
            prompts, negative_prompt, with_negative=do_cfg,
            token_ids=token_ids, negative_token_ids=negative_token_ids,
        )

        if self.spec.is_xl:
            tids, ntids = self._make_time_ids(b, height, width)
            ac = {"text_embeds": ac["text_embeds"], "time_ids": tids}
            if nac is not None:
                nac = {"text_embeds": nac["text_embeds"], "time_ids": ntids}

        timesteps = self.scheduler.timesteps(num_inference_steps)
        image_latents = None
        if is_ip2p:
            assert init_image is not None, "ip2p needs the image to edit"
            # diffusers ip2p uses the UNSCALED posterior mode as the image cond
            mean, _ = self.vae.apply(
                {"params": self.params["vae"]}, init_image * 2.0 - 1.0, method=AutoencoderKL.encode
            )
            image_latents = mean
            if latents is None:
                latents = initial_latents(key, b, height, width, factor=self.latent_factor)
        elif self.sdedit:
            assert init_image is not None
            start = sdedit_start_step(num_inference_steps, sdedit_strength)
            timesteps = timesteps[start:]
            mean, _ = self.vae.apply(
                {"params": self.params["vae"]}, init_image * 2.0 - 1.0, method=AutoencoderKL.encode
            )
            z0 = mean * self.spec.vae_cfg.scaling_factor
            noise = latents if latents is not None else jax.random.normal(key, z0.shape)
            latents = self.scheduler.add_noise(z0, noise, timesteps[0])
        elif latents is None:
            latents = initial_latents(key, b, height, width, factor=self.latent_factor)

        return self._sample_jit(
            self.params, latents, ctx, nctx, timesteps,
            guidance_scale=float(guidance_scale),
            control_image=control_image,
            controlnet_scale=float(controlnet_scale),
            added_cond=ac,
            uncond_added_cond=nac,
            image_latents=image_latents,
            image_guidance_scale=float(image_guidance_scale),
        )


def init_pipeline(
    base_model: str,
    controlnet: Optional[str],
    SDEdit: bool = False,
    sampler: str = "ddim",
    weights_dir: Optional[str] = None,
    dtype: Any = jnp.bfloat16,
) -> DiffusionPipeline:
    """Name-compatible with the reference's init_pipeline (run_aug/run_aug.py:128)."""
    if base_model in ("blip_diffusion", "blip_diffusion-controlnet", "blip_diffusion-edit"):
        from saspa_tpu.models.blip_diffusion import BlipDiffusionPipeline

        if SDEdit and base_model != "blip_diffusion-edit":
            # the reference's blip+SDEdit combination passes image/strength
            # kwargs the diffusers BlipDiffusion pipelines don't declare
            # (run_aug/run_aug.py:276-279 vs :243-250) — a latent TypeError
            # there; refuse loudly here. Subject-swap editing is the separate
            # "blip_diffusion-edit" base model (run_aug/run_aug.py:60,458-462).
            raise ValueError(
                "SDEdit is not supported with blip_diffusion; use "
                "base_model='blip_diffusion-edit' for the inversion-edit path"
            )
        # the -edit path ignores ControlNet (the reference's edit() call takes
        # no conditioning image, run_aug/run_aug.py:104-125)
        return BlipDiffusionPipeline(
            controlnet=None if base_model == "blip_diffusion-edit" else controlnet,
            sampler=sampler, weights_dir=weights_dir, dtype=dtype,
        )
    if base_model == "ip2p" and controlnet is not None:
        # ip2p conditions via channel concat; the sampler asserts on
        # control_image, so refuse at init instead of mid-run
        raise ValueError("ip2p does not support a ControlNet")
    if base_model == "sd_xl" and SDEdit and controlnet is None:
        # the reference's sd_xl img2img path runs on the REFINER model
        # (run_aug/run_aug.py:149-151)
        base_model = "sd_xl-refiner"
    return DiffusionPipeline(
        base_model=base_model, controlnet=controlnet, sdedit=SDEdit,
        sampler=sampler, dtype=dtype, weights_dir=weights_dir,
    )
