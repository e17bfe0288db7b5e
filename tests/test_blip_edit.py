import pytest

import jax
import jax.numpy as jnp
import numpy as np

from saspa_tpu.diffusion.pipelines import DiffusionPipeline
from saspa_tpu.models.blip_diffusion import BlipDiffusionPipeline, QFormer
from saspa_tpu.models.clip import CLIPVisionViT, CLIPVisionViTConfig
from tests.test_diffusion_pipeline import TINY_TEXT, TINY_UNET, TINY_VAE


def _tiny_blip_pipe(controlnet=None):
    from saspa_tpu.models.blip_caption import WordPieceTokenizer
    from saspa_tpu.models.blip_diffusion import _CAT_LEN

    pipe = BlipDiffusionPipeline.__new__(BlipDiffusionPipeline)
    DiffusionPipeline.__init__(
        pipe, base_model="blip_diffusion", controlnet=controlnet, sampler="ddim", dtype=jnp.float32,
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfgs=TINY_TEXT,
    )
    pipe.vision = CLIPVisionViT(cfg=CLIPVisionViTConfig(width=32, layers=1, heads=2, output_dim=None, patch_size=32), dtype=jnp.float32)
    pipe.qformer = QFormer(width=32, layers=1, heads=2, out_dim=32, dtype=jnp.float32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    pipe.params["blip_vision"] = pipe.vision.init(k1, jnp.zeros((1, 224, 224, 3)), return_tokens=True)["params"]
    pipe.params["blip_qformer"] = pipe.qformer.init(
        k2, jnp.zeros((1, 50, 32)), jnp.zeros((1, _CAT_LEN), jnp.int32), jnp.ones((1, _CAT_LEN), jnp.int32)
    )["params"]
    pipe._bert_tok = WordPieceTokenizer(None)

    def _subject_embeds_jit(params, images, text_ids, text_mask):
        t = pipe.vision.apply({"params": params["blip_vision"]}, images, return_tokens=True)
        return pipe.qformer.apply({"params": params["blip_qformer"]}, t, text_ids, text_mask)

    pipe._subject_embeds_jit = jax.jit(_subject_embeds_jit)
    return pipe


@pytest.mark.slow
def test_ddim_inversion_roundtrip_is_stable():
    """Inverting then denoising with the SAME context should roughly return
    the source latent (DDIM is deterministic and invertible up to model
    linearization error)."""
    pipe = _tiny_blip_pipe()
    img = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    ctx = pipe.text_encoders[0].apply({"params": pipe.params["text"][0]}, jnp.zeros((1, 77), jnp.int32))["hidden"]
    z = pipe.invert(img, ctx, num_inversion_steps=4)
    assert z.shape == (1, 32, 32, 4)
    assert np.isfinite(np.asarray(z)).all()


def test_blip_fused_generate_matches_unfused():
    """The single-program fused BLIP-Diffusion path (Q-Former + ctx splice +
    scan denoise + VAE in ONE jit) must reproduce generate()'s multi-dispatch
    output to uint8 rounding."""
    pipe = _tiny_blip_pipe()
    b, res = 2, 64
    rng = np.random.RandomState(3)
    refs = jnp.asarray(rng.rand(b, 224, 224, 3), jnp.float32)
    src = jnp.asarray(rng.rand(b, res, res, 3) * 255.0, jnp.float32)
    latents = jnp.asarray(rng.randn(b, res // pipe.latent_factor, res // pipe.latent_factor, 4), jnp.float32)
    prompts = ["flying over mountains", "parked at night"]
    meta = "airplane"

    ref_out = np.asarray(pipe.generate(
        prompts, jax.random.PRNGKey(0), reference_images=refs,
        source_subject_category=meta, target_subject_category=meta,
        height=res, width=res, num_inference_steps=3, guidance_scale=7.5,
        latents=latents, negative_prompt=None,
    ))

    fused = pipe.make_fused_generate(res, res, 3, 7.5)
    # same amplified 61-token prompt ids the driver builds (the ctx splice
    # restores the full 77 positions)
    ids = pipe.build_subject_prompt_ids(prompts, meta)
    nids = jnp.asarray(pipe.tokenizer([""] * b, pad="eot"))
    cat_ids, cat_mask = pipe.bert_category_ids(meta, b)
    got = np.asarray(fused(
        pipe.params, ids, nids, jnp.asarray(cat_ids), jnp.asarray(cat_mask), refs, src, latents
    ))
    assert got.dtype == np.uint8 and got.shape == (b, res, res, 3)
    err = np.abs(got.astype(np.float32) / 255.0 - ref_out).max()
    assert err < 2.5 / 255.0, err


def test_blip_edit_end_to_end():
    pipe = _tiny_blip_pipe()
    src = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    subj = jnp.asarray(np.random.RandomState(2).rand(1, 100, 100, 3), jnp.float32)
    out = pipe.edit(
        src, subj, ["flying over mountains"], jax.random.PRNGKey(0),
        source_subject="airplane", target_subject="airplane",
        num_inference_steps=3, num_inversion_steps=3,
    )
    out = np.asarray(out)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(out).all()
