"""Golden-output regression nets for the SDXL(-Turbo) and BLIP-Diffusion
pipeline families.

tests/fixtures/golden_gen.npz (test_golden_generation.py) pins the SD1.5
scheduler/sampler core; these fixtures pin what that one cannot see:

  * golden_gen_xl.npz — the SDXL added-cond plumbing: dual text towers
    (concat hidden states + bigG pooled projection), text_time embeddings
    via _time_ids, trailing-spaced 2-step schedule at guidance 0 (the CUB
    recipe, run_aug/run_aug.py:564-571), through the FUSED program to uint8.
  * golden_gen_blip.npz — the BLIP-Diffusion ctx-splice: CLIP-ViT vision
    tower -> Q-Former (with source-category BERT branch) -> subject
    embeddings spliced at CTX_BEGIN_POS -> fused CFG denoise to uint8
    (run_aug/run_aug.py:171-181,243-250).
  * golden_gen_ip2p.npz — InstructPix2Pix 3-way CFG: 8-channel UNet input
    (latents ++ UNSCALED posterior-mode image latents), text + image
    guidance combination (ALIA's planes_biased editor,
    run_aug/run_aug.py:252-255).
  * golden_gen_sdedit.npz — the SDEdit img2img path used by the
    Real-Guidance baseline (strength-truncated timestep schedule +
    add_noise from the VAE posterior mean,
    run_aug/run_aug_real_guidance.py:520-556).

A refactor of pipelines.py's text_time embeds or blip_diffusion.py's splice
now fails a bit-stability test instead of drifting silently (VERDICT round-2
weak item 3).  To accept an INTENTIONAL numeric change:
`python tools/make_golden.py` and commit the new fixtures with the change.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from saspa_tpu.diffusion.pipelines import DiffusionPipeline
from saspa_tpu.models.text_encoder import CLIPTextConfig
from saspa_tpu.models.unet import UNetConfig
from saspa_tpu.models.vae import VAEConfig
from tests.test_golden_generation import _unflatten_params

FIXTURES = Path(__file__).parent / "fixtures"
GOLDEN_XL_PATH = FIXTURES / "golden_gen_xl.npz"
GOLDEN_BLIP_PATH = FIXTURES / "golden_gen_blip.npz"
GOLDEN_IP2P_PATH = FIXTURES / "golden_gen_ip2p.npz"
GOLDEN_SDEDIT_PATH = FIXTURES / "golden_gen_sdedit.npz"

# tiny SDXL-Turbo: text_time added conds, dual towers, trailing spacing
GX_UNET = UNetConfig(
    block_out_channels=(32, 64),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1,
    transformer_layers_per_block=(1, 1),
    num_attention_heads=(2, 2),
    cross_attention_dim=48,  # 16 (L) + 32 (bigG)
    addition_embed_type="text_time",
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=32 + 6 * 8,  # pooled + 6 time ids
)
GX_VAE = VAEConfig(block_out_channels=(8, 16), layers_per_block=1)
GX_TEXT = (
    CLIPTextConfig(width=16, layers=2, heads=2, output_layer=-2),
    CLIPTextConfig(width=32, layers=2, heads=2, act="gelu", output_layer=-2, projection_dim=32),
)


def build_xl_pipe():
    return DiffusionPipeline(
        base_model="sd_xl-turbo", controlnet=None, sampler="ddim", dtype=jnp.float32,
        unet_cfg=GX_UNET, vae_cfg=GX_VAE, text_cfgs=GX_TEXT, init_seed=4321,
    )


def run_xl_golden(pipe, latents=None, ids=None, src=None):
    """2-step trailing gs=0 fused generation (the sdxl-turbo CUB recipe)."""
    if latents is None:
        latents = np.asarray(jax.random.normal(jax.random.PRNGKey(11), (1, 8, 8, 4), jnp.float32))
    if ids is None:
        ids = pipe.tokenizer(["a golden xl regression airplane"], pad="eot")
    if src is None:
        src = np.asarray(jax.random.uniform(jax.random.PRNGKey(12), (1, 64, 64, 3)) * 255.0, np.float32)
    fused = pipe.make_fused_generate(64, 64, 2, 0.0)
    out = np.asarray(fused(pipe.params, jnp.asarray(ids), jnp.asarray(ids * 0),
                           jnp.asarray(src), jnp.asarray(latents)))
    return out, np.asarray(latents, np.float32), np.asarray(ids), np.asarray(src, np.float32)


def build_blip_pipe():
    from tests.test_blip_edit import _tiny_blip_pipe

    return _tiny_blip_pipe()


def run_blip_golden(pipe, latents=None, refs=None, src=None, ids=None, nids=None,
                    cat_ids=None, cat_mask=None):
    """3-step CFG fused BLIP-Diffusion generation (ctx-splice path).

    All token ids (CLIP prompt/negative, BERT category) are fixture DATA when
    replaying — the golden pins the model math, not the tokenizer, so the
    hash-fallback -> real-BPE transition on weights day cannot blind it."""
    meta = "airplane"
    if latents is None:
        latents = np.asarray(jax.random.normal(jax.random.PRNGKey(21), (1, 16, 16, 4), jnp.float32))
    if refs is None:
        refs = np.asarray(jax.random.uniform(jax.random.PRNGKey(22), (1, 224, 224, 3)), np.float32)
    if src is None:
        src = np.asarray(jax.random.uniform(jax.random.PRNGKey(23), (1, 64, 64, 3)) * 255.0, np.float32)
    if ids is None:
        ids = pipe.build_subject_prompt_ids(["golden blip regression"], meta)
    if nids is None:
        nids = pipe.tokenizer([""], pad="eot")
    if cat_ids is None or cat_mask is None:
        cat_ids, cat_mask = pipe.bert_category_ids(meta, 1)
    fused = pipe.make_fused_generate(64, 64, 3, 7.5)
    out = np.asarray(fused(pipe.params, jnp.asarray(ids), jnp.asarray(nids),
                           jnp.asarray(cat_ids), jnp.asarray(cat_mask),
                           jnp.asarray(refs), jnp.asarray(src), jnp.asarray(latents)))
    return (out, np.asarray(latents, np.float32), np.asarray(refs, np.float32),
            np.asarray(src, np.float32),
            {"token_ids": np.asarray(ids), "neg_token_ids": np.asarray(nids),
             "cat_ids": np.asarray(cat_ids), "cat_mask": np.asarray(cat_mask)})


def build_ip2p_pipe():
    import dataclasses

    from tests.test_diffusion_pipeline import TINY_TEXT, TINY_UNET, TINY_VAE

    cfg8 = dataclasses.replace(TINY_UNET, in_channels=8)
    return DiffusionPipeline(
        base_model="ip2p", controlnet=None, sampler="ddim", dtype=jnp.float32,
        unet_cfg=cfg8, vae_cfg=TINY_VAE, text_cfgs=TINY_TEXT, init_seed=7531,
    )


def run_ip2p_golden(pipe, latents=None, img=None, ids=None, nids=None):
    """2-step 3-way-CFG edit (text gs=7.5, image gs=1.3 — the reference's
    ip2p defaults, run_aug/run_aug.py:252-255).  Token ids replay as fixture
    data (tokenizer-transition-proof)."""
    if latents is None:
        # the tiny VAE downsamples 64->32 (one resolution halving), so the
        # latent grid must match the encoded image latents it concatenates with
        latents = np.asarray(jax.random.normal(jax.random.PRNGKey(31), (1, 32, 32, 4), jnp.float32))
    if img is None:
        img = np.asarray(jax.random.uniform(jax.random.PRNGKey(32), (1, 64, 64, 3)), np.float32)
    prompts = ["golden ip2p make it snowy"]
    if ids is None:
        ids = pipe.tokenizer(prompts, pad="eot")
    if nids is None:
        from saspa_tpu.utils.config import NEGATIVE_PROMPT

        nids = pipe.tokenizer([NEGATIVE_PROMPT or ""], pad="eot")
    out = pipe.generate(
        prompts, jax.random.PRNGKey(0), height=64, width=64,
        num_inference_steps=2, guidance_scale=7.5,
        init_image=jnp.asarray(img), image_guidance_scale=1.3,
        latents=jnp.asarray(latents),
        token_ids=ids, negative_token_ids=nids,
    )
    return (np.asarray(out), np.asarray(latents, np.float32), img,
            {"token_ids": np.asarray(ids), "neg_token_ids": np.asarray(nids)})


def build_sdedit_pipe():
    from tests.test_diffusion_pipeline import TINY_TEXT, TINY_UNET, TINY_VAE

    return DiffusionPipeline(
        base_model="sd_v1.5", controlnet=None, sampler="ddim", dtype=jnp.float32,
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfgs=TINY_TEXT,
        sdedit=True, init_seed=8642,
    )


def run_sdedit_golden(pipe, noise=None, img=None, ids=None, nids=None):
    """6-step SDEdit at strength 0.5 (3 denoise steps actually run): pins
    the strength-truncated schedule + posterior-mean add_noise plumbing the
    Real-Guidance preset rides (strength 0.15 there,
    run_aug_real_guidance.py:520-556).  Token ids replay as fixture data."""
    if noise is None:
        noise = np.asarray(jax.random.normal(jax.random.PRNGKey(41), (1, 32, 32, 4), jnp.float32))
    if img is None:
        img = np.asarray(jax.random.uniform(jax.random.PRNGKey(42), (1, 64, 64, 3)), np.float32)
    prompts = ["golden sdedit regression"]
    if ids is None:
        ids = pipe.tokenizer(prompts, pad="eot")
    if nids is None:
        from saspa_tpu.utils.config import NEGATIVE_PROMPT

        nids = pipe.tokenizer([NEGATIVE_PROMPT or ""], pad="eot")
    out = pipe.generate(
        prompts, jax.random.PRNGKey(0), height=64, width=64,
        num_inference_steps=6, guidance_scale=7.5,
        init_image=jnp.asarray(img), sdedit_strength=0.5,
        latents=jnp.asarray(noise),
        token_ids=ids, negative_token_ids=nids,
    )
    return (np.asarray(out), np.asarray(noise, np.float32), img,
            {"token_ids": np.asarray(ids), "neg_token_ids": np.asarray(nids)})


def _assert_bitstable_float(name, got, want):
    if np.array_equal(got, want):
        return
    err = float(np.abs(got.astype(np.float64) - want.astype(np.float64)).max())
    raise AssertionError(
        f"golden {name} output drifted (max abs err {err:.3e}). If the numeric "
        f"change is intentional, regenerate via python tools/make_golden.py "
        f"and commit the fixtures with the change."
    )


def _assert_bitstable(name, got, want):
    if np.array_equal(got, want):
        return
    err = float(np.abs(got.astype(np.int32) - want.astype(np.int32)).max())
    raise AssertionError(
        f"golden {name} output drifted (max abs err {err} uint8 steps). If the "
        f"numeric change is intentional, regenerate via python tools/make_golden.py "
        f"and commit the fixtures with the change."
    )


def test_golden_xl_turbo_bitstable():
    assert GOLDEN_XL_PATH.exists(), "missing fixture — run python tools/make_golden.py"
    npz = np.load(GOLDEN_XL_PATH)
    pipe = build_xl_pipe()
    pipe.params = _unflatten_params(npz)
    out, _, _, _ = run_xl_golden(pipe, latents=npz["latents"], ids=npz["token_ids"], src=npz["src"])
    assert out.dtype == np.uint8
    _assert_bitstable("sdxl-turbo", out, npz["expected"])


def _fixture_ids(npz, *names):
    """Stored token-id arrays, or Nones for pre-round-4 fixtures (the runner
    then falls back to the live tokenizer)."""
    return {n: (npz[n] if n in npz.files else None) for n in names}


def test_golden_blip_diffusion_bitstable():
    assert GOLDEN_BLIP_PATH.exists(), "missing fixture — run python tools/make_golden.py"
    npz = np.load(GOLDEN_BLIP_PATH)
    pipe = build_blip_pipe()
    pipe.params = _unflatten_params(npz)
    stored = _fixture_ids(npz, "token_ids", "neg_token_ids", "cat_ids", "cat_mask")
    out, _, _, _, _ = run_blip_golden(
        pipe, latents=npz["latents"], refs=npz["refs"], src=npz["src"],
        ids=stored["token_ids"], nids=stored["neg_token_ids"],
        cat_ids=stored["cat_ids"], cat_mask=stored["cat_mask"],
    )
    assert out.dtype == np.uint8
    _assert_bitstable("blip-diffusion", out, npz["expected"])


def test_blip_ctx_splice_rejects_full_length_ids():
    """Full-77 ids spliced with 16 subject queries would give 93 positions and
    die deep in the text tower with a cryptic broadcast error (this exact
    mistake shipped in tools/backbone_bench.py and only surfaced on-chip);
    the contract violation must fail loudly at the boundary instead."""
    import pytest

    pipe = build_blip_pipe()
    full_ids = jnp.asarray(pipe.tokenizer(["a car"], pad="eot"))
    subject = jnp.zeros((1, pipe.qformer.num_queries, 768), jnp.float32)
    with pytest.raises(ValueError, match="build_subject_prompt_ids"):
        pipe._encode_with_ctx(pipe.params, full_ids, subject)


def test_golden_ip2p_bitstable():
    assert GOLDEN_IP2P_PATH.exists(), "missing fixture — run python tools/make_golden.py"
    npz = np.load(GOLDEN_IP2P_PATH)
    pipe = build_ip2p_pipe()
    pipe.params = _unflatten_params(npz)
    stored = _fixture_ids(npz, "token_ids", "neg_token_ids")
    out, _, _, _ = run_ip2p_golden(pipe, latents=npz["latents"], img=npz["img"],
                                   ids=stored["token_ids"], nids=stored["neg_token_ids"])
    _assert_bitstable_float("ip2p", out, npz["expected"])


def test_golden_sdedit_bitstable():
    assert GOLDEN_SDEDIT_PATH.exists(), "missing fixture — run python tools/make_golden.py"
    npz = np.load(GOLDEN_SDEDIT_PATH)
    pipe = build_sdedit_pipe()
    pipe.params = _unflatten_params(npz)
    stored = _fixture_ids(npz, "token_ids", "neg_token_ids")
    out, _, _, _ = run_sdedit_golden(pipe, noise=npz["latents"], img=npz["img"],
                                     ids=stored["token_ids"], nids=stored["neg_token_ids"])
    _assert_bitstable_float("sdedit", out, npz["expected"])
