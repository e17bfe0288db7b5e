import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saspa_tpu.diffusion.pipelines import DiffusionPipeline
from saspa_tpu.models.text_encoder import CLIPTextConfig
from saspa_tpu.models.unet import UNetConfig
from saspa_tpu.models.vae import VAEConfig

TINY_UNET = UNetConfig(
    block_out_channels=(32, 64),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1,
    transformer_layers_per_block=(1, 1),
    num_attention_heads=(2, 2),
    cross_attention_dim=32,
)
TINY_VAE = VAEConfig(block_out_channels=(8, 16), layers_per_block=1)
TINY_TEXT = (CLIPTextConfig(width=32, layers=2, heads=2),)


@pytest.fixture(scope="module")
def pipe():
    return DiffusionPipeline(
        base_model="sd_v1.5", controlnet=None, sampler="ddim", dtype=jnp.float32,
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfgs=TINY_TEXT,
    )


@pytest.fixture(scope="module")
def cn_pipe():
    return DiffusionPipeline(
        base_model="sd_v1.5", controlnet="canny", sampler="ddim", dtype=jnp.float32,
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfgs=TINY_TEXT,
    )


def test_text2img_generate(pipe):
    out = pipe.generate(
        ["a photo of an airplane", "a red car"], jax.random.PRNGKey(0),
        height=64, width=64, num_inference_steps=3, guidance_scale=7.5,
    )
    out = np.asarray(out)
    assert out.shape == (2, 64, 64, 3)
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_generate_deterministic_by_key(pipe):
    kw = dict(height=64, width=64, num_inference_steps=2, guidance_scale=7.5)
    a = np.asarray(pipe.generate(["x"], jax.random.PRNGKey(1), **kw))
    b = np.asarray(pipe.generate(["x"], jax.random.PRNGKey(1), **kw))
    c = np.asarray(pipe.generate(["x"], jax.random.PRNGKey(2), **kw))
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


@pytest.mark.slow
def test_bf16_init_tree_matches_fp32(monkeypatch):
    """SASPA_INIT_BF16 (bench-only init for HBM-bound models like SDXL) must
    produce the SAME param tree/shapes as the real initializers, with every
    leaf in bf16 — a drifted tree would break weight loading symmetry."""
    kw = dict(base_model="sd_v1.5", controlnet=None, sampler="ddim", dtype=jnp.bfloat16,
              unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfgs=TINY_TEXT)
    p32 = DiffusionPipeline(**kw).params
    monkeypatch.setenv("SASPA_INIT_BF16", "1")
    p16 = DiffusionPipeline(**kw).params
    assert jax.tree_util.tree_map(jnp.shape, p32) == jax.tree_util.tree_map(jnp.shape, p16)
    assert {str(x.dtype) for x in jax.tree_util.tree_leaves(p16)} == {"bfloat16"}


def test_guidance_zero_skips_cfg(pipe):
    out = pipe.generate(["x"], jax.random.PRNGKey(0), height=64, width=64,
                        num_inference_steps=2, guidance_scale=0.0)
    assert np.isfinite(np.asarray(out)).all()


def test_controlnet_conditioning_changes_output(cn_pipe):
    kw = dict(height=64, width=64, num_inference_steps=2, guidance_scale=7.5)
    # ControlNet's cond embedding downsamples 8x, so the control image lives at
    # latent_size * 8 (tiny VAE factor=2 -> latents 32x32 -> control 256x256)
    blank = jnp.zeros((1, 256, 256, 3))
    edges = jnp.zeros((1, 256, 256, 3)).at[:, 80:160, 80:160].set(1.0)
    a = np.asarray(cn_pipe.generate(["x"], jax.random.PRNGKey(0), control_image=blank, **kw))
    b = np.asarray(cn_pipe.generate(["x"], jax.random.PRNGKey(0), control_image=edges, **kw))
    assert a.shape == (1, 64, 64, 3)
    # random-init controlnet zero convs are zero-init -> the cond path is only
    # active through the cond embedding; outputs may match at zero conv init.
    assert np.isfinite(a).all() and np.isfinite(b).all()


def test_cfg_shared_prefix_matches_full_batch(monkeypatch):
    """The CFG shared-prefix path (B-sized sample forking to 2B at the first
    cross-attention, models/unet.py::cfg_tile) must reproduce the plain
    full-2B-batch path: both CFG halves share the latent, so the reuse is
    mathematically exact (identical per-sample ops, no cross-batch math)."""
    outs = {}
    for knob in ("", "1"):
        if knob:
            monkeypatch.setenv("SASPA_CFG_FULL_BATCH", knob)
        else:
            monkeypatch.delenv("SASPA_CFG_FULL_BATCH", raising=False)
        p = DiffusionPipeline(
            base_model="sd_v1.5", controlnet="canny", sampler="ddim", dtype=jnp.float32,
            unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfgs=TINY_TEXT, init_seed=99,
        )
        lat = jnp.asarray(np.random.RandomState(5).randn(2, 8, 8, 4), np.float32)
        ctrl = jnp.asarray(np.random.RandomState(6).rand(2, 64, 64, 3), np.float32)
        outs[knob] = np.asarray(p.generate(
            ["a plane", "a car"], jax.random.PRNGKey(0), height=64, width=64,
            num_inference_steps=3, guidance_scale=7.5, latents=lat,
            control_image=ctrl,
        ))
    err = np.abs(outs[""] - outs["1"]).max()
    assert err < 1e-5, err


def test_sdedit_img2img():
    pipe = DiffusionPipeline(
        base_model="sd_v1.5", controlnet=None, sdedit=True, sampler="ddim", dtype=jnp.float32,
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfgs=TINY_TEXT,
    )
    init = jnp.ones((1, 64, 64, 3)) * 0.5
    out = pipe.generate(["x"], jax.random.PRNGKey(0), height=64, width=64,
                        num_inference_steps=4, guidance_scale=7.5,
                        init_image=init, sdedit_strength=0.5)
    assert np.asarray(out).shape == (1, 64, 64, 3)


def test_unipc_sampler_runs():
    pipe = DiffusionPipeline(
        base_model="sd_v1.5", sampler="unipcmultistep", dtype=jnp.float32,
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfgs=TINY_TEXT,
    )
    out = pipe.generate(["x"], jax.random.PRNGKey(0), height=64, width=64,
                        num_inference_steps=3, guidance_scale=7.5)
    assert np.isfinite(np.asarray(out)).all()


def test_blip_diffusion_subject_conditioning():
    from saspa_tpu.models.blip_diffusion import BlipDiffusionPipeline

    # tiny override: monkey-init via small configs isn't wired for blip's
    # vision/qformer, so this test uses the small UNet but default-ish blip parts
    pipe = BlipDiffusionPipeline.__new__(BlipDiffusionPipeline)
    DiffusionPipeline.__init__(
        pipe, base_model="blip_diffusion", controlnet=None, sampler="ddim", dtype=jnp.float32,
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfgs=TINY_TEXT,
    )
    from saspa_tpu.models.blip_diffusion import QFormer
    from saspa_tpu.models.clip import CLIPVisionViT, CLIPVisionViTConfig

    pipe.vision = CLIPVisionViT(cfg=CLIPVisionViTConfig(width=32, layers=1, heads=2, output_dim=None, patch_size=32), dtype=jnp.float32)
    pipe.qformer = QFormer(width=32, layers=1, heads=2, out_dim=32, dtype=jnp.float32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    dummy = jnp.zeros((1, 224, 224, 3))
    pipe.params["blip_vision"] = pipe.vision.init(k1, dummy, return_tokens=True)["params"]
    tokens = jnp.zeros((1, 50, 32))
    pipe.params["blip_qformer"] = pipe.qformer.init(k2, tokens)["params"]

    def _subject_embeds(params, images, source_category=""):
        t = pipe.vision.apply({"params": params["blip_vision"]}, images, return_tokens=True)
        return pipe.qformer.apply({"params": params["blip_qformer"]}, t)

    pipe._subject_embeds = _subject_embeds

    ref = jnp.asarray(np.random.rand(1, 100, 100, 3), jnp.float32)
    out = pipe.generate(
        ["wearing sunglasses"], jax.random.PRNGKey(0), reference_images=ref,
        source_subject_category="airplane", target_subject_category="airplane",
        height=64, width=64, num_inference_steps=2, guidance_scale=7.5,
    )
    assert np.asarray(out).shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_split_skip_concat_matches_concat_path(monkeypatch):
    """SASPA_SPLIT_SKIP_CONCAT elides group-aligned up-block skip concats
    (norm1 splits exactly at the seam; conv1/shortcut run as sliced-kernel
    conv pairs).  Same param tree, same math up to conv summation order —
    fp32 outputs must agree to tight tolerance, and the param trees must be
    byte-interchangeable between the two paths."""
    from saspa_tpu.models.unet import UNet2DCondition

    model = UNet2DCondition(cfg=TINY_UNET, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 4), jnp.float32)
    t = jnp.asarray([7, 7])
    ctx = jnp.asarray(rng.randn(2, 5, 32), jnp.float32)

    monkeypatch.delenv("SASPA_SPLIT_SKIP_CONCAT", raising=False)
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    eps_concat = model.apply(params, x, t, ctx)

    monkeypatch.setenv("SASPA_SPLIT_SKIP_CONCAT", "1")
    # params initialized under the CONCAT path must load into the SPLIT path
    eps_split = model.apply(params, x, t, ctx)
    # and vice versa: init under split, apply under concat
    params_split = model.init(jax.random.PRNGKey(0), x, t, ctx)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_split)

    np.testing.assert_allclose(
        np.asarray(eps_split), np.asarray(eps_concat), rtol=2e-5, atol=2e-5)
    # the tiny config exercises both aligned (32+32, 64+64) and crossing
    # (64+32) seams, so the eligible gate took BOTH branches in one forward
