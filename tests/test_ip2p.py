import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from saspa_tpu.diffusion.pipelines import DiffusionPipeline
from tests.test_diffusion_pipeline import TINY_TEXT, TINY_UNET, TINY_VAE


def test_ip2p_three_way_guidance_runs():
    """InstructPix2Pix path: 8-channel UNet input, 3-way CFG
    (ALIA's editor for planes_biased, run_aug/run_aug.py:252-255)."""
    cfg8 = dataclasses.replace(TINY_UNET, in_channels=8)
    pipe = DiffusionPipeline(
        base_model="ip2p", sampler="ddim", dtype=jnp.float32,
        unet_cfg=cfg8, vae_cfg=TINY_VAE, text_cfgs=TINY_TEXT,
    )
    img = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    out = pipe.generate(
        ["make it snowy"], jax.random.PRNGKey(0), height=64, width=64,
        num_inference_steps=2, guidance_scale=7.5,
        init_image=img, image_guidance_scale=1.3,
    )
    out = np.asarray(out)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(out).all()


def test_ip2p_low_image_guidance_disables_cfg():
    """diffusers ip2p: do_classifier_free_guidance = gs > 1 AND igs >= 1 —
    igs < 1 must take the single-forward no-guidance path."""
    cfg8 = dataclasses.replace(TINY_UNET, in_channels=8)
    pipe = DiffusionPipeline(
        base_model="ip2p", sampler="ddim", dtype=jnp.float32,
        unet_cfg=cfg8, vae_cfg=TINY_VAE, text_cfgs=TINY_TEXT,
    )
    img = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    out = pipe.generate(
        ["make it snowy"], jax.random.PRNGKey(0), height=64, width=64,
        num_inference_steps=2, guidance_scale=7.5,
        init_image=img, image_guidance_scale=0.5,
    )
    out = np.asarray(out)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(out).all()


def test_init_pipeline_rejects_unsupported_combinations():
    import pytest

    from saspa_tpu.diffusion.pipelines import init_pipeline

    with pytest.raises(ValueError, match="ControlNet"):
        init_pipeline("ip2p", "canny")
    with pytest.raises(ValueError, match="blip_diffusion-edit"):
        init_pipeline("blip_diffusion", None, SDEdit=True)


def test_run_generation_rejects_unsupported_combinations(tmp_path):
    import pytest

    from saspa_tpu.gen.driver import run_generation
    from saspa_tpu.utils.config import GenerationConfig

    with pytest.raises(ValueError, match="ControlNet"):
        run_generation(GenerationConfig(dataset="planes", base_model="ip2p", controlnet="canny"))
    with pytest.raises(ValueError, match="blip_diffusion-edit"):
        run_generation(GenerationConfig(dataset="planes", base_model="blip_diffusion", sdedit=True))
