"""CI rehearsal of the weights-day driver (tools/weights_day.py).

Drills the EXACT convert -> assemble -> load path end to end against
tools/synth_checkpoints.py torch-layout state dicts (random-filled), at tiny
config scale so it runs in CI: safetensors on disk -> convert_weights.main()
-> orbax parts -> composed pipeline checkpoint -> DiffusionPipeline actually
loads it and generates.  Round 3 shipped this flow as a runbook only — and
the runbook's "merge into weights/sd_v1.5" step did not exist in code (the
converters overwrite; weights_day's assemble stage is the fix)."""

import numpy as np
import pytest

from tools import synth_checkpoints as synth
from tools.weights_day import Part, run_weights_day


TINY_TORCH_UNET = dict(
    in_channels=4, out_channels=4,
    block_out_channels=(32, 64), layers_per_block=1,
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    transformer_layers_per_block=(1, 1),
    cross_attention_dim=32, use_linear_projection=False,
    addition_embed_type=None, projection_class_embeddings_input_dim=None,
)
TINY_TORCH_VAE = dict(block_out_channels=(8, 16), layers_per_block=1,
                      in_channels=3, out_channels=3, latent_channels=4)


def test_weights_day_rehearsal_tiny(tmp_path, monkeypatch):
    import jax
    import jax.numpy as jnp

    from saspa_tpu.models.unet import UNET_CONFIGS
    from saspa_tpu.models.vae import VAE_CONFIGS, VAEConfig
    from tests.test_diffusion_pipeline import TINY_TEXT, TINY_UNET

    TINY_VAE = VAEConfig(block_out_channels=(8, 16), layers_per_block=1)
    monkeypatch.setitem(UNET_CONFIGS, "tiny-test", TINY_UNET)
    monkeypatch.setitem(VAE_CONFIGS, "tiny-test", TINY_VAE)
    rng = np.random.RandomState(0)

    parts = [
        Part("sd15_unet", "unet", (), arch="tiny-test",
             synth=lambda: synth.diffusers_unet_state_dict(TINY_TORCH_UNET, fill=rng)),
        Part("sd15_vae", "vae", (), arch="tiny-test",
             synth=lambda: synth.diffusers_vae_state_dict(TINY_TORCH_VAE, fill=rng)),
        Part("sd15_text", "clip_text", (),
             synth=lambda: synth.hf_clip_text_state_dict(width=32, layers=2, fill=rng)),
        Part("controlnet_canny_sd15", "controlnet", (), arch="tiny-test", dest="controlnet_canny_sd15",
             synth=lambda: synth.diffusers_controlnet_state_dict(TINY_TORCH_UNET, fill=rng)),
        Part("no_source_part", "lpips", ()),  # synth=None -> must be reported missing
    ]
    compose = {"sd_v1.5": {"unet": "sd15_unet", "vae": "sd15_vae", "text": ["sd15_text"]},
               "ip2p": {"unet": "ip2p_unet", "vae": "sd15_vae", "text": ["sd15_text"]}}

    def load_check(weights_dir):
        from saspa_tpu.diffusion.pipelines import DiffusionPipeline

        pipe = DiffusionPipeline(
            base_model="sd_v1.5", controlnet="canny", sampler="ddim", dtype=jnp.float32,
            unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfgs=TINY_TEXT,
            weights_dir=weights_dir,
        )
        assert pipe.weights_loaded, "composed checkpoint did not load"
        # the converted weights must actually APPLY: one tiny end-to-end batch
        fused = pipe.make_fused_generate(64, 64, 2, 7.5)
        ids = jnp.asarray(pipe.tokenizer(["a plane"], pad="eot"))
        neg = jnp.asarray(pipe.tokenizer([""], pad="eot"))
        src = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 255.0)
        lf = pipe.latent_factor  # tiny 2-block VAE downsamples 2x, not 8x
        lat = jax.random.normal(jax.random.PRNGKey(0), (1, 64 // lf, 64 // lf, 4), jnp.float32)
        out = np.asarray(fused(pipe.params, ids, neg, src, lat))
        assert out.shape == (1, 64, 64, 3) and out.dtype == np.uint8
        return {"generated": True}

    report = run_weights_day(
        str(tmp_path / "weights"), rehearsal=True, parts=parts,
        compose_table=compose, load_check=load_check,
        skip_tests=True, skip_bench=True,
    )
    assert [c["part"] for c in report["converted"]] == [
        "sd15_unet", "sd15_vae", "sd15_text", "controlnet_canny_sd15"]
    assert report["missing"] == ["no_source_part"]
    assert report["composed"] == ["sd_v1.5"]
    # a compose target with missing parts is reported, not silently dropped
    assert report["compose_skipped"] == [{"final": "ip2p", "missing_parts": ["ip2p_unet"]}]
    assert report["load"] == {"generated": True}


def test_weights_day_real_mode_needs_sources(tmp_path):
    """Real mode with an empty src_dir: everything reported missing, nothing
    composed, no crash — the report IS the gap list."""
    report = run_weights_day(
        str(tmp_path / "weights"), src_dir=str(tmp_path / "empty_src"),
        skip_tests=True, skip_bench=True,
    )
    assert report["composed"] == []
    assert len(report["missing"]) >= 20
    assert report["load"] == "skipped (sd_v1.5 not composed)"


@pytest.mark.slow
def test_weights_day_rn50_sanity_rehearsal(tmp_path):
    """The clip_rn50 part must flow through convert -> CLIPScorer load ->
    the RN50 sanity stage (logit_scale, zero-shot color smoke, embedding
    stats).  Rehearsal weights are random: only the mechanical half of the
    checks is enforced, but the whole stage executes — so a converter/layout
    break is caught in CI, not on weights day."""
    report = run_weights_day(
        str(tmp_path / "weights"), rehearsal=True,
        only=["clip_rn50"], skip_tests=True, skip_bench=True,
    )
    assert [c["part"] for c in report["converted"]] == ["clip_rn50"]
    sanity = report["rn50_sanity"]
    assert "error" not in sanity, sanity
    assert sanity["mode"] == "rehearsal"
    assert sanity["feat_finite"] is True
    assert sanity["ok"] is True
    # the stage must have actually scored the color battery
    assert sanity["zero_shot_color_acc"].endswith("/6")
