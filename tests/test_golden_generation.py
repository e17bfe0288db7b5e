"""Golden-output regression net for the generation pipeline.

tests/fixtures/golden_gen.npz pins a tiny fixed-weight pipeline (params,
initial latents, token ids) and the expected outputs of a 2-step DDIM and a
3-step UniPC generation.  Any refactor that changes pipeline numerics —
kernel rewrites, scheduler edits, fusion changes — fails here instead of
shipping a silent drift that "finite and in [0,1]" checks can't see
(VERDICT round-1 weak item 4).

To accept an INTENTIONAL numeric change: `python tools/make_golden.py` and
commit the new fixture alongside the change.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saspa_tpu.diffusion.pipelines import DiffusionPipeline
from saspa_tpu.models.text_encoder import CLIPTextConfig
from saspa_tpu.models.unet import UNetConfig
from saspa_tpu.models.vae import VAEConfig

GOLDEN_PATH = Path(__file__).parent / "fixtures" / "golden_gen.npz"

G_UNET = UNetConfig(
    block_out_channels=(32, 64),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1,
    transformer_layers_per_block=(1, 1),
    num_attention_heads=(2, 2),
    cross_attention_dim=16,
)
G_VAE = VAEConfig(block_out_channels=(8, 16), layers_per_block=1)
G_TEXT = (CLIPTextConfig(width=16, layers=2, heads=2),)


def build_pipe(sampler="ddim"):
    return DiffusionPipeline(
        base_model="sd_v1.5", controlnet=None, sampler=sampler, dtype=jnp.float32,
        unet_cfg=G_UNET, vae_cfg=G_VAE, text_cfgs=G_TEXT, init_seed=1234,
    )


def run_golden(pipe, latents=None, ids=None):
    """One 2-step DDIM + one 3-step UniPC generation on fixed inputs.
    Returns float32 outputs and the inputs actually used."""
    from saspa_tpu.diffusion.schedulers import UniPCScheduler

    if latents is None:
        latents = np.asarray(jax.random.normal(jax.random.PRNGKey(7), (1, 8, 8, 4), jnp.float32))
    if ids is None:
        ids = pipe.tokenizer(["a golden regression airplane"])
    ctx = pipe.text_encoders[0].apply({"params": pipe.params["text"][0]}, jnp.asarray(ids))["hidden"]
    nctx = pipe.text_encoders[0].apply({"params": pipe.params["text"][0]}, jnp.asarray(ids * 0))["hidden"]

    def run(sampler, steps):
        sched = pipe.scheduler if sampler == "ddim" else UniPCScheduler(pipe.spec.scheduler_cfg)
        sample = pipe._sample if sampler == "ddim" else None
        if sample is None:
            from saspa_tpu.diffusion.sampler import make_sample_loop
            from saspa_tpu.models.vae import AutoencoderKL

            def unet_apply(p, lat, t, c, ac, dr, mr):
                return pipe.unet.apply({"params": p}, lat, t, c, added_cond=ac,
                                       down_block_additional_residuals=dr,
                                       mid_block_additional_residual=mr)

            def vae_decode(p, z):
                return pipe.vae.apply({"params": p}, z, method=AutoencoderKL.decode)

            sample = make_sample_loop(unet_apply, sched, None, vae_decode, pipe.spec.vae_cfg.scaling_factor)
        ts = sched.timesteps(steps)
        return np.asarray(jax.jit(
            lambda lat: sample(pipe.params, lat, ctx, nctx, ts, guidance_scale=7.5)
        )(jnp.asarray(latents)), np.float32)

    return run("ddim", 2), run("unipc", 3), np.asarray(latents, np.float32), np.asarray(ids)


def _unflatten_params(npz):
    tree: dict = {}
    for k in npz.files:
        if not k.startswith("params::"):
            continue
        parts = k[len("params::"):].split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = npz[k]
    return _restore_lists(tree)


def _restore_lists(tree):
    if isinstance(tree, dict):
        if tree and all(k.startswith("__list") for k in tree):
            return [_restore_lists(tree[f"__list{i}"]) for i in range(len(tree))]
        return {k: _restore_lists(v) for k, v in tree.items()}
    return tree


def test_golden_generation_bitstable():
    assert GOLDEN_PATH.exists(), "missing fixture — run python tools/make_golden.py"
    npz = np.load(GOLDEN_PATH)
    pipe = build_pipe()
    pipe.params = _unflatten_params(npz)
    out_ddim, out_unipc, _, _ = run_golden(pipe, latents=npz["latents"], ids=npz["token_ids"])

    for name, got, want in [("ddim", out_ddim, npz["expected_ddim"]),
                            ("unipc", out_unipc, npz["expected_unipc"])]:
        if np.array_equal(got, want):
            continue
        err = float(np.abs(got - want).max())
        raise AssertionError(
            f"golden {name} output drifted (max abs err {err:.3e}). If the numeric "
            f"change is intentional, regenerate via python tools/make_golden.py and "
            f"commit the fixture with the change."
        )
