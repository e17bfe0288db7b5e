"""Round-trip coverage tests for the diffusers->flax UNet/VAE/ControlNet
converters: fabricate a diffusers-style state dict by inverse-mapping our own
init tree, convert it, and require the result to match the init tree exactly
(every param covered, every shape transposed correctly)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saspa_tpu.models.unet import UNet2DCondition, UNetConfig
from saspa_tpu.models.vae import AutoencoderKL, VAEConfig
from saspa_tpu.models.controlnet import ControlNet
from tools.convert_weights import convert_controlnet, convert_sd_unet, convert_vae

TINY = UNetConfig(
    block_out_channels=(32, 64),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=2,
    transformer_layers_per_block=(1, 1),
    num_attention_heads=(2, 2),
    cross_attention_dim=32,
)
TINY_VAE = VAEConfig(block_out_channels=(32, 64), layers_per_block=2)


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + k + "/"))
        else:
            out[prefix + k] = np.asarray(v)
    return out


def _flax_to_torch_key(flax_key: str):
    """Inverse of the converter's name mapping for UNet/VAE/ControlNet trees.
    Returns (torch_key, kind) with kind in {conv, dense, raw}."""
    k = flax_key
    leaf = k.rsplit("/", 1)[-1]

    # group norms: X/GroupNorm_0/scale -> X.weight
    if "/GroupNorm_0/" in k:
        base = k.split("/GroupNorm_0/")[0]
        suffix = "weight" if leaf == "scale" else "bias"
        return _path(base) + "." + suffix, "raw"
    # layer norms inside transformer blocks (norm1/2/3 at block level)
    if leaf in ("scale", "bias"):
        base = k.rsplit("/", 1)[0]
        suffix = "weight" if leaf == "scale" else "bias"
        return _path(base) + "." + suffix, "raw"
    if leaf == "kernel":
        base = k.rsplit("/", 1)[0]
        return _path(base) + ".weight", None  # conv/dense decided by shape
    if leaf == "bias":
        base = k.rsplit("/", 1)[0]
        return _path(base) + ".bias", "raw"
    raise AssertionError(f"unhandled flax key {flax_key}")


def _path(base: str) -> str:
    """flax module path -> diffusers dotted path."""
    parts = base.split("/")
    out = []
    for p in parts:
        if p.startswith("down_") and ("_resnets_" in p or "_attentions_" in p):
            _, i, kind, j = p.split("_")
            out.append(f"down_blocks.{i}.{kind}.{j}")
        elif p.startswith("up_") and ("_resnets_" in p or "_attentions_" in p):
            _, i, kind, j = p.split("_")
            out.append(f"up_blocks.{i}.{kind}.{j}")
        elif p.startswith("down_") and p.endswith("_downsample"):
            i = p.split("_")[1]
            out.append(f"down_blocks.{i}.downsamplers.0.conv")
        elif p.startswith("up_") and p.endswith("_upsample"):
            i = p.split("_")[1]
            out.append(f"up_blocks.{i}.upsamplers.0.conv")
        elif p == "mid_block":
            out.append("mid_block")
        elif p.startswith("resnets_"):
            out.append(f"resnets.{p.split('_')[1]}")
        elif p.startswith("attentions_"):
            out.append(f"attentions.{p.split('_')[1]}")
        elif p.startswith("blocks_") and out and out[-1] == "controlnet_cond_embedding":
            out.append(f"blocks.{p.split('_')[1]}")
        elif p.startswith("blocks_"):
            out.append(f"transformer_blocks.{p.split('_')[1]}")
        elif p == "conv" and out and out[-1].endswith("samplers.0.conv"):
            pass  # Downsample2D/Upsample2D's inner conv is already the path
        elif p == "to_out":
            out.append("to_out.0")
        elif p == "ff":
            out.append("ff")
        elif p == "proj_in" and out and out[-1] == "ff":
            out[-1] = "ff.net.0.proj"
        elif p == "proj_out" and out and out[-1] == "ff":
            out[-1] = "ff.net.2"
        elif p.startswith("controlnet_down_blocks_"):
            out.append(f"controlnet_down_blocks.{p.rsplit('_', 1)[1]}")
        elif p == "controlnet_cond_embedding":
            out.append("controlnet_cond_embedding")
        elif p.startswith("blocks_") and out and out[-1] == "controlnet_cond_embedding":
            out.append(f"blocks.{p.split('_')[1]}")
        else:
            out.append(p)
    return ".".join(out)


def _fabricate_torch_sd(flax_params, conv_rank4_names=()):
    """Walk the flax tree, emit torch-layout tensors under diffusers keys."""
    sd = {}
    flat = _flatten(flax_params)
    for k, v in flat.items():
        tk, kind = _flax_to_torch_key(k)
        if k.endswith("/kernel"):
            if v.ndim == 4:  # HWIO -> OIHW
                sd[tk] = np.transpose(v, (3, 2, 0, 1))
            else:  # (in, out) -> (out, in)
                sd[tk] = np.transpose(v, (1, 0))
        else:
            sd[tk] = v
    return sd


def _shapes(tree):
    return {k: v.shape for k, v in _flatten(tree).items()}


def test_unet_converter_full_coverage():
    unet = UNet2DCondition(cfg=TINY)
    init = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 32)),
    )["params"]
    sd = _fabricate_torch_sd(init)
    converted = convert_sd_unet(sd, TINY)
    assert _shapes(converted) == _shapes(init)
    out = unet.apply({"params": converted}, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 32)))
    assert out.shape == (1, 8, 8, 4)


def test_vae_converter_full_coverage():
    vae = AutoencoderKL(cfg=TINY_VAE)
    init = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]

    # vae paths: encoder/decoder prefixes map to diffusers top-levels
    def vae_key(k):
        k = k.replace("encoder/quant_conv", "quant_conv")
        k = k.replace("decoder/post_quant_conv", "post_quant_conv")
        for side in ("encoder", "decoder"):
            k = k.replace(f"{side}/mid_block_1", f"{side}/mid_block.resnets.0")
            k = k.replace(f"{side}/mid_block_2", f"{side}/mid_block.resnets.1")
            k = k.replace(f"{side}/mid_attn", f"{side}/mid_block.attentions.0")
        import re

        k = re.sub(r"encoder/down_(\d+)_block_(\d+)", r"encoder/down_blocks.\1.resnets.\2", k)
        k = re.sub(r"encoder/down_(\d+)_downsample", r"encoder/down_blocks.\1.downsamplers.0.conv", k)
        k = re.sub(r"decoder/up_(\d+)_block_(\d+)", r"decoder/up_blocks.\1.resnets.\2", k)
        k = re.sub(r"decoder/up_(\d+)_upsample", r"decoder/up_blocks.\1.upsamplers.0.conv", k)
        return k

    sd = {}
    for k, v in _flatten(init).items():
        k2 = vae_key(k)
        tk, _ = _flax_to_torch_key(k2)
        if k.endswith("/kernel"):
            sd[tk] = np.transpose(v, (3, 2, 0, 1)) if v.ndim == 4 else np.transpose(v, (1, 0))
        else:
            sd[tk] = v
    converted = convert_vae(sd, TINY_VAE)
    assert _shapes(converted) == _shapes(init)


def test_controlnet_converter_full_coverage():
    cn = ControlNet(cfg=TINY)
    init = cn.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 32)), jnp.zeros((1, 64, 64, 3)), 1.0,
    )["params"]
    sd = _fabricate_torch_sd(init)
    converted = convert_controlnet(sd, TINY)
    assert _shapes(converted) == _shapes(init)
