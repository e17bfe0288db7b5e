"""One-time weight converters: public torch checkpoints -> saspa_tpu params.

Covers the weight-porting inventory from SURVEY §7: SD1.5/2.1/SDXL UNet + VAE
+ CLIP text, ControlNet (canny/hed), OpenAI CLIP RN50, torchvision
resnet50/101 and inception_v3, the released WSDAN_CAL baseline .pth files,
LPIPS-alex, the controlnet_aux HED annotator, the LAVIS BLIP captioner, the
BLIP-Diffusion Q-Former, and the keytotext T5.

Conversions are pure tensor-name/layout mapping:
  * torch Conv2d OIHW  -> flax HWIO
  * torch Linear (out,in) -> flax (in,out)
  * BatchNorm -> {params:{scale,bias}, batch_stats:{mean,var}}

Usage (on a machine with the checkpoints; this zero-egress dev env has none):
  python tools/convert_weights.py unet  path/to/unet.safetensors  out_dir/sd_v1.5
  python tools/convert_weights.py cal   path/to/model.pth         checkpoints/planes
  python tools/convert_weights.py resnet path/to/resnet101.pth    out_dir/resnet101
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from typing import Dict

import numpy as np


# --------------------------------------------------------------------------
# primitives
# --------------------------------------------------------------------------
def t2f_conv(w: np.ndarray) -> np.ndarray:
    """torch conv kernel OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def t2f_linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _set(tree: dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value)


class _KeyRemapView:
    """Read-through view exposing a state dict under renamed key prefixes.
    A view (not a copy) so key-consumption audits see the original reads."""

    def __init__(self, sd, fwd_prefix_map: Dict[str, str]):
        self._sd = sd
        self._inv = {v: k for k, v in fwd_prefix_map.items()}

    def _src_key(self, k: str) -> str:
        parts = k.split(".")
        for cut in (2, 1):
            head = ".".join(parts[:cut])
            if head in self._inv:
                remapped = self._inv[head] + k[len(head):]
                # tolerate sources already using the target naming
                return remapped if remapped in self._sd else k
        return k

    def __getitem__(self, k):
        return self._sd[self._src_key(k)]

    def __contains__(self, k):
        return self._src_key(k) in self._sd


def load_state_dict(path: str, raw_obj=None) -> Dict[str, np.ndarray]:
    """`raw_obj`: pass an already-torch.load()ed object to avoid a second
    multi-hundred-MB pickle parse (the cal kind also reads feature_center
    from the same file)."""
    if raw_obj is None and str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    if raw_obj is None:
        import torch

        try:
            raw_obj = torch.load(path, map_location="cpu", weights_only=False)
        except Exception:
            # openai CLIP RN50.pt is a torch.jit archive torch.load refuses
            raw_obj = torch.jit.load(path, map_location="cpu")
    obj = raw_obj
    if hasattr(obj, "state_dict") and not isinstance(obj, dict):
        obj = obj.state_dict()  # ScriptModule / nn.Module
    # LAVIS checkpoints nest weights under 'model'; lightning/torch under
    # 'state_dict'; plain dicts pass through
    sd = obj.get("state_dict", obj.get("model", obj)) if isinstance(obj, dict) else obj
    out = {}
    for k, v in sd.items():
        k = k.replace("_orig_mod.", "")  # torch.compile prefix (dataset_utils.py:101-108)
        out[k] = v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


# --------------------------------------------------------------------------
# torchvision ResNet -> saspa_tpu.models.resnet.ResNet (features_only)
# --------------------------------------------------------------------------
def convert_torchvision_resnet(sd: Dict[str, np.ndarray], prefix: str = ""):
    """Returns (params, batch_stats) trees for ResNet(features_only=True)."""
    params: dict = {}
    stats: dict = {}

    def bn(src, dst):
        _set(params, f"{dst}/scale", sd[f"{src}.weight"])
        _set(params, f"{dst}/bias", sd[f"{src}.bias"])
        _set(stats, f"{dst}/mean", sd[f"{src}.running_mean"])
        _set(stats, f"{dst}/var", sd[f"{src}.running_var"])

    def conv(src, dst):
        _set(params, f"{dst}/kernel", t2f_conv(sd[f"{src}.weight"]))

    conv(f"{prefix}conv1", "conv1")
    bn(f"{prefix}bn1", "bn1")
    # stage sizes are derivable from the keys
    li = 1
    while f"{prefix}layer{li}.0.conv1.weight" in sd:
        bi = 0
        while f"{prefix}layer{li}.{bi}.conv1.weight" in sd:
            src = f"{prefix}layer{li}.{bi}"
            dst = f"layer{li}_{bi}"
            for c in ("conv1", "conv2", "conv3"):
                conv(f"{src}.{c}", f"{dst}/{c}")
            for b in ("bn1", "bn2", "bn3"):
                bn(f"{src}.{b}", f"{dst}/{b}")
            if f"{src}.downsample.0.weight" in sd:
                conv(f"{src}.downsample.0", f"{dst}/downsample_conv")
                bn(f"{src}.downsample.1", f"{dst}/downsample_bn")
            bi += 1
        li += 1
    return params, stats


# --------------------------------------------------------------------------
# WSDAN_CAL .pth -> saspa_tpu.models.cal.WSDAN_CAL
# --------------------------------------------------------------------------
def convert_cal(sd: Dict[str, np.ndarray], net: str = "resnet"):
    """Checkpoint layout per fgvc/train.py:287-304 / fgvc/util.py:196-203.

    ResNet nets: the reference's backbone is `get_features()` =
    nn.Sequential(conv1, bn1, relu, maxpool, layer1..layer4) (reference
    fgvc/models/resnet.py:168-178), so the saved keys are INDEX-named:
    features.0.* = conv1, features.1.* = bn1, features.4..7.* = layer1..4.
    Remap to attribute names, then reuse the torchvision converter.

    Inception nets (`net='inception_mixed_6e'/'inception_mixed_7c'`): the
    backbone is get_features_mixed_6e/7c (reference
    fgvc/models/inception.py:130-170), a Sequential whose parameterized
    members sit at indices {0,1,2,4,5,7..} (maxpools at 3 and 6 own no
    params); remap to the torchvision block names and reuse
    convert_inception.  mixed_7c has no attention conv in the forward
    (fgvc/models/cal.py:174-177) and our Flax init therefore owns no
    attentions_* params — those checkpoint keys are dropped."""
    if "inception" in net:
        truncate = "mixed_6e" if net == "inception_mixed_6e" else "mixed_7c"
        seq = ["Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3", None,
               "Conv2d_3b_1x1", "Conv2d_4a_3x3", None, "Mixed_5b", "Mixed_5c",
               "Mixed_5d", "Mixed_6a", "Mixed_6b", "Mixed_6c", "Mixed_6d",
               "Mixed_6e", "Mixed_7a", "Mixed_7b", "Mixed_7c"]
        backbone_sd = {}
        for k, v in dict(sd).items():
            if not k.startswith("features."):
                continue
            idx, rest = k.split(".", 2)[1], k.split(".", 2)[2]
            name = seq[int(idx)]
            assert name is not None, k
            backbone_sd[f"{name}.{rest}"] = v
        params: dict = {}
        stats: dict = {}
        in_params, in_stats = convert_inception(backbone_sd, truncate_at=truncate)
        params["features"] = in_params
        stats["features"] = in_stats
        if net != "inception_mixed_7c":
            _set(params, "attentions_conv/kernel", t2f_conv(sd["attentions.conv.weight"]))
            _set(params, "attentions_bn/scale", sd["attentions.bn.weight"])
            _set(params, "attentions_bn/bias", sd["attentions.bn.bias"])
            _set(stats, "attentions_bn/mean", sd["attentions.bn.running_mean"])
            _set(stats, "attentions_bn/var", sd["attentions.bn.running_var"])
        _set(params, "fc/kernel", t2f_linear(sd["fc.weight"]))
        return params, stats

    remap = {"features.0": "features.conv1", "features.1": "features.bn1",
             "features.4": "features.layer1", "features.5": "features.layer2",
             "features.6": "features.layer3", "features.7": "features.layer4"}
    sd = _KeyRemapView(sd, remap)
    params = {}
    stats = {}
    rn_params, rn_stats = convert_torchvision_resnet(sd, prefix="features.")
    params["features"] = rn_params
    stats["features"] = rn_stats
    # attentions: BasicConv2d conv+bn (fgvc/models/cal.py:159)
    _set(params, "attentions_conv/kernel", t2f_conv(sd["attentions.conv.weight"]))
    _set(params, "attentions_bn/scale", sd["attentions.bn.weight"])
    _set(params, "attentions_bn/bias", sd["attentions.bn.bias"])
    _set(stats, "attentions_bn/mean", sd["attentions.bn.running_mean"])
    _set(stats, "attentions_bn/var", sd["attentions.bn.running_var"])
    _set(params, "fc/kernel", t2f_linear(sd["fc.weight"]))
    return params, stats


# --------------------------------------------------------------------------
# diffusers UNet2DConditionModel -> saspa_tpu.models.unet.UNet2DCondition
# --------------------------------------------------------------------------
def convert_sd_unet(sd: Dict[str, np.ndarray], cfg=None, include_up: bool = True):
    from saspa_tpu.models.unet import SD15_UNET

    cfg = cfg or SD15_UNET
    p: dict = {}

    def conv(src, dst):
        _set(p, f"{dst}/kernel", t2f_conv(sd[f"{src}.weight"]))
        if f"{src}.bias" in sd:
            _set(p, f"{dst}/bias", sd[f"{src}.bias"])

    def dense(src, dst, bias=True):
        _set(p, f"{dst}/kernel", t2f_linear(sd[f"{src}.weight"]))
        if bias and f"{src}.bias" in sd:
            _set(p, f"{dst}/bias", sd[f"{src}.bias"])

    def norm(src, dst):
        _set(p, f"{dst}/GroupNorm_0/scale", sd[f"{src}.weight"])
        _set(p, f"{dst}/GroupNorm_0/bias", sd[f"{src}.bias"])

    def layernorm(src, dst):
        _set(p, f"{dst}/scale", sd[f"{src}.weight"])
        _set(p, f"{dst}/bias", sd[f"{src}.bias"])

    def resnet(src, dst):
        norm(f"{src}.norm1", f"{dst}/norm1")
        conv(f"{src}.conv1", f"{dst}/conv1")
        dense(f"{src}.time_emb_proj", f"{dst}/time_emb_proj")
        norm(f"{src}.norm2", f"{dst}/norm2")
        conv(f"{src}.conv2", f"{dst}/conv2")
        if f"{src}.conv_shortcut.weight" in sd:
            conv(f"{src}.conv_shortcut", f"{dst}/conv_shortcut")

    def attn(src, dst):
        dense(f"{src}.to_q", f"{dst}/to_q", bias=False)
        dense(f"{src}.to_k", f"{dst}/to_k", bias=False)
        dense(f"{src}.to_v", f"{dst}/to_v", bias=False)
        dense(f"{src}.to_out.0", f"{dst}/to_out")

    def transformer(src, dst, depth):
        norm(f"{src}.norm", f"{dst}/norm")
        if cfg.use_linear_projection:
            dense(f"{src}.proj_in", f"{dst}/proj_in")
            dense(f"{src}.proj_out", f"{dst}/proj_out")
        else:
            conv(f"{src}.proj_in", f"{dst}/proj_in")
            conv(f"{src}.proj_out", f"{dst}/proj_out")
        for i in range(depth):
            b_src = f"{src}.transformer_blocks.{i}"
            b_dst = f"{dst}/blocks_{i}"
            attn(f"{b_src}.attn1", f"{b_dst}/attn1")
            attn(f"{b_src}.attn2", f"{b_dst}/attn2")
            layernorm(f"{b_src}.norm1", f"{b_dst}/norm1")
            layernorm(f"{b_src}.norm2", f"{b_dst}/norm2")
            layernorm(f"{b_src}.norm3", f"{b_dst}/norm3")
            dense(f"{b_src}.ff.net.0.proj", f"{b_dst}/ff/proj_in")
            dense(f"{b_src}.ff.net.2", f"{b_dst}/ff/proj_out")

    conv("conv_in", "conv_in")
    dense("time_embedding.linear_1", "time_embedding/linear_1")
    dense("time_embedding.linear_2", "time_embedding/linear_2")
    if cfg.addition_embed_type == "text_time":
        dense("add_embedding.linear_1", "add_embedding/linear_1")
        dense("add_embedding.linear_2", "add_embedding/linear_2")

    n_blocks = len(cfg.block_out_channels)
    for i, btype in enumerate(cfg.down_block_types):
        depth = cfg.transformer_layers_per_block[min(i, len(cfg.transformer_layers_per_block) - 1)]
        for j in range(cfg.layers_per_block):
            resnet(f"down_blocks.{i}.resnets.{j}", f"down_{i}_resnets_{j}")
            if btype == "CrossAttnDownBlock2D":
                transformer(f"down_blocks.{i}.attentions.{j}", f"down_{i}_attentions_{j}", depth)
        if i < n_blocks - 1:
            conv(f"down_blocks.{i}.downsamplers.0.conv", f"down_{i}_downsample/conv")

    resnet("mid_block.resnets.0", "mid_block/resnets_0")
    transformer("mid_block.attentions.0", "mid_block/attentions_0", cfg.transformer_layers_per_block[-1])
    resnet("mid_block.resnets.1", "mid_block/resnets_1")

    if not include_up:  # ControlNet: encoder + mid only, no up blocks/out head
        return p

    for i, btype in enumerate(cfg.up_block_types):
        block_idx = n_blocks - 1 - i
        depth = cfg.transformer_layers_per_block[min(block_idx, len(cfg.transformer_layers_per_block) - 1)]
        for j in range(cfg.layers_per_block + 1):
            resnet(f"up_blocks.{i}.resnets.{j}", f"up_{i}_resnets_{j}")
            if btype == "CrossAttnUpBlock2D":
                transformer(f"up_blocks.{i}.attentions.{j}", f"up_{i}_attentions_{j}", depth)
        if i < len(cfg.up_block_types) - 1:
            conv(f"up_blocks.{i}.upsamplers.0.conv", f"up_{i}_upsample/conv")

    norm("conv_norm_out", "conv_norm_out")
    conv("conv_out", "conv_out")
    return p


def convert_controlnet(sd: Dict[str, np.ndarray], cfg=None):
    """diffusers ControlNetModel -> saspa_tpu.models.controlnet.ControlNet.
    The encoder keys share diffusers' UNet naming; include_up=False keeps the
    UNet converter from looking for up blocks / output head."""
    p = convert_sd_unet(sd, cfg, include_up=False)

    def conv(src, dst):
        _set(p, f"{dst}/kernel", t2f_conv(sd[f"{src}.weight"]))
        _set(p, f"{dst}/bias", sd[f"{src}.bias"])

    conv("controlnet_cond_embedding.conv_in", "controlnet_cond_embedding/conv_in")
    i = 0
    while f"controlnet_cond_embedding.blocks.{i}.weight" in sd:
        conv(f"controlnet_cond_embedding.blocks.{i}", f"controlnet_cond_embedding/blocks_{i}")
        i += 1
    conv("controlnet_cond_embedding.conv_out", "controlnet_cond_embedding/conv_out")
    i = 0
    while f"controlnet_down_blocks.{i}.weight" in sd:
        conv(f"controlnet_down_blocks.{i}", f"controlnet_down_blocks_{i}")
        i += 1
    conv("controlnet_mid_block", "controlnet_mid_block")
    return p


# --------------------------------------------------------------------------
# diffusers VAE -> saspa_tpu.models.vae.AutoencoderKL
# --------------------------------------------------------------------------
def convert_vae(sd: Dict[str, np.ndarray], cfg=None):
    from saspa_tpu.models.vae import SD_VAE

    cfg = cfg or SD_VAE
    p: dict = {}

    def conv(src, dst):
        _set(p, f"{dst}/kernel", t2f_conv(sd[f"{src}.weight"]))
        _set(p, f"{dst}/bias", sd[f"{src}.bias"])

    def norm(src, dst):
        _set(p, f"{dst}/GroupNorm_0/scale", sd[f"{src}.weight"])
        _set(p, f"{dst}/GroupNorm_0/bias", sd[f"{src}.bias"])

    def res(src, dst):
        norm(f"{src}.norm1", f"{dst}/norm1")
        conv(f"{src}.conv1", f"{dst}/conv1")
        norm(f"{src}.norm2", f"{dst}/norm2")
        conv(f"{src}.conv2", f"{dst}/conv2")
        if f"{src}.conv_shortcut.weight" in sd:
            conv(f"{src}.conv_shortcut", f"{dst}/conv_shortcut")

    def attnblock(src, dst):
        norm(f"{src}.group_norm", f"{dst}/group_norm")
        # pre-0.18 diffusers exports (the 2022 SD1.5 / ip2p VAE files) use the
        # legacy AttentionBlock naming query/key/value/proj_attn; post-0.18
        # exports (sdxl-vae-fp16-fix) use to_q/to_k/to_v/to_out.0
        legacy = f"{src}.query.weight" in sd
        pairs = (
            (("query", "to_q"), ("key", "to_k"), ("value", "to_v")) if legacy
            else (("to_q", "to_q"), ("to_k", "to_k"), ("to_v", "to_v"))
        )
        for a, b in pairs:
            _set(p, f"{dst}/{b}/kernel", t2f_linear(sd[f"{src}.{a}.weight"]))
            _set(p, f"{dst}/{b}/bias", sd[f"{src}.{a}.bias"])
        out_src = f"{src}.proj_attn" if legacy else f"{src}.to_out.0"
        _set(p, f"{dst}/to_out/kernel", t2f_linear(sd[f"{out_src}.weight"]))
        _set(p, f"{dst}/to_out/bias", sd[f"{out_src}.bias"])

    n = len(cfg.block_out_channels)
    # encoder
    conv("encoder.conv_in", "encoder/conv_in")
    for i in range(n):
        for j in range(cfg.layers_per_block):
            res(f"encoder.down_blocks.{i}.resnets.{j}", f"encoder/down_{i}_block_{j}")
        if i < n - 1:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", f"encoder/down_{i}_downsample")
    res("encoder.mid_block.resnets.0", "encoder/mid_block_1")
    attnblock("encoder.mid_block.attentions.0", "encoder/mid_attn")
    res("encoder.mid_block.resnets.1", "encoder/mid_block_2")
    norm("encoder.conv_norm_out", "encoder/conv_norm_out")
    conv("encoder.conv_out", "encoder/conv_out")
    conv("quant_conv", "encoder/quant_conv")
    # decoder
    conv("post_quant_conv", "decoder/post_quant_conv")
    conv("decoder.conv_in", "decoder/conv_in")
    res("decoder.mid_block.resnets.0", "decoder/mid_block_1")
    attnblock("decoder.mid_block.attentions.0", "decoder/mid_attn")
    res("decoder.mid_block.resnets.1", "decoder/mid_block_2")
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            res(f"decoder.up_blocks.{i}.resnets.{j}", f"decoder/up_{i}_block_{j}")
        if i < n - 1:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", f"decoder/up_{i}_upsample")
    norm("decoder.conv_norm_out", "decoder/conv_norm_out")
    conv("decoder.conv_out", "decoder/conv_out")
    return p


# --------------------------------------------------------------------------
# HF CLIPTextModel -> saspa_tpu.models.text_encoder.CLIPTextEncoder
# --------------------------------------------------------------------------
def convert_clip_text_hf(sd: Dict[str, np.ndarray], num_layers: int):
    p: dict = {}
    pre = "text_model."
    _set(p, "token_embedding/embedding", sd[f"{pre}embeddings.token_embedding.weight"])
    p["positional_embedding"] = np.asarray(sd[f"{pre}embeddings.position_embedding.weight"])
    for i in range(num_layers):
        src = f"{pre}encoder.layers.{i}"
        dst = f"resblocks_{i}"
        # fuse q/k/v into one qkv projection (our layout)
        qw = sd[f"{src}.self_attn.q_proj.weight"]
        kw = sd[f"{src}.self_attn.k_proj.weight"]
        vw = sd[f"{src}.self_attn.v_proj.weight"]
        qb = sd[f"{src}.self_attn.q_proj.bias"]
        kb = sd[f"{src}.self_attn.k_proj.bias"]
        vb = sd[f"{src}.self_attn.v_proj.bias"]
        _set(p, f"{dst}/attn_qkv/kernel", t2f_linear(np.concatenate([qw, kw, vw], axis=0)))
        _set(p, f"{dst}/attn_qkv/bias", np.concatenate([qb, kb, vb]))
        _set(p, f"{dst}/attn_out/kernel", t2f_linear(sd[f"{src}.self_attn.out_proj.weight"]))
        _set(p, f"{dst}/attn_out/bias", sd[f"{src}.self_attn.out_proj.bias"])
        _set(p, f"{dst}/ln_1/scale", sd[f"{src}.layer_norm1.weight"])
        _set(p, f"{dst}/ln_1/bias", sd[f"{src}.layer_norm1.bias"])
        _set(p, f"{dst}/ln_2/scale", sd[f"{src}.layer_norm2.weight"])
        _set(p, f"{dst}/ln_2/bias", sd[f"{src}.layer_norm2.bias"])
        _set(p, f"{dst}/mlp_fc/kernel", t2f_linear(sd[f"{src}.mlp.fc1.weight"]))
        _set(p, f"{dst}/mlp_fc/bias", sd[f"{src}.mlp.fc1.bias"])
        _set(p, f"{dst}/mlp_proj/kernel", t2f_linear(sd[f"{src}.mlp.fc2.weight"]))
        _set(p, f"{dst}/mlp_proj/bias", sd[f"{src}.mlp.fc2.bias"])
    _set(p, "ln_final/scale", sd[f"{pre}final_layer_norm.weight"])
    _set(p, "ln_final/bias", sd[f"{pre}final_layer_norm.bias"])
    if "text_projection.weight" in sd:
        _set(p, "text_projection/kernel", t2f_linear(sd["text_projection.weight"]))
    return p


# --------------------------------------------------------------------------
# OpenAI CLIP RN50 -> saspa_tpu.models.clip.CLIPModel
# --------------------------------------------------------------------------
def convert_clip_rn50(sd: Dict[str, np.ndarray]):
    """OpenAI clip naming (visual.* / transformer.resblocks.*)."""
    params: dict = {}
    stats: dict = {}

    def bn(src, dst):
        _set(params, f"visual/{dst}/scale", sd[f"visual.{src}.weight"])
        _set(params, f"visual/{dst}/bias", sd[f"visual.{src}.bias"])
        _set(stats, f"visual/{dst}/mean", sd[f"visual.{src}.running_mean"])
        _set(stats, f"visual/{dst}/var", sd[f"visual.{src}.running_var"])

    def conv(src, dst):
        _set(params, f"visual/{dst}/kernel", t2f_conv(sd[f"visual.{src}.weight"]))

    for i in (1, 2, 3):
        conv(f"conv{i}", f"conv{i}")
        bn(f"bn{i}", f"bn{i}")
    li = 1
    while f"visual.layer{li}.0.conv1.weight" in sd:
        bi = 0
        while f"visual.layer{li}.{bi}.conv1.weight" in sd:
            src, dst = f"layer{li}.{bi}", f"layer{li}_{bi}"
            for c in (1, 2, 3):
                conv(f"{src}.conv{c}", f"{dst}/conv{c}")
                bn(f"{src}.bn{c}", f"{dst}/bn{c}")
            if f"visual.{src}.downsample.0.weight" in sd:
                # OpenAI order: avgpool(-1), conv(0), bn(1)
                conv(f"{src}.downsample.0", f"{dst}/downsample_conv")
                bn(f"{src}.downsample.1", f"{dst}/downsample_bn")
            bi += 1
        li += 1
    # attnpool
    params["visual"]["attnpool"] = {}
    params["visual"]["attnpool"]["positional_embedding"] = np.asarray(sd["visual.attnpool.positional_embedding"])
    for name in ("q_proj", "k_proj", "v_proj", "c_proj"):
        _set(params, f"visual/attnpool/{name}/kernel", t2f_linear(sd[f"visual.attnpool.{name}.weight"]))
        _set(params, f"visual/attnpool/{name}/bias", sd[f"visual.attnpool.{name}.bias"])

    # text tower (OpenAI naming): in_proj fused already
    text: dict = {}
    _set(text, "token_embedding/embedding", sd["token_embedding.weight"])
    text["positional_embedding"] = np.asarray(sd["positional_embedding"])
    i = 0
    while f"transformer.resblocks.{i}.attn.in_proj_weight" in sd:
        src, dst = f"transformer.resblocks.{i}", f"resblocks_{i}"
        _set(text, f"{dst}/attn_qkv/kernel", t2f_linear(sd[f"{src}.attn.in_proj_weight"]))
        _set(text, f"{dst}/attn_qkv/bias", sd[f"{src}.attn.in_proj_bias"])
        _set(text, f"{dst}/attn_out/kernel", t2f_linear(sd[f"{src}.attn.out_proj.weight"]))
        _set(text, f"{dst}/attn_out/bias", sd[f"{src}.attn.out_proj.bias"])
        _set(text, f"{dst}/ln_1/scale", sd[f"{src}.ln_1.weight"])
        _set(text, f"{dst}/ln_1/bias", sd[f"{src}.ln_1.bias"])
        _set(text, f"{dst}/ln_2/scale", sd[f"{src}.ln_2.weight"])
        _set(text, f"{dst}/ln_2/bias", sd[f"{src}.ln_2.bias"])
        _set(text, f"{dst}/mlp_fc/kernel", t2f_linear(sd[f"{src}.mlp.c_fc.weight"]))
        _set(text, f"{dst}/mlp_fc/bias", sd[f"{src}.mlp.c_fc.bias"])
        _set(text, f"{dst}/mlp_proj/kernel", t2f_linear(sd[f"{src}.mlp.c_proj.weight"]))
        _set(text, f"{dst}/mlp_proj/bias", sd[f"{src}.mlp.c_proj.bias"])
        i += 1
    _set(text, "ln_final/scale", sd["ln_final.weight"])
    _set(text, "ln_final/bias", sd["ln_final.bias"])
    _set(text, "text_projection/kernel", np.asarray(sd["text_projection"]))  # already (width, out)
    params["text"] = text
    # reshape(()): the flax param is 0-d; safetensors-roundtripped sources
    # (the weights-day rehearsal) promote torch's 0-d scalar to shape (1,)
    params["logit_scale"] = np.asarray(sd["logit_scale"]).reshape(())
    return params, stats


# --------------------------------------------------------------------------
# LPIPS alexnet
# --------------------------------------------------------------------------
def convert_lpips(sd: Dict[str, np.ndarray]):
    """lpips.LPIPS(net='alex').state_dict() layout: the alexnet convs live in
    net.slice{1..5} Sequentials that KEEP torchvision's feature indices
    (slice1.0, slice2.3, slice3.6, slice4.8, slice5.10 — lpips
    pretrained_networks.py add_module(str(x))), the linear heads in
    lin{i}.model.1 (Dropout, Conv2d), plus scaling_layer.{shift,scale}
    buffers.  A bare torchvision alexnet dump (net.features.{idx}) is also
    accepted."""
    p: dict = {}
    slice_map = {"conv1": ("net.slice1.0", "net.features.0"),
                 "conv2": ("net.slice2.3", "net.features.3"),
                 "conv3": ("net.slice3.6", "net.features.6"),
                 "conv4": ("net.slice4.8", "net.features.8"),
                 "conv5": ("net.slice5.10", "net.features.10")}
    for dst, srcs in slice_map.items():
        src = next(s for s in srcs if f"{s}.weight" in sd)
        _set(p, f"alex/{dst}/kernel", t2f_conv(sd[f"{src}.weight"]))
        _set(p, f"alex/{dst}/bias", sd[f"{src}.bias"])
    for i in range(5):
        _set(p, f"lin{i}/kernel", t2f_conv(sd[f"lin{i}.model.1.weight"]))
    # scaling_layer shift/scale are hardcoded constants in models/lpips.py;
    # verify the checkpoint agrees rather than silently ignoring the buffers
    if "scaling_layer.shift" in sd:
        from saspa_tpu.models.lpips import _SCALE, _SHIFT

        np.testing.assert_allclose(np.ravel(sd["scaling_layer.shift"]), _SHIFT, atol=1e-3)
        np.testing.assert_allclose(np.ravel(sd["scaling_layer.scale"]), _SCALE, atol=1e-3)
    return p


# --------------------------------------------------------------------------
# LAVIS blip_caption (base_coco) -> saspa_tpu.models.blip_caption.BlipCaptioner
# --------------------------------------------------------------------------
def _convert_blip_vit(sd: Dict[str, np.ndarray], p: dict, layers: int):
    """LAVIS timm-ViT visual_encoder.* -> BlipViT tree (shared by the
    captioner and blip_vqa converters)."""

    def dense(src, dst):
        _set(p, f"{dst}/kernel", t2f_linear(sd[f"{src}.weight"]))
        _set(p, f"{dst}/bias", sd[f"{src}.bias"])

    def ln(src, dst):
        _set(p, f"{dst}/scale", sd[f"{src}.weight"])
        _set(p, f"{dst}/bias", sd[f"{src}.bias"])

    ve, v = "visual_encoder", "visual_encoder"
    p.setdefault(v, {})
    p[v]["cls_token"] = np.asarray(sd[f"{ve}.cls_token"])
    p[v]["pos_embed"] = np.asarray(sd[f"{ve}.pos_embed"])
    _set(p, f"{v}/patch_embed/kernel", t2f_conv(sd[f"{ve}.patch_embed.proj.weight"]))
    _set(p, f"{v}/patch_embed/bias", sd[f"{ve}.patch_embed.proj.bias"])
    for i in range(layers):
        src, dst = f"{ve}.blocks.{i}", f"{v}/blocks_{i}"
        ln(f"{src}.norm1", f"{dst}/norm1")
        dense(f"{src}.attn.qkv", f"{dst}/attn_qkv")
        dense(f"{src}.attn.proj", f"{dst}/attn_proj")
        ln(f"{src}.norm2", f"{dst}/norm2")
        dense(f"{src}.mlp.fc1", f"{dst}/mlp_fc1")
        dense(f"{src}.mlp.fc2", f"{dst}/mlp_fc2")
    ln(f"{ve}.norm", f"{v}/norm")


def _convert_blip_bert(sd: Dict[str, np.ndarray], p: dict, src_root: str,
                       dst_root: str, layers: int):
    """med.py BertModel (embeddings + layers with self+cross attention) ->
    BlipTextDecoder/BlipTextEncoder body tree."""

    def dense(src, dst):
        _set(p, f"{dst}/kernel", t2f_linear(sd[f"{src}.weight"]))
        _set(p, f"{dst}/bias", sd[f"{src}.bias"])

    def ln(src, dst):
        _set(p, f"{dst}/scale", sd[f"{src}.weight"])
        _set(p, f"{dst}/bias", sd[f"{src}.bias"])

    tb, t = src_root, dst_root
    _set(p, f"{t}/word_embeddings/embedding", sd[f"{tb}.embeddings.word_embeddings.weight"])
    _set(p, f"{t}/position_embeddings", sd[f"{tb}.embeddings.position_embeddings.weight"])
    _set(p, f"{t}/token_type_embeddings", sd[f"{tb}.embeddings.token_type_embeddings.weight"])
    ln(f"{tb}.embeddings.LayerNorm", f"{t}/embeddings_ln")
    for i in range(layers):
        src, dst = f"{tb}.encoder.layer.{i}", f"{t}/layer_{i}"
        for kind, pre in (("attention", "self"), ("crossattention", "cross")):
            dense(f"{src}.{kind}.self.query", f"{dst}/{pre}_query")
            dense(f"{src}.{kind}.self.key", f"{dst}/{pre}_key")
            dense(f"{src}.{kind}.self.value", f"{dst}/{pre}_value")
            dense(f"{src}.{kind}.output.dense", f"{dst}/{pre}_out_dense")
            ln(f"{src}.{kind}.output.LayerNorm", f"{dst}/{pre}_out_ln")
        dense(f"{src}.intermediate.dense", f"{dst}/intermediate_dense")
        dense(f"{src}.output.dense", f"{dst}/output_dense")
        ln(f"{src}.output.LayerNorm", f"{dst}/output_ln")


def _convert_blip_mlm_head(sd: Dict[str, np.ndarray], p: dict, src_root: str, dst_root: str):
    t = dst_root

    def dense(src, dst):
        _set(p, f"{dst}/kernel", t2f_linear(sd[f"{src}.weight"]))
        _set(p, f"{dst}/bias", sd[f"{src}.bias"])

    def ln(src, dst):
        _set(p, f"{dst}/scale", sd[f"{src}.weight"])
        _set(p, f"{dst}/bias", sd[f"{src}.bias"])

    dense(f"{src_root}.cls.predictions.transform.dense", f"{t}/transform_dense")
    ln(f"{src_root}.cls.predictions.transform.LayerNorm", f"{t}/transform_ln")
    _set(p, f"{t}/decoder/kernel", t2f_linear(sd[f"{src_root}.cls.predictions.decoder.weight"]))
    # HF ties cls.predictions.bias to decoder.bias; either key carries it
    bias_key = f"{src_root}.cls.predictions.bias" if f"{src_root}.cls.predictions.bias" in sd \
        else f"{src_root}.cls.predictions.decoder.bias"
    _set(p, f"{t}/decoder/bias", sd[bias_key])
    if bias_key.endswith("predictions.bias") and f"{src_root}.cls.predictions.decoder.bias" in sd:
        np.testing.assert_array_equal(sd[f"{src_root}.cls.predictions.decoder.bias"], sd[bias_key])


def convert_blip_caption(sd: Dict[str, np.ndarray], vit_layers: int = 12, text_layers: int = 12):
    """LAVIS checkpoint layout (the reference's captioner,
    prompts_engineering/blip_utils.py:34): visual_encoder.* is a timm ViT
    (fused qkv), text_decoder.bert.* a BERT decoder with cross-attention,
    text_decoder.cls.predictions.* the MLM head."""
    p: dict = {}
    _convert_blip_vit(sd, p, vit_layers)
    _convert_blip_bert(sd, p, "text_decoder.bert", "text_decoder", text_layers)
    _convert_blip_mlm_head(sd, p, "text_decoder", "text_decoder")
    return p


def convert_blip_vqa(sd: Dict[str, np.ndarray], vit_layers: int = 12, text_layers: int = 12):
    """LAVIS blip_vqa (vqav2) layout (the reference's VQA model,
    prompts_engineering/blip_utils.py:35): visual_encoder.* timm ViT @480²,
    text_encoder.* a med.BertModel question encoder (cross-attention every
    layer, no .bert. wrapper), text_decoder.bert.* + text_decoder.cls.* the
    answer decoder.  (Momentum copies in pretraining checkpoints are dropped
    by the CLI before this runs; the vqav2 finetune has none.)"""
    p: dict = {}
    _convert_blip_vit(sd, p, vit_layers)
    _convert_blip_bert(sd, p, "text_encoder", "text_encoder", text_layers)
    _convert_blip_bert(sd, p, "text_decoder.bert", "text_decoder", text_layers)
    _convert_blip_mlm_head(sd, p, "text_decoder", "text_decoder")
    return p


def convert_inception(sd: Dict[str, np.ndarray], truncate_at: str = "mixed_7c"):
    """torchvision inception_v3 state dict -> InceptionV3Features trees.
    Module names mirror torchvision (Conv2d_1a_3x3, Mixed_5b..Mixed_7c,
    branch1x1/branch5x5_N/...), so the walk is key-driven.  AuxLogits.* and
    fc.* belong to the classification head the WS-DAN truncations drop
    (reference fgvc/models/inception.py:130-170) and are skipped."""
    params: dict = {}
    stats: dict = {}
    upto_6e = ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3", "Conv2d_3b_1x1",
               "Conv2d_4a_3x3", "Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
               "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e")
    blocks = upto_6e if truncate_at == "mixed_6e" else upto_6e + ("Mixed_7a", "Mixed_7b", "Mixed_7c")

    consumed = 0
    for key in sd:
        root = key.split(".")[0]
        if root in ("AuxLogits", "fc"):
            continue
        if root not in blocks:
            if truncate_at == "mixed_6e" and root.startswith("Mixed_7"):
                continue  # beyond the truncation point
            raise KeyError(f"unexpected inception key {key}")
        # key = <Block>[.<branch>].conv.weight | .bn.{weight,bias,running_*}
        parts = key.split(".")
        dst = "/".join(parts[:-2])
        leaf, field = parts[-2], parts[-1]
        if leaf == "conv":
            assert field == "weight"
            _set(params, f"{dst}/conv/kernel", t2f_conv(sd[key]))
        elif leaf == "bn":
            tgt = {"weight": (params, "scale"), "bias": (params, "bias"),
                   "running_mean": (stats, "mean"), "running_var": (stats, "var")}
            if field == "num_batches_tracked":
                continue
            tree, name = tgt[field]
            _set(tree, f"{dst}/bn/{name}", sd[key])
        else:
            raise KeyError(f"unexpected inception leaf {key}")
        consumed += 1
    assert consumed, "empty state dict"
    return params, stats


def convert_hed(sd: Dict[str, np.ndarray]):
    """controlnet_aux ControlNetHED_Apache2 layout (lllyasviel/Annotators
    ControlNetHED.pth): `norm` (1,3,1,1) learned input offset,
    blockN.convs.M.{weight,bias}, blockN.projection.{weight,bias}."""
    p: dict = {}
    p["norm"] = np.asarray(sd["norm"]).reshape(1, 1, 1, 3)
    n_convs = (2, 2, 3, 3, 3)
    for bi, n in enumerate(n_convs, start=1):
        for ci in range(n):
            src = f"block{bi}.convs.{ci}"
            dst = f"block{bi}_conv{ci + 1}"
            _set(p, f"{dst}/kernel", t2f_conv(sd[f"{src}.weight"]))
            _set(p, f"{dst}/bias", sd[f"{src}.bias"])
        _set(p, f"block{bi}_projection/kernel", t2f_conv(sd[f"block{bi}.projection.weight"]))
        _set(p, f"block{bi}_projection/bias", sd[f"block{bi}.projection.bias"])
    return p


def convert_blip_diffusion_qformer(sd: Dict[str, np.ndarray], layers: int = 12,
                                   cross_freq: int = 2):
    """BLIP-Diffusion Q-Former (diffusers Blip2QFormerModel / LAVIS BertModel
    naming, both BERT-derived): query_tokens, embeddings.{word,position}
    (+LayerNorm) or the query-only top-level `layernorm`,
    encoder.layer.N.{attention,crossattention}.attention.{query,key,value} +
    .output.{dense,LayerNorm}, intermediate_query/output_query (query FFN),
    intermediate/output (text FFN), proj_layer.{dense1,dense2,LayerNorm}."""
    p: dict = {}

    def dense(src, dst):
        _set(p, f"{dst}/kernel", t2f_linear(sd[f"{src}.weight"]))
        _set(p, f"{dst}/bias", sd[f"{src}.bias"])

    def ln(src, dst):
        _set(p, f"{dst}/scale", sd[f"{src}.weight"])
        _set(p, f"{dst}/bias", sd[f"{src}.bias"])

    p["query_tokens"] = np.asarray(sd["query_tokens"])
    if "embeddings.word_embeddings.weight" in sd:
        _set(p, "word_embeddings/embedding", sd["embeddings.word_embeddings.weight"])
        p["position_embeddings"] = np.asarray(sd["embeddings.position_embeddings.weight"])
        ln("embeddings.LayerNorm", "embeddings_ln")
    else:  # transformers' query-only Blip2QFormerModel
        ln("layernorm", "embeddings_ln")

    for i in range(layers):
        src = f"encoder.layer.{i}"
        dst = f"layer_{i}"
        for m in ("query", "key", "value"):
            dense(f"{src}.attention.attention.{m}", f"{dst}/self_{m}")
        dense(f"{src}.attention.output.dense", f"{dst}/self_out_dense")
        ln(f"{src}.attention.output.LayerNorm", f"{dst}/self_out_ln")
        if i % cross_freq == 0:
            for m in ("query", "key", "value"):
                dense(f"{src}.crossattention.attention.{m}", f"{dst}/cross_{m}")
            dense(f"{src}.crossattention.output.dense", f"{dst}/cross_out_dense")
            ln(f"{src}.crossattention.output.LayerNorm", f"{dst}/cross_out_ln")
        dense(f"{src}.intermediate_query.dense", f"{dst}/ffn_q_fc")
        dense(f"{src}.output_query.dense", f"{dst}/ffn_q_proj")
        ln(f"{src}.output_query.LayerNorm", f"{dst}/ffn_q_ln")
        if f"{src}.intermediate.dense.weight" in sd:  # text branch (LAVIS/diffusers)
            dense(f"{src}.intermediate.dense", f"{dst}/ffn_t_fc")
            dense(f"{src}.output.dense", f"{dst}/ffn_t_proj")
            ln(f"{src}.output.LayerNorm", f"{dst}/ffn_t_ln")
    if "proj_layer.dense1.weight" in sd:
        dense("proj_layer.dense1", "proj_dense1")
        dense("proj_layer.dense2", "proj_dense2")
        ln("proj_layer.LayerNorm", "proj_ln")
    return p


def convert_blip_diffusion_vision(sd: Dict[str, np.ndarray], layers: int = 24):
    """BLIP-Diffusion vision tower (CLIP ViT-L/14) -> models.clip.CLIPVisionViT.

    The diffusers blipdiffusion export carries it INSIDE the qformer
    checkpoint as `vision_model.*` (diffusers blip_diffusion/modeling_blip2.py
    Blip2QFormerModel owns the visual encoder); LAVIS exports it as
    `visual_encoder.*` in CLIP naming.  Handles both: transformers-Blip2
    merged `self_attn.qkv` + `projection`, and CLIP split
    `attn.{q,k,v,out}_proj` / `q_proj`-style keys."""
    pref = "vision_model" if any(k.startswith("vision_model.") for k in sd) else "visual_encoder"
    g = _KeyRemapView(sd, {f"{pref}.{tail}": tail for tail in (
        "embeddings", "encoder", "pre_layernorm", "post_layernorm")})
    p: dict = {}

    def dense(src, dst):
        _set(p, f"{dst}/kernel", t2f_linear(g[f"{src}.weight"]))
        _set(p, f"{dst}/bias", g[f"{src}.bias"])

    def ln(src, dst):
        _set(p, f"{dst}/scale", g[f"{src}.weight"])
        _set(p, f"{dst}/bias", g[f"{src}.bias"])

    _set(p, "patch_embed/kernel", t2f_conv(g["embeddings.patch_embedding.weight"]))
    p["class_embedding"] = np.asarray(g["embeddings.class_embedding"]).reshape(-1)
    pos = np.asarray(g["embeddings.position_embedding"])
    p["positional_embedding"] = pos.reshape(pos.shape[-2], pos.shape[-1])
    ln("pre_layernorm", "ln_pre")
    for i in range(layers):
        src = f"encoder.layers.{i}"
        dst = f"blk_{i}"
        ln(f"{src}.layer_norm1", f"{dst}_ln1")
        if f"{src}.self_attn.qkv.weight" in g:  # transformers Blip2 merged qkv
            w = np.asarray(g[f"{src}.self_attn.qkv.weight"])
            b = np.asarray(g[f"{src}.self_attn.qkv.bias"])
            width = w.shape[1]
            for j, m in enumerate(("q", "k", "v")):
                _set(p, f"{dst}_{m}/kernel", t2f_linear(w[j * width:(j + 1) * width]))
                _set(p, f"{dst}_{m}/bias", b[j * width:(j + 1) * width])
            dense(f"{src}.self_attn.projection", f"{dst}_attn_out")
        else:  # CLIP split naming
            for m in ("q", "k", "v"):
                dense(f"{src}.self_attn.{m}_proj", f"{dst}_{m}")
            dense(f"{src}.self_attn.out_proj", f"{dst}_attn_out")
        ln(f"{src}.layer_norm2", f"{dst}_ln2")
        dense(f"{src}.mlp.fc1", f"{dst}_mlp_fc")
        dense(f"{src}.mlp.fc2", f"{dst}_mlp_proj")
    ln("post_layernorm", "ln_post")
    return p


def convert_t5(sd: Dict[str, np.ndarray], layers: int = 12):
    """HF T5ForConditionalGeneration layout (the reference's keytotext model
    mrm8488/t5-base-finetuned-common_gen, prompts_engineering/
    txt2sentance_prompts.py:97-99): shared.weight (tied lm_head),
    {encoder,decoder}.block.N.layer.K.{SelfAttention,EncDecAttention,
    DenseReluDense}.*, scale-only T5 layer norms, relative_attention_bias
    only on block 0."""
    p: dict = {}

    def dense(src, dst):
        _set(p, f"{dst}/kernel", t2f_linear(sd[f"{src}.weight"]))

    def rms(src, dst):
        _set(p, f"{dst}/weight", sd[f"{src}.weight"])

    _set(p, "shared/embedding", sd["shared.weight"])

    def attn(src, dst, rel_bias: bool):
        for m in ("q", "k", "v", "o"):
            dense(f"{src}.{m}", f"{dst}/{m}")
        if rel_bias:
            _set(p, f"{dst}/relative_attention_bias",
                 np.asarray(sd[f"{src}.relative_attention_bias.weight"]))

    for i in range(layers):
        src = f"encoder.block.{i}"
        dst = f"encoder/block_{i}"
        rms(f"{src}.layer.0.layer_norm", f"{dst}_ln0")
        attn(f"{src}.layer.0.SelfAttention", f"{dst}_attn", rel_bias=(i == 0))
        rms(f"{src}.layer.1.layer_norm", f"{dst}_ffn/layer_norm")
        dense(f"{src}.layer.1.DenseReluDense.wi", f"{dst}_ffn/wi")
        dense(f"{src}.layer.1.DenseReluDense.wo", f"{dst}_ffn/wo")
    rms("encoder.final_layer_norm", "encoder/final_ln")

    for i in range(layers):
        src = f"decoder.block.{i}"
        dst = f"decoder/block_{i}"
        rms(f"{src}.layer.0.layer_norm", f"{dst}_ln0")
        attn(f"{src}.layer.0.SelfAttention", f"{dst}_self", rel_bias=(i == 0))
        rms(f"{src}.layer.1.layer_norm", f"{dst}_ln1")
        attn(f"{src}.layer.1.EncDecAttention", f"{dst}_cross", rel_bias=False)
        rms(f"{src}.layer.2.layer_norm", f"{dst}_ffn/layer_norm")
        dense(f"{src}.layer.2.DenseReluDense.wi", f"{dst}_ffn/wi")
        dense(f"{src}.layer.2.DenseReluDense.wo", f"{dst}_ffn/wo")
    rms("decoder.final_layer_norm", "decoder/final_ln")
    # t5-base ties lm_head to shared; an untied lm_head.weight (T5v1.1-style
    # checkpoints) is not supported by the tied T5ForGeneration module
    assert "lm_head.weight" not in sd or np.array_equal(sd["lm_head.weight"], sd["shared.weight"]), \
        "untied lm_head not supported"
    return p


# --------------------------------------------------------------------------
# CLI
# --------------------------------------------------------------------------
def _save(out_dir: str, params, batch_stats=None, meta=None, feature_center=None):
    import orbax.checkpoint as ocp

    payload = {"params": params}
    if batch_stats:
        payload["batch_stats"] = batch_stats
    if feature_center is not None:
        payload["feature_center"] = np.asarray(feature_center)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(Path(out_dir).resolve()), payload, force=True)
    ckptr.wait_until_finished()
    if meta:
        with open(Path(out_dir).parent / "meta.json", "w") as f:
            json.dump(meta, f)
    print(f"saved converted weights to {out_dir}")


def main():
    kind, src, out = sys.argv[1], sys.argv[2], sys.argv[3]
    # unet/controlnet: optional 4th arg names the architecture, e.g.
    #   python tools/convert_weights.py unet sdxl_unet.safetensors out sd_xl
    # (the SD1.5 default can't parse SD2.1/SDXL layouts: linear proj_in,
    # different block topology)
    cfg = None
    if len(sys.argv) > 4 and kind in ("unet", "controlnet"):
        from saspa_tpu.models.unet import UNET_CONFIGS

        cfg = UNET_CONFIGS[sys.argv[4]]
    raw = None
    if kind == "cal" and not str(src).endswith(".safetensors"):
        import torch

        raw = torch.load(src, map_location="cpu", weights_only=False)
    sd = load_state_dict(src, raw_obj=raw)
    if kind == "unet":
        _save(out, convert_sd_unet(sd, cfg=cfg))
    elif kind == "vae":
        # SD and SDXL VAEs share the full-size layout; the optional 4th arg
        # names a models.vae.VAE_CONFIGS entry for non-default topologies
        vae_cfg = None
        if len(sys.argv) > 4:
            from saspa_tpu.models.vae import VAE_CONFIGS

            vae_cfg = VAE_CONFIGS[sys.argv[4]]
        _save(out, convert_vae(sd, cfg=vae_cfg))
    elif kind == "controlnet":
        _save(out, convert_controlnet(sd, cfg=cfg))
    elif kind == "clip_text":
        n = max(int(k.split(".")[3]) for k in sd if k.startswith("text_model.encoder.layers.")) + 1
        _save(out, convert_clip_text_hf(sd, n))
    elif kind == "clip_rn50":
        params, stats = convert_clip_rn50(sd)
        _save(out, params, stats)
    elif kind == "resnet":
        params, stats = convert_torchvision_resnet(sd)
        _save(out, params, stats)
    elif kind == "cal":
        params, stats = convert_cal(sd)
        is_101 = any(k in sd for k in ("features.layer3.22.conv1.weight", "features.6.22.conv1.weight"))
        net = "resnet101" if is_101 else "resnet50"
        # feature_center rides at the checkpoint top level, next to state_dict
        # (reference fgvc/util.py:196-199); keep it for training resume
        fc = raw.get("feature_center") if isinstance(raw, dict) else None
        fc = fc.numpy() if hasattr(fc, "numpy") else fc
        _save(str(Path(out) / "ckpt"), params, stats, meta={"net": net}, feature_center=fc)
    elif kind == "lpips":
        _save(out, convert_lpips(sd))
    elif kind == "blip_caption":
        _save(out, convert_blip_caption(sd))
    elif kind == "blip_vqa":
        sd = {k: v for k, v in sd.items() if "_m." not in k and not k.startswith("momentum")}
        _save(out, convert_blip_vqa(sd))
    elif kind == "t5":
        layers = max(int(k.split(".")[2]) for k in sd if k.startswith("encoder.block.")) + 1
        _save(out, convert_t5(sd, layers))
    elif kind == "blip_diffusion_qformer":
        layers = max(int(k.split(".")[2]) for k in sd if k.startswith("encoder.layer.")) + 1
        _save(out, convert_blip_diffusion_qformer(sd, layers))
    elif kind == "blip_diffusion_vision":
        layers = max(int(k.split(".")[3]) for k in sd if ".encoder.layers." in k) + 1
        _save(out, convert_blip_diffusion_vision(sd, layers))
    elif kind == "inception":
        params, stats = convert_inception(sd)
        _save(out, params, stats)
    elif kind == "hed":
        _save(out, convert_hed(sd))
    else:
        raise SystemExit(f"unknown kind {kind}")


if __name__ == "__main__":
    main()
