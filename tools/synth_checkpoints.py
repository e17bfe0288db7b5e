"""Synthetic torch state_dicts with the EXACT public checkpoint key layouts.

Zero egress blocks downloading the real weights, but the key layouts of the
public checkpoints are deterministic: they follow from the torch module
structures of diffusers' UNet2DConditionModel / ControlNetModel /
AutoencoderKL, HF's CLIPTextModel(WithProjection), OpenAI CLIP's
ModifiedResNet build, torchvision's ResNet, the lpips package, and the
reference's WSDAN_CAL (fgvc/models/cal.py).  This module TRANSCRIBES those
module structures (it deliberately does not import or reuse
tools/convert_weights.py, so a naming/transpose disagreement between the two
is a converter bug, not a shared mistake) and emits {key: np.ndarray} dicts
with the real shapes.

Used by tests/test_convert_real_layout.py to prove the converters consume
every key and produce exactly the flax init trees BEFORE real weights exist.

Fill modes: fill=None -> zero-strided views (full-size layouts cost ~no RAM);
fill=np.random.RandomState -> small random values (for forward-run tests).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def _arr(fill, *shape):
    if fill is None:
        return np.broadcast_to(np.zeros((), np.float32), shape)
    # randn() with no shape returns a bare float (scalar params: logit_scale)
    return (np.asarray(fill.randn(*shape)) * 0.02).astype(np.float32)


class _SD(dict):
    """state_dict builder with torch-layout helpers."""

    def __init__(self, fill=None):
        super().__init__()
        self.fill = fill

    def t(self, key, *shape):
        self[key] = _arr(self.fill, *shape)

    def conv(self, name, cout, cin, k, bias=True):
        self.t(f"{name}.weight", cout, cin, k, k)  # torch OIHW
        if bias:
            self.t(f"{name}.bias", cout)

    def linear(self, name, cout, cin, bias=True):
        self.t(f"{name}.weight", cout, cin)  # torch (out, in)
        if bias:
            self.t(f"{name}.bias", cout)

    def norm(self, name, c):  # GroupNorm / LayerNorm: weight+bias
        self.t(f"{name}.weight", c)
        self.t(f"{name}.bias", c)

    def bn(self, name, c, tracked=True):
        self.norm(name, c)
        self[f"{name}.running_mean"] = _arr(self.fill, c)
        # variance must be positive for forward runs
        v = _arr(self.fill, c)
        self[f"{name}.running_var"] = np.abs(v) + 1.0 if self.fill is not None else np.broadcast_to(np.ones((), np.float32), (c,))
        if tracked:
            self[f"{name}.num_batches_tracked"] = np.asarray(0, np.int64)


# ---------------------------------------------------------------------------
# diffusers UNet2DConditionModel
# ---------------------------------------------------------------------------
# public config.json field values (verbatim from the released checkpoints)
SD15_TORCH_CFG = dict(
    in_channels=4, out_channels=4,
    block_out_channels=(320, 640, 1280, 1280), layers_per_block=2,
    down_block_types=("CrossAttnDownBlock2D",) * 3 + ("DownBlock2D",),
    up_block_types=("UpBlock2D",) + ("CrossAttnUpBlock2D",) * 3,
    transformer_layers_per_block=(1, 1, 1, 1),
    cross_attention_dim=768, use_linear_projection=False,
    addition_embed_type=None, projection_class_embeddings_input_dim=None,
)
SD21_TORCH_CFG = dict(SD15_TORCH_CFG, cross_attention_dim=1024, use_linear_projection=True)
IP2P_TORCH_CFG = dict(SD15_TORCH_CFG, in_channels=8)
SDXL_TORCH_CFG = dict(
    in_channels=4, out_channels=4,
    block_out_channels=(320, 640, 1280), layers_per_block=2,
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D"),
    transformer_layers_per_block=(1, 2, 10),
    cross_attention_dim=2048, use_linear_projection=True,
    addition_embed_type="text_time", projection_class_embeddings_input_dim=2816,
)
SDXL_REFINER_TORCH_CFG = dict(
    in_channels=4, out_channels=4,
    block_out_channels=(384, 768, 1536, 1536), layers_per_block=2,
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D"),
    # diffusers config.json has scalar transformer_layers_per_block=4: the
    # mid block reads [-1] -> 4 (see models/unet.py SDXL_REFINER_UNET note)
    transformer_layers_per_block=(1, 4, 4, 4),
    cross_attention_dim=1280, use_linear_projection=True,
    addition_embed_type="text_time", projection_class_embeddings_input_dim=2560,
)


def _resnet_block(sd: _SD, name: str, cin: int, cout: int, temb: int):
    """diffusers ResnetBlock2D."""
    sd.norm(f"{name}.norm1", cin)
    sd.conv(f"{name}.conv1", cout, cin, 3)
    sd.linear(f"{name}.time_emb_proj", cout, temb)
    sd.norm(f"{name}.norm2", cout)
    sd.conv(f"{name}.conv2", cout, cout, 3)
    if cin != cout:
        sd.conv(f"{name}.conv_shortcut", cout, cin, 1)


def _transformer2d(sd: _SD, name: str, ch: int, ctx: int, depth: int, linear_proj: bool):
    """diffusers Transformer2DModel."""
    sd.norm(f"{name}.norm", ch)
    if linear_proj:
        sd.linear(f"{name}.proj_in", ch, ch)
        sd.linear(f"{name}.proj_out", ch, ch)
    else:
        sd.conv(f"{name}.proj_in", ch, ch, 1)
        sd.conv(f"{name}.proj_out", ch, ch, 1)
    for i in range(depth):
        b = f"{name}.transformer_blocks.{i}"
        for a, kdim in (("attn1", ch), ("attn2", ctx)):
            sd.linear(f"{b}.{a}.to_q", ch, ch, bias=False)
            sd.linear(f"{b}.{a}.to_k", ch, kdim, bias=False)
            sd.linear(f"{b}.{a}.to_v", ch, kdim, bias=False)
            sd.linear(f"{b}.{a}.to_out.0", ch, ch)
        sd.norm(f"{b}.norm1", ch)
        sd.norm(f"{b}.norm2", ch)
        sd.norm(f"{b}.norm3", ch)
        sd.linear(f"{b}.ff.net.0.proj", ch * 8, ch)  # GEGLU: 2 * mult(4) * ch
        sd.linear(f"{b}.ff.net.2", ch, ch * 4)


def _unet_encoder(sd: _SD, cfg: dict):
    """conv_in + time/add embeddings + down_blocks + mid_block (shared between
    UNet2DConditionModel and ControlNetModel)."""
    B = cfg["block_out_channels"]
    temb = B[0] * 4
    sd.conv("conv_in", B[0], cfg["in_channels"], 3)
    sd.linear("time_embedding.linear_1", temb, B[0])
    sd.linear("time_embedding.linear_2", temb, temb)
    if cfg["addition_embed_type"] == "text_time":
        sd.linear("add_embedding.linear_1", temb, cfg["projection_class_embeddings_input_dim"])
        sd.linear("add_embedding.linear_2", temb, temb)

    for i, btype in enumerate(cfg["down_block_types"]):
        cin = B[i - 1] if i > 0 else B[0]
        cout = B[i]
        depth = cfg["transformer_layers_per_block"][i]
        for j in range(cfg["layers_per_block"]):
            _resnet_block(sd, f"down_blocks.{i}.resnets.{j}", cin if j == 0 else cout, cout, temb)
            if btype == "CrossAttnDownBlock2D":
                _transformer2d(sd, f"down_blocks.{i}.attentions.{j}", cout,
                               cfg["cross_attention_dim"], depth, cfg["use_linear_projection"])
        if i < len(B) - 1:
            sd.conv(f"down_blocks.{i}.downsamplers.0.conv", cout, cout, 3)

    mid_ch = B[-1]
    _resnet_block(sd, "mid_block.resnets.0", mid_ch, mid_ch, temb)
    _transformer2d(sd, "mid_block.attentions.0", mid_ch, cfg["cross_attention_dim"],
                   cfg["transformer_layers_per_block"][-1], cfg["use_linear_projection"])
    _resnet_block(sd, "mid_block.resnets.1", mid_ch, mid_ch, temb)


def diffusers_unet_state_dict(cfg: dict = SD15_TORCH_CFG, fill=None) -> Dict[str, np.ndarray]:
    sd = _SD(fill)
    _unet_encoder(sd, cfg)
    B = cfg["block_out_channels"]
    temb = B[0] * 4
    rev = list(B)[::-1]
    prev_out = B[-1]
    for i, btype in enumerate(cfg["up_block_types"]):
        out = rev[i]
        input_channel = rev[min(i + 1, len(B) - 1)]
        depth = cfg["transformer_layers_per_block"][len(B) - 1 - i]
        n_res = cfg["layers_per_block"] + 1
        for j in range(n_res):
            res_skip = input_channel if j == n_res - 1 else out
            res_in = prev_out if j == 0 else out
            _resnet_block(sd, f"up_blocks.{i}.resnets.{j}", res_in + res_skip, out, temb)
            if btype == "CrossAttnUpBlock2D":
                _transformer2d(sd, f"up_blocks.{i}.attentions.{j}", out,
                               cfg["cross_attention_dim"], depth, cfg["use_linear_projection"])
        if i < len(cfg["up_block_types"]) - 1:
            sd.conv(f"up_blocks.{i}.upsamplers.0.conv", out, out, 3)
        prev_out = out
    sd.norm("conv_norm_out", B[0])
    sd.conv("conv_out", cfg["out_channels"], B[0], 3)
    return sd


def diffusers_controlnet_state_dict(cfg: dict = SD15_TORCH_CFG, fill=None) -> Dict[str, np.ndarray]:
    """lllyasviel/control_v11p_sd15_canny layout (diffusers ControlNetModel)."""
    sd = _SD(fill)
    _unet_encoder(sd, cfg)
    B = cfg["block_out_channels"]
    emb = (16, 32, 96, 256)
    sd.conv("controlnet_cond_embedding.conv_in", emb[0], 3, 3)
    for i in range(len(emb) - 1):
        sd.conv(f"controlnet_cond_embedding.blocks.{2 * i}", emb[i], emb[i], 3)
        sd.conv(f"controlnet_cond_embedding.blocks.{2 * i + 1}", emb[i + 1], emb[i], 3)
    sd.conv("controlnet_cond_embedding.conv_out", B[0], emb[-1], 3)
    # one zero conv per down residual: conv_in + layers_per_block per block +
    # one downsample per non-final block
    chans = [B[0]]
    for i in range(len(B)):
        chans += [B[i]] * cfg["layers_per_block"]
        if i < len(B) - 1:
            chans.append(B[i])
    for idx, ch in enumerate(chans):
        sd.conv(f"controlnet_down_blocks.{idx}", ch, ch, 1)
    sd.conv("controlnet_mid_block", B[-1], B[-1], 1)
    return sd


# ---------------------------------------------------------------------------
# diffusers AutoencoderKL (SD / SDXL share the architecture)
# ---------------------------------------------------------------------------
SD_VAE_TORCH_CFG = dict(block_out_channels=(128, 256, 512, 512), layers_per_block=2,
                        in_channels=3, out_channels=3, latent_channels=4)


def diffusers_vae_state_dict(cfg: dict = SD_VAE_TORCH_CFG, fill=None,
                             legacy_attn: bool = True) -> Dict[str, np.ndarray]:
    """legacy_attn=True (default) emits the PRE-0.18 AttentionBlock naming
    (query/key/value/proj_attn) that the 2022-era SD1.5 / instruct-pix2pix VAE
    files on the Hub actually carry — diffusers only renames them at
    from_pretrained time.  legacy_attn=False emits the modern
    to_q/to_k/to_v/to_out.0 naming (post-0.18 exports like
    madebyollin/sdxl-vae-fp16-fix)."""
    sd = _SD(fill)
    B = cfg["block_out_channels"]
    lc = cfg["latent_channels"]

    def res(name, cin, cout):
        sd.norm(f"{name}.norm1", cin)
        sd.conv(f"{name}.conv1", cout, cin, 3)
        sd.norm(f"{name}.norm2", cout)
        sd.conv(f"{name}.conv2", cout, cout, 3)
        if cin != cout:
            sd.conv(f"{name}.conv_shortcut", cout, cin, 1)

    def mid(prefix, ch):
        res(f"{prefix}.mid_block.resnets.0", ch, ch)
        a = f"{prefix}.mid_block.attentions.0"
        sd.norm(f"{a}.group_norm", ch)
        qkv = ("query", "key", "value") if legacy_attn else ("to_q", "to_k", "to_v")
        for p in qkv:
            sd.linear(f"{a}.{p}", ch, ch)
        sd.linear(f"{a}.proj_attn" if legacy_attn else f"{a}.to_out.0", ch, ch)
        res(f"{prefix}.mid_block.resnets.1", ch, ch)

    # encoder
    sd.conv("encoder.conv_in", B[0], cfg["in_channels"], 3)
    for i in range(len(B)):
        cin = B[i - 1] if i > 0 else B[0]
        for j in range(cfg["layers_per_block"]):
            res(f"encoder.down_blocks.{i}.resnets.{j}", cin if j == 0 else B[i], B[i])
        if i < len(B) - 1:
            sd.conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", B[i], B[i], 3)
    mid("encoder", B[-1])
    sd.norm("encoder.conv_norm_out", B[-1])
    sd.conv("encoder.conv_out", 2 * lc, B[-1], 3)
    sd.conv("quant_conv", 2 * lc, 2 * lc, 1)
    # decoder
    sd.conv("post_quant_conv", lc, lc, 1)
    sd.conv("decoder.conv_in", B[-1], lc, 3)
    mid("decoder", B[-1])
    rev = list(B)[::-1]
    for i in range(len(B)):
        cin = rev[i - 1] if i > 0 else B[-1]
        for j in range(cfg["layers_per_block"] + 1):
            res(f"decoder.up_blocks.{i}.resnets.{j}", cin if j == 0 else rev[i], rev[i])
        if i < len(B) - 1:
            sd.conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", rev[i], rev[i], 3)
    sd.norm("decoder.conv_norm_out", B[0])
    sd.conv("decoder.conv_out", cfg["out_channels"], B[0], 3)
    return sd


# ---------------------------------------------------------------------------
# HF CLIPTextModel / CLIPTextModelWithProjection
# ---------------------------------------------------------------------------
def hf_clip_text_state_dict(width=768, layers=12, vocab=49408, ctx_len=77,
                            projection_dim: Optional[int] = None, fill=None,
                            position_ids_buffer=True) -> Dict[str, np.ndarray]:
    """SD1.5 text: (768, 12); SD2.1: (1024, 23); SDXL te2 bigG: (1280, 32,
    projection_dim=1280).  Older transformers versions persist a position_ids
    buffer — include it so converters prove they tolerate it."""
    sd = _SD(fill)
    pre = "text_model."
    sd.t(f"{pre}embeddings.token_embedding.weight", vocab, width)
    sd.t(f"{pre}embeddings.position_embedding.weight", ctx_len, width)
    if position_ids_buffer:
        sd[f"{pre}embeddings.position_ids"] = np.arange(ctx_len, dtype=np.int64)[None]
    for i in range(layers):
        b = f"{pre}encoder.layers.{i}"
        for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd.linear(f"{b}.self_attn.{p}", width, width)
        sd.norm(f"{b}.layer_norm1", width)
        sd.norm(f"{b}.layer_norm2", width)
        sd.linear(f"{b}.mlp.fc1", width * 4, width)
        sd.linear(f"{b}.mlp.fc2", width, width * 4)
    sd.norm(f"{pre}final_layer_norm", width)
    if projection_dim is not None:
        sd.linear("text_projection", projection_dim, width, bias=False)
    return sd


# ---------------------------------------------------------------------------
# OpenAI CLIP RN50 (the pip `clip` package state_dict naming)
# ---------------------------------------------------------------------------
def openai_clip_rn50_state_dict(fill=None) -> Dict[str, np.ndarray]:
    sd = _SD(fill)
    vw = 64  # vision width
    # 3-conv stem: 3 -> vw/2 -> vw/2 -> vw
    sd.conv("visual.conv1", vw // 2, 3, 3, bias=False)
    sd.bn("visual.bn1", vw // 2)
    sd.conv("visual.conv2", vw // 2, vw // 2, 3, bias=False)
    sd.bn("visual.bn2", vw // 2)
    sd.conv("visual.conv3", vw, vw // 2, 3, bias=False)
    sd.bn("visual.bn3", vw)
    layers = (3, 4, 6, 3)
    cin = vw
    for li, n in enumerate(layers, start=1):
        planes = vw * (2 ** (li - 1))
        for bi in range(n):
            b = f"visual.layer{li}.{bi}"
            sd.conv(f"{b}.conv1", planes, cin, 1, bias=False)
            sd.bn(f"{b}.bn1", planes)
            sd.conv(f"{b}.conv2", planes, planes, 3, bias=False)
            sd.bn(f"{b}.bn2", planes)
            sd.conv(f"{b}.conv3", planes * 4, planes, 1, bias=False)
            sd.bn(f"{b}.bn3", planes * 4)
            if bi == 0:  # ModifiedResNet: AvgPool('-1') + conv('0') + bn('1')
                sd.conv(f"{b}.downsample.0", planes * 4, cin, 1, bias=False)
                sd.bn(f"{b}.downsample.1", planes * 4)
            cin = planes * 4
    embed_dim = 1024
    sd.t("visual.attnpool.positional_embedding", 50, cin)  # (7*7+1, 2048)
    for p in ("q_proj", "k_proj", "v_proj"):
        sd.linear(f"visual.attnpool.{p}", cin, cin)
    sd.linear("visual.attnpool.c_proj", embed_dim, cin)
    # text tower: width 512, 12 layers, fused in_proj
    tw = 512
    sd.t("token_embedding.weight", 49408, tw)
    sd.t("positional_embedding", 77, tw)
    for i in range(12):
        b = f"transformer.resblocks.{i}"
        sd.t(f"{b}.attn.in_proj_weight", 3 * tw, tw)
        sd.t(f"{b}.attn.in_proj_bias", 3 * tw)
        sd.linear(f"{b}.attn.out_proj", tw, tw)
        sd.norm(f"{b}.ln_1", tw)
        sd.norm(f"{b}.ln_2", tw)
        sd.linear(f"{b}.mlp.c_fc", tw * 4, tw)
        sd.linear(f"{b}.mlp.c_proj", tw, tw * 4)
    sd.norm("ln_final", tw)
    sd.t("text_projection", tw, embed_dim)  # plain Parameter, NOT a Linear
    sd.t("logit_scale")
    # the real RN50.pt (torch.jit archive) state_dict carries these scalar
    # entries; clip/model.py build_model deletes them before load_state_dict
    sd["input_resolution"] = np.asarray(224, np.int64)
    sd["context_length"] = np.asarray(77, np.int64)
    sd["vocab_size"] = np.asarray(49408, np.int64)
    return sd


# ---------------------------------------------------------------------------
# torchvision ResNet (resnet50/101 bottleneck family)
# ---------------------------------------------------------------------------
def torchvision_resnet_state_dict(depth=50, fill=None, num_classes=1000,
                                  include_fc=True, prefix="", sequential_features=False,
                                  tracked=True) -> Dict[str, np.ndarray]:
    """Bottleneck ResNet.  sequential_features=True emits the reference CAL
    layout where get_features() = nn.Sequential(conv1, bn1, relu, maxpool,
    layer1..4) index-names the children (fgvc/models/resnet.py:168-178)."""
    layers = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]
    sd = _SD(fill)

    def name(attr):
        if sequential_features:
            seq = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5", "layer3": "6", "layer4": "7"}
            head, rest = (attr.split(".", 1) + [""])[:2]
            return prefix + seq[head] + ("." + rest if rest else "")
        return prefix + attr

    sd.conv(name("conv1"), 64, 3, 7, bias=False)
    sd.bn(name("bn1"), 64, tracked=tracked)
    cin = 64
    for li, n in enumerate(layers, start=1):
        planes = 64 * (2 ** (li - 1))
        for bi in range(n):
            b = name(f"layer{li}.{bi}")
            sd.conv(f"{b}.conv1", planes, cin, 1, bias=False)
            sd.bn(f"{b}.bn1", planes, tracked=tracked)
            sd.conv(f"{b}.conv2", planes, planes, 3, bias=False)
            sd.bn(f"{b}.bn2", planes, tracked=tracked)
            sd.conv(f"{b}.conv3", planes * 4, planes, 1, bias=False)
            sd.bn(f"{b}.bn3", planes * 4, tracked=tracked)
            if bi == 0:
                sd.conv(f"{b}.downsample.0", planes * 4, cin, 1, bias=False)
                sd.bn(f"{b}.downsample.1", planes * 4, tracked=tracked)
            cin = planes * 4
    if include_fc:
        # the classifier head is a direct attribute (never inside the
        # features Sequential) but still honors the prefix
        sd.linear(f"{prefix}fc", num_classes, cin)
    return sd


# ---------------------------------------------------------------------------
# reference WSDAN_CAL checkpoint (fgvc/util.py:196-203)
# ---------------------------------------------------------------------------
def cal_checkpoint_state_dict(depth=101, num_classes=100, M=32, fill=None) -> Dict[str, np.ndarray]:
    """The inner 'state_dict' of the saved dict {'logs', 'state_dict',
    'feature_center'}.  features.* uses the Sequential index layout; the
    attention head is BasicConv2d (conv no-bias + bn, inception.py:374-384);
    fc is bias-free (cal.py:165)."""
    sd = _SD(fill)
    sd.update(torchvision_resnet_state_dict(depth, fill=fill, include_fc=False,
                                            prefix="features.", sequential_features=True))
    sd.conv("attentions.conv", M, 2048, 1, bias=False)
    sd.bn("attentions.bn", M)
    sd.linear("fc", num_classes, M * 2048, bias=False)
    return sd


# ---------------------------------------------------------------------------
# lpips.LPIPS(net='alex') full module state_dict
# ---------------------------------------------------------------------------
def lpips_alex_state_dict(fill=None) -> Dict[str, np.ndarray]:
    sd = _SD(fill)
    sd["scaling_layer.shift"] = np.asarray([-.030, -.088, -.188], np.float32).reshape(1, 3, 1, 1)
    sd["scaling_layer.scale"] = np.asarray([.458, .448, .450], np.float32).reshape(1, 3, 1, 1)
    convs = [("net.slice1.0", 64, 3, 11), ("net.slice2.3", 192, 64, 5),
             ("net.slice3.6", 384, 192, 3), ("net.slice4.8", 256, 384, 3),
             ("net.slice5.10", 256, 256, 3)]
    for name, o, i, k in convs:
        sd.t(f"{name}.weight", o, i, k, k)
        sd.t(f"{name}.bias", o)
    for li, c in enumerate((64, 192, 384, 256, 256)):
        sd.t(f"lin{li}.model.1.weight", 1, c, 1, 1)
    return sd


# ---------------------------------------------------------------------------
# LAVIS blip_caption (base_coco) checkpoint
# ---------------------------------------------------------------------------
def _blip_vit_keys(sd: _SD, width, layers, image_size, patch):
    """timm ViT visual_encoder sublayout (shared by blip_caption/blip_vqa)."""
    n_pos = (image_size // patch) ** 2 + 1
    sd.t("visual_encoder.cls_token", 1, 1, width)
    sd.t("visual_encoder.pos_embed", 1, n_pos, width)
    sd.t("visual_encoder.patch_embed.proj.weight", width, 3, patch, patch)
    sd.t("visual_encoder.patch_embed.proj.bias", width)
    for i in range(layers):
        b = f"visual_encoder.blocks.{i}"
        sd.norm(f"{b}.norm1", width)
        sd.linear(f"{b}.attn.qkv", 3 * width, width)
        sd.linear(f"{b}.attn.proj", width, width)
        sd.norm(f"{b}.norm2", width)
        sd.linear(f"{b}.mlp.fc1", width * 4, width)
        sd.linear(f"{b}.mlp.fc2", width, width * 4)
    sd.norm("visual_encoder.norm", width)


def _blip_bert_keys(sd: _SD, prefix, width, layers, vocab, intermediate):
    """med.py BertModel sublayout: embeddings + encoder layers, each with
    self-attention AND cross-attention (shared by the caption/VQA decoders
    and the VQA question encoder)."""
    sd.t(f"{prefix}.embeddings.word_embeddings.weight", vocab, width)
    sd.t(f"{prefix}.embeddings.position_embeddings.weight", 512, width)
    sd.t(f"{prefix}.embeddings.position_ids", 1, 512)  # persistent BERT buffer
    sd.t(f"{prefix}.embeddings.token_type_embeddings.weight", 2, width)
    sd.norm(f"{prefix}.embeddings.LayerNorm", width)
    for i in range(layers):
        b = f"{prefix}.encoder.layer.{i}"
        for kind in ("attention", "crossattention"):
            for p in ("query", "key", "value"):
                sd.linear(f"{b}.{kind}.self.{p}", width, width)
            sd.linear(f"{b}.{kind}.output.dense", width, width)
            sd.norm(f"{b}.{kind}.output.LayerNorm", width)
        sd.linear(f"{b}.intermediate.dense", intermediate, width)
        sd.linear(f"{b}.output.dense", width, intermediate)
        sd.norm(f"{b}.output.LayerNorm", width)


def _blip_mlm_head_keys(sd: _SD, prefix, width, vocab, fill):
    sd.linear(f"{prefix}.cls.predictions.transform.dense", width, width)
    sd.norm(f"{prefix}.cls.predictions.transform.LayerNorm", width)
    sd.t(f"{prefix}.cls.predictions.decoder.weight", vocab, width)
    bias = _arr(fill, vocab)
    sd[f"{prefix}.cls.predictions.decoder.bias"] = bias
    sd[f"{prefix}.cls.predictions.bias"] = bias  # tied in the HF head


def lavis_blip_caption_state_dict(width=768, vit_layers=12, text_layers=12,
                                  vocab=30524, image_size=384, patch=16,
                                  intermediate=None, fill=None) -> Dict[str, np.ndarray]:
    """The 'model' state_dict inside the LAVIS caption checkpoint: timm ViT
    visual_encoder (fused qkv with bias) + BERT text_decoder with
    cross-attention + the tied MLM head (cls.predictions.bias ==
    decoder.bias)."""
    sd = _SD(fill)
    intermediate = intermediate or width * 4
    _blip_vit_keys(sd, width, vit_layers, image_size, patch)
    _blip_bert_keys(sd, "text_decoder.bert", width, text_layers, vocab, intermediate)
    _blip_mlm_head_keys(sd, "text_decoder", width, vocab, fill)
    return sd


def lavis_blip_vqa_state_dict(width=768, vit_layers=12, text_layers=12,
                              vocab=30524, image_size=480, patch=16,
                              intermediate=None, fill=None) -> Dict[str, np.ndarray]:
    """The 'model' state_dict inside the LAVIS blip_vqa (vqav2) checkpoint:
    timm ViT visual_encoder at 480², a med.BertModel question encoder
    (`text_encoder.*` — NO .bert. wrapper, it is the BertModel itself) with
    cross-attention in every layer, and a BertLMHeadModel answer decoder
    (`text_decoder.bert.*` + `text_decoder.cls.*`), per LAVIS
    models/blip_models/blip_vqa.py."""
    sd = _SD(fill)
    intermediate = intermediate or width * 4
    _blip_vit_keys(sd, width, vit_layers, image_size, patch)
    _blip_bert_keys(sd, "text_encoder", width, text_layers, vocab, intermediate)
    _blip_bert_keys(sd, "text_decoder.bert", width, text_layers, vocab, intermediate)
    _blip_mlm_head_keys(sd, "text_decoder", width, vocab, fill)
    return sd


def torchvision_inception_state_dict(fill=None, with_aux=True) -> Dict[str, np.ndarray]:
    """torchvision inception_v3 layout (BasicConv2d = conv.weight no-bias +
    bn.{weight,bias,running_mean,running_var,num_batches_tracked})."""
    sd = _SD(fill)

    def bc(name, cout, cin, kh, kw):
        sd.t(f"{name}.conv.weight", cout, cin, kh, kw)
        sd.bn(f"{name}.bn", cout)

    bc("Conv2d_1a_3x3", 32, 3, 3, 3)
    bc("Conv2d_2a_3x3", 32, 32, 3, 3)
    bc("Conv2d_2b_3x3", 64, 32, 3, 3)
    bc("Conv2d_3b_1x1", 80, 64, 1, 1)
    bc("Conv2d_4a_3x3", 192, 80, 3, 3)

    def mixed_a(name, cin, pool):
        bc(f"{name}.branch1x1", 64, cin, 1, 1)
        bc(f"{name}.branch5x5_1", 48, cin, 1, 1)
        bc(f"{name}.branch5x5_2", 64, 48, 5, 5)
        bc(f"{name}.branch3x3dbl_1", 64, cin, 1, 1)
        bc(f"{name}.branch3x3dbl_2", 96, 64, 3, 3)
        bc(f"{name}.branch3x3dbl_3", 96, 96, 3, 3)
        bc(f"{name}.branch_pool", pool, cin, 1, 1)

    mixed_a("Mixed_5b", 192, 32)
    mixed_a("Mixed_5c", 256, 64)
    mixed_a("Mixed_5d", 288, 64)

    bc("Mixed_6a.branch3x3", 384, 288, 3, 3)
    bc("Mixed_6a.branch3x3dbl_1", 64, 288, 1, 1)
    bc("Mixed_6a.branch3x3dbl_2", 96, 64, 3, 3)
    bc("Mixed_6a.branch3x3dbl_3", 96, 96, 3, 3)

    def mixed_c(name, c7):
        bc(f"{name}.branch1x1", 192, 768, 1, 1)
        bc(f"{name}.branch7x7_1", c7, 768, 1, 1)
        bc(f"{name}.branch7x7_2", c7, c7, 1, 7)
        bc(f"{name}.branch7x7_3", 192, c7, 7, 1)
        bc(f"{name}.branch7x7dbl_1", c7, 768, 1, 1)
        bc(f"{name}.branch7x7dbl_2", c7, c7, 7, 1)
        bc(f"{name}.branch7x7dbl_3", c7, c7, 1, 7)
        bc(f"{name}.branch7x7dbl_4", c7, c7, 7, 1)
        bc(f"{name}.branch7x7dbl_5", 192, c7, 1, 7)
        bc(f"{name}.branch_pool", 192, 768, 1, 1)

    mixed_c("Mixed_6b", 128)
    mixed_c("Mixed_6c", 160)
    mixed_c("Mixed_6d", 160)
    mixed_c("Mixed_6e", 192)

    bc("Mixed_7a.branch3x3_1", 192, 768, 1, 1)
    bc("Mixed_7a.branch3x3_2", 320, 192, 3, 3)
    bc("Mixed_7a.branch7x7x3_1", 192, 768, 1, 1)
    bc("Mixed_7a.branch7x7x3_2", 192, 192, 1, 7)
    bc("Mixed_7a.branch7x7x3_3", 192, 192, 7, 1)
    bc("Mixed_7a.branch7x7x3_4", 192, 192, 3, 3)

    def mixed_e(name, cin):
        bc(f"{name}.branch1x1", 320, cin, 1, 1)
        bc(f"{name}.branch3x3_1", 384, cin, 1, 1)
        bc(f"{name}.branch3x3_2a", 384, 384, 1, 3)
        bc(f"{name}.branch3x3_2b", 384, 384, 3, 1)
        bc(f"{name}.branch3x3dbl_1", 448, cin, 1, 1)
        bc(f"{name}.branch3x3dbl_2", 384, 448, 3, 3)
        bc(f"{name}.branch3x3dbl_3a", 384, 384, 1, 3)
        bc(f"{name}.branch3x3dbl_3b", 384, 384, 3, 1)
        bc(f"{name}.branch_pool", 192, cin, 1, 1)

    mixed_e("Mixed_7b", 1280)
    mixed_e("Mixed_7c", 2048)

    if with_aux:
        bc("AuxLogits.conv0", 128, 768, 1, 1)
        bc("AuxLogits.conv1", 768, 128, 5, 5)
        sd.linear("AuxLogits.fc", 1000, 768)
    sd.linear("fc", 1000, 2048)
    return sd


def controlnet_aux_hed_state_dict(fill=None) -> Dict[str, np.ndarray]:
    """controlnet_aux ControlNetHED_Apache2 layout (ControlNetHED.pth)."""
    sd = _SD(fill)
    sd.t("norm", 1, 3, 1, 1)
    chans = ((3, 64, 2), (64, 128, 2), (128, 256, 3), (256, 512, 3), (512, 512, 3))
    for bi, (cin, cout, n) in enumerate(chans, start=1):
        for ci in range(n):
            sd.conv(f"block{bi}.convs.{ci}", cout, cin if ci == 0 else cout, 3)
        sd.conv(f"block{bi}.projection", 1, cout, 1)
    return sd


def blip_diffusion_qformer_state_dict(width=768, layers=12, queries=16,
                                      enc_width=1024, vocab=30523, cross_freq=2,
                                      fill=None) -> Dict[str, np.ndarray]:
    """BLIP-Diffusion Q-Former layout (diffusers Blip2QFormerModel / LAVIS
    BertModel naming): embeddings + BERT layers with crossattention every
    cross_freq layers, split query/text FFNs, ProjLayer head."""
    sd = _SD(fill)
    sd.t("query_tokens", 1, queries, width)
    sd.t("embeddings.word_embeddings.weight", vocab, width)
    # bert-base-uncased derived: the real export carries the full 512-row
    # position table (LAVIS Qformer from BertConfig) — the flax QFormer's
    # max_positions default matches
    sd.t("embeddings.position_embeddings.weight", 512, width)
    sd.t("embeddings.position_ids", 1, 512)  # persistent BERT buffer
    sd.norm("embeddings.LayerNorm", width)
    for i in range(layers):
        b = f"encoder.layer.{i}"
        for m in ("query", "key", "value"):
            sd.linear(f"{b}.attention.attention.{m}", width, width)
        sd.linear(f"{b}.attention.output.dense", width, width)
        sd.norm(f"{b}.attention.output.LayerNorm", width)
        if i % cross_freq == 0:
            sd.linear(f"{b}.crossattention.attention.query", width, width)
            sd.linear(f"{b}.crossattention.attention.key", width, enc_width)
            sd.linear(f"{b}.crossattention.attention.value", width, enc_width)
            sd.linear(f"{b}.crossattention.output.dense", width, width)
            sd.norm(f"{b}.crossattention.output.LayerNorm", width)
        sd.linear(f"{b}.intermediate_query.dense", 4 * width, width)
        sd.linear(f"{b}.output_query.dense", width, 4 * width)
        sd.norm(f"{b}.output_query.LayerNorm", width)
        sd.linear(f"{b}.intermediate.dense", 4 * width, width)
        sd.linear(f"{b}.output.dense", width, 4 * width)
        sd.norm(f"{b}.output.LayerNorm", width)
    sd.linear("proj_layer.dense1", 4 * width, width)
    sd.linear("proj_layer.dense2", width, 4 * width)
    sd.norm("proj_layer.LayerNorm", width)
    return sd


def blip_diffusion_vision_state_dict(width=1024, layers=24, patch=14,
                                     image_size=224, fill=None) -> Dict[str, np.ndarray]:
    """BLIP-Diffusion vision tower (CLIP ViT-L/14) as the diffusers
    blipdiffusion export carries it: `vision_model.*` inside the qformer
    checkpoint (diffusers blip_diffusion/modeling_blip2.py Blip2QFormerModel
    owns the visual encoder), transformers-Blip2 naming with the MERGED
    self_attn.qkv projection.  LAVIS's split-CLIP naming is handled by the
    converter, not transcribed here."""
    sd = _SD(fill)
    n_pos = (image_size // patch) ** 2 + 1  # 257
    sd.t("vision_model.embeddings.class_embedding", 1, 1, width)
    sd.t("vision_model.embeddings.patch_embedding.weight", width, 3, patch, patch)
    sd.t("vision_model.embeddings.position_embedding", 1, n_pos, width)
    sd.norm("vision_model.pre_layernorm", width)
    for i in range(layers):
        b = f"vision_model.encoder.layers.{i}"
        sd.linear(f"{b}.self_attn.qkv", 3 * width, width)
        sd.linear(f"{b}.self_attn.projection", width, width)
        sd.norm(f"{b}.layer_norm1", width)
        sd.norm(f"{b}.layer_norm2", width)
        sd.linear(f"{b}.mlp.fc1", 4 * width, width)
        sd.linear(f"{b}.mlp.fc2", width, 4 * width)
    sd.norm("vision_model.post_layernorm", width)
    return sd
