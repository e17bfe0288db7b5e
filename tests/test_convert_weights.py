"""Structural round-trip tests for the weight converters: fabricate
torch-layout state dicts with the right shapes, convert, and check the
resulting tree loads into the Flax modules (i.e. matches init structure)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tools.convert_weights import (
    convert_cal,
    convert_clip_text_hf,
    convert_torchvision_resnet,
)


def _tree_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_shapes(v, prefix + k + "/"))
        else:
            out[prefix + k] = tuple(np.shape(v))
    return out


def _fake_resnet50_sd(prefix=""):
    """torchvision resnet50 key/shape layout (conv weights OIHW)."""
    rng = np.random.RandomState(0)
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = rng.randn(o, i, k, k).astype(np.float32)

    def bn(name, c):
        for suffix, shape in [("weight", c), ("bias", c), ("running_mean", c), ("running_var", c)]:
            sd[f"{name}.{suffix}"] = rng.randn(shape).astype(np.float32)

    conv(prefix + "conv1", 64, 3, 7)
    bn(prefix + "bn1", 64)
    in_ch = 64
    for li, blocks in enumerate([3, 4, 6, 3], start=1):
        feats = 64 * 2 ** (li - 1)
        for bi in range(blocks):
            base = f"{prefix}layer{li}.{bi}"
            conv(f"{base}.conv1", feats, in_ch if bi == 0 else feats * 4, 1)
            bn(f"{base}.bn1", feats)
            conv(f"{base}.conv2", feats, feats, 3)
            bn(f"{base}.bn2", feats)
            conv(f"{base}.conv3", feats * 4, feats, 1)
            bn(f"{base}.bn3", feats * 4)
            if bi == 0:
                conv(f"{base}.downsample.0", feats * 4, in_ch, 1)
                bn(f"{base}.downsample.1", feats * 4)
        in_ch = feats * 4
    return sd


def test_resnet50_conversion_loads():
    from saspa_tpu.models.resnet import resnet50

    sd = _fake_resnet50_sd()
    params, stats = convert_torchvision_resnet(sd)

    model = resnet50(features_only=True)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    want_p = _tree_shapes(init["params"])
    got_p = _tree_shapes(params)
    assert want_p == got_p, set(want_p.items()) ^ set(got_p.items())

    # converted params actually run
    out = model.apply({"params": params, "batch_stats": stats}, jnp.zeros((1, 64, 64, 3)), train=False)
    # stride-16 backbone (reference fgvc/models/resnet.py:118-119 default):
    # layer4 does not downsample
    assert out.shape == (1, 4, 4, 2048)


def test_cal_conversion_loads():
    from saspa_tpu.models.cal import WSDAN_CAL

    sd = _fake_resnet50_sd(prefix="features.")
    rng = np.random.RandomState(1)
    sd["attentions.conv.weight"] = rng.randn(32, 2048, 1, 1).astype(np.float32)
    for sfx in ("weight", "bias", "running_mean", "running_var"):
        sd[f"attentions.bn.{sfx}"] = rng.randn(32).astype(np.float32)
    sd["fc.weight"] = rng.randn(5, 32 * 2048).astype(np.float32)

    params, stats = convert_cal(sd)
    model = WSDAN_CAL(num_classes=5, M=32, net="resnet50")
    init = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3)), train=False)
    assert _tree_shapes(init["params"]) == _tree_shapes(params)
    p, p_cf, fm, att = model.apply(
        {"params": params, "batch_stats": stats}, jnp.zeros((1, 64, 64, 3)), train=False
    )
    assert p.shape == (1, 5)


def test_clip_text_conversion_loads():
    from saspa_tpu.models.text_encoder import CLIPTextConfig, CLIPTextEncoder

    width, layers, heads = 32, 2, 2
    rng = np.random.RandomState(2)
    sd = {
        "text_model.embeddings.token_embedding.weight": rng.randn(49408, width).astype(np.float32),
        "text_model.embeddings.position_embedding.weight": rng.randn(77, width).astype(np.float32),
        "text_model.final_layer_norm.weight": rng.randn(width).astype(np.float32),
        "text_model.final_layer_norm.bias": rng.randn(width).astype(np.float32),
    }
    for i in range(layers):
        b = f"text_model.encoder.layers.{i}"
        for pn in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{b}.self_attn.{pn}.weight"] = rng.randn(width, width).astype(np.float32)
            sd[f"{b}.self_attn.{pn}.bias"] = rng.randn(width).astype(np.float32)
        for ln in ("layer_norm1", "layer_norm2"):
            sd[f"{b}.{ln}.weight"] = rng.randn(width).astype(np.float32)
            sd[f"{b}.{ln}.bias"] = rng.randn(width).astype(np.float32)
        sd[f"{b}.mlp.fc1.weight"] = rng.randn(4 * width, width).astype(np.float32)
        sd[f"{b}.mlp.fc1.bias"] = rng.randn(4 * width).astype(np.float32)
        sd[f"{b}.mlp.fc2.weight"] = rng.randn(width, 4 * width).astype(np.float32)
        sd[f"{b}.mlp.fc2.bias"] = rng.randn(width).astype(np.float32)

    params = convert_clip_text_hf(sd, layers)
    cfg = CLIPTextConfig(width=width, layers=layers, heads=heads)
    model = CLIPTextEncoder(cfg=cfg)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))
    assert _tree_shapes(init["params"]) == _tree_shapes(params)
    out = model.apply({"params": params}, jnp.zeros((2, 77), jnp.int32))
    assert out["hidden"].shape == (2, 77, width)
