"""BLIP captioner building blocks vs torch reference implementations.

models/blip_caption.py's converter is proven against the LAVIS key layout in
test_convert_real_layout.py; these tests prove the MODULE MATH itself against
transformers' torch implementations on random-init tiny configs (no network):

  * BlipTextDecoder vs BertLMHeadModel(is_decoder, add_cross_attention):
    causal self-attention, cross-attention to image tokens, post-LN blocks,
    and the BERT MLM head in one logits comparison.
  * BlipViT vs ViTModel (layer_norm_eps=1e-6, qkv fused in-test): pre-LN
    blocks, cls token, learned position embeddings.
"""

import jax
import jax.numpy as jnp
import numpy as np

from saspa_tpu.models.blip_caption import (
    BlipTextConfig,
    BlipTextDecoder,
    BlipViT,
    BlipViTConfig,
)

W, LAYERS, HEADS, VOCAB = 32, 2, 4, 120


def _t2f(w):
    return np.ascontiguousarray(w.T)


def test_text_decoder_matches_bert_lm_head():
    import torch
    from transformers import BertConfig, BertLMHeadModel

    cfg = BertConfig(
        vocab_size=VOCAB, hidden_size=W, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=2 * W,
        max_position_embeddings=24, is_decoder=True, add_cross_attention=True,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        pad_token_id=0,
    )
    torch.manual_seed(0)
    tm = BertLMHeadModel(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    p: dict = {}

    def dense(src, dst):
        p.setdefault(dst, {})["kernel"] = _t2f(sd[f"{src}.weight"])
        p[dst]["bias"] = sd[f"{src}.bias"]

    def ln(src, dst):
        p.setdefault(dst, {})["scale"] = sd[f"{src}.weight"]
        p[dst]["bias"] = sd[f"{src}.bias"]

    p["word_embeddings"] = {"embedding": sd["bert.embeddings.word_embeddings.weight"]}
    p["position_embeddings"] = sd["bert.embeddings.position_embeddings.weight"]
    p["token_type_embeddings"] = sd["bert.embeddings.token_type_embeddings.weight"]
    ln("bert.embeddings.LayerNorm", "embeddings_ln")
    for i in range(LAYERS):
        src = f"bert.encoder.layer.{i}"
        dst = f"layer_{i}"
        sub = {}
        for kind, pre in (("attention", "self"), ("crossattention", "cross")):
            for m in ("query", "key", "value"):
                sub[f"{pre}_{m}"] = {
                    "kernel": _t2f(sd[f"{src}.{kind}.self.{m}.weight"]),
                    "bias": sd[f"{src}.{kind}.self.{m}.bias"],
                }
            sub[f"{pre}_out_dense"] = {
                "kernel": _t2f(sd[f"{src}.{kind}.output.dense.weight"]),
                "bias": sd[f"{src}.{kind}.output.dense.bias"],
            }
            sub[f"{pre}_out_ln"] = {
                "scale": sd[f"{src}.{kind}.output.LayerNorm.weight"],
                "bias": sd[f"{src}.{kind}.output.LayerNorm.bias"],
            }
        sub["intermediate_dense"] = {
            "kernel": _t2f(sd[f"{src}.intermediate.dense.weight"]),
            "bias": sd[f"{src}.intermediate.dense.bias"],
        }
        sub["output_dense"] = {
            "kernel": _t2f(sd[f"{src}.output.dense.weight"]),
            "bias": sd[f"{src}.output.dense.bias"],
        }
        sub["output_ln"] = {
            "scale": sd[f"{src}.output.LayerNorm.weight"],
            "bias": sd[f"{src}.output.LayerNorm.bias"],
        }
        p[dst] = sub
    dense("cls.predictions.transform.dense", "transform_dense")
    ln("cls.predictions.transform.LayerNorm", "transform_ln")
    p["decoder"] = {
        "kernel": _t2f(sd["cls.predictions.decoder.weight"]),
        "bias": sd["cls.predictions.bias"],
    }

    ours = BlipTextDecoder(BlipTextConfig(
        vocab_size=VOCAB, width=W, layers=LAYERS, heads=HEADS,
        intermediate=2 * W, max_positions=24,
    ))
    rng = np.random.RandomState(0)
    ids = rng.randint(1, VOCAB, (2, 7)).astype(np.int32)
    imtok = rng.randn(2, 5, W).astype(np.float32)
    got = ours.apply({"params": p}, jnp.asarray(ids), jnp.asarray(imtok))
    with torch.no_grad():
        ref = tm(
            input_ids=torch.as_tensor(ids.astype(np.int64)),
            encoder_hidden_states=torch.as_tensor(imtok),
        ).logits.numpy()
    np.testing.assert_allclose(np.asarray(got), ref, rtol=3e-4, atol=3e-4)


def _bert_params_from_sd(sd, layers, prefix="bert"):
    """transformers BertModel state_dict -> our BERT-body param tree
    (shared by the decoder and the VQA fusion-encoder parity tests)."""
    prefix = prefix + "." if prefix else ""
    p: dict = {}
    p["word_embeddings"] = {"embedding": sd[f"{prefix}embeddings.word_embeddings.weight"]}
    p["position_embeddings"] = sd[f"{prefix}embeddings.position_embeddings.weight"]
    p["token_type_embeddings"] = sd[f"{prefix}embeddings.token_type_embeddings.weight"]
    p["embeddings_ln"] = {"scale": sd[f"{prefix}embeddings.LayerNorm.weight"],
                          "bias": sd[f"{prefix}embeddings.LayerNorm.bias"]}
    for i in range(layers):
        src = f"{prefix}encoder.layer.{i}"
        sub = {}
        for kind, pre in (("attention", "self"), ("crossattention", "cross")):
            for m in ("query", "key", "value"):
                sub[f"{pre}_{m}"] = {
                    "kernel": _t2f(sd[f"{src}.{kind}.self.{m}.weight"]),
                    "bias": sd[f"{src}.{kind}.self.{m}.bias"],
                }
            sub[f"{pre}_out_dense"] = {
                "kernel": _t2f(sd[f"{src}.{kind}.output.dense.weight"]),
                "bias": sd[f"{src}.{kind}.output.dense.bias"],
            }
            sub[f"{pre}_out_ln"] = {
                "scale": sd[f"{src}.{kind}.output.LayerNorm.weight"],
                "bias": sd[f"{src}.{kind}.output.LayerNorm.bias"],
            }
        sub["intermediate_dense"] = {
            "kernel": _t2f(sd[f"{src}.intermediate.dense.weight"]),
            "bias": sd[f"{src}.intermediate.dense.bias"],
        }
        sub["output_dense"] = {
            "kernel": _t2f(sd[f"{src}.output.dense.weight"]),
            "bias": sd[f"{src}.output.dense.bias"],
        }
        sub["output_ln"] = {
            "scale": sd[f"{src}.output.LayerNorm.weight"],
            "bias": sd[f"{src}.output.LayerNorm.bias"],
        }
        p[f"layer_{i}"] = sub
    return p


def test_vqa_fusion_encoder_matches_bert_model():
    """BlipTextEncoder (bidirectional self-attn + cross-attn every layer +
    question padding mask) vs torch BertModel.  The torch side gets an
    explicit (B, L, L) attention mask, which bypasses its is_decoder causal
    mask construction — exactly BLIP med.py's 'multimodal' encoder mode."""
    import torch
    from transformers import BertConfig, BertModel

    from saspa_tpu.models.blip_vqa import BlipTextEncoder

    cfg = BertConfig(
        vocab_size=VOCAB, hidden_size=W, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=2 * W,
        max_position_embeddings=24, is_decoder=True, add_cross_attention=True,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        pad_token_id=0,
    )
    torch.manual_seed(1)
    tm = BertModel(cfg, add_pooling_layer=False).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    p = _bert_params_from_sd(sd, LAYERS, prefix="")
    # state dict keys start with "embeddings."/"encoder." (no bert. prefix)
    p = {k: v for k, v in p.items()}

    ours = BlipTextEncoder(BlipTextConfig(
        vocab_size=VOCAB, width=W, layers=LAYERS, heads=HEADS,
        intermediate=2 * W, max_positions=24,
    ))
    rng = np.random.RandomState(2)
    ids = rng.randint(1, VOCAB, (2, 6)).astype(np.int32)
    mask = np.asarray([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]], np.int32)
    imtok = rng.randn(2, 5, W).astype(np.float32)
    got = ours.apply({"params": p}, jnp.asarray(ids), jnp.asarray(imtok), jnp.asarray(mask))
    with torch.no_grad():
        full = np.broadcast_to(mask[:, None, :], (2, 6, 6)).copy()
        ref = tm(
            input_ids=torch.as_tensor(ids.astype(np.int64)),
            attention_mask=torch.as_tensor(full),  # 3D mask => bidirectional
            encoder_hidden_states=torch.as_tensor(imtok),
        ).last_hidden_state.numpy()
    # padded positions carry garbage on both sides; compare real positions
    got = np.asarray(got) * mask[..., None]
    ref = ref * mask[..., None]
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_decoder_cross_mask_matches_bert_lm_head():
    """BlipTextDecoder's cross_mask (VQA: padded question states masked out
    of cross-attention) vs BertLMHeadModel's encoder_attention_mask."""
    import torch
    from transformers import BertConfig, BertLMHeadModel

    cfg = BertConfig(
        vocab_size=VOCAB, hidden_size=W, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=2 * W,
        max_position_embeddings=24, is_decoder=True, add_cross_attention=True,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        pad_token_id=0,
    )
    torch.manual_seed(3)
    tm = BertLMHeadModel(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    p = _bert_params_from_sd(sd, LAYERS, prefix="bert")
    p["transform_dense"] = {"kernel": _t2f(sd["cls.predictions.transform.dense.weight"]),
                            "bias": sd["cls.predictions.transform.dense.bias"]}
    p["transform_ln"] = {"scale": sd["cls.predictions.transform.LayerNorm.weight"],
                         "bias": sd["cls.predictions.transform.LayerNorm.bias"]}
    p["decoder"] = {"kernel": _t2f(sd["cls.predictions.decoder.weight"]),
                    "bias": sd["cls.predictions.bias"]}

    ours = BlipTextDecoder(BlipTextConfig(
        vocab_size=VOCAB, width=W, layers=LAYERS, heads=HEADS,
        intermediate=2 * W, max_positions=24,
    ))
    rng = np.random.RandomState(4)
    ids = rng.randint(1, VOCAB, (2, 5)).astype(np.int32)
    states = rng.randn(2, 6, W).astype(np.float32)
    smask = np.asarray([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 0]], np.int32)
    got = ours.apply({"params": p}, jnp.asarray(ids), jnp.asarray(states),
                     cross_mask=jnp.asarray(smask))
    with torch.no_grad():
        ref = tm(
            input_ids=torch.as_tensor(ids.astype(np.int64)),
            encoder_hidden_states=torch.as_tensor(states),
            encoder_attention_mask=torch.as_tensor(smask),
        ).logits.numpy()
    np.testing.assert_allclose(np.asarray(got), ref, rtol=3e-4, atol=3e-4)


def test_vit_matches_hf_vit():
    import torch
    from transformers import ViTConfig, ViTModel

    size, patch = 16, 8
    cfg = ViTConfig(
        hidden_size=W, num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        intermediate_size=4 * W, image_size=size, patch_size=patch,
        layer_norm_eps=1e-6, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    tm = ViTModel(cfg, add_pooling_layer=False).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    p: dict = {"cls_token": sd["embeddings.cls_token"],
               "pos_embed": sd["embeddings.position_embeddings"]}
    w = sd["embeddings.patch_embeddings.projection.weight"]  # (W, 3, p, p)
    p["patch_embed"] = {
        "kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
        "bias": sd["embeddings.patch_embeddings.projection.bias"],
    }
    for i in range(LAYERS):
        src = f"encoder.layer.{i}"
        qw = sd[f"{src}.attention.attention.query.weight"]
        kw = sd[f"{src}.attention.attention.key.weight"]
        vw = sd[f"{src}.attention.attention.value.weight"]
        qb = sd[f"{src}.attention.attention.query.bias"]
        kb = sd[f"{src}.attention.attention.key.bias"]
        vb = sd[f"{src}.attention.attention.value.bias"]
        p[f"blocks_{i}"] = {
            "norm1": {"scale": sd[f"{src}.layernorm_before.weight"],
                      "bias": sd[f"{src}.layernorm_before.bias"]},
            "attn_qkv": {"kernel": _t2f(np.concatenate([qw, kw, vw], 0)),
                         "bias": np.concatenate([qb, kb, vb])},
            "attn_proj": {"kernel": _t2f(sd[f"{src}.attention.output.dense.weight"]),
                          "bias": sd[f"{src}.attention.output.dense.bias"]},
            "norm2": {"scale": sd[f"{src}.layernorm_after.weight"],
                      "bias": sd[f"{src}.layernorm_after.bias"]},
            "mlp_fc1": {"kernel": _t2f(sd[f"{src}.intermediate.dense.weight"]),
                        "bias": sd[f"{src}.intermediate.dense.bias"]},
            "mlp_fc2": {"kernel": _t2f(sd[f"{src}.output.dense.weight"]),
                        "bias": sd[f"{src}.output.dense.bias"]},
        }
    p["norm"] = {"scale": sd["layernorm.weight"], "bias": sd["layernorm.bias"]}

    ours = BlipViT(BlipViTConfig(image_size=size, patch_size=patch, width=W,
                                 layers=LAYERS, heads=HEADS))
    rng = np.random.RandomState(1)
    img = rng.randn(2, size, size, 3).astype(np.float32)
    got = ours.apply({"params": p}, jnp.asarray(img))
    with torch.no_grad():
        ref = tm(
            pixel_values=torch.as_tensor(img.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(got), ref, rtol=3e-4, atol=3e-4)
