"""BLIP-Diffusion Q-Former vs transformers' torch Blip2QFormerModel.

The query-only path of our QFormer (text_ids=None) is computationally
identical to transformers' Blip2QFormerModel (the LAVIS/diffusers
blip-diffusion Q-Former minus the text branch): input layernorm, post-LN
BERT layers, cross-attention every cross_frequency layers, query FFN.  The
parity test converts a random-init torch model with
convert_blip_diffusion_qformer, composes the diffusers ProjLayer
(x + dense2(QuickGELU(dense1(LayerNorm(x)))) — pre-LN, quick-gelu, no
trailing norm) in torch, and asserts the full subject embeddings match.  The text branch (queries+category concat, padding mask)
is checked by invariance: masked padding must not change the query outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np

from saspa_tpu.models.blip_diffusion import QFormer
from tools.convert_weights import convert_blip_diffusion_qformer

W, LAYERS, HEADS, Q, E = 32, 4, 4, 6, 48  # E = vision width


def _torch_qformer():
    import torch
    from transformers import Blip2QFormerConfig
    from transformers.models.blip_2.modeling_blip_2 import Blip2QFormerModel

    cfg = Blip2QFormerConfig(
        hidden_size=W, num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        intermediate_size=4 * W, cross_attention_frequency=2,
        encoder_hidden_size=E, attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    return Blip2QFormerModel(cfg).eval()


def test_query_only_parity_with_torch():
    import torch

    tm = _torch_qformer()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    torch.manual_seed(1)
    query_tokens = torch.randn(1, Q, W) * 0.2
    d1 = torch.nn.Linear(W, 4 * W)
    d2 = torch.nn.Linear(4 * W, W)
    pln = torch.nn.LayerNorm(W, eps=1e-12)

    sd["query_tokens"] = query_tokens.numpy()
    sd["proj_layer.dense1.weight"] = d1.weight.detach().numpy()
    sd["proj_layer.dense1.bias"] = d1.bias.detach().numpy()
    sd["proj_layer.dense2.weight"] = d2.weight.detach().numpy()
    sd["proj_layer.dense2.bias"] = d2.bias.detach().numpy()
    sd["proj_layer.LayerNorm.weight"] = pln.weight.detach().numpy()
    sd["proj_layer.LayerNorm.bias"] = pln.bias.detach().numpy()

    params = convert_blip_diffusion_qformer(sd, layers=LAYERS)

    ours = QFormer(width=W, layers=LAYERS, heads=HEADS, num_queries=Q, out_dim=W)
    rng = np.random.RandomState(0)
    img = rng.randn(2, 9, E).astype(np.float32)
    got = ours.apply({"params": params}, jnp.asarray(img))

    with torch.no_grad():
        enc = tm(
            query_embeds=query_tokens.expand(2, -1, -1),
            encoder_hidden_states=torch.as_tensor(img),
        ).last_hidden_state
        # diffusers ProjLayer.forward: x_in = x; x = LayerNorm(x);
        # x = dropout(dense2(QuickGELU(dense1(x)))) + x_in
        h = d1(pln(enc))
        h = h * torch.sigmoid(1.702 * h)
        ref = (enc + d2(h)).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, rtol=3e-4, atol=3e-4)


def test_text_branch_mask_invariance():
    """Padded category tokens behind the mask must not perturb the query
    outputs; real (unmasked) text must."""
    ours = QFormer(width=W, layers=2, heads=HEADS, num_queries=Q, out_dim=W, vocab_size=64)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, 9, E).astype(np.float32))
    ids_a = jnp.asarray([[5, 7, 0, 0]], jnp.int32)
    ids_b = jnp.asarray([[5, 7, 9, 11]], jnp.int32)  # different PADDED tail
    mask = jnp.asarray([[1, 1, 0, 0]], jnp.int32)
    p = ours.init(jax.random.PRNGKey(0), img, ids_a, mask)["params"]
    out_a = ours.apply({"params": p}, img, ids_a, mask)
    out_b = ours.apply({"params": p}, img, ids_b, mask)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)
    # unmasked different text MUST change the queries
    full = jnp.ones_like(mask)
    out_c = ours.apply({"params": p}, img, ids_a, full)
    out_d = ours.apply({"params": p}, img, ids_b, full)
    assert np.abs(np.asarray(out_c) - np.asarray(out_d)).max() > 1e-4


def test_converter_consumes_every_key_with_text_branch():
    """Full LAVIS-style layout (embeddings + text FFN + proj) — every key
    consumed, tree matches init exactly."""
    from tests.test_convert_real_layout import TrackingSD, _assert_tree_equal
    from tools import synth_checkpoints as synth

    sd = TrackingSD(synth.blip_diffusion_qformer_state_dict(
        width=W, layers=LAYERS, queries=Q, enc_width=E, vocab=64
    ))
    params = convert_blip_diffusion_qformer(sd, layers=LAYERS)
    leftover = {k for k in sd if k not in sd.read and "position_ids" not in k}
    assert not leftover, sorted(leftover)[:8]

    # max_positions stays the bert-base default 512 — the real export carries
    # the full table and the flax module matches it
    ours = QFormer(width=W, layers=LAYERS, heads=HEADS, num_queries=Q, out_dim=W,
                   vocab_size=64)
    init = jax.eval_shape(
        lambda img, ids, m: ours.init(jax.random.PRNGKey(0), img, ids, m),
        jax.ShapeDtypeStruct((1, 9, E), jnp.float32),
        jax.ShapeDtypeStruct((1, 4), jnp.int32),
        jax.ShapeDtypeStruct((1, 4), jnp.int32),
    )
    _assert_tree_equal(params, init["params"], "qformer params")
