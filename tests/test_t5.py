"""TPU-native T5 (models/t5.py) vs transformers' T5ForConditionalGeneration.

The parity test instantiates a RANDOM-INIT torch T5 from a local T5Config (no
network), runs tools/convert_weights.convert_t5 over its state_dict, and
asserts teacher-forced logits match — this catches transposes, the unscaled
attention, RMS-norm placement, relative-position bucketing, and the tied
lm_head d_model^-0.5 scaling in one go.  Reference consumer:
prompts_engineering/txt2sentance_prompts.py:97-99 (keytotext generate).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saspa_tpu.models.t5 import (
    FlaxKeytotextT5,
    T5Config,
    T5ForGeneration,
    relative_position_bucket,
    t5_generate_ids,
)

TINY = T5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=64, layers=2, heads=4)


def _torch_tiny():
    import torch
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    cfg = HFT5Config(
        vocab_size=TINY.vocab_size, d_model=TINY.d_model, d_kv=TINY.d_kv,
        d_ff=TINY.d_ff, num_layers=TINY.layers, num_heads=TINY.heads,
        relative_attention_num_buckets=TINY.rel_buckets,
        relative_attention_max_distance=TINY.rel_max_distance,
        dropout_rate=0.0, feed_forward_proj="relu", tie_word_embeddings=True,
        decoder_start_token_id=0,
    )
    torch.manual_seed(0)
    return T5ForConditionalGeneration(cfg).eval()


def test_bucket_function_matches_hf():
    import torch
    from transformers.models.t5.modeling_t5 import T5Attention as HFT5Attention

    rel = np.arange(-300, 300, dtype=np.int64).reshape(1, -1)
    for bidir in (True, False):
        ours = np.asarray(relative_position_bucket(jnp.asarray(rel), bidir, 32, 128))
        theirs = HFT5Attention._relative_position_bucket(
            torch.as_tensor(rel), bidirectional=bidir, num_buckets=32, max_distance=128
        ).numpy()
        np.testing.assert_array_equal(ours, theirs)


def test_t5_logits_parity_with_torch():
    import torch

    from tools.convert_weights import convert_t5

    tm = _torch_tiny()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    consumed = convert_t5(sd, layers=TINY.layers)

    model = T5ForGeneration(TINY)
    rng = np.random.RandomState(0)
    inp = rng.randint(2, TINY.vocab_size, (2, 9)).astype(np.int32)
    dec = rng.randint(2, TINY.vocab_size, (2, 5)).astype(np.int32)
    mask = np.ones_like(inp)
    mask[0, 7:] = 0  # exercise the padding-mask path, layer 0 included

    ours = model.apply(
        {"params": consumed}, jnp.asarray(inp), jnp.asarray(dec), jnp.asarray(mask)
    )
    with torch.no_grad():
        theirs = tm(
            input_ids=torch.as_tensor(inp.astype(np.int64)),
            attention_mask=torch.as_tensor(mask.astype(np.int64)),
            decoder_input_ids=torch.as_tensor(dec.astype(np.int64)),
        ).logits.numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=2e-4)


def test_t5_convert_consumes_every_key():
    from tools.convert_weights import convert_t5

    tm = _torch_tiny()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    p = convert_t5(sd, layers=TINY.layers)

    def count(t):
        return sum(count(v) for v in t.values()) if isinstance(t, dict) else 1

    # every torch key maps; shared.weight also covers its tied aliases
    tied = {"lm_head.weight", "encoder.embed_tokens.weight", "decoder.embed_tokens.weight"}
    for k in tied & set(sd):
        np.testing.assert_array_equal(sd[k], sd["shared.weight"])
    n_src = len(set(sd) - tied)
    assert count(p) == n_src, (count(p), n_src)
    # converted tree matches the module's param structure exactly
    ref = T5ForGeneration(TINY).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3), jnp.int32), jnp.zeros((1, 2), jnp.int32)
    )["params"]
    flat_ref = jax.tree_util.tree_structure(ref)
    flat_got = jax.tree_util.tree_structure(jax.tree_util.tree_map(np.asarray, p))
    assert flat_ref == flat_got


def test_generate_greedy_deterministic_and_stops():
    gen = FlaxKeytotextT5(cfg=TINY, sample=False, max_new_tokens=8)
    a = gen.generate_batch(["car, of type sedan", "bird"])
    b = gen.generate_batch(["car, of type sedan", "bird"])
    assert a == b and len(a) == 2


def test_generate_sampled_varies_with_seed():
    g1 = FlaxKeytotextT5(cfg=TINY, sample=True, seed=1, max_new_tokens=8)
    g2 = FlaxKeytotextT5(cfg=TINY, sample=True, seed=2, max_new_tokens=8)
    ids1 = t5_generate_ids(g1._apply_fn, g1.params, jnp.ones((1, 4), jnp.int32),
                           key=jax.random.PRNGKey(1), max_new_tokens=12)
    ids2 = t5_generate_ids(g1._apply_fn, g1.params, jnp.ones((1, 4), jnp.int32),
                           key=jax.random.PRNGKey(2), max_new_tokens=12)
    assert ids1.shape == (1, 13)
    assert not np.array_equal(ids1, ids2)  # different seeds explore differently
    del g2


def test_caption_tools_uses_flax_t5(tmp_path):
    """generate_txt2sentence_prompts accepts the FlaxKeytotextT5 plug and
    applies the keyword-membership filter + dedup + schema."""
    import json

    from saspa_tpu.gen.caption_tools import generate_txt2sentence_prompts

    gen = FlaxKeytotextT5(cfg=TINY, sample=False, max_new_tokens=4)
    calls = []

    def wrapped(inp):
        calls.append(inp)
        s = gen(inp)
        return f"a plane {s}"  # hash-fallback tokens aren't words; force keyword

    path = generate_txt2sentence_prompts(
        "planes", 3, str(tmp_path), sentence_generator=wrapped, classnames=["airplane"]
    )
    data = json.loads(open(path).read())
    assert set(data) == {"airplane"} and all("plane" in s for s in data["airplane"])
    assert len(calls) == 3
