"""T5 encoder-decoder (t5-base family) in Flax, for keytotext prompt prep.

The reference's txt2sentence prompt pool is produced by
mrm8488/t5-base-finetuned-common_gen via torch `model.generate`
(prompts_engineering/txt2sentance_prompts.py:97-99).  This is that model
rebuilt TPU-first:

  * exact t5-base semantics: RMS layer norm (no mean/bias), pre-LN blocks,
    UNSCALED dot-product attention (the 1/sqrt(d) factor is folded into the
    checkpoint's init), bucketed relative-position bias held by layer 0 and
    shared by every layer, ReLU DenseReluDense, tied lm_head with the
    d_model^-0.5 output scaling;
  * decoding: batched greedy or seeded temperature sampling as one
    `lax.scan` over positions — static shapes, full recompute per step
    (<=32 new tokens, so KV-cache bookkeeping loses on TPU);
  * tokenizer: SentencePiece via the `sentencepiece` wheel when a .model
    file is present; deterministic hash fallback keeps the pipeline
    runnable in the zero-egress dev environment.

Weights port from the HF torch checkpoint via tools/convert_weights.py
(convert_t5); logits parity with transformers' T5ForConditionalGeneration
is asserted in tests/test_t5.py on a randomly-initialized tiny config.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

T5_PAD_ID = 0  # also the decoder start token
T5_EOS_ID = 1


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 768
    d_kv: int = 64
    d_ff: int = 3072
    layers: int = 12
    heads: int = 12
    rel_buckets: int = 32
    rel_max_distance: int = 128


class RMSNorm(nn.Module):
    """T5LayerNorm: scale-only RMS normalization in fp32."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        return (x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps) * scale).astype(x.dtype)


def relative_position_bucket(relative_position, bidirectional: bool,
                             num_buckets: int = 32, max_distance: int = 128):
    """HF T5's bucket function (modeling_t5._relative_position_bucket).
    relative_position = memory_pos - query_pos, any int array."""
    ret = jnp.zeros_like(relative_position)
    n = -relative_position
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


class T5Attention(nn.Module):
    cfg: T5Config
    has_rel_bias: bool = False
    bidirectional: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, kv, pos_bias=None, causal: bool = False, extra_bias=None):
        """x: (B, Lq, D); kv: (B, Lk, D).  Returns (out, pos_bias) so layer 0
        can hand its bias to the layers above it (T5 shares one bias table).
        `extra_bias` (padding mask) is added every layer, layer 0 included.
        NOTE: no 1/sqrt(d) scaling — T5 folds it into initialization."""
        cfg = self.cfg
        inner = cfg.heads * cfg.d_kv
        b, lq, _ = x.shape
        lk = kv.shape[1]
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="k")(kv)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="v")(kv)
        q = q.reshape(b, lq, cfg.heads, cfg.d_kv)
        k = k.reshape(b, lk, cfg.heads, cfg.d_kv)
        v = v.reshape(b, lk, cfg.heads, cfg.d_kv)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)

        if self.has_rel_bias and pos_bias is None:
            table = self.param(
                "relative_attention_bias", nn.initializers.normal(1.0),
                (cfg.rel_buckets, cfg.heads), jnp.float32,
            )
            rel = jnp.arange(lk)[None, :] - jnp.arange(lq)[:, None]  # mem - query
            bucket = relative_position_bucket(
                rel, self.bidirectional, cfg.rel_buckets, cfg.rel_max_distance
            )
            pos_bias = table[bucket].transpose(2, 0, 1)[None]  # (1, H, Lq, Lk)
        if pos_bias is not None:
            logits = logits + pos_bias
        if extra_bias is not None:
            logits = logits + extra_bias
        if causal:
            logits = logits + jnp.triu(jnp.full((lq, lk), -1e9, jnp.float32), k=1)[None, None]
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, lq, inner)
        return nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype, name="o")(out), pos_bias


class _T5FFN(nn.Module):
    cfg: T5Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = RMSNorm(name="layer_norm")(x)
        h = nn.Dense(self.cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi")(h)
        h = nn.relu(h)
        return x + nn.Dense(self.cfg.d_model, use_bias=False, dtype=self.dtype, name="wo")(h)


class T5Encoder(nn.Module):
    cfg: T5Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None):
        """x: (B, L, D) embedded input; attn_mask: (B, L) 1=keep."""
        cfg = self.cfg
        mask_bias = None
        if attn_mask is not None:
            mask_bias = (1.0 - attn_mask[:, None, None, :].astype(jnp.float32)) * -1e9
        pos_bias = None
        for i in range(cfg.layers):
            h = RMSNorm(name=f"block_{i}_ln0")(x)
            a, pos_bias = T5Attention(
                cfg, has_rel_bias=(i == 0), bidirectional=True, dtype=self.dtype,
                name=f"block_{i}_attn",
            )(h, h, None if i == 0 else pos_bias, extra_bias=mask_bias)
            x = x + a
            x = _T5FFN(cfg, self.dtype, name=f"block_{i}_ffn")(x)
        return RMSNorm(name="final_ln")(x)


class T5Decoder(nn.Module):
    cfg: T5Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, enc, enc_mask=None):
        cfg = self.cfg
        enc_bias = None
        if enc_mask is not None:
            enc_bias = (1.0 - enc_mask[:, None, None, :].astype(jnp.float32)) * -1e9
        pos_bias = None
        for i in range(cfg.layers):
            h = RMSNorm(name=f"block_{i}_ln0")(x)
            a, pos_bias = T5Attention(
                cfg, has_rel_bias=(i == 0), bidirectional=False, dtype=self.dtype,
                name=f"block_{i}_self",
            )(h, h, None if i == 0 else pos_bias, causal=True)
            x = x + a
            h = RMSNorm(name=f"block_{i}_ln1")(x)
            c, _ = T5Attention(cfg, dtype=self.dtype, name=f"block_{i}_cross")(h, enc, enc_bias)
            x = x + c
            x = _T5FFN(cfg, self.dtype, name=f"block_{i}_ffn")(x)
        return RMSNorm(name="final_ln")(x)


class T5ForGeneration(nn.Module):
    """Tied-embedding T5: logits = (dec_out * d_model^-0.5) @ shared_embed^T."""

    cfg: T5Config = T5Config()
    dtype: Any = jnp.float32

    def setup(self):
        self.shared = nn.Embed(self.cfg.vocab_size, self.cfg.d_model,
                               dtype=self.dtype, name="shared")
        self.encoder = T5Encoder(self.cfg, self.dtype)
        self.decoder = T5Decoder(self.cfg, self.dtype)

    def encode(self, input_ids, attn_mask=None):
        return self.encoder(self.shared(input_ids), attn_mask)

    def decode_logits(self, decoder_ids, enc, enc_mask=None):
        h = self.decoder(self.shared(decoder_ids), enc, enc_mask)
        h = h * (self.cfg.d_model ** -0.5)
        return self.shared.attend(h.astype(self.shared.embedding.dtype))

    def __call__(self, input_ids, decoder_ids, attn_mask=None):
        enc = self.encode(input_ids, attn_mask)
        return self.decode_logits(decoder_ids, enc, attn_mask)


def t5_generate_ids(apply_fn, params, input_ids, attn_mask=None, max_new_tokens: int = 32,
                    key: Optional[jax.Array] = None, temperature: float = 1.0,
                    top_k: int = 50) -> np.ndarray:
    """Batched decode as one compiled scan: greedy when `key` is None, else
    top-k temperature sampling.  top_k defaults to 50 because transformers'
    generate(do_sample=True) applies GenerationConfig's top_k=50 — the
    reference keytotext path never samples the full-vocab tail (top_k=0
    disables the filter).  Returns (B, 1+max_new_tokens) int32 starting with
    the pad/start token."""
    enc = apply_fn(params, "encode", input_ids, attn_mask)
    b = enc.shape[0]
    total = 1 + max_new_tokens
    ids0 = jnp.full((b, total), T5_PAD_ID, jnp.int32)

    def step(carry, inp):
        ids, done = carry
        pos, k = inp
        logits = apply_fn(params, "decode_logits", ids, enc, attn_mask)
        row = logits[:, pos - 1].astype(jnp.float32)
        if key is None:
            nxt = jnp.argmax(row, axis=-1).astype(jnp.int32)
        else:
            if top_k:
                kth = jnp.sort(row, axis=-1)[:, -top_k][:, None]
                row = jnp.where(row < kth, -jnp.inf, row)
            nxt = jax.random.categorical(k, row / temperature, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, T5_PAD_ID, nxt)
        ids = ids.at[:, pos].set(nxt)
        return (ids, done | (nxt == T5_EOS_ID)), None

    positions = jnp.arange(1, total)
    keys = jax.random.split(key if key is not None else jax.random.PRNGKey(0), total - 1)
    (ids, _), _ = jax.lax.scan(step, (ids0, jnp.zeros((b,), bool)), (positions, keys))
    return np.asarray(ids)


# ---------------------------------------------------------------------------
# SentencePiece tokenizer (T5 unigram vocab)
# ---------------------------------------------------------------------------
class T5Tokenizer:
    """Wraps a local spiece.model when present; otherwise a deterministic
    hash fallback (clearly non-semantic, `has_vocab` False) keeps the
    keytotext path runnable without weights."""

    def __init__(self, model_path: Optional[str] = None):
        self.sp = None
        if model_path and Path(model_path).exists():
            try:
                import sentencepiece as spm

                self.sp = spm.SentencePieceProcessor(model_file=model_path)
            except ImportError:  # wheel absent in this env; fallback below
                import logging

                logging.warning("sentencepiece not installed; T5 tokenizer falls back to hash ids")

    @property
    def has_vocab(self) -> bool:
        return self.sp is not None

    def encode(self, text: str) -> List[int]:
        if self.sp is not None:
            return list(self.sp.encode(text)) + [T5_EOS_ID]
        import hashlib

        ids = []
        for w in text.lower().split():
            h = int.from_bytes(hashlib.sha256(w.encode()).digest()[:4], "little")
            ids.append(2 + h % 32000)
        return ids + [T5_EOS_ID]

    def decode(self, ids: Sequence[int]) -> str:
        ids = [int(i) for i in ids if int(i) not in (T5_PAD_ID, T5_EOS_ID)]
        if self.sp is not None:
            return self.sp.decode(ids)
        return " ".join(f"[{i}]" for i in ids)


class FlaxKeytotextT5:
    """Callable keywords->sentence generator (gen/caption_tools.py plug)."""

    def __init__(self, weights_dir: Optional[str] = None, cfg: Optional[T5Config] = None,
                 params=None, seed: int = 0, max_new_tokens: int = 32, sample: bool = True):
        self.cfg = cfg or T5Config()
        self.model = T5ForGeneration(self.cfg)
        self.max_new_tokens = max_new_tokens
        self.sample = sample
        self._key = jax.random.PRNGKey(seed)
        tok_path = None
        if weights_dir:
            ckpt = Path(weights_dir) / "t5_keytotext"
            if ckpt.exists() and params is None:
                from saspa_tpu.utils.checkpoint import restore_checkpoint

                params = restore_checkpoint(str(ckpt))["params"]
            sp = Path(weights_dir) / "tokenizer" / "spiece.model"
            tok_path = str(sp) if sp.exists() else None
        self.tokenizer = T5Tokenizer(tok_path)
        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 2), jnp.int32)
            )["params"]
        self.params = params

    def _apply_fn(self, params, method, *args):
        return self.model.apply({"params": params}, *args, method=getattr(T5ForGeneration, method))

    def generate_batch(self, texts: Sequence[str]) -> List[str]:
        enc = [self.tokenizer.encode(t) for t in texts]
        l = max(len(e) for e in enc)
        ids = np.full((len(enc), l), T5_PAD_ID, np.int32)
        mask = np.zeros((len(enc), l), np.int32)
        for i, e in enumerate(enc):
            ids[i, : len(e)] = e
            mask[i, : len(e)] = 1
        if self.sample:
            self._key, k = jax.random.split(self._key)
        else:
            k = None
        out = t5_generate_ids(
            self._apply_fn, self.params, jnp.asarray(ids), jnp.asarray(mask),
            self.max_new_tokens, key=k,
        )
        return [self.tokenizer.decode(row[1:]) for row in out]

    def __call__(self, keywords: str) -> str:
        return self.generate_batch([keywords])[0]
