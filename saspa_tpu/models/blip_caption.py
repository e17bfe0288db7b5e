"""BLIP image-captioning model (and greedy decoder) in Flax.

The reference produces its captions JSON with LAVIS's blip_caption base_coco
(prompts_engineering/blip_utils.py:34-42: load_model_and_preprocess +
model.generate per image).  This is that model rebuilt TPU-first:

  * vision: timm-style ViT-B/16 (cls token + learned pos embed, pre-LN
    blocks, fused qkv with bias, eps 1e-6) over 384x384 inputs;
  * text: BERT-base decoder with causal self-attention, cross-attention to
    the image tokens, post-LN blocks, and the BERT MLM head
    (transform dense+LN, then vocab projection);
  * decoding: BATCHED greedy decode as one `lax.scan` over positions —
    static shapes, no KV-cache bookkeeping (the sequence is <=40 tokens, so
    full recompute per step is cheaper than dynamic shapes on TPU).

Weights port from the LAVIS checkpoint via tools/convert_weights.py
(convert_blip_caption); the exact key layout is proven offline in
tests/test_convert_real_layout.py.  The WordPiece tokenizer loads a standard
bert-base-uncased vocab.txt; without one (zero-egress dev env) a
deterministic fallback keeps the pipeline runnable end-to-end.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

BOS_ID = 30522  # LAVIS [DEC] token opens caption decoding
SEP_ID = 102  # BERT [SEP] terminates it
PAD_ID = 0
VOCAB = 30524
CAPTION_PROMPT = "a picture of "  # LAVIS blip_caption prompt


@dataclass(frozen=True)
class BlipViTConfig:
    image_size: int = 384
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12


@dataclass(frozen=True)
class BlipTextConfig:
    vocab_size: int = VOCAB
    width: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_positions: int = 512


class _ViTBlock(nn.Module):
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x).astype(x.dtype)
        qkv = nn.Dense(3 * w, dtype=self.dtype, name="attn_qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, l, _ = h.shape
        d = w // self.heads
        q = q.reshape(b, l, self.heads, d)
        k = k.reshape(b, l, self.heads, d)
        v = v.reshape(b, l, self.heads, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) / np.sqrt(d)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, l, w)
        x = x + nn.Dense(w, dtype=self.dtype, name="attn_proj")(attn)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x).astype(x.dtype)
        h = nn.Dense(4 * w, dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(w, dtype=self.dtype, name="mlp_fc2")(h)


class BlipViT(nn.Module):
    """timm-style ViT returning ALL tokens (cls + patches)."""

    cfg: BlipViTConfig = BlipViTConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):  # (B, H, W, 3) normalized
        cfg = self.cfg
        x = nn.Conv(cfg.width, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), dtype=self.dtype, name="patch_embed")(images)
        b, gh, gw, w = x.shape
        x = x.reshape(b, gh * gw, w)
        cls = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, cfg.width))
        x = jnp.concatenate([jnp.tile(cls.astype(x.dtype), (b, 1, 1)), x], axis=1)
        n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = self.param("pos_embed", nn.initializers.normal(0.02), (1, n_pos, cfg.width))
        x = x + pos[:, : x.shape[1]].astype(x.dtype)
        for i in range(cfg.layers):
            x = _ViTBlock(cfg.heads, self.dtype, name=f"blocks_{i}")(x)
        return nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x).astype(x.dtype)


def _mha(q_in, kv_in, heads, dtype, name_prefix, mask_bias=None):
    """BERT-style multi-head attention returning the pre-output-dense value."""
    w = q_in.shape[-1]
    d = w // heads
    b, lq, _ = q_in.shape
    lk = kv_in.shape[1]
    q = nn.Dense(w, dtype=dtype, name=f"{name_prefix}_query")(q_in).reshape(b, lq, heads, d)
    k = nn.Dense(w, dtype=dtype, name=f"{name_prefix}_key")(kv_in).reshape(b, lk, heads, d)
    v = nn.Dense(w, dtype=dtype, name=f"{name_prefix}_value")(kv_in).reshape(b, lk, heads, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) / np.sqrt(d)
    if mask_bias is not None:
        logits = logits + mask_bias
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, lq, w)


class _BertLayer(nn.Module):
    cfg: BlipTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, image_tokens, causal_bias, cross_bias=None):
        cfg = self.cfg
        w = cfg.width
        # self-attention (causal) + post-LN
        a = _mha(x, x, cfg.heads, self.dtype, "self", causal_bias)
        a = nn.Dense(w, dtype=self.dtype, name="self_out_dense")(a)
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="self_out_ln")(x + a).astype(a.dtype)
        # cross-attention to image tokens + post-LN (cross_bias masks padded
        # encoder positions — the VQA decoder's question states are padded)
        c = _mha(x, image_tokens, cfg.heads, self.dtype, "cross", cross_bias)
        c = nn.Dense(w, dtype=self.dtype, name="cross_out_dense")(c)
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="cross_out_ln")(x + c).astype(c.dtype)
        # FFN + post-LN
        h = nn.Dense(cfg.intermediate, dtype=self.dtype, name="intermediate_dense")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(w, dtype=self.dtype, name="output_dense")(h)
        return nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="output_ln")(x + h).astype(h.dtype)


class BlipTextDecoder(nn.Module):
    cfg: BlipTextConfig = BlipTextConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, token_ids, image_tokens, cross_mask=None):
        """token_ids: (B, L) int32 -> logits (B, L, vocab).  cross_mask:
        optional (B, Lk) 1=attendable encoder position (VQA question pad)."""
        cfg = self.cfg
        b, l = token_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.width, dtype=self.dtype, name="word_embeddings")(token_ids)
        pos = self.param("position_embeddings", nn.initializers.normal(0.02), (cfg.max_positions, cfg.width))
        # BERT adds token_type_embeddings; the decoder always uses type 0, so
        # row 0 is a learned constant added to every position
        tte = self.param("token_type_embeddings", nn.initializers.normal(0.02), (2, cfg.width))
        x = tok + pos[None, :l].astype(tok.dtype) + tte[0].astype(tok.dtype)
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="embeddings_ln")(x).astype(tok.dtype)
        causal = jnp.triu(jnp.full((l, l), -1e9, jnp.float32), k=1)[None, None]
        cross_bias = None
        if cross_mask is not None:
            cross_bias = (1.0 - cross_mask[:, None, None, :].astype(jnp.float32)) * -1e9
        for i in range(cfg.layers):
            x = _BertLayer(cfg, self.dtype, name=f"layer_{i}")(x, image_tokens, causal, cross_bias)
        # BERT MLM head
        h = nn.Dense(cfg.width, dtype=self.dtype, name="transform_dense")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="transform_ln")(h).astype(x.dtype)
        return nn.Dense(cfg.vocab_size, dtype=self.dtype, name="decoder")(h)


class BlipCaptioner(nn.Module):
    vit: BlipViTConfig = BlipViTConfig()
    text: BlipTextConfig = BlipTextConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.visual_encoder = BlipViT(self.vit, self.dtype)
        self.text_decoder = BlipTextDecoder(self.text, self.dtype)

    def __call__(self, images, token_ids):
        """Teacher-forced logits (training/eval path)."""
        return self.text_decoder(token_ids, self.visual_encoder(images))

    def encode_image(self, images):
        return self.visual_encoder(images)

    def decode_step_logits(self, token_ids, image_tokens):
        return self.text_decoder(token_ids, image_tokens)


def greedy_caption_ids(apply_fn, params, images, prompt_ids: Sequence[int],
                       max_len: int = 40) -> np.ndarray:
    """Batched greedy decode as one compiled scan.

    apply_fn(params, method, *args) -> module output; images (B,H,W,3).
    Returns (B, max_len) int32 ids: prompt, generated tokens, SEP, PAD..."""
    prompt = list(prompt_ids)
    n0 = len(prompt)
    assert 0 < n0 < max_len

    image_tokens = apply_fn(params, "encode_image", images)
    b = image_tokens.shape[0]
    ids0 = jnp.full((b, max_len), PAD_ID, jnp.int32)
    ids0 = ids0.at[:, :n0].set(jnp.asarray(prompt, jnp.int32)[None])

    def step(carry, pos):
        ids, done = carry
        logits = apply_fn(params, "decode_step_logits", ids, image_tokens)
        nxt = jnp.argmax(logits[:, pos - 1], axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, PAD_ID, nxt)
        ids = ids.at[:, pos].set(nxt)
        return (ids, done | (nxt == SEP_ID)), None

    positions = jnp.arange(n0, max_len)
    (ids, _), _ = jax.lax.scan(step, (ids0, jnp.zeros((b,), bool)), positions)
    return ids


# ---------------------------------------------------------------------------
# WordPiece tokenizer (bert-base-uncased vocab)
# ---------------------------------------------------------------------------
class WordPieceTokenizer:
    """Greedy longest-match WordPiece with BERT basic cleaning.  Loads a
    standard vocab.txt; without one, a deterministic id-hash fallback keeps
    decode/encode runnable (clearly non-semantic, `has_vocab` False)."""

    def __init__(self, vocab_path: Optional[str] = None):
        self.vocab: dict = {}
        self.inv: dict = {}
        if vocab_path and Path(vocab_path).exists():
            words = Path(vocab_path).read_text(encoding="utf-8").splitlines()
            self.vocab = {w: i for i, w in enumerate(words)}
            self.inv = {i: w for w, i in self.vocab.items()}

    @property
    def has_vocab(self) -> bool:
        return bool(self.vocab)

    def encode(self, text: str) -> List[int]:
        import re

        words = re.findall(r"[a-z0-9]+|[^\sa-z0-9]", text.lower())
        ids: List[int] = []
        for word in words:
            if not self.has_vocab:
                import hashlib

                h = int.from_bytes(hashlib.sha256(word.encode()).digest()[:4], "little")
                ids.append(1000 + h % (VOCAB - 2000))
                continue
            start, pieces = 0, []
            while start < len(word):
                end = len(word)
                piece = None
                while end > start:
                    cand = ("##" if start else "") + word[start:end]
                    if cand in self.vocab:
                        piece = cand
                        break
                    end -= 1
                if piece is None:
                    pieces = [self.vocab.get("[UNK]", 100)]
                    break
                pieces.append(self.vocab[piece])
                start = end
            ids.extend(pieces)
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        toks = []
        for i in ids:
            i = int(i)
            if i in (PAD_ID, BOS_ID, SEP_ID):
                continue
            t = self.inv.get(i, f"[{i}]")
            if t.startswith("##") and toks:
                toks[-1] += t[2:]
            else:
                toks.append(t)
        return " ".join(toks)


def blip_preprocess(images_uint8: np.ndarray, size: int = 384) -> jnp.ndarray:
    """(B, H, W, 3) uint8 -> normalized float (B, size, size, 3).
    LAVIS blip eval processor: resize + normalize with CLIP-ish stats."""
    mean = np.asarray((0.48145466, 0.4578275, 0.40821073), np.float32)
    std = np.asarray((0.26862954, 0.26130258, 0.27577711), np.float32)
    x = jnp.asarray(images_uint8, jnp.float32) / 255.0
    b, h, w, c = x.shape
    if (h, w) != (size, size):
        x = jax.image.resize(x, (b, size, size, c), method="bicubic")
    return (x - mean) / std


class FlaxBlipCaptioner:
    """Callable path->caption captioner (the gen/caption_tools.py plug)."""

    def __init__(self, weights_dir: Optional[str] = None, max_len: int = 40,
                 vit: Optional[BlipViTConfig] = None, text: Optional[BlipTextConfig] = None,
                 params=None, seed: int = 0):
        self.model = BlipCaptioner(vit or BlipViTConfig(), text or BlipTextConfig(), dtype=jnp.float32)
        self.max_len = max_len
        vocab_path = None
        if weights_dir:
            cand = Path(weights_dir) / "blip_caption"
            if cand.exists() and params is None:
                from saspa_tpu.utils.checkpoint import restore_checkpoint

                params = restore_checkpoint(str(cand))["params"]
            vp = Path(weights_dir) / "tokenizer" / "vocab.txt"
            vocab_path = str(vp) if vp.exists() else None
        self.tokenizer = WordPieceTokenizer(vocab_path)
        if params is None:
            size = self.model.vit.image_size
            params = self.model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, size, size, 3)), jnp.zeros((1, 4), jnp.int32)
            )["params"]
        self.params = params
        # jit the WHOLE encode+scan decode (per batch shape): un-jitted, the
        # ViT runs op-by-op and the eager lax.scan re-traces the decoder on
        # every caption call — the production caller captions per image
        self._decode_jit = None

    def _apply_fn(self, params, method, *args):
        m = getattr(BlipCaptioner, method)
        return self.model.apply({"params": params}, *args, method=m)

    def caption_batch(self, images_uint8: np.ndarray) -> List[str]:
        images = blip_preprocess(images_uint8, self.model.vit.image_size)
        prompt_ids = tuple([BOS_ID] + self.tokenizer.encode(CAPTION_PROMPT.strip()))
        if self._decode_jit is None:
            self._decode_jit = jax.jit(
                lambda p, imgs: greedy_caption_ids(self._apply_fn, p, imgs, prompt_ids, self.max_len)
            )
        ids = np.asarray(self._decode_jit(self.params, images))
        n0 = len(prompt_ids)
        return [self.tokenizer.decode(row[n0:]) for row in ids]

    def __call__(self, path: str) -> str:
        from PIL import Image

        img = np.asarray(Image.open(path).convert("RGB"))[None]
        return self.caption_batch(img)[0]
