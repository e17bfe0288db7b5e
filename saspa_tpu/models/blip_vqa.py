"""BLIP VQA model (LAVIS blip_vqa vqav2) in Flax.

The reference loads `blip_vqa` next to the captioner to answer optional
per-image questions during caption prep (prompts_engineering/
blip_utils.py:34-53: `model.generate({"image":..., "text_input": question},
inference_method="generate")`).  This is that model rebuilt TPU-first:

  * vision: the captioner's timm-style ViT-B/16 (`BlipViT`) at 480x480
    (LAVIS vqav2 eval processor size);
  * question encoder: BERT-base *fusion* encoder — bidirectional
    self-attention over the question tokens (first token replaced by the
    [ENC] id, LAVIS blip_vqa.py) with cross-attention to the image tokens in
    EVERY layer, post-LN blocks;
  * answer decoder: the captioner's `BlipTextDecoder` (causal BERT +
    cross-attention + MLM head) cross-attending to the QUESTION states, with
    padded question positions masked; decoding opens with the [DEC] token.
  * decoding: batched greedy `lax.scan` (static shapes; answers are <=10
    tokens, so full recompute per step beats dynamic KV caches on TPU).
    LAVIS decodes with num_beams=3; greedy is the TPU-first choice and the
    quality delta on <=10-token answers is negligible for prompt prep.

Weights port from the LAVIS checkpoint via tools/convert_weights.py
(convert_blip_vqa); exact key layout proven offline in
tests/test_convert_real_layout.py, module math proven against torch
BertModel/BertLMHeadModel/ViTModel composition in tests/test_blip_parity.py.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from saspa_tpu.models.blip_caption import (
    BOS_ID,
    PAD_ID,
    SEP_ID,
    _BertLayer,
    BlipTextConfig,
    BlipTextDecoder,
    BlipViT,
    BlipViTConfig,
    WordPieceTokenizer,
    blip_preprocess,
)

ENC_ID = 30523  # LAVIS [ENC] token replaces the question's [CLS]
CLS_ID = 101
VQA_IMAGE_SIZE = 480  # LAVIS blip_vqa vqav2 eval processor
MAX_QUESTION_LEN = 32
MAX_ANSWER_LEN = 10  # LAVIS predict_answers max_len


class BlipTextEncoder(nn.Module):
    """BERT fusion encoder: bidirectional self-attention over question
    tokens + cross-attention to image tokens in every layer (LAVIS med.py
    BertModel in 'multimodal' mode, as used by blip_vqa's text_encoder)."""

    cfg: BlipTextConfig = BlipTextConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, token_ids, image_tokens, attention_mask=None):
        """token_ids: (B, L) int32; attention_mask: (B, L) 1=real token.
        Returns last hidden states (B, L, W)."""
        cfg = self.cfg
        b, l = token_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.width, dtype=self.dtype, name="word_embeddings")(token_ids)
        pos = self.param("position_embeddings", nn.initializers.normal(0.02), (cfg.max_positions, cfg.width))
        tte = self.param("token_type_embeddings", nn.initializers.normal(0.02), (2, cfg.width))
        x = tok + pos[None, :l].astype(tok.dtype) + tte[0].astype(tok.dtype)
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="embeddings_ln")(x).astype(tok.dtype)
        bias = None
        if attention_mask is not None:
            bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -1e9
        for i in range(cfg.layers):
            x = _BertLayer(cfg, self.dtype, name=f"layer_{i}")(x, image_tokens, bias)
        return x


class BlipVQA(nn.Module):
    """Image + question -> teacher-forced answer logits / question states."""

    vit: BlipViTConfig = BlipViTConfig(image_size=VQA_IMAGE_SIZE)
    text: BlipTextConfig = BlipTextConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.visual_encoder = BlipViT(self.vit, self.dtype)
        self.text_encoder = BlipTextEncoder(self.text, self.dtype)
        self.text_decoder = BlipTextDecoder(self.text, self.dtype)

    def __call__(self, images, question_ids, question_mask, answer_ids):
        """Teacher-forced logits (B, L_ans, vocab)."""
        states = self.encode(images, question_ids, question_mask)
        return self.text_decoder(answer_ids, states, cross_mask=question_mask)

    def encode(self, images, question_ids, question_mask):
        """(B,H,W,3) normalized images + question -> question states."""
        image_tokens = self.visual_encoder(images)
        return self.text_encoder(question_ids, image_tokens, question_mask)

    def encode_image(self, images):
        """(B,H,W,3) normalized images -> image tokens (B, T, W) — split out
        so one image can serve many questions without re-running the ViT."""
        return self.visual_encoder(images)

    def encode_question(self, question_ids, image_tokens, question_mask):
        return self.text_encoder(question_ids, image_tokens, question_mask)

    def decode_step_logits(self, answer_ids, question_states, question_mask):
        return self.text_decoder(answer_ids, question_states, cross_mask=question_mask)


def greedy_answer_ids(apply_fn, params, images, question_ids, question_mask,
                      max_len: int = MAX_ANSWER_LEN) -> np.ndarray:
    """Batched greedy answer decode as one compiled scan.

    Mirrors the captioner's greedy_caption_ids; decoding opens with [DEC]
    (LAVIS text_decoder.generate bos) and stops per-row at [SEP]."""
    states = apply_fn(params, "encode", images, question_ids, question_mask)
    return greedy_answer_ids_from_states(apply_fn, params, states, question_mask, max_len)


def greedy_answer_ids_from_states(apply_fn, params, states, question_mask,
                                  max_len: int = MAX_ANSWER_LEN) -> np.ndarray:
    """Greedy decode from precomputed question states (the vision tower and
    fusion encoder may have been amortized across questions by the caller)."""
    b = states.shape[0]
    ids0 = jnp.full((b, max_len), PAD_ID, jnp.int32).at[:, 0].set(BOS_ID)

    def step(carry, pos):
        ids, done = carry
        logits = apply_fn(params, "decode_step_logits", ids, states, question_mask)
        nxt = jnp.argmax(logits[:, pos - 1], axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, PAD_ID, nxt)
        ids = ids.at[:, pos].set(nxt)
        return (ids, done | (nxt == SEP_ID)), None

    (ids, _), _ = jax.lax.scan(step, (ids0, jnp.zeros((b,), bool)), jnp.arange(1, max_len))
    return ids


class FlaxBlipVQA:
    """Callable (path, question) -> answer (the gen/caption_tools.py `vqa`
    plug, mirroring LAVIS `model.generate({"image", "text_input"})`)."""

    def __init__(self, weights_dir: Optional[str] = None,
                 vit: Optional[BlipViTConfig] = None,
                 text: Optional[BlipTextConfig] = None,
                 params=None, seed: int = 0):
        self.model = BlipVQA(vit or BlipViTConfig(image_size=VQA_IMAGE_SIZE),
                             text or BlipTextConfig(), dtype=jnp.float32)
        vocab_path = None
        if weights_dir:
            cand = Path(weights_dir) / "blip_vqa"
            if cand.exists() and params is None:
                from saspa_tpu.utils.checkpoint import restore_checkpoint

                params = restore_checkpoint(str(cand))["params"]
            vp = Path(weights_dir) / "tokenizer" / "vocab.txt"
            vocab_path = str(vp) if vp.exists() else None
        self.tokenizer = WordPieceTokenizer(vocab_path)
        if params is None:
            size = self.model.vit.image_size
            params = self.model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, size, size, 3)),
                jnp.zeros((1, MAX_QUESTION_LEN), jnp.int32),
                jnp.ones((1, MAX_QUESTION_LEN), jnp.int32),
                jnp.zeros((1, 4), jnp.int32),
            )["params"]
        self.params = params
        # whole-decode jits (built on first use, keyed by batch shape): the
        # eager scan would re-trace the decoder every call
        self._answer_jit = None
        self._answer_many_jit = None

    def _apply_fn(self, params, method, *args):
        return self.model.apply({"params": params}, *args, method=getattr(BlipVQA, method))

    def _tokenize_questions(self, questions: Sequence[str]):
        """[ENC] tokens [SEP], padded to MAX_QUESTION_LEN (one compiled shape);
        LAVIS replaces the leading [CLS] with [ENC] (blip_vqa.py)."""
        ids = np.full((len(questions), MAX_QUESTION_LEN), PAD_ID, np.int32)
        mask = np.zeros((len(questions), MAX_QUESTION_LEN), np.int32)
        for i, q in enumerate(questions):
            row = [ENC_ID] + self.tokenizer.encode(q)[: MAX_QUESTION_LEN - 2] + [SEP_ID]
            ids[i, : len(row)] = row
            mask[i, : len(row)] = 1
        return jnp.asarray(ids), jnp.asarray(mask)

    def answer_batch(self, images_uint8: np.ndarray, questions: Sequence[str]) -> List[str]:
        images = blip_preprocess(images_uint8, self.model.vit.image_size)
        qids, qmask = self._tokenize_questions(questions)
        if self._answer_jit is None:
            self._answer_jit = jax.jit(
                lambda p, im, qi, qm: greedy_answer_ids(self._apply_fn, p, im, qi, qm)
            )
        ids = np.asarray(self._answer_jit(self.params, images, qids, qmask))
        return [self.tokenizer.decode(row[1:]) for row in ids]

    def answer_questions(self, path: str, questions: Sequence[str]) -> List[str]:
        """All answers for ONE image: the 480² vision tower runs once and its
        tokens are tiled across the Q questions (caption-prep asks several
        questions per image — per-pair __call__ would re-encode the image
        each time, prompts_engineering/blip_utils.py:37-53 shape)."""
        from PIL import Image

        img = np.asarray(Image.open(path).convert("RGB"))[None]
        images = blip_preprocess(img, self.model.vit.image_size)
        qids, qmask = self._tokenize_questions(questions)

        if self._answer_many_jit is None:
            def _run(p, im, qi, qm):
                image_tokens = self._apply_fn(p, "encode_image", im)
                states = self._apply_fn(
                    p, "encode_question", qi,
                    jnp.broadcast_to(image_tokens, (qi.shape[0],) + image_tokens.shape[1:]),
                    qm,
                )
                return greedy_answer_ids_from_states(self._apply_fn, p, states, qm)

            self._answer_many_jit = jax.jit(_run)
        ids = np.asarray(self._answer_many_jit(self.params, images, qids, qmask))
        return [self.tokenizer.decode(row[1:]) for row in ids]

    def __call__(self, path: str, question: str) -> str:
        from PIL import Image

        img = np.asarray(Image.open(path).convert("RGB"))[None]
        return self.answer_batch(img, [question])[0]
