"""CLIP BPE tokenizer, self-contained.

The reference gets tokenization from `clip.tokenize` (all_utils/utils.py:253)
and the diffusers pipelines' `transformers.CLIPTokenizer`.  We implement the
byte-level BPE algorithm directly so no torch or HF tokenizer object is
needed; the merge table loads from a standard `merges.txt` /
`bpe_simple_vocab_16e6` file (shipped with converted weights).

Pre-tokenization uses CLIP's actual pattern (via the `regex` module, which
supports \\p{L}/\\p{N} — it is a hard dependency of transformers, so it is
always present wherever parity matters).  Text cleaning mirrors
`transformers.CLIPTokenizer` in its no-ftfy configuration (BasicTokenizer
with strip_accents=False, do_split_on_punc=False): strip control characters,
space out CJK codepoints, lowercase, collapse whitespace.  openai's clip
package additionally runs ftfy.fix_text + 2x html.unescape — a no-op for the
framework's prompt assets (plain ASCII-ish text, no HTML entities / mojibake).

Id-for-id parity with `transformers.CLIPTokenizer` is proven in
tests/test_tokenizer_and_prompts.py against a toy vocab/merges pair, on a
battery including unicode, punctuation, and contractions.

Without a merges file (e.g. this zero-egress dev environment) a deterministic
hash fallback keeps every downstream path runnable: tokens are stable ids in
the CLIP vocab range, SOT/EOT framing and 77-token padding identical.
"""

from __future__ import annotations

import gzip
import hashlib
import unicodedata
from functools import lru_cache
from pathlib import Path
from typing import List, Optional

import numpy as np

try:
    import regex as _re_mod

    _HAVE_REGEX = True
except ImportError:  # vendored installs without the declared `regex` dep
    import re as _re_mod

    _HAVE_REGEX = False

CONTEXT_LENGTH = 77
VOCAB_SIZE = 49408
SOT = 49406
EOT = 49407

# CLIP's exact pre-tokenize pattern (openai/CLIP simple_tokenizer.py and
# transformers CLIPTokenizer use this same regex, IGNORECASE).  Without the
# `regex` module (declared in pyproject, but keep a vendoring fallback),
# stdlib `re` approximates it: [^\W\d_] ≈ \p{L} (plus the rare Nl/No number
# forms, e.g. Roman numerals, which stdlib classes as alphanumeric — they
# join the letter run instead of the single-number class), \d = \p{Nd},
# and (?:[^\s\w]|_) is exactly [^\s\p{L}\p{N}] up to that same Nl/No set.
if _HAVE_REGEX:
    _PAT = _re_mod.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
        _re_mod.IGNORECASE,
    )
else:
    _PAT = _re_mod.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[^\W\d_]+|\d|(?:[^\s\w]|_)+""",
        _re_mod.IGNORECASE | _re_mod.UNICODE,
    )

_WS = _re_mod.compile(r"\s+")


@lru_cache()
def bytes_to_unicode():
    bs = list(range(ord("!"), ord("~") + 1)) + list(range(ord("\xa1"), ord("\xac") + 1)) + list(range(ord("\xae"), ord("\xff") + 1))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _is_cjk(cp: int) -> bool:
    """BERT BasicTokenizer's CJK block test (transformers
    tokenization_bert.py::BasicTokenizer._is_chinese_char)."""
    return (
        0x4E00 <= cp <= 0x9FFF
        or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF
        or 0x2A700 <= cp <= 0x2B73F
        or 0x2B740 <= cp <= 0x2B81F
        or 0x2B820 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF
        or 0x2F800 <= cp <= 0x2FA1F
    )


def _basic_clean(text: str) -> str:
    """transformers CLIPTokenizer's no-ftfy cleaning, exactly:
    `" ".join(BasicTokenizer(strip_accents=False, do_split_on_punc=False)
    .tokenize(text))` = drop control chars, surround CJK chars with spaces,
    whitespace-split, lowercase, re-join with single spaces."""
    out = []
    for ch in text:
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD:
            continue
        if ch in ("\t", "\n", "\r"):
            out.append(" ")
            continue
        cat = unicodedata.category(ch)
        if cat.startswith("C"):
            continue
        if _is_cjk(cp):
            out.append(f" {ch} ")
        elif cat == "Zs":
            out.append(" ")
        else:
            out.append(ch)
    return " ".join("".join(out).lower().split())


class CLIPTokenizer:
    def __init__(self, merges_path: Optional[str] = None):
        self.byte_encoder = bytes_to_unicode()
        self.bpe_ranks = {}
        self.encoder = {}
        # full-vocab ids; _load_merges overrides from the encoder (differs
        # only for toy vocabs, where parity with transformers needs the
        # encoder's own ids)
        self.sot, self.eot = SOT, EOT
        if merges_path and Path(merges_path).exists():
            self._load_merges(merges_path)
        self._cache = {}

    # ---- vocab construction from a merges file (CLIP's exact recipe) -------
    def _load_merges(self, path: str):
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt", encoding="utf-8") as f:
            lines = f.read().split("\n")
        # CLIP's file has a header line and is truncated to 48894 merges
        start = 1 if lines and (" " not in lines[0] or lines[0].startswith("#")) else 0
        merges = [tuple(m.split()) for m in lines[start : 49152 - 256 - 2 + start] if m and len(m.split()) == 2]
        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = dict(zip(vocab, range(len(vocab))))
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.sot = self.encoder["<|startoftext|>"]
        self.eot = self.encoder["<|endoftext|>"]

    @property
    def has_vocab(self) -> bool:
        return bool(self.encoder)

    def _bpe(self, token: str) -> List[str]:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = set(zip(word[:-1], word[1:]))
        if not pairs:
            return [token + "</w>"]
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = set(zip(word[:-1], word[1:]))
        out = list(word)
        self._cache[token] = out
        return out

    # ---- encoding ----------------------------------------------------------
    def _encode_text(self, text: str) -> List[int]:
        text = _basic_clean(text)
        ids: List[int] = []
        for tok in _PAT.findall(text):
            if tok in ("<|startoftext|>", "<|endoftext|>"):
                ids.append(self.sot if tok == "<|startoftext|>" else self.eot)
                continue
            tok_bytes = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            if self.has_vocab:
                ids.extend(self.encoder[t] for t in self._bpe(tok_bytes))
            else:
                # deterministic fallback: stable id per word-piece
                h = int.from_bytes(hashlib.sha256(tok_bytes.encode()).digest()[:4], "little")
                ids.append(h % (VOCAB_SIZE - 1000))
        return ids

    def __call__(
        self,
        texts,
        context_length: int = CONTEXT_LENGTH,
        truncate: bool = True,
        pad: str = "zero",
    ) -> np.ndarray:
        """texts: str or list[str] -> (B, 77) int32 of SOT ... EOT + padding.

        pad="zero" matches openai clip.tokenize (the CLIP filter contract,
        all_utils/utils.py:253); pad="eot" matches transformers/diffusers
        (pad_token = <|endoftext|>) — the SD text-conditioning contract, where
        padded positions DO feed cross-attention."""
        if isinstance(texts, str):
            texts = [texts]
        sot, eot = self.sot, self.eot
        fill = 0 if pad == "zero" else eot
        out = np.full((len(texts), context_length), fill, np.int32)
        for i, text in enumerate(texts):
            ids = [sot] + self._encode_text(text or "") + [eot]
            if len(ids) > context_length:
                if not truncate:
                    raise ValueError(f"text too long: {text!r}")
                ids = ids[: context_length - 1] + [eot]
            out[i, : len(ids)] = ids
        return out


_DEFAULT: dict = {}  # weights_dir -> CLIPTokenizer


def hf_cache_merges(cache_root: Optional[str] = None) -> Optional[str]:
    """Find a CLIP merges.txt inside a standard HuggingFace hub cache.

    Weights-day helper: anyone who has ever pulled a CLIP or Stable-Diffusion
    repo (openai/clip-vit-*, runwayml/stable-diffusion-v1-5, sdxl, ...)
    already has the id-identical merges file on disk under
    `models--*/snapshots/<rev>/(tokenizer/)merges.txt` — point the tokenizer
    at it instead of idling on the hash fallback.  Only repos whose name
    mentions clip/stable-diffusion/sdxl are considered (a GPT-2 merges file
    would tokenize, but to the WRONG ids).

    cache_root defaults to $HF_HOME/hub else ~/.cache/huggingface/hub."""
    import os

    if cache_root:
        root = Path(cache_root)
    else:
        hf_home = os.environ.get("HF_HOME")
        root = (Path(hf_home) / "hub") if hf_home else (Path.home() / ".cache" / "huggingface" / "hub")
    if not root.exists():
        return None
    hits = []
    for model_dir in sorted(root.glob("models--*")):
        name = model_dir.name.lower()
        if not any(s in name for s in ("clip", "stable-diffusion", "sdxl", "blipdiffusion")):
            continue
        for pat in ("snapshots/*/tokenizer/merges.txt", "snapshots/*/merges.txt",
                    "snapshots/*/tokenizer/bpe_simple_vocab_16e6.txt.gz"):
            hits.extend(model_dir.glob(pat))
    return str(sorted(hits)[0]) if hits else None


def default_tokenizer(weights_dir: Optional[str] = None) -> CLIPTokenizer:
    """Cached tokenizer, keyed by weights_dir — a process-wide singleton
    would let an early weights-less pipeline pin the hash-fallback tokenizer
    for a later pipeline constructed WITH real merges."""
    global _DEFAULT
    if weights_dir not in _DEFAULT:
        merges = None
        for cand in [
            Path(weights_dir or "") / "tokenizer/merges.txt",
            Path(weights_dir or "") / "bpe_simple_vocab_16e6.txt.gz",
            Path("weights/tokenizer/merges.txt"),
            Path("weights/bpe_simple_vocab_16e6.txt.gz"),
        ]:
            if str(cand) != "." and cand.exists():
                merges = str(cand)
                break
        if merges is None:
            import logging
            import os

            if os.environ.get("SASPA_STRICT_WEIGHTS", "") == "1":
                raise FileNotFoundError(
                    f"no CLIP merges file found (weights_dir={weights_dir!r}) "
                    "and SASPA_STRICT_WEIGHTS=1 — hash-fallback token ids "
                    "would make text conditioning meaningless"
                )
            logging.warning(
                "no CLIP merges file (weights_dir=%r, cwd=%s) — using the "
                "HASH-FALLBACK tokenizer; token ids are stable but NOT real "
                "BPE, text conditioning is only meaningful with random "
                "weights", weights_dir, Path.cwd(),
            )
        _DEFAULT[weights_dir] = CLIPTokenizer(merges)
    return _DEFAULT[weights_dir]
