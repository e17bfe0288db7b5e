"""CLIP BPE tokenizer, self-contained.

The reference gets tokenization from `clip.tokenize` / the diffusers pipeline
tokenizer.  We implement the byte-level BPE algorithm directly so no torch or
HF tokenizer object is needed; the merge table loads from a standard
`merges.txt`/`bpe_simple_vocab_16e6` file (shipped with converted weights).

Without a merges file (e.g. this zero-egress dev environment) a deterministic
hash fallback keeps every downstream path runnable: tokens are stable ids in
the CLIP vocab range, SOT/EOT framing and 77-token padding identical.
"""

from __future__ import annotations

import gzip
import hashlib
import html
import re
from functools import lru_cache
from pathlib import Path
from typing import List, Optional

import numpy as np

CONTEXT_LENGTH = 77
VOCAB_SIZE = 49408
SOT = 49406
EOT = 49407

_PAT = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"""
    if False
    else r"""'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+""",
    re.IGNORECASE,
)


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


def _basic_clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    return re.sub(r"\s+", " ", text).strip().lower()


class CLIPTokenizer:
    def __init__(self, merges_path: Optional[str] = None):
        self.byte_encoder = bytes_to_unicode()
        self.bpe_ranks = {}
        self.encoder = {}
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
        for tok in re.findall(_PAT, text):
            tok_bytes = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            if self.has_vocab:
                ids.extend(self.encoder[t] for t in self._bpe(tok_bytes))
            else:
                # deterministic fallback: stable id per word-piece
                h = int.from_bytes(hashlib.sha256(tok_bytes.encode()).digest()[:4], "little")
                ids.append(h % (VOCAB_SIZE - 1000))
        return ids

    def __call__(self, texts, context_length: int = CONTEXT_LENGTH, truncate: bool = True) -> np.ndarray:
        """texts: str or list[str] -> (B, 77) int32 with SOT ... EOT padding 0."""
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), context_length), np.int32)
        for i, text in enumerate(texts):
            ids = [SOT] + self._encode_text(text or "") + [EOT]
            if len(ids) > context_length:
                if not truncate:
                    raise ValueError(f"text too long: {text!r}")
                ids = ids[: context_length - 1] + [EOT]
            out[i, : len(ids)] = ids
        return out


_DEFAULT: Optional[CLIPTokenizer] = None


def default_tokenizer(weights_dir: Optional[str] = None) -> CLIPTokenizer:
    """Singleton tokenizer; picks up merges from weights_dir/tokenizer/ if present."""
    global _DEFAULT
    if _DEFAULT is None:
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
        _DEFAULT = CLIPTokenizer(merges)
    return _DEFAULT
