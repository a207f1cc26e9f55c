"""CLIP BPE tokenizer (pure Python, host-side).

Implements the byte-pair-encoding scheme used by OpenAI CLIP so text prompts
tokenize identically to the reference's vendored tokenizer
(/root/reference/rdm/modules/custom_clip/simple_tokenizer.py — behavior
reimplemented, not copied). The merge table
``rdm_tpu/assets/bpe_simple_vocab_16e6.txt.gz`` is OpenAI's public released
vocabulary *data* artifact (MIT licensed), vendored verbatim — identical token
ids are a hard requirement for reusing released CLIP weights.

Vocabulary layout (49408 entries):
  [0, 256)        : byte-unicode symbols
  [256, 512)      : the same symbols with an end-of-word '</w>' suffix
  [512, 49406)    : 48894 learned BPE merges
  49406, 49407    : <|startoftext|>, <|endoftext|>
"""

from __future__ import annotations

import functools
import gzip
import html
import os
from typing import List, Sequence, Union

import numpy as np
import regex as re

_VOCAB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", "bpe_simple_vocab_16e6.txt.gz",
)

CONTEXT_LENGTH = 77


@functools.lru_cache()
def bytes_to_unicode():
    """Bijective byte → printable-unicode map (GPT-2 convention).

    Printable ASCII/latin ranges map to themselves; the remaining bytes are
    assigned codepoints starting at 256 so no byte maps to whitespace.
    """
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _pairs(word):
    return set(zip(word[:-1], word[1:]))


def _clean(text: str) -> str:
    # Reference (simple_tokenizer.py basic_clean) runs ftfy.fix_text first.
    # Use it when installed; otherwise fall back to a mojibake repair that
    # covers ftfy's dominant fix (UTF-8 read as latin-1/cp1252), matching
    # its output for ASCII and common mojibake prompts.
    try:
        import ftfy  # optional dependency
        text = ftfy.fix_text(text)
    except ImportError:
        text = _fix_mojibake(text)
    text = html.unescape(html.unescape(text))
    text = re.sub(r"\s+", " ", text)
    return text.strip().lower()


def _fix_mojibake(text: str) -> str:
    """Repair UTF-8-decoded-as-latin-1/cp1252 text (ftfy's main job).

    If the string re-encodes losslessly to latin-1/cp1252 bytes that decode
    as valid UTF-8 containing multibyte sequences, the UTF-8 reading is
    overwhelmingly more likely to be the intended text.
    """
    if text.isascii():
        return text
    for enc in ("latin-1", "cp1252"):
        try:
            raw = text.encode(enc)
            fixed = raw.decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            continue
        if fixed != text and any(ord(c) > 0x7F for c in fixed):
            return fixed
    return text


class ClipTokenizer:
    def __init__(self, vocab_path: str = _VOCAB_PATH):
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        with gzip.open(vocab_path, "rt", encoding="utf-8") as f:
            merge_lines = f.read().split("\n")
        # header line first; 48894 merges used by CLIP
        merge_lines = merge_lines[1:49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merge_lines]
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        vocab.extend("".join(m) for m in merges)
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }
        self.pat = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
            r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE,
        )
        self.sot_token = self.encoder["<|startoftext|>"]
        self.eot_token = self.encoder["<|endoftext|>"]

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(
                pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        bpe_tokens: List[int] = []
        for token in re.findall(self.pat, _clean(text)):
            token = "".join(self.byte_encoder[b]
                            for b in token.encode("utf-8"))
            bpe_tokens.extend(self.encoder[t]
                              for t in self.bpe(token).split(" "))
        return bpe_tokens

    def decode(self, tokens: Sequence[int]) -> str:
        text = "".join(self.decoder[int(t)] for t in tokens)
        raw = bytearray(self.byte_decoder[c] for c in text)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")


@functools.lru_cache()
def default_tokenizer() -> ClipTokenizer:
    return ClipTokenizer()


def tokenize(
    texts: Union[str, Sequence[str]],
    context_length: int = CONTEXT_LENGTH,
    truncate: bool = True,
) -> np.ndarray:
    """[SOT] + BPE tokens + [EOT], zero-padded to `context_length`.

    Matches reference /root/reference/rdm/modules/custom_clip/clip.py:127-143
    semantics; `truncate` clips long prompts keeping the final EOT.
    """
    if isinstance(texts, str):
        texts = [texts]
    tok = default_tokenizer()
    result = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        ids = [tok.sot_token] + tok.encode(text) + [tok.eot_token]
        if len(ids) > context_length:
            if not truncate:
                raise ValueError(
                    f"input {text!r} is too long for context {context_length}")
            ids = ids[:context_length - 1] + [tok.eot_token]
        result[i, :len(ids)] = ids
    return result
