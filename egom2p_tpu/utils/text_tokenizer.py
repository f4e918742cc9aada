"""WordPiece text tokenizer: native reader + training helpers.

Equivalent of the reference's tokenizer utilities
(reference: egom2p/utils/tokenizer/text_tokenizer.py:14-140).  Two parts:

* `WordPieceTokenizer` — a dependency-free reader for the HF `tokenizer.json`
  format (BertNormalizer + BertPreTokenizer + WordPiece), exposing the exact
  surface this repo's masking/generation code uses: `token_to_id`,
  `id_to_token`, `get_vocab`, `encode(...).ids`, `decode`.  The shipped 30k
  WordPiece checkpoint loads without the Rust `tokenizers` package.
* `load_text_tokenizer` — prefers the HF `tokenizers` fast path when present
  and falls back to the native reader, so zero-dependency deploys still work.
* sentinel/coord/object-class token generators and
  `train_unified_wordpiece_tokenizer` (training requires HF `tokenizers`).

The span-masking helpers (`get_sentinel_to_id_mapping`, `split_by_sentinel`,
`merge_span_masking`) live in egom2p_tpu/masking/span.py.
"""
from __future__ import annotations

import json
import re
import unicodedata
from dataclasses import dataclass
from typing import Dict, List, Optional, Union


# ------------------------------------------------------------ native reader
@dataclass
class Encoding:
    ids: List[int]
    tokens: List[str]


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47 or 58 <= cp <= 64 or 91 <= cp <= 96
            or 123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return (0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF
            or 0x20000 <= cp <= 0x2A6DF or 0x2A700 <= cp <= 0x2CEAF
            or 0xF900 <= cp <= 0xFAFF or 0x2F800 <= cp <= 0x2FA1F)


class WordPieceTokenizer:
    """Reads an HF-format WordPiece tokenizer.json and reproduces the
    BertNormalizer -> BertPreTokenizer -> WordPiece encode pipeline."""

    def __init__(self, config: Dict):
        model = config["model"]
        assert model.get("type", "WordPiece") == "WordPiece", model.get("type")
        self.vocab: Dict[str, int] = dict(model["vocab"])
        self.unk_token = model.get("unk_token", "[UNK]")
        self.prefix = model.get("continuing_subword_prefix", "##")
        self.max_chars = model.get("max_input_chars_per_word", 100)
        norm = config.get("normalizer") or {}
        self.lowercase = norm.get("lowercase", True)
        strip = norm.get("strip_accents")
        self.strip_accents = self.lowercase if strip is None else strip
        self.clean_text = norm.get("clean_text", True)
        self.handle_chinese = norm.get("handle_chinese_chars", True)

        self.added: Dict[str, int] = {}
        self.special: set = set()
        for tok in config.get("added_tokens", []):
            self.added[tok["content"]] = tok["id"]
            self.vocab.setdefault(tok["content"], tok["id"])
            if tok.get("special"):
                self.special.add(tok["content"])
        self.inv_vocab = {i: t for t, i in self.vocab.items()}
        if self.added:
            alts = sorted(self.added, key=len, reverse=True)
            self._added_re = re.compile(
                "(" + "|".join(re.escape(a) for a in alts) + ")")
        else:
            self._added_re = None

    @classmethod
    def from_file(cls, path: str) -> "WordPieceTokenizer":
        with open(path) as f:
            return cls(json.load(f))

    # ---- surface shared with tokenizers.Tokenizer --------------------------
    def get_vocab(self) -> Dict[str, int]:
        return dict(self.vocab)

    def get_vocab_size(self) -> int:
        return len(self.vocab)

    def token_to_id(self, token: str) -> Optional[int]:
        return self.vocab.get(token)

    def id_to_token(self, idx: int) -> Optional[str]:
        return self.inv_vocab.get(int(idx))

    def _normalize(self, text: str) -> str:
        if self.clean_text:
            # \t\n\r are category Cc, so they must be mapped to spaces BEFORE
            # the control-character filter or words merge across line breaks
            # (HF BertNormalizer replaces them with spaces)
            text = "".join(
                " " if ch in ("\t", "\n", "\r") else ch for ch in text
                if ch in ("\t", "\n", "\r") or (
                    ord(ch) != 0 and ord(ch) != 0xFFFD
                    and not unicodedata.category(ch).startswith("C")))
        if self.handle_chinese:
            text = "".join(f" {ch} " if _is_cjk(ord(ch)) else ch
                           for ch in text)
        if self.lowercase:
            text = text.lower()
        if self.strip_accents:
            text = "".join(ch for ch in unicodedata.normalize("NFD", text)
                           if unicodedata.category(ch) != "Mn")
        return text

    def _pretokenize(self, text: str) -> List[str]:
        words = []
        for blob in text.split():
            cur = ""
            for ch in blob:
                if _is_punctuation(ch):
                    if cur:
                        words.append(cur)
                    words.append(ch)
                    cur = ""
                else:
                    cur += ch
            if cur:
                words.append(cur)
        return words

    def _wordpiece(self, word: str) -> List[str]:
        if len(word) > self.max_chars:
            return [self.unk_token]
        pieces, start = [], 0
        while start < len(word):
            end = len(word)
            piece = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = self.prefix + sub
                if sub in self.vocab:
                    piece = sub
                    break
                end -= 1
            if piece is None:
                return [self.unk_token]
            pieces.append(piece)
            start = end
        return pieces

    def encode(self, text: str) -> Encoding:
        chunks = (self._added_re.split(text) if self._added_re else [text])
        tokens: List[str] = []
        for chunk in chunks:
            if not chunk:
                continue
            if chunk in self.added:
                tokens.append(chunk)
                continue
            for word in self._pretokenize(self._normalize(chunk)):
                tokens.extend(self._wordpiece(word))
        ids = [self.vocab.get(t, self.vocab.get(self.unk_token, 0))
               for t in tokens]
        return Encoding(ids=ids, tokens=tokens)

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        toks = []
        for i in ids:
            t = self.inv_vocab.get(int(i))
            if t is None or (skip_special_tokens and t in self.special):
                continue
            toks.append(t)
        out = " ".join(toks).replace(" " + self.prefix, "")
        return out.strip()


def load_text_tokenizer(path: str):
    """HF fast tokenizer when available, native reader otherwise."""
    try:
        from tokenizers import Tokenizer
        return Tokenizer.from_file(path)
    except ImportError:
        return WordPieceTokenizer.from_file(path)


# --------------------------------------------------- special-token builders
def generate_sentinel_tokens(num: int = 100, start_id: int = 0):
    """[S_0]..[S_n] span sentinels (reference: text_tokenizer.py:14-20)."""
    return [f"[S_{i}]" for i in range(start_id, num + start_id)]


def generate_coord_tokens(bins: int = 1000):
    """v0=..v3= coordinate tokens (reference: text_tokenizer.py:22-33)."""
    return [s.format(i) for s in ("v0={}", "v1={}", "v2={}", "v3={}")
            for i in range(bins)]


def generate_object_class_tokens(classes: List[str]):
    """Plain class-name tokens (reference: text_tokenizer.py:35-44 reads them
    from object_classes.json; pass the list explicitly here)."""
    return list(classes)


def train_unified_wordpiece_tokenizer(
        files, vocab_size, sentinel_tokens=None, coord_tokens=None,
        object_class_tokens=None, unk_token="[UNK]", pad_token="[PAD]",
        sos_token="[SOS]", eos_token="[EOS]",
        additional_special_tokens=None, min_frequency=0,
        lowercase=True, wordpieces_prefix="##", show_progress=True):
    """(reference: text_tokenizer.py:47-105).  Requires the HF `tokenizers`
    package (training only; inference has the native reader)."""
    from tokenizers import AddedToken, Tokenizer, decoders, trainers
    from tokenizers.models import WordPiece
    from tokenizers.normalizers import BertNormalizer
    from tokenizers.pre_tokenizers import BertPreTokenizer

    tokenizer = Tokenizer(WordPiece(unk_token=str(unk_token)))
    tokenizer.normalizer = BertNormalizer(lowercase=lowercase)
    tokenizer.pre_tokenizer = BertPreTokenizer()
    tokenizer.decoder = decoders.WordPiece(prefix=wordpieces_prefix)

    special = [pad_token, unk_token, sos_token, eos_token]
    for extra in (sentinel_tokens, coord_tokens, object_class_tokens,
                  additional_special_tokens):
        if extra:
            special.extend(
                AddedToken(content=t, single_word=True, normalized=False)
                if isinstance(t, str) else t for t in extra)
    trainer = trainers.WordPieceTrainer(
        vocab_size=vocab_size, min_frequency=min_frequency,
        show_progress=show_progress,
        continuing_subword_prefix=wordpieces_prefix,
        special_tokens=special)
    if isinstance(files, str):
        files = [files]
    tokenizer.train(files, trainer=trainer)
    return tokenizer
