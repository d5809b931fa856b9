"""Pluggable tokenizer for the chunking operator.

The reference uses tiktoken cl100k_base (chunking.py:10) and its tests pin
exact token ids. tiktoken is NOT installed in this environment, so we expose:

- ``TiktokenEncoder`` when tiktoken is importable (exact reference parity),
- ``StableHashEncoder`` otherwise: a DOCUMENTED deterministic fallback —
  regex word/punct split, long words windowed BPE-style into ≤8-char pieces,
  each piece mapped to a stable 17-bit id via blake2b. Token *counts* drive
  all chunk-size semantics (256/512/409 branches), so the chunking algorithm
  is fully exercised; golden token ids in tests are pinned against this
  encoder and regenerate under tiktoken if present (documented divergence,
  SURVEY.md §7 'hard/risky').

Both encoders are picklable and cheap to construct inside pandas-UDF workers.
"""

from __future__ import annotations

import hashlib
import re

_PIECE_RE = re.compile(r"[A-Za-z0-9]+|[^\sA-Za-z0-9]")
_VOCAB = 100_003  # prime, ~cl100k-sized id space
_WINDOW = 8


class StableHashEncoder:
    name = "stable-hash-v1"

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        for piece in _PIECE_RE.findall(text):
            lowered = piece.lower()
            for i in range(0, len(lowered), _WINDOW):
                window = lowered[i : i + _WINDOW]
                digest = hashlib.blake2b(window.encode("utf-8"), digest_size=8)
                out.append(int.from_bytes(digest.digest(), "big") % _VOCAB)
        return out


class TiktokenEncoder:
    name = "cl100k_base"

    def __init__(self):
        import tiktoken

        self._enc = tiktoken.get_encoding("cl100k_base")

    def encode(self, text: str) -> list[int]:
        return self._enc.encode(text)


def get_encoder():
    try:
        return TiktokenEncoder()
    except ImportError:
        return StableHashEncoder()


_ENCODER = None


def default_encoder():
    global _ENCODER
    if _ENCODER is None:
        _ENCODER = get_encoder()
    return _ENCODER
