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

    # piece → token-id list memo, shared per worker PROCESS (class-level in
    # an importable module, so a reused Python worker keeps it across tasks
    # — the guide-§4.5 heavyweight-state pattern). Natural-language token
    # frequency is Zipfian, so the hit rate is ~99% on real text and the
    # blake2b construction (measured 87% of the whole chunking pipeline's
    # CPU before memoization) amortizes away. Values are IDENTICAL to the
    # unmemoized fold — encode() is a pure function of the piece. Bounded:
    # past _MEMO_MAX distinct pieces the map is cleared (amortized O(1),
    # worst case a recompute), so an adversarial high-entropy corpus cannot
    # grow worker memory without limit (~1M pieces ≈ tens of MB).
    _memo: dict[str, list[int]] = {}
    _MEMO_MAX = 1 << 20

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        memo = self._memo
        memo_get = memo.get
        for piece in _PIECE_RE.findall(text):
            ids = memo_get(piece)
            if ids is None:
                lowered = piece.lower()
                ids = [
                    int.from_bytes(
                        hashlib.blake2b(
                            lowered[i : i + _WINDOW].encode("utf-8"),
                            digest_size=8,
                        ).digest(),
                        "big",
                    )
                    % _VOCAB
                    for i in range(0, len(lowered), _WINDOW)
                ]
                if len(memo) >= self._MEMO_MAX:
                    memo.clear()
                memo[piece] = ids
            out.extend(ids)
        return out

    def encode_with_breaks(
        self, text: str, sep: str
    ) -> tuple[list[int], list[tuple[int, int]]]:
        """One pass returning BOTH ``encode(text)`` and the sentence spans.

        ``flat, spans = encode_with_breaks(text, sep)`` satisfies
        ``flat == encode(text)`` and
        ``[flat[s:e] for s, e in spans] == [encode(p) for p in
        text.split(sep)]`` (same sep-as-own-piece argument as encode_split;
        both equalities pinned by test). This exists for the chunker's
        >512-token blocks, which previously tokenized the same text twice —
        once whole for the size decision, once sentence-split for bucket
        packing; the combined pass halves the tokenizer work on that path.
        Cost on the flat path is one extra ``piece == sep`` comparison per
        piece, so callers with blocks that cannot need splitting (token
        count ≤ len(text) ≤ 512) should keep plain encode()."""
        assert len(sep) == 1 and not sep.isalnum() and not sep.isspace()
        memo = self._memo
        memo_get = memo.get
        out: list[int] = []
        spans: list[tuple[int, int]] = []
        start = 0
        for piece in _PIECE_RE.findall(text):
            ids = memo_get(piece)
            if ids is None:
                lowered = piece.lower()
                ids = [
                    int.from_bytes(
                        hashlib.blake2b(
                            lowered[i : i + _WINDOW].encode("utf-8"),
                            digest_size=8,
                        ).digest(),
                        "big",
                    )
                    % _VOCAB
                    for i in range(0, len(lowered), _WINDOW)
                ]
                if len(memo) >= self._MEMO_MAX:
                    memo.clear()
                memo[piece] = ids
            if piece == sep:
                spans.append((start, len(out)))
                out.extend(ids)
                start = len(out)
            else:
                out.extend(ids)
        spans.append((start, len(out)))
        return out, spans

    def encode_split(self, text: str, sep: str) -> list[list[int]]:
        """Token lists for ``text.split(sep)`` in ONE regex pass.

        Valid because ``sep`` (a single non-alnum, non-space char) is always
        matched as its own piece by _PIECE_RE — an ``[A-Za-z0-9]+`` run can
        never contain it and the other alternative matches one char — so
        the full text's piece stream splits at the sep pieces exactly where
        ``text.split(sep)`` splits, and each segment's pieces equal
        ``_PIECE_RE.findall(segment)``. Result is identical to
        ``[self.encode(s) for s in text.split(sep)]`` (pinned by test);
        this exists because the chunker's sentence-split path called
        encode() once per sentence (~650 regex invocations per large doc).
        Encoder-specific: a BPE encoder has no such decomposition, so the
        chunker falls back to per-sentence encode() when absent."""
        assert len(sep) == 1 and not sep.isalnum() and not sep.isspace()
        memo = self._memo
        memo_get = memo.get
        lists: list[list[int]] = [[]]
        cur = lists[0]
        for piece in _PIECE_RE.findall(text):
            if piece == sep:
                cur = []
                lists.append(cur)
                continue
            ids = memo_get(piece)
            if ids is None:
                lowered = piece.lower()
                ids = [
                    int.from_bytes(
                        hashlib.blake2b(
                            lowered[i : i + _WINDOW].encode("utf-8"),
                            digest_size=8,
                        ).digest(),
                        "big",
                    )
                    % _VOCAB
                    for i in range(0, len(lowered), _WINDOW)
                ]
                if len(memo) >= self._MEMO_MAX:
                    memo.clear()
                memo[piece] = ids
            cur.extend(ids)
        return lists


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
