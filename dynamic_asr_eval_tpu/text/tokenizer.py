"""Tokenizers.

The reference consumes a SentencePiece tokenizer from the external ``lcasr``
package (``tokenizer.encode(text)``, ``tokenizer.decode(ids)``,
``tokenizer.vocab_size()`` — used e.g. at ``lcasr/lib.py:569``,
``lcasr/lib.py:489``).  This environment has no ``sentencepiece`` wheel, so we
provide:

- :class:`CharTokenizer` — character vocabulary (wav2vec2-style), the default
  for tests and synthetic runs;
- :class:`VocabTokenizer` — token-per-line vocab file with greedy
  longest-match encoding;
- :class:`SentencePieceTokenizer` — a pure-Python reader of the serialized
  SentencePiece ``ModelProto`` (protobuf wire format parsed by hand) with
  unigram Viterbi encoding and standard "▁"-aware decoding, so published
  ``tokenizer.model`` files remain loadable without the C++ wheel.

All tokenizers expose the reference-compatible surface:
``encode(text) -> List[int]``, ``decode(ids) -> str``, ``vocab_size() -> int``.
The CTC blank id convention follows the reference: ``blank_id == vocab_size()``
(the model's output dim is ``vocab_size() + 1``; see ``lcasr/lib.py:492``).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Sequence


class CharTokenizer:
    """Character-level tokenizer.

    Default alphabet: space + apostrophe + a-z (28 symbols), ids 0..27.
    ``vocab_size()`` excludes the CTC blank (blank = vocab_size()).
    """

    def __init__(self, alphabet: Optional[str] = None):
        self.alphabet = alphabet if alphabet is not None else " '" + "".join(
            chr(c) for c in range(ord("a"), ord("z") + 1)
        )
        self._stoi: Dict[str, int] = {c: i for i, c in enumerate(self.alphabet)}
        self._itos: Dict[int, str] = {i: c for i, c in enumerate(self.alphabet)}

    def vocab_size(self) -> int:
        return len(self.alphabet)

    @property
    def blank_id(self) -> int:
        return self.vocab_size()

    def encode(self, text: str) -> List[int]:
        return [self._stoi[c] for c in text.lower() if c in self._stoi]

    def decode(self, ids: Sequence[int]) -> str:
        return "".join(self._itos.get(int(i), "") for i in ids)

    def id_to_piece(self, i: int) -> str:
        return self._itos.get(int(i), "")


class VocabTokenizer:
    """Greedy longest-match tokenizer over a fixed vocabulary list.

    Suitable for word-piece style vocabularies (one token per line).  Pieces
    beginning with "##" are treated as continuations (BERT convention) and
    pieces beginning with "▁" as word starts (SentencePiece convention).
    """

    def __init__(self, pieces: Sequence[str]):
        self.pieces = list(pieces)
        self._stoi = {p: i for i, p in enumerate(self.pieces)}
        self._max_len = max((len(p) for p in self.pieces), default=1)

    @classmethod
    def from_file(cls, path: str) -> "VocabTokenizer":
        with open(path, "r", encoding="utf-8") as f:
            pieces = [line.rstrip("\n") for line in f if line.rstrip("\n")]
        return cls(pieces)

    def vocab_size(self) -> int:
        return len(self.pieces)

    @property
    def blank_id(self) -> int:
        return self.vocab_size()

    def encode(self, text: str) -> List[int]:
        text = "▁" + text.replace(" ", "▁") if any(
            p.startswith("▁") for p in self.pieces[: min(64, len(self.pieces))]
        ) else text
        out: List[int] = []
        i = 0
        while i < len(text):
            matched = False
            for L in range(min(self._max_len, len(text) - i), 0, -1):
                sub = text[i : i + L]
                if sub in self._stoi:
                    out.append(self._stoi[sub])
                    i += L
                    matched = True
                    break
            if not matched:
                i += 1  # skip unknown char
        return out

    def decode(self, ids: Sequence[int]) -> str:
        s = "".join(self.pieces[int(i)] for i in ids if 0 <= int(i) < len(self.pieces))
        return s.replace("▁", " ").replace("##", "").strip()

    def id_to_piece(self, i: int) -> str:
        return self.pieces[int(i)]


# ---------------------------------------------------------------------------
# SentencePiece ModelProto reading (pure Python, protobuf wire format)
# ---------------------------------------------------------------------------

def _read_varint(buf: bytes, pos: int):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def _parse_fields(buf: bytes):
    """Yield (field_number, wire_type, value) triples from a protobuf buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 0x7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 1:  # 64-bit
            val = buf[pos : pos + 8]
            pos += 8
        elif wire == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:  # 32-bit
            val = buf[pos : pos + 4]
            pos += 4
        else:  # pragma: no cover
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def parse_sentencepiece_model(data: bytes):
    """Parse a serialized SentencePiece ModelProto.

    Returns ``(pieces, scores, types)`` where types follow the SentencePiece
    enum: 1=NORMAL, 2=UNKNOWN, 3=CONTROL, 4=USER_DEFINED, 5=BYTE, 6=UNUSED.
    """
    pieces: List[str] = []
    scores: List[float] = []
    types: List[int] = []
    for field, wire, val in _parse_fields(data):
        if field == 1 and wire == 2:  # repeated SentencePiece
            piece, score, ptype = "", 0.0, 1
            for f2, w2, v2 in _parse_fields(val):
                if f2 == 1 and w2 == 2:
                    piece = v2.decode("utf-8", errors="replace")
                elif f2 == 2 and w2 == 5:
                    score = struct.unpack("<f", v2)[0]
                elif f2 == 3 and w2 == 0:
                    ptype = v2
            pieces.append(piece)
            scores.append(score)
            types.append(ptype)
    return pieces, scores, types


class SentencePieceTokenizer:
    """SentencePiece-compatible tokenizer backed by a hand-parsed ModelProto.

    Encoding uses unigram Viterbi segmentation over the piece scores (exact
    for unigram models; a high-quality approximation for BPE models, whose
    merge order is not stored per-token).  Unknown characters map to the UNK
    piece if present, else are skipped.
    """

    def __init__(self, pieces: Sequence[str], scores: Sequence[float], types: Sequence[int]):
        self.pieces = list(pieces)
        self.scores = list(scores)
        self.types = list(types)
        self._stoi = {p: i for i, p in enumerate(self.pieces)}
        self._max_len = max((len(p) for p in self.pieces), default=1)
        self._unk_id = next((i for i, t in enumerate(self.types) if t == 2), None)

    @classmethod
    def from_file(cls, path: str) -> "SentencePieceTokenizer":
        with open(path, "rb") as f:
            data = f.read()
        return cls(*parse_sentencepiece_model(data))

    def vocab_size(self) -> int:
        return len(self.pieces)

    @property
    def blank_id(self) -> int:
        return self.vocab_size()

    def _viterbi(self, text: str) -> List[int]:
        n = len(text)
        NEG = -1e18
        best = [NEG] * (n + 1)
        back: List[Optional[tuple]] = [None] * (n + 1)
        best[0] = 0.0
        unk_penalty = min(self.scores, default=0.0) - 10.0
        for i in range(n):
            if best[i] <= NEG / 2:
                continue
            for L in range(1, min(self._max_len, n - i) + 1):
                sub = text[i : i + L]
                idx = self._stoi.get(sub)
                if idx is None:
                    continue
                sc = best[i] + self.scores[idx]
                if sc > best[i + L]:
                    best[i + L] = sc
                    back[i + L] = (i, idx)
            if back[i + 1] is None:
                # no single-char piece: consume one char as UNK
                sc = best[i] + unk_penalty
                if sc > best[i + 1]:
                    best[i + 1] = sc
                    back[i + 1] = (i, self._unk_id)
        ids: List[int] = []
        pos = n
        while pos > 0:
            prev, idx = back[pos]
            if idx is not None:
                ids.append(idx)
            pos = prev
        ids.reverse()
        return ids

    def encode(self, text: str) -> List[int]:
        text = "▁" + text.replace(" ", "▁")
        return self._viterbi(text)

    def decode(self, ids: Sequence[int]) -> str:
        out = []
        for i in ids:
            i = int(i)
            if 0 <= i < len(self.pieces) and self.types[i] in (1, 4, 5):
                out.append(self.pieces[i])
        return "".join(out).replace("▁", " ").strip()

    def id_to_piece(self, i: int) -> str:
        return self.pieces[int(i)]


def load_tokenizer(path: Optional[str] = None, kind: str = "auto"):
    """Load a tokenizer.

    - ``path=None`` → default :class:`CharTokenizer`.
    - ``*.model`` → :class:`SentencePieceTokenizer`.
    - ``*.txt`` / ``*.vocab`` → :class:`VocabTokenizer`.
    """
    if path is None:
        return CharTokenizer()
    if kind == "auto":
        if path.endswith(".model"):
            kind = "sentencepiece"
        elif path.endswith((".txt", ".vocab")):
            kind = "vocab"
        else:
            kind = "sentencepiece"
    if kind == "sentencepiece":
        return SentencePieceTokenizer.from_file(path)
    if kind == "vocab":
        return VocabTokenizer.from_file(path)
    raise ValueError(f"unknown tokenizer kind: {kind}")
