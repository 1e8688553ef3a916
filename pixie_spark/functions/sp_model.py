"""Micro sentencepiece engine: parse real ``.model`` files and encode
with unigram Viterbi — no C++ library needed.

A sentencepiece ``.model`` artifact is a serialized ``ModelProto``
(protobuf wire format, public spec:
github.com/google/sentencepiece/blob/master/src/sentencepiece_model.proto).
The fields this engine needs are just the piece inventory:

    ModelProto    { repeated SentencePiece pieces = 1; ... }
    SentencePiece { optional string piece = 1;   // tag 0x0A len-delim
                    optional float  score = 2;   // tag 0x15 fixed32
                    optional Type   type  = 3; } // tag 0x18 varint
    Type: NORMAL=1 UNKNOWN=2 CONTROL=3 USER_DEFINED=4 UNUSED=5 BYTE=6

Encoding is the unigram-LM Viterbi segmentation (Kudo 2018,
"Subword Regularization"): maximize the sum of piece log-probs over a
segmentation of the normalized text; token id = piece index, exactly
the library's id contract. Normalization implements the spm defaults
that matter for segmentation — add_dummy_prefix + whitespace escaping
to U+2581 ("▁") — NOT full NFKC (documented divergence; ASCII corpora
are unaffected). Characters no piece covers emit the UNKNOWN piece id.

This is a correct REIMPLEMENTATION reading the genuine artifact — not
a stub with fake ids — but it is opt-in (ml_ops.encode_sentence_piece
engine="micro"): the default path still demands the real library
loudly, so a prod config typo cannot silently switch tokenizers.
Parity with the real library, when installed, is asserted in
tests/test_sp_micro.py.
"""

from __future__ import annotations

import struct

WS = "▁"  # spm's whitespace symbol ▁

_NORMAL, _UNKNOWN, _CONTROL, _USER_DEFINED, _UNUSED, _BYTE = range(1, 7)


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _skip_field(buf: bytes, i: int, wire_type: int) -> int:
    if wire_type == 0:  # varint
        return _read_varint(buf, i)[1]
    if wire_type == 1:  # fixed64
        return i + 8
    if wire_type == 2:  # len-delimited
        n, i = _read_varint(buf, i)
        return i + n
    if wire_type == 5:  # fixed32
        return i + 4
    raise ValueError(f"unsupported protobuf wire type {wire_type}")


def _parse_piece(buf: bytes) -> tuple[str, float, int]:
    piece, score, ptype = "", 0.0, _NORMAL
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        field, wt = tag >> 3, tag & 7
        if field == 1 and wt == 2:
            n, i = _read_varint(buf, i)
            piece = buf[i : i + n].decode("utf-8")
            i += n
        elif field == 2 and wt == 5:
            score = struct.unpack("<f", buf[i : i + 4])[0]
            i += 4
        elif field == 3 and wt == 0:
            ptype, i = _read_varint(buf, i)
        else:
            i = _skip_field(buf, i, wt)
    return piece, score, ptype


def parse_model(data: bytes) -> list[tuple[str, float, int]]:
    """ModelProto bytes → [(piece, score, type)] in id order."""
    pieces = []
    i = 0
    while i < len(data):
        tag, i = _read_varint(data, i)
        field, wt = tag >> 3, tag & 7
        if field == 1 and wt == 2:
            n, i = _read_varint(data, i)
            pieces.append(_parse_piece(data[i : i + n]))
            i += n
        else:
            i = _skip_field(data, i, wt)
    return pieces


def serialize_model(pieces: list[tuple[str, float, int]]) -> bytes:
    """[(piece, score, type)] → ModelProto bytes — the test-side writer
    (byte-compatible with what the library reads; lets lib-less CI build
    genuine artifacts)."""
    out = bytearray()
    for piece, score, ptype in pieces:
        body = bytearray()
        pb = piece.encode("utf-8")
        body += b"\x0a" + _varint(len(pb)) + pb
        body += b"\x15" + struct.pack("<f", score)
        body += b"\x18" + _varint(ptype)
        out += b"\x0a" + _varint(len(body)) + bytes(body)
    return bytes(out)


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class MicroSentencePiece:
    """``encode()``-surface drop-in for SentencePieceProcessor, reading
    real ``.model`` bytes. Viterbi unigram segmentation; ids are piece
    indices, matching the library."""

    def __init__(self, model_file: str | None = None, model_bytes: bytes | None = None):
        if model_bytes is None:
            with open(model_file, "rb") as f:
                model_bytes = f.read()
        self.pieces = parse_model(model_bytes)
        if not self.pieces:
            raise ValueError("no pieces in model — not a sentencepiece ModelProto?")
        self._ids = {}
        self._max_len = 1
        self.unk_id = 0
        for idx, (piece, score, ptype) in enumerate(self.pieces):
            if ptype == _UNKNOWN:
                self.unk_id = idx
            if ptype in (_NORMAL, _USER_DEFINED):
                self._ids[piece] = (idx, score)
                self._max_len = max(self._max_len, len(piece))
        # per-char unknown penalty: below every real piece so Viterbi
        # only takes unk when nothing covers the char (the library's
        # unk_score + penalty serves the same role)
        self._unk_score = min(s for _, s, _ in self.pieces) - 10.0

    def _normalize(self, text: str) -> str:
        # add_dummy_prefix + whitespace escaping (spm defaults); words
        # separated by any whitespace run collapse to one ▁ boundary
        parts = text.split()
        if not parts:
            return ""
        return WS + WS.join(parts)

    def encode(self, text: str) -> list[int]:
        s = self._normalize(text or "")
        n = len(s)
        if n == 0:
            return []
        NEG = float("-inf")
        best = [NEG] * (n + 1)
        back: list[tuple[int, int] | None] = [None] * (n + 1)
        best[0] = 0.0
        for i in range(n):
            if best[i] == NEG:
                continue
            hi = min(n, i + self._max_len)
            for j in range(i + 1, hi + 1):
                hit = self._ids.get(s[i:j])
                if hit is not None:
                    idx, score = hit
                    cand = best[i] + score
                    if cand > best[j]:
                        best[j] = cand
                        back[j] = (i, idx)
            # unknown single char, only as a last resort
            j = i + 1
            cand = best[i] + self._unk_score
            if cand > best[j]:
                best[j] = cand
                back[j] = (i, self.unk_id)
        ids: list[int] = []
        j = n
        while j > 0:
            i, idx = back[j]
            ids.append(idx)
            j = i
        ids.reverse()
        return ids
