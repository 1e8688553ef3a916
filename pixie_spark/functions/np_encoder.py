"""Pure-numpy transformer encoder + subword tokenizer implementing the
EXACT interface surface of onnxruntime / sentencepiece that
:mod:`pixie_spark.functions.ml_ops` drives for real inference
(ref: src/carnot/funcs/builtins/ml_ops.cc:32-39, which EMBEDS its ONNX
sentence encoder; src/carnot/exec/ml/ holds the kernels).

Why this exists: the container ships neither onnxruntime nor
sentencepiece, so the Arrow-batched inference UDFs — the code most
likely to harbor shape/dtype/padding bugs — could never execute in CI.
A ``NumpyEncoderSession`` is a drop-in for ``ort.InferenceSession``
(``get_inputs()``/``run()``) and ``TinyVocabTokenizer`` for
``spm.SentencePieceProcessor`` (``encode()``), both loaded through the
same per-worker cache and file-path plumbing, so the UDF batch path runs
for real: variable-length tokenization, padding, attention masking,
(batch, seq, dim) hidden states, masked mean pooling. The weights are
random (seeded) — the geometry is untrained, but every array shape,
dtype, and mask interaction is the one a production encoder would see.

Model files:
- ``*.npz``      — encoder weights (numpy archive; see save_tiny_encoder)
- ``*.json``     — tokenizer vocab ({"pieces": [...]})
Paths with any other extension route to the real libraries.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np

# keep in sync with ml_ops._EMBED_DIM default usage; the encoder dim is
# stored in the npz so sessions are self-describing.
_DEF_DIM = 32
_DEF_LAYERS = 2
_DEF_MAX_LEN = 256

# byte fallback occupies ids 0..255; learned pieces start here
_PIECE_ID_BASE = 256


# ---------------------------------------------------------------------------
# Tokenizer: greedy longest-match subword vocab with byte fallback
# ---------------------------------------------------------------------------


def train_tiny_vocab(texts, size: int = 512, max_piece_len: int = 6) -> list[str]:
    """Frequency-ranked substring vocabulary from a text sample — a toy
    unigram trainer: every substring of length 2..max_piece_len of every
    whitespace word is a candidate; the ``size`` most frequent win.
    Deterministic (ties broken lexicographically)."""
    freq: dict[str, int] = {}
    for t in texts:
        for w in (t or "").split():
            for ln in range(2, max_piece_len + 1):
                for i in range(0, len(w) - ln + 1):
                    p = w[i : i + ln]
                    freq[p] = freq.get(p, 0) + 1
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    return [p for p, _ in ranked[:size]]


def save_tiny_tokenizer(path: str, pieces: list[str]) -> str:
    with open(path, "w") as f:
        json.dump({"pieces": pieces}, f)
    return path


class TinyVocabTokenizer:
    """sentencepiece-shaped tokenizer: greedy longest-match over a piece
    vocab, unknown characters fall back to UTF-8 byte ids (0..255).
    Implements the one method ml_ops' UDFs call: ``encode(text)``."""

    def __init__(self, path: str):
        with open(path) as f:
            pieces = json.load(f)["pieces"]
        self.pieces = pieces
        self._by_piece = {p: _PIECE_ID_BASE + i for i, p in enumerate(pieces)}
        self._max_len = max((len(p) for p in pieces), default=1)
        self.vocab_size = _PIECE_ID_BASE + len(pieces)

    def encode(self, text: str) -> list[int]:
        ids: list[int] = []
        for w in (text or "").split():
            i = 0
            while i < len(w):
                match = None
                for ln in range(min(self._max_len, len(w) - i), 1, -1):
                    cand = w[i : i + ln]
                    if cand in self._by_piece:
                        match = cand
                        break
                if match is not None:
                    ids.append(self._by_piece[match])
                    i += len(match)
                else:
                    ids.extend(w[i].encode("utf-8"))
                    i += 1
        return ids


# ---------------------------------------------------------------------------
# Encoder: 2-layer single-head transformer, forward pass in numpy
# ---------------------------------------------------------------------------


def save_tiny_encoder(
    path: str,
    vocab_size: int,
    dim: int = _DEF_DIM,
    n_layers: int = _DEF_LAYERS,
    max_len: int = _DEF_MAX_LEN,
    seed: int = 0,
) -> str:
    """Write a random-weight (seeded, deterministic) encoder npz."""
    rng = np.random.default_rng(seed)

    def w(*shape):
        return (rng.standard_normal(shape) * 0.08).astype(np.float32)

    arrays = {
        "tok_emb": w(vocab_size, dim),
        "pos_emb": w(max_len, dim),
        "meta": np.array([vocab_size, dim, n_layers, max_len], dtype=np.int64),
    }
    for l in range(n_layers):
        arrays[f"l{l}.wq"] = w(dim, dim)
        arrays[f"l{l}.wk"] = w(dim, dim)
        arrays[f"l{l}.wv"] = w(dim, dim)
        arrays[f"l{l}.wo"] = w(dim, dim)
        arrays[f"l{l}.ln1_g"] = np.ones(dim, dtype=np.float32)
        arrays[f"l{l}.ln1_b"] = np.zeros(dim, dtype=np.float32)
        arrays[f"l{l}.w1"] = w(dim, 4 * dim)
        arrays[f"l{l}.b1"] = np.zeros(4 * dim, dtype=np.float32)
        arrays[f"l{l}.w2"] = w(4 * dim, dim)
        arrays[f"l{l}.b2"] = np.zeros(dim, dtype=np.float32)
        arrays[f"l{l}.ln2_g"] = np.ones(dim, dtype=np.float32)
        arrays[f"l{l}.ln2_b"] = np.zeros(dim, dtype=np.float32)
    np.savez(path, **arrays)
    return path


def _layernorm(x, g, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * g + b


class _Input:
    def __init__(self, name: str):
        self.name = name


class NumpyEncoderSession:
    """ort.InferenceSession drop-in: ``get_inputs()`` exposes
    input_ids/attention_mask, ``run(None, feeds)`` returns
    ``[hidden]`` with hidden of shape (batch, seq, dim) float32.

    The forward pass is a standard pre-dim-era encoder block: token +
    position embeddings, per layer single-head self-attention with the
    PADDING MASK applied as -1e9 on attention logits (so padded
    positions neither attend nor get attended to), residual + layernorm,
    GELU MLP, residual + layernorm. Padded positions still carry values
    at the output — downstream mean pooling must mask them, which is
    exactly the contract (and bug surface) of a real encoder.
    """

    def __init__(self, path: str):
        z = np.load(path)
        self._z = {k: z[k] for k in z.files}
        self.vocab_size, self.dim, self.n_layers, self.max_len = (
            int(v) for v in self._z["meta"]
        )

    def get_inputs(self):
        return [_Input("input_ids"), _Input("attention_mask")]

    def run(self, _out_names, feeds: dict):
        ids = np.asarray(feeds["input_ids"], dtype=np.int64)
        if ids.ndim != 2:
            raise ValueError(f"input_ids must be (batch, seq), got {ids.shape}")
        mask = np.asarray(
            feeds.get("attention_mask", np.ones_like(ids)), dtype=np.int64
        )
        if mask.shape != ids.shape:
            raise ValueError(f"attention_mask {mask.shape} != input_ids {ids.shape}")
        b, s = ids.shape
        if s > self.max_len:
            raise ValueError(f"sequence length {s} exceeds max_len {self.max_len}")
        if ids.min() < 0 or ids.max() >= self.vocab_size:
            raise ValueError("token id outside embedding table")
        z = self._z
        x = z["tok_emb"][ids] + z["pos_emb"][:s][None, :, :]
        neg = (1.0 - mask[:, None, :].astype(np.float32)) * -1e9  # (b, 1, s)
        for l in range(self.n_layers):
            q = x @ z[f"l{l}.wq"]
            k = x @ z[f"l{l}.wk"]
            v = x @ z[f"l{l}.wv"]
            logits = q @ k.transpose(0, 2, 1) / np.sqrt(self.dim) + neg
            logits -= logits.max(-1, keepdims=True)
            attn = np.exp(logits)
            attn /= attn.sum(-1, keepdims=True)
            x = _layernorm(
                x + (attn @ v) @ z[f"l{l}.wo"], z[f"l{l}.ln1_g"], z[f"l{l}.ln1_b"]
            )
            h = x @ z[f"l{l}.w1"] + z[f"l{l}.b1"]
            h = 0.5 * h * (1.0 + np.tanh(0.7978845608 * (h + 0.044715 * h**3)))
            x = _layernorm(
                x + h @ z[f"l{l}.w2"] + z[f"l{l}.b2"], z[f"l{l}.ln2_g"], z[f"l{l}.ln2_b"]
            )
        return [x.astype(np.float32)]


# ---------------------------------------------------------------------------
# On-disk singleton for queries/tests
# ---------------------------------------------------------------------------

# A tiny deterministic seed corpus for the default vocab — english-ish
# words matching the fixture generator's vocabulary style, so the
# tokenizer learns multi-char pieces rather than pure byte fallback.
_SEED_CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "distributed query engines shuffle partition broadcast join",
    "training data pipelines deduplicate documents embeddings tokens",
    "streaming windows watermark aggregate rolling latency histogram",
    "service request response error status cluster namespace pod node",
]


def ensure_tiny_encoder(
    dir_path: str | None = None,
    texts=None,
    vocab_pieces: int = 512,
    seed: int = 0,
) -> tuple[str, str]:
    """Idempotently materialize (encoder.npz, vocab.json) under
    ``dir_path`` (default: a fixed tempdir path) and return the paths.
    Deterministic for a given (texts, vocab_pieces, seed): safe to call
    from the driver before handing paths to executor-side UDFs (local
    mode shares the filesystem; a cluster deployment would ship them via
    SparkContext.addFile)."""
    d = dir_path or os.path.join(tempfile.gettempdir(), "pixie_spark_tiny_encoder")
    os.makedirs(d, exist_ok=True)
    vocab_path = os.path.join(d, "vocab.json")
    model_path = os.path.join(d, "encoder.npz")
    if not (os.path.exists(vocab_path) and os.path.exists(model_path)):
        pieces = train_tiny_vocab(texts or _SEED_CORPUS, size=vocab_pieces)
        save_tiny_tokenizer(vocab_path, pieces)
        save_tiny_encoder(model_path, vocab_size=_PIECE_ID_BASE + len(pieces), seed=seed)
    return model_path, vocab_path
