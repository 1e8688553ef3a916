"""Pure-Python replica of Spark SQL's ``xxhash64`` for verification.

Spark's XxHash64 expression folds each argument into a running hash:
``h = seed (42); for each child: h = XXH64_small(child_bytes, h)`` —
for LongType the 8-byte specialization, for IntegerType the 4-byte one
(XXH64 spec, https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md;
public algorithm, re-implemented from the spec).

The ORACLE side of hash-dependent operators (epoch_expand's fractional
pick, assign_shards' permutation order) needs the same numbers DuckDB-
side; these functions are registered as DuckDB Python UDFs by
tools/check_oracle.py. Verification-only — the engine itself always
uses the JVM-native F.xxhash64.

Pinned bit-for-bit against Spark in tests/test_local_oracles.py.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def hash_long(value: int, seed: int) -> int:
    """XXH64 of one 8-byte little-endian long (Spark hashLong)."""
    v = value & _M
    s = seed & _M
    h = (s + _P5 + 8) & _M
    k1 = _rotl((v * _P2) & _M, 31)
    k1 = (k1 * _P1) & _M
    h ^= k1
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def hash_int(value: int, seed: int) -> int:
    """XXH64 of one 4-byte little-endian int (Spark hashInt)."""
    v = value & 0xFFFFFFFF
    s = seed & _M
    h = (s + _P5 + 4) & _M
    h ^= (v * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def xxhash64_long(value: int, seed: int = 42) -> int:
    """Signed-int64 replica of Spark ``F.xxhash64(long_col)``."""
    return _to_signed(hash_long(value, seed))


def xxhash64_long_int(value: int, int_arg: int, seed: int = 42) -> int:
    """Signed-int64 replica of ``F.xxhash64(long_col, F.lit(int_arg))``
    (a Python int literal ≤ 2^31-1 is IntegerType in Spark, so the
    second fold is the 4-byte specialization)."""
    return _to_signed(hash_int(int_arg, hash_long(value, seed)))


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M, 31) * _P1) & _M


def hash_bytes(data: bytes, seed: int) -> int:
    """Full XXH64 over a byte string (the spec's general case — Spark
    uses it for StringType children, over the UTF-8 bytes)."""
    n = len(data)
    i = 0
    s = seed & _M
    if n >= 32:
        a1 = (s + _P1 + _P2) & _M
        a2 = (s + _P2) & _M
        a3 = s
        a4 = (s - _P1) & _M
        while i + 32 <= n:
            a1 = _round(a1, int.from_bytes(data[i : i + 8], "little"))
            a2 = _round(a2, int.from_bytes(data[i + 8 : i + 16], "little"))
            a3 = _round(a3, int.from_bytes(data[i + 16 : i + 24], "little"))
            a4 = _round(a4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)) & _M
        for a in (a1, a2, a3, a4):
            h = ((h ^ _round(0, a)) * _P1 + _P4) & _M
    else:
        h = (s + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def xxhash64_str(value: str, seed: int = 42) -> int:
    """Signed-int64 replica of Spark ``F.xxhash64(string_col)``."""
    return _to_signed(hash_bytes(value.encode("utf-8"), seed))


def xxhash64_str_int(value: str, int_arg: int, seed: int = 42) -> int:
    """Signed-int64 replica of ``F.xxhash64(string_col, F.lit(i))``."""
    return _to_signed(hash_int(int_arg, hash_bytes(value.encode("utf-8"), seed)))


def xxhash64_words(words: list[str], seed: int = 42) -> int:
    """Signed-int64 replica of ``F.xxhash64(w0, w1, ..., wn)`` over n
    string columns — Spark folds each child into the running hash, so
    this is the shingle-id (sid) computation of the dedup family."""
    h = seed & _M
    for w in words:
        h = hash_bytes(w.encode("utf-8"), h)
    return _to_signed(h)


def xxhash64_chain(parts: list[str | None], seed: int = 42) -> int:
    """Signed-int64 replica of ``F.xxhash64(...)`` over a TYPED argument
    chain — the general form covering struct children of mixed types
    (Spark folds a struct field-by-field into the running hash, each
    field with its own width specialization). Each element is
    ``"<t>:<value>"`` with ``t`` ∈ {``l`` long (8-byte), ``i`` int
    (4-byte), ``s`` string (utf-8 bytes)}; a NULL element is skipped,
    matching Spark's null-child behavior (hash unchanged)."""
    h = seed & _M
    for p in parts:
        if p is None:
            continue
        t, v = p[0], p[2:]
        if t == "l":
            h = hash_long(int(v), h)
        elif t == "i":
            h = hash_int(int(v), h)
        elif t == "s":
            h = hash_bytes(v.encode("utf-8"), h)
        else:
            raise ValueError(f"unknown chain part type {t!r}")
    return _to_signed(h)


def xxhash64_longs(values: list[int], seed: int = 42) -> int:
    """Signed-int64 replica of ``F.xxhash64(l0, l1, ..., ln)`` over n
    LONG columns — the LSH band-bucket computation (_band_entries hashes
    each band's signature slice)."""
    h = seed & _M
    for v in values:
        h = hash_long(v, h)
    return _to_signed(h)


def minhash_mix64(h1: int, h2: int, num_hashes: int = 64) -> list[int]:
    """Replica of operators/dedup._minhash_mix for i in 0..num_hashes-1:
    mix_i = h1 XOR rotl64(h2, i) (Kirsch-Mitzenmacher double hashing,
    XOR-rotate form). Returns the full signature-candidate vector for
    one shingle row; min over shingles per position = the signature."""
    h1u, h2u = h1 & _M, h2 & _M
    out = [_to_signed(h1u ^ h2u)]
    for i in range(1, num_hashes):
        rot = ((h2u << i) | (h2u >> (64 - i))) & _M
        out.append(_to_signed(h1u ^ rot))
    return out
