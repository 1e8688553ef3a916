"""pprof profile.proto serialization of folded stack traces.

Reference: the ``px.pprof`` UDA (src/carnot/funcs/builtins/pprof_ops.h:35-130,
registered pprof_ops.cc:32) builds a perftools.profiles.Profile from a
histogram of folded stack strings via px::shared::CreatePProfProfile
(src/shared/pprof/pprof.cc:31-146). This module re-expresses that as a
Spark plan instead of a serialized-state UDA:

1. a NATIVE hash aggregate reduces raw samples to the distinct-stack
   histogram — this is the reference's ``Update``/``Merge`` phase, and it
   is where the data volume collapses (billions of samples → thousands of
   distinct stacks), with Catalyst's partial+final agg as the
   distributed-merge strategy;
2. one Arrow-batched ``applyInPandas`` per output group encodes the small
   histogram into the pprof wire format — the reference's ``Finalize``.

The protobuf encoding is hand-rolled (the protobuf lib is not a
dependency): varint/length-delimited framing per the spec, packed
repeated numerics (proto3 default — parsers accept packed and unpacked
alike), fields emitted in field-number order. Profile shape matches
CreatePProfProfile exactly: sample_type = (samples, count) +
(cpu, nanoseconds); period_type = (cpu, nanoseconds); period = period_ms
in ns; per-sample values = (count, count * period_ns); one
location + line + function per distinct frame symbol; string table with
"" first. Stacks are encoded leaf-last in the folded string, so frames
are reversed into pprof's leaf-first location order (pprof.cc:93-97).

Determinism: histogram entries are encoded in sorted-stack order, so the
output bytes are stable across shuffles and partitionings.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# protobuf wire primitives
# ---------------------------------------------------------------------------


def _varint(n: int) -> bytes:
    if n < 0:  # int64 negatives: two's-complement 10-byte varint
        n += 1 << 64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _field_varint(field: int, value: int) -> bytes:
    return _tag(field, 0) + _varint(value)


def _field_bytes(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _field_packed(field: int, values: Iterable[int]) -> bytes:
    body = b"".join(_varint(v) for v in values)
    return _field_bytes(field, body)


# ---------------------------------------------------------------------------
# profile.proto message builders (field numbers from
# github.com/google/pprof proto/profile.proto)
# ---------------------------------------------------------------------------


def _value_type(type_idx: int, unit_idx: int) -> bytes:
    return _field_varint(1, type_idx) + _field_varint(2, unit_idx)


def encode_pprof(histo: dict[str, int], period_ms: int) -> bytes:
    """Serialize a {folded_stack: count} histogram to pprof wire bytes.

    Mirrors CreatePProfProfile (src/shared/pprof/pprof.cc:31-146): same
    sample/location/function/string-table construction, stable sorted
    iteration for deterministic output.
    """
    period_ns = int(period_ms) * 1_000_000

    # string table: "" first, then the fixed sample/period type names
    # (pprof.cc:50-60), then one entry per distinct frame symbol.
    strings: list[str] = ["", "samples", "count", "cpu", "nanoseconds"]
    # frame symbol -> location id (1-based; pprof reserves id 0)
    locations: dict[str, int] = {}

    samples = bytearray()
    location_msgs = bytearray()
    function_msgs = bytearray()

    for stack, count in sorted(histo.items()):
        count = int(count)
        loc_ids: list[int] = []
        # folded strings are root;..;leaf — pprof wants leaf first
        for symbol in reversed(stack.split(";")):
            loc_id = locations.get(symbol)
            if loc_id is None:
                loc_id = len(locations) + 1
                locations[symbol] = loc_id
                string_id = len(strings)
                strings.append(symbol)
                line = _field_varint(1, loc_id)  # Line.function_id
                location_msgs += _field_bytes(
                    4, _field_varint(1, loc_id) + _field_bytes(4, line)
                )  # Location{id, line}
                function_msgs += _field_bytes(
                    5, _field_varint(1, loc_id) + _field_varint(2, string_id)
                )  # Function{id, name}
            loc_ids.append(loc_id)
        sample = _field_packed(1, loc_ids) + _field_packed(
            2, [count, count * period_ns]
        )
        samples += _field_bytes(2, sample)

    out = bytearray()
    out += _field_bytes(1, _value_type(1, 2))  # sample_type samples/count
    out += _field_bytes(1, _value_type(3, 4))  # sample_type cpu/nanoseconds
    out += bytes(samples)
    out += bytes(location_msgs)
    out += bytes(function_msgs)
    for s in strings:
        out += _field_bytes(6, s.encode("utf-8"))
    out += _field_bytes(11, _value_type(3, 4))  # period_type cpu/nanoseconds
    out += _field_varint(12, period_ns)  # period
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder (DeserializePProfProfile analogue; also the round-trip test oracle)
# ---------------------------------------------------------------------------


def _iter_fields(buf: bytes):
    i, n = 0, len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, i = _read_varint(buf, i)
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            val, i = buf[i : i + ln], i + ln
        elif wire == 1:
            val, i = buf[i : i + 8], i + 8
        elif wire == 5:
            val, i = buf[i : i + 4], i + 4
        else:  # pragma: no cover - groups unused by pprof
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = out = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _packed_or_single(wire: int, val) -> list[int]:
    if wire == 0:
        return [val]
    out, i = [], 0
    while i < len(val):
        v, i = _read_varint(val, i)
        out.append(v)
    return out


def decode_pprof(blob: bytes) -> tuple[int, dict[str, int]]:
    """(period_ms, {folded_stack: count}) from pprof wire bytes.

    Mirrors DeserializePProfProfile (pprof.cc:148-190): walk samples,
    resolve location → line → function → string table, re-fold frames
    leaf-last. Accepts packed or unpacked repeated encodings.
    """
    strings: list[str] = []
    loc_to_fn: dict[int, int] = {}
    fn_to_name: dict[int, int] = {}
    raw_samples: list[tuple[list[int], list[int]]] = []
    period_ns = 0

    for field, wire, val in _iter_fields(blob):
        if field == 6:
            strings.append(val.decode("utf-8"))
        elif field == 2:
            loc_ids: list[int] = []
            values: list[int] = []
            for f2, w2, v2 in _iter_fields(val):
                if f2 == 1:
                    loc_ids += _packed_or_single(w2, v2)
                elif f2 == 2:
                    values += _packed_or_single(w2, v2)
            raw_samples.append((loc_ids, values))
        elif field == 4:
            loc_id = fn_id = 0
            for f2, w2, v2 in _iter_fields(val):
                if f2 == 1:
                    loc_id = v2
                elif f2 == 4:
                    for f3, _, v3 in _iter_fields(v2):
                        if f3 == 1:
                            fn_id = v3
            loc_to_fn[loc_id] = fn_id
        elif field == 5:
            fn_id = name_id = 0
            for f2, _, v2 in _iter_fields(val):
                if f2 == 1:
                    fn_id = v2
                elif f2 == 2:
                    name_id = v2
            fn_to_name[fn_id] = name_id
        elif field == 12 and wire == 0:
            period_ns = val

    histo: dict[str, int] = {}
    for loc_ids, values in raw_samples:
        symbols = [strings[fn_to_name[loc_to_fn[lid]]] for lid in loc_ids]
        stack = ";".join(reversed(symbols))  # leaf-first → root-first folded
        histo[stack] = histo.get(stack, 0) + (values[0] if values else 0)
    return period_ns // 1_000_000, histo


# ---------------------------------------------------------------------------
# the Spark operator
# ---------------------------------------------------------------------------

MULTIPLE_PERIODS_ERROR = (
    "Protobuf `SerializeToString` failed, multiple profiling periods found."
)


def pprof_profile(
    df: DataFrame,
    stack_col: str = "stack_trace",
    count_col: str = "count",
    period_ms_col: str = "profiler_sampling_period_ms",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """One pprof blob per group: (group_cols..., pprof binary).

    Phase 1 (native, scalable): hash-aggregate raw samples down to the
    distinct-stack histogram — partial+final agg does the cross-executor
    merge, and the shuffled volume is the number of DISTINCT stacks, not
    samples. Phase 2: applyInPandas over the reduced histogram encodes
    the wire bytes. Mixed sampling periods inside one group yield the
    reference's error string (pprof_ops.h:78-81) as the blob.
    """
    group_cols = list(group_cols)
    key = group_cols or ["__g"]
    reduced = df
    if not group_cols:
        reduced = reduced.withColumn("__g", F.lit(0))
    # the canonical usage groups BY the period column (pprof_ops.h Doc
    # example) — don't list it twice
    histo_keys = key + [c for c in (period_ms_col, stack_col) if c not in key]
    reduced = reduced.groupBy(*histo_keys).agg(F.sum(count_col).alias("__n"))

    out_schema = ", ".join(
        [f"`{c}` {t}" for c, t in reduced.select(*key).dtypes] + ["pprof binary"]
    )
    s, p = stack_col, period_ms_col

    def _encode(pdf):
        import pandas as pd

        periods = pdf[p].unique()
        if len(periods) != 1:
            blob = MULTIPLE_PERIODS_ERROR.encode()
        else:
            histo = dict(zip(pdf[s], pdf["__n"]))
            blob = encode_pprof(histo, int(periods[0]))
        return pd.DataFrame([[*pdf.iloc[0][key], blob]], columns=[*key, "pprof"])

    result = reduced.groupBy(*key).applyInPandas(_encode, out_schema)
    return result.drop("__g") if not group_cols else result
