"""Table-driven scalar-function tests, mirroring the reference's UDF test
harness (src/carnot/udf/test_utils.h UDFTester; per-family files
src/carnot/funcs/builtins/*_test.cc)."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pixie_spark.functions import REGISTRY, lookup


def run1(spark, col_fn, value):
    """Evaluate a single-arg Column builder against one literal value."""
    df = spark.createDataFrame([(value,)], ["x"])
    return df.select(col_fn(F.col("x")).alias("out")).first()["out"]


# --- math (math_ops.cc) ------------------------------------------------------

MATH_CASES = [
    ("add", (2, 3), 5),
    ("subtract", (7, 3), 4),
    ("multiply", (4, 5), 20),
    ("divide", (9, 2), 4.5),
    ("modulo", (9, 4), 1),
    ("pow", (2.0, 10.0), 1024.0),
    ("bin", (1234, 100), 1200),
    ("equal", (3, 3), True),
    ("notEqual", (3, 4), True),
    ("greaterThan", (4, 3), True),
    ("lessThanEqual", (3, 3), True),
]


@pytest.mark.parametrize("name,args,expected", MATH_CASES)
def test_math_binary(spark, name, args, expected):
    fn = lookup(f"px.{name}")
    df = spark.createDataFrame([args], ["a", "b"])
    out = df.select(fn(F.col("a"), F.col("b")).alias("out")).first()["out"]
    assert out == expected


@pytest.mark.parametrize(
    "name,value,expected",
    [
        ("abs", -5.0, 5.0),
        ("sqrt", 16.0, 4.0),
        ("ceil", 1.2, 2),
        ("floor", 1.8, 1),
        ("exp", 0.0, 1.0),
        ("ln", math.e, 1.0),
        ("log2", 8.0, 3.0),
        ("log10", 1000.0, 3.0),
        ("negate", 3, -3),
    ],
)
def test_math_unary(spark, name, value, expected):
    out = run1(spark, lookup(name), value)
    assert out == pytest.approx(expected)


def test_aggregates(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (6.0,)], ["x"])
    row = df.agg(
        lookup("px.mean")("x").alias("mean"),
        lookup("px.sum")("x").alias("sum"),
        lookup("px.min")("x").alias("min"),
        lookup("px.max")("x").alias("max"),
        lookup("px.count")("x").alias("count"),
    ).first()
    assert row["mean"] == 3.0 and row["sum"] == 12.0
    assert row["min"] == 1.0 and row["max"] == 6.0 and row["count"] == 4


def test_quantiles_struct(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], ["x"])
    q = df.agg(lookup("px.quantiles")("x").alias("q")).first()["q"]
    assert q["p50"] == pytest.approx(50.0, abs=2)
    assert q["p99"] == pytest.approx(99.0, abs=2)


# --- strings (string_ops.cc) -------------------------------------------------


def test_string_ops(spark):
    df = spark.createDataFrame([Row(s="Hello World")])
    row = df.select(
        lookup("contains")("s", "World").alias("c"),
        lookup("length")("s").alias("l"),
        lookup("find")("s", "World").alias("f"),
        lookup("substring")(F.col("s"), 0, 5).alias("sub"),
        lookup("tolower")("s").alias("lo"),
        lookup("toupper")("s").alias("up"),
        lookup("strip_prefix")("Hello ", F.col("s")).alias("sp"),
        lookup("atoi")(F.lit("42")).alias("ai"),
        lookup("itoa")(F.lit(42)).alias("ia"),
    ).first()
    assert row["c"] is True and row["l"] == 11 and row["f"] == 6
    assert row["sub"] == "Hello" and row["lo"] == "hello world" and row["up"] == "HELLO WORLD"
    assert row["sp"] == "World" and row["ai"] == 42 and row["ia"] == "42"


def test_find_absent_is_minus_one(spark):
    assert run1(spark, lambda c: lookup("find")(c, "zzz"), "abc") == -1


def test_hex_round_trip(spark):
    df = spark.createDataFrame([Row(s="AB")])
    row = df.select(
        lookup("bytes_to_hex")("s").alias("h"),
    ).select(F.col("h"), lookup("hex_to_ascii")("h").alias("a")).first()
    assert row["h"] == "4142" and row["a"] == "AB"


# --- json (json_ops.cc) ------------------------------------------------------


def test_json_pluck(spark):
    df = spark.createDataFrame([Row(j='{"a": {"b": 3}, "s": "x", "f": 1.5, "arr": [1,2]}')])
    row = df.select(
        lookup("pluck")("j", "s").alias("s"),
        lookup("pluck_int64")("j", "$.a.b").alias("i"),
        lookup("pluck_float64")("j", "f").alias("f"),
        lookup("pluck")("j", "missing").alias("m"),
    ).first()
    assert row["s"] == "x" and row["i"] == 3 and row["f"] == 1.5
    # reference PluckUDF returns '' (not NULL) for a missing key
    # (json_ops.h:39-56)
    assert row["m"] == ""


def test_script_reference_shape(spark):
    df = spark.createDataFrame([Row(svc="api")])
    out = df.select(
        REGISTRY["_script_reference"](F.col("svc"), "px/service", {"svc": F.col("svc")}).alias("r")
    ).first()["r"]
    assert '"label":"api"' in out and '"script":"px/service"' in out


# --- regex / conditionals / collections -------------------------------------


def test_regex_ops(spark):
    df = spark.createDataFrame([Row(s="GET /api/v1/items/123")])
    row = df.select(
        lookup("regex_match")(r"GET /api/v\d+/items/\d+", "s").alias("m"),
        lookup("regex_replace")(r"\d+", "s", "N").alias("r"),
    ).first()
    assert row["m"] is True and row["r"] == "GET /api/vN/items/N"


def test_regex_match_is_full_match(spark):
    """Reference RegexMatchUDF = RE2::FullMatch (regex_ops.h:40-64): the
    pattern must cover the WHOLE string. 'abc' matches 'abc' but not
    'abcd'; regex_search keeps substring semantics."""
    from pixie_spark.functions.regex_ops import regex_search

    df = spark.createDataFrame([Row(s="abc"), Row(s="abcd")])
    rows = {
        r["s"]: (r["m"], r["p"])
        for r in df.select(
            "s",
            lookup("regex_match")("abc", "s").alias("m"),
            regex_search("abc", "s").alias("p"),
        ).collect()
    }
    assert rows["abc"] == (True, True)
    assert rows["abcd"] == (False, True)


def test_select_conditional(spark):
    df = spark.createDataFrame([(500,), (200,)], ["status"])
    out = [
        r["cls"]
        for r in df.select(
            lookup("select")(F.col("status") >= 400, F.lit("error"), F.lit("ok")).alias("cls")
        ).collect()
    ]
    assert sorted(out) == ["error", "ok"]


def test_any_agg(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], ["k", "v"])
    rows = df.groupBy("k").agg(lookup("any")("v").alias("v")).collect()
    assert {(r["k"], r["v"]) for r in rows} == {(1, "a"), (2, "b")}


# --- sql normalization / pii / protocols / uri / net ------------------------


def test_normalize_sql(spark):
    df = spark.createDataFrame(
        [Row(q="SELECT * FROM t WHERE a = 'x''y' AND b = 42 AND c IN (1, 2, 3)")]
    )
    out = df.select(lookup("normalize_mysql")("q").alias("n")).first()["n"]
    assert out == "SELECT * FROM t WHERE a = ? AND b = ? AND c IN (?)"


def test_normalize_pgsql_dollar(spark):
    df = spark.createDataFrame([Row(q="SELECT $tag$secret$tag$ , 7")])
    out = df.select(lookup("normalize_pgsql")("q").alias("n")).first()["n"]
    assert out == "SELECT ? , ?"


def test_pii_redaction(spark):
    df = spark.createDataFrame(
        [Row(t="mail a@b.com ip 10.1.2.3 ssn 123-45-6789")]
    )
    out = df.select(lookup("redact_pii_best_effort")("t").alias("r")).first()["r"]
    assert out == "mail <REDACTED_EMAIL> ip <REDACTED_IP> ssn <REDACTED_SSN>"


def test_protocol_names(spark):
    df = spark.createDataFrame([(1, 404, 1), (6, 200, 2)], ["p", "s", "r"])
    rows = df.select(
        lookup("protocol_name")("p").alias("pn"),
        lookup("http_resp_message")("s").alias("sm"),
        lookup("trace_role_name")("r").alias("rn"),
    ).collect()
    assert {(r["pn"], r["sm"], r["rn"]) for r in rows} == {
        ("HTTP", "Not Found", "client"),
        ("DNS", "OK", "server"),
    }


def test_uri_round_trip(spark):
    df = spark.createDataFrame([Row(u="a b/c?d=1")])
    row = df.select(lookup("uri_encode")("u").alias("e")).select(
        "e", lookup("uri_decode")("e").alias("d")
    ).first()
    assert row["d"] == "a b/c?d=1"


def test_ip_helpers(spark):
    df = spark.createDataFrame([("10.0.0.1",), ("8.8.8.8",), ("172.20.1.1",)], ["ip"])
    rows = df.select("ip", lookup("ip_is_private")("ip").alias("p")).collect()
    assert {(r["ip"], r["p"]) for r in rows} == {
        ("10.0.0.1", True),
        ("8.8.8.8", False),
        ("172.20.1.1", True),
    }
    v = df.where(F.col("ip") == "8.8.8.8").select(lookup("ip_to_int")("ip").alias("v")).first()["v"]
    assert v == 8 * 16777216 + 8 * 65536 + 8 * 256 + 8


def test_template_path(spark):
    df = spark.createDataFrame(
        [("/api/v1/items/123",), ("/api/v1/users/9/orders",), ("/healthz",)], ["p"]
    )
    rows = [r["t"] for r in df.select(lookup("template_path")("p").alias("t")).collect()]
    assert sorted(rows) == ["/api/v1/items/*", "/api/v1/users/*/orders", "/healthz"]


# --- upid (types.py / metadata_ops upid helpers) -----------------------------


def test_upid_round_trip(spark):
    from pixie_spark.types import make_upid, upid_to_asid, upid_to_pid, upid_to_string

    df = spark.createDataFrame([(3, 77, 123456789)], ["asid", "pid", "ts"])
    row = df.select(make_upid("asid", "pid", "ts").alias("u")).select(
        upid_to_asid(F.col("u")).alias("a"),
        upid_to_pid(F.col("u")).alias("p"),
        upid_to_string(F.col("u")).alias("s"),
    ).first()
    assert row["a"] == 3 and row["p"] == 77 and row["s"] == "3:77:123456789"


def test_registry_size():
    # §2.4 coverage floor: every family registered
    assert len(REGISTRY) >= 60


def test_replace_regex(spark):
    """Reference arg order (regex_ops.cc:107): px.replace(pattern, col, repl)."""
    df = spark.createDataFrame([Row(s="a.b.c")])
    assert df.select(lookup("replace")(r"\.", "s", "-").alias("r")).first()["r"] == "a-b-c"
    # first arg is a REGEX: '.' matches every character
    assert df.select(lookup("replace")(".", "s", "x").alias("r")).first()["r"] == "xxxxx"


def test_uri_parse_recompose(spark):
    df = spark.createDataFrame([Row(u="https://example.com:8443/api/v1?x=1&y=2")])
    parsed = df.select(lookup("uri_parse")("u").alias("p")).first()["p"]
    assert parsed["scheme"] == "https" and parsed["host"] == "example.com"
    assert parsed["port"] == 8443 and parsed["path"] == "/api/v1"
    assert parsed["query"] == "x=1&y=2"
    out = df.select(
        lookup("uri_parse")("u").alias("p")
    ).select(
        lookup("uri_recompose")(
            # reference positional order: scheme, userInfo, host, port,
            # path, query, fragment (uri_ops.h:167-173)
            F.col("p.scheme"), F.col("p.user_info"), F.col("p.host"),
            F.col("p.port"), F.col("p.path"), F.col("p.query"), F.lit(""),
        ).alias("u2")
    ).first()["u2"]
    assert out == "https://example.com:8443/api/v1?x=1&y=2"


def test_bin_exact_at_ns_scale(spark):
    """Regression: floor(x/w)*w via doubles rounds int64 ns epochs
    (>2^53) into the WRONG window near boundaries; bin must be exact."""
    w = 10_000_000_000
    boundary = 1_704_067_200_000_000_000
    cases = [boundary - 1, boundary, boundary + 1, boundary + w - 1]
    df = spark.createDataFrame([(c,) for c in cases], ["t"])
    got = [r["b"] for r in df.select(lookup("bin")("t", F.lit(w)).alias("b")).collect()]
    expected = [(c // w) * w for c in cases]
    assert got == expected


def test_approx_count_distinct_accuracy(spark, sf_dir):
    """HLL sketch (the 100 TB path for n_distinct) stays within 5% of
    exact on real data — the approximation-ladder contract (SCALE.md)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey").alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


def test_percentile_approx_is_mergeable(spark):
    """The quantile sketch must merge across partitions like the
    reference's serialized t-digest (partial/finalize): estimates from a
    heavily-partitioned frame match the single-partition estimate."""
    df = spark.range(100_000).select((F.col("id") % 9973).cast("double").alias("x"))
    single = df.coalesce(1).agg(F.percentile_approx("x", 0.9, 10_000).alias("p")).first()["p"]
    many = df.repartition(64).agg(F.percentile_approx("x", 0.9, 10_000).alias("p")).first()["p"]
    exact = df.agg(F.percentile("x", F.lit(0.9)).alias("p")).first()["p"]
    assert abs(single - exact) / exact < 0.02
    assert abs(many - exact) / exact < 0.02


def test_quantiles_json_pluck_idiom(spark):
    """The reference's script idiom works verbatim on the JSON-shaped
    quantiles: px.pluck_float64(quantiles_json(col), 'p99')
    (math_sketches.h ST_QUANTILES + json_ops pluck_float64)."""
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], ["x"])
    q = df.agg(lookup("quantiles_json")("x").alias("q"))
    row = q.select(
        lookup("pluck_float64")("q", "p99").alias("p99"),
        lookup("pluck_float64")("q", "p50").alias("p50"),
    ).first()
    assert row["p99"] == pytest.approx(99.0, abs=2)
    assert row["p50"] == pytest.approx(50.0, abs=2)


# --- ml_ops real-inference gating (ml_ops.cc:32-39) --------------------------


def test_text_embedding_default_deterministic(spark):
    from pixie_spark.functions import ml_ops

    df = spark.createDataFrame([("hello world",), ("hello world",), ("other",)], ["t"])
    rows = df.select(ml_ops.text_embedding(F.col("t")).alias("e")).collect()
    assert len(rows[0]["e"]) == 32
    assert rows[0]["e"] == rows[1]["e"]
    assert rows[0]["e"] != rows[2]["e"]
    # L2-normalized
    assert sum(x * x for x in rows[0]["e"]) == pytest.approx(1.0, rel=1e-5)


def test_text_embedding_default_is_semantic(spark):
    """The default is a JL sketch of the bag-of-words, not a fingerprint:
    word-overlapping texts must be closer in cosine than disjoint ones."""
    import math

    from pixie_spark.functions import ml_ops

    df = spark.createDataFrame(
        [
            ("a", "the quick brown fox jumps over the lazy dog"),
            ("b", "the quick brown fox jumps over the lazy cat"),
            ("c", "completely different words about spark query engines"),
        ],
        ["k", "t"],
    )
    rows = {
        r["k"]: r["e"]
        for r in df.select("k", ml_ops.text_embedding(F.col("t")).alias("e")).collect()
    }

    def cos(u, v):
        return sum(a * b for a, b in zip(u, v)) / (
            math.sqrt(sum(a * a for a in u)) * math.sqrt(sum(b * b for b in v))
        )

    assert cos(rows["a"], rows["b"]) > 0.5  # 8/9 words shared
    assert cos(rows["a"], rows["b"]) > cos(rows["a"], rows["c"]) + 0.3


def test_text_embedding_empty_text_zero_vector(spark):
    from pixie_spark.functions import ml_ops

    df = spark.createDataFrame([("",), ("   ",)], ["t"])
    rows = df.select(ml_ops.text_embedding(F.col("t")).alias("e")).collect()
    for r in rows:
        assert r["e"] == [0.0] * 32


def test_text_embedding_real_path_requires_libs(spark):
    """model_path given but inference libs absent must be a LOUD error,
    never a silent stub fallback (a prod config typo would otherwise ship
    fake embeddings)."""
    from pixie_spark.functions import ml_ops

    if ml_ops.have_onnxruntime() and ml_ops.have_sentencepiece():
        pytest.skip("inference libs present; covered by the real-path test")
    with pytest.raises(ImportError, match="onnxruntime"):
        ml_ops.text_embedding(F.col("t"), model_path="/tmp/model.onnx")
    if not ml_ops.have_sentencepiece():
        with pytest.raises(ImportError, match="sentencepiece"):
            ml_ops.encode_sentence_piece(F.col("t"), model_path="/tmp/sp.model")


def test_encode_sentence_piece_real_path_when_available(spark):
    """Runs REAL sentencepiece tokenization when the lib exists (skipped
    in containers without it — the point is the code path is genuine)."""
    from pixie_spark.functions import ml_ops

    if not ml_ops.have_sentencepiece():
        pytest.skip("sentencepiece not installed")
    import sentencepiece as spm  # noqa: F401 — train a toy model

    import io
    model = io.BytesIO()
    spm.SentencePieceTrainer.train(
        sentence_iterator=iter(["hello world"] * 100), model_writer=model,
        vocab_size=24,
    )
    path = "/tmp/test_sp.model"
    with open(path, "wb") as f:
        f.write(model.getvalue())
    df = spark.createDataFrame([("hello world",)], ["t"])
    (row,) = df.select(
        ml_ops.encode_sentence_piece(F.col("t"), model_path=path).alias("ids")
    ).collect()
    assert row["ids"] and all(isinstance(i, int) for i in row["ids"])


def test_pii_report_counts(spark):
    """Per-kind doc/match counts replicate a Python re reference on a
    planted corpus; clean docs keep the rate denominator honest."""
    import re

    from pixie_spark.functions.pii_ops import _PATTERNS, pii_report

    rows = [
        (1, "contact me at alice@example.com or bob@example.com", "en"),
        (2, "server at 10.0.0.1 and fe80::1 talked", "en"),
        (3, "ssn 123-45-6789 leaked with card 4111 1111 1111 1111", "en"),
        (4, "perfectly clean document text", "en"),
        (5, "another clean one", "es"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    rep = pii_report(df, "text").collect()[0]
    assert rep["n_docs"] == 5
    assert rep["docs_with_pii"] == 3
    assert rep["pii_doc_rate"] == pytest.approx(0.6)
    assert rep["docs_email"] == 1 and rep["matches_email"] == 2
    assert rep["docs_ssn"] == 1
    assert rep["docs_ip"] >= 1
    # cross-check every kind against Python re on the same patterns
    for kind, pat in _PATTERNS:
        total = sum(len(re.findall(pat, t)) for _, t, _ in rows)
        # the report applies each pattern independently (same as here)
        assert rep[f"matches_{kind.lower()}"] == total, kind

    by_lang = {r["lang"]: r for r in pii_report(df, "text", ["lang"]).collect()}
    assert by_lang["en"]["docs_with_pii"] == 3
    assert by_lang["es"]["docs_with_pii"] == 0
