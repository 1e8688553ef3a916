"""Property-based cross-checks (hypothesis): Spark operators vs plain
Python reference implementations on randomized small inputs. Few, large
examples — each example runs Spark jobs."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pixie_spark.operators.asof import asof_join, sessionize
from pixie_spark.operators.dedup import jaccard_pairs

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=10,
)


def py_jaccard_pairs(texts, n=3, threshold=0.3):
    def sh(t):
        ws = [w for w in t.split() if w]
        return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}

    sets = {i: sh(t) for i, t in enumerate(texts)}
    out = {}
    for a in sets:
        for b in sets:
            if a < b and sets[a] and sets[b]:
                inter = len(sets[a] & sets[b])
                if inter:
                    j = inter / len(sets[a] | sets[b])
                    if j >= threshold:
                        out[(a, b)] = round(j, 9)
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_strategy)
def test_jaccard_matches_python(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
        for r in jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.3).collect()
    }
    assert got == py_jaccard_pairs(texts, 3, 0.3)


events_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 1000)), min_size=1, max_size=40
)


def py_sessionize(events, gap):
    # events: [(key, t)]; returns {(key, t, occurrence): session_id}
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, t in events:
        by_key[k].append(t)
    out = {}
    for k, ts in by_key.items():
        sid, prev = -1, None
        for t in sorted(ts):
            if prev is None or t - prev > gap:
                sid += 1
            out[(k, t)] = sid
            prev = t
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(events_strategy, st.integers(1, 100))
def test_sessionize_matches_python(spark, events, gap):
    df = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(events)], ["event_id", "k", "t"]
    )
    got = sessionize(df, "k", "t", gap).collect()
    expected = py_sessionize(events, gap)
    for r in got:
        assert r["session_id"] == expected[(r["k"], r["t"])]


asof_strategy = st.tuples(
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 100)), min_size=1, max_size=15),
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 100)), min_size=0, max_size=15),
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(asof_strategy)
def test_asof_matches_python(spark, data):
    left, right = data
    # dedupe right on (key,time) — at equal keys the matched VALUE is the
    # time itself, so duplicates are indistinguishable
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], ["lid", "k", "lt"]
    )
    rdf = spark.createDataFrame(
        list({(k, t) for k, t in right}) or [(99, -1)], ["k", "rt"]
    )
    got = {
        r["lid"]: r["rt_asof"]
        for r in asof_join(ldf, rdf, "k", "lt", "rt", ["rt"]).collect()
    }
    rset = {(k, t) for k, t in right} or {(99, -1)}
    for i, (k, t) in enumerate(left):
        cands = [rt for (rk, rt) in rset if rk == k and rt <= t]
        assert got[i] == (max(cands) if cands else None)


range_strategy = st.tuples(
    st.lists(st.tuples(st.integers(0, 1), st.integers(0, 200)), min_size=1, max_size=15),
    st.lists(st.tuples(st.integers(0, 1), st.integers(0, 200)), min_size=0, max_size=15),
    st.integers(-50, 0),
    st.integers(1, 60),
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(range_strategy)
def test_range_join_matches_python(spark, data):
    from pixie_spark.operators.rangejoin import range_join

    left, right, lo, hi_off = data
    hi = lo + hi_off
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], ["lid", "k", "lt"]
    )
    rdf = spark.createDataFrame(
        [(j, k, t) for j, (k, t) in enumerate(right)] or [(0, 99, -1000)], ["rid", "k2", "rt"]
    ).withColumnRenamed("k2", "k")
    got = {
        (r["lid"], r["rid"])
        for r in range_join(ldf, rdf, "lt", "rt", lo, hi, keys=["k"]).collect()
    }
    rlist = list(enumerate(right)) if right else [(0, (99, -1000))]
    expected = {
        (i, j)
        for i, (lk, lt) in enumerate(left)
        for j, (rk, rt) in rlist
        if lk == rk and lt + lo <= rt <= lt + hi
    }
    assert got == expected


def py_duplicate_spans(texts, k=3, min_docs=2):
    """Reference: windows repeated across >=min_docs docs, merged per doc
    when starts differ by <=k. Returns {(doc, start, end): n_windows}."""
    from collections import defaultdict

    wins = defaultdict(set)  # window string -> docs
    per_doc = defaultdict(list)  # doc -> window start positions
    words = {i: [w for w in t.split() if w] for i, t in enumerate(texts)}
    for i, ws in words.items():
        for p in range(len(ws) - k + 1):
            wins[" ".join(ws[p : p + k])].add(i)
    dup = {w for w, docs in wins.items() if len(docs) >= min_docs}
    for i, ws in words.items():
        for p in range(len(ws) - k + 1):
            if " ".join(ws[p : p + k]) in dup:
                per_doc[i].append(p)
    out = {}
    for i, ps in per_doc.items():
        start = prev = ps[0]
        n = 1
        for p in ps[1:]:
            if p - prev > k:
                out[(i, start, prev + k)] = n
                start, n = p, 0
            prev = p
            n += 1
        out[(i, start, prev + k)] = n
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_strategy)
def test_duplicate_spans_matches_python(spark, texts):
    from pixie_spark.operators.dedup import duplicate_spans

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        (r["doc"], r["span_start"], r["span_end"]): r["n_windows"]
        for r in duplicate_spans(df, "doc_id", "text", k=3).collect()
    }
    assert got == py_duplicate_spans(texts, k=3)


# ---------------------------------------------------------------------------
# Gopher quality/repetition stats vs the Python reference on random docs
# ---------------------------------------------------------------------------

QWORDS = ["the", "cat", "buy", "now", "-", "...", "x1", "##", "deadbeef"]

quality_docs_strategy = st.lists(
    st.lists(  # a doc = 1-6 lines of 0-8 words
        st.lists(st.sampled_from(QWORDS), min_size=0, max_size=8).map(" ".join),
        min_size=1,
        max_size=6,
    ).map("\n".join),
    min_size=1,
    max_size=6,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(quality_docs_strategy)
def test_quality_stats_match_python(spark, texts):
    import math

    from pyspark.sql import functions as F

    from pixie_spark.operators import quality as Q
    from tests.test_quality import _dup_stats, _segs, py_ngram, py_shape

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    exprs = {
        **Q.line_repetition_stats(F.col("text")),
        **Q.doc_shape_stats(F.col("text")),
    }
    got = {
        r["doc_id"]: r.asDict()
        for r in df.select("doc_id", *[v.alias(k) for k, v in exprs.items()]).collect()
    }
    ngr = {
        r["doc"]: r.asDict()
        for r in Q.ngram_repetition_stats(df, "doc_id", "text").collect()
    }
    for i, text in enumerate(texts):
        lf, lcf = _dup_stats(_segs(text, r"\n"))
        pf, pcf = _dup_stats(_segs(text, r"\n\s*\n"))
        exp = {
            "line_dup_frac": lf, "line_dup_char_frac": lcf,
            "para_dup_frac": pf, "para_dup_char_frac": pcf,
            **py_shape(text),
        }
        for k, v in exp.items():
            assert math.isclose(got[i][k], v, abs_tol=1e-9), (i, k, got[i][k], v)
        for k, v in py_ngram(text).items():
            assert math.isclose(ngr[i][k], v, abs_tol=1e-9), (i, k, ngr[i][k], v)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=9),
)
def test_global_prefix_sum_matches_python(spark, values, n_parts):
    """Exclusive prefix sum under any partition count equals the serial
    scan."""
    from pixie_spark.sources.shards import global_prefix_sum

    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "k long, v long")
    out = {
        r["k"]: r["cum_prev"]
        for r in global_prefix_sum(df, "v", "k", n_partitions=n_parts).collect()
    }
    acc = 0
    for k, v in rows:
        assert out[k] == acc
        acc += v


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=8),
    st.integers(min_value=2, max_value=12),
    st.integers(min_value=0, max_value=11),
)
def test_chunk_documents_matches_python(spark, lengths, chunk_words, overlap):
    """Chunk boundaries replicate the serial splitter for any
    (chunk, overlap) with overlap < chunk."""
    from pixie_spark.operators.text import chunk_documents

    if overlap >= chunk_words:
        overlap = chunk_words - 1
    stride = chunk_words - overlap
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(n))) for i, n in enumerate(lengths)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in chunk_documents(df, chunk_words=chunk_words, overlap=overlap).collect():
        got.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk_text"]
    for did, text in rows:
        ws = text.split()
        extra = max(0, len(ws) - chunk_words)
        n_chunks = 1 + -(-extra // stride)
        expect = {
            i: " ".join(ws[i * stride : i * stride + chunk_words]) for i in range(n_chunks)
        }
        assert got[did] == expect


# line corpora: few distinct line strings so cross-doc collisions are
# common; include empty lines and single-char lines (min_chars edge)
LINES = ["aa bb", "cc", "dd ee ff", "", "x", "aa bb"]

line_corpus_strategy = st.lists(
    st.lists(st.sampled_from(LINES), min_size=0, max_size=6).map("\n".join),
    min_size=1,
    max_size=8,
)


def py_line_dedup(texts, min_chars=1):
    seen = set()
    out = {}
    for did, t in enumerate(texts):
        lines = t.split("\n")
        keep, dropped = [], 0
        for l in lines:
            if len(l) >= min_chars:
                if l in seen:
                    dropped += 1
                    continue
                seen.add(l)
            keep.append(l)
        out[did] = ("\n".join(keep), len(lines), dropped)
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(line_corpus_strategy, st.sampled_from([1, 2]))
def test_line_level_dedup_matches_python(spark, texts, min_chars):
    from pixie_spark.operators.dedup import line_level_dedup

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_lines_dropped"])
        for r in line_level_dedup(df, min_chars=min_chars).collect()
    }
    assert got == py_line_dedup(texts, min_chars)


# C4 pages: lines with/without terminal punct, short lines, boilerplate
C4_LINE_POOL = [
    "A good long sentence here.",
    "short.",
    "no terminal punctuation line at all",
    "This page uses cookies thanks.",
    "Please enable javascript now please.",
    "Another perfectly fine sentence!",
    "",
    "Tail sentence with brace free text?",
    "lorem ipsum dolor sit amet etc.",
    "Code snippet { inside } braces.",
]

c4_pages_strategy = st.lists(
    st.lists(st.sampled_from(C4_LINE_POOL), min_size=0, max_size=8).map("\n".join),
    min_size=1,
    max_size=8,
)


def py_c4(text, min_words=3, min_sent=5):
    import re as _re

    lines = [l for l in text.split("\n") if l.strip() != ""]
    drop_re = _re.compile(
        r"(javascript|terms of use|privacy policy|cookie policy"
        r"|uses cookies|use of cookies|use cookies)"
    )
    kept = [
        l for l in lines
        if _re.search(r'[.!?"\']$', l.strip())
        and len([w for w in _re.split(r"\s+", l.strip()) if w]) >= min_words
        and not drop_re.search(l.lower())
    ]
    clean = "\n".join(kept)
    n_sent = len(_re.findall(r"[.!?]", clean))
    if "{" in text:
        reason = "brace"
    elif "lorem ipsum" in text.lower():
        reason = "lorem_ipsum"
    elif n_sent < min_sent:
        reason = "too_few_sentences"
    else:
        reason = None
    return (clean, len(lines), len(kept), n_sent, reason is None, reason)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(c4_pages_strategy)
def test_c4_clean_matches_python(spark, texts):
    from pixie_spark.operators.quality import c4_clean

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r["doc_id"]: (
            r["text"], r["n_lines"], r["n_lines_kept"], r["n_sentences"],
            r["kept"], r["drop_reason"],
        )
        for r in c4_clean(df).collect()
    }
    assert got == {i: py_c4(t) for i, t in enumerate(texts)}
