"""Gopher-style quality/repetition filters vs a brute-force Python
reference (operators/quality.py). The reference recomputes every stat
from first principles on the driver; the Spark side must match on both
hand-crafted pathological docs and the fixture corpus sample."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from pixie_spark.operators import quality as Q
from pixie_spark.sources import load_table

DOCS = [
    # clean English prose, long enough to pass word_count at min_words=10
    ("d1", "The quick brown fox jumps over the lazy dog and that is fine "
           "because we have plenty of words to work with in this document."),
    # heavy line duplication
    ("d2", "spam line one\nspam line one\nspam line one\nunique line\n"
           "spam line one"),
    # paragraph duplication
    ("d3", "para one body text\n\npara one body text\n\ndifferent para"),
    # repeated 2-gram dominating the text
    ("d4", "buy now buy now buy now buy now buy now buy now buy now"),
    # bullets and ellipses
    ("d5", "- item one\n- item two\n- item three\nending thought...\n"
           "more text here"),
    # symbols
    ("d6", "### heading ### with #tags and trailing ... dots ... here"),
    # non-alpha words
    ("d7", "123 456 789 0x1f 42 + = % $ 99 11 22 33 44 55"),
    # empty-ish
    ("d8", "   "),
    # repeated 5-gram
    ("d9", "alpha beta gamma delta epsilon alpha beta gamma delta epsilon "
           "zeta eta theta"),
]


def _words(text):
    return [w for w in re.split(r"\s+", text) if w != ""]


def _segs(text, sep):
    return [s for s in re.split(sep, text) if s.strip() != ""]


def _dup_stats(segs):
    n = len(segs)
    nd = len(set(segs))
    total = sum(len(s) for s in segs)
    dtotal = sum(len(s) for s in set(segs))
    return (
        (n - nd) / n if n else 0.0,
        (total - dtotal) / total if total else 0.0,
    )


def py_shape(text):
    ws = _words(text)
    wc = len(ws)
    lines = _segs(text, r"\n")
    nl = len(lines)
    n_sym = text.count("#") + len(re.findall(r"\.\.\.|…", text))
    bullets = sum(1 for l in lines if re.match(r"^[-*•●▪]", l.strip()))
    ell = sum(1 for l in lines if re.search(r"(\.\.\.|…)$", l.strip()))
    alpha = sum(1 for w in ws if re.search("[A-Za-z]", w))
    low = text.lower()
    stops = sum(1 for w in Q.GOPHER_STOP_WORDS if re.search(rf"\b{w}\b", low))
    return {
        "symbol_word_ratio": n_sym / wc if wc else 0.0,
        "bullet_line_frac": bullets / nl if nl else 0.0,
        "ellipsis_line_frac": ell / nl if nl else 0.0,
        "alpha_word_frac": alpha / wc if wc else 0.0,
        "stop_word_hits": stops,
    }


def py_ngram(text, top_ns=(2, 3, 4), dup_ns=(5, 6, 7, 8, 9, 10)):
    ws = _words(text)
    total = len(text)
    out = {}
    for n in sorted(set(top_ns) | set(dup_ns)):
        counts: dict[tuple, int] = {}
        for i in range(len(ws) - n + 1):
            g = tuple(ws[i : i + n])
            counts[g] = counts.get(g, 0) + 1
        if n in top_ns:
            rep = {g: c for g, c in counts.items() if c > 1}
            if rep:
                # highest count, tie-break longest char length
                best = max(
                    rep.items(),
                    key=lambda kv: (kv[1], sum(map(len, kv[0])) + n - 1),
                )
                frac = best[1] * (sum(map(len, best[0])) + n - 1) / total
            else:
                frac = 0.0
            out[f"top_{n}gram_char_frac"] = min(1.0, frac)
        if n in dup_ns:
            s = sum(
                c * (sum(map(len, g)) + n - 1)
                for g, c in counts.items()
                if c > 1
            )
            out[f"dup_{n}gram_char_frac"] = min(1.0, s / total if total else 0.0)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_line_and_shape_stats_match_reference(spark, docs_df):
    exprs = {
        **Q.line_repetition_stats(F.col("text")),
        **Q.doc_shape_stats(F.col("text")),
    }
    got = {
        r["doc_id"]: r.asDict()
        for r in docs_df.select(
            "doc_id", *[v.alias(k) for k, v in exprs.items()]
        ).collect()
    }
    for doc_id, text in DOCS:
        lf, lcf = _dup_stats(_segs(text, r"\n"))
        pf, pcf = _dup_stats(_segs(text, r"\n\s*\n"))
        exp = {
            "line_dup_frac": lf,
            "line_dup_char_frac": lcf,
            "para_dup_frac": pf,
            "para_dup_char_frac": pcf,
            **py_shape(text),
        }
        for k, v in exp.items():
            assert math.isclose(got[doc_id][k], v, abs_tol=1e-9), (doc_id, k, got[doc_id][k], v)


def test_ngram_repetition_matches_reference(spark, docs_df):
    got = {
        r["doc"]: r.asDict()
        for r in Q.ngram_repetition_stats(docs_df, "doc_id", "text").collect()
    }
    assert set(got) == {d for d, _ in DOCS}
    for doc_id, text in DOCS:
        exp = py_ngram(text)
        for k, v in exp.items():
            assert math.isclose(got[doc_id][k], v, abs_tol=1e-9), (doc_id, k, got[doc_id][k], v)


def test_gopher_filters_decisions(spark, docs_df):
    rows = {r["doc"]: r for r in Q.gopher_filters(docs_df, min_words=10).collect()}
    assert rows["d1"]["keep"] is True and rows["d1"]["failed_rules"] == []
    # d2: massive line duplication must fail the dup_line rules
    assert "dup_line_frac" in rows["d2"]["failed_rules"]
    # d4: 'buy now' 2-gram dominates → top_2gram fails
    assert "top_2gram" in rows["d4"]["failed_rules"]
    # d7: numeric soup fails alpha_words
    assert "alpha_words" in rows["d7"]["failed_rules"]
    # d8: empty-ish fails word_count
    assert "word_count" in rows["d8"]["failed_rules"]
    assert not rows["d8"]["keep"]


def test_gopher_filters_on_fixture_corpus(spark, sf_dir):
    """Smoke + invariants on the real documents table: stats in range,
    keep is boolean, row count preserved (one row per doc)."""
    docs = load_table(spark, sf_dir, "documents").limit(200)
    out = Q.gopher_filters(docs)
    n_in = docs.count()
    rows = out.collect()
    assert len(rows) == n_in
    frac_cols = [
        c for c in out.columns
        if c.endswith("_frac") or c.endswith("_char_frac") or c.endswith("_ratio")
    ]
    for r in rows:
        for c in frac_cols:
            v = r[c]
            assert v is None or (-1e-9 <= v <= 1.0 + 1e-9), (r["doc"], c, v)


def test_precomputed_array_args_match_default_paths(spark, docs_df):
    """The r11 tree-shrink lets gopher_filters pass precomputed
    words/lines/paras (and array_distinct twins) into the stat builders;
    this pins that the precomputed-argument paths are value-identical to
    the default (inline-derived) paths on every stat column."""
    t = F.col("text")
    ws = F.filter(F.split(t, r"\s+"), lambda w: w != "")
    lines = F.filter(F.split(t, r"\n"), lambda s: F.trim(s) != "")
    paras = F.filter(F.split(t, r"\n\s*\n"), lambda s: F.trim(s) != "")
    pre = docs_df.select(
        "doc_id",
        t,
        ws.alias("__ws"),
        lines.alias("__lines"),
        paras.alias("__paras"),
        F.array_distinct(lines).alias("__lines_d"),
        F.array_distinct(paras).alias("__paras_d"),
    )
    default = {
        **Q.doc_shape_stats(t),
        **Q.line_repetition_stats(t),
    }
    precomp = {
        **Q.doc_shape_stats(t, ws=F.col("__ws"), lines=F.col("__lines")),
        **Q._seg_dup_stats(F.col("__lines"), "line", segs_d=F.col("__lines_d")),
        **Q._seg_dup_stats(F.col("__paras"), "para", segs_d=F.col("__paras_d")),
    }
    assert set(default) == set(precomp)
    a = {r["doc_id"]: r.asDict() for r in pre.select(
        "doc_id", *[v.alias(k) for k, v in default.items()]).collect()}
    b = {r["doc_id"]: r.asDict() for r in pre.select(
        "doc_id", *[v.alias(k) for k, v in precomp.items()]).collect()}
    for doc_id in a:
        for k in default:
            assert a[doc_id][k] == b[doc_id][k], (doc_id, k, a[doc_id][k], b[doc_id][k])


# ---------------------------------------------------------------------------
# C4 line + page heuristic cleaning (Raffel et al. 2020 §2.2)
# ---------------------------------------------------------------------------

C4_PAGES = [
    # survives everything: >=5 sentences of >=3-word punctuated lines
    ("p1", "This is a good sentence with words.\n"
           "Another fine sentence right here!\n"
           "More valid prose ending properly.\n"
           "And one more full sentence here.\n"
           "Yet another complete sentence now.\n"
           "Final good sentence to pass gate."),
    # line-rule exercise: short line, unpunctuated line, cookie line,
    # javascript line — all dropped; page then falls below 5 sentences
    ("p2", "Too short.\n"
           "this line has no terminal punctuation at all\n"
           "This page uses cookies to improve service.\n"
           "Please enable javascript to continue browsing.\n"
           "Only this sentence and the short one survive here."),
    # page rules and precedence: brace beats lorem ipsum
    ("p3", "Code page { with braces }.\nlorem ipsum dolor sit amet etc."),
    ("p4", "lorem ipsum dolor sit amet consectetur.\nOtherwise a fine sentence."),
    # quote-terminated line counts as punctuated
    ("p5", 'He said the magic words."\nSecond sentence follows naturally now.\n'
           "Third one right after that too.\nFourth sentence of this page here.\n"
           "Fifth sentence wraps the page up."),
    ("p6", ""),
]


def _c4_python_reference(text: str, min_words: int = 3, min_sent: int = 5):
    lines = [l for l in text.split("\n") if l.strip() != ""]
    drop_re = re.compile(
        r"(javascript|terms of use|privacy policy|cookie policy"
        r"|uses cookies|use of cookies|use cookies)"
    )
    kept = [
        l
        for l in lines
        if re.search(r'[.!?"\']$', l.strip())
        and len([w for w in re.split(r"\s+", l.strip()) if w]) >= min_words
        and not drop_re.search(l.lower())
    ]
    clean = "\n".join(kept)
    n_sent = len(re.findall(r"[.!?]", clean))
    if "{" in text:
        reason = "brace"
    elif "lorem ipsum" in text.lower():
        reason = "lorem_ipsum"
    elif n_sent < min_sent:
        reason = "too_few_sentences"
    else:
        reason = None
    return {
        "text": clean,
        "n_lines": len(lines),
        "n_lines_kept": len(kept),
        "n_sentences": n_sent,
        "kept": reason is None,
        "drop_reason": reason,
    }


def test_c4_clean_matches_python_reference(spark):
    df = spark.createDataFrame(C4_PAGES, "doc_id string, text string")
    out = {r["doc_id"]: r.asDict() for r in Q.c4_clean(df, id_col="doc_id").collect()}
    assert set(out) == {d for d, _ in C4_PAGES}
    for did, text in C4_PAGES:
        ref = _c4_python_reference(text)
        got = {k: v for k, v in out[did].items() if k != "doc_id"}
        assert got == ref, (did, got, ref)


def test_c4_clean_reason_precedence_and_flags(spark):
    df = spark.createDataFrame(C4_PAGES, "doc_id string, text string")
    out = {r["doc_id"]: r for r in Q.c4_clean(df, id_col="doc_id").collect()}
    assert out["p1"]["kept"] and out["p1"]["drop_reason"] is None
    assert out["p2"]["drop_reason"] == "too_few_sentences"
    assert out["p3"]["drop_reason"] == "brace"  # brace wins over lorem ipsum
    assert out["p4"]["drop_reason"] == "lorem_ipsum"
    assert out["p5"]["kept"]  # quote-terminated line is punctuated
    # "Too short." fails the 3-word floor; only the final line survives
    assert out["p2"]["n_lines_kept"] == 1
    assert out["p6"]["text"] == "" and out["p6"]["n_lines"] == 0


def test_c4_clean_is_a_pure_map_stage(spark):
    df = spark.createDataFrame(C4_PAGES, "doc_id string, text string")
    plan = Q.c4_clean(df, id_col="doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # zero shuffle: scan-attached projection
    assert "BatchEvalPython" not in plan, plan


def test_c4_clean_null_text_is_honest_drop(spark):
    df = spark.createDataFrame([(0, None)], "doc_id long, text string")
    (r,) = Q.c4_clean(df, id_col="doc_id").collect()
    assert r["text"] == "" and r["n_lines"] == 0 and not r["kept"]
    assert r["drop_reason"] == "too_few_sentences"
