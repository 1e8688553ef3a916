"""Gopher-style document quality & repetition filters for training-data
pipelines (Rae et al. 2021, "Scaling Language Models: ... Gopher",
Appendix A — the public rule set C4/MassiveText-style corpora use).

Two operator families:

- ``line_repetition_stats`` / ``doc_shape_stats``: per-document stats
  computed IN-ROW with native array expressions — a pure map stage,
  zero shuffle, linear in document length. These scale to 100 TB as a
  scan-attached projection.
- ``ngram_repetition_stats``: top-n-gram and duplicated-n-gram char
  fractions. Within-doc n-gram counting is done with the same
  window-lead + 8-byte-xxhash64 machinery as the dedup family
  (operators/dedup.py) — one by-doc window pass, one shuffle on
  (doc, n, gid) 8-byte keys, conditional-aggregate pivot back to one
  row per doc. No n-gram string is ever materialized.
- ``gopher_filters``: the composite keep/drop decision with the
  published thresholds and a per-rule failure list.

Reference parity note: the reference engine (pixie-io/pixie) has no
corpus-quality operators — this family extends the engine toward
LLM-training-data preparation, mirroring its style of native,
codegen-friendly column expressions (e.g. src/carnot/funcs/builtins/
string_ops.cc for the scalar-expression idiom).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _word_rows

# Gopher Appendix A thresholds (public).
GOPHER_STOP_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
TOP_NGRAM_THRESHOLDS = {2: 0.20, 3: 0.18, 4: 0.16}
DUP_NGRAM_THRESHOLDS = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def _segments(text: Column, sep: str) -> Column:
    """Non-empty segments of ``text`` split on regex ``sep``."""
    return F.filter(F.split(text, sep), lambda s: F.trim(s) != "")


def _seg_dup_stats(
    segs: Column, prefix: str, segs_d: Column | None = None
) -> dict[str, Column]:
    """Duplicate-segment stats over an array column, all O(len) in-row:

    - ``{prefix}_dup_frac``: fraction of segments that are repeat
      occurrences (2nd+ occurrence of an identical segment).
    - ``{prefix}_dup_char_frac``: fraction of segment characters in
      those repeat occurrences (total chars - chars of first
      occurrences).

    ``segs_d`` (optional): a precomputed ``array_distinct(segs)`` column
    reference — see the expression-tree note on :func:`gopher_filters`.
    """
    if segs_d is None:
        segs_d = F.array_distinct(segs)
    n = F.size(segs)
    nd = F.size(segs_d)
    total = F.aggregate(segs, F.lit(0).cast("long"), lambda acc, s: acc + F.length(s))
    dtotal = F.aggregate(
        segs_d, F.lit(0).cast("long"), lambda acc, s: acc + F.length(s)
    )
    return {
        f"{prefix}_dup_frac": F.when(n > 0, (n - nd) / n).otherwise(F.lit(0.0)),
        f"{prefix}_dup_char_frac": F.when(total > 0, (total - dtotal) / total).otherwise(
            F.lit(0.0)
        ),
    }


def line_repetition_stats(
    text: Column, lines: Column | None = None, paras: Column | None = None
) -> dict[str, Column]:
    """Duplicate line/paragraph fractions (4 columns). Lines split on
    newline; paragraphs on blank-line runs. ``lines``/``paras`` accept
    precomputed segment-array column references (tree-size note on
    :func:`gopher_filters`); values are identical either way."""
    if lines is None:
        lines = _segments(text, r"\n")
    if paras is None:
        paras = _segments(text, r"\n\s*\n")
    return {**_seg_dup_stats(lines, "line"), **_seg_dup_stats(paras, "para")}


def doc_shape_stats(
    text: Column, ws: Column | None = None, lines: Column | None = None
) -> dict[str, Column]:
    """Shape heuristics from the Gopher rule set, all in-row native:

    - ``symbol_word_ratio``: (# of '#' and ellipsis occurrences) / words
    - ``bullet_line_frac``: lines starting with a bullet marker
    - ``ellipsis_line_frac``: lines ending with an ellipsis
    - ``alpha_word_frac``: words containing >= 1 alphabetic char
    - ``stop_word_hits``: how many of the 8 Gopher stop words occur

    ``ws``/``lines`` accept precomputed non-empty-words / line-segment
    array column references (tree-size note on :func:`gopher_filters`);
    values are identical either way.
    """
    if ws is None:
        ws = F.filter(F.split(text, r"\s+"), lambda w: w != "")
    if lines is None:
        lines = _segments(text, r"\n")
    wc = F.size(ws)
    nl = F.size(lines)
    n_hash = F.size(F.regexp_extract_all(text, F.lit(r"#"), F.lit(0)))
    n_ellipsis = F.size(F.regexp_extract_all(text, F.lit(r"\.\.\.|…"), F.lit(0)))
    bullets = F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•●▪]")))
    ell_end = F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"(\.\.\.|…)$")))
    alpha = F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]")))
    lowered = F.lower(text)
    stop_hits = sum(
        (F.when(lowered.rlike(rf"\b{w}\b"), 1).otherwise(0) for w in GOPHER_STOP_WORDS),
        F.lit(0),
    )
    return {
        "symbol_word_ratio": F.when(wc > 0, (n_hash + n_ellipsis) / wc).otherwise(F.lit(0.0)),
        "bullet_line_frac": F.when(nl > 0, bullets / nl).otherwise(F.lit(0.0)),
        "ellipsis_line_frac": F.when(nl > 0, ell_end / nl).otherwise(F.lit(0.0)),
        "alpha_word_frac": F.when(wc > 0, alpha / wc).otherwise(F.lit(0.0)),
        "stop_word_hits": stop_hits,
    }


def ngram_repetition_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """Within-document n-gram repetition stats, one row per doc:

    - ``top_{n}gram_char_frac`` (n in top_ns): chars covered by the
      single most frequent word n-gram (count x gram-char-length,
      capped at 1.0) / total doc chars. Tie-break: longer gram. Only
      grams occurring >= 2 times count — a singleton is not
      repetition, and without this floor every short document trips
      the rule on its longest n-gram.
    - ``dup_{n}gram_char_frac`` (n in dup_ns): chars covered by ALL
      n-grams occurring more than once (sum of count x length over
      duplicated grams, capped at 1.0 — overlapping occurrences are
      counted per-occurrence, the standard approximation; the cap keeps
      the fraction a fraction).

    Plan: ONE window-lead pass materializes w0..w{max_n-1} per word
    position (shuffle: by doc); each position emits one (n, gid, chars)
    struct per requested n, gid = xxhash64 over the n words — the
    n-gram string never exists. groupBy (doc, n, gid) counts
    occurrences (shuffle: 8-byte keys); a conditional-aggregate pivot
    collapses back to one row per doc (reuses the by-doc partitioning
    target). Normalization chars come from length(text) via a final
    join on doc. A boilerplate gram repeated k times costs one counter
    row, not k² anything — no pair expansion exists here, so no skew
    cap is needed (cf. operators/dedup.py MAX_POSTING_LIST).
    """
    from pyspark.sql import Window

    all_ns = sorted(set(top_ns) | set(dup_ns))
    max_n = max(all_ns)
    win = Window.partitionBy("doc").orderBy("pos")
    w = _word_rows(df, id_col, text_col)
    proj = [F.col("word").alias("w0")] + [
        F.lead("word", j).over(win).alias(f"w{j}") for j in range(1, max_n)
    ]
    led = w.select("doc", "pos", *proj)

    def gram_struct(n: int) -> Column:
        chars = sum((F.length(f"w{j}") for j in range(n)), F.lit(n - 1))
        s = F.struct(
            F.lit(n).alias("n"),
            F.xxhash64(*[f"w{j}" for j in range(n)]).alias("gid"),
            chars.cast("long").alias("chars"),
        )
        return F.when(F.col(f"w{n - 1}").isNotNull(), s)

    grams = (
        led.select("doc", F.explode(F.array(*[gram_struct(n) for n in all_ns])).alias("g"))
        .where(F.col("g").isNotNull())
        .select("doc", F.col("g.n").alias("n"), F.col("g.gid").alias("gid"),
                F.col("g.chars").alias("chars"))
    )
    counts = grams.groupBy("doc", "n", "gid").agg(
        F.count(F.lit(1)).alias("c"), F.first("chars").alias("ch")
    )

    aggs = []
    for n in top_ns:
        # most frequent gram of this n; (c, ch) struct-max = highest
        # count, tie-broken by longest gram — deterministic.
        top = F.max(
            F.when((F.col("n") == n) & (F.col("c") > 1), F.struct(F.col("c"), F.col("ch")))
        )
        aggs.append(F.coalesce(top["c"] * top["ch"], F.lit(0)).alias(f"_top{n}"))
    for n in dup_ns:
        dup = F.sum(F.when((F.col("n") == n) & (F.col("c") > 1), F.col("c") * F.col("ch")))
        aggs.append(F.coalesce(dup, F.lit(0)).alias(f"_dup{n}"))
    per_doc = counts.groupBy("doc").agg(*aggs)

    totals = df.select(
        F.col(id_col).alias("doc"), F.length(text_col).cast("long").alias("_total_chars")
    )
    out = totals.join(per_doc, "doc", "left")
    cols = {}
    for n in top_ns:
        cols[f"top_{n}gram_char_frac"] = F.least(
            F.lit(1.0), F.coalesce(F.col(f"_top{n}") / F.col("_total_chars"), F.lit(0.0))
        )
    for n in dup_ns:
        cols[f"dup_{n}gram_char_frac"] = F.least(
            F.lit(1.0), F.coalesce(F.col(f"_dup{n}") / F.col("_total_chars"), F.lit(0.0))
        )
    return out.withColumns(cols).select("doc", *cols.keys())


def gopher_filters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    rules: list[str] | None = None,
) -> DataFrame:
    """The composite Gopher quality gate: per-doc stats + ``keep``
    boolean + ``failed_rules`` array naming every violated rule.

    Thresholds are the published Gopher Appendix A values: word count
    in [50, 100k], mean word length in [3, 10], symbol/word <= 0.1,
    bullet lines <= 90%, ellipsis lines <= 30%, alphabetic words >=
    80%, >= 2 of the 8 stop words, duplicate line/para fraction <=
    0.30, duplicate line/para char fraction <= 0.20, top-{2,3,4}-gram
    char fraction <= {.20,.18,.16}, dup-{5..10}-gram char fraction <=
    {.15..10}.

    The in-row stats ride the scan (map stage); only the n-gram stats
    shuffle (8-byte keys, see ngram_repetition_stats). Output keeps one
    row per input doc — filter on ``keep`` to materialize the cleaned
    corpus.

    ``rules`` restricts enforcement to the named subset (all stats are
    still computed) — e.g. a synthetic or non-English corpus drops
    ``stop_words``. Unknown names raise.
    """
    # The in-row shape/repetition stats are regex- and HOF-heavy per-row
    # work on the raw scan; on a few-row-group file that branch ran ONE
    # task (r11 profile: 2.6 s single-task). spread_if_narrow unsticks
    # it locally and is a no-op on cluster-parallel scans (guide §2.5).
    from pixie_spark.partitioning import spread_if_narrow

    # Expression-tree size (r11 optimization, guide §1.2 per-task work /
    # §7.3 planning cost): the stats reuse the words/lines/paras arrays
    # many times; inlined, every use re-embeds its split/filter subtree,
    # multiplying the Catalyst tree and the generated projection. The
    # single-shot (cold) cost of this operator is planning + codegen
    # compile, not execution — so the arrays (and their array_distinct
    # twins) are materialized ONCE as real columns in a preceding
    # projection and every stat is a column reference. Values are
    # identical; CollapseProject keeps the split projections (non-cheap
    # producers referenced more than once are never inlined).
    t = F.col(text_col)
    spread = spread_if_narrow(df)
    pre = spread.select(
        F.col(id_col).alias("doc"),
        t,
        F.filter(F.split(t, r"\s+"), lambda w: w != "").alias("__ws"),
        _segments(t, r"\n").alias("__lines"),
        _segments(t, r"\n\s*\n").alias("__paras"),
    ).withColumns(
        {
            "__lines_d": F.array_distinct(F.col("__lines")),
            "__paras_d": F.array_distinct(F.col("__paras")),
        }
    )
    ws, lines, paras = F.col("__ws"), F.col("__lines"), F.col("__paras")
    wc = F.size(ws)
    mwl = F.when(
        wc > 0,
        F.aggregate(ws, F.lit(0).cast("long"), lambda a, x: a + F.length(x)) / wc,
    ).otherwise(F.lit(0.0))
    stats = {
        "n_words": wc,
        "mean_word_len": mwl,
        **doc_shape_stats(t, ws=ws, lines=lines),
        **_seg_dup_stats(lines, "line", segs_d=F.col("__lines_d")),
        **_seg_dup_stats(paras, "para", segs_d=F.col("__paras_d")),
    }
    base = pre.select("doc", *[v.alias(k) for k, v in stats.items()])
    ngr = ngram_repetition_stats(df, id_col, text_col)
    full = base.join(ngr, "doc", "left")

    rules_all: list[tuple[str, Column]] = [
        ("word_count", (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)),
        ("mean_word_length", (F.col("mean_word_len") >= 3.0) & (F.col("mean_word_len") <= 10.0)),
        ("symbol_word_ratio", F.col("symbol_word_ratio") <= 0.1),
        ("bullet_lines", F.col("bullet_line_frac") <= 0.9),
        ("ellipsis_lines", F.col("ellipsis_line_frac") <= 0.3),
        ("alpha_words", F.col("alpha_word_frac") >= 0.8),
        ("stop_words", F.col("stop_word_hits") >= 2),
        ("dup_line_frac", F.col("line_dup_frac") <= 0.30),
        ("dup_para_frac", F.col("para_dup_frac") <= 0.30),
        ("dup_line_char_frac", F.col("line_dup_char_frac") <= 0.20),
        ("dup_para_char_frac", F.col("para_dup_char_frac") <= 0.20),
    ]
    for n, thr in TOP_NGRAM_THRESHOLDS.items():
        rules_all.append(
            (f"top_{n}gram", F.coalesce(F.col(f"top_{n}gram_char_frac"), F.lit(0.0)) <= thr)
        )
    for n, thr in DUP_NGRAM_THRESHOLDS.items():
        rules_all.append(
            (f"dup_{n}gram", F.coalesce(F.col(f"dup_{n}gram_char_frac"), F.lit(0.0)) <= thr)
        )

    if rules is not None:
        known = {name for name, _ in rules_all}
        unknown = set(rules) - known
        if unknown:
            raise ValueError(f"unknown gopher rules: {sorted(unknown)}; known: {sorted(known)}")
        rules_all = [(name, cond) for name, cond in rules_all if name in set(rules)]

    failed = F.filter(
        F.array(*[F.when(~cond, F.lit(name)) for name, cond in rules_all]),
        lambda x: x.isNotNull(),
    )
    return full.withColumn("failed_rules", failed).withColumn(
        "keep", F.size("failed_rules") == 0
    )


# C4 rule set (Raffel et al. 2020, "Exploring the Limits of Transfer
# Learning with a Unified Text-to-Text Transformer", §2.2 — public).
C4_MIN_WORDS_PER_LINE = 3
C4_MIN_SENTENCES = 5
# line-level drop phrases: the published javascript + cookie/policy
# boilerplate rules, one alternation over lower(line)
C4_LINE_DROP_RE = (
    "(javascript|terms of use|privacy policy|cookie policy"
    "|uses cookies|use of cookies|use cookies)"
)
C4_TERMINAL_PUNCT_RE = '[.!?"\']$'


def c4_clean(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = C4_MIN_WORDS_PER_LINE,
    min_sentences: int = C4_MIN_SENTENCES,
) -> DataFrame:
    """C4 line + page heuristic cleaning (Raffel et al. 2020 §2.2).

    Line rules (a line survives only if ALL hold):
    - ends in a terminal punctuation mark (``. ! ? " '`` after trim);
    - has at least ``min_words_per_line`` whitespace words;
    - does not mention javascript / cookie- / policy-boilerplate
      phrases (one alternation regex over the lowercased line).

    Page rules (evaluated after line filtering, first match wins as
    ``drop_reason``):
    - ``brace``: the page contains ``{`` (code);
    - ``lorem_ipsum``: placeholder text anywhere on the page;
    - ``too_few_sentences``: fewer than ``min_sentences`` terminal
      punctuation marks remain in the cleaned text (the sentence-count
      proxy — deterministic and engine-portable).

    Complements :func:`gopher_filters` (doc-level SHAPE gates): C4's
    rules are line-granular and REWRITE the text. Everything is in-row
    native array/regexp expressions — a pure map stage, zero shuffle,
    the same scan-attached-projection scale shape as the rest of this
    module. Returns one row per input doc: cleaned text, line/sentence
    accounting, the keep verdict, and the drop reason.
    """
    # null text folds to '' (a null page would emit size(NULL) = -1
    # accounting instead of an honest 0-line drop verdict)
    text = F.coalesce(F.col(text_col), F.lit(""))
    arr = _segments(text, r"\n")

    def _line_ok(x: Column) -> Column:
        words = F.size(F.filter(F.split(F.trim(x), r"\s+"), lambda w: w != ""))
        return (
            F.trim(x).rlike(C4_TERMINAL_PUNCT_RE)
            & (words >= min_words_per_line)
            & ~F.lower(x).rlike(C4_LINE_DROP_RE)
        )

    kept = F.filter(arr, _line_ok)
    clean = F.array_join(kept, "\n")
    n_sent = F.length(clean) - F.length(F.regexp_replace(clean, "[.!?]", ""))
    reason = (
        F.when(text.contains("{"), F.lit("brace"))
        .when(F.lower(text).contains("lorem ipsum"), F.lit("lorem_ipsum"))
        .when(n_sent < min_sentences, F.lit("too_few_sentences"))
        .otherwise(F.lit(None).cast("string"))
    )
    return df.select(
        F.col(id_col),
        clean.alias(text_col),
        F.size(arr).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        n_sent.cast("long").alias("n_sentences"),
        reason.isNull().alias("kept"),
        reason.alias("drop_reason"),
    )
