"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are native Spark SQL functions (JVM-side,
whole-stage-codegen'd) — no Python UDFs — so they scale linearly over a
100 TB documents table with zero shuffle (pure map stage).

Operators: token counting, word/char stats, punctuation & stopword
ratios, quality scoring, n-gram language ID, rolling-hash fingerprints.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A small multilingual stopword inventory for the language-ID heuristic.
# (Heuristic n-gram/stopword language ID — the standard fasttext-style
# fallback when no model is available.)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "des", "est"],
}

EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

# BPE-ish tokenizer regex: word pieces, numbers, punctuation runs.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

FINGERPRINT_MOD = 1_000_000_007


def words(text: Column) -> Column:
    """Whitespace tokenization; empty string → empty array."""
    return F.filter(F.split(text, r"\s+"), lambda w: w != "")


def token_count(text: Column) -> Column:
    """Count of BPE-ish regex tokens (word pieces / numbers / punct)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), F.lit(0)))


def word_count(text: Column) -> Column:
    return F.size(words(text))


def punct_ratio(text: Column) -> Column:
    """Fraction of non-alnum, non-space characters."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    return F.when(F.length(text) > 0, F.length(stripped) / F.length(text)).otherwise(F.lit(0.0))


def stopword_count(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or EN_STOPWORDS
    pattern = r"\b(" + "|".join(sw) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pattern), F.lit(0)))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    wc = word_count(text)
    return F.when(wc > 0, stopword_count(text, stopwords) / wc).otherwise(F.lit(0.0))


def mean_word_length(text: Column) -> Column:
    wc = word_count(text)
    total = F.length(F.regexp_replace(text, r"\s+", ""))
    return F.when(wc > 0, total / wc).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence +
    sane mean word length + low punctuation noise. Mirrors the C4/Gopher
    style rule-based filters used in LLM data pipelines."""
    wc = word_count(text)
    len_ok = F.when((wc >= 10) & (wc <= 10000), 1.0).otherwise(0.0)
    sw_ok = F.when(stopword_ratio(text) > 0.01, 1.0).otherwise(0.0)
    mwl = mean_word_length(text)
    mwl_ok = F.when((mwl >= 2.0) & (mwl <= 12.0), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(text) < 0.2, 1.0).otherwise(0.0)
    return (len_ok + sw_ok + mwl_ok + punct_ok) / 4.0


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-word hit counts."""
    lowered = F.lower(text)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        pattern = r"\b(" + "|".join(markers) + r")\b"
        out[lang] = F.size(F.regexp_extract_all(lowered, F.lit(pattern), F.lit(0)))
    return out


def lang_id(text: Column) -> Column:
    """Argmax of marker hits; 'und' when nothing matches. Deterministic
    tie-break: language order en > es > de > fr (strictly-greater chain)."""
    scores = lang_scores(text)
    langs = list(scores)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in reversed(langs):
        s = scores[lang]
        best_lang = F.when(s >= best_score, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(s >= best_score, s).otherwise(best_score)
    # reversed + >= gives priority to earlier languages on ties
    return F.when(best_score > 0, best_lang).otherwise(F.lit("und"))


_FP_BLOCK = 32
# 31^k mod M for k = 0.._FP_BLOCK — literal lookup table so block powers
# stay exact integers (float pow loses precision above 2^53)
_FP_POWS = [1]
for _ in range(_FP_BLOCK):
    _FP_POWS.append((_FP_POWS[-1] * 31) % FINGERPRINT_MOD)


def fingerprint(text: Column) -> Column:
    """Deterministic polynomial rolling hash of the full string:
    fold(acc*31 + codepoint) mod 1e9+7. Pure integer arithmetic → identical
    in any engine; used for cheap exact-dup detection and sharding.

    Evaluated BLOCK-WISE: the string splits into 32-char blocks and the
    fold steps once per block — acc' = (acc * 31^len(b) + poly(b)) mod M,
    with poly(b) unrolled as 32 native char terms. Same value as the
    per-char fold (associativity of the Horner form), but the interpreted
    HOF lambda runs len/32 times instead of len times — the per-char form
    was the one interpreted-expression hot spot in the text_stats bench.
    Overflow-safe: acc < M ≈ 1e9, 31^32 mod M < M, so acc * pow < 1e18 <
    int64 max; poly(b) ≤ 32 · 255 · M ≪ int64 max.
    """
    blocks = F.regexp_extract_all(text, F.lit(f"(?s).{{1,{_FP_BLOCK}}}"), 0)
    # long literals: ascii (int32) times a ~1e9 power overflows int32
    pows = F.array(*[F.lit(p).cast("long") for p in _FP_POWS])

    def _step(acc: Column, b: Column) -> Column:
        n = F.length(b)
        # Σ ascii(b[i]) * 31^(len-1-i); chars past the block end contribute 0
        poly = F.lit(0).cast("long")
        for i in range(_FP_BLOCK):
            term = F.ascii(F.substring(b, i + 1, 1)) * F.element_at(pows, n - i)
            poly = poly + F.when(F.lit(i) < n, term).otherwise(0)
        return (acc * F.element_at(pows, n + 1) + poly) % FINGERPRINT_MOD

    return F.aggregate(blocks, F.lit(0).cast("long"), _step)


def vocab_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
    top_k: int | None = None,
) -> DataFrame:
    """Corpus vocabulary table: (term, count, doc_freq) — the input to
    tokenizer training, stop-word mining, and Zipf diagnostics.

    One explode + one groupBy on the term (map-side partial counts
    absorb Zipf head terms — 'the' costs one partial counter per task,
    not a hot-key shuffle). doc_freq via count_distinct(doc) inside the
    same aggregate. ``top_k`` returns the head via orderBy+limit
    (TakeOrderedAndProject — per-partition heaps, never a global sort).
    """
    from pixie_spark.operators.dedup import _word_rows

    # by_doc=False: downstream groups by term, not doc — a doc-keyed
    # exchange would be pure cost at scale. spread_if_narrow instead
    # unsticks the split/explode map side on few-row-group files (no-op
    # whenever the scan already feeds the cluster).
    from pixie_spark.partitioning import spread_if_narrow

    w = _word_rows(spread_if_narrow(df), id_col, text_col, by_doc=False).select(
        "doc", (F.lower("word") if lowercase else F.col("word")).alias("term")
    )
    out = w.groupBy("term").agg(
        F.count(F.lit(1)).alias("count"),
        F.countDistinct("doc").alias("doc_freq"),
    )
    if top_k is not None:
        out = out.orderBy(F.col("count").desc(), "term").limit(top_k)
    return out


def bpe_pair_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
    top_k: int | None = None,
) -> DataFrame:
    """Adjacent-character-pair frequencies over the corpus — the
    statistic the first BPE merge step maximizes (Sennrich et al.
    2016): (left, right, count) where count sums over all corpus
    occurrences of each word containing the pair.

    Computed from the DISTINCT-word vocabulary weighted by word count,
    so a word occurring a million times explodes its characters ONCE —
    corpus size only affects the (cheap) vocab aggregation, and the
    pair explosion is bounded by total vocabulary characters.
    """
    vocab = vocab_stats(df, id_col, text_col, lowercase=lowercase)
    # guard: sequence(1, 0) would COUNT DOWN ([1, 0]) for 1-char words
    grams = F.when(
        F.length("term") > 1,
        F.transform(
            F.sequence(F.lit(1), F.length("term") - 1),
            lambda i: F.struct(
                F.col("term").substr(i, F.lit(1)).alias("left"),
                F.col("term").substr(i + 1, F.lit(1)).alias("right"),
            ),
        ),
    ).otherwise(F.array())
    pairs = vocab.select("count", F.explode(grams).alias("p"))
    out = pairs.groupBy(
        F.col("p.left").alias("left"), F.col("p.right").alias("right")
    ).agg(F.sum("count").alias("count"))
    if top_k is not None:
        out = out.orderBy(F.col("count").desc(), "left", "right").limit(top_k)
    return out


def bpe_train(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_merges: int = 100,
    lowercase: bool = True,
    max_vocab_rows: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Train a BPE merge table (Sennrich et al. 2016) over the corpus.

    Split of labor at 100 TB: the CORPUS-sized work — word counting —
    is the distributed vocab_stats aggregate; the merge loop then runs
    on the collected (word, count) vocabulary, which Zipf keeps
    driver-sized (a trillion-token corpus has ~10^7 distinct words;
    ``max_vocab_rows`` truncates the tail, whose pair mass is
    negligible by construction). Each merge rescans only words that
    still contain the merged pair.

    Ties break deterministically (lexicographically smallest pair), so
    the merge table is reproducible across runs and engines. Returns
    merges in application order.
    """
    rows = vocab_stats(df, id_col, text_col, lowercase=lowercase, top_k=max_vocab_rows)
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["term"]): r["count"] for r in rows.collect()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for word, c in vocab.items():
            for a, b in zip(word, word[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        # max count; ties -> lexicographically smallest pair
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        if pair_counts[best] < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for word, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(word):
                if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply a merge table to one word: repeatedly merge the
    lowest-rank adjacent pair — the standard BPE inference loop."""
    parts = list(word)
    while len(parts) > 1:
        best_i, best_rank = -1, None
        for i, pair in enumerate(zip(parts, parts[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_i, best_rank = i, r
        if best_rank is None:
            break
        parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return parts


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    lowercase: bool = True,
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize a text column with a trained merge table, as an
    Arrow-batched pandas UDF (the merge loop is per-word imperative —
    not expressible as native columns — so it rides the sanctioned
    vectorized-Python path, cf. the IVF quantizer). The merge table is
    closure-captured: it ships once per executor, the broadcast-
    variable pattern."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(p): i for i, p in enumerate(merges)}

    # NOTE: no type annotations on `enc` — this module uses
    # `from __future__ import annotations`, which stringifies hints;
    # pyspark resolves them in module globals where `pd` isn't bound.
    @pandas_udf("array<string>")
    def enc(texts):
        out = []
        for t in texts:
            if t is None:
                out.append([])
                continue
            ws = [w for w in (t.lower() if lowercase else t).split() if w]
            toks: list[str] = []
            for w in ws:
                toks.extend(bpe_encode_word(w, ranks))
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, enc(F.col(text_col)))


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass map stage computing all text statistics."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_words": word_count(t),
            "n_tokens": token_count(t),
            "punct_ratio": punct_ratio(t),
            "stopword_ratio": stopword_ratio(t),
            "mean_word_len": mean_word_length(t),
            "quality": quality_score(t),
            "lang_pred": lang_id(t),
            "fingerprint": fingerprint(t),
        }
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split long documents into fixed-word-window chunks with overlap —
    the pre-embedding / pre-indexing step of retrieval and long-context
    pipelines (a 100-page doc becomes ~N encoder-sized pieces; overlap
    keeps boundary sentences queryable from either side).

    Chunk i covers words [i·stride, i·stride + chunk_words) with
    stride = chunk_words - overlap; the last chunk is ragged, and any
    final window fully contained in the previous one is not emitted.
    Docs with ≤ chunk_words words yield exactly one chunk. Pure in-row
    expression work (split once, sequence + transform + slice) — zero
    shuffle, one codegen'd map stage; (id, chunk_id) is unique.

    Output: (id_col, chunk_id, chunk_text, n_words).
    """
    if overlap >= chunk_words:
        raise ValueError("overlap must be smaller than chunk_words")
    stride = chunk_words - overlap
    # null text ≡ empty text (one empty chunk, n_words=0) — without the
    # coalesce a null row emits n_words=null and poisons downstream sums
    ws = F.coalesce(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != ""),
        F.array().cast("array<string>"),
    )
    # number of chunks: 1 + ceil(max(0, n - chunk) / stride)
    extra = F.greatest(F.size(ws) - chunk_words, F.lit(0))
    n_chunks = F.lit(1) + F.ceil(extra / F.lit(stride)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_id"),
            F.slice(ws, i * stride + 1, chunk_words).alias("w"),
        ),
    )
    return (
        df.select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_id").alias("chunk_id"),
            F.concat_ws(" ", F.col("c.w")).alias("chunk_text"),
            F.size(F.col("c.w")).alias("n_words"),
        )
    )


def distinct_ngram_stats(
    df: DataFrame,
    n_values: tuple[int, ...] = (1, 2, 3),
    id_col: str = "doc_id",
    text_col: str = "text",
    slice_col: str | None = None,
    exact: bool = False,
) -> DataFrame:
    """Corpus diversity report: distinct-n = |unique word n-grams| /
    |total n-grams| per n (Li et al. 2016's diversity metric, the
    corpus-level repetitiveness gauge a mixture card publishes — a
    collapsing/boilerplate-heavy slice scores low), optionally per
    ``slice_col`` (lang/domain/source).

    Scale shape: ONE window-lead pass with max(n)-1 leads computes the
    8-byte gram ids for EVERY n simultaneously (the dedup family's
    construction — no gram string materialized; a per-n pass would
    re-shuffle the words len(n_values) times — cold-harness 24 s → 14 s
    at sf0.01, warm 4.5 s; at that sf the cost is fixed stage overhead,
    the shape is what matters at 100 TB), unpivoted in-row into
    (n, sid) and aggregated once.
    Distinct counting uses the HLL sketch (~0.5% error, the same
    mergeable-partial shape as the rollup cascade) — an exact distinct
    over 100 TB of gram ids would shuffle all of them.

    Output: (slice?, n, total_ngrams, distinct_ngrams, distinct_ratio).
    """
    from pyspark.sql import Window

    slice_cols = [slice_col] if slice_col else []
    max_n = max(n_values)
    win = Window.partitionBy("doc").orderBy("pos")
    # word rows with the slice column CARRIED THROUGH the explode — a
    # post-hoc (doc, slice) join would re-shuffle every gram row.
    # NOTE (r11 optimization round, measured REJECTION; re-adjudicated
    # r12): pre-partitioning by doc before the explode (the _word_rows
    # by_key treatment) made this operator SLOWER at sf0.1 under the
    # wide-buffer rsd=0.005 sketches (r11: 29–34 s vs 3.7 s on a noisy
    # box; r12 clean-box interleave: 4.3 vs 3.0 s — 32 concurrent tasks
    # each walking a ~1.5 MB register set thrash the shared cache). At
    # the r12 rsd=0.01 buffers the layouts are within noise of each
    # other (1.33 pinned vs 1.22 AQE), so the plan keeps the
    # AQE-managed layout deliberately.
    w = (
        df.select(F.col(id_col).alias("doc"), *slice_cols, F.col(text_col).alias("text"))
        .select("doc", *slice_cols, F.posexplode(F.split("text", r"\s+")).alias("pos", "word"))
        .where(F.col("word") != "")
    )
    leads = [F.col("word").alias("w0")] + [
        F.lead("word", j).over(win).alias(f"w{j}") for j in range(1, max_n)
    ]
    led = w.select("doc", *slice_cols, *leads)
    # one struct per n whose last word exists; explode drops the rest
    grams = F.array_compact(
        F.array(
            *[
                F.when(
                    F.col(f"w{n - 1}").isNotNull(),
                    F.struct(
                        F.lit(n).alias("n"),
                        F.xxhash64(*[f"w{j}" for j in range(n)]).alias("sid"),
                    ),
                )
                for n in n_values
            ]
        )
    )
    rows = led.select("doc", *slice_cols, F.explode(grams).alias("g")).select(
        "doc", *slice_cols, F.col("g.n").alias("n"), F.col("g.sid").alias("sid")
    )
    # exact=True is the oracle-parity switch (count_distinct shuffles
    # every gram id — fine at fixture scale, the HLL sketch is the
    # production path; same convention as the quantiles gate row).
    # rsd 0.005 → 0.01 (r12, measured): at 0.005 the HLL++ buffer is
    # 2¹⁶ registers (~49 KB) per (slice, n) group and the per-gram
    # register updates walk a multi-MB working set — the sketch update
    # dominated the whole operator (interleaved A/B at sf0.1:
    # 2.99 s → 1.22 s, −59%, at 0.01's 2¹⁴ registers). 1% relative
    # error on a corpus-diversity RATIO is far inside the metric's
    # decision margin (the gauge separates slices by 10s of percent),
    # and the oracle-parity mode above is untouched.
    distinct_agg = (
        F.count_distinct("sid") if exact else F.approx_count_distinct("sid", 0.01)
    )
    out = rows.groupBy(*slice_cols, "n").agg(
        F.count(F.lit(1)).alias("total_ngrams"),
        distinct_agg.alias("distinct_ngrams"),
    )
    return out.withColumn(
        "distinct_ratio", F.col("distinct_ngrams") / F.col("total_ngrams")
    )


def bpe_fertility(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    slice_col: str | None = None,
) -> DataFrame:
    """Tokenizer fertility report: tokens-per-word per slice under a
    trained BPE merge table — the number that says how expensive each
    language/domain is to train on under this tokenizer (high fertility
    = the tokenizer fragments that slice; the standard multilingual-
    tokenizer health check).

    One Arrow-batched encode pass (bpe_encode) + native size/count
    arithmetic + one bounded aggregate. Output:
    (slice?, n_docs, total_words, total_tokens, fertility).
    """
    slice_cols = [slice_col] if slice_col else []
    enc = bpe_encode(df, merges, text_col)
    proj = enc.select(
        *slice_cols,
        word_count(F.col(text_col)).alias("__w"),
        F.size("bpe_tokens").alias("__t"),
    )
    out = proj.groupBy(*slice_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__w").alias("total_words"),
        F.sum("__t").alias("total_tokens"),
    )
    return out.withColumn(
        "fertility",
        F.when(F.col("total_words") > 0, F.col("total_tokens") / F.col("total_words")),
    )


# Unicode cleanup classes for normalize_text (all as explicit escapes so
# the same pattern strings drop into the DuckDB oracle verbatim):
# non-\n\t C0 controls + DEL + C1 controls. \x{...} hex-escape form
# throughout: the one escape syntax Java regex (Spark) and RE2 (DuckDB)
# both accept, so the strings drop into the oracle verbatim.
_CTRL_RE = "[\\x{0}-\\x{8}\\x{b}\\x{c}\\x{e}-\\x{1f}\\x{7f}-\\x{9f}]"
# zero-width space/joiners, word-joiner, BOM
_ZERO_WIDTH_RE = "[\\x{200b}-\\x{200d}\\x{2060}\\x{feff}]"
# unicode horizontal spaces -> ASCII space
_USPACE_RE = "[\\x{a0}\\x{1680}\\x{2000}-\\x{200a}\\x{202f}\\x{205f}\\x{3000}]"


def normalize_text(text: Column) -> Column:
    """Unicode/whitespace cleanup column expression — the standard
    crawl-corpus pre-processing stage (CCNet/Dolma-style cleanup before
    quality filtering and dedup):

    1. fold CRLF / lone CR to LF;
    2. drop zero-width characters (ZWSP/ZWJ/ZWNJ, word-joiner, BOM);
    3. drop control characters other than newline and tab;
    4. fold unicode horizontal spaces (NBSP, en/em/thin/ideographic
       space) and tabs to ASCII space;
    5. collapse runs of spaces to one, strip spaces around newlines;
    6. collapse 3+ consecutive newlines to a blank line (paragraph
       structure survives, vertical noise doesn't);
    7. trim leading/trailing whitespace.

    A chain of native ``regexp_replace`` — JVM-side, zero shuffle, and
    each pattern string is shared verbatim with the DuckDB oracle
    (both engines' regex dialects treat these classes identically).
    """
    t = F.regexp_replace(text, "\\r\\n?", "\n")
    t = F.regexp_replace(t, _ZERO_WIDTH_RE, "")
    t = F.regexp_replace(t, _CTRL_RE, "")
    t = F.regexp_replace(t, _USPACE_RE + "|\\t", " ")
    t = F.regexp_replace(t, " {2,}", " ")
    t = F.regexp_replace(t, " ?\\n ?", "\n")
    t = F.regexp_replace(t, "\\n{3,}", "\n\n")
    # trim spaces AND newlines (F.trim strips only spaces)
    return F.regexp_replace(t, "^[ \\n]+|[ \\n]+$", "")


def normalize_for_hash(text: Column) -> Column:
    """CCNet-style aggressive normalization for DEDUP KEYS (Wenzek et
    al. 2020 §3: lowercase, digits to zero, strip punctuation, collapse
    whitespace): two near-identical boilerplate lines that differ only
    in case, numbers, or punctuation hash to the same key. Use as the
    key transform feeding exact/line dedup — the stored text stays
    untouched; only the 8-byte hash of THIS projection shuffles."""
    t = F.lower(text)
    t = F.regexp_replace(t, "[0-9]", "0")
    t = F.regexp_replace(t, "[^a-z0\\x{c0}-\\x{24f}\\x{400}-\\x{4ff} ]", " ")
    t = F.regexp_replace(t, " {2,}", " ")
    return F.trim(t)


def normalize_report(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Apply :func:`normalize_text`, reporting per-doc before/after char
    counts and whether anything changed — the release-audit shape."""
    norm = normalize_text(F.col(text_col))
    return df.select(
        F.col(id_col),
        norm.alias(text_col),
        F.length(text_col).cast("long").alias("n_chars_before"),
        F.length(norm).cast("long").alias("n_chars_after"),
        (norm != F.col(text_col)).alias("changed"),
    )
