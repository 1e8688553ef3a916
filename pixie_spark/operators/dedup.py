"""Deduplication operators for training-data pipelines, designed for
100 TB document corpora.

- exact_dedup:       hash-groupBy on content — one shuffle on a 64-bit
                     content hash, never on the raw text.
- shingles:          word n-gram sets (the input to Jaccard/MinHash).
- jaccard_pairs:     exact n-gram Jaccard over a shingle-inverted-index
                     self-join (prunable; quadratic only within a posting
                     list, not the corpus).
- minhash_lsh_pairs: MinHash signatures + banded LSH — the scale path:
                     candidate pairs only ever meet inside an LSH bucket,
                     so the shuffle is on (band, bucket-hash) keys.
- simhash:           64-bit SimHash signature per doc (hamming-near dup).

All stages are native Spark column expressions (xxhash64, explode,
groupBy) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, id_col: str, content_cols: list[str]) -> DataFrame:
    """Group identical content; keep the minimum id as the canonical doc.

    Returns (keep_id, dup_count, *content_cols-hash). At scale: shuffle on
    xxhash64(content) — 8 bytes/row — not the document text itself.
    """
    h = F.xxhash64(*content_cols).alias("content_hash")
    return (
        df.select(F.col(id_col), h)
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string>."""
    ws = F.filter(F.split(text, r"\s+"), lambda w: w != "")
    k = F.size(ws) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(0))),
        lambda i: F.concat_ws(" ", *[F.element_at(ws, i + j) for j in range(n)]),
    )
    return F.array_distinct(grams)


def _shingle_index(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, shingle) inverted index, one row per distinct shingle per doc."""
    return df.select(
        F.col(id_col).alias("doc"), F.explode(shingles(F.col(text_col), n)).alias("shingle")
    )


def jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs sharing ≥1 shingle.

    Plan shape: explode → self-equijoin on shingle (shuffle on shingle
    hash) → groupBy pair → |∩| ; |A|,|B| via broadcast-joined per-doc
    sizes. Output: (doc_a, doc_b, jaccard) with doc_a < doc_b.

    At 100 TB this is only viable after stopword-shingle pruning or LSH
    prefiltering (see minhash_lsh_pairs); it is the exact oracle-checkable
    core, and the posting-list join is skew-salted by Spark AQE.
    """
    idx = _shingle_index(df, id_col, text_col, n)
    sizes = idx.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))

    a = idx.alias("a")
    b = idx.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = 64
) -> DataFrame:
    """MinHash signature per doc: sig[i] = min over shingles of
    xxhash64(i, shingle). One explode + one groupBy; signature is
    num_hashes longs (num_hashes*8 bytes/doc)."""
    idx = _shingle_index(df, id_col, text_col, n)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}") for i in range(num_hashes)
    ]
    sig = idx.groupBy("doc").agg(*aggs)
    return sig.select("doc", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("signature"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash-LSH, verified by
    estimated Jaccard (fraction of agreeing minhashes).

    Scale path: docs only meet if a band hash collides → the self-join is
    per (band, bucket) and the full cross-product never materializes.
    Output: (doc_a, doc_b, est_jaccard).
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes)

    band_entries = sig.select(
        "doc",
        "signature",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("signature", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "signature", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a = band_entries.alias("a")
    b = band_entries.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.signature").alias("sig_a"),
            F.col("b.signature").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda m: m,
        )
    ) / F.lit(float(num_hashes))
    return cands.withColumn("est_jaccard", est).where(
        F.col("est_jaccard") >= threshold
    ).select("doc_a", "doc_b", "est_jaccard")


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """64-bit SimHash per doc: sign-sum of word-hash bits.

    Implemented as explode(words) → per-(doc,bit) sign sums via 64 integer
    aggregates → bit reassembly. Pure JVM expressions; one shuffle on doc.
    """
    ws = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    exploded = df.select(F.col(id_col).alias("doc"), F.explode(ws).alias("word"))
    h = F.xxhash64("word")
    aggs = [
        F.sum(
            F.when(F.shiftrightunsigned(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    sums = exploded.groupBy("doc").agg(*aggs)
    sig = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return sums.select("doc", sig.alias("simhash"))
