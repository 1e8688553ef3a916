"""Capstone integration: the COMPLETE training-data pipeline as one
chain — WARC ingest → URL front end → quality/dedup cleaning →
benchmark decontamination → temperature mixing → epoch expansion →
deterministic training shards — with a planted offender for every stage
proving each removal happens exactly where it should, and a bit-for-bit
replay of the whole chain."""

import random

import pyspark.sql.functions as F
import pytest

from pixie_spark.operators.dedup import decontaminate_spans
from pixie_spark.operators.pipeline import clean_corpus
from pixie_spark.operators.sampling import epoch_expand
from pixie_spark.operators.web import blocklist_filter
from pixie_spark.sources.shards import read_training_shards, write_training_shards
from pixie_spark.sources.warc import build_warc_bytes, read_warc, warc_documents

BENCH_SENTENCE = "zeus apollo hermes athena artemis poseidon hades demeter hestia ares"


def _prose(rng, n_words):
    vocab = [f"word{i}" for i in range(120)]
    return " ".join(rng.choice(vocab) for _ in range(n_words))


@pytest.fixture(scope="module")
def crawl(spark, tmp_path_factory):
    """A synthetic crawl with one planted offender per pipeline stage."""
    rng = random.Random(5)
    base = {f"good{i}": _prose(rng, 40) for i in range(8)}
    near_src = base["good0"]
    docs = {
        # survives everything
        **{f"https://site{i}.example.com/page?id=1&utm_source=x": t for i, t in enumerate(base.values())},
        # exact duplicate of good0 under another URL → exact dedup drops
        "https://mirror.example.net/copy": base["good0"],
        # near duplicate of good0 (2 words changed) → near-dup stage drops
        "https://near.example.net/var": near_src.rsplit(" ", 2)[0] + " changed tokens",
        # repetition junk → quality stage drops
        "https://spam.example.net/junk": "spam ham " * 40,
        # too short → quality stage drops
        "https://short.example.net/stub": "tiny doc here",
        # blocklisted domain → URL stage drops
        "https://blocked.badsite.com/x": _prose(rng, 40),
        # contains the benchmark sentence → decontamination strips the span
        "https://leaky.example.org/bench": _prose(rng, 15)
        + " "
        + BENCH_SENTENCE
        + " "
        + _prose(rng, 15),
    }
    records = [{"warc_type": "warcinfo", "payload": b"software: test\r\n"}] + [
        {
            "warc_type": "response",
            "target_uri": url,
            "payload": b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
            + text.encode(),
        }
        for url, text in docs.items()
    ]
    d = tmp_path_factory.mktemp("crawl")
    (d / "crawl-00000.warc").write_bytes(build_warc_bytes(records))
    return str(d), docs


def _run_pipeline(spark, crawl_dir, shard_dir):
    docs = warc_documents(read_warc(spark, crawl_dir)).select("doc_id", "url", "text")

    # stage 1: URL front end — normalize, domain features, blocklist
    block = docs.sparkSession.createDataFrame([("badsite.com",)], "domain string")
    kept_urls = blocklist_filter(docs, block, "url")

    # stage 2: quality + exact + near-dup + span cleaning
    stages = clean_corpus(
        kept_urls.select("doc_id", "text"),
        min_words=20,
        quality_rules=["word_count", "dup_5gram"],
        shingle_n=5,
        near_dup_threshold=0.5,
        checkpoint=True,
    )
    survivors = kept_urls.join(
        stages["after_near"].select("doc_id"), "doc_id", "left_semi"
    )

    # stage 3: benchmark decontamination (span-level, keeps the doc)
    probes = spark.createDataFrame([(1, BENCH_SENTENCE)], "doc_id long, text string")
    decon = decontaminate_spans(survivors, probes, k=10).withColumnRenamed("doc", "doc_id")
    final = survivors.select("doc_id", "domain").join(
        decon.select("doc_id", "text", "n_removed"), "doc_id"
    )

    # stage 4: epoch expansion (upweight the example.org tail domain)
    expanded = epoch_expand(final, "domain", {"example.org": 2.0}, id_col="doc_id")
    keyed = expanded.withColumn("row_id", F.xxhash64("doc_id", "epoch"))

    # stage 5: deterministic shards
    n = write_training_shards(keyed, shard_dir, shard_rows=4, id_col="row_id")
    return stages, final, read_training_shards(spark.sparkSession if hasattr(spark, "sparkSession") else spark, shard_dir), n


def test_every_stage_removes_exactly_its_offender(spark, crawl, tmp_path):
    crawl_dir, _ = crawl
    stages, final, shards, n_shards = _run_pipeline(spark, crawl_dir, str(tmp_path / "s"))

    by_url = lambda df: {r["url"] for r in df.collect()}

    # quality dropped the junk and the stub, nothing else
    q = stages["quality"].collect()
    failed = {r["doc"]: list(r["failed_rules"]) for r in q if not r["keep"]}
    assert len(failed) == 2
    assert sorted(r for rules in failed.values() for r in rules) == sorted(
        ["dup_5gram", "word_count"]
    )

    # exact dedup removed exactly one (the mirror copy)
    assert stages["after_quality"].count() - stages["after_exact"].count() == 1
    # near-dup removed exactly one (the 2-words-changed variant)
    assert stages["after_exact"].count() - stages["after_near"].count() == 1

    rows = final.collect()
    # 8 good docs + the decontaminated leaky doc survive
    assert len(rows) == 9
    touched = {r["doc_id"]: r["n_removed"] for r in rows if r["n_removed"] > 0}
    assert len(touched) == 1 and list(touched.values())[0] == 10

    # the benchmark n-grams are GONE from the final corpus
    corpus_words = set()
    for r in shards.collect():
        corpus_words.update(r["text"].split())
    assert not corpus_words & set(BENCH_SENTENCE.split())

    # epoch expansion doubled the example.org doc
    org_rows = [r for r in shards.collect() if r["domain"] == "example.org"]
    assert len(org_rows) == 2
    assert {r["epoch"] for r in org_rows} == {0, 1}

    # shard layout: 10 rows at 4/shard → 3 shards, sizes 4/4/2
    assert n_shards == 3
    sizes = sorted(
        r["n"] for r in shards.groupBy("shard").agg(F.count("*").alias("n")).collect()
    )
    assert sizes == [2, 4, 4]


def test_whole_chain_replays_bit_for_bit(spark, crawl, tmp_path):
    crawl_dir, _ = crawl
    _, _, shards_a, _ = _run_pipeline(spark, crawl_dir, str(tmp_path / "a"))
    _, _, shards_b, _ = _run_pipeline(spark, crawl_dir, str(tmp_path / "b"))
    key = lambda df: {(r["row_id"], r["shard"], r["text"]) for r in df.collect()}
    assert key(shards_a) == key(shards_b)


def test_release_pipeline_end_to_end(spark, tmp_path):
    """Capstone 2 — the round-5 web-text RELEASE chain as one flow:
    JSONL ingest → unicode normalization → C4 line/page rules →
    corpus-wide line dedup → near-dup clusters → leakage-safe split →
    JSONL export, with a planted offender per stage."""
    import gzip
    import json

    from pixie_spark.operators.dedup import line_level_dedup, minhash_lsh_verified_pairs
    from pixie_spark.operators.quality import c4_clean
    from pixie_spark.operators.sampling import leakage_safe_split
    from pixie_spark.operators.text import normalize_text
    from pixie_spark.sources.jsonl import jsonl_documents, write_jsonl

    rng = random.Random(11)
    prose = lambda n: " ".join(  # noqa: E731
        rng.choice([f"tok{i}" for i in range(80)]) for _ in range(n)
    )
    sent = lambda: prose(8) + " ends here."  # noqa: E731
    page = lambda: "\n".join(sent() for _ in range(6))  # noqa: E731
    BOILER = "Shared boilerplate navigation bar item list."
    good = {f"https://ok{i}.example.com/p": page() for i in range(6)}
    near_src = good["https://ok0.example.com/p"]
    docs = {
        **good,
        # normalization offender: CRLF + zero-width, otherwise fine
        "https://crlf.example.com/p": page().replace("\n", "\r\n") + "​",
        # C4 page offender: brace
        "https://code.example.com/p": "function() { return 1; }\n" + page(),
        # boilerplate line in two docs — line dedup keeps the first only
        "https://bp1.example.com/p": BOILER + "\n" + page(),
        "https://bp2.example.com/p": BOILER + "\n" + page(),
        # near-duplicate pair — must land in the SAME split
        "https://near.example.com/p": near_src.rsplit(" ", 2)[0] + " changed token.",
    }
    src = tmp_path / "dump.jsonl.gz"
    with gzip.open(src, "wt") as f:
        for url, text in docs.items():
            f.write(json.dumps({"url": url, "text": text}) + "\n")

    corpus = jsonl_documents(spark, str(src)).localCheckpoint()
    assert corpus.count() == len(docs)

    # stage 1+2: normalize, then C4 line/page rules
    cleaned = c4_clean(
        corpus.withColumn("text", normalize_text(F.col("text")))
    ).localCheckpoint()
    verdict = {r["doc_id"]: r for r in cleaned.collect()}
    # map urls to ids via the corpus frame
    url_by_id = {r["doc_id"]: r["url"] for r in corpus.select("doc_id", "url").collect()}
    dropped = {url_by_id[d] for d, r in verdict.items() if not r["kept"]}
    assert dropped == {"https://code.example.com/p"}  # only the brace page dies
    crlf_id = next(d for d, u in url_by_id.items() if u == "https://crlf.example.com/p")
    assert "\r" not in verdict[crlf_id]["text"] and "​" not in verdict[crlf_id]["text"]

    survivors = cleaned.where(F.col("kept")).select("doc_id", "text")

    # stage 3: corpus-wide line dedup kills the second boilerplate line
    deduped = line_level_dedup(survivors).localCheckpoint()
    bp = {
        url_by_id[r["doc_id"]]: r["n_lines_dropped"]
        for r in deduped.collect()
        if url_by_id[r["doc_id"]].startswith("https://bp")
    }
    assert sorted(bp.values()) == [0, 1]  # exactly one copy of BOILER died

    # stage 4+5: near-dup clusters drive the leakage-safe split
    pairs = minhash_lsh_verified_pairs(
        deduped, "doc_id", "text", n=5, num_hashes=64, bands=64, threshold=0.5
    )
    split = leakage_safe_split(deduped, pairs, seed=1)
    split_of = {url_by_id[r["doc_id"]]: r["split"] for r in split.collect()}
    assert (
        split_of["https://ok0.example.com/p"] == split_of["https://near.example.com/p"]
    )  # the near-dup pair cannot straddle splits

    # stage 6: export the train split back to the interchange format
    train = deduped.join(
        split.where(F.col("split") == "train").select("doc_id"), "doc_id", "left_semi"
    )
    out = str(tmp_path / "release")
    write_jsonl(train, out, docs_per_file=8)
    from pixie_spark.sources.jsonl import read_jsonl

    back = read_jsonl(spark, out, {"doc_id": "long", "text": "string"})
    assert back.count() == train.count() > 0
