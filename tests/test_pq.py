"""IVF-PQ ANN (operators/pq.py): lossless-regime exact equivalence to
brute-force inner product, recall in the lossy regime, compression
shape, and encode determinism."""

import numpy as np
import pytest
from pytest import approx
from pyspark.sql import functions as F

from pixie_spark.operators.pq import ivfpq_encode, ivfpq_topk, pq_train

DIM = 64
N = 200


@pytest.fixture(scope="module")
def vectors(spark):
    """Clustered unit-norm vectors (the embeddings-fixture shape): 8
    gaussian blobs so IVF probing has structure to exploit."""
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(8, DIM))
    rows = []
    for i in range(N):
        v = centers[i % 8] + 0.15 * rng.normal(size=DIM)
        v = v / np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def brute_ip_topk(df, k):
    """Independent comparator: exact inner-product top-k in numpy."""
    rows = {r["vec_id"]: np.array(r["embedding"]) for r in df.collect()}
    out = {}
    for qid, qv in rows.items():
        scored = sorted(
            ((float(qv @ cv), vid) for vid, cv in rows.items() if vid != qid),
            key=lambda t: (-t[0], t[1]),
        )
        out[qid] = [vid for _, vid in scored[:k]]
    return out


def test_lossless_regime_equals_brute_force(spark, vectors):
    """ksub ≥ sample size + nprobe = n_lists → encoding is lossless and
    the ADC ranking must equal exact inner-product top-k EXACTLY (same
    anchor pattern as ivf_topk's nprobe=n_lists gate config)."""
    got = ivfpq_topk(vectors, vectors, k=5, n_lists=4, nprobe=4, m=8, ksub=N,
                     dim=DIM, refine_factor=0)
    mine = {}
    for r in got.orderBy("query_id", "rank").collect():
        mine.setdefault(r["query_id"], []).append(r["vec_id"])
    ref = brute_ip_topk(vectors, k=5)
    assert mine == ref


def test_adc_scores_exact_in_lossless_regime(spark, vectors):
    """Beyond ranking: the ADC score itself equals q·x to float precision
    when every residual subvector has its own codeword."""
    got = ivfpq_topk(vectors, vectors, k=3, n_lists=4, nprobe=4, m=8, ksub=N,
                     dim=DIM, refine_factor=0)
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in vectors.collect()}
    for r in got.collect():
        exact = float(vecs[r["query_id"]] @ vecs[r["vec_id"]])
        assert r["score"] == approx(exact, abs=1e-9)


def _recall10(got, ref):
    mine = {}
    for r in got.collect():
        mine.setdefault(r["query_id"], set()).add(r["vec_id"])
    return float(np.mean([len(mine.get(q, set()) & set(ref[q])) / 10 for q in ref]))


def test_lossy_recall(spark, vectors):
    """Production shape (m=8, ksub=16, nprobe=4): pure ADC is distorted
    among near-tie blob-mates (that is what 8-byte codes cost), and the
    refine stage — exact re-rank of the 4k ADC shortlist, the faiss
    IndexRefineFlat pattern — recovers essentially full recall."""
    ref = brute_ip_topk(vectors, k=10)
    adc_only = ivfpq_topk(vectors, vectors, k=10, n_lists=8, nprobe=4, m=8,
                          ksub=16, dim=DIM, refine_factor=0)
    refined = ivfpq_topk(vectors, vectors, k=10, n_lists=8, nprobe=4, m=8,
                         ksub=16, dim=DIM, refine_factor=4)
    r_adc, r_ref = _recall10(adc_only, ref), _recall10(refined, ref)
    assert r_adc > 0.3          # shortlist quality floor
    assert r_ref > 0.95         # refinement recovers the exact ranking
    assert r_ref > r_adc


def test_codes_shape_and_compression(spark, vectors):
    """The index row is m smallint codes — the 32× compression claim:
    list_id within range, codes within [0, ksub)."""
    cents, cbs = pq_train(vectors, m=8, ksub=16, dim=DIM, n_lists=4)
    assert len(cbs) == 8 and all(len(cb) <= 16 for cb in cbs)
    idx = ivfpq_encode(vectors, cents, cbs, dim=DIM)
    rows = idx.collect()
    assert len(rows) == N
    assert all(0 <= r["list_id"] < 4 for r in rows)
    assert all(len(r["codes"]) == 8 for r in rows)
    assert all(0 <= c < 16 for r in rows for c in r["codes"])


def test_encode_deterministic(spark, vectors):
    cents, cbs = pq_train(vectors, m=8, ksub=16, dim=DIM, n_lists=4)
    a = sorted(map(tuple, ((r["vec_id"], r["list_id"], tuple(r["codes"]))
                           for r in ivfpq_encode(vectors, cents, cbs, dim=DIM).collect())))
    b = sorted(map(tuple, ((r["vec_id"], r["list_id"], tuple(r["codes"]))
                           for r in ivfpq_encode(vectors, cents, cbs, dim=DIM).collect())))
    assert a == b


def test_empty_corpus(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = ivfpq_topk(empty, empty, k=5, dim=DIM)
    assert out.count() == 0
