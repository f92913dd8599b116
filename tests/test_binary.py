"""Binary (sign) quantization + Hamming search (operators/binary.py).

Codec identity is checked against a NumPy popcount reference, the search
against brute-force sign-mismatch counting; the plan pin asserts the
Hamming top-k keeps the exact-kNN shape (TakeOrderedAndProject, no
exchange)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_db_spark.operators.binary import (
    BITS_PER_WORD,
    _sign_bits,
    binary_quantize,
    binarize,
    hamming,
    hamming_shortlist_rerank,
    knn_hamming,
)


def _np_hamming(a: np.ndarray, b: np.ndarray) -> int:
    return int(np.sum((a > 0) != (b > 0)))


@pytest.fixture()
def vecs():
    rng = np.random.default_rng(7)
    return rng.standard_normal((40, 64)).astype(np.float32)


@pytest.fixture()
def corpus(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pack_matches_driver_side(spark, vecs):
    # JVM binarize() and driver-side _sign_bits() must agree word-for-word
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs[:10])],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.vec_id: list(r.codes)
        for r in df.select("vec_id", binarize(F.col("embedding"), 64).alias("codes")).collect()
    }
    for i in range(10):
        assert got[i] == _sign_bits([float(x) for x in vecs[i]])


def test_words_fit_signed_int(vecs):
    # all-positive vector saturates every bit of every word: must stay <= INT_MAX
    full = _sign_bits([1.0] * 64)
    assert all(0 <= w <= 2**31 - 1 for w in full)
    assert len(full) == -(-64 // BITS_PER_WORD)


def test_hamming_distance_matches_numpy(spark, corpus, vecs):
    q = [float(x) for x in vecs[0]]
    coded = binary_quantize(corpus, dim=64)
    qcol = F.array(*[F.lit(w) for w in _sign_bits(q)])
    got = {
        r.vec_id: r.h
        for r in coded.select("vec_id", hamming(F.col("codes"), qcol).alias("h")).collect()
    }
    for i, v in enumerate(vecs):
        assert got[i] == _np_hamming(v, np.asarray(q)), f"row {i}"


def test_knn_hamming_order_and_self_match(spark, corpus, vecs):
    q = [float(x) for x in vecs[3]]
    rows = knn_hamming(binary_quantize(corpus, dim=64), q, 5).collect()
    assert rows[0].vec_id == 3 and rows[0].hamming == 0
    ref = sorted(
        (( _np_hamming(v, np.asarray(q)), i) for i, v in enumerate(vecs)),
    )[:5]
    assert [(r.hamming, r.vec_id) for r in rows] == ref


def test_rerank_exhaustive_equals_exact(spark, corpus, vecs):
    # shortlist >= corpus size degenerates to exact kNN
    from vector_db_spark.operators.knn import knn

    q = [float(x) for x in vecs[5]]
    got = hamming_shortlist_rerank(corpus, q, 5, shortlist=40).collect()
    exact = knn(corpus, q, 5).collect()
    assert [(r.vec_id, round(r.distance, 6)) for r in got] == [
        (r.vec_id, round(r.distance, 6)) for r in exact
    ]


def test_rerank_validates_shortlist(corpus, vecs):
    with pytest.raises(ValueError, match="shortlist"):
        hamming_shortlist_rerank(corpus, [0.0] * 64, 10, shortlist=5)


def test_knn_hamming_plan_is_takeordered_no_exchange(spark, corpus):
    plan = knn_hamming(
        binary_quantize(corpus, dim=64), [0.5] * 64, 3
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_batch_hamming_matches_per_query(spark, corpus, vecs):
    from vector_db_spark.operators.binary import (
        batch_knn_hamming,
        binary_quantize,
        knn_hamming,
    )

    codes = binary_quantize(corpus, dim=64).select("vec_id", "codes")
    qids = [0, 5, 11]
    queries = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in qids],
        "query_id long, query_vec array<float>",
    )
    batch = batch_knn_hamming(codes, queries, 4).collect()
    for qid in qids:
        got = sorted(
            [(r.rank, r.vec_id, r.hamming) for r in batch if r.query_id == qid]
        )
        single = knn_hamming(codes, [float(x) for x in vecs[qid]], 4).collect()
        want = [(i + 1, r.vec_id, r.hamming) for i, r in enumerate(single)]
        assert got == want


def test_batch_hamming_filtered_matches_per_query(spark, corpus, vecs):
    """Predicate threading through batch_knn_hamming (round-3): batch +
    predicate == per-query filtered knn_hamming; every result satisfies
    the predicate."""
    from vector_db_spark.operators.binary import batch_knn_hamming

    tagged = corpus.withColumn("parity", F.col("vec_id") % 2)
    codes = binary_quantize(tagged, dim=64).select("vec_id", "codes", "parity")
    qids = [0, 5, 11]
    queries = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in qids],
        "query_id long, query_vec array<float>",
    )
    pred = F.col("parity") == 0
    batch = batch_knn_hamming(codes, queries, 4, predicate=pred).collect()
    assert all(r.vec_id % 2 == 0 for r in batch)
    for qid in qids:
        got = sorted(
            [(r.rank, r.vec_id, r.hamming) for r in batch if r.query_id == qid]
        )
        single = knn_hamming(
            codes.filter(pred), [float(x) for x in vecs[qid]], 4
        ).collect()
        want = [(i + 1, r.vec_id, r.hamming) for i, r in enumerate(single)]
        assert got == want


def test_knn_hamming_dim_mismatch_raises(spark):
    from vector_db_spark.operators.binary import binary_quantize, knn_hamming

    df = spark.createDataFrame(
        [(1, [1.0] * 64), (2, [-1.0] * 64)], "vec_id long, embedding array<float>"
    )
    codes = binary_quantize(df, dim=64)
    with pytest.raises(Exception, match="dimension mismatch"):
        knn_hamming(codes, [1.0] * 31, 1).collect()  # 1 word vs 3


def test_binarize_matches_sign_bits_on_subnormal_and_nan(spark):
    """The JVM packer and the driver-side query packer must agree bit for
    bit: doubles quantize through float32 (a 2.2e-311 subnormal packs 0)
    and NaN packs 0 on both sides (Spark orders NaN > 0.0 as true; numpy
    says false — the explicit isnan guard aligns them)."""
    from vector_db_spark.operators.binary import _sign_bits, binarize

    vec = [2.2e-311, float("nan"), 1.0, -1.0, 0.0, 5e-40]
    df = spark.createDataFrame([(vec,)], "v array<double>")
    got = df.select(binarize(F.col("v"), len(vec)).alias("c")).head()[0]
    assert list(got) == _sign_bits(vec)
