"""kNN operator unit tests on tiny inline frames (FIXTURES.md §B; mirrors
the reference's handcrafted-vector test style,
reference: src/core/index/faiss_index.rs:149-288)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_spark.operators.knn import batch_knn, knn, pairwise_similarity


@pytest.fixture()
def corpus(spark):
    # ≅ faiss_index.rs:161-165 — two identical vectors + one far vector
    return spark.createDataFrame(
        [(1, [1.0] * 8), (2, [1.0] * 8), (3, [9.0] * 8)],
        "vec_id long, embedding array<float>",
    )


def test_self_match_l2(corpus):
    # ≅ faiss_index.rs:156-190: query equals ids 1/2; distance ≈ 0
    rows = knn(corpus, [1.0] * 8, 2).collect()
    assert [r.vec_id for r in rows] == [1, 2]  # tie broken by id
    assert all(abs(r.distance) < 1e-3 for r in rows)


def test_k_larger_than_corpus(corpus):
    assert len(knn(corpus, [1.0] * 8, 10).collect()) == 3


def test_filtered_returns_only_allowed(corpus):
    # ≅ faiss_index.rs:167-183 pre-filter: min(k, matches) rows, all allowed
    rows = knn(corpus, [1.0] * 8, 2, predicate=F.col("vec_id") == 1).collect()
    assert [r.vec_id for r in rows] == [1]


def test_ip_vs_l2_order_differ(spark):
    # ≅ metric dispatch src/core/index_factory.rs:85-156: corpus where the
    # dot-product ranking differs from the L2 ranking.
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [10.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    q = [1.0, 0.0]
    assert [r.vec_id for r in knn(df, q, 2, metric="l2").collect()] == [1, 2]
    assert [r.vec_id for r in knn(df, q, 2, metric="ip").collect()] == [2, 1]


def test_cosine_ignores_magnitude(spark):
    df = spark.createDataFrame(
        [(1, [2.0, 0.0]), (2, [0.5, 0.5])],
        "vec_id long, embedding array<float>",
    )
    rows = knn(df, [1.0, 0.0], 2, metric="cosine").collect()
    assert [r.vec_id for r in rows] == [1, 2]
    assert rows[0].score == pytest.approx(1.0)


def test_k_validation(corpus):
    # ≅ k >= 1 validation, src/models/request/search.rs:6-17
    with pytest.raises(ValueError):
        knn(corpus, [1.0] * 8, 0)
    with pytest.raises(ValueError):
        batch_knn(corpus, corpus, 0)


def test_unknown_metric(corpus):
    with pytest.raises(ValueError):
        knn(corpus, [1.0] * 8, 1, metric="hamming")


def test_batch_knn(spark, corpus):
    queries = spark.createDataFrame(
        [(100, [1.0] * 8), (200, [9.0] * 8)],
        "query_id long, query_vec array<float>",
    )
    rows = batch_knn(corpus, queries, 1).collect()
    got = {r.query_id: r.vec_id for r in rows}
    assert got == {100: 1, 200: 3}
    assert all(r.rank == 1 for r in rows)


def test_pairwise_similarity(corpus):
    rows = pairwise_similarity(corpus, threshold=1e-6).collect()
    assert [(r.a_id, r.b_id) for r in rows] == [(1, 2)]


def test_dim_mismatch_rejected(corpus):
    # ≅ loose-validation divergence (FIXTURES.md B6): the reference lets a
    # 6-dim query hit a 3-dim index (search_index_handle.rs:201-215); we
    # raise a clean error instead of returning NULL distances.
    with pytest.raises(Exception, match="dimension mismatch"):
        knn(corpus, [1.0] * 6, 2).collect()
    with pytest.raises(ValueError, match="non-empty"):
        knn(corpus, [], 2)


def test_topk_plan_is_take_ordered(corpus):
    # single-query top-k must plan as TakeOrderedAndProject (partial per-
    # partition top-k, no global sort) — the 100 TB-scan-safety property.
    plan = knn(corpus, [1.0] * 8, 2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_pairwise_blocked_matches_expression_path(spark):
    from vector_db_spark.operators.knn import (
        pairwise_similarity,
        pairwise_similarity_blocked,
    )
    from vector_db_spark.sources.fixtures import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    expr = {
        (r.a_id, r.b_id): r.score
        for r in pairwise_similarity(emb, metric="cosine", threshold=0.4).collect()
    }
    for n_blocks in (1, 5, 16):
        blocked = {
            (r.a_id, r.b_id): r.score
            for r in pairwise_similarity_blocked(
                emb, metric="cosine", threshold=0.4, n_blocks=n_blocks
            ).collect()
        }
        assert set(blocked) == set(expr), f"pair set differs at B={n_blocks}"
        for pair, s in blocked.items():
            assert abs(s - expr[pair]) < 1e-9


def test_pairwise_blocked_l2_metric(spark):
    from vector_db_spark.operators.knn import (
        pairwise_similarity,
        pairwise_similarity_blocked,
    )
    from vector_db_spark.sources.fixtures import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    expr = {
        (r.a_id, r.b_id)
        for r in pairwise_similarity(emb, metric="l2", threshold=1.0).collect()
    }
    blocked = {
        (r.a_id, r.b_id)
        for r in pairwise_similarity_blocked(
            emb, metric="l2", threshold=1.0, n_blocks=8
        ).collect()
    }
    assert blocked == expr


def test_quantizer_round_trip_error_bounded(spark):
    import numpy as np

    from vector_db_spark.operators.quantize import ScalarQuantizer
    from vector_db_spark.sources.fixtures import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    sq = ScalarQuantizer.fit(emb)
    rows = (
        sq.quantize(emb)
        .select("embedding", sq.decode(F.col("codes")).alias("recon"))
        .limit(50)
        .collect()
    )
    for r in rows:
        x = np.asarray(r.embedding, dtype=np.float64)
        xr = np.asarray(r.recon, dtype=np.float64)
        span = np.asarray(sq.span)
        # affine int8 code: error <= half a quantization step per dim
        assert (np.abs(x - xr) <= span / 255.0 / 2 + 1e-12).all()


def test_quantized_knn_recall(spark):
    from vector_db_spark.operators.knn import knn
    from vector_db_spark.operators.quantize import ScalarQuantizer
    from vector_db_spark.sources.fixtures import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    sq = ScalarQuantizer.fit(emb)
    codes = sq.quantize(emb).select("vec_id", "codes").cache()
    recalls = []
    for vid in (0, 7, 21):
        qv = [float(x) for x in emb.filter(F.col("vec_id") == vid).head().embedding]
        exact = {r.vec_id for r in knn(emb, qv, 10).collect()}
        quant = {r.vec_id for r in sq.knn_quantized(codes, qv, 10).collect()}
        recalls.append(len(exact & quant) / 10)
    assert sum(recalls) / len(recalls) >= 0.9
    codes.unpersist()


def test_quantizer_validation():
    from vector_db_spark.operators.quantize import ScalarQuantizer

    with pytest.raises(ValueError, match="mismatch"):
        ScalarQuantizer([0.0], [1.0, 2.0])


def test_hybrid_search_properties(spark):
    from vector_db_spark.operators.hybrid import hybrid_search
    from vector_db_spark.operators.knn import knn
    from vector_db_spark.sources.fixtures import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    corpus = docs.join(emb, "doc_id").cache()
    qv = [float(x) for x in emb.filter(F.col("doc_id") == 0).head().embedding]

    rows = hybrid_search(corpus, "spark query vector", qv, 10).collect()
    assert len(rows) == 10
    # fused scores are sorted desc with id tiebreak
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    # a pure-vector heavy hitter must surface: top-1 cosine is in the fused set
    top_vec = knn(corpus, qv, 1, metric="cosine", id_col="doc_id").head().doc_id
    fetched = {
        r.id for r in hybrid_search(corpus, "spark query vector", qv, 50).collect()
    }
    assert top_vec in fetched
    corpus.unpersist()


def test_hybrid_search_validation(spark):
    from vector_db_spark.operators.hybrid import hybrid_search
    from vector_db_spark.sources.fixtures import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    with pytest.raises(ValueError, match="k must"):
        hybrid_search(docs, "x", [0.0], 0)
    with pytest.raises(ValueError, match="fetch"):
        hybrid_search(docs, "x", [0.0], 10, fetch=5)
    with pytest.raises(ValueError, match="token"):
        hybrid_search(docs, "   ", [0.0], 1)


def test_hybrid_search_bm25_kernel(spark):
    from vector_db_spark.operators.hybrid import hybrid_search
    from vector_db_spark.sources.fixtures import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    corpus = docs.join(emb, "doc_id")
    qv = [0.1] * 64
    rows = hybrid_search(corpus, "spark query", qv, 10, keyword="bm25").collect()
    assert len(rows) == 10
    with pytest.raises(ValueError, match="keyword"):
        hybrid_search(corpus, "spark", qv, 5, keyword="tfidf")


def test_knn_page_cursor_spans_tied_distances(spark):
    from vector_db_spark.operators.knn import knn, knn_page

    # five IDENTICAL vectors (all distance 0) + two distinct: the page
    # boundary falls inside the tie group, so the cursor must resume by id
    rows = [(i, [1.0, 0.0]) for i in range(1, 6)]
    rows += [(10, [2.0, 0.0]), (11, [3.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [1.0, 0.0]
    page1 = knn(df, q, 3).collect()
    assert [r.vec_id for r in page1] == [1, 2, 3]
    cur = (page1[-1].distance, page1[-1].vec_id)
    page2 = knn_page(df, q, 3, after=cur).collect()
    assert [r.vec_id for r in page2] == [4, 5, 10]
    page3 = knn_page(df, q, 3, after=(page2[-1].distance, page2[-1].vec_id)).collect()
    assert [r.vec_id for r in page3] == [11]
    # pages tile the full ranking exactly
    assert [r.vec_id for r in page1 + page2 + page3] == [
        r.vec_id for r in knn(df, q, 7).collect()
    ]


def test_column_stats_counts_nulls_and_ndv(spark):
    from vector_db_spark.operators.vector_stats import column_stats

    df = spark.createDataFrame(
        [(1.0, None), (2.0, 5.0), (2.0, 5.0), (None, 7.0)],
        "a double, b double",
    )
    got = {r.column: r for r in column_stats(df, ["a", "b"]).collect()}
    assert got["a"].n_rows == 4 and got["a"].n_nulls == 1
    assert got["a"].n_distinct == 2 and got["a"].min_val == 1.0 and got["a"].max_val == 2.0
    assert got["b"].n_nulls == 1 and got["b"].n_distinct == 2


def test_unrolled_fold_bitwise_parity(spark):
    """r15 optimization guard: the fixed-dim unrolled scoring chains must
    be BIT-EQUAL to the interpreted aggregate(zip_with) folds — the
    oracle-gated queries' hashes ride on it. Random float32 vectors
    (the fixture layout), a zero vector (cosine NULL guard), and
    negative components all compare with == on the raw doubles."""
    import random

    from vector_db_spark.functions.vector import (
        cosine_sim,
        cosine_sim_unrolled,
        dot,
        dot_unrolled,
        l2_sq,
        l2_sq_unrolled,
    )

    rng = random.Random(7)
    dim = 64
    rows = [
        (i, [rng.uniform(-2, 2) for _ in range(dim)]) for i in range(200)
    ]
    rows.append((998, [0.0] * dim))  # zero norm -> cosine NULL both paths
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [rng.uniform(-2, 2) for _ in range(dim)]
    ql = F.array(*[F.lit(float(x)) for x in q])
    a = F.col("embedding")
    got = df.select(
        l2_sq(a, ql).alias("l2_f"),
        l2_sq_unrolled(a, q, dim).alias("l2_u"),
        dot(a, ql).alias("ip_f"),
        dot_unrolled(a, q, dim).alias("ip_u"),
        cosine_sim(a, ql).alias("cos_f"),
        cosine_sim_unrolled(a, q, dim).alias("cos_u"),
        # column-vs-column form (the batch path): self-similarity
        l2_sq(a, a).alias("self_f"),
        l2_sq_unrolled(a, a, dim).alias("self_u"),
    ).collect()
    for r in got:
        assert r.l2_f == r.l2_u, (r.l2_f, r.l2_u)
        assert r.ip_f == r.ip_u
        assert r.cos_f == r.cos_u  # None == None for the zero vector
        assert r.self_f == r.self_u


def test_unrolled_knn_results_match_fold(spark):
    """knn/batch_knn/range_search outputs with the unrolled dispatch are
    row-identical (values AND order) to the pre-dispatch fold plans."""
    import random

    from vector_db_spark.functions import vector as V
    from vector_db_spark.operators.knn import (
        batch_knn,
        batch_range_search,
        knn,
        range_search,
    )

    rng = random.Random(11)
    dim = 16
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = rows[3][1]
    queries = df.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    def run_all(unroll: bool):
        out = []
        for metric in ("l2", "ip", "cosine"):
            out.append(knn(df, q, 7, metric=metric, unroll=unroll).collect())
            out.append(
                batch_knn(
                    df, queries, 5, metric=metric, dim=dim, unroll=unroll
                ).collect()
            )
        out.append(
            batch_range_search(
                df, queries, 2.0, metric="l2", dim=dim, unroll=unroll
            ).collect()
        )
        return out

    assert run_all(unroll=True) == run_all(unroll=False)
