"""High-dim Arrow GEMM dispatch for exact kNN (VERDICT r9 #5).

The expression fold stays the oracle-parity path below ARROW_DIM_MIN;
these tests pin that the Arrow kernel returns the SAME neighbors (scores
to 1e-9) on well-separated data, raises the same dimension-mismatch
error, keeps cosine zero-norm rows out of the top-k, and that the
high-dim plan is MapInPandas feeding TakeOrderedAndProject (single) /
a window over local-top-k candidates (batch)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from vector_db_spark.operators.knn import ARROW_DIM_MIN, batch_knn, knn

DIM = 160  # past ARROW_DIM_MIN so auto dispatches to the kernel


def _corpus(spark, n=200, dim=DIM, seed=3):
    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)], i % 4)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


@pytest.mark.parametrize("metric", ["l2", "ip", "cosine"])
def test_knn_arrow_matches_expr(spark, metric):
    df = _corpus(spark)
    q = [0.1 * ((i % 7) - 3) for i in range(DIM)]
    got = knn(df, q, 10, metric=metric, impl="arrow").collect()
    want = knn(df, q, 10, metric=metric, impl="expr").collect()
    assert [r.vec_id for r in got] == [r.vec_id for r in want]
    col = got[0].__fields__[-1]
    for g, w in zip(got, want):
        assert g[col] == pytest.approx(w[col], abs=1e-9)


def test_knn_auto_dispatches_on_dim(spark):
    df = _corpus(spark)
    q = [0.0] * DIM
    assert DIM >= ARROW_DIM_MIN
    plan = knn(df, q, 5, impl="auto")._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "TakeOrderedAndProject" in plan
    low = knn(_corpus(spark, dim=8), [0.0] * 8, 5, impl="auto")
    assert "MapInPandas" not in low._jdf.queryExecution().executedPlan().toString()


def test_knn_arrow_filter_still_pushed_down(spark, tmp_path):
    df = _corpus(spark)
    path = str(tmp_path / "emb")
    df.write.parquet(path)
    scan = spark.read.parquet(path)
    q = [0.05] * DIM
    res = knn(
        scan, q, 5, predicate=F.col("label") != 3, keep_cols=("label",),
        impl="arrow",
    )
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(label), Not(EqualTo(label,3))" in plan
    assert all(r.label != 3 for r in res.collect())


def test_knn_arrow_dimension_mismatch_raises(spark):
    df = _corpus(spark, dim=16)
    with pytest.raises(Exception, match="dimension mismatch"):
        knn(df, [0.0] * 32, 3, impl="arrow").collect()


def test_knn_arrow_cosine_zero_norm_rows_rank_last(spark):
    rows = [(1, [1.0, 0.0] * (DIM // 2)), (2, [0.0] * DIM), (3, [0.5, 0.1] * (DIM // 2))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = knn(df, [1.0, 0.0] * (DIM // 2), 2, metric="cosine", impl="arrow").collect()
    assert [r.vec_id for r in got] == [1, 3]  # zero-norm row 2 never beats real scores


def test_knn_arrow_rejects_column_query(spark):
    df = _corpus(spark, dim=8)
    with pytest.raises(ValueError, match="concrete query vector"):
        knn(df, F.col("embedding"), 3, impl="arrow")


@pytest.mark.parametrize("metric", ["l2", "ip", "cosine"])
def test_batch_knn_arrow_matches_expr(spark, metric):
    df = _corpus(spark)
    qdf = df.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = batch_knn(df, qdf, 5, metric=metric, impl="arrow").collect()
    want = batch_knn(df, qdf, 5, metric=metric, impl="expr").collect()
    gmap = {(r.query_id, r.rank): r.vec_id for r in got}
    wmap = {(r.query_id, r.rank): r.vec_id for r in want}
    assert gmap == wmap
    assert len(got) == 4 * 5


def test_batch_knn_auto_needs_dim_hint(spark):
    df = _corpus(spark)
    qdf = df.limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    hinted = batch_knn(df, qdf, 3, impl="auto", dim=DIM)
    plan = hinted._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    unhinted = batch_knn(df, qdf, 3, impl="auto")
    assert "MapInPandas" not in unhinted._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("metric", ["l2", "cosine"])
def test_range_search_arrow_matches_expr(spark, metric):
    from vector_db_spark.operators.knn import range_search

    df = _corpus(spark)
    q = [0.1] * DIM
    thr = 10.0 if metric == "l2" else 0.2
    got = range_search(df, q, thr, metric=metric, impl="arrow").collect()
    want = range_search(df, q, thr, metric=metric, impl="expr").collect()
    assert [r.vec_id for r in got] == [r.vec_id for r in want]
    plan = range_search(df, q, thr, metric=metric, impl="auto")
    assert "MapInPandas" in plan._jdf.queryExecution().executedPlan().toString()


def test_knn_page_arrow_walk_reproduces_topn_with_ties(spark):
    """VERDICT r10 #3: knn_page's Arrow arm. At dims past ARROW_DIM_MIN
    auto dispatches to the kernel, the keyset filter is applied to the
    kernel's OWN score column (cursor and candidates from one scorer),
    and walking pages reproduces the one-shot top-N exactly — planted
    exact-duplicate vectors make boundary ties land on page edges, the
    case a mixed-scorer cursor would drop or duplicate. Low dims and
    impl='expr' keep the expression fold (oracle parity)."""
    from vector_db_spark.operators.knn import knn_page

    rows = [(i, [float((i * 7 + j) % 5) for j in range(DIM)]) for i in range(40)]
    rows += [(100 + i, rows[i][1]) for i in range(6)]  # exact duplicates: ties
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [0.3] * DIM
    # dispatch pins: high-dim auto -> kernel; expr pin / low dim -> fold
    assert "MapInPandas" in (
        knn_page(df, q, 8)._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" not in (
        knn_page(df, q, 8, impl="expr")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    low = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    assert "MapInPandas" not in (
        knn_page(low, [0.0, 0.0], 2)._jdf.queryExecution().executedPlan().toString()
    )
    for metric in ("l2", "ip"):
        for impl in ("arrow", "expr"):
            walked, after = [], None
            col = "distance" if metric == "l2" else "score"
            for _ in range(6):
                page = knn_page(df, q, 8, after=after, metric=metric, impl=impl).collect()
                if not page:
                    break
                walked.extend((r.vec_id, r[col]) for r in page)
                after = (page[-1][col], page[-1].vec_id)
            one_shot = knn(df, q, 46, metric=metric, impl=impl).collect()
            want = [(r.vec_id, r[col]) for r in one_shot]
            assert walked == want, (metric, impl)  # no boundary row lost/duplicated


def test_batch_knn_arrow_cosine_zero_norm_rows_backfill_like_expr(spark):
    """Zero-norm rows never beat a real candidate, but when a batch has
    fewer than k real candidates they BACKFILL with NULL scores — the
    same row count and order the expression path's nulls-last window
    produces."""
    half = DIM // 2
    rows = [(1, [1.0, 0.0] * half), (2, [0.0] * DIM), (3, [0.9, 0.1] * half)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qdf = spark.createDataFrame(
        [(0, [1.0, 0.0] * half)], "query_id long, query_vec array<double>"
    )
    got = batch_knn(df, qdf, 3, metric="cosine", impl="arrow").collect()
    want = batch_knn(df, qdf, 3, metric="cosine", impl="expr").collect()
    assert [r.vec_id for r in got] == [r.vec_id for r in want] == [1, 3, 2]
    assert got[-1].score is None and want[-1].score is None
    # at k=2 the real candidates fill the page and the zero row vanishes
    got2 = batch_knn(df, qdf, 2, metric="cosine", impl="arrow").collect()
    assert [r.vec_id for r in got2] == [1, 3]


def test_batch_knn_arrow_boundary_ties_break_by_id(spark):
    """k+1 exact-duplicate vectors in ONE batch: local selection must
    keep the lowest ids (lexsort on (score, id)), not an arbitrary
    argpartition subset — the global contract is ties break by id."""
    half = DIM // 2
    dup = [1.0, 0.5] * half
    rows = [(i, dup) for i in (6, 4, 2, 9, 1, 5)] + [(20, [0.0, 1.0] * half)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").coalesce(1)
    qdf = spark.createDataFrame(
        [(0, dup)], "query_id long, query_vec array<double>"
    )
    for metric in ("l2", "ip", "cosine"):
        got = batch_knn(df, qdf, 5, metric=metric, impl="arrow").collect()
        assert [r.vec_id for r in got] == [1, 2, 4, 5, 6], metric


def test_arrow_kernels_raise_on_nan_corpus(spark):
    """ADVICE r10: the expression path scores a NaN-component corpus row
    NaN, which Spark ranks ABOVE every double under desc — but pandas NaN
    becomes NULL across the Arrow transport, ranking LAST under desc and
    FIRST under l2's asc window, and indistinguishable from the
    deliberate cosine zero-norm NULLs. The two impls cannot agree on
    corrupt data, so the Arrow kernels refuse it loudly (single, batch,
    and range paths) instead of silently diverging; query-side NaN is
    rejected at setup."""
    from vector_db_spark.operators.knn import range_search

    df = _corpus(spark, n=30).union(
        spark.createDataFrame(
            [(999, [float("nan")] * DIM, 0)],
            "vec_id long, embedding array<double>, label int",
        )
    )
    q = [0.1] * DIM
    for metric in ("l2", "ip", "cosine"):
        with pytest.raises(Exception, match="NaN"):
            knn(df, q, 5, metric=metric, impl="arrow").collect()
    qdf = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    with pytest.raises(Exception, match="NaN"):
        batch_knn(df, qdf, 5, metric="ip", impl="arrow").collect()
    with pytest.raises(Exception, match="NaN"):
        range_search(df, q, 10.0, metric="l2", impl="arrow").collect()
    # query-side NaN rejected driver-side, before any job runs
    clean = _corpus(spark, n=30)
    with pytest.raises(ValueError, match="NaN"):
        knn(clean, [float("nan")] * DIM, 5, impl="arrow")
    nan_q = spark.createDataFrame(
        [(0, [float("nan")] * DIM)], "query_id long, query_vec array<double>"
    )
    with pytest.raises(ValueError, match="NaN"):
        batch_knn(clean, nan_q, 5, metric="ip", impl="arrow")
    # clean corpora are untouched by the guard
    assert len(knn(clean, q, 5, impl="arrow").collect()) == 5


@pytest.mark.parametrize(
    "metric",
    [
        # smoke tier keeps l2; ip/cosine run the identical kernel with a
        # different score expression and are the heavy tier (r16 —
        # ~16 s apiece; test_batch_knn_arrow_matches_expr keeps all
        # three metrics in the smoke tier)
        "l2",
        pytest.param("ip", marks=pytest.mark.heavy),
        pytest.param("cosine", marks=pytest.mark.heavy),
    ],
)
def test_batch_range_search_arrow_matches_expr(spark, metric):
    """Batched range search: the Arrow kernel (GEMM + nonzero threshold
    mask) must emit exactly the expression path's (query, row) match
    set, cosine zero-norm rows never appear (NULL passes no threshold),
    and NaN corpora raise like the other kernels."""
    from vector_db_spark.operators.knn import batch_range_search

    half = DIM // 2
    df = _corpus(spark, n=60).union(
        spark.createDataFrame(
            [(999, [0.0] * DIM, 0)],
            "vec_id long, embedding array<double>, label int",
        )
    )
    qdf = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    thr = {"l2": 55.0, "ip": 2.0, "cosine": 0.1}[metric]
    col = "distance" if metric == "l2" else "score"
    got = [
        (r.query_id, r.vec_id, round(r[col], 9))
        for r in batch_range_search(df, qdf, thr, metric=metric, impl="arrow").collect()
    ]
    want = [
        (r.query_id, r.vec_id, round(r[col], 9))
        for r in batch_range_search(df, qdf, thr, metric=metric, impl="expr").collect()
    ]
    assert [g[:2] for g in got] == [w[:2] for w in want], metric
    for g, w in zip(got, want):
        assert g[2] == pytest.approx(w[2], abs=1e-9)
    assert len(want) > 0
    if metric == "cosine":
        assert 999 not in [g[1] for g in got]  # zero-norm: no threshold pass
    # predicate composes; auto + dim hint dispatches to the kernel
    pred = F.col("label") == 1
    gp = {(r.query_id, r.vec_id) for r in batch_range_search(
        df, qdf, thr, metric=metric, impl="arrow", predicate=pred).collect()}
    wp = {(r.query_id, r.vec_id) for r in batch_range_search(
        df, qdf, thr, metric=metric, impl="expr", predicate=pred).collect()}
    assert gp == wp
    plan = batch_range_search(df, qdf, thr, metric=metric, dim=DIM)
    assert "MapInPandas" in plan._jdf.queryExecution().executedPlan().toString()
    nan_df = df.union(
        spark.createDataFrame(
            [(998, [float("nan")] * DIM, 0)],
            "vec_id long, embedding array<double>, label int",
        )
    )
    with pytest.raises(Exception, match="NaN"):
        batch_range_search(nan_df, qdf, thr, metric=metric, impl="arrow").collect()


def test_knn_page_cursor_scorer_compat(spark):
    """ADVICE r11 cursor-compatibility contract: a (score, id, scorer)
    cursor dispatches its page to the minting scorer; an untagged cursor
    under impl='auto' in the Arrow regime raises instead of guessing
    (a pre-Arrow-era or expr-minted cursor replayed on the Arrow kernel
    is the drop/duplicate hazard); an explicit impl that contradicts the
    tag raises."""
    import numpy as np
    import pytest

    from vector_db_spark.operators.knn import ARROW_DIM_MIN, knn_page

    dim = ARROW_DIM_MIN
    rng = np.random.RandomState(3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=dim)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    q = [float(x) for x in rng.normal(size=dim)]

    page1 = knn_page(df, q, 5, impl="expr").collect()
    cur = (page1[-1].distance, page1[-1].vec_id)

    # untagged cursor + auto at arrow-regime dim: ambiguous -> loud
    with pytest.raises(ValueError, match="ambiguous cursor"):
        knn_page(df, q, 5, after=cur)
    # tagged cursor dispatches without an explicit impl
    tagged = knn_page(df, q, 5, after=(*cur, "expr")).collect()
    want = knn_page(df, q, 5, after=cur, impl="expr").collect()
    assert [(r.vec_id, r.distance) for r in tagged] == [
        (r.vec_id, r.distance) for r in want
    ]
    # an arrow-tagged cursor runs the Arrow kernel
    p1a = knn_page(df, q, 5, impl="arrow").collect()
    cura = (p1a[-1].distance, p1a[-1].vec_id, "arrow")
    got_arrow = knn_page(df, q, 5, after=cura)
    assert "MapInPandas" in (
        got_arrow._jdf.queryExecution().executedPlan().toString()
    )
    # contradiction is an error, never a silent scorer mix
    with pytest.raises(ValueError, match="minted by the expr scorer"):
        knn_page(df, q, 5, after=(*cur, "expr"), impl="arrow")
    with pytest.raises(ValueError, match="scorer tag"):
        knn_page(df, q, 5, after=(*cur, "gemm"))
    # low-dim auto stays unambiguous: every era's auto means expr there
    low = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.5, 0.5]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    lp1 = knn_page(low, [1.0, 0.0], 2).collect()
    lp2 = knn_page(
        low, [1.0, 0.0], 2, after=(lp1[-1].distance, lp1[-1].vec_id)
    ).collect()
    assert [r.vec_id for r in lp2] == [3]
