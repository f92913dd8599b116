"""MaxSim late-interaction retrieval (operators/late_interaction.py).

Pins: MaxSim degeneracies (one token == plain IP ranking over per-doc max;
one vector per doc == sum of plain dots), the Arrow-GEMM path's equality
with the native-fold path, pre-filter semantics, and tie/order contracts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import vector_db_spark.operators.late_interaction as li
from vector_db_spark.operators.late_interaction import maxsim_search
from vector_db_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = load_table(spark, SF, "embeddings").cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def toks(emb):
    rows = emb.filter(F.col("vec_id") < 3).orderBy("vec_id").collect()
    return [[float(x) for x in r.embedding] for r in rows]


def _brute(emb, toks, k, predicate=None):
    """NumPy reference: group rows by label, maxsim score."""
    import numpy as np

    rows = emb.filter(predicate).collect() if predicate is not None else emb.collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(int(r.label), []).append(
            np.asarray([float(x) for x in r.embedding])
        )
    q = np.asarray(toks)
    scored = []
    for doc, vecs in by_doc.items():
        v = np.asarray(vecs)
        scored.append((doc, float((v @ q.T).max(axis=0).sum())))
    scored.sort(key=lambda t: (-t[1], t[0]))
    return scored[:k]


def test_maxsim_matches_numpy_reference(emb, toks):
    got = maxsim_search(emb, toks, 5, doc_col="label").collect()
    want = _brute(emb, toks, 5)
    assert [int(r.label) for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r.maxsim_score == pytest.approx(s, abs=1e-9)


def test_single_vector_docs_degenerate_to_dot_sum(emb, toks):
    """Each doc = one vector (group by vec_id): max over a singleton set
    is the dot itself, so maxsim == sum of token dots."""
    got = maxsim_search(emb, toks, 5, doc_col="vec_id").collect()
    want = _brute(emb.withColumn("label", F.col("vec_id")), toks, 5)
    assert [int(r.vec_id) for r in got] == [d for d, _ in want]


def test_prefilter_semantics(emb, toks):
    got = maxsim_search(
        emb, toks, 3, doc_col="label", predicate=F.col("label") != 3
    ).collect()
    assert all(int(r.label) != 3 for r in got)
    want = _brute(emb, toks, 3, predicate=F.col("label") != 3)
    assert [int(r.label) for r in got] == [d for d, _ in want]


def test_arrow_path_matches_native_fold(emb, toks, monkeypatch):
    native = maxsim_search(emb, toks, 10, doc_col="label").collect()
    monkeypatch.setattr(li, "_LITERAL_TERM_CEILING", 1)
    arrow = maxsim_search(emb, toks, 10, doc_col="label").collect()
    assert [(int(a.label)) for a in arrow] == [(int(n.label)) for n in native]
    for a, n in zip(arrow, native):
        assert a.maxsim_score == pytest.approx(n.maxsim_score, abs=1e-9)


def test_validation(emb, toks):
    with pytest.raises(ValueError):
        maxsim_search(emb, toks, 0, doc_col="label")
    with pytest.raises(ValueError):
        maxsim_search(emb, [], 3, doc_col="label")
    with pytest.raises(ValueError):
        maxsim_search(emb, [[1.0, 2.0], [1.0]], 3, doc_col="label")


def test_batch_matches_per_query_single(emb, toks, spark):
    from vector_db_spark.operators.late_interaction import maxsim_search_batch

    # two queries: tokens 0-1 and token 2
    qrows = [(0, 0, toks[0]), (0, 1, toks[1]), (1, 0, toks[2])]
    queries = spark.createDataFrame(
        qrows, "query_id long, token_id int, token_vec array<double>"
    )
    got = (
        maxsim_search_batch(emb, queries, 3, doc_col="label")
        .orderBy("query_id", "rank")
        .collect()
    )
    w0 = maxsim_search(emb, toks[:2], 3, doc_col="label").collect()
    w1 = maxsim_search(emb, [toks[2]], 3, doc_col="label").collect()
    assert [(r.label, r.rank) for r in got if r.query_id == 0] == [
        (r.label, i + 1) for i, r in enumerate(w0)
    ]
    assert [(r.label, r.rank) for r in got if r.query_id == 1] == [
        (r.label, i + 1) for i, r in enumerate(w1)
    ]
    for r in got:
        ref = w0 if r.query_id == 0 else w1
        assert r.maxsim_score == pytest.approx(
            ref[r.rank - 1].maxsim_score, abs=1e-9
        )


def test_batch_validation(emb, spark):
    from vector_db_spark.operators.late_interaction import maxsim_search_batch

    empty = spark.createDataFrame(
        [], "query_id long, token_id int, token_vec array<double>"
    )
    with pytest.raises(ValueError, match="non-empty"):
        maxsim_search_batch(emb, empty, 3, doc_col="label")


# ---------------------------------------------------------------------------
# MaxSimIvfIndex — the PLAID decomposition (token IVF candidates + exact
# rerank). Gate pattern mirrors every other family: full probe + full
# shortlist must be VALUE-EXACT vs the exact operator.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def msidx(emb):
    from vector_db_spark.operators.late_interaction import MaxSimIvfIndex

    return MaxSimIvfIndex.build(emb, nlist=8, doc_col="label", max_iter=5)


def _pairs(rows):
    return [(int(r.label), r.maxsim_score) for r in rows]


def test_maxsim_ivf_exhaustive_equals_exact(emb, toks, msidx):
    exact = _pairs(maxsim_search(emb, toks, 5, doc_col="label").collect())
    # candidate path without shortlist (stage 1+3 only)
    full = _pairs(msidx.search(toks, 5, nprobe=8).collect())
    assert full == exact
    # shortlist path (stage 2 approximation active, bound non-binding)
    fullsl = _pairs(msidx.search(toks, 5, nprobe=8, shortlist=10**6).collect())
    assert fullsl == exact


def test_maxsim_ivf_shortlist_arrow_path(emb, toks, msidx, monkeypatch):
    want = _pairs(msidx.search(toks, 5, nprobe=8, shortlist=10**6).collect())
    monkeypatch.setattr(li, "_LITERAL_TERM_CEILING", 1)
    # ceiling=1 forces BOTH the centroid-score gather kernel and the
    # rerank's Arrow GEMM; values must agree to fp tolerance
    got = _pairs(msidx.search(toks, 5, nprobe=8, shortlist=10**6).collect())
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, g), (_, w) in zip(got, want):
        assert g == pytest.approx(w, abs=1e-9)


def test_maxsim_ivf_probe_recall(emb, toks, msidx):
    """Sub-scan settings must still find most of the true top-k — the
    same recall pin every ANN family carries."""
    exact = {d for d, _ in _pairs(maxsim_search(emb, toks, 5, doc_col="label").collect())}
    got = _pairs(msidx.search(toks, 5, nprobe=4, shortlist=7).collect())
    assert len(got) == 5
    assert len({d for d, _ in got} & exact) >= 4
    # reported scores are EXACT MaxSim for every returned doc
    all_exact = dict(
        _pairs(maxsim_search(emb, toks, 100, doc_col="label").collect())
    )
    for d, s in got:
        assert s == pytest.approx(all_exact[d], abs=1e-9)


def test_maxsim_ivf_predicate(emb, toks, msidx):
    exact = _pairs(
        maxsim_search(
            emb, toks, 3, doc_col="label", predicate=F.col("label") != 3
        ).collect()
    )
    got = _pairs(
        msidx.search(toks, 3, nprobe=8, predicate=F.col("label") != 3).collect()
    )
    assert got == exact


def test_maxsim_ivf_save_load_delete(emb, toks, msidx, tmp_path):
    from vector_db_spark.operators.late_interaction import MaxSimIvfIndex

    path = str(tmp_path / "msivf")
    msidx.save(path)
    spark = emb.sparkSession
    loaded = MaxSimIvfIndex.load(spark, path)
    exact = _pairs(maxsim_search(emb, toks, 5, doc_col="label").collect())
    assert _pairs(loaded.search(toks, 5, nprobe=8).collect()) == exact

    # doc-level tombstone: the deleted doc disappears from results
    top_doc = exact[0][0]
    loaded.delete([top_doc], path=path)
    after = _pairs(loaded.search(toks, 5, nprobe=8).collect())
    assert top_doc not in {d for d, _ in after}
    want = _pairs(
        maxsim_search(
            emb, toks, 5, doc_col="label",
            predicate=F.col("label") != top_doc,
        ).collect()
    )
    assert after == want
    # the persisted manifest serves the delete on a fresh load
    again = MaxSimIvfIndex.load(spark, path)
    assert _pairs(again.search(toks, 5, nprobe=8).collect()) == want


def test_maxsim_ivf_validation(msidx, toks):
    with pytest.raises(ValueError):
        msidx.search(toks, 0)
    with pytest.raises(ValueError):
        msidx.search(toks, 3, nprobe=0)
    with pytest.raises(ValueError):
        msidx.search(toks, 3, shortlist=0)
    with pytest.raises(ValueError):
        msidx.search([], 3)
    with pytest.raises(ValueError, match="dimension mismatch"):
        msidx.search([[1.0, 2.0]], 3)


def _qframe(emb, spark):
    qrows = [
        (int(r.vec_id) // 3, int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.filter(F.col("vec_id") < 6).orderBy("vec_id").collect()
    ]
    return spark.createDataFrame(
        qrows, "query_id long, token_id long, token_vec array<double>"
    )


def test_maxsim_ivf_batch_exhaustive_equals_exact(emb, msidx, spark):
    from vector_db_spark.operators.late_interaction import maxsim_search_batch

    queries = _qframe(emb, spark)
    exact = [
        (r.query_id, r.label, r.maxsim_score, r.rank)
        for r in maxsim_search_batch(emb, queries, 5, doc_col="label")
        .orderBy("query_id", "rank")
        .collect()
    ]
    for kw in ({}, {"shortlist": 10**6}):
        got = [
            (r.query_id, r.label, r.maxsim_score, r.rank)
            for r in msidx.search_batch(queries, 5, nprobe=8, **kw)
            .orderBy("query_id", "rank")
            .collect()
        ]
        assert got == exact


def test_maxsim_ivf_batch_shortlists_are_per_query(emb, msidx, spark):
    """A doc shortlisted only by query A must not appear in query B's
    ranking (the candidates mask) — and per-query results at sub-scan
    settings keep exact scores for every returned doc."""
    from vector_db_spark.operators.late_interaction import maxsim_search

    queries = _qframe(emb, spark)
    got = msidx.search_batch(queries, 5, nprobe=4, shortlist=6).collect()
    assert {r.query_id for r in got} == {0, 1}
    toks = {
        0: [
            [float(x) for x in r.token_vec]
            for r in queries.filter(F.col("query_id") == 0)
            .orderBy("token_id")
            .collect()
        ],
        1: [
            [float(x) for x in r.token_vec]
            for r in queries.filter(F.col("query_id") == 1)
            .orderBy("token_id")
            .collect()
        ],
    }
    for q in (0, 1):
        all_exact = dict(
            (int(r.label), r.maxsim_score)
            for r in maxsim_search(emb, toks[q], 100, doc_col="label").collect()
        )
        for r in got:
            if r.query_id == q:
                assert r.maxsim_score == pytest.approx(
                    all_exact[int(r.label)], abs=1e-9
                )


def test_maxsim_ivf_batch_validation(msidx, emb, spark):
    queries = _qframe(emb, spark)
    with pytest.raises(ValueError):
        msidx.search_batch(queries, 0)
    with pytest.raises(ValueError):
        msidx.search_batch(queries, 3, nprobe=0)
    with pytest.raises(ValueError):
        msidx.search_batch(queries, 3, shortlist=0)
    empty = spark.createDataFrame(
        [], "query_id long, token_id long, token_vec array<double>"
    )
    with pytest.raises(ValueError, match="non-empty"):
        msidx.search_batch(empty, 3)


def test_maxsim_ivf_vacuum_and_retrain(emb, toks, tmp_path):
    from vector_db_spark.operators.late_interaction import (
        MaxSimIvfIndex,
        maxsim_search,
    )

    idx = MaxSimIvfIndex.build(emb, nlist=8, doc_col="label", max_iter=5)
    path = str(tmp_path / "ms0")
    idx.save(path)
    loaded = MaxSimIvfIndex.load(emb.sparkSession, path)
    loaded.delete([3], path=path)
    want = _pairs(
        maxsim_search(
            emb, toks, 5, doc_col="label", predicate=F.col("label") != 3
        ).collect()
    )
    # vacuum compacts the deleted doc's rows into a fresh layout with an
    # empty manifest; results over the survivors are unchanged
    compacted = loaded.vacuum(str(tmp_path / "ms1"))
    assert compacted.ivf.tombstones is None
    assert _pairs(compacted.search(toks, 5, nprobe=8).collect()) == want
    # retrain refits the quantizer over live rows; full probe stays exact
    fresh = loaded.retrain(max_iter=5)
    assert _pairs(fresh.search(toks, 5, nprobe=8).collect()) == want


# ---------------------------------------------------------------------------
# MaxSimPqIndex — compressed PLAID (ColBERTv2 residual PQ over the token
# IVF). Gate standard: lossless settings ≡ exact operator bit-for-bit;
# ADC math pinned against driver-side reconstruction; codes column must
# actually be smaller than the raw token store.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mspq(emb):
    from vector_db_spark.operators.late_interaction import MaxSimPqIndex

    return MaxSimPqIndex.build(
        emb, nlist=8, m=8, ksub=16, doc_col="label", max_iter=5, pq_iters=5
    )


def test_maxsim_pq_exhaustive_equals_exact(emb, toks, mspq):
    exact = _pairs(maxsim_search(emb, toks, 5, doc_col="label").collect())
    # candidate path without shortlist (stage 1+3 only)
    assert _pairs(mspq.search(toks, 5, nprobe=8).collect()) == exact
    # residual-ADC shortlist path active, bound non-binding
    assert _pairs(mspq.search(toks, 5, nprobe=8, shortlist=10).collect()) == exact


def test_maxsim_pq_filtered_exhaustive(emb, toks, mspq):
    exact = _pairs(
        maxsim_search(
            emb, toks, 3, doc_col="label", predicate=F.col("label") != 3
        ).collect()
    )
    got = _pairs(
        mspq.search(
            toks, 3, nprobe=8, shortlist=10, predicate=F.col("label") != 3
        ).collect()
    )
    assert got == exact


def test_maxsim_pq_batch_exhaustive(emb, mspq, spark):
    from vector_db_spark.operators.late_interaction import maxsim_search_batch

    queries = _qframe(emb, spark)
    want = [
        (int(r.query_id), int(r.label), r.maxsim_score, r.rank)
        for r in maxsim_search_batch(emb, queries, 3, doc_col="label")
        .orderBy("query_id", "rank")
        .collect()
    ]
    got = [
        (int(r.query_id), int(r.label), r.maxsim_score, r.rank)
        for r in mspq.search_batch(queries, 3, nprobe=8, shortlist=10)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert got == want


def test_maxsim_pq_probe_scores_are_exact(emb, toks, mspq):
    """Stage-3 contract: whatever the ADC shortlist admits, reported
    scores are exact MaxSim — plus the family recall pin."""
    all_exact = dict(
        _pairs(maxsim_search(emb, toks, 100, doc_col="label").collect())
    )
    got = _pairs(mspq.search(toks, 5, nprobe=4, shortlist=7).collect())
    assert len(got) == 5
    for d, s in got:
        assert s == pytest.approx(all_exact[d], abs=1e-9)
    exact5 = {d for d, _ in _pairs(maxsim_search(emb, toks, 5, doc_col="label").collect())}
    assert len({d for d, _ in got} & exact5) >= 4


def test_maxsim_pq_adc_matches_reconstruction(emb, toks, mspq):
    """The stage-2 ADC dot must equal ⟨q_t, centroid_cell⟩ + ⟨q_t,
    reconstructed residual⟩ computed driver-side from the same codes —
    the IP twin of pq.py's ADC-vs-reconstruction accuracy contract."""
    import numpy as np

    from vector_db_spark.operators.ann import _CLUSTER_COL

    live = mspq._ivf._live()
    sample = live.limit(8).collect()
    # per-doc rows aren't keyed by row id; recompute per sampled row via
    # a one-row frame through the same kernel
    for r in sample:
        one = live.sparkSession.createDataFrame([r], live.schema)
        out = mspq._adc_dots(one, toks).collect()[0]
        cents = mspq._raw_centroids()
        codes = np.frombuffer(r.pq_codes, dtype=np.uint8)
        recon = np.concatenate(
            [mspq.codebooks[i][codes[i]] for i in range(mspq.m)]
        )
        c = cents[r[_CLUSTER_COL]]
        for t, q in enumerate(np.asarray(toks, dtype=np.float64)):
            want = float(q @ c + q @ recon)
            assert out.dots[t] == pytest.approx(want, rel=1e-12, abs=1e-12)


def test_maxsim_pq_lifecycle(emb, toks, tmp_path, spark):
    """save → load → append → delete → reload → vacuum, exhaustive ≡
    exact over the evolving corpus at every step (frozen codebooks)."""
    from vector_db_spark.operators.late_interaction import MaxSimPqIndex

    base = emb.filter(F.col("vec_id") >= 50)
    extra = emb.filter(F.col("vec_id") < 50)
    idx = MaxSimPqIndex.build(
        base, nlist=8, m=8, ksub=16, doc_col="label", max_iter=5, pq_iters=5
    )
    path = str(tmp_path / "mspq0")
    idx.save(path)
    loaded = MaxSimPqIndex.load(spark, path)
    assert loaded.m == 8 and loaded.ksub == 16

    loaded.append(extra, path=path)
    want = _pairs(maxsim_search(emb, toks, 5, doc_col="label").collect())
    assert _pairs(loaded.search(toks, 5, nprobe=8, shortlist=10).collect()) == want

    loaded.delete([want[0][0]], path=path)
    want2 = _pairs(
        maxsim_search(
            emb, toks, 5, doc_col="label",
            predicate=F.col("label") != want[0][0],
        ).collect()
    )
    assert _pairs(loaded.search(toks, 5, nprobe=8, shortlist=10).collect()) == want2

    # manifest + appended files survive a reload
    again = MaxSimPqIndex.load(spark, path)
    assert _pairs(again.search(toks, 5, nprobe=8, shortlist=10).collect()) == want2
    compacted = again.vacuum(str(tmp_path / "mspq1"))
    assert compacted._ivf.tombstones is None
    assert (
        _pairs(compacted.search(toks, 5, nprobe=8, shortlist=10).collect())
        == want2
    )


def test_maxsim_pq_codes_smaller_than_raw(emb, tmp_path, spark, mspq):
    """The scan artifact the compression exists for: in the saved cell
    layout, the codes column's parquet bytes must be a small fraction of
    the raw token-vector column's."""
    import glob

    import pyarrow.parquet as pq_

    path = str(tmp_path / "mspq_bytes")
    mspq.save(path)
    code_b = vec_b = 0
    for f in glob.glob(f"{path}/assignments/**/*.parquet", recursive=True):
        meta = pq_.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                col = meta.row_group(rg).column(ci)
                name = col.path_in_schema.split(".")[0]
                if name == "pq_codes":
                    code_b += col.total_compressed_size
                elif name == "embedding":
                    vec_b += col.total_compressed_size
    assert code_b > 0 and vec_b > 0
    # 64-dim float32 ≈ 256B/row raw vs 8B codes; parquet overhead leaves
    # well over 4× even at this tiny SF
    assert code_b * 4 < vec_b


def test_maxsim_pq_validation(mspq, toks):
    import pytest as _pt

    with _pt.raises(ValueError, match="k must be"):
        mspq.search(toks, 0)
    with _pt.raises(ValueError, match="nprobe"):
        mspq.search(toks, 1, nprobe=0)
    with _pt.raises(ValueError, match="shortlist"):
        mspq.search(toks, 1, shortlist=0)
    with _pt.raises(ValueError, match="non-empty"):
        mspq.search([], 1)
    with _pt.raises(ValueError, match="dimension mismatch"):
        mspq.search([[1.0, 2.0]], 1)


def test_delete_with_string_doc_ids_actually_deletes(spark):
    """String doc keys are legal everywhere in this module; delete() used
    to cast them to long -> NULL tombstones -> the anti-join matched
    nothing and 'deleted' docs kept being served (round-10 review)."""
    from vector_db_spark.operators.late_interaction import MaxSimIvfIndex

    rows = [
        (d, [float(d == "a"), float(d == "b"), float(d == "c"), 0.1])
        for d in ("a", "b", "c")
        for _ in range(3)
    ]
    df = spark.createDataFrame(rows, "doc string, embedding array<double>")
    idx = MaxSimIvfIndex.build(df, nlist=1, doc_col="doc", max_iter=3)
    q = [[1.0, 0.0, 0.0, 0.0]]
    before = [r.doc for r in idx.search(q, 3, nprobe=1).collect()]
    assert before[0] == "a"
    idx.delete(spark.createDataFrame([("a",)], "doc string"))
    after = [r.doc for r in idx.search(q, 3, nprobe=1).collect()]
    assert "a" not in after and len(after) == 2


def test_maxsim_pq_empty_ip_append_is_noop(spark):
    from pyspark.sql import functions as F

    from vector_db_spark.operators.late_interaction import MaxSimPqIndex

    rows = [(i % 3, [float(i), 1.0, 0.0, 0.5]) for i in range(24)]
    df = spark.createDataFrame(rows, "doc long, embedding array<double>")
    idx = MaxSimPqIndex.build(df, nlist=2, m=2, ksub=4, doc_col="doc", pq_iters=2)
    before = idx.ivf.max_appended_sq_norm
    idx.append(df.filter(F.col("doc") < 0))  # empty batch: no TypeError
    assert idx.ivf.max_appended_sq_norm == before


def test_with_residuals_arrow_matches_literal(spark):
    """Past the Catalyst term ceiling the residual comes from the Arrow
    kernel; both paths must agree to float64 exactness."""
    import numpy as np

    from vector_db_spark.operators.ann import _EXPR_ASSIGN_MAX
    from vector_db_spark.operators.ivfpq import with_residuals

    rows = [(i, [float(i), 2.0, -1.0, 0.25], i % 3) for i in range(30)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, cluster_id int"
    )
    cents = [[0.5, 0.5, 0.5, 0.5], [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 2.0, 3.0]]
    lit = {r.vec_id: r._resid for r in with_residuals(df, cents, "embedding").collect()}
    assert len(cents) * 4 <= _EXPR_ASSIGN_MAX  # literal path covered above
    big = [[float((i + j) % 7) for j in range(520)] for i in range(3)]
    assert 3 * 520 > _EXPR_ASSIGN_MAX
    rows2 = [(i, [float((i * 3 + j) % 5) for j in range(520)], i % 3) for i in range(9)]
    df2 = spark.createDataFrame(
        rows2, "vec_id long, embedding array<double>, cluster_id int"
    )
    plan = with_residuals(df2, big, "embedding")
    assert "MapInPandas" in plan._jdf.queryExecution().executedPlan().toString()
    got = {r.vec_id: np.asarray(r._resid) for r in plan.collect()}
    for i, vec, c in rows2:
        want = np.asarray(vec) - np.asarray(big[c])
        assert np.array_equal(got[i], want)
    # and the small-dim literal answer is the plain subtraction too
    for i, vec, c in rows:
        want = [v - cc for v, cc in zip(vec, cents[c])]
        assert list(lit[i]) == want


# ---------------------------------------------------------------------------
# MaxSim RANGE search (round 12): score-threshold retrieval — the range
# twin across the late-interaction families. Contract mirrors graph/lsh
# range: returned rows are exact (full-token-set verify), coverage is set
# by nprobe, and nprobe >= nlist IS exhaustive (== the exact operator).
# ---------------------------------------------------------------------------


def _range_threshold(emb, toks, n_in=3):
    """A threshold sitting strictly between the n_in-th and (n_in+1)-th
    exact scores, so exactly n_in docs match regardless of fixture data."""
    top = maxsim_search(emb, toks, n_in + 1, doc_col="label").collect()
    assert len(top) == n_in + 1
    hi, lo = top[n_in - 1].maxsim_score, top[n_in].maxsim_score
    assert lo < hi
    return (hi + lo) / 2.0


def test_maxsim_range_matches_brute(emb, toks):
    from vector_db_spark.operators.late_interaction import maxsim_range_search

    thr = _range_threshold(emb, toks, 3)
    got = maxsim_range_search(emb, toks, thr, doc_col="label").collect()
    want = [(d, s) for d, s in _brute(emb, toks, 10**9) if s >= thr]
    assert [(int(r.label)) for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r.maxsim_score == pytest.approx(s, abs=1e-9)
    # scores bit-equal to the top-k operator's for the same docs
    topk = {
        int(r.label): r.maxsim_score
        for r in maxsim_search(emb, toks, len(got), doc_col="label").collect()
    }
    for r in got:
        assert r.maxsim_score == topk[int(r.label)]


def test_maxsim_range_edge_thresholds(emb, toks):
    from vector_db_spark.operators.late_interaction import maxsim_range_search

    assert (
        maxsim_range_search(emb, toks, 1e18, doc_col="label").count() == 0
    )
    n_docs = emb.select("label").distinct().count()
    assert (
        maxsim_range_search(emb, toks, -1e18, doc_col="label").count()
        == n_docs
    )
    with pytest.raises(ValueError):
        maxsim_range_search(emb, [], 0.0, doc_col="label")
    with pytest.raises(ValueError):
        maxsim_range_search(emb, [[1.0, 2.0], [1.0]], 0.0, doc_col="label")


def test_maxsim_range_predicate(emb, toks):
    from vector_db_spark.operators.late_interaction import maxsim_range_search

    thr = _range_threshold(emb, toks, 5)
    got = maxsim_range_search(
        emb, toks, thr, doc_col="label", predicate=F.col("label") != 3
    ).collect()
    assert all(int(r.label) != 3 for r in got)
    want = [
        (d, s)
        for d, s in _brute(emb, toks, 10**9, predicate=F.col("label") != 3)
        if s >= thr
    ]
    assert [int(r.label) for r in got] == [d for d, _ in want]


def test_maxsim_range_batch_matches_per_query_single(emb, spark):
    from vector_db_spark.operators.late_interaction import (
        maxsim_range_search,
        maxsim_range_search_batch,
    )

    queries = _qframe(emb, spark)
    by_q: dict[int, list] = {}
    for r in queries.orderBy("query_id", "token_id").collect():
        by_q.setdefault(int(r.query_id), []).append(
            [float(x) for x in r.token_vec]
        )
    # one threshold wide enough that every query keeps a few docs
    thr = min(
        _range_threshold(emb, t, 4) for t in by_q.values()
    )
    got = [
        (int(r.query_id), int(r.label), r.maxsim_score)
        for r in maxsim_range_search_batch(
            emb, queries, thr, doc_col="label"
        ).collect()
    ]
    want = []
    for q in sorted(by_q):
        want += [
            (q, int(r.label), r.maxsim_score)
            for r in maxsim_range_search(
                emb, by_q[q], thr, doc_col="label"
            ).collect()
        ]
    assert got == want


def test_maxsim_ivf_range_exhaustive_equals_exact(emb, toks, msidx):
    from vector_db_spark.operators.late_interaction import maxsim_range_search

    thr = _range_threshold(emb, toks, 4)
    exact = [
        (int(r.label), r.maxsim_score)
        for r in maxsim_range_search(emb, toks, thr, doc_col="label").collect()
    ]
    got = [
        (int(r.label), r.maxsim_score)
        for r in msidx.range_search(toks, thr, nprobe=8).collect()
    ]
    assert got == exact


def test_maxsim_ivf_range_probe_is_exact_subset(emb, toks, msidx):
    from vector_db_spark.operators.late_interaction import maxsim_range_search

    thr = _range_threshold(emb, toks, 5)
    exact = {
        int(r.label): r.maxsim_score
        for r in maxsim_range_search(emb, toks, thr, doc_col="label").collect()
    }
    probed = msidx.range_search(toks, thr, nprobe=1).collect()
    for r in probed:  # every returned row is an exact in-range match
        assert int(r.label) in exact
        assert r.maxsim_score == exact[int(r.label)]
    with pytest.raises(ValueError):
        msidx.range_search(toks, thr, nprobe=0)


def test_maxsim_ivf_range_batch_exhaustive(emb, msidx, spark):
    from vector_db_spark.operators.late_interaction import (
        maxsim_range_search_batch,
    )

    queries = _qframe(emb, spark)
    thr = _range_threshold(
        emb,
        [
            [float(x) for x in r.token_vec]
            for r in queries.filter("query_id = 0").orderBy("token_id").collect()
        ],
        4,
    )
    want = [
        (int(r.query_id), int(r.label), r.maxsim_score)
        for r in maxsim_range_search_batch(
            emb, queries, thr, doc_col="label"
        ).collect()
    ]
    got = [
        (int(r.query_id), int(r.label), r.maxsim_score)
        for r in msidx.range_search_batch(queries, thr, nprobe=8).collect()
    ]
    assert got == want


def test_maxsim_pq_range_exhaustive_and_validation(emb, toks, mspq):
    from vector_db_spark.operators.late_interaction import maxsim_range_search

    thr = _range_threshold(emb, toks, 4)
    exact = [
        (int(r.label), r.maxsim_score)
        for r in maxsim_range_search(emb, toks, thr, doc_col="label").collect()
    ]
    got = [
        (int(r.label), r.maxsim_score)
        for r in mspq.range_search(toks, thr, nprobe=8).collect()
    ]
    assert got == exact
    with pytest.raises(ValueError, match="dimension mismatch"):
        mspq.range_search([[1.0, 2.0]], thr)


def test_maxsim_pq_range_batch_exhaustive(emb, mspq, spark):
    from vector_db_spark.operators.late_interaction import (
        maxsim_range_search_batch,
    )

    queries = _qframe(emb, spark)
    thr = _range_threshold(
        emb,
        [
            [float(x) for x in r.token_vec]
            for r in queries.filter("query_id = 1").orderBy("token_id").collect()
        ],
        3,
    )
    want = [
        (int(r.query_id), int(r.label), r.maxsim_score)
        for r in maxsim_range_search_batch(
            emb, queries, thr, doc_col="label"
        ).collect()
    ]
    got = [
        (int(r.query_id), int(r.label), r.maxsim_score)
        for r in mspq.range_search_batch(queries, thr, nprobe=8).collect()
    ]
    assert got == want


def test_maxsim_range_honors_tombstones(emb, toks, tmp_path):
    """Deleted docs never reappear through the probed range path: delete
    two in-range docs, full-probe range must equal exact range over the
    surviving corpus (the tombstone anti-join lives in ivf._live(),
    shared with top-k — this pins that range inherits it)."""
    from vector_db_spark.operators.late_interaction import (
        MaxSimIvfIndex,
        maxsim_range_search,
    )

    idx = MaxSimIvfIndex.build(emb, nlist=8, doc_col="label", max_iter=5)
    idx.save(str(tmp_path / "ms"))
    idx = MaxSimIvfIndex.load(emb.sparkSession, str(tmp_path / "ms"))
    thr = _range_threshold(emb, toks, 5)
    before = [int(r.label) for r in idx.range_search(toks, thr, nprobe=8).collect()]
    victims = before[:2]
    idx.delete(victims)
    got = [
        (int(r.label), r.maxsim_score)
        for r in idx.range_search(toks, thr, nprobe=8).collect()
    ]
    want = [
        (int(r.label), r.maxsim_score)
        for r in maxsim_range_search(
            emb.filter(~F.col("label").isin(victims)), toks, thr,
            doc_col="label",
        ).collect()
    ]
    assert got == want
    assert not set(victims) & {d for d, _ in got}


def test_frozen_pq_quantizer_propagates_exact_fold(spark):
    """ADVICE r14: re-encodes through append/refresh on a frozen
    exact_fold index must use the order-pinned fold, not the GEMM
    expansion — otherwise fp-noise-adjacent residuals could take codes
    the DuckDB oracle's replay never assigns."""
    from vector_db_spark.operators.late_interaction import (
        load_frozen_doc_maxsim_pq,
    )
    from vector_db_spark.sources.fixtures import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    row = emb.limit(1).collect()[0]
    dim = len(row.embedding)
    corpus = emb.limit(8).select(
        F.col("vec_id").alias("doc"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    idx = load_frozen_doc_maxsim_pq(corpus)
    assert getattr(idx._ivf, "exact_fold", False) is True
    assert idx._quantizer().exact_fold is True
