"""Recall-targeted knob tuning (operators/tuning.py).

The reference hardcodes ef_search=200 (search_index_handle.rs:80); the
tuner instead picks the cheapest knob meeting a recall target measured
against the exact operator. Pins: the returned setting meets the target
on the TUNING sample by construction, generalizes to held-out queries,
is minimal (one step cheaper fails), and tuning cost stays logarithmic.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_spark.operators.ann import IvfIndex
from vector_db_spark.operators.graph import GraphAnnIndex
from vector_db_spark.operators.tuning import tune_graph, tune_ivf
from vector_db_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.01"
K = 10
TARGET = 0.8


@pytest.fixture(scope="module")
def emb(spark):
    df = load_table(spark, SF, "embeddings").cache()
    df.count()
    yield df
    df.unpersist()


def _queries(emb, lo, hi):
    return emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def _recall_of(index, emb, queries, k, **params):
    from vector_db_spark.operators.knn import batch_knn
    from vector_db_spark.operators.tuning import _recall, _topk_sets

    exact = _topk_sets(
        batch_knn(emb, queries, k, metric=index.metric).collect(),
        "query_id",
        "vec_id",
    )
    approx = _topk_sets(
        index.search_batch(queries, k, **params).collect(), "query_id", "vec_id"
    )
    return _recall(exact, approx)


def test_tune_ivf_meets_target_and_is_minimal(emb):
    idx = IvfIndex.build(emb, nlist=32, seed=42, max_iter=5)
    sample = _queries(emb, 0, 20)
    out = tune_ivf(idx, sample, k=K, recall_target=TARGET)
    assert out["recall"] >= TARGET
    assert 1 <= out["nprobe"] <= 32
    # logarithmic evaluation count: ascent + binary refine over 32 cells
    assert out["evals"] <= 11
    # minimality on the tuning sample: one probe fewer fails the target
    if out["nprobe"] > 1:
        worse = _recall_of(idx, emb, sample, K, nprobe=out["nprobe"] - 1)
        assert worse < TARGET
    # generalization: the chosen knob holds on HELD-OUT queries
    held = _queries(emb, 20, 40)
    assert _recall_of(idx, emb, held, K, nprobe=out["nprobe"]) >= TARGET - 0.1


def test_tune_ivf_target_one_needs_full_probe_or_lossless(emb):
    idx = IvfIndex.build(emb, nlist=8, seed=42, max_iter=5)
    sample = _queries(emb, 0, 10)
    out = tune_ivf(idx, sample, k=K, recall_target=1.0)
    # recall 1.0 is guaranteed at nprobe=nlist (lossless by construction)
    assert out["recall"] == 1.0
    assert out["nprobe"] <= 8


def test_tune_graph_meets_target_on_ladder(emb):
    idx = GraphAnnIndex.build(emb, nlist=4, m=8, ef_construction=100, seed=42)
    sample = _queries(emb, 0, 20)
    out = tune_graph(idx, sample, k=K, recall_target=TARGET)
    assert out["recall"] >= TARGET
    assert out["nprobe"] >= 1 and out["ef_search"] >= 10
    # the chosen pair reproduces its recall on held-out queries
    held = _queries(emb, 20, 40)
    got = _recall_of(
        idx, emb, held, K, nprobe=out["nprobe"], ef_search=out["ef_search"]
    )
    assert got >= TARGET - 0.1


def test_tune_validates_target(emb):
    idx = IvfIndex.build(emb.limit(50), nlist=2, seed=42, max_iter=3)
    sample = _queries(emb, 0, 5)
    with pytest.raises(ValueError, match="recall_target"):
        tune_ivf(idx, sample, recall_target=0.0)
    with pytest.raises(ValueError, match="recall_target"):
        tune_graph(idx, sample, recall_target=1.5)


@pytest.mark.heavy
def test_tune_ivfpq_meets_target_on_ladder(emb):
    from vector_db_spark.operators.ivfpq import IvfPqIndex
    from vector_db_spark.operators.tuning import tune_ivfpq

    idx = IvfPqIndex.build(emb, nlist=8, m=16, ksub=16, seed=42, max_iter=3)
    sample = _queries(emb, 0, 20)
    out = tune_ivfpq(idx, sample, k=K, recall_target=TARGET)
    assert out["recall"] >= TARGET
    assert out["nprobe"] >= 1 and out["shortlist"] >= 2 * K
    # reproduce at the chosen knobs on held-out queries
    held = _queries(emb, 20, 40)
    from vector_db_spark.operators.knn import batch_knn
    from vector_db_spark.operators.tuning import _recall, _topk_sets

    exact = _topk_sets(
        batch_knn(emb, held, K).collect(), "query_id", "vec_id"
    )
    rows = idx.search_batch(
        held, K, nprobe=out["nprobe"], shortlist=out["shortlist"]
    ).collect()
    assert _recall(exact, _topk_sets(rows, "query_id", "vec_id")) >= TARGET - 0.1


@pytest.mark.heavy
def test_tune_maxsim_meets_target_on_ladder(emb, spark):
    from vector_db_spark.operators.late_interaction import (
        MaxSimIvfIndex,
        maxsim_search_batch,
    )
    from vector_db_spark.operators.tuning import _recall, _topk_sets, tune_maxsim

    corpus = emb.select((F.col("vec_id") % 97).alias("doc"), "embedding")
    idx = MaxSimIvfIndex.build(corpus, nlist=16, doc_col="doc", max_iter=3)
    qrows = [
        (int(r.vec_id) // 3, int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.filter(F.col("vec_id") < 12).orderBy("vec_id").collect()
    ]
    sample = spark.createDataFrame(
        qrows, "query_id long, token_id long, token_vec array<double>"
    )
    out = tune_maxsim(idx, sample, k=5, recall_target=TARGET)
    assert out["recall"] >= TARGET
    # chosen knobs reproduce their recall on the tuning queries
    exact = _topk_sets(
        maxsim_search_batch(corpus, sample, 5, doc_col="doc").collect(),
        "query_id",
        "doc",
    )
    rows = idx.search_batch(
        sample, 5, nprobe=out["nprobe"], shortlist=out["shortlist"]
    ).collect()
    assert _recall(exact, _topk_sets(rows, "query_id", "doc")) >= TARGET


@pytest.mark.heavy
def test_tune_ivfpq_escalates_shortlist_past_ladder(emb):
    """At a recall target the default k-proportional ladder cannot meet
    (coarse codes, high density — the sf1 regime), the tuner must
    escalate the shortlist geometrically instead of silently returning a
    below-target knob. target=1.0 forces escalation toward the exact-
    rerank bound (full probe + corpus-size shortlist ⇒ recall 1.0)."""
    from vector_db_spark.operators.ivfpq import IvfPqIndex
    from vector_db_spark.operators.tuning import tune_ivfpq

    # m=4, ksub=4: deliberately terrible codes so shortlist=16k misses
    idx = IvfPqIndex.build(emb, nlist=4, m=4, ksub=4, seed=42, max_iter=3)
    sample = _queries(emb, 0, 10)
    out = tune_ivfpq(idx, sample, k=K, recall_target=1.0)
    assert out["recall"] == 1.0
    assert out["shortlist"] > 16 * K  # escalated beyond the ladder


@pytest.mark.heavy
def test_tune_maxsim_compressed_family(emb, spark):
    """The tuner addresses the residual-PQ PLAID family (`MaxSimPqIndex`)
    through the same public `.ivf` handle as the uncompressed variant —
    the round-7 defect was an AttributeError right here. target=1.0
    exercises the doc-granular shortlist escalation past the ladder:
    full probe + all-docs shortlist is exact rerank, so recall 1.0 is
    guaranteed and the loop terminates at the doc-population bound."""
    from vector_db_spark.operators.late_interaction import (
        MaxSimPqIndex,
        maxsim_search_batch,
    )
    from vector_db_spark.operators.tuning import _recall, _topk_sets, tune_maxsim

    corpus = emb.select((F.col("vec_id") % 97).alias("doc"), "embedding")
    idx = MaxSimPqIndex.build(
        corpus, nlist=16, m=8, ksub=16, doc_col="doc", max_iter=3, pq_iters=4
    )
    qrows = [
        (int(r.vec_id) // 3, int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.filter(F.col("vec_id") < 12).orderBy("vec_id").collect()
    ]
    sample = spark.createDataFrame(
        qrows, "query_id long, token_id long, token_vec array<double>"
    )
    out = tune_maxsim(idx, sample, k=5, recall_target=TARGET)
    assert out["recall"] >= TARGET
    assert out["nprobe"] >= 1 and out["shortlist"] >= 1
    # held-out reproduction at the chosen knobs
    hrows = [
        (int(r.vec_id) // 3, int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.filter(
            (F.col("vec_id") >= 12) & (F.col("vec_id") < 24)
        ).orderBy("vec_id").collect()
    ]
    held = spark.createDataFrame(
        hrows, "query_id long, token_id long, token_vec array<double>"
    )
    exact = _topk_sets(
        maxsim_search_batch(corpus, held, 5, doc_col="doc").collect(),
        "query_id",
        "doc",
    )
    rows = idx.search_batch(
        held, 5, nprobe=out["nprobe"], shortlist=out["shortlist"]
    ).collect()
    # 4 held-out queries x 5 docs on a 97-doc fixture: one swapped doc
    # moves recall by 0.05, so the generalization bound is loose here
    # (the statistically meaningful sf0.1/sf1 lines come from
    # tools/maxsim_recall.py, recorded as RECALL_r09.json)
    assert _recall(exact, _topk_sets(rows, "query_id", "doc")) >= TARGET - 0.25
    # escalation path terminates at the exact-rerank bound
    hard = tune_maxsim(idx, sample, k=5, recall_target=1.0)
    assert hard["recall"] == 1.0


def test_tune_collection_dispatch_persist_and_serve(spark, emb, tmp_path):
    """The full loop in one call: tune_collection dispatches the family
    tuner, persist=True writes ONLY whitelisted knobs back, and a fresh
    catalog instance serves at the tuned operating point by default."""
    from vector_db_spark.operators import ann
    from vector_db_spark.operators.collections import CollectionCatalog
    from vector_db_spark.operators.tuning import tune_collection

    cat = CollectionCatalog(spark, str(tmp_path))
    coll = cat.create("t_ivf", dim=64, metric="l2", index_type="ivf")
    coll.insert(
        emb.filter(F.col("vec_id") >= 50).select(
            F.col("vec_id").alias("id"), "embedding"
        )
    )

    # staleness contract mirrors search(): unbuilt refuses
    qs = _queries(emb, 0, 10)
    with pytest.raises(ValueError, match="build_index"):
        tune_collection(coll, qs, k=K, recall_target=TARGET)
    coll.build_index(nlist=8, max_iter=5)

    out = tune_collection(coll, qs, k=K, recall_target=TARGET, persist=True)
    assert out["recall"] >= TARGET
    # only the knob was persisted — recall/evals stripped
    assert coll.info.serving_params == {"nprobe": out["nprobe"]}

    # a fresh catalog serves at the tuned point with no explicit knobs
    again = CollectionCatalog(spark, str(tmp_path)).get("t_ivf")
    seen: dict = {}
    orig = ann.IvfIndex.search_batch

    def spy(self, queries, k, **kw):
        seen.update(kw)
        return orig(self, queries, k, **kw)

    ann.IvfIndex.search_batch = spy
    try:
        again.search_batch(qs, K).collect()
    finally:
        ann.IvfIndex.search_batch = orig
    assert seen["nprobe"] == out["nprobe"]


@pytest.mark.parametrize(
    "itype,build",
    [
        ("ivfsq", dict(nlist=8, max_iter=5)),
        # ivfopq exercises the uniform .ivf handle on the wrapped index
        # (round-9 review: the served-shortlist tuner read idx.ivf, which
        # IvfOpqIndex lacked — this pins the whole dispatch path)
        ("ivfopq", dict(nlist=8, max_iter=5, m=4, ksub=16, pq_iters=3,
                        opq_iters=2)),
    ],
)
@pytest.mark.heavy
def test_tune_collection_served_shortlist_family(spark, emb, tmp_path, itype, build):
    """IVF-SQ/OPQ tune through Collection.search_batch (their codes
    layouts drop raw vectors; the served rerank against the live scan is
    part of the tuned path) and the result meets the target."""
    from vector_db_spark.operators.collections import CollectionCatalog
    from vector_db_spark.operators.tuning import tune_collection

    cat = CollectionCatalog(spark, str(tmp_path))
    coll = cat.create("t_sq", dim=64, metric="l2", index_type=itype)
    coll.insert(
        emb.filter(F.col("vec_id") >= 50).select(
            F.col("vec_id").alias("id"), "embedding"
        )
    )
    coll.build_index(**build)
    qs = _queries(emb, 0, 10)
    out = tune_collection(coll, qs, k=K, recall_target=TARGET, persist=True)
    assert out["recall"] >= TARGET
    assert set(coll.info.serving_params) == {"nprobe", "shortlist"}
    # the persisted point reproduces the tuned recall through serving
    got = {
        r.query_id: set()
        for r in qs.select("query_id").collect()
    }
    for r in coll.search_batch(qs, K).collect():
        got[r.query_id].add(r.id)
    from vector_db_spark.operators.knn import batch_knn

    exact = {}
    for r in batch_knn(coll.scan(), qs, K, metric="l2", id_col="id").collect():
        exact.setdefault(r.query_id, set()).add(r.id)
    rec = sum(
        len(exact[q] & got[q]) / len(exact[q]) for q in exact
    ) / len(exact)
    assert rec >= TARGET


@pytest.mark.heavy
def test_tune_collection_exact_edge_and_lsh_radius(spark, emb, tmp_path):
    """exact has nothing to tune; lsh tunes probe_radius — the minimal
    radius meeting the target persists, and radius = n_bits (every
    bucket) is exact by construction so the ladder always has a 1.0
    ceiling on a (2-bit) toy code."""
    from vector_db_spark.operators.collections import CollectionCatalog
    from vector_db_spark.operators.tuning import tune_collection

    cat = CollectionCatalog(spark, str(tmp_path))
    exact = cat.create("t_exact", dim=64, metric="l2", index_type="exact")
    assert tune_collection(exact, None) == {"recall": 1.0, "evals": 0}

    lsh = cat.create("t_lsh", dim=64, metric="cosine", index_type="lsh")
    lsh.insert(
        emb.filter(F.col("vec_id") >= 50).select(
            F.col("vec_id").alias("id"), "embedding"
        )
    )
    lsh.build_index(n_bits=2, n_tables=2)
    qs = _queries(emb, 0, 10)
    out = tune_collection(lsh, qs, k=K, recall_target=1.0, persist=True)
    # radius 2 over 2 bits probes every bucket -> exact -> recall 1.0
    assert out["recall"] == 1.0 and out["probe_radius"] <= 2
    assert lsh.info.serving_params == {"probe_radius": out["probe_radius"]}

    # a knob that would make knob-less serving raise is refused at SET
    # time (n_bits=64: radius 2 needs 64 + C(64,2) = 2080 > 2048 masks)
    wide = cat.create("t_lsh_wide", dim=64, metric="cosine", index_type="lsh")
    wide.insert(
        emb.filter(F.col("vec_id") >= 50).select(
            F.col("vec_id").alias("id"), "embedding"
        )
    )
    wide.build_index(n_bits=64, n_tables=1)
    with pytest.raises(ValueError, match="mask"):
        wide.set_serving_params(probe_radius=2)
    wide.set_serving_params(probe_radius=1)  # 64 masks: fine
    assert wide.info.serving_params == {"probe_radius": 1}


@pytest.mark.heavy
def test_rebuild_drops_stranded_probe_radius(spark, emb, tmp_path):
    """A rebuild with more code bits can put a persisted probe_radius
    past the probe-mask ceiling; build_index must drop the stale knob
    with a warning instead of leaving every knob-less search a 500
    (ADVICE r9)."""
    from vector_db_spark.operators.collections import CollectionCatalog

    cat = CollectionCatalog(spark, str(tmp_path))
    lsh = cat.create("t_lsh_rebuild", dim=64, metric="cosine", index_type="lsh")
    lsh.insert(
        emb.filter(F.col("vec_id") >= 50).select(
            F.col("vec_id").alias("id"), "embedding"
        )
    )
    lsh.build_index(n_bits=4, n_tables=1)
    lsh.set_serving_params(probe_radius=3)  # 15 masks over 4 bits: fine
    with pytest.warns(UserWarning, match="probe_radius"):
        lsh.build_index(n_bits=24, n_tables=1)  # radius 3 -> 2325 masks
    assert "probe_radius" not in lsh.info.serving_params
    # persisted state agrees, and a knob-less search serves again
    reopened = cat.get("t_lsh_rebuild")
    assert "probe_radius" not in reopened.info.serving_params
    # knob-less serving works again (default radius probes the query's
    # own bucket — a corpus member's vector guarantees >= 1 occupant;
    # with the stale radius this call raised)
    member = [float(x) for x in emb.filter(F.col("vec_id") == 50).head()[1]]
    assert len(reopened.search(member, 3).collect()) >= 1
    # a rebuild that keeps the knob serveable does NOT touch it
    lsh.set_serving_params(probe_radius=1)
    lsh.build_index(n_bits=8, n_tables=1)
    assert lsh.info.serving_params == {"probe_radius": 1}


@pytest.mark.heavy
def test_tune_collection_maxsim_dispatch(spark, tmp_path):
    """Multi-vector dispatch: tune_collection routes a maxsim collection
    to tune_maxsim with the long-format (query_id, token_id, token_vec)
    sample, and persists (nprobe, shortlist) only."""
    from tests.test_collections import _doc_df
    from vector_db_spark.operators.collections import CollectionCatalog
    from vector_db_spark.operators.tuning import tune_collection

    cat = CollectionCatalog(spark, str(tmp_path))
    coll = cat.create("t_ms", dim=8, metric="ip", index_type="maxsim")
    coll.insert(_doc_df(spark, n_docs=10))
    coll.build_index(nlist=4, max_iter=5)
    toks = [[float(i == j) for i in range(8)] for j in range(2)]
    sample = spark.createDataFrame(
        [(q, t, toks[t]) for q in range(2) for t in range(2)],
        "query_id long, token_id int, token_vec array<float>",
    )
    out = tune_collection(coll, sample, k=3, recall_target=0.9, persist=True)
    assert out["recall"] >= 0.9
    assert set(coll.info.serving_params) == {"nprobe", "shortlist"}
    # the persisted point serves through the catalog with no knobs
    assert len(coll.search(toks, 3).collect()) == 3


def test_tune_collection_graph_dispatch(spark, emb, tmp_path):
    """Graph-family dispatch: tune_collection routes to tune_graph and
    persists both knobs (nprobe, ef_search) the family whitelists."""
    from vector_db_spark.operators.collections import CollectionCatalog
    from vector_db_spark.operators.tuning import tune_collection

    cat = CollectionCatalog(spark, str(tmp_path))
    coll = cat.create("t_graph", dim=64, metric="l2", index_type="graph")
    coll.insert(
        emb.filter(F.col("vec_id") >= 50).select(
            F.col("vec_id").alias("id"), "embedding"
        )
    )
    coll.build_index(nlist=2, m=8, ef_construction=100, max_iter=5)
    qs = _queries(emb, 0, 10)
    out = tune_collection(coll, qs, k=K, recall_target=TARGET, persist=True)
    assert out["recall"] >= TARGET
    assert set(coll.info.serving_params) == {"nprobe", "ef_search"}
    assert len(coll.search([0.0] * 64, 3).collect()) == 3


@pytest.mark.heavy
def test_tune_graph_range_meets_coverage_target(emb):
    """VERDICT r11 #5: the range tuner returns knobs whose range
    COVERAGE (|returned ∩ true|/|true| vs the exact batched range scan)
    meets the target on the sample, every returned row being exact by
    construction."""
    from vector_db_spark.operators.knn import batch_range_search
    from vector_db_spark.operators.tuning import (
        _recall,
        _topk_sets,
        tune_graph_range,
    )

    idx = GraphAnnIndex.build(
        emb, nlist=8, m=16, ef_construction=200, seed=42, max_iter=5
    )
    queries = _queries(emb, 0, 8)
    thr = 1.6
    out = tune_graph_range(idx, queries, thr, coverage_target=TARGET)
    assert out["coverage"] >= TARGET
    # measured coverage is reproducible at the returned knobs
    exact = _topk_sets(
        batch_range_search(emb, queries, thr).collect(), "query_id", "vec_id"
    )
    got = _topk_sets(
        idx.range_search_batch(
            queries, thr, nprobe=out["nprobe"], ef_search=out["ef_search"]
        ).collect(),
        "query_id",
        "vec_id",
    )
    assert _recall(exact, got) == pytest.approx(out["coverage"])
    with pytest.raises(ValueError, match="coverage_target"):
        tune_graph_range(idx, queries, thr, coverage_target=0.0)


def test_tune_lsh_range_monotone_and_meets_target(emb):
    from vector_db_spark.operators.ann import CosineLshIndex
    from vector_db_spark.operators.tuning import tune_lsh_range

    idx = CosineLshIndex.build(emb, dim=64, n_bits=6, n_tables=4, seed=42)
    queries = _queries(emb, 0, 8)
    out = tune_lsh_range(idx, queries, 0.15, coverage_target=TARGET)
    assert out["coverage"] >= TARGET
    assert 1 <= out["probe_radius"] <= 6


@pytest.mark.heavy
def test_tune_collection_joint_range_target_persists(spark, emb, tmp_path):
    """tune_collection(range_threshold=...) on a graph collection: the
    persisted knobs meet BOTH the top-k recall target and the range
    coverage target (re-measured at the merged operating point), and the
    served range path at the stored knobs reaches the reported
    coverage."""
    from vector_db_spark.operators.collections import CollectionCatalog
    from vector_db_spark.operators.knn import batch_range_search
    from vector_db_spark.operators.tuning import (
        _recall,
        _topk_sets,
        tune_collection,
    )

    cat = CollectionCatalog(spark, str(tmp_path))
    coll = cat.create("jr", dim=64, metric="l2", index_type="graph")
    coll.insert(emb.select((F.col("vec_id") + 1).alias("id"), "embedding"))
    coll.build_index(nlist=8, m=16, ef_construction=200, max_iter=5)
    queries = _queries(emb, 0, 8)
    thr = 1.6
    out = tune_collection(
        coll, queries, k=K, recall_target=TARGET, persist=True,
        range_threshold=thr,
    )
    assert out["recall"] >= TARGET
    assert out["range_coverage"] >= TARGET
    stored = coll.info.serving_params
    assert stored["nprobe"] == out["nprobe"]
    assert stored["ef_search"] == out["ef_search"]
    # the SERVED range path (no explicit knobs) reaches the coverage
    exact = _topk_sets(
        batch_range_search(
            coll.scan(), queries, thr, id_col="id", vec_col="embedding"
        ).collect(),
        "query_id",
        "id",
    )
    got = _topk_sets(
        coll.range_search_batch(queries, thr).collect(), "query_id", "id"
    )
    assert _recall(exact, got) >= TARGET


@pytest.mark.heavy
def test_tune_maxsim_range_meets_coverage_target(spark, tmp_path):
    """Round 12: the MaxSim range tuner returns the minimal-nprobe rung
    whose coverage vs the exact batched MaxSim range meets the target;
    full probe is exact (coverage 1.0) so the ladder always terminates."""
    from tests.test_collections import _doc_df
    from vector_db_spark.operators.late_interaction import (
        MaxSimIvfIndex,
        maxsim_range_search_batch,
    )
    from vector_db_spark.operators.tuning import (
        _recall,
        _topk_sets,
        tune_maxsim_range,
    )

    docs = _doc_df(spark, n_docs=12)
    exploded = docs.select(
        "id", F.explode("embedding").alias("embedding")
    )
    idx = MaxSimIvfIndex.build(exploded, nlist=4, doc_col="id", max_iter=5)
    toks = [[float(i == j) for i in range(8)] for j in range(2)]
    sample = spark.createDataFrame(
        [(q, t, toks[t]) for q in range(2) for t in range(2)],
        "query_id long, token_id int, token_vec array<float>",
    )
    thr = 0.1
    out = tune_maxsim_range(idx, sample, thr, coverage_target=0.95)
    assert out["coverage"] >= 0.95
    # reproducible at the returned knob
    exact = _topk_sets(
        maxsim_range_search_batch(
            exploded, sample, thr, doc_col="id"
        ).collect(),
        "query_id",
        "id",
    )
    got = _topk_sets(
        idx.range_search_batch(sample, thr, nprobe=out["nprobe"]).collect(),
        "query_id",
        "id",
    )
    assert _recall(exact, got) == pytest.approx(out["coverage"])
    # full probe IS exact
    full = _topk_sets(
        idx.range_search_batch(sample, thr, nprobe=4).collect(),
        "query_id",
        "id",
    )
    assert _recall(exact, full) == 1.0
    with pytest.raises(ValueError, match="coverage_target"):
        tune_maxsim_range(idx, sample, thr, coverage_target=0.0)


@pytest.mark.heavy
def test_tune_collection_maxsim_joint_range_target(spark, tmp_path):
    """tune_collection(range_threshold=...) on a maxsim collection: the
    merged nprobe meets both axes, both re-measured numbers are
    reported, and the persisted knobs serve range through the catalog."""
    from tests.test_collections import _doc_df
    from vector_db_spark.operators.collections import CollectionCatalog
    from vector_db_spark.operators.tuning import tune_collection

    cat = CollectionCatalog(spark, str(tmp_path))
    coll = cat.create("t_msr", dim=8, metric="ip", index_type="maxsim")
    coll.insert(_doc_df(spark, n_docs=12))
    coll.build_index(nlist=4, max_iter=5)
    toks = [[float(i == j) for i in range(8)] for j in range(2)]
    sample = spark.createDataFrame(
        [(q, t, toks[t]) for q in range(2) for t in range(2)],
        "query_id long, token_id int, token_vec array<float>",
    )
    out = tune_collection(
        coll, sample, k=3, recall_target=0.9, persist=True,
        range_threshold=0.1,
    )
    assert out["recall"] >= 0.9
    assert out["range_coverage"] >= 0.9
    assert set(coll.info.serving_params) == {"nprobe", "shortlist"}
    assert coll.info.serving_params["nprobe"] == out["nprobe"]
    # served range path (knob-less) returns only exact in-range rows
    got = coll.range_search(toks, 0.1).collect()
    assert all(r.score >= 0.1 for r in got)
