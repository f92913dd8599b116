"""Tombstone-delete tests across every persisted ANN family.

The gates in ann_queries.py pin delete ≡ exact-over-survivors per family;
these tests pin the lifecycle edges the single-shot gates don't reach:
manifest persistence round-trips, vacuum compaction, deletes-win-over-
append, delete composed with a predicate, and the graph's soft-delete
(deleted nodes still route the beam).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_spark.operators.ann import CosineLshIndex, IvfIndex
from vector_db_spark.operators.graph import GraphAnnIndex
from vector_db_spark.operators.ivfpq import IvfPqIndex
from vector_db_spark.operators.knn import knn
from vector_db_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = load_table(spark, SF, "embeddings").cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def qv(emb):
    r = emb.filter(F.col("vec_id") == 0).head()
    return [float(x) for x in r.embedding]


@pytest.fixture(scope="module")
def survivors(emb):
    return emb.filter(F.col("vec_id") % 7 != 0)


def _pairs(df):
    cols = df.columns[:2]
    return [(r[0], round(r[1], 6)) for r in df.select(*cols).collect()]


def test_ivf_delete_persists_through_manifest(emb, qv, survivors, tmp_path):
    path = str(tmp_path / "ivf")
    idx = IvfIndex.build(emb, nlist=8, seed=42, max_iter=5)
    idx.save(path)
    # delete THROUGH the persisted manifest: load → delete(path) → reload
    IvfIndex.load(emb.sparkSession, path).delete(
        emb.filter(F.col("vec_id") % 7 == 0).select("vec_id"), path=path
    )
    re = IvfIndex.load(emb.sparkSession, path)
    assert _pairs(re.search(qv, 10, nprobe=8)) == _pairs(knn(survivors, qv, 10))


def test_ivf_vacuum_compacts_and_clears_manifest(emb, qv, survivors, tmp_path):
    idx = IvfIndex.build(emb, nlist=8, seed=42, max_iter=5)
    idx.delete([int(r.vec_id) for r in emb.filter(F.col("vec_id") % 7 == 0).collect()])
    vac = idx.vacuum(str(tmp_path / "vac"))
    assert vac.tombstones is None
    # the compacted layout physically dropped the rows
    assert vac.assignments.count() == survivors.count()
    assert _pairs(vac.search(qv, 10, nprobe=8)) == _pairs(knn(survivors, qv, 10))


def test_ivf_deletes_win_over_append_until_vacuum(emb, qv, survivors):
    idx = IvfIndex.build(emb, nlist=8, seed=42, max_iter=5)
    idx.delete(emb.filter(F.col("vec_id") % 7 == 0).select("vec_id"))
    # re-appending tombstoned ids must NOT resurrect them (the old
    # physical rows are still in the layout — serving both would dupe)
    idx.append(emb.filter(F.col("vec_id") % 14 == 0))
    assert _pairs(idx.search(qv, 10, nprobe=8)) == _pairs(knn(survivors, qv, 10))


def test_ivf_retrain_vacuums_tombstones(emb, qv, survivors):
    idx = IvfIndex.build(emb, nlist=8, seed=42, max_iter=5)
    idx.delete(emb.filter(F.col("vec_id") % 7 == 0).select("vec_id"))
    fresh = idx.retrain(max_iter=5)
    assert fresh.tombstones is None
    assert fresh.assignments.count() == survivors.count()
    assert _pairs(fresh.search(qv, 10, nprobe=8)) == _pairs(knn(survivors, qv, 10))


def test_ivf_delete_composes_with_predicate_and_range(emb, qv, survivors):
    idx = IvfIndex.build(emb, nlist=8, seed=42, max_iter=5)
    idx.delete(emb.filter(F.col("vec_id") % 7 == 0).select("vec_id"))
    lbl = survivors.filter(F.col("label") == 3)
    got = idx.search(qv, 10, nprobe=8, predicate=F.col("label") == 3)
    assert _pairs(got) == _pairs(knn(lbl, qv, 10))
    # lossless range pruning must anti-join too (radii stay a superset)
    from vector_db_spark.operators.knn import range_search

    got = idx.range_search(qv, 1.6)
    exact = range_search(survivors, qv, 1.6)
    assert _pairs(got) == _pairs(exact)


def test_lsh_delete_roundtrip(emb, qv, survivors, tmp_path):
    path = str(tmp_path / "lsh")
    idx = CosineLshIndex.build(emb, dim=64, n_bits=1, n_tables=2, seed=42)
    idx.delete(emb.filter(F.col("vec_id") % 7 == 0).select("vec_id"), path=path)
    idx.save(path)
    re = CosineLshIndex.load(emb.sparkSession, path)
    got = re.search(qv, 10, probe_radius=1)
    assert _pairs(got) == _pairs(knn(survivors, qv, 10, metric="cosine"))


def test_graph_soft_delete_keeps_routing(emb, qv, survivors, tmp_path):
    path = str(tmp_path / "graph")
    idx = GraphAnnIndex.build(
        emb, nlist=4, m=16, ef_construction=200, seed=42, max_iter=5
    )
    idx.save(path)
    GraphAnnIndex.load(emb.sparkSession, path).delete(
        emb.filter(F.col("vec_id") % 7 == 0).select("vec_id"), path=path
    )
    re = GraphAnnIndex.load(emb.sparkSession, path)
    # the frame still carries ALL nodes (soft delete — adjacency intact) …
    assert re.graph.count() == emb.count()
    # … but none of the deleted ids are admitted, exhaustively
    got = re.search(qv, 10, nprobe=4, ef_search=10**6)
    assert _pairs(got) == _pairs(knn(survivors, qv, 10))


def test_graph_delete_composes_with_predicate_batch(emb, survivors):
    from vector_db_spark.operators.knn import batch_knn

    idx = GraphAnnIndex.build(
        emb, nlist=4, m=16, ef_construction=200, seed=42, max_iter=5
    )
    idx.delete(emb.filter(F.col("vec_id") % 7 == 0).select("vec_id"))
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = sorted(
        (r.query_id, r.vec_id, round(r.distance, 6))
        for r in idx.search_batch(
            queries, 5, nprobe=4, ef_search=10**9, predicate=F.col("label") == 3
        ).collect()
    )
    exact = sorted(
        (r[0], r[1], round(r[2], 6))
        for r in batch_knn(
            survivors.filter(F.col("label") == 3), queries, 5
        ).collect()
    )
    assert got == exact


def test_ivfpq_delete_roundtrip_and_vacuum(emb, qv, survivors, tmp_path):
    path = str(tmp_path / "ivfpq")
    idx = IvfPqIndex.build(emb, nlist=8, m=16, ksub=64, seed=42, max_iter=5)
    idx.delete(emb.filter(F.col("vec_id") % 7 == 0).select("vec_id"), path=path)
    idx.save(path)
    re = IvfPqIndex.load(emb.sparkSession, path)
    got = re.search(qv, 10, nprobe=8, shortlist=10_000_000)
    assert _pairs(got) == _pairs(knn(survivors, qv, 10))
    vac = re.vacuum(str(tmp_path / "ivfpq_vac"))
    assert vac.tombstones is None
    assert vac.encoded.count() == survivors.count()
    got = vac.search(qv, 10, nprobe=8, shortlist=10_000_000)
    assert _pairs(got) == _pairs(knn(survivors, qv, 10))


def test_graph_append_rebuilds_only_affected_cells(spark, emb, tmp_path):
    """Untouched cells' graph files must not move (mtime pin — the same
    contract IvfIndex.append is pinned to); appended nodes are reachable
    by the beam."""
    import glob
    import os

    from pyspark.sql import functions as F

    from vector_db_spark.operators.graph import GraphAnnIndex
    from vector_db_spark.operators.knn import knn

    p = str(tmp_path / "g")
    GraphAnnIndex.build(
        emb.filter(F.col("vec_id") % 2 == 0),
        nlist=8, m=16, ef_construction=200, seed=42, max_iter=5,
    ).save(p)
    # one new row -> exactly one affected cell
    one = emb.filter(F.col("vec_id") == 1)
    before = {
        f: os.path.getmtime(f) for f in glob.glob(p + "/graph/*/*.parquet")
    }
    GraphAnnIndex.load(spark, p).append(one, path=p)
    after = glob.glob(p + "/graph/*/*.parquet")
    untouched = [f for f in after if f in before and os.path.getmtime(f) == before[f]]
    changed_dirs = {
        os.path.dirname(f) for f in after if f not in before
    }
    assert len(changed_dirs) == 1  # one cell rebuilt
    assert len(untouched) >= len(before) - 2  # the rest never rewritten
    # appended node reachable at exhaustive settings
    idx = GraphAnnIndex.load(spark, p)
    qv = [float(x) for x in one.head().embedding]
    got = [r.vec_id for r in idx.search(qv, 3, nprobe=8, ef_search=10**6).collect()]
    union = emb.filter((F.col("vec_id") % 2 == 0) | (F.col("vec_id") == 1))
    want = [r.vec_id for r in knn(union, qv, 3).collect()]
    assert got == want and got[0] == 1
