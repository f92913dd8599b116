"""IVF-SQ composed index (operators/ivfsq.py).

Gates in ann_queries.py pin the oracle-exact paths (decoded-distance full
probe; rerank-exhaustive ≡ exact kNN). These tests pin the lifecycle and
quality edges: save/load round-trip, probe pruning reads a subset,
tombstone delete ≡ exact-over-survivors, recall at tuned settings, batch
path equivalences, and coarse-quantizer reuse.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_spark.operators.ann import IvfIndex
from vector_db_spark.operators.ivfsq import IvfSqIndex
from vector_db_spark.operators.knn import batch_knn, knn
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
def idx(emb):
    return IvfSqIndex.build(emb, nlist=8, seed=42, max_iter=5)


def test_rerank_exhaustive_equals_exact(idx, emb, qv):
    n = emb.count()
    got = idx.search(qv, 10, nprobe=8, shortlist=n, rerank=emb).collect()
    want = knn(emb, qv, 10).collect()
    assert [(r.vec_id, r.distance) for r in got] == [
        (r.vec_id, r.distance) for r in want
    ]


def test_decoded_distance_close_to_true(idx, emb, qv):
    """Codec reconstruction error bounds the distance error: at int8 over
    the fixture's value range the approx top-10 should overlap the exact
    top-10 almost entirely."""
    approx = {r.vec_id for r in idx.search(qv, 10, nprobe=8).collect()}
    exact = {r.vec_id for r in knn(emb, qv, 10).collect()}
    assert len(approx & exact) >= 8


def test_save_load_roundtrip(idx, emb, qv, tmp_path):
    p = str(tmp_path / "ivfsq")
    idx.save(p)
    loaded = IvfSqIndex.load(emb.sparkSession, p)
    a = idx.search(qv, 10, nprobe=8).collect()
    b = loaded.search(qv, 10, nprobe=8).collect()
    assert [(r.vec_id, r.distance) for r in a] == [(r.vec_id, r.distance) for r in b]


def test_probe_prunes_partitions(idx, emb, qv, tmp_path):
    p = str(tmp_path / "ivfsq_prune")
    idx.save(p)
    loaded = IvfSqIndex.load(emb.sparkSession, p)
    plan = loaded.search(qv, 10, nprobe=2)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster_id" in plan


def test_tombstone_delete_equals_exact_over_survivors(idx, emb, qv, tmp_path):
    p = str(tmp_path / "ivfsq_del")
    idx.save(p)
    loaded = IvfSqIndex.load(emb.sparkSession, p)
    dead = [int(r.vec_id) for r in emb.filter(F.col("vec_id") % 7 == 0).collect()]
    loaded.delete(dead, path=p)
    survivors = emb.filter(F.col("vec_id") % 7 != 0)
    n = emb.count()
    got = loaded.search(qv, 10, nprobe=8, shortlist=n, rerank=emb).collect()
    want = knn(survivors, qv, 10).collect()
    assert [r.vec_id for r in got] == [r.vec_id for r in want]
    # manifest persisted: a fresh load sees the same deletes
    again = IvfSqIndex.load(emb.sparkSession, p)
    got2 = again.search(qv, 10, nprobe=8, shortlist=n, rerank=emb).collect()
    assert [r.vec_id for r in got2] == [r.vec_id for r in want]
    # vacuum compacts: same results, empty manifest
    vac = again.vacuum(str(tmp_path / "ivfsq_vac"))
    assert vac.tombstones is None
    got3 = vac.search(qv, 10, nprobe=8, shortlist=n, rerank=emb).collect()
    assert [r.vec_id for r in got3] == [r.vec_id for r in want]


def test_batch_exhaustive_equals_exact_batch(idx, emb):
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    n = emb.count()
    got = (
        idx.search_batch(queries, 5, nprobe=8, shortlist=n, rerank=emb)
        .orderBy("query_id", "rank")
        .collect()
    )
    want = batch_knn(emb, queries, 5).orderBy("query_id", "rank").collect()
    assert [(r.query_id, r.vec_id, r.rank) for r in got] == [
        (r.query_id, r.vec_id, r.rank) for r in want
    ]


def test_batch_filtered(idx, emb):
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # predicate over the ENCODED frame's columns: id-level predicate
    got = idx.search_batch(
        queries, 5, nprobe=8, predicate=F.col("vec_id") % 2 == 0
    ).collect()
    assert all(r.vec_id % 2 == 0 for r in got)


def test_reuses_prebuilt_coarse_quantizer(emb, qv):
    ivf = IvfIndex.build(emb, nlist=8, seed=42, max_iter=5)
    idx = IvfSqIndex.build(emb, ivf=ivf)
    assert idx.ivf is ivf
    n = emb.count()
    got = idx.search(qv, 10, nprobe=8, shortlist=n, rerank=emb).collect()
    want = knn(emb, qv, 10).collect()
    assert [r.vec_id for r in got] == [r.vec_id for r in want]
    with pytest.raises(ValueError):
        IvfSqIndex.build(emb, ivf=IvfIndex.build(emb, nlist=4, metric="cosine"))


def test_append_out_of_range_clamps_and_rerank_restores(spark, emb, qv, tmp_path):
    """Appended vectors OUTSIDE the fitted [lo, hi] clamp to the codec
    boundary (faiss SQ property): codes stay in [0, 255], decoded
    distances degrade gracefully, and the raw rerank is exact over the
    union."""
    from pyspark.sql import functions as F

    from vector_db_spark.operators.ivfsq import IvfSqIndex
    from vector_db_spark.operators.knn import knn

    half = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1).withColumn(
        "embedding",
        F.transform(F.col("embedding"), lambda x: (x * 10.0).cast("float")),
    )
    p = str(tmp_path / "clamp")
    IvfSqIndex.build(half, nlist=4, seed=42, max_iter=3).save(p)
    idx = IvfSqIndex.load(spark, p).append(rest, path=p)
    reloaded = IvfSqIndex.load(spark, p)
    codes = reloaded.encoded.select(
        F.array_min("sq_codes").alias("lo"), F.array_max("sq_codes").alias("hi")
    ).agg(F.min("lo"), F.max("hi")).head()
    assert codes[0] >= 0 and codes[1] <= 255
    union = half.unionByName(rest)
    got = reloaded.search(qv, 10, nprobe=4, shortlist=10_000, rerank=union).collect()
    want = knn(union, qv, 10).collect()
    assert [r.vec_id for r in got] == [r.vec_id for r in want]
    assert idx is not reloaded
