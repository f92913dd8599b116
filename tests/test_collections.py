"""Collection lifecycle/DML tests ≅ the reference's factory + db tests
(src/core/index_factory.rs:177-278, src/db/vector_database.rs:87-146)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_spark.operators.collections import (
    CollectionCatalog,
    delete_rows,
    merge_upsert,
)


@pytest.fixture()
def catalog(spark, tmp_path):
    return CollectionCatalog(spark, str(tmp_path))


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, embedding array<float>, name string")


def test_create_validation(catalog):
    # ≅ dim >= 1 (create.rs:12-14); unknown type -> error (index_factory.rs:157-161)
    with pytest.raises(ValueError, match="dim"):
        catalog.create("bad", dim=0)
    with pytest.raises(ValueError, match="index_type"):
        catalog.create("bad", dim=3, index_type="hnsw9000")
    with pytest.raises(ValueError, match="metric"):
        catalog.create("bad", dim=3, metric="manhattan")


def test_registry_roundtrip(catalog):
    # ≅ multi-(type,dim,metric) registry test (index_factory.rs:177-278)
    catalog.create("a", dim=3, metric="l2", index_type="exact")
    catalog.create("b", dim=8, metric="ip", index_type="lsh")
    assert catalog.list() == ["a", "b"]
    assert catalog.get("a").info.dim == 3
    assert catalog.get("b").info.metric == "ip"
    with pytest.raises(ValueError, match="exists"):
        catalog.create("a", dim=3)
    with pytest.raises(KeyError):
        catalog.get("missing")  # ≅ 404 (app_error.rs:38-44)


def test_upsert_then_query_roundtrip(spark, catalog):
    # ≅ upsert-then-query JSON equality (vector_database.rs:97-145):
    # second upsert with same id replaces; read-back returns merged row.
    c = catalog.create("docs", dim=3)
    c.upsert(_df(spark, [(1, [1.0, 2.0, 3.0], "sora")]))
    row = c.get(1)
    assert row.name == "sora"
    c.upsert(_df(spark, [(1, [9.0, 9.0, 9.0], "updated")]))
    assert c.scan().count() == 1  # exactly one live row per id
    assert c.get(1).name == "updated"
    assert [round(x) for x in c.get(1).embedding] == [9, 9, 9]
    assert c.get(404) is None


def test_insert_append_and_delete(spark, catalog):
    c = catalog.create("v", dim=2)
    c.insert(_df(spark, [(1, [0.0, 0.0], "a"), (2, [1.0, 1.0], "b")]))
    c.insert(_df(spark, [(3, [2.0, 2.0], "c")]))
    assert c.scan().count() == 3
    c.delete(F.col("id") == 2)
    assert sorted(r.id for r in c.scan().collect()) == [1, 3]
    # delete by id-set DataFrame (anti-join path)
    c.delete(spark.createDataFrame([(3,)], "id long"))
    assert [r.id for r in c.scan().collect()] == [1]


def test_write_validation(spark, catalog):
    c = catalog.create("strict", dim=3)
    with pytest.raises(Exception, match="must be >= 1"):
        c.insert(_df(spark, [(0, [1.0, 2.0, 3.0], "x")]))  # id >= 1 (insert.rs:12-14)
    with pytest.raises(Exception, match="dim=3"):
        c.insert(_df(spark, [(1, [1.0, 2.0], "x")]))  # strict dim-on-write


def test_merge_upsert_updates_win(spark):
    base = spark.createDataFrame([(1, "old"), (2, "keep")], "id long, v string")
    ups = spark.createDataFrame([(1, "new"), (3, "ins")], "id long, v string")
    got = {r.id: r.v for r in merge_upsert(base, ups, ("id",)).collect()}
    assert got == {1: "new", 2: "keep", 3: "ins"}


def test_merge_upsert_schema_mismatch(spark):
    base = spark.createDataFrame([(1, "a")], "id long, v string")
    ups = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="schema"):
        merge_upsert(base, ups, ("id",))


def test_delete_rows_predicate_and_idset(spark):
    base = spark.createDataFrame([(i, i * 10) for i in range(5)], "id long, v long")
    assert delete_rows(base, F.col("v") > 20, ("id",)).count() == 3
    ids = spark.createDataFrame([(0,), (1,)], "id long")
    assert sorted(r.id for r in delete_rows(base, ids, ("id",)).collect()) == [2, 3, 4]


def test_catalog_survives_restart(spark, tmp_path):
    # durability divergence: the reference loses indexes on restart
    # (in-memory DashMap, index_factory.rs:170-175); our catalog must not.
    c1 = CollectionCatalog(spark, str(tmp_path))
    col = c1.create("persist", dim=2)
    col.insert(_df(spark, [(1, [1.0, 2.0], "x")])[["id", "embedding", "name"]])
    c2 = CollectionCatalog(spark, str(tmp_path))
    assert c2.list() == ["persist"]
    assert c2.get("persist").get(1).name == "x"


def test_salted_aggregate_matches_direct(spark):
    from pyspark.sql import functions as F

    from vector_db_spark.operators.skew import salted_aggregate
    from vector_db_spark.sources.fixtures import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    got = {
        r.l_returnflag: (r.n_rows, r.sum_l_extendedprice, r.min_l_quantity, r.max_l_quantity)
        for r in salted_aggregate(
            li, ["l_returnflag"], n_salts=8,
            sum_cols=["l_extendedprice"], min_cols=["l_quantity"], max_cols=["l_quantity"],
        ).collect()
    }
    want = {
        r.l_returnflag: (r.n, r.s, r.mn, r.mx)
        for r in li.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double").alias("s"),
            F.min("l_quantity").alias("mn"),
            F.max("l_quantity").alias("mx"),
        ).collect()
    }
    assert got == want


def test_sketches_close_to_exact(spark):
    from pyspark.sql import functions as F

    from vector_db_spark.sources.fixtures import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    row = orders.agg(
        F.approx_count_distinct("o_custkey").alias("approx"),
        F.countDistinct("o_custkey").alias("exact"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50"),
        F.expr("percentile(o_totalprice, 0.5)").alias("p50_exact"),
    ).head()
    assert abs(row.approx - row.exact) / row.exact < 0.05
    assert abs(row.p50 - row.p50_exact) / row.p50_exact < 0.02


def _vec_df(spark, n=200, dim=8, seed=3):
    import numpy as np

    rng = np.random.RandomState(seed)
    data = [(i + 1, [float(x) for x in rng.normal(size=dim)]) for i in range(n)]
    return spark.createDataFrame(data, "id long, embedding array<float>")


def test_collection_index_lifecycle_ivf(spark, tmp_path):
    from pyspark.sql import functions as F

    from vector_db_spark.operators.collections import CollectionCatalog
    from vector_db_spark.operators.knn import knn

    cat = CollectionCatalog(spark, str(tmp_path))
    coll = cat.create("vecs", dim=8, metric="l2", index_type="ivf")
    df = _vec_df(spark)
    coll.insert(df)
    coll.build_index(nlist=4, max_iter=5)

    qv = [0.0] * 8
    got = [r.id for r in coll.search(qv, 5, nprobe=4).collect()]
    want = [r.id for r in knn(coll.scan(), qv, 5, id_col="id").collect()]
    assert got == want  # full probe == exact

    # mutations invalidate the index: stale search must refuse
    coll.upsert(df.limit(1).select("id", F.col("embedding")))
    with pytest.raises(ValueError, match="rebuild"):
        coll.search(qv, 5)
    coll.build_index(nlist=4, max_iter=5)
    assert len(coll.search(qv, 5, nprobe=4).collect()) == 5


def test_collection_exact_search_and_lsh_validation(spark, tmp_path):
    from vector_db_spark.operators.collections import CollectionCatalog

    cat = CollectionCatalog(spark, str(tmp_path))
    exact = cat.create("e", dim=8, metric="ip", index_type="exact")
    exact.insert(_vec_df(spark, n=50))
    assert len(exact.search([1.0] * 8, 3).collect()) == 3

    lsh = cat.create("l", dim=8, metric="l2", index_type="lsh")
    lsh.insert(_vec_df(spark, n=50))
    with pytest.raises(ValueError, match="cosine"):
        lsh.build_index()

    lshc = cat.create("lc", dim=8, metric="cosine", index_type="lsh")
    lshc.insert(_vec_df(spark, n=50))
    with pytest.raises(ValueError, match="build_index"):
        lshc.search([1.0] * 8, 3)
    lshc.build_index(n_bits=4, n_tables=4)
    assert len(lshc.search([1.0] * 8, 3, probe_radius=1).collect()) == 3


def test_upsert_rewrites_only_affected_buckets(spark, tmp_path):
    # Bucketed copy-on-write: a 1-row upsert into a populated collection
    # must rewrite < 20% of the data files (VERDICT r1: full-snapshot DML
    # was the scale-killer; now the rewrite unit is one hash bucket).
    import glob

    cat = CollectionCatalog(spark, str(tmp_path))
    c = cat.create("incr", dim=2, n_buckets=16)
    c.insert(
        spark.createDataFrame(
            [(i, [float(i), 0.0], f"r{i}") for i in range(1, 201)],
            "id long, embedding array<float>, name string",
        )
    )
    total_files = len(
        glob.glob(str(tmp_path / "incr" / "v*" / "__bucket=*" / "*.parquet"))
    )
    c.upsert(
        spark.createDataFrame(
            [(7, [9.0, 9.0], "updated")],
            "id long, embedding array<float>, name string",
        )
    )
    new_files = glob.glob(
        str(tmp_path / "incr" / f"v{c.info.version:06d}" / "__bucket=*" / "*.parquet")
    )
    assert 0 < len(new_files) < 0.2 * total_files, (len(new_files), total_files)
    # and the snapshot is still complete + merged
    assert c.scan().count() == 200
    assert c.get(7).name == "updated"
    assert c.get(8).name == "r8"


def test_keyed_delete_rewrites_only_affected_buckets(spark, tmp_path):
    cat = CollectionCatalog(spark, str(tmp_path))
    c = cat.create("incrdel", dim=2, n_buckets=16)
    c.insert(
        spark.createDataFrame(
            [(i, [float(i), 0.0], f"r{i}") for i in range(1, 201)],
            "id long, embedding array<float>, name string",
        )
    )
    c.delete(spark.createDataFrame([(5,), (6,)], "id long"))
    import glob

    new_files = glob.glob(
        str(
            tmp_path
            / "incrdel"
            / f"v{c.info.version:06d}"
            / "__bucket=*"
            / "*.parquet"
        )
    )
    assert len(new_files) <= 2
    assert c.scan().count() == 198
    assert c.get(5) is None and c.get(7) is not None


def test_delete_all_rows_leaves_empty_scannable_collection(spark, tmp_path):
    cat = CollectionCatalog(spark, str(tmp_path))
    c = cat.create("wipe", dim=2, n_buckets=4)
    c.insert(_df(spark, [(1, [0.0, 0.0], "a"), (2, [1.0, 1.0], "b")]))
    c.delete(F.col("id") >= 1)
    got = c.scan()
    assert got.count() == 0
    assert set(got.columns) == {"id", "embedding", "name"}


def test_catalog_concurrent_writers_lose_no_update(spark, tmp_path):
    # ≅ the reference's 10-thread concurrent registry test
    # (src/core/index/faiss_index.rs:241-287): every create must survive
    # concurrent read-modify-write on the shared catalog file.
    from concurrent.futures import ThreadPoolExecutor

    cat = CollectionCatalog(spark, str(tmp_path))

    def make(i: int) -> None:
        CollectionCatalog(spark, str(tmp_path)).create(f"c{i:02d}", dim=2)

    with ThreadPoolExecutor(max_workers=10) as pool:
        list(pool.map(make, range(10)))
    assert cat.list() == [f"c{i:02d}" for i in range(10)]


def test_docstore_schemaless_roundtrip(spark, tmp_path):
    from vector_db_spark.operators.collections import DocumentStore

    store = DocumentStore(spark, str(tmp_path / "docs"), n_buckets=4)
    docs = spark.createDataFrame(
        [
            (1, '{"kind": "a", "n": 3, "nested": {"x": 1}}'),
            (2, '{"kind": "b"}'),
            (3, '[1, 2, 3]'),  # non-object values are legal (schemaless)
        ],
        "id long, doc string",
    )
    store.put(docs)
    assert store.get(2).doc == '{"kind": "b"}'
    got = {r.id: (r.kind, r.x) for r in store.extract(kind="$.kind", x="$.nested.x").collect()}
    assert got == {1: ("a", "1"), 2: ("b", None), 3: (None, None)}
    typed = {r.id: r.n for r in store.typed("kind string, n long").collect()}
    assert typed[1] == 3 and typed[2] is None
    # overwrite-whole-doc semantics (vector_database.rs:76-79)
    store.put(spark.createDataFrame([(2, '{"kind": "z"}')], "id long, doc string"))
    assert store.scan().count() == 3
    assert store.get(2).doc == '{"kind": "z"}'
    # keyed delete
    store.delete(spark.createDataFrame([(1,)], "id long"))
    assert sorted(r.id for r in store.scan().collect()) == [2, 3]


def test_docstore_validation_and_restart(spark, tmp_path):
    from vector_db_spark.operators.collections import DocumentStore

    store = DocumentStore(spark, str(tmp_path / "d2"), n_buckets=4)
    with pytest.raises(ValueError, match="exactly columns"):
        store.put(spark.createDataFrame([(1, "x", "y")], "id long, doc string, extra string"))
    with pytest.raises(Exception, match="must be >= 1"):
        store.put(spark.createDataFrame([(0, "{}")], "id long, doc string"))
    store.put(spark.createDataFrame([(5, '{"a": 1}')], "id long, doc string"))
    # restart: a new handle on the same root sees the data
    again = DocumentStore(spark, str(tmp_path / "d2"))
    assert again.get(5).doc == '{"a": 1}'
    assert again._store_n_buckets == 4


def test_time_travel_scan_at(spark, catalog):
    coll = catalog.create("tt", dim=2, n_buckets=4)
    coll.insert(
        spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
            "id long, embedding array<float>",
        )
    )  # v1
    coll.delete(spark.createDataFrame([(2,)], "id long"))  # v2
    coll.upsert(
        spark.createDataFrame([(3, [9.0, 9.0])], "id long, embedding array<float>")
    )  # v3
    assert coll.versions() == [1, 2, 3]
    v1 = {r.id: list(r.embedding) for r in coll.scan_at(1).collect()}
    assert v1 == {1: [1.0, 0.0], 2: [0.0, 1.0], 3: [1.0, 1.0]}
    v2 = {r.id: list(r.embedding) for r in coll.scan_at(2).collect()}
    assert set(v2) == {1, 3} and v2[3] == [1.0, 1.0]
    live = {r.id: list(r.embedding) for r in coll.scan().collect()}
    assert set(live) == {1, 3} and live[3] == [9.0, 9.0]
    with pytest.raises(ValueError, match="version 9"):
        coll.scan_at(9)


def test_diff_reports_only_real_changes(spark, catalog):
    coll = catalog.create("dif", dim=2, n_buckets=4)
    coll.insert(
        spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
            "id long, embedding array<float>",
        )
    )  # v1
    coll.delete(spark.createDataFrame([(2,)], "id long"))  # v2
    coll.upsert(
        spark.createDataFrame([(3, [9.0, 9.0])], "id long, embedding array<float>")
    )  # v3
    coll.insert(
        spark.createDataFrame([(7, [5.0, 5.0])], "id long, embedding array<float>")
    )  # v4
    got = {r.id: r.change for r in coll.diff(1).collect()}
    assert got == {2: "removed", 3: "changed", 7: "added"}  # id 1 silent
    # v1 vs v2: only the delete
    assert {r.id: r.change for r in coll.diff(1, 2).collect()} == {2: "removed"}
    # identical snapshots diff to empty
    assert coll.diff(2, 2).count() == 0


def test_vacuum_reclaims_unreachable_versions(spark, catalog):
    import os

    coll = catalog.create("vac", dim=2, n_buckets=4)
    coll.insert(
        spark.createDataFrame(
            [(i, [float(i), 0.0]) for i in range(1, 9)],
            "id long, embedding array<float>",
        )
    )  # v1
    coll.upsert(
        spark.createDataFrame([(1, [9.0, 9.0])], "id long, embedding array<float>")
    )  # v2 rewrites only id 1's bucket
    coll.upsert(
        spark.createDataFrame([(1, [8.0, 8.0])], "id long, embedding array<float>")
    )  # v3 rewrites id 1's bucket AGAIN -> v2's dir becomes unreachable
    live_before = {r.id: list(r.embedding) for r in coll.scan().collect()}
    deleted = coll.vacuum(retain_last=1)
    # v1 survives DESPITE retain_last=1: v3's manifest still points the
    # untouched buckets at v1's dirs (bucket sharing => reachability, not
    # age); v2 holds only the superseded copy of id 1's bucket and goes
    assert 1 not in deleted
    assert deleted == [2]
    assert not os.path.isdir(coll._vdir(2))
    # live scan identical after GC
    assert {r.id: list(r.embedding) for r in coll.scan().collect()} == live_before
    # a vacuumed snapshot is no longer time-travelable
    for v in deleted:
        import pytest as _pytest

        with _pytest.raises(ValueError):
            coll.scan_at(v)
    # retained snapshot still reconstructs
    assert coll.scan_at(3).count() == 8
    # idempotent
    assert coll.vacuum(retain_last=1) == []


def test_reader_snapshot_isolation_across_writes(spark, catalog):
    # a DataFrame captured before a mutation keeps reading ITS snapshot:
    # scan() resolves the manifest eagerly to concrete file paths, and
    # version dirs are immutable (until vacuum), so lazy evaluation after
    # a concurrent upsert still sees the old state
    coll = catalog.create("iso", dim=2, n_buckets=4)
    coll.insert(
        spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [2.0, 0.0])], "id long, embedding array<float>"
        )
    )
    reader = coll.scan()  # pinned to v1's files
    coll.upsert(
        spark.createDataFrame([(1, [9.0, 9.0])], "id long, embedding array<float>")
    )
    old = {r.id: list(r.embedding) for r in reader.collect()}  # evaluated NOW
    assert old[1] == [1.0, 0.0]  # unaffected by the concurrent upsert
    assert {r.id: list(r.embedding) for r in coll.scan().collect()}[1] == [9.0, 9.0]


def test_collection_compressed_index_types(spark, tmp_path):
    """ivfpq/ivfsq as first-class collection index types (factory parity:
    the reference dispatches every backend through one registry,
    src/core/index_factory.rs:75-163). Exhaustive configs must reproduce
    exact kNN through the catalog dispatch."""
    from vector_db_spark.operators.collections import CollectionCatalog
    from vector_db_spark.operators.knn import knn

    cat = CollectionCatalog(spark, str(tmp_path))
    df = _vec_df(spark)
    qv = [0.0] * 8
    want = [r.id for r in knn(df, qv, 5, id_col="id").collect()]

    pq = cat.create("p", dim=8, metric="l2", index_type="ivfpq")
    pq.insert(df)
    pq.build_index(nlist=4, m=4, ksub=16, max_iter=5)
    got = [r.id for r in pq.search(qv, 5, nprobe=4, shortlist=10_000).collect()]
    assert got == want

    sq = cat.create("s", dim=8, metric="l2", index_type="ivfsq")
    sq.insert(df)
    sq.build_index(nlist=4, max_iter=5)
    got = [r.id for r in sq.search(qv, 5, nprobe=4, shortlist=10_000).collect()]
    assert got == want

    # ivfopq: rotated compressed layout; the catalog injects the raw
    # snapshot as the rerank frame (the stored vectors are rotated)
    oq = cat.create("o", dim=8, metric="l2", index_type="ivfopq")
    oq.insert(df)
    oq.build_index(nlist=4, m=4, ksub=16, max_iter=5, pq_iters=4, opq_iters=3)
    got = [r.id for r in oq.search(qv, 5, nprobe=4, shortlist=10_000).collect()]
    assert got == want
    # batch path through the same dispatch
    queries = df.limit(2).select(
        F.col("id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    from vector_db_spark.operators.knn import batch_knn

    bwant = [
        (r.query_id, r.id, r.rank)
        for r in batch_knn(df, queries, 3, id_col="id")
        .orderBy("query_id", "rank")
        .collect()
    ]
    bgot = [
        (r.query_id, r.id, r.rank)
        for r in oq.search_batch(queries, 3, nprobe=4, shortlist=10_000)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert bgot == bwant
    # incremental refresh through the rotated append path
    extra = _vec_df(spark, n=130).filter(F.col("id") > 100)
    oq.insert(extra)
    assert oq.refresh_index(
        nlist=4, m=4, ksub=16, max_iter=5, pq_iters=4, opq_iters=3
    ) == "incremental"
    want2 = [r.id for r in knn(oq.scan(), qv, 5, id_col="id").collect()]
    got2 = [r.id for r in oq.search(qv, 5, nprobe=4, shortlist=10_000).collect()]
    assert got2 == want2

    # metric validation at build time
    bad = cat.create("bad_pq", dim=8, metric="cosine", index_type="ivfpq")
    bad.insert(df)
    with pytest.raises(ValueError, match="l2"):
        bad.build_index(nlist=4)


def test_collection_graph_ip_metric(spark, tmp_path):
    """graph index_type now serves metric='ip' through the catalog (the
    reference's usearch IP HNSW, src/core/index_factory.rs:133-140)."""
    from vector_db_spark.operators.collections import CollectionCatalog
    from vector_db_spark.operators.knn import knn

    cat = CollectionCatalog(spark, str(tmp_path))
    coll = cat.create("gip", dim=8, metric="ip", index_type="graph")
    df = _vec_df(spark)
    coll.insert(df)
    coll.build_index(nlist=2, m=8, ef_construction=50, max_iter=5)
    got = [r.id for r in coll.search([1.0] * 8, 5, nprobe=2, ef_search=10**6).collect()]
    want = [r.id for r in knn(df, [1.0] * 8, 5, metric="ip", id_col="id").collect()]
    assert got == want


def test_collection_search_batch_dispatch(spark, tmp_path):
    """search_batch routes every index_type; exhaustive configs must
    equal exact batch kNN through the catalog."""
    from pyspark.sql import functions as F

    from vector_db_spark.operators.collections import CollectionCatalog
    from vector_db_spark.operators.knn import batch_knn

    cat = CollectionCatalog(spark, str(tmp_path))
    df = _vec_df(spark)
    queries = df.filter(F.col("id") <= 3).select(
        F.col("id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    def want(frame):
        return [
            (r.query_id, r.id, r.rank)
            for r in batch_knn(frame, queries, 4, id_col="id")
            .orderBy("query_id", "rank")
            .collect()
        ]

    exact = cat.create("be", dim=8, metric="l2", index_type="exact")
    exact.insert(df)
    got = [
        (r.query_id, r.id, r.rank)
        for r in exact.search_batch(queries, 4).orderBy("query_id", "rank").collect()
    ]
    assert got == want(df)

    ivf = cat.create("bi", dim=8, metric="l2", index_type="ivf")
    ivf.insert(df)
    ivf.build_index(nlist=4, max_iter=5)
    got = [
        (r.query_id, r.id, r.rank)
        for r in ivf.search_batch(queries, 4, nprobe=4)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert got == want(df)

    sq = cat.create("bs", dim=8, metric="l2", index_type="ivfsq")
    sq.insert(df)
    sq.build_index(nlist=4, max_iter=5)
    got = [
        (r.query_id, r.id, r.rank)
        for r in sq.search_batch(queries, 4, nprobe=4, shortlist=10_000)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert got == want(df)

    # staleness contract holds for the batch path too
    ivf.upsert(df.limit(1))
    import pytest as _pt

    with _pt.raises(ValueError, match="rebuild"):
        ivf.search_batch(queries, 4)


def test_refresh_index_incremental_and_rebuild_paths(spark, tmp_path):
    """refresh_index applies append/retire deltas through the index's own
    lifecycle (no full rebuild); changed rows force a rebuild (tombstone
    re-append contract); results always equal exact kNN over the live
    snapshot."""
    from pyspark.sql import functions as F

    from vector_db_spark.operators.collections import CollectionCatalog
    from vector_db_spark.operators.knn import knn

    cat = CollectionCatalog(spark, str(tmp_path))
    coll = cat.create("r", dim=8, metric="l2", index_type="ivf")
    df = _vec_df(spark, n=80)
    coll.insert(df.filter(F.col("id") <= 60))
    coll.build_index(nlist=4, max_iter=5)
    assert coll.refresh_index(nlist=4, max_iter=5) == "fresh"

    # append-only delta -> incremental
    coll.insert(df.filter(F.col("id") > 60))
    assert coll.refresh_index(nlist=4, max_iter=5) == "incremental"
    qv = [0.0] * 8
    got = [r.id for r in coll.search(qv, 5, nprobe=4).collect()]
    want = [r.id for r in knn(coll.scan(), qv, 5, id_col="id").collect()]
    assert got == want

    # retire-only delta -> incremental (tombstones)
    coll.delete(F.col("id") % 9 == 0)
    assert coll.refresh_index(nlist=4, max_iter=5) == "incremental"
    got = [r.id for r in coll.search(qv, 5, nprobe=4).collect()]
    want = [r.id for r in knn(coll.scan(), qv, 5, id_col="id").collect()]
    assert got == want

    # changed rows -> rebuild
    coll.upsert(
        df.filter(F.col("id") == 2).withColumn(
            "embedding", F.expr("transform(embedding, x -> float(x * 2.0))")
        )
    )
    assert coll.refresh_index(nlist=4, max_iter=5) == "rebuilt"
    got = [r.id for r in coll.search(qv, 5, nprobe=4).collect()]
    want = [r.id for r in knn(coll.scan(), qv, 5, id_col="id").collect()]
    assert got == want


def test_refresh_index_delete_then_reinsert_rebuilds(spark, tmp_path):
    """A delete at refresh N followed by a re-insert of the same id shows
    up only as 'added' at refresh N+1 — but the id is still in the
    persisted tombstone manifest, so an append would leave the fresh copy
    dead (silently missing from search).  Resurrected ids must force a
    rebuild (ADVICE r4)."""
    from pyspark.sql import functions as F

    from vector_db_spark.operators.collections import CollectionCatalog
    from vector_db_spark.operators.knn import knn

    cat = CollectionCatalog(spark, str(tmp_path))
    coll = cat.create("rr", dim=8, metric="l2", index_type="ivf")
    df = _vec_df(spark, n=60)
    coll.insert(df)
    coll.build_index(nlist=4, max_iter=5)

    # refresh N: retire id 7 (tombstone persisted)
    coll.delete(F.col("id") == 7)
    assert coll.refresh_index(nlist=4, max_iter=5) == "incremental"

    # refresh N+1: the SAME id comes back — diff says only 'added'
    coll.insert(df.filter(F.col("id") == 7))
    assert coll.refresh_index(nlist=4, max_iter=5) == "rebuilt"

    # id 7 must be servable again
    qrow = df.filter(F.col("id") == 7).select("embedding").head()
    qv = [float(x) for x in qrow[0]]
    got = [r.id for r in coll.search(qv, 3, nprobe=4).collect()]
    want = [r.id for r in knn(coll.scan(), qv, 3, id_col="id").collect()]
    assert got == want
    assert 7 in got


def test_refresh_index_graph_family(spark, tmp_path):
    from pyspark.sql import functions as F

    from vector_db_spark.operators.collections import CollectionCatalog
    from vector_db_spark.operators.knn import knn

    cat = CollectionCatalog(spark, str(tmp_path))
    coll = cat.create("rg", dim=8, metric="l2", index_type="graph")
    df = _vec_df(spark, n=60)
    coll.insert(df.filter(F.col("id") <= 40))
    coll.build_index(nlist=2, m=8, ef_construction=100, max_iter=5)
    coll.insert(df.filter(F.col("id") > 40))
    assert coll.refresh_index() == "incremental"
    qv = [0.0] * 8
    got = [r.id for r in coll.search(qv, 5, nprobe=2, ef_search=10**6).collect()]
    want = [r.id for r in knn(coll.scan(), qv, 5, id_col="id").collect()]
    assert got == want


# ---------------------------------------------------------------------------
# Multi-vector (MaxSim) collections through the catalog — the one-factory
# parity item (every backend through one registry dispatch,
# src/core/index_factory.rs:75-163), extended to the PLAID families.
# ---------------------------------------------------------------------------


def _doc_df(spark, n_docs=10, n_tok=3, dim=8, seed=7):
    import numpy as np

    rng = np.random.RandomState(seed)
    data = [
        (
            d + 1,
            [[float(x) for x in rng.normal(size=dim)] for _ in range(n_tok)],
        )
        for d in range(n_docs)
    ]
    return spark.createDataFrame(data, "id long, embedding array<array<float>>")


def _ms_exact(coll, toks, k):
    from vector_db_spark.operators.late_interaction import maxsim_search

    rows = maxsim_search(
        coll._exploded(coll.scan()), toks, k, doc_col="id", vec_col="embedding"
    ).collect()
    return [(r.id, round(r.maxsim_score, 9)) for r in rows]


@pytest.mark.parametrize("itype", ["maxsim", "maxsim_pq"])
def test_collection_maxsim_lifecycle(spark, tmp_path, itype):
    """create → validated doc insert → build → dispatch search/search_batch
    at lossless settings ≡ exact MaxSim; then append + retire docs and
    refresh_index must go incremental and stay exact."""
    cat = CollectionCatalog(spark, str(tmp_path / itype))
    coll = cat.create("c", dim=8, metric="ip", index_type=itype)
    docs = _doc_df(spark, n_docs=10)
    coll.insert(docs)
    params = (
        dict(nlist=4, max_iter=5)
        if itype == "maxsim"
        else dict(nlist=4, max_iter=5, m=4, ksub=8, pq_iters=4)
    )
    coll.build_index(**params)
    toks = [[float(i == j) for i in range(8)] for j in range(2)]
    got = [
        (r.id, round(r.score, 9))
        for r in coll.search(toks, 4, nprobe=4).collect()
    ]
    assert got == _ms_exact(coll, toks, 4)

    # batch dispatch: 2 queries of 2 tokens, per-query ranks
    qdf = spark.createDataFrame(
        [(q, t, toks[t]) for q in range(2) for t in range(2)],
        "query_id long, token_id int, token_vec array<float>",
    )
    rows = coll.search_batch(qdf, 3, nprobe=4).collect()
    assert {r.query_id for r in rows} == {0, 1}
    assert all(r.rank <= 3 for r in rows)

    # append + retire -> incremental refresh, still exact
    extra = _doc_df(spark, n_docs=14, seed=11).filter(F.col("id") > 10)
    coll.insert(extra)
    coll.delete(F.col("id") % 5 == 0)
    assert coll.refresh_index(**params) == "incremental"
    got2 = [
        (r.id, round(r.score, 9))
        for r in coll.search(toks, 4, nprobe=4).collect()
    ]
    assert got2 == _ms_exact(coll, toks, 4)


def test_collection_maxsim_validation(spark, tmp_path):
    cat = CollectionCatalog(spark, str(tmp_path))
    # MaxSim is an inner-product score: other metrics are rejected
    with pytest.raises(ValueError, match="ip"):
        cat.create("bad", dim=8, metric="l2", index_type="maxsim")
    with pytest.raises(ValueError, match="ip"):
        cat.create("bad", dim=8, metric="cosine", index_type="maxsim_pq")
    coll = cat.create("ok", dim=4, metric="ip", index_type="maxsim")
    # a token with the wrong dim fails the plan-level write guard
    bad = spark.createDataFrame(
        [(1, [[1.0, 2.0, 3.0, 4.0], [1.0, 2.0]])],
        "id long, embedding array<array<float>>",
    )
    with pytest.raises(Exception, match="dim=4"):
        coll.insert(bad)
    # an empty token set is rejected too
    empty = spark.createDataFrame(
        [(1, [])], "id long, embedding array<array<float>>"
    )
    with pytest.raises(Exception, match="token"):
        coll.insert(empty)


def test_maxsim_range_rejects_explicit_shortlist(spark, tmp_path):
    """No-silent-drop on the multi-vector RANGE routes (ADVICE r12): an
    EXPLICIT shortlist kwarg — a top-k rerank knob with no meaning for
    range, which scores every probed candidate exactly — raises, while a
    PERSISTED shortlist operating point is ignored (range still serves),
    so tuned collections don't break."""
    cat = CollectionCatalog(spark, str(tmp_path))
    coll = cat.create("ms", dim=2, metric="ip", index_type="maxsim")
    coll.insert(spark.createDataFrame(
        [(1, [[1.0, 0.0]]), (2, [[0.0, 1.0], [1.0, 1.0]])],
        "id long, embedding array<array<float>>",
    ))
    q = [[1.0, 0.0]]
    with pytest.raises(ValueError, match="shortlist"):
        coll.range_search(q, 0.5, shortlist=8)
    qdf = spark.createDataFrame(
        [(0, 0, [1.0, 0.0])],
        "query_id long, token_id int, token_vec array<double>",
    )
    with pytest.raises(ValueError, match="shortlist"):
        coll.range_search_batch(qdf, 0.5, shortlist=8)
    coll.set_serving_params(shortlist=4)
    # both docs score max-dot 1.0 >= 0.5 → score desc, id asc ties
    got = [int(r.id) for r in coll.range_search(q, 0.5).collect()]
    assert got == [1, 2]
    got = [int(r.id) for r in coll.range_search_batch(qdf, 0.5).collect()]
    assert got == [1, 2]


def test_serving_params_persist_validate_and_apply(spark, tmp_path):
    """Tuning write-back loop: set_serving_params persists knobs in the
    catalog JSON (no version bump — serving config is not data), a fresh
    catalog instance reads them back, stored knobs reach the index
    search as defaults, and explicit caller kwargs still win."""
    from vector_db_spark.operators import ann
    from vector_db_spark.operators.collections import CollectionCatalog

    cat = CollectionCatalog(spark, str(tmp_path))
    coll = cat.create("tuned", dim=8, metric="l2", index_type="ivf")

    # whitelist + value validation (family-scoped, positive ints only)
    with pytest.raises(ValueError, match="unknown serving param"):
        coll.set_serving_params(ef_search=10)  # graph-only knob
    with pytest.raises(ValueError, match=">= 1"):
        coll.set_serving_params(nprobe=0)
    with pytest.raises(ValueError, match="integer"):
        coll.set_serving_params(nprobe="four")
    with pytest.raises(ValueError, match="integer"):
        coll.set_serving_params(nprobe=True)
    # exact collections take no knobs at all
    exact = cat.create("plain", dim=8, metric="l2", index_type="exact")
    with pytest.raises(ValueError, match="unknown serving param"):
        exact.set_serving_params(nprobe=2)

    coll.insert(_vec_df(spark))
    coll.build_index(nlist=4, max_iter=5)
    v_before = coll.info.version
    coll.set_serving_params(nprobe=2)
    assert coll.info.version == v_before  # no snapshot churn
    # search must NOT demand a rebuild after a knob change
    assert len(coll.search([0.0] * 8, 3).collect()) == 3

    # durable: a brand-new catalog instance reads the stored knobs
    again = CollectionCatalog(spark, str(tmp_path)).get("tuned")
    assert again.info.serving_params == {"nprobe": 2}

    # stored knob reaches the engine; explicit kwarg overrides it
    seen: dict = {}
    orig = ann.IvfIndex.search

    def spy(self, query, k, **kw):
        seen.update(kw)
        return orig(self, query, k, **kw)

    ann.IvfIndex.search = spy
    try:
        again.search([0.0] * 8, 3).collect()
        assert seen["nprobe"] == 2
        seen.clear()
        again.search([0.0] * 8, 3, nprobe=4).collect()
        assert seen["nprobe"] == 4
    finally:
        ann.IvfIndex.search = orig


def test_serving_params_feed_api_defaults(spark, tmp_path):
    """The request facade serves at the collection's persisted operating
    point: stored knobs override the wire's family defaults, and a
    request-level "params" object still overrides both."""
    from vector_db_spark.api import VectorDatabaseApi

    api = VectorDatabaseApi(spark, str(tmp_path))
    key = {"index_type": "USEARCH", "dim": 3, "metric_type": "L2"}
    api.create_index(key)
    for i, v in [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0]),
                 (3, [0.9, 0.1, 0.0])]:
        api.insert({"vectors": v, "id": i, "index_key": key})

    coll = api._collection(key)
    coll.set_serving_params(nprobe=3)

    from vector_db_spark.operators import ann
    seen: dict = {}
    orig = ann.IvfIndex.search

    def spy(self, query, k, **kw):
        seen.update(kw)
        return orig(self, query, k, **kw)

    ann.IvfIndex.search = spy
    try:
        res = api.search({"vectors": [1.0, 0.0, 0.0], "k": 2, "index_key": key})
        assert res["code"] == 0 and seen["nprobe"] == 3
        seen.clear()
        res = api.search({"vectors": [1.0, 0.0, 0.0], "k": 2, "index_key": key,
                          "params": {"nprobe": 1}})
        assert res["code"] == 0 and seen["nprobe"] == 1
    finally:
        ann.IvfIndex.search = orig


def test_build_params_remembered_for_refresh(spark, tmp_path):
    """build_index records its knobs in the catalog (the reference's
    IndexKey carries its config — index_factory.rs:24-36): a no-arg
    refresh_index() rebuild reuses them, a fresh catalog handle sees
    them, and explicit kwargs win and become the new record."""
    from vector_db_spark.operators.ann import IvfIndex
    from vector_db_spark.operators.collections import CollectionCatalog

    cat = CollectionCatalog(spark, str(tmp_path))
    coll = cat.create("bp", dim=8, metric="l2", index_type="ivf")
    coll.insert(_vec_df(spark))
    coll.build_index(nlist=8, max_iter=5)
    assert coll.info.build_params == {"nlist": 8, "max_iter": 5}

    # durable across handles
    again = CollectionCatalog(spark, str(tmp_path)).get("bp")
    assert again.info.build_params == {"nlist": 8, "max_iter": 5}

    # a CHANGED row forces a rebuild inside a no-arg refresh — the
    # rebuild must reuse the recorded nlist, not the build() default
    again.upsert(
        spark.createDataFrame(
            [(1, [9.0] * 8)], "id long, embedding array<float>"
        )
    )
    assert again.refresh_index() == "rebuilt"
    idx = IvfIndex.load(spark, again._index_dir())
    assert len(idx.centroids) == 8
    assert len(again.search([0.0] * 8, 3, nprobe=8).collect()) == 3

    # explicit kwargs override and become the new record
    again.upsert(
        spark.createDataFrame(
            [(2, [7.0] * 8)], "id long, embedding array<float>"
        )
    )
    assert again.refresh_index(nlist=4, max_iter=5) == "rebuilt"
    assert again.info.build_params == {"nlist": 4, "max_iter": 5}
    assert len(IvfIndex.load(spark, again._index_dir()).centroids) == 4


def test_build_params_dropped_marker_and_refresh_warning(spark, tmp_path):
    """Non-JSON build knobs (a shared quantizer object) can't be
    recorded: build_index warns and records WHICH keys were dropped, and
    a later no-arg refresh_index() warns that its replay is partial
    instead of silently retraining the shared fit (ADVICE r9)."""
    import pytest as _pt

    from vector_db_spark.operators.ann import IvfIndex
    from vector_db_spark.operators.collections import CollectionCatalog

    cat = CollectionCatalog(spark, str(tmp_path))
    coll = cat.create("bpd", dim=8, metric="l2", index_type="ivfpq")
    coll.insert(_vec_df(spark))
    shared = IvfIndex.build(
        coll.scan(), nlist=2, max_iter=3, id_col="id", vec_col="embedding"
    )
    with _pt.warns(UserWarning, match="not JSON-serializable"):
        coll.build_index(nlist=2, m=2, ksub=4, max_iter=3, pq_iters=2, ivf=shared)
    assert coll.info.build_params_dropped == ["ivf"]
    assert "ivf" not in coll.info.build_params
    # durable across handles
    again = CollectionCatalog(spark, str(tmp_path)).get("bpd")
    assert again.info.build_params_dropped == ["ivf"]
    # a no-op refresh stays SILENT (nothing rebuilds, nothing retrains) —
    # only an actual rebuild warns, so a nightly cron isn't trained to
    # ignore the one warning that matters
    import warnings as _w

    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        assert again.refresh_index() == "fresh"
    assert not [c for c in caught if "NOT replayed" in str(c.message)]
    # a CHANGED row forces a rebuild inside the no-arg refresh -> warns
    again.upsert(
        spark.createDataFrame(
            [(1, [5.0] * 8)], "id long, embedding array<float>"
        )
    )
    with _pt.warns(UserWarning, match="NOT replayed"):
        assert again.refresh_index() == "rebuilt"
    # a fully-serializable rebuild clears the marker. NB: must rebuild
    # through a CURRENT handle — `coll` predates the upsert above, so
    # its build would lose the publish race and (correctly, since the
    # ADVICE-r13 fix) be discarded WITHOUT touching the recorded params.
    with _pt.warns(UserWarning, match="superseded by a newer"):
        coll.build_index(nlist=2, m=2, ksub=4, max_iter=3, pq_iters=2)
    assert coll.info.build_params_dropped == ["ivf"]  # discard didn't write
    fresh = CollectionCatalog(spark, str(tmp_path)).get("bpd")
    fresh.build_index(nlist=2, m=2, ksub=4, max_iter=3, pq_iters=2)
    assert fresh.info.build_params_dropped == []


def test_predicate_delete_keeps_null_predicate_rows(spark, tmp_path):
    """DELETE WHERE semantics: rows where the predicate is NULL are KEPT
    (a bare ~p turned NULL into NULL and filter dropped the row)."""
    from vector_db_spark.operators.collections import delete_rows

    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "y")], "id long, tag string"
    )
    left = delete_rows(df, F.col("tag") == "x")
    assert sorted(r.id for r in left.collect()) == [2, 3]


def test_concurrent_upserts_lose_nothing(spark, tmp_path):
    """Two writers over the same collection must serialize on the
    mutation lock: both versions commit, no bucket files are clobbered
    (previously both allocated v(N+1) and the second overwrite silently
    destroyed the first's rows)."""
    from concurrent.futures import ThreadPoolExecutor

    from vector_db_spark.operators.collections import CollectionCatalog

    cat = CollectionCatalog(spark, str(tmp_path))
    cat.create("race", dim=4, metric="l2", index_type="exact")

    def write(i):
        # a FRESH handle per writer: each starts from its own (stale)
        # in-memory version, exactly the N-replica shape
        c = CollectionCatalog(spark, str(tmp_path)).get("race")
        c.upsert(
            spark.createDataFrame(
                [(i, [float(i)] * 4)], "id long, embedding array<float>"
            )
        )

    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(write, range(1, 9)))
    final = CollectionCatalog(spark, str(tmp_path)).get("race")
    got = sorted(r.id for r in final.scan().collect())
    assert got == list(range(1, 9))
    assert final.info.version == 8  # every mutation committed its own version


def test_versions_sort_numerically_past_padding(spark, tmp_path):
    """v1000000 sorts after v999999 numerically; lexicographic ordering
    would make vacuum retain the wrong snapshots and delete live data."""
    import json as _json
    import os as _os

    from vector_db_spark.operators.collections import CollectionCatalog

    cat = CollectionCatalog(spark, str(tmp_path))
    coll = cat.create("vsort", dim=4, metric="l2", index_type="exact")
    coll.insert(
        spark.createDataFrame([(1, [0.0] * 4)], "id long, embedding array<float>")
    )
    for v in (999999, 1000000):
        d = _os.path.join(coll._store_dir, f"v{v}")
        _os.makedirs(d, exist_ok=True)
        with open(_os.path.join(d, "_manifest.json"), "w") as f:
            _json.dump({}, f)
    assert coll.versions()[-2:] == [999999, 1000000]


def test_refresh_index_explicit_kwargs_reconfigure(spark, tmp_path):
    """Explicit kwargs that differ from the recorded knobs force a full
    rebuild with them (and record them) even when the snapshot is fresh —
    the incremental path cannot apply new geometry."""
    from vector_db_spark.operators.ann import IvfIndex
    from vector_db_spark.operators.collections import CollectionCatalog

    cat = CollectionCatalog(spark, str(tmp_path))
    coll = cat.create("reconf", dim=8, metric="l2", index_type="ivf")
    coll.insert(_vec_df(spark))
    coll.build_index(nlist=8, max_iter=5)
    # fresh snapshot + same knobs -> nothing to do
    assert coll.refresh_index(nlist=8, max_iter=5) == "fresh"
    # fresh snapshot + NEW knobs -> reconfiguration rebuild
    assert coll.refresh_index(nlist=4, max_iter=5) == "rebuilt"
    assert len(IvfIndex.load(spark, coll._index_dir()).centroids) == 4
    assert coll.info.build_params == {"nlist": 4, "max_iter": 5}


def test_collection_range_search_all_families(spark, tmp_path):
    """Collection.range_search routes by index_type: exact + IVF are
    value-exact; graph/lsh at saturating coverage equal the exact scan;
    compressed families serve range exactly from the raw vectors (no
    staleness check needed — quantized distances cannot bound true
    distances losslessly). Staleness and multi-vector contracts hold."""
    from pyspark.sql import functions as F

    from vector_db_spark.operators.collections import CollectionCatalog
    from vector_db_spark.operators.knn import range_search as exact_range

    cat = CollectionCatalog(spark, str(tmp_path))
    df = _vec_df(spark)
    thr = 12.0
    want = None

    cases = [
        ("exact", {}, {}),
        ("ivf", {"nlist": 4, "max_iter": 5}, {}),
        ("graph", {"nlist": 2, "m": 8, "ef_construction": 100},
         {"nprobe": 2, "ef_search": 10**6}),
        ("ivfpq", {"nlist": 4, "m": 4, "ksub": 16, "max_iter": 5}, {}),
    ]
    for kind, build, knobs in cases:
        coll = cat.create(f"rs_{kind}", dim=8, metric="l2", index_type=kind)
        coll.insert(df)
        if kind != "exact":
            coll.build_index(**build)
        got = [
            (r.id, round(r.distance, 6))
            for r in coll.range_search([0.0] * 8, thr, **knobs).collect()
        ]
        if want is None:
            want = [
                (r.id, round(r.distance, 6))
                for r in exact_range(df, [0.0] * 8, thr, id_col="id").collect()
            ]
            assert len(want) > 0
        assert got == want, kind
    # lsh is the cosine family: full probe == exact cosine range
    clsh = cat.create("rs_lsh", dim=8, metric="cosine", index_type="lsh")
    clsh.insert(df)
    clsh.build_index(n_bits=3, n_tables=2)
    qv = [1.0] + [0.0] * 7
    got_l = [
        (r.id, round(r.score, 6))
        for r in clsh.range_search(qv, 0.2, probe_radius=3).collect()
    ]
    want_l = [
        (r.id, round(r.score, 6))
        for r in exact_range(df, qv, 0.2, metric="cosine", id_col="id").collect()
    ]
    assert got_l == want_l and len(want_l) > 0
    # predicate composes (exact family representative)
    pred = F.col("id") % 2 == 0
    c0 = cat.get("rs_exact")
    gp = {r.id for r in c0.range_search([0.0] * 8, thr, predicate=pred).collect()}
    assert gp == {i for i, _ in want if i % 2 == 0}
    # staleness: an index-backed family refuses after mutation
    civf = cat.get("rs_ivf")
    civf.upsert(df.limit(1).select("id", "embedding"))
    import pytest as _pt

    with _pt.raises(ValueError, match="rebuild"):
        civf.range_search([0.0] * 8, thr)
    # ...but the raw-scan families keep serving (fresh snapshot)
    cpq = cat.get("rs_ivfpq")
    cpq.upsert(df.limit(1).select("id", "embedding"))
    assert len(cpq.range_search([0.0] * 8, thr).collect()) == len(want)
    # multi-vector collections now serve range too (round 12) — an EMPTY
    # one still errors loudly like every family
    mv = cat.create("rs_mv", dim=4, metric="ip", index_type="maxsim")
    with _pt.raises(ValueError, match="empty"):
        mv.range_search([[0.0] * 4], 0.5)


def test_compressed_range_search_coarse_cell_pruning(spark, tmp_path):
    """VERDICT r11 #4: fresh ivfpq/ivfsq/ivfopq collections answer range
    from O(surviving coarse cells), not O(corpus) — a localized query
    prunes cells (strictly fewer than nlist) while staying value-exact
    against the raw-scan oracle; the per-cell radii persist keyed by the
    indexed version and auto-invalidate on rebuild."""
    import json
    import os

    from vector_db_spark.operators.collections import CollectionCatalog
    from vector_db_spark.operators.knn import range_search as exact_range

    import numpy as np

    cat = CollectionCatalog(spark, str(tmp_path))
    # well-separated clusters so a localized query provably prunes: 8
    # blobs at 20*e_k, unit noise — KMeans recovers them, covering radii
    # stay far below the inter-blob distance
    rng = np.random.RandomState(3)
    data = [
        (i + 1,
         [float(x + (20.0 if d == i % 8 else 0.0))
          for d, x in enumerate(rng.normal(size=8))])
        for i in range(200)
    ]
    df = spark.createDataFrame(data, "id long, embedding array<float>")
    # a member vector, tight radius: matches live in few cells
    qrow = df.filter(F.col("id") == 7).head()
    q = [float(x) for x in qrow.embedding]
    builds = {
        "ivfpq": {"nlist": 8, "m": 4, "ksub": 16, "max_iter": 5},
        "ivfsq": {"nlist": 8, "max_iter": 5},
        "ivfopq": {"nlist": 8, "m": 4, "ksub": 16, "max_iter": 5},
    }
    for kind, build in builds.items():
        coll = cat.create(f"pr_{kind}", dim=8, metric="l2", index_type=kind)
        coll.insert(df)
        coll.build_index(**build)
        for thr in (4.0, 0.5):  # wide first; the pruning probe below
            # reads the LAST call (the tight radius)
            got = [
                (r.id, round(r.distance, 6))
                for r in coll.range_search(q, thr).collect()
            ]
            want = [
                (r.id, round(r.distance, 6))
                for r in exact_range(df, q, thr, id_col="id").collect()
            ]
            assert got == want and len(want) >= 1, (kind, thr)
        scanned, total = coll._last_range_cells
        assert scanned < total, (kind, "localized query must prune cells")
        # radii persisted, keyed by indexed version
        rpath = os.path.join(coll._index_dir(), "range_radii.json")
        with open(rpath) as f:
            data = json.load(f)
        assert data["version"] == coll._indexed_version()
        assert len(data["radii"]) == build["nlist"]
        # rebuild publishes a NEW artifact dir (round-13 immutable-index
        # contract: never overwrite a dir a concurrent reader may be
        # scanning) -> re-resolve the radii path; radii recompute lazily
        # keyed by the new indexed version
        coll.upsert(df.limit(1).select("id", "embedding"))
        coll.build_index(**build)
        coll.range_search(q, 0.5).collect()
        new_rpath = os.path.join(coll._index_dir(), "range_radii.json")
        assert new_rpath != rpath  # the artifact dir moved, by design
        with open(new_rpath) as f:
            assert json.load(f)["version"] == coll._indexed_version()


@pytest.mark.heavy
def test_collection_range_search_batch_all_families(spark, tmp_path):
    """Collection.range_search_batch routes every family's batched range
    probe through one catalog call: exact/ivf/compressed are value-exact
    vs the batched raw scan; graph (saturating) and lsh (full probe)
    coverage equal it too; staleness and multi-vector contracts match
    range_search."""
    from vector_db_spark.operators.collections import CollectionCatalog
    from vector_db_spark.operators.knn import batch_range_search

    cat = CollectionCatalog(spark, str(tmp_path))
    df = _vec_df(spark)
    queries = df.filter(F.col("id") <= 3).select(
        F.col("id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    thr = 4.0
    want = sorted(
        (r.query_id, r.id, round(r.distance, 6))
        for r in batch_range_search(
            df, queries, thr, id_col="id", vec_col="embedding"
        ).collect()
    )
    assert len(want) > 3  # at least the self-matches
    cases = [
        ("exact", {}, {}),
        ("ivf", {"nlist": 4, "max_iter": 5}, {}),
        ("graph", {"nlist": 2, "m": 8, "ef_construction": 100},
         {"nprobe": 2, "ef_search": 64}),
        ("ivfpq", {"nlist": 4, "m": 4, "ksub": 16, "max_iter": 5}, {}),
        ("ivfsq", {"nlist": 4, "max_iter": 5}, {}),
        ("ivfopq", {"nlist": 4, "m": 4, "ksub": 16, "max_iter": 5}, {}),
    ]
    for kind, build, knobs in cases:
        coll = cat.create(f"brs_{kind}", dim=8, metric="l2", index_type=kind)
        coll.insert(df)
        if kind != "exact":
            coll.build_index(**build)
        got = sorted(
            (r.query_id, r.id, round(r.distance, 6))
            for r in coll.range_search_batch(queries, thr, **knobs).collect()
        )
        assert got == want, kind
    # lsh (cosine family) at full probe == exact batched cosine range
    clsh = cat.create("brs_lsh", dim=8, metric="cosine", index_type="lsh")
    clsh.insert(df)
    clsh.build_index(n_bits=3, n_tables=2)
    got_l = sorted(
        (r.query_id, r.id, round(r.score, 6))
        for r in clsh.range_search_batch(queries, 0.2, probe_radius=3).collect()
    )
    want_l = sorted(
        (r.query_id, r.id, round(r.score, 6))
        for r in batch_range_search(
            df, queries, 0.2, metric="cosine", id_col="id", vec_col="embedding"
        ).collect()
    )
    assert got_l == want_l and len(want_l) > 0
    # staleness: index-backed family refuses after mutation
    civf = cat.get("brs_ivf")
    civf.upsert(df.limit(1).select("id", "embedding"))
    with pytest.raises(ValueError, match="rebuild"):
        civf.range_search_batch(queries, thr).collect()
    # compressed family keeps serving unpruned on a stale index
    cpq = cat.get("brs_ivfpq")
    cpq.upsert(df.limit(1).select("id", "embedding"))
    got_stale = sorted(
        (r.query_id, r.id, round(r.distance, 6))
        for r in cpq.range_search_batch(queries, thr).collect()
    )
    assert got_stale == want
    # multi-vector batch range is served too (round 12) — an EMPTY
    # collection still errors loudly like every family
    mv = cat.create("brs_mv", dim=4, metric="ip", index_type="maxsim")
    with pytest.raises(ValueError, match="empty"):
        mv.range_search_batch(queries, 0.5)


def _ms_exact_range(coll, toks, thr):
    from vector_db_spark.operators.late_interaction import maxsim_range_search

    rows = maxsim_range_search(
        coll._exploded(coll.scan()), toks, thr, doc_col="id",
        vec_col="embedding",
    ).collect()
    return [(r.id, round(r.maxsim_score, 9)) for r in rows]


@pytest.mark.parametrize("itype", ["maxsim", "maxsim_pq"])
def test_collection_maxsim_range_lifecycle(spark, tmp_path, itype):
    """Range on multi-vector collections (round 12): stale or absent
    index serves the exact scan over the collection's own token rows
    (always-fresh, the compressed-family precedent); a fresh index
    serves the probed range, and full probe == exact. Batch matches
    single per query."""
    cat = CollectionCatalog(spark, str(tmp_path / itype))
    coll = cat.create("c", dim=8, metric="ip", index_type=itype)
    coll.insert(_doc_df(spark, n_docs=10))
    toks = [[float(i == j) for i in range(8)] for j in range(2)]

    # threshold strictly between the 4th and 5th exact scores
    ranked = _ms_exact(coll, toks, 5)
    thr = (ranked[3][1] + ranked[4][1]) / 2.0
    want = _ms_exact_range(coll, toks, thr)
    assert [d for d, _ in want] == [d for d, _ in ranked[:4]]

    # absent index -> exact scan arm
    got = [
        (r.id, round(r.score, 9))
        for r in coll.range_search(toks, thr).collect()
    ]
    assert got == want

    params = (
        dict(nlist=4, max_iter=5)
        if itype == "maxsim"
        else dict(nlist=4, max_iter=5, m=4, ksub=8, pq_iters=4)
    )
    coll.build_index(**params)
    # fresh index -> probed arm; full probe == exact
    got = [
        (r.id, round(r.score, 9))
        for r in coll.range_search(toks, thr, nprobe=4).collect()
    ]
    assert got == want
    # probed arm at nprobe=1: exact subset
    sub = [
        (r.id, round(r.score, 9))
        for r in coll.range_search(toks, thr, nprobe=1).collect()
    ]
    assert set(sub) <= set(want)

    # batch, probed: 2 queries (the two single tokens), per-query == single
    qdf = spark.createDataFrame(
        [(q, 0, toks[q]) for q in range(2)],
        "query_id long, token_id int, token_vec array<float>",
    )
    singles = []
    for q in range(2):
        singles += [
            (q, r.id, round(r.score, 9))
            for r in coll.range_search([toks[q]], thr / 2, nprobe=4).collect()
        ]
    rows = coll.range_search_batch(qdf, thr / 2, nprobe=4).collect()
    assert [(int(r.query_id), r.id, round(r.score, 9)) for r in rows] == singles

    # mutate -> stale index -> range falls back to the exact scan and
    # sees the NEW snapshot (always-fresh contract)
    coll.insert(_doc_df(spark, n_docs=14, seed=11).filter(F.col("id") > 10))
    want2 = _ms_exact_range(coll, toks, thr)
    got2 = [
        (r.id, round(r.score, 9))
        for r in coll.range_search(toks, thr).collect()
    ]
    assert got2 == want2
    rows2 = coll.range_search_batch(qdf, thr / 2).collect()
    singles2 = []
    for q in range(2):
        singles2 += [
            (q, r.id, round(r.score, 9))
            for r in coll.range_search([toks[q]], thr / 2).collect()
        ]
    assert [(int(r.query_id), r.id, round(r.score, 9)) for r in rows2] == singles2


def test_index_artifact_gc_removes_only_strictly_older_builds(spark, tmp_path):
    """Retention maintenance for the round-13 immutable-index publish:
    rebuilds leave superseded dirs on disk (by design — a concurrent
    reader may still be scanning them); gc_index_artifacts deletes only
    artifacts STRICTLY older than the published version, never an
    in-flight (>= current version, unpublished) staging dir, and serving
    still works from the surviving artifact."""
    import os

    cat = CollectionCatalog(spark, str(tmp_path))
    coll = cat.create("gci", dim=4, metric="l2", index_type="ivf")
    df = spark.createDataFrame(
        [(i, [float(i), 0.0, 0.0, 1.0]) for i in range(1, 21)],
        "id long, embedding array<float>",
    )
    coll.insert(df)
    coll.build_index(nlist=2, seed=42, max_iter=3)
    first_dir = coll._index_dir()
    # mutate + rebuild -> a NEW published dir; the old one stays on disk
    coll.upsert(spark.createDataFrame(
        [(1, [9.0, 9.0, 9.0, 9.0])], "id long, embedding array<float>"
    ))
    coll.build_index(nlist=2, seed=42, max_iter=3)
    second_dir = coll._index_dir()
    assert second_dir != first_dir and os.path.isdir(first_dir)

    # a racing builder's unpublished staging dir must survive GC — even
    # one whose snapshot was SUPERSEDED mid-build (version strictly
    # below current: the case version arithmetic can't protect, ADVICE
    # r13) — as long as its fresh `.building` marker is present
    cur_v = coll._indexed_version()
    inflight = os.path.join(
        coll._index_root(), f"index_v{cur_v:06d}_deadbeef"
    )
    os.makedirs(inflight)
    open(os.path.join(inflight, coll._BUILDING_MARKER), "w").close()
    superseded_inflight = os.path.join(
        coll._index_root(), f"index_v{cur_v - 1:06d}_cafecafe"
    )
    os.makedirs(superseded_inflight)
    open(os.path.join(superseded_inflight, coll._BUILDING_MARKER), "w").close()

    removed = coll.gc_index_artifacts()
    assert first_dir in removed and not os.path.isdir(first_dir)
    assert os.path.isdir(second_dir) and os.path.isdir(inflight)
    assert os.path.isdir(superseded_inflight)
    # data version dirs are untouched and serving still works
    got = [int(r.id) for r in coll.search([9.0, 9.0, 9.0, 9.0], 1, nprobe=2).collect()]
    assert got == [1]
    assert coll.scan().count() == 20
    # a crashed builder's leftover (stale marker) becomes collectable
    stale = os.path.getmtime(os.path.join(
        superseded_inflight, coll._BUILDING_MARKER
    )) - coll._BUILDING_STALE_SECONDS - 60
    os.utime(os.path.join(superseded_inflight, coll._BUILDING_MARKER),
             (stale, stale))
    assert coll.gc_index_artifacts() == [superseded_inflight]
    # idempotent: nothing older remains (the fresh-marked dir persists
    # until its builder publishes or its marker goes stale)
    assert coll.gc_index_artifacts() == []


def test_index_artifact_gc_reclaims_equal_version_retune(spark, tmp_path):
    """A param retune (build_index with NO data mutation) publishes a
    new uuid-suffixed dir at an UNCHANGED collection version; the
    superseded twin failed the old strict '< cur' test forever, leaking
    one artifact per retune (ADVICE r13). GC now keeps only the dir the
    pointer resolves to among equal-version dirs — and the in-flight
    marker, not version arithmetic, is what protects concurrent
    builders."""
    import os

    cat = CollectionCatalog(spark, str(tmp_path))
    coll = cat.create("gcr", dim=2, metric="l2", index_type="ivf")
    coll.insert(spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(1, 9)],
        "id long, embedding array<float>",
    ))
    coll.build_index(nlist=1, seed=42, max_iter=2)
    first_dir = coll._index_dir()
    coll.build_index(nlist=2, seed=42, max_iter=2)  # retune, same version
    second_dir = coll._index_dir()
    assert second_dir != first_dir and os.path.isdir(first_dir)
    assert coll.gc_index_artifacts() == [first_dir]
    assert not os.path.isdir(first_dir) and os.path.isdir(second_dir)
    got = [int(r.id) for r in coll.search([8.0, 1.0], 1, nprobe=2).collect()]
    assert got == [8]
    assert coll.gc_index_artifacts() == []


def test_torn_index_pointer_falls_back_without_crashing(spark, tmp_path):
    """A half-written index_current.json (the pointer is replaced
    atomically, but a crashed writer could leave a torn temp copy, or an
    operator could truncate it by hand) must not take search down:
    _index_dir falls back to the legacy fixed dir and the staleness
    machinery reports 'no index' instead of raising JSONDecodeError."""
    import os

    import pytest as _pytest

    cat = CollectionCatalog(spark, str(tmp_path))
    coll = cat.create("torn", dim=2, metric="l2", index_type="ivf")
    coll.insert(spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "id long, embedding array<float>"
    ))
    coll.build_index(nlist=1, seed=42, max_iter=2)
    assert [int(r.id) for r in coll.search([1.0, 0.0], 1, nprobe=1).collect()] == [1]
    ptr = os.path.join(coll._index_root(), "index_current.json")
    with open(ptr, "w") as f:
        f.write("{half")  # torn write
    assert coll._indexed_version() is None  # legacy dir absent -> no index
    with _pytest.raises(ValueError, match="no index built"):
        coll.search([1.0, 0.0], 1, nprobe=1)
    # a rebuild repairs the pointer and serving resumes
    coll.build_index(nlist=1, seed=42, max_iter=2)
    assert [int(r.id) for r in coll.search([1.0, 0.0], 1, nprobe=1).collect()] == [1]


def test_catalog_wide_index_gc_sweeps_all_collections(spark, tmp_path):
    """CollectionCatalog.gc_index_artifacts is the janitor entry point:
    sweeps every collection, reports only the ones that reclaimed
    space, and leaves serving intact."""
    cat = CollectionCatalog(spark, str(tmp_path))
    rows = [(i, [float(i), 1.0]) for i in range(1, 9)]
    for name in ("a", "b"):
        coll = cat.create(name, dim=2, metric="l2", index_type="ivf")
        coll.insert(spark.createDataFrame(rows, "id long, embedding array<float>"))
        coll.build_index(nlist=1, seed=42, max_iter=2)
    # rebuild only 'a' -> only 'a' has a superseded artifact
    a = cat.get("a")
    a.upsert(spark.createDataFrame([(1, [9.0, 9.0])], "id long, embedding array<float>"))
    a.build_index(nlist=1, seed=42, max_iter=2)
    swept = cat.gc_index_artifacts()
    assert set(swept) == {"a"} and len(swept["a"]) == 1
    assert [int(r.id) for r in a.search([9.0, 9.0], 1, nprobe=1).collect()] == [1]
    assert cat.gc_index_artifacts() == {}


def test_build_superseded_by_newer_publish_warns_and_skips_params(spark, tmp_path):
    """A builder that loses the publish race to a NEWER snapshot's build
    must not silently persist ITS params over the winning artifact's —
    _publish_index reports the discard and build_index warns instead of
    writing back (ADVICE r13). The stale handle here stands in for a
    concurrent process holding a pre-mutation CollectionInfo."""
    import os

    import pytest as _pytest

    cat = CollectionCatalog(spark, str(tmp_path))
    coll = cat.create("race", dim=2, metric="l2", index_type="ivf")
    coll.insert(spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(1, 9)],
        "id long, embedding array<float>",
    ))
    coll.build_index(nlist=1, seed=42, max_iter=2)
    stale = CollectionCatalog(spark, str(tmp_path)).get("race")
    coll.upsert(spark.createDataFrame(
        [(1, [9.0, 9.0])], "id long, embedding array<float>"
    ))
    coll.build_index(nlist=2, seed=42, max_iter=2)
    winning_dir = coll._index_dir()
    with _pytest.warns(UserWarning, match="superseded by a newer"):
        stale.build_index(nlist=1, seed=7, max_iter=2)
    # pointer untouched, loser's dir discarded, winner's params intact
    assert coll._index_dir() == winning_dir and os.path.isdir(winning_dir)
    fresh = CollectionCatalog(spark, str(tmp_path)).get("race")
    assert fresh.info.build_params["nlist"] == 2
    assert [int(r.id) for r in coll.search([9.0, 9.0], 1, nprobe=2).collect()] == [1]


def test_building_marker_refreshed_before_save(spark, tmp_path, monkeypatch):
    """ADVICE r14: a fit outliving _BUILDING_STALE_SECONDS must not lose
    GC protection mid-save — the builder refreshes the marker between
    the fit and the artifact write."""
    import os
    import time

    from vector_db_spark.operators import ann as ann_mod

    cat = CollectionCatalog(spark, str(tmp_path))
    coll = cat.create("touchgc", dim=4, metric="l2", index_type="ivf")
    coll.insert(spark.createDataFrame(
        [(i, [float(i), 0.0, 0.0, 1.0]) for i in range(1, 21)],
        "id long, embedding array<float>",
    ))

    real_build = ann_mod.IvfIndex.build
    real_save = ann_mod.IvfIndex.save
    seen = {}

    def slow_build(*a, **kw):
        idx = real_build(*a, **kw)
        # simulate a fit that outlived the stale window: back-date the
        # staging marker the builder wrote before the fit
        root = coll._index_root()
        for name in os.listdir(root):
            m = os.path.join(root, name, coll._BUILDING_MARKER)
            if name.startswith("index_v") and os.path.exists(m):
                old = time.time() - coll._BUILDING_STALE_SECONDS - 120
                os.utime(m, (old, old))
        return idx

    def checked_save(self, path):
        m = os.path.join(path, coll._BUILDING_MARKER)
        seen["age_at_save"] = time.time() - os.path.getmtime(m)
        return real_save(self, path)

    monkeypatch.setattr(ann_mod.IvfIndex, "build", staticmethod(slow_build))
    monkeypatch.setattr(ann_mod.IvfIndex, "save", checked_save)
    coll.build_index(nlist=2, seed=42, max_iter=3)
    assert seen["age_at_save"] < coll._BUILDING_STALE_SECONDS, (
        "marker must be refreshed between fit and save"
    )
