"""DML query family: MERGE-upsert and delete-then-search verified against
the oracle as pure dataflow over the fixtures (SURVEY.md §2.9 rows
"upsert then read-back" / "delete then search").

The oracle SQL simulates MERGE as `updates ∪ (base ANTI JOIN updates)` —
the declarative definition of the semantics our `merge_upsert` implements
with one window over a union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_db_spark.functions.vector import l2_norm
from vector_db_spark.operators.collections import delete_rows, merge_upsert
from vector_db_spark.operators.knn import knn
from vector_db_spark.oracle import dot_sql, l2_sq_sql
from vector_db_spark.queries.registry import query
from vector_db_spark.queries.vector_queries import _emb, _qvec
from vector_db_spark.sources.fixtures import load_table

_NORM = f"round(sqrt({dot_sql('embedding', 'embedding')}), 6)"

_UPSERT_ORACLE = f"""
WITH maxid AS (SELECT max(vec_id) AS m FROM embeddings),
updates AS (
  SELECT vec_id, embedding, label + 100 AS label
  FROM embeddings WHERE vec_id < 5
  UNION ALL
  SELECT e.vec_id + x.m + 1 AS vec_id, e.embedding, 999 AS label
  FROM embeddings e, maxid x WHERE e.vec_id < 3
),
merged AS (
  SELECT * FROM updates
  UNION ALL
  SELECT b.* FROM embeddings b
  WHERE b.vec_id NOT IN (SELECT vec_id FROM updates)
)
SELECT m.vec_id, m.label, {_NORM.replace('embedding', 'm.embedding')} AS emb_norm
FROM merged m, maxid x
WHERE m.vec_id < 5 OR m.vec_id > x.m
"""


@query("upsert_readback", oracle=_UPSERT_ORACLE)
def upsert_readback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert a batch that both updates existing ids (label += 100) and
    inserts new ids (shifted past max, label 999), then read back the
    touched keys. Exactly-one-live-row-per-id semantics
    (vs reference stale-HNSW-vector bug, src/db/vector_database.rs:36-39)."""
    emb = _emb(spark, sf_dir)
    max_id = emb.agg(F.max("vec_id")).head()[0]
    updates = (
        emb.filter(F.col("vec_id") < 5)
        .select("vec_id", "embedding", (F.col("label") + 100).alias("label"))
        .unionByName(
            emb.filter(F.col("vec_id") < 3).select(
                (F.col("vec_id") + max_id + 1).alias("vec_id"),
                "embedding",
                F.lit(999).alias("label"),
            )
        )
    )
    merged = merge_upsert(emb, updates, ("vec_id",))
    return (
        merged.filter((F.col("vec_id") < 5) | (F.col("vec_id") > max_id))
        .select(
            "vec_id",
            "label",
            F.round(l2_norm(F.col("embedding")), 6).alias("emb_norm"),
        )
    )


_L2_E = l2_sq_sql("e.embedding", "q.qv")
_L2_R = l2_sq_sql("r.embedding", "q.qv")

_DELETE_ORACLE = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
victims AS (
  SELECT e.vec_id FROM embeddings e, q
  ORDER BY {_L2_E}, e.vec_id
  LIMIT 5
),
remaining AS (
  SELECT * FROM embeddings WHERE vec_id NOT IN (SELECT vec_id FROM victims)
),
top AS (
  SELECT r.vec_id, {_L2_R} AS distance
  FROM remaining r, q
  ORDER BY distance, r.vec_id
  LIMIT 10
)
SELECT vec_id, round(distance, 6) AS distance FROM top
"""


@query("delete_then_search", oracle=_DELETE_ORACLE)
def delete_then_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remove the 5 nearest ids (a *computed* id set, ≅ remove_vectors
    src/core/index/faiss_index.rs:131-138 as broadcast anti-join), then
    search again — the next ring of neighbors must surface."""
    emb = _emb(spark, sf_dir)
    qv = _qvec(spark, sf_dir)
    victims = knn(emb, qv, 5, metric="l2").select("vec_id")
    remaining = delete_rows(emb, victims, ("vec_id",))
    res = knn(remaining, qv, 10, metric="l2")
    return res.select("vec_id", F.round("distance", 6).alias("distance"))


# --------------------------------------------------------------------------
# Full index lifecycle through the Collection API: create → insert →
# build_index(ivf) → search (full probe ⇒ exact, reference hot path
# end-to-end: create_index_handle + insert + search_index_handle dispatch)
# --------------------------------------------------------------------------

_LIFECYCLE_ORACLE = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
top AS (
  SELECT e.vec_id + 1 AS id, {l2_sq_sql("e.embedding", "q.qv")} AS distance
  FROM embeddings e, q
  ORDER BY distance, id
  LIMIT 10
)
SELECT id, round(distance, 6) AS distance FROM top
"""


@query("collection_index_lifecycle", oracle=_LIFECYCLE_ORACLE)
def collection_index_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole object lifecycle as one verified flow:
    catalog create (≅ IndexKey registry), validated insert, batch index
    build, dispatch-by-index-type search. nprobe=nlist makes the IVF path
    exact, so the DuckDB oracle is plain kNN."""
    import tempfile

    from vector_db_spark.operators.collections import CollectionCatalog

    emb = load_table(spark, sf_dir, "embeddings")
    cat = CollectionCatalog(spark, tempfile.mkdtemp(prefix="cat_"))
    coll = cat.create("lifecycle", dim=64, metric="l2", index_type="ivf")
    coll.insert(
        emb.select((F.col("vec_id") + 1).alias("id"), "embedding")
    )
    coll.build_index(nlist=8, max_iter=5)
    qv = _qvec(spark, sf_dir)
    res = coll.search(qv, 10, nprobe=8)
    return res.select("id", F.round("distance", 6).alias("distance"))


_RANGE_LIFECYCLE_ORACLE = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
m AS (SELECT e.vec_id + 1 AS id, {_L2_E} AS dist FROM embeddings e, q)
SELECT id, round(dist, 6) AS distance FROM m WHERE dist <= 1.6
ORDER BY dist, id
"""


@query("collection_range_lifecycle", oracle=_RANGE_LIFECYCLE_ORACLE)
def collection_range_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """create → insert → build_index(ivf) → range_search through the
    catalog dispatch (Collection.range_search, round 11): the IVF range
    path is LOSSLESS at any nlist (triangle-inequality cell pruning +
    exact verify), so the oracle is the plain full-corpus range scan —
    no saturating-probe escape hatch needed, unlike the top-k gates."""
    import tempfile

    from vector_db_spark.operators.collections import CollectionCatalog

    emb = load_table(spark, sf_dir, "embeddings")
    cat = CollectionCatalog(spark, tempfile.mkdtemp(prefix="cat_"))
    coll = cat.create("range_lc", dim=64, metric="l2", index_type="ivf")
    coll.insert(emb.select((F.col("vec_id") + 1).alias("id"), "embedding"))
    coll.build_index(nlist=8, max_iter=5)
    qv = _qvec(spark, sf_dir)
    res = coll.range_search(qv, 1.6)
    return res.select("id", F.round("distance", 6).alias("distance"))


@query("ivfpq_range_exhaustive", oracle=_RANGE_LIFECYCLE_ORACLE)
def ivfpq_range_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range search on a compressed-code collection with coarse-cell
    pruning (VERDICT r11 #4): quantized distances never filter —
    the ivfpq layout's L2 coarse quantizer prunes cells by the same
    lossless triangle inequality the IVF family uses (persisted per-cell
    radii), and every survivor verifies from the RAW vector column the
    layout retains. Value-exact against the plain full-corpus range scan
    at ANY nlist, with an O(surviving cells) scan instead of O(corpus)
    (Collection.range_search + _coarse_range_candidates,
    operators/collections.py)."""
    import tempfile

    from vector_db_spark.operators.collections import CollectionCatalog

    emb = load_table(spark, sf_dir, "embeddings")
    cat = CollectionCatalog(spark, tempfile.mkdtemp(prefix="cat_"))
    coll = cat.create("pq_range", dim=64, metric="l2", index_type="ivfpq")
    coll.insert(emb.select((F.col("vec_id") + 1).alias("id"), "embedding"))
    coll.build_index(nlist=8, m=4, ksub=16, max_iter=5)
    qv = _qvec(spark, sf_dir)
    res = coll.range_search(qv, 1.6)
    return res.select("id", F.round("distance", 6).alias("distance"))


_BATCH_RANGE_LIFECYCLE_ORACLE = f"""
WITH q AS (
  SELECT vec_id + 1 AS query_id, embedding AS qv
  FROM embeddings WHERE vec_id < 5
),
m AS (SELECT q.query_id, e.vec_id + 1 AS id, {_L2_E} AS dist
      FROM embeddings e, q)
SELECT query_id, id, round(dist, 6) AS distance
FROM m WHERE dist <= 1.6
ORDER BY query_id, dist, id
"""


@query("collection_batch_range_lifecycle", oracle=_BATCH_RANGE_LIFECYCLE_ORACLE)
def collection_batch_range_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """create → insert → build_index(ivf) → range_search_batch through
    the catalog dispatch (VERDICT r11 #3: the batched range matrix is
    now routed per family by one catalog call and served over
    POST /batch_range_search). The IVF batched range path is lossless
    (per-query cell pruning + one batched exact verify over the union),
    so the oracle is the plain batched full-corpus range scan."""
    import tempfile

    from vector_db_spark.operators.collections import CollectionCatalog

    emb = load_table(spark, sf_dir, "embeddings")
    cat = CollectionCatalog(spark, tempfile.mkdtemp(prefix="cat_"))
    coll = cat.create("brange_lc", dim=64, metric="l2", index_type="ivf")
    coll.insert(emb.select((F.col("vec_id") + 1).alias("id"), "embedding"))
    coll.build_index(nlist=8, max_iter=5)
    queries = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1).alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    res = coll.range_search_batch(queries, 1.6)
    return res.select(
        "query_id", "id", F.round("distance", 6).alias("distance")
    )


@query("collection_tuned_serving", oracle=_LIFECYCLE_ORACLE)
def collection_tuned_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tuning write-back loop end-to-end: build an IVF collection, persist
    a full-probe operating point via ``set_serving_params(nprobe=nlist)``,
    re-open the catalog from disk (a fresh instance — attests the knobs
    survive a restart, unlike the reference's in-memory registry), then
    search with NO explicit knobs. The stored full probe makes the served
    answer exact, so the oracle is plain kNN — any failure to persist or
    apply the knobs drops back to the engine's nprobe=4 fallback and
    hash-mismatches."""
    import tempfile

    from vector_db_spark.operators.collections import CollectionCatalog

    emb = load_table(spark, sf_dir, "embeddings")
    root = tempfile.mkdtemp(prefix="cat_")
    cat = CollectionCatalog(spark, root)
    coll = cat.create("tuned", dim=64, metric="l2", index_type="ivf")
    coll.insert(emb.select((F.col("vec_id") + 1).alias("id"), "embedding"))
    coll.build_index(nlist=8, max_iter=5)
    coll.set_serving_params(nprobe=8)
    reopened = CollectionCatalog(spark, root).get("tuned")
    qv = _qvec(spark, sf_dir)
    res = reopened.search(qv, 10)  # no knobs: serves at the stored point
    return res.select("id", F.round("distance", 6).alias("distance"))


# --------------------------------------------------------------------------
# Schemaless document store: put JSON docs, impose structure at read time
# (≅ reference scalar storage, src/db/scalar_storage.rs:10-14)
# --------------------------------------------------------------------------

_DOCSTORE_ORACLE = """
SELECT event_id + 1 AS id,
       json_extract_string(props, '$.k') AS k,
       json_extract_string(props, '$.missing') AS missing
FROM events
WHERE event_id < 200
ORDER BY id
"""


@query("docstore_extract", oracle=_DOCSTORE_ORACLE)
def docstore_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schemaless round-trip: put the events' raw JSON props as opaque
    per-id documents, then project typed fields back out with JSON-path
    extraction — schema-on-read. Missing keys are NULL on both engines."""
    import tempfile

    from vector_db_spark.operators.collections import DocumentStore

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    store = DocumentStore(spark, tempfile.mkdtemp(prefix="docs_"))
    store.put(
        ev.select((F.col("event_id") + 1).alias("id"), F.col("props").alias("doc"))
    )
    return store.extract(k="$.k", missing="$.missing")


_TT_DOT = dot_sql("e.embedding", "e.embedding")

_TIME_TRAVEL_ORACLE = f"""
SELECT 'v1' AS snap, e.vec_id + 1 AS id, round(sqrt({_TT_DOT}), 6) AS emb_norm
FROM embeddings e WHERE e.vec_id + 1 <= 60
UNION ALL
SELECT 'live' AS snap, e.vec_id + 1 AS id,
       round(sqrt({_TT_DOT}) * 2, 6) AS emb_norm
FROM embeddings e WHERE e.vec_id + 1 BETWEEN 51 AND 60
"""


@query("collection_time_travel", oracle=_TIME_TRAVEL_ORACLE)
def collection_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-as-of reads over the bucketed store: insert (v1), delete
    ids 1-50 (v2), upsert ids 51-60 with doubled vectors (v3) — then read
    BOTH v1 and the live snapshot. v1 must show the original corpus
    untouched (deletes/updates invisible), live must show only the update
    survivors. Doubling is a power-of-two scale, so the doubled norm is
    bitwise 2x the original and the oracle reproduces both snapshots from
    the raw fixture."""
    import tempfile

    from vector_db_spark.operators.collections import CollectionCatalog

    emb = load_table(spark, sf_dir, "embeddings")
    cat = CollectionCatalog(spark, tempfile.mkdtemp(prefix="cat_tt_"))
    coll = cat.create("tt", dim=64, metric="l2")
    base = emb.select((F.col("vec_id") + 1).alias("id"), "embedding")
    coll.insert(base)                                      # v1
    coll.delete(spark.range(1, 51).select("id"))           # v2
    coll.upsert(                                           # v3
        base.filter(F.col("id").between(51, 60)).select(
            "id", F.transform("embedding", lambda x: x * 2).alias("embedding")
        )
    )
    norm6 = lambda df: F.round(l2_norm(df["embedding"]), 6).alias("emb_norm")  # noqa: E731
    v1 = coll.scan_at(1).filter(F.col("id") <= 60)
    live = coll.scan().filter(F.col("id") <= 60)
    return v1.select(F.lit("v1").alias("snap"), "id", norm6(v1)).unionByName(
        live.select(F.lit("live").alias("snap"), "id", norm6(live))
    )


_DIFF_ORACLE = """
SELECT e.vec_id + 1 AS id, 'removed' AS change FROM embeddings e WHERE e.vec_id + 1 <= 50
UNION ALL
SELECT e.vec_id + 1 AS id, 'changed' AS change FROM embeddings e
WHERE e.vec_id + 1 BETWEEN 51 AND 60
UNION ALL
SELECT e.vec_id + 1 + 100000 AS id, 'added' AS change FROM embeddings e
WHERE e.vec_id + 1 BETWEEN 61 AND 65
"""


@query("collection_version_diff", oracle=_DIFF_ORACLE)
def collection_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot CDC (operators/collections diff): after delete ids 1-50,
    upsert ids 51-60 with doubled vectors, and insert 5 brand-new ids,
    diff(v1, live) must report exactly those removed/changed/added rows —
    nothing else (unchanged rows stay silent). The id-keyed full-outer
    join runs over two manifest reads of the SAME bucket layout."""
    import tempfile

    from vector_db_spark.operators.collections import CollectionCatalog

    emb = load_table(spark, sf_dir, "embeddings")
    cat = CollectionCatalog(spark, tempfile.mkdtemp(prefix="cat_diff_"))
    coll = cat.create("diff", dim=64, metric="l2")
    base = emb.select((F.col("vec_id") + 1).alias("id"), "embedding")
    coll.insert(base)                                      # v1
    coll.delete(spark.range(1, 51).select("id"))           # v2
    coll.upsert(                                           # v3
        base.filter(F.col("id").between(51, 60)).select(
            "id", F.transform("embedding", lambda x: x * 2).alias("embedding")
        )
    )
    coll.insert(                                           # v4
        base.filter(F.col("id").between(61, 65)).select(
            (F.col("id") + 100000).alias("id"), "embedding"
        )
    )
    return coll.diff(1)


_REFRESH_ORACLE = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
live AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 11 <> 0),
top AS (
  SELECT l.vec_id, {l2_sq_sql("l.embedding", "q.qv")} AS distance
  FROM live l, q
  ORDER BY distance, l.vec_id
  LIMIT 10
)
SELECT vec_id, round(distance, 6) AS distance FROM top
"""


@query("collection_incremental_refresh", oracle=_REFRESH_ORACLE)
def collection_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index maintenance through the catalog: build on half
    the corpus, ingest the rest, retire every 11th id, refresh_index —
    the delta applies via append + tombstones (asserted: NOT a rebuild),
    and the served results must equal exact kNN over the live snapshot
    bit-for-bit."""
    import tempfile

    from vector_db_spark.operators.collections import CollectionCatalog

    # ids shift by +1: the store enforces id >= 1 (reference contract,
    # src/models/request/insert.rs:12-14) while fixture vec_ids start at 0
    emb = load_table(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") + 1).alias("id"), "embedding"
    )
    cat = CollectionCatalog(spark, tempfile.mkdtemp(prefix="refresh_gate_"))
    coll = cat.create("c", dim=64, metric="l2", index_type="ivf")
    coll.insert(emb.filter(F.col("id") % 2 == 1))
    coll.build_index(nlist=8, max_iter=5)
    coll.insert(emb.filter(F.col("id") % 2 == 0))
    coll.delete((F.col("id") - 1) % 11 == 0)
    mode = coll.refresh_index(nlist=8, max_iter=5)
    assert mode == "incremental", f"expected incremental refresh, got {mode}"
    res = coll.search(_qvec(spark, sf_dir), 10, nprobe=8)
    return res.select(
        (F.col("id") - 1).alias("vec_id"),
        F.round("distance", 6).alias("distance"),
    )


@query("collection_ivfopq_lifecycle", oracle=_LIFECYCLE_ORACLE)
def collection_ivfopq_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seventh catalog family end-to-end: create(ivfopq) → insert →
    build (rotation + cells + residual PQ) → dispatch search, which
    injects the collection's RAW snapshot as the rerank frame (stored
    vectors are rotated copies). Full probe + corpus shortlist ⇒ exact,
    same oracle as collection_index_lifecycle."""
    import tempfile

    from vector_db_spark.operators.collections import CollectionCatalog

    emb = load_table(spark, sf_dir, "embeddings")
    cat = CollectionCatalog(spark, tempfile.mkdtemp(prefix="cat_opq_"))
    coll = cat.create("lifecycle_opq", dim=64, metric="l2", index_type="ivfopq")
    coll.insert(emb.select((F.col("vec_id") + 1).alias("id"), "embedding"))
    coll.build_index(nlist=8, m=16, ksub=64, max_iter=5, pq_iters=8, opq_iters=4)
    qv = _qvec(spark, sf_dir)
    res = coll.search(qv, 10, nprobe=8, shortlist=10_000_000)
    return res.select("id", F.round("distance", 6).alias("distance"))


# ---------------------------------------------------------------------------
# Round 6: HTTP transport round-trip (vector_db_spark/server.py). The
# whole reference deployment shape — axum JSON service in front of the
# engine (src/router/mod.rs:1-7) — driven end-to-end over a LIVE socket:
# create index, insert vectors, search; the wire response must equal the
# DuckDB exact-kNN oracle over the same rows. JSON float64 round-trips
# exactly, so the usual fold-order parity carries through the transport.
# ---------------------------------------------------------------------------

_HTTP_N = 8
_HTTP_K = 5

_HTTP_ORACLE = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1),
cand AS (
  SELECT e.vec_id AS label,
         round({l2_sq_sql('e.embedding', 'q.qv')}, 6) AS distance
  FROM embeddings e, q
  WHERE e.vec_id BETWEEN 1 AND {_HTTP_N}
)
SELECT label, distance FROM cand ORDER BY distance, label LIMIT {_HTTP_K}
"""


@query("http_search_roundtrip", oracle=_HTTP_ORACLE)
def http_search_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POST /create → N× POST /insert → POST /search against a live
    ephemeral-port server; the JSON response (reference field names:
    labels/distances) is re-framed and must hash-match exact kNN SQL."""
    import json as _json
    import tempfile
    import urllib.request

    from vector_db_spark.api import VectorDatabaseApi
    from vector_db_spark.server import VectorDbHttpServer

    emb = load_table(spark, sf_dir, "embeddings")
    rows = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.filter(
            (F.col("vec_id") >= 1) & (F.col("vec_id") <= _HTTP_N)
        ).collect()
    ]
    dim = len(rows[0][1])
    qv = dict(rows)[1]

    srv = VectorDbHttpServer(
        VectorDatabaseApi(spark, tempfile.mkdtemp(prefix="http_gate_"))
    ).start()
    try:
        def post(path, payload):
            req = urllib.request.Request(
                f"http://{srv.host}:{srv.port}{path}",
                data=_json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=300) as resp:
                return _json.loads(resp.read())

        key = {"index_type": "FLAT", "dim": dim, "metric_type": "L2"}
        assert post("/create", key)["code"] == 0
        for rid, vec in rows:
            assert post(
                "/insert", {"id": rid, "vectors": vec, "index_key": key}
            )["code"] == 0
        out = post(
            "/search", {"vectors": qv, "k": _HTTP_K, "index_key": key}
        )
        assert out["code"] == 0
    finally:
        srv.stop()
    return spark.createDataFrame(
        [
            (int(l), float(d))
            for l, d in zip(out["labels"], out["distances"])
        ],
        "label long, distance double",
    ).select("label", F.round("distance", 6).alias("distance"))


# ---------------------------------------------------------------------------
# Round 9: the multi-vector MaxSim families through the catalog and the
# wire — the one-factory parity item (every backend dispatches through
# the same registry, /root/reference/src/core/index_factory.rs:75-163;
# the PLAID families were library-only until now).
# ---------------------------------------------------------------------------

_MS_NDOC = 97   # docs = vec_id % 97 + 1 (ids >= 1, store contract)
_MS_NTOK = 3
_MS_K = 5

_MS_LIFECYCLE_ORACLE = f"""
WITH tok AS (
  SELECT vec_id AS t, embedding AS qv FROM embeddings WHERE vec_id < {_MS_NTOK}
),
live AS (
  SELECT (e.vec_id % {_MS_NDOC}) + 1 AS id, e.embedding FROM embeddings e
  WHERE ((e.vec_id % {_MS_NDOC}) + 1) % 7 <> 0
),
per AS (
  SELECT l.id, tok.t, max({dot_sql("l.embedding", "tok.qv")}) AS m
  FROM live l, tok
  GROUP BY l.id, tok.t
),
scored AS (
  SELECT id, sum(m ORDER BY t) AS score FROM per GROUP BY id
),
top AS (
  SELECT id, score FROM scored ORDER BY score DESC, id LIMIT {_MS_K}
)
SELECT id, round(score, 6) AS score FROM top
"""


@query("collection_maxsim_lifecycle", oracle=_MS_LIFECYCLE_ORACLE)
def collection_maxsim_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-vector family end-to-end through the catalog: create
    (index_type='maxsim', a DOCUMENT row holds array<array<float>> token
    vectors) → insert half the docs → build → insert the rest → delete
    the id % 7 == 0 docs → refresh_index (ASSERTED incremental: the token
    rows of added docs append against the frozen quantizer, removed docs
    tombstone at doc granularity — never a rebuild) → dispatch search at
    lossless settings (full probe, unbounded rerank), which must equal
    exact MaxSim over the live docs. Docs are vec_id % 97 + 1 groups of
    the embeddings fixture."""
    import tempfile

    from vector_db_spark.operators.collections import CollectionCatalog

    emb = load_table(spark, sf_dir, "embeddings")
    docs = emb.groupBy(
        ((F.col("vec_id") % _MS_NDOC) + 1).alias("id")
    ).agg(F.collect_list("embedding").alias("embedding"))
    toks = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < _MS_NTOK)
        .orderBy("vec_id")
        .collect()
    ]
    cat = CollectionCatalog(spark, tempfile.mkdtemp(prefix="cat_ms_"))
    coll = cat.create("ms", dim=64, metric="ip", index_type="maxsim")
    coll.insert(docs.filter(F.col("id") % 2 == 1))
    coll.build_index(nlist=8, max_iter=5)
    coll.insert(docs.filter(F.col("id") % 2 == 0))
    coll.delete(F.col("id") % 7 == 0)
    mode = coll.refresh_index(nlist=8, max_iter=5)
    assert mode == "incremental", f"expected incremental refresh, got {mode}"
    res = coll.search(toks, _MS_K, nprobe=8)
    return res.select("id", F.round("score", 6).alias("score"))


_HTTP_MS_NDOC = 6
_HTTP_MS_K = 3

_HTTP_MS_ORACLE = f"""
WITH tok AS (
  SELECT vec_id AS t, embedding AS qv FROM embeddings WHERE vec_id < 3
),
corp AS (
  SELECT (vec_id // 3) + 1 AS label, embedding FROM embeddings
  WHERE vec_id < {_HTTP_MS_NDOC * 3}
),
per AS (
  SELECT c.label, tok.t, max({dot_sql("c.embedding", "tok.qv")}) AS m
  FROM corp c, tok
  GROUP BY c.label, tok.t
),
scored AS (
  SELECT label, sum(m ORDER BY t) AS score FROM per GROUP BY label
),
top AS (
  SELECT label, score FROM scored
  ORDER BY score DESC, label LIMIT {_HTTP_MS_K}
)
SELECT label, round(score, 6) AS score FROM top
"""


@query("http_maxsim_roundtrip", oracle=_HTTP_MS_ORACLE)
def http_maxsim_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-PLAID collection over a live socket: POST /create with
    the MAXSIM_PQ engine-extension wire type → insert 6 documents of 3
    token vectors each → POST /search with a 3-token query set. The wire
    response (labels/scores in the reference's field names) must equal
    the DuckDB exact-MaxSim oracle — the API's default serving params are
    full probe + unbounded rerank, so the residual-PQ codes prune nothing
    and served scores are exact."""
    import json as _json
    import tempfile
    import urllib.request

    from vector_db_spark.api import VectorDatabaseApi
    from vector_db_spark.server import VectorDbHttpServer

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < _HTTP_MS_NDOC * 3)
        .orderBy("vec_id")
        .collect()
    ]
    srv = VectorDbHttpServer(
        VectorDatabaseApi(spark, tempfile.mkdtemp(prefix="http_ms_gate_"))
    ).start()
    try:
        def post(path, payload):
            req = urllib.request.Request(
                f"http://{srv.host}:{srv.port}{path}",
                data=_json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=300) as resp:
                return _json.loads(resp.read())

        key = {"index_type": "MAXSIM_PQ", "dim": 64,
               "metric_type": "InnerProduct"}
        assert post("/create", key)["code"] == 0
        for d in range(_HTTP_MS_NDOC):
            assert post(
                "/insert",
                {"id": d + 1, "vectors": vecs[d * 3:(d + 1) * 3],
                 "index_key": key},
            )["code"] == 0
        out = post(
            "/search",
            {"vectors": vecs[0:3], "k": _HTTP_MS_K, "index_key": key},
        )
        assert out["code"] == 0
    finally:
        srv.stop()
    return spark.createDataFrame(
        [
            (int(l), float(s))
            for l, s in zip(out["labels"], out["distances"])
        ],
        "label long, score double",
    ).select("label", F.round("score", 6).alias("score"))


# ---------------------------------------------------------------------------
# Round 12: multi-vector range through the catalog — the last family to
# gain the faiss range_search contract (threshold = MaxSim score floor).
# ---------------------------------------------------------------------------

_MS_RANGE_K = 10

_MS_RANGE_LIFECYCLE_ORACLE = f"""
WITH tok AS (
  SELECT vec_id AS t, embedding AS qv FROM embeddings WHERE vec_id < {_MS_NTOK}
),
live AS (
  SELECT (e.vec_id % {_MS_NDOC}) + 1 AS id, e.embedding FROM embeddings e
  WHERE ((e.vec_id % {_MS_NDOC}) + 1) % 7 <> 0
),
per AS (
  SELECT l.id, tok.t, max({dot_sql("l.embedding", "tok.qv")}) AS m
  FROM live l, tok
  GROUP BY l.id, tok.t
),
scored AS (
  SELECT id, sum(m ORDER BY t) AS score FROM per GROUP BY id
),
thr AS (
  SELECT min(score) AS t FROM (
    SELECT score FROM scored ORDER BY score DESC, id LIMIT {_MS_RANGE_K}
  )
)
SELECT id, round(score, 6) AS score
FROM scored, thr
WHERE score >= thr.t
ORDER BY score DESC, id
"""


@query("collection_maxsim_range_lifecycle", oracle=_MS_RANGE_LIFECYCLE_ORACLE)
def collection_maxsim_range_lifecycle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multi-vector range end-to-end through the catalog: create
    (index_type='maxsim') → insert the vec_id % 97 + 1 doc groups →
    delete the id % 7 == 0 docs → range_search with NO index (served
    exactly from the collection's own token rows — the always-fresh
    fallback, the compressed families' range precedent) → build_index →
    range_search at full probe (the probed arm), ASSERTED equal to the
    exact arm's rows. Threshold = the 10th exact score, data-derived so
    the gate holds at every SF."""
    import tempfile

    from vector_db_spark.operators.collections import CollectionCatalog
    from vector_db_spark.operators.late_interaction import maxsim_search

    emb = load_table(spark, sf_dir, "embeddings")
    docs = emb.groupBy(
        ((F.col("vec_id") % _MS_NDOC) + 1).alias("id")
    ).agg(F.collect_list("embedding").alias("embedding"))
    toks = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < _MS_NTOK)
        .orderBy("vec_id")
        .collect()
    ]
    cat = CollectionCatalog(spark, tempfile.mkdtemp(prefix="cat_msr_"))
    coll = cat.create("msr", dim=64, metric="ip", index_type="maxsim")
    coll.insert(docs)
    coll.delete(F.col("id") % 7 == 0)
    top = maxsim_search(
        coll._exploded(coll.scan()), toks, _MS_RANGE_K, doc_col="id"
    ).collect()
    thr = float(top[-1].maxsim_score)
    exact = [
        (r.id, round(r.score, 9))
        for r in coll.range_search(toks, thr).collect()
    ]
    assert len(exact) >= _MS_RANGE_K
    coll.build_index(nlist=8, max_iter=5)
    res = coll.range_search(toks, thr, nprobe=8)
    probed = [(r.id, round(r.score, 9)) for r in res.collect()]
    assert probed == exact, "full-probe range must equal the exact arm"
    return res.select("id", F.round("score", 6).alias("score"))
