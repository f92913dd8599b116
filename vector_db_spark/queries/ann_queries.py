"""Approximate-ANN query family (SURVEY.md §7.1 M4).

`ann_ivf_full_probe` is the strict correctness gate: with nprobe == nlist
the IVF path must reproduce exact kNN bit-for-bit, so the KMeans
assignment + cell filter + rerank machinery is verified against the same
DuckDB oracle as `knn_l2`. The reduced-probe and LSH variants are the
actual approximate paths (rows-only; recall is asserted vs the exact
operator in tests/test_ann.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_db_spark.operators.ann import CosineLshIndex, IvfIndex
from vector_db_spark.operators.ivfpq import IvfPqIndex
from vector_db_spark.operators.pq import ProductQuantizer
from vector_db_spark.queries.registry import query
from vector_db_spark.queries.vector_queries import (
    _COS,
    _IP,
    _emb,
    _knn_oracle,
    _L2,
    _qvec,
    K,
    QUERY_VEC_ID,
)


@query("ann_ivf_full_probe", oracle=_knn_oracle(_L2, "distance", "ASC"))
def ann_ivf_full_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    idx = IvfIndex.build(emb, nlist=8, seed=42, max_iter=5)
    res = idx.search(_qvec(spark, sf_dir), K, nprobe=8, metric="l2")
    return res.select("vec_id", F.round("distance", 6).alias("distance"))


def _recall_gated(
    res: DataFrame, exact_ids: list, floor: float, label: str
) -> DataFrame:
    """Turn a rows-only probe query into a hard quality gate (VERDICT r2
    "Next round" #8): measure recall against the exact operator's ids and
    REFUSE to return below the floor — a probe-quality regression makes
    the driver row red instead of silently passing a row count. The
    measured recall rides along as a column on every row, so the recorded
    result carries the quality number. Floors sit well under the tuned
    means pinned in tests/ (single-query readings are noisier than the
    5-query means)."""
    got = [r.vec_id for r in res.select("vec_id").collect()]
    recall = len(set(got) & set(exact_ids)) / len(exact_ids)
    if recall < floor:
        raise AssertionError(
            f"{label}: recall@{len(exact_ids)} {recall:.2f} below floor {floor}"
        )
    return res.withColumn("recall_at_10", F.lit(round(recall, 4)))


def _exact_ids(spark, sf_dir, metric="l2", predicate=None) -> list:
    from vector_db_spark.operators.knn import knn

    emb = _emb(spark, sf_dir)
    return [
        r.vec_id
        for r in knn(
            emb, _qvec(spark, sf_dir), K, metric=metric, predicate=predicate
        ).collect()
    ]


def _ivf_cb_values() -> tuple[str, str, int, int]:
    """(VALUES rows, column list, nlist, dim) for the frozen coarse
    centroids — shared by the single and batch probe oracles."""
    import json as _json
    import os as _os

    from vector_db_spark.operators.ann import FROZEN_DOC_IVF_PATH

    path = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        FROZEN_DOC_IVF_PATH,
    )
    with open(path) as f:
        art = _json.load(f)
    cents = art["centroids"]
    nlist, dim = len(cents), len(cents[0])
    cols = ", ".join(f"c{d}" for d in range(dim))
    rows = ",\n".join(
        f"({j}, " + ", ".join(repr(float(x)) for x in cents[j]) + ")"
        for j in range(nlist)
    )
    return rows, cols, nlist, dim


def _ivf_cell_dist(vec_sql: str, dim: int) -> str:
    """Left-fold squared-L2 between a vector column and the cb row —
    the exact arithmetic of ann._l2_to_literal (whose F.aggregate fold
    starts at 0.0; 0.0 + d0 == d0 bit-exactly for the non-negative
    squared terms, so the plain SQL chain matches)."""
    return " + ".join(
        f"(({vec_sql}[{d + 1}]::DOUBLE) - c.c{d}) * (({vec_sql}[{d + 1}]::DOUBLE) - c.c{d})"
        for d in range(dim)
    )


def _ivf_probe_oracle() -> str:
    rows, cols, nlist, dim = _ivf_cb_values()
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
cb (j, {cols}) AS (VALUES
{rows}
),
assign AS (
  SELECT vec_id, j AS cell FROM (
    SELECT e.vec_id, c.j,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_ivf_cell_dist("e.embedding", dim)} ASC, c.j ASC
           ) AS rn
    FROM embeddings e CROSS JOIN cb c
  ) WHERE rn = 1
),
qcells AS (
  SELECT c.j FROM cb c CROSS JOIN q
  ORDER BY {_ivf_cell_dist("q.qv", dim)} ASC, c.j ASC
  LIMIT 4
),
top AS (
  SELECT e.vec_id, {_L2} AS distance
  FROM embeddings e JOIN assign USING (vec_id) CROSS JOIN q
  WHERE assign.cell IN (SELECT j FROM qcells)
  ORDER BY distance ASC, e.vec_id ASC
  LIMIT {K}
),
exact10 AS (
  SELECT e.vec_id FROM embeddings e, q
  ORDER BY {_L2} ASC, e.vec_id ASC
  LIMIT {K}
),
rec AS (
  SELECT round(CAST((SELECT count(*) FROM top JOIN exact10 USING (vec_id))
               AS DOUBLE) / {K}, 4) AS recall_at_10
)
SELECT top.vec_id, round(top.distance, 6) AS distance, rec.recall_at_10
FROM top, rec
"""


@query("ann_ivf_probe", oracle=_ivf_probe_oracle())
def ann_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate path: probe half the cells — served from the FROZEN
    coarse quantizer (ann.load_frozen_doc_ivf) in exact-fold mode.

    Hash-exact as of round 14 (the r13 rows-only audit's "possible in
    principle" row, done): assignment is the pure-codegen argmin
    expression, cell ranking an order-pinned driver fold, the rerank the
    already-portable exact kNN — so the DuckDB oracle replays assignment,
    probe-set selection, pruned rerank, AND the in-row recall column
    bit-exactly. The PRODUCTION Arrow assignment/probe kernels stay
    hash-gated at full probe (ann_ivf_full_probe/batch) and tuned-recall
    pinned (tests/test_ann.py ≥ 0.85 mean; RECALL_r* 0.956). Floor 0.6
    stays enforced in-row."""
    from vector_db_spark.operators.ann import load_frozen_doc_ivf

    emb = _emb(spark, sf_dir)
    idx = load_frozen_doc_ivf(emb)
    res = idx.search(_qvec(spark, sf_dir), K, nprobe=4, metric="l2")
    res = res.select("vec_id", F.round("distance", 6).alias("distance"))
    return _recall_gated(res, _exact_ids(spark, sf_dir), 0.6, "ann_ivf_probe")


def _lsh_planes():
    """The ann_lsh_cosine gate's hyperplanes: exactly CosineLshIndex.
    build(dim=64, n_bits=6, n_tables=4, seed=42)'s planes. RandomState
    is bit-stable across numpy versions (legacy-generator compatibility
    guarantee), so seed + shape IS the frozen artifact — no file
    needed."""
    import numpy as np

    return np.random.RandomState(42).normal(size=(4, 6, 64))


def _lsh_bucket_sql(vec_sql: str, planes) -> list[str]:
    """Per-table bucket-id SQL: sign-of-dot-fold bits packed little-
    endian — term-for-term the engine's dot() fold (0.0 seed dropped:
    0.0 + x == x bit-exactly) and bit packing."""
    out = []
    for t in range(planes.shape[0]):
        bits = []
        for b in range(planes.shape[1]):
            dot = " + ".join(
                f"({vec_sql}[{d + 1}]::DOUBLE * {float(planes[t][b][d])!r})"
                for d in range(planes.shape[2])
            )
            bits.append(f"(CASE WHEN ({dot}) >= 0.0 THEN {1 << b} ELSE 0 END)")
        out.append("(" + " + ".join(bits) + ")")
    return out


def _lsh_cosine_oracle() -> str:
    planes = _lsh_planes()
    ebuckets = _lsh_bucket_sql("e.embedding", planes)
    qbuckets = _lsh_bucket_sql("q.qv", planes)
    match = " OR ".join(
        f"({eb}) = ({qb})" for eb, qb in zip(ebuckets, qbuckets)
    )
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
top AS (
  SELECT e.vec_id, {_COS} AS score
  FROM embeddings e CROSS JOIN q
  WHERE {match}
  ORDER BY score DESC, e.vec_id ASC
  LIMIT {K}
),
exact10 AS (
  SELECT e.vec_id FROM embeddings e, q
  ORDER BY {_COS} DESC, e.vec_id ASC
  LIMIT {K}
),
rec AS (
  SELECT round(CAST((SELECT count(*) FROM top JOIN exact10 USING (vec_id))
               AS DOUBLE) / {K}, 4) AS recall_at_10
)
SELECT top.vec_id, round(top.score, 6) AS score, rec.recall_at_10
FROM top, rec
"""


@query("ann_lsh_cosine", oracle=_lsh_cosine_oracle())
def ann_lsh_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-bucket cosine LSH (n_bits=6, n_tables=4, seed=42) — the
    hyperplanes are fully determined by the pinned seed (RandomState is
    bit-stable by numpy's compatibility guarantee), so this is the
    freeze pattern with the artifact generated instead of persisted.

    Hash-exact as of round 14 (the r13 rows-only audit row, done): the
    per-table bucket ids are pure-codegen sign-of-dot-fold expressions
    (`_lsh_bucket_expr`) the DuckDB oracle replays term-for-term; the
    candidate set is the union of the query's buckets across tables
    (identical to CosineLshIndex.search's distinct-id union), the
    cosine rerank is the already-portable exact kNN, and the in-row
    recall column replays too. The PRODUCTION Arrow bucketize kernel
    stays hash-gated by the `ann_lsh_*_exhaustive` family and
    tuned-recall pinned (tests/test_ann.py mean >= 0.8; RECALL_r*
    0.998). Floor 0.3 stays enforced in-row."""
    from vector_db_spark.functions.vector import dot as _vdot
    from vector_db_spark.operators.knn import knn

    emb = _emb(spark, sf_dir)
    planes = _lsh_planes()
    vec = F.col("embedding")
    qv = _qvec(spark, sf_dir)
    cond = None
    for t in range(planes.shape[0]):
        bucket = None
        qbucket = 0
        for b in range(planes.shape[1]):
            plane = [float(x) for x in planes[t][b]]
            bit = (
                _vdot(vec, F.array(*[F.lit(x) for x in plane])) >= F.lit(0.0)
            ).cast("long") * F.lit(1 << b)
            bucket = bit if bucket is None else bucket + bit
            acc = 0.0
            for x, y in zip(qv, plane):
                acc = acc + float(x) * y
            qbucket |= (1 << b) if acc >= 0.0 else 0
        c = bucket == F.lit(qbucket)
        cond = c if cond is None else cond | c
    cands = emb.filter(cond)
    res = knn(cands, qv, K, metric="cosine")
    res = res.select("vec_id", F.round("score", 6).alias("score"))
    return _recall_gated(
        res, _exact_ids(spark, sf_dir, metric="cosine"), 0.3, "ann_lsh_cosine"
    )


@query(
    "ann_lsh_filtered_exhaustive",
    oracle=_knn_oracle(_COS, "score", "DESC", "WHERE e.label = 3"),
)
def ann_lsh_filtered_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The filtered-LSH correctness gate: with n_bits=1 and probe_radius=1
    every bucket of every table is probed, so candidates = the whole corpus
    and filtered LSH must reproduce exact filtered cosine kNN bit-for-bit
    (same oracle as knn_filtered_eq's cosine analogue) — verifying the
    predicate-through-candidates path (≅ usearch filtered_search,
    reference: src/core/index/usearch_index.rs:68-85)."""
    emb = _emb(spark, sf_dir)
    idx = CosineLshIndex.build(emb, dim=64, n_bits=1, n_tables=2, seed=42)
    res = idx.search(
        _qvec(spark, sf_dir), K, probe_radius=1, predicate=F.col("label") == 3
    )
    return res.select("vec_id", F.round("score", 6).alias("score"))


@query("ann_lsh_radius_exhaustive", oracle=_knn_oracle(_COS, "score", "DESC"))
def ann_lsh_radius_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generalized-multiprobe correctness gate: probe_radius is a true
    Hamming-ball radius (round 9; previously any radius ≥ 1 silently
    behaved as 1), so with n_bits=2 and probe_radius=2 the ball covers
    every bucket of every table and the search must reproduce exact
    cosine kNN bit-for-bit — the radius analogue of the nprobe=nlist
    exhaustive gates every IVF family carries."""
    emb = _emb(spark, sf_dir)
    idx = CosineLshIndex.build(emb, dim=64, n_bits=2, n_tables=2, seed=42)
    res = idx.search(_qvec(spark, sf_dir), K, probe_radius=2)
    return res.select("vec_id", F.round("score", 6).alias("score"))


def _lsh_filtered_oracle() -> str:
    planes = _lsh_planes()
    ebuckets = _lsh_bucket_sql("e.embedding", planes)
    qbuckets = _lsh_bucket_sql("q.qv", planes)
    # multiprobe radius 1: candidate if ANY table's bucket is within
    # Hamming distance 1 of the query's — popcount over bit-identical
    # sign folds, so the probe set replays exactly
    match = " OR ".join(
        f"bit_count(xor(CAST({eb} AS BIGINT), CAST({qb} AS BIGINT))) <= 1"
        for eb, qb in zip(ebuckets, qbuckets)
    )
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
top AS (
  SELECT e.vec_id, {_COS} AS score
  FROM embeddings e CROSS JOIN q
  WHERE e.label = 3 AND ({match})
  ORDER BY score DESC, e.vec_id ASC
  LIMIT {K}
),
exact10 AS (
  SELECT e.vec_id FROM embeddings e, q
  WHERE e.label = 3
  ORDER BY {_COS} DESC, e.vec_id ASC
  LIMIT {K}
),
rec AS (
  SELECT round(CAST((SELECT count(*) FROM top JOIN exact10 USING (vec_id))
               AS DOUBLE) / {K}, 4) AS recall_at_10
)
SELECT top.vec_id, round(top.score, 6) AS score, rec.recall_at_10
FROM top, rec
"""


@query("ann_lsh_filtered", oracle=_lsh_filtered_oracle())
def ann_lsh_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production filtered-LSH path: realistic bucket count,
    radius-1 multiprobe, predicate applied to candidates before rerank
    (subset-of-exact-filtered + predicate-satisfaction stay pinned in
    tests/test_ann.py).

    Hash-exact as of round 14 (same seed-determined hyperplanes as
    ann_lsh_cosine): per-table buckets are sign-of-dot-fold codegen
    expressions, the radius-1 multiprobe is a popcount over their XOR
    (integer-exact given bit-identical sign folds), the predicate is a
    plain pushed filter, and the cosine rerank + in-row recall column
    replay in DuckDB. Recall floor 0.3 vs the exact FILTERED top-k
    stays enforced in-row; the production multiprobe bucketize kernel
    stays hash-gated by ann_lsh_filtered_exhaustive."""
    from vector_db_spark.functions.vector import dot as _vdot
    from vector_db_spark.operators.knn import knn

    emb = _emb(spark, sf_dir)
    planes = _lsh_planes()
    vec = F.col("embedding")
    qv = _qvec(spark, sf_dir)
    cond = None
    for t in range(planes.shape[0]):
        bucket = None
        qbucket = 0
        for b in range(planes.shape[1]):
            plane = [float(x) for x in planes[t][b]]
            bit = (
                _vdot(vec, F.array(*[F.lit(x) for x in plane])) >= F.lit(0.0)
            ).cast("long") * F.lit(1 << b)
            bucket = bit if bucket is None else bucket + bit
            acc = 0.0
            for x, y in zip(qv, plane):
                acc = acc + float(x) * y
            qbucket |= (1 << b) if acc >= 0.0 else 0
        c = F.bit_count(bucket.bitwiseXOR(F.lit(qbucket))) <= F.lit(1)
        cond = c if cond is None else cond | c
    cands = emb.filter(cond & (F.col("label") == 3))
    res = knn(cands, qv, K, metric="cosine")
    res = res.select("vec_id", F.round("score", 6).alias("score"))
    return _recall_gated(
        res,
        _exact_ids(spark, sf_dir, metric="cosine", predicate=F.col("label") == 3),
        0.3,
        "ann_lsh_filtered",
    )


from vector_db_spark.queries.vector_queries import (  # noqa: E402
    _BATCH_K,
    _BATCH_L2,
    _BATCH_ORACLE,
)


@query("ann_ivf_batch_full_probe", oracle=_BATCH_ORACLE)
def ann_ivf_batch_full_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ANN, exhaustively probed — must reproduce exact batch kNN
    (same oracle as knn_batch), proving the per-query cell-probe join +
    window rerank machinery before any approximation is dialed in."""
    emb = _emb(spark, sf_dir)
    idx = IvfIndex.build(emb, nlist=8, seed=42, max_iter=5)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = idx.search_batch(queries, _BATCH_K, nprobe=8, metric="l2")
    return res.select(
        "query_id", "vec_id", F.round("distance", 6).alias("distance"), "rank"
    )


def _ivf_batch_probe_oracle() -> str:
    rows, cols, nlist, dim = _ivf_cb_values()
    batch_l2 = _BATCH_L2.replace("q.qv", "qs.qv")
    return f"""
WITH qs AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5
),
cb (j, {cols}) AS (VALUES
{rows}
),
assign AS (
  SELECT vec_id, j AS cell FROM (
    SELECT e.vec_id, c.j,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_ivf_cell_dist("e.embedding", dim)} ASC, c.j ASC
           ) AS rn
    FROM embeddings e CROSS JOIN cb c
  ) WHERE rn = 1
),
qcells AS (
  SELECT query_id, j AS cell FROM (
    SELECT qs.query_id, c.j,
           row_number() OVER (
             PARTITION BY qs.query_id
             ORDER BY {_ivf_cell_dist("qs.qv", dim)} ASC, c.j ASC
           ) AS rn
    FROM qs CROSS JOIN cb c
  ) WHERE rn <= 4
),
ranked AS (
  SELECT query_id, vec_id, dist,
         row_number() OVER (
           PARTITION BY query_id ORDER BY dist, vec_id
         ) AS rank
  FROM (
    SELECT qs.query_id, e.vec_id, {batch_l2} AS dist
    FROM embeddings e
    JOIN assign USING (vec_id)
    JOIN qcells ON qcells.cell = assign.cell
    JOIN qs ON qs.query_id = qcells.query_id
  )
),
res AS (SELECT * FROM ranked WHERE rank <= {_BATCH_K}),
exact AS (
  SELECT query_id, vec_id FROM (
    SELECT qs.query_id, e.vec_id,
           row_number() OVER (
             PARTITION BY qs.query_id ORDER BY {batch_l2}, e.vec_id
           ) AS rank
    FROM embeddings e, qs
  ) WHERE rank <= {_BATCH_K}
),
rec AS (
  SELECT round(AVG(r), 4) AS mean_recall_at_5 FROM (
    SELECT CAST(count(res.vec_id) AS DOUBLE) / {_BATCH_K} AS r
    FROM exact LEFT JOIN res USING (query_id, vec_id)
    GROUP BY exact.query_id
  )
)
SELECT res.query_id, res.vec_id, round(res.dist, 6) AS distance, res.rank,
       rec.mean_recall_at_5
FROM res, rec
"""


@query("ann_ivf_batch_probe", oracle=_ivf_batch_probe_oracle())
def ann_ivf_batch_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The approximate batch path: half the cells probed per query —
    served from the FROZEN coarse quantizer with the cell ranking as a
    pure-codegen expression over the frozen literals (nlist·dim = 512,
    under the `_EXPR_ASSIGN_MAX` planning ceiling), the same
    broadcast-cells-join + window-rank plan shape as the production
    `search_batch`, whose Arrow cell-ranking GEMM stays hash-gated at
    full probe (`ann_ivf_batch_full_probe`) and tuned-recall pinned.

    Hash-exact as of round 14: assignment, per-query probe sets, pruned
    scoring, ranking, AND the mean-recall column replay in DuckDB.
    MEAN per-query recall@5 vs exact batch kNN must still clear 0.6
    in-row (tuned mean >= 0.85 pinned in tests/test_ann.py)."""
    from vector_db_spark.operators.ann import (
        _CLUSTER_COL,
        _l2_to_literal,
        load_frozen_doc_ivf,
    )
    from vector_db_spark.functions.vector import l2_sq
    from vector_db_spark.operators.knn import batch_knn
    from pyspark.sql import Window

    emb = _emb(spark, sf_dir)
    idx = load_frozen_doc_ivf(emb)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cell_dists = F.array(
        *[_l2_to_literal(F.col("query_vec"), c) for c in idx.centroids]
    )
    probe = (
        queries.select(
            "query_id", "query_vec",
            F.posexplode(cell_dists).alias("cell", "cdist"),
        )
        .withColumn(
            "crn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("cdist").asc(), F.col("cell").asc()
                )
            ),
        )
        .filter(F.col("crn") <= 4)
        .select("query_id", "query_vec", "cell")
    )
    scored = idx.assignments.join(
        F.broadcast(probe), F.col(_CLUSTER_COL) == F.col("cell")
    ).select(
        "query_id",
        "vec_id",
        l2_sq(F.col("embedding"), F.col("query_vec")).alias("distance"),
    )
    res = (
        scored.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("distance").asc(), F.col("vec_id").asc()
                )
            ),
        )
        .filter(F.col("rank") <= _BATCH_K)
        .select(
            "query_id", "vec_id", F.round("distance", 6).alias("distance"), "rank"
        )
    )
    exact = {}
    for r in batch_knn(emb, queries, _BATCH_K).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    got = {}
    for r in res.select("query_id", "vec_id").collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [len(got.get(q, set()) & ids) / len(ids) for q, ids in exact.items()]
    mean = sum(recalls) / len(recalls)
    if mean < 0.6:
        raise AssertionError(f"ann_ivf_batch_probe: mean recall@5 {mean:.2f} < 0.6")
    return res.withColumn("mean_recall_at_5", F.lit(round(mean, 4)))


@query("ann_ivf_cosine_full_probe", oracle=_knn_oracle(_COS, "score", "DESC"))
def ann_ivf_cosine_full_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine IVF (cells on the unit sphere, raw vectors stored): at full
    probe the reranked scores are bit-identical to exact cosine kNN."""
    emb = _emb(spark, sf_dir)
    idx = IvfIndex.build(emb, nlist=8, seed=42, max_iter=5, metric="cosine")
    res = idx.search(_qvec(spark, sf_dir), K, nprobe=8)
    return res.select("vec_id", F.round("score", 6).alias("score"))


def _pq(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    pqz = ProductQuantizer.fit(emb, m=16, ksub=64, seed=42, iters=8)
    return emb, pqz, pqz.encode(emb).select("vec_id", "pq_codes")


def _adc_oracle_sql(books, vec_sql: str, proj_ctes: str = "") -> str:
    """Shared ADC oracle body for the frozen PQ/OPQ gates (round 14,
    VERDICT r13 #2): replay encode (per-subspace argmin over left-fold
    squared-diff distances against the FROZEN codebook literals), the
    query's ADC table, and the per-row subspace-order distance fold —
    every float64 op in the same order as the exact_fold engine path
    (operators/pq.py), so codes, distances, AND the in-row recall column
    are bit-exact. ``vec_sql`` is the corpus-vector accessor the encode
    CTE scores ('e.embedding' with ::DOUBLE casts, or a projected
    rotated list); ``proj_ctes`` prepends rotation CTEs for OPQ."""
    m, ksub, dsub = books.shape

    def wrep(x: float) -> str:
        return repr(float(x))

    cb_cols = ", ".join(f"c{t}" for t in range(dsub))
    cb_rows = ",\n".join(
        f"({s}, {j}, " + ", ".join(wrep(books[s][j][t]) for t in range(dsub)) + ")"
        for s in range(m)
        for j in range(ksub)
    )

    def dist(vec_at) -> str:
        # ((x0-c0)*(x0-c0) + (x1-c1)*(x1-c1)) + … — SQL + is
        # left-associative, matching the engine's accumulation order
        return " + ".join(
            f"(({vec_at(t)}) - c.c{t}) * (({vec_at(t)}) - c.c{t})"
            for t in range(dsub)
        )

    vdist = dist(lambda t: f"{vec_sql}[c.s*{dsub} + {t + 1}]")
    qdist = dist(lambda t: f"qrot.rv[c.s*{dsub} + {t + 1}]")
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
{proj_ctes}cb (s, j, {cb_cols}) AS (VALUES
{cb_rows}
),
codes AS (
  SELECT vec_id, s, j FROM (
    SELECT v.vec_id, c.s, c.j,
           row_number() OVER (
             PARTITION BY v.vec_id, c.s
             ORDER BY {vdist} ASC, c.j ASC
           ) AS rn
    FROM vsrc v CROSS JOIN cb c
  ) WHERE rn = 1
),
lut AS (
  SELECT c.s, c.j, {qdist} AS d
  FROM cb c CROSS JOIN qrot
),
adc AS (
  SELECT codes.vec_id,
         list_reduce(list(lut.d ORDER BY codes.s), (a, b) -> a + b) AS dist
  FROM codes JOIN lut ON lut.s = codes.s AND lut.j = codes.j
  GROUP BY codes.vec_id
),
top AS (SELECT vec_id, dist FROM adc ORDER BY dist ASC, vec_id ASC LIMIT {K}),
exact10 AS (
  SELECT e.vec_id FROM embeddings e, q
  ORDER BY {_L2} ASC, e.vec_id ASC
  LIMIT {K}
),
rec AS (
  SELECT round(CAST((SELECT count(*) FROM top JOIN exact10 USING (vec_id))
               AS DOUBLE) / {K}, 4) AS recall_at_10
)
SELECT top.vec_id, round(top.dist, 6) AS distance, rec.recall_at_10
FROM top, rec
"""


def _pq_adc_oracle() -> str:
    """Frozen-codebook PQ ADC oracle: vsrc is the raw corpus (list
    elements cast component-wise to DOUBLE, the same exact widening the
    engine's np.float64 conversion performs), qrot is the raw query."""
    from vector_db_spark.operators.pq import load_frozen_doc_pq

    pqz = load_frozen_doc_pq()
    dim = pqz.m * pqz.dsub
    proj = f"""vsrc AS (
  SELECT e.vec_id,
         [{", ".join(f"e.embedding[{i + 1}]::DOUBLE" for i in range(dim))}] AS rv
  FROM embeddings e
),
qrot AS (
  SELECT [{", ".join(f"q.qv[{i + 1}]::DOUBLE" for i in range(dim))}] AS rv
  FROM q
),
"""
    return _adc_oracle_sql(pqz.codebooks, "v.rv", proj)


@query("pq_adc_knn", oracle=_pq_adc_oracle())
def pq_adc_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-domain search: top-k by asymmetric distance over the
    M-byte PQ codes column alone — served from the FROZEN codebooks
    (pq.load_frozen_doc_pq; quantizers train once and ship, the fit
    machinery stays hash-gated by pq_rerank_full_shortlist).

    Hash-exact as of round 14 (VERDICT r13 #2, rows-only → converted):
    encode argmin, the ADC table, and the per-row distance are
    order-pinned left folds over the frozen literals, so the DuckDB
    oracle replays codes, distances, and the recall column bit-exactly.
    Recall stays gated in-row (floor 0.3; raw ADC on these embeddings
    measures ~0.6; the rerank variants recover the rest)."""
    from vector_db_spark.operators.pq import load_frozen_doc_pq

    emb = _emb(spark, sf_dir)
    pqz = load_frozen_doc_pq()
    enc = pqz.encode(emb).select("vec_id", "pq_codes")
    res = pqz.search(enc, _qvec(spark, sf_dir), K)
    res = res.select("vec_id", F.round("distance", 6).alias("distance"))
    return _recall_gated(res, _exact_ids(spark, sf_dir), 0.3, "pq_adc_knn")


@query("pq_rerank_full_shortlist", oracle=_knn_oracle(_L2, "distance", "ASC"))
def pq_rerank_full_shortlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PQ correctness gate: with the ADC shortlist covering the whole
    corpus, encode → ADC → shortlist → raw-vector rerank must reproduce
    exact kNN bit-for-bit (same oracle as knn_l2) — proving the whole
    pipeline before the shortlist is tightened for scale."""
    emb, pqz, enc = _pq(spark, sf_dir)
    res = pqz.search(enc, _qvec(spark, sf_dir), K, rerank=emb, shortlist=10_000_000)
    return res.select("vec_id", F.round("distance", 6).alias("distance"))


@query("ivfpq_exhaustive", oracle=_knn_oracle(_L2, "distance", "ASC"))
def ivfpq_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF-PQ correctness gate: full probe + corpus-sized shortlist
    must reproduce exact kNN bit-for-bit — verifying cell assignment,
    residual encoding, per-cell ADC tables, and the rerank join at once."""
    emb = _emb(spark, sf_dir)
    idx = IvfPqIndex.build(emb, nlist=8, m=16, ksub=64, seed=42, max_iter=5)
    res = idx.search(_qvec(spark, sf_dir), K, nprobe=8, shortlist=10_000_000)
    return res.select("vec_id", F.round("distance", 6).alias("distance"))


@query(
    "pq_filtered_rerank_exhaustive",
    oracle=_knn_oracle(_L2, "distance", "ASC", "WHERE e.label = 3"),
)
def pq_filtered_rerank_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered-PQ correctness gate: predicate pre-filters the codes scan
    before ADC (min(k, matches) contract), and with a corpus-sized
    shortlist the rerank must reproduce exact FILTERED kNN bit-for-bit —
    completing the filtered-search matrix across every index family
    (exact, IVF, LSH, graph, PQ, IVF-PQ; ≅ usearch filtered_search,
    reference: src/core/index/usearch_index.rs:68-85)."""
    emb, pqz, _ = _pq(spark, sf_dir)
    enc = pqz.encode(emb).select("vec_id", "label", "pq_codes")
    res = pqz.search(
        enc,
        _qvec(spark, sf_dir),
        K,
        rerank=emb,
        shortlist=10_000_000,
        predicate=F.col("label") == 3,
    )
    return res.select("vec_id", F.round("distance", 6).alias("distance"))


@query(
    "ivfpq_filtered_exhaustive",
    oracle=_knn_oracle(_L2, "distance", "ASC", "WHERE e.label = 3"),
)
def ivfpq_filtered_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered IVF-PQ gate: the predicate composes with cell pruning
    (probed partitions only, metadata pushdown within them); at full
    probe + corpus shortlist it must equal exact filtered kNN."""
    emb = _emb(spark, sf_dir)
    idx = IvfPqIndex.build(emb, nlist=8, m=16, ksub=64, seed=42, max_iter=5)
    res = idx.search(
        _qvec(spark, sf_dir),
        K,
        nprobe=8,
        shortlist=10_000_000,
        predicate=F.col("label") == 3,
    )
    return res.select("vec_id", F.round("distance", 6).alias("distance"))


def _ivfpq_probe_oracle() -> str:
    import json as _json
    import os as _os

    from vector_db_spark.operators.ivfpq import FROZEN_DOC_IVFPQ_PATH

    rows, cols, nlist, dim = _ivf_cb_values()
    path = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        FROZEN_DOC_IVFPQ_PATH,
    )
    with open(path) as f:
        art = _json.load(f)
    books = art["codebooks"]
    m, ksub, dsub = len(books), len(books[0]), len(books[0][0])
    pq_cols = ", ".join(f"p{t}" for t in range(dsub))
    pq_rows = ",\n".join(
        f"({s}, {j}, " + ", ".join(repr(float(x)) for x in books[s][j]) + ")"
        for s in range(m)
        for j in range(ksub)
    )

    def pq_dist(rv: str) -> str:
        # ((r0-p0)*(r0-p0) + …) — the exact_fold encode/LUT fold
        return " + ".join(
            f"(({rv}[p.s*{dsub} + {t + 1}]) - p.p{t}) * "
            f"(({rv}[p.s*{dsub} + {t + 1}]) - p.p{t})"
            for t in range(dsub)
        )

    vresid = ", ".join(
        f"e.embedding[{d + 1}]::DOUBLE - cc.c{d}" for d in range(dim)
    )
    qresid = ", ".join(f"q.qv[{d + 1}]::DOUBLE - cc.c{d}" for d in range(dim))
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
cc (j, {cols}) AS (VALUES
{rows}
),
pqc (s, j2, {pq_cols}) AS (VALUES
{pq_rows}
),
assign AS (
  SELECT vec_id, j AS cell FROM (
    SELECT e.vec_id, c.j,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_ivf_cell_dist("e.embedding", dim)} ASC, c.j ASC
           ) AS rn
    FROM embeddings e CROSS JOIN cc c
  ) WHERE rn = 1
),
qcells AS (
  SELECT c.j AS cell FROM cc c CROSS JOIN q
  ORDER BY {_ivf_cell_dist("q.qv", dim)} ASC, c.j ASC
  LIMIT 4
),
resid AS (
  SELECT a.vec_id, a.cell, [{vresid}] AS rv
  FROM embeddings e
  JOIN assign a USING (vec_id)
  JOIN cc ON cc.j = a.cell
  WHERE a.cell IN (SELECT cell FROM qcells)
),
codes AS (
  SELECT vec_id, cell, s, j2 FROM (
    SELECT r.vec_id, r.cell, p.s, p.j2,
           row_number() OVER (
             PARTITION BY r.vec_id, p.s
             ORDER BY {pq_dist("r.rv")} ASC, p.j2 ASC
           ) AS rn
    FROM resid r CROSS JOIN pqc p
  ) WHERE rn = 1
),
qresid AS (
  SELECT qc.cell, [{qresid}] AS rv
  FROM qcells qc JOIN cc ON cc.j = qc.cell CROSS JOIN q
),
lut AS (
  SELECT qr.cell, p.s, p.j2, {pq_dist("qr.rv")} AS d
  FROM qresid qr CROSS JOIN pqc p
),
adc AS (
  SELECT codes.vec_id,
         list_reduce(list(lut.d ORDER BY codes.s), (a, b) -> a + b) AS dist
  FROM codes
  JOIN lut ON lut.cell = codes.cell AND lut.s = codes.s AND lut.j2 = codes.j2
  GROUP BY codes.vec_id
),
short AS (SELECT vec_id FROM adc ORDER BY dist ASC, vec_id ASC LIMIT 100),
top AS (
  SELECT e.vec_id, {_L2} AS distance
  FROM embeddings e JOIN short USING (vec_id) CROSS JOIN q
  ORDER BY distance ASC, e.vec_id ASC
  LIMIT {K}
),
exact10 AS (
  SELECT e.vec_id FROM embeddings e, q
  ORDER BY {_L2} ASC, e.vec_id ASC
  LIMIT {K}
),
rec AS (
  SELECT round(CAST((SELECT count(*) FROM top JOIN exact10 USING (vec_id))
               AS DOUBLE) / {K}, 4) AS recall_at_10
)
SELECT top.vec_id, round(top.distance, 6) AS distance, rec.recall_at_10
FROM top, rec
"""


@query("ivfpq_probe", oracle=_ivfpq_probe_oracle())
def ivfpq_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production IVF-PQ shape: probe half the cells, ADC over
    M-byte codes, 10×k shortlist rerank — served from the FROZEN
    composition (ivfpq.load_frozen_doc_ivfpq: frozen coarse centroids +
    frozen residual codebooks, exact-fold assignment/encode/ADC).

    Hash-exact as of round 14: the DuckDB oracle replays coarse argmin,
    codegen residuals, per-subspace code argmin, the PER-CELL query ADC
    tables, the subspace-order distance fold, the 100-row shortlist, the
    exact rerank, AND the in-row recall column. Production kernels stay
    hash-gated at lossless settings (ivfpq_exhaustive) and tuned-recall
    pinned. Floor 0.5 stays enforced in-row (measured 0.8
    single-query)."""
    from vector_db_spark.operators.ivfpq import load_frozen_doc_ivfpq

    emb = _emb(spark, sf_dir)
    idx = load_frozen_doc_ivfpq(emb)
    res = idx.search(_qvec(spark, sf_dir), K, nprobe=4, shortlist=100)
    res = res.select("vec_id", F.round("distance", 6).alias("distance"))
    return _recall_gated(res, _exact_ids(spark, sf_dir), 0.5, "ivfpq_probe")


@query("ann_graph_exhaustive", oracle=_knn_oracle(_L2, "distance", "ASC"))
def ann_graph_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The graph-ANN correctness gate: nprobe = nlist + unbounded beam
    visits every node of every connected cell graph, so per-cell NSW beam
    search + global TakeOrdered merge must reproduce exact kNN bit-for-bit
    (same oracle as knn_l2) — verifying cell assignment, adjacency
    construction, and the beam machinery before approximation is dialed
    in. (HNSW-equivalent path; reference: src/core/index/hnsw_index.rs.)"""
    from vector_db_spark.operators.graph import GraphAnnIndex

    emb = _emb(spark, sf_dir)
    idx = GraphAnnIndex.build(emb, nlist=8, m=16, ef_construction=200, seed=42, max_iter=5)
    res = idx.search(_qvec(spark, sf_dir), K, nprobe=8, ef_search=10**6)
    return res.select("vec_id", F.round("distance", 6).alias("distance"))


@query("ann_graph_nsw")
def ann_graph_nsw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production graph path: reference serving regime (M=16,
    ef_search=200, src/core/index_factory.rs:110-114), 6 of 8 cells probed
    (rows-only; recall@10 >= 0.95 pinned in tests/test_graph.py)."""
    from vector_db_spark.operators.graph import GraphAnnIndex

    emb = _emb(spark, sf_dir)
    idx = GraphAnnIndex.build(emb, nlist=8, m=16, ef_construction=200, seed=42, max_iter=5)
    res = idx.search(_qvec(spark, sf_dir), K, nprobe=6, ef_search=200)
    res = res.select("vec_id", F.round("distance", 6).alias("distance"))
    return _recall_gated(res, _exact_ids(spark, sf_dir), 0.6, "ann_graph_nsw")


@query(
    "ann_graph_filtered_exhaustive",
    oracle=_knn_oracle(_L2, "distance", "ASC", "WHERE e.label = 3"),
)
def ann_graph_filtered_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered-graph correctness gate: unbounded beam + all cells probed,
    predicate admitted-during-traversal (non-matching nodes still route the
    beam, ≅ usearch filtered_search, reference:
    src/core/index/usearch_index.rs:68-85) must equal exact filtered kNN."""
    from vector_db_spark.operators.graph import GraphAnnIndex

    emb = _emb(spark, sf_dir)
    idx = GraphAnnIndex.build(emb, nlist=8, m=16, ef_construction=200, seed=42, max_iter=5)
    res = idx.search(
        _qvec(spark, sf_dir),
        K,
        nprobe=8,
        ef_search=10**6,
        predicate=F.col("label") == 3,
    )
    return res.select("vec_id", F.round("distance", 6).alias("distance"))


@query("ann_ivf_ip_full_probe", oracle=_knn_oracle(_IP, "score", "DESC"))
def ann_ivf_ip_full_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIPS IVF (cells over [x, sqrt(M²−|x|²)] augmented vectors — the
    reduction that makes max-inner-product an L2 problem): at full probe
    the raw-dot rerank is bit-identical to exact IP kNN."""
    emb = _emb(spark, sf_dir)
    idx = IvfIndex.build(emb, nlist=8, seed=42, max_iter=5, metric="ip")
    res = idx.search(_qvec(spark, sf_dir), K, nprobe=8)
    return res.select("vec_id", F.round("score", 6).alias("score"))


@query("ann_ivf_append_full_probe", oracle=_knn_oracle(_L2, "distance", "ASC"))
def ann_ivf_append_full_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-maintenance gate: build the quantizer + index on HALF
    the corpus, `append` the other half (frozen centroids, append-only
    files — operators/ann.py IvfIndex.append), then full-probe. Must
    reproduce exact kNN over the FULL corpus bit-for-bit, proving appended
    rows are assigned/searched identically to built rows."""
    emb = _emb(spark, sf_dir)
    idx = IvfIndex.build(
        emb.filter(F.col("vec_id") % 2 == 0), nlist=8, seed=42, max_iter=5
    )
    idx.append(emb.filter(F.col("vec_id") % 2 == 1))
    res = idx.search(_qvec(spark, sf_dir), K, nprobe=8, metric="l2")
    return res.select("vec_id", F.round("distance", 6).alias("distance"))


@query("ann_ivf_retrain_ip_full_probe", oracle=_knn_oracle(_IP, "score", "DESC"))
def ann_ivf_retrain_ip_full_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantizer-refresh gate, on the metric where retraining matters
    most: a MIPS index built on half the corpus freezes M = max build
    norm, appended larger-norm vectors clamp their augmentation (probe
    recall decays; range pruning widens via the norm watermark).
    ``retrain`` refits centroids + M over the full current corpus and
    resets the watermark — full-probe search afterwards must be
    bit-identical to exact IP kNN over everything."""
    emb = _emb(spark, sf_dir)
    idx = IvfIndex.build(
        emb.filter(F.col("vec_id") % 2 == 0), nlist=8, seed=42, max_iter=5,
        metric="ip",
    )
    idx.append(emb.filter(F.col("vec_id") % 2 == 1))
    fresh = idx.retrain(max_iter=5)
    res = fresh.search(_qvec(spark, sf_dir), K, nprobe=8)
    return res.select("vec_id", F.round("score", 6).alias("score"))


_RANGE_THRESHOLD = 1.6

_RANGE_ORACLE = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
m AS (SELECT e.vec_id, {_L2} AS distance FROM embeddings e, q)
SELECT vec_id, round(distance, 6) AS distance
FROM m WHERE distance <= {_RANGE_THRESHOLD}
ORDER BY distance, vec_id
"""


@query("ann_ivf_range_search", oracle=_RANGE_ORACLE)
def ann_ivf_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """faiss-style range search (all rows with squared-L2 <= t) through
    the IVF index: the triangle inequality prunes cells LOSSLESSLY
    (per-cell covering radii), so unlike top-k probes this is value-exact
    against the unindexed filter at ANY nlist/nprobe — an indexed query
    with a hard oracle row and real partition pruning."""
    emb = _emb(spark, sf_dir)
    idx = IvfIndex.build(emb, nlist=8, seed=42, max_iter=5)
    res = idx.range_search(_qvec(spark, sf_dir), _RANGE_THRESHOLD)
    return res.select("vec_id", F.round("distance", 6).alias("distance"))


_BATCH_RANGE_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5
),
m AS (
  SELECT q.query_id, e.vec_id, {_L2} AS dist FROM embeddings e, q
)
SELECT query_id, vec_id, round(dist, 6) AS distance
FROM m WHERE dist <= {_RANGE_THRESHOLD}
ORDER BY query_id, dist, vec_id
"""


@query("ann_ivf_batch_range", oracle=_BATCH_RANGE_ORACLE)
def ann_ivf_batch_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched LOSSLESS range search through the IVF index
    (operators/ann.IvfIndex.range_search_batch): per-query
    triangle-inequality cell pruning, one batched exact verify over the
    union of surviving cells — value-exact against the full-corpus
    batched range scan at ANY nlist, the n-query twin of
    ann_ivf_range_search."""
    emb = _emb(spark, sf_dir)
    idx = IvfIndex.build(emb, nlist=8, seed=42, max_iter=5)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = idx.range_search_batch(queries, _RANGE_THRESHOLD)
    return res.select(
        "query_id", "vec_id", F.round("distance", 6).alias("distance")
    )


@query("ann_lsh_range_exhaustive", oracle=_RANGE_ORACLE)
def ann_lsh_range_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range search through the LSH backend at full probe
    (probe_radius = n_bits probes every bucket of every table, so the
    candidate union is the whole corpus and the result must equal the
    full-corpus range scan bit-for-bit — same oracle row as the IVF and
    graph range gates). Verification is exact at ANY radius (every
    emitted row passes the true threshold); only coverage is
    approximate below full probe (operators/ann.py
    CosineLshIndex.range_search)."""
    emb = _emb(spark, sf_dir)
    idx = CosineLshIndex.build(emb, dim=64, n_bits=6, n_tables=4, seed=42)
    res = idx.range_search(
        _qvec(spark, sf_dir), _RANGE_THRESHOLD, metric="l2", probe_radius=6
    )
    return res.select("vec_id", F.round("distance", 6).alias("distance"))


@query("ann_graph_range_exhaustive", oracle=_RANGE_ORACLE)
def ann_graph_range_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range search through the NSW beam family (VERDICT r10 #8 — the
    last [top-k | range] × family gap; IVF's triangle-inequality gate is
    ann_ivf_range_search above). Every probed cell's beam runs at
    saturating ef and keeps every admitted node with squared-L2 ≤ t, so
    the result must equal the full-corpus range scan bit-for-bit — the
    same oracle row as the IVF gate. Per-candidate verification is exact
    at ANY ef (the beam distance IS the metric); only visit coverage is
    approximate below saturation (operators/graph.py range_search)."""
    from vector_db_spark.operators.graph import GraphAnnIndex

    emb = _emb(spark, sf_dir)
    idx = GraphAnnIndex.build(
        emb, nlist=8, m=16, ef_construction=200, seed=42, max_iter=5
    )
    res = idx.range_search(
        _qvec(spark, sf_dir), _RANGE_THRESHOLD, nprobe=8, ef_search=10**6
    )
    return res.select("vec_id", F.round("distance", 6).alias("distance"))


@query("ann_graph_batch_range_exhaustive", oracle=_BATCH_RANGE_ORACLE)
def ann_graph_batch_range_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched range search through the NSW beam family (VERDICT r11 #3
    — faiss ``range_search`` is natively batched; the IVF/exact batch
    cells landed in r11, this closes the graph one). One cogrouped
    saturated beam per (cell, query) with exact per-candidate verify —
    at nprobe = nlist over connected cells the result equals the
    full-corpus batched range scan bit-for-bit (the same oracle rows as
    ann_ivf_batch_range; operators/graph.py range_search_batch)."""
    from vector_db_spark.operators.graph import GraphAnnIndex

    emb = _emb(spark, sf_dir)
    idx = GraphAnnIndex.build(
        emb, nlist=8, m=16, ef_construction=200, seed=42, max_iter=5
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = idx.range_search_batch(
        queries, _RANGE_THRESHOLD, nprobe=8, ef_search=10**6
    )
    return res.select(
        "query_id", "vec_id", F.round("distance", 6).alias("distance")
    )


@query("ann_lsh_batch_range_exhaustive", oracle=_BATCH_RANGE_ORACLE)
def ann_lsh_batch_range_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched range search through the LSH backend at full probe
    (VERDICT r11 #3): candidate generation is search_batch's distributed
    (table, bucket) equi-join — each query sees its OWN probed buckets,
    no driver loop — and radius = n_bits probes every bucket, so the
    result equals the full-corpus batched range scan bit-for-bit (same
    oracle rows as ann_ivf_batch_range; operators/ann.py
    CosineLshIndex.range_search_batch). Verification is exact at ANY
    radius; only coverage is approximate below full probe."""
    emb = _emb(spark, sf_dir)
    idx = CosineLshIndex.build(emb, dim=64, n_bits=6, n_tables=4, seed=42)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = idx.range_search_batch(
        queries, _RANGE_THRESHOLD, metric="l2", probe_radius=6
    )
    return res.select(
        "query_id", "vec_id", F.round("distance", 6).alias("distance")
    )


@query("pca_rerank_full_rank", oracle=_knn_oracle(_L2, "distance", "ASC"))
def pca_rerank_full_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA correctness gate (operators/pca.py): with k = dim the learned
    basis is a full orthonormal rotation, L2 is preserved, and the
    shortlist→rerank pipeline must reproduce exact kNN — verifying the
    fit/project/search machinery before any rank is discarded (same gate
    pattern as ann_ivf_full_probe)."""
    from vector_db_spark.operators.pca import fit_pca, pca_shortlist_rerank

    emb = _emb(spark, sf_dir)
    model = fit_pca(emb, k=64)
    res = pca_shortlist_rerank(emb, model, _qvec(spark, sf_dir), K, shortlist=100)
    return res.select("vec_id", F.round("distance", 6).alias("distance"))


def _pca_shortlist_oracle() -> str:
    """Frozen-rotation oracle: project corpus AND query with the SAME
    left-associated folds over the frozen components (projection offsets
    arrive as the identical Python-computed literals the Spark plan
    embeds), shortlist top-100 by PCA-space squared L2, exact-rerank
    from raw vectors — every float op in the same order as the engine,
    so the reduced-rank path is hash-exact, not merely recall-gated."""
    from vector_db_spark.operators.pca import _fold_dot, load_frozen_doc_pca
    from vector_db_spark.oracle import l2_sq_sql
    from vector_db_spark.queries.vector_queries import QUERY_VEC_ID

    m = load_frozen_doc_pca()
    dim = len(m.mean)

    def wrep(x: float) -> str:
        return repr(float(x))

    proj_cols = []
    qp_cols = []
    for j in range(m.k):
        offset = _fold_dot(m.components[j], m.mean)
        dot = " + ".join(
            f"(e.embedding[{i + 1}]::DOUBLE * {wrep(m.components[j][i])})"
            for i in range(dim)
        )
        proj_cols.append(f"({dot}) - {wrep(offset)} AS p{j}")
        qdot = " + ".join(
            f"({wrep(m.components[j][i])} * (q.qv[{i + 1}]::DOUBLE - {wrep(m.mean[i])}))"
            for i in range(dim)
        )
        qp_cols.append(f"({qdot}) AS c{j}")
    dist_p = " + ".join(
        f"(p.p{j} - qp.c{j}) * (p.p{j} - qp.c{j})" for j in range(m.k)
    )
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
qp AS (SELECT {", ".join(qp_cols)} FROM q),
proj AS (SELECT e.vec_id, {", ".join(proj_cols)} FROM embeddings e),
short AS (
  SELECT p.vec_id, {dist_p} AS dp
  FROM proj p, qp
  ORDER BY dp ASC, p.vec_id ASC
  LIMIT 100
),
top AS (
  SELECT e.vec_id, {l2_sq_sql("e.embedding", "q.qv")} AS distance
  FROM embeddings e JOIN short s USING (vec_id) CROSS JOIN q
  ORDER BY distance ASC, e.vec_id ASC
  LIMIT {K}
),
exact10 AS (
  SELECT e.vec_id FROM embeddings e, q
  ORDER BY {l2_sq_sql("e.embedding", "q.qv")} ASC, e.vec_id ASC
  LIMIT {K}
),
rec AS (
  SELECT round(CAST((SELECT count(*) FROM top JOIN exact10 USING (vec_id))
               AS DOUBLE) / {K}, 4) AS recall_at_10
)
SELECT top.vec_id, round(top.distance, 6) AS distance, rec.recall_at_10
FROM top, rec
"""


@query("pca_shortlist_search", oracle=_pca_shortlist_oracle())
def pca_shortlist_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production PCA path: k=24 coordinates (2.7× scan-byte cut on
    this corpus), 100-row shortlist, exact re-rank — served from the
    FROZEN rotation artifact (pca.load_frozen_doc_pca; rotations train
    once and ship, the fit_pca machinery stays hash-gated at full rank
    by pca_rerank_full_rank).

    Hash-exact as of round 13 (VERDICT r12 #4): projection offsets and
    the query's principal coordinates are order-pinned left folds, so
    the DuckDB oracle replays shortlist AND rerank bit-exactly. The
    reduced-rank recall floor stays enforced in-row (0.7) and ≥ 0.9 is
    pinned in tests/test_pq.py."""
    from vector_db_spark.operators.pca import (
        load_frozen_doc_pca,
        pca_shortlist_rerank,
    )

    emb = _emb(spark, sf_dir)
    model = load_frozen_doc_pca()
    res = pca_shortlist_rerank(emb, model, _qvec(spark, sf_dir), K, shortlist=100)
    res = res.select("vec_id", F.round("distance", 6).alias("distance"))
    return _recall_gated(res, _exact_ids(spark, sf_dir), 0.7, "pca_shortlist_search")


_BATCH_FILTERED_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q.query_id, e.vec_id, {_BATCH_L2} AS dist
  FROM embeddings e, q WHERE e.label = 3
),
ranked AS (
  SELECT query_id, vec_id, dist,
         row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rank
  FROM scored
)
SELECT query_id, vec_id, round(dist, 6) AS distance, rank
FROM ranked WHERE rank <= {_BATCH_K}
"""


@query("ann_ivf_batch_filtered_exhaustive", oracle=_BATCH_FILTERED_ORACLE)
def ann_ivf_batch_filtered_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered BATCH ANN gate (round-3: predicate threaded through
    search_batch, closing the single-query/batch asymmetry — reference
    semantics: usearch filtered_search composed over a query set,
    src/core/index/usearch_index.rs:68-85). Exhaustive probe + predicate
    must reproduce exact filtered batch kNN bit-for-bit: every query sees
    only label=3 rows, pre-filtered BEFORE the rerank so the corpus-side
    scan prunes on both cell and label."""
    emb = _emb(spark, sf_dir)
    idx = IvfIndex.build(emb, nlist=8, seed=42, max_iter=5)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = idx.search_batch(
        queries, _BATCH_K, nprobe=8, metric="l2", predicate=F.col("label") == 3
    )
    return res.select(
        "query_id", "vec_id", F.round("distance", 6).alias("distance"), "rank"
    )


_HAMMING_BATCH_FILTERED_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q.query_id, e.vec_id,
         CAST(length(list_filter(range(1, 65),
           i -> (e.embedding[i] > 0) <> (q.qv[i] > 0))) AS BIGINT) AS hamming
  FROM embeddings e, q WHERE e.label = 3
),
ranked AS (
  SELECT query_id, vec_id, hamming,
         row_number() OVER (PARTITION BY query_id ORDER BY hamming, vec_id) AS rank
  FROM scored
)
SELECT query_id, vec_id, hamming, rank FROM ranked WHERE rank <= {_BATCH_K}
"""


@query("hamming_batch_filtered_exhaustive", oracle=_HAMMING_BATCH_FILTERED_ORACLE)
def hamming_batch_filtered_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered batch Hamming gate: the 1-bit code corpus carries its
    metadata columns, the predicate pre-filters candidates before the
    XOR+popcount scoring, and the result is min(k, matches) per query —
    value-exact against DuckDB recomputing sign-bit Hamming from the raw
    floats under the same WHERE."""
    from vector_db_spark.operators.binary import batch_knn_hamming, binary_quantize

    emb = _emb(spark, sf_dir)
    codes = binary_quantize(emb, dim=64).select("vec_id", "codes", "label")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = batch_knn_hamming(
        codes, queries, _BATCH_K, predicate=F.col("label") == 3
    )
    return res.select("query_id", "vec_id", "hamming", "rank")


@query("ann_ivf_range_after_append", oracle=_RANGE_ORACLE)
def ann_ivf_range_after_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-3 regression gate for the stale-radii append bug (ADVICE r2
    high): build on half the corpus, force + PERSIST cell radii via
    save(), append the other half with path=... (which must rewrite
    meta.json, invalidating the radii), reload, range-search. A reload
    that kept the pre-append radii would prune cells containing appended
    true matches; the oracle is the full-corpus range scan, so any stale
    pruning is a hard hash mismatch."""
    import tempfile

    emb = _emb(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="ivf_range_append_")
    idx = IvfIndex.build(
        emb.filter(F.col("vec_id") % 2 == 0), nlist=8, seed=42, max_iter=5
    )
    idx.ensure_cell_radii()
    idx.save(path)
    IvfIndex.load(spark, path).append(
        emb.filter(F.col("vec_id") % 2 == 1), path=path
    )
    re = IvfIndex.load(spark, path)
    res = re.range_search(_qvec(spark, sf_dir), _RANGE_THRESHOLD)
    return res.select("vec_id", F.round("distance", 6).alias("distance"))


from vector_db_spark.oracle import cosine_sim_sql as _cos_sql  # noqa: E402

_BATCH_COS_FILTERED_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q.query_id, e.vec_id, {_cos_sql("e.embedding", "q.qv")} AS sim
  FROM embeddings e, q WHERE e.label = 3
),
ranked AS (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, vec_id, round(sim, 6) AS score, rank
FROM ranked WHERE rank <= {_BATCH_K}
"""


@query("ann_lsh_batch_filtered_exhaustive", oracle=_BATCH_COS_FILTERED_ORACLE)
def ann_lsh_batch_filtered_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch LSH gate (round 3 completes the single↔batch matrix across
    all index families): with n_bits=1 and probe_radius=1 every bucket of
    every table is probed, so the batch bucket-join + dedup + predicate +
    per-query rerank must reproduce exact filtered batch cosine kNN
    bit-for-bit."""
    emb = _emb(spark, sf_dir)
    idx = CosineLshIndex.build(emb, dim=64, n_bits=1, n_tables=2, seed=42)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = idx.search_batch(
        queries, _BATCH_K, probe_radius=1, predicate=F.col("label") == 3
    )
    return res.select(
        "query_id", "vec_id", F.round("score", 6).alias("score"), "rank"
    )


@query("ann_graph_batch_exhaustive", oracle=_BATCH_ORACLE)
def ann_graph_batch_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch graph-ANN gate: nprobe = nlist + unbounded beam visits every
    connected node, so the cogrouped (cell × probing-queries) beam search
    must reproduce exact batch kNN bit-for-bit — verifying the cogroup
    plumbing, per-cell adjacency decode and per-query merge before any
    approximation is dialed in."""
    from vector_db_spark.operators.graph import GraphAnnIndex

    emb = _emb(spark, sf_dir)
    idx = GraphAnnIndex.build(
        emb, nlist=8, m=16, ef_construction=200, seed=42, max_iter=5
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = idx.search_batch(queries, _BATCH_K, nprobe=8, ef_search=10**9)
    return res.select(
        "query_id", "vec_id", F.round("distance", 6).alias("distance"), "rank"
    )


@query("ivfpq_batch_exhaustive", oracle=_BATCH_ORACLE)
def ivfpq_batch_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch IVF-PQ gate: full probe + corpus-sized shortlist makes the
    ADC pass a permutation ahead of an exhaustive raw-vector rerank, so
    the cogrouped ADC + global shortlist + rerank pipeline must reproduce
    exact batch kNN bit-for-bit."""
    emb = _emb(spark, sf_dir)
    idx = IvfPqIndex.build(emb, nlist=8, m=16, ksub=64, seed=42, max_iter=5)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = idx.search_batch(queries, _BATCH_K, nprobe=8, shortlist=100000)
    return res.select(
        "query_id", "vec_id", F.round("distance", 6).alias("distance"), "rank"
    )


from vector_db_spark.oracle import dot_sql as _dot_sql  # noqa: E402


def _batch_metric_oracle(expr: str, out: str, direction: str) -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q.query_id, e.vec_id, {expr} AS s FROM embeddings e, q
),
ranked AS (
  SELECT query_id, vec_id, s,
         row_number() OVER (PARTITION BY query_id ORDER BY s {direction}, vec_id) AS rank
  FROM scored
)
SELECT query_id, vec_id, round(s, 6) AS {out}, rank
FROM ranked WHERE rank <= {_BATCH_K}
"""


@query(
    "ann_ivf_batch_cosine_full_probe",
    oracle=_batch_metric_oracle(_cos_sql("e.embedding", "q.qv"), "score", "DESC"),
)
def ann_ivf_batch_cosine_full_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine batch IVF at full probe == exact batch cosine kNN — pins the
    probe kernel's unit-sphere mapping composed with the true-metric
    rerank on the batch path."""
    emb = _emb(spark, sf_dir)
    idx = IvfIndex.build(emb, nlist=8, seed=42, max_iter=5, metric="cosine")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = idx.search_batch(queries, _BATCH_K, nprobe=8)
    return res.select(
        "query_id", "vec_id", F.round("score", 6).alias("score"), "rank"
    )


@query(
    "ann_ivf_batch_ip_full_probe",
    oracle=_batch_metric_oracle(_dot_sql("e.embedding", "q.qv"), "score", "DESC"),
)
def ann_ivf_batch_ip_full_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIPS batch IVF at full probe == exact batch IP kNN — pins the probe
    kernel's zero-augmentation (queries sit on the MIPS hyperplane)
    composed with the raw-dot rerank on the batch path."""
    emb = _emb(spark, sf_dir)
    idx = IvfIndex.build(emb, nlist=8, seed=42, max_iter=5, metric="ip")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = idx.search_batch(queries, _BATCH_K, nprobe=8)
    return res.select(
        "query_id", "vec_id", F.round("score", 6).alias("score"), "rank"
    )


_DEL_WHERE = "WHERE e.vec_id % 7 <> 0"


@query(
    "ann_ivf_delete_full_probe",
    oracle=_knn_oracle(_L2, "distance", "ASC", _DEL_WHERE),
)
def ann_ivf_delete_full_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone-delete gate (round 4; ≅ faiss remove_vectors, reference:
    src/core/index/faiss_index.rs:131-138): build + save the index, delete
    every 7th id THROUGH the persisted manifest (load → delete(path=...) →
    reload — the full durability cycle), then full-probe. Must reproduce
    exact kNN over the SURVIVORS bit-for-bit: a probe that misses the
    anti-join, or a reload that drops the manifest, returns deleted ids
    and hash-mismatches."""
    import tempfile

    emb = _emb(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="ivf_delete_")
    idx = IvfIndex.build(emb, nlist=8, seed=42, max_iter=5)
    idx.save(path)
    IvfIndex.load(spark, path).delete(
        emb.filter(F.col("vec_id") % 7 == 0).select("vec_id"), path=path
    )
    re = IvfIndex.load(spark, path)
    res = re.search(_qvec(spark, sf_dir), K, nprobe=8, metric="l2")
    return res.select("vec_id", F.round("distance", 6).alias("distance"))


@query(
    "ann_lsh_delete_exhaustive",
    oracle=_knn_oracle(_COS, "score", "DESC", _DEL_WHERE),
)
def ann_lsh_delete_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH tombstone gate (≅ usearch remove, reference:
    src/core/index/usearch_index.rs:87-93): with n_bits=1 / probe_radius=1
    every bucket is probed, so delete + search must equal exact cosine kNN
    over the survivors — verifying the anti-join sits between the bucket
    scan and the rerank."""
    emb = _emb(spark, sf_dir)
    idx = CosineLshIndex.build(emb, dim=64, n_bits=1, n_tables=2, seed=42)
    idx.delete(emb.filter(F.col("vec_id") % 7 == 0).select("vec_id"))
    res = idx.search(_qvec(spark, sf_dir), K, probe_radius=1)
    return res.select("vec_id", F.round("score", 6).alias("score"))


@query(
    "ann_graph_delete_exhaustive",
    oracle=_knn_oracle(_L2, "distance", "ASC", _DEL_WHERE),
)
def ann_graph_delete_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph SOFT-delete gate: deleted nodes must keep ROUTING the beam
    (hard-dropping them would corrupt the positional adjacency and could
    disconnect regions) while never being admitted — the same
    traversal-vs-admission split as filtered search. Exhaustive beam over
    all cells must equal exact kNN over the survivors."""
    from vector_db_spark.operators.graph import GraphAnnIndex

    emb = _emb(spark, sf_dir)
    idx = GraphAnnIndex.build(
        emb, nlist=8, m=16, ef_construction=200, seed=42, max_iter=5
    )
    idx.delete(emb.filter(F.col("vec_id") % 7 == 0).select("vec_id"))
    res = idx.search(_qvec(spark, sf_dir), K, nprobe=8, ef_search=10**6)
    return res.select("vec_id", F.round("distance", 6).alias("distance"))


@query(
    "ivfpq_delete_exhaustive",
    oracle=_knn_oracle(_L2, "distance", "ASC", _DEL_WHERE),
)
def ivfpq_delete_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ tombstone gate: the anti-join must run BEFORE the ADC scan
    (a deleted row must not consume a shortlist slot); at full probe +
    corpus shortlist the result must equal exact kNN over survivors."""
    emb = _emb(spark, sf_dir)
    idx = IvfPqIndex.build(emb, nlist=8, m=16, ksub=64, seed=42, max_iter=5)
    idx.delete(emb.filter(F.col("vec_id") % 7 == 0).select("vec_id"))
    res = idx.search(_qvec(spark, sf_dir), K, nprobe=8, shortlist=10_000_000)
    return res.select("vec_id", F.round("distance", 6).alias("distance"))


@query("ann_graph_ip_exhaustive", oracle=_knn_oracle(_IP, "score", "DESC"))
def ann_graph_ip_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph MIPS gate (round 4 closes the metric matrix — the reference
    serves IP HNSW through its usearch backend,
    src/core/index_factory.rs:133-140): the NSW graphs are built over
    MIPS-augmented vectors [x, √(M²−‖x‖²)], queries enter as [q, 0], and
    the emitted score is the TRUE dot product (the query's augmented
    component is 0). Exhaustive beam + all cells must equal exact IP kNN
    bit-for-bit."""
    from vector_db_spark.operators.graph import GraphAnnIndex

    emb = _emb(spark, sf_dir)
    idx = GraphAnnIndex.build(
        emb, nlist=8, m=16, ef_construction=200, seed=42, max_iter=5, metric="ip"
    )
    res = idx.search(_qvec(spark, sf_dir), K, nprobe=8, ef_search=10**6)
    return res.select("vec_id", F.round("score", 6).alias("score"))


@query("ann_graph_batch_filtered_exhaustive", oracle=_BATCH_FILTERED_ORACLE)
def ann_graph_batch_filtered_exhaustive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Filtered×batch graph gate (round 4 completes the filtered-batch
    matrix): the cogrouped beam receives the admission mask per cell, so
    exhaustive probe + predicate must equal exact filtered batch kNN —
    non-matching nodes still route each query's beam, none are admitted."""
    from vector_db_spark.operators.graph import GraphAnnIndex

    emb = _emb(spark, sf_dir)
    idx = GraphAnnIndex.build(
        emb, nlist=8, m=16, ef_construction=200, seed=42, max_iter=5
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = idx.search_batch(
        queries, _BATCH_K, nprobe=8, ef_search=10**9, predicate=F.col("label") == 3
    )
    return res.select(
        "query_id", "vec_id", F.round("distance", 6).alias("distance"), "rank"
    )


@query("ivfpq_batch_filtered_exhaustive", oracle=_BATCH_FILTERED_ORACLE)
def ivfpq_batch_filtered_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered×batch IVF-PQ gate: the predicate prunes the codes scan
    BEFORE the cogrouped ADC (so filtered-out rows never consume
    shortlist slots); full probe + corpus shortlist must equal exact
    filtered batch kNN."""
    emb = _emb(spark, sf_dir)
    idx = IvfPqIndex.build(emb, nlist=8, m=16, ksub=64, seed=42, max_iter=5)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = idx.search_batch(
        queries, _BATCH_K, nprobe=8, shortlist=100000, predicate=F.col("label") == 3
    )
    return res.select(
        "query_id", "vec_id", F.round("distance", 6).alias("distance"), "rank"
    )


# --------------------------------------------------------------------------
# IVF-SQ (operators/ivfsq.py) — faiss IndexIVFScalarQuantizer analogue:
# cells + int8 affine codes, pure-codegen decoded distances
# --------------------------------------------------------------------------

from vector_db_spark.queries.vector_queries import _QUANT_ORACLE  # noqa: E402


@query("ivfsq_decoded_full_probe", oracle=_QUANT_ORACLE)
def ivfsq_decoded_full_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-SQ approximate path at full probe: the decoded-distance top-k
    over int8 codes. Unlike ADC, the affine floor(+0.5) codec is
    engine-portable, so even the APPROX path is value-exact against the
    oracle (same reconstruction SQL as knn_quantized_l2 — at nprobe ==
    nlist the cell structure must change nothing)."""
    from vector_db_spark.operators.ivfsq import IvfSqIndex

    emb = _emb(spark, sf_dir)
    idx = IvfSqIndex.build(emb, nlist=8, seed=42, max_iter=5)
    res = idx.search(_qvec(spark, sf_dir), K, nprobe=8)
    return res.select("vec_id", F.round("distance", 6).alias("distance"))


@query("ivfsq_rerank_exhaustive", oracle=_knn_oracle(_L2, "distance", "ASC"))
def ivfsq_rerank_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-SQ exact gate THROUGH the persisted layout: build → save →
    load → full probe + corpus shortlist + raw-vector rerank must equal
    exact kNN bit-for-bit (the same degenerate-config pattern as every
    other family's exhaustive gate)."""
    import tempfile

    from vector_db_spark.operators.ivfsq import IvfSqIndex

    emb = _emb(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="ivfsq_gate_")
    IvfSqIndex.build(emb, nlist=8, seed=42, max_iter=5).save(path)
    idx = IvfSqIndex.load(spark, path)
    res = idx.search(
        _qvec(spark, sf_dir), K, nprobe=8, shortlist=10_000_000, rerank=emb
    )
    return res.select("vec_id", F.round("distance", 6).alias("distance"))


@query("ivfsq_batch_rerank_exhaustive", oracle=_BATCH_ORACLE)
def ivfsq_batch_rerank_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch IVF-SQ gate: probed-cell broadcast join + decoded-distance
    shortlist + raw rerank must equal exact batch kNN at the degenerate
    config."""
    from vector_db_spark.operators.ivfsq import IvfSqIndex

    emb = _emb(spark, sf_dir)
    idx = IvfSqIndex.build(emb, nlist=8, seed=42, max_iter=5)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = idx.search_batch(
        queries, _BATCH_K, nprobe=8, shortlist=10_000_000, rerank=emb
    )
    return res.select(
        "query_id", "vec_id", F.round("distance", 6).alias("distance"), "rank"
    )


@query(
    "ivfsq_delete_exhaustive",
    oracle=_knn_oracle(_L2, "distance", "ASC", _DEL_WHERE),
)
def ivfsq_delete_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-SQ tombstone gate (family contract, ≅ faiss remove_vectors,
    reference: src/core/index/faiss_index.rs:131-138): the anti-join runs
    before the decoded scan so deleted rows never consume shortlist
    slots; full probe + corpus shortlist ≡ exact kNN over survivors."""
    from vector_db_spark.operators.ivfsq import IvfSqIndex

    emb = _emb(spark, sf_dir)
    idx = IvfSqIndex.build(emb, nlist=8, seed=42, max_iter=5)
    idx.delete(emb.filter(F.col("vec_id") % 7 == 0).select("vec_id"))
    res = idx.search(
        _qvec(spark, sf_dir), K, nprobe=8, shortlist=10_000_000, rerank=emb
    )
    return res.select("vec_id", F.round("distance", 6).alias("distance"))


from vector_db_spark.oracle import l2_sq_sql as _l2f  # noqa: E402

_BATCH_L2_SQL = _l2f("e.embedding", "q.qv")

_KNN_JOIN_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 50
),
scored AS (
  SELECT q.query_id, e.vec_id, {_BATCH_L2_SQL} AS dist
  FROM embeddings e, q
),
ranked AS (
  SELECT query_id, vec_id, dist,
         row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rank
  FROM scored
)
SELECT query_id, vec_id, round(dist, 6) AS distance, rank
FROM ranked WHERE rank <= 5
"""


@query("ann_ivf_knn_join_exhaustive", oracle=_KNN_JOIN_ORACLE)
def ann_ivf_knn_join_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN JOIN gate — the co-located (non-broadcast) batch path that no
    earlier gate exercised: a 50-row query TABLE joins the cell-
    partitioned corpus with ``broadcast_queries=False``, i.e. BOTH sides
    shuffle on cluster_id (the corpus's own partition column — a
    co-located equi-join, the formulation for query sets too large to
    broadcast: 'for every row of table A, its top-k neighbors in B').
    Full probe must equal exact batch kNN bit-for-bit."""
    emb = _emb(spark, sf_dir)
    idx = IvfIndex.build(emb, nlist=8, seed=42, max_iter=5)
    queries = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = idx.search_batch(
        queries, 5, nprobe=8, metric="l2", broadcast_queries=False
    )
    return res.select(
        "query_id", "vec_id", F.round("distance", 6).alias("distance"), "rank"
    )


@query("ivfsq_append_rerank_exhaustive", oracle=_knn_oracle(_L2, "distance", "ASC"))
def ivfsq_append_rerank_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-SQ incremental lifecycle gate: build + persist on HALF the
    corpus, append the other half through the persisted layout (both
    quantizers frozen, only new files land), reload, then full probe +
    corpus shortlist + raw rerank must equal exact kNN over the FULL
    corpus — appended codes serve identically to built codes."""
    import tempfile

    from vector_db_spark.operators.ivfsq import IvfSqIndex

    emb = _emb(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="ivfsq_append_")
    IvfSqIndex.build(
        emb.filter(F.col("vec_id") % 2 == 0), nlist=8, seed=42, max_iter=5
    ).save(path)
    IvfSqIndex.load(spark, path).append(
        emb.filter(F.col("vec_id") % 2 == 1), path=path
    )
    idx = IvfSqIndex.load(spark, path)
    res = idx.search(
        _qvec(spark, sf_dir), K, nprobe=8, shortlist=10_000_000, rerank=emb
    )
    return res.select("vec_id", F.round("distance", 6).alias("distance"))


_RANGE_FILTERED_ORACLE = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
m AS (
  SELECT e.vec_id, {_L2} AS distance FROM embeddings e, q
  WHERE e.label <> 3
)
SELECT vec_id, round(distance, 6) AS distance
FROM m WHERE distance <= {_RANGE_THRESHOLD}
ORDER BY distance, vec_id
"""


@query("ann_ivf_range_filtered", oracle=_RANGE_FILTERED_ORACLE)
def ann_ivf_range_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered range search — the last cell of the [top-k | range] ×
    [filtered | unfiltered] matrix: the predicate pre-filters rows inside
    the losslessly-pruned cells (≅ usearch filtered_search composed with
    faiss range_search), value-exact at any nlist."""
    emb = _emb(spark, sf_dir)
    idx = IvfIndex.build(emb, nlist=8, seed=42, max_iter=5)
    res = idx.range_search(
        _qvec(spark, sf_dir), _RANGE_THRESHOLD, predicate=F.col("label") != 3
    )
    return res.select("vec_id", F.round("distance", 6).alias("distance"))


@query("ann_lsh_append_exhaustive", oracle=_knn_oracle(_COS, "score", "DESC"))
def ann_lsh_append_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH incremental lifecycle: build + persist on half the corpus,
    append the other half through the persisted (table, bucket) layout
    (frozen hyperplanes — bucket membership has no cross-row structure,
    so it's a pure file append), reload; at n_bits=1 / probe_radius=1
    every bucket probes, so the result must equal exact cosine kNN over
    the FULL corpus."""
    import tempfile

    emb = _emb(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="lsh_append_")
    CosineLshIndex.build(
        emb.filter(F.col("vec_id") % 2 == 0), dim=64, n_bits=1, n_tables=2, seed=42
    ).save(path)
    CosineLshIndex.load(spark, path).append(
        emb.filter(F.col("vec_id") % 2 == 1), path=path
    )
    idx = CosineLshIndex.load(spark, path)
    res = idx.search(_qvec(spark, sf_dir), K, probe_radius=1)
    return res.select("vec_id", F.round("score", 6).alias("score"))


@query("ivfpq_append_exhaustive", oracle=_knn_oracle(_L2, "distance", "ASC"))
def ivfpq_append_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ incremental lifecycle (faiss IndexIVFPQ.add): build +
    persist on half, append half (coarse quantizer AND codebooks frozen,
    residual-encoded, new files only), reload; full probe + corpus
    shortlist + raw rerank must equal exact kNN over the full corpus."""
    import tempfile

    emb = _emb(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="ivfpq_append_")
    IvfPqIndex.build(
        emb.filter(F.col("vec_id") % 2 == 0),
        nlist=8, m=16, ksub=64, seed=42, max_iter=5,
    ).save(path)
    IvfPqIndex.load(spark, path).append(
        emb.filter(F.col("vec_id") % 2 == 1), path=path
    )
    idx = IvfPqIndex.load(spark, path)
    res = idx.search(
        _qvec(spark, sf_dir), K, nprobe=8, shortlist=10_000_000, rerank=emb
    )
    return res.select("vec_id", F.round("distance", 6).alias("distance"))


@query("ann_graph_append_exhaustive", oracle=_knn_oracle(_L2, "distance", "ASC"))
def ann_graph_append_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph incremental lifecycle (the reference re-wires its live graph
    inside every insert, src/core/index/hnsw_index.rs:16-19; we amortize
    per batch): build + persist on half, append half — ONLY the affected
    cells' NSW subgraphs rebuild and land via dynamic partition
    overwrite — reload; exhaustive beam over all cells must equal exact
    kNN over the full corpus, proving appended nodes are REACHABLE
    (edge-less appends would drop them silently)."""
    import tempfile

    from vector_db_spark.operators.graph import GraphAnnIndex

    emb = _emb(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="graph_append_")
    GraphAnnIndex.build(
        emb.filter(F.col("vec_id") % 2 == 0),
        nlist=8, m=16, ef_construction=200, seed=42, max_iter=5,
    ).save(path)
    GraphAnnIndex.load(spark, path).append(
        emb.filter(F.col("vec_id") % 2 == 1), path=path
    )
    idx = GraphAnnIndex.load(spark, path)
    res = idx.search(_qvec(spark, sf_dir), K, nprobe=8, ef_search=10**6)
    return res.select("vec_id", F.round("distance", 6).alias("distance"))


# ---------------------------------------------------------------------------
# OPQ rotation rung (operators/opq.py): learned orthonormal rotation in
# front of PQ — same code bytes, same scan plan, lower quantization error.
# ---------------------------------------------------------------------------


def _opq(spark, sf_dir):
    from vector_db_spark.operators.opq import OpqQuantizer

    emb = _emb(spark, sf_dir)
    oq = OpqQuantizer.fit(emb, m=16, ksub=64, seed=42, iters=8, opq_iters=6)
    return emb, oq, oq.encode(emb).select("vec_id", "opq_codes")


@query("opq_rerank_full", oracle=_knn_oracle(_L2, "distance", "ASC"))
def opq_rerank_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OPQ correctness gate (same pattern as pq_rerank_full_shortlist):
    rotate → encode → rotated-query ADC → corpus-sized shortlist →
    raw-vector rerank with the UNROTATED query must reproduce exact kNN
    bit-for-bit — the rotation's L2 invariance and the whole codec path
    verified at once."""
    emb, oq, enc = _opq(spark, sf_dir)
    res = oq.search(
        enc, _qvec(spark, sf_dir), K, rerank=emb, shortlist=10_000_000
    )
    return res.select("vec_id", F.round("distance", 6).alias("distance"))


def _opq_adc_oracle() -> str:
    """Frozen-OPQ ADC oracle: vsrc/qrot are the ROTATED corpus/query —
    each rotated coordinate a 64-term left fold over the frozen rotation
    row literals (the pca_docs.json projection pattern), then the shared
    encode/LUT/fold body runs in rotated space, exactly as the
    exact_fold engine path (operators/opq.py _rotate_exact)."""
    from vector_db_spark.operators.opq import load_frozen_doc_opq

    oq = load_frozen_doc_opq()
    rot = oq.rotation
    dim = rot.shape[1]

    def wrep(x: float) -> str:
        return repr(float(x))

    def rot_expr(src: str, j: int) -> str:
        return " + ".join(
            f"({src}[{d + 1}]::DOUBLE * {wrep(rot[j][d])})" for d in range(dim)
        )

    vcols = ", ".join(rot_expr("e.embedding", j) for j in range(rot.shape[0]))
    qcols = ", ".join(rot_expr("q.qv", j) for j in range(rot.shape[0]))
    proj = f"""vsrc AS (
  SELECT e.vec_id, [{vcols}] AS rv
  FROM embeddings e
),
qrot AS (
  SELECT [{qcols}] AS rv
  FROM q
),
"""
    return _adc_oracle_sql(oq.pq.codebooks, "v.rv", proj)


@query("opq_adc_knn", oracle=_opq_adc_oracle())
def opq_adc_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-domain OPQ search — served from the FROZEN rotation +
    codebooks (opq.load_frozen_doc_opq; the fit machinery and the
    recall IMPROVEMENT over plain PQ at equal (m, ksub) budget stay
    pinned by opq_rerank_full/ivfopq_exhaustive and tests/test_pq.py).

    Hash-exact as of round 14 (VERDICT r13 #2, rows-only → converted):
    rotation, encode argmin, ADC table, and the per-row distance are
    order-pinned left folds over the frozen literals — the DuckDB
    oracle replays the full rotated-space pipeline bit-exactly. Same
    in-row recall floor as pq_adc_knn."""
    from vector_db_spark.operators.opq import load_frozen_doc_opq

    emb = _emb(spark, sf_dir)
    oq = load_frozen_doc_opq()
    enc = oq.encode(emb).select("vec_id", "opq_codes")
    res = oq.search(enc, _qvec(spark, sf_dir), K)
    res = res.select("vec_id", F.round("distance", 6).alias("distance"))
    return _recall_gated(res, _exact_ids(spark, sf_dir), 0.3, "opq_adc_knn")


@query("ivfopq_exhaustive", oracle=_knn_oracle(_L2, "distance", "ASC"))
def ivfopq_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF-OPQ correctness gate (faiss 'OPQ16,IVF8,PQ16'): learned
    rotation → coarse cells → residual PQ, full probe + corpus-sized
    shortlist, exact rerank on the RAW corpus with the unrotated query —
    must reproduce exact kNN bit-for-bit (rotated-copy rerank would only
    agree to ~1e-14; the wrapper's contract forbids it)."""
    from vector_db_spark.operators.opq import IvfOpqIndex

    emb = _emb(spark, sf_dir)
    idx = IvfOpqIndex.build(
        emb, nlist=8, m=16, ksub=64, seed=42, max_iter=5, pq_iters=8,
        opq_iters=4,
    )
    res = idx.search(
        _qvec(spark, sf_dir), K, nprobe=8, shortlist=10_000_000, rerank=emb
    )
    return res.select("vec_id", F.round("distance", 6).alias("distance"))


@query("ivfopq_batch_exhaustive", oracle=_BATCH_ORACLE)
def ivfopq_batch_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch IVF-OPQ gate: rotated queries through the inherited
    cogrouped ADC pipeline, raw-corpus exact rerank with unrotated
    queries — full probe + corpus-sized shortlist must reproduce exact
    batch kNN bit-for-bit."""
    from vector_db_spark.operators.opq import IvfOpqIndex

    emb = _emb(spark, sf_dir)
    idx = IvfOpqIndex.build(
        emb, nlist=8, m=16, ksub=64, seed=42, max_iter=5, pq_iters=8,
        opq_iters=4,
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = idx.search_batch(
        queries, _BATCH_K, nprobe=8, shortlist=100000, rerank=emb
    )
    return res.select(
        "query_id", "vec_id", F.round("distance", 6).alias("distance"), "rank"
    )


@query(
    "opq_filtered_rerank_exhaustive",
    oracle=_knn_oracle(_L2, "distance", "ASC", "WHERE e.label = 3"),
)
def opq_filtered_rerank_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered-OPQ gate: predicate pre-filters the rotated codes scan
    before ADC; with a corpus-sized shortlist the raw-vector rerank must
    equal exact FILTERED kNN bit-for-bit — the rotation rung joins the
    filtered-search matrix."""
    from vector_db_spark.operators.opq import OpqQuantizer

    emb = _emb(spark, sf_dir)
    oq = OpqQuantizer.fit(emb, m=16, ksub=64, seed=42, iters=8, opq_iters=4)
    enc = oq.encode(emb).select("vec_id", "label", "opq_codes")
    res = oq.search(
        enc,
        _qvec(spark, sf_dir),
        K,
        rerank=emb,
        shortlist=10_000_000,
        predicate=F.col("label") == 3,
    )
    return res.select("vec_id", F.round("distance", 6).alias("distance"))


@query(
    "ivfopq_filtered_exhaustive",
    oracle=_knn_oracle(_L2, "distance", "ASC", "WHERE e.label = 3"),
)
def ivfopq_filtered_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered IVF-OPQ gate: the metadata predicate rides the rotated
    frame (rotation replaces only the vector column) and composes with
    cell pruning; full probe + corpus shortlist + raw rerank must equal
    exact filtered kNN."""
    from vector_db_spark.operators.opq import IvfOpqIndex

    emb = _emb(spark, sf_dir)
    idx = IvfOpqIndex.build(
        emb, nlist=8, m=16, ksub=64, seed=42, max_iter=5, pq_iters=8,
        opq_iters=4,
    )
    res = idx.search(
        _qvec(spark, sf_dir),
        K,
        nprobe=8,
        shortlist=10_000_000,
        rerank=emb,
        predicate=F.col("label") == 3,
    )
    return res.select("vec_id", F.round("distance", 6).alias("distance"))
