"""Exact k-nearest-neighbor search as a declarative DataFrame computation.

This is the engine's hot path, the equivalent of the reference's
``POST /search`` → flat/HNSW/usearch top-k (reference:
src/router/handle/search_index_handle.rs:46-102, faiss scan
src/core/index/faiss_index.rs:60-69, usearch exact_search
src/core/index/usearch_index.rs:48-56).

Spark-first design notes (the 100 TB story):

- **Single query**: the query vector is inlined as a literal array, the
  distance is a codegen'd native expression, and ``ORDER BY distance LIMIT
  k`` plans as ``TakeOrderedAndProject`` — each partition computes its local
  top-k and only k rows per partition travel to the driver. No shuffle, no
  Python, no index build. On 1000 executors this is an embarrassingly
  parallel scan + tiny merge.
- **Filtered search**: a plain ``.filter`` *before* the distance — Catalyst
  pushes it into the parquet scan (min/max + dictionary row-group skipping),
  which subsumes the reference's roaring-bitmap filter index
  (src/core/index/filter_index.rs) and is strictly more correct than its
  post-filtering (which can return < k, src/core/index/faiss_index.rs:107-111):
  we always return min(k, matching rows).
- **Batch of queries**: broadcast the (small) query set against the corpus,
  rank per query with a window. The corpus — the big side — is never
  shuffled; only corpus×|Q| candidate rows flow into the per-query top-k,
  and AQE handles skew. For very large query sets, use the approximate path
  (operators/ann.py) instead.
- Ties at the k-boundary are broken by id so results are deterministic
  (SURVEY.md §7.3.2; duplicate vectors exist even in the reference's own
  tests, src/core/index/faiss_index.rs:161-165).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_db_spark.functions.vector import cosine_sim, dot, l2_sq

# metric name -> (distance/score expression builder, ascending?)
_METRICS = {
    "l2": (l2_sq, True),
    "ip": (dot, False),
    "cosine": (cosine_sim, False),
}

SCORE_COL = {"l2": "distance", "ip": "score", "cosine": "score"}


def _metric(metric: str):
    try:
        return _METRICS[metric]
    except KeyError:
        raise ValueError(
            f"unknown metric {metric!r}; expected one of {sorted(_METRICS)}"
        ) from None


def query_literal(vec: Sequence[float]) -> Column:
    """Inline a Python query vector as a literal array<double> column."""
    return F.array(*[F.lit(float(x)) for x in vec])


def knn(
    corpus: DataFrame,
    query: Sequence[float] | Column,
    k: int,
    *,
    metric: str = "l2",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    predicate: Column | None = None,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Exact top-k nearest rows of ``corpus`` to one query vector.

    Returns ``(id_col, *keep_cols, distance|score)`` ordered by the metric
    (ASC for l2, DESC for ip/cosine), ties broken by id.
    """
    if k < 1:
        raise ValueError("k must be >= 1")  # reference: src/models/request/search.rs:6-17
    expr_fn, ascending = _metric(metric)
    out = SCORE_COL[metric]
    if isinstance(query, Column):
        qcol = query
        dist = expr_fn(F.col(vec_col), qcol)
    else:
        if len(query) == 0:
            raise ValueError("query vector must be non-empty")
        qcol = query_literal(query)
        # Strict dim check (deliberate divergence: the reference silently
        # searches with a mismatched dim, src/router/handle/
        # search_index_handle.rs:201-215; we reject — SURVEY.md §7.4 / B6).
        dist = F.when(
            F.size(F.col(vec_col)) == len(query),
            expr_fn(F.col(vec_col), qcol),
        ).otherwise(
            F.raise_error(
                F.lit(
                    f"dimension mismatch: query has {len(query)} components, "
                    f"corpus column {vec_col!r} differs"
                )
            )
        )

    df = corpus
    if predicate is not None:
        df = df.filter(predicate)
    df = df.select(id_col, *keep_cols, dist.alias(out))
    order = F.col(out).asc() if ascending else F.col(out).desc()
    return df.orderBy(order, F.col(id_col).asc()).limit(k)


def batch_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    metric: str = "l2",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    predicate: Column | None = None,
) -> DataFrame:
    """Exact top-k per query vector for a (small) DataFrame of queries.

    The query side is broadcast — the corpus never shuffles; per-query
    ranking is a window over the candidate rows.
    Returns ``(query_id, id_col, distance|score, rank)``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    expr_fn, ascending = _metric(metric)
    out = SCORE_COL[metric]

    df = corpus
    if predicate is not None:
        df = df.filter(predicate)
    joined = df.crossJoin(F.broadcast(queries))
    scored = joined.select(
        query_id_col,
        id_col,
        expr_fn(F.col(vec_col), F.col(query_vec_col)).alias(out),
    )
    order = F.col(out).asc() if ascending else F.col(out).desc()
    w = Window.partitionBy(query_id_col).orderBy(order, F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def pairwise_similarity(
    corpus: DataFrame,
    *,
    metric: str = "l2",
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = None,
) -> DataFrame:
    """All pairs (a, b) with a.id < b.id whose distance/similarity passes
    ``threshold`` (<= for l2, >= for ip/cosine). The exact near-duplicate
    primitive; ``block_col`` restricts pairs to equal blocking keys, which is
    how this stays sub-quadratic at scale (LSH bucketing in operators/ann.py
    produces such a blocking column).
    """
    expr_fn, ascending = _metric(metric)
    out = SCORE_COL[metric]
    a = corpus.select(
        F.col(id_col).alias("a_id"),
        F.col(vec_col).alias("a_vec"),
        *([F.col(block_col).alias("a_blk")] if block_col else []),
    )
    b = corpus.select(
        F.col(id_col).alias("b_id"),
        F.col(vec_col).alias("b_vec"),
        *([F.col(block_col).alias("b_blk")] if block_col else []),
    )
    cond = F.col("a_id") < F.col("b_id")
    if block_col:
        cond = cond & (F.col("a_blk") == F.col("b_blk"))
    pairs = a.join(b, cond)
    scored = pairs.select("a_id", "b_id", expr_fn(F.col("a_vec"), F.col("b_vec")).alias(out))
    keep = F.col(out) <= threshold if ascending else F.col(out) >= threshold
    return scored.filter(keep)
