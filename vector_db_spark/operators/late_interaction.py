"""Late-interaction (multi-vector / ColBERT-style MaxSim) retrieval.

The reference stores exactly one vector per id (`Vec<f32>` insert payload,
/root/reference/src/models/request/insert.rs:10-14). Modern retrieval
corpora are MULTI-vector: a document is a *set* of token/passage vectors,
and relevance is late interaction (Khattab & Zaharia, SIGIR'20 ColBERT):

    score(doc) = sum over query tokens t of  max over doc vectors v  <v, q_t>

This module implements MaxSim over a long-format multi-vector corpus —
one row per (doc, vector), the natural Spark layout (fixed-width
array<float> column, documents reassemble by key; no ragged nested
tensors).

Scale shape: ONE hash shuffle, on the doc key.

1. every corpus row computes its T query-token dot products in place —
   row-local, inside whole-stage codegen for small T (native float64
   folds), or one Arrow GEMM kernel past the literal-term planning
   ceiling (T*dim > ~1024 stalls Catalyst — measured on the IVF
   assignment path, see ann.py `_nearest_centroid_arrow`);
2. `groupBy(doc)` aggregates per-token MAX — max is order-free, so
   map-side partial aggregation pre-reduces every partition before the
   exchange (T doubles per doc in flight, not the vectors);
3. the T maxes sum row-locally; global top-k is TakeOrderedAndProject.

The corpus never broadcasts, never self-joins, and the shuffle payload is
T doubles per document regardless of how many vectors a document has —
this survives 100 TB with a hot-document skew profile (skewed docs are
pre-reduced map-side).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_db_spark.functions.vector import dot
from vector_db_spark.operators.knn import query_literal

# Past this many literal multiply-add terms Catalyst planning stalls
# (measured minutes-long analysis on the IVF literal path, ann.py).
_LITERAL_TERM_CEILING = 1024


def _token_dots_arrow(
    df: DataFrame, vec_col: str, tokens: list[list[float]]
) -> DataFrame:
    """All T query-token dot products per row via one Arrow GEMM kernel:
    |batch| x dim @ dim x T. Emits the input columns minus the vector,
    plus `dots array<double>` (float64 accumulation to match the native
    fold's precision class)."""
    import numpy as np
    import pandas as pd

    out_cols = [c for c in df.columns if c != vec_col]
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != vec_col
    )
    schema += ", dots array<double>"
    qt = [list(map(float, t)) for t in tokens]

    def gemm(it):
        q = np.asarray(qt, dtype=np.float64).T  # dim x T
        for pdf in it:
            vecs = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            dots = vecs @ q if len(pdf) else np.zeros((0, q.shape[1]))
            out = pdf[out_cols].copy()
            out["dots"] = list(dots)
            yield out

    return df.mapInPandas(gemm, schema=schema)


def maxsim_search(
    corpus: DataFrame,
    query_tokens: Sequence[Sequence[float]],
    k: int,
    *,
    doc_col: str,
    vec_col: str = "embedding",
    predicate: Column | None = None,
    score_col: str = "maxsim_score",
) -> DataFrame:
    """Top-k documents by MaxSim late interaction.

    `corpus` is long-format multi-vector: one row per (doc, vector);
    `doc_col` groups a document's vectors. `query_tokens` is the query's
    own (small, driver-side) vector set. `predicate` pre-filters corpus
    rows before any scoring (same pre-filter semantics as every other
    search path, SURVEY.md §2.4).

    Returns (doc_col, score_col) ordered by (score DESC, doc ASC), k rows.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    toks = [list(map(float, t)) for t in query_tokens]
    if not toks:
        raise ValueError("query_tokens must be non-empty")
    dims = {len(t) for t in toks}
    if len(dims) != 1:
        raise ValueError(f"query tokens must share one dimension, got {dims}")
    dim = dims.pop()

    if predicate is not None:
        corpus = corpus.filter(predicate)

    n_terms = len(toks) * dim
    if n_terms <= _LITERAL_TERM_CEILING:
        scored = corpus.select(
            F.col(doc_col).alias("doc"),
            *[
                dot(F.col(vec_col), query_literal(t)).alias(f"_d{i}")
                for i, t in enumerate(toks)
            ],
        )
        maxes = scored.groupBy("doc").agg(
            *[F.max(f"_d{i}").alias(f"_m{i}") for i in range(len(toks))]
        )
    else:
        scored = _token_dots_arrow(
            corpus.select(F.col(doc_col).alias("doc"), vec_col), vec_col, toks
        )
        maxes = scored.groupBy("doc").agg(
            *[
                F.max(F.col("dots")[i]).alias(f"_m{i}")
                for i in range(len(toks))
            ]
        )

    # left-associated sum, same fold order as the oracle SQL emits
    total = F.col("_m0")
    for i in range(1, len(toks)):
        total = total + F.col(f"_m{i}")
    return (
        maxes.select(
            F.col("doc").alias(doc_col), total.alias(score_col)
        )
        .orderBy(F.col(score_col).desc(), F.col(doc_col).asc())
        .limit(k)
    )


def maxsim_search_batch(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    doc_col: str,
    vec_col: str = "embedding",
    predicate: Column | None = None,
    query_id_col: str = "query_id",
    token_vec_col: str = "token_vec",
    token_id_col: str = "token_id",
    score_col: str = "maxsim_score",
) -> DataFrame:
    """Top-k MaxSim per query for a DataFrame of multi-token queries
    (long format: one row per (query, token)).

    The query set is small (it's the search REQUEST — same bounded-side
    contract as every batch-kNN path), so its tokens collect driver-side
    and become T_total literal/GEMM dot columns per corpus row. The
    corpus-side shape is IDENTICAL to the single-query operator — one
    map-side-combined max shuffle on the doc key, regardless of how many
    queries share the batch — and the per-query sum + window ranking run
    over n_docs x n_queries rows, post-aggregation scale.

    Returns (query_id, doc_col, score_col, rank) with rank <= k per
    query, ties by doc.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    rows = (
        queries.select(query_id_col, token_id_col, token_vec_col)
        .orderBy(query_id_col, token_id_col)
        .collect()
    )
    if not rows:
        raise ValueError("queries must be non-empty")
    toks = [list(map(float, r[token_vec_col])) for r in rows]
    owner = [r[query_id_col] for r in rows]
    dims = {len(t) for t in toks}
    if len(dims) != 1:
        raise ValueError(f"query tokens must share one dimension, got {dims}")
    dim = dims.pop()

    if predicate is not None:
        corpus = corpus.filter(predicate)

    if len(toks) * dim <= _LITERAL_TERM_CEILING:
        scored = corpus.select(
            F.col(doc_col).alias("doc"),
            *[
                dot(F.col(vec_col), query_literal(t)).alias(f"_d{i}")
                for i, t in enumerate(toks)
            ],
        )
        maxes = scored.groupBy("doc").agg(
            *[F.max(f"_d{i}").alias(f"_m{i}") for i in range(len(toks))]
        )
    else:
        scored = _token_dots_arrow(
            corpus.select(F.col(doc_col).alias("doc"), vec_col), vec_col, toks
        )
        maxes = scored.groupBy("doc").agg(
            *[
                F.max(F.col("dots")[i]).alias(f"_m{i}")
                for i in range(len(toks))
            ]
        )

    # per-query left-associated sums over that query's tokens (token-id
    # order), stacked into (query_id, doc, score) rows
    by_query: dict = {}
    for i, q in enumerate(owner):
        by_query.setdefault(q, []).append(i)
    structs = []
    for q, idxs in by_query.items():
        total = F.col(f"_m{idxs[0]}")
        for i in idxs[1:]:
            total = total + F.col(f"_m{i}")
        structs.append(F.struct(F.lit(q).alias("qid"), total.alias("s")))
    stacked = maxes.select(
        "doc", F.explode(F.array(*structs)).alias("qs")
    ).select(
        F.col("qs.qid").alias(query_id_col),
        F.col("doc").alias(doc_col),
        F.col("qs.s").alias(score_col),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col(score_col).desc(), F.col(doc_col).asc()
    )
    return stacked.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
