"""1-bit (sign) binary quantization with Hamming-distance search.

The most aggressive point on the compression ladder the engine offers
(float32 -> int8 in operators/quantize.py -> PQ codes in operators/pq.py ->
1 bit/dimension here). The reference exposes compressed variants through
faiss factory strings (reference: src/core/index_factory.rs:110-114 builds
from index-type enums; faiss's own `IndexBinaryFlat` is the native
analogue); the capability that matters at 100 TB is scan bytes: a
64-dim float32 embedding is 256 bytes, its sign code is 12 bytes — a ~21×
cut, which at 100 TB turns a full-corpus candidate scan into ~3 TB of IO.

Codec: bit_d = (x_d > 0), packed 31 bits per int word
(dimension j of word w sits at bit position j). Hamming distance
is then `sum_w popcount(a_w XOR b_w)` — XOR + bit_count are native JVM
expressions inside whole-stage codegen; the search plan is the same
shuffle-free TakeOrderedAndProject as exact kNN (operators/knn.py).

Sign binarization is data-independent (threshold 0), so the DuckDB oracle
can reproduce the distance exactly from the raw floats without seeing the
packed codes: Hamming == count of dimensions whose signs disagree.

The intended scale pattern is two-stage: Hamming shortlist over the tiny
codes column (32× fewer bytes than the raw scan), then exact re-rank of
the shortlist against full-precision vectors — `hamming_shortlist_rerank`.
Both stages are deterministic (ties broken by id at BOTH cuts), so even
the composed pipeline is value-exact against SQL.
"""

from __future__ import annotations

import functools
import operator
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_db_spark.operators.knn import _metric

BITS_PER_WORD = 31  # int words, positions 0..30: the full-word sum tops out
# at 2^31 - 1 == INT_MAX, so the packed value never overflows the signed int


def _sign_bits(vec: Sequence[float]) -> list[int]:
    """Driver-side packing of a query vector (mirrors `binarize`).

    Components quantize through float32 FIRST: the engine's vector
    columns are `array<float>` (collections._validated casts on write),
    so corpus values underflowing float32 carry sign bit 0 — a raw-double
    query packing would disagree on exactly those components
    (hypothesis-found with a 2.2e-311 subnormal)."""
    import numpy as np

    q32 = np.asarray(list(vec), dtype=np.float32)
    words: list[int] = []
    for w in range(0, len(q32), BITS_PER_WORD):
        word = 0
        for j, x in enumerate(q32[w : w + BITS_PER_WORD]):
            if x > 0.0:
                word |= 1 << j
        words.append(word)
    return words


def binarize(vec: Column, dim: int) -> Column:
    """array<float> -> array<int> sign codes, 31 dims per word.

    The packing is a static sum of `IF(x > 0, 1<<j, 0)` terms — pure
    whole-stage-codegen arithmetic, no Python, no shuffle.
    """
    if dim < 1:
        raise ValueError("dim must be >= 1")
    words = []
    for w in range(0, dim, BITS_PER_WORD):
        terms = []
        for j in range(min(BITS_PER_WORD, dim - w)):
            # quantize through float32 FIRST (same rule as _sign_bits: a
            # double subnormal underflows to 0.0f and must pack bit 0),
            # and exclude NaN explicitly — Spark orders NaN > 0.0 as TRUE
            # where numpy says False, and the two packers must agree
            c = F.element_at(vec, w + j + 1).cast("float")
            terms.append(
                F.when((c > 0.0) & ~F.isnan(c), F.lit(1 << j)).otherwise(F.lit(0))
            )
        words.append(functools.reduce(operator.add, terms).cast("int"))
    return F.array(*words)


def hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two packed code arrays (bigint)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0).cast("bigint"),
        lambda acc, d: acc + d,
    )


def binary_quantize(
    df: DataFrame, vec_col: str = "embedding", code_col: str = "codes", dim: int | None = None
) -> DataFrame:
    """Attach the packed sign-code column (the 12-byte scan artifact)."""
    if dim is None:
        dim = len(df.select(vec_col).head()[0])
    return df.withColumn(code_col, binarize(F.col(vec_col), dim))


def knn_hamming(
    codes: DataFrame,
    query: Sequence[float],
    k: int,
    *,
    code_col: str = "codes",
    id_col: str = "vec_id",
    predicate: Column | None = None,
) -> DataFrame:
    """Top-k by Hamming distance over packed codes.

    Plans as TakeOrderedAndProject over the codes scan — zero exchanges,
    per-partition local top-k, only k rows per partition reach the driver
    (same shape as exact kNN; reference search surface:
    src/router/handle/search_index_handle.rs:46-102).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    qwords = _sign_bits(query)
    qcol = F.array(*[F.lit(w) for w in qwords])
    df = codes
    if predicate is not None:
        df = df.filter(predicate)
    # Word-count mismatch must RAISE: zip_with pads with null, the sum
    # goes NULL, and NULLS FIRST under the ascending order would fill the
    # top-k with arbitrary ids instead of erroring.
    dist = F.when(
        F.size(F.col(code_col)) == len(qwords),
        hamming(F.col(code_col), qcol),
    ).otherwise(
        F.raise_error(
            F.lit(
                f"dimension mismatch: query packs to {len(qwords)} code "
                f"words, corpus column {code_col!r} differs"
            )
        )
    )
    out = df.select(id_col, dist.alias("hamming"))
    return out.orderBy(F.col("hamming").asc(), F.col(id_col).asc()).limit(k)


def hamming_shortlist_rerank(
    corpus: DataFrame,
    query: Sequence[float],
    k: int,
    *,
    shortlist: int = 100,
    metric: str = "l2",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    predicate: Column | None = None,
    codes: DataFrame | None = None,
    code_col: str = "codes",
) -> DataFrame:
    """Two-stage search: Hamming shortlist on sign codes, exact re-rank.

    Stage 1 ranks by (hamming, id) — deterministic cut; stage 2 joins the
    shortlist ids back to the full-precision vectors (a broadcast of
    `shortlist` rows against the corpus — the big side never shuffles)
    and re-ranks with the exact metric.

    ``codes`` takes the PERSISTED sign-code frame (binary_quantize output
    saved once — the artifact this module's byte story is built on): with
    it, stage 1 reads ~21× fewer bytes than the raw vector scan. Omitted,
    codes are computed on the fly from ``corpus`` — correct, but stage 1
    then scans the full-precision column and the IO cut does not happen
    (fine for one-off searches; serving should pass the artifact).
    """
    if shortlist < k:
        raise ValueError("shortlist must be >= k")
    if dim is None:
        dim = len(query)
    coded = (
        codes
        if codes is not None
        else binary_quantize(corpus, vec_col=vec_col, dim=dim)
    )
    cand = knn_hamming(
        coded,
        query,
        shortlist,
        code_col=code_col if codes is not None else "codes",
        id_col=id_col,
        predicate=predicate,
    ).select(id_col)
    expr_fn, ascending = _metric(metric)
    from vector_db_spark.operators.knn import SCORE_COL, query_literal

    out = SCORE_COL[metric]
    joined = corpus.join(F.broadcast(cand), id_col)
    scored = joined.select(
        id_col, expr_fn(F.col(vec_col), query_literal(query)).alias(out)
    )
    order = F.col(out).asc() if ascending else F.col(out).desc()
    return scored.orderBy(order, F.col(id_col).asc()).limit(k)


def batch_knn_hamming(
    codes: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    code_col: str = "codes",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    predicate: Column | None = None,
) -> DataFrame:
    """Top-k by Hamming distance per query for a DataFrame of queries —
    the batch analogue of `knn_hamming`, same shape as `knn.batch_knn`:
    query vectors binarize on the fly, the (small) query side broadcasts,
    the codes corpus never shuffles, one window ranks per query. At scale
    the corpus side reads only the packed-code column.

    ``predicate`` (over corpus columns) pre-filters candidates before
    scoring — the same shared-predicate contract as exact ``batch_knn``
    and single-query filtered search (≅ usearch filtered_search,
    reference: src/core/index/usearch_index.rs:68-85); as a corpus-side
    scan filter it pushes down to parquet.

    Returns (query_id, id, hamming, rank)."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    dim_row = queries.select(F.size(query_vec_col)).head()
    if dim_row is None:
        raise ValueError("queries is empty")
    if predicate is not None:
        codes = codes.filter(predicate)
    qcodes = queries.select(
        query_id_col, binarize(F.col(query_vec_col), dim_row[0]).alias("__qc")
    )
    joined = codes.crossJoin(F.broadcast(qcodes))
    dist = F.when(
        F.size(F.col(code_col)) == F.size(F.col("__qc")),
        hamming(F.col(code_col), F.col("__qc")),
    ).otherwise(
        F.raise_error(
            F.lit(
                "dimension mismatch: query code words differ from corpus "
                f"column {code_col!r}"
            )
        )
    )
    scored = joined.select(query_id_col, id_col, dist.alias("hamming"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("hamming").asc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
