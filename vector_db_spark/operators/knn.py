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

from vector_db_spark.functions.vector import cosine_sim, dot, l2_norm, l2_sq
from vector_db_spark.operators.util import collect_query_rows

# metric name -> (distance/score expression builder, ascending?)
_METRICS = {
    "l2": (l2_sq, True),
    "ip": (dot, False),
    "cosine": (cosine_sim, False),
}

SCORE_COL = {"l2": "distance", "ip": "score", "cosine": "score"}

# Arrow kernels refuse NaN corpus components (ADVICE r10): a pandas NaN
# score becomes NULL across the Arrow transport, which Spark ranks
# opposite to the expression path's true NaN (NULL sorts last under the
# desc window / FIRST under l2's asc, NaN sorts above every double) and
# collides with the deliberate cosine zero-norm NULLs. Loud beats
# silently divergent.
_NAN_CORPUS_MSG = (
    "corpus column {vec_col!r} contains NaN components; the Arrow kNN "
    "kernel cannot rank non-finite scores consistently with the "
    "expression path (NaN becomes NULL across the Arrow transport) — "
    "filter NaN rows first or use impl='expr'"
)


def _metric(metric: str):
    try:
        return _METRICS[metric]
    except KeyError:
        raise ValueError(
            f"unknown metric {metric!r}; expected one of {sorted(_METRICS)}"
        ) from None


# Dim threshold past which exact scoring dispatches to the Arrow kernel.
# The codegen'd aggregate(zip_with(...)) fold is ideal at fixture dims
# (64), but it evaluates interpreted per element: at real embedding-model
# widths (768-1536) a batched float64 GEMM over each Arrow batch wins by
# an order of magnitude (measured 6.4x at 512-d, see test_knn_arrow.py) —
# the same economics as ann._nearest_centroid_arrow (VERDICT r9 #5).
# Below the threshold the fold also keeps BIT-IDENTICAL parity with the
# DuckDB oracle's left-assoc sum (vector_db_spark/oracle.py); the Arrow
# path's NumPy pairwise summation agrees only to ~1e-12, so oracle-gated
# fixture queries must stay under it.
ARROW_DIM_MIN = 128


def _score_arrow(
    df: DataFrame,
    query,
    *,
    metric: str,
    vec_col: str,
    out: str,
) -> DataFrame:
    """Score every row against ONE query vector with a per-Arrow-batch
    NumPy kernel; drops ``vec_col``, appends ``out`` (double). Preserves
    knn()'s contracts: dimension mismatch raises (per batch, with the
    same message), cosine zero-norms score NULL (not NaN — NaN would sort
    ABOVE every real score in a DESC top-k).

    NaN corpus components RAISE (ADVICE r10). The expression path scores
    such rows NaN, which Spark ranks above every double under desc — but
    the Arrow transport converts a pandas NaN to NULL, which ranks LAST
    (and is indistinguishable from the deliberate zero-norm NULLs), so
    the two impls cannot agree on corrupt data. Failing loudly beats a
    silently divergent ranking; callers with known-dirty corpora filter
    NaN rows first (one codegen'd exists() predicate)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    q = np.asarray([float(x) for x in query], dtype=np.float64)
    if np.isnan(q).any():
        raise ValueError("query vector contains NaN")
    dim = q.shape[0]
    qn = float(np.linalg.norm(q))

    def score(it):
        for pdf in it:
            rows = pdf[vec_col].tolist()
            res = pdf.drop(columns=[vec_col])
            if not rows:
                res[out] = pd.Series([], dtype="float64")
                yield res
                continue
            v = np.asarray(rows, dtype=np.float64)
            if v.ndim != 2 or v.shape[1] != dim:
                raise ValueError(
                    f"dimension mismatch: query has {dim} components, "
                    f"corpus column {vec_col!r} differs"
                )
            if np.isnan(v).any():
                raise ValueError(_NAN_CORPUS_MSG.format(vec_col=vec_col))
            if metric == "l2":
                res[out] = ((v - q) ** 2).sum(axis=1)
            elif metric == "ip":
                res[out] = v @ q
            else:  # cosine
                vn = np.linalg.norm(v, axis=1)
                denom = vn * qn
                safe = np.where(denom == 0.0, 1.0, denom)
                vals = ((v @ q) / safe).astype(object)
                vals[denom == 0.0] = None
                res[out] = vals
            yield res

    schema = StructType(
        [f for f in df.schema.fields if f.name != vec_col]
        + [StructField(out, DoubleType())]
    )
    return df.mapInPandas(score, schema=schema)


def query_literal(vec: Sequence[float]) -> Column:
    """Inline a Python query vector as a literal array<double> column."""
    return F.array(*[F.lit(float(x)) for x in vec])


# Built unrolled Columns are CACHED: constructing a 64-term chain costs
# ~1.1 s of py4j round-trips (measured — ~400 Column-operator calls), and
# bench/serving paths construct the identical expression on every plan.
# A Column is an immutable expression tree, safely reusable across
# DataFrames and queries (same contract as a shared F.col()). Keyed by
# (metric, corpus column NAME, literal tuple | query column NAME, dim);
# bounded — a long-lived server with many distinct query vectors must not
# grow an unbounded expression cache.
_UNROLL_CACHE: dict[tuple, Column] = {}
_UNROLL_CACHE_MAX = 512
# Cached Columns are py4j-backed: they reference the JVM gateway of the
# session that built them. If the SparkSession is stopped and recreated
# in-process, the cached objects point at a dead gateway and every later
# knn call would fail opaquely (ADVICE r15) — so the cache is keyed to
# the active session and cleared when it changes.
_UNROLL_CACHE_SESSION: int | None = None


def _unrolled_metric(
    metric: str, a_col: str, b, dim: int | None = None
) -> Column | None:
    """Unrolled fixed-dim scoring expression for ``metric``, or None when
    the dim is unknown/over the unroll ceiling (callers fall back to the
    dim-generic interpreted fold). ``a_col`` is the corpus array column
    NAME; ``b`` a Python sequence (its length IS the dim) or a query
    array column NAME (pass ``dim`` explicitly). Bit-equal to the fold
    ONLY for rows whose arrays carry exactly ``dim`` components — callers
    must guard sizes (knn's dim-mismatch raise, or a when(size==dim)
    with the fold as the otherwise branch)."""
    from vector_db_spark.functions.vector import (
        UNROLL_DIM_MAX,
        cosine_sim_unrolled,
        dot_unrolled,
        l2_sq_unrolled,
    )

    if isinstance(b, str):
        d = dim
        b_key: tuple | str = b
    else:
        d = dim if dim is not None else len(b)
        b_key = tuple(float(x) for x in b)
    if d is None or d > UNROLL_DIM_MAX:
        return None
    from pyspark.sql import SparkSession

    global _UNROLL_CACHE_SESSION
    sess = SparkSession.getActiveSession()
    token = None if sess is None else id(sess)
    if token != _UNROLL_CACHE_SESSION:
        _UNROLL_CACHE.clear()
        _UNROLL_CACHE_SESSION = token
    key = (metric, a_col, b_key, d)
    col = _UNROLL_CACHE.get(key)
    if col is None:
        builder = {
            "l2": l2_sq_unrolled,
            "ip": dot_unrolled,
            "cosine": cosine_sim_unrolled,
        }[metric]
        bb = F.col(b) if isinstance(b, str) else b
        col = builder(F.col(a_col), bb, d)
        if len(_UNROLL_CACHE) >= _UNROLL_CACHE_MAX:
            # evict the OLDEST entry (insertion order), not the whole
            # cache — a full clear re-pays ~1.1 s per hot entry (ADVICE)
            _UNROLL_CACHE.pop(next(iter(_UNROLL_CACHE)))
        _UNROLL_CACHE[key] = col
    return col


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
    impl: str = "auto",
    unroll: bool = False,
) -> DataFrame:
    """Exact top-k nearest rows of ``corpus`` to one query vector.

    Returns ``(id_col, *keep_cols, distance|score)`` ordered by the metric
    (ASC for l2, DESC for ip/cosine), ties broken by id.

    ``impl``: ``"auto"`` scores with the codegen'd expression fold below
    ``ARROW_DIM_MIN`` query components and an Arrow-batched NumPy kernel
    at or above it (Column queries always take the fold — their dim is
    unknowable at plan time); ``"expr"``/``"arrow"`` force a path. Both
    plans end in TakeOrderedAndProject — per-partition local top-k, only
    k rows per partition reach the merge. Arrow-path scores agree with
    the fold to ~1e-12 (pairwise vs sequential float64 summation), which
    can swap equal-to-rounding neighbors at the k boundary.
    """
    if k < 1:
        raise ValueError("k must be >= 1")  # reference: src/models/request/search.rs:6-17
    if impl not in ("auto", "expr", "arrow"):
        raise ValueError(f"impl must be auto|expr|arrow, got {impl!r}")
    expr_fn, ascending = _metric(metric)
    out = SCORE_COL[metric]
    if not isinstance(query, Column):
        if len(query) == 0:
            raise ValueError("query vector must be non-empty")
        if impl == "arrow" or (impl == "auto" and len(query) >= ARROW_DIM_MIN):
            df = corpus
            if predicate is not None:
                df = df.filter(predicate)
            scored = _score_arrow(
                df.select(id_col, *keep_cols, vec_col),
                query,
                metric=metric,
                vec_col=vec_col,
                out=out,
            )
            order = F.col(out).asc() if ascending else F.col(out).desc()
            return scored.orderBy(order, F.col(id_col).asc()).limit(k)
    elif impl == "arrow":
        raise ValueError("impl='arrow' needs a concrete query vector, not a Column")
    if isinstance(query, Column):
        qcol = query
        dist = expr_fn(F.col(vec_col), qcol)
    else:
        # (emptiness already rejected by the guard ahead of the dispatch)
        qcol = query_literal(query)
        # r15: ``unroll=True`` swaps the interpreted aggregate(zip_with)
        # fold for the flat codegen'd chain (bit-equal — see
        # functions/vector.py for the break-even math: the bigger
        # expression costs ~0.15-0.2 s of Catalyst work per PLAN, the
        # fold ~1.5 µs of interpreted work per SCORED ROW, so unrolling
        # pays past ~3-5M scored rows per query and loses below). The
        # size guard below already ensures only exact-dim rows reach it.
        scored_expr = (
            _unrolled_metric(metric, vec_col, query) if unroll else None
        )
        if scored_expr is None:
            scored_expr = expr_fn(F.col(vec_col), qcol)
        # Strict dim check (deliberate divergence: the reference silently
        # searches with a mismatched dim, src/router/handle/
        # search_index_handle.rs:201-215; we reject — SURVEY.md §7.4 / B6).
        dist = F.when(
            F.size(F.col(vec_col)) == len(query),
            scored_expr,
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
    impl: str = "auto",
    dim: int | None = None,
    unroll: bool = False,
) -> DataFrame:
    """Exact top-k per query vector for a (small) DataFrame of queries.

    The query side is broadcast — the corpus never shuffles; per-query
    ranking is a window over the candidate rows.
    Returns ``(query_id, id_col, distance|score, rank)``.

    ``impl="arrow"`` (or ``impl="auto"`` with a ``dim`` hint >=
    ``ARROW_DIM_MIN`` — the query dim is inside a DataFrame here, so auto
    needs the caller to state it; no silent job runs to peek) scores each
    corpus Arrow batch against the whole query matrix with ONE float64
    GEMM and keeps only each query's LOCAL top-k per batch
    (np.argpartition), so the window ranks |batches|·k candidate rows per
    query instead of |corpus| interpreted-fold evaluations — the 768-d+
    path. The queries are collected to the driver (they were being
    broadcast whole anyway; same smallness contract)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if impl not in ("auto", "expr", "arrow"):
        raise ValueError(f"impl must be auto|expr|arrow, got {impl!r}")
    expr_fn, ascending = _metric(metric)
    out = SCORE_COL[metric]

    df = corpus
    if predicate is not None:
        df = df.filter(predicate)

    if impl == "arrow" or (
        impl == "auto" and dim is not None and dim >= ARROW_DIM_MIN
    ):
        candidates = _batch_score_topk_arrow(
            df.select(id_col, vec_col),
            queries,
            k,
            metric=metric,
            vec_col=vec_col,
            id_col=id_col,
            query_id_col=query_id_col,
            query_vec_col=query_vec_col,
            out=out,
        )
        order = F.col(out).asc() if ascending else F.col(out).desc()
        w = Window.partitionBy(query_id_col).orderBy(order, F.col(id_col).asc())
        return (
            candidates.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )

    joined = df.crossJoin(F.broadcast(queries))
    # r15: ``unroll=True`` (callers whose |queries|x|corpus| candidate
    # count clears the ~3-5M-row break-even — see functions/vector.py)
    # scores candidate pairs with the unrolled codegen chain; rows whose
    # arrays differ from the stated dim fall through to the original
    # interpreted fold (CaseWhen branches evaluate lazily per row), so
    # the output is bit-equal for EVERY input — including dim-mismatched
    # corpora, where the fold's zip_with NULL-padding semantics apply.
    fold = expr_fn(F.col(vec_col), F.col(query_vec_col))
    unrolled = (
        _unrolled_metric(metric, vec_col, query_vec_col, dim=dim)
        if unroll
        else None
    )
    if unrolled is not None:
        score_expr = F.when(
            (F.size(F.col(vec_col)) == dim)
            & (F.size(F.col(query_vec_col)) == dim),
            unrolled,
        ).otherwise(fold)
    else:
        score_expr = fold
    scored = joined.select(
        query_id_col,
        id_col,
        score_expr.alias(out),
    )
    order = F.col(out).asc() if ascending else F.col(out).desc()
    w = Window.partitionBy(query_id_col).orderBy(order, F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _batch_score_topk_arrow(
    df: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    metric: str,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    query_vec_col: str,
    out: str,
) -> DataFrame:
    """(query_id, id, score) candidates: one corpus-batch × query-matrix
    GEMM per Arrow batch, emitting each query's local top-k of the batch.
    Global ranking stays with the caller's window.

    Local selection is a lexsort on (metric order, id) — NOT a bare
    argpartition, which picks arbitrarily among rows tied at the k
    boundary and could exclude the very row the global (score, id ASC)
    window is contractually bound to keep (k+1 exact-duplicate vectors
    in one batch made that concrete). Cosine zero-norm rows score NULL
    and are kept OUT of the real ranking but emitted as id-ordered
    BACKFILL when a batch has fewer than k real candidates — the same
    rows-ranked-after-every-real-candidate shape the expression path's
    nulls-last window produces, so both impls return identical row
    counts. NaN corpus/query components raise (see _NAN_CORPUS_MSG: the
    Arrow transport turns NaN into NULL, which cannot reproduce the
    expression path's NaN-first desc ranking)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    qrows = collect_query_rows(
        queries.select(query_id_col, query_vec_col)
    )
    if not qrows:
        raise ValueError("queries must be non-empty")
    qids = [r[0] for r in qrows]
    qm = np.asarray([[float(x) for x in r[1]] for r in qrows], dtype=np.float64)
    if np.isnan(qm).any():
        raise ValueError("query vectors contain NaN")
    dim = qm.shape[1]
    if metric == "cosine":
        qn = np.linalg.norm(qm, axis=1)
        qm = qm / np.where(qn == 0.0, 1.0, qn)[:, None]

    def score(it):
        empty = pd.DataFrame(
            {query_id_col: pd.Series([], dtype=object),
             id_col: pd.Series([], dtype=object),
             out: pd.Series([], dtype="float64")}
        )
        for pdf in it:
            rows = pdf[vec_col].tolist()
            if not rows:
                yield empty
                continue
            v = np.asarray(rows, dtype=np.float64)
            if v.ndim != 2 or v.shape[1] != dim:
                raise ValueError(
                    f"dimension mismatch: queries have {dim} components, "
                    f"corpus column {vec_col!r} differs"
                )
            if np.isnan(v).any():
                raise ValueError(_NAN_CORPUS_MSG.format(vec_col=vec_col))
            dead = None
            if metric == "l2":
                s = (
                    (v * v).sum(axis=1)[:, None]
                    - 2.0 * (v @ qm.T)
                    + (qm * qm).sum(axis=1)[None, :]
                )
            elif metric == "ip":
                s = v @ qm.T
            else:  # cosine (queries pre-normalized above)
                vn = np.linalg.norm(v, axis=1)
                dead = vn == 0.0
                s = (v / np.where(dead, 1.0, vn)[:, None]) @ qm.T
            ids = pdf[id_col].to_numpy()
            kk = min(k, s.shape[0])
            dead_ids = np.sort(ids[dead])[:kk] if dead is not None else None
            sel_qid, sel_id, sel_val = [], [], []
            for j in range(s.shape[1]):
                col = s[:, j]
                key = col if metric == "l2" else -col
                if dead is not None:
                    key = np.where(dead, np.inf, key)
                idx = np.lexsort((ids, key))[:kk]
                if dead is not None:
                    idx = idx[~dead[idx]]
                sel_qid.extend([qids[j]] * len(idx))
                sel_id.extend(ids[idx])
                sel_val.extend(col[idx].tolist())
                if dead_ids is not None and len(idx) < kk:
                    fill = dead_ids[: kk - len(idx)]
                    sel_qid.extend([qids[j]] * len(fill))
                    sel_id.extend(fill)
                    sel_val.extend([None] * len(fill))
            yield pd.DataFrame(
                {query_id_col: sel_qid, id_col: sel_id, out: sel_val}
            )

    schema = StructType(
        [
            queries.schema[query_id_col],
            df.schema[id_col],
            StructField(out, DoubleType()),
        ]
    )
    return df.mapInPandas(score, schema=schema)


def range_search(
    corpus: DataFrame,
    query: Sequence[float] | Column,
    threshold: float,
    *,
    metric: str = "l2",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    predicate: Column | None = None,
    keep_cols: Sequence[str] = (),
    impl: str = "auto",
) -> DataFrame:
    """All rows within a metric threshold of the query (faiss
    ``range_search`` semantics): l2 keeps squared-L2 <= threshold, ip and
    cosine keep score >= threshold. Unlike top-k there is no LIMIT — the
    result size is data-dependent — so the plan is a pushed-down filter
    over the scan plus a sort of only the matching rows; the corpus never
    shuffles. Ordered by (metric, id) for determinism.

    ``impl`` follows knn(): past ARROW_DIM_MIN query components the score
    comes from the per-Arrow-batch kernel (threshold filter and sort stay
    JVM-side); Column queries and fixture dims keep the oracle-parity
    expression fold."""
    expr_fn, ascending = _metric(metric)
    out = SCORE_COL[metric]
    if impl not in ("auto", "expr", "arrow"):
        raise ValueError(f"impl must be auto|expr|arrow, got {impl!r}")
    df = corpus
    if predicate is not None:
        df = df.filter(predicate)
    if not isinstance(query, Column) and (
        impl == "arrow" or (impl == "auto" and len(query) >= ARROW_DIM_MIN)
    ):
        scored = _score_arrow(
            df.select(id_col, *keep_cols, vec_col),
            query,
            metric=metric,
            vec_col=vec_col,
            out=out,
        )
    else:
        if impl == "arrow":
            raise ValueError(
                "impl='arrow' needs a concrete query vector, not a Column"
            )
        qcol = query if isinstance(query, Column) else query_literal(query)
        scored = df.select(
            id_col, *keep_cols, expr_fn(F.col(vec_col), qcol).alias(out)
        )
    keep = scored.filter(
        F.col(out) <= float(threshold) if ascending else F.col(out) >= float(threshold)
    )
    order = F.col(out).asc() if ascending else F.col(out).desc()
    return keep.orderBy(order, F.col(id_col).asc())


def batch_range_search(
    corpus: DataFrame,
    queries: DataFrame,
    threshold: float,
    *,
    metric: str = "l2",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    predicate: Column | None = None,
    impl: str = "auto",
    dim: int | None = None,
    unroll: bool = False,
) -> DataFrame:
    """All (query, corpus-row) pairs within the metric threshold — the
    BATCHED faiss ``range_search`` (its native signature takes n queries
    at once; the single-query operator is the n = 1 case). l2 keeps
    squared-L2 <= t, ip/cosine keep score >= t. The query side broadcasts
    (expr) or collects to the driver (Arrow — the same smallness contract
    as batch_knn); the corpus never shuffles, and there is no LIMIT: the
    threshold filter IS the cardinality bound, applied before the sort so
    only matches rank. Returns (query_id, id, distance|score) ordered by
    (query_id, metric, id).

    Arrow dispatch mirrors batch_knn — ``impl='arrow'`` or ``'auto'``
    with a ``dim`` hint >= ARROW_DIM_MIN scores each corpus Arrow batch
    against the whole query matrix with ONE float64 GEMM and emits only
    the passing cells (np.nonzero on the threshold mask), so the kernel's
    output is match-bounded, not |corpus|x|queries|-bounded. Cosine
    zero-norm rows score NULL in the expression path and NULL passes no
    threshold; the kernel never emits them — identical row sets. NaN
    corpus/query components raise (same transport argument as
    _NAN_CORPUS_MSG)."""
    if impl not in ("auto", "expr", "arrow"):
        raise ValueError(f"impl must be auto|expr|arrow, got {impl!r}")
    expr_fn, ascending = _metric(metric)
    out = SCORE_COL[metric]
    thr = float(threshold)

    df = corpus
    if predicate is not None:
        df = df.filter(predicate)

    if impl == "arrow" or (
        impl == "auto" and dim is not None and dim >= ARROW_DIM_MIN
    ):
        matches = _batch_score_range_arrow(
            df.select(id_col, vec_col),
            queries,
            thr,
            metric=metric,
            vec_col=vec_col,
            id_col=id_col,
            query_id_col=query_id_col,
            query_vec_col=query_vec_col,
            out=out,
        )
    else:
        joined = df.crossJoin(F.broadcast(queries))
        fold = expr_fn(F.col(vec_col), F.col(query_vec_col))
        unrolled = (
            _unrolled_metric(metric, vec_col, query_vec_col, dim=dim)
            if unroll
            else None
        )
        if unrolled is not None:
            # r15: unrolled codegen chain for exact-dim pairs, fold
            # otherwise (lazy CaseWhen branches) — bit-equal output
            score_expr = F.when(
                (F.size(F.col(vec_col)) == dim)
                & (F.size(F.col(query_vec_col)) == dim),
                unrolled,
            ).otherwise(fold)
        else:
            score_expr = fold
        scored = joined.select(
            query_id_col,
            id_col,
            score_expr.alias(out),
        )
        matches = scored.filter(
            F.col(out) <= thr if ascending else F.col(out) >= thr
        )
    order = F.col(out).asc() if ascending else F.col(out).desc()
    return matches.orderBy(
        F.col(query_id_col).asc(), order, F.col(id_col).asc()
    )


def _batch_score_range_arrow(
    df: DataFrame,
    queries: DataFrame,
    threshold: float,
    *,
    metric: str,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    query_vec_col: str,
    out: str,
) -> DataFrame:
    """(query_id, id, score) threshold matches: one corpus-batch x
    query-matrix GEMM per Arrow batch, np.nonzero on the threshold mask —
    output rows scale with MATCHES, never with the score matrix. Range
    has no rank boundary, so no tie handling is needed (every passing
    cell is emitted); ordering stays with the caller."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    qrows = collect_query_rows(
        queries.select(query_id_col, query_vec_col)
    )
    if not qrows:
        raise ValueError("queries must be non-empty")
    qids = np.asarray([r[0] for r in qrows])
    qm = np.asarray([[float(x) for x in r[1]] for r in qrows], dtype=np.float64)
    if np.isnan(qm).any():
        raise ValueError("query vectors contain NaN")
    dim = qm.shape[1]
    if metric == "cosine":
        qn = np.linalg.norm(qm, axis=1)
        qm = qm / np.where(qn == 0.0, 1.0, qn)[:, None]

    def score(it):
        empty = pd.DataFrame(
            {query_id_col: pd.Series([], dtype=object),
             id_col: pd.Series([], dtype=object),
             out: pd.Series([], dtype="float64")}
        )
        for pdf in it:
            rows = pdf[vec_col].tolist()
            if not rows:
                yield empty
                continue
            v = np.asarray(rows, dtype=np.float64)
            if v.ndim != 2 or v.shape[1] != dim:
                raise ValueError(
                    f"dimension mismatch: queries have {dim} components, "
                    f"corpus column {vec_col!r} differs"
                )
            if np.isnan(v).any():
                raise ValueError(_NAN_CORPUS_MSG.format(vec_col=vec_col))
            if metric == "l2":
                s = (
                    (v * v).sum(axis=1)[:, None]
                    - 2.0 * (v @ qm.T)
                    + (qm * qm).sum(axis=1)[None, :]
                )
                mask = s <= threshold
            elif metric == "ip":
                s = v @ qm.T
                mask = s >= threshold
            else:  # cosine (queries pre-normalized above)
                vn = np.linalg.norm(v, axis=1)
                dead = vn == 0.0
                s = (v / np.where(dead, 1.0, vn)[:, None]) @ qm.T
                mask = (s >= threshold) & ~dead[:, None]
            ri, ci = np.nonzero(mask)
            ids = pdf[id_col].to_numpy()
            yield pd.DataFrame(
                {query_id_col: qids[ci], id_col: ids[ri], out: s[ri, ci]}
            )

    schema = StructType(
        [
            queries.schema[query_id_col],
            df.schema[id_col],
            StructField(out, DoubleType()),
        ]
    )
    return df.mapInPandas(score, schema=schema)


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
    # For cosine, norms are per-ROW quantities: compute them once on each
    # side before the pair join so the per-pair expression is a single dot
    # fold instead of dot + two norms (3× the interpreted-HOF work on an
    # O(n²) frame). Same expression on the same data ⇒ bit-identical score.
    norm_cols = (
        [l2_norm(F.col(vec_col)).alias("a_norm")] if metric == "cosine" else []
    )
    a = corpus.select(
        F.col(id_col).alias("a_id"),
        F.col(vec_col).alias("a_vec"),
        *norm_cols,
        *([F.col(block_col).alias("a_blk")] if block_col else []),
    )
    b = corpus.select(
        F.col(id_col).alias("b_id"),
        F.col(vec_col).alias("b_vec"),
        *([l2_norm(F.col(vec_col)).alias("b_norm")] if metric == "cosine" else []),
        *([F.col(block_col).alias("b_blk")] if block_col else []),
    )
    cond = F.col("a_id") < F.col("b_id")
    if block_col:
        cond = cond & (F.col("a_blk") == F.col("b_blk"))
    # The unblocked pair join is a broadcast nested loop with B broadcast;
    # A is the streamed side and inherits the corpus's file partitioning —
    # often ONE partition for a small dim table, serializing the whole
    # O(n²) evaluation. Spread A across the cluster explicitly.
    par = corpus.sparkSession.sparkContext.defaultParallelism
    a = a.repartition(par)
    pairs = a.join(b, cond)
    if metric == "cosine":
        denom = F.col("a_norm") * F.col("b_norm")
        # zero-norm guard matches cosine_sim (NULL, not ANSI div-by-zero)
        score = F.when(denom != 0.0, dot(F.col("a_vec"), F.col("b_vec")) / denom)
    else:
        score = expr_fn(F.col("a_vec"), F.col("b_vec"))
    scored = pairs.select("a_id", "b_id", score.alias(out))
    keep = F.col(out) <= threshold if ascending else F.col(out) >= threshold
    return scored.filter(keep)


def pairwise_similarity_blocked(
    corpus: DataFrame,
    *,
    metric: str = "cosine",
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_blocks: int = 16,
) -> DataFrame:
    """Exact all-pairs similarity via grid-blocked float64 matmul — the
    100 TB formulation of :func:`pairwise_similarity`.

    Every vector lands in one of ``n_blocks`` hash blocks; the pair space
    becomes the B(B+1)/2 block-grid cells. Each cell is one Arrow-batched
    ``applyInPandas`` task that multiplies the two blocks' matrices with
    BLAS and emits only qualifying pairs, so (a) the quadratic work is
    vectorized instead of per-row expression evaluation, (b) it spreads
    over B(B+1)/2 independent tasks, and (c) each task holds 2n/B vectors
    — bounded by choosing B ~ n / rows_per_task. Replication cost: each
    vector is shipped to B cells.

    Scores are float64 BLAS sums, which can differ from the sequential-fold
    expression path in the last bits — equal to ~1e-12, not bitwise.
    """
    expr_fn, ascending = _metric(metric)  # validates the metric name
    out = SCORE_COL[metric]
    b_count = int(n_blocks)
    if b_count < 1:
        raise ValueError("n_blocks must be >= 1")

    tagged = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(b_count)).alias("blk"),
    )
    # Replicate each row into every grid cell (bi <= bj) its block touches.
    cells = F.array(
        *[
            F.struct(
                F.least(F.col("blk"), F.lit(g)).cast("int").alias("bi"),
                F.greatest(F.col("blk"), F.lit(g)).cast("int").alias("bj"),
            )
            for g in range(b_count)
        ]
    )
    exploded = tagged.select(
        "id", "vec", "blk", F.explode(F.array_distinct(cells)).alias("cell")
    ).select("id", "vec", "blk", F.col("cell.bi").alias("bi"), F.col("cell.bj").alias("bj"))

    import numpy as np
    import pandas as pd

    asc = ascending
    thr = float(threshold)

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        bi = int(pdf["bi"].iloc[0])
        bj = int(pdf["bj"].iloc[0])
        left = pdf[pdf["blk"] == bi]
        right = pdf[pdf["blk"] == bj] if bi != bj else left
        if left.empty or right.empty:
            return pd.DataFrame({"a_id": [], "b_id": [], out: []})
        lm = np.stack([np.asarray(v, dtype=np.float64) for v in left["vec"]])
        rm = np.stack([np.asarray(v, dtype=np.float64) for v in right["vec"]])
        lid = left["id"].to_numpy()
        rid = right["id"].to_numpy()
        if metric == "cosine":
            ln = lm / np.linalg.norm(lm, axis=1, keepdims=True)
            rn = rm / np.linalg.norm(rm, axis=1, keepdims=True)
            sims = ln @ rn.T
        elif metric == "ip":
            sims = lm @ rm.T
        else:  # l2 (squared): |a|² + |b|² − 2a·b
            sims = (
                (lm * lm).sum(axis=1)[:, None]
                + (rm * rm).sum(axis=1)[None, :]
                - 2.0 * (lm @ rm.T)
            )
        mask = sims <= thr if asc else sims >= thr
        # Emit each unordered pair once, as (min_id, max_id).
        ii, jj = np.nonzero(mask)
        a_ids, b_ids, vals = lid[ii], rid[jj], sims[ii, jj]
        if bi == bj:
            keep = a_ids < b_ids  # upper triangle of a diagonal cell
            a_ids, b_ids, vals = a_ids[keep], b_ids[keep], vals[keep]
        else:
            lo = np.minimum(a_ids, b_ids)
            hi = np.maximum(a_ids, b_ids)
            a_ids, b_ids = lo, hi
        return pd.DataFrame({"a_id": a_ids, "b_id": b_ids, out: vals})

    schema = f"a_id long, b_id long, {out} double"
    return exploded.groupBy("bi", "bj").applyInPandas(cell_pairs, schema=schema)


def knn_page(
    corpus: DataFrame,
    query: Sequence[float] | Column,
    k: int,
    after: tuple[float, int] | None = None,
    *,
    metric: str = "l2",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    predicate: Column | None = None,
    impl: str = "auto",
) -> DataFrame:
    """Keyset-paginated kNN (the vector-store ``search_after`` cursor):
    page N+1 passes page N's last ``(score, id)`` and the plan filters
    strictly-after rows in (metric, id) order BEFORE the top-k — still
    TakeOrderedAndProject over a pushed-down scan, and unlike
    OFFSET-pagination no skipped row is ever recomputed or shuffled.
    The equality arm of the keyset test compares distances EXACTLY —
    sound only when ONE scorer produces both the cursor and the
    re-scored candidates, because the expression fold and the Arrow
    kernel agree only to ~1e-12 and a boundary-tied row scored by one
    and compared by the other can drop or duplicate.

    Both paths satisfy that per-scorer argument (VERDICT r10 #3):

    - **expr** applies the keyset as a predicate of the same left-assoc
      float64 fold every engine path shares (vector_db_spark/oracle.py).
    - **arrow** (past ARROW_DIM_MIN under ``impl='auto'``, the regime
      the kernel exists for) scores with _score_arrow and applies the
      keyset to the KERNEL'S OWN output column — never mixing scorers.
      The kernel's per-row reduction is deterministic for a given row
      regardless of Arrow batch composition, so a page-N cursor equals
      the page-N+1 rescore bit-for-bit. (A two-page walk at 512-d over
      60k cached rows measured 2.06 s expr → 1.34 s arrow, 1.5× with
      per-page fixed costs included; the scoring gap itself scales with
      dim like knn()'s — 2.5× at 1024-d.)

    Pages of one search must be fetched with one impl; ``auto`` is
    deterministic in the query dim, so a consistent caller stays on one
    scorer without thinking about it. Column queries always use expr
    (their dim is unknowable at plan time).

    Cursor compatibility (ADVICE r11): a cursor may carry its scorer as
    an optional third element, ``(score, id, 'expr'|'arrow')`` — the tag
    then DISPATCHES the page (an explicit contradicting ``impl`` is an
    error, never a silent scorer mix). A bare ``(score, id)`` cursor is
    accepted wherever it is unambiguous: any explicit ``impl``, or
    ``auto`` in the expr regime (dim < ARROW_DIM_MIN, where every
    release's auto has meant expr). ``auto`` + an untagged cursor in the
    arrow regime raises instead of guessing — a cursor minted before the
    Arrow arm existed (or by an ``impl='expr'`` caller) would otherwise
    replay under the other scorer across the page boundary, the exact
    drop/duplicate hazard above."""
    if k < 1:
        raise ValueError("k must be >= 1")  # both arms; the Arrow arm
        # otherwise silently returned an empty page for k=0
    expr_fn, ascending = _metric(metric)
    out = SCORE_COL[metric]
    if impl not in ("auto", "expr", "arrow"):
        raise ValueError(f"impl must be auto|expr|arrow, got {impl!r}")
    if after is not None and len(after) == 3:
        tag = after[2]
        if tag not in ("expr", "arrow"):
            raise ValueError(
                f"cursor scorer tag must be 'expr' or 'arrow', got {tag!r}"
            )
        if impl != "auto" and impl != tag:
            raise ValueError(
                f"cursor was minted by the {tag} scorer but impl={impl!r}; "
                "pages of one search must share one scorer"
            )
        impl = tag
        after = (after[0], after[1])
    use_arrow = (
        not isinstance(query, Column)
        and (impl == "arrow" or (impl == "auto" and len(query) >= ARROW_DIM_MIN))
    )
    if impl == "arrow" and isinstance(query, Column):
        raise ValueError("impl='arrow' needs a concrete query vector, not a Column")
    if use_arrow and impl == "auto" and after is not None:
        raise ValueError(
            "ambiguous cursor: impl='auto' resolves to the Arrow scorer at "
            f"this query dim, but the (score, id) cursor does not say which "
            "scorer minted it — pass impl='arrow'/'expr' explicitly, or a "
            "(score, id, scorer) cursor"
        )
    if use_arrow:
        df = corpus if predicate is None else corpus.filter(predicate)
        scored = _score_arrow(
            df.select(id_col, vec_col), query, metric=metric, vec_col=vec_col, out=out
        )
        if after is not None:
            last_score, last_id = float(after[0]), int(after[1])
            s = F.col(out)
            strictly = s > last_score if ascending else s < last_score
            # NULL scores (cosine zero-norm backfill) fail every keyset
            # comparison and drop — matching the expr path, where the
            # NULL-distance rows likewise never satisfy the predicate
            scored = scored.filter(
                strictly | ((s == last_score) & (F.col(id_col) > last_id))
            )
        order = F.col(out).asc() if ascending else F.col(out).desc()
        return scored.orderBy(order, F.col(id_col).asc()).limit(k)
    page_pred = predicate
    if after is not None:
        last_score, last_id = float(after[0]), int(after[1])
        qcol = query if isinstance(query, Column) else query_literal(query)
        d = expr_fn(F.col(vec_col), qcol)
        strictly = d > last_score if ascending else d < last_score
        keyset = strictly | ((d == last_score) & (F.col(id_col) > last_id))
        page_pred = keyset if page_pred is None else (page_pred & keyset)
    return knn(
        corpus,
        query,
        k,
        metric=metric,
        vec_col=vec_col,
        id_col=id_col,
        predicate=page_pred,
        impl="expr",
    )
