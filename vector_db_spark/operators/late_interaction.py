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

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_db_spark.functions.vector import dot
from vector_db_spark.operators.knn import query_literal
from vector_db_spark.operators.util import collect_query_rows

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


def _per_token_maxes(
    corpus: DataFrame, doc_col: str, vec_col: str, toks: list[list[float]]
) -> DataFrame:
    """(doc, _m0.._mT-1): each document's per-query-token MAX dot — the
    shared scoring core of maxsim_search and maxsim_search_batch (one
    definition so the literal/Arrow dispatch threshold and the fold
    shape cannot drift between the single and batch paths). Dispatch:
    native codegen folds below the Catalyst literal-term ceiling, one
    Arrow GEMM kernel past it."""
    dim = len(toks[0])
    if len(toks) * dim <= _LITERAL_TERM_CEILING:
        scored = corpus.select(
            F.col(doc_col).alias("doc"),
            *[
                dot(F.col(vec_col), query_literal(t)).alias(f"_d{i}")
                for i, t in enumerate(toks)
            ],
        )
        return scored.groupBy("doc").agg(
            *[F.max(f"_d{i}").alias(f"_m{i}") for i in range(len(toks))]
        )
    scored = _token_dots_arrow(
        corpus.select(F.col(doc_col).alias("doc"), vec_col), vec_col, toks
    )
    return scored.groupBy("doc").agg(
        *[F.max(F.col("dots")[i]).alias(f"_m{i}") for i in range(len(toks))]
    )


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

    maxes = _per_token_maxes(corpus, doc_col, vec_col, toks)

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
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Top-k MaxSim per query for a DataFrame of multi-token queries
    (long format: one row per (query, token)).

    ``candidates`` (columns: query_id, doc) restricts each query's
    ranking to ITS OWN candidate pairs — the hook the IVF path uses so
    per-query shortlists don't leak docs across queries; None ranks
    every query against every corpus doc.

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
    rows = collect_query_rows(
        queries.select(query_id_col, token_id_col, token_vec_col)
        .orderBy(query_id_col, token_id_col),
        what="batch token-query set",
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

    maxes = _per_token_maxes(corpus, doc_col, vec_col, toks)

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
    if candidates is not None:
        # equi-join on (query, doc); shortlisted candidate sets are small
        # enough that AQE broadcasts, full-probe (gate) sets are not —
        # let the runtime choose rather than forcing a broadcast
        stacked = stacked.join(
            candidates.select(query_id_col, doc_col).distinct(),
            on=[query_id_col, doc_col],
        )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col(score_col).desc(), F.col(doc_col).asc()
    )
    return stacked.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def maxsim_range_search(
    corpus: DataFrame,
    query_tokens: Sequence[Sequence[float]],
    threshold: float,
    *,
    doc_col: str,
    vec_col: str = "embedding",
    predicate: Column | None = None,
    score_col: str = "maxsim_score",
) -> DataFrame:
    """All documents whose MaxSim score clears `threshold` — the range
    twin of maxsim_search (faiss ``range_search`` semantics for the ip
    score family: keep score >= threshold; MaxSim is a sum of dots, so
    higher is better and a floor is the only sensible radius).

    Unlike top-k there is no LIMIT — the result size is data-dependent —
    so the plan is the shared per-token-max aggregate plus a filter and a
    sort of only the matching docs. Same ONE doc-key shuffle as
    maxsim_search; identical left-associated fold, so kept scores are
    bit-equal to the top-k operator's. Ordered by (score DESC, doc ASC).
    """
    toks = [list(map(float, t)) for t in query_tokens]
    if not toks:
        raise ValueError("query_tokens must be non-empty")
    dims = {len(t) for t in toks}
    if len(dims) != 1:
        raise ValueError(f"query tokens must share one dimension, got {dims}")

    if predicate is not None:
        corpus = corpus.filter(predicate)

    maxes = _per_token_maxes(corpus, doc_col, vec_col, toks)
    total = F.col("_m0")
    for i in range(1, len(toks)):
        total = total + F.col(f"_m{i}")
    return (
        maxes.select(F.col("doc").alias(doc_col), total.alias(score_col))
        .filter(F.col(score_col) >= float(threshold))
        .orderBy(F.col(score_col).desc(), F.col(doc_col).asc())
    )


def maxsim_range_search_batch(
    corpus: DataFrame,
    queries: DataFrame,
    threshold: float,
    *,
    doc_col: str,
    vec_col: str = "embedding",
    predicate: Column | None = None,
    query_id_col: str = "query_id",
    token_vec_col: str = "token_vec",
    token_id_col: str = "token_id",
    score_col: str = "maxsim_score",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Per-query MaxSim range matches for a DataFrame of multi-token
    queries (long format, the maxsim_search_batch shape): every
    (query, doc) pair whose exact score clears `threshold`.

    Corpus-side work is IDENTICAL to the batch top-k operator — one
    map-side-combined max shuffle on the doc key for the whole batch —
    with the per-query window ranking replaced by the threshold filter
    (no LIMIT; result size is data-dependent). ``candidates`` masks each
    query to its own (query, doc) pairs — the hook the IVF probed path
    uses. Returns (query_id, doc, score) ordered by
    (query, score DESC, doc ASC)."""
    toks, owner = _collect_batch_tokens(
        queries, query_id_col, token_id_col, token_vec_col
    )
    return _maxsim_range_batch_from_rows(
        corpus,
        toks,
        owner,
        threshold,
        doc_col=doc_col,
        vec_col=vec_col,
        predicate=predicate,
        query_id_col=query_id_col,
        score_col=score_col,
        candidates=candidates,
    )


def _collect_batch_tokens(
    queries: DataFrame,
    query_id_col: str,
    token_id_col: str,
    token_vec_col: str,
) -> tuple[list, list]:
    """ONE driver round-trip for a long-format multi-token query frame:
    returns (toks, owner) sorted by (query_id, token_id). Shared by the
    exact batch operators and the probed `_ivf_range_search_batch` core
    so the probed path doesn't collect the same frame twice (ADVICE
    r12)."""
    rows = collect_query_rows(
        queries.select(query_id_col, token_id_col, token_vec_col)
        .orderBy(query_id_col, token_id_col),
        what="batch token-query set",
    )
    if not rows:
        raise ValueError("queries must be non-empty")
    toks = [list(map(float, r[token_vec_col])) for r in rows]
    owner = [r[query_id_col] for r in rows]
    dims = {len(t) for t in toks}
    if len(dims) != 1:
        raise ValueError(f"query tokens must share one dimension, got {dims}")
    return toks, owner


def _maxsim_range_batch_from_rows(
    corpus: DataFrame,
    toks: list,
    owner: list,
    threshold: float,
    *,
    doc_col: str,
    vec_col: str,
    predicate: Column | None,
    query_id_col: str,
    score_col: str,
    candidates: DataFrame | None,
) -> DataFrame:
    """Body of maxsim_range_search_batch past the driver collect — takes
    pre-collected (toks, owner) so callers that already collected the
    query frame (the probed batch core) pay one round-trip, not two
    (ADVICE r12). Query ids are embedded as plan literals."""
    if predicate is not None:
        corpus = corpus.filter(predicate)

    maxes = _per_token_maxes(corpus, doc_col, vec_col, toks)

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
    if candidates is not None:
        stacked = stacked.join(
            candidates.select(query_id_col, doc_col).distinct(),
            on=[query_id_col, doc_col],
        )
    return stacked.filter(F.col(score_col) >= float(threshold)).orderBy(
        query_id_col, F.col(score_col).desc(), F.col(doc_col).asc()
    )


def _ivf_range_search(
    ivf,
    doc_col: str,
    vec_col: str,
    query_tokens: Sequence[Sequence[float]],
    threshold: float,
    *,
    nprobe: int,
    predicate: Column | None,
    score_col: str,
) -> DataFrame:
    """Shared probed-range core for both token-IVF families (raw and PQ —
    the PQ family retains raw token rows in its inner IVF layout, so both
    verify candidates exactly): candidate docs are those with >= 1 token
    row in the per-token probed cells; every candidate's FULL token set
    is then scored exactly, so returned rows are exact and coverage is
    the only quality axis (the graph/lsh range contract). MaxSim cells
    are probed by the ip score, which admits no lossless triangle-
    inequality bound — nprobe >= nlist IS the exhaustive (== exact)
    setting, and the exhaustive gates pin it."""
    from vector_db_spark.operators.ann import _CLUSTER_COL

    if nprobe < 1:
        raise ValueError("nprobe must be >= 1")
    toks = [list(map(float, t)) for t in query_tokens]
    if not toks:
        raise ValueError("query_tokens must be non-empty")
    dims = {len(t) for t in toks}
    if len(dims) != 1:
        raise ValueError(f"query tokens must share one dimension, got {dims}")

    nlist = len(ivf.centroids)
    nprobe = min(nprobe, nlist)
    probed = [ivf.probe_order(t)[:nprobe] for t in toks]
    union_cells = sorted({c for cells in probed for c in cells})

    live = ivf._live()
    if predicate is not None:
        live = live.filter(predicate)
    cand_rows = live.filter(F.col(_CLUSTER_COL).isin(union_cells))
    cand_docs = cand_rows.select(doc_col).distinct()
    rerank_src = live.join(cand_docs, doc_col, "left_semi")
    return maxsim_range_search(
        rerank_src,
        toks,
        threshold,
        doc_col=doc_col,
        vec_col=vec_col,
        score_col=score_col,
    )


def _ivf_range_search_batch(
    ivf,
    doc_col: str,
    vec_col: str,
    queries: DataFrame,
    threshold: float,
    *,
    nprobe: int,
    predicate: Column | None,
    query_id_col: str,
    token_vec_col: str,
    token_id_col: str,
    score_col: str,
) -> DataFrame:
    """Batch probed range, shared by both token-IVF families: per-query
    candidate (query, doc) pairs from ONE broadcast probe-pair equi-join
    on the partition column (identical candidate generation to
    search_batch), then one exact corpus pass masked per query with the
    threshold filter in place of the top-k window."""
    from vector_db_spark.operators.ann import _CLUSTER_COL

    if nprobe < 1:
        raise ValueError("nprobe must be >= 1")
    toks, owner = _collect_batch_tokens(
        queries, query_id_col, token_id_col, token_vec_col
    )

    nlist = len(ivf.centroids)
    nprobe = min(nprobe, nlist)
    probed = [ivf.probe_order(t)[:nprobe] for t in toks]
    cells_by_query: dict = {}
    for i, q in enumerate(owner):
        cells_by_query.setdefault(q, set()).update(probed[i])
    union_cells = sorted({c for cs in cells_by_query.values() for c in cs})

    live = ivf._live()
    if predicate is not None:
        live = live.filter(predicate)
    cand_rows = live.filter(F.col(_CLUSTER_COL).isin(union_cells))

    spark = live.sparkSession
    qtype = dict(
        (f.name, f.dataType.simpleString()) for f in queries.schema.fields
    )[query_id_col]
    probe_pairs = spark.createDataFrame(
        [(q, int(c)) for q, cs in cells_by_query.items() for c in sorted(cs)],
        f"`{query_id_col}` {qtype}, `{_CLUSTER_COL}` int",
    )
    cand_pairs = (
        cand_rows.join(F.broadcast(probe_pairs), on=_CLUSTER_COL)
        .select(query_id_col, F.col(doc_col))
        .distinct()
    )
    rerank_src = live.join(
        cand_pairs.select(doc_col).distinct(), doc_col, "left_semi"
    )
    # pre-collected (toks, owner) — the query frame was already pulled to
    # the driver above for cell probing; don't collect it a second time
    return _maxsim_range_batch_from_rows(
        rerank_src,
        toks,
        owner,
        threshold,
        doc_col=doc_col,
        vec_col=vec_col,
        predicate=None,
        query_id_col=query_id_col,
        score_col=score_col,
        candidates=cand_pairs,
    )


class MaxSimIvfIndex:
    """Token-level IVF candidate generation for MaxSim — the PLAID
    decomposition (Santhanam et al., CIKM'22) re-expressed as DataFrame
    ops.

    Every single-vector family here pairs an exact operator with a
    sub-scan ANN path (the reference's own exact/approx split,
    /root/reference/src/core/index/faiss_index.rs:60-69 vs
    /root/reference/src/core/index/hnsw_index.rs:21-35); this closes the
    same split for MULTI-vector retrieval, whose exact operator
    (`maxsim_search`) is otherwise O(corpus) per query batch.

    Three stages, each sub-scan at 100 TB:

    1. **candidate generation** — an IVF coarse quantizer over the TOKEN
       vectors (metric='ip' MIPS augmentation, reusing `IvfIndex`
       verbatim: token rows are just a corpus whose id column is the doc
       key).  Per query token the `nprobe` nearest cells come from a
       driver-side argsort over nlist centroids; candidate docs are the
       docs with >= 1 token in the probed-cell union — a partition-pruned
       scan of the cell-partitioned layout, never the full corpus.
    2. **approximate scoring** (only when `shortlist` bounds the rerank)
       — PLAID's centroid-score bound: a doc's per-token max dot is
       approximated by the best <centroid_cell, q_t> over the doc's
       distinct (doc, cell) pairs inside probed cells (missing token ->
       0).  The centroid-score table is nlist x T driver-side floats; the
       distributed side aggregates distinct (doc, cell) pairs — orders of
       magnitude fewer rows than token rows — with one map-side-combined
       max shuffle on the doc key.  Top-`shortlist` docs survive.
    3. **exact rerank** — `maxsim_search` over the candidate docs' FULL
       token sets (a semi-join; broadcast when `shortlist` bounds it), so
       reported scores are bit-identical to the exact operator for every
       returned doc.

    `nprobe >= nlist` with `shortlist=None` (or >= n_docs) degenerates to
    the exact operator — value-exact, the same lossless-configuration
    gate every other ANN family carries (`ivfpq_exhaustive` pattern).
    """

    def __init__(self, ivf) -> None:
        self.ivf = ivf
        self.doc_col = ivf.id_col
        self.vec_col = ivf.vec_col

    # -- lifecycle: delegate to the token-level IvfIndex -----------------

    @staticmethod
    def build(
        corpus: DataFrame,
        nlist: int = 16,
        *,
        doc_col: str,
        vec_col: str = "embedding",
        seed: int = 42,
        max_iter: int = 20,
    ) -> "MaxSimIvfIndex":
        """`corpus` is long-format multi-vector (one row per (doc,
        vector)), the same layout the exact operator takes."""
        from vector_db_spark.operators.ann import IvfIndex

        return MaxSimIvfIndex(
            IvfIndex.build(
                corpus,
                nlist=nlist,
                seed=seed,
                id_col=doc_col,
                vec_col=vec_col,
                max_iter=max_iter,
                metric="ip",
            )
        )

    def save(self, path: str) -> None:
        self.ivf.save(path)

    @staticmethod
    def load(spark: SparkSession, path: str) -> "MaxSimIvfIndex":
        from vector_db_spark.operators.ann import IvfIndex

        return MaxSimIvfIndex(IvfIndex.load(spark, path))

    @property
    def tombstones(self):
        """Doc-level tombstone manifest (None when nothing is deleted) —
        surfaced for the catalog's resurrected-id refresh check."""
        return self.ivf.tombstones

    def append(self, new_rows: DataFrame, path: str | None = None):
        self.ivf.append(new_rows, path=path)
        return self

    def delete(self, ids, path: str | None = None):
        """Doc-level tombstone: every token row of the doc is excluded
        from candidate generation AND rerank (the manifest anti-join
        keys on the doc column)."""
        self.ivf.delete(ids, path=path)
        return self

    def vacuum(self, path: str) -> "MaxSimIvfIndex":
        """Compaction into a fresh directory (IvfIndex.vacuum contract:
        never overwrite a layout being read; flip readers over)."""
        return MaxSimIvfIndex(self.ivf.vacuum(path))

    def retrain(self, nlist: int | None = None, seed: int = 42, max_iter: int = 20) -> "MaxSimIvfIndex":
        """Quantizer refresh over the live token rows (drops tombstoned
        docs; the appended-norm watermark resets — IvfIndex.retrain)."""
        return MaxSimIvfIndex(
            self.ivf.retrain(nlist=nlist, seed=seed, max_iter=max_iter)
        )

    # -- search ----------------------------------------------------------

    def search(
        self,
        query_tokens: Sequence[Sequence[float]],
        k: int,
        *,
        nprobe: int = 4,
        shortlist: int | None = None,
        predicate: Column | None = None,
        score_col: str = "maxsim_score",
    ) -> DataFrame:
        """Top-k documents by exact MaxSim over the IVF candidate set.

        `shortlist=None` reranks every candidate doc (lossless given full
        probe); an integer bounds the rerank to the `shortlist` best docs
        under the centroid-score approximation (stage 2).

        Pick `shortlist` in the serving range (hundreds-to-thousands):
        the bound is enforced with orderBy+limit, which Spark plans as a
        TakeOrdered per-partition heap for small limits but as a
        single-task global sort for huge ones — a bound you don't expect
        to bind should be `None`, not a sentinel like 10^9."""
        import numpy as np

        from vector_db_spark.operators.ann import _CLUSTER_COL

        if k < 1:
            raise ValueError("k must be >= 1")
        if nprobe < 1:
            raise ValueError("nprobe must be >= 1")
        if shortlist is not None and shortlist < 1:
            raise ValueError("shortlist must be >= 1 or None")
        toks = [list(map(float, t)) for t in query_tokens]
        if not toks:
            raise ValueError("query_tokens must be non-empty")
        dims = {len(t) for t in toks}
        if len(dims) != 1:
            raise ValueError(
                f"query tokens must share one dimension, got {dims}"
            )
        dim = dims.pop()

        # stage 1: probed cells per token (driver-side argsort over nlist
        # centroid distances — nlist * T floats, never data)
        nlist = len(self.ivf.centroids)
        nprobe = min(nprobe, nlist)
        probed = [self.ivf.probe_order(t)[:nprobe] for t in toks]
        union_cells = sorted({c for cells in probed for c in cells})

        live = self.ivf._live()
        if predicate is not None:
            live = live.filter(predicate)
        cand_rows = live.filter(F.col(_CLUSTER_COL).isin(union_cells))

        if shortlist is None:
            cand_docs = cand_rows.select(self.doc_col).distinct()
            rerank_src = live.join(cand_docs, self.doc_col, "left_semi")
        else:
            # stage 2: centroid-score approximation over distinct
            # (doc, cell) pairs (shared machinery: _masked_scores /
            # _stage2_doc_maxes)
            masked = self._masked_scores(toks, probed, dim)
            doc_cells = cand_rows.select(self.doc_col, _CLUSTER_COL).distinct()
            agg = self._stage2_doc_maxes(doc_cells, masked, len(toks))
            approx = F.coalesce(F.col("_m0"), F.lit(0.0))
            for t in range(1, len(toks)):
                approx = approx + F.coalesce(F.col(f"_m{t}"), F.lit(0.0))
            cand_docs = (
                agg.select(self.doc_col, approx.alias("_approx"))
                .orderBy(F.col("_approx").desc(), F.col(self.doc_col).asc())
                .limit(shortlist)
                .select(self.doc_col)
            )
            # shortlist bounds the doc set -> broadcast the semi-join
            rerank_src = live.join(
                F.broadcast(cand_docs), self.doc_col, "left_semi"
            )

        # stage 3: exact MaxSim over the candidates' full token sets —
        # identical fold order to the exact operator, so returned scores
        # are bit-equal to maxsim_search for every surviving doc
        return maxsim_search(
            rerank_src,
            toks,
            k,
            doc_col=self.doc_col,
            vec_col=self.vec_col,
            score_col=score_col,
        )

    def search_batch(
        self,
        queries: DataFrame,
        k: int,
        *,
        nprobe: int = 4,
        shortlist: int | None = None,
        predicate: Column | None = None,
        query_id_col: str = "query_id",
        token_vec_col: str = "token_vec",
        token_id_col: str = "token_id",
        score_col: str = "maxsim_score",
    ) -> DataFrame:
        """Top-k exact MaxSim per query over per-query IVF candidate
        sets — the batch formulation of `search` (same long-format query
        frame as `maxsim_search_batch`).

        Probed cells resolve per (query, token) driver-side; candidate
        (query, doc) pairs come from ONE equi-join of the probed
        (query, cell) set against the cell-partitioned corpus. With
        `shortlist`, the centroid-score approximation ranks each query's
        candidates and keeps its own `shortlist` best (one window). The
        exact rerank scores the candidate docs' full token sets in one
        corpus pass and masks each query to its own candidates, so no
        query sees a doc another query shortlisted. ``nprobe >= nlist``
        with ``shortlist=None`` equals exact `maxsim_search_batch`
        (the batch exhaustive gate).

        Returns (query_id, doc, score, rank), rank <= k per query.
        """
        import numpy as np

        from vector_db_spark.operators.ann import _CLUSTER_COL

        if k < 1:
            raise ValueError("k must be >= 1")
        if nprobe < 1:
            raise ValueError("nprobe must be >= 1")
        if shortlist is not None and shortlist < 1:
            raise ValueError("shortlist must be >= 1 or None")
        rows = collect_query_rows(
            queries.select(query_id_col, token_id_col, token_vec_col)
            .orderBy(query_id_col, token_id_col),
            what="batch token-query set",
        )
        if not rows:
            raise ValueError("queries must be non-empty")
        toks = [list(map(float, r[token_vec_col])) for r in rows]
        owner = [r[query_id_col] for r in rows]
        dims = {len(t) for t in toks}
        if len(dims) != 1:
            raise ValueError(
                f"query tokens must share one dimension, got {dims}"
            )
        dim = dims.pop()

        nlist = len(self.ivf.centroids)
        nprobe = min(nprobe, nlist)
        probed = [self.ivf.probe_order(t)[:nprobe] for t in toks]
        cells_by_query: dict = {}
        for i, q in enumerate(owner):
            cells_by_query.setdefault(q, set()).update(probed[i])
        union_cells = sorted({c for cs in cells_by_query.values() for c in cs})

        live = self.ivf._live()
        if predicate is not None:
            live = live.filter(predicate)
        cand_rows = live.filter(F.col(_CLUSTER_COL).isin(union_cells))

        spark = live.sparkSession
        qtype = dict(
            (f.name, f.dataType.simpleString()) for f in queries.schema.fields
        )[query_id_col]
        probe_pairs = spark.createDataFrame(
            [(q, int(c)) for q, cs in cells_by_query.items() for c in sorted(cs)],
            f"`{query_id_col}` {qtype}, `{_CLUSTER_COL}` int",
        )
        # (query, doc) candidates: one broadcast equi-join on the
        # partition column — the corpus side stays cell-pruned
        cand_pairs = (
            cand_rows.join(F.broadcast(probe_pairs), on=_CLUSTER_COL)
            .select(query_id_col, F.col(self.doc_col))
            .distinct()
        )

        if shortlist is not None:
            # stage 2 (batch): per-token masked centroid scores over
            # distinct (doc, cell) pairs (shared machinery), per-query
            # sums, one window keeps each query's `shortlist` best
            masked = self._masked_scores(toks, probed, dim)
            doc_cells = cand_rows.select(self.doc_col, _CLUSTER_COL).distinct()
            agg = self._stage2_doc_maxes(doc_cells, masked, len(toks))
            by_query: dict = {}
            for i, q in enumerate(owner):
                by_query.setdefault(q, []).append(i)
            structs = []
            for q, idxs in by_query.items():
                total = F.coalesce(F.col(f"_m{idxs[0]}"), F.lit(0.0))
                for i in idxs[1:]:
                    total = total + F.coalesce(F.col(f"_m{i}"), F.lit(0.0))
                structs.append(
                    F.struct(F.lit(q).alias("qid"), total.alias("s"))
                )
            approx = agg.select(
                self.doc_col, F.explode(F.array(*structs)).alias("qs")
            ).select(
                F.col("qs.qid").alias(query_id_col),
                self.doc_col,
                F.col("qs.s").alias("_approx"),
            ).join(cand_pairs, on=[query_id_col, self.doc_col])
            w = Window.partitionBy(query_id_col).orderBy(
                F.col("_approx").desc(), F.col(self.doc_col).asc()
            )
            cand_pairs = (
                approx.withColumn("_ark", F.row_number().over(w))
                .filter(F.col("_ark") <= shortlist)
                .select(query_id_col, self.doc_col)
            )

        rerank_src = live.join(
            cand_pairs.select(self.doc_col).distinct(),
            self.doc_col,
            "left_semi",
        )
        return maxsim_search_batch(
            rerank_src,
            queries,
            k,
            doc_col=self.doc_col,
            vec_col=self.vec_col,
            query_id_col=query_id_col,
            token_vec_col=token_vec_col,
            token_id_col=token_id_col,
            score_col=score_col,
            candidates=cand_pairs,
        )

    def range_search(
        self,
        query_tokens: Sequence[Sequence[float]],
        threshold: float,
        *,
        nprobe: int = 4,
        predicate: Column | None = None,
        score_col: str = "maxsim_score",
    ) -> DataFrame:
        """All docs whose exact MaxSim clears `threshold`, candidates from
        the per-token probed cells (graph/lsh range contract: returned
        rows exact, coverage set by nprobe; nprobe >= nlist == exact)."""
        return _ivf_range_search(
            self.ivf,
            self.doc_col,
            self.vec_col,
            query_tokens,
            threshold,
            nprobe=nprobe,
            predicate=predicate,
            score_col=score_col,
        )

    def range_search_batch(
        self,
        queries: DataFrame,
        threshold: float,
        *,
        nprobe: int = 4,
        predicate: Column | None = None,
        query_id_col: str = "query_id",
        token_vec_col: str = "token_vec",
        token_id_col: str = "token_id",
        score_col: str = "maxsim_score",
    ) -> DataFrame:
        """Batch range twin of search_batch: per-query probed candidate
        pairs, one exact corpus pass, threshold filter per query."""
        return _ivf_range_search_batch(
            self.ivf,
            self.doc_col,
            self.vec_col,
            queries,
            threshold,
            nprobe=nprobe,
            predicate=predicate,
            query_id_col=query_id_col,
            token_vec_col=token_vec_col,
            token_id_col=token_id_col,
            score_col=score_col,
        )

    def _masked_scores(self, toks: list, probed: list, dim: int):
        """nlist × T centroid-score table, NaN where a cell is not probed
        for that token. Centroids are MIPS-augmented (dim+1); the query's
        augmentation component is 0, so the score is the raw-dim dot."""
        import numpy as np

        nlist = len(self.ivf.centroids)
        cents = np.asarray(self.ivf.centroids, dtype=np.float64)[:, :dim]
        if getattr(self.ivf, "exact_fold", False):
            # order-pinned left folds (the frozen oracle-gated rung,
            # round 14): the SQL oracle replays the same chain over the
            # frozen centroid literals, so the stage-2 shortlist order
            # is bit-deterministic
            s = np.empty((nlist, len(toks)))
            for c in range(nlist):
                for t, tok in enumerate(toks):
                    acc = 0.0
                    for d in range(dim):
                        acc = acc + float(cents[c][d]) * float(tok[d])
                    s[c, t] = acc
        else:
            s = cents @ np.asarray(toks, dtype=np.float64).T  # nlist x T
        masked = np.full((nlist, len(toks)), np.nan)
        for t, cells in enumerate(probed):
            for c in cells:
                masked[c, t] = s[c, t]
        return masked

    def _stage2_doc_maxes(
        self, doc_cells: DataFrame, masked, n_toks: int
    ) -> DataFrame:
        """Per-doc per-token MAX centroid score over the doc's distinct
        (doc, cell) pairs — literal arrays under the Catalyst planning
        ceiling, one Arrow gather kernel past it. Emits (doc, _m0.._mT);
        a NULL _m{t} means no probed cell held the doc for token t."""
        import numpy as np

        from vector_db_spark.operators.ann import _CLUSTER_COL

        nlist = masked.shape[0]
        if nlist * n_toks <= _LITERAL_TERM_CEILING:
            score_cols = []
            for t in range(n_toks):
                arr = F.array(
                    *[
                        F.lit(None).cast("double")
                        if np.isnan(masked[c, t])
                        else F.lit(float(masked[c, t]))
                        for c in range(nlist)
                    ]
                )
                score_cols.append(
                    F.element_at(arr, F.col(_CLUSTER_COL) + 1).alias(f"_a{t}")
                )
            return doc_cells.select(self.doc_col, *score_cols).groupBy(
                self.doc_col
            ).agg(*[F.max(f"_a{t}").alias(f"_m{t}") for t in range(n_toks)])
        return self._centroid_scores_arrow(doc_cells, masked).groupBy(
            self.doc_col
        ).agg(
            *[F.max(F.col("_cs")[t]).alias(f"_m{t}") for t in range(n_toks)]
        )

    def _centroid_scores_arrow(
        self, doc_cells: DataFrame, masked
    ) -> DataFrame:
        """(doc, cell) -> (doc, _cs array<double>) by one vectorized
        row-gather into the nlist x T masked centroid-score table."""
        import numpy as np
        import pandas as pd

        doc_col = self.doc_col
        from vector_db_spark.operators.ann import _CLUSTER_COL

        doc_type = dict(
            (f.name, f.dataType.simpleString())
            for f in doc_cells.schema.fields
        )[doc_col]

        def gather(it):
            tab = np.asarray(masked, dtype=np.float64)
            for pdf in it:
                cells = pdf[_CLUSTER_COL].to_numpy()
                rows = tab[cells]  # |batch| x T gather
                out = pd.DataFrame({doc_col: pdf[doc_col]})
                out["_cs"] = [
                    [None if np.isnan(v) else float(v) for v in r]
                    for r in rows
                ]
                yield out

        return doc_cells.mapInPandas(
            gather, schema=f"`{doc_col}` {doc_type}, _cs array<double>"
        )


class MaxSimPqIndex:
    """PLAID with a COMPRESSED token store — the ColBERTv2 residual
    scheme (Santhanam et al., NAACL'22 §3.2) on top of `MaxSimIvfIndex`.

    The reference maintains a compression ladder per single-vector index
    (flat → HNSW → usearch, /root/reference/src/core/index_factory.rs:85-156);
    `MaxSimIvfIndex` was the one family here whose scan artifact stayed
    raw float32 token vectors — at 100 TB multi-vector corpora the token
    store dominates total bytes. This class PQ-encodes each token's
    RESIDUAL against its IVF cell centroid (the exact machinery
    `IvfPqIndex` uses for single vectors, operators/ivfpq.py) so the
    candidate-scoring scan reads M bytes per token instead of dim·4:

    1. **candidate generation** — unchanged: probed-cell union over the
       token IVF (partition-pruned scan).
    2. **approximate scoring** — per candidate token row, the token-t dot
       is reconstructed as ⟨q_t, centroid_cell⟩ + IP-ADC over the
       residual codes: an (m × ksub) inner-product table per query token
       (driver-side constants) + m uint8 lookups per row. Strictly
       tighter than the parent's centroid-score bound (which drops the
       residual term entirely), at M bytes/row scanned — per-doc
       per-token max, token sum, top-`shortlist` docs survive.
    3. **exact rerank** — identical to the parent: `maxsim_search` over
       the shortlisted docs' raw token vectors, so returned scores are
       bit-equal to the exact operator for every returned doc.

    Raw vectors stay in the cell layout for stage 3 (parquet is columnar:
    the stage-2 scan projects only (doc, cell, codes) and never reads the
    vector column — pinned by the codes/raw bytes comparison in bench).

    `nprobe >= nlist` + non-binding `shortlist` degenerates to the exact
    operator (`maxsim_pq_exhaustive` gate — the same lossless-settings
    standard every ANN family carries).
    """

    _CODE_COL = "pq_codes"

    def __init__(self, msivf: MaxSimIvfIndex, codebooks) -> None:
        import numpy as np

        self.msivf = msivf
        self.codebooks = np.asarray(codebooks, dtype=np.float64)
        self.m = self.codebooks.shape[0]
        self.ksub = self.codebooks.shape[1]
        self.dsub = self.codebooks.shape[2]
        self.doc_col = msivf.doc_col
        self.vec_col = msivf.vec_col

    # -- internals -------------------------------------------------------

    @property
    def ivf(self):
        """The underlying token-level IvfIndex — the same public handle
        the uncompressed family exposes (`MaxSimIvfIndex.ivf`), so knob
        tuners and introspection (`tuning.tune_maxsim`, `describe`/
        `cell_stats`) address either PLAID variant uniformly."""
        return self.msivf.ivf

    @property
    def _ivf(self):
        return self.msivf.ivf

    @property
    def tombstones(self):
        """Doc-level tombstone manifest (None when nothing is deleted) —
        surfaced for the catalog's resurrected-id refresh check."""
        return self.msivf.ivf.tombstones

    def _dim(self) -> int:
        # metric='ip' centroids carry the MIPS augmentation component
        return len(self._ivf.centroids[0]) - (
            1 if self._ivf.metric == "ip" else 0
        )

    def _raw_centroids(self):
        import numpy as np

        return np.asarray(self._ivf.centroids, dtype=np.float64)[
            :, : self._dim()
        ]

    def _quantizer(self):
        from vector_db_spark.operators.pq import ProductQuantizer

        # Propagate the parent IVF's exact_fold: a frozen-oracle index
        # re-encoding through append/refresh must use the same
        # order-pinned squared-diff fold the DuckDB oracle replays —
        # the GEMM expansion form can flip argmin ties on fp-noise-
        # adjacent residuals (ADVICE r14 low).
        return ProductQuantizer(
            self.codebooks,
            self.doc_col,
            "_resid",
            exact_fold=getattr(self._ivf, "exact_fold", False),
        )

    def _encode(self, assigned: DataFrame) -> DataFrame:
        """(…, cluster_id) → (…, pq_codes): residual vs the RAW slice of
        the cell centroid, encoded through the frozen codebooks."""
        from vector_db_spark.operators.ivfpq import with_residuals

        raw_cents = [list(map(float, c)) for c in self._raw_centroids()]
        return (
            self._quantizer()
            .encode(
                with_residuals(assigned, raw_cents, self.vec_col),
                code_col=self._CODE_COL,
            )
            .drop("_resid")
        )

    # -- lifecycle -------------------------------------------------------

    @staticmethod
    def build(
        corpus: DataFrame,
        nlist: int = 16,
        m: int = 8,
        ksub: int = 256,
        *,
        doc_col: str,
        vec_col: str = "embedding",
        seed: int = 42,
        max_iter: int = 20,
        pq_iters: int = 10,
        sample_per_code: int = 64,
        msivf: MaxSimIvfIndex | None = None,
    ) -> "MaxSimPqIndex":
        """Train over long-format multi-vector `corpus`. ``msivf`` accepts
        a pre-built token IVF over the same corpus (the faiss composition
        — a deployment that already serves uncompressed PLAID reuses its
        quantizer fit and cell layout instead of refitting)."""
        from vector_db_spark.operators.ivfpq import with_residuals
        from vector_db_spark.operators.pq import ProductQuantizer

        if msivf is None:
            msivf = MaxSimIvfIndex.build(
                corpus,
                nlist=nlist,
                doc_col=doc_col,
                vec_col=vec_col,
                seed=seed,
                max_iter=max_iter,
            )
        ivf = msivf.ivf
        dim = len(ivf.centroids[0]) - (1 if ivf.metric == "ip" else 0)
        raw_cents = [list(map(float, c[:dim])) for c in ivf.centroids]
        with_resid = with_residuals(ivf.assignments, raw_cents, msivf.vec_col)
        pq = ProductQuantizer.fit(
            with_resid,
            m=m,
            ksub=ksub,
            seed=seed,
            iters=pq_iters,
            sample_per_code=sample_per_code,
            id_col=msivf.doc_col,
            vec_col="_resid",
        )
        ivf.assignments = pq.encode(
            with_resid, code_col=MaxSimPqIndex._CODE_COL
        ).drop("_resid")
        return MaxSimPqIndex(msivf, pq.codebooks)

    def save(self, path: str) -> None:
        """Cell-partitioned (tokens + codes) layout via the IVF save,
        plus the codebook tensor — after load(), the stage-2 scan is
        parquet partition pruning over the M-byte codes column."""
        import os

        import numpy as np

        self.msivf.save(path)
        np.save(os.path.join(path, "pq_codebooks.npy"), self.codebooks)

    @staticmethod
    def load(spark: SparkSession, path: str) -> "MaxSimPqIndex":
        import os

        import numpy as np

        return MaxSimPqIndex(
            MaxSimIvfIndex.load(spark, path),
            np.load(os.path.join(path, "pq_codebooks.npy")),
        )

    def append(self, new_rows: DataFrame, path: str | None = None):
        """Incremental maintenance with the coarse quantizer AND the
        codebooks frozen (faiss `IndexIVFPQ.add` shape; same ip-norm
        watermark bookkeeping as IvfIndex.append): new token rows assign
        to existing cells, their residuals encode through the existing
        codebooks, and with ``path`` only new files land in the layout."""
        import os

        from vector_db_spark.functions.vector import dot as _dot
        from vector_db_spark.operators.ann import (
            _CLUSTER_COL,
            _nearest_centroid_arrow,
        )

        ivf = self._ivf
        if ivf.metric == "ip":
            v = F.col(self.vec_col)
            # None = empty batch: same no-op contract as IvfIndex.append
            appended_max = new_rows.agg(F.max(_dot(v, v))).head()[0]
            if appended_max is not None:
                ivf.max_appended_sq_norm = max(
                    ivf.max_appended_sq_norm or 0.0, float(appended_max)
                )
        assigned = _nearest_centroid_arrow(
            new_rows, self.vec_col, ivf.centroids, ivf.metric, ivf.max_sq_norm
        )
        encoded_new = self._encode(assigned).select(*ivf.assignments.columns)
        ivf.cell_radii = None
        if path is not None:
            # meta BEFORE data — same crash-ordering invariant as
            # IvfIndex.append: a crash between the writes must leave
            # conservative meta (radii invalidated, watermark at worst
            # too wide), never live rows under stale covering radii
            ivf._write_meta(path)
            encoded_new.write.mode("append").partitionBy(_CLUSTER_COL).parquet(
                os.path.join(path, "assignments")
            )
        ivf.assignments = ivf.assignments.unionByName(encoded_new)
        return self

    def delete(self, ids, path: str | None = None):
        """Doc-level tombstone — candidate generation, ADC scoring, and
        rerank all serve through the manifest anti-join."""
        self.msivf.delete(ids, path=path)
        return self

    def vacuum(self, path: str) -> "MaxSimPqIndex":
        """Compaction into a fresh directory (codes ride along in the
        assignments frame; codebooks re-persist unchanged)."""
        import os

        import numpy as np

        out = MaxSimPqIndex(self.msivf.vacuum(path), self.codebooks)
        np.save(os.path.join(path, "pq_codebooks.npy"), self.codebooks)
        return out

    # -- search ----------------------------------------------------------

    def _adc_dots(self, rows: DataFrame, toks: list[list[float]]) -> DataFrame:
        """(doc, cluster_id, pq_codes) → (doc, dots array<double>): the
        token-t approximate dot ⟨q_t, centroid_cell⟩ + Σ_i ip_table[t, i,
        code_i] for ALL T query tokens, one Arrow batch kernel. Driver
        constants: (nlist × T) centroid dots + (T × m × ksub) IP tables."""
        import numpy as np
        import pandas as pd

        from vector_db_spark.operators.ann import _CLUSTER_COL

        doc_col, code_col = self.doc_col, self._CODE_COL
        m, dsub = self.m, self.dsub
        exact = getattr(self._ivf, "exact_fold", False)
        qmat = np.asarray(toks, dtype=np.float64)  # T x dim
        raw_cents = self._raw_centroids()
        if exact:
            # order-pinned folds (frozen oracle-gated rung, round 14):
            # centroid dots and per-subspace IP tables as left folds the
            # SQL oracle replays over the frozen literals
            cent_dots = np.empty((raw_cents.shape[0], len(toks)))
            for c in range(raw_cents.shape[0]):
                for t in range(len(toks)):
                    acc = 0.0
                    for d in range(raw_cents.shape[1]):
                        acc = acc + float(raw_cents[c][d]) * float(qmat[t][d])
                    cent_dots[c, t] = acc
            ip_tables = np.empty((len(toks), m, self.ksub))
            for t in range(len(toks)):
                for i in range(m):
                    qs = qmat[t][i * dsub : (i + 1) * dsub]
                    acc = self.codebooks[i][:, 0] * qs[0]
                    for d in range(1, dsub):
                        acc = acc + self.codebooks[i][:, d] * qs[d]
                    ip_tables[t][i] = acc
        else:
            cent_dots = raw_cents @ qmat.T  # nlist x T
            # ip_tables[t, i, j] = <q_t[sub_i], codebook[i][j]>
            ip_tables = np.stack(
                [
                    np.stack(
                        [
                            self.codebooks[i] @ q[i * dsub : (i + 1) * dsub]
                            for i in range(m)
                        ]
                    )
                    for q in qmat
                ]
            )  # T x m x ksub
        doc_type = dict(
            (f.name, f.dataType.simpleString()) for f in rows.schema.fields
        )[doc_col]

        def adc(it):
            for pdf in it:
                if not len(pdf):
                    continue
                cmat = np.frombuffer(
                    b"".join(pdf[code_col]), dtype=np.uint8
                ).reshape(-1, m)
                cells = pdf[_CLUSTER_COL].to_numpy()
                dots = cent_dots[cells]  # B x T (copy via fancy index)
                for t in range(ip_tables.shape[0]):
                    if exact:
                        # ((cent + l0) + l1) + … — the oracle's
                        # list_prepend(cent, ordered lut) fold
                        for i in range(m):
                            dots[:, t] = dots[:, t] + ip_tables[t][i][cmat[:, i]]
                    else:
                        dots[:, t] += ip_tables[t][
                            np.arange(m)[None, :], cmat
                        ].sum(axis=1)
                yield pd.DataFrame(
                    {doc_col: pdf[doc_col], "dots": list(dots)}
                )

        return rows.select(doc_col, _CLUSTER_COL, code_col).mapInPandas(
            adc, schema=f"`{doc_col}` {doc_type}, dots array<double>"
        )

    def search(
        self,
        query_tokens: Sequence[Sequence[float]],
        k: int,
        *,
        nprobe: int = 4,
        shortlist: int | None = None,
        predicate: Column | None = None,
        score_col: str = "maxsim_score",
    ) -> DataFrame:
        """Top-k documents by exact MaxSim over the ADC-shortlisted IVF
        candidate set. ``shortlist=None`` reranks every candidate doc
        (lossless under full probe); an integer bounds the rerank to the
        `shortlist` best docs under the residual-ADC approximation."""
        import numpy as np

        from vector_db_spark.operators.ann import _CLUSTER_COL

        if k < 1:
            raise ValueError("k must be >= 1")
        if nprobe < 1:
            raise ValueError("nprobe must be >= 1")
        if shortlist is not None and shortlist < 1:
            raise ValueError("shortlist must be >= 1 or None")
        toks = [list(map(float, t)) for t in query_tokens]
        if not toks:
            raise ValueError("query_tokens must be non-empty")
        dims = {len(t) for t in toks}
        if len(dims) != 1:
            raise ValueError(f"query tokens must share one dimension, got {dims}")
        if dims.pop() != self._dim():
            raise ValueError(
                f"dimension mismatch: query tokens have {len(toks[0])} "
                f"components, index dim is {self._dim()}"
            )

        ivf = self._ivf
        nlist = len(ivf.centroids)
        nprobe = min(nprobe, nlist)
        probed = [ivf.probe_order(t)[:nprobe] for t in toks]
        union_cells = sorted({c for cells in probed for c in cells})

        live = ivf._live()
        if predicate is not None:
            live = live.filter(predicate)
        cand_rows = live.filter(F.col(_CLUSTER_COL).isin(union_cells))

        if shortlist is None:
            cand_docs = cand_rows.select(self.doc_col).distinct()
            rerank_src = live.join(cand_docs, self.doc_col, "left_semi")
        else:
            scored = self._adc_dots(cand_rows, toks)
            maxes = scored.groupBy(self.doc_col).agg(
                *[
                    F.max(F.col("dots")[t]).alias(f"_m{t}")
                    for t in range(len(toks))
                ]
            )
            approx = F.col("_m0")
            for t in range(1, len(toks)):
                approx = approx + F.col(f"_m{t}")
            cand_docs = (
                maxes.select(self.doc_col, approx.alias("_approx"))
                .orderBy(F.col("_approx").desc(), F.col(self.doc_col).asc())
                .limit(shortlist)
                .select(self.doc_col)
            )
            rerank_src = live.join(
                F.broadcast(cand_docs), self.doc_col, "left_semi"
            )

        return maxsim_search(
            rerank_src,
            toks,
            k,
            doc_col=self.doc_col,
            vec_col=self.vec_col,
            score_col=score_col,
        )

    def search_batch(
        self,
        queries: DataFrame,
        k: int,
        *,
        nprobe: int = 4,
        shortlist: int | None = None,
        predicate: Column | None = None,
        query_id_col: str = "query_id",
        token_vec_col: str = "token_vec",
        token_id_col: str = "token_id",
        score_col: str = "maxsim_score",
    ) -> DataFrame:
        """Batch formulation: per-query IVF candidate pairs from one
        broadcast probe-pair equi-join (identical to the parent), stage-2
        residual-ADC scoring of ALL batch tokens in one codes pass, one
        window keeps each query's `shortlist` best, one exact rerank
        masked per query. ``nprobe >= nlist`` + non-binding `shortlist`
        equals exact `maxsim_search_batch`."""
        import numpy as np

        from vector_db_spark.operators.ann import _CLUSTER_COL

        if k < 1:
            raise ValueError("k must be >= 1")
        if nprobe < 1:
            raise ValueError("nprobe must be >= 1")
        if shortlist is not None and shortlist < 1:
            raise ValueError("shortlist must be >= 1 or None")
        rows = collect_query_rows(
            queries.select(query_id_col, token_id_col, token_vec_col)
            .orderBy(query_id_col, token_id_col),
            what="batch token-query set",
        )
        if not rows:
            raise ValueError("queries must be non-empty")
        toks = [list(map(float, r[token_vec_col])) for r in rows]
        owner = [r[query_id_col] for r in rows]
        dims = {len(t) for t in toks}
        if len(dims) != 1:
            raise ValueError(f"query tokens must share one dimension, got {dims}")
        if dims.pop() != self._dim():
            raise ValueError(
                f"dimension mismatch: query tokens have {len(toks[0])} "
                f"components, index dim is {self._dim()}"
            )

        ivf = self._ivf
        nlist = len(ivf.centroids)
        nprobe = min(nprobe, nlist)
        probed = [ivf.probe_order(t)[:nprobe] for t in toks]
        cells_by_query: dict = {}
        for i, q in enumerate(owner):
            cells_by_query.setdefault(q, set()).update(probed[i])
        union_cells = sorted({c for cs in cells_by_query.values() for c in cs})

        live = ivf._live()
        if predicate is not None:
            live = live.filter(predicate)
        cand_rows = live.filter(F.col(_CLUSTER_COL).isin(union_cells))

        spark = live.sparkSession
        qtype = dict(
            (f.name, f.dataType.simpleString()) for f in queries.schema.fields
        )[query_id_col]
        probe_pairs = spark.createDataFrame(
            [(q, int(c)) for q, cs in cells_by_query.items() for c in sorted(cs)],
            f"`{query_id_col}` {qtype}, `{_CLUSTER_COL}` int",
        )
        cand_pairs = (
            cand_rows.join(F.broadcast(probe_pairs), on=_CLUSTER_COL)
            .select(query_id_col, F.col(self.doc_col))
            .distinct()
        )

        if shortlist is not None:
            # stage 2 (batch): one residual-ADC pass over the candidate
            # codes computes every batch token's dot; per-doc maxes, then
            # per-query sums restricted to each query's own candidates
            scored = self._adc_dots(cand_rows, toks)
            maxes = scored.groupBy(self.doc_col).agg(
                *[
                    F.max(F.col("dots")[t]).alias(f"_m{t}")
                    for t in range(len(toks))
                ]
            )
            by_query: dict = {}
            for i, q in enumerate(owner):
                by_query.setdefault(q, []).append(i)
            structs = []
            for q, idxs in by_query.items():
                total = F.col(f"_m{idxs[0]}")
                for i in idxs[1:]:
                    total = total + F.col(f"_m{i}")
                structs.append(
                    F.struct(F.lit(q).alias("qid"), total.alias("s"))
                )
            approx = maxes.select(
                self.doc_col, F.explode(F.array(*structs)).alias("qs")
            ).select(
                F.col("qs.qid").alias(query_id_col),
                self.doc_col,
                F.col("qs.s").alias("_approx"),
            ).join(cand_pairs, on=[query_id_col, self.doc_col])
            w = Window.partitionBy(query_id_col).orderBy(
                F.col("_approx").desc(), F.col(self.doc_col).asc()
            )
            cand_pairs = (
                approx.withColumn("_ark", F.row_number().over(w))
                .filter(F.col("_ark") <= shortlist)
                .select(query_id_col, self.doc_col)
            )

        rerank_src = live.join(
            cand_pairs.select(self.doc_col).distinct(),
            self.doc_col,
            "left_semi",
        )
        return maxsim_search_batch(
            rerank_src,
            queries,
            k,
            doc_col=self.doc_col,
            vec_col=self.vec_col,
            query_id_col=query_id_col,
            token_vec_col=token_vec_col,
            token_id_col=token_id_col,
            score_col=score_col,
            candidates=cand_pairs,
        )

    def range_search(
        self,
        query_tokens: Sequence[Sequence[float]],
        threshold: float,
        *,
        nprobe: int = 4,
        predicate: Column | None = None,
        score_col: str = "maxsim_score",
    ) -> DataFrame:
        """Probed MaxSim range over the PQ family. The codes never
        filter a threshold (ADC scores cannot bound exact scores), so
        range skips the ADC stage entirely: probed-cell candidates are
        verified from the RAW token rows the inner IVF layout retains —
        same exact-rows/coverage contract as the raw maxsim family."""
        toks = [list(map(float, t)) for t in query_tokens]
        if (
            toks
            and len({len(t) for t in toks}) == 1
            and len(toks[0]) != self._dim()
        ):
            raise ValueError(
                f"dimension mismatch: query tokens have {len(toks[0])} "
                f"components, index dim is {self._dim()}"
            )
        return _ivf_range_search(
            self._ivf,
            self.doc_col,
            self.vec_col,
            toks,
            threshold,
            nprobe=nprobe,
            predicate=predicate,
            score_col=score_col,
        )

    def range_search_batch(
        self,
        queries: DataFrame,
        threshold: float,
        *,
        nprobe: int = 4,
        predicate: Column | None = None,
        query_id_col: str = "query_id",
        token_vec_col: str = "token_vec",
        token_id_col: str = "token_id",
        score_col: str = "maxsim_score",
    ) -> DataFrame:
        """Batch probed range over the PQ family (no ADC stage — see
        range_search); candidates generated and verified exactly as the
        raw maxsim family's batch range."""
        return _ivf_range_search_batch(
            self._ivf,
            self.doc_col,
            self.vec_col,
            queries,
            threshold,
            nprobe=nprobe,
            predicate=predicate,
            query_id_col=query_id_col,
            token_vec_col=token_vec_col,
            token_id_col=token_id_col,
            score_col=score_col,
        )


FROZEN_DOC_MAXSIM_IVF_PATH = "artifacts/maxsim_ivf_docs.json"


def load_frozen_doc_maxsim_ivf(
    corpus: DataFrame,
    doc_col: str = "doc",
    vec_col: str = "embedding",
) -> MaxSimIvfIndex:
    """Frozen token-IVF for the probed-MaxSim gate (round 14): the
    MIPS-augmented (dim+1) centroids and the build-time M² from one
    pinned sf0.01 fit, with token assignment replayed as the codegen
    argmin expression over the AUGMENTED vector — [x, √max(M²−‖x‖², 0)]
    is itself a fold-portable expression (dot fold + greatest + sqrt),
    so the cell partition, the per-token probe sets (order-pinned
    probe_order), the stage-2 centroid-score shortlist (exact-fold
    _masked_scores), and the exact stage-3 rerank all replay bit-exactly
    in SQL. Production Arrow kernels stay hash-gated by
    maxsim_ivf_exhaustive (+ the batch/filtered/delete exhaustive
    family) and recall-pinned."""
    import json
    import os

    from vector_db_spark.functions.vector import dot as _vdot
    from vector_db_spark.operators.ann import (
        _CLUSTER_COL,
        _nearest_centroid_expr,
        IvfIndex,
    )

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        FROZEN_DOC_MAXSIM_IVF_PATH,
    )
    with open(path) as f:
        art = json.load(f)
    cents = [[float(x) for x in row] for row in art["centroids"]]
    m2 = float(art["max_sq_norm"])
    sq = _vdot(F.col(vec_col), F.col(vec_col))
    aug = F.concat(
        F.transform(F.col(vec_col), lambda x: x.cast("double")),
        F.array(F.sqrt(F.greatest(F.lit(m2) - sq, F.lit(0.0)))),
    )
    assignments = corpus.withColumn(
        _CLUSTER_COL, _nearest_centroid_expr(aug, cents)
    )
    ivf = IvfIndex(cents, assignments, doc_col, vec_col, "ip")
    ivf.max_sq_norm = m2
    ivf.exact_fold = True
    return MaxSimIvfIndex(ivf)


FROZEN_DOC_MAXSIM_PQ_PATH = "artifacts/maxsim_pq_docs.json"


def load_frozen_doc_maxsim_pq(
    corpus: DataFrame,
    doc_col: str = "doc",
    vec_col: str = "embedding",
) -> MaxSimPqIndex:
    """Frozen compressed-PLAID (round 14): the frozen token-IVF
    (load_frozen_doc_maxsim_ivf) + FROZEN residual codebooks (one pinned
    sf0.01 fit, m=8/ksub=32). Residuals are the codegen zip_with literal
    lookup, encode runs through the exact_fold quantizer, and _adc_dots'
    stage-2 scoring folds centroid-dot + per-subspace IP lookups in
    order — so the SQL oracle replays candidate generation, the
    residual-ADC shortlist, and the exact rerank bit-for-bit. Production
    kernels stay hash-gated by maxsim_pq_*_exhaustive."""
    import json
    import os

    import numpy as np

    from vector_db_spark.operators.ivfpq import with_residuals
    from vector_db_spark.operators.pq import ProductQuantizer

    msivf = load_frozen_doc_maxsim_ivf(corpus, doc_col=doc_col, vec_col=vec_col)
    ivf = msivf.ivf
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        FROZEN_DOC_MAXSIM_PQ_PATH,
    )
    with open(path) as f:
        art = json.load(f)
    books = np.asarray(
        [[[float(x) for x in c] for c in sub] for sub in art["codebooks"]],
        dtype=np.float64,
    )
    dim = len(ivf.centroids[0]) - 1
    raw_cents = [list(map(float, c[:dim])) for c in ivf.centroids]
    pq = ProductQuantizer(books, doc_col, "_resid", exact_fold=True)
    with_resid = with_residuals(ivf.assignments, raw_cents, vec_col)
    ivf.assignments = pq.encode(
        with_resid, code_col=MaxSimPqIndex._CODE_COL
    ).drop("_resid")
    return MaxSimPqIndex(msivf, books)
