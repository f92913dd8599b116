"""Hybrid (keyword + vector) search with reciprocal-rank fusion.

The modern vector-store query shape the reference never reached: retrieve
by BOTH a text query and an embedding, fuse with RRF
(Cormack/Clarke/Büttcher):  score(d) = Σ_lists 1/(k + rank_list(d)).

Scale-first decomposition — RRF needs ranks, and global ranks need a
global sort, so the operator never ranks the corpus:

1. each modality independently takes its top ``fetch`` candidates —
   ``ORDER BY score LIMIT fetch`` = TakeOrderedAndProject (per-partition
   heaps, no global sort, no shuffle);
2. ranks are assigned within the two fetch-sized candidate lists (a
   window over ≤ fetch rows — driver-scale, not corpus-scale);
3. the lists full-outer-join on id; a document missing from a list simply
   contributes nothing for that list (classic RRF);
4. top-k of the fused score.

Keyword relevance is query-token overlap count (distinct-token hit count
— a deliberately simple, portable relevance kernel; swap in BM25 weights
without changing the fusion shape). All ties break by id.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_db_spark.functions.text import tokens
from vector_db_spark.functions.vector import cosine_sim
from vector_db_spark.operators.knn import query_literal


def keyword_overlap(text_col: Column, query_tokens: Sequence[str]) -> Column:
    """How many distinct query tokens appear in the text."""
    toks = sorted(set(query_tokens))
    return F.size(
        F.array_intersect(
            F.array_distinct(tokens(text_col)),
            F.array(*[F.lit(t) for t in toks]),
        )
    )


def hybrid_search(
    corpus: DataFrame,
    query_text: str,
    query_vec: Sequence[float],
    k: int,
    *,
    fetch: int = 100,
    rrf_k: int = 60,
    keyword: str = "overlap",
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by RRF over the keyword and vector candidate lists.

    ``keyword`` picks the text relevance kernel: ``'overlap'`` (distinct
    query-token hit count — cheapest) or ``'bm25'`` (operators/bm25.py).
    Returns (id, text_rank, vec_rank, rrf_score) — NULL rank means the
    document reached the fused top-k through the other modality alone.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if fetch < k:
        raise ValueError("fetch must be >= k")
    qtoks = [t for t in query_text.split(" ") if t]
    if not qtoks:
        raise ValueError("query_text must contain at least one token")

    if keyword == "overlap":
        tscore = keyword_overlap(F.col(text_col), qtoks)
        scored_text = corpus.select(
            F.col(id_col).alias("id"), tscore.cast("double").alias("tscore")
        ).filter(F.col("tscore") > 0)
    elif keyword == "bm25":
        from vector_db_spark.operators.bm25 import bm25_scores

        scored_text = bm25_scores(
            corpus, query_text, id_col=id_col, text_col=text_col
        ).select("id", F.col("score").alias("tscore"))
    else:
        raise ValueError(f"keyword must be 'overlap' or 'bm25', got {keyword!r}")

    text_cands = (
        scored_text.orderBy(F.col("tscore").desc(), F.col("id").asc())
        .limit(fetch)
        .withColumn(
            "text_rank",
            F.row_number().over(
                Window.orderBy(F.col("tscore").desc(), F.col("id").asc())
            ),
        )
        .select("id", "text_rank")
    )

    vscore = cosine_sim(F.col(vec_col), query_literal(query_vec))
    vec_cands = (
        corpus.select(F.col(id_col).alias("id"), vscore.alias("vscore"))
        .orderBy(F.col("vscore").desc(), F.col("id").asc())
        .limit(fetch)
        .withColumn(
            "vec_rank",
            F.row_number().over(
                Window.orderBy(F.col("vscore").desc(), F.col("id").asc())
            ),
        )
        .select("id", "vec_rank")
    )

    fused = text_cands.join(vec_cands, "id", "full_outer").select(
        "id",
        "text_rank",
        "vec_rank",
        (
            F.coalesce(1.0 / (F.lit(rrf_k) + F.col("text_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("vec_rank")), F.lit(0.0))
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.col("rrf_score").desc(), F.col("id").asc()).limit(k)


def fusion_weighted(
    corpus: DataFrame,
    query_text: str,
    query_vec: Sequence[float],
    k: int,
    *,
    fetch: int = 100,
    w_text: float = 0.5,
    w_vec: float = 0.5,
    keyword: str = "overlap",
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by WEIGHTED MIN-MAX score fusion (a.k.a. convex combination
    fusion — the other standard hybrid-search combiner next to RRF; see
    e.g. Bruch et al., "An Analysis of Fusion Functions for Hybrid
    Retrieval", TOIS'23). Where RRF discards score magnitudes and fuses
    ranks, this normalizes each modality's scores to [0,1] WITHIN its
    candidate list

        norm(s) = (s - min) / (max - min)      (all-equal list -> 1.0)

    and fuses  w_text * tnorm + w_vec * vnorm. A document absent from one
    list contributes 0 for that modality.

    Scale shape is identical to ``hybrid_search``: per-modality top-fetch
    via TakeOrderedAndProject (no global sort), min/max + normalization
    inside the fetch-bounded candidate lists, one full-outer join on id.
    Returns (id, tnorm, vnorm, fused_score).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if fetch < k:
        raise ValueError("fetch must be >= k")
    qtoks = [t for t in query_text.split(" ") if t]
    if not qtoks:
        raise ValueError("query_text must contain at least one token")

    if keyword == "overlap":
        tscore = keyword_overlap(F.col(text_col), qtoks)
        scored_text = corpus.select(
            F.col(id_col).alias("id"), tscore.cast("double").alias("tscore")
        ).filter(F.col("tscore") > 0)
    elif keyword == "bm25":
        from vector_db_spark.operators.bm25 import bm25_scores

        scored_text = bm25_scores(
            corpus, query_text, id_col=id_col, text_col=text_col
        ).select("id", F.col("score").alias("tscore"))
    else:
        raise ValueError(f"keyword must be 'overlap' or 'bm25', got {keyword!r}")

    def _normed(cands: DataFrame, score: str, out: str) -> DataFrame:
        # min/max over the fetch-bounded list: an empty-frame window (no
        # partitionBy) is fine HERE because the input is already <= fetch
        # rows — never corpus-scale.
        w = Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        lo, hi = F.min(score).over(w), F.max(score).over(w)
        return cands.select(
            "id",
            F.when(hi == lo, F.lit(1.0))
            .otherwise((F.col(score) - lo) / (hi - lo))
            .alias(out),
        )

    text_cands = _normed(
        scored_text.orderBy(F.col("tscore").desc(), F.col("id").asc()).limit(
            fetch
        ),
        "tscore",
        "tnorm",
    )
    vscore = cosine_sim(F.col(vec_col), query_literal(query_vec))
    vec_cands = _normed(
        corpus.select(F.col(id_col).alias("id"), vscore.alias("vscore"))
        .orderBy(F.col("vscore").desc(), F.col("id").asc())
        .limit(fetch),
        "vscore",
        "vnorm",
    )

    fused = text_cands.join(vec_cands, "id", "full_outer").select(
        "id",
        F.coalesce("tnorm", F.lit(0.0)).alias("tnorm"),
        F.coalesce("vnorm", F.lit(0.0)).alias("vnorm"),
        (
            F.lit(float(w_text)) * F.coalesce("tnorm", F.lit(0.0))
            + F.lit(float(w_vec)) * F.coalesce("vnorm", F.lit(0.0))
        ).alias("fused_score"),
    )
    return fused.orderBy(F.col("fused_score").desc(), F.col("id").asc()).limit(k)


def mmr_rerank(
    corpus: DataFrame,
    query: Sequence[float],
    k: int,
    *,
    shortlist: int = 100,
    lam: float = 0.5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    predicate: Column | None = None,
) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k (Carbonell & Goldstein
    1998): greedily pick argmax  λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s),
    so near-duplicate hits don't crowd the result the way a pure
    similarity cut does.

    Scale shape: the DISTRIBUTED part is the candidate fetch — exact
    cosine top-``shortlist`` (TakeOrderedAndProject over the corpus scan,
    same plan as knn). The greedy selection is inherently sequential in k
    and sees only the shortlist (≤ shortlist·dim floats), so it runs
    driver-side in NumPy — bounded by user parameters, never by corpus
    size; the corpus itself is never collected. λ=1 degenerates to the
    plain relevance order (pinned in tests); all ties break by id.

    Returns (rank, id, relevance, mmr_score) in selection order.

    Float parity (round 13): candidate-candidate similarities are
    LEFT-ASSOCIATED float64 dot folds with sim = dot / (sqrt(aa)·sqrt(bb))
    in exactly that operation order, and the greedy score is
    λ·rel − (1−λ)·max-penalty — the same arithmetic a DuckDB recursive
    CTE reproduces term-for-term, which is what upgraded the registered
    gate from rows-only to hash-exact (the previous BLAS gram matrix was
    pairwise-summed, bit-incomparable across engines). The selection
    chain stays O(shortlist·k·dim) driver floats."""
    import math

    from vector_db_spark.operators.knn import knn

    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")
    if shortlist < k:
        raise ValueError("shortlist must be >= k")
    cand = knn(
        corpus,
        query,
        shortlist,
        metric="cosine",
        vec_col=vec_col,
        id_col=id_col,
        predicate=predicate,
        keep_cols=(vec_col,),
    ).collect()
    if not cand:
        spark = corpus.sparkSession
        return spark.createDataFrame(
            [], "rank int, %s long, relevance double, mmr_score double" % id_col
        )
    ids = [int(r[id_col]) for r in cand]
    rel = [float(r.score) for r in cand]
    vecs = [[float(x) for x in r[vec_col]] for r in cand]

    def _dot(a: list, b: list) -> float:
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    nsq = [_dot(v, v) for v in vecs]
    sim_cache: dict[tuple[int, int], float] = {}

    def _sim(i: int, j: int) -> float:
        key = (i, j) if i <= j else (j, i)
        got = sim_cache.get(key)
        if got is None:
            denom = math.sqrt(nsq[i]) * math.sqrt(nsq[j])
            got = 0.0 if denom == 0.0 else _dot(vecs[i], vecs[j]) / denom
            sim_cache[key] = got
        return got

    chosen: list[int] = []
    out_rows = []
    remaining = list(range(len(cand)))
    for rank in range(min(k, len(cand))):
        scores = [
            lam * rel[p] - (1.0 - lam) * (
                max(_sim(p, c) for c in chosen) if chosen else 0.0
            )
            for p in remaining
        ]
        # argmax with ties toward the lower id (stable + explicit)
        best_pos = max(
            range(len(remaining)),
            key=lambda p: (scores[p], -ids[remaining[p]]),
        )
        best = remaining.pop(best_pos)
        chosen.append(best)
        out_rows.append(
            (rank + 1, ids[best], rel[best], float(scores[best_pos]))
        )
    spark = corpus.sparkSession
    return spark.createDataFrame(
        out_rows, "rank int, %s long, relevance double, mmr_score double" % id_col
    )


def rocchio_expand(
    corpus: DataFrame,
    query: Sequence[float],
    k: int,
    *,
    k_rel: int = 10,
    alpha: float = 1.0,
    beta: float = 0.5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Rocchio pseudo-relevance feedback: run the query, treat the top
    ``k_rel`` hits as relevant, move the query toward their centroid
    (q' = α·q + β·centroid), re-search with q'. The classic one-round
    query expansion — pulls in cluster members the original query
    narrowly missed.

    Distribution: both searches are the shuffle-free exact kNN plan; the
    feedback step collects only k_rel vectors (parameter-bounded, like
    the MMR shortlist) to form q' on the driver. Returns the re-ranked
    (id, score) under cosine.

    Float parity (round 13): the centroid is a LEFT-ASSOCIATED per-
    dimension float64 fold over the feedback vectors in result order
    (score DESC, id ASC), and q'_i = α·q_i + β·(sum_i / n) with exactly
    that operation order — the same order-pinning discipline as
    oracle.py's fold builders, so a DuckDB oracle can reconstruct q'
    bit-exactly (list_reduce over an ORDER-BY-pinned list). numpy's
    axis-0 mean is pairwise-blocked, NOT left-associated, which is the
    only reason this query was rows-only through r12."""
    from vector_db_spark.operators.knn import knn

    if k_rel < 1:
        raise ValueError("k_rel must be >= 1")
    rel = knn(
        corpus, query, k_rel, metric="cosine", vec_col=vec_col, id_col=id_col,
        keep_cols=(vec_col,),
    ).collect()
    if not rel:
        return knn(corpus, query, k, metric="cosine", vec_col=vec_col, id_col=id_col)
    vecs = [[float(x) for x in r[vec_col]] for r in rel]  # result order
    dim = len(vecs[0])
    sums = [0.0] * dim
    for v in vecs:
        for i in range(dim):
            sums[i] += v[i]
    n = float(len(vecs))
    q2 = [
        float(alpha) * float(qi) + float(beta) * (sums[i] / n)
        for i, qi in enumerate(query)
    ]
    return knn(
        corpus, q2, k, metric="cosine", vec_col=vec_col, id_col=id_col,
    )
