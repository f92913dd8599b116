"""Round-4 retrieval + curation additions.

- MaxSim late interaction (operators/late_interaction.py) — multi-vector
  retrieval the single-vector reference cannot express
  (/root/reference/src/models/request/insert.rs:10-14 pins one Vec<f32>
  per id).
- Weighted min-max score fusion (operators/hybrid.fusion_weighted) — the
  convex-combination hybrid combiner next to RRF.
- Target-proportion mixture sampling (operators/sampling.mixture_sample)
  — the static domain-mixture step of LLM data recipes.

All three are value-exact against DuckDB: MaxSim's per-token dots use the
same left-associated float64 folds as every kNN oracle; fusion arithmetic
is plain single-op float math; the mixture keep-counts are pure integer
arithmetic over md5 lotteries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_db_spark.oracle import cosine_sim_sql, dot_sql
from vector_db_spark.queries.registry import query
from vector_db_spark.sources.fixtures import load_table

# ---------------------------------------------------------------------------
# MaxSim late interaction: documents = label groups of the embeddings
# table (multi-vector docs), query = the first three fixture vectors.
# ---------------------------------------------------------------------------

_N_TOKS = 3
_MAXSIM_K = 5

_MAXSIM_ORACLE = f"""
WITH tok AS (
  SELECT vec_id AS t, embedding AS qv FROM embeddings WHERE vec_id < {_N_TOKS}
),
per AS (
  SELECT e.label, tok.t, max({dot_sql("e.embedding", "tok.qv")}) AS m
  FROM embeddings e, tok
  GROUP BY e.label, tok.t
),
scored AS (
  SELECT label, sum(m ORDER BY t) AS maxsim_score FROM per GROUP BY label
),
top AS (
  SELECT label, maxsim_score FROM scored
  ORDER BY maxsim_score DESC, label LIMIT {_MAXSIM_K}
)
SELECT label, round(maxsim_score, 6) AS maxsim_score FROM top
"""


@query("maxsim_label_search", oracle=_MAXSIM_ORACLE)
def maxsim_label_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style MaxSim over multi-vector documents (label groups):
    per-row token dots in codegen, ONE map-side-combined max shuffle on
    the doc key, TakeOrdered top-k. Token sum is left-associated in token
    order on both engines (ordered aggregate in the oracle)."""
    from vector_db_spark.operators.late_interaction import maxsim_search

    emb = load_table(spark, sf_dir, "embeddings")
    toks = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < _N_TOKS).orderBy("vec_id").collect()
    ]
    res = maxsim_search(emb, toks, _MAXSIM_K, doc_col="label")
    return res.select(
        "label", F.round("maxsim_score", 6).alias("maxsim_score")
    )


# ---------------------------------------------------------------------------
# Weighted min-max fusion over the same corpus/query as hybrid_search_rrf
# ---------------------------------------------------------------------------

_FQUERY_TEXT = "spark query vector join fast"
_FQ_TOKS = "['fast','join','query','spark','vector']"
_W_TEXT, _W_VEC = 0.6, 0.4

_FUSION_ORACLE = f"""
WITH corpus AS (
  SELECT d.doc_id AS id, d.text, e.embedding
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
tc AS (
  SELECT id,
         CAST(len(list_intersect(
           list_distinct(list_filter(string_split(text, ' '), t -> t <> '')),
           {_FQ_TOKS})) AS DOUBLE) AS tscore
  FROM corpus
),
ttop AS (SELECT * FROM tc WHERE tscore > 0 ORDER BY tscore DESC, id LIMIT 100),
tnormed AS (
  SELECT id,
         CASE WHEN max(tscore) OVER () = min(tscore) OVER () THEN 1.0
              ELSE (tscore - min(tscore) OVER ())
                   / (max(tscore) OVER () - min(tscore) OVER ())
         END AS tnorm
  FROM ttop
),
vc AS (
  SELECT c.id, {cosine_sim_sql("c.embedding", "q.qv")} AS vscore
  FROM corpus c, q
),
vtop AS (SELECT * FROM vc ORDER BY vscore DESC, id LIMIT 100),
vnormed AS (
  SELECT id,
         CASE WHEN max(vscore) OVER () = min(vscore) OVER () THEN 1.0
              ELSE (vscore - min(vscore) OVER ())
                   / (max(vscore) OVER () - min(vscore) OVER ())
         END AS vnorm
  FROM vtop
),
fused AS (
  SELECT COALESCE(t.id, v.id) AS id,
         COALESCE(t.tnorm, 0.0) AS tnorm,
         COALESCE(v.vnorm, 0.0) AS vnorm,
         CAST({_W_TEXT} AS DOUBLE) * COALESCE(t.tnorm, 0.0)
         + CAST({_W_VEC} AS DOUBLE) * COALESCE(v.vnorm, 0.0) AS fused_score
  FROM tnormed t FULL OUTER JOIN vnormed v ON t.id = v.id
),
top AS (SELECT * FROM fused ORDER BY fused_score DESC, id LIMIT 10)
SELECT id, round(tnorm, 6) AS tnorm, round(vnorm, 6) AS vnorm,
       round(fused_score, 6) AS fused_score
FROM top
"""


@query("fusion_weighted_search", oracle=_FUSION_ORACLE)
def fusion_weighted_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convex-combination hybrid fusion (operators/hybrid.fusion_weighted):
    per-modality top-100 via TakeOrderedAndProject, min-max normalization
    INSIDE the fetch-bounded lists, 0.6/0.4 weighted sum, full-outer
    fuse — the corpus is never globally sorted or ranked."""
    from vector_db_spark.operators.hybrid import fusion_weighted
    from vector_db_spark.queries.vector_queries import _qvec

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    corpus = docs.join(emb, "doc_id")
    res = fusion_weighted(
        corpus,
        _FQUERY_TEXT,
        _qvec(spark, sf_dir),
        10,
        fetch=100,
        w_text=_W_TEXT,
        w_vec=_W_VEC,
    )
    return res.select(
        "id",
        F.round("tnorm", 6).alias("tnorm"),
        F.round("vnorm", 6).alias("vnorm"),
        F.round("fused_score", 6).alias("fused_score"),
    )


# ---------------------------------------------------------------------------
# Target-proportion mixture sampling over documents.source
# ---------------------------------------------------------------------------

_MIX_TARGETS = {"src0": 500_000, "src1": 300_000, "src2": 200_000}
_MIX_VALUES = ", ".join(f"('{g}', {p})" for g, p in sorted(_MIX_TARGETS.items()))
_MIX_IN = ", ".join(f"'{g}'" for g in sorted(_MIX_TARGETS))

_MIXTURE_ORACLE = f"""
WITH t(source, ppm) AS (VALUES {_MIX_VALUES}),
counts AS (
  SELECT source, count(*) AS n FROM documents
  WHERE source IN ({_MIX_IN}) GROUP BY source
),
k AS (
  SELECT min(c.n * 1000000 // t.ppm) AS k_total
  FROM counts c JOIN t ON c.source = t.source
),
kept AS (SELECT t.source, t.ppm * k.k_total // 1000000 AS n_keep FROM t, k),
ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR) || 'mix') ASC, doc_id ASC
         ) AS rn
  FROM documents WHERE source IN ({_MIX_IN})
)
SELECT r.doc_id, r.source
FROM ranked r JOIN kept ON r.source = kept.source
WHERE r.rn <= kept.n_keep
"""


@query("mixture_sample_docs", oracle=_MIXTURE_ORACLE)
def mixture_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static domain-mixture rebalancing (operators/sampling.
    mixture_sample): three sources rebalanced to 50/30/20 with maximal
    retention — keep-counts are exact integer arithmetic (ppm scaling),
    survivors a deterministic md5 lottery, so the whole query is
    value-exact on both engines."""
    from vector_db_spark.operators.sampling import mixture_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    res = mixture_sample(docs, "source", _MIX_TARGETS)
    return res.select("doc_id", "source")


_MAXSIM_BATCH_ORACLE = f"""
WITH tok AS (
  SELECT vec_id // 3 AS query_id, vec_id AS t, embedding AS qv
  FROM embeddings WHERE vec_id < 6
),
per AS (
  SELECT tok.query_id, e.label, tok.t, max({dot_sql("e.embedding", "tok.qv")}) AS m
  FROM embeddings e, tok
  GROUP BY tok.query_id, e.label, tok.t
),
scored AS (
  SELECT query_id, label, sum(m ORDER BY t) AS maxsim_score
  FROM per GROUP BY query_id, label
),
ranked AS (
  SELECT query_id, label, maxsim_score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY maxsim_score DESC, label
         ) AS rank
  FROM scored
)
SELECT query_id, label, round(maxsim_score, 6) AS maxsim_score, rank
FROM ranked WHERE rank <= {_MAXSIM_K}
"""


@query("maxsim_batch_search", oracle=_MAXSIM_BATCH_ORACLE)
def maxsim_batch_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MaxSim: two 3-token queries share ONE corpus pass and one
    max-combine shuffle (the corpus-side cost is independent of how many
    queries ride the batch); per-query sums fold in token-id order on
    both engines."""
    from vector_db_spark.operators.late_interaction import maxsim_search_batch

    emb = load_table(spark, sf_dir, "embeddings")
    qrows = [
        (int(r.vec_id) // 3, int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.filter(F.col("vec_id") < 6).orderBy("vec_id").collect()
    ]
    queries = spark.createDataFrame(
        qrows, "query_id long, token_id long, token_vec array<double>"
    )
    res = maxsim_search_batch(emb, queries, _MAXSIM_K, doc_col="label")
    return res.select(
        "query_id",
        "label",
        F.round("maxsim_score", 6).alias("maxsim_score"),
        "rank",
    )


_MAXSIM_FILTERED_ORACLE = f"""
WITH tok AS (
  SELECT vec_id AS t, embedding AS qv FROM embeddings WHERE vec_id < {_N_TOKS}
),
per AS (
  SELECT e.label, tok.t, max({dot_sql("e.embedding", "tok.qv")}) AS m
  FROM embeddings e, tok
  WHERE e.label <> 3
  GROUP BY e.label, tok.t
),
scored AS (
  SELECT label, sum(m ORDER BY t) AS maxsim_score FROM per GROUP BY label
),
top AS (
  SELECT label, maxsim_score FROM scored
  ORDER BY maxsim_score DESC, label LIMIT {_MAXSIM_K}
)
SELECT label, round(maxsim_score, 6) AS maxsim_score FROM top
"""


@query("maxsim_filtered_search", oracle=_MAXSIM_FILTERED_ORACLE)
def maxsim_filtered_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered MaxSim: the predicate prunes corpus rows BEFORE any
    scoring (the §2.4 pre-filter contract on the late-interaction path) —
    documents keep their max over MATCHING vectors only."""
    from vector_db_spark.operators.late_interaction import maxsim_search

    emb = load_table(spark, sf_dir, "embeddings")
    toks = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < _N_TOKS).orderBy("vec_id").collect()
    ]
    res = maxsim_search(
        emb, toks, _MAXSIM_K, doc_col="label", predicate=F.col("label") != 3
    )
    return res.select(
        "label", F.round("maxsim_score", 6).alias("maxsim_score")
    )


# ---------------------------------------------------------------------------
# MaxSim with token-level IVF candidate generation (the PLAID
# decomposition, operators/late_interaction.MaxSimIvfIndex). Docs are
# vec_id % 97 groups (97 multi-vector docs — a real doc population, vs
# the 10 label groups). The exhaustive gate holds the family to the same
# lossless-configuration standard as every single-vector ANN family:
# full probe + non-binding shortlist must be VALUE-EXACT against the
# DuckDB exact-MaxSim oracle.
# ---------------------------------------------------------------------------

_MSIVF_NDOC = 97
_MSIVF_K = 5

_MSIVF_ORACLE = f"""
WITH tok AS (
  SELECT vec_id AS t, embedding AS qv FROM embeddings WHERE vec_id < {_N_TOKS}
),
per AS (
  SELECT e.vec_id % {_MSIVF_NDOC} AS doc, tok.t,
         max({dot_sql("e.embedding", "tok.qv")}) AS m
  FROM embeddings e, tok
  GROUP BY doc, tok.t
),
scored AS (
  SELECT doc, sum(m ORDER BY t) AS maxsim_score FROM per GROUP BY doc
),
top AS (
  SELECT doc, maxsim_score FROM scored
  ORDER BY maxsim_score DESC, doc LIMIT {_MSIVF_K}
)
SELECT doc, round(maxsim_score, 6) AS maxsim_score FROM top
"""


def _msivf_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        (F.col("vec_id") % _MSIVF_NDOC).alias("doc"), "embedding"
    )


def _msivf_toks(spark: SparkSession, sf_dir: str) -> list[list[float]]:
    emb = load_table(spark, sf_dir, "embeddings")
    return [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < _N_TOKS).orderBy("vec_id").collect()
    ]


@query("maxsim_ivf_exhaustive", oracle=_MSIVF_ORACLE)
def maxsim_ivf_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PLAID pipeline at lossless settings: token IVF candidate
    generation (full probe), centroid-score shortlist (non-binding
    bound, so the stage-2 approximation path executes but prunes
    nothing), exact MaxSim rerank — must equal the exact operator
    bit-for-bit (same fold order as the oracle's ordered sum)."""
    from vector_db_spark.operators.late_interaction import MaxSimIvfIndex

    idx = MaxSimIvfIndex.build(
        _msivf_corpus(spark, sf_dir), nlist=16, doc_col="doc", max_iter=5
    )
    # non-binding bound: docs = vec_id % 97 gives <= 97 docs by
    # construction, so shortlist=_MSIVF_NDOC exercises the stage-2
    # approximation while provably pruning nothing — and stays a
    # TakeOrdered, not the global sort a 10^9 limit would plan
    res = idx.search(
        _msivf_toks(spark, sf_dir), _MSIVF_K, nprobe=16,
        shortlist=_MSIVF_NDOC,
    )
    return res.select("doc", F.round("maxsim_score", 6).alias("maxsim_score"))


def _msivf_probe_oracle() -> str:
    """Frozen probed-PLAID oracle: replay token assignment (MIPS-
    augmented argmin over the frozen 65-dim centroid literals), the
    per-token probe sets, the stage-2 centroid-score shortlist, and the
    exact stage-3 rerank — every float a left fold matching the
    exact-fold engine path (late_interaction.load_frozen_doc_maxsim_ivf)."""
    import json as _json
    import os as _os

    from vector_db_spark.operators.late_interaction import (
        FROZEN_DOC_MAXSIM_IVF_PATH,
    )

    path = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        FROZEN_DOC_MAXSIM_IVF_PATH,
    )
    with open(path) as f:
        art = _json.load(f)
    cents = art["centroids"]
    nlist, adim = len(cents), len(cents[0])
    dim = adim - 1
    m2 = repr(float(art["max_sq_norm"]))
    cols = ", ".join(f"c{d}" for d in range(adim))
    rows = ",\n".join(
        f"({j}, " + ", ".join(repr(float(x)) for x in cents[j]) + ")"
        for j in range(nlist)
    )
    sq = " + ".join(
        f"(e.embedding[{d + 1}]::DOUBLE * e.embedding[{d + 1}]::DOUBLE)"
        for d in range(dim)
    )
    av = ", ".join(f"e.embedding[{d + 1}]::DOUBLE" for d in range(dim))
    adist = " + ".join(
        f"(a.av[{d + 1}] - c.c{d}) * (a.av[{d + 1}] - c.c{d})"
        for d in range(adim)
    )
    qdist = (
        " + ".join(
            f"(tok.qv[{d + 1}]::DOUBLE - c.c{d}) * (tok.qv[{d + 1}]::DOUBLE - c.c{d})"
            for d in range(dim)
        )
        + f" + (0.0::DOUBLE - c.c{dim}) * (0.0::DOUBLE - c.c{dim})"
    )
    cscore = " + ".join(
        f"(c.c{d} * tok.qv[{d + 1}]::DOUBLE)" for d in range(dim)
    )
    maxes = ", ".join(
        f"max(CASE WHEN s.t = {t} THEN s.sc END) AS m{t}"
        for t in range(_N_TOKS)
    )
    approx = " + ".join(f"COALESCE(m{t}, 0.0)" for t in range(_N_TOKS))
    return f"""
WITH tok AS (
  SELECT vec_id AS t, embedding AS qv FROM embeddings WHERE vec_id < {_N_TOKS}
),
cb (j, {cols}) AS (VALUES
{rows}
),
augv AS (
  SELECT e.vec_id, e.vec_id % {_MSIVF_NDOC} AS doc,
         [{av}, sqrt(greatest({m2} - ({sq}), 0.0))] AS av
  FROM embeddings e
),
assign AS (
  SELECT vec_id, doc, j AS cell FROM (
    SELECT a.vec_id, a.doc, c.j,
           row_number() OVER (
             PARTITION BY a.vec_id ORDER BY {adist} ASC, c.j ASC
           ) AS rn
    FROM augv a CROSS JOIN cb c
  ) WHERE rn = 1
),
qprobe AS (
  SELECT t, j AS cell FROM (
    SELECT tok.t, c.j,
           row_number() OVER (
             PARTITION BY tok.t ORDER BY {qdist} ASC, c.j ASC
           ) AS rn
    FROM tok CROSS JOIN cb c
  ) WHERE rn <= 4
),
doc_cells AS (
  SELECT DISTINCT doc, cell FROM assign
  WHERE cell IN (SELECT cell FROM qprobe)
),
s AS (
  SELECT qp.cell, qp.t, {cscore} AS sc
  FROM qprobe qp JOIN cb c ON c.j = qp.cell JOIN tok ON tok.t = qp.t
),
stage2 AS (
  SELECT dc.doc, {maxes}
  FROM doc_cells dc JOIN s ON s.cell = dc.cell
  GROUP BY dc.doc
),
short AS (
  SELECT doc FROM stage2
  ORDER BY {approx} DESC, doc ASC
  LIMIT 20
),
per AS (
  SELECT sh.doc, tok.t, max({dot_sql("e.embedding", "tok.qv")}) AS m
  FROM embeddings e
  JOIN short sh ON e.vec_id % {_MSIVF_NDOC} = sh.doc
  CROSS JOIN tok
  GROUP BY sh.doc, tok.t
),
scored AS (
  SELECT doc, sum(m ORDER BY t) AS maxsim_score FROM per GROUP BY doc
),
top AS (
  SELECT doc, maxsim_score FROM scored
  ORDER BY maxsim_score DESC, doc LIMIT 10
)
SELECT doc, round(maxsim_score, 6) AS maxsim_score FROM top
"""


@query("maxsim_ivf_probe", oracle=_msivf_probe_oracle())
def maxsim_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-scan PLAID retrieval: probe a quarter of the cells per token,
    rerank a 20-doc shortlist — the scan-bound path a 100 TB retrieval
    user actually hits; returned scores are exact MaxSim for every
    surviving doc (stage-3 contract) — served from the FROZEN token-IVF
    (late_interaction.load_frozen_doc_maxsim_ivf).

    Hash-exact as of round 14 (rows-only → converted): token assignment
    is a codegen argmin over the MIPS-augmented frozen centroids (the
    augmentation itself a fold-portable expression), probe sets and the
    stage-2 centroid-score shortlist are order-pinned folds, and the
    exact rerank was already bit-portable — so the DuckDB oracle
    replays all three PLAID stages. Production Arrow kernels stay
    hash-gated by the maxsim_ivf exhaustive family; recall pinned in
    tests/test_late_interaction.py."""
    from vector_db_spark.operators.late_interaction import (
        load_frozen_doc_maxsim_ivf,
    )

    idx = load_frozen_doc_maxsim_ivf(_msivf_corpus(spark, sf_dir))
    res = idx.search(
        _msivf_toks(spark, sf_dir), 10, nprobe=4, shortlist=20
    )
    return res.select("doc", F.round("maxsim_score", 6).alias("maxsim_score"))


_MSIVF_BATCH_ORACLE = f"""
WITH tok AS (
  SELECT vec_id // 3 AS query_id, vec_id AS t, embedding AS qv
  FROM embeddings WHERE vec_id < 6
),
per AS (
  SELECT tok.query_id, e.vec_id % {_MSIVF_NDOC} AS doc, tok.t,
         max({dot_sql("e.embedding", "tok.qv")}) AS m
  FROM embeddings e, tok
  GROUP BY tok.query_id, doc, tok.t
),
scored AS (
  SELECT query_id, doc, sum(m ORDER BY t) AS maxsim_score
  FROM per GROUP BY query_id, doc
),
ranked AS (
  SELECT query_id, doc, maxsim_score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY maxsim_score DESC, doc
         ) AS rank
  FROM scored
)
SELECT query_id, doc, round(maxsim_score, 6) AS maxsim_score, rank
FROM ranked WHERE rank <= {_MSIVF_K}
"""


@query("maxsim_ivf_batch_exhaustive", oracle=_MSIVF_BATCH_ORACLE)
def maxsim_ivf_batch_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch PLAID at lossless settings: per-query candidate sets from
    one probed-(query, cell) equi-join, non-binding per-query shortlist
    windows, one exact rerank pass masked to each query's own candidates
    — must equal exact batch MaxSim bit-for-bit."""
    from vector_db_spark.operators.late_interaction import MaxSimIvfIndex

    emb = load_table(spark, sf_dir, "embeddings")
    qrows = [
        (int(r.vec_id) // 3, int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.filter(F.col("vec_id") < 6).orderBy("vec_id").collect()
    ]
    queries = spark.createDataFrame(
        qrows, "query_id long, token_id long, token_vec array<double>"
    )
    idx = MaxSimIvfIndex.build(
        _msivf_corpus(spark, sf_dir), nlist=16, doc_col="doc", max_iter=5
    )
    res = idx.search_batch(
        queries, _MSIVF_K, nprobe=16, shortlist=_MSIVF_NDOC
    )
    return res.select(
        "query_id",
        "doc",
        F.round("maxsim_score", 6).alias("maxsim_score"),
        "rank",
    )


_MSIVF_FILTERED_ORACLE = f"""
WITH tok AS (
  SELECT vec_id AS t, embedding AS qv FROM embeddings WHERE vec_id < {_N_TOKS}
),
per AS (
  SELECT e.vec_id % {_MSIVF_NDOC} AS doc, tok.t,
         max({dot_sql("e.embedding", "tok.qv")}) AS m
  FROM embeddings e, tok
  WHERE (e.vec_id % {_MSIVF_NDOC}) % 5 <> 2
  GROUP BY doc, tok.t
),
scored AS (
  SELECT doc, sum(m ORDER BY t) AS maxsim_score FROM per GROUP BY doc
),
top AS (
  SELECT doc, maxsim_score FROM scored
  ORDER BY maxsim_score DESC, doc LIMIT {_MSIVF_K}
)
SELECT doc, round(maxsim_score, 6) AS maxsim_score FROM top
"""


@query("maxsim_ivf_filtered_exhaustive", oracle=_MSIVF_FILTERED_ORACLE)
def maxsim_ivf_filtered_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered PLAID gate: the predicate pre-filters token rows before
    candidate generation AND the exact rerank (the same pre-filter
    semantics as every search family); at lossless settings the result
    must equal exact filtered MaxSim."""
    from vector_db_spark.operators.late_interaction import MaxSimIvfIndex

    idx = MaxSimIvfIndex.build(
        _msivf_corpus(spark, sf_dir), nlist=16, doc_col="doc", max_iter=5
    )
    res = idx.search(
        _msivf_toks(spark, sf_dir),
        _MSIVF_K,
        nprobe=16,
        shortlist=_MSIVF_NDOC,
        predicate=(F.col("doc") % 5) != 2,
    )
    return res.select("doc", F.round("maxsim_score", 6).alias("maxsim_score"))


# ---------------------------------------------------------------------------
# Round 6: compressed PLAID (MaxSimPqIndex — ColBERTv2 residual PQ over
# the token IVF, operators/late_interaction.py). Same corpus/query/oracle
# shapes as the maxsim_ivf_* family: at lossless settings (full probe,
# non-binding shortlist) the residual-ADC stage executes but prunes
# nothing, and the exact rerank must reproduce exact MaxSim bit-for-bit.
# ---------------------------------------------------------------------------


def _mspq_index(spark: SparkSession, sf_dir: str):
    from vector_db_spark.operators.late_interaction import MaxSimPqIndex

    return MaxSimPqIndex.build(
        _msivf_corpus(spark, sf_dir),
        nlist=16,
        m=8,
        ksub=32,
        doc_col="doc",
        max_iter=5,
        pq_iters=5,
    )


@query("maxsim_pq_exhaustive", oracle=_MSIVF_ORACLE)
def maxsim_pq_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-PLAID lossless gate: full probe + non-binding shortlist
    routes every doc through the residual-ADC approximation and the exact
    raw-token rerank — must equal the exact operator (same fold order as
    the oracle's ordered sum), proving the codes layer never corrupts
    served scores (approximation lives only in candidate pruning)."""
    res = _mspq_index(spark, sf_dir).search(
        _msivf_toks(spark, sf_dir), _MSIVF_K, nprobe=16, shortlist=_MSIVF_NDOC
    )
    return res.select("doc", F.round("maxsim_score", 6).alias("maxsim_score"))


def _mspq_probe_oracle() -> str:
    """Frozen compressed-PLAID oracle: the probed-MaxSim oracle's
    assignment/probe machinery plus the residual-ADC stage 2 — per
    union-cell token row, dot ≈ ⟨q_t, centroid⟩ + ordered IP-ADC fold
    over the frozen residual codes; the fold SEEDS with the centroid
    dot (list_prepend) to match the engine's ((cent + l0) + l1) + …
    accumulation (late_interaction._adc_dots exact branch)."""
    import json as _json
    import os as _os

    from vector_db_spark.operators.late_interaction import (
        FROZEN_DOC_MAXSIM_IVF_PATH,
        FROZEN_DOC_MAXSIM_PQ_PATH,
    )

    root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    with open(_os.path.join(root, FROZEN_DOC_MAXSIM_IVF_PATH)) as f:
        ivf_art = _json.load(f)
    with open(_os.path.join(root, FROZEN_DOC_MAXSIM_PQ_PATH)) as f:
        pq_art = _json.load(f)
    cents = ivf_art["centroids"]
    nlist, adim = len(cents), len(cents[0])
    dim = adim - 1
    m2 = repr(float(ivf_art["max_sq_norm"]))
    books = pq_art["codebooks"]
    m, ksub, dsub = len(books), len(books[0]), len(books[0][0])

    cols = ", ".join(f"c{d}" for d in range(adim))
    rows = ",\n".join(
        f"({j}, " + ", ".join(repr(float(x)) for x in cents[j]) + ")"
        for j in range(nlist)
    )
    pq_cols = ", ".join(f"p{d}" for d in range(dsub))
    pq_rows = ",\n".join(
        f"({s}, {j}, " + ", ".join(repr(float(x)) for x in books[s][j]) + ")"
        for s in range(m)
        for j in range(ksub)
    )
    sq = " + ".join(
        f"(e.embedding[{d + 1}]::DOUBLE * e.embedding[{d + 1}]::DOUBLE)"
        for d in range(dim)
    )
    av = ", ".join(f"e.embedding[{d + 1}]::DOUBLE" for d in range(dim))
    adist = " + ".join(
        f"(a.av[{d + 1}] - c.c{d}) * (a.av[{d + 1}] - c.c{d})"
        for d in range(adim)
    )
    qdist = (
        " + ".join(
            f"(tok.qv[{d + 1}]::DOUBLE - c.c{d}) * (tok.qv[{d + 1}]::DOUBLE - c.c{d})"
            for d in range(dim)
        )
        + f" + (0.0::DOUBLE - c.c{dim}) * (0.0::DOUBLE - c.c{dim})"
    )
    rv = ", ".join(
        f"e.embedding[{d + 1}]::DOUBLE - c.c{d}" for d in range(dim)
    )
    enc_dist = " + ".join(
        f"((r.rv[p.s*{dsub} + {d + 1}]) - p.p{d}) * "
        f"((r.rv[p.s*{dsub} + {d + 1}]) - p.p{d})"
        for d in range(dsub)
    )
    cscore = " + ".join(
        f"(c.c{d} * tok.qv[{d + 1}]::DOUBLE)" for d in range(dim)
    )
    lut_ip = " + ".join(
        f"(p.p{d} * tok.qv[p.s*{dsub} + {d + 1}]::DOUBLE)" for d in range(dsub)
    )
    maxes = ", ".join(
        f"max(CASE WHEN t = {t} THEN dot END) AS m{t}" for t in range(_N_TOKS)
    )
    approx = " + ".join(f"m{t}" for t in range(_N_TOKS))
    return f"""
WITH tok AS (
  SELECT vec_id AS t, embedding AS qv FROM embeddings WHERE vec_id < {_N_TOKS}
),
cb (j, {cols}) AS (VALUES
{rows}
),
pqc (s, j2, {pq_cols}) AS (VALUES
{pq_rows}
),
augv AS (
  SELECT e.vec_id, e.vec_id % {_MSIVF_NDOC} AS doc,
         [{av}, sqrt(greatest({m2} - ({sq}), 0.0))] AS av
  FROM embeddings e
),
assign AS (
  SELECT vec_id, doc, j AS cell FROM (
    SELECT a.vec_id, a.doc, c.j,
           row_number() OVER (
             PARTITION BY a.vec_id ORDER BY {adist} ASC, c.j ASC
           ) AS rn
    FROM augv a CROSS JOIN cb c
  ) WHERE rn = 1
),
qprobe AS (
  SELECT t, j AS cell FROM (
    SELECT tok.t, c.j,
           row_number() OVER (
             PARTITION BY tok.t ORDER BY {qdist} ASC, c.j ASC
           ) AS rn
    FROM tok CROSS JOIN cb c
  ) WHERE rn <= 4
),
resid AS (
  SELECT a.vec_id, a.doc, a.cell, [{rv}] AS rv
  FROM embeddings e
  JOIN assign a USING (vec_id)
  JOIN cb c ON c.j = a.cell
  WHERE a.cell IN (SELECT DISTINCT cell FROM qprobe)
),
codes AS (
  SELECT vec_id, doc, cell, s, j2 FROM (
    SELECT r.vec_id, r.doc, r.cell, p.s, p.j2,
           row_number() OVER (
             PARTITION BY r.vec_id, p.s
             ORDER BY {enc_dist} ASC, p.j2 ASC
           ) AS rn
    FROM resid r CROSS JOIN pqc p
  ) WHERE rn = 1
),
cscore AS (
  SELECT c.j AS cell, tok.t, {cscore} AS sc
  FROM cb c CROSS JOIN tok
  WHERE c.j IN (SELECT DISTINCT cell FROM qprobe)
),
lut AS (
  SELECT tok.t, p.s, p.j2, {lut_ip} AS d
  FROM pqc p CROSS JOIN tok
),
rowdots AS (
  SELECT codes.vec_id, codes.doc, lut.t,
         list_reduce(
           list_prepend(any_value(cs.sc), list(lut.d ORDER BY codes.s)),
           (a, b) -> a + b
         ) AS dot
  FROM codes
  JOIN lut ON lut.s = codes.s AND lut.j2 = codes.j2
  JOIN cscore cs ON cs.cell = codes.cell AND cs.t = lut.t
  GROUP BY codes.vec_id, codes.doc, lut.t
),
stage2 AS (
  SELECT doc, {maxes} FROM rowdots GROUP BY doc
),
short AS (
  SELECT doc FROM stage2
  ORDER BY {approx} DESC, doc ASC
  LIMIT 20
),
per AS (
  SELECT sh.doc, tok.t, max({dot_sql("e.embedding", "tok.qv")}) AS m
  FROM embeddings e
  JOIN short sh ON e.vec_id % {_MSIVF_NDOC} = sh.doc
  CROSS JOIN tok
  GROUP BY sh.doc, tok.t
),
scored AS (
  SELECT doc, sum(m ORDER BY t) AS maxsim_score FROM per GROUP BY doc
),
top AS (
  SELECT doc, maxsim_score FROM scored
  ORDER BY maxsim_score DESC, doc LIMIT 10
)
SELECT doc, round(maxsim_score, 6) AS maxsim_score FROM top
"""


@query("maxsim_pq_probe", oracle=_mspq_probe_oracle())
def maxsim_pq_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-scan compressed-PLAID retrieval: a quarter of the cells per
    token, 20-doc shortlist ranked by residual ADC over M=8-byte codes —
    the scan reads 8 bytes/token instead of 256 (bytes comparison
    recorded by bench.py as maxsim_pq_codes_bytes / raw_bytes) — served
    from the FROZEN compressed index
    (late_interaction.load_frozen_doc_maxsim_pq).

    Hash-exact as of round 14 (rows-only → converted): the oracle
    replays token assignment, residual encode, the centroid-dot-seeded
    ordered IP-ADC fold (list_prepend — matching the engine's
    ((cent + l0) + l1) + … accumulation), the stage-2 shortlist, and
    the exact rerank. Production Arrow kernels stay hash-gated by the
    maxsim_pq exhaustive family; recall pinned in
    tests/test_late_interaction.py."""
    from vector_db_spark.operators.late_interaction import (
        load_frozen_doc_maxsim_pq,
    )

    idx = load_frozen_doc_maxsim_pq(_msivf_corpus(spark, sf_dir))
    res = idx.search(
        _msivf_toks(spark, sf_dir), 10, nprobe=4, shortlist=20
    )
    return res.select("doc", F.round("maxsim_score", 6).alias("maxsim_score"))


@query("maxsim_pq_batch_exhaustive", oracle=_MSIVF_BATCH_ORACLE)
def maxsim_pq_batch_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch compressed PLAID at lossless settings: one residual-ADC pass
    scores all batch tokens, per-query shortlist windows prune nothing
    (non-binding), one masked exact rerank — must equal exact batch
    MaxSim bit-for-bit."""
    emb = load_table(spark, sf_dir, "embeddings")
    qrows = [
        (int(r.vec_id) // 3, int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.filter(F.col("vec_id") < 6).orderBy("vec_id").collect()
    ]
    queries = spark.createDataFrame(
        qrows, "query_id long, token_id long, token_vec array<double>"
    )
    res = _mspq_index(spark, sf_dir).search_batch(
        queries, _MSIVF_K, nprobe=16, shortlist=_MSIVF_NDOC
    )
    return res.select(
        "query_id",
        "doc",
        F.round("maxsim_score", 6).alias("maxsim_score"),
        "rank",
    )


@query("maxsim_pq_filtered_exhaustive", oracle=_MSIVF_FILTERED_ORACLE)
def maxsim_pq_filtered_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered compressed-PLAID gate: predicate pre-filters token rows
    before candidate generation, ADC scoring, and the exact rerank; at
    lossless settings equals exact filtered MaxSim."""
    res = _mspq_index(spark, sf_dir).search(
        _msivf_toks(spark, sf_dir),
        _MSIVF_K,
        nprobe=16,
        shortlist=_MSIVF_NDOC,
        predicate=(F.col("doc") % 5) != 2,
    )
    return res.select("doc", F.round("maxsim_score", 6).alias("maxsim_score"))


_MSIVF_DELETE_ORACLE = f"""
WITH tok AS (
  SELECT vec_id AS t, embedding AS qv FROM embeddings WHERE vec_id < {_N_TOKS}
),
per AS (
  SELECT e.vec_id % {_MSIVF_NDOC} AS doc, tok.t,
         max({dot_sql("e.embedding", "tok.qv")}) AS m
  FROM embeddings e, tok
  WHERE (e.vec_id % {_MSIVF_NDOC}) % 7 <> 3
  GROUP BY doc, tok.t
),
scored AS (
  SELECT doc, sum(m ORDER BY t) AS maxsim_score FROM per GROUP BY doc
),
top AS (
  SELECT doc, maxsim_score FROM scored
  ORDER BY maxsim_score DESC, doc LIMIT {_MSIVF_K}
)
SELECT doc, round(maxsim_score, 6) AS maxsim_score FROM top
"""


@query("maxsim_pq_delete_exhaustive", oracle=_MSIVF_DELETE_ORACLE)
def maxsim_pq_delete_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete gate for the compressed multi-vector family (completes the
    per-family delete matrix: every persisted index — now including
    residual-PQ PLAID — serves correctly through doc-level tombstones):
    build over the full corpus, tombstone the doc % 7 == 3 docs, then a
    lossless-settings search must equal exact MaxSim over the survivors
    — candidate generation, ADC scoring, AND the raw-token rerank all
    anti-join the manifest (reference remove semantics,
    src/core/index/faiss_index.rs:131-138, at doc granularity)."""
    idx = _mspq_index(spark, sf_dir)
    idx.delete([d for d in range(_MSIVF_NDOC) if d % 7 == 3])
    res = idx.search(
        _msivf_toks(spark, sf_dir), _MSIVF_K, nprobe=16, shortlist=_MSIVF_NDOC
    )
    return res.select("doc", F.round("maxsim_score", 6).alias("maxsim_score"))


@query("maxsim_pq_vacuum_exhaustive", oracle=_MSIVF_DELETE_ORACLE)
def maxsim_pq_vacuum_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vacuum gate for the compressed multi-vector family — the last
    cell of its maintenance matrix (delete and append carry their own
    gates): tombstone the doc % 7 == 3 docs, COMPACT the layout into a
    fresh directory (late_interaction.MaxSimPqIndex.vacuum — codes ride
    along, codebooks re-persist, manifest empties), then a
    lossless-settings search over the compacted index must equal exact
    MaxSim over the survivors — same oracle as the delete gate, proving
    compaction loses nothing and resurrects nothing (engine twin:
    tests/test_late_interaction.py test_maxsim_pq_lifecycle)."""
    import tempfile

    idx = _mspq_index(spark, sf_dir)
    idx.delete([d for d in range(_MSIVF_NDOC) if d % 7 == 3])
    compacted = idx.vacuum(tempfile.mkdtemp(prefix="mspq_vac_"))
    assert compacted.tombstones is None, "vacuum must clear the manifest"
    res = compacted.search(
        _msivf_toks(spark, sf_dir), _MSIVF_K, nprobe=16, shortlist=_MSIVF_NDOC
    )
    return res.select("doc", F.round("maxsim_score", 6).alias("maxsim_score"))


# ---------------------------------------------------------------------------
# Round 12: MaxSim RANGE search — score-threshold retrieval, the range
# twin across the late-interaction families (operators/late_interaction
# .maxsim_range_search / MaxSimIvfIndex.range_search / MaxSimPqIndex
# .range_search). The reference has no range operation at all
# (/root/reference/src/router/mod.rs:1-7); faiss's range_search contract
# extends naturally: MaxSim is an ip-family score, so the threshold is a
# FLOOR. The gates derive the threshold FROM the data (the K-th exact
# score) so they are scale-factor independent and nontrivial at every SF;
# Spark and DuckDB derive bit-equal thresholds because served scores are
# bit-equal (the existing maxsim hash gates prove the fold parity).
# ---------------------------------------------------------------------------

_MSRANGE_K = 12

_MSRANGE_ORACLE = f"""
WITH tok AS (
  SELECT vec_id AS t, embedding AS qv FROM embeddings WHERE vec_id < {_N_TOKS}
),
per AS (
  SELECT e.vec_id % {_MSIVF_NDOC} AS doc, tok.t,
         max({dot_sql("e.embedding", "tok.qv")}) AS m
  FROM embeddings e, tok
  GROUP BY doc, tok.t
),
scored AS (
  SELECT doc, sum(m ORDER BY t) AS maxsim_score FROM per GROUP BY doc
),
thr AS (
  SELECT min(maxsim_score) AS t FROM (
    SELECT maxsim_score FROM scored
    ORDER BY maxsim_score DESC, doc LIMIT {_MSRANGE_K}
  )
)
SELECT doc, round(maxsim_score, 6) AS maxsim_score
FROM scored, thr
WHERE maxsim_score >= thr.t
ORDER BY maxsim_score DESC, doc
"""


_MSRANGE_THR_CACHE: dict[str, float] = {}


def _msrange_threshold(spark: SparkSession, sf_dir: str) -> float:
    """The K-th exact MaxSim score over the vec_id % 97 doc population —
    the driver-side scalar both engines agree on bit-for-bit (it is the
    min of the top-K scores the hash-green top-k gates already compare).
    Cached per sf_dir: the derivation is a full-corpus aggregate, and
    re-paying it on every bench rep would time threshold construction
    instead of the range operator the entry is named for (fixture
    content is static within a process lifetime). The batch gate's
    query-0 tokens are the same first-three fixture vectors, so one
    cache entry serves both gates."""
    if sf_dir not in _MSRANGE_THR_CACHE:
        from vector_db_spark.operators.late_interaction import maxsim_search

        top = maxsim_search(
            _msivf_corpus(spark, sf_dir),
            _msivf_toks(spark, sf_dir),
            _MSRANGE_K,
            doc_col="doc",
        ).collect()
        _MSRANGE_THR_CACHE[sf_dir] = float(top[-1].maxsim_score)
    return _MSRANGE_THR_CACHE[sf_dir]


@query("maxsim_range", oracle=_MSRANGE_ORACLE)
def maxsim_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact MaxSim range: every doc whose score clears the data-derived
    threshold (>= the 12th exact score, so >= 12 rows — more on ties).
    Same one-doc-key-shuffle plan as top-k with the TakeOrdered replaced
    by a filter + sort of only the matching rows."""
    from vector_db_spark.operators.late_interaction import maxsim_range_search

    res = maxsim_range_search(
        _msivf_corpus(spark, sf_dir),
        _msivf_toks(spark, sf_dir),
        _msrange_threshold(spark, sf_dir),
        doc_col="doc",
    )
    return res.select("doc", F.round("maxsim_score", 6).alias("maxsim_score"))


@query("maxsim_ivf_range_exhaustive", oracle=_MSRANGE_ORACLE)
def maxsim_ivf_range_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PLAID range at the exhaustive setting: full probe makes the
    candidate set the whole doc population and the exact verify makes
    every returned row bit-equal to the exact operator's — the same
    lossless-configuration standard as every family's range gate."""
    from vector_db_spark.operators.late_interaction import MaxSimIvfIndex

    idx = MaxSimIvfIndex.build(
        _msivf_corpus(spark, sf_dir), nlist=16, doc_col="doc", max_iter=5
    )
    res = idx.range_search(
        _msivf_toks(spark, sf_dir),
        _msrange_threshold(spark, sf_dir),
        nprobe=16,
    )
    return res.select("doc", F.round("maxsim_score", 6).alias("maxsim_score"))


@query("maxsim_pq_range_exhaustive", oracle=_MSRANGE_ORACLE)
def maxsim_pq_range_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-PLAID range at the exhaustive setting. The ADC stage is
    deliberately ABSENT from range (quantized scores cannot bound exact
    scores against a threshold); candidates come from the probed cells
    and are verified from the raw token rows the inner IVF layout
    retains — full probe must equal the exact operator."""
    res = _mspq_index(spark, sf_dir).range_search(
        _msivf_toks(spark, sf_dir),
        _msrange_threshold(spark, sf_dir),
        nprobe=16,
    )
    return res.select("doc", F.round("maxsim_score", 6).alias("maxsim_score"))


_MSRANGE_BATCH_ORACLE = f"""
WITH tok AS (
  SELECT vec_id // 3 AS query_id, vec_id AS t, embedding AS qv
  FROM embeddings WHERE vec_id < 6
),
per AS (
  SELECT tok.query_id, e.vec_id % {_MSIVF_NDOC} AS doc, tok.t,
         max({dot_sql("e.embedding", "tok.qv")}) AS m
  FROM embeddings e, tok
  GROUP BY tok.query_id, doc, tok.t
),
scored AS (
  SELECT query_id, doc, sum(m ORDER BY t) AS maxsim_score
  FROM per GROUP BY query_id, doc
),
thr AS (
  SELECT min(maxsim_score) AS t FROM (
    SELECT maxsim_score FROM scored WHERE query_id = 0
    ORDER BY maxsim_score DESC, doc LIMIT {_MSRANGE_K}
  )
)
SELECT query_id, doc, round(maxsim_score, 6) AS maxsim_score
FROM scored, thr
WHERE maxsim_score >= thr.t
ORDER BY query_id, maxsim_score DESC, doc
"""


@query("maxsim_batch_range", oracle=_MSRANGE_BATCH_ORACLE)
def maxsim_batch_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MaxSim range (two 3-token queries, one shared threshold
    derived from query 0's 12th exact score): ONE corpus pass scores the
    whole batch — per-doc token maxes shuffle once on the doc key — and
    each query keeps its own in-range rows. Verified against the
    exhaustive IVF batch formulation in tests; hash-gated here against
    the per-query exact SQL."""
    from vector_db_spark.operators.late_interaction import (
        maxsim_range_search_batch,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qrows = [
        (int(r.vec_id) // 3, int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.filter(F.col("vec_id") < 6).orderBy("vec_id").collect()
    ]
    queries = spark.createDataFrame(
        qrows, "query_id long, token_id long, token_vec array<double>"
    )
    # query 0's tokens ARE the first three fixture vectors — the same
    # derivation _msrange_threshold caches (and the oracle recomputes)
    thr = _msrange_threshold(spark, sf_dir)
    res = maxsim_range_search_batch(
        _msivf_corpus(spark, sf_dir), queries, thr, doc_col="doc"
    )
    return res.select(
        "query_id", "doc", F.round("maxsim_score", 6).alias("maxsim_score")
    )
