"""BM25 keyword ranking as a distributed dataflow.

Okapi BM25 over the engine's whitespace tokenization:

    idf(t)      = ln((N − df(t) + 0.5) / (df(t) + 0.5) + 1)     (Lucene form)
    score(d, q) = Σ_{t∈q} idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·dl(d)/avgdl))

Dataflow shape (one pass over the corpus, no per-query scan):
- (id, term, tf) postings for QUERY TERMS ONLY — the explode filters on
  the (tiny, broadcast-literal) query vocabulary before the shuffle, so
  the postings frame scales with matches, not corpus vocabulary;
- df per term and (N, avgdl) corpus stats are two small aggregates;
- the score is a per-posting expression + one groupBy(id) sum.

Every arithmetic step mirrors portable SQL, so BM25 ranking is
oracle-verifiable (ln is correctly-rounded on both engines; outputs are
rounded before hash comparison anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_db_spark.functions.text import tokens
from vector_db_spark.operators.util import fan_out


def bm25_scores(
    corpus: DataFrame,
    query_text: str,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, score) for every document matching ≥1 query term, BM25-ranked.
    Compose with ``orderBy(desc).limit(k)`` for top-k (TakeOrdered)."""
    qterms = sorted({t for t in query_text.split(" ") if t})
    if not qterms:
        raise ValueError("query_text must contain at least one token")

    toks = tokens(F.col(text_col))
    base = fan_out(corpus).select(
        F.col(id_col).alias("id"),
        toks.alias("_toks"),
        F.size(toks).alias("dl"),
    )

    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    ).head()
    n_docs, avgdl = int(stats.n_docs), float(stats.avgdl)

    qlit = F.array(*[F.lit(t) for t in qterms])
    postings = (
        base.select(
            "id",
            "dl",
            F.explode(F.array_intersect(F.array_distinct(F.col("_toks")), qlit)).alias(
                "term"
            ),
            F.col("_toks"),
        )
        .withColumn(
            "tf",
            F.size(F.filter(F.col("_toks"), lambda x: x == F.col("term"))).cast(
                "double"
            ),
        )
        .drop("_toks")
    )

    df_per_term = postings.groupBy("term").agg(
        F.countDistinct("id").alias("df")
    )

    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    norm = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
    contrib = idf * F.col("tf") * (k1 + 1.0) / norm

    # Fold contributions in TERM ORDER (array_sort on the struct sorts by
    # its first field): float sums are order-sensitive, and a plain SUM's
    # partial-agg order is engine- and partitioning-dependent — this keeps
    # scores bit-reproducible and lets the oracle use SUM(... ORDER BY term).
    return (
        postings.join(F.broadcast(df_per_term), "term")
        .select("id", "term", contrib.alias("contrib"))
        .groupBy("id")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "contrib"))),
                F.lit(0.0),
                lambda acc, s: acc + s["contrib"],
            ).alias("score")
        )
    )


def bm25_topk(
    corpus: DataFrame,
    query_text: str,
    k: int,
    **kwargs,
) -> DataFrame:
    if k < 1:
        raise ValueError("k must be >= 1")
    scores = bm25_scores(corpus, query_text, **kwargs)
    return scores.orderBy(F.col("score").desc(), F.col("id").asc()).limit(k)
