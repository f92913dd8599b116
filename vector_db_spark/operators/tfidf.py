"""TF-IDF keyword scoring over a document corpus.

Classic corpus-level term weighting (Salton & Buckley 1988) with the
smoothed idf used by scikit-learn's ``TfidfTransformer``:

    idf(t) = ln((N + 1) / (df(t) + 1)) + 1
    score(d, t) = tf(d, t) * idf(t)

The reference engine has no text-weighting surface (its scalar storage,
``/root/reference/src/core/storage/scalar_storage.rs:10-14``, stores
opaque strings); this operator is part of the LLM-pipeline family that a
training-data engine needs alongside BM25 (``operators/bm25.py``) —
TF-IDF is the corpus-statistics building block for keyword extraction,
doc-vector featurization, and cheap relevance baselines.

100 TB design:

- tokenize row-locally (``F.split`` → ``F.filter`` → ``explode``) — no
  Python in the hot path, whole-stage codegen end to end;
- ``tf`` is one hash shuffle on ``(id, term)`` with map-side partial
  aggregation, so the exchange carries one row per (partition, doc,
  term), not one per occurrence;
- ``df`` re-aggregates the *already reduced* doc-term rows by term — the
  second shuffle's input is bounded by Σ|doc vocabularies|, far below
  token count;
- ``N`` is a scalar aggregate broadcast as a literal via cross join of a
  1-row frame (Spark turns it into BroadcastNestedLoopJoin over one row);
- the idf join is a plain equi-join on ``term`` — vocabulary-sized, so
  it shuffles rather than broadcasts by design (a 100 TB corpus has a
  vocabulary too large for a broadcast); AQE will still choose broadcast
  when the vocabulary is actually small.

Top-k per document adds one ``row_number`` window partitioned by the doc
id (third shuffle). Ties break on ascending term for determinism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _tokens(col: Column) -> Column:
    # single-space split, empties dropped — the module-wide tokenization
    # parity contract with the DuckDB oracles (pipeline_queries.py:6-9)
    return F.filter(F.split(col, " "), lambda t: t != "")


def tfidf_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-(doc, term) TF-IDF scores: columns (id, term, tf, df, score).

    ``score`` is raw-tf × smoothed-idf; callers wanting length
    normalization can divide by a per-doc norm downstream (one more
    window) — kept out of the core so the common top-k path pays three
    shuffles, not four.
    """
    # No fan_out here: the tokenize is a cheap split and the explode
    # feeds straight into the term-count exchange, which already spreads
    # the work — a pre-shuffle of the full text measured net-slower
    # (0.70 s → 0.90 s at sf0.1).
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(_tokens(F.col(text_col))).alias("term"),
    )
    tf = tok.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.select(F.count(F.lit(1)).alias("n"))
    return (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "id",
            "term",
            "tf",
            "df",
            (
                F.col("tf")
                * (F.log((F.col("n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0))
            ).alias("score"),
        )
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document: (id, term, score, rk).

    Corpus statistics (df, N) always come from the FULL input frame —
    filter the *output* ids, never the input, or idf silently shifts.
    """
    scored = tfidf_scores(docs, id_col=id_col, text_col=text_col)
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("id", "term", "score", "rk")
    )
