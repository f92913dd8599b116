"""Benchmark decontamination — word-n-gram overlap against an eval set.

A standard LLM training-data step outside the reference's surface (its
whole query API is the five handlers in
/root/reference/src/router/mod.rs:1-7): flag training documents that
share word n-grams with an evaluation ("benchmark") corpus so they can
be dropped before training.

Scale shape (100 TB corpus, small benchmark): the benchmark side reduces
to its distinct n-grams — a set bounded by eval-suite size, not corpus
size — and is broadcast, so the corpus is scanned exactly once, never
self-joined and never shuffled for the match itself. Per-doc distinct
grams come from one row-local higher-order-function pass (no explode of
raw token streams beyond the gram rows). The only corpus-sized shuffle
is the final groupBy(doc_id), pre-reduced map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_db_spark.functions.text import word_shingles


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document contamination report for `corpus` against `benchmark`.

    Returns one row per corpus document that shares at least one distinct
    word n-gram with the benchmark set: ``(id_col, n_grams INT,
    n_contaminated INT, contaminated_frac DOUBLE)`` where `n_grams` is
    the document's distinct-n-gram count. Documents with zero overlap are
    omitted (at 100 TB the clean corpus is the overwhelming majority —
    emitting it would be an output as large as the input; callers drop
    flagged ids with a broadcast anti-join).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    bench_grams = (
        benchmark.select(
            F.explode(word_shingles(F.col(text_col), n)).alias("gram")
        )
        .distinct()
    )
    doc_grams = corpus.select(
        F.col(id_col),
        F.size(word_shingles(F.col(text_col), n)).alias("n_grams"),
        F.explode(word_shingles(F.col(text_col), n)).alias("gram"),
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "gram", "left_semi")
        .groupBy(id_col, "n_grams")
        .agg(F.count("*").cast("int").alias("n_contaminated"))
        .select(
            id_col,
            "n_grams",
            "n_contaminated",
            (F.col("n_contaminated") / F.col("n_grams")).alias(
                "contaminated_frac"
            ),
        )
    )
