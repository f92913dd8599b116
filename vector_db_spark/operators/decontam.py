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

import numpy as np
import pandas as pd  # module scope: pandas_udf resolves PEP 563 hints lazily
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


def semantic_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    bench_id_col: str | None = None,
    bench_vec_col: str | None = None,
) -> DataFrame:
    """Embedding-space contamination: flag corpus documents whose vector
    is cosine-``threshold``-close to ANY benchmark vector — the semantic
    complement of ``ngram_contamination`` (catches paraphrased or
    reformatted eval leakage n-grams miss; SemDeDup-style, Abbas et al.
    2023, applied cross-corpus).

    Returns ``(id_col, bench_id BIGINT, cosine DOUBLE)`` — each flagged
    document with its best-matching benchmark item (ties broken by the
    smallest benchmark id). Clean documents are omitted, same contract
    and same scale shape as the n-gram variant: the benchmark side is
    eval-suite-bounded and collected into one L2-normalized matrix
    closed over by an Arrow-batched pandas_udf, so the corpus is scanned
    exactly once with a per-batch GEMM and NO shuffle anywhere — the
    output filter is narrow.
    """
    if not -1.0 <= threshold <= 1.0:
        raise ValueError(f"threshold must be in [-1, 1], got {threshold}")
    bid = bench_id_col or id_col
    bvec = bench_vec_col or vec_col
    rows = benchmark.select(bid, bvec).orderBy(bid).collect()
    if not rows:
        raise ValueError("benchmark is empty")
    bench_ids = np.asarray([int(r[0]) for r in rows], dtype=np.int64)
    bmat = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    bnorm = np.linalg.norm(bmat, axis=1)
    if (bnorm == 0).any():
        raise ValueError("benchmark contains a zero vector")
    bmat = (bmat / bnorm[:, None]).T.copy()  # (dim, n_bench)

    @F.pandas_udf("struct<bench_id: bigint, cosine: double>")
    def _best(vecs: pd.Series) -> pd.DataFrame:
        v = np.stack([np.asarray(x, dtype=np.float64) for x in vecs])
        # Zero CORPUS vectors score cosine 0.0 explicitly (a zero vector
        # is similar to nothing) instead of dividing by the zero norm —
        # which produced NaNs (plus numpy warnings) that the >= threshold
        # filter dropped silently (ADVICE r9). Benchmark zeros stay a
        # hard error above: a contaminated-AGAINST set must be sound.
        vnorm = np.linalg.norm(v, axis=1)
        sims = (v / np.where(vnorm == 0.0, 1.0, vnorm)[:, None]) @ bmat
        # argmax returns the FIRST max -> smallest bench id (pre-sorted)
        j = sims.argmax(axis=1)
        return pd.DataFrame(
            {
                "bench_id": bench_ids[j],
                "cosine": sims[np.arange(len(v)), j],
            }
        )

    return (
        corpus.select(F.col(id_col), _best(F.col(vec_col)).alias("m"))
        .select(id_col, F.col("m.bench_id"), F.col("m.cosine"))
        .filter(F.col("cosine") >= float(threshold))
    )
