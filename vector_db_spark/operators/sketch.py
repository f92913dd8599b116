"""Two-pass EXACT heavy hitters via mergeable Misra-Gries summaries.

The existing ``heavy_hitter_tokens`` query aggregates every distinct
token (one full hash shuffle over the whole vocabulary). At 100 TB the
vocabulary itself is the problem — the shuffle carries billions of
(token, partial-count) rows to find a handful of frequent ones. The
classic fix (Misra & Gries 1982; mergeable-summaries form of Agarwal et
al. 2012) finds the answer in two bounded passes and ZERO wide shuffles
of the full vocabulary:

pass 1 — per-partition Misra-Gries summaries with k counters
  (``mapInPandas``; per-batch exact ``value_counts`` merged
  sum-then-prune, which IS a valid MG merge). Guarantee: any token with
  partition count > n_p/(k+1) keeps a positive counter, and any token
  with GLOBAL count > n/(k+1) exceeds that bar in at least one
  partition (pigeonhole) — so the union of summaries is a candidate set
  with NO false negatives for the threshold n/k. The union is ≤ k rows
  per partition, collected nowhere: it stays a DataFrame and broadcasts.

pass 2 — exact counts for candidates only: the token stream semi-joins
  the broadcast candidate set, then aggregates a bounded key space.
  False positives fall out of the final threshold filter; the counts
  that survive are EXACT, so the result is oracle-checkable bit-for-bit
  (threshold compare as ``count · k > n`` — integer arithmetic, no
  division).

The Python stage sees one narrow string column and does vectorized
``value_counts`` per Arrow batch — no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(col: Column) -> Column:
    # single-space split, empties dropped (tokenization parity contract,
    # pipeline_queries.py:6-9)
    return F.filter(F.split(col, " "), lambda t: t != "")


def _mg_partition(k: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: pd.Series | None = None
        for b in batches:
            vc = b["token"].value_counts()
            counts = vc if counts is None else counts.add(vc, fill_value=0)
            if len(counts) > k:
                # mergeable-summaries prune: subtract the (k+1)-th
                # largest count from everything, keep positives — a
                # batched MG decrement (each unit of subtraction hits
                # ≥ k+1 distinct tokens, preserving the error bound)
                kth = counts.nlargest(k + 1).iloc[-1]
                counts = counts - kth
                counts = counts[counts > 0]
        if counts is not None and len(counts):
            yield pd.DataFrame({"token": counts.index.astype(str)})

    return fn


def heavy_hitters(
    docs: DataFrame, k: int, text_col: str = "text"
) -> DataFrame:
    """All tokens with exact count · k > total tokens: (token, n).

    ``k`` is both the frequency threshold (report above n/k) and the
    per-partition counter budget — candidates are bounded by
    k × #partitions regardless of vocabulary size.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    tok = docs.select(F.explode(_tokens(F.col(text_col))).alias("token"))
    cand = tok.mapInPandas(_mg_partition(k), schema="token string").distinct()
    total = tok.agg(F.count(F.lit(1)).alias("total"))
    return (
        tok.join(F.broadcast(cand), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n") * F.lit(k) > F.col("total"))
        .select("token", "n")
    )
