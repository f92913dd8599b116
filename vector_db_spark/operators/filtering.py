"""Rule-pipeline document filtering (the C4/Gopher-style keep/drop stage).

A filter pipeline is an ordered list of named rejection rules; a document's
verdict is the FIRST rule it trips, or ``kept``. Expressing the verdict as
one CASE expression (instead of chained DataFrame filters) keeps the whole
stage a single row-local codegen'd projection — no shuffle, no multiple
passes, and the per-rule rejection counts come from one tiny groupBy on
the verdict column.

Rules are deliberately integer/rational arithmetic (``max_run * 10 > 3*n``
rather than ``max_run/n > 0.3``) so verdicts are bit-exact across engines
and the whole filter stage is oracle-verifiable — float thresholds on
divided fractions would make keep/drop decisions rounding-dependent.

This is extension surface beyond the reference engine (which stores and
searches documents but has no corpus-curation stage); the signal set
follows the public C4 (Raffel et al. 2020) and Gopher (Rae et al. 2021)
filtering recipes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_db_spark.functions.text import (
    _dup_occurrences,
    _max_run,
    tokens,
    word_ngrams,
)


def first_failure(rules: list[tuple[str, Column]], kept: str = "kept") -> Column:
    """CASE over (name, is_bad) pairs in order; ``kept`` if none trip."""
    if not rules:
        raise ValueError("at least one rule required")
    verdict = F.lit(kept)
    for name, bad in reversed(rules):
        verdict = F.when(bad, F.lit(name)).otherwise(verdict)
    return verdict


def c4_rules(
    text_col: str = "text",
    min_tokens: int = 50,
    max_tokens: int = 2000,
    min_avg_len: int = 2,
    max_avg_len: int = 10,
    top_word_pct: int = 30,
    dup_gram_pct: int = 20,
    toks: Column | None = None,
    grams: Column | None = None,
) -> list[tuple[str, Column]]:
    """The C4/Gopher signal set on a whitespace corpus, all integer
    comparisons (percent thresholds scaled by 100, averages compared as
    ``sum vs bound*n``):

    - ``too_short`` / ``too_long`` — token-count bounds
    - ``word_len`` — mean token length outside [min_avg_len, max_avg_len]
    - ``top_word`` — most frequent token exceeds ``top_word_pct``% of doc
    - ``dup_gram`` — duplicate-2-gram mass exceeds ``dup_gram_pct``%

    ``toks``/``grams`` accept PRE-STAGED (already sorted, for grams)
    array columns — filter_verdicts stages them so the CASE's many rule
    references evaluate the tokenize/sort work once per row instead of
    once per rule (the repo-wide stage-arrays-once rule). NULL text
    coalesces to zero tokens, so it fails ``too_short`` — a NULL array
    made every rule condition NULL and the garbage doc sailed through
    as 'kept'."""
    if toks is None:
        toks = F.coalesce(
            tokens(F.col(text_col)), F.array().cast("array<string>")
        )
    n = F.size(toks)
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t).cast("long")
    )
    max_run = _max_run(F.array_sort(toks))
    if grams is None:
        grams = F.array_sort(word_ngrams(F.col(text_col), 2))
    n_grams = F.size(grams)
    # duplicate-gram occurrences: the shared sorted run-length fold
    dup_occ = _dup_occurrences(grams)
    return [
        ("too_short", n < min_tokens),
        ("too_long", n > max_tokens),
        (
            "word_len",
            (sum_len < min_avg_len * n.cast("long"))
            | (sum_len > max_avg_len * n.cast("long")),
        ),
        ("top_word", max_run * 100 > top_word_pct * n),
        ("dup_gram", dup_occ * 100 > dup_gram_pct * n_grams),
    ]


def filter_verdicts(
    df: DataFrame,
    rules: list[tuple[str, Column]] | None = None,
    text_col: str = "text",
    verdict_col: str = "verdict",
) -> DataFrame:
    """Document frame + verdict column (row-local, zero shuffle). The
    default rule set evaluates over STAGED token/gram arrays — one
    tokenize + two sorts per row, not one per rule reference."""
    if rules is not None:
        return df.withColumn(verdict_col, first_failure(rules))
    staged = df.select(
        "*",
        F.coalesce(
            tokens(F.col(text_col)), F.array().cast("array<string>")
        ).alias("__toks"),
        F.array_sort(word_ngrams(F.col(text_col), 2)).alias("__grams"),
    )
    v = first_failure(
        c4_rules(text_col, toks=F.col("__toks"), grams=F.col("__grams"))
    )
    return staged.withColumn(verdict_col, v).drop("__toks", "__grams")


def filter_summary(
    df: DataFrame,
    rules: list[tuple[str, Column]] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Per-verdict document counts — the pipeline health dashboard number.
    One tiny groupBy over the verdict projection."""
    return (
        filter_verdicts(df, rules, text_col)
        .groupBy("verdict")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def keep_documents(
    df: DataFrame,
    rules: list[tuple[str, Column]] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Only the surviving documents (verdict column dropped): the actual
    corpus-curation output. A pushable filter — at 100 TB this fuses into
    the scan stage of whatever consumes it."""
    if rules is not None:
        return df.filter(first_failure(rules) == "kept")
    out = filter_verdicts(df, None, text_col)
    return out.filter(F.col("verdict") == "kept").drop("verdict")
