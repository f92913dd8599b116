"""Corpus-trained unigram language-model scoring.

The classic pretraining-pipeline quality signal (CCNet/RedPajama score
documents with a small LM over the corpus vocabulary): train token
frequencies once, then score every document row-locally. Re-expressed for
Spark's execution model:

- **Train** is one exploded-token ``groupBy`` with map-side partial
  aggregation — a single shuffle over the corpus — followed by a bounded
  ``TakeOrdered`` (top-V by count) collected to the driver. Driver state
  is O(V), independent of corpus size, exactly like the IVF quantizer
  sample (operators/ann.py).
- **Score** is zero-shuffle: the vocabulary becomes a literal map in a
  codegen'd expression; per-token log-probabilities are summed with an
  integer fold (micro-nats), so scoring parallelizes embarrassingly over
  any number of executors and adds NO exchange to the plan.

Log-probs are quantized to integer micro-nats (``floor(ln(p) · 1e6)``)
BEFORE aggregation: integer sums are associative, so the document score
is independent of token order, partitioning, and engine — the DuckDB
oracle reproduces it bit-for-bit, which a float fold could not guarantee
across libm implementations.

Reference anchor: the reference engine has no LM scoring (this is part of
the training-data-pipeline extension surface); the train/score split
mirrors its index build/search lifecycle (src/core/index_factory.rs).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_db_spark.functions.text import tokens
from vector_db_spark.operators.util import fan_out


class UnigramLm:
    """Frozen top-V unigram model: token -> count, plus the corpus total
    (ALL tokens, in and out of vocabulary)."""

    def __init__(self, vocab: dict[str, int], total_tokens: int):
        if total_tokens <= 0:
            raise ValueError("total_tokens must be positive")
        self.vocab = vocab
        self.total_tokens = total_tokens

    def logq_micro(self, count: int) -> int:
        """Integer micro-nat log-probability of a token seen ``count``
        times. OOV tokens use count=0 -> add-half smoothing (0.5/total),
        a floor below every in-vocab token."""
        p = (count if count > 0 else 0.5) / self.total_tokens
        return math.floor(math.log(p) * 1_000_000)


def train_unigram(
    df: DataFrame,
    text_col: str = "text",
    top_v: int = 256,
) -> UnigramLm:
    """One shuffle (token groupBy with partial agg), one bounded collect.

    The vocabulary keeps the ``top_v`` most frequent tokens with a total
    (count DESC, token ASC) order so ties are deterministic; ``total``
    counts EVERY token so probabilities are true corpus frequencies."""
    tok = fan_out(df).select(F.explode(tokens(F.col(text_col))).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    top = counts.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(top_v)
    rows = top.collect()
    total = tok.count()
    return UnigramLm({r.token: r.cnt for r in rows}, total)


def score_documents(
    df: DataFrame,
    lm: UnigramLm,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document LM statistics, all row-local (zero shuffle):

    - ``n_tokens``  — token count
    - ``oov_count`` — tokens outside the top-V vocabulary
    - ``logq_micro_sum`` — integer sum of per-token micro-nat log-probs
    - ``lm_score`` — mean nats/token (single exact division), the
      CCNet-style quality signal (higher = more typical of the corpus)

    Empty documents score NULL rather than dividing by zero (ANSI mode)."""
    lit_map = F.create_map(
        *[
            x
            for t, c in sorted(lm.vocab.items())
            for x in (F.lit(t), F.lit(lm.logq_micro(c)))
        ]
    )
    oov = F.lit(lm.logq_micro(0))
    toks = tokens(F.col(text_col))
    # try_element_at: NULL (not an ANSI error) for out-of-vocab keys
    logqs = F.transform(toks, lambda t: F.coalesce(F.try_element_at(lit_map, t), oov))
    n = F.size(toks)
    total = F.aggregate(
        logqs, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
    )
    n_oov = F.size(F.filter(logqs, lambda x: x == oov))
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        n_oov.alias("oov_count"),
        total.alias("logq_micro_sum"),
        F.when(
            n > 0,
            F.round(total.cast("double") / (n.cast("double") * 1_000_000.0), 6),
        ).alias("lm_score"),
    )


def perplexity_filter(
    scored: DataFrame,
    min_score: float,
    score_col: str = "lm_score",
) -> DataFrame:
    """Keep documents at or above the score floor (drop gibberish /
    far-from-corpus text). A pure pushable filter over the scored frame."""
    return scored.filter(F.col(score_col) >= F.lit(min_score))
