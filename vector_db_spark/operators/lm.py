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

from pyspark.sql import DataFrame
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
    counts EVERY token so probabilities are true corpus frequencies.

    ``total`` is Σcnt over the aggregated token table — NOT a second
    tokenize-and-count pass over the corpus: the counts frame is
    checkpointed so the top-V collect and the total derive from ONE
    corpus-scale shuffle (at 100 TB the difference is a full extra scan)."""
    tok = fan_out(df).select(F.explode(tokens(F.col(text_col))).alias("token"))
    counts = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(top_v)
    rows = top.collect()
    total = counts.agg(F.sum("cnt")).head()[0]
    if total is None:  # empty corpus / all-whitespace texts
        raise ValueError("cannot train a unigram LM on a corpus with no tokens")
    return UnigramLm({r.token: r.cnt for r in rows}, int(total))


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

    Empty documents score NULL rather than dividing by zero (ANSI mode).

    Deliberately does NOT repartition (plan-pinned zero-shuffle): scoring
    composes into whatever stage produced the documents. A few-file
    corpus should be fanned out by the CALLER before scoring (the
    registered queries do; no-op at real scale)."""
    lit_map = F.create_map(
        *[
            x
            for t, c in sorted(lm.vocab.items())
            for x in (F.lit(t), F.lit(lm.logq_micro(c)))
        ]
    )
    oov = F.lit(lm.logq_micro(0))
    # STAGE the token and log-prob arrays once (the repo-wide
    # stage-arrays-once rule, same as the bigram scorer): n/total/n_oov
    # all reference the staged attributes, so the split + map-probe chain
    # evaluates once per row instead of once per consumer —
    # CollapseProject declines to inline expensive multiply-referenced
    # expressions
    staged = df.select(
        F.col(id_col),
        tokens(F.col(text_col)).alias("__toks"),
    ).select(
        F.col(id_col),
        "__toks",
        # try_element_at: NULL (not an ANSI error) for out-of-vocab keys
        F.transform(
            F.col("__toks"),
            lambda t: F.coalesce(F.try_element_at(lit_map, t), oov),
        ).alias("__lq"),
    )
    logqs = F.col("__lq")
    n = F.size("__toks")
    total = F.aggregate(
        logqs, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
    )
    n_oov = F.size(F.filter(logqs, lambda x: x == oov))
    return staged.select(
        F.col(id_col),
        n.alias("n_tokens"),
        n_oov.alias("oov_count"),
        total.alias("logq_micro_sum"),
        F.when(
            n > 0,
            # portable half-up at the 6th decimal: floor(mean_micro + 0.5)
            # is the SAME op on every engine, where round() ties differ
            # (Spark HALF_UP vs DuckDB HALF_AWAY disagree on negatives —
            # surfaced by 4 tie documents at sf0.1)
            F.floor(total.cast("double") / n.cast("double") + F.lit(0.5))
            / 1_000_000.0,
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


LQ_BACKOFF = math.floor(math.log(0.4) * 1_000_000)  # stupid-backoff penalty


class BigramLm:
    """Frozen bigram model with stupid backoff over a ``UnigramLm``.

    p(b|a) = cnt(ab)/ctx(a) for the top-B bigrams; unseen bigrams back
    off to 0.4·p_uni(b). Quantization is DECOMPOSED so integer sums stay
    engine-exact: the backoff term is ``LQ_BACKOFF + uni_lq(b)`` (two
    separately-floored micro-nat integers added), never
    ``floor(ln(0.4·p))`` — that is the model definition, and the SQL
    oracle implements the identical decomposition."""

    def __init__(self, uni: UnigramLm, bigram_lq: dict[str, int]):
        self.uni = uni
        self.bigram_lq = bigram_lq  # "a b" -> micro-nat log p(b|a)


def train_bigram(
    df: DataFrame,
    text_col: str = "text",
    top_v: int = 16,
    top_b: int = 32,
) -> BigramLm:
    """Two token-granularity shuffles (bigram groupBy, context groupBy),
    each with map-side partial aggregation, then two bounded TakeOrdered
    collects — driver state is O(V + B), corpus-size-independent.
    Bigrams are adjacent-token pairs WITHIN a document (no cross-doc
    pairs); the context count of ``a`` is how often ``a`` starts a bigram
    (= occurrences excluding document-final positions)."""
    uni = train_unigram(df, text_col=text_col, top_v=top_v)
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    pair_arr = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pairs = fan_out(df).select(F.explode(pair_arr).alias("bigram"))
    # ONE corpus-scale shuffle: every downstream number derives from the
    # per-bigram counts (ctx(a) = Σ cnt over bigrams starting with a), so
    # the context aggregation runs over the distinct-bigram table, not a
    # second pass over the exploded corpus.
    bcounts = pairs.groupBy("bigram").agg(F.count(F.lit(1)).alias("cnt"))
    bcounts = bcounts.localCheckpoint(eager=False)
    top = bcounts.orderBy(
        F.col("cnt").desc(), F.col("bigram").asc()
    ).limit(top_b)
    ctx = (
        bcounts.groupBy(
            F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("t1")
        )
        .agg(F.sum("cnt").alias("ctx_cnt"))
    )
    rows = (
        top.withColumn("t1", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)))
        .join(ctx, "t1")
        .select("bigram", "cnt", "ctx_cnt")
        .collect()
    )
    lq = {
        r.bigram: math.floor(math.log(r.cnt / r.ctx_cnt) * 1_000_000) for r in rows
    }
    return BigramLm(uni, lq)


def score_documents_bigram(
    df: DataFrame,
    lm: BigramLm,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Row-local bigram scoring, zero shuffle: the first token scores its
    unigram micro-nats, every later token scores its bigram micro-nats or
    the decomposed backoff. The raw bigram-lookup array is STAGED as a
    column so the map probes evaluate once and hits/sums both read the
    staged attribute (the repo-wide stage-arrays-once rule). Returns
    ``n_tokens``, ``bigram_hits``, the integer ``logq_micro_sum`` and the
    mean-nats ``lm_score`` — all order-free exact, like the unigram path.
    Zero-shuffle like score_documents: callers fan out few-file corpora
    (the registered queries do)."""
    uni_map = F.create_map(
        *[
            x
            for t, c in sorted(lm.uni.vocab.items())
            for x in (F.lit(t), F.lit(lm.uni.logq_micro(c)))
        ]
    )
    oov = F.lit(lm.uni.logq_micro(0))
    bi_map = (
        F.create_map(
            *[
                x
                for b, q in sorted(lm.bigram_lq.items())
                for x in (F.lit(b), F.lit(q))
            ]
        )
        if lm.bigram_lq
        else None
    )

    def uni_lq(tcol):
        return F.coalesce(F.try_element_at(uni_map, tcol), oov)

    toks0 = tokens(F.col(text_col))
    n0 = F.size(toks0)
    raw = (
        F.when(
            n0 >= 2,
            F.transform(
                F.sequence(F.lit(2), n0),
                lambda i: F.try_element_at(
                    bi_map,
                    F.concat_ws(
                        " ", F.element_at(toks0, i - 1), F.element_at(toks0, i)
                    ),
                ),
            ),
        ).otherwise(F.array().cast("array<bigint>"))
        if bi_map is not None
        else F.array().cast("array<bigint>")
    )
    staged = df.select(F.col(id_col), toks0.alias("__toks"), raw.alias("__bi"))
    toks = F.col("__toks")
    n = F.size(toks)
    # align __bi[j] (pair ending at token j+1) with its second token for
    # the backoff arm; coalesce resolves hit vs LQ_BACKOFF + uni in one pass
    rest = F.zip_with(
        F.col("__bi"),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda b, t: F.coalesce(b, F.lit(LQ_BACKOFF) + uni_lq(t)),
    )
    rest_sum = F.aggregate(
        rest, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
    )
    hits = F.size(F.filter(F.col("__bi"), lambda x: x.isNotNull()))
    total = F.when(n > 0, uni_lq(F.element_at(toks, 1)).cast("long") + rest_sum)
    return staged.select(
        F.col(id_col),
        n.alias("n_tokens"),
        hits.cast("long").alias("bigram_hits"),
        F.coalesce(total, F.lit(0).cast("long")).alias("logq_micro_sum"),
        F.when(
            n > 0,
            # portable half-up at the 6th decimal: floor(mean_micro + 0.5)
            # is the SAME op on every engine, where round() ties differ
            # (Spark HALF_UP vs DuckDB HALF_AWAY disagree on negatives —
            # surfaced by 4 tie documents at sf0.1)
            F.floor(total.cast("double") / n.cast("double") + F.lit(0.5))
            / 1_000_000.0,
        ).alias("lm_score"),
    )


def bigram_pmi(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 3,
    top_n: int = 20,
) -> DataFrame:
    """Collocation mining: top-N adjacent-pair collocations by pointwise
    mutual information, PMI(a,b) = ln( p(ab) / (p(a)·p(b)) ).

    Fully distributed: one bigram groupBy, one token groupBy, two
    equi-joins to attach the marginals, then a TakeOrdered cut — no
    driver-side frequency tables (the vocabulary is unbounded). The PMI
    quotient is assembled with a PINNED double operation order
    ``(((cnt_ab·T)/P)·T)/cnt_a/cnt_b`` (T tokens, P pairs) and quantized
    to floor-micro-nats, so the SQL oracle reproduces the ranking and the
    scores bit-for-bit. ``min_count`` suppresses the classic PMI
    singleton-pair artifact; ties break (pmi DESC, bigram ASC).
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    pair_arr = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    staged = fan_out(df)
    pairs = staged.select(F.explode(pair_arr).alias("bigram"))
    tok = staged.select(F.explode(toks).alias("token"))
    # totals derive from the aggregated count tables (tiny) — never a
    # second pass over the exploded corpus
    bcnt = pairs.groupBy("bigram").agg(F.count(F.lit(1)).alias("n_pair"))
    tcnt = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n_tok"))
    bcnt = bcnt.localCheckpoint(eager=False)
    tcnt = tcnt.localCheckpoint(eager=False)
    total_tokens = int(tcnt.agg(F.sum("n_tok")).head()[0] or 0)
    total_pairs = int(bcnt.agg(F.sum("n_pair")).head()[0] or 0)
    if total_pairs == 0:
        raise ValueError("corpus has no bigrams")
    t1 = F.split_part(F.col("bigram"), F.lit(" "), F.lit(1))
    t2 = F.split_part(F.col("bigram"), F.lit(" "), F.lit(2))
    joined = (
        bcnt.filter(F.col("n_pair") >= min_count)
        .withColumn("t1", t1)
        .withColumn("t2", t2)
        .join(tcnt.withColumnRenamed("token", "t1").withColumnRenamed("n_tok", "n_first"), "t1")
        .join(tcnt.withColumnRenamed("token", "t2").withColumnRenamed("n_tok", "n_second"), "t2")
    )
    quotient = (
        (
            (
                (F.col("n_pair").cast("double") * F.lit(float(total_tokens)))
                / F.lit(float(total_pairs))
            )
            * F.lit(float(total_tokens))
        )
        / F.col("n_first").cast("double")
    ) / F.col("n_second").cast("double")
    scored = joined.withColumn(
        "pmi_micro", F.floor(F.ln(quotient) * 1_000_000).cast("long")
    )
    return (
        scored.orderBy(F.col("pmi_micro").desc(), F.col("bigram").asc())
        .limit(top_n)
        .select(
            "bigram",
            "n_pair",
            "n_first",
            "n_second",
            "pmi_micro",
            F.round(F.col("pmi_micro").cast("double") / 1_000_000.0, 6).alias("pmi"),
        )
    )
