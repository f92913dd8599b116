"""Deterministic text → dense-vector embedding via the hashing trick
(feature hashing, Weinberger et al., ICML 2009 — the sklearn
HashingVectorizer recipe with a signed hash).

The engine's vector surface (kNN, every ANN family, dedup, MaxSim)
consumes `array<float>` columns; the fixtures ship pre-computed
embeddings, but a real corpus starts as TEXT. This operator closes the
loop with a model-free, engine-portable embedder: every token hashes to
one of ``dim`` buckets with a ±1 sign, a document's vector is the signed
bucket-count histogram (optionally L2-normalized) — the standard cheap
baseline for near-dup blocking, clustering, and retrieval experiments,
and the deterministic stand-in where a learned encoder would slot in at
a deployment (same schema, same downstream operators).

Engine-portability: the hash is md5 (the one hash Spark and DuckDB
share — the md5-lottery pattern of operators/sampling.py): bucket =
first 8 hex digits as int mod dim, sign = parity of the 9th digit, BOTH
from one md5 evaluation. Unnormalized vectors are signed INTEGER counts
— bit-exact across engines, so the oracle gate is an ordinary value
hash; normalization is one float divide per component at the end
(verified against NumPy in tests, not hash-compared).

Scale shape: tokenize → explode is row-local; ONE hash shuffle on
(doc, bucket) with map-side partial SUM (the vocabulary never
materializes — buckets are fixed-width); the dense array assembles
row-locally from a per-doc map. No UDFs anywhere — the whole pipeline
is native Catalyst expressions inside whole-stage codegen.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text: Column) -> Column:
    """Lowercased single-space split, empties dropped — deliberately the
    simplest split both engines express identically (regex whitespace
    classes differ across engines)."""
    return F.filter(F.split(F.lower(text), " "), lambda t: t != "")


def _char_grams(text: Column, n: int) -> Column:
    """All overlapping lowercased character n-grams (whitespace kept —
    crossing-the-space grams carry word-boundary signal, the
    HashingVectorizer 'char' analyzer's behavior). Texts shorter than
    ``n`` produce no grams."""
    s = F.lower(text)
    return F.when(
        F.length(s) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(s) - F.lit(n - 1)),
            lambda i: F.substring(s, i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def text_hash_embed(
    df: DataFrame,
    text_col: str = "text",
    dim: int = 64,
    *,
    out_col: str = "embedding",
    salt: str = "fh",
    normalize: bool = True,
    analyzer: str = "word",
    ngram: int = 3,
) -> DataFrame:
    """Append ``out_col`` (array<double>, length ``dim``): the signed
    hashed feature-count vector of ``text_col``.

    ``analyzer='word'`` hashes space-split tokens; ``'char'`` hashes all
    overlapping character ``ngram``-grams — the analyzer for scripts
    without whitespace word boundaries (and for typo-robust near-dup).
    ``normalize=False`` emits raw signed integer counts (engine-exact;
    the oracle gate's form). Documents with no features get the zero
    vector (normalization leaves zeros untouched — no 0/0).
    """
    if dim < 1:
        raise ValueError("dim must be >= 1")
    if analyzer not in ("word", "char"):
        raise ValueError(f"unknown analyzer {analyzer!r}; expected word|char")
    if analyzer == "char" and ngram < 1:
        raise ValueError("ngram must be >= 1")
    feats = (
        _tokens(F.col(text_col))
        if analyzer == "word"
        else _char_grams(F.col(text_col), ngram)
    )
    other = [c for c in df.columns]
    # Per-ROW key for the re-grouping: grouping by the payload columns
    # alone would silently collapse duplicate input rows into one output
    # row with summed counts — the operator's contract is append-a-column,
    # one output row per input row, whatever the payload.
    from vector_db_spark.operators.util import fan_out

    # hash+explode is the dense map stage — spread a narrow scan first
    src = fan_out(df).withColumn("__rid", F.monotonically_increasing_id())
    tok = src.select("__rid", *other, F.explode_outer(feats).alias("__tok"))
    h = F.md5(F.concat(F.col("__tok"), F.lit(salt)))
    bucket = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.lit(dim)
    ).alias("__bucket")
    sign = (
        F.when(F.conv(F.substring(h, 9, 1), 16, 10) % 2 == 0, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("__sign")
    )
    # explode_outer keeps token-less docs as a NULL-token row; its sign
    # must not contribute
    contrib = F.when(F.col("__tok").isNull(), F.lit(0)).otherwise(sign)
    per_bucket = (
        tok.select("__rid", *other, bucket, contrib.alias("__s"))
        .groupBy("__rid", *other, "__bucket")
        .agg(F.sum("__s").alias("__v"))
    )
    assembled = per_bucket.groupBy("__rid", *other).agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    F.coalesce(F.col("__bucket"), F.lit(0)).alias("k"),
                    F.col("__v").alias("v"),
                )
            )
        ).alias("__m")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("__m"), i.cast("long")), F.lit(0)
        ).cast("double"),
    )
    out = assembled.withColumn(out_col, vec).drop("__m", "__rid")
    if not normalize:
        return out
    norm = F.sqrt(
        F.aggregate(
            F.col(out_col), F.lit(0.0), lambda a, x: a + x * x
        )
    )
    return out.withColumn(
        out_col,
        F.when(
            norm > 0,
            F.transform(F.col(out_col), lambda x: x / norm),
        ).otherwise(F.col(out_col)),
    )


_FIT_HASH_DENOM = 1 << 20


def _fit_threshold(n: int, max_fit_rows: int) -> int:
    """Hash-bucket threshold for the bounded-fit prune: keep a document
    when ``pmod(xxhash64, 2²⁰) < thresh``. Ceil, never floor: int()
    truncation could zero the threshold (empty fit sample) once n exceeds
    (1.2·cap+1000)·2²⁰ — the 100 TB regime — and even a thresh of 1-2
    truncated from 2−ε halves the expected survivors below the cap.
    Ceiling keeps expected survivors ≥ the 1.2×cap+1000 target at every
    n (overshoot only feeds the TakeOrdered heap a few extra rows)."""
    frac = min(1.0, (1.2 * max_fit_rows + 1000) / n)
    return max(1, math.ceil(frac * _FIT_HASH_DENOM))


def _bounded_fit_input(
    df: DataFrame, text_col: str, max_fit_rows: int, seed: int
) -> DataFrame:
    """The Word2Vec fit frame, capped at ``max_fit_rows`` documents — the
    bounded-fit policy every quantizer training sample follows
    (`pq.sample_training_points`), made STABLE UNDER TASK RETRY: the
    selection is a pure function of the data, never of partition RNG
    state or row arrival order (``sample().limit()`` is neither —
    VERDICT r8). Each document keys by ``xxhash64(tokens, seed)``; a
    threshold filter prunes to ~1.2× the cap (+1000 absolute headroom, so
    undershooting the cap when the corpus exceeds it has negligible
    probability at any cap size), then the ``max_fit_rows`` SMALLEST
    hashes win via orderBy+limit — a per-partition TakeOrdered heap over
    the pruned survivors, ties broken by the token string so the boundary
    is deterministic too. Separated out so the cap and the determinism
    are directly property-testable (tests/test_embedder.py)."""
    if max_fit_rows < 1:
        raise ValueError("max_fit_rows must be >= 1")
    toks = df.select(_tokens(F.col(text_col)).alias("__toks"))
    n = toks.count()
    if n <= max_fit_rows:
        return toks
    key = F.concat_ws("\x1f", F.col("__toks"))
    h = F.xxhash64(key, F.lit(int(seed)))
    denom, thresh = _FIT_HASH_DENOM, _fit_threshold(n, max_fit_rows)
    return (
        toks.withColumn("__h", h)
        .filter(F.pmod(F.col("__h"), F.lit(denom)) < thresh)
        .orderBy(F.col("__h"), key)
        .limit(max_fit_rows)
        .drop("__h")
    )


def fit_word2vec(
    df: DataFrame,
    text_col: str = "text",
    dim: int = 64,
    *,
    seed: int = 42,
    min_count: int = 2,
    window: int = 5,
    max_iter: int = 1,
    step_size: float = 0.025,
    max_fit_rows: int = 100_000,
):
    """Fit an MLlib Word2Vec (skip-gram, Mikolov et al. 2013) over the
    corpus — the LEARNED rung above the hash embedder: co-occurrence
    geometry instead of lexical bucket counts, same array<float> output
    surface, so every downstream operator (kNN, the ANN families, dedup,
    MaxSim) consumes it unchanged.

    Determinism: MLlib's fit is hogwild-parallel across partitions, so
    the tokenized fit input is repartitioned to ONE partition before the
    fit — with a fixed seed the model is then bit-reproducible (the
    rows-only gate + recall pins depend on it). That single partition is
    why the fit input MUST be bounded: ``max_fit_rows`` caps it via a
    deterministic seeded-hash selection (`_bounded_fit_input`; stable
    under task retry, unlike RNG sampling), so at 100 TB the one fit
    task sees a fixed-size sample, never the corpus, and
    `word2vec_embed` applies the frozen model distributed over the full
    corpus.

    Returns the fitted `Word2VecModel`.
    """
    from pyspark.ml.feature import Word2Vec

    if dim < 1:
        raise ValueError("dim must be >= 1")
    toks = _bounded_fit_input(df, text_col, max_fit_rows, seed).repartition(1)
    w2v = Word2Vec(
        vectorSize=dim,
        minCount=min_count,
        windowSize=window,
        maxIter=max_iter,
        stepSize=step_size,
        seed=seed,
        inputCol="__toks",
        outputCol="__vec",
        numPartitions=1,
    )
    return w2v.fit(toks)


def word2vec_embed(
    df: DataFrame,
    model,
    text_col: str = "text",
    *,
    out_col: str = "embedding",
) -> DataFrame:
    """Append ``out_col`` (array<double>): the document vector under a
    fitted Word2Vec model — the sum of its in-vocab tokens' word vectors
    divided by the TOTAL token count (Word2VecModel.transform's combiner;
    OOV tokens contribute zero but count in the denominator, token-less
    documents get the zero vector). The model broadcast is
    the vocab table (driver-bounded); the transform itself is one
    distributed map — no shuffle."""
    from pyspark.ml.functions import vector_to_array

    out = model.setInputCol("__toks").setOutputCol("__vec").transform(
        df.withColumn("__toks", _tokens(F.col(text_col)))
    )
    return out.withColumn(
        out_col, vector_to_array(F.col("__vec")).cast("array<double>")
    ).drop("__toks", "__vec")
