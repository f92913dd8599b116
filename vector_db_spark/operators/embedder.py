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
    src = df.withColumn("__rid", F.monotonically_increasing_id())
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
