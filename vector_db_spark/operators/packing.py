"""Sequence packing — assign documents to fixed-token training sequences.

The last step of a training-data pipeline: concatenate documents (in a
deterministic order) and cut the stream into ``max_tokens``-sized packs,
recording for each document which pack it starts in and at what offset.
The reference has no analogue (it never computes on text,
src/db/scalar_storage.rs:10-14); this is north-star territory.

Spark mapping — the "chunked cumulative sum" formulation:
- documents are hash-bucketed by md5(id ‖ salt) (`sampling.hash_bucket`,
  the engine-portable hash), giving B independent streams;
- within a bucket, docs are ordered by id and a running token total is a
  window ``sum() over (partition by bucket order by id)``;
- a doc's pack is ``floor((cum - n_tokens) / max_tokens)`` — the chunk its
  first token lands in — and its offset is the remainder.

Scale: ONE shuffle (hash partition by bucket + in-partition sort); bucket
count is the parallelism knob, so 100 TB packs as B independent sorted
streams with no global sort and no driver state. Deterministic under any
input partitioning (bucket and order derive from ids alone).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_db_spark.functions.text import token_count, tokens
from vector_db_spark.operators.sampling import hash_bucket
from vector_db_spark.operators.util import fan_out


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    buckets: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    count_col: str | None = None,
    salt: str = "pack",
) -> DataFrame:
    """→ (id, bucket, n_tokens, pack_id, start_off): the pack each doc
    starts in. ``count_col`` supplies precomputed token counts; otherwise
    whitespace tokens of ``text_col`` are counted."""
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    n: Column = F.col(count_col) if count_col else token_count(F.col(text_col))
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.col("cum_tokens") - F.col("n_tokens")
    return (
        df.select(
            F.col(id_col),
            hash_bucket(F.col(id_col), salt, buckets).alias("bucket"),
            n.cast("long").alias("n_tokens"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .select(
            id_col,
            "bucket",
            "n_tokens",
            F.floor(start / max_tokens).alias("pack_id"),
            (start % max_tokens).alias("start_off"),
        )
    )


def skipgram_pairs(
    df: DataFrame,
    window: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Word2vec-style (center, context) pair counts — the training-data
    prep for embedding models (Mikolov et al. 2013): every token pairs
    with its neighbors at distance 1..window either side, counted
    corpus-wide.

    Pair GENERATION is row-local (nested transforms over the token array
    — no self-join, no shuffle to form pairs); the only exchange is the
    final (center, context) groupBy with map-side combine. At 100 TB this
    is one counting shuffle whose key space is bounded by vocab², same
    shape as the bigram LM trainer.

    Returns (center, context, n) — symmetric: if x is in y's window, y is
    in x's.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    offsets = [d for d in range(-window, window + 1) if d != 0]
    pair_arr = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.filter(
                F.array(
                    *[
                        F.when(
                            ((i + d) >= 1) & ((i + d) <= n),
                            F.struct(
                                F.element_at(toks, i).alias("center"),
                                F.element_at(toks, i + d).alias("context"),
                            ),
                        )
                        for d in offsets
                    ]
                ),
                lambda s: s.isNotNull(),
            ),
        )
    )
    staged = fan_out(df).select(F.explode(pair_arr).alias("p"))
    return (
        staged.groupBy(F.col("p.center").alias("center"), F.col("p.context").alias("context"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RAG-style document chunking: overlapping fixed-width token windows
    — the retrieval-corpus prep step (embed each chunk, not the doc).
    Chunk j covers tokens [j·step+1, j·step+chunk] with
    step = chunk − overlap; the count formula ceil(max(0, n−chunk)/step)+1
    yields exactly the windows needed to cover every token once. Pure
    row-local transform + posexplode — zero shuffles; at 100 TB this is a
    map-only stage that chains straight into the embedding UDF."""
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must be in [0, chunk_tokens)")
    step = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = (
        F.ceil(F.greatest(n - chunk_tokens, F.lit(0)) / F.lit(step)) + 1
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda j: F.struct(
            j.cast("int").alias("chunk_id"),
            F.array_join(F.slice(toks, j * step + 1, chunk_tokens), " ").alias(
                "chunk_text"
            ),
            F.size(F.slice(toks, j * step + 1, chunk_tokens)).alias("chunk_len"),
        ),
    )
    return (
        df.filter(n > 0)
        .select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(id_col, "c.chunk_id", "c.chunk_text", "c.chunk_len")
    )
