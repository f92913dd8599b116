"""Streaming ingest: file-source readStream + foreachBatch MERGE.

≅ the reference's POST /insert / POST /upsert loop
(src/router/handle/insert_index_handle.rs:14-61,
src/router/handle/upsert_handle.rs:11-44), re-expressed as Structured
Streaming micro-batches. Each micro-batch is MERGE-upserted into a
``Collection`` inside ``foreachBatch`` — the batch DML layer is reused
verbatim, so streaming and batch writes have identical semantics (one live
row per id; the reference's stale-HNSW-vector upsert bug stays fixed in
both paths).

At 100 TB the file source is swapped for Kafka/Kinesis by changing only
``read_*_stream``; the sink logic is source-agnostic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from vector_db_spark.operators.collections import Collection

VECTOR_STREAM_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
    ]
)

EVENT_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("user_id", LongType(), False),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def read_vector_stream(
    spark: SparkSession,
    path: str,
    schema: StructType = VECTOR_STREAM_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stream of (id, embedding) rows from parquet files arriving in
    ``path``. ``maxFilesPerTrigger`` bounds micro-batch size — the streaming
    equivalent of capping request batch size."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema: StructType = EVENT_STREAM_SCHEMA,
) -> DataFrame:
    """Stream of events-table rows (FIXTURES.md schema) from parquet files."""
    return spark.readStream.schema(schema).parquet(path)


def stream_upsert_into(
    stream: DataFrame,
    collection: Collection,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """MERGE every micro-batch into ``collection`` via foreachBatch.

    ``available_now=True`` drains everything currently in the source then
    stops (batch-like test/backfill mode); ``False`` runs continuously.
    Idempotence: foreachBatch can re-run a batch on recovery — MERGE on the
    id key makes the replay a no-op, which is exactly why the sink is an
    upsert and not a blind append.
    """

    def _merge(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        collection.upsert(batch)

    writer = stream.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_ann_search(
    stream_queries: DataFrame,
    index,
    k: int,
    checkpoint_dir: str,
    out_path: str,
    nprobe: int = 4,
    metric: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Serve a STREAM of query vectors against a persisted ANN index — the
    online half of the reference's search surface (POST /search,
    src/router/handle/search_index_handle.rs:46-102) on Structured
    Streaming: queries arrive continuously, the corpus-side index is a
    static cell-partitioned table.

    Every micro-batch runs the set-oriented probe (IvfIndex.search_batch:
    per-query cell pruning + window rerank — the corpus never shuffles),
    and lands its results under ``out_path/batch=<id>`` with overwrite —
    idempotent under foreachBatch replay, unlike a bare append. Per-query
    results are independent, so the union over batches is invariant to
    micro-batch boundaries: draining the same queries as ONE batch (or as
    a plain batch job) produces identical rows, which is the value-exact
    oracle.
    """

    def _serve(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        index.search_batch(batch, k, nprobe=nprobe, metric=metric).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_path, f"batch={batch_id}"))

    writer = (
        stream_queries.writeStream.foreachBatch(_serve)
        .option("checkpointLocation", checkpoint_dir)
    )
    trigger = (
        writer.trigger(availableNow=True)
        if available_now
        else writer.trigger(processingTime="5 seconds")
    )
    return trigger.start()


def stream_ivf_append(
    vec_stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous INDEX maintenance: each micro-batch of vectors is
    appended into a persisted IVF layout — the streaming closure of the
    reference's insert-into-live-index loop (POST /insert,
    src/router/handle/insert_index_handle.rs:14-61), which was the one
    lifecycle piece still batch-only.

    Per batch: reload the index head (centroids + meta — a few KB; the
    assignments frame is lazy, nothing scans), assign the batch to the
    frozen centroids with one Arrow GEMM, and append ONLY the new files
    into the cell-partitioned layout (IvfIndex.append(path=...) — which
    also invalidates persisted cell radii and advances the ip norm
    watermark, so range searches stay lossless mid-stream). The quantizer
    stays frozen until a scheduled retrain, exactly like the batch path;
    searches against the path see each batch as soon as its files commit.

    Idempotency caveat: a foreachBatch retry after a partial append can
    duplicate that batch's rows (parquet append is not transactional).
    The checkpoint makes replays rare; an exactly-once deployment swaps
    the parquet append for a Delta MERGE keyed on id — the call shape is
    unchanged.
    """
    from vector_db_spark.operators.ann import IvfIndex

    def _append(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        idx = IvfIndex.load(batch.sparkSession, index_path)
        idx.append(batch, path=index_path)

    writer = (
        vec_stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
    )
    trigger = (
        writer.trigger(availableNow=True)
        if available_now
        else writer.trigger(processingTime="5 seconds")
    )
    return trigger.start()


DELETE_STREAM_SCHEMA = StructType([StructField("id", LongType(), False)])


def stream_ivf_delete(
    id_stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous DELETE maintenance: each micro-batch of ids becomes a
    tombstone-manifest append against a persisted ANN layout — the
    streaming closure of the reference's remove path (faiss
    ``remove_vectors``, src/core/index/faiss_index.rs:131-138; usearch
    ``remove``, src/core/index/usearch_index.rs:87-93). Together with
    ``stream_ivf_append`` the full index DML lifecycle now runs under
    Structured Streaming.

    Each batch writes ONE small manifest file (operators/tombstones.py);
    the cell layout is never touched, and readers pick the deletes up on
    their next load. Tombstone application is idempotent by construction
    (probes anti-join a DISTINCT id set), so a foreachBatch replay after
    a crash re-appends rows that change nothing — stronger than the
    append path's at-least-once caveat. Compaction stays a scheduled
    vacuum()/retrain(), same as batch."""
    from vector_db_spark.operators.tombstones import tombstone_df, write_tombstones

    def _delete(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        write_tombstones(
            tombstone_df(batch.sparkSession, batch, batch.columns[0]),
            index_path,
        )

    writer = (
        id_stream.writeStream.foreachBatch(_delete)
        .option("checkpointLocation", checkpoint_dir)
    )
    trigger = (
        writer.trigger(availableNow=True)
        if available_now
        else writer.trigger(processingTime="5 seconds")
    )
    return trigger.start()


def stream_ivfopq_append(
    vec_stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous maintenance for the IVF-OPQ composition — the
    rotation-frozen streaming closure of `IvfOpqIndex.append`: each
    micro-batch reloads the index head (rotation + centroids + codebooks,
    a few KB of driver artifacts), rotates the batch through the frozen
    R (one Arrow GEMM), assigns to the frozen rotated-space cells,
    residual-encodes through the frozen codebooks, and appends ONLY the
    new files into the cell-partitioned codes layout. Same at-least-once
    caveat and retrain cadence as `stream_ivf_append`."""
    from vector_db_spark.operators.opq import IvfOpqIndex

    def _append(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        idx = IvfOpqIndex.load(batch.sparkSession, index_path)
        idx.append(batch, path=index_path)

    writer = (
        vec_stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
    )
    trigger = (
        writer.trigger(availableNow=True)
        if available_now
        else writer.trigger(processingTime="5 seconds")
    )
    return trigger.start()


def stream_opq_codes_append(
    vec_stream: DataFrame,
    quantizer_path: str,
    codes_path: str,
    checkpoint_dir: str,
    code_col: str = "opq_codes",
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous maintenance for a standalone OPQ (or, with the same
    call shape, PQ) codes table: each micro-batch encodes through the
    PERSISTED frozen quantizer (rotation + codebooks load once per batch,
    a few KB) and appends only its own files to the codes parquet — the
    codes table stays the M-bytes-per-row scan artifact while ingest
    runs. Searches reading ``codes_path`` see each batch as its files
    commit; rows far outside the training distribution quantize worse
    until the scheduled refit (the batch append contract)."""
    from vector_db_spark.operators.opq import OpqQuantizer

    def _append(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        oq = OpqQuantizer.load(quantizer_path)
        enc = oq.encode(batch, code_col=code_col).select(
            oq.pq.id_col, code_col
        )
        enc.write.mode("append").parquet(codes_path)

    writer = (
        vec_stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
    )
    trigger = (
        writer.trigger(availableNow=True)
        if available_now
        else writer.trigger(processingTime="5 seconds")
    )
    return trigger.start()


def stream_maxsim_pq_append(
    token_stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous maintenance for the compressed multi-vector family
    (MaxSimPqIndex, the ColBERTv2 residual-PQ PLAID): each micro-batch of
    (doc, embedding) token rows reloads the index head (token centroids +
    residual codebooks — driver-bounded artifacts), assigns to the frozen
    cells, residual-encodes through the frozen codebooks, and appends
    ONLY the new files into the cell-partitioned tokens+codes layout.
    Completes the Structured-Streaming maintenance matrix: every
    persisted family, single- and multi-vector, raw and compressed, now
    has a streaming append path with identical semantics to its batch
    append. Same at-least-once caveat and retrain cadence as
    `stream_ivf_append`."""
    from vector_db_spark.operators.late_interaction import MaxSimPqIndex

    def _append(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        idx = MaxSimPqIndex.load(batch.sparkSession, index_path)
        idx.append(batch, path=index_path)

    writer = (
        token_stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
    )
    trigger = (
        writer.trigger(availableNow=True)
        if available_now
        else writer.trigger(processingTime="5 seconds")
    )
    return trigger.start()
