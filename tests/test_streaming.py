"""Streaming-module tests: cross-micro-batch semantics (checkpoint resume,
stateful dedup across batches, window parity streaming-vs-batch) that the
oracle queries — which drain in one batch — don't exercise."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from vector_db_spark.operators.collections import CollectionCatalog
from vector_db_spark.sources.fixtures import load_table
from vector_db_spark.streaming import (
    read_event_stream,
    read_vector_stream,
    stream_upsert_into,
    streaming_dedup,
    tumbling_aggregate,
)

SF = "/root/testdata/sf0.001"
TIMEOUT_MS = 120_000


def _drain(stream_df, name, mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(TIMEOUT_MS)
    return stream_df.sparkSession.table(name)


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF, "events")


def test_stream_tumbling_matches_batch(spark, events):
    stage = tempfile.mkdtemp()
    events.write.mode("append").parquet(stage)
    got = _drain(tumbling_aggregate(read_event_stream(spark, stage)), "t1", "complete")
    want = tumbling_aggregate(events)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_streaming_dedup_across_batches(spark, events):
    """Duplicates arriving in a LATER micro-batch (same checkpoint) are
    still dropped — state survives the restart."""
    stage = tempfile.mkdtemp()
    ckpt = tempfile.mkdtemp()
    sink = tempfile.mkdtemp()
    events.write.mode("append").parquet(stage)

    def run():
        # memory sink can't recover a checkpoint; the file sink can.
        deduped = streaming_dedup(
            read_event_stream(spark, stage), key_cols=("event_id",), watermark="365 days"
        )
        q = (
            deduped.writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(TIMEOUT_MS)

    run()
    n_first = spark.read.parquet(sink).count()
    events.write.mode("append").parquet(stage)  # same rows again, new batch
    run()
    n_after = spark.read.parquet(sink).count()
    assert n_first == events.count()
    assert n_after == n_first  # nothing new emitted: all duplicates


def test_stream_upsert_idempotent_replay(spark):
    """Re-running a drained query on the same checkpoint processes nothing
    and the collection version/content is unchanged (foreachBatch + MERGE
    replay safety)."""
    emb = load_table(spark, SF, "embeddings")
    base = emb.select((F.col("vec_id") + 1).alias("id"), "embedding")
    stage, ckpt = tempfile.mkdtemp(), tempfile.mkdtemp()
    cat = CollectionCatalog(spark, tempfile.mkdtemp())
    coll = cat.create("replay", dim=64)
    base.write.mode("append").parquet(stage)

    q = stream_upsert_into(read_vector_stream(spark, stage), coll, ckpt)
    assert q.awaitTermination(TIMEOUT_MS)
    v1, n1 = coll.info.version, coll.scan().count()

    q = stream_upsert_into(read_vector_stream(spark, stage), coll, ckpt)
    assert q.awaitTermination(TIMEOUT_MS)
    assert coll.info.version == v1  # no batch ran
    assert coll.scan().count() == n1


def test_stream_upsert_merges_not_appends(spark):
    emb = load_table(spark, SF, "embeddings")
    base = emb.select((F.col("vec_id") + 1).alias("id"), "embedding").limit(50)
    stage, ckpt = tempfile.mkdtemp(), tempfile.mkdtemp()
    cat = CollectionCatalog(spark, tempfile.mkdtemp())
    coll = cat.create("m", dim=64)
    base.write.mode("append").parquet(stage)
    q = stream_upsert_into(read_vector_stream(spark, stage), coll, ckpt)
    assert q.awaitTermination(TIMEOUT_MS)

    base.select(
        "id", F.transform("embedding", lambda x: (x * 3).cast("float")).alias("embedding")
    ).write.mode("append").parquet(stage)
    q = stream_upsert_into(read_vector_stream(spark, stage), coll, ckpt)
    assert q.awaitTermination(TIMEOUT_MS)

    assert coll.scan().count() == 50  # merged, not appended


def test_quota_sample_state_survives_batches(spark, events):
    """Key quotas must hold ACROSS micro-batches: replaying the same data
    in a second batch admits nothing new."""
    import tempfile

    from vector_db_spark.streaming.ingest import read_event_stream
    from vector_db_spark.streaming.stateful import quota_sample

    stage, ckpt, sink = tempfile.mkdtemp(), tempfile.mkdtemp(), tempfile.mkdtemp()
    events.write.mode("append").parquet(stage)

    def run():
        kept = quota_sample(
            read_event_stream(spark, stage).select("event_id", "user_id", "value"),
            key_cols=("user_id",),
            quota=3,
            order_col="event_id",
        )
        q = (
            kept.writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(TIMEOUT_MS)

    run()
    first = spark.read.parquet(sink)
    per_user = first.groupBy("user_id").count().collect()
    assert all(r["count"] <= 3 for r in per_user)
    n1 = first.count()

    events.write.mode("append").parquet(stage)  # same events again
    run()
    assert spark.read.parquet(sink).count() == n1  # quotas already filled


def test_quota_sample_batch_mode_matches_window_rank(spark, events):
    from pyspark.sql import Window

    from vector_db_spark.streaming.stateful import quota_sample

    got = quota_sample(
        events.select("event_id", "user_id"), key_cols=("user_id",), quota=5,
        order_col="event_id",
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    want = (
        events.select("event_id", "user_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_stream_stream_interval_join_matches_batch(spark, events):
    from vector_db_spark.streaming.windows import stream_stream_interval_join

    stage = tempfile.mkdtemp(prefix="ssj_")
    events.write.mode("append").parquet(stage)
    mk = lambda df, et: df.filter(F.col("event_type") == et).select(
        "user_id", "event_id", "ts"
    )
    stream = read_event_stream(spark, stage)
    got = _drain(
        stream_stream_interval_join(
            mk(stream, "click"), mk(stream, "purchase"), key="user_id"
        ),
        "ssj1",
        "append",
    )
    want = stream_stream_interval_join(
        mk(events, "click"), mk(events, "purchase"), key="user_id"
    )
    g = sorted((r.l_event_id, r.r_event_id) for r in got.collect())
    w = sorted((r.l_event_id, r.r_event_id) for r in want.collect())
    assert g == w and len(g) > 0


def test_stream_stream_join_interval_bounds(spark):
    import datetime as dt

    from vector_db_spark.streaming.windows import stream_stream_interval_join

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, 10, t0)], "user_id long, event_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, 20, t0 + dt.timedelta(minutes=29)),  # in window
            (1, 21, t0 + dt.timedelta(minutes=31)),  # too late
            (1, 22, t0 - dt.timedelta(seconds=1)),   # before click
            (2, 23, t0 + dt.timedelta(minutes=5)),   # wrong key
        ],
        "user_id long, event_id long, ts timestamp",
    )
    out = stream_stream_interval_join(left, right, key="user_id")
    assert [r.r_event_id for r in out.collect()] == [20]


def test_stream_ann_search_multibatch_and_resume(spark, tmp_path):
    import glob

    from pyspark.sql import functions as F

    from vector_db_spark.operators.ann import IvfIndex
    from vector_db_spark.operators.knn import batch_knn
    from vector_db_spark.sources.fixtures import load_table
    from vector_db_spark.streaming.ingest import stream_ann_search

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    idx = IvfIndex.build(emb, nlist=4, seed=42, max_iter=5)
    qdir, out, ckpt = str(tmp_path / "q"), str(tmp_path / "r"), str(tmp_path / "c")

    def _stage(ids):
        (
            emb.filter(F.col("vec_id").isin(ids))
            .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
            .repartition(len(ids), "query_id")
            .write.mode("append")
            .parquet(qdir)
        )

    def _drain():
        qstream = (
            spark.readStream.schema("query_id long, query_vec array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(qdir)
        )
        q = stream_ann_search(qstream, idx, 3, ckpt, out, nprobe=4, metric="l2")
        q.awaitTermination(120_000)

    _stage([0, 7, 21])
    _drain()
    n_batches_first = len(glob.glob(out + "/batch=*"))
    assert n_batches_first > 1  # maxFilesPerTrigger=1 -> real micro-batches
    _stage([100, 333])
    _drain()  # same checkpoint: only the NEW files are processed
    got = spark.read.parquet(out)
    queries = emb.filter(F.col("vec_id").isin([0, 7, 21, 100, 333])).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    want = batch_knn(emb, queries, 3, metric="l2")
    assert sorted(
        [(r.query_id, r.rank, r.vec_id, round(r.distance, 6)) for r in got.collect()]
    ) == sorted(
        [(r.query_id, r.rank, r.vec_id, round(r.distance, 6)) for r in want.collect()]
    )


def test_stream_doc_dedup_state_survives_resume(spark, tmp_path):

    from pyspark.sql import functions as F

    stage, ckpt, out = str(tmp_path / "s"), str(tmp_path / "c"), str(tmp_path / "o")
    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    )
    docs.write.mode("append").parquet(stage)

    def _drain_to_parquet():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .parquet(stage)
            .withColumn("content_hash", F.md5("text"))
            .dropDuplicates(["content_hash"])
            .select("content_hash")
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120_000)

    _drain_to_parquet()
    first = {r.content_hash for r in spark.read.parquet(out).collect()}
    assert len(first) == 2
    # second wave: one duplicate of 'alpha', one new text — resuming the
    # SAME checkpoint must emit only the new hash (state persisted)
    spark.createDataFrame(
        [(3, "alpha"), (4, "gamma")], "doc_id long, text string"
    ).write.mode("append").parquet(stage)
    _drain_to_parquet()
    after = {r.content_hash for r in spark.read.parquet(out).collect()}
    assert len(after) == 3  # not 4: 'alpha' deduped across batches/runs


def test_stream_chunk_registry_is_arrival_order_independent(spark, tmp_path):
    from pyspark.sql import functions as F

    from vector_db_spark.operators.dedup import chunk_dedup

    docs = spark.createDataFrame(
        [
            (1, "b1 b2 b3 u1 u2 u3"),
            (2, "b1 b2 b3 v1 v2 v3"),   # shares doc 1's boilerplate chunk
            (3, "w1 w2 w3"),
        ],
        "doc_id long, text string",
    )
    want = {
        (r.doc_id, r.clean_text) for r in chunk_dedup(docs, chunk_words=3).collect()
    }

    def _run(order):
        stage = str(tmp_path / f"s{order[0]}")
        for d in order:  # one file per doc, staged in the given order
            docs.filter(F.col("doc_id") == d).write.mode("append").parquet(stage)
        cw = 3
        words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
        nch = F.ceil(F.size(words) / F.lit(cw)).cast("int")
        chunks = F.when(
            F.size(words) > 0,
            F.transform(
                F.sequence(F.lit(0), nch - 1),
                lambda i: F.array_join(F.slice(words, i * cw + 1, cw), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
            .select("doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk"))
            .groupBy("chunk")
            .agg(F.min(F.struct("doc_id", "chunk_idx")).alias("first"))
        )
        import tempfile
        import uuid

        name = "q" + uuid.uuid4().hex
        q = (
            stream.writeStream.format("memory").queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ck_"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120_000)
        reg = spark.table(name)
        out = (
            reg.select(F.col("first.doc_id").alias("doc_id"),
                       F.col("first.chunk_idx").alias("chunk_idx"), "chunk")
            .groupBy("doc_id")
            .agg(F.array_join(F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))),
                lambda s: s["chunk"]), " ").alias("clean_text"))
        )
        return {(r.doc_id, r.clean_text) for r in out.collect()}

    # doc 3 ARRIVES FIRST, doc 2 before doc 1: min-aggregation still awards
    # every shared chunk to the (doc_id, chunk_idx)-minimal claimant, so
    # the result equals the batch operator regardless of arrival order
    assert _run([3, 2, 1]) == want


def test_stream_ivf_append_serves_union_and_fresh_radii(spark, tmp_path):
    """Streamed appends land in the persisted layout batch by batch; the
    reloaded index must serve the union exactly AND must not range-prune
    with radii that predate the streamed rows (append(path) rewrites
    meta.json per batch)."""
    import tempfile

    from pyspark.sql import functions as F

    from vector_db_spark.operators.ann import IvfIndex
    from vector_db_spark.operators.knn import knn, range_search
    from vector_db_spark.sources.fixtures import load_table
    from vector_db_spark.streaming.ingest import stream_ivf_append

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    path = str(tmp_path / "ivf")
    idx = IvfIndex.build(
        emb.filter(F.col("vec_id") % 2 == 0), nlist=8, seed=42, max_iter=5
    )
    idx.ensure_cell_radii()  # persist PRE-append radii — must be invalidated
    idx.save(path)

    stage = str(tmp_path / "in")
    (
        emb.filter(F.col("vec_id") % 2 == 1)
        .repartition(3, "vec_id")
        .write.mode("append")
        .parquet(stage)
    )
    vec_stream = (
        spark.readStream.schema("vec_id long, embedding array<float>, label int")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = stream_ivf_append(
        vec_stream, path, checkpoint_dir=tempfile.mkdtemp(prefix="ckpt_")
    )
    q.awaitTermination(120_000)

    re = IvfIndex.load(spark, path)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head().embedding]
    got = [
        (r.vec_id, round(r.distance, 6))
        for r in re.search(qv, 10, nprobe=8).collect()
    ]
    want = [
        (r.vec_id, round(r.distance, 6)) for r in knn(emb, qv, 10).collect()
    ]
    assert got == want
    got_r = sorted(
        (r.vec_id, round(r.distance, 6))
        for r in re.range_search(qv, 1.6).collect()
    )
    want_r = sorted(
        (r.vec_id, round(r.distance, 6))
        for r in range_search(emb, qv, 1.6).collect()
    )
    assert got_r == want_r


def test_stream_ivf_delete_replay_idempotent(spark, tmp_path):
    """A replayed delete batch (same ids appended to the manifest twice)
    must change nothing: the anti-join applies a DISTINCT id set."""
    import numpy as np
    from pyspark.sql import functions as F

    from vector_db_spark.operators.ann import IvfIndex
    from vector_db_spark.operators.knn import knn
    from vector_db_spark.streaming.ingest import stream_ivf_delete

    rng = np.random.default_rng(7)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(1, 101)],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "idx")
    IvfIndex.build(df, nlist=4, seed=1, max_iter=3).save(path)

    stage = str(tmp_path / "in")
    dead = df.filter(F.col("vec_id") % 5 == 0).select(
        F.col("vec_id").alias("id")
    )
    dead.write.mode("append").parquet(stage)
    q = stream_ivf_delete(
        spark.readStream.schema("id long").parquet(stage),
        path,
        checkpoint_dir=str(tmp_path / "ck1"),
    )
    q.awaitTermination(60_000)
    # "replay": the same ids land again under a fresh checkpoint
    q2 = stream_ivf_delete(
        spark.readStream.schema("id long").parquet(stage),
        path,
        checkpoint_dir=str(tmp_path / "ck2"),
    )
    q2.awaitTermination(60_000)

    idx = IvfIndex.load(spark, path)
    got = [r.vec_id for r in idx.search([0.0] * 8, 10, nprobe=4).collect()]
    want = [
        r.vec_id
        for r in knn(df.filter(F.col("vec_id") % 5 != 0), [0.0] * 8, 10).collect()
    ]
    assert got == want


def test_stream_ivfopq_append_matches_batch_append(spark, tmp_path):
    """Streaming micro-batch appends through the frozen rotation +
    quantizers must serve exactly what one batch append serves (and both
    equal exact kNN at lossless settings) — the round-6 closure of the
    streaming-maintenance matrix over the newest families."""
    from vector_db_spark.operators.knn import knn
    from vector_db_spark.operators.opq import IvfOpqIndex
    from vector_db_spark.streaming.ingest import stream_ivfopq_append

    emb = load_table(spark, SF, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head().embedding]
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)

    path = str(tmp_path / "iop_stream")
    IvfOpqIndex.build(
        even, nlist=4, m=8, ksub=16, seed=42, max_iter=3, pq_iters=3,
        opq_iters=2,
    ).save(path)

    stage = str(tmp_path / "stage")
    odd.repartition(2, "vec_id").write.mode("append").parquet(stage)
    q = stream_ivfopq_append(
        spark.readStream.schema("vec_id long, embedding array<float>, label int")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage),
        path,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120_000)

    idx = IvfOpqIndex.load(spark, path)
    got = idx.search(
        qv, 10, nprobe=4, shortlist=10_000_000, rerank=emb
    ).collect()
    want = knn(emb, qv, 10).collect()
    assert [(r.vec_id, r.distance) for r in got] == [
        (r.vec_id, r.distance) for r in want
    ]


def test_stream_maxsim_pq_append_matches_exact(spark, tmp_path):
    """Codebook-frozen streaming appends into the residual-PQ PLAID
    layout: after draining, full-probe + non-binding shortlist over the
    reloaded index must equal exact MaxSim over the full corpus — the
    compressed multi-vector family's closure of the streaming matrix."""
    from vector_db_spark.operators.late_interaction import (
        MaxSimPqIndex,
        maxsim_search,
    )
    from vector_db_spark.streaming.ingest import stream_maxsim_pq_append

    emb = load_table(spark, SF, "embeddings")
    corpus = emb.select((F.col("vec_id") % 13).alias("doc"), "embedding")
    toks = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < 3).orderBy("vec_id").collect()
    ]

    path = str(tmp_path / "mspq_stream")
    MaxSimPqIndex.build(
        corpus.filter(F.col("doc") % 2 == 0),
        nlist=4, m=8, ksub=16, doc_col="doc", max_iter=3, pq_iters=3,
    ).save(path)

    stage = str(tmp_path / "stage")
    (
        corpus.filter(F.col("doc") % 2 == 1)
        .repartition(2, "doc")
        .write.mode("append")
        .parquet(stage)
    )
    q = stream_maxsim_pq_append(
        spark.readStream.schema("doc long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage),
        path,
        checkpoint_dir=str(tmp_path / "ckpt_mspq"),
    )
    q.awaitTermination(120_000)

    idx = MaxSimPqIndex.load(spark, path)
    got = [
        (r.doc, round(r.maxsim_score, 8))
        for r in idx.search(toks, 5, nprobe=4, shortlist=13).collect()
    ]
    want = [
        (r.doc, round(r.maxsim_score, 8))
        for r in maxsim_search(corpus, toks, 5, doc_col="doc").collect()
    ]
    assert got == want
