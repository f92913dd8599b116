"""Unit tests for operators.util.fan_out — the spread-a-narrow-scan helper.

fan_out is now on the hot path of ten operator modules (dedup, tfidf,
embedder, text signals, classifier, multimodal noise synth, pii), so its
contract gets a direct pin here rather than only riding along in the
operator tests:

  * a file scan with fewer files than slots is round-robin repartitioned
    to the slot count (rows preserved, order-insensitive);
  * a scan that already has >= target files passes through untouched;
  * non-file inputs (in-memory frames) pass through untouched;
  * file-backed plans whose PHYSICAL plan already shuffles (repartition,
    aggregate, sort-merge join, window, orderBy, distinct) pass through
    untouched — inputFiles() traverses through exchanges to the leaf
    scan, so the file count alone lies about width there (round-9
    review), and chaining two fan_out-wrapped operators must not stack a
    shuffle per operator;
  * plans with a Join/Sort LOGICAL node but no shuffle (broadcast join,
    sortWithinPartitions) still run at scan width and still spread.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_spark.operators.util import fan_out


def test_fan_out_spreads_single_file_scan(spark, tmp_path):
    path = str(tmp_path / "one_file")
    spark.range(0, 1000).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    assert len(df.inputFiles()) == 1

    target = spark.sparkContext.defaultParallelism
    out = fan_out(df)
    assert out.rdd.getNumPartitions() == target
    assert out.count() == 1000
    assert out.agg(F.sum("id")).first()[0] == 999 * 1000 // 2


def test_fan_out_noop_when_enough_files(spark, tmp_path):
    path = str(tmp_path / "many_files")
    spark.range(0, 100).repartition(4).write.parquet(path)
    df = spark.read.parquet(path)
    nfiles = len(df.inputFiles())
    assert nfiles >= 4

    out = fan_out(df, min_partitions=4)
    # pass-through: same object, no Exchange inserted
    assert out is df
    assert "Exchange RoundRobinPartitioning" not in out._jdf.queryExecution().executedPlan().toString()


def test_fan_out_noop_on_in_memory_frame(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "x int")
    assert df.inputFiles() == []
    assert fan_out(df) is df


def test_fan_out_noop_on_already_shuffled_file_plan(spark, tmp_path):
    # Over a single-PARTITION scan Spark ELIDES the exchange entirely
    # (1 partition satisfies any clustering requirement) and spreading
    # is correct; the pass-through protects >1-partition children whose
    # aggregation genuinely shuffled. Tiny files bin-pack into one scan
    # partition, so pin openCostInBytes high for this test to give the
    # 2-file scan 2 partitions and force the real exchange.
    path = str(tmp_path / "two_file_shuffled")
    spark.range(0, 100).repartition(2).write.parquet(path)
    old_cost = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.openCostInBytes", str(128 << 20))
    try:
        _fan_out_shuffle_cases(spark, path)
    finally:
        spark.conf.set("spark.sql.files.openCostInBytes", old_cost)


def _fan_out_shuffle_cases(spark, path):
    scan = spark.read.parquet(path)
    assert len(scan.inputFiles()) == 2

    # each SHUFFLING shape must pass through: the data already runs at
    # exchange width even though the leaf scan has one file
    other = scan.withColumnRenamed("id", "id2")
    reshuffled = [
        scan.repartition(4),
        scan.groupBy("id").count(),
        scan.join(other.hint("merge"), scan.id == F.col("id2")),
        scan.distinct(),
        scan.orderBy("id"),
    ]
    for df in reshuffled:
        assert fan_out(df) is df

    # but plans with NO shuffle exchange still run at scan width and
    # still spread (round-9 review: the physical plan is the truth —
    # a logical Join/Sort node alone proves nothing):
    # - narrow select/filter
    narrow = scan.select((F.col("id") * 2).alias("x")).filter(F.col("x") >= 0)
    assert fan_out(narrow) is not narrow
    # - broadcast join: the streamed side keeps the scan's partitioning
    bjoin = scan.join(F.broadcast(other), scan.id == F.col("id2"))
    assert "BroadcastHashJoin" in bjoin._jdf.queryExecution().sparkPlan().toString()
    assert fan_out(bjoin) is not bjoin
    # - sortWithinPartitions: a Sort node, global=false, no exchange
    swp = scan.sortWithinPartitions("id")
    assert fan_out(swp) is not swp
    # - a column ALIASED to an operator name must not suppress the spread
    tricky = scan.select(F.col("id").alias("Join"), F.lit("Window").alias("Sort"))
    assert fan_out(tricky) is not tricky


def test_fan_out_exchange_match_under_aqe(spark, tmp_path):
    """The Exchange regex must keep matching the AQE initial plan
    (AdaptiveSparkPlan wraps the tree; exchanges are still present as
    'Exchange' nodes pre-execution) — pinned explicitly so an AQE plan-
    string format change fails here, not as a silent double shuffle
    (ADVICE r9)."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    path = str(tmp_path / "aqe_src")
    spark.range(0, 100).coalesce(1).write.parquet(path)
    scan = spark.read.parquet(path)
    agg = scan.groupBy((F.col("id") % 5).alias("g")).count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "AdaptiveSparkPlan" in plan and "Exchange" in plan
    assert fan_out(agg) is agg  # post-shuffle plan passes through
    assert fan_out(scan) is not scan  # plain narrow scan still spreads


def test_fan_out_memoizes_probe_per_frame(spark, tmp_path):
    path = str(tmp_path / "memo_src")
    spark.range(0, 10).coalesce(1).write.parquet(path)
    scan = spark.read.parquet(path)
    assert not hasattr(scan, "_fan_out_shuffled")
    out1 = fan_out(scan)
    assert scan._fan_out_shuffled is False  # probed once, cached on the frame
    out2 = fan_out(scan)  # second wrap: no re-probe, same decision
    assert out1 is not scan and out2 is not scan
    # hint-content collision that ruled OUT a semanticHash key: a merge
    # hint (shuffles) and a broadcast hint (doesn't) canonicalize to the
    # same semanticHash — object-identity memoization cannot cross them
    other = scan.withColumnRenamed("id", "id2")
    merge = scan.join(other.hint("merge"), scan.id == F.col("id2"))
    bcast = scan.join(F.broadcast(other), scan.id == F.col("id2"))
    assert (
        merge._jdf.queryExecution().analyzed().semanticHash()
        == bcast._jdf.queryExecution().analyzed().semanticHash()
    )
    assert fan_out(merge) is merge  # shuffle join passes through
    assert fan_out(bcast) is not bcast  # broadcast join still spreads


def test_fan_out_respects_min_partitions(spark, tmp_path):
    path = str(tmp_path / "single")
    spark.range(0, 50).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    out = fan_out(df, min_partitions=6)
    assert out.rdd.getNumPartitions() == 6
    assert out.count() == 50


def test_collect_query_rows_passes_small_and_preserves_order(spark):
    from vector_db_spark.operators import util

    df = spark.range(0, 20).orderBy(F.col("id").desc())
    rows = util.collect_query_rows(df, cap=50)
    assert [r.id for r in rows] == list(range(19, -1, -1))


def test_collect_query_rows_refuses_corpus_sized_frame(spark):
    import pytest as _pytest

    from vector_db_spark.operators import util

    big = spark.range(0, 1000)
    with _pytest.raises(ValueError, match="exceeds 100 rows"):
        util.collect_query_rows(big, cap=100)


def test_batch_knn_refuses_corpus_sized_query_frame(spark, monkeypatch):
    import pytest as _pytest

    from vector_db_spark.operators import util
    from vector_db_spark.operators.knn import _batch_score_topk_arrow

    monkeypatch.setattr(util, "QUERY_COLLECT_CAP", 10)
    corpus = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(5)], "id long, vec array<double>"
    )
    queries = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(25)], "qid long, qvec array<double>"
    )
    with _pytest.raises(ValueError, match="exceeds 10 rows"):
        _batch_score_topk_arrow(
            corpus, queries, 1, metric="l2", vec_col="vec", id_col="id",
            query_id_col="qid", query_vec_col="qvec", out="score",
        ).collect()
