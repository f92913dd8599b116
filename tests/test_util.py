"""Unit tests for operators.util.fan_out — the spread-a-narrow-scan helper.

fan_out is now on the hot path of ten operator modules (dedup, tfidf,
embedder, text signals, classifier, multimodal noise synth, pii), so its
contract gets a direct pin here rather than only riding along in the
operator tests:

  * a file scan with fewer files than slots is round-robin repartitioned
    to the slot count (rows preserved, order-insensitive);
  * a scan that already has >= target files passes through untouched;
  * non-file inputs (in-memory frames) pass through untouched;
  * file-backed plans that ALREADY reshuffled (repartition, aggregate,
    join, window, distinct) pass through untouched — inputFiles()
    traverses through exchanges to the leaf scan, so the file count alone
    lies about width there (round-9 review), and chaining two
    fan_out-wrapped operators must not stack a shuffle per operator.
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
    path = str(tmp_path / "one_file_shuffled")
    spark.range(0, 100).coalesce(1).write.parquet(path)
    scan = spark.read.parquet(path)
    assert len(scan.inputFiles()) == 1

    # each width-setting shape must pass through: the data already runs
    # at exchange width even though the leaf scan has one file
    reshuffled = [
        scan.repartition(4),
        scan.groupBy("id").count(),
        scan.join(scan.withColumnRenamed("id", "id2"), scan.id == F.col("id2")),
        scan.distinct(),
        scan.orderBy("id"),
    ]
    for df in reshuffled:
        assert fan_out(df) is df

    # but a narrow select/filter over the raw scan still spreads
    narrow = scan.select((F.col("id") * 2).alias("x")).filter(F.col("x") >= 0)
    assert fan_out(narrow) is not narrow


def test_fan_out_respects_min_partitions(spark, tmp_path):
    path = str(tmp_path / "single")
    spark.range(0, 50).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    out = fan_out(df, min_partitions=6)
    assert out.rdd.getNumPartitions() == 6
    assert out.count() == 50
