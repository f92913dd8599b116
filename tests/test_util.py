"""Unit tests for operators.util.fan_out — the spread-a-narrow-scan helper.

fan_out is now on the hot path of ten operator modules (dedup, tfidf,
embedder, text signals, classifier, multimodal noise synth, pii), so its
contract gets a direct pin here rather than only riding along in the
operator tests:

  * a file scan with fewer files than slots is round-robin repartitioned
    to the slot count (rows preserved, order-insensitive);
  * a scan that already has >= target files passes through untouched;
  * non-file inputs (in-memory frames, post-shuffle plans) pass through
    untouched — their partitioning was chosen by an upstream exchange and
    an extra shuffle would be pure overhead.
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


def test_fan_out_respects_min_partitions(spark, tmp_path):
    path = str(tmp_path / "single")
    spark.range(0, 50).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    out = fan_out(df, min_partitions=6)
    assert out.rdd.getNumPartitions() == 6
    assert out.count() == 50
