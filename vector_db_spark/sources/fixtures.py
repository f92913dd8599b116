"""Parquet fixture sources (TESTDATA.md tables).

At scale the same entry points read partitioned/bucketed production tables;
the declarative ``spark.read.parquet`` scan is what lets Catalyst push
filters and prune columns down to the file footers — the Spark-native
replacement for the reference's roaring-bitmap filter index
(reference: src/core/index/filter_index.rs:23-65).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts has shipped as parquet TIMESTAMP(NANOS) in some fixture
        # generations and TIMESTAMP(MICROS, isAdjustedToUTC=false) in
        # others. Normalize both to a session-TZ (UTC) TIMESTAMP so every
        # downstream `unix_micros`/`window` call sees one type:
        #  - nanos: vectorized reader rejects it, so read the raw int64
        #    (nanosAsLong) and integer-divide to µs — DuckDB's reader
        #    truncates ns→µs the same way, keeping oracle parity;
        #  - µs-naive: Spark infers TIMESTAMP_NTZ; cast re-tags the naive
        #    value as a UTC instant (session TZ is pinned UTC), which is
        #    exactly how DuckDB treats it.
        # Set-and-RESTORE the legacy flag around this one read: it is a
        # session-wide conf, and leaking it changed how every later
        # parquet read in the session decodes TIMESTAMP(NANOS) columns
        # (silently as bigint). NOTE the schema is resolved eagerly
        # (df.dtypes) while the flag is on, so the restored conf cannot
        # retroactively change this scan.
        prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(path)
            ts_type = dict(df.dtypes).get("ts")
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            else:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
