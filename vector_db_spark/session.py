"""SparkSession construction with engine-wide defaults.

The reference engine is a single tokio process with per-index mutexes
(reference: src/core/index/faiss_index.rs:19-21); our execution substrate is
Spark, so "engine configuration" is a SparkSession with settings chosen for
the 100 TB design point:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting and
  broadcast-join demotion/promotion decided from real statistics.
- Arrow on: any unavoidable Python stage runs vectorized over Arrow batches
  instead of row-at-a-time pickling.
- UTC session timezone: deterministic timestamp semantics against the
  DuckDB oracle and across clusters.
- shuffle.partitions default 32 locally; on a real cluster this is set per
  job (or left to AQE's coalescing with a high initial partition count).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "vector_db_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    On a production cluster ``master`` comes from the environment; locally
    we default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # Vector columns are float arrays; parquet dictionary encoding is
        # useless for them and bloats pages. Keep default page sizes but cap
        # split sizes so a 100 TB scan parallelizes to ~1 partition/128MB.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # Artifact tools capture stdout+stderr into one-line JSON files;
        # the console progress bar interleaves control characters into
        # that stream and corrupts them (RECALL_sf1_r06 needed scrubbing).
        .config("spark.ui.showConsoleProgress", "false")
        # Bucketed catalog tables (sources.generic.write_bucketed) land in
        # tmp, not the process cwd — the in-memory catalog is per-session,
        # so the warehouse is scratch space, never a durable artifact.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"
            ),
        )
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
        # Local mode runs ALL executor threads inside the driver JVM, and
        # Spark's default spark.driver.memory=1g starves 32 concurrent
        # tasks the moment inputs outgrow sf0.1 (measured: sf1 probes OOM
        # in the heap while the host sits on >100 GiB free). Size the one
        # JVM like the sum of the executors it stands in for. Cluster
        # deployments (SPARK_MASTER / explicit master) are unaffected —
        # there, memory comes from spark-submit/cluster conf.
        builder = builder.config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
