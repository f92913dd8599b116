"""File-level zone maps: a min/max-per-file manifest consulted at
PLANNING time, so a range scan never even lists the files it can prove
irrelevant.

``write_clustered`` (sources/generic.py) already range-clusters a table
so parquet FOOTER stats skip row groups — but footer skipping still
opens every file to read its footer. At 100 TB a table is millions of
files; the scan cost that matters is file LISTING + footer round-trips,
which is exactly why Delta ("data skipping") and Iceberg (manifest
files) lift per-file min/max out of the footers into table metadata
consulted on the driver. This module is that pattern without a table
format: the stats ride in a tiny parquet manifest under ``_zonemap/``
inside the table directory (underscore-prefixed paths are invisible to
Spark's parquet reader, like ``_SUCCESS``), and ``read_zonemapped``
prunes the file list driver-side before Spark ever plans the scan.
Types survive exactly because the manifest IS parquet — no JSON codec
for decimals/dates/timestamps.

The residual predicate is still applied (and still pushes down to the
surviving files' row groups), so pruning is LOSSLESS: the result equals
the unpruned filter bit-for-bit. Files whose zone column is entirely
NULL carry null stats and are pruned by any range predicate — correct,
because a BETWEEN never matches NULL.

Reference anchor: the reference engine has no columnar storage layer
(in-memory usearch/hashbrown, src/core/mod.rs); this is part of the
warehouse-scale extension surface, same family as write_clustered /
write_bucketed. Public-knowledge basis: Moerkotte, "Small Materialized
Aggregates" (VLDB 1998); Delta Lake data skipping; Iceberg manifests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_db_spark.sources.generic import write_clustered

_MANIFEST_DIR = "_zonemap"


def write_zonemapped(
    df: DataFrame,
    path: str,
    zone_col: str,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-clustered parquet write + file-level zone-map manifest.

    The data write is ``write_clustered`` (one range shuffle, local sort,
    narrow non-overlapping per-file key ranges — pruning is only as good
    as the clustering). The stats pass then reads ONLY the zone column
    (column pruning: a sliver of the table's bytes) grouped by
    ``_metadata.file_path``; a writer integrated with a table format
    would collect the same stats for free during the write, which is the
    production shape — the separate pass keeps this self-contained.
    """
    write_clustered(df, path, [zone_col], n_files=n_files, mode=mode)
    spark = df.sparkSession
    stats = (
        spark.read.parquet(path)
        .select(F.col("_metadata.file_path").alias("file"), F.col(zone_col))
        .groupBy("file")
        .agg(
            F.min(zone_col).alias("lo"),
            F.max(zone_col).alias("hi"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .withColumn("zone_col", F.lit(zone_col))
    )
    # coalesce(1): the manifest is one row per FILE (thousands at 100 TB,
    # bytes each) — a single driver-readable object, like a Delta
    # checkpoint. It must not inherit the data write's parallelism.
    stats.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, _MANIFEST_DIR)
    )


def zonemap_files(spark: SparkSession, path: str, lo=None, hi=None) -> tuple[list[str], int]:
    """(surviving files, total files) for a ``[lo, hi]`` range predicate
    on the zone column — the driver-side prune. ``None`` bounds are
    open-ended. A file survives iff its [min, max] intersects the query
    range; all-NULL files (null stats) never survive a range predicate.
    """
    manifest = spark.read.parquet(os.path.join(path, _MANIFEST_DIR)).collect()
    keep = []
    for r in manifest:
        if r.lo is None:  # file's zone column is entirely NULL
            continue
        if lo is not None and r.hi < lo:
            continue
        if hi is not None and r.lo > hi:
            continue
        keep.append(r.file)
    return keep, len(manifest)


def read_zonemapped(
    spark: SparkSession,
    path: str,
    lo=None,
    hi=None,
) -> DataFrame:
    """Range scan through the zone map: prune the file list driver-side,
    plan the scan over ONLY the surviving files, then apply the exact
    residual predicate (which further pushes down into their row groups).
    Lossless: equals the unpruned ``filter`` on the full table.
    """
    files, _total = zonemap_files(spark, path, lo, hi)
    zone_col = spark.read.parquet(os.path.join(path, _MANIFEST_DIR)).head().zone_col
    if not files:
        # schema-only plan: nothing to read, but the frame keeps the
        # table's exact schema for downstream composition
        return spark.read.parquet(path).filter(F.lit(False))
    df = spark.read.parquet(*files)
    pred = F.lit(True)
    if lo is not None:
        pred = pred & (F.col(zone_col) >= F.lit(lo))
    if hi is not None:
        pred = pred & (F.col(zone_col) <= F.lit(hi))
    return df.filter(pred)
