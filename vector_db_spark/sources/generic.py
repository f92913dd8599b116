"""Generic file sources/sinks beyond the fixture parquet.

The reference's only storage interface is RocksDB point KV
(src/db/scalar_storage.rs); an analytics engine needs interchange formats.
Thin, opinionated wrappers over the DataFrame reader/writer:

- JSON is line-delimited (one object per row — the streamable/splittable
  form); timestamps serialize as ISO-8601 UTC and round-trip under the
  session's UTC timezone.
- CSV writes a header and reads with an explicit schema — never
  inferSchema in pipelines (a second full scan at 100 TB, and type guesses
  drift between runs).
- ORC rides the same wrapper: columnar like parquet (self-describing, so
  the schema may be omitted), the interchange format of the Hive/Trino
  world.
- Readers take an explicit schema for exactly that reason; parquet and ORC
  are the only self-describing formats allowed to omit it.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_FORMATS = ("parquet", "json", "csv", "orc")
_SELF_DESCRIBING = ("parquet", "orc")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    if fmt not in _FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {_FORMATS}")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
) -> DataFrame:
    if fmt not in _FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {_FORMATS}")
    if fmt not in _SELF_DESCRIBING and schema is None:
        raise ValueError(
            f"{fmt} requires an explicit schema (inferSchema re-scans the "
            "input and guesses types; forbidden in pipelines)"
        )
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    return reader.format(fmt).load(path)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet sink with range-clustering on ``cluster_cols``: rows are
    range-partitioned then sorted within each file, so every file's
    min/max footer stats cover a narrow, non-overlapping slice of the
    cluster key. Point lookups and range scans on those columns then skip
    whole files/row-groups from footers alone — the poor-man's Z-order
    (single-dimension case of it) that needs no table format.

    ``repartitionByRange`` does one range shuffle (sampling the key
    distribution); ``sortWithinPartitions`` is a per-file local sort, no
    second shuffle."""
    cols = [str(c) for c in cluster_cols]
    if not cols:
        raise ValueError("cluster_cols must be non-empty")
    out = df
    if n_files is not None:
        out = out.repartitionByRange(n_files, *cols)
    else:
        out = out.repartitionByRange(*cols)
    out.sortWithinPartitions(*cols).write.mode(mode).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 16,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed, optionally sorted, catalog table (``bucketBy`` +
    ``saveAsTable`` — bucketed layout needs the catalog to carry the
    bucket spec; a plain path write discards it).

    THE join strategy for repeated big-to-big joins at 100 TB: two tables
    bucketed by the same key into the same bucket count join with ZERO
    Exchange — each task reads matching bucket files from both sides
    (sorted buckets also skip the in-task sort). One shuffle at write
    time replaces a shuffle in every subsequent join/aggregate on that
    key. Pinned shuffle-free in tests/test_plans.py."""
    cols = [str(c) for c in bucket_cols]
    if not cols:
        raise ValueError("bucket_cols must be non-empty")
    spark = df.sparkSession
    if mode == "overwrite":
        # The in-memory catalog is per-session but the warehouse dir is
        # not: a managed-table dir left by a dead session would fail the
        # CREATE ("location already exists"). Drop both catalog entry and
        # stale dir before writing — through the HADOOP FileSystem API:
        # shutil.rmtree on a local-path guess was a silent no-op for
        # s3a/abfs/hdfs warehouses (the overwrite then still failed), and
        # a db-qualified name lives under '<wh>/<db>.db/<tbl>', not
        # '<wh>/<db>.<tbl>' (round-10 review).
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        parts = table.lower().split(".")
        rel = (
            os.path.join(f"{parts[0]}.db", parts[1])
            if len(parts) == 2
            else parts[0]
        )
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(warehouse, rel)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(jpath):
            fs.delete(jpath, True)
    writer = df.write.mode(mode).bucketBy(n_buckets, *cols)
    if sort_cols:
        writer = writer.sortBy(*[str(c) for c in sort_cols])
    writer.format("parquet").saveAsTable(table)


def write_sharded(
    df: DataFrame,
    path: str,
    max_records_per_file: int,
    n_tasks: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Training-shard export: bound every output file to at most
    ``max_records_per_file`` rows — the dataloader-facing contract
    (uniform shards stream and shuffle well; one giant file serializes a
    whole epoch behind one reader). ``maxRecordsPerFile`` makes the
    per-file ceiling a WRITER property (tasks roll to a new file at the
    limit), so no fragile repartition arithmetic; ``n_tasks`` optionally
    spreads the write so shards land ≈ceil(rows/tasks/limit) per task."""
    if max_records_per_file < 1:
        raise ValueError("max_records_per_file must be >= 1")
    out = df.repartition(n_tasks) if n_tasks else df
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )
