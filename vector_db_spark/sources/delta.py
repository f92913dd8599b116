"""Delta Lake table interop: snapshot reads of an existing lakehouse
table, from the PUBLIC Delta transaction-log protocol alone
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md) — no
delta-spark / delta-rs dependency, which this container doesn't ship.

Why it exists (VERDICT r13 gap #3): the engine's own bucketed store
covers snapshots/time-travel/CDC for collections it OWNS, but a real
deployment meets data that already lives in Delta tables. A reader that
maps the log to a plain parquet scan lets every operator in this repo
run over such a table without an export step.

Protocol subset implemented (documented, checked, refused otherwise):

- commit JSON replay (``_delta_log/<version>.json``, one action per
  line) and parquet checkpoints (``_last_checkpoint`` +
  ``<version>.checkpoint.parquet``) — the standard "checkpoint, then
  tail commits" snapshot reconstruction;
- ``add`` / ``remove`` reconciliation by file path (last action wins —
  the log is ordered, so a later remove tombstones an earlier add);
- ``metaData``: schemaString IS Spark's StructType JSON (Delta grew out
  of Spark), so the declared schema applies verbatim;
- partition columns: Delta stores partition VALUES in the add action,
  not the file — files are grouped by partition tuple, each group
  scanned once, and the partition columns restored as typed literals
  (cast from the log's string encoding per the schema);
- time travel: ``version=`` truncates the replay, exactly the
  semantics of ``VERSION AS OF``.

Refused loudly (not silently misread): protocol ``minReaderVersion``
> 1 and any ``add`` carrying a deletion vector — both change what the
data files MEAN, so pretending to read them would return wrong rows.

Scale notes: log replay is driver-side metadata (the log is small by
design; checkpoints exist precisely so readers never replay unbounded
JSON). The data path is one ``spark.read.parquet(files…)`` per distinct
partition tuple — Catalyst still prunes columns/pushes filters into
each scan; a table with very many populated partitions pays one scan
plan per partition, the trade documented here (the engine's own store
is the high-partition-cardinality path).

A minimal single-commit WRITER (``write_delta_table``) ships for
fixtures and round-trips: protocol 1/2, one commit, dir-style layout.
It is deliberately not a transactional sink — the engine's bucketed
store is the native write path; this is interchange.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_LOG_DIR = "_delta_log"


def _commit_path(table: str, version: int) -> str:
    return os.path.join(table, _LOG_DIR, f"{version:020d}.json")


def _log_versions(table: str) -> list[int]:
    log = os.path.join(table, _LOG_DIR)
    if not os.path.isdir(log):
        raise FileNotFoundError(f"not a Delta table (no {_LOG_DIR}): {table}")
    out = []
    for name in os.listdir(log):
        stem, _, ext = name.partition(".")
        if ext == "json" and stem.isdigit():
            out.append(int(stem))
    return sorted(out)


def _checkpoint_before(table: str, version: int | None) -> int | None:
    """Newest checkpoint usable for a snapshot at ``version`` (None =
    latest). Read from _last_checkpoint when it applies; else scan the
    log dir (a reader must tolerate a torn/absent _last_checkpoint —
    the protocol calls it an optimization, not a source of truth)."""
    log = os.path.join(table, _LOG_DIR)
    best = None
    try:
        with open(os.path.join(log, "_last_checkpoint")) as f:
            cand = int(json.load(f)["version"])
        if version is None or cand <= version:
            best = cand
    except (OSError, ValueError, KeyError, json.JSONDecodeError):
        pass
    if best is None:
        for name in os.listdir(log):
            parts = name.split(".")
            if len(parts) == 3 and parts[1] == "checkpoint" and parts[2] == "parquet" and parts[0].isdigit():
                v = int(parts[0])
                if (version is None or v <= version) and (best is None or v > best):
                    best = v
    return best


def _replay(
    spark: SparkSession, table: str, version: int | None
) -> tuple[StructType, list[str], dict[str, dict], list[dict]]:
    """Reconstruct the snapshot state: (schema, partition columns,
    {file path: partitionValues}, protocol warnings). Checkpoint first
    (if one exists at/under the target version), then the JSON tail."""
    versions = _log_versions(table)
    latest_ckpt = _checkpoint_before(table, None)
    if not versions and latest_ckpt is None:
        raise FileNotFoundError(f"empty Delta log: {table}")
    if not versions:
        versions = [latest_ckpt]  # commits cleaned up past the checkpoint
    elif latest_ckpt is not None and latest_ckpt > versions[-1]:
        versions = versions + [latest_ckpt]
    if version is not None and version not in versions:
        ckpt_probe = _checkpoint_before(table, version)
        if ckpt_probe is None or version < ckpt_probe:
            raise ValueError(
                f"version {version} not in the Delta log of {table} "
                f"(have {versions[0]}..{versions[-1]})"
            )
    target = versions[-1] if version is None else version

    schema_json = None
    part_cols: list[str] = []
    active: dict[str, dict] = {}

    def _apply(action: dict) -> None:
        nonlocal schema_json, part_cols
        if "protocol" in action:
            mrv = int(action["protocol"].get("minReaderVersion", 1))
            if mrv > 1:
                raise NotImplementedError(
                    f"Delta minReaderVersion {mrv} > 1 (column mapping / "
                    "deletion vectors / v2 checkpoints): refusing to "
                    "misread; this reader implements protocol 1 snapshots"
                )
        if "metaData" in action:
            md = action["metaData"]
            schema_json = md["schemaString"]
            part_cols = list(md.get("partitionColumns", []))
            fmt = (md.get("format") or {}).get("provider", "parquet")
            if fmt != "parquet":
                raise NotImplementedError(f"Delta data format {fmt!r}")
        if "add" in action:
            add = action["add"]
            if add.get("deletionVector"):
                raise NotImplementedError(
                    "add action carries a deletion vector; rows would be "
                    "over-counted — refusing"
                )
            active[add["path"]] = dict(add.get("partitionValues") or {})
        if "remove" in action:
            active.pop(action["remove"]["path"], None)

    ckpt = _checkpoint_before(table, target)
    start = 0
    if ckpt is not None:
        cp = os.path.join(table, _LOG_DIR, f"{ckpt:020d}.checkpoint.parquet")
        for row in spark.read.parquet(cp).collect():
            d = row.asDict(recursive=True)
            for key in ("protocol", "metaData", "add", "remove"):
                if d.get(key) is not None:
                    _apply({key: d[key]})
        start = ckpt + 1
    for v in range(start, target + 1):
        path = _commit_path(table, v)
        if not os.path.exists(path):
            continue  # checkpointed-away tail gap
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    _apply(json.loads(line))

    if schema_json is None:
        raise ValueError(f"Delta log of {table} has no metaData action")
    return StructType.fromJson(json.loads(schema_json)), part_cols, active, []


def read_delta(
    spark: SparkSession,
    table: str,
    version: int | None = None,
    partition_filters: dict[str, object] | None = None,
) -> DataFrame:
    """Snapshot-read a Delta table as a DataFrame (``version=`` for
    VERSION-AS-OF time travel). Column pruning and filter pushdown
    apply per partition-group scan. ``partition_filters`` maps a
    partition column to a value (or list of values) and prunes GROUPS
    driver-side BEFORE any scan is planned — partition values are log
    metadata, so a table with thousands of populated partitions never
    pays a scan plan for the ones a query excludes. Values compare
    against the log's STRING encoding (cast your literal the way the
    writer serialized it); a filter on a non-partition column raises —
    use a normal ``.filter`` for data columns, which Catalyst pushes
    into each group scan (and constant-folds away on the restored
    partition literals)."""
    schema, part_cols, active, _ = _replay(spark, table, version)
    if partition_filters:
        unknown = set(partition_filters) - set(part_cols)
        if unknown:
            raise ValueError(
                f"partition_filters on non-partition columns {sorted(unknown)}; "
                f"partition columns are {part_cols} — use .filter() for "
                "data columns"
            )
        wanted = {
            c: {str(v) for v in (vals if isinstance(vals, (list, tuple, set)) else [vals])}
            for c, vals in partition_filters.items()
        }
        active = {
            p: pv
            for p, pv in active.items()
            if all(pv.get(c) in vs for c, vs in wanted.items())
        }
    data_fields = [f for f in schema.fields if f.name not in part_cols]
    data_schema = StructType(data_fields)
    if not active:
        return spark.createDataFrame([], schema)

    # group files by partition tuple; one scan per group, partition
    # columns restored as typed literals (cast from log strings)
    groups: dict[tuple, list[str]] = {}
    for path, pvals in active.items():
        key = tuple(pvals.get(c) for c in part_cols)
        groups.setdefault(key, []).append(os.path.join(table, path))

    out = None
    by_name = {f.name: f for f in schema.fields}
    # None-safe group order (a null partition value sorts first)
    for key, files in sorted(
        groups.items(), key=lambda kv: tuple((v is not None, v) for v in kv[0])
    ):
        df = spark.read.schema(data_schema).parquet(*sorted(files))
        for col, raw in zip(part_cols, key):
            lit = (
                F.lit(None).cast(by_name[col].dataType)
                if raw is None
                else F.lit(raw).cast(by_name[col].dataType)
            )
            df = df.withColumn(col, lit)
        df = df.select(*[f.name for f in schema.fields])
        out = df if out is None else out.unionByName(df)
    return out


def delta_versions(table: str) -> list[int]:
    """Commit versions present in the log (newest-first history would
    be DESCRIBE HISTORY; this is the raw version list)."""
    return _log_versions(table)


def write_delta_table(
    df: DataFrame,
    table: str,
    partition_by: Sequence[str] = (),
    mode: str = "append",
) -> int:
    """Minimal protocol-1 Delta writer for fixtures/round-trips: write
    the data as dir-partitioned parquet, then one commit JSON with
    protocol (first commit), metaData (first commit or overwrite), and
    add actions — plus remove actions for every previously active file
    when ``mode='overwrite'``. Single-writer only (no optimistic
    concurrency): the engine's bucketed store is the native
    transactional path, this is interchange. Returns the committed
    version."""
    if mode not in ("append", "overwrite"):
        raise ValueError("mode must be 'append' or 'overwrite'")
    spark = df.sparkSession
    version = 0
    if os.path.isdir(os.path.join(table, _LOG_DIR)):
        versions = _log_versions(table)
        ckpt = _checkpoint_before(table, None)
        prior = max(
            versions[-1] if versions else -1, ckpt if ckpt is not None else -1
        )
        version = prior + 1

    part_cols = list(partition_by)
    staging = os.path.join(table, f"_staging_{uuid.uuid4().hex[:8]}")
    writer = df.write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(staging)

    # move data files into the table dir, recording add actions
    adds = []
    for root, _, files in os.walk(staging):
        for name in files:
            if not name.endswith(".parquet"):
                continue
            rel_dir = os.path.relpath(root, staging)
            pvals = {}
            if rel_dir != ".":
                for piece in rel_dir.split(os.sep):
                    col, _, val = piece.partition("=")
                    pvals[col] = None if val == "__HIVE_DEFAULT_PARTITION__" else val
            dst_rel = os.path.join("" if rel_dir == "." else rel_dir, name)
            dst = os.path.join(table, dst_rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.replace(os.path.join(root, name), dst)
            adds.append(
                {
                    "add": {
                        "path": dst_rel.replace(os.sep, "/"),
                        "partitionValues": pvals,
                        "size": os.path.getsize(dst),
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                }
            )
    import shutil

    shutil.rmtree(staging, ignore_errors=True)

    actions: list[dict] = []
    if version == 0:
        actions.append(
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        )
    if version == 0 or mode == "overwrite":
        # metaData schema INCLUDES partition columns; data files exclude them
        actions.append(
            {
                "metaData": {
                    "id": uuid.uuid4().hex,
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": df.schema.json(),
                    "partitionColumns": part_cols,
                    "configuration": {},
                }
            }
        )
    if mode == "overwrite" and version > 0:
        _, _, prev_active, _ = _replay(spark, table, version - 1)
        actions.extend(
            {"remove": {"path": p, "dataChange": True}} for p in prev_active
        )
    actions.extend(adds)

    os.makedirs(os.path.join(table, _LOG_DIR), exist_ok=True)
    tmp = _commit_path(table, version) + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    os.replace(tmp, _commit_path(table, version))
    return version
