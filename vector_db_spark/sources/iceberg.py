"""Apache Iceberg table interop: snapshot reads of an existing
lakehouse table, from the PUBLIC Iceberg table spec alone
(https://iceberg.apache.org/spec/) — no iceberg runtime jar / pyiceberg
dependency, which this container doesn't ship. The Avro metadata tier
is decoded by the from-scratch codec in ``sources/avro_io.py``
(VERDICT r14 next #6: "avro decoding is the only new dependency
question" — answered by implementing the public format).

Same role as ``sources/delta.py``: the engine's bucketed store owns its
native data; this reader lets every operator run over data that already
lives in Iceberg without an export step.

Spec subset implemented (documented, checked, refused otherwise):

- table metadata discovery: ``metadata/version-hint.text`` →
  ``v<N>.metadata.json``, else the highest ``v*.metadata.json``;
  format-version 1 AND 2 metadata layouts (``schema`` vs ``schemas`` +
  ``current-schema-id``, ``partition-spec`` vs ``partition-specs``);
- snapshot resolution: ``current-snapshot-id`` or ``snapshot_id=`` time
  travel (unknown id raises, listing the known ids);
- manifest-list avro → data manifests → manifest entries with
  ``status`` EXISTING/ADDED live, DELETED dropped;
- identity-transform partition values restored from the manifest's
  typed ``partition`` struct, per the spec's own instruction ("readers
  should use the partition metadata for identity partition fields");
  files are grouped by partition tuple and each group scanned once —
  the same driver-side pruning shape as the Delta reader, with
  ``partition_filters`` on identity fields;
- path relocation: ``file_path`` entries are full URIs under the
  writer's ``location``; they are re-rooted onto the actual table dir
  so a copied/moved table still reads.

Refused loudly (not silently misread): delete manifests and delete
files (v2 row-level deletes — ``content != 0`` anywhere), non-parquet
data files, non-identity ``partition_filters``, unknown schema types.
Name resolution note: columns are matched by name between the Iceberg
schema and the parquet files (full field-id resolution — the spec's
rename-proof mechanism — is out of scope and DOCUMENTED: a table whose
columns were renamed after data was written needs id-based resolution
and is the one schema-evolution case this reader would misname; Spark's
parquet scan raising on a missing name keeps it loud, not silent).

Scale notes: the metadata tier (manifest list + manifests) is
driver-side and kilobyte-to-megabyte sized BY DESIGN (that is
Iceberg's scaling story — file pruning without listing); the data path
is Spark parquet scans with Catalyst pushdown/pruning per partition
group, exactly as in ``sources/delta.py``.

A minimal v1 WRITER (``write_iceberg_table``) ships for fixtures and
round-trips: identity partitioning, one snapshot per call,
append/overwrite. Deliberately not a transactional sink.
"""

from __future__ import annotations

import json
import os
import re
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vector_db_spark.sources.avro_io import read_avro, write_avro

_META_DIR = "metadata"
_DATA_DIR = "data"


# ------------------------------------------------------------ schema mapping

_PRIM_TO_SPARK = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "date": T.DateType(),
    "timestamp": T.TimestampNTZType(),
    "timestamptz": T.TimestampType(),
    "string": T.StringType(),
    "uuid": T.StringType(),
    "binary": T.BinaryType(),
}


def _iceberg_type_to_spark(t) -> T.DataType:
    if isinstance(t, str):
        if t in _PRIM_TO_SPARK:
            return _PRIM_TO_SPARK[t]
        m = re.fullmatch(r"decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)", t)
        if m:
            return T.DecimalType(int(m.group(1)), int(m.group(2)))
        if re.fullmatch(r"fixed\[\d+\]", t):
            return T.BinaryType()
        raise NotImplementedError(f"Iceberg type {t!r}")
    kind = t.get("type")
    if kind == "struct":
        return T.StructType(
            [
                T.StructField(
                    f["name"],
                    _iceberg_type_to_spark(f["type"]),
                    not f.get("required", False),
                )
                for f in t["fields"]
            ]
        )
    if kind == "list":
        return T.ArrayType(
            _iceberg_type_to_spark(t["element"]),
            not t.get("element-required", False),
        )
    if kind == "map":
        return T.MapType(
            _iceberg_type_to_spark(t["key"]),
            _iceberg_type_to_spark(t["value"]),
            not t.get("value-required", False),
        )
    raise NotImplementedError(f"Iceberg type {t!r}")


_SPARK_TO_PRIM = {
    T.BooleanType(): "boolean",
    T.IntegerType(): "int",
    T.LongType(): "long",
    T.FloatType(): "float",
    T.DoubleType(): "double",
    T.DateType(): "date",
    T.TimestampNTZType(): "timestamp",
    T.TimestampType(): "timestamptz",
    T.StringType(): "string",
    T.BinaryType(): "binary",
}


def _spark_type_to_iceberg(dt: T.DataType, next_id) -> object:
    if dt in _SPARK_TO_PRIM:
        return _SPARK_TO_PRIM[dt]
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    if isinstance(dt, T.StructType):
        return {
            "type": "struct",
            "fields": [
                {
                    "id": next_id(),
                    "name": f.name,
                    "required": not f.nullable,
                    "type": _spark_type_to_iceberg(f.dataType, next_id),
                }
                for f in dt.fields
            ],
        }
    if isinstance(dt, T.ArrayType):
        return {
            "type": "list",
            "element-id": next_id(),
            "element-required": not dt.containsNull,
            "element": _spark_type_to_iceberg(dt.elementType, next_id),
        }
    if isinstance(dt, T.MapType):
        return {
            "type": "map",
            "key-id": next_id(),
            "value-id": next_id(),
            "value-required": not dt.valueContainsNull,
            "key": _spark_type_to_iceberg(dt.keyType, next_id),
            "value": _spark_type_to_iceberg(dt.valueType, next_id),
        }
    raise NotImplementedError(f"Spark type {dt.simpleString()} → Iceberg")


# avro branch for a partition value of the given ICEBERG type
_PRIM_TO_AVRO = {
    "boolean": "boolean",
    "int": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "date": "int",
    "timestamp": "long",
    "timestamptz": "long",
}


# ------------------------------------------------------------ metadata layer


def _metadata_path(table: str) -> str:
    meta = os.path.join(table, _META_DIR)
    if not os.path.isdir(meta):
        raise FileNotFoundError(f"not an Iceberg table (no {_META_DIR}/): {table}")
    hint = os.path.join(meta, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            n = int(f.read().strip())
        path = os.path.join(meta, f"v{n}.metadata.json")
        if os.path.exists(path):
            return path
    best = None
    for name in os.listdir(meta):
        m = re.fullmatch(r"v(\d+)\.metadata\.json", name)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), name)
    if best is None:
        raise FileNotFoundError(f"no v*.metadata.json under {meta}")
    return os.path.join(meta, best[1])


def _load_metadata(table: str) -> dict:
    with open(_metadata_path(table)) as f:
        md = json.load(f)
    fv = int(md.get("format-version", 1))
    if fv not in (1, 2):
        raise NotImplementedError(f"Iceberg format-version {fv}")
    return md


def _current_schema(md: dict) -> dict:
    if "schema" in md:  # v1 layout
        return md["schema"]
    sid = md["current-schema-id"]
    for s in md.get("schemas", []):
        if s.get("schema-id") == sid:
            return s
    raise ValueError(f"current-schema-id {sid} not found in metadata")


def _default_spec(md: dict) -> list[dict]:
    if "partition-spec" in md:  # v1 layout
        return md["partition-spec"]
    sid = md.get("default-spec-id", 0)
    for s in md.get("partition-specs", []):
        if s.get("spec-id") == sid:
            return s["fields"]
    return []


def _relocate(path: str, location: str, table: str) -> str:
    """Re-root a metadata-recorded URI onto the actual table dir (the
    spec records absolute paths; a copied table keeps reading)."""
    for prefix in (location, location.rstrip("/"), f"file://{location}"):
        if prefix and path.startswith(prefix):
            rel = path[len(prefix) :].lstrip("/")
            return os.path.join(table, rel)
    if path.startswith("file://"):
        return path[len("file://") :]
    if os.path.isabs(path):
        return path
    return os.path.join(table, path)


def _pick_snapshot(md: dict, snapshot_id: int | None) -> dict | None:
    snaps = md.get("snapshots") or []
    if snapshot_id is None:
        cur = md.get("current-snapshot-id")
        if cur is None or cur == -1:
            return None
        snapshot_id = cur
    for s in snaps:
        if s["snapshot-id"] == snapshot_id:
            return s
    raise ValueError(
        f"snapshot {snapshot_id} not in table metadata "
        f"(known: {[s['snapshot-id'] for s in snaps]})"
    )


def _live_data_files(
    spark: SparkSession, md: dict, snap: dict, table: str
) -> list[tuple[str, dict]]:
    """(relocated data file path, partition record) for every live data
    file of the snapshot; refuses v2 delete content loudly."""
    location = md.get("location", "")
    if "manifest-list" in snap:
        _, mf_entries = read_avro(_relocate(snap["manifest-list"], location, table))
    elif "manifests" in snap:  # v1 inline manifest list
        mf_entries = [{"manifest_path": p, "content": 0} for p in snap["manifests"]]
    else:
        raise ValueError(f"snapshot {snap.get('snapshot-id')} has no manifest list")
    out: list[tuple[str, dict]] = []
    for mf in mf_entries:
        if int(mf.get("content") or 0) != 0:
            raise NotImplementedError(
                "delete manifest (v2 row-level deletes): rows would be "
                "over-counted — refusing"
            )
        _, entries = read_avro(_relocate(mf["manifest_path"], location, table))
        for e in entries:
            if int(e.get("status") or 0) == 2:  # DELETED
                continue
            df_ = e["data_file"]
            if int(df_.get("content") or 0) != 0:
                raise NotImplementedError(
                    "delete data file (v2 row-level deletes): refusing"
                )
            fmt = str(df_.get("file_format", "PARQUET")).upper()
            if fmt != "PARQUET":
                raise NotImplementedError(f"Iceberg data file format {fmt!r}")
            out.append(
                (
                    _relocate(df_["file_path"], location, table),
                    dict(df_.get("partition") or {}),
                )
            )
    return out


# ------------------------------------------------------------------- reader


def read_iceberg(
    spark: SparkSession,
    table: str,
    snapshot_id: int | None = None,
    partition_filters: dict[str, object] | None = None,
) -> DataFrame:
    """Snapshot-read an Iceberg table as a DataFrame (``snapshot_id=``
    for time travel). Identity partition columns are restored from the
    manifest partition metadata (per spec) as typed literals; data files
    are grouped by partition tuple, one Catalyst scan per group.
    ``partition_filters`` prunes groups driver-side on IDENTITY
    partition fields (logical column names; values compared on the
    decoded partition values); filters on non-identity transforms raise
    — use ``.filter`` on the data columns, which the scan pushes down."""
    md = _load_metadata(table)
    schema = _iceberg_type_to_spark(
        {"type": "struct", "fields": _current_schema(md)["fields"]}
    )
    field_by_id = {f["id"]: f["name"] for f in _current_schema(md)["fields"]}
    spec = _default_spec(md)
    # identity partition fields: (partition-struct key, source column)
    identity = [
        (pf["name"], field_by_id[pf["source-id"]])
        for pf in spec
        if pf.get("transform") == "identity"
    ]
    id_cols = {src for _, src in identity}
    snap = _pick_snapshot(md, snapshot_id)
    if snap is None:
        return spark.createDataFrame([], schema)
    files = _live_data_files(spark, md, snap, table)

    if partition_filters:
        by_src = {src: key for key, src in identity}
        unknown = set(partition_filters) - set(by_src)
        if unknown:
            raise ValueError(
                f"partition_filters on non-identity-partition columns "
                f"{sorted(unknown)}; identity partition columns are "
                f"{sorted(by_src)} — use .filter() for data columns"
            )
        wanted = {
            by_src[c]: set(vals if isinstance(vals, (list, tuple, set)) else [vals])
            for c, vals in partition_filters.items()
        }
        files = [
            (p, pv)
            for p, pv in files
            if all(pv.get(k) in vs for k, vs in wanted.items())
        ]
    if not files:
        return spark.createDataFrame([], schema)

    data_fields = [f for f in schema.fields if f.name not in id_cols]
    data_schema = T.StructType(data_fields)
    by_name = {f.name: f for f in schema.fields}

    groups: dict[tuple, list[str]] = {}
    for path, pv in files:
        key = tuple(pv.get(k) for k, _ in identity)
        groups.setdefault(key, []).append(path)

    out = None
    for key, paths in sorted(
        groups.items(), key=lambda kv: tuple((v is not None, v) for v in kv[0])
    ):
        df = spark.read.schema(data_schema).parquet(*sorted(paths))
        for (pkey, src), raw in zip(identity, key):
            lit = (
                F.lit(None).cast(by_name[src].dataType)
                if raw is None
                else F.lit(raw).cast(by_name[src].dataType)
            )
            df = df.withColumn(src, lit)
        df = df.select(*[f.name for f in schema.fields])
        out = df if out is None else out.unionByName(df)
    return out


def iceberg_snapshots(table: str) -> list[int]:
    """Snapshot ids recorded in the current table metadata, in order."""
    return [s["snapshot-id"] for s in _load_metadata(table).get("snapshots") or []]


# ------------------------------------------------------------------- writer


def write_iceberg_table(
    df: DataFrame,
    table: str,
    partition_by: Sequence[str] = (),
    mode: str = "append",
) -> int:
    """Minimal format-version-1 Iceberg writer for fixtures/round-trips:
    identity partition spec only; each call commits one snapshot (a new
    manifest + manifest list + ``v<N>.metadata.json`` + version hint).
    ``overwrite`` starts a fresh file set (prior snapshots remain
    time-travelable — Iceberg never rewrites history). Single-writer,
    not a transactional sink (the engine's bucketed store is the native
    write path; this is interchange). Returns the new snapshot id."""
    if mode not in ("append", "overwrite"):
        raise ValueError("mode must be 'append' or 'overwrite'")
    import pyarrow.parquet as pq

    spark = df.sparkSession
    part_cols = list(partition_by)
    meta_dir = os.path.join(table, _META_DIR)
    os.makedirs(meta_dir, exist_ok=True)

    prior_md = None
    version = 1
    if os.path.exists(os.path.join(meta_dir, "version-hint.text")) or any(
        re.fullmatch(r"v\d+\.metadata\.json", n) for n in os.listdir(meta_dir)
    ):
        prior_md = _load_metadata(table)
        version = (
            max(
                int(re.fullmatch(r"v(\d+)\.metadata\.json", n).group(1))
                for n in os.listdir(meta_dir)
                if re.fullmatch(r"v\d+\.metadata\.json", n)
            )
            + 1
        )
        prior_schema = _iceberg_type_to_spark(
            {"type": "struct", "fields": _current_schema(prior_md)["fields"]}
        )
        if prior_schema != df.schema:
            raise ValueError(
                "schema mismatch with existing table (schema evolution is "
                "not in the fixture writer's scope)"
            )
        prior_part = [
            f["name"] for f in _default_spec(prior_md) if f["transform"] == "identity"
        ]
        if prior_part != part_cols:
            raise ValueError(
                f"partition_by {part_cols} differs from the table's spec "
                f"{prior_part}"
            )

    # ---- schema + spec JSON (ids assigned once, reused on later commits)
    if prior_md is None:
        counter = {"n": 0}

        def next_id() -> int:
            counter["n"] += 1
            return counter["n"]

        top_fields = []
        for f in df.schema.fields:
            fid = next_id()
            top_fields.append(
                {
                    "id": fid,
                    "name": f.name,
                    "required": not f.nullable,
                    "type": _spark_type_to_iceberg(f.dataType, next_id),
                }
            )
        schema_json = {"type": "struct", "schema-id": 0, "fields": top_fields}
        last_col_id = counter["n"]
        name_to_id = {f["name"]: f["id"] for f in top_fields}
        spec_json = [
            {
                "name": c,
                "transform": "identity",
                "source-id": name_to_id[c],
                "field-id": 1000 + i,
            }
            for i, c in enumerate(part_cols)
        ]
    else:
        schema_json = _current_schema(prior_md)
        last_col_id = prior_md.get("last-column-id", 0)
        spec_json = _default_spec(prior_md)

    iceberg_prim = {
        f["name"]: f["type"] for f in schema_json["fields"] if isinstance(f["type"], str)
    }
    for c in part_cols:
        if iceberg_prim.get(c) not in _PRIM_TO_AVRO:
            raise NotImplementedError(
                f"partition column {c!r} of type "
                f"{iceberg_prim.get(c)!r}: fixture writer partitions on "
                "primitive identity columns only"
            )

    # ---- data files (partitionBy staging, like the Delta writer)
    by_name = {f.name: f for f in df.schema.fields}
    staging = os.path.join(table, f"_staging_{uuid.uuid4().hex[:8]}")
    writer = df.write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(staging)

    def _typed(col: str, raw: str | None):
        if raw is None:
            return None
        t = iceberg_prim[col]
        if t in ("int", "long", "date", "timestamp", "timestamptz"):
            return int(raw)
        if t in ("float", "double"):
            return float(raw)
        if t == "boolean":
            return raw.lower() == "true"
        return raw

    snapshot_id = version  # deterministic, unique per commit
    data_root = os.path.join(table, _DATA_DIR)
    new_files: list[tuple[str, dict, int, int]] = []
    for root, _, names in os.walk(staging):
        for name in names:
            if not name.endswith(".parquet"):
                continue
            rel_dir = os.path.relpath(root, staging)
            pvals: dict[str, object] = {}
            if rel_dir != ".":
                for piece in rel_dir.split(os.sep):
                    col, _, val = piece.partition("=")
                    pvals[col] = (
                        None
                        if val == "__HIVE_DEFAULT_PARTITION__"
                        else _typed(col, val)
                    )
            dst_rel = os.path.join(
                _DATA_DIR, "" if rel_dir == "." else rel_dir, name
            )
            dst = os.path.join(table, dst_rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.replace(os.path.join(root, name), dst)
            fmeta = pq.read_metadata(dst)
            new_files.append(
                (dst_rel.replace(os.sep, "/"), pvals, fmeta.num_rows, os.path.getsize(dst))
            )
    import shutil

    shutil.rmtree(staging, ignore_errors=True)

    # ---- manifest avro
    part_avro_fields = [
        {
            "name": c,
            "type": ["null", _PRIM_TO_AVRO[iceberg_prim[c]]],
            "default": None,
        }
        for c in part_cols
    ]
    manifest_schema = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"], "default": None},
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {
                            "name": "partition",
                            "type": {
                                "type": "record",
                                "name": "r102",
                                "fields": part_avro_fields,
                            },
                        },
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                    ],
                },
            },
        ],
    }
    location = table
    manifest_name = f"manifest-{snapshot_id}-{uuid.uuid4().hex[:8]}.avro"
    manifest_path = os.path.join(meta_dir, manifest_name)
    write_avro(
        manifest_path,
        manifest_schema,
        [
            {
                "status": 1,  # ADDED
                "snapshot_id": snapshot_id,
                "data_file": {
                    "file_path": os.path.join(location, rel),
                    "file_format": "PARQUET",
                    "partition": {c: pv.get(c) for c in part_cols},
                    "record_count": nrows,
                    "file_size_in_bytes": size,
                },
            }
            for rel, pv, nrows, size in sorted(new_files)
        ],
    )

    # ---- manifest list avro (append keeps prior manifests live)
    mlist_schema = {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "manifest_length", "type": "long"},
            {"name": "partition_spec_id", "type": "int"},
            {"name": "content", "type": "int", "default": 0},
            {"name": "added_snapshot_id", "type": ["null", "long"], "default": None},
        ],
    }
    entries = [
        {
            "manifest_path": os.path.join(location, _META_DIR, manifest_name),
            "manifest_length": os.path.getsize(manifest_path),
            "partition_spec_id": 0,
            "content": 0,
            "added_snapshot_id": snapshot_id,
        }
    ]
    if mode == "append" and prior_md is not None:
        prev_snap = _pick_snapshot(prior_md, None)
        if prev_snap is not None and "manifest-list" in prev_snap:
            _, prev_entries = read_avro(
                _relocate(prev_snap["manifest-list"], prior_md.get("location", ""), table)
            )
            entries.extend(prev_entries)
    mlist_name = f"snap-{snapshot_id}-{uuid.uuid4().hex[:8]}.avro"
    write_avro(os.path.join(meta_dir, mlist_name), mlist_schema, entries)

    # ---- table metadata json + version hint
    snapshots = list((prior_md or {}).get("snapshots") or [])
    snapshots.append(
        {
            "snapshot-id": snapshot_id,
            "timestamp-ms": 0,
            "summary": {"operation": "append" if mode == "append" else "overwrite"},
            "manifest-list": os.path.join(location, _META_DIR, mlist_name),
            "schema-id": 0,
        }
    )
    md = {
        "format-version": 1,
        "table-uuid": (prior_md or {}).get("table-uuid", uuid.uuid4().hex),
        "location": location,
        "last-updated-ms": 0,
        "last-column-id": last_col_id,
        "schema": schema_json,
        "partition-spec": spec_json,
        "properties": {},
        "current-snapshot-id": snapshot_id,
        "snapshots": snapshots,
        "snapshot-log": [],
    }
    tmp = os.path.join(meta_dir, f"v{version}.metadata.json.tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(md, f)
    os.replace(tmp, os.path.join(meta_dir, f"v{version}.metadata.json"))
    with open(os.path.join(meta_dir, "version-hint.text.tmp"), "w") as f:
        f.write(str(version))
    os.replace(
        os.path.join(meta_dir, "version-hint.text.tmp"),
        os.path.join(meta_dir, "version-hint.text"),
    )
    return snapshot_id
