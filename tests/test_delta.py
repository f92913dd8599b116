"""Delta Lake snapshot-reader interop (sources/delta.py): log replay,
partition restore, overwrite time travel, checkpoint reconstruction,
and the protocol refusal paths."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from vector_db_spark.sources.delta import (
    delta_versions,
    read_delta,
    write_checkpoint,
    write_delta_table,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_unpartitioned_roundtrip_and_append(spark, tmp_path):
    table = str(tmp_path / "plain")
    df = spark.createDataFrame(
        [(i, f"d{i}") for i in range(10)], "id long, name string"
    )
    assert write_delta_table(df, table) == 0
    got = read_delta(spark, table)
    assert got.schema == df.schema
    assert _rows(got) == _rows(df)
    more = spark.createDataFrame([(10, "d10")], "id long, name string")
    assert write_delta_table(more, table) == 1
    assert read_delta(spark, table).count() == 11
    assert read_delta(spark, table, version=0).count() == 10
    assert delta_versions(table) == [0, 1]


def test_partitioned_read_restores_typed_columns(spark, tmp_path):
    table = str(tmp_path / "parts")
    df = spark.createDataFrame(
        [(1, "en", 5), (2, "en", 7), (3, "de", 11), (4, None, 13)],
        "id long, lang string, n int",
    )
    write_delta_table(df, table, partition_by=["lang"])
    got = read_delta(spark, table)
    assert got.schema == df.schema  # partition col back in declared position/type
    assert _rows(got) == _rows(df)
    # partition-column predicate still correct through the group scans
    assert read_delta(spark, table).filter(F.col("lang") == "en").count() == 2


def test_overwrite_removes_old_files_and_time_travels(spark, tmp_path):
    table = str(tmp_path / "ow")
    v0 = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "id long, bucket int"
    )
    write_delta_table(v0, table, partition_by=["bucket"])
    v1 = spark.createDataFrame([(99, 0)], "id long, bucket int")
    assert write_delta_table(v1, table, mode="overwrite") == 1
    assert _rows(read_delta(spark, table)) == [(99, 0)]
    assert read_delta(spark, table, version=0).count() == 30
    with pytest.raises(ValueError, match="not in the Delta log"):
        read_delta(spark, table, version=7)


def test_checkpoint_plus_tail_reconstruction(spark, tmp_path):
    """A reader must start from the newest checkpoint <= target and
    replay only the JSON tail — prove it by deleting the checkpointed-
    away commits (exactly what log cleanup does on real tables)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = str(tmp_path / "ckpt")
    write_delta_table(
        spark.createDataFrame([(1,), (2,)], "id long"), table
    )
    write_delta_table(spark.createDataFrame([(3,)], "id long"), table)
    schema, part_cols, active, _ = __import__(
        "vector_db_spark.sources.delta", fromlist=["_replay"]
    )._replay(spark, table, 1)
    # hand-roll the v1 checkpoint: one row per live action
    rows = [
        {"protocol": {"minReaderVersion": 1}, "metaData": None, "add": None},
        {
            "protocol": None,
            "metaData": {
                "id": "x",
                "schemaString": schema.json(),
                "partitionColumns": [],
            },
            "add": None,
        },
    ] + [
        {
            "protocol": None,
            "metaData": None,
            "add": {"path": p, "partitionValues": dict(pv) or None},
        }
        for p, pv in active.items()
    ]
    pq.write_table(
        pa.Table.from_pylist(rows),
        os.path.join(table, "_delta_log", f"{1:020d}.checkpoint.parquet"),
    )
    with open(os.path.join(table, "_delta_log", "_last_checkpoint"), "w") as f:
        json.dump({"version": 1}, f)
    # retire the checkpointed commits; add a post-checkpoint commit
    os.remove(os.path.join(table, "_delta_log", f"{0:020d}.json"))
    os.remove(os.path.join(table, "_delta_log", f"{1:020d}.json"))
    write_delta_table(spark.createDataFrame([(4,)], "id long"), table)
    assert sorted(r.id for r in read_delta(spark, table).collect()) == [1, 2, 3, 4]


def test_protocol_refusals_are_loud(spark, tmp_path):
    table = str(tmp_path / "refuse")
    write_delta_table(spark.createDataFrame([(1,)], "id long"), table)
    # future reader protocol
    with open(os.path.join(table, "_delta_log", f"{1:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 3}}) + "\n")
    with pytest.raises(NotImplementedError, match="minReaderVersion 3"):
        read_delta(spark, table)
    os.remove(os.path.join(table, "_delta_log", f"{1:020d}.json"))
    # deletion vector on an add
    with open(os.path.join(table, "_delta_log", f"{1:020d}.json"), "w") as f:
        f.write(
            json.dumps(
                {
                    "add": {
                        "path": "nope.parquet",
                        "partitionValues": {},
                        "deletionVector": {"storageType": "u"},
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(NotImplementedError, match="deletion vector"):
        read_delta(spark, table)
    # not a delta table at all
    with pytest.raises(FileNotFoundError, match="_delta_log"):
        read_delta(spark, str(tmp_path / "missing"))


def test_empty_snapshot_after_full_remove(spark, tmp_path):
    table = str(tmp_path / "empty")
    write_delta_table(
        spark.createDataFrame([(1,), (2,)], "id long"), table
    )
    write_delta_table(
        spark.createDataFrame([], "id long"), table, mode="overwrite"
    )
    got = read_delta(spark, table)
    assert got.count() == 0 and got.schema.fieldNames() == ["id"]


def test_partition_filters_prune_groups_driver_side(spark, tmp_path):
    table = str(tmp_path / "pf")
    df = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "de"), (4, "fr")], "id long, lang string"
    )
    write_delta_table(df, table, partition_by=["lang"])
    got = read_delta(spark, table, partition_filters={"lang": "en"})
    assert sorted(r.id for r in got.collect()) == [1, 2]
    # the pruned plan never references the excluded partitions' files
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "lang=de" not in plan and "lang=fr" not in plan
    # list form, empty result, and the non-partition-column refusal
    got2 = read_delta(spark, table, partition_filters={"lang": ["de", "fr"]})
    assert sorted(r.id for r in got2.collect()) == [3, 4]
    assert read_delta(spark, table, partition_filters={"lang": "zz"}).count() == 0
    with pytest.raises(ValueError, match="non-partition columns"):
        read_delta(spark, table, partition_filters={"id": 1})


def test_version_beyond_newest_raises_even_with_checkpoint(spark, tmp_path):
    """ADVICE r14 medium: with a checkpoint present, time travel to a
    version past the newest commit must raise, never silently serve the
    latest snapshot under the requested label."""
    table = str(tmp_path / "beyond")
    write_delta_table(spark.createDataFrame([(1,), (2,)], "id long"), table)
    write_delta_table(spark.createDataFrame([(3,)], "id long"), table)
    write_checkpoint(spark, table)  # checkpoint at v1
    # sanity: checkpointed table still reads
    assert read_delta(spark, table).count() == 3
    with pytest.raises(ValueError, match="newest version is 1"):
        read_delta(spark, table, version=9)
    # in-range time travel still works through the checkpoint
    assert read_delta(spark, table, version=0).count() == 2


def test_missing_commit_above_checkpoint_raises(spark, tmp_path):
    """Commits may be retired only BELOW the checkpoint; a hole above it
    means the snapshot is unreconstructable and must be loud."""
    table = str(tmp_path / "hole")
    for i in range(3):
        write_delta_table(spark.createDataFrame([(i,)], "id long"), table)
    write_checkpoint(spark, table)  # at v2
    write_delta_table(spark.createDataFrame([(3,)], "id long"), table)  # v3
    write_delta_table(spark.createDataFrame([(4,)], "id long"), table)  # v4
    os.remove(os.path.join(table, "_delta_log", f"{3:020d}.json"))
    with pytest.raises(FileNotFoundError, match="missing commit 3"):
        read_delta(spark, table)
    # below-checkpoint retirement stays tolerated
    os.remove(os.path.join(table, "_delta_log", f"{0:020d}.json"))
    assert read_delta(spark, table, version=2).count() == 3


def test_url_encoded_add_paths_decode(spark, tmp_path):
    """The protocol percent-encodes paths; an encoded add must resolve
    to the on-disk file (delta-spark writes '%20' for spaces etc.)."""
    table = str(tmp_path / "enc")
    write_delta_table(
        spark.createDataFrame([(1,), (2,)], "id long").coalesce(1), table
    )
    # rename the data file to one with a space, re-point the log via an
    # encoded path (overwrite semantics: remove old, add encoded new)
    _, _, active, _ = __import__(
        "vector_db_spark.sources.delta", fromlist=["_replay"]
    )._replay(spark, table, None)
    (old,) = active
    os.replace(os.path.join(table, old), os.path.join(table, "part one.parquet"))
    with open(os.path.join(table, "_delta_log", f"{1:020d}.json"), "w") as f:
        f.write(json.dumps({"remove": {"path": old, "dataChange": True}}) + "\n")
        f.write(
            json.dumps(
                {
                    "add": {
                        "path": "part%20one.parquet",
                        "partitionValues": {},
                        "dataChange": True,
                    }
                }
            )
            + "\n"
        )
    assert sorted(r.id for r in read_delta(spark, table).collect()) == [1, 2]


def test_multipart_checkpoint_roundtrip_and_incomplete_refusal(spark, tmp_path):
    table = str(tmp_path / "mp")
    df = spark.createDataFrame(
        [(i, i % 4) for i in range(40)], "id long, b int"
    )
    write_delta_table(df, table, partition_by=["b"])
    write_delta_table(
        spark.createDataFrame([(100, 0)], "id long, b int"), table
    )
    v = write_checkpoint(spark, table, parts=3)
    assert v == 1
    log = os.path.join(table, "_delta_log")
    names = sorted(os.listdir(log))
    assert f"{1:020d}.checkpoint.{1:010d}.{3:010d}.parquet" in names
    # retire ALL commit json: the read must come from the parts alone
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))
    assert read_delta(spark, table).count() == 41
    # drop one part: loud refusal, not a silent subset
    os.remove(os.path.join(log, f"{1:020d}.checkpoint.{2:010d}.{3:010d}.parquet"))
    with pytest.raises(FileNotFoundError, match="incomplete"):
        read_delta(spark, table)


def test_column_mapping_name_mode_roundtrip(spark, tmp_path):
    table = str(tmp_path / "cm")
    df = spark.createDataFrame(
        [(1, "en", 5), (2, "en", 7), (3, "de", 11), (4, None, 13)],
        "id long, lang string, n int",
    )
    write_delta_table(df, table, partition_by=["lang"], column_mapping="name")
    got = read_delta(spark, table)
    assert got.schema.fieldNames() == ["id", "lang", "n"]
    assert _rows(got.select("id", "lang", "n")) == _rows(df)
    # physical names actually on disk: partition dirs + parquet columns
    import pyarrow.parquet as pq

    phys_dirs = [d for d in os.listdir(table) if d.startswith("col-")]
    assert phys_dirs, "partition dirs should use physical names"
    data_file = next(
        os.path.join(r, f)
        for r, _, fs in os.walk(table)
        for f in fs
        if f.endswith(".parquet") and "_delta_log" not in r
    )
    assert all(c.startswith("col-") for c in pq.read_schema(data_file).names)
    # append inherits the mapping; logical partition_filters still prune
    write_delta_table(
        spark.createDataFrame([(5, "en", 17)], "id long, lang string, n int"),
        table,
        partition_by=["lang"],
    )
    got2 = read_delta(spark, table, partition_filters={"lang": "en"})
    assert sorted(r.id for r in got2.collect()) == [1, 2, 5]
    # checkpointed read keeps the logical schema
    write_checkpoint(spark, table, parts=2)
    assert read_delta(spark, table).count() == 5


def test_column_mapping_id_mode_refused(spark, tmp_path):
    table = str(tmp_path / "cmid")
    write_delta_table(spark.createDataFrame([(1,)], "id long"), table)
    with open(os.path.join(table, "_delta_log", f"{1:020d}.json"), "w") as f:
        f.write(
            json.dumps(
                {
                    "metaData": {
                        "id": "x",
                        "format": {"provider": "parquet"},
                        "schemaString": spark.createDataFrame(
                            [(1,)], "id long"
                        ).schema.json(),
                        "partitionColumns": [],
                        "configuration": {"delta.columnMapping.mode": "id"},
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(NotImplementedError, match="column mapping mode 'id'"):
        read_delta(spark, table)


def test_reader_features_gate(spark, tmp_path):
    table = str(tmp_path / "feat")
    write_delta_table(spark.createDataFrame([(1,)], "id long"), table)
    # protocol 3 limited to columnMapping: supported
    with open(os.path.join(table, "_delta_log", f"{1:020d}.json"), "w") as f:
        f.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["columnMapping"],
                    }
                }
            )
            + "\n"
        )
    assert read_delta(spark, table).count() == 1
    # protocol 3 with deletion vectors: refused
    with open(os.path.join(table, "_delta_log", f"{2:020d}.json"), "w") as f:
        f.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "readerFeatures": ["columnMapping", "deletionVectors"],
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(NotImplementedError, match="deletionVectors"):
        read_delta(spark, table)
