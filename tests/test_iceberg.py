"""Iceberg snapshot-reader interop (sources/iceberg.py): metadata
discovery, manifest replay, identity-partition restore, time travel,
relocation, and the v2 refusal paths."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from vector_db_spark.sources.avro_io import read_avro, write_avro
from vector_db_spark.sources.iceberg import (
    iceberg_snapshots,
    read_iceberg,
    write_iceberg_table,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_unpartitioned_roundtrip_append_and_time_travel(spark, tmp_path):
    table = str(tmp_path / "plain")
    df = spark.createDataFrame(
        [(i, f"d{i}") for i in range(10)], "id long, name string"
    )
    s1 = write_iceberg_table(df, table)
    got = read_iceberg(spark, table)
    assert got.schema == df.schema
    assert _rows(got) == _rows(df)
    more = spark.createDataFrame([(10, "d10")], "id long, name string")
    s2 = write_iceberg_table(more, table)
    assert iceberg_snapshots(table) == [s1, s2]
    assert read_iceberg(spark, table).count() == 11
    assert read_iceberg(spark, table, snapshot_id=s1).count() == 10
    with pytest.raises(ValueError, match="snapshot 999"):
        read_iceberg(spark, table, snapshot_id=999)


def test_partitioned_identity_restore(spark, tmp_path):
    table = str(tmp_path / "parts")
    df = spark.createDataFrame(
        [(1, "en", 5), (2, "en", 7), (3, "de", 11), (4, None, 13)],
        "id long, lang string, n int",
    )
    write_iceberg_table(df, table, partition_by=["lang"])
    got = read_iceberg(spark, table)
    assert got.schema == df.schema
    assert _rows(got) == _rows(df)
    assert read_iceberg(spark, table).filter(F.col("lang") == "en").count() == 2
    # partition values live in the manifests, typed — not parsed from paths
    got2 = read_iceberg(spark, table, partition_filters={"lang": "en"})
    assert sorted(r.id for r in got2.collect()) == [1, 2]
    plan = got2._jdf.queryExecution().executedPlan().toString()
    assert "lang=de" not in plan
    assert read_iceberg(spark, table, partition_filters={"lang": ["de"]}).count() == 1
    with pytest.raises(ValueError, match="non-identity-partition"):
        read_iceberg(spark, table, partition_filters={"id": 1})


def test_overwrite_keeps_history(spark, tmp_path):
    table = str(tmp_path / "ow")
    v1 = spark.createDataFrame([(i, i % 3) for i in range(30)], "id long, b int")
    s1 = write_iceberg_table(v1, table, partition_by=["b"])
    s2 = write_iceberg_table(
        spark.createDataFrame([(99, 0)], "id long, b int"),
        table,
        partition_by=["b"],
        mode="overwrite",
    )
    assert _rows(read_iceberg(spark, table)) == [(99, 0)]
    assert read_iceberg(spark, table, snapshot_id=s1).count() == 30
    assert iceberg_snapshots(table) == [s1, s2]


def test_relocated_table_still_reads(spark, tmp_path):
    """file_path entries are absolute URIs under the writer's location;
    a moved/copied table must re-root them (spec: location is metadata,
    not a law of physics)."""
    src = str(tmp_path / "orig")
    write_iceberg_table(
        spark.createDataFrame([(1, "x"), (2, "y")], "id long, s string"), src
    )
    dst = str(tmp_path / "moved")
    os.rename(src, dst)
    assert read_iceberg(spark, dst).count() == 2


def test_v2_delete_refusals_are_loud(spark, tmp_path):
    table = str(tmp_path / "v2")
    write_iceberg_table(spark.createDataFrame([(1,)], "id long"), table)
    meta = os.path.join(table, "metadata")
    # locate the snapshot's manifest list and flip its content to 1
    md = json.load(open(os.path.join(meta, "v1.metadata.json")))
    mlist = md["snapshots"][0]["manifest-list"]
    schema, entries = read_avro(mlist)
    entries[0]["content"] = 1
    write_avro(mlist, schema, entries)
    with pytest.raises(NotImplementedError, match="delete manifest"):
        read_iceberg(spark, table)
    # restore, then mark the data file itself as a delete file
    entries[0]["content"] = 0
    write_avro(mlist, schema, entries)
    mpath = entries[0]["manifest_path"]
    mschema, mentries = read_avro(mpath)
    # inject a content field by rewriting with an extended schema
    df_fields = mschema["fields"][2]["type"]["fields"]
    df_fields.append({"name": "content", "type": "int", "default": 0})
    for e in mentries:
        e["data_file"]["content"] = 2
    write_avro(mpath, mschema, mentries)
    with pytest.raises(NotImplementedError, match="delete data file"):
        read_iceberg(spark, table)
    for e in mentries:
        e["data_file"]["content"] = 0
        e["data_file"]["file_format"] = "ORC"
    write_avro(mpath, mschema, mentries)
    with pytest.raises(NotImplementedError, match="ORC"):
        read_iceberg(spark, table)


def test_deleted_entries_are_dropped(spark, tmp_path):
    table = str(tmp_path / "del")
    write_iceberg_table(
        spark.createDataFrame([(1,), (2,)], "id long").coalesce(1), table
    )
    write_iceberg_table(
        spark.createDataFrame([(3,)], "id long").coalesce(1), table
    )
    # mark the second commit's file DELETED in its manifest
    md = json.load(
        open(os.path.join(table, "metadata", "v2.metadata.json"))
    )
    mlist = md["snapshots"][-1]["manifest-list"]
    _, entries = read_avro(mlist)
    newest = [e for e in entries if e["added_snapshot_id"] == 2]
    mschema, mentries = read_avro(newest[0]["manifest_path"])
    for e in mentries:
        e["status"] = 2  # DELETED
    write_avro(newest[0]["manifest_path"], mschema, mentries)
    assert sorted(r.id for r in read_iceberg(spark, table).collect()) == [1, 2]


def test_not_a_table_and_writer_guards(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="metadata"):
        read_iceberg(spark, str(tmp_path / "missing"))
    table = str(tmp_path / "g")
    write_iceberg_table(
        spark.createDataFrame([(1, "a")], "id long, s string"), table
    )
    with pytest.raises(ValueError, match="schema mismatch"):
        write_iceberg_table(spark.createDataFrame([(1,)], "id long"), table)
    with pytest.raises(ValueError, match="partition_by"):
        write_iceberg_table(
            spark.createDataFrame([(1, "a")], "id long, s string"),
            table,
            partition_by=["s"],
        )
