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


def test_refusals_are_loud(spark, tmp_path):
    table = str(tmp_path / "refuse")
    write_iceberg_table(spark.createDataFrame([(1,)], "id long"), table)
    md = json.load(open(os.path.join(table, "metadata", "v1.metadata.json")))
    mlist = md["snapshots"][0]["manifest-list"]
    _, entries = read_avro(mlist)
    mpath = entries[0]["manifest_path"]
    mschema, mentries = read_avro(mpath)
    # unknown content value on the data file
    for e in mentries:
        e["data_file"]["content"] = 3
    write_avro(mpath, mschema, mentries)
    with pytest.raises(NotImplementedError, match="content 3"):
        read_iceberg(spark, table)
    # equality delete without equality_ids
    for e in mentries:
        e["data_file"]["content"] = 2
        e["data_file"]["equality_ids"] = None
    write_avro(mpath, mschema, mentries)
    with pytest.raises(NotImplementedError, match="equality_ids"):
        read_iceberg(spark, table)
    # non-parquet data file
    for e in mentries:
        e["data_file"]["content"] = 0
        e["data_file"]["file_format"] = "ORC"
    write_avro(mpath, mschema, mentries)
    with pytest.raises(NotImplementedError, match="ORC"):
        read_iceberg(spark, table)


def test_position_deletes_roundtrip_and_time_travel(spark, tmp_path):
    """v2 position deletes: predicate delete drops exactly the matching
    rows; the pre-delete snapshot still serves every row (deletes are
    new metadata, never rewrites)."""
    from vector_db_spark.sources.iceberg import delete_from_iceberg

    table = str(tmp_path / "posdel")
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de", i * 10) for i in range(40)],
        "id long, lang string, n int",
    )
    s1 = write_iceberg_table(
        df, table, partition_by=["lang"], format_version=2
    )
    s2 = delete_from_iceberg(spark, table, F.col("n") >= 250)
    got = read_iceberg(spark, table)
    assert sorted(r.id for r in got.collect()) == list(range(25))
    # partition columns still restore through the delete path
    assert got.filter(F.col("lang") == "de").count() == 12
    # pre-delete snapshot unaffected; snapshot history intact
    assert read_iceberg(spark, table, snapshot_id=s1).count() == 40
    assert iceberg_snapshots(table) == [s1, s2]
    # deleting from a v1 table is refused loudly
    t1 = str(tmp_path / "v1t")
    write_iceberg_table(spark.createDataFrame([(1,)], "id long"), t1)
    with pytest.raises(NotImplementedError, match="format-version 2"):
        delete_from_iceberg(spark, t1, F.col("id") == 1)


def test_equality_deletes_sequence_guard(spark, tmp_path):
    """v2 equality deletes observe sequence ordering: keys deleted at
    sequence s remove rows from sequences < s only — a row re-inserted
    with the same key AFTER the delete survives (the spec ordering a
    naive global anti-join gets wrong)."""
    from vector_db_spark.sources.iceberg import write_iceberg_equality_deletes

    table = str(tmp_path / "eqdel")
    write_iceberg_table(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id long, s string"
        ),
        table,
        format_version=2,
    )
    keys = spark.createDataFrame([(1,), (3,)], "id long")
    write_iceberg_equality_deletes(keys, table, ["id"])
    assert sorted(r.id for r in read_iceberg(spark, table).collect()) == [2]
    # re-insert id=1 AFTER the delete: must survive
    write_iceberg_table(
        spark.createDataFrame([(1, "a2")], "id long, s string"), table
    )
    got = {(r.id, r.s) for r in read_iceberg(spark, table).collect()}
    assert got == {(1, "a2"), (2, "b")}
    # unknown key column is loud
    with pytest.raises(ValueError, match="key_cols"):
        write_iceberg_equality_deletes(keys, table, ["nope"])


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


def test_relocate_matches_component_boundary():
    """/tmp/x-other is not under location /tmp/x — a sibling dir
    sharing a name prefix must not be re-rooted."""
    from vector_db_spark.sources.iceberg import _relocate

    assert _relocate("/tmp/x/data/f.parquet", "/tmp/x", "/new") == os.path.join(
        "/new", "data/f.parquet"
    )
    assert _relocate("file:///tmp/x/d/f", "/tmp/x/", "/new") == "/new/d/f"
    # sibling prefix stays absolute (outside the table)
    assert _relocate("/tmp/x-other/f", "/tmp/x", "/new") == "/tmp/x-other/f"
    assert _relocate("rel/f.parquet", "/tmp/x", "/new") == "/new/rel/f.parquet"
