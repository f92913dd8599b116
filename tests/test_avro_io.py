"""Pure-Python Avro object-container codec (sources/avro_io.py) — the
metadata-tier decoder behind the Iceberg reader. Spark-free."""

from __future__ import annotations

import pytest

from vector_db_spark.sources.avro_io import read_avro, write_avro

_SCHEMA = {
    "type": "record",
    "name": "entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snap", "type": ["null", "long"], "default": None},
        {
            "name": "payload",
            "type": {
                "type": "record",
                "name": "inner",
                "fields": [
                    {"name": "path", "type": "string"},
                    {
                        "name": "partition",
                        "type": {
                            "type": "record",
                            "name": "part",
                            "fields": [
                                {"name": "lang", "type": ["null", "string"], "default": None}
                            ],
                        },
                    },
                    {"name": "tags", "type": {"type": "map", "values": "string"}},
                    {"name": "bounds", "type": {"type": "array", "items": "double"}},
                    {
                        "name": "kind",
                        "type": {"type": "enum", "name": "K", "symbols": ["A", "B"]},
                    },
                    {"name": "blob", "type": "bytes"},
                    {"name": "fx", "type": {"type": "fixed", "name": "F4", "size": 4}},
                    {"name": "flag", "type": "boolean"},
                    {"name": "ratio", "type": "float"},
                    {"name": "weight", "type": "double"},
                ],
            },
        },
    ],
}

_RECS = [
    {
        "status": 1,
        "snap": 1 << 62,
        "payload": {
            "path": "s3://bucket/p %20.parquet",
            "partition": {"lang": "en"},
            "tags": {"a": "b", "c": "d"},
            "bounds": [1.5, -2.25, 0.0],
            "kind": "B",
            "blob": b"\x00\x01\xff",
            "fx": b"abcd",
            "flag": True,
            "ratio": 0.5,
            "weight": -7.125,
        },
    },
    {
        "status": 0,
        "snap": None,
        "payload": {
            "path": "p2",
            "partition": {"lang": None},
            "tags": {},
            "bounds": [],
            "kind": "A",
            "blob": b"",
            "fx": b"wxyz",
            "flag": False,
            "ratio": -1.0,
            "weight": 0.0,
        },
    },
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(tmp_path, codec):
    path = str(tmp_path / "t.avro")
    write_avro(path, _SCHEMA, _RECS, codec=codec)
    schema, got = read_avro(path)
    assert schema == _SCHEMA
    assert got == _RECS


def test_empty_file_and_zigzag_extremes(tmp_path):
    path = str(tmp_path / "e.avro")
    write_avro(path, _SCHEMA, [])
    assert read_avro(path)[1] == []
    s = {"type": "record", "name": "n", "fields": [{"name": "x", "type": "long"}]}
    vals = [0, -1, 1, 63, -64, 64, (1 << 63) - 1, -(1 << 63)]
    write_avro(path, s, [{"x": v} for v in vals])
    assert [r["x"] for r in read_avro(path)[1]] == vals


def test_named_type_reference(tmp_path):
    s = {
        "type": "record",
        "name": "outer",
        "fields": [
            {"name": "a", "type": {"type": "fixed", "name": "Fx", "size": 2}},
            {"name": "b", "type": "Fx"},
        ],
    }
    path = str(tmp_path / "n.avro")
    write_avro(path, s, [{"a": b"xy", "b": b"zw"}])
    assert read_avro(path)[1] == [{"a": b"xy", "b": b"zw"}]


def test_corruption_is_loud(tmp_path):
    path = str(tmp_path / "bad.avro")
    with open(path, "wb") as f:
        f.write(b"PAR1not-avro")
    with pytest.raises(ValueError, match="not an Avro"):
        read_avro(path)
    # flipped sync marker
    good = str(tmp_path / "good.avro")
    s = {"type": "record", "name": "n", "fields": [{"name": "x", "type": "long"}]}
    write_avro(good, s, [{"x": 1}])
    buf = bytearray(open(good, "rb").read())
    buf[-1] ^= 0xFF
    with open(good, "wb") as f:
        f.write(bytes(buf))
    with pytest.raises(ValueError, match="sync marker"):
        read_avro(good)
