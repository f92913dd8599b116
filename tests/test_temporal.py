"""asof_join / range_join_events edge semantics: ties at equal ts,
no-prior-match NULLs, tolerance expiry, bucket-boundary pairs."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from vector_db_spark.operators.temporal import asof_join, range_join_events


def _ts(s: str):
    return datetime.fromisoformat(s)


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 100),
            (1, _ts("2024-01-01 12:00:00"), 101),
            (2, _ts("2024-01-01 09:00:00"), 200),  # before any right row
            (2, _ts("2024-01-01 11:00:00"), 201),  # exactly at right ts
        ],
        "user_id long, ts timestamp, event_id long",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), 10.0),
            (1, _ts("2024-01-01 11:30:00"), 20.0),
            (2, _ts("2024-01-01 11:00:00"), 30.0),
        ],
        "user_id long, ts timestamp, price double",
    )
    return left, right


def test_asof_latest_at_or_before(spark, frames):
    left, right = frames
    got = {
        r.event_id: r.price_asof
        for r in asof_join(
            left, right, key_cols=("user_id",), right_cols=("price",)
        ).collect()
    }
    assert got[100] == 10.0   # 10:00 sees 09:30
    assert got[101] == 20.0   # 12:00 sees 11:30 (latest, not first)
    assert got[200] is None   # nothing at-or-before 09:00
    assert got[201] == 30.0   # exact-ts right row matches


def test_asof_tolerance_expires_stale_matches(spark, frames):
    left, right = frames
    got = {
        r.event_id: r.price_asof
        for r in asof_join(
            left,
            right,
            key_cols=("user_id",),
            right_cols=("price",),
            tolerance_seconds=1800,
        ).collect()
    }
    assert got[100] == 10.0   # 30 min old — inside tolerance
    assert got[101] == 20.0   # 30 min old — inside
    assert got[200] is None
    assert got[201] == 30.0   # age 0
    got2 = {
        r.event_id: r.price_asof
        for r in asof_join(
            left,
            right,
            key_cols=("user_id",),
            right_cols=("price",),
            tolerance_seconds=60,
        ).collect()
    }
    assert got2[100] is None  # 30 min old — beyond 60s tolerance
    assert got2[201] == 30.0


def test_asof_requires_payload(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="right_cols"):
        asof_join(left, right, key_cols=("user_id",))


def test_range_join_matches_naive_inequality(spark):
    from vector_db_spark.sources.fixtures import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    got = {
        (r.a_id, r.b_id)
        for r in range_join_events(
            ev, key_cols=("user_id",), window_seconds=900
        ).collect()
    }
    a = ev.select("user_id", F.col("event_id").alias("a_id"), F.col("ts").alias("a_ts"))
    b = ev.select(
        F.col("user_id").alias("u2"), F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_ts"),
    )
    naive = a.join(
        b,
        (F.col("user_id") == F.col("u2"))
        & (F.col("b_ts") > F.col("a_ts"))
        & (F.unix_micros("b_ts") - F.unix_micros("a_ts") <= 900 * 1_000_000),
    )
    want = {(r.a_id, r.b_id) for r in naive.collect()}
    assert got == want and len(got) > 0


def test_range_join_validation(spark):
    from vector_db_spark.sources.fixtures import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    with pytest.raises(ValueError, match="window_seconds"):
        range_join_events(ev, key_cols=("user_id",), window_seconds=0)


def test_asof_carries_whole_row_not_per_column(spark):
    """merge_asof semantics carry the entire latest right row, NULL
    fields included — per-column carry-forward mixed fields from
    DIFFERENT right rows (round-10 review)."""
    from vector_db_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [("k", 3_000_000_000)], "key string, us long"
    ).selectExpr("key", "timestamp_micros(us) AS ts")
    right = spark.createDataFrame(
        [("k", 1_000_000_000, 5, 10), ("k", 2_000_000_000, None, 20)],
        "key string, us long, a int, b int",
    ).selectExpr("key", "timestamp_micros(us) AS ts", "a", "b")
    row = asof_join(left, right, ("key",), right_cols=("a", "b")).head()
    assert row.a_asof is None and row.b_asof == 20  # newest ROW, not a chimera


def test_asof_null_ts_right_rows_never_match(spark):
    from vector_db_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [("k", 5_000_000)], "key string, us long"
    ).selectExpr("key", "timestamp_micros(us) AS ts")
    right = spark.createDataFrame(
        [("k", None, 7)], "key string, us long, price int"
    ).selectExpr("key", "timestamp_micros(us) AS ts", "price")
    row = asof_join(left, right, ("key",), right_cols=("price",)).head()
    assert row.price_asof is None  # a NULL ts can never be 'at or before'
