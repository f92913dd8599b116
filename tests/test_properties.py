"""Property-based tests (hypothesis): algebraic invariants of the DML and
distance layers that example-based tests can't sweep.

Strategy sizes are kept tiny (|rows| <= 24, dim <= 8) because every example
builds DataFrames through a live SparkSession — the point is the invariant,
not volume. deadline=None: Spark job latency is not a property failure.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vector_db_spark.functions.vector import cosine_sim, dot, l2_sq
from vector_db_spark.operators.collections import delete_rows, merge_upsert

_settings = settings(
    max_examples=10,  # each example runs real Spark jobs — keep the sweep tight
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

ids = st.integers(min_value=1, max_value=12)
vals = st.integers(min_value=-100, max_value=100)
rows = st.lists(st.tuples(ids, vals), min_size=1, max_size=24)


@pytest.fixture(scope="module")
def sc(spark):
    return spark


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "id long, v long")


@given(base=rows, updates=rows)
@_settings
def test_merge_upsert_key_unique_and_update_wins(sc, base, updates):
    merged = merge_upsert(_df(sc, base), _df(sc, updates), ("id",)).collect()
    got = {}
    for r in merged:
        assert r.id not in got, "duplicate key after merge"
        got[r.id] = r.v
    base_keys = {i for i, _ in base}
    upd_vals = {i: v for i, v in updates}  # last dup in updates arbitrary…
    for i, v in got.items():
        assert i in base_keys or i in upd_vals
        if i in upd_vals and len([1 for j, _ in updates if j == i]) == 1:
            assert v == upd_vals[i], "single-row update must win over base"
    assert set(got) == base_keys | set(upd_vals)


@given(base=rows)
@_settings
def test_merge_upsert_idempotent(sc, base):
    df = _df(sc, base)
    once = merge_upsert(df, df, ("id",))
    twice = merge_upsert(once, df, ("id",))
    assert sorted((r.id, r.v) for r in once.collect()) == sorted(
        (r.id, r.v) for r in twice.collect()
    )


@given(base=rows, doomed=st.lists(ids, max_size=8))
@_settings
def test_delete_removes_exactly_the_keys(sc, base, doomed):
    df = _df(sc, base)
    targets = sc.createDataFrame([(i,) for i in doomed] or [(None,)], "id long").filter(
        F.col("id").isNotNull()
    )
    left = delete_rows(df, targets, ("id",)).collect()
    left_keys = {r.id for r in left}
    assert left_keys == {i for i, _ in base} - set(doomed)


vecs = st.lists(
    st.floats(min_value=-8, max_value=8, allow_nan=False, width=32),
    min_size=1,
    max_size=8,
)


@given(a=vecs, b=vecs)
@_settings
def test_distance_function_identities(sc, a, b):
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    df = sc.createDataFrame(
        [(a, b)], "a array<double>, b array<double>"
    )
    row = df.select(
        l2_sq(F.col("a"), F.col("b")).alias("ab"),
        l2_sq(F.col("b"), F.col("a")).alias("ba"),
        l2_sq(F.col("a"), F.col("a")).alias("self"),
        dot(F.col("a"), F.col("b")).alias("dab"),
        dot(F.col("b"), F.col("a")).alias("dba"),
        cosine_sim(F.col("a"), F.col("b")).alias("cos"),
    ).head()
    assert row.ab == row.ba, "l2 symmetric"
    assert row.self == 0.0, "self distance exactly zero"
    assert row.dab == row.dba, "dot symmetric"
    assert row.ab >= 0.0
    if row.cos is not None and not math.isnan(row.cos):
        assert -1.0 - 1e-9 <= row.cos <= 1.0 + 1e-9
