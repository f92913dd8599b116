"""Repo-side replica of the driver's attestation contract.

The driver canonicalizes every query's output with a pandas
``sort_values`` over all columns followed by a value hash; a container
column (``array<...>`` / ``map<...>``) is unhashable there and turns the
whole row red regardless of engine correctness (CORRECTNESS_r05:
``sketch_stats_orders``, ``TypeError: unhashable type: 'list'``).

These tests catch that class of regression before a driver round burns a
window slot (VERDICT r5 "Next round" #8):

* every registered query at sf0.001 must produce a schema free of
  Array/Map top-level columns (the exact shapes pandas' lexsort cannot
  hash), and
* the one previously-red query (``sketch_stats_orders``) additionally
  gets an engine-side error-bound assertion vs exact percentiles.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

SF = "/root/testdata/sf0.001"


def _container_cols(schema: T.StructType) -> list[str]:
    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType))
    ]


def test_all_registered_queries_canonicalizable(spark):
    """Driver-canonicalizer contract: no Array/Map output columns anywhere.

    Building each DataFrame is lazy for pure-declarative queries and runs
    the bounded eager prep (index fits, stream drains) for the rest — the
    same work the driver does, at the smallest fixture.
    """
    from vector_db_spark.queries import QUERIES

    bad: dict[str, list[str]] = {}
    errs: dict[str, str] = {}
    for name, fn in sorted(QUERIES.items()):
        try:
            df = fn(spark, SF)
        except Exception as e:  # noqa: BLE001 - collect all failures
            errs[name] = f"{type(e).__name__}: {e}"
            continue
        cols = _container_cols(df.schema)
        if cols:
            bad[name] = cols
    assert not errs, f"queries that failed to build at sf0.001: {errs}"
    assert not bad, f"container-typed output columns (driver-red): {bad}"


def test_oracles_are_subset_of_queries():
    from vector_db_spark.queries import ORACLES, QUERIES

    extra = set(ORACLES) - set(QUERIES)
    assert not extra, f"oracle entries without a query: {sorted(extra)}"


def test_sketch_stats_orders_error_bounds(spark):
    """The engine answer must sit within the sketches' stated error bounds
    of the exact values (HLL relative error ~2.3% at default p; KLL/GK
    percentile_approx with accuracy=10000 → rank error ≤ 1e-4·n)."""
    from vector_db_spark.queries import QUERIES
    from vector_db_spark.sources.fixtures import load_table

    got = QUERIES["sketch_stats_orders"](spark, SF).head()
    assert set(got.asDict()) == {"approx_custkeys", "p50", "p90", "p99"}

    orders = load_table(spark, SF, "orders")
    exact = orders.agg(
        F.countDistinct("o_custkey").alias("nd"),
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        F.expr("percentile(o_totalprice, 0.99)").alias("p99"),
    ).head()
    assert abs(got.approx_custkeys - exact.nd) / exact.nd < 0.05
    for q in ("p50", "p90", "p99"):
        assert abs(got[q] - exact[q]) / exact[q] < 0.02, q
