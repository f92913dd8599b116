"""Shared registry mapping query name -> (Spark callable, oracle SQL).

A query callable takes ``(spark, sf_dir)`` and returns a DataFrame; the
oracle is equivalent DuckDB SQL over the same parquet views, or None for
ops that aren't SQL-expressible (the driver then records a rows-only check).
Column names/aliases must match exactly between the two (driver contract,
__spark_entry__.py docstring).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a named engine query and its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
