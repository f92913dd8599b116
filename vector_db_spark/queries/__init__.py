"""Declared engine queries + their DuckDB oracle SQL.

Each submodule registers (spark_callable, oracle_sql) pairs into the shared
registry; ``__spark_entry__.py`` exposes the registry to the driver.
Importing this package pulls in every query family.
"""

from vector_db_spark.queries.registry import ORACLES, QUERIES, query

from vector_db_spark.queries import (  # noqa: E402,F401
    ann_queries,
    collection_queries,
    multimodal_queries,
    pipeline_queries,
    relational_queries,
    streaming_queries,
    vector_queries,
)

__all__ = ["ORACLES", "QUERIES", "query"]
