"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All engine code lives in ``vector_db_spark/``; queries and their oracle
SQL register themselves in ``vector_db_spark.queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_db_spark.operators.knn import knn
from vector_db_spark.queries import ORACLES, QUERIES
from vector_db_spark.sources.fixtures import load_table

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: filtered exact kNN (SURVEY.md §7.1 M0) — for the
    embedding of vec_id 0, the 10 nearest rows of `embeddings` where
    label != 3; the reference's whole hot path (search + metadata filter,
    src/router/handle/search_index_handle.rs:46-102 +
    src/core/index/filter_index.rs) as one declarative plan:
    pushed-down filter → codegen'd L2² → TakeOrderedAndProject(10).
    """
    emb = load_table(spark, SMOKE_SF_DIR, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    qvec = [float(x) for x in qrow[0]]
    return knn(
        emb,
        qvec,
        10,
        metric="l2",
        predicate=F.col("label") != 3,
        keep_cols=("label",),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (subset: non-SQL-expressible ops
    are omitted and get the driver's rows-only check)."""
    return dict(ORACLES)
