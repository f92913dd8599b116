"""vector_db_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference vector database
(SoraQaQ/vector_db, surveyed in SURVEY.md), re-expressed Spark-first.

The reference is a single-node in-memory vector store: create-index /
insert / upsert / top-k (optionally filtered) search / point lookup
(reference: src/router/mod.rs:1-7). This package rebuilds that capability
surface declaratively on the Spark DataFrame API — distances are native
Catalyst expressions (whole-stage codegen), top-k is ORDER BY + LIMIT
(TakeOrderedAndProject), metadata filtering is predicate pushdown into the
parquet scan — and extends it with the relational and LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing)
needed at 100 TB scale.

Layout:
    session.py            SparkSession builder (Arrow on, AQE on)
    sources/              fixture/table loading, collection catalog storage
    functions/            column-level function library (vector, text)
    operators/            dataflow operators (knn, dedup, ann, collections)
    plans/                plan-inspection helpers (pushdown / codegen asserts)
    streaming/            structured-streaming ingest
"""

__version__ = "0.1.0"
