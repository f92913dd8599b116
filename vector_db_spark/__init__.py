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

# Curated public API — the operator surface a user composes directly.
from vector_db_spark.operators.ann import CosineLshIndex, IvfIndex  # noqa: E402
from vector_db_spark.operators.collections import (  # noqa: E402
    Collection,
    CollectionCatalog,
    delete_rows,
    merge_upsert,
)
from vector_db_spark.operators.dedup import (  # noqa: E402
    connected_components,
    dedup_clusters,
    exact_dedup,
    jaccard_pairs,
    lsh_star_edges,
    minhash_neardup,
    simhash64,
    simhash_candidates,
)
from vector_db_spark.operators.bm25 import bm25_scores, bm25_topk  # noqa: E402
from vector_db_spark.operators.hybrid import hybrid_search  # noqa: E402
from vector_db_spark.operators.knn import (  # noqa: E402
    batch_knn,
    batch_range_search,
    knn,
    pairwise_similarity,
    pairwise_similarity_blocked,
)
from vector_db_spark.operators.decontam import ngram_contamination  # noqa: E402
from vector_db_spark.operators.ivfpq import IvfPqIndex  # noqa: E402
from vector_db_spark.operators.packing import pack_sequences  # noqa: E402
from vector_db_spark.operators.pq import ProductQuantizer  # noqa: E402
from vector_db_spark.operators.quantize import ScalarQuantizer  # noqa: E402
from vector_db_spark.operators.sampling import (  # noqa: E402
    deterministic_sample,
    global_shuffle,
    stratified_sample,
    train_eval_split,
)
from vector_db_spark.operators.skew import salted_aggregate  # noqa: E402
from vector_db_spark.operators.temporal import (  # noqa: E402
    asof_join,
    range_join_events,
)
from vector_db_spark.session import get_spark  # noqa: E402

__all__ = [
    "Collection",
    "CollectionCatalog",
    "CosineLshIndex",
    "IvfIndex",
    "IvfPqIndex",
    "ProductQuantizer",
    "ScalarQuantizer",
    "asof_join",
    "batch_knn",
    "batch_range_search",
    "bm25_scores",
    "bm25_topk",
    "connected_components",
    "dedup_clusters",
    "delete_rows",
    "deterministic_sample",
    "global_shuffle",
    "exact_dedup",
    "get_spark",
    "hybrid_search",
    "jaccard_pairs",
    "knn",
    "lsh_star_edges",
    "merge_upsert",
    "minhash_neardup",
    "ngram_contamination",
    "pack_sequences",
    "pairwise_similarity",
    "pairwise_similarity_blocked",
    "range_join_events",
    "salted_aggregate",
    "simhash64",
    "simhash_candidates",
    "stratified_sample",
    "train_eval_split",
]
