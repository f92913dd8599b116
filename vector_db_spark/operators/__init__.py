from vector_db_spark.operators.knn import batch_knn, knn, pairwise_similarity
from vector_db_spark.operators.pq import ProductQuantizer

__all__ = ["ProductQuantizer", "batch_knn", "knn", "pairwise_similarity"]
