from vector_db_spark.operators.knn import batch_knn, knn, pairwise_similarity

__all__ = ["batch_knn", "knn", "pairwise_similarity"]
