from vector_db_spark.functions.vector import (
    cosine_sim,
    dot,
    l2_norm,
    l2_sq,
    normalize,
)

__all__ = ["cosine_sim", "dot", "l2_norm", "l2_sq", "normalize"]
