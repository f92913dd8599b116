"""Synchronous label propagation (community detection) on an edge list.

LPA (Raghavan et al. 2007) in its deterministic synchronous form: every
round, each node adopts the plurality label among its in-neighbors, ties
broken toward the SMALLER label, nodes with no in-edges keep their label.
A fixed round count (not convergence detection) keeps the result
engine-portable — all arithmetic is integer counting, so the gate is an
ordinary value hash against an unrolled-CTE oracle.

Complements the other two graph operators: connected components
(dedup.py:419) finds *reachability* structure, PageRank (pagerank.py)
finds *centrality*; LPA finds *density* communities — on a kNN graph,
clusters of mutually-similar vectors without training a quantizer.

100 TB design: each round is one equi-join of the edge list with the
current (node, label) frame plus one (dst, label) count shuffle and one
plurality window — the same bounded per-round shape as PageRank, with
the same lineage discipline (edges checkpointed once, labels carried
forward; deep runs would cut label lineage every ~10 rounds like CC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "id",
) -> DataFrame:
    """Run ``iters`` synchronous LPA rounds; returns (id, label).

    Initial labels are the node ids (the standard seeding). ``edges``
    is directed (src, dst) — callers wanting undirected semantics pass
    the symmetrized list.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint()
    n = nodes.select(F.col(id_col).alias("id")).localCheckpoint()
    lab = n.select("id", F.col("id").alias("label"))
    w = Window.partitionBy("dst").orderBy(
        F.col("votes").desc(), F.col("label").asc()
    )
    for _ in range(iters):
        votes = (
            e.join(lab, e.src == lab.id)
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("votes"))
        )
        winner = (
            votes.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(F.col("dst").alias("wid"), F.col("label").alias("new_label"))
        )
        lab = lab.join(winner, lab.id == winner.wid, "left").select(
            "id", F.coalesce("new_label", "label").alias("label")
        )
    return lab
