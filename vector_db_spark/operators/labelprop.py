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

    PRECONDITION (ADVICE r15): every edge src must be a member of
    ``nodes`` (src ⊆ nodes). The sparse round rewrite synthesizes an
    absent src's label as its own id — correct for a node that has never
    won a plurality update, which is the dense formulation's value. An
    edge whose src is OUTSIDE the vertex frame would now vote with its
    own id where the old dense formulation (and the DuckDB oracle)
    dropped the edge via the inner label join. Every in-repo caller
    derives edges from the vertex frame, satisfying this; external
    callers with dangling srcs must pre-filter, e.g.
    ``edges.join(nodes, edges.src == nodes.id, "left_semi")``.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=False)
    n = nodes.select(F.col(id_col).alias("id")).localCheckpoint(eager=False)
    w = Window.partitionBy("dst").orderBy(
        F.col("votes").desc(), F.col("label").asc()
    )
    # r15 optimization (guide §2.4): the dense (id, label) frame used to
    # be rebuilt by a LEFT join after every round only so the next round
    # could look labels up again. But the winner frame already holds the
    # label of EVERY node with >= 1 in-edge (each such dst appears in the
    # plurality window exactly once per round), and the edge set is
    # static, so that key set never changes; a node absent from it has
    # never updated and still carries its initial label — its own id.
    # The loop therefore carries only the sparse winner frame and
    # synthesizes absent labels as coalesce(new_label, src); round 1 is
    # join-free (initial labels ARE the ids). One join + one exchange per
    # round removed; labels bit-identical to the dense formulation UNDER
    # THE src ⊆ nodes PRECONDITION in the docstring (a dangling src would
    # vote with its own id here where the dense form dropped the edge).
    # The node frame joins exactly once, at the end, to emit dense output.
    winner = None
    for r in range(iters):
        if r == 0:
            labelled = e.select("dst", F.col("src").alias("label"))
        else:
            prev = winner.select("wid", F.col("new_label").alias("_plab"))
            labelled = e.join(prev, e.src == prev.wid, "left").select(
                e.dst, F.coalesce("_plab", e.src).alias("label")
            )
        votes = labelled.groupBy("dst", "label").agg(
            F.count(F.lit(1)).alias("votes")
        )
        winner = (
            votes.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(F.col("dst").alias("wid"), F.col("label").alias("new_label"))
        )
    return n.join(winner, n.id == winner.wid, "left").select(
        "id", F.coalesce("new_label", "id").alias("label")
    )
