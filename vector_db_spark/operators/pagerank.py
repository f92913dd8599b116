"""PageRank over an edge list, in exact integer mass units.

Power iteration (Page et al. 1999) with damping d=0.85 for a FIXED number
of rounds. Floating-point PageRank cannot be hash-compared across engines
(per-node in-sums reduce in engine-chosen order), so mass is carried as
BIGINT micro-units (10^12 per node initially) and every step is integer
arithmetic with floor division — bit-identical on any engine, the same
trick the dedup/mixture family uses ("integer-arithmetic-then-one-divide",
pipeline_queries.py:6-9). Mass lost to flooring is deliberately dropped,
NOT redistributed: both engines drop exactly the same units.

Update rule per round, for damping in percent (85):

    contrib(e) = mass(src) DIV out_degree(src)
    mass'(v)   = base + (85 * Σ_in contrib) DIV 100
    base       = (100 - 85) * INIT DIV 100      (uniform teleport)

100 TB design: each round is ONE shuffle — edges equi-join the current
mass on src (edges re-use their (src)-hash partitioning across rounds),
then groupBy(dst) with map-side partial SUM of integer contributions.
Nodes without in-edges rejoin via a left join from the node frame.
Rounds are a Python loop that GROWS THE PLAN, not the data; for deep
iteration counts a caller would checkpoint every ~10 rounds (the CC
operator's lineage-cut pattern, dedup.py:419).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INIT_MASS = 10**12


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 5,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "id",
) -> DataFrame:
    """Integer-unit PageRank: returns (id, mass) after ``iters`` rounds.

    ``edges`` is directed (src, dst); ``nodes`` the vertex frame (ids
    with no edges still hold teleport mass). Overflow headroom: with N
    nodes total mass ≈ N·10^12, and the ``damping_pct · Σ`` product must
    stay under 2^63 — fine to ~10^5 nodes; larger graphs scale INIT_MASS
    down (callers pass pre-scaled edges/nodes; the gate graph is 2k).
    """
    if not 0 < damping_pct <= 100:
        raise ValueError("damping_pct must be in (0, 100]")
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # cut lineage once: the (possibly expensive) edge derivation would
    # otherwise be re-evaluated inside EVERY round's plan — iters+1
    # rebuilds of the kNN graph in the gate query (the CC operator's
    # localCheckpoint pattern, dedup.py:419)
    ed = e.join(deg, "src").localCheckpoint()
    n = nodes.select(F.col(id_col).alias("id")).localCheckpoint()
    base = (100 - damping_pct) * INIT_MASS // 100
    mass = n.select("id", F.lit(INIT_MASS).cast("long").alias("mass"))
    for _ in range(iters):
        contrib = (
            ed.join(mass, ed.src == mass.id)
            .select("dst", F.expr("mass div out_deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("insum"))
        )
        mass = n.join(contrib, n.id == contrib.dst, "left").select(
            "id",
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * coalesce(insum, 0L)) div 100")
            ).cast("long").alias("mass"),
        )
    return mass
