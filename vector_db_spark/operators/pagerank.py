"""PageRank over an edge list, in exact integer mass units.

Power iteration (Page et al. 1999) with damping d=0.85 for a FIXED number
of rounds. Floating-point PageRank cannot be hash-compared across engines
(per-node in-sums reduce in engine-chosen order), so mass is carried as
BIGINT micro-units (10^12 per node initially, auto-scaled down by node
count so int64 provably never overflows — see auto_init_mass) and every
step is integer
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


def auto_init_mass(n_nodes: int, damping_pct: int = 85) -> int:
    """Largest per-node initial mass (capped at INIT_MASS=10^12) that
    PROVABLY keeps every intermediate of the update rule inside int64 at
    ``n_nodes`` nodes.

    Total mass only shrinks round over round (flooring drops units, the
    teleport base redistributes at most what damping removed), so the
    hottest intermediate is ``damping_pct · Σ_in contrib`` with
    Σ_in contrib ≤ N·init — bounding ``100 · N · init ≤ 2^63−1`` covers
    every damping_pct in (0, 100]. At N=10^7 this still leaves ~9.2e9
    units of resolution per node; precision degrades gracefully as N
    grows instead of raising ANSI overflow."""
    if n_nodes < 1:
        return INIT_MASS
    return max(1, min(INIT_MASS, (2**63 - 1) // (100 * n_nodes)))


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 5,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "id",
    init_mass: int | None = None,
) -> DataFrame:
    """Integer-unit PageRank: returns (id, mass) after ``iters`` rounds.

    ``edges`` is directed (src, dst); ``nodes`` the vertex frame (ids
    with no edges still hold teleport mass). ``init_mass=None`` (the
    default) COMPUTES the per-node unit from count(nodes) via
    ``auto_init_mass`` so the ``damping_pct · Σ`` product provably fits
    int64 at any graph size — graphs up to ~9.2e14 nodes never overflow,
    and graphs ≤ ~10^5 nodes keep the full 10^12-unit resolution (the
    gate graph's 2k nodes are unaffected: auto == INIT_MASS there).
    Passing an explicit ``init_mass`` pins the unit (cross-engine oracle
    reproducibility at a chosen resolution).

    PRECONDITION (ADVICE r15): every edge src must be a member of
    ``nodes`` (src ⊆ nodes). The sparse round rewrite synthesizes the
    teleport-base mass for any src absent from the per-round in-sum
    frame — under the precondition that src is simply a node that
    received no in-mass, which is exactly the dense formulation's value.
    An edge whose src is OUTSIDE the vertex frame, however, would now
    contribute base mass where the old dense formulation (and the DuckDB
    oracle) dropped it via the inner mass join. Every in-repo caller
    derives edges from the vertex frame, satisfying this; external
    callers with dangling srcs must pre-filter, e.g.
    ``edges.join(nodes, edges.src == nodes.id, "left_semi")``.
    """
    if not 0 < damping_pct <= 100:
        raise ValueError("damping_pct must be in (0, 100]")
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # cut lineage once: the (possibly expensive) edge derivation would
    # otherwise be re-evaluated inside EVERY round's plan — iters+1
    # rebuilds of the kNN graph in the gate query (the CC operator's
    # localCheckpoint pattern, dedup.py:419). Lazy (eager=False): the
    # lineage cut happens at plan level either way, and the first real
    # action materializes it — no standalone checkpoint job (r15 opt).
    ed = e.join(deg, "src").localCheckpoint(eager=False)
    n = nodes.select(F.col(id_col).alias("id")).localCheckpoint(eager=False)
    if init_mass is None:
        # the count materializes the lazy checkpoint (one job, not two)
        init_mass = auto_init_mass(n.count(), damping_pct)
    base = (100 - damping_pct) * init_mass // 100
    # r15 optimization (guide §2.4 — remove shuffles outright): the node
    # frame used to be LEFT-joined back after every round to rebuild a
    # dense (id, mass) frame, costing a join + an exchange per round whose
    # only purpose was carrying "no in-edges ⇒ mass = base" rows that the
    # NEXT round's contribution join could have synthesized itself. The
    # loop now carries only the sparse per-round in-sum frame
    # (dst, insum); the mass of any src absent from it is the constant
    # ``base``, reproduced exactly by coalesce(insum, 0) inside the
    # contribution expression. Integer arithmetic, order of operations
    # and flooring are IDENTICAL to the dense formulation, so every
    # mass value is bit-equal UNDER THE src ⊆ nodes PRECONDITION in the
    # docstring (a dangling src would get base mass here where the dense
    # form dropped it); the node frame is joined exactly once, at
    # the end, to emit the dense result. Per-round plan shape drops from
    # {mass join on id, groupBy dst, node left-join} to {left join on the
    # previous in-sum (both sides already hash-partitioned on their join
    # key), groupBy dst} — and round 1 is join-free (every node's mass is
    # the init constant).
    _mass_from = (
        lambda insum_col: (
            F.lit(base)
            + F.expr(f"({damping_pct} * coalesce({insum_col}, 0L)) div 100")
        ).cast("long")
    )
    insum = None
    for r in range(iters):
        if r == 0:
            contrib = ed.select(
                "dst",
                F.expr(f"{int(init_mass)}L div out_deg").alias("c"),
            )
        else:
            prev = insum.select(
                F.col("dst").alias("_jid"), F.col("insum").alias("_insum")
            )
            contrib = (
                ed.join(prev, ed.src == prev._jid, "left")
                .withColumn("_mass", _mass_from("_insum"))
                .select(ed.dst, F.expr("_mass div out_deg").alias("c"))
            )
        insum = contrib.groupBy("dst").agg(F.sum("c").alias("insum"))
    return n.join(insum, n.id == insum.dst, "left").select(
        "id", _mass_from("insum").alias("mass")
    )
