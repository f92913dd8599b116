"""Relational query family, part 2 (round 2): the canonical shapes part 1
didn't cover — correlated scalar subqueries, multi-dim profit rollups,
top-n-by-aggregate with joins, conditional-aggregate ratios, HAVING
semi-joins, disjunctive multi-attribute join predicates, lag/lead, and
ntile — each verified against DuckDB.

Adaptations from classic TPC-H where the synthetic fixtures lack a column
(no partsupp/l_shipmode/l_commitdate): the SHAPE (join graph + operator
pattern) is preserved on the columns that exist.

Same determinism rules as part 1 (DECIMAL(38,6) sums, total orders,
round(_, 6) on float outputs) and the same scale discipline (small dims
broadcast; fact-fact joins shuffle on keys under AQE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_db_spark.queries.registry import query
from vector_db_spark.queries.relational_queries import _dsum, _t

# --------------------------------------------------------------------------
# Q2 shape: correlated scalar subquery (value = per-group min)
# --------------------------------------------------------------------------

_Q2_ORACLE = """
SELECT p.p_brand, p.p_partkey, p.p_retailprice
FROM part p
WHERE p.p_size <= 10
  AND p.p_retailprice = (
    SELECT min(p2.p_retailprice) FROM part p2
    WHERE p2.p_brand = p.p_brand AND p2.p_size <= 10
  )
"""


@query("tpch_q2_min_cost", oracle=_Q2_ORACLE)
def tpch_q2_min_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (Q2's min-cost-supplier pattern on the
    columns the fixture has): rows equal to their group's minimum. The
    Spark formulation is a window min — one shuffle on the group key,
    no self-join, no per-row subquery execution."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    w = Window.partitionBy("p_brand")
    return (
        part.withColumn("__min", F.min("p_retailprice").over(w))
        .filter(F.col("p_retailprice") == F.col("__min"))
        .select("p_brand", "p_partkey", "p_retailprice")
    )


# --------------------------------------------------------------------------
# Q9 shape: profit by nation x year through a 4-way join
# --------------------------------------------------------------------------

_Q9_ORACLE = """
SELECT n_name AS nation,
       EXTRACT(year FROM o_orderdate) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
         AS profit
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2
"""


@query("tpch_q9_profit", oracle=_Q9_ORACLE)
def tpch_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9's profit rollup: the two small dims broadcast, lineitem⋈orders
    shuffles once on the orderkey, then one partial-agg'd groupBy."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "profit"
            )
        )
    )


# --------------------------------------------------------------------------
# Q10 shape: top-n customers by returned-item revenue
# --------------------------------------------------------------------------

_Q10_ORACLE = """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
         AS revenue,
       c_acctbal
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("tpch_q10_returns", oracle=_Q10_ORACLE)
def tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: returned-revenue per customer, top 20 — the returnflag filter
    pushes to the lineitem scan, the customer dim broadcasts, and the
    final top-n is TakeOrdered over the aggregate, never a global sort."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal")
    )


# --------------------------------------------------------------------------
# Q14 shape: conditional-aggregate ratio (promo revenue share)
# --------------------------------------------------------------------------

_Q14_ORACLE = """
SELECT round(
  100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'ECONOMY'
                   THEN l_extendedprice * (1 - l_discount) ELSE 0 END
              AS DECIMAL(38,6))) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE),
  6) AS economy_share
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1996-02-01'
"""


@query("tpch_q14_promo_share", oracle=_Q14_ORACLE)
def tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14's conditional-agg ratio on the fixture's p_type domain: one
    broadcast join, one agg, two exact decimal sums folded into a scalar."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-02-01")
    )
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * _dsum(F.when(F.col("p_type") == "ECONOMY", rev).otherwise(0.0))
                / _dsum(rev),
                6,
            ).alias("economy_share")
        )
    )


# --------------------------------------------------------------------------
# Q18 shape: HAVING subquery (large-quantity orders) as a semi-join
# --------------------------------------------------------------------------

_Q18_ORACLE = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 300
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
"""


@query("tpch_q18_large_orders", oracle=_Q18_ORACLE)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: the IN-(GROUP BY ... HAVING) subquery becomes an aggregated
    key set, broadcast into a semi-join — lineitem is scanned twice but
    never self-joined row-to-row."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    return (
        li.join(F.broadcast(big), "l_orderkey")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_dsum(F.col("l_quantity")).alias("total_qty"))
    )


# --------------------------------------------------------------------------
# Q19 shape: disjunctive multi-attribute join predicate
# --------------------------------------------------------------------------

_Q19_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
"""


@query("tpch_q19_disjunctive", oracle=_Q19_ORACLE)
def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: the classic OR-of-conjunctions predicate. The join stays a
    broadcast equi-join on partkey; the disjunction is a residual filter,
    NOT a fallback to a nested-loop join."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 40)
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(_dsum(rev).alias("revenue"))
    )


# --------------------------------------------------------------------------
# lag(): inter-event gaps per user
# --------------------------------------------------------------------------

_LAG_ORACLE = """
SELECT user_id, event_id,
       epoch_us(ts) - lag(epoch_us(ts)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
       ) AS gap_us
FROM events
WHERE user_id < 5
"""


@query("window_event_gaps", oracle=_LAG_ORACLE)
def window_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() over a per-user time-ordered window — inter-arrival gaps in
    integer microseconds (unix_micros ≅ epoch_us; first event NULL)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    us = F.unix_micros(F.col("ts"))
    return ev.select(
        "user_id",
        "event_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
    )


# --------------------------------------------------------------------------
# ntile(): balance quartiles
# --------------------------------------------------------------------------

_NTILE_ORACLE = """
SELECT quartile,
       COUNT(*) AS n,
       round(min(c_acctbal), 6) AS lo,
       round(max(c_acctbal), 6) AS hi
FROM (
  SELECT c_acctbal,
         ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
  FROM customer
)
GROUP BY quartile
"""


@query("ntile_customer_quartiles", oracle=_NTILE_ORACLE)
def ntile_customer_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) over a total order (balance, key) — the single-partition
    window is the documented cost here (quartiles of a whole table need a
    global order); the follow-up agg is tiny. At scale this shape becomes
    approx_percentile buckets; ntile is kept for exact SQL parity."""
    cust = _t(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    return (
        cust.select(
            "c_acctbal", F.ntile(4).over(w).alias("quartile")
        )
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("c_acctbal"), 6).alias("lo"),
            F.round(F.max("c_acctbal"), 6).alias("hi"),
        )
    )


# --------------------------------------------------------------------------
# Q6: forecast revenue change — pure filter + single agg
# --------------------------------------------------------------------------

_Q6_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE)
         AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("tpch_q6_forecast", oracle=_Q6_ORACLE)
def tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: the canonical scan-heavy aggregate. Every predicate is
    scan-pushable (date range, discount band, quantity cap) and the agg
    is a map-side partial sum — the whole query is one codegen'd stage
    with no exchange except the final 1-row reduce."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Q8: national market share within a region, by year
# --------------------------------------------------------------------------

_Q8_ORACLE = """
SELECT o_year,
       round(
         CAST(SUM(CAST(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END
                       AS DECIMAL(38,6))) AS DOUBLE)
         / CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         sn.n_name AS nation
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = cn.n_regionkey
  WHERE r.r_name = 'ASIA'
)
GROUP BY o_year
"""


@query("tpch_q8_market_share", oracle=_Q8_ORACLE)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: one nation's share of a region's yearly order volume. The
    nation table enters TWICE under different roles (supplier nation
    names the share; customer nation routes region membership) — both
    sides broadcast, as do customer/supplier/region; the only shuffle is
    lineitem⋈orders on the orderkey, then one grouped conditional-sum."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    cn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
    )
    return (
        joined.select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            F.col("nation"),
        )
        .groupBy("o_year")
        .agg(
            F.round(
                _dsum(
                    F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(
                        F.lit(0.0)
                    )
                )
                / _dsum(F.col("volume")),
                6,
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# Q12 shape: priority-class line counts by line status
# (fixture has no l_shipmode/l_commitdate — the join + dual conditional
#  count shape is preserved on l_linestatus and the shipdate window)
# --------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
"""


@query("tpch_q12_priority_class", oracle=_Q12_ORACLE)
def tpch_q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12's shape: fact-fact join with the selective filter pushed to the
    lineitem scan, then two complementary conditional counts in one
    grouped agg (never two passes)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q13: customer order-count distribution (outer join + double aggregate)
# --------------------------------------------------------------------------

_Q13_ORACLE = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
"""


@query("tpch_q13_custdist", oracle=_Q13_ORACLE)
def tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: LEFT OUTER join keeps order-less customers (count 0 must be a
    bucket in the distribution — an inner join silently drops it), with
    the non-join predicate folded INTO the join condition, not applied
    after (post-filtering a left join re-drops the NULL rows). First agg
    shuffles on custkey; the distribution agg is tiny."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# Q15: top supplier(s) by period revenue — agg + own-max scalar subquery
# --------------------------------------------------------------------------

_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
              AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@query("tpch_q15_top_supplier", oracle=_Q15_ORACLE)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: period revenue per supplier, keep the max (with ties). The
    scalar subquery becomes a 1-row broadcast cross join against the
    revenue aggregate — no global sort, no second scan of lineitem (the
    max reads the same aggregate the filter reads; both engines compute
    the identical DECIMAL-summed doubles, so the equality is exact)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    supp = _t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    maxrev = revenue.agg(F.max("total_revenue").alias("__max"))
    return (
        revenue.crossJoin(F.broadcast(maxrev))
        .filter(F.col("total_revenue") == F.col("__max"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# Q21 shape: sole-blamed supplier in multi-supplier orders
# (fixture has no l_commitdate/l_receiptdate — 'R' returnflag stands in
#  for "late"; the EXISTS / NOT EXISTS correlated pair is preserved)
# --------------------------------------------------------------------------

_Q21_ORACLE = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


@query("tpch_q21_sole_blame", oracle=_Q21_ORACLE)
def tpch_q21_sole_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21's EXISTS / NOT EXISTS pair as left-semi + left-anti joins, both
    equi on the orderkey (the suppkey inequality rides as a residual
    condition, so the joins stay shuffle-hash, never nested-loop). Final
    top-10 is TakeOrdered over the per-name counts."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("lo"), F.col("l_suppkey").alias("ls")
    )
    l2 = li.select(F.col("l_orderkey").alias("lo2"), F.col("l_suppkey").alias("ls2"))
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("lo3"), F.col("l_suppkey").alias("ls3")
    )
    waiting = (
        l1.join(
            l2,
            (F.col("lo") == F.col("lo2")) & (F.col("ls") != F.col("ls2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("lo") == F.col("lo3")) & (F.col("ls") != F.col("ls3")),
            "left_anti",
        )
        .join(orders.select("o_orderkey"), F.col("lo") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("ls") == F.col("s_suppkey"))
    )
    return (
        waiting.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q11 shape: group value vs a global-total scalar subquery (share filter).
# TPC-H Q11 sums partsupp ps_supplycost*ps_availqty; the fixtures carry no
# partsupp, so the SHAPE runs on the same join graph's revenue: per-part
# revenue from one nation's suppliers, kept when it exceeds a fixed
# fraction of that nation's total — the identical two-aggregation +
# cross-joined scalar plan the real Q11 compiles to.
# --------------------------------------------------------------------------

_Q11_ORACLE = """
WITH nation_supp AS (
  SELECT s_suppkey FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_12'
),
value_by_part AS (
  SELECT l_partkey AS ps_partkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
              AS DOUBLE) AS part_value
  FROM lineitem JOIN nation_supp ON l_suppkey = s_suppkey
  GROUP BY l_partkey
),
total AS (
  SELECT CAST(SUM(CAST(part_value AS DECIMAL(38,6))) AS DOUBLE) AS tot
  FROM value_by_part
)
SELECT ps_partkey, round(part_value, 4) AS part_value
FROM value_by_part, total
WHERE part_value > CAST(0.001 AS DOUBLE) * tot
"""


@query("tpch_q11_value_share", oracle=_Q11_ORACLE)
def tpch_q11_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (completes all 22 TPC-H query shapes on the available
    columns): the per-group aggregate joins a broadcast one-row scalar
    (the global total) — never a correlated re-scan; DECIMAL sums keep
    both aggregations order-independent and engine-exact."""
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_12")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    li = _t(spark, sf_dir, "lineitem")
    value_by_part = (
        li.join(F.broadcast(supp), "l_suppkey", "left_semi")
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "part_value"
            )
        )
    )
    total = value_by_part.agg(
        _dsum(F.col("part_value")).alias("tot")
    )
    return (
        value_by_part.join(F.broadcast(total))
        .filter(
            F.col("part_value") > F.lit(0.001).cast("double") * F.col("tot")
        )
        .select("ps_partkey", F.round("part_value", 4).alias("part_value"))
    )


# --------------------------------------------------------------------------
# Market-basket association: co-purchase pairs with lift (operators/assoc.py)
# --------------------------------------------------------------------------

_COPURCHASE_ORACLE = """
WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM op),
pc AS (SELECT pk, COUNT(*) AS cnt FROM op GROUP BY pk),
pairs AS (
  SELECT a.pk AS part_a, b.pk AS part_b, COUNT(*) AS support
  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY a.pk, b.pk
),
scored AS (
  SELECT p.part_a, p.part_b, p.support,
         (CAST(p.support AS DOUBLE) * n.n_orders) / (ca.cnt * cb.cnt) AS lift
  FROM pairs p
  JOIN pc ca ON p.part_a = ca.pk
  JOIN pc cb ON p.part_b = cb.pk
  CROSS JOIN n
)
SELECT part_a, part_b, support, round(lift, 6) AS lift
FROM scored
ORDER BY support DESC, lift DESC, part_a, part_b
LIMIT 20
"""


@query("copurchase_lift", oracle=_COPURCHASE_ORACLE)
def copurchase_lift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 co-purchased part pairs by (support, lift). The self-join
    keys on the order — per-order fanout is basket-width², bounded by
    the domain, so pair volume stays a constant factor of the distinct
    (order, part) relation at any corpus size."""
    from vector_db_spark.operators.assoc import copurchase_lift

    res = copurchase_lift(_t(spark, sf_dir, "lineitem"))
    return (
        res.select("part_a", "part_b", "support", F.round("lift", 6).alias("lift"))
        .orderBy(
            F.col("support").desc(),
            F.col("lift").desc(),
            F.col("part_a").asc(),
            F.col("part_b").asc(),
        )
        .limit(20)
    )
