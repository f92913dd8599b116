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
