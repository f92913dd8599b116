"""Relational query family (SURVEY.md §2.9 / M3).

The reference has no relational operators at all (verified absence,
SURVEY.md §2.8) — this family exercises what our engine gains from Spark
SQL: multi-way joins (with explicit broadcast of small dimensions),
aggregations (incl. ROLLUP), window functions (ranking, running totals,
sessionization), set operations, semi-joins, and the scalar function
library (string/date/math/JSON), all verified against DuckDB.

Cross-engine determinism rules used throughout:
- Float sums are never hash-compared raw: every SUM goes through
  DECIMAL(38,6) (exact, summation-order-independent) and is cast back to
  DOUBLE at the end; averages are exact-decimal-sum / count.
- Timestamps are grouped via date_trunc-equivalent expressions and output
  as formatted strings; epoch arithmetic uses integer microseconds
  (`unix_micros` ≅ DuckDB `epoch_us`) — never truncated seconds.
- Every query has a deterministic total order or is order-insensitive.

Scale notes: nation/region/customer joins broadcast the small side
explicitly (`F.broadcast`) — at 100 TB the lineitem side never shuffles
for those; the orders⋈lineitem join shuffles on the join key, which AQE
sizes at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_db_spark.queries.registry import query
from vector_db_spark.sources.fixtures import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dsum(col):
    """Order-independent exact sum: cast each term to decimal, sum, back to
    double. Bit-identical across engines regardless of partial-agg order."""
    return F.sum(col.cast("decimal(38,6)")).cast("double")


# --------------------------------------------------------------------------
# TPC-H-style aggregation (Q1 shape): scan → filter → group → exact aggs
# --------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT
  l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
  round(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


@query("tpch_q1_pricing", oracle=_Q1_ORACLE)
def tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-01")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum(F.col("l_quantity")).alias("sum_qty"),
        _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
        F.round(
            _dsum(F.col("l_quantity")) / F.count(F.lit(1)), 6
        ).alias("avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


# --------------------------------------------------------------------------
# 3-way join + top-k by aggregate (Q3 shape)
# --------------------------------------------------------------------------

_Q3_ORACLE = """
SELECT
  l_orderkey,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("tpch_q3_shipping", oracle=_Q3_ORACLE)
def tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


# --------------------------------------------------------------------------
# 6-way star join through region (Q5 shape) — dims broadcast
# --------------------------------------------------------------------------

_Q5_ORACLE = """
SELECT
  n_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


@query("tpch_q5_region", oracle=_Q5_ORACLE)
def tpch_q5_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# Semi-join (Q4 shape): orders with at least one late-shipped lineitem
# --------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
)
GROUP BY o_orderpriority
"""


@query("tpch_q4_semijoin", oracle=_Q4_ORACLE)
def tpch_q4_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# --------------------------------------------------------------------------
# Join + agg with HAVING over part dimension
# --------------------------------------------------------------------------

_BRAND_ORACLE = """
SELECT p_brand,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty,
       round(CAST(SUM(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS avg_price
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
HAVING COUNT(*) > 100
"""


@query("brand_part_agg", oracle=_BRAND_ORACLE)
def brand_part_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _dsum(F.col("l_quantity")).alias("total_qty"),
            F.round(_dsum(F.col("p_retailprice")) / F.count(F.lit(1)), 6).alias(
                "avg_price"
            ),
        )
        .filter(F.col("n_items") > 100)
    )


# --------------------------------------------------------------------------
# ROLLUP aggregation
# --------------------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("rollup_lineitem", oracle=_ROLLUP_ORACLE)
def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), _dsum(F.col("l_quantity")).alias("sum_qty")
    )


# --------------------------------------------------------------------------
# Window: ranking within partition (top-3 customers per nation)
# --------------------------------------------------------------------------

_TOPCUST_ORACLE = """
SELECT n_name, c_name, round(c_acctbal, 6) AS acctbal, rnk
FROM (
  SELECT c_nationkey, c_name, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rnk
  FROM customer
) JOIN nation ON c_nationkey = n_nationkey
WHERE rnk <= 3
"""


@query("window_top_customers", oracle=_TOPCUST_ORACLE)
def window_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        cust.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "c_name", F.round("c_acctbal", 6).alias("acctbal"), "rnk")
    )


# --------------------------------------------------------------------------
# Window: running total (exact-decimal cumulative sum)
# --------------------------------------------------------------------------

_RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
              OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey
                    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
FROM orders
WHERE o_custkey < 100
"""


@query("window_running_total", oracle=_RUNNING_ORACLE)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


# --------------------------------------------------------------------------
# Streaming-shaped batch: tumbling window aggregation over events
# --------------------------------------------------------------------------

_TUMBLING_ORACLE = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@query("events_tumbling", oracle=_TUMBLING_ORACLE)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows via F.window — identical logical op to the
    Structured Streaming version in streaming/ (same groupBy(window(...))),
    verified here on the batch path."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum(F.col("value")).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# Sessionization: gap > 30 min starts a new session (lag + cumulative sum)
# --------------------------------------------------------------------------

_SESSION_ORACLE = """
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM gaps
)
SELECT user_id,
       COUNT(DISTINCT session_id) AS n_sessions,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id
"""


@query("events_sessionization", oracle=_SESSION_ORACLE)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows on the batch path: lag-gap flag + running sum.
    Integer-microsecond arithmetic (unix_micros ≅ epoch_us) so the 30-min
    boundary is exact on both engines."""
    ev = _t(spark, sf_dir, "events")
    order_w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    cum_w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    micros = F.unix_micros(F.col("ts"))
    flagged = ev.withColumn(
        "new_session",
        F.when(
            micros - F.lag(micros).over(order_w) > 1800 * 1_000_000, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    with_session = flagged.withColumn("session_id", F.sum("new_session").over(cum_w))
    return with_session.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --------------------------------------------------------------------------
# Set operations: INTERSECT / EXCEPT over nation keys
# --------------------------------------------------------------------------

_SETOPS_ORACLE = """
SELECT n_nationkey, 'both' AS tag FROM (
  SELECT c_nationkey AS n_nationkey FROM customer
  INTERSECT
  SELECT s_nationkey FROM supplier
)
UNION ALL
SELECT n_nationkey, 'customers_only' AS tag FROM (
  SELECT c_nationkey AS n_nationkey FROM customer
  EXCEPT
  SELECT s_nationkey FROM supplier
)
"""


@query("set_ops_nations", oracle=_SETOPS_ORACLE)
def set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust_nations = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("n_nationkey")
    )
    supp_nations = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("n_nationkey")
    )
    both = cust_nations.intersect(supp_nations).withColumn("tag", F.lit("both"))
    only = cust_nations.subtract(supp_nations).withColumn(
        "tag", F.lit("customers_only")
    )
    return both.unionByName(only)


# --------------------------------------------------------------------------
# Scalar function library: string / date / math / JSON in one projection
# --------------------------------------------------------------------------

_SCALAR_ORACLE = """
SELECT event_id,
       upper(event_type) AS etype_upper,
       substr(event_type, 1, 3) AS etype_prefix,
       concat(event_type, ':', CAST(user_id AS VARCHAR)) AS etype_user,
       length(event_type) AS etype_len,
       year(ts) AS y, month(ts) AS m, day(ts) AS d,
       round(abs(value - 100.0), 6) AS centered,
       round(sqrt(value), 6) AS value_sqrt,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
FROM events
WHERE event_id < 500
"""


@query("scalar_functions", oracle=_SCALAR_ORACLE)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalar-function surface the reference lacks entirely (it stores
    JSON opaque and never computes on it, src/db/scalar_storage.rs:10-14):
    string/date/math/JSON functions in one pushed-down projection."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    return ev.select(
        "event_id",
        F.upper("event_type").alias("etype_upper"),
        F.substring("event_type", 1, 3).alias("etype_prefix"),
        F.concat_ws(":", F.col("event_type"), F.col("user_id").cast("string")).alias(
            "etype_user"
        ),
        F.length("event_type").alias("etype_len"),
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.round(F.abs(F.col("value") - 100.0), 6).alias("centered"),
        F.round(F.sqrt("value"), 6).alias("value_sqrt"),
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )


# --------------------------------------------------------------------------
# Conditional aggregation (pivot shape): daily funnel counts
# --------------------------------------------------------------------------

_FUNNEL_ORACLE = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       COUNT(*) FILTER (WHERE event_type = 'view') AS views,
       COUNT(*) FILTER (WHERE event_type = 'click') AS clicks,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchases,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) FILTER (WHERE event_type = 'purchase') AS DOUBLE)
         AS purchase_value
FROM events
GROUP BY 1
"""


@query("events_daily_funnel", oracle=_FUNNEL_ORACLE)
def events_daily_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def _cnt(etype):
        return F.count(F.when(F.col("event_type") == etype, F.lit(1)))

    return (
        ev.groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .agg(
            _cnt("view").alias("views"),
            _cnt("click").alias("clicks"),
            _cnt("purchase").alias("purchases"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast("decimal(38,6)"),
                )
            )
            .cast("double")
            .alias("purchase_value"),
        )
    )


# --------------------------------------------------------------------------
# Correlated scalar subquery (TPC-H Q17 shape), decorrelated the way a
# planner would: per-part average joined back to the fact table.
# --------------------------------------------------------------------------

_Q17_ORACLE = """
SELECT p_brand,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS below_avg_revenue,
       COUNT(*) AS n_small_orders
FROM lineitem l
JOIN part ON p_partkey = l.l_partkey
WHERE l.l_quantity < (
  SELECT 0.5 * avg(l2.l_quantity)
  FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
)
GROUP BY p_brand
"""


@query("tpch_q17_small_qty", oracle=_Q17_ORACLE)
def tpch_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery, hand-decorrelated: the per-key aggregate
    is a groupBy + equi-join (exactly Catalyst's own rewrite). l_quantity
    is integer-valued in the fixture, so the 0.5*avg threshold compare is
    float-safe on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    avg_qty = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        li.join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(
            _dsum(F.col("l_extendedprice")).alias("below_avg_revenue"),
            F.count(F.lit(1)).alias("n_small_orders"),
        )
    )


# --------------------------------------------------------------------------
# NOT EXISTS anti-join (TPC-H Q22 shape): well-funded customers with no
# urgent orders.
# --------------------------------------------------------------------------

_Q22_ORACLE = """
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_bal
FROM customer c
WHERE c_acctbal > 1000.0
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
  )
GROUP BY c_mktsegment
"""


@query("tpch_q22_no_urgent", oracle=_Q22_ORACLE)
def tpch_q22_no_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join — the big side filters first, the
    anti-join key set (urgent order custkeys) broadcasts."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return (
        cust.filter(F.col("c_acctbal") > 1000.0)
        .join(F.broadcast(urgent.distinct()), "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _dsum(F.col("c_acctbal")).alias("total_bal"),
        )
    )


# --------------------------------------------------------------------------
# CUBE (grouping sets over both keys + margins + grand total)
# --------------------------------------------------------------------------

_CUBE_ORACLE = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@query("cube_lineitem", oracle=_CUBE_ORACLE)
def cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _dsum(F.col("l_quantity")).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_items",
            "sum_qty",
        )
    )


# --------------------------------------------------------------------------
# PIVOT: order counts by priority, one column per order status
# --------------------------------------------------------------------------

_PIVOT_ORACLE = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_f,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_o,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_p
FROM orders
GROUP BY o_orderpriority
"""


@query("pivot_order_status", oracle=_PIVOT_ORACLE)
def pivot_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pivot() with explicit values — one shuffle, no second pass to
    discover the pivot domain (the explicit list is what makes this safe
    at scale)."""
    orders = _t(spark, sf_dir, "orders")
    piv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_p"),
    )


# --------------------------------------------------------------------------
# Salted two-stage aggregation: must equal the direct GROUP BY exactly
# --------------------------------------------------------------------------

_SALTED_ORACLE = """
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_l_extendedprice,
       MIN(l_quantity) AS min_l_quantity,
       MAX(l_quantity) AS max_l_quantity
FROM lineitem
GROUP BY l_returnflag
"""


@query("salted_agg_lineitem", oracle=_SALTED_ORACLE)
def salted_agg_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-proof aggregation (operators/skew.py): l_returnflag has only
    3 values — exactly the shape where one reducer would own a third of a
    100 TB table. The salted two-stage plan must be value-identical to the
    direct GROUP BY."""
    from vector_db_spark.operators.skew import salted_aggregate

    li = _t(spark, sf_dir, "lineitem")
    return salted_aggregate(
        li,
        ["l_returnflag"],
        n_salts=16,
        sum_cols=["l_extendedprice"],
        min_cols=["l_quantity"],
        max_cols=["l_quantity"],
    )


# --------------------------------------------------------------------------
# Sketches: HLL distinct count + approximate quantiles. Sketch INTERNALS
# differ across engines, so the hash gate pins the ERROR CONTRACT instead
# (VERDICT r14 next #7): exact values (both engines compute them) plus
# booleans asserting the sketch answer sits inside its stated bound — the
# oracle emits TRUE, so a sketch drifting out of bound hash-fails.
# --------------------------------------------------------------------------

_SKETCH_ORACLE = """
SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custkeys,
       round(quantile_cont(o_totalprice, 0.5), 6)  AS p50_exact,
       round(quantile_cont(o_totalprice, 0.9), 6)  AS p90_exact,
       round(quantile_cont(o_totalprice, 0.99), 6) AS p99_exact,
       TRUE AS acd_ok, TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
FROM orders
"""


@query("sketch_stats_orders", oracle=_SKETCH_ORACLE)
def sketch_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct count + approximate quantiles, hash-gated on the
    ERROR CONTRACT (rows-only r5–r14; converted in r15).

    The sketch values themselves are engine-specific, but their
    *accuracy claims* are not: HLL++ at default rsd=0.05 keeps relative
    error under 3σ = 15 %; percentile_approx at accuracy=10000
    guarantees rank error ≤ 1e-4·n, so each approximate quantile must
    lie inside the generous ±0.01-quantile band of the exact
    distribution (100× the guarantee). The gate emits the EXACT values
    (distinct count; interpolated percentiles — Spark `percentile` and
    DuckDB `quantile_cont` share the lower+(higher−lower)·frac
    definition at pos p·(n−1), identical fp op order, rounded 6 per
    repo policy) plus one boolean per sketch asserting its bound; the
    oracle computes the same exacts and literal TRUE — an out-of-bound
    sketch flips a boolean and hash-fails. The exact twin is the
    verification apparatus, not the serving path: at 100 TB you run
    ONLY the one-pass sketches (partial-aggregated, no shuffle of raw
    rows); the gate's point is that you can trust them."""
    orders = _t(spark, sf_dir, "orders")
    pe = F.expr(
        "percentile(o_totalprice, "
        "array(0.49D, 0.5D, 0.51D, 0.89D, 0.9D, 0.91D, 0.98D, 0.99D))"
    )
    a = orders.agg(
        F.approx_count_distinct("o_custkey").alias("acd"),
        F.countDistinct("o_custkey").alias("exact_custkeys"),
        F.percentile_approx("o_totalprice", F.lit(0.5), 10000).alias("ap50"),
        F.percentile_approx("o_totalprice", F.lit(0.9), 10000).alias("ap90"),
        F.percentile_approx("o_totalprice", F.lit(0.99), 10000).alias("ap99"),
        pe.alias("pe"),
        F.max("o_totalprice").alias("pmax"),
    )
    e = F.element_at
    return a.select(
        F.col("exact_custkeys"),
        F.round(e("pe", 2), 6).alias("p50_exact"),
        F.round(e("pe", 5), 6).alias("p90_exact"),
        F.round(e("pe", 8), 6).alias("p99_exact"),
        (
            F.abs(F.col("acd") - F.col("exact_custkeys"))
            / F.col("exact_custkeys")
            <= 0.15
        ).alias("acd_ok"),
        F.col("ap50").between(e("pe", 1), e("pe", 3)).alias("p50_ok"),
        F.col("ap90").between(e("pe", 4), e("pe", 6)).alias("p90_ok"),
        F.col("ap99").between(e("pe", 7), F.col("pmax")).alias("p99_ok"),
    )


# --------------------------------------------------------------------------
# Source/sink round-trips: events → JSON-lines / CSV → read back with an
# explicit schema → aggregate must match the parquet original exactly
# --------------------------------------------------------------------------

_ROUNDTRIP_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS max_ts
FROM events
GROUP BY event_type
"""


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    import tempfile

    from vector_db_spark.sources.generic import read_table, write_table

    ev = _t(spark, sf_dir, "events")
    stage = tempfile.mkdtemp(prefix=f"events_{fmt}_")
    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    write_table(ev.select(*cols), stage, fmt=fmt)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    back = read_table(spark, stage, fmt=fmt, schema=schema)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total_value"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("max_ts"),
    )


@query("json_roundtrip_events", oracle=_ROUNDTRIP_ORACLE)
def json_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → JSON lines → explicit-schema read → aggregate: doubles and
    ISO-8601 UTC timestamps must survive the text round-trip bit-for-bit."""
    return _roundtrip(spark, sf_dir, "json")


@query("csv_roundtrip_events", oracle=_ROUNDTRIP_ORACLE)
def csv_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip(spark, sf_dir, "csv")


@query("orc_roundtrip_events", oracle=_ROUNDTRIP_ORACLE)
def orc_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → ORC → read back → aggregate: the columnar interchange
    format of the Hive/Trino world, self-describing like parquet."""
    return _roundtrip(spark, sf_dir, "orc")


_DELTA_ORACLE = """
SELECT 0 AS version, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang
UNION ALL
SELECT 1 AS version, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents WHERE n_chars >= 500 GROUP BY lang
"""


@query("delta_roundtrip", oracle=_DELTA_ORACLE)
def delta_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta Lake interop (sources/delta.py, VERDICT r13 gap #3):
    documents → lang-partitioned Delta table (commit v0) → OVERWRITE
    with the n_chars >= 500 subset (commit v1: remove actions tombstone
    every v0 file) → snapshot-read BOTH versions via the transaction-log
    replay and aggregate per (version, lang). One gate exercises the
    protocol-1 reader end to end: add/remove reconciliation, typed
    partition-column restore from log metadata, and VERSION-AS-OF time
    travel — values must match the aggregates computed straight from
    the parquet fixture."""
    import shutil

    from vector_db_spark.sources.delta import read_delta, write_delta_table

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    # deterministic scratch path, cleared up-front — a fresh mkdtemp per
    # run leaked a documents copy per sweep/bench iteration (ADVICE r14)
    table = "/tmp/vdbs_gate_delta_docs"
    shutil.rmtree(table, ignore_errors=True)
    write_delta_table(docs, table, partition_by=["lang"])
    write_delta_table(
        docs.filter(F.col("n_chars") >= 500), table,
        partition_by=["lang"], mode="overwrite",
    )

    def agg(df: DataFrame, version: int) -> DataFrame:
        return df.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        ).select(F.lit(version).alias("version"), "lang", "n_docs", "total_chars")

    return agg(read_delta(spark, table, version=0), 0).unionByName(
        agg(read_delta(spark, table), 1)
    )


_DELTA_COLMAP_ORACLE = """
SELECT lang,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT source) AS n_sources,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang
"""


@query("delta_colmap_roundtrip", oracle=_DELTA_COLMAP_ORACLE)
def delta_colmap_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta reader protocol-2 path (VERDICT r14 next #5): a NAME-mode
    column-mapped table — parquet files and partition dirs carry
    generated physical names (`col-1`…), the logical schema lives in the
    field metadata (PROTOCOL.md reader version 2) — written in two
    commits (create + append, the append inheriting the mapping), then
    compacted into a MULTI-PART checkpoint (`<v>.checkpoint.<i>.<n>`)
    so the read replays checkpoint parts, not commit JSON. The
    aggregate over the logical column names must equal the same
    aggregate computed straight from the parquet fixture — proving the
    physical→logical restore is lossless end to end."""
    import shutil

    from vector_db_spark.sources.delta import (
        read_delta,
        write_delta_table,
        write_checkpoint,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    table = "/tmp/vdbs_gate_delta_colmap"
    shutil.rmtree(table, ignore_errors=True)
    write_delta_table(
        docs.filter(F.col("n_chars") < 500),
        table,
        partition_by=["lang"],
        column_mapping="name",
    )
    write_delta_table(
        docs.filter(F.col("n_chars") >= 500), table, partition_by=["lang"]
    )
    write_checkpoint(spark, table, parts=2)
    return (
        read_delta(spark, table)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


_ICEBERG_ORACLE = """
SELECT 1 AS snap, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents WHERE n_chars < 500 GROUP BY lang
UNION ALL
SELECT 2 AS snap, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang
"""


@query("iceberg_roundtrip", oracle=_ICEBERG_ORACLE)
def iceberg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg interop (sources/iceberg.py, VERDICT r14 next #6):
    documents → lang-partitioned Iceberg v1 table in two snapshots
    (n_chars < 500, then the rest appended), the Avro metadata tier
    written and re-read by the from-scratch codec (sources/avro_io.py —
    the container ships no avro package, so the public Avro container
    spec is implemented directly). Snapshot 1 is read via time travel,
    snapshot 2 as current; identity partition values are restored from
    the manifests' typed partition structs, never parsed from paths.
    Aggregates per (snap, lang) must equal the same aggregates computed
    straight from the parquet fixture."""
    import shutil

    from vector_db_spark.sources.iceberg import read_iceberg, write_iceberg_table

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    table = "/tmp/vdbs_gate_iceberg_docs"
    shutil.rmtree(table, ignore_errors=True)
    s1 = write_iceberg_table(
        docs.filter(F.col("n_chars") < 500), table, partition_by=["lang"]
    )
    s2 = write_iceberg_table(
        docs.filter(F.col("n_chars") >= 500), table, partition_by=["lang"]
    )

    def agg(df: DataFrame, snap: int) -> DataFrame:
        return df.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        ).select(F.lit(snap).alias("snap"), "lang", "n_docs", "total_chars")

    return agg(read_iceberg(spark, table, snapshot_id=s1), 1).unionByName(
        agg(read_iceberg(spark, table), 2)
    )


_ICEBERG_V2_ORACLE = """
WITH final AS (
  SELECT lang, n_chars FROM documents
  WHERE n_chars >= 500 AND doc_id % 7 <> 0
  UNION ALL
  SELECT lang, n_chars FROM documents
  WHERE doc_id % 7 = 0 AND n_chars >= 1000
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM final GROUP BY lang
"""


@query("iceberg_v2_deletes_roundtrip", oracle=_ICEBERG_V2_ORACLE)
def iceberg_v2_deletes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v2 ROW-LEVEL DELETES end to end (the feature class the
    Delta reader refuses as deletion vectors, implemented here):
    documents → v2 table (sequence 1) → POSITION delete of n_chars<500
    (computed as a Spark job over _metadata.row_index, sequence 2) →
    EQUALITY delete of doc_id % 7 == 0 keys (sequence 3) → re-append
    the (doc_id % 7 == 0, n_chars >= 1000) subset (sequence 4). The
    read must apply the position anti-join, apply the equality
    anti-join ONLY to rows of earlier sequences (the re-appended rows
    survive — the spec's ordering semantics), and the per-lang
    aggregate must equal the same set algebra computed straight from
    the parquet fixture."""
    import shutil

    from vector_db_spark.sources.iceberg import (
        delete_from_iceberg,
        read_iceberg,
        write_iceberg_equality_deletes,
        write_iceberg_table,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    table = "/tmp/vdbs_gate_iceberg_v2"
    shutil.rmtree(table, ignore_errors=True)
    write_iceberg_table(docs, table, format_version=2)
    delete_from_iceberg(spark, table, F.col("n_chars") < 500)
    write_iceberg_equality_deletes(
        docs.filter(F.col("doc_id") % 7 == 0).select("doc_id"), table, ["doc_id"]
    )
    write_iceberg_table(
        docs.filter((F.col("doc_id") % 7 == 0) & (F.col("n_chars") >= 1000)),
        table,
    )
    return (
        read_iceberg(spark, table)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


# --------------------------------------------------------------------------
# Bucketed co-located join: lineitem and orders pre-bucketed on the join key
# join with ZERO exchanges (pinned in tests/test_plans.py) — one write-time
# shuffle amortized over every later join/agg on that key, THE layout move
# for repeated big-to-big joins at 100 TB.
# --------------------------------------------------------------------------

_BUCKETED_JOIN_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
            AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
"""


@query("bucketed_join_revenue", oracle=_BUCKETED_JOIN_ORACLE)
def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order priority over a bucketed lineitem ⋈ orders join.

    Both sides are written ``bucketBy(8, orderkey)`` catalog tables, so
    the join plan has no Exchange on either side — bucket i of lineitem
    meets bucket i of orders in the same task. The aggregation on
    o_orderpriority still shuffles (different key); at scale you'd pick
    the bucket key to serve the hottest join, exactly as here."""
    from vector_db_spark.sources.generic import write_bucketed

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    write_bucketed(li, "bj_lineitem", ["l_orderkey"], n_buckets=8)
    write_bucketed(orders, "bj_orders", ["o_orderkey"], n_buckets=8)
    li_b = spark.table("bj_lineitem")
    o_b = spark.table("bj_orders").filter(F.col("o_orderstatus") == "F")
    return (
        li_b.join(o_b, li_b.l_orderkey == o_b.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(38,6)"
                )
            )
            .cast("double")
            .alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# Zone-mapped range scan: file-level min/max manifest pruned driver-side
# BEFORE planning (Delta data-skipping / Iceberg manifest analogue) — at
# 100 TB footer skipping still opens every file; the manifest never lists
# the pruned ones. Lossless: residual predicate re-applied on survivors.
# --------------------------------------------------------------------------

_ZONEMAP_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
FROM orders
WHERE o_totalprice BETWEEN 100000 AND 150000
GROUP BY o_orderpriority
"""


@query("zonemap_pruned_scan", oracle=_ZONEMAP_ORACLE)
def zonemap_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders range-clustered on o_totalprice with a per-file zone-map
    manifest (sources/zonemap.py); the band scan prunes the file list on
    the driver from the manifest alone, reads only surviving files, and
    re-applies the exact predicate — so the aggregate equals the
    unpruned full-table filter bit-for-bit. File-count reduction is
    pinned in tests/test_zonemap.py (the correctness row here is the
    lossless-ness claim)."""
    import tempfile

    from vector_db_spark.sources.zonemap import read_zonemapped, write_zonemapped

    orders = _t(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="zonemap_orders_")
    write_zonemapped(orders, path, "o_totalprice", n_files=16)
    scan = read_zonemapped(spark, path, lo=100000, hi=150000)
    return scan.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dsum(F.col("o_totalprice")).alias("total_price"),
    )


_ZORDER_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
FROM orders
WHERE o_totalprice BETWEEN 100000 AND 200000
  AND o_custkey BETWEEN 100 AND 500
GROUP BY o_orderpriority
"""


@query("zorder_box_scan", oracle=_ZORDER_ORACLE)
def zorder_box_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders Z-ORDER-clustered on (o_custkey, o_totalprice) — quantile
    buckets bit-interleaved into a Morton value, files ranged on it
    (Delta OPTIMIZE ZORDER analogue, sources/zonemap.py) — so every file
    covers a small hyper-rectangle of the key plane and a predicate on
    EITHER column prunes files from the manifest alone (lexicographic
    clustering serves only its leading column; pinned in
    tests/test_zonemap.py). The box scan's aggregate must equal the
    unpruned full-table filter bit-for-bit."""
    import tempfile

    from vector_db_spark.sources.zonemap import read_zonemapped, write_zonemapped

    orders = _t(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="zorder_orders_")
    write_zonemapped(orders, path, ["o_custkey", "o_totalprice"], n_files=16)
    scan = read_zonemapped(
        spark,
        path,
        bounds={"o_totalprice": (100000, 200000), "o_custkey": (100, 500)},
    )
    return scan.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dsum(F.col("o_totalprice")).alias("total_price"),
    )


# --------------------------------------------------------------------------
# Q7 shape: shipping volume between nation pairs, year extracted in-join
# --------------------------------------------------------------------------

_Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@query("tpch_q7_nation_volume", oracle=_Q7_ORACLE)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two aliases of the same broadcast dim (nation) with a disjunctive
    pair predicate — the join shape AQE can't help with unless the dims
    broadcast, which they do."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


# --------------------------------------------------------------------------
# Q16 shape: supplier counts by part attributes with a NOT IN exclusion
# --------------------------------------------------------------------------

_Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part
JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 4, 7)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
"""


@query("tpch_q16_supplier_cnt", oracle=_Q16_ORACLE)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a non-null key set = broadcast anti-join; distinct
    count per group on top."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 4, 7)
    )
    li = _t(spark, sf_dir, "lineitem")
    bad_supp = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(bad_supp, "l_suppkey", "left_anti")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q20 shape: nested semi-joins — suppliers of parts that shipped in volume
# --------------------------------------------------------------------------

_Q20_ORACLE = """
SELECT s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '%a%' AND l_shipdate >= TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey
  HAVING SUM(l_quantity) > 100
)
ORDER BY s_name
"""


@query("tpch_q20_volume_suppliers", oracle=_Q20_ORACLE)
def tpch_q20_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= "1997-01-01"
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%a%"))
    heavy = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    supp = _t(spark, sf_dir, "supplier")
    return (
        supp.join(F.broadcast(heavy), "s_suppkey", "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# --------------------------------------------------------------------------
# Sliding windows: 2h windows sliding 1h — every event lands in 2 windows
# --------------------------------------------------------------------------

_SLIDING_ORACLE = """
WITH contrib AS (
  SELECT strftime(date_trunc('hour', ts) - to_hours(k), '%Y-%m-%d %H:%M:%S')
           AS window_start,
         event_type, value
  FROM events CROSS JOIN generate_series(0, 1) AS t(k)
)
SELECT window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM contrib
GROUP BY window_start, event_type
"""


@query("events_sliding", oracle=_SLIDING_ORACLE)
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.window with slide < duration: each event contributes to
    duration/slide windows (the oracle replicates rows explicitly)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum(F.col("value")).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# Exact order statistics: median / p90 per group
# --------------------------------------------------------------------------

_MEDIAN_ORACLE = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
       COUNT(*) AS n
FROM orders
GROUP BY o_orderpriority
"""


@query("median_order_price", oracle=_MEDIAN_ORACLE)
def median_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (order statistics with linear interpolation —
    percentile ≅ quantile_cont). Rounded to 4 dp: the two engines
    interpolate with differently-associated but mathematically equal
    expressions."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# Typed JSON parsing: props string → struct via from_json (vs the untyped
# get_json_object path in scalar_functions)
# --------------------------------------------------------------------------

_PROPS_STRUCT_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_with_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS min_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS max_k
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
GROUP BY event_type
"""


@query("events_props_struct", oracle=_PROPS_STRUCT_ORACLE)
def events_props_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over the JSON props column: from_json with a declared
    struct schema (typed, codegen-friendly) instead of per-field
    get_json_object string extraction."""
    ev = _t(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "p", F.from_json("props", "struct<k:bigint>")
    ).filter(F.col("p.k").isNotNull())
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_with_k"),
        F.sum("p.k").alias("sum_k"),
        F.min("p.k").alias("min_k"),
        F.max("p.k").alias("max_k"),
    )


# --------------------------------------------------------------------------
# As-of join: each click joined to the user's latest purchase at-or-before
# (DuckDB's native ASOF JOIN is the oracle). Right side deduped per
# (user, ts) so tie selection is deterministic on both engines.
# --------------------------------------------------------------------------

_ASOF_ORACLE = """
WITH l AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
),
r AS (
  SELECT user_id, ts, max(value) AS pvalue
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, ts
)
SELECT l.event_id, l.user_id,
       round(r.pvalue, 6) AS pvalue_asof
FROM l ASOF LEFT JOIN r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


@query("asof_click_purchase", oracle=_ASOF_ORACLE)
def asof_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """asof_join (operators/temporal.py): union + per-key carry-forward
    window — one hash shuffle, the kdb/merge_asof semantics Spark has no
    primitive for."""
    from vector_db_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pvalue"))
    )
    res = asof_join(
        clicks, purchases, key_cols=("user_id",), ts_col="ts",
        right_cols=("pvalue",),
    )
    return res.select(
        "event_id", "user_id", F.round("pvalue_asof", 6).alias("pvalue_asof")
    )


# --------------------------------------------------------------------------
# Banded range join: event pairs per user within a 10-minute window
# --------------------------------------------------------------------------

_RANGE_ORACLE = """
SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
       epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND epoch_us(b.ts) - epoch_us(a.ts) <= 600000000
"""


@query("range_join_pairs", oracle=_RANGE_ORACLE)
def range_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """range_join_events: time bucketed into window-sized epochs, each
    bucket equi-joined to itself and its successor, inequality as residual
    filter — the interval join without a per-key cartesian."""
    from vector_db_spark.operators.temporal import range_join_events

    ev = _t(spark, sf_dir, "events")
    return range_join_events(ev, key_cols=("user_id",), window_seconds=600)


_SALTED_JOIN_ORACLE = """
SELECT o.o_orderpriority,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


@query("salted_join_priority_revenue", oracle=_SALTED_JOIN_ORACLE)
def salted_join_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-join-key-proof equi-join (operators/skew.py salted_join): the
    orders side replicates over 16 salts, lineitem salts by its line
    number content hash, and the join key becomes (orderkey, salt) — a
    hot order's lines spread over 16 tasks instead of one. Must be
    value-identical to the plain join (each row meets exactly one
    replica)."""
    from vector_db_spark.operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    joined = salted_join(
        li.select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"),
        orders.select("o_orderkey", "o_orderpriority").withColumnRenamed(
            "o_orderkey", "l_orderkey"
        ),
        ["l_orderkey"],
        n_salts=16,
        salt_on=["l_orderkey", "l_linenumber"],
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(38,6)"
            )
        )
        .cast("double")
        .alias("revenue"),
    )


_MOVING_AVG_ORACLE = """
SELECT event_id,
       user_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS trailing_n,
       round(CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
             / (COUNT(*) OVER w), 6) AS trailing_avg
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY epoch_us(ts)
  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
)
"""


@query("events_moving_avg", oracle=_MOVING_AVG_ORACLE)
def events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour per-user moving average — the time-RANGE window
    frame (every event aggregates its user's events in [ts-1h, ts]).
    Frames are value-ranges over epoch-µs, so tied timestamps share a
    frame deterministically; the windowed sum stays DECIMAL until the
    final divide so the fold order inside the frame can't perturb the
    float result. One shuffle (hash by user_id), per-partition sort —
    no global sort at any scale."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("trailing_n"),
        F.round(
            F.sum(F.col("value").cast("decimal(38,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            6,
        ).alias("trailing_avg"),
    )


_COLSTATS_ORACLE = """
WITH s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS q_nulls,
         CAST(COUNT(DISTINCT CAST(l_quantity AS DOUBLE)) AS BIGINT) AS q_ndv,
         MIN(CAST(l_quantity AS DOUBLE)) AS q_min, MAX(CAST(l_quantity AS DOUBLE)) AS q_max,
         CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS p_nulls,
         CAST(COUNT(DISTINCT CAST(l_extendedprice AS DOUBLE)) AS BIGINT) AS p_ndv,
         MIN(CAST(l_extendedprice AS DOUBLE)) AS p_min, MAX(CAST(l_extendedprice AS DOUBLE)) AS p_max,
         CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS d_nulls,
         CAST(COUNT(DISTINCT CAST(l_discount AS DOUBLE)) AS BIGINT) AS d_ndv,
         MIN(CAST(l_discount AS DOUBLE)) AS d_min, MAX(CAST(l_discount AS DOUBLE)) AS d_max
  FROM lineitem
)
SELECT 'l_quantity' AS "column", n_rows, q_nulls AS n_nulls, q_ndv AS n_distinct,
       q_min AS min_val, q_max AS max_val FROM s
UNION ALL
SELECT 'l_extendedprice', n_rows, p_nulls, p_ndv, p_min, p_max FROM s
UNION ALL
SELECT 'l_discount', n_rows, d_nulls, d_ndv, d_min, d_max FROM s
"""


@query("column_stats_lineitem", oracle=_COLSTATS_ORACLE)
def column_stats_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics (operators/vector_stats.column_stats):
    exact null/NDV/min/max for three lineitem measures in ONE scan — the
    stats that size broadcasts and judge filter selectivity at plan time."""
    from vector_db_spark.operators.vector_stats import column_stats

    return column_stats(
        _t(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount"],
    )


_HISTOGRAM_ORACLE = """
WITH b AS (SELECT MIN(CAST(value AS DOUBLE)) AS lo, MAX(CAST(value AS DOUBLE)) AS hi FROM events),
binned AS (
  SELECT LEAST(19, CAST(floor((CAST(value AS DOUBLE) - b.lo) / ((b.hi - b.lo) / 20)) AS INT)) AS bin,
         b.lo AS lo, (b.hi - b.lo) / 20 AS width
  FROM events, b
  WHERE value IS NOT NULL AND CAST(value AS DOUBLE) >= b.lo AND CAST(value AS DOUBLE) <= b.hi
)
SELECT bin,
       round(lo + CAST(bin AS DOUBLE) * width, 6) AS bin_lo,
       round(lo + CAST(bin + 1 AS DOUBLE) * width, 6) AS bin_hi,
       CAST(COUNT(*) AS BIGINT) AS n
FROM binned GROUP BY bin, lo, width
"""


@query("value_histogram_events", oracle=_HISTOGRAM_ORACLE)
def value_histogram_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bin fixed-width histogram of events.value
    (operators/vector_stats.value_histogram): min/max in one aggregate,
    bin groupBy in another; edges from a pinned double expression so the
    oracle hash-matches them."""
    from vector_db_spark.operators.vector_stats import value_histogram

    res = value_histogram(_t(spark, sf_dir, "events"), "value", bins=20)
    return res.select(
        "bin",
        F.round("bin_lo", 6).alias("bin_lo"),
        F.round("bin_hi", 6).alias("bin_hi"),
        "n",
    )


_CORR_ORACLE = """
WITH m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))) AS DOUBLE) AS sq,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS sp,
         CAST(SUM(CAST(l_discount AS DECIMAL(19,6))) AS DOUBLE) AS sd,
         CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6))) AS DOUBLE) AS qq,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS pp,
         CAST(SUM(CAST(l_discount AS DECIMAL(19,6)) * CAST(l_discount AS DECIMAL(19,6))) AS DOUBLE) AS dd,
         CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS qp,
         CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_discount AS DECIMAL(19,6))) AS DOUBLE) AS qd,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_discount AS DECIMAL(19,6))) AS DOUBLE) AS pd
  FROM lineitem
)
SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
       round((n * qp - sq * sp) / (sqrt(n * qq - sq * sq) * sqrt(n * pp - sp * sp)), 6) AS corr
FROM m
UNION ALL
SELECT 'l_quantity', 'l_discount',
       round((n * qd - sq * sd) / (sqrt(n * qq - sq * sq) * sqrt(n * dd - sd * sd)), 6)
FROM m
UNION ALL
SELECT 'l_extendedprice', 'l_discount',
       round((n * pd - sp * sd) / (sqrt(n * pp - sp * sp) * sqrt(n * dd - sd * sd)), 6)
FROM m
"""


@query("correlation_matrix_lineitem", oracle=_CORR_ORACLE)
def correlation_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Pearson correlation matrix over three lineitem measures in
    ONE scan (operators/vector_stats.correlation_matrix): DECIMAL(19,6)
    operands keep every moment exact (products at 36 digits), and the
    final corr chain is identical IEEE ops on identical operands — a
    hash-matching float statistic with no tolerance anywhere."""
    from vector_db_spark.operators.vector_stats import correlation_matrix

    res = correlation_matrix(
        _t(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount"],
    )
    return res.select("col_x", "col_y", F.round("corr", 6).alias("corr"))


_RETENTION_ORACLE = """
WITH activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
cohorts AS (
  SELECT user_id, MIN(day) AS cohort FROM activity GROUP BY user_id
)
SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_day,
       CAST(a.day - c.cohort AS INT) AS day_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM activity a JOIN cohorts c ON a.user_id = c.user_id
GROUP BY 1, 2
"""


@query("cohort_retention_events", oracle=_RETENTION_ORACLE)
def cohort_retention_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day, counted at
    every later activity-day offset — the standard product-analytics
    matrix. Two hash shuffles (distinct activity, cohort min) plus the
    final grouped distinct count; all integer/date arithmetic, exactly
    reproducible."""
    ev = _t(spark, sf_dir, "events")
    activity = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("day").alias("cohort"))
    return (
        activity.join(cohorts, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


_ANOMALY_ORACLE = """
WITH q AS (
  SELECT event_id, user_id, round(CAST(value AS DOUBLE), 6) AS v FROM events
),
stats AS (
  SELECT user_id,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(v AS DECIMAL(19,6))) AS DOUBLE) AS s,
         CAST(SUM(CAST(v AS DECIMAL(19,6)) * CAST(v AS DECIMAL(19,6))) AS DOUBLE) AS q2
  FROM q GROUP BY user_id
)
SELECT q.event_id, q.user_id, round(q.v, 6) AS v,
       round((q.v - s / n) / sqrt(greatest(q2 / n - (s / n) * (s / n), 1e-12)), 6) AS z
FROM q JOIN stats USING (user_id)
WHERE stats.n >= 5
  AND abs((q.v - s / n) / sqrt(greatest(q2 / n - (s / n) * (s / n), 1e-12))) > 3.0
"""


@query("user_value_anomalies", oracle=_ANOMALY_ORACLE)
def user_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user spike detection: events whose value sits > 3σ from the
    user's own mean. Values quantize to 6 dp FIRST so the per-user
    moments accumulate as exact DECIMAL(19,6) (order-free) and the z
    chain is identical IEEE ops in both engines; the variance floors at
    1e-12 so constant-value users divide safely. One shuffle (user
    groupBy) + a broadcast-shaped stats join back."""
    ev = _t(spark, sf_dir, "events")
    q = ev.select(
        "event_id", "user_id", F.round(F.col("value").cast("double"), 6).alias("v")
    )
    dec = F.col("v").cast("decimal(19,6)")
    stats = q.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec).cast("double").alias("s"),
        F.sum(dec * dec).cast("double").alias("q2"),
    )
    j = q.join(stats, "user_id")
    mean = F.col("s") / F.col("n")
    var = F.greatest(F.col("q2") / F.col("n") - mean * mean, F.lit(1e-12))
    z = (F.col("v") - mean) / F.sqrt(var)
    return (
        j.filter((F.col("n") >= 5) & (F.abs(z) > 3.0))
        .select(
            "event_id", "user_id", F.round("v", 6).alias("v"), F.round(z, 6).alias("z")
        )
    )


_PCTRANK_ORACLE = """
SELECT o_orderkey,
       o_orderpriority,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""


@query("order_price_percentiles", oracle=_PCTRANK_ORACLE)
def order_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-position windows (percent_rank + cume_dist) per
    priority class — deterministic via the (price, key) order."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


_GSETS_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT) AS gid
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
"""


@query("grouping_sets_lineitem", oracle=_GSETS_ORACLE)
def grouping_sets_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (completing rollup/cube): three set shapes
    in one aggregate with grouping_id disambiguation — expressed through
    spark.sql, the declared-SQL face of the engine."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("__gs_lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
               CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT) AS gid
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
    """)


@query("zonemap_append_scan", oracle=_ZONEMAP_ORACLE)
def zonemap_append_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental zone-map ingest: HALF of orders writes zone-mapped,
    the other half APPENDS (batch-local clustering, per-file stats
    appended to the manifest, existing files/rows untouched); the band
    scan over the combined table must equal the unpruned full-table
    filter bit-for-bit — manifests are per-file truths, so pruning stays
    lossless across batches."""
    import tempfile

    from vector_db_spark.sources.zonemap import (
        append_zonemapped,
        read_zonemapped,
        write_zonemapped,
    )

    orders = _t(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="zonemap_append_")
    write_zonemapped(
        orders.filter(F.col("o_orderkey") % 2 == 0), path, "o_totalprice", n_files=8
    )
    n_new = append_zonemapped(
        orders.filter(F.col("o_orderkey") % 2 == 1), path, "o_totalprice", n_files=8
    )
    assert n_new > 0, "append must add files"
    scan = read_zonemapped(spark, path, lo=100000, hi=150000)
    return scan.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dsum(F.col("o_totalprice")).alias("total_price"),
    )
