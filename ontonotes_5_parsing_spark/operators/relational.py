"""Relational operator queries (SURVEY.md §2.1-2.7) over the TPC-H-ish
driver tables, each with a DuckDB oracle.

Numeric conventions shared with the oracles: money sums rounded to 2
decimals, averages to 4; every computed column aliased identically on
both sides; top-k always ordered by (metric, unique key) so ties are
deterministic (SURVEY.md §7 hard part 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- A-ops: grouped aggregation with partial/final hash agg (A1-A3) ----
def q_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                              AS sum_qty,
       round(sum(l_extendedprice), 2)                         AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)      AS sum_disc_price,
       round(avg(l_quantity), 4)                              AS avg_qty,
       round(avg(l_discount), 4)                              AS avg_disc,
       count(*)                                               AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --- J-ops: multi-join + agg + deterministic top-k (J1, A4, O4) --------
def q_shipping_priority(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1999-01-01")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1999-01-01")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.max(F.unix_timestamp("o_orderdate")).alias("o_orderdate_epoch"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


SQL_SHIPPING_PRIORITY = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(max(epoch(o_orderdate)) AS BIGINT)           AS o_orderdate_epoch
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-01-01'
  AND l_shipdate  > TIMESTAMP '1999-01-01'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --- 6-way join through the dimension chain (J1 at scale: broadcast) ---
def q_local_supplier_volume(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


SQL_LOCAL_SUPPLIER_VOLUME = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*)                                          AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE' AND c_nationkey = s_nationkey
GROUP BY n_name
"""


def q_top_customers(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .select(
            F.col("c_custkey"), F.col("c_name"), F.col("total_spend"), F.col("n_orders")
        )
        .orderBy(F.desc("total_spend"), "c_custkey")
        .limit(15)
    )


SQL_TOP_CUSTOMERS = """
SELECT c_custkey, c_name,
       round(sum(o_totalprice), 2) AS total_spend,
       count(*)                    AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spend DESC, c_custkey
LIMIT 15
"""


# --- rollup (A7 stats rollup) -------------------------------------------
def q_order_rollup(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


SQL_ORDER_ROLLUP = """
SELECT o_orderstatus, o_orderpriority,
       count(*)                    AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q_order_cube(spark, sf_dir):
    """CUBE over (status, priority): all 2^2 grouping combinations —
    completes the rollup / grouping-sets / cube analytics triad."""
    orders = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )


SQL_ORDER_CUBE = """
SELECT o_orderstatus, o_orderpriority,
       count(*)                    AS n_orders,
       round(avg(o_totalprice), 4) AS avg_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --- semi/anti joins (E-ops, resume primitive §2.3) ----------------------
def q_parts_never_ordered(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    recent = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= "2001-06-01"
    )
    return (
        part.join(recent, part.p_partkey == recent.l_partkey, "left_anti")
        .select("p_partkey", "p_name", "p_type")
    )


SQL_PARTS_NEVER_ORDERED = """
SELECT p_partkey, p_name, p_type
FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem
                  WHERE l_partkey = p_partkey
                    AND l_shipdate >= TIMESTAMP '2001-06-01')
"""


def q_customers_with_open_orders(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    open_orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return cust.join(
        open_orders, cust.c_custkey == open_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


SQL_CUSTOMERS_WITH_OPEN_ORDERS = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
"""


# --- set ops (E1-E4) -----------------------------------------------------
def q_custkeys_in_both_statuses(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    open_keys = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    done_keys = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_keys.intersect(done_keys).withColumnRenamed("o_custkey", "custkey")


SQL_CUSTKEYS_IN_BOTH_STATUSES = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
"""


# --- pivot / conditional aggregation ------------------------------------
def q_segment_status_pivot(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    return (
        joined.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["O", "F", "P"])
    )


SQL_SEGMENT_STATUS_PIVOT = """
SELECT c_mktsegment,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
       count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
       count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# --- distinct aggregation -----------------------------------------------
def q_status_distinct_customers(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


SQL_STATUS_DISTINCT_CUSTOMERS = """
SELECT o_orderstatus,
       count(DISTINCT o_custkey) AS n_customers,
       count(*)                  AS n_orders
FROM orders GROUP BY o_orderstatus
"""


# --- top-k per group via window (ranking analytic, §2.5 engine use) ------
def q_first_orders_per_customer(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select(
            "o_custkey",
            "o_orderkey",
            F.unix_timestamp("o_orderdate").alias("o_orderdate_epoch"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "rn",
        )
    )


SQL_FIRST_ORDERS_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey,
       CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_epoch,
       round(o_totalprice, 2)             AS o_totalprice,
       rn
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 2
"""


# --- running / lag windows over order history ----------------------------
def q_customer_running_spend(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
            2,
        ).alias("running_spend"),
        F.round(F.lag("o_totalprice", 1).over(w), 2).alias("prev_price"),
    )


SQL_CUSTOMER_RUNNING_SPEND = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS UNBOUNDED PRECEDING), 2) AS running_spend,
       round(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey), 2) AS prev_price
FROM orders
"""


# --- broadcast dim join + agg (supplier geography) ------------------------
def q_supplier_nation_stats(spark, sf_dir):
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.avg("s_acctbal"), 4).alias("avg_acctbal"),
        )
    )


SQL_SUPPLIER_NATION_STATS = """
SELECT n_name, count(*) AS n_suppliers, round(avg(s_acctbal), 4) AS avg_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


# --- grouping sets via the SQL API (A7 family) ---------------------------
def q_grouping_sets(spark, sf_dir):
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_gs")
    return spark.sql(
        """
        SELECT c_mktsegment, o_orderstatus,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders_gs JOIN customer_gs ON o_custkey = c_custkey
        GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), ())
        """
    )


SQL_GROUPING_SETS = """
SELECT c_mktsegment, o_orderstatus,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), ())
"""


# --- correlated scalar subquery (Catalyst decorrelation, TPC-H Q17-ish) ---
# Written as genuine correlated SQL on the Spark side too: Catalyst
# decorrelates it into an aggregate + join (no per-row re-execution),
# which is exactly the rewrite the reference's nested loops would need
# at scale. Per-brand so the result is a grouped table, not one row.
def q_small_quantity_revenue(spark, sf_dir):
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_sq")
    _t(spark, sf_dir, "part").createOrReplaceTempView("part_sq")
    return spark.sql(
        """
        SELECT p.p_brand,
               count(*) AS n_small,
               round(sum(l1.l_extendedprice), 2) AS revenue
        FROM lineitem_sq l1 JOIN part_sq p ON l1.l_partkey = p.p_partkey
        WHERE l1.l_quantity < 0.5 * (
            SELECT avg(l2.l_quantity) FROM lineitem_sq l2
            WHERE l2.l_partkey = l1.l_partkey)
        GROUP BY p.p_brand
        """
    )


SQL_SMALL_QUANTITY_REVENUE = """
SELECT p.p_brand,
       count(*) AS n_small,
       round(sum(l1.l_extendedprice), 2) AS revenue
FROM lineitem l1 JOIN part p ON l1.l_partkey = p.p_partkey
WHERE l1.l_quantity < 0.5 * (
    SELECT avg(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l1.l_partkey)
GROUP BY p.p_brand
"""


# --- exact interpolated percentiles (distribution profiling) ---------------
# Spark's exact `percentile` and DuckDB's `quantile_cont` share the
# classic (1-g)·a + g·b interpolation, so the values hash identically at
# round-4. Exact percentiles need the group sorted — the single shuffle
# is on the group key; for sketch-grade profiling at 100 TB the engine
# would swap in approx_percentile (t-digest) with the same query shape.
def q_quantity_percentiles(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 4).alias("p75"),
        F.round(F.expr("percentile(l_quantity, 0.95)"), 4).alias("p95"),
    )


SQL_QUANTITY_PERCENTILES = """
SELECT l_returnflag,
       count(*)                              AS n_rows,
       round(quantile_cont(l_quantity, 0.25), 4) AS p25,
       round(quantile_cont(l_quantity, 0.5), 4)  AS p50,
       round(quantile_cont(l_quantity, 0.75), 4) AS p75,
       round(quantile_cont(l_quantity, 0.95), 4) AS p95
FROM lineitem GROUP BY l_returnflag
"""


# --- dense_rank leaderboard (ranking-window family completion) -------------
def q_customer_spend_rank(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    spend = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "c_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spend"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("total_spend"), "c_custkey"
    )
    return (
        spend.withColumn("spend_rank", F.dense_rank().over(w))
        .filter(F.col("spend_rank") <= 5)
        .select("c_mktsegment", "c_custkey", "total_spend", "spend_rank")
    )


SQL_CUSTOMER_SPEND_RANK = """
WITH spend AS (
  SELECT c_mktsegment, c_custkey,
         round(sum(o_totalprice), 2) AS total_spend
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment, c_custkey
)
SELECT c_mktsegment, c_custkey, total_spend,
       dense_rank() OVER (PARTITION BY c_mktsegment
                          ORDER BY total_spend DESC, c_custkey) AS spend_rank
FROM spend
QUALIFY spend_rank <= 5
"""


# --- full outer join (completes the join-type surface) ---------------------
# Per-nation customer balance vs supplier balance: either side may be
# missing a nation, so the combine is a genuine FULL OUTER on the
# aggregated (tiny) per-nation tables — at scale both inputs are already
# reduced before the join, which is the shape that avoids shuffling the
# fact tables twice.
def q_nation_balance_full_outer(spark, sf_dir):
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.round(F.sum("c_acctbal"), 2).alias("cust_balance"))
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.round(F.sum("s_acctbal"), 2).alias("supp_balance"))
    )
    return (
        cust.join(supp, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("cust_balance", F.lit(0.0)).alias("cust_balance"),
            F.coalesce("supp_balance", F.lit(0.0)).alias("supp_balance"),
        )
    )


SQL_NATION_BALANCE_FULL_OUTER = """
WITH cust AS (
  SELECT c_nationkey AS nationkey, round(sum(c_acctbal), 2) AS cust_balance
  FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey
), supp AS (
  SELECT s_nationkey AS nationkey, round(sum(s_acctbal), 2) AS supp_balance
  FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey
)
SELECT coalesce(cust.nationkey, supp.nationkey) AS nationkey,
       coalesce(cust_balance, 0.0) AS cust_balance,
       coalesce(supp_balance, 0.0) AS supp_balance
FROM cust FULL OUTER JOIN supp USING (nationkey)
"""


# --- market share by year (TPC-H Q8 shape: conditional share) --------------
# Per (order-year): EUROPE-supplier revenue share of total revenue —
# conditional-sum over a 5-way join with every dimension broadcast; the
# only large shuffle is the final per-year aggregation.
def q_market_share(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    nr = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "r_name")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(F.sum(F.when(F.col("r_name") == "EUROPE", vol)), 2).alias(
                "europe_volume"
            ),
            F.round(F.sum(vol), 2).alias("total_volume"),
            F.round(
                F.sum(F.when(F.col("r_name") == "EUROPE", vol)) / F.sum(vol), 4
            ).alias("mkt_share"),
        )
    )


SQL_MARKET_SHARE = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(CASE WHEN r_name = 'EUROPE'
                      THEN l_extendedprice * (1 - l_discount) END), 2)
         AS europe_volume,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_volume,
       round(sum(CASE WHEN r_name = 'EUROPE'
                      THEN l_extendedprice * (1 - l_discount) END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY year(o_orderdate)
"""


# --- statistical moments (stddev / correlation profiling) ------------------
def q_stats_moments(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("qty_stddev"),
        F.round(F.var_samp("l_discount"), 6).alias("disc_variance"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
    )


SQL_STATS_MOMENTS = """
SELECT l_returnflag,
       count(*)                                   AS n_rows,
       round(stddev_samp(l_quantity), 4)          AS qty_stddev,
       round(var_samp(l_discount), 6)             AS disc_variance,
       round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr
FROM lineitem GROUP BY l_returnflag
"""


QUERIES = {
    "rel_market_share": (q_market_share, SQL_MARKET_SHARE),
    "rel_stats_moments": (q_stats_moments, SQL_STATS_MOMENTS),
    "rel_nation_balance_full_outer": (
        q_nation_balance_full_outer,
        SQL_NATION_BALANCE_FULL_OUTER,
    ),
    "rel_quantity_percentiles": (q_quantity_percentiles, SQL_QUANTITY_PERCENTILES),
    "win_customer_spend_rank": (q_customer_spend_rank, SQL_CUSTOMER_SPEND_RANK),
    "rel_small_quantity_revenue": (
        q_small_quantity_revenue,
        SQL_SMALL_QUANTITY_REVENUE,
    ),
    "rel_grouping_sets": (q_grouping_sets, SQL_GROUPING_SETS),
    "rel_pricing_summary": (q_pricing_summary, SQL_PRICING_SUMMARY),
    "rel_shipping_priority": (q_shipping_priority, SQL_SHIPPING_PRIORITY),
    "rel_local_supplier_volume": (q_local_supplier_volume, SQL_LOCAL_SUPPLIER_VOLUME),
    "rel_top_customers": (q_top_customers, SQL_TOP_CUSTOMERS),
    "rel_order_rollup": (q_order_rollup, SQL_ORDER_ROLLUP),
    "rel_order_cube": (q_order_cube, SQL_ORDER_CUBE),
    "rel_parts_never_ordered": (q_parts_never_ordered, SQL_PARTS_NEVER_ORDERED),
    "rel_customers_with_open_orders": (
        q_customers_with_open_orders,
        SQL_CUSTOMERS_WITH_OPEN_ORDERS,
    ),
    "rel_custkeys_in_both_statuses": (
        q_custkeys_in_both_statuses,
        SQL_CUSTKEYS_IN_BOTH_STATUSES,
    ),
    "rel_segment_status_pivot": (q_segment_status_pivot, SQL_SEGMENT_STATUS_PIVOT),
    "rel_status_distinct_customers": (
        q_status_distinct_customers,
        SQL_STATUS_DISTINCT_CUSTOMERS,
    ),
    "win_first_orders_per_customer": (
        q_first_orders_per_customer,
        SQL_FIRST_ORDERS_PER_CUSTOMER,
    ),
    "win_customer_running_spend": (q_customer_running_spend, SQL_CUSTOMER_RUNNING_SPEND),
    "rel_supplier_nation_stats": (q_supplier_nation_stats, SQL_SUPPLIER_NATION_STATS),
}
