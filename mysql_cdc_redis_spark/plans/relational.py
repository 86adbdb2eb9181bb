"""Relational breadth queries (SURVEY.md §2 EXT rows: A6/A7, J5/J6/J7,
W5/W6, P8, T6-batch).

The reference has no relational joins/aggregates (SURVEY.md §2.5 — its
closest idioms are key lookups and manifest anti-joins), but the driver
contract requires a full oracle-checkable relational surface.  Every plan
here is pure DataFrame API: Catalyst handles pushdown/pruning, AQE picks
broadcast vs sort-merge at runtime.  Small dims (region, nation,
supplier) are explicitly broadcast — at 100 TB those stay < 1 MB while
lineitem is ~70 TB, so the hint removes a full shuffle of the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .catalog import register

# ---------------------------------------------------------------------------
# A6: grouped aggregation — TPC-H Q1 shape (pricing summary)
# ---------------------------------------------------------------------------


@register(
    "agg_pricing_summary",
    doc="TPC-H Q1-style pricing summary: hash aggregate with partial/final "
    "(map-side combine) over the fact table; filter pushed to parquet scan.",
    tags=("agg", "ext"),
    bench=True,
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                    AS sum_qty,
       round(sum(l_extendedprice), 2)                               AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4)                                    AS avg_qty,
       round(avg(l_extendedprice), 4)                               AS avg_price,
       round(avg(l_discount), 4)                                    AS avg_disc,
       count(*)                                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# J5 + W6: join + top-k — TPC-H Q3 shape (shipping priority)
# ---------------------------------------------------------------------------


@register(
    "join_shipping_priority",
    doc="TPC-H Q3-style: customer ⋈ orders ⋈ lineitem, filtered both sides, "
    "grouped revenue, global top-10 (Spark plans TakeOrderedAndProject — "
    "no full sort at scale).",
    tags=("join", "topk", "ext"),
    bench=True,
    oracle="""
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1999-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def join_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1999-03-15 00:00:00").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# J5 flagship: TPC-H Q5 shape — revenue by nation (the entry() query)
# ---------------------------------------------------------------------------


@register(
    "join_revenue_by_nation",
    doc="TPC-H Q5-style 5-way star join: lineitem ⋈ orders ⋈ customer ⋈ "
    "nation ⋈ region with nation/region broadcast (tiny dims never "
    "shuffle the fact table).",
    tags=("join", "agg", "ext", "flagship"),
    bench=True,
    oracle="""
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
)
def join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # region/nation are O(10²) rows at any scale factor: broadcast them so
    # the only shuffles are the two fact-side equi-joins (AQE may even turn
    # those into broadcasts at small SF).
    dim = F.broadcast(
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")).join(
            F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
        )
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(dim, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


# ---------------------------------------------------------------------------
# W5: ranking window — top customers per nation
# ---------------------------------------------------------------------------


@register(
    "window_top_customers_per_nation",
    doc="Per-group top-k via row_number window (the W1 last-event-per-key "
    "pattern generalized): rank customers by acctbal within nation.",
    tags=("window", "ext"),
    oracle="""
SELECT n_name, c_name, round(c_acctbal, 2) AS acctbal, rk
FROM (
  SELECT n_name, c_name, c_acctbal,
         row_number() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rk
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)
WHERE rk <= 3
ORDER BY n_name, rk
""",
)
def window_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("n_name", "c_name", F.round("c_acctbal", 2).alias("acctbal"), "rk")
        .orderBy("n_name", "rk")
    )


# ---------------------------------------------------------------------------
# W5: analytic window — running revenue + lag/lead
# ---------------------------------------------------------------------------


@register(
    "window_running_revenue_by_month",
    doc="Monthly order revenue with running cumulative sum and lag — "
    "rowsBetween frame over an ordered partition.",
    tags=("window", "ext"),
    oracle="""
SELECT yr, mon, revenue,
       round(sum(revenue) OVER (PARTITION BY yr ORDER BY mon
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_revenue,
       round(coalesce(lag(revenue) OVER (PARTITION BY yr ORDER BY mon), 0.0), 2) AS prev_month_revenue
FROM (
  SELECT CAST(year(o_orderdate) AS INT)  AS yr,
         CAST(month(o_orderdate) AS INT) AS mon,
         round(sum(o_totalprice), 2)     AS revenue
  FROM orders GROUP BY 1, 2
)
ORDER BY yr, mon
""",
)
def window_running_revenue_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.month("o_orderdate").cast("int").alias("mon"),
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.partitionBy("yr").orderBy("mon")
    return (
        monthly.withColumn(
            "running_revenue",
            F.round(F.sum("revenue").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2),
        )
        .withColumn("prev_month_revenue", F.round(F.coalesce(F.lag("revenue").over(w), F.lit(0.0)), 2))
        .orderBy("yr", "mon")
    )


# ---------------------------------------------------------------------------
# A7: rollup / cube
# ---------------------------------------------------------------------------


@register(
    "agg_rollup_region_nation",
    doc="ROLLUP (region, nation) revenue — hierarchical subtotals + grand "
    "total in one pass (Catalyst expands to a single Expand+Aggregate).",
    tags=("agg", "rollup", "ext"),
    oracle="""
SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
       round(sum(c_acctbal), 2) AS total_acctbal, count(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY region, nation
""",
)
def agg_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")).join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "total_acctbal",
            "n_customers",
        )
        .orderBy("region", "nation")
    )


@register(
    "agg_cube_status_priority",
    doc="CUBE (orderstatus, orderpriority): all 4 grouping-set combinations "
    "in one aggregate.",
    tags=("agg", "cube", "ext"),
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL')   AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY status, priority
""",
)
def agg_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
        .orderBy("status", "priority")
    )


# ---------------------------------------------------------------------------
# A6: count distinct
# ---------------------------------------------------------------------------


@register(
    "agg_distinct_customers_per_status",
    doc="COUNT(DISTINCT) per group — Catalyst plans a two-phase distinct "
    "aggregate (Expand + partial) instead of a naive re-shuffle.",
    tags=("agg", "ext"),
    oracle="""
SELECT o_orderstatus AS status,
       count(DISTINCT o_custkey) AS n_customers,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
ORDER BY status
""",
)
def agg_distinct_customers_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("status")
    )


# ---------------------------------------------------------------------------
# J3 (as left_anti) + J7: anti join, set ops
# ---------------------------------------------------------------------------


@register(
    "join_anti_customers_without_orders",
    doc="LEFT ANTI join — the reference's manifest set-difference idiom "
    "(dump2csv.py:207,230 `set(a) - set(b)`) as a distributed anti join.",
    tags=("join", "anti", "ref:J3"),
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_custkey IS NOT NULL
                          AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
ORDER BY c_custkey
""",
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    # subtract only the 1995 manifest so the set-difference is non-trivial
    # at every SF (every fixture customer has SOME order)
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "set_ops_urgent_vs_building",
    doc="UNION / INTERSECT / EXCEPT over key sets (J7): customers with "
    "urgent orders vs BUILDING-segment customers, tagged by membership.",
    tags=("setop", "ext"),
    oracle="""
WITH urgent AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
     building AS (SELECT DISTINCT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING')
SELECT 'both' AS membership, custkey FROM (SELECT custkey FROM urgent INTERSECT SELECT custkey FROM building)
UNION ALL
SELECT 'urgent_only' AS membership, custkey FROM (SELECT custkey FROM urgent EXCEPT SELECT custkey FROM building)
UNION ALL
SELECT 'building_only' AS membership, custkey FROM (SELECT custkey FROM building EXCEPT SELECT custkey FROM urgent)
ORDER BY membership, custkey
""",
)
def set_ops_urgent_vs_building(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    building = (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
        .distinct()
    )
    both = urgent.intersect(building).select(F.lit("both").alias("membership"), "custkey")
    u_only = urgent.exceptAll(building).select(
        F.lit("urgent_only").alias("membership"), "custkey"
    )
    b_only = building.exceptAll(urgent).select(
        F.lit("building_only").alias("membership"), "custkey"
    )
    return both.unionByName(u_only).unionByName(b_only).orderBy("membership", "custkey")


# ---------------------------------------------------------------------------
# P8: scalar function breadth (string / date / math)
# ---------------------------------------------------------------------------


@register(
    "scalar_string_date_math",
    doc="Scalar-function breadth (P8): upper/substring/concat, year/month/"
    "datediff, round/abs/ln — all JVM built-ins inside whole-stage codegen.",
    tags=("scalar", "ext"),
    oracle="""
SELECT p_partkey,
       upper(p_brand)                                   AS brand_upper,
       substring(p_name, 1, 8)                          AS name_prefix,
       concat(p_brand, ':', p_type)                     AS brand_type,
       length(p_name)                                   AS name_len,
       round(p_retailprice * 1.1, 2)                    AS price_with_tax,
       round(abs(p_retailprice - 1000.0), 2)            AS price_dist_1000,
       round(ln(p_retailprice + 1.0), 6)                AS log_price,
       CAST(p_size % 5 AS INT)                          AS size_mod5
FROM part
ORDER BY p_partkey
""",
)
def scalar_string_date_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("price_with_tax"),
        F.round(F.abs(F.col("p_retailprice") - 1000.0), 2).alias("price_dist_1000"),
        F.round(F.log(F.col("p_retailprice") + 1.0), 6).alias("log_price"),
        (F.col("p_size") % 5).cast("int").alias("size_mod5"),
    ).orderBy("p_partkey")


@register(
    "scalar_json_events",
    doc="JSON extraction over events.props (P8): get_json_object stays "
    "JVM-side; grouped stats per event_type and extracted key bucket.",
    tags=("scalar", "json", "ext"),
    oracle="""
SELECT event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       count(*) AS n,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY event_type, k_bucket
""",
)
def scalar_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn(
            "k_bucket", (F.get_json_object("props", "$.k").cast("bigint") % 10)
        )
        .groupBy("event_type", "k_bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("event_type", "k_bucket")
    )


# ---------------------------------------------------------------------------
# T6 (batch form): tumbling window aggregation over the events stream table
# ---------------------------------------------------------------------------


@register(
    "window_tumbling_events_10min",
    doc="Tumbling 10-minute event-time windows (T6, batch form of the "
    "streaming window): F.window ≡ DuckDB time_bucket.",
    tags=("window", "time", "ext"),
    bench=True,
    oracle="""
SELECT CAST(time_bucket(INTERVAL '10 minutes', ts) AS TIMESTAMP) AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
""",
)
def window_tumbling_events_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# J6: as-of join — latest order at or before each event, per customer
# ---------------------------------------------------------------------------


@register(
    "join_asof_event_last_order",
    doc="AS-OF join (J6): for each event, the customer's latest order with "
    "o_orderdate <= ts.  Spark has no ASOF keyword; the scalable spelling "
    "is union-both-sides + last(ignorenulls) over one (key, time) window — "
    "a single shuffle, no range cross-join.  Oracle uses DuckDB ASOF JOIN.",
    tags=("join", "asof", "ext"),
    bench=True,
    oracle="""
WITH ded_orders AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, o.o_orderkey AS last_orderkey
FROM events e
ASOF JOIN ded_orders o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
ORDER BY e.event_id
""",
)
def join_asof_event_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    # Dedupe orders to one per (custkey, orderdate) so the as-of pick is
    # deterministic on ties (both sides use max orderkey).
    ded = orders.groupBy("o_custkey", "o_orderdate").agg(F.max("o_orderkey").alias("o_orderkey"))
    right = ded.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("kind"),  # orders sort before events at equal t (>= is inclusive)
        F.col("o_orderkey").alias("orderkey"),
        F.lit(None).cast("long").alias("event_id"),
    )
    left = events.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("orderkey"),
        "event_id",
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        right.unionByName(left)
        .withColumn("last_orderkey", F.last("orderkey", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .filter(F.col("last_orderkey").isNotNull())
        .select("event_id", F.col("k").alias("user_id"), "last_orderkey")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# J6: range join — events within 1 day after an order by the same customer
# ---------------------------------------------------------------------------


@register(
    "join_range_event_near_order",
    doc="Range/interval join (J6): equi key (customer) + time-band predicate. "
    "The equi component keeps it a hash join with a residual band filter — "
    "never a cross join.",
    tags=("join", "range", "ext"),
    oracle="""
SELECT a.event_id AS purchase_id, b.event_id AS error_id,
       CAST(date_diff('second', b.ts, a.ts) AS BIGINT) AS secs_before
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'purchase'
 AND b.event_type = 'error'
 AND b.ts >= a.ts - INTERVAL 1 HOUR
 AND b.ts <  a.ts
ORDER BY purchase_id, error_id
""",
)
def join_range_event_near_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    # purchase-error proximity: errors by the same user in the hour before
    # a purchase (events and orders live in disjoint eras in the fixtures,
    # so the band must pair events with events to be non-trivial)
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
        F.col("event_id").alias("error_id"),
    )
    return (
        purchases.join(
            errors,
            (F.col("p_user") == F.col("e_user"))
            & (F.col("e_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("e_ts") < F.col("p_ts")),
        )
        .select(
            "purchase_id",
            "error_id",
            (F.unix_timestamp("p_ts") - F.unix_timestamp("e_ts")).alias("secs_before"),
        )
        .orderBy("purchase_id", "error_id")
    )


# ---------------------------------------------------------------------------
# W6: global top-k
# ---------------------------------------------------------------------------


@register(
    "topk_largest_orders",
    doc="Global top-k: orderBy+limit plans as TakeOrderedAndProject "
    "(per-partition heap + driver merge of k rows, never a full sort).",
    tags=("topk", "ext"),
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS totalprice, o_orderstatus
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
)
def topk_largest_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "o_orderstatus")
    )


# ---------------------------------------------------------------------------
# A6: HAVING — post-aggregate filter
# ---------------------------------------------------------------------------


@register(
    "agg_having_big_customers",
    doc="Aggregate + HAVING: customers with >= 12 orders and total spend "
    "above 1M; the filter lands after the final aggregate.",
    tags=("agg", "ext"),
    oracle="""
SELECT o_custkey AS custkey, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_spend
FROM orders
GROUP BY o_custkey
HAVING count(*) >= 12 AND sum(o_totalprice) > 1000000
ORDER BY custkey
""",
)
def agg_having_big_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("_spend"),
        )
        .filter((F.col("n_orders") >= 12) & (F.col("_spend") > 1_000_000))
        .select("custkey", "n_orders", F.round("_spend", 2).alias("total_spend"))
        .orderBy("custkey")
    )


# ---------------------------------------------------------------------------
# J5: left semi — EXISTS
# ---------------------------------------------------------------------------


@register(
    "join_semi_customers_with_urgent",
    doc="LEFT SEMI join (EXISTS): customers having at least one urgent "
    "order — probe side streams, no duplicate inflation.",
    tags=("join", "semi", "ext"),
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
ORDER BY c_custkey
""",
)
def join_semi_customers_with_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# A6: conditional aggregation (pivot-shaped)
# ---------------------------------------------------------------------------


@register(
    "agg_conditional_pivot_status",
    doc="Pivot-shaped conditional aggregation: one row per nation with "
    "per-orderstatus revenue columns via sum(CASE WHEN ...) — a single "
    "aggregate pass instead of three.",
    tags=("agg", "pivot", "ext"),
    oracle="""
SELECT n_name,
       round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS open_rev,
       round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS filled_rev,
       round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS partial_rev
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
""",
)
def agg_conditional_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    def rev(status: str) -> F.Column:
        return F.round(
            F.sum(F.when(F.col("o_orderstatus") == status, F.col("o_totalprice")).otherwise(0.0)),
            2,
        )

    return (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            rev("O").alias("open_rev"),
            rev("F").alias("filled_rev"),
            rev("P").alias("partial_rev"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# T6: session windows (batch form)
# ---------------------------------------------------------------------------


@register(
    "window_session_events",
    doc="Session windows per user with a 30-minute gap (session_window); "
    "oracle spells the same semantics with lag + cumulative flag — a "
    "genuinely different formulation, strong cross-check.",
    tags=("window", "session", "ext"),
    oracle="""
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR date_diff('microsecond', lag(ts) OVER (PARTITION BY user_id ORDER BY ts), ts) >= 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM ordered
)
SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS session_start, count(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_start
""",
)
def window_session_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
        .orderBy("user_id", "session_start")
    )


# ---------------------------------------------------------------------------
# A6: sketch aggregates (approx_count_distinct) — rows-only check: the
# HLL estimate is Spark-specific, no engine-portable oracle exists.
# ---------------------------------------------------------------------------


@register(
    "agg_approx_distinct_users",
    doc="approx_count_distinct (HyperLogLog++) next to the exact count — "
    "the mergeable-sketch path for 100 TB cardinality estimation.  No "
    "oracle: the estimate is implementation-specific (driver records "
    "rows-only).",
    tags=("agg", "sketch", "ext"),
    oracle=None,
)
def agg_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# P8 / §1.3: cast breadth + type fidelity
# ---------------------------------------------------------------------------


@register(
    "scalar_cast_fidelity",
    doc="Type-map fidelity (§1.3): int↔string↔double↔timestamp↔date casts "
    "round-tripping through the warehouse type system; the reference "
    "stringifies everything in Redis (rcache.py:139) — these casts are "
    "the typed-engine replacement.",
    tags=("scalar", "types", "ext"),
    oracle="""
SELECT o_orderkey,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
       CAST(floor(o_totalprice) AS BIGINT) AS price_int,  -- duckdb rounds on cast, spark truncates; floor pins both
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(o_orderkey % 2 = 0 AS BOOLEAN) AS is_even
FROM orders
ORDER BY o_orderkey
""",
)
def scalar_cast_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
        F.floor("o_totalprice").cast("bigint").alias("price_int"),
        F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
        F.year("o_orderdate").cast("int").alias("yr"),
        (F.col("o_orderkey") % 2 == 0).alias("is_even"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# A6: statistical aggregates — exact percentile + stddev
# ---------------------------------------------------------------------------


@register(
    "agg_percentile_stddev",
    doc="Exact interpolated median (percentile ≡ quantile_cont) and sample "
    "stddev of order totals per status; spread metrics rounded to absorb "
    "shuffle-order float noise.",
    tags=("agg", "stats", "ext"),
    oracle="""
SELECT o_orderstatus AS status,
       round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
       round(stddev_samp(o_totalprice), 2) AS sd_price,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price
FROM orders
GROUP BY o_orderstatus
ORDER BY status
""",
)
def agg_percentile_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 2).alias("median_price"),
            F.round(F.stddev_samp("o_totalprice"), 2).alias("sd_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("status")
    )


# ---------------------------------------------------------------------------
# J5/A6: correlated scalar subquery — decorrelated as a window
# ---------------------------------------------------------------------------


@register(
    "subquery_parts_above_brand_avg",
    doc="Correlated scalar subquery (parts priced above their brand's "
    "average) — decorrelated into a single window pass instead of a "
    "per-row subquery re-scan.",
    tags=("subquery", "window", "ext"),
    oracle="""
SELECT p_partkey, p_brand, round(p_retailprice, 2) AS price
FROM (
  SELECT p_partkey, p_brand, p_retailprice,
         avg(p_retailprice) OVER (PARTITION BY p_brand) AS brand_avg
  FROM part
)
WHERE p_retailprice > brand_avg
ORDER BY p_partkey
""",
)
def subquery_parts_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand")
    return (
        part.withColumn("brand_avg", F.avg("p_retailprice").over(w))
        .filter(F.col("p_retailprice") > F.col("brand_avg"))
        .select(
            "p_partkey",
            "p_brand",
            F.round("p_retailprice", 2).alias("price"),
            # brand_avg itself is not emitted: a group mean can land on an
            # exact rounding half-way point where engine sum order flips
            # the last digit; membership (strict >) is ulp-stable
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# P8: pattern matching — LIKE / regexp filters
# ---------------------------------------------------------------------------


@register(
    "scalar_like_regexp_filters",
    doc="Pattern-matching breadth: LIKE prefix/infix, regexp_like with "
    "alternation and anchors — all pushdown-friendly JVM predicates.",
    tags=("scalar", "pattern", "ext"),
    oracle="""
SELECT p_partkey, p_name, p_type
FROM part
WHERE p_name LIKE 'red %'
   OR (p_type LIKE '%DARD%' AND regexp_matches(p_name, '(gear|bolt)$'))
ORDER BY p_partkey
""",
)
def scalar_like_regexp_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(
            F.col("p_name").like("red %")
            | (F.col("p_type").like("%DARD%") & F.col("p_name").rlike("(gear|bolt)$"))
        )
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# P8 / §1.3: null semantics — coalesce, nullif, null-safe equality
# ---------------------------------------------------------------------------


@register(
    "scalar_null_semantics",
    doc="NULL-handling surface: nullif to synthesize nulls, coalesce "
    "defaults, null-safe equality (<=> ≡ IS NOT DISTINCT FROM), and "
    "null-aware counts — the typed replacement for the reference's "
    "everything-is-a-string Redis cache.",
    tags=("scalar", "nulls", "ext"),
    oracle="""
WITH t AS (
  SELECT o_orderkey,
         nullif(o_orderstatus, 'P') AS status_or_null,
         nullif(CAST(o_orderkey % 5 AS INT), 0) AS mod_or_null
  FROM orders
)
SELECT coalesce(status_or_null, '<none>') AS status_filled,
       (status_or_null IS NOT DISTINCT FROM 'O') AS is_open_nullsafe,
       count(*) AS n,
       count(mod_or_null) AS n_nonnull_mod,
       count(*) - count(mod_or_null) AS n_null_mod
FROM t
GROUP BY 1, 2
ORDER BY status_filled, is_open_nullsafe
""",
)
def scalar_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    t = orders.select(
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
        F.nullif((F.col("o_orderkey") % 5).cast("int"), F.lit(0)).alias("mod_or_null"),
    )
    return (
        t.groupBy(
            F.coalesce("status_or_null", F.lit("<none>")).alias("status_filled"),
            F.col("status_or_null").eqNullSafe(F.lit("O")).alias("is_open_nullsafe"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("mod_or_null").alias("n_nonnull_mod"),
            (F.count(F.lit(1)) - F.count("mod_or_null")).alias("n_null_mod"),
        )
        .orderBy("status_filled", "is_open_nullsafe")
    )


# ---------------------------------------------------------------------------
# SQL front-end surface: the same engine through spark.sql
# ---------------------------------------------------------------------------


@register(
    "sql_api_revenue_by_region",
    doc="The SQL front-end surface: identical star-join semantics "
    "expressed through spark.sql over registered temp views — the "
    "engine is equally usable from pure SQL (Catalyst plans both APIs "
    "to the same physical plan).",
    tags=("sql", "join", "ext"),
    oracle="""
SELECT r_name AS region,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY region
""",
)
def sql_api_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT r_name AS region,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_lineitems
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name
        ORDER BY region
        """
    )


# ---------------------------------------------------------------------------
# A7: explicit GROUPING SETS with grouping_id
# ---------------------------------------------------------------------------


@register(
    "agg_grouping_sets",
    doc="Explicit GROUPING SETS ((status, priority), (status), ()) with "
    "grouping_id — finer-grained than rollup/cube, one Expand pass.",
    tags=("agg", "groupingsets", "ext"),
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
       count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
ORDER BY gid, status, priority
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY gid, status, priority
        """
    )


# ---------------------------------------------------------------------------
# W5: RANGE frame — trailing 30-day revenue per customer
# ---------------------------------------------------------------------------


@register(
    "window_range_trailing_revenue",
    doc="RANGE BETWEEN frame keyed on event-time seconds: per customer, "
    "each order's trailing-30-day revenue (value-based frame, not "
    "row-based).",
    tags=("window", "rangeframe", "ext"),
    oracle="""
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
         RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 2) AS trailing_30d
FROM orders
ORDER BY o_custkey, o_orderkey
""",
)
def window_range_trailing_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-2_592_000, 0)
    )
    return (
        orders.withColumn("trailing_30d", F.round(F.sum("o_totalprice").over(w), 2))
        .select("o_custkey", "o_orderkey", "trailing_30d")
        .orderBy("o_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# A6: min_by / max_by argmin-argmax aggregates
# ---------------------------------------------------------------------------


@register(
    "agg_minby_maxby",
    doc="argmin/argmax aggregates (min_by/max_by ≡ arg_min/arg_max): per "
    "nation, the cheapest and priciest customer by account balance — "
    "one aggregate pass, no self-join.",
    tags=("agg", "argmax", "ext"),
    oracle="""
-- tie-break must mirror the Spark side's struct(acctbal, custkey)
-- ordering EXACTLY: with replicated fixtures (sf1) many customers share
-- an acctbal, and arg_min/arg_max pick an arbitrary tied key.  DuckDB's
-- arg_min can't take a struct ordering value, so (acctbal, custkey) is
-- packed into one BIGINT: exact cents (+offset to stay positive) in the
-- high digits, custkey in the low 10.
WITH c AS (
  SELECT n_name, c_custkey, c_acctbal,
         (CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) + 1000000)
           * 10000000000 + c_custkey AS packed
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)
SELECT n_name,
       min(packed) % 10000000000 AS poorest_cust,
       max(packed) % 10000000000 AS richest_cust,
       round(min(c_acctbal), 2) AS min_bal,
       round(max(c_acctbal), 2) AS max_bal
FROM c GROUP BY n_name ORDER BY n_name
""",
)
def agg_minby_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    # deterministic on acctbal ties: pick by (acctbal, custkey) pairs
    return (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.min_by("c_custkey", F.struct(F.col("c_acctbal"), F.col("c_custkey"))).alias(
                "poorest_cust"
            ),
            F.max_by("c_custkey", F.struct(F.col("c_acctbal"), F.col("c_custkey"))).alias(
                "richest_cust"
            ),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# P8: higher-order array functions over embeddings
# ---------------------------------------------------------------------------


@register(
    "array_hof_embedding_stats",
    doc="Higher-order array functions (transform/filter/aggregate/exists) "
    "over the embedding column: element stats without exploding — the "
    "array stays packed in Tungsten format.",
    tags=("array", "hof", "ext"),
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive,
       round(CAST(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)), (a, b) -> a + b) AS DOUBLE), 5) AS sum_all,
       round(CAST(list_reduce(list_transform(embedding, x -> CAST(abs(x) AS DOUBLE)), (a, b) -> a + b) AS DOUBLE), 5) AS l1_norm,
       (len(list_filter(embedding, x -> abs(x) > 0.25)) > 0) AS has_large_component
FROM embeddings ORDER BY vec_id
""",
)
def array_hof_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    dbl = lambda x: x.cast("double")
    return emb.select(
        "vec_id",
        F.size(e).alias("dim"),
        F.size(F.filter(e, lambda x: x > 0)).cast("int").alias("n_positive"),
        F.round(F.aggregate(e, F.lit(0.0), lambda a, x: a + dbl(x)), 5).alias("sum_all"),
        F.round(F.aggregate(e, F.lit(0.0), lambda a, x: a + F.abs(dbl(x))), 5).alias("l1_norm"),
        F.exists(e, lambda x: F.abs(x) > 0.25).alias("has_large_component"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# A6: ordered string aggregation
# ---------------------------------------------------------------------------


@register(
    "agg_string_concat_ordered",
    doc="Ordered string aggregation (string_agg / sort_array+concat_ws): "
    "per region, the alphabetized nation list — deterministic ordering "
    "makes listagg engine-portable.",
    tags=("agg", "stringagg", "ext"),
    oracle="""
SELECT r_name AS region,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       count(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY region
""",
)
def agg_string_concat_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
        .orderBy("region")
    )


# ---------------------------------------------------------------------------
# A6: unpivot / melt — wide measures to long
# ---------------------------------------------------------------------------


@register(
    "unpivot_lineitem_measures",
    doc="UNPIVOT/melt: lineitem's four numeric measures to long form "
    "(measure, value) and aggregated per measure — the wide→long "
    "reshape for metric pipelines.",
    tags=("reshape", "ext"),
    oracle="""
WITH long_form AS (
  SELECT l_orderkey, measure, value
  FROM lineitem
  UNPIVOT (value FOR measure IN (l_quantity, l_extendedprice, l_discount, l_tax))
)
SELECT measure, count(*) AS n, round(sum(value), 2) AS total,
       round(min(value), 2) AS min_v, round(max(value), 2) AS max_v
FROM long_form GROUP BY measure ORDER BY measure
""",
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    long_form = li.unpivot(
        ids=["l_orderkey"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )
    return (
        long_form.groupBy("measure")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
            F.round(F.min("value"), 2).alias("min_v"),
            F.round(F.max("value"), 2).alias("max_v"),
        )
        .orderBy("measure")
    )


# ---------------------------------------------------------------------------
# W5: distribution windows — ntile / percent_rank / cume_dist
# ---------------------------------------------------------------------------


@register(
    "window_ntile_percentrank",
    doc="Distribution windows (W5): quartile bucket (ntile), percent_rank "
    "and cume_dist of customers by account balance within market segment. "
    "Total order (acctbal DESC, custkey) makes every rank engine-portable; "
    "the rank ratios are exact rationals so 6dp rounding is ulp-safe.",
    tags=("window", "distribution", "ext"),
    oracle="""
SELECT c_custkey, c_mktsegment AS segment,
       CAST(ntile(4) OVER w AS INT)            AS quartile,
       round(percent_rank() OVER w, 6)         AS pct_rank,
       round(cume_dist() OVER w, 6)            AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
ORDER BY c_custkey
""",
)
def window_ntile_percentrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# J5: FULL OUTER join — nations present on either side
# ---------------------------------------------------------------------------


@register(
    "join_full_outer_nation_presence",
    doc="FULL OUTER join (J5 breadth): deeply-negative-balance customer "
    "counts vs supplier counts per nation — each side misses nations, so "
    "both null wings of the full join are exercised.  Both pre-aggregates "
    "shrink the sides to <= 25 rows before the join (aggregate-then-join, "
    "never join-then-aggregate at scale).",
    tags=("join", "fullouter", "ext"),
    oracle="""
WITH c AS (
  SELECT c_nationkey AS nk, count(*) AS n_poor_cust
  FROM customer WHERE c_acctbal < -900 GROUP BY 1
),
s AS (
  SELECT s_nationkey AS nk, count(*) AS n_poor_supp
  FROM supplier WHERE s_acctbal < -900 GROUP BY 1
)
SELECT coalesce(c.nk, s.nk) AS nationkey,
       coalesce(n_poor_cust, 0) AS n_poor_cust,
       coalesce(n_poor_supp, 0) AS n_poor_supp
FROM c FULL OUTER JOIN s ON c.nk = s.nk
ORDER BY nationkey
""",
)
def join_full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < -900)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_poor_cust"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < -900)
        .groupBy(F.col("s_nationkey").alias("nk_s"))
        .agg(F.count(F.lit(1)).alias("n_poor_supp"))
    )
    return (
        cust.join(supp, F.col("nk") == F.col("nk_s"), "full_outer")
        .select(
            F.coalesce("nk", "nk_s").alias("nationkey"),
            F.coalesce("n_poor_cust", F.lit(0)).alias("n_poor_cust"),
            F.coalesce("n_poor_supp", F.lit(0)).alias("n_poor_supp"),
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# P8 / text: explode (lateral unnest) — top document tokens
# ---------------------------------------------------------------------------


@register(
    "explode_doc_tokens_top",
    doc="Lateral explode (generator breadth): documents -> whitespace "
    "tokens via explode(split(...)), global top-30 tokens.  The explode "
    "runs inside the scan stage (no pre-shuffle); only the tiny token "
    "aggregate shuffles.  Oracle: DuckDB lateral unnest of the same split.",
    tags=("explode", "text", "ext"),
    oracle="""
SELECT token, count(*) AS n
FROM (
  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
  FROM documents
)
WHERE token <> ''
GROUP BY token
ORDER BY n DESC, token
LIMIT 30
""",
)
def explode_doc_tokens_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# A6: the relational pivot operator (dynamic-column form of the
# conditional aggregation in agg_conditional_pivot_status)
# ---------------------------------------------------------------------------


@register(
    "pivot_priority_by_status",
    doc="The DataFrame pivot operator: order counts per priority pivoted "
    "on status with pinned pivot values (['F','O','P'] — explicit values "
    "skip Catalyst's extra distinct-scan job).  Empty cells stay NULL, "
    "matching SQL sum-of-empty-set.",
    tags=("agg", "pivot", "ext"),
    oracle="""
SELECT o_orderpriority AS priority,
       round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS "F",
       round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS "O",
       round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS "P"
FROM orders
GROUP BY o_orderpriority
ORDER BY priority
""",
)
def pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# P8: datetime function breadth
# ---------------------------------------------------------------------------


@register(
    "scalar_datetime_breadth",
    doc="Datetime breadth (P8): date_trunc, day-of-week, last_day, "
    "add_months, datediff — engine-portable spellings pinned where the "
    "engines' conventions differ (DuckDB dayofweek is 0-based Sunday, "
    "Spark is 1-based).",
    tags=("scalar", "datetime", "ext"),
    oracle="""
SELECT o_orderkey,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)          AS month_start,
       CAST(dayofweek(o_orderdate) + 1 AS INT)                      AS dow,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR)         AS month_end,
       CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS plus3m,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT) AS days_to_y2k,
       CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR)              AS ym
FROM orders
ORDER BY o_orderkey
""",
)
def scalar_datetime_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.date_trunc("month", d).alias("month_start"),
        F.dayofweek(d).cast("int").alias("dow"),
        F.last_day(d.cast("date")).cast("string").alias("month_end"),
        F.add_months(d.cast("date"), 3).cast("string").alias("plus3m"),
        F.datediff(F.lit("2000-01-01").cast("date"), d.cast("date")).cast("int").alias(
            "days_to_y2k"
        ),
        F.date_format(d, "yyyy-MM").alias("ym"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# J2: literal-map config lookup (the broadcast-map join idiom)
# ---------------------------------------------------------------------------


@register(
    "map_lookup_priority_rank",
    doc="Literal create_map lookup (J2 — the reference's "
    "tables_without_primary_key config dict, cdc.py:114-115): priority "
    "string -> numeric rank resolved via element_at on a map literal; no "
    "join, no shuffle beyond the final aggregate.",
    tags=("map", "scalar", "ref:J2"),
    oracle="""
SELECT CASE o_orderpriority
         WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2 WHEN '3-MEDIUM' THEN 3
         WHEN '4-NOT SPECIFIED' THEN 4 WHEN '5-LOW' THEN 5 ELSE -1
       END AS prio_rank,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY 1
ORDER BY prio_rank
""",
)
def map_lookup_priority_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    rank_map = F.create_map(
        F.lit("1-URGENT"), F.lit(1),
        F.lit("2-HIGH"), F.lit(2),
        F.lit("3-MEDIUM"), F.lit(3),
        F.lit("4-NOT SPECIFIED"), F.lit(4),
        F.lit("5-LOW"), F.lit(5),
    )
    return (
        orders.select(
            F.coalesce(F.element_at(rank_map, F.col("o_orderpriority")), F.lit(-1)).alias(
                "prio_rank"
            ),
            "o_totalprice",
        )
        .groupBy("prio_rank")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("prio_rank")
    )


# ---------------------------------------------------------------------------
# J5/A6: aggregate-in-subquery join — TPC-H Q17 shape
# ---------------------------------------------------------------------------


@register(
    "subquery_small_quantity_revenue",
    doc="TPC-H Q17 shape: revenue from lineitems whose quantity is below "
    "20% of the average quantity for their part — the correlated "
    "aggregate decorrelates into one per-part window pass over a single "
    "shuffle instead of a per-row re-scan of lineitem.",
    tags=("subquery", "agg", "ext"),
    oracle="""
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM (
  SELECT l_extendedprice, l_quantity,
         avg(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
  FROM lineitem
)
WHERE l_quantity < 0.2 * avg_qty
""",
)
def subquery_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    return (
        li.withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# A6: bivariate statistics — correlation / covariance aggregates
# ---------------------------------------------------------------------------


@register(
    "agg_corr_covar_qty_price",
    doc="Bivariate statistical aggregates: Pearson correlation and sample "
    "covariance of quantity vs extended price per return flag — "
    "single-pass mergeable moments (scales like any hash aggregate).",
    tags=("agg", "stats", "ext"),
    oracle="""
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6)       AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def agg_corr_covar_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# J5 breadth: cross join — exhaustive dimension grid with zero-filled cells
# ---------------------------------------------------------------------------


@register(
    "cross_join_status_grid",
    doc="Cross join (dimension grid): region x distinct order status, "
    "left-joined against actual per-cell counts so empty cells surface "
    "as zeros.  Safe at scale because both grid sides are tiny "
    "aggregates (the fact table is reduced before the cross join, "
    "never fed into it).",
    tags=("join", "cross", "ext"),
    oracle="""
WITH statuses AS (SELECT DISTINCT o_orderstatus AS status FROM orders),
counts AS (
  SELECT r_name AS region, o_orderstatus AS status, count(*) AS n
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  GROUP BY 1, 2
)
SELECT r.r_name AS region, s.status AS status, coalesce(c.n, 0) AS n_orders
FROM region r CROSS JOIN statuses s
LEFT JOIN counts c ON c.region = r.r_name AND c.status = s.status
ORDER BY region, s.status
""",
)
def cross_join_status_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    statuses = orders.select(F.col("o_orderstatus").alias("status")).distinct()
    counts = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("cr"), F.col("o_orderstatus").alias("cs"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    grid = region.select(F.col("r_name").alias("region")).crossJoin(statuses)
    return (
        grid.join(
            counts,
            (F.col("region") == F.col("cr")) & (F.col("status") == F.col("cs")),
            "left",
        )
        .select("region", "status", F.coalesce("n", F.lit(0)).alias("n_orders"))
        .orderBy("region", "status")
    )


# ---------------------------------------------------------------------------
# P8: error-safe arithmetic / casts (ANSI try_ functions)
# ---------------------------------------------------------------------------


@register(
    "scalar_try_arithmetic",
    doc="Error-safe scalar surface: try_divide yields NULL on zero "
    "divisors and try_cast yields NULL on malformed input instead of "
    "failing the job — the behavior a 100 TB pipeline needs when one "
    "bad row must not kill a 10-hour run.  Oracle spells the same "
    "semantics with NULLIF and TRY_CAST.",
    tags=("scalar", "nulls", "ansi", "ext"),
    oracle="""
SELECT o_orderkey,
       round(o_totalprice / NULLIF(CAST(o_orderkey % 3 AS BIGINT), 0), 4) AS price_per_mod3,
       TRY_CAST(o_orderpriority AS BIGINT)        AS prio_as_int,
       TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio_digit
FROM orders
ORDER BY o_orderkey
""",
)
def scalar_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.round(
            F.try_divide(F.col("o_totalprice"), (F.col("o_orderkey") % 3).cast("bigint")), 4
        ).alias("price_per_mod3"),
        F.col("o_orderpriority").try_cast("bigint").alias("prio_as_int"),
        F.substring("o_orderpriority", 1, 1).try_cast("bigint").alias("prio_digit"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# J5: correlated EXISTS — TPC-H Q4 shape (orders with a late-shipped line)
# ---------------------------------------------------------------------------


@register(
    "join_exists_late_orders",
    doc="TPC-H Q4 shape: count orders per priority having EXISTS a lineitem "
    "shipped >90 days after the order date.  The correlated EXISTS "
    "decorrelates to a left-semi join (equi key + range post-filter) — "
    "one shuffle on orderkey, then a tiny hash aggregate; no row "
    "explosion because semi joins emit each order at most once.",
    tags=("join", "semi", "subquery", "ext"),
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def join_exists_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# J5 + A6: two-level aggregate — TPC-H Q13 shape (customer order distribution)
# ---------------------------------------------------------------------------


@register(
    "join_left_count_distribution",
    doc="TPC-H Q13 shape: LEFT JOIN with a compound ON clause (join-side "
    "predicate, NOT a where-filter — customers with zero qualifying "
    "orders must survive), per-customer order counts, then the "
    "distribution of those counts.  Two cascaded hash aggregates; the "
    "second input is already tiny (one row per customer).",
    tags=("join", "agg", "ext"),
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def join_left_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# A6 + subquery: global-share HAVING — TPC-H Q11 shape
# ---------------------------------------------------------------------------


@register(
    "agg_share_threshold_nations",
    doc="TPC-H Q11 shape: per-nation supplier balance kept only where it "
    "exceeds 4% of the global balance.  The scalar subquery becomes a "
    "1-row aggregate cross-joined (broadcast) against the grouped "
    "result — the fact table is scanned twice but never shuffled twice "
    "at full width, and the threshold compare happens after both "
    "aggregations have reduced the data to ~nation rows.",
    tags=("agg", "subquery", "ext"),
    oracle="""
SELECT n_name, round(sum(s_acctbal), 2) AS nation_balance
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
HAVING sum(s_acctbal) > (SELECT sum(s_acctbal) * CAST(0.04 AS DOUBLE) FROM supplier)
ORDER BY nation_balance DESC, n_name
""",
)
def agg_share_threshold_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    per_nation = (
        sup.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum("s_acctbal").alias("raw_balance"))
    )
    threshold = sup.agg((F.sum("s_acctbal") * F.lit(0.04)).alias("thresh"))
    return (
        per_nation.crossJoin(F.broadcast(threshold))
        .filter(F.col("raw_balance") > F.col("thresh"))
        .select("n_name", F.round("raw_balance", 2).alias("nation_balance"))
        .orderBy(F.desc("nation_balance"), "n_name")
    )


# ---------------------------------------------------------------------------
# A6 + J5: conditional-sum ratio — TPC-H Q14 shape (promo revenue share)
# ---------------------------------------------------------------------------


@register(
    "agg_promo_revenue_ratio",
    doc="TPC-H Q14 shape: percentage of revenue from PROMO parts in one "
    "month — a conditional sum over a fact ⋈ dim join reduced to a "
    "single row.  part is broadcast (it stays small relative to "
    "lineitem at every scale factor); the CASE lives inside the "
    "aggregate so one pass computes both numerator and denominator.",
    tags=("agg", "join", "ext"),
    oracle="""
SELECT round(
         CAST(100.0 AS DOUBLE) * sum(CASE WHEN p_type = 'PROMO'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
         / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
""",
)
def agg_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


# ---------------------------------------------------------------------------
# Subquery + anti join: TPC-H Q22 shape (rich customers with no orders)
# ---------------------------------------------------------------------------


@register(
    "subquery_rich_idle_customers",
    doc="TPC-H Q22 shape: customers whose balance beats the positive-balance "
    "average (uncorrelated scalar subquery → broadcast 1-row join) and "
    "who have no urgent orders (NOT EXISTS → left-anti join on custkey "
    "against the filtered order stream — every fixture customer has "
    "*some* order, so the predicate keeps the result non-trivial), "
    "bucketed by a derived segment.  The anti join shuffles only keys; "
    "the scalar threshold never shuffles anything.",
    tags=("subquery", "anti", "agg", "ext"),
    oracle="""
SELECT CAST(c_custkey % 7 AS BIGINT) AS seg,
       count(*)                      AS numcust,
       round(sum(c_acctbal), 2)      AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(avg(c_acctbal) AS DOUBLE) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY 1
ORDER BY 1
""",
)
def subquery_rich_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("avg_bal"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy((F.col("c_custkey") % 7).cast("bigint").alias("seg"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# W5: gap-based sessionization — lag + cumulative-sum session assignment
# ---------------------------------------------------------------------------


@register(
    "sessionize_events_gap",
    doc="Gap-based sessionization (batch): a new session starts when a "
    "user's inter-event gap exceeds 30 minutes — lag() flags the break, "
    "a running sum turns flags into session ordinals, then one "
    "aggregate per (user, session).  Everything runs inside a single "
    "partitioning by user_id (two window functions + groupBy share the "
    "shuffle under AQE), so the cost at 100 TB is one shuffle of "
    "(user_id, ts, event_id).  Second-granularity math is integral on "
    "both engines (DuckDB boundary-count == Spark unix_timestamp "
    "truncation), so the hash compare is exact.",
    tags=("window", "session", "ext"),
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev_ts IS NULL
                   OR date_diff('second', prev_ts, ts) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM ordered
), sessions AS (
  SELECT user_id, ts, event_id,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT user_id, session_no,
       count(*) AS n_events,
       date_diff('second', min(ts), max(ts)) AS duration_s
FROM sessions
GROUP BY user_id, session_no
ORDER BY user_id, session_no
""",
)
def sessionize_events_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp("ts")
    prev_epoch = F.lag(epoch).over(w)
    flagged = events.withColumn(
        "is_new",
        F.when(prev_epoch.isNull() | ((epoch - prev_epoch) > 1800), 1).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_no",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        sessions.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(F.unix_timestamp("ts")) - F.min(F.unix_timestamp("ts"))).alias("duration_s"),
        )
        .orderBy("user_id", "session_no")
    )


# ---------------------------------------------------------------------------
# A6 breadth: bitwise / boolean / conditional-count aggregates
# ---------------------------------------------------------------------------


@register(
    "agg_bitbool_countif",
    doc="Bitwise (bit_and/or/xor), boolean (bool_and/or) and conditional "
    "(count_if) aggregates per order status — all mergeable single-pass "
    "hash aggregates (partial+final), integral results so the "
    "cross-engine compare is exact.",
    tags=("agg", "bitwise", "ext"),
    oracle="""
SELECT o_orderstatus,
       bit_and(o_orderkey)                 AS key_bit_and,
       bit_or(o_orderkey)                  AS key_bit_or,
       bit_xor(o_orderkey)                 AS key_bit_xor,
       bool_and(o_totalprice > 1000.0)     AS all_over_1k,
       bool_or(o_totalprice > 400000.0)    AS any_over_400k,
       count_if(o_orderpriority = '1-URGENT') AS n_urgent
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def agg_bitbool_countif(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.bit_and("o_orderkey").alias("key_bit_and"),
            F.bit_or("o_orderkey").alias("key_bit_or"),
            F.bit_xor("o_orderkey").alias("key_bit_xor"),
            F.bool_and(F.col("o_totalprice") > 1000.0).alias("all_over_1k"),
            F.bool_or(F.col("o_totalprice") > 400000.0).alias("any_over_400k"),
            F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# W5 breadth: first_value / last_value / nth_value over full frames
# ---------------------------------------------------------------------------


@register(
    "window_first_last_nth",
    doc="Value-navigation window functions with an explicit full frame "
    "(ROWS UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING): each customer's "
    "first, latest and second order keys by (orderdate, orderkey) — "
    "total ordering via the key tiebreak keeps both engines identical.",
    tags=("window", "ext"),
    oracle="""
WITH w AS (
  SELECT o_custkey, o_orderkey,
         first_value(o_orderkey) OVER win AS first_key,
         last_value(o_orderkey)  OVER win AS last_key,
         nth_value(o_orderkey, 2) OVER win AS second_key
  FROM orders
  WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT o_custkey, min(first_key) AS first_key, min(last_key) AS last_key,
       min(second_key) AS second_key, count(*) AS n_orders
FROM w GROUP BY o_custkey ORDER BY o_custkey
""",
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    win = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        orders.select(
            "o_custkey",
            F.first("o_orderkey").over(win).alias("first_key"),
            F.last("o_orderkey").over(win).alias("last_key"),
            F.nth_value("o_orderkey", 2).over(win).alias("second_key"),
        )
        .groupBy("o_custkey")
        .agg(
            F.min("first_key").alias("first_key"),
            F.min("last_key").alias("last_key"),
            F.min("second_key").alias("second_key"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# J6 breadth: temporal self-join — order pairs within 30 days per customer
# ---------------------------------------------------------------------------


@register(
    "join_self_pairs_within_30d",
    doc="Temporal self-join: pairs of orders by the same customer placed "
    "within 30 days (a < b on orderkey kills mirror/self pairs).  The "
    "equi key (custkey) carries the join; the date band is a post-scan "
    "filter — per-customer order counts are small, so the pair "
    "expansion stays bounded and the shuffle is one hash exchange per "
    "side.",
    tags=("join", "self", "interval", "ext"),
    oracle="""
SELECT a.o_custkey AS custkey, count(*) AS n_pairs,
       min(b.o_orderkey) AS min_second_key
FROM orders a JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND a.o_orderkey < b.o_orderkey
 AND b.o_orderdate >= a.o_orderdate
 AND b.o_orderdate <= a.o_orderdate + INTERVAL 30 DAY
GROUP BY 1
ORDER BY 1
""",
)
def join_self_pairs_within_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    a = orders.alias("a")
    b = orders.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (F.col("b.o_orderdate") >= F.col("a.o_orderdate"))
            & (F.col("b.o_orderdate") <= F.col("a.o_orderdate") + F.expr("INTERVAL 30 DAY")),
        )
        .groupBy(F.col("a.o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min(F.col("b.o_orderkey")).alias("min_second_key"),
        )
        .orderBy("custkey")
    )


# ---------------------------------------------------------------------------
# Scale strategy as a checked query: salted join == plain join
# ---------------------------------------------------------------------------


@register(
    "join_salted_skew",
    doc="Skew-salted equi-join (operators/scale.py::salted_join): the hot "
    "side's key is split across 8 deterministic salts and the dim side "
    "replicated 8x, restoring parallelism when one key dominates a "
    "partition.  The oracle is the PLAIN join aggregate — proving the "
    "salting transform is result-invariant, not just plausible.",
    tags=("join", "skew", "scale", "ext"),
    oracle="""
SELECT o_orderpriority, count(*) AS n_lines,
       round(sum(l_extendedprice), 2) AS total_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scale import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority"
    )
    return (
        salted_join(li, orders, "k", n_salts=8)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# A6: histogram via width_bucket — fixed-bin distribution profile
# ---------------------------------------------------------------------------


@register(
    "agg_price_histogram",
    doc="Order-value histogram: width_bucket(o_totalprice, 0, 500000, 20) "
    "then count + revenue per bin.  Bucket assignment is pure double "
    "arithmetic (identical IEEE on both engines); the bin aggregate is "
    "a 21-group hash agg — the cheapest possible distribution profile "
    "at any scale (map-side combine collapses everything).",
    tags=("agg", "scalar", "ext"),
    oracle="""
-- DuckDB 1.0 has no width_bucket; with min=0 and an exactly-representable
-- bin width (500000/20 = 25000), floor(x/25000)+1 is bit-identical
SELECT CAST(floor(o_totalprice / 25000.0) + 1 AS INT) AS bin,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY 1
ORDER BY 1
""",
)
def agg_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn(
            "bin",
            F.expr("width_bucket(o_totalprice, 0.0D, 500000.0D, 20)").cast("int"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# J5/W5: calendar gap-fill — dense daily series with zero-filled holes
# ---------------------------------------------------------------------------


@register(
    "gapfill_daily_orders",
    doc="Zero-filled daily order counts for one month x every priority: "
    "the dense calendar comes from explode(sequence(date, date)) cross-"
    "joined with the tiny priority dim, then a LEFT join against the "
    "real daily aggregate with coalesce(0).  The calendar side is a "
    "few hundred rows — it broadcasts; the fact side aggregates BEFORE "
    "the join so the outer join touches day-level rows, never raw "
    "orders.  The standard time-series densification pattern.",
    tags=("join", "timeseries", "ext"),
    oracle="""
WITH days AS (
  SELECT CAST(unnest(generate_series(DATE '1997-01-01', DATE '1997-01-31',
                                     INTERVAL 1 DAY)) AS DATE) AS day
), prios AS (
  SELECT DISTINCT o_orderpriority FROM orders
), daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, o_orderpriority,
         count(*) AS n, round(sum(o_totalprice), 2) AS revenue
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-02-01 00:00:00'
  GROUP BY 1, 2
)
SELECT d.day, p.o_orderpriority,
       coalesce(daily.n, 0) AS n_orders,
       coalesce(daily.revenue, 0.0) AS revenue
FROM days d
CROSS JOIN prios p
LEFT JOIN daily ON daily.day = d.day AND daily.o_orderpriority = p.o_orderpriority
ORDER BY d.day, p.o_orderpriority
""",
)
def gapfill_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1997-01-01").cast("date"),
                F.lit("1997-01-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    prios = orders.select("o_orderpriority").distinct()
    daily = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-02-01 00:00:00").cast("timestamp"))
        )
        .groupBy(
            F.to_date("o_orderdate").alias("d_day"),
            F.col("o_orderpriority").alias("d_prio"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("d_revenue"),
        )
    )
    return (
        days.crossJoin(prios)
        .join(
            daily,
            (F.col("day") == F.col("d_day"))
            & (F.col("o_orderpriority") == F.col("d_prio")),
            "left",
        )
        .select(
            "day",
            "o_orderpriority",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("d_revenue"), F.lit(0.0)).alias("revenue"),
        )
        .orderBy("day", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# A6: median / exact midpoint aggregates per group
# ---------------------------------------------------------------------------


@register(
    "agg_median_quantity",
    doc="Exact median quantity per (returnflag, linestatus): quantities "
    "are integral doubles, so the even-count midpoint average is exact "
    "(x.0 or x.5) on both engines — no interpolation drift.  Exact "
    "medians need a full sort within each group at scale; the grouped "
    "form keeps each sort partition-local after one shuffle.",
    tags=("agg", "stats", "ext"),
    oracle="""
SELECT l_returnflag, l_linestatus,
       median(l_quantity) AS med_qty,
       count(*) AS n
FROM lineitem
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def agg_median_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.median("l_quantity").alias("med_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Scale/layout: z-order (Morton) clustering key — multi-dimensional layout
# ---------------------------------------------------------------------------


def _morton_oracle() -> str:
    # NB: DuckDB gives |, &, <<, >> EQUAL precedence (left-assoc, the
    # Postgres rule), so every shifted term needs its own parentheses —
    # `a << 0 | b << 2` would parse as `((a << 0) | b) << 2`.
    spread_x = " | ".join(
        f"((((user_id & 65535) >> {i}) & 1) << {2 * i})" for i in range(16)
    )
    spread_y = " | ".join(
        f"(((((date_diff('second', TIMESTAMP '1970-01-01', ts) // 60) & 65535)"
        f" >> {i}) & 1) << {2 * i + 1})"
        for i in range(16)
    )
    return f"""
WITH z AS (
  SELECT ({spread_x}) | ({spread_y}) AS zval
  FROM events
)
SELECT CAST(zval >> 26 AS INT) AS zbucket,
       count(*) AS n,
       min(zval) AS zmin,
       max(zval) AS zmax
FROM z
GROUP BY 1
ORDER BY 1
"""


@register(
    "layout_zorder_events",
    doc="Z-order clustering key: interleave the low 16 bits of user_id "
    "with the event's epoch-minute into a 32-bit Morton code, then "
    "profile the curve by its top-6-bit bucket.  Writing a 100 TB "
    "events table sorted by zval (repartitionByRange(zval) + "
    "sortWithinPartitions) gives file-level min/max pruning on BOTH "
    "user and time predicates at once — the standard multi-dimensional "
    "layout trick Spark lacks as a built-in.  Bit arithmetic is exact "
    "and identical on both engines (epoch seconds via the portable "
    "truncated-second equivalence).",
    tags=("scale", "layout", "ext"),
    oracle=_morton_oracle(),
)
def layout_zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    x = F.col("user_id").bitwiseAND(F.lit(65535))
    y = (F.unix_timestamp("ts") / F.lit(60)).cast("bigint").bitwiseAND(F.lit(65535))
    zval = reduce(
        lambda a, b: a.bitwiseOR(b),
        [F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i) for i in range(16)]
        + [
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            for i in range(16)
        ],
    )
    return (
        ev.withColumn("zval", zval)
        .groupBy(F.shiftright(F.col("zval"), 26).cast("int").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("zval").alias("zmin"),
            F.max("zval").alias("zmax"),
        )
        .orderBy("zbucket")
    )


# ---------------------------------------------------------------------------
# Scale: salted two-phase aggregation — hot-key mitigation for group-by
# ---------------------------------------------------------------------------


@register(
    "agg_salted_skew_counts",
    doc="Two-phase salted aggregation: when one grouping key dominates "
    "(a hot event_type), pre-aggregating by (key, salt) spreads the "
    "hot key over 16 reducers before the tiny (key) final combine — "
    "the aggregation twin of join_salted_skew.  The salt is a "
    "deterministic hash of the row id, so the plan (and the oracle, "
    "which aggregates unsalted) is reproducible.  Counts and integral "
    "value sums are exact, so salting cannot change the result.",
    tags=("agg", "scale", "skew", "ext"),
    oracle="""
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1
ORDER BY 1
""",
)
def agg_salted_skew_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    salted = ev.withColumn("salt", F.pmod(F.hash("event_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.collect_set("user_id").alias("pu"),
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n_events"),
            F.size(F.array_distinct(F.flatten(F.collect_list("pu")))).cast("bigint").alias(
                "n_users"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# A7: approximate percentile sketch (rows-only check; tolerance in tests)
# ---------------------------------------------------------------------------


@register(
    "agg_approx_percentile_price",
    doc="Approximate percentile sketch: approx_percentile(o_totalprice) "
    "at p50/p90/p99 with accuracy 10000 — the mergeable KLL-style "
    "sketch Spark ships for 100 TB quantile estimation (exact "
    "percentiles need a full sort; the sketch is one pass, fixed "
    "memory, partial-mergeable).  No DuckDB oracle: the sketch is "
    "engine-specific, so the driver records a rows-only check and "
    "tests/test_sketch_accuracy.py bounds the error against the exact "
    "quantile instead.",
    tags=("agg", "sketch", "ext"),
    oracle=None,
)
def agg_approx_percentile_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], 10000).alias("pcts"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        F.round(F.element_at("pcts", 1), 2).alias("p50"),
        F.round(F.element_at("pcts", 2), 2).alias("p90"),
        F.round(F.element_at("pcts", 3), 2).alias("p99"),
        "n",
    )


# ---------------------------------------------------------------------------
# Product analytics: ordered funnel (view -> click -> purchase)
# ---------------------------------------------------------------------------


@register(
    "funnel_view_click_purchase",
    doc="Ordered three-stage funnel: per user, the first view, the first "
    "click strictly after that view, and the first purchase strictly "
    "after that click; users counted by the deepest stage reached.  "
    "The correlated 'first X after Y' chain decorrelates into three "
    "conditional aggregates joined back on user_id — all four hang on "
    "the same hash(user_id) clustering, so at scale this is ONE "
    "logical shuffle of the events table reused three times, never a "
    "per-user subquery.  Timestamp comparisons are µs-integer on both "
    "engines.",
    tags=("agg", "join", "funnel", "ext"),
    oracle="""
WITH u1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
), u2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN u1 ON u1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > u1.t1 GROUP BY 1
), u3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN u2 ON u2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > u2.t2 GROUP BY 1
), universe AS (
  SELECT DISTINCT user_id FROM events
)
SELECT CASE WHEN u3.user_id IS NOT NULL THEN 3
            WHEN u2.user_id IS NOT NULL THEN 2
            WHEN u1.user_id IS NOT NULL THEN 1
            ELSE 0 END AS stage,
       count(*) AS n_users
FROM universe u
LEFT JOIN u1 ON u1.user_id = u.user_id
LEFT JOIN u2 ON u2.user_id = u.user_id
LEFT JOIN u3 ON u3.user_id = u.user_id
GROUP BY 1
ORDER BY 1
""",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    u1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    u2 = (
        ev.filter(F.col("event_type") == "click")
        .join(u1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    u3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(u2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    universe = ev.select("user_id").distinct()
    return (
        universe.join(u1.select("user_id", "t1"), "user_id", "left")
        .join(u2.select("user_id", "t2"), "user_id", "left")
        .join(u3.select("user_id", "t3"), "user_id", "left")
        .select(
            F.when(F.col("t3").isNotNull(), 3)
            .when(F.col("t2").isNotNull(), 2)
            .when(F.col("t1").isNotNull(), 1)
            .otherwise(0)
            .alias("stage")
        )
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("stage")
    )


# ---------------------------------------------------------------------------
# Product analytics: weekly cohort retention matrix
# ---------------------------------------------------------------------------


@register(
    "cohort_weekly_retention",
    doc="Weekly cohort retention: users grouped by the ISO week of their "
    "first event; for offsets 0-3, how many of each cohort were active "
    "again k weeks later.  Cohort assignment is one aggregate; the "
    "activity set is DISTINCT (user, week) — week offsets computed as "
    "integral day-diff div 7 (exact on both engines).  The retention "
    "join is (user) equi — it reuses the cohort aggregate's "
    "clustering, and the final matrix is tiny.",
    tags=("agg", "join", "cohort", "ext"),
    oracle="""
WITH firsts AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY 1
), activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS act_week
  FROM events
)
SELECT f.cohort_week,
       date_diff('day', f.cohort_week, a.act_week) // 7 AS week_offset,
       count(*) AS n_users
FROM firsts f
JOIN activity a ON a.user_id = f.user_id
WHERE date_diff('day', f.cohort_week, a.act_week) // 7 BETWEEN 0 AND 3
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("act_week")
    ).distinct()
    off = (F.datediff(F.col("act_week"), F.col("cohort_week")) / 7).cast("bigint")
    return (
        firsts.join(activity, "user_id")
        .withColumn("week_offset", off)
        .filter(F.col("week_offset").between(0, 3))
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# W5: LOCF forward fill (IGNORE NULLS window) — time-series gap repair
# ---------------------------------------------------------------------------


@register(
    "window_locf_forward_fill",
    doc="Last-observation-carried-forward: per user, events whose type is "
    "'view' carry no reading (NULL); fill each gap with the most recent "
    "non-null value in event order (IGNORE NULLS unbounded-preceding "
    "frame).  One shuffle on user_id; the fill itself is a single sorted "
    "pass per partition — no self-join, no collect.",
    tags=("window", "ignorenulls", "timeseries", "ext"),
    oracle="""
WITH base AS (
  SELECT user_id, event_id,
         CASE WHEN event_type = 'view' THEN NULL ELSE round(value, 2) END AS v
  FROM events
)
SELECT user_id, event_id, v AS raw_value,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
FROM base
ORDER BY user_id, event_id
""",
)
def window_locf_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "view", F.lit(None).cast("double")).otherwise(
        F.round("value", 2)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn("raw_value", v)
        .withColumn("filled_value", F.last("raw_value", ignorenulls=True).over(w))
        .select("user_id", "event_id", "raw_value", "filled_value")
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# W5: windowed share-of-total (percent-of-parent over an aggregate)
# ---------------------------------------------------------------------------


@register(
    "window_share_within_region",
    doc="Two-level ratio: each nation's revenue as a share of its region's "
    "total — a window SUM over the groupBy result, so the heavy fact "
    "shuffle happens once and the share is computed on the tiny "
    "aggregate.  DECIMAL sums keep both engines bit-identical before "
    "the final double division.",
    tags=("window", "share", "agg", "ext"),
    oracle="""
WITH nat AS (
  SELECT r_name, n_name,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
)
SELECT r_name, n_name,
       CAST(rev AS DOUBLE) AS nation_revenue,
       round(CAST(rev AS DOUBLE) /
             CAST(sum(rev) OVER (PARTITION BY r_name) AS DOUBLE), 4) AS region_share
FROM nat
ORDER BY r_name, n_name
""",
)
def window_share_within_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey", "n_name")
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    nat = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev"))
    )
    w = Window.partitionBy("r_name")
    return nat.select(
        "r_name",
        "n_name",
        F.col("rev").cast("double").alias("nation_revenue"),
        F.round(
            F.col("rev").cast("double") / F.sum("rev").over(w).cast("double"), 4
        ).alias("region_share"),
    ).orderBy("r_name", "n_name")


@register(
    "agg_grouping_sets_id",
    doc="A7 completion: explicit GROUPING SETS (region-level, "
    "status-level, grand total) with grouping_id() disambiguating the "
    "null-key rows — the piece of the rollup/cube family the other "
    "entries don't pin.  Spark plans one Expand + one hash aggregate "
    "(partial+final), so the cost is #sets × input in map-side rows, "
    "never extra shuffles.  Dims broadcast into the fact before the "
    "expand.",
    tags=("agg", "grouping", "ext"),
    oracle="""
SELECT r.r_name, o.o_orderstatus,
       CAST(GROUPING(r.r_name) AS INT) AS g_region,
       CAST(GROUPING(o.o_orderstatus) AS INT) AS g_status,
       count(*) AS n_orders,
       round(sum(o.o_totalprice), 2) AS total_price
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY GROUPING SETS ((r.r_name), (o.o_orderstatus), ())
ORDER BY g_region, g_status, r_name, o_orderstatus
""",
)
def agg_grouping_sets_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("orders", "customer", "nation", "region"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"gs_{t}")
    return spark.sql(
        """
        SELECT r.r_name, o.o_orderstatus,
               CAST(grouping(r.r_name) AS INT) AS g_region,
               CAST(grouping(o.o_orderstatus) AS INT) AS g_status,
               count(*) AS n_orders,
               round(sum(o.o_totalprice), 2) AS total_price
        FROM gs_orders o
        JOIN gs_customer c ON c.c_custkey = o.o_custkey
        JOIN gs_nation n ON n.n_nationkey = c.c_nationkey
        JOIN gs_region r ON r.r_regionkey = n.n_regionkey
        GROUP BY GROUPING SETS ((r.r_name), (o.o_orderstatus), ())
        ORDER BY g_region, g_status, r_name, o_orderstatus
        """
    )


@register(
    "cte_recursive_customer_tree",
    doc="Recursive CTE (WITH RECURSIVE, new SQL surface in Spark 4): the "
    "customer keyspace is read as an implicit decimal trie — parent(k) = "
    "k DIV 10 — and walked root-to-leaf, accumulating depth and the "
    "single-digit root ancestor.  Each recursion step is one equi-join of "
    "the (small, shrinking) frontier against the base relation, so the "
    "plan is a bounded loop of broadcast-able joins: at 100 TB the "
    "frontier of step d is ~10^d roots, always tiny relative to the "
    "scan, and the loop depth is log10(max key) ≈ 9-10, never data-"
    "dependent recursion-per-row.",
    tags=("cte", "recursive", "ext"),
    oracle="""
WITH RECURSIVE tree AS (
  SELECT c_custkey AS custkey, CAST(c_custkey AS BIGINT) AS root_key,
         1 AS depth, c_acctbal
  FROM customer WHERE c_custkey < 10
  UNION ALL
  SELECT c.c_custkey, t.root_key, t.depth + 1, c.c_acctbal
  FROM customer c JOIN tree t ON c.c_custkey // 10 = t.custkey
  WHERE c.c_custkey >= 10
)
SELECT depth,
       count(*) AS n_customers,
       count(DISTINCT root_key) AS n_roots,
       round(sum(c_acctbal), 2) AS total_bal
FROM tree GROUP BY depth ORDER BY depth
""",
)
def cte_recursive_customer_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("rcte_customer")
    return spark.sql(
        """
        WITH RECURSIVE tree AS (
          SELECT c_custkey AS custkey, CAST(c_custkey AS BIGINT) AS root_key,
                 1 AS depth, c_acctbal
          FROM rcte_customer WHERE c_custkey < 10
          UNION ALL
          SELECT c.c_custkey, t.root_key, t.depth + 1, c.c_acctbal
          FROM rcte_customer c JOIN tree t ON c.c_custkey DIV 10 = t.custkey
          WHERE c.c_custkey >= 10
        )
        SELECT depth,
               count(*) AS n_customers,
               count(DISTINCT root_key) AS n_roots,
               round(sum(c_acctbal), 2) AS total_bal
        FROM tree GROUP BY depth ORDER BY depth
        """
    )


@register(
    "agg_listagg_nations_per_region",
    doc="Ordered string aggregation (listagg WITHIN GROUP, Spark 4): "
    "nations and the distinct market segments concatenated per region in "
    "name order.  listagg is a real ordered aggregate in the plan "
    "(SortAggregate), not a collect_list + UDF.  The distinct segment "
    "set is reduced FIRST (pre-aggregate to ~5×5 rows) and only then "
    "string-aggregated — at 100 TB the fact-sized input never reaches "
    "the ordered aggregate, and the per-group payload stays dimension-"
    "bounded.  (Also sidesteps SPARK's RewriteDistinctAggregates "
    "ClassCastException on listagg(DISTINCT … ORDER BY …) in 4.1.)",
    tags=("agg", "listagg", "ext"),
    oracle="""
WITH cust AS (
  SELECT r.r_name, c.c_mktsegment
  FROM region r
  JOIN nation n ON n.n_regionkey = r.r_regionkey
  JOIN customer c ON c.c_nationkey = n.n_nationkey
), nations AS (
  SELECT r.r_name,
         string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
  FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name
), segs AS (
  SELECT r_name,
         string_agg(c_mktsegment, '|' ORDER BY c_mktsegment) AS segments
  FROM (SELECT DISTINCT r_name, c_mktsegment FROM cust)
  GROUP BY r_name
), counts AS (
  SELECT r_name, count(*) AS n_customers FROM cust GROUP BY r_name
)
SELECT n.r_name, n.nations, s.segments, c.n_customers
FROM nations n
JOIN segs s ON s.r_name = n.r_name
JOIN counts c ON c.r_name = n.r_name
ORDER BY n.r_name
""",
)
def agg_listagg_nations_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("region", "nation", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"la_{t}")
    return spark.sql(
        """
        WITH cust AS (
          SELECT r.r_name, c.c_mktsegment
          FROM la_region r
          JOIN la_nation n ON n.n_regionkey = r.r_regionkey
          JOIN la_customer c ON c.c_nationkey = n.n_nationkey
        ), nations AS (
          SELECT r.r_name,
                 listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name) AS nations
          FROM la_region r JOIN la_nation n ON n.n_regionkey = r.r_regionkey
          GROUP BY r.r_name
        ), segs AS (
          SELECT r_name,
                 listagg(c_mktsegment, '|')
                   WITHIN GROUP (ORDER BY c_mktsegment) AS segments
          FROM (SELECT DISTINCT r_name, c_mktsegment FROM cust)
          GROUP BY r_name
        ), counts AS (
          SELECT r_name, count(*) AS n_customers FROM cust GROUP BY r_name
        )
        SELECT n.r_name, n.nations, s.segments, c.n_customers
        FROM nations n
        JOIN segs s ON s.r_name = n.r_name
        JOIN counts c ON c.r_name = n.r_name
        ORDER BY n.r_name
        """
    )


@register(
    "scalar_variant_props",
    doc="Semi-structured VARIANT path (Spark 4): events.props parsed once "
    "with parse_json into a VARIANT column, fields extracted with "
    "variant_get — the open-schema analog of the reference's dict-typed "
    "rows (SURVEY.md §1.2, dump2csv.py:54-59 drift handling).  Unlike "
    "get_json_object (string re-parse per extraction), VARIANT parses "
    "once into a binary encoding and every path read is a cheap "
    "navigation, the right trade at 100 TB where props would be read by "
    "many downstream extractions.  Decile-bucketed aggregate keeps the "
    "output bounded.",
    tags=("variant", "json", "scalar", "ext"),
    oracle="""
SELECT CAST(props->>'$.k' AS INTEGER) // 10 AS k_decile,
       count(*) AS n_events,
       round(avg(value), 4) AS avg_value,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY k_decile
ORDER BY k_decile
""",
)
def scalar_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("v", F.parse_json("props"))
        .withColumn("k", F.variant_get("v", "$.k", "int"))
        .groupBy((F.col("k") - F.pmod("k", F.lit(10))).cast("int").alias("k_decile"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .withColumn("k_decile", (F.col("k_decile") / 10).cast("int"))
        .orderBy("k_decile")
    )


@register(
    "unpivot_status_metrics",
    doc="Wide-to-long reshape (df.unpivot / SQL-standard UNPIVOT): the "
    "per-status aggregate is computed once (one hash aggregate over "
    "orders) and the three metric columns are melted into (metric, "
    "value) rows.  Unpivot is an Expand node — #metrics × rows emitted "
    "map-side with no extra shuffle, the same physical shape GROUPING "
    "SETS uses, so the reshape itself is free at any scale.",
    tags=("unpivot", "reshape", "ext"),
    oracle="""
WITH wide AS (
  SELECT o_orderstatus,
         CAST(count(*) AS DOUBLE)        AS n_orders,
         round(sum(o_totalprice), 2)     AS total_price,
         round(avg(o_totalprice), 2)     AS avg_price
  FROM orders GROUP BY o_orderstatus
)
SELECT o_orderstatus, metric, value
FROM wide UNPIVOT (value FOR metric IN (n_orders, total_price, avg_price))
ORDER BY o_orderstatus, metric
""",
)
def unpivot_status_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
    )
    return wide.unpivot(
        ["o_orderstatus"],
        ["n_orders", "total_price", "avg_price"],
        "metric",
        "value",
    ).orderBy("o_orderstatus", "metric")


@register(
    "agg_hll_sketch_users",
    doc="Mergeable HLL sketches (Datasketches hll_sketch_agg / "
    "hll_union_agg, Spark 4): per-event-type user sketches built in one "
    "partial+final aggregate, then the bytes re-aggregated into a "
    "grand-total union row — the two-level pattern that lets 1000 "
    "executors each ship a ~KB sketch instead of re-shuffling raw user "
    "ids for a global distinct.  approx_count_distinct (HLL++) covers "
    "the one-shot case; Datasketches adds the REUSABLE sketch column: "
    "store per-partition/day sketches once, answer any rollup later by "
    "union — no second scan of the fact table.  Estimates, so rows-only "
    "for the driver; the error bound (< 3% at lgK=14) is pinned in "
    "tests/test_sketch_accuracy.py.",
    tags=("agg", "sketch", "hll", "ext"),
)
def agg_hll_sketch_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    per_type = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    typed = per_type.select(
        "event_type", F.hll_sketch_estimate("sk").alias("n_users_est")
    )
    overall = per_type.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate("sk").alias("n_users_est"),
    )
    return typed.unionByName(overall).orderBy("event_type")


@register(
    "agg_bitmap_distinct_users",
    doc="EXACT distributed distinct-count via bitmaps (Spark 4 bitmap_* "
    "family) — the deterministic sibling of agg_hll_sketch_users: "
    "user ids are bucketed (bitmap_bucket_number = id DIV 32768) and "
    "each bucket folds into a 4 KB bitmap with bitmap_construct_agg; "
    "per-group cardinality = Σ bitmap_count.  Two cheap aggregates "
    "replace a count(DISTINCT) whose dedup state would otherwise "
    "shuffle every raw id: with dense int keys the shuffled payload is "
    "#buckets × 4 KB per group, independent of row count — at 100 TB "
    "that's the difference between shuffling ids and shuffling KBs.  "
    "Exact, so fully oracle-checked.",
    tags=("agg", "bitmap", "distinct", "ext"),
    oracle="""
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def agg_bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    buckets = events.groupBy(
        "event_type", F.bitmap_bucket_number("user_id").alias("bucket")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm"))
    return (
        buckets.groupBy("event_type")
        .agg(F.sum(F.bitmap_count("bm")).alias("n_users"))
        .orderBy("event_type")
    )


@register(
    "vec_array_algebra",
    doc="JVM-side vector algebra via higher-order functions — the "
    "embedding column never crosses into Python: L2 norm with "
    "F.aggregate (sequential double fold, same order DuckDB's list_sum "
    "folds, so 4 dp round-trips exactly), positive-component count with "
    "F.filter, max component with array_max.  This is the codegen'd "
    "fast path the ANN operators build on; a Python UDF doing the same "
    "would pay an Arrow crossing per batch for arithmetic the JVM "
    "already vectorizes.",
    tags=("array", "hof", "similarity", "ext"),
    oracle="""
SELECT vec_id,
       len(embedding) AS n_dims,
       round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))), 4) AS l2_norm,
       len(list_filter(embedding, x -> x > 0)) AS n_positive,
       round(CAST(list_max(embedding) AS DOUBLE), 4) AS max_component
FROM embeddings
ORDER BY vec_id
""",
)
def vec_array_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    x = F.col("x")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.round(
            F.sqrt(
                F.aggregate(
                    "embedding",
                    F.lit(0.0),
                    lambda acc, v: acc + v.cast("double") * v.cast("double"),
                )
            ),
            4,
        ).alias("l2_norm"),
        F.size(F.filter("embedding", lambda v: v > 0)).alias("n_positive"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("max_component"),
    ).orderBy("vec_id")


@register(
    "layout_hive_partition_pruning",
    doc="Hive-style partitioned layout + partition pruning (the K1 "
    "date-partitioned sink read back as a query input): orders written "
    "partitionBy(order_month) — the Spark spelling of the reference's "
    "dump_dir/YYYYMMDD/ layout (dump2csv.py:62-103) — then a "
    "quarter-scoped aggregate reads it back.  The month predicate "
    "resolves at PLANNING time against directory names "
    "(PartitionFilters, pinned in tests/test_plan_quality.py): a 100 TB "
    "store scans only the 3 matching months' files, no footer even "
    "opened elsewhere — the coarse pruning layer z-ordering then "
    "refines within files.",
    tags=("layout", "partitioning", "sink", "ext"),
    oracle="""
SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
WHERE strftime(o_orderdate, '%Y-%m') BETWEEN '1995-01' AND '1995-03'
GROUP BY order_month
ORDER BY order_month
""",
)
def layout_hive_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    orders = load_table(spark, sf_dir, "orders")
    path = os.path.join(tempfile.gettempdir(), f"hivepart_{uuid.uuid4().hex[:8]}")
    (
        orders.withColumn(
            "order_month", F.date_format("o_orderdate", "yyyy-MM")
        )
        .write.partitionBy("order_month")
        .mode("overwrite")
        .parquet(path)
    )
    return (
        spark.read.parquet(path)
        .filter(F.col("order_month").between("1995-01", "1995-03"))
        .groupBy("order_month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("order_month")
    )


@register(
    "join_lateral_latest_order",
    doc="Correlated LATERAL subquery (SQL LATERAL join surface, distinct "
    "from the UDTF lateral): each nation's customer set is probed for "
    "its latest-order exemplar through a correlated LATERAL (... ORDER "
    "BY ... LIMIT 1).  Catalyst decorrelates to a join + per-key "
    "WindowGroupLimit rather than executing the subquery per outer row "
    "— at 100 TB the difference between one shuffled window pass and a "
    "nested loop.  The oracle spells the same decorrelated form with "
    "row_number, pinning that LATERAL is sugar, not a nested-loop "
    "commitment.",
    tags=("join", "lateral", "subquery", "ext"),
    oracle="""
SELECT n.n_name, t.o_orderkey, t.o_totalprice
FROM nation n, LATERAL (
  SELECT o.o_orderkey, round(o.o_totalprice, 2) AS o_totalprice
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1
) t
ORDER BY n.n_name
""",
)
def join_lateral_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("nation", "customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"lat_{t}")
    return spark.sql(
        """
        SELECT n.n_name, t.o_orderkey, t.o_totalprice
        FROM lat_nation n, LATERAL (
          SELECT o.o_orderkey, round(o.o_totalprice, 2) AS o_totalprice
          FROM lat_orders o JOIN lat_customer c ON c.c_custkey = o.o_custkey
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1
        ) t
        ORDER BY n.n_name
        """
    )


@register(
    "map_dynamic_schema_algebra",
    doc="Map-typed dynamic rows (the §1.2 per-row-schema model made "
    "queryable): events.props lifted to map<string,int> with str_to_map, "
    "then enriched (map_concat with a derived field), filtered "
    "(map_filter), and re-keyed — all JVM-side map algebra.  This is "
    "how the drift fixture's open-schema payloads (FIXTURES.md §C, "
    "dump2csv.py:54-59) stay queryable without a fixed StructType: the "
    "fingerprint op (P4) reads map_keys of exactly this shape.",
    tags=("map", "schema-drift", "scalar", "ext"),
    oracle="""
SELECT CAST(props->>'$.k' AS INTEGER) % 7 AS k_mod,
       count(*) AS n_events,
       sum(CASE WHEN CAST(props->>'$.k' AS INTEGER) >= 50 THEN 1 ELSE 0 END) AS n_high
FROM events
GROUP BY k_mod
ORDER BY k_mod
""",
)
def map_dynamic_schema_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # strip {" "} and lift to a real map; derive + filter stay map-typed
    as_map = events.withColumn(
        "m",
        F.str_to_map(
            F.regexp_replace(F.col("props"), r'[{}"\s]', ""), F.lit(","), F.lit(":")
        ),
    ).withColumn("m", F.transform_values("m", lambda _, v: v.cast("int")))
    enriched = as_map.withColumn(
        "m",
        F.map_concat(
            "m", F.create_map(F.lit("k_mod"), F.element_at("m", "k") % 7)
        ),
    ).withColumn("high", F.map_filter("m", lambda k, v: (k == "k") & (v >= 50)))
    return (
        enriched.groupBy(F.element_at("m", "k_mod").alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.size("high")).alias("n_high"),
        )
        .orderBy("k_mod")
    )


@register(
    "agg_mode_percentile_disc",
    doc="Ordered-set aggregates: mode() (most frequent priority per "
    "status, deterministic tie-break) and percentile_disc-style exact "
    "discrete quantiles via percentile() on totalprice.  mode is a "
    "hash-aggregate over (group, value) pairs then a per-group argmax — "
    "two map-combinable aggregates, no sort of the raw data.",
    tags=("agg", "ordered-set", "ext"),
    oracle="""
WITH freq AS (
  SELECT o_orderstatus, o_orderpriority, count(*) AS n
  FROM orders GROUP BY o_orderstatus, o_orderpriority
), md AS (
  SELECT o_orderstatus, o_orderpriority AS mode_priority
  FROM (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
                                     ORDER BY n DESC, o_orderpriority) AS rn
        FROM freq)
  WHERE rn = 1
), qt AS (
  SELECT o_orderstatus,
         round(quantile_cont(o_totalprice, 0.5), 4) AS p50_price
  FROM orders GROUP BY o_orderstatus
)
SELECT md.o_orderstatus, md.mode_priority, qt.p50_price
FROM md JOIN qt ON qt.o_orderstatus = md.o_orderstatus
ORDER BY md.o_orderstatus
""",
)
def agg_mode_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # deterministic mode: count pairs, then max_by with a total tie-break
    freq = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    md = freq.groupBy("o_orderstatus").agg(
        F.max_by(
            "o_orderpriority",
            F.struct(F.col("n"), F.negative(F.ascii("o_orderpriority"))),
        ).alias("mode_priority"),
    )
    qt = orders.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50_price")
    )
    return md.join(qt, "o_orderstatus").orderBy("o_orderstatus")


@register(
    "agg_regression_price_qty",
    doc="Closed-form linear-regression aggregates (regr_slope / "
    "regr_intercept / regr_r2 / regr_count): extendedprice ~ quantity "
    "fit per returnflag in ONE hash aggregate — the moment sums "
    "(Σx, Σy, Σxy, Σx²) are map-combinable, so a 100 TB fit costs "
    "exactly one partial+final pass, no iteration and no driver math.  "
    "The distributed complement to the k-means Lloyd entry: anything "
    "with sufficient statistics should be an aggregate, not a loop.",
    tags=("agg", "statistics", "ext"),
    oracle="""
SELECT l_returnflag,
       regr_count(l_extendedprice, l_quantity)                 AS n,
       round(regr_slope(l_extendedprice, l_quantity), 2)       AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 2)   AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 4)          AS r2
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def agg_regression_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.regr_count("l_extendedprice", "l_quantity").alias("n"),
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 2).alias("slope"),
            F.round(
                F.regr_intercept("l_extendedprice", "l_quantity"), 2
            ).alias("intercept"),
            F.round(F.regr_r2("l_extendedprice", "l_quantity"), 4).alias("r2"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Iterative graph algorithms: one exact PageRank step
# ---------------------------------------------------------------------------


@register(
    "graph_pagerank_step",
    doc="One PageRank iteration over the supplier->part edge set in EXACT "
    "integer arithmetic (contribution = 1e9 div outdeg; rank_e9 = "
    "0.15e9 + 0.85 * sum) — float-summation order can never flake the "
    "oracle hash.  Out-degrees are supplier-sized, so the degree join "
    "broadcasts; only the dst aggregation shuffles.  The full algorithm "
    "iterates this step with a checkpoint every ~5 rounds to truncate "
    "lineage (same pattern as similarity.kmeans_lloyd_step).",
    tags=("graph", "iterative", "ext"),
    oracle="""
WITH edges AS (SELECT DISTINCT l_suppkey AS src, l_partkey AS dst FROM lineitem),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
contrib AS (
  SELECT e.dst, 1000000000 // d.outdeg AS c
  FROM edges e JOIN deg d USING (src)
)
SELECT dst, CAST(150000000 + (850 * sum(c)) // 1000 AS BIGINT) AS rank_e9,
       count(*) AS n_in
FROM contrib GROUP BY dst
""",
)
def graph_pagerank_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").alias("src"), F.col("l_partkey").alias("dst")
    ).distinct()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    return (
        edges.join(F.broadcast(deg), "src")
        .withColumn("c", F.expr("1000000000 div outdeg"))
        .groupBy("dst")
        .agg(
            (F.lit(150000000) + F.expr("(850 * sum(c)) div 1000")).alias("rank_e9"),
            F.count(F.lit(1)).alias("n_in"),
        )
    )


@register(
    "explode_pos_leading_tokens",
    doc="Positional explode (posexplode generator): the first three "
    "tokens of every document, counted globally — document-leading "
    "vocabulary.  The ordinal comes from the generator itself, not a "
    "window; the explode runs map-side inside the scan stage.  Oracle: "
    "DuckDB lateral generate_series indexing into the split array.",
    tags=("explode", "posexplode", "text", "ext"),
    oracle="""
SELECT token, count(*) AS n
FROM (
  SELECT unnest(l[1:3]) AS token
  FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS l FROM documents)
)
WHERE token <> ''
GROUP BY token
ORDER BY n DESC, token
LIMIT 20
""",
)
def explode_pos_leading_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.posexplode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
                "pos", "token"
            )
        )
        .filter((F.col("pos") < 3) & (F.col("token") != ""))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# More relational breadth: equi-depth histogram, interval RANGE frames,
# null-safe equality join, as-of with tolerance
# ---------------------------------------------------------------------------


@register(
    "agg_equidepth_histogram",
    doc="Equi-DEPTH histogram (the complement of width_bucket's equi-width "
    "binning in agg_price_histogram): ntile(8) over order totals splits "
    "the population into equal-count buckets; per bucket the row count "
    "and value range.  The ntile ordering carries a unique tiebreak "
    "(o_orderkey) so bucket membership — hence min/max — is fully "
    "deterministic on duplicate prices in BOTH engines.",
    tags=("agg", "histogram", "window", "ext"),
    oracle="""
SELECT bucket, count(*) AS n,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM (
  SELECT o_totalprice,
         ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
  FROM orders
)
GROUP BY bucket
ORDER BY bucket
""",
)
def agg_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        orders.select("o_totalprice", F.ntile(8).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


@register(
    "window_range_trailing_7d",
    doc="Interval RANGE frame (W5): per customer, each order's trailing "
    "7-day order count and revenue — frame bounds in VALUE space "
    "(epoch seconds), not row space, so same-day ties always share one "
    "frame and the result is order-insensitive.  One shuffle on the "
    "customer key; the frame scan is linear per partition.",
    tags=("window", "range-frame", "ext"),
    oracle="""
SELECT o_orderkey,
       count(*) OVER w AS n_7d,
       round(sum(o_totalprice) OVER w, 2) AS rev_7d
FROM orders
WINDOW w AS (
  PARTITION BY o_custkey
  ORDER BY epoch(o_orderdate)
  RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW
)
ORDER BY o_orderkey
""",
)
def window_range_trailing_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-6 * 86400, 0)
    )
    return (
        orders.select(
            "o_orderkey",
            F.count(F.lit(1)).over(w).alias("n_7d"),
            F.round(F.sum("o_totalprice").over(w), 2).alias("rev_7d"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "join_nullsafe_priority_rollup",
    doc="Null-safe equality join (<=> / IS NOT DISTINCT FROM): a coding "
    "dimension where one code is NULL (NULLIF collapses '1-URGENT') "
    "must still join its facts — plain equality would silently drop "
    "every NULL-keyed row.  Distinct operator semantics from J5's "
    "equality joins; Catalyst still plans a hash join on the null-safe "
    "key.",
    tags=("join", "nullsafe", "ext"),
    oracle="""
WITH facts AS (
  SELECT nullif(o_orderpriority, '1-URGENT') AS pk2, o_totalprice FROM orders
), dim AS (
  SELECT DISTINCT nullif(o_orderpriority, '1-URGENT') AS dk,
         coalesce(nullif(o_orderpriority, '1-URGENT'), 'URGENT-NULL-KEY') AS label
  FROM orders
)
SELECT d.label, count(*) AS n_orders, round(sum(f.o_totalprice), 2) AS revenue
FROM facts f JOIN dim d ON f.pk2 IS NOT DISTINCT FROM d.dk
GROUP BY d.label
ORDER BY d.label
""",
)
def join_nullsafe_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    facts = orders.select(
        F.nullif("o_orderpriority", F.lit("1-URGENT")).alias("pk2"), "o_totalprice"
    )
    dim = (
        orders.select(F.nullif("o_orderpriority", F.lit("1-URGENT")).alias("dk"))
        .distinct()
        .withColumn("label", F.coalesce("dk", F.lit("URGENT-NULL-KEY")))
    )
    return (
        facts.join(F.broadcast(dim), facts["pk2"].eqNullSafe(dim["dk"]))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("label")
    )


@register(
    "join_asof_tolerance",
    doc="AS-OF join with a TOLERANCE bound (pandas merge_asof semantics): "
    "for each purchase event, the same user's most recent 'view' event, "
    "but only if it happened within the preceding hour — stale matches "
    "drop out.  Same single-shuffle union+window spelling as "
    "join_asof_event_last_order, with the tolerance as a post-filter on "
    "the matched timestamp.  Oracle: DuckDB ASOF JOIN + interval filter.",
    tags=("join", "asof", "tolerance", "ext"),
    oracle="""
WITH views AS (
  SELECT user_id, ts, max(event_id) AS view_id
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
), purchases AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id AS purchase_id, l.view_id, l.gap_s
FROM purchases p, LATERAL (
  SELECT v.view_id, CAST(date_diff('second', v.ts, p.ts) AS BIGINT) AS gap_s
  FROM views v
  WHERE v.user_id = p.user_id AND v.ts <= p.ts
    AND v.ts >= p.ts - INTERVAL 1 HOUR
  ORDER BY v.ts DESC LIMIT 1
) l
ORDER BY purchase_id
""",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    views = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
    )
    right = views.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(0).alias("kind"),  # views sort before purchases at equal t
        F.col("view_id").alias("vid"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    left = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("vid"),
        F.col("event_id").alias("purchase_id"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        right.unionByName(left)
        .withColumn("m", F.last(F.when(F.col("kind") == 0, F.struct("t", "vid")), ignorenulls=True).over(w))
        .filter((F.col("kind") == 1) & F.col("m").isNotNull())
    )
    gap = F.unix_timestamp("t") - F.unix_timestamp("m.t")
    return (
        matched.filter(gap <= 3600)
        .select(
            "purchase_id",
            F.col("m.vid").alias("view_id"),
            gap.cast("long").alias("gap_s"),
        )
        .orderBy("purchase_id")
    )


@register(
    "window_running_distinct_priorities",
    doc="Running COUNT DISTINCT over a window — not natively supported as "
    "a window aggregate in Spark, so the scalable spelling is "
    "size(collect_set() OVER w): per order, how many distinct "
    "priorities the customer has used up to that date.  The frame is "
    "RANGE (value-space) so same-day ties share one frame and the "
    "result is tie-order-insensitive; the set stays bounded by the "
    "priority domain (5), so state per row is O(domain), not O(rows).  "
    "Oracle: DuckDB's native count(DISTINCT) OVER with the same frame.",
    tags=("window", "distinct", "ext"),
    oracle="""
SELECT o_orderkey,
       count(DISTINCT o_orderpriority) OVER (
         PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
         RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS n_distinct_prio
FROM orders
ORDER BY o_orderkey
""",
)
def window_running_distinct_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    return (
        orders.select(
            "o_orderkey",
            F.size(F.collect_set("o_orderpriority").over(w)).cast("long").alias(
                "n_distinct_prio"
            ),
        )
        .orderBy("o_orderkey")
    )


@register(
    "join_range_bucketed_global",
    doc="PURE range join — no shared equi key at all (purchase↔error "
    "pairs within 5 minutes across ALL users): the naive plan is a "
    "nested-loop cross product.  The scale spelling buckets time into "
    "band-width cells, explodes each left row to its cell and the "
    "next (2 cells), equi-joins on the cell id, then applies the exact "
    "band as a residual filter — O(n) state per cell instead of O(n·m) "
    "pairs, and the join is a plain shuffled hash join on cell.  "
    "Oracle: the unbucketed band join.",
    tags=("join", "range", "bucketed", "ext"),
    oracle="""
SELECT p.event_id AS purchase_id, e.event_id AS error_id,
       CAST(date_diff('second', e.ts, p.ts) AS BIGINT) AS gap_s
FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
JOIN (SELECT event_id, ts FROM events WHERE event_type = 'error') e
  ON e.ts >= p.ts - INTERVAL 5 MINUTE AND e.ts <= p.ts
ORDER BY purchase_id, error_id
""",
)
def join_range_bucketed_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    band = 300  # seconds
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.col("ts").alias("e_ts")
    )
    # errors within [p_ts - band, p_ts]: the error's cell is either the
    # purchase's cell or the one before it -> explode purchases to both
    cell = lambda c: (F.unix_timestamp(c) / band).cast("long")  # noqa: E731
    p2 = purchases.withColumn(
        "cell", F.explode(F.array(cell(F.col("p_ts")) - 1, cell(F.col("p_ts"))))
    )
    e2 = errors.withColumn("cell", cell(F.col("e_ts")))
    # residual band filter at FULL timestamp precision: events carry
    # microseconds, and a floor-second gap test admits pairs where e_ts
    # exceeds p_ts (or trails it by >300s) at sub-second offsets — the
    # oracle's exact `e.ts BETWEEN p.ts - 5min AND p.ts` rejects those.
    # gap_s stays the whole-second boundary count (= date_diff('second')).
    gap = F.unix_timestamp("p_ts") - F.unix_timestamp("e_ts")
    in_band = (F.col("e_ts") <= F.col("p_ts")) & (
        F.col("e_ts") >= F.col("p_ts") - F.expr("INTERVAL 300 SECONDS")
    )
    return (
        p2.join(e2, "cell")
        .filter(in_band)
        .select("purchase_id", "error_id", gap.cast("long").alias("gap_s"))
        .orderBy("purchase_id", "error_id")
    )


@register(
    "scalar_url_functions",
    doc="URL scalar surface (parse_url/url_decode): reconstructable URLs "
    "are synthesized from order columns (incl. an encoded query value), "
    "then parsed back into host/path/query parts — the P7 gs-URL parse "
    "(dump2csv.py:236-238) generalized to the full URL grammar.  Oracle "
    "computes the expected parts directly from the source columns; any "
    "drift in escaping or part extraction mismatches.",
    tags=("scalar", "url", "ref:P7", "ext"),
    oracle="""
SELECT o_orderkey,
       'warehouse.example.com' AS host,
       '/' || o_orderstatus || '/' || CAST(o_orderkey AS VARCHAR) AS path,
       CAST(o_custkey AS VARCHAR) AS custkey_param,
       o_orderpriority AS decoded_priority
FROM orders
ORDER BY o_orderkey
""",
)
def scalar_url_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    url = F.concat(
        F.lit("https://warehouse.example.com/"),
        F.col("o_orderstatus"),
        F.lit("/"),
        F.col("o_orderkey").cast("string"),
        F.lit("?custkey="),
        F.col("o_custkey").cast("string"),
        F.lit("&prio="),
        F.url_encode("o_orderpriority"),
    )
    with_url = orders.select("o_orderkey", url.alias("url"))
    return with_url.select(
        "o_orderkey",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("custkey")).alias("custkey_param"),
        F.url_decode(F.parse_url("url", F.lit("QUERY"), F.lit("prio"))).alias(
            "decoded_priority"
        ),
    ).orderBy("o_orderkey")


@register(
    "window_ewma_monthly_revenue",
    doc="Exponentially-weighted moving average (alpha=0.5) over each "
    "nation's monthly revenue series — the smoothing step of a metrics "
    "pipeline.  EWMA is a sequential recurrence (ewma_t = a*x_t + "
    "(1-a)*ewma_{t-1}), not a frame aggregate, so the scalable spelling "
    "is: aggregate to one row per (nation, month) FIRST (tiny), then "
    "fold the ordered series per nation with F.aggregate over a "
    "sort_array'd collect_list — state per group is O(months), never "
    "O(orders).  Both engines fold left-to-right from the first "
    "element (DuckDB list_reduce has identical init semantics), so the "
    "float sequence is bit-compatible.  Closed-form power weights "
    "would overflow 2^k at series length ~1000; the fold never does.",
    tags=("window", "timeseries", "ext"),
    oracle="""
WITH monthly AS (
  SELECT n_name, year(o_orderdate)*100 + month(o_orderdate) AS mkey,
         sum(o_totalprice) AS rev
  FROM orders
  JOIN customer ON c_custkey = o_custkey
  JOIN nation   ON n_nationkey = c_nationkey
  GROUP BY n_name, mkey
)
SELECT n_name, CAST(count(*) AS BIGINT) AS n_months,
       round(list_reduce(list(rev ORDER BY mkey),
                         (acc, x) -> acc*0.5 + x*0.5), 4) AS ewma_rev
FROM monthly GROUP BY n_name ORDER BY n_name
""",
)
def window_ewma_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    monthly = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .groupBy(
            "n_name",
            (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("mkey"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    series = monthly.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_months"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("mkey", "rev"))), lambda s: s["rev"]
        ).alias("revs"),
    )
    return series.select(
        "n_name",
        "n_months",
        F.round(
            F.expr(
                "aggregate(slice(revs, 2, size(revs) - 1), revs[0],"
                " (acc, x) -> acc * 0.5D + x * 0.5D)"
            ),
            4,
        ).alias("ewma_rev"),
    ).orderBy("n_name")


@register(
    "agg_max_concurrency",
    doc="Sweep-line max-concurrency: each event opens a 300 s session "
    "[t, t+300); per event type, the peak number of simultaneously-open "
    "sessions.  The interval set becomes +1/-1 deltas on a combined "
    "key k = 2*t + is_start, so an end at time t sorts BEFORE a start "
    "at t (half-open intervals never overlap at the boundary) and the "
    "running sum is a RANGE-frame window over a single numeric key — "
    "peers share one frame, so same-timestamp ties are order-"
    "insensitive (a ROWS frame over a non-unique order would be "
    "nondeterministic).  One shuffle on event_type; pure integer math.",
    tags=("window", "sweepline", "interval", "ext"),
    oracle="""
WITH pts AS (
  SELECT event_type,
         2 * date_diff('second', TIMESTAMP '1970-01-01', ts) + 1 AS k, 1 AS delta
  FROM events
  UNION ALL
  SELECT event_type,
         2 * (date_diff('second', TIMESTAMP '1970-01-01', ts) + 300) AS k, -1 AS delta
  FROM events
),
running AS (
  SELECT event_type,
         sum(delta) OVER (PARTITION BY event_type ORDER BY k
                          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
  FROM pts
)
SELECT event_type, CAST(max(conc) AS BIGINT) AS peak_concurrency
FROM running GROUP BY event_type ORDER BY event_type
""",
)
def agg_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    s = F.unix_timestamp("ts")
    pts = events.select(
        "event_type", (2 * s + 1).alias("k"), F.lit(1).alias("delta")
    ).unionByName(
        events.select(
            "event_type", (2 * (s + 300)).alias("k"), F.lit(-1).alias("delta")
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("k")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    return (
        pts.select("event_type", F.sum("delta").over(w).alias("conc"))
        .groupBy("event_type")
        .agg(F.max("conc").cast("long").alias("peak_concurrency"))
        .orderBy("event_type")
    )


@register(
    "window_mom_growth",
    doc="Period-over-period growth: monthly order revenue per nation with "
    "month-over-month relative change via lag() — NULL for each "
    "nation's first month (no fabricated zero).  Aggregate first "
    "(per-month rows are tiny), window second over the reduced "
    "relation; the window repartitions by n_name only after the "
    "aggregate has collapsed the fact table.",
    tags=("window", "timeseries", "ext"),
    oracle="""
WITH monthly AS (
  SELECT n_name, year(o_orderdate)*100 + month(o_orderdate) AS mkey,
         sum(o_totalprice) AS rev
  FROM orders
  JOIN customer ON c_custkey = o_custkey
  JOIN nation   ON n_nationkey = c_nationkey
  GROUP BY n_name, mkey
)
SELECT n_name, mkey,
       round(rev, 2) AS rev,
       round((rev - lag(rev) OVER w) / lag(rev) OVER w, 6) AS mom_growth
FROM monthly
WINDOW w AS (PARTITION BY n_name ORDER BY mkey)
ORDER BY n_name, mkey
""",
)
def window_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    monthly = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .groupBy(
            "n_name",
            (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("mkey"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w = Window.partitionBy("n_name").orderBy("mkey")
    prev = F.lag("rev").over(w)
    return monthly.select(
        "n_name",
        "mkey",
        F.round("rev", 2).alias("rev"),
        F.round((F.col("rev") - prev) / prev, 6).alias("mom_growth"),
    ).orderBy("n_name", "mkey")


@register(
    "graph_triangle_count",
    doc="Triangle counting over the supplier co-occurrence graph (edge = "
    "two suppliers ship in the same order): the standard a<b<c "
    "oriented-edge three-way self-join, which counts each triangle "
    "exactly once and bounds intermediate size by edge orientation "
    "(every wedge enumerated has a<b<c, so the candidate set is ~half "
    "the adjacency square).  Complements PageRank-step and "
    "connected-components for the graph-analytics row.",
    tags=("graph", "join", "ext"),
    oracle="""
WITH edges AS (
  SELECT DISTINCT s1.l_suppkey AS a, s2.l_suppkey AS b
  FROM lineitem s1 JOIN lineitem s2
    ON s1.l_orderkey = s2.l_orderkey AND s1.l_suppkey < s2.l_suppkey
)
SELECT CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges,
       CAST(count(*) AS BIGINT) AS n_triangles
FROM edges e1
JOIN edges e2 ON e1.b = e2.a
JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
""",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    s1 = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("a"))
    s2 = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("b"))
    edges = (
        s1.join(s2, "ok").where(F.col("a") < F.col("b")).select("a", "b").distinct()
    )
    e1 = edges
    e2 = edges.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = edges.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    tri = (
        e1.join(e2, "b")
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return edges.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(tri)


@register(
    "profile_column_stats",
    doc="Table profiling (the warehouse-side ANALYZE a migration sanity-"
    "check needs): one pass over orders computes per-column null count, "
    "exact distinct count, and min/max rendered to text; the wide "
    "aggregate row is then unpivoted to one row per column via an "
    "inline array-of-structs (map-side, no extra shuffle or rescan — "
    "profiling N columns must not cost N scans).",
    tags=("tooling", "profile", "ext"),
    oracle="""
SELECT 'o_orderdate' AS col_name, count(*) AS n_rows,
       count(*) - count(o_orderdate) AS n_nulls,
       count(DISTINCT o_orderdate) AS n_distinct,
       CAST(min(o_orderdate) AS VARCHAR) AS min_val,
       CAST(max(o_orderdate) AS VARCHAR) AS max_val FROM orders
UNION ALL
SELECT 'o_orderkey', count(*), count(*) - count(o_orderkey),
       count(DISTINCT o_orderkey),
       CAST(min(o_orderkey) AS VARCHAR), CAST(max(o_orderkey) AS VARCHAR) FROM orders
UNION ALL
SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
       count(DISTINCT o_orderpriority),
       min(o_orderpriority), max(o_orderpriority) FROM orders
UNION ALL
SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
       count(DISTINCT o_orderstatus),
       min(o_orderstatus), max(o_orderstatus) FROM orders
ORDER BY col_name
""",
)
def profile_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_orderdate", "o_orderkey", "o_orderpriority", "o_orderstatus"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}_nulls"),
            F.countDistinct(c).alias(f"{c}_distinct"),
            F.min(c).cast("string").alias(f"{c}_min"),
            F.max(c).cast("string").alias(f"{c}_max"),
        ]
    wide = orders.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"{c}_nulls").alias("n_nulls"),
                F.col(f"{c}_distinct").alias("n_distinct"),
                F.col(f"{c}_min").alias("min_val"),
                F.col(f"{c}_max").alias("max_val"),
            )
            for c in cols
        ]
    )
    return (
        wide.select(F.explode(rows).alias("r"))
        .select("r.*")
        .orderBy("col_name")
    )


@register(
    "join_broadcast_range_lookup",
    doc="Dimension-interval lookup (the price-bracket / IP-geolocation "
    "shape): facts land in a bracket via lo <= v < hi with NO equi key, "
    "so the only sane physical plan is a broadcast nested-loop against "
    "the tiny interval dim — O(|facts| x |brackets|) with |brackets| "
    "constant beats any shuffle.  The explicit broadcast() pins that "
    "choice; at 100 TB the fact side streams through map tasks "
    "untouched.  Bracket bounds are integers, so membership is exact.",
    tags=("join", "range", "broadcast", "ext"),
    oracle="""
WITH brackets(bracket, lo, hi) AS (
  VALUES ('p0_low', 0, 20000), ('p1_mid', 20000, 45000),
         ('p2_high', 45000, 70000), ('p3_lux', 70000, 1000000000)
)
SELECT bracket, count(*) AS n_items,
       round(sum(l_extendedprice), 2) AS total_price
FROM lineitem JOIN brackets
  ON l_extendedprice >= lo AND l_extendedprice < hi
GROUP BY bracket ORDER BY bracket
""",
)
def join_broadcast_range_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    brackets = spark.createDataFrame(
        [
            ("p0_low", 0, 20_000),
            ("p1_mid", 20_000, 45_000),
            ("p2_high", 45_000, 70_000),
            ("p3_lux", 70_000, 1_000_000_000),
        ],
        "bracket string, lo long, hi long",
    )
    return (
        li.join(
            F.broadcast(brackets),
            (F.col("l_extendedprice") >= F.col("lo"))
            & (F.col("l_extendedprice") < F.col("hi")),
        )
        .groupBy("bracket")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
        .orderBy("bracket")
    )


@register(
    "agg_weighted_avg",
    doc="Weighted average (avg price per unit, quantity-weighted) per "
    "return flag: the numerator and denominator are separate partial-"
    "aggregable sums (a plain ratio of avgs would be wrong and a "
    "one-pass UDAF unnecessary); the ratio is taken only at the end "
    "on the collapsed per-group row.",
    tags=("agg", "ext"),
    oracle="""
SELECT l_returnflag,
       round(sum(l_extendedprice * l_quantity), 2) AS sum_pq,
       round(sum(l_quantity), 2) AS sum_q,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6) AS weighted_avg_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pq = F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
    q = F.sum("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(pq, 2).alias("sum_pq"),
            F.round(q, 2).alias("sum_q"),
            F.round(pq / q, 6).alias("weighted_avg_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "window_rows_sliding_avg",
    doc="ROWS-frame moving average (7-row trailing mean of order value "
    "per priority, ordered by the unique order key): a ROWS frame over "
    "a non-unique ordering would be nondeterministic, so the frame "
    "ordering is pinned to the key.  Complements the RANGE/interval "
    "frames already covered — ROWS and RANGE hit different window-exec "
    "code paths.",
    tags=("window", "frame", "ext"),
    oracle="""
SELECT o_orderkey,
       round(avg(o_totalprice) OVER (
         PARTITION BY o_orderpriority ORDER BY o_orderkey
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
FROM orders ORDER BY o_orderkey
""",
)
def window_rows_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderkey")
        .rowsBetween(-6, 0)
    )
    return orders.select(
        "o_orderkey", F.round(F.avg("o_totalprice").over(w), 4).alias("ma7")
    ).orderBy("o_orderkey")


@register(
    "anomaly_zscore_events",
    doc="Grouped z-score outlier detection: per event type, flag events "
    "whose value deviates > 2.5 sample standard deviations from the "
    "type mean.  Aggregate-then-broadcast-join — the per-type "
    "moments are 5 rows, so the fact table is scanned once and the "
    "scoring join is map-side; no window materialization over the full "
    "stream.",
    tags=("agg", "anomaly", "ext"),
    oracle="""
WITH stats AS (
  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
  FROM events GROUP BY event_type
)
SELECT event_id, e.event_type, round(value, 4) AS value,
       round((value - mu) / sigma, 4) AS zscore
FROM events e JOIN stats s ON e.event_type = s.event_type
WHERE abs(value - mu) > 2.5 * sigma
ORDER BY event_id
""",
)
def anomaly_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    stats = events.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    return (
        events.join(F.broadcast(stats), "event_type")
        .where(F.abs(F.col("value") - F.col("mu")) > 2.5 * F.col("sigma"))
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 4).alias(
                "zscore"
            ),
        )
        .orderBy("event_id")
    )


@register(
    "scalar_radix_hex_bin",
    doc="Radix-rendering scalar surface: hexadecimal and binary text "
    "forms of the order key (hex/bin — the digest-prefix bucketing of "
    "the table checksum and the band-key rendering of LSH both lean on "
    "radix text forms being engine-identical).",
    tags=("scalar", "ext"),
    oracle="""
SELECT o_orderkey,
       to_hex(o_orderkey) AS key_hex,
       bin(o_orderkey) AS key_bin,
       length(bin(o_orderkey)) AS bin_digits
FROM orders WHERE o_orderkey IS NOT NULL ORDER BY o_orderkey
""",
)
def scalar_radix_hex_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.where(F.col("o_orderkey").isNotNull())
        .select(
            "o_orderkey",
            F.hex("o_orderkey").alias("key_hex"),
            F.bin("o_orderkey").alias("key_bin"),
            F.length(F.bin("o_orderkey")).cast("long").alias("bin_digits"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "window_rank_with_ties",
    doc="Top-3 orders per priority by value with tie semantics made "
    "explicit: rank() admits ties (the result set can exceed 3 rows "
    "per group and is therefore deterministic even on duplicate "
    "values), dense_rank() shows the gap-free variant alongside — "
    "complementing the row_number()-based top-k entries whose "
    "uniqueness comes from the key tiebreak.  Plans as one window "
    "over a single hash partition exchange; WindowGroupLimit pushes "
    "the rank filter below the full sort at scale.",
    tags=("window", "rank", "ext"),
    oracle="""
SELECT * FROM (
  SELECT o_orderpriority, o_orderkey,
         round(o_totalprice, 2) AS price,
         CAST(rank() OVER w AS BIGINT) AS rnk,
         CAST(dense_rank() OVER w AS BIGINT) AS drnk
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC)
)
WHERE rnk <= 3
ORDER BY o_orderpriority, rnk, o_orderkey
""",
)
def window_rank_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
        .where(F.col("rnk") <= 3)
        .orderBy("o_orderpriority", "rnk", "o_orderkey")
    )


@register(
    "agg_multi_distinct",
    doc="Multiple COUNT(DISTINCT ...) over different columns in ONE "
    "aggregate: Catalyst plans this via Expand (one row replicated per "
    "distinct-column group) + two-phase aggregate, so it stays a "
    "single pass over the fact table instead of one scan per distinct "
    "column — the plan-shape guardrail asserts the Expand.",
    tags=("agg", "distinct", "ext"),
    oracle="""
SELECT o_orderstatus,
       count(DISTINCT o_custkey) AS n_customers,
       count(DISTINCT o_orderpriority) AS n_priorities,
       count(DISTINCT year(o_orderdate)) AS n_years,
       count(*) AS n_orders
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.countDistinct(F.year("o_orderdate")).alias("n_years"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "scalar_string_breadth2",
    doc="Second string-scalar sweep (P8 continued): lpad/rpad padding, "
    "translate, repeat, reverse and printf-style formatting — the "
    "render-side functions a CSV/report sink leans on, pinned "
    "engine-identical.",
    tags=("scalar", "ref:P8", "ext"),
    oracle="""
SELECT o_orderkey,
       lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS key_padded,
       rpad(o_orderstatus, 4, '.') AS status_padded,
       translate(o_orderpriority, '-', '_') AS prio_snake,
       repeat(o_orderstatus, 3) AS status_x3,
       reverse(o_orderpriority) AS prio_rev,
       printf('%s#%d', o_orderstatus, o_orderkey) AS composite
FROM orders WHERE o_orderkey IS NOT NULL ORDER BY o_orderkey
""",
)
def scalar_string_breadth2(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.where(F.col("o_orderkey").isNotNull())
        .select(
            "o_orderkey",
            F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("key_padded"),
            F.rpad("o_orderstatus", 4, ".").alias("status_padded"),
            F.translate("o_orderpriority", "-", "_").alias("prio_snake"),
            F.repeat("o_orderstatus", 3).alias("status_x3"),
            F.reverse("o_orderpriority").alias("prio_rev"),
            F.format_string("%s#%d", "o_orderstatus", "o_orderkey").alias("composite"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "layout_compact_small_files",
    doc="Small-file compaction (OPTIMIZE): a 64-way fragmented parquet "
    "table is rewritten via repartitionByRange(4, key) — range layout "
    "gives disjoint per-file key spans (min/max footer stats become "
    "selective) and ~16x fewer, target-sized files; at 100 TB the "
    "small-files problem is a namenode/scan-setup killer long before "
    "it is a CPU one.  The aggregate over the compacted copy proves "
    "the rewrite is content-preserving (oracle aggregates the "
    "original); the file-count/layout assertions live in "
    "tests/test_zorder_layout.py::test_small_file_compaction_layout.",
    tags=("layout", "sink", "ext"),
    oracle="""
SELECT o_orderstatus, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price,
       count(DISTINCT o_orderkey) AS n_keys
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
)
def layout_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    orders = load_table(spark, sf_dir, "orders")
    base = os.path.join(tempfile.gettempdir(), f"compact_demo_{uuid.uuid4().hex[:8]}")
    frag, tidy = f"{base}/frag", f"{base}/tidy"
    orders.repartition(64).write.mode("overwrite").parquet(frag)
    spark.read.parquet(frag).repartitionByRange(4, "o_orderkey").write.mode(
        "overwrite"
    ).parquet(tidy)
    return (
        spark.read.parquet(tidy)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.countDistinct("o_orderkey").alias("n_keys"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "window_linear_interpolate",
    doc="Linear interpolation of missing series values (time-series "
    "repair, the two-sided upgrade of LOCF): per customer, orders are "
    "a position-indexed series whose value is deterministically "
    "NULLed (key%3=1 simulates sensor dropout); each gap fills as "
    "prev + (next-prev)*(i-pi)/(ni-pi) from the nearest non-null "
    "neighbours via IGNORE NULLS window lookups — two windows over "
    "ONE hash partitioning on the series key, no self-joins.  Edge "
    "gaps (no neighbour on one side) stay NULL — fabricating data "
    "past the boundary is a correctness bug, not a feature.",
    tags=("window", "timeseries", "interpolate", "ext"),
    oracle="""
WITH s AS (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS i,
         CASE WHEN o_orderkey % 3 = 1 THEN NULL
              ELSE round(o_totalprice, 2) END AS v
  FROM orders WHERE o_orderkey IS NOT NULL
),
nb AS (
  SELECT o_custkey, o_orderkey, i, v,
         last_value(v IGNORE NULLS) OVER (
           PARTITION BY o_custkey ORDER BY i
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN i END IGNORE NULLS) OVER (
           PARTITION BY o_custkey ORDER BY i
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pi,
         first_value(v IGNORE NULLS) OVER (
           PARTITION BY o_custkey ORDER BY i
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN i END IGNORE NULLS) OVER (
           PARTITION BY o_custkey ORDER BY i
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS ni
  FROM s
)
SELECT o_custkey, o_orderkey,
       -- floor(x*1e4+0.5)/1e4 instead of round(): Spark rounds doubles
       -- through exact BigDecimal while DuckDB rounds in floating point,
       -- and interpolated values can land exactly on the .00005 cliff —
       -- spelling the rounding as identical IEEE ops on both sides makes
       -- the boundary deterministic
       floor(CASE WHEN v IS NOT NULL THEN v
                  WHEN pv IS NOT NULL AND nv IS NOT NULL
                    THEN pv + (nv - pv) * (i - pi) / (ni - pi)
             END * 10000 + 0.5) / 10000 AS v_filled,
       (v IS NULL AND pv IS NOT NULL AND nv IS NOT NULL) AS interpolated
FROM nb ORDER BY o_custkey, o_orderkey
""",
)
def window_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey").isNotNull()
    )
    wp = Window.partitionBy("o_custkey").orderBy("i")
    before = wp.rowsBetween(Window.unboundedPreceding, -1)
    after = wp.rowsBetween(1, Window.unboundedFollowing)
    s = orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number()
        .over(Window.partitionBy("o_custkey").orderBy("o_orderkey"))
        .alias("i"),
        F.when(F.col("o_orderkey") % 3 == 1, None)
        .otherwise(F.round("o_totalprice", 2))
        .alias("v"),
    )
    vi = F.when(F.col("v").isNotNull(), F.col("i"))
    nb = s.select(
        "*",
        F.last("v", ignorenulls=True).over(before).alias("pv"),
        F.last(vi, ignorenulls=True).over(before).alias("pi"),
        F.first("v", ignorenulls=True).over(after).alias("nv"),
        F.first(vi, ignorenulls=True).over(after).alias("ni"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (F.col("i") - F.col("pi")) / (
        F.col("ni") - F.col("pi")
    )
    return nb.select(
        "o_custkey",
        "o_orderkey",
        # floor(x*1e4+0.5)/1e4 mirrors the oracle exactly (see SQL note)
        (
            F.floor(
                F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
                    F.when(F.col("pv").isNotNull() & F.col("nv").isNotNull(), interp)
                )
                * 10000
                + 0.5
            )
            / 10000
        ).alias("v_filled"),
        (
            F.col("v").isNull() & F.col("pv").isNotNull() & F.col("nv").isNotNull()
        ).alias("interpolated"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "window_rolling_median",
    doc="Rolling exact median (7-row trailing, per priority, key-pinned "
    "order): Spark has no windowed percentile, so the scalable "
    "spelling is array_sort(collect_list() OVER frame) + middle "
    "element(s) — per-row state is O(frame), constant here, which is "
    "the condition under which the collect_list spelling is "
    "legitimate (like the running-distinct entry; an unbounded frame "
    "would not be).  Inputs rounded to cents first so both engines "
    "interpolate between identical values; even frames average the "
    "two middles exactly as DuckDB's median does.",
    tags=("window", "percentile", "ext"),
    oracle="""
SELECT o_orderkey,
       round(median(round(o_totalprice, 2)) OVER (
         PARTITION BY o_orderpriority ORDER BY o_orderkey
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS med7
FROM orders WHERE o_orderkey IS NOT NULL ORDER BY o_orderkey
""",
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey").isNotNull()
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderkey")
        .rowsBetween(-6, 0)
    )
    vals = F.array_sort(F.collect_list(F.round("o_totalprice", 2)).over(w))
    n = F.size(vals)
    lo = F.element_at(vals, ((n + 1) / 2).cast("int"))
    hi = F.element_at(vals, (n / 2 + 1).cast("int"))
    return orders.select(
        "o_orderkey", F.round((lo + hi) / 2, 4).alias("med7")
    ).orderBy("o_orderkey")


@register(
    "explode_outer_empty_preserving",
    doc="Null-preserving generation (explode_outer): documents tokenize "
    "to word arrays and unnest — but rows whose array is EMPTY must "
    "survive as a single null-token row (an inner explode silently "
    "drops them; at corpus scale 'rows vanished because a generator "
    "had nothing to emit' is a classic silent-loss bug).  Every "
    "doc_id≡3 (mod 7) row gets a deterministically-empty array since "
    "the fixtures have no empty texts; the oracle spells the same "
    "semantics with a CASE-to-[NULL] unnest.",
    tags=("generator", "ext"),
    oracle="""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 3 THEN CAST([] AS VARCHAR[])
              ELSE string_split(trim(text), ' ')[1:8] END AS toks
  FROM documents WHERE doc_id % 5 = 0
)
SELECT doc_id, tok, CAST(len(toks) AS INT) AS n_toks
FROM (
  SELECT doc_id, toks,
         unnest(CASE WHEN len(toks) = 0 THEN [NULL] ELSE toks END) AS tok
  FROM d
)
ORDER BY doc_id, tok
""",
)
def explode_outer_empty_preserving(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 0)
    toks = F.when(
        F.col("doc_id") % 7 == 3, F.array().cast("array<string>")
    ).otherwise(F.slice(F.split(F.trim("text"), " "), 1, 8))
    return (
        docs.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            F.explode_outer("toks").alias("tok"),
            F.size("toks").alias("n_toks"),
        )
        .orderBy("doc_id", "tok")
    )


@register(
    "agg_trimmed_mean",
    doc="Robust statistics: 10%-trimmed mean of order value per status — "
    "exact P10/P90 cutoffs (percentile_cont over cent-rounded values, "
    "identical interpolation both engines) computed in a 3-row "
    "aggregate, broadcast back, then one filtered re-aggregation.  "
    "Two passes by necessity (the cutoffs are data-dependent), but "
    "pass two is the same scan shape as pass one — never a sort.",
    tags=("agg", "robust", "ext"),
    oracle="""
WITH cuts AS (
  SELECT o_orderstatus,
         quantile_cont(round(o_totalprice, 2), 0.1) AS p10,
         quantile_cont(round(o_totalprice, 2), 0.9) AS p90
  FROM orders GROUP BY o_orderstatus
)
SELECT o.o_orderstatus,
       count(*) AS n_kept,
       round(avg(round(o_totalprice, 2)), 4) AS trimmed_mean
FROM orders o JOIN cuts c ON o.o_orderstatus = c.o_orderstatus
WHERE round(o_totalprice, 2) >= p10 AND round(o_totalprice, 2) <= p90
GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus
""",
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    v = F.round("o_totalprice", 2)
    cuts = orders.groupBy("o_orderstatus").agg(
        F.percentile(v, F.lit(0.1)).alias("p10"),
        F.percentile(v, F.lit(0.9)).alias("p90"),
    )
    return (
        orders.join(F.broadcast(cuts), "o_orderstatus")
        .where((v >= F.col("p10")) & (v <= F.col("p90")))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.avg(v), 4).alias("trimmed_mean"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_log_histogram",
    doc="Log-scale histogram (decade bins via floor(log10)) of order "
    "values — the profiling shape for power-law-ish columns where "
    "linear bins put everything in one bucket.  Integer bin keys, "
    "single aggregate; the bin edges are value-independent so the "
    "histogram is mergeable across partitions and days.",
    tags=("agg", "histogram", "ext"),
    oracle="""
SELECT CAST(floor(log10(o_totalprice)) AS BIGINT) AS decade,
       count(*) AS n_orders,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM orders WHERE o_totalprice > 0
GROUP BY decade ORDER BY decade
""",
)
def agg_log_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    return (
        orders.groupBy(
            F.floor(F.log10("o_totalprice")).cast("long").alias("decade")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("decade")
    )


@register(
    "events_markov_transitions",
    doc="First-order Markov transition matrix over per-user event "
    "sequences: lag() pairs each event with its successor (ordered by "
    "ts with event_id as the unique tiebreak — an ambiguous order "
    "would make the matrix nondeterministic), then one groupBy counts "
    "transitions and a window normalizes rows to probabilities.  The "
    "sequence shuffle is by user; the matrix is |event-types|² rows "
    "regardless of SF.",
    tags=("window", "sequence", "markov", "ext"),
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
),
t AS (
  SELECT event_type AS src, next_type AS dst, count(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY src, dst
)
SELECT src, dst, n,
       round(n / (sum(n) OVER (PARTITION BY src)), 6) AS p
FROM t ORDER BY src, dst
""",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    t = seq.groupBy(
        F.col("event_type").alias("src"), F.col("next_type").alias("dst")
    ).agg(F.count(F.lit(1)).alias("n"))
    ws = Window.partitionBy("src")
    return t.select(
        "src",
        "dst",
        "n",
        F.round(F.col("n") / F.sum("n").over(ws), 6).alias("p"),
    ).orderBy("src", "dst")


@register(
    "agg_variance_merge",
    doc="Mergeable second moments (Chan's parallel algorithm — the "
    "algebra under EVERY distributed variance): per status the fact "
    "rows split into two deterministic halves (key parity), each half "
    "reduces to (n, mean, M2), and the halves merge in a final "
    "projection via mean_ab = mean_a + δ·n_b/n and M2_ab = M2_a + "
    "M2_b + δ²·n_a·n_b/n.  The oracle computes stddev directly over "
    "the unsplit rows — merged == direct is exactly the property that "
    "lets partial aggregates combine across partitions/days without "
    "revisiting rows.",
    tags=("agg", "mergeable", "ext"),
    oracle="""
SELECT o_orderstatus,
       count(*) AS n,
       round(avg(o_totalprice), 4) AS mean_price,
       round(stddev_samp(o_totalprice), 4) AS sd_price
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
)
def agg_variance_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    halves = (
        orders.groupBy("o_orderstatus", (F.col("o_orderkey") % 2).alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("o_totalprice").alias("m"),
            (F.var_samp("o_totalprice") * (F.count(F.lit(1)) - 1)).alias("m2"),
        )
    )
    # a group entirely inside one half must still merge: the absent
    # half's (n, mean, M2) identity element is (0, 0.0, 0.0)
    side = lambda h, c: F.coalesce(  # noqa: E731
        F.max(F.when(F.col("h") == h, F.col(c))), F.lit(0.0)
    )
    merged = halves.groupBy("o_orderstatus").agg(
        side(0, "n").cast("long").alias("na"),
        side(0, "m").alias("ma"),
        side(0, "m2").alias("m2a"),
        side(1, "n").cast("long").alias("nb"),
        side(1, "m").alias("mb"),
        side(1, "m2").alias("m2b"),
    )
    n = F.col("na") + F.col("nb")
    delta = F.col("mb") - F.col("ma")
    mean = F.col("ma") + delta * F.col("nb") / n
    m2 = F.col("m2a") + F.col("m2b") + delta * delta * F.col("na") * F.col("nb") / n
    return merged.select(
        "o_orderstatus",
        n.alias("n"),
        F.round(mean, 4).alias("mean_price"),
        F.round(F.sqrt(m2 / (n - 1)), 4).alias("sd_price"),
    ).orderBy("o_orderstatus")


@register(
    "window_gaps_islands",
    doc="Gaps-and-islands: maximal runs of consecutive order-month "
    "activity per customer (the canonical 'streak' shape — retention "
    "streaks, sensor uptime, coverage spans).  The island key is the "
    "classic month_index − dense_rank() difference — constant within "
    "a run of consecutive distinct months, strictly different across "
    "gaps — then one aggregate per island; two windows share the one "
    "per-customer partitioning.",
    tags=("window", "islands", "ext"),
    oracle="""
WITH months AS (
  SELECT DISTINCT o_custkey,
         year(o_orderdate) * 12 + month(o_orderdate) AS mi
  FROM orders
),
keyed AS (
  SELECT o_custkey, mi,
         mi - dense_rank() OVER (PARTITION BY o_custkey ORDER BY mi) AS island
  FROM months
)
SELECT o_custkey,
       CAST(min(mi) AS BIGINT) AS streak_start_mi,
       CAST(count(*) AS BIGINT) AS streak_months
FROM keyed
GROUP BY o_custkey, island
HAVING count(*) >= 3
ORDER BY o_custkey, streak_start_mi
""",
)
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    months = orders.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mi"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("mi")
    keyed = months.withColumn("island", F.col("mi") - F.dense_rank().over(w))
    return (
        keyed.groupBy("o_custkey", "island")
        .agg(
            F.min("mi").cast("long").alias("streak_start_mi"),
            F.count(F.lit(1)).alias("streak_months"),
        )
        .where(F.col("streak_months") >= 3)
        .select("o_custkey", "streak_start_mi", "streak_months")
        .orderBy("o_custkey", "streak_start_mi")
    )


@register(
    "graph_degree_distribution",
    doc="Degree distribution of the supplier co-occurrence graph (same "
    "edge derivation as triangle counting): per-vertex degree from the "
    "symmetrized edge list, then the degree histogram — the shape "
    "diagnostic that decides whether a graph algorithm needs hub "
    "mitigation (power-law tail ⇒ salt/cap hubs before wedge joins).  "
    "Output is O(distinct degrees), constant-ish at any SF.",
    tags=("graph", "ext"),
    oracle="""
WITH edges AS (
  SELECT DISTINCT s1.l_suppkey AS a, s2.l_suppkey AS b
  FROM lineitem s1 JOIN lineitem s2
    ON s1.l_orderkey = s2.l_orderkey AND s1.l_suppkey < s2.l_suppkey
),
sym AS (
  SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges
),
deg AS (SELECT v, count(*) AS degree FROM sym GROUP BY v)
SELECT degree, CAST(count(*) AS BIGINT) AS n_vertices
FROM deg GROUP BY degree ORDER BY degree
""",
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    s1 = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("a"))
    s2 = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("b"))
    edges = s1.join(s2, "ok").where(F.col("a") < F.col("b")).select("a", "b").distinct()
    sym = edges.select(F.col("a").alias("v")).unionByName(
        edges.select(F.col("b").alias("v"))
    )
    deg = sym.groupBy("v").agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
        .orderBy("degree")
    )


@register(
    "events_inter_arrival_stats",
    doc="Inter-arrival time statistics per event type (the traffic-"
    "model/back-pressure-sizing numbers): lag() over (type; ts, "
    "event_id — unique tiebreak, or the gaps are nondeterministic) "
    "yields per-event gaps; one aggregate emits count, mean, exact "
    "median and p95 per type.  Second-boundary gap arithmetic matches "
    "the engines' shared floor semantics.",
    tags=("window", "timeseries", "ext"),
    oracle="""
WITH gaps AS (
  SELECT event_type,
         date_diff('second', lag(ts) OVER w, ts) AS gap_s
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
)
SELECT event_type,
       CAST(count(gap_s) AS BIGINT) AS n_gaps,
       round(avg(gap_s), 4) AS mean_gap_s,
       round(quantile_cont(gap_s, 0.5), 4) AS p50_gap_s,
       round(quantile_cont(gap_s, 0.95), 4) AS p95_gap_s
FROM gaps WHERE gap_s IS NOT NULL
GROUP BY event_type ORDER BY event_type
""",
)
def events_inter_arrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = events.select(
        "event_type",
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).alias(
            "gap_s"
        ),
    ).where(F.col("gap_s").isNotNull())
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("gap_s").alias("n_gaps"),
            F.round(F.avg("gap_s"), 4).alias("mean_gap_s"),
            F.round(F.percentile("gap_s", F.lit(0.5)), 4).alias("p50_gap_s"),
            F.round(F.percentile("gap_s", F.lit(0.95)), 4).alias("p95_gap_s"),
        )
        .orderBy("event_type")
    )


@register(
    "scalar_delta_encode_roundtrip",
    doc="Delta encoding ∘ decoding as window algebra (the columnar-"
    "storage primitive, done relationally): per priority, the sorted "
    "key column encodes to first-value + gaps (lag diff) and decodes "
    "back via running sum; the aggregate proves decode(encode(x)) "
    "== x exactly (key checksum + count + max gap as the compression "
    "figure of merit).  Both windows share one partitioning.",
    tags=("scalar", "window", "encoding", "ext"),
    oracle="""
WITH enc AS (
  SELECT o_orderpriority, o_orderkey,
         coalesce(o_orderkey - lag(o_orderkey) OVER w, o_orderkey) AS delta
  FROM orders WHERE o_orderkey IS NOT NULL
  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
),
dec AS (
  SELECT o_orderpriority, o_orderkey,
         sum(delta) OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS rebuilt
  FROM enc
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN rebuilt = o_orderkey THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
       CAST(sum(rebuilt) AS BIGINT) AS rebuilt_sum
FROM dec GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def scalar_delta_encode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey").isNotNull())
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    enc = orders.select(
        "o_orderpriority",
        "o_orderkey",
        F.coalesce(
            F.col("o_orderkey") - F.lag("o_orderkey").over(w), F.col("o_orderkey")
        ).alias("delta"),
    )
    dec = enc.withColumn(
        "rebuilt", F.sum("delta").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        dec.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("rebuilt") == F.col("o_orderkey"), 1).otherwise(0)
            ).alias("n_exact"),
            F.sum("o_orderkey").alias("key_sum"),
            F.sum("rebuilt").alias("rebuilt_sum"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "events_hourly_seasonality",
    doc="Traffic seasonality profile: the (day-of-week × hour) activity "
    "matrix with each cell's share of total — the load-shaping input "
    "for trigger sizing and autoscaling.  One aggregate; the share "
    "divides by a window total over the 168-row result, not a second "
    "scan.  Engine-portable dow (1=Sunday via dayofweek/ISODOW "
    "mapping pinned on both sides).",
    tags=("agg", "timeseries", "ext"),
    oracle="""
WITH cells AS (
  SELECT CAST(isodow(ts) AS BIGINT) AS iso_dow,
         CAST(hour(ts) AS BIGINT) AS hr,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT iso_dow, hr, n_events,
       round(n_events / sum(n_events) OVER (), 6) AS share
FROM cells ORDER BY iso_dow, hr
""",
)
def events_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # Spark dayofweek: 1=Sunday..7=Saturday; ISO dow: 1=Monday..7=Sunday
    iso_dow = ((F.dayofweek("ts") + 5) % 7 + 1).cast("long")
    cells = events.groupBy(
        iso_dow.alias("iso_dow"), F.hour("ts").cast("long").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy()
    return cells.select(
        "iso_dow",
        "hr",
        "n_events",
        F.round(F.col("n_events") / F.sum("n_events").over(w), 6).alias("share"),
    ).orderBy("iso_dow", "hr")


@register(
    "window_ohlc_resample",
    doc="Time-series resampling to OHLC bars (the downsampling shape for "
    "any metered value): per event type and 6-hour bucket — open = "
    "value at the earliest (ts, event_id), close = at the latest, "
    "high/low = extremes, plus volume.  min_by/max_by over the "
    "composite time key give deterministic open/close under same-"
    "timestamp ties; one aggregate, no window, no self-join (the "
    "naive 'join back to first/last row' doubles the scan).",
    tags=("agg", "timeseries", "ohlc", "ext"),
    oracle="""
SELECT event_type,
       CAST(time_bucket(INTERVAL '6 hours', ts) AS TIMESTAMP) AS bar_start,
       round(arg_min(value, lpad(CAST(date_diff('second', TIMESTAMP '1970-01-01', ts) AS VARCHAR), 12, '0')
                            || lpad(CAST(event_id AS VARCHAR), 12, '0')), 4) AS open,
       round(max(value), 4) AS high,
       round(min(value), 4) AS low,
       round(arg_max(value, lpad(CAST(date_diff('second', TIMESTAMP '1970-01-01', ts) AS VARCHAR), 12, '0')
                            || lpad(CAST(event_id AS VARCHAR), 12, '0')), 4) AS close,
       CAST(count(*) AS BIGINT) AS volume
FROM events
GROUP BY event_type, bar_start
ORDER BY event_type, bar_start
""",
)
def window_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bar = F.window("ts", "6 hours")["start"].alias("bar_start")
    tkey = F.concat(
        F.lpad(F.unix_timestamp("ts").cast("string"), 12, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        events.groupBy("event_type", bar)
        .agg(
            F.round(F.min_by("value", tkey), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", tkey), 4).alias("close"),
            F.count(F.lit(1)).alias("volume"),
        )
        .orderBy("event_type", "bar_start")
    )


@register(
    "agg_pareto_concentration",
    doc="Pareto / 80-20 concentration: the smallest customer cohort "
    "covering 80% of revenue.  Facts pre-aggregate to one row per "
    "customer FIRST; the running-share window then orders that "
    "(small) relation by (revenue DESC, custkey) — the unique "
    "tiebreak makes the cutoff row deterministic even under equal "
    "revenues.  Output: cohort size, its customer-share, and the "
    "covered revenue share.",
    tags=("agg", "window", "pareto", "ext"),
    oracle="""
WITH per_cust AS (
  SELECT o_custkey, sum(o_totalprice) AS rev
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT rev,
         sum(rev) OVER (ORDER BY rev DESC, o_custkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_rev,
         sum(rev) OVER () AS total_rev,
         CAST(row_number() OVER (ORDER BY rev DESC, o_custkey) AS BIGINT) AS rn,
         CAST(count(*) OVER () AS BIGINT) AS n_cust
  FROM per_cust
)
SELECT min(rn) AS n_top_customers,
       round(min(rn) / CAST(max(n_cust) AS DOUBLE), 6) AS customer_share,
       round(min(cum_rev / total_rev), 6) AS revenue_share_at_cutoff
FROM ranked WHERE cum_rev / total_rev >= 0.8
""",
)
def agg_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("rev"))
    w_ord = Window.orderBy(F.col("rev").desc(), "o_custkey")
    w_all = Window.partitionBy()
    ranked = per_cust.select(
        "rev",
        F.sum("rev").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum_rev"
        ),
        F.sum("rev").over(w_all).alias("total_rev"),
        F.row_number().over(w_ord).cast("long").alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n_cust"),
    )
    hit = ranked.where(F.col("cum_rev") / F.col("total_rev") >= 0.8)
    return hit.agg(
        F.min("rn").alias("n_top_customers"),
        F.round(F.min("rn") / F.max("n_cust").cast("double"), 6).alias(
            "customer_share"
        ),
        F.round(F.min(F.col("cum_rev") / F.col("total_rev")), 6).alias(
            "revenue_share_at_cutoff"
        ),
    )


@register(
    "join_events_customer_segments",
    doc="Cross-domain enrichment: the event stream LEFT-joined to the "
    "customer dimension (user_id = c_custkey; fixture users are a "
    "customer subset) and profiled per market segment — events, "
    "distinct active users, per-user intensity, value.  Unmatched "
    "traffic would surface as a '(no-customer-record)' segment via "
    "the coalesce (absent when every user matches, so the report "
    "never fabricates empty classes).  Dim broadcasts; one stream-"
    "side shuffle.",
    tags=("join", "events", "ext"),
    oracle="""
SELECT coalesce(c_mktsegment, '(no-customer-record)') AS segment,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_active_users,
       round(count(*) / CAST(count(DISTINCT user_id) AS DOUBLE), 4)
         AS events_per_user,
       round(sum(value), 2) AS total_value
FROM events LEFT JOIN customer ON user_id = c_custkey
GROUP BY segment ORDER BY segment
""",
)
def join_events_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    return (
        events.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            events["user_id"] == customer["c_custkey"],
            "left",
        )
        .groupBy(
            F.coalesce("c_mktsegment", F.lit("(no-customer-record)")).alias("segment")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_active_users"),
            F.round(
                F.count(F.lit(1)) / F.countDistinct("user_id").cast("double"), 4
            ).alias("events_per_user"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("segment")
    )


@register(
    "agg_recency_decay_score",
    doc="Recency-weighted activity score per user (the feature-store "
    "staple): each event contributes value · 0.5^(weeks_old), with "
    "age bucketed to integer weeks against the corpus max timestamp "
    "— pow(0.5, k) on integer k is an exact power of two in IEEE "
    "double, so both engines weight identically and the score is "
    "reproducible (a fractional-exponent decay would differ in the "
    "last ulp across libm implementations).  The anchor max(ts) "
    "broadcasts as a one-row scalar; one aggregate per user.",
    tags=("agg", "timeseries", "feature", "ext"),
    oracle="""
WITH anchor AS (SELECT max(ts) AS mx FROM events),
aged AS (
  SELECT user_id, value,
         CAST(date_diff('second', ts, mx) // 604800 AS BIGINT) AS weeks_old
  FROM events, anchor
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(weeks_old) AS BIGINT) AS oldest_weeks,
       round(sum(value * pow(0.5, weeks_old)), 6) AS decay_score
FROM aged GROUP BY user_id ORDER BY user_id
""",
)
def agg_recency_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    mx = events.agg(F.max("ts").alias("mx"))
    aged = events.crossJoin(F.broadcast(mx)).select(
        "user_id",
        "value",
        F.floor(
            (F.unix_timestamp("mx") - F.unix_timestamp("ts")) / 604800
        ).alias("weeks_old"),
    )
    return (
        aged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("weeks_old").alias("oldest_weeks"),
            # round(6), not 4: value·2^-k has ≤6 decimal digits, so a
            # 4-digit round hits EXACT half-way cases where DuckDB
            # (half-even) and Spark (half-up) disagree; at 6 digits no
            # half-way value exists
            F.round(F.sum(F.col("value") * F.pow(0.5, F.col("weeks_old"))), 6).alias(
                "decay_score"
            ),
        )
        .orderBy("user_id")
    )


@register(
    "scalar_bitmask_flags",
    doc="Flag packing (the warehouse idiom for N booleans in one "
    "integer column): three order predicates pack into a 3-bit mask "
    "(urgent<<2 | open<<1 | high_value), the mask groups the census, "
    "and bit-ops unpack it back — proving pack∘unpack identity on "
    "both engines' bit algebra.  At scale the packed column is 1 "
    "byte vs 3 nullable booleans and filters via a single masked "
    "comparison.",
    tags=("scalar", "bitops", "ext"),
    oracle="""
WITH flagged AS (
  SELECT (CASE WHEN o_orderpriority = '1-URGENT' THEN 4 ELSE 0 END
        | CASE WHEN o_orderstatus = 'O' THEN 2 ELSE 0 END
        | CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS mask
  FROM orders
)
SELECT mask,
       (mask & 4) >> 2 AS is_urgent,
       (mask & 2) >> 1 AS is_open,
       mask & 1 AS is_high_value,
       CAST(count(*) AS BIGINT) AS n_orders
FROM flagged GROUP BY mask ORDER BY mask
""",
)
def scalar_bitmask_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    mask = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 4).otherwise(0).bitwiseOR(
            F.when(F.col("o_orderstatus") == "O", 2).otherwise(0)
        ).bitwiseOR(F.when(F.col("o_totalprice") > 200000, 1).otherwise(0))
    )
    return (
        orders.select(mask.alias("mask"))
        .groupBy("mask")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "mask",
            F.shiftright(F.col("mask").bitwiseAND(4), 2).alias("is_urgent"),
            F.shiftright(F.col("mask").bitwiseAND(2), 1).alias("is_open"),
            F.col("mask").bitwiseAND(1).alias("is_high_value"),
            "n_orders",
        )
        .orderBy("mask")
    )


@register(
    "agg_median_absolute_deviation",
    doc="Median absolute deviation per status (the robust dispersion "
    "partner of the trimmed mean — outlier-immune where stddev is "
    "not): exact per-group median (cent-rounded inputs), broadcast "
    "back, then the median of |x − median| in a second aggregate — "
    "two passes by necessity (MAD is a nested order statistic), both "
    "the same scan shape.  The MAD·1.4826 ≈ σ consistency factor is "
    "emitted alongside for comparison with stddev.",
    tags=("agg", "robust", "ext"),
    oracle="""
WITH med AS (
  SELECT o_orderstatus, quantile_cont(round(o_totalprice, 2), 0.5) AS m
  FROM orders GROUP BY o_orderstatus
)
SELECT o.o_orderstatus,
       round(max(m), 4) AS median_price,
       round(quantile_cont(abs(round(o_totalprice, 2) - m), 0.5), 4) AS mad,
       round(quantile_cont(abs(round(o_totalprice, 2) - m), 0.5) * 1.4826, 4)
         AS mad_sigma,
       round(stddev_samp(o_totalprice), 4) AS stddev
FROM orders o JOIN med ON o.o_orderstatus = med.o_orderstatus
GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus
""",
)
def agg_median_absolute_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    v = F.round("o_totalprice", 2)
    med = orders.groupBy("o_orderstatus").agg(
        F.percentile(v, F.lit(0.5)).alias("m")
    )
    dev = F.abs(v - F.col("m"))
    return (
        orders.join(F.broadcast(med), "o_orderstatus")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.max("m"), 4).alias("median_price"),
            F.round(F.percentile(dev, F.lit(0.5)), 4).alias("mad"),
            F.round(F.percentile(dev, F.lit(0.5)) * 1.4826, 4).alias("mad_sigma"),
            F.round(F.stddev_samp("o_totalprice"), 4).alias("stddev"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "events_cooccurrence_pmi",
    doc="Pointwise mutual information between event-type pairs (basket-"
    "style association mining): per user the distinct type set, "
    "self-joined (a<b) for co-occurrence counts, then PMI = "
    "ln(n·c_ab / (c_a·c_b)) against the per-type user counts — "
    "positive PMI = types travel together.  The pair space is "
    "|types|² regardless of SF; the only big shuffle is the distinct "
    "(user, type) reduction.",
    tags=("agg", "association", "ext"),
    oracle="""
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT count(DISTINCT user_id) AS n_users FROM ut),
singles AS (SELECT event_type, count(*) AS c FROM ut GROUP BY event_type),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS c_ab
  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, CAST(c_ab AS BIGINT) AS n_cousers,
       round(ln(CAST(c_ab AS DOUBLE) * n_users / (sa.c * sb.c)), 6) AS pmi
FROM pairs
JOIN singles sa ON sa.event_type = type_a
JOIN singles sb ON sb.event_type = type_b
CROSS JOIN n
ORDER BY type_a, type_b
""",
)
def events_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    ut = events.select("user_id", "event_type").distinct()
    n_users = ut.select(F.countDistinct("user_id").alias("n_users"))
    singles = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    return (
        pairs.join(
            F.broadcast(singles.select(F.col("event_type").alias("type_a"), F.col("c").alias("ca"))),
            "type_a",
        )
        .join(
            F.broadcast(singles.select(F.col("event_type").alias("type_b"), F.col("c").alias("cb"))),
            "type_b",
        )
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a",
            "type_b",
            F.col("c_ab").alias("n_cousers"),
            F.round(
                F.log(
                    F.col("c_ab").cast("double") * F.col("n_users")
                    / (F.col("ca") * F.col("cb"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "agg_benford_first_digit",
    doc="Benford first-digit census of order values (the forensic "
    "profiling shape for money columns): leading digit extracted by "
    "pure integer/log math — floor(x / 10^floor(log10 x)) — compared "
    "against the expected log10(1 + 1/d) Benford share.  Synthetic "
    "TPC-H prices are NOT Benford-distributed; the deviation columns "
    "make that visible, which is exactly the point of the census.",
    tags=("agg", "profiling", "ext"),
    oracle="""
SELECT CAST(floor(o_totalprice / pow(10, floor(log10(o_totalprice)))) AS BIGINT)
         AS first_digit,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(count(*) / CAST((SELECT count(*) FROM orders WHERE o_totalprice > 0)
                             AS DOUBLE), 6) AS observed_share,
       round(log10(1 + 1.0 / first_digit), 6) AS benford_share
FROM orders WHERE o_totalprice > 0
GROUP BY first_digit ORDER BY first_digit
""",
)
def agg_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    digit = F.floor(
        F.col("o_totalprice") / F.pow(10, F.floor(F.log10("o_totalprice")))
    )
    total = orders.select(F.count(F.lit(1)).alias("t"))
    return (
        orders.groupBy(digit.alias("first_digit"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .crossJoin(F.broadcast(total))
        .select(
            "first_digit",
            "n_orders",
            F.round(F.col("n_orders") / F.col("t").cast("double"), 6).alias(
                "observed_share"
            ),
            F.round(F.log10(1 + 1.0 / F.col("first_digit")), 6).alias(
                "benford_share"
            ),
        )
        .orderBy("first_digit")
    )


@register(
    "join_order_total_consistency",
    doc="Cross-table consistency report (the reconciliation between a "
    "header total and its detail lines — an invariant a CDC replay "
    "must not break): per order, o_totalprice vs the lineitem "
    "sum(extendedprice·(1−discount)·(1+tax)); orders bucket into "
    "consistent (within 1%), drifted, and childless, with the mean "
    "relative gap per status.  Whether the synthetic fixtures honor "
    "the invariant is exactly what the report shows — the operator "
    "is the check, not the assumption.",
    tags=("join", "quality", "ext"),
    oracle="""
WITH detail AS (
  SELECT l_orderkey,
         sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS computed
  FROM lineitem GROUP BY l_orderkey
),
cmp AS (
  SELECT o_orderstatus,
         CASE WHEN computed IS NULL THEN 'childless'
              WHEN abs(computed - o_totalprice) / o_totalprice <= 0.01
                THEN 'consistent'
              ELSE 'drifted' END AS bucket,
         CASE WHEN computed IS NOT NULL
              THEN abs(computed - o_totalprice) / o_totalprice END AS rel_gap
  FROM orders LEFT JOIN detail ON o_orderkey = l_orderkey
)
SELECT o_orderstatus, bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(avg(rel_gap), 6) AS mean_rel_gap
FROM cmp GROUP BY o_orderstatus, bucket
ORDER BY o_orderstatus, bucket
""",
)
def join_order_total_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    detail = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.sum(
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax"))
        ).alias("computed")
    )
    j = orders.join(detail, "o_orderkey", "left")
    rel_gap = F.abs(F.col("computed") - F.col("o_totalprice")) / F.col("o_totalprice")
    bucket = (
        F.when(F.col("computed").isNull(), "childless")
        .when(rel_gap <= 0.01, "consistent")
        .otherwise("drifted")
    )
    return (
        j.select(
            "o_orderstatus",
            bucket.alias("bucket"),
            F.when(F.col("computed").isNotNull(), rel_gap).alias("rel_gap"),
        )
        .groupBy("o_orderstatus", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("rel_gap"), 6).alias("mean_rel_gap"),
        )
        .orderBy("o_orderstatus", "bucket")
    )


@register(
    "agg_churn_transitions",
    doc="Month-over-month customer state transitions (the growth-"
    "accounting matrix): per (customer, month) activity reduces the "
    "fact table once; lag over each customer's month series then "
    "classifies every active month as new (no prior month) / "
    "retained (consecutive) / resurrected (gap), and the month-level "
    "rollup emits the transition counts a growth dashboard plots.  "
    "Churn is the complement (prior month active, this one not) — "
    "computed from the same lag without a calendar cross join.",
    tags=("agg", "retention", "ext"),
    oracle="""
WITH cm AS (
  SELECT DISTINCT o_custkey, year(o_orderdate) * 12 + month(o_orderdate) AS mi
  FROM orders
),
lagged AS (
  SELECT o_custkey, mi,
         lag(mi) OVER (PARTITION BY o_custkey ORDER BY mi) AS prev_mi
  FROM cm
)
SELECT mi,
       CAST(count(*) FILTER (WHERE prev_mi IS NULL) AS BIGINT) AS n_new,
       CAST(count(*) FILTER (WHERE prev_mi = mi - 1) AS BIGINT) AS n_retained,
       CAST(count(*) FILTER (WHERE prev_mi IS NOT NULL AND prev_mi < mi - 1)
            AS BIGINT) AS n_resurrected
FROM lagged GROUP BY mi ORDER BY mi
""",
)
def agg_churn_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cm = orders.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mi"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("mi")
    lagged = cm.withColumn("prev_mi", F.lag("mi").over(w))
    return (
        lagged.groupBy("mi")
        .agg(
            F.sum(F.col("prev_mi").isNull().cast("long")).alias("n_new"),
            # when prev_mi is NULL the equality is NULL, and sum() over
            # all-NULL yields NULL, not 0 — route through when/otherwise
            F.sum(
                F.when(F.col("prev_mi") == F.col("mi") - 1, 1).otherwise(0)
            ).alias("n_retained"),
            F.sum(
                (F.col("prev_mi").isNotNull() & (F.col("prev_mi") < F.col("mi") - 1))
                .cast("long")
            ).alias("n_resurrected"),
        )
        .orderBy("mi")
    )


@register(
    "events_burst_detection",
    doc="Burst detection: minute-bucket counts per event type, flagged "
    "where the bucket exceeds mean + 3σ of that type's bucket "
    "distribution — the rate-anomaly complement of the value-anomaly "
    "z-score entry.  Two tiny aggregates (buckets, then per-type "
    "moments broadcast back); the fact table is scanned once.",
    tags=("agg", "anomaly", "timeseries", "ext"),
    oracle="""
WITH buckets AS (
  SELECT event_type, time_bucket(INTERVAL '1 minute', ts) AS minute,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, avg(n) AS mu, stddev_samp(n) AS sigma
  FROM buckets GROUP BY event_type
)
SELECT b.event_type, CAST(b.minute AS TIMESTAMP) AS minute,
       CAST(n AS BIGINT) AS n_events,
       round((n - mu) / sigma, 4) AS burst_z
FROM buckets b JOIN stats s ON b.event_type = s.event_type
WHERE n > mu + 3 * sigma
ORDER BY b.event_type, minute
""",
)
def events_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    buckets = events.groupBy(
        "event_type", F.window("ts", "1 minute")["start"].alias("minute")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = buckets.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sigma")
    )
    return (
        buckets.join(F.broadcast(stats), "event_type")
        .where(F.col("n") > F.col("mu") + 3 * F.col("sigma"))
        .select(
            "event_type",
            "minute",
            F.col("n").alias("n_events"),
            F.round((F.col("n") - F.col("mu")) / F.col("sigma"), 4).alias("burst_z"),
        )
        .orderBy("event_type", "minute")
    )


@register(
    "window_peak_drawdown",
    doc="Running-peak drawdown (the financial risk shape applied to a "
    "revenue series): per nation's monthly revenue, the running max "
    "and the percentage below it — aggregate to the month grain "
    "first, window second (same agg-then-window discipline as the "
    "EWMA/MoM entries; the fact table never enters a window).  Money "
    "in cents for the comparison; the drawdown ratio rounds last.",
    tags=("window", "timeseries", "ext"),
    oracle="""
WITH monthly AS (
  SELECT n_name, year(o_orderdate)*100 + month(o_orderdate) AS mkey,
         round(sum(o_totalprice), 2) AS rev
  FROM orders
  JOIN customer ON c_custkey = o_custkey
  JOIN nation   ON n_nationkey = c_nationkey
  GROUP BY n_name, mkey
)
SELECT n_name, mkey, rev,
       round(max(rev) OVER w, 2) AS peak,
       round((max(rev) OVER w - rev) / max(rev) OVER w, 6) AS drawdown
FROM monthly
WINDOW w AS (PARTITION BY n_name ORDER BY mkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY n_name, mkey
""",
)
def window_peak_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    monthly = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .groupBy(
            "n_name",
            (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("mkey"),
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    w = (
        Window.partitionBy("n_name")
        .orderBy("mkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    peak = F.max("rev").over(w)
    return monthly.select(
        "n_name",
        "mkey",
        "rev",
        F.round(peak, 2).alias("peak"),
        F.round((peak - F.col("rev")) / peak, 6).alias("drawdown"),
    ).orderBy("n_name", "mkey")


@register(
    "scalar_surrogate_key_mint",
    doc="Deterministic surrogate-key minting (the idempotent-id "
    "requirement of any replayable pipeline: the same natural key "
    "must mint the same surrogate on every run, every engine): a "
    "UUID-shaped id assembled from the md5 of the qualified natural "
    "key — pure string algebra, no uuid() randomness (which would "
    "break replay idempotence and the oracle alike).  The distinct "
    "count proves injectivity over the fixture keyspace.",
    tags=("scalar", "keys", "ext"),
    oracle="""
WITH minted AS (
  SELECT o_orderkey,
         md5('tpch.orders#' || CAST(o_orderkey AS VARCHAR)) AS h
  FROM orders WHERE o_orderkey IS NOT NULL
),
formed AS (
  SELECT o_orderkey,
         substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-' || substr(h, 13, 4)
           || '-' || substr(h, 17, 4) || '-' || substr(h, 21, 12) AS sk
  FROM minted
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT sk) AS BIGINT) AS n_distinct_sk,
       min(sk) AS min_sk, max(sk) AS max_sk
FROM formed
""",
)
def scalar_surrogate_key_mint(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey").isNotNull())
    h = F.md5(F.concat(F.lit("tpch.orders#"), F.col("o_orderkey").cast("string")))
    sk = F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )
    return orders.select(sk.alias("sk")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("sk").alias("n_distinct_sk"),
        F.min("sk").alias("min_sk"),
        F.max("sk").alias("max_sk"),
    )


@register(
    "sql_api_topk_per_group_qualify",
    doc="Pure-SQL surface for the per-group top-k pattern (W6): CTE + "
    "window + rank predicate through spark.sql over registered views — "
    "Catalyst rewrites the rank filter into WindowGroupLimit exactly as "
    "the DataFrame spelling does, proving the two front ends share one "
    "physical plan space.",
    tags=("sql", "window", "ext"),
    oracle="""
WITH ranked AS (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
)
SELECT o_orderpriority, o_orderkey, o_totalprice, rnk
FROM ranked WHERE rnk <= 3
ORDER BY o_orderpriority, rnk
""",
)
def sql_api_topk_per_group_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH ranked AS (
          SELECT o_orderpriority, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rnk
          FROM orders
        )
        SELECT o_orderpriority, o_orderkey, o_totalprice, rnk
        FROM ranked WHERE rnk <= 3
        ORDER BY o_orderpriority, rnk
        """
    )


@register(
    "join_asof_forward_backfill",
    doc="Forward AS-OF join (J6, the late-arriving-dimension backfill "
    "direction): for each event, the customer's FIRST order at or after "
    "the event time.  Same scalable union + one-window spelling as the "
    "backward as-of (no range cross-join, one shuffle) but with a "
    "following-frame first(ignorenulls); the oracle recomputes via a "
    "range join + min aggregation, so the two formulations check each "
    "other.",
    tags=("join", "asof", "ext"),
    oracle="""
WITH ded AS (
  SELECT o_custkey, o_orderdate, min(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
), nxt AS (
  SELECT e.event_id, e.user_id, min(o.o_orderdate) AS nd
  FROM events e JOIN ded o
    ON o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
  GROUP BY e.event_id, e.user_id
)
SELECT n.event_id, n.user_id, d.o_orderkey AS next_orderkey
FROM nxt n JOIN ded d ON d.o_custkey = n.user_id AND d.o_orderdate = n.nd
ORDER BY n.event_id
""",
)
def join_asof_forward_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    ded = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.min("o_orderkey").alias("o_orderkey")
    )
    right = ded.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(2).alias("kind"),  # orders sort after events at equal t (>= inclusive)
        F.col("o_orderkey").alias("orderkey"),
        F.lit(None).cast("long").alias("event_id"),
    )
    left = events.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("orderkey"),
        "event_id",
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "kind")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        right.unionByName(left)
        .withColumn("next_orderkey", F.first("orderkey", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .filter(F.col("next_orderkey").isNotNull())
        .select("event_id", F.col("k").alias("user_id"), "next_orderkey")
        .orderBy("event_id")
    )
