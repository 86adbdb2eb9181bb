"""Remaining TPC-H query shapes (Q2, Q6-Q10, Q12, Q15, Q16, Q18-Q21),
adapted to the fixture schema.

The fixtures lack ``partsupp``, ``l_commitdate``/``l_receiptdate``/
``l_shipmode`` and the TPC-H text columns, so each query keeps the
*plan shape* that makes the original interesting (decorrelation,
disjunctive pushdown, groupBy-as-semijoin, multi-EXISTS) while swapping
in available columns:

* partsupp        -> per-(l_partkey, l_suppkey) aggregates of lineitem
* ps_supplycost   -> p_retailprice (scaled) as the unit-cost proxy
* l_commitdate    -> "late" := l_shipdate > o_orderdate + N days
* l_shipmode      -> l_linestatus / o_orderpriority buckets

Cross-engine determinism follows the catalog conventions: aggregates
rounded identically on both sides, integral-double sums (quantities)
compared exactly, double equality only between values drawn from the
same source column (min/max of a set is engine-order independent).

Reference parity note: the reference system (dlf412/mysql-cdc-redis)
has no relational query engine — these rows are the EXT surface of
SURVEY.md §2 (A6/J5/W6 breadth), required by the driver contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .catalog import register

# ---------------------------------------------------------------------------
# Q2: min-cost supplier — correlated-min subquery decorrelated to an
# aggregate + equality self-join
# ---------------------------------------------------------------------------


@register(
    "subquery_min_price_supplier",
    doc="TPC-H Q2 shape without partsupp: the supplier-part price list is "
    "derived as min(l_extendedprice) per (part, supplier); the correlated "
    "min-cost subquery decorrelates into a per-part min + equality join. "
    "Double equality is safe because both sides are min() over the same "
    "column (no accumulation => no cross-engine ulp drift).  Dim joins "
    "(part/supplier/nation/region) broadcast; the only shuffles are the "
    "two aggregates, which share the l_partkey clustering.",
    tags=("subquery", "join", "tpch", "ext"),
    oracle="""
WITH ps AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS min_price
  FROM lineitem GROUP BY 1, 2
), best AS (
  SELECT l_partkey, min(min_price) AS best_price FROM ps GROUP BY 1
)
SELECT s.s_name, n.n_name, p.p_partkey, round(ps.min_price, 2) AS best_price
FROM ps
JOIN best ON ps.l_partkey = best.l_partkey AND ps.min_price = best.best_price
JOIN part p ON p.p_partkey = ps.l_partkey
           AND p.p_size <= 15 AND p.p_type = 'STANDARD'
JOIN supplier s ON s.s_suppkey = ps.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
ORDER BY p.p_partkey, s.s_name
""",
)
def subquery_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")

    # one explicit shuffle by l_partkey: HashPartitioning(l_partkey)
    # satisfies ClusteredDistribution for BOTH the (partkey, suppkey)
    # aggregate and the per-part window, so neither re-shuffles
    ps = (
        li.select("l_partkey", "l_suppkey", "l_extendedprice")
        .repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("min_price"))
    )
    w = Window.partitionBy("l_partkey")
    best = ps.withColumn("best_price_raw", F.min("min_price").over(w)).filter(
        F.col("min_price") == F.col("best_price_raw")
    )
    euro_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    return (
        best.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(euro_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_name",
            "n_name",
            "p_partkey",
            F.round(F.col("min_price"), 2).alias("best_price"),
        )
        .orderBy("p_partkey", "s_name")
    )


# ---------------------------------------------------------------------------
# Q6: forecast revenue change — pure scan-side filter + single aggregate
# ---------------------------------------------------------------------------


@register(
    "agg_revenue_uplift",
    doc="TPC-H Q6: the canonical 'does the filter reach the scan' probe — "
    "three range predicates all push to parquet (PushedFilters), one "
    "partial+final aggregate, zero joins.  At 100 TB this is the "
    "min-possible-cost query: IO x selectivity, no shuffle beyond the "
    "1-row final combine.",
    tags=("agg", "scan", "tpch", "ext"),
    bench=False,
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue_uplift,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def agg_revenue_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue_uplift"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Q7: volume shipping between a nation pair — double-dimension star join
# ---------------------------------------------------------------------------


@register(
    "join_volume_shipping_pair",
    doc="TPC-H Q7 shape: revenue flowing between two nations in either "
    "direction, per (supp_nation, cust_nation, year).  Two independent "
    "broadcast dimension arms (supplier-side and customer-side nation) "
    "hang off the lineitem⋈orders fact join; the pair filter applies "
    "after both arms resolve.  Only the fact-fact join shuffles.",
    tags=("join", "tpch", "ext"),
    oracle="""
SELECT n2.n_name AS supp_nation,
       n1.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
  AND ((n2.n_name = 'NATION_3' AND n1.n_name = 'NATION_7')
    OR (n2.n_name = 'NATION_7' AND n1.n_name = 'NATION_3'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
""",
)
def join_volume_shipping_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    pair = (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7") | (
        F.col("supp_nation") == "NATION_7"
    ) & (F.col("cust_nation") == "NATION_3")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8: market share — conditional-sum ratio inside a year partition
# ---------------------------------------------------------------------------


@register(
    "agg_market_share",
    doc="TPC-H Q8 shape: one nation's share of ECONOMY-part revenue sold "
    "into ASIA customers, per order year.  The case-when numerator and "
    "plain denominator come from ONE aggregate pass (no double scan); "
    "ratio rounded to 4dp on both engines.",
    tags=("agg", "join", "tpch", "ext"),
    oracle="""
SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
       round(sum(CASE WHEN n2.n_name = 'NATION_5'
                      THEN l.l_extendedprice * (1 - l.l_discount)
                      ELSE 0.0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS mkt_share
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = n1.n_regionkey AND r.r_name = 'ASIA'
JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_type = 'ECONOMY'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
GROUP BY 1
ORDER BY 1
""",
)
def agg_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    asia_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("c_nkey"))
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("c_nkey"), "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9: product-type profit — cost proxy from the part dimension
# ---------------------------------------------------------------------------


@register(
    "agg_product_profit",
    doc="TPC-H Q9 shape with p_retailprice standing in for ps_supplycost "
    "(no partsupp in the fixtures): profit per (supplier nation, ship "
    "year) over parts whose name contains 'gear'.  The LIKE filter "
    "prunes the broadcast part dim before the fact join.",
    tags=("agg", "join", "tpch", "ext"),
    oracle="""
-- per-term quantization to exact 1e-4 units, summed as BIGINT: a plain
-- sum(double) is summation-order-dependent, and at sf1 row counts the
-- accumulated ulp drift crosses the cent-rounding cliff (engine .43 vs
-- oracle .42).  floor(x*1e4+0.5) / the final floor(x*100+0.5)/100 are
-- the same IEEE ops on both sides (SCALING.md round-2 rounding idiom).
SELECT n.n_name AS nation,
       CAST(year(l.l_shipdate) AS INT) AS o_year,
       floor(sum(CAST(floor((l.l_extendedprice * (1 - l.l_discount)
                 - 0.5 * p.p_retailprice * l.l_quantity / 100.0)
                 * 10000 + 0.5) AS BIGINT)) / 10000.0 * 100 + 0.5) / 100
         AS sum_profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%gear%'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def agg_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.5 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity") / 100.0
    # exact 1e-4-unit integer summation: sum(double) is summation-order-
    # dependent and crosses the cent cliff at sf1 row counts (see oracle)
    profit_u4 = F.floor(profit * 10000 + 0.5).cast("long")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("o_year"),
        )
        .agg(
            (
                F.floor(F.sum(profit_u4) / 10000.0 * 100 + 0.5) / 100
            ).alias("sum_profit")
        )
        .orderBy("nation", "o_year")
    )


# ---------------------------------------------------------------------------
# Q10: returned-item top customers — ranked aggregate with dim enrichment
# ---------------------------------------------------------------------------


@register(
    "join_returned_items_topk",
    doc="TPC-H Q10: top-20 customers by revenue lost to returns in one "
    "quarter.  The per-customer aggregate shuffles once; the nation "
    "name broadcasts; TakeOrderedAndProject handles the limit without "
    "a global sort.  Ordering keys (rounded revenue, custkey) are "
    "cross-engine stable.",
    tags=("join", "agg", "topk", "tpch", "ext"),
    oracle="""
SELECT c.c_custkey, c.c_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       round(c.c_acctbal, 2) AS c_acctbal,
       n.n_name
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
)
def join_returned_items_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cust.select("c_custkey", "c_name", "c_acctbal", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round(F.col("c_acctbal"), 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12: late-shipment priority counts — conditional aggregation over a join
# ---------------------------------------------------------------------------


@register(
    "agg_late_priority_counts",
    doc="TPC-H Q12 shape ('late' := shipped > 60 days after order, standing "
    "in for the missing commit/receipt dates; l_linestatus standing in "
    "for l_shipmode): per line status, how many late lines belonged to "
    "high-priority vs other orders.  One fact-fact join, conditional "
    "counts folded into a single aggregate.",
    tags=("agg", "join", "tpch", "ext"),
    oracle="""
SELECT l.l_linestatus,
       sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS high_line_count,
       sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
GROUP BY 1
ORDER BY 1
""",
)
def agg_late_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# ---------------------------------------------------------------------------
# Q15: top supplier — aggregate, broadcast the max back, equality filter
# ---------------------------------------------------------------------------


@register(
    "subquery_top_supplier_revenue",
    doc="TPC-H Q15: per-supplier quarterly revenue, then keep the "
    "supplier(s) achieving the max.  The 'view + scalar subquery' "
    "decorrelates to one aggregate and a broadcast 1-row max joined "
    "back on equality of the ROUNDED revenue (rounding first makes the "
    "equality cross-engine deterministic).",
    tags=("subquery", "agg", "tpch", "ext"),
    oracle="""
WITH rev AS (
  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, rev.total_rev
FROM rev
JOIN supplier s ON s.s_suppkey = rev.l_suppkey
WHERE rev.total_rev = (SELECT max(total_rev) FROM rev)
ORDER BY s.s_suppkey
""",
)
def subquery_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_rev"
        )
    )
    max_rev = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16: supplier variety per part profile — count-distinct with a NOT-IN arm
# ---------------------------------------------------------------------------


@register(
    "agg_supplier_variety",
    doc="TPC-H Q16 shape (lineitem stands in for partsupp): distinct "
    "supplier count per (brand, type, size) over a filtered part "
    "profile, excluding suppliers with negative balance (the "
    "'complaints' NOT-IN arm -> broadcast anti join on a tiny "
    "blacklist).  count(distinct) expands partially on the mapper "
    "(two-phase distinct aggregate).",
    tags=("agg", "anti", "tpch", "ext"),
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
""",
)
def agg_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    blacklist = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    return (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(blacklist), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q18: large-volume orders — groupBy-as-semijoin back onto the fact
# ---------------------------------------------------------------------------


@register(
    "join_large_volume_orders",
    doc="TPC-H Q18: orders whose total quantity exceeds 300.  The HAVING "
    "subquery becomes a quantity aggregate reused BOTH as the semijoin "
    "filter and as the output column (no second scan of lineitem).  "
    "Quantity sums are integral doubles, so the threshold compare and "
    "the emitted sum are exact on both engines.",
    tags=("join", "agg", "subquery", "tpch", "ext"),
    oracle="""
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       round(o.o_totalprice, 2) AS o_totalprice, big.sum_qty
FROM big
JOIN orders o   ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
""",
)
def join_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    )


# ---------------------------------------------------------------------------
# Q19: disjunctive predicate brackets — OR-of-conjuncts pushdown probe
# ---------------------------------------------------------------------------


@register(
    "join_disjunctive_brackets",
    doc="TPC-H Q19: revenue from three OR-ed (brand, size, quantity) "
    "brackets.  Catalyst splits the disjunction: the part-only conjuncts "
    "prune the broadcast dim, the lineitem-only bounds (quantity range "
    "union) push to the parquet scan, and the residual OR evaluates "
    "post-join — the classic 'does the optimizer tear apart an OR' "
    "probe.",
    tags=("join", "scan", "tpch", "ext"),
    oracle="""
SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def join_disjunctive_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")

    def bracket(brand: str, max_size: int, qlo: float, qhi: float) -> F.Column:
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, max_size)
            & F.col("l_quantity").between(qlo, qhi)
        )

    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            bracket("Brand#12", 5, 1, 11)
            | bracket("Brand#23", 10, 10, 20)
            | bracket("Brand#34", 15, 20, 30)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q20: excess-volume suppliers — nested-IN chain as semijoins, relative
# threshold via broadcast scalar
# ---------------------------------------------------------------------------


@register(
    "subquery_excess_volume_suppliers",
    doc="TPC-H Q20 shape: suppliers who moved an outsized volume of "
    "'small…' parts.  The nested IN chain (parts -> partsupp -> "
    "suppliers) becomes: filter part dim, aggregate lineitem per "
    "(supplier, part), keep pairs above 3x the average pair volume "
    "(scale-invariant relative threshold; the avg is exact on both "
    "engines because quantity sums are integral), then semijoin the "
    "supplier dim.  Two broadcasts, one shuffle.",
    tags=("subquery", "semi", "agg", "tpch", "ext"),
    oracle="""
WITH pairs AS (
  SELECT l.l_suppkey, l.l_partkey, sum(l.l_quantity) AS qty
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE 'small%'
  GROUP BY 1, 2
), thresh AS (
  SELECT 3.0 * sum(qty) / count(*) AS cutoff FROM pairs
)
SELECT s.s_suppkey, s.s_name, round(s.s_acctbal, 2) AS s_acctbal
FROM supplier s
WHERE s.s_suppkey IN (SELECT l_suppkey FROM pairs, thresh WHERE qty > cutoff)
ORDER BY s.s_suppkey
""",
)
def subquery_excess_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey", "l_quantity")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    pairs = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    thresh = pairs.agg((3.0 * F.sum("qty") / F.count(F.lit(1))).alias("cutoff"))
    excess = (
        pairs.crossJoin(F.broadcast(thresh))
        .filter(F.col("qty") > F.col("cutoff"))
        .select("l_suppkey")
    )
    return (
        supp.join(excess, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", F.round(F.col("s_acctbal"), 2).alias("s_acctbal"))
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q21: suppliers who alone were late — multi-EXISTS via per-order stats
# ---------------------------------------------------------------------------


@register(
    "join_sole_late_supplier",
    doc="TPC-H Q21 shape ('late' := shipped > 90 days after order date): "
    "for finalized orders with >1 distinct supplier where EXACTLY ONE "
    "supplier shipped late, count each such supplier's late lines.  "
    "The EXISTS / NOT-EXISTS pair decorrelates into one per-order "
    "aggregate (distinct suppliers, distinct late suppliers) joined "
    "back to the late lines — one pass over lineitem instead of three "
    "correlated scans.  The oracle keeps the textbook EXISTS form to "
    "prove the rewrite is semantics-preserving.",
    tags=("join", "subquery", "exists", "tpch", "ext"),
    oracle="""
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
""",
)
def join_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    # single pass: the per-order distinct-supplier stats ride a window on
    # the same l_orderkey clustering the join already shuffled into, so
    # lineitem is scanned ONCE (vs the textbook three correlated scans)
    w = Window.partitionBy("l_orderkey")
    lines = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("is_late", late)
        .withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supp",
            F.size(F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey"))).over(w)),
        )
    )
    return (
        lines.filter(F.col("is_late") & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )
