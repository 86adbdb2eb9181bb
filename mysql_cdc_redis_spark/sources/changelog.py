"""Synthetic CDC changelog source (FIXTURES.md §B).

Models the annotated binlog row stream of the reference (cdc.py:60-74):
one row per binlog row event with system columns ``cdc_action`` /
``cdc_ts`` (cdc.py:65-72), a monotonic ``seq`` standing in for binlog
position (cdc.py:134), and the full after-image of the row (the
reference drops before-images, cdc.py:66-67).

The changelog is *derived deterministically from the fixture tables*:
the SQL templates below reconstruct the event stream on the DuckDB
oracle side, and the Spark builders at the bottom of this module build
the exact same rows as a single-pass explode plan — so the comparison
exercises only the operator under test (compaction), not the fixture
generator.  (The templates are DuckDB-only: they carry AS MATERIALIZED
planner hints — without them DuckDB inlines ``base`` into each UNION
branch and re-executes the multi-million-row dedup 4x per oracle at
sf1.  Spark never parses them.)

Scenario per key, chosen by ``pk mod 10`` — drawn so every cell of the
reference's 3x3 action-pair merge table (rcache.py:196-222) is hit:

  k=0,1 : [insert]                      -> insert
  k=2   : [insert, delete, insert]      -> insert   (epoch reset after annihilation)
  k=3   : [insert, update]              -> insert   (insert+update->insert)
  k=4   : [insert, delete]              -> GONE     (annihilation, rcache.py:214-215)
  k=5   : [update, update]              -> update
  k=6   : [delete, insert]              -> update   (rcache.py:216-217)
  k=7   : [update, insert]              -> update   ("maybe truncate", rcache.py:218-221)
  k=8   : [insert, update, delete]      -> GONE
  k=9   : [delete]                      -> delete   (tombstone survives)

plus, for keys with ``pk % 97 == 0``, one extra event with a NULL pk —
the SaveIgnore reject path (rcache.py:242-245).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .tables import load_table

# Shared CASE expressions (dialect-neutral).
_ACTION0 = (
    "CASE WHEN k <= 4 OR k = 8 THEN 'insert' "
    "WHEN k IN (5, 7) THEN 'update' ELSE 'delete' END"
)
_ACTION1 = (
    "CASE WHEN k IN (2, 4) THEN 'delete' "
    "WHEN k IN (3, 5, 8) THEN 'update' ELSE 'insert' END"
)
_ACTION2 = "CASE WHEN k = 2 THEN 'insert' ELSE 'delete' END"


ORDERS_CHANGELOG_SQL = f"""
WITH base AS MATERIALIZED (
  -- MATERIALIZED (DuckDB-only planner hint; this template is never run
  -- through Spark SQL — the Spark side builds the same rows with the
  -- explode plan below): base is referenced by all three ev branches
  -- plus the null-pk branch, and inlining re-scans orders 4x per oracle
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
         CAST(o_orderkey % 10 AS INT) AS k
  FROM orders
),
ev AS (
  SELECT 0 AS e, {_ACTION0} AS cdc_action,
         o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM base
  UNION ALL
  SELECT 1 AS e, {_ACTION1} AS cdc_action,
         o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM base WHERE k BETWEEN 2 AND 8
  UNION ALL
  SELECT 2 AS e, {_ACTION2} AS cdc_action,
         o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM base WHERE k IN (2, 8)
)
SELECT CAST(o_orderkey * 4 + e AS BIGINT) AS seq,
       'tpch' AS db, 'orders' AS tbl, cdc_action,
       o_orderdate AS cdc_ts,
       o_orderkey, o_custkey, o_orderstatus,
       round(o_totalprice + 7.0 * e, 2) AS o_totalprice,
       o_orderdate, o_orderpriority
FROM ev
UNION ALL
SELECT CAST(o_orderkey * 4 + 3 AS BIGINT) AS seq,
       'tpch' AS db, 'orders' AS tbl, 'insert' AS cdc_action,
       o_orderdate AS cdc_ts,
       CAST(NULL AS BIGINT) AS o_orderkey, o_custkey, o_orderstatus,
       o_totalprice, o_orderdate, o_orderpriority
FROM base WHERE o_orderkey % 97 = 0
"""

# Composite-key changelog over lineitem: pk = (l_orderkey, l_linenumber),
# the concat_ws("&", ...) rid test case (rcache.py:186-193).
LINEITEM_CHANGELOG_SQL = f"""
WITH base0 AS (
  -- the fixture's (l_orderkey, l_linenumber) is not unique; collapse to
  -- one deterministic row per composite key so seq stays unique
  SELECT l_orderkey, l_linenumber,
         max(l_partkey) AS l_partkey, max(l_suppkey) AS l_suppkey,
         max(l_quantity) AS l_quantity, max(l_extendedprice) AS l_extendedprice,
         max(l_returnflag) AS l_returnflag, max(l_shipdate) AS l_shipdate
  FROM lineitem
  GROUP BY l_orderkey, l_linenumber
),
base AS MATERIALIZED (
  -- MATERIALIZED: inlined, DuckDB re-executes base0's 6M-row dedup
  -- GROUP BY once per referencing branch (4x per oracle) at sf1
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
         l_extendedprice, l_returnflag, l_shipdate,
         CAST((l_orderkey * 7 + l_linenumber) % 10 AS INT) AS k
  FROM base0
),
ev AS (
  SELECT 0 AS e, {_ACTION0} AS cdc_action,
         l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
         l_extendedprice, l_returnflag, l_shipdate
  FROM base
  UNION ALL
  SELECT 1 AS e, {_ACTION1} AS cdc_action,
         l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
         l_extendedprice, l_returnflag, l_shipdate
  FROM base WHERE k BETWEEN 2 AND 8
  UNION ALL
  SELECT 2 AS e, {_ACTION2} AS cdc_action,
         l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
         l_extendedprice, l_returnflag, l_shipdate
  FROM base WHERE k IN (2, 8)
)
SELECT CAST((l_orderkey * 10 + l_linenumber) * 4 + e AS BIGINT) AS seq,
       'tpch' AS db, 'lineitem' AS tbl, cdc_action,
       l_shipdate AS cdc_ts,
       l_orderkey, l_linenumber, l_partkey, l_suppkey,
       round(l_quantity + 1.0 * e, 2) AS l_quantity,
       l_extendedprice, l_returnflag, l_shipdate
FROM ev
UNION ALL
SELECT CAST((l_orderkey * 10 + l_linenumber) * 4 + 3 AS BIGINT) AS seq,
       'tpch' AS db, 'lineitem' AS tbl, 'insert' AS cdc_action,
       l_shipdate AS cdc_ts,
       l_orderkey, CAST(NULL AS INT) AS l_linenumber, l_partkey, l_suppkey,
       l_quantity, l_extendedprice, l_returnflag, l_shipdate
FROM base WHERE (l_orderkey * 7 + l_linenumber) % 97 = 0
"""

# Payload (after-image) columns carried by each changelog, excluding the
# system columns seq/db/tbl/cdc_action.  cdc_ts rides with the payload:
# the reference stores it inside the row hash (cdc.py:72), so the merged
# row keeps the *last* event's timestamp.
ORDERS_PK = ("o_orderkey",)
ORDERS_PAYLOAD = (
    "cdc_ts",
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)
LINEITEM_PK = ("l_orderkey", "l_linenumber")
LINEITEM_PAYLOAD = (
    "cdc_ts",
    "l_orderkey",
    "l_linenumber",
    "l_partkey",
    "l_suppkey",
    "l_quantity",
    "l_extendedprice",
    "l_returnflag",
    "l_shipdate",
)


# ---------------------------------------------------------------------------
# Spark-side builders.  Same rows as the SQL templates above (equality is
# oracle-checked), but built as a single-pass explode plan: the UNION
# template would re-execute the base scan (and, for lineitem, the dedup
# GROUP BY) once per branch — 4 scans instead of 1 at 100 TB.
# ---------------------------------------------------------------------------

from pyspark.sql import Column  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _scenario_events(k: Column, extra_pred: Column) -> Column:
    """Array of (e, act) event structs for scenario k (nulls filtered):
    the explode-form of the _ACTION0/1/2 + null-pk UNION branches."""
    a0 = (
        F.when((k <= 4) | (k == 8), F.lit("insert"))
        .when(k.isin(5, 7), F.lit("update"))
        .otherwise(F.lit("delete"))
    )
    a1 = (
        F.when(k.isin(2, 4), F.lit("delete"))
        .when(k.isin(3, 5, 8), F.lit("update"))
        .otherwise(F.lit("insert"))
    )
    a2 = F.when(k == 2, F.lit("insert")).otherwise(F.lit("delete"))
    evs = F.array(
        F.struct(F.lit(0).alias("e"), a0.alias("act")),
        F.when((k >= 2) & (k <= 8), F.struct(F.lit(1).alias("e"), a1.alias("act"))),
        F.when(k.isin(2, 8), F.struct(F.lit(2).alias("e"), a2.alias("act"))),
        F.when(extra_pred, F.struct(F.lit(3).alias("e"), F.lit("insert").alias("act"))),
    )
    return F.filter(evs, lambda x: x.isNotNull())


def orders_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The explode + wide event projection below fuse into the scan
    # stage; a single-row-group fixture file scans as ONE task, pinning
    # the whole synthesis to one core of the box (guide §2.5 "input
    # skew: one huge unsplittable file — repartition immediately after
    # the read").  ensure_min_parallelism is a no-op whenever the scan
    # already has enough splits, i.e. on any real multi-file changelog.
    from ..operators.scale import ensure_min_parallelism

    o = ensure_min_parallelism(load_table(spark, sf_dir, "orders"))
    k = (F.col("o_orderkey") % 10).cast("int")
    ev = o.withColumn("ev", F.explode(_scenario_events(k, F.col("o_orderkey") % 97 == 0)))
    e = F.col("ev.e")
    return ev.select(
        (F.col("o_orderkey") * 4 + e).cast("long").alias("seq"),
        F.lit("tpch").alias("db"),
        F.lit("orders").alias("tbl"),
        F.col("ev.act").alias("cdc_action"),
        F.col("o_orderdate").alias("cdc_ts"),
        F.when(e == 3, F.lit(None).cast("long")).otherwise(F.col("o_orderkey")).alias(
            "o_orderkey"
        ),
        "o_custkey",
        "o_orderstatus",
        F.when(e == 3, F.col("o_totalprice"))
        .otherwise(F.round(F.col("o_totalprice") + 7.0 * e, 2))
        .alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )


def lineitem_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same single-split rescue as orders_changelog: without it the
    # dedup groupBy's PARTIAL aggregate (600k rows at sf0.1) runs inside
    # the one-task scan stage — measured as ~1 s of the synthesis wall
    from ..operators.scale import ensure_min_parallelism

    li = ensure_min_parallelism(load_table(spark, sf_dir, "lineitem"))
    base = li.groupBy("l_orderkey", "l_linenumber").agg(
        F.max("l_partkey").alias("l_partkey"),
        F.max("l_suppkey").alias("l_suppkey"),
        F.max("l_quantity").alias("l_quantity"),
        F.max("l_extendedprice").alias("l_extendedprice"),
        F.max("l_returnflag").alias("l_returnflag"),
        F.max("l_shipdate").alias("l_shipdate"),
    )
    kexpr = ((F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 10).cast("int")
    extra = (F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 97 == 0
    ev = base.withColumn("ev", F.explode(_scenario_events(kexpr, extra)))
    e = F.col("ev.e")
    return ev.select(
        ((F.col("l_orderkey") * 10 + F.col("l_linenumber")) * 4 + e)
        .cast("long")
        .alias("seq"),
        F.lit("tpch").alias("db"),
        F.lit("lineitem").alias("tbl"),
        F.col("ev.act").alias("cdc_action"),
        F.col("l_shipdate").alias("cdc_ts"),
        "l_orderkey",
        F.when(e == 3, F.lit(None).cast("int")).otherwise(F.col("l_linenumber")).alias(
            "l_linenumber"
        ),
        "l_partkey",
        "l_suppkey",
        F.when(e == 3, F.col("l_quantity"))
        .otherwise(F.round(F.col("l_quantity") + 1.0 * e, 2))
        .alias("l_quantity"),
        "l_extendedprice",
        "l_returnflag",
        "l_shipdate",
    )
