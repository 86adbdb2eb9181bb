"""Advanced analytics breadth (SURVEY.md §2 EXT rows A6/W5/J5 extended).

The reference pipeline exposes no analytics surface beyond counts
(rcache.py:26-33), so everything here is EXT: distribution shape
statistics, mergeable frequency sketches, inventory classification,
path mining and join prefilters a warehouse user would expect from the
engine that replaced it.

Scale stance (100 TB): every plan below is a single shuffle on the
natural grouping key (or none at all), sketches/classification tables
stay tiny and broadcast-able, and nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .catalog import register

# ---------------------------------------------------------------------------
# A6 ext: distribution shape — skewness / excess kurtosis per group
# ---------------------------------------------------------------------------


@register(
    "agg_skewness_kurtosis",
    doc="Population skewness + excess kurtosis of l_quantity per return "
    "flag via Spark's moment aggregates (one partial+final hash agg, no "
    "second pass); oracle recomputes the same population moments from raw "
    "power sums.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         count(*)            AS n,
         sum(l_quantity)     AS s1,
         sum(l_quantity ^ 2) AS s2,
         sum(l_quantity ^ 3) AS s3,
         sum(l_quantity ^ 4) AS s4
  FROM lineitem GROUP BY l_returnflag
), m AS (
  SELECT l_returnflag, n,
         s1 / n AS mu,
         s2 / n - (s1 / n) ^ 2 AS m2,
         s3 / n - 3 * (s1 / n) * s2 / n + 2 * (s1 / n) ^ 3 AS m3,
         s4 / n - 4 * (s1 / n) * s3 / n + 6 * (s1 / n) ^ 2 * s2 / n
               - 3 * (s1 / n) ^ 4 AS m4
  FROM s
)
SELECT l_returnflag, n AS n_rows,
       round(m3 / m2 ^ 1.5, 6)    AS skew_qty,
       round(m4 / m2 ^ 2 - 3, 6)  AS kurt_qty
FROM m ORDER BY l_returnflag
""",
)
def agg_skewness_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.skewness("l_quantity"), 6).alias("skew_qty"),
            F.round(F.kurtosis("l_quantity"), 6).alias("kurt_qty"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# A6 ext: count-min sketch — mergeable frequency estimation with probes
# ---------------------------------------------------------------------------

_CMS_D, _CMS_W = 4, 64


def _cms_bucket_sql(key: str, i: str) -> str:
    return f"(({key}) * (2 * ({i}) + 1) * 2654435761 + ({i}) * 97) % {_CMS_W}"


@register(
    "agg_countmin_sketch",
    doc="Count-min sketch (d=4, w=64) over orders.o_custkey: the sketch is "
    "a 256-cell table built by ONE map-side-combinable aggregation (events "
    "x d rows), so at 100 TB it merges associatively across partitions; "
    "probe keys get min-over-rows estimates, always >= the exact count "
    "(CMS one-sided error guarantee).",
    tags=("agg", "sketch", "ext"),
    oracle=f"""
WITH hashes AS (SELECT unnest(range(4)) AS i),
sketch AS (
  SELECT i, {_cms_bucket_sql("o_custkey", "i")} AS bucket, count(*) AS cnt
  FROM orders CROSS JOIN hashes GROUP BY 1, 2
),
probes AS (
  SELECT o_custkey AS probe_key, count(*) AS exact_cnt
  FROM orders WHERE o_custkey % 500 = 0 GROUP BY 1
)
SELECT p.probe_key, min(s.cnt) AS est_cnt, any_value(p.exact_cnt) AS exact_cnt
FROM probes p
CROSS JOIN hashes h
JOIN sketch s ON s.i = h.i AND s.bucket = {_cms_bucket_sql("p.probe_key", "h.i")}
GROUP BY p.probe_key
ORDER BY p.probe_key
""",
)
def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    hashes = F.array([F.lit(i) for i in range(_CMS_D)])
    expanded = orders.select("o_custkey", F.explode(hashes).alias("i"))
    bucket = F.expr(_cms_bucket_sql("o_custkey", "i"))
    sketch = (
        expanded.groupBy("i", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    probes = (
        orders.filter(F.col("o_custkey") % 500 == 0)
        .groupBy(F.col("o_custkey").alias("probe_key"))
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    probe_cells = probes.select(
        "probe_key", "exact_cnt", F.explode(hashes).alias("i")
    ).withColumn("bucket", F.expr(_cms_bucket_sql("probe_key", "i")))
    return (
        probe_cells.join(F.broadcast(sketch), ["i", "bucket"])
        .groupBy("probe_key")
        .agg(F.min("cnt").alias("est_cnt"), F.any_value("exact_cnt").alias("exact_cnt"))
        .orderBy("probe_key")
    )


# ---------------------------------------------------------------------------
# W5 ext: ABC inventory classification (cumulative-share cut)
# ---------------------------------------------------------------------------


@register(
    "agg_abc_classification",
    doc="ABC analysis: parts ranked by revenue, cumulative share cut at "
    "80%/95% into A/B/C classes; the per-part aggregate shuffles once on "
    "l_partkey, the classification window runs over the already-reduced "
    "per-part table (|parts| << |lineitem|).",
    tags=("agg", "window", "ext"),
    oracle="""
WITH rev AS (
  SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS revenue
  FROM lineitem GROUP BY l_partkey
), ranked AS (
  SELECT l_partkey, revenue,
         sum(revenue) OVER (ORDER BY revenue DESC, l_partkey) AS cum_rev,
         sum(revenue) OVER () AS total_rev
  FROM rev
)
SELECT CASE WHEN cum_rev / total_rev <= 0.8 THEN 'A'
            WHEN cum_rev / total_rev <= 0.95 THEN 'B'
            ELSE 'C' END          AS abc_class,
       count(*)                   AS n_parts,
       round(sum(revenue), 2)     AS class_revenue
FROM ranked GROUP BY 1 ORDER BY 1
""",
)
def agg_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    w_cum = Window.orderBy(F.desc("revenue"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = rev.select(
        "revenue",
        F.sum("revenue").over(w_cum).alias("cum_rev"),
        F.sum("revenue").over(Window.partitionBy()).alias("total_rev"),
    )
    share = F.col("cum_rev") / F.col("total_rev")
    return (
        ranked.select(
            F.when(share <= 0.8, "A").when(share <= 0.95, "B").otherwise("C").alias(
                "abc_class"
            ),
            "revenue",
        )
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("revenue"), 2).alias("class_revenue"),
        )
        .orderBy("abc_class")
    )


# ---------------------------------------------------------------------------
# A6 ext: Shannon entropy of a categorical distribution per group
# ---------------------------------------------------------------------------


@register(
    "agg_priority_entropy",
    doc="Shannon entropy (nats) of the order-priority mix per nation: two "
    "stacked hash aggregates, both on keys that shrink the data before the "
    "window-free entropy fold; nation dim joined broadcast.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH pc AS (
  SELECT c_nationkey, o_orderpriority, count(*) AS cnt
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
), shares AS (
  SELECT c_nationkey, cnt,
         cnt / (sum(cnt) OVER (PARTITION BY c_nationkey)) AS p
  FROM pc
)
SELECT n_name,
       sum(cnt)                  AS n_orders,
       count(*)                  AS n_priorities,
       round(-sum(p * ln(p)), 6) AS entropy_nats
FROM shares JOIN nation ON n_nationkey = c_nationkey
GROUP BY n_name ORDER BY n_name
""",
)
def agg_priority_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    pc = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_nationkey", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("c_nationkey")
    p = F.col("cnt") / F.sum("cnt").over(w)
    ent = pc.withColumn("term", -p * F.log(p))
    return (
        ent.join(F.broadcast(nation), ent.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum("cnt").alias("n_orders"),
            F.count(F.lit(1)).alias("n_priorities"),
            F.round(F.sum("term"), 6).alias("entropy_nats"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# W5/W6 ext: event path mining — top event-type prefixes per user
# ---------------------------------------------------------------------------


@register(
    "events_top_paths",
    doc="Per-user first-3 event-type path (deterministic ts,event_id "
    "order), then global top-20 paths: the per-user window shuffles once "
    "on user_id and emits one short string per user before the tiny "
    "path-count aggregate (TakeOrderedAndProject, no global sort).",
    tags=("window", "events", "ext"),
    oracle="""
WITH numbered AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), paths AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM numbered WHERE rn <= 3 GROUP BY user_id
)
SELECT path, count(*) AS n_users
FROM paths GROUP BY path
ORDER BY n_users DESC, path LIMIT 20
""",
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    numbered = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 3)
    paths = numbered.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.sort_array(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# W5 ext: same-month year-over-year growth
# ---------------------------------------------------------------------------


@register(
    "window_yoy_same_month",
    doc="Year-over-year monthly revenue: lag() partitioned by calendar "
    "month ordered by year compares each month to the SAME month one year "
    "earlier — the window runs over the tiny (year x month) aggregate, "
    "never the fact table.",
    tags=("window", "ext"),
    oracle="""
WITH monthly AS (
  SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mth,
         sum(o_totalprice) AS revenue
  FROM orders GROUP BY 1, 2
)
SELECT yr, mth, round(revenue, 2) AS revenue,
       round(revenue / lag(revenue) OVER (PARTITION BY mth ORDER BY yr), 6)
         AS yoy_ratio
FROM monthly ORDER BY yr, mth
""",
)
def window_yoy_same_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mth")
    ).agg(F.sum("o_totalprice").alias("rev_raw"))
    w = Window.partitionBy("mth").orderBy("yr")
    return monthly.select(
        "yr",
        "mth",
        F.round("rev_raw", 2).alias("revenue"),
        F.round(F.col("rev_raw") / F.lag("rev_raw").over(w), 6).alias("yoy_ratio"),
    ).orderBy("yr", "mth")


# ---------------------------------------------------------------------------
# J5 ext: bloom-filter join prefilter (shuffle-reduction pattern)
# ---------------------------------------------------------------------------


def _bloom_pos_sql(key: str, i: int) -> str:
    return f"(({key}) * {2 * i + 1} * 1099511628211 + {i * 1013}) % 1024"


@register(
    "join_bloom_prefilter",
    doc="Bloom-filter prejoin: hash the small side (suppliers of one "
    "nation) into a 1024-bit membership set, prefilter the fact table by "
    "2-hash membership BEFORE the exact join — at 100 TB this is the "
    "pattern that turns a full lineitem shuffle into a broadcast bitmask "
    "scan; reports candidate vs exact vs false-positive counts.",
    tags=("join", "bloom", "ext"),
    oracle=f"""
WITH small AS (SELECT s_suppkey FROM supplier WHERE s_nationkey = 7),
bits AS (
  SELECT DISTINCT {_bloom_pos_sql("s_suppkey", 0)} AS pos FROM small
  UNION SELECT DISTINCT {_bloom_pos_sql("s_suppkey", 1)} FROM small
),
candidates AS (
  SELECT l.l_suppkey FROM lineitem l
  WHERE EXISTS (SELECT 1 FROM bits b WHERE b.pos = {_bloom_pos_sql("l.l_suppkey", 0)})
    AND EXISTS (SELECT 1 FROM bits b WHERE b.pos = {_bloom_pos_sql("l.l_suppkey", 1)})
),
exact AS (
  SELECT c.l_suppkey FROM candidates c
  WHERE EXISTS (SELECT 1 FROM small s WHERE s.s_suppkey = c.l_suppkey)
)
SELECT (SELECT count(*) FROM candidates) AS candidate_rows,
       (SELECT count(*) FROM exact)      AS exact_rows,
       (SELECT count(*) FROM candidates) - (SELECT count(*) FROM exact)
         AS false_positive_rows
""",
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    small = supplier.filter(F.col("s_nationkey") == 7).select("s_suppkey")
    bits = (
        small.select(F.expr(_bloom_pos_sql("s_suppkey", 0)).alias("pos"))
        .union(small.select(F.expr(_bloom_pos_sql("s_suppkey", 1)).alias("pos")))
        .distinct()
    )
    cand = (
        li.select("l_suppkey")
        .join(
            F.broadcast(bits.withColumnRenamed("pos", "pos0")),
            F.expr(_bloom_pos_sql("l_suppkey", 0)) == F.col("pos0"),
            "left_semi",
        )
        .join(
            F.broadcast(bits.withColumnRenamed("pos", "pos1")),
            F.expr(_bloom_pos_sql("l_suppkey", 1)) == F.col("pos1"),
            "left_semi",
        )
    )
    exact = cand.join(F.broadcast(small), cand.l_suppkey == small.s_suppkey, "left_semi")
    counts = cand.agg(F.count(F.lit(1)).alias("candidate_rows")).crossJoin(
        exact.agg(F.count(F.lit(1)).alias("exact_rows"))
    )
    return counts.select(
        "candidate_rows",
        "exact_rows",
        (F.col("candidate_rows") - F.col("exact_rows")).alias("false_positive_rows"),
    )


# ---------------------------------------------------------------------------
# A6 ext: Theil inequality index (one-pass decomposable entropy measure)
# ---------------------------------------------------------------------------


@register(
    "agg_theil_index",
    doc="Theil-T inequality of customer spend: T = (1/(n*mu)) * sum(x ln x) "
    "- ln(mu) — a single map-side-combinable aggregate over per-customer "
    "totals (unlike Gini, Theil needs no global sort and decomposes "
    "across partitions, the right inequality measure at 100 TB).",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH spend AS (
  SELECT o_custkey, sum(o_totalprice) AS x FROM orders GROUP BY o_custkey
), s AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(x * ln(x)) AS sxlnx FROM spend
)
SELECT n AS n_customers,
       round(sxlnx / (n * (sx / n)) - ln(sx / n), 6) AS theil_t
FROM s
""",
)
def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("x"))
    s = spend.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.log("x")).alias("sxlnx"),
    )
    mu = F.col("sx") / F.col("n")
    return s.select(
        F.col("n").alias("n_customers"),
        F.round(F.col("sxlnx") / (F.col("n") * mu) - F.log(mu), 6).alias("theil_t"),
    )


# ---------------------------------------------------------------------------
# A6 ext: Herfindahl-Hirschman market concentration per region
# ---------------------------------------------------------------------------


@register(
    "agg_hhi_concentration",
    doc="HHI market concentration: squared nation revenue shares within "
    "each region, summed to the 0-10000 scale; the share window runs over "
    "the 25-row nation aggregate, dims broadcast.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH nat_rev AS (
  SELECT r_name, n_name, sum(o_totalprice) AS rev
  FROM orders
  JOIN customer ON c_custkey = o_custkey
  JOIN nation   ON n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = n_regionkey
  GROUP BY 1, 2
), shares AS (
  SELECT r_name, rev / sum(rev) OVER (PARTITION BY r_name) AS share
  FROM nat_rev
)
SELECT r_name, count(*) AS n_nations,
       round(10000 * sum(share * share), 4) AS hhi
FROM shares GROUP BY r_name ORDER BY r_name
""",
)
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nat_rev = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    share = F.col("rev") / F.sum("rev").over(Window.partitionBy("r_name"))
    return (
        nat_rev.select("r_name", share.alias("share"))
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.round(10000 * F.sum(F.col("share") * F.col("share")), 4).alias("hhi"),
        )
        .orderBy("r_name")
    )


# ---------------------------------------------------------------------------
# J5/J7 ext: multi-fact drill-across (conformed-dimension galaxy schema)
# ---------------------------------------------------------------------------


@register(
    "join_drill_across_facts",
    doc="Drill-across two fact tables (orders revenue, events activity) "
    "through the conformed customer->nation dimension: each fact "
    "aggregates to the nation grain INDEPENDENTLY (no fact-to-fact join, "
    "which would be a many-to-many explosion at 100 TB), then the two "
    "tiny rollups full-outer-join on the dimension key.",
    tags=("join", "setop", "ext"),
    oracle="""
WITH rev AS (
  SELECT c_nationkey AS nk, round(sum(o_totalprice), 2) AS revenue,
         count(*) AS n_orders
  FROM orders JOIN customer ON c_custkey = o_custkey GROUP BY 1
), act AS (
  SELECT c_nationkey AS nk, count(*) AS n_events,
         round(sum(value), 2) AS event_value
  FROM events JOIN customer ON c_custkey = user_id GROUP BY 1
)
SELECT n_name,
       coalesce(revenue, 0)     AS revenue,
       coalesce(n_orders, 0)    AS n_orders,
       coalesce(n_events, 0)    AS n_events,
       coalesce(event_value, 0) AS event_value
FROM nation
LEFT JOIN rev ON rev.nk = n_nationkey
LEFT JOIN act ON act.nk = n_nationkey
ORDER BY n_name
""",
)
def join_drill_across_facts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    act = (
        events.join(customer, events.user_id == customer.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("event_value"),
        )
    )
    return (
        nation.join(F.broadcast(rev), nation.n_nationkey == rev.nk, "left")
        .join(F.broadcast(act), nation.n_nationkey == act.nk, "left")
        .select(
            "n_name",
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("event_value", F.lit(0.0)).alias("event_value"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# text ext: Zipf rank-frequency law fit over the document corpus
# ---------------------------------------------------------------------------


@register(
    "text_zipf_slope",
    doc="Zipf's-law fit: token frequencies ranked, log-log slope via the "
    "closed-form regr_slope aggregate over the top-1000 tokens — "
    "tokenize+count shuffles once on the token, the regression runs on "
    "1000 rows.  Near -1 slope = natural-language-like corpus (a cheap "
    "corpus-health metric for training-data pipelines).",
    tags=("text", "stats", "ext"),
    oracle="""
WITH tokens AS (
  SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
  FROM documents
), counts AS (
  SELECT tok, count(*) AS freq FROM tokens WHERE tok <> '' GROUP BY tok
), ranked AS (
  SELECT freq, row_number() OVER (ORDER BY freq DESC, tok) AS rank
  FROM counts
)
SELECT count(*) AS n_tokens,
       round(regr_slope(ln(freq), ln(rank)), 4)     AS zipf_slope,
       round(regr_intercept(ln(freq), ln(rank)), 4) AS zipf_intercept
FROM ranked WHERE rank <= 1000
""",
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("tok")
    ).filter(F.col("tok") != "")
    counts = tokens.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    ranked = counts.select(
        "freq",
        F.row_number().over(Window.orderBy(F.desc("freq"), "tok")).alias("rank"),
    ).filter(F.col("rank") <= 1000)
    lf, lr = F.log("freq"), F.log("rank")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.regr_slope(lf, lr), 4).alias("zipf_slope"),
        F.round(F.regr_intercept(lf, lr), 4).alias("zipf_intercept"),
    )


# ---------------------------------------------------------------------------
# W5 ext: RFM customer segmentation (quintile scoring)
# ---------------------------------------------------------------------------


@register(
    "agg_rfm_segments",
    doc="RFM segmentation: per-customer recency/frequency/monetary rolled "
    "up once from orders, three ntile(5) windows over the per-customer "
    "table (deterministic custkey tie-break), segment counts out — at "
    "scale the windows run over |customers|, never |orders|.",
    tags=("agg", "window", "ext"),
    oracle="""
WITH rfm AS (
  SELECT o_custkey,
         date_diff('day', max(o_orderdate), TIMESTAMP '1998-08-02') AS recency_days,
         count(*) AS frequency,
         sum(o_totalprice) AS monetary
  FROM orders GROUP BY o_custkey
), scored AS (
  SELECT ntile(5) OVER (ORDER BY recency_days ASC,  o_custkey) AS r_score,
         ntile(5) OVER (ORDER BY frequency   DESC, o_custkey) AS f_score,
         ntile(5) OVER (ORDER BY monetary    DESC, o_custkey) AS m_score
  FROM rfm
)
SELECT r_score, f_score, m_score, count(*) AS n_customers
FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
""",
)
def agg_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    anchor = F.lit("1998-08-02").cast("timestamp")
    rfm = orders.groupBy("o_custkey").agg(
        F.datediff(anchor, F.max("o_orderdate")).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum("o_totalprice").alias("monetary"),
    )
    scored = rfm.select(
        F.ntile(5).over(Window.orderBy(F.asc("recency_days"), "o_custkey")).alias("r_score"),
        F.ntile(5).over(Window.orderBy(F.desc("frequency"), "o_custkey")).alias("f_score"),
        F.ntile(5).over(Window.orderBy(F.desc("monetary"), "o_custkey")).alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("r_score", "f_score", "m_score")
    )


# ---------------------------------------------------------------------------
# W5 ext: decile lift table (model-evaluation shape)
# ---------------------------------------------------------------------------


@register(
    "agg_decile_lift",
    doc="Decile lift: customers ranked by account balance into deciles, "
    "per-decile order rate vs the global rate — the canonical "
    "model-evaluation lift table, computed with one customer-grain "
    "window and a broadcast global-rate scalar.",
    tags=("agg", "window", "ext"),
    oracle="""
WITH oc AS (
  SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT ntile(10) OVER (ORDER BY c_acctbal DESC, c_custkey) AS decile,
         coalesce(n_orders, 0) AS n_orders
  FROM customer LEFT JOIN oc ON o_custkey = c_custkey
), g AS (SELECT sum(n_orders)::DOUBLE / count(*) AS global_rate FROM ranked)
SELECT decile, count(*) AS n_customers,
       sum(n_orders) AS n_orders,
       round(sum(n_orders)::DOUBLE / count(*) / any_value(global_rate), 6) AS lift
FROM ranked CROSS JOIN g
GROUP BY decile ORDER BY decile
""",
)
def agg_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    oc = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    ranked = (
        customer.join(oc, customer.c_custkey == oc.o_custkey, "left")
        .select(
            F.ntile(10)
            .over(Window.orderBy(F.desc("c_acctbal"), "c_custkey"))
            .alias("decile"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        )
    )
    g = ranked.agg(
        (F.sum("n_orders").cast("double") / F.count(F.lit(1))).alias("global_rate")
    )
    return (
        ranked.crossJoin(F.broadcast(g))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("n_orders").alias("n_orders"),
            F.round(
                F.sum("n_orders").cast("double")
                / F.count(F.lit(1))
                / F.any_value("global_rate"),
                6,
            ).alias("lift"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# mm/sim ext: int8 scalar quantization of embeddings (storage-size path)
# ---------------------------------------------------------------------------


@register(
    "mm_embedding_int8_quantize",
    doc="Scalar int8 quantization of the embedding column: per-vector "
    "max-abs scale, round-to-int8, reconstruction MSE — pure array "
    "higher-order functions (transform/aggregate), zero shuffles until "
    "the final scalar rollup.  The 4x storage cut is what makes a 100 TB "
    "embedding corpus fit hot storage; MSE quantifies the cost.",
    tags=("mm", "sim", "ext"),
    oracle="""
WITH q AS (
  SELECT vec_id,
         list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127 AS scale,
         embedding
  FROM embeddings
), err AS (
  SELECT vec_id, scale,
         CASE WHEN scale = 0 THEN 0.0 ELSE
           list_avg(list_transform(embedding,
             x -> pow(x::DOUBLE - round(x::DOUBLE / scale) * scale, 2)))
         END AS mse
  FROM q
)
SELECT count(*) AS n_vectors,
       round(avg(scale), 7) AS avg_scale,
       round(avg(mse), 9)   AS avg_mse,
       round(max(mse), 9)   AS max_mse
FROM err
""",
)
def mm_embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    xd = lambda x: x.cast("double")  # noqa: E731
    scale = (
        F.array_max(F.transform("embedding", lambda x: F.abs(xd(x)))) / 127
    ).alias("scale")
    q = emb.select("vec_id", scale, "embedding")
    per_dim_err = F.transform(
        "embedding",
        lambda x: F.pow(xd(x) - F.round(xd(x) / F.col("scale")) * F.col("scale"), 2),
    )
    mse = F.when(F.col("scale") == 0, F.lit(0.0)).otherwise(
        F.aggregate(per_dim_err, F.lit(0.0), lambda acc, v: acc + v)
        / F.size("embedding")
    )
    err = q.select("vec_id", "scale", mse.alias("mse"))
    return err.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("scale"), 7).alias("avg_scale"),
        F.round(F.avg("mse"), 9).alias("avg_mse"),
        F.round(F.max("mse"), 9).alias("max_mse"),
    )


# ---------------------------------------------------------------------------
# text/feat ext: hashing-trick feature buckets — collision census
# ---------------------------------------------------------------------------


@register(
    "text_hashing_trick_collisions",
    doc="Feature-hashing collision census: vocabulary tokens hashed into "
    "512 buckets with an engine-portable polynomial hash (fold over code "
    "points), reporting bucket utilization and collision rate — the "
    "dimensionality/quality trade a hashing-trick featurizer must know "
    "before fixing its width at corpus scale.",
    tags=("text", "feat", "ext"),
    oracle="""
WITH tokens AS (
  SELECT DISTINCT unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
  FROM documents
), hashed AS (
  SELECT tok,
         list_aggregate(
           list_transform(
             list_filter(string_split(tok, ''), c -> c <> ''),
             c -> ord(c)),
           'sum') % 512 +
         length(tok) * 31 % 512 AS bucket_raw
  FROM tokens WHERE tok <> ''
), b AS (SELECT tok, bucket_raw % 512 AS bucket FROM hashed)
SELECT count(*)                           AS n_tokens,
       count(DISTINCT bucket)             AS n_buckets_used,
       round(1.0 - count(DISTINCT bucket)::DOUBLE / count(*), 6) AS collision_rate,
       max(cnt)                           AS max_bucket_load
FROM b, (SELECT max(c) AS cnt FROM (SELECT count(*) AS c FROM b GROUP BY bucket))
""",
)
def text_hashing_trick_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tokens = (
        docs.select(F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )
    chars = F.filter(F.split("tok", ""), lambda c: c != "")
    code_sum = F.aggregate(
        chars, F.lit(0).cast("bigint"), lambda acc, c: acc + F.ascii(c)
    )
    bucket = (code_sum % 512 + F.length("tok") * 31 % 512) % 512
    b = tokens.select("tok", bucket.alias("bucket"))
    loads = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
    stats = b.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("bucket").alias("n_buckets_used"),
    )
    return (
        stats.crossJoin(F.broadcast(loads.agg(F.max("c").alias("max_bucket_load"))))
        .select(
            "n_tokens",
            "n_buckets_used",
            F.round(
                1.0 - F.col("n_buckets_used").cast("double") / F.col("n_tokens"), 6
            ).alias("collision_rate"),
            "max_bucket_load",
        )
    )


# ---------------------------------------------------------------------------
# feat ext: leave-one-out target encoding (no-leakage categorical feature)
# ---------------------------------------------------------------------------


@register(
    "feat_target_encoding_loo",
    doc="Leave-one-out target encoding of nation against account balance: "
    "each row's encoding is (group_sum - own)/(group_n - 1), computed with "
    "one partition window — the leakage-free categorical encoder; output "
    "validates per-nation distribution of the encoded feature.",
    tags=("feat", "window", "ext"),
    oracle="""
WITH enc AS (
  SELECT c_nationkey,
         CASE WHEN count(*) OVER (PARTITION BY c_nationkey) > 1 THEN
           (sum(c_acctbal) OVER (PARTITION BY c_nationkey) - c_acctbal)
           / (count(*) OVER (PARTITION BY c_nationkey) - 1)
         END AS loo
  FROM customer
)
SELECT n_name, count(*) AS n_rows,
       round(avg(loo), 6)         AS avg_loo,
       round(stddev_samp(loo), 6) AS sd_loo
FROM enc JOIN nation ON n_nationkey = c_nationkey
GROUP BY n_name ORDER BY n_name
""",
)
def feat_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("c_nationkey")
    n_grp = F.count(F.lit(1)).over(w)
    loo = F.when(
        n_grp > 1, (F.sum("c_acctbal").over(w) - F.col("c_acctbal")) / (n_grp - 1)
    )
    enc = customer.select("c_nationkey", loo.alias("loo"))
    return (
        enc.join(F.broadcast(nation), enc.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.avg("loo"), 6).alias("avg_loo"),
            F.round(F.stddev_samp("loo"), 6).alias("sd_loo"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# W5 ext: autocorrelation function of the daily revenue series
# ---------------------------------------------------------------------------


@register(
    "window_autocorrelation",
    doc="ACF at lags 1-7 of daily order revenue: the series aggregates to "
    "day grain first (tiny), then a lag-grid self-join + corr() per lag — "
    "seasonality diagnosis without ever windowing the fact table.",
    tags=("window", "timeseries", "stats", "ext"),
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS rev
  FROM orders GROUP BY 1
), lags AS (SELECT unnest(range(1, 8)) AS lag_k)
SELECT lag_k, count(*) AS n_pairs,
       round(corr(d1.rev, d2.rev), 6) AS acf
FROM lags
JOIN daily d1 ON true
JOIN daily d2 ON d2.day = d1.day - lag_k::INTEGER
GROUP BY lag_k ORDER BY lag_k
""",
)
def window_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag_k"))
    d1 = daily.alias("d1").crossJoin(F.broadcast(lags))
    d2 = daily.select(F.col("day").alias("day2"), F.col("rev").alias("rev2"))
    pairs = d1.join(d2, F.date_sub(F.col("d1.day"), F.col("lag_k")) == F.col("day2"))
    return (
        pairs.groupBy("lag_k")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.corr("rev", "rev2"), 6).alias("acf"),
        )
        .orderBy("lag_k")
    )


# ---------------------------------------------------------------------------
# W5 ext: CUSUM changepoint statistic over the daily order-count series
# ---------------------------------------------------------------------------


@register(
    "window_cusum_changepoint",
    doc="CUSUM changepoint scan: running sum of deviations from the global "
    "daily-count mean; the day with max |CUSUM| is the most likely level "
    "shift.  Mean via one scalar aggregate broadcast back, running sum "
    "over the day-grain series; deterministic earliest-day tie-break.",
    tags=("window", "timeseries", "anomaly", "ext"),
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n
  FROM orders GROUP BY 1
), m AS (SELECT avg(n) AS mu FROM daily),
c AS (
  SELECT day,
         sum(n - mu) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cusum
  FROM daily CROSS JOIN m
)
SELECT (SELECT count(*) FROM daily)        AS n_days,
       day                                  AS changepoint_day,
       round(abs(cusum), 4)                 AS max_abs_cusum
FROM c ORDER BY abs(cusum) DESC, day LIMIT 1
""",
)
def window_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    m = daily.agg(F.avg("n").alias("mu"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = daily.crossJoin(F.broadcast(m)).select(
        "day", F.sum(F.col("n") - F.col("mu")).over(w).alias("cusum")
    )
    n_days = daily.agg(F.count(F.lit(1)).alias("n_days"))
    top = (
        c.orderBy(F.abs("cusum").desc(), F.asc("day"))
        .limit(1)
        .select(
            F.col("day").alias("changepoint_day"),
            F.round(F.abs("cusum"), 4).alias("max_abs_cusum"),
        )
    )
    return n_days.crossJoin(top).select("n_days", "changepoint_day", "max_abs_cusum")


# ---------------------------------------------------------------------------
# events ext: dwell time per event-type transition
# ---------------------------------------------------------------------------


@register(
    "events_transition_dwell",
    doc="Dwell-time per event-type transition: lag() within each user's "
    "timeline yields (prev_type -> type, seconds-between); per-pair count "
    "and mean dwell quantify where users stall — one user_id shuffle, "
    "then a tiny pair aggregate.",
    tags=("events", "window", "ext"),
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, ts,
         lag(event_type) OVER w AS prev_type,
         lag(ts)         OVER w AS prev_ts
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT prev_type, event_type AS next_type, count(*) AS n_transitions,
       round(avg(date_diff('second', prev_ts, ts)), 3) AS avg_dwell_sec,
       max(date_diff('second', prev_ts, ts))           AS max_dwell_sec
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type ORDER BY prev_type, next_type
""",
)
def events_transition_dwell(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("ts").over(w).alias("prev_ts"),
    ).filter(F.col("prev_type").isNotNull())
    dwell = F.col("ts").cast("long") - F.col("prev_ts").cast("long")
    return (
        seq.select("prev_type", F.col("event_type").alias("next_type"), dwell.alias("dwell"))
        .groupBy("prev_type", "next_type")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.round(F.avg("dwell"), 3).alias("avg_dwell_sec"),
            F.max("dwell").alias("max_dwell_sec"),
        )
        .orderBy("prev_type", "next_type")
    )


# ---------------------------------------------------------------------------
# A6 ext: multivariate OLS via sufficient statistics (normal equations)
# ---------------------------------------------------------------------------


@register(
    "agg_ols_normal_equations",
    doc="Two-feature OLS (extendedprice ~ quantity + discount) solved in "
    "closed form from ONE pass of sufficient statistics (covariances), "
    "2x2 Cramer inversion in the final projection — the pattern that "
    "trains linear models at 100 TB without gradient iterations: every "
    "statistic is a map-side-combinable aggregate.",
    tags=("agg", "stats", "ml", "ext"),
    oracle="""
WITH s AS (
  SELECT count(*) AS n,
         avg(l_quantity) AS x1b, avg(l_discount) AS x2b, avg(l_extendedprice) AS yb,
         covar_pop(l_quantity, l_quantity)      AS s11,
         covar_pop(l_discount, l_discount)      AS s22,
         covar_pop(l_quantity, l_discount)      AS s12,
         covar_pop(l_quantity, l_extendedprice) AS s1y,
         covar_pop(l_discount, l_extendedprice) AS s2y,
         var_pop(l_extendedprice)               AS syy
  FROM lineitem
), b AS (
  SELECT n, x1b, x2b, yb, s1y, s2y, syy,
         (s1y * s22 - s2y * s12) / (s11 * s22 - s12 * s12) AS b1,
         (s2y * s11 - s1y * s12) / (s11 * s22 - s12 * s12) AS b2
  FROM s
)
SELECT n AS n_rows,
       round(yb - b1 * x1b - b2 * x2b, 4) AS b0,
       round(b1, 4) AS b1,
       round(b2, 4) AS b2,
       round((b1 * s1y + b2 * s2y) / syy, 6) AS r2
FROM b
""",
)
def agg_ols_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("l_quantity").alias("x1b"),
        F.avg("l_discount").alias("x2b"),
        F.avg("l_extendedprice").alias("yb"),
        F.covar_pop("l_quantity", "l_quantity").alias("s11"),
        F.covar_pop("l_discount", "l_discount").alias("s22"),
        F.covar_pop("l_quantity", "l_discount").alias("s12"),
        F.covar_pop("l_quantity", "l_extendedprice").alias("s1y"),
        F.covar_pop("l_discount", "l_extendedprice").alias("s2y"),
        F.var_pop("l_extendedprice").alias("syy"),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    b1 = (F.col("s1y") * F.col("s22") - F.col("s2y") * F.col("s12")) / det
    b2 = (F.col("s2y") * F.col("s11") - F.col("s1y") * F.col("s12")) / det
    return s.select(
        F.col("n").alias("n_rows"),
        F.round(F.col("yb") - b1 * F.col("x1b") - b2 * F.col("x2b"), 4).alias("b0"),
        F.round(b1, 4).alias("b1"),
        F.round(b2, 4).alias("b2"),
        F.round((b1 * F.col("s1y") + b2 * F.col("s2y")) / F.col("syy"), 6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# A6/W5 ext: Kaplan-Meier survival curve over customer lifetimes
# ---------------------------------------------------------------------------


@register(
    "agg_kaplan_meier",
    doc="Kaplan-Meier survival estimator over customer active-lifetime "
    "(first->last order, churned if silent 90 days before the fixture "
    "anchor): risk sets via a descending cumulative window, the product "
    "estimator as exp(sum(ln ..)) with an explicit zero-factor flag "
    "(Spark ln(0) is NULL, not -inf) — all on the tiny duration-grain "
    "table after one customer-grain aggregate.",
    tags=("agg", "window", "stats", "ext"),
    oracle="""
WITH cust AS (
  SELECT o_custkey,
         date_diff('day', min(o_orderdate), max(o_orderdate)) AS dur,
         CASE WHEN max(o_orderdate) < TIMESTAMP '1998-08-02' - INTERVAL 90 DAY
              THEN 1 ELSE 0 END AS churned
  FROM orders GROUP BY o_custkey
), grp AS (
  SELECT dur, count(*) AS n_at_dur, sum(churned) AS d_events
  FROM cust GROUP BY dur
), risk AS (
  SELECT dur, d_events,
         sum(n_at_dur) OVER (ORDER BY dur DESC ROWS BETWEEN UNBOUNDED
                             PRECEDING AND CURRENT ROW) AS n_risk
  FROM grp
), fac AS (
  SELECT dur, d_events, n_risk,
         1.0 - d_events::DOUBLE / n_risk AS factor
  FROM risk
), surv AS (
  SELECT dur, d_events, n_risk,
         max(CASE WHEN factor = 0 THEN 1 ELSE 0 END)
           OVER w AS hit_zero,
         sum(CASE WHEN factor > 0 THEN ln(factor) ELSE 0 END)
           OVER w AS lnsum
  FROM fac
  WINDOW w AS (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT dur AS duration_days, n_risk, d_events,
       CASE WHEN hit_zero = 1 THEN 0.0 ELSE round(exp(lnsum), 6) END AS survival
FROM surv WHERE d_events > 0 ORDER BY dur
""",
)
def agg_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    anchor = F.lit("1998-08-02").cast("timestamp")
    cust = orders.groupBy("o_custkey").agg(
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias("dur"),
        F.when(F.max("o_orderdate") < F.date_sub(anchor, 90), 1).otherwise(0).alias("churned"),
    )
    grp = cust.groupBy("dur").agg(
        F.count(F.lit(1)).alias("n_at_dur"), F.sum("churned").alias("d_events")
    )
    w_desc = Window.orderBy(F.desc("dur")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = grp.select(
        "dur", "d_events", F.sum("n_at_dur").over(w_desc).alias("n_risk")
    )
    factor = 1.0 - F.col("d_events").cast("double") / F.col("n_risk")
    fac = risk.withColumn("factor", factor)
    w_asc = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    surv = fac.select(
        "dur",
        "d_events",
        "n_risk",
        F.max(F.when(F.col("factor") == 0, 1).otherwise(0)).over(w_asc).alias("hit_zero"),
        F.sum(F.when(F.col("factor") > 0, F.log("factor")).otherwise(0.0))
        .over(w_asc)
        .alias("lnsum"),
    )
    return (
        surv.filter(F.col("d_events") > 0)
        .select(
            F.col("dur").alias("duration_days"),
            "n_risk",
            "d_events",
            F.when(F.col("hit_zero") == 1, 0.0)
            .otherwise(F.round(F.exp("lnsum"), 6))
            .alias("survival"),
        )
        .orderBy("duration_days")
    )


# ---------------------------------------------------------------------------
# A6 ext: two-proportion z-test (A/B testing shape)
# ---------------------------------------------------------------------------


@register(
    "agg_two_proportion_ztest",
    doc="Two-proportion z-test: urgent-order rate of BUILDING vs MACHINERY "
    "customers — pooled-variance z statistic from two conditional "
    "aggregates in one fact-table pass; the inference arithmetic runs on "
    "a single row.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH s AS (
  SELECT
    sum(CASE WHEN c_mktsegment = 'BUILDING'  THEN 1 ELSE 0 END) AS n1,
    sum(CASE WHEN c_mktsegment = 'BUILDING'  AND o_orderpriority = '1-URGENT'
             THEN 1 ELSE 0 END) AS x1,
    sum(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END) AS n2,
    sum(CASE WHEN c_mktsegment = 'MACHINERY' AND o_orderpriority = '1-URGENT'
             THEN 1 ELSE 0 END) AS x2
  FROM orders JOIN customer ON c_custkey = o_custkey
  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
), z AS (
  SELECT n1, x1, n2, x2,
         x1::DOUBLE / n1 AS p1, x2::DOUBLE / n2 AS p2,
         (x1 + x2)::DOUBLE / (n1 + n2) AS pp
  FROM s
)
SELECT n1, n2, round(p1, 6) AS p1, round(p2, 6) AS p2,
       round((p1 - p2) / sqrt(pp * (1 - pp) * (1.0 / n1 + 1.0 / n2)), 4) AS z_stat,
       abs((p1 - p2) / sqrt(pp * (1 - pp) * (1.0 / n1 + 1.0 / n2))) > 1.96
         AS significant_95
FROM z
""",
)
def agg_two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    seg = F.col("c_mktsegment")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    s = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .filter(seg.isin("BUILDING", "MACHINERY"))
        .agg(
            F.sum(F.when(seg == "BUILDING", 1).otherwise(0)).alias("n1"),
            F.sum(F.when((seg == "BUILDING") & urgent, 1).otherwise(0)).alias("x1"),
            F.sum(F.when(seg == "MACHINERY", 1).otherwise(0)).alias("n2"),
            F.sum(F.when((seg == "MACHINERY") & urgent, 1).otherwise(0)).alias("x2"),
        )
    )
    p1 = F.col("x1").cast("double") / F.col("n1")
    p2 = F.col("x2").cast("double") / F.col("n2")
    pp = (F.col("x1") + F.col("x2")).cast("double") / (F.col("n1") + F.col("n2"))
    z = (p1 - p2) / F.sqrt(pp * (1 - pp) * (1.0 / F.col("n1") + 1.0 / F.col("n2")))
    return s.select(
        "n1",
        "n2",
        F.round(p1, 6).alias("p1"),
        F.round(p2, 6).alias("p2"),
        F.round(z, 4).alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant_95"),
    )


# ---------------------------------------------------------------------------
# dedup ext: sorted-neighborhood blocking (entity resolution)
# ---------------------------------------------------------------------------


@register(
    "dedup_sorted_neighborhood",
    doc="Sorted-neighborhood dedup blocking: one global sort on the "
    "resolution key, then each record pairs only with its next 2 "
    "neighbors via lead() — O(n*w) candidate pairs instead of O(n^2); "
    "edit-distance census over the candidates.  At 100 TB the sort is a "
    "range-partitioned total order, still shuffle-linear.",
    tags=("dedup", "window", "ext"),
    oracle="""
WITH ordered AS (
  SELECT c_name,
         lead(c_name, 1) OVER (ORDER BY c_name, c_custkey) AS nb1,
         lead(c_name, 2) OVER (ORDER BY c_name, c_custkey) AS nb2
  FROM customer
), pairs AS (
  SELECT c_name AS a, nb1 AS b FROM ordered WHERE nb1 IS NOT NULL
  UNION ALL
  SELECT c_name AS a, nb2 AS b FROM ordered WHERE nb2 IS NOT NULL
)
SELECT levenshtein(a, b) AS edit_distance,
       count(*) AS n_pairs
FROM pairs GROUP BY 1 ORDER BY 1
""",
)
def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_name", "c_custkey")
    ordered = customer.select(
        "c_name",
        F.lead("c_name", 1).over(w).alias("nb1"),
        F.lead("c_name", 2).over(w).alias("nb2"),
    )
    pairs = ordered.filter(F.col("nb1").isNotNull()).select(
        F.col("c_name").alias("a"), F.col("nb1").alias("b")
    ).unionAll(
        ordered.filter(F.col("nb2").isNotNull()).select(
            F.col("c_name").alias("a"), F.col("nb2").alias("b")
        )
    )
    return (
        pairs.select(F.levenshtein("a", "b").alias("edit_distance"))
        .groupBy("edit_distance")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("edit_distance")
    )


# ---------------------------------------------------------------------------
# W5 ext: Bollinger-band breach census over daily revenue
# ---------------------------------------------------------------------------


@register(
    "window_bollinger_breach",
    doc="Bollinger bands on daily revenue: 7-day trailing mean +/- 2 "
    "sample-stddev, monthly census of band breaches — trailing windows "
    "over the day-grain series only; warm-up rows (stddev undefined) "
    "count as non-breaches on both engines.",
    tags=("window", "timeseries", "anomaly", "ext"),
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS rev
  FROM orders GROUP BY 1
), bands AS (
  SELECT day, rev,
         avg(rev)         OVER w AS mid,
         stddev_samp(rev) OVER w AS sd
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT year(day) * 100 + month(day) AS yyyymm,
       count(*) AS n_days,
       sum(CASE WHEN sd IS NOT NULL AND abs(rev - mid) > 2 * sd
                THEN 1 ELSE 0 END) AS n_breaches
FROM bands GROUP BY 1 ORDER BY 1
""",
)
def window_bollinger_breach(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    bands = daily.select(
        "day",
        "rev",
        F.avg("rev").over(w).alias("mid"),
        F.stddev_samp("rev").over(w).alias("sd"),
    )
    breach = F.when(
        F.col("sd").isNotNull() & (F.abs(F.col("rev") - F.col("mid")) > 2 * F.col("sd")),
        1,
    ).otherwise(0)
    return (
        bands.groupBy((F.year("day") * 100 + F.month("day")).alias("yyyymm"))
        .agg(F.count(F.lit(1)).alias("n_days"), F.sum(breach).alias("n_breaches"))
        .orderBy("yyyymm")
    )


# ---------------------------------------------------------------------------
# mm ext: chunked blob reassembly (multimodal payload plumbing)
# ---------------------------------------------------------------------------


@register(
    "mm_blob_chunk_reassembly",
    doc="Chunked-payload reassembly: each document is split into 64-char "
    "chunks (the storage shape of large binary payloads), then rebuilt by "
    "ordered concat within one doc_id-keyed aggregate; md5 equality "
    "against the original proves byte-exact round-trip.  One shuffle on "
    "doc_id; chunk order is explicit (never relies on arrival order).",
    tags=("mm", "source", "ext"),
    oracle="""
WITH chunks AS (
  SELECT doc_id, i AS chunk_idx, substr(text, (i * 64 + 1)::INT, 64) AS chunk
  FROM documents, unnest(range((length(text) + 63) // 64)) AS t(i)
), rebuilt AS (
  SELECT doc_id, string_agg(chunk, '' ORDER BY chunk_idx) AS text2,
         count(*) AS n_chunks
  FROM chunks GROUP BY doc_id
)
SELECT count(*) AS n_docs,
       sum(n_chunks) AS n_chunks,
       sum(CASE WHEN md5(text2) = md5(text) THEN 1 ELSE 0 END) AS n_roundtrip_ok
FROM rebuilt JOIN documents USING (doc_id)
""",
)
def mm_blob_chunk_reassembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_chunks = F.ceil(F.length("text") / 64).cast("bigint")
    chunks = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias("chunk_idx"),
        "text",
    ).select(
        "doc_id",
        "chunk_idx",
        F.substring(F.col("text"), (F.col("chunk_idx") * 64 + 1).cast("int"), 64).alias(
            "chunk"
        ),
    )
    rebuilt = chunks.groupBy("doc_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.sort_array(F.collect_list(F.struct("chunk_idx", "chunk"))),
                lambda s: s["chunk"],
            ),
        ).alias("text2"),
        F.count(F.lit(1)).alias("n_chunks"),
    )
    joined = rebuilt.join(docs.select("doc_id", "text"), "doc_id")
    return joined.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chunks").alias("n_chunks"),
        F.sum(
            F.when(F.md5(F.col("text2")) == F.md5(F.col("text")), 1).otherwise(0)
        ).alias("n_roundtrip_ok"),
    )


# ---------------------------------------------------------------------------
# A6 ext: weighted median (cumulative-weight crossing)
# ---------------------------------------------------------------------------


@register(
    "agg_weighted_median",
    doc="Quantity-weighted median of extended price per return flag: "
    "cumulative-weight window over the value-sorted group, first value "
    "crossing half the total weight wins — ties in the value collapse to "
    "the same answer regardless of intra-tie order, so the result is "
    "deterministic without a unique sort key.",
    tags=("agg", "window", "stats", "ext"),
    oracle="""
WITH w AS (
  SELECT l_returnflag, l_extendedprice AS v, l_quantity AS wt,
         sum(l_quantity) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_wt,
         sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tot_wt
  FROM lineitem
)
SELECT l_returnflag,
       round(min(v), 2)            AS weighted_median,
       round(any_value(tot_wt), 2) AS total_weight
FROM w WHERE cum_wt >= tot_wt / 2
GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("l_returnflag")
    cum = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.sum("l_quantity").over(w_cum).alias("cum_wt"),
        F.sum("l_quantity").over(w_all).alias("tot_wt"),
    )
    return (
        cum.filter(F.col("cum_wt") >= F.col("tot_wt") / 2)
        .groupBy("l_returnflag")
        .agg(
            F.round(F.min("v"), 2).alias("weighted_median"),
            F.round(F.any_value("tot_wt"), 2).alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# A6 ext: chi-square test of independence (contingency table)
# ---------------------------------------------------------------------------


@register(
    "agg_chi_square_independence",
    doc="Chi-square independence of market segment vs order priority: "
    "observed cell counts in one agg, marginals via two windows over the "
    "tiny contingency table, (O-E)^2/E summed with degrees of freedom — "
    "categorical-dependence screening that never rescans the fact join.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH obs AS (
  SELECT c_mktsegment AS seg, o_orderpriority AS pri, count(*) AS o
  FROM orders JOIN customer ON c_custkey = o_custkey
  GROUP BY 1, 2
), marg AS (
  SELECT seg, pri, o,
         sum(o) OVER (PARTITION BY seg) AS row_tot,
         sum(o) OVER (PARTITION BY pri) AS col_tot,
         sum(o) OVER ()                 AS n
  FROM obs
)
SELECT any_value(n)                                   AS n_obs,
       count(DISTINCT seg)                            AS n_segments,
       count(DISTINCT pri)                            AS n_priorities,
       (count(DISTINCT seg) - 1) * (count(DISTINCT pri) - 1) AS dof,
       round(sum(pow(o - row_tot * col_tot / n, 2)
                 / (row_tot * col_tot / n)), 4)       AS chi2
FROM marg
""",
)
def agg_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    obs = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"), F.col("o_orderpriority").alias("pri")
        )
        .agg(F.count(F.lit(1)).alias("o"))
    )
    marg = obs.select(
        "seg",
        "pri",
        "o",
        F.sum("o").over(Window.partitionBy("seg")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("pri")).alias("col_tot"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    e = F.col("row_tot") * F.col("col_tot") / F.col("n")
    return marg.agg(
        F.any_value("n").alias("n_obs"),
        F.countDistinct("seg").alias("n_segments"),
        F.countDistinct("pri").alias("n_priorities"),
        ((F.countDistinct("seg") - 1) * (F.countDistinct("pri") - 1)).alias("dof"),
        F.round(F.sum(F.pow(F.col("o") - e, 2) / e), 4).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# A6 ext: geometric + harmonic means per group
# ---------------------------------------------------------------------------


@register(
    "agg_geo_harmonic_means",
    doc="Geometric (exp of mean log) and harmonic (n over sum of "
    "reciprocals) means of retail price per brand — both decompose into "
    "plain sums, so they stay one map-side-combinable aggregate.",
    tags=("agg", "stats", "ext"),
    oracle="""
SELECT p_brand, count(*) AS n_parts,
       round(exp(avg(ln(p_retailprice))), 4)    AS geo_mean_price,
       round(count(*) / sum(1.0 / p_retailprice), 4) AS harmonic_mean_price,
       round(avg(p_retailprice), 4)             AS arith_mean_price
FROM part GROUP BY p_brand ORDER BY p_brand
""",
)
def agg_geo_harmonic_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.exp(F.avg(F.log("p_retailprice"))), 4).alias("geo_mean_price"),
            F.round(
                F.count(F.lit(1)) / F.sum(1.0 / F.col("p_retailprice")), 4
            ).alias("harmonic_mean_price"),
            F.round(F.avg("p_retailprice"), 4).alias("arith_mean_price"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# A6/W5 ext: Wald-Wolfowitz runs test on the daily revenue direction
# ---------------------------------------------------------------------------


@register(
    "agg_runs_test",
    doc="Runs test for randomness of daily revenue direction: sign of the "
    "day-over-day diff via lag(), runs counted where the sign flips, "
    "closed-form z against the expected run count — the whole test runs "
    "on the day-grain series (zero-diff days excluded on both engines).",
    tags=("agg", "window", "stats", "ext"),
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS rev
  FROM orders GROUP BY 1
), diffs AS (
  SELECT day, sign(rev - lag(rev) OVER (ORDER BY day)) AS s
  FROM daily
), runs AS (
  SELECT s, CASE WHEN s <> lag(s) OVER (ORDER BY day) OR
                      lag(s) OVER (ORDER BY day) IS NULL
            THEN 1 ELSE 0 END AS new_run
  FROM diffs WHERE s IS NOT NULL AND s <> 0
), agg AS (
  SELECT sum(CASE WHEN s > 0 THEN 1 ELSE 0 END)::DOUBLE AS np,
         sum(CASE WHEN s < 0 THEN 1 ELSE 0 END)::DOUBLE AS nm,
         sum(new_run) AS r
  FROM runs
)
SELECT np::BIGINT AS n_up, nm::BIGINT AS n_down, r AS n_runs,
       round(1 + 2 * np * nm / (np + nm), 4) AS expected_runs,
       round((r - (1 + 2 * np * nm / (np + nm)))
             / sqrt(2 * np * nm * (2 * np * nm - np - nm)
                    / (pow(np + nm, 2) * (np + nm - 1))), 4) AS z_stat
FROM agg
""",
)
def agg_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    w = Window.orderBy("day")
    diffs = daily.select(
        "day", F.signum(F.col("rev") - F.lag("rev").over(w)).alias("s")
    ).filter(F.col("s").isNotNull() & (F.col("s") != 0))
    runs = diffs.select(
        "s",
        F.when(
            (F.col("s") != F.lag("s").over(w)) | F.lag("s").over(w).isNull(), 1
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs.agg(
        F.sum(F.when(F.col("s") > 0, 1).otherwise(0)).cast("double").alias("np"),
        F.sum(F.when(F.col("s") < 0, 1).otherwise(0)).cast("double").alias("nm"),
        F.sum("new_run").alias("r"),
    )
    np_, nm_, r_ = F.col("np"), F.col("nm"), F.col("r")
    exp_runs = 1 + 2 * np_ * nm_ / (np_ + nm_)
    var = (
        2 * np_ * nm_ * (2 * np_ * nm_ - np_ - nm_)
        / (F.pow(np_ + nm_, 2) * (np_ + nm_ - 1))
    )
    return agg.select(
        np_.cast("bigint").alias("n_up"),
        nm_.cast("bigint").alias("n_down"),
        r_.alias("n_runs"),
        F.round(exp_runs, 4).alias("expected_runs"),
        F.round((r_ - exp_runs) / F.sqrt(var), 4).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# W5 ext: cohort LTV curve (cumulative revenue per customer by cohort age)
# ---------------------------------------------------------------------------


@register(
    "window_cohort_ltv_curve",
    doc="Cohort LTV curve: customers grouped by first-order month, "
    "revenue accumulated over cohort age in months — first a customer-"
    "grain min() to find cohorts, then a (cohort, age) aggregate, then "
    "the cumulative window over that tiny matrix; the fact table is "
    "touched twice, the window never.",
    tags=("window", "cohort", "ext"),
    oracle="""
WITH cohort AS (
  SELECT o_custkey,
         min(year(o_orderdate) * 12 + month(o_orderdate)) AS c0
  FROM orders GROUP BY o_custkey
), facts AS (
  SELECT c0, (year(o_orderdate) * 12 + month(o_orderdate)) - c0 AS age_months,
         o_totalprice
  FROM orders JOIN cohort ON cohort.o_custkey = orders.o_custkey
), sizes AS (
  SELECT c0, count(DISTINCT orders.o_custkey) AS n_customers
  FROM orders JOIN cohort ON cohort.o_custkey = orders.o_custkey GROUP BY c0
), grid AS (
  SELECT c0, age_months,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_cents
  FROM facts GROUP BY 1, 2
)
SELECT (c0 - 1) // 12 * 100 + ((c0 - 1) % 12 + 1) AS cohort_yyyymm,
       age_months,
       any_value(n_customers) AS n_customers,
       ((2 * sum(rev_cents) OVER (PARTITION BY c0 ORDER BY age_months
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          + any_value(n_customers)) // (2 * any_value(n_customers))) / 100.0
         AS cum_ltv_per_customer
FROM grid JOIN sizes USING (c0)
GROUP BY c0, age_months, rev_cents
ORDER BY cohort_yyyymm, age_months
""",
)
def window_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    mkey = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    cohort = orders.groupBy("o_custkey").agg(F.min(mkey).alias("c0"))
    joined = orders.join(cohort, "o_custkey")
    facts = joined.select("c0", (mkey - F.col("c0")).alias("age_months"), "o_totalprice")
    sizes = joined.groupBy("c0").agg(F.countDistinct("o_custkey").alias("n_customers"))
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    grid = facts.groupBy("c0", "age_months").agg(F.sum(cents).alias("rev_cents"))
    w = (
        Window.partitionBy("c0")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cohort_yyyymm = (
        (F.col("c0") - 1) / 12
    ).cast("bigint") * 100 + ((F.col("c0") - 1) % 12 + 1)
    cum = grid.join(F.broadcast(sizes), "c0").withColumn(
        "cum_cents", F.sum("rev_cents").over(w)
    )
    # half-up division in exact integer space: (2a + n) div (2n), then /100
    ltv = F.expr("(2 * cum_cents + n_customers) div (2 * n_customers)") / 100.0
    return cum.select(
        cohort_yyyymm.alias("cohort_yyyymm"),
        "age_months",
        "n_customers",
        ltv.alias("cum_ltv_per_customer"),
    ).orderBy("cohort_yyyymm", "age_months")


# ---------------------------------------------------------------------------
# J5 ext: right-outer join (null-preserving dimension side)
# ---------------------------------------------------------------------------


@register(
    "join_right_outer_never_sold",
    doc="Right-outer lineitem->part keeps never-sold parts as null fact "
    "rows; per-brand census of sold vs never-sold — the anti-join "
    "complement expressed as one outer join + conditional counts (at "
    "scale Catalyst turns the small preserved side into the build side).",
    tags=("join", "ext"),
    oracle="""
SELECT p_brand,
       count(DISTINCT p_partkey) AS n_parts,
       count(DISTINCT CASE WHEN l_orderkey IS NOT NULL THEN p_partkey END)
         AS n_sold_parts,
       count(DISTINCT CASE WHEN l_orderkey IS NULL THEN p_partkey END)
         AS n_never_sold
FROM lineitem RIGHT JOIN part ON l_partkey = p_partkey
GROUP BY p_brand ORDER BY p_brand
""",
)
def join_right_outer_never_sold(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey, "right")
    return (
        j.groupBy("p_brand")
        .agg(
            F.countDistinct("p_partkey").alias("n_parts"),
            F.countDistinct(
                F.when(F.col("l_orderkey").isNotNull(), F.col("p_partkey"))
            ).alias("n_sold_parts"),
            F.countDistinct(
                F.when(F.col("l_orderkey").isNull(), F.col("p_partkey"))
            ).alias("n_never_sold"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# W5 ext: multi-horizon velocity features (fraud/feature-store shape)
# ---------------------------------------------------------------------------


@register(
    "window_velocity_multi_horizon",
    doc="Multi-horizon velocity features: per event, the user's trailing "
    "1-hour and 24-hour event counts via two rangeBetween windows over "
    "the SAME user_id partitioning (one shuffle feeds both frames), "
    "rolled up per event type — the feature-store pattern for rate "
    "features at scale.",
    tags=("window", "events", "feat", "ext"),
    oracle="""
WITH v AS (
  -- floor(epoch) = whole seconds: Spark's ts.cast(long) truncates to
  -- seconds, while bare epoch(ts) carries fractional microseconds and
  -- admits a different event set at sub-second frame boundaries
  SELECT event_type,
         count(*) OVER (PARTITION BY user_id
                        ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                        RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS v1h,
         count(*) OVER (PARTITION BY user_id
                        ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                        RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW) AS v24h
  FROM events
)
SELECT event_type,
       count(*)            AS n_events,
       round(avg(v1h), 6)  AS avg_velocity_1h,
       max(v1h)            AS max_velocity_1h,
       round(avg(v24h), 6) AS avg_velocity_24h,
       max(v24h)           AS max_velocity_24h
FROM v GROUP BY event_type ORDER BY event_type
""",
)
def window_velocity_multi_horizon(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = Window.partitionBy("user_id").orderBy(F.col("ts").cast("long"))
    w1h = base.rangeBetween(-3600, 0)
    w24h = base.rangeBetween(-86400, 0)
    v = ev.select(
        "event_type",
        F.count(F.lit(1)).over(w1h).alias("v1h"),
        F.count(F.lit(1)).over(w24h).alias("v24h"),
    )
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("v1h"), 6).alias("avg_velocity_1h"),
            F.max("v1h").alias("max_velocity_1h"),
            F.round(F.avg("v24h"), 6).alias("avg_velocity_24h"),
            F.max("v24h").alias("max_velocity_24h"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# A6 ext: Mann-Whitney U (rank-based two-sample test with midranks)
# ---------------------------------------------------------------------------


@register(
    "agg_mann_whitney_u",
    doc="Mann-Whitney U on account balances of two market segments: "
    "midranks for ties via rank() + (tie_count-1)/2 windows over the "
    "combined sample, U statistic and its normal-approximation z — the "
    "nonparametric complement to the z/chi2/runs tests; the ranking "
    "window runs over the filtered two-segment subset only.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH s AS (
  SELECT c_mktsegment AS seg, c_acctbal AS x FROM customer
  WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')
), r AS (
  SELECT seg, x,
         rank() OVER (ORDER BY x) AS rk,
         count(*) OVER (PARTITION BY x) AS nt
  FROM s
), mid AS (
  SELECT seg, rk + (nt - 1) / 2.0 AS midrank FROM r
), agg AS (
  SELECT
    sum(CASE WHEN seg = 'AUTOMOBILE' THEN midrank END) AS r1,
    sum(CASE WHEN seg = 'AUTOMOBILE' THEN 1 ELSE 0 END)::DOUBLE AS n1,
    sum(CASE WHEN seg = 'HOUSEHOLD'  THEN 1 ELSE 0 END)::DOUBLE AS n2
  FROM mid
)
SELECT n1::BIGINT AS n_auto, n2::BIGINT AS n_house,
       round(r1 - n1 * (n1 + 1) / 2, 2) AS u_stat,
       round((r1 - n1 * (n1 + 1) / 2 - n1 * n2 / 2)
             / sqrt(n1 * n2 * (n1 + n2 + 1) / 12), 4) AS z_stat
FROM agg
""",
)
def agg_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    s = customer.filter(
        F.col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD")
    ).select(F.col("c_mktsegment").alias("seg"), F.col("c_acctbal").alias("x"))
    r = s.select(
        "seg",
        F.rank().over(Window.orderBy("x")).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("x")).alias("nt"),
    )
    mid = r.select("seg", (F.col("rk") + (F.col("nt") - 1) / 2.0).alias("midrank"))
    agg = mid.agg(
        F.sum(F.when(F.col("seg") == "AUTOMOBILE", F.col("midrank"))).alias("r1"),
        F.sum(F.when(F.col("seg") == "AUTOMOBILE", 1).otherwise(0))
        .cast("double")
        .alias("n1"),
        F.sum(F.when(F.col("seg") == "HOUSEHOLD", 1).otherwise(0))
        .cast("double")
        .alias("n2"),
    )
    u = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2
    z = (u - F.col("n1") * F.col("n2") / 2) / F.sqrt(
        F.col("n1") * F.col("n2") * (F.col("n1") + F.col("n2") + 1) / 12
    )
    return agg.select(
        F.col("n1").cast("bigint").alias("n_auto"),
        F.col("n2").cast("bigint").alias("n_house"),
        F.round(u, 2).alias("u_stat"),
        F.round(z, 4).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# corpus ext: largest-remainder budget allocation
# ---------------------------------------------------------------------------


@register(
    "corpus_budget_largest_remainder",
    doc="Token-budget allocation: a 1M-token budget split across sources "
    "proportionally to their token mass using the largest-remainder "
    "method — floor quotas first, the leftover units go to the biggest "
    "fractional remainders (deterministic source-name tie-break), so the "
    "allocations sum EXACTLY to the budget.  Pure integer arithmetic on "
    "the per-source rollup.",
    tags=("corpus", "agg", "ext"),
    oracle="""
WITH src AS (
  SELECT source, sum(n_chars) AS mass FROM documents GROUP BY source
), tot AS (SELECT sum(mass) AS total FROM src),
quota AS (
  SELECT source, mass,
         (mass * 1000000) // total      AS floor_alloc,
         (mass * 1000000) % total       AS remainder
  FROM src CROSS JOIN tot
), leftover AS (
  SELECT 1000000 - sum(floor_alloc) AS n_extra FROM quota
), ranked AS (
  SELECT source, mass, floor_alloc,
         row_number() OVER (ORDER BY remainder DESC, source) AS rr
  FROM quota
)
SELECT source, mass,
       floor_alloc + CASE WHEN rr <= any_value(n_extra) THEN 1 ELSE 0 END
         AS alloc_tokens
FROM ranked CROSS JOIN leftover
GROUP BY source, mass, floor_alloc, rr
ORDER BY source
""",
)
def corpus_budget_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(F.sum("n_chars").alias("mass"))
    tot = src.agg(F.sum("mass").alias("total"))
    quota = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "mass",
        F.expr("(mass * 1000000) div total").alias("floor_alloc"),
        F.expr("(mass * 1000000) % total").alias("remainder"),
    )
    leftover = quota.agg((F.lit(1000000) - F.sum("floor_alloc")).alias("n_extra"))
    ranked = quota.select(
        "source",
        "mass",
        "floor_alloc",
        F.row_number()
        .over(Window.orderBy(F.desc("remainder"), "source"))
        .alias("rr"),
    )
    return (
        ranked.crossJoin(F.broadcast(leftover))
        .select(
            "source",
            "mass",
            (
                F.col("floor_alloc")
                + F.when(F.col("rr") <= F.col("n_extra"), 1).otherwise(0)
            ).alias("alloc_tokens"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# A6 ext: Spearman rank correlation (midranks, per group)
# ---------------------------------------------------------------------------


@register(
    "agg_spearman_rank_corr",
    doc="Spearman rho between quantity and extended price per return "
    "flag: midranks (rank + (ties-1)/2) for both variables via windows "
    "partitioned on the group key — the rank windows never go global — "
    "then plain Pearson corr over the ranks.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH r AS (
  SELECT l_returnflag,
         rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
           + (count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1) / 2.0
           AS rq,
         rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
           + (count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1) / 2.0
           AS rp
  FROM lineitem
)
SELECT l_returnflag, count(*) AS n_rows,
       round(corr(rq, rp), 6) AS spearman_rho
FROM r GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def agg_spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rq = F.rank().over(Window.partitionBy("l_returnflag").orderBy("l_quantity")) + (
        F.count(F.lit(1)).over(Window.partitionBy("l_returnflag", "l_quantity")) - 1
    ) / 2.0
    rp = F.rank().over(
        Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    ) + (
        F.count(F.lit(1)).over(Window.partitionBy("l_returnflag", "l_extendedprice"))
        - 1
    ) / 2.0
    r = li.select("l_returnflag", rq.alias("rq"), rp.alias("rp"))
    return (
        r.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.corr("rq", "rp"), 6).alias("spearman_rho"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# J5 ext: null-key skew split (outer join scale pattern)
# ---------------------------------------------------------------------------


@register(
    "join_null_skew_split",
    doc="Null-skew split: when a join key is heavily NULL, all NULL rows "
    "hash to one reducer as dead weight — the Spark plan routes NULL-key "
    "rows AROUND the join (they can never match) and unions them back, "
    "joining only the non-null partition.  Semantics equal a plain left "
    "join (the oracle), but the shuffle excludes every NULL row.",
    tags=("join", "skew", "ext"),
    oracle="""
WITH o AS (
  SELECT CASE WHEN o_custkey % 50 = 0 THEN NULL ELSE o_custkey END AS k,
         o_totalprice
  FROM orders
)
SELECT CASE WHEN k IS NULL THEN 'null_key'
            WHEN c_custkey IS NOT NULL THEN 'matched'
            ELSE 'unmatched' END AS join_class,
       count(*) AS n_rows,
       round(sum(o_totalprice), 2) AS price_sum
FROM o LEFT JOIN customer ON k = c_custkey
GROUP BY 1 ORDER BY 1
""",
)
def join_null_skew_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    o = orders.select(
        F.when(F.col("o_custkey") % 50 == 0, None)
        .otherwise(F.col("o_custkey"))
        .alias("k"),
        "o_totalprice",
    )
    nulls = o.filter(F.col("k").isNull()).select(
        "k", "o_totalprice", F.lit(None).cast("long").alias("c_custkey")
    )
    nonnull = o.filter(F.col("k").isNotNull()).join(
        customer.select("c_custkey"), F.col("k") == F.col("c_custkey"), "left"
    )
    unioned = nonnull.select("k", "o_totalprice", "c_custkey").unionByName(nulls)
    cls = (
        F.when(F.col("k").isNull(), "null_key")
        .when(F.col("c_custkey").isNotNull(), "matched")
        .otherwise("unmatched")
    )
    return (
        unioned.groupBy(cls.alias("join_class"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("o_totalprice"), 2).alias("price_sum"),
        )
        .orderBy("join_class")
    )


# ---------------------------------------------------------------------------
# W5 ext: time-weighted average (TWAP) per user
# ---------------------------------------------------------------------------


@register(
    "window_time_weighted_avg",
    doc="Time-weighted average of event value per user: each reading is "
    "weighted by the seconds it was 'current' (lead(ts) - ts); the last "
    "reading per user has no duration and drops out on both engines — "
    "the TWAP shape for irregular telemetry, one user_id shuffle.",
    tags=("window", "events", "timeseries", "ext"),
    oracle="""
WITH seg AS (
  SELECT user_id, value,
         date_diff('second', ts,
                   lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           AS dur
  FROM events
), twap AS (
  SELECT user_id,
         sum(value * dur) / sum(dur) AS twap_value,
         count(*) AS n_segments
  FROM seg WHERE dur IS NOT NULL AND dur > 0
  GROUP BY user_id
)
SELECT count(*) AS n_users,
       round(avg(twap_value), 4) AS avg_twap,
       round(min(twap_value), 4) AS min_twap,
       round(max(twap_value), 4) AS max_twap,
       sum(n_segments) AS n_segments
FROM twap
""",
)
def window_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dur = F.lead(F.col("ts").cast("long")).over(w) - F.col("ts").cast("long")
    seg = ev.select("user_id", "value", dur.alias("dur")).filter(
        F.col("dur").isNotNull() & (F.col("dur") > 0)
    )
    twap = seg.groupBy("user_id").agg(
        (F.sum(F.col("value") * F.col("dur")) / F.sum("dur")).alias("twap_value"),
        F.count(F.lit(1)).alias("n_segments"),
    )
    return twap.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.avg("twap_value"), 4).alias("avg_twap"),
        F.round(F.min("twap_value"), 4).alias("min_twap"),
        F.round(F.max("twap_value"), 4).alias("max_twap"),
        F.sum("n_segments").alias("n_segments"),
    )


# ---------------------------------------------------------------------------
# W5 ext: longest strictly-monotone run (islands over direction changes)
# ---------------------------------------------------------------------------


@register(
    "window_longest_monotone_run",
    doc="Longest strictly-increasing and strictly-decreasing runs of the "
    "daily revenue series: direction via lag, island ids as running sums "
    "of direction changes, then two tiny nested aggregates — the "
    "monotone-run variant of gaps-and-islands, entirely on the day grain.",
    tags=("window", "timeseries", "ext"),
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS rev
  FROM orders GROUP BY 1
), dirs AS (
  SELECT day, CASE WHEN rev > lag(rev) OVER (ORDER BY day) THEN 1
                   WHEN rev < lag(rev) OVER (ORDER BY day) THEN -1 END AS dir
  FROM daily
), flags AS (
  SELECT day, dir,
         CASE WHEN dir IS DISTINCT FROM lag(dir) OVER (ORDER BY day)
              THEN 1 ELSE 0 END AS chg
  FROM (SELECT * FROM dirs WHERE dir IS NOT NULL)
), isl AS (
  SELECT day, dir,
         sum(chg) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS island
  FROM flags
), runs AS (
  SELECT dir, island, count(*) AS run_len FROM isl GROUP BY dir, island
)
SELECT CASE WHEN dir = 1 THEN 'increasing' ELSE 'decreasing' END AS direction,
       max(run_len) AS longest_run_days,
       count(*)     AS n_runs
FROM runs GROUP BY dir ORDER BY direction
""",
)
def window_longest_monotone_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    w = Window.orderBy("day")
    prev = F.lag("rev").over(w)
    dirs = daily.select(
        "day",
        F.when(F.col("rev") > prev, 1).when(F.col("rev") < prev, -1).alias("dir"),
    ).filter(F.col("dir").isNotNull())
    w_cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    isl = dirs.select(
        "dir",
        F.sum(
            F.when(~F.col("dir").eqNullSafe(F.lag("dir").over(w)), 1).otherwise(0)
        )
        .over(w_cum)
        .alias("island"),
    )
    runs = isl.groupBy("dir", "island").agg(F.count(F.lit(1)).alias("run_len"))
    return (
        runs.groupBy(
            F.when(F.col("dir") == 1, "increasing")
            .otherwise("decreasing")
            .alias("direction")
        )
        .agg(
            F.max("run_len").alias("longest_run_days"),
            F.count(F.lit(1)).alias("n_runs"),
        )
        .orderBy("direction")
    )


# ---------------------------------------------------------------------------
# events ext: last-touch attribution
# ---------------------------------------------------------------------------


@register(
    "events_attribution_last_touch",
    doc="Last-touch attribution: each purchase event credits the user's "
    "most recent preceding non-purchase event type, carried by an "
    "IGNORE NULLS last_value over a 1-preceding frame — purchases with "
    "no prior touch fall to 'direct'.  One user_id window shuffle, then "
    "a tiny credit census.",
    tags=("events", "window", "ext"),
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, ts,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
  FROM events
)
SELECT coalesce(touch, 'direct') AS attributed_to,
       count(*) AS n_purchases
FROM seq WHERE event_type = 'purchase'
GROUP BY 1 ORDER BY 1
""",
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    seq = ev.select("event_type", touch.alias("touch"))
    return (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("touch", F.lit("direct")).alias("attributed_to"))
        .agg(F.count(F.lit(1)).alias("n_purchases"))
        .orderBy("attributed_to")
    )


# ---------------------------------------------------------------------------
# W5 ext: rolling cross-metric correlation
# ---------------------------------------------------------------------------


@register(
    "window_rolling_correlation",
    doc="30-day rolling correlation between daily order count and daily "
    "mean price: corr() as a windowed aggregate over a rows frame on the "
    "day-grain series, summarized per year — regime-shift detection "
    "between two metrics without ever joining the fact table to itself.",
    tags=("window", "timeseries", "stats", "ext"),
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         count(*) AS n_orders,
         avg(o_totalprice) AS avg_price
  FROM orders GROUP BY 1
), rc AS (
  SELECT day,
         corr(n_orders, avg_price)
           OVER (ORDER BY day ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
           AS roll_corr
  FROM daily
)
SELECT year(day) AS yr,
       count(*) AS n_days,
       round(avg(roll_corr), 6) AS avg_roll_corr,
       round(min(roll_corr), 6) AS min_roll_corr,
       round(max(roll_corr), 6) AS max_roll_corr
FROM rc WHERE roll_corr IS NOT NULL
GROUP BY yr ORDER BY yr
""",
)
def window_rolling_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n_orders"), F.avg("o_totalprice").alias("avg_price")
    )
    w = Window.orderBy("day").rowsBetween(-29, Window.currentRow)
    # Pearson spelled as covar/(sx·sy) with try_divide: a 30-row frame of
    # constant n_orders (zero variance — happens at tiny SF) must yield
    # NULL like DuckDB's corr(), not the ANSI DIVIDE_BY_ZERO that
    # F.corr().over(w) raises
    roll_corr = F.try_divide(
        F.covar_samp("n_orders", "avg_price").over(w),
        F.stddev_samp("n_orders").over(w) * F.stddev_samp("avg_price").over(w),
    )
    rc = daily.select("day", roll_corr.alias("roll_corr")).filter(
        F.col("roll_corr").isNotNull()
    )
    return (
        rc.groupBy(F.year("day").alias("yr"))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.avg("roll_corr"), 6).alias("avg_roll_corr"),
            F.round(F.min("roll_corr"), 6).alias("min_roll_corr"),
            F.round(F.max("roll_corr"), 6).alias("max_roll_corr"),
        )
        .orderBy("yr")
    )


# ---------------------------------------------------------------------------
# feat ext: continuous time-decayed user value profile
# ---------------------------------------------------------------------------


@register(
    "window_decay_weighted_profile",
    doc="Continuous-decay user profile: each user's events weighted "
    "exp((ts - last_ts)/tau) relative to their OWN last event (tau = 1 "
    "day) — no order recursion, so unlike a classic EWMA it is one "
    "grouped aggregate after a per-user max; global distribution stats "
    "out.",
    tags=("feat", "events", "ext"),
    oracle="""
WITH lastts AS (
  SELECT user_id, max(ts) AS last_ts FROM events GROUP BY user_id
), wts AS (
  SELECT e.user_id,
         sum(value * exp(date_diff('second', e.ts, last_ts) / -86400.0))
           / sum(exp(date_diff('second', e.ts, last_ts) / -86400.0))
           AS decayed_value,
         count(*) AS n_events
  FROM events e JOIN lastts USING (user_id)
  GROUP BY e.user_id
)
SELECT count(*) AS n_users,
       round(avg(decayed_value), 6) AS avg_decayed,
       round(min(decayed_value), 6) AS min_decayed,
       round(max(decayed_value), 6) AS max_decayed
FROM wts
""",
)
def window_decay_weighted_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    lastts = ev.groupBy("user_id").agg(F.max("ts").alias("last_ts"))
    j = ev.join(lastts, "user_id")
    wgt = F.exp(
        (F.col("ts").cast("long") - F.col("last_ts").cast("long")) / 86400.0
    )
    wts = j.groupBy("user_id").agg(
        (F.sum(F.col("value") * wgt) / F.sum(wgt)).alias("decayed_value")
    )
    return wts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.avg("decayed_value"), 6).alias("avg_decayed"),
        F.round(F.min("decayed_value"), 6).alias("min_decayed"),
        F.round(F.max("decayed_value"), 6).alias("max_decayed"),
    )


# ---------------------------------------------------------------------------
# feat ext: cyclical calendar encoding (sin/cos features)
# ---------------------------------------------------------------------------


@register(
    "scalar_cyclical_calendar_features",
    doc="Cyclical calendar encoding: day-of-week and day-of-year mapped "
    "onto the unit circle (sin/cos pairs) so models see Sunday adjacent "
    "to Monday — verified via per-quarter means of the encoded features; "
    "pure narrow projection + one tiny aggregate.",
    tags=("feat", "scalar", "ext"),
    oracle="""
WITH enc AS (
  SELECT quarter(o_orderdate) AS qtr,
         sin(2 * pi() * (dayofweek(o_orderdate)) / 7.0)   AS dow_sin,
         cos(2 * pi() * (dayofweek(o_orderdate)) / 7.0)   AS dow_cos,
         sin(2 * pi() * (dayofyear(o_orderdate)) / 366.0) AS doy_sin,
         cos(2 * pi() * (dayofyear(o_orderdate)) / 366.0) AS doy_cos
  FROM orders
)
SELECT qtr, count(*) AS n_orders,
       round(avg(dow_sin), 6) AS avg_dow_sin,
       round(avg(dow_cos), 6) AS avg_dow_cos,
       round(avg(doy_sin), 6) AS avg_doy_sin,
       round(avg(doy_cos), 6) AS avg_doy_cos
FROM enc GROUP BY qtr ORDER BY qtr
""",
)
def scalar_cyclical_calendar_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    two_pi = 2 * 3.141592653589793
    # DuckDB dayofweek: 0=Sunday..6=Saturday; Spark dayofweek: 1..7 (Sun=1)
    dow = F.dayofweek("o_orderdate") - 1
    doy = F.dayofyear("o_orderdate")
    enc = orders.select(
        F.quarter("o_orderdate").alias("qtr"),
        F.sin(two_pi * dow / 7.0).alias("dow_sin"),
        F.cos(two_pi * dow / 7.0).alias("dow_cos"),
        F.sin(two_pi * doy / 366.0).alias("doy_sin"),
        F.cos(two_pi * doy / 366.0).alias("doy_cos"),
    )
    return (
        enc.groupBy("qtr")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("dow_sin"), 6).alias("avg_dow_sin"),
            F.round(F.avg("dow_cos"), 6).alias("avg_dow_cos"),
            F.round(F.avg("doy_sin"), 6).alias("avg_doy_sin"),
            F.round(F.avg("doy_cos"), 6).alias("avg_doy_cos"),
        )
        .orderBy("qtr")
    )


# ---------------------------------------------------------------------------
# J5 ext: many-to-many bridge with weighted allocation (Kimball pattern)
# ---------------------------------------------------------------------------


@register(
    "join_bridge_weighted_allocation",
    doc="Weighted bridge allocation: order-level revenue spread across "
    "the order's line items proportionally to extended price, rolled up "
    "to the supplier's nation — allocations are rounded to fixed 1e-4 "
    "units BEFORE summing so the conservation property (and the hash) "
    "is exact integer arithmetic; the per-order weight window runs on "
    "the l_orderkey shuffle the rollup needs anyway.",
    tags=("join", "window", "ext"),
    oracle="""
WITH w AS (
  SELECT l_orderkey, l_suppkey, l_extendedprice,
         sum(l_extendedprice) OVER (PARTITION BY l_orderkey) AS order_tot
  FROM lineitem
), alloc AS (
  SELECT l_suppkey,
         CAST(round(o_totalprice * (l_extendedprice / order_tot) * 10000)
              AS BIGINT) AS units
  FROM w JOIN orders ON o_orderkey = l_orderkey
)
SELECT n_name,
       count(*) AS n_allocations,
       round(sum(units) / 10000.0, 2) AS allocated_revenue
FROM alloc
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
GROUP BY n_name ORDER BY n_name
""",
)
def join_bridge_weighted_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    w = li.select(
        "l_orderkey",
        "l_suppkey",
        "l_extendedprice",
        F.sum("l_extendedprice").over(Window.partitionBy("l_orderkey")).alias("order_tot"),
    )
    alloc = w.join(orders, w.l_orderkey == orders.o_orderkey).select(
        "l_suppkey",
        F.round(
            F.col("o_totalprice") * (F.col("l_extendedprice") / F.col("order_tot")) * 10000
        )
        .cast("bigint")
        .alias("units"),
    )
    return (
        alloc.join(F.broadcast(supplier), alloc.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_allocations"),
            F.round(F.sum("units") / 10000.0, 2).alias("allocated_revenue"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# events ext: strictly-consecutive motif detection (view→click→purchase)
# ---------------------------------------------------------------------------


@register(
    "events_consecutive_motif",
    doc="Consecutive-motif mining: occurrences of the exact "
    "view->click->purchase sequence in ADJACENT positions of each "
    "user's timeline (double lead() on one user window) — the strict "
    "complement of the any-distance funnel entry; census of users and "
    "motif multiplicity.",
    tags=("events", "window", "ext"),
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER w AS t1,
         lead(event_type, 2) OVER w AS t2
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), per_user AS (
  SELECT user_id,
         sum(CASE WHEN event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
                  THEN 1 ELSE 0 END) AS n_motifs
  FROM seq GROUP BY user_id
)
SELECT count(*)                                        AS n_users,
       sum(CASE WHEN n_motifs > 0 THEN 1 ELSE 0 END)   AS n_users_with_motif,
       sum(n_motifs)                                    AS total_motifs,
       max(n_motifs)                                    AS max_motifs_per_user
FROM per_user
""",
)
def events_consecutive_motif(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    )
    hit = (
        (F.col("event_type") == "view")
        & (F.col("t1") == "click")
        & (F.col("t2") == "purchase")
    )
    per_user = seq.groupBy("user_id").agg(
        F.sum(F.when(hit, 1).otherwise(0)).alias("n_motifs")
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("n_motifs") > 0, 1).otherwise(0)).alias(
            "n_users_with_motif"
        ),
        F.sum("n_motifs").alias("total_motifs"),
        F.max("n_motifs").alias("max_motifs_per_user"),
    )


# ---------------------------------------------------------------------------
# scalar ext: Luhn checksum validation (digit-fold HOFs)
# ---------------------------------------------------------------------------


@register(
    "scalar_luhn_checksum",
    doc="Luhn mod-10 validation over synthetic 16-digit account numbers "
    "derived from order keys: right-to-left alternate-digit doubling via "
    "array higher-order functions (no UDF) — the data-quality primitive "
    "for card/IMEI-shaped columns; census of valid vs invalid.",
    tags=("scalar", "quality", "ext"),
    oracle="""
WITH nums AS (
  SELECT lpad(CAST(o_orderkey * 37 % 10000000000000000 AS VARCHAR), 16, '0')
           AS acct
  FROM orders
), digits AS (
  SELECT acct,
         list_sum(list_transform(range(16), i ->
           CASE WHEN i % 2 = 1
                THEN CASE WHEN CAST(acct[16 - i] AS INT) * 2 > 9
                          THEN CAST(acct[16 - i] AS INT) * 2 - 9
                          ELSE CAST(acct[16 - i] AS INT) * 2 END
                ELSE CAST(acct[16 - i] AS INT) END)) AS luhn_sum
  FROM nums
)
SELECT count(*) AS n_numbers,
       sum(CASE WHEN luhn_sum % 10 = 0 THEN 1 ELSE 0 END) AS n_valid,
       round(avg(CASE WHEN luhn_sum % 10 = 0 THEN 1.0 ELSE 0.0 END), 6)
         AS valid_rate
FROM digits
""",
)
def scalar_luhn_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    acct = F.lpad(
        (F.col("o_orderkey") * 37 % F.lit(10000000000000000)).cast("string"), 16, "0"
    )
    nums = orders.select(acct.alias("acct"))
    digit = lambda i: F.substring(F.col("acct"), 16 - i, 1).cast("int")  # noqa: E731

    def term(i):
        d = digit(i)
        doubled = F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)
        return F.when(F.lit(i % 2 == 1), doubled).otherwise(d)

    luhn_sum = term(0)
    for i in range(1, 16):
        luhn_sum = luhn_sum + term(i)
    digits = nums.select(luhn_sum.alias("luhn_sum"))
    valid = F.col("luhn_sum") % 10 == 0
    return digits.agg(
        F.count(F.lit(1)).alias("n_numbers"),
        F.sum(F.when(valid, 1).otherwise(0)).alias("n_valid"),
        F.round(F.avg(F.when(valid, 1.0).otherwise(0.0)), 6).alias("valid_rate"),
    )


# ---------------------------------------------------------------------------
# W5 ext: skyline (Pareto frontier) via strictly-cheaper RANGE frame
# ---------------------------------------------------------------------------


@register(
    "window_skyline_pareto_frontier",
    doc="Skyline operator: parts not dominated by any cheaper-AND-bigger "
    "part, computed with ONE RANGE window over integer price cents "
    "(frame 'strictly cheaper' = unbounded..1 preceding) keeping the "
    "running max size — O(n log n) instead of the naive O(n^2) "
    "dominance self-join; per-brand frontier census.",
    tags=("window", "skyline", "ext"),
    oracle="""
WITH p AS (
  SELECT p_partkey, p_brand, p_size,
         CAST(round(p_retailprice * 100) AS BIGINT) AS cents
  FROM part
), sk AS (
  SELECT p_partkey, p_brand, p_size,
         max(p_size) OVER (ORDER BY cents
                           RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS best_cheaper_size
  FROM p
)
SELECT p_brand,
       count(*) AS n_parts,
       sum(CASE WHEN best_cheaper_size IS NULL OR best_cheaper_size <= p_size
                THEN 1 ELSE 0 END) AS n_frontier
FROM sk GROUP BY p_brand ORDER BY p_brand
""",
)
def window_skyline_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    p = part.select(
        "p_brand",
        "p_size",
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("cents"),
    )
    w = Window.orderBy("cents").rangeBetween(Window.unboundedPreceding, -1)
    sk = p.select(
        "p_brand", "p_size", F.max("p_size").over(w).alias("best_cheaper_size")
    )
    on_frontier = F.col("best_cheaper_size").isNull() | (
        F.col("best_cheaper_size") <= F.col("p_size")
    )
    return (
        sk.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.when(on_frontier, 1).otherwise(0)).alias("n_frontier"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# dedup ext: phonetic blocking key (soundex-class consonant map, portable)
# ---------------------------------------------------------------------------


@register(
    "dedup_phonetic_blocking",
    doc="Phonetic blocking for entity resolution: a soundex-class key "
    "(first letter + consonant-class digits, vowels dropped) over the "
    "first word of part names, built ONLY from translate/regexp (no "
    "backreferences, so it runs identically on Java regex and RE2); "
    "block-size histogram shows the candidate-pair reduction.",
    tags=("dedup", "text", "ext"),
    oracle="""
WITH w1 AS (
  SELECT lower(string_split(p_name, ' ')[1]) AS w FROM part
), keys AS (
  SELECT w,
         substr(w, 1, 1) ||
         substr(regexp_replace(
           translate(substr(w, 2), 'bfpvcgjkqsxzdtlmnraeiouyhw',
                                   '11112222222233455600000000'),
           '0', '', 'g'), 1, 3) AS pkey
  FROM w1 WHERE w <> ''
), blocks AS (
  SELECT pkey, count(*) AS block_size, count(DISTINCT w) AS n_distinct_words
  FROM keys GROUP BY pkey
)
SELECT count(*)                 AS n_blocks,
       sum(block_size)          AS n_rows,
       sum(n_distinct_words)    AS n_distinct_words,
       max(block_size)          AS max_block,
       sum(block_size * (block_size - 1) / 2) AS n_candidate_pairs
FROM blocks
""",
)
def dedup_phonetic_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    w = F.lower(F.split("p_name", " ")[0])
    w1 = part.select(w.alias("w")).filter(F.col("w") != "")
    pkey = F.concat(
        F.substring("w", 1, 1),
        F.substring(
            F.regexp_replace(
                F.translate(
                    F.expr("substring(w, 2)"),
                    "bfpvcgjkqsxzdtlmnraeiouyhw",
                    "11112222222233455600000000",
                ),
                "0",
                "",
            ),
            1,
            3,
        ),
    )
    keys = w1.select("w", pkey.alias("pkey"))
    blocks = keys.groupBy("pkey").agg(
        F.count(F.lit(1)).alias("block_size"),
        F.countDistinct("w").alias("n_distinct_words"),
    )
    return blocks.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("block_size").alias("n_rows"),
        F.sum("n_distinct_words").alias("n_distinct_words"),
        F.max("block_size").alias("max_block"),
        F.sum(F.col("block_size") * (F.col("block_size") - 1) / 2).alias(
            "n_candidate_pairs"
        ),
    )


# ---------------------------------------------------------------------------
# J5 ext: brand basket co-occurrence (market-basket at order grain)
# ---------------------------------------------------------------------------


@register(
    "join_brand_basket_pairs",
    doc="Market-basket co-occurrence: orders containing both brands of a "
    "pair, for the top-5 brands by order reach — the (order, brand) "
    "distinct projection collapses the fact table FIRST, so the "
    "pair self-join runs on |orders x 5| rows, not line items; "
    "deterministic brand<brand pair ordering.",
    tags=("join", "basket", "ext"),
    oracle="""
WITH ob AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON p_partkey = l_partkey
), reach AS (
  SELECT p_brand, count(*) AS n_orders FROM ob GROUP BY p_brand
  ORDER BY n_orders DESC, p_brand LIMIT 5
), pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS n_both
  FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  WHERE a.p_brand IN (SELECT p_brand FROM reach)
    AND b.p_brand IN (SELECT p_brand FROM reach)
  GROUP BY 1, 2
)
SELECT brand_a, brand_b, n_both FROM pairs ORDER BY brand_a, brand_b
""",
)
def join_brand_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ob = (
        li.join(F.broadcast(part.select("p_partkey", "p_brand")), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    reach = (
        ob.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "p_brand")
        .limit(5)
        .select("p_brand")
    )
    obf = ob.join(F.broadcast(reach), "p_brand")
    a = obf.select(F.col("l_orderkey"), F.col("p_brand").alias("brand_a"))
    b = obf.select(F.col("l_orderkey").alias("ok2"), F.col("p_brand").alias("brand_b"))
    pairs = a.join(
        b, (a.l_orderkey == b.ok2) & (F.col("brand_a") < F.col("brand_b"))
    )
    return (
        pairs.groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .orderBy("brand_a", "brand_b")
    )


# ---------------------------------------------------------------------------
# scalar ext: haversine great-circle distance (portable trig)
# ---------------------------------------------------------------------------


@register(
    "scalar_haversine_distance",
    doc="Haversine great-circle distances between nations on a "
    "deterministic synthetic grid (lat = key*7-80, lon = key*13-170): "
    "the full trig pipeline (radians/sin/cos/asin/sqrt) in JVM "
    "expressions over the 300-pair self-join, rolled up per region "
    "pair — geo-distance breadth without geo fixtures.",
    tags=("scalar", "geo", "ext"),
    oracle="""
WITH geo AS (
  SELECT n_nationkey, n_regionkey,
         radians(n_nationkey * 7 - 80.0)   AS lat,
         radians(n_nationkey * 13 - 170.0) AS lon
  FROM nation
), pairs AS (
  SELECT a.n_regionkey AS region_a, b.n_regionkey AS region_b,
         2 * 6371.0 * asin(sqrt(
           pow(sin((b.lat - a.lat) / 2), 2) +
           cos(a.lat) * cos(b.lat) * pow(sin((b.lon - a.lon) / 2), 2)
         )) AS dist_km
  FROM geo a JOIN geo b ON a.n_nationkey < b.n_nationkey
)
SELECT least(region_a, region_b)    AS region_lo,
       greatest(region_a, region_b) AS region_hi,
       count(*)                     AS n_pairs,
       round(avg(dist_km), 3)       AS avg_dist_km,
       round(max(dist_km), 3)       AS max_dist_km
FROM pairs GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def scalar_haversine_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    geo = nation.select(
        "n_nationkey",
        "n_regionkey",
        F.radians(F.col("n_nationkey") * 7 - 80.0).alias("lat"),
        F.radians(F.col("n_nationkey") * 13 - 170.0).alias("lon"),
    )
    a = geo.select(
        F.col("n_nationkey").alias("ka"),
        F.col("n_regionkey").alias("region_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
    )
    b = geo.select(
        F.col("n_nationkey").alias("kb"),
        F.col("n_regionkey").alias("region_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
    )
    hav = (
        F.pow(F.sin((F.col("lat_b") - F.col("lat_a")) / 2), 2)
        + F.cos("lat_a") * F.cos("lat_b")
        * F.pow(F.sin((F.col("lon_b") - F.col("lon_a")) / 2), 2)
    )
    pairs = a.join(b, F.col("ka") < F.col("kb")).select(
        "region_a",
        "region_b",
        (2 * 6371.0 * F.asin(F.sqrt(hav))).alias("dist_km"),
    )
    return (
        pairs.groupBy(
            F.least("region_a", "region_b").alias("region_lo"),
            F.greatest("region_a", "region_b").alias("region_hi"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("dist_km"), 3).alias("avg_dist_km"),
            F.round(F.max("dist_km"), 3).alias("max_dist_km"),
        )
        .orderBy("region_lo", "region_hi")
    )


# ---------------------------------------------------------------------------
# corpus ext: importance-sampling weights + effective sample size
# ---------------------------------------------------------------------------


@register(
    "corpus_importance_weights_ess",
    doc="Importance-resampling diagnostics: per-document weights "
    "proportional to a temperature-sharpened length score (T=2), with "
    "the effective sample size ESS = (sum w)^2 / sum w^2 per source — "
    "the check that a data-mixing temperature isn't collapsing the "
    "corpus onto a few documents.  Plain sums, fully partial-aggregable.",
    tags=("corpus", "stats", "ext"),
    oracle="""
WITH w AS (
  SELECT source,
         pow(n_chars / 1000.0, 2) AS wt
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       round(sum(wt), 6) AS total_weight,
       round(pow(sum(wt), 2) / sum(wt * wt), 4) AS ess,
       round(pow(sum(wt), 2) / sum(wt * wt) / count(*), 6) AS ess_fraction
FROM w GROUP BY source ORDER BY source
""",
)
def corpus_importance_weights_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    wt = F.pow(F.col("n_chars") / 1000.0, 2)
    w = docs.select("source", wt.alias("wt"))
    return (
        w.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.sum("wt"), 6).alias("total_weight"),
            F.round(F.pow(F.sum("wt"), 2) / F.sum(F.col("wt") * F.col("wt")), 4).alias(
                "ess"
            ),
            F.round(
                F.pow(F.sum("wt"), 2)
                / F.sum(F.col("wt") * F.col("wt"))
                / F.count(F.lit(1)),
                6,
            ).alias("ess_fraction"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# A6 ext: winsorized mean (clamp at exact p5/p95, not drop)
# ---------------------------------------------------------------------------


@register(
    "agg_winsorized_mean",
    doc="Winsorized mean of account balances per market segment: values "
    "CLAMPED to the segment's exact [p5, p95] (the robust-mean variant "
    "that keeps n constant, unlike the trimmed mean which drops rows); "
    "percentile cutoffs from one grouped aggregate broadcast back.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH cuts AS (
  SELECT c_mktsegment,
         percentile_disc(0.05) WITHIN GROUP (ORDER BY c_acctbal) AS p5,
         percentile_disc(0.95) WITHIN GROUP (ORDER BY c_acctbal) AS p95
  FROM customer GROUP BY c_mktsegment
)
SELECT c.c_mktsegment,
       count(*) AS n_rows,
       round(avg(least(greatest(c_acctbal, p5), p95)), 4) AS winsorized_mean,
       round(avg(c_acctbal), 4) AS raw_mean
FROM customer c JOIN cuts USING (c_mktsegment)
GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
""",
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    cuts = customer.groupBy("c_mktsegment").agg(
        F.percentile_approx("c_acctbal", 0.05, 2147483647).alias("p5"),
        F.percentile_approx("c_acctbal", 0.95, 2147483647).alias("p95"),
    )
    j = customer.join(F.broadcast(cuts), "c_mktsegment")
    clamped = F.least(F.greatest(F.col("c_acctbal"), F.col("p5")), F.col("p95"))
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.avg(clamped), 4).alias("winsorized_mean"),
            F.round(F.avg("c_acctbal"), 4).alias("raw_mean"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# A6 ext: Gini coefficient per group via window-rank closed form
# ---------------------------------------------------------------------------


@register(
    "agg_gini_window_by_nation",
    doc="Per-nation Gini of customer spend via the rank closed form "
    "G = 2*sum(i*x_i)/(n*sum x) - (n+1)/n over spend sorted within each "
    "nation — the pure window-algebra spelling of the statistic the "
    "grouped-agg UDAF entry (udaf_gini_acctbal) computes in Pandas, "
    "here partitioned per group so no window ever goes global.",
    tags=("agg", "window", "stats", "ext"),
    oracle="""
WITH spend AS (
  SELECT c_nationkey, o_custkey, sum(o_totalprice) AS x
  FROM orders JOIN customer ON c_custkey = o_custkey
  GROUP BY c_nationkey, o_custkey
), ranked AS (
  SELECT c_nationkey, x,
         row_number() OVER (PARTITION BY c_nationkey ORDER BY x, o_custkey) AS i
  FROM spend
)
SELECT n_name,
       count(*) AS n_customers,
       round(2.0 * sum(i * x) / (count(*) * sum(x))
             - (count(*) + 1.0) / count(*), 6) AS gini
FROM ranked JOIN nation ON n_nationkey = c_nationkey
GROUP BY n_name ORDER BY n_name
""",
)
def agg_gini_window_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    spend = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.sum("o_totalprice").alias("x"))
    )
    w = Window.partitionBy("c_nationkey").orderBy("x", "o_custkey")
    ranked = spend.select("c_nationkey", "x", F.row_number().over(w).alias("i"))
    n = F.count(F.lit(1))
    return (
        ranked.join(F.broadcast(nation), ranked.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            n.alias("n_customers"),
            F.round(
                2.0 * F.sum(F.col("i") * F.col("x")) / (n * F.sum("x"))
                - (n + 1.0) / n,
                6,
            ).alias("gini"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# A6 ext: fulfillment lead-time percentiles per priority
# ---------------------------------------------------------------------------


@register(
    "agg_leadtime_percentiles",
    doc="Fulfillment lead time (ship date - order date, days) per order "
    "priority: exact discrete p50/p90/p99 plus mean — the SLA profile, "
    "one fact join and one grouped order-statistic aggregate.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH lt AS (
  SELECT o_orderpriority,
         date_diff('day', o_orderdate, l_shipdate) AS days
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
)
SELECT o_orderpriority,
       count(*) AS n_lines,
       round(avg(days), 4) AS avg_days,
       percentile_disc(0.5)  WITHIN GROUP (ORDER BY days) AS p50_days,
       percentile_disc(0.9)  WITHIN GROUP (ORDER BY days) AS p90_days,
       percentile_disc(0.99) WITHIN GROUP (ORDER BY days) AS p99_days
FROM lt GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def agg_leadtime_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lt = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority", F.datediff("l_shipdate", "o_orderdate").alias("days")
    )
    return (
        lt.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.avg("days"), 4).alias("avg_days"),
            F.percentile_approx("days", 0.5, 2147483647).alias("p50_days"),
            F.percentile_approx("days", 0.9, 2147483647).alias("p90_days"),
            F.percentile_approx("days", 0.99, 2147483647).alias("p99_days"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# A6 ext: DAU/MAU stickiness (growth-metric rollup)
# ---------------------------------------------------------------------------


@register(
    "agg_dau_mau_stickiness",
    doc="DAU/MAU stickiness per calendar month of the event stream: "
    "distinct daily actives averaged over the month divided by the "
    "month's distinct actives — two distinct-count aggregates at "
    "different grains, joined on the month key; the classic engagement "
    "ratio without any fact self-join.",
    tags=("agg", "events", "ext"),
    oracle="""
WITH dau AS (
  SELECT CAST(ts AS DATE) AS day, count(DISTINCT user_id) AS dau
  FROM events GROUP BY 1
), mau AS (
  SELECT year(ts) * 100 + month(ts) AS yyyymm, count(DISTINCT user_id) AS mau
  FROM events GROUP BY 1
), davg AS (
  SELECT year(day) * 100 + month(day) AS yyyymm,
         avg(dau) AS avg_dau, count(*) AS n_days
  FROM dau GROUP BY 1
)
SELECT yyyymm, n_days, round(avg_dau, 4) AS avg_dau, mau,
       round(avg_dau / mau, 6) AS stickiness
FROM davg JOIN mau USING (yyyymm)
ORDER BY yyyymm
""",
)
def agg_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dau = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    mau = ev.groupBy((F.year("ts") * 100 + F.month("ts")).alias("yyyymm")).agg(
        F.countDistinct("user_id").alias("mau")
    )
    davg = dau.groupBy((F.year("day") * 100 + F.month("day")).alias("yyyymm")).agg(
        F.avg("dau").alias("avg_dau"), F.count(F.lit(1)).alias("n_days")
    )
    return (
        davg.join(mau, "yyyymm")
        .select(
            "yyyymm",
            "n_days",
            F.round("avg_dau", 4).alias("avg_dau"),
            "mau",
            F.round(F.col("avg_dau") / F.col("mau"), 6).alias("stickiness"),
        )
        .orderBy("yyyymm")
    )


# ---------------------------------------------------------------------------
# scalar ext: IPv4 int <-> dotted-quad roundtrip + subnet census
# ---------------------------------------------------------------------------


@register(
    "scalar_ipv4_roundtrip",
    doc="IPv4 plumbing: synthetic 32-bit addresses from user ids, "
    "rendered to dotted-quad with pure integer math, re-parsed back "
    "(split + shift-sum) and verified equal, then a /16 subnet census — "
    "the network-telemetry column toolkit without any UDF.",
    tags=("scalar", "ext"),
    oracle="""
WITH ip AS (
  SELECT (user_id * 2654435761) % 4294967296 AS addr FROM events
), quad AS (
  SELECT addr,
         (addr // 16777216) % 256 AS o1, (addr // 65536) % 256 AS o2,
         (addr // 256) % 256 AS o3, addr % 256 AS o4
  FROM ip
), txt AS (
  SELECT addr, o1 || '.' || o2 || '.' || o3 || '.' || o4 AS dotted,
         o1 * 16777216 + o2 * 65536 + o3 * 256 + o4 AS reparsed,
         o1 * 256 + o2 AS subnet16
  FROM quad
)
SELECT count(*) AS n_addrs,
       sum(CASE WHEN reparsed = addr THEN 1 ELSE 0 END) AS n_roundtrip_ok,
       count(DISTINCT subnet16) AS n_subnets_16,
       min(dotted) AS min_dotted
FROM txt
""",
)
def scalar_ipv4_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ip = ev.select(((F.col("user_id") * 2654435761) % 4294967296).alias("addr"))
    o1 = F.expr("(addr div 16777216) % 256")
    o2 = F.expr("(addr div 65536) % 256")
    o3 = F.expr("(addr div 256) % 256")
    o4 = F.col("addr") % 256
    quad = ip.select("addr", o1.alias("o1"), o2.alias("o2"), o3.alias("o3"), o4.alias("o4"))
    txt = quad.select(
        "addr",
        F.concat_ws(".", "o1", "o2", "o3", "o4").alias("dotted"),
        (
            F.col("o1") * 16777216 + F.col("o2") * 65536 + F.col("o3") * 256 + F.col("o4")
        ).alias("reparsed"),
        (F.col("o1") * 256 + F.col("o2")).alias("subnet16"),
    )
    return txt.agg(
        F.count(F.lit(1)).alias("n_addrs"),
        F.sum(F.when(F.col("reparsed") == F.col("addr"), 1).otherwise(0)).alias(
            "n_roundtrip_ok"
        ),
        F.countDistinct("subnet16").alias("n_subnets_16"),
        F.min("dotted").alias("min_dotted"),
    )


# ---------------------------------------------------------------------------
# text ext: tokenizer fertility (BPE-ish tokens per whitespace word)
# ---------------------------------------------------------------------------


@register(
    "text_tokenizer_fertility",
    doc="Tokenizer fertility: BPE-ish regex token count over whitespace "
    "word count per document, profiled per language — the compression "
    "diagnostic that predicts a tokenizer's cost multiplier on a corpus; "
    "two regexp counts in one narrow pass.",
    tags=("text", "corpus", "ext"),
    oracle="""
WITH t AS (
  SELECT lang,
         len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]')) AS n_bpe,
         len(string_split_regex(trim(text), '\\s+')) AS n_words
  FROM documents
)
SELECT lang,
       count(*) AS n_docs,
       sum(n_bpe)   AS n_bpe_tokens,
       sum(n_words) AS n_words,
       round(sum(n_bpe)::DOUBLE / sum(n_words), 6) AS fertility
FROM t GROUP BY lang ORDER BY lang
""",
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_bpe = F.size(F.regexp_extract_all(F.lower("text"), F.lit(r"[a-z0-9]+|[^a-z0-9\s]"), 0))
    n_words = F.size(F.split(F.trim("text"), r"\s+"))
    t = docs.select("lang", n_bpe.alias("n_bpe"), n_words.alias("n_words"))
    return (
        t.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bpe").alias("n_bpe_tokens"),
            F.sum("n_words").alias("n_words"),
            F.round(F.sum("n_bpe").cast("double") / F.sum("n_words"), 6).alias(
                "fertility"
            ),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# A6 ext: KL divergence between two segments' priority distributions
# ---------------------------------------------------------------------------


@register(
    "agg_kl_divergence_segments",
    doc="KL divergence D(P||Q) between the order-priority distributions "
    "of BUILDING (P) and MACHINERY (Q) customers, with add-one "
    "smoothing so zero cells stay finite — distribution-drift "
    "measurement from two conditional aggregates in one fact pass.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH cells AS (
  SELECT o_orderpriority,
         sum(CASE WHEN c_mktsegment = 'BUILDING'  THEN 1 ELSE 0 END) + 1 AS np,
         sum(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END) + 1 AS nq
  FROM orders JOIN customer ON c_custkey = o_custkey
  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
  GROUP BY o_orderpriority
), tot AS (
  SELECT sum(np) AS tp, sum(nq) AS tq FROM cells
)
SELECT any_value(tp - 5) AS n_building_orders,
       any_value(tq - 5) AS n_machinery_orders,
       count(*) AS n_categories,
       round(sum((np::DOUBLE / tp) * ln((np::DOUBLE / tp) / (nq::DOUBLE / tq))), 8)
         AS kl_p_q
FROM cells CROSS JOIN tot
""",
)
def agg_kl_divergence_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    seg = F.col("c_mktsegment")
    cells = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .filter(seg.isin("BUILDING", "MACHINERY"))
        .groupBy("o_orderpriority")
        .agg(
            (F.sum(F.when(seg == "BUILDING", 1).otherwise(0)) + 1).alias("np"),
            (F.sum(F.when(seg == "MACHINERY", 1).otherwise(0)) + 1).alias("nq"),
        )
    )
    tot = cells.agg(F.sum("np").alias("tp"), F.sum("nq").alias("tq"))
    p = F.col("np").cast("double") / F.col("tp")
    q = F.col("nq").cast("double") / F.col("tq")
    return (
        cells.crossJoin(F.broadcast(tot))
        .agg(
            F.any_value(F.col("tp") - 5).alias("n_building_orders"),
            F.any_value(F.col("tq") - 5).alias("n_machinery_orders"),
            F.count(F.lit(1)).alias("n_categories"),
            F.round(F.sum(p * F.log(p / q)), 8).alias("kl_p_q"),
        )
    )
