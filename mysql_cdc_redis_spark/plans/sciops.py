"""Scientific / experimentation analytics (SURVEY.md §2 EXT rows A6/W5).

The reference exposes only counts (rcache.py:26-33); these are EXT
operators a warehouse replacing it would serve to experimentation and
risk teams: multiple-testing control (Benjamini-Hochberg), heavy-tail
estimation (Hill), variance reduction (CUPED), and two classic
signal-decomposition windows (RSI, trend/seasonal/residual).

Scale stance (100 TB): every query aggregates down to a tiny keyed
relation (25 nations, 5 priorities, <100 months) BEFORE any window or
cross join, so the expensive part is one partial+final hash aggregate
over the fact table; windows then run on driver-trivial cardinalities
but still distributed (no collect). Top-k windows rewrite to
WindowGroupLimit (partial per-group limit before the exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .catalog import register

# ---------------------------------------------------------------------------
# A6 ext: Benjamini-Hochberg FDR over per-nation mean tests
# ---------------------------------------------------------------------------

_BH_ALPHA = 0.10


@register(
    "agg_benjamini_hochberg",
    doc="Per-nation z-test of mean c_acctbal against the global mean with "
    "Benjamini-Hochberg FDR control at alpha=0.10: one hash aggregate to "
    "25 nation cells, a broadcast of the single-row global stats, then the "
    "step-up rule as a rank window + running max. Normal CDF uses the "
    "logistic approximation Phi(x)~=1/(1+exp(-1.702x)) identically on both "
    "engines so p-values are bit-comparable.",
    tags=("agg", "stats", "ext"),
    oracle=f"""
WITH per AS (
  SELECT c_nationkey, count(*) AS n_rows,
         avg(c_acctbal) AS mu, var_pop(c_acctbal) AS v
  FROM customer GROUP BY c_nationkey
), gstats AS (
  SELECT avg(c_acctbal) AS mu0 FROM customer
), z AS (
  SELECT c_nationkey, n_rows,
         (mu - mu0) / sqrt(v / n_rows) AS zval,
         round(2.0 / (1.0 + exp(1.702 * abs((mu - mu0) / sqrt(v / n_rows)))), 9) AS pval
  FROM per CROSS JOIN gstats
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY pval, c_nationkey) AS p_rank,
         count(*) OVER () AS m
  FROM z
), cut AS (
  SELECT *, max(CASE WHEN pval <= p_rank * {_BH_ALPHA} / m THEN p_rank ELSE 0 END)
              OVER () AS k_max
  FROM ranked
)
SELECT c_nationkey, n_rows, round(zval, 6) AS zval, pval, p_rank,
       p_rank <= k_max AS discovery
FROM cut ORDER BY p_rank
""",
)
def agg_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    per = cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.avg("c_acctbal").alias("mu"),
        F.var_pop("c_acctbal").alias("v"),
    )
    glob = cust.agg(F.avg("c_acctbal").alias("mu0"))
    zval = (F.col("mu") - F.col("mu0")) / F.sqrt(F.col("v") / F.col("n_rows"))
    z = per.crossJoin(F.broadcast(glob)).select(
        "c_nationkey",
        "n_rows",
        zval.alias("zraw"),
        F.round(2.0 / (1.0 + F.exp(1.702 * F.abs(zval))), 9).alias("pval"),
    )
    w_all = Window.partitionBy()
    ranked = z.withColumn(
        "p_rank", F.row_number().over(Window.orderBy("pval", "c_nationkey"))
    ).withColumn("m", F.count(F.lit(1)).over(w_all))
    crit = F.col("p_rank") * F.lit(_BH_ALPHA) / F.col("m")
    cut = ranked.withColumn(
        "k_max",
        F.max(F.when(F.col("pval") <= crit, F.col("p_rank")).otherwise(0)).over(w_all),
    )
    return cut.select(
        "c_nationkey",
        "n_rows",
        F.round("zraw", 6).alias("zval"),
        "pval",
        "p_rank",
        (F.col("p_rank") <= F.col("k_max")).alias("discovery"),
    ).orderBy("p_rank")


# ---------------------------------------------------------------------------
# A6 ext: Hill tail-index estimator over top-k order values
# ---------------------------------------------------------------------------

_HILL_K = 100


@register(
    "agg_hill_tail_index",
    doc="Hill estimator of the Pareto tail index of o_totalprice per order "
    "priority: top-(k+1) per group via a rank window Spark rewrites into "
    "WindowGroupLimit (partial top-k before the exchange — the fact table "
    "is never globally sorted), then one aggregate computes "
    "mean(ln x_i) - ln x_(k+1) and alpha = 1/hill.",
    tags=("agg", "stats", "ext"),
    oracle=f"""
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
), top AS (
  SELECT * FROM ranked WHERE rn <= {_HILL_K + 1}
), hill AS (
  SELECT o_orderpriority,
         avg(CASE WHEN rn <= {_HILL_K} THEN ln(o_totalprice) END)
           - ln(max(CASE WHEN rn = {_HILL_K + 1} THEN o_totalprice END)) AS h
  FROM top GROUP BY o_orderpriority
)
SELECT o_orderpriority, round(h, 6) AS hill_estimate,
       round(1.0 / h, 6) AS tail_alpha
FROM hill ORDER BY o_orderpriority
""",
)
def agg_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    top = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _HILL_K + 1)
    )
    hill = top.groupBy("o_orderpriority").agg(
        (
            F.avg(F.when(F.col("rn") <= _HILL_K, F.log("o_totalprice")))
            - F.log(F.max(F.when(F.col("rn") == _HILL_K + 1, F.col("o_totalprice"))))
        ).alias("h")
    )
    return hill.select(
        "o_orderpriority",
        F.round("h", 6).alias("hill_estimate"),
        F.round(1.0 / F.col("h"), 6).alias("tail_alpha"),
    ).orderBy("o_orderpriority")


# ---------------------------------------------------------------------------
# A6 ext: CUPED variance reduction (pre-period covariate adjustment)
# ---------------------------------------------------------------------------


@register(
    "agg_cuped_adjustment",
    doc="CUPED (controlled-experiment using pre-experiment data): customer "
    "1997 revenue adjusted by the 1996 pre-period covariate, "
    "theta = cov(post,pre)/var(pre) from one pass of product-moment "
    "aggregates; reports per-segment raw vs adjusted means and the global "
    "variance-reduction ratio. One shuffle to per-customer totals, one "
    "re-aggregation; the theta row broadcasts.",
    tags=("agg", "stats", "experiment", "ext"),
    oracle="""
WITH per_cust AS (
  SELECT c.c_custkey, any_value(c.c_mktsegment) AS seg,
         coalesce(sum(CASE WHEN year(o.o_orderdate) = 1996
                           THEN o.o_totalprice END), 0) AS pre,
         coalesce(sum(CASE WHEN year(o.o_orderdate) = 1997
                           THEN o.o_totalprice END), 0) AS post
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  WHERE year(o.o_orderdate) IN (1996, 1997)
  GROUP BY c.c_custkey
), theta AS (
  SELECT covar_pop(post, pre) / var_pop(pre) AS th, avg(pre) AS pre_mean,
         var_pop(post) AS post_var
  FROM per_cust
), adj AS (
  SELECT seg, post, post - th * (pre - pre_mean) AS post_adj, th, post_var
  FROM per_cust CROSS JOIN theta
)
SELECT seg, count(*) AS n_customers,
       round(avg(post), 4) AS raw_mean,
       round(avg(post_adj), 4) AS cuped_mean,
       round(any_value(th), 6) AS theta,
       round(var_pop(post_adj) / any_value(post_var), 6) AS seg_var_vs_global
FROM adj GROUP BY seg ORDER BY seg
""",
)
def agg_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    per_cust = (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .filter(yr.isin(1996, 1997))
        .groupBy("c_custkey")
        .agg(
            F.any_value("c_mktsegment").alias("seg"),
            F.coalesce(
                F.sum(F.when(yr == 1996, F.col("o_totalprice"))), F.lit(0.0)
            ).alias("pre"),
            F.coalesce(
                F.sum(F.when(yr == 1997, F.col("o_totalprice"))), F.lit(0.0)
            ).alias("post"),
        )
    )
    theta = per_cust.agg(
        (F.covar_pop("post", "pre") / F.var_pop("pre")).alias("th"),
        F.avg("pre").alias("pre_mean"),
        F.var_pop("post").alias("post_var"),
    )
    adj = per_cust.crossJoin(F.broadcast(theta)).withColumn(
        "post_adj", F.col("post") - F.col("th") * (F.col("pre") - F.col("pre_mean"))
    )
    return (
        adj.groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("post"), 4).alias("raw_mean"),
            F.round(F.avg("post_adj"), 4).alias("cuped_mean"),
            F.round(F.any_value("th"), 6).alias("theta"),
            F.round(F.var_pop("post_adj") / F.any_value("post_var"), 6).alias(
                "seg_var_vs_global"
            ),
        )
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# W5 ext: RSI oscillator over the monthly revenue series
# ---------------------------------------------------------------------------

_RSI_N = 6


@register(
    "window_rsi_indicator",
    doc="Relative Strength Index (simple-average form, 6-period) over the "
    "monthly revenue series: monthly sums are rounded on both engines "
    "before differencing so the window arithmetic is bit-identical; gains "
    "and losses average over a trailing ROWS frame; only complete windows "
    "are emitted. The fact-table scan is one hash aggregate; the window "
    "runs on 80 rows.",
    tags=("window", "timeseries", "ext"),
    oracle=f"""
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS mon,
         round(sum(o_totalprice), 2) AS rev
  FROM orders GROUP BY 1
), d AS (
  SELECT mon, rev, rev - lag(rev) OVER (ORDER BY mon) AS delta,
         row_number() OVER (ORDER BY mon) AS rn
  FROM monthly
), gl AS (
  SELECT mon, rn,
         avg(greatest(delta, 0)) OVER (ORDER BY mon
             ROWS BETWEEN {_RSI_N - 1} PRECEDING AND CURRENT ROW) AS avg_gain,
         avg(greatest(-delta, 0)) OVER (ORDER BY mon
             ROWS BETWEEN {_RSI_N - 1} PRECEDING AND CURRENT ROW) AS avg_loss
  FROM d WHERE delta IS NOT NULL
)
SELECT cast(mon AS DATE) AS mon,
       round(CASE WHEN avg_loss = 0 THEN 100.0
                  ELSE 100.0 - 100.0 / (1.0 + avg_gain / avg_loss) END, 6) AS rsi
FROM gl WHERE rn > {_RSI_N}
ORDER BY mon
""",
)
def window_rsi_indicator(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(F.date_trunc("month", "o_orderdate").alias("mon"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    w = Window.orderBy("mon")
    d = monthly.select(
        "mon",
        (F.col("rev") - F.lag("rev").over(w)).alias("delta"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("delta").isNotNull())
    frame = Window.orderBy("mon").rowsBetween(-(_RSI_N - 1), 0)
    gl = d.select(
        "mon",
        "rn",
        F.avg(F.greatest(F.col("delta"), F.lit(0.0))).over(frame).alias("avg_gain"),
        F.avg(F.greatest(-F.col("delta"), F.lit(0.0))).over(frame).alias("avg_loss"),
    )
    rsi = F.when(F.col("avg_loss") == 0, F.lit(100.0)).otherwise(
        100.0 - 100.0 / (1.0 + F.col("avg_gain") / F.col("avg_loss"))
    )
    return (
        gl.filter(F.col("rn") > _RSI_N)
        .select(F.col("mon").cast("date").alias("mon"), F.round(rsi, 6).alias("rsi"))
        .orderBy("mon")
    )


# ---------------------------------------------------------------------------
# W5 ext: classical trend / seasonal / residual decomposition
# ---------------------------------------------------------------------------


@register(
    "window_seasonal_decompose",
    doc="Classical additive decomposition of monthly revenue: trend = "
    "trailing 12-month average (complete windows only), seasonal = "
    "month-of-year mean of the detrended series, residual flagged at "
    "|r| > 2*stddev. Fact scan aggregates to 80 months; the seasonal "
    "profile (12 rows) re-joins by month number — broadcast-sized at any "
    "data scale.",
    tags=("window", "timeseries", "ext"),
    oracle="""
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS mon,
         round(sum(o_totalprice), 2) AS rev
  FROM orders GROUP BY 1
), t AS (
  SELECT mon, rev,
         avg(rev) OVER (ORDER BY mon ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
           AS trend,
         row_number() OVER (ORDER BY mon) AS rn
  FROM monthly
), dt AS (
  SELECT mon, rev, trend, rev - trend AS detr, month(mon) AS moy
  FROM t WHERE rn >= 12
), season AS (
  SELECT moy, avg(detr) AS seasonal FROM dt GROUP BY moy
), r AS (
  SELECT d.mon, d.rev, d.trend, s.seasonal, d.detr - s.seasonal AS resid
  FROM dt d JOIN season s ON s.moy = d.moy
), sd AS (
  SELECT stddev_pop(resid) AS sigma FROM r
)
SELECT cast(mon AS DATE) AS mon, rev,
       round(trend, 4) AS trend, round(seasonal, 4) AS seasonal,
       round(resid, 4) AS resid,
       abs(resid) > 2 * sigma AS is_anomaly
FROM r CROSS JOIN sd
ORDER BY mon
""",
)
def window_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(F.date_trunc("month", "o_orderdate").alias("mon"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    w = Window.orderBy("mon")
    t = monthly.select(
        "mon",
        "rev",
        F.avg("rev").over(w.rowsBetween(-11, 0)).alias("trend"),
        F.row_number().over(w).alias("rn"),
    )
    dt = t.filter(F.col("rn") >= 12).select(
        "mon",
        "rev",
        "trend",
        (F.col("rev") - F.col("trend")).alias("detr"),
        F.month("mon").alias("moy"),
    )
    season = dt.groupBy("moy").agg(F.avg("detr").alias("seasonal"))
    r = dt.join(F.broadcast(season), "moy").select(
        "mon",
        "rev",
        "trend",
        "seasonal",
        (F.col("detr") - F.col("seasonal")).alias("resid"),
    )
    sd = r.agg(F.stddev_pop("resid").alias("sigma"))
    return (
        r.crossJoin(F.broadcast(sd))
        .select(
            F.col("mon").cast("date").alias("mon"),
            "rev",
            F.round("trend", 4).alias("trend"),
            F.round("seasonal", 4).alias("seasonal"),
            F.round("resid", 4).alias("resid"),
            (F.abs(F.col("resid")) > 2 * F.col("sigma")).alias("is_anomaly"),
        )
        .orderBy("mon")
    )


# ---------------------------------------------------------------------------
# J5/J6 ext: Adamic-Adar link prediction over the supplier–customer bipartite
# ---------------------------------------------------------------------------


@register(
    "graph_adamic_adar",
    doc="Adamic-Adar link prediction for supplier pairs via shared "
    "customers: distinct (supplier, customer) edges from lineitem x orders, "
    "customer degree from one hash agg, pair scores = sum 1/ln(deg) from a "
    "self-join blocked on the customer key. Degree-1 customers are pruned "
    "(they contribute no pairs and 1/ln(1) diverges); at 100 TB the same "
    "pruning generalizes to a hub cap so the per-key pair fan-out stays "
    "bounded. Ranking uses the 6-dp rounded score with a key tiebreak so "
    "both engines cut the same top-20.",
    tags=("graph", "join", "ext"),
    oracle="""
WITH sc AS (
  SELECT DISTINCT l.l_suppkey AS s, o.o_custkey AS c
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), deg AS (
  SELECT c, count(*) AS d FROM sc GROUP BY c HAVING count(*) >= 2
), pairs AS (
  SELECT a.s AS s1, b.s AS s2, count(*) AS n_common,
         round(sum(1.0 / ln(deg.d)), 6) AS aa_score
  FROM sc a JOIN sc b ON a.c = b.c AND a.s < b.s
  JOIN deg ON deg.c = a.c
  GROUP BY a.s, b.s
)
SELECT s1, s2, n_common, aa_score
FROM pairs ORDER BY aa_score DESC, s1, s2 LIMIT 20
""",
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sc = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
    )
    deg = (
        sc.groupBy(F.col("c").alias("dc"))
        .agg(F.count(F.lit(1)).alias("d"))
        .filter(F.col("d") >= 2)
    )
    a = sc.alias("a")
    b = sc.alias("b")
    pairs = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.s") < F.col("b.s")))
        .join(deg, F.col("a.c") == F.col("dc"))
        .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.round(F.sum(1.0 / F.log(F.col("d"))), 6).alias("aa_score"),
        )
    )
    return pairs.orderBy(F.desc("aa_score"), "s1", "s2").limit(20)


# ---------------------------------------------------------------------------
# J5 ext: one k-core peeling iteration on the part co-purchase graph
# ---------------------------------------------------------------------------


@register(
    "graph_kcore_peel_step",
    doc="One k-core peeling iteration on the part co-purchase graph "
    "(parts co-occurring in an order are adjacent): distinct edges from a "
    "blocked self-join on the order key, degrees from one agg over both "
    "edge directions, threshold k = ceil(p75 of degree) computed on-engine, "
    "peel, then recount induced degrees. The full iterative k-core is this "
    "step in a loop with a shrinking edge set (each step one shuffle).",
    tags=("graph", "ext"),
    oracle="""
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), und AS (
  SELECT p1 AS node, p2 AS nbr FROM edges
  UNION ALL SELECT p2, p1 FROM edges
), deg0 AS (
  SELECT node, count(*) AS d FROM und GROUP BY node
), thr AS (
  SELECT ceil(quantile_cont(d, 0.75)) AS k FROM deg0
), survivors AS (
  SELECT node FROM deg0 CROSS JOIN thr WHERE d >= k
), induced AS (
  SELECT e.p1, e.p2 FROM edges e
  JOIN survivors s1 ON s1.node = e.p1
  JOIN survivors s2 ON s2.node = e.p2
)
SELECT (SELECT count(*) FROM deg0)      AS n_nodes0,
       (SELECT count(*) FROM edges)     AS n_edges0,
       (SELECT k FROM thr)              AS k_threshold,
       (SELECT count(*) FROM survivors) AS n_survivors,
       (SELECT count(*) FROM induced)   AS n_edges_induced,
       (SELECT round(avg(d), 4) FROM deg0) AS avg_deg0
""",
)
def graph_kcore_peel_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2"))
        .distinct()
    )
    und = edges.select(F.col("p1").alias("node")).unionAll(
        edges.select(F.col("p2").alias("node"))
    )
    deg0 = und.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    thr = deg0.agg(F.ceil(F.expr("percentile(d, 0.75)")).alias("k"))
    survivors = deg0.crossJoin(F.broadcast(thr)).filter(F.col("d") >= F.col("k")).select("node")
    induced = (
        edges.join(survivors.withColumnRenamed("node", "p1"), "p1")
        .join(survivors.withColumnRenamed("node", "p2"), "p2")
    )
    stats = deg0.agg(
        F.count(F.lit(1)).alias("n_nodes0"), F.round(F.avg("d"), 4).alias("avg_deg0")
    )
    return (
        stats.crossJoin(F.broadcast(edges.agg(F.count(F.lit(1)).alias("n_edges0"))))
        .crossJoin(F.broadcast(thr.select(F.col("k").alias("k_threshold"))))
        .crossJoin(F.broadcast(survivors.agg(F.count(F.lit(1)).alias("n_survivors"))))
        .crossJoin(F.broadcast(induced.agg(F.count(F.lit(1)).alias("n_edges_induced"))))
        .select(
            "n_nodes0", "n_edges0", "k_threshold", "n_survivors",
            "n_edges_induced", "avg_deg0",
        )
    )


# ---------------------------------------------------------------------------
# P8 ext: edit-distance profile of part names within a brand
# ---------------------------------------------------------------------------


@register(
    "scalar_levenshtein_brand_names",
    doc="Levenshtein distance between consecutive part names within each "
    "brand (ordered by part key): JVM-side levenshtein() inside a lag "
    "window, aggregated to a per-brand edit-distance profile. Stays in "
    "whole-stage codegen end to end; one shuffle on the brand key.",
    tags=("scalar", "string", "ext"),
    oracle="""
WITH lagged AS (
  SELECT p_brand,
         levenshtein(p_name, lag(p_name) OVER
             (PARTITION BY p_brand ORDER BY p_partkey)) AS dist
  FROM part
)
SELECT p_brand, count(dist) AS n_pairs,
       round(avg(dist), 4) AS avg_dist,
       min(dist) AS min_dist, max(dist) AS max_dist
FROM lagged GROUP BY p_brand ORDER BY p_brand
""",
)
def scalar_levenshtein_brand_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_partkey")
    lagged = part.select(
        "p_brand",
        F.levenshtein(F.col("p_name"), F.lag("p_name").over(w)).alias("dist"),
    )
    return (
        lagged.groupBy("p_brand")
        .agg(
            F.count("dist").alias("n_pairs"),
            F.round(F.avg("dist"), 4).alias("avg_dist"),
            F.min("dist").alias("min_dist"),
            F.max("dist").alias("max_dist"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# P8 ext: deterministic namespaced UUIDv5-style surrogate ids
# ---------------------------------------------------------------------------


@register(
    "scalar_uuid5_mint",
    doc="Deterministic UUIDv5-style ids minted from md5(namespace:key) with "
    "the version/variant nibbles pinned (RFC 4122 layout): pure string "
    "expressions, fully codegen'd, embarrassingly parallel at any scale — "
    "the row-identity analog of the reference's composite rid "
    "(rcache.py:186-193) for tables lacking a natural key.",
    tags=("scalar", "string", "ext"),
    oracle="""
WITH h AS (
  SELECT p_partkey, md5('part:' || cast(p_partkey AS VARCHAR)) AS x
  FROM part WHERE p_partkey <= 200
)
SELECT p_partkey,
       substr(x, 1, 8) || '-' || substr(x, 9, 4) || '-5' || substr(x, 14, 3)
         || '-8' || substr(x, 18, 3) || '-' || substr(x, 21, 12) AS uuid5
FROM h ORDER BY p_partkey
""",
)
def scalar_uuid5_mint(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    x = F.md5(F.concat(F.lit("part:"), F.col("p_partkey").cast("string")))
    h = part.select("p_partkey", x.alias("x"))
    uuid5 = F.concat(
        F.substring("x", 1, 8), F.lit("-"),
        F.substring("x", 9, 4), F.lit("-5"),
        F.substring("x", 14, 3), F.lit("-8"),
        F.substring("x", 18, 3), F.lit("-"),
        F.substring("x", 21, 12),
    )
    return h.select("p_partkey", uuid5.alias("uuid5")).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# A6/W5 ext: funnel time-to-convert distribution
# ---------------------------------------------------------------------------


@register(
    "events_time_to_convert",
    doc="Time-to-convert distribution for the view->purchase funnel: per "
    "user, first view and first subsequent purchase (one hash aggregate "
    "with conditional mins — no self-join), then exact latency percentiles "
    "over converters.  Second-granularity arithmetic (unix_timestamp vs "
    "date_diff) matches the engines' shared floor semantics.",
    tags=("events", "funnel", "ext"),
    oracle="""
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events GROUP BY user_id
), conv AS (
  SELECT user_id,
         date_diff('second', first_view, first_purchase) / 3600.0 AS lat_h
  FROM per_user
  WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
        AND first_purchase >= first_view
)
SELECT (SELECT count(*) FROM per_user WHERE first_view IS NOT NULL) AS n_viewers,
       count(*) AS n_converted,
       round(count(*) * 1.0 /
         (SELECT count(*) FROM per_user WHERE first_view IS NOT NULL), 6)
         AS conversion_rate,
       round(quantile_cont(lat_h, 0.25), 4) AS p25_h,
       round(quantile_cont(lat_h, 0.50), 4) AS p50_h,
       round(quantile_cont(lat_h, 0.90), 4) AS p90_h
FROM conv
""",
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    viewers = per_user.filter(F.col("first_view").isNotNull())
    conv = viewers.filter(
        F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_view"))
    ).select(
        (
            (F.unix_timestamp("first_purchase") - F.unix_timestamp("first_view"))
            / 3600.0
        ).alias("lat_h")
    )
    nv = viewers.agg(F.count(F.lit(1)).alias("n_viewers"))
    return (
        conv.agg(
            F.count(F.lit(1)).alias("n_converted"),
            F.round(F.percentile("lat_h", F.lit(0.25)), 4).alias("p25_h"),
            F.round(F.percentile("lat_h", F.lit(0.50)), 4).alias("p50_h"),
            F.round(F.percentile("lat_h", F.lit(0.90)), 4).alias("p90_h"),
        )
        .crossJoin(F.broadcast(nv))
        .select(
            "n_viewers",
            "n_converted",
            F.round(F.col("n_converted") / F.col("n_viewers"), 6).alias(
                "conversion_rate"
            ),
            "p25_h",
            "p50_h",
            "p90_h",
        )
    )


# ---------------------------------------------------------------------------
# A6 ext: exact Shapley-value channel attribution (3-player closed form)
# ---------------------------------------------------------------------------


@register(
    "agg_shapley_attribution",
    doc="Exact Shapley-value attribution over the three marketing channels "
    "(view=1, click=2, signup=4 as a bitmask): per-user touchsets and "
    "purchase labels from one hash aggregate, the 8-subset characteristic "
    "function v(S) = purchasers with touchset contained in S / all users via "
    "a bitmask-containment join (8x8 rows), then the closed-form n=3 "
    "Shapley weights |S|!(n-|S|-1)!/n!.  Everything after the first "
    "aggregate is broadcast-sized at any data scale.",
    tags=("agg", "attribution", "ext"),
    oracle="""
WITH per_user AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
         + max(CASE WHEN event_type = 'click' THEN 2 ELSE 0 END)
         + max(CASE WHEN event_type = 'signup' THEN 4 ELSE 0 END) AS mask,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchased
  FROM events GROUP BY user_id
), tot AS (
  SELECT count(*) AS n_users FROM per_user
), by_mask AS (
  SELECT mask, sum(purchased) AS buyers FROM per_user GROUP BY mask
), subsets AS (
  SELECT s.i AS s_mask,
         coalesce(sum(CASE WHEN (b.mask & s.i) = b.mask THEN b.buyers END), 0)
           * 1.0 / any_value(t.n_users) AS v
  FROM range(0, 8) s(i)
  LEFT JOIN by_mask b ON true CROSS JOIN tot t
  GROUP BY s.i
), channels AS (
  SELECT * FROM (VALUES ('view', 1), ('click', 2), ('signup', 4)) c(channel, bit)
), contrib AS (
  SELECT c.channel,
         CASE bit_count(CAST(s.s_mask AS BIGINT))
              WHEN 0 THEN 2.0 / 6 WHEN 1 THEN 1.0 / 6 ELSE 2.0 / 6 END
           * (su.v - s.v) AS part
  FROM channels c
  JOIN subsets s  ON (s.s_mask & c.bit) = 0
  JOIN subsets su ON su.s_mask = s.s_mask + c.bit
)
SELECT channel, round(sum(part), 9) AS shapley
FROM contrib GROUP BY channel ORDER BY channel
""",
)
def agg_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    et = F.col("event_type")
    per_user = events.groupBy("user_id").agg(
        (
            F.max(F.when(et == "view", 1).otherwise(0))
            + F.max(F.when(et == "click", 2).otherwise(0))
            + F.max(F.when(et == "signup", 4).otherwise(0))
        ).alias("mask"),
        F.max(F.when(et == "purchase", 1).otherwise(0)).alias("purchased"),
    )
    tot = per_user.agg(F.count(F.lit(1)).alias("n_users"))
    by_mask = per_user.groupBy("mask").agg(F.sum("purchased").alias("buyers"))
    subsets = (
        spark.range(8)
        .select(F.col("id").cast("int").alias("s_mask"))
        .join(F.broadcast(by_mask), F.expr("(mask & s_mask) = mask"), "left")
        .crossJoin(F.broadcast(tot))
        .groupBy("s_mask")
        .agg(
            (
                F.coalesce(F.sum("buyers"), F.lit(0))
                * 1.0
                / F.any_value("n_users")
            ).alias("v")
        )
    )
    channels = spark.createDataFrame(
        [("view", 1), ("click", 2), ("signup", 4)], "channel string, bit int"
    )
    s = subsets.alias("s")
    su = subsets.select(
        F.col("s_mask").alias("su_mask"), F.col("v").alias("su_v")
    ).alias("su")
    weight = (
        F.when(F.bit_count(F.col("s.s_mask").cast("bigint")) == 0, 2.0 / 6)
        .when(F.bit_count(F.col("s.s_mask").cast("bigint")) == 1, 1.0 / 6)
        .otherwise(2.0 / 6)
    )
    contrib = (
        channels.join(F.broadcast(s), F.expr("(s_mask & bit) = 0"))
        .join(F.broadcast(su), F.expr("su_mask = s_mask + bit"))
        .select("channel", (weight * (F.col("su_v") - F.col("s.v"))).alias("part"))
    )
    return (
        contrib.groupBy("channel")
        .agg(F.round(F.sum("part"), 9).alias("shapley"))
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# A6 ext: Gumbel extreme-value fit on block maxima (method of moments)
# ---------------------------------------------------------------------------


@register(
    "agg_gumbel_extremes",
    doc="Extreme-value analysis of order prices: monthly block maxima (one "
    "hash aggregate), Gumbel location/scale by method of moments "
    "(beta = sd*sqrt(6)/pi, mu = mean - 0.57721566*beta), and the 12/120-"
    "block return levels x_T = mu - beta*ln(-ln(1-1/T)).  The maxima "
    "relation is one row per month — trivially small at any fact-table "
    "scale, so the fit itself never shuffles more than once.",
    tags=("agg", "stats", "extremes", "ext"),
    oracle="""
WITH maxima AS (
  SELECT date_trunc('month', o_orderdate) AS mon, max(o_totalprice) AS mx
  FROM orders GROUP BY 1
), fit AS (
  SELECT count(*) AS n_blocks, avg(mx) AS mean_mx,
         stddev_pop(mx) * sqrt(6) / pi() AS beta
  FROM maxima
)
SELECT n_blocks,
       round(mean_mx - 0.5772156649015329 * beta, 4) AS gumbel_mu,
       round(beta, 4) AS gumbel_beta,
       round(mean_mx - 0.5772156649015329 * beta
             - beta * ln(-ln(1.0 - 1.0 / 12)), 4) AS return_level_12,
       round(mean_mx - 0.5772156649015329 * beta
             - beta * ln(-ln(1.0 - 1.0 / 120)), 4) AS return_level_120
FROM fit
""",
)
def agg_gumbel_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    orders = load_table(spark, sf_dir, "orders")
    maxima = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.max("o_totalprice").alias("mx")
    )
    fit = maxima.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.avg("mx").alias("mean_mx"),
        (F.stddev_pop("mx") * math.sqrt(6) / math.pi).alias("beta"),
    )
    gamma = 0.5772156649015329
    mu = F.col("mean_mx") - gamma * F.col("beta")
    rl = lambda t: mu - F.col("beta") * F.log(-F.log(F.lit(1.0 - 1.0 / t)))  # noqa: E731
    return fit.select(
        "n_blocks",
        F.round(mu, 4).alias("gumbel_mu"),
        F.round("beta", 4).alias("gumbel_beta"),
        F.round(rl(12), 4).alias("return_level_12"),
        F.round(rl(120), 4).alias("return_level_120"),
    )


# ---------------------------------------------------------------------------
# W5 ext: Page-Hinkley drift detector over the monthly order-count series
# ---------------------------------------------------------------------------

_PH_DELTA = 0.5
_PH_LAMBDA = 30.0


@register(
    "window_page_hinkley_drift",
    doc="Page-Hinkley change detection over monthly order counts (the "
    "batch spelling of the streaming drift monitor): deviation from the "
    "expanding running mean, cumulated, minus its running minimum; alarm "
    "when the gap exceeds lambda.  Integer counts keep the expanding-mean "
    "arithmetic bit-identical across engines; three stacked windows share "
    "one global sort of 80 rows.",
    tags=("window", "timeseries", "drift", "ext"),
    oracle=f"""
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS mon, count(*) AS x
  FROM orders GROUP BY 1
), dev AS (
  SELECT mon, x,
         x - avg(x) OVER (ORDER BY mon
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - {_PH_DELTA} AS d
  FROM monthly
), cum AS (
  SELECT mon, x, sum(d) OVER (ORDER BY mon
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mt
  FROM dev
), ph AS (
  SELECT mon, x, mt - min(mt) OVER (ORDER BY mon
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph_stat
  FROM cum
)
SELECT cast(mon AS DATE) AS mon, x AS n_orders,
       round(ph_stat, 6) AS ph_stat, ph_stat > {_PH_LAMBDA} AS drift_alarm
FROM ph ORDER BY mon
""",
)
def window_page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.count(F.lit(1)).alias("x")
    )
    w = Window.orderBy("mon").rowsBetween(Window.unboundedPreceding, 0)
    dev = monthly.select(
        "mon", "x", (F.col("x") - F.avg("x").over(w) - _PH_DELTA).alias("d")
    )
    cum = dev.select("mon", "x", F.sum("d").over(w).alias("mt"))
    ph = cum.select(
        "mon", "x", (F.col("mt") - F.min("mt").over(w)).alias("ph_stat")
    )
    return ph.select(
        F.col("mon").cast("date").alias("mon"),
        F.col("x").alias("n_orders"),
        F.round("ph_stat", 6).alias("ph_stat"),
        (F.col("ph_stat") > _PH_LAMBDA).alias("drift_alarm"),
    ).orderBy("mon")


# ---------------------------------------------------------------------------
# A6 ext: mergeable equi-width histogram -> distributed median estimate
# ---------------------------------------------------------------------------

_HIST_BINS = 20


@register(
    "agg_histogram_merge_median",
    doc="Distributed quantile via mergeable partial histograms: each nation "
    "builds a 20-bin equi-width histogram of customer balances (the "
    "per-partition partial), bin counts merge associatively into the "
    "global histogram, and the median is interpolated inside its bin — "
    "then compared against the exact percentile.  This is the map-side-"
    "combinable sketch pattern that replaces exact sorts at 100 TB; the "
    "report quantifies the accuracy trade.",
    tags=("agg", "sketch", "ext"),
    oracle=f"""
WITH bounds AS (
  SELECT min(c_acctbal) AS lo, max(c_acctbal) AS hi FROM customer
), partial AS (
  SELECT c_nationkey,
         least(CAST(floor((c_acctbal - lo) / ((hi - lo) / {_HIST_BINS})) AS INT),
               {_HIST_BINS - 1}) AS bin,
         count(*) AS cnt
  FROM customer CROSS JOIN bounds
  GROUP BY 1, 2
), merged AS (
  SELECT bin, sum(cnt) AS cnt FROM partial GROUP BY bin
), cdf AS (
  SELECT bin, cnt,
         sum(cnt) OVER (ORDER BY bin) AS cum,
         sum(cnt) OVER () AS total
  FROM merged
), med_bin AS (
  SELECT bin, cnt, cum, total FROM cdf
  WHERE cum >= total / 2.0 ORDER BY bin LIMIT 1
)
SELECT (SELECT count(*) FROM partial) AS n_partials,
       round((SELECT lo FROM bounds)
             + ((SELECT hi FROM bounds) - (SELECT lo FROM bounds)) / {_HIST_BINS}
               * (bin + (total / 2.0 - (cum - cnt)) / cnt), 4) AS est_median,
       round((SELECT quantile_cont(c_acctbal, 0.5) FROM customer), 4)
         AS exact_median
FROM med_bin
""",
)
def agg_histogram_merge_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    bounds = cust.agg(F.min("c_acctbal").alias("lo"), F.max("c_acctbal").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / _HIST_BINS
    binc = F.least(
        F.floor((F.col("c_acctbal") - F.col("lo")) / width).cast("int"),
        F.lit(_HIST_BINS - 1),
    )
    partial = (
        cust.crossJoin(F.broadcast(bounds))
        .groupBy("c_nationkey", binc.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    merged = partial.groupBy("bin").agg(F.sum("cnt").alias("cnt"))
    wb = Window.orderBy("bin")
    cdf = merged.select(
        "bin",
        "cnt",
        F.sum("cnt").over(wb.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("total"),
    )
    med_bin = (
        cdf.filter(F.col("cum") >= F.col("total") / 2.0).orderBy("bin").limit(1)
    )
    exact = cust.agg(
        F.round(F.percentile("c_acctbal", F.lit(0.5)), 4).alias("exact_median")
    )
    n_partials = partial.agg(F.count(F.lit(1)).alias("n_partials"))
    est = (
        F.col("lo")
        + (F.col("hi") - F.col("lo"))
        / _HIST_BINS
        * (F.col("bin") + (F.col("total") / 2.0 - (F.col("cum") - F.col("cnt"))) / F.col("cnt"))
    )
    return (
        med_bin.crossJoin(F.broadcast(bounds))
        .crossJoin(F.broadcast(n_partials))
        .crossJoin(F.broadcast(exact))
        .select(
            "n_partials",
            F.round(est, 4).alias("est_median"),
            "exact_median",
        )
    )


# ---------------------------------------------------------------------------
# A6 ext: two-sample Kolmogorov-Smirnov test (distribution drift check)
# ---------------------------------------------------------------------------


@register(
    "agg_ks_two_sample",
    doc="Two-sample Kolmogorov-Smirnov distance between BUILDING and "
    "MACHINERY order-price distributions: per-distinct-value counts (one "
    "shuffle), cumulative counts over the value order, D = max ECDF gap, "
    "and the 5%-level large-sample decision.  All ranking arithmetic is "
    "on integer counts, so the statistic is bit-identical across engines; "
    "at 100 TB the window runs over distinct prices, not rows.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH labeled AS (
  SELECT o.o_totalprice AS v,
         CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS a
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
), per_v AS (
  SELECT v, sum(a) AS ca, sum(1 - a) AS cb FROM labeled GROUP BY v
), tot AS (
  SELECT sum(ca) AS na, sum(cb) AS nb FROM per_v
), cdf AS (
  SELECT sum(ca) OVER (ORDER BY v) * 1.0 / na AS fa,
         sum(cb) OVER (ORDER BY v) * 1.0 / nb AS fb
  FROM per_v CROSS JOIN tot
)
SELECT any_value(na) AS n_a, any_value(nb) AS n_b,
       round(max(abs(fa - fb)), 6) AS ks_d,
       max(abs(fa - fb)) >
         1.358 * sqrt((any_value(na) + any_value(nb))
                      * 1.0 / (any_value(na) * any_value(nb))) AS reject_05
FROM cdf CROSS JOIN tot
""",
)
def agg_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    labeled = (
        orders.join(cust, cust.c_custkey == orders.o_custkey)
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(
            F.col("o_totalprice").alias("v"),
            (F.col("c_mktsegment") == "BUILDING").cast("long").alias("a"),
        )
    )
    per_v = labeled.groupBy("v").agg(
        F.sum("a").alias("ca"), F.sum(1 - F.col("a")).alias("cb")
    )
    tot = per_v.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    w = Window.orderBy("v").rangeBetween(Window.unboundedPreceding, 0)
    cdf = per_v.crossJoin(F.broadcast(tot)).select(
        (F.sum("ca").over(w) / F.col("na")).alias("fa"),
        (F.sum("cb").over(w) / F.col("nb")).alias("fb"),
        "na",
        "nb",
    )
    gap = F.abs(F.col("fa") - F.col("fb"))
    return cdf.agg(
        F.any_value("na").alias("n_a"),
        F.any_value("nb").alias("n_b"),
        F.round(F.max(gap), 6).alias("ks_d"),
        (
            F.max(gap)
            > 1.358
            * F.sqrt(
                (F.any_value("na") + F.any_value("nb"))
                / (F.any_value("na") * F.any_value("nb")).cast("double")
            )
        ).alias("reject_05"),
    )


# ---------------------------------------------------------------------------
# A6 ext: delete-one-group jackknife CI for a ratio metric
# ---------------------------------------------------------------------------


@register(
    "agg_jackknife_ratio_ci",
    doc="Delete-one-group jackknife for the corpus discount ratio "
    "sum(discounted revenue)/sum(gross revenue): per-nation partial sums "
    "(one shuffle), leave-one-nation-out replicate ratios by subtracting "
    "partials from broadcast totals, jackknife SE over the replicates and "
    "a 95% CI.  This is THE scalable CI recipe — replicates come from "
    "arithmetic on G partial sums, never a second data pass.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH per_g AS (
  SELECT s.s_nationkey AS g,
         sum(l.l_extendedprice * (1 - l.l_discount)) AS s1,
         sum(l.l_extendedprice) AS s2
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY s.s_nationkey
), tot AS (
  SELECT sum(s1) AS t1, sum(s2) AS t2, count(*) AS gn FROM per_g
), repl AS (
  SELECT g, (t1 - s1) / (t2 - s2) AS r_loo, t1 / t2 AS r_full, gn
  FROM per_g CROSS JOIN tot
)
SELECT any_value(gn) AS n_groups,
       round(any_value(r_full), 8) AS ratio,
       round(sqrt((any_value(gn) - 1.0) / any_value(gn)
             * sum((r_loo - (SELECT avg(r_loo) FROM repl))
                   * (r_loo - (SELECT avg(r_loo) FROM repl)))), 8) AS jk_se,
       round(any_value(r_full) - 1.96 * sqrt((any_value(gn) - 1.0) / any_value(gn)
             * sum((r_loo - (SELECT avg(r_loo) FROM repl))
                   * (r_loo - (SELECT avg(r_loo) FROM repl)))), 8) AS ci_lo,
       round(any_value(r_full) + 1.96 * sqrt((any_value(gn) - 1.0) / any_value(gn)
             * sum((r_loo - (SELECT avg(r_loo) FROM repl))
                   * (r_loo - (SELECT avg(r_loo) FROM repl)))), 8) AS ci_hi
FROM repl
""",
)
def agg_jackknife_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    per_g = (
        li.join(F.broadcast(supp), supp.s_suppkey == li.l_suppkey)
        .groupBy(F.col("s_nationkey").alias("g"))
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("s1"),
            F.sum("l_extendedprice").alias("s2"),
        )
    )
    tot = per_g.agg(
        F.sum("s1").alias("t1"), F.sum("s2").alias("t2"), F.count(F.lit(1)).alias("gn")
    )
    repl = per_g.crossJoin(F.broadcast(tot)).select(
        ((F.col("t1") - F.col("s1")) / (F.col("t2") - F.col("s2"))).alias("r_loo"),
        (F.col("t1") / F.col("t2")).alias("r_full"),
        "gn",
    )
    mean_loo = repl.agg(F.avg("r_loo").alias("m"))
    dev2 = (F.col("r_loo") - F.col("m")) * (F.col("r_loo") - F.col("m"))
    se = F.sqrt((F.any_value("gn") - 1.0) / F.any_value("gn") * F.sum(dev2))
    return (
        repl.crossJoin(F.broadcast(mean_loo))
        .agg(
            F.any_value("gn").alias("n_groups"),
            F.round(F.any_value("r_full"), 8).alias("ratio"),
            F.round(se, 8).alias("jk_se"),
            F.round(F.any_value("r_full") - 1.96 * se, 8).alias("ci_lo"),
            F.round(F.any_value("r_full") + 1.96 * se, 8).alias("ci_hi"),
        )
    )


# ---------------------------------------------------------------------------
# W5/J5 ext: quartile dependence matrix (rank-bucket contingency)
# ---------------------------------------------------------------------------


@register(
    "join_quartile_dependence",
    doc="Rank-bucket dependence matrix between customer balance quartiles "
    "and their orders' price quartiles: two ntile(4) windows (global rank "
    "buckets with key tiebreaks), an equi-join on the customer key, and "
    "the 4x4 contingency cells with independence expectations and Pearson "
    "residuals — the drillable form of a correlation test.  At 100 TB the "
    "ntile over a global order is the one expensive sort; cells are 16 "
    "rows.",
    tags=("join", "window", "stats", "ext"),
    oracle="""
WITH cq AS (
  SELECT c_custkey, ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS c_quart
  FROM customer
), oq AS (
  SELECT o_custkey, ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS o_quart
  FROM orders
), cells AS (
  SELECT c_quart, o_quart, count(*) AS n
  FROM oq JOIN cq ON cq.c_custkey = oq.o_custkey
  GROUP BY 1, 2
), margins AS (
  SELECT c_quart, o_quart, n,
         sum(n) OVER (PARTITION BY c_quart) AS row_tot,
         sum(n) OVER (PARTITION BY o_quart) AS col_tot,
         sum(n) OVER () AS total
  FROM cells
)
SELECT c_quart, o_quart, n,
       round(row_tot * col_tot * 1.0 / total, 4) AS expected,
       round((n - row_tot * col_tot * 1.0 / total)
             / sqrt(row_tot * col_tot * 1.0 / total), 4) AS pearson_resid
FROM margins ORDER BY c_quart, o_quart
""",
)
def join_quartile_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cq = cust.select(
        "c_custkey",
        F.ntile(4).over(Window.orderBy("c_acctbal", "c_custkey")).alias("c_quart"),
    )
    oq = orders.select(
        "o_custkey",
        F.ntile(4).over(Window.orderBy("o_totalprice", "o_orderkey")).alias("o_quart"),
    )
    cells = (
        oq.join(cq, cq.c_custkey == oq.o_custkey)
        .groupBy("c_quart", "o_quart")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    margins = cells.select(
        "c_quart",
        "o_quart",
        "n",
        F.sum("n").over(Window.partitionBy("c_quart")).alias("row_tot"),
        F.sum("n").over(Window.partitionBy("o_quart")).alias("col_tot"),
        F.sum("n").over(Window.partitionBy()).alias("total"),
    )
    expected = F.col("row_tot") * F.col("col_tot") / F.col("total")
    return margins.select(
        "c_quart",
        "o_quart",
        "n",
        F.round(expected, 4).alias("expected"),
        F.round((F.col("n") - expected) / F.sqrt(expected), 4).alias("pearson_resid"),
    ).orderBy("c_quart", "o_quart")


# ---------------------------------------------------------------------------
# A6 ext: expected calibration error of a derived probability score
# ---------------------------------------------------------------------------


@register(
    "agg_expected_calibration_error",
    doc="Expected Calibration Error of a logistic balance score predicting "
    "'customer has an URGENT order': z-scored logistic confidence (global "
    "moments broadcast), outcome from a semi-join flag, 10 equal-width "
    "confidence bins with per-bin confidence/accuracy gap and the "
    "n-weighted ECE contribution — the standard reliability diagram, "
    "computed in two shuffles (per-customer flag, per-bin cells).",
    tags=("agg", "mleval", "ext"),
    oracle="""
WITH flags AS (
  SELECT c.c_custkey, c.c_acctbal,
         max(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS y
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_acctbal
), moments AS (
  SELECT avg(c_acctbal) AS mu, stddev_pop(c_acctbal) AS sd,
         count(*) AS n_total
  FROM flags
), scored AS (
  SELECT y, 1.0 / (1.0 + exp(-(c_acctbal - mu) / sd)) AS conf, n_total
  FROM flags CROSS JOIN moments
), binned AS (
  SELECT least(CAST(floor(conf * 10) AS INT), 9) AS bin, y, conf, n_total
  FROM scored
)
SELECT bin, count(*) AS n,
       round(avg(conf), 6) AS mean_conf,
       round(avg(y), 6) AS frac_pos,
       round(abs(avg(conf) - avg(y)), 6) AS gap,
       round(count(*) * abs(avg(conf) - avg(y)) / any_value(n_total), 6)
         AS ece_contrib
FROM binned GROUP BY bin ORDER BY bin
""",
)
def agg_expected_calibration_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    flags = (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            F.max(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("y")
        )
    )
    moments = flags.agg(
        F.avg("c_acctbal").alias("mu"),
        F.stddev_pop("c_acctbal").alias("sd"),
        F.count(F.lit(1)).alias("n_total"),
    )
    conf = 1.0 / (1.0 + F.exp(-(F.col("c_acctbal") - F.col("mu")) / F.col("sd")))
    binned = flags.crossJoin(F.broadcast(moments)).select(
        F.least(F.floor(conf * 10).cast("int"), F.lit(9)).alias("bin"),
        "y",
        conf.alias("conf"),
        "n_total",
    )
    gap = F.abs(F.avg("conf") - F.avg("y"))
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("conf"), 6).alias("mean_conf"),
            F.round(F.avg("y"), 6).alias("frac_pos"),
            F.round(gap, 6).alias("gap"),
            F.round(F.count(F.lit(1)) * gap / F.any_value("n_total"), 6).alias(
                "ece_contrib"
            ),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# A6 ext: power analysis — minimum detectable effect per segment
# ---------------------------------------------------------------------------


@register(
    "agg_power_analysis_mde",
    doc="Experiment-sizing table: per market segment, the minimum "
    "detectable effect on mean account balance for a two-sample test at "
    "alpha=0.05 / power=0.80 with a 50/50 split of the segment "
    "(MDE = (z_a + z_b) * sqrt(2 * var / (n/2))), absolute and as a "
    "fraction of the mean.  One hash aggregate; pure closed-form "
    "arithmetic after it.",
    tags=("agg", "stats", "experiment", "ext"),
    oracle="""
SELECT c_mktsegment, count(*) AS n,
       round(avg(c_acctbal), 4) AS mean_bal,
       round((1.959964 + 0.841621)
             * sqrt(2 * var_pop(c_acctbal) / (count(*) / 2.0)), 4) AS mde_abs,
       round((1.959964 + 0.841621)
             * sqrt(2 * var_pop(c_acctbal) / (count(*) / 2.0))
             / avg(c_acctbal), 6) AS mde_rel
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
)
def agg_power_analysis_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    z = 1.959964 + 0.841621
    mde = z * F.sqrt(2 * F.var_pop("c_acctbal") / (F.count(F.lit(1)) / 2.0))
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("c_acctbal"), 4).alias("mean_bal"),
            F.round(mde, 4).alias("mde_abs"),
            F.round(mde / F.avg("c_acctbal"), 6).alias("mde_rel"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# W5 ext: session bounce-rate profile by entry event
# ---------------------------------------------------------------------------


@register(
    "events_session_bounce_rate",
    doc="Bounce-rate profile by session entry event: 30-minute-gap "
    "sessionization (lag flag + running sum, same keying as "
    "sessionize_events_gap), then per-session entry type / event count / "
    "duration, rolled up to bounce rate and averages per entry event. "
    "All three windows and the first aggregate share one partitioning "
    "by user_id; the final rollup is 5 rows.",
    tags=("events", "session", "ext"),
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN prev_ts IS NULL
                   OR date_diff('second', prev_ts, ts) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM ordered
), sessions AS (
  SELECT user_id, ts, event_id, event_type,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_no,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM flagged
), per_session AS (
  SELECT user_id, session_no,
         arg_min(event_type, rn) AS entry_type,
         count(*) AS n_events,
         date_diff('second', min(ts), max(ts)) AS duration_s
  FROM sessions GROUP BY user_id, session_no
)
SELECT entry_type, count(*) AS n_sessions,
       round(avg(CASE WHEN n_events = 1 THEN 1.0 ELSE 0.0 END), 6)
         AS bounce_rate,
       round(avg(n_events), 4) AS avg_events,
       round(avg(duration_s), 2) AS avg_duration_s
FROM per_session GROUP BY entry_type ORDER BY entry_type
""",
)
def events_session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
                > 1800
            ),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_no",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).withColumn("rn", F.row_number().over(w))
    per_session = sessions.groupBy("user_id", "session_no").agg(
        F.min_by("event_type", "rn").alias("entry_type"),
        F.count(F.lit(1)).alias("n_events"),
        (
            F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
        ).alias("duration_s"),
    )
    return (
        per_session.groupBy("entry_type")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.round(
                F.avg(F.when(F.col("n_events") == 1, 1.0).otherwise(0.0)), 6
            ).alias("bounce_rate"),
            F.round(F.avg("n_events"), 4).alias("avg_events"),
            F.round(F.avg("duration_s"), 2).alias("avg_duration_s"),
        )
        .orderBy("entry_type")
    )


# ---------------------------------------------------------------------------
# A6 ext: chain-ladder development factors (actuarial loss triangle)
# ---------------------------------------------------------------------------


@register(
    "agg_chain_ladder_factors",
    doc="Chain-ladder age-to-age development factors over the order->ship "
    "'loss triangle': origin = order year, development lag = ship year - "
    "order year, cumulative shipped value per (origin, dev) via a range "
    "window, then f_d = sum C_(o,d+1) / sum C_(o,d) restricted to origins "
    "that have reached d+1 (the standard volume-weighted estimator).  One "
    "fact-table aggregate to the tiny triangle; everything after is "
    "window algebra on dozens of cells.",
    tags=("agg", "actuarial", "ext"),
    oracle="""
WITH cells AS (
  SELECT year(o.o_orderdate) AS origin,
         year(l.l_shipdate) - year(o.o_orderdate) AS dev,
         sum(l.l_extendedprice) AS incr
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE year(l.l_shipdate) >= year(o.o_orderdate)
  GROUP BY 1, 2
), cum AS (
  SELECT origin, dev,
         sum(incr) OVER (PARTITION BY origin ORDER BY dev) AS c
  FROM cells
), paired AS (
  SELECT a.dev AS from_dev, a.origin, a.c AS c_cur, b.c AS c_next
  FROM cum a JOIN cum b ON b.origin = a.origin AND b.dev = a.dev + 1
)
SELECT from_dev, count(*) AS n_origins,
       round(sum(c_next) / sum(c_cur), 6) AS dev_factor
FROM paired GROUP BY from_dev ORDER BY from_dev
""",
)
def agg_chain_ladder_factors(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cells = (
        li.join(orders, orders.o_orderkey == li.l_orderkey)
        .filter(F.year("l_shipdate") >= F.year("o_orderdate"))
        .groupBy(
            F.year("o_orderdate").alias("origin"),
            (F.year("l_shipdate") - F.year("o_orderdate")).alias("dev"),
        )
        .agg(F.sum("l_extendedprice").alias("incr"))
    )
    w = Window.partitionBy("origin").orderBy("dev").rangeBetween(
        Window.unboundedPreceding, 0
    )
    cum = cells.select("origin", "dev", F.sum("incr").over(w).alias("c"))
    b = cum.select(
        F.col("origin").alias("b_origin"),
        F.col("dev").alias("b_dev"),
        F.col("c").alias("c_next"),
    )
    paired = cum.join(
        b,
        (F.col("b_origin") == F.col("origin")) & (F.col("b_dev") == F.col("dev") + 1),
    )
    return (
        paired.groupBy(F.col("dev").alias("from_dev"))
        .agg(
            F.count(F.lit(1)).alias("n_origins"),
            F.round(F.sum("c_next") / F.sum("c"), 6).alias("dev_factor"),
        )
        .orderBy("from_dev")
    )


# ---------------------------------------------------------------------------
# A6 ext: Markov entropy rate of the per-user event process
# ---------------------------------------------------------------------------


@register(
    "agg_markov_entropy_rate",
    doc="Entropy rate of the user-event Markov chain: per-user ordered "
    "transitions (one lag window), transition counts, per-state "
    "conditional entropy H(next|state) and its pi-weighted contribution "
    "to the chain entropy rate — the sequence-compressibility number "
    "behind session-model sizing.  One shuffle to transitions, one to "
    "the 5x5 matrix.",
    tags=("agg", "events", "stats", "ext"),
    oracle="""
WITH seqd AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
), trans AS (
  SELECT event_type AS s, next_type AS t, count(*) AS c
  FROM seqd WHERE next_type IS NOT NULL GROUP BY 1, 2
), st AS (
  SELECT s, sum(c) AS cs FROM trans GROUP BY s
), tot AS (
  SELECT sum(cs) AS t_all FROM st
), hc AS (
  SELECT tr.s, any_value(st.cs) AS cs,
         -sum((tr.c * 1.0 / st.cs) * ln(tr.c * 1.0 / st.cs)) AS h_cond
  FROM trans tr JOIN st ON st.s = tr.s
  GROUP BY tr.s
)
SELECT hc.s AS state, cs AS n_from,
       round(cs * 1.0 / t_all, 6) AS pi,
       round(h_cond, 6) AS h_cond,
       round(cs * 1.0 / t_all * h_cond, 6) AS rate_contrib
FROM hc CROSS JOIN tot ORDER BY state
""",
)
def agg_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seqd = events.select(
        F.col("event_type").alias("s"),
        F.lead("event_type").over(w).alias("t"),
    ).filter(F.col("t").isNotNull())
    trans = seqd.groupBy("s", "t").agg(F.count(F.lit(1)).alias("c"))
    st = trans.groupBy("s").agg(F.sum("c").alias("cs"))
    tot = st.agg(F.sum("cs").alias("t_all"))
    p = F.col("c") / F.col("cs")
    hc = (
        trans.join(F.broadcast(st), "s")
        .groupBy("s")
        .agg(
            F.any_value("cs").alias("cs"),
            (-F.sum(p * F.log(p))).alias("h_cond"),
        )
    )
    return (
        hc.crossJoin(F.broadcast(tot))
        .select(
            F.col("s").alias("state"),
            F.col("cs").alias("n_from"),
            F.round(F.col("cs") / F.col("t_all"), 6).alias("pi"),
            F.round("h_cond", 6).alias("h_cond"),
            F.round(F.col("cs") / F.col("t_all") * F.col("h_cond"), 6).alias(
                "rate_contrib"
            ),
        )
        .orderBy("state")
    )


# ---------------------------------------------------------------------------
# W5 ext: longest underwater spell (drawdown duration, gaps-and-islands)
# ---------------------------------------------------------------------------


@register(
    "window_underwater_duration",
    doc="Drawdown *duration* analysis of the monthly revenue series: "
    "months below the running peak form 'underwater' islands (flag diff "
    "-> island ids via two stacked windows), reported as spell count, "
    "longest and mean spell, and total underwater months.  The series is "
    "pre-aggregated to 80 rows before any window, so the global sort is "
    "trivial at any fact scale.",
    tags=("window", "timeseries", "ext"),
    oracle="""
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS mon,
         round(sum(o_totalprice), 2) AS rev
  FROM orders GROUP BY 1
), flagged AS (
  SELECT mon, rev,
         CASE WHEN rev < max(rev) OVER (ORDER BY mon
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS under
  FROM monthly
), islands AS (
  SELECT mon, under,
         row_number() OVER (ORDER BY mon)
           - sum(under) OVER (ORDER BY mon ROWS UNBOUNDED PRECEDING) AS grp
  FROM flagged
), spells AS (
  SELECT grp, count(*) AS len
  FROM islands WHERE under = 1 GROUP BY grp
)
SELECT count(*) AS n_spells,
       max(len) AS longest_spell_months,
       round(avg(len), 4) AS mean_spell_months,
       CAST(sum(len) AS BIGINT) AS total_underwater_months
FROM spells
""",
)
def window_underwater_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    w = Window.orderBy("mon")
    peak = F.max("rev").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = monthly.select(
        "mon",
        F.when(F.col("rev") < peak, 1).otherwise(0).alias("under"),
    )
    islands = flagged.select(
        "mon",
        "under",
        (
            F.row_number().over(w)
            - F.sum("under").over(w.rowsBetween(Window.unboundedPreceding, 0))
        ).alias("grp"),
    )
    spells = (
        islands.filter(F.col("under") == 1)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    return spells.agg(
        F.count(F.lit(1)).alias("n_spells"),
        F.max("len").alias("longest_spell_months"),
        F.round(F.avg("len"), 4).alias("mean_spell_months"),
        F.sum("len").alias("total_underwater_months"),
    )


# ---------------------------------------------------------------------------
# A6 ext: AUC-ROC via the midrank rank-sum identity
# ---------------------------------------------------------------------------


@register(
    "agg_auc_roc_balance",
    doc="AUC-ROC of account balance as a ranking score for 'customer has "
    "an URGENT order', via the tie-corrected rank-sum identity "
    "AUC = (sum of positive midranks - n1(n1+1)/2) / (n1*n0): per-"
    "distinct-score counts, a cumulative window for midranks, one final "
    "aggregate.  No pairwise O(n^2) comparison anywhere — the identity "
    "is what makes AUC computable at 100 TB; arithmetic stays on integer "
    "counts and halves so both engines agree exactly.",
    tags=("agg", "mleval", "ext"),
    oracle="""
WITH flags AS (
  SELECT c.c_custkey, c.c_acctbal AS score,
         max(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS y
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_acctbal
), per_v AS (
  SELECT score, sum(y) AS np, count(*) AS nt FROM flags GROUP BY score
), ranked AS (
  SELECT np, nt,
         coalesce(sum(nt) OVER (ORDER BY score
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + (nt + 1) / 2.0 AS midrank
  FROM per_v
), tot AS (
  SELECT sum(np) AS n1, sum(nt) - sum(np) AS n0,
         sum(np * midrank) AS rank_sum
  FROM ranked
)
SELECT CAST(n1 AS BIGINT) AS n_pos, CAST(n0 AS BIGINT) AS n_neg,
       round((rank_sum - n1 * (n1 + 1) / 2.0) / (n1 * n0), 6) AS auc
FROM tot
""",
)
def agg_auc_roc_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    flags = (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey", F.col("c_acctbal").alias("score"))
        .agg(
            F.max(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("y")
        )
    )
    per_v = flags.groupBy("score").agg(
        F.sum("y").alias("np"), F.count(F.lit(1)).alias("nt")
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_v.select(
        "np",
        "nt",
        (
            F.coalesce(F.sum("nt").over(w), F.lit(0))
            + (F.col("nt") + 1) / 2.0
        ).alias("midrank"),
    )
    tot = ranked.agg(
        F.sum("np").alias("n1"),
        (F.sum("nt") - F.sum("np")).alias("n0"),
        F.sum(F.col("np") * F.col("midrank")).alias("rank_sum"),
    )
    return tot.select(
        F.col("n1").cast("long").alias("n_pos"),
        F.col("n0").cast("long").alias("n_neg"),
        F.round(
            (F.col("rank_sum") - F.col("n1") * (F.col("n1") + 1) / 2.0)
            / (F.col("n1") * F.col("n0")),
            6,
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# A6 ext: process-capability indices (Cp / Cpk) per brand
# ---------------------------------------------------------------------------

_SPEC_LO, _SPEC_HI = 1.0, 50.0


@register(
    "agg_process_capability",
    doc="Manufacturing process-capability indices for line quantities "
    "against spec limits [1, 50] per part brand: Cp = (USL-LSL)/6sigma, "
    "Cpk = min(USL-mu, mu-LSL)/3sigma, plus the out-of-spec rate.  One "
    "broadcast join to brands and one hash aggregate — the SPC dashboard "
    "query at any scale.",
    tags=("agg", "stats", "ext"),
    oracle=f"""
SELECT p.p_brand, count(*) AS n,
       round(avg(l.l_quantity), 4) AS mean_qty,
       round(({_SPEC_HI} - {_SPEC_LO}) / (6 * stddev_pop(l.l_quantity)), 6) AS cp,
       round(least({_SPEC_HI} - avg(l.l_quantity),
                   avg(l.l_quantity) - {_SPEC_LO})
             / (3 * stddev_pop(l.l_quantity)), 6) AS cpk,
       round(avg(CASE WHEN l.l_quantity < {_SPEC_LO} OR l.l_quantity > {_SPEC_HI}
                      THEN 1.0 ELSE 0.0 END), 6) AS oos_rate
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY p.p_brand ORDER BY p.p_brand
""",
)
def agg_process_capability(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    oos = (F.col("l_quantity") < _SPEC_LO) | (F.col("l_quantity") > _SPEC_HI)
    return (
        li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("l_quantity"), 4).alias("mean_qty"),
            F.round(
                (_SPEC_HI - _SPEC_LO) / (6 * F.stddev_pop("l_quantity")), 6
            ).alias("cp"),
            F.round(
                F.least(
                    _SPEC_HI - F.avg("l_quantity"), F.avg("l_quantity") - _SPEC_LO
                )
                / (3 * F.stddev_pop("l_quantity")),
                6,
            ).alias("cpk"),
            F.round(F.avg(F.when(oos, 1.0).otherwise(0.0)), 6).alias("oos_rate"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# A6 ext: strict-order funnel with per-stage 7-day conversion windows
# ---------------------------------------------------------------------------


@register(
    "events_windowed_funnel_7d",
    doc="Three-stage strict-order funnel with a 7-day conversion deadline "
    "per stage (view -> click within 7d -> purchase within 7d): the "
    "correlated 'first X after Y but before Y+7d' chain decorrelates "
    "into three conditional aggregates re-joined on user_id — one "
    "logical shuffle of events reused per stage, the deadline just an "
    "extra predicate on the µs-integer timestamps.  Reports reach and "
    "stage-to-stage conversion.",
    tags=("agg", "funnel", "events", "ext"),
    oracle="""
WITH u1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
), u2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN u1 ON u1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > u1.t1
        AND e.ts <= u1.t1 + INTERVAL 7 DAY
  GROUP BY 1
), u3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN u2 ON u2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > u2.t2
        AND e.ts <= u2.t2 + INTERVAL 7 DAY
  GROUP BY 1
)
SELECT (SELECT count(*) FROM u1) AS n_view,
       (SELECT count(*) FROM u2) AS n_click_7d,
       (SELECT count(*) FROM u3) AS n_purchase_7d,
       round((SELECT count(*) FROM u2) * 1.0
             / (SELECT count(*) FROM u1), 6) AS view_to_click,
       round((SELECT count(*) FROM u3) * 1.0
             / nullif((SELECT count(*) FROM u2), 0), 6) AS click_to_purchase
""",
)
def events_windowed_funnel_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    u1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    u2 = (
        ev.filter(F.col("event_type") == "click")
        .join(u1, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 7 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    u3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(u2, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 7 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    c1 = u1.agg(F.count(F.lit(1)).alias("n_view"))
    c2 = u2.agg(F.count(F.lit(1)).alias("n_click_7d"))
    c3 = u3.agg(F.count(F.lit(1)).alias("n_purchase_7d"))
    return (
        c1.crossJoin(F.broadcast(c2))
        .crossJoin(F.broadcast(c3))
        .select(
            "n_view",
            "n_click_7d",
            "n_purchase_7d",
            F.round(F.col("n_click_7d") / F.col("n_view"), 6).alias("view_to_click"),
            F.round(
                F.col("n_purchase_7d")
                / F.nullif(F.col("n_click_7d").cast("double"), F.lit(0.0)),
                6,
            ).alias("click_to_purchase"),
        )
    )


# ---------------------------------------------------------------------------
# A6 ext: Mantel-Haenszel pooled odds ratio across strata
# ---------------------------------------------------------------------------


@register(
    "agg_mantel_haenszel_or",
    doc="Mantel-Haenszel pooled odds ratio of 'has an URGENT order' for "
    "BUILDING vs MACHINERY customers, stratified by nation (the "
    "confounder-adjusted effect estimate): per-customer outcome flags, "
    "per-stratum 2x2 cells from one pivot aggregate, "
    "OR_MH = sum(a*d/n)/sum(b*c/n) plus the crude (unstratified) OR for "
    "the confounding contrast.  Two shuffles total, strata relation is "
    "25 rows.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH flags AS (
  SELECT c.c_custkey, any_value(c.c_nationkey) AS stratum,
         any_value(c.c_mktsegment) AS seg,
         max(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS y
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
  GROUP BY c.c_custkey
), cells AS (
  SELECT stratum,
         sum(CASE WHEN seg = 'BUILDING' AND y = 1 THEN 1 ELSE 0 END) AS a,
         sum(CASE WHEN seg = 'BUILDING' AND y = 0 THEN 1 ELSE 0 END) AS b,
         sum(CASE WHEN seg = 'MACHINERY' AND y = 1 THEN 1 ELSE 0 END) AS c,
         sum(CASE WHEN seg = 'MACHINERY' AND y = 0 THEN 1 ELSE 0 END) AS d
  FROM flags GROUP BY stratum
), mh AS (
  SELECT count(*) AS n_strata,
         sum(a * d * 1.0 / (a + b + c + d)) AS num,
         sum(b * c * 1.0 / (a + b + c + d)) AS den,
         sum(a) AS ta, sum(b) AS tb, sum(c) AS tc, sum(d) AS td
  FROM cells WHERE a + b + c + d > 0
)
SELECT n_strata,
       round(num / den, 6) AS or_mh,
       round(ta * td * 1.0 / (tb * tc), 6) AS or_crude
FROM mh
""",
)
def agg_mantel_haenszel_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    flags = (
        cust.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.any_value("c_nationkey").alias("stratum"),
            F.any_value("c_mktsegment").alias("seg"),
            F.max(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("y"),
        )
    )
    seg, y = F.col("seg"), F.col("y")
    cells = flags.groupBy("stratum").agg(
        F.sum(F.when((seg == "BUILDING") & (y == 1), 1).otherwise(0)).alias("a"),
        F.sum(F.when((seg == "BUILDING") & (y == 0), 1).otherwise(0)).alias("b"),
        F.sum(F.when((seg == "MACHINERY") & (y == 1), 1).otherwise(0)).alias("c"),
        F.sum(F.when((seg == "MACHINERY") & (y == 0), 1).otherwise(0)).alias("d"),
    )
    n = (F.col("a") + F.col("b") + F.col("c") + F.col("d")).cast("double")
    mh = cells.filter(n > 0).agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum(F.col("a") * F.col("d") / n).alias("num"),
        F.sum(F.col("b") * F.col("c") / n).alias("den"),
        F.sum("a").alias("ta"),
        F.sum("b").alias("tb"),
        F.sum("c").alias("tc"),
        F.sum("d").alias("td"),
    )
    return mh.select(
        "n_strata",
        F.round(F.col("num") / F.col("den"), 6).alias("or_mh"),
        F.round(
            F.col("ta") * F.col("td") / (F.col("tb") * F.col("tc")).cast("double"), 6
        ).alias("or_crude"),
    )
