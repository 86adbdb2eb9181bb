"""Second statistics/mining wave (SURVEY.md §2 EXT rows A6/W5/J5).

The reference serves only per-table counts out of its Redis cache
(rcache.py:26-33); these are further EXT operators an analytics
warehouse replacing it would expose: classical two-sample and k-sample
tests (Welch, one-way ANOVA), market-basket association mining, and a
rank-correlation coefficient over an aggregated time series.

Scale stance (100 TB): every query reduces the fact table with ONE
partial+final hash aggregate before any pairwise work.  Pairwise
constructions (basket pairs, Kendall concordance) only ever run on
bounded relations — brand pairs are capped by the 25-brand dictionary
per order, and the Kendall self-join runs over the ~24-row monthly
series.  Nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from ..sources.changelog import ORDERS_CHANGELOG_SQL
from .cdc import _FOLD_LAMBDA
from .catalog import register

# ---------------------------------------------------------------------------
# A6 ext: Welch's unequal-variance two-sample t-test
# ---------------------------------------------------------------------------


@register(
    "agg_welch_ttest",
    doc="Welch's t-test of mean account balance, BUILDING vs MACHINERY "
    "customers: one conditional aggregate pass (count/avg/var_samp per "
    "arm via CASE columns, no second scan), then the closed-form t "
    "statistic and Welch-Satterthwaite degrees of freedom.  Fully "
    "partial-aggregable — a single reduce at any scale.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH s AS (
  SELECT
    count(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 END) AS n1,
    avg(CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal END) AS m1,
    var_samp(CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal END) AS v1,
    count(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 END) AS n2,
    avg(CASE WHEN c_mktsegment = 'MACHINERY' THEN c_acctbal END) AS m2,
    var_samp(CASE WHEN c_mktsegment = 'MACHINERY' THEN c_acctbal END) AS v2
  FROM customer
)
SELECT n1, n2,
       round(m1 - m2, 4) AS mean_diff,
       round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 4) AS t_stat,
       round(
         pow(v1 / n1 + v2 / n2, 2)
         / (pow(v1 / n1, 2) / (n1 - 1) + pow(v2 / n2, 2) / (n2 - 1)), 2
       ) AS welch_df
FROM s
""",
)
def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    arm1 = F.when(F.col("c_mktsegment") == "BUILDING", bal)
    arm2 = F.when(F.col("c_mktsegment") == "MACHINERY", bal)
    s = cust.agg(
        F.count(arm1).alias("n1"),
        F.avg(arm1).alias("m1"),
        F.var_samp(arm1).alias("v1"),
        F.count(arm2).alias("n2"),
        F.avg(arm2).alias("m2"),
        F.var_samp(arm2).alias("v2"),
    )
    se2_1 = F.col("v1") / F.col("n1")
    se2_2 = F.col("v2") / F.col("n2")
    se2 = se2_1 + se2_2
    return s.select(
        "n1",
        "n2",
        F.round(F.col("m1") - F.col("m2"), 4).alias("mean_diff"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se2), 4).alias("t_stat"),
        F.round(
            F.pow(se2, F.lit(2))
            / (
                F.pow(se2_1, F.lit(2)) / (F.col("n1") - 1)
                + F.pow(se2_2, F.lit(2)) / (F.col("n2") - 1)
            ),
            2,
        ).alias("welch_df"),
    )


# ---------------------------------------------------------------------------
# A6 ext: one-way ANOVA F across order priorities
# ---------------------------------------------------------------------------


@register(
    "agg_anova_f_oneway",
    doc="One-way ANOVA of o_totalprice across the 5 order priorities: one "
    "hash aggregate to (n, mean, var) per priority, grand stats rebuilt "
    "from the 5 group cells (no second fact scan), then SSB/SSW, the F "
    "statistic and the eta-squared effect size.  The expensive part is a "
    "single decomposable aggregate; everything after runs on 5 rows.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH g AS (
  SELECT o_orderpriority,
         count(*) AS n, avg(o_totalprice) AS m, var_samp(o_totalprice) AS v
  FROM orders GROUP BY o_orderpriority
), t AS (
  SELECT count(*) AS k, sum(n) AS n_total,
         sum(n * m) / sum(n) AS grand_mean,
         sum((n - 1) * v) AS ssw
  FROM g
), b AS (
  SELECT sum(n * (m - (SELECT grand_mean FROM t)) ^ 2) AS ssb FROM g
)
SELECT t.k, t.n_total,
       round(b.ssb / (t.k - 1) / (t.ssw / (t.n_total - t.k)), 4) AS f_stat,
       round(b.ssb / (b.ssb + t.ssw), 6) AS eta_sq
FROM t, b
""",
)
def agg_anova_f_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    g = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("o_totalprice").alias("m"),
        F.var_samp("o_totalprice").alias("v"),
    )
    t = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("n_total"),
        (F.sum(F.col("n") * F.col("m")) / F.sum("n")).alias("grand_mean"),
        F.sum((F.col("n") - 1) * F.col("v")).alias("ssw"),
    )
    b = (
        g.crossJoin(F.broadcast(t.select("grand_mean")))
        .agg(
            F.sum(
                F.col("n") * F.pow(F.col("m") - F.col("grand_mean"), F.lit(2))
            ).alias("ssb")
        )
    )
    return (
        t.crossJoin(F.broadcast(b))
        .select(
            "k",
            "n_total",
            F.round(
                (F.col("ssb") / (F.col("k") - 1))
                / (F.col("ssw") / (F.col("n_total") - F.col("k"))),
                4,
            ).alias("f_stat"),
            F.round(F.col("ssb") / (F.col("ssb") + F.col("ssw")), 6).alias("eta_sq"),
        )
    )


# ---------------------------------------------------------------------------
# J5 ext: market-basket brand-pair association (support / confidence / lift)
# ---------------------------------------------------------------------------


@register(
    "basket_brand_pair_lift",
    doc="Market-basket association mining with orders as baskets and part "
    "brands as items: lineitem ⋈ part for the brand dictionary, DISTINCT "
    "(order, brand) so multiplicity inside a basket doesn't inflate "
    "support, then an ordered self-join (brand_a < brand_b) clustered on "
    "the order key — the pair fan-out is bounded by the 25-brand "
    "dictionary, never quadratic in basket size at TPC-H line counts.  "
    "Support, confidence and lift from broadcast singleton counts; "
    "deterministic top-10 by pair frequency.",
    tags=("join", "mining", "ext"),
    oracle="""
WITH ob AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON p_partkey = l_partkey
), nb AS (
  SELECT count(DISTINCT l_orderkey) AS n_baskets FROM ob
), singles AS (
  SELECT p_brand, count(*) AS n1 FROM ob GROUP BY p_brand
), pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS pair_orders
  FROM ob a JOIN ob b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY a.p_brand, b.p_brand
)
SELECT brand_a, brand_b, pair_orders,
       round(pair_orders * 1.0 / nb.n_baskets, 6) AS support,
       round(pair_orders * 1.0 / sa.n1, 6) AS confidence_a,
       round(pair_orders * 1.0 * nb.n_baskets / (sa.n1 * sb.n1), 6) AS lift
FROM pairs, nb
JOIN singles sa ON sa.p_brand = pairs.brand_a
JOIN singles sb ON sb.p_brand = pairs.brand_b
ORDER BY pair_orders DESC, brand_a, brand_b
LIMIT 10
""",
)
def basket_brand_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    nb = ob.select(F.countDistinct("l_orderkey").alias("n_baskets"))
    singles = ob.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n1"))
    a = ob.alias("a")
    b = ob.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"), F.col("b.p_brand").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).alias("pair_orders"))
    )
    sa = F.broadcast(singles.withColumnRenamed("n1", "na"))
    sb = F.broadcast(
        singles.withColumnRenamed("n1", "nb").withColumnRenamed("p_brand", "brand2")
    )
    return (
        pairs.crossJoin(F.broadcast(nb))
        .join(sa, F.col("brand_a") == sa.p_brand)
        .join(sb, F.col("brand_b") == F.col("brand2"))
        .select(
            "brand_a",
            "brand_b",
            "pair_orders",
            F.round(F.col("pair_orders") / F.col("n_baskets"), 6).alias("support"),
            F.round(F.col("pair_orders") / F.col("na"), 6).alias("confidence_a"),
            F.round(
                F.col("pair_orders") * F.col("n_baskets") / (F.col("na") * F.col("nb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("pair_orders"), "brand_a", "brand_b")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# W5 ext: Kendall tau-b rank correlation over the monthly series
# ---------------------------------------------------------------------------


@register(
    "agg_kendall_tau_monthly",
    doc="Kendall tau-b between monthly order count and monthly revenue: "
    "aggregate the fact table to ~24 month cells first (cents-rounded so "
    "both engines agree on ties), then the O(m²) concordance self-join "
    "runs on the tiny series — 24 rows, ~276 pairs, trivially "
    "broadcastable.  Tie-corrected denominator (tau-b).",
    tags=("window", "stats", "ext"),
    oracle="""
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS mon,
         count(*) AS x, round(sum(o_totalprice), 2) AS y
  FROM orders GROUP BY 1
), p AS (
  SELECT sign(b.x - a.x) AS sx, sign(b.y - a.y) AS sy
  FROM m a JOIN m b ON a.mon < b.mon
), s AS (
  SELECT count(*) AS n_pairs,
         sum(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END) AS concordant,
         sum(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END) AS discordant,
         sum(CASE WHEN sx = 0 THEN 1 ELSE 0 END) AS ties_x,
         sum(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS ties_y
  FROM p
)
SELECT (SELECT count(*) FROM m) AS n_months,
       n_pairs, concordant, discordant,
       round((concordant - discordant)
             / sqrt((n_pairs - ties_x) * (n_pairs - ties_y)), 6) AS tau_b
FROM s
""",
)
def agg_kendall_tau_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.count(F.lit(1)).alias("x"),
        F.round(F.sum("o_totalprice"), 2).alias("y"),
    )
    a = m.alias("a")
    b = m.alias("b")
    sx = F.signum(F.col("b.x") - F.col("a.x"))
    sy = F.signum(F.col("b.y") - F.col("a.y"))
    p = a.join(b, F.col("a.mon") < F.col("b.mon")).select(
        sx.alias("sx"), sy.alias("sy")
    )
    s = p.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("sx") * F.col("sy") > 0, 1).otherwise(0)).alias(
            "concordant"
        ),
        F.sum(F.when(F.col("sx") * F.col("sy") < 0, 1).otherwise(0)).alias(
            "discordant"
        ),
        F.sum(F.when(F.col("sx") == 0, 1).otherwise(0)).alias("ties_x"),
        F.sum(F.when(F.col("sy") == 0, 1).otherwise(0)).alias("ties_y"),
    )
    n_months = m.agg(F.count(F.lit(1)).alias("n_months"))
    return (
        n_months.crossJoin(F.broadcast(s))
        .select(
            "n_months",
            "n_pairs",
            "concordant",
            "discordant",
            F.round(
                (F.col("concordant") - F.col("discordant"))
                / F.sqrt(
                    (F.col("n_pairs") - F.col("ties_x"))
                    * (F.col("n_pairs") - F.col("ties_y"))
                ),
                6,
            ).alias("tau_b"),
        )
    )


# ---------------------------------------------------------------------------
# eval ext: precision / recall / F1 / Cohen's kappa for the lang-ID gate
# ---------------------------------------------------------------------------


from .llm import _NORM, _STOP_SQL  # noqa: E402  (shared lang-ID oracle SQL)

_LANGID_KAPPA_ORACLE = f"""
WITH d AS (SELECT lang, {_NORM} AS norm FROM documents),
t AS (SELECT lang, string_split(norm, ' ') AS toks FROM d),
m AS (
  SELECT (lang = 'en') AS y_true,
         len(list_filter(toks, x -> list_contains({_STOP_SQL}, x)))
           / len(toks) >= 0.05 AS y_pred
  FROM t
), c AS (
  SELECT
    sum(CASE WHEN y_true AND y_pred THEN 1 ELSE 0 END) AS tp,
    sum(CASE WHEN NOT y_true AND y_pred THEN 1 ELSE 0 END) AS fp,
    sum(CASE WHEN y_true AND NOT y_pred THEN 1 ELSE 0 END) AS fn,
    sum(CASE WHEN NOT y_true AND NOT y_pred THEN 1 ELSE 0 END) AS tn
  FROM m
)
SELECT tp, fp, fn, tn,
       round(tp * 1.0 / (tp + fp), 6) AS precision_en,
       round(tp * 1.0 / (tp + fn), 6) AS recall_en,
       round(2.0 * (tp * 1.0 / (tp + fp)) * (tp * 1.0 / (tp + fn))
             / (tp * 1.0 / (tp + fp) + tp * 1.0 / (tp + fn)), 6) AS f1_en,
       round((tp + tn) * 1.0 / (tp + fp + fn + tn), 6) AS accuracy,
       round(((tp + tn) * 1.0 / (tp + fp + fn + tn)
              - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn))
                * 1.0 / pow(tp + fp + fn + tn, 2))
             / (1 - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn))
                    * 1.0 / pow(tp + fp + fn + tn, 2)), 6) AS cohen_kappa
FROM c
"""


@register(
    "eval_langid_prf_kappa",
    doc="Binary-classifier scorecard for the stopword-density language-ID "
    "heuristic (operators/textstats.py::lang_id) against the labeled lang "
    "column: one pass folds the corpus to a 2x2 confusion cell row, then "
    "precision / recall / F1 / accuracy and chance-corrected Cohen's "
    "kappa in closed form.  Complements text_langid_confusion (the raw "
    "matrix) with the summary metrics a corpus gate is tuned on.",
    tags=("text", "eval", "ext"),
    oracle=_LANGID_KAPPA_ORACLE,
)
def eval_langid_prf_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import textstats as ts

    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        (F.col("lang") == "en").alias("y_true"),
        (ts.lang_id(F.col("text")) == "en").alias("y_pred"),
    )
    c = m.agg(
        F.sum(F.when(F.col("y_true") & F.col("y_pred"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(~F.col("y_true") & F.col("y_pred"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("y_true") & ~F.col("y_pred"), 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~F.col("y_true") & ~F.col("y_pred"), 1).otherwise(0)).alias("tn"),
    )
    tp, fp, fn, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
    n = (tp + fp + fn + tn).cast("double")
    po = (tp + tn) / n
    pe = ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) / (n * n)
    prec = tp / (tp + fp)
    rec = tp / (tp + fn)
    return c.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(prec, 6).alias("precision_en"),
        F.round(rec, 6).alias("recall_en"),
        F.round(2 * prec * rec / (prec + rec), 6).alias("f1_en"),
        F.round(po, 6).alias("accuracy"),
        F.round((po - pe) / (1 - pe), 6).alias("cohen_kappa"),
    )


# ---------------------------------------------------------------------------
# A6 ext: mutual information between segment and urgent-order outcome
# ---------------------------------------------------------------------------


@register(
    "agg_mutual_information_seg_urgent",
    doc="Mutual information (bits) between customer market segment and the "
    "has-an-URGENT-order outcome: per-customer outcome flag from one "
    "left join + max aggregate, 5x2 joint cells from a second tiny "
    "aggregate, then MI = sum p_xy*log2(p_xy/(p_x*p_y)) with marginals "
    "rebuilt from the cells via windows — no extra scan.  The feature-"
    "relevance screen (information gain) of a training pipeline.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH flags AS (
  SELECT c.c_custkey, any_value(c.c_mktsegment) AS seg,
         max(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS y
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
), cells AS (
  SELECT seg, y, count(*) AS n FROM flags GROUP BY seg, y
), p AS (
  SELECT seg, y, n,
         n * 1.0 / sum(n) OVER () AS pxy,
         sum(n) OVER (PARTITION BY seg) * 1.0 / sum(n) OVER () AS px,
         sum(n) OVER (PARTITION BY y) * 1.0 / sum(n) OVER () AS py
  FROM cells
)
SELECT count(*) AS n_cells,
       round(sum(pxy * log2(pxy / (px * py))), 6) AS mi_bits,
       round(-sum(CASE WHEN y = 1 THEN pxy ELSE 0 END)
               * log2(sum(CASE WHEN y = 1 THEN pxy ELSE 0 END))
             - sum(CASE WHEN y = 0 THEN pxy ELSE 0 END)
               * log2(sum(CASE WHEN y = 0 THEN pxy ELSE 0 END)), 6) AS h_outcome
FROM p
""",
)
def agg_mutual_information_seg_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    flags = (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.any_value("c_mktsegment").alias("seg"),
            F.max(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("y"),
        )
    )
    cells = flags.groupBy("seg", "y").agg(F.count(F.lit(1)).alias("n"))
    w_all = Window.partitionBy()
    tot = F.sum("n").over(w_all)
    p = cells.select(
        "seg",
        "y",
        (F.col("n") / tot).alias("pxy"),
        (F.sum("n").over(Window.partitionBy("seg")) / tot).alias("px"),
        (F.sum("n").over(Window.partitionBy("y")) / tot).alias("py"),
    )
    py1 = F.sum(F.when(F.col("y") == 1, F.col("pxy")).otherwise(F.lit(0.0)))
    py0 = F.sum(F.when(F.col("y") == 0, F.col("pxy")).otherwise(F.lit(0.0)))
    return p.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.round(
            F.sum(F.col("pxy") * F.log2(F.col("pxy") / (F.col("px") * F.col("py")))),
            6,
        ).alias("mi_bits"),
        F.round(-py1 * F.log2(py1) - py0 * F.log2(py0), 6).alias("h_outcome"),
    )


# ---------------------------------------------------------------------------
# A6 ext: population stability index (PSI) drift between two years
# ---------------------------------------------------------------------------


@register(
    "agg_psi_stability",
    doc="Population Stability Index of the order-value distribution, 1996 "
    "baseline vs 2000 current: fixed 25k-wide bins (floor(x/25000)+1, "
    "bit-identical on both engines), both periods binned in ONE "
    "conditional aggregate pass, Laplace-smoothed shares "
    "(n+0.5)/(N+0.5B) so empty bins stay finite, "
    "PSI = sum (p-q)*ln(p/q).  The standard model-monitoring drift "
    "gate; mergeable bins make it incremental at any scale.",
    tags=("agg", "drift", "ext"),
    oracle="""
WITH b AS (
  SELECT CAST(floor(o_totalprice / 25000.0) + 1 AS INT) AS bin,
         count(CASE WHEN year(o_orderdate) = 1996 THEN 1 END) AS n_base,
         count(CASE WHEN year(o_orderdate) = 2000 THEN 1 END) AS n_cur
  FROM orders
  WHERE year(o_orderdate) IN (1996, 2000)
  GROUP BY 1
), t AS (
  SELECT count(*) AS n_bins, sum(n_base) AS tb, sum(n_cur) AS tc FROM b
), s AS (
  SELECT (n_base + 0.5) / (t.tb + 0.5 * t.n_bins) AS p,
         (n_cur + 0.5) / (t.tc + 0.5 * t.n_bins) AS q
  FROM b, t
)
SELECT (SELECT n_bins FROM t) AS n_bins,
       round(sum((p - q) * ln(p / q)), 6) AS psi,
       (sum((p - q) * ln(p / q)) > 0.2) AS drifted
FROM s
""",
)
def agg_psi_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    b = (
        orders.filter(yr.isin(1996, 2000))
        .withColumn(
            "bin", (F.floor(F.col("o_totalprice") / F.lit(25000.0)) + 1).cast("int")
        )
        .groupBy("bin")
        .agg(
            F.count(F.when(yr == 1996, 1)).alias("n_base"),
            F.count(F.when(yr == 2000, 1)).alias("n_cur"),
        )
    )
    t = b.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("n_base").alias("tb"),
        F.sum("n_cur").alias("tc"),
    )
    s = b.crossJoin(F.broadcast(t)).select(
        "n_bins",
        ((F.col("n_base") + 0.5) / (F.col("tb") + 0.5 * F.col("n_bins"))).alias("p"),
        ((F.col("n_cur") + 0.5) / (F.col("tc") + 0.5 * F.col("n_bins"))).alias("q"),
    )
    psi = F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")))
    return s.groupBy("n_bins").agg(
        F.round(psi, 6).alias("psi"), (psi > 0.2).alias("drifted")
    )


# ---------------------------------------------------------------------------
# W5 ext: forecast error metrics (MAPE / sMAPE / RMSE / MASE)
# ---------------------------------------------------------------------------


@register(
    "window_forecast_error_metrics",
    doc="Backtest scorecard of a trailing-3-month-mean forecast on monthly "
    "revenue: the fact table folds to ~80 cents-rounded month cells "
    "first, the forecast is a ROWS 3-PRECEDING window on that tiny "
    "series, and MAPE / sMAPE / RMSE plus MASE (scaled by the naive "
    "lag-1 error over the same evaluation window) come from one final "
    "aggregate.  The expensive part stays a single fact-table reduce.",
    tags=("window", "forecast", "ext"),
    oracle="""
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS mon,
         round(sum(o_totalprice), 2) AS y
  FROM orders GROUP BY 1
), f AS (
  SELECT mon, y,
         avg(y) OVER (ORDER BY mon ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
           AS fc,
         lag(y) OVER (ORDER BY mon) AS y_prev,
         row_number() OVER (ORDER BY mon) AS rn
  FROM m
)
SELECT count(*) AS n_eval,
       round(avg(abs(y - fc) / y), 6) AS mape,
       round(avg(2 * abs(y - fc) / (y + fc)), 6) AS smape,
       round(sqrt(avg((y - fc) * (y - fc))), 2) AS rmse,
       round(avg(abs(y - fc)) / avg(abs(y - y_prev)), 6) AS mase
FROM f WHERE rn > 3
""",
)
def window_forecast_error_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("y")
    )
    w = Window.orderBy("mon")
    f = m.select(
        "y",
        F.avg("y").over(w.rowsBetween(-3, -1)).alias("fc"),
        F.lag("y").over(w).alias("y_prev"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") > 3)
    err = F.abs(F.col("y") - F.col("fc"))
    return f.agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.round(F.avg(err / F.col("y")), 6).alias("mape"),
        F.round(F.avg(2 * err / (F.col("y") + F.col("fc"))), 6).alias("smape"),
        F.round(
            F.sqrt(F.avg((F.col("y") - F.col("fc")) * (F.col("y") - F.col("fc")))), 2
        ).alias("rmse"),
        F.round(
            F.avg(err) / F.avg(F.abs(F.col("y") - F.col("y_prev"))), 6
        ).alias("mase"),
    )


# ---------------------------------------------------------------------------
# W5 ext: Sharpe / Sortino ratios on monthly log-returns
# ---------------------------------------------------------------------------


@register(
    "window_sharpe_sortino",
    doc="Risk-adjusted return profile of the monthly revenue series: fold "
    "the fact table to ~80 cents-rounded month cells, log-returns via "
    "one lag window on the tiny series, then mean return, volatility "
    "(stddev_samp), Sharpe, and Sortino (downside deviation from "
    "negative returns only) in a single final aggregate.",
    tags=("window", "finance", "ext"),
    oracle="""
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS mon,
         round(sum(o_totalprice), 2) AS y
  FROM orders GROUP BY 1
), r AS (
  SELECT ln(y / lag(y) OVER (ORDER BY mon)) AS ret FROM m
)
SELECT count(ret) AS n_returns,
       round(avg(ret), 6) AS mean_ret,
       round(stddev_samp(ret), 6) AS vol,
       round(avg(ret) / stddev_samp(ret), 6) AS sharpe,
       round(avg(ret) / sqrt(avg(CASE WHEN ret < 0 THEN ret * ret
                                      ELSE 0 END)), 6) AS sortino
FROM r
""",
)
def window_sharpe_sortino(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("y")
    )
    r = m.select(
        F.log(F.col("y") / F.lag("y").over(Window.orderBy("mon"))).alias("ret")
    )
    down2 = F.avg(
        F.when(F.col("ret") < 0, F.col("ret") * F.col("ret")).otherwise(F.lit(0.0))
    )
    return r.agg(
        F.count("ret").alias("n_returns"),
        F.round(F.avg("ret"), 6).alias("mean_ret"),
        F.round(F.stddev_samp("ret"), 6).alias("vol"),
        F.round(F.avg("ret") / F.stddev_samp("ret"), 6).alias("sharpe"),
        F.round(F.avg("ret") / F.sqrt(down2), 6).alias("sortino"),
    )


# ---------------------------------------------------------------------------
# A6 ext: Nelson-Aalen cumulative hazard of order fulfilment time
# ---------------------------------------------------------------------------


@register(
    "agg_nelson_aalen",
    doc="Nelson-Aalen cumulative-hazard estimator of order fulfilment "
    "duration (order date → last line shipment), open-status orders "
    "censored at their observed duration — the counting-process sibling "
    "of agg_kaplan_meier (which models customer lifetimes).  One join+agg "
    "to per-order durations, a second aggregate to per-day event/censor "
    "counts, then the risk set and H(t)=Σ d_i/n_i as running windows "
    "over the tiny duration axis.  First 15 event times reported.",
    tags=("agg", "survival", "ext"),
    oracle="""
WITH dur AS (
  SELECT o.o_orderkey,
         date_diff('day', o.o_orderdate, max(l.l_shipdate)) AS t,
         max(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS censored
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate
), cell AS (
  SELECT t,
         sum(1 - censored) AS d,
         sum(censored) AS c
  FROM dur GROUP BY t
), risk AS (
  SELECT t, d,
         sum(d + c) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS gone,
         sum(d + c) OVER () AS total
  FROM cell
)
SELECT t, d,
       total - coalesce(gone, 0) AS n_risk,
       round(sum(d * 1.0 / (total - coalesce(gone, 0)))
             OVER (ORDER BY t), 6) AS cum_hazard
FROM risk WHERE d > 0 ORDER BY t LIMIT 15
""",
)
def agg_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dur = (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.datediff(F.max("l_shipdate"), F.first("o_orderdate")).alias("t"),
            F.max(
                F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)
            ).alias("censored"),
        )
    )
    cell = dur.groupBy("t").agg(
        F.sum(1 - F.col("censored")).alias("d"),
        F.sum("censored").alias("c"),
    )
    w = Window.orderBy("t")
    risk = cell.select(
        "t",
        "d",
        F.sum(F.col("d") + F.col("c"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .alias("gone"),
        F.sum(F.col("d") + F.col("c")).over(Window.partitionBy()).alias("total"),
    )
    n_risk = F.col("total") - F.coalesce(F.col("gone"), F.lit(0))
    return (
        risk.withColumn("n_risk", n_risk)
        .withColumn(
            "cum_hazard", F.round(F.sum(F.col("d") / n_risk).over(w), 6)
        )
        .filter(F.col("d") > 0)
        .select("t", "d", "n_risk", "cum_hazard")
        .orderBy("t")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# A6 ext: Cramér's V (plus bias-corrected) for returnflag × linestatus
# ---------------------------------------------------------------------------


@register(
    "agg_cramers_v",
    doc="Effect-size summary of categorical association: chi-square of "
    "l_returnflag × l_linestatus folded to a ≤6-cell contingency table in "
    "one pass (marginals via windows over the cells, as in "
    "agg_chi_square_independence which covers segment×priority), then "
    "Cramér's V and the Bergsma bias-corrected V in closed form.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH cells AS (
  SELECT l_returnflag AS rf, l_linestatus AS ls, count(*) AS n
  FROM lineitem GROUP BY 1, 2
), e AS (
  SELECT n,
         sum(n) OVER (PARTITION BY rf) * sum(n) OVER (PARTITION BY ls)
           * 1.0 / sum(n) OVER () AS expected
  FROM cells
), s AS (
  SELECT sum((n - expected) * (n - expected) / expected) AS chi2,
         sum(n) AS total,
         (SELECT count(DISTINCT rf) FROM cells) AS r,
         (SELECT count(DISTINCT ls) FROM cells) AS c
  FROM e
)
SELECT round(chi2, 4) AS chi2,
       (r - 1) * (c - 1) AS dof,
       round(sqrt(chi2 / (total * (least(r, c) - 1))), 6) AS cramers_v,
       round(sqrt(
         greatest(0, chi2 / total - (r - 1) * (c - 1) * 1.0 / (total - 1))
         / least(r - pow(r - 1, 2) * 1.0 / (total - 1),
                 c - pow(c - 1, 2) * 1.0 / (total - 1) ) ), 6)
         AS cramers_v_corrected
FROM s
""",
)
def agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.col("l_returnflag").alias("rf"), F.col("l_linestatus").alias("ls")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = F.sum("n").over(Window.partitionBy())
    e = cells.select(
        "n",
        "rf",
        "ls",
        (
            F.sum("n").over(Window.partitionBy("rf"))
            * F.sum("n").over(Window.partitionBy("ls"))
            / tot
        ).alias("expected"),
    )
    s = e.agg(
        F.sum(
            (F.col("n") - F.col("expected"))
            * (F.col("n") - F.col("expected"))
            / F.col("expected")
        ).alias("chi2"),
        F.sum("n").alias("total"),
        F.countDistinct("rf").alias("r"),
        F.countDistinct("ls").alias("c"),
    )
    chi2, total = F.col("chi2"), F.col("total")
    r, c = F.col("r"), F.col("c")
    phi2c = F.greatest(
        F.lit(0.0), chi2 / total - (r - 1) * (c - 1) / (total - 1)
    )
    return s.select(
        F.round(chi2, 4).alias("chi2"),
        ((r - 1) * (c - 1)).alias("dof"),
        F.round(F.sqrt(chi2 / (total * (F.least(r, c) - 1))), 6).alias("cramers_v"),
        F.round(
            F.sqrt(
                phi2c
                / F.least(
                    r - F.pow(r - 1, F.lit(2)) / (total - 1),
                    c - F.pow(c - 1, F.lit(2)) / (total - 1),
                )
            ),
            6,
        ).alias("cramers_v_corrected"),
    )


# ---------------------------------------------------------------------------
# A6 ext: two-sample Poisson rate test (weekend vs weekday event rates)
# ---------------------------------------------------------------------------


@register(
    "events_poisson_rate_test",
    doc="Two-sample Poisson rate comparison of the event stream: weekend "
    "vs weekday daily event rates, exposure = distinct observed days of "
    "each type, z = (r1-r2)/sqrt(n1/d1² + n2/d2²) — the rate-based "
    "sibling of agg_two_proportion_ztest.  One conditional aggregate "
    "pass over events; day-of-week via ISO weekday so both engines "
    "agree on the weekend definition.",
    tags=("events", "stats", "ext"),
    oracle="""
WITH e AS (
  SELECT isodow(ts) >= 6 AS is_weekend, date_trunc('day', ts) AS d FROM events
), s AS (
  SELECT count(CASE WHEN is_weekend THEN 1 END) AS n1,
         count(DISTINCT CASE WHEN is_weekend THEN d END) AS d1,
         count(CASE WHEN NOT is_weekend THEN 1 END) AS n2,
         count(DISTINCT CASE WHEN NOT is_weekend THEN d END) AS d2
  FROM e
)
SELECT n1, d1, n2, d2,
       round(n1 * 1.0 / d1, 6) AS weekend_rate,
       round(n2 * 1.0 / d2, 6) AS weekday_rate,
       round((n1 * 1.0 / d1 - n2 * 1.0 / d2)
             / sqrt(n1 * 1.0 / (d1 * d1) + n2 * 1.0 / (d2 * d2)), 4) AS z_stat
FROM s
""",
)
def events_poisson_rate_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wk = F.expr("weekday(ts)") >= 5  # Mon=0 … Sun=6
    day = F.date_trunc("day", "ts")
    s = ev.select(wk.alias("is_weekend"), day.alias("d")).agg(
        F.count(F.when(F.col("is_weekend"), 1)).alias("n1"),
        F.countDistinct(F.when(F.col("is_weekend"), F.col("d"))).alias("d1"),
        F.count(F.when(~F.col("is_weekend"), 1)).alias("n2"),
        F.countDistinct(F.when(~F.col("is_weekend"), F.col("d"))).alias("d2"),
    )
    n1, d1, n2, d2 = F.col("n1"), F.col("d1"), F.col("n2"), F.col("d2")
    r1, r2 = n1 / d1, n2 / d2
    return s.select(
        "n1",
        "d1",
        "n2",
        "d2",
        F.round(r1, 6).alias("weekend_rate"),
        F.round(r2, 6).alias("weekday_rate"),
        F.round((r1 - r2) / F.sqrt(n1 / (d1 * d1) + n2 / (d2 * d2)), 4).alias(
            "z_stat"
        ),
    )


# ---------------------------------------------------------------------------
# J5 ext: entropy-weighted TOPSIS multi-criteria supplier ranking
# ---------------------------------------------------------------------------


@register(
    "join_topsis_supplier_rank",
    doc="Entropy-weighted TOPSIS ranking of suppliers on three criteria "
    "(revenue supplied ↑, quantity shipped ↑, average discount given ↓): "
    "the fact table folds to one row per supplier first, then vector "
    "normalisation, entropy-derived criterion weights, ideal/anti-ideal "
    "distances and the closeness score all run as window aggregates over "
    "the supplier relation — multi-criteria decision analysis as a pure "
    "dataframe plan.  Deterministic top 10 by closeness.",
    tags=("join", "ranking", "ext"),
    oracle="""
WITH s AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev,
         sum(l_quantity) AS qty,
         avg(l_discount) + 1e-6 AS disc
  FROM lineitem GROUP BY l_suppkey
), v AS (
  SELECT l_suppkey,
         rev / sqrt(sum(rev * rev) OVER ()) AS r1,
         qty / sqrt(sum(qty * qty) OVER ()) AS r2,
         disc / sqrt(sum(disc * disc) OVER ()) AS r3,
         rev / sum(rev) OVER () AS p1,
         qty / sum(qty) OVER () AS p2,
         disc / sum(disc) OVER () AS p3,
         count(*) OVER () AS n
  FROM s
), ent AS (
  SELECT 1 + sum(p1 * ln(p1)) / ln(any_value(n)) AS d1,
         1 + sum(p2 * ln(p2)) / ln(any_value(n)) AS d2,
         1 + sum(p3 * ln(p3)) / ln(any_value(n)) AS d3
  FROM v
), w AS (
  SELECT d1 / (d1 + d2 + d3) AS w1, d2 / (d1 + d2 + d3) AS w2,
         d3 / (d1 + d2 + d3) AS w3
  FROM ent
), x AS (
  SELECT l_suppkey, w1 * r1 AS x1, w2 * r2 AS x2, w3 * r3 AS x3 FROM v, w
), bounds AS (
  SELECT max(x1) AS b1, max(x2) AS b2, min(x3) AS b3,
         min(x1) AS a1, min(x2) AS a2, max(x3) AS a3
  FROM x
)
SELECT l_suppkey,
       round(sqrt((x1-a1)^2 + (x2-a2)^2 + (x3-a3)^2)
             / (sqrt((x1-b1)^2 + (x2-b2)^2 + (x3-b3)^2)
                + sqrt((x1-a1)^2 + (x2-a2)^2 + (x3-a3)^2)), 6) AS closeness
FROM x, bounds
ORDER BY closeness DESC, l_suppkey LIMIT 10
""",
)
def join_topsis_supplier_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    s = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "rev"
        ),
        F.sum("l_quantity").alias("qty"),
        (F.avg("l_discount") + F.lit(1e-6)).alias("disc"),
    )
    w_all = Window.partitionBy()
    v = s.select(
        "l_suppkey",
        (F.col("rev") / F.sqrt(F.sum(F.col("rev") * F.col("rev")).over(w_all))).alias(
            "r1"
        ),
        (F.col("qty") / F.sqrt(F.sum(F.col("qty") * F.col("qty")).over(w_all))).alias(
            "r2"
        ),
        (
            F.col("disc") / F.sqrt(F.sum(F.col("disc") * F.col("disc")).over(w_all))
        ).alias("r3"),
        (F.col("rev") / F.sum("rev").over(w_all)).alias("p1"),
        (F.col("qty") / F.sum("qty").over(w_all)).alias("p2"),
        (F.col("disc") / F.sum("disc").over(w_all)).alias("p3"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    ent = v.agg(
        (1 + F.sum(F.col("p1") * F.log("p1")) / F.log(F.any_value("n"))).alias("d1"),
        (1 + F.sum(F.col("p2") * F.log("p2")) / F.log(F.any_value("n"))).alias("d2"),
        (1 + F.sum(F.col("p3") * F.log("p3")) / F.log(F.any_value("n"))).alias("d3"),
    )
    w = ent.select(
        (F.col("d1") / (F.col("d1") + F.col("d2") + F.col("d3"))).alias("w1"),
        (F.col("d2") / (F.col("d1") + F.col("d2") + F.col("d3"))).alias("w2"),
        (F.col("d3") / (F.col("d1") + F.col("d2") + F.col("d3"))).alias("w3"),
    )
    x = v.crossJoin(F.broadcast(w)).select(
        "l_suppkey",
        (F.col("w1") * F.col("r1")).alias("x1"),
        (F.col("w2") * F.col("r2")).alias("x2"),
        (F.col("w3") * F.col("r3")).alias("x3"),
    )
    bounds = x.agg(
        F.max("x1").alias("b1"),
        F.max("x2").alias("b2"),
        F.min("x3").alias("b3"),
        F.min("x1").alias("a1"),
        F.min("x2").alias("a2"),
        F.max("x3").alias("a3"),
    )
    xb = x.crossJoin(F.broadcast(bounds))
    d_best = F.sqrt(
        F.pow(F.col("x1") - F.col("b1"), F.lit(2))
        + F.pow(F.col("x2") - F.col("b2"), F.lit(2))
        + F.pow(F.col("x3") - F.col("b3"), F.lit(2))
    )
    d_worst = F.sqrt(
        F.pow(F.col("x1") - F.col("a1"), F.lit(2))
        + F.pow(F.col("x2") - F.col("a2"), F.lit(2))
        + F.pow(F.col("x3") - F.col("a3"), F.lit(2))
    )
    return (
        xb.select(
            "l_suppkey",
            F.round(d_worst / (d_best + d_worst), 6).alias("closeness"),
        )
        .orderBy(F.desc("closeness"), "l_suppkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# A6 ext: Simpson's-paradox reversal detector over stratified odds
# ---------------------------------------------------------------------------


@register(
    "agg_simpson_reversal",
    doc="Simpson's-paradox screen on the stratified 2×2 design of "
    "agg_mantel_haenszel_or (BUILDING vs MACHINERY × has-URGENT-order, "
    "stratified by nation): per-stratum Haldane-corrected log-odds "
    "signs vs the pooled log-odds sign, reporting how many strata agree "
    "or disagree with the pooled direction and whether the aggregate "
    "association reverses the within-stratum majority — the check a "
    "metrics platform runs before trusting a pooled ratio.",
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
         sum(CASE WHEN seg = 'BUILDING' AND y = 1 THEN 1 ELSE 0 END) + 0.5 AS a,
         sum(CASE WHEN seg = 'BUILDING' AND y = 0 THEN 1 ELSE 0 END) + 0.5 AS b,
         sum(CASE WHEN seg = 'MACHINERY' AND y = 1 THEN 1 ELSE 0 END) + 0.5 AS c,
         sum(CASE WHEN seg = 'MACHINERY' AND y = 0 THEN 1 ELSE 0 END) + 0.5 AS d
  FROM flags GROUP BY stratum
), s AS (
  SELECT count(*) AS n_strata,
         sum(CASE WHEN ln(a * d / (b * c)) > 0 THEN 1 ELSE 0 END) AS n_pos,
         sum(CASE WHEN ln(a * d / (b * c)) < 0 THEN 1 ELSE 0 END) AS n_neg,
         sum(a) - 0.5 * count(*) AS ta, sum(b) - 0.5 * count(*) AS tb,
         sum(c) - 0.5 * count(*) AS tc, sum(d) - 0.5 * count(*) AS td
  FROM cells
)
SELECT n_strata, n_pos, n_neg,
       round(ln((ta + 0.5) * (td + 0.5) / ((tb + 0.5) * (tc + 0.5))), 6)
         AS pooled_log_or,
       (CASE WHEN ln((ta + 0.5) * (td + 0.5) / ((tb + 0.5) * (tc + 0.5))) > 0
             THEN n_neg ELSE n_pos END) > n_strata / 2.0 AS reversal
FROM s
""",
)
def agg_simpson_reversal(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        (F.sum(F.when((seg == "BUILDING") & (y == 1), 1).otherwise(0)) + 0.5).alias(
            "a"
        ),
        (F.sum(F.when((seg == "BUILDING") & (y == 0), 1).otherwise(0)) + 0.5).alias(
            "b"
        ),
        (F.sum(F.when((seg == "MACHINERY") & (y == 1), 1).otherwise(0)) + 0.5).alias(
            "c"
        ),
        (F.sum(F.when((seg == "MACHINERY") & (y == 0), 1).otherwise(0)) + 0.5).alias(
            "d"
        ),
    )
    log_or = F.log(F.col("a") * F.col("d") / (F.col("b") * F.col("c")))
    s = cells.agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum(F.when(log_or > 0, 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(log_or < 0, 1).otherwise(0)).alias("n_neg"),
        (F.sum("a") - 0.5 * F.count(F.lit(1))).alias("ta"),
        (F.sum("b") - 0.5 * F.count(F.lit(1))).alias("tb"),
        (F.sum("c") - 0.5 * F.count(F.lit(1))).alias("tc"),
        (F.sum("d") - 0.5 * F.count(F.lit(1))).alias("td"),
    )
    pooled = F.log(
        (F.col("ta") + 0.5)
        * (F.col("td") + 0.5)
        / ((F.col("tb") + 0.5) * (F.col("tc") + 0.5))
    )
    return s.select(
        "n_strata",
        "n_pos",
        "n_neg",
        F.round(pooled, 6).alias("pooled_log_or"),
        (
            F.when(pooled > 0, F.col("n_neg")).otherwise(F.col("n_pos"))
            > F.col("n_strata") / 2.0
        ).alias("reversal"),
    )


# ---------------------------------------------------------------------------
# A6 ext: McNemar's paired test of two binary customer outcomes
# ---------------------------------------------------------------------------


@register(
    "agg_mcnemar_paired",
    doc="McNemar's test for paired binary outcomes on the same customers — "
    "has-an-URGENT-order vs has-a-large-order (>250k): both flags fold "
    "out of ONE left join + per-customer aggregate, the discordant "
    "cells b/c from one more tiny aggregate, then the plain and "
    "continuity-corrected chi-square in closed form.  The paired "
    "complement of agg_two_proportion_ztest (which assumes independent "
    "samples).",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH flags AS (
  SELECT c.c_custkey,
         max(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS a,
         max(CASE WHEN o.o_totalprice > 250000 THEN 1 ELSE 0 END) AS b
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
), cells AS (
  SELECT sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS n10,
         sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS n01,
         sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS n11,
         sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS n00
  FROM flags
)
SELECT n11, n10, n01, n00,
       round((n10 - n01) * (n10 - n01) * 1.0 / (n10 + n01), 4) AS chi2,
       round((abs(n10 - n01) - 1) * (abs(n10 - n01) - 1) * 1.0
             / (n10 + n01), 4) AS chi2_corrected
FROM cells
""",
)
def agg_mcnemar_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    flags = (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.max(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("a"),
            F.max(F.when(F.col("o_totalprice") > 250000, 1).otherwise(0)).alias("b"),
        )
    )
    a, b = F.col("a"), F.col("b")
    cells = flags.agg(
        F.sum(F.when((a == 1) & (b == 0), 1).otherwise(0)).alias("n10"),
        F.sum(F.when((a == 0) & (b == 1), 1).otherwise(0)).alias("n01"),
        F.sum(F.when((a == 1) & (b == 1), 1).otherwise(0)).alias("n11"),
        F.sum(F.when((a == 0) & (b == 0), 1).otherwise(0)).alias("n00"),
    )
    n10, n01 = F.col("n10"), F.col("n01")
    return cells.select(
        "n11",
        "n10",
        "n01",
        "n00",
        F.round((n10 - n01) * (n10 - n01) / (n10 + n01), 4).alias("chi2"),
        F.round(
            (F.abs(n10 - n01) - 1) * (F.abs(n10 - n01) - 1) / (n10 + n01), 4
        ).alias("chi2_corrected"),
    )


# ---------------------------------------------------------------------------
# feat ext: weight-of-evidence / information-value encoding of deciles
# ---------------------------------------------------------------------------


@register(
    "feat_woe_iv_deciles",
    doc="Credit-scoring style WOE/IV screen: account-balance deciles "
    "(deterministic ntile over cent-rounded balance with key tiebreak) "
    "against the has-URGENT-order outcome; per-decile weight of "
    "evidence ln(pos_share/neg_share) with 0.5 smoothing and the "
    "total information value as a window over the 10 decile cells.  "
    "Companion to feat_target_encoding_loo on the supervised-encoding "
    "side.",
    tags=("feat", "stats", "ext"),
    oracle="""
WITH flags AS (
  SELECT c.c_custkey, any_value(round(c.c_acctbal, 2)) AS bal,
         max(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS y
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
), d AS (
  SELECT y, ntile(10) OVER (ORDER BY bal, c_custkey) AS decile FROM flags
), cell AS (
  SELECT decile,
         sum(y) + 0.5 AS pos,
         sum(1 - y) + 0.5 AS neg
  FROM d GROUP BY decile
), sh AS (
  SELECT decile, pos, neg,
         pos / sum(pos) OVER () AS ps,
         neg / sum(neg) OVER () AS ns
  FROM cell
)
SELECT decile,
       CAST(pos - 0.5 AS BIGINT) AS n_pos,
       CAST(neg - 0.5 AS BIGINT) AS n_neg,
       round(ln(ps / ns), 6) AS woe,
       round(sum((ps - ns) * ln(ps / ns)) OVER (), 6) AS iv_total
FROM sh ORDER BY decile
""",
)
def feat_woe_iv_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    flags = (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.any_value(F.round("c_acctbal", 2)).alias("bal"),
            F.max(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("y"),
        )
    )
    d = flags.select(
        "y", F.ntile(10).over(Window.orderBy("bal", "c_custkey")).alias("decile")
    )
    cell = d.groupBy("decile").agg(
        (F.sum("y") + 0.5).alias("pos"),
        (F.sum(1 - F.col("y")) + 0.5).alias("neg"),
    )
    w_all = Window.partitionBy()
    sh = cell.select(
        "decile",
        "pos",
        "neg",
        (F.col("pos") / F.sum("pos").over(w_all)).alias("ps"),
        (F.col("neg") / F.sum("neg").over(w_all)).alias("ns"),
    )
    woe = F.log(F.col("ps") / F.col("ns"))
    return sh.select(
        "decile",
        (F.col("pos") - 0.5).cast("bigint").alias("n_pos"),
        (F.col("neg") - 0.5).cast("bigint").alias("n_neg"),
        F.round(woe, 6).alias("woe"),
        F.round(F.sum((F.col("ps") - F.col("ns")) * woe).over(w_all), 6).alias(
            "iv_total"
        ),
    ).orderBy("decile")


# ---------------------------------------------------------------------------
# W5 ext: Hurst exponent via rescaled-range (R/S) analysis
# ---------------------------------------------------------------------------


@register(
    "window_hurst_rescaled_range",
    doc="Hurst exponent of the monthly order-count series by classical "
    "rescaled-range analysis: the fact table folds to ~80 integer month "
    "cells, the series is replicated across block sizes {8,16,32} with "
    "one explode, R/S per complete block from within-block windows "
    "(running cumulative deviation from the block mean), then "
    "H = regr_slope(ln mean R/S, ln size) over the 3 size points.  "
    "Long-memory diagnostics as a pure window plan.",
    tags=("window", "timeseries", "ext"),
    oracle="""
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS mon, count(*) AS y
  FROM orders GROUP BY 1
), r AS (
  SELECT y, row_number() OVER (ORDER BY mon) - 1 AS rn FROM m
), blk AS (
  SELECT s.s AS size, CAST(floor(rn / s.s) AS INT) AS block, y, rn
  FROM r CROSS JOIN (VALUES (8), (16), (32)) AS s(s)
), dev AS (
  SELECT size, block, y, rn,
         avg(y) OVER (PARTITION BY size, block) AS mu,
         count(*) OVER (PARTITION BY size, block) AS n_in_block
  FROM blk
), cum AS (
  SELECT size, block, n_in_block,
         sum(y - mu) OVER (PARTITION BY size, block ORDER BY rn) AS c,
         stddev_samp(y) OVER (PARTITION BY size, block) AS s_full
  FROM dev
), rs AS (
  SELECT size,
         (max(c) - min(c)) / any_value(s_full) AS ratio
  FROM cum WHERE n_in_block = size
  GROUP BY size, block
), pt AS (
  SELECT size, avg(ratio) AS mean_rs, count(*) AS n_blocks
  FROM rs GROUP BY size
)
SELECT count(*) AS n_sizes,
       round(regr_slope(ln(mean_rs), ln(size)), 4) AS hurst,
       round(min(CASE WHEN size = 8 THEN mean_rs END), 4) AS rs8,
       round(min(CASE WHEN size = 32 THEN mean_rs END), 4) AS rs32
FROM pt
""",
)
def window_hurst_rescaled_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.count(F.lit(1)).alias("y")
    )
    r = m.select("y", (F.row_number().over(Window.orderBy("mon")) - 1).alias("rn"))
    blk = r.select(
        "y",
        "rn",
        F.explode(F.array(F.lit(8), F.lit(16), F.lit(32))).alias("size"),
    ).withColumn("block", F.floor(F.col("rn") / F.col("size")).cast("int"))
    wb = Window.partitionBy("size", "block")
    dev = blk.select(
        "size",
        "block",
        "y",
        "rn",
        F.avg("y").over(wb).alias("mu"),
        F.count(F.lit(1)).over(wb).alias("n_in_block"),
    )
    cum = dev.select(
        "size",
        "block",
        "n_in_block",
        F.sum(F.col("y") - F.col("mu")).over(wb.orderBy("rn")).alias("c"),
        F.stddev_samp("y").over(wb).alias("s_full"),
    )
    rs = (
        cum.filter(F.col("n_in_block") == F.col("size"))
        .groupBy("size", "block")
        .agg(((F.max("c") - F.min("c")) / F.any_value("s_full")).alias("ratio"))
    )
    pt = rs.groupBy("size").agg(F.avg("ratio").alias("mean_rs"))
    return pt.agg(
        F.count(F.lit(1)).alias("n_sizes"),
        F.round(F.regr_slope(F.log("mean_rs"), F.log("size")), 4).alias("hurst"),
        F.round(
            F.min(F.when(F.col("size") == 8, F.col("mean_rs"))), 4
        ).alias("rs8"),
        F.round(
            F.min(F.when(F.col("size") == 32, F.col("mean_rs"))), 4
        ).alias("rs32"),
    )


# ---------------------------------------------------------------------------
# P8 ext: cryptographic-hash / base64 scalar surface
# ---------------------------------------------------------------------------


@register(
    "scalar_hash_encode_surface",
    doc="Digest & transport-encoding scalar breadth over part names: md5 "
    "and sha2-256 hex digests, base64 encode ∘ decode roundtrip proof, "
    "and byte lengths — the content-addressing primitives the corpus "
    "fingerprinting operators build on (operators/textstats.py uses md5; "
    "this entry locks the whole family).  Pure projection, tiny "
    "deterministic slice of 8 parts.",
    tags=("scalar", "ext"),
    oracle="""
SELECT p_partkey,
       md5(p_name) AS name_md5,
       sha256(p_name) AS name_sha256,
       base64(p_name::BLOB) AS name_b64,
       decode(from_base64(base64(p_name::BLOB))) = p_name AS b64_roundtrip,
       octet_length(p_name::BLOB) AS name_bytes
FROM part WHERE p_partkey <= 8 ORDER BY p_partkey
""",
)
def scalar_hash_encode_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    name_bin = F.col("p_name").cast("binary")
    return (
        part.filter(F.col("p_partkey") <= 8)
        .select(
            "p_partkey",
            F.md5(name_bin).alias("name_md5"),
            F.sha2(name_bin, 256).alias("name_sha256"),
            F.base64(name_bin).alias("name_b64"),
            (
                F.unbase64(F.base64(name_bin)).cast("string") == F.col("p_name")
            ).alias("b64_roundtrip"),
            F.octet_length(name_bin).alias("name_bytes"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# graph ext: Markov stationary distribution by unrolled power iteration
# ---------------------------------------------------------------------------

_MARKOV_POWER_STEPS = 6


@register(
    "events_markov_stationary",
    doc="Stationary distribution of the user event-type Markov chain: "
    "transition matrix from per-user lag pairs (the same construction "
    "as events_markov_transitions), then six unrolled power-iteration "
    "steps pi·P starting from uniform — each step a broadcast join + "
    "5-row aggregate over the 25-cell matrix, so the iteration cost is "
    "independent of the fact-table size.  The iterative-algorithm "
    "pattern (PageRank-style) applied to behavioural flow.",
    tags=("events", "graph", "ext"),
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS nxt
  FROM events
), pair AS (
  SELECT event_type AS src, nxt AS dst FROM seq WHERE nxt IS NOT NULL
), p AS (
  SELECT src, dst, count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY src) AS pr
  FROM pair GROUP BY src, dst
), pi0 AS (
  SELECT src AS state, 1.0 / (SELECT count(DISTINCT src) FROM p) AS prob
  FROM (SELECT DISTINCT src FROM p)
),
{",".join(
  f"pi{k + 1} AS (SELECT p.dst AS state, sum(pi{k}.prob * p.pr) AS prob "
  f"FROM pi{k} JOIN p ON p.src = pi{k}.state GROUP BY p.dst)"
  for k in range(_MARKOV_POWER_STEPS)
)}
SELECT state, round(prob, 6) AS stationary_prob
FROM pi{_MARKOV_POWER_STEPS} ORDER BY state
""",
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "event_type",
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    pairs = seq.groupBy(
        F.col("event_type").alias("src"), F.col("nxt").alias("dst")
    ).agg(F.count(F.lit(1)).alias("n"))
    p = pairs.select(
        "src",
        "dst",
        (F.col("n") / F.sum("n").over(Window.partitionBy("src"))).alias("pr"),
    )
    pi = (
        p.select("src")
        .distinct()
        .select(
            F.col("src").alias("state"),
            (F.lit(1.0) / F.count(F.lit(1)).over(Window.partitionBy())).alias("prob"),
        )
    )
    pm = F.broadcast(p)
    for _ in range(_MARKOV_POWER_STEPS):
        pi = (
            pi.join(pm, pm.src == pi.state)
            .groupBy(F.col("dst").alias("state_next"))
            .agg(F.sum(F.col("prob") * F.col("pr")).alias("prob"))
            .withColumnRenamed("state_next", "state")
        )
    return pi.select("state", F.round("prob", 6).alias("stationary_prob")).orderBy(
        "state"
    )


# ---------------------------------------------------------------------------
# A6 ext: generalized-Pareto peaks-over-threshold tail fit
# ---------------------------------------------------------------------------


@register(
    "agg_pot_gpd_fit",
    doc="Peaks-over-threshold extreme-value fit: exact P95 threshold from "
    "one aggregate, excesses over it in a second same-shape scan, "
    "method-of-moments GPD parameters xi/beta in closed form, and the "
    "extrapolated 99.9% VaR — the tail-risk sibling of "
    "agg_gumbel_extremes (block maxima).  Two decomposable passes, no "
    "sort.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH u AS (
  SELECT quantile_cont(round(o_totalprice, 2), 0.95) AS thr,
         count(*) AS n_total
  FROM orders
), ex AS (
  SELECT round(o_totalprice, 2) - thr AS e, thr, n_total
  FROM orders, u WHERE round(o_totalprice, 2) > thr
), s AS (
  SELECT any_value(thr) AS thr, any_value(n_total) AS n_total,
         count(*) AS n_exceed, avg(e) AS m, var_samp(e) AS v
  FROM ex
)
SELECT n_exceed,
       round(thr, 2) AS threshold,
       round(0.5 * (1 - m * m / v), 6) AS xi,
       round(0.5 * m * (m * m / v + 1), 4) AS beta,
       round(thr + (0.5 * m * (m * m / v + 1)) / (0.5 * (1 - m * m / v))
             * (pow(0.001 * n_total * 1.0 / n_exceed,
                    -(0.5 * (1 - m * m / v))) - 1), 2) AS var_999
FROM s
""",
)
def agg_pot_gpd_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    val = F.round("o_totalprice", 2)
    u = orders.agg(
        F.percentile(val, F.lit(0.95)).alias("thr"),
        F.count(F.lit(1)).alias("n_total"),
    )
    ex = (
        orders.crossJoin(F.broadcast(u))
        .filter(val > F.col("thr"))
        .select((val - F.col("thr")).alias("e"), "thr", "n_total")
    )
    s = ex.agg(
        F.any_value("thr").alias("thr"),
        F.any_value("n_total").alias("n_total"),
        F.count(F.lit(1)).alias("n_exceed"),
        F.avg("e").alias("m"),
        F.var_samp("e").alias("v"),
    )
    m, v = F.col("m"), F.col("v")
    xi = 0.5 * (1 - m * m / v)
    beta = 0.5 * m * (m * m / v + 1)
    return s.select(
        "n_exceed",
        F.round(F.col("thr"), 2).alias("threshold"),
        F.round(xi, 6).alias("xi"),
        F.round(beta, 4).alias("beta"),
        F.round(
            F.col("thr")
            + beta
            / xi
            * (
                F.pow(
                    F.lit(0.001) * F.col("n_total") / F.col("n_exceed"),
                    -xi,
                )
                - 1
            ),
            2,
        ).alias("var_999"),
    )


# ---------------------------------------------------------------------------
# A6 ext: Friedman rank test across treatments within blocks
# ---------------------------------------------------------------------------


@register(
    "agg_friedman_test",
    doc="Friedman's rank test of order priority (5 treatments) on mean "
    "order value within nation blocks (25 blocks): the fact table folds "
    "to 125 (nation, priority) cells, within-block ranks come from one "
    "window (deterministic tiebreak on the priority label — cell means "
    "at cent precision make real ties vanishingly rare), then "
    "Q = 12/(nk(k+1))·ΣRj² − 3n(k+1) from the 5 rank sums.  The "
    "nonparametric complement of agg_anova_f_oneway.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH cell AS (
  SELECT c.c_nationkey AS blk, o.o_orderpriority AS trt,
         round(avg(o.o_totalprice), 2) AS val
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
), rk AS (
  SELECT blk, trt,
         rank() OVER (PARTITION BY blk ORDER BY val, trt) AS r
  FROM cell
), rs AS (
  SELECT trt, sum(r) AS rj FROM rk GROUP BY trt
), dims AS (
  SELECT count(DISTINCT blk) AS n, count(DISTINCT trt) AS k FROM cell
)
SELECT n, k,
       round(12.0 / (n * k * (k + 1)) * (SELECT sum(rj * rj) FROM rs)
             - 3.0 * n * (k + 1), 4) AS q_stat,
       k - 1 AS dof
FROM dims
""",
)
def agg_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cell = (
        orders.join(cust, cust.c_custkey == orders.o_custkey)
        .groupBy(
            F.col("c_nationkey").alias("blk"), F.col("o_orderpriority").alias("trt")
        )
        .agg(F.round(F.avg("o_totalprice"), 2).alias("val"))
    )
    rk = cell.select(
        "blk",
        "trt",
        F.rank().over(Window.partitionBy("blk").orderBy("val", "trt")).alias("r"),
    )
    rs = rk.groupBy("trt").agg(F.sum("r").alias("rj"))
    sum_rj2 = rs.agg(F.sum(F.col("rj") * F.col("rj")).alias("srj2"))
    dims = cell.agg(
        F.countDistinct("blk").alias("n"), F.countDistinct("trt").alias("k")
    )
    n, k = F.col("n"), F.col("k")
    return (
        dims.crossJoin(F.broadcast(sum_rj2))
        .select(
            "n",
            "k",
            F.round(
                F.lit(12.0) / (n * k * (k + 1)) * F.col("srj2") - 3.0 * n * (k + 1),
                4,
            ).alias("q_stat"),
            (k - 1).alias("dof"),
        )
    )


# ---------------------------------------------------------------------------
# events ext: DAU/MAU stickiness per month
# ---------------------------------------------------------------------------


@register(
    "events_dau_mau_stickiness",
    doc="Product-analytics stickiness: per month, average daily active "
    "users (distinct user-days over observed days), monthly active "
    "users, and the DAU/MAU ratio — all from ONE distinct-projection "
    "aggregate per grain, no per-day loop.  At scale each grain is a "
    "partial-aggregable count-distinct keyed by calendar bucket.",
    tags=("events", "product", "ext"),
    oracle="""
WITH ud AS (
  SELECT DISTINCT date_trunc('month', ts) AS mon, date_trunc('day', ts) AS d,
         user_id
  FROM events
), daily AS (
  SELECT mon, count(*) AS user_days, count(DISTINCT d) AS n_days FROM ud
  GROUP BY mon
), monthly AS (
  SELECT mon, count(DISTINCT user_id) AS mau FROM ud GROUP BY mon
)
SELECT strftime(d.mon, '%Y-%m') AS mon, d.n_days,
       round(d.user_days * 1.0 / d.n_days, 4) AS avg_dau, m.mau,
       round(d.user_days * 1.0 / d.n_days / m.mau, 6) AS stickiness
FROM daily d JOIN monthly m ON d.mon = m.mon
ORDER BY mon
""",
)
def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        F.date_trunc("month", "ts").alias("mon"),
        F.date_trunc("day", "ts").alias("d"),
        "user_id",
    ).distinct()
    daily = ud.groupBy("mon").agg(
        F.count(F.lit(1)).alias("user_days"),
        F.countDistinct("d").alias("n_days"),
    )
    monthly = ud.groupBy("mon").agg(F.countDistinct("user_id").alias("mau"))
    return (
        daily.join(monthly, "mon")
        .select(
            F.date_format("mon", "yyyy-MM").alias("mon"),
            "n_days",
            F.round(F.col("user_days") / F.col("n_days"), 4).alias("avg_dau"),
            "mau",
            F.round(
                F.col("user_days") / F.col("n_days") / F.col("mau"), 6
            ).alias("stickiness"),
        )
        .orderBy("mon")
    )


# ---------------------------------------------------------------------------
# graph ext: global clustering coefficient (transitivity)
# ---------------------------------------------------------------------------


@register(
    "graph_transitivity",
    doc="Global clustering coefficient of the supplier co-occurrence graph "
    "(same edge set as graph_triangle_count): wedges from the degree "
    "distribution (Σ d(d-1)/2, one aggregate over the edge list "
    "symmetrized by a union), triangles from the oriented a<b<c "
    "three-way self-join, transitivity = 3T / wedges.  The density "
    "diagnostic that says whether the co-occurrence graph is clustered "
    "or random.",
    tags=("graph", "join", "ext"),
    oracle="""
WITH edges AS (
  SELECT DISTINCT s1.l_suppkey AS a, s2.l_suppkey AS b
  FROM lineitem s1 JOIN lineitem s2
    ON s1.l_orderkey = s2.l_orderkey AND s1.l_suppkey < s2.l_suppkey
), deg AS (
  SELECT v, count(*) AS d FROM (
    SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges
  ) GROUP BY v
), wed AS (
  SELECT sum(d * (d - 1) / 2) AS wedges, count(*) AS n_nodes,
         round(avg(d), 4) AS avg_degree
  FROM deg
), tri AS (
  SELECT count(*) AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e1.b = e2.a
  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT n_nodes, avg_degree,
       CAST(wedges AS BIGINT) AS wedges, n_triangles,
       round(3.0 * n_triangles / wedges, 6) AS transitivity
FROM wed, tri
""",
)
def graph_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    s1 = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("a"))
    s2 = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("b"))
    edges = (
        s1.join(s2, "ok").where(F.col("a") < F.col("b")).select("a", "b").distinct()
    )
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    wed = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("wedges"),
        F.count(F.lit(1)).alias("n_nodes"),
        F.round(F.avg("d"), 4).alias("avg_degree"),
    )
    e1 = edges
    e2 = edges.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = edges.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    tri = (
        e1.join(e2, "b")
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return wed.crossJoin(F.broadcast(tri)).select(
        "n_nodes",
        "avg_degree",
        F.col("wedges").cast("bigint").alias("wedges"),
        "n_triangles",
        F.round(3.0 * F.col("n_triangles") / F.col("wedges"), 6).alias(
            "transitivity"
        ),
    )


# ---------------------------------------------------------------------------
# corpus ext: deterministic uniform sampling by hash order
# ---------------------------------------------------------------------------


@register(
    "corpus_hash_uniform_sample",
    doc="Replay-stable uniform sampling without a random source: order "
    "documents by md5(doc_id) — a uniform permutation that both engines "
    "compute identically — and keep the lowest 100; the sample mean of "
    "n_chars lands near the population mean, reported side by side.  "
    "At scale this is a TakeOrdered over a pure projection (no shuffle "
    "of the corpus, no rand() nondeterminism, idempotent across "
    "retries) — the sampling primitive behind corpus_hash_split.",
    tags=("corpus", "sampling", "ext"),
    oracle="""
WITH s AS (
  SELECT n_chars FROM documents ORDER BY md5(doc_id::VARCHAR), doc_id LIMIT 100
), pop AS (
  SELECT count(*) AS n_docs, round(avg(n_chars), 4) AS pop_mean
  FROM documents
)
SELECT (SELECT count(*) FROM s) AS sample_n,
       (SELECT round(avg(n_chars), 4) FROM s) AS sample_mean,
       n_docs, pop_mean
FROM pop
""",
)
def corpus_hash_uniform_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    s = (
        docs.select(
            "n_chars",
            F.md5(F.col("doc_id").cast("string").cast("binary")).alias("h"),
            "doc_id",
        )
        .orderBy("h", "doc_id")
        .limit(100)
    )
    samp = s.agg(
        F.count(F.lit(1)).alias("sample_n"),
        F.round(F.avg("n_chars"), 4).alias("sample_mean"),
    )
    pop = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("pop_mean"),
    )
    return samp.crossJoin(F.broadcast(pop))


# ---------------------------------------------------------------------------
# W5 ext: Theil-Sen robust trend (median of pairwise slopes)
# ---------------------------------------------------------------------------


@register(
    "window_theil_sen_slope",
    doc="Theil-Sen robust trend estimate of monthly revenue: the fact "
    "table folds to ~80 cents-rounded month cells, all O(m²)≈3k pairwise "
    "slopes come from one self-join on the tiny series, the slope is "
    "their exact median, and the intercept the median residual at that "
    "slope (broadcast scalar back over the 80 cells).  Outlier-immune "
    "alternative to agg_ols_normal_equations on the same series.",
    tags=("window", "robust", "ext"),
    oracle="""
WITH m AS (
  SELECT row_number() OVER (ORDER BY date_trunc('month', o_orderdate)) AS i,
         round(sum(o_totalprice), 2) AS y
  FROM orders GROUP BY date_trunc('month', o_orderdate)
), sl AS (
  SELECT quantile_cont((b.y - a.y) / (b.i - a.i), 0.5) AS slope,
         count(*) AS n_pairs
  FROM m a JOIN m b ON a.i < b.i
), ic AS (
  SELECT quantile_cont(m.y - sl.slope * m.i, 0.5) AS intercept
  FROM m, sl
)
SELECT (SELECT count(*) FROM m) AS n_months, sl.n_pairs,
       round(sl.slope, 4) AS ts_slope,
       round(ic.intercept, 2) AS ts_intercept
FROM sl, ic
""",
)
def window_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("y")
    ).select(F.row_number().over(Window.orderBy("mon")).alias("i"), "y")
    a, b = m.alias("a"), m.alias("b")
    sl = (
        a.join(b, F.col("a.i") < F.col("b.i"))
        .select(
            (
                (F.col("b.y") - F.col("a.y")) / (F.col("b.i") - F.col("a.i"))
            ).alias("s")
        )
        .agg(
            F.percentile(F.col("s"), F.lit(0.5)).alias("slope"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )
    ic = (
        m.crossJoin(F.broadcast(sl))
        .agg(
            F.percentile(
                F.col("y") - F.col("slope") * F.col("i"), F.lit(0.5)
            ).alias("intercept")
        )
    )
    n = m.agg(F.count(F.lit(1)).alias("n_months"))
    return (
        n.crossJoin(F.broadcast(sl))
        .crossJoin(F.broadcast(ic))
        .select(
            "n_months",
            "n_pairs",
            F.round(F.col("slope"), 4).alias("ts_slope"),
            F.round(F.col("intercept"), 2).alias("ts_intercept"),
        )
    )


# ---------------------------------------------------------------------------
# A6 ext: Cohen's d / Hedges' g standardized effect sizes
# ---------------------------------------------------------------------------


@register(
    "agg_cohens_d_effect",
    doc="Standardized mean-difference effect sizes for the same contrast "
    "as agg_welch_ttest (BUILDING vs MACHINERY account balance): pooled "
    "standard deviation, Cohen's d, and the small-sample-corrected "
    "Hedges' g — one conditional aggregate pass, closed form after.  "
    "Significance (the t-test) and magnitude (this) are different "
    "questions; a scorecard needs both.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH s AS (
  SELECT
    count(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 END) AS n1,
    avg(CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal END) AS m1,
    var_samp(CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal END) AS v1,
    count(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 END) AS n2,
    avg(CASE WHEN c_mktsegment = 'MACHINERY' THEN c_acctbal END) AS m2,
    var_samp(CASE WHEN c_mktsegment = 'MACHINERY' THEN c_acctbal END) AS v2
  FROM customer
)
SELECT n1, n2,
       round(sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2)), 4)
         AS s_pooled,
       round((m1 - m2) / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2)
                              / (n1 + n2 - 2)), 6) AS cohens_d,
       round((m1 - m2) / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2)
                              / (n1 + n2 - 2))
             * (1 - 3.0 / (4 * (n1 + n2) - 9)), 6) AS hedges_g
FROM s
""",
)
def agg_cohens_d_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    arm1 = F.when(F.col("c_mktsegment") == "BUILDING", bal)
    arm2 = F.when(F.col("c_mktsegment") == "MACHINERY", bal)
    s = cust.agg(
        F.count(arm1).alias("n1"),
        F.avg(arm1).alias("m1"),
        F.var_samp(arm1).alias("v1"),
        F.count(arm2).alias("n2"),
        F.avg(arm2).alias("m2"),
        F.var_samp(arm2).alias("v2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    sp = F.sqrt(
        ((n1 - 1) * F.col("v1") + (n2 - 1) * F.col("v2")) / (n1 + n2 - 2)
    )
    d = (F.col("m1") - F.col("m2")) / sp
    return s.select(
        "n1",
        "n2",
        F.round(sp, 4).alias("s_pooled"),
        F.round(d, 6).alias("cohens_d"),
        F.round(d * (1 - 3.0 / (4 * (n1 + n2) - 9)), 6).alias("hedges_g"),
    )


# ---------------------------------------------------------------------------
# text ext: Dice character-bigram similarity inside brand blocks
# ---------------------------------------------------------------------------


@register(
    "text_dice_bigram_similarity",
    doc="Set-based fuzzy matching, the complement of the edit-distance "
    "profile (scalar_levenshtein_brand_names): distinct character "
    "bigrams of each part name via one HOF projection (no UDF), "
    "Dice = 2|A∩B|/(|A|+|B|) from array_intersect.  Pairs form at the "
    "NAME-VOCABULARY level — rows collapse to distinct (brand, name) "
    "groups first, and each name pair carries its row-pair multiplicity "
    "— so the join cost is O(vocab²/brand) regardless of corpus row "
    "count.  (The row-keyed formulation this replaces was 'blocked by "
    "brand', but brand cardinality is constant, so block size grew with "
    "N and the sf1 sweep caught the O(N²/25) pair blow-up: ~800M "
    "array-intersects for 64 actual distinct names.)  When the "
    "vocabulary itself is web-scale, the threshold form routes through "
    "the df-ordered prefix filter (operators/dedup.py "
    "ngram_jaccard_pairs_prefix; Dice≥t ⟺ Jaccard≥t/(2−t)).  "
    "Deterministic top-10 most-similar name pairs.",
    tags=("text", "similarity", "ext"),
    oracle="""
WITH names AS (
  SELECT p_brand, p_name, count(*) AS n_keys,
         list_distinct(list_transform(range(1, length(p_name)),
                                      i -> substring(p_name, i, 2))) AS grams
  FROM part GROUP BY p_brand, p_name
), pairs AS (
  SELECT a.p_brand AS brand, a.p_name AS name_a, b.p_name AS name_b,
         round(2.0 * len(list_intersect(a.grams, b.grams))
               / (len(a.grams) + len(b.grams)), 6) AS dice,
         CASE WHEN a.p_name = b.p_name
              THEN a.n_keys * (a.n_keys - 1) // 2
              ELSE a.n_keys * b.n_keys END AS n_pairs
  FROM names a JOIN names b
    ON a.p_brand = b.p_brand AND a.p_name <= b.p_name
  WHERE NOT (a.p_name = b.p_name AND a.n_keys < 2)
)
SELECT brand, name_a, name_b, dice, n_pairs
FROM pairs ORDER BY dice DESC, brand, name_a, name_b LIMIT 10
""",
)
def text_dice_bigram_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    names = (
        part.groupBy("p_brand", "p_name")
        .agg(F.count(F.lit(1)).alias("n_keys"))
        .withColumn(
            "grams",
            F.expr(
                "array_distinct(transform(sequence(1, length(p_name) - 1),"
                " i -> substring(p_name, i, 2)))"
            ),
        )
    )
    a, b = names.alias("a"), names.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_name") <= F.col("b.p_name")),
        )
        .filter(
            ~((F.col("a.p_name") == F.col("b.p_name")) & (F.col("a.n_keys") < 2))
        )
        .select(
            F.col("a.p_brand").alias("brand"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.round(
                2.0
                * F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
                / (F.size(F.col("a.grams")) + F.size(F.col("b.grams"))),
                6,
            ).alias("dice"),
            F.when(
                F.col("a.p_name") == F.col("b.p_name"),
                (F.col("a.n_keys") * (F.col("a.n_keys") - 1) / F.lit(2)).cast("long"),
            )
            .otherwise(F.col("a.n_keys") * F.col("b.n_keys"))
            .alias("n_pairs"),
        )
    )
    return pairs.orderBy(F.desc("dice"), "brand", "name_a", "name_b").limit(10)


# ---------------------------------------------------------------------------
# events ext: Lincoln-Petersen / Chapman capture-recapture estimate
# ---------------------------------------------------------------------------


@register(
    "events_capture_recapture",
    doc="Capture-recapture population estimation over the event stream: "
    "distinct users in the first month (capture) and second month "
    "(recapture), the overlap as one semi-joinable intersection, and "
    "the bias-corrected Chapman estimator of the true population — "
    "which the fixture lets us check against the actual distinct-user "
    "count.  All three sets come from one conditional distinct "
    "aggregate, no joins.",
    tags=("events", "stats", "ext"),
    oracle="""
WITH u AS (
  SELECT user_id,
         max(CASE WHEN strftime(ts, '%Y-%m') = '2024-01' THEN 1 ELSE 0 END)
           AS in1,
         max(CASE WHEN strftime(ts, '%Y-%m') = '2024-02' THEN 1 ELSE 0 END)
           AS in2
  FROM events GROUP BY user_id
), s AS (
  SELECT sum(in1) AS n1, sum(in2) AS n2,
         sum(in1 * in2) AS m, count(*) AS true_total
  FROM u
)
SELECT n1, n2, m, true_total,
       round((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1, 2) AS chapman_estimate
FROM s
""",
)
def events_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mon = F.date_format("ts", "yyyy-MM")
    u = ev.groupBy("user_id").agg(
        F.max(F.when(mon == "2024-01", 1).otherwise(0)).alias("in1"),
        F.max(F.when(mon == "2024-02", 1).otherwise(0)).alias("in2"),
    )
    s = u.agg(
        F.sum("in1").alias("n1"),
        F.sum("in2").alias("n2"),
        F.sum(F.col("in1") * F.col("in2")).alias("m"),
        F.count(F.lit(1)).alias("true_total"),
    )
    return s.select(
        "n1",
        "n2",
        "m",
        "true_total",
        F.round(
            (F.col("n1") + 1.0) * (F.col("n2") + 1.0) / (F.col("m") + 1.0) - 1, 2
        ).alias("chapman_estimate"),
    )


# ---------------------------------------------------------------------------
# W5 ext: record statistics (record-breaking months vs i.i.d. expectation)
# ---------------------------------------------------------------------------


@register(
    "window_record_statistics",
    doc="Record statistics of the monthly revenue series: months that "
    "break the running maximum (strict records via an exclusive "
    "1-preceding frame), their count, and the i.i.d.-theory expectation "
    "Σ 1/k (harmonic number over the same rows — under exchangeability "
    "the k-th month is a record with probability 1/k).  An excess of "
    "records over H_n is direct evidence of trend; pairs with "
    "window_peak_drawdown on the risk side.",
    tags=("window", "timeseries", "ext"),
    oracle="""
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS mon,
         round(sum(o_totalprice), 2) AS y
  FROM orders GROUP BY 1
), r AS (
  SELECT mon, y,
         row_number() OVER (ORDER BY mon) AS k,
         max(y) OVER (ORDER BY mon ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS prev_max
  FROM m
)
SELECT count(*) AS n_months,
       sum(CASE WHEN prev_max IS NULL OR y > prev_max THEN 1 ELSE 0 END)
         AS n_records,
       round(sum(1.0 / k), 4) AS expected_records,
       strftime(max(CASE WHEN prev_max IS NULL OR y > prev_max
                         THEN mon END), '%Y-%m') AS last_record_month
FROM r
""",
)
def window_record_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("y")
    )
    w = Window.orderBy("mon")
    r = m.select(
        "mon",
        "y",
        F.row_number().over(w).alias("k"),
        F.max("y").over(w.rowsBetween(Window.unboundedPreceding, -1)).alias(
            "prev_max"
        ),
    )
    is_rec = F.col("prev_max").isNull() | (F.col("y") > F.col("prev_max"))
    return r.agg(
        F.count(F.lit(1)).alias("n_months"),
        F.sum(F.when(is_rec, 1).otherwise(0)).alias("n_records"),
        F.round(F.sum(1.0 / F.col("k")), 4).alias("expected_records"),
        F.date_format(F.max(F.when(is_rec, F.col("mon"))), "yyyy-MM").alias(
            "last_record_month"
        ),
    )


# ---------------------------------------------------------------------------
# A6 ext: grouped log-log price elasticity of demand
# ---------------------------------------------------------------------------


@register(
    "agg_price_elasticity",
    doc="Price elasticity of demand per brand: regr_slope(ln quantity, "
    "ln unit price) over lineitem ⋈ part — the log-log grouped "
    "regression whose slope reads directly as %Δqty per %Δprice.  The "
    "regression aggregate is fully decomposable (sufficient statistics "
    "merge), so one shuffle by brand at any scale; the part side is "
    "dictionary-joined on the fact's partkey.",
    tags=("agg", "regression", "ext"),
    oracle="""
SELECT p_brand,
       count(*) AS n_lines,
       round(regr_slope(ln(l_quantity),
                        ln(l_extendedprice / l_quantity)), 6) AS elasticity,
       round(regr_r2(ln(l_quantity),
                     ln(l_extendedprice / l_quantity)), 6) AS r2
FROM lineitem JOIN part ON p_partkey = l_partkey
GROUP BY p_brand ORDER BY p_brand
""",
)
def agg_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ln_q = F.log(F.col("l_quantity"))
    ln_p = F.log(F.col("l_extendedprice") / F.col("l_quantity"))
    return (
        li.join(part, part.p_partkey == li.l_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.regr_slope(ln_q, ln_p), 6).alias("elasticity"),
            F.round(F.regr_r2(ln_q, ln_p), 6).alias("r2"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# events ext: Poisson overdispersion index of daily event counts
# ---------------------------------------------------------------------------


@register(
    "events_poisson_dispersion",
    doc="Overdispersion diagnostic of the event stream: daily event "
    "counts, their variance-to-mean ratio (index of dispersion, =1 "
    "under Poisson), and the chi-square dispersion statistic "
    "D·(n−1) — the check that decides whether downstream rate models "
    "(events_poisson_rate_test) can assume Poisson at all.  Two "
    "decomposable aggregates (day cells, then moments).",
    tags=("events", "stats", "ext"),
    oracle="""
WITH d AS (
  SELECT date_trunc('day', ts) AS day, count(*) AS n FROM events GROUP BY 1
)
SELECT count(*) AS n_days,
       round(avg(n), 4) AS mean_count,
       round(var_samp(n), 4) AS var_count,
       round(var_samp(n) / avg(n), 6) AS dispersion_index,
       round(var_samp(n) / avg(n) * (count(*) - 1), 2) AS chi2_stat,
       var_samp(n) / avg(n) > 1.5 AS overdispersed
FROM d
""",
)
def events_poisson_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    disp = F.var_samp("n") / F.avg("n")
    return d.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.avg("n"), 4).alias("mean_count"),
        F.round(F.var_samp("n"), 4).alias("var_count"),
        F.round(disp, 6).alias("dispersion_index"),
        F.round(disp * (F.count(F.lit(1)) - 1), 2).alias("chi2_stat"),
        (disp > 1.5).alias("overdispersed"),
    )


# ---------------------------------------------------------------------------
# events ext: negative-binomial moment fit of per-user activity
# ---------------------------------------------------------------------------


@register(
    "events_negbinomial_fit",
    doc="Method-of-moments negative-binomial fit of per-user event "
    "counts (the canonical overdispersed-activity model): "
    "r = m²/(v−m), p = m/v from one user-cell aggregate + one moment "
    "aggregate, with the observed share at the modal low count for "
    "eyeballing fit.  Degenerates gracefully (r<0) if the data turn "
    "out under-dispersed.",
    tags=("events", "stats", "ext"),
    oracle="""
WITH u AS (
  SELECT user_id, count(*) AS n FROM events GROUP BY user_id
), s AS (
  SELECT count(*) AS n_users, avg(n) AS m, var_samp(n) AS v,
         min(n) AS min_count
  FROM u
), lo AS (
  SELECT count(*) AS n_at_min FROM u, s WHERE u.n = s.min_count
)
SELECT n_users, round(m, 4) AS mean_events, round(v, 4) AS var_events,
       round(m * m / (v - m), 4) AS r_hat,
       round(m / v, 6) AS p_hat,
       min_count,
       round(n_at_min * 1.0 / n_users, 6) AS share_at_min
FROM s, lo
""",
)
def events_negbinomial_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    s = u.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.avg("n").alias("m"),
        F.var_samp("n").alias("v"),
        F.min("n").alias("min_count"),
    )
    lo = (
        u.crossJoin(F.broadcast(s.select("min_count")))
        .filter(F.col("n") == F.col("min_count"))
        .agg(F.count(F.lit(1)).alias("n_at_min"))
    )
    m, v = F.col("m"), F.col("v")
    return (
        s.crossJoin(F.broadcast(lo))
        .select(
            "n_users",
            F.round(m, 4).alias("mean_events"),
            F.round(v, 4).alias("var_events"),
            F.round(m * m / (v - m), 4).alias("r_hat"),
            F.round(m / v, 6).alias("p_hat"),
            "min_count",
            F.round(F.col("n_at_min") / F.col("n_users"), 6).alias("share_at_min"),
        )
    )


# ---------------------------------------------------------------------------
# eval ext: average precision (area under the PR curve, step form)
# ---------------------------------------------------------------------------


@register(
    "eval_average_precision",
    doc="Ranking-quality eval: average precision of account balance as a "
    "score for the has-URGENT-order label — items ranked by (score "
    "desc, key) in one window over the per-customer relation, "
    "precision@k read off the running positive count, AP = mean of "
    "precision at the positive ranks.  The PR-side complement of the "
    "ROC AUC entry (agg_auc_roc_midrank); near-prevalence AP says the "
    "score carries no lift.",
    tags=("eval", "ranking", "ext"),
    oracle="""
WITH f AS (
  SELECT c.c_custkey, any_value(round(c.c_acctbal, 2)) AS score,
         max(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS y
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
), r AS (
  SELECT y,
         row_number() OVER (ORDER BY score DESC, c_custkey) AS k,
         sum(y) OVER (ORDER BY score DESC, c_custkey) AS tp
  FROM f
)
SELECT sum(y) AS n_pos, count(*) AS n_total,
       round(sum(y) * 1.0 / count(*), 6) AS prevalence,
       round(sum(CASE WHEN y = 1 THEN tp * 1.0 / k END) / sum(y), 6)
         AS average_precision
FROM r
""",
)
def eval_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    f = (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.any_value(F.round("c_acctbal", 2)).alias("score"),
            F.max(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("y"),
        )
    )
    w = Window.orderBy(F.desc("score"), "c_custkey")
    r = f.select(
        "y",
        F.row_number().over(w).alias("k"),
        F.sum("y").over(w).alias("tp"),
    )
    return r.agg(
        F.sum("y").alias("n_pos"),
        F.count(F.lit(1)).alias("n_total"),
        F.round(F.sum("y") / F.count(F.lit(1)), 6).alias("prevalence"),
        F.round(
            F.sum(F.when(F.col("y") == 1, F.col("tp") / F.col("k"))) / F.sum("y"),
            6,
        ).alias("average_precision"),
    )


# ---------------------------------------------------------------------------
# W5 ext: CAGR and doubling time between anchor years
# ---------------------------------------------------------------------------


@register(
    "window_cagr_doubling",
    doc="Compound annual growth rate of revenue between the 1995 and 2000 "
    "anchor years (both fully observed in the fixture), with the implied "
    "doubling time ln2/ln(1+CAGR) — one conditional aggregate pass, "
    "closed form after; the long-horizon companion of "
    "window_mom_growth / window_yoy_same_month.",
    tags=("window", "finance", "ext"),
    oracle="""
WITH s AS (
  SELECT round(sum(CASE WHEN year(o_orderdate) = 1995
                        THEN o_totalprice END), 2) AS rev_start,
         round(sum(CASE WHEN year(o_orderdate) = 2000
                        THEN o_totalprice END), 2) AS rev_end
  FROM orders
)
SELECT rev_start, rev_end,
       round(pow(rev_end / rev_start, 1.0 / 5) - 1, 6) AS cagr,
       round(ln(2) / ln(pow(rev_end / rev_start, 1.0 / 5)), 2)
         AS doubling_years
FROM s
""",
)
def window_cagr_doubling(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    s = orders.agg(
        F.round(
            F.sum(F.when(yr == 1995, F.col("o_totalprice"))), 2
        ).alias("rev_start"),
        F.round(
            F.sum(F.when(yr == 2000, F.col("o_totalprice"))), 2
        ).alias("rev_end"),
    )
    growth = F.pow(F.col("rev_end") / F.col("rev_start"), F.lit(1.0 / 5))
    return s.select(
        "rev_start",
        "rev_end",
        F.round(growth - 1, 6).alias("cagr"),
        F.round(F.log(F.lit(2.0)) / F.log(growth), 2).alias("doubling_years"),
    )


# ---------------------------------------------------------------------------
# multimodal ext: audio zero-crossing rate (second framed-blob feature)
# ---------------------------------------------------------------------------


@register(
    "mm_audio_zero_crossing",
    doc="Zero-crossing-rate over framed blobs "
    "(operators/multimodal.py::audio_zero_crossing): 16-byte windows, "
    "sign changes around byte value 80, numpy-vectorized inside one "
    "mapInPandas crossing — the same Arrow batch shape as "
    "mm_audio_window_energy with a different kernel, proving the "
    "feature-extraction surface is pluggable.  ASCII fixtures let the "
    "oracle recompute the exact byte math with substr+ascii.",
    tags=("multimodal", "audio", "pandas-udf", "ext"),
    oracle="""
WITH f AS (
  SELECT doc_id, text, len(text) // 16 AS w FROM documents
), wins AS (
  SELECT doc_id,
         list_aggregate(
           list_transform(range(2, 17),
             j -> abs((CASE WHEN ascii(substr(text, i * 16 + j, 1)) >= 80
                            THEN 1 ELSE 0 END)
                    - (CASE WHEN ascii(substr(text, i * 16 + j - 1, 1)) >= 80
                            THEN 1 ELSE 0 END))),
           'sum') AS c
  FROM f, LATERAL unnest(range(0, w)) u(i)
)
SELECT f.doc_id,
       CAST(f.w AS INT) AS n_windows,
       coalesce(sum(wins.c), 0) AS total_crossings,
       CAST(coalesce(max(wins.c), 0) AS INT) AS max_crossings
FROM f LEFT JOIN wins ON wins.doc_id = f.doc_id
GROUP BY f.doc_id, f.w
ORDER BY f.doc_id
""",
)
def mm_audio_zero_crossing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import multimodal as mm

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return mm.audio_zero_crossing(mm.attach_binary_payload(docs)).orderBy("doc_id")


# ---------------------------------------------------------------------------
# text ext: out-of-vocabulary rate against the corpus top-1000 vocab
# ---------------------------------------------------------------------------


@register(
    "text_oov_rate_profile",
    doc="Tokenizer-ops OOV audit: the top-1000 token vocabulary (by "
    "corpus frequency, deterministic tiebreak) built in one explode + "
    "aggregate, then every document's out-of-vocabulary token share "
    "via a broadcast semi-join of its tokens against the vocab — "
    "reported as a per-source OOV profile.  At 100 TB the vocab is a "
    "broadcast dictionary and the audit stays one fact-side pass.",
    tags=("text", "corpus", "ext"),
    oracle="""
WITH tok AS (
  SELECT doc_id, source,
         unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                            'g'), ' ')) AS t
  FROM documents
), vocab AS (
  SELECT t FROM (
    SELECT t, count(*) AS n FROM tok GROUP BY t
    ORDER BY n DESC, t LIMIT 1000
  )
), flags AS (
  SELECT source, CASE WHEN v.t IS NULL THEN 1 ELSE 0 END AS oov
  FROM tok LEFT JOIN vocab v USING (t)
)
SELECT source,
       count(*) AS n_tokens,
       sum(oov) AS n_oov,
       round(sum(oov) * 1.0 / count(*), 6) AS oov_rate
FROM flags GROUP BY source ORDER BY source
""",
)
def text_oov_rate_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import textstats as ts

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(ts.tokens(F.col("text"))).alias("t")
    )
    vocab = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "t")
        .limit(1000)
        .select("t", F.lit(1).alias("in_vocab"))
    )
    flags = tok.join(F.broadcast(vocab), "t", "left").select(
        "source",
        F.when(F.col("in_vocab").isNull(), 1).otherwise(0).alias("oov"),
    )
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("oov").alias("n_oov"),
            F.round(F.sum("oov") / F.count(F.lit(1)), 6).alias("oov_rate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# text ext: log-odds-ratio with Dirichlet prior ("fightin' words")
# ---------------------------------------------------------------------------


@register(
    "text_log_odds_fightin_words",
    doc="Monroe-style comparative term analysis between two document "
    "sources: per-token counts in each corpus from one explode + pivot "
    "aggregate, smoothed log-odds delta = ln((a+α)/(A−a+Tα)) − "
    "ln((b+α)/(B−b+Tα)) with the corpus-wide Dirichlet prior α=0.5, "
    "z-scored by the estimated variance 1/(a+α)+1/(b+α).  Top-8 terms "
    "per direction — the statistically-grounded upgrade of raw TF-IDF "
    "contrast (text_tfidf_top_terms).",
    tags=("text", "corpus", "ext"),
    oracle="""
WITH tok AS (
  SELECT source,
         unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                            'g'), ' ')) AS t
  FROM documents WHERE source IN ('web', 'wiki')
), c AS (
  SELECT t,
         sum(CASE WHEN source = 'web' THEN 1 ELSE 0 END) AS a,
         sum(CASE WHEN source = 'wiki' THEN 1 ELSE 0 END) AS b
  FROM tok GROUP BY t
), tot AS (
  SELECT sum(a) AS ta, sum(b) AS tb, count(*) AS n_types FROM c
), z AS (
  SELECT t, a, b,
         (ln((a + 0.5) / (ta - a + 0.5 * n_types))
          - ln((b + 0.5) / (tb - b + 0.5 * n_types)))
         / sqrt(1.0 / (a + 0.5) + 1.0 / (b + 0.5)) AS zscore
  FROM c, tot
)
SELECT t, a AS n_web, b AS n_wiki, round(zscore, 4) AS zscore
FROM (
  SELECT *, row_number() OVER (ORDER BY zscore DESC, t) AS rtop,
            row_number() OVER (ORDER BY zscore ASC, t) AS rbot
  FROM z
)
WHERE rtop <= 8 OR rbot <= 8
ORDER BY zscore DESC, t
""",
)
def text_log_odds_fightin_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..operators import textstats as ts

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isin("web", "wiki")
    )
    tok = docs.select("source", F.explode(ts.tokens(F.col("text"))).alias("t"))
    c = tok.groupBy("t").agg(
        F.sum(F.when(F.col("source") == "web", 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("source") == "wiki", 1).otherwise(0)).alias("b"),
    )
    tot = c.agg(
        F.sum("a").alias("ta"),
        F.sum("b").alias("tb"),
        F.count(F.lit(1)).alias("n_types"),
    )
    a, b = F.col("a"), F.col("b")
    zscore = (
        F.log((a + 0.5) / (F.col("ta") - a + 0.5 * F.col("n_types")))
        - F.log((b + 0.5) / (F.col("tb") - b + 0.5 * F.col("n_types")))
    ) / F.sqrt(1.0 / (a + 0.5) + 1.0 / (b + 0.5))
    z = c.crossJoin(F.broadcast(tot)).select(
        "t", "a", "b", zscore.alias("zscore")
    )
    ranked = z.select(
        "t",
        "a",
        "b",
        "zscore",
        F.row_number().over(Window.orderBy(F.desc("zscore"), "t")).alias("rtop"),
        F.row_number().over(Window.orderBy(F.asc("zscore"), "t")).alias("rbot"),
    )
    return (
        ranked.filter((F.col("rtop") <= 8) | (F.col("rbot") <= 8))
        .select(
            "t",
            F.col("a").alias("n_web"),
            F.col("b").alias("n_wiki"),
            F.round("zscore", 4).alias("zscore"),
        )
        .orderBy(F.desc("zscore"), "t")
    )


# ---------------------------------------------------------------------------
# sim ext: signed-random-projection LSH (cosine sketch) calibration
# ---------------------------------------------------------------------------


@register(
    "sim_srp_lsh_hamming",
    doc="Signed-random-projection LSH over the embedding table — the "
    "cosine-metric sibling of MinHash (which sketches Jaccard): 16 "
    "hyperplanes with ±1 weights derived from md5 parity (identical on "
    "both engines, no RNG), signature = sign bits of the projections, "
    "all computed in one HOF projection.  Calibration output: bucket "
    "census plus the correlation between pairwise Hamming distance and "
    "true cosine distance on a bounded pair sample — the r that says "
    "the sketch preserves the metric.",
    tags=("similarity", "lsh", "ext"),
    oracle="""
WITH sig AS (
  SELECT vec_id,
         list_transform(range(0, 16), b ->
           CASE WHEN list_sum(list_transform(range(1, 65), d ->
             (CASE WHEN ascii(substring(md5(b::VARCHAR || ':' || d::VARCHAR),
                                        1, 1)) % 2 = 0
                   THEN 1.0 ELSE -1.0 END) * embedding[d])) >= 0
                THEN 1 ELSE 0 END) AS bits,
         embedding
  FROM embeddings
), bucketed AS (
  SELECT vec_id, bits,
         list_aggregate(list_transform(range(1, 17),
                                       i -> bits[i] * (1 << (i - 1))),
                        'sum') AS bucket,
         embedding
  FROM sig
), census AS (
  SELECT sum(cnt) AS n_vectors,
         count(*) AS n_buckets,
         max(cnt) AS max_bucket_size
  FROM (SELECT bucket, count(*) AS cnt FROM bucketed GROUP BY bucket)
), pairs AS (
  SELECT list_sum(list_transform(range(1, 17),
                  i -> abs(x.bits[i] - y.bits[i]))) AS hamming,
         1.0 - list_sum(list_transform(range(1, 65),
                        d -> CAST(x.embedding[d] AS DOUBLE)
                           * CAST(y.embedding[d] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(range(1, 65),
                     d -> CAST(x.embedding[d] AS DOUBLE)
                        * CAST(x.embedding[d] AS DOUBLE))))
              * sqrt(list_sum(list_transform(range(1, 65),
                     d -> CAST(y.embedding[d] AS DOUBLE)
                        * CAST(y.embedding[d] AS DOUBLE))))) AS cosdist
  FROM bucketed x JOIN bucketed y
    ON x.vec_id < y.vec_id AND x.vec_id < 30 AND y.vec_id < 30
)
SELECT n_vectors, n_buckets, max_bucket_size,
       (SELECT round(corr(hamming, cosdist), 3) FROM pairs)
         AS corr_hamming_cosine
FROM census
""",
)
def sim_srp_lsh_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    bits_expr = (
        "transform(sequence(0, 15), b -> CASE WHEN "
        "aggregate(sequence(1, 64), cast(0.0 as double), (acc, d) -> acc + "
        "IF(ascii(substring(md5(concat(cast(b as string), ':', "
        "cast(d as string))), 1, 1)) % 2 = 0, 1.0D, -1.0D) "
        "* element_at(embedding, d)) >= 0 THEN 1 ELSE 0 END)"
    )
    sig = emb.select("vec_id", "embedding", F.expr(bits_expr).alias("bits"))
    bucketed = sig.withColumn(
        "bucket",
        F.expr(
            "aggregate(sequence(1, 16), 0L, (acc, i) -> "
            "acc + element_at(bits, i) * shiftleft(1L, i - 1))"
        ),
    )
    census = (
        bucketed.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.sum("cnt").alias("n_vectors"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("cnt").alias("max_bucket_size"),
        )
    )
    small = bucketed.filter(F.col("vec_id") < 30).select(
        "vec_id", "bits", "embedding"
    )
    x, y = small.alias("x"), small.alias("y")
    dot = (
        "aggregate(zip_with(x_emb, y_emb, (a, b) -> cast(a as double) * "
        "cast(b as double)), cast(0.0 as double), (acc, v) -> acc + v)"
    )
    nrm = (
        "sqrt(aggregate(transform({c}, a -> cast(a as double) * "
        "cast(a as double)), cast(0.0 as double), (acc, v) -> acc + v))"
    )
    pairs = (
        x.join(y, F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.bits").alias("x_bits"),
            F.col("y.bits").alias("y_bits"),
            F.col("x.embedding").alias("x_emb"),
            F.col("y.embedding").alias("y_emb"),
        )
        .select(
            F.expr(
                "aggregate(zip_with(x_bits, y_bits, (a, b) -> abs(a - b)), 0, "
                "(acc, v) -> acc + v)"
            ).alias("hamming"),
            (
                1.0
                - F.expr(dot)
                / (
                    F.expr(nrm.format(c="x_emb"))
                    * F.expr(nrm.format(c="y_emb"))
                )
            ).alias("cosdist"),
        )
    )
    r = pairs.agg(F.round(F.corr("hamming", "cosdist"), 3).alias("corr_hamming_cosine"))
    return census.crossJoin(F.broadcast(r))


# ---------------------------------------------------------------------------
# W5 ext: revenue waterfall / bridge decomposition between two years
# ---------------------------------------------------------------------------


@register(
    "window_waterfall_segment_bridge",
    doc="Waterfall (bridge) decomposition of the 1995→2000 revenue delta "
    "by market segment: per-segment revenue in both anchor years from "
    "ONE conditional aggregate over the fact join, each segment's "
    "delta, its share of the total move, and the running bridge "
    "position — the BI shape finance reviews use to explain a "
    "top-line change.  DECIMAL-cents exact.",
    tags=("window", "bi", "ext"),
    oracle="""
WITH seg AS (
  SELECT c.c_mktsegment AS segment,
         round(sum(CASE WHEN year(o.o_orderdate) = 1995
                        THEN o.o_totalprice ELSE 0 END), 2) AS rev_start,
         round(sum(CASE WHEN year(o.o_orderdate) = 2000
                        THEN o.o_totalprice ELSE 0 END), 2) AS rev_end
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1
)
SELECT segment, rev_start, rev_end,
       round(rev_end - rev_start, 2) AS delta,
       round((rev_end - rev_start)
             / sum(rev_end - rev_start) OVER (), 6) AS share_of_move,
       round(sum(rev_end - rev_start)
             OVER (ORDER BY segment ROWS UNBOUNDED PRECEDING), 2)
         AS bridge_running
FROM seg ORDER BY segment
""",
)
def window_waterfall_segment_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    yr = F.year("o_orderdate")
    seg = (
        orders.join(cust, cust.c_custkey == orders.o_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.round(
                F.sum(F.when(yr == 1995, F.col("o_totalprice")).otherwise(0.0)), 2
            ).alias("rev_start"),
            F.round(
                F.sum(F.when(yr == 2000, F.col("o_totalprice")).otherwise(0.0)), 2
            ).alias("rev_end"),
        )
    )
    delta = F.col("rev_end") - F.col("rev_start")
    w_all = Window.partitionBy()
    w_run = Window.orderBy("segment").rowsBetween(Window.unboundedPreceding, 0)
    return seg.select(
        "segment",
        "rev_start",
        "rev_end",
        F.round(delta, 2).alias("delta"),
        F.round(delta / F.sum(delta).over(w_all), 6).alias("share_of_move"),
        F.round(F.sum(delta).over(w_run), 2).alias("bridge_running"),
    ).orderBy("segment")


# ---------------------------------------------------------------------------
# P8 ext: business-day lag in closed form (no calendar table)
# ---------------------------------------------------------------------------


@register(
    "scalar_business_days_lag",
    doc="Average order→ship lag in BUSINESS days per priority, computed "
    "in closed form — full weeks contribute 5 days, the ragged tail is "
    "an unrolled 6-term weekday-mod sum — so no calendar dimension "
    "table and no per-day explode (which would be a 100× row "
    "amplification at scale).  ISO weekday arithmetic keeps both "
    "engines bit-identical.",
    tags=("scalar", "datetime", "ext"),
    oracle="""
WITH lag AS (
  SELECT o.o_orderpriority AS priority,
         date_diff('day', o.o_orderdate, l.l_shipdate) AS n,
         isodow(o.o_orderdate) - 1 AS a
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE l.l_shipdate >= o.o_orderdate
), bd AS (
  SELECT priority,
         (n // 7) * 5
         + (CASE WHEN n % 7 >= 1 AND (a + 1) % 7 < 5 THEN 1 ELSE 0 END)
         + (CASE WHEN n % 7 >= 2 AND (a + 2) % 7 < 5 THEN 1 ELSE 0 END)
         + (CASE WHEN n % 7 >= 3 AND (a + 3) % 7 < 5 THEN 1 ELSE 0 END)
         + (CASE WHEN n % 7 >= 4 AND (a + 4) % 7 < 5 THEN 1 ELSE 0 END)
         + (CASE WHEN n % 7 >= 5 AND (a + 5) % 7 < 5 THEN 1 ELSE 0 END)
         + (CASE WHEN n % 7 >= 6 AND (a + 6) % 7 < 5 THEN 1 ELSE 0 END)
           AS busdays
  FROM lag
)
SELECT priority, count(*) AS n_lines,
       round(avg(busdays), 4) AS avg_business_days,
       max(busdays) AS max_business_days
FROM bd GROUP BY priority ORDER BY priority
""",
)
def scalar_business_days_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    j = orders.join(li, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate") >= F.col("o_orderdate")
    )
    n = F.datediff("l_shipdate", "o_orderdate")
    a = F.expr("weekday(o_orderdate)")  # Mon=0 … Sun=6 == isodow-1
    busdays = (n / 7).cast("bigint") * 5
    for k in range(1, 7):
        busdays = busdays + F.when(
            (n % 7 >= k) & ((a + k) % 7 < 5), 1
        ).otherwise(0)
    return (
        j.select(F.col("o_orderpriority").alias("priority"), busdays.alias("busdays"))
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.avg("busdays"), 4).alias("avg_business_days"),
            F.max("busdays").alias("max_business_days"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# W5 ext: classical ratio-to-moving-average seasonal indices
# ---------------------------------------------------------------------------


@register(
    "window_seasonal_ratio_to_ma",
    doc="Classical multiplicative seasonal indices by ratio-to-moving-"
    "average: centered 12-month MA over the folded monthly series "
    "(2×12 convention via two stacked windows), ratios averaged per "
    "calendar month, normalized so the 12 indices sum to 12 — the "
    "X-11-style ancestor of window_seasonal_decompose's additive "
    "model.  Everything after the fact-table fold runs on ≤80 rows.",
    tags=("window", "timeseries", "ext"),
    oracle="""
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS mon,
         month(date_trunc('month', o_orderdate)) AS cal_month,
         round(sum(o_totalprice), 2) AS y
  FROM orders GROUP BY 1, 2
), ma AS (
  SELECT mon, cal_month, y,
         avg(y) OVER (ORDER BY mon ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING)
           AS ma12a,
         avg(y) OVER (ORDER BY mon ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING)
           AS ma12b,
         row_number() OVER (ORDER BY mon) AS rn,
         count(*) OVER () AS n
  FROM m
), ratio AS (
  SELECT cal_month, y / ((ma12a + ma12b) / 2) AS r
  FROM ma WHERE rn > 6 AND rn <= n - 6
), idx AS (
  SELECT cal_month, avg(r) AS raw_idx, count(*) AS n_obs FROM ratio GROUP BY 1
)
SELECT cal_month, n_obs,
       round(raw_idx * 12 / sum(raw_idx) OVER (), 6) AS seasonal_index
FROM idx ORDER BY cal_month
""",
)
def window_seasonal_ratio_to_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    mon = F.date_trunc("month", "o_orderdate")
    m = orders.groupBy(mon.alias("mon")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("y")
    ).withColumn("cal_month", F.month("mon"))
    w = Window.orderBy("mon")
    ma = m.select(
        "cal_month",
        "y",
        F.avg("y").over(w.rowsBetween(-6, 5)).alias("ma12a"),
        F.avg("y").over(w.rowsBetween(-5, 6)).alias("ma12b"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    ratio = ma.filter((F.col("rn") > 6) & (F.col("rn") <= F.col("n") - 6)).select(
        "cal_month",
        (F.col("y") / ((F.col("ma12a") + F.col("ma12b")) / 2)).alias("r"),
    )
    idx = ratio.groupBy("cal_month").agg(
        F.avg("r").alias("raw_idx"), F.count(F.lit(1)).alias("n_obs")
    )
    w_all = Window.partitionBy()
    return idx.select(
        "cal_month",
        "n_obs",
        F.round(
            F.col("raw_idx") * 12 / F.sum("raw_idx").over(w_all), 6
        ).alias("seasonal_index"),
    ).orderBy("cal_month")


# ---------------------------------------------------------------------------
# text ext: lexical diversity (TTR family) per source
# ---------------------------------------------------------------------------


@register(
    "text_lexical_diversity",
    doc="Lexical-diversity profile per document source: type count, token "
    "count, type-token ratio, root TTR (Guiraud) and Herdan's C "
    "(log-log TTR) — the summary statistics whose growth curve "
    "corpus_vocab_growth traces; one explode + two tiny aggregates.",
    tags=("text", "corpus", "ext"),
    oracle="""
WITH tok AS (
  SELECT source,
         unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                            'g'), ' ')) AS t
  FROM documents
), s AS (
  SELECT source, count(*) AS n_tokens, count(DISTINCT t) AS n_types
  FROM tok GROUP BY source
)
SELECT source, n_tokens, n_types,
       round(n_types * 1.0 / n_tokens, 6) AS ttr,
       round(n_types / sqrt(n_tokens), 4) AS root_ttr,
       round(ln(n_types) / ln(n_tokens), 6) AS herdan_c
FROM s ORDER BY source
""",
)
def text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import textstats as ts

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(ts.tokens(F.col("text"))).alias("t"))
    s = tok.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("t").alias("n_types"),
    )
    return s.select(
        "source",
        "n_tokens",
        "n_types",
        F.round(F.col("n_types") / F.col("n_tokens"), 6).alias("ttr"),
        F.round(F.col("n_types") / F.sqrt(F.col("n_tokens")), 4).alias("root_ttr"),
        F.round(F.log("n_types") / F.log("n_tokens"), 6).alias("herdan_c"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# feat ext: best Gini-impurity split on a numeric feature
# ---------------------------------------------------------------------------


@register(
    "feat_best_split_gini",
    doc="Decision-tree split finding without a tree library: candidate "
    "thresholds are the account-balance decile boundaries, per-decile "
    "(pos,neg) cells fold in one aggregate, and every candidate's "
    "weighted Gini impurity comes from running sums over the 10 cells — "
    "evaluating k thresholds costs one fact pass + O(k) window work, "
    "never k passes.  Returns the best split and its impurity gain.",
    tags=("feat", "ml", "ext"),
    oracle="""
WITH flags AS (
  SELECT c.c_custkey, any_value(round(c.c_acctbal, 2)) AS bal,
         max(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS y
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
), d AS (
  SELECT y, ntile(10) OVER (ORDER BY bal, c_custkey) AS decile,
         bal
  FROM flags
), cell AS (
  SELECT decile, sum(y) AS pos, sum(1 - y) AS neg, max(bal) AS upper_bal
  FROM d GROUP BY decile
), run AS (
  SELECT decile, upper_bal,
         sum(pos) OVER (ORDER BY decile) AS lp,
         sum(neg) OVER (ORDER BY decile) AS ln_,
         sum(pos) OVER () AS tp, sum(neg) OVER () AS tn
  FROM cell
), cand AS (
  SELECT decile, upper_bal,
         (lp + ln_) * 1.0 / (tp + tn) AS wl,
         1 - pow(lp * 1.0 / (lp + ln_), 2) - pow(ln_ * 1.0 / (lp + ln_), 2)
           AS gini_l,
         1 - pow((tp - lp) * 1.0 / (tp + tn - lp - ln_), 2)
           - pow((tn - ln_) * 1.0 / (tp + tn - lp - ln_), 2) AS gini_r,
         1 - pow(tp * 1.0 / (tp + tn), 2) - pow(tn * 1.0 / (tp + tn), 2)
           AS gini_root
  FROM run WHERE decile < 10
)
SELECT decile AS split_decile, upper_bal AS split_threshold,
       round(gini_root, 6) AS gini_root,
       round(wl * gini_l + (1 - wl) * gini_r, 6) AS gini_split,
       round(gini_root - (wl * gini_l + (1 - wl) * gini_r), 6) AS gain
FROM cand
ORDER BY gini_root - (wl * gini_l + (1 - wl) * gini_r) DESC, decile
LIMIT 1
""",
)
def feat_best_split_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    flags = (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.any_value(F.round("c_acctbal", 2)).alias("bal"),
            F.max(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("y"),
        )
    )
    d = flags.select(
        "y",
        "bal",
        F.ntile(10).over(Window.orderBy("bal", "c_custkey")).alias("decile"),
    )
    cell = d.groupBy("decile").agg(
        F.sum("y").alias("pos"),
        F.sum(1 - F.col("y")).alias("neg"),
        F.max("bal").alias("upper_bal"),
    )
    w_run = Window.orderBy("decile")
    w_all = Window.partitionBy()
    run = cell.select(
        "decile",
        "upper_bal",
        F.sum("pos").over(w_run).alias("lp"),
        F.sum("neg").over(w_run).alias("ln_"),
        F.sum("pos").over(w_all).alias("tp"),
        F.sum("neg").over(w_all).alias("tn"),
    )
    lp, ln_, tp, tn = F.col("lp"), F.col("ln_"), F.col("tp"), F.col("tn")
    wl = (lp + ln_) / (tp + tn)
    gini_l = 1 - F.pow(lp / (lp + ln_), F.lit(2)) - F.pow(ln_ / (lp + ln_), F.lit(2))
    rp, rn = tp - lp, tn - ln_
    gini_r = 1 - F.pow(rp / (rp + rn), F.lit(2)) - F.pow(rn / (rp + rn), F.lit(2))
    gini_root = 1 - F.pow(tp / (tp + tn), F.lit(2)) - F.pow(tn / (tp + tn), F.lit(2))
    gini_split = wl * gini_l + (1 - wl) * gini_r
    return (
        run.filter(F.col("decile") < 10)
        .select(
            F.col("decile").alias("split_decile"),
            F.col("upper_bal").alias("split_threshold"),
            F.round(gini_root, 6).alias("gini_root"),
            F.round(gini_split, 6).alias("gini_split"),
            F.round(gini_root - gini_split, 6).alias("gain"),
        )
        .orderBy(F.desc("gain"), "split_decile")
        .limit(1)
    )


# ---------------------------------------------------------------------------
# events ext: Little's law consistency check (L = λ·W)
# ---------------------------------------------------------------------------


@register(
    "events_littles_law_check",
    doc="Queueing sanity check on sessionized traffic: sessions from the "
    "30-minute-gap rule (the same lag+running-sum construction as "
    "sessionize_events_gap), then L = total session-seconds over the "
    "observation span, λ = sessions per second, W = mean session "
    "duration — Little's law says L = λ·W identically when measured "
    "over the same window, so the ratio is an invariant ≈1 that "
    "validates the sessionizer at any scale.  Zero-duration singleton "
    "sessions drop out of both sides.",
    tags=("events", "queueing", "ext"),
    oracle="""
WITH e AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts,
                                      event_id)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM events
), s AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM e
), sess AS (
  SELECT user_id, sid,
         date_diff('second', min(ts), max(ts)) AS dur_s
  FROM s GROUP BY user_id, sid
), agg AS (
  SELECT count(*) AS n_sessions,
         sum(dur_s) AS total_session_seconds,
         avg(dur_s) AS w_mean_duration
  FROM sess WHERE dur_s > 0
), span AS (
  SELECT date_diff('second', min(ts), max(ts)) AS span_s FROM events
)
SELECT n_sessions,
       round(total_session_seconds * 1.0 / span_s, 6) AS l_avg_in_system,
       round(n_sessions * 1.0 / span_s, 8) AS lambda_per_s,
       round(w_mean_duration, 4) AS w_mean_s,
       round((total_session_seconds * 1.0 / span_s)
             / (n_sessions * 1.0 / span_s * w_mean_duration), 6)
         AS littles_ratio
FROM agg, span
""",
)
def events_littles_law_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(wu)
    new_s = F.when(
        prev.isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp(prev) > 1800),
        1,
    ).otherwise(0)
    s = ev.select("user_id", "ts", new_s.alias("new_s")).select(
        "user_id",
        "ts",
        F.sum("new_s")
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("sid"),
    )
    sess = s.groupBy("user_id", "sid").agg(
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
            "dur_s"
        )
    )
    agg = sess.filter(F.col("dur_s") > 0).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("dur_s").alias("total_session_seconds"),
        F.avg("dur_s").alias("w_mean_duration"),
    )
    span = ev.agg(
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
            "span_s"
        )
    )
    j = agg.crossJoin(F.broadcast(span))
    l_avg = F.col("total_session_seconds") / F.col("span_s")
    lam = F.col("n_sessions") / F.col("span_s")
    return j.select(
        "n_sessions",
        F.round(l_avg, 6).alias("l_avg_in_system"),
        F.round(lam, 8).alias("lambda_per_s"),
        F.round(F.col("w_mean_duration"), 4).alias("w_mean_s"),
        F.round(l_avg / (lam * F.col("w_mean_duration")), 6).alias("littles_ratio"),
    )


# ---------------------------------------------------------------------------
# A6 ext: James-Stein shrinkage of per-nation means
# ---------------------------------------------------------------------------


@register(
    "agg_james_stein_shrinkage",
    doc="Empirical-Bayes (James-Stein) shrinkage of the 25 per-nation "
    "mean balances toward the grand mean: group cells in one "
    "aggregate, the shrink factor 1 − (k−3)·σ̄²/Σ(x̄ᵢ−x̄)² from the "
    "cells alone (σ̄² = mean within-group variance of the mean), "
    "shrunk = x̄ + c·(x̄ᵢ − x̄).  The estimator that dominates raw "
    "group means for k ≥ 4 — what a metrics platform should report "
    "for many-small-segment breakdowns.  Top-5 biggest moves shown.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH g AS (
  SELECT c_nationkey, count(*) AS n, avg(c_acctbal) AS m,
         var_samp(c_acctbal) AS v
  FROM customer GROUP BY c_nationkey
), t AS (
  SELECT count(*) AS k,
         sum(n * m) / sum(n) AS grand,
         avg(v / n) AS mean_se2,
         sum((m - (SELECT sum(n * m) / sum(n) FROM g)) ^ 2) AS ss
  FROM g
), c AS (
  SELECT greatest(0, 1 - (k - 3) * mean_se2 / ss) AS shrink, grand FROM t
)
SELECT g.c_nationkey,
       round(g.m, 4) AS raw_mean,
       round(c.grand + c.shrink * (g.m - c.grand), 4) AS js_mean,
       round(abs(g.m - (c.grand + c.shrink * (g.m - c.grand))), 4) AS moved,
       round(c.shrink, 6) AS shrink_factor
FROM g, c
ORDER BY moved DESC, g.c_nationkey LIMIT 5
""",
)
def agg_james_stein_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    g = cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("c_acctbal").alias("m"),
        F.var_samp("c_acctbal").alias("v"),
    )
    grand = g.agg(
        (F.sum(F.col("n") * F.col("m")) / F.sum("n")).alias("grand"),
        F.count(F.lit(1)).alias("k"),
        F.avg(F.col("v") / F.col("n")).alias("mean_se2"),
    )
    ss = (
        g.crossJoin(F.broadcast(grand.select("grand")))
        .agg(F.sum(F.pow(F.col("m") - F.col("grand"), F.lit(2))).alias("ss"))
    )
    c = grand.crossJoin(F.broadcast(ss)).select(
        "grand",
        F.greatest(
            F.lit(0.0),
            1 - (F.col("k") - 3) * F.col("mean_se2") / F.col("ss"),
        ).alias("shrink"),
    )
    js = F.col("grand") + F.col("shrink") * (F.col("m") - F.col("grand"))
    return (
        g.crossJoin(F.broadcast(c))
        .select(
            "c_nationkey",
            F.round(F.col("m"), 4).alias("raw_mean"),
            F.round(js, 4).alias("js_mean"),
            F.round(F.abs(F.col("m") - js), 4).alias("moved"),
            F.round(F.col("shrink"), 6).alias("shrink_factor"),
        )
        .orderBy(F.desc("moved"), "c_nationkey")
        .limit(5)
    )


# ---------------------------------------------------------------------------
# A6 ext: beta-binomial empirical-Bayes shrinkage of return rates
# ---------------------------------------------------------------------------


@register(
    "agg_eb_beta_binomial_returns",
    doc="Empirical-Bayes shrinkage of per-brand return rates under a "
    "beta-binomial model: raw rates x/n per brand, a method-of-moments "
    "Beta(α,β) prior fitted from the rate distribution across brands, "
    "shrunk rate = (x+α)/(n+α+β) — small brands move toward the prior, "
    "big brands barely.  The ranking-by-rate fix every marketplace "
    "leaderboard needs.  Top-5 biggest rank-relevant moves shown.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH b AS (
  SELECT p_brand,
         count(*) AS n,
         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS x
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY p_brand
), mom AS (
  SELECT avg(x * 1.0 / n) AS mu, var_samp(x * 1.0 / n) AS s2 FROM b
), prior AS (
  SELECT mu * (mu * (1 - mu) / s2 - 1) AS alpha,
         (1 - mu) * (mu * (1 - mu) / s2 - 1) AS beta
  FROM mom
)
SELECT p_brand, n, x,
       round(x * 1.0 / n, 6) AS raw_rate,
       round((x + alpha) / (n + alpha + beta), 6) AS eb_rate,
       round(alpha, 4) AS prior_alpha,
       round(beta, 4) AS prior_beta
FROM b, prior
ORDER BY abs(x * 1.0 / n - (x + alpha) / (n + alpha + beta)) DESC, p_brand
LIMIT 5
""",
)
def agg_eb_beta_binomial_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = (
        li.join(part, part.p_partkey == li.l_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("x"),
        )
    )
    rate = F.col("x") / F.col("n")
    mom = b.agg(F.avg(rate).alias("mu"), F.var_samp(rate).alias("s2"))
    nu = F.col("mu") * (1 - F.col("mu")) / F.col("s2") - 1
    prior = mom.select(
        (F.col("mu") * nu).alias("alpha"),
        ((1 - F.col("mu")) * nu).alias("beta"),
    )
    eb = (F.col("x") + F.col("alpha")) / (
        F.col("n") + F.col("alpha") + F.col("beta")
    )
    return (
        b.crossJoin(F.broadcast(prior))
        .select(
            "p_brand",
            "n",
            "x",
            F.round(rate, 6).alias("raw_rate"),
            F.round(eb, 6).alias("eb_rate"),
            F.round(F.col("alpha"), 4).alias("prior_alpha"),
            F.round(F.col("beta"), 4).alias("prior_beta"),
            F.abs(rate - eb).alias("_moved"),
        )
        .orderBy(F.desc("_moved"), "p_brand")
        .limit(5)
        .drop("_moved")
    )


# ---------------------------------------------------------------------------
# A6 ext: split-conformal prediction interval + holdout coverage
# ---------------------------------------------------------------------------


@register(
    "agg_conformal_interval_coverage",
    doc="Split-conformal prediction intervals for order value by "
    "priority: the 1996 calibration year yields per-group median "
    "predictions and the 90th percentile of absolute residuals (the "
    "conformal quantile), then 1997 holdout coverage — the share "
    "inside prediction ± q — is measured in the same pass shape.  "
    "Distribution-free ML uncertainty as two decomposable aggregates "
    "+ one broadcast join.",
    tags=("agg", "ml", "ext"),
    oracle="""
WITH c96 AS (
  SELECT o_orderpriority AS pri, round(o_totalprice, 2) AS val
  FROM orders WHERE year(o_orderdate) = 1996
), cal AS (
  -- rank-based (type-1) median: the value at position ceil(0.5 n) — an
  -- actual data point, so both engines agree exactly (interpolated
  -- quantile_cont can differ in the last ulp across engines)
  SELECT pri, val AS pred FROM (
    SELECT pri, val,
           row_number() OVER (PARTITION BY pri ORDER BY val) AS rn,
           count(*) OVER (PARTITION BY pri) AS cnt
    FROM c96
  ) WHERE rn = CAST(ceil(0.5 * cnt) AS BIGINT)
), qhat AS (
  SELECT pri, resid AS q FROM (
    SELECT o.pri, abs(o.val - c.pred) AS resid,
           row_number() OVER (PARTITION BY o.pri
                              ORDER BY abs(o.val - c.pred)) AS rn,
           count(*) OVER (PARTITION BY o.pri) AS cnt
    FROM c96 o JOIN cal c ON c.pri = o.pri
  ) WHERE rn = CAST(ceil(0.9 * cnt) AS BIGINT)
)
SELECT o.o_orderpriority AS pri,
       count(*) AS n_holdout,
       any_value(c.pred) AS prediction,
       any_value(q.q) AS conformal_q,
       round(avg(CASE WHEN abs(round(o.o_totalprice, 2) - c.pred) <= q.q
                      THEN 1.0 ELSE 0.0 END), 6) AS coverage_1997
FROM orders o
JOIN cal c ON c.pri = o.o_orderpriority
JOIN qhat q ON q.pri = o.o_orderpriority
WHERE year(o.o_orderdate) = 1997
GROUP BY 1 ORDER BY 1
""",
)
def agg_conformal_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    val = F.round("o_totalprice", 2)
    yr = F.year("o_orderdate")
    c96 = orders.filter(yr == 1996).select(
        F.col("o_orderpriority").alias("pri"), val.alias("val")
    )

    def _rank_quantile(df: DataFrame, col: str, p: float, out: str) -> DataFrame:
        w = Window.partitionBy("pri").orderBy(col)
        wc = Window.partitionBy("pri")
        return (
            df.select(
                "pri",
                F.col(col),
                F.row_number().over(w).alias("rn"),
                F.count(F.lit(1)).over(wc).alias("cnt"),
            )
            .filter(F.col("rn") == F.ceil(F.lit(p) * F.col("cnt")).cast("bigint"))
            .select("pri", F.col(col).alias(out))
        )

    cal = _rank_quantile(c96, "val", 0.5, "pred")
    resid = c96.join(F.broadcast(cal), "pri").select(
        "pri", F.abs(F.col("val") - F.col("pred")).alias("resid")
    )
    qhat = _rank_quantile(resid, "resid", 0.9, "q")
    hold = orders.filter(yr == 1997)
    return (
        hold.join(F.broadcast(cal), cal.pri == hold.o_orderpriority)
        .join(F.broadcast(qhat), "pri")
        .groupBy("pri")
        .agg(
            F.count(F.lit(1)).alias("n_holdout"),
            F.any_value("pred").alias("prediction"),
            F.any_value("q").alias("conformal_q"),
            F.round(
                F.avg(
                    F.when(
                        F.abs(val - F.col("pred")) <= F.col("q"), 1.0
                    ).otherwise(0.0)
                ),
                6,
            ).alias("coverage_1997"),
        )
        .orderBy("pri")
    )


# ---------------------------------------------------------------------------
# A6 ext: sample-ratio-mismatch (SRM) gate on a hash split
# ---------------------------------------------------------------------------


@register(
    "agg_srm_check",
    doc="Sample-ratio-mismatch gate for a deterministic 50/50 experiment "
    "split: users assigned by md5 parity of their id (the same "
    "replay-stable trick as corpus_hash_split), observed arm counts vs "
    "the designed ratio via the one-df chi-square — the first sanity "
    "check any experimentation platform runs before reading a metric.  "
    "One distinct-aggregate pass.",
    tags=("agg", "experiment", "ext"),
    oracle="""
WITH u AS (
  SELECT DISTINCT user_id,
         ascii(substring(md5(user_id::VARCHAR), 1, 1)) % 2 AS arm
  FROM events
), s AS (
  SELECT count(*) AS n,
         sum(arm) AS n_treat,
         count(*) - sum(arm) AS n_control
  FROM u
)
SELECT n, n_treat, n_control,
       round(n_treat * 1.0 / n, 6) AS treat_share,
       round(pow(n_treat - n * 0.5, 2) / (n * 0.5)
             + pow(n_control - n * 0.5, 2) / (n * 0.5), 4) AS chi2_1df,
       (pow(n_treat - n * 0.5, 2) / (n * 0.5)
        + pow(n_control - n * 0.5, 2) / (n * 0.5)) > 3.841 AS srm_flag
FROM s
""",
)
def agg_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    arm = (
        F.ascii(F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 1))
        % 2
    )
    u = ev.select("user_id").distinct().select(arm.alias("arm"))
    s = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("arm").alias("n_treat"),
        (F.count(F.lit(1)) - F.sum("arm")).alias("n_control"),
    )
    n, nt, nc = F.col("n"), F.col("n_treat"), F.col("n_control")
    chi2 = F.pow(nt - n * 0.5, F.lit(2)) / (n * 0.5) + F.pow(
        nc - n * 0.5, F.lit(2)
    ) / (n * 0.5)
    return s.select(
        "n",
        "n_treat",
        "n_control",
        F.round(nt / n, 6).alias("treat_share"),
        F.round(chi2, 4).alias("chi2_1df"),
        (chi2 > 3.841).alias("srm_flag"),
    )


# ---------------------------------------------------------------------------
# events ext: Fano factor across window scales (burstiness scaling)
# ---------------------------------------------------------------------------


@register(
    "events_fano_factor_scaling",
    doc="Burstiness scaling of the event stream: the Fano factor "
    "(var/mean of per-window counts) measured at 1h / 6h / 24h window "
    "sizes in one pass — the bucket key is just three floor-divisions "
    "of the epoch, so the three grains explode from each event row "
    "map-side and aggregate together.  Flat ≈1 across scales means "
    "Poisson; growth with window size means long-range clustering "
    "(events_poisson_dispersion is the single-scale special case).",
    tags=("events", "timeseries", "ext"),
    oracle="""
WITH anchor AS (SELECT min(ts) AS t0 FROM events),
g AS (
  -- windows anchored at min(ts): pure timestamp differences, so the
  -- bucketing is identical regardless of either engine's epoch/timezone
  -- conventions
  SELECT s.scale_s,
         date_diff('second', anchor.t0, ts) // s.scale_s AS w,
         count(*) AS n
  FROM events, anchor
  CROSS JOIN (VALUES (3600), (21600), (86400)) AS s(scale_s)
  GROUP BY 1, 2
)
SELECT scale_s,
       count(*) AS n_windows,
       round(avg(n), 4) AS mean_count,
       round(var_samp(n), 4) AS var_count,
       round(var_samp(n) / avg(n), 6) AS fano_factor
FROM g GROUP BY scale_s ORDER BY scale_s
""",
)
def events_fano_factor_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.min("ts").alias("t0"))
    g = (
        ev.crossJoin(F.broadcast(anchor))
        .select(
            (F.unix_timestamp("ts") - F.unix_timestamp("t0")).alias("ep"),
            F.explode(
                F.array(F.lit(3600), F.lit(21600), F.lit(86400))
            ).alias("scale_s"),
        )
        .groupBy(
            "scale_s", F.floor(F.col("ep") / F.col("scale_s")).alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        g.groupBy("scale_s")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.round(F.avg("n"), 4).alias("mean_count"),
            F.round(F.var_samp("n"), 4).alias("var_count"),
            F.round(F.var_samp("n") / F.avg("n"), 6).alias("fano_factor"),
        )
        .orderBy("scale_s")
    )


# ---------------------------------------------------------------------------
# W6 ext: trailing-7-day EXACT distinct users via mergeable daily bitmaps
# ---------------------------------------------------------------------------


@register(
    "window_sliding_distinct_bitmap",
    doc="Trailing-7-day exact distinct users per day WITHOUT rescanning "
    "raw events per window: one pass folds events into per-(day, "
    "bucket) 4 KB bitmaps (bitmap_construct_agg, the same encoding as "
    "agg_bitmap_distinct_users), then each day ORs the trailing seven "
    "days' bitmaps (a bounded self-join on the tiny day×bucket "
    "relation) and sums bitmap_count.  At 100 TB the raw ids are "
    "touched once; every window after that merges kilobytes — the "
    "pattern a daily-active-users dashboard needs.  Exact, fully "
    "oracle-checked against a windowed count(DISTINCT).",
    tags=("window", "bitmap", "distinct", "ext"),
    oracle="""
WITH days AS (
  SELECT DISTINCT date_trunc('day', ts) AS d FROM events
)
SELECT strftime(days.d, '%Y-%m-%d') AS day,
       count(DISTINCT e.user_id) AS users_7d
FROM days
JOIN events e
  ON date_trunc('day', e.ts) <= days.d
 AND date_trunc('day', e.ts) > days.d - INTERVAL 7 DAY
GROUP BY days.d
ORDER BY day
""",
)
def window_sliding_distinct_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts")
    buckets = ev.groupBy(
        day.alias("d"), F.bitmap_bucket_number("user_id").alias("bucket")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm"))
    # map-side window fan-out: each daily sketch contributes itself to the
    # 7 windows that can see it — no day×day self-join, no second pass
    # over raw events; the 7× amplification happens on the KB-sized
    # sketch relation, not the fact table
    fanned = buckets.select(
        F.explode(
            F.expr("sequence(d, d + INTERVAL 6 DAYS, INTERVAL 1 DAY)")
        ).alias("win_d"),
        "bucket",
        "bm",
    )
    # valid windows = days that actually occur (cheap ts-only second scan)
    days = ev.select(day.alias("win_d")).distinct()
    merged = (
        fanned.join(F.broadcast(days), "win_d")
        .groupBy("win_d", "bucket")
        .agg(F.bitmap_or_agg("bm").alias("bm7"))
    )
    return (
        merged.groupBy("win_d")
        .agg(F.sum(F.bitmap_count("bm7")).alias("users_7d"))
        .select(
            F.date_format("win_d", "yyyy-MM-dd").alias("day"), "users_7d"
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# W5 ext: spectral period scan (DFT power at candidate periods)
# ---------------------------------------------------------------------------


@register(
    "events_spectral_period_scan",
    doc="Periodicity detection without an FFT library: daily event "
    "counts (mean-centered), then the discrete-Fourier power "
    "|Σ y·e^{-2πit/p}|² at every candidate period p ∈ 2..14 days — "
    "cos/sin sums are plain decomposable aggregates, the candidate "
    "grid explodes map-side from each day row, and the argmax period "
    "falls out of a 13-row sort.  Finds the weekly cycle that "
    "events_hourly_seasonality assumes.",
    tags=("events", "timeseries", "ext"),
    oracle="""
WITH d AS (
  SELECT row_number() OVER (ORDER BY date_trunc('day', ts)) - 1 AS t,
         count(*) AS y
  FROM events GROUP BY date_trunc('day', ts)
), c AS (
  SELECT t, y - avg(y) OVER () AS yc FROM d
), grid AS (
  SELECT p.p,
         sum(yc * cos(2 * pi() * t / p.p)) AS re,
         sum(yc * sin(2 * pi() * t / p.p)) AS im
  FROM c CROSS JOIN (SELECT unnest(range(2, 15)) AS p) p
  GROUP BY p.p
)
SELECT CAST(p AS INT) AS period_days,
       round(re * re + im * im, 2) AS power,
       CAST(p AS INT) = (SELECT CAST(p AS INT) FROM grid
                         ORDER BY re * re + im * im DESC, p LIMIT 1)
         AS is_peak
FROM grid ORDER BY period_days
""",
)
def events_spectral_period_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    ).select(
        (F.row_number().over(Window.orderBy("day")) - 1).alias("t"), "y"
    )
    c = d.select(
        "t", (F.col("y") - F.avg("y").over(Window.partitionBy())).alias("yc")
    )
    ang = 2 * F.lit(3.141592653589793) * F.col("t") / F.col("p")
    grid = (
        c.select(
            "t",
            "yc",
            F.explode(F.sequence(F.lit(2), F.lit(14))).alias("p"),
        )
        .groupBy("p")
        .agg(
            F.sum(F.col("yc") * F.cos(ang)).alias("re"),
            F.sum(F.col("yc") * F.sin(ang)).alias("im"),
        )
    )
    power = F.col("re") * F.col("re") + F.col("im") * F.col("im")
    w_all = Window.partitionBy()
    ranked = grid.select(
        F.col("p").cast("int").alias("period_days"),
        F.round(power, 2).alias("power"),
        power.alias("_pw"),
    ).withColumn(
        "is_peak",
        F.struct(F.col("_pw"), -F.col("period_days"))
        == F.max(F.struct(F.col("_pw"), -F.col("period_days"))).over(w_all),
    )
    return ranked.drop("_pw").orderBy("period_days")


# ---------------------------------------------------------------------------
# P8 ext: URL-slug normalization (the web-corpus key cleaner)
# ---------------------------------------------------------------------------


@register(
    "text_slugify",
    doc="Deterministic slug normalization of part names — lowercase, "
    "whitespace/punctuation runs collapsed to single dashes, edges "
    "trimmed — the canonical-key cleaner used before joining scraped "
    "names across sources (text_url_canonicalize's path twin).  Pure "
    "regexp projection; distinct-slug census shows the key-space "
    "compression.",
    tags=("scalar", "text", "ext"),
    oracle="""
WITH s AS (
  SELECT p_partkey,
         trim(regexp_replace(regexp_replace(lower(p_name), '[^a-z0-9]+', '-',
                                            'g'), '^-+|-+$', '', 'g')) AS slug
  FROM part
)
SELECT (SELECT count(*) FROM s) AS n_names,
       (SELECT count(DISTINCT slug) FROM s) AS n_slugs,
       (SELECT slug FROM s ORDER BY p_partkey LIMIT 1) AS sample_slug
""",
)
def text_slugify(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    slug = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("p_name")), "[^a-z0-9]+", "-"),
            "^-+|-+$",
            "",
        )
    )
    s = part.select("p_partkey", slug.alias("slug"))
    census = s.agg(
        F.count(F.lit(1)).alias("n_names"),
        F.countDistinct("slug").alias("n_slugs"),
    )
    first = (
        s.orderBy("p_partkey")
        .limit(1)
        .select(F.col("slug").alias("sample_slug"))
    )
    return census.crossJoin(F.broadcast(first))


# ---------------------------------------------------------------------------
# SQL front-end ext: CTE + window + set-op composite through spark.sql
# ---------------------------------------------------------------------------


@register(
    "sql_api_cte_window_union",
    doc="SQL-front-end breadth: a query combining CTEs, a ranking window, "
    "UNION ALL and a HAVING filter submitted as ONE SQL string through "
    "spark.sql over registered temp views — proof the engine's SQL "
    "surface (not just the DataFrame DSL) handles composite analytics; "
    "Catalyst plans it identically to the DSL form "
    "(sql_api_revenue_by_region covers the star-join case).  Top-3 "
    "months by revenue unioned with bottom-3, labeled.",
    tags=("sql-api", "window", "ext"),
    oracle="""
WITH m AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS mon,
         round(sum(o_totalprice), 2) AS revenue
  FROM orders GROUP BY 1 HAVING count(*) >= 10
), ranked AS (
  SELECT mon, revenue,
         row_number() OVER (ORDER BY revenue DESC, mon) AS r_top,
         row_number() OVER (ORDER BY revenue ASC, mon) AS r_bot
  FROM m
)
SELECT 'peak' AS tier, mon, revenue FROM ranked WHERE r_top <= 3
UNION ALL
SELECT 'trough' AS tier, mon, revenue FROM ranked WHERE r_bot <= 3
ORDER BY tier, revenue DESC, mon
""",
)
def sql_api_cte_window_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("sql_orders_v")
    return spark.sql(
        """
WITH m AS (
  SELECT date_format(date_trunc('month', o_orderdate), 'yyyy-MM') AS mon,
         round(sum(o_totalprice), 2) AS revenue
  FROM sql_orders_v GROUP BY 1 HAVING count(*) >= 10
), ranked AS (
  SELECT mon, revenue,
         row_number() OVER (ORDER BY revenue DESC, mon) AS r_top,
         row_number() OVER (ORDER BY revenue ASC, mon) AS r_bot
  FROM m
)
SELECT 'peak' AS tier, mon, revenue FROM ranked WHERE r_top <= 3
UNION ALL
SELECT 'trough' AS tier, mon, revenue FROM ranked WHERE r_bot <= 3
ORDER BY tier, revenue DESC, mon
"""
    )


# ---------------------------------------------------------------------------
# multimodal ext: ViT-style patch-grid planning from parsed headers
# ---------------------------------------------------------------------------


@register(
    "mm_image_patch_plan",
    doc="Patch-grid planning for ViT-style preprocessing: image "
    "dimensions come from the JVM-side header sniff "
    "(operators/multimodal.py::parse_image_header — no Python decode), "
    "then the 224-stride-224 tile grid per image is pure integer "
    "arithmetic: tiles per axis, total patches, and coverage waste "
    "from the ragged right/bottom edge.  The decode itself would be "
    "the mapInPandas stage (mm_decode_metadata); this entry is the "
    "planner that sizes that stage's workload before paying for it.",
    tags=("multimodal", "image", "ext"),
    oracle="""
WITH hdr AS (
  SELECT doc_id,
         64 + length(text) % 577 AS width,
         64 + length(text) % 311 AS height
  FROM documents
), plan AS (
  SELECT doc_id, width, height,
         greatest(0, width // 224) AS tiles_x,
         greatest(0, height // 224) AS tiles_y
  FROM hdr
)
SELECT count(*) AS n_images,
       sum(tiles_x * tiles_y) AS total_patches,
       sum(CASE WHEN tiles_x * tiles_y = 0 THEN 1 ELSE 0 END)
         AS n_too_small,
       round(avg(CASE WHEN tiles_x * tiles_y > 0
                      THEN tiles_x * tiles_y * 224.0 * 224.0
                           / (width * height) END), 6) AS mean_coverage
FROM plan
""",
)
def mm_image_patch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import multimodal as mm

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    hdr = mm.parse_image_header(
        mm.build_fake_image(docs).select("doc_id", "img")
    )
    tiles_x = F.greatest(F.lit(0), F.floor(F.col("width") / 224)).cast("bigint")
    tiles_y = F.greatest(F.lit(0), F.floor(F.col("height") / 224)).cast("bigint")
    plan = hdr.select(
        "doc_id",
        "width",
        "height",
        tiles_x.alias("tiles_x"),
        tiles_y.alias("tiles_y"),
    )
    n_patches = F.col("tiles_x") * F.col("tiles_y")
    return plan.agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum(n_patches).alias("total_patches"),
        F.sum(F.when(n_patches == 0, 1).otherwise(0)).alias("n_too_small"),
        F.round(
            F.avg(
                F.when(
                    n_patches > 0,
                    n_patches * 224.0 * 224.0 / (F.col("width") * F.col("height")),
                )
            ),
            6,
        ).alias("mean_coverage"),
    )


# ---------------------------------------------------------------------------
# events ext: alert debouncing (suppress within cooldown of last fire)
# ---------------------------------------------------------------------------


@register(
    "events_alarm_debounce",
    doc="Alert debouncing over the error stream: an error fires an alarm "
    "only if no alarm-eligible error happened in the preceding 5 "
    "minutes for that user — the gap>cooldown islands construction "
    "(lag + running island sum) where each island fires exactly once "
    "at its head.  Reports fired vs suppressed per user top-10 by "
    "suppression — the noise-reduction stage every paging pipeline "
    "needs between raw errors and humans.",
    tags=("events", "ops", "ext"),
    oracle="""
WITH err AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts,
                                    event_id) > INTERVAL 5 MINUTE
              THEN 1 ELSE 0 END AS fires
  FROM events WHERE event_type = 'error'
)
SELECT user_id,
       count(*) AS n_errors,
       sum(fires) AS n_alarms,
       count(*) - sum(fires) AS n_suppressed,
       round((count(*) - sum(fires)) * 1.0 / count(*), 6) AS suppression_rate
FROM err GROUP BY user_id
ORDER BY n_suppressed DESC, user_id LIMIT 10
""",
)
def events_alarm_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "error"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    fires = F.when(
        prev.isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp(prev) > 300),
        1,
    ).otherwise(0)
    err = ev.select("user_id", fires.alias("fires"))
    return (
        err.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_errors"),
            F.sum("fires").alias("n_alarms"),
            (F.count(F.lit(1)) - F.sum("fires")).alias("n_suppressed"),
            F.round(
                (F.count(F.lit(1)) - F.sum("fires")) / F.count(F.lit(1)), 6
            ).alias("suppression_rate"),
        )
        .orderBy(F.desc("n_suppressed"), "user_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# W5 ext: stochastic oscillator (%K / %D) on the daily revenue series
# ---------------------------------------------------------------------------


@register(
    "window_stochastic_oscillator",
    doc="Stochastic oscillator on monthly revenue: %K locates the "
    "current value inside the trailing-6-month min/max band, %D "
    "smooths %K with a 3-period mean — rolling-extrema frames plus a "
    "frame-over-derived-column, all on the ~80-row folded series.  "
    "Completes the technical-indicator family next to RSI and the "
    "Bollinger bands.",
    tags=("window", "finance", "ext"),
    oracle="""
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS mon,
         round(sum(o_totalprice), 2) AS y
  FROM orders GROUP BY 1
), k AS (
  SELECT mon, y,
         min(y) OVER (ORDER BY mon ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
           AS lo,
         max(y) OVER (ORDER BY mon ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
           AS hi,
         row_number() OVER (ORDER BY mon) AS rn
  FROM m
), pk AS (
  SELECT mon, rn,
         100.0 * (y - lo) / nullif(hi - lo, 0) AS pct_k
  FROM k
)
SELECT strftime(mon, '%Y-%m') AS mon,
       round(pct_k, 4) AS pct_k,
       round(avg(pct_k) OVER (ORDER BY rn ROWS BETWEEN 2 PRECEDING
                              AND CURRENT ROW), 4) AS pct_d
FROM pk WHERE rn > 5 ORDER BY mon
""",
)
def window_stochastic_oscillator(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("y")
    )
    w = Window.orderBy("mon")
    band = w.rowsBetween(-5, 0)
    k = m.select(
        "mon",
        "y",
        F.min("y").over(band).alias("lo"),
        F.max("y").over(band).alias("hi"),
        F.row_number().over(w).alias("rn"),
    )
    pct_k = 100.0 * (F.col("y") - F.col("lo")) / F.nullif(
        F.col("hi") - F.col("lo"), F.lit(0.0)
    )
    pk = k.select("mon", "rn", pct_k.alias("pct_k"))
    wd = Window.orderBy("rn").rowsBetween(-2, 0)
    return (
        pk.filter(F.col("rn") > 5)
        .select(
            F.date_format("mon", "yyyy-MM").alias("mon"),
            F.round("pct_k", 4).alias("pct_k"),
            F.round(F.avg("pct_k").over(wd), 4).alias("pct_d"),
        )
        .orderBy("mon")
    )


# ---------------------------------------------------------------------------
# J5 ext: skyline (Pareto-dominance) query over supplier metrics
# ---------------------------------------------------------------------------


@register(
    "join_skyline_suppliers",
    doc="Skyline query: suppliers not dominated on (revenue supplied ↑, "
    "avg discount given ↓) — s is dominated iff another supplier is ≥ "
    "on both axes and strictly better on one.  For the 2-D case the "
    "skyline falls out of ONE sort-order window (running max of the "
    "second axis over the first-axis order), no quadratic dominance "
    "join — the classic sweep that scales as sort + window over the "
    "folded supplier relation.  Multi-objective shortlisting next to "
    "join_topsis_supplier_rank's scalarized ranking.",
    tags=("join", "ranking", "ext"),
    oracle="""
WITH s AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev,
         round(avg(l_discount), 6) AS disc
  FROM lineitem GROUP BY l_suppkey
), sweep AS (
  -- order by rev desc: a supplier is on the skyline iff its discount is
  -- strictly lower than every better-revenue supplier's minimum
  SELECT l_suppkey, rev, disc,
         min(disc) OVER (ORDER BY rev DESC, l_suppkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS best_disc_above
  FROM s
)
SELECT l_suppkey, rev, disc
FROM sweep
WHERE best_disc_above IS NULL OR disc < best_disc_above
ORDER BY rev DESC, l_suppkey
""",
)
def join_skyline_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    s = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "rev"
        ),
        F.round(F.avg("l_discount"), 6).alias("disc"),
    )
    w = Window.orderBy(F.desc("rev"), "l_suppkey").rowsBetween(
        Window.unboundedPreceding, -1
    )
    sweep = s.select(
        "l_suppkey", "rev", "disc", F.min("disc").over(w).alias("best_disc_above")
    )
    return (
        sweep.filter(
            F.col("best_disc_above").isNull()
            | (F.col("disc") < F.col("best_disc_above"))
        )
        .select("l_suppkey", "rev", "disc")
        .orderBy(F.desc("rev"), "l_suppkey")
    )


# ---------------------------------------------------------------------------
# A6 ext: deterministic (hash-seeded) permutation test
# ---------------------------------------------------------------------------


@register(
    "agg_permutation_test_deterministic",
    doc="Permutation test without a random source: 64 pseudo-permutations "
    "of the treatment labels, each a pure function of md5(user, b) — "
    "replay-stable and identical on both engines.  The observed arm "
    "difference in mean per-user event value is compared against the "
    "permuted distribution; p = share of |permuted diff| ≥ |observed|.  "
    "The B×N fan-out is map-side over the per-user relation (never the "
    "raw fact table) and every replicate folds in one grouped "
    "aggregate — resampling inference at warehouse scale.",
    tags=("agg", "stats", "experiment", "ext"),
    oracle="""
WITH u AS (
  SELECT user_id, avg(value) AS v,
         ascii(substring(md5(user_id::VARCHAR), 1, 1)) % 2 AS arm
  FROM events GROUP BY user_id
), obs AS (
  SELECT avg(CASE WHEN arm = 1 THEN v END)
         - avg(CASE WHEN arm = 0 THEN v END) AS d_obs
  FROM u
), perm AS (
  SELECT b.b,
         avg(CASE WHEN ascii(substring(md5(user_id::VARCHAR || ':' ||
                                           b.b::VARCHAR), 1, 1)) % 2 = 1
                  THEN v END)
         - avg(CASE WHEN ascii(substring(md5(user_id::VARCHAR || ':' ||
                                             b.b::VARCHAR), 1, 1)) % 2 = 0
                    THEN v END) AS d_perm
  FROM u CROSS JOIN (SELECT unnest(range(0, 64)) AS b) b
  GROUP BY b.b
)
SELECT round(obs.d_obs, 6) AS observed_diff,
       count(*) AS n_permutations,
       sum(CASE WHEN abs(perm.d_perm) >= abs(obs.d_obs) THEN 1 ELSE 0 END)
         AS n_extreme,
       round(sum(CASE WHEN abs(perm.d_perm) >= abs(obs.d_obs)
                      THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS p_value
FROM perm, obs
GROUP BY obs.d_obs
""",
)
def agg_permutation_test_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    uid_str = F.col("user_id").cast("string")
    arm = F.ascii(F.substring(F.md5(uid_str.cast("binary")), 1, 1)) % 2
    u = ev.groupBy("user_id").agg(F.avg("value").alias("v")).select(
        "user_id", "v", arm.alias("arm")
    )
    obs = u.agg(
        (
            F.avg(F.when(F.col("arm") == 1, F.col("v")))
            - F.avg(F.when(F.col("arm") == 0, F.col("v")))
        ).alias("d_obs")
    )
    perm_arm = (
        F.ascii(
            F.substring(
                F.md5(
                    F.concat(uid_str, F.lit(":"), F.col("b").cast("string")).cast(
                        "binary"
                    )
                ),
                1,
                1,
            )
        )
        % 2
    )
    perm = (
        u.select(
            "user_id",
            "v",
            F.explode(F.sequence(F.lit(0), F.lit(63))).alias("b"),
        )
        .select("v", "b", perm_arm.alias("parm"))
        .groupBy("b")
        .agg(
            (
                F.avg(F.when(F.col("parm") == 1, F.col("v")))
                - F.avg(F.when(F.col("parm") == 0, F.col("v")))
            ).alias("d_perm")
        )
    )
    extreme = F.when(
        F.abs(F.col("d_perm")) >= F.abs(F.col("d_obs")), 1
    ).otherwise(0)
    return (
        perm.crossJoin(F.broadcast(obs))
        .groupBy("d_obs")
        .agg(
            F.count(F.lit(1)).alias("n_permutations"),
            F.sum(extreme).alias("n_extreme"),
            F.round(F.sum(extreme) / F.count(F.lit(1)), 6).alias("p_value"),
        )
        .select(
            F.round("d_obs", 6).alias("observed_diff"),
            "n_permutations",
            "n_extreme",
            "p_value",
        )
    )


# ---------------------------------------------------------------------------
# graph ext: degree assortativity of the co-occurrence graph
# ---------------------------------------------------------------------------


@register(
    "graph_degree_assortativity",
    doc="Degree assortativity of the part co-purchase graph (edge = two "
    "parts bought in the same order — the sparse graph, unlike the "
    "near-complete supplier projection): the Pearson correlation of "
    "endpoint degrees across edges, both orientations per undirected "
    "edge as convention demands.  Degrees from one aggregate over the "
    "edge list, the correlation from one more after a broadcast degree "
    "join; positive means hub products co-sell with other hubs.",
    tags=("graph", "join", "ext"),
    oracle="""
WITH edges AS (
  SELECT DISTINCT s1.l_partkey AS a, s2.l_partkey AS b
  FROM lineitem s1 JOIN lineitem s2
    ON s1.l_orderkey = s2.l_orderkey AND s1.l_partkey < s2.l_partkey
), deg AS (
  SELECT v, count(*) AS d FROM (
    SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges
  ) GROUP BY v
), oriented AS (
  SELECT a AS x, b AS y FROM edges
  UNION ALL
  SELECT b AS x, a AS y FROM edges
)
SELECT count(*) AS n_edge_ends,
       round(corr(da.d, db.d), 6) AS assortativity
FROM oriented o
JOIN deg da ON da.v = o.x
JOIN deg db ON db.v = o.y
""",
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    s1 = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("a"))
    s2 = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("b"))
    edges = (
        s1.join(s2, "ok").where(F.col("a") < F.col("b")).select("a", "b").distinct()
    )
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    oriented = edges.select(
        F.col("a").alias("x"), F.col("b").alias("y")
    ).unionAll(edges.select(F.col("b").alias("x"), F.col("a").alias("y")))
    da = F.broadcast(deg.select(F.col("v").alias("x"), F.col("d").alias("dx")))
    db = F.broadcast(deg.select(F.col("v").alias("y"), F.col("d").alias("dy")))
    return (
        oriented.join(da, "x")
        .join(db, "y")
        .agg(
            F.count(F.lit(1)).alias("n_edge_ends"),
            F.round(F.corr("dx", "dy"), 6).alias("assortativity"),
        )
    )


# ---------------------------------------------------------------------------
# A6 ext: Naive Bayes classifier trained and scored from aggregates
# ---------------------------------------------------------------------------


@register(
    "agg_naive_bayes_eval",
    doc="Naive Bayes without an ML library: class priors and per-feature "
    "likelihoods P(segment|y), P(nation|y) are just Laplace-smoothed "
    "contingency aggregates; scoring joins each customer to the two "
    "broadcast likelihood tables and compares log-posteriors.  "
    "Train and eval in three passes total, everything decomposable — "
    "the canonical proof that counts ARE the model for NB.  Reports "
    "accuracy vs the majority-class baseline.",
    tags=("agg", "ml", "ext"),
    oracle="""
WITH f AS (
  SELECT c.c_custkey, any_value(c.c_mktsegment) AS seg,
         any_value(c.c_nationkey) AS nat,
         max(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS y
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
), prior AS (
  SELECT sum(y) + 1.0 AS n1, sum(1 - y) + 1.0 AS n0,
         count(*) + 2.0 AS n
  FROM f
), lseg AS (
  SELECT seg,
         ln((sum(y) + 0.5) / (SELECT n1 FROM prior)) AS l1,
         ln((sum(1 - y) + 0.5) / (SELECT n0 FROM prior)) AS l0
  FROM f GROUP BY seg
), lnat AS (
  SELECT nat,
         ln((sum(y) + 0.5) / (SELECT n1 FROM prior)) AS l1,
         ln((sum(1 - y) + 0.5) / (SELECT n0 FROM prior)) AS l0
  FROM f GROUP BY nat
), scored AS (
  SELECT f.y,
         CASE WHEN ln(p.n1 / p.n) + ls.l1 + ln_.l1
                   > ln(p.n0 / p.n) + ls.l0 + ln_.l0
              THEN 1 ELSE 0 END AS pred
  FROM f
  JOIN lseg ls ON ls.seg = f.seg
  JOIN lnat ln_ ON ln_.nat = f.nat
  CROSS JOIN prior p
)
SELECT count(*) AS n_customers,
       round(avg(CASE WHEN pred = y THEN 1.0 ELSE 0.0 END), 6) AS nb_accuracy,
       round(greatest(avg(y * 1.0), 1 - avg(y * 1.0)), 6) AS baseline_accuracy,
       sum(pred) AS n_predicted_positive
FROM scored
""",
)
def agg_naive_bayes_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    f = (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.any_value("c_mktsegment").alias("seg"),
            F.any_value("c_nationkey").alias("nat"),
            F.max(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("y"),
        )
    )
    prior = f.agg(
        (F.sum("y") + 1.0).alias("n1"),
        (F.sum(1 - F.col("y")) + 1.0).alias("n0"),
        (F.count(F.lit(1)) + 2.0).alias("n"),
    )

    def _lik(key: str) -> DataFrame:
        return (
            f.groupBy(key)
            .agg(
                F.sum("y").alias("cy"),
                F.sum(1 - F.col("y")).alias("cn"),
            )
            .crossJoin(F.broadcast(prior.select("n1", "n0")))
            .select(
                key,
                F.log((F.col("cy") + 0.5) / F.col("n1")).alias(f"l1_{key}"),
                F.log((F.col("cn") + 0.5) / F.col("n0")).alias(f"l0_{key}"),
            )
        )

    scored = (
        f.join(F.broadcast(_lik("seg")), "seg")
        .join(F.broadcast(_lik("nat")), "nat")
        .crossJoin(F.broadcast(prior))
        .select(
            "y",
            F.when(
                F.log(F.col("n1") / F.col("n")) + F.col("l1_seg") + F.col("l1_nat")
                > F.log(F.col("n0") / F.col("n")) + F.col("l0_seg") + F.col("l0_nat"),
                1,
            )
            .otherwise(0)
            .alias("pred"),
        )
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(
            F.avg(F.when(F.col("pred") == F.col("y"), 1.0).otherwise(0.0)), 6
        ).alias("nb_accuracy"),
        F.round(F.greatest(F.avg("y"), 1 - F.avg("y")), 6).alias(
            "baseline_accuracy"
        ),
        F.sum("pred").alias("n_predicted_positive"),
    )


# ---------------------------------------------------------------------------
# mlops ext: deterministic k-fold cross-validation harness
# ---------------------------------------------------------------------------


@register(
    "mlops_kfold_cv_deterministic",
    doc="5-fold cross-validation without a random source: folds are "
    "md5(custkey) mod 5 (replay-stable, identical on both engines); "
    "for every fold the threshold classifier (predict URGENT iff "
    "balance above the train-arm's rank-based median) is fitted on "
    "the other four folds and scored on the held-out fold.  The "
    "train-side quantile per fold comes from ONE pass with a 5× "
    "map-side fan-out (each row serves in 4 train sets), never 5 "
    "rescans — the pattern that makes CV affordable at 100 TB.",
    tags=("mlops", "ml", "ext"),
    oracle="""
WITH f AS (
  SELECT c.c_custkey, any_value(round(c.c_acctbal, 2)) AS bal,
         max(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS y,
         ascii(substring(md5(c.c_custkey::VARCHAR), 2, 1)) % 5 AS fold
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
), fan AS (
  SELECT k.k AS eval_fold, f.bal, f.y, f.fold
  FROM f CROSS JOIN (SELECT unnest(range(0, 5)) AS k) k
), train AS (
  SELECT eval_fold, bal,
         row_number() OVER (PARTITION BY eval_fold ORDER BY bal) AS rn,
         count(*) OVER (PARTITION BY eval_fold) AS cnt
  FROM fan WHERE fold <> eval_fold
), thr AS (
  SELECT eval_fold, bal AS threshold
  FROM train WHERE rn = CAST(ceil(0.5 * cnt) AS BIGINT)
)
SELECT t.eval_fold AS fold,
       count(*) AS n_eval,
       any_value(t.threshold) AS threshold,
       round(avg(CASE WHEN (e.bal > t.threshold) = (e.y = 1)
                      THEN 1.0 ELSE 0.0 END), 6) AS fold_accuracy
FROM f e JOIN thr t ON t.eval_fold = e.fold
GROUP BY t.eval_fold ORDER BY fold
""",
)
def mlops_kfold_cv_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    fold = (
        F.ascii(
            F.substring(F.md5(F.col("c_custkey").cast("string").cast("binary")), 2, 1)
        )
        % 5
    )
    f = (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.any_value(F.round("c_acctbal", 2)).alias("bal"),
            F.max(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("y"),
        )
        .select("c_custkey", "bal", "y", fold.alias("fold"))
    )
    fan = f.select(
        "bal",
        "y",
        "fold",
        F.explode(F.sequence(F.lit(0), F.lit(4))).alias("eval_fold"),
    )
    train = fan.filter(F.col("fold") != F.col("eval_fold")).select(
        "eval_fold",
        "bal",
        F.row_number()
        .over(Window.partitionBy("eval_fold").orderBy("bal"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("eval_fold")).alias("cnt"),
    )
    thr = train.filter(
        F.col("rn") == F.ceil(0.5 * F.col("cnt")).cast("bigint")
    ).select("eval_fold", F.col("bal").alias("threshold"))
    return (
        f.join(F.broadcast(thr), thr.eval_fold == f.fold)
        .groupBy("eval_fold")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.any_value("threshold").alias("threshold"),
            F.round(
                F.avg(
                    F.when(
                        (F.col("bal") > F.col("threshold")) == (F.col("y") == 1),
                        1.0,
                    ).otherwise(0.0)
                ),
                6,
            ).alias("fold_accuracy"),
        )
        .select(
            F.col("eval_fold").alias("fold"),
            "n_eval",
            "threshold",
            "fold_accuracy",
        )
        .orderBy("fold")
    )


# ---------------------------------------------------------------------------
# A6 ext: interval-union coverage (sweep-line measure of covered time)
# ---------------------------------------------------------------------------


@register(
    "agg_interval_union_coverage",
    doc="Measure of the UNION of overlapping intervals — total seconds "
    "covered by at least one user session (30-min-gap sessions as "
    "elsewhere): the sweep-line +1/−1 construction where covered time "
    "is the sum of gaps whose running active-count stays positive.  "
    "The companion of agg_max_concurrency (same sweep, different "
    "reduction); interval union is the measure dedup that naive "
    "SUM(duration) double-counts.",
    tags=("agg", "interval", "ext"),
    oracle="""
WITH e AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts,
                                    event_id) > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
), s AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM e
), sess AS (
  SELECT min(ts) AS t0, max(ts) AS t1 FROM s GROUP BY user_id, sid
  HAVING max(ts) > min(ts)
), pts AS (
  SELECT t0 AS t, 1 AS delta FROM sess
  UNION ALL SELECT t1, -1 FROM sess
), sweep AS (
  SELECT t,
         sum(delta) OVER (ORDER BY t, delta DESC
                          ROWS UNBOUNDED PRECEDING) AS active,
         lead(t) OVER (ORDER BY t, delta DESC) AS t_next
  FROM pts
)
SELECT (SELECT count(*) FROM sess) AS n_intervals,
       sum(CASE WHEN active > 0
                THEN date_diff('second', t, t_next) ELSE 0 END)
         AS covered_seconds,
       (SELECT sum(date_diff('second', t0, t1)) FROM sess)
         AS naive_sum_seconds
FROM sweep WHERE t_next IS NOT NULL
""",
)
def agg_interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(wu)
    new_s = F.when(
        prev.isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp(prev) > 1800),
        1,
    ).otherwise(0)
    s = ev.select("user_id", "ts", new_s.alias("new_s")).select(
        "user_id",
        "ts",
        F.sum("new_s")
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("sid"),
    )
    sess = (
        s.groupBy("user_id", "sid")
        .agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
        .filter(F.col("t1") > F.col("t0"))
    )
    pts = sess.select(F.col("t0").alias("t"), F.lit(1).alias("delta")).unionAll(
        sess.select(F.col("t1").alias("t"), F.lit(-1).alias("delta"))
    )
    w = Window.orderBy("t", F.desc("delta"))
    sweep = pts.select(
        "t",
        F.sum("delta")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("active"),
        F.lead("t").over(w).alias("t_next"),
    )
    covered = sweep.filter(F.col("t_next").isNotNull()).agg(
        F.sum(
            F.when(
                F.col("active") > 0,
                F.unix_timestamp("t_next") - F.unix_timestamp("t"),
            ).otherwise(0)
        ).alias("covered_seconds"),
    )
    naive = sess.agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(F.unix_timestamp("t1") - F.unix_timestamp("t0")).alias(
            "naive_sum_seconds"
        ),
    )
    return covered.crossJoin(F.broadcast(naive)).select(
        "n_intervals", "covered_seconds", "naive_sum_seconds"
    )


# ---------------------------------------------------------------------------
# W5 ext: SPRT sequential test (running LLR with decision boundaries)
# ---------------------------------------------------------------------------


@register(
    "window_sprt_sequential_test",
    doc="Wald's sequential probability ratio test over the daily "
    "purchase-share series: H0 p=0.19 vs H1 p=0.21, per-day binomial "
    "log-likelihood-ratio increments accumulated as a running window "
    "sum, boundaries ln((1−β)/α), ln(β/(1−α)) at α=β=0.05; the first "
    "boundary crossing (if any) ends the experiment — sequential "
    "testing as a pure window plan, no loop.  Reports the decision "
    "day and the path extremes.",
    tags=("window", "stats", "experiment", "ext"),
    oracle="""
WITH d AS (
  SELECT date_trunc('day', ts) AS day,
         count(*) AS n,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x
  FROM events GROUP BY 1
), llr AS (
  SELECT day,
         x * ln(0.21 / 0.19) + (n - x) * ln(0.79 / 0.81) AS inc
  FROM d
), path AS (
  SELECT day,
         sum(inc) OVER (ORDER BY day) AS cum_llr
  FROM llr
), dec AS (
  SELECT day, cum_llr,
         CASE WHEN cum_llr >= ln(0.95 / 0.05) THEN 'accept_h1'
              WHEN cum_llr <= ln(0.05 / 0.95) THEN 'accept_h0'
              ELSE NULL END AS verdict
  FROM path
)
SELECT (SELECT count(*) FROM path) AS n_days,
       round((SELECT max(cum_llr) FROM path), 6) AS max_llr,
       round((SELECT min(cum_llr) FROM path), 6) AS min_llr,
       (SELECT strftime(min(day), '%Y-%m-%d') FROM dec
        WHERE verdict IS NOT NULL) AS decision_day,
       coalesce((SELECT any_value(verdict ORDER BY day) FROM dec
                 WHERE verdict IS NOT NULL), 'continue') AS decision
""",
)
def window_sprt_sequential_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("x"),
    )
    inc = F.col("x") * math.log(0.21 / 0.19) + (F.col("n") - F.col("x")) * math.log(
        0.79 / 0.81
    )
    path = d.select("day", inc.alias("inc")).select(
        "day", F.sum("inc").over(Window.orderBy("day")).alias("cum_llr")
    )
    hi, lo = math.log(0.95 / 0.05), math.log(0.05 / 0.95)
    dec = path.select(
        "day",
        "cum_llr",
        F.when(F.col("cum_llr") >= hi, F.lit("accept_h1"))
        .when(F.col("cum_llr") <= lo, F.lit("accept_h0"))
        .alias("verdict"),
    )
    summary = path.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.max("cum_llr"), 6).alias("max_llr"),
        F.round(F.min("cum_llr"), 6).alias("min_llr"),
    )
    first = dec.filter(F.col("verdict").isNotNull()).agg(
        F.date_format(F.min("day"), "yyyy-MM-dd").alias("decision_day"),
        F.min_by("verdict", "day").alias("_v"),
    )
    return (
        summary.crossJoin(F.broadcast(first))
        .select(
            "n_days",
            "max_llr",
            "min_llr",
            "decision_day",
            F.coalesce(F.col("_v"), F.lit("continue")).alias("decision"),
        )
    )


# ---------------------------------------------------------------------------
# W5 ext: M4 time-series decimation (min/max/first/last per bucket)
# ---------------------------------------------------------------------------


@register(
    "window_m4_downsampling",
    doc="M4 downsampling of the daily order-count series to 16 buckets: "
    "per pixel-bucket min, max, first and last (by time) — the "
    "visualization-preserving decimation that guarantees rendered "
    "extremes survive, computed as one tiny grouped aggregate with "
    "min_by/max_by for the endpoint values.  The series fold is the "
    "only fact-table pass; a dashboard at 100 TB reads 64 points, not "
    "600 M rows.",
    tags=("window", "timeseries", "ext"),
    oracle="""
WITH d AS (
  SELECT row_number() OVER (ORDER BY date_trunc('day', ts)) - 1 AS t,
         count(*) AS y
  FROM events GROUP BY date_trunc('day', ts)
), b AS (
  SELECT t, y,
         CAST(floor(t * 16.0 / (SELECT count(*) FROM d)) AS INT) AS bucket
  FROM d
)
SELECT bucket,
       count(*) AS n_points,
       min(y) AS y_min, max(y) AS y_max,
       arg_min(y, t) AS y_first, arg_max(y, t) AS y_last
FROM b GROUP BY bucket ORDER BY bucket
""",
)
def window_m4_downsampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    ).select(
        (F.row_number().over(Window.orderBy("day")) - 1).alias("t"), "y"
    )
    n = d.agg(F.count(F.lit(1)).alias("n"))
    b = d.crossJoin(F.broadcast(n)).select(
        "t", "y", (F.col("t") * 16 / F.col("n")).cast("int").alias("bucket")
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
            F.min_by("y", "t").alias("y_first"),
            F.max_by("y", "t").alias("y_last"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# events ext: D1/D7/D30 retention curve by first-seen cohort
# ---------------------------------------------------------------------------


@register(
    "events_dn_retention",
    doc="Classic Dn retention: for every user the first-seen day anchors "
    "the cohort, and D1/D7/D28 measure the share active exactly n days "
    "later — the day-offset grid folds from one (user, day) distinct "
    "projection joined back to the broadcast first-seen relation; "
    "denominators only count cohorts old enough to be observable at "
    "each horizon.  The per-day-offset complement of the weekly "
    "cohort matrix (cohort_weekly_retention).",
    tags=("events", "product", "ext"),
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
), first_seen AS (
  SELECT user_id, min(d) AS d0 FROM ud GROUP BY user_id
), span AS (SELECT max(d) AS dmax FROM ud),
offsets AS (
  SELECT u.user_id,
         date_diff('day', f.d0, u.d) AS n
  FROM ud u JOIN first_seen f USING (user_id)
), horizon AS (
  SELECT h.h,
         count(DISTINCT CASE WHEN o.n = h.h THEN o.user_id END) AS retained,
         (SELECT count(*) FROM first_seen f, span
          WHERE date_diff('day', f.d0, span.dmax) >= h.h) AS eligible
  FROM offsets o
  CROSS JOIN (VALUES (1), (7), (28)) AS h(h)
  GROUP BY h.h
)
SELECT h AS day_offset, eligible, retained,
       round(retained * 1.0 / eligible, 6) AS retention
FROM horizon ORDER BY day_offset
""",
)
def events_dn_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.date_trunc("day", "ts").alias("d")).distinct()
    first_seen = ud.groupBy("user_id").agg(F.min("d").alias("d0"))
    span = ud.agg(F.max("d").alias("dmax"))
    offsets = ud.join(F.broadcast(first_seen), "user_id").select(
        "user_id", F.datediff("d", "d0").alias("n")
    )
    horizons = offsets.select(
        "user_id",
        "n",
        F.explode(F.array(F.lit(1), F.lit(7), F.lit(28))).alias("h"),
    )
    retained = (
        horizons.filter(F.col("n") == F.col("h"))
        .groupBy("h")
        .agg(F.countDistinct("user_id").alias("retained"))
    )
    eligible = (
        first_seen.crossJoin(F.broadcast(span))
        .select(F.datediff("dmax", "d0").alias("age"))
        .select(
            F.explode(F.array(F.lit(1), F.lit(7), F.lit(28))).alias("h"), "age"
        )
        .filter(F.col("age") >= F.col("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("eligible"))
    )
    return (
        eligible.join(retained, "h", "left")
        .select(
            F.col("h").alias("day_offset"),
            "eligible",
            F.coalesce(F.col("retained"), F.lit(0)).alias("retained"),
            F.round(
                F.coalesce(F.col("retained"), F.lit(0)) / F.col("eligible"), 6
            ).alias("retention"),
        )
        .orderBy("day_offset")
    )


# ---------------------------------------------------------------------------
# A6 ext: Tukey-fence outlier census per segment (IQR rule)
# ---------------------------------------------------------------------------


@register(
    "agg_tukey_fence_outliers",
    doc="Tukey's IQR outlier rule per market segment: rank-based Q1/Q3 "
    "(type-1 quantiles, engine-exact like the conformal entries), "
    "fences at 1.5·IQR, then one broadcast-join pass counts mild and "
    "extreme (3·IQR) outliers — the third member of the robust-"
    "detection family next to grouped z-scores and MAD.",
    tags=("agg", "robust", "ext"),
    oracle="""
WITH v AS (
  SELECT c_mktsegment AS seg, round(c_acctbal, 2) AS bal FROM customer
), r AS (
  SELECT seg, bal,
         row_number() OVER (PARTITION BY seg ORDER BY bal) AS rn,
         count(*) OVER (PARTITION BY seg) AS cnt
  FROM v
), q AS (
  SELECT seg,
         max(CASE WHEN rn = CAST(ceil(0.25 * cnt) AS BIGINT)
                  THEN bal END) AS q1,
         max(CASE WHEN rn = CAST(ceil(0.75 * cnt) AS BIGINT)
                  THEN bal END) AS q3
  FROM r GROUP BY seg
)
SELECT v.seg, count(*) AS n,
       any_value(q.q1) AS q1, any_value(q.q3) AS q3,
       sum(CASE WHEN v.bal < q.q1 - 1.5 * (q.q3 - q.q1)
                 OR v.bal > q.q3 + 1.5 * (q.q3 - q.q1)
                THEN 1 ELSE 0 END) AS n_mild_outliers,
       sum(CASE WHEN v.bal < q.q1 - 3.0 * (q.q3 - q.q1)
                 OR v.bal > q.q3 + 3.0 * (q.q3 - q.q1)
                THEN 1 ELSE 0 END) AS n_extreme_outliers
FROM v JOIN q ON q.seg = v.seg
GROUP BY v.seg ORDER BY v.seg
""",
)
def agg_tukey_fence_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer")
    v = cust.select(
        F.col("c_mktsegment").alias("seg"), F.round("c_acctbal", 2).alias("bal")
    )
    r = v.select(
        "seg",
        "bal",
        F.row_number().over(Window.partitionBy("seg").orderBy("bal")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("seg")).alias("cnt"),
    )
    at = lambda p: F.max(  # noqa: E731
        F.when(
            F.col("rn") == F.ceil(F.lit(p) * F.col("cnt")).cast("bigint"),
            F.col("bal"),
        )
    )
    q = r.groupBy("seg").agg(at(0.25).alias("q1"), at(0.75).alias("q3"))
    iqr = F.col("q3") - F.col("q1")
    mild = (F.col("bal") < F.col("q1") - 1.5 * iqr) | (
        F.col("bal") > F.col("q3") + 1.5 * iqr
    )
    extreme = (F.col("bal") < F.col("q1") - 3.0 * iqr) | (
        F.col("bal") > F.col("q3") + 3.0 * iqr
    )
    return (
        v.join(F.broadcast(q), "seg")
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.any_value("q1").alias("q1"),
            F.any_value("q3").alias("q3"),
            F.sum(F.when(mild, 1).otherwise(0)).alias("n_mild_outliers"),
            F.sum(F.when(extreme, 1).otherwise(0)).alias("n_extreme_outliers"),
        )
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# A6 ext: Hodges-Lehmann location estimator (median of Walsh averages)
# ---------------------------------------------------------------------------


@register(
    "agg_hodges_lehmann",
    doc="Hodges-Lehmann estimator of monthly revenue location: the "
    "median of all pairwise (Walsh) averages over the ~80-month folded "
    "series — the rank-based location estimate that pairs with "
    "Theil-Sen's slope.  The O(m²)≈3k pair fan-out runs on the tiny "
    "aggregated relation; reported next to the plain mean and median "
    "to show the robustness gap.",
    tags=("agg", "robust", "ext"),
    oracle="""
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS mon,
         round(sum(o_totalprice), 2) AS y
  FROM orders GROUP BY 1
), walsh AS (
  SELECT (a.y + b.y) / 2 AS w
  FROM m a JOIN m b ON a.mon <= b.mon
), r AS (
  SELECT w, row_number() OVER (ORDER BY w) AS rn, count(*) OVER () AS cnt
  FROM walsh
), med AS (
  SELECT w AS hl FROM r WHERE rn = CAST(ceil(0.5 * cnt) AS BIGINT)
)
SELECT (SELECT count(*) FROM walsh) AS n_walsh,
       round((SELECT hl FROM med), 2) AS hodges_lehmann,
       (SELECT round(avg(y), 2) FROM m) AS plain_mean
""",
)
def agg_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("y")
    )
    a, b = m.alias("a"), m.alias("b")
    walsh = a.join(b, F.col("a.mon") <= F.col("b.mon")).select(
        ((F.col("a.y") + F.col("b.y")) / 2).alias("w")
    )
    r = walsh.select(
        "w",
        F.row_number().over(Window.orderBy("w")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("cnt"),
    )
    med = r.filter(
        F.col("rn") == F.ceil(0.5 * F.col("cnt")).cast("bigint")
    ).select(F.round("w", 2).alias("hodges_lehmann"))
    n = walsh.agg(F.count(F.lit(1)).alias("n_walsh"))
    mean = m.agg(F.round(F.avg("y"), 2).alias("plain_mean"))
    return n.crossJoin(F.broadcast(med)).crossJoin(F.broadcast(mean))


# ---------------------------------------------------------------------------
# graph ext: BFS frontier expansion (3 hops from a seed part)
# ---------------------------------------------------------------------------


@register(
    "graph_bfs_levels_3hop",
    doc="Breadth-first levels in the part co-purchase graph: three "
    "unrolled frontier expansions from seed part 1 — each hop joins "
    "the current frontier against the edge list and anti-joins the "
    "visited set, the iterative-graph pattern (like the Markov power "
    "steps) where per-hop cost is |frontier ⋈ edges|, never the whole "
    "graph squared.  Reports nodes reached per level plus the "
    "eccentricity-bounded remainder.",
    tags=("graph", "join", "ext"),
    oracle="""
WITH edges AS (
  SELECT DISTINCT s1.l_partkey AS a, s2.l_partkey AS b
  FROM lineitem s1 JOIN lineitem s2
    ON s1.l_orderkey = s2.l_orderkey AND s1.l_partkey < s2.l_partkey
), sym AS (
  SELECT a AS x, b AS y FROM edges UNION ALL SELECT b, a FROM edges
), l0 AS (SELECT 1::BIGINT AS v),
l1 AS (
  SELECT DISTINCT y AS v FROM sym JOIN l0 ON sym.x = l0.v
  WHERE y NOT IN (SELECT v FROM l0)
), l2 AS (
  SELECT DISTINCT y AS v FROM sym JOIN l1 ON sym.x = l1.v
  WHERE y NOT IN (SELECT v FROM l0) AND y NOT IN (SELECT v FROM l1)
), l3 AS (
  SELECT DISTINCT y AS v FROM sym JOIN l2 ON sym.x = l2.v
  WHERE y NOT IN (SELECT v FROM l0) AND y NOT IN (SELECT v FROM l1)
    AND y NOT IN (SELECT v FROM l2)
), nodes AS (
  SELECT count(DISTINCT x) AS n_nodes FROM sym
)
SELECT (SELECT count(*) FROM l1) AS level1,
       (SELECT count(*) FROM l2) AS level2,
       (SELECT count(*) FROM l3) AS level3,
       n_nodes,
       n_nodes - 1 - (SELECT count(*) FROM l1)
               - (SELECT count(*) FROM l2)
               - (SELECT count(*) FROM l3) AS unreached_within_3
FROM nodes
""",
)
def graph_bfs_levels_3hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    s1 = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("a"))
    s2 = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("b"))
    edges = (
        s1.join(s2, "ok").where(F.col("a") < F.col("b")).select("a", "b").distinct()
    )
    sym = edges.select(
        F.col("a").alias("x"), F.col("b").alias("y")
    ).unionAll(edges.select(F.col("b").alias("x"), F.col("a").alias("y")))
    frontier = edges.sparkSession.range(1, 2).select(F.col("id").alias("v"))
    visited = frontier
    levels = []
    for _ in range(3):
        nxt = (
            sym.join(F.broadcast(frontier), sym.x == frontier.v)
            .select(F.col("y").alias("v"))
            .distinct()
            .join(visited, "v", "left_anti")
        )
        levels.append(nxt.agg(F.count(F.lit(1))))
        visited = visited.unionAll(nxt).distinct()
        frontier = nxt
    nodes = sym.agg(F.countDistinct("x").alias("n_nodes"))
    out = nodes
    for i, lv in enumerate(levels):
        out = out.crossJoin(
            F.broadcast(lv.withColumnRenamed("count(1)", f"level{i + 1}"))
        )
    return out.select(
        "level1",
        "level2",
        "level3",
        "n_nodes",
        (
            F.col("n_nodes")
            - 1
            - F.col("level1")
            - F.col("level2")
            - F.col("level3")
        ).alias("unreached_within_3"),
    )


# ---------------------------------------------------------------------------
# text ext: Cavnar-Trenkle character-trigram language identification
# ---------------------------------------------------------------------------


@register(
    "text_cavnar_trenkle_langid",
    doc="The real n-gram language identifier (Cavnar-Trenkle 1994), not "
    "the stopword shortcut: per-language top-20 character-trigram rank "
    "profiles built from the labeled corpus in one explode+aggregate, "
    "then every document's top-10 trigrams are scored against each "
    "profile by out-of-place rank distance (missing trigram = max "
    "penalty) and the argmin language wins.  Everything is explodes, "
    "grouped counts and rank windows — the profile relation is 5×20 "
    "rows, broadcast for scoring.  Self-classification accuracy "
    "reported per language.",
    tags=("text", "langid", "ext"),
    oracle="""
WITH tri AS (
  SELECT doc_id, lang,
         unnest(list_transform(range(1, greatest(1, length(norm) - 1)),
                               i -> substring(norm, i, 3))) AS g
  FROM (SELECT doc_id, lang,
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
        FROM documents)
), prof AS (
  SELECT lang AS plang, g, rank FROM (
    SELECT lang, g, count(*) AS n,
           row_number() OVER (PARTITION BY lang
                              ORDER BY count(*) DESC, g) AS rank
    FROM tri GROUP BY lang, g
  ) WHERE rank <= 20
), docg AS (
  SELECT doc_id, lang, g, rank FROM (
    SELECT doc_id, lang, g, count(*) AS n,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY count(*) DESC, g) AS rank
    FROM tri GROUP BY doc_id, lang, g
  ) WHERE rank <= 10
), score AS (
  SELECT d.doc_id, d.lang, p.plang,
         sum(CASE WHEN pp.rank IS NULL THEN 21
                  ELSE abs(d.rank - pp.rank) END) AS dist
  FROM docg d
  CROSS JOIN (SELECT DISTINCT plang FROM prof) p
  LEFT JOIN prof pp ON pp.plang = p.plang AND pp.g = d.g
  GROUP BY d.doc_id, d.lang, p.plang
), pred AS (
  SELECT doc_id, lang, plang AS plang_pred FROM (
    SELECT doc_id, lang, plang,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY dist, plang) AS rn
    FROM score
  ) WHERE rn = 1
)
SELECT lang, count(*) AS n_docs,
       sum(CASE WHEN plang_pred = lang THEN 1 ELSE 0 END) AS n_correct,
       round(avg(CASE WHEN plang_pred = lang THEN 1.0 ELSE 0.0 END), 6)
         AS accuracy
FROM pred GROUP BY lang ORDER BY lang
""",
)
def text_cavnar_trenkle_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), "\\s+", " ")
    tri = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(1, length("
                "regexp_replace(lower(trim(text)), '\\\\s+', ' ')) - 2)), "
                "i -> substring(regexp_replace(lower(trim(text)), "
                "'\\\\s+', ' '), i, 3))"
            )
        ).alias("g"),
    )
    prof = (
        tri.groupBy("lang", "g")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("lang").alias("plang"),
            "g",
            F.row_number()
            .over(Window.partitionBy("lang").orderBy(F.desc("n"), "g"))
            .alias("rank"),
        )
        .filter(F.col("rank") <= 20)
    )
    docg = (
        tri.groupBy("doc_id", "lang", "g")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "doc_id",
            "lang",
            "g",
            F.row_number()
            .over(Window.partitionBy("doc_id").orderBy(F.desc("n"), "g"))
            .alias("rank"),
        )
        .filter(F.col("rank") <= 10)
    )
    langs = prof.select("plang").distinct()
    pp = prof.select(
        F.col("plang").alias("pp_lang"), F.col("g").alias("pp_g"),
        F.col("rank").alias("pp_rank"),
    )
    score = (
        docg.crossJoin(F.broadcast(langs))
        .join(
            F.broadcast(pp),
            (F.col("pp_lang") == F.col("plang")) & (F.col("pp_g") == F.col("g")),
            "left",
        )
        .groupBy("doc_id", "lang", "plang")
        .agg(
            F.sum(
                F.when(F.col("pp_rank").isNull(), 21).otherwise(
                    F.abs(F.col("rank") - F.col("pp_rank"))
                )
            ).alias("dist")
        )
    )
    pred = score.groupBy("doc_id", "lang").agg(
        F.min_by("plang", F.struct("dist", "plang")).alias("plang_pred")
    )
    return (
        pred.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("plang_pred") == F.col("lang"), 1).otherwise(0)
            ).alias("n_correct"),
            F.round(
                F.avg(
                    F.when(F.col("plang_pred") == F.col("lang"), 1.0).otherwise(0.0)
                ),
                6,
            ).alias("accuracy"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# W6 ext: two-phase exact top-k over a high-cardinality key
# ---------------------------------------------------------------------------


@register(
    "topk_two_phase_bucketed",
    doc="Exact global top-10 users by event count via the two-phase "
    "candidate pattern: users hash into 16 buckets (each user wholly "
    "inside one bucket), phase one takes the per-bucket top-10 "
    "(WindowGroupLimit pushes the limit below the exchange), phase two "
    "ranks only the ≤160 candidates — correct by construction because "
    "a global top-10 member must be top-10 of its own bucket.  The "
    "shape that replaces a global sort when the key space is too "
    "large for TakeOrdered's single heap to be the bottleneck.",
    tags=("topk", "scale", "ext"),
    oracle="""
SELECT user_id, count(*) AS n_events
FROM events GROUP BY user_id
ORDER BY n_events DESC, user_id LIMIT 10
""",
)
def topk_two_phase_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    bucket = F.pmod(F.hash("user_id"), F.lit(16))
    phase1 = (
        counts.withColumn("bkt", bucket)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("bkt").orderBy(
                    F.desc("n_events"), "user_id"
                )
            ),
        )
        .filter(F.col("rk") <= 10)
        .drop("bkt", "rk")
    )
    return phase1.orderBy(F.desc("n_events"), "user_id").limit(10)


# ---------------------------------------------------------------------------
# A6 ext: group-sequential monitoring with O'Brien-Fleming boundaries
# ---------------------------------------------------------------------------


@register(
    "agg_group_sequential_obf",
    doc="Group-sequential A/B monitoring: weekly looks at the cumulative "
    "purchase-rate difference between the md5-parity arms, each look's "
    "z-statistic compared against the O'Brien-Fleming boundary "
    "4.56/√t́ (t́ = information fraction) — the alpha-spending "
    "discipline real experimentation platforms enforce instead of "
    "naive daily peeking.  Cumulative arm cells come from running "
    "windows over per-week conditional aggregates; one fact pass.",
    tags=("agg", "experiment", "ext"),
    oracle="""
WITH e AS (
  SELECT date_trunc('week', ts) AS wk,
         ascii(substring(md5(user_id::VARCHAR), 1, 1)) % 2 AS arm,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
  FROM events
), wcell AS (
  SELECT wk, arm, count(*) AS n, sum(conv) AS x FROM e GROUP BY wk, arm
), looks AS (
  SELECT wk,
         sum(CASE WHEN arm = 1 THEN n END) OVER w AS n1,
         sum(CASE WHEN arm = 1 THEN x END) OVER w AS x1,
         sum(CASE WHEN arm = 0 THEN n END) OVER w AS n0,
         sum(CASE WHEN arm = 0 THEN x END) OVER w AS x0,
         row_number() OVER (ORDER BY wk) AS look,
         count(*) OVER () AS n_looks
  FROM wcell
  WINDOW w AS (ORDER BY wk ROWS UNBOUNDED PRECEDING)
), dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY wk ORDER BY look DESC) AS rn
    FROM looks
  ) WHERE rn = 1
), z AS (
  SELECT wk, n1 + n0 AS n_total,
         (x1 * 1.0 / n1 - x0 * 1.0 / n0)
         / sqrt((x1 + x0) * 1.0 / (n1 + n0)
                * (1 - (x1 + x0) * 1.0 / (n1 + n0))
                * (1.0 / n1 + 1.0 / n0)) AS z_stat,
         (n1 + n0) * 1.0 / max(n1 + n0) OVER () AS info_frac
  FROM dedup
)
SELECT strftime(wk, '%Y-%m-%d') AS week,
       CAST(n_total AS BIGINT) AS n_total,
       round(z_stat, 4) AS z_stat,
       round(4.56 / sqrt(info_frac) * 0.5, 4) AS obf_boundary,
       abs(z_stat) > 4.56 / sqrt(info_frac) * 0.5 AS stop_early
FROM z ORDER BY week
""",
)
def agg_group_sequential_obf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    arm = (
        F.ascii(F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 1))
        % 2
    )
    e = ev.select(
        F.date_trunc("week", "ts").alias("wk"),
        arm.alias("arm"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("conv"),
    )
    wcell = e.groupBy("wk", "arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("x")
    )
    w = Window.orderBy("wk").rowsBetween(Window.unboundedPreceding, 0)
    looks = wcell.select(
        "wk",
        F.sum(F.when(F.col("arm") == 1, F.col("n"))).over(w).alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("x"))).over(w).alias("x1"),
        F.sum(F.when(F.col("arm") == 0, F.col("n"))).over(w).alias("n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("x"))).over(w).alias("x0"),
    )
    dedup = (
        looks.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("wk").orderBy(
                    F.desc(F.col("n1") + F.col("n0"))
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    n1, x1, n0, x0 = F.col("n1"), F.col("x1"), F.col("n0"), F.col("x0")
    p_pool = (x1 + x0) / (n1 + n0)
    z_stat = (x1 / n1 - x0 / n0) / F.sqrt(
        p_pool * (1 - p_pool) * (1.0 / n1 + 1.0 / n0)
    )
    zed = dedup.select(
        "wk",
        (n1 + n0).alias("n_total"),
        z_stat.alias("z_stat"),
    ).withColumn(
        "info_frac",
        F.col("n_total") / F.max("n_total").over(Window.partitionBy()),
    )
    boundary = 4.56 / F.sqrt(F.col("info_frac")) * 0.5
    return zed.select(
        F.date_format("wk", "yyyy-MM-dd").alias("week"),
        F.col("n_total").cast("bigint").alias("n_total"),
        F.round("z_stat", 4).alias("z_stat"),
        F.round(boundary, 4).alias("obf_boundary"),
        (F.abs(F.col("z_stat")) > boundary).alias("stop_early"),
    ).orderBy("week")


# ---------------------------------------------------------------------------
# A6 ext: Laspeyres / Paasche / Fisher price indices between years
# ---------------------------------------------------------------------------


@register(
    "agg_price_index_fisher",
    doc="Classical price indices for the 1996→2000 comparison, computed "
    "from per-part unit prices and quantities in ONE conditional "
    "aggregate per part (base and current period side by side), then "
    "the Laspeyres (base-weighted), Paasche (current-weighted) and "
    "Fisher (geometric mean) indices from a second 1-row aggregate "
    "over parts traded in both periods — the econometric rollup shape "
    "where every sum is decomposable and the part dimension prunes "
    "naturally.",
    tags=("agg", "econ", "ext"),
    oracle="""
WITH pp AS (
  SELECT l_partkey,
         sum(CASE WHEN year(l_shipdate) = 1996 THEN l_quantity END) AS q0,
         sum(CASE WHEN year(l_shipdate) = 1996 THEN l_extendedprice END)
           / sum(CASE WHEN year(l_shipdate) = 1996 THEN l_quantity END) AS p0,
         sum(CASE WHEN year(l_shipdate) = 2000 THEN l_quantity END) AS q1,
         sum(CASE WHEN year(l_shipdate) = 2000 THEN l_extendedprice END)
           / sum(CASE WHEN year(l_shipdate) = 2000 THEN l_quantity END) AS p1
  FROM lineitem WHERE year(l_shipdate) IN (1996, 2000)
  GROUP BY l_partkey
), both_ AS (
  SELECT * FROM pp WHERE q0 IS NOT NULL AND q1 IS NOT NULL
), s AS (
  SELECT count(*) AS n_parts,
         sum(p1 * q0) / sum(p0 * q0) AS laspeyres,
         sum(p1 * q1) / sum(p0 * q1) AS paasche
  FROM both_
)
SELECT n_parts,
       round(laspeyres, 6) AS laspeyres,
       round(paasche, 6) AS paasche,
       round(sqrt(laspeyres * paasche), 6) AS fisher
FROM s
""",
)
def agg_price_index_fisher(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    yr = F.year("l_shipdate")
    q_at = lambda y: F.sum(F.when(yr == y, F.col("l_quantity")))  # noqa: E731
    v_at = lambda y: F.sum(F.when(yr == y, F.col("l_extendedprice")))  # noqa: E731
    pp = (
        li.filter(yr.isin(1996, 2000))
        .groupBy("l_partkey")
        .agg(
            q_at(1996).alias("q0"),
            (v_at(1996) / q_at(1996)).alias("p0"),
            q_at(2000).alias("q1"),
            (v_at(2000) / q_at(2000)).alias("p1"),
        )
    )
    both = pp.filter(F.col("q0").isNotNull() & F.col("q1").isNotNull())
    s = both.agg(
        F.count(F.lit(1)).alias("n_parts"),
        (
            F.sum(F.col("p1") * F.col("q0")) / F.sum(F.col("p0") * F.col("q0"))
        ).alias("laspeyres"),
        (
            F.sum(F.col("p1") * F.col("q1")) / F.sum(F.col("p0") * F.col("q1"))
        ).alias("paasche"),
    )
    return s.select(
        "n_parts",
        F.round("laspeyres", 6).alias("laspeyres"),
        F.round("paasche", 6).alias("paasche"),
        F.round(F.sqrt(F.col("laspeyres") * F.col("paasche")), 6).alias("fisher"),
    )


# ---------------------------------------------------------------------------
# events ext: bot detection by inter-arrival regularity
# ---------------------------------------------------------------------------


@register(
    "events_bot_regularity_screen",
    doc="Bot screening from timing alone: per-user inter-event gaps (one "
    "lag window), then the coefficient of variation of those gaps — "
    "humans are bursty (CV ≈ 1 for Poisson), schedulers are metronomes "
    "(CV → 0) — with the ten most-regular high-volume users surfaced.  "
    "One window + one aggregate per user; minimum-event support keeps "
    "the estimate meaningful.",
    tags=("events", "ops", "ext"),
    oracle="""
WITH g AS (
  SELECT user_id,
         date_diff('second',
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS gap_s
  FROM events
), s AS (
  SELECT user_id, count(*) AS n_gaps,
         avg(gap_s) AS mean_gap, stddev_samp(gap_s) AS sd_gap
  FROM g WHERE gap_s IS NOT NULL GROUP BY user_id
  HAVING count(*) >= 20
)
SELECT user_id, n_gaps,
       round(mean_gap, 2) AS mean_gap_s,
       round(sd_gap / mean_gap, 6) AS gap_cv,
       sd_gap / mean_gap < 0.3 AS bot_suspect
FROM s ORDER BY gap_cv, user_id LIMIT 10
""",
)
def events_bot_regularity_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    g = ev.select("user_id", gap.alias("gap_s")).filter(
        F.col("gap_s").isNotNull()
    )
    s = (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.avg("gap_s").alias("mean_gap"),
            F.stddev_samp("gap_s").alias("sd_gap"),
        )
        .filter(F.col("n_gaps") >= 20)
    )
    cv = F.col("sd_gap") / F.col("mean_gap")
    return (
        s.select(
            "user_id",
            "n_gaps",
            F.round("mean_gap", 2).alias("mean_gap_s"),
            F.round(cv, 6).alias("gap_cv"),
            (cv < 0.3).alias("bot_suspect"),
        )
        .orderBy("gap_cv", "user_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# P8 ext: haversine great-circle distance matrix (trig scalar surface)
# ---------------------------------------------------------------------------


@register(
    "scalar_haversine_matrix",
    doc="Great-circle distances between synthetic nation centroids "
    "(lat/lon derived deterministically from the nation key — the "
    "fixtures carry no geo columns, the trig pipeline is the "
    "deliverable): the haversine formula end to end in radians/sin/"
    "cos/asin built-ins, 25×25 pairs from a broadcast self-join of the "
    "dimension, nearest-neighbour per nation reported.  Locks the "
    "spherical-geometry scalar surface every geo join needs.",
    tags=("scalar", "geo", "ext"),
    oracle="""
WITH geo AS (
  SELECT n_nationkey AS k, n_name,
         (n_nationkey * 6 - 72) * 1.0 AS lat,
         (n_nationkey * 13 - 150) * 1.0 AS lon
  FROM nation
), pairs AS (
  SELECT a.k AS k_a, a.n_name AS name_a, b.k AS k_b,
         2 * 6371.0 * asin(sqrt(
           pow(sin(radians(b.lat - a.lat) / 2), 2)
           + cos(radians(a.lat)) * cos(radians(b.lat))
             * pow(sin(radians(b.lon - a.lon) / 2), 2))) AS dist_km
  FROM geo a JOIN geo b ON a.k <> b.k
), nn AS (
  SELECT k_a, name_a, k_b, dist_km,
         row_number() OVER (PARTITION BY k_a ORDER BY dist_km, k_b) AS rn
  FROM pairs
)
SELECT k_a AS nationkey, name_a AS nation, k_b AS nearest_nationkey,
       round(dist_km, 2) AS nearest_km
FROM nn WHERE rn = 1 ORDER BY nationkey
""",
)
def scalar_haversine_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    nation = load_table(spark, sf_dir, "nation")
    geo = nation.select(
        F.col("n_nationkey").alias("k"),
        "n_name",
        (F.col("n_nationkey") * 6 - 72).cast("double").alias("lat"),
        (F.col("n_nationkey") * 13 - 150).cast("double").alias("lon"),
    )
    a, b = geo.alias("a"), geo.alias("b")
    dlat = F.radians(F.col("b.lat") - F.col("a.lat")) / 2
    dlon = F.radians(F.col("b.lon") - F.col("a.lon")) / 2
    h = F.pow(F.sin(dlat), F.lit(2)) + F.cos(F.radians(F.col("a.lat"))) * F.cos(
        F.radians(F.col("b.lat"))
    ) * F.pow(F.sin(dlon), F.lit(2))
    pairs = a.join(b, F.col("a.k") != F.col("b.k")).select(
        F.col("a.k").alias("k_a"),
        F.col("a.n_name").alias("name_a"),
        F.col("b.k").alias("k_b"),
        (2 * 6371.0 * F.asin(F.sqrt(h))).alias("dist_km"),
    )
    nn = pairs.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("k_a").orderBy("dist_km", "k_b")
        ),
    ).filter(F.col("rn") == 1)
    return nn.select(
        F.col("k_a").alias("nationkey"),
        F.col("name_a").alias("nation"),
        F.col("k_b").alias("nearest_nationkey"),
        F.round("dist_km", 2).alias("nearest_km"),
    ).orderBy("nationkey")


# ---------------------------------------------------------------------------
# sim ext: hard-negative mining for contrastive training
# ---------------------------------------------------------------------------


@register(
    "sim_hard_negative_mining",
    doc="Contrastive-training data prep: for each anchor embedding the "
    "nearest SAME-label vector (positive) and the nearest DIFFERENT-"
    "label vector (hard negative) by exact cosine, plus the margin "
    "between them — the triplet-mining pass that decides which pairs "
    "are worth a gradient.  Anchors are a bounded slice; at scale the "
    "candidate set comes from the IVF/LSH buckets instead of all "
    "pairs, same downstream shape.  Order-stable double folds keep "
    "cosine bit-identical to the oracle.",
    tags=("similarity", "training", "ext"),
    oracle="""
WITH pairs AS (
  SELECT x.vec_id AS anchor, x.label AS label_a,
         y.vec_id AS cand, y.label AS label_c,
         list_sum(list_transform(range(1, 65),
                  d -> CAST(x.embedding[d] AS DOUBLE)
                     * CAST(y.embedding[d] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(range(1, 65),
                 d -> CAST(x.embedding[d] AS DOUBLE)
                    * CAST(x.embedding[d] AS DOUBLE))))
          * sqrt(list_sum(list_transform(range(1, 65),
                 d -> CAST(y.embedding[d] AS DOUBLE)
                    * CAST(y.embedding[d] AS DOUBLE))))) AS cos_sim
  FROM embeddings x JOIN embeddings y ON x.vec_id <> y.vec_id
  WHERE x.vec_id < 20
), pos AS (
  SELECT anchor, cand AS positive_id, cos_sim AS pos_sim FROM (
    SELECT *, row_number() OVER (PARTITION BY anchor
                                 ORDER BY cos_sim DESC, cand) AS rn
    FROM pairs WHERE label_a = label_c
  ) WHERE rn = 1
), neg AS (
  SELECT anchor, cand AS negative_id, cos_sim AS neg_sim FROM (
    SELECT *, row_number() OVER (PARTITION BY anchor
                                 ORDER BY cos_sim DESC, cand) AS rn
    FROM pairs WHERE label_a <> label_c
  ) WHERE rn = 1
)
SELECT p.anchor, p.positive_id, round(p.pos_sim, 6) AS pos_sim,
       n.negative_id, round(n.neg_sim, 6) AS neg_sim,
       round(p.pos_sim - n.neg_sim, 6) AS margin
FROM pos p JOIN neg n USING (anchor)
ORDER BY anchor
""",
)
def sim_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("anchor"),
        F.col("label").alias("label_a"),
        F.col("embedding").alias("ea"),
    )
    y = emb.select(
        F.col("vec_id").alias("cand"),
        F.col("label").alias("label_c"),
        F.col("embedding").alias("ec"),
    )
    dot = F.expr(
        "aggregate(zip_with(ea, ec, (a, b) -> cast(a as double) * "
        "cast(b as double)), cast(0.0 as double), (acc, v) -> acc + v)"
    )
    nrm = (
        "sqrt(aggregate(transform({c}, a -> cast(a as double) * "
        "cast(a as double)), cast(0.0 as double), (acc, v) -> acc + v))"
    )
    pairs = (
        x.join(F.broadcast(y), F.col("anchor") != F.col("cand"))
        .select(
            "anchor",
            "label_a",
            "cand",
            "label_c",
            (dot / (F.expr(nrm.format(c="ea")) * F.expr(nrm.format(c="ec")))).alias(
                "cos_sim"
            ),
        )
    )

    def _best(filtered: DataFrame, id_out: str, sim_out: str) -> DataFrame:
        return (
            filtered.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("anchor").orderBy(
                        F.desc("cos_sim"), "cand"
                    )
                ),
            )
            .filter(F.col("rn") == 1)
            .select(
                "anchor",
                F.col("cand").alias(id_out),
                F.col("cos_sim").alias(sim_out),
            )
        )

    pos = _best(pairs.filter(F.col("label_a") == F.col("label_c")), "positive_id", "pos_sim")
    neg = _best(pairs.filter(F.col("label_a") != F.col("label_c")), "negative_id", "neg_sim")
    return (
        pos.join(neg, "anchor")
        .select(
            "anchor",
            "positive_id",
            F.round("pos_sim", 6).alias("pos_sim"),
            "negative_id",
            F.round("neg_sim", 6).alias("neg_sim"),
            F.round(F.col("pos_sim") - F.col("neg_sim"), 6).alias("margin"),
        )
        .orderBy("anchor")
    )


# ---------------------------------------------------------------------------
# A6 ext: Weibull fit via the log-log linearization of Kaplan-Meier
# ---------------------------------------------------------------------------


@register(
    "agg_weibull_loglog_fit",
    doc="Parametric Weibull fit of order-fulfilment durations by the "
    "classic linearization: the empirical survival curve (same "
    "censoring-aware construction as agg_nelson_aalen) is transformed "
    "to ln(−ln S(t)) vs ln t, where Weibull data fall on a line with "
    "slope = shape k and intercept = −k·ln λ — one regr_slope/"
    "regr_intercept aggregate over the ≤100 survival points.  Shape "
    "k>1 reads as wear-out (fulfilment risk grows with age).",
    tags=("agg", "survival", "ext"),
    oracle="""
WITH dur AS (
  SELECT o.o_orderkey,
         date_diff('day', o.o_orderdate, max(l.l_shipdate)) AS t,
         max(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS censored
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate
), cell AS (
  SELECT t, sum(1 - censored) AS d, sum(censored) AS c
  FROM dur WHERE t > 0 GROUP BY t
), risk AS (
  SELECT t, d,
         sum(d + c) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS gone,
         sum(d + c) OVER () AS total
  FROM cell
), km AS (
  -- drop the terminal event time (d = risk set ⇒ S hits 0, ln blows up);
  -- every earlier point's product is unaffected
  SELECT t,
         exp(sum(ln(1 - d * 1.0 / (total - coalesce(gone, 0))))
             OVER (ORDER BY t)) AS s
  FROM risk WHERE d > 0 AND d < total - coalesce(gone, 0)
), pts AS (
  SELECT ln(t * 1.0) AS lx, ln(-ln(s)) AS ly
  FROM km WHERE s > 0 AND s < 1
)
SELECT count(*) AS n_points,
       round(regr_slope(ly, lx), 4) AS shape_k,
       round(exp(-regr_intercept(ly, lx) / regr_slope(ly, lx)), 2)
         AS scale_lambda,
       regr_slope(ly, lx) > 1 AS wear_out
FROM pts
""",
)
def agg_weibull_loglog_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dur = (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.datediff(F.max("l_shipdate"), F.first("o_orderdate")).alias("t"),
            F.max(
                F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)
            ).alias("censored"),
        )
        .filter(F.col("t") > 0)
    )
    cell = dur.groupBy("t").agg(
        F.sum(1 - F.col("censored")).alias("d"),
        F.sum("censored").alias("c"),
    )
    w = Window.orderBy("t")
    risk = cell.select(
        "t",
        "d",
        F.sum(F.col("d") + F.col("c"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .alias("gone"),
        F.sum(F.col("d") + F.col("c")).over(Window.partitionBy()).alias("total"),
    )
    n_risk = F.col("total") - F.coalesce(F.col("gone"), F.lit(0))
    km = (
        risk.filter((F.col("d") > 0) & (F.col("d") < n_risk))
        .select(
            "t",
            F.exp(
                F.sum(F.log(1 - F.col("d") / n_risk)).over(w)
            ).alias("s"),
        )
    )
    pts = km.filter((F.col("s") > 0) & (F.col("s") < 1)).select(
        F.log(F.col("t").cast("double")).alias("lx"),
        F.log(-F.log("s")).alias("ly"),
    )
    slope = F.regr_slope(F.col("ly"), F.col("lx"))
    return pts.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(slope, 4).alias("shape_k"),
        F.round(
            F.exp(-F.regr_intercept(F.col("ly"), F.col("lx")) / slope), 2
        ).alias("scale_lambda"),
        (slope > 1).alias("wear_out"),
    )


# ---------------------------------------------------------------------------
# W5 ext: Kaufman efficiency ratio (trend vs noise per window)
# ---------------------------------------------------------------------------


@register(
    "window_kaufman_efficiency",
    doc="Kaufman's efficiency ratio on monthly revenue: |net change over "
    "the trailing 6 months| / Σ|month-to-month changes| — 1 means a "
    "clean trend, →0 means churning noise.  A lag window for the "
    "deltas, two frame sums for the ratio, all on the folded series; "
    "the regime classifier that decides when trend indicators "
    "(window_mom_growth, the oscillators) are even meaningful.",
    tags=("window", "timeseries", "ext"),
    oracle="""
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS mon,
         round(sum(o_totalprice), 2) AS y
  FROM orders GROUP BY 1
), d AS (
  SELECT mon, y,
         abs(y - lag(y) OVER (ORDER BY mon)) AS step,
         row_number() OVER (ORDER BY mon) AS rn
  FROM m
), k AS (
  SELECT mon, rn,
         abs(y - lag(y, 6) OVER (ORDER BY mon)) AS net,
         sum(step) OVER (ORDER BY mon ROWS BETWEEN 5 PRECEDING
                         AND CURRENT ROW) AS path
  FROM d
)
SELECT strftime(mon, '%Y-%m') AS mon,
       round(net / nullif(path, 0), 6) AS efficiency_ratio,
       net / nullif(path, 0) > 0.5 AS trending
FROM k WHERE rn > 6 ORDER BY mon
""",
)
def window_kaufman_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("y")
    )
    w = Window.orderBy("mon")
    d = m.select(
        "mon",
        "y",
        F.abs(F.col("y") - F.lag("y").over(w)).alias("step"),
        F.row_number().over(w).alias("rn"),
    )
    k = d.select(
        "mon",
        "rn",
        F.abs(F.col("y") - F.lag("y", 6).over(w)).alias("net"),
        F.sum("step").over(w.rowsBetween(-5, 0)).alias("path"),
    )
    er = F.col("net") / F.nullif(F.col("path"), F.lit(0.0))
    return (
        k.filter(F.col("rn") > 6)
        .select(
            F.date_format("mon", "yyyy-MM").alias("mon"),
            F.round(er, 6).alias("efficiency_ratio"),
            (er > 0.5).alias("trending"),
        )
        .orderBy("mon")
    )


# ---------------------------------------------------------------------------
# mlops ext: point-in-time-correct training-set assembly
# ---------------------------------------------------------------------------


@register(
    "mlops_pit_training_set",
    doc="Leakage-free training-set assembly (the feature-store join): for "
    "every order, features computed STRICTLY from the customer's "
    "earlier history — prior order count, prior spend, days since the "
    "previous order — via exclusive-frame windows over the per-"
    "customer order sequence, labeled with the current order's "
    "urgency.  No future rows can reach a feature by construction "
    "(the 1-PRECEDING frame is the point-in-time guarantee "
    "cdc_temporal_scd2_enrich gives for dimensions, applied to "
    "behavioural aggregates).  Feature-summary output.",
    tags=("mlops", "features", "ext"),
    oracle="""
WITH h AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS label,
         count(*) OVER w AS n_prior,
         coalesce(sum(o_totalprice) OVER w, 0) AS prior_spend,
         date_diff('day', lag(o_orderdate)
                   OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey), o_orderdate)
           AS days_since_prev
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT label,
       count(*) AS n_rows,
       round(avg(n_prior), 4) AS mean_prior_orders,
       round(avg(prior_spend), 2) AS mean_prior_spend,
       round(avg(days_since_prev), 4) AS mean_days_since_prev,
       sum(CASE WHEN n_prior = 0 THEN 1 ELSE 0 END) AS n_cold_start
FROM h GROUP BY label ORDER BY label
""",
)
def mlops_pit_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    wseq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wpast = wseq.rowsBetween(Window.unboundedPreceding, -1)
    h = orders.select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias(
            "label"
        ),
        F.count(F.lit(1)).over(wpast).alias("n_prior"),
        F.coalesce(F.sum("o_totalprice").over(wpast), F.lit(0.0)).alias(
            "prior_spend"
        ),
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(wseq)
        ).alias("days_since_prev"),
    )
    return (
        h.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.avg("n_prior"), 4).alias("mean_prior_orders"),
            F.round(F.avg("prior_spend"), 2).alias("mean_prior_spend"),
            F.round(F.avg("days_since_prev"), 4).alias("mean_days_since_prev"),
            F.sum(F.when(F.col("n_prior") == 0, 1).otherwise(0)).alias(
                "n_cold_start"
            ),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# corpus ext: SFT prompt/response pair preparation under a token budget
# ---------------------------------------------------------------------------


@register(
    "corpus_sft_pair_prep",
    doc="Supervised-fine-tuning pair assembly: adjacent same-source "
    "documents (by doc_id order, one lead window per source) become "
    "(prompt, response) pairs, whitespace token counts gate the "
    "combined length to a 256-token context budget, and the per-source "
    "yield report shows what the budget discards — the formatting "
    "pass between a curated corpus and a trainer.  One window + one "
    "aggregate; the pair text itself stays unmaterialized (only "
    "lengths flow).",
    tags=("corpus", "training", "ext"),
    oracle="""
WITH t AS (
  SELECT source, doc_id,
         len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                         'g'), ' ')) AS n_tok
  FROM documents
), pairs AS (
  SELECT source, n_tok AS prompt_tok,
         lead(n_tok) OVER (PARTITION BY source ORDER BY doc_id)
           AS response_tok
  FROM t
)
SELECT source,
       count(response_tok) AS n_pairs,
       sum(CASE WHEN prompt_tok + response_tok <= 256
                THEN 1 ELSE 0 END) AS n_within_budget,
       round(sum(CASE WHEN prompt_tok + response_tok <= 256
                      THEN 1 ELSE 0 END) * 1.0
             / count(response_tok), 6) AS budget_yield,
       sum(CASE WHEN prompt_tok + response_tok <= 256
                THEN prompt_tok + response_tok ELSE 0 END) AS kept_tokens
FROM pairs GROUP BY source ORDER BY source
""",
)
def corpus_sft_pair_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..operators import textstats as ts

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "source", "doc_id", ts.token_count(F.col("text")).alias("n_tok")
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    pairs = t.select(
        "source",
        F.col("n_tok").alias("prompt_tok"),
        F.lead("n_tok").over(w).alias("response_tok"),
    )
    within = F.col("prompt_tok") + F.col("response_tok") <= 256
    return (
        pairs.groupBy("source")
        .agg(
            F.count("response_tok").alias("n_pairs"),
            F.sum(F.when(within, 1).otherwise(0)).alias("n_within_budget"),
            F.round(
                F.sum(F.when(within, 1).otherwise(0)) / F.count("response_tok"),
                6,
            ).alias("budget_yield"),
            F.sum(
                F.when(
                    within, F.col("prompt_tok") + F.col("response_tok")
                ).otherwise(0)
            ).alias("kept_tokens"),
        )
        .orderBy("source")
    )


_RAKE_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, u.pos, u.w,
         list_contains({_STOP_SQL}, u.w) AS is_stop
  FROM (SELECT doc_id, string_split({_NORM}, ' ') AS toks FROM documents) d,
       LATERAL (SELECT p.pos, d.toks[p.pos] AS w
                FROM unnest(range(1, len(d.toks) + 1)) p(pos)) u
), nxt AS (
  SELECT doc_id, w, is_stop,
         lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
         lead(is_stop) OVER (PARTITION BY doc_id ORDER BY pos) AS stop2
  FROM tok
), freq AS (
  SELECT w, count(*) AS freq FROM tok WHERE NOT is_stop GROUP BY w
), adj AS (
  SELECT w, w2 FROM nxt
  WHERE NOT is_stop AND NOT coalesce(stop2, TRUE)
), dout AS (SELECT w, count(*) AS dout FROM adj GROUP BY w),
din AS (SELECT w2 AS w, count(*) AS din FROM adj GROUP BY w2),
scored AS (
  SELECT f.w, f.freq,
         f.freq + coalesce(o.dout, 0) + coalesce(i.din, 0) AS degree
  FROM freq f LEFT JOIN dout o USING (w) LEFT JOIN din i USING (w)
)
SELECT w, freq, degree,
       round(degree * 1.0 / freq, 6) AS rake_score
FROM scored WHERE freq >= 5
ORDER BY rake_score DESC, freq DESC, w LIMIT 15
"""


# ---------------------------------------------------------------------------
# A6 ext: bimodality coefficient (mixture-separation screen)
# ---------------------------------------------------------------------------


@register(
    "agg_bimodality_coefficient",
    doc="Sarle's bimodality coefficient per market segment: "
    "BC = (skew²+1)/(kurtosis+3·(n−1)²/((n−2)(n−3))), values above the "
    "uniform benchmark 5/9 flag a possible mixture — the one-pass "
    "moment screen run before paying for real mixture modelling.  "
    "Reuses the same decomposable third/fourth-moment aggregates as "
    "agg_skewness_kurtosis, grouped.",
    tags=("agg", "stats", "ext"),
    oracle="""
-- population moments from power sums (Spark's skewness/kurtosis use the
-- population g1/g2 while DuckDB's are sample-corrected — power sums agree)
WITH s AS (
  SELECT c_mktsegment, count(*) AS n,
         avg(c_acctbal) AS m1,
         avg(c_acctbal * c_acctbal) AS m2r,
         avg(pow(c_acctbal, 3)) AS m3r,
         avg(pow(c_acctbal, 4)) AS m4r
  FROM customer GROUP BY c_mktsegment
), g AS (
  SELECT c_mktsegment, n,
         (m3r - 3 * m1 * m2r + 2 * pow(m1, 3))
           / pow(m2r - m1 * m1, 1.5) AS g1,
         (m4r - 4 * m1 * m3r + 6 * m1 * m1 * m2r - 3 * pow(m1, 4))
           / pow(m2r - m1 * m1, 2) - 3 AS g2
  FROM s
)
SELECT c_mktsegment, n,
       round(g1, 5) AS skew,
       round(g2, 5) AS excess_kurtosis,
       round((g1 * g1 + 1)
             / (g2 + 3.0 * pow(n - 1, 2) / ((n - 2) * (n - 3))), 5)
         AS bimodality_coef,
       (g1 * g1 + 1)
       / (g2 + 3.0 * pow(n - 1, 2) / ((n - 2) * (n - 3))) > 5.0 / 9
         AS mixture_suspect
FROM g ORDER BY c_mktsegment
""",
)
def agg_bimodality_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    x = F.col("c_acctbal")
    s = cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(x).alias("m1"),
        F.avg(x * x).alias("m2r"),
        F.avg(F.pow(x, F.lit(3))).alias("m3r"),
        F.avg(F.pow(x, F.lit(4))).alias("m4r"),
    )
    m1, m2r, m3r, m4r = F.col("m1"), F.col("m2r"), F.col("m3r"), F.col("m4r")
    var = m2r - m1 * m1
    g1 = (m3r - 3 * m1 * m2r + 2 * F.pow(m1, F.lit(3))) / F.pow(var, F.lit(1.5))
    g2 = (
        m4r - 4 * m1 * m3r + 6 * m1 * m1 * m2r - 3 * F.pow(m1, F.lit(4))
    ) / F.pow(var, F.lit(2)) - 3
    n = F.col("n")
    bc = (g1 * g1 + 1) / (
        g2 + 3.0 * F.pow(n - 1, F.lit(2)) / ((n - 2) * (n - 3))
    )
    return (
        s.select(
            "c_mktsegment",
            "n",
            F.round(g1, 5).alias("skew"),
            F.round(g2, 5).alias("excess_kurtosis"),
            F.round(bc, 5).alias("bimodality_coef"),
            (bc > 5.0 / 9).alias("mixture_suspect"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# W5 ext: two-level Haar wavelet decomposition of the daily series
# ---------------------------------------------------------------------------


@register(
    "events_haar_wavelet_levels",
    doc="Two-level Haar multiresolution analysis of the first 64 days of "
    "event counts: level-1 pairs (t//2) split into approximation "
    "(pair mean) and detail (half-difference), level-2 repeats on the "
    "approximations — energy per band plus the Parseval check that "
    "approximation+detail energy reproduces the signal energy exactly "
    "(×2 per level for the unnormalized transform).  Dyadic grouping "
    "keys make every level one tiny aggregate; the multiresolution "
    "screen behind events_spectral_period_scan's single-frequency "
    "view.",
    tags=("events", "timeseries", "ext"),
    oracle="""
WITH d AS (
  SELECT row_number() OVER (ORDER BY date_trunc('day', ts)) - 1 AS t,
         count(*) * 1.0 AS y
  FROM events GROUP BY date_trunc('day', ts)
  QUALIFY t < 64
), l1 AS (
  SELECT t // 2 AS p,
         avg(y) AS a1,
         (max(CASE WHEN t % 2 = 0 THEN y END)
          - max(CASE WHEN t % 2 = 1 THEN y END)) / 2 AS d1
  FROM d GROUP BY t // 2
), l2 AS (
  SELECT p // 2 AS q,
         avg(a1) AS a2,
         (max(CASE WHEN p % 2 = 0 THEN a1 END)
          - max(CASE WHEN p % 2 = 1 THEN a1 END)) / 2 AS d2
  FROM l1 GROUP BY p // 2
)
SELECT (SELECT count(*) FROM d) AS n_samples,
       round((SELECT sum(y * y) FROM d), 2) AS signal_energy,
       round((SELECT sum(d1 * d1) FROM l1), 2) AS detail1_energy,
       round((SELECT sum(d2 * d2) FROM l2), 2) AS detail2_energy,
       round((SELECT sum(a2 * a2) FROM l2), 2) AS approx2_energy,
       round((SELECT 4 * sum(a2 * a2) + 4 * sum(d2 * d2) FROM l2)
             + (SELECT 2 * sum(d1 * d1) FROM l1), 2) AS reconstructed_energy
""",
)
def events_haar_wavelet_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .select(
            (F.row_number().over(Window.orderBy("day")) - 1).alias("t"), "y"
        )
        .filter(F.col("t") < 64)
    )
    l1 = d.groupBy((F.col("t") / 2).cast("bigint").alias("p")).agg(
        F.avg("y").alias("a1"),
        (
            (
                F.max(F.when(F.col("t") % 2 == 0, F.col("y")))
                - F.max(F.when(F.col("t") % 2 == 1, F.col("y")))
            )
            / 2
        ).alias("d1"),
    )
    l2 = l1.groupBy((F.col("p") / 2).cast("bigint").alias("q")).agg(
        F.avg("a1").alias("a2"),
        (
            (
                F.max(F.when(F.col("p") % 2 == 0, F.col("a1")))
                - F.max(F.when(F.col("p") % 2 == 1, F.col("a1")))
            )
            / 2
        ).alias("d2"),
    )
    sig = d.agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.round(F.sum(F.col("y") * F.col("y")), 2).alias("signal_energy"),
    )
    e1 = l1.agg(
        F.round(F.sum(F.col("d1") * F.col("d1")), 2).alias("detail1_energy"),
        F.sum(F.col("d1") * F.col("d1")).alias("_d1raw"),
    )
    e2 = l2.agg(
        F.round(F.sum(F.col("d2") * F.col("d2")), 2).alias("detail2_energy"),
        F.round(F.sum(F.col("a2") * F.col("a2")), 2).alias("approx2_energy"),
        F.sum(F.col("a2") * F.col("a2")).alias("_a2raw"),
        F.sum(F.col("d2") * F.col("d2")).alias("_d2raw"),
    )
    return (
        sig.crossJoin(F.broadcast(e1))
        .crossJoin(F.broadcast(e2))
        .select(
            "n_samples",
            "signal_energy",
            "detail1_energy",
            "detail2_energy",
            "approx2_energy",
            F.round(
                4 * F.col("_a2raw") + 4 * F.col("_d2raw") + 2 * F.col("_d1raw"),
                2,
            ).alias("reconstructed_energy"),
        )
    )


# ---------------------------------------------------------------------------
# text ext: RAKE-style keyword scoring (degree/frequency)
# ---------------------------------------------------------------------------


@register(
    "text_rake_keywords",
    doc="Keyword extraction à la RAKE, distilled to its word graph: "
    "within-document adjacent word pairs (stopwords break candidate "
    "phrases) build a co-occurrence degree per word, the RAKE score "
    "deg(w)/freq(w) rewards words that appear inside long content "
    "phrases, and the corpus-level top-15 keywords fall out of one "
    "ranking.  Explodes + aggregates only; the stopword list is the "
    "same broadcast dictionary the quality gates use.",
    tags=("text", "keywords", "ext"),
    oracle=_RAKE_ORACLE,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..operators import textstats as ts

    docs = load_table(spark, sf_dir, "documents")
    stop_arr = F.array(*[F.lit(s) for s in ts.STOPWORDS])
    toks = docs.select(
        "doc_id", F.posexplode(ts.tokens(F.col("text"))).alias("pos", "w")
    ).withColumn("is_stop", F.array_contains(stop_arr, F.col("w")))
    nxt = toks.select(
        "doc_id",
        "pos",
        "w",
        "is_stop",
        F.lead("w").over(Window.partitionBy("doc_id").orderBy("pos")).alias("w2"),
        F.lead("is_stop")
        .over(Window.partitionBy("doc_id").orderBy("pos"))
        .alias("stop2"),
    )
    content = toks.filter(~F.col("is_stop"))
    freq = content.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    adj = (
        nxt.filter(~F.col("is_stop") & ~F.coalesce(F.col("stop2"), F.lit(True)))
        .select("w", "w2")
    )
    deg_out = adj.groupBy("w").agg(F.count(F.lit(1)).alias("dout"))
    deg_in = adj.groupBy(F.col("w2").alias("w")).agg(
        F.count(F.lit(1)).alias("din")
    )
    scored = (
        freq.join(deg_out, "w", "left")
        .join(deg_in, "w", "left")
        .select(
            "w",
            "freq",
            (
                F.col("freq")
                + F.coalesce(F.col("dout"), F.lit(0))
                + F.coalesce(F.col("din"), F.lit(0))
            ).alias("degree"),
        )
        .withColumn(
            "rake_score",
            F.round(F.col("degree") / F.col("freq"), 6),
        )
    )
    return (
        scored.filter(F.col("freq") >= 5)
        .orderBy(F.desc("rake_score"), F.desc("freq"), "w")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# events ext: compact per-entity time-series feature vector (tsfresh-lite)
# ---------------------------------------------------------------------------


@register(
    "events_ts_feature_vector",
    doc="Per-user time-series feature extraction in one pass over the "
    "event stream: count, value mean/std, daily trend slope "
    "(regr_slope against the day index), lag-free burstiness (gap CV) "
    "and active-day span — the compact tsfresh-style vector a "
    "downstream model consumes instead of raw events.  Every feature "
    "is a decomposable aggregate or a lag window inside the same "
    "user partition; top-5 busiest users shown.",
    tags=("events", "features", "ext"),
    oracle="""
WITH g AS (
  SELECT user_id, ts, value,
         date_diff('second',
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS gap_s,
         date_diff('day', (SELECT min(ts) FROM events), ts) AS day_idx
  FROM events
)
SELECT user_id,
       count(*) AS n_events,
       round(avg(value), 4) AS value_mean,
       round(stddev_samp(value), 4) AS value_std,
       round(regr_slope(value, day_idx), 6) AS value_trend,
       round(stddev_samp(gap_s) / avg(gap_s), 6) AS gap_cv,
       count(DISTINCT day_idx) AS active_days
FROM g GROUP BY user_id
ORDER BY n_events DESC, user_id LIMIT 5
""",
)
def events_ts_feature_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.min("ts").alias("t0"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        "value",
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).alias(
            "gap_s"
        ),
        F.datediff("ts", "t0").alias("day_idx"),
    )
    return (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 4).alias("value_mean"),
            F.round(F.stddev_samp("value"), 4).alias("value_std"),
            F.round(F.regr_slope(F.col("value"), F.col("day_idx")), 6).alias(
                "value_trend"
            ),
            F.round(F.stddev_samp("gap_s") / F.avg("gap_s"), 6).alias("gap_cv"),
            F.countDistinct("day_idx").alias("active_days"),
        )
        .orderBy(F.desc("n_events"), "user_id")
        .limit(5)
    )


# ---------------------------------------------------------------------------
# J5 ext: the NOT IN null trap, demonstrated and locked
# ---------------------------------------------------------------------------


@register(
    "join_notin_null_trap",
    doc="The classic three-valued-logic footgun, locked as a semantic "
    "contract: customers 'without orders' via NOT IN collapses to "
    "ZERO rows the moment the subquery contains a single NULL key "
    "(x <> NULL is UNKNOWN for every x), while NOT EXISTS / anti-join "
    "gives the intended answer.  One injected-NULL subquery, both "
    "formulations counted side by side — identical on both engines "
    "because the trap is ANSI semantics, not an implementation "
    "choice.  Teams migrating the reference's Python set-difference "
    "(dump2csv manifest logic) hit exactly this.",
    tags=("join", "semantics", "ext"),
    oracle="""
WITH keys AS (
  SELECT CASE WHEN o_orderkey % 5000 = 0 THEN NULL
              ELSE o_custkey END AS k
  FROM orders
)
SELECT (SELECT count(*) FROM customer
        WHERE c_custkey NOT IN (SELECT k FROM keys)) AS n_not_in,
       (SELECT count(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM keys WHERE keys.k = c.c_custkey))
         AS n_not_exists,
       (SELECT count(*) FROM keys WHERE k IS NULL) > 0 AS subquery_has_null
""",
)
def join_notin_null_trap(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    keys = orders.select(
        F.when(F.col("o_orderkey") % 5000 == 0, F.lit(None))
        .otherwise(F.col("o_custkey"))
        .alias("k")
    )
    cust.createOrReplaceTempView("ninc_customer_v")
    keys.createOrReplaceTempView("ninc_keys_v")
    spark = cust.sparkSession
    not_in = spark.sql(
        "SELECT count(*) AS n_not_in FROM ninc_customer_v "
        "WHERE c_custkey NOT IN (SELECT k FROM ninc_keys_v)"
    )
    not_exists = cust.join(
        keys, cust.c_custkey == keys.k, "left_anti"
    ).agg(F.count(F.lit(1)).alias("n_not_exists"))
    has_null = keys.agg(
        (F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)) > 0).alias(
            "subquery_has_null"
        )
    )
    return (
        not_in.crossJoin(F.broadcast(not_exists))
        .crossJoin(F.broadcast(has_null))
    )


# ---------------------------------------------------------------------------
# A6 ext: Bradley-Terry pairwise-comparison strengths (3 MM iterations)
# ---------------------------------------------------------------------------


@register(
    "agg_bradley_terry_iterations",
    doc="Bradley-Terry ranking from pairwise contests: within each order, "
    "the higher-unit-price brand of a pair 'wins'; three unrolled "
    "minorize-maximize updates π ← W / Σ n_ab/(π_a+π_b) over the "
    "≤300-cell pair matrix (each step one broadcast join + two tiny "
    "aggregates, the same bounded-iteration pattern as the Markov and "
    "k-means steps) recover latent brand strengths from nothing but "
    "comparisons.  Top-5 strengths, normalized to mean 1.",
    tags=("agg", "ranking", "ext"),
    oracle="""
-- unit_price is quantized to exact cents (floor(avg*100+0.5), same IEEE
-- ops both sides): duels compare COMPUTED doubles, and at sf1 group
-- counts the engine's vs oracle's summation order flips a >-comparison
-- on ulp-close averages, changing a duel outcome and the 6th strength
-- decimal.  li2/pairs are MATERIALIZED so DuckDB doesn't re-execute the
-- 6M-row join per iteration CTE reference.
WITH li2 AS MATERIALIZED (
  SELECT l_orderkey, p_brand,
         CAST(floor(avg(l_extendedprice / l_quantity) * 100 + 0.5)
              AS BIGINT) AS unit_price
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY l_orderkey, p_brand
), duel AS (
  SELECT CASE WHEN a.unit_price > b.unit_price THEN a.p_brand
              ELSE b.p_brand END AS winner,
         CASE WHEN a.unit_price > b.unit_price THEN b.p_brand
              ELSE a.p_brand END AS loser
  FROM li2 a JOIN li2 b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  WHERE a.unit_price <> b.unit_price
), pairs AS MATERIALIZED (
  SELECT least(winner, loser) AS x, greatest(winner, loser) AS y,
         count(*) AS n_xy,
         sum(CASE WHEN winner = least(winner, loser) THEN 1 ELSE 0 END)
           AS wins_x
  FROM duel GROUP BY 1, 2
), wins AS (
  SELECT brand, sum(w) AS w FROM (
    SELECT x AS brand, wins_x AS w FROM pairs
    UNION ALL SELECT y, n_xy - wins_x FROM pairs
  ) GROUP BY brand
), pi0 AS (SELECT brand, 1.0 AS pi FROM wins),
it1 AS (
  SELECT w.brand, w.w / sum(p.n_xy / (pa.pi + pb.pi)) AS pi
  FROM wins w
  JOIN (SELECT x AS brand, y AS other, n_xy FROM pairs
        UNION ALL SELECT y, x, n_xy FROM pairs) p ON p.brand = w.brand
  JOIN pi0 pa ON pa.brand = p.brand
  JOIN pi0 pb ON pb.brand = p.other
  GROUP BY w.brand, w.w
), it2 AS (
  SELECT w.brand, w.w / sum(p.n_xy / (pa.pi + pb.pi)) AS pi
  FROM wins w
  JOIN (SELECT x AS brand, y AS other, n_xy FROM pairs
        UNION ALL SELECT y, x, n_xy FROM pairs) p ON p.brand = w.brand
  JOIN it1 pa ON pa.brand = p.brand
  JOIN it1 pb ON pb.brand = p.other
  GROUP BY w.brand, w.w
), it3 AS (
  SELECT w.brand, w.w / sum(p.n_xy / (pa.pi + pb.pi)) AS pi
  FROM wins w
  JOIN (SELECT x AS brand, y AS other, n_xy FROM pairs
        UNION ALL SELECT y, x, n_xy FROM pairs) p ON p.brand = w.brand
  JOIN it2 pa ON pa.brand = p.brand
  JOIN it2 pb ON pb.brand = p.other
  GROUP BY w.brand, w.w
)
SELECT brand, round(pi / (SELECT avg(pi) FROM it3), 6) AS strength
FROM it3 ORDER BY strength DESC, brand LIMIT 5
""",
)
def agg_bradley_terry_iterations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    li2 = (
        li.join(part, part.p_partkey == li.l_partkey)
        .groupBy("l_orderkey", "p_brand")
        # exact-cents quantization — duel outcomes must not hinge on the
        # ulp of a double average (see oracle comment)
        .agg(
            F.floor(
                F.avg(F.col("l_extendedprice") / F.col("l_quantity")) * 100 + 0.5
            ).alias("up")
        )
    )
    a, b = li2.alias("a"), li2.alias("b")
    duel = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .filter(F.col("a.up") != F.col("b.up"))
        .select(
            F.when(F.col("a.up") > F.col("b.up"), F.col("a.p_brand"))
            .otherwise(F.col("b.p_brand"))
            .alias("winner"),
            F.when(F.col("a.up") > F.col("b.up"), F.col("b.p_brand"))
            .otherwise(F.col("a.p_brand"))
            .alias("loser"),
        )
    )
    x = F.least("winner", "loser")
    y = F.greatest("winner", "loser")
    pairs = duel.groupBy(x.alias("x"), y.alias("y")).agg(
        F.count(F.lit(1)).alias("n_xy"),
        F.sum(
            F.when(F.col("winner") == F.least("winner", "loser"), 1).otherwise(0)
        ).alias("wins_x"),
    )
    wins = (
        pairs.select(F.col("x").alias("brand"), F.col("wins_x").alias("w"))
        .unionAll(
            pairs.select(
                F.col("y").alias("brand"),
                (F.col("n_xy") - F.col("wins_x")).alias("w"),
            )
        )
        .groupBy("brand")
        .agg(F.sum("w").alias("w"))
    )
    sym = pairs.select(
        F.col("x").alias("brand"), F.col("y").alias("other"), "n_xy"
    ).unionAll(
        pairs.select(
            F.col("y").alias("brand"), F.col("x").alias("other"), "n_xy"
        )
    )
    pi = wins.select("brand", F.lit(1.0).alias("pi"))
    for _ in range(3):
        pa = F.broadcast(pi.select(F.col("brand").alias("pa_b"), F.col("pi").alias("pa")))
        pb = F.broadcast(pi.select(F.col("brand").alias("pb_b"), F.col("pi").alias("pb")))
        pi = (
            wins.join(sym, "brand")
            .join(pa, F.col("brand") == F.col("pa_b"))
            .join(pb, F.col("other") == F.col("pb_b"))
            .groupBy("brand")
            .agg(
                (
                    F.any_value("w")
                    / F.sum(F.col("n_xy") / (F.col("pa") + F.col("pb")))
                ).alias("pi")
            )
        )
    mean_pi = pi.agg(F.avg("pi").alias("mean_pi"))
    return (
        pi.crossJoin(F.broadcast(mean_pi))
        .select("brand", F.round(F.col("pi") / F.col("mean_pi"), 6).alias("strength"))
        .orderBy(F.desc("strength"), "brand")
        .limit(5)
    )


# ---------------------------------------------------------------------------
# A6 ext: Kruskal-Wallis rank test across k groups
# ---------------------------------------------------------------------------


@register(
    "agg_kruskal_wallis",
    doc="Kruskal-Wallis H test of order value across the five priorities "
    "— the k-sample nonparametric that completes the family next to "
    "Mann-Whitney (2 samples) and Friedman (blocked): global midranks "
    "from one RANGE window over cent-rounded values, rank sums per "
    "group, H = 12/(N(N+1))·ΣR_j²/n_j − 3(N+1) with the standard tie "
    "correction from a per-value tie census.  One sort-window pass "
    "plus two tiny aggregates.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH v AS (
  SELECT o_orderpriority AS grp, round(o_totalprice, 2) AS x FROM orders
), r AS (
  SELECT grp, x,
         (rank() OVER (ORDER BY x)
          + (count(*) OVER (PARTITION BY x) - 1) / 2.0) AS midrank
  FROM v
), gs AS (
  SELECT grp, count(*) AS n, sum(midrank) AS rsum FROM r GROUP BY grp
), ties AS (
  SELECT sum(c * c * c - c) AS tie_term, sum(c) AS n_total FROM (
    SELECT count(*) AS c FROM v GROUP BY x
  )
), h AS (
  SELECT (12.0 / (t.n_total * (t.n_total + 1))
          * (SELECT sum(rsum * rsum / n) FROM gs)
          - 3 * (t.n_total + 1))
         / (1 - t.tie_term * 1.0 / (pow(t.n_total, 3) - t.n_total)) AS h_stat,
         (SELECT count(*) FROM gs) - 1 AS dof
  FROM ties t
)
SELECT round(h_stat, 4) AS h_stat, dof, h_stat > 9.488 AS reject_at_05
FROM h
""",
)
def agg_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    v = orders.select(
        F.col("o_orderpriority").alias("grp"),
        F.round("o_totalprice", 2).alias("x"),
    )
    r = v.select(
        "grp",
        (
            F.rank().over(Window.orderBy("x"))
            + (F.count(F.lit(1)).over(Window.partitionBy("x")) - 1) / 2.0
        ).alias("midrank"),
    )
    gs = r.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("midrank").alias("rsum")
    )
    ties = v.groupBy("x").agg(F.count(F.lit(1)).alias("c")).agg(
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c")).alias(
            "tie_term"
        ),
        F.sum("c").alias("n_total"),
    )
    srs = gs.agg(
        F.sum(F.col("rsum") * F.col("rsum") / F.col("n")).alias("srs"),
        F.count(F.lit(1)).alias("k"),
    )
    j = ties.crossJoin(F.broadcast(srs))
    n_tot = F.col("n_total")
    h_stat = (
        12.0 / (n_tot * (n_tot + 1)) * F.col("srs") - 3 * (n_tot + 1)
    ) / (1 - F.col("tie_term") / (F.pow(n_tot, F.lit(3)) - n_tot))
    return j.select(
        F.round(h_stat, 4).alias("h_stat"),
        (F.col("k") - 1).alias("dof"),
        (h_stat > 9.488).alias("reject_at_05"),
    )


# ---------------------------------------------------------------------------
# A6 ext: Brown-Forsythe variance-equality test
# ---------------------------------------------------------------------------


@register(
    "agg_brown_forsythe",
    doc="Brown-Forsythe homogeneity-of-variance test (Levene with the "
    "median center): per-priority rank-based medians of order value, "
    "absolute deviations from them, then one-way ANOVA F over those "
    "deviations — the precondition check for agg_anova_f_oneway's "
    "equal-variance assumption, built entirely from the same "
    "rank-quantile and moment machinery.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH v AS (
  SELECT o_orderpriority AS grp, round(o_totalprice, 2) AS x FROM orders
), med AS (
  SELECT grp, x AS m FROM (
    SELECT grp, x,
           row_number() OVER (PARTITION BY grp ORDER BY x) AS rn,
           count(*) OVER (PARTITION BY grp) AS cnt
    FROM v
  ) WHERE rn = CAST(ceil(0.5 * cnt) AS BIGINT)
), dev AS (
  SELECT v.grp, abs(v.x - med.m) AS z
  FROM v JOIN med ON med.grp = v.grp
), g AS (
  SELECT grp, count(*) AS n, avg(z) AS mz, var_samp(z) AS vz
  FROM dev GROUP BY grp
), t AS (
  SELECT count(*) AS k, sum(n) AS n_total,
         sum(n * mz) / sum(n) AS grand, sum((n - 1) * vz) AS ssw
  FROM g
), b AS (
  SELECT sum(n * pow(mz - (SELECT grand FROM t), 2)) AS ssb FROM g
)
SELECT t.k, t.n_total,
       round(b.ssb / (t.k - 1) / (t.ssw / (t.n_total - t.k)), 4) AS f_stat,
       b.ssb / (t.k - 1) / (t.ssw / (t.n_total - t.k)) > 2.372
         AS variances_differ
FROM t, b
""",
)
def agg_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    v = orders.select(
        F.col("o_orderpriority").alias("grp"),
        F.round("o_totalprice", 2).alias("x"),
    )
    med = (
        v.select(
            "grp",
            "x",
            F.row_number()
            .over(Window.partitionBy("grp").orderBy("x"))
            .alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("grp")).alias("cnt"),
        )
        .filter(F.col("rn") == F.ceil(0.5 * F.col("cnt")).cast("bigint"))
        .select("grp", F.col("x").alias("m"))
    )
    dev = v.join(F.broadcast(med), "grp").select(
        "grp", F.abs(F.col("x") - F.col("m")).alias("z")
    )
    g = dev.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("z").alias("mz"),
        F.var_samp("z").alias("vz"),
    )
    t = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("n_total"),
        (F.sum(F.col("n") * F.col("mz")) / F.sum("n")).alias("grand"),
        F.sum((F.col("n") - 1) * F.col("vz")).alias("ssw"),
    )
    b = (
        g.crossJoin(F.broadcast(t.select("grand")))
        .agg(
            F.sum(
                F.col("n") * F.pow(F.col("mz") - F.col("grand"), F.lit(2))
            ).alias("ssb")
        )
    )
    f_stat = (F.col("ssb") / (F.col("k") - 1)) / (
        F.col("ssw") / (F.col("n_total") - F.col("k"))
    )
    return (
        t.crossJoin(F.broadcast(b))
        .select(
            "k",
            "n_total",
            F.round(f_stat, 4).alias("f_stat"),
            (f_stat > 2.372).alias("variances_differ"),
        )
    )


_ABLATION_ORACLE = f"""
WITH d AS (
  SELECT n_chars, {_NORM} AS norm FROM documents
), t AS (
  SELECT n_chars, string_split(norm, ' ') AS toks FROM d
), m AS (
  SELECT CASE WHEN n_chars >= 100 AND n_chars <= 1500 THEN 1 ELSE 0 END
           AS g_len,
         CASE WHEN len(list_filter(toks, x -> list_contains({_STOP_SQL}, x)))
                   / len(toks) >= 0.05 THEN 1 ELSE 0 END AS g_lang,
         CASE WHEN len(list_distinct(toks)) * 1.0 / len(toks) >= 0.5
              THEN 1 ELSE 0 END AS g_rep
  FROM t
)
SELECT g_len, g_lang, g_rep, count(*) AS n_docs
FROM m GROUP BY 1, 2, 3 ORDER BY g_len, g_lang, g_rep
"""


# ---------------------------------------------------------------------------
# corpus ext: quality-filter ablation grid (all 8 gate combinations)
# ---------------------------------------------------------------------------


@register(
    "corpus_filter_ablation_grid",
    doc="Ablation analysis of three corpus gates — length band, English "
    "lang-ID, low-repetition (distinct-token ratio) — evaluated as all "
    "8 on/off combinations in ONE pass: each document computes its "
    "3-bit pass mask once, the grid is a GROUPING SETS-free bitmask "
    "group-by, and survivors per combination show which gates bite "
    "and which overlap.  The ablation table a data-quality review "
    "actually reads, at one scan instead of 8.",
    tags=("corpus", "quality", "ext"),
    oracle=_ABLATION_ORACLE,
)
def corpus_filter_ablation_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import textstats as ts

    docs = load_table(spark, sf_dir, "documents")
    toks = ts.tokens(F.col("text"))
    len_ok = (F.col("n_chars") >= 100) & (F.col("n_chars") <= 1500)
    lang_ok = ts.lang_id(F.col("text")) == "en"
    rep_ok = F.size(F.array_distinct(toks)) / F.size(toks) >= 0.5
    m = docs.select(
        len_ok.cast("int").alias("g_len"),
        lang_ok.cast("int").alias("g_lang"),
        rep_ok.cast("int").alias("g_rep"),
    )
    return (
        m.groupBy("g_len", "g_lang", "g_rep")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("g_len", "g_lang", "g_rep")
    )


# ---------------------------------------------------------------------------
# graph ext: modularity of a given two-community partition
# ---------------------------------------------------------------------------


@register(
    "graph_modularity_partition",
    doc="Newman modularity Q of a candidate split of the part co-purchase "
    "graph (community = p_size parity, a deliberately weak partition): "
    "Q = Σ_c (e_c/m − (d_c/2m)²) from three tiny aggregates over the "
    "edge list and degree relation — the objective every community-"
    "detection loop (label propagation, Louvain steps) evaluates; Q≈0 "
    "certifies the parity split carries no structure.",
    tags=("graph", "join", "ext"),
    oracle="""
WITH edges AS (
  SELECT DISTINCT s1.l_partkey AS a, s2.l_partkey AS b
  FROM lineitem s1 JOIN lineitem s2
    ON s1.l_orderkey = s2.l_orderkey AND s1.l_partkey < s2.l_partkey
), comm AS (
  SELECT p_partkey AS v, p_size % 2 AS c FROM part
), m AS (SELECT count(*) AS m_edges FROM edges),
within AS (
  SELECT ca.c, count(*) AS e_c
  FROM edges e JOIN comm ca ON ca.v = e.a JOIN comm cb ON cb.v = e.b
  WHERE ca.c = cb.c GROUP BY ca.c
), deg AS (
  SELECT c, sum(d) AS d_c FROM (
    SELECT v, count(*) AS d FROM (
      SELECT a AS v FROM edges UNION ALL SELECT b FROM edges
    ) GROUP BY v
  ) dv JOIN comm ON comm.v = dv.v GROUP BY c
)
SELECT (SELECT m_edges FROM m) AS n_edges,
       round(sum(coalesce(w.e_c, 0) * 1.0 / mm.m_edges
                 - pow(d.d_c / (2.0 * mm.m_edges), 2)), 6) AS modularity_q
FROM deg d
LEFT JOIN within w ON w.c = d.c
CROSS JOIN m mm
""",
)
def graph_modularity_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("v"), (F.col("p_size") % 2).alias("c")
    )
    s1 = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("a"))
    s2 = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("b"))
    edges = (
        s1.join(s2, "ok").where(F.col("a") < F.col("b")).select("a", "b").distinct()
    )
    m = edges.agg(F.count(F.lit(1)).alias("m_edges"))
    ca = F.broadcast(part.select(F.col("v").alias("a"), F.col("c").alias("c_a")))
    cb = F.broadcast(part.select(F.col("v").alias("b"), F.col("c").alias("c_b")))
    within = (
        edges.join(ca, "a")
        .join(cb, "b")
        .filter(F.col("c_a") == F.col("c_b"))
        .groupBy(F.col("c_a").alias("c"))
        .agg(F.count(F.lit(1)).alias("e_c"))
    )
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
        .join(F.broadcast(part), "v")
        .groupBy("c")
        .agg(F.sum("d").alias("d_c"))
    )
    q = (
        deg.join(within, "c", "left")
        .crossJoin(F.broadcast(m))
        .agg(
            F.any_value("m_edges").alias("n_edges"),
            F.round(
                F.sum(
                    F.coalesce(F.col("e_c"), F.lit(0)) / F.col("m_edges")
                    - F.pow(
                        F.col("d_c") / (2.0 * F.col("m_edges")), F.lit(2)
                    )
                ),
                6,
            ).alias("modularity_q"),
        )
    )
    return q


# ---------------------------------------------------------------------------
# A6 ext: Cohen's h effect size for two proportions
# ---------------------------------------------------------------------------


@register(
    "agg_cohens_h_proportions",
    doc="Cohen's h — the arcsine-stabilized effect size for the urgent-"
    "order proportion contrast between BUILDING and MACHINERY "
    "customers: h = 2·asin(√p1) − 2·asin(√p2), the magnitude companion "
    "to agg_two_proportion_ztest exactly as Cohen's d accompanies the "
    "t-test.  One conditional aggregate pass, closed form.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH f AS (
  SELECT any_value(c.c_mktsegment) AS seg,
         max(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS y
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
  GROUP BY c.c_custkey
), s AS (
  SELECT avg(CASE WHEN seg = 'BUILDING' THEN y * 1.0 END) AS p1,
         count(CASE WHEN seg = 'BUILDING' THEN 1 END) AS n1,
         avg(CASE WHEN seg = 'MACHINERY' THEN y * 1.0 END) AS p2,
         count(CASE WHEN seg = 'MACHINERY' THEN 1 END) AS n2
  FROM f
)
SELECT n1, n2,
       round(p1, 6) AS p_building,
       round(p2, 6) AS p_machinery,
       round(2 * asin(sqrt(p1)) - 2 * asin(sqrt(p2)), 6) AS cohens_h,
       abs(2 * asin(sqrt(p1)) - 2 * asin(sqrt(p2))) < 0.2 AS negligible
FROM s
""",
)
def agg_cohens_h_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    f = (
        cust.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.any_value("c_mktsegment").alias("seg"),
            F.max(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("y"),
        )
    )
    s = f.agg(
        F.avg(F.when(F.col("seg") == "BUILDING", F.col("y").cast("double"))).alias(
            "p1"
        ),
        F.count(F.when(F.col("seg") == "BUILDING", 1)).alias("n1"),
        F.avg(
            F.when(F.col("seg") == "MACHINERY", F.col("y").cast("double"))
        ).alias("p2"),
        F.count(F.when(F.col("seg") == "MACHINERY", 1)).alias("n2"),
    )
    h = 2 * F.asin(F.sqrt(F.col("p1"))) - 2 * F.asin(F.sqrt(F.col("p2")))
    return s.select(
        "n1",
        "n2",
        F.round("p1", 6).alias("p_building"),
        F.round("p2", 6).alias("p_machinery"),
        F.round(h, 6).alias("cohens_h"),
        (F.abs(h) < 0.2).alias("negligible"),
    )


# ---------------------------------------------------------------------------
# A6 ext: Simpson diversity / inverse Simpson / Pielou evenness
# ---------------------------------------------------------------------------


@register(
    "agg_diversity_simpson_evenness",
    doc="Ecology-style diversity suite for the brand mix per region: "
    "Simpson's index 1−Σp² (probability two random lines differ in "
    "brand), inverse Simpson (effective number of brands), and Pielou "
    "evenness H/ln(richness) — the HHI/entropy family completed with "
    "the effective-species view.  Brand cells fold in one pass per "
    "region; the diversity math runs on ≤25 cells per group.",
    tags=("agg", "diversity", "ext"),
    oracle="""
WITH cells AS (
  SELECT r.r_name AS region, p.p_brand, count(*) AS n
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation na ON na.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = na.n_regionkey
  GROUP BY 1, 2
), p AS (
  SELECT region, n * 1.0 / sum(n) OVER (PARTITION BY region) AS pr
  FROM cells
)
SELECT region,
       count(*) AS richness,
       round(1 - sum(pr * pr), 6) AS simpson_diversity,
       round(1 / sum(pr * pr), 4) AS effective_brands,
       round(-sum(pr * ln(pr)) / ln(count(*)), 6) AS pielou_evenness
FROM p GROUP BY region ORDER BY region
""",
)
def agg_diversity_simpson_evenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    reg = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    cells = (
        li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
        .join(F.broadcast(supp), supp.s_suppkey == li.l_suppkey)
        .join(F.broadcast(nat), nat.n_nationkey == supp.s_nationkey)
        .join(F.broadcast(reg), reg.r_regionkey == nat.n_regionkey)
        .groupBy(F.col("r_name").alias("region"), "p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    p = cells.select(
        "region",
        (F.col("n") / F.sum("n").over(Window.partitionBy("region"))).alias("pr"),
    )
    return (
        p.groupBy("region")
        .agg(
            F.count(F.lit(1)).alias("richness"),
            F.round(1 - F.sum(F.col("pr") * F.col("pr")), 6).alias(
                "simpson_diversity"
            ),
            F.round(1 / F.sum(F.col("pr") * F.col("pr")), 4).alias(
                "effective_brands"
            ),
            F.round(
                -F.sum(F.col("pr") * F.log("pr")) / F.log(F.count(F.lit(1))), 6
            ).alias("pielou_evenness"),
        )
        .orderBy("region")
    )


# ---------------------------------------------------------------------------
# J5 ext: sequential basket pairs (brand A this order → brand B next)
# ---------------------------------------------------------------------------


@register(
    "basket_sequential_pairs",
    doc="Sequential-pattern mining one level up from co-occurrence "
    "(basket_brand_pair_lift is WITHIN an order): which brand follows "
    "which across a customer's CONSECUTIVE orders — the order sequence "
    "comes from one lead window per customer, the two baskets join on "
    "the (order, next-order) edge, and directed (prev → next) brand "
    "pair supports fall out of one aggregate.  Top-10 sequential "
    "pairs with their reverse-direction count for asymmetry reading.",
    tags=("join", "mining", "sequence", "ext"),
    oracle="""
WITH ob AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON p_partkey = l_partkey
), seq AS (
  SELECT o_orderkey,
         lead(o_orderkey) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS next_key
  FROM orders
), pairs AS MATERIALIZED (
  -- MATERIALIZED is load-bearing: without it DuckDB inlines the CTE
  -- twice and pushes the outer brand_prev <> brand_next filter below
  -- the aggregation, where the join-order optimizer turns it into a
  -- NESTED_LOOP_JOIN between the two multi-million-row pre-agg inputs
  -- (>10 min at sf1 vs 0.7 s materialized; surfaced by the sf1 sweep)
  SELECT a.p_brand AS brand_prev, b.p_brand AS brand_next,
         count(*) AS n_transitions
  FROM seq
  JOIN ob a ON a.l_orderkey = seq.o_orderkey
  JOIN ob b ON b.l_orderkey = seq.next_key
  GROUP BY 1, 2
)
SELECT p.brand_prev, p.brand_next, p.n_transitions,
       coalesce(r.n_transitions, 0) AS n_reverse
FROM pairs p
LEFT JOIN pairs r
  ON r.brand_prev = p.brand_next AND r.brand_next = p.brand_prev
WHERE p.brand_prev <> p.brand_next
ORDER BY p.n_transitions DESC, p.brand_prev, p.brand_next
LIMIT 10
""",
)
def basket_sequential_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    orders = load_table(spark, sf_dir, "orders")
    ob = (
        li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    seq = orders.select(
        "o_orderkey",
        F.lead("o_orderkey")
        .over(
            Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        )
        .alias("next_key"),
    ).filter(F.col("next_key").isNotNull())
    a = ob.select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.col("p_brand").alias("brand_prev"),
    )
    b = ob.select(
        F.col("l_orderkey").alias("next_key"),
        F.col("p_brand").alias("brand_next"),
    )
    pairs = (
        seq.join(a, "o_orderkey")
        .join(b, "next_key")
        .groupBy("brand_prev", "brand_next")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    rev = pairs.select(
        F.col("brand_prev").alias("brand_next"),
        F.col("brand_next").alias("brand_prev"),
        F.col("n_transitions").alias("n_reverse"),
    )
    return (
        pairs.filter(F.col("brand_prev") != F.col("brand_next"))
        .join(F.broadcast(rev), ["brand_prev", "brand_next"], "left")
        .select(
            "brand_prev",
            "brand_next",
            "n_transitions",
            F.coalesce(F.col("n_reverse"), F.lit(0)).alias("n_reverse"),
        )
        .orderBy(F.desc("n_transitions"), "brand_prev", "brand_next")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# W5 ext: rolling beta (frame-decomposed rolling regression)
# ---------------------------------------------------------------------------


@register(
    "window_rolling_beta",
    doc="Rolling 3-month beta of the BUILDING segment's revenue against "
    "total market revenue: the regression slope over a moving frame, "
    "decomposed into four frame AVERAGES "
    "(E[xy]−E[x]E[y])/(E[x²]−E[x]²) so it runs as plain window "
    "aggregates — no per-frame refit, no UDF — over the folded "
    "monthly two-series relation.  The moving-relationship measure "
    "behind window_rolling_correlation, in slope units.",
    tags=("window", "regression", "ext"),
    oracle="""
WITH m AS (
  SELECT date_trunc('month', o.o_orderdate) AS mon,
         round(sum(o.o_totalprice), 2) AS y_all,
         round(sum(CASE WHEN c.c_mktsegment = 'BUILDING'
                        THEN o.o_totalprice ELSE 0 END), 2) AS y_seg
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1
), r AS (
  SELECT mon,
         avg(y_seg * y_all) OVER w AS exy,
         avg(y_seg) OVER w AS ex,
         avg(y_all) OVER w AS ey,
         avg(y_all * y_all) OVER w AS ey2,
         row_number() OVER (ORDER BY mon) AS rn
  FROM m
  WINDOW w AS (ORDER BY mon ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
)
SELECT strftime(mon, '%Y-%m') AS mon,
       round((exy - ex * ey) / (ey2 - ey * ey), 6) AS beta_3m
FROM r WHERE rn >= 3 ORDER BY mon
""",
)
def window_rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    m = (
        orders.join(F.broadcast(cust), cust.c_custkey == orders.o_custkey)
        .groupBy(F.date_trunc("month", "o_orderdate").alias("mon"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("y_all"),
            F.round(
                F.sum(
                    F.when(
                        F.col("c_mktsegment") == "BUILDING",
                        F.col("o_totalprice"),
                    ).otherwise(0.0)
                ),
                2,
            ).alias("y_seg"),
        )
    )
    w = Window.orderBy("mon").rowsBetween(-2, 0)
    r = m.select(
        "mon",
        F.avg(F.col("y_seg") * F.col("y_all")).over(w).alias("exy"),
        F.avg("y_seg").over(w).alias("ex"),
        F.avg("y_all").over(w).alias("ey"),
        F.avg(F.col("y_all") * F.col("y_all")).over(w).alias("ey2"),
        F.row_number().over(Window.orderBy("mon")).alias("rn"),
    )
    beta = (F.col("exy") - F.col("ex") * F.col("ey")) / (
        F.col("ey2") - F.col("ey") * F.col("ey")
    )
    return (
        r.filter(F.col("rn") >= 3)
        .select(
            F.date_format("mon", "yyyy-MM").alias("mon"),
            F.round(beta, 6).alias("beta_3m"),
        )
        .orderBy("mon")
    )


# ---------------------------------------------------------------------------
# A6 ext: indirect standardization (SMR per nation)
# ---------------------------------------------------------------------------


@register(
    "agg_indirect_standardization_smr",
    doc="Indirectly standardized urgent-order ratios: each nation's "
    "expected count applies the GLOBAL per-segment urgent rates to "
    "that nation's segment mix, and SMR = observed/expected reads as "
    "above/below par after composition adjustment — epidemiology's "
    "standardized mortality ratio applied to the confounder the "
    "Mantel-Haenszel entry conditions away.  Global rates are a "
    "5-row broadcast; one customer-grain pass.  Five most-extreme "
    "nations reported.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH f AS (
  SELECT any_value(c.c_nationkey) AS nat, any_value(c.c_mktsegment) AS seg,
         max(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS y
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
), rate AS (
  SELECT seg, avg(y * 1.0) AS r FROM f GROUP BY seg
), cell AS (
  SELECT nat, f.seg, count(*) AS n, sum(y) AS obs FROM f GROUP BY nat, f.seg
), smr AS (
  SELECT nat, sum(obs) AS observed,
         sum(n * rate.r) AS expected
  FROM cell JOIN rate ON rate.seg = cell.seg
  GROUP BY nat
)
SELECT nat AS nationkey, CAST(observed AS BIGINT) AS observed,
       round(expected, 4) AS expected,
       round(observed / expected, 6) AS smr
FROM smr
ORDER BY abs(ln(observed / expected)) DESC, nat LIMIT 5
""",
)
def agg_indirect_standardization_smr(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    f = (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.any_value("c_nationkey").alias("nat"),
            F.any_value("c_mktsegment").alias("seg"),
            F.max(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("y"),
        )
    )
    rate = f.groupBy("seg").agg(F.avg(F.col("y").cast("double")).alias("r"))
    cell = f.groupBy("nat", "seg").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("obs")
    )
    smr = (
        cell.join(F.broadcast(rate), "seg")
        .groupBy("nat")
        .agg(
            F.sum("obs").alias("observed"),
            F.sum(F.col("n") * F.col("r")).alias("expected"),
        )
    )
    ratio = F.col("observed") / F.col("expected")
    return (
        smr.select(
            F.col("nat").alias("nationkey"),
            F.col("observed").cast("bigint").alias("observed"),
            F.round("expected", 4).alias("expected"),
            F.round(ratio, 6).alias("smr"),
            F.abs(F.log(ratio)).alias("_dev"),
        )
        .orderBy(F.desc("_dev"), "nationkey")
        .limit(5)
        .drop("_dev")
    )


# ---------------------------------------------------------------------------
# text ext: term burstiness (content vs function word detector)
# ---------------------------------------------------------------------------


@register(
    "text_term_burstiness",
    doc="Term burstiness à la Katz: for the twenty most frequent tokens, "
    "the variance-to-mean ratio of per-document counts (zero-including "
    "— the absent-document mass comes from the corpus size, no dense "
    "join needed: E and E[X²] are computed over occurrences and "
    "rescaled by N) separates bursty content words (VMR≫1) from "
    "evenly-sprinkled function words (VMR≈1).  The statistical "
    "justification behind stopword lists, measured rather than "
    "assumed.",
    tags=("text", "corpus", "ext"),
    oracle="""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                            'g'), ' ')) AS t
  FROM documents
), n_docs AS (SELECT count(*) AS nd FROM documents),
dc AS (
  SELECT t, doc_id, count(*) AS c FROM tok GROUP BY t, doc_id
), term AS (
  SELECT t,
         sum(c) AS total,
         sum(c * c) AS sum_c2,
         count(*) AS n_docs_with
  FROM dc GROUP BY t
), top AS (
  SELECT t, total, sum_c2, n_docs_with FROM term
  ORDER BY total DESC, t LIMIT 20
)
SELECT t AS term, total, n_docs_with,
       round((sum_c2 * 1.0 / nd - pow(total * 1.0 / nd, 2))
             / (total * 1.0 / nd), 6) AS burstiness_vmr
FROM top, n_docs ORDER BY total DESC, t
""",
)
def text_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import textstats as ts

    docs = load_table(spark, sf_dir, "documents")
    nd = docs.agg(F.count(F.lit(1)).alias("nd"))
    tok = docs.select("doc_id", F.explode(ts.tokens(F.col("text"))).alias("t"))
    dc = tok.groupBy("t", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    term = dc.groupBy("t").agg(
        F.sum("c").alias("total"),
        F.sum(F.col("c") * F.col("c")).alias("sum_c2"),
        F.count(F.lit(1)).alias("n_docs_with"),
    )
    top = term.orderBy(F.desc("total"), "t").limit(20)
    mean = F.col("total") / F.col("nd")
    vmr = (F.col("sum_c2") / F.col("nd") - mean * mean) / mean
    return (
        top.crossJoin(F.broadcast(nd))
        .select(
            F.col("t").alias("term"),
            "total",
            "n_docs_with",
            F.round(vmr, 6).alias("burstiness_vmr"),
        )
        .orderBy(F.desc("total"), "term")
    )


# ---------------------------------------------------------------------------
# sim ext: filtered vector search (metadata predicate + top-k)
# ---------------------------------------------------------------------------


@register(
    "sim_filtered_vector_search",
    doc="Filtered ANN, the vector-DB table stake: top-5 cosine "
    "neighbours of query vector 0 restricted to label 2 — the "
    "metadata predicate prunes BEFORE any distance math (pushed to "
    "the scan, so at 100 TB the label partition/zone map skips "
    "segments), then the usual order-stable JVM dot products and "
    "TakeOrdered.  The unfiltered twin is sim_cosine_topk_bruteforce; "
    "the delta in candidates is the pruning evidence.",
    tags=("similarity", "filter", "ext"),
    oracle="""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
cand AS (
  SELECT e.vec_id, e.label,
         list_sum(list_transform(range(1, 65),
                  d -> CAST(e.embedding[d] AS DOUBLE)
                     * CAST(q.qe[d] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(range(1, 65),
                 d -> CAST(e.embedding[d] AS DOUBLE)
                    * CAST(e.embedding[d] AS DOUBLE))))
          * sqrt(list_sum(list_transform(range(1, 65),
                 d -> CAST(q.qe[d] AS DOUBLE)
                    * CAST(q.qe[d] AS DOUBLE))))) AS cos_sim
  FROM embeddings e, q
  WHERE e.label = 2 AND e.vec_id <> 0
)
SELECT vec_id, label, round(cos_sim, 6) AS cos_sim,
       (SELECT count(*) FROM embeddings WHERE label = 2 AND vec_id <> 0)
         AS n_candidates
FROM cand ORDER BY cos_sim DESC, vec_id LIMIT 5
""",
)
def sim_filtered_vector_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    cand = emb.filter((F.col("label") == 2) & (F.col("vec_id") != 0))
    dot = F.expr(
        "aggregate(zip_with(embedding, qe, (a, b) -> cast(a as double) * "
        "cast(b as double)), cast(0.0 as double), (acc, v) -> acc + v)"
    )
    nrm = (
        "sqrt(aggregate(transform({c}, a -> cast(a as double) * "
        "cast(a as double)), cast(0.0 as double), (acc, v) -> acc + v))"
    )
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    scored = (
        cand.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            (
                dot
                / (
                    F.expr(nrm.format(c="embedding"))
                    * F.expr(nrm.format(c="qe"))
                )
            ).alias("cos_sim"),
        )
        .crossJoin(F.broadcast(n_cand))
    )
    return (
        scored.select(
            "vec_id", "label", F.round("cos_sim", 6).alias("cos_sim"),
            "n_candidates",
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(5)
    )


# ---------------------------------------------------------------------------
# W5 ext: monthly SLA percentile trend (P50/P90 cycle time + slope)
# ---------------------------------------------------------------------------


@register(
    "window_sla_percentile_trend",
    doc="Operational SLA reporting: monthly P50/P90 order-fulfilment "
    "cycle times (rank-based per month, engine-exact) plus the linear "
    "trend of the P90 across months — the worsening-tail detector an "
    "SRE review reads.  One join+fold to per-order durations, one "
    "rank window per month grain, one regr_slope over ≤80 cells.",
    tags=("window", "ops", "ext"),
    oracle="""
WITH dur AS (
  SELECT date_trunc('month', o.o_orderdate) AS mon,
         date_diff('day', o.o_orderdate, max(l.l_shipdate)) AS t
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate
), r AS (
  SELECT mon, t,
         row_number() OVER (PARTITION BY mon ORDER BY t) AS rn,
         count(*) OVER (PARTITION BY mon) AS cnt
  FROM dur
), q AS (
  SELECT mon,
         max(CASE WHEN rn = CAST(ceil(0.5 * cnt) AS BIGINT) THEN t END) AS p50,
         max(CASE WHEN rn = CAST(ceil(0.9 * cnt) AS BIGINT) THEN t END) AS p90,
         any_value(cnt) AS n_orders
  FROM r GROUP BY mon
), idx AS (
  SELECT mon, n_orders, p50, p90,
         row_number() OVER (ORDER BY mon) AS i
  FROM q
), trend AS (
  SELECT regr_slope(p90, i) AS p90_slope FROM idx
)
SELECT strftime(idx.mon, '%Y-%m') AS mon, idx.n_orders, idx.p50, idx.p90,
       round((SELECT p90_slope FROM trend), 6) AS p90_trend_per_month
FROM idx ORDER BY mon LIMIT 12
""",
)
def window_sla_percentile_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dur = (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.datediff(F.max("l_shipdate"), F.first("o_orderdate")).alias("t"))
        .select(F.date_trunc("month", "o_orderdate").alias("mon"), "t")
    )
    r = dur.select(
        "mon",
        "t",
        F.row_number().over(Window.partitionBy("mon").orderBy("t")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("mon")).alias("cnt"),
    )
    at = lambda p: F.max(  # noqa: E731
        F.when(
            F.col("rn") == F.ceil(F.lit(p) * F.col("cnt")).cast("bigint"),
            F.col("t"),
        )
    )
    q = r.groupBy("mon").agg(
        at(0.5).alias("p50"),
        at(0.9).alias("p90"),
        F.any_value("cnt").alias("n_orders"),
    )
    idx = q.select(
        "mon",
        "n_orders",
        "p50",
        "p90",
        F.row_number().over(Window.orderBy("mon")).alias("i"),
    )
    trend = idx.agg(
        F.round(F.regr_slope(F.col("p90"), F.col("i")), 6).alias(
            "p90_trend_per_month"
        )
    )
    return (
        idx.crossJoin(F.broadcast(trend))
        .select(
            F.date_format("mon", "yyyy-MM").alias("mon"),
            "n_orders",
            "p50",
            "p90",
            "p90_trend_per_month",
        )
        .orderBy("mon")
        .limit(12)
    )


# ---------------------------------------------------------------------------
# mlops ext: shadow-traffic sampling stability proof
# ---------------------------------------------------------------------------


@register(
    "mlops_shadow_traffic_stability",
    doc="Consistent-hash shadow sampling, with its defining property "
    "PROVEN in-plan: the 10% user sample (md5 bucket < 10) is "
    "identical every day — per-day sampled-user sets all Jaccard-1.0 "
    "against the global sampled set — unlike rand()-per-row sampling "
    "which resamples each batch.  Census: per-day sampled share "
    "(≈10%), plus the stability verdict from one distinct-aggregate "
    "comparison.  The property that makes shadow deployments and "
    "longitudinal cohorts replayable.",
    tags=("mlops", "sampling", "ext"),
    oracle="""
WITH u AS (
  SELECT DISTINCT date_trunc('day', ts) AS d, user_id,
         (('0x' || substr(md5('shadow#' || CAST(user_id AS VARCHAR)), 1, 15))
            ::BIGINT) % 100 < 10 AS sampled
  FROM events
), daily AS (
  SELECT d,
         count(*) AS n_users,
         sum(CASE WHEN sampled THEN 1 ELSE 0 END) AS n_sampled
  FROM u GROUP BY d
), global_sampled AS (
  SELECT count(DISTINCT user_id) AS g FROM u WHERE sampled
), stability AS (
  -- a user sampled on ANY day is sampled on EVERY day it appears
  SELECT count(*) AS n_violations FROM (
    SELECT user_id FROM u GROUP BY user_id
    HAVING count(DISTINCT sampled) > 1
  )
)
SELECT count(*) AS n_days,
       round(avg(n_sampled * 1.0 / n_users), 4) AS mean_daily_share,
       (SELECT g FROM global_sampled) AS n_distinct_sampled_users,
       (SELECT n_violations FROM stability) AS n_flip_flop_users,
       (SELECT n_violations FROM stability) = 0 AS deterministic
FROM daily
""",
)
def mlops_shadow_traffic_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import split_bucket

    ev = load_table(spark, sf_dir, "events")
    u = ev.select(
        F.date_trunc("day", "ts").alias("d"),
        "user_id",
        (split_bucket(F.col("user_id"), "shadow") < 10).alias("sampled"),
    ).distinct()
    daily = u.groupBy("d").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("sampled"), 1).otherwise(0)).alias("n_sampled"),
    )
    g = u.filter(F.col("sampled")).agg(
        F.countDistinct("user_id").alias("n_distinct_sampled_users")
    )
    viol = (
        u.groupBy("user_id")
        .agg(F.countDistinct("sampled").alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).alias("n_flip_flop_users"))
    )
    return (
        daily.agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.avg(F.col("n_sampled") / F.col("n_users")), 4).alias(
                "mean_daily_share"
            ),
        )
        .crossJoin(F.broadcast(g))
        .crossJoin(F.broadcast(viol))
        .withColumn("deterministic", F.col("n_flip_flop_users") == 0)
    )


# ---------------------------------------------------------------------------
# A6 ext: post-stratified treatment-effect estimator
# ---------------------------------------------------------------------------


@register(
    "agg_post_stratified_lift",
    doc="Post-stratification for the md5-arm experiment: per-(segment, "
    "arm) mean order values reweighted by the GLOBAL segment shares, "
    "so accidental mix imbalance between arms cancels — the "
    "design-based cousin of CUPED's regression adjustment.  Naive and "
    "post-stratified lifts side by side with the mix-imbalance "
    "magnitude that explains their gap; two tiny aggregates over one "
    "customer-grain pass.",
    tags=("agg", "experiment", "ext"),
    oracle="""
WITH f AS (
  SELECT c.c_mktsegment AS seg,
         ascii(substring(md5(c.c_custkey::VARCHAR), 1, 1)) % 2 AS arm,
         o.o_totalprice AS v
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
), cell AS (
  SELECT seg, arm, count(*) AS n, avg(v) AS m FROM f GROUP BY seg, arm
), share AS (
  SELECT seg, sum(n) * 1.0 / (SELECT sum(n) FROM cell) AS w FROM cell
  GROUP BY seg
), est AS (
  SELECT
    (SELECT sum(n * m) / sum(n) FROM cell WHERE arm = 1)
    - (SELECT sum(n * m) / sum(n) FROM cell WHERE arm = 0) AS naive_lift,
    (SELECT sum(s.w * c.m) FROM cell c JOIN share s ON s.seg = c.seg
     WHERE c.arm = 1)
    - (SELECT sum(s.w * c.m) FROM cell c JOIN share s ON s.seg = c.seg
       WHERE c.arm = 0) AS ps_lift,
    (SELECT max(abs(t.sh1 - t.sh0)) FROM (
       SELECT seg,
              sum(CASE WHEN arm = 1 THEN n ELSE 0 END) * 1.0
                / (SELECT sum(n) FROM cell WHERE arm = 1) AS sh1,
              sum(CASE WHEN arm = 0 THEN n ELSE 0 END) * 1.0
                / (SELECT sum(n) FROM cell WHERE arm = 0) AS sh0
       FROM cell GROUP BY seg) t) AS max_mix_imbalance
)
SELECT round(naive_lift, 4) AS naive_lift,
       round(ps_lift, 4) AS post_stratified_lift,
       round(naive_lift - ps_lift, 4) AS composition_bias,
       round(max_mix_imbalance, 6) AS max_mix_imbalance
FROM est
""",
)
def agg_post_stratified_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    arm = (
        F.ascii(F.substring(F.md5(F.col("c_custkey").cast("string").cast("binary")), 1, 1))
        % 2
    )
    f = cust.join(orders, orders.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        arm.alias("arm"),
        F.col("o_totalprice").alias("v"),
    )
    cell = f.groupBy("seg", "arm").agg(
        F.count(F.lit(1)).alias("n"), F.avg("v").alias("m")
    )
    tot = cell.agg(F.sum("n").alias("nt"))
    share = (
        cell.groupBy("seg")
        .agg(F.sum("n").alias("ns"))
        .crossJoin(F.broadcast(tot))
        .select("seg", (F.col("ns") / F.col("nt")).alias("w"))
    )

    def _arm_stats(a: int):
        c = cell.filter(F.col("arm") == a)
        naive = c.agg(
            (F.sum(F.col("n") * F.col("m")) / F.sum("n")).alias(f"naive{a}"),
            F.sum("n").alias(f"narm{a}"),
        )
        ps = (
            c.join(F.broadcast(share), "seg")
            .agg(F.sum(F.col("w") * F.col("m")).alias(f"ps{a}"))
        )
        return naive, ps

    n1, p1 = _arm_stats(1)
    n0, p0 = _arm_stats(0)
    imb = (
        cell.groupBy("seg")
        .agg(
            F.sum(F.when(F.col("arm") == 1, F.col("n")).otherwise(0)).alias("c1"),
            F.sum(F.when(F.col("arm") == 0, F.col("n")).otherwise(0)).alias("c0"),
        )
        .crossJoin(F.broadcast(n1.select("narm1")))
        .crossJoin(F.broadcast(n0.select("narm0")))
        .agg(
            F.max(
                F.abs(
                    F.col("c1") / F.col("narm1") - F.col("c0") / F.col("narm0")
                )
            ).alias("max_mix_imbalance")
        )
    )
    naive_lift = F.col("naive1") - F.col("naive0")
    ps_lift = F.col("ps1") - F.col("ps0")
    return (
        n1.crossJoin(F.broadcast(n0))
        .crossJoin(F.broadcast(p1))
        .crossJoin(F.broadcast(p0))
        .crossJoin(F.broadcast(imb))
        .select(
            F.round(naive_lift, 4).alias("naive_lift"),
            F.round(ps_lift, 4).alias("post_stratified_lift"),
            F.round(naive_lift - ps_lift, 4).alias("composition_bias"),
            F.round("max_mix_imbalance", 6).alias("max_mix_imbalance"),
        )
    )


# ---------------------------------------------------------------------------
# K5 ext: replay-range recovery plan from sequence gaps
# ---------------------------------------------------------------------------


@register(
    "cdc_replay_range_plan",
    doc="Recovery planning one step past cdc_seq_gap_census: the missing "
    "sequence ranges themselves, as (from_seq, to_seq, width) replay "
    "instructions — present seqs collapse to islands via the "
    "lag-difference trick, each island boundary emits the gap that "
    "precedes it.  This is the work order an operator hands the "
    "upstream (the reference can only log and resubscribe, "
    "cdc.py:101-103); damage is synthesized by dropping seq ranges "
    "deterministically.  Widest five gaps reported.",
    tags=("cdc", "ops", "ref:K5", "ext"),
    oracle=f"""
WITH ch AS ({ORDERS_CHANGELOG_SQL}),
present AS (
  SELECT DISTINCT seq FROM ch
  WHERE NOT (seq % 101 BETWEEN 40 AND 44) AND NOT (seq % 211 = 7)
), marked AS (
  SELECT seq,
         lag(seq) OVER (ORDER BY seq) AS prev_seq
  FROM present
)
SELECT prev_seq + 1 AS from_seq,
       seq - 1 AS to_seq,
       seq - prev_seq - 1 AS width
FROM marked
WHERE prev_seq IS NOT NULL AND seq - prev_seq > 1
ORDER BY width DESC, from_seq LIMIT 5
""",
)
def cdc_replay_range_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..sources.changelog import orders_changelog

    ch = orders_changelog(spark, sf_dir)
    present = (
        ch.filter(
            ~((F.col("seq") % 101).between(40, 44)) & (F.col("seq") % 211 != 7)
        )
        .select("seq")
        .distinct()
    )
    marked = present.select(
        "seq", F.lag("seq").over(Window.orderBy("seq")).alias("prev_seq")
    )
    return (
        marked.filter(
            F.col("prev_seq").isNotNull() & (F.col("seq") - F.col("prev_seq") > 1)
        )
        .select(
            (F.col("prev_seq") + 1).alias("from_seq"),
            (F.col("seq") - 1).alias("to_seq"),
            (F.col("seq") - F.col("prev_seq") - 1).alias("width"),
        )
        .orderBy(F.desc("width"), "from_seq")
        .limit(5)
    )


# ---------------------------------------------------------------------------
# text ext: Jensen-Shannon divergence matrix between sources
# ---------------------------------------------------------------------------


@register(
    "text_js_divergence_matrix",
    doc="Pairwise Jensen-Shannon divergence between the unigram "
    "distributions of every document source — the symmetric, bounded "
    "[0, ln 2] companion of the one-directional KL entry: smoothed "
    "per-source token shares from one explode+aggregate, source pairs "
    "joined on the token key (union vocabulary, absent mass from the "
    "smoothing floor), JSD = ½KL(P‖M)+½KL(Q‖M).  The corpus-mixing "
    "distance matrix a data-mixture design reads.",
    tags=("text", "corpus", "ext"),
    oracle="""
WITH tok AS (
  SELECT source,
         unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                            'g'), ' ')) AS t
  FROM documents
), vocab AS (SELECT DISTINCT t FROM tok),
counts AS (
  SELECT s.source, v.t, coalesce(c.n, 0) + 0.5 AS n
  FROM (SELECT DISTINCT source FROM tok) s
  CROSS JOIN vocab v
  LEFT JOIN (SELECT source, t, count(*) AS n FROM tok GROUP BY source, t) c
    ON c.source = s.source AND c.t = v.t
), p AS (
  SELECT source, t,
         n / sum(n) OVER (PARTITION BY source) AS pr
  FROM counts
), pairs AS (
  SELECT a.source AS src_a, b.source AS src_b,
         sum(0.5 * a.pr * ln(a.pr / ((a.pr + b.pr) / 2))
             + 0.5 * b.pr * ln(b.pr / ((a.pr + b.pr) / 2))) AS jsd
  FROM p a JOIN p b ON a.t = b.t AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT src_a, src_b, round(jsd, 6) AS jsd_nats
FROM pairs ORDER BY src_a, src_b
""",
)
def text_js_divergence_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..operators import textstats as ts

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(ts.tokens(F.col("text"))).alias("t"))
    vocab = tok.select("t").distinct()
    sources = tok.select("source").distinct()
    c = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("n"))
    counts = (
        sources.crossJoin(vocab)
        .join(c, ["source", "t"], "left")
        .select(
            "source", "t", (F.coalesce(F.col("n"), F.lit(0)) + 0.5).alias("n")
        )
    )
    p = counts.select(
        "source",
        "t",
        (F.col("n") / F.sum("n").over(Window.partitionBy("source"))).alias("pr"),
    )
    a = p.select(
        F.col("source").alias("src_a"), "t", F.col("pr").alias("pa")
    )
    b = p.select(
        F.col("source").alias("src_b"), F.col("t").alias("t2"),
        F.col("pr").alias("pb"),
    )
    mid = (F.col("pa") + F.col("pb")) / 2
    pairs = (
        a.join(
            b,
            (F.col("t") == F.col("t2")) & (F.col("src_a") < F.col("src_b")),
        )
        .groupBy("src_a", "src_b")
        .agg(
            F.sum(
                0.5 * F.col("pa") * F.log(F.col("pa") / mid)
                + 0.5 * F.col("pb") * F.log(F.col("pb") / mid)
            ).alias("jsd")
        )
    )
    return pairs.select(
        "src_a", "src_b", F.round("jsd", 6).alias("jsd_nats")
    ).orderBy("src_a", "src_b")


# ---------------------------------------------------------------------------
# A6 ext: partial correlation controlling for a categorical confounder
# ---------------------------------------------------------------------------


@register(
    "agg_partial_correlation_within",
    doc="Partial correlation of document length and stopword density "
    "CONTROLLING for source: both variables are residualized against "
    "their source means (a broadcast of 4 group rows), and the "
    "correlation of residuals is the within-source association — "
    "compared against the raw pooled correlation to expose how much "
    "of it was Simpson-style between-source composition.  Two "
    "decomposable passes.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH d AS (
  SELECT source, n_chars * 1.0 AS x,
         len(list_filter(string_split(regexp_replace(lower(trim(text)),
                                                     '\\s+', ' ', 'g'), ' '),
                         t -> length(t) <= 3)) * 1.0
           / len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                             'g'), ' ')) AS y
  FROM documents
), gm AS (
  SELECT source, avg(x) AS mx, avg(y) AS my FROM d GROUP BY source
), r AS (
  SELECT d.x - gm.mx AS rx, d.y - gm.my AS ry, d.x, d.y
  FROM d JOIN gm ON gm.source = d.source
)
SELECT count(*) AS n_docs,
       round(corr(x, y), 6) AS raw_corr,
       round(corr(rx, ry), 6) AS partial_corr_within,
       round(corr(x, y) - corr(rx, ry), 6) AS composition_component
FROM r
""",
)
def agg_partial_correlation_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import textstats as ts

    docs = load_table(spark, sf_dir, "documents")
    toks = ts.tokens(F.col("text"))
    short_ratio = F.size(F.filter(toks, lambda t: F.length(t) <= 3)) / F.size(toks)
    d = docs.select(
        "source",
        F.col("n_chars").cast("double").alias("x"),
        short_ratio.alias("y"),
    )
    gm = d.groupBy("source").agg(
        F.avg("x").alias("mx"), F.avg("y").alias("my")
    )
    r = d.join(F.broadcast(gm), "source").select(
        "x",
        "y",
        (F.col("x") - F.col("mx")).alias("rx"),
        (F.col("y") - F.col("my")).alias("ry"),
    )
    return r.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.corr("x", "y"), 6).alias("raw_corr"),
        F.round(F.corr("rx", "ry"), 6).alias("partial_corr_within"),
        F.round(F.corr("x", "y") - F.corr("rx", "ry"), 6).alias(
            "composition_component"
        ),
    )


# ---------------------------------------------------------------------------
# tooling ext: generated conformed date dimension
# ---------------------------------------------------------------------------


@register(
    "tooling_date_dimension_build",
    doc="The warehouse date dimension, generated not loaded: one "
    "sequence() explode materializes every day of 1996-1997 with "
    "conformed attributes (ISO week, quarter, weekend flag, "
    "month-end flag), then a validation census proves the calendar "
    "is complete and the attributes consistent — the dimension "
    "gapfill_daily_orders implicitly assumes, built as a first-class "
    "relation.  Zero input tables; pure generation.",
    tags=("tooling", "dimension", "ext"),
    oracle="""
WITH cal AS (
  SELECT CAST(unnest(range(DATE '1996-01-01', DATE '1998-01-01',
                           INTERVAL 1 DAY)) AS DATE) AS d
), dim AS (
  SELECT d,
         isodow(d) AS iso_dow,
         CAST(quarter(d) AS INT) AS q,
         isodow(d) >= 6 AS is_weekend,
         d = last_day(d) AS is_month_end
  FROM cal
)
SELECT count(*) AS n_days,
       sum(CASE WHEN is_weekend THEN 1 ELSE 0 END) AS n_weekend,
       sum(CASE WHEN is_month_end THEN 1 ELSE 0 END) AS n_month_ends,
       count(DISTINCT q) AS n_quarters,
       min(d) = DATE '1996-01-01' AND max(d) = DATE '1997-12-31'
         AND count(*) = 731 AS calendar_complete
FROM dim
""",
)
def tooling_date_dimension_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark_ = spark
    cal = spark_.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1996-01-01").cast("date"),
                F.lit("1997-12-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("d")
    )
    dim = cal.select(
        "d",
        (F.expr("weekday(d)") + 1).alias("iso_dow"),
        F.quarter("d").alias("q"),
        (F.expr("weekday(d)") >= 5).alias("is_weekend"),
        (F.col("d") == F.last_day("d")).alias("is_month_end"),
    )
    return dim.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.when(F.col("is_weekend"), 1).otherwise(0)).alias("n_weekend"),
        F.sum(F.when(F.col("is_month_end"), 1).otherwise(0)).alias(
            "n_month_ends"
        ),
        F.countDistinct("q").alias("n_quarters"),
        (
            (F.min("d") == F.lit("1996-01-01").cast("date"))
            & (F.max("d") == F.lit("1997-12-31").cast("date"))
            & (F.count(F.lit(1)) == 731)
        ).alias("calendar_complete"),
    )


# ---------------------------------------------------------------------------
# A6 ext: robustness sensitivity triptych (raw / winsorized / trimmed t)
# ---------------------------------------------------------------------------


@register(
    "agg_robustness_sensitivity_ttest",
    doc="Sensitivity analysis of the BUILDING-vs-MACHINERY balance "
    "contrast under three treatments of outliers — raw Welch t, "
    "winsorized at P5/P95 (values clamped), trimmed (values dropped) "
    "— computed side by side from ONE pass plus the quantile "
    "broadcast.  If the three t-statistics disagree materially the "
    "effect lives in the tails and the headline test is fragile; "
    "agreement certifies robustness.  The meta-analysis pattern over "
    "agg_welch_ttest / agg_winsorized_mean / agg_trimmed_mean.",
    tags=("agg", "robust", "ext"),
    oracle="""
WITH v AS (
  SELECT c_mktsegment AS seg, round(c_acctbal, 2) AS x FROM customer
  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
), cuts AS (
  SELECT seg,
         max(CASE WHEN rn = CAST(ceil(0.05 * cnt) AS BIGINT) THEN x END)
           AS x5,
         max(CASE WHEN rn = CAST(ceil(0.95 * cnt) AS BIGINT) THEN x END)
           AS x95
  FROM (
    SELECT seg, x,
           row_number() OVER (PARTITION BY seg ORDER BY x) AS rn,
           count(*) OVER (PARTITION BY seg) AS cnt
    FROM v
  ) GROUP BY seg
), j AS (
  SELECT v.seg, v.x, c.x5, c.x95,
         least(greatest(v.x, c.x5), c.x95) AS xw
  FROM v JOIN cuts c ON c.seg = v.seg
), t AS (
  SELECT
    -- raw
    (avg(CASE WHEN seg = 'BUILDING' THEN x END)
     - avg(CASE WHEN seg = 'MACHINERY' THEN x END))
    / sqrt(var_samp(CASE WHEN seg = 'BUILDING' THEN x END)
             / count(CASE WHEN seg = 'BUILDING' THEN 1 END)
           + var_samp(CASE WHEN seg = 'MACHINERY' THEN x END)
             / count(CASE WHEN seg = 'MACHINERY' THEN 1 END)) AS t_raw,
    -- winsorized
    (avg(CASE WHEN seg = 'BUILDING' THEN xw END)
     - avg(CASE WHEN seg = 'MACHINERY' THEN xw END))
    / sqrt(var_samp(CASE WHEN seg = 'BUILDING' THEN xw END)
             / count(CASE WHEN seg = 'BUILDING' THEN 1 END)
           + var_samp(CASE WHEN seg = 'MACHINERY' THEN xw END)
             / count(CASE WHEN seg = 'MACHINERY' THEN 1 END)) AS t_winsor,
    -- trimmed
    (avg(CASE WHEN seg = 'BUILDING' AND x >= x5 AND x <= x95
              THEN x END)
     - avg(CASE WHEN seg = 'MACHINERY' AND x >= x5 AND x <= x95
                THEN x END))
    / sqrt(var_samp(CASE WHEN seg = 'BUILDING' AND x >= x5 AND x <= x95
                         THEN x END)
             / count(CASE WHEN seg = 'BUILDING' AND x >= x5 AND x <= x95
                          THEN 1 END)
           + var_samp(CASE WHEN seg = 'MACHINERY' AND x >= x5 AND x <= x95
                           THEN x END)
             / count(CASE WHEN seg = 'MACHINERY' AND x >= x5 AND x <= x95
                          THEN 1 END)) AS t_trim
  FROM j
)
SELECT round(t_raw, 4) AS t_raw,
       round(t_winsor, 4) AS t_winsorized,
       round(t_trim, 4) AS t_trimmed,
       greatest(abs(t_raw - t_winsor), abs(t_raw - t_trim)) < 1.0
         AS conclusion_robust
FROM t
""",
)
def agg_robustness_sensitivity_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer")
    v = cust.filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    ).select(
        F.col("c_mktsegment").alias("seg"), F.round("c_acctbal", 2).alias("x")
    )
    r = v.select(
        "seg",
        "x",
        F.row_number().over(Window.partitionBy("seg").orderBy("x")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("seg")).alias("cnt"),
    )
    at = lambda p: F.max(  # noqa: E731
        F.when(
            F.col("rn") == F.ceil(F.lit(p) * F.col("cnt")).cast("bigint"),
            F.col("x"),
        )
    )
    cuts = r.groupBy("seg").agg(at(0.05).alias("x5"), at(0.95).alias("x95"))
    j = v.join(F.broadcast(cuts), "seg").withColumn(
        "xw", F.least(F.greatest(F.col("x"), F.col("x5")), F.col("x95"))
    )

    def _t(col, extra=None):
        in_b = F.col("seg") == "BUILDING"
        in_m = F.col("seg") == "MACHINERY"
        if extra is not None:
            in_b = in_b & extra
            in_m = in_m & extra
        cb = F.when(in_b, F.col(col))
        cm = F.when(in_m, F.col(col))
        return (F.avg(cb) - F.avg(cm)) / F.sqrt(
            F.var_samp(cb) / F.count(cb) + F.var_samp(cm) / F.count(cm)
        )

    inband = (F.col("x") >= F.col("x5")) & (F.col("x") <= F.col("x95"))
    t_raw = _t("x")
    t_win = _t("xw")
    t_trim = _t("x", inband)
    return j.agg(
        F.round(t_raw, 4).alias("t_raw"),
        F.round(t_win, 4).alias("t_winsorized"),
        F.round(t_trim, 4).alias("t_trimmed"),
        (
            F.greatest(F.abs(t_raw - t_win), F.abs(t_raw - t_trim)) < 1.0
        ).alias("conclusion_robust"),
    )


# ---------------------------------------------------------------------------
# J5 ext: frequent 3-itemsets (brand triples) — Apriori one level up
# ---------------------------------------------------------------------------


@register(
    "basket_brand_triples",
    doc="Frequent 3-itemset mining over order baskets: brand triples "
    "a<b<c co-present in an order, counted via the oriented three-way "
    "self-join on the DISTINCT (order, brand) projection — the same "
    "orientation trick as triangle counting keeps every triple "
    "enumerated once and the candidate space bounded by the 25-brand "
    "dictionary (≤2300 triples), never the basket cube.  Support "
    "against the basket count; top-10 triples.",
    tags=("join", "mining", "ext"),
    oracle="""
WITH ob AS MATERIALIZED (
  -- MATERIALIZED: referenced 3x below; inlined, DuckDB pushes the brand
  -- inequalities into a NESTED_LOOP_JOIN between multi-million-row scans
  -- at sf1 (same class as basket_sequential_pairs, see SCALING.md)
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON p_partkey = l_partkey
), nb AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM ob),
triples AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, c.p_brand AS brand_c,
         count(*) AS n_orders
  FROM ob a
  JOIN ob b ON b.l_orderkey = a.l_orderkey AND a.p_brand < b.p_brand
  JOIN ob c ON c.l_orderkey = a.l_orderkey AND b.p_brand < c.p_brand
  GROUP BY 1, 2, 3
)
SELECT brand_a, brand_b, brand_c, n_orders,
       round(n_orders * 1.0 / nb.n_baskets, 6) AS support
FROM triples, nb
ORDER BY n_orders DESC, brand_a, brand_b, brand_c LIMIT 10
""",
)
def basket_brand_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    nb = ob.select(F.countDistinct("l_orderkey").alias("n_baskets"))
    a = ob.select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand_a"))
    b = ob.select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand_b"))
    c = ob.select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand_c"))
    triples = (
        a.join(b, "ok")
        .where(F.col("brand_a") < F.col("brand_b"))
        .join(c, "ok")
        .where(F.col("brand_b") < F.col("brand_c"))
        .groupBy("brand_a", "brand_b", "brand_c")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        triples.crossJoin(F.broadcast(nb))
        .select(
            "brand_a",
            "brand_b",
            "brand_c",
            "n_orders",
            F.round(F.col("n_orders") / F.col("n_baskets"), 6).alias("support"),
        )
        .orderBy(F.desc("n_orders"), "brand_a", "brand_b", "brand_c")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# M1 ext: SCD type 3 (current + previous value columns)
# ---------------------------------------------------------------------------


@register(
    "cdc_scd3_previous_value",
    doc="SCD type 3 from the changelog: per order key, the CURRENT "
    "status and the immediately PREVIOUS distinct status as sibling "
    "columns — max_by at the last seq plus max_by over the prefix "
    "before the last status change, both inside one grouped "
    "aggregate (value-change detection via a lag window first).  "
    "Completes the dimension-history family: SCD2 keeps all versions "
    "(cdc_scd2_history), SCD3 keeps exactly one look-back.  Counts "
    "summary + changed-key census.",
    tags=("cdc", "ref:M1", "ext"),
    oracle=f"""
WITH ch AS ({ORDERS_CHANGELOG_SQL}),
seqd AS (
  SELECT o_orderkey, seq, o_orderstatus,
         lag(o_orderstatus) OVER (PARTITION BY o_orderkey ORDER BY seq)
           AS prev_status
  FROM ch WHERE o_orderkey IS NOT NULL AND cdc_action <> 'delete'
), changes AS (
  SELECT o_orderkey, seq, o_orderstatus, prev_status
  FROM seqd
  WHERE prev_status IS DISTINCT FROM o_orderstatus
), scd3 AS (
  SELECT o_orderkey,
         arg_max(o_orderstatus, seq) AS current_status,
         arg_max(prev_status, seq) AS previous_status
  FROM changes GROUP BY o_orderkey
)
SELECT count(*) AS n_keys,
       sum(CASE WHEN previous_status IS NOT NULL THEN 1 ELSE 0 END)
         AS n_with_history,
       count(DISTINCT current_status) AS n_current_statuses,
       sum(CASE WHEN current_status = previous_status THEN 1 ELSE 0 END)
         AS n_inconsistent
FROM scd3
""",
)
def cdc_scd3_previous_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..sources.changelog import orders_changelog

    ch = orders_changelog(spark, sf_dir).filter(
        F.col("o_orderkey").isNotNull() & (F.col("cdc_action") != "delete")
    )
    seqd = ch.select(
        "o_orderkey",
        "seq",
        "o_orderstatus",
        F.lag("o_orderstatus")
        .over(Window.partitionBy("o_orderkey").orderBy("seq"))
        .alias("prev_status"),
    )
    changes = seqd.filter(
        ~F.col("prev_status").eqNullSafe(F.col("o_orderstatus"))
    )
    scd3 = changes.groupBy("o_orderkey").agg(
        F.max_by("o_orderstatus", "seq").alias("current_status"),
        F.max_by("prev_status", "seq").alias("previous_status"),
    )
    return scd3.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(
            F.when(F.col("previous_status").isNotNull(), 1).otherwise(0)
        ).alias("n_with_history"),
        F.countDistinct("current_status").alias("n_current_statuses"),
        F.sum(
            F.when(
                F.col("current_status") == F.col("previous_status"), 1
            ).otherwise(0)
        ).alias("n_inconsistent"),
    )


# ---------------------------------------------------------------------------
# A6 ext: Cronbach's alpha (internal-consistency reliability)
# ---------------------------------------------------------------------------


@register(
    "agg_cronbach_alpha",
    doc="Cronbach's alpha over a k=3 'item battery': each customer's "
    "first three order values (by date) pivot wide via conditional "
    "max_by aggregates, then α = k/(k−1)·(1 − Σ item variances / "
    "variance of the item sum) from one moment pass over complete "
    "cases — the psychometric reliability coefficient, showing the "
    "pivot-then-moments shape any survey/battery analysis needs.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH seq AS (
  SELECT o_custkey, round(o_totalprice, 2) AS v,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS i
  FROM orders
), wide AS (
  SELECT o_custkey,
         max(CASE WHEN i = 1 THEN v END) AS v1,
         max(CASE WHEN i = 2 THEN v END) AS v2,
         max(CASE WHEN i = 3 THEN v END) AS v3
  FROM seq WHERE i <= 3 GROUP BY o_custkey
), complete AS (
  SELECT * FROM wide WHERE v3 IS NOT NULL
)
SELECT count(*) AS n_respondents,
       round(3.0 / 2 * (1 - (var_samp(v1) + var_samp(v2) + var_samp(v3))
                            / var_samp(v1 + v2 + v3)), 6) AS cronbach_alpha,
       3.0 / 2 * (1 - (var_samp(v1) + var_samp(v2) + var_samp(v3))
                      / var_samp(v1 + v2 + v3)) < 0.5 AS items_unrelated
FROM complete
""",
)
def agg_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    seq = orders.select(
        "o_custkey",
        F.round("o_totalprice", 2).alias("v"),
        F.row_number()
        .over(
            Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        )
        .alias("i"),
    ).filter(F.col("i") <= 3)
    wide = seq.groupBy("o_custkey").agg(
        F.max(F.when(F.col("i") == 1, F.col("v"))).alias("v1"),
        F.max(F.when(F.col("i") == 2, F.col("v"))).alias("v2"),
        F.max(F.when(F.col("i") == 3, F.col("v"))).alias("v3"),
    )
    complete = wide.filter(F.col("v3").isNotNull())
    alpha = 1.5 * (
        1
        - (F.var_samp("v1") + F.var_samp("v2") + F.var_samp("v3"))
        / F.var_samp(F.col("v1") + F.col("v2") + F.col("v3"))
    )
    return complete.agg(
        F.count(F.lit(1)).alias("n_respondents"),
        F.round(alpha, 6).alias("cronbach_alpha"),
        (alpha < 0.5).alias("items_unrelated"),
    )


# ---------------------------------------------------------------------------
# events ext: absorbing-chain expected visits (purchase as absorber)
# ---------------------------------------------------------------------------


@register(
    "events_absorbing_markov_steps",
    doc="Absorption analysis of the event chain with 'purchase' as the "
    "absorbing state: expected visits to each transient state before "
    "absorption, approximated by the truncated Neumann series "
    "I+Q+Q²+…+Q⁶ of the transient block — six unrolled vector-matrix "
    "steps over the ≤16-cell transient matrix (the same bounded-"
    "iteration shape as the stationary-distribution entry, but "
    "answering 'how long until conversion' instead of 'where does "
    "traffic settle').  Expected visits from each starting state.",
    tags=("events", "graph", "ext"),
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS nxt
  FROM events
), pair AS (
  SELECT event_type AS src, nxt AS dst FROM seq
  WHERE nxt IS NOT NULL AND event_type <> 'purchase'
), q AS (
  SELECT src, dst, count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY src)
           AS pr
  FROM pair GROUP BY src, dst
), qt AS (SELECT * FROM q WHERE dst <> 'purchase'),
states AS (SELECT DISTINCT src FROM qt),
v0 AS (SELECT s0.src AS start, s0.src AS state, 1.0 AS v
       FROM states s0),
v1 AS (SELECT v0.start, qt.dst AS state, sum(v0.v * qt.pr) AS v
       FROM v0 JOIN qt ON qt.src = v0.state GROUP BY v0.start, qt.dst),
v2 AS (SELECT v1.start, qt.dst AS state, sum(v1.v * qt.pr) AS v
       FROM v1 JOIN qt ON qt.src = v1.state GROUP BY v1.start, qt.dst),
v3 AS (SELECT v2.start, qt.dst AS state, sum(v2.v * qt.pr) AS v
       FROM v2 JOIN qt ON qt.src = v2.state GROUP BY v2.start, qt.dst),
v4 AS (SELECT v3.start, qt.dst AS state, sum(v3.v * qt.pr) AS v
       FROM v3 JOIN qt ON qt.src = v3.state GROUP BY v3.start, qt.dst),
v5 AS (SELECT v4.start, qt.dst AS state, sum(v4.v * qt.pr) AS v
       FROM v4 JOIN qt ON qt.src = v4.state GROUP BY v4.start, qt.dst),
v6 AS (SELECT v5.start, qt.dst AS state, sum(v5.v * qt.pr) AS v
       FROM v5 JOIN qt ON qt.src = v5.state GROUP BY v5.start, qt.dst),
total AS (
  SELECT start, sum(v) AS expected_steps_6 FROM (
    SELECT * FROM v0 UNION ALL SELECT * FROM v1 UNION ALL
    SELECT * FROM v2 UNION ALL SELECT * FROM v3 UNION ALL
    SELECT * FROM v4 UNION ALL SELECT * FROM v5 UNION ALL
    SELECT * FROM v6
  ) GROUP BY start
)
SELECT start AS start_state,
       round(expected_steps_6, 4) AS expected_visits_truncated
FROM total ORDER BY start_state
""",
)
def events_absorbing_markov_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "event_type",
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("nxt"),
    ).filter(F.col("nxt").isNotNull() & (F.col("event_type") != "purchase"))
    q = (
        seq.groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "src",
            "dst",
            (F.col("n") / F.sum("n").over(Window.partitionBy("src"))).alias("pr"),
        )
    )
    qt = F.broadcast(q.filter(F.col("dst") != "purchase"))
    states = q.select("src").distinct()
    v = states.select(
        F.col("src").alias("start"), F.col("src").alias("state"),
        F.lit(1.0).alias("v"),
    )
    acc = v
    for _ in range(6):
        v = (
            v.join(qt, qt.src == v.state)
            .groupBy("start", F.col("dst").alias("state_n"))
            .agg(F.sum(F.col("v") * F.col("pr")).alias("v"))
            .withColumnRenamed("state_n", "state")
        )
        acc = acc.unionAll(v)
    return (
        acc.groupBy("start")
        .agg(F.round(F.sum("v"), 4).alias("expected_visits_truncated"))
        .select(F.col("start").alias("start_state"), "expected_visits_truncated")
        .orderBy("start_state")
    )


# ---------------------------------------------------------------------------
# A6 ext: Gini mean difference via the rank closed form
# ---------------------------------------------------------------------------


@register(
    "agg_gini_mean_difference",
    doc="Gini mean difference per segment WITHOUT the O(n²) pair "
    "enumeration: GMD = 2/(n(n−1))·Σ(2i−n−1)·x₍ᵢ₎ over the within-"
    "group rank order — one rank window plus one aggregate, the "
    "sort-based identity that turns a quadratic dispersion measure "
    "into a group-by.  Reported next to the standard deviation "
    "(GMD/σ ≈ 1.128 under normality, so the ratio doubles as a "
    "shape diagnostic).",
    tags=("agg", "robust", "ext"),
    oracle="""
WITH r AS (
  SELECT c_mktsegment AS seg, round(c_acctbal, 2) AS x,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY round(c_acctbal, 2), c_custkey) AS i,
         count(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM customer
)
SELECT seg, any_value(n) AS n,
       round(2.0 / (any_value(n) * (any_value(n) - 1))
             * sum((2 * i - n - 1) * x), 4) AS gmd,
       round(stddev_samp(x), 4) AS sd,
       round(2.0 / (any_value(n) * (any_value(n) - 1))
             * sum((2 * i - n - 1) * x) / stddev_samp(x), 4) AS gmd_sd_ratio
FROM r GROUP BY seg ORDER BY seg
""",
)
def agg_gini_mean_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer")
    x = F.round("c_acctbal", 2)
    r = cust.select(
        F.col("c_mktsegment").alias("seg"),
        x.alias("x"),
        F.row_number()
        .over(
            Window.partitionBy("c_mktsegment").orderBy(x, "c_custkey")
        )
        .alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy("c_mktsegment")).alias("n"),
    )
    gmd = (
        2.0
        / (F.any_value("n") * (F.any_value("n") - 1))
        * F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("x"))
    )
    return (
        r.groupBy("seg")
        .agg(
            F.any_value("n").alias("n"),
            F.round(gmd, 4).alias("gmd"),
            F.round(F.stddev_samp("x"), 4).alias("sd"),
            F.round(gmd / F.stddev_samp("x"), 4).alias("gmd_sd_ratio"),
        )
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# A6 ext: Wilson score intervals for per-segment proportions
# ---------------------------------------------------------------------------


@register(
    "agg_wilson_score_interval",
    doc="Wilson score 95% confidence intervals for the urgent-order "
    "proportion per segment — the interval that behaves at the "
    "boundaries where the naive Wald ±1.96√(p(1−p)/n) collapses; "
    "both reported so the difference is visible.  Pure closed form "
    "on the 5 proportion cells from one customer-grain pass.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH f AS (
  SELECT any_value(c.c_mktsegment) AS seg,
         max(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS y
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
), s AS (
  SELECT seg, count(*) AS n, avg(y * 1.0) AS p FROM f GROUP BY seg
)
SELECT seg, n, round(p, 6) AS p_hat,
       round((p + 1.9208 / n
              - 1.96 * sqrt(p * (1 - p) / n + 0.9604 / (n * n)))
             / (1 + 3.8416 / n), 6) AS wilson_lo,
       round((p + 1.9208 / n
              + 1.96 * sqrt(p * (1 - p) / n + 0.9604 / (n * n)))
             / (1 + 3.8416 / n), 6) AS wilson_hi,
       round(p - 1.96 * sqrt(p * (1 - p) / n), 6) AS wald_lo
FROM s ORDER BY seg
""",
)
def agg_wilson_score_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    f = (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.any_value("c_mktsegment").alias("seg"),
            F.max(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("y"),
        )
    )
    s = f.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.col("y").cast("double")).alias("p"),
    )
    n, p = F.col("n"), F.col("p")
    half = 1.96 * F.sqrt(p * (1 - p) / n + 0.9604 / (n * n))
    denom = 1 + 3.8416 / n
    return s.select(
        "seg",
        "n",
        F.round(p, 6).alias("p_hat"),
        F.round((p + 1.9208 / n - half) / denom, 6).alias("wilson_lo"),
        F.round((p + 1.9208 / n + half) / denom, 6).alias("wilson_hi"),
        F.round(p - 1.96 * F.sqrt(p * (1 - p) / n), 6).alias("wald_lo"),
    ).orderBy("seg")


# ---------------------------------------------------------------------------
# tooling ext: histogram-based join cardinality estimation vs actual
# ---------------------------------------------------------------------------


@register(
    "tooling_join_cardinality_estimate",
    doc="Optimizer introspection from first principles: the "
    "customer⋈orders equi-join size estimated from 64-bucket key "
    "histograms (per bucket nₐ·n_b/max(dₐ,d_b), the classic "
    "System-R-with-histograms formula) against the TRUE join "
    "cardinality — the estimation error a cost-based optimizer "
    "lives with.  Three aggregates; the histogram relations are "
    "64 rows each.",
    tags=("tooling", "optimizer", "ext"),
    oracle="""
WITH ha AS (
  SELECT c_custkey % 64 AS b, count(*) AS na,
         count(DISTINCT c_custkey) AS da
  FROM customer GROUP BY 1
), hb AS (
  SELECT o_custkey % 64 AS b, count(*) AS nb,
         count(DISTINCT o_custkey) AS db
  FROM orders GROUP BY 1
), est AS (
  SELECT sum(ha.na * hb.nb * 1.0 / greatest(ha.da, hb.db)) AS est_rows
  FROM ha JOIN hb ON hb.b = ha.b
), act AS (
  SELECT count(*) AS true_rows
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
)
SELECT CAST(round(est.est_rows, 0) AS BIGINT) AS estimated_rows,
       act.true_rows,
       round(est.est_rows / act.true_rows, 4) AS q_error
FROM est, act
""",
)
def tooling_join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    ha = cust.groupBy((F.col("c_custkey") % 64).alias("b")).agg(
        F.count(F.lit(1)).alias("na"),
        F.countDistinct("c_custkey").alias("da"),
    )
    hb = orders.groupBy((F.col("o_custkey") % 64).alias("b")).agg(
        F.count(F.lit(1)).alias("nb"),
        F.countDistinct("o_custkey").alias("db"),
    )
    est = (
        ha.join(hb, "b")
        .agg(
            F.sum(
                F.col("na")
                * F.col("nb")
                / F.greatest(F.col("da"), F.col("db"))
            ).alias("est_rows")
        )
    )
    act = cust.join(orders, orders.o_custkey == cust.c_custkey).agg(
        F.count(F.lit(1)).alias("true_rows")
    )
    return (
        est.crossJoin(F.broadcast(act))
        .select(
            F.round("est_rows", 0).cast("bigint").alias("estimated_rows"),
            "true_rows",
            F.round(F.col("est_rows") / F.col("true_rows"), 4).alias("q_error"),
        )
    )


# ---------------------------------------------------------------------------
# A6 ext: fixed-effect meta-analysis with I² heterogeneity
# ---------------------------------------------------------------------------


@register(
    "agg_meta_analysis_fixed_effect",
    doc="Meta-analysis across nations treated as independent studies: "
    "each nation estimates the BUILDING-minus-MACHINERY balance "
    "difference with its own standard error, the pooled fixed-effect "
    "estimate is the inverse-variance weighted mean, and Cochran's Q "
    "with I² = (Q−df)/Q quantifies cross-study heterogeneity — the "
    "evidence-synthesis shape for 'same experiment, many markets'.  "
    "One conditional aggregate to 25 study rows, closed form after.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH study AS (
  SELECT c_nationkey AS nat,
         avg(CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal END)
         - avg(CASE WHEN c_mktsegment = 'MACHINERY' THEN c_acctbal END)
           AS eff,
         var_samp(CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal END)
           / count(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 END)
         + var_samp(CASE WHEN c_mktsegment = 'MACHINERY' THEN c_acctbal END)
           / count(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 END) AS se2
  FROM customer
  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
  GROUP BY c_nationkey
  HAVING count(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 END) >= 2
     AND count(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 END) >= 2
), pool AS (
  SELECT count(*) AS k,
         sum(eff / se2) / sum(1 / se2) AS pooled,
         sqrt(1 / sum(1 / se2)) AS pooled_se
  FROM study
), q AS (
  SELECT sum(pow(eff - pool.pooled, 2) / se2) AS q_stat
  FROM study, pool
)
SELECT pool.k AS n_studies,
       round(pool.pooled, 4) AS pooled_effect,
       round(pool.pooled_se, 4) AS pooled_se,
       round(q.q_stat, 4) AS cochran_q,
       round(greatest(0, (q.q_stat - (pool.k - 1)) / q.q_stat), 6)
         AS i_squared
FROM pool, q
""",
)
def agg_meta_analysis_fixed_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    in_b = F.when(F.col("c_mktsegment") == "BUILDING", F.col("c_acctbal"))
    in_m = F.when(F.col("c_mktsegment") == "MACHINERY", F.col("c_acctbal"))
    study = (
        cust.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .groupBy(F.col("c_nationkey").alias("nat"))
        .agg(
            (F.avg(in_b) - F.avg(in_m)).alias("eff"),
            # try_divide: a zero-count segment (possible at tiny SF) must
            # yield NULL like DuckDB's x/0, not the ANSI DIVIDE_BY_ZERO
            (
                F.try_divide(F.var_samp(in_b), F.count(in_b))
                + F.try_divide(F.var_samp(in_m), F.count(in_m))
            ).alias("se2"),
            F.count(in_b).alias("nb"),
            F.count(in_m).alias("nm"),
        )
        .filter((F.col("nb") >= 2) & (F.col("nm") >= 2))
    )
    inv_se2 = F.try_divide(F.lit(1.0), F.col("se2"))
    pool = study.agg(
        F.count(F.lit(1)).alias("k"),
        F.try_divide(
            F.sum(F.try_divide(F.col("eff"), F.col("se2"))), F.sum(inv_se2)
        ).alias("pooled"),
        F.sqrt(F.try_divide(F.lit(1.0), F.sum(inv_se2))).alias("pooled_se"),
    )
    q = (
        study.crossJoin(F.broadcast(pool.select("pooled")))
        .agg(
            F.sum(
                F.try_divide(
                    F.pow(F.col("eff") - F.col("pooled"), F.lit(2)), F.col("se2")
                )
            ).alias("q_stat")
        )
    )
    return (
        pool.crossJoin(F.broadcast(q))
        .select(
            F.col("k").alias("n_studies"),
            F.round("pooled", 4).alias("pooled_effect"),
            F.round("pooled_se", 4).alias("pooled_se"),
            F.round("q_stat", 4).alias("cochran_q"),
            F.round(
                F.greatest(
                    F.lit(0.0),
                    F.try_divide(F.col("q_stat") - (F.col("k") - 1), F.col("q_stat")),
                ),
                6,
            ).alias("i_squared"),
        )
    )


# ---------------------------------------------------------------------------
# W5 ext: Pettitt rank-based changepoint test
# ---------------------------------------------------------------------------


@register(
    "window_pettitt_changepoint",
    doc="Pettitt's nonparametric changepoint test on monthly revenue: "
    "U_t = 2·(cumulative midrank sum up to t) − t·(n+1) measures the "
    "rank imbalance of every possible split in one pass over the "
    "ranked ~80-month series, K = max|U_t| locates the most likely "
    "shift, and the approximate p-value 2·exp(−6K²/(n³+n²)) decides — "
    "the rank-robust sibling of window_cusum_changepoint, immune to "
    "the outlier months that drag a mean-based CUSUM.",
    tags=("window", "timeseries", "ext"),
    oracle="""
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS mon,
         round(sum(o_totalprice), 2) AS y
  FROM orders GROUP BY 1
), r AS (
  SELECT mon,
         (rank() OVER (ORDER BY y)
          + (count(*) OVER (PARTITION BY y) - 1) / 2.0) AS midrank,
         row_number() OVER (ORDER BY mon) AS t,
         count(*) OVER () AS n
  FROM m
), u AS (
  SELECT mon, t, n,
         2 * sum(midrank) OVER (ORDER BY t) - t * (n + 1.0) AS u_t
  FROM r
), k AS (
  SELECT mon, t, n, abs(u_t) AS au,
         row_number() OVER (ORDER BY abs(u_t) DESC, t) AS rn
  FROM u WHERE t < n
)
SELECT strftime(mon, '%Y-%m') AS change_month,
       CAST(t AS BIGINT) AS t_index,
       round(au, 1) AS k_stat,
       round(2 * exp(-6 * au * au / (pow(n, 3) + pow(n, 2))), 6)
         AS approx_p,
       2 * exp(-6 * au * au / (pow(n, 3) + pow(n, 2))) < 0.05
         AS significant
FROM k WHERE rn = 1
""",
)
def window_pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("y")
    )
    r = m.select(
        "mon",
        (
            F.rank().over(Window.orderBy("y"))
            + (F.count(F.lit(1)).over(Window.partitionBy("y")) - 1) / 2.0
        ).alias("midrank"),
        F.row_number().over(Window.orderBy("mon")).alias("t"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    u = r.select(
        "mon",
        "t",
        "n",
        (
            2 * F.sum("midrank").over(Window.orderBy("t"))
            - F.col("t") * (F.col("n") + 1.0)
        ).alias("u_t"),
    )
    k = (
        u.filter(F.col("t") < F.col("n"))
        .withColumn("au", F.abs(F.col("u_t")))
        .withColumn(
            "rn",
            F.row_number().over(Window.orderBy(F.desc("au"), "t")),
        )
        .filter(F.col("rn") == 1)
    )
    p = 2 * F.exp(
        -6 * F.col("au") * F.col("au")
        / (F.pow(F.col("n"), F.lit(3)) + F.pow(F.col("n"), F.lit(2)))
    )
    return k.select(
        F.date_format("mon", "yyyy-MM").alias("change_month"),
        F.col("t").cast("bigint").alias("t_index"),
        F.round("au", 1).alias("k_stat"),
        F.round(p, 6).alias("approx_p"),
        (p < 0.05).alias("significant"),
    )


# ---------------------------------------------------------------------------
# corpus ext: license/compliance contamination scan
# ---------------------------------------------------------------------------


@register(
    "corpus_license_scan",
    doc="License-contamination scan over the corpus: case-insensitive "
    "pattern census for copyright lines, SPDX-style license mentions "
    "and all-rights-reserved markers, rolled up per source with the "
    "flagged-document share — the compliance gate that runs before "
    "any training corpus ships.  One regexp projection + one "
    "aggregate; patterns are a broadcast constant at any scale.",
    tags=("corpus", "compliance", "ext"),
    oracle="""
WITH flags AS (
  SELECT source,
         CASE WHEN regexp_matches(lower(text), 'copyright|\\(c\\)')
              THEN 1 ELSE 0 END AS f_copy,
         CASE WHEN regexp_matches(lower(text),
                                  'license|gpl|apache|creative commons')
              THEN 1 ELSE 0 END AS f_lic,
         CASE WHEN regexp_matches(lower(text), 'all rights reserved')
              THEN 1 ELSE 0 END AS f_arr
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       sum(f_copy) AS n_copyright,
       sum(f_lic) AS n_license_terms,
       sum(f_arr) AS n_rights_reserved,
       round(avg(CASE WHEN f_copy + f_lic + f_arr > 0
                      THEN 1.0 ELSE 0.0 END), 6) AS flagged_share
FROM flags GROUP BY source ORDER BY source
""",
)
def corpus_license_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    f_copy = (F.regexp_count(low, F.lit("copyright|\\(c\\)")) > 0).cast("int")
    f_lic = (
        F.regexp_count(low, F.lit("license|gpl|apache|creative commons")) > 0
    ).cast("int")
    f_arr = (F.regexp_count(low, F.lit("all rights reserved")) > 0).cast("int")
    flags = docs.select(
        "source",
        f_copy.alias("f_copy"),
        f_lic.alias("f_lic"),
        f_arr.alias("f_arr"),
    )
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("f_copy").alias("n_copyright"),
            F.sum("f_lic").alias("n_license_terms"),
            F.sum("f_arr").alias("n_rights_reserved"),
            F.round(
                F.avg(
                    F.when(
                        F.col("f_copy") + F.col("f_lic") + F.col("f_arr") > 0,
                        1.0,
                    ).otherwise(0.0)
                ),
                6,
            ).alias("flagged_share"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# W5 ext: historical VaR and expected shortfall on monthly returns
# ---------------------------------------------------------------------------


@register(
    "window_historical_var_es",
    doc="Historical (empirical) value-at-risk and expected shortfall of "
    "monthly revenue log-returns: VaR95 is the rank-based 5th "
    "percentile return (an actual observation, engine-exact), ES is "
    "the mean of returns at or below it — the nonparametric risk "
    "pair that complements the parametric GPD tail fit "
    "(agg_pot_gpd_fit).  One lag window + one rank pick + one "
    "conditional mean.",
    tags=("window", "finance", "ext"),
    oracle="""
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS mon,
         round(sum(o_totalprice), 2) AS y
  FROM orders GROUP BY 1
), r AS (
  SELECT ln(y / lag(y) OVER (ORDER BY mon)) AS ret FROM m
), rr AS (
  SELECT ret,
         row_number() OVER (ORDER BY ret) AS rn,
         count(*) OVER () AS cnt
  FROM r WHERE ret IS NOT NULL
), var_ AS (
  SELECT ret AS var95 FROM rr
  WHERE rn = CAST(ceil(0.05 * cnt) AS BIGINT)
)
SELECT (SELECT count(*) FROM rr) AS n_returns,
       round((SELECT var95 FROM var_), 6) AS var_95,
       round((SELECT avg(ret) FROM rr, var_ WHERE ret <= var_.var95), 6)
         AS expected_shortfall_95,
       (SELECT avg(ret) FROM rr, var_ WHERE ret <= var_.var95)
         <= (SELECT var95 FROM var_) AS es_dominates_var
""",
)
def window_historical_var_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("y")
    )
    r = m.select(
        F.log(F.col("y") / F.lag("y").over(Window.orderBy("mon"))).alias("ret")
    ).filter(F.col("ret").isNotNull())
    rr = r.select(
        "ret",
        F.row_number().over(Window.orderBy("ret")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("cnt"),
    )
    var_ = rr.filter(
        F.col("rn") == F.ceil(0.05 * F.col("cnt")).cast("bigint")
    ).select(F.col("ret").alias("var95"))
    n = rr.agg(F.count(F.lit(1)).alias("n_returns"))
    es = (
        rr.crossJoin(F.broadcast(var_))
        .filter(F.col("ret") <= F.col("var95"))
        .agg(F.avg("ret").alias("es"))
    )
    return (
        n.crossJoin(F.broadcast(var_))
        .crossJoin(F.broadcast(es))
        .select(
            "n_returns",
            F.round("var95", 6).alias("var_95"),
            F.round("es", 6).alias("expected_shortfall_95"),
            (F.col("es") <= F.col("var95")).alias("es_dominates_var"),
        )
    )


# ---------------------------------------------------------------------------
# mlops ext: experiment seed isolation (cross-experiment independence)
# ---------------------------------------------------------------------------


@register(
    "mlops_experiment_seed_isolation",
    doc="Seed-isolation audit for layered experiments: the same user "
    "population split 50/50 under two different salts must overlap at "
    "≈50% (p²+q² for independent fair splits) — systematic overlap "
    "means experiment B inherits experiment A's assignment and their "
    "effects confound.  One distinct-user pass computing both arms, "
    "a 2×2 assignment table, and the chi-square independence check "
    "across salts.",
    tags=("mlops", "experiment", "ext"),
    oracle="""
WITH u AS (
  SELECT DISTINCT user_id,
         ascii(substring(md5('expA#' || user_id::VARCHAR), 1, 1)) % 2 AS a,
         ascii(substring(md5('expB#' || user_id::VARCHAR), 1, 1)) % 2 AS b
  FROM events
), cell AS (
  SELECT count(*) AS n,
         sum(a * b) AS n11,
         sum(a * (1 - b)) AS n10,
         sum((1 - a) * b) AS n01,
         sum((1 - a) * (1 - b)) AS n00
  FROM u
)
SELECT n,
       round((n11 + n00) * 1.0 / n, 6) AS same_arm_share,
       round(pow(n11 * n00 - n10 * n01, 2) * n * 1.0
             / ((n11 + n10) * (n01 + n00) * (n11 + n01) * (n10 + n00)), 4)
         AS chi2_independence,
       pow(n11 * n00 - n10 * n01, 2) * n * 1.0
       / ((n11 + n10) * (n01 + n00) * (n11 + n01) * (n10 + n00)) < 3.841
         AS salts_independent
FROM cell
""",
)
def mlops_experiment_seed_isolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    uid = F.col("user_id").cast("string")

    def _arm(salt: str):
        return (
            F.ascii(
                F.substring(
                    F.md5(F.concat(F.lit(salt + "#"), uid).cast("binary")), 1, 1
                )
            )
            % 2
        )

    u = ev.select("user_id").distinct().select(
        _arm("expA").alias("a"), _arm("expB").alias("b")
    )
    a, b = F.col("a"), F.col("b")
    cell = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(a * b).alias("n11"),
        F.sum(a * (1 - b)).alias("n10"),
        F.sum((1 - a) * b).alias("n01"),
        F.sum((1 - a) * (1 - b)).alias("n00"),
    )
    n = F.col("n")
    n11, n10, n01, n00 = F.col("n11"), F.col("n10"), F.col("n01"), F.col("n00")
    chi2 = (
        F.pow(n11 * n00 - n10 * n01, F.lit(2))
        * n
        / ((n11 + n10) * (n01 + n00) * (n11 + n01) * (n10 + n00))
    )
    return cell.select(
        "n",
        F.round((n11 + n00) / n, 6).alias("same_arm_share"),
        F.round(chi2, 4).alias("chi2_independence"),
        (chi2 < 3.841).alias("salts_independent"),
    )


# ---------------------------------------------------------------------------
# M3 ext: idempotency-key dedup of duplicated submissions
# ---------------------------------------------------------------------------


@register(
    "cdc_idempotency_key_dedup",
    doc="API-style idempotency: duplicate submissions (every seq "
    "divisible by 13 is re-sent with a bumped seq, synthesized "
    "deterministically) are suppressed by keep-first per idempotency "
    "key (table, original seq) — a window rank inside the key, the "
    "exactly-once admission the reference's Redis SETNX lock "
    "approximates per-process (rcache.py:36-42) done declaratively "
    "per-event.  Census: submissions in, uniques kept, dupes "
    "suppressed, and proof the kept stream has no key twice.",
    tags=("cdc", "ref:M3", "idempotency", "ext"),
    oracle=f"""
WITH ch AS ({ORDERS_CHANGELOG_SQL}),
submissions AS (
  SELECT seq AS idem_key, seq, cdc_action FROM ch
  UNION ALL
  SELECT seq AS idem_key, seq + 1000000, cdc_action
  FROM ch WHERE seq % 13 = 0
), ranked AS (
  SELECT idem_key, seq,
         row_number() OVER (PARTITION BY idem_key ORDER BY seq) AS rn
  FROM submissions
)
SELECT count(*) AS n_submissions,
       sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS n_admitted,
       sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS n_suppressed,
       (SELECT count(*) FROM (
          SELECT idem_key FROM ranked WHERE rn = 1
          GROUP BY idem_key HAVING count(*) > 1)) AS n_double_admits
FROM ranked
""",
)
def cdc_idempotency_key_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..sources.changelog import orders_changelog

    ch = orders_changelog(spark, sf_dir).select("seq", "cdc_action")
    dup = ch.filter(F.col("seq") % 13 == 0).select(
        F.col("seq").alias("idem_key"),
        (F.col("seq") + 1000000).alias("seq"),
        "cdc_action",
    )
    submissions = ch.select(
        F.col("seq").alias("idem_key"), "seq", "cdc_action"
    ).unionAll(dup)
    ranked = submissions.select(
        "idem_key",
        F.row_number()
        .over(Window.partitionBy("idem_key").orderBy("seq"))
        .alias("rn"),
    )
    admitted = ranked.filter(F.col("rn") == 1)
    double_admits = (
        admitted.groupBy("idem_key")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count(F.lit(1)).alias("n_double_admits"))
    )
    census = ranked.agg(
        F.count(F.lit(1)).alias("n_submissions"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_admitted"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("n_suppressed"),
    )
    return census.crossJoin(F.broadcast(double_admits))


# ---------------------------------------------------------------------------
# A6 ext: propensity-score stratified treatment effect
# ---------------------------------------------------------------------------


@register(
    "agg_propensity_stratified_effect",
    doc="Observational causal workflow from counts alone: treatment = "
    "above-median balance, propensity P(treated | segment, nation) "
    "estimated as the cell share (the saturated-covariate analogue "
    "of a logistic fit), units stratified into propensity quintiles, "
    "and the urgent-order outcome contrast pooled across strata "
    "weighted by stratum size — confounding by observed covariates "
    "removed without any ML library.  Naive vs stratified effect "
    "side by side; rank-based quintile edges keep both engines "
    "exact.",
    tags=("agg", "causal", "ext"),
    oracle="""
WITH med AS (
  SELECT bal AS m FROM (
    SELECT round(c_acctbal, 2) AS bal,
           row_number() OVER (ORDER BY round(c_acctbal, 2), c_custkey) AS rn,
           count(*) OVER () AS cnt
    FROM customer
  ) WHERE rn = CAST(ceil(0.5 * cnt) AS BIGINT)
), f AS (
  SELECT c.c_custkey,
         any_value(c.c_mktsegment) AS seg,
         any_value(c.c_nationkey) AS nat,
         CASE WHEN any_value(round(c.c_acctbal, 2)) > (SELECT m FROM med)
              THEN 1 ELSE 0 END AS treat,
         max(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS y
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
), ps AS (
  SELECT seg, nat, avg(treat * 1.0) AS p FROM f GROUP BY seg, nat
), scored AS (
  SELECT f.treat, f.y,
         ntile(5) OVER (ORDER BY ps.p, f.seg, f.nat, f.c_custkey) AS stratum
  FROM f JOIN ps ON ps.seg = f.seg AND ps.nat = f.nat
), strata AS (
  SELECT stratum, count(*) AS n,
         avg(CASE WHEN treat = 1 THEN y * 1.0 END)
         - avg(CASE WHEN treat = 0 THEN y * 1.0 END) AS diff
  FROM scored GROUP BY stratum
  HAVING count(CASE WHEN treat = 1 THEN 1 END) > 0
     AND count(CASE WHEN treat = 0 THEN 1 END) > 0
)
SELECT (SELECT round(avg(CASE WHEN treat = 1 THEN y * 1.0 END)
                     - avg(CASE WHEN treat = 0 THEN y * 1.0 END), 6)
        FROM f) AS naive_effect,
       round(sum(n * diff) / sum(n), 6) AS stratified_effect,
       count(*) AS n_strata_used
FROM strata
""",
)
def agg_propensity_stratified_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    bal = F.round("c_acctbal", 2)
    ranked = cust.select(
        bal.alias("bal"),
        F.row_number().over(Window.orderBy(bal, "c_custkey")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("cnt"),
    )
    med = ranked.filter(
        F.col("rn") == F.ceil(0.5 * F.col("cnt")).cast("bigint")
    ).select(F.col("bal").alias("m"))
    f = (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.any_value("c_mktsegment").alias("seg"),
            F.any_value("c_nationkey").alias("nat"),
            F.any_value(F.round("c_acctbal", 2)).alias("bal"),
            F.max(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("y"),
        )
        .crossJoin(F.broadcast(med))
        .withColumn(
            "treat", F.when(F.col("bal") > F.col("m"), 1).otherwise(0)
        )
    )
    ps = f.groupBy("seg", "nat").agg(
        F.avg(F.col("treat").cast("double")).alias("p")
    )
    scored = f.join(F.broadcast(ps), ["seg", "nat"]).select(
        "treat",
        "y",
        F.ntile(5)
        .over(Window.orderBy("p", "seg", "nat", "c_custkey"))
        .alias("stratum"),
    )
    y_t = F.when(F.col("treat") == 1, F.col("y").cast("double"))
    y_c = F.when(F.col("treat") == 0, F.col("y").cast("double"))
    strata = (
        scored.groupBy("stratum")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.avg(y_t) - F.avg(y_c)).alias("diff"),
            F.count(y_t).alias("nt"),
            F.count(y_c).alias("nc"),
        )
        .filter((F.col("nt") > 0) & (F.col("nc") > 0))
    )
    naive = f.agg(
        F.round(F.avg(y_t) - F.avg(y_c), 6).alias("naive_effect")
    )
    pooled = strata.agg(
        F.round(
            F.sum(F.col("n") * F.col("diff")) / F.sum("n"), 6
        ).alias("stratified_effect"),
        F.count(F.lit(1)).alias("n_strata_used"),
    )
    return naive.crossJoin(F.broadcast(pooled))


# ---------------------------------------------------------------------------
# W5 ext: up/down capture ratios of a segment vs the market
# ---------------------------------------------------------------------------


@register(
    "window_updown_capture",
    doc="Up-capture / down-capture of the BUILDING segment's monthly "
    "revenue returns against the whole market's: mean segment return "
    "conditioned on market-up months over mean market-up return, and "
    "the mirror for down months — the asymmetry profile (captures "
    "more upside than downside?) that a single beta hides.  One "
    "two-series fold + one lag window + one conditional aggregate.",
    tags=("window", "finance", "ext"),
    oracle="""
WITH m AS (
  SELECT date_trunc('month', o.o_orderdate) AS mon,
         round(sum(o.o_totalprice), 2) AS y_all,
         round(sum(CASE WHEN c.c_mktsegment = 'BUILDING'
                        THEN o.o_totalprice ELSE 0 END), 2) AS y_seg
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1
), r AS (
  SELECT CASE WHEN y_all > 0 AND lag(y_all) OVER (ORDER BY mon) > 0
              THEN ln(y_all / lag(y_all) OVER (ORDER BY mon)) END AS rm,
         CASE WHEN y_seg > 0 AND lag(y_seg) OVER (ORDER BY mon) > 0
              THEN ln(y_seg / lag(y_seg) OVER (ORDER BY mon)) END AS rs
  FROM m
)
SELECT count(CASE WHEN rm > 0 THEN 1 END) AS n_up_months,
       count(CASE WHEN rm < 0 THEN 1 END) AS n_down_months,
       round(avg(CASE WHEN rm > 0 THEN rs END)
             / avg(CASE WHEN rm > 0 THEN rm END), 4) AS up_capture,
       round(avg(CASE WHEN rm < 0 THEN rs END)
             / avg(CASE WHEN rm < 0 THEN rm END), 4) AS down_capture
FROM r WHERE rm IS NOT NULL
""",
)
def window_updown_capture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    m = (
        orders.join(F.broadcast(cust), cust.c_custkey == orders.o_custkey)
        .groupBy(F.date_trunc("month", "o_orderdate").alias("mon"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("y_all"),
            F.round(
                F.sum(
                    F.when(
                        F.col("c_mktsegment") == "BUILDING",
                        F.col("o_totalprice"),
                    ).otherwise(0.0)
                ),
                2,
            ).alias("y_seg"),
        )
    )
    w = Window.orderBy("mon")
    prev_all = F.lag("y_all").over(w)
    prev_seg = F.lag("y_seg").over(w)
    r = m.select(
        F.when(
            (F.col("y_all") > 0) & (prev_all > 0),
            F.log(F.col("y_all") / prev_all),
        ).alias("rm"),
        F.when(
            (F.col("y_seg") > 0) & (prev_seg > 0),
            F.log(F.col("y_seg") / prev_seg),
        ).alias("rs"),
    ).filter(F.col("rm").isNotNull())
    up = F.col("rm") > 0
    dn = F.col("rm") < 0
    return r.agg(
        F.count(F.when(up, 1)).alias("n_up_months"),
        F.count(F.when(dn, 1)).alias("n_down_months"),
        F.round(
            F.avg(F.when(up, F.col("rs"))) / F.avg(F.when(up, F.col("rm"))), 4
        ).alias("up_capture"),
        F.round(
            F.avg(F.when(dn, F.col("rs"))) / F.avg(F.when(dn, F.col("rm"))), 4
        ).alias("down_capture"),
    )


# ---------------------------------------------------------------------------
# graph ext: HITS hub/authority scores (two unrolled iterations)
# ---------------------------------------------------------------------------


@register(
    "graph_hits_iterations",
    doc="Kleinberg's HITS on the directed event-transition graph "
    "(src→dst edges weighted by transition count): two unrolled "
    "hub/authority updates — a(v)=Σ h(u) over in-edges, h(u)=Σ a(v) "
    "over out-edges, L1-normalized each pass — the mutually-"
    "reinforcing fixpoint PageRank's single score cannot express.  "
    "Each step is one broadcast join + one 5-row aggregate; scores "
    "per state after iteration two.",
    tags=("graph", "events", "ext"),
    oracle="""
WITH seq AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS dst
  FROM events
), e AS (
  SELECT src, dst, count(*) * 1.0 AS w FROM seq WHERE dst IS NOT NULL
  GROUP BY src, dst
), nodes AS (
  SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION SELECT dst FROM e)
), h0 AS (SELECT v, 1.0 AS h FROM nodes),
a1r AS (
  SELECT e.dst AS v, sum(e.w * h0.h) AS a
  FROM e JOIN h0 ON h0.v = e.src GROUP BY e.dst
), a1 AS (SELECT v, a / (SELECT sum(a) FROM a1r) AS a FROM a1r),
h1r AS (
  SELECT e.src AS v, sum(e.w * a1.a) AS h
  FROM e JOIN a1 ON a1.v = e.dst GROUP BY e.src
), h1 AS (SELECT v, h / (SELECT sum(h) FROM h1r) AS h FROM h1r),
a2r AS (
  SELECT e.dst AS v, sum(e.w * h1.h) AS a
  FROM e JOIN h1 ON h1.v = e.src GROUP BY e.dst
), a2 AS (SELECT v, a / (SELECT sum(a) FROM a2r) AS a FROM a2r),
h2r AS (
  SELECT e.src AS v, sum(e.w * a2.a) AS h
  FROM e JOIN a2 ON a2.v = e.dst GROUP BY e.src
), h2 AS (SELECT v, h / (SELECT sum(h) FROM h2r) AS h FROM h2r)
SELECT n.v AS state,
       round(coalesce(a2.a, 0), 6) AS authority,
       round(coalesce(h2.h, 0), 6) AS hub
FROM nodes n
LEFT JOIN a2 ON a2.v = n.v
LEFT JOIN h2 ON h2.v = n.v
ORDER BY state
""",
)
def graph_hits_iterations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("dst"),
    ).filter(F.col("dst").isNotNull())
    e = seq.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("double").alias("w")
    )
    nodes = (
        e.select(F.col("src").alias("v"))
        .unionAll(e.select(F.col("dst").alias("v")))
        .distinct()
    )
    h = nodes.select("v", F.lit(1.0).alias("h"))

    def _norm(df: DataFrame, col: str) -> DataFrame:
        tot = df.agg(F.sum(col).alias("_tot"))
        return df.crossJoin(F.broadcast(tot)).select(
            "v", (F.col(col) / F.col("_tot")).alias(col)
        )

    a = None
    for _ in range(2):
        hb = F.broadcast(h.select(F.col("v").alias("hv"), "h"))
        a = _norm(
            e.join(hb, F.col("src") == F.col("hv"))
            .groupBy(F.col("dst").alias("v"))
            .agg(F.sum(F.col("w") * F.col("h")).alias("a")),
            "a",
        )
        ab = F.broadcast(a.select(F.col("v").alias("av"), "a"))
        h = _norm(
            e.join(ab, F.col("dst") == F.col("av"))
            .groupBy(F.col("src").alias("v"))
            .agg(F.sum(F.col("w") * F.col("a")).alias("h")),
            "h",
        )
    return (
        nodes.join(a.withColumnRenamed("a", "authority"), "v", "left")
        .join(h.withColumnRenamed("h", "hub"), "v", "left")
        .select(
            F.col("v").alias("state"),
            F.round(F.coalesce(F.col("authority"), F.lit(0.0)), 6).alias(
                "authority"
            ),
            F.round(F.coalesce(F.col("hub"), F.lit(0.0)), 6).alias("hub"),
        )
        .orderBy("state")
    )


# ---------------------------------------------------------------------------
# A6 ext: Freedman-Diaconis data-driven histogram
# ---------------------------------------------------------------------------


@register(
    "agg_freedman_diaconis_hist",
    doc="Histogram with the bin width chosen by the data: the Freedman-"
    "Diaconis rule h = 2·IQR/n^⅓ from rank-based quartiles, the "
    "implied bin count, and the resulting distribution of order "
    "values — the adaptive sibling of the fixed-width "
    "agg_price_histogram, showing the two-pass shape (statistics, "
    "then binning with the broadcast width) any auto-binning "
    "profiler uses.  Bin edges floor-aligned so both engines agree "
    "exactly; ten most-populated bins shown.",
    tags=("agg", "histogram", "ext"),
    oracle="""
WITH v AS (
  SELECT round(o_totalprice, 2) AS x FROM orders
), r AS (
  SELECT x, row_number() OVER (ORDER BY x) AS rn, count(*) OVER () AS n
  FROM v
), q AS (
  SELECT max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN x END) AS q1,
         max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN x END) AS q3,
         any_value(n) AS n
  FROM r
), w AS (
  SELECT round(2 * (q3 - q1) / pow(n, 1.0 / 3), 2) AS h, n FROM q
), binned AS (
  SELECT CAST(floor(v.x / w.h) AS BIGINT) AS bin, w.h,
         count(*) AS n_orders
  FROM v, w GROUP BY 1, 2
)
SELECT bin, round(bin * h, 2) AS bin_lo, n_orders,
       round(any_value(h), 2) AS fd_width
FROM binned GROUP BY bin, h, n_orders
ORDER BY n_orders DESC, bin LIMIT 10
""",
)
def agg_freedman_diaconis_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    v = orders.select(F.round("o_totalprice", 2).alias("x"))
    r = v.select(
        "x",
        F.row_number().over(Window.orderBy("x")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    at = lambda p: F.max(  # noqa: E731
        F.when(
            F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("bigint"),
            F.col("x"),
        )
    )
    q = r.agg(at(0.25).alias("q1"), at(0.75).alias("q3"), F.any_value("n").alias("n"))
    w = q.select(
        F.round(
            2 * (F.col("q3") - F.col("q1")) / F.pow(F.col("n"), F.lit(1.0 / 3)),
            2,
        ).alias("h")
    )
    binned = (
        v.crossJoin(F.broadcast(w))
        .groupBy(
            F.floor(F.col("x") / F.col("h")).cast("bigint").alias("bin"), "h"
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        binned.select(
            "bin",
            F.round(F.col("bin") * F.col("h"), 2).alias("bin_lo"),
            "n_orders",
            F.round(F.col("h"), 2).alias("fd_width"),
        )
        .orderBy(F.desc("n_orders"), "bin")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# text ext: suffix-stemming vocabulary compression census
# ---------------------------------------------------------------------------


@register(
    "text_suffix_stemming_census",
    doc="Stemming-lite: strip the four regular English suffixes "
    "(-ing, -ed, -es, -s, longest first, guarded by a 3-char stem "
    "minimum) in one nested-CASE projection, then measure what it "
    "buys — vocabulary size before/after, compression ratio, and "
    "the merge census (stems absorbing the most surface forms).  "
    "The normalization step between tokenization and the vocab "
    "builders (text_oov_rate_profile, corpus_vocab_growth), with "
    "its effect quantified instead of assumed.",
    tags=("text", "normalization", "ext"),
    oracle="""
WITH tok AS (
  SELECT DISTINCT unnest(string_split(regexp_replace(lower(trim(text)),
                                                     '\\s+', ' ', 'g'), ' '))
           AS w
  FROM documents
), stem AS (
  SELECT w,
         CASE
           WHEN length(w) >= 6 AND w LIKE '%ing'
             THEN substring(w, 1, length(w) - 3)
           WHEN length(w) >= 5 AND w LIKE '%ed'
             THEN substring(w, 1, length(w) - 2)
           WHEN length(w) >= 5 AND w LIKE '%es'
             THEN substring(w, 1, length(w) - 2)
           WHEN length(w) >= 4 AND w LIKE '%s'
             THEN substring(w, 1, length(w) - 1)
           ELSE w END AS s
  FROM tok
), merge AS (
  SELECT s, count(*) AS n_forms FROM stem GROUP BY s
)
SELECT (SELECT count(*) FROM tok) AS vocab_before,
       (SELECT count(*) FROM merge) AS vocab_after,
       round((SELECT count(*) FROM merge) * 1.0
             / (SELECT count(*) FROM tok), 6) AS compression,
       (SELECT max(n_forms) FROM merge) AS max_forms_per_stem,
       (SELECT count(*) FROM merge WHERE n_forms > 1) AS n_merging_stems
""",
)
def text_suffix_stemming_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import textstats as ts

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(ts.tokens(F.col("text"))).alias("w")).distinct()
    w = F.col("w")
    ln = F.length(w)
    stem = tok.select(
        "w",
        F.when(
            (ln >= 6) & w.endswith("ing"), F.expr("substring(w, 1, length(w) - 3)")
        )
        .when((ln >= 5) & w.endswith("ed"), F.expr("substring(w, 1, length(w) - 2)"))
        .when((ln >= 5) & w.endswith("es"), F.expr("substring(w, 1, length(w) - 2)"))
        .when((ln >= 4) & w.endswith("s"), F.expr("substring(w, 1, length(w) - 1)"))
        .otherwise(w)
        .alias("s"),
    )
    merge = stem.groupBy("s").agg(F.count(F.lit(1)).alias("n_forms"))
    before = tok.agg(F.count(F.lit(1)).alias("vocab_before"))
    after = merge.agg(
        F.count(F.lit(1)).alias("vocab_after"),
        F.max("n_forms").alias("max_forms_per_stem"),
        F.sum(F.when(F.col("n_forms") > 1, 1).otherwise(0)).alias(
            "n_merging_stems"
        ),
    )
    return (
        before.crossJoin(F.broadcast(after))
        .select(
            "vocab_before",
            "vocab_after",
            F.round(F.col("vocab_after") / F.col("vocab_before"), 6).alias(
                "compression"
            ),
            "max_forms_per_stem",
            "n_merging_stems",
        )
    )


# ---------------------------------------------------------------------------
# A6 ext: Oaxaca-Blinder decomposition of a group mean gap
# ---------------------------------------------------------------------------


@register(
    "agg_oaxaca_blinder",
    doc="Oaxaca-Blinder two-fold decomposition of the BUILDING−MACHINERY "
    "mean-balance gap over the nation covariate: the explained part "
    "Σ(w_B−w_M)·m_M applies MACHINERY's within-nation means to the "
    "composition difference, the unexplained part Σw_B·(m_B−m_M) is "
    "the within-nation residual — the labor-economics standard for "
    "'how much of the gap is mix, how much is rate'.  One cell "
    "aggregate per group, closed-form reassembly; the identity "
    "explained+unexplained = total gap is emitted as the check.",
    tags=("agg", "causal", "ext"),
    oracle="""
WITH cell AS (
  SELECT c_nationkey AS nat, c_mktsegment AS seg,
         count(*) AS n, avg(c_acctbal) AS m
  FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
  GROUP BY 1, 2
), w AS (
  SELECT nat,
         max(CASE WHEN seg = 'BUILDING' THEN n END) * 1.0
           / sum(max(CASE WHEN seg = 'BUILDING' THEN n END))
             OVER () AS wb,
         max(CASE WHEN seg = 'MACHINERY' THEN n END) * 1.0
           / sum(max(CASE WHEN seg = 'MACHINERY' THEN n END))
             OVER () AS wm,
         max(CASE WHEN seg = 'BUILDING' THEN m END) AS mb,
         max(CASE WHEN seg = 'MACHINERY' THEN m END) AS mm
  FROM cell GROUP BY nat
), ok AS (
  SELECT * FROM w
  WHERE wb IS NOT NULL AND wm IS NOT NULL
    AND mb IS NOT NULL AND mm IS NOT NULL
), parts AS (
  SELECT sum((wb - wm) * mm) AS explained,
         sum(wb * (mb - mm)) AS unexplained,
         sum(wb * mb) - sum(wm * mm) AS total_gap
  FROM ok
)
SELECT round(total_gap, 4) AS total_gap,
       round(explained, 4) AS explained_mix,
       round(unexplained, 4) AS unexplained_within,
       round(abs(total_gap - explained - unexplained), 6) < 0.001
         AS identity_holds
FROM parts
""",
)
def agg_oaxaca_blinder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer")
    cell = (
        cust.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .groupBy(
            F.col("c_nationkey").alias("nat"),
            F.col("c_mktsegment").alias("seg"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.avg("c_acctbal").alias("m"))
    )
    w_all = Window.partitionBy()
    nb = F.max(F.when(F.col("seg") == "BUILDING", F.col("n")))
    nm = F.max(F.when(F.col("seg") == "MACHINERY", F.col("n")))
    mb = F.max(F.when(F.col("seg") == "BUILDING", F.col("m")))
    mm = F.max(F.when(F.col("seg") == "MACHINERY", F.col("m")))
    w = cell.groupBy("nat").agg(
        nb.alias("nb"), nm.alias("nm"), mb.alias("mb"), mm.alias("mm")
    ).select(
        "nat",
        (F.col("nb") / F.sum("nb").over(w_all)).alias("wb"),
        (F.col("nm") / F.sum("nm").over(w_all)).alias("wm"),
        "mb",
        "mm",
    )
    ok = w.filter(
        F.col("wb").isNotNull()
        & F.col("wm").isNotNull()
        & F.col("mb").isNotNull()
        & F.col("mm").isNotNull()
    )
    parts = ok.agg(
        F.sum((F.col("wb") - F.col("wm")) * F.col("mm")).alias("explained"),
        F.sum(F.col("wb") * (F.col("mb") - F.col("mm"))).alias("unexplained"),
        (
            F.sum(F.col("wb") * F.col("mb")) - F.sum(F.col("wm") * F.col("mm"))
        ).alias("total_gap"),
    )
    return parts.select(
        F.round("total_gap", 4).alias("total_gap"),
        F.round("explained", 4).alias("explained_mix"),
        F.round("unexplained", 4).alias("unexplained_within"),
        (
            F.round(
                F.abs(
                    F.col("total_gap") - F.col("explained") - F.col("unexplained")
                ),
                6,
            )
            < 0.001
        ).alias("identity_holds"),
    )


# ---------------------------------------------------------------------------
# events ext: extremal index via runs declustering
# ---------------------------------------------------------------------------


@register(
    "events_extremal_index_declustering",
    doc="Dependent-extremes correction for the burst analyses: hourly "
    "event counts exceeding their P95 are declustered by the runs "
    "rule (exceedances closer than 3 hours belong to one storm), and "
    "the extremal index θ ≈ clusters/exceedances measures how much "
    "the effective number of independent extremes shrinks — the "
    "quantity that must multiply the GPD return levels "
    "(agg_pot_gpd_fit) before they mean anything on clustered data.  "
    "Rank threshold + lag islands, all on the hourly fold.",
    tags=("events", "extremes", "ext"),
    oracle="""
WITH h AS (
  SELECT date_trunc('hour', ts) AS hr, count(*) AS n FROM events GROUP BY 1
), thr AS (
  SELECT n AS u FROM (
    SELECT n, row_number() OVER (ORDER BY n) AS rn, count(*) OVER () AS cnt
    FROM h
  ) WHERE rn = CAST(ceil(0.95 * cnt) AS BIGINT)
), exc AS (
  SELECT hr FROM h, thr WHERE h.n > thr.u
), runs AS (
  SELECT hr,
         CASE WHEN date_diff('hour',
                             lag(hr) OVER (ORDER BY hr), hr) > 3
              OR lag(hr) OVER (ORDER BY hr) IS NULL
              THEN 1 ELSE 0 END AS new_cluster
  FROM exc
)
SELECT (SELECT u FROM thr) AS threshold,
       count(*) AS n_exceedances,
       sum(new_cluster) AS n_clusters,
       round(sum(new_cluster) * 1.0 / count(*), 6) AS extremal_index
FROM runs
""",
)
def events_extremal_index_declustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.count(F.lit(1)).alias("n")
    )
    r = h.select(
        "n",
        F.row_number().over(Window.orderBy("n")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("cnt"),
    )
    thr = r.filter(
        F.col("rn") == F.ceil(0.95 * F.col("cnt")).cast("bigint")
    ).select(F.col("n").alias("u"))
    exc = h.crossJoin(F.broadcast(thr)).filter(F.col("n") > F.col("u")).select(
        "hr", "u"
    )
    prev = F.lag("hr").over(Window.orderBy("hr"))
    new_cluster = F.when(
        prev.isNull()
        | ((F.unix_timestamp("hr") - F.unix_timestamp(prev)) / 3600 > 3),
        1,
    ).otherwise(0)
    runs = exc.select("u", new_cluster.alias("new_cluster"))
    return runs.agg(
        F.any_value("u").alias("threshold"),
        F.count(F.lit(1)).alias("n_exceedances"),
        F.sum("new_cluster").alias("n_clusters"),
        F.round(F.sum("new_cluster") / F.count(F.lit(1)), 6).alias(
            "extremal_index"
        ),
    )


# ---------------------------------------------------------------------------
# text ext: the first BPE merge, as a distributed aggregate
# ---------------------------------------------------------------------------


@register(
    "text_bpe_first_merge",
    doc="Byte-pair encoding's core step, distributed: words decompose to "
    "character symbols, adjacent symbol pairs count across the corpus "
    "weighted by word frequency (one explode + aggregate), and the "
    "winning pair is the first merge a BPE tokenizer would learn — "
    "plus the corpus-wide compression that single merge buys "
    "(occurrences merged / total symbols).  Training a real vocab "
    "iterates exactly this aggregate; one step proves the shape "
    "(the iteration pattern is the Markov/k-means loop).",
    tags=("text", "tokenizer", "ext"),
    oracle="""
WITH words AS (
  SELECT w, count(*) AS freq FROM (
    SELECT unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                              'g'), ' ')) AS w
    FROM documents
  ) WHERE length(w) >= 2 GROUP BY w
), pairs AS (
  SELECT substring(w, p.i, 2) AS pair, sum(freq) AS n
  FROM words,
       LATERAL unnest(range(1, length(w))) p(i)
  GROUP BY 1
), best AS (
  SELECT pair, n FROM pairs ORDER BY n DESC, pair LIMIT 1
), totals AS (
  SELECT sum(freq * length(w)) AS total_symbols FROM words
)
SELECT best.pair AS merge_pair,
       best.n AS n_occurrences,
       totals.total_symbols,
       round(best.n * 1.0 / totals.total_symbols, 6) AS merge_coverage
FROM best, totals
""",
)
def text_bpe_first_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import textstats as ts

    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(ts.tokens(F.col("text"))).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = (
        words.select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w) - 1),"
                    " i -> substring(w, i, 2))"
                )
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("freq").alias("n"))
    )
    best = pairs.orderBy(F.desc("n"), "pair").limit(1)
    totals = words.agg(
        F.sum(F.col("freq") * F.length("w")).alias("total_symbols")
    )
    return (
        best.crossJoin(F.broadcast(totals))
        .select(
            F.col("pair").alias("merge_pair"),
            F.col("n").alias("n_occurrences"),
            "total_symbols",
            F.round(F.col("n") / F.col("total_symbols"), 6).alias(
                "merge_coverage"
            ),
        )
    )


# ---------------------------------------------------------------------------
# A6 ext: Holm step-down multiple-testing correction
# ---------------------------------------------------------------------------


@register(
    "agg_holm_stepdown",
    doc="Holm's step-down correction over the same per-nation z-tests as "
    "the Benjamini-Hochberg entry: p-values ranked ascending, the "
    "i-th compared against α/(m−i+1), rejection stops at the first "
    "failure (a running-AND via min-over-prefix window) — the FWER "
    "side of the multiple-testing house, stricter than BH's FDR.  "
    "Same logistic normal-CDF approximation so p-values are "
    "bit-identical across engines; rejected count under each method "
    "side by side.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH g AS (
  SELECT c_nationkey AS nat, count(*) AS n, avg(c_acctbal) AS m,
         var_samp(c_acctbal) AS v
  FROM customer GROUP BY c_nationkey
), tot AS (
  SELECT sum(n * m) / sum(n) AS grand FROM g
), z AS (
  SELECT nat,
         abs((m - tot.grand) / sqrt(v / n)) AS az
  FROM g, tot
), p AS (
  SELECT nat,
         2 * (1 - 1 / (1 + exp(-1.702 * az))) AS pval
  FROM z
), ranked AS (
  SELECT nat, pval,
         row_number() OVER (ORDER BY pval, nat) AS i,
         count(*) OVER () AS m_tests
  FROM p
), holm AS (
  SELECT nat, pval, i,
         min(CASE WHEN pval <= 0.10 / (m_tests - i + 1)
                  THEN 1 ELSE 0 END)
           OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS pass_chain
  FROM ranked
)
SELECT count(*) AS m_tests,
       sum(pass_chain) AS holm_rejections,
       round(min(pval), 6) AS min_p,
       coalesce(round(max(CASE WHEN pass_chain = 1 THEN pval END), 6),
                -1.0) AS largest_rejected_p
FROM holm
""",
)
def agg_holm_stepdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer")
    g = cust.groupBy(F.col("c_nationkey").alias("nat")).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("c_acctbal").alias("m"),
        F.var_samp("c_acctbal").alias("v"),
    )
    tot = g.agg((F.sum(F.col("n") * F.col("m")) / F.sum("n")).alias("grand"))
    z = g.crossJoin(F.broadcast(tot)).select(
        "nat",
        F.abs(
            (F.col("m") - F.col("grand")) / F.sqrt(F.col("v") / F.col("n"))
        ).alias("az"),
    )
    p = z.select(
        "nat",
        (2 * (1 - 1 / (1 + F.exp(-1.702 * F.col("az"))))).alias("pval"),
    )
    ranked = p.select(
        "nat",
        "pval",
        F.row_number().over(Window.orderBy("pval", "nat")).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("m_tests"),
    )
    passes = F.when(
        F.col("pval") <= 0.10 / (F.col("m_tests") - F.col("i") + 1), 1
    ).otherwise(0)
    holm = ranked.select(
        "pval",
        F.min(passes)
        .over(Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0))
        .alias("pass_chain"),
    )
    return holm.agg(
        F.count(F.lit(1)).alias("m_tests"),
        F.sum("pass_chain").alias("holm_rejections"),
        F.round(F.min("pval"), 6).alias("min_p"),
        F.coalesce(
            F.round(
                F.max(F.when(F.col("pass_chain") == 1, F.col("pval"))), 6
            ),
            F.lit(-1.0),
        ).alias("largest_rejected_p"),
    )


# ---------------------------------------------------------------------------
# A6 ext: coupon-collector coverage check (expected vs observed distinct)
# ---------------------------------------------------------------------------


@register(
    "agg_coupon_collector_check",
    doc="Coupon-collector sanity check of the basket model: for each "
    "basket-size bucket, the observed mean number of DISTINCT brands "
    "per order vs the uniform-draw expectation B·(1−(1−1/B)^n) — "
    "agreement says brands land in baskets like independent uniform "
    "draws, a persistent gap exposes brand clustering that the "
    "association miners (basket_brand_pair_lift) then explain.  Two "
    "aggregates; the expectation is closed form per bucket.",
    tags=("agg", "probability", "ext"),
    oracle="""
WITH b AS (
  SELECT l_orderkey, count(*) AS n_lines,
         count(DISTINCT p_brand) AS n_brands
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY l_orderkey
), nb AS (SELECT count(DISTINCT p_brand) * 1.0 AS B FROM part),
buckets AS (
  SELECT n_lines, count(*) AS n_orders, avg(n_brands) AS obs_mean
  FROM b GROUP BY n_lines
)
SELECT n_lines, n_orders,
       round(obs_mean, 4) AS observed_mean_brands,
       round(nb.B * (1 - pow(1 - 1 / nb.B, n_lines)), 4)
         AS expected_mean_brands,
       -- + 0.0 collapses IEEE -0.0 to +0.0 (a tiny negative difference
       -- rounds to -0.0 here but to 0.0 in Spark; the driver's hash is
       -- bit-sensitive)
       round(obs_mean - nb.B * (1 - pow(1 - 1 / nb.B, n_lines)), 4) + 0.0
         AS gap
FROM buckets, nb
ORDER BY n_lines
""",
)
def agg_coupon_collector_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = (
        li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.countDistinct("p_brand").alias("n_brands"),
        )
    )
    nb = part.agg(F.countDistinct("p_brand").cast("double").alias("B"))
    buckets = b.groupBy("n_lines").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.avg("n_brands").alias("obs_mean"),
    )
    expected = F.col("B") * (
        1 - F.pow(1 - 1 / F.col("B"), F.col("n_lines"))
    )
    return (
        buckets.crossJoin(F.broadcast(nb))
        .select(
            "n_lines",
            "n_orders",
            F.round("obs_mean", 4).alias("observed_mean_brands"),
            F.round(expected, 4).alias("expected_mean_brands"),
            # + 0.0 collapses IEEE -0.0 to +0.0 (mirrors the oracle)
            (F.round(F.col("obs_mean") - expected, 4) + F.lit(0.0)).alias("gap"),
        )
        .orderBy("n_lines")
    )


# ---------------------------------------------------------------------------
# P8 ext: run-length encode ∘ decode roundtrip (columnar primitive)
# ---------------------------------------------------------------------------


@register(
    "scalar_rle_roundtrip",
    doc="Run-length encoding as window algebra, proven lossless: the "
    "order-status sequence (by orderkey) collapses to (value, "
    "run_length) pairs via the islands construction, re-expands "
    "through sequence+explode, and the roundtrip is verified "
    "position-by-position against the original — the columnar "
    "compression primitive (sibling of the delta-encode entry) whose "
    "compression ratio is also the sortedness diagnostic of the "
    "column.  Entirely windows, HOFs and one anti-join-style check.",
    tags=("scalar", "compression", "ext"),
    oracle="""
WITH s AS (
  SELECT o_orderkey, o_orderstatus AS v,
         row_number() OVER (ORDER BY o_orderkey) AS pos
  FROM orders
), chg AS (
  SELECT pos, v,
         CASE WHEN v IS DISTINCT FROM lag(v) OVER (ORDER BY pos)
              THEN 1 ELSE 0 END AS is_new
  FROM s
), isl AS (
  SELECT pos, v, sum(is_new) OVER (ORDER BY pos) AS run_id FROM chg
), rle AS (
  SELECT run_id, any_value(v) AS v, min(pos) AS start_pos,
         count(*) AS run_len
  FROM isl GROUP BY run_id
), decoded AS (
  SELECT start_pos + p.i AS pos, v
  FROM rle, LATERAL unnest(range(0, run_len)) p(i)
), diff AS (
  SELECT count(*) AS n_mismatches
  FROM s FULL OUTER JOIN decoded d ON d.pos = s.pos
  WHERE s.v IS DISTINCT FROM d.v
)
SELECT (SELECT count(*) FROM s) AS n_values,
       (SELECT count(*) FROM rle) AS n_runs,
       round((SELECT count(*) FROM rle) * 1.0
             / (SELECT count(*) FROM s), 6) AS compression_ratio,
       (SELECT max(run_len) FROM rle) AS longest_run,
       (SELECT n_mismatches FROM diff) = 0 AS roundtrip_exact
""",
)
def scalar_rle_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    s = orders.select(
        F.col("o_orderstatus").alias("v"),
        F.row_number().over(Window.orderBy("o_orderkey")).alias("pos"),
    )
    w = Window.orderBy("pos")
    isl = s.select(
        "pos",
        "v",
        F.sum(
            F.when(
                ~F.col("v").eqNullSafe(F.lag("v").over(w)), 1
            ).otherwise(0)
        )
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("run_id"),
    )
    rle = isl.groupBy("run_id").agg(
        F.any_value("v").alias("v"),
        F.min("pos").alias("start_pos"),
        F.count(F.lit(1)).alias("run_len"),
    )
    decoded = rle.select(
        F.col("v").alias("dv"),
        F.explode(
            F.sequence(
                F.col("start_pos"), F.col("start_pos") + F.col("run_len") - 1
            )
        ).alias("pos"),
    )
    diff = (
        s.join(decoded, "pos", "full_outer")
        .filter(~F.col("v").eqNullSafe(F.col("dv")))
        .agg(F.count(F.lit(1)).alias("n_mismatches"))
    )
    stats = s.agg(F.count(F.lit(1)).alias("n_values"))
    rstats = rle.agg(
        F.count(F.lit(1)).alias("n_runs"),
        F.max("run_len").alias("longest_run"),
    )
    return (
        stats.crossJoin(F.broadcast(rstats))
        .crossJoin(F.broadcast(diff))
        .select(
            "n_values",
            "n_runs",
            F.round(F.col("n_runs") / F.col("n_values"), 6).alias(
                "compression_ratio"
            ),
            "longest_run",
            (F.col("n_mismatches") == 0).alias("roundtrip_exact"),
        )
    )


# ---------------------------------------------------------------------------
# text ext: hapax / dis legomena lexical profile
# ---------------------------------------------------------------------------


@register(
    "text_hapax_ratio",
    doc="Hapax legomena profile per source: the share of vocabulary "
    "appearing exactly once (and twice — dis legomena), plus "
    "Sichel's S = dis/vocab — the lexical-richness fingerprint "
    "whose ~50% hapax share is remarkably stable across natural "
    "corpora and whose collapse flags templated or deduplicated "
    "text.  One explode + two aggregates; pairs with Heaps "
    "(corpus_vocab_growth) and Zipf (text_zipf_slope).",
    tags=("text", "corpus", "ext"),
    oracle="""
WITH tok AS (
  SELECT source,
         unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                            'g'), ' ')) AS t
  FROM documents
), tf AS (
  SELECT source, t, count(*) AS n FROM tok GROUP BY source, t
)
SELECT source,
       count(*) AS vocab,
       sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS hapax,
       sum(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS dis,
       round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS hapax_ratio,
       round(sum(CASE WHEN n = 2 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS sichel_s
FROM tf GROUP BY source ORDER BY source
""",
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import textstats as ts

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(ts.tokens(F.col("text"))).alias("t"))
    tf = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("n"))
    hapax = F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
    dis = F.sum(F.when(F.col("n") == 2, 1).otherwise(0))
    return (
        tf.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("vocab"),
            hapax.alias("hapax"),
            dis.alias("dis"),
            F.round(hapax / F.count(F.lit(1)), 6).alias("hapax_ratio"),
            F.round(dis / F.count(F.lit(1)), 6).alias("sichel_s"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# W5 ext: Hampel filter despiking (rolling median ± 3·MAD)
# ---------------------------------------------------------------------------


@register(
    "window_hampel_despike",
    doc="Hampel despiking of the daily event-count series: each point is "
    "compared against its 7-point rolling MEDIAN ± 3×1.4826×rolling "
    "MAD — both robust statistics computed inside one collect_list "
    "frame with array_sort + element_at (no UDF), so a single wild "
    "spike cannot poison its own detection the way a rolling "
    "mean/σ filter lets it.  Spikes flagged and the despiked "
    "replacement value (the local median) emitted; census output.",
    tags=("window", "robust", "timeseries", "ext"),
    oracle="""
WITH d AS (
  SELECT row_number() OVER (ORDER BY date_trunc('day', ts)) AS t,
         count(*) * 1.0 AS y
  FROM events GROUP BY date_trunc('day', ts)
), fr AS (
  SELECT t, y,
         list_sort(list(y) OVER (ORDER BY t ROWS BETWEEN 3 PRECEDING
                                 AND 3 FOLLOWING)) AS win
  FROM d
), med AS (
  SELECT t, y, win,
         win[CAST(ceil(len(win) / 2.0) AS BIGINT)] AS m
  FROM fr
), mad AS (
  SELECT t, y, m,
         list_sort(list_transform(win, x -> abs(x - m)))
           [CAST(ceil(len(win) / 2.0) AS BIGINT)] AS md
  FROM med
)
SELECT count(*) AS n_days,
       sum(CASE WHEN abs(y - m) > 3 * 1.4826 * md THEN 1 ELSE 0 END)
         AS n_spikes,
       round(avg(CASE WHEN abs(y - m) > 3 * 1.4826 * md
                      THEN abs(y - m) END), 4) AS mean_spike_magnitude,
       round(sum(CASE WHEN abs(y - m) > 3 * 1.4826 * md
                      THEN m ELSE y END) / sum(y), 6) AS despiked_mass_ratio
FROM mad
""",
)
def window_hampel_despike(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    ).select(F.row_number().over(Window.orderBy("day")).alias("t"), "y")
    w = Window.orderBy("t").rowsBetween(-3, 3)
    fr = d.select(
        "t", "y", F.array_sort(F.collect_list("y").over(w)).alias("win")
    )
    mid = F.ceil(F.size("win") / 2.0).cast("int")
    med = fr.select(
        "t", "y", "win", F.element_at("win", mid).alias("m")
    )
    mad = med.select(
        "y",
        "m",
        F.element_at(
            F.array_sort(
                F.transform(F.col("win"), lambda x: F.abs(x - F.col("m")))
            ),
            F.ceil(F.size("win") / 2.0).cast("int"),
        ).alias("md"),
    )
    spike = F.abs(F.col("y") - F.col("m")) > 3 * 1.4826 * F.col("md")
    return mad.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.when(spike, 1).otherwise(0)).alias("n_spikes"),
        F.round(
            F.avg(F.when(spike, F.abs(F.col("y") - F.col("m")))), 4
        ).alias("mean_spike_magnitude"),
        F.round(
            F.sum(F.when(spike, F.col("m")).otherwise(F.col("y"))) / F.sum("y"),
            6,
        ).alias("despiked_mass_ratio"),
    )


# ---------------------------------------------------------------------------
# graph ext: bow-tie reachability classification around a hub state
# ---------------------------------------------------------------------------


@register(
    "graph_bowtie_classification",
    doc="Bow-tie decomposition of the event-type digraph around the "
    "'purchase' hub: states that reach it within 3 hops (IN side), "
    "states it reaches (OUT side), both (CORE), neither (TENDRILS) — "
    "forward and backward frontiers each expand as the bounded "
    "broadcast-join iteration, and the classification is two "
    "membership flags.  The reachability census web-graph and "
    "dependency analyses run, on the behavioural flow graph.",
    tags=("graph", "events", "ext"),
    oracle="""
WITH seq AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS dst
  FROM events
), e AS (
  SELECT DISTINCT src, dst FROM seq WHERE dst IS NOT NULL AND src <> dst
), nodes AS (
  SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION SELECT dst FROM e)
), fwd AS (  -- reachable FROM purchase (OUT side)
  SELECT DISTINCT dst AS v FROM e WHERE src = 'purchase'
  UNION
  SELECT DISTINCT e2.dst FROM e e1 JOIN e e2 ON e2.src = e1.dst
  WHERE e1.src = 'purchase'
  UNION
  SELECT DISTINCT e3.dst FROM e e1
  JOIN e e2 ON e2.src = e1.dst
  JOIN e e3 ON e3.src = e2.dst
  WHERE e1.src = 'purchase'
), bwd AS (  -- states that REACH purchase (IN side)
  SELECT DISTINCT src AS v FROM e WHERE dst = 'purchase'
  UNION
  SELECT DISTINCT e1.src FROM e e1 JOIN e e2 ON e2.src = e1.dst
  WHERE e2.dst = 'purchase'
  UNION
  SELECT DISTINCT e1.src FROM e e1
  JOIN e e2 ON e2.src = e1.dst
  JOIN e e3 ON e3.src = e2.dst
  WHERE e3.dst = 'purchase'
)
SELECT n.v AS state,
       CASE WHEN n.v = 'purchase' THEN 'HUB'
            WHEN f.v IS NOT NULL AND b.v IS NOT NULL THEN 'CORE'
            WHEN b.v IS NOT NULL THEN 'IN'
            WHEN f.v IS NOT NULL THEN 'OUT'
            ELSE 'TENDRIL' END AS bowtie_class
FROM nodes n
LEFT JOIN fwd f ON f.v = n.v
LEFT JOIN bwd b ON b.v = n.v
ORDER BY state
""",
)
def graph_bowtie_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("dst"),
    ).filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
    e = seq.distinct()
    nodes = (
        e.select(F.col("src").alias("v"))
        .unionAll(e.select(F.col("dst").alias("v")))
        .distinct()
    )

    def _reach(start_col: str, step_out: str) -> DataFrame:
        frontier = e.filter(F.col(start_col) == "purchase").select(
            F.col(step_out).alias("v")
        ).distinct()
        seen = frontier
        for _ in range(2):
            nxt = (
                e.join(
                    F.broadcast(frontier),
                    F.col(start_col if start_col == "dst" else "src")
                    == F.col("v"),
                )
                .select(F.col(step_out).alias("v2"))
                .distinct()
                .withColumnRenamed("v2", "v")
            )
            seen = seen.unionAll(nxt).distinct()
            frontier = nxt
        return seen

    fwd = _reach("src", "dst")  # reachable from purchase
    bwd = _reach("dst", "src")  # reaches purchase
    fb = F.broadcast(fwd.withColumnRenamed("v", "fv"))
    bb = F.broadcast(bwd.withColumnRenamed("v", "bv"))
    cls = (
        F.when(F.col("v") == "purchase", "HUB")
        .when(F.col("fv").isNotNull() & F.col("bv").isNotNull(), "CORE")
        .when(F.col("bv").isNotNull(), "IN")
        .when(F.col("fv").isNotNull(), "OUT")
        .otherwise("TENDRIL")
    )
    return (
        nodes.join(fb, nodes.v == F.col("fv"), "left")
        .join(bb, nodes.v == F.col("bv"), "left")
        .select(F.col("v").alias("state"), cls.alias("bowtie_class"))
        .orderBy("state")
    )


# ---------------------------------------------------------------------------
# A6 ext: net promoter score from value-decile proxy ratings
# ---------------------------------------------------------------------------


@register(
    "agg_net_promoter_score",
    doc="NPS per market segment with balance deciles standing in for the "
    "0-10 survey scale (deciles 9-10 promote, 1-6 detract — the "
    "standard cut): one deterministic ntile window, one conditional "
    "aggregate, promoters-minus-detractors in points.  The "
    "executive-dashboard number, demonstrating the ordinal-collapse "
    "pattern any Likert-scale rollup uses.",
    tags=("agg", "product", "ext"),
    oracle="""
WITH d AS (
  SELECT c_mktsegment AS seg,
         ntile(10) OVER (ORDER BY round(c_acctbal, 2), c_custkey) AS decile
  FROM customer
)
SELECT seg, count(*) AS n,
       sum(CASE WHEN decile >= 9 THEN 1 ELSE 0 END) AS promoters,
       sum(CASE WHEN decile <= 6 THEN 1 ELSE 0 END) AS detractors,
       round((sum(CASE WHEN decile >= 9 THEN 1 ELSE 0 END)
              - sum(CASE WHEN decile <= 6 THEN 1 ELSE 0 END)) * 100.0
             / count(*), 2) AS nps
FROM d GROUP BY seg ORDER BY seg
""",
)
def agg_net_promoter_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer")
    d = cust.select(
        F.col("c_mktsegment").alias("seg"),
        F.ntile(10)
        .over(Window.orderBy(F.round("c_acctbal", 2), "c_custkey"))
        .alias("decile"),
    )
    prom = F.sum(F.when(F.col("decile") >= 9, 1).otherwise(0))
    detr = F.sum(F.when(F.col("decile") <= 6, 1).otherwise(0))
    return (
        d.groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n"),
            prom.alias("promoters"),
            detr.alias("detractors"),
            F.round((prom - detr) * 100.0 / F.count(F.lit(1)), 2).alias("nps"),
        )
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# W5 ext: mean-reversion half-life via the AR(1) slope
# ---------------------------------------------------------------------------


@register(
    "agg_mean_reversion_half_life",
    doc="Ornstein-Uhlenbeck-style mean-reversion half-life of monthly "
    "revenue: regress Δy on the lagged level (one lag window + one "
    "regr_slope), φ = 1+slope is the AR(1) coefficient, and "
    "half-life = −ln2/ln φ months says how fast shocks decay — the "
    "number that separates a mean-reverting series (trade the "
    "deviations) from a random walk (don't).  Emitted with the "
    "random-walk verdict at |slope| ≈ 0.",
    tags=("agg", "timeseries", "ext"),
    oracle="""
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS mon,
         round(sum(o_totalprice), 2) AS y
  FROM orders GROUP BY 1
), r AS (
  SELECT y - lag(y) OVER (ORDER BY mon) AS dy,
         lag(y) OVER (ORDER BY mon) AS y_prev
  FROM m
), fit AS (
  SELECT count(*) AS n_obs,
         regr_slope(dy, y_prev) AS b
  FROM r WHERE dy IS NOT NULL
)
SELECT n_obs,
       round(b, 6) AS ar1_slope,
       round(1 + b, 6) AS phi,
       round(-ln(2) / ln(1 + b), 2) AS half_life_months,
       abs(b) < 0.05 AS near_random_walk
FROM fit WHERE b > -1 AND b < 0
""",
)
def agg_mean_reversion_half_life(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("y")
    )
    w = Window.orderBy("mon")
    r = m.select(
        (F.col("y") - F.lag("y").over(w)).alias("dy"),
        F.lag("y").over(w).alias("y_prev"),
    ).filter(F.col("dy").isNotNull())
    fit = r.agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.regr_slope(F.col("dy"), F.col("y_prev")).alias("b"),
    )
    b = F.col("b")
    return fit.filter((b > -1) & (b < 0)).select(
        "n_obs",
        F.round(b, 6).alias("ar1_slope"),
        F.round(1 + b, 6).alias("phi"),
        F.round(-F.log(F.lit(2.0)) / F.log(1 + b), 2).alias(
            "half_life_months"
        ),
        (F.abs(b) < 0.05).alias("near_random_walk"),
    )


# ---------------------------------------------------------------------------
# J2 ext: role-playing date dimension (one dim, two roles)
# ---------------------------------------------------------------------------


@register(
    "join_role_playing_dates",
    doc="Role-playing dimension, the Kimball staple: ONE generated "
    "calendar relation joined twice under different roles — order "
    "date and ship date — so the same conformed attributes (weekend "
    "flag, quarter) describe both legs of each lineitem's lifecycle "
    "without duplicating the dimension.  Both joins broadcast the "
    "731-row calendar; the output contrasts weekend shares by role, "
    "which a single-role model cannot even express.",
    tags=("join", "dimension", "ext"),
    oracle="""
WITH cal AS (
  SELECT CAST(unnest(range(DATE '1995-01-01', DATE '2002-01-01',
                           INTERVAL 1 DAY)) AS DATE) AS d,
         isodow(CAST(unnest(range(DATE '1995-01-01', DATE '2002-01-01',
                                  INTERVAL 1 DAY)) AS DATE)) >= 6
           AS is_weekend
), j AS (
  SELECT co.is_weekend AS ordered_weekend,
         cs.is_weekend AS shipped_weekend
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN cal co ON co.d = CAST(o.o_orderdate AS DATE)
  JOIN cal cs ON cs.d = CAST(l.l_shipdate AS DATE)
)
SELECT count(*) AS n_lines,
       round(avg(CASE WHEN ordered_weekend THEN 1.0 ELSE 0.0 END), 6)
         AS ordered_weekend_share,
       round(avg(CASE WHEN shipped_weekend THEN 1.0 ELSE 0.0 END), 6)
         AS shipped_weekend_share,
       sum(CASE WHEN ordered_weekend AND shipped_weekend
                THEN 1 ELSE 0 END) AS both_weekend
FROM j
""",
)
def join_role_playing_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    cal = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("2001-12-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("d")
    ).select("d", (F.expr("weekday(d)") >= 5).alias("is_weekend"))
    co = F.broadcast(
        cal.select(F.col("d").alias("od"), F.col("is_weekend").alias("ow"))
    )
    cs = F.broadcast(
        cal.select(F.col("d").alias("sd"), F.col("is_weekend").alias("sw"))
    )
    j = (
        li.join(orders, orders.o_orderkey == li.l_orderkey)
        .join(co, F.col("o_orderdate").cast("date") == F.col("od"))
        .join(cs, F.col("l_shipdate").cast("date") == F.col("sd"))
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.avg(F.when(F.col("ow"), 1.0).otherwise(0.0)), 6).alias(
            "ordered_weekend_share"
        ),
        F.round(F.avg(F.when(F.col("sw"), 1.0).otherwise(0.0)), 6).alias(
            "shipped_weekend_share"
        ),
        F.sum(F.when(F.col("ow") & F.col("sw"), 1).otherwise(0)).alias(
            "both_weekend"
        ),
    )


# ---------------------------------------------------------------------------
# text ext: MATTR (moving-average type-token ratio)
# ---------------------------------------------------------------------------


@register(
    "text_mattr_windowed",
    doc="MATTR — the moving-average type-token ratio that fixes plain "
    "TTR's length bias: within each document a 25-token sliding "
    "window (posexplode + ROWS frame of collect_list, distinct count "
    "via array_distinct) measures local diversity, averaged per "
    "document and rolled up per source next to the raw TTR it "
    "replaces.  Windows partition by document, so the frame never "
    "crosses a doc boundary and the shuffle key is doc_id.",
    tags=("text", "corpus", "ext"),
    oracle="""
WITH tok AS (
  SELECT doc_id, source, u.pos, u.w
  FROM (SELECT doc_id, source,
               string_split(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                           'g'), ' ') AS toks
        FROM documents) d,
       LATERAL (SELECT p.pos, d.toks[p.pos] AS w
                FROM unnest(range(1, len(d.toks) + 1)) p(pos)) u
), win AS (
  SELECT doc_id, source, pos,
         list(w) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN 24 PRECEDING AND CURRENT ROW) AS frame
  FROM tok
), full_w AS (
  SELECT doc_id, source,
         len(list_distinct(frame)) * 1.0 / len(frame) AS wttr
  FROM win WHERE len(frame) = 25
), per_doc AS (
  SELECT doc_id, source, avg(wttr) AS mattr FROM full_w
  GROUP BY doc_id, source
)
SELECT source,
       count(*) AS n_docs,
       round(avg(mattr), 6) AS mean_mattr,
       round(min(mattr), 6) AS min_mattr
FROM per_doc GROUP BY source ORDER BY source
""",
)
def text_mattr_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..operators import textstats as ts

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "source",
        F.posexplode(ts.tokens(F.col("text"))).alias("pos", "w"),
    )
    frame = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-24, 0)
    win = tok.select(
        "doc_id",
        "source",
        F.collect_list("w").over(frame).alias("frame"),
    )
    full_w = win.filter(F.size("frame") == 25).select(
        "doc_id",
        "source",
        (
            F.size(F.array_distinct("frame")) / F.size("frame")
        ).alias("wttr"),
    )
    per_doc = full_w.groupBy("doc_id", "source").agg(
        F.avg("wttr").alias("mattr")
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("mattr"), 6).alias("mean_mattr"),
            F.round(F.min("mattr"), 6).alias("min_mattr"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# A6 ext: log-rank test comparing two survival curves
# ---------------------------------------------------------------------------


@register(
    "agg_log_rank_test",
    doc="Log-rank test of fulfilment-duration survival between URGENT "
    "and other orders: at every event time the observed URGENT events "
    "are compared against the expectation under a common hazard "
    "(d·n₁/n from the shared risk set), the standardized sum is the "
    "log-rank chi-square — the hypothesis test that belongs with the "
    "KM / Nelson-Aalen / Weibull estimators already in the catalog.  "
    "Risk sets per group from running windows over the duration axis.",
    tags=("agg", "survival", "ext"),
    oracle="""
WITH dur AS (
  SELECT o.o_orderkey,
         CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS grp,
         date_diff('day', o.o_orderdate, max(l.l_shipdate)) AS t
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
  HAVING date_diff('day', o.o_orderdate, max(l.l_shipdate)) > 0
), cell AS (
  SELECT t,
         count(*) AS d,
         sum(grp) AS d1
  FROM dur GROUP BY t
), risk AS (
  SELECT t, d, d1,
         (SELECT count(*) FROM dur) - coalesce(
           sum(d) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS n,
         (SELECT sum(grp) FROM dur) - coalesce(
           sum(d1) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS n1
  FROM cell
), s AS (
  SELECT sum(d1) AS o1,
         sum(d * n1 * 1.0 / n) AS e1,
         sum(d * (n1 * 1.0 / n) * (1 - n1 * 1.0 / n)
             * (n - d) / nullif(n - 1, 0)) AS v
  FROM risk WHERE n > 0
)
SELECT CAST(o1 AS BIGINT) AS observed_urgent_events,
       round(e1, 4) AS expected_urgent_events,
       round(pow(o1 - e1, 2) / v, 4) AS logrank_chi2,
       pow(o1 - e1, 2) / v > 3.841 AS curves_differ
FROM s
""",
)
def agg_log_rank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dur = (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.datediff(F.max("l_shipdate"), F.first("o_orderdate")).alias("t"))
        .filter(F.col("t") > 0)
        .select(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("grp"),
            "t",
        )
    )
    totals = dur.agg(
        F.count(F.lit(1)).alias("nt"), F.sum("grp").alias("nt1")
    )
    cell = dur.groupBy("t").agg(
        F.count(F.lit(1)).alias("d"), F.sum("grp").alias("d1")
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = cell.crossJoin(F.broadcast(totals)).select(
        "t",
        "d",
        "d1",
        (F.col("nt") - F.coalesce(F.sum("d").over(w), F.lit(0))).alias("n"),
        (F.col("nt1") - F.coalesce(F.sum("d1").over(w), F.lit(0))).alias("n1"),
    )
    p1 = F.col("n1") / F.col("n")
    s = risk.filter(F.col("n") > 0).agg(
        F.sum("d1").alias("o1"),
        F.sum(F.col("d") * p1).alias("e1"),
        F.sum(
            F.col("d")
            * p1
            * (1 - p1)
            * (F.col("n") - F.col("d"))
            / F.nullif((F.col("n") - 1).cast("double"), F.lit(0.0))
        ).alias("v"),
    )
    chi2 = F.pow(F.col("o1") - F.col("e1"), F.lit(2)) / F.col("v")
    return s.select(
        F.col("o1").cast("bigint").alias("observed_urgent_events"),
        F.round("e1", 4).alias("expected_urgent_events"),
        F.round(chi2, 4).alias("logrank_chi2"),
        (chi2 > 3.841).alias("curves_differ"),
    )


# ---------------------------------------------------------------------------
# events ext: circular (directional) statistics of time-of-day
# ---------------------------------------------------------------------------


@register(
    "events_circular_time_stats",
    doc="Directional statistics for the time-of-day cycle, where linear "
    "means lie (23:00 and 01:00 average to noon): each event maps to "
    "an angle on the 24-hour circle, the mean resultant vector gives "
    "the circular mean hour and the concentration R (1 = all events "
    "at the same minute, 0 = uniform), plus circular variance — per "
    "event type, one trig aggregate pass.  The correct machinery "
    "under events_hourly_seasonality's histogram.",
    tags=("events", "stats", "ext"),
    oracle="""
WITH a AS (
  SELECT event_type,
         2 * pi() * (extract(hour FROM ts) * 3600
                     + extract(minute FROM ts) * 60
                     + extract(second FROM ts)) / 86400.0 AS theta
  FROM events
), s AS (
  SELECT event_type, count(*) AS n,
         avg(cos(theta)) AS c, avg(sin(theta)) AS s
  FROM a GROUP BY event_type
)
SELECT event_type, n,
       round(((atan2(s, c) + 2 * pi()) % (2 * pi())) * 24 / (2 * pi()), 4)
         AS circular_mean_hour,
       round(sqrt(c * c + s * s), 6) AS concentration_r,
       round(1 - sqrt(c * c + s * s), 6) AS circular_variance
FROM s ORDER BY event_type
""",
)
def events_circular_time_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    ev = load_table(spark, sf_dir, "events")
    secs = (
        F.hour("ts") * 3600 + F.minute("ts") * 60 + F.second("ts")
    ).cast("double")
    theta = 2 * math.pi * secs / 86400.0
    s = ev.select("event_type", theta.alias("theta")).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.cos("theta")).alias("c"),
        F.avg(F.sin("theta")).alias("s"),
    )
    two_pi = 2 * math.pi
    mean_angle = (F.atan2(F.col("s"), F.col("c")) + two_pi) % two_pi
    r = F.sqrt(F.col("c") * F.col("c") + F.col("s") * F.col("s"))
    return s.select(
        "event_type",
        "n",
        F.round(mean_angle * 24 / two_pi, 4).alias("circular_mean_hour"),
        F.round(r, 6).alias("concentration_r"),
        F.round(1 - r, 6).alias("circular_variance"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# eval ext: Youden J optimal cutpoint (ROC-side operating point)
# ---------------------------------------------------------------------------


@register(
    "mlops_youden_cutpoint",
    doc="Youden's J operating point for the balance→urgent classifier: "
    "the same decile-boundary sweep as mlops_threshold_sweep_f1 but "
    "scored on sensitivity+specificity−1 — the ROC-side optimum that "
    "ignores prevalence, where F1 bakes it in; when the two sweeps "
    "disagree on the cut, the prevalence sensitivity of the decision "
    "is the finding.  Suffix sums over 10 cells, argmax flagged.",
    tags=("mlops", "eval", "ext"),
    oracle="""
WITH flags AS (
  SELECT c.c_custkey, any_value(round(c.c_acctbal, 2)) AS bal,
         max(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS y
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
), d AS (
  SELECT y, ntile(10) OVER (ORDER BY bal, c_custkey) AS decile FROM flags
), cell AS (
  SELECT decile, sum(y) AS pos, sum(1 - y) AS neg FROM d GROUP BY decile
), sweep AS (
  SELECT decile AS cut_decile,
         sum(pos) OVER () - sum(pos) OVER (ORDER BY decile) AS tp,
         sum(neg) OVER () - sum(neg) OVER (ORDER BY decile) AS fp,
         sum(pos) OVER () AS tpos, sum(neg) OVER () AS tneg
  FROM cell
), j AS (
  SELECT cut_decile,
         tp * 1.0 / tpos AS sensitivity,
         1 - fp * 1.0 / tneg AS specificity
  FROM sweep WHERE cut_decile < 10
)
SELECT cut_decile,
       round(sensitivity, 6) AS sensitivity,
       round(specificity, 6) AS specificity,
       round(sensitivity + specificity - 1, 6) AS youden_j,
       sensitivity + specificity - 1
         = max(sensitivity + specificity - 1) OVER () AS is_best
FROM j ORDER BY cut_decile
""",
)
def mlops_youden_cutpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    flags = (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.any_value(F.round("c_acctbal", 2)).alias("bal"),
            F.max(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("y"),
        )
    )
    d = flags.select(
        "y", F.ntile(10).over(Window.orderBy("bal", "c_custkey")).alias("decile")
    )
    cell = d.groupBy("decile").agg(
        F.sum("y").alias("pos"), F.sum(1 - F.col("y")).alias("neg")
    )
    w_all = Window.partitionBy()
    w_cum = Window.orderBy("decile")
    sweep = cell.select(
        F.col("decile").alias("cut_decile"),
        (F.sum("pos").over(w_all) - F.sum("pos").over(w_cum)).alias("tp"),
        (F.sum("neg").over(w_all) - F.sum("neg").over(w_cum)).alias("fp"),
        F.sum("pos").over(w_all).alias("tpos"),
        F.sum("neg").over(w_all).alias("tneg"),
    ).filter(F.col("cut_decile") < 10)
    sens = F.col("tp") / F.col("tpos")
    spec = 1 - F.col("fp") / F.col("tneg")
    jdf = sweep.select(
        "cut_decile",
        F.round(sens, 6).alias("sensitivity"),
        F.round(spec, 6).alias("specificity"),
        F.round(sens + spec - 1, 6).alias("youden_j"),
        (sens + spec - 1).alias("_j"),
    )
    return (
        jdf.withColumn("is_best", F.col("_j") == F.max("_j").over(w_all))
        .drop("_j")
        .orderBy("cut_decile")
    )


# ---------------------------------------------------------------------------
# W5 ext: turning-points randomness test
# ---------------------------------------------------------------------------


@register(
    "window_turning_points_test",
    doc="Turning-points test of the monthly revenue series: interior "
    "months that are strict local peaks or troughs (two lags, one "
    "pass), counted against the i.i.d. expectation 2(n−2)/3 with "
    "variance (16n−29)/90 — the randomness screen that reads short-"
    "scale alternation where the runs test reads sign persistence "
    "and the record census reads trend.  One window + one aggregate.",
    tags=("window", "timeseries", "ext"),
    oracle="""
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS mon,
         round(sum(o_totalprice), 2) AS y
  FROM orders GROUP BY 1
), t AS (
  SELECT y,
         lag(y) OVER (ORDER BY mon) AS yp,
         lead(y) OVER (ORDER BY mon) AS yn,
         count(*) OVER () AS n
  FROM m
), tp AS (
  SELECT n,
         CASE WHEN (y > yp AND y > yn) OR (y < yp AND y < yn)
              THEN 1 ELSE 0 END AS is_turn
  FROM t WHERE yp IS NOT NULL AND yn IS NOT NULL
)
SELECT any_value(n) AS n_months,
       sum(is_turn) AS n_turning_points,
       round(2.0 * (any_value(n) - 2) / 3, 4) AS expected,
       round((sum(is_turn) - 2.0 * (any_value(n) - 2) / 3)
             / sqrt((16 * any_value(n) - 29) / 90.0), 4) AS z_stat
FROM tp
""",
)
def window_turning_points_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("y")
    )
    w = Window.orderBy("mon")
    t = m.select(
        "y",
        F.lag("y").over(w).alias("yp"),
        F.lead("y").over(w).alias("yn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    ).filter(F.col("yp").isNotNull() & F.col("yn").isNotNull())
    is_turn = F.when(
        ((F.col("y") > F.col("yp")) & (F.col("y") > F.col("yn")))
        | ((F.col("y") < F.col("yp")) & (F.col("y") < F.col("yn"))),
        1,
    ).otherwise(0)
    tp = t.select("n", is_turn.alias("is_turn"))
    n = F.any_value("n")
    expected = 2.0 * (n - 2) / 3
    return tp.agg(
        n.alias("n_months"),
        F.sum("is_turn").alias("n_turning_points"),
        F.round(expected, 4).alias("expected"),
        F.round(
            (F.sum("is_turn") - expected)
            / F.sqrt((16 * n - 29) / 90.0),
            4,
        ).alias("z_stat"),
    )


_FLEISS_ORACLE = f"""
WITH d AS (SELECT text, {_NORM} AS norm FROM documents),
t AS (SELECT text, string_split(norm, ' ') AS toks FROM d),
m AS (
  SELECT CAST(len(list_filter(toks, x -> list_contains({_STOP_SQL}, x)))
              / len(toks) >= 0.05 AS INT)
         + CAST(length(regexp_replace(text, '[^\\x00-\\x7F]', '', 'g'))
                * 1.0 / length(text) >= 0.99 AS INT)
         + CAST(length(regexp_replace(lower(text), '[^aeiou]', '', 'g'))
                * 1.0 / length(text) >= 0.25 AS INT) AS k_yes
  FROM t
), s AS (
  SELECT count(*) AS n_items,
         avg((k_yes * (k_yes - 1) + (3 - k_yes) * (2 - k_yes)) / 6.0)
           AS p_bar,
         sum(k_yes) / (3.0 * count(*)) AS p_yes
  FROM m
)
SELECT n_items,
       round(p_bar, 6) AS mean_agreement,
       round(p_yes, 6) AS yes_share,
       round((p_bar - (p_yes * p_yes + (1 - p_yes) * (1 - p_yes)))
             / (1 - (p_yes * p_yes + (1 - p_yes) * (1 - p_yes))), 6)
         AS fleiss_kappa
FROM s
"""



# ---------------------------------------------------------------------------
# eval ext: Fleiss' kappa across three heuristic raters
# ---------------------------------------------------------------------------


@register(
    "eval_fleiss_kappa_three_raters",
    doc="Fleiss' kappa over three independent 'raters' of English-ness — "
    "the stopword-density champion, the ascii-density challenger, and "
    "a vowel-ratio third opinion — each document getting 3 binary "
    "votes: per-item agreement P_i from the vote counts, chance "
    "agreement from the marginal category shares, κ = (P̄−P̄e)/(1−P̄e).  "
    "The ≥3-rater generalization of the Cohen's-kappa entry, one "
    "projection + two aggregates.",
    tags=("eval", "agreement", "ext"),
    oracle=_FLEISS_ORACLE,
)
def eval_fleiss_kappa_three_raters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import textstats as ts

    docs = load_table(spark, sf_dir, "documents")
    r1 = (ts.stopword_ratio(F.col("text")) >= 0.05).cast("int")
    ascii_ratio = F.length(
        F.regexp_replace(F.col("text"), "[^\\x00-\\x7F]", "")
    ) / F.length("text")
    r2 = (ascii_ratio >= 0.99).cast("int")
    vowel_ratio = F.length(
        F.regexp_replace(F.lower(F.col("text")), "[^aeiou]", "")
    ) / F.length("text")
    r3 = (vowel_ratio >= 0.25).cast("int")
    votes = docs.select((r1 + r2 + r3).alias("k_yes"))
    # per-item agreement with n=3 raters: P_i = (yes*(yes-1)+no*(no-1))/6
    k = F.col("k_yes")
    p_i = (k * (k - 1) + (3 - k) * (2 - k)) / 6.0
    s = votes.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.avg(p_i).alias("p_bar"),
        (F.sum(k) / (3.0 * F.count(F.lit(1)))).alias("p_yes"),
    )
    pe = F.col("p_yes") * F.col("p_yes") + (1 - F.col("p_yes")) * (
        1 - F.col("p_yes")
    )
    return s.select(
        "n_items",
        F.round("p_bar", 6).alias("mean_agreement"),
        F.round(F.col("p_yes"), 6).alias("yes_share"),
        F.round((F.col("p_bar") - pe) / (1 - pe), 6).alias("fleiss_kappa"),
    )


# ---------------------------------------------------------------------------
# A6 ext: gamma-Poisson empirical-Bayes rate shrinkage (with exposure)
# ---------------------------------------------------------------------------


@register(
    "agg_gamma_poisson_rate_shrinkage",
    doc="Empirical-Bayes shrinkage for RATES with unequal exposure — the "
    "gamma-Poisson companion of the beta-binomial entry: per-user "
    "daily event rates x/T (T = active-day exposure), a method-of-"
    "moments Gamma(α,β) prior fitted across users, posterior mean "
    "rate (x+α)/(T+β) — low-exposure users shrink toward the prior, "
    "heavy users keep their data.  The ranking fix for any "
    "per-entity rate leaderboard; top-5 biggest moves.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH u AS (
  SELECT user_id, count(*) AS x,
         count(DISTINCT date_trunc('day', ts)) AS t
  FROM events GROUP BY user_id
), mom AS (
  SELECT avg(x * 1.0 / t) AS mu, var_samp(x * 1.0 / t) AS s2 FROM u
), prior AS (
  SELECT mu * mu / s2 AS alpha, mu / s2 AS beta FROM mom
)
SELECT user_id, x, t,
       round(x * 1.0 / t, 6) AS raw_rate,
       round((x + alpha) / (t + beta), 6) AS eb_rate,
       round(alpha, 4) AS prior_alpha,
       round(beta, 4) AS prior_beta
FROM u, prior
ORDER BY abs(x * 1.0 / t - (x + alpha) / (t + beta)) DESC, user_id
LIMIT 5
""",
)
def agg_gamma_poisson_rate_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("x"),
        F.countDistinct(F.date_trunc("day", "ts")).alias("t"),
    )
    rate = F.col("x") / F.col("t")
    mom = u.agg(F.avg(rate).alias("mu"), F.var_samp(rate).alias("s2"))
    prior = mom.select(
        (F.col("mu") * F.col("mu") / F.col("s2")).alias("alpha"),
        (F.col("mu") / F.col("s2")).alias("beta"),
    )
    eb = (F.col("x") + F.col("alpha")) / (F.col("t") + F.col("beta"))
    return (
        u.crossJoin(F.broadcast(prior))
        .select(
            "user_id",
            "x",
            "t",
            F.round(rate, 6).alias("raw_rate"),
            F.round(eb, 6).alias("eb_rate"),
            F.round("alpha", 4).alias("prior_alpha"),
            F.round("beta", 4).alias("prior_beta"),
            F.abs(rate - eb).alias("_moved"),
        )
        .orderBy(F.desc("_moved"), "user_id")
        .limit(5)
        .drop("_moved")
    )


# ---------------------------------------------------------------------------
# events ext: overlap coefficients between event-type audiences
# ---------------------------------------------------------------------------


@register(
    "events_type_overlap_coefficients",
    doc="Audience overlap between event types by the Szymkiewicz-Simpson "
    "coefficient |A∩B|/min(|A|,|B|) next to Jaccard — overlap=1 reads "
    "as containment (every error-user also clicks) even when Jaccard "
    "is small, the asymmetry Jaccard alone hides.  Distinct user "
    "sets per type from one projection; the 10 type pairs intersect "
    "via a self-join on the user key.",
    tags=("events", "sets", "ext"),
    oracle="""
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
), sizes AS (
  SELECT event_type, count(*) AS n FROM ut GROUP BY event_type
), inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*) AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT i.type_a, i.type_b, i.n_both,
       round(i.n_both * 1.0 / least(sa.n, sb.n), 6) AS overlap_coef,
       round(i.n_both * 1.0 / (sa.n + sb.n - i.n_both), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.event_type = i.type_a
JOIN sizes sb ON sb.event_type = i.type_b
ORDER BY type_a, type_b
""",
)
def events_type_overlap_coefficients(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    sizes = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    inter = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = F.broadcast(
        sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    )
    sb = F.broadcast(
        sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    )
    return (
        inter.join(sa, "type_a")
        .join(sb, "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.round(
                F.col("n_both") / F.least(F.col("na"), F.col("nb")), 6
            ).alias("overlap_coef"),
            F.round(
                F.col("n_both")
                / (F.col("na") + F.col("nb") - F.col("n_both")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# A6 ext: delta-method standard error for a ratio metric
# ---------------------------------------------------------------------------


@register(
    "agg_delta_method_ratio_se",
    doc="Delta-method standard error of revenue-per-order per segment — "
    "the closed-form answer to 'what is the SE of a ratio of two "
    "correlated sums': Var(X̄/Ȳ) ≈ (μx/μy)²(σx²/μx² + σy²/μy² − "
    "2σxy/(μxμy))/n from one pass of moments and the covariance — the "
    "analytic companion of the jackknife CI entry, at one scan "
    "instead of one scan per left-out group.  Per-customer grain, "
    "95% interval emitted.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH u AS (
  SELECT c.c_mktsegment AS seg, c.c_custkey,
         coalesce(sum(o.o_totalprice), 0) AS rev,
         count(o.o_orderkey) AS n_ord
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, c.c_custkey
), s AS (
  SELECT seg, count(*) AS n,
         avg(rev) AS mx, avg(n_ord * 1.0) AS my,
         var_samp(rev) AS vx, var_samp(n_ord * 1.0) AS vy,
         covar_samp(rev, n_ord * 1.0) AS cxy
  FROM u GROUP BY seg
)
SELECT seg, n,
       round(mx / my, 4) AS revenue_per_order,
       round(abs(mx / my) * sqrt((vx / (mx * mx) + vy / (my * my)
                                  - 2 * cxy / (mx * my)) / n), 4)
         AS delta_se,
       round(mx / my - 1.96 * abs(mx / my)
             * sqrt((vx / (mx * mx) + vy / (my * my)
                     - 2 * cxy / (mx * my)) / n), 4) AS ci_lo,
       round(mx / my + 1.96 * abs(mx / my)
             * sqrt((vx / (mx * mx) + vy / (my * my)
                     - 2 * cxy / (mx * my)) / n), 4) AS ci_hi
FROM s ORDER BY seg
""",
)
def agg_delta_method_ratio_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    u = (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy(F.col("c_mktsegment").alias("seg"), "c_custkey")
        .agg(
            F.coalesce(F.sum("o_totalprice"), F.lit(0.0)).alias("rev"),
            F.count("o_orderkey").cast("double").alias("n_ord"),
        )
    )
    s = u.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("rev").alias("mx"),
        F.avg("n_ord").alias("my"),
        F.var_samp("rev").alias("vx"),
        F.var_samp("n_ord").alias("vy"),
        F.covar_samp("rev", "n_ord").alias("cxy"),
    )
    mx, my = F.col("mx"), F.col("my")
    ratio = mx / my
    rel_var = (
        F.col("vx") / (mx * mx)
        + F.col("vy") / (my * my)
        - 2 * F.col("cxy") / (mx * my)
    ) / F.col("n")
    se = F.abs(ratio) * F.sqrt(rel_var)
    return s.select(
        "seg",
        "n",
        F.round(ratio, 4).alias("revenue_per_order"),
        F.round(se, 4).alias("delta_se"),
        F.round(ratio - 1.96 * se, 4).alias("ci_lo"),
        F.round(ratio + 1.96 * se, 4).alias("ci_hi"),
    ).orderBy("seg")


# ---------------------------------------------------------------------------
# text ext: Chao1 estimator of unseen vocabulary
# ---------------------------------------------------------------------------


@register(
    "text_chao1_unseen_vocab",
    doc="Chao1 lower bound on TOTAL vocabulary including words never "
    "observed: S_obs + f1²/(2·f2) from the hapax (f1) and dis-"
    "legomena (f2) counts the lexical profile already computes — the "
    "capture-recapture idea applied to types, answering 'how much "
    "vocabulary would more crawling buy' before paying for the "
    "crawl.  Per source; coverage = S_obs/Ŝ is the stopping "
    "criterion.",
    tags=("text", "corpus", "ext"),
    oracle="""
WITH tf AS (
  SELECT source, t, count(*) AS n FROM (
    SELECT source,
           unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                              'g'), ' ')) AS t
    FROM documents
  ) GROUP BY source, t
), s AS (
  SELECT source,
         count(*) AS s_obs,
         sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS f1,
         sum(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS f2
  FROM tf GROUP BY source
)
SELECT source, s_obs, f1, f2,
       round(s_obs + f1 * (f1 - 1) / (2.0 * (f2 + 1)), 1) AS chao1_estimate,
       round(s_obs / (s_obs + f1 * (f1 - 1) / (2.0 * (f2 + 1))), 6)
         AS coverage
FROM s ORDER BY source
""",
)
def text_chao1_unseen_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import textstats as ts

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("source", F.explode(ts.tokens(F.col("text"))).alias("t"))
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    s = tf.groupBy("source").agg(
        F.count(F.lit(1)).alias("s_obs"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).alias("f1"),
        F.sum(F.when(F.col("n") == 2, 1).otherwise(0)).alias("f2"),
    )
    chao1 = F.col("s_obs") + F.col("f1") * (F.col("f1") - 1) / (
        2.0 * (F.col("f2") + 1)
    )
    return s.select(
        "source",
        "s_obs",
        "f1",
        "f2",
        F.round(chao1, 1).alias("chao1_estimate"),
        F.round(F.col("s_obs") / chao1, 6).alias("coverage"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# A6 ext: two-way fixed effects (within transformation) R²
# ---------------------------------------------------------------------------


@register(
    "agg_twoway_fixed_effects_r2",
    doc="Panel-econometrics within transformation: customer balances "
    "demeaned by BOTH segment and nation fixed effects "
    "(y − ȳ_seg − ȳ_nat + ȳ), with the variance absorbed by each "
    "margin and the residual share — how much of the outcome the two "
    "categorical structures explain before any regressor enters.  "
    "Two broadcast mean relations, one demeaning pass, one moment "
    "aggregate.",
    tags=("agg", "causal", "ext"),
    oracle="""
WITH g AS (SELECT avg(c_acctbal) AS grand FROM customer),
seg AS (
  SELECT c_mktsegment, avg(c_acctbal) AS ms FROM customer GROUP BY 1
), nat AS (
  SELECT c_nationkey, avg(c_acctbal) AS mn FROM customer GROUP BY 1
), d AS (
  SELECT c.c_acctbal - g.grand AS y_c,
         c.c_acctbal - seg.ms - nat.mn + g.grand AS resid
  FROM customer c
  JOIN seg ON seg.c_mktsegment = c.c_mktsegment
  JOIN nat ON nat.c_nationkey = c.c_nationkey
  CROSS JOIN g
)
SELECT count(*) AS n,
       round(var_pop(y_c), 2) AS total_var,
       round(var_pop(resid), 2) AS residual_var,
       round(1 - var_pop(resid) / var_pop(y_c), 6) AS twfe_r2
FROM d
""",
)
def agg_twoway_fixed_effects_r2(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    g = cust.agg(F.avg("c_acctbal").alias("grand"))
    seg = cust.groupBy("c_mktsegment").agg(F.avg("c_acctbal").alias("ms"))
    nat = cust.groupBy("c_nationkey").agg(F.avg("c_acctbal").alias("mn"))
    d = (
        cust.join(F.broadcast(seg), "c_mktsegment")
        .join(F.broadcast(nat), "c_nationkey")
        .crossJoin(F.broadcast(g))
        .select(
            (F.col("c_acctbal") - F.col("grand")).alias("y_c"),
            (
                F.col("c_acctbal")
                - F.col("ms")
                - F.col("mn")
                + F.col("grand")
            ).alias("resid"),
        )
    )
    return d.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.var_pop("y_c"), 2).alias("total_var"),
        F.round(F.var_pop("resid"), 2).alias("residual_var"),
        F.round(1 - F.var_pop("resid") / F.var_pop("y_c"), 6).alias(
            "twfe_r2"
        ),
    )


# ---------------------------------------------------------------------------
# graph ext: observed graph vs the Erdős-Rényi null model
# ---------------------------------------------------------------------------


@register(
    "graph_null_model_comparison",
    doc="Null-model benchmarking of the part co-purchase graph: the "
    "observed edge count fixes the Erdős-Rényi density p, and the "
    "observed triangle count is compared against the ER expectation "
    "C(n,3)·p³ — a triangle excess factor ≫1 is the quantitative "
    "'this graph is clustered, not random' verdict that transitivity "
    "alone doesn't calibrate.  Reuses the oriented triangle join; "
    "the null expectation is closed form.",
    tags=("graph", "join", "ext"),
    oracle="""
WITH edges AS (
  SELECT DISTINCT s1.l_partkey AS a, s2.l_partkey AS b
  FROM lineitem s1 JOIN lineitem s2
    ON s1.l_orderkey = s2.l_orderkey AND s1.l_partkey < s2.l_partkey
), nn AS (
  SELECT count(DISTINCT v) AS n FROM (
    SELECT a AS v FROM edges UNION ALL SELECT b FROM edges
  )
), m AS (SELECT count(*) AS m_edges FROM edges),
tri AS (
  SELECT count(*) AS n_tri
  FROM edges e1
  JOIN edges e2 ON e1.b = e2.a
  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
), calc AS (
  SELECT nn.n, m.m_edges, tri.n_tri,
         m.m_edges * 2.0 / (nn.n * (nn.n - 1)) AS p
  FROM nn, m, tri
)
SELECT n AS n_nodes, m_edges, n_tri AS observed_triangles,
       round(n * (n - 1.0) * (n - 2) / 6 * p * p * p, 2)
         AS expected_er_triangles,
       round(n_tri / (n * (n - 1.0) * (n - 2) / 6 * p * p * p), 4)
         AS triangle_excess
FROM calc
""",
)
def graph_null_model_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    s1 = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("a"))
    s2 = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("b"))
    edges = (
        s1.join(s2, "ok").where(F.col("a") < F.col("b")).select("a", "b").distinct()
    )
    nn = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .agg(F.countDistinct("v").alias("n"))
    )
    m = edges.agg(F.count(F.lit(1)).alias("m_edges"))
    e1 = edges
    e2 = edges.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = edges.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    tri = (
        e1.join(e2, "b")
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    calc = nn.crossJoin(F.broadcast(m)).crossJoin(F.broadcast(tri))
    n = F.col("n")
    p = F.col("m_edges") * 2.0 / (n * (n - 1))
    exp_tri = n * (n - 1.0) * (n - 2) / 6 * p * p * p
    return calc.select(
        n.alias("n_nodes"),
        "m_edges",
        F.col("n_tri").alias("observed_triangles"),
        F.round(exp_tri, 2).alias("expected_er_triangles"),
        F.round(F.col("n_tri") / exp_tri, 4).alias("triangle_excess"),
    )


# ---------------------------------------------------------------------------
# cdc ext: per-key hash-chain integrity (tamper-evident changelog)
# ---------------------------------------------------------------------------


@register(
    "cdc_hash_chain_integrity",
    doc="Tamper-evident audit chaining over the changelog: within each "
    "order key the events fold (seq order) through h_i = "
    "md5(h_{i−1} ‖ action ‖ payload) — a per-key hash chain computed "
    "as one JVM aggregate-HOF over the collected event list, so the "
    "chain head is a single 32-char column any downstream replica "
    "can recompute and compare.  The census groups keys by chain "
    "length and fingerprints the whole table as an md5 of sorted "
    "chain heads — byte-identical across engines and replicas, the "
    "anti-entropy primitive at audit-log strength.",
    tags=("cdc", "integrity", "ext"),
    oracle=f"""
WITH ch AS ({ORDERS_CHANGELOG_SQL}),
ev AS (
  SELECT o_orderkey, seq,
         cdc_action || '|' || coalesce(o_orderstatus, '~') || '|'
           || coalesce(CAST(round(o_totalprice, 2) AS VARCHAR), '~') AS leaf
  FROM ch WHERE o_orderkey IS NOT NULL
), chain AS (
  SELECT o_orderkey,
         count(*) AS n_events,
         list_reduce(list_prepend('genesis',
                                  list(leaf ORDER BY seq)),
                     (acc, x) -> md5(acc || x)) AS head
  FROM ev GROUP BY o_orderkey
), by_len AS (
  SELECT n_events, count(*) AS n_keys FROM chain GROUP BY n_events
)
SELECT (SELECT count(*) FROM chain) AS n_chains,
       (SELECT max(n_events) FROM chain) AS longest_chain,
       (SELECT count(*) FROM by_len) AS n_distinct_lengths,
       (SELECT md5(string_agg(head, '' ORDER BY head)) FROM chain)
         AS table_fingerprint
""",
)
def cdc_hash_chain_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.changelog import orders_changelog

    ch = orders_changelog(spark, sf_dir).filter(F.col("o_orderkey").isNotNull())
    leaf = F.concat_ws(
        "|",
        F.col("cdc_action"),
        F.coalesce(F.col("o_orderstatus"), F.lit("~")),
        F.coalesce(
            F.round("o_totalprice", 2).cast("string"), F.lit("~")
        ),
    )
    ev = ch.select("o_orderkey", "seq", leaf.alias("leaf"))
    chain = ev.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seq", "leaf"))),
                lambda s: s.leaf,
            ),
            F.lit("genesis"),
            lambda acc, x: F.md5(F.concat(acc, x).cast("binary")),
        ).alias("head"),
    )
    stats = chain.agg(
        F.count(F.lit(1)).alias("n_chains"),
        F.max("n_events").alias("longest_chain"),
        F.countDistinct("n_events").alias("n_distinct_lengths"),
    )
    fp = chain.agg(
        F.md5(
            F.concat_ws("", F.array_sort(F.collect_list("head"))).cast("binary")
        ).alias("table_fingerprint")
    )
    return stats.crossJoin(F.broadcast(fp))


# ---------------------------------------------------------------------------
# cdc ext: formulation-equivalence proof (compaction == window-latest)
# ---------------------------------------------------------------------------


@register(
    "cdc_formulation_equivalence_proof",
    doc="Equivalence proof as a query: the aggregate-fold compaction "
    "(operators/compaction.py::compact — one shuffle, max_by payload) "
    "and the window-latest formulation (row_number over seq desc, "
    "keep rn=1, apply the same action fold) must produce identical "
    "live states — both run in ONE plan and their full-outer diff is "
    "counted; n_differences = 0 is the contract a refactor must "
    "keep.  Testing-as-a-query: the check itself ships as a "
    "catalog entry the driver re-proves on every round.",
    tags=("cdc", "contract", "ext"),
    oracle=f"""
WITH ch AS ({ORDERS_CHANGELOG_SQL}),
agg_form AS (
  SELECT * FROM (
    SELECT CAST(o_orderkey AS VARCHAR) AS rid,
           {_FOLD_LAMBDA} AS cdc_action,
           arg_max(o_orderstatus, seq) AS st,
           arg_max(round(o_totalprice, 2), seq) AS tp
    FROM ch WHERE o_orderkey IS NOT NULL GROUP BY 1
  ) WHERE cdc_action NOT IN ('#absent#', 'delete')
),
win_form AS (
  SELECT rid, st, tp FROM (
    SELECT CAST(o_orderkey AS VARCHAR) AS rid, o_orderstatus AS st,
           round(o_totalprice, 2) AS tp,
           row_number() OVER (PARTITION BY o_orderkey
                              ORDER BY seq DESC) AS rn
    FROM ch WHERE o_orderkey IS NOT NULL
  ) latest
  JOIN (
    SELECT CAST(o_orderkey AS VARCHAR) AS rid2, {_FOLD_LAMBDA} AS act
    FROM ch WHERE o_orderkey IS NOT NULL GROUP BY 1
  ) folded ON folded.rid2 = latest.rid
  WHERE rn = 1 AND act NOT IN ('#absent#', 'delete')
),
diff AS (
  SELECT count(*) AS n_differences
  FROM agg_form a FULL OUTER JOIN win_form w ON w.rid = a.rid
  WHERE a.rid IS NULL OR w.rid IS NULL
     OR a.st IS DISTINCT FROM w.st OR a.tp IS DISTINCT FROM w.tp
)
SELECT (SELECT count(*) FROM agg_form) AS n_agg_form,
       (SELECT count(*) FROM win_form) AS n_win_form,
       (SELECT n_differences FROM diff) AS n_differences,
       (SELECT n_differences FROM diff) = 0 AS formulations_equivalent
""",
)
def cdc_formulation_equivalence_proof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..operators.compaction import ACTION_FOLD_SENTINEL, _fold_actions
    from ..sources.changelog import orders_changelog

    ch = orders_changelog(spark, sf_dir).filter(F.col("o_orderkey").isNotNull())
    rid = F.col("o_orderkey").cast("string")
    # formulation 1: aggregate fold (the production compact() shape)
    agg_form = (
        ch.groupBy(rid.alias("rid"))
        .agg(
            _fold_actions(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seq", "cdc_action"))),
                    lambda s: s.cdc_action,
                )
            ).alias("act"),
            F.max_by("o_orderstatus", "seq").alias("st"),
            F.max_by(F.round("o_totalprice", 2), "seq").alias("tp"),
        )
        .filter(~F.col("act").isin(ACTION_FOLD_SENTINEL, "delete"))
        .drop("act")
    )
    # formulation 2: window-latest + separate action fold
    latest = (
        ch.select(
            rid.alias("rid"),
            F.col("o_orderstatus").alias("st"),
            F.round("o_totalprice", 2).alias("tp"),
            F.row_number()
            .over(Window.partitionBy("o_orderkey").orderBy(F.desc("seq")))
            .alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    folded = (
        ch.groupBy(rid.alias("rid2"))
        .agg(
            _fold_actions(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seq", "cdc_action"))),
                    lambda s: s.cdc_action,
                )
            ).alias("act")
        )
        .filter(~F.col("act").isin(ACTION_FOLD_SENTINEL, "delete"))
    )
    win_form = latest.join(folded, latest.rid == folded.rid2).select(
        "rid", "st", "tp"
    )
    a = agg_form.select(
        F.col("rid").alias("arid"), F.col("st").alias("ast"),
        F.col("tp").alias("atp"),
    )
    wdf = win_form.select(
        F.col("rid").alias("wrid"), F.col("st").alias("wst"),
        F.col("tp").alias("wtp"),
    )
    diff = (
        a.join(wdf, a.arid == wdf.wrid, "full_outer")
        .filter(
            F.col("arid").isNull()
            | F.col("wrid").isNull()
            | ~F.col("ast").eqNullSafe(F.col("wst"))
            | ~F.col("atp").eqNullSafe(F.col("wtp"))
        )
        .agg(F.count(F.lit(1)).alias("n_differences"))
    )
    na = agg_form.agg(F.count(F.lit(1)).alias("n_agg_form"))
    nw = win_form.agg(F.count(F.lit(1)).alias("n_win_form"))
    return (
        na.crossJoin(F.broadcast(nw))
        .crossJoin(F.broadcast(diff))
        .withColumn("formulations_equivalent", F.col("n_differences") == 0)
    )


# ---------------------------------------------------------------------------
# A6 ext: Theil inequality decomposition (within + between = total)
# ---------------------------------------------------------------------------


@register(
    "agg_theil_decomposition",
    doc="The property that makes Theil-T the inequality measure for "
    "grouped data: total inequality over customer spend decomposes "
    "EXACTLY into a within-region term (income-share-weighted group "
    "Theils) plus a between-region term — group means from one cell "
    "aggregate broadcast back, everything else decomposable sums, "
    "and the additivity identity |T − Tw − Tb| < 1e−9 emitted as "
    "the check (Gini famously fails it; agg_theil_index reports "
    "only the total).",
    tags=("agg", "inequality", "ext"),
    oracle="""
WITH u AS (
  SELECT r.r_name AS region, sum(o.o_totalprice) AS y
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY r.r_name, o.o_custkey
  HAVING sum(o.o_totalprice) > 0
), tot AS (
  SELECT count(*) AS n, avg(y) AS mu FROM u
), grp AS (
  SELECT region, count(*) AS ng, avg(y) AS mug FROM u GROUP BY region
), terms AS (
  SELECT u.region, u.y, g.ng, g.mug, t.n, t.mu
  FROM u JOIN grp g ON g.region = u.region CROSS JOIN tot t
), pieces AS (
  SELECT
    sum((y / mu) * ln(y / mu)) / any_value(n) AS t_total,
    sum((ng * mug / (n * mu))
        * ((y / mug) * ln(y / mug)) / ng) AS t_within
  FROM terms
), between_t AS (
  SELECT sum((g.ng * g.mug / (t.n * t.mu)) * ln(g.mug / t.mu)) AS t_between
  FROM grp g CROSS JOIN tot t
)
SELECT round(p.t_total, 6) AS theil_total,
       round(p.t_within, 6) AS theil_within,
       round(b.t_between, 6) AS theil_between,
       abs(p.t_total - p.t_within - b.t_between) < 1e-9
         AS additivity_holds
FROM pieces p, between_t b
""",
)
def agg_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    reg = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    u = (
        orders.join(F.broadcast(cust), cust.c_custkey == orders.o_custkey)
        .join(F.broadcast(nat), nat.n_nationkey == cust.c_nationkey)
        .join(F.broadcast(reg), reg.r_regionkey == nat.n_regionkey)
        .groupBy(F.col("r_name").alias("region"), "o_custkey")
        .agg(F.sum("o_totalprice").alias("y"))
        .filter(F.col("y") > 0)
    )
    tot = u.agg(F.count(F.lit(1)).alias("n"), F.avg("y").alias("mu"))
    grp = u.groupBy("region").agg(
        F.count(F.lit(1)).alias("ng"), F.avg("y").alias("mug")
    )
    terms = u.join(F.broadcast(grp), "region").crossJoin(F.broadcast(tot))
    y, mu, mug = F.col("y"), F.col("mu"), F.col("mug")
    n, ng = F.col("n"), F.col("ng")
    pieces = terms.agg(
        (F.sum((y / mu) * F.log(y / mu)) / F.any_value(n)).alias("t_total"),
        F.sum(
            (ng * mug / (n * mu)) * ((y / mug) * F.log(y / mug)) / ng
        ).alias("t_within"),
    )
    between_t = (
        grp.crossJoin(F.broadcast(tot))
        .agg(
            F.sum((ng * mug / (n * mu)) * F.log(mug / mu)).alias("t_between")
        )
    )
    return (
        pieces.crossJoin(F.broadcast(between_t))
        .select(
            F.round("t_total", 6).alias("theil_total"),
            F.round("t_within", 6).alias("theil_within"),
            F.round("t_between", 6).alias("theil_between"),
            (
                F.abs(
                    F.col("t_total") - F.col("t_within") - F.col("t_between")
                )
                < 1e-9
            ).alias("additivity_holds"),
        )
    )


# ---------------------------------------------------------------------------
# W5 ext: Mann-Kendall trend test on the monthly series
# ---------------------------------------------------------------------------


@register(
    "window_mann_kendall_trend",
    doc="Mann-Kendall monotone-trend test: S = Σ sign(y_j − y_i) over "
    "all ~3k month pairs (the same bounded self-join as Theil-Sen, "
    "which estimates the slope this test decides about), variance "
    "with the tie correction, and the continuity-corrected z — the "
    "distribution-free trend verdict used throughout environmental "
    "statistics.  Pairs on the folded series only.",
    tags=("window", "timeseries", "ext"),
    oracle="""
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS mon,
         round(sum(o_totalprice), 2) AS y
  FROM orders GROUP BY 1
), s AS (
  SELECT sum(sign(b.y - a.y)) AS s_stat, count(*) AS n_pairs
  FROM m a JOIN m b ON a.mon < b.mon
), ties AS (
  SELECT sum(c * (c - 1) * (2 * c + 5)) AS tie_term FROM (
    SELECT count(*) AS c FROM m GROUP BY y
  )
), dims AS (SELECT count(*) AS n FROM m)
SELECT CAST(s.s_stat AS BIGINT) AS s_stat,
       dims.n AS n_months,
       round((dims.n * (dims.n - 1) * (2 * dims.n + 5) - ties.tie_term)
             / 18.0, 2) AS var_s,
       round((s.s_stat - sign(s.s_stat))
             / sqrt((dims.n * (dims.n - 1) * (2 * dims.n + 5)
                     - ties.tie_term) / 18.0), 4) AS z_stat
FROM s, ties, dims
""",
)
def window_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("y")
    )
    a, b = m.alias("a"), m.alias("b")
    s = a.join(b, F.col("a.mon") < F.col("b.mon")).agg(
        F.sum(F.signum(F.col("b.y") - F.col("a.y"))).alias("s_stat"),
    )
    ties = (
        m.groupBy("y")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(
                F.col("c") * (F.col("c") - 1) * (2 * F.col("c") + 5)
            ).alias("tie_term")
        )
    )
    dims = m.agg(F.count(F.lit(1)).alias("n"))
    j = s.crossJoin(F.broadcast(ties)).crossJoin(F.broadcast(dims))
    n = F.col("n")
    var_s = (n * (n - 1) * (2 * n + 5) - F.col("tie_term")) / 18.0
    return j.select(
        F.col("s_stat").cast("bigint").alias("s_stat"),
        n.alias("n_months"),
        F.round(var_s, 2).alias("var_s"),
        F.round(
            (F.col("s_stat") - F.signum(F.col("s_stat"))) / F.sqrt(var_s), 4
        ).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# A6 ext: two-asset minimum-variance portfolio weights
# ---------------------------------------------------------------------------


@register(
    "agg_min_variance_portfolio",
    doc="Markowitz closed form for two assets: monthly revenue returns "
    "of the BUILDING and MACHINERY segments as the two assets, the "
    "minimum-variance weight w* = (σ₂² − σ₁₂)/(σ₁² + σ₂² − 2σ₁₂) "
    "from one covariance aggregate, and the achieved portfolio "
    "volatility against each asset alone — the diversification "
    "arithmetic every allocation screen runs, as one two-series fold "
    "plus closed form.",
    tags=("agg", "finance", "ext"),
    oracle="""
WITH m AS (
  SELECT date_trunc('month', o.o_orderdate) AS mon,
         round(sum(CASE WHEN c.c_mktsegment = 'BUILDING'
                        THEN o.o_totalprice ELSE 0 END), 2) AS y1,
         round(sum(CASE WHEN c.c_mktsegment = 'MACHINERY'
                        THEN o.o_totalprice ELSE 0 END), 2) AS y2
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1
), r AS (
  SELECT CASE WHEN y1 > 0 AND lag(y1) OVER (ORDER BY mon) > 0
              THEN ln(y1 / lag(y1) OVER (ORDER BY mon)) END AS r1,
         CASE WHEN y2 > 0 AND lag(y2) OVER (ORDER BY mon) > 0
              THEN ln(y2 / lag(y2) OVER (ORDER BY mon)) END AS r2
  FROM m
), s AS (
  SELECT var_samp(r1) AS v1, var_samp(r2) AS v2,
         covar_samp(r1, r2) AS c12, count(*) AS n
  FROM r WHERE r1 IS NOT NULL AND r2 IS NOT NULL
)
SELECT n,
       round((v2 - c12) / (v1 + v2 - 2 * c12), 6) AS w_building,
       round(sqrt(v1), 6) AS vol_building,
       round(sqrt(v2), 6) AS vol_machinery,
       round(sqrt(
         pow((v2 - c12) / (v1 + v2 - 2 * c12), 2) * v1
         + pow(1 - (v2 - c12) / (v1 + v2 - 2 * c12), 2) * v2
         + 2 * ((v2 - c12) / (v1 + v2 - 2 * c12))
             * (1 - (v2 - c12) / (v1 + v2 - 2 * c12)) * c12), 6)
         AS vol_portfolio
FROM s
""",
)
def agg_min_variance_portfolio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    m = (
        orders.join(F.broadcast(cust), cust.c_custkey == orders.o_custkey)
        .groupBy(F.date_trunc("month", "o_orderdate").alias("mon"))
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("c_mktsegment") == "BUILDING",
                        F.col("o_totalprice"),
                    ).otherwise(0.0)
                ),
                2,
            ).alias("y1"),
            F.round(
                F.sum(
                    F.when(
                        F.col("c_mktsegment") == "MACHINERY",
                        F.col("o_totalprice"),
                    ).otherwise(0.0)
                ),
                2,
            ).alias("y2"),
        )
    )
    w = Window.orderBy("mon")

    def _ret(col: str):
        prev = F.lag(col).over(w)
        return F.when(
            (F.col(col) > 0) & (prev > 0), F.log(F.col(col) / prev)
        )

    r = m.select(_ret("y1").alias("r1"), _ret("y2").alias("r2")).filter(
        F.col("r1").isNotNull() & F.col("r2").isNotNull()
    )
    s = r.agg(
        F.var_samp("r1").alias("v1"),
        F.var_samp("r2").alias("v2"),
        F.covar_samp("r1", "r2").alias("c12"),
        F.count(F.lit(1)).alias("n"),
    )
    v1, v2, c12 = F.col("v1"), F.col("v2"), F.col("c12")
    wstar = (v2 - c12) / (v1 + v2 - 2 * c12)
    vol_p = F.sqrt(
        F.pow(wstar, F.lit(2)) * v1
        + F.pow(1 - wstar, F.lit(2)) * v2
        + 2 * wstar * (1 - wstar) * c12
    )
    return s.select(
        "n",
        F.round(wstar, 6).alias("w_building"),
        F.round(F.sqrt(v1), 6).alias("vol_building"),
        F.round(F.sqrt(v2), 6).alias("vol_machinery"),
        F.round(vol_p, 6).alias("vol_portfolio"),
    )


# ---------------------------------------------------------------------------
# W5 ext: ARCH LM test for volatility clustering
# ---------------------------------------------------------------------------


@register(
    "window_arch_lm_test",
    doc="Engle's ARCH LM test on monthly revenue returns: squared "
    "demeaned returns regressed on their own lag (one lag window + "
    "one regr aggregate), LM = n·R² against the 1-df chi-square — "
    "significant means volatility clusters and any i.i.d.-variance "
    "interval (the Sharpe entry, the z-tests) understates risk in "
    "bursts.  The diagnostic that decides whether GARCH-style "
    "machinery is even needed.",
    tags=("window", "finance", "ext"),
    oracle="""
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS mon,
         round(sum(o_totalprice), 2) AS y
  FROM orders GROUP BY 1
), r AS (
  SELECT ln(y / lag(y) OVER (ORDER BY mon)) AS ret, mon FROM m
), e2 AS (
  SELECT mon, pow(ret - avg(ret) OVER (), 2) AS e2
  FROM r WHERE ret IS NOT NULL
), lagged AS (
  SELECT e2, lag(e2) OVER (ORDER BY mon) AS e2_lag FROM e2
), fit AS (
  SELECT count(*) AS n, regr_r2(e2, e2_lag) AS r2
  FROM lagged WHERE e2_lag IS NOT NULL
)
SELECT n, round(r2, 6) AS r2,
       round(n * r2, 4) AS lm_stat,
       n * r2 > 3.841 AS volatility_clusters
FROM fit
""",
)
def window_arch_lm_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("y")
    )
    w = Window.orderBy("mon")
    r = m.select(
        "mon", F.log(F.col("y") / F.lag("y").over(w)).alias("ret")
    ).filter(F.col("ret").isNotNull())
    e2 = r.select(
        "mon",
        F.pow(
            F.col("ret") - F.avg("ret").over(Window.partitionBy()), F.lit(2)
        ).alias("e2"),
    )
    lagged = e2.select(
        "e2", F.lag("e2").over(Window.orderBy("mon")).alias("e2_lag")
    ).filter(F.col("e2_lag").isNotNull())
    fit = lagged.agg(
        F.count(F.lit(1)).alias("n"),
        F.regr_r2(F.col("e2"), F.col("e2_lag")).alias("r2"),
    )
    lm = F.col("n") * F.col("r2")
    return fit.select(
        "n",
        F.round("r2", 6).alias("r2"),
        F.round(lm, 4).alias("lm_stat"),
        (lm > 3.841).alias("volatility_clusters"),
    )


# ---------------------------------------------------------------------------
# corpus ext: temperature-scaled multilingual sampling weights
# ---------------------------------------------------------------------------


@register(
    "corpus_temperature_sampling_weights",
    doc="The multilingual sampling formula every LLM data recipe cites: "
    "per-language corpus shares p_i raised to α (here the standard "
    "α=0.3, 0.7 and 1.0 side by side) and renormalized — low-resource "
    "languages up-weight as α falls, and the effective language count "
    "exp(entropy) quantifies how much each temperature flattens the "
    "mix.  One cell aggregate, closed form per α, no data movement "
    "beyond the 5-row language relation.",
    tags=("corpus", "sampling", "ext"),
    oracle="""
WITH p AS (
  SELECT lang, count(*) * 1.0 / sum(count(*)) OVER () AS share
  FROM documents GROUP BY lang
), t AS (
  SELECT lang, share,
         pow(share, 0.3) / sum(pow(share, 0.3)) OVER () AS w_03,
         pow(share, 0.7) / sum(pow(share, 0.7)) OVER () AS w_07
  FROM p
)
SELECT lang,
       round(share, 6) AS natural_share,
       round(w_07, 6) AS weight_alpha_07,
       round(w_03, 6) AS weight_alpha_03,
       round(w_03 / share, 4) AS upsample_factor_03
FROM t ORDER BY lang
""",
)
def corpus_temperature_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    w_all = Window.partitionBy()
    p = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).select(
        "lang", (F.col("n") / F.sum("n").over(w_all)).alias("share")
    )

    def _temp(alpha: float):
        pw = F.pow(F.col("share"), F.lit(alpha))
        return pw / F.sum(pw).over(w_all)

    t = p.select(
        "lang",
        "share",
        _temp(0.3).alias("w_03"),
        _temp(0.7).alias("w_07"),
    )
    return t.select(
        "lang",
        F.round("share", 6).alias("natural_share"),
        F.round("w_07", 6).alias("weight_alpha_07"),
        F.round("w_03", 6).alias("weight_alpha_03"),
        F.round(F.col("w_03") / F.col("share"), 4).alias(
            "upsample_factor_03"
        ),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# events ext: per-user behavioral entropy distribution
# ---------------------------------------------------------------------------


@register(
    "events_user_behavior_entropy",
    doc="Predictability profile of the user base: each user's event-type "
    "distribution collapses to a Shannon entropy (0 bits = always the "
    "same action, log2(5) ≈ 2.32 = uniform), and the population "
    "histogram of those entropies (quarter-bit bins) says how much of "
    "the audience a per-user personalization model can even help — "
    "the per-entity twin of the global Markov entropy-rate entry.  "
    "Cell counts, per-user totals joined back, two decomposable "
    "aggregates.",
    tags=("events", "entropy", "ext"),
    oracle="""
WITH cell AS (
  SELECT user_id, event_type, count(*) AS n FROM events
  GROUP BY user_id, event_type
), tot AS (
  SELECT user_id, sum(n) AS nt FROM cell GROUP BY user_id
), ent AS (
  SELECT c.user_id,
         -sum((c.n * 1.0 / t.nt) * log2(c.n * 1.0 / t.nt)) AS h
  FROM cell c JOIN tot t ON t.user_id = c.user_id
  GROUP BY c.user_id
), binned AS (
  SELECT CAST(floor(h / 0.25) AS INT) AS bin, count(*) AS n_users
  FROM ent GROUP BY 1
)
SELECT bin, round(bin * 0.25, 2) AS entropy_lo, n_users,
       round((SELECT avg(h) FROM ent), 6) AS mean_entropy
FROM binned ORDER BY bin
""",
)
def events_user_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cell = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = cell.groupBy("user_id").agg(F.sum("n").alias("nt"))
    share = F.col("n") / F.col("nt")
    ent = (
        cell.join(tot, "user_id")
        .groupBy("user_id")
        .agg((-F.sum(share * F.log2(share))).alias("h"))
    )
    mean_h = ent.agg(F.round(F.avg("h"), 6).alias("mean_entropy"))
    binned = ent.groupBy(
        F.floor(F.col("h") / 0.25).cast("int").alias("bin")
    ).agg(F.count(F.lit(1)).alias("n_users"))
    return (
        binned.crossJoin(F.broadcast(mean_h))
        .select(
            "bin",
            F.round(F.col("bin") * 0.25, 2).alias("entropy_lo"),
            "n_users",
            "mean_entropy",
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# A6 ext: Storey's pi0 and the null-proportion view of multiple testing
# ---------------------------------------------------------------------------


@register(
    "agg_storey_pi0",
    doc="Storey's estimate of the true-null proportion over the same "
    "per-nation p-values as the BH and Holm entries: π̂₀(λ) = "
    "#{p > λ}/(m(1−λ)) at λ = 0.5, the quantity that converts BH's "
    "worst-case FDR into the sharper q-value — plus the smallest "
    "Storey q-value as the decision summary.  Same logistic "
    "normal-CDF so all three multiple-testing entries share "
    "bit-identical p-values.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH g AS (
  SELECT c_nationkey AS nat, count(*) AS n, avg(c_acctbal) AS m,
         var_samp(c_acctbal) AS v
  FROM customer GROUP BY c_nationkey
), tot AS (SELECT sum(n * m) / sum(n) AS grand FROM g),
p AS (
  SELECT nat,
         2 * (1 - 1 / (1 + exp(-1.702
              * abs((m - tot.grand) / sqrt(v / n))))) AS pval
  FROM g, tot
), s AS (
  SELECT count(*) AS m_tests,
         sum(CASE WHEN pval > 0.5 THEN 1 ELSE 0 END) AS n_above,
         min(pval) AS min_p
  FROM p
)
SELECT m_tests, n_above,
       round(least(1.0, n_above / (m_tests * 0.5)), 6) AS pi0_hat,
       round(min_p, 6) AS min_p,
       round(least(1.0, n_above / (m_tests * 0.5)) * min_p * m_tests, 6)
         AS min_q_value
FROM s
""",
)
def agg_storey_pi0(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    g = cust.groupBy(F.col("c_nationkey").alias("nat")).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("c_acctbal").alias("m"),
        F.var_samp("c_acctbal").alias("v"),
    )
    tot = g.agg((F.sum(F.col("n") * F.col("m")) / F.sum("n")).alias("grand"))
    az = F.abs(
        (F.col("m") - F.col("grand")) / F.sqrt(F.col("v") / F.col("n"))
    )
    p = g.crossJoin(F.broadcast(tot)).select(
        (2 * (1 - 1 / (1 + F.exp(-1.702 * az)))).alias("pval")
    )
    s = p.agg(
        F.count(F.lit(1)).alias("m_tests"),
        F.sum(F.when(F.col("pval") > 0.5, 1).otherwise(0)).alias("n_above"),
        F.min("pval").alias("min_p"),
    )
    pi0 = F.least(F.lit(1.0), F.col("n_above") / (F.col("m_tests") * 0.5))
    return s.select(
        "m_tests",
        "n_above",
        F.round(pi0, 6).alias("pi0_hat"),
        F.round("min_p", 6).alias("min_p"),
        F.round(pi0 * F.col("min_p") * F.col("m_tests"), 6).alias(
            "min_q_value"
        ),
    )


# ---------------------------------------------------------------------------
# A6 ext: BIC-approximated Bayes factor for the arm contrast
# ---------------------------------------------------------------------------


@register(
    "agg_bayes_factor_bic",
    doc="Model-comparison view of the md5-arm experiment: the null "
    "(one mean) vs the arm model (two means) compared by "
    "BF₁₀ ≈ exp((BIC₀−BIC₁)/2) with BIC = n·ln(RSS/n) + k·ln(n) — "
    "evidence on a continuous scale instead of a p-value threshold, "
    "from one conditional moment pass (the RSS of each model is a "
    "variance identity, no residual materialization).  Jeffreys' "
    "verdict attached.",
    tags=("agg", "stats", "experiment", "ext"),
    oracle="""
WITH u AS (
  SELECT ascii(substring(md5(user_id::VARCHAR), 1, 1)) % 2 AS arm,
         avg(value) AS v
  FROM events GROUP BY user_id
), s AS (
  SELECT count(*) AS n,
         var_pop(v) * count(*) AS rss0,
         sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
         var_pop(CASE WHEN arm = 1 THEN v END)
           * sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
         + var_pop(CASE WHEN arm = 0 THEN v END)
           * sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS rss1
  FROM u
), bic AS (
  SELECT n,
         n * ln(rss0 / n) + 1 * ln(n) AS bic0,
         n * ln(rss1 / n) + 2 * ln(n) AS bic1
  FROM s
)
SELECT n,
       round(bic0, 4) AS bic_null,
       round(bic1, 4) AS bic_arms,
       round(exp((bic0 - bic1) / 2), 6) AS bayes_factor_10,
       CASE WHEN exp((bic0 - bic1) / 2) > 3 THEN 'evidence_for_effect'
            WHEN exp((bic0 - bic1) / 2) < 1.0 / 3 THEN 'evidence_for_null'
            ELSE 'inconclusive' END AS jeffreys_verdict
FROM bic
""",
)
def agg_bayes_factor_bic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    arm = (
        F.ascii(F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 1))
        % 2
    )
    u = ev.groupBy("user_id").agg(F.avg("value").alias("v")).select(
        arm.alias("arm"), "v"
    )
    v1 = F.when(F.col("arm") == 1, F.col("v"))
    v0 = F.when(F.col("arm") == 0, F.col("v"))
    s = u.agg(
        F.count(F.lit(1)).alias("n"),
        (F.var_pop("v") * F.count(F.lit(1))).alias("rss0"),
        (
            F.var_pop(v1) * F.count(v1) + F.var_pop(v0) * F.count(v0)
        ).alias("rss1"),
    )
    n = F.col("n")
    bic0 = n * F.log(F.col("rss0") / n) + 1 * F.log(n)
    bic1 = n * F.log(F.col("rss1") / n) + 2 * F.log(n)
    bf = F.exp((bic0 - bic1) / 2)
    return s.select(
        "n",
        F.round(bic0, 4).alias("bic_null"),
        F.round(bic1, 4).alias("bic_arms"),
        F.round(bf, 6).alias("bayes_factor_10"),
        F.when(bf > 3, "evidence_for_effect")
        .when(bf < 1.0 / 3, "evidence_for_null")
        .otherwise("inconclusive")
        .alias("jeffreys_verdict"),
    )


# ---------------------------------------------------------------------------
# P8 ext: Feistel-network pseudonymization (reversible, format-preserving)
# ---------------------------------------------------------------------------


@register(
    "scalar_feistel_pseudonymize",
    doc="Reversible pseudonymization without a lookup table: customer "
    "keys pass through a 2-round Feistel network over 16-bit halves "
    "with md5-derived round functions — a keyed bijection on 32-bit "
    "ids, so analytics join on pseudonyms while re-identification "
    "needs the secret, and decryption is the same rounds in reverse.  "
    "The roundtrip is proven in-plan (decrypt∘encrypt = identity for "
    "every key) plus a collision check on the pseudonym space.  "
    "Pure expression pipeline, identical md5 both engines.",
    tags=("scalar", "privacy", "ext"),
    oracle="""
WITH base AS (
  SELECT c_custkey AS k,
         CAST(c_custkey // 65536 AS BIGINT) AS l0,
         CAST(c_custkey % 65536 AS BIGINT) AS r0
  FROM customer
), r1 AS (
  SELECT k, r0 AS l1,
         CAST(xor(l0, ('0x' || substr(md5('rk1#' || r0::VARCHAR), 1, 4))
                        ::BIGINT % 65536) AS BIGINT) AS r1
  FROM base
), r2 AS (
  SELECT k, r1 AS l2,
         CAST(xor(l1, ('0x' || substr(md5('rk2#' || r1::VARCHAR), 1, 4))
                        ::BIGINT % 65536) AS BIGINT) AS r2
  FROM r1
), enc AS (
  SELECT k, l2 * 65536 + r2 AS pseudo, l2, r2 FROM r2
), dec AS (
  -- invert: round 2 then round 1
  SELECT k, pseudo,
         CAST(xor(r2, ('0x' || substr(md5('rk2#' || l2::VARCHAR), 1, 4))
                        ::BIGINT % 65536) AS BIGINT) AS l1b,
         l2 AS r1b
  FROM enc
), dec2 AS (
  SELECT k, pseudo,
         CAST(xor(r1b, ('0x' || substr(md5('rk1#' || l1b::VARCHAR), 1, 4))
                         ::BIGINT % 65536) AS BIGINT) AS l0b,
         l1b AS r0b
  FROM dec
)
SELECT count(*) AS n_keys,
       count(DISTINCT pseudo) AS n_pseudonyms,
       sum(CASE WHEN l0b * 65536 + r0b = k THEN 1 ELSE 0 END)
         AS n_roundtrip_ok,
       count(*) = count(DISTINCT pseudo)
         AND sum(CASE WHEN l0b * 65536 + r0b = k THEN 1 ELSE 0 END)
             = count(*) AS bijection_proven
FROM dec2
""",
)
def scalar_feistel_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")

    def _round_f(salt: str, half):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit(salt + "#"), half.cast("string")).cast(
                            "binary"
                        )
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("bigint")
            % 65536
        )

    base = cust.select(
        F.col("c_custkey").alias("k"),
        F.floor(F.col("c_custkey") / 65536).cast("bigint").alias("l0"),
        (F.col("c_custkey") % 65536).cast("bigint").alias("r0"),
    )
    r1 = base.select(
        "k",
        F.col("r0").alias("l1"),
        (
            F.col("l0").bitwiseXOR(_round_f("rk1", F.col("r0")))
        ).cast("bigint").alias("r1"),
    )
    r2 = r1.select(
        "k",
        F.col("r1").alias("l2"),
        (
            F.col("l1").bitwiseXOR(_round_f("rk2", F.col("r1")))
        ).cast("bigint").alias("r2"),
    )
    enc = r2.select(
        "k", (F.col("l2") * 65536 + F.col("r2")).alias("pseudo"), "l2", "r2"
    )
    dec = enc.select(
        "k",
        "pseudo",
        (
            F.col("r2").bitwiseXOR(_round_f("rk2", F.col("l2")))
        ).cast("bigint").alias("l1b"),
        F.col("l2").alias("r1b"),
    )
    dec2 = dec.select(
        "k",
        "pseudo",
        (
            F.col("r1b").bitwiseXOR(_round_f("rk1", F.col("l1b")))
        ).cast("bigint").alias("l0b"),
        F.col("l1b").alias("r0b"),
    )
    ok = F.col("l0b") * 65536 + F.col("r0b") == F.col("k")
    return dec2.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.countDistinct("pseudo").alias("n_pseudonyms"),
        F.sum(F.when(ok, 1).otherwise(0)).alias("n_roundtrip_ok"),
        (
            (F.count(F.lit(1)) == F.countDistinct("pseudo"))
            & (F.sum(F.when(ok, 1).otherwise(0)) == F.count(F.lit(1)))
        ).alias("bijection_proven"),
    )


# ---------------------------------------------------------------------------
# privacy ext: differential-privacy budget planner for a release set
# ---------------------------------------------------------------------------


@register(
    "privacy_dp_budget_planner",
    doc="The deterministic half of differential privacy — the accounting: "
    "for a release of per-segment statistics, the L1 sensitivity of "
    "each query (1 for counts; the max single-customer contribution "
    "for sums, computed from the data), the Laplace scale b = Δ/ε "
    "each release would need at ε=0.1, the relative error that noise "
    "implies, and the total budget under basic composition.  Noise "
    "itself needs an RNG at release time; every number that governs "
    "it is a query, and that query is exact.",
    tags=("privacy", "governance", "ext"),
    oracle="""
WITH contrib AS (
  SELECT c.c_mktsegment AS seg, c.c_custkey,
         count(o.o_orderkey) AS my_n,
         coalesce(sum(o.o_totalprice), 0) AS my_sum
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, c.c_custkey
), rel AS (
  SELECT seg,
         count(*) AS released_count,
         round(sum(my_sum), 2) AS released_sum,
         max(my_sum) AS sum_sensitivity
  FROM contrib GROUP BY seg
)
SELECT seg, released_count,
       round(sum_sensitivity, 2) AS sum_sensitivity,
       round(sum_sensitivity / 0.1, 2) AS laplace_scale_sum,
       round(sum_sensitivity / 0.1 / released_sum, 8)
         AS relative_noise_sum,
       round(1 / 0.1, 1) AS laplace_scale_count,
       CAST(0.2 AS DOUBLE) AS epsilon_per_segment,
       CAST(round(0.2 * (SELECT count(*) FROM rel), 2) AS DOUBLE)
         AS total_epsilon
FROM rel ORDER BY seg
""",
)
def privacy_dp_budget_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    contrib = (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy(F.col("c_mktsegment").alias("seg"), "c_custkey")
        .agg(
            F.coalesce(F.sum("o_totalprice"), F.lit(0.0)).alias("my_sum"),
        )
    )
    rel = contrib.groupBy("seg").agg(
        F.count(F.lit(1)).alias("released_count"),
        F.round(F.sum("my_sum"), 2).alias("released_sum"),
        F.max("my_sum").alias("sum_sensitivity"),
    )
    n_seg = rel.agg(F.count(F.lit(1)).alias("n_segments"))
    return (
        rel.crossJoin(F.broadcast(n_seg))
        .select(
            "seg",
            "released_count",
            F.round("sum_sensitivity", 2).alias("sum_sensitivity"),
            F.round(F.col("sum_sensitivity") / 0.1, 2).alias(
                "laplace_scale_sum"
            ),
            F.round(
                F.col("sum_sensitivity") / 0.1 / F.col("released_sum"), 8
            ).alias("relative_noise_sum"),
            F.round(F.lit(1 / 0.1), 1).alias("laplace_scale_count"),
            F.lit(0.2).alias("epsilon_per_segment"),
            F.round(0.2 * F.col("n_segments"), 2).alias("total_epsilon"),
        )
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# text ext: code-vs-prose detection heuristics
# ---------------------------------------------------------------------------


@register(
    "text_code_detection",
    doc="Code-contamination gate for a prose corpus: symbol density "
    "({};()=<>), digit density and the braces-per-char rate, each a "
    "regexp census, fused into a code-likeness verdict per document "
    "and rolled up per source — the filter every natural-language "
    "corpus runs to keep (or route) source code.  One projection "
    "pass; thresholds are the deliverable, not a model.",
    tags=("text", "corpus", "quality", "ext"),
    oracle="""
WITH f AS (
  SELECT source,
         length(regexp_replace(text, '[^{};()=<>]', '', 'g')) * 1.0
           / length(text) AS sym_density,
         length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0
           / length(text) AS digit_density
  FROM documents
)
SELECT source, count(*) AS n_docs,
       round(avg(sym_density), 6) AS mean_symbol_density,
       round(avg(digit_density), 6) AS mean_digit_density,
       sum(CASE WHEN sym_density > 0.02 OR digit_density > 0.15
                THEN 1 ELSE 0 END) AS n_code_suspect,
       round(avg(CASE WHEN sym_density > 0.02 OR digit_density > 0.15
                      THEN 1.0 ELSE 0.0 END), 6) AS code_suspect_share
FROM f GROUP BY source ORDER BY source
""",
)
def text_code_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sym = F.length(
        F.regexp_replace(F.col("text"), "[^{};()=<>]", "")
    ) / F.length("text")
    dig = F.length(
        F.regexp_replace(F.col("text"), "[^0-9]", "")
    ) / F.length("text")
    f = docs.select(
        "source", sym.alias("sym_density"), dig.alias("digit_density")
    )
    suspect = (F.col("sym_density") > 0.02) | (F.col("digit_density") > 0.15)
    return (
        f.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("sym_density"), 6).alias("mean_symbol_density"),
            F.round(F.avg("digit_density"), 6).alias("mean_digit_density"),
            F.sum(F.when(suspect, 1).otherwise(0)).alias("n_code_suspect"),
            F.round(
                F.avg(F.when(suspect, 1.0).otherwise(0.0)), 6
            ).alias("code_suspect_share"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# graph ext: Katz centrality (three attenuated path steps)
# ---------------------------------------------------------------------------


@register(
    "graph_katz_centrality",
    doc="Katz centrality on the directed event-transition graph: "
    "c = Σ_k β^k (Aᵀ)^k·1 truncated at three steps with β=0.5 — "
    "attenuated path COUNTING, which rewards being reachable by many "
    "short paths where PageRank normalizes mass away and HITS "
    "couples two scores.  Each step is the same bounded broadcast "
    "join; the three-member centrality family (PageRank, HITS, Katz) "
    "is now complete over one shared edge relation.",
    tags=("graph", "events", "ext"),
    oracle="""
WITH seq AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS dst
  FROM events
), e AS (
  SELECT src, dst, count(*) * 1.0 AS w FROM seq
  WHERE dst IS NOT NULL GROUP BY src, dst
), tot AS (SELECT sum(w) AS tw FROM e),
en AS (SELECT src, dst, w / tot.tw AS p FROM e, tot),
nodes AS (
  SELECT DISTINCT v FROM (SELECT src AS v FROM en UNION SELECT dst FROM en)
), k1 AS (
  SELECT dst AS v, sum(0.5 * p) AS c FROM en GROUP BY dst
), k2 AS (
  SELECT en.dst AS v, sum(0.5 * k1.c * en.p) AS c
  FROM en JOIN k1 ON k1.v = en.src GROUP BY en.dst
), k3 AS (
  SELECT en.dst AS v, sum(0.5 * k2.c * en.p) AS c
  FROM en JOIN k2 ON k2.v = en.src GROUP BY en.dst
)
SELECT n.v AS state,
       round(coalesce(k1.c, 0) + coalesce(k2.c, 0) + coalesce(k3.c, 0), 8)
         AS katz_centrality
FROM nodes n
LEFT JOIN k1 ON k1.v = n.v
LEFT JOIN k2 ON k2.v = n.v
LEFT JOIN k3 ON k3.v = n.v
ORDER BY state
""",
)
def graph_katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("dst"),
    ).filter(F.col("dst").isNotNull())
    e = seq.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("double").alias("w")
    )
    tot = e.agg(F.sum("w").alias("tw"))
    en = e.crossJoin(F.broadcast(tot)).select(
        "src", "dst", (F.col("w") / F.col("tw")).alias("p")
    )
    nodes = (
        en.select(F.col("src").alias("v"))
        .unionAll(en.select(F.col("dst").alias("v")))
        .distinct()
    )
    k1 = en.groupBy(F.col("dst").alias("v")).agg(
        F.sum(0.5 * F.col("p")).alias("c")
    )
    levels = [k1]
    prev = k1
    for _ in range(2):
        pb = F.broadcast(
            prev.select(F.col("v").alias("pv"), F.col("c").alias("pc"))
        )
        prev = (
            en.join(pb, en.src == F.col("pv"))
            .groupBy(F.col("dst").alias("v"))
            .agg(F.sum(0.5 * F.col("pc") * F.col("p")).alias("c"))
        )
        levels.append(prev)
    out = nodes
    for i, lv in enumerate(levels):
        out = out.join(
            F.broadcast(lv.withColumnRenamed("c", f"c{i}")), "v", "left"
        )
    total = sum(
        (F.coalesce(F.col(f"c{i}"), F.lit(0.0)) for i in range(3)),
        F.lit(0.0),
    )
    return out.select(
        F.col("v").alias("state"),
        F.round(total, 8).alias("katz_centrality"),
    ).orderBy("state")


# ---------------------------------------------------------------------------
# A6 ext: restricted mean survival time (area under KM)
# ---------------------------------------------------------------------------


@register(
    "agg_survival_rmst",
    doc="Restricted mean survival time: the area under the Kaplan-Meier "
    "fulfilment curve up to the 60-day horizon — 'expected days "
    "unfulfilled within 60' — computed as the step integral "
    "Σ S(tᵢ)·(t_{i+1}−tᵢ) over the same censoring-aware KM points as "
    "the Weibull and log-rank entries.  The one-number survival "
    "summary that stays valid when medians are undefined; windows "
    "over the ≤100-point curve only.",
    tags=("agg", "survival", "ext"),
    oracle="""
WITH dur AS (
  SELECT o.o_orderkey,
         date_diff('day', o.o_orderdate, max(l.l_shipdate)) AS t,
         max(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS censored
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate
  HAVING date_diff('day', o.o_orderdate, max(l.l_shipdate)) > 0
), cell AS (
  SELECT t, sum(1 - censored) AS d, sum(censored) AS c
  FROM dur GROUP BY t
), risk AS (
  SELECT t, d,
         sum(d + c) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS gone,
         sum(d + c) OVER () AS total
  FROM cell
), km AS (
  SELECT t,
         exp(sum(ln(1 - d * 1.0 / (total - coalesce(gone, 0))))
             OVER (ORDER BY t)) AS s
  FROM risk
  WHERE d > 0 AND d < total - coalesce(gone, 0) AND t <= 60
), seg AS (
  SELECT t, s,
         lead(t, 1, 60) OVER (ORDER BY t) AS t_next,
         lag(s) OVER (ORDER BY t) AS s_prev,
         row_number() OVER (ORDER BY t) AS rn
  FROM km
)
SELECT count(*) + 1 AS n_steps,
       round((SELECT min(t) FROM km) * 1.0
             + sum(s * (least(t_next, 60) - t)), 4) AS rmst_60,
       round((SELECT min(s) FROM km), 6) AS s_at_horizon
FROM seg
""",
)
def agg_survival_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dur = (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.datediff(F.max("l_shipdate"), F.first("o_orderdate")).alias("t"),
            F.max(
                F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)
            ).alias("censored"),
        )
        .filter(F.col("t") > 0)
    )
    cell = dur.groupBy("t").agg(
        F.sum(1 - F.col("censored")).alias("d"),
        F.sum("censored").alias("c"),
    )
    w = Window.orderBy("t")
    risk = cell.select(
        "t",
        "d",
        F.sum(F.col("d") + F.col("c"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .alias("gone"),
        F.sum(F.col("d") + F.col("c")).over(Window.partitionBy()).alias("total"),
    )
    n_risk = F.col("total") - F.coalesce(F.col("gone"), F.lit(0))
    km = (
        risk.filter((F.col("d") > 0) & (F.col("d") < n_risk) & (F.col("t") <= 60))
        .select(
            "t",
            F.exp(F.sum(F.log(1 - F.col("d") / n_risk)).over(w)).alias("s"),
        )
    )
    seg = km.select(
        "t",
        "s",
        F.lead("t", 1, 60).over(Window.orderBy("t")).alias("t_next"),
    )
    first_t = km.agg(F.min("t").alias("t0"), F.min("s").alias("s_min"))
    integral = seg.agg(
        F.count(F.lit(1)).alias("n_km"),
        F.sum(
            F.col("s") * (F.least(F.col("t_next"), F.lit(60)) - F.col("t"))
        ).alias("area"),
    )
    return (
        integral.crossJoin(F.broadcast(first_t))
        .select(
            (F.col("n_km") + 1).alias("n_steps"),
            F.round(F.col("t0") * 1.0 + F.col("area"), 4).alias("rmst_60"),
            F.round(F.col("s_min"), 6).alias("s_at_horizon"),
        )
    )


# ---------------------------------------------------------------------------
# P8 ext: geohash encoding of coordinates (spatial index primitive)
# ---------------------------------------------------------------------------


@register(
    "scalar_geohash_encode",
    doc="Geohash encoding end to end in expressions: the synthetic nation "
    "centroids' lat/lon interleave through 15 bisection bits each "
    "(an aggregate-HOF fold over the bit sequence) into a 30-bit "
    "code rendered as 6 base32 characters — the spatial bucketing "
    "key geo joins and maps APIs share.  The bisection fold is "
    "deterministic integer math, so both engines emit identical "
    "hashes; prefix-sharing neighbours demonstrate the locality "
    "property.",
    tags=("scalar", "geo", "ext"),
    oracle="""
WITH geo AS (
  SELECT n_nationkey AS k, n_name,
         (n_nationkey * 6 - 72) * 1.0 AS lat,
         (n_nationkey * 13 - 150) * 1.0 AS lon
  FROM nation
), bits AS (
  -- 15 bisection bits per axis via scaled integer truncation
  SELECT k, n_name,
         CAST(floor((lat + 90) / 180 * 32768) AS BIGINT) AS lat_bits,
         CAST(floor((lon + 180) / 360 * 32768) AS BIGINT) AS lon_bits
  FROM geo
), interleaved AS (
  -- geohash interleaves lon first: build the 30-bit code
  SELECT k, n_name,
         list_reduce(list_transform(range(0, 15), i ->
           ((lon_bits // CAST(pow(2, 14 - i) AS BIGINT)) % 2) * 2
           + ((lat_bits // CAST(pow(2, 14 - i) AS BIGINT)) % 2)),
           (acc, x) -> acc * 4 + x) AS code
  FROM bits
), b32 AS (
  SELECT k, n_name, code,
         list_reduce(list_transform(range(0, 6), i ->
           substring('0123456789bcdefghjkmnpqrstuvwxyz',
                     CAST((code // CAST(pow(32, 5 - i) AS BIGINT)) % 32
                          AS INT) + 1, 1)),
           (acc, x) -> acc || x) AS geohash
  FROM interleaved
)
SELECT k AS nationkey, n_name AS nation, geohash
FROM b32 ORDER BY nationkey
""",
)
def scalar_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    geo = nation.select(
        F.col("n_nationkey").alias("k"),
        "n_name",
        ((F.col("n_nationkey") * 6 - 72).cast("double")).alias("lat"),
        ((F.col("n_nationkey") * 13 - 150).cast("double")).alias("lon"),
    )
    bits = geo.select(
        "k",
        "n_name",
        F.floor((F.col("lat") + 90) / 180 * 32768).cast("bigint").alias(
            "lat_bits"
        ),
        F.floor((F.col("lon") + 180) / 360 * 32768).cast("bigint").alias(
            "lon_bits"
        ),
    )
    interleaved = bits.withColumn(
        "code",
        F.expr(
            "aggregate(sequence(0, 14), 0L, (acc, i) -> acc * 4 "
            "+ ((lon_bits DIV cast(pow(2, 14 - i) as bigint)) % 2) * 2 "
            "+ ((lat_bits DIV cast(pow(2, 14 - i) as bigint)) % 2))"
        ),
    )
    b32 = interleaved.withColumn(
        "geohash",
        F.expr(
            "aggregate(sequence(0, 5), '', (acc, i) -> concat(acc, "
            "substring('0123456789bcdefghjkmnpqrstuvwxyz', "
            "cast((code DIV cast(pow(32, 5 - i) as bigint)) % 32 as int) + 1,"
            " 1)))"
        ),
    )
    return b32.select(
        F.col("k").alias("nationkey"),
        F.col("n_name").alias("nation"),
        "geohash",
    ).orderBy("nationkey")


# ---------------------------------------------------------------------------
# A6 ext: intraclass correlation (clustering-degree statistic)
# ---------------------------------------------------------------------------


@register(
    "agg_intraclass_correlation",
    doc="One-way random-effects ICC(1) for order values clustered within "
    "customers: per-cluster (k, mean, within-SS) cells fold in one "
    "pass (within-SS = k·var_pop), MSB/MSW reassemble with the "
    "unbalanced-design k₀ correction, ICC = (MSB−MSW)/(MSB+(k₀−1)MSW) "
    "— the number that says whether per-order rows are effectively "
    "independent (ICC≈0) or the customer is the real unit of "
    "analysis, i.e. whether every z-test in this catalog needs "
    "clustered errors.  The design effect at the mean cluster size "
    "is attached.",
    tags=("agg", "stats", "ext"),
    oracle="""
WITH g AS (
  SELECT o_custkey, count(*) AS k, avg(o_totalprice) AS m,
         var_pop(o_totalprice) * count(*) AS ssw_i
  FROM orders GROUP BY o_custkey
), t AS (
  SELECT count(*) AS n_clusters, sum(k) AS n,
         sum(k * m) / sum(k) AS grand,
         sum(ssw_i) AS ssw,
         sum(k * k) AS sum_k2,
         avg(k * 1.0) AS mean_k
  FROM g
), b AS (
  SELECT sum(k * pow(m - (SELECT grand FROM t), 2)) AS ssb FROM g
), ms AS (
  SELECT t.n_clusters, t.n, t.mean_k,
         b.ssb / (t.n_clusters - 1) AS msb,
         t.ssw / (t.n - t.n_clusters) AS msw,
         (t.n - t.sum_k2 * 1.0 / t.n) / (t.n_clusters - 1) AS k0
  FROM t, b
)
SELECT n_clusters, n AS n_orders,
       round((msb - msw) / (msb + (k0 - 1) * msw), 6) AS icc1,
       round(k0, 4) AS k0,
       round(1 + (mean_k - 1) * (msb - msw) / (msb + (k0 - 1) * msw), 4)
         AS design_effect
FROM ms
""",
)
def agg_intraclass_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    g = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("k"),
        F.avg("o_totalprice").alias("m"),
        (F.var_pop("o_totalprice") * F.count(F.lit(1))).alias("ssw_i"),
    )
    t = g.agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("k").alias("n"),
        (F.sum(F.col("k") * F.col("m")) / F.sum("k")).alias("grand"),
        F.sum("ssw_i").alias("ssw"),
        F.sum(F.col("k") * F.col("k")).alias("sum_k2"),
        F.avg(F.col("k").cast("double")).alias("mean_k"),
    )
    b = (
        g.crossJoin(F.broadcast(t.select("grand")))
        .agg(
            F.sum(
                F.col("k") * F.pow(F.col("m") - F.col("grand"), F.lit(2))
            ).alias("ssb")
        )
    )
    ms = t.crossJoin(F.broadcast(b)).select(
        "n_clusters",
        "n",
        "mean_k",
        (F.col("ssb") / (F.col("n_clusters") - 1)).alias("msb"),
        (F.col("ssw") / (F.col("n") - F.col("n_clusters"))).alias("msw"),
        (
            (F.col("n") - F.col("sum_k2") / F.col("n"))
            / (F.col("n_clusters") - 1)
        ).alias("k0"),
    )
    icc = (F.col("msb") - F.col("msw")) / (
        F.col("msb") + (F.col("k0") - 1) * F.col("msw")
    )
    return ms.select(
        "n_clusters",
        F.col("n").alias("n_orders"),
        F.round(icc, 6).alias("icc1"),
        F.round("k0", 4).alias("k0"),
        F.round(1 + (F.col("mean_k") - 1) * icc, 4).alias("design_effect"),
    )


# ---------------------------------------------------------------------------
# events ext: M/M/1 capacity projection from measured arrival rates
# ---------------------------------------------------------------------------


@register(
    "events_mm1_capacity_projection",
    doc="Capacity planning from first principles: the measured arrival "
    "rate λ (events/sec over the observation span) against a service-"
    "rate sweep μ ∈ {1.2λ, 1.5λ, 2λ, 3λ} gives the M/M/1 projections "
    "— utilization ρ, expected queue length ρ²/(1−ρ), expected wait "
    "ρ/(μ−λ) — the what-if table an SRE reads before sizing workers.  "
    "One aggregate for λ, closed form per scenario, the queueing "
    "companion of the Little's-law consistency check.",
    tags=("events", "queueing", "ext"),
    oracle="""
WITH lam AS (
  SELECT count(*) * 1.0
         / date_diff('second', min(ts), max(ts)) AS lambda_s
  FROM events
)
SELECT round(lambda_s, 6) AS lambda_per_s,
       CAST(s.factor AS DOUBLE) AS mu_over_lambda,
       round(1.0 / s.factor, 6) AS rho,
       round(pow(1.0 / s.factor, 2) / (1 - 1.0 / s.factor), 6)
         AS expected_queue_len,
       round((1.0 / s.factor) / (lambda_s * s.factor - lambda_s), 4)
         AS expected_wait_s
FROM lam CROSS JOIN (VALUES (1.2), (1.5), (2.0), (3.0)) s(factor)
ORDER BY mu_over_lambda
""",
)
def events_mm1_capacity_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    lam = ev.agg(
        (
            F.count(F.lit(1))
            / (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
        ).alias("lambda_s")
    )
    scen = lam.select(
        "lambda_s",
        F.explode(
            F.array(F.lit(1.2), F.lit(1.5), F.lit(2.0), F.lit(3.0))
        ).alias("factor"),
    )
    rho = 1.0 / F.col("factor")
    return scen.select(
        F.round("lambda_s", 6).alias("lambda_per_s"),
        F.col("factor").alias("mu_over_lambda"),
        F.round(rho, 6).alias("rho"),
        F.round(F.pow(rho, F.lit(2)) / (1 - rho), 6).alias(
            "expected_queue_len"
        ),
        F.round(
            rho / (F.col("lambda_s") * F.col("factor") - F.col("lambda_s")), 4
        ).alias("expected_wait_s"),
    ).orderBy("mu_over_lambda")


# ---------------------------------------------------------------------------
# text ext: Burrows' Delta stylometric distance between sources
# ---------------------------------------------------------------------------


@register(
    "text_burrows_delta",
    doc="Burrows' Delta, the stylometry standard: relative frequencies of "
    "the corpus top-30 words per source, z-scored across sources per "
    "word, and the pairwise Delta = mean |z₁ − z₂| — authorship/"
    "register distance that weights every marker word equally "
    "regardless of raw frequency (unlike the JS divergence entry, "
    "which the frequent words dominate).  Explode → shares → "
    "per-word moments → bounded source pairs.",
    tags=("text", "stylometry", "ext"),
    oracle="""
WITH tok AS (
  SELECT source,
         unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                            'g'), ' ')) AS t
  FROM documents
), top AS (
  SELECT t FROM (
    SELECT t, count(*) AS n FROM tok GROUP BY t
    ORDER BY n DESC, t LIMIT 30
  )
), share AS (
  SELECT tok.source, tok.t,
         count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY tok.source)
           AS f
  FROM tok JOIN top USING (t)
  GROUP BY tok.source, tok.t
), z AS (
  SELECT source, t,
         (f - avg(f) OVER (PARTITION BY t))
           / stddev_samp(f) OVER (PARTITION BY t) AS z
  FROM share
), pairs AS (
  SELECT a.source AS src_a, b.source AS src_b,
         avg(abs(a.z - b.z)) AS delta, count(*) AS n_words
  FROM z a JOIN z b ON a.t = b.t AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT src_a, src_b, n_words, round(delta, 6) AS burrows_delta
FROM pairs ORDER BY src_a, src_b
""",
)
def text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..operators import textstats as ts

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(ts.tokens(F.col("text"))).alias("t"))
    top = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "t")
        .limit(30)
        .select("t")
    )
    share = (
        tok.join(F.broadcast(top), "t")
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "source",
            "t",
            (
                F.col("c")
                / F.sum("c").over(Window.partitionBy("source"))
            ).alias("f"),
        )
    )
    wt = Window.partitionBy("t")
    z = share.select(
        "source",
        "t",
        (
            (F.col("f") - F.avg("f").over(wt)) / F.stddev_samp("f").over(wt)
        ).alias("z"),
    )
    a = z.select(F.col("source").alias("src_a"), "t", F.col("z").alias("za"))
    b = z.select(
        F.col("source").alias("src_b"), F.col("t").alias("t2"),
        F.col("z").alias("zb"),
    )
    pairs = (
        a.join(
            b,
            (F.col("t") == F.col("t2")) & (F.col("src_a") < F.col("src_b")),
        )
        .groupBy("src_a", "src_b")
        .agg(
            F.avg(F.abs(F.col("za") - F.col("zb"))).alias("delta"),
            F.count(F.lit(1)).alias("n_words"),
        )
    )
    return pairs.select(
        "src_a", "src_b", "n_words", F.round("delta", 6).alias("burrows_delta")
    ).orderBy("src_a", "src_b")


# ---------------------------------------------------------------------------
# events ext: spectral entropy (regularity of the rhythm)
# ---------------------------------------------------------------------------


@register(
    "events_spectral_entropy",
    doc="Spectral entropy of the daily event-count series: the DFT power "
    "grid over periods 2-14 days (same construction as the period "
    "scan) normalized to a distribution, whose Shannon entropy "
    "divided by log(n) lands in [0,1] — 0 means one metronomic "
    "cycle owns the signal, 1 means white noise.  The single-number "
    "rhythm-regularity summary on top of "
    "events_spectral_period_scan's full grid.",
    tags=("events", "timeseries", "ext"),
    oracle="""
WITH d AS (
  SELECT row_number() OVER (ORDER BY date_trunc('day', ts)) - 1 AS t,
         count(*) AS y
  FROM events GROUP BY date_trunc('day', ts)
), c AS (
  SELECT t, y - avg(y) OVER () AS yc FROM d
), grid AS (
  SELECT p.p,
         pow(sum(yc * cos(2 * pi() * t / p.p)), 2)
         + pow(sum(yc * sin(2 * pi() * t / p.p)), 2) AS power
  FROM c CROSS JOIN (SELECT unnest(range(2, 15)) AS p) p
  GROUP BY p.p
), norm_p AS (
  SELECT p, power / sum(power) OVER () AS q FROM grid
)
SELECT count(*) AS n_periods,
       round(-sum(q * ln(q)) / ln(count(*)), 6) AS spectral_entropy,
       round(max(q), 6) AS dominant_share
FROM norm_p
""",
)
def events_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    ).select(
        (F.row_number().over(Window.orderBy("day")) - 1).alias("t"), "y"
    )
    c = d.select(
        "t", (F.col("y") - F.avg("y").over(Window.partitionBy())).alias("yc")
    )
    ang = 2 * F.lit(3.141592653589793) * F.col("t") / F.col("p")
    grid = (
        c.select(
            "t", "yc", F.explode(F.sequence(F.lit(2), F.lit(14))).alias("p")
        )
        .groupBy("p")
        .agg(
            (
                F.pow(F.sum(F.col("yc") * F.cos(ang)), F.lit(2))
                + F.pow(F.sum(F.col("yc") * F.sin(ang)), F.lit(2))
            ).alias("power")
        )
    )
    q = F.col("power") / F.sum("power").over(Window.partitionBy())
    norm_p = grid.select(q.alias("q"))
    return norm_p.agg(
        F.count(F.lit(1)).alias("n_periods"),
        F.round(
            -F.sum(F.col("q") * F.log("q")) / F.log(F.count(F.lit(1))), 6
        ).alias("spectral_entropy"),
        F.round(F.max("q"), 6).alias("dominant_share"),
    )


# ---------------------------------------------------------------------------
# corpus ext: prompt-injection pattern scan
# ---------------------------------------------------------------------------


@register(
    "corpus_injection_scan",
    doc="Prompt-injection security gate for a training corpus: regexp "
    "census for instruction-override markers ('ignore previous/all "
    "instructions'), role-smuggling strings ('system prompt', "
    "'you are now'), and exfiltration asks ('repeat your "
    "instructions') — the LLM-era sibling of the license scan, run "
    "before text becomes weights.  Per-source counts + flagged "
    "share; one regexp projection pass, patterns broadcast.",
    tags=("corpus", "security", "ext"),
    oracle="""
WITH f AS (
  SELECT source,
         CASE WHEN regexp_matches(lower(text),
                   'ignore (previous|all|the) instructions')
              THEN 1 ELSE 0 END AS f_override,
         CASE WHEN regexp_matches(lower(text),
                   'system prompt|you are now|act as if')
              THEN 1 ELSE 0 END AS f_role,
         CASE WHEN regexp_matches(lower(text),
                   'repeat (your|the) (instructions|prompt)')
              THEN 1 ELSE 0 END AS f_exfil
  FROM documents
)
SELECT source, count(*) AS n_docs,
       sum(f_override) AS n_override,
       sum(f_role) AS n_role_smuggle,
       sum(f_exfil) AS n_exfil,
       round(avg(CASE WHEN f_override + f_role + f_exfil > 0
                      THEN 1.0 ELSE 0.0 END), 6) AS flagged_share
FROM f GROUP BY source ORDER BY source
""",
)
def corpus_injection_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))

    def _hit(pattern: str):
        return (F.regexp_count(low, F.lit(pattern)) > 0).cast("int")

    f = docs.select(
        "source",
        _hit("ignore (previous|all|the) instructions").alias("f_override"),
        _hit("system prompt|you are now|act as if").alias("f_role"),
        _hit("repeat (your|the) (instructions|prompt)").alias("f_exfil"),
    )
    any_hit = F.col("f_override") + F.col("f_role") + F.col("f_exfil") > 0
    return (
        f.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("f_override").alias("n_override"),
            F.sum("f_role").alias("n_role_smuggle"),
            F.sum("f_exfil").alias("n_exfil"),
            F.round(
                F.avg(F.when(any_hit, 1.0).otherwise(0.0)), 6
            ).alias("flagged_share"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# A6 ext: quantile treatment effects (distributional lift)
# ---------------------------------------------------------------------------


@register(
    "agg_quantile_treatment_effects",
    doc="Distributional view of the md5-arm experiment: rank-based "
    "P10/P25/P50/P75/P90 of per-user order value in each arm, and "
    "the per-quantile difference — the quantile treatment effects "
    "that reveal a tail-only lift a mean test averages away.  One "
    "rank window per arm (partitioned, so no single-partition sort), "
    "pivoted by the 5 fixed probes.",
    tags=("agg", "experiment", "ext"),
    oracle="""
WITH u AS (
  SELECT ascii(substring(md5(o_custkey::VARCHAR), 1, 1)) % 2 AS arm,
         round(o_totalprice, 2) AS v
  FROM orders
), r AS (
  SELECT arm, v,
         row_number() OVER (PARTITION BY arm ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY arm) AS cnt
  FROM u
), q AS (
  SELECT p.p, r.arm, r.v
  FROM r CROSS JOIN (VALUES (0.1), (0.25), (0.5), (0.75), (0.9)) p(p)
  WHERE r.rn = CAST(ceil(p.p * r.cnt) AS BIGINT)
)
SELECT CAST(p AS DOUBLE) AS quantile,
       max(CASE WHEN arm = 1 THEN v END) AS treat_q,
       max(CASE WHEN arm = 0 THEN v END) AS control_q,
       round(max(CASE WHEN arm = 1 THEN v END)
             - max(CASE WHEN arm = 0 THEN v END), 2) AS qte
FROM q GROUP BY p ORDER BY quantile
""",
)
def agg_quantile_treatment_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    arm = (
        F.ascii(F.substring(F.md5(F.col("o_custkey").cast("string").cast("binary")), 1, 1))
        % 2
    )
    u = orders.select(arm.alias("arm"), F.round("o_totalprice", 2).alias("v"))
    r = u.select(
        "arm",
        "v",
        F.row_number().over(Window.partitionBy("arm").orderBy("v")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("arm")).alias("cnt"),
    )
    probes = F.array(
        F.lit(0.1), F.lit(0.25), F.lit(0.5), F.lit(0.75), F.lit(0.9)
    )
    q = r.select("arm", "v", "rn", "cnt", F.explode(probes).alias("p")).filter(
        F.col("rn") == F.ceil(F.col("p") * F.col("cnt")).cast("bigint")
    )
    tq = F.max(F.when(F.col("arm") == 1, F.col("v")))
    cq = F.max(F.when(F.col("arm") == 0, F.col("v")))
    return (
        q.groupBy("p")
        .agg(
            tq.alias("treat_q"),
            cq.alias("control_q"),
            F.round(tq - cq, 2).alias("qte"),
        )
        .select(
            F.col("p").cast("double").alias("quantile"),
            "treat_q",
            "control_q",
            "qte",
        )
        .orderBy("quantile")
    )


# ---------------------------------------------------------------------------
# text ext: lexicon-based sentiment polarity
# ---------------------------------------------------------------------------

_POS_WORDS = (
    "good", "great", "best", "better", "happy", "love", "excellent",
    "positive", "success", "win",
)
_NEG_WORDS = (
    "bad", "worst", "worse", "sad", "hate", "terrible", "negative",
    "failure", "lose", "problem",
)


_SENTIMENT_ORACLE = f"""
WITH t AS (
  SELECT source, string_split({_NORM}, ' ') AS toks FROM documents
), f AS (
  SELECT source,
         len(list_filter(toks, x -> list_contains(['good', 'great', 'best', 'better', 'happy', 'love', 'excellent', 'positive', 'success', 'win'], x))) AS n_pos,
         len(list_filter(toks, x -> list_contains(['bad', 'worst', 'worse', 'sad', 'hate', 'terrible', 'negative', 'failure', 'lose', 'problem'], x))) AS n_neg
  FROM t
)
SELECT source,
       count(*) AS n_docs,
       sum(n_pos) AS total_pos_hits,
       sum(n_neg) AS total_neg_hits,
       round(avg((n_pos - n_neg) * 1.0 / (n_pos + n_neg + 1.0)), 6)
         AS mean_polarity,
       round(avg(CASE WHEN n_pos + n_neg > 0 THEN 1.0 ELSE 0.0 END), 6)
         AS subjective_share
FROM f GROUP BY source ORDER BY source
"""


@register(
    "text_sentiment_lexicon",
    doc="Lexicon sentiment, the pre-neural baseline that still powers "
    "dashboards: positive/negative word lists as broadcast arrays, "
    "per-document polarity (pos−neg)/(pos+neg) from one HOF filter "
    "pass, rolled up per source with the subjective share (documents "
    "containing any sentiment word at all).  The fixture text is "
    "synthetic, the machinery — dictionary intersection at token "
    "level, smoothed polarity — is the deliverable.",
    tags=("text", "sentiment", "ext"),
    oracle=_SENTIMENT_ORACLE,
)
def text_sentiment_lexicon(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import textstats as ts

    docs = load_table(spark, sf_dir, "documents")
    toks = ts.tokens(F.col("text"))
    pos_arr = F.array(*[F.lit(w) for w in _POS_WORDS])
    neg_arr = F.array(*[F.lit(w) for w in _NEG_WORDS])
    n_pos = F.size(F.filter(toks, lambda t: F.array_contains(pos_arr, t)))
    n_neg = F.size(F.filter(toks, lambda t: F.array_contains(neg_arr, t)))
    f = docs.select(
        "source", n_pos.alias("n_pos"), n_neg.alias("n_neg")
    ).withColumn(
        "polarity",
        (F.col("n_pos") - F.col("n_neg"))
        / (F.col("n_pos") + F.col("n_neg") + F.lit(1.0)),
    )
    return (
        f.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_pos").alias("total_pos_hits"),
            F.sum("n_neg").alias("total_neg_hits"),
            F.round(F.avg("polarity"), 6).alias("mean_polarity"),
            F.round(
                F.avg(
                    F.when(
                        F.col("n_pos") + F.col("n_neg") > 0, 1.0
                    ).otherwise(0.0)
                ),
                6,
            ).alias("subjective_share"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# W5 ext: I-MR individuals control chart
# ---------------------------------------------------------------------------


@register(
    "window_imr_control_chart",
    doc="Shewhart individuals/moving-range chart on daily event counts: "
    "the center line and the ±2.66·MR̄ control limits derive from the "
    "mean moving range (one lag window), out-of-control days are "
    "flagged against them, and the MR chart's own D4 limit "
    "(3.267·MR̄) screens variability shifts — the SPC chart for "
    "one-at-a-time observations, complementing the subgrouped "
    "Bollinger/Cp entries.  Flagged-day census output.",
    tags=("window", "spc", "ext"),
    oracle="""
WITH d AS (
  SELECT date_trunc('day', ts) AS day, count(*) * 1.0 AS y
  FROM events GROUP BY 1
), mr AS (
  SELECT day, y,
         abs(y - lag(y) OVER (ORDER BY day)) AS mrange
  FROM d
), lim AS (
  SELECT avg(y) AS center, avg(mrange) AS mr_bar FROM mr
)
SELECT (SELECT count(*) FROM d) AS n_days,
       round(lim.center, 4) AS center_line,
       round(lim.center - 2.66 * lim.mr_bar, 4) AS lcl,
       round(lim.center + 2.66 * lim.mr_bar, 4) AS ucl,
       (SELECT count(*) FROM mr, lim
        WHERE mr.y < lim.center - 2.66 * lim.mr_bar
           OR mr.y > lim.center + 2.66 * lim.mr_bar) AS n_out_of_control,
       (SELECT count(*) FROM mr, lim
        WHERE mr.mrange > 3.267 * lim.mr_bar) AS n_mr_violations
FROM lim
""",
)
def window_imr_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    mr = d.select(
        "day",
        "y",
        F.abs(F.col("y") - F.lag("y").over(Window.orderBy("day"))).alias(
            "mrange"
        ),
    )
    lim = mr.agg(
        F.avg("y").alias("center"),
        F.avg("mrange").alias("mr_bar"),
        F.count(F.lit(1)).alias("n_days"),
    )
    j = mr.crossJoin(F.broadcast(lim))
    lcl = F.col("center") - 2.66 * F.col("mr_bar")
    ucl = F.col("center") + 2.66 * F.col("mr_bar")
    out = j.agg(
        F.any_value("n_days").alias("n_days"),
        F.round(F.any_value("center"), 4).alias("center_line"),
        F.round(F.any_value("center") - 2.66 * F.any_value("mr_bar"), 4).alias(
            "lcl"
        ),
        F.round(F.any_value("center") + 2.66 * F.any_value("mr_bar"), 4).alias(
            "ucl"
        ),
        F.sum(
            F.when((F.col("y") < lcl) | (F.col("y") > ucl), 1).otherwise(0)
        ).alias("n_out_of_control"),
        F.sum(
            F.when(F.col("mrange") > 3.267 * F.col("mr_bar"), 1).otherwise(0)
        ).alias("n_mr_violations"),
    )
    return out


# ---------------------------------------------------------------------------
# A6 ext: Bland-Altman agreement between two total formulations
# ---------------------------------------------------------------------------


@register(
    "agg_bland_altman_order_totals",
    doc="Bland-Altman method-agreement analysis on two genuine "
    "measurements of the same quantity the schema carries: the order "
    "header total (o_totalprice) vs the detail-derived total "
    "Σ extendedprice·(1−disc)·(1+tax) — mean bias, the ±1.96σ limits "
    "of agreement, the share of orders outside them, and the "
    "proportional-bias slope (difference regressed on the mean) "
    "that says whether disagreement grows with order size.  The "
    "reconciliation entry's statistical upgrade; one join + one "
    "moment pass.",
    tags=("agg", "agreement", "ext"),
    oracle="""
WITH pair AS (
  SELECT o.o_orderkey,
         round(o.o_totalprice, 2) AS m1,
         round(sum(l.l_extendedprice * (1 - l.l_discount)
                   * (1 + l.l_tax)), 2) AS m2
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_totalprice
), d AS (
  SELECT (m1 - m2) AS diff, (m1 + m2) / 2 AS mean12 FROM pair
), s AS (
  SELECT count(*) AS n, avg(diff) AS bias, stddev_samp(diff) AS sd,
         regr_slope(diff, mean12) AS prop_bias
  FROM d
)
SELECT n,
       round(bias, 4) AS mean_bias,
       round(bias - 1.96 * sd, 4) AS loa_lower,
       round(bias + 1.96 * sd, 4) AS loa_upper,
       (SELECT count(*) FROM d, s
        WHERE d.diff < s.bias - 1.96 * s.sd
           OR d.diff > s.bias + 1.96 * s.sd) AS n_outside_loa,
       round(prop_bias, 8) AS proportional_bias_slope
FROM s
""",
)
def agg_bland_altman_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pair = (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("m2")
        )
        .select(F.round("o_totalprice", 2).alias("m1"), "m2")
    )
    d = pair.select(
        (F.col("m1") - F.col("m2")).alias("diff"),
        ((F.col("m1") + F.col("m2")) / 2).alias("mean12"),
    )
    s = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("diff").alias("bias"),
        F.stddev_samp("diff").alias("sd"),
        F.regr_slope(F.col("diff"), F.col("mean12")).alias("prop_bias"),
    )
    j = d.crossJoin(F.broadcast(s))
    outside = j.filter(
        (F.col("diff") < F.col("bias") - 1.96 * F.col("sd"))
        | (F.col("diff") > F.col("bias") + 1.96 * F.col("sd"))
    ).agg(F.count(F.lit(1)).alias("n_outside_loa"))
    return (
        s.crossJoin(F.broadcast(outside))
        .select(
            "n",
            F.round("bias", 4).alias("mean_bias"),
            F.round(F.col("bias") - 1.96 * F.col("sd"), 4).alias("loa_lower"),
            F.round(F.col("bias") + 1.96 * F.col("sd"), 4).alias("loa_upper"),
            "n_outside_loa",
            F.round("prop_bias", 8).alias("proportional_bias_slope"),
        )
    )


# ---------------------------------------------------------------------------
# P8 ext: portable Soundex (phonetic blocking key)
# ---------------------------------------------------------------------------


@register(
    "scalar_soundex_portable",
    doc="Soundex implemented from the algorithm, not a builtin (DuckDB "
    "has none, so the portable spelling IS the deliverable): first "
    "letter kept, consonants mapped to digit classes via nested "
    "translate, adjacent duplicate codes collapsed with one regexp "
    "backreference, vowels dropped, padded to 4 — applied to part-"
    "name first words as the phonetic blocking key fuzzy matching "
    "uses before paying for edit distances.  Key-space census plus "
    "the biggest phonetic bucket.",
    tags=("scalar", "text", "ext"),
    oracle="""
WITH w AS (
  SELECT DISTINCT lower(string_split(p_name, ' ')[1]) AS word FROM part
), coded AS (
  SELECT word,
         upper(substring(word, 1, 1)) ||
         substring(
           regexp_replace(
             regexp_replace(
               translate(substring(word, 2),
                         'bfpvcgjkqsxzdtlmnraeiouyhw',
                         '11112222222233455600000000'),
               '(.)\\1+', '\\1', 'g'),
             '0', '', 'g') || '000',
           1, 3) AS sdx
  FROM w
), buckets AS (
  SELECT sdx, count(*) AS n_words FROM coded GROUP BY sdx
)
SELECT (SELECT count(*) FROM w) AS n_words,
       (SELECT count(*) FROM buckets) AS n_soundex_keys,
       (SELECT max(n_words) FROM buckets) AS biggest_bucket,
       (SELECT sdx FROM buckets ORDER BY n_words DESC, sdx LIMIT 1)
         AS biggest_key
""",
)
def scalar_soundex_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    word = F.lower(F.split(F.col("p_name"), " ").getItem(0))
    w = part.select(word.alias("word")).distinct()
    tail = F.expr("substring(word, 2)")
    mapped = F.translate(
        tail,
        "bfpvcgjkqsxzdtlmnraeiouyhw",
        "11112222222233455600000000",
    )
    collapsed = F.regexp_replace(mapped, "(.)\\1+", "$1")
    cleaned = F.regexp_replace(collapsed, "0", "")
    sdx = F.concat(
        F.upper(F.substring(F.col("word"), 1, 1)),
        F.substring(F.concat(cleaned, F.lit("000")), 1, 3),
    )
    coded = w.select("word", sdx.alias("sdx"))
    buckets = coded.groupBy("sdx").agg(F.count(F.lit(1)).alias("n_words"))
    top = (
        buckets.orderBy(F.desc("n_words"), "sdx")
        .limit(1)
        .select(
            F.col("n_words").alias("biggest_bucket"),
            F.col("sdx").alias("biggest_key"),
        )
    )
    stats = w.agg(F.count(F.lit(1)).alias("n_words")).crossJoin(
        F.broadcast(buckets.agg(F.count(F.lit(1)).alias("n_soundex_keys")))
    )
    return stats.crossJoin(F.broadcast(top)).select(
        "n_words", "n_soundex_keys", "biggest_bucket", "biggest_key"
    )


# ---------------------------------------------------------------------------
# A6 ext: full correlation matrix in one pass
# ---------------------------------------------------------------------------


@register(
    "agg_correlation_matrix",
    doc="The profiler's correlation matrix without N² scans: all six "
    "pairwise correlations of quantity / extendedprice / discount / "
    "tax ride ONE wide aggregate (corr is decomposable, so 6 corr "
    "expressions share the scan), then unpivot to the tidy "
    "(var_a, var_b, r) relation reports consume.  The multivariate "
    "completion of the single-pair corr/covar entry.",
    tags=("agg", "profile", "ext"),
    oracle="""
WITH w AS (
  SELECT corr(l_quantity, l_extendedprice) AS qty_price,
         corr(l_quantity, l_discount) AS qty_disc,
         corr(l_quantity, l_tax) AS qty_tax,
         corr(l_extendedprice, l_discount) AS price_disc,
         corr(l_extendedprice, l_tax) AS price_tax,
         corr(l_discount, l_tax) AS disc_tax
  FROM lineitem
)
SELECT p.var_a, p.var_b,
       round(CASE p.var_a || '|' || p.var_b
         WHEN 'quantity|price' THEN w.qty_price
         WHEN 'quantity|discount' THEN w.qty_disc
         WHEN 'quantity|tax' THEN w.qty_tax
         WHEN 'price|discount' THEN w.price_disc
         WHEN 'price|tax' THEN w.price_tax
         WHEN 'discount|tax' THEN w.disc_tax END, 6) AS r
FROM w CROSS JOIN (VALUES
  ('quantity', 'price'), ('quantity', 'discount'), ('quantity', 'tax'),
  ('price', 'discount'), ('price', 'tax'), ('discount', 'tax'))
  p(var_a, var_b)
ORDER BY var_a, var_b
""",
)
def agg_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = li.agg(
        F.corr("l_quantity", "l_extendedprice").alias("qty_price"),
        F.corr("l_quantity", "l_discount").alias("qty_disc"),
        F.corr("l_quantity", "l_tax").alias("qty_tax"),
        F.corr("l_extendedprice", "l_discount").alias("price_disc"),
        F.corr("l_extendedprice", "l_tax").alias("price_tax"),
        F.corr("l_discount", "l_tax").alias("disc_tax"),
    )
    pairs = [
        ("quantity", "price", "qty_price"),
        ("quantity", "discount", "qty_disc"),
        ("quantity", "tax", "qty_tax"),
        ("price", "discount", "price_disc"),
        ("price", "tax", "price_tax"),
        ("discount", "tax", "disc_tax"),
    ]
    stacked = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(a).alias("var_a"),
                    F.lit(b).alias("var_b"),
                    F.round(F.col(c), 6).alias("r"),
                )
                for a, b, c in pairs
            ]
        )
    )
    return (
        w.select(stacked.alias("p"))
        .select("p.var_a", "p.var_b", "p.r")
        .orderBy("var_a", "var_b")
    )


# ---------------------------------------------------------------------------
# P8 ext: ULID-style lexicographically-sortable id minting
# ---------------------------------------------------------------------------


@register(
    "scalar_ulid_mint",
    doc="ULID-shaped identifiers minted deterministically: a 10-char "
    "Crockford-base32 timestamp prefix (epoch millis of the event) "
    "+ a 16-char md5-derived 'randomness' tail — replay-stable like "
    "the UUIDv5 entry, but lexicographic order equals time order, "
    "which is the property that keeps ingest-ordered keys from "
    "shattering an LSM/parquet layout.  The monotonicity proof "
    "(sorted-by-ulid = sorted-by-ts) runs in-plan over a bounded "
    "event slice.",
    tags=("scalar", "keys", "ext"),
    oracle="""
WITH e AS (
  SELECT event_id, ts,
         CAST(epoch_ms(ts) AS BIGINT) AS ms
  FROM events WHERE event_id < 200
), ulid AS (
  SELECT event_id, ts, ms,
         list_reduce(list_transform(range(0, 10), i ->
           substring('0123456789ABCDEFGHJKMNPQRSTVWXYZ',
                     CAST((ms // CAST(pow(32, 9 - i) AS BIGINT)) % 32
                          AS INT) + 1, 1)),
           (acc, x) -> acc || x)
         || upper(substring(md5('ulid#' || event_id::VARCHAR), 1, 16))
           AS id
  FROM e
), chk AS (
  SELECT count(*) AS n,
         count(DISTINCT id) AS n_distinct,
         sum(CASE WHEN rn_by_id = rn_by_ts THEN 1 ELSE 0 END)
           AS n_order_agree
  FROM (
    SELECT id,
           row_number() OVER (ORDER BY id) AS rn_by_id,
           row_number() OVER (ORDER BY ms, event_id) AS rn_by_ts
    FROM ulid
  )
)
SELECT n, n_distinct, n_order_agree,
       n = n_distinct AND n = n_order_agree AS sortable_and_unique
FROM chk
""",
)
def scalar_ulid_mint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    e = ev.select(
        "event_id",
        (F.unix_timestamp("ts") * 1000 + F.date_format("ts", "SSS").cast("bigint")).alias("ms"),
    )
    prefix = F.expr(
        "aggregate(sequence(0, 9), '', (acc, i) -> concat(acc, "
        "substring('0123456789ABCDEFGHJKMNPQRSTVWXYZ', "
        "cast((ms DIV cast(pow(32, 9 - i) as bigint)) % 32 as int) + 1, 1)))"
    )
    tail = F.upper(
        F.substring(
            F.md5(
                F.concat(F.lit("ulid#"), F.col("event_id").cast("string")).cast(
                    "binary"
                )
            ),
            1,
            16,
        )
    )
    ulid = e.select("event_id", "ms", F.concat(prefix, tail).alias("id"))
    ranked = ulid.select(
        F.row_number().over(Window.orderBy("id")).alias("rn_by_id"),
        F.row_number().over(Window.orderBy("ms", "event_id")).alias("rn_by_ts"),
        "id",
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("id").alias("n_distinct"),
        F.sum(
            F.when(F.col("rn_by_id") == F.col("rn_by_ts"), 1).otherwise(0)
        ).alias("n_order_agree"),
        (
            (F.count(F.lit(1)) == F.countDistinct("id"))
            & (
                F.count(F.lit(1))
                == F.sum(
                    F.when(
                        F.col("rn_by_id") == F.col("rn_by_ts"), 1
                    ).otherwise(0)
                )
            )
        ).alias("sortable_and_unique"),
    )


# ---------------------------------------------------------------------------
# W5 ext: forecast tracking signal (bias monitor for the backtest)
# ---------------------------------------------------------------------------


@register(
    "window_forecast_tracking_signal",
    doc="Trigg's tracking signal over the trailing-3-month forecaster "
    "from the backtest entry: running Σ(error)/running mean |error| "
    "per month — drifting outside ±4 flags systematic bias (the "
    "forecaster is consistently high or low), which MAPE alone "
    "cannot distinguish from noise.  The monitor a forecasting "
    "pipeline evaluates at every step, as two running windows over "
    "the folded series; months beyond the control band counted.",
    tags=("window", "forecast", "ext"),
    oracle="""
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS mon,
         round(sum(o_totalprice), 2) AS y
  FROM orders GROUP BY 1
), f AS (
  SELECT mon, y,
         avg(y) OVER (ORDER BY mon ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
           AS fc,
         row_number() OVER (ORDER BY mon) AS rn
  FROM m
), e AS (
  SELECT mon, y - fc AS err, abs(y - fc) AS aerr,
         row_number() OVER (ORDER BY mon) AS k
  FROM f WHERE rn > 3
), ts_ AS (
  SELECT mon, k,
         sum(err) OVER (ORDER BY k)
           / (sum(aerr) OVER (ORDER BY k) / k) AS signal
  FROM e
)
SELECT count(*) AS n_months,
       round(min(signal), 4) AS min_signal,
       round(max(signal), 4) AS max_signal,
       sum(CASE WHEN abs(signal) > 4 THEN 1 ELSE 0 END)
         AS n_bias_alarms,
       round(avg(signal), 4) AS mean_signal
FROM ts_
""",
)
def window_forecast_tracking_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("y")
    )
    w = Window.orderBy("mon")
    f = m.select(
        "mon",
        "y",
        F.avg("y").over(w.rowsBetween(-3, -1)).alias("fc"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") > 3)
    e = f.select(
        "mon",
        (F.col("y") - F.col("fc")).alias("err"),
        F.abs(F.col("y") - F.col("fc")).alias("aerr"),
        F.row_number().over(Window.orderBy("mon")).alias("k"),
    )
    wk = Window.orderBy("k")
    signal = F.sum("err").over(wk) / (F.sum("aerr").over(wk) / F.col("k"))
    ts_ = e.select(signal.alias("signal"))
    return ts_.agg(
        F.count(F.lit(1)).alias("n_months"),
        F.round(F.min("signal"), 4).alias("min_signal"),
        F.round(F.max("signal"), 4).alias("max_signal"),
        F.sum(F.when(F.abs(F.col("signal")) > 4, 1).otherwise(0)).alias(
            "n_bias_alarms"
        ),
        F.round(F.avg("signal"), 4).alias("mean_signal"),
    )


# ---------------------------------------------------------------------------
# events ext: time irreversibility of the behaviour chain
# ---------------------------------------------------------------------------


@register(
    "events_time_irreversibility",
    doc="Arrow-of-time measure for the event chain: the KL divergence "
    "between the forward edge distribution P(i→j) and its time-"
    "reverse P(j→i) over the shared (smoothed) edge space — zero "
    "means the chain satisfies detailed balance and sessions look "
    "the same played backwards, positive quantifies directional "
    "flow (views precede purchases, never vice versa).  One lag "
    "pass to edge counts, a self-join of the 25-cell matrix with "
    "its transpose, closed form after.",
    tags=("events", "entropy", "ext"),
    oracle="""
WITH seq AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS dst
  FROM events
), e AS (
  SELECT src, dst, count(*) AS n FROM seq
  WHERE dst IS NOT NULL AND src <> dst GROUP BY src, dst
), pairs AS (
  SELECT f.src, f.dst,
         f.n + 0.5 AS nf,
         coalesce(r.n, 0) + 0.5 AS nr
  FROM e f LEFT JOIN e r ON r.src = f.dst AND r.dst = f.src
), tot AS (
  SELECT sum(nf) AS tf, sum(nr) AS tr FROM pairs
)
SELECT (SELECT count(*) FROM pairs) AS n_edges,
       round((SELECT sum((nf / tot.tf)
                         * ln((nf / tot.tf) / (nr / tot.tr)))
              FROM pairs, tot), 6) AS kl_forward_backward,
       (SELECT sum((nf / tot.tf) * ln((nf / tot.tf) / (nr / tot.tr)))
        FROM pairs, tot) > 0.05 AS time_directional
""",
)
def events_time_irreversibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("dst"),
    ).filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
    e = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    rev = e.select(
        F.col("src").alias("rsrc"), F.col("dst").alias("rdst"),
        F.col("n").alias("rn_"),
    )
    pairs = e.join(
        F.broadcast(rev),
        (F.col("rsrc") == F.col("dst")) & (F.col("rdst") == F.col("src")),
        "left",
    ).select(
        (F.col("n") + 0.5).alias("nf"),
        (F.coalesce(F.col("rn_"), F.lit(0)) + 0.5).alias("nr"),
    )
    tot = pairs.agg(F.sum("nf").alias("tf"), F.sum("nr").alias("tr"))
    j = pairs.crossJoin(F.broadcast(tot))
    pf = F.col("nf") / F.col("tf")
    pr = F.col("nr") / F.col("tr")
    kl = F.sum(pf * F.log(pf / pr))
    return j.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.round(kl, 6).alias("kl_forward_backward"),
        (kl > 0.05).alias("time_directional"),
    )


# ---------------------------------------------------------------------------
# cdc ext: medallion (bronze/silver/gold) layer audit
# ---------------------------------------------------------------------------


@register(
    "cdc_medallion_layer_audit",
    doc="The medallion architecture as one auditable query: bronze = raw "
    "changelog events, silver = the compacted live state (the "
    "single-shuffle fold), gold = the per-status aggregate a consumer "
    "reads — with the conservation identities between layers "
    "(gold rows ≤ silver rows ≤ bronze keys ≤ bronze events, and "
    "gold's total count equals silver's row count) proven in-plan.  "
    "The lineage summary every layered lakehouse reports.",
    tags=("cdc", "lineage", "ext"),
    oracle=f"""
WITH ch AS ({ORDERS_CHANGELOG_SQL}),
silver AS (
  SELECT * FROM (
    SELECT CAST(o_orderkey AS VARCHAR) AS rid,
           {_FOLD_LAMBDA} AS cdc_action,
           arg_max(o_orderstatus, seq) AS st
    FROM ch WHERE o_orderkey IS NOT NULL GROUP BY 1
  ) WHERE cdc_action NOT IN ('#absent#', 'delete')
), gold AS (
  SELECT st, count(*) AS n FROM silver GROUP BY st
)
SELECT (SELECT count(*) FROM ch) AS bronze_events,
       (SELECT count(DISTINCT o_orderkey) FROM ch
        WHERE o_orderkey IS NOT NULL) AS bronze_keys,
       (SELECT count(*) FROM silver) AS silver_rows,
       (SELECT count(*) FROM gold) AS gold_rows,
       (SELECT sum(n) FROM gold) = (SELECT count(*) FROM silver)
         AS conservation_holds
""",
)
def cdc_medallion_layer_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.compaction import compact
    from ..sources.changelog import orders_changelog

    ch = orders_changelog(spark, sf_dir)
    bronze = ch.agg(
        F.count(F.lit(1)).alias("bronze_events"),
        F.countDistinct(
            F.when(F.col("o_orderkey").isNotNull(), F.col("o_orderkey"))
        ).alias("bronze_keys"),
    )
    from ..sources.changelog import ORDERS_PAYLOAD, ORDERS_PK

    silver = compact(ch, ORDERS_PK, ORDERS_PAYLOAD).filter(
        F.col("cdc_action") != "delete"
    )
    silver_n = silver.agg(F.count(F.lit(1)).alias("silver_rows"))
    gold = silver.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
    gold_s = gold.agg(
        F.count(F.lit(1)).alias("gold_rows"),
        F.sum("n").alias("gold_total"),
    )
    return (
        bronze.crossJoin(F.broadcast(silver_n))
        .crossJoin(F.broadcast(gold_s))
        .select(
            "bronze_events",
            "bronze_keys",
            "silver_rows",
            "gold_rows",
            (F.col("gold_total") == F.col("silver_rows")).alias(
                "conservation_holds"
            ),
        )
    )


# ---------------------------------------------------------------------------
# text ext: BLEU-style n-gram precision between paired documents
# ---------------------------------------------------------------------------


@register(
    "text_bleu_proxy_pairs",
    doc="The generation-eval metric shape without a model: adjacent "
    "same-source documents pair up as (candidate, reference) exactly "
    "like the SFT-pair entry, and BLEU's core — clipped unigram and "
    "bigram precision with the brevity penalty — computes from "
    "token-multiset intersections (two explodes, grouped min() for "
    "the clip, one geometric mean).  Corpus-level BLEU-2 per source; "
    "near-duplicate pairs surface as outlier scores, which is the "
    "dedup tie-in.",
    tags=("text", "eval", "ext"),
    oracle="""
WITH t AS (
  SELECT doc_id, source,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                      ' ') AS toks,
         lead(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS ref_id
  FROM documents
), pairs AS (
  SELECT c.doc_id, c.source, c.toks AS cand, r.toks AS ref
  FROM t c JOIN t r ON r.doc_id = c.ref_id
), uni AS (
  SELECT p.doc_id, p.source, u.w,
         count(*) AS c_cnt
  FROM pairs p, LATERAL unnest(p.cand) u(w)
  GROUP BY p.doc_id, p.source, u.w
), runi AS (
  SELECT p.doc_id, u.w, count(*) AS r_cnt
  FROM pairs p, LATERAL unnest(p.ref) u(w)
  GROUP BY p.doc_id, u.w
), clip AS (
  SELECT uni.doc_id, uni.source,
         sum(least(uni.c_cnt, coalesce(runi.r_cnt, 0))) AS matched,
         sum(uni.c_cnt) AS total
  FROM uni LEFT JOIN runi
    ON runi.doc_id = uni.doc_id AND runi.w = uni.w
  GROUP BY uni.doc_id, uni.source
), lens AS (
  SELECT doc_id, source, len(cand) AS lc, len(ref) AS lr FROM pairs
), scored AS (
  SELECT c.source,
         (c.matched + 0.5) * 1.0 / (c.total + 0.5) AS p1,
         CASE WHEN l.lc >= l.lr THEN 1.0
              ELSE exp(1 - l.lr * 1.0 / l.lc) END AS bp
  FROM clip c JOIN lens l ON l.doc_id = c.doc_id
)
SELECT source, count(*) AS n_pairs,
       round(avg(bp * p1), 6) AS mean_bleu1,
       round(max(bp * p1), 6) AS max_bleu1,
       sum(CASE WHEN bp * p1 > 0.5 THEN 1 ELSE 0 END)
         AS n_suspicious_pairs
FROM scored GROUP BY source ORDER BY source
""",
)
def text_bleu_proxy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..operators import textstats as ts

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "source",
        ts.tokens(F.col("text")).alias("toks"),
    ).withColumn(
        "ref_id",
        F.lead("doc_id").over(Window.partitionBy("source").orderBy("doc_id")),
    )
    c = t.select("doc_id", "source", F.col("toks").alias("cand"), "ref_id")
    r = t.select(F.col("doc_id").alias("rid"), F.col("toks").alias("ref"))
    pairs = c.join(r, c.ref_id == r.rid).select(
        "doc_id", "source", "cand", "ref"
    )
    uni = (
        pairs.select("doc_id", "source", F.explode("cand").alias("w"))
        .groupBy("doc_id", "source", "w")
        .agg(F.count(F.lit(1)).alias("c_cnt"))
    )
    runi = (
        pairs.select("doc_id", F.explode("ref").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("r_cnt"))
    )
    clip = (
        uni.join(runi, ["doc_id", "w"], "left")
        .groupBy("doc_id", "source")
        .agg(
            F.sum(
                F.least(
                    F.col("c_cnt"), F.coalesce(F.col("r_cnt"), F.lit(0))
                )
            ).alias("matched"),
            F.sum("c_cnt").alias("total"),
        )
    )
    lens = pairs.select(
        "doc_id", F.size("cand").alias("lc"), F.size("ref").alias("lr")
    )
    scored = clip.join(lens, "doc_id").select(
        "source",
        ((F.col("matched") + 0.5) / (F.col("total") + 0.5)).alias("p1"),
        F.when(F.col("lc") >= F.col("lr"), F.lit(1.0))
        .otherwise(F.exp(1 - F.col("lr") / F.col("lc")))
        .alias("bp"),
    )
    bleu = F.col("bp") * F.col("p1")
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg(bleu), 6).alias("mean_bleu1"),
            F.round(F.max(bleu), 6).alias("max_bleu1"),
            F.sum(F.when(bleu > 0.5, 1).otherwise(0)).alias(
                "n_suspicious_pairs"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# A6 ext: adjusted Rand index between two partitions
# ---------------------------------------------------------------------------


@register(
    "agg_adjusted_rand_index",
    doc="Adjusted Rand index between two partitions of the customer base "
    "— market segment vs home region — from nothing but the "
    "contingency table: Σ C(n_ij,2) against its expectation under "
    "independent partitions, the chance-corrected pair-counting "
    "agreement clustering evaluations standardize on (and the metric "
    "an IVF/k-means assignment would be scored with against labels).  "
    "One joint-cell aggregate, closed form after; ARI ≈ 0 here "
    "certifies segment and geography are independent structures.",
    tags=("agg", "clustering", "ext"),
    oracle="""
WITH j AS (
  SELECT c.c_mktsegment AS a, r.r_name AS b, count(*) AS n
  FROM customer c
  JOIN nation na ON na.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = na.n_regionkey
  GROUP BY 1, 2
), cells AS (
  SELECT sum(n * (n - 1) / 2.0) AS sum_nij2, sum(n) AS n_total FROM j
), marg_a AS (
  SELECT sum(sa * (sa - 1) / 2.0) AS sum_a2 FROM (
    SELECT sum(n) AS sa FROM j GROUP BY a
  )
), marg_b AS (
  SELECT sum(sb * (sb - 1) / 2.0) AS sum_b2 FROM (
    SELECT sum(n) AS sb FROM j GROUP BY b
  )
), calc AS (
  SELECT c.sum_nij2, a.sum_a2, b.sum_b2,
         c.n_total * (c.n_total - 1) / 2.0 AS n2,
         a.sum_a2 * b.sum_b2 / (c.n_total * (c.n_total - 1) / 2.0)
           AS expected
  FROM cells c, marg_a a, marg_b b
)
SELECT CAST(n2 AS BIGINT) AS n_pairs,
       round(sum_nij2, 1) AS observed_agreement,
       round(expected, 1) AS expected_agreement,
       round((sum_nij2 - expected)
             / ((sum_a2 + sum_b2) / 2 - expected), 6) AS adjusted_rand
FROM calc
""",
)
def agg_adjusted_rand_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    reg = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    j = (
        cust.join(F.broadcast(nat), nat.n_nationkey == cust.c_nationkey)
        .join(F.broadcast(reg), reg.r_regionkey == nat.n_regionkey)
        .groupBy(
            F.col("c_mktsegment").alias("a"), F.col("r_name").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cells = j.agg(
        F.sum(F.col("n") * (F.col("n") - 1) / 2.0).alias("sum_nij2"),
        F.sum("n").alias("n_total"),
    )
    marg_a = (
        j.groupBy("a")
        .agg(F.sum("n").alias("sa"))
        .agg(F.sum(F.col("sa") * (F.col("sa") - 1) / 2.0).alias("sum_a2"))
    )
    marg_b = (
        j.groupBy("b")
        .agg(F.sum("n").alias("sb"))
        .agg(F.sum(F.col("sb") * (F.col("sb") - 1) / 2.0).alias("sum_b2"))
    )
    calc = (
        cells.crossJoin(F.broadcast(marg_a))
        .crossJoin(F.broadcast(marg_b))
        .withColumn(
            "n2", F.col("n_total") * (F.col("n_total") - 1) / 2.0
        )
        .withColumn(
            "expected", F.col("sum_a2") * F.col("sum_b2") / F.col("n2")
        )
    )
    return calc.select(
        F.col("n2").cast("bigint").alias("n_pairs"),
        F.round("sum_nij2", 1).alias("observed_agreement"),
        F.round("expected", 1).alias("expected_agreement"),
        F.round(
            (F.col("sum_nij2") - F.col("expected"))
            / ((F.col("sum_a2") + F.col("sum_b2")) / 2 - F.col("expected")),
            6,
        ).alias("adjusted_rand"),
    )
