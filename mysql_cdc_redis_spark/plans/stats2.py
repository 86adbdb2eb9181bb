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
