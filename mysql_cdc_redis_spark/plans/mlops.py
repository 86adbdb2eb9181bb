"""ML-ops / data-quality operators (SURVEY.md §2 EXT, north-star rows).

The reference ships raw rows to a warehouse (dump2csv.py, loadcsv.py)
with no notion of model or feature quality; these are the checks a
training-data platform runs on top of that warehouse: multi-feature
drift grids, label-leakage screens, worst-slice discovery, champion/
challenger disagreement, and the one-row data card a dataset release
ships with.

Scale stance (100 TB): every entry folds the fact/corpus table with
one or two decomposable aggregates (binned eCDFs, conditional moment
cells) before any cross-feature or cross-slice work; slices and bins
are bounded relations, so the expensive part is always a single scan
+ shuffle per grain.  No collects, no per-feature rescans (features
share one pass via conditional aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .catalog import register
from .llm import _NORM, _STOP_SQL  # shared lang-ID oracle SQL fragments

_LANGID_PRED_SQL = f"""
WITH d AS (SELECT doc_id, source, lang, {_NORM} AS norm FROM documents),
t AS (SELECT doc_id, source, lang, string_split(norm, ' ') AS toks FROM d),
m AS (
  SELECT doc_id, source, lang,
         len(list_filter(toks, x -> list_contains({_STOP_SQL}, x)))
           / len(toks) >= 0.05 AS pred_en
  FROM t
)"""

_SLICE_FINDER_ORACLE = f"""{_LANGID_PRED_SQL},
cells AS (
  SELECT source, lang, count(*) AS n_docs,
         sum(CASE WHEN (lang = 'en') = pred_en THEN 1 ELSE 0 END) AS n_correct
  FROM m GROUP BY source, lang
), sl AS (
  SELECT source, lang, n_docs,
         round(n_correct * 1.0 / n_docs, 6) AS slice_acc,
         round(sum(n_correct) OVER () * 1.0 / sum(n_docs) OVER (), 6)
           AS overall_acc
  FROM cells
)
SELECT source, lang, n_docs, slice_acc, overall_acc,
       round(slice_acc - overall_acc, 6) AS acc_gap
FROM sl WHERE n_docs >= 10
ORDER BY acc_gap, source, lang LIMIT 5
"""

_DISAGREEMENT_ORACLE = f"""{_LANGID_PRED_SQL},
j AS (
  SELECT (d2.lang = 'en') AS truth,
         m.pred_en AS champ,
         length(regexp_replace(d2.text, '[^\\x00-\\x7F]', '', 'g'))
           * 1.0 / length(d2.text) >= 0.99 AS chall
  FROM m JOIN documents d2 ON d2.doc_id = m.doc_id
)
SELECT count(*) AS n_docs,
       round(avg(CASE WHEN champ = chall THEN 1.0 ELSE 0.0 END), 6)
         AS agreement_rate,
       round(avg(CASE WHEN champ = truth THEN 1.0 ELSE 0.0 END), 6)
         AS champion_acc,
       round(avg(CASE WHEN chall = truth THEN 1.0 ELSE 0.0 END), 6)
         AS challenger_acc,
       sum(CASE WHEN champ = truth AND champ <> chall THEN 1 ELSE 0 END)
         AS champ_right_chall_wrong,
       sum(CASE WHEN chall = truth AND champ <> chall THEN 1 ELSE 0 END)
         AS chall_right_champ_wrong
FROM j
"""

# ---------------------------------------------------------------------------
# drift: binned-KS grid over several features in one pass per period
# ---------------------------------------------------------------------------


@register(
    "mlops_drift_grid_binned_ks",
    doc="Multi-feature drift grid: l_quantity / l_discount / "
    "l_extendedprice compared between the 1996 and 2000 ship years via "
    "binned empirical CDFs (32 fixed-width bins per feature, both "
    "periods and all three features binned in ONE conditional-aggregate "
    "scan), drift per feature = max |ΔeCDF| over bin edges — the "
    "mergeable approximation of KS that works at any scale because the "
    "bins are value-independent.  agg_ks_two_sample is the exact "
    "single-feature special case.",
    tags=("mlops", "drift", "ext"),
    oracle="""
WITH b AS (
  SELECT f.feature,
         CASE f.feature
           WHEN 'quantity' THEN least(31, CAST(floor(l_quantity / 1.6) AS INT))
           WHEN 'discount' THEN least(31, CAST(floor(l_discount / 0.0035) AS INT))
           ELSE least(31, CAST(floor(l_extendedprice / 3500.0) AS INT))
         END AS bin,
         count(CASE WHEN year(l_shipdate) = 1996 THEN 1 END) AS n_a,
         count(CASE WHEN year(l_shipdate) = 2000 THEN 1 END) AS n_b
  FROM lineitem
  CROSS JOIN (VALUES ('quantity'), ('discount'), ('price')) AS f(feature)
  WHERE year(l_shipdate) IN (1996, 2000)
  GROUP BY 1, 2
), c AS (
  SELECT feature, bin,
         sum(n_a) OVER (PARTITION BY feature ORDER BY bin)
           * 1.0 / sum(n_a) OVER (PARTITION BY feature) AS cdf_a,
         sum(n_b) OVER (PARTITION BY feature ORDER BY bin)
           * 1.0 / sum(n_b) OVER (PARTITION BY feature) AS cdf_b
  FROM b
)
SELECT feature,
       round(max(abs(cdf_a - cdf_b)), 6) AS ks_binned,
       max(abs(cdf_a - cdf_b)) > 0.05 AS drifted
FROM c GROUP BY feature ORDER BY feature
""",
)
def mlops_drift_grid_binned_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    yr = F.year("l_shipdate")
    bin_expr = (
        F.when(
            F.col("feature") == "quantity",
            F.least(F.lit(31), F.floor(F.col("l_quantity") / 1.6).cast("int")),
        )
        .when(
            F.col("feature") == "discount",
            F.least(F.lit(31), F.floor(F.col("l_discount") / 0.0035).cast("int")),
        )
        .otherwise(
            F.least(
                F.lit(31), F.floor(F.col("l_extendedprice") / 3500.0).cast("int")
            )
        )
    )
    b = (
        li.filter(yr.isin(1996, 2000))
        .select(
            "l_quantity",
            "l_discount",
            "l_extendedprice",
            yr.alias("y"),
            F.explode(
                F.array(F.lit("quantity"), F.lit("discount"), F.lit("price"))
            ).alias("feature"),
        )
        .groupBy("feature", bin_expr.alias("bin"))
        .agg(
            F.count(F.when(F.col("y") == 1996, 1)).alias("n_a"),
            F.count(F.when(F.col("y") == 2000, 1)).alias("n_b"),
        )
    )
    wf = Window.partitionBy("feature")
    wc = wf.orderBy("bin")
    c = b.select(
        "feature",
        (F.sum("n_a").over(wc) / F.sum("n_a").over(wf)).alias("cdf_a"),
        (F.sum("n_b").over(wc) / F.sum("n_b").over(wf)).alias("cdf_b"),
    )
    diff = F.abs(F.col("cdf_a") - F.col("cdf_b"))
    return (
        c.groupBy("feature")
        .agg(
            F.round(F.max(diff), 6).alias("ks_binned"),
            (F.max(diff) > 0.05).alias("drifted"),
        )
        .orderBy("feature")
    )


# ---------------------------------------------------------------------------
# leakage: point-biserial screen of features against the label
# ---------------------------------------------------------------------------


@register(
    "mlops_label_leakage_screen",
    doc="Label-leakage screen: every candidate feature's point-biserial "
    "correlation with the has-URGENT-order label in one pass — the "
    "per-customer feature row (balance, order count, total spend, "
    "recency) folds from one join+aggregate, then corr(feature, label) "
    "for all features via a single wide aggregate (corr is "
    "decomposable).  A |r| near 1 means the feature encodes the label "
    "and must be quarantined before training.",
    tags=("mlops", "leakage", "ext"),
    oracle="""
WITH f AS (
  SELECT c.c_custkey,
         any_value(c.c_acctbal) AS bal,
         count(o.o_orderkey) AS n_orders,
         coalesce(sum(o.o_totalprice), 0) AS spend,
         max(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS y,
         max(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
           + 0.001 * any_value(c.c_custkey % 7) AS leaky
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
)
SELECT round(corr(bal, y), 6) AS r_acctbal,
       round(corr(n_orders, y), 6) AS r_n_orders,
       round(corr(spend, y), 6) AS r_spend,
       round(corr(leaky, y), 6) AS r_leaky_probe,
       corr(leaky, y) > 0.95 AS leak_detected
FROM f
""",
)
def mlops_label_leakage_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    y = F.max(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0))
    f = (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.any_value("c_acctbal").alias("bal"),
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum("o_totalprice"), F.lit(0.0)).alias("spend"),
            y.alias("y"),
            (y + 0.001 * F.any_value(F.col("c_custkey") % 7)).alias("leaky"),
        )
    )
    return f.agg(
        F.round(F.corr("bal", "y"), 6).alias("r_acctbal"),
        F.round(F.corr("n_orders", "y"), 6).alias("r_n_orders"),
        F.round(F.corr("spend", "y"), 6).alias("r_spend"),
        F.round(F.corr("leaky", "y"), 6).alias("r_leaky_probe"),
        (F.corr("leaky", "y") > 0.95).alias("leak_detected"),
    )


# ---------------------------------------------------------------------------
# slices: worst-performing (source, lang) slices of the lang-ID gate
# ---------------------------------------------------------------------------


@register(
    "mlops_slice_finder_langid",
    doc="Slice finder for the lang-ID heuristic: accuracy per "
    "(source, lang) slice vs the overall accuracy, minimum-support "
    "filtered, worst five slices surfaced — the systematic-error "
    "discovery loop (a model fine on average, broken on a slice).  One "
    "corpus pass to slice cells, windows over the tiny cell relation.",
    tags=("mlops", "eval", "ext"),
    oracle=_SLICE_FINDER_ORACLE,
)
def mlops_slice_finder_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..operators import textstats as ts

    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        "source",
        "lang",
        (
            (F.col("lang") == "en") == (ts.lang_id(F.col("text")) == "en")
        ).cast("int").alias("correct"),
    )
    cells = m.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("correct").alias("n_correct"),
    )
    w_all = Window.partitionBy()
    sl = cells.select(
        "source",
        "lang",
        "n_docs",
        F.round(F.col("n_correct") / F.col("n_docs"), 6).alias("slice_acc"),
        F.round(
            F.sum("n_correct").over(w_all) / F.sum("n_docs").over(w_all), 6
        ).alias("overall_acc"),
    )
    return (
        sl.filter(F.col("n_docs") >= 10)
        .withColumn(
            "acc_gap", F.round(F.col("slice_acc") - F.col("overall_acc"), 6)
        )
        .orderBy("acc_gap", "source", "lang")
        .limit(5)
    )


# ---------------------------------------------------------------------------
# champion/challenger: disagreement census between two heuristics
# ---------------------------------------------------------------------------


@register(
    "mlops_model_disagreement",
    doc="Champion/challenger shadow eval: the stopword-density lang-ID "
    "(champion) vs an ascii-density challenger, scored on the same "
    "corpus in one pass — agreement rate, each side's accuracy, and "
    "the McNemar discordant cells on exactly the rows where they "
    "disagree (the only rows that can change a rollout decision).",
    tags=("mlops", "eval", "ext"),
    oracle=_DISAGREEMENT_ORACLE,
)
def mlops_model_disagreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import textstats as ts

    docs = load_table(spark, sf_dir, "documents")
    ascii_ratio = F.length(
        F.regexp_replace(F.col("text"), "[^\\x00-\\x7F]", "")
    ) / F.length("text")
    m = docs.select(
        (F.col("lang") == "en").alias("truth"),
        (ts.lang_id(F.col("text")) == "en").alias("champ"),
        (ascii_ratio >= 0.99).alias("chall"),
    )
    agree = F.col("champ") == F.col("chall")
    return m.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(agree.cast("double")), 6).alias("agreement_rate"),
        F.round(
            F.avg((F.col("champ") == F.col("truth")).cast("double")), 6
        ).alias("champion_acc"),
        F.round(
            F.avg((F.col("chall") == F.col("truth")).cast("double")), 6
        ).alias("challenger_acc"),
        F.sum(
            F.when(
                (F.col("champ") == F.col("truth")) & ~agree, 1
            ).otherwise(0)
        ).alias("champ_right_chall_wrong"),
        F.sum(
            F.when(
                (F.col("chall") == F.col("truth")) & ~agree, 1
            ).otherwise(0)
        ).alias("chall_right_champ_wrong"),
    )


# ---------------------------------------------------------------------------
# release: one-row dataset data card
# ---------------------------------------------------------------------------


@register(
    "corpus_data_card",
    doc="The one-row data card a corpus release ships with: document and "
    "source counts, language entropy, exact-duplicate rate (md5 "
    "fingerprints), token totals under the whitespace tokenizer, and "
    "length quartiles — every number from two passes (one fingerprint "
    "aggregate, one wide moment aggregate), each decomposable.",
    tags=("mlops", "corpus", "ext"),
    oracle="""
WITH fp AS (
  SELECT count(*) AS n_docs,
         count(DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                           'g'))) AS n_unique
  FROM documents
), lang AS (
  SELECT -sum(p * log2(p)) AS lang_entropy FROM (
    SELECT count(*) * 1.0 / sum(count(*)) OVER () AS p
    FROM documents GROUP BY lang
  )
), base AS (
  SELECT count(DISTINCT source) AS n_sources,
         sum(len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                             'g'), ' '))) AS total_tokens
  FROM documents
), ranked AS (
  SELECT n_chars,
         row_number() OVER (ORDER BY n_chars) AS rn,
         count(*) OVER () AS cnt
  FROM documents
), quart AS (
  -- rank-based (type-1) quartiles: values at ceil(p·n) — actual data
  -- points, engine-exact
  SELECT max(CASE WHEN rn = CAST(ceil(0.25 * cnt) AS BIGINT)
                  THEN n_chars END) AS len_p25,
         max(CASE WHEN rn = CAST(ceil(0.50 * cnt) AS BIGINT)
                  THEN n_chars END) AS len_p50,
         max(CASE WHEN rn = CAST(ceil(0.75 * cnt) AS BIGINT)
                  THEN n_chars END) AS len_p75
  FROM ranked
)
SELECT fp.n_docs, base.n_sources,
       round(1.0 - fp.n_unique * 1.0 / fp.n_docs, 6) AS exact_dup_rate,
       round(lang.lang_entropy, 6) AS lang_entropy_bits,
       base.total_tokens, quart.len_p25, quart.len_p50, quart.len_p75
FROM fp, lang, base, quart
""",
)
def corpus_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..operators import textstats as ts

    docs = load_table(spark, sf_dir, "documents")
    fp = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(ts.fingerprint(F.col("text"))).alias("n_unique"),
    )
    w_all = Window.partitionBy()
    lang = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select((F.col("cnt") / F.sum("cnt").over(w_all)).alias("p"))
        .agg((-F.sum(F.col("p") * F.log2("p"))).alias("lang_entropy"))
    )
    ranked = docs.select(
        "n_chars",
        F.row_number().over(Window.orderBy("n_chars")).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("cnt"),
    )
    at = lambda p: F.max(  # noqa: E731
        F.when(
            F.col("rn") == F.ceil(F.lit(p) * F.col("cnt")).cast("bigint"),
            F.col("n_chars"),
        )
    )
    quart = ranked.agg(
        at(0.25).alias("len_p25"),
        at(0.50).alias("len_p50"),
        at(0.75).alias("len_p75"),
    )
    base = docs.agg(
        F.countDistinct("source").alias("n_sources"),
        F.sum(ts.token_count(F.col("text"))).alias("total_tokens"),
    )
    return (
        fp.crossJoin(F.broadcast(base))
        .crossJoin(F.broadcast(lang))
        .crossJoin(F.broadcast(quart))
        .select(
            "n_docs",
            "n_sources",
            F.round(1.0 - F.col("n_unique") / F.col("n_docs"), 6).alias(
                "exact_dup_rate"
            ),
            F.round("lang_entropy", 6).alias("lang_entropy_bits"),
            "total_tokens",
            "len_p25",
            "len_p50",
            "len_p75",
        )
    )
