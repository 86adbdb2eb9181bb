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


_MARGIN_SAMPLE_ORACLE = f"""
WITH d AS (SELECT doc_id, lang, {_NORM} AS norm FROM documents),
t AS (SELECT doc_id, lang, string_split(norm, ' ') AS toks FROM d),
m AS (
  SELECT doc_id, lang,
         len(list_filter(toks, x -> list_contains({_STOP_SQL}, x)))
           * 1.0 / len(toks) AS ratio
  FROM t
)
SELECT doc_id, lang,
       round(ratio, 6) AS stopword_ratio,
       round(abs(ratio - 0.05), 6) AS margin
FROM m ORDER BY abs(ratio - 0.05), doc_id LIMIT 10
"""


# ---------------------------------------------------------------------------
# eval: decision-threshold sweep with F1 (the operating-point picker)
# ---------------------------------------------------------------------------


@register(
    "mlops_threshold_sweep_f1",
    doc="Operating-point selection: sweep the account-balance decile "
    "boundaries as decision thresholds for the has-URGENT-order label "
    "and score precision / recall / F1 at every candidate — per-decile "
    "(pos,neg) cells fold in one fact pass, the sweep itself is suffix "
    "sums over 10 cells (predict-positive = everything above the "
    "cut), and the argmax is flagged in-plan.  The evaluation-side "
    "complement of feat_best_split_gini.",
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
         sum(pos) OVER (ORDER BY decile DESC) - pos AS _tp_above_excl,
         sum(pos) OVER () - sum(pos) OVER (ORDER BY decile) AS tp,
         sum(neg) OVER () - sum(neg) OVER (ORDER BY decile) AS fp,
         sum(pos) OVER () AS tpos
  FROM cell
), m AS (
  SELECT cut_decile, tp, fp,
         tp * 1.0 / nullif(tp + fp, 0) AS prec,
         tp * 1.0 / tpos AS rec
  FROM sweep WHERE cut_decile < 10
)
SELECT cut_decile, tp, fp,
       round(prec, 6) AS precision_,
       round(rec, 6) AS recall_,
       round(2 * prec * rec / nullif(prec + rec, 0), 6) AS f1,
       2 * prec * rec / nullif(prec + rec, 0)
         = max(2 * prec * rec / nullif(prec + rec, 0)) OVER () AS is_best
FROM m ORDER BY cut_decile
""",
)
def mlops_threshold_sweep_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    ).filter(F.col("cut_decile") < 10)
    prec = F.col("tp") / F.nullif((F.col("tp") + F.col("fp")).cast("double"), F.lit(0.0))
    rec = F.col("tp") / F.col("tpos")
    f1 = 2 * prec * rec / F.nullif(prec + rec, F.lit(0.0))
    m = sweep.select(
        "cut_decile",
        "tp",
        "fp",
        F.round(prec, 6).alias("precision_"),
        F.round(rec, 6).alias("recall_"),
        F.round(f1, 6).alias("f1"),
        f1.alias("_f1_raw"),
    )
    return (
        m.withColumn(
            "is_best", F.col("_f1_raw") == F.max("_f1_raw").over(w_all)
        )
        .drop("_f1_raw")
        .orderBy("cut_decile")
    )


# ---------------------------------------------------------------------------
# release: train/test contamination audit of the hash split
# ---------------------------------------------------------------------------


@register(
    "corpus_split_leakage_audit",
    doc="Split-contamination audit: the deterministic hash split "
    "(operators/corpus.py::hash_split, seed split-v1, 80/10/10) "
    "crossed with exact-duplicate fingerprints — a fingerprint whose "
    "copies land in more than one split leaks training text into "
    "eval.  One pass to (fingerprint × split) cells, then a tiny "
    "aggregate counts leaky fingerprints and the train↔test pairs "
    "specifically.  The audit corpus_hash_split itself cannot see "
    "(it is per-row; leakage is a cross-row property of duplicates).",
    tags=("mlops", "corpus", "dedup", "ext"),
    oracle="""
WITH s AS (
  SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
         CASE WHEN (('0x' || substr(md5('split-v1#' ||
                    CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) % 100 < 80
              THEN 'train'
              WHEN (('0x' || substr(md5('split-v1#' ||
                    CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) % 100 < 90
              THEN 'val' ELSE 'test' END AS split
  FROM documents
), cell AS (
  SELECT fp,
         count(DISTINCT split) AS n_splits,
         max(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS in_train,
         max(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS in_test
  FROM s GROUP BY fp
)
SELECT count(*) AS n_fingerprints,
       sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS n_leaky,
       sum(in_train * in_test) AS n_train_test_leaks,
       round(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS leak_rate
FROM cell
""",
)
def corpus_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import textstats as ts
    from ..operators.corpus import hash_split

    docs = hash_split(load_table(spark, sf_dir, "documents"))
    s = docs.select(ts.fingerprint(F.col("text")).alias("fp"), "split")
    cell = s.groupBy("fp").agg(
        F.countDistinct("split").alias("n_splits"),
        F.max(F.when(F.col("split") == "train", 1).otherwise(0)).alias("in_train"),
        F.max(F.when(F.col("split") == "test", 1).otherwise(0)).alias("in_test"),
    )
    leaky = F.when(F.col("n_splits") > 1, 1).otherwise(0)
    return cell.agg(
        F.count(F.lit(1)).alias("n_fingerprints"),
        F.sum(leaky).alias("n_leaky"),
        F.sum(F.col("in_train") * F.col("in_test")).alias("n_train_test_leaks"),
        F.round(F.sum(leaky) / F.count(F.lit(1)), 6).alias("leak_rate"),
    )


# ---------------------------------------------------------------------------
# eval: pinball (quantile) loss of the conformal-style predictions
# ---------------------------------------------------------------------------


@register(
    "mlops_pinball_loss_eval",
    doc="Quantile-forecast evaluation with pinball loss: rank-based P50 "
    "and P90 order-value predictions per priority fitted on 1996 "
    "(the same type-1 quantiles as agg_conformal_interval_coverage), "
    "scored on the 1997 holdout with "
    "L_q = mean(max(q·(y−ŷ), (q−1)·(y−ŷ))) — the proper scoring rule "
    "for quantile predictions.  Two calibration passes + one holdout "
    "pass, all decomposable.",
    tags=("mlops", "eval", "ext"),
    oracle="""
WITH c96 AS (
  SELECT o_orderpriority AS pri, round(o_totalprice, 2) AS val
  FROM orders WHERE year(o_orderdate) = 1996
), r AS (
  SELECT pri, val,
         row_number() OVER (PARTITION BY pri ORDER BY val) AS rn,
         count(*) OVER (PARTITION BY pri) AS cnt
  FROM c96
), pred AS (
  SELECT pri,
         max(CASE WHEN rn = CAST(ceil(0.5 * cnt) AS BIGINT)
                  THEN val END) AS p50,
         max(CASE WHEN rn = CAST(ceil(0.9 * cnt) AS BIGINT)
                  THEN val END) AS p90
  FROM r GROUP BY pri
)
SELECT o.o_orderpriority AS pri,
       count(*) AS n_holdout,
       any_value(p.p50) AS pred_p50,
       any_value(p.p90) AS pred_p90,
       round(avg(greatest(0.5 * (round(o.o_totalprice, 2) - p.p50),
                          -0.5 * (round(o.o_totalprice, 2) - p.p50))), 4)
         AS pinball_50,
       round(avg(greatest(0.9 * (round(o.o_totalprice, 2) - p.p90),
                          -0.1 * (round(o.o_totalprice, 2) - p.p90))), 4)
         AS pinball_90
FROM orders o JOIN pred p ON p.pri = o.o_orderpriority
WHERE year(o.o_orderdate) = 1997
GROUP BY 1 ORDER BY 1
""",
)
def mlops_pinball_loss_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    val = F.round("o_totalprice", 2)
    yr = F.year("o_orderdate")
    c96 = orders.filter(yr == 1996).select(
        F.col("o_orderpriority").alias("pri"), val.alias("val")
    )
    w = Window.partitionBy("pri").orderBy("val")
    wc = Window.partitionBy("pri")
    r = c96.select(
        "pri",
        "val",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("cnt"),
    )
    at = lambda p: F.max(  # noqa: E731
        F.when(
            F.col("rn") == F.ceil(F.lit(p) * F.col("cnt")).cast("bigint"),
            F.col("val"),
        )
    )
    pred = r.groupBy("pri").agg(at(0.5).alias("p50"), at(0.9).alias("p90"))
    hold = orders.filter(yr == 1997)
    e50 = val - F.col("p50")
    e90 = val - F.col("p90")
    return (
        hold.join(F.broadcast(pred), pred.pri == hold.o_orderpriority)
        .groupBy("pri")
        .agg(
            F.count(F.lit(1)).alias("n_holdout"),
            F.any_value("p50").alias("pred_p50"),
            F.any_value("p90").alias("pred_p90"),
            F.round(F.avg(F.greatest(0.5 * e50, -0.5 * e50)), 4).alias(
                "pinball_50"
            ),
            F.round(F.avg(F.greatest(0.9 * e90, -0.1 * e90)), 4).alias(
                "pinball_90"
            ),
        )
        .orderBy("pri")
    )


# ---------------------------------------------------------------------------
# labeling: margin-based uncertainty sampling for the lang-ID gate
# ---------------------------------------------------------------------------


@register(
    "mlops_margin_uncertainty_sample",
    doc="Active-learning batch selection: the ten documents whose "
    "stopword-density sits closest to the lang-ID decision threshold "
    "(0.05) — exactly the rows where the champion heuristic is least "
    "certain and a human label buys the most information.  One "
    "projection + TakeOrdered; margin ties broken by doc_id so the "
    "labeling batch is replay-stable.",
    tags=("mlops", "labeling", "ext"),
    oracle=_MARGIN_SAMPLE_ORACLE,
)
def mlops_margin_uncertainty_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import textstats as ts

    docs = load_table(spark, sf_dir, "documents")
    ratio = ts.stopword_ratio(F.col("text"))
    return (
        docs.select(
            "doc_id",
            "lang",
            F.round(ratio, 6).alias("stopword_ratio"),
            F.round(F.abs(ratio - 0.05), 6).alias("margin"),
        )
        .orderBy("margin", "doc_id")
        .limit(10)
    )
