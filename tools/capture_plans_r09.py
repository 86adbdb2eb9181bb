"""Capture .explain('formatted') for the round-9 optimization targets.

    python tools/capture_plans_r09.py before|after [query ...]

Writes plans/r09/<query>_<tag>.txt.  For queries whose fn executes
eagerly (cdc_incremental_merge_4x stages parquet and writes its final
state), the capture reconstructs the LAZY core plan the fn drives —
the merge cascade before the final write — so the artifact shows the
actual compute plan, not the trailing parquet scan of the result.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(REPO, "plans", "r09")

DEFAULT = [
    "cdc_compact_orders",
    "cdc_compact_lineitem",
    "cdc_incremental_merge_4x",
    "cdc_state_diff_feed",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_paragraph_segments",
    "join_asof_event_last_order",
    "join_revenue_by_nation",
    "join_shipping_priority",
    "sim_cosine_topk_bruteforce",
    "text_gopher_filters",
    "text_quality_profile",
    "window_tumbling_events_10min",
    "agg_pricing_summary",
]


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _merge4x_core(spark):
    """The lazy merge cascade of cdc_incremental_merge_4x (the fn itself
    materializes eagerly; this is the same plan up to the final write)."""
    import tempfile

    from pyspark.sql import functions as F

    from mysql_cdc_redis_spark.plans import cdc as _cdc  # noqa: F401 (same builders)
    from mysql_cdc_redis_spark.operators.compaction import compact, merge_state
    from mysql_cdc_redis_spark.sources.changelog import (
        LINEITEM_PAYLOAD,
        LINEITEM_PK,
        lineitem_changelog,
    )

    n_batches = 4
    ch = lineitem_changelog(spark, SF_DIR)
    fracs = F.array(*[F.lit(i / n_batches) for i in range(1, n_batches)])
    try:  # post-r09 form: cuts from the raw scan
        from mysql_cdc_redis_spark.plans.cdc import _merge4x_cuts  # type: ignore

        cuts = _merge4x_cuts(spark, SF_DIR, fracs)
    except ImportError:
        cuts = F.broadcast(
            ch.select(F.percentile_approx("seq", fracs, F.lit(10000)).alias("_cuts"))
        )
    ch2 = ch.crossJoin(cuts).withColumn(
        "_b",
        F.aggregate(
            F.transform(F.col("_cuts"), lambda c: (F.col("seq") > c).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        ),
    )
    staged_dir = tempfile.mkdtemp(prefix="plan_capture_stage_")
    ch2.drop("_cuts").write.mode("overwrite").partitionBy("_b").parquet(staged_dir)
    staged = spark.read.parquet(staged_dir)
    state = compact(
        staged.filter(F.col("_b") == 0).drop("_b"), LINEITEM_PK, LINEITEM_PAYLOAD
    )
    for i in range(1, n_batches):
        state = merge_state(
            state,
            staged.filter(F.col("_b") == i).drop("_b"),
            LINEITEM_PK,
            LINEITEM_PAYLOAD,
        )
    return state, staged_dir


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    os.makedirs(OUT, exist_ok=True)

    from mysql_cdc_redis_spark.plans import all_queries
    from mysql_cdc_redis_spark.session import get_spark

    spark = get_spark(app_name="capture_plans_r09")
    catalog = all_queries()
    cleanup = []
    for name in names:
        if name == "cdc_incremental_merge_4x":
            df, staged = _merge4x_core(spark)
            cleanup.append(staged)
            note = (
                "# NOTE: fn materializes eagerly (stage + final write); this is\n"
                "# the lazy merge-cascade plan up to the final state write.\n"
            )
        else:
            df = catalog[name].fn(spark, SF_DIR)
            note = ""
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(note + _formatted(df))
        print(f"wrote {path}")
    import shutil

    for d in cleanup:
        shutil.rmtree(d, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
