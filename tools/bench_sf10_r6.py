"""Round-6 sf10 probes (VERDICT r05 items 2 + 5), run ISOLATED (no
concurrent suite — the r5 containment number was suite-concurrent and
is only an upper bound):

1. ``--containment``: TWO passes of the adaptive containment join at
   sf10 (routes to the directed prefix+sliced path there).  The r5
   completion (2,314 s / 54.62 M pairs) predates the bucketed-staging
   commit (800a584); the Jaccard form dropped 2,183→1,720 s from the
   same change.
2. ``--ngram-conc3``: ONE pass of the sliced Jaccard prefix join with
   slice_concurrency=3 (r5 measured conc=2 only; the per-slice
   exchange is gone since the bucketed staging, so the CPU-saturation
   argument may no longer bind).
3. ``--jvm-stream``: the new pure-JVM streaming compactor over the
   staged sf10 lineitem changelog (116 M events) — the 100× evidence
   for the round-6 headline item.

Default (no flag): all three, sequentially.

    SPARK_DRIVER_MEMORY=64g python tools/bench_sf10_r6.py [--containment] [--ngram-conc3] [--jvm-stream]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF10 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata", "sf10"
)


def _spark(name: str):
    from mysql_cdc_redis_spark.session import get_spark

    s = get_spark(app_name=name)
    s.range(1_000_000).selectExpr("sum(id)").collect()
    return s


def run_containment() -> None:
    from mysql_cdc_redis_spark.plans import all_queries

    spark = _spark("sf10-r6-containment")
    q = all_queries()["dedup_containment_pairs"]
    walls, n_pairs = [], None
    for i in range(2):
        t0 = time.perf_counter()
        n_pairs = q.fn(spark, SF10).count()
        walls.append(round(time.perf_counter() - t0, 1))
        print(f"# containment pass{i + 1}: {walls[-1]}s pairs={n_pairs}", flush=True)
    print(
        json.dumps(
            {
                "metric": "sf10_containment_isolated_r6",
                "value": min(walls),
                "unit": "sec",
                "all_passes": walls,
                "spread": round(max(walls) - min(walls), 1),
                "n_pairs": n_pairs,
                "sf": 10.0,
            }
        ),
        flush=True,
    )
    spark.stop()


def run_ngram_conc3() -> None:
    from mysql_cdc_redis_spark.operators.dedup import ngram_jaccard_pairs_prefix
    from mysql_cdc_redis_spark.sources import load_table

    spark = _spark("sf10-r6-ngram-conc3")
    docs = load_table(spark, SF10, "documents")
    t0 = time.perf_counter()
    n_pairs = ngram_jaccard_pairs_prefix(
        docs, n=3, threshold=0.2, slice_concurrency=3
    ).count()
    wall = round(time.perf_counter() - t0, 1)
    print(
        json.dumps(
            {
                "metric": "sf10_ngram_prefix_conc3_r6",
                "value": wall,
                "unit": "sec",
                "n_pairs": n_pairs,
                "sf": 10.0,
                "slice_concurrency": 3,
            }
        ),
        flush=True,
    )
    spark.stop()


def run_jvm_stream() -> None:
    import shutil
    import tempfile

    from mysql_cdc_redis_spark.sources.changelog import (
        LINEITEM_PAYLOAD,
        LINEITEM_PK,
        lineitem_changelog,
    )
    from mysql_cdc_redis_spark.streaming import (
        drop_state_jvm,
        run_compaction_stream_jvm,
    )

    spark = _spark("sf10-r6-jvm-stream")
    base = tempfile.mkdtemp(prefix="sf10_jvm_stream_")
    staged = os.path.join(base, "changelog")
    lineitem_changelog(spark, SF10).write.mode("overwrite").parquet(staged)
    df = spark.read.parquet(staged)
    n = df.count()
    n_files = len([f for f in os.listdir(staged) if f.endswith(".parquet")])
    mft = max(1, n_files // 5)  # ~5 micro-batches, same shape as bench.py
    state_dir = os.path.join(base, "state")
    t0 = time.perf_counter()
    out = run_compaction_stream_jvm(
        spark,
        staged,
        df.schema,
        LINEITEM_PK,
        LINEITEM_PAYLOAD,
        checkpoint_dir=os.path.join(base, "ckpt"),
        state_dir=state_dir,
        max_files_per_trigger=mft,
    )
    n_state = out.count()
    wall = round(time.perf_counter() - t0, 1)
    print(
        json.dumps(
            {
                "metric": "sf10_stream_compact_jvm_r6",
                "value": wall,
                "unit": "sec",
                "events": n,
                "events_per_sec": round(n / wall),
                "state_rows": n_state,
                "n_batches": -(-n_files // mft),
                "sf": 10.0,
            }
        ),
        flush=True,
    )
    drop_state_jvm(spark, state_dir)
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


def main() -> None:
    args = sys.argv[1:]
    todo = []
    if "--containment" in args:
        todo.append(run_containment)
    if "--ngram-conc3" in args:
        todo.append(run_ngram_conc3)
    if "--jvm-stream" in args:
        todo.append(run_jvm_stream)
    if not todo:
        todo = [run_jvm_stream, run_containment, run_ngram_conc3]
    for fn in todo:
        fn()


if __name__ == "__main__":
    main()
