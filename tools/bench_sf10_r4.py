"""Round-4 sf10 probe: the bench headliners EXCEPT dedup_ngram_jaccard,
whose ~45-min exact sliced run is measured standalone (see SCALING.md
round-4 — its wall is the fundamental 4.7B-candidate verification cost
of exact t=0.2 Jaccard on the tiny-vocabulary replicated fixture, not a
number to re-pay on every probe).

    SPARK_DRIVER_MEMORY=64g python tools/bench_sf10_r4.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysql_cdc_redis_spark.plans import all_queries
from mysql_cdc_redis_spark.session import get_spark

SKIP = {"dedup_ngram_jaccard"}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata",
        "sf10",
    )
    spark = get_spark(app_name="bench-sf10-r4")
    catalog = all_queries()
    headline = {
        n: q for n, q in sorted(catalog.items()) if q.bench and n not in SKIP
    }
    tail = [n for n in ("dedup_minhash_lsh",) if n in headline]
    order = [n for n in headline if n not in tail] + tail

    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JIT warm
    timings: dict[str, float] = {}
    for name in order:
        t0 = time.perf_counter()
        headline[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s", flush=True)

    from mysql_cdc_redis_spark.sources.changelog import (
        lineitem_changelog,
        orders_changelog,
    )

    n_events = orders_changelog(spark, sf_dir).count() + lineitem_changelog(
        spark, sf_dir
    ).count()
    compact_wall = timings.get("cdc_compact_orders", 0) + timings.get(
        "cdc_compact_lineitem", 0
    )
    print(
        json.dumps(
            {
                "metric": "sf10_one_pass_total_wall_r4",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": 10.0,
                "n_runs": 1,
                "skipped": sorted(SKIP),
                "compaction_events": n_events,
                "compaction_events_per_sec": (
                    round(n_events / compact_wall) if compact_wall else None
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
