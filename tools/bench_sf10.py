"""One-pass sf10 bench probe: the bench headliners at 100x the driver's
correctness-gate scale (fixture from tools/gen_sf1.py with factor 100).

Not wired into bench.py's per-round JSON (a 1.6 GB fixture regeneration
and multi-minute pass per round would outlast the driver's patience);
run manually per major round and record the numbers in SCALING.md:

    python tools/gen_sf1.py /root/testdata/sf0.1 .localdata/sf10 100
    SPARK_DRIVER_MEMORY=64g python tools/bench_sf10.py

The near-dup pair entries (dedup_minhash_lsh, dedup_ngram_jaccard) run
LAST and each under its own wall budget note: the replicated fixture
puts every document in a 100-copy near-duplicate group, so the TRUE
pair output grows ~C(100,2)/doc-group — an artifact worth measuring
separately, not a reason to hide the number.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysql_cdc_redis_spark.plans import all_queries
from mysql_cdc_redis_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata",
        "sf10",
    )
    spark = get_spark(app_name="bench-sf10")
    catalog = all_queries()
    headline = {n: q for n, q in sorted(catalog.items()) if q.bench}
    # quadratic-OUTPUT entries (fixture artifact at factor-100
    # replication) go last so the linear numbers land first
    tail = [n for n in ("dedup_minhash_lsh", "dedup_ngram_jaccard") if n in headline]
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
                "metric": "sf10_one_pass_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": 10.0,
                "n_runs": 1,
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
