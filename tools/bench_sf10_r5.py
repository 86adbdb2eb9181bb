"""Round-5 sf10 probe: TWO cold-ish passes per bench headliner so the
spread is recorded (VERDICT r04 item 3 — the r3→r4 cdc_compact_lineitem
70.8→110.0s swing was attributed to page-cache state on a single-pass
probe; n>=2 separates measurement noise from regression).

`dedup_ngram_jaccard` is excluded here as in the r4 probe: at this
fixture's tiny shingle vocabulary the adaptive router (correctly) picks
the prefix+sliced exact path, whose ~30-40-min wall is the fundamental
cost of exact t=0.2 enumeration over 4.7B candidates — measured
standalone, once, by passing --ngram (see SCALING.md round-5).

    SPARK_DRIVER_MEMORY=64g python tools/bench_sf10_r5.py [sf_dir]
    SPARK_DRIVER_MEMORY=64g python tools/bench_sf10_r5.py --ngram  # standalone
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
N_PASSES = 2


def _default_sf_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata",
        "sf10",
    )


def _run_ngram_standalone(sf_dir: str) -> None:
    """One pass of the adaptive n-gram default at sf10 (routes to the
    prefix+sliced exact join there; round-5 overlapped slice execution)."""
    spark = get_spark(app_name="bench-sf10-r5-ngram")
    catalog = all_queries()
    q = catalog["dedup_ngram_jaccard"]
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    t0 = time.perf_counter()
    n_pairs = q.fn(spark, sf_dir).count()
    wall = round(time.perf_counter() - t0, 3)
    print(
        json.dumps(
            {
                "metric": "sf10_ngram_standalone_r5",
                "value": wall,
                "unit": "sec",
                "queries": {"dedup_ngram_jaccard": wall},
                "sf": 10.0,
                "n_pairs": n_pairs,
            }
        )
    )
    spark.stop()


def main() -> None:
    args = [a for a in sys.argv[1:]]
    if "--ngram" in args:
        args.remove("--ngram")
        _run_ngram_standalone(args[0] if args else _default_sf_dir())
        return

    sf_dir = args[0] if args else _default_sf_dir()
    spark = get_spark(app_name="bench-sf10-r5")
    catalog = all_queries()
    headline = {
        n: q for n, q in sorted(catalog.items()) if q.bench and n not in SKIP
    }
    tail = [n for n in ("dedup_minhash_lsh",) if n in headline]
    order = [n for n in headline if n not in tail] + tail

    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JIT warm
    passes: dict[str, list[float]] = {n: [] for n in order}
    for i in range(N_PASSES):
        for name in order:
            t0 = time.perf_counter()
            headline[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.perf_counter() - t0, 3)
            passes[name].append(dt)
            print(f"# pass{i + 1} {name}: {dt}s", flush=True)

    timings = {n: min(v) for n, v in passes.items()}
    spread = {n: round(max(v) - min(v), 3) for n, v in passes.items()}

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
                "metric": "sf10_min_of_2_total_wall_r5",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "all_passes": passes,
                "sf": 10.0,
                "n_runs": N_PASSES,
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
