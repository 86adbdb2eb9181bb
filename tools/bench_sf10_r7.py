"""Round-7 sf10 harness: the variance discipline of round-6 verdict
item 6, written into the tool so every future sf10 exact-join number is
taken the same way.

Round 6 proved (three same-code samples of the sliced n-gram join:
1,720 / 2,412 / 2,739 s, identical 27.31M pairs) that this query class
carries ±25% environmental wall variance on this box, so min-of-2 is a
weak estimator.  Discipline encoded here:

* FIXED shuffle/staging device: ``spark.local.dir`` is pinned to one
  directory (``SPARK_GRAFT_SHUFFLE_DIR``, default /tmp/sf10_shuffle_r7)
  so passes never migrate between devices mid-series.
* Page-cache flush between passes when permitted (``sync`` +
  ``drop_caches`` if writable; silently skipped otherwise and the skip
  is RECORDED in the output so the reader knows the cache state).
* n >= 3 passes; report min + spread ONLY (never mean — the
  distribution is long-tailed right).
* Pair-count cross-check: all passes must agree on the result
  cardinality or the sample is discarded.

    SPARK_DRIVER_MEMORY=64g python tools/bench_sf10_r7.py <query_name> [n_passes]

e.g. ``python tools/bench_sf10_r7.py dedup_ngram_jaccard 3``
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF10 = os.path.join(REPO, ".localdata", "sf10")


def _flush_page_cache() -> bool:
    try:
        subprocess.run(["sync"], check=True, timeout=120)
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
        return True
    except Exception:
        return False


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "dedup_ngram_jaccard"
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    shuffle_dir = os.environ.get("SPARK_GRAFT_SHUFFLE_DIR", "/tmp/sf10_shuffle_r7")
    os.makedirs(shuffle_dir, exist_ok=True)
    os.environ["SPARK_LOCAL_DIRS"] = shuffle_dir

    from mysql_cdc_redis_spark.plans import all_queries
    from mysql_cdc_redis_spark.session import get_spark

    spark = get_spark(app_name=f"sf10-r7-{name}")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    q = all_queries()[name]

    from pyspark.sql import functions as F

    walls, counts, checks, flushed = [], [], [], []
    for i in range(n_passes):
        flushed.append(_flush_page_cache())
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        # count + full-row checksum in ONE action: a bare .count() lets
        # Catalyst prune every computed column (it measured the sf10
        # text profiles at 0.8s where the honest materialized wall is
        # ~10s), while xxhash64(struct(*)) forces all output columns
        # AND upgrades the cross-pass check from cardinality to values.
        row = (
            q.fn(spark, SF10)
            .select(
                F.count(F.lit(1)).alias("n"),
                # decimal sum: 27M 64-bit hashes overflow a long under
                # ANSI mode; decimal(38,0) is exact far past that
                F.sum(F.xxhash64(F.struct("*")).cast("decimal(38,0)")).alias("chk"),
            )
            .first()
        )
        walls.append(round(time.perf_counter() - t0, 1))
        counts.append(row["n"])
        checks.append(row["chk"])
        print(
            f"# pass {i + 1}: {walls[-1]}s rows={row['n']} "
            f"chk={row['chk']} cache_flushed={flushed[-1]}",
            flush=True,
        )
    assert len(set(counts)) == 1, f"passes disagree on cardinality: {counts}"
    assert len(set(checks)) == 1, f"passes disagree on values: {checks}"
    print(json.dumps({
        "metric": f"sf10_{name}_r7",
        "value": min(walls),
        "unit": "sec",
        "n_passes": n_passes,
        "spread": round(max(walls) - min(walls), 1),
        "walls": walls,
        "rows": counts[0],
        "shuffle_dir": shuffle_dir,
        "page_cache_flushed": flushed,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
