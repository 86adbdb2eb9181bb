"""Round-8 sf10 harness — bench_sf10_r7.py's variance discipline with
the round-7 ADVICE fixes folded in:

* The checksum action goes through ``benchutil.checksum_row`` (maps
  stringified, float/double rounded through exact decimal before
  hashing) so MapType outputs can't crash the harness and last-ulp
  reduction-order jitter can't spuriously discard a valid sample
  (ADVICE r07 #1).
* Checksum agreement across passes is RECORDED, not asserted —
  cardinality disagreement still discards the sample (that's a real
  bug), value-checksum disagreement is reported for the reader to
  judge (for integer-typed outputs it should always agree).
* The value checksum is PERSISTED in the emitted JSON (ADVICE r07 #3)
  so future rounds can compare result values, not just row counts.

Discipline unchanged from r7: pinned shuffle device, page-cache flush
attempted + recorded per pass, n >= 3 passes, min + spread only.

    SPARK_DRIVER_MEMORY=64g python tools/bench_sf10_r8.py <query_name> [n_passes]
    SPARK_GRAFT_SF10_DIR overrides the data dir (smoke-testing at sf1).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF10 = os.environ.get(
    "SPARK_GRAFT_SF10_DIR", os.path.join(REPO, ".localdata", "sf10")
)


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
    shuffle_dir = os.environ.get("SPARK_GRAFT_SHUFFLE_DIR", "/tmp/sf10_shuffle_r8")
    os.makedirs(shuffle_dir, exist_ok=True)
    os.environ["SPARK_LOCAL_DIRS"] = shuffle_dir

    from mysql_cdc_redis_spark.benchutil import checksum_row
    from mysql_cdc_redis_spark.plans import all_queries
    from mysql_cdc_redis_spark.session import get_spark

    spark = get_spark(app_name=f"sf10-r8-{name}")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    q = all_queries()[name]

    walls, counts, checks, flushed = [], [], [], []
    for i in range(n_passes):
        flushed.append(_flush_page_cache())
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        row = checksum_row(q.fn(spark, SF10))
        walls.append(round(time.perf_counter() - t0, 1))
        counts.append(row["n"])
        checks.append(str(row["chk"]))
        print(
            f"# pass {i + 1}: {walls[-1]}s rows={row['n']} "
            f"chk={row['chk']} cache_flushed={flushed[-1]}",
            flush=True,
        )
    assert len(set(counts)) == 1, f"passes disagree on cardinality: {counts}"
    print(json.dumps({
        "metric": f"sf10_{name}_r8",
        "value": min(walls),
        "unit": "sec",
        "n_passes": n_passes,
        "spread": round(max(walls) - min(walls), 1),
        "walls": walls,
        "rows": counts[0],
        "chk": checks[0],
        "chk_stable_across_passes": len(set(checks)) == 1,
        "sf_dir": SF10,
        "shuffle_dir": shuffle_dir,
        "page_cache_flushed": flushed,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
