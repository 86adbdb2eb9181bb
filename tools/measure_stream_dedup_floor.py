"""Point-probe per-trigger FLOOR of the streaming dedup, n sequential
1-doc probes against a 40k-doc sf10 state — the round-7-comparable
protocol (same build and probe shape as measure_stream_dedup_probe_sf10
.py's 40k section; r7 best was 4.2 s, r8 measured min 3.85 s after the
driver-job fold — SCALING.md "Round 8").

Walls come from the checkpoint's own offsets/commits mtimes — zero
instrumentation in measured code.  Probe docs come from never-ingested
slices, so every probe runs the real cross-corpus candidate + verify
path.  Each probe doc joins the state afterward (the r7 drift caveat:
negligible against 40k docs, and identical across tools so the series
stay comparable).

    SPARK_DRIVER_MEMORY=64g python tools/measure_stream_dedup_floor.py [sf_dir] [n_probes]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from mysql_cdc_redis_spark.session import get_spark
    from mysql_cdc_redis_spark.sources import load_table
    from mysql_cdc_redis_spark.streaming.changelog_files import (
        stage_changelog_files,
    )
    from mysql_cdc_redis_spark.streaming.dedup_stream import (
        run_dedup_stream_minhash,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".localdata", "sf10"
    )
    n_probes = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark(app_name="dstream-floor")
    docs = load_table(spark, sf_dir, "documents")
    sliced = docs.withColumn("_sl", F.pmod(F.xxhash64("doc_id"), F.lit(250)))

    base = os.path.join(tempfile.gettempdir(), f"flr_{uuid.uuid4().hex[:8]}")
    src = f"{base}/src"
    os.makedirs(src)
    seq = 0
    t_mt = time.time()

    def ingest(wdf, n_files: int) -> None:
        nonlocal seq
        stage = f"{base}/_stage"
        stage_changelog_files(wdf.drop("_sl"), stage, n_chunks=n_files,
                              key_col="doc_id")
        for f in sorted(os.listdir(stage)):
            dst = os.path.join(src, f"w{seq:04d}-{f}")
            shutil.move(os.path.join(stage, f), dst)
            os.utime(dst, (t_mt + seq, t_mt + seq))
            seq += 1
        shutil.rmtree(stage)
        run_dedup_stream_minhash(
            spark, src, docs.schema,
            checkpoint_dir=f"{base}/ckpt", state_dir=f"{base}/state",
            pairs_dir=f"{base}/pairs", n=3, k=16, bands=4, threshold=0.2,
            max_files_per_trigger=1, auto_compact_runs=None,
        ).count()

    def wall() -> float:
        ck = f"{base}/ckpt"
        b = max(int(x) for x in os.listdir(f"{ck}/commits") if x.isdigit())
        return round(
            os.path.getmtime(f"{ck}/commits/{b}")
            - os.path.getmtime(f"{ck}/offsets/{b}"), 2)

    try:
        ingest(sliced.filter("_sl >= 20 AND _sl < 40"), 2)  # the 40k state
        walls = []
        for i in range(n_probes):
            ingest(sliced.filter(F.col("_sl") == i).limit(1), 1)
            walls.append(wall())
            print(f"# probe {i}: {walls[-1]}s", flush=True)
        print(json.dumps({
            "metric": "stream_dedup_point_probe_floor",
            "walls": walls,
            "min": min(walls),
            "spread": round(max(walls) - min(walls), 2),
        }))
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
