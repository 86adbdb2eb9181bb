"""Same-box interleaved A/B for the eight sf1 movers (round-6 verdict
item 4): eight non-document queries rose 20-65% in BENCH_r06 against
BENCH_r05's single-pass sf1 sample, on code paths round 6 never
touched.  Hypothesis: box state, not regression.  Proof protocol:

* two checkouts — A = the round-5 closing commit (git worktree), B =
  current HEAD — run the SAME eight queries at sf1;
* fresh python process per pass (no JVM warmth carry-over between
  versions), passes INTERLEAVED A,B,A,B,... so slow drift in box state
  (page cache, thermal, background jobs) hits both arms equally;
* n passes per arm, report min + spread per query per arm — the same
  estimator discipline as tools/bench_sf10_r5.py.

Verdict rule: a query is attributed to NOISE if the two arms' min-wall
differ by less than the larger of the two within-arm spreads; otherwise
it is a candidate regression to bisect.

    python tools/ab_sf1_r7.py [r5_commit] [n_passes]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MOVERS = [
    "cdc_compact_orders",
    "cdc_state_diff_feed",
    "join_asof_event_last_order",
    "join_shipping_priority",
    "join_revenue_by_nation",
    "sim_cosine_topk_bruteforce",
    "dedup_paragraph_segments",
    "window_tumbling_events_10min",
]

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
from mysql_cdc_redis_spark.plans import all_queries
from mysql_cdc_redis_spark.session import get_spark
from mysql_cdc_redis_spark.sources import load_table

spark = get_spark(app_name="ab-sf1")
sf1 = os.environ["AB_SF1_DIR"]
names = json.loads(os.environ["AB_QUERIES"])
catalog = all_queries()
# same warmup shape as bench.py: executor spin-up + codegen
spark.range(1_000_000).selectExpr("sum(id)").collect()
load_table(spark, sf1, "lineitem").groupBy("l_returnflag").count().write.format(
    "noop"
).mode("overwrite").save()
out = {}
for n in names:
    t0 = time.perf_counter()
    catalog[n].fn(spark, sf1).write.format("noop").mode("overwrite").save()
    out[n] = round(time.perf_counter() - t0, 3)
print("ABRESULT " + json.dumps(out))
spark.stop()
"""


def run_pass(cwd: str, sf1_dir: str) -> dict[str, float]:
    env = dict(
        os.environ, AB_SF1_DIR=sf1_dir, AB_QUERIES=json.dumps(MOVERS)
    )
    p = subprocess.run(
        [sys.executable, "-c", CHILD], cwd=cwd, env=env,
        capture_output=True, text=True, timeout=1800,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"pass in {cwd} produced no result:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main() -> None:
    r5 = sys.argv[1] if len(sys.argv) > 1 else "76d5102"
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf1_dir = os.environ.get(
        "SPARK_GRAFT_SF1_DIR", os.path.join(REPO, ".localdata", "sf1")
    )
    wt = os.path.join("/tmp", f"ab_r5_{r5}")
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, r5], cwd=REPO, check=True
        )

    samples: dict[str, dict[str, list[float]]] = {
        arm: {n: [] for n in MOVERS} for arm in ("r5", "head")
    }
    for i in range(n_passes):
        for arm, cwd in (("r5", wt), ("head", REPO)):
            t = run_pass(cwd, sf1_dir)
            for n, v in t.items():
                samples[arm][n].append(v)
            print(f"# pass {i + 1} {arm}: total {round(sum(t.values()), 2)}s", flush=True)

    table = {}
    for n in MOVERS:
        a, b = samples["r5"][n], samples["head"][n]
        mn_a, mn_b = min(a), min(b)
        sp_a, sp_b = round(max(a) - mn_a, 3), round(max(b) - mn_b, 3)
        noise_bar = max(sp_a, sp_b)
        table[n] = {
            "r5_min": mn_a, "r5_spread": sp_a,
            "head_min": mn_b, "head_spread": sp_b,
            "delta": round(mn_b - mn_a, 3),
            "verdict": "noise" if abs(mn_b - mn_a) <= noise_bar else (
                "regression" if mn_b > mn_a else "improvement"
            ),
        }
    print(json.dumps({"metric": "ab_sf1_movers", "r5_commit": r5,
                      "n_passes": n_passes, "queries": table}, indent=2))


if __name__ == "__main__":
    main()
