"""Scaling evidence for the round-7 streaming-dedup fix: per-batch wall
must stay FLAT as the accumulated LSH state grows (round-6 verdict
item 1's done-criterion).

Protocol: split the sf1 documents table into K equal chunks, ingest
them as K sequential micro-batches (maxFilesPerTrigger=1, availableNow)
— so batch i probes a state i chunks deep with a constant-size batch —
and read per-batch wall from the checkpoint's own commit protocol
(mtime(commits/i) - mtime(offsets/i): batch start and end stamps Spark
writes anyway; zero instrumentation in the measured code).  Run the
IDENTICAL protocol in a worktree at the round-6 closing commit (whose
probe re-read the ENTIRE state every batch) and at HEAD (bucket-dir +
pushed-IN pruned probes).

Expected shape: the r6 arm's per-batch wall grows with batch index
(state scan is O(corpus)); the HEAD arm's stays flat (probe I/O is
O(batch footprint)).  Report both series + a linear-trend slope
(seconds per additional state chunk, least squares).

    python tools/measure_stream_dedup_r7.py [r6_commit] [n_chunks]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, shutil, sys, tempfile, uuid
sys.path.insert(0, os.getcwd())
from mysql_cdc_redis_spark.session import get_spark
from mysql_cdc_redis_spark.sources import load_table
from mysql_cdc_redis_spark.streaming import run_dedup_stream_minhash
from mysql_cdc_redis_spark.streaming.changelog_files import stage_changelog_files

spark = get_spark(app_name="dstream-scaling")
sf_dir = os.environ["MS_SF_DIR"]
n_chunks = int(os.environ["MS_CHUNKS"])
docs = load_table(spark, sf_dir, "documents")

base = os.path.join(tempfile.gettempdir(), f"ms_dstream_{uuid.uuid4().hex[:8]}")
src, ckpt = f"{base}/src", f"{base}/ckpt"
state, pairs = f"{base}/state", f"{base}/pairs"
stage_changelog_files(docs, src, n_chunks=n_chunks, key_col="doc_id")

kw = {}
try:  # HEAD has auto-compaction; keep it OFF so state depth grows monotonically
    import inspect
    if "auto_compact_runs" in inspect.signature(run_dedup_stream_minhash).parameters:
        kw["auto_compact_runs"] = None
except Exception:
    pass
out = run_dedup_stream_minhash(
    spark, src, docs.schema, checkpoint_dir=ckpt, state_dir=state,
    pairs_dir=pairs, n=3, k=16, bands=4, threshold=0.2,
    max_files_per_trigger=1, **kw,
)
n_pairs = out.count()

walls = []
commits, offsets = f"{ckpt}/commits", f"{ckpt}/offsets"
for b in sorted((f for f in os.listdir(commits) if f.isdigit()), key=int):
    walls.append(round(
        os.path.getmtime(f"{commits}/{b}") - os.path.getmtime(f"{offsets}/{b}"), 3
    ))
print("MSRESULT " + json.dumps({"walls": walls, "n_pairs": n_pairs}))
shutil.rmtree(base, ignore_errors=True)
spark.stop()
"""


def run_arm(cwd: str, sf_dir: str, n_chunks: int) -> dict:
    env = dict(os.environ, MS_SF_DIR=sf_dir, MS_CHUNKS=str(n_chunks))
    p = subprocess.run(
        [sys.executable, "-c", CHILD], cwd=cwd, env=env,
        capture_output=True, text=True, timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("MSRESULT "):
            return json.loads(line[len("MSRESULT "):])
    raise RuntimeError(f"arm in {cwd} failed:\n{p.stdout[-2000:]}\n{p.stderr[-3000:]}")


def slope(ys: list[float]) -> float:
    """Least-squares slope of wall vs batch index, skipping batch 0
    (first-batch JIT/codegen noise)."""
    ys = ys[1:]
    n = len(ys)
    xs = list(range(n))
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    den = sum((x - mx) ** 2 for x in xs)
    return round(num / den, 4) if den else 0.0


def main() -> None:
    r6 = sys.argv[1] if len(sys.argv) > 1 else "6423ae3"
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    sf_dir = os.environ.get(
        "MS_SF_DIR", os.path.join(REPO, ".localdata", "sf1")
    )
    wt = os.path.join("/tmp", f"ms_r6_{r6}")
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, r6], cwd=REPO, check=True
        )

    arms = {}
    for arm, cwd in (("r6_unpruned", wt), ("head_pruned", REPO)):
        res = run_arm(cwd, sf_dir, n_chunks)
        arms[arm] = {
            "walls": res["walls"],
            "n_pairs": res["n_pairs"],
            "slope_sec_per_chunk": slope(res["walls"]),
            "last_over_second": round(res["walls"][-1] / res["walls"][1], 3)
            if len(res["walls"]) > 2 and res["walls"][1]
            else None,
        }
        print(f"# {arm}: slope {arms[arm]['slope_sec_per_chunk']}s/chunk, "
              f"walls {res['walls']}", flush=True)
    assert arms["r6_unpruned"]["n_pairs"] == arms["head_pruned"]["n_pairs"], (
        "arms disagree on pair count — not comparable"
    )
    print(json.dumps({"metric": "stream_dedup_state_scaling",
                      "n_chunks": n_chunks, "sf_dir": sf_dir, **arms}))


if __name__ == "__main__":
    main()
