"""Measure the ANN recall-vs-candidate-fraction frontier on BOTH
embedding regimes (round-8 verdict #3): the driver's isotropic sf0.01
fixture (ANN's worst case — no structure to exploit) and the clustered
mixture-of-Gaussians fixture (tools/ann_clustered_fixture.py — the
shape real text/image embeddings have).

Round 8 measured only the isotropic floor and ASSERTED that clustered
data costs less scan at the same recall; this tool measures that claim.
What clustering buys is not a cheaper 16x4/probe-12 (multi-table OR
with few planes is unselective on near-orthogonal pairs regardless),
but the ability to run MORE SELECTIVE configs — more planes per LSH
table, fewer IVF probes — while structure keeps recall high:

* LSH: recall is driven by the small within-cluster angle (per-table
  collision ≈ (1-θ/π)^b stays high even at b=8), while candidate mass
  from cross-cluster pairs collapses like (1/2)^b.
* IVF: a query's true neighbors share its cluster, whose members land
  in the cluster's own seed cells — probing 2 of 16 cells already
  covers them, where isotropic data needed 12.

Output: one markdown table per method with recall@5 + candidate
fraction on both fixtures, ready for COVERAGE.md; the shipped
recall-targeted configs and the cheap clustered-regime configs are
pinned by tests/test_ann_recall_clustered.py.

Usage: python tools/measure_ann_recall_frontier.py [isotropic_sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from ann_clustered_fixture import write_clustered_embeddings  # noqa: E402
from mysql_cdc_redis_spark.operators import similarity as sim  # noqa: E402
from mysql_cdc_redis_spark.session import get_spark  # noqa: E402
from mysql_cdc_redis_spark.sources import load_table  # noqa: E402

LSH_GRID = [(12, 4), (16, 4), (24, 4), (32, 4), (4, 8), (8, 8), (16, 8)]
IVF_PROBES = [1, 2, 4, 6, 8, 10, 12, 16]
K = 5


def _split(emb):
    return emb.filter(F.col("vec_id") < 8), emb.filter(F.col("vec_id") >= 8)


def _pairs(df):
    return {(r["q_id"], r["n_id"]) for r in df.collect()}


def _truth(emb):
    q, c = _split(emb)
    return _pairs(sim.cosine_topk_bruteforce(q, c, k=K))


def lsh_point(emb, truth, n_tables, n_planes):
    q, c = _split(emb)
    got = _pairs(sim.cosine_topk_lsh(q, c, k=K, n_planes=n_planes, n_tables=n_tables))
    qb = sim.lsh_bucket_tables(q, n_tables, n_planes).withColumnRenamed(
        "vec_id", "q_id"
    )
    cb = sim.lsh_bucket_tables(c, n_tables, n_planes).withColumnRenamed(
        "vec_id", "n_id"
    )
    n_cand = qb.join(cb, ["tbl", "bucket"]).select("q_id", "n_id").distinct().count()
    n_q, n_c = q.count(), c.count()
    return len(truth & got) / len(truth), n_cand / (n_q * n_c)


def ivf_point(emb, truth, n_probe):
    q, c = _split(emb)
    cent = emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 24)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    got = _pairs(sim.cosine_topk_ivf(q, c, cent, k=K, n_probe=n_probe))
    qc = sim.ivf_assignments(q, cent, n_probe).select(
        F.col("vec_id").alias("q_id"), "cid"
    )
    cc = sim.ivf_assignments(c, cent, 1).select(F.col("vec_id").alias("n_id"), "cid")
    n_cand = qc.join(cc, "cid").select("q_id", "n_id").distinct().count()
    n_q, n_c = q.count(), c.count()
    return len(truth & got) / len(truth), n_cand / (n_q * n_c)


def main() -> None:
    iso_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    clu_dir = write_clustered_embeddings(
        os.path.join(repo, ".localdata", "ann_clustered")
    )
    spark = get_spark(app_name="ann_frontier")
    fixtures = {
        "isotropic": load_table(spark, iso_dir, "embeddings"),
        "clustered": load_table(spark, clu_dir, "embeddings"),
    }
    truths = {name: _truth(emb) for name, emb in fixtures.items()}

    print("\n## LSH (L tables x b planes) — recall@5 / candidate fraction\n")
    print("| L x b | " + " | ".join(fixtures) + " |")
    print("|---|" + "---|" * len(fixtures))
    for L, b in LSH_GRID:
        cells = []
        for name, emb in fixtures.items():
            r, f = lsh_point(emb, truths[name], L, b)
            cells.append(f"{r:.3f} @ {f:.3f}")
        print(f"| {L}x{b} | " + " | ".join(cells) + " |")

    print("\n## IVF (probes of 16 seed cells) — recall@5 / candidate fraction\n")
    print("| probes | " + " | ".join(fixtures) + " |")
    print("|---|" + "---|" * len(fixtures))
    for p in IVF_PROBES:
        cells = []
        for name, emb in fixtures.items():
            r, f = ivf_point(emb, truths[name], p)
            cells.append(f"{r:.3f} @ {f:.3f}")
        print(f"| {p} | " + " | ".join(cells) + " |")
    spark.stop()


if __name__ == "__main__":
    main()
