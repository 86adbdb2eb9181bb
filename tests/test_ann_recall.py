"""ANN retrieval quality: the bucketed variants must actually retrieve
a useful fraction of the true top-k.  The fixture embeddings are
isotropic random — the hardest case for ANN — so the thresholds encode
the measured theory tradeoff, not a vendor benchmark: multi-table LSH
(12x4) ≈ 0.75 recall at ~half the scan, IVF (probe 4 of 16 cells)
≈ 0.33 recall at ~quarter of the scan."""

from __future__ import annotations

from mysql_cdc_redis_spark.plans import all_queries


def _pairs(spark, sf_dir, name):
    return {
        (r["q_id"], r["n_id"])
        for r in all_queries()[name].fn(spark, sf_dir).collect()
    }


def test_ann_recall_vs_bruteforce(spark, sf_dir):
    brute = _pairs(spark, sf_dir, "sim_cosine_topk_bruteforce")
    assert len(brute) == 40  # 8 queries x top-5
    lsh = _pairs(spark, sf_dir, "sim_cosine_topk_lsh")
    ivf = _pairs(spark, sf_dir, "sim_cosine_topk_ivf")
    lsh_recall = len(brute & lsh) / len(brute)
    ivf_recall = len(brute & ivf) / len(brute)
    assert lsh_recall >= 0.6, f"multi-table LSH recall degraded: {lsh_recall}"
    assert ivf_recall >= 0.25, f"IVF recall degraded: {ivf_recall}"
