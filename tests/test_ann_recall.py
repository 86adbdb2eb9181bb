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


def test_ann_recall_targeted_configs_hit_documented_recall(spark, sf_dir):
    """Round-7 verdict #5: the recall-targeted catalog entries must
    deliver the recall their docs claim (≥0.8 on the isotropic fixture
    embeddings — IVF's and LSH's hardest case).  Measured on sf0.01:
    LSH 16x4 → 0.875, IVF probe-12/16 → 0.925; the full frontier is in
    COVERAGE.md.  Anything below 0.8 here means the documented contract
    broke — fail, don't re-tune silently."""
    brute = _pairs(spark, sf_dir, "sim_cosine_topk_bruteforce")
    for name in ("sim_cosine_topk_lsh_recall", "sim_cosine_topk_ivf_recall"):
        got = _pairs(spark, sf_dir, name)
        recall = len(brute & got) / len(brute)
        assert recall >= 0.8, f"{name} below its documented recall: {recall}"


def test_pq_seed_vectors_self_encode(spark, sf_dir):
    # the codebook is built from the 16 lowest-id vectors' subvectors —
    # those vectors must therefore encode to their own centroid id in
    # EVERY subspace with exactly zero reconstruction error (argmin
    # correctness), and code values must stay within [0, k)
    from mysql_cdc_redis_spark.operators.similarity import pq_quantize
    from mysql_cdc_redis_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    seed_ids = [
        r["vec_id"] for r in emb.select("vec_id").orderBy("vec_id").limit(16).collect()
    ]
    codes = pq_quantize(emb, m=4, k=16).collect()
    by_id = {r["vec_id"]: r for r in codes}
    for cid, vid in enumerate(seed_ids):
        r = by_id[vid]
        assert (r["c0"], r["c1"], r["c2"], r["c3"]) == (cid,) * 4, (vid, dict(r.asDict()))
        assert r["recon_err"] == 0.0
    for r in codes:
        assert all(0 <= r[f"c{m}"] < 16 for m in range(4))


def test_knn_eval_ivf_accuracy_close_to_bruteforce(spark, sf_dir):
    """The IVF-candidate k-NN eval must track the brute-force eval: same
    probe set (so n_eval equal), and aggregate accuracy within 0.1 —
    generous for isotropic-random fixture embeddings (IVF recall ~0.33
    is the hardest case; on clustered real embeddings the neighbor sets
    agree far more), tight enough to catch a broken candidate join
    (empty cells / wrong labels push accuracy to 0 or chance**2).
    Measured deltas: 0.02 at sf0.01, 0.00 at sf0.1."""
    qs = all_queries()
    accs = {}
    for name in ("sim_knn_label_eval", "sim_knn_label_eval_ivf"):
        rows = qs[name].fn(spark, sf_dir).collect()
        n_eval = sum(r["n_eval"] for r in rows)
        n_correct = sum(r["n_correct"] for r in rows)
        accs[name] = (n_eval, n_correct / n_eval)
    assert accs["sim_knn_label_eval"][0] == accs["sim_knn_label_eval_ivf"][0], (
        "probe sets diverged"
    )
    delta = abs(accs["sim_knn_label_eval"][1] - accs["sim_knn_label_eval_ivf"][1])
    assert delta <= 0.1, f"IVF eval accuracy drifted {delta} from brute force"
