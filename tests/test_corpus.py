"""Corpus-management operator tests: the distributed prefix-sum shard
packing must equal the naive global-window spelling exactly, and the
hash split must be stable under subsetting (a row's split never depends
on which other rows are present)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_cdc_redis_spark.operators import corpus as cp
from mysql_cdc_redis_spark.operators import textstats as ts
from mysql_cdc_redis_spark.sources import load_table


def test_pack_token_shards_equals_global_window(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    # Tiny bucket size so the fixture spans many buckets and every
    # bucket-boundary/offset path is exercised.
    got = cp.pack_token_shards(docs, budget_tokens=512, bucket_size=64)

    naive = docs.select(
        F.col("doc_id"), ts.token_count(F.col("text")).alias("n_tokens")
    ).withColumn(
        "shard_id",
        F.floor(
            F.coalesce(
                F.sum("n_tokens").over(
                    Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            / 512
        ),
    )
    left = {(r.doc_id): (r.n_tokens, r.shard_id) for r in got.collect()}
    right = {(r.doc_id): (r.n_tokens, r.shard_id) for r in naive.collect()}
    assert left == right
    assert len(left) == docs.count()


def test_hash_split_stable_under_subsetting(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    full = {r.doc_id: r.split for r in cp.hash_split(docs).select("doc_id", "split").collect()}
    subset = docs.filter(F.col("doc_id") % 3 == 0)
    sub = {r.doc_id: r.split for r in cp.hash_split(subset).select("doc_id", "split").collect()}
    assert sub and all(full[k] == v for k, v in sub.items())
    # 80/10/10 within sane tolerance on the full fixture
    n = len(full)
    train = sum(1 for v in full.values() if v == "train")
    assert 0.7 * n <= train <= 0.9 * n


def test_stratified_sample_quota_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    out = cp.stratified_sample(docs, "lang", fraction_pct=10)
    agg = (
        out.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("sampled").cast("bigint")).alias("kept"),
        )
        .collect()
    )
    assert agg
    for r in agg:
        assert r.kept == (r.n * 10 + 99) // 100
