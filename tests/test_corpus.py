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


def test_chunk_tokens_covers_every_token_with_overlap(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    chunks = cp.chunk_tokens(docs, chunk_size=32, stride=28).collect()
    n_tokens = {
        r.doc_id: r.n
        for r in docs.select("doc_id", F.size(F.split("text", " ")).alias("n")).collect()
    }
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(n_tokens)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        n = n_tokens[doc_id]
        # contiguous chunk indexes, strides cover the whole stream
        assert [r.chunk_idx for r in rows] == list(range(len(rows)))
        assert (len(rows) - 1) * 28 < n <= len(rows) * 28 or (n <= 32 and len(rows) >= 1)
        # each chunk holds exactly the tokens remaining in its window
        assert all(r.n_chunk_tokens == min(32, n - 28 * r.chunk_idx) for r in rows)
        # total coverage: stride-sum + last chunk length reaches exactly n
        assert (len(rows) - 1) * 28 + rows[-1].n_chunk_tokens == n


def test_mix_sources_hits_quota_and_is_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.substring("source", 4, 10).cast("int") < 10, F.lit("web"))
        .when(F.substring("source", 4, 10).cast("int") < 15, F.lit("books"))
        .otherwise(F.lit("code"))
        .alias("domain"),
    )
    weights = {"web": 50, "books": 30, "code": 20}
    mixed = cp.mix_sources(docs, "domain", weights, budget_pct=40)
    rows = mixed.collect()
    total = len(rows)
    budget = (total * 40 + 99) // 100
    per_domain = {d: sum(1 for r in rows if r.domain == d) for d in weights}
    kept = {d: sum(1 for r in rows if r.domain == d and r.kept) for d in weights}
    for d, w in weights.items():
        assert kept[d] == min(per_domain[d], (budget * w + 99) // 100), d
    # deterministic: a rerun keeps exactly the same ids
    again = {r.doc_id for r in cp.mix_sources(docs, "domain", weights, budget_pct=40).collect() if r.kept}
    assert again == {r.doc_id for r in rows if r.kept}


def test_assign_global_ids_matches_naive_row_number(spark, sf_dir):
    """The two-level prefix-sum numbering must equal the naive global
    row_number in (lang, doc_id) order — with a bucket size small enough
    that many buckets exist (the distributed path is actually exercised),
    and ids must be contiguous from 0."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    out = cp.assign_global_ids(docs, ["lang", "doc_id"], "doc_id", bucket_size=16)
    rows = sorted(out.collect(), key=lambda r: (r.lang, r.doc_id))
    assert [r.global_id for r in rows] == list(range(len(rows)))
    # ordering respected: sorting by global_id reproduces (lang, doc_id) order
    by_id = sorted(rows, key=lambda r: r.global_id)
    assert [(r.lang, r.doc_id) for r in by_id] == [(r.lang, r.doc_id) for r in rows]
