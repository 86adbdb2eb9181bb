"""Training-corpus management operators (EXT; SURVEY.md §7 Phase 4 /
north-star "large-scale training-data pipeline" ops): deterministic
train/val/test splitting, token-budget shard packing, and stratified
per-language sampling.

Reference parity note: the reference (dlf412/mysql-cdc-redis) has no
corpus tooling — these rows are EXT, driven by BASELINE.json's
north_star.  The closest reference idiom is the chunked dump cursor
(rcache.py:143-159), whose "≤ max_rows per chunk" policy is the
row-count ancestor of the token-budget sharding here.

Scale design:
* hash_split is stateless per row (a pure column expression) — no
  shuffle at all, safe at any scale, and stable across reruns/backfills
  because membership depends only on (seed, id), never on partitioning.
* pack_token_shards needs a global prefix sum; a naive
  `Window.orderBy(...)` collapses to ONE partition at 100 TB.  We spell
  it as the classic distributed scan: per-bucket partial sums (tiny —
  one row per bucket) are prefix-summed and broadcast back, then each
  bucket computes only its local cumulative window.  The widest shuffle
  is a repartition by bucket, and the per-bucket window sorts ~bucket_size
  rows instead of the corpus.
* stratified_sample orders every stratum by an engine-portable hash so
  "10% of each language" is reproducible property of the data, not of
  the cluster layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import md5long
from . import textstats as ts


def split_bucket(id_col: Column, seed: str, n_buckets: int = 100) -> Column:
    """Engine-portable deterministic bucket in [0, n_buckets): 60-bit md5
    of ``"{seed}#{id}"`` mod n_buckets.  Matches DuckDB
    ``('0x'||substr(md5(seed||'#'||CAST(id AS VARCHAR)),1,15))::BIGINT % n``
    (the hash is < 2^60, so both sides stay non-negative)."""
    return F.pmod(md5long(F.concat(F.lit(seed), F.lit("#"), id_col.cast("string"))), F.lit(n_buckets))


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "split-v1",
    weights: tuple[int, ...] = (80, 10, 10),
    labels: tuple[str, ...] = ("train", "val", "test"),
) -> DataFrame:
    """Assign a stable train/val/test split label per row.

    Membership is a pure function of (seed, id): adding, removing or
    re-partitioning other rows never flips a row's split — the property
    a training pipeline needs for incremental backfills.  Zero shuffles.
    """
    if len(weights) != len(labels) or sum(weights) != 100:
        raise ValueError("weights must align with labels and sum to 100")
    bucket = split_bucket(F.col(id_col), seed)
    edge = 0
    expr = None
    for w, lab in zip(weights, labels):
        edge += w
        expr = F.when(bucket < edge, F.lit(lab)) if expr is None else expr.when(bucket < edge, F.lit(lab))
    return df.withColumn("split", expr)


def pack_token_shards(
    docs: DataFrame,
    budget_tokens: int,
    bucket_size: int = 65536,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document (ordered by id) to a token-budget shard:
    ``shard_id = floor(exclusive_prefix_tokens / budget_tokens)`` — the
    deterministic block-packing a pre-training data loader wants
    (documents stay in id order; every shard holds ~budget tokens).

    Distributed prefix sum, not a global window: documents are grouped
    into ``floor(id / bucket_size)`` buckets; per-bucket token totals
    (one row per bucket) are prefix-summed with a tiny window and
    broadcast-joined back as offsets, so the only per-row sort is within
    a bucket.  Returns (doc_id, n_tokens, shard_id).
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        ts.token_count(F.col(text_col)).alias("n_tokens"),
        (F.floor(F.col(id_col) / bucket_size)).alias("bucket"),
    )
    per_bucket = base.groupBy("bucket").agg(F.sum("n_tokens").alias("bucket_tokens"))
    # One row per bucket: a plain ordered window here is tiny by design.
    bw = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.select(
        "bucket", F.coalesce(F.sum("bucket_tokens").over(bw), F.lit(0)).alias("bucket_offset")
    )
    local = Window.partitionBy("bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        base.join(F.broadcast(offsets), "bucket")
        .withColumn("local_prefix", F.coalesce(F.sum("n_tokens").over(local), F.lit(0)))
        .select(
            "doc_id",
            "n_tokens",
            F.floor((F.col("bucket_offset") + F.col("local_prefix")) / budget_tokens).alias(
                "shard_id"
            ),
        )
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fraction_pct: int = 10,
    id_col: str = "doc_id",
    seed: str = "sample-v1",
) -> DataFrame:
    """Keep a deterministic ``ceil(fraction_pct%)`` of every stratum,
    chosen by portable-hash order (so the sample is stable across runs
    and engines).  Integer math only: a row is kept iff its hash-order
    rank <= (stratum_count + k) div (100/fraction_pct)-style ceiling,
    avoiding float thresholds that flip between engines.

    One shuffle on the stratum key; rank and count share the partition.
    """
    if not (0 < fraction_pct <= 100):
        raise ValueError("fraction_pct in (0, 100]")
    h = split_bucket(F.col(id_col), seed, 1_000_000_007)
    wr = Window.partitionBy(strata_col).orderBy(h, id_col)
    wc = Window.partitionBy(strata_col)
    ranked = df.withColumn("_rn", F.row_number().over(wr)).withColumn(
        "_cnt", F.count(F.lit(1)).over(wc)
    )
    # ceil(cnt * pct / 100) in pure integer arithmetic.
    quota = F.expr(f"(_cnt * {fraction_pct} + 99) div 100")
    return ranked.withColumn("sampled", F.col("_rn") <= quota).drop("_rn")


def chunk_tokens(
    df: DataFrame,
    chunk_size: int = 32,
    stride: int = 28,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Context-window chunking: split each document's token stream into
    fixed-size windows of ``chunk_size`` tokens advancing by ``stride``
    (i.e. ``chunk_size - stride`` tokens of overlap), the shape training
    and RAG pipelines feed to a model.  Returns
    (doc_id, chunk_idx, n_chunk_tokens, chunk_hash).

    Scale design: pure narrow ops — tokenize once (the array is
    materialized as a column BEFORE the per-start expressions so the
    split isn't re-evaluated per element), explode the start offsets,
    slice.  No shuffle at all; output size ∝ input tokens × (1 +
    overlap/stride).
    """
    if not (0 < stride <= chunk_size):
        raise ValueError("need 0 < stride <= chunk_size")
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("t")
    ).withColumn("n", F.size("t"))
    starts = toks.select(
        "doc_id",
        "t",
        F.explode(F.sequence(F.lit(0), F.col("n") - 1, F.lit(stride))).alias("s"),
    )
    chunk = F.slice(F.col("t"), F.col("s") + 1, chunk_size)
    return starts.select(
        "doc_id",
        (F.col("s") / stride).cast("int").alias("chunk_idx"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    )


def mix_sources(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, int],
    budget_pct: int = 40,
    id_col: str = "doc_id",
    seed: str = "mix-v1",
) -> DataFrame:
    """Domain-mixture resampling: draw a corpus of ``budget_pct`` % of the
    input whose composition follows integer ``weights`` (pct per domain,
    summing to 100) — the "data mixing" step of a training pipeline.
    Each domain keeps its hash-order-first ``min(domain_count,
    ceil(budget * w / 100))`` rows, so the draw is reproducible across
    engines and cluster layouts and all arithmetic stays integral.

    Adds boolean ``kept``.  One shuffle on the domain key; the global
    budget is a one-row aggregate broadcast back (never a single-
    partition global window).
    """
    if sum(weights.values()) != 100:
        raise ValueError("weights must sum to 100")
    h = split_bucket(F.col(id_col), seed, 1_000_000_007)
    wr = Window.partitionBy(domain_col).orderBy(h, F.col(id_col))
    wc = Window.partitionBy(domain_col)
    total = df.agg(F.count(F.lit(1)).alias("_tot"))
    wmap = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    ranked = (
        df.crossJoin(F.broadcast(total))
        .withColumn("_rn", F.row_number().over(wr))
        .withColumn("_cnt", F.count(F.lit(1)).over(wc))
        .withColumn("_w", F.coalesce(wmap[F.col(domain_col)], F.lit(0)))
        .withColumn("_budget", F.expr(f"(_tot * {budget_pct} + 99) div 100"))
    )
    quota = F.least(F.col("_cnt"), F.expr("(_budget * _w + 99) div 100"))
    return ranked.withColumn("kept", F.col("_rn") <= quota).drop(
        "_rn", "_cnt", "_w", "_budget", "_tot"
    )


def assign_global_ids(
    df: DataFrame,
    order_cols: list[str],
    bucket_col: str,
    bucket_size: int = 65536,
) -> DataFrame:
    """Contiguous 0-based global row ids in ``order_cols`` order WITHOUT a
    single-partition global window — the scalable spelling of
    ``row_number() OVER (ORDER BY ...)`` for assigning stable sample ids
    to a training corpus.

    Two-level distributed prefix sum (same shape as pack_token_shards):
    rows land in ``(first order col, floor(bucket_col / bucket_size))``
    buckets; one tiny ordered window prefix-sums the per-bucket counts
    (row count == #buckets, thousands at 100 TB); offsets broadcast back
    and each bucket numbers only its own rows.  Requires ``bucket_col``
    to be numeric and monotone within the trailing order columns —
    bucket boundaries then respect the total order.

    Returns the input columns plus ``global_id: bigint``.
    """
    lead = order_cols[:-1]
    b = F.struct(*[F.col(c) for c in lead], F.floor(F.col(bucket_col) / bucket_size).alias("_b"))
    base = df.withColumn("_bucket", b)
    per_bucket = base.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_n"))
    bw = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.select(
        "_bucket", F.coalesce(F.sum("_n").over(bw), F.lit(0)).alias("_offset")
    )
    local = Window.partitionBy("_bucket").orderBy(*order_cols)
    return (
        base.join(F.broadcast(offsets), "_bucket")
        .withColumn(
            "global_id", (F.col("_offset") + F.row_number().over(local) - 1).cast("bigint")
        )
        .drop("_bucket", "_offset")
    )
