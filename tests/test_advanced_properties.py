"""Property tests for the advanced-analytics operators: the guarantees
their docstrings claim (one-sided sketch error, non-dominance, exact-sum
allocation, byte-exact reassembly) checked directly, not just via the
oracle hash."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_cdc_redis_spark.plans import all_queries

_QUERIES = all_queries()


def test_countmin_estimate_never_undercounts(spark, sf_dir):
    df = _QUERIES["agg_countmin_sketch"].fn(spark, sf_dir)
    bad = df.filter(F.col("est_cnt") < F.col("exact_cnt")).count()
    assert bad == 0, "CMS guarantee violated: estimate below exact count"


def test_skyline_frontier_members_are_non_dominated(spark, sf_dir):
    from mysql_cdc_redis_spark.sources import load_table

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_size", F.round(F.col("p_retailprice") * 100).cast("bigint").alias("cents")
    )
    # recompute membership exactly as the query does
    from pyspark.sql.window import Window

    w = Window.orderBy("cents").rangeBetween(Window.unboundedPreceding, -1)
    sk = part.withColumn("best", F.max("p_size").over(w))
    frontier = sk.filter(F.col("best").isNull() | (F.col("best") <= F.col("p_size")))
    # naive O(n^2) dominance check on a deterministic sample of frontier rows
    sample = frontier.filter(F.col("p_partkey") % 13 == 0).select(
        F.col("p_partkey").alias("fk"), F.col("cents").alias("fc"), F.col("p_size").alias("fs")
    )
    dominated = sample.join(
        part, (part.cents < sample.fc) & (part.p_size > sample.fs), "left_semi"
    ).count()
    assert dominated == 0, "frontier member dominated by a cheaper+bigger part"


def test_largest_remainder_allocations_sum_to_budget(spark, sf_dir):
    df = _QUERIES["corpus_budget_largest_remainder"].fn(spark, sf_dir)
    total = df.agg(F.sum("alloc_tokens")).collect()[0][0]
    assert total == 1_000_000, f"allocation must sum exactly to budget, got {total}"


def test_blob_reassembly_is_byte_exact(spark, sf_dir):
    row = _QUERIES["mm_blob_chunk_reassembly"].fn(spark, sf_dir).collect()[0]
    assert row["n_roundtrip_ok"] == row["n_docs"], "md5 mismatch after reassembly"


def test_bloom_prefilter_has_no_false_negatives(spark, sf_dir):
    row = _QUERIES["join_bloom_prefilter"].fn(spark, sf_dir).collect()[0]
    # candidates must be a superset of the exact matches
    assert row["candidate_rows"] >= row["exact_rows"]
    assert row["false_positive_rows"] == row["candidate_rows"] - row["exact_rows"]


def test_kaplan_meier_survival_is_monotone_nonincreasing(spark, sf_dir):
    rows = (
        _QUERIES["agg_kaplan_meier"].fn(spark, sf_dir)
        .orderBy("duration_days")
        .collect()
    )
    surv = [r["survival"] for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(surv, surv[1:])), "S(t) must not increase"
    assert all(0.0 <= s <= 1.0 for s in surv)


def test_prefix_filter_equals_naive_jaccard(spark, sf_dir):
    """The SSJoin/PPJoin prefix filter is an exact optimization: the
    prefix-filtered n-gram Jaccard join must return the IDENTICAL pair
    set as the unfiltered inverted-index baseline (false negatives would
    mean the prefix-length bound is wrong).  Includes the degenerate
    cases: tiny docs (prefix = whole set) and a high threshold."""
    from mysql_cdc_redis_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_naive,
        ngram_jaccard_pairs_prefix,
    )
    from mysql_cdc_redis_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    for t in (0.2, 0.7):
        fast = {tuple(r) for r in ngram_jaccard_pairs_prefix(docs, n=3, threshold=t).collect()}
        naive = {
            tuple(r) for r in ngram_jaccard_pairs_naive(docs, n=3, threshold=t).collect()
        }
        assert fast == naive, (
            f"threshold={t}: prefix filter changed the result "
            f"(missing={naive - fast}, extra={fast - naive})"
        )
    # tiny synthetic corpus incl. identical docs and one-shingle docs
    tiny = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c d e f"),
            (3, "a b c x y z"),
            (4, "q w e"),
            (5, "q w e"),
        ],
        "doc_id long, text string",
    )
    fast = {tuple(r) for r in ngram_jaccard_pairs_prefix(tiny, n=3, threshold=0.5).collect()}
    naive = {
        tuple(r) for r in ngram_jaccard_pairs_naive(tiny, n=3, threshold=0.5).collect()
    }
    assert fast == naive
    # the DEFAULT entry point must match both single-route forms
    # (adaptive routing trades only cost, never output)
    routed = {tuple(r) for r in ngram_jaccard_pairs(tiny, n=3, threshold=0.5).collect()}
    assert routed == fast
    # SLICED execution (the sf10 out-of-disk guard) must be a pure
    # partition of the pair space: forced 3-slice output == single-pass
    sliced = {
        tuple(r)
        for r in ngram_jaccard_pairs_prefix(
            docs, n=3, threshold=0.2, n_slices=3
        ).collect()
    }
    single = {
        tuple(r) for r in ngram_jaccard_pairs_prefix(docs, n=3, threshold=0.2).collect()
    }
    assert sliced == single, "pair-space slicing changed the result"
    # auto-slicing statistic: a small max_join_rows must force >1 slice
    # and still produce the identical pair set (5_000 forces ~10-15
    # slices at this fixture's sigma_df_prefix^2 — enough to exercise
    # the auto path without running hundreds of micro-jobs)
    forced_auto = {
        tuple(r)
        for r in ngram_jaccard_pairs_prefix(
            docs, n=3, threshold=0.2, max_join_rows=5_000
        ).collect()
    }
    assert forced_auto == single


def test_sliced_jaccard_string_ids(spark):
    """Pair-space slicing must partition on a TYPE-AGNOSTIC key: the
    round-4 slice key pmod(doc_id, K) is NULL for a string id column,
    silently dropping every such doc's pairs — and only when
    auto-slicing triggers at scale (round-4 advice, medium).  The key is
    now pmod(hash(doc_id), K); this pins the string-id case under forced
    slicing against the naive join."""
    from mysql_cdc_redis_spark.operators.dedup import (
        ngram_jaccard_pairs_naive,
        ngram_jaccard_pairs_prefix,
    )

    docs = spark.createDataFrame(
        [
            ("doc-a", "alpha beta gamma delta epsilon zeta eta theta"),
            ("doc-b", "alpha beta gamma delta epsilon zeta eta iota"),
            ("doc-c", "alpha beta gamma delta epsilon zeta eta theta"),
            ("doc-d", "one two three four five six seven eight nine"),
            ("doc-e", "one two three four five six seven eight ten"),
            ("doc-f", "unrelated words entirely different from others here"),
        ],
        "doc_id string, text string",
    )
    naive = {tuple(r) for r in ngram_jaccard_pairs_naive(docs, n=3, threshold=0.3).collect()}
    assert naive, "fixture must produce at least one pair"
    sliced = {
        tuple(r)
        for r in ngram_jaccard_pairs_prefix(
            docs, n=3, threshold=0.3, n_slices=3
        ).collect()
    }
    assert sliced == naive, (
        f"string-id slicing dropped pairs (missing={naive - sliced}, "
        f"extra={sliced - naive})"
    )


def test_ngram_adaptive_routing(spark, caplog):
    """The DEFAULT n-gram entry must pick the naive join when the exact
    sigma_df^2 candidate volume fits the disk budget, the prefix+sliced
    join when it does not — and both routes must emit the identical pair
    set (round-4 verdict item 1)."""
    import logging

    from mysql_cdc_redis_spark.operators.dedup import (
        _auto_slice_count,
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_naive,
    )

    tiny = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e f g i"),
            (3, "a b c x y z w v"),
            (4, "q w e r t y u o"),
            (5, "q w e r t y u p"),
        ],
        "doc_id long, text string",
    )
    naive = {tuple(r) for r in ngram_jaccard_pairs_naive(tiny, n=3, threshold=0.3).collect()}
    with caplog.at_level(logging.INFO, logger="mysql_cdc_redis_spark.operators.dedup"):
        benign = {tuple(r) for r in ngram_jaccard_pairs(tiny, n=3, threshold=0.3).collect()}
    assert benign == naive
    assert any("route=naive" in r.message for r in caplog.records), (
        "benign corpus must take the naive route"
    )
    caplog.clear()
    # forced-adversarial: a tiny budget pushes the SAME corpus down the
    # prefix+auto-sliced route; output must not change
    with caplog.at_level(logging.INFO, logger="mysql_cdc_redis_spark.operators.dedup"):
        adversarial = {
            tuple(r)
            for r in ngram_jaccard_pairs(
                tiny, n=3, threshold=0.3, max_join_rows=10
            ).collect()
        }
    assert adversarial == naive
    assert any("route=prefix" in r.message for r in caplog.records), (
        "over-budget corpus must take the prefix route"
    )
    # the slice-count decision (pure function): cap binds loudly
    with caplog.at_level(logging.WARNING, logger="mysql_cdc_redis_spark.operators.dedup"):
        caplog.clear()
        assert _auto_slice_count(10, 300_000_000, 2) == 1
        assert _auto_slice_count(900_000_000, 300_000_000, 1) == 3
        # the budget is PER SLICE, independent of concurrency: dividing
        # it by conc doubled the slice count and repaid the prefix-index
        # shuffle per extra slice — measured at sf10 to eat the overlap
        # gain (SCALING.md round 5)
        assert _auto_slice_count(900_000_000, 300_000_000, 2) == 3
        assert not caplog.records
        assert _auto_slice_count(10**15, 300_000_000, 2) == 256
        assert any("slice cap binds" in r.message for r in caplog.records), (
            "binding cap must warn (no-silent-caps)"
        )


def test_containment_prefix_equals_naive(spark, sf_dir):
    """The DIRECTED prefix filter for the containment join is an exact
    optimization: probe = each doc's df-ordered t-prefix, index = full
    shingle relation; with the positional filter applied, the candidate
    set must retain every true (x→y) pair — output identical to the
    naive inverted-index join, under single-pass AND forced slicing
    (including string ids through the hash-based slice key)."""
    from mysql_cdc_redis_spark.operators.dedup import (
        containment_pairs,
        containment_pairs_naive,
        containment_pairs_prefix,
    )
    from mysql_cdc_redis_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    for t in (0.3, 0.5, 0.9):
        naive = {
            tuple(r) for r in containment_pairs_naive(docs, n=3, threshold=t).collect()
        }
        fast = {
            tuple(r) for r in containment_pairs_prefix(docs, n=3, threshold=t).collect()
        }
        assert fast == naive, (
            f"threshold={t}: containment prefix filter changed the result "
            f"(missing={naive - fast}, extra={fast - naive})"
        )
    # embedded-document shape: short doc fully inside a long one (the
    # asymmetric case the operator exists for), plus forced slicing
    tiny = spark.createDataFrame(
        [
            ("s1", "alpha beta gamma delta"),
            ("l1", "alpha beta gamma delta epsilon zeta eta theta iota kappa "
                   "lam mu nu xi omicron pi rho sigma tau upsilon"),
            ("s2", "rho sigma tau upsilon"),
            ("u1", "one two three four five six seven"),
        ],
        "doc_id string, text string",
    )
    naive = {tuple(r) for r in containment_pairs_naive(tiny, n=3, threshold=0.5).collect()}
    assert ("s1", "l1") in {(a, b) for a, b, _ in naive}, "fixture sanity"
    sliced = {
        tuple(r)
        for r in containment_pairs_prefix(tiny, n=3, threshold=0.5, n_slices=3).collect()
    }
    assert sliced == naive
    # adaptive default equals both routes; forced-adversarial budget
    # pushes it down the prefix path with auto slicing
    assert {tuple(r) for r in containment_pairs(tiny, n=3, threshold=0.5).collect()} == naive
    assert {
        tuple(r)
        for r in containment_pairs(tiny, n=3, threshold=0.5, max_join_rows=5).collect()
    } == naive


def test_lsh_dedup_edges_same_clusters(spark, sf_dir):
    """The bounded star-per-bucket LSH edge set must induce the SAME
    connected components as the exhaustive all-pairs LSH output — the
    documented contract of minhash_lsh_dedup_edges: for dedup purposes
    (pairs feed connected_components) the m−1 star edges per bucket
    carry the same cluster structure as the C(m,2) enumeration.  Also
    pins boundedness itself: the star edge count never exceeds the
    all-pairs count, and every star edge is a true ≥-threshold pair."""
    from mysql_cdc_redis_spark.operators.dedup import (
        connected_components,
        minhash_lsh_dedup_edges,
        minhash_lsh_pairs,
    )
    from mysql_cdc_redis_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    # add a pathological 12-copy near-identical group (first char varies,
    # the sf10 replication shape) on top of the natural fixture
    base = "the quick brown fox jumps over the lazy dog again and again today"
    extra = spark.createDataFrame(
        [(10_000_000 + i, chr(ord("a") + i) + base[1:]) for i in range(12)],
        "doc_id long, text string",
    )
    # BORDERLINE-threshold group (round-4 advice): members share a core
    # but diverge by per-doc tails of growing length, so pairwise (and
    # member<->representative) Jaccard spans ~0.25-0.75 — straddling the
    # verify threshold region instead of the near-identical shape above.
    # This exercises the star form's split-risk zone: edges that bucket
    # together but verify near t.  (A deterministic sub-threshold band
    # collision would need P = J^r luck per band — the minhash property —
    # so the pinned contract here is the empirical cluster equality.)
    core = (
        "zebra yak xylophone wombat vulture toucan salamander raccoon "
        "quail porcupine ocelot newt meerkat lemur koala jaguar"
    )
    tails = [
        "",
        "alpha bravo",
        "charlie delta echo foxtrot",
        "golf hotel india juliett kilo lima",
        "mike november oscar papa quebec romeo sierra tango",
        "uniform victor whiskey xray yankee zulu one two three four",
    ]
    borderline = spark.createDataFrame(
        [(20_000_000 + i, (core + " " + t).strip()) for i, t in enumerate(tails)],
        "doc_id long, text string",
    )
    corpus = docs.select("doc_id", "text").unionByName(extra).unionByName(borderline)

    star = minhash_lsh_dedup_edges(corpus, n=3, threshold=0.2)
    full = minhash_lsh_pairs(corpus, n=3, threshold=0.2)
    star_rows = {(r["a"], r["b"]) for r in star.collect()}
    full_rows = {(r["a"], r["b"]) for r in full.collect()}
    assert star_rows <= full_rows, "star edges must be true >=threshold pairs"
    # boundedness on the synthetic group: all-pairs emits C(12,2)=66;
    # the star form emits ≤ (m−1) edges PER BUCKET the group spans —
    # ≤ m·bands = 48 worst case, linear in m, never quadratic
    grp_star = {p for p in star_rows if 10_000_000 <= p[0] < 20_000_000}
    grp_full = {p for p in full_rows if 10_000_000 <= p[0] < 20_000_000}
    assert len(grp_full) == 66
    assert len(grp_star) <= 12 * 4 and len(grp_star) < len(grp_full)

    comp_star = {
        (r["doc_id"], r["component"])
        for r in connected_components(corpus, star).collect()
    }
    comp_full = {
        (r["doc_id"], r["component"])
        for r in connected_components(corpus, full).collect()
    }
    assert comp_star == comp_full, "star edges changed the dedup clusters"
