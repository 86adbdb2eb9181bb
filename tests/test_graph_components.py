"""Unit semantics for connected_components (dedup-cluster assignment):
min-label propagation must reach the component minimum across chains
(diameter > 1), keep disjoint components separate, and leave isolated
nodes as their own component."""

from __future__ import annotations

from mysql_cdc_redis_spark.operators.dedup import connected_components


def _run(spark, node_ids, edge_pairs):
    nodes = spark.createDataFrame([(int(n),) for n in node_ids], "doc_id long")
    pairs = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edge_pairs] or None,
        "a long, b long",
    )
    out = connected_components(nodes, pairs)
    return {r["doc_id"]: r["component"] for r in out.collect()}

def test_chain_propagates_to_minimum(spark):
    # 10-20-30-40-50 chain: diameter 4, everything labels to 10
    got = _run(spark, [10, 20, 30, 40, 50], [(20, 10), (20, 30), (40, 30), (50, 40)])
    assert got == {n: 10 for n in [10, 20, 30, 40, 50]}

def test_disjoint_components_and_isolated(spark):
    got = _run(
        spark,
        [1, 2, 3, 7, 8, 99],
        [(1, 2), (2, 3), (7, 8)],
    )
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 99: 99}

def test_cycle_and_duplicate_edges(spark):
    got = _run(spark, [4, 5, 6], [(4, 5), (5, 6), (6, 4), (5, 4)])
    assert got == {4: 4, 5: 4, 6: 4}

def _union_find_components(node_ids, edge_pairs):
    parent = {n: n for n in node_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id per component
    roots = {}
    for n in node_ids:
        roots.setdefault(find(n), []).append(n)
    return {n: min(members) for members in roots.values() for n in members}

def test_random_graphs_match_union_find(spark):
    import random

    for seed in (7, 19, 101):
        rng = random.Random(seed)
        nodes = list(range(1, 41))
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(45)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        assert _run(spark, nodes, edges) == _union_find_components(nodes, edges)
