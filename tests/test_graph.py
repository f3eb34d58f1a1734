"""connected_components on crafted graphs: chains, cycles, and
isolated pairs resolve to min-vertex labels."""

from __future__ import annotations

from flink_ecommerce_spark.operators.graph import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {
        r["doc_id"]: r["cluster_id"] for r in connected_components(df).collect()
    }


def test_chain_cycle_and_pair(spark):
    # chain 1-2-3-4, cycle 10-11-12-10, pair 20-21
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (20, 21)]
    got = _cc(spark, edges)
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_direction_invariance(spark):
    fwd = _cc(spark, [(5, 9), (9, 7)])
    rev = _cc(spark, [(9, 5), (7, 9)])
    assert fwd == rev == {5: 5, 7: 5, 9: 5}


def test_long_chain_within_round_budget(spark):
    # a 12-vertex chain: diameter 11 — min-label propagation halves
    # the frontier each round via transitive adoption, well inside
    # the default budget
    edges = [(i, i + 1) for i in range(12)]
    got = _cc(spark, edges)
    assert set(got.values()) == {0}


def test_budget_overrun_raises_not_truncates(spark):
    """A diameter that exceeds max_rounds must RAISE — silently
    returning the intermediate labels would hand callers wrong
    communities (min-label propagation is only exact at
    convergence)."""
    import pytest

    from flink_ecommerce_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="max_rounds"):
        connected_components(edges, max_rounds=1)
    # the same chain converges with an adequate budget
    ok = connected_components(edges, max_rounds=20)
    assert set(r["cluster_id"] for r in ok.collect()) == {0}


def test_entity_merge_groups_transitive(spark):
    """A~B and B~C merge all three even when A and C themselves are
    over the distance cutoff; unrelated names stay singletons."""
    from flink_ecommerce_spark.operators.entity import entity_merge_groups

    # identical 16-char blocking prefix ("customer aligned"), edits
    # after it: smith~smyth = 1, smyth~smythe = 1, smith~smythe = 2
    # (over MAX_DIST) — the transitive case
    rows = [
        (1, "customer aligned smith"),
        (2, "customer aligned smyth"),
        (3, "customer aligned smythe"),
        (9, "totally different"),
    ]
    df = spark.createDataFrame(rows, "c_custkey long, c_name string")
    got = {
        r["c_custkey"]: (r["canonical_custkey"], r["is_canonical"])
        for r in entity_merge_groups(df).collect()
    }
    assert got[1] == (1, True)
    assert got[2] == (1, False)
    assert got[3] == (1, False)
    assert got[9] == (9, True)


# ------------------------------------------------------------------ pagerank


def _sym(spark, pairs):
    from pyspark.sql import functions as F

    e = spark.createDataFrame(pairs, "src long, dst long")
    return e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_pagerank_matches_numpy_power_method(spark):
    """Exact (to rounding) agreement with a dense NumPy power-method
    reference on an undirected graph, fixed 5 iterations."""
    import numpy as np

    from flink_ecommerce_spark.operators.graph import pagerank

    pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (5, 1)]
    got = {
        r["node"]: r["pagerank_micro"] / 1e6
        for r in pagerank(_sym(spark, pairs), iterations=5).collect()
    }

    nodes = sorted({n for p in pairs for n in p})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for a, b in pairs:
        A[idx[b], idx[a]] = 1.0
        A[idx[a], idx[b]] = 1.0
    M = A / A.sum(axis=0, keepdims=True)
    r = np.full(n, 1.0 / n)
    for _ in range(5):
        r = 0.15 / n + 0.85 * (M @ r)
    for node in nodes:
        assert abs(got[node] - r[idx[node]]) < 2e-6


def test_pagerank_mass_and_symmetry(spark):
    """Rank mass sums to ~1; a vertex-transitive graph (cycle) gets
    uniform ranks; the star center outranks its leaves."""
    from flink_ecommerce_spark.operators.graph import pagerank

    cycle = [(i, (i + 1) % 6) for i in range(6)]
    ranks = {
        r["node"]: r["pagerank_micro"] / 1e6
        for r in pagerank(_sym(spark, cycle)).collect()
    }
    assert abs(sum(ranks.values()) - 1.0) < 1e-4
    assert len(set(ranks.values())) == 1  # uniform on the cycle

    star = [(0, i) for i in range(1, 7)]
    sr = {r["node"]: r["pagerank_micro"] for r in pagerank(_sym(spark, star)).collect()}
    assert all(sr[0] > sr[i] for i in range(1, 7))
    assert len({sr[i] for i in range(1, 7)}) == 1  # leaves interchangeable


def test_copurchase_components_chain_and_singletons(spark):
    """Two pairs sharing a part chain into ONE community; a part
    co-bought only once (below min_support) stays a singleton."""
    from flink_ecommerce_spark.plans.tpch import copurchase_components

    rows = []
    # parts 1-2 co-occur in orders 10, 11; parts 2-3 in orders 12, 13
    # -> {1,2,3} is one community labeled 1
    for ok, pair in [(10, (1, 2)), (11, (1, 2)), (12, (2, 3)), (13, (2, 3))]:
        for pk in pair:
            rows.append((ok, pk))
    # parts 4-5 co-occur only ONCE -> below min_support, both singleton
    rows += [(14, 4), (14, 5)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = {
        r["part_id"]: r["community_id"]
        for r in copurchase_components(li).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5}
