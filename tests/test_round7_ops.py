"""Round-6-session operator tests: mass-conserving PageRank."""

from __future__ import annotations


def _pr_bruteforce_conserving(edges, iterations, scale=10**12, num=85, den=100):
    """Pure-Python twin of the conserving integer power iteration."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    n = len(nodes)
    base = (den - num) * scale // (den * n)
    rank = {v: scale // n for v in nodes}
    for _ in range(iterations):
        dangling = sum(rank[v] for v in nodes if v not in outdeg)
        share = (dangling * num) // (den * n)
        incoming = {v: 0 for v in nodes}
        for u, v in edges:
            incoming[v] += (rank[u] * num) // (den * outdeg[u])
        rank = {v: base + incoming[v] + share for v in nodes}
    return rank


def test_pagerank_conserving_matches_integer_bruteforce(spark):
    from aws_datalake_spark.operators.graph import pagerank_fixed_point

    # 'd' and 'e' are dangling sinks — their mass must flow back
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d"),
        ("a", "e"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r.node: r.rank_scaled
        for r in pagerank_fixed_point(
            df, iterations=4, redistribute_dangling=True
        ).collect()
    }
    assert got == _pr_bruteforce_conserving(edges, 4)


def test_pagerank_conserving_preserves_mass(spark):
    """Σ rank_scaled ≈ scale: only integral-truncation dust is lost
    (< E + 3N units per iteration), unlike the leaking variant which
    loses the entire dangling share each step (VERDICT r05 item 6)."""
    from aws_datalake_spark.operators.graph import pagerank_fixed_point

    # star into a sink: ALL mass funnels into a dangling node, the
    # worst case for the leaking variant
    edges = [(f"u{i}", "sink") for i in range(10)]
    df = spark.createDataFrame(edges, "src string, dst string")
    scale, iters = 10**12, 3
    n_nodes, n_edges = 11, 10

    conserving = pagerank_fixed_point(
        df, iterations=iters, scale=scale, redistribute_dangling=True
    ).collect()
    total = sum(r.rank_scaled for r in conserving)
    assert total <= scale
    assert total >= scale - iters * (n_edges + 3 * n_nodes + 3)

    leaking = pagerank_fixed_point(df, iterations=iters, scale=scale).collect()
    leaked_total = sum(r.rank_scaled for r in leaking)
    assert leaked_total < total * 0.8  # the leak is real and large here


def test_pagerank_conserving_no_dangling_equals_plain(spark):
    """On a graph where every node has an out-edge the two variants
    are identical (share term is exactly zero)."""
    from aws_datalake_spark.operators.graph import pagerank_fixed_point

    edges = [("a", "b"), ("b", "c"), ("c", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    plain = {
        r.node: r.rank_scaled
        for r in pagerank_fixed_point(df, iterations=3).collect()
    }
    cons = {
        r.node: r.rank_scaled
        for r in pagerank_fixed_point(
            df, iterations=3, redistribute_dangling=True
        ).collect()
    }
    assert plain == cons
