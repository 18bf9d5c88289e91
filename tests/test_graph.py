"""Closed-form and reference-parity tests for distributed PageRank."""

from robokop_build_spark.operators.graph import pagerank


def _pagerank_py(edges, iterations=10, damping=0.85, round_dp=8):
    """Independent scalar power iteration (same rounding contract)."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    e = sorted(set(edges))
    n = float(len(nodes))
    deg = {}
    for u, _ in e:
        deg[u] = deg.get(u, 0) + 1
    rank = {v: round(1.0 / n, round_dp) for v in nodes}
    for _ in range(iterations):
        s = {v: 0.0 for v in nodes}
        for u, v in e:
            s[v] += rank[u] / deg[u]
        rank = {
            v: round((1.0 - damping) / n + damping * s[v], round_dp)
            for v in nodes
        }
    return {v: round(r, 6) for v, r in rank.items()}


def test_pagerank_two_node_cycle_is_uniform(spark):
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=10).collect()}
    assert got == {"a": 0.5, "b": 0.5}


def test_pagerank_star_sink_dominates(spark):
    # 4 spokes all pointing at the hub: the hub accumulates damped mass
    edges = spark.createDataFrame(
        [(s, "hub") for s in "abcd"], ["src", "dst"]
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=10).collect()}
    want = _pagerank_py([(s, "hub") for s in "abcd"], iterations=10)
    assert got == want
    assert got["hub"] > got["a"] == got["b"] == got["c"] == got["d"]


def test_pagerank_matches_scalar_reference_on_random_graph(spark):
    import random

    rng = random.Random(13)
    edges = [
        (f"n{rng.randrange(30)}", f"n{rng.randrange(30)}") for _ in range(120)
    ]
    edges = [(u, v) for u, v in edges if u != v]
    got = {
        r["node"]: r["rank"]
        for r in pagerank(
            spark.createDataFrame(edges, ["src", "dst"]), iterations=7
        ).collect()
    }
    assert got == _pagerank_py(edges, iterations=7)
