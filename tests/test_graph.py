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


# ---------------------------------------------------------------------------
# triangle_count
# ---------------------------------------------------------------------------

from robokop_build_spark.operators.graph import triangle_count  # noqa: E402


def _triangles_py(edges):
    """Independent scalar reference: per-node triangle membership counts."""
    import itertools

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({x for e in und for x in e})
    adj = {v: set() for v in nodes}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    counts = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for v in (a, b, c):
                counts[v] = counts.get(v, 0) + 1
    return counts


def test_triangle_count_single_triangle(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"]
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_count(edges).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}


def test_triangle_count_square_no_diagonal_is_empty(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")], ["src", "dst"]
    )
    assert triangle_count(edges).count() == 0


def test_triangle_count_dupes_and_reversed_edges_collapse(spark):
    # each undirected edge appears twice (both directions) plus a self-loop;
    # the count must still see ONE triangle
    raw = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("c", "a"),
           ("a", "c"), ("a", "a")]
    edges = spark.createDataFrame(raw, ["src", "dst"])
    got = {r["node"]: r["n_triangles"] for r in triangle_count(edges).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}


def test_triangle_count_matches_scalar_reference_on_random_graph(spark):
    import random

    rng = random.Random(7)
    edges = [
        (f"n{rng.randrange(20)}", f"n{rng.randrange(20)}") for _ in range(80)
    ]
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_count(
            spark.createDataFrame(edges, ["src", "dst"])
        ).collect()
    }
    assert got == _triangles_py(edges)


def test_triangle_count_hub_skew_matches_reference(spark):
    # a hub connected to everything (worst case for unoriented wedge counts):
    # degree ordering must still produce exact counts
    spokes = [f"s{i}" for i in range(12)]
    edges = [("hub", s) for s in spokes] + [
        (spokes[i], spokes[i + 1]) for i in range(0, 10, 2)
    ]
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_count(
            spark.createDataFrame(edges, ["src", "dst"])
        ).collect()
    }
    assert got == _triangles_py(edges)


# ---------------------------------------------------------------------------
# k_core
# ---------------------------------------------------------------------------

from robokop_build_spark.operators.graph import k_core  # noqa: E402


def _kcore_py(edges, k):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    while True:
        drop = [n for n, v in adj.items() if len(v) < k]
        if not drop:
            break
        for n in drop:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
    return {n: len(v) for n, v in adj.items()}


def test_k_core_triangle_with_tail(spark):
    # triangle is the 2-core; the tail peels away (in two rounds: the
    # leaf first, then the now-degree-1 bridge)
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]
    got = {
        r["node"]: r["core_deg"]
        for r in k_core(
            spark.createDataFrame(edges, ["src", "dst"]), k=2
        ).collect()
    }
    assert got == {"a": 2, "b": 2, "c": 2}


def test_k_core_empty_when_k_exceeds_max_degree(spark):
    edges = [("a", "b"), ("b", "c")]
    assert k_core(spark.createDataFrame(edges, ["src", "dst"]), k=3).count() == 0


def test_k_core_matches_scalar_reference_on_random_graph(spark):
    import random

    rng = random.Random(11)
    edges = [
        (f"n{rng.randrange(25)}", f"n{rng.randrange(25)}") for _ in range(120)
    ]
    got = {
        r["node"]: r["core_deg"]
        for r in k_core(
            spark.createDataFrame(edges, ["src", "dst"]), k=4
        ).collect()
    }
    assert got == _kcore_py(edges, 4)


# ---------------------------------------------------------------------------
# core_number (full decomposition)
# ---------------------------------------------------------------------------

from robokop_build_spark.operators.graph import core_number  # noqa: E402


def _core_numbers_py(edges):
    """Independent scalar reference: Batagelj–Zaveršnik min-degree peeling
    (a different algorithm family from the h-index propagation under test)."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {n: len(v) for n, v in adj.items()}
    core = {}
    k = 0
    while deg:
        n = min(deg, key=lambda x: (deg[x], str(x)))
        k = max(k, deg[n])
        core[n] = k
        for m in adj[n]:
            if m in deg:
                deg[m] -= 1
        del deg[n]
    return core


def test_core_number_triangle_with_tail(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]
    got = {
        r["node"]: r["core"]
        for r in core_number(
            spark.createDataFrame(edges, ["src", "dst"])
        ).collect()
    }
    assert got == {"a": 2, "b": 2, "c": 2, "d": 1, "e": 1}


def test_core_number_matches_peeling_reference_on_random_graphs(spark):
    import random

    for seed, n, m in ((11, 25, 120), (23, 40, 90), (5, 15, 60)):
        rng = random.Random(seed)
        edges = [
            (f"n{rng.randrange(n)}", f"n{rng.randrange(n)}") for _ in range(m)
        ]
        got = {
            r["node"]: r["core"]
            for r in core_number(
                spark.createDataFrame(edges, ["src", "dst"])
            ).collect()
        }
        want = _core_numbers_py(edges)
        assert got == want, f"seed {seed}"


def test_core_number_hub_skew_and_consistency_with_k_core(spark):
    # hub + clique: the clique is the max core; the k-core at k must equal
    # exactly the nodes whose core number is >= k, for every k
    clique = [f"c{i}" for i in range(6)]
    edges = [(a, b) for i, a in enumerate(clique) for b in clique[i + 1:]]
    edges += [("hub", c) for c in clique] + [("hub", f"s{i}") for i in range(8)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    cn = {r["node"]: r["core"] for r in core_number(df).collect()}
    assert cn == _core_numbers_py(edges)
    for k in (1, 2, 5, 6):
        in_kcore = {r["node"] for r in k_core(df, k=k).collect()}
        assert in_kcore == {n for n, c in cn.items() if c >= k}, f"k={k}"


def test_core_number_path_graph_converges(spark):
    # worst-case round count shape: estimates tighten inward from the ends
    edges = [(f"p{i}", f"p{i+1}") for i in range(30)]
    got = {
        r["node"]: r["core"]
        for r in core_number(
            spark.createDataFrame(edges, ["src", "dst"])
        ).collect()
    }
    assert set(got.values()) == {1}
