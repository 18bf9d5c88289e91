"""Connected-components (large-star/small-star) unit tests: chains, rings,
hubs, long chains — deterministic min representative at any parallelism
(reference analog: KnowledgeGraph.merge, builder/builder.py:136-167)."""

from robokop_build_spark.operators.canonicalize import (
    connected_components,
    resolve_aliases,
)


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, ["src", "dst"])
    return {
        r["curie"]: r["rep"] for r in connected_components(df).collect()
    }


def test_chain(spark):
    got = _cc(spark, [("B", "C"), ("C", "D"), ("A", "B")])
    assert got == {"A": "A", "B": "A", "C": "A", "D": "A"}


def test_ring(spark):
    got = _cc(spark, [("X", "Y"), ("Y", "Z"), ("Z", "X")])
    assert got == {"X": "X", "Y": "X", "Z": "X"}


def test_two_components_and_selfloop(spark):
    got = _cc(spark, [("A", "B"), ("C", "C"), ("D", "C")])
    assert got == {"A": "A", "B": "A", "C": "C", "D": "C"}


def test_long_chain_converges_logarithmically(spark):
    n = 40
    pairs = [(f"N{i:03d}", f"N{i + 1:03d}") for i in range(n)]
    got = _cc(spark, pairs)
    assert set(got.values()) == {"N000"}
    assert len(got) == n + 1


def test_hub_star(spark):
    pairs = [(f"ALIAS:{i:04d}", "HUB:0") for i in range(200)]
    got = _cc(spark, pairs)
    assert all(v == "ALIAS:0000" for v in got.values())


def test_resolve_aliases_broadcast_vs_salted(spark):
    import pyspark.sql.functions as F

    rep_map = spark.createDataFrame(
        [("a1", "R"), ("a2", "R"), ("b1", "S")], ["curie", "rep"]
    )
    fact = spark.createDataFrame(
        [("d1", "a1"), ("d2", "a2"), ("d3", "b1"), ("d4", "zz")], ["doc_id", "curie"]
    )
    want = {("d1", "R"), ("d2", "R"), ("d3", "S"), ("d4", "zz")}
    got_b = {
        (r["doc_id"], r["rep"])
        for r in resolve_aliases(fact, rep_map, "curie").collect()
    }
    got_s = {
        (r["doc_id"], r["rep"])
        for r in resolve_aliases(
            fact,
            rep_map,
            "curie",
            strategy="salted",
            nsalt=4,
            salt_source=F.xxhash64("doc_id"),
        ).collect()
    }
    assert got_b == want
    assert got_s == want
