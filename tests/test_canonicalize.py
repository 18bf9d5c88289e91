"""Connected-components (large-star/small-star) unit tests: chains, rings,
hubs, long chains — deterministic min representative at any parallelism
(reference analog: KnowledgeGraph.merge, builder/builder.py:136-167)."""

import pytest

from robokop_build_spark.operators.canonicalize import (
    connected_components,
    resolve_aliases,
)

pytestmark = pytest.mark.parametrize("strategy", ["local", "distributed"])


def _cc(spark, pairs, strategy="distributed"):
    df = spark.createDataFrame(pairs, ["src", "dst"])
    return {
        r["curie"]: r["rep"]
        for r in connected_components(df, strategy=strategy).collect()
    }


def test_chain(spark, strategy):
    got = _cc(spark, [("B", "C"), ("C", "D"), ("A", "B")], strategy)
    assert got == {"A": "A", "B": "A", "C": "A", "D": "A"}


def test_ring(spark, strategy):
    got = _cc(spark, [("X", "Y"), ("Y", "Z"), ("Z", "X")], strategy)
    assert got == {"X": "X", "Y": "X", "Z": "X"}


def test_two_components_and_selfloop(spark, strategy):
    got = _cc(spark, [("A", "B"), ("C", "C"), ("D", "C")], strategy)
    assert got == {"A": "A", "B": "A", "C": "C", "D": "C"}


def test_long_chain_converges_logarithmically(spark, strategy):
    n = 40
    pairs = [(f"N{i:03d}", f"N{i + 1:03d}") for i in range(n)]
    got = _cc(spark, pairs, strategy)
    assert set(got.values()) == {"N000"}
    assert len(got) == n + 1


def test_hub_star(spark, strategy):
    pairs = [(f"ALIAS:{i:04d}", "HUB:0") for i in range(200)]
    got = _cc(spark, pairs, strategy)
    assert all(v == "ALIAS:0000" for v in got.values())


def test_resolve_aliases_broadcast_vs_salted(spark, strategy):
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
