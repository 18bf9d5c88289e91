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


def test_resolve_aliases_auto_flips_strategy_without_output_change(spark, strategy, tmp_path):
    """'auto' must broadcast a small map and switch to the salted shuffle
    when the map's Catalyst size estimate exceeds the session broadcast
    budget — identical output either way (VERDICT r3 item 5). Parametrized
    `strategy` reused as the budget axis: 'local'→roomy, 'distributed'→tiny."""
    from pyspark.sql import functions as F

    from robokop_build_spark.operators.canonicalize import resolve_aliases

    # parquet-backed map, as in the pipeline (checkpointed rep_map stage):
    # Catalyst's file-size stats are what the auto decision reads; an
    # in-memory ExistingRDD has no real size estimate and goes salted
    spark.createDataFrame(
        [(f"A:{i}", f"R:{i % 10}") for i in range(500)], ["curie", "rep"]
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "rep_map"))
    rep_map = spark.read.parquet(str(tmp_path / "rep_map"))
    fact = spark.createDataFrame(
        [(f"d{i}", f"A:{i % 500}") for i in range(2000)], ["doc_id", "curie"]
    )
    budget = "10MB" if strategy == "local" else "1b"
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", budget)
    try:
        out = resolve_aliases(
            fact, rep_map, "curie", strategy="auto",
            salt_source=F.xxhash64("doc_id"),
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        rows = sorted((r["doc_id"], r["rep"]) for r in out.collect())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    want = sorted(
        (f"d{i}", f"R:{(i % 500) % 10}") for i in range(2000)
    )
    assert rows == want
    if strategy == "local":
        assert "BroadcastHashJoin" in plan
        assert "__salt" not in plan
    else:
        assert "__salt" in plan  # salted path engaged under a tiny budget


def test_maybe_broadcast_budget_gate(spark, strategy, tmp_path):
    """maybe_broadcast hints only inside the session budget (parametrized
    `strategy` reused as the budget axis)."""
    from robokop_build_spark.operators.canonicalize import maybe_broadcast

    spark.createDataFrame([("a", 1)], ["k", "v"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "t"))
    small = spark.read.parquet(str(tmp_path / "t"))
    fact = spark.createDataFrame([("a", i) for i in range(100)], ["k", "x"])
    budget = "10MB" if strategy == "local" else "1b"
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", budget)
    try:
        plan = (
            fact.join(maybe_broadcast(small), "k")
            ._jdf.queryExecution()
            .analyzed()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    if strategy == "local":
        assert "ResolvedHint" in plan
    else:
        assert "ResolvedHint" not in plan
