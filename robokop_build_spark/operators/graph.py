"""Distributed PageRank over an edge DataFrame — the iterative numeric
sibling of the large-star/small-star connected components in
canonicalize.py (the reference engine has neither; this is beyond-reference
graph analytics over the constructed KG: rank entities by citation flow).

Semantics: the simplified uniform-teleport recurrence
    rank_{i+1}(v) = (1-d)/N + d * sum_{(u,v) in E} rank_i(u) / out_deg(u)
with dangling mass dropped (nodes with no out-edges contribute nothing) —
the classic power-iteration form every engine can reproduce exactly when
each iteration's ranks are rounded to a fixed precision.

Determinism contract (shared with the generated DuckDB twin): ranks are
rounded to `round_dp` decimals AFTER each iteration (summation-order fp
noise is ~1e-15 relative, ~7 orders below the 1e-8 boundary, so
cross-engine equality holds through any iteration count that matters) and
to 6dp on output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    round_dp: int = 8,
) -> DataFrame:
    """Fixed-iteration power-iteration PageRank.

    100-TB shape: per iteration one shuffle joins ranks to edges on the
    source key and one partial-aggregating groupBy sums contributions per
    destination — the canonical Pregel-without-Pregel plan. The edge table
    (joined once with out-degrees) persists across iterations; each
    iteration's rank table is localCheckpointed so the logical plan stays
    O(1)-deep instead of growing by two joins per round (driver analysis
    time, not data, is the thing that explodes otherwise). Fixed iteration
    count rather than fixpoint detection keeps the oracle replayable; CC in
    canonicalize.py shows the fingerprint-fixpoint pattern where
    convergence detection matters.
    """
    from pyspark import StorageLevel

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = nodes.count()  # one scalar to the driver; node table itself stays out
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    contrib_edges = (
        e.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    )
    # every constant is an EXPRESSION over (damping, N) evaluated by the
    # engine — Spark's round and DuckDB's round are both half-away-from-zero
    # for positives and the divisions are the same IEEE ops, so the twin
    # reproduces the literals exactly (Python's round() is banker's and
    # must not leak into the contract)
    n_d = F.lit(float(n))
    ranks = nodes.withColumn(
        "rank", F.round(F.lit(1.0) / n_d, round_dp)
    ).localCheckpoint(eager=True)
    for _ in range(iterations):
        contribs = (
            contrib_edges.join(
                ranks.select(F.col("node").alias("src"), "rank"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("s"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                F.round(
                    F.lit(1.0 - damping) / n_d
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0)),
                    round_dp,
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    out = ranks.select("node", F.round("rank", 6).alias("rank"))
    nodes.unpersist()
    contrib_edges.unpersist()
    return out
