"""Bounded per-group top-k collection (W2 applied to provenance).

Reference analog: the per-pair article LIMIT 10000 in
builder/chemotext.py:53. The naive collect_set-then-slice computes the full
set in one aggregation buffer first — on a hub edge whose publication list
grows with the corpus, that is a single task with unbounded memory and the
straggler that caps scaling (measured round 1: the uncapped provenance
group was the prime suspect for the SF=4 throughput ceiling). This two-phase
form bounds both memory and skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def capped_sorted_set(
    df: DataFrame,
    keys: list[str],
    val_col: str,
    cap: int,
    nsalt: int = 16,
    out: str | None = None,
) -> DataFrame:
    """Per group of `keys`: the `cap` smallest distinct values of `val_col`,
    as one sorted array column (deterministic — equivalent to
    sorted(set(vals))[:cap]).

    Phase 1 salts the group key by hash(val): a hub group's rows spread
    across nsalt partitions, each keeping its own cap smallest distinct
    values (dense_rank so duplicates don't consume rank slots). Phase 2
    aggregates ≤ nsalt×cap distinct values per group — bounded regardless of
    corpus size — and slices the global smallest cap. One doc-scale window
    shuffle + one edge-bounded hash agg; no unbounded aggregation buffer
    anywhere.
    """
    out = out or val_col + "s"
    salt = F.pmod(F.xxhash64(F.col(val_col)), F.lit(nsalt)).cast("int")
    w1 = Window.partitionBy(*keys, "_salt").orderBy(val_col)
    phase1 = (
        df.withColumn("_salt", salt)
        .withColumn("_rk", F.dense_rank().over(w1))
        .filter(F.col("_rk") <= cap)
        .drop("_salt", "_rk")
    )
    return phase1.groupBy(*keys).agg(
        F.slice(F.array_sort(F.collect_set(val_col)), 1, cap).alias(out)
    )
