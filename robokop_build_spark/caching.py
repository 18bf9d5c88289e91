"""Registry for operator-internal persisted DataFrames.

Several pair-generation operators persist an intermediate (signature /
shingle / banded-key) table so both sides of a self-join read one
InMemoryRelation instead of recomputing the signature DAG twice
(operators/dedup.py, operators/similarity.py — plan-tested). Those persists
must outlive the operator call (the caller runs the action later), so the
operator cannot unpersist them itself; without a hook they accumulate for
the life of the SparkSession — dozens of queries in one bench loop pressure
memory and disk for later queries.

Operators register their persisted blocks here; long-running loops call
`release_operator_caches()` between queries (bench.py does, on top of
`spark.catalog.clearCache()`)."""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def register_persisted(df: DataFrame) -> DataFrame:
    """Record an operator-persisted DataFrame for later release."""
    _PERSISTED.append(df)
    return df


def release_operator_caches() -> int:
    """Unpersist every registered block; returns how many were released.
    Safe to call with a stopped session (errors are swallowed — the JVM
    already dropped the blocks)."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
