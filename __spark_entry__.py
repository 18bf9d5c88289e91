"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship KG-construction pipeline (extract → link →
canonicalize → materialize) on an interleaved-span corpus generated
deterministically at sf0.001 scale and returns the triples DataFrame.

`queries()` / `oracle_sql()` cover the SURVEY.md §2 operator inventory: each
key names the §2 row(s) it exercises; implementations live in
robokop_build_spark/plans/benchmark_queries.py. Queries without an ANSI-SQL
formulation are oracled through generated parquet artifacts (independent
pure-Python replays + exported constants, datagen/oracle_fixtures.py) read
by DuckDB via read_parquet; kg_span_roundtrip's twin recomputes its
invariant directly in SQL (unnest WITH ORDINALITY → re-aggregate →
null-safe compare), so every entry now carries an oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from robokop_build_spark.plans.benchmark_queries import (
    ORACLES,
    QUERIES,
    fixture_backed_oracles,
    lazy_oracles,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query at sf0.001; driver checks rows>0."""
    return QUERIES["kg_end_to_end"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    out = dict(ORACLES)
    out.update(lazy_oracles())
    out.update(fixture_backed_oracles())
    return out
