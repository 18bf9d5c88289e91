"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship KG-construction pipeline (extract → link →
canonicalize → materialize) on an interleaved-span corpus generated
deterministically at sf0.001 scale and returns the triples DataFrame.

`queries()` / `oracle_sql()` cover the SURVEY.md §2 operator inventory: each
key names the §2 row(s) it exercises; implementations live in
robokop_build_spark/plans/benchmark_queries.py. Entries without an oracle
(kg_end_to_end, kg_span_roundtrip, multimodal_media_features, dedup_simhash,
ann_embedding_neardup) are non-SQL-expressible (CC fixpoint, Arrow UDFs,
driver-side LSH plane constants) and rely on the pytest golden gates in
tests/ instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from robokop_build_spark.plans.benchmark_queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query at sf0.001; driver checks rows>0."""
    return QUERIES["kg_end_to_end"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
