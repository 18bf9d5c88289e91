"""Declared-error contracts for the sketch-based approximate stats
(round-6 verdict #8): the a13 HLL count-distinct and a14 histogram
quantile are hash-compared against DuckDB twins like any exact query
(both engines compute the SAME registers/buckets); these tests gate the
part the hash compare cannot see — that the sketch's realized error
actually sits inside the bound the docstring declares."""

import math
import os

import pytest
from pyspark.sql import functions as F

from robokop_build_spark.plans.benchmark_queries import (
    _HIST_K,
    _HLL_M,
    a13_hll_distinct,
    a14_hist_quantile,
)

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]

# HLL standard error is 1.04/sqrt(m); gate at 5 sigma so the test is a
# contract check, not a coin flip (P(reject|correct) ~ 1e-6 per group)
HLL_BOUND = 5 * 1.04 / math.sqrt(_HLL_M)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_hll_distinct_error_within_declared_bound(spark, sf_dir):
    rows = a13_hll_distinct(spark, sf_dir).collect()
    assert rows, "no groups"
    for r in rows:
        rel = abs(r["approx_distinct"] - r["exact_distinct"]) / r["exact_distinct"]
        assert rel <= HLL_BOUND, (r["l_returnflag"], rel, HLL_BOUND)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_hist_quantile_error_within_declared_bound(spark, sf_dir):
    """|q_est - exact rank-t value| <= one bucket width = (max-min)/K."""
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        F.col("l_returnflag").alias("g"),
        F.col("l_extendedprice").cast("double").alias("x"),
    )
    st = {
        r["g"]: r
        for r in li.groupBy("g")
        .agg(
            F.min("x").alias("mn"),
            F.max("x").alias("mx"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    got = a14_hist_quantile(spark, sf_dir).collect()
    assert got
    for r in got:
        s = st[r["l_returnflag"]]
        width = (s["mx"] - s["mn"]) / _HIST_K
        # exact rank-t value (t = ceil(p*n)), the target the sketch declares
        t = math.ceil(r["p"] * s["n"])
        exact = (
            li.filter(F.col("g") == r["l_returnflag"])
            .orderBy("x")
            .limit(t)
            .agg(F.max("x"))
            .collect()[0][0]
        )
        assert abs(r["q_est"] - exact) <= width + 1e-9, (
            r["l_returnflag"],
            r["p"],
            r["q_est"],
            exact,
            width,
        )
