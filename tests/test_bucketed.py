"""Bucketed-table layout: the co-located join must plan with no runtime
shuffle or sort on either side (the layout paid both at write time)."""

from pyspark.sql import functions as F

from robokop_build_spark.sources.bucketed import ensure_bucketed_pair


def test_bucketed_join_has_no_exchange_or_sort(spark, tmp_path):
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("a")
    )
    right = spark.range(0, 3000).select(
        (F.col("id") % 1000).alias("k2"), (F.col("id") % 13).alias("b")
    )
    lt, rt = ensure_bucketed_pair(
        spark, left, right, "t_bkt_l", "t_bkt_r", str(tmp_path), "k", "k2"
    )
    # the fixture tables are tiny enough to broadcast, which would bypass
    # the layout under test — force the SMJ path a fact-fact join takes
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lt.join(rt, lt.k == rt.k2)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # layout replaced the shuffle
        assert "Bucketed: true" in plan and "SelectedBucketsCount" in plan
        # NB: a within-partition Sort remains — Spark only elides it with
        # one file per bucket AND the legacy outputOrdering flag; the
        # Exchange (the network cost) is the thing the layout removes
        # and the data is right: every right row finds its partner
        assert joined.count() == 3000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # cleanup catalog entries so reruns in the same session start fresh
    spark.sql("DROP TABLE IF EXISTS t_bkt_l")
    spark.sql("DROP TABLE IF EXISTS t_bkt_r")


def test_bucketed_join_matches_plain_join(spark, tmp_path):
    left = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 1500).select(
        (F.col("id") % 500).alias("k2"), (F.col("id") * 3).alias("b")
    )
    lt, rt = ensure_bucketed_pair(
        spark, left, right, "t_bkt_l2", "t_bkt_r2", str(tmp_path), "k", "k2"
    )
    got = sorted(
        map(tuple, lt.join(rt, lt.k == rt.k2).select("k", "a", "b").collect())
    )
    want = sorted(
        map(
            tuple,
            left.join(right, left.k == right.k2).select("k", "a", "b").collect(),
        )
    )
    assert got == want
    spark.sql("DROP TABLE IF EXISTS t_bkt_l2")
    spark.sql("DROP TABLE IF EXISTS t_bkt_r2")
