"""Closed-form tests for the event-stream operators (as-of join and
sessionization)."""

import datetime as dt

from pyspark.sql import functions as F

from robokop_build_spark.operators.events import asof_join, sessionize


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )


def test_asof_join_picks_latest_at_or_before(spark):
    left = _events(
        spark,
        [
            (100, 1, _ts(10)),  # after quotes at 5 and 8 -> 12
            (101, 1, _ts(5)),   # exactly at quote 11's ts -> inclusive
            (102, 1, _ts(1)),   # before any quote -> null
            (103, 2, _ts(30)),  # other key -> its own quote
        ],
    )
    right = _events(
        spark,
        [
            (11, 1, _ts(5)),
            (12, 1, _ts(8)),
            (21, 2, _ts(7)),
        ],
    )
    got = {
        r["event_id"]: r["event_id_right"]
        for r in asof_join(left, right, on="user_id").collect()
    }
    assert got == {100: 12, 101: 11, 102: None, 103: 21}


def test_asof_join_equal_ts_tie_breaks_to_highest_right_id(spark):
    left = _events(spark, [(100, 1, _ts(10))])
    right = _events(spark, [(11, 1, _ts(10)), (12, 1, _ts(10)), (5, 1, _ts(9))])
    [row] = asof_join(left, right, on="user_id").collect()
    assert row["event_id_right"] == 12
    # and the match's own timestamp comes back alongside
    assert row["ts_right"] == _ts(10)


def test_sessionize_splits_on_gap(spark):
    ev = _events(
        spark,
        [
            (1, 7, _ts(0)),
            (2, 7, _ts(10)),        # 10 min gap -> same session
            (3, 7, _ts(41)),        # 31 min gap -> new session
            (4, 7, _ts(41, 30)),
            (5, 8, _ts(0)),         # separate key
        ],
    )
    rows = {
        (r["user_id"], r["session_seq"]): r
        for r in sessionize(ev, gap_seconds=1800).collect()
    }
    assert set(rows) == {(7, 1), (7, 2), (8, 1)}
    assert rows[(7, 1)]["n_events"] == 2
    assert rows[(7, 2)]["n_events"] == 2
    s2 = rows[(7, 2)]
    assert s2["end_us"] - s2["start_us"] == 30 * 1_000_000


def test_sessionize_exact_gap_starts_new_session(spark):
    # boundary is >= gap, aligned with session_window's close rule so the
    # streaming twin can never hash-diverge on an exact-gap event
    ev = _events(spark, [(1, 7, _ts(0)), (2, 7, _ts(30))])  # exactly 1800s
    rows = sessionize(ev, gap_seconds=1800).collect()
    assert len(rows) == 2 and all(r["n_events"] == 1 for r in rows)


def test_asof_join_plan_has_single_shuffle_no_cross_product(spark):
    left = _events(spark, [(100, 1, _ts(10))])
    right = _events(spark, [(11, 1, _ts(5))])
    plan = (
        asof_join(left, right, on="user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_empty_right_side_yields_all_nulls(spark):
    left = _events(spark, [(100, 1, _ts(10))])
    right = _events(spark, []).filter("event_id IS NOT NULL")
    [row] = asof_join(left, right, on="user_id").collect()
    assert row["event_id_right"] is None and row["ts_right"] is None


def test_sessionize_single_event_per_user(spark):
    ev = _events(spark, [(1, 7, _ts(0))])
    [row] = sessionize(ev).collect()
    assert (row["session_seq"], row["n_events"]) == (1, 1)
    assert row["start_us"] == row["end_us"]


# ---------------------------------------------------------------------------
# range_join
# ---------------------------------------------------------------------------

from robokop_build_spark.operators.events import range_join  # noqa: E402


def _pts(spark, rows):
    return spark.createDataFrame(rows, "pid long, ts_us long")


def _ivs(spark, rows):
    return spark.createDataFrame(rows, "wid long, start_us long, end_us long")


def test_range_join_boundaries_inclusive_start_exclusive_end(spark):
    pts = _pts(spark, [(1, 100), (2, 199), (3, 200), (4, 99)])
    ivs = _ivs(spark, [(10, 100, 200)])
    got = sorted(
        (r["pid"], r["wid"])
        for r in range_join(pts, ivs, ts_col="ts_us", bucket_width=50).collect()
    )
    assert got == [(1, 10), (2, 10)]  # ts=200 excluded, ts=99 before start


def test_range_join_interval_spanning_many_buckets(spark):
    # interval covers buckets 0..9 with width 10; points in several buckets
    pts = _pts(spark, [(1, 5), (2, 50), (3, 99), (4, 100)])
    ivs = _ivs(spark, [(7, 0, 100)])
    got = sorted(
        r["pid"]
        for r in range_join(pts, ivs, ts_col="ts_us", bucket_width=10).collect()
    )
    assert got == [1, 2, 3]


def test_range_join_overlapping_intervals_match_all(spark):
    pts = _pts(spark, [(1, 150)])
    ivs = _ivs(spark, [(10, 100, 200), (11, 140, 160), (12, 160, 170)])
    got = sorted(
        r["wid"]
        for r in range_join(pts, ivs, ts_col="ts_us", bucket_width=1000).collect()
    )
    assert got == [10, 11]


def test_range_join_plan_is_equi_join_not_cartesian(spark):
    pts = _pts(spark, [(1, 150)])
    ivs = _ivs(spark, [(10, 100, 200)])
    plan = (
        range_join(pts, ivs, ts_col="ts_us", bucket_width=100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scd2_intervals_chain_and_open_tail(spark):
    from robokop_build_spark.operators.events import scd2_intervals

    ev = _events(
        spark,
        [(1, 7, _ts(0)), (2, 7, _ts(10)), (3, 7, _ts(20)), (9, 8, _ts(5))],
    )
    got = {r["event_id"]: r for r in scd2_intervals(ev).collect()}
    # intervals chain: each valid_to equals the next event's valid_from
    assert got[1]["valid_to_us"] == got[2]["valid_from_us"]
    assert got[2]["valid_to_us"] == got[3]["valid_from_us"]
    # the latest event per key stays open (-1 sentinel)
    assert got[3]["valid_to_us"] == -1
    assert got[9]["valid_to_us"] == -1
    assert got[1]["valid_from_us"] < got[1]["valid_to_us"]
