"""Event-stream relational operators Spark lacks as built-ins: as-of join
and gap-based sessionization, both expressed as compositions of existing
DataFrame ops (union + window), never per-row Python.

Reference parity note: the reference engine has no event operators — these
belong to the beyond-reference LLM-pipeline surface (SURVEY.md §2,
training-data curation: aligning telemetry/label streams to document
events, grouping interaction logs into sessions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    left_id: str = "event_id",
    right_id: str = "event_id",
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row with the same
    `on` key and right.ts <= left.ts (inclusive; ties on ts broken by the
    highest right id — fully deterministic).

    Spark-first shape: instead of a range join (O(n·m) without an interval
    index), tag both sides, UNION, and run ONE window pass per key ordered
    by (ts, side, id): last_value(right id, ignorenulls) over the preceding
    frame is exactly the as-of match. One shuffle on the join key, linear
    scan per key, no cross product — the plan a 1000-executor cluster wants
    (both inputs shuffle-partition on `on`; skewed keys stream, not
    explode). DuckDB twin uses the same explicit window (its native ASOF
    JOIN leaves equal-ts duplicate resolution unspecified)."""
    l_tag = left.select(
        F.col(on),
        F.col(ts_col).alias("__ts"),
        F.col(left_id).alias("__lid"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__rid"),
    )
    r_tag = right.select(
        F.col(on),
        F.col(ts_col).alias("__ts"),
        F.lit(None).cast("long").alias("__lid"),
        F.lit(0).alias("__side"),
        F.col(right_id).cast("long").alias("__rid"),
    )
    # order: at equal ts the right row sorts FIRST (side 0 < 1) => inclusive
    # <=; among equal-ts right rows the highest id wins (last in frame)
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side", "__rid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_tag.unionByName(r_tag).withColumn(
        "__asof_rid", F.last("__rid", ignorenulls=True).over(w)
    )
    matches = merged.filter(F.col("__side") == 1).select(
        F.col(on),
        F.col("__lid").alias(left_id),
        F.col("__ts").alias(ts_col),
        F.col("__asof_rid").alias(f"{right_id}{suffix}"),
    )
    r_ts = right.select(
        F.col(right_id).cast("long").alias(f"{right_id}{suffix}"),
        F.col(ts_col).alias(f"{ts_col}{suffix}"),
    )
    return matches.join(r_ts, f"{right_id}{suffix}", "left")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts_us",
    start_col: str = "start_us",
    end_col: str = "end_us",
    bucket_width: int = 3_600_000_000,
) -> DataFrame:
    """Point-in-interval join (each point row matched to every interval
    with start <= ts < end) WITHOUT the cartesian product Spark's planner
    gives a bare non-equi join (BroadcastNestedLoopJoin: O(points ×
    intervals) comparisons).

    Bucket decomposition: time is cut into fixed-width buckets; each
    interval is exploded to the buckets it overlaps (one row per covered
    bucket — choose bucket_width on the order of the TYPICAL interval
    length so the blow-up factor stays ~1-2×), each point maps to exactly
    one bucket, and the match becomes an EQUI-join on the bucket key plus a
    residual range filter inside the join — a shuffle-partitionable plan
    whose cost is O(points + intervals·coverage + true matches). This is
    the interval-join strategy streaming engines (Flink) and warehouse
    range-join optimizers implement natively; DuckDB's IEJoin handles the
    oracle side directly."""
    b = F.lit(int(bucket_width)).cast("long")
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / b),
                F.floor((F.col(end_col) - 1) / b),
            )
        ),
    )
    pt = points.withColumn("__b", F.floor(F.col(ts_col) / b))
    cond = (
        (pt["__b"] == iv["__b"])
        & (pt[ts_col] >= iv[start_col])
        & (pt[ts_col] < iv[end_col])
    )
    return pt.join(iv, cond).drop("__b")


def scd2_intervals(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history from an event stream:
    each event opens a validity interval that closes when the key's next
    event arrives; the key's latest event stays open (valid_to = -1
    sentinel — BIGINT on purpose, never a max-timestamp literal that two
    engines might format differently).

    One shuffle on the key, one lead() window — the standard CDC
    interval-ization every warehouse build runs over ingested change
    streams; the output joins back to facts with events.range_join."""
    order = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return events.select(
        F.col(key_col),
        F.col(id_col),
        ts_us.alias("valid_from_us"),
        F.coalesce(
            F.lead(ts_us).over(order), F.lit(-1).cast("long")
        ).alias("valid_to_us"),
    )


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the key's previous event reaches gap_seconds (boundary is `>= gap`,
    matching Structured Streaming's session_window close rule exactly, so
    the streaming twin in streaming/incremental.streaming_sessions agrees
    even on an event landing precisely at the gap). Returns one row per
    session: key, session_seq (1-based per key), n_events, and epoch-micros
    start/end (BIGINT on purpose — cross-engine hash compares should never
    ride on timestamp string formatting).

    Two window passes over one shuffle on the key (lag -> boundary flag ->
    running sum), then a partial-aggregating groupBy — the standard linear
    plan; batch twin of what a streaming deployment would express with
    session_window()."""
    order = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    gap_us = F.lit(int(gap_seconds) * 1_000_000).cast("long")
    # parquet event times arrive as TIMESTAMP_NTZ; the UTC session makes
    # the cast to (tz-aware) TIMESTAMP exact, and unix_micros then agrees
    # with DuckDB's epoch_us on the same NTZ values
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    flagged = events.withColumn(
        "__new",
        F.when(
            F.lag(ts_us).over(order).isNull()
            | ((ts_us - F.lag(ts_us).over(order)) >= gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "session_seq",
        F.sum("__new").over(
            order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return flagged.groupBy(key_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_us).alias("start_us"),
        F.max(ts_us).alias("end_us"),
    )
