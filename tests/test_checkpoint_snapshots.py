"""Snapshot isolation + time travel for the checkpoint layer — the
Iceberg-commit contract (immutable snapshots, atomic pointer swap,
read-at-snapshot, retention) on plain parquet. Closes the round-3
'snapshot isolation/time-travel semantics unexercised' gap."""

import json
import os

import pytest

from robokop_build_spark.sources.checkpoint import MARKER, CheckpointManager


@pytest.fixture()
def ckpt(spark, tmp_path):
    return CheckpointManager(spark, str(tmp_path / "wd"))


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], ["x"])


def test_commit_and_time_travel(spark, ckpt):
    ckpt.commit("s", _df(spark, [1, 2]))
    ckpt.run_stage("s", lambda: _df(spark, [3, 4]), force=True)
    assert sorted(r["x"] for r in ckpt.read("s").collect()) == [3, 4]
    # time travel to the first commit
    assert sorted(r["x"] for r in ckpt.read("s", snapshot_id=0).collect()) == [1, 2]
    hist = ckpt.snapshots("s")
    assert [m["snapshot"] for m in hist] == [0, 1]
    assert all("schema" in m and m["ts"] > 0 for m in hist)


def test_snapshot_isolation_for_inflight_readers(spark, ckpt):
    """A reader that resolved the pointer before a re-commit keeps reading
    its snapshot: the new commit writes a NEW directory and only swaps the
    pointer — no file of the old snapshot is rewritten."""
    ckpt.commit("s", _df(spark, [1, 2]))
    old_reader = ckpt.read("s")  # resolves pointer → snap-0
    ckpt.commit("s", _df(spark, [9]))
    assert sorted(r["x"] for r in old_reader.collect()) == [1, 2]
    assert [r["x"] for r in ckpt.read("s").collect()] == [9]


def test_resume_skips_and_force_creates_new_snapshot(spark, ckpt):
    calls = []

    def compute():
        calls.append(1)
        return _df(spark, [7])

    ckpt.run_stage("s", compute)
    ckpt.run_stage("s", compute)  # resume: skipped
    assert len(calls) == 1
    ckpt.run_stage("s", compute, force=True)
    assert len(calls) == 2
    assert [m["snapshot"] for m in ckpt.snapshots("s")] == [0, 1]


def test_expire_snapshots_retention(spark, ckpt):
    for vals in ([1], [2], [3]):
        ckpt.commit("s", _df(spark, vals))
    assert ckpt.expire_snapshots("s", keep_last=1) == 2
    assert [r["x"] for r in ckpt.read("s").collect()] == [3]
    with pytest.raises(FileNotFoundError):
        ckpt.read("s", snapshot_id=0)
    # history rows survive expiry (audit trail), data is gone
    assert [m["snapshot"] for m in ckpt.snapshots("s")] == [0, 1, 2]
    # current snapshot is never expired, even with keep_last=1 again
    assert ckpt.expire_snapshots("s", keep_last=1) == 0


def test_legacy_layout_still_readable(spark, ckpt):
    """Pre-snapshot workdirs (data at stage root, marker without a
    'snapshot' field) must keep resuming byte-identically."""
    df = _df(spark, [5, 6])
    p = ckpt.path("legacy")
    df.write.mode("overwrite").parquet(p)
    with open(os.path.join(p, MARKER), "w") as f:
        json.dump({"stage": "legacy", "schema": df.schema.json()}, f)
    assert ckpt.is_done("legacy")
    assert sorted(r["x"] for r in ckpt.read("legacy").collect()) == [5, 6]


def test_empty_stage_snapshot_roundtrip(spark, ckpt):
    """Zero-row outputs commit and resume through the recorded schema."""
    empty = spark.createDataFrame([], "x bigint").filter("x > 0")
    ckpt.commit("e", empty)
    out = ckpt.read("e")
    assert out.count() == 0 and out.columns == ["x"]
