"""Per-stage checkpointing with snapshot isolation + time travel.

Reference analog: the Redis memo cache (builder/builder.py:348-356) — here
replaced by durable per-stage tables with Iceberg's commit contract,
implemented on plain parquet (the offline container has no Iceberg runtime
jar; the semantics below are the part of the contract a query engine
actually depends on):

- **Immutable snapshots**: each commit writes a NEW directory
  `<stage>/snap-<n>/` and never touches previous snapshots' files.
- **Atomic metadata-pointer swap**: the commit point is one atomic
  os.replace of `<stage>/_STAGE_COMMITTED`, whose JSON names the current
  snapshot id + schema — exactly Iceberg's version-hint/metadata swap. A
  reader that resolved the pointer before a re-commit keeps reading its
  (untouched) snapshot: snapshot isolation without locks.
- **Time travel**: `read(stage, snapshot_id=k)` / `snapshots(stage)` replay
  any retained snapshot with its commit-time schema; `expire_snapshots`
  is the retention sweep (never expires the current snapshot).
- **Resumability**: a killed job relaunches and skips every stage whose
  pointer exists (north_rule "resumable from checkpoint") — unchanged.

Legacy layout (data files at the stage root, marker without a "snapshot"
field) remains readable, so pre-existing workdirs resume as before.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

MARKER = "_STAGE_COMMITTED"
HISTORY = "_snapshots.jsonl"


class CheckpointManager:
    def __init__(self, spark: SparkSession, workdir: str):
        self.spark = spark
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)

    def path(self, stage: str) -> str:
        return os.path.join(self.workdir, stage)

    def is_done(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self.path(stage), MARKER))

    def _pointer(self, stage: str) -> dict | None:
        marker = os.path.join(self.path(stage), MARKER)
        if not os.path.exists(marker):
            return None
        with open(marker) as f:
            return json.load(f)

    def current_meta(self, stage: str) -> dict | None:
        """Metadata of the current committed snapshot (the pointer JSON:
        snapshot id, schema, manifest stats, any extra_meta recorded at
        commit) — None when the stage has never committed."""
        return self._pointer(stage)

    def snapshots(self, stage: str) -> list[dict]:
        """Commit history, oldest first: [{snapshot, ts, wall_sec, ...}].

        A torn FINAL line is SKIPPED, not fatal: the history append is a
        plain write (only the pointer swap is the atomic commit point), so a
        crash mid-append leaves a half-written last JSON line. Raising there
        would make the stage permanently unwritable — commit() calls this to
        allocate the next id — for a crash the commit contract explicitly
        tolerates (the torn row's snapshot never became current). An
        undecodable line ANYWHERE ELSE is genuine corruption (partial disk
        failure, concurrent writer) that must not silently vanish from the
        audit surface, so it raises."""
        hist = os.path.join(self.path(stage), HISTORY)
        if not os.path.exists(hist):
            meta = self._pointer(stage)
            return [meta] if meta else []
        with open(hist) as f:
            lines = [ln for ln in f if ln.strip()]
        out = []
        for i, ln in enumerate(lines):
            try:
                out.append(json.loads(ln))
            except json.JSONDecodeError:
                if i == len(lines) - 1:
                    continue  # torn trailing append (crash window)
                raise ValueError(
                    f"corrupt snapshot history for stage {stage!r}: "
                    f"undecodable line {i + 1} of {len(lines)} in {hist} "
                    "(mid-file corruption, not a torn trailing append)"
                )
        return out

    def _commit_schema(self, meta: dict):
        from pyspark.sql.types import StructType

        if "schema" not in meta:
            return None
        return StructType.fromJson(json.loads(meta["schema"]))

    def _read_meta(
        self, stage: str, meta: dict, partitions: list[str] | None = None
    ) -> DataFrame:
        p = self.path(stage)
        if meta.get("snapshot") is not None:
            p = os.path.join(p, f"snap-{meta['snapshot']}")
            if not os.path.isdir(p):
                raise FileNotFoundError(
                    f"stage {meta['stage']!r} snapshot {meta['snapshot']} "
                    "data expired (see expire_snapshots)"
                )
        schema = self._commit_schema(meta)
        # manifest-planned read paths (the Iceberg scan-planning half): the
        # commit marker's stats say what the data layer holds, so a reader
        # can skip it without listing anything —
        # (a) a zero-row snapshot resolves to a LocalRelation: no directory
        #     listing, no FileScan, no job;
        # (b) a partition-scoped read scans exactly the partition dirs the
        #     manifest names (absent = zero rows = skipped), never trusting
        #     a directory listing that may see foreign/leftover dirs.
        if schema is not None and meta.get("n_rows") == 0:
            return self.spark.createDataFrame([], schema)
        if partitions is not None:
            manifest = meta.get("partitions")
            if manifest is None:
                raise ValueError(
                    f"stage {stage!r} snapshot was not committed with "
                    "partition_by; no partition manifest to plan from"
                )
            # prefix semantics for multi-column layouts: a selector 'a=1'
            # matches manifest leaves 'a=1' AND 'a=1/b=2' — without this a
            # single-level selector over partition_by=['a','b'] data would
            # silently return zero rows (round-6 review finding)
            keep = sorted(
                {
                    d
                    for d in manifest
                    for p in partitions
                    if d == p or d.startswith(p + "/")
                }
            )
            if not keep:
                if schema is None:
                    raise ValueError(
                        f"stage {stage!r}: no schema recorded; cannot build "
                        "an empty frame for a fully-pruned partition read"
                    )
                return self.spark.createDataFrame([], schema)
            reader = self.spark.read.option("basePath", p)
            if schema is not None:
                reader = reader.schema(schema)
            return reader.parquet(*(os.path.join(p, d) for d in keep))
        reader = self.spark.read
        if schema is not None:
            # schema recorded at commit time, applied explicitly: an empty
            # stage output writes zero part-files, and schema inference over
            # a fileless directory fails even though the stage legitimately
            # produced 0 rows (e.g. an end-bound query with no matches)
            reader = reader.schema(schema)
        return reader.parquet(p)

    def read(
        self,
        stage: str,
        snapshot_id: int | None = None,
        partitions: list[str] | None = None,
    ) -> DataFrame:
        """Read a committed stage — the current snapshot by default, or any
        retained snapshot by id (time travel, with that commit's schema).

        partitions: optional list of hive partition dirs (e.g.
        ['pred=treats']) — the scan is planned from the commit marker's
        partition manifest: named dirs absent from the manifest are skipped
        as zero rows, present ones are read directly, and nothing is
        discovered by listing the directory tree."""
        if snapshot_id is None:
            meta = self._pointer(stage)
            if meta is None:
                raise FileNotFoundError(f"stage {stage!r} has no committed snapshot")
            return self._read_meta(stage, meta, partitions)
        # newest-first so a duplicate id (orphaned pre-crash history row)
        # resolves to the row whose schema matches the surviving data
        for meta in reversed(self.snapshots(stage)):
            if meta.get("snapshot") == snapshot_id:
                return self._read_meta(stage, meta, partitions)
        raise FileNotFoundError(
            f"stage {stage!r} has no snapshot {snapshot_id} (expired or never committed)"
        )

    def _migrate_legacy(self, stage: str) -> None:
        """Upgrade a legacy-layout stage (data part-files at the stage root,
        pointer without a "snapshot" field) in place: move the root data
        files into snap-0 and rewrite the pointer/history to name it.

        Without this, the first re-commit over a legacy stage writes
        snap-1/ UNDER a root that still holds the legacy part-files — a
        reader resolving the legacy pointer then lists data files both at
        the root and in a non-partition subdirectory (partition discovery
        fails / double-reads), and the superseded legacy files would never
        be expired. After migration the stage is a normal snapshot stage:
        snapshot-isolated re-commits and expire_snapshots both apply."""
        p = self.path(stage)
        prev = self._pointer(stage)
        if prev is None or prev.get("snapshot") is not None:
            return  # no pointer, or already snapshot layout
        snap_dir = os.path.join(p, "snap-0")
        os.makedirs(snap_dir, exist_ok=True)
        for name in os.listdir(p):
            full = os.path.join(p, name)
            if name.startswith("snap-") or name in (MARKER, HISTORY):
                continue
            if os.path.isfile(full) or os.path.isdir(full):  # part files,
                os.replace(full, os.path.join(snap_dir, name))  # _SUCCESS,
                # hive partition dirs (pred=...) all move wholesale
        meta = dict(prev, snapshot=0, migrated_from="legacy-root-layout")
        with open(os.path.join(p, HISTORY), "a") as f:
            f.write(json.dumps(meta) + "\n")
        tmp = os.path.join(p, MARKER + ".tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(p, MARKER))

    def _repair_torn_tail(self, stage: str) -> None:
        """Repair the history before a commit appends to it.

        Two cases, both rewritten atomically (tmp + os.replace — a crash
        mid-repair leaves either the old or the repaired file, both valid):
        - a half-written TRAILING line (this code's crash window) is
          dropped silently, exactly as snapshots() tolerates it;
        - an undecodable MID-FILE line (a torn line buried by an append
          from a pre-round-6 build, whose snapshots() skipped torn lines
          anywhere) is dropped WITH an audit trail: the original file is
          preserved as <history>.corrupt-<n> and a warning names it.
          Without this, upgrading a legacy workdir would make the stage
          permanently unwritable — commit() calls snapshots() to allocate
          ids, and the strict read path raises on mid-file garbage (the
          round-6 review finding). Read-only callers (snapshots()/read)
          still raise on mid-file corruption they encounter first: repair
          happens only at the next WRITE, where the caller has already
          decided to move the stage forward."""
        hist = os.path.join(self.path(stage), HISTORY)
        if not os.path.exists(hist):
            return
        with open(hist) as f:
            lines = [ln for ln in f if ln.strip()]
        if not lines:
            return
        bad = []
        for i, ln in enumerate(lines):
            try:
                json.loads(ln)
            except json.JSONDecodeError:
                bad.append(i)
        if not bad:
            return
        if any(i != len(lines) - 1 for i in bad):
            import shutil
            import sys

            n = 0
            while os.path.exists(f"{hist}.corrupt-{n}"):
                n += 1
            shutil.copyfile(hist, f"{hist}.corrupt-{n}")
            print(
                f"[checkpoint] stage {stage!r}: dropped {len(bad)} undecodable "
                f"history line(s) (legacy buried torn append or corruption); "
                f"original preserved at {hist}.corrupt-{n}",
                file=sys.stderr,
            )
        keep = [ln for i, ln in enumerate(lines) if i not in set(bad)]
        tmp = hist + ".tmp"
        with open(tmp, "w") as f:
            f.writelines(ln if ln.endswith("\n") else ln + "\n" for ln in keep)
        os.replace(tmp, hist)

    @staticmethod
    def _manifest_stats(data_dir: str) -> dict:
        """Iceberg-manifest-style per-snapshot stats from the written files'
        parquet footers (metadata-only reads — no data scan, no Spark job):
        file count, total bytes, exact row count, plus the same rollup per
        partition directory for partitioned commits. Recorded in the commit
        marker so snapshots() doubles as a lineage/size audit surface AND
        the read path can plan scans from the manifest instead of listing
        directories (read(partitions=...) / the zero-row short-circuit)."""
        import pyarrow.parquet as pq

        n_files = n_rows = n_bytes = 0
        parts: dict[str, dict] = {}
        for root, _dirs, files in os.walk(data_dir):
            for fn in files:
                if not fn.endswith(".parquet"):
                    continue
                full = os.path.join(root, fn)
                rows = pq.ParquetFile(full).metadata.num_rows
                size = os.path.getsize(full)
                n_files += 1
                n_bytes += size
                n_rows += rows
                rel = os.path.relpath(root, data_dir)
                if rel != ".":  # hive partition dir(s), e.g. pred=treats
                    p = parts.setdefault(
                        rel, {"n_files": 0, "n_rows": 0, "total_bytes": 0}
                    )
                    p["n_files"] += 1
                    p["n_rows"] += rows
                    p["total_bytes"] += size
        stats = {"n_files": n_files, "n_rows": n_rows, "total_bytes": n_bytes}
        if parts:
            stats["partitions"] = dict(sorted(parts.items()))
        return stats

    def commit(
        self,
        stage: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        extra_meta: dict | None = None,
    ) -> DataFrame:
        """Write stage output as a NEW immutable snapshot, then atomically
        swap the pointer (commit point). Returns the re-read DataFrame so
        downstream stages consume the materialized table (cuts lineage like
        an Iceberg snapshot would). Concurrent readers of the previous
        snapshot are unaffected — its files are never rewritten."""
        p = self.path(stage)
        os.makedirs(p, exist_ok=True)
        self._repair_torn_tail(stage)
        self._migrate_legacy(stage)
        # allocate past the pointer, any orphaned history rows, AND any
        # snap-* directory on disk: a crash after the data write but before
        # the history append leaves a dir no metadata names — reusing its id
        # would half-overwrite it
        prev = self._pointer(stage)
        ids = [prev.get("snapshot", -1) if prev else -1]
        ids += [
            m.get("snapshot", -1)
            for m in self.snapshots(stage)
            if m is not None
        ]
        for name in os.listdir(p):
            if name.startswith("snap-") and name[5:].isdigit():
                ids.append(int(name[5:]))
        snap = max((i for i in ids if i is not None), default=-1) + 1
        data_dir = os.path.join(p, f"snap-{snap}")
        t0 = time.time()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_dir)
        meta = {
            "stage": stage,
            "snapshot": snap,
            "ts": time.time(),
            "wall_sec": round(time.time() - t0, 3),
            "schema": df.schema.json(),
            **self._manifest_stats(data_dir),
            **(extra_meta or {}),
        }
        with open(os.path.join(p, HISTORY), "a") as f:
            f.write(json.dumps(meta) + "\n")
        tmp = os.path.join(p, MARKER + ".tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(p, MARKER))  # atomic pointer swap
        return self.read(stage)

    def expire_snapshots(self, stage: str, keep_last: int = 1) -> int:
        """Retention sweep: delete all but the newest keep_last snapshots'
        data (the current snapshot is always kept). Returns count removed.
        History rows are retained (tombstoned reads raise FileNotFoundError
        — same observable behavior as an expired Iceberg snapshot)."""
        import shutil

        metas = [m for m in self.snapshots(stage) if m.get("snapshot") is not None]
        cur = self._pointer(stage)
        cur_id = cur.get("snapshot") if cur else None
        keep = {m["snapshot"] for m in metas[-max(keep_last, 1):]}
        if cur_id is not None:
            keep.add(cur_id)
        n = 0
        for m in metas:
            sid = m["snapshot"]
            d = os.path.join(self.path(stage), f"snap-{sid}")
            if sid not in keep and os.path.isdir(d):
                shutil.rmtree(d)
                n += 1
        return n

    def run_stage(
        self,
        stage: str,
        compute,
        partition_by: list[str] | None = None,
        force: bool = False,
    ) -> DataFrame:
        """compute: () -> DataFrame; skipped entirely when already
        committed (resume path). force=True re-computes into a NEW
        snapshot (the previous one stays readable via time travel)."""
        if self.is_done(stage) and not force:
            return self.read(stage)
        return self.commit(stage, compute(), partition_by)
