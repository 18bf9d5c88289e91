"""Per-stage checkpointing for resumable runs.

Reference analog: the Redis memo cache (builder/builder.py:348-356) — here
replaced by durable per-stage tables: a killed job relaunches and skips every
stage whose completion marker exists (north_rule "resumable from
checkpoint"). Parquet + atomic marker stands in for Iceberg snapshot commits
in this offline sandbox; the contract (write-then-commit, idempotent re-run)
is the same.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

MARKER = "_STAGE_COMMITTED"


class CheckpointManager:
    def __init__(self, spark: SparkSession, workdir: str):
        self.spark = spark
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)

    def path(self, stage: str) -> str:
        return os.path.join(self.workdir, stage)

    def is_done(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self.path(stage), MARKER))

    def read(self, stage: str) -> DataFrame:
        """Read a committed stage. The schema recorded at commit time is
        applied explicitly: an empty stage output writes zero part-files,
        and schema inference over a fileless directory fails even though
        the stage legitimately produced 0 rows (e.g. an end-bound query
        with no matching paths)."""
        p = self.path(stage)
        marker = os.path.join(p, MARKER)
        reader = self.spark.read
        if os.path.exists(marker):
            with open(marker) as f:
                meta = json.load(f)
            if "schema" in meta:
                from pyspark.sql.types import StructType

                reader = reader.schema(StructType.fromJson(json.loads(meta["schema"])))
        return reader.parquet(p)

    def commit(
        self, stage: str, df: DataFrame, partition_by: list[str] | None = None
    ) -> DataFrame:
        """Write stage output, then atomically drop the completion marker
        (commit point). Returns the re-read DataFrame so downstream stages
        consume the materialized table (cuts lineage like an Iceberg
        snapshot would)."""
        p = self.path(stage)
        t0 = time.time()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(p)
        meta = {
            "stage": stage,
            "wall_sec": round(time.time() - t0, 3),
            "schema": df.schema.json(),
        }
        tmp = os.path.join(p, MARKER + ".tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(p, MARKER))  # atomic commit
        return self.read(stage)

    def run_stage(
        self,
        stage: str,
        compute,
        partition_by: list[str] | None = None,
        force: bool = False,
    ) -> DataFrame:
        """compute: () -> DataFrame; skipped entirely when already
        committed (resume path)."""
        if self.is_done(stage) and not force:
            return self.read(stage)
        return self.commit(stage, compute(), partition_by)
