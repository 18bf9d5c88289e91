#!/usr/bin/env python
"""Per-stage wall-clock profile of the KG pipeline (guide §1: measure
first). Monkeypatches CheckpointManager.run_stage and
DataFrame.localCheckpoint to print each stage's wall, then runs the
pipeline twice into fresh workdirs (bench.py methodology: min of two).

Usage: python scripts/profile_pipeline.py [fixture_dir] [runs]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

fixture_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/robokop_fixtures/sf1.0"
runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

from pyspark.sql import DataFrame  # noqa: E402

from robokop_build_spark.session import get_spark  # noqa: E402
from robokop_build_spark.sources import checkpoint as cp  # noqa: E402

orig_run_stage = cp.CheckpointManager.run_stage


def timed_run_stage(self, stage, compute, partition_by=None, force=False):
    t0 = time.time()
    out = orig_run_stage(self, stage, compute, partition_by, force)
    print(f"  STAGE {stage}: {time.time() - t0:.2f}s", flush=True)
    return out


cp.CheckpointManager.run_stage = timed_run_stage

from pyspark.sql.classic.dataframe import DataFrame as ClassicDF  # noqa: E402

orig_lc = ClassicDF.localCheckpoint


def timed_lc(self, eager=True):
    t0 = time.time()
    r = orig_lc(self, eager=eager)
    print(f"  LOCALCKPT: {time.time() - t0:.2f}s", flush=True)
    return r


ClassicDF.localCheckpoint = timed_lc

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark(
    app_name="profile_pipeline",
    master=f"local[{cpus}]",
    shuffle_partitions=max(int(cpus), 16),
)
spark.sparkContext.setLogLevel("ERROR")

from robokop_build_spark.plans.pipeline import run_pipeline  # noqa: E402

for i in range(runs):
    work = f"/tmp/robokop_profile_work/r{i}"
    shutil.rmtree(work, ignore_errors=True)
    t0 = time.time()
    out = run_pipeline(spark, fixture_dir, work)
    t1 = time.time()
    n = out["triples"].count()
    print(
        f"RUN {i}: {time.time() - t0:.2f}s (final count "
        f"{time.time() - t1:.2f}s) triples={n}",
        flush=True,
    )
    from robokop_build_spark.caching import release_operator_caches

    release_operator_caches()
    spark.catalog.clearCache()
