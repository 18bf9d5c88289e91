#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.json north_rule): run the identical
KG build job at two parallelism levels (local[8] vs local[32]) on identical
input, in fresh JVMs, and report throughput at both plus efficiency
(T_small/T_big)/(32/8). Results go into BENCH/BASELINE.md.

Usage: python scripts/scaling_run.py [sf] [repeats]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from robokop_build_spark.session import get_spark
from robokop_build_spark.plans.pipeline import run_pipeline

cores = int(sys.argv[1])
sf = sys.argv[2]
fx = f"/tmp/robokop_fixtures/sf{{sf}}"
workbase = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
work = f"{{workbase}}/robokop_scaling_work/c{{cores}}"
shutil.rmtree(work, ignore_errors=True)
spark = get_spark(app_name=f"scaling-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=max(cores, 8))
spark.sparkContext.setLogLevel("ERROR")
t0 = time.time()
out = run_pipeline(spark, fx, work)
n = out["triples"].count()
docs = spark.read.parquet(os.path.join(fx, "documents.parquet")).count()
elapsed = time.time() - t0
shutil.rmtree(work, ignore_errors=True)
print(json.dumps({{"cores": cores, "sec": round(elapsed, 3),
                   "triples": n, "docs": docs,
                   "docs_per_sec": round(docs / elapsed, 2),
                   "triples_per_sec": round(n / elapsed, 2)}}))
"""


def run_once(cores: int, sf: str) -> dict:
    script = CHILD.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), sf],
        capture_output=True, text=True, timeout=1800, cwd=REPO,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    small = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    big = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    assert big == 4 * small, "north_rule compares N vs 4N"
    # ensure fixtures exist before timing
    sys.path.insert(0, REPO)
    from robokop_build_spark.datagen.fixtures import ensure_fixtures

    ensure_fixtures(f"/tmp/robokop_fixtures/sf{float(sf)}", float(sf))
    sf = str(float(sf))

    # warm the page cache so neither level pays cold-read penalties
    import glob

    for f in glob.glob(f"/tmp/robokop_fixtures/sf{sf}/*.parquet"):
        with open(f, "rb") as fh:
            while fh.read(1 << 22):
                pass

    results: dict[int, list[dict]] = {small: [], big: []}
    for r in range(repeats):
        # alternate order: the sandbox host has multi-minute performance
        # waves, so a fixed order would systematically bias one level
        order = (small, big) if r % 2 == 0 else (big, small)
        for cores in order:
            res = run_once(cores, sf)
            results[cores].append(res)
            print(f"run {r} cores={cores}: {res}", file=sys.stderr)

    best = {c: min(rs, key=lambda x: x["sec"]) for c, rs in results.items()}
    ts, tb = best[small]["sec"], best[big]["sec"]
    eff = (ts / tb) / (big / small)
    summary = {
        "sf": float(sf),
        f"local{small}": best[small],
        f"local{big}": best[big],
        "cores": [small, big],
        "speedup": round(ts / tb, 3),
        "scaling_efficiency": round(eff, 3),
        "all_runs": results,
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(summary))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", f"scaling_sf{sf}_{small}v{big}.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
