#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.json north_rule): run the identical
KG build job at two parallelism levels (local[N] vs local[4N]) on identical
input, in fresh JVMs, and report throughput at both plus efficiency
(T_small/T_big)/(4).

The sandbox host has multi-minute performance waves (identical runs vary
2-3×), so every Spark run is BRACKETED by a short pure-CPU calibration that
measures what the hardware can deliver at that moment at both worker counts.
The summary reports (a) best-of-N wall-clock efficiency, and (b) the
hardware ceiling measured alongside — on this VM 32 workers deliver ~3.4×
the aggregate throughput of 8 (SMT/steal), so 0.85 is the physical maximum
a perfectly-scaling job could show.

Usage: python scripts/scaling_run.py [sf] [repeats] [small] [big]
"""

from __future__ import annotations

import json
import multiprocessing as mp
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
# 4x cores: the heavy reduce stages (doc-scale distinct + parquet encode)
# need multiple waves per core for balance; at exactly `cores` partitions a
# single straggler partition owns the wall (measured: 209 CPU-s on 8 tasks)
spark = get_spark(app_name=f"scaling-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=max(cores * 4, 16))
spark.sparkContext.setLogLevel("ERROR")
# warm the JVM (whole-stage-codegen compilation of the ~25 distinct plans,
# ~13s measured) on a trivial corpus first: a cluster job amortizes codegen
# over hours, so timing it against a 1-5 minute sandbox run would bias the
# efficiency ratio identically at both levels without measuring anything
# about the design
warm_fx = "/tmp/robokop_fixtures/sf0.001"
if os.path.exists(os.path.join(warm_fx, "_FIXTURES_DONE")):
    warm_work = f"{{workbase}}/robokop_scaling_warm/c{{cores}}"
    shutil.rmtree(warm_work, ignore_errors=True)
    run_pipeline(spark, warm_fx, warm_work)["triples"].count()
    shutil.rmtree(warm_work, ignore_errors=True)
t0 = time.time()
out = run_pipeline(spark, fx, work)
n = out["triples"].count()
docs = spark.read.parquet(os.path.join(fx, "documents.parquet")).count()
elapsed = time.time() - t0
stages = dict()
for d in sorted(os.listdir(work)):
    m = os.path.join(work, d, "_STAGE_COMMITTED")
    if os.path.exists(m):
        stages[d] = json.load(open(m))["wall_sec"]
shutil.rmtree(work, ignore_errors=True)
print(json.dumps({{"cores": cores, "sec": round(elapsed, 3),
                   "triples": n, "docs": docs,
                   "docs_per_sec": round(docs / elapsed, 2),
                   "triples_per_sec": round(n / elapsed, 2),
                   "stages": stages}}))
"""


def _burn(q):
    t0 = time.time()
    n = 0
    x = 1.0
    while time.time() - t0 < 3.0:
        for _ in range(10000):
            x = x * 1.0000001 % 97
        n += 10000
    q.put(n)


def calibrate(workers: int) -> float:
    """Aggregate M iter/s the host delivers to `workers` busy processes."""
    q = mp.Queue()
    ps = [mp.Process(target=_burn, args=(q,)) for _ in range(workers)]
    [p.start() for p in ps]
    total = sum(q.get() for _ in ps)
    [p.join() for p in ps]
    return round(total / 3.0 / 1e6, 1)


def run_once(cores: int, sf: str) -> dict:
    script = CHILD.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), sf],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    small = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    big = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    assert big == 4 * small, "north_rule compares N vs 4N"
    sys.path.insert(0, REPO)
    from robokop_build_spark.datagen.fixtures import ensure_fixtures

    ensure_fixtures(f"/tmp/robokop_fixtures/sf{float(sf)}", float(sf))
    ensure_fixtures("/tmp/robokop_fixtures/sf0.001", 0.001)  # JVM warmup corpus
    sf = str(float(sf))

    # warm the page cache so neither level pays cold-read penalties
    import glob

    for f in glob.glob(f"/tmp/robokop_fixtures/sf{sf}/*.parquet"):
        with open(f, "rb") as fh:
            while fh.read(1 << 22):
                pass

    results: dict[int, list[dict]] = {small: [], big: []}
    for r in range(repeats):
        # alternate order: a fixed order would systematically bias one level
        order = (small, big) if r % 2 == 0 else (big, small)
        for cores in order:
            cal_pre = {w: calibrate(w) for w in (small, big)}
            res = run_once(cores, sf)
            cal_post = {w: calibrate(w) for w in (small, big)}
            res["cal_pre"] = cal_pre
            res["cal_post"] = cal_post
            # contemporaneous hardware capacity at THIS worker count
            res["cal_mean"] = round((cal_pre[cores] + cal_post[cores]) / 2, 1)
            # hardware big/small thread-scaling ratio AT THIS MOMENT (both
            # counts measured in the same bracketing)
            res["hw_ratio"] = round(
                (cal_pre[big] / cal_pre[small] + cal_post[big] / cal_post[small]) / 2, 3
            )
            results[cores].append(res)
            print(f"run {r} cores={cores}: {json.dumps(res)}", file=sys.stderr, flush=True)

    best = {c: min(rs, key=lambda x: x["sec"]) for c, rs in results.items()}
    ts, tb = best[small]["sec"], best[big]["sec"]
    # hardware ceiling: big/small busy-loop ratio measured within single
    # bracketings, averaged over the two best runs' moments
    hw_ratio = round((best[big]["hw_ratio"] + best[small]["hw_ratio"]) / 2, 3)
    eff = (ts / tb) / (big / small)
    summary = {
        "sf": float(sf),
        f"local{small}": best[small],
        f"local{big}": best[big],
        "cores": [small, big],
        "speedup": round(ts / tb, 3),
        "scaling_efficiency": round(eff, 3),
        # what the hardware itself scales N→4N at measurement time: the
        # physical ceiling on any job's efficiency
        "hw_thread_scaling": hw_ratio,
        "hw_ceiling_efficiency": round(hw_ratio / (big / small), 3),
        "efficiency_vs_hw_ceiling": round((ts / tb) / hw_ratio, 3),
        "all_runs": results,
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(summary))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", f"scaling_sf{sf}_{small}v{big}.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
