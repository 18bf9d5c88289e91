#!/usr/bin/env python
"""Hub-skew evidence for the iterative graph ops (round-5 verdict #7).

Generates a 1M-node / ~4.15M-edge graph with 3 explicit degree-50k hubs
(pure column expressions over spark.range — no driver loops), runs
k_core(k=5), core_number and pagerank(5) each in a FRESH session with the
Spark event log enabled, and reports per-stage task-time distributions
(tasks, total, median, max, max/median ratio) parsed from the event log —
the same §0 methodology the CC at-size run used. A max/median ratio ≤ 4 on
every heavy stage is the gate; above it, the op needs a salt/AQE story.

Usage: python scripts/graph_skew_run.py [n_nodes] [out_json]
       (ops via --ops k_core,core_number,pagerank; cores via SPARK_GRAFT_CPUS)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_HUBS = 3
HUB_DEGREE = 50_000


def hub_graph(spark, n_nodes: int):
    """~4n + 3·HUB_DEGREE edges: every node i>0 gets 4 uniform back-edges
    (i, xxhash(i,r) % i) — a sparse well-mixed bulk — plus hubs 0..2 EACH
    linked to exactly HUB_DEGREE stride-selected nodes (one range row per
    (hub, spoke) pair, so each hub genuinely has the claimed degree — the
    first version split one spoke set across the 3 hubs and measured hub
    skew at a third of the documented severity). Deterministic, generated
    entirely as column expressions."""
    from pyspark.sql import functions as F

    ids = spark.range(1, n_nodes)
    bulk = None
    for r in range(4):
        part = ids.select(
            F.col("id").alias("src"),
            F.pmod(F.xxhash64("id", F.lit(r)), F.col("id")).alias("dst"),
        )
        bulk = part if bulk is None else bulk.unionByName(part)
    stride = max(1, (n_nodes - N_HUBS) // HUB_DEGREE)
    spokes = spark.range(0, N_HUBS * HUB_DEGREE).select(
        F.pmod(F.col("id"), F.lit(N_HUBS)).alias("src"),
        (F.lit(N_HUBS) + (F.col("id") / N_HUBS).cast("long") * stride).alias(
            "dst"
        ),
    ).filter(F.col("dst") < n_nodes)
    return bulk.unionByName(spokes).filter(F.col("src") != F.col("dst"))


def stage_skew(eventlog_dir: str) -> list[dict]:
    """Per-stage task-duration distribution from the event log."""
    from scripts.eventlog_stats import load_events

    # the session writes either a single app file or a rolling
    # eventlog_v2_<app>/ dir under the configured log dir — resolve to it
    entries = sorted(
        os.path.join(eventlog_dir, e) for e in os.listdir(eventlog_dir)
    )
    if entries:
        eventlog_dir = max(entries, key=os.path.getmtime)

    durations: dict[int, list[float]] = {}
    names: dict[int, str] = {}
    for ev in load_events(eventlog_dir):
        et = ev.get("Event")
        if et == "SparkListenerTaskEnd":
            ti = ev.get("Task Info") or {}
            sid = ev.get("Stage ID")
            d = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1000.0
            durations.setdefault(sid, []).append(d)
        elif et == "SparkListenerStageCompleted":
            si = ev.get("Stage Info") or {}
            names[si.get("Stage ID")] = (si.get("Stage Name") or "")[:60]
    out = []
    for sid, ds in durations.items():
        med = statistics.median(ds)
        out.append(
            {
                "stage": sid,
                "name": names.get(sid, "?"),
                "tasks": len(ds),
                "sum_s": round(sum(ds), 2),
                "median_s": round(med, 3),
                "max_s": round(max(ds), 3),
                "max_over_median": round(max(ds) / med, 2) if med > 0 else None,
            }
        )
    out.sort(key=lambda r: -r["sum_s"])
    return out


def run_op(op: str, n_nodes: int, log_base: str) -> dict:
    from robokop_build_spark.session import get_spark

    log_dir = os.path.join(log_base, op)
    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)
    spark = get_spark(
        app_name=f"graph-skew-{op}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
        },
    )
    try:
        from robokop_build_spark.operators.graph import (
            core_number,
            k_core,
            pagerank,
        )

        edges = hub_graph(spark, n_nodes)
        n_edges = edges.count()  # materialize-gen cost outside the op timing
        stats: dict = {}
        t0 = time.time()
        if op == "k_core":
            res = k_core(edges, k=5, stats=stats)
        elif op == "core_number":
            res = core_number(edges, stats=stats)
        elif op == "pagerank":
            res = pagerank(edges, iterations=5, stats=stats)
        else:
            raise SystemExit(f"unknown op {op}")
        n_out = res.count()
        wall = round(time.time() - t0, 2)
    finally:
        spark.stop()
    skew = stage_skew(log_dir)
    heavy = [s for s in skew if s["sum_s"] >= max(1.0, 0.05 * wall)]
    return {
        "op": op,
        "n_nodes": n_nodes,
        "n_edges": n_edges,
        "rounds": stats.get("rounds_run"),
        "wall_s": wall,
        "rows_out": n_out,
        "worst_heavy_ratio": max(
            (s["max_over_median"] or 0 for s in heavy), default=None
        ),
        "heavy_stages": heavy[:8],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("n_nodes", nargs="?", type=int, default=1_000_000)
    ap.add_argument("out", nargs="?", default="BENCH/graph_skew.json")
    ap.add_argument("--ops", default="k_core,core_number,pagerank")
    args = ap.parse_args()
    log_base = "/tmp/robokop_graph_skew_logs"
    results = [
        run_op(op, args.n_nodes, log_base)
        for op in args.ops.split(",")
    ]
    doc = {"n_nodes": args.n_nodes, "results": results, "ts": time.time()}
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(doc, f, indent=1)
    for r in results:
        print(
            f"{r['op']}: {r['n_edges']} edges wall={r['wall_s']}s "
            f"rounds={r['rounds']} out={r['rows_out']} "
            f"worst_heavy_max/median={r['worst_heavy_ratio']}"
        )
        for s in r["heavy_stages"][:4]:
            print(
                f"   stage {s['stage']:>4} {s['tasks']:>4}t sum={s['sum_s']:>7}s "
                f"med={s['median_s']:>7}s max={s['max_s']:>7}s "
                f"ratio={s['max_over_median']} {s['name']}"
            )


if __name__ == "__main__":
    main()
