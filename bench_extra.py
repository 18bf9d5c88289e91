#!/usr/bin/env python
"""Round-8 measurement harness (bench.py is FROZEN for the driver; this
file exists so optimization work can time queries in isolation, per
spark_optimization_guide.md §1.4: noop sink, per-query timing, labelled
jobs, captured plans).

Usage:
  python bench_extra.py --sf-dir /root/testdata/sf1.0 \
      --queries dedup_ngram_jaccard,dedup_minhash_lsh \
      --repeats 2 --explain-dir plans/r08 --suffix _before

Prints one JSON line per query: {"query": ..., "times": [...], "min": ...}
and (optionally) writes `<explain-dir>/<query><suffix>.txt` with the
explain("formatted") output.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", required=True, help="comma-separated query names, or 'ALL'")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--warm-dir", default="/root/testdata/sf0.01",
                    help="untimed warm-up pass dir ('' disables)")
    ap.add_argument("--kg", action="store_true", help="also time the KG pipeline build")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from robokop_build_spark.session import get_spark

    spark = get_spark(
        app_name="bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus), 16),
    )
    spark.sparkContext.setLogLevel("ERROR")

    from robokop_build_spark.caching import release_operator_caches
    from robokop_build_spark.plans.benchmark_queries import QUERIES

    names = list(QUERIES) if args.queries == "ALL" else args.queries.split(",")

    if args.warm_dir:
        for name in names:
            if name == "kg_end_to_end":
                continue
            try:
                spark.sparkContext.setJobDescription(f"warm:{name}")
                QUERIES[name](spark, args.warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as e:  # warm-up best effort
                print(f"# warm {name} failed: {e}", file=sys.stderr)
            release_operator_caches()
            spark.catalog.clearCache()

    jvm_gc = spark.sparkContext._jvm.System.gc
    results = {}
    for name in names:
        if name == "kg_end_to_end" and args.kg:
            import shutil

            from robokop_build_spark.plans.benchmark_queries import _fixture_dir_for
            from robokop_build_spark.plans.pipeline import run_pipeline

            fx = _fixture_dir_for(args.sf_dir)
            times = []
            for i in range(args.repeats):
                work = f"/tmp/robokop_bench_work/extra_r{i}"
                shutil.rmtree(work, ignore_errors=True)
                spark.sparkContext.setJobDescription(f"time:kg_end_to_end r{i}")
                t0 = time.time()
                run_pipeline(spark, fx, work)["triples"].count()
                times.append(round(time.time() - t0, 3))
                release_operator_caches()
                spark.catalog.clearCache()
                jvm_gc()
            results[name] = times
            print(json.dumps({"query": name, "times": times, "min": min(times)}), flush=True)
            continue
        times = []
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(f"time:{name} r{i}")
            t0 = time.time()
            QUERIES[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.time() - t0, 3))
            release_operator_caches()
            spark.catalog.clearCache()
            jvm_gc()
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = QUERIES[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.explain_dir, f"{name}{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)
            release_operator_caches()
            spark.catalog.clearCache()
        results[name] = times
        print(json.dumps({"query": name, "times": times, "min": min(times)}), flush=True)

    print(json.dumps({"sf_dir": args.sf_dir, "results": results}), flush=True)


if __name__ == "__main__":
    main()
