#!/usr/bin/env python
"""IVF at size under the recall-calibrated probe rule (round 6).

The calibration (similarity.ivf_calibrate_nprobe) targets recall@5 ≥ 0.9
and reports the scan fraction that costs. This experiment measures what
that rule DOES at 640k vectors on two corpora:

- random: the driver-shaped unit gaussians (no cluster structure) — the
  honest worst case, where 0.9 recall forces a dense scan and IVF's win
  over brute force shrinks to the norm/argmax bookkeeping;
- clustered: 640k vectors drawn from 512 gaussian clusters (what real
  embedding tables look like) — the same rule picks a small nprobe and
  prunes most of the corpus at the same recall target.

Both runs time ivf_topk vs brute_force_topk for 100 queries (k=5) and
measure ACTUAL recall of IVF against the brute-force truth. Output:
BENCH/ivf_at_size.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RANDOM_DIR = "/tmp/robokop_driver/sf32.0"
CLUSTERED_DIR = "/tmp/robokop_ivf_clustered"
N_VECS = 640_000
DIM = 64
N_CLUSTERS = 512
N_QUERIES = 100


def ensure_clustered() -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(CLUSTERED_DIR, "embeddings.parquet")
    if os.path.exists(path):
        return CLUSTERED_DIR
    os.makedirs(CLUSTERED_DIR, exist_ok=True)
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1)[:, None]
    assign = rng.integers(0, N_CLUSTERS, N_VECS)
    X = centers[assign] + 0.25 * rng.standard_normal((N_VECS, DIM))
    X /= np.linalg.norm(X, axis=1)[:, None]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(N_VECS), pa.int64()),
                "embedding": pa.array(
                    [row for row in X.astype(np.float32)],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(assign.astype("int32"), pa.int32()),
            }
        ),
        path,
        # small row groups keep the single file SPLITTABLE: one default
        # 640k-row group = one scan task regardless of cores (the
        # row-group-splittability trap — measured 1079s vs 139s brute)
        row_group_size=20_000,
    )
    return CLUSTERED_DIR


def run_corpus(spark, sf_dir: str, tag: str) -> dict:
    from pyspark.sql import functions as F

    from robokop_build_spark.operators import similarity as S
    from robokop_build_spark.plans.benchmark_queries import _ivf_params_for

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = emb.filter(F.col("vec_id") < N_QUERIES)

    t0 = time.time()
    cents, nprobe, cal_recall, scan_frac = _ivf_params_for(sf_dir)
    train_s = round(time.time() - t0, 2)

    # the production path: exact (corpus-truth) calibration — one
    # distributed brute pass for ~128 hash-strided queries + one
    # assignment aggregate, then the TRUE recall curve driver-side
    t0 = time.time()
    nprobe_x, recall_x, scan_x = S.ivf_calibrate_nprobe_exact(
        emb, cents, k=5, n_rows=N_VECS
    )
    exact_cal_s = round(time.time() - t0, 2)

    t0 = time.time()
    brute_rows = S.brute_force_topk(emb, q, k=5).collect()
    brute_s = round(time.time() - t0, 2)
    truth = {(r["query_id"], r["neighbor_id"]) for r in brute_rows}

    def measure(npb):
        t0 = time.time()
        rows = S.ivf_topk(emb, q, cents, k=5, nprobe=npb).collect()
        sec = round(time.time() - t0, 2)
        got = {(r["query_id"], r["neighbor_id"]) for r in rows}
        return sec, round(len(truth & got) / len(truth), 4)

    ivf_s, recall_sample = measure(nprobe)
    ivf_x_s, recall_exact = measure(nprobe_x)

    out = {
        "corpus": tag,
        "n_vecs": N_VECS,
        "nlist": len(cents),
        "sample_cal": {
            "nprobe": nprobe,
            "est_recall": round(cal_recall, 4),
            "est_scan": round(scan_frac, 4),
            "measured_recall_at_5": recall_sample,
            "ivf_s": ivf_s,
            "train_calibrate_s": train_s,
        },
        "exact_cal": {
            "nprobe": nprobe_x,
            "true_recall": round(recall_x, 4),
            "scan": round(scan_x, 4),
            "measured_recall_at_5": recall_exact,
            "ivf_s": ivf_x_s,
            "calibrate_s": exact_cal_s,
        },
        "brute_s": brute_s,
        "speedup_vs_brute_exact_cal": round(brute_s / ivf_x_s, 2),
    }
    print(json.dumps(out))
    return out


def main() -> None:
    from robokop_build_spark.datagen.driver_tables import ensure_driver_tables_spark
    from robokop_build_spark.session import get_spark

    spark = get_spark(app_name="ivf-at-size")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_driver_tables_spark(spark, RANDOM_DIR, 32.0)
    results = [
        run_corpus(spark, ensure_clustered(), "clustered-512"),
        run_corpus(spark, RANDOM_DIR, "random-gaussian"),
    ]
    with open(os.path.join(REPO, "BENCH", "ivf_at_size.json"), "w") as f:
        json.dump({"results": results, "ts": time.time()}, f, indent=1)


if __name__ == "__main__":
    main()
