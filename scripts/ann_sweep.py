#!/usr/bin/env python
"""IVF ANN recall/latency sweep vs the brute-force baseline.

Runs at $SPARK_GRAFT_SF_DIR (default sf0.1) over the embeddings table:
ground truth from brute_force_topk, then ivf_topk across an n_probe
grid. Reports, per configuration, warm wall-clock and recall@k
(fraction of true top-k neighbor pairs recovered). One JSON line, same
discipline as bench.py. Results recorded in PERF_NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from laser_hadoop_spark.operators.similarity import brute_force_topk, ivf_topk
from laser_hadoop_spark.session import get_spark
from laser_hadoop_spark.tables import table

K = 5
N_CELLS = 16


def pairs(df) -> set[tuple[int, int]]:
    return {(r[0], r[1]) for r in df.collect()}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ann_sweep")
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = emb.count()

    t0 = time.perf_counter()
    truth_df = brute_force_topk(
        emb,
        emb.select("vec_id", "embedding"),
        id_col="vec_id",
        vec_col="embedding",
        query_id_col="vec_id",
        query_vec_col="embedding",
        k=K,
    ).select("query_id", "vec_id")
    truth = pairs(truth_df)
    brute_s = round(time.perf_counter() - t0, 3)

    results = []
    for n_probe in (1, 2, 4, 8):
        best, got = float("inf"), None
        for _ in range(2):
            t0 = time.perf_counter()
            approx_df = ivf_topk(
                emb,
                id_col="vec_id",
                vec_col="embedding",
                k=K,
                n_cells=N_CELLS,
                n_probe=n_probe,
            ).select("id_a", "id_b")
            got = pairs(approx_df)
            best = min(best, time.perf_counter() - t0)
        recall = round(len(got & truth) / max(len(truth), 1), 4)
        results.append(
            {"n_probe": n_probe, "warm_sec": round(best, 3), "recall_at_k": recall}
        )

    print(
        json.dumps(
            {
                "metric": "ivf_ann_sweep",
                "n_vectors": n,
                "k": K,
                "n_cells": N_CELLS,
                "brute_force_sec": brute_s,
                "sweep": results,
                "sf": os.path.basename(sf_dir.rstrip("/")).replace("sf", ""),
            }
        )
    )


if __name__ == "__main__":
    main()
