#!/usr/bin/env python
"""Round-12 scale probe: Spark-side x10 exponent for the NEW
production-density ANN bench line (q_ann_lsh_prod /
ann_lsh_topk_banded), extending the PROBE_r8b precedent ("ANN 10x
probe under the operator's own n_planes rule") to the banded kernel.

Overlay (structure-preserving, the PROBE_r10/r11 discipline): a
verbatim x10 copy of the embeddings table would make every vector a
10-clique of cosine-1.0 duplicates sharing every bucket in every
table — candidate pairs x100 by construction, measuring the clique,
not the algorithm. Instead the x10 corpus is 10 copies each pushed
through a DISTINCT deterministic orthogonal rotation (QR of a
seeded gaussian): rotations preserve all within-copy cosines (each
copy's neighbor structure is isomorphic to sf0.1's), while cross-copy
pairs decorrelate to the corpus's ambient near-isotropy — exactly
what a 10x-bigger real corpus of this distribution looks like.

Both scales run under the operator's own scaling rule
(n_planes = log2(n / target_bucket_rows), 8-row buckets):
  1x: n=2,000  -> n_planes=8  (the registered q_ann_lsh_prod setting)
  10x: n=20,000 -> n_planes=11 (20000/2^11 = 9.8-row buckets)
n_tables stays 32 at both scales (recall is a quality knob, not a
cost-scaling one; holding it fixed isolates the candidate/scoring
cost curve).

Noop sink, fresh plan per run, untimed warmup, min of N runs, both
scales timed back-to-back so the RATIO is robust to ambient load
(the r11 convention). Prints log10(t10/t1).

Usage: python scripts/probe_round12.py [--runs N] [--json OUT.json]
Scratch under /tmp/lh_sfprobe (not committed).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from laser_hadoop_spark.operators.similarity import ann_lsh_topk_banded
from laser_hadoop_spark.session import get_spark, release_persisted

SRC = "/root/testdata/sf0.1"
DST = "/tmp/lh_sfprobe/emb10x"
COPIES = 10


def _build_overlay(spark) -> None:
    """10 orthogonally-rotated copies of sf0.1 embeddings, offset ids."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SRC}/embeddings.parquet")
    ids = np.array(tbl["vec_id"])
    labels = np.array(tbl["label"])
    V = np.array([list(v) for v in tbl["embedding"].to_pylist()], dtype=np.float64)
    n, dim = V.shape
    out_ids, out_labels, out_vecs = [], [], []
    for c in range(COPIES):
        rng = np.random.RandomState(1000 + c)
        q, _ = np.linalg.qr(rng.normal(size=(dim, dim)))
        rot = V @ q  # orthogonal: within-copy cosines preserved exactly
        out_ids.append(ids + c * 1_000_000)
        out_labels.append(labels)
        out_vecs.append(rot)
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "vec_id": np.concatenate(out_ids),
            "label": np.concatenate(out_labels),
            "embedding": [list(map(float, r)) for r in np.vstack(out_vecs)],
        }
    )
    spark.createDataFrame(pdf).repartition(8).write.mode("overwrite").parquet(DST)


def _time_once(spark, path: str, n_planes: int) -> float:
    emb = spark.read.parquet(path)
    t0 = time.perf_counter()
    (
        ann_lsh_topk_banded(
            emb,
            id_col="vec_id",
            vec_col="embedding",
            k=5,
            n_planes=n_planes,
            n_tables=32,
        )
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    el = time.perf_counter() - t0
    release_persisted(spark)
    return el


def main() -> None:
    runs = 3
    json_out = None
    args = sys.argv[1:]
    if "--runs" in args:
        runs = int(args[args.index("--runs") + 1])
    if "--json" in args:
        json_out = args[args.index("--json") + 1]
    spark = get_spark("probe12", shuffle_partitions=32)
    os.makedirs("/tmp/lh_sfprobe", exist_ok=True)
    _build_overlay(spark)
    # untimed warmup at both scales (JIT + HOF codegen)
    _time_once(spark, f"{SRC}/embeddings.parquet", 8)
    _time_once(spark, DST, 11)
    t1 = min(_time_once(spark, f"{SRC}/embeddings.parquet", 8) for _ in range(runs))
    t10 = min(_time_once(spark, DST, 11) for _ in range(runs))
    exp = math.log10(t10 / t1)
    result = {
        "query": "q_ann_lsh_prod (ann_lsh_topk_banded, own n_planes rule)",
        "t_1x_sec": round(t1, 3),
        "t_10x_sec": round(t10, 3),
        "exponent": round(exp, 3),
        "n_1x": 2000,
        "n_10x": 20000,
        "n_planes": {"1x": 8, "10x": 11},
        "n_tables": 32,
        "runs": runs,
    }
    print(json.dumps(result))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
