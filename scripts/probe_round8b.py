#!/usr/bin/env python
"""Round-8 ANN scale probe: the id-only candidate restructure at 10x.

ann_lsh_topk's pinned oracle setting (n_planes=2 -> 4 buckets/table)
is documented as ORACLE-SCALE: the random candidate floor is
~n²/2^n_planes per table, so holding n_planes fixed while n grows 10x
is the quadratic regime by construction. The operator's own scale rule
(docstring: n_planes ≈ log2(n / target_bucket_rows)) says a 10x corpus
gets MORE planes so bucket size stays bounded. This probe measures the
rule as a user would apply it:

- embeddings x10 (ids offset; vectors perturbed deterministically per
  copy in one whole-stage expression, so copies don't collide into
  identical-vector buckets),
- sf0.1 (2,000 vecs) at n_planes=2 (rule: log2(2000/500) = 2) vs
  x10 (20,000 vecs) at n_planes=5 (log2(20000/600) ≈ 5),
- candidate floor: 8 tables x n²/2^planes = 8M vs 100M -> expected
  work ratio ~12.5x, exponent ~1.1 — linear-ish scaling from the same
  operator with the parameter its docstring derives.

Noop sink, warm best-of-2. Results -> PERF_NOTES round 8.
Usage: python scripts/probe_round8b.py [--runs N]
Writes scaled data under /tmp/lh_sfprobe/emb10 (scratch, not committed).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from laser_hadoop_spark.operators.similarity import ann_lsh_topk
from laser_hadoop_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/tmp/lh_sfprobe/emb10"
COPIES = 10


def build_emb10(spark) -> None:
    if os.path.exists(os.path.join(DST, "_DONE")):
        print(f"{DST} already built")
        return
    os.makedirs(DST, exist_ok=True)
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    k = emb.agg(F.max("vec_id")).first()[0] + 1
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    # deterministic per-copy perturbation: component d of copy c gets
    # +(c * (d+1) % 97) / 1000 — keeps vectors distinct across copies
    # without driver-side data generation
    perturbed = (
        emb.crossJoin(copies)
        .select(
            (F.col("vec_id") + F.col("copy") * F.lit(k)).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda x, d: x.cast("double")
                + ((F.col("copy") * (d + 1)) % 97).cast("double") / F.lit(1000.0),
            ).alias("embedding"),
            "label",
        )
    )
    perturbed.write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")
    open(os.path.join(DST, "_DONE"), "w").write("ok\n")
    print(f"built {DST} (embeddings x{COPIES}, perturbed)")


def time_noop(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> None:
    runs = 2
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    spark = get_spark("probe_round8b")
    build_emb10(spark)
    cases = [
        ("sf0.1 n=2k planes=2", f"{SRC}/embeddings.parquet", 2),
        ("x10   n=20k planes=5", f"{DST}/embeddings.parquet", 5),
    ]
    times = []
    for label, path, planes in cases:
        df = spark.read.parquet(path)
        fn = lambda: ann_lsh_topk(  # noqa: E731
            df, id_col="vec_id", vec_col="embedding", k=5,
            n_planes=planes, n_tables=8,
        )
        fn().write.mode("overwrite").format("noop").save()  # warm
        best = min(time_noop(fn()) for _ in range(runs))
        times.append(best)
        print(f"{label}: {best:.2f}s")
    r = times[1] / times[0]
    print(f"ratio {r:.2f}  exponent {math.log10(r):.2f}")


if __name__ == "__main__":
    main()
