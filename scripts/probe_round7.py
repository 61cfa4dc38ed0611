#!/usr/bin/env python
"""Round-7 scale probe (round-6 verdict item 5): the finer blocking key.

Round 6 measured q_jaro_pairs (brand-only blocking) at part-x10 with
VERBATIM copies: exponents 1.75/1.82, inherent — under verbatim copies
every block grows 10x, candidates (and the >=threshold OUTPUT itself)
grow ~100x, and no engine runs below its output size. The production
answer named there is a finer blocking key. This probe measures it
honestly:

- Build part x10 with ATTRIBUTE DIVERSITY: copy c offsets p_partkey
  (key validity) and p_size by c*50 (sizes 1..50 -> 500 distinct).
  This is the realistic 10x corpus — new parts carry new attribute
  values, they are not byte-copies — and it is the regime blocking
  keys are designed for.
- On that data the coarse (brand) key still grows every block 10x
  (brand cardinality is fixed at 25): candidates x100, expected
  exponent ~2. The finer (brand, size) key's BLOCK SIZE stays ~16
  (block COUNT grows 10x instead): candidates x10, expected exponent
  ~1 — linear scaling from the same operator with one parameter.

Execution is noop-sink (never collect: the coarse sf1 output is ~100M
rows). Results go to PERF_NOTES.md round 7.

Usage: python scripts/probe_round7.py [--runs N]
Writes scaled data under /tmp/lh_sfprobe/sf1d (scratch, not committed).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from laser_hadoop_spark import registry
from laser_hadoop_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/tmp/lh_sfprobe/sf1d"
COPIES = 10
QUERIES = ("q_jaro_pairs", "q_jaro_blocked")


def build_part_diverse(spark) -> None:
    if os.path.exists(os.path.join(DST, "_DONE")):
        print(f"{DST} already built")
        return
    os.makedirs(DST, exist_ok=True)
    part = spark.read.parquet(f"{SRC}/part.parquet")
    k = part.agg(F.max("p_partkey")).first()[0] + 1
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    part.crossJoin(copies).withColumn(
        "p_partkey", F.col("p_partkey") + F.col("copy") * F.lit(k)
    ).withColumn(
        "p_size", F.col("p_size") + F.col("copy") * F.lit(50)
    ).drop("copy").write.mode("overwrite").parquet(f"{DST}/part.parquet")
    open(os.path.join(DST, "_DONE"), "w").write("ok\n")
    print(f"built {DST} (part x{COPIES}, p_size diversified x{COPIES})")


def time_noop(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> None:
    runs = 3
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    spark = get_spark("probe_round7")
    build_part_diverse(spark)
    specs = registry.specs()
    for name in QUERIES:  # warmup (bench.py discipline)
        specs[name].fn(spark, SRC).collect()
    print(f"{'query':18s} {'sf0.1':>8s} {'sf1d(part)':>11s} {'ratio':>7s} {'exp':>6s}")
    for name in QUERIES:
        fn = specs[name].fn
        times = {}
        for label, d in (("a", SRC), ("b", DST)):
            best = float("inf")
            for _ in range(runs):
                best = min(best, time_noop(fn(spark, d)))
            times[label] = best
        r = times["b"] / times["a"]
        print(
            f"{name:18s} {times['a']:8.3f} {times['b']:11.3f} "
            f"{r:7.2f} {math.log10(r):6.2f}"
        )


if __name__ == "__main__":
    main()
