#!/usr/bin/env python
"""Round-6 scale probes (round-5 verdict item 4, the two cases the main
sf_probe.py construction cannot measure):

1. q_jaro_pairs / q_damerau_pairs with PART scaled 10x (sf_probe.py
   copies part as-is, so brand blocks would not grow there). Blocks
   grow 10x => candidate pairs grow 100x — this measures the post-fix
   (dictionary-kernel) plan against its inherent bound. Execution is
   noop-sink (df.write.format("noop")), not collect(): the sf1 output
   is ~117M rows (the OUTPUT is ~15% of candidates — quadratic in
   block size by the query's own semantics) and must not be pulled to
   the driver just to time the plan.

2. ibs_kinship (X328) cohort scaling: melted-VCF frames generated
   in-memory at S=40 and S=126 samples (pair count ~10x) over a fixed
   20k-variant panel. The operator is DECLARED cohort-quadratic (so is
   PLINK --genome, its reference surface); the probe measures the
   constant and confirms time tracks S^2 * V, the documented bound.

Prints one table; results go to PERF_NOTES.md (round 6 section).
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
DST = "/tmp/lh_sfprobe/sf1p"
COPIES = 10


def build_part_scaled(spark) -> None:
    if os.path.exists(os.path.join(DST, "_DONE")):
        print(f"{DST} already built")
        return
    os.makedirs(DST, exist_ok=True)
    for t in (
        "region nation customer supplier orders lineitem events "
        "documents embeddings"
    ).split():
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )
    part = spark.read.parquet(f"{SRC}/part.parquet")
    k = part.agg(F.max("p_partkey")).first()[0] + 1
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    part.crossJoin(copies).withColumn(
        "p_partkey", F.col("p_partkey") + F.col("copy") * F.lit(k)
    ).drop("copy").write.mode("overwrite").parquet(f"{DST}/part.parquet")
    open(os.path.join(DST, "_DONE"), "w").write("ok\n")
    print(f"built {DST} (part x{COPIES})")


def time_noop(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def probe_string_joins(spark, runs: int) -> None:
    specs = registry.specs()
    print(f"{'query':22s} {'sf0.1':>8s} {'sf1(part)':>10s} {'ratio':>7s} {'exp':>6s}")
    for name in ("q_jaro_pairs", "q_damerau_pairs"):
        fn = specs[name].fn
        times = {}
        for label, d in (("a", SRC), ("b", DST)):
            best = float("inf")
            for _ in range(runs):
                best = min(best, time_noop(fn(spark, d)))
            times[label] = best
        r = times["b"] / times["a"]
        print(
            f"{name:22s} {times['a']:8.3f} {times['b']:10.3f} "
            f"{r:7.2f} {math.log10(r):6.2f}"
        )


def melted_vcf(spark, n_samples: int, n_variants: int):
    """Deterministic melted-VCF long frame: (chr, pos, sample_id, gt).
    Genotype from a hash so every cell is stable across runs; ~2%
    missing ('./.') to exercise the pairwise-complete path."""
    v = spark.range(n_variants).select(
        (F.col("id") % 22 + 1).cast("string").alias("chr"),
        (F.col("id") * 37 + 11).alias("pos"),
    )
    s = spark.range(n_samples).select(
        F.concat(F.lit("S"), F.col("id")).alias("sample_id")
    )
    h = F.abs(F.xxhash64("chr", "pos", "sample_id"))
    return v.crossJoin(s).select(
        "chr",
        "pos",
        "sample_id",
        F.when(h % 50 == 0, "./.")
        .when(h % 4 == 0, "1/1")
        .when(h % 4 == 1, "0/1")
        .otherwise("0/0")
        .alias("gt"),
    )


def probe_kinship(spark, runs: int) -> None:
    from laser_hadoop_spark.operators.genetics import ibs_kinship

    n_variants = 20000
    print(f"{'cohort':>8s} {'pairs':>8s} {'sec':>8s} {'sec/(S^2 V) e-9':>16s}")
    times = {}
    for n_s in (40, 126):
        df = melted_vcf(spark, n_s, n_variants)
        best = float("inf")
        for _ in range(runs):
            best = min(best, time_noop(ibs_kinship(df)))
        times[n_s] = best
        pairs = n_s * (n_s - 1) // 2
        const = best / (n_s * n_s * n_variants) * 1e9
        print(f"{n_s:8d} {pairs:8d} {best:8.3f} {const:16.3f}")
    r = times[126] / times[40]
    # pair ratio 126*125 / (40*39) = 10.1x
    print(f"pair-count ratio 10.1x -> time ratio {r:.2f} "
          f"(exponent vs pairs {math.log(r) / math.log(10.1):.2f})")


def main() -> None:
    runs = 3
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    spark = get_spark("probe_round6")
    build_part_scaled(spark)
    # warmup (bench.py discipline)
    specs = registry.specs()
    for name in ("q_jaro_pairs", "q_damerau_pairs"):
        specs[name].fn(spark, SRC).collect()
    probe_string_joins(spark, runs)
    probe_kinship(spark, runs)


if __name__ == "__main__":
    main()
