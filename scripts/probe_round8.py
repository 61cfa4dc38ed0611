#!/usr/bin/env python
"""Round-8 scale probe: calendar-bounded quadratic claims under 10x facts.

Three bench/window queries carry a "the quadratic stage is bounded by
the CALENDAR (or a constant bin table), never fact rows" claim in their
docstrings:

- q_matrix_profile (X301): n^2/2 diagonal relation over the daily
  revenue series — n is the date-domain size, so 10x orders on the
  SAME calendar must leave the quadratic stage's size unchanged;
- q_hodges_lehmann (X357): Walsh pairs on the daily aggregate — same
  invariant;
- q_isotonic_fit (X295): fact-scale two-pass rank feeding a 10-row bin
  table; everything past the bins is constant-size.

This probe tests those claims the honest way: orders x10 / events x10
with MORE ROWS PER DAY (keys offset for validity, dates/timestamps
UNCHANGED — the realistic growth regime for a business at fixed
history length; contrast probe_round7, which diversified attributes).
Expected: wall-clock exponent ~<=1 — the only growing stage is the
daily/decile partial aggregate scan; an exponent near 2 would falsify
the boundedness claim and mark a 100 TB scale-killer.

Execution is noop-sink, fresh plan per run (bench.py discipline).
Results go to PERF_NOTES.md round 8.

Usage: python scripts/probe_round8.py [--runs N]
Writes scaled data under /tmp/lh_sfprobe/sf1cal (scratch, not committed).
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
DST = "/tmp/lh_sfprobe/sf1cal"
COPIES = 10
QUERIES = ("q_matrix_profile", "q_hodges_lehmann", "q_isotonic_fit")


def build_calendar_fixed(spark) -> None:
    if os.path.exists(os.path.join(DST, "_DONE")):
        print(f"{DST} already built")
        return
    os.makedirs(DST, exist_ok=True)
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    k = orders.agg(F.max("o_orderkey")).first()[0] + 1
    orders.crossJoin(copies).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.col("copy") * F.lit(k)
    ).drop("copy").write.mode("overwrite").parquet(f"{DST}/orders.parquet")
    events = spark.read.parquet(f"{SRC}/events.parquet")
    ek = events.agg(F.max("event_id")).first()[0] + 1
    events.crossJoin(copies).withColumn(
        "event_id", F.col("event_id") + F.col("copy") * F.lit(ek)
    ).drop("copy").write.mode("overwrite").parquet(f"{DST}/events.parquet")
    open(os.path.join(DST, "_DONE"), "w").write("ok\n")
    print(f"built {DST} (orders/events x{COPIES}, calendar UNCHANGED)")


def time_noop(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> None:
    runs = 3
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    spark = get_spark("probe_round8")
    build_calendar_fixed(spark)
    specs = registry.specs()
    for name in QUERIES:  # warmup (bench.py discipline)
        specs[name].fn(spark, SRC).collect()
    for name in QUERIES:
        t_small = min(time_noop(specs[name].fn(spark, SRC)) for _ in range(runs))
        t_big = min(time_noop(specs[name].fn(spark, DST)) for _ in range(runs))
        exp = math.log(t_big / t_small) / math.log(COPIES)
        print(
            f"{name}: sf0.1 {t_small:.2f}s -> x{COPIES}-rows-same-calendar "
            f"{t_big:.2f}s  ratio {t_big / t_small:.2f}  EXPONENT {exp:.2f}"
        )


if __name__ == "__main__":
    main()
