#!/usr/bin/env python
"""Diagnose the in-session slow mode (VERDICT_r10 items 1/7).

Replays bench.py's exact HEADLINE sequence (untimed warmup pass, then
best-of-3 per query) while sampling, after every query:

  - persistent-RDD count (``getPersistentRDDs``)
  - block-manager storage bytes (``storage_memory_used``)

With ``--cleanup`` the bench-side fix is applied: ``release_persisted``
after every collect. Comparing the two runs' q_jaro_pairs (and
q_product_profit / q_dup_spans) timings against their fresh-session
warm times isolates whether accumulated storage blocks are the cause.

Emits one JSON line: per-query best times, per-query storage samples,
peak storage, and total.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from laser_hadoop_spark import registry  # noqa: E402
from laser_hadoop_spark.session import (  # noqa: E402
    get_spark,
    release_persisted,
    storage_memory_used,
)


def main() -> None:
    cleanup = "--cleanup" in sys.argv
    # --pin simulates an UNLUCKY-GC session: the blocks behind every
    # query's localCheckpoint/persist are freed only when a JVM GC lets
    # the ContextCleaner run; pinning the DataFrame references models a
    # session where that never happens, so storage genuinely
    # accumulates across all 42 queries (the hypothesized slow-mode
    # precondition).
    pin = "--pin" in sys.argv
    pinned: list = []
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("diag_session_mode")
    specs = registry.specs()
    from laser_hadoop_spark.warehouse import ensure_bucketed_facts

    ensure_bucketed_facts(spark, sf_dir)
    storage: dict[str, dict[str, int]] = {}
    timings: dict[str, float] = {}
    peak = 0
    for name in bench.HEADLINE:  # untimed warmup, exactly like bench.py
        df = specs[name].fn(spark, sf_dir)
        df.collect()
        if pin:
            pinned.append(df)
        if cleanup:
            release_persisted(spark)
    for name in bench.HEADLINE:
        fn = specs[name].fn
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.collect()
            best = min(best, time.perf_counter() - t0)
            if pin:
                pinned.append(df)
            if cleanup:
                release_persisted(spark)
        timings[name] = round(best, 3)
        used = storage_memory_used(spark)
        peak = max(peak, used)
        storage[name] = {
            "persistent_rdds": spark.sparkContext._jsc.getPersistentRDDs().size(),
            "storage_mb": round(used / 1e6, 1),
        }
    print(
        json.dumps(
            {
                "cleanup": cleanup,
                "total_sec": round(sum(timings.values()), 3),
                "peak_storage_mb": round(peak / 1e6, 1),
                "queries": timings,
                "storage": storage,
            }
        )
    )


if __name__ == "__main__":
    main()
