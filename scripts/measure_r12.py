#!/usr/bin/env python
"""Round-12 optimization measurement harness (guide §1).

For each bench headline query: capture .explain("formatted") to
plans/r12/<name>_<tag>.txt, time the computation with the noop sink
(guide §1.4 — isolates compute from the collect path), and time the
bench's historical collect() action, both best-of-N warm. Prints one
JSON line per query so partial runs still yield data, plus a final
summary line.

Usage: python scripts/measure_r12.py [tag] [query ...]
  tag      suffix for the plan files (default "before")
  query    subset of headline names (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from laser_hadoop_spark import registry
from laser_hadoop_spark.session import get_spark, release_persisted, storage_memory_used

REPS = 3


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")
    os.makedirs(plans_dir, exist_ok=True)
    spark = get_spark("measure_r12")
    specs = registry.specs()
    try:
        from laser_hadoop_spark.warehouse import ensure_bucketed_facts

        ensure_bucketed_facts(spark, sf_dir)
    except Exception as exc:  # noqa: BLE001
        print(json.dumps({"warehouse_error": str(exc)}), flush=True)

    def _hygiene() -> None:
        release_persisted(spark)
        if storage_memory_used(spark) > 1_000_000_000:
            spark.sparkContext._jvm.System.gc()

    totals = {"noop": 0.0, "collect": 0.0}
    for name in names:
        fn = specs[name].fn
        spark.sparkContext.setJobDescription(f"measure:{name}")
        # plan capture (fresh build, pre-execution)
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        # warmup (untimed)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        _hygiene()
        best_noop = best_collect = float("inf")
        n_rows = None
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best_noop = min(best_noop, time.perf_counter() - t0)
            _hygiene()
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).collect()
            best_collect = min(best_collect, time.perf_counter() - t0)
            n_rows = len(rows)
            del rows
            _hygiene()
        totals["noop"] += best_noop
        totals["collect"] += best_collect
        print(
            json.dumps(
                {
                    "query": name,
                    "noop_sec": round(best_noop, 3),
                    "collect_sec": round(best_collect, 3),
                    "rows": n_rows,
                }
            ),
            flush=True,
        )
    print(
        json.dumps(
            {
                "summary": True,
                "tag": tag,
                "total_noop_sec": round(totals["noop"], 3),
                "total_collect_sec": round(totals["collect"], 3),
                "n_queries": len(names),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
