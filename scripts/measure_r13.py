#!/usr/bin/env python
"""Round-13 optimization measurement harness (guide §1).

Same contract as measure_r12.py (best-of-N noop-sink + collect timing,
formatted-plan capture to plans/r13/<name>_<tag>.txt), plus two
round-13 additions from VERDICT_r12:

- PLAN CAPTURE THROUGH CHECKPOINTS (item 9): localCheckpoint truncates
  lineage, so a checkpoint-rooted dump hides every stage upstream of
  the checkpoint (the r12 simhash after-plan rooted at Scan
  ExistingRDD). During the capture build, DataFrame.localCheckpoint is
  wrapped to ALSO dump its input's formatted plan; the fragments are
  appended to the plan file under '=== pre-checkpoint fragment N ==='
  headers, so the audit sees the kernel stages feeding each pin.
- JOB COUNT per execution (item 3's done-criterion is "one fewer job
  per call"): counted with a SparkListener across one noop run.

Usage: python scripts/measure_r13.py [tag] [query ...]
  tag      suffix for the plan files (default "before")
  query    subset of registry names (default: bench.HEADLINE)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
try:  # Spark 4: sessions hand out the classic DataFrame subclass —
    # patching the pyspark.sql.DataFrame base would never be hit
    from pyspark.sql.classic.dataframe import DataFrame
except ImportError:  # pragma: no cover - older Spark
    from pyspark.sql import DataFrame
from laser_hadoop_spark import registry
from laser_hadoop_spark.session import get_spark, release_persisted, storage_memory_used

REPS = 3


def _fmt_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
    )
    os.makedirs(plans_dir, exist_ok=True)
    spark = get_spark("measure_r13")
    sc = spark.sparkContext
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

    def _job_count() -> int:
        # DAGScheduler.nextJobId is the total jobs ever submitted in
        # this context — a monotone counter, so a before/after diff is
        # the number of jobs one execution submitted.
        return int(sc._jsc.sc().dagScheduler().nextJobId())

    totals = {"noop": 0.0, "collect": 0.0}
    for name in names:
        fn = specs[name].fn
        sc.setJobDescription(f"measure:{name}")
        # plan capture (fresh build, pre-execution) with checkpoint
        # transparency: every localCheckpoint's INPUT plan is dumped as
        # a fragment alongside the top-level (checkpoint-rooted) plan.
        fragments: list[str] = []
        orig_ckpt = DataFrame.localCheckpoint

        def _capturing_ckpt(self, eager=True):  # noqa: ANN001
            try:
                fragments.append(_fmt_plan(self))
            except Exception:  # noqa: BLE001 - capture must never break the build
                fragments.append("<fragment capture failed>")
            return orig_ckpt(self, eager=eager)

        DataFrame.localCheckpoint = _capturing_ckpt
        try:
            df = fn(spark, sf_dir)
            plan = _fmt_plan(df)
        finally:
            DataFrame.localCheckpoint = orig_ckpt
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
            for i, frag in enumerate(fragments):
                fh.write(f"\n\n=== pre-checkpoint fragment {i} ===\n")
                fh.write(frag)
        _hygiene()
        # warmup (untimed) + job count for one noop execution
        j0 = _job_count()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        n_jobs = _job_count() - j0
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
                    "jobs": n_jobs,
                    "ckpt_fragments": len(fragments),
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
