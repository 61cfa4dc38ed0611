#!/usr/bin/env python
"""Round-9 scale probe (VERDICT_r08 item 5): the two composite
production pipelines at corpus x10.

q_curation_pipeline and q_pretrain_pipeline are the operators a real
100 TB user runs end-to-end; ANN/jaro/simhash/dup-spans all carry
measured scaling exponents, these two did not. This probe times BOTH
pipelines and their internal stages at sf0.1 and at the 10x corpus
(scripts/sf_probe.py's build: documents copied 10x under offset ids —
a ~90%-duplicated corpus, the dedup stage's realistic worst case), and
prints per-stage wall times plus the end-to-end exponent
log10(t_10x / t_1x). 1.0 = linear at fixed parallelism; super-linear
stages are named by their deltas.

Stage slicing mirrors the composition exactly (plans/curation.py,
plans/pretrain.py): each listed stage is the lazy prefix of the
pipeline up to and including that stage, executed to a noop sink (no
driver transfer in the measurement).

Usage: python scripts/probe_round9.py [--runs N] [--json OUT.json]
Writes the 10x data under /tmp/lh_sfprobe/sf1 (scratch, not committed).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from laser_hadoop_spark import registry
from laser_hadoop_spark.session import get_spark
from laser_hadoop_spark.tables import table

import sf_probe  # noqa: E402  (scripts/ sibling: corpus builder)

SRC = sf_probe.SRC
DST = sf_probe.DST


def _curation_stages(spark, sf_dir):
    """Lazy prefixes of curation_plan, from the plan module itself
    (ADVICE r9: the hand-duplicated stage slices here would silently
    drift from plans/curation.py; curation_stage_prefixes is now the
    single construction site and curation_plan returns its last
    prefix, so s3 IS the registered pipeline's core by construction)."""
    from laser_hadoop_spark.plans.curation import curation_stage_prefixes

    d = table(spark, sf_dir, "documents")
    st = curation_stage_prefixes(d)
    full = registry.get("q_curation_pipeline").fn(spark, sf_dir)
    return {
        "s1_fingerprint_dedup": st["s1_fingerprint_dedup"].select("doc_id"),
        "s2_quality_filters": st["s2_quality_filters"].select("doc_id"),
        "s3_langid_filter": st["s3_langid_filter"].select(
            "doc_id", "predicted_lang"
        ),
        "s4_full_query": full,
    }


def _pretrain_stages(spark, sf_dir):
    """Lazy prefixes of pretrain_plan, from the plan module itself
    (ADVICE r9 — see _curation_stages; pretrain_plan is assembled from
    the same pretrain_stage_prefixes dict probed here)."""
    from laser_hadoop_spark.plans.pretrain import pretrain_stage_prefixes

    d = table(spark, sf_dir, "documents")
    corpus = d.where(F.col("source") != "src0")
    bench = d.where(F.col("source") == "src0")
    st = pretrain_stage_prefixes(corpus, bench)
    full = registry.get("q_pretrain_pipeline").fn(spark, sf_dir)
    return {
        "p1_curation": st["p1_curation"].select("doc_id"),
        "p2_decontaminate": st["p2_decontaminate"].select("doc_id"),
        "p3_quota_sample": st["p3_quota_sample"].select("doc_id"),
        "p4_chunking": st["p4_chunking"].select("doc_id"),
        "p5_full_query": full,
    }


def _time_noop(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> None:
    runs = 3
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]
    spark = get_spark("probe_round9")
    sf_probe.build(spark)

    results: dict[str, dict] = {}
    for pipeline, stage_fn in (
        ("q_curation_pipeline", _curation_stages),
        ("q_pretrain_pipeline", _pretrain_stages),
    ):
        print(f"\n== {pipeline} ==")
        print(f"{'stage':24s} {'sf0.1':>8s} {'10x':>8s} {'ratio':>7s} {'exp':>6s}")
        stages: dict[str, dict] = {}
        for label in stage_fn(spark, SRC):
            times = {}
            for scale, d in (("sf0.1", SRC), ("sf1", DST)):
                df = stage_fn(spark, d)[label]
                _time_noop(df)  # warmup
                times[scale] = min(_time_noop(stage_fn(spark, d)[label]) for _ in range(runs))
            ratio = times["sf1"] / times["sf0.1"]
            exp = math.log10(ratio)
            stages[label] = {
                "sf0.1_sec": round(times["sf0.1"], 3),
                "x10_sec": round(times["sf1"], 3),
                "ratio": round(ratio, 2),
                "exponent": round(exp, 2),
            }
            print(
                f"{label:24s} {times['sf0.1']:8.3f} {times['sf1']:8.3f} "
                f"{ratio:7.2f} {exp:6.2f}"
            )
        results[pipeline] = stages
    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {
                    "probe": "round9 composite pipelines at corpus x10",
                    "corpus": "sf_probe 10-copy (documents ~90% duplicated)",
                    "runs": runs,
                    "pipelines": results,
                },
                f,
                indent=1,
            )
            f.write("\n")
        print(f"\nwrote {json_out}")


if __name__ == "__main__":
    main()
