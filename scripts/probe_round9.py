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
    """Lazy prefixes of curation_plan (window dedup strategy)."""
    from pyspark.sql import Window

    from laser_hadoop_spark.operators import text as T

    d = table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    withfp = d.withColumn("__fp", F.xxhash64(norm))
    keep = F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("__fp"))
    s1 = withfp.withColumn("__keep", keep).where("__keep").drop("__fp", "__keep")
    length_ok = (F.length("text") >= 50) & (F.length("text") <= 10_000)
    with_words = s1.withColumn("__w", T.words("text"))
    w = F.col("__w")
    stop_ok = T.marker_ratio("text", words_col=w) >= 0.02
    punct_ok = T.punct_ratio("text") <= 0.2
    s2 = with_words.where(length_ok & stop_ok & punct_ok).drop("__w")
    from laser_hadoop_spark.plans.curation import curation_plan

    s3 = curation_plan(d)
    full = registry.get("q_curation_pipeline").fn(spark, sf_dir)
    return {
        "s1_fingerprint_dedup": s1.select("doc_id"),
        "s2_quality_filters": s2.select("doc_id"),
        "s3_langid_filter": s3.select("doc_id", "predicted_lang"),
        "s4_full_query": full,
    }


def _pretrain_stages(spark, sf_dir):
    """Lazy prefixes of pretrain_plan (corpus = source<>src0)."""
    from laser_hadoop_spark.operators.dedup import contamination_overlap
    from laser_hadoop_spark.operators.sampling import quota_sample
    from laser_hadoop_spark.operators.text import token_chunks
    from laser_hadoop_spark.plans.curation import curation_plan

    d = table(spark, sf_dir, "documents")
    corpus = d.where(F.col("source") != "src0")
    bench = d.where(F.col("source") == "src0")
    curated = curation_plan(corpus)
    contaminated = contamination_overlap(
        curated, bench, id_col="doc_id", text_col="text", min_overlap=0.2
    ).select("doc_id")
    clean = curated.join(contaminated, on="doc_id", how="left_anti")
    sampled = quota_sample(
        clean, strata_col="source", n_per_stratum=20, order_col="doc_id"
    )
    chunks = sampled.select(
        "doc_id",
        "source",
        F.explode(token_chunks("text", size=64, stride=48)).alias("c"),
    )
    full = registry.get("q_pretrain_pipeline").fn(spark, sf_dir)
    return {
        "p1_curation": curated.select("doc_id"),
        "p2_decontaminate": clean.select("doc_id"),
        "p3_quota_sample": sampled.select("doc_id"),
        "p4_chunking": chunks.select("doc_id"),
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
