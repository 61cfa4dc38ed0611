#!/usr/bin/env python
"""Round-10 scale probe (VERDICT_r09 item 5): Spark-side x10 exponents
for the three heaviest pair-generating queries in the sf0.1 sweep —
q_itemset_triples, q_hamming_neighbors, q_prefix_filter_pairs. Most of
their sweep wall-clock is DuckDB oracle time; this probe isolates the
SPARK side (noop sink, no driver transfer, fresh plan per run) at
sf0.1 vs a 10x corpus and prints log10(t_10x / t_1x) per query.

Corpora:
- q_itemset_triples (lineitem x3 self-join per order) runs against
  scripts/sf_probe.py's standard 10x build (orders/lineitem key-offset
  x10; documents verbatim x10 -> dense duplicate cliques, the dedup
  worst case).
- q_hamming_neighbors blocks on customer NAMES, and sf_probe copies
  customer AS-IS; a dedicated overlay scales customer x10 with a
  2-char per-copy name prefix (str(copy) * 2: "00", "11", ... "99") so
  cross-copy name pairs sit at levenshtein 2 — OUT of the <=1
  neighborhood — and the x10 corpus replicates the sf0.1 neighbor
  structure 10x instead of planting artificial 10-cliques. (Verbatim
  copies would make every name a clique of distance-0 neighbors: the
  OUTPUT grows quadratically in clique size by definition, which
  measures the answer's size, not the algorithm.)
- q_prefix_filter_pairs against the VERBATIM 10x corpus is measured
  ONCE and then deliberately NOT probed end-to-end: every document is
  a 10-clique of exact duplicates, so the true near-dup pair set —
  the query's OUTPUT — is itself ~x100, and PPJoin's candidate
  generation is sum(df_t^2), quadratic under the synthetic corpus's
  FIXED vocabulary (measured: >35 min wall for one 10x run even after
  the r10 positional-filter + triangle-sharding fixes took sf0.1 from
  125.9 s to 28.6 s). The production discipline this engine documents
  (plans/curation.py: EXACT dedup is stage 1, near-dup runs after)
  makes that regime unreachable, so the probe measures the
  PRODUCTION-ORDER shape instead: fingerprint_dedup -> 
  prefix_filter_pairs at both scales ("prefix_dedup_first"). MinHash-
  LSH banding (q_dedup_near / q_ann_lsh) remains the corpus-scale
  near-dup path; PPJoin is the exactly-verified bounded-corpus
  sibling.

Usage: python scripts/probe_round10.py [--runs N] [--json OUT.json]
Scratch under /tmp/lh_sfprobe (not committed).
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
from laser_hadoop_spark.tables import TABLE_NAMES

import sf_probe  # noqa: E402  (scripts/ sibling: standard 10x builder)

SRC = sf_probe.SRC
DST = sf_probe.DST
CUST_DST = "/tmp/lh_sfprobe/sf1cust"
COPIES = sf_probe.COPIES

# probe name -> (dataframe builder, the 10x directory that scales it)
def _registered(name):
    def build(spark, sf_dir):
        return registry.specs()[name].fn(spark, sf_dir)

    return build


def _prefix_dedup_first(spark, sf_dir):
    """The production-order shape: exact dedup BEFORE the similarity
    join (plans/curation.py stage order), composed from the same
    operators the registered queries use."""
    from laser_hadoop_spark.operators.dedup import (
        fingerprint_dedup,
        prefix_filter_pairs,
    )
    from laser_hadoop_spark.tables import table

    d = fingerprint_dedup(table(spark, sf_dir, "documents"))
    return prefix_filter_pairs(d, threshold_bp=7000)


PROBE = {
    "q_itemset_triples": (_registered("q_itemset_triples"), lambda: DST),
    "prefix_dedup_first": (_prefix_dedup_first, lambda: DST),
    "q_hamming_neighbors": (_registered("q_hamming_neighbors"), lambda: CUST_DST),
}


def build_customer_overlay(spark) -> None:
    """CUST_DST = SRC with customer x10 (distance-2 name prefixes)."""
    if os.path.exists(os.path.join(CUST_DST, "_DONE")):
        print(f"{CUST_DST} already built")
        return
    os.makedirs(CUST_DST, exist_ok=True)
    for t in TABLE_NAMES:
        if t == "customer":
            continue
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{CUST_DST}/{t}.parquet"
        )
    cust = spark.read.parquet(f"{SRC}/customer.parquet")
    k = cust.agg(F.max("c_custkey")).first()[0] + 1
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    (
        cust.crossJoin(copies)
        .withColumn("c_custkey", F.col("c_custkey") + F.col("copy") * F.lit(k))
        .withColumn(
            "c_name",
            F.concat(
                F.repeat(F.col("copy").cast("string"), 2), F.col("c_name")
            ),
        )
        .drop("copy")
        .write.mode("overwrite")
        .parquet(f"{CUST_DST}/customer.parquet")
    )
    open(os.path.join(CUST_DST, "_DONE"), "w").write("ok\n")
    print(f"built {CUST_DST}")


def _time_noop(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> None:
    runs = 2  # the verdict's spec: noop sink, Spark side only, 2 runs
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]
    spark = get_spark("probe_round10")
    sf_probe.build(spark)
    build_customer_overlay(spark)

    results: dict[str, dict] = {}
    print(f"{'query':24s} {'sf0.1':>8s} {'10x':>8s} {'ratio':>7s} {'exp':>6s}")
    for name, (fn, dst_fn) in PROBE.items():
        times = {}
        for scale, d in (("sf0.1", SRC), ("x10", dst_fn())):
            _time_noop(fn(spark, d))  # untimed warmup (JIT + file index)
            times[scale] = min(_time_noop(fn(spark, d)) for _ in range(runs))
        ratio = times["x10"] / times["sf0.1"]
        exp = math.log10(ratio)
        results[name] = {
            "sf0.1_sec": round(times["sf0.1"], 3),
            "x10_sec": round(times["x10"], 3),
            "ratio": round(ratio, 2),
            "exponent": round(exp, 2),
            "corpus": "sf_probe standard" if dst_fn() == DST else "customer x10 overlay",
        }
        print(
            f"{name:24s} {times['sf0.1']:8.3f} {times['x10']:8.3f} "
            f"{ratio:7.2f} {exp:6.2f}"
        )
    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {
                    "probe": "round10 heaviest pair queries, Spark side, x10",
                    "runs": runs,
                    "queries": results,
                },
                f,
                indent=1,
            )
            f.write("\n")
        print(f"\nwrote {json_out}")


if __name__ == "__main__":
    main()
