#!/usr/bin/env python
"""Round-11 scale probe (VERDICT_r10 item 5): Spark-side x10 exponents
for q_dup_spans and q_jaro_pairs — the two bench-top-5 queries without
a committed exponent (PROBE_r10 covers itemsets/hamming/prefix).

Both get a STRUCTURE-PRESERVING x10 overlay, following PROBE_r10's
q_hamming_neighbors precedent: a verbatim x10 copy would turn every
document/part into a 10-clique whose pair OUTPUT is quadratic by
definition — measuring the answer's size, not the algorithm — so each
overlay replicates the sf0.1 neighbor structure 10x instead:

- q_dup_spans (documents): 10 copies under offset doc_ids with a
  per-copy 1:1 character translation (a/e/o -> three copy-specific
  characters). A 1:1 char map preserves every within-copy gram
  equality, so each copy's duplicated-span census is isomorphic to
  sf0.1's; cross-copy 20-grams collide only if they contain NONE of
  a/e/o, which the corpus vocabulary makes negligible. n_chars stays
  valid (translate is length-preserving).
- q_jaro_pairs (part): 10 copies under offset partkeys with per-copy
  brand prefixes — 25 blocks become 250 at the sf0.1 block size, so
  the blocked join scales with the DATA while the 64-name dictionary
  kernel stays constant. (The coarse-brand VERBATIM x10 regime —
  blocks 10x bigger, output ~x100 — was already characterized in
  PERF_NOTES round 7: ~quadratic by construction, the documented
  residual of within-block matching.)

Noop sink (no driver transfer), fresh plan per run, untimed warmup,
min of N runs. Prints log10(t_10x / t_1x) per query.

Usage: python scripts/probe_round11.py [--runs N] [--json OUT.json]
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
from laser_hadoop_spark.session import get_spark, release_persisted
from laser_hadoop_spark.tables import TABLE_NAMES

import sf_probe  # noqa: E402  (scripts/ sibling: SRC/COPIES conventions)

SRC = sf_probe.SRC
COPIES = sf_probe.COPIES
DOC_DST = "/tmp/lh_sfprobe/sf1docsalt"
PART_DST = "/tmp/lh_sfprobe/sf1brand"


def _copy_others(spark, dst: str, scaled: str) -> None:
    for t in TABLE_NAMES:
        if t == scaled:
            continue
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )


def build_doc_overlay(spark) -> None:
    """documents x10, per-copy a/e/o translation (cross-copy grams
    distinct, within-copy gram structure isomorphic to sf0.1)."""
    if os.path.exists(os.path.join(DOC_DST, "_DONE")):
        print(f"{DOC_DST} already built")
        return
    os.makedirs(DOC_DST, exist_ok=True)
    _copy_others(spark, DOC_DST, "documents")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    k = docs.agg(F.max("doc_id")).first()[0] + 1
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    salted = (
        docs.crossJoin(copies)
        .withColumn("doc_id", F.col("doc_id") + F.col("copy") * F.lit(k))
        .withColumn(
            "text",
            # per-copy 1:1 map: a->A..J, e->K..T, o->U..^ (chr(65/75/85+i))
            F.expr(
                "translate(text, 'aeo', "
                "char(65 + copy) || char(75 + copy) || char(85 + copy))"
            ),
        )
        .drop("copy")
    )
    salted.write.mode("overwrite").parquet(f"{DOC_DST}/documents.parquet")
    open(os.path.join(DOC_DST, "_DONE"), "w").write("ok\n")
    print(f"built {DOC_DST}")


def build_part_overlay(spark) -> None:
    """part x10, per-copy brand prefixes: 25 blocks -> 250 at the
    sf0.1 block size (the record-linkage neighbor structure x10)."""
    if os.path.exists(os.path.join(PART_DST, "_DONE")):
        print(f"{PART_DST} already built")
        return
    os.makedirs(PART_DST, exist_ok=True)
    _copy_others(spark, PART_DST, "part")
    part = spark.read.parquet(f"{SRC}/part.parquet")
    k = part.agg(F.max("p_partkey")).first()[0] + 1
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    scaled = (
        part.crossJoin(copies)
        .withColumn("p_partkey", F.col("p_partkey") + F.col("copy") * F.lit(k))
        .withColumn(
            "p_brand",
            F.concat(F.col("copy").cast("string"), F.lit("#"), F.col("p_brand")),
        )
        .drop("copy")
    )
    scaled.write.mode("overwrite").parquet(f"{PART_DST}/part.parquet")
    open(os.path.join(PART_DST, "_DONE"), "w").write("ok\n")
    print(f"built {PART_DST}")


PROBE = {
    "q_dup_spans": DOC_DST,
    "q_jaro_pairs": PART_DST,
}


def _time_noop(spark, name: str, d: str) -> float:
    fn = registry.specs()[name].fn
    t0 = time.perf_counter()
    fn(spark, d).write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    release_persisted(spark)  # same hygiene as bench.py (r11)
    return dt


def main() -> None:
    runs = 2
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]
    spark = get_spark("probe_round11")
    build_doc_overlay(spark)
    build_part_overlay(spark)

    results: dict[str, dict] = {}
    print(f"{'query':16s} {'sf0.1':>8s} {'10x':>8s} {'ratio':>7s} {'exp':>6s}")
    for name, dst in PROBE.items():
        times = {}
        for scale, d in (("sf0.1", SRC), ("x10", dst)):
            _time_noop(spark, name, d)  # untimed warmup (JIT + file index)
            times[scale] = min(_time_noop(spark, name, d) for _ in range(runs))
        ratio = times["x10"] / times["sf0.1"]
        exp = math.log10(ratio)
        results[name] = {
            "sf0.1_sec": round(times["sf0.1"], 3),
            "x10_sec": round(times["x10"], 3),
            "ratio": round(ratio, 2),
            "exponent": round(exp, 2),
            "corpus": (
                "documents x10, per-copy a/e/o translation"
                if dst == DOC_DST
                else "part x10, per-copy brand prefixes"
            ),
        }
        print(
            f"{name:16s} {times['sf0.1']:8.3f} {times['x10']:8.3f} "
            f"{ratio:7.2f} {exp:6.2f}"
        )
    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {
                    "probe": "round11 bench-top-5 without exponents, Spark side, x10",
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
