#!/usr/bin/env python
"""sf1 scale probe (round-3 verdict item 7).

Builds a 10x-scaled dataset from the driver's sf0.1 parquet and times
the most expensive headline queries at both scales, printing per-query
wall times and the scaling exponent log10(t_sf1 / t_sf0.1) — 1.0 means
perfectly linear work at fixed parallelism, < 1.0 sublinear (fixed
overheads amortizing), > 1.0 superlinear (a scale-killer).

Scaling construction (derived from the driver data, not synthesized
from scratch):
- lineitem / orders: 10 key-offset copies (orderkey += i * K) — join
  structure and per-key group sizes scale exactly 10x, dimension FKs
  stay valid.
- documents: 10 verbatim copies under offset doc_ids. This makes every
  document a 10-clique of exact duplicates — deliberately: a corpus
  with ~90% duplication is a realistic pretraining-data inlet, the
  curation pipeline's dedup stage must collapse it (output stays ~1x
  while input work is 10x), and the ngram-jaccard join gets its worst
  realistic case (dense duplicate cliques). A token-perturbed variant
  was tried first and rejected: synthetic tokens fail the quality
  filters, zeroing the downstream stages and voiding the measurement.
- dimensions (region nation customer supplier part events embeddings):
  copied as-is.

Usage: python scripts/sf_probe.py [--build-only] [--runs N]
Writes the scaled data under /tmp/lh_sfprobe/sf1 (scratch, not
committed).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from laser_hadoop_spark import registry
from laser_hadoop_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/tmp/lh_sfprobe/sf1"
COPIES = 10
PROBE_QUERIES = [
    "q_winnow_fingerprints",
    "q_curation_pipeline",
    "q_dedup_ngram_jaccard",
    "q_product_profit",
    "q_waiting_suppliers",
    "q_weighted_median",
    # round 4b: the reworked signature kernels + MG heavy hitters +
    # BM25 — all document-corpus paths, probed against the 10-copy
    # (90%-duplicated) corpus worst case
    "q_minhash_signatures",
    "q_simhash_exact",
    "q_heavy_hitters",
    "q_bm25_search",
    # round 4f-4i: the corpus-wide shingle join (novelty), the
    # two-pass AUC over events, DSIR token scoring, and 5-NN
    # broadcast classification — the heaviest of the new batches
    "q_shingle_novelty",
    "q_auc_exact",
    "q_dsir_weights",
    "q_knn_classify",
    # round 5: the four de-funneled NTILE queries (two-pass
    # ordered_cumsum rank replacing the global window — exponents
    # should be flat-to-sublinear now that no task sees the full
    # fact), and the prefix-filtered similarity join probed against
    # the 10-copy dense-duplicate corpus (quadratic-candidate risk)
    "q_percent_rank_ntile",
    "q_value_deciles",
    "q_rfm_segments",
    "q_decile_migration",
    "q_prefix_filter_pairs",
    # round 5 additions: the one-scan Poisson bootstrap (should be
    # flat-to-linear — one aggregate), the survivor pipeline against
    # the 10-copy dense-duplicate corpus (its clusters are 10-cliques
    # here — the dedup worst case), the greedy set-cover rounds, and
    # the per-order-bounded triple-itemset joins
    "q_bootstrap_ci",
    "q_dedup_survivors",
    "q_set_cover",
    "q_itemset_triples",
    # round-5 late batches (only fact-scaling inputs belong here —
    # events/customer/supplier are copied AS_IS): rank statistics
    # over a 10x order-value domain (the two-pass cumulative must
    # stay flat-ish) and the iterative HITS graph (10x edges)
    "q_kruskal_wallis",
    "q_cvm_test",
    "q_hits_scores",
    # round-5 batches 13-14 (fact-scaling inputs only): the G-test's
    # orders x customer cells, the pushed-filter backlog aging scan,
    # the calendar-bounded Page-Hinkley daily series (work is in the
    # daily aggregate scan), and the bit-shift trending leaderboard
    # over 10x lineitem
    "q_g_test",
    "q_backlog_aging",
    "q_page_hinkley",
    "q_trending_parts",
    # round-5 batches 18-22 (fact/document-scaling inputs only): the
    # duplicated-span census against the 10-copy corpus (every gram
    # becomes a cross-doc duplicate — the absolute worst case for the
    # dup-gram filter), the trigram continuation census and packing
    # audit over 10x documents, the Jonckheere value census + two-pass
    # cumulative over 10x orders, and the ECOD per-value censuses over
    # the 10x-orders customer grain
    "q_dup_spans",
    "q_ngram_continuations",
    "q_pack_boundaries",
    "q_jonckheere",
    "q_ecod_outliers",
]
AS_IS = ["region", "nation", "customer", "supplier", "part", "events", "embeddings"]


def build(spark) -> None:
    if os.path.exists(os.path.join(DST, "_DONE")):
        print(f"{DST} already built")
        return
    os.makedirs(DST, exist_ok=True)
    for t in AS_IS:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))

    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    k_ord = orders.agg(F.max("o_orderkey")).first()[0] + 1
    orders.crossJoin(copies).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.col("copy") * F.lit(k_ord)
    ).drop("copy").write.mode("overwrite").parquet(f"{DST}/orders.parquet")

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    li.crossJoin(copies).withColumn(
        "l_orderkey", F.col("l_orderkey") + F.col("copy") * F.lit(k_ord)
    ).drop("copy").write.mode("overwrite").parquet(f"{DST}/lineitem.parquet")

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    k_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    docs.crossJoin(copies).withColumn(
        "doc_id", F.col("doc_id") + F.col("copy") * F.lit(k_doc)
    ).drop("copy").write.mode("overwrite").parquet(f"{DST}/documents.parquet")
    open(os.path.join(DST, "_DONE"), "w").write("ok\n")
    print(f"built {DST}")


def probe(spark, runs: int) -> None:
    specs = registry.specs()
    print(f"{'query':28s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>7s} {'exponent':>8s}")
    for name in PROBE_QUERIES:
        fn = specs[name].fn
        times = {}
        for label, sf_dir in (("sf0.1", SRC), ("sf1", DST)):
            best = float("inf")
            for _ in range(runs):
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
            times[label] = best
        ratio = times["sf1"] / times["sf0.1"]
        import math

        print(
            f"{name:28s} {times['sf0.1']:8.3f} {times['sf1']:8.3f} "
            f"{ratio:7.2f} {math.log10(ratio):8.2f}"
        )


def main() -> None:
    global PROBE_QUERIES
    runs = 3
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    # bare query names on the command line restrict the probe set
    names = [a for a in sys.argv[1:] if a.startswith("q_")]
    if names:
        PROBE_QUERIES = names
    spark = get_spark("sf_probe")
    build(spark)
    if "--build-only" in sys.argv:
        return
    # one untimed warmup pass (the bench.py discipline)
    specs = registry.specs()
    for name in PROBE_QUERIES:
        specs[name].fn(spark, SRC).collect()
    probe(spark, runs)


if __name__ == "__main__":
    main()
