#!/usr/bin/env python
"""Payload-carry audit for pair-generating queries (round-8 class).

The round-8 ANN finding generalized: when a query generates candidate
PAIRS (self-join on a blocking key, then dedup), the dedup/distinct
exchange must carry ids and hashes — never the payload column the
kernel scores (embeddings, names, text). Carrying two 64-dim arrays
through q_ann_lsh's candidate stream was 32 s vs 7 s at sf0.1; the
same shape in q_hamming_neighbors (two name strings through a 1.9M-row
distinct) was 8.2 s vs 2.2 s.

This script prints, for every listed pair-generating query, each
`Exchange hashpartitioning` whose partition keys mention a payload-ish
column name. Partition keys listing only ids/hashes => CLEAN. It is a
REVIEW aid (plan text shows keys, not the full row payload); the
binding guarantees live in tests/test_plan_audit.py
(test_round8_ann_candidate_shuffles_are_id_only and the per-query
shuffle budgets).

Usage: python scripts/audit_pair_shuffles.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from laser_hadoop_spark import registry
from laser_hadoop_spark.session import get_spark

PAIR_QUERIES = [
    "q_ann_lsh",
    "q_ann_ivf",
    "q_dedup_near",
    "q_minhash_band_pairs",
    "q_containment_pairs",
    "q_prefix_filter_pairs",
    "q_record_linkage",
    "q_dedup_simhash",
    "q_dedup_simhash64",
    "q_contamination",
    "q_audience_jaccard",
    "q_grid_spatial_join",
    "q_semantic_dedup",
    "q_dup_spans",
    "q_edit_distance_join",
    "q_hamming_neighbors",
    "q_jaro_pairs",
    "q_jaro_blocked",
    "q_damerau_pairs",
]

# payload-ish column-name patterns; `gram_h`/`sig_h`-style HASH columns
# are the discipline, not a violation, so a trailing `_h` is excluded
PAYLOADISH = (
    r"text",
    r"embedding",
    r"sig(?!_h)",
    r"name",
    r"tokens",
    r"vec(?!_id)",
    r"gram(?!_h)",
    r"body",
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("audit_pair_shuffles")
    dirty = 0
    for name in PAIR_QUERIES:
        try:
            df = registry.specs()[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            dirty += 1
            continue
        import re

        flagged = []
        for ln in plan.splitlines():
            if "Exchange hashpartitioning" in ln:
                hits = [p for p in PAYLOADISH if re.search(p, ln)]
                if hits:
                    flagged.append((hits, ln.strip()[:140]))
        if flagged:
            print(f"{name}: REVIEW ({len(flagged)} exchanges key on payload-ish columns)")
            for hits, ln in flagged:
                print(f"    {hits} {ln}")
        else:
            print(f"{name}: CLEAN")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
