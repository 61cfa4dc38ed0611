#!/usr/bin/env python
"""Payload-carry audit for pair-generating queries (round-8 class).

The round-8 ANN finding generalized: when a query generates candidate
PAIRS (self-join on a blocking key, then dedup), the dedup/distinct
exchange must carry ids and hashes — never the payload column the
kernel scores (embeddings, names, text). Carrying two 64-dim arrays
through q_ann_lsh's candidate stream was 32 s vs 7 s at sf0.1; the
same shape in q_hamming_neighbors (two name strings through a 1.9M-row
distinct) was 8.2 s vs 2.2 s.

This script prints, for every pair-generating query, each
`Exchange hashpartitioning` whose partition keys mention a payload-ish
column name. Partition keys listing only ids/hashes => CLEAN. It is a
REVIEW aid (plan text shows keys, not the full row payload); the
binding guarantees live in tests/test_plan_audit.py
(test_pair_query_shuffles_carry_no_payload over the same registry-
derived set, plus the per-query shuffle budgets).

The audited set comes from the registry's ``tags=("pairs",)`` marker
(VERDICT_r08 item 4) via laser_hadoop_spark/plans/pair_audit.py — a
future pair query is covered by tagging it at registration, and the
round-8 hand-list is enforced there as a minimum-coverage floor.

Usage: python scripts/audit_pair_shuffles.py [--discover [--strict]] [sf_dir]
(--discover: instead of auditing the tagged set, build EVERY registered
 query's plan and flag untagged queries whose physical plan is
 pair-shaped — self-scan of a table + a no-function dedup aggregate
 (plans/pair_audit.looks_pair_shaped). Discovery output is for human
 adjudication: benign shapes (dimension reuse + distinct) show up too;
 a real finding gets tags=("pairs",) at its registration.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from laser_hadoop_spark import registry
from laser_hadoop_spark.plans.pair_audit import (
    ALLOWLIST,
    flag_payload_exchanges,
    pair_queries,
)
from laser_hadoop_spark.session import get_spark


def discover(spark, sf_dir: str, *, strict: bool = False) -> int:
    """Flag untagged queries whose plan looks pair-shaped.

    With --strict (ADVICE r9: discover always exited 0, so it could
    never gate CI), a nonzero exit when any untagged pair-shaped query
    is found; without it, advisory-only (the detector's known-benign
    false positives make strict mode opt-in)."""
    from laser_hadoop_spark.plans.pair_audit import looks_pair_shaped

    tagged = set(pair_queries())
    found = 0
    for name, spec in registry.specs().items():
        if name in tagged:
            continue
        try:
            plan = spec.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            continue
        if looks_pair_shaped(plan):
            found += 1
            print(f"{name}: PAIR-SHAPED but untagged — adjudicate")
    print(f"\n{found} untagged pair-shaped candidates")
    return 1 if (strict and found) else 0


def main() -> int:
    args = [a for a in sys.argv[1:]]
    do_discover = "--discover" in args
    if do_discover:
        args.remove("--discover")
    strict = "--strict" in args
    if strict:
        args.remove("--strict")
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    spark = get_spark("audit_pair_shuffles")
    if do_discover:
        return discover(spark, sf_dir, strict=strict)
    dirty = 0
    for name in pair_queries():
        try:
            df = registry.specs()[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            dirty += 1
            continue
        flagged = flag_payload_exchanges(plan, allow=ALLOWLIST.get(name, ()))
        if flagged:
            dirty += 1
            print(f"{name}: REVIEW ({len(flagged)} exchanges key on payload-ish columns)")
            for hits, ln in flagged:
                print(f"    {hits} {ln}")
        else:
            print(f"{name}: CLEAN")
    return 1 if dirty else 0


if __name__ == "__main__":
    raise SystemExit(main())
