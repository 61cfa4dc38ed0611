#!/usr/bin/env python
"""Run every registered query against its DuckDB oracle and report.

Usage: python scripts/check_oracles.py [--json OUT.json] [--window]
       [--bounded] [--skip name]... [sf_dir] [query ...]
(--window = exactly the driver's 50-entry verification prefix;
 --bounded = for queries registered with a bounded sweep variant,
 compare the variant instead of the full (fn, oracle) pair — for
 above-driver-scale sweeps where the full ORACLE is intractable, e.g.
 q_damerau_pairs' DuckDB side runs the O(len²) DP per candidate pair,
 ~40 min at sf0.1; the variant restricts BOTH engines to the same
 deterministic md5 sample so the hash check stays exact, and the JSON
 records kind "oracle-bounded" so the artifact is honest about what
 was checked;
 --skip = drop a query from the run entirely — last resort, prefer
 registering a bounded variant)
Defaults to /root/testdata/sf0.01 (the driver's correctness scale).

--json writes the per-query verdicts as a committed artifact
(ORACLE_LOCAL_r{N}.json): the versioned record that lets a judge
distinguish "locally oracle-green" from "never run" for queries outside
the driver's 50-entry verification window, without re-running the
suite.

SPARK_GRAFT_ADVERSARIAL=1 hardens the session the way the driver's
vanilla session (or a hostile cluster default) might: ANSI mode ON
(Spark 4 default the tuned session might mask), a non-UTC session
timezone, and an awkward shuffle partition count. Every query must stay
green under it — parquet timestamps are NTZ so TZ must not matter, and
no operator may rely on wrapping arithmetic or partition counts.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from laser_hadoop_spark import registry
from laser_hadoop_spark.session import get_spark, release_persisted
from laser_hadoop_spark.testing import compare_query, duckdb_connect


def main() -> int:
    args = [a for a in sys.argv[1:]]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    window = "--window" in args
    if window:
        args.remove("--window")
    bounded = "--bounded" in args
    if bounded:
        args.remove("--bounded")
    skips: set[str] = set()
    while "--skip" in args:
        i = args.index("--skip")
        skips.add(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    if window:
        # exactly the driver's verification prefix — the first 50
        # entries of queries() order (no copy-paste drift between the
        # registry rotation and its dry-run)
        names = list(registry.all_queries())[:50] + names
    spark = get_spark("check_oracles")
    adversarial = bool(os.environ.get("SPARK_GRAFT_ADVERSARIAL"))
    if adversarial:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        print("ADVERSARIAL session: ANSI on, TZ=America/New_York, shuffle=7")
    con = duckdb_connect(sf_dir)
    specs = registry.specs()
    if names:
        specs = {n: specs[n] for n in names}
    if skips:
        # an explicitly requested query must never vanish silently:
        # naming it positionally AND in --skip is a contradiction
        conflict = sorted(skips & set(names))
        if conflict:
            print(f"ERROR: listed both positionally and in --skip: {conflict}")
            return 2
        specs = {n: s for n, s in specs.items() if n not in skips}
        print(f"skipping {len(skips)}: {sorted(skips)}")
    failures = 0
    results: dict[str, dict] = {}
    for name, spec in sorted(specs.items()):
        fn, oracle = spec.fn, spec.oracle
        kind = "oracle" if oracle else "rows-only"
        if bounded and spec.bounded_fn is not None:
            fn, oracle = spec.bounded_fn, spec.bounded_oracle
            kind = "oracle-bounded"
        t0 = time.time()
        try:
            res = compare_query(spark, con, name, fn, oracle, sf_dir)
        except Exception as exc:  # noqa: BLE001
            failures += 1
            print(f"FAIL  {name}: EXCEPTION {type(exc).__name__}: {exc}")
            results[name] = {
                "ok": False,
                "kind": kind,
                "error": f"{type(exc).__name__}: {exc}",
            }
            continue
        finally:
            # session hygiene (VERDICT_r10 item 7): each query's
            # checkpoint blocks are dead once compared — free them NOW
            # instead of at the ContextCleaner's GC-timing mercy, so a
            # 438-query sweep can't build up storage tenancy on the
            # shared local-mode heap (the q_jaro_pairs slow-mode root
            # cause, see session.release_persisted)
            release_persisted(spark)
        dt = time.time() - t0
        results[name] = {
            "ok": bool(res.ok),
            "kind": kind,
            "rows": res.spark_rows,
            "secs": round(dt, 1),
        }
        if res.ok:
            print(f"ok    {name} [{kind}] rows={res.spark_rows} ({dt:.1f}s)")
        else:
            failures += 1
            print(f"FAIL  {name} rows={res.spark_rows}/{res.oracle_rows} ({dt:.1f}s)")
            for m in res.mismatches:
                print(f"      {m}")
    print(f"\n{len(specs) - failures}/{len(specs)} queries match")
    if json_out:
        import json

        with open(json_out, "w") as f:
            # the artifact must self-describe its session flavor so
            # plain and adversarial sweeps are distinguishable at HEAD
            # (VERDICT_r09 item 3)
            session = (
                {
                    "flavor": "adversarial",
                    "ansi": True,
                    "timeZone": "America/New_York",
                    "shuffle_partitions": 7,
                }
                if adversarial
                else {"flavor": "plain"}
            )
            json.dump(
                {"sf_dir": sf_dir, "session": session, "queries": results},
                f,
                indent=1,
            )
            f.write("\n")
        print(f"wrote {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
