#!/usr/bin/env python
"""Merge per-round driver CORRECTNESS_r{N}.json files into LEDGER.json.

The driver verifies a 50-entry window per round, so no single
CORRECTNESS file shows cumulative coverage. LEDGER.json is the
ever-green union: for each query ever run by the driver, the rounds in
which it was hash-green / rows-only / failed, and its current status.
A query that was green in an earlier round and fails in a later one is
a REGRESSION and is surfaced both here and by tests/test_ledger.py.

Run after each round's CORRECTNESS file lands:
    python scripts/make_ledger.py
"""

from __future__ import annotations

import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_ledger(root: str = ROOT, only_rounds: list[int] | None = None) -> dict:
    """Merge the CORRECTNESS files under ``root`` into the ledger dict.

    ``only_rounds`` restricts the merge to those round numbers — used by
    tests/test_ledger.py to decide, by CONTENT, whether a committed
    ledger is merely pre-boundary (rebuilding from exactly its
    ``rounds_merged`` reproduces it) or genuinely stale.
    """
    rounds: dict[int, dict] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        n = int(m.group(1))
        if only_rounds is not None and n not in only_rounds:
            continue
        with open(path) as f:
            rounds[n] = json.load(f)

    queries: dict[str, dict] = {}
    for rnd in sorted(rounds):
        for name, verdict in rounds[rnd].items():
            entry = queries.setdefault(
                name,
                {"green_rounds": [], "rows_only_rounds": [], "failed_rounds": []},
            )
            if verdict.get("hash_match"):
                entry["green_rounds"].append(rnd)
            elif verdict.get("err") == "no_oracle":
                entry["rows_only_rounds"].append(rnd)
            else:
                entry["failed_rounds"].append(rnd)

    regressions = []
    for name, entry in queries.items():
        greens, fails = entry["green_rounds"], entry["failed_rounds"]
        if greens:
            entry["status"] = "green"
            # green then failed later = regression
            if fails and max(fails) > max(greens):
                entry["status"] = "REGRESSED"
                regressions.append(name)
        elif entry["rows_only_rounds"]:
            entry["status"] = "rows_only"
            if fails and max(fails) > max(entry["rows_only_rounds"]):
                entry["status"] = "REGRESSED"
                regressions.append(name)
        else:
            entry["status"] = "failed"

    statuses = [e["status"] for e in queries.values()]
    return {
        "rounds_merged": sorted(rounds),
        "ever_green": sum(s == "green" for s in statuses),
        "rows_only": sum(s == "rows_only" for s in statuses),
        "failing": sum(s == "failed" for s in statuses),
        "regressions": sorted(regressions),
        "queries": {n: queries[n] for n in sorted(queries)},
    }


def main() -> int:
    ledger = build_ledger()
    out = os.path.join(ROOT, "LEDGER.json")
    with open(out, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=False)
        f.write("\n")
    print(
        f"LEDGER.json: rounds={ledger['rounds_merged']} "
        f"ever-green={ledger['ever_green']} rows-only={ledger['rows_only']} "
        f"failing={ledger['failing']} regressions={ledger['regressions']}"
    )
    return 1 if ledger["regressions"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
