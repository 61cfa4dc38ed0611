"""Gate on the cumulative driver-correctness ledger.

LEDGER.json (built by scripts/make_ledger.py from the per-round
CORRECTNESS_r{N}.json files) is the ever-green record. These tests make
coverage regressions loud:

- a query the driver ever verified must still be registered (deleting a
  green query silently shrinks coverage);
- an oracle-backed green query must still carry an oracle (downgrading
  to rows-only silently weakens its check);
- a round-over-round driver regression (green then failed) fails CI.
"""

from __future__ import annotations

import json
import os

import pytest

from laser_hadoop_spark import registry
from scripts.make_ledger import ROOT, build_ledger


@pytest.fixture(scope="module")
def ledger():
    return build_ledger()


def test_ledger_file_is_current(ledger):
    """Self-healing: when a new CORRECTNESS_r{N}.json lands (each round
    start), regenerate LEDGER.json instead of failing — the strict
    gates are the regression/coverage tests below, not file freshness."""
    path = os.path.join(ROOT, "LEDGER.json")
    on_disk = None
    if os.path.exists(path):
        with open(path) as f:
            on_disk = json.load(f)
    if on_disk != ledger:
        with open(path, "w") as f:
            json.dump(ledger, f, indent=1)
            f.write("\n")
        import warnings

        warnings.warn("LEDGER.json was stale; regenerated from CORRECTNESS files")
    with open(path) as f:
        assert json.load(f) == ledger


def test_no_driver_regressions(ledger):
    assert ledger["regressions"] == []


def test_every_ledger_query_still_registered(ledger):
    specs = registry.specs()
    missing = [n for n in ledger["queries"] if n not in specs]
    assert not missing, f"driver-verified queries dropped from registry: {missing}"


def test_green_queries_keep_their_oracles(ledger):
    specs = registry.specs()
    downgraded = [
        n
        for n, e in ledger["queries"].items()
        if e["status"] == "green" and n in specs and specs[n].oracle is None
    ]
    assert not downgraded, f"oracle-backed green queries downgraded to rows-only: {downgraded}"
