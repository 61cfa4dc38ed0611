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
    path = os.path.join(ROOT, "LEDGER.json")
    assert os.path.exists(path), "run scripts/make_ledger.py"
    with open(path) as f:
        on_disk = json.load(f)
    assert on_disk == ledger, "LEDGER.json is stale — rerun scripts/make_ledger.py"


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
