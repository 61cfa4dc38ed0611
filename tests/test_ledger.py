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
    """Assert-only freshness gate (round-3 ADVICE: a test that rewrote
    the tracked file could mask a stale committed ledger). When a new
    CORRECTNESS_r{N}.json lands, run ``python scripts/make_ledger.py``
    and commit the result; set LH_REGEN_LEDGER=1 to let this test do
    the regeneration explicitly."""
    path = os.path.join(ROOT, "LEDGER.json")
    if os.environ.get("LH_REGEN_LEDGER") == "1":
        with open(path, "w") as f:
            json.dump(ledger, f, indent=1)
            f.write("\n")
    with open(path) as f:
        assert json.load(f) == ledger, (
            "LEDGER.json is stale — run `python scripts/make_ledger.py` "
            "(or re-run pytest with LH_REGEN_LEDGER=1) and commit it"
        )


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
