"""Payload-carry audit for pair-generating queries (round-8 class).

The round-8 ANN finding, generalized: when a query generates candidate
PAIRS (self-join on a blocking key, then dedup), the dedup/distinct
exchange must carry ids and hashes — never the payload column the
kernel scores (embeddings, names, text). Carrying two 64-dim arrays
through q_ann_lsh's candidate stream was 32 s vs 7 s at sf0.1; the same
shape in q_hamming_neighbors (two name strings through a 1.9M-row
distinct) was 8.2 s vs 2.2 s.

The audited set is a REGISTRY PROPERTY (VERDICT_r08 item 4): every
query registered with ``tags=("pairs",)`` is audited, so a future
pair-generating query is covered by construction rather than by
remembering to extend a hand-list. ``MIN_PAIR_QUERIES`` is the round-8
hand-list kept as a minimum-coverage assertion — if a rename or tag
removal ever drops one of these from the tagged set, the audit fails
loudly instead of silently shrinking.

Consumers: scripts/audit_pair_shuffles.py (review aid, prints flagged
exchanges) and tests/test_plan_audit.py (binding — CLEAN required).
"""

from __future__ import annotations

import re

from laser_hadoop_spark import registry

# payload-ish column-name patterns; `gram_h`/`sig_hash`-style HASH/ID
# columns are the discipline, not a violation, so the whole hash/id
# suffix FAMILY is excluded: `_h`, `_h2`, `_hash`, `_id`, `_idx` —
# each terminated boundary-or-underscore so longer spellings
# (`sig_hash#3`, `gram_h2#1`, `vec_idx#4`) stay excluded exactly like
# their short forms (ADVICE r10: the r9 word-boundary tightening had
# narrowed the exclusion to the literal short suffixes, creating new
# false positives for the longer spellings).
# Every stem is anchored on identifier-token boundaries (ADVICE r9:
# the bare substrings false-flagged 'design'/'assign' via `sig` and
# any '*name*' column via `name`): a stem matches only when it starts
# at a word/underscore boundary AND ends at one, so `c_name`, `name#5`
# and `chunk_text` hit while `designator`/`signature_ok`/`renamed` miss.
_HASH_SUFFIX = r"(?!_(?:h\d*|hash|id|idx)(?:\b|_))"
# ADVICE r11: the hash/id suffix exclusion applies to EVERY stem, not
# just sig/vec/gram — `name_hash#3` / `text_hash` / `tokens_id` are the
# same hashed/id discipline as `sig_hash` and must not false-flag.
_BARE_STEMS = (
    r"text",
    r"embedding",
    r"sig",
    r"name",
    r"tokens",
    r"vec",
    r"gram",
    r"body",
)
_STEMS = tuple(rf"{stem}{_HASH_SUFFIX}" for stem in _BARE_STEMS)
PAYLOADISH = tuple(rf"(?:\b|_){stem}(?:\b|_)" for stem in _STEMS)

# Adjudicated-benign exchange lines (ADVICE r9: the escape hatch that
# keeps a future false positive from being "fixed" by weakening a
# pattern). Keyed by query name; each value is a tuple of regexes — an
# exchange line matching one of them is excused for that query only.
# Every entry must carry a WHY comment.
ALLOWLIST: dict[str, tuple[str, ...]] = {
    # (empty at r10 — the tagged sweep is CLEAN with the anchored
    # patterns and the widened Exchange filter; add entries here with
    # justification rather than loosening PAYLOADISH)
}

MIN_PAIR_QUERIES = frozenset(
    [
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
)


def pair_queries() -> list[str]:
    """Registry-derived audited set, with the hand-list as a floor."""
    names = registry.tagged("pairs")
    missing = MIN_PAIR_QUERIES - set(names)
    if missing:
        raise AssertionError(
            f"registry 'pairs' tag lost known pair queries: {sorted(missing)}"
        )
    return names


# every physical exchange variant that moves rows between tasks or to
# the driver-side broadcast build (ADVICE r9: hashpartitioning-only
# scope let rangepartitioning/orderBy and BroadcastExchange lines that
# key on payload columns escape the audit)
_EXCHANGE_MARKERS = (
    "Exchange hashpartitioning",
    "Exchange rangepartitioning",
    "Exchange SinglePartition",
    "BroadcastExchange",
)


def flag_payload_exchanges(
    plan: str, *, allow: tuple[str, ...] = ()
) -> list[tuple[list[str], str]]:
    """(patterns hit, exchange line) for every exchange — hash, range,
    single-partition, or broadcast — whose key expressions mention a
    payload-ish column name. `allow` holds adjudicated-benign line
    regexes (see ALLOWLIST)."""
    flagged: list[tuple[list[str], str]] = []
    for ln in plan.splitlines():
        if any(marker in ln for marker in _EXCHANGE_MARKERS):
            hits = [p for p in PAYLOADISH if re.search(p, ln)]
            if hits and not any(re.search(a, ln) for a in allow):
                flagged.append((hits, ln.strip()[:140]))
    return flagged


def looks_pair_shaped(plan: str) -> bool:
    """Mechanical pair-shape detector (VERDICT_r08 item 4's alternative):
    does this physical plan SELF-JOIN a base table and then dedup?

    Heuristic, for DISCOVERY not for binding audits: a plan is
    pair-shaped when (a) some parquet location is scanned at least
    twice (the self-join's two sides; ReusedExchange hides one scan,
    so exchange reuse is counted too) and (b) a duplicate-collapsing
    aggregate runs afterwards (a no-function HashAggregate — the
    physical form of dropDuplicates/distinct — or a SortAggregate with
    no functions). Used by scripts/audit_pair_shuffles.py --discover
    to surface queries that SHOULD carry tags=("pairs",) but don't;
    known-benign shapes (1-row scalar crossjoins, dimension reuse) are
    expected false positives a human adjudicates once.
    """
    scans: dict[str, int] = {}
    for m in re.finditer(r"Location: InMemoryFileIndex(?:\(\d+ paths\))?\[([^\],]+)", plan):
        loc = m.group(1)
        scans[loc] = scans.get(loc, 0) + 1
    self_scanned = any(c >= 2 for c in scans.values())
    if not self_scanned and "ReusedExchange" not in plan and "ReusedSubquery" not in plan:
        return False
    dedup_agg = re.search(r"(?:Hash|Sort)Aggregate\(keys=\[[^\]]+\], functions=\[\]", plan)
    return bool(dedup_agg)
