"""Unit/property tests for round-4b operators (X107-X122 kernels):
Misra-Gries heavy hitters, exact EWMA, BFS distances, SimHash sign
rule — the cross-checks the oracle corpus can't express (adversarial
skew, pure-Python references, tie semantics)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from laser_hadoop_spark import registry
from laser_hadoop_spark.operators.sketches import heavy_hitters, misra_gries_candidates
from laser_hadoop_spark.tables import table


# --- Misra-Gries heavy hitters ----------------------------------------------


def _freq_df(spark, freqs: dict[str, int], n_partitions: int):
    rows = [(k,) for k, n in freqs.items() for _ in range(n)]
    return spark.createDataFrame(rows, ["key"]).repartition(n_partitions)


def test_heavy_hitters_exact_on_zipf_skew(spark):
    """Zipf-ish skew across partitions: the two-pass output equals the
    exact GROUP BY + HAVING, regardless of partitioning."""
    freqs = {f"k{i:03d}": max(1, 3000 // (i + 1)) for i in range(200)}
    df = _freq_df(spark, freqs, n_partitions=7)
    n = sum(freqs.values())
    denom = 100
    expect = {k: c for k, c in freqs.items() if c * denom > n}
    got = {
        r["key"]: r["cnt"]
        for r in heavy_hitters(df, "key", denom, capacity=128).collect()
    }
    assert got == expect
    assert expect, "fixture must produce at least one heavy hitter"


def test_heavy_hitters_adversarial_spread(spark):
    """The MG worst case: one true hitter diluted by a long tail of
    near-threshold keys, spread over many partitions. The guarantee
    (capacity >= threshold_denom -> no false negatives) must hold."""
    freqs = {"hot": 500}
    freqs.update({f"t{i:04d}": 3 for i in range(2000)})  # n = 6500
    df = _freq_df(spark, freqs, n_partitions=13)
    n = sum(freqs.values())
    denom = 20  # threshold n/20 = 325 -> only "hot" qualifies
    got = {r["key"]: r["cnt"] for r in heavy_hitters(df, "key", denom, capacity=64).collect()}
    assert got == {"hot": 500}


def test_heavy_hitters_rejects_undersized_capacity(spark):
    df = _freq_df(spark, {"a": 3}, 1)
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters(df, "key", threshold_denom=100, capacity=50)


def test_misra_gries_candidates_contain_all_heavy_keys(spark):
    """Candidate pass alone (pre-recount) already has no false
    negatives at the guaranteed threshold."""
    freqs = {"big": 400, "mid": 150}
    freqs.update({f"s{i}": 7 for i in range(100)})
    df = _freq_df(spark, freqs, n_partitions=5)
    n = sum(freqs.values())
    cands = {r["key"] for r in misra_gries_candidates(df, "key", capacity=32).collect()}
    for k, c in freqs.items():
        if c * 32 > n:
            assert k in cands, f"guaranteed key {k} missing from candidates"


# --- EWMA exactness ----------------------------------------------------------


def test_ewma_matches_python_reference(spark, sf_dir):
    """q_ewma's scaled bigint equals a pure-Python computation of
    sum(v_centi * 2^(16-rn)) over each user's 16 most recent events —
    and, divided by 2^15, approximates the float alpha=1/2 EWMA."""
    rows = (
        table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.unix_micros("ts").alias("t"),
            "event_id",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("v"),
        )
        .collect()
    )
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["t"], r["event_id"], r["v"]))
    expect = {}
    for u, evs in by_user.items():
        evs.sort(key=lambda x: (-x[0], -x[1]))
        recent = evs[:16]
        expect[u] = (
            sum(v << (16 - (i + 1)) for i, (_, _, v) in enumerate(recent)),
            len(recent),
        )
    got = {
        r["user_id"]: (r["ewma_x32768"], r["n_used"])
        for r in registry.get("q_ewma").fn(spark, sf_dir).collect()
    }
    assert got == expect


# --- BFS distances -----------------------------------------------------------


def test_bfs_matches_python_reference(spark, sf_dir):
    """Iterative Spark BFS equals a textbook Python BFS (depth cap 3)
    over the same co-purchase edge set."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    orders: dict = {}
    for r in li:
        orders.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    adj: dict = {}
    for parts in orders.values():
        for a in parts:
            for b in parts:
                if a != b:
                    adj.setdefault(a, set()).add(b)
    root = min(p for parts in orders.values() for p in parts)
    dist = {root: 0}
    frontier = [root]
    for d in range(1, 4):
        nxt = []
        for node in frontier:
            for nb in adj.get(node, ()):
                if nb not in dist:
                    dist[nb] = d
                    nxt.append(nb)
        frontier = nxt
    got = {
        r["partkey"]: r["hops"]
        for r in registry.get("q_bfs_distances").fn(spark, sf_dir).collect()
    }
    assert got == dist


# --- SimHash sign rule -------------------------------------------------------


def test_simhash_sign_and_tie_rule(spark, sf_dir):
    """Recompute one document's SimHash in Python from the same md5
    bits: positive bit-vote sums set the bit, ties (sum == 0) clear it."""
    import hashlib

    docs = table(spark, sf_dir, "documents").select("doc_id", "text").limit(5).collect()
    got = {
        r["doc_id"]: (r["simhash32"], r["n_tokens"])
        for r in registry.get("q_simhash_exact").fn(spark, sf_dir).collect()
    }
    for doc in docs:
        toks = {t for t in doc["text"].split(" ") if t}
        votes = [0] * 32
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            for b in range(32):
                votes[b] += 1 if (h >> b) & 1 else -1
        sig = sum((1 << b) for b in range(32) if votes[b] > 0)
        assert got[doc["doc_id"]] == (sig, len(toks))


# --- Entropy bounds ----------------------------------------------------------


def test_entropy_within_bounds(spark, sf_dir):
    """0 <= H <= log10(n_types): micro-unit entropy stays in the
    information-theoretic envelope (5 event types)."""
    out = registry.get("q_entropy").fn(spark, sf_dir).collect()
    cap = math.log10(5) * 1_000_000
    assert out
    for r in out:
        assert -2 <= r["entropy_micro"] <= cap + 2, r


# --- Activity bitmap invariant (X127) ----------------------------------------


def test_activity_bitmap_popcount_invariant(spark, sf_dir):
    """bit_count(bitmap) must equal the exact distinct-day count in
    every (user, block) row — the bitmap IS the day set."""
    out = registry.get("q_activity_bitmap").fn(spark, sf_dir)
    rows = out.select(
        "bitmap", "n_active_days", F.bit_count("bitmap").alias("pc")
    ).collect()
    assert rows
    for r in rows:
        assert r["pc"] == r["n_active_days"], r


# --- KS / Mann-Whitney internal consistency (X124/X125) ----------------------


def test_mann_whitney_consistency(spark, sf_dir):
    """u1_x2 + u2_x2 == 2 * n1 * n2 (rank-sum identity), and the KS
    statistic is within [0, n1*n2]."""
    mw = registry.get("q_mann_whitney").fn(spark, sf_dir).collect()[0]
    assert mw["u1_x2"] + mw["u2_x2"] == 2 * mw["n1"] * mw["n2"]
    ks = registry.get("q_ks_test").fn(spark, sf_dir).collect()[0]
    assert 0 <= ks["d_scaled"] <= ks["n1"] * ks["n2"]


# --- Compression ratio reference (X140) --------------------------------------


def test_compress_ratio_matches_python_zlib(spark, sf_dir):
    """rows-only query X140: ratio_bp equals a direct python zlib
    level-6 computation for every document."""
    import zlib

    docs = {
        r["doc_id"]: r["text"]
        for r in table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    out = registry.get("q_compress_ratio").fn(spark, sf_dir).collect()
    assert len(out) == len(docs)
    for r in out:
        raw = docs[r["doc_id"]].encode("utf-8")
        comp = len(zlib.compress(raw, 6))
        assert (r["raw_len"], r["compressed_len"]) == (len(raw), comp), r
        assert r["ratio_bp"] == comp * 10000 // len(raw)
