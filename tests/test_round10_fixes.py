"""Round-10 verdict/advice items (VERDICT_r09 "Next round" 2/4/6).

- k-dim orthogonal Procrustes (item 4): rotation recovery on planted
  orthogonal transforms at the reference's production dimensionality
  (dim≈8, LASERInputValidator.java:162,176-177), per-group via
  cogrouped applyInPandas; scipy cross-check when available.
- bench canary verdict (item 2): the in-band canary adjudication is a
  pure function — unit-tested here against synthetic samples.
- benign-global-window closure (item 6): every `Window.orderBy(...)`
  with no partition spec in the engine is enumerated and pinned, so a
  new global window (the single-partition funnel class) cannot land
  without consciously updating the census; q_hill_tail's instance is
  additionally proven bounded in-plan (the 301-row TakeOrdered).
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np
import pytest

from laser_hadoop_spark import registry
from laser_hadoop_spark.operators.pca import grouped_procrustes, orthogonal_procrustes

ENGINE_ROOT = Path(__file__).resolve().parent.parent / "laser_hadoop_spark"


def _rand_orthogonal(rng: np.random.Generator, k: int) -> np.ndarray:
    q, r = np.linalg.qr(rng.standard_normal((k, k)))
    # canonical QR: positive diagonal of r so q is haar-ish but fixed
    return q * np.sign(np.diag(r))


# --- k-dim Procrustes (VERDICT_r09 item 4) --------------------------------


@pytest.mark.parametrize("seed", [7, 41, 1234])
def test_orthogonal_procrustes_recovers_planted_rotation(seed):
    """dim=8 (the reference's scheduled dim): a planted orthogonal Q
    with mild noise is recovered to tolerance; the scale estimate
    recovers a planted isotropic scale."""
    rng = np.random.default_rng(seed)
    k, n = 8, 400
    a = rng.standard_normal((n, k))
    a -= a.mean(axis=0, keepdims=True)
    q = _rand_orthogonal(rng, k)
    b = 1.7 * a @ q + 0.01 * rng.standard_normal((n, k))
    b -= b.mean(axis=0, keepdims=True)
    rot, scale = orthogonal_procrustes(a, b)
    assert np.allclose(rot @ rot.T, np.eye(k), atol=1e-10)
    assert np.abs(rot - q).max() < 5e-3
    assert abs(scale - 1.7) < 5e-3
    # deterministic: same inputs, identical bits
    rot2, scale2 = orthogonal_procrustes(a, b)
    assert np.array_equal(rot, rot2) and scale == scale2


def test_orthogonal_procrustes_matches_scipy_when_available():
    scipy_linalg = pytest.importorskip("scipy.linalg")
    rng = np.random.default_rng(99)
    a = rng.standard_normal((50, 8))
    b = rng.standard_normal((50, 8))
    rot, _ = orthogonal_procrustes(a, b)
    r_sp, _ = scipy_linalg.orthogonal_procrustes(a, b)
    assert np.abs(rot - r_sp).max() < 1e-10


def _planted_group(rng, group: str, k: int, n_shared: int, n_extra: int):
    """Reference anchors + a transformed study copy + study-only rows.

    Returns (study_rows, ref_rows, expected) where expected maps
    study id -> exact projected coordinates (the planted reference
    frame positions)."""
    q = _rand_orthogonal(rng, k)
    scale = float(rng.uniform(0.5, 2.0))
    shift = rng.standard_normal((1, k)) * 3
    # study-side coordinates: shared anchors + extra study-only rows
    s_all = rng.standard_normal((n_shared + n_extra, k))
    # the reference frame holds the TRANSFORMED positions of all study
    # rows; only the first n_shared are observed as anchors
    r_all = scale * s_all @ q + shift
    study, ref, expected = [], [], {}
    for i in range(n_shared + n_extra):
        sid = f"{group}_s{i:03d}"
        study.append((group, sid, s_all[i].tolist()))
        expected[sid] = r_all[i]
        if i < n_shared:
            ref.append((group, sid, r_all[i].tolist()))
    return study, ref, expected


def test_grouped_procrustes_projects_study_onto_reference(spark):
    """Per-group recovery: each group carries its OWN planted rotation/
    scale/translation; projections of both anchor and study-only rows
    land on the planted reference-frame positions. A group with a
    single shared anchor is dropped (no identifiable transform)."""
    rng = np.random.default_rng(2024)
    k = 8
    study_rows, ref_rows, expected = [], [], {}
    for g in ("chunk_a", "chunk_b", "chunk_c"):
        s, r, e = _planted_group(rng, g, k, n_shared=40, n_extra=10)
        study_rows += s
        ref_rows += r
        expected.update(e)
    # degenerate group: one shared row -> no transform, must be dropped
    study_rows.append(("chunk_d", "chunk_d_s000", [1.0] * k))
    ref_rows.append(("chunk_d", "chunk_d_s000", [2.0] * k))

    schema = "grp string, sid string, pc array<double>"
    study = spark.createDataFrame(study_rows, schema)
    ref = spark.createDataFrame(
        [(g, i, v) for g, i, v in ref_rows], schema
    )
    out = grouped_procrustes(
        study, ref, group_col="grp", id_col="sid", pc_col="pc"
    )
    got = {r["sid"]: np.array(r["proj"]) for r in out.collect()}
    assert len(got) == 3 * 50  # chunk_d dropped, all a/b/c rows present
    worst = max(np.abs(got[sid] - expected[sid]).max() for sid in got)
    assert worst < 1e-9, worst
    # determinism: a second run returns identical values
    got2 = {r["sid"]: np.array(r["proj"]) for r in out.collect()}
    assert all(np.array_equal(got[sid], got2[sid]) for sid in got)


def test_grouped_procrustes_without_scaling_is_rigid(spark):
    """with_scaling=False fits a rigid (rotation+translation) map: on a
    planted scale≠1 group the projection must NOT match the scaled
    frame, but distances between projected points must match the
    STUDY-side distances (rigidity)."""
    rng = np.random.default_rng(5)
    k = 4
    s, r, expected = _planted_group(rng, "g", k, n_shared=30, n_extra=0)
    schema = "grp string, sid string, pc array<double>"
    study = spark.createDataFrame(s, schema)
    ref = spark.createDataFrame(r, schema)
    out = grouped_procrustes(
        study, ref, group_col="grp", id_col="sid", pc_col="pc",
        with_scaling=False,
    )
    got = {row["sid"]: np.array(row["proj"]) for row in out.collect()}
    src = {sid: np.array(vec) for _, sid, vec in s}
    ids = sorted(got)
    d_proj = np.linalg.norm(got[ids[0]] - got[ids[1]])
    d_src = np.linalg.norm(src[ids[0]] - src[ids[1]])
    assert abs(d_proj - d_src) < 1e-9  # rigid: distances preserved


# --- bench canary verdict (VERDICT_r09 item 2) ----------------------------


def _bench():
    import importlib.util
    import sys

    path = Path(__file__).resolve().parent.parent / "bench.py"
    spec = importlib.util.spec_from_file_location("bench_mod", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_mod"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_canary_verdict_quiet_host_passes():
    b = _bench()
    quiet = {"py_single_sec": 0.37, "spark_parallel_sec": 0.35}
    v = b.canary_verdict(quiet, quiet, {"rows_per_sec": 90_000.0})
    assert v["canary_ok"] is True
    assert v["canary_failures"] == []
    # superset: r12 added streaming_tws_rows_per_sec (VERDICT_r11 item 7)
    assert set(v["canary_bands"]) >= {
        "py_single_sec", "spark_parallel_sec", "streaming_rows_per_sec",
    }


def test_canary_verdict_flags_loaded_host_and_missing_samples():
    b = _bench()
    quiet = {"py_single_sec": 0.37, "spark_parallel_sec": 0.35}
    loaded = {"py_single_sec": 0.88, "spark_parallel_sec": 1.2}
    # loaded at START only — still not comparable
    v = b.canary_verdict(loaded, quiet, {"rows_per_sec": 90_000.0})
    assert v["canary_ok"] is False
    assert any("start.py_single_sec" in f for f in v["canary_failures"])
    # streaming below band (the r9 committed-artifact case: 51.1k)
    v2 = b.canary_verdict(quiet, quiet, {"rows_per_sec": 51_100.0})
    assert v2["canary_ok"] is False
    assert any("streaming" in f for f in v2["canary_failures"])
    # a streaming error dict (no rows_per_sec) must fail, not crash
    v3 = b.canary_verdict(quiet, quiet, {"error": "boom"})
    assert v3["canary_ok"] is False


# --- sizing-gate undercount clamp (ADVICE r9) -----------------------------


def test_brute_force_blocked_rejects_caller_undercount(spark, sf_dir):
    """A caller-supplied n_rows BELOW the true cardinality must not
    reach the driver-collect path: the LIMIT n_rows+1 probe detects
    the lie and falls through to the distributed grid kernel, with
    identical pairs."""
    from laser_hadoop_spark.operators import similarity
    from laser_hadoop_spark.tables import table

    emb = table(spark, sf_dir, "embeddings").limit(80).cache()
    want = {
        (r["vec_a"], r["vec_b"]): r["cosine_sim"]
        for r in similarity.brute_force_pairs_blocked(
            emb, id_col="vec_id", vec_col="embedding", threshold=0.3
        ).collect()
    }
    lied = similarity.brute_force_pairs_blocked(
        emb, id_col="vec_id", vec_col="embedding", threshold=0.3,
        max_collect_rows=40, n_rows=10,  # claims 10, actually 80
    )
    plan = lied._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan  # grid kernel, not collect
    got = {(r["vec_a"], r["vec_b"]): r["cosine_sim"] for r in lied.collect()}
    assert got == want


# --- pair-audit pattern anchoring (ADVICE r9) -----------------------------


def test_payloadish_patterns_anchor_on_identifier_boundaries():
    """The ADVICE r9 false-positive class must stay dead: benign
    identifiers containing payload stems as substrings ('design',
    'assign', 'renamed', 'signature_ok') never match; real payload
    columns in plan spelling (name#5, c_name#12, chunk_text#3,
    vec_a#9, sig_a#2) always match; hash-discipline columns (sig_h,
    gram_h, vec_id) stay excluded."""
    from laser_hadoop_spark.plans.pair_audit import PAYLOADISH

    def hit(s: str) -> bool:
        return any(re.search(p, s) for p in PAYLOADISH)

    for benign in (
        "design#3", "assign#7", "redesign#1", "renamed#2",
        "signature_ok#4", "vec_id#8", "sig_h#5", "gram_h#6",
        "integral#9", "grammar#1",
    ):
        assert not hit(benign), benign
    for payload in (
        "name#5", "c_name#12", "p_name#3", "chunk_text#3", "text#1",
        "embedding#4", "vec_a#9", "sig_a#2", "gram#7", "tokens#1",
        "body#2", "name_a#44",
    ):
        assert hit(payload), payload


def test_flag_payload_exchanges_covers_all_exchange_variants():
    """ADVICE r9: range / single-partition / broadcast exchanges that
    key on payload columns must flag, not just hashpartitioning; the
    allowlist excuses a specific adjudicated line."""
    from laser_hadoop_spark.plans.pair_audit import flag_payload_exchanges

    plan = "\n".join(
        [
            "Exchange hashpartitioning(text#1, 32)",
            "Exchange rangepartitioning(c_name#2 ASC, 32)",
            "BroadcastExchange HashedRelationBroadcastMode(List(embedding#3))",
            "Exchange hashpartitioning(doc_id#4L, gram_h#5L, 32)",  # clean
        ]
    )
    flagged = flag_payload_exchanges(plan)
    assert len(flagged) == 3, flagged
    excused = flag_payload_exchanges(plan, allow=(r"rangepartitioning\(c_name",))
    assert len(excused) == 2, excused


# --- benign-global-window closure (VERDICT_r09 item 6) --------------------

# Every `Window.orderBy(` (no partitionBy -> single-partition WindowExec)
# in the engine, pinned per module. Each instance is an intentionally
# TINY window: its input is a TakeOrdered/limit, a grouped census whose
# key domain is bounded (calendars, deciles, buckets, vocab), or the
# two-pass ordered_cumsum's per-bucket relation — never fact-scale rows.
# Adding a global window anywhere makes this census fail, forcing the
# author to either partition it or document the bound here (the
# WindowExec "No Partition Defined" warning is thereby closed: every
# instance that can emit it is accounted for).
GLOBAL_WINDOW_CENSUS = {
    "operators/chunking.py": 1,    # ordered chunk ids for the gzip sink
    "operators/cumulative.py": 4,  # two-pass rank: per-bucket relations
    #                                (3 code + 1 docstring mention)
    "sources/sinks.py": 1,         # globally-sorted sink's chunk ids
    "queries/events_analytics.py": 2,
    "queries/extras.py": 1,
    "queries/round4.py": 2,
    "queries/round4p.py": 3,
    "queries/round4t.py": 1,
    "queries/round5d.py": 1,
    "queries/round5e.py": 2,
    "queries/round5i.py": 1,
    "queries/round5j.py": 4,
    "queries/round5n.py": 4,
    "queries/round5o.py": 3,
    "queries/round5q.py": 1,
    "queries/round5r.py": 1,
    "queries/round5s.py": 1,
    "queries/round5t.py": 3,
    "queries/round5u.py": 3,
    "queries/round5w.py": 5,
    "queries/round5y.py": 1,
    "queries/round5z.py": 3,
    "queries/round6e.py": 1,       # q_hill_tail: 301-row TakeOrdered rank
    "queries/tpch.py": 1,
}

_GLOBAL_WINDOW_RE = re.compile(r"Window\.orderBy\(")


def test_global_window_census_is_closed():
    counts: dict[str, int] = {}
    for path in sorted(ENGINE_ROOT.rglob("*.py")):
        rel = path.relative_to(ENGINE_ROOT).as_posix()
        n = len(_GLOBAL_WINDOW_RE.findall(path.read_text()))
        if n:
            counts[rel] = n
    assert counts == GLOBAL_WINDOW_CENSUS, (
        "global-window census drifted — partition the new window or "
        f"document its bound here; got {counts}"
    )


def test_hill_tail_global_window_input_is_takeordered(spark, sf_dir):
    """The one census entry the r9 judge called out: q_hill_tail's
    global rank must consume a TakeOrdered/GlobalLimit 301-row
    relation, so the WindowExec warning it emits is provably benign.
    The query's eager localCheckpoint hides the limit from the final
    plan, so the bound is asserted on the exposed pre-checkpoint
    relation (_hill_top — the query's own construction site) and the
    checkpointed scan is confirmed in the final plan."""
    from laser_hadoop_spark.queries.round6e import _hill_top

    top_plan = _hill_top(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"TakeOrderedAndProject\(limit=301", top_plan) or re.search(
        r"GlobalLimit 301", top_plan
    ), top_plan
    df = registry.get("q_hill_tail").fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the global window reads the materialized (<=301-row) checkpoint,
    # never a live fact scan
    assert "Scan ExistingRDD" in plan, plan
