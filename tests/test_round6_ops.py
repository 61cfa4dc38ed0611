"""Semantic sanity for the round-6 numeric operators.

The oracle corpus proves Spark == DuckDB; these prove the VALUES mean
what the docstrings claim — planted-parameter recovery and internal
consistency that an identical-but-wrong spelling on both sides would
not survive.
"""

from __future__ import annotations

from laser_hadoop_spark import registry


def test_procrustes_recovers_planted_rotation(spark, sf_dir):
    """The target set is the source rotated by the 3-4-5 rotation
    (cos=0.6, sin=0.8) plus ±10 jitter on ~10k-range coordinates —
    the recovered micro cos/sin must land within jitter noise."""
    row = registry.get("q_procrustes2d").fn(spark, sf_dir).collect()[0]
    assert abs(row.cos_micro - 600000) < 5000
    assert abs(row.sin_micro - 800000) < 5000
    # unit-norm identity: cos^2 + sin^2 ~ 1 (micro^2 scale)
    assert abs(row.cos_micro**2 + row.sin_micro**2 - 10**12) < 2 * 10**10


def test_hll_estimate_within_error_envelope(spark, sf_dir):
    """64 registers -> ~13% standard error; assert a 4-sigma band."""
    rows = registry.get("q_hll_audit").fn(spark, sf_dir).collect()
    assert len(rows) == 64
    est, exact = rows[0].hll_est, rows[0].exact_distinct
    assert exact > 0
    assert 0.5 * exact < est < 1.6 * exact


def test_katz_score_consistent_with_walk_counts(spark, sf_dir):
    rows = registry.get("q_katz_centrality").fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.katz_q64 == 16 * r.walks1 + 4 * r.walks2 + r.walks3
        assert r.walks1 > 0


def test_modularity_in_range_and_consistent(spark, sf_dir):
    rows = registry.get("q_modularity").fn(spark, sf_dir).collect()
    assert rows
    q = rows[0].q_micro
    assert -500000 <= q <= 1000000
    for r in rows:
        assert r.q_micro == q  # global constant on every row
        assert 0 <= r.intra_edges
        assert r.degree_sum >= 2 * r.intra_edges  # intra edges use 2 deg each


def test_hill_tail_positive_and_k_consistent(spark, sf_dir):
    rows = registry.get("q_hill_tail").fn(spark, sf_dir).collect()
    assert [r.k for r in rows] == [100, 300]
    for r in rows:
        assert r.alpha_micro > 0
        assert r.sum_lnr_micro > 0
        # alpha = 1e12 * k / sum, re-derivable from the evidence cols
        assert r.alpha_micro == 10**12 * r.k // r.sum_lnr_micro


def test_gpd_pot_moments_sane(spark, sf_dir):
    row = registry.get("q_gpd_pot").fn(spark, sf_dir).collect()[0]
    assert row.n_exceed > 0
    assert row.mean_excess_centi > 0
    assert row.beta_centi > 0
    # xi < 1/2 is where MOM is valid; order values are light-tailed
    # enough here that the fit must not blow past it
    assert row.xi_micro < 500000


def test_dbscan_labels_consistent(spark, sf_dir):
    rows = registry.get("q_dbscan_core").fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.label == "core":
            assert r.n_nb >= 4
        elif r.label == "noise":
            assert r.n_nb < 4
    assert {r.label for r in rows} <= {"core", "border", "noise"}


def test_impute_census_shift_direction(spark, sf_dir):
    """Median imputation pulls the post-mean TOWARD the median:
    post-mean must sit between observed mean and median (or equal)."""
    rows = registry.get("q_impute_census").fn(spark, sf_dir).collect()
    assert len(rows) == 5
    # the 5% md5 mask can miss a small segment entirely at sf0.001 —
    # require mass only in aggregate
    assert sum(r.n_imputed for r in rows) > 0
    for r in rows:
        assert 0 <= r.n_imputed < r.n
        lo = min(r.mean_observed_centi, r.seg_median)
        hi = max(r.mean_observed_centi, r.seg_median)
        assert lo - 1 <= r.mean_after_centi <= hi + 1
