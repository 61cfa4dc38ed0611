"""Query registry backing /root/repo/__spark_entry__.py.

Each declared query from SURVEY.md §2 registers here with its Spark
implementation and (where SQL-expressible) its DuckDB oracle SQL. The
driver runs both at sf0.01 and compares row-count + schema +
order-insensitive value hash, so:

- every computed column is aliased identically in Spark and SQL;
- floating aggregates are rounded (round 4) on BOTH sides so FP
  summation-order differences between engines can't flip the hash;
- window orderings always include a unique tiebreaker key;
- genuinely non-SQL-expressible ops register with ``oracle=None`` and
  get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None for rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a declared query (and optional DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def _load_all() -> None:
    """Import every query module (side effect: registration)."""
    from laser_hadoop_spark import queries  # noqa: F401

    queries.load_all()


# The driver verifies a 50-entry PREFIX of queries() order (every
# CORRECTNESS_r0N.json is exactly the first 50 entries of that round's
# ordering), so dict order is a verification budget.
#
# ROUND-7 ROTATION (VERDICT_r06 "Next round" #1 + #6): round 6's window
# verified 50/50 (the 27 round-4 stragglers + 23 round-5 heads); 141
# oracle-backed queries remain never-driver-checked. Items 1 and 6 of
# the round-6 verdict jointly shape this window: item 1 asks for the
# next 50 never-checked (q_qte_deciles onward, registration order),
# item 6 asks to reserve the final ~5 slots for regression re-checks of
# the oldest round-1 greens (q_partial_final_agg has not been
# re-visited since r1). We take 45 never-checked + 5 re-checks: lag
# 141 -> 96 AND the re-check rotation starts this round, satisfying
# item 6's hard criterion ("CORRECTNESS_r07 contains >=1 re-check
# entry") at the cost of 5 window slots against item 1's approximate
# "lag -> ~93". The 8 rows-only queries stay EXCLUDED from the prefix.
#
# After the window: remaining never-driver-checked queries in
# registration order (round-8/9 windows), then the rest of the r1-only
# greens oldest-first. Everything past the window stays covered by the
# full local oracle corpus (tests/test_oracle_corpus.py +
# ORACLE_LOCAL_r06.json, 436/436).
_DRIVER_PRIORITY = [
    # -- round-7 driver window: next 45 never-driver-checked (all
    #    oracle-backed, registration order) + 5 oldest-r1 re-checks --
    "q_qte_deciles",
    "q_compression_advisor",
    "q_shuffle_skew_planner",
    "q_hierarchical_share",
    "q_watermark_audit",
    "q_snapshot_asof_diff",
    "q_gini_features",
    "q_position_attribution",
    "q_diff_in_diff",
    "q_fd_miner",
    "q_percentile_quarantine",
    "q_cohens_kappa",
    "q_bh_fdr",
    "q_js_divergence",
    "q_transition_entropy",
    "q_cvm_test",
    "q_allen_census",
    "q_permutation_test",
    "q_neyman_allocation",
    "q_capture_recapture",
    "q_simpson_reversals",
    "q_hits_scores",
    "q_clustering_coefficient",
    "q_cochran_armitage",
    "q_covariate_balance",
    "q_runs_test",
    "q_heaps_fit",
    "q_inventory_turns",
    "q_qini_deciles",
    "q_circular_hours",
    "q_srm_detector",
    "q_kruskal_wallis",
    "q_eta_squared",
    "q_sequence_match",
    "q_acf",
    "q_chi2_residuals",
    "q_g_test",
    "q_profile_shape_cosine",
    "q_haversine_join",
    "q_double_fire_census",
    "q_backlog_aging",
    "q_page_hinkley",
    "q_sequence_support",
    "q_trending_parts",
    "q_churn_sensitivity",
    # -- window slots 46-50: regression re-checks, r1-green, never
    #    re-visited since (VERDICT_r06 item 6) ----------------------
    "q_partial_final_agg",
    "q_count_distinct",
    "q_dedup_exact",
    "q_order_limit",
    "q_semi_join",
    # -- past the window: remaining never-driver-checked queries in
    #    registration order (round-8+ windows) ----------------------
    "q_capped_sessions",
    "q_welch_t",
    "q_durbin_watson",
    "q_sax_symbols",
    "q_brown_forsythe",
    "q_power_analysis",
    "q_point_in_polygon",
    "q_odds_ratio",
    "q_grubbs",
    "q_tokenizer_fertility",
    "q_theil_index",
    "q_rake_keywords",
    "q_hampel_filter",
    "q_good_turing",
    "q_qq_table",
    "q_fk_integrity",
    "q_kendall_tau",
    "q_mcnemar",
    "q_logrank",
    "q_ndcg",
    "q_dup_spans",
    "q_isotonic_fit",
    "q_l_diversity",
    "q_dp_noisy_counts",
    "q_silhouette",
    "q_ecod_outliers",
    "q_lttb_downsample",
    "q_matrix_profile",
    "q_jaro_pairs",
    "q_damerau_pairs",
    "q_triangle_support",
    "q_cronbach_alpha",
    "q_kendalls_w",
    "q_geohash_census",
    "q_mantel_haenszel",
    "q_jonckheere",
    "q_embedding_contamination",
    "q_temperature_mixture",
    "q_pack_boundaries",
    "q_ngram_continuations",
    "q_sign_sketch_fidelity",
    "q_stl_decompose",
    "q_fixed_effects",
    "q_cem_ate",
    "q_weibull_fit",
    "q_control_chart",
    "q_bradley_terry",
    "q_gumbel_fit",
    "q_huber_location",
    "q_geometric_median",
    "q_ess_weights",
    "q_doc_stitch",
    "q_canopy_census",
    "q_rle_advisor",
    "q_volatility",
    "q_corr_matrix",
    "q_ipf_raking",
    "q_cochran_q",
    "q_friedman",
    "q_wasserstein_1d",
    "q_anderson_darling",
    "q_shapley_attribution",
    "q_l_moments",
    "q_chao1_richness",
    "q_fifo_cogs",
    "q_hash_collision_audit",
    "q_krippendorff_alpha",
    "q_rmst",
    "q_average_precision",
    "q_zip_fit",
    "q_mutual_nn",
    "q_hll_audit",
    "q_resource_alloc",
    "q_katz_centrality",
    "q_dbscan_core",
    "q_char_entropy",
    "q_label_prop",
    "q_var_es",
    "q_wilcoxon",
    "q_hodges_lehmann",
    "q_relabel_test",
    "q_jackknife",
    "q_modularity",
    "q_hop2_census",
    "q_procrustes2d",
    "q_eigen2_closed",
    "q_cholesky2",
    "q_effect_sizes",
    "q_haar_wavelet",
    "q_lsh_scurve_audit",
    "q_bloom_advisor",
    "q_doremi_step",
    "q_hill_tail",
    "q_psm_match",
    "q_impute_census",
    "q_gpd_pot",
    "q_anti_join",
    "q_scalar_consistency",
    "q_large_join_multikey",
    "q_outer_join",
    "q_range_join",
    "q_asof_join",
    "q_salted_join",
    "q_rollup",
    "q_cube",
    "q_grouping_sets",
    "q_percentile",
    "q_text_wordcount",
    "q_dedup_ngram_jaccard",
    "q_exists_subquery",
    "q_lateral_topk",
    "q_unpivot",
    "q_first_last_window",
    "q_min_max_by",
    "q_regexp_funcs",
    "q_gap_fill",
    "q_histogram",
    "q_edit_distance_join",
    "q_recursive_cte",
    "q_grouped_counts",
    "q_scalar_subquery",
    "q_cohort_retention",
    "q_funnel",
]


def _ordered() -> dict[str, QuerySpec]:
    _load_all()
    out: dict[str, QuerySpec] = {}
    for name in _DRIVER_PRIORITY:
        out[name] = _REGISTRY[name]
    for name, spec in _REGISTRY.items():
        if name not in out:
            out[name] = spec
    return out


def all_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in _ordered().items()}


def all_oracles() -> dict[str, str]:
    return {n: s.oracle for n, s in _ordered().items() if s.oracle is not None}


def get(name: str) -> QuerySpec:
    _load_all()
    return _REGISTRY[name]


def specs() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)
