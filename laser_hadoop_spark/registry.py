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


# The driver verifies a 50-entry PREFIX of queries() order (rounds 1-4:
# each CORRECTNESS_r0N.json is exactly the first 50 entries of that
# round's ordering), so dict order is a verification budget.
#
# ROUND-6 ROTATION (VERDICT_r05 "Next round" #1): after round 5's
# window (CORRECTNESS_r05: 50/50 hash-green), 166 oracle-backed
# queries remain never-driver-checked — the 27 round-4 stragglers
# (q_vocab_coverage .. q_minhash_accuracy, exactly as VERDICT_r05
# directed) plus 139 round-5 registrations. The round-6 window is the
# 27 stragglers followed by the first 23 round-5 queries in
# registration order. The 2 rows-only queries (q_compress_ratio,
# q_wau_hll) stay EXCLUDED from the prefix (a rows-only check would
# spend a hash-verification slot on a weaker verdict — both stay
# covered by the local rows>0 gate in tests).
#
# After the window: the remaining never-driver-checked round-5
# queries in registration order (round-7/8/9 windows at 50/round),
# then regression re-checks verified longest ago (VERDICT_r05 #6:
# once the lag clears a window's width, ~5 slots/round rotate onto
# old greens, oldest first). Everything past the window stays covered
# by the full local oracle corpus (tests/test_oracle_corpus.py +
# ORACLE_LOCAL_r06.json, 411/411).
_DRIVER_PRIORITY = [
    # -- round-6 driver window: the 27 round-4 stragglers, then the
    #    first 23 never-driver-checked round-5 queries in
    #    registration order (all oracle-backed) --------------------
    "q_vocab_coverage",
    "q_price_volume_mix",
    "q_decile_migration",
    "q_null_safe_join",
    "q_sprt",
    "q_cuped",
    "q_winsorized_mean",
    "q_longest_streak",
    "q_mean_family",
    "q_rolling_mode",
    "q_cross_source_dupes",
    "q_knee_point",
    "q_readability",
    "q_binary_segmentation",
    "q_rolling_corr",
    "q_seasonality_strength",
    "q_reorder_rate",
    "q_ingest_drift",
    "q_funnel_latency",
    "q_growth_accounting",
    "q_psi",
    "q_mood_median_test",
    "q_lorenz_points",
    "q_rare_token_exposure",
    "q_weekday_hour_heatmap",
    "q_hhi_concentration",
    "q_minhash_accuracy",
    "q_grid_spatial_join",
    "q_record_linkage",
    "q_countmin_audit",
    "q_bloom_fpr_audit",
    "q_embedding_covariance",
    "q_retrieval_metrics",
    "q_weighted_sample",
    "q_kl_divergence",
    "q_bpe_merges",
    "q_multisource_reconcile",
    "q_nearest_hub",
    "q_kcore_peel",
    "q_kmv_distinct_audit",
    "q_luhn_checksum",
    "q_bootstrap_ci",
    "q_mann_kendall",
    "q_revenue_proration",
    "q_zonemap_audit",
    "q_dedup_survivors",
    "q_set_cover",
    "q_km_survival",
    "q_itemset_triples",
    "q_sorted_neighborhood",
    # -- past the window: remaining never-driver-checked round-5
    #    queries in registration order (round-7+ windows) ----------
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
    # -- then regression re-checks, verified-longest-ago first
    #    (all r1-green, last driver-checked in r01) -------------------
    "q_partial_final_agg",
    "q_count_distinct",
    "q_dedup_exact",
    "q_order_limit",
    "q_semi_join",
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
