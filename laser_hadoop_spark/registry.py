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
# ROUND-8 ROTATION (VERDICT_r07 "Next round" #1 + #4): round 7's window
# came back 49/50 — the one red, q_cvm_test, is fixed this round
# (t_scaled now VARCHAR on both engines, the X133/X174/X364
# wide-integer discipline; pinned at its exact sf0.01 value in
# tests/test_decimal_outputs.py) and LEADS the window so CORRECTNESS_r08
# records its driver-green. Slots 2-5: the four r7 additions/pins the
# frozen r7 prefix couldn't reach (q_sample_stratified and
# q_dedup_simhash had only r3 rows-only checks before their r7 oracle
# pins; q_dedup_simhash64 and q_jaro_blocked are new). Slots 6-45: the
# next 40 never-driver-checked in registration order (q_capped_sessions
# onward; 98 oracle-backed remained at r7 close -> 56 after this
# window). Slots 46-50: regression re-checks of the five OLDEST
# r1-vintage greens never re-visited (registration order; r7 re-checked
# the first five, all still green). The 6 rows-only queries stay
# EXCLUDED from the prefix.
#
# After the window: remaining never-driver-checked queries in
# registration order (round-9/10 windows), then the rest of the r1-only
# greens oldest-first. Everything past the window stays covered by the
# full local oracle corpus (tests/test_oracle_corpus.py +
# ORACLE_LOCAL_r08.json at the driver's own sf0.01, 438/438).
_DRIVER_PRIORITY = [
    # -- slot 1: the r7 red, fixed (VERDICT_r07 item 1) --------------
    "q_cvm_test",
    # -- slots 2-5: r7 oracle pins/additions, never hash-checked ----
    "q_sample_stratified",
    "q_dedup_simhash",
    "q_dedup_simhash64",
    "q_jaro_blocked",
    # -- slots 6-45: next 40 never-driver-checked (registration
    #    order, all oracle-backed) ----------------------------------
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
    # -- window slots 46-50: regression re-checks — the five oldest
    #    r1-vintage greens never re-visited (VERDICT_r07 item 4) -----
    "q_grouped_counts",
    "q_rollup",
    "q_cube",
    "q_percentile",
    "q_collect_agg",
    # -- past the window: remaining never-driver-checked queries in
    #    registration order (round-9+ windows) ----------------------
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
    "q_grouping_sets",
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
