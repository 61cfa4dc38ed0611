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
# ROUND-5 ROTATION (VERDICT_r04 "Next round" #1): round 4 registered
# 79 queries (X123-X203, queries/round4c..round4v) BEYOND round 4's
# window — 77 oracle-backed + 2 rows-only (q_compress_ratio,
# q_wau_hll) — all green in ORACLE_LOCAL_r04.json at sf0.001,
# spot-verified at sf0.01, and green under the adversarial session
# (ANSI mode, non-UTC TZ, shuffle=7), but never driver-checked. The
# round-5 window is the first 50 of the 77 oracle-backed ones in
# registration order (q_ecdf .. q_incremental_dedup); the rows-only
# pair is deliberately EXCLUDED from the prefix (a rows-only check
# would spend a hash-verification slot on a weaker verdict — both
# stay covered by the local rows>0 gate in tests).
#
# After the window: the remaining 27 oracle-backed round-4 queries
# (q_vocab_coverage .. q_minhash_accuracy — round 6's window), then
# any round-5 additions, then regression re-checks verified longest
# ago. Everything past the window stays covered by the full local
# oracle corpus (tests/test_oracle_corpus.py + ORACLE_LOCAL_r04.json).
_DRIVER_PRIORITY = [
    # -- round-5 driver window: 50 oracle-backed, never driver-checked
    "q_ecdf",
    "q_ks_test",
    "q_mann_whitney",
    "q_autocorr_lag1",
    "q_activity_bitmap",
    "q_key_gap_islands",
    "q_histogram2d",
    "q_topk_with_ties",
    "q_bellman_ford",
    "q_rolling_zscore",
    "q_cusum_changepoint",
    "q_profile_cosine",
    "q_minhash_band_pairs",
    "q_mixture_weights",
    "q_nelson_aalen",
    "q_negative_pairs",
    "q_train_split",
    "q_quantile_normalize",
    "q_containment_pairs",
    "q_seasonal_residual",
    "q_spearman_corr",
    "q_theil_sen",
    "q_rrf_fusion",
    "q_shingle_novelty",
    "q_clamped_balance",
    "q_degree_assortativity",
    "q_auc_exact",
    "q_rolling_median",
    "q_forecast_accuracy",
    "q_calibration_bins",
    "q_dsir_weights",
    "q_mutual_info",
    "q_knn_classify",
    "q_cross_correlation",
    "q_embedding_norm_stats",
    "q_dims_variance",
    "q_join_cardinality",
    "q_gopher_rules",
    "q_langid_confusion",
    "q_cohort_ltv",
    "q_quantiles_pruned",
    "q_log2_histogram",
    "q_dau_mau",
    "q_type_token_ratio",
    "q_fano_burstiness",
    "q_business_days",
    "q_f1_scores",
    "q_k_anonymity",
    "q_higher_moments",
    "q_incremental_dedup",
    # -- past the window: the 27 remaining never-driver-checked
    #    oracle-backed round-4 queries (round-6 window head) ----------
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
