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
    # semantic tags ("pairs" = generates candidate pairs via a blocked
    # self-join + dedup — the payload-carry audit class; tagging here
    # makes scripts/audit_pair_shuffles.py and the binding plan test
    # cover future additions BY CONSTRUCTION, VERDICT_r08 item 4)
    tags: frozenset = frozenset()
    # bounded sweep variant for scales where the full DuckDB oracle is
    # intractable (VERDICT_r08 item 3): BOTH sides restricted to the
    # same deterministic subset so the hash check stays exact. Used by
    # scripts/check_oracles.py --bounded; never by the driver.
    bounded_fn: QueryFn | None = None
    bounded_oracle: str | None = None


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bounded_fn: QueryFn | None = None,
    bounded_oracle: str | None = None,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a declared query (and optional DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        _REGISTRY[name] = QuerySpec(
            name,
            fn,
            oracle,
            doc=(fn.__doc__ or "").strip(),
            tags=frozenset(tags),
            bounded_fn=bounded_fn,
            bounded_oracle=bounded_oracle,
        )
        return fn

    return deco


def tagged(tag: str) -> list[str]:
    """Names of registered queries carrying `tag`, registration order."""
    _load_all()
    return [n for n, s in _REGISTRY.items() if tag in s.tags]


def _load_all() -> None:
    """Import every query module (side effect: registration)."""
    from laser_hadoop_spark import queries  # noqa: F401

    queries.load_all()


# The driver verifies a 50-entry PREFIX of queries() order (every
# CORRECTNESS_r0N.json is exactly the first 50 entries of that round's
# ordering), so dict order is a verification budget.
#
# ROUND-12 ROTATION (VERDICT_r11 item 3): round 11's window came back
# 45 hash-green + 5 rows-only (the intentional no-oracle set), closing
# total driver coverage at 439/439 with zero regressions. Slots 1-40:
# the 40 remaining r3-vintage greens, exactly as pre-staged past last
# round's window (vintage = latest round in any CORRECTNESS_r0N.json,
# per LEDGER.json). Slots 41-50: the 10 oldest r4-vintage greens, in
# their CORRECTNESS_r04 window order. After the window: the remaining
# 40 r4-vintage greens in r4 window order (pre-queueing the r13
# window), then registration order via _ordered().
_DRIVER_PRIORITY = [
    # -- slots 1-40: r3-vintage regression re-checks (pre-staged) ----
    "q_market_basket",
    "q_attribution",
    "q_resample_linear",
    "q_pagerank_exact",
    "q_max_concurrent",
    "q_dq_checks",
    "q_zorder_stats",
    "q_key_skew_profile",
    "q_triangle_count",
    "q_kmeans_exact",
    "q_best_split",
    "q_bucketed_fact_join",
    "q_bloom_semi_join",
    "q_text_lm_score",
    "q_ann_ivf",
    "q_contamination",
    "q_doc_repetition",
    "q_embedding_centroid",
    "q_pack_sequences",
    "q_line_dedup",
    "q_redact_pii",
    "q_quantize_embeddings",
    "q_inverted_index",
    "q_winnow_fingerprints",
    "q_prefix_filter_pairs",
    "q_feature_hashing",
    "q_naive_bayes_train",
    "q_disjunctive_pred",
    "q_forecast_revenue",
    "q_volume_shipping",
    "q_market_share",
    "q_returned_items",
    "q_large_volume_orders",
    "q_min_cost_supplier",
    "q_potential_promotion",
    "q_product_profit",
    "q_important_stock",
    "q_top_supplier",
    "q_parts_supplier_count",
    "q_waiting_suppliers",
    # -- slots 41-50: oldest r4-vintage regression re-checks --------
    "q_naive_bayes_score",
    "q_point_in_time_join",
    "q_outlier_count",
    "q_event_transitions",
    "q_ab_test",
    "q_rfm_segments",
    "q_hamming_neighbors",
    "q_top_paths",
    "q_max_drawdown",
    "q_pareto_customers",
    # -- past the window: remaining r4-vintage greens in r4 window
    #    order (the r13 window head), then registration order -------
    "q_ship_latency",
    "q_repeat_interval",
    "q_new_vs_returning",
    "q_dow_seasonality",
    "q_rolling_active_users",
    "q_funnel_windowed",
    "q_cart_abandonment",
    "q_gini_revenue",
    "q_value_deciles",
    "q_duplicate_invoices",
    "q_benford",
    "q_monthly_growth",
    "q_abc_analysis",
    "q_mad",
    "q_pivot_table",
    "q_weighted_median",
    "q_interval_union",
    "q_skyline",
    "q_bigram_pmi",
    "q_minhash_signatures",
    "q_run_length",
    "q_nearest_event",
    "q_zipf_fit",
    "q_latest_state",
    "q_mode_per_group",
    "q_entropy",
    "q_chi_squared",
    "q_heavy_hitters",
    "q_table_diff",
    "q_ewma",
    "q_bfs_distances",
    "q_simhash_exact",
    "q_sample_hash_stratified",
    "q_boxplot_stats",
    "q_copurchase_degree",
    "q_equidepth_histogram",
    "q_partition_checksum",
    "q_incremental_merge",
    "q_audience_jaccard",
    "q_bm25_search",
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
