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
# ROUND-11 ROTATION (VERDICT_r10 items 2 and 4): round 10's window came
# back 50/50 green, closing driver coverage to 432/432 oracle-backed.
# Slots 1-2: q_compress_ratio / q_wau_hll — the LAST two queries never
# in any driver window (rows-only by design; the driver's rows>0 check
# is their right tier) — after this window every registered query has
# a driver row. Slot 3: q_procrustes_kdim, the NEW k-dim Procrustes
# corpus entry (item 4; oracle-backed via planted-transform recovery).
# Slots 4-5: the two r1-vintage rows-only re-checks (latest driver row
# = round 1, the oldest anywhere). Slots 6-44: all 39 r2-vintage greens
# in the queue order pre-staged last round. Slots 45-50: the 6 oldest
# r3-vintage greens. After the window: the remaining 40 r3-vintage
# greens in vintage order (pre-queueing the r12 window), then
# registration order via _ordered().
_DRIVER_PRIORITY = [
    # -- slots 1-5: never-driver-checked (2 rows-only + the new
    #    corpus entry) + the two r1-vintage rows-only re-checks ------
    "q_compress_ratio",
    "q_wau_hll",
    "q_procrustes_kdim",
    "q_approx_count_distinct",
    "q_pagerank",
    # -- slots 6-44: r2-vintage regression re-checks ----------------
    "q_text_tfidf",
    "q_dedup_clusters",
    "q_sample_quota",
    "q_semantic_dedup",
    "q_pretrain_pipeline",
    "q_pricing_summary",
    "q_shipping_priority",
    "q_local_supplier_volume",
    "q_shipmode_priority",
    "q_promo_revenue",
    "q_inactive_customers",
    "q_string_funcs",
    "q_string_key_concat",
    "q_math_funcs",
    "q_date_funcs",
    "q_array_funcs",
    "q_map_funcs",
    "q_pivot",
    "q_scan_project_filter",
    "q_filter_compound",
    "q_having_threshold",
    "q_route_by_arity",
    "q_json_extract",
    "q_union_all",
    "q_intersect",
    "q_except",
    "q_tumbling_window_agg",
    "q_sliding_window_agg",
    "q_session_window",
    "q_grouped_map_normalize",
    "q_scalar_udf",
    "q_grouped_agg_udf",
    "q_python_udtf",
    "q_row_number_chunking",
    "q_ntile_batching",
    "q_rank_topk_per_group",
    "q_window_running_sum",
    "q_lag_lead",
    "q_approx_percentile",
    # -- slots 45-50: oldest r3-vintage regression re-checks --------
    "q_regression_stats",
    "q_hll_sketch",
    "q_stat_aggs",
    "q_time_rollup",
    "q_time_weighted_avg",
    "q_ohlc_candles",
    # -- past the window: remaining r3-vintage greens in vintage
    #    order (the r12 window head), then registration order -------
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
