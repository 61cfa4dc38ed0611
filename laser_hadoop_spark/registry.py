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
# ROUND-10 ROTATION (VERDICT_r09 "Next round" #1): round 9's window came
# back 50/50 green and dropped the never-driver-checked lag 58 -> 12
# (10 oracle-backed + 2 rows-only). Slots 1-10: those 10 — this closes
# driver coverage to 100% of the 432 oracle-backed corpus.
# q_effect_sizes leads (its oracle carries the r8 DECIMAL-`//` fix and
# deserves driver proof, per the verdict). Slots 11-39: the 29
# r1-vintage greens whose LATEST driver check is still round 1 — the
# oldest unrevisited rows in the whole corpus (regression re-checks;
# r7/r8/r9 already re-verified the twelve older joins/scalars ahead of
# them). Slots 40-50: the 11 oldest r2-vintage greens in the same
# latest-check-then-registration order. The 6 rows-only queries
# (q_ann_ivf, q_approx_count_distinct, q_approx_percentile, q_pagerank,
# q_compress_ratio, q_wau_hll) stay EXCLUDED from the prefix — each is
# accuracy-gated in pytest with a hash-verified exact sibling.
#
# After the window: the rest of the r2-vintage greens in vintage order
# (pre-queueing the r11 window), then registration order via _ordered().
_DRIVER_PRIORITY = [
    # -- slots 1-10: the 10 never-driver-checked oracle-backed
    #    queries — closes driver coverage to 432/432 ----------------
    "q_effect_sizes",
    "q_cholesky2",
    "q_haar_wavelet",
    "q_lsh_scurve_audit",
    "q_bloom_advisor",
    "q_doremi_step",
    "q_hill_tail",
    "q_psm_match",
    "q_impute_census",
    "q_gpd_pot",
    # -- slots 11-39: r1-vintage regression re-checks (latest
    #    driver check = round 1, oldest first by registration) ------
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
    "q_cohort_retention",
    "q_funnel",
    "q_percent_rank_ntile",
    "q_order_distribution",
    "q_rolling_avg_range",
    "q_profile_stats",
    "q_scd2_intervals",
    "q_text_tokens",
    "q_text_quality",
    "q_text_langid",
    "q_text_fingerprint",
    # -- slots 40-50: oldest r2-vintage regression re-checks --------
    "q_scalar_subquery",
    "q_count_conditional",
    "q_null_semantics",
    "q_cumulative_distinct",
    "q_sessionize_batch",
    "q_variant_json",
    "q_broadcast_inner_join",
    "q_embedding_topk",
    "q_embedding_threshold",
    "q_curation_pipeline",
    "q_text_chunks",
    # -- past the window: remaining r2-vintage greens in vintage
    #    order (the r11 window head), then registration order -------
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
