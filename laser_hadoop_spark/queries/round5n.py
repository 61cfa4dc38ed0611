"""Round-5 widening queries, fourteenth batch (SURVEY.md §2.13, X268-X272).

Sequential drift detection, gapped sequence mining, decayed ranking,
and two operational censuses:

- X268 Page-Hinkley drift detector: the sequential mean-shift test
  over the daily revenue series — CUSUM's (X133) one-sided online
  sibling, with consistent truncating running means.
- X269 sequence-pattern support census: anchored-start/end and
  adjacency patterns over X260's per-user sequence strings —
  sequential-pattern mining's support-counting step without
  per-stage joins.
- X270 half-life trending score: items ranked by sum of 2^(-age
  weeks) — exact bit-shift decay (X112's per-entity EWMA turned into
  a leaderboard).
- X271 churn-threshold sensitivity: churn rate at 6/12/24-hour
  inactivity cutoffs in ONE pass — the definition-sensitivity table
  that should precede any churn metric.
- X272 capped sessionization: inactivity-gap AND max-duration
  dual-condition sessions (the GA-style rule X22's gap-only form
  approximates), exact via elapsed DIV cap within gap-sessions —
  no iterative splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# --- X268: Page-Hinkley drift detector --------------------------------------

_PH_DELTA_CENTI = 50_000  # drift margin delta: $500 in centi


@register(
    "q_page_hinkley",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev
        FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ),
    cum AS (
        SELECT d, rev,
               SUM(rev) OVER w AS s,
               ROW_NUMBER() OVER (ORDER BY d) AS t
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ),
    dev AS (
        SELECT d, t, rev - s // t - {_PH_DELTA_CENTI} AS dv
        FROM cum
    ),
    ph AS (
        SELECT d, t,
               SUM(dv) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS m
        FROM dev
    ),
    stat AS (
        SELECT d, t, m,
               MIN(m) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS mmin
        FROM ph
    )
    SELECT CAST(MAX(t) AS BIGINT) AS n_days,
           CAST(MAX(m - mmin) AS BIGINT) AS ph_stat_centi,
           CAST(MIN(CASE WHEN rnk = 1 THEN t END) AS BIGINT) AS argmax_day
    FROM (
        SELECT t, m, mmin,
               ROW_NUMBER() OVER (ORDER BY m - mmin DESC, d) AS rnk
        FROM stat
    ) r
    """,
)
def q_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X268: Page-Hinkley mean-shift (drift) detection, exact.

    The sequential drift test streaming ML monitors run: accumulate
    deviations from the RUNNING mean minus a margin delta, and alarm
    when the cumulative climbs lambda above its own running minimum.
    Here the full trace computes in batch: PH statistic = max_t (m_t
    - min_{i<=t} m_i) with m_t = sum of (x_i - mean_i - delta), the
    running mean as a consistent truncating DIV (identical both
    engines). Reports the statistic and WHEN it peaked — CUSUM (X133)
    finds the global split; Page-Hinkley is its one-sided online
    form whose alarm day a production monitor would have fired on.

    100 TB shape: the fact collapses to the calendar-bounded daily
    relation; all windows run over those few-thousand rows.
    """
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("rev")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "d",
        "rev",
        F.sum("rev").over(w).alias("s"),
        F.row_number().over(Window.orderBy("d")).alias("t"),
    )
    dev = cum.select(
        "d",
        "t",
        F.expr(f"rev - s DIV t - {_PH_DELTA_CENTI}").alias("dv"),
    )
    ph = dev.select("d", "t", F.sum("dv").over(w).alias("m"))
    stat = ph.select(
        "d", "t", "m", F.min("m").over(w).alias("mmin")
    )
    ranked = stat.select(
        "t",
        "m",
        "mmin",
        F.row_number()
        .over(Window.orderBy(F.desc(F.col("m") - F.col("mmin")), "d"))
        .alias("rnk"),
    )
    return ranked.agg(
        F.max("t").cast("bigint").alias("n_days"),
        F.max(F.col("m") - F.col("mmin")).cast("bigint").alias(
            "ph_stat_centi"
        ),
        F.min(F.when(F.col("rnk") == 1, F.col("t")))
        .cast("bigint")
        .alias("argmax_day"),
    )


# --- X269: gapped-subsequence support ---------------------------------------

_GAP_PATTERNS = [
    ("starts_purchase", "p%"),
    ("ends_error", "%e"),
    ("adjacent_double_purchase", "%pp%"),
    ("purchase_error_purchase", "%pep%"),
    ("signup_first", "s%"),
]


@register(
    "q_sequence_support",
    tags=("pairs",),
    oracle=f"""
    WITH seqs AS (
        SELECT user_id,
               string_agg(substring(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS seq
        FROM events GROUP BY user_id
    ),
    tot AS (SELECT COUNT(*) AS n FROM seqs)
    SELECT pattern, CAST(n_support AS BIGINT) AS n_support,
           CAST(10000 * n_support // t.n AS BIGINT) AS support_bp
    FROM (
        {" UNION ALL ".join(
            f"SELECT '{name}' AS pattern,"
            f" SUM(CASE WHEN seq LIKE '{pat}' THEN 1 ELSE 0 END) AS n_support"
            f" FROM seqs"
            for name, pat in _GAP_PATTERNS
        )}
    ) u CROSS JOIN tot t
    """,
)
def q_sequence_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X269: sequence-pattern support census (anchored + adjacency).

    Support counting over per-user ordered type strings for the
    pattern classes plain funnels can't ask: anchored starts ('first
    act was a purchase' = LIKE 'p%'), anchored ends ('last act was an
    error' = '%e'), ADJACENT repeats ('two purchases back-to-back
    with nothing between' = '%pp%') and mixed shapes ('%pep%') — the
    support-counting inner loop of GSP/PrefixSpan-style sequential
    mining (X260 covers the purely-gapped funnel membership; X80 the
    contiguous 3-gram paths). Five candidates evaluate as conditional
    counts over ONE sequence relation; support in bp of all users.

    100 TB shape: the user shuffle builds the sequence strings once
    (X260's plan); each added pattern is one more conditional-sum
    column — candidate-set growth costs columns, not passes.
    """
    e = table(spark, sf_dir, "events")
    seqs = (
        e.select(
            "user_id",
            F.struct(
                F.col("ts"),
                F.col("event_id"),
                F.substring("event_type", 1, 1).alias("ch"),
            ).alias("rec"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("rec")), lambda r: r["ch"]
                ),
                "",
            ).alias("seq")
        )
    )
    tot = seqs.agg(F.count("*").alias("n"))
    parts = [
        seqs.agg(
            F.lit(name).alias("pattern"),
            F.sum(F.when(F.col("seq").like(pat), 1).otherwise(0)).alias(
                "n_support"
            ),
        )
        for name, pat in _GAP_PATTERNS
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.crossJoin(F.broadcast(tot)).select(
        "pattern",
        F.col("n_support").cast("bigint").alias("n_support"),
        F.expr("CAST(10000 * n_support DIV n AS BIGINT)").alias(
            "support_bp"
        ),
    )


# --- X270: half-life trending score -----------------------------------------

_TREND_HORIZON_W = 26  # decay horizon in weeks
_TREND_TOPK = 20


@register(
    "q_trending_parts",
    oracle=f"""
    WITH mx AS (
        SELECT MAX(CAST(l_shipdate AS DATE)) AS mxd FROM lineitem
    ),
    scored AS (
        SELECT l.l_partkey AS part,
               (m.mxd - CAST(l.l_shipdate AS DATE)) // 7 AS age_w
        FROM lineitem l CROSS JOIN mx m
        WHERE (m.mxd - CAST(l.l_shipdate AS DATE)) // 7 <= {_TREND_HORIZON_W}
    ),
    totals AS (
        SELECT part,
               SUM(CAST(1 AS BIGINT) << ({_TREND_HORIZON_W} - age_w))
                   AS score_scaled,
               COUNT(*) AS n_recent
        FROM scored GROUP BY part
    ),
    ranked AS (
        SELECT part, score_scaled, n_recent,
               ROW_NUMBER() OVER (ORDER BY score_scaled DESC, part) AS rk
        FROM totals
    )
    SELECT CAST(part AS BIGINT) AS part,
           CAST(score_scaled AS BIGINT) AS score_scaled,
           CAST(n_recent AS BIGINT) AS n_recent, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= {_TREND_TOPK}
    """,
)
def q_trending_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X270: half-life-decayed trending-parts leaderboard, exact.

    Each shipment contributes 2^(-age_weeks) to its part's score — a
    one-week half-life leaderboard where yesterday's hit outranks
    last quarter's bestseller. Exact integers: the score is scaled by
    2^H (H = 26-week horizon) so every contribution is the bit shift
    1 << (H - age_w) — X112's exact geometric decay turned from a
    per-entity trace into a ranking; beyond the horizon contributes 0
    (a true production cutoff: it also bounds the scan by a pushed
    shipdate filter).

    100 TB shape: age and shift are scan-local; one part-key
    aggregate with map-side combine; top-k over the aggregated
    relation (TakeOrderedAndProject / the X157 salted ladder at
    extreme part cardinality).
    """
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_shipdate")
    mx = li.agg(F.max(F.col("l_shipdate").cast("date")).alias("mxd"))
    scored = (
        li.crossJoin(F.broadcast(mx))
        .select(
            F.col("l_partkey").alias("part"),
            F.expr(
                "datediff(mxd, CAST(l_shipdate AS DATE)) DIV 7"
            ).alias("age_w"),
        )
        .where(F.col("age_w") <= _TREND_HORIZON_W)
    )
    totals = scored.groupBy("part").agg(
        F.sum(
            F.expr(f"CAST(1 AS BIGINT) << ({_TREND_HORIZON_W} - age_w)")
        ).alias("score_scaled"),
        F.count("*").alias("n_recent"),
    )
    ranked = totals.select(
        "part",
        "score_scaled",
        "n_recent",
        F.row_number()
        .over(Window.orderBy(F.desc("score_scaled"), "part"))
        .alias("rk"),
    )
    return ranked.where(F.col("rk") <= _TREND_TOPK).select(
        F.col("part").cast("bigint").alias("part"),
        F.col("score_scaled").cast("bigint").alias("score_scaled"),
        F.col("n_recent").cast("bigint").alias("n_recent"),
        F.col("rk").cast("int").alias("rk"),
    )


# --- X271: churn-threshold sensitivity --------------------------------------

_CHURN_THRESHOLDS_H = [6, 12, 24]


@register(
    "q_churn_sensitivity",
    oracle=f"""
    WITH mx AS (SELECT MAX(epoch_us(ts)) AS m FROM events),
    last_seen AS (
        SELECT user_id, MAX(epoch_us(ts)) AS l FROM events GROUP BY user_id
    ),
    aged AS (
        SELECT user_id, (x.m - l) // 3600000000 AS idle_h
        FROM last_seen CROSS JOIN mx x
    )
    SELECT threshold_hours,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(n_churned AS BIGINT) AS n_churned,
           CAST(10000 * n_churned // n_users AS BIGINT) AS churn_bp
    FROM (
        {" UNION ALL ".join(
            f"SELECT CAST({t} AS BIGINT) AS threshold_hours,"
            f" COUNT(*) AS n_users,"
            f" SUM(CASE WHEN idle_h > {t} THEN 1 ELSE 0 END) AS n_churned"
            f" FROM aged"
            for t in _CHURN_THRESHOLDS_H
        )}
    ) u
    """,
)
def q_churn_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X271: churn rate under 6/12/24-hour inactivity definitions.

    'Churn' is a definition, not a fact — this table shows how much
    the rate moves with the inactivity threshold, which should be
    read BEFORE anyone quotes a churn number (a metric that halves
    when the cutoff doubles is measuring the cutoff, not the users).
    Thresholds are hour-scale because the corpus spans 30 days; the
    operator is the same at any unit. One per-user last-activity
    aggregate; all thresholds evaluate as conditional counts over
    the same tiny aged relation. Idle time in TZ-proof epoch micros.

    100 TB shape: one user-grain max aggregate (map-side combine),
    a broadcast scalar for the corpus max, |thresholds|-row output.
    """
    e = table(spark, sf_dir, "events")
    mx = e.agg(F.max(F.expr("unix_micros(ts)")).alias("m"))
    last_seen = e.groupBy("user_id").agg(
        F.max(F.expr("unix_micros(ts)")).alias("l")
    )
    aged = last_seen.crossJoin(F.broadcast(mx)).select(
        F.expr("(m - l) DIV 3600000000").alias("idle_h")
    )
    parts = [
        aged.agg(
            F.lit(t).cast("bigint").alias("threshold_hours"),
            F.count("*").alias("n_users"),
            F.sum(F.when(F.col("idle_h") > t, 1).otherwise(0)).alias(
                "n_churned"
            ),
        )
        for t in _CHURN_THRESHOLDS_H
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.select(
        "threshold_hours",
        F.col("n_users").cast("bigint").alias("n_users"),
        F.col("n_churned").cast("bigint").alias("n_churned"),
        F.expr("CAST(10000 * n_churned DIV n_users AS BIGINT)").alias(
            "churn_bp"
        ),
    )


# --- X272: capped sessionization --------------------------------------------

_SESS_GAP_US = 12 * 3600 * 1_000_000  # 12-hour inactivity gap
_SESS_CAP_US = 24 * 3600 * 1_000_000  # 24-hour max session duration


@register(
    "q_capped_sessions",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, event_id, epoch_us(ts) AS em FROM events
    ),
    gapped AS (
        SELECT user_id, event_id, em,
               CASE WHEN em - LAG(em) OVER w > {_SESS_GAP_US}
                         OR LAG(em) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_gap
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY em, event_id)
    ),
    gsess AS (
        SELECT user_id, event_id, em,
               SUM(new_gap) OVER (PARTITION BY user_id ORDER BY em, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS gs
        FROM gapped
    ),
    capped AS (
        SELECT user_id, gs,
               (em - MIN(em) OVER (PARTITION BY user_id, gs))
                   // {_SESS_CAP_US} AS cap_part
        FROM gsess
    ),
    sessions AS (
        SELECT user_id, gs, cap_part, COUNT(*) AS n_events
        FROM capped GROUP BY user_id, gs, cap_part
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN cap_part > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_cap_split,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(SUM(n_events) // COUNT(*) AS BIGINT)
               AS events_per_session
    FROM sessions
    """,
)
def q_capped_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X272: dual-condition (gap + max-duration) sessionization.

    Production session rules (GA-style) close a session on EITHER an
    inactivity gap OR a max total duration — X22's gap-only form
    never closes a slow-drip session. Cutoffs here are 12 h/24 h to
    match the corpus's ~2 events/user/day cadence (the operator is
    unit-agnostic; web analytics uses 30 min/2 h). Exact without
    iteration: gap-sessions form from the lag/cumsum idiom, then the
    duration cap splits each by (elapsed-since-session-start DIV
    cap) — a closed-form second key, no loop. Census: sessions,
    cap-split count (sessions that ONLY the duration rule closed),
    events per session.

    100 TB shape: one user shuffle serves the lag window, the
    cumulative, and the per-session min — the standard
    sessionization plan with one extra codegen column.
    """
    e = table(spark, sf_dir, "events")
    ev = e.select(
        "user_id", "event_id", F.expr("unix_micros(ts)").alias("em")
    )
    w = Window.partitionBy("user_id").orderBy("em", "event_id")
    gapped = ev.select(
        "user_id",
        "event_id",
        "em",
        F.when(
            (F.col("em") - F.lag("em").over(w) > _SESS_GAP_US)
            | F.lag("em").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_gap"),
    )
    gsess = gapped.select(
        "user_id",
        "event_id",
        "em",
        F.sum("new_gap")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("gs"),
    )
    capped = gsess.select(
        "user_id",
        "gs",
        F.expr(
            f"(em - MIN(em) OVER (PARTITION BY user_id, gs))"
            f" DIV {_SESS_CAP_US}"
        ).alias("cap_part"),
    )
    sessions = capped.groupBy("user_id", "gs", "cap_part").agg(
        F.count("*").alias("n_events")
    )
    return sessions.agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        F.sum(F.when(F.col("cap_part") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_cap_split"),
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.expr(
            "CAST(SUM(n_events) DIV COUNT(*) AS BIGINT)"
        ).alias("events_per_session"),
    )
