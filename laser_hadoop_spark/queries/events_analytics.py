"""Event/product-analytics queries over the `events` table.

The capability closure of the reference's counter-style reporting onto
event streams (SURVEY.md §2.9 context): first-seen/cumulative distinct
counting, cohort retention, and ordered-funnel analysis. All three are
window/aggregate compositions that share a single hash partitioning on
user_id for the heavy phase — the property that matters at 100 TB,
where `events` is the big table and per-user state must never leave its
shuffle partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table


@register(
    "q_cumulative_distinct",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    daily_new AS (
        SELECT first_day AS day, COUNT(*) AS n_new
        FROM first_seen GROUP BY first_day
    )
    SELECT day, n_new,
           CAST(SUM(n_new) OVER (ORDER BY day
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT)
               AS cum_users
    FROM daily_new
    """,
)
def q_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new purchasers + running distinct-purchaser total.

    COUNT(DISTINCT) over a growing window is not directly computable,
    so the engine form is first-seen attribution: one aggregate finds
    each user's first day (shuffle on user_id), a per-day count and a
    running sum over the tiny day-level table finish the job. The
    expensive phase touches each user once — no day x user state.
    """
    e = table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    first_seen = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    daily_new = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").alias("n_new")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily_new.select("day", "n_new", F.sum("n_new").over(w).alias("cum_users"))


@register(
    "q_cohort_retention",
    oracle="""
    WITH cohorts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        FROM events WHERE event_type = 'purchase'
    )
    SELECT c.cohort_day,
           date_diff('day', c.cohort_day, a.day) AS offset_days,
           COUNT(*) AS n_active
    FROM cohorts c JOIN activity a ON c.user_id = a.user_id
    WHERE date_diff('day', c.cohort_day, a.day) <= 7
    GROUP BY 1, 2
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: purchasers active N days after first purchase.

    cohort assignment (min day per user), the distinct user-day
    activity set, and the cohort⋈activity join all partition by
    user_id — one shuffle feeds all three; only the final tiny
    (cohort, offset) aggregate re-partitions. COUNT(*) over the
    distinct user-day set counts each user once per day by
    construction (no COUNT(DISTINCT) in the join output needed).
    """
    e = table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    day = F.to_date("ts")
    cohorts = e.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    activity = e.select("user_id", day.alias("day")).distinct()
    offset = F.datediff(F.col("day"), F.col("cohort_day"))
    return (
        cohorts.join(activity, "user_id")
        .where(offset <= 7)
        .groupBy("cohort_day", offset.alias("offset_days"))
        .agg(F.count("*").alias("n_active"))
    )


@register(
    "q_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts >= v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
        GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchase_after_click
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: view -> click (after view) -> purchase (after click).

    Stage N is a conditional min-timestamp aggregate joined against
    stage N-1's result; every join and aggregate keys on user_id, so
    Catalyst chains them on one hash partitioning. The final three
    counts are 1-row aggregates — the funnel never materializes
    per-event state.
    """
    e = table(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_click_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_after_click")))
    )


@register(
    "q_time_rollup",
    oracle="""
    WITH e AS (
        SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d,
               user_id, value
        FROM events
    )
    SELECT CASE WHEN GROUPING(h) = 0 THEN 'hour' ELSE 'day' END AS resolution,
           COALESCE(h, d) AS bucket,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4)
               AS DOUBLE) AS sum_value
    FROM e GROUP BY GROUPING SETS ((h), (d))
    """,
)
def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution time rollup: hourly AND daily
    event aggregates from ONE scan via GROUPING SETS on two bucket
    widths (one Expand + one aggregate — a naive engine scans twice).

    Buckets truncate on the raw epoch-micros long (unix_micros), not
    date_trunc on the session-zoned timestamp: date_trunc('day') shifts
    with spark.sql.session.timeZone while the integer division is
    TZ-independent — the adversarial-session probe catches the
    difference. The decimal SUM spelling is identical on both engines
    (exact, order-independent). At 100 TB this is the continuous-
    aggregate pattern: the Expand doubles rows pre-shuffle but the
    partial aggregate collapses them before the exchange.
    """
    from laser_hadoop_spark.tables import register_views

    register_views(spark, sf_dir, names=("events",))
    return spark.sql(
        """
        WITH e AS (
            SELECT timestamp_micros(
                       (unix_micros(ts) div 3600000000) * 3600000000) AS h,
                   timestamp_micros(
                       (unix_micros(ts) div 86400000000) * 86400000000) AS d,
                   user_id, value
            FROM events
        )
        SELECT CASE WHEN GROUPING(h) = 0 THEN 'hour' ELSE 'day' END AS resolution,
               COALESCE(h, d) AS bucket,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4)
                   AS sum_value
        FROM e GROUP BY GROUPING SETS ((h), (d))
        """
    )


@register(
    "q_time_weighted_avg",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS v_micro,
               (LEAD(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                - epoch_us(ts)) // 1000 AS dt_ms
        FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_intervals,
           CAST(SUM(dt_ms) AS BIGINT) AS total_ms,
           ROUND(CAST(SUM(CAST(v_micro AS HUGEINT) * dt_ms) AS DOUBLE)
                 / CAST(SUM(dt_ms) AS DOUBLE) / 1000000.0, 4) AS twap
    FROM seq
    WHERE dt_ms IS NOT NULL AND dt_ms > 0
    GROUP BY user_id
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS-closure: time-weighted average (TWAP) per user.

    Each observation holds its value until the next event, so the mean
    weights values by interval duration — the irregular-time-series
    aggregate (TimescaleDB `time_weight('LOCF')` semantics) a plain AVG
    gets wrong. Exact cross-engine arithmetic: micro-unit values times
    integer millisecond durations summed in decimal(38) (HUGEINT on the
    oracle side), one IEEE division at the end.

    Plan: one window (lead) and one aggregate, both partitioned by
    user_id — two shuffles on the same key; AQE coalesces. Zero-length
    intervals (same-timestamp ties) drop out as weight-0.
    """
    from laser_hadoop_spark.functions.scalar import micro_units

    e = table(spark, sf_dir, "events")
    ts_us = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy(ts_us, F.col("event_id"))
    seq = e.select(
        "user_id",
        micro_units(F.col("value")).alias("v_micro"),
        ((F.lead(ts_us).over(w) - ts_us) / 1000).cast("bigint").alias("dt_ms"),
    ).where(F.col("dt_ms").isNotNull() & (F.col("dt_ms") > 0))
    return seq.groupBy("user_id").agg(
        F.count("*").alias("n_intervals"),
        F.sum("dt_ms").alias("total_ms"),
        F.round(
            F.sum((F.col("v_micro") * F.col("dt_ms")).cast("decimal(38,0)")).cast(
                "double"
            )
            / F.sum("dt_ms").cast("double")
            / F.lit(1_000_000.0),
            4,
        ).alias("twap"),
    )


@register(
    "q_ohlc_candles",
    oracle="""
    WITH ranked AS (
        SELECT event_type, CAST(ts AS DATE) AS day, value,
               ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                  ORDER BY ts, event_id) AS rn_open,
               ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                  ORDER BY ts DESC, event_id DESC) AS rn_close
        FROM events
    )
    SELECT event_type, day,
           ROUND(MAX(CASE WHEN rn_open  = 1 THEN value END), 4) AS open,
           ROUND(MAX(value), 4) AS high,
           ROUND(MIN(value), 4) AS low,
           ROUND(MAX(CASE WHEN rn_close = 1 THEN value END), 4) AS close,
           COUNT(*) AS n_events
    FROM ranked
    GROUP BY event_type, day
    """,
)
def q_ohlc_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS-closure: OHLC (open-high-low-close) candlestick rollup.

    Daily candles per event type: first/last value by event time (with
    the unique event_id tiebreaker — arg_min/arg_max alone would be
    nondeterministic under timestamp ties) plus min/max extremes. The
    financial-bar shape; open/close select a row *at* an extreme of the
    ordering, high/low are plain extremes, all in one window + one
    aggregate over the same (type, day) partitioning.
    """
    e = table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    w_open = Window.partitionBy("event_type", day).orderBy("ts", "event_id")
    w_close = Window.partitionBy("event_type", day).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = e.select(
        "event_type",
        day.alias("day"),
        "value",
        F.row_number().over(w_open).alias("rn_open"),
        F.row_number().over(w_close).alias("rn_close"),
    )
    return ranked.groupBy("event_type", "day").agg(
        F.round(F.max(F.when(F.col("rn_open") == 1, F.col("value"))), 4).alias("open"),
        F.round(F.max("value"), 4).alias("high"),
        F.round(F.min("value"), 4).alias("low"),
        F.round(F.max(F.when(F.col("rn_close") == 1, F.col("value"))), 4).alias(
            "close"
        ),
        F.count("*").alias("n_events"),
    )


@register(
    "q_market_basket",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM ut),
    s AS (SELECT event_type, COUNT(*) AS supp FROM ut GROUP BY event_type),
    p AS (
        SELECT a.event_type AS ante, b.event_type AS cons, COUNT(*) AS supp_ab
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT p.ante, p.cons, p.supp_ab,
           sa.supp AS supp_a, sb.supp AS supp_b,
           CAST(p.supp_ab * 10000 // sa.supp AS BIGINT) AS conf_bp,
           CAST((CAST(p.supp_ab AS HUGEINT) * n.n_users * 1000000)
                // (CAST(sa.supp AS HUGEINT) * sb.supp) AS BIGINT) AS lift_micro
    FROM p
    JOIN s sa ON sa.event_type = p.ante
    JOIN s sb ON sb.event_type = p.cons
    CROSS JOIN n
    """,
)
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mining-closure: association rules (support / confidence / lift).

    Pairwise co-occurrence of event types across users: for each
    unordered type pair, the user support of both, the confidence of
    ante=>cons in basis points, and the lift in micro-units — all exact
    integer arithmetic (DIV), no FP.

    Plan discipline: ONE distinct over (user, item) feeds everything.
    Per-item supports attach as a count window over the item partition
    and ride through the user-keyed self-join (min() in the pair
    aggregate recovers them), instead of re-aggregating — and
    re-shuffling — the distinct relation once per support table; the
    global user count is the only single-partition stage (one long).
    """
    e = table(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    n = ut.agg(F.count_distinct("user_id").alias("n_users"))
    w_item = Window.partitionBy("event_type")
    uts = ut.withColumn("supp", F.count("*").over(w_item))
    a = uts.alias("a")
    b = uts.alias("b")
    p = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("ante"), F.col("b.event_type").alias("cons")
        )
        .agg(
            F.count("*").alias("supp_ab"),
            F.min("a.supp").alias("supp_a"),
            F.min("b.supp").alias("supp_b"),
        )
    )
    return p.crossJoin(F.broadcast(n)).select(
        "ante",
        "cons",
        "supp_ab",
        "supp_a",
        "supp_b",
        F.expr("CAST((supp_ab * 10000) DIV supp_a AS BIGINT)").alias("conf_bp"),
        F.expr(
            "CAST((CAST(supp_ab AS DECIMAL(38,0)) * n_users * 1000000)"
            " DIV (CAST(supp_a AS DECIMAL(38,0)) * supp_b) AS BIGINT)"
        ).alias("lift_micro"),
    )


@register(
    "q_attribution",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type, value,
               FIRST_VALUE(CASE WHEN event_type IN ('click', 'view')
                                THEN event_type END IGNORE NULLS)
                   OVER w AS first_touch,
               LAST_VALUE(CASE WHEN event_type IN ('click', 'view')
                               THEN event_type END IGNORE NULLS)
                   OVER w AS last_touch
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    conv AS (SELECT * FROM seq WHERE event_type = 'purchase')
    SELECT 'first_touch' AS model, COALESCE(first_touch, 'none') AS touch,
           COUNT(*) AS n_conversions,
           CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS value_micro
    FROM conv GROUP BY 2
    UNION ALL
    SELECT 'last_touch', COALESCE(last_touch, 'none'), COUNT(*),
           CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
    FROM conv GROUP BY 2
    """,
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mining-closure: first-touch / last-touch conversion attribution.

    Every purchase credits the user's earliest (first-touch) and most
    recent (last-touch) preceding marketing touch (click/view), via
    first/last IGNORE NULLS over a [unbounded, -1] row frame — the
    running-state-per-user shape that in the reference would be an
    imperative per-record scan. Purchases with no preceding touch land
    in 'none'. Revenue sums in exact micro-units; one user_id window +
    one small aggregate.
    """
    from laser_hadoop_spark.functions.scalar import micro_units

    e = table(spark, sf_dir, "events")
    touch = F.when(F.col("event_type").isin("click", "view"), F.col("event_type"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = e.select(
        "user_id",
        "event_type",
        "value",
        F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
    )
    conv = seq.where(F.col("event_type") == "purchase")

    def roll(model: str, col: str) -> DataFrame:
        return conv.groupBy(
            F.coalesce(F.col(col), F.lit("none")).alias("touch")
        ).agg(
            F.count("*").alias("n_conversions"),
            F.sum(micro_units(F.col("value"))).alias("value_micro"),
        ).select(F.lit(model).alias("model"), "touch", "n_conversions", "value_micro")

    return roll("first_touch", "first_touch").unionByName(
        roll("last_touch", "last_touch")
    )


@register(
    "q_resample_linear",
    oracle="""
    WITH ev AS (
        SELECT user_id, epoch_us(ts) AS t_us,
               CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS v_micro,
               event_id
        FROM events
    ),
    bounds AS (
        SELECT user_id,
               ((MIN(t_us) + 3599999999) // 3600000000) * 3600000000 AS g_lo,
               (MAX(t_us) // 3600000000) * 3600000000 AS g_hi
        FROM ev GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, unnest(generate_series(g_lo, g_hi, 3600000000)) AS g_us
        FROM bounds WHERE g_lo <= g_hi
    ),
    merged AS (
        SELECT user_id, t_us, v_micro, 0 AS is_grid, event_id FROM ev
        UNION ALL
        SELECT user_id, g_us, NULL, 1, NULL FROM grid
    ),
    walked AS (
        SELECT user_id, t_us, is_grid,
               LAST_VALUE(v_micro IGNORE NULLS) OVER w_fwd AS v0,
               LAST_VALUE(CASE WHEN is_grid = 0 THEN t_us END IGNORE NULLS)
                   OVER w_fwd AS t0,
               FIRST_VALUE(v_micro IGNORE NULLS) OVER w_bwd AS v1,
               FIRST_VALUE(CASE WHEN is_grid = 0 THEN t_us END IGNORE NULLS)
                   OVER w_bwd AS t1
        FROM merged
        WINDOW
          w_fwd AS (PARTITION BY user_id
                    ORDER BY t_us, is_grid, event_id NULLS FIRST
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          w_bwd AS (PARTITION BY user_id
                    ORDER BY t_us, is_grid, event_id NULLS FIRST
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ),
    interp AS (
        SELECT user_id, t_us,
               v0 + CASE WHEN (t1 - t0) // 1000 <= 0 THEN 0
                    ELSE ((v1 - v0) * ((t_us - t0) // 1000))
                         // ((t1 - t0) // 1000) END AS v_interp
        FROM walked
        WHERE is_grid = 1 AND v0 IS NOT NULL AND v1 IS NOT NULL
    )
    SELECT user_id, t_us AS grid_us,
           CAST((v_interp + 50) // 100 AS DOUBLE) / 10000.0 AS value_interp
    FROM interp
    """,
)
def q_resample_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS-closure: resample irregular series onto an hourly grid with
    linear interpolation.

    The regularization step before any fixed-step model: per user, grid
    points between the first and last observation get v0 + (v1-v0) *
    (g-t0)/(t1-t0) from the bracketing events. Implemented without an
    interval join: grid rows UNION into the event stream and one
    forward + one backward IGNORE-NULLS window walk attaches the
    bracketing (t0,v0,t1,v1) — the gap-fill trick (X23) extended to
    two-sided brackets. Exact integer arithmetic: micro-unit values,
    millisecond deltas, integer division — identical on both engines
    (grid timestamps are exact hour multiples in epoch micros).

    Scale shape: the grid is generated per user from a per-user min/max
    aggregate (sequence explode, bounded by span/step), and both
    windows share the user_id partitioning — one shuffle for the
    windows plus the small bounds aggregate.
    """
    e = table(spark, sf_dir, "events")
    from laser_hadoop_spark.functions.scalar import micro_units

    HOUR = 3_600_000_000
    ev = e.select(
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        micro_units(F.col("value")).alias("v_micro"),
        "event_id",
    )
    bounds = ev.groupBy("user_id").agg(
        (((F.min("t_us") + HOUR - 1) / HOUR).cast("bigint") * HOUR).alias("g_lo"),
        ((F.max("t_us") / HOUR).cast("bigint") * HOUR).alias("g_hi"),
    )
    grid = bounds.where(F.col("g_lo") <= F.col("g_hi")).select(
        "user_id",
        F.explode(
            F.sequence(F.col("g_lo"), F.col("g_hi"), F.lit(HOUR))
        ).alias("t_us"),
    )
    merged = ev.select(
        "user_id", "t_us", "v_micro", F.lit(0).alias("is_grid"), "event_id"
    ).unionByName(
        grid.select(
            "user_id",
            "t_us",
            F.lit(None).cast("bigint").alias("v_micro"),
            F.lit(1).alias("is_grid"),
            F.lit(None).cast("bigint").alias("event_id"),
        )
    )
    order = [F.col("t_us"), F.col("is_grid"), F.col("event_id").asc_nulls_first()]
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_bwd = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    ev_t = F.when(F.col("is_grid") == 0, F.col("t_us"))
    walked = merged.select(
        "user_id",
        "t_us",
        "is_grid",
        F.last("v_micro", ignorenulls=True).over(w_fwd).alias("v0"),
        F.last(ev_t, ignorenulls=True).over(w_fwd).alias("t0"),
        F.first("v_micro", ignorenulls=True).over(w_bwd).alias("v1"),
        F.first(ev_t, ignorenulls=True).over(w_bwd).alias("t1"),
    )
    # Spark's DIV and DuckDB's // both truncate toward zero, so the
    # integer recurrence is identical. The final 4-decimal rounding
    # happens IN INTEGER SPACE ((v + 50) DIV 100, values are
    # non-negative) before one exact double division — ROUND(double, 4)
    # straddles .xxxx5 boundaries differently per engine (Spark rounds
    # the shortest decimal repr, DuckDB the binary value) and was
    # measured flipping the 4th decimal on this query.
    interp = F.col("v0") + F.when(
        F.expr("(t1 - t0) DIV 1000") <= 0, F.lit(0)
    ).otherwise(
        F.expr("((v1 - v0) * ((t_us - t0) DIV 1000)) DIV ((t1 - t0) DIV 1000)")
    )
    return (
        walked.where(
            (F.col("is_grid") == 1)
            & F.col("v0").isNotNull()
            & F.col("v1").isNotNull()
        )
        .select(
            "user_id",
            F.col("t_us").alias("grid_us"),
            interp.alias("v_interp"),
        )
        .select(
            "user_id",
            "grid_us",
            (
                F.expr("(v_interp + 50) DIV 100").cast("double") / F.lit(10_000.0)
            ).alias("value_interp"),
        )
    )


@register(
    "q_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ) AS next_type
        FROM events
    ),
    trans AS (
        SELECT event_type AS src, next_type AS dst, COUNT(*) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    ),
    out_tot AS (SELECT src, SUM(n) AS n_out FROM trans GROUP BY src)
    SELECT t.src, t.dst, t.n,
           CAST((t.n * 10000) // o.n_out AS BIGINT) AS prob_bp
    FROM trans t JOIN out_tot o ON o.src = t.src
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-mining closure: first-order Markov transition matrix.

    Per-user event streams -> (src, dst) transition counts and
    basis-point transition probabilities — the empirical Markov chain
    behind next-event prediction and session simulation. One lead
    window on the user_id partitioning, one aggregate over the tiny
    (|types|^2) transition space, exact integers throughout.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), F.col("event_id"))
    seq = e.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    trans = seq.groupBy("src", "dst").agg(F.count("*").alias("n"))
    out_tot = trans.groupBy("src").agg(F.sum("n").alias("n_out"))
    return trans.join(F.broadcast(out_tot), "src").select(
        "src",
        "dst",
        "n",
        F.expr("CAST((n * 10000) DIV n_out AS BIGINT)").alias("prob_bp"),
    )


@register(
    "q_ab_test",
    oracle="""
    WITH assign AS (
        SELECT user_id, user_id % 2 AS arm,
               CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) >= 15
                    THEN 1 ELSE 0 END AS converted
        FROM events GROUP BY user_id
    ),
    arms AS (
        SELECT arm, COUNT(*) AS n, SUM(converted) AS conv
        FROM assign GROUP BY arm
    ),
    wide AS (
        SELECT CAST(MAX(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n0,
               CAST(MAX(CASE WHEN arm = 0 THEN conv END) AS BIGINT) AS c0,
               CAST(MAX(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n1,
               CAST(MAX(CASE WHEN arm = 1 THEN conv END) AS BIGINT) AS c1
        FROM arms
    )
    SELECT n0, c0, n1, c1,
           CAST((c0 * 10000) // n0 AS BIGINT) AS rate0_bp,
           CAST((c1 * 10000) // n1 AS BIGINT) AS rate1_bp,
           (CAST(c0 * n1 - c1 * n0 AS HUGEINT) * (c0 * n1 - c1 * n0)) * 2500
               * (n0 + n1)
             > 9604 * CAST(n0 AS HUGEINT) * n1 * (c0 + c1)
               * ((n0 + n1) - (c0 + c1))
               AS significant_95
    FROM wide
    """,
)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats-closure: two-proportion z-test decided in pure integers.

    Users split into arms by user_id parity; conversion = a heavy
    purchaser (>= 15 purchase events — 'any purchase' is degenerate on
    this corpus, every user has one).
    The pooled two-proportion z-test |z| > 1.96 is restated with every
    denominator cleared: with z^2 = 1.96^2 = 9604/2500, significance is
    (c0*n1 - c1*n0)^2 * 2500 * (n0+n1) > 9604 * n0 * n1 * c * (N - c)
    — exact integer cross-multiplication, no sqrt, no float, so the
    verdict cannot flip on rounding. The same clearing works for any
    rational critical value. One per-user aggregate + one tiny pivot.
    """
    e = table(spark, sf_dir, "events")
    assign = (
        e.groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("n_purch")
        )
        .select(
            (F.col("user_id") % 2).alias("arm"),
            F.when(F.col("n_purch") >= 15, 1).otherwise(0).alias("converted"),
        )
    )
    arms = assign.groupBy("arm").agg(
        F.count("*").alias("n"), F.sum("converted").alias("conv")
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("conv"))).alias("c1"),
    )
    diff = F.col("c0") * F.col("n1") - F.col("c1") * F.col("n0")
    c = F.col("c0") + F.col("c1")
    n_tot = F.col("n0") + F.col("n1")
    lhs = diff.cast("decimal(38,0)") * diff * 2500 * n_tot
    rhs = (
        F.lit(9604).cast("decimal(38,0)")
        * F.col("n0")
        * F.col("n1")
        * c
        * (n_tot - c)
    )
    return wide.select(
        "n0",
        "c0",
        "n1",
        "c1",
        F.expr("CAST((c0 * 10000) DIV n0 AS BIGINT)").alias("rate0_bp"),
        F.expr("CAST((c1 * 10000) DIV n1 AS BIGINT)").alias("rate1_bp"),
        (lhs > rhs).alias("significant_95"),
    )


@register(
    "q_rfm_segments",
    oracle="""
    WITH corpus AS (SELECT MAX(epoch_us(ts)) AS now_us FROM events),
    rfm AS (
        SELECT user_id,
               (SELECT now_us FROM corpus) - MAX(epoch_us(ts)) AS recency_us,
               COUNT(*) AS frequency,
               SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT))
                   AS monetary_micro
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ),
    scored AS (
        SELECT user_id,
               NTILE(4) OVER (ORDER BY recency_us, user_id) AS r,
               NTILE(4) OVER (ORDER BY frequency DESC, user_id) AS f,
               NTILE(4) OVER (ORDER BY monetary_micro DESC, user_id) AS m
        FROM rfm
    )
    SELECT r, f, m, COUNT(*) AS n_users,
           CAST(MIN(user_id) AS BIGINT) AS example_user
    FROM scored GROUP BY r, f, m
    """,
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytics-closure: RFM (recency/frequency/monetary) segmentation.

    Per purchaser: recency vs the corpus max event time, purchase
    count, and exact micro-unit spend — then quartile scores via ntile
    with the unique user_id tiebreaker (ntile boundaries are otherwise
    tie-nondeterministic), and the 4x4x4 segment census. Quartile 1 is
    best on every axis (most recent / most frequent / highest spend).

    Scale: one per-user aggregate (the only big fact shuffle); the
    three quartile scores are NTILE(4)'s closed form over three
    distributed global row numbers (operators/cumulative.ordered_cumsum
    chained once per ordering, each a parallel range shuffle of the
    user-level table + closed_form_ntile) — no single-partition window
    anywhere, so the plan survives extreme user cardinality. The oracle
    keeps DuckDB's NTILE spelling; hash equality proves equivalence.
    """
    from laser_hadoop_spark.operators.cumulative import (
        closed_form_ntile,
        ordered_cumsum,
    )

    e = table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    from laser_hadoop_spark.functions.scalar import micro_units

    rfm = e.groupBy("user_id").agg(
        F.max(F.unix_micros("ts")).alias("last_us"),
        F.count("*").alias("frequency"),
        F.sum(micro_units(F.col("value"))).alias("monetary_micro"),
    )
    now = rfm.agg(F.max("last_us").alias("now_us"))
    # Pin the user-level table once: the count job and the first cumsum
    # pass would otherwise each redo the events scan + groupBy.
    base = (
        rfm.crossJoin(F.broadcast(now))
        .withColumn("recency_us", F.col("now_us") - F.col("last_us"))
        .localCheckpoint(eager=True)
    )
    n_row = base.agg(F.count("*").alias("n"))
    # Round 12 (guide §2.6 overlap independent jobs): the three global
    # orderings are INDEPENDENT rank passes over the pinned user table
    # — chaining them serialized three range-shuffle+checkpoint jobs
    # (each re-carrying the previous pass's rank column through its
    # shuffle). Submit them from a small thread pool so each job's tail
    # back-fills the others' idle cores, and equi-join the three
    # (user_id, rank) outputs back. Measured 2.90 -> 1.52 s noop at
    # sf0.1; identical rows at every test scale (the join keys on the
    # unique user_id, so assembly order can't change values).
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    orderings = [
        ("rn_r", [F.col("recency_us").asc(), F.col("user_id").asc()]),
        ("rn_f", [F.col("frequency").desc(), F.col("user_id").asc()]),
        ("rn_m", [F.col("monetary_micro").desc(), F.col("user_id").asc()]),
    ]

    def rank_pass(item):
        name, order = item
        return ordered_cumsum(
            base.select("user_id", "recency_us", "frequency", "monetary_micro"),
            order_by=order,
            row_number_col=name,
        ).select("user_id", name)

    with ThreadPoolExecutor(max_workers=3) as pool:
        rn_r, rn_f, rn_m = list(
            pool.map(inheritable_thread_target(rank_pass), orderings)
        )
    s = (
        base.select("user_id")
        .join(rn_r, "user_id")
        .join(rn_f, "user_id")
        .join(rn_m, "user_id")
    )
    scored = s.crossJoin(F.broadcast(n_row)).select(
        "user_id",
        closed_form_ntile("rn_r", "n", 4).cast("int").alias("r"),
        closed_form_ntile("rn_f", "n", 4).cast("int").alias("f"),
        closed_form_ntile("rn_m", "n", 4).cast("int").alias("m"),
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count("*").alias("n_users"),
        F.min("user_id").cast("bigint").alias("example_user"),
    )


@register(
    "q_top_paths",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type, 1) OVER w AS e2,
               LEAD(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    paths AS (
        SELECT event_type || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n
        FROM seq WHERE e3 IS NOT NULL
        GROUP BY 1
    ),
    ranked AS (
        SELECT path, n, ROW_NUMBER() OVER (ORDER BY n DESC, path) AS rnk
        FROM paths
    )
    SELECT rnk, path, n FROM ranked WHERE rnk <= 15
    """,
)
def q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-mining closure: top-k 3-event paths (clickstream mining).

    Sliding 3-grams over each user's event sequence (two leads on one
    user_id window — the token-shingle trick applied to behavioral
    sequences), counted and ranked with a deterministic (count, path)
    tiebreak. The path space is |types|^3, so the aggregate output is
    tiny regardless of input scale; TakeOrdered handles the top-k.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), F.col("event_id"))
    seq = e.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e3").isNotNull())
    paths = seq.select(
        F.concat_ws(">", "e1", "e2", "e3").alias("path")
    ).groupBy("path").agg(F.count("*").alias("n"))
    top = paths.orderBy(F.col("n").desc(), F.col("path")).limit(15)
    return top.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.col("n").desc(), F.col("path")))
    ).select("rnk", "path", "n")


@register(
    "q_max_drawdown",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS v_micro,
               MAX(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS run_max_micro
        FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id,
           CAST(MAX(run_max_micro - v_micro) AS BIGINT) AS max_drawdown_micro,
           CAST(MAX(run_max_micro) AS BIGINT) AS peak_micro,
           COUNT(*) AS n_points
    FROM seq GROUP BY user_id
    """,
)
def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS-closure: maximum drawdown per user value series.

    The classic risk metric: largest drop from a running peak —
    max(running_max - value) over the event-time-ordered series, in
    exact micro-units. One running-max window and one aggregate on the
    same user_id partitioning.
    """
    from laser_hadoop_spark.functions.scalar import micro_units

    e = table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seq = e.select(
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        "event_id",
        micro_units(F.col("value")).alias("v_micro"),
    ).withColumn("run_max_micro", F.max("v_micro").over(w))
    return seq.groupBy("user_id").agg(
        F.max(F.col("run_max_micro") - F.col("v_micro")).alias("max_drawdown_micro"),
        F.max("run_max_micro").alias("peak_micro"),
        F.count("*").alias("n_points"),
    )


@register(
    "q_repeat_interval",
    oracle="""
    WITH gaps AS (
        SELECT user_id,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ) AS gap_us
        FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id, COUNT(*) AS n_gaps,
           CAST(MIN(gap_us) // 1000000 AS BIGINT) AS min_gap_s,
           CAST(MAX(gap_us) // 1000000 AS BIGINT) AS max_gap_s,
           CAST((SUM(gap_us) // COUNT(*)) // 1000000 AS BIGINT)
               AS mean_gap_s
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
)
def q_repeat_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytics-closure: inter-purchase interval statistics per user.

    Consecutive-purchase gaps via one lag window, then min/max/mean gap
    in whole seconds — all integer arithmetic (the mean is an integer
    division of exact micro sums, truncating identically on both
    engines). The repeat-purchase-cadence input to churn models.
    """
    e = table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), F.col("event_id"))
    gaps = e.select(
        "user_id",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count("*").alias("n_gaps"),
        F.expr("CAST(MIN(gap_us) DIV 1000000 AS BIGINT)").alias("min_gap_s"),
        F.expr("CAST(MAX(gap_us) DIV 1000000 AS BIGINT)").alias("max_gap_s"),
        F.expr(
            "CAST((SUM(gap_us) DIV COUNT(*)) DIV 1000000 AS BIGINT)"
        ).alias("mean_gap_s"),
    )


@register(
    "q_new_vs_returning",
    oracle="""
    WITH firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    daily AS (
        SELECT CAST(e.ts AS DATE) AS day,
               CASE WHEN CAST(e.ts AS DATE) = f.first_day
                    THEN 'new' ELSE 'returning' END AS cohort,
               e.user_id
        FROM events e JOIN firsts f ON f.user_id = e.user_id
        WHERE e.event_type = 'purchase'
    )
    SELECT day, cohort,
           COUNT(*) AS n_purchases,
           COUNT(DISTINCT user_id) AS n_users
    FROM daily GROUP BY day, cohort
    """,
)
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytics-closure: daily new-vs-returning purchaser split.

    First-seen attribution (one per-user aggregate) classifies every
    purchase day as the user's first or a return visit; the daily
    (cohort, purchases, distinct users) report follows. Both the firsts
    aggregate and the classify join partition on user_id — one shuffle
    feeds both — and only the tiny day-level aggregate re-partitions.
    """
    e = table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    day = F.col("ts").cast("date")
    firsts = e.groupBy("user_id").agg(F.min(day).alias("first_day"))
    daily = e.join(firsts, "user_id").select(
        day.alias("day"),
        F.when(day == F.col("first_day"), "new").otherwise("returning").alias(
            "cohort"
        ),
        "user_id",
    )
    return daily.groupBy("day", "cohort").agg(
        F.count("*").alias("n_purchases"),
        F.count_distinct("user_id").alias("n_users"),
    )


@register(
    "q_dow_seasonality",
    oracle="""
    WITH counts AS (
        SELECT event_type, dayofweek(CAST(ts AS DATE)) AS dow,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT event_type, SUM(n) AS n_tot FROM counts GROUP BY event_type)
    SELECT c.event_type, CAST(c.dow AS INT) AS dow, c.n,
           CAST((c.n * 70000) // t.n_tot AS BIGINT) AS share_x7_bp
    FROM counts c JOIN tot t ON t.event_type = c.event_type
    """,
)
def q_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytics-closure: day-of-week seasonality profile.

    Per event type, the weekday activity distribution scaled so a
    uniform week reads 10000 bp per day (share x 7 in basis points —
    values over 10000 mark hot days). Integer arithmetic only; weekday
    numbering pinned to DuckDB's dayofweek (0=Sunday) via Spark's
    dayofweek - 1.
    """
    e = table(spark, sf_dir, "events")
    counts = e.groupBy(
        "event_type", (F.dayofweek(F.col("ts").cast("date")) - 1).alias("dow")
    ).agg(F.count("*").alias("n"))
    tot = counts.groupBy("event_type").agg(F.sum("n").alias("n_tot"))
    return counts.join(F.broadcast(tot), "event_type").select(
        "event_type",
        F.col("dow").cast("int").alias("dow"),
        "n",
        F.expr("CAST((n * 70000) DIV n_tot AS BIGINT)").alias("share_x7_bp"),
    )


@register(
    "q_rolling_active_users",
    oracle="""
    WITH user_days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    contrib AS (
        SELECT user_id, day + CAST(off AS INTEGER) AS window_day
        FROM user_days,
             (SELECT unnest(generate_series(0, 6)) AS off)
    ),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM user_days)
    SELECT window_day, COUNT(DISTINCT user_id) AS wau
    FROM contrib CROSS JOIN bounds
    WHERE window_day BETWEEN lo + CAST(6 AS INTEGER) AND hi
    GROUP BY window_day
    """,
)
def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytics-closure: exact rolling 7-day active users (WAU curve).

    Sliding-window COUNT(DISTINCT) does not decompose, so the exact
    algorithm explodes each distinct (user, day) into the 7 window-end
    days it contributes to, then distinct-counts per window day — cost
    is 7x the user-day table (already deduped), NOT 7x the event
    stream, and every stage is an equi-shuffle. Full windows only
    (first 6 days trimmed). The approximate sibling at extreme scale is
    per-day HLL sketches unioned over the window (q_hll_sketch shows
    the union machinery).
    """
    e = table(spark, sf_dir, "events")
    user_days = e.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    contrib = user_days.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        "day",
    ).select("user_id", F.date_add(F.col("day"), F.col("off")).alias("window_day"))
    bounds = user_days.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    return (
        contrib.crossJoin(F.broadcast(bounds))
        .where(
            (F.col("window_day") >= F.date_add(F.col("lo"), 6))
            & (F.col("window_day") <= F.col("hi"))
        )
        .groupBy("window_day")
        .agg(F.count_distinct("user_id").alias("wau"))
    )


@register(
    "q_funnel_windowed",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(epoch_us(ts)) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click'
          AND epoch_us(e.ts) >= v.t_view
          AND epoch_us(e.ts) < v.t_view + 604800000000
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase'
          AND epoch_us(e.ts) >= c.t_click
          AND epoch_us(e.ts) < c.t_click + 604800000000
        GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click_7d,
           (SELECT COUNT(*) FROM p) AS n_purchase_7d,
           CAST((SELECT COUNT(*) FROM p) * 10000
                // (SELECT COUNT(*) FROM v) AS BIGINT) AS conv_bp
    """,
)
def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel-closure: conversion-window funnel (7-day step deadlines).

    q_funnel counts any-time progressions; real funnels expire — each
    step must land within 7 days of the previous one. Same
    stage-N-joins-stage-N-1 shape on one user_id partitioning, with the
    deadline as an extra integer-microsecond predicate, plus the
    end-to-end conversion in basis points.
    """
    e = table(spark, sf_dir, "events")
    WEEK_US = 7 * 86_400 * 1_000_000
    ts_us = F.unix_micros("ts")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(ts_us).alias("t_view"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where((ts_us >= F.col("t_view")) & (ts_us < F.col("t_view") + WEEK_US))
        .groupBy("user_id")
        .agg(F.min(ts_us).alias("t_click"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where((ts_us >= F.col("t_click")) & (ts_us < F.col("t_click") + WEEK_US))
        .groupBy("user_id")
        .agg(F.min(ts_us).alias("t_purchase"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_click_7d")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_7d")))
        .select(
            "n_view",
            "n_click_7d",
            "n_purchase_7d",
            F.expr("CAST(n_purchase_7d * 10000 DIV n_view AS BIGINT)").alias(
                "conv_bp"
            ),
        )
    )


@register(
    "q_cart_abandonment",
    oracle="""
    WITH clicks AS (
        SELECT user_id, event_id, epoch_us(ts) AS t_click,
               CAST(ts AS DATE) AS day
        FROM events WHERE event_type = 'click'
    ),
    followed AS (
        SELECT DISTINCT c.event_id
        FROM clicks c JOIN events p
          ON p.user_id = c.user_id
         AND p.event_type = 'purchase'
         AND epoch_us(p.ts) > c.t_click
         AND epoch_us(p.ts) <= c.t_click + 86400000000
    )
    SELECT c.day,
           COUNT(*) AS n_clicks,
           CAST(SUM(CASE WHEN f.event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_abandoned,
           CAST(SUM(CASE WHEN f.event_id IS NULL THEN 1 ELSE 0 END) * 10000
                // COUNT(*) AS BIGINT) AS abandon_bp
    FROM clicks c LEFT JOIN followed f ON f.event_id = c.event_id
    GROUP BY c.day
    """,
)
def q_cart_abandonment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel-closure: daily cart-abandonment rate.

    A click is abandoned when no purchase by the same user lands within
    24h after it. The followed-click set comes from a user-keyed
    interval join (equi-key bounds the comparisons, the PIT-join shape)
    deduped per click; a left anti-style null check then splits each
    day's clicks into converted vs abandoned, with the rate in exact
    basis points.
    """
    e = table(spark, sf_dir, "events")
    DAY_US = 86_400 * 1_000_000
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("t_click"),
        F.col("ts").cast("date").alias("day"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.unix_micros("ts").alias("t_purchase")
    )
    followed = (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("t_purchase") > F.col("t_click"))
            & (F.col("t_purchase") <= F.col("t_click") + DAY_US),
        )
        .select("event_id")
        .distinct()
        .withColumn("followed", F.lit(1))
    )
    return (
        clicks.join(followed, "event_id", "left")
        .groupBy("day")
        .agg(
            F.count("*").alias("n_clicks"),
            F.sum(F.when(F.col("followed").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_abandoned"),
        )
        .select(
            "day",
            "n_clicks",
            "n_abandoned",
            F.expr("CAST(n_abandoned * 10000 DIV n_clicks AS BIGINT)").alias(
                "abandon_bp"
            ),
        )
    )
