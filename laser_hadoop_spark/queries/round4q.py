"""Round-4 widening queries, seventeenth batch (SURVEY.md §2.12,
X191-X193).

Time-series and retail closure: a rolling 14-day correlation between
two event series (the dynamic sibling of X158's fixed-lag scan),
day-of-week seasonality STRENGTH (variance explained by the weekly
profile — X86 showed the profile, this scores it), and the part
reorder rate (repeat-purchase share — the simplest retention number a
merchandiser reads).

Cross-engine discipline: frame materialization via calendar-bounded
range self-joins, per-group means micro-fixed-pointed BEFORE squared
deviations so every sum of squares is an exact integer, power sums
through DECIMAL(38)/HUGEINT, one rounded float per window
correlation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table


@register(
    "q_rolling_corr",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS x,
               SUM(CASE WHEN event_type = 'click'
                        THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS y
        FROM events GROUP BY CAST(ts AS DATE)
    ),
    frames AS (
        SELECT a.day, COUNT(*) AS n,
               SUM(b.x) AS sx, SUM(b.y) AS sy,
               SUM(CAST(b.x AS HUGEINT) * b.x) AS sxx,
               SUM(CAST(b.y AS HUGEINT) * b.y) AS syy,
               SUM(CAST(b.x AS HUGEINT) * b.y) AS sxy
        FROM (SELECT DISTINCT day FROM daily) a
        JOIN daily b ON b.day BETWEEN a.day - 13 AND a.day
        GROUP BY a.day
    ),
    bounds AS (SELECT MIN(day) AS lo FROM daily)
    SELECT f.day, CAST(f.n AS BIGINT) AS n_days,
           CASE WHEN f.n * f.sxx - f.sx * f.sx > 0
                 AND f.n * f.syy - f.sy * f.sy > 0
                THEN ROUND(CAST(f.n * f.sxy - f.sx * f.sy AS DOUBLE)
                     / (SQRT(CAST(f.n * f.sxx - f.sx * f.sx AS DOUBLE))
                        * SQRT(CAST(f.n * f.syy - f.sy * f.sy AS DOUBLE))), 6)
                ELSE NULL END AS r
    FROM frames f CROSS JOIN bounds b
    WHERE f.day >= b.lo + 13
    """,
)
def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X191: rolling 14-day correlation of two event series.

    The DYNAMIC coupling monitor (X158's fixed-lag cross-correlation
    scored the whole series once; this shows when the purchase/click
    relationship changes): per day, Pearson r over the trailing 14
    days, full windows only. The frame is the calendar-bounded range
    self-join (X152/X186's shape — |days| x 14 rows, never
    fact-scale), per-frame power sums are exact with HUGEINT/DECIMAL
    products, and the one float division per frame rounds from
    identical integers. Day gaps shrink n_days honestly rather than
    imputing.
    """
    e = table(spark, sf_dir, "events")
    centi = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", centi).otherwise(0)
        ).alias("x"),
        F.sum(
            F.when(F.col("event_type") == "click", centi).otherwise(0)
        ).alias("y"),
    )
    # daily is grouped by day -> already unique; no distinct needed
    spine = daily.select(F.col("day").alias("fday"))
    b = daily.select(F.col("day").alias("bday"), "x", "y")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    frames = (
        spine.join(
            b,
            (F.col("bday") >= F.date_sub(F.col("fday"), 13))
            & (F.col("bday") <= F.col("fday")),
        )
        .groupBy(F.col("fday").alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
            F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
            F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        )
    )
    bounds = daily.agg(F.min("day").alias("lo"))
    num = dec("n") * F.col("sxy") - dec("sx") * F.col("sy")
    den1 = dec("n") * F.col("sxx") - dec("sx") * F.col("sx")
    den2 = dec("n") * F.col("syy") - dec("sy") * F.col("sy")
    return (
        frames.crossJoin(F.broadcast(bounds))
        .where(F.col("day") >= F.date_add(F.col("lo"), 13))
        .select(
            "day",
            F.col("n").cast("bigint").alias("n_days"),
            # zero-variance guard: a constant window makes a denominator
            # 0 — NULL on both engines instead of an ANSI-session
            # DIVIDE_BY_ZERO on Spark only
            F.when(
                (den1 > 0) & (den2 > 0),
                F.round(
                    num.cast("double")
                    / (
                        F.sqrt(den1.cast("double"))
                        * F.sqrt(den2.cast("double"))
                    ),
                    6,
                ),
            ).alias("r"),
        )
    )


@register(
    "q_seasonality_strength",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, isodow(CAST(ts AS DATE)) AS dow,
               SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS rev
        FROM events GROUP BY CAST(ts AS DATE)
    ),
    means AS (
        SELECT dow, SUM(rev) * 1000000 // COUNT(*) AS mean_micro
        FROM daily GROUP BY dow
    ),
    gmean AS (
        SELECT SUM(rev) * 1000000 // COUNT(*) AS gmean_micro FROM daily
    ),
    devs AS (
        SELECT d.day,
               d.rev * 1000000 - m.mean_micro AS dev_w,
               d.rev * 1000000 - g.gmean_micro AS dev_t
        FROM daily d
        JOIN means m ON m.dow = d.dow
        CROSS JOIN gmean g
    ),
    ss AS (
        SELECT SUM(CAST(dev_w AS HUGEINT) * dev_w) AS ss_resid,
               SUM(CAST(dev_t AS HUGEINT) * dev_t) AS ss_tot,
               COUNT(*) AS n
        FROM devs
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(ss_resid AS VARCHAR) AS ss_resid,
           CAST(ss_tot AS VARCHAR) AS ss_tot,
           CAST(10000 * (ss_tot - ss_resid) // ss_tot AS BIGINT)
               AS strength_bp
    FROM ss
    """,
)
def q_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X192: day-of-week seasonality strength (variance explained).

    X86 showed the weekly profile; this scores how much it MATTERS:
    strength = 1 - SS_within-dow / SS_total over daily revenue — near
    0 means the weekday pattern explains nothing (don't build
    DOW-aware forecasts), near 1 means X153's seasonal-naive is the
    right baseline. Exactness: the seven group means and the grand
    mean are MICRO-FIXED-POINTED first (truncating division — both
    engines agree on the mean integers), then every squared deviation
    is exact HUGEINT/DECIMAL arithmetic and the strength is one
    truncating bp division; ss numerators hash-pin as strings.
    Calendar-bounded relations throughout; isodow == weekday()+1 (the
    X86/X171 pinned numbering).
    """
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("rev")
    ).withColumn("dow", F.weekday("day") + 1)
    # sums through DECIMAL(38): DuckDB's SUM is HUGEINT, so the
    # *1e6 product must not wrap on the Spark side either
    mean_expr = (
        "CAST(CAST(SUM(rev) AS DECIMAL(38,0)) * 1000000 div COUNT(*)"
        " AS BIGINT)"
    )
    means = daily.groupBy("dow").agg(F.expr(mean_expr).alias("mean_micro"))
    gmean = daily.agg(F.expr(mean_expr).alias("gmean_micro"))
    devs = (
        daily.join(F.broadcast(means), "dow")
        .crossJoin(F.broadcast(gmean))
        .select(
            (F.col("rev") * 1_000_000 - F.col("mean_micro")).alias("dev_w"),
            (F.col("rev") * 1_000_000 - F.col("gmean_micro")).alias("dev_t"),
        )
    )
    ss = devs.agg(
        F.sum(F.col("dev_w").cast("decimal(38,0)") * F.col("dev_w")).alias(
            "ss_resid"
        ),
        F.sum(F.col("dev_t").cast("decimal(38,0)") * F.col("dev_t")).alias(
            "ss_tot"
        ),
        F.count("*").alias("n"),
    )
    return ss.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.col("ss_resid").cast("string").alias("ss_resid"),
        F.col("ss_tot").cast("string").alias("ss_tot"),
        F.expr(
            "CAST(10000 * (ss_tot - ss_resid) div ss_tot AS BIGINT)"
        ).alias("strength_bp"),
    )


@register(
    "q_reorder_rate",
    oracle="""
    WITH cp AS (
        SELECT l.l_partkey AS part, o.o_custkey AS cust,
               COUNT(DISTINCT o.o_orderkey) AS n_orders
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY l.l_partkey, o.o_custkey
    ),
    pr AS (
        SELECT part, COUNT(*) AS n_buyers,
               SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS n_repeat
        FROM cp GROUP BY part
    )
    SELECT CAST(n_buyers AS BIGINT) AS n_buyers_bucket,
           COUNT(*) AS n_parts,
           CAST(SUM(n_repeat) AS BIGINT) AS repeat_buyers,
           CAST(10000 * SUM(n_repeat) // SUM(n_buyers) AS BIGINT)
               AS reorder_bp
    FROM pr GROUP BY n_buyers
    """,
)
def q_reorder_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X193: part reorder rate by buyer-count bucket.

    The merchandiser's retention number: of a part's distinct buyers,
    what share purchased it in 2+ separate orders — bucketed by buyer
    count so popular and niche parts aren't averaged into one
    misleading rate (the X24 histogram discipline applied to a
    ratio). Plan: the part-customer order count rides the
    orderkey-bucketed warehouse join shape, then two narrow
    aggregates; exact bp.
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_partkey").alias("part"), F.col("o_custkey").alias("cust")
        )
        .agg(F.count_distinct("o_orderkey").alias("n_orders"))
    )
    pr = cp.groupBy("part").agg(
        F.count("*").alias("n_buyers"),
        F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0)).alias(
            "n_repeat"
        ),
    )
    return pr.groupBy(
        F.col("n_buyers").cast("bigint").alias("n_buyers_bucket")
    ).agg(
        F.count("*").alias("n_parts"),
        F.sum("n_repeat").cast("bigint").alias("repeat_buyers"),
        F.expr(
            "CAST(10000 * SUM(n_repeat) DIV SUM(n_buyers) AS BIGINT)"
        ).alias("reorder_bp"),
    )
