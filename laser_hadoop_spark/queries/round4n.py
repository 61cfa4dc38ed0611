"""Round-4 widening queries, fourteenth batch (SURVEY.md §2.12,
X181-X183).

Experimentation and robust-statistics closures: a sequential
probability ratio test (Wald's SPRT — the always-valid alternative to
X77's fixed-horizon z-test) whose log-likelihood increments are two
integer constants, CUPED variance reduction (the standard experiment
sensitivity booster) with hash-pinned exact numerators, and a
winsorized mean whose clamp bounds come from the X166 histogram-prune
quantile operator — operator reuse on the hot path.

Cross-engine discipline: every log10 appears once per CONSTANT (not
per row) and micro-rounds before any multiplication; power sums route
through DECIMAL(38)/HUGEINT; one rounded float per reported
statistic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table


@register(
    "q_sprt",
    oracle="""
    WITH users AS (
        SELECT user_id,
               CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                                  THEN 1 ELSE 0 END) >= 15
                    THEN 1 ELSE 0 END AS x
        FROM events WHERE user_id % 2 = 1 GROUP BY user_id
    ),
    consts AS (
        SELECT CAST(ROUND(LOG10(0.6 / 0.4) * 1000000) AS BIGINT) AS lp,
               CAST(ROUND(LOG10(0.4 / 0.6) * 1000000) AS BIGINT) AS ln_,
               CAST(ROUND(LOG10(0.95 / 0.05) * 1000000) AS BIGINT) AS bound
    ),
    walk AS (
        SELECT user_id, x,
               ROW_NUMBER() OVER (ORDER BY user_id) AS rn,
               SUM(CASE WHEN x = 1 THEN c.lp ELSE c.ln_ END)
                   OVER (ORDER BY user_id ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS llr
        FROM users CROSS JOIN consts c
    )
    SELECT (SELECT COUNT(*) FROM users) AS n_users,
           CAST((SELECT llr FROM walk ORDER BY rn DESC LIMIT 1) AS BIGINT)
               AS final_llr_micro,
           (SELECT COALESCE(MIN(rn), 0) FROM walk CROSS JOIN consts c
            WHERE llr >= c.bound OR llr <= -c.bound) AS crossing_rank,
           (SELECT CASE
                WHEN COUNT(*) = 0 THEN 'continue'
                WHEN MIN(CASE WHEN llr >= c.bound THEN rn END)
                     <= COALESCE(MIN(CASE WHEN llr <= -c.bound THEN rn END),
                                 9223372036854775807)
                    THEN 'accept_h1' ELSE 'accept_h0' END
            FROM walk CROSS JOIN consts c
            WHERE llr >= c.bound OR llr <= -c.bound) AS decision
    """,
)
def q_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X181: Wald's SPRT over the treatment arm (sequential testing).

    The always-valid sequential alternative to X77's fixed-horizon
    z-test: walk users in user_id order accumulating the
    log-likelihood ratio for H1: p=0.6 vs H0: p=0.4 on the
    heavy-purchaser outcome; stop at the first crossing of
    +-log10(19) (alpha = beta = 0.05 Wald boundaries). EXACTNESS: the
    per-user increment is one of exactly TWO constants — log10 runs
    once per constant, micro-rounds, and the walk is then a pure
    integer cumulative (the X72 discipline applied to a sequential
    test); both engines compute the same IEEE log10 of the same
    literal ratios. The cumulative runs through the two-pass operator
    (no single-partition window over the user axis at scale); the
    decision logic reads the tiny crossing set.
    """
    from laser_hadoop_spark.operators.cumulative import ordered_cumsum

    e = table(spark, sf_dir, "events")
    users = (
        e.where(F.col("user_id") % 2 == 1)
        .groupBy("user_id")
        .agg(
            (
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                )
                >= 15
            )
            .cast("int")
            .alias("x")
        )
    )
    lp = F.round(F.log10(F.lit(0.6) / F.lit(0.4)) * 1_000_000).cast("bigint")
    ln_ = F.round(F.log10(F.lit(0.4) / F.lit(0.6)) * 1_000_000).cast("bigint")
    bound = F.round(F.log10(F.lit(0.95) / F.lit(0.05)) * 1_000_000).cast(
        "bigint"
    )
    stepped = users.select(
        "user_id", F.when(F.col("x") == 1, lp).otherwise(ln_).alias("inc")
    )
    walk = ordered_cumsum(
        stepped,
        order_by=["user_id"],
        values={"inc": "llr"},
        row_number_col="rn",
    )
    n_users = users.agg(F.count("*").alias("n_users"))
    final = walk.orderBy(F.col("rn").desc()).limit(1).select(
        F.col("llr").alias("final_llr_micro")
    )
    crossings = walk.where(
        (F.col("llr") >= bound) | (F.col("llr") <= -bound)
    ).select(
        "rn", (F.col("llr") >= bound).cast("int").alias("is_h1")
    )
    cross_agg = crossings.agg(
        F.coalesce(F.min("rn"), F.lit(0)).cast("bigint").alias(
            "crossing_rank"
        ),
        F.count("*").alias("__n_cross"),
        F.coalesce(
            F.min(F.when(F.col("is_h1") == 1, F.col("rn"))),
            F.lit(9223372036854775807),
        ).alias("__first_h1"),
        F.coalesce(
            F.min(F.when(F.col("is_h1") == 0, F.col("rn"))),
            F.lit(9223372036854775807),
        ).alias("__first_h0"),
    )
    return (
        n_users.crossJoin(final)
        .crossJoin(cross_agg)
        .select(
            "n_users",
            "final_llr_micro",
            "crossing_rank",
            F.when(F.col("__n_cross") == 0, "continue")
            .when(F.col("__first_h1") <= F.col("__first_h0"), "accept_h1")
            .otherwise("accept_h0")
            .alias("decision"),
        )
    )


@register(
    "q_cuped",
    oracle="""
    WITH half AS (
        SELECT user_id,
               SUM(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                        AND event_type = 'purchase'
                        THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS x,
               SUM(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                        AND event_type = 'purchase'
                        THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS y
        FROM events GROUP BY user_id
    ),
    s AS (
        SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(y AS HUGEINT) * y) AS syy,
               SUM(CAST(x AS HUGEINT) * y) AS sxy
        FROM half
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           CAST(n * sxy - sx * sy AS VARCHAR) AS cov_num,
           CAST(n * sxx - sx * sx AS VARCHAR) AS varx_num,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS theta,
           ROUND(1.0 - CAST(n * sxy - sx * sy AS DOUBLE)
                       * CAST(n * sxy - sx * sy AS DOUBLE)
                 / (CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6)
               AS var_ratio
    FROM s
    """,
)
def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X182: CUPED variance reduction (experimentation sensitivity).

    The standard pre-experiment covariate adjustment (Deng et al.
    2013, public method): theta = cov(X,Y)/var(X) with X = each
    user's pre-period purchase value (first half of the month) and
    Y = the experiment-period value; the adjusted metric's variance
    shrinks by the squared correlation — var_ratio = 1 - rho^2 is
    the fraction of variance that REMAINS (0.7 means a ~30% smaller
    required sample). cov and var numerators are exact DECIMAL(38)
    integers hash-pinned AS STRINGS; theta and var_ratio take one
    rounded float step each from identical integer inputs. One user
    aggregate + one stats row.
    """
    e = table(spark, sf_dir, "events")
    centi = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    pre = (F.col("ts").cast("date") < F.lit("2024-01-16").cast("date")) & (
        F.col("event_type") == "purchase"
    )
    post = (F.col("ts").cast("date") >= F.lit("2024-01-16").cast("date")) & (
        F.col("event_type") == "purchase"
    )
    half = e.groupBy("user_id").agg(
        F.sum(F.when(pre, centi).otherwise(0)).alias("x"),
        F.sum(F.when(post, centi).otherwise(0)).alias("y"),
    )
    dx = F.col("x").cast("decimal(38,0)")
    s = half.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(dx * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
        F.sum(dx * F.col("y")).alias("sxy"),
    )
    dn = F.col("n").cast("decimal(38,0)")
    d1 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    cov_num = dn * F.col("sxy") - d1("sx") * F.col("sy")
    varx_num = dn * F.col("sxx") - d1("sx") * F.col("sx")
    vary_num = dn * F.col("syy") - d1("sy") * F.col("sy")
    return s.select(
        F.col("n").cast("bigint").alias("n_users"),
        cov_num.cast("string").alias("cov_num"),
        varx_num.cast("string").alias("varx_num"),
        F.round(cov_num.cast("double") / varx_num.cast("double"), 6).alias(
            "theta"
        ),
        F.round(
            1.0
            - cov_num.cast("double")
            * cov_num.cast("double")
            / (varx_num.cast("double") * vary_num.cast("double")),
            6,
        ).alias("var_ratio"),
    )


@register(
    "q_winsorized_mean",
    oracle="""
    WITH v AS (
        SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS centi
        FROM orders
    ),
    r AS (
        SELECT centi, ROW_NUMBER() OVER (ORDER BY centi) AS rn,
               COUNT(*) OVER () AS n
        FROM v
    ),
    lo AS (SELECT MIN(centi) AS lo FROM r WHERE 100 * rn >= 5 * n),
    hi AS (SELECT MIN(centi) AS hi FROM r WHERE 100 * rn >= 95 * n)
    SELECT (SELECT CAST(MIN(n) AS BIGINT) FROM r) AS n,
           (SELECT CAST(lo AS BIGINT) FROM lo) AS lo_centi,
           (SELECT CAST(hi AS BIGINT) FROM hi) AS hi_centi,
           (SELECT CAST(SUM(centi) // MIN(n) AS BIGINT) FROM r)
               AS mean_centi,
           (SELECT CAST(SUM(GREATEST((SELECT lo FROM lo),
                                     LEAST((SELECT hi FROM hi), centi)))
                        // MIN(n) AS BIGINT) FROM r)
               AS winsor_mean_centi
    """,
)
def q_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X183: winsorized mean (p5/p95 clamp) — quantile-operator reuse.

    The robust mean heavy-tailed money columns need: clamp every value
    into [p5, p95] (lower quantiles, the X166 definition) and average
    exactly. The clamp bounds come from
    operators/cumulative.ordered_quantiles — the histogram-prune path,
    so finding them costs two scans and NO fact shuffle — broadcast
    back as a 2-value row; the clamped sum is one more scan-local
    aggregate with a truncating division. The oracle spells the same
    bounds via the definitional global rank. Three fact scans total,
    zero shuffles of fact rows; compare X96's MAD for the
    deviation-based robust sibling.
    """
    from laser_hadoop_spark.operators.cumulative import ordered_quantiles

    o = table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("centi")
    )
    qs = ordered_quantiles(
        o, value_col="centi", quantiles=[(5, 100), (95, 100)]
    )
    bounds = (
        qs.groupBy()
        .pivot("q_num", [5, 95])
        .agg(F.min("quantile_value"))
        .select(
            F.col("`5`").alias("lo"),
            F.col("`95`").alias("hi"),
        )
    )
    clamped = o.crossJoin(F.broadcast(bounds))
    return clamped.agg(
        F.count("*").alias("n"),
        F.min("lo").cast("bigint").alias("lo_centi"),
        F.min("hi").cast("bigint").alias("hi_centi"),
        F.expr("CAST(SUM(centi) DIV COUNT(*) AS BIGINT)").alias("mean_centi"),
        F.expr(
            "CAST(SUM(GREATEST(lo, LEAST(hi, centi))) DIV COUNT(*)"
            " AS BIGINT)"
        ).alias("winsor_mean_centi"),
    )
