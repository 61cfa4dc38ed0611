"""Round-5 widening queries, twenty-third batch (SURVEY.md §2.13, X315-X319).

Robust decomposition, econometrics, causal inference, reliability
engineering, and statistical process control:

- X315 STL-lite decomposition: trend = centered rolling 7-median,
  seasonal = per-weekday median of detrended, residual anomalies —
  the robust seasonal-trend split, all medians integer-exact.
- X316 fixed-effects (within) estimator: the panel-data regression
  that absorbs group-level confounding — per-group demeaned slope vs
  the pooled slope, per-group terms milli-rounded first.
- X317 coarsened exact matching ATE: treated/control matched within
  coarsened covariate strata — the deterministic causal-inference
  estimator (no iterative propensity fit), ATT-weighted.
- X318 Weibull median-rank fit: the reliability engineer's shape/
  scale estimate by Benard plotting positions + OLS on the
  linearized CDF — closed form, no iteration.
- X319 Western Electric control chart: Shewhart limits from a
  baseline window with rules 1-4 (3-sigma point, 2-of-3 at 2-sigma,
  4-of-5 at 1-sigma, 8 same side) — every test exact via the
  (n*x - S)^2 > k^2 (n*Q - S^2) cross-multiplication, no sigma ever
  materialized as a float.

Reference parity note: engine extensions per SURVEY.md §2.13.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laser_hadoop_spark.operators.cumulative import ordered_cumsum
from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# --- X315: STL-lite robust decomposition -------------------------------------

_STL_TOP = 25


@register(
    "q_stl_decompose",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS v
        FROM orders GROUP BY 1
    ),
    tr AS (
        SELECT d, v,
               CAST(MEDIAN(v) OVER w AS BIGINT) AS trend,
               COUNT(*) OVER w AS wn
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (
        SELECT d, v, trend, v - trend AS detr,
               dayofweek(d) AS wd
        FROM tr WHERE wn = 7
    ),
    seas AS (
        SELECT wd, CAST(2 * MEDIAN(detr) AS BIGINT) AS dbl_seas
        FROM det GROUP BY wd
    )
    SELECT t.d, t.v, t.trend, s.dbl_seas,
           CAST(2 * t.detr - s.dbl_seas AS BIGINT) AS dbl_resid
    FROM det t JOIN seas s ON s.wd = t.wd
    ORDER BY ABS(2 * t.detr - s.dbl_seas) DESC, t.d
    LIMIT {_STL_TOP}
    """,
)
def q_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X315: robust STL-lite — trend/seasonal/residual by medians.

    The robust seasonal split X143's mean-based deseasonalization
    can't give (one outlier day drags a mean trend toward itself and
    masks its own anomaly; it moves a 7-median by at most one rank):
    trend = centered rolling 7-day MEDIAN (odd window, so the median
    IS an input integer — exact), seasonal = per-weekday median of
    the detrended series (doubled, X276's trick, since the count can
    be even), residual = 2*detrended - dbl_seasonal stays integer.
    Top-25 |residual| days are the calendar-adjusted anomalies.

    100 TB: one fact shuffle to the calendar-bounded daily series;
    the rolling window and the 7-row weekday medians live there.
    """
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("v")
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    # Spark forbids median() over a frame — the sorted 7-list's 4th
    # element IS the median for the (odd) full windows we keep
    tr = daily.select(
        "d",
        "v",
        F.element_at(F.array_sort(F.collect_list("v").over(w7)), 4)
        .cast("bigint")
        .alias("trend"),
        F.count("*").over(w7).alias("wn"),
    )
    det = tr.where(F.col("wn") == 7).select(
        "d",
        "v",
        "trend",
        (F.col("v") - F.col("trend")).alias("detr"),
        F.dayofweek("d").alias("wd"),
    )
    seas = det.groupBy("wd").agg(
        (2 * F.median("detr")).cast("bigint").alias("dbl_seas")
    )
    dbl_resid = (2 * F.col("detr") - F.col("dbl_seas")).cast("bigint")
    return (
        det.join(F.broadcast(seas), "wd")
        .select("d", "v", "trend", "dbl_seas", dbl_resid.alias("dbl_resid"))
        .orderBy(F.abs(F.col("dbl_resid")).desc(), "d")
        .limit(_STL_TOP)
    )


# --- X316: fixed-effects (within) estimator ----------------------------------


@register(
    "q_fixed_effects",
    oracle="""
    WITH cust AS (
        SELECT c.c_nationkey AS g,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS x,
               CAST(COALESCE(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5)
                                      AS BIGINT)), 0) AS BIGINT) AS y
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_nationkey
    ),
    grp AS (
        SELECT g, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sxx
        FROM cust GROUP BY g
    ),
    terms AS (
        SELECT g, n, sx, sy, sxy, sxx,
               CAST(ROUND(1000.0 * (sxy - CAST(sx AS DOUBLE) * sy / n))
                    AS BIGINT) AS num_milli,
               CAST(ROUND(1000.0 * (sxx - CAST(sx AS DOUBLE) * sx / n))
                    AS BIGINT) AS den_milli
        FROM grp
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(num_milli) AS BIGINT) AS num_sum_milli,
           CAST(SUM(den_milli) AS BIGINT) AS den_sum_milli,
           ROUND(CAST(SUM(num_milli) AS DOUBLE) / SUM(den_milli), 4)
               AS beta_within,
           ROUND((SUM(n) * CAST(SUM(sxy) AS DOUBLE)
                  - CAST(SUM(sx) AS DOUBLE) * SUM(sy))
                 / (SUM(n) * CAST(SUM(sxx) AS DOUBLE)
                    - CAST(SUM(sx) AS DOUBLE) * SUM(sx)), 4) AS beta_pooled
    FROM terms
    """,
)
def q_fixed_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X316: panel fixed-effects (within) estimator vs pooled OLS.

    How much does an extra order add to customer spend, once
    nation-level differences are absorbed? The within estimator
    demeans x and y inside each nation and pools the per-group
    covariance terms — the one-line panel regression that kills
    group-level confounding pooled OLS (X52) soaks up. Per-group
    numerator/denominator terms milli-round FIRST (X197 discipline),
    so the pooled sums are exact integers; both betas are single
    float expressions, rounded 4, reported side by side (their gap IS
    the confounding).

    100 TB: one customer-grain aggregate (left join keeps zero-order
    customers), one |nations|-row group aggregate, constant math.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    cust = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_nationkey")
        .agg(
            F.count("o_orderkey").cast("bigint").alias("x"),
            F.coalesce(
                F.sum(
                    F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("y"),
        )
        .select(F.col("c_nationkey").alias("g"), "x", "y")
    )
    grp = cust.groupBy("g").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    terms = grp.select(
        "n",
        "sx",
        "sy",
        "sxy",
        "sxx",
        F.round(
            1000.0
            * (F.col("sxy") - F.col("sx").cast("double") * F.col("sy") / F.col("n"))
        )
        .cast("bigint")
        .alias("num_milli"),
        F.round(
            1000.0
            * (F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / F.col("n"))
        )
        .cast("bigint")
        .alias("den_milli"),
    )
    sn = F.sum("n")
    ssx = F.sum("sx").cast("double")
    ssy = F.sum("sy")
    ssxy = F.sum("sxy").cast("double")
    ssxx = F.sum("sxx").cast("double")
    return terms.agg(
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum("num_milli").cast("bigint").alias("num_sum_milli"),
        F.sum("den_milli").cast("bigint").alias("den_sum_milli"),
        F.round(
            F.sum("num_milli").cast("double") / F.sum("den_milli"), 4
        ).alias("beta_within"),
        F.round(
            (sn * ssxy - ssx * ssy) / (sn * ssxx - ssx * F.sum("sx")), 4
        ).alias("beta_pooled"),
    )


# --- X317: coarsened exact matching ATE --------------------------------------


@register(
    "q_cem_ate",
    oracle="""
    WITH cust AS (
        SELECT c.c_custkey, c.c_nationkey,
               CAST(FLOOR(c.c_acctbal / 2000.0) AS BIGINT) AS band,
               CASE WHEN c.c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END
                   AS treated,
               CAST(COALESCE(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5)
                                      AS BIGINT)), 0) AS BIGINT) AS y
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
        GROUP BY 1, 2, 3, 4
    ),
    strata AS (
        SELECT c_nationkey, band,
               SUM(treated) AS nt, SUM(1 - treated) AS nc,
               SUM(treated * y) AS syt, SUM((1 - treated) * y) AS syc
        FROM cust GROUP BY 1, 2
    ),
    matched AS (
        SELECT nt, nc,
               CAST(ROUND(1000.0 * (CAST(syt AS DOUBLE) / nt
                                    - CAST(syc AS DOUBLE) / nc))
                    AS BIGINT) AS dmean_milli
        FROM strata WHERE nt > 0 AND nc > 0
    ),
    unadj AS (
        SELECT CAST(ROUND(1000.0
                   * (SUM(treated * CAST(y AS DOUBLE)) / SUM(treated)
                      - SUM((1 - treated) * CAST(y AS DOUBLE))
                        / SUM(1 - treated))) AS BIGINT) AS raw_diff_milli
        FROM cust
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
           CAST(SUM(nt) AS BIGINT) AS n_treated_matched,
           CAST(SUM(nt * dmean_milli) // SUM(nt) AS BIGINT) AS att_milli,
           (SELECT raw_diff_milli FROM unadj) AS raw_diff_milli
    FROM matched
    """,
)
def q_cem_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X317: coarsened exact matching — deterministic causal ATE.

    Does the AUTOMOBILE segment spend more than BUILDING because of
    the segment, or because of who's in it? CEM coarsens the
    covariates (nation x acctbal band of 2000), keeps only strata
    containing BOTH groups, and takes the treated-weighted average of
    within-stratum mean differences (ATT). No iterative propensity
    fit — matching is exact on the coarsened cells, which is why it's
    deterministic enough to hash. Per-stratum mean gaps milli-round
    first; the ATT is one integer-weighted DIV. The unadjusted raw
    gap rides along — the difference is the confounding removed.

    100 TB: customer-grain aggregate, |nations x bands| stratum
    census, constant math — all partial-aggregated.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    cust = (
        c.where(F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING"))
        .join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy(
            "c_custkey",
            "c_nationkey",
            F.floor(F.col("c_acctbal") / 2000.0).cast("bigint").alias("band"),
            (F.col("c_mktsegment") == "AUTOMOBILE")
            .cast("bigint")
            .alias("treated"),
        )
        .agg(
            F.coalesce(
                F.sum(
                    F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("y")
        )
        .localCheckpoint(eager=True)
    )
    strata = cust.groupBy("c_nationkey", "band").agg(
        F.sum("treated").alias("nt"),
        F.sum(1 - F.col("treated")).alias("nc"),
        F.sum(F.col("treated") * F.col("y")).alias("syt"),
        F.sum((1 - F.col("treated")) * F.col("y")).alias("syc"),
    )
    matched = strata.where((F.col("nt") > 0) & (F.col("nc") > 0)).select(
        "nt",
        "nc",
        F.round(
            1000.0
            * (
                F.col("syt").cast("double") / F.col("nt")
                - F.col("syc").cast("double") / F.col("nc")
            )
        )
        .cast("bigint")
        .alias("dmean_milli"),
    )
    unadj = cust.agg(
        F.round(
            1000.0
            * (
                F.sum(F.col("treated") * F.col("y").cast("double"))
                / F.sum("treated")
                - F.sum((1 - F.col("treated")) * F.col("y").cast("double"))
                / F.sum(1 - F.col("treated"))
            )
        )
        .cast("bigint")
        .alias("raw_diff_milli")
    )
    wsum = F.sum(F.col("nt") * F.col("dmean_milli"))
    return (
        matched.agg(
            F.count("*").cast("bigint").alias("n_strata"),
            F.sum("nt").cast("bigint").alias("n_treated_matched"),
            ((wsum - wsum % F.sum("nt")) / F.sum("nt"))
            .cast("bigint")
            .alias("att_milli"),
        )
        .crossJoin(F.broadcast(unadj))
    )


# --- X318: Weibull median-rank fit -------------------------------------------


@register(
    "q_weibull_fit",
    oracle="""
    WITH seq AS (
        SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
               LAG(CAST(o_orderdate AS DATE)) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                   AS prev_d
        FROM orders
    ),
    durs AS (
        SELECT o_custkey, d, date_diff('day', prev_d, d) AS dur
        FROM seq WHERE prev_d IS NOT NULL
          AND date_diff('day', prev_d, d) > 0
    ),
    ranked AS (
        SELECT dur,
               ROW_NUMBER() OVER (ORDER BY dur, o_custkey, d) AS i,
               COUNT(*) OVER () AS n
        FROM durs
    ),
    pts AS (
        SELECT CAST(ROUND(1000000 * LN(CAST(dur AS DOUBLE))) AS BIGINT) AS x,
               CAST(ROUND(1000000 * LN(-LN(1 - (i - 0.3) / (n + 0.4))))
                    AS BIGINT) AS y
        FROM ranked
    ),
    moms AS (
        SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
               SUM(CAST(x AS DOUBLE) * y) AS sxy,
               SUM(CAST(x AS DOUBLE) * x) AS sxx
        FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(ROUND(1000 * (n * sxy - CAST(sx AS DOUBLE) * sy)
                      / (n * sxx - CAST(sx AS DOUBLE) * sx)) AS BIGINT)
               AS shape_milli,
           CAST(ROUND((CAST(sy AS DOUBLE)
                       - (n * sxy - CAST(sx AS DOUBLE) * sy)
                         / (n * sxx - CAST(sx AS DOUBLE) * sx) * sx)
                      / n / 1000.0) AS BIGINT) AS intercept_milli
    FROM moms
    """,
)
def q_weibull_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X318: Weibull shape/scale by median-rank regression.

    The reliability engineer's closed-form fit: inter-purchase
    intervals as "times to failure", Benard plotting positions
    F_i = (i - 0.3)/(n + 0.4) on the ORDERED sample, then OLS of
    ln(-ln(1-F)) on ln(t) — the slope IS the Weibull shape k, the
    intercept gives ln(scale) = -b/k. No iteration (vs the MLE's
    Newton loop). Each point's two logs micro-round first, the four
    moment sums are exact integers (products in double only inside
    the final expressions, spelled identically), and the global rank
    comes from the two-pass cumulative — no single-partition window
    over the interval relation.

    100 TB: per-customer lag needs one shuffle on custkey; ranking is
    ordered_cumsum's two-pass; everything after is one aggregate.
    """
    o = table(spark, sf_dir, "orders")
    w_seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("d"),
        F.lag(F.col("o_orderdate").cast("date")).over(w_seq).alias("prev_d"),
    )
    durs = seq.where(
        F.col("prev_d").isNotNull() & (F.datediff("d", "prev_d") > 0)
    ).select("o_custkey", "d", F.datediff("d", "prev_d").alias("dur"))
    ranked = ordered_cumsum(
        durs, order_by=["dur", "o_custkey", "d"], row_number_col="i"
    )
    n_row = durs.agg(F.count("*").alias("n"))
    pts = ranked.crossJoin(F.broadcast(n_row)).select(
        F.round(1000000 * F.log(F.col("dur").cast("double")))
        .cast("bigint")
        .alias("x"),
        F.round(
            1000000
            * F.log(
                -F.log(1 - (F.col("i") - 0.3) / (F.col("n") + 0.4))
            )
        )
        .cast("bigint")
        .alias("y"),
    )
    moms = pts.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("double") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("double") * F.col("x")).alias("sxx"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    slope = (n * F.col("sxy") - sx.cast("double") * sy) / (
        n * F.col("sxx") - sx.cast("double") * sx
    )
    return moms.select(
        n.cast("bigint").alias("n"),
        F.round(1000 * slope).cast("bigint").alias("shape_milli"),
        F.round((sy.cast("double") - slope * sx) / n / 1000.0)
        .cast("bigint")
        .alias("intercept_milli"),
    )


# --- X319: Western Electric control chart ------------------------------------

_CC_BASELINE = 60


@register(
    "q_control_chart",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) // 100
                   AS v
        FROM orders GROUP BY 1
    ),
    idx AS (
        SELECT d, v, ROW_NUMBER() OVER (ORDER BY d) AS t FROM daily
    ),
    base AS (
        SELECT COUNT(*) AS n, SUM(v) AS s, SUM(v * v) AS q
        FROM idx WHERE t <= {_CC_BASELINE}
    ),
    scored AS (
        SELECT d, t, v,
               n * v - s AS dev,
               n * q - s * s AS var2
        FROM idx CROSS JOIN base WHERE t > {_CC_BASELINE}
    ),
    flags AS (
        SELECT d, t,
               CASE WHEN dev * dev > 9 * var2 THEN 1 ELSE 0 END AS b3,
               CASE WHEN dev * dev > 4 * var2 AND dev > 0 THEN 1 ELSE 0 END
                   AS b2p,
               CASE WHEN dev * dev > 4 * var2 AND dev < 0 THEN 1 ELSE 0 END
                   AS b2n,
               CASE WHEN dev * dev > 1 * var2 AND dev > 0 THEN 1 ELSE 0 END
                   AS b1p,
               CASE WHEN dev * dev > 1 * var2 AND dev < 0 THEN 1 ELSE 0 END
                   AS b1n,
               CASE WHEN dev > 0 THEN 1 WHEN dev < 0 THEN -1 ELSE 0 END
                   AS side
        FROM scored
    ),
    runs AS (
        SELECT d,
               b3 AS r1,
               CASE WHEN SUM(b2p) OVER w3 >= 2 OR SUM(b2n) OVER w3 >= 2
                    THEN 1 ELSE 0 END AS r2,
               CASE WHEN SUM(b1p) OVER w5 >= 4 OR SUM(b1n) OVER w5 >= 4
                    THEN 1 ELSE 0 END AS r3,
               CASE WHEN ABS(SUM(side) OVER w8) = 8
                     AND COUNT(*) OVER w8 = 8 THEN 1 ELSE 0 END AS r4
        FROM flags
        WINDOW w3 AS (ORDER BY t ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
               w5 AS (ORDER BY t ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
               w8 AS (ORDER BY t ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
    )
    SELECT rule, n_violations, first_day FROM (
        SELECT 1 AS rule, CAST(SUM(r1) AS BIGINT) AS n_violations,
               MIN(CASE WHEN r1 = 1 THEN d END) AS first_day FROM runs
        UNION ALL
        SELECT 2, CAST(SUM(r2) AS BIGINT),
               MIN(CASE WHEN r2 = 1 THEN d END) FROM runs
        UNION ALL
        SELECT 3, CAST(SUM(r3) AS BIGINT),
               MIN(CASE WHEN r3 = 1 THEN d END) FROM runs
        UNION ALL
        SELECT 4, CAST(SUM(r4) AS BIGINT),
               MIN(CASE WHEN r4 = 1 THEN d END) FROM runs
    ) ORDER BY rule
    """,
)
def q_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X319: Shewhart control chart with Western Electric rules 1-4.

    Statistical process control over daily revenue (whole dollars):
    baseline mean/sigma from the first 60 days, then every later day
    tests rule 1 (|x-mu| > 3 sigma), rule 2 (2 of 3 consecutive
    beyond 2 sigma, same side), rule 3 (4 of 5 beyond 1 sigma, same
    side), rule 4 (8 consecutive on one side). NO sigma is ever a
    float: |x - mu| > k*sigma cross-multiplies to
    (n*x - S)^2 > k^2 * (n*Q - S^2) — X75's trick applied per
    threshold — and the run rules are windowed sums of those exact
    indicator bits. Output is the 4-row violation census with first
    trigger dates.

    100 TB: one fact shuffle to the calendar-bounded daily series;
    the baseline is a 60-row aggregate, the rules are rolling windows
    over the bounded series.
    """
    o = table(spark, sf_dir, "orders")
    cents = F.sum(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    )
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        ((cents - cents % 100) / 100).cast("bigint").alias("v")
    )
    idx = daily.select(
        "d", "v", F.row_number().over(Window.orderBy("d")).alias("t")
    ).localCheckpoint(eager=True)
    base = idx.where(F.col("t") <= _CC_BASELINE).agg(
        F.count("*").alias("n"), F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("q"),
    )
    scored = (
        idx.where(F.col("t") > _CC_BASELINE)
        .crossJoin(F.broadcast(base))
        .select(
            "d",
            "t",
            (F.col("n") * F.col("v") - F.col("s")).alias("dev"),
            (F.col("n") * F.col("q") - F.col("s") * F.col("s")).alias("var2"),
        )
    )
    dev, var2 = F.col("dev"), F.col("var2")
    flags = scored.select(
        "d",
        "t",
        F.when(dev * dev > 9 * var2, 1).otherwise(0).alias("b3"),
        F.when((dev * dev > 4 * var2) & (dev > 0), 1).otherwise(0).alias("b2p"),
        F.when((dev * dev > 4 * var2) & (dev < 0), 1).otherwise(0).alias("b2n"),
        F.when((dev * dev > 1 * var2) & (dev > 0), 1).otherwise(0).alias("b1p"),
        F.when((dev * dev > 1 * var2) & (dev < 0), 1).otherwise(0).alias("b1n"),
        F.when(dev > 0, 1).when(dev < 0, -1).otherwise(0).alias("side"),
    )
    w3 = Window.orderBy("t").rowsBetween(-2, 0)
    w5 = Window.orderBy("t").rowsBetween(-4, 0)
    w8 = Window.orderBy("t").rowsBetween(-7, 0)
    runs = flags.select(
        "d",
        F.col("b3").alias("r1"),
        F.when(
            (F.sum("b2p").over(w3) >= 2) | (F.sum("b2n").over(w3) >= 2), 1
        )
        .otherwise(0)
        .alias("r2"),
        F.when(
            (F.sum("b1p").over(w5) >= 4) | (F.sum("b1n").over(w5) >= 4), 1
        )
        .otherwise(0)
        .alias("r3"),
        F.when(
            (F.abs(F.sum("side").over(w8)) == 8)
            & (F.count("*").over(w8) == 8),
            1,
        )
        .otherwise(0)
        .alias("r4"),
    ).localCheckpoint(eager=True)

    def census(rule: int) -> DataFrame:
        col = f"r{rule}"
        return runs.agg(
            F.lit(rule).cast("int").alias("rule"),
            F.sum(col).cast("bigint").alias("n_violations"),
            F.min(F.when(F.col(col) == 1, F.col("d"))).alias("first_day"),
        )

    out = census(1)
    for r in (2, 3, 4):
        out = out.unionByName(census(r))
    return out.orderBy("rule")
