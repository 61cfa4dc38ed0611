"""Round-5 widening queries, fifteenth batch (SURVEY.md §2.13, X273-X277).

Experiment diagnostics and series shape:

- X273 Welch's t-test: the unequal-variance two-sample t (the test
  practitioners should default to instead of Student's pooled form),
  with the Welch-Satterthwaite degrees of freedom — exact integer
  moments end-to-end.
- X274 Durbin-Watson: first-order residual autocorrelation of the
  daily-revenue OLS trend fit — the regression-diagnostics statistic
  X52's fit omits; residuals kept exact by clearing the OLS
  denominators.
- X275 SAX symbolization: the daily revenue series compressed to a
  symbolic string (PAA window means -> empirical-quartile alphabet)
  — the time-series-motif preprocessing step, exactly rank-based.
- X276 Brown-Forsythe test: k-group variance homogeneity via ANOVA
  on |x - group median| (Levene's median form — robust to
  non-normality), doubled-median trick keeps every term integer.
- X277 power analysis / MDE grid: the sample size per arm a
  two-sample test needs at alpha=.05 / power=.80 for a grid of
  minimum detectable effects, from the observed purchase-value
  moments — the table every experiment should be sized from.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table


def _fdiv(a: str, b: str) -> str:
    """Exact decimal floor-division SQL for NONNEGATIVE operands whose
    quotient can exceed int64 — Spark's DIV on DECIMAL operands returns
    BIGINT and silently wraps past it (the X258 pitfall), while
    (a - a % b) / b stays DECIMAL end-to-end and equals DuckDB's
    HUGEINT //."""
    return f"CAST((({a}) - ({a}) % ({b})) / ({b}) AS DECIMAL(38,0))"

# --- X273: Welch's t-test ----------------------------------------------------

_WELCH_A = "AUTOMOBILE"
_WELCH_B = "BUILDING"


@register(
    "q_welch_t",
    oracle=f"""
    WITH base AS (
        SELECT CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS x,
               c.c_mktsegment AS seg
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment IN ('{_WELCH_A}', '{_WELCH_B}')
    ),
    m AS (
        SELECT
            SUM(CASE WHEN seg = '{_WELCH_A}' THEN 1 ELSE 0 END) AS na,
            SUM(CASE WHEN seg = '{_WELCH_B}' THEN 1 ELSE 0 END) AS nb,
            SUM(CASE WHEN seg = '{_WELCH_A}' THEN x ELSE 0 END) AS sa,
            SUM(CASE WHEN seg = '{_WELCH_B}' THEN x ELSE 0 END) AS sb,
            SUM(CASE WHEN seg = '{_WELCH_A}'
                THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS qa,
            SUM(CASE WHEN seg = '{_WELCH_B}'
                THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS qb
        FROM base
    ),
    v AS (
        SELECT na, nb, sa, sb,
               (1000000 * (qa * na - CAST(sa AS HUGEINT) * sa))
                   // (CAST(na AS HUGEINT) * na * (na - 1)) AS va_micro,
               (1000000 * (qb * nb - CAST(sb AS HUGEINT) * sb))
                   // (CAST(nb AS HUGEINT) * nb * (nb - 1)) AS vb_micro
        FROM m
    ),
    se AS (
        SELECT na, nb, sa, sb, va_micro, vb_micro,
               va_micro // na + vb_micro // nb AS se2_micro
        FROM v
    )
    SELECT CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b,
           CAST(sa // na AS BIGINT) AS mean_a_cents,
           CAST(sb // nb AS BIGINT) AS mean_b_cents,
           CAST(sa // na - sb // nb AS BIGINT) AS diff_cents,
           CAST(1000000 * CAST(sa // na - sb // nb AS HUGEINT)
                        * (sa // na - sb // nb) // se2_micro
                AS BIGINT) AS t2_micro,
           CAST(1000 * se2_micro * se2_micro
                // ((va_micro // na) * (va_micro // na) // (na - 1)
                    + (vb_micro // nb) * (vb_micro // nb) // (nb - 1))
                AS BIGINT) AS df_milli
    FROM se
    """,
)
def q_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X273: Welch's unequal-variance two-sample t-test, exact integers.

    Do AUTOMOBILE and BUILDING customers place different-valued
    orders? Student's pooled t assumes equal variances; Welch's form
    (the modern default) uses per-group variances and the
    Welch-Satterthwaite effective df. Everything is integer cents:
    per-group (n, sum, sum-of-squares) from ONE conditional-sum scan,
    variances in micro-cents^2 via the exact decimal floor-division
    (the quotient outgrows int64 — the Kruskal-Wallis X258 pitfall),
    then t^2 in micro and df in milli from 1-row arithmetic. Every
    division has a nonnegative dividend except the mean difference,
    which is squared before dividing — so Spark's truncating DIV and
    DuckDB's flooring // agree everywhere.

    100 TB shape: one broadcast dim join + one conditional-sum
    aggregate (map-side combine); the test itself is 1-row math.
    """
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = (
        table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .where(F.col("c_mktsegment").isin(_WELCH_A, _WELCH_B))
    )
    base = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("x"),
        F.col("c_mktsegment").alias("seg"),
    )
    xd = F.col("x").cast("decimal(38,0)")
    m = base.agg(
        F.sum(F.when(F.col("seg") == _WELCH_A, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("seg") == _WELCH_B, 1).otherwise(0)).alias("nb"),
        F.sum(F.when(F.col("seg") == _WELCH_A, F.col("x")).otherwise(0)).alias("sa"),
        F.sum(F.when(F.col("seg") == _WELCH_B, F.col("x")).otherwise(0)).alias("sb"),
        F.sum(F.when(F.col("seg") == _WELCH_A, xd * xd).otherwise(0)).alias("qa"),
        F.sum(F.when(F.col("seg") == _WELCH_B, xd * xd).otherwise(0)).alias("qb"),
    )
    # exact decimal floor-division (quotient can exceed int64): the
    # operands are nonnegative, so (a - a % b) / b == floor == DuckDB //
    v = m.select(
        "na", "nb", "sa", "sb",
        F.expr(
            "CAST(((1000000 * (qa * na - CAST(sa AS DECIMAL(38,0)) * sa))"
            " - (1000000 * (qa * na - CAST(sa AS DECIMAL(38,0)) * sa))"
            "   % (CAST(na AS DECIMAL(38,0)) * na * (na - 1)))"
            " / (CAST(na AS DECIMAL(38,0)) * na * (na - 1))"
            " AS DECIMAL(38,0))"
        ).alias("va_micro"),
        F.expr(
            "CAST(((1000000 * (qb * nb - CAST(sb AS DECIMAL(38,0)) * sb))"
            " - (1000000 * (qb * nb - CAST(sb AS DECIMAL(38,0)) * sb))"
            "   % (CAST(nb AS DECIMAL(38,0)) * nb * (nb - 1)))"
            " / (CAST(nb AS DECIMAL(38,0)) * nb * (nb - 1))"
            " AS DECIMAL(38,0))"
        ).alias("vb_micro"),
    )
    se = v.withColumn(
        "se2_micro", F.expr("va_micro DIV na + vb_micro DIV nb")
    )
    return se.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.expr("sa DIV na").cast("bigint").alias("mean_a_cents"),
        F.expr("sb DIV nb").cast("bigint").alias("mean_b_cents"),
        F.expr("sa DIV na - sb DIV nb").cast("bigint").alias("diff_cents"),
        F.expr(
            "CAST(1000000 * CAST(sa DIV na - sb DIV nb AS DECIMAL(38,0))"
            " * (sa DIV na - sb DIV nb) DIV se2_micro AS BIGINT)"
        ).alias("t2_micro"),
        # the squared terms outgrow int64 (se2 ~ 1e16, and the
        # (v/n)^2/(n-1) quotients reach ~1e23) — promote to DECIMAL(38)
        # and floor-divide via _fdiv or the products/quotients wrap
        F.expr(
            "CAST(1000 * CAST(se2_micro AS DECIMAL(38,0)) * se2_micro"
            " DIV ("
            + _fdiv(
                "CAST(va_micro DIV na AS DECIMAL(38,0)) * (va_micro DIV na)",
                "na - 1",
            )
            + " + "
            + _fdiv(
                "CAST(vb_micro DIV nb AS DECIMAL(38,0)) * (vb_micro DIV nb)",
                "nb - 1",
            )
            + ") AS BIGINT)"
        ).alias("df_milli"),
    )


# --- X274: Durbin-Watson statistic ------------------------------------------

_DW_K = 10**12  # offset making every scaled residual division nonnegative


@register(
    "q_durbin_watson",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS y
        FROM orders GROUP BY 1
    ),
    idx AS (
        SELECT y, CAST(d - (SELECT MIN(d) FROM daily) AS BIGINT) AS t
        FROM daily
    ),
    s AS (
        SELECT COUNT(*) AS n, SUM(t) AS st, SUM(y) AS sy,
               SUM(CAST(t AS HUGEINT) * t) AS stt,
               SUM(CAST(t AS HUGEINT) * y) AS sty
        FROM idx
    ),
    coef AS (
        SELECT n, st, sy,
               n * sty - CAST(st AS HUGEINT) * sy AS nb,
               n * stt - CAST(st AS HUGEINT) * st AS db
        FROM s
    ),
    resid AS (
        SELECT i.t,
               (n * db * i.y - (db * sy - nb * st) - n * nb * i.t
                + {_DW_K} * n * db) // (n * db) - {_DW_K} AS e
        FROM idx i CROSS JOIN coef
    ),
    lagged AS (
        SELECT e, LAG(e) OVER (ORDER BY t) AS ep FROM resid
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(1000 * SUM(CASE WHEN ep IS NULL THEN 0
                      ELSE CAST(e - ep AS HUGEINT) * (e - ep) END)
                // SUM(CAST(e AS HUGEINT) * e) AS BIGINT) AS dw_milli
    FROM lagged
    """,
)
def q_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X274: Durbin-Watson residual-autocorrelation statistic, exact.

    Are the daily-revenue OLS-trend residuals serially correlated?
    DW = sum((e_t - e_{{t-1}})^2) / sum(e_t^2): ~2 means none, ->0
    positive, ->4 negative autocorrelation — the standard regression
    diagnostic X52's fit statistics omit. Exactness: clearing the OLS
    denominators gives integer scaled residuals E_t = n*Db*y_t - C -
    n*Nb*t (the common factor n*Db cancels in DW); they are reduced
    back to cent-scale by one division made sign-safe with a
    multiple-of-the-divisor offset (+K*n*Db before, -K after): both
    engines' integer division TRUNCATES toward zero (probed — DuckDB
    // is not a floor on negatives either), so negative dividends
    round toward zero while positive ones round down; the offset
    makes every dividend nonnegative, where the conventions coincide,
    and cancels exactly because it is a multiple of n*Db.

    100 TB shape: one daily aggregate off the scan (map-side combine,
    calendar-bounded output), one 1-row moment aggregate broadcast
    back, one lag window over the bounded daily relation.
    """
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("y")
    )
    mn = daily.agg(F.min("d").alias("d0"))
    idx = daily.crossJoin(F.broadcast(mn)).select(
        "y", F.datediff(F.col("d"), F.col("d0")).cast("bigint").alias("t")
    )
    td = F.col("t").cast("decimal(38,0)")
    s = idx.agg(
        F.count("*").alias("n"),
        F.sum("t").alias("st"),
        F.sum("y").alias("sy"),
        F.sum(td * td).alias("stt"),
        F.sum(td * F.col("y")).alias("sty"),
    )
    coef = s.select(
        "n", "st", "sy",
        F.expr("n * sty - CAST(st AS DECIMAL(38,0)) * sy").alias("nb"),
        F.expr("n * stt - CAST(st AS DECIMAL(38,0)) * st").alias("db"),
    )
    resid = idx.crossJoin(F.broadcast(coef)).select(
        "t",
        F.expr(
            f"CAST((n * db * y - (db * sy - nb * st) - n * nb * t"
            f" + CAST({_DW_K} AS DECIMAL(38,0)) * n * db)"
            f" DIV (n * db) - {_DW_K} AS BIGINT)"
        ).alias("e"),
    )
    w = Window.orderBy("t")  # calendar-bounded: |days|, never fact rows
    lagged = resid.select(
        "e", F.lag("e").over(w).alias("ep")
    )
    ed = F.col("e").cast("decimal(38,0)")
    return lagged.agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.expr(
            "CAST(1000 * SUM(CASE WHEN ep IS NULL THEN 0"
            " ELSE CAST(e - ep AS DECIMAL(38,0)) * (e - ep) END)"
            " DIV SUM(CAST(e AS DECIMAL(38,0)) * e) AS BIGINT)"
        ).alias("dw_milli"),
    )


# --- X275: SAX symbolization -------------------------------------------------

_SAX_W = 7  # PAA window: calendar weeks of the daily series


@register(
    "q_sax_symbols",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS y
        FROM orders GROUP BY 1
    ),
    idx AS (
        SELECT y, ROW_NUMBER() OVER (ORDER BY d) - 1 AS i FROM daily
    ),
    paa AS (
        SELECT i // {_SAX_W} AS w,
               1000 * SUM(y) // COUNT(*) AS pm_milli
        FROM idx GROUP BY 1
    ),
    sym AS (
        SELECT w, pm_milli,
               CHR(CAST(96 + NTILE(4) OVER (ORDER BY pm_milli, w)
                        AS INTEGER)) AS s
        FROM paa
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_windows,
           STRING_AGG(s, '' ORDER BY w) AS sax_string,
           CAST(SUM(CASE WHEN s = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN s = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           CAST(SUM(CASE WHEN s = 'c' THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
           CAST(SUM(CASE WHEN s = 'd' THEN 1 ELSE 0 END) AS BIGINT) AS n_d
    FROM sym
    """,
)
def q_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X275: SAX symbolization of the daily revenue series.

    Symbolic Aggregate approXimation: the series compresses to PAA
    window means (7-day windows over the day-indexed series) and each
    window maps to a 4-letter alphabet — here by EMPIRICAL quartiles
    (rank-based ntile with the window id as tiebreaker) instead of the
    classical Gaussian breakpoints, which keeps the mapping exact and
    distribution-free. The emitted string is the series' motif
    representation (what similarity/anomaly miners index); the census
    counts prove the quartile balance. All arithmetic is integer
    (window means in milli-cents via one floor division).

    100 TB shape: the fact scan reduces to the calendar-bounded daily
    relation map-side; everything after (day index, PAA groups,
    quartile ranks, string fold) operates on |days| and |days|/7 rows
    — the two windows here are bounded-relation windows by
    construction, never fact-cardinality.
    """
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("y")
    )
    iw = Window.orderBy("d")  # calendar-bounded
    idx = daily.select(
        "y", (F.row_number().over(iw) - 1).alias("i")
    )
    paa = idx.groupBy(F.expr(f"i DIV {_SAX_W}").alias("w")).agg(
        F.expr("1000 * SUM(y) DIV COUNT(*)").alias("pm_milli")
    )
    sw = Window.orderBy("pm_milli", "w")  # |days|/7 rows
    sym = paa.select(
        "w", "pm_milli", F.chr(F.ntile(4).over(sw) + 96).alias("s")
    )
    return sym.agg(
        F.count("*").cast("bigint").alias("n_windows"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(w, s))),"
            " x -> x.s), '')"
        ).alias("sax_string"),
        *[
            F.sum(F.when(F.col("s") == c, 1).otherwise(0))
            .cast("bigint")
            .alias(f"n_{c}")
            for c in "abcd"
        ],
    )


# --- X276: Brown-Forsythe variance-homogeneity test --------------------------


@register(
    "q_brown_forsythe",
    oracle="""
    WITH base AS (
        SELECT o_orderpriority AS g,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS x
        FROM orders
    ),
    med AS (
        SELECT g, CAST(2 * MEDIAN(x) AS BIGINT) AS m2 FROM base GROUP BY g
    ),
    z AS (
        SELECT base.g, ABS(2 * x - m2) AS z2
        FROM base JOIN med ON med.g = base.g
    ),
    grp AS (
        SELECT g, COUNT(*) AS ng, SUM(z2) AS sg,
               SUM(CAST(z2 AS HUGEINT) * z2) AS qg
        FROM z GROUP BY g
    ),
    tot AS (
        SELECT COUNT(*) AS k, SUM(ng) AS n, SUM(sg) AS s, SUM(qg) AS q,
               SUM(CAST(sg AS HUGEINT) * sg // ng) AS ssb_part
        FROM grp
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(k AS BIGINT) AS k,
           CAST(10000 * (ssb_part - CAST(s AS HUGEINT) * s // n)
                // (q - CAST(s AS HUGEINT) * s // n) AS BIGINT)
               AS ssb_share_bp,
           CAST(1000 * (n - k) * (ssb_part - CAST(s AS HUGEINT) * s // n)
                // ((k - 1) * (q - ssb_part)) AS BIGINT) AS f_milli
    FROM tot
    """,
)
def q_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X276: Brown-Forsythe variance-homogeneity test, exact integers.

    Do the five order priorities have equally-dispersed order values?
    Levene's test in its median form (robust to non-normality): ANOVA
    on z_ij = |x_ij - median_j|. The doubled-median trick keeps every
    term integer — 2*median is exact for both engines (avg of the two
    middle integers has at worst a .5 that doubles away), so z is
    computed as |2x - m2| in half-cents. F = ((N-k)/(k-1)) * SSB/SSW
    with SSB/SSW from the X259 ssb_part decomposition; emitted in
    milli plus the SSB share in bp. Division dividends are all
    nonnegative, so DIV == //.

    100 TB shape: one grouped aggregate for medians (5-row result,
    broadcast back), one conditional aggregate for the z moments
    (map-side combine), 1-row arithmetic. Compare X258 (location,
    ranks), X198 (location, medians) — this one tests SCALE.
    """
    base = table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("x"),
    )
    med = base.groupBy("g").agg(
        (2 * F.median("x")).cast("bigint").alias("m2")
    )
    z = base.join(F.broadcast(med), "g").select(
        "g", F.abs(2 * F.col("x") - F.col("m2")).alias("z2")
    )
    zd = F.col("z2").cast("decimal(38,0)")
    grp = z.groupBy("g").agg(
        F.count("*").alias("ng"),
        F.sum("z2").alias("sg"),
        F.sum(zd * zd).alias("qg"),
    )
    # the sg^2/ng and s^2/n quotients outgrow int64 — _fdiv, not DIV
    tot = grp.agg(
        F.count("*").alias("k"),
        F.sum("ng").alias("n"),
        F.sum("sg").alias("s"),
        F.sum("qg").alias("q"),
        F.sum(
            F.expr(_fdiv("CAST(sg AS DECIMAL(38,0)) * sg", "ng"))
        ).alias("ssb_part"),
    )
    s2n = _fdiv("CAST(s AS DECIMAL(38,0)) * s", "n")
    return tot.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("k").cast("bigint").alias("k"),
        F.expr(
            f"CAST(10000 * (ssb_part - {s2n})"
            f" DIV (q - {s2n}) AS BIGINT)"
        ).alias("ssb_share_bp"),
        F.expr(
            f"CAST(1000 * (n - k) * (ssb_part - {s2n})"
            f" DIV ((k - 1) * (q - ssb_part)) AS BIGINT)"
        ).alias("f_milli"),
    )


# --- X277: power analysis / MDE grid -----------------------------------------

# 1000 * 2 * (z_{0.975} + z_{0.80})^2 = 1000 * 2 * (1.9599640 + 0.8416212)^2
_POWER_CONST_MILLI = 15698
_MDE_GRID_BP = [100, 200, 500, 1000]


@register(
    "q_power_analysis",
    oracle=f"""
    WITH p AS (
        SELECT CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS v
        FROM events WHERE event_type = 'purchase'
    ),
    m AS (
        SELECT COUNT(*) AS n, SUM(v) AS s,
               SUM(CAST(v AS HUGEINT) * v) AS q
        FROM p
    ),
    mom AS (
        SELECT n, s // n AS mean_micro,
               (q * n - CAST(s AS HUGEINT) * s)
                   // (CAST(n AS HUGEINT) * n * (n - 1)) AS var_micro2
        FROM m
    )
    SELECT CAST(g.mde_bp AS BIGINT) AS mde_bp,
           CAST(n AS BIGINT) AS n_obs,
           CAST(mean_micro AS BIGINT) AS mean_micro,
           CAST(g.mde_bp * mean_micro // 10000 AS BIGINT) AS delta_micro,
           CAST({_POWER_CONST_MILLI} * var_micro2
                // (1000 * CAST(g.mde_bp * mean_micro // 10000 AS HUGEINT)
                         * (g.mde_bp * mean_micro // 10000)) + 1
                AS BIGINT) AS n_per_arm
    FROM mom CROSS JOIN (
        SELECT UNNEST([{", ".join(str(b) for b in _MDE_GRID_BP)}]) AS mde_bp
    ) g
    """,
)
def q_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X277: two-sample power analysis — required n per arm across an
    MDE grid, from observed moments.

    The table an experimenter should read before launching: for
    minimum detectable effects of 1/2/5/10 percent of the purchase-
    value mean, the per-arm sample size n = 2*(z_.975+z_.80)^2 *
    sigma^2 / delta^2 (alpha .05 two-sided, power .80), with the
    z-constant fixed as the integer spec 15698 milli so both engines
    evaluate the identical closed form. Moments are exact micro-unit
    integers (one scan); each grid row is pure 1-row arithmetic, +1
    standing in for the ceiling. All dividends nonnegative: DIV == //.

    100 TB shape: one pushed-filter scan to a 1-row moment aggregate;
    the grid is a 4-row literal cross join.
    """
    e = table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    from laser_hadoop_spark.functions.scalar import micro_units

    p = e.select(micro_units(F.col("value")).alias("v"))
    vd = F.col("v").cast("decimal(38,0)")
    m = p.agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s"),
        F.sum(vd * vd).alias("q"),
    )
    mom = m.select(
        "n",
        F.expr("s DIV n").alias("mean_micro"),
        F.expr(
            "(q * n - CAST(s AS DECIMAL(38,0)) * s)"
            " DIV (CAST(n AS DECIMAL(38,0)) * n * (n - 1))"
        ).alias("var_micro2"),
    )
    grid = F.explode(
        F.array(*[F.lit(b) for b in _MDE_GRID_BP])
    ).alias("mde_bp")
    return mom.select("*", grid).select(
        F.col("mde_bp").cast("bigint").alias("mde_bp"),
        F.col("n").cast("bigint").alias("n_obs"),
        F.col("mean_micro").cast("bigint").alias("mean_micro"),
        F.expr("CAST(mde_bp * mean_micro DIV 10000 AS BIGINT)").alias(
            "delta_micro"
        ),
        F.expr(
            f"CAST({_POWER_CONST_MILLI} * var_micro2"
            " DIV (1000 * CAST(mde_bp * mean_micro DIV 10000 AS DECIMAL(38,0))"
            "          * (mde_bp * mean_micro DIV 10000)) + 1 AS BIGINT)"
        ).alias("n_per_arm"),
    )
