"""Round-6 batch 3 (X362-X365): the numerical-core closures — 2D
orthogonal Procrustes and closed-form 2-feature PCA/Cholesky — plus
the standardized effect-size suite.

The reference (statgen/LASER-Hadoop) schedules PCA + Procrustes
projection in EXTERNAL binaries (`LASERInputValidator.java:158-182`
job descriptors; SURVEY §2 U1's grouped black-box); the engine's U1/U5
operators run the grouped-map plumbing with a stand-in kernel. X362/
X363/X364 close the remaining gap at the dimensionality where the
algebra is CLOSED-FORM (2 features / 2D point sets): cross-moments are
exact n-scaled integers (n*Sxy - Sx*Sy through DECIMAL(38,0)), and the
only floats are the final sqrt/division — so the math the reference
trusts to a binary is here hash-verified against an independent
engine, and the full-rank float path stays in the U5 Arrow kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.operators.cumulative import ordered_cumsum
from laser_hadoop_spark.queries.round6a import _md5i, _md5i_sql
from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# --- X362: 2D orthogonal Procrustes ---------------------------------------------

_PR_RANGE = 10000


@register(
    "q_procrustes2d",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey AS id,
               {_md5i_sql("'x|' || CAST(c_custkey AS VARCHAR)")} % {_PR_RANGE} AS x,
               {_md5i_sql("'y|' || CAST(c_custkey AS VARCHAR)")} % {_PR_RANGE} AS y
        FROM customer
    ),
    pairs AS (
        SELECT id, x, y,
               (3 * x - 4 * y) // 5
                   + ({_md5i_sql("'j|' || CAST(id AS VARCHAR)")} % 21 - 10) AS x2,
               (4 * x + 3 * y) // 5
                   + ({_md5i_sql("'k|' || CAST(id AS VARCHAR)")} % 21 - 10) AS y2
        FROM pts
    ),
    mom AS (
        SELECT COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy, SUM(x2) AS sx2, SUM(y2) AS sy2,
               SUM(CAST(x AS DECIMAL(38,0)) * x2 + CAST(y AS DECIMAL(38,0)) * y2)
                   AS sdot,
               SUM(CAST(x AS DECIMAL(38,0)) * y2 - CAST(y AS DECIMAL(38,0)) * x2)
                   AS scross
        FROM pairs
    ),
    cm AS (
        SELECT n,
               n * sdot - (CAST(sx AS DECIMAL(38,0)) * sx2
                           + CAST(sy AS DECIMAL(38,0)) * sy2) AS s1n,
               n * scross - (CAST(sx AS DECIMAL(38,0)) * sy2
                             - CAST(sy AS DECIMAL(38,0)) * sx2) AS s2n
        FROM mom
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(s1n AS BIGINT) AS s1n,
           CAST(s2n AS BIGINT) AS s2n,
           CAST(ROUND(1000000 * s1n
                / SQRT(CAST(s1n * s1n + s2n * s2n AS DOUBLE))) AS BIGINT)
               AS cos_micro,
           CAST(ROUND(1000000 * s2n
                / SQRT(CAST(s1n * s1n + s2n * s2n AS DOUBLE))) AS BIGINT)
               AS sin_micro
    FROM cm
    """,
)
def q_procrustes2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X362: 2D orthogonal Procrustes rotation recovery — the
    alignment step the reference runs in an external binary (TRACE's
    Procrustes projection of study samples onto reference PCA space),
    exactly verified at the dimensionality where it is closed-form.

    A target point set is a known rational rotation of the md5 source
    set (the 3-4-5 Pythagorean rotation cos=3/5 sin=4/5 keeps every
    coordinate an integer) plus hash jitter; Procrustes recovers the
    rotation from the CENTERED cross-moments: R = [[c,-s],[s,c]] with
    (c, s) proportional to (Sum x.x'+y.y', Sum x.y'-y.x'). Centering
    never materializes means: n-scaled integer identities
    (n*S_dot - Sx*Sx2 - Sy*Sy2) keep everything exact in DECIMAL(38),
    and the recovered (cos, sin) micro lands on ~(600000, 800000) —
    the planted rotation — the single sqrt is the only float.

    100 TB: one scan, one 7-column moment aggregate — the same
    single-pass shape as X348's correlation matrix.
    """
    c = table(spark, sf_dir, "customer")
    key = F.col("c_custkey").cast("string")
    x = (_md5i(F.concat(F.lit("x|"), key)) % _PR_RANGE).alias("x")
    y = (_md5i(F.concat(F.lit("y|"), key)) % _PR_RANGE).alias("y")
    pts = c.select(F.col("c_custkey").alias("id"), x, y)
    jit_x = _md5i(F.concat(F.lit("j|"), F.col("id").cast("string"))) % 21 - 10
    jit_y = _md5i(F.concat(F.lit("k|"), F.col("id").cast("string"))) % 21 - 10
    pairs = pts.select(
        "x",
        "y",
        (F.expr("(3 * x - 4 * y) DIV 5") + jit_x).alias("x2"),
        (F.expr("(4 * x + 3 * y) DIV 5") + jit_y).alias("y2"),
    )
    dec = "decimal(38,0)"
    mom = pairs.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("x2").alias("sx2"),
        F.sum("y2").alias("sy2"),
        F.sum(
            F.col("x").cast(dec) * F.col("x2") + F.col("y").cast(dec) * F.col("y2")
        ).alias("sdot"),
        F.sum(
            F.col("x").cast(dec) * F.col("y2") - F.col("y").cast(dec) * F.col("x2")
        ).alias("scross"),
    )
    s1n = F.col("n") * F.col("sdot") - (
        F.col("sx").cast(dec) * F.col("sx2") + F.col("sy").cast(dec) * F.col("sy2")
    )
    s2n = F.col("n") * F.col("scross") - (
        F.col("sx").cast(dec) * F.col("sy2") - F.col("sy").cast(dec) * F.col("sx2")
    )
    cm = mom.select(F.col("n"), s1n.alias("s1n"), s2n.alias("s2n"))
    norm = F.sqrt(
        (F.col("s1n") * F.col("s1n") + F.col("s2n") * F.col("s2n")).cast("double")
    )
    return cm.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("s1n").cast("bigint").alias("s1n"),
        F.col("s2n").cast("bigint").alias("s2n"),
        F.round(F.lit(1000000) * F.col("s1n").cast("double") / norm)
        .cast("bigint")
        .alias("cos_micro"),
        F.round(F.lit(1000000) * F.col("s2n").cast("double") / norm)
        .cast("bigint")
        .alias("sin_micro"),
    )


# --- X363: closed-form 2-feature PCA ----------------------------------------------


@register(
    "q_eigen2_closed",
    oracle="""
    WITH v AS (
        SELECT CAST(ROUND(l_quantity) AS BIGINT) AS x,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem
    ),
    mom AS (
        SELECT COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
               SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
               SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy
        FROM v
    ),
    cov AS (
        SELECT n,
               n * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS a,
               n * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS b,
               n * syy - CAST(sy AS DECIMAL(38,0)) * sy AS c
        FROM mom
    ),
    d AS (
        -- all double algebra from here: (a-c)^2 overflows DECIMAL(38)
        -- once price^2 moments pass ~1e19 (hit at sf0.001 already),
        -- and each decimal op casts to double SEPARATELY so both
        -- engines round identically
        SELECT n, CAST(a AS DOUBLE) AS ad, CAST(b AS DOUBLE) AS bd,
               CAST(c AS DOUBLE) AS cd
        FROM cov
    ),
    ev AS (
        -- ev1 by the additive (cancellation-free) formula; ev2 via
        -- det/ev1, NEVER (t - disc)/2 — price variance dominates, so
        -- the subtractive form cancels to noise (probed: 3e-6
        -- divergence between engines)
        SELECT n, ad, bd, cd,
               (ad + cd + SQRT(POWER(ad - cd, 2) + 4 * POWER(bd, 2))) / 2
                   AS ev1
        FROM d
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(ev1, 4) AS ev1_n2,
           ROUND((ad * cd - bd * bd) / ev1, 4) AS ev2_n2,
           CAST(ROUND(10000 * ev1 / (ad + cd)) AS BIGINT) AS ev1_share_bp,
           -- eigenvector (b, ev1 - a): ev1 - a ~ c - a, no cancellation
           -- (the (ev1 - c) parametrization cancels catastrophically)
           CAST(ROUND(1000000 * bd / (ev1 - ad)) AS BIGINT)
               AS axis_ratio_micro
    FROM ev
    """,
)
def q_eigen2_closed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X363: closed-form 2-feature PCA over (quantity, price) — the
    exact-algebra member of the PCA story: U1/U5 run the reference's
    full-rank PCA in the grouped Arrow kernel (float, rows-only by
    nature), X208 builds the Gram matrix; this solves the eigenproblem
    END-TO-END where 2x2 algebra is closed-form. Covariance moments
    are n-scaled integers (n*Sxy - Sx*Sy, n^2*cov — price^2 sums need
    DECIMAL(38), the X348 lesson); eigenvalues, the leading
    explained-variance share, and the principal-axis direction ratio
    (x-loading per unit y-loading, from (ev1 - c)/b) take one sqrt.

    100 TB: one scan, one 6-column moment aggregate — X348's shape.
    """
    li = table(spark, sf_dir, "lineitem")
    v = li.select(
        F.round(F.col("l_quantity")).cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )
    dec = "decimal(38,0)"
    mom = v.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast(dec) * F.col("y")).alias("sxy"),
        F.sum(F.col("y").cast(dec) * F.col("y")).alias("syy"),
    )
    cov = mom.select(
        "n",
        (F.col("n") * F.col("sxx") - F.col("sx").cast(dec) * F.col("sx")).alias("a"),
        (F.col("n") * F.col("sxy") - F.col("sx").cast(dec) * F.col("sy")).alias("b"),
        (F.col("n") * F.col("syy") - F.col("sy").cast(dec) * F.col("sy")).alias("c"),
    )
    # all double from here (decimal (a-c)^2 overflows 38 digits —
    # probed: DuckDB raises, Spark nulls), with the numerically STABLE
    # closed forms: ev1 additive, ev2 = det/ev1 (the subtractive
    # (t - disc)/2 cancels to noise when one variance dominates —
    # probed 3e-6 cross-engine divergence), eigenvector (b, ev1 - a)
    # (ev1 - a ~ c - a; the (ev1 - c) form cancels catastrophically)
    a, b, c = (F.col(k).cast("double") for k in ("a", "b", "c"))
    disc = F.sqrt(F.pow(a - c, 2) + 4 * F.pow(b, 2))
    ev1 = (a + c + disc) / 2
    return cov.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(ev1, 4).alias("ev1_n2"),
        F.round((a * c - b * b) / ev1, 4).alias("ev2_n2"),
        F.round(F.lit(10000) * ev1 / (a + c)).cast("bigint").alias("ev1_share_bp"),
        F.round(F.lit(1000000) * b / (ev1 - a))
        .cast("bigint")
        .alias("axis_ratio_micro"),
    )


# --- X364: per-group 2x2 Cholesky (whitening factors) ------------------------------


@register(
    "q_cholesky2",
    oracle="""
    WITH v AS (
        SELECT l_returnflag AS g,
               CAST(ROUND(l_quantity) AS BIGINT) AS x,
               CAST(ROUND(l_discount * 100) AS BIGINT) AS y
        FROM lineitem
    ),
    mom AS (
        SELECT g, COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
               SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
               SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy
        FROM v GROUP BY g
    ),
    cov AS (
        SELECT g, n,
               n * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS a,
               n * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS b,
               n * syy - CAST(sy AS DECIMAL(38,0)) * sy AS c
        FROM mom
    )
    SELECT g, CAST(n AS BIGINT) AS n,
           CAST(ROUND(1000000 * SQRT(CAST(a AS DOUBLE))) AS BIGINT)
               AS l11_micro_n,
           CAST(ROUND(1000000 * CAST(b AS DOUBLE) / SQRT(CAST(a AS DOUBLE)))
                AS BIGINT) AS l21_micro_n,
           CAST(ROUND(1000000 * SQRT(CAST(a * c - b * b AS DOUBLE)
                                     / CAST(a AS DOUBLE))) AS BIGINT)
               AS l22_micro_n,
           CAST(a * c - b * b AS VARCHAR) AS det_n4
    FROM cov
    ORDER BY g
    """,
)
def q_cholesky2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X364: per-group 2x2 Cholesky factors of the (quantity,
    discount) covariance — the whitening step between raw features
    and any Mahalanobis/PCA consumer (whiten first, THEN distance —
    the missing link between X348's correlation matrix and X299's
    multivariate outlier scores). L11 = sqrt(a), L21 = b/sqrt(a),
    L22 = sqrt((ac - b^2)/a) on the n-scaled integer covariance;
    the exact integer determinant n^4*det rides along AS VARCHAR (a
    DECIMAL(38) value — the positive-definiteness certificate: the
    factorization exists iff a > 0 and det > 0, both exact).

    100 TB: one scan, one per-group moment aggregate (3 groups).
    """
    li = table(spark, sf_dir, "lineitem")
    v = li.select(
        F.col("l_returnflag").alias("g"),
        F.round(F.col("l_quantity")).cast("bigint").alias("x"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("y"),
    )
    dec = "decimal(38,0)"
    mom = v.groupBy("g").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast(dec) * F.col("y")).alias("sxy"),
        F.sum(F.col("y").cast(dec) * F.col("y")).alias("syy"),
    )
    cov = mom.select(
        "g",
        "n",
        (F.col("n") * F.col("sxx") - F.col("sx").cast(dec) * F.col("sx")).alias("a"),
        (F.col("n") * F.col("sxy") - F.col("sx").cast(dec) * F.col("sy")).alias("b"),
        (F.col("n") * F.col("syy") - F.col("sy").cast(dec) * F.col("sy")).alias("c"),
    )
    a, b, c = (F.col(k).cast("double") for k in ("a", "b", "c"))
    det = F.col("a") * F.col("c") - F.col("b") * F.col("b")
    return cov.select(
        "g",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.lit(1000000) * F.sqrt(a)).cast("bigint").alias("l11_micro_n"),
        F.round(F.lit(1000000) * b / F.sqrt(a)).cast("bigint").alias("l21_micro_n"),
        F.round(F.lit(1000000) * F.sqrt(det.cast("double") / a))
        .cast("bigint")
        .alias("l22_micro_n"),
        det.cast("string").alias("det_n4"),
    ).orderBy("g")


# --- X365: standardized effect-size suite -------------------------------------------


@register(
    "q_effect_sizes",
    oracle="""
    WITH v AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS ga
        FROM orders
    ),
    census AS (
        SELECT v AS val,
               SUM(ga) AS ca,
               SUM(1 - ga) AS cb
        FROM v GROUP BY v
    ),
    ranked AS (
        SELECT val, ca, cb,
               SUM(cb) OVER (ORDER BY val) AS kb
        FROM census
    ),
    cliff AS (
        SELECT SUM(ca * (kb - cb)) AS conc,
               SUM(ca * cb) AS ties
        FROM ranked
    ),
    mom AS (
        SELECT SUM(ga) AS na, SUM(1 - ga) AS nb,
               SUM(CASE WHEN ga = 1 THEN v ELSE 0 END) AS sa,
               SUM(CASE WHEN ga = 0 THEN v ELSE 0 END) AS sb,
               SUM(CASE WHEN ga = 1
                        THEN CAST(v AS DECIMAL(38,0)) * v ELSE 0 END) AS qa,
               SUM(CASE WHEN ga = 0
                        THEN CAST(v AS DECIMAL(38,0)) * v ELSE 0 END) AS qb
        FROM v
    )
    SELECT CAST(m.na AS BIGINT) AS n_a, CAST(m.nb AS BIGINT) AS n_b,
           CAST(ROUND(1000000 *
                (CAST(m.sa AS DOUBLE) / m.na - CAST(m.sb AS DOUBLE) / m.nb)
                / SQRT(((CAST(m.qa AS DOUBLE)
                         - CAST(m.sa AS DOUBLE) * m.sa / m.na)
                        + (CAST(m.qb AS DOUBLE)
                           - CAST(m.sb AS DOUBLE) * m.sb / m.nb))
                       / (m.na + m.nb - 2))) AS BIGINT) AS cohens_d_micro,
           CAST(ROUND(1000000 *
                (CAST(m.sa AS DOUBLE) / m.na - CAST(m.sb AS DOUBLE) / m.nb)
                / SQRT(((CAST(m.qa AS DOUBLE)
                         - CAST(m.sa AS DOUBLE) * m.sa / m.na)
                        + (CAST(m.qb AS DOUBLE)
                           - CAST(m.sb AS DOUBLE) * m.sb / m.nb))
                       / (m.na + m.nb - 2))
                * (1 - 3.0 / (4 * (m.na + m.nb) - 9))) AS BIGINT)
               AS hedges_g_micro,
           -- HUGEINT // (truncating, matches Spark DIV); DECIMAL //
           -- degrades to double division + a ROUNDING bigint cast
           -- (the X349 probe) — caught live by the round-8 sf0.1
           -- sweep: quotient 1897.64 hashed 1898 vs Spark's 1897
           CAST(1000000 * (2 * c.conc + c.ties
                           - CAST(m.na AS HUGEINT) * m.nb)
                // (CAST(m.na AS HUGEINT) * m.nb) AS BIGINT)
               AS cliffs_delta_micro
    FROM mom m CROSS JOIN cliff c
    """,
)
def q_effect_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X365: the standardized effect-size suite for URGENT-vs-rest
    order value: Cohen's d, Hedges' g (the small-sample-corrected d),
    and Cliff's delta — the numbers a significance test (X358's
    p-value, the Mann-Whitney U) must be reported WITH, since at
    100 TB row counts everything is 'significant' and only magnitude
    matters.

    Cliff's delta is EXACT integer: from the shared value census,
    concordant pairs = Sum ca * (#B strictly below) via
    ordered_cumsum, delta = (P(a>b) - P(a<b)) = (2*conc + ties -
    na*nb)/(na*nb), one signed truncating DIV (both engines truncate
    toward zero). d and g take doubles only at the final
    mean/variance combination of exact centi/decimal moments.

    100 TB: one conditional-moment scan + one distinct-value census
    with a two-pass cumulative — no per-row window, no pair join
    (na*nb pairs are NEVER materialized; the census does the
    counting).
    """
    o = table(spark, sf_dir, "orders")
    v = o.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("ga"),
    )
    dec = "decimal(38,0)"
    census = v.groupBy(F.col("v").alias("val")).agg(
        F.sum("ga").alias("ca"), F.sum(1 - F.col("ga")).alias("cb")
    )
    ranked = ordered_cumsum(census, order_by=["val"], values={"cb": "kb"})
    cliff = ranked.agg(
        F.sum(F.col("ca") * (F.col("kb") - F.col("cb"))).alias("conc"),
        F.sum(F.col("ca") * F.col("cb")).alias("ties"),
    )
    mom = v.agg(
        F.sum("ga").alias("na"),
        F.sum(1 - F.col("ga")).alias("nb"),
        F.sum(F.when(F.col("ga") == 1, F.col("v")).otherwise(0)).alias("sa"),
        F.sum(F.when(F.col("ga") == 0, F.col("v")).otherwise(0)).alias("sb"),
        F.sum(
            F.when(F.col("ga") == 1, F.col("v").cast(dec) * F.col("v")).otherwise(
                F.lit(0).cast(dec)
            )
        ).alias("qa"),
        F.sum(
            F.when(F.col("ga") == 0, F.col("v").cast(dec) * F.col("v")).otherwise(
                F.lit(0).cast(dec)
            )
        ).alias("qb"),
    )
    na, nb = F.col("na"), F.col("nb")
    mean_gap = F.col("sa").cast("double") / na - F.col("sb").cast("double") / nb
    pooled = F.sqrt(
        (
            (F.col("qa").cast("double") - F.col("sa").cast("double") * F.col("sa") / na)
            + (
                F.col("qb").cast("double")
                - F.col("sb").cast("double") * F.col("sb") / nb
            )
        )
        / (na + nb - 2)
    )
    d = F.lit(1000000) * mean_gap / pooled
    g = d * (1 - 3.0 / (4 * (na + nb) - 9))
    return mom.crossJoin(F.broadcast(cliff)).select(
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint").alias("n_b"),
        F.round(d).cast("bigint").alias("cohens_d_micro"),
        F.round(g).cast("bigint").alias("hedges_g_micro"),
        F.expr(
            "CAST(1000000 * (2 * conc + ties - CAST(na AS DECIMAL(38,0)) * nb)"
            " DIV (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)"
        ).alias("cliffs_delta_micro"),
    )
