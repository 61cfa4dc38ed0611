"""Round-6 batch 6 (X372-X373): group-median imputation census and the
peaks-over-threshold GPD tail fit.

X372 is the missing-data OPERATOR the warehouse suite lacked (every
stats query upstream assumes complete columns; real inlets aren't).
X373 completes the extreme-value trio: X370 (Hill) estimates the tail
index from order statistics, X355 (VaR/ES) reads empirical tail
numbers, GPD-POT FITS the exceedance law those numbers extrapolate
with — the method-of-moments form, closed-form and hash-verifiable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.queries.round6a import _md5i, _md5i_sql
from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# --- X372: group-median imputation census ---------------------------------------

_IMP_MASK_PCT = 5  # md5-masked "missing" share


@register(
    "q_impute_census",
    oracle=f"""
    WITH masked AS (
        SELECT c_custkey, c_mktsegment AS seg,
               CASE WHEN {_md5i_sql("'imp|' || CAST(c_custkey AS VARCHAR)")}
                         % 100 < {_IMP_MASK_PCT}
                    THEN NULL
                    ELSE CAST(ROUND(c_acctbal * 100) AS BIGINT) END AS bal
        FROM customer
    ),
    med AS (
        SELECT seg, CAST(quantile_disc(bal, 0.5) AS BIGINT) AS seg_median
        FROM masked WHERE bal IS NOT NULL GROUP BY seg
    ),
    imputed AS (
        SELECT m.seg, COALESCE(m.bal, d.seg_median) AS bal_f,
               CASE WHEN m.bal IS NULL THEN 1 ELSE 0 END AS was_null
        FROM masked m JOIN med d ON d.seg = m.seg
    )
    SELECT i.seg,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(was_null) AS BIGINT) AS n_imputed,
           d.seg_median,
           CAST(SUM(bal_f) // COUNT(*) AS BIGINT) AS mean_after_centi,
           CAST(SUM(CASE WHEN was_null = 0 THEN bal_f ELSE 0 END)
                // SUM(1 - was_null) AS BIGINT) AS mean_observed_centi
    FROM imputed i JOIN med d ON d.seg = i.seg
    GROUP BY i.seg, d.seg_median
    ORDER BY i.seg
    """,
)
def q_impute_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X372: group-median imputation + audit census — the missing-data
    operator the analytical suite assumes has already run. 5% of
    account balances are masked by a deterministic md5 rule (a REAL
    inlet feeds real NULLs into the identical plan — the mask is what
    makes the operator hash-verifiable here, the X? planted-rotation
    trick applied to missingness); each NULL fills with its market
    segment's EXACT median (percentile_disc order statistic over the
    observed values), and the census reports per segment: rows,
    imputed count, the median used, and post-vs-observed means — the
    imputation-shift audit a data-quality gate reads.

    100 TB: one scan + a per-group exact median (group-sized
    percentile merge) + one broadcast join of the 5-row median table.
    """
    c = table(spark, sf_dir, "customer")
    h = _md5i(F.concat(F.lit("imp|"), F.col("c_custkey").cast("string")))
    masked = c.select(
        F.col("c_mktsegment").alias("seg"),
        F.when(
            h % 100 < _IMP_MASK_PCT, F.lit(None).cast("bigint")
        )
        .otherwise(F.round(F.col("c_acctbal") * 100).cast("bigint"))
        .alias("bal"),
    )
    med = (
        masked.where(F.col("bal").isNotNull())
        .groupBy("seg")
        .agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY bal)")
            .cast("bigint")
            .alias("seg_median")
        )
    )
    imputed = masked.join(F.broadcast(med), "seg").select(
        "seg",
        "seg_median",
        F.coalesce(F.col("bal"), F.col("seg_median")).alias("bal_f"),
        F.when(F.col("bal").isNull(), 1).otherwise(0).alias("was_null"),
    )
    return (
        imputed.groupBy("seg", "seg_median")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("was_null").cast("bigint").alias("n_imputed"),
            F.expr("CAST(SUM(bal_f) DIV COUNT(*) AS BIGINT)").alias(
                "mean_after_centi"
            ),
            F.expr(
                "CAST(SUM(CASE WHEN was_null = 0 THEN bal_f ELSE 0 END)"
                " DIV SUM(1 - was_null) AS BIGINT)"
            ).alias("mean_observed_centi"),
        )
        .select(
            "seg",
            "n",
            "n_imputed",
            "seg_median",
            "mean_after_centi",
            "mean_observed_centi",
        )
        .orderBy("seg")
    )


# --- X373: peaks-over-threshold GPD fit (method of moments) -----------------------


@register(
    "q_gpd_pot",
    oracle="""
    WITH vals AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v FROM orders
    ),
    thr AS (
        SELECT CAST(quantile_disc(v, 0.95) AS BIGINT) AS u FROM vals
    ),
    exc AS (
        SELECT v - t.u AS y FROM vals CROSS JOIN thr t WHERE v > t.u
    ),
    mom AS (
        SELECT COUNT(*) AS n, SUM(y) AS s,
               SUM(CAST(y AS DECIMAL(38,0)) * y) AS q
        FROM exc
    )
    SELECT CAST(t.u AS BIGINT) AS threshold_centi,
           CAST(m.n AS BIGINT) AS n_exceed,
           CAST(m.s // m.n AS BIGINT) AS mean_excess_centi,
           -- MOM: xi = (1 - mean^2/var)/2, beta = mean*(mean^2/var + 1)/2
           CAST(ROUND(1000000 * (1 -
                (CAST(m.s AS DOUBLE) * m.s / m.n)
                / (CAST(m.q AS DOUBLE) - CAST(m.s AS DOUBLE) * m.s / m.n))
                / 2) AS BIGINT) AS xi_micro,
           CAST(ROUND((CAST(m.s AS DOUBLE) / m.n) * (
                (CAST(m.s AS DOUBLE) * m.s / m.n)
                / (CAST(m.q AS DOUBLE) - CAST(m.s AS DOUBLE) * m.s / m.n)
                + 1) / 2) AS BIGINT) AS beta_centi
    FROM mom m CROSS JOIN thr t
    """,
)
def q_gpd_pot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X373: peaks-over-threshold generalized-Pareto fit, method of
    moments — the extreme-value trio's closer: X370's Hill reads the
    tail index off order statistics, X355's VaR/ES read the empirical
    tail, and GPD-POT fits the law that EXTRAPOLATES beyond the
    observed maximum (the Pickands-Balkema-de Haan guarantee: excesses
    over a high threshold converge to GPD regardless of the parent).
    Threshold = exact p95 order statistic; excess moments are exact
    centi/DECIMAL(38) integers; xi and beta come out of the
    closed-form MOM identities with doubles only in the final
    combination (the q_eigen2_closed lesson: every decimal casts to
    double SEPARATELY, no subtractive cancellation in these forms —
    var = q - s^2/n is the one subtraction and it is the dominant
    term, not a near-cancellation, for any dispersed tail).

    100 TB: one percentile pass + one filtered moment scan — both
    partial-aggregated; nothing holistic touches fact rows twice.
    """
    o = table(spark, sf_dir, "orders")
    vals = o.select(F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"))
    thr = vals.agg(
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY v)")
        .cast("bigint")
        .alias("u")
    )
    exc = (
        vals.crossJoin(F.broadcast(thr))
        .where(F.col("v") > F.col("u"))
        .select((F.col("v") - F.col("u")).alias("y"), "u")
    )
    dec = "decimal(38,0)"
    mom = exc.groupBy("u").agg(
        F.count("*").alias("n"),
        F.sum("y").alias("s"),
        F.sum(F.col("y").cast(dec) * F.col("y")).alias("q"),
    )
    s_d = F.col("s").cast("double")
    q_d = F.col("q").cast("double")
    n_ = F.col("n")
    mean2_over_var = (s_d * F.col("s") / n_) / (q_d - s_d * F.col("s") / n_)
    return mom.select(
        F.col("u").cast("bigint").alias("threshold_centi"),
        n_.cast("bigint").alias("n_exceed"),
        F.expr("CAST(s DIV n AS BIGINT)").alias("mean_excess_centi"),
        F.round(1000000 * (1 - mean2_over_var) / 2)
        .cast("bigint")
        .alias("xi_micro"),
        F.round((s_d / n_) * (mean2_over_var + 1) / 2)
        .cast("bigint")
        .alias("beta_centi"),
    )
