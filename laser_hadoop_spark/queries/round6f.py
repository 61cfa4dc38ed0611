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


# --- X374: k-dim Procrustes at production dimensionality (corpus entry) -------

# Planted exact transform: block-diagonal Givens rotation from
# Pythagorean-triple cosines (every entry rational), scale 3/2, integer
# translation. The study side is the reference side pushed through it,
# so the fitted Procrustes projection must recover the ORIGINAL integer
# PCs — analytically known, hence SQL-expressible without an SVD in the
# oracle. Fit-recovery error is ~1e-11 absolute on integer-valued
# targets, so rounding to integers is 10 orders from any boundary
# (X362 exactness discipline at k=8 instead of the 2D closed form).
_PK_GIVENS = (
    (0, 1, 3 / 5, 4 / 5),
    (2, 3, 5 / 13, 12 / 13),
    (4, 5, 8 / 17, 15 / 17),
    (6, 7, 7 / 25, 24 / 25),
)
_PK_SCALE = 1.5
_PK_SHIFT = (7.0, -3.0, 11.0, 5.0, -9.0, 2.0, 13.0, -6.0)
_PK_DIM = 8


@register(
    "q_procrustes_kdim",
    oracle=f"""
    SELECT CAST(label AS INT) AS grp,
           CAST(vec_id AS BIGINT) AS vid,
           CAST(d.dim AS INT) AS dim,
           CAST(round(embedding[CAST(d.dim AS INT) + 1] * 1000) AS BIGINT)
               AS val
    FROM embeddings,
         (SELECT UNNEST(range({_PK_DIM})) AS dim) d
    ORDER BY grp, vid, dim
    """,
)
def q_procrustes_kdim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X374: per-label k-dim orthogonal Procrustes projection (U5's
    production-dimensionality path, VERDICT_r10 item 4).

    The reference schedules its external trace/procrustes binary per
    chunk at dim≈8 (LASERInputValidator.java:162,176-177); here the
    same fit runs as operators/pca.py grouped_procrustes (cogrouped
    applyInPandas, k x k SVD per group). Corpus verification by
    planted-transform recovery: the study frame is the reference frame
    (integer-quantized first-8 embedding dims) pushed through a FIXED
    rational rotation + scale 3/2 + integer shift; the fitted per-label
    transform must map every study row back onto the original integers
    exactly (micro-error ~1e-11 << 0.5), which the DuckDB oracle states
    directly — no SVD needed on the oracle side.

    100 TB: each label group is one Arrow batch on one task (the
    reference's per-chunk analyses are thousands of rows); cross-moment
    is O(n k^2) scan-local per group, SVD is k x k.

    Data assumption (ADVICE r11): every label group must have >= 2
    shared anchor rows — grouped_procrustes DROPS smaller groups (a
    k x k fit from one anchor is underdetermined), while the oracle
    emits a row for every embeddings row, so a dataset with a
    singleton label group would fail the corpus check as a row-count
    mismatch. Pinned loudly by
    tests/test_round12_fixes.py::test_procrustes_kdim_label_groups_fittable
    (current data: min group size 42 at sf0.001).
    """
    from laser_hadoop_spark.operators.pca import grouped_procrustes

    emb = table(spark, sf_dir, "embeddings")
    pc_ref = emb.select(
        F.col("label").cast("string").alias("label"),
        F.col("vec_id").cast("string").alias("id"),
        F.array(
            *[
                F.round(F.col("embedding")[k] * 1000).cast("double")
                for k in range(_PK_DIM)
            ]
        ).alias("pc"),
    )
    rot = [None] * _PK_DIM
    for i, j, c, s in _PK_GIVENS:
        u, v = F.col("pc")[i], F.col("pc")[j]
        rot[i] = c * u + s * v
        rot[j] = -s * u + c * v
    study = pc_ref.select(
        "label",
        "id",
        F.array(
            *[
                (_PK_SCALE * e + F.lit(t)).cast("double")
                for e, t in zip(rot, _PK_SHIFT)
            ]
        ).alias("pc"),
    )
    proj = grouped_procrustes(
        study, pc_ref, group_col="label", id_col="id", pc_col="pc"
    )
    return (
        proj.select(
            F.col("label").cast("int").alias("grp"),
            F.col("id").cast("bigint").alias("vid"),
            F.posexplode("proj").alias("dim", "val"),
        )
        .select(
            "grp",
            "vid",
            F.col("dim").cast("int").alias("dim"),
            F.round("val").cast("bigint").alias("val"),
        )
        .orderBy("grp", "vid", "dim")
    )
