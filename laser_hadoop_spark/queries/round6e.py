"""Round-6 batch 5 (X370-X371): Hill tail-index estimator and 1-NN
propensity-score caliper matching.

- X370 closes the heavy-tail toolkit: X105 fits Zipf's slope on ranks,
  X340 fits a Gumbel to block maxima; Hill estimates the Pareto tail
  exponent from the top order statistics directly — the number that
  decides whether means/variances of the value distribution even
  exist, and therefore whether X218's bootstrap CIs can be trusted.
- X371 adds the nearest-neighbor member of the causal-matching family:
  X317's CEM matches on coarsened cells, X255 scores interventions;
  PSM-1NN pairs every treated unit with its single closest control on
  a continuous score within a caliper — implemented as a caliper-
  blocked 1D grid join (never all-pairs), matching WITH replacement
  so the estimator is order-free and deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# --- X370: Hill tail-index estimator ------------------------------------------

_HILL_KS = (100, 300)


def _hill_oracle() -> str:
    branches = []
    for k in _HILL_KS:
        branches.append(f"""
        SELECT {k} AS k,
               (SELECT v FROM ranked WHERE rn = {k} + 1) AS x_ref_centi,
               CAST(1000000000000 * {k} //
                    SUM(lnm_v - (SELECT lnm_v FROM ranked WHERE rn = {k} + 1))
                    AS BIGINT) AS alpha_micro,
               CAST(SUM(lnm_v
                        - (SELECT lnm_v FROM ranked WHERE rn = {k} + 1))
                    AS BIGINT) AS sum_lnr_micro
        FROM ranked WHERE rn <= {k}""")
    union = "\n        UNION ALL".join(branches)
    return f"""
    WITH vals AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v, o_orderkey
        FROM orders
    ),
    ranked AS (
        SELECT v, CAST(ROUND(1000000 * LN(v)) AS BIGINT) AS lnm_v,
               ROW_NUMBER() OVER (ORDER BY v DESC, o_orderkey) AS rn
        FROM vals
        QUALIFY ROW_NUMBER() OVER (ORDER BY v DESC, o_orderkey)
            <= {max(_HILL_KS) + 1}
    )
    SELECT * FROM ({union})
    ORDER BY k
    """


def _hill_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-checkpoint top-(kmax+1) order-statistic relation — the
    PROVABLY BOUNDED input of q_hill_tail's intentionally-global rank
    window. Exposed so tests/test_round10_fixes.py can assert the
    GlobalLimit 301 in-plan (VERDICT_r09 item 6: the WindowExec
    "No Partition Defined" warning this query emits is benign exactly
    because this relation is a 301-row TakeOrdered, and the eager
    localCheckpoint in the query hides that limit from the final
    plan's text)."""
    o = table(spark, sf_dir, "orders")
    vals = o.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
        "o_orderkey",
    )
    kmax = max(_HILL_KS)
    return (
        vals.orderBy(F.desc("v"), "o_orderkey")
        .limit(kmax + 1)
        .select("v", F.round(1000000 * F.log("v")).cast("bigint").alias("lnm_v"))
    )


@register("q_hill_tail", oracle=_hill_oracle())
def q_hill_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X370: Hill estimator of the Pareto tail index of order values,
    at two cutoffs (k=100, 300 — reading alpha's stability across k IS
    the Hill-plot diagnostic). alpha = k / sum_{i<=k} ln(x_(i)/x_(k+1))
    over the top order statistics: each ln micro-rounds BEFORE the
    integer sum (X253's discipline), the ratio is one integer
    division, and the top-(k+1) set is made engine-identical by the
    (value DESC, orderkey) tiebreak. alpha <= 2 would mean infinite
    variance — the existence check for every mean/CI this suite
    reports on the same column.

    100 TB: top-(k+1) is a TakeOrdered (per-partition top-k then a
    k-sized merge — never a global sort); everything after runs on a
    301-row broadcast relation.
    """
    top = _hill_top(spark, sf_dir)
    # rank within the 301-row relation (broadcast-sized — a window
    # here is a single tiny partition by construction, not a funnel
    # of fact data; the TakeOrdered above did the distributed work)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("v"))
    ranked = top.select(
        "v", "lnm_v", F.row_number().over(w).alias("rn")
    ).localCheckpoint(eager=True)
    out = None
    for k in _HILL_KS:
        ref = ranked.where(F.col("rn") == k + 1).select(
            F.col("v").alias("x_ref_centi"), F.col("lnm_v").alias("lnm_ref")
        )
        part = (
            ranked.where(F.col("rn") <= k)
            .crossJoin(F.broadcast(ref))
            .agg(
                F.lit(k).alias("k"),
                F.first("x_ref_centi").alias("x_ref_centi"),
                F.expr(
                    f"CAST(1000000000000 * {k} DIV SUM(lnm_v - lnm_ref)"
                    " AS BIGINT)"
                ).alias("alpha_micro"),
                F.sum(F.col("lnm_v") - F.col("lnm_ref"))
                .cast("bigint")
                .alias("sum_lnr_micro"),
            )
        )
        out = part if out is None else out.unionByName(part)
    return out.orderBy("k")


# --- X371: 1-NN propensity-score caliper matching ------------------------------

_PSM_CALIPER = 20000  # centi (one acctbal band of $200)


@register(
    "q_psm_match",
    tags=("pairs",),
    oracle="""
    WITH cust AS (
        SELECT c.c_custkey AS id,
               CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS score,
               CASE WHEN c.c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END
                   AS treated,
               COALESCE(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)), 0)
                   AS outcome
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
        GROUP BY 1, 2, 3
    ),
    t AS (SELECT * FROM cust WHERE treated = 1),
    c AS (SELECT * FROM cust WHERE treated = 0),
    best AS (
        SELECT t.id AS t_id, t.outcome AS t_out,
               MIN({'dist': ABS(t.score - c.score),
                    'cid': c.id, 'cout': c.outcome}) AS m
        FROM t JOIN c
          ON ABS(t.score - c.score) <= 20000
        GROUP BY 1, 2
    )
    SELECT CAST((SELECT COUNT(*) FROM t) AS BIGINT) AS n_treated,
           CAST(COUNT(*) AS BIGINT) AS n_matched,
           CAST(SUM(t_out - (m).cout) // COUNT(*) AS BIGINT) AS att_centi,
           CAST(SUM((m).dist) // COUNT(*) AS BIGINT) AS mean_dist_centi
    FROM best
    """,
)
def q_psm_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X371: 1-nearest-neighbor propensity-score matching with a
    caliper — the continuous-score member of the causal-matching
    family (X317's CEM matches on coarsened CELLS; this pairs every
    treated unit with its single CLOSEST control within the caliper,
    with replacement, so the match is order-free and deterministic:
    ties on distance break on the lower control id via the (dist, id)
    argmin struct). ATT = mean treated-minus-matched-control total
    spend in exact centi; unmatched treated (no control inside the
    caliper) drop, and mean match distance rides along as the
    match-quality diagnostic.

    100 TB: candidates come from a caliper-blocked 1D grid join —
    each treated unit probes its own and both adjacent score blocks
    of width = caliper (|diff| <= caliper implies same-or-adjacent
    block, so the blocking is LOSSLESS — certified by the quadratic
    oracle); the argmin is one partial aggregate on a (dist, id)
    struct, never a sort.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    cust = (
        c.where(F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING"))
        .join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy(
            F.col("c_custkey").alias("id"),
            F.round(F.col("c_acctbal") * 100).cast("bigint").alias("score"),
            (F.col("c_mktsegment") == "AUTOMOBILE")
            .cast("int")
            .alias("treated"),
        )
        .agg(
            F.coalesce(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")),
                F.lit(0),
            ).alias("outcome")
        )
    )
    t = cust.where(F.col("treated") == 1).select(
        F.col("id").alias("t_id"),
        F.col("score").alias("t_score"),
        F.col("outcome").alias("t_out"),
    )
    ctrl = cust.where(F.col("treated") == 0).select(
        F.col("id").alias("c_id"),
        F.col("score").alias("c_score"),
        F.col("outcome").alias("c_out"),
    )
    # caliper-blocked grid join: treated probes blocks b-1, b, b+1
    blk_t = F.floor(F.col("t_score") / _PSM_CALIPER)
    probes = t.select(
        "t_id",
        "t_score",
        "t_out",
        F.explode(F.array(blk_t - 1, blk_t, blk_t + 1)).alias("blk"),
    )
    blocked_c = ctrl.withColumn(
        "blk", F.floor(F.col("c_score") / _PSM_CALIPER)
    )
    cand = probes.join(blocked_c, "blk").where(
        F.abs(F.col("t_score") - F.col("c_score")) <= _PSM_CALIPER
    )
    best = cand.groupBy("t_id", "t_out").agg(
        F.min(
            F.struct(
                F.abs(F.col("t_score") - F.col("c_score")).alias("dist"),
                F.col("c_id").alias("c_id"),
                F.col("c_out").alias("c_out"),
            )
        ).alias("m")
    )
    matched = best.select(
        "t_id", "t_out", F.col("m.dist").alias("dist"), F.col("m.c_out").alias("c_out")
    )
    n_t = t.agg(F.count("*").alias("n_treated"))
    return (
        matched.crossJoin(F.broadcast(n_t))
        .agg(
            F.first("n_treated").cast("bigint").alias("n_treated"),
            F.count("*").cast("bigint").alias("n_matched"),
            F.expr("CAST(SUM(t_out - c_out) DIV COUNT(*) AS BIGINT)").alias(
                "att_centi"
            ),
            F.expr("CAST(SUM(dist) DIV COUNT(*) AS BIGINT)").alias(
                "mean_dist_centi"
            ),
        )
    )
