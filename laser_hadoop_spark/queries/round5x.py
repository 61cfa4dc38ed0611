"""Round-5 widening queries, twenty-fourth batch (SURVEY.md §2.13, X320-X324).

Survey calibration, repeated-measures testing, exact optimal
transport, and RNG-quality auditing:

- X320 IPF raking: iterative proportional fitting of the
  (nation x segment) cell weights to uniform margins — the survey
  calibration / matrix balancing loop, two rounds unrolled with
  micro fixed-point factors (deterministic by construction).
- X321 Cochran's Q: k-treatment paired binary test (active in
  1996/1997/1998 per customer) — McNemar's k>2 generalization,
  exact integer row/column moment form.
- X322 Friedman test: rank-within-block repeated measures (3 yearly
  spends ranked within each customer) with tie-averaged DOUBLED
  midranks computed by pure comparison codegen — no window at all.
- X323 1D Wasserstein distance: exact earth-mover's distance between
  two spend distributions as the integer area between scaled ECDFs
  (the n_a*n_b cross-multiplication makes every step-area a product
  of integers); step gaps via X128's distributed lead.
- X324 Anderson-Darling uniformity audit: the tail-sensitive
  goodness-of-fit test applied to the engine's OWN md5-hash uniforms
  (the generator X218/X297 trust) — per-point logs micro-round on
  the two-pass global rank.

Reference parity note: engine extensions per SURVEY.md §2.13.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.operators.cumulative import ordered_cumsum
from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# --- X320: IPF raking ---------------------------------------------------------


@register(
    "q_ipf_raking",
    oracle="""
    WITH cells AS (
        SELECT c_nationkey AS i, c_mktsegment AS j,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM customer GROUP BY 1, 2
    ),
    tot AS (SELECT SUM(n) AS total, COUNT(DISTINCT i) AS nr,
                   COUNT(DISTINCT j) AS nc FROM cells),
    w0 AS (SELECT i, j, n, CAST(1000000 AS BIGINT) AS w FROM cells),
    r1s AS (SELECT i, SUM(n * w) AS s FROM w0 GROUP BY i),
    r1 AS (
        SELECT w0.i, w0.j, w0.n,
               CAST(ROUND(CAST(w0.w AS DOUBLE) * (t.total // t.nr)
                          * 1000000 / r1s.s) AS BIGINT) AS w
        FROM w0 JOIN r1s ON r1s.i = w0.i CROSS JOIN tot t
    ),
    c1s AS (SELECT j, SUM(n * w) AS s FROM r1 GROUP BY j),
    c1 AS (
        SELECT r1.i, r1.j, r1.n,
               CAST(ROUND(CAST(r1.w AS DOUBLE) * (t.total // t.nc)
                          * 1000000 / c1s.s) AS BIGINT) AS w
        FROM r1 JOIN c1s ON c1s.j = r1.j CROSS JOIN tot t
    ),
    r2s AS (SELECT i, SUM(n * w) AS s FROM c1 GROUP BY i),
    r2 AS (
        SELECT c1.i, c1.j, c1.n,
               CAST(ROUND(CAST(c1.w AS DOUBLE) * (t.total // t.nr)
                          * 1000000 / r2s.s) AS BIGINT) AS w
        FROM c1 JOIN r2s ON r2s.i = c1.i CROSS JOIN tot t
    ),
    c2s AS (SELECT j, SUM(n * w) AS s FROM r2 GROUP BY j),
    c2 AS (
        SELECT r2.i, r2.j, r2.n,
               CAST(ROUND(CAST(r2.w AS DOUBLE) * (t.total // t.nc)
                          * 1000000 / c2s.s) AS BIGINT) AS w
        FROM r2 JOIN c2s ON c2s.j = r2.j CROSS JOIN tot t
    ),
    colfit AS (
        SELECT c2.j AS segment, SUM(c2.n * c2.w) AS achieved_micro
        FROM c2 GROUP BY c2.j
    ),
    rowerr AS (
        SELECT MAX(ABS(s - (t.total // t.nr) * 1000000)) AS max_row_err
        FROM (SELECT i, SUM(n * w) AS s FROM c2 GROUP BY i)
        CROSS JOIN tot t GROUP BY t.total, t.nr
    )
    SELECT f.segment,
           CAST(t.total // t.nc AS BIGINT) AS target_n,
           CAST(f.achieved_micro AS BIGINT) AS achieved_micro,
           CAST(r.max_row_err AS BIGINT) AS max_row_err_micro
    FROM colfit f CROSS JOIN tot t CROSS JOIN rowerr r
    ORDER BY f.segment
    """,
)
def q_ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X320: iterative proportional fitting (raking) to uniform margins.

    The survey-calibration / matrix-balancing loop: reweight the
    (nation x segment) cells so each nation and each segment carries
    an equal share, alternating row fits and column fits. Two full
    rounds unrolled; every factor application is ONE float expression
    over exact integers (weights ride as micro ints, marginal sums
    are exact integer SUM(n*w)), micro-rounded per cell — X197's
    fixed-point discipline makes the iteration hash-reproducible.
    Output: per-segment achieved mass after round 2 (columns fit
    exactly, up to rounding) plus the max row-margin error the NEXT
    round would fix — the convergence observable.

    100 TB: one fact aggregate to the |nations x segments| cell
    relation; every round is joins over that tiny relation.
    """
    c = table(spark, sf_dir, "customer")
    cells = (
        c.groupBy(
            F.col("c_nationkey").alias("i"), F.col("c_mktsegment").alias("j")
        )
        .agg(F.count("*").cast("bigint").alias("n"))
        .localCheckpoint(eager=True)
    )
    tot = cells.agg(
        F.sum("n").alias("total"),
        F.count_distinct("i").alias("nr"),
        F.count_distinct("j").alias("nc"),
    )
    w = cells.select("i", "j", "n", F.lit(1000000).cast("bigint").alias("w"))

    def fit(df: DataFrame, key: str, tgt_den: str) -> DataFrame:
        s = df.groupBy(key).agg(F.sum(F.col("n") * F.col("w")).alias("s"))
        tgt = F.col("total") - F.col("total") % F.col(tgt_den)
        return (
            df.join(F.broadcast(s), key)
            .crossJoin(F.broadcast(tot))
            .select(
                "i",
                "j",
                "n",
                F.round(
                    F.col("w").cast("double")
                    * (tgt / F.col(tgt_den))
                    * 1000000
                    / F.col("s")
                )
                .cast("bigint")
                .alias("w"),
            )
            .localCheckpoint(eager=True)
        )

    for key, den in (("i", "nr"), ("j", "nc"), ("i", "nr"), ("j", "nc")):
        w = fit(w, key, den)
    colfit = w.groupBy(F.col("j").alias("segment")).agg(
        F.sum(F.col("n") * F.col("w")).alias("achieved_micro")
    )
    rows = w.groupBy("i").agg(F.sum(F.col("n") * F.col("w")).alias("s"))
    rowerr = (
        rows.crossJoin(F.broadcast(tot))
        .select(
            F.abs(
                F.col("s")
                - (F.col("total") - F.col("total") % F.col("nr"))
                / F.col("nr")
                * 1000000
            ).alias("e")
        )
        .agg(F.max("e").cast("bigint").alias("max_row_err"))
    )
    tgt_col = F.col("total") - F.col("total") % F.col("nc")
    return (
        colfit.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(rowerr))
        .select(
            "segment",
            (tgt_col / F.col("nc")).cast("bigint").alias("target_n"),
            F.col("achieved_micro").cast("bigint").alias("achieved_micro"),
            F.col("max_row_err").cast("bigint").alias("max_row_err_micro"),
        )
        .orderBy("segment")
    )


# --- X321: Cochran's Q test ---------------------------------------------------

_CQ_YEARS = (1996, 1997, 1998)


@register(
    "q_cochran_q",
    oracle=f"""
    WITH flags AS (
        SELECT o_custkey,
               MAX(CASE WHEN YEAR(CAST(o_orderdate AS DATE)) = {_CQ_YEARS[0]}
                   THEN 1 ELSE 0 END) AS x1,
               MAX(CASE WHEN YEAR(CAST(o_orderdate AS DATE)) = {_CQ_YEARS[1]}
                   THEN 1 ELSE 0 END) AS x2,
               MAX(CASE WHEN YEAR(CAST(o_orderdate AS DATE)) = {_CQ_YEARS[2]}
                   THEN 1 ELSE 0 END) AS x3
        FROM orders GROUP BY o_custkey
    ),
    moms AS (
        SELECT SUM(x1) AS c1, SUM(x2) AS c2, SUM(x3) AS c3,
               SUM(x1 + x2 + x3) AS nn,
               SUM((x1 + x2 + x3) * (x1 + x2 + x3)) AS sr2
        FROM flags
    )
    SELECT CAST(c1 AS BIGINT) AS c1, CAST(c2 AS BIGINT) AS c2,
           CAST(c3 AS BIGINT) AS c3,
           ROUND(2.0 * (3 * (c1 * c1 + c2 * c2 + c3 * c3) - nn * nn)
                 / (3 * nn - sr2), 4) AS q_stat
    FROM moms
    """,
)
def q_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X321: Cochran's Q — the k-treatment paired binary test.

    X291's McNemar handles two paired years; Q generalizes to k=3
    (was each customer active in '96/'97/'98?). The statistic
    Q = (k-1)(k*Sum C_j^2 - N^2) / (k*N - Sum R_i^2) uses only exact
    integer column sums, the total, and the row-sum squares — one
    float division at the end. All-zero rows drop out of every term
    automatically (the correct convention).

    100 TB: one customer-grain conditional aggregate + one 1-row
    moment aggregate — fully partial-aggregated, no joins.
    """
    o = table(spark, sf_dir, "orders")
    yr = F.year(F.col("o_orderdate").cast("date"))
    flags = o.groupBy("o_custkey").agg(
        *[
            F.max(F.when(yr == y, 1).otherwise(0)).alias(f"x{k+1}")
            for k, y in enumerate(_CQ_YEARS)
        ]
    )
    r = F.col("x1") + F.col("x2") + F.col("x3")
    moms = flags.agg(
        F.sum("x1").alias("c1"),
        F.sum("x2").alias("c2"),
        F.sum("x3").alias("c3"),
        F.sum(r).alias("nn"),
        F.sum(r * r).alias("sr2"),
    )
    c1, c2, c3, nn, sr2 = (
        F.col("c1"),
        F.col("c2"),
        F.col("c3"),
        F.col("nn"),
        F.col("sr2"),
    )
    return moms.select(
        c1.cast("bigint").alias("c1"),
        c2.cast("bigint").alias("c2"),
        c3.cast("bigint").alias("c3"),
        F.round(
            2.0 * (3 * (c1 * c1 + c2 * c2 + c3 * c3) - nn * nn)
            / (3 * nn - sr2),
            4,
        ).alias("q_stat"),
    )


# --- X322: Friedman test ------------------------------------------------------


@register(
    "q_friedman",
    oracle=f"""
    WITH spend AS (
        SELECT o_custkey,
               SUM(CASE WHEN YEAR(CAST(o_orderdate AS DATE)) = {_CQ_YEARS[0]}
                   THEN CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                   ELSE 0 END) AS y1,
               SUM(CASE WHEN YEAR(CAST(o_orderdate AS DATE)) = {_CQ_YEARS[1]}
                   THEN CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                   ELSE 0 END) AS y2,
               SUM(CASE WHEN YEAR(CAST(o_orderdate AS DATE)) = {_CQ_YEARS[2]}
                   THEN CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                   ELSE 0 END) AS y3
        FROM orders GROUP BY o_custkey
    ),
    dranks AS (
        SELECT
            2 + 2 * ((y2 < y1)::INT + (y3 < y1)::INT)
              + (y2 = y1)::INT + (y3 = y1)::INT AS d1,
            2 + 2 * ((y1 < y2)::INT + (y3 < y2)::INT)
              + (y1 = y2)::INT + (y3 = y2)::INT AS d2,
            2 + 2 * ((y1 < y3)::INT + (y2 < y3)::INT)
              + (y1 = y3)::INT + (y2 = y3)::INT AS d3
        FROM spend
    ),
    moms AS (
        SELECT COUNT(*) AS n, SUM(d1) AS r1, SUM(d2) AS r2, SUM(d3) AS r3
        FROM dranks
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(r1 AS BIGINT) AS dbl_r1, CAST(r2 AS BIGINT) AS dbl_r2,
           CAST(r3 AS BIGINT) AS dbl_r3,
           ROUND(((r1 - 4.0 * n) * (r1 - 4.0 * n)
                  + (r2 - 4.0 * n) * (r2 - 4.0 * n)
                  + (r3 - 4.0 * n) * (r3 - 4.0 * n)) / (4.0 * n), 4)
               AS chi2_f
    FROM moms
    """,
)
def q_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X322: Friedman rank test — repeated measures within blocks.

    Each customer is a block; their three yearly spends rank 1..3
    WITHIN the block (tie-averaged midranks). The doubled midrank of
    y_j among k=3 values is the pure comparison expression
    2*(1 + #less) + #ties-excluding-self — computed by codegen, NO
    window, no sort. Friedman's chi2 = 12 Sum(R_j - n(k+1)/2)^2 /
    (n k (k+1)) becomes Sum(dblR_j - 4n)^2 / (4n) at k=3 with
    doubled ranks — exact integers until the single final division.
    Completes the paired-test family: X291 (2 binary), X321
    (k binary), this (k ordinal).

    100 TB: one customer-grain conditional aggregate + one 1-row
    moment aggregate.
    """
    o = table(spark, sf_dir, "orders")
    yr = F.year(F.col("o_orderdate").cast("date"))
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    spend = o.groupBy("o_custkey").agg(
        *[
            F.sum(F.when(yr == y, cents).otherwise(0)).alias(f"y{k+1}")
            for k, y in enumerate(_CQ_YEARS)
        ]
    )

    def drank(j: int) -> F.Column:
        others = [k for k in (1, 2, 3) if k != j]
        yj = F.col(f"y{j}")
        less = sum(
            (F.col(f"y{k}") < yj).cast("int") for k in others
        )
        ties = sum(
            (F.col(f"y{k}") == yj).cast("int") for k in others
        )
        return 2 + 2 * less + ties

    dranks = spend.select(
        drank(1).alias("d1"), drank(2).alias("d2"), drank(3).alias("d3")
    )
    moms = dranks.agg(
        F.count("*").alias("n"),
        F.sum("d1").alias("r1"),
        F.sum("d2").alias("r2"),
        F.sum("d3").alias("r3"),
    )
    n = F.col("n")

    def dev2(c: str) -> F.Column:
        d = F.col(c) - 4.0 * n
        return d * d

    return moms.select(
        n.cast("bigint").alias("n"),
        F.col("r1").cast("bigint").alias("dbl_r1"),
        F.col("r2").cast("bigint").alias("dbl_r2"),
        F.col("r3").cast("bigint").alias("dbl_r3"),
        F.round(
            (dev2("r1") + dev2("r2") + dev2("r3")) / (4.0 * n), 4
        ).alias("chi2_f"),
    )


# --- X323: exact 1D Wasserstein distance -------------------------------------


@register(
    "q_wasserstein_1d",
    oracle="""
    WITH vals AS (
        SELECT CASE WHEN c.c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END
                   AS grp,
               CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS v
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
    ),
    sizes AS (
        SELECT SUM(grp) AS na, SUM(1 - grp) AS nb FROM vals
    ),
    census AS (
        SELECT v, SUM(grp) AS ca, SUM(1 - grp) AS cb
        FROM vals GROUP BY v
    ),
    cum AS (
        SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn,
               SUM(ca) OVER (ORDER BY v) AS cuma,
               SUM(cb) OVER (ORDER BY v) AS cumb
        FROM census
    ),
    steps AS (
        SELECT p.v AS v_prev, q.v AS v_next,
               ABS(p.cuma * s.nb - p.cumb * s.na) * (q.v - p.v) AS area
        FROM cum p JOIN cum q ON q.rn = p.rn + 1 CROSS JOIN sizes s
    )
    SELECT CAST(s.na AS BIGINT) AS n_a, CAST(s.nb AS BIGINT) AS n_b,
           CAST(SUM(st.area) AS BIGINT) AS emd_scaled,
           ROUND(CAST(SUM(st.area) AS DOUBLE) / s.na / s.nb / 100.0, 4)
               AS emd_dollars
    FROM steps st CROSS JOIN sizes s
    GROUP BY s.na, s.nb
    """,
)
def q_wasserstein_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X323: exact 1D Wasserstein (earth-mover's) distance.

    The optimal-transport distance between the AUTOMOBILE and
    BUILDING order-value distributions — in 1D it's the area between
    ECDFs, and that area is an EXACT INTEGER once scaled by n_a*n_b:
    between consecutive distinct values the ECDF gap is constant at
    |cumA*n_b - cumB*n_a| / (n_a*n_b), so each step contributes
    integer |cross| * value-gap. Distribution distances that bin
    first (X197's PSI, X240's JSD) depend on the binning; EMD is the
    binning-free ground metric. Cumulatives ride the two-pass
    ordered_cumsum; consecutive values pair by X128's distributed
    lead (rank equi-join, no global window).

    100 TB: value census shuffle + two-pass cumulative + one
    rank-join — all on the distinct-value relation.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    vals = (
        o.join(
            F.broadcast(
                c.where(
                    F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING")
                ).select("c_custkey", "c_mktsegment")
            ),
            o.o_custkey == F.col("c_custkey"),
        )
        .select(
            (F.col("c_mktsegment") == "AUTOMOBILE").cast("bigint").alias("grp"),
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("v"),
        )
    )
    sizes = vals.agg(
        F.sum("grp").alias("na"), F.sum(1 - F.col("grp")).alias("nb")
    )
    census = vals.groupBy("v").agg(
        F.sum("grp").alias("ca"), F.sum(1 - F.col("grp")).alias("cb")
    )
    cum = ordered_cumsum(
        census,
        order_by=["v"],
        values={"ca": "cuma", "cb": "cumb"},
        row_number_col="rn",
    ).localCheckpoint(eager=True)
    p = cum.alias("p")
    q = cum.select(
        F.col("rn").alias("rn_next"), F.col("v").alias("v_next")
    ).alias("q")
    steps = (
        p.join(q, F.col("rn_next") == F.col("rn") + 1)
        .crossJoin(F.broadcast(sizes))
        .select(
            (
                F.abs(
                    F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na")
                )
                * (F.col("v_next") - F.col("v"))
            ).alias("area"),
            "na",
            "nb",
        )
    )
    return steps.groupBy("na", "nb").agg(
        F.sum("area").cast("bigint").alias("emd_scaled"),
        F.round(
            F.sum("area").cast("double") / F.col("na") / F.col("nb") / 100.0,
            4,
        ).alias("emd_dollars"),
    ).select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        "emd_scaled",
        "emd_dollars",
    )


# --- X324: Anderson-Darling uniformity audit ---------------------------------


@register(
    "q_anderson_darling",
    oracle="""
    WITH u AS (
        SELECT o_orderkey,
               (('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
                    ::BIGINT % 1000000 + 0.5) / 1000000.0 AS x
        FROM orders
    ),
    ranked AS (
        SELECT x, ROW_NUMBER() OVER (ORDER BY x, o_orderkey) AS i,
               COUNT(*) OVER () AS n
        FROM u
    ),
    terms AS (
        SELECT n,
               CAST(ROUND(1000000.0
                          * ((2 * i - 1) * LN(x)
                             + (2 * n + 1 - 2 * i) * LN(1 - x)) / n)
                    AS BIGINT) AS t_micro
        FROM ranked
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n,
           CAST(SUM(t_micro) AS BIGINT) AS term_sum_micro,
           ROUND(-CAST(MAX(n) AS DOUBLE) - SUM(t_micro) / 1000000.0
                 / MAX(n), 4) AS a2
    FROM terms
    """,
)
def q_anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X324: Anderson-Darling uniformity test of the engine's own
    hash-derived uniforms.

    X218's bootstrap, X297's DP noise, and the hash splits all trust
    that md5-derived uniforms are uniform; this audits that claim
    with the tail-weighted goodness-of-fit test (AD up-weights the
    tails KS barely sees): A^2 = -n - (1/n) Sum [(2i-1) ln u_(i) +
    (2(n-i)+1) ln(1 - u_(i))], the reindexed form that needs each
    point only at its own rank. Each point's term
    micro-rounds on the exact two-pass global rank; A^2 is one float
    expression over the integer term sum. (Critical value at 5% is
    ~2.49 — the committed artifact records the measured statistic.)

    100 TB: scan-local uniform derivation, two-pass rank
    (ordered_cumsum), one aggregate.
    """
    o = table(spark, sf_dir, "orders")
    u = o.select(
        "o_orderkey",
        (
            (
                F.conv(
                    F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15),
                    16,
                    10,
                ).cast("bigint")
                % 1000000
            )
            + 0.5
        ).alias("num"),
    ).select("o_orderkey", (F.col("num") / 1000000.0).alias("x"))
    ranked = ordered_cumsum(
        u, order_by=["x", "o_orderkey"], row_number_col="i"
    )
    n_row = u.agg(F.count("*").alias("n"))
    terms = ranked.crossJoin(F.broadcast(n_row)).select(
        "n",
        F.round(
            1000000.0
            * (
                (2 * F.col("i") - 1) * F.log("x")
                + (2 * F.col("n") + 1 - 2 * F.col("i"))
                * F.log(1 - F.col("x"))
            )
            / F.col("n")
        )
        .cast("bigint")
        .alias("t_micro"),
    )
    return terms.agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum("t_micro").cast("bigint").alias("term_sum_micro"),
        F.round(
            -F.max("n").cast("double")
            - F.sum("t_micro") / 1000000.0 / F.max("n"),
            4,
        ).alias("a2"),
    )
