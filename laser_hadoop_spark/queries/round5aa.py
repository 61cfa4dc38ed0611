"""Round-5 widening queries, twenty-seventh batch (SURVEY.md §2.13, X339-X343).

Pairwise-preference ranking, extreme-value fitting, robust location,
spatial center-finding, and importance-weight diagnostics:

- X339 Bradley-Terry ratings: brand strength from within-order
  pairwise quantity contests, two Hunter-MM iterations unrolled with
  per-term micro rounding — the batch analogue of Elo (which is
  order-dependent and therefore not distributable); the
  chatbot-arena / pairwise-eval ranking primitive.
- X340 Gumbel block-maxima fit: method-of-moments EV1 fit over
  weekly maxima of daily revenue (beta = sqrt(6) sd / pi, mu =
  mean - gamma beta) + the 20-week return level — the tail-risk
  summary ops teams quote; exact wide-decimal moments.
- X341 Huber robust location: two IRLS iterations unrolled, weights
  min(1, k/|r|) milli-rounded per point so the weighted means are
  exact integer ratios — the outlier-resistant mean between X183's
  winsorized mean and X96's MAD.
- X342 Weiszfeld geometric median: the 2D L1-center of the X278
  hash-synthesized customer coordinates, three iterations unrolled,
  per-point inverse distances nano-rounded before wide-decimal sums
  — facility-location / spatial-center primitive.
- X343 importance-weight ESS audit: effective sample size
  (sum w)^2 / sum w^2 of the uniform-over-sources reweighting at
  three clip levels — the diagnostic that says whether a reweighted
  corpus (X136/X155) actually carries its nominal sample count.

Reference parity note: engine extensions per SURVEY.md §2.13.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# --- X339: Bradley-Terry pairwise-preference ratings -------------------------


@register(
    "q_bradley_terry",
    oracle="""
    WITH oq AS (
        SELECT l.l_orderkey AS okey, p.p_brand AS brand,
               CAST(SUM(l.l_quantity) AS BIGINT) AS q
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2
    ),
    contests AS (
        SELECT a.brand AS i, b.brand AS j,
               CASE WHEN a.q > b.q THEN 1 ELSE 0 END AS win
        FROM oq a JOIN oq b ON b.okey = a.okey AND b.brand <> a.brand
        WHERE a.q <> b.q
    ),
    sym AS (
        SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n_ij,
               CAST(SUM(win) AS BIGINT) AS w_ij
        FROM contests GROUP BY i, j
    ),
    wins AS (SELECT i, SUM(w_ij) AS w FROM sym GROUP BY i),
    p0 AS (SELECT i, CAST(1000000 AS BIGINT) AS p FROM wins),
    d1 AS (
        SELECT s.i,
               SUM(CAST(ROUND(1000000.0
                              * (s.n_ij * 1000000.0 / (pi.p + pj.p)))
                        AS BIGINT)) AS d
        FROM sym s
        JOIN p0 pi ON pi.i = s.i
        JOIN p0 pj ON pj.i = s.j
        GROUP BY s.i
    ),
    p1 AS (
        SELECT w.i,
               CAST(ROUND(1000000000000.0 * w.w / d1.d) AS BIGINT) AS p
        FROM wins w JOIN d1 ON d1.i = w.i
    ),
    d2 AS (
        SELECT s.i,
               SUM(CAST(ROUND(1000000.0
                              * (s.n_ij * 1000000.0 / (pi.p + pj.p)))
                        AS BIGINT)) AS d
        FROM sym s
        JOIN p1 pi ON pi.i = s.i
        JOIN p1 pj ON pj.i = s.j
        GROUP BY s.i
    ),
    p2 AS (
        SELECT w.i,
               CAST(ROUND(1000000000000.0 * w.w / d2.d) AS BIGINT) AS p
        FROM wins w JOIN d2 ON d2.i = w.i
    ),
    tot AS (SELECT SUM(p) AS sp FROM p2)
    SELECT p2.i AS brand,
           CAST(w.w AS BIGINT) AS wins,
           CAST((SELECT SUM(n_ij) FROM sym s WHERE s.i = p2.i) AS BIGINT)
               AS contests,
           CAST(ROUND(1000000.0 * p2.p / t.sp) AS BIGINT) AS rating_micro
    FROM p2 JOIN wins w ON w.i = p2.i CROSS JOIN tot t
    ORDER BY brand
    """,
)
def q_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X339: Bradley-Terry ratings from within-order brand contests.

    Within each order, brand a "beats" brand b when it ships more
    units (ties are no-contests); the pairwise win/contest census
    feeds two unrolled Hunter (2004) MM iterations: p_i <- W_i /
    sum_j n_ij/(p_i + p_j). Each denominator term micro-rounds before
    the integer sum (X320's fixed-point iteration discipline), so the
    iteration is hash-reproducible; ratings are reported as
    share-of-total in micro. This is the order-independent batch
    analogue of Elo — the pairwise-preference ranking used by
    chatbot-arena-style eval — and converges to the same MLE.

    100 TB: contests are an in-order self-join of the (order, brand)
    aggregate (per-order fanout is bounded by brands-per-order); both
    MM iterations run on the <= |brands|^2 sym relation, broadcast.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    oq = (
        li.join(F.broadcast(p.select("p_partkey", "p_brand")),
                li.l_partkey == p.p_partkey)
        .groupBy(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .agg(F.sum("l_quantity").cast("bigint").alias("q"))
        .localCheckpoint(eager=True)
    )
    a, b = oq.alias("a"), oq.alias("b")
    contests = a.join(
        b,
        (F.col("b.okey") == F.col("a.okey"))
        & (F.col("b.brand") != F.col("a.brand")),
    ).where(F.col("a.q") != F.col("b.q")).select(
        F.col("a.brand").alias("i"),
        F.col("b.brand").alias("j"),
        F.when(F.col("a.q") > F.col("b.q"), 1).otherwise(0).alias("win"),
    )
    sym = (
        contests.groupBy("i", "j")
        .agg(
            F.count("*").cast("bigint").alias("n_ij"),
            F.sum("win").cast("bigint").alias("w_ij"),
        )
        .localCheckpoint(eager=True)
    )
    wins = sym.groupBy("i").agg(
        F.sum("w_ij").alias("w"), F.sum("n_ij").alias("contests")
    ).localCheckpoint(eager=True)

    def mm_iter(p_df: DataFrame) -> DataFrame:
        pi = p_df.select(F.col("i"), F.col("p").alias("p_i"))
        pj = p_df.select(F.col("i").alias("j"), F.col("p").alias("p_j"))
        d = (
            sym.join(F.broadcast(pi), "i")
            .join(F.broadcast(pj), "j")
            .select(
                "i",
                F.round(
                    F.lit(1000000.0)
                    * (F.col("n_ij") * F.lit(1000000.0)
                       / (F.col("p_i") + F.col("p_j")))
                )
                .cast("bigint")
                .alias("t"),
            )
            .groupBy("i")
            .agg(F.sum("t").alias("d"))
        )
        return wins.join(d, "i").select(
            "i",
            F.round(F.lit(1000000000000.0) * F.col("w") / F.col("d"))
            .cast("bigint")
            .alias("p"),
        ).localCheckpoint(eager=True)

    p0 = wins.select("i", F.lit(1000000).cast("bigint").alias("p"))
    p2 = mm_iter(mm_iter(p0))
    tot = p2.agg(F.sum("p").alias("sp"))
    return (
        p2.join(wins, "i")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("i").alias("brand"),
            F.col("w").cast("bigint").alias("wins"),
            F.col("contests").cast("bigint").alias("contests"),
            F.round(F.lit(1000000.0) * F.col("p") / F.col("sp"))
            .cast("bigint")
            .alias("rating_micro"),
        )
        .orderBy("brand")
    )


# --- X340: Gumbel block-maxima fit -------------------------------------------


import math as _math

# ln(-ln(1 - 1/20)) as ONE shared literal: both engines consume the
# same double, so libm differences in LN can never flip the hash.
_R20 = _math.log(-_math.log(1.0 - 1.0 / 20))


@register(
    "q_gumbel_fit",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY 1
    ),
    blocks AS (
        SELECT date_trunc('week', d) AS wk, MAX(rev) AS m
        FROM daily GROUP BY 1
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(m) AS s1, SUM(m * m) AS s2
        FROM blocks
    ),
    fit AS (
        SELECT n,
               CAST(ROUND(1000000.0 * SQRT(6.0 * CAST(n * s2 - s1 * s1
                                                      AS DOUBLE))
                          / (PI() * n)) AS BIGINT) AS beta_micro,
               CAST(s1 AS BIGINT) AS s1b
        FROM s
    )
    SELECT n, beta_micro,
           CAST(ROUND(1000000.0 * s1b / n
                      - 0.5772156649015329 * beta_micro) AS BIGINT)
               AS mu_micro,
           CAST(ROUND(1000000.0 * s1b / n
                      - 0.5772156649015329 * beta_micro
                      - {_R20!r} * beta_micro) AS BIGINT)
               AS return20_micro
    FROM fit
    """,
)
def q_gumbel_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X340: Gumbel (EV1) fit of weekly revenue maxima + return level.

    Block maxima (weekly max of daily revenue cents) fitted by the
    method of moments: beta = sqrt(6) sd / pi, mu = mean - gamma beta
    (Euler-Mascheroni), plus the 20-week return level mu - beta
    ln(-ln(1 - 1/20)) — the "worst week we should expect per ~5
    months" number capacity planning quotes. Moment sums ride exact
    (HUGEINT / wide-decimal — rev^2 sums overflow int64 at sf0.1);
    beta is one float expression micro-rounded FIRST, so mu and the
    return level are float expressions of already-exact integers.

    100 TB: daily aggregate, weekly max, 1-row moments — the whole
    fit is three partial-aggregate shuffles, no windows.
    """
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev")
    )
    blocks = daily.groupBy(F.date_trunc("week", "d").alias("wk")).agg(
        F.max("rev").alias("m")
    )
    dec = "decimal(38,0)"
    s = blocks.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("m").cast(dec)).alias("s1"),
        F.sum(F.col("m").cast(dec) * F.col("m")).alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    fit = s.select(
        "n",
        F.round(
            F.lit(1000000.0)
            * F.sqrt(F.lit(6.0) * (n * s2 - s1 * s1).cast("double"))
            / (F.lit(3.141592653589793) * n)
        )
        .cast("bigint")
        .alias("beta_micro"),
        s1.cast("bigint").alias("s1b"),
    )
    gamma = F.lit(0.5772156649015329)
    r20 = F.lit(_R20)
    mean_micro = F.lit(1000000.0) * F.col("s1b") / F.col("n")
    return fit.select(
        "n",
        "beta_micro",
        F.round(mean_micro - gamma * F.col("beta_micro"))
        .cast("bigint")
        .alias("mu_micro"),
        F.round(
            mean_micro - gamma * F.col("beta_micro") - r20 * F.col("beta_micro")
        )
        .cast("bigint")
        .alias("return20_micro"),
    )


# --- X341: Huber robust location ---------------------------------------------


@register(
    "q_huber_location",
    oracle="""
    WITH pts AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) * 1000000 AS x
        FROM orders
    ),
    s0 AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS s1,
               SUM(x // 1000000) AS sc1,
               SUM((x // 1000000) * (x // 1000000)) AS s2c
        FROM pts
    ),
    init AS (
        SELECT n,
               CAST(ROUND(CAST(s1 AS DOUBLE) / n) AS BIGINT) AS m0,
               CAST(ROUND(1345000.0 * SQRT(CAST(n * s2c - sc1 * sc1
                                                AS DOUBLE))
                          / n) AS BIGINT) AS k
        FROM s0
    ),
    it1 AS (
        SELECT i.n, i.k,
               CAST(ROUND(1000000.0 * CAST(SUM(w * (x // 1000000)) AS DOUBLE)
                          / SUM(w)) AS BIGINT) AS m1
        FROM (SELECT p.x,
                     CAST(ROUND(1000.0 * LEAST(1.0,
                          CAST(i.k AS DOUBLE) / ABS(p.x - i.m0))) AS BIGINT)
                         AS w
              FROM pts p CROSS JOIN init i) t
        CROSS JOIN init i
        GROUP BY i.n, i.k
    ),
    it2 AS (
        SELECT i1.n,
               CAST(ROUND(1000000.0 * CAST(SUM(w * (x // 1000000)) AS DOUBLE)
                          / SUM(w)) AS BIGINT) AS m2,
               CAST(SUM(CASE WHEN w < 1000 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_down
        FROM (SELECT p.x,
                     CAST(ROUND(1000.0 * LEAST(1.0,
                          CAST(i1.k AS DOUBLE) / ABS(p.x - i1.m1)))
                          AS BIGINT) AS w
              FROM pts p CROSS JOIN it1 i1) t
        CROSS JOIN it1 i1
        GROUP BY i1.n
    )
    SELECT i.n,
           CAST(ROUND(CAST((SELECT s1 FROM s0) AS DOUBLE)
                      / i.n) AS BIGINT) AS mean_micro,
           i1.m1 AS m1_micro, i2.m2 AS m2_micro, i2.n_down
    FROM init i CROSS JOIN it1 i1 CROSS JOIN it2 i2
    """,
)
def q_huber_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X341: Huber M-estimator of location, two IRLS rounds unrolled.

    The outlier-resistant mean between X183's winsorized mean (hard
    clip) and X96's MAD (pure rank): start at the mean, set the Huber
    k = 1.345 sigma (the 95%-efficiency tuning constant), then twice
    reweight w = min(1, k/|x - m|) and take the weighted mean. Each
    weight milli-rounds FIRST (integer w in 0..1000), so both
    weighted means are exact integer-sum ratios with one float
    division — the IRLS iteration is hash-reproducible (X320/X339
    discipline). n_down reports how many orders the final round
    downweights: the outlier budget.

    100 TB: three scans of the cents relation (moments, round 1,
    round 2), each a partial-aggregate; the 1-row center broadcasts.
    """
    o = table(spark, sf_dir, "orders")
    pts = o.select(
        (F.round(F.col("o_totalprice") * 100).cast("bigint") * 1000000).alias(
            "x"
        )
    )
    dec = "decimal(38,0)"
    s0 = pts.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("x").cast(dec)).alias("s1"),
        F.sum(F.expr("x div 1000000").cast(dec)).alias("sc1"),
        F.sum(
            F.expr("x div 1000000").cast(dec) * F.expr("x div 1000000")
        ).alias("s2c"),
    )
    n, s1 = F.col("n"), F.col("s1")
    init = F.broadcast(
        s0.select(
            "n",
            "s1",
            F.round(s1.cast("double") / n).cast("bigint").alias("m0"),
            F.round(
                F.lit(1345000.0)
                * F.sqrt(
                    (
                        n * F.col("s2c") - F.col("sc1") * F.col("sc1")
                    ).cast("double")
                )
                / n
            )
            .cast("bigint")
            .alias("k"),
        )
    )

    def irls(prev: DataFrame, m_col: str):
        w = F.round(
            F.lit(1000.0)
            * F.least(
                F.lit(1.0),
                F.col("k").cast("double") / F.abs(F.col("x") - F.col(m_col)),
            )
        ).cast("bigint")
        return (
            pts.crossJoin(prev)
            .select(
                "n",
                "k",
                "s1",
                F.expr("x div 1000000").alias("xc"),
                w.alias("w"),
            )
            .groupBy("n", "k", "s1")
            .agg(
                F.round(
                    F.lit(1000000.0)
                    * F.sum(F.col("w").cast(dec) * F.col("xc")).cast("double")
                    / F.sum("w")
                )
                .cast("bigint")
                .alias("m_new"),
                F.sum(F.when(F.col("w") < 1000, 1).otherwise(0))
                .cast("bigint")
                .alias("n_down"),
            )
        )

    it1 = F.broadcast(
        irls(init, "m0").select(
            "n", "k", "s1", F.col("m_new").alias("m1")
        ).localCheckpoint(eager=True)
    )
    it2 = irls(it1, "m1").select(
        "n",
        "s1",
        F.col("m_new").alias("m2"),
        "n_down",
    )
    return it2.join(it1.select("n", "m1"), "n").select(
        "n",
        F.round(F.col("s1").cast("double") / F.col("n"))
        .cast("bigint")
        .alias("mean_micro"),
        F.col("m1").alias("m1_micro"),
        F.col("m2").alias("m2_micro"),
        "n_down",
    )


# --- X342: Weiszfeld geometric median ----------------------------------------

_GM_HASH_LAT = "(('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 6))::BIGINT % 120 - 60)"
_GM_HASH_LON = "(('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 9, 6))::BIGINT % 360 - 180)"

_GM_ITER_SQL = """
    it{K} AS (
        SELECT CAST(ROUND(CAST(SUM(w * xm) AS DOUBLE) / SUM(w)) AS BIGINT)
                   AS mx,
               CAST(ROUND(CAST(SUM(w * ym) AS DOUBLE) / SUM(w)) AS BIGINT)
                   AS my
        FROM (SELECT p.xm, p.ym,
                     CAST(ROUND(1000000000.0
                          / GREATEST(SQRT(CAST((p.xm - i.mx) * (p.xm - i.mx)
                                + (p.ym - i.my) * (p.ym - i.my) AS DOUBLE)),
                                     1.0)) AS BIGINT) AS w
              FROM pts p CROSS JOIN it{P} i) t
    )"""


@register(
    "q_geometric_median",
    oracle=f"""
    WITH pts AS (
        SELECT {_GM_HASH_LAT} * 1000000 AS xm,
               {_GM_HASH_LON} * 1000000 AS ym
        FROM customer
    ),
    it0 AS (
        SELECT CAST(ROUND(CAST(SUM(xm) AS DOUBLE) / COUNT(*)) AS BIGINT)
                   AS mx,
               CAST(ROUND(CAST(SUM(ym) AS DOUBLE) / COUNT(*)) AS BIGINT)
                   AS my
        FROM pts
    ),
    {_GM_ITER_SQL.format(K=1, P=0)},
    {_GM_ITER_SQL.format(K=2, P=1)},
    {_GM_ITER_SQL.format(K=3, P=2)},
    audit AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(
                   SQRT(CAST((p.xm - i.mx) * (p.xm - i.mx)
                             + (p.ym - i.my) * (p.ym - i.my) AS DOUBLE))
                   ) AS BIGINT)) AS BIGINT) AS total_dist_micro
        FROM pts p CROSS JOIN it3 i
    )
    SELECT a.n, i.mx AS gm_lat_micro, i.my AS gm_lon_micro,
           a.total_dist_micro
    FROM it3 i CROSS JOIN audit a
    """,
)
def q_geometric_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X342: 2D geometric median by three unrolled Weiszfeld rounds.

    The L1 spatial center (facility-location optimum) of the X278
    hash-synthesized customer coordinates: start at the centroid,
    then three rounds of m <- sum(x/d) / sum(1/d). Per-point inverse
    distances nano-round FIRST (with a 1-micro-degree floor so a
    point sitting ON the center can't blow up the weight — the
    standard Weiszfeld guard), making every round two exact
    wide-integer ratios — the X320/X339/X341 fixed-point iteration
    discipline applied to a genuinely 2D iteration. The audit column
    is the total distance at the final center: the quantity Weiszfeld
    is provably non-increasing on.

    100 TB: each round is one scan + 1-row aggregate with the center
    broadcast; nothing ever shuffles the point set.
    """
    c = table(spark, sf_dir, "customer")
    lat = (
        F.conv(F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 6), 16, 10)
        .cast("bigint")
        % 120
        - 60
    )
    lon = (
        F.conv(F.substring(F.md5(F.col("c_custkey").cast("string")), 9, 6), 16, 10)
        .cast("bigint")
        % 360
        - 180
    )
    pts = c.select(
        (lat * 1000000).alias("xm"), (lon * 1000000).alias("ym")
    ).localCheckpoint(eager=True)
    dec = "decimal(38,0)"
    it = F.broadcast(
        pts.agg(
            F.round(F.sum(F.col("xm").cast(dec)).cast("double") / F.count("*"))
            .cast("bigint")
            .alias("mx"),
            F.round(F.sum(F.col("ym").cast(dec)).cast("double") / F.count("*"))
            .cast("bigint")
            .alias("my"),
        )
    )
    for _ in range(3):
        d = F.sqrt(
            (
                (F.col("xm") - F.col("mx")) * (F.col("xm") - F.col("mx"))
                + (F.col("ym") - F.col("my")) * (F.col("ym") - F.col("my"))
            ).cast("double")
        )
        w = F.round(F.lit(1000000000.0) / F.greatest(d, F.lit(1.0))).cast(
            "bigint"
        )
        it = F.broadcast(
            pts.crossJoin(it)
            .select("xm", "ym", w.alias("w"))
            .agg(
                F.round(
                    F.sum(F.col("w").cast(dec) * F.col("xm")).cast("double")
                    / F.sum("w")
                )
                .cast("bigint")
                .alias("mx"),
                F.round(
                    F.sum(F.col("w").cast(dec) * F.col("ym")).cast("double")
                    / F.sum("w")
                )
                .cast("bigint")
                .alias("my"),
            )
            .localCheckpoint(eager=True)
        )
    d3 = F.sqrt(
        (
            (F.col("xm") - F.col("mx")) * (F.col("xm") - F.col("mx"))
            + (F.col("ym") - F.col("my")) * (F.col("ym") - F.col("my"))
        ).cast("double")
    )
    audit = pts.crossJoin(it).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.round(d3).cast("bigint")).cast("bigint").alias(
            "total_dist_micro"
        ),
    )
    return audit.crossJoin(it).select(
        "n",
        F.col("mx").alias("gm_lat_micro"),
        F.col("my").alias("gm_lon_micro"),
        "total_dist_micro",
    )


# --- X343: importance-weight ESS audit ---------------------------------------


@register(
    "q_ess_weights",
    oracle="""
    WITH per_src AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s
        FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS big_n,
                   CAST(COUNT(*) AS BIGINT) AS k FROM per_src),
    weights AS (
        SELECT p.source, p.n_s,
               CAST(ROUND(1000000.0 * t.big_n / (t.k * p.n_s)) AS BIGINT)
                   AS w_micro
        FROM per_src p CROSS JOIN tot t
    ),
    caps(clip_label, cap) AS (VALUES ('none', 9223372036854775807),
                                     ('2x', 2000000), ('5x', 5000000)),
    clipped AS (
        SELECT c.clip_label,
               SUM(w.n_s * LEAST(w.w_micro, c.cap)) AS sw,
               SUM(w.n_s * LEAST(w.w_micro, c.cap)
                   * LEAST(w.w_micro, c.cap)) AS sw2,
               CAST(SUM(CASE WHEN w.w_micro > c.cap THEN w.n_s
                             ELSE 0 END) AS BIGINT) AS n_clipped,
               MAX(t.big_n) AS big_n
        FROM weights w CROSS JOIN caps c CROSS JOIN tot t
        GROUP BY c.clip_label
    )
    SELECT clip_label,
           CAST(ROUND(1000.0 * CAST(sw AS DOUBLE) * sw / sw2) AS BIGINT)
               AS ess_milli,
           CAST(ROUND(10000.0 * n_clipped / big_n) AS BIGINT)
               AS clipped_bp
    FROM clipped ORDER BY clip_label
    """,
)
def q_ess_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X343: effective sample size of importance weights, 3 clip levels.

    Reweighting the corpus to uniform-over-sources gives every doc of
    source s the weight N/(k n_s); ESS = (sum w)^2 / sum w^2 says how
    many samples the weighted corpus is WORTH (Kish). Clipping at 2x
    and 5x trades bias for ESS — the exact tradeoff table a curator
    reads before applying X136's mixture reweight or X155's DSIR
    weights. Per-source weights micro-round once; all ESS sums are
    then exact integers expanded by the per-source counts (never a
    per-doc relation), with one float division per row.

    100 TB: one |sources|-row aggregate; the clip grid is a 3-row
    broadcast — the whole audit never touches per-doc data again.
    """
    d = table(spark, sf_dir, "documents")
    # feeds both the total and the weight branch — checkpoint so the
    # corpus scans once
    per_src = (
        d.groupBy("source")
        .agg(F.count("*").cast("bigint").alias("n_s"))
        .localCheckpoint(eager=True)
    )
    tot = per_src.agg(
        F.sum("n_s").cast("bigint").alias("big_n"),
        F.count("*").cast("bigint").alias("k"),
    )
    weights = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_s",
        "big_n",
        F.round(
            F.lit(1000000.0) * F.col("big_n") / (F.col("k") * F.col("n_s"))
        )
        .cast("bigint")
        .alias("w_micro"),
    )
    caps = spark.createDataFrame(
        [("none", 9223372036854775807), ("2x", 2000000), ("5x", 5000000)],
        "clip_label string, cap long",
    )
    wc = F.least(F.col("w_micro"), F.col("cap"))
    clipped = (
        weights.crossJoin(F.broadcast(caps))
        .groupBy("clip_label")
        .agg(
            F.sum((F.col("n_s") * wc).cast("decimal(38,0)")).alias("sw"),
            F.sum(F.col("n_s").cast("decimal(38,0)") * wc * wc).alias("sw2"),
            F.sum(
                F.when(F.col("w_micro") > F.col("cap"), F.col("n_s")).otherwise(
                    0
                )
            )
            .cast("bigint")
            .alias("n_clipped"),
            F.max("big_n").alias("big_n"),
        )
    )
    return clipped.select(
        "clip_label",
        F.round(
            F.lit(1000.0) * F.col("sw").cast("double") * F.col("sw") / F.col("sw2")
        )
        .cast("bigint")
        .alias("ess_milli"),
        F.round(F.lit(10000.0) * F.col("n_clipped") / F.col("big_n"))
        .cast("bigint")
        .alias("clipped_bp"),
    ).orderBy("clip_label")
