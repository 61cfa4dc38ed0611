"""Round-5 widening queries, nineteenth batch (SURVEY.md §2.13, X295-X299).

Monotone calibration, privacy audits, seeded DP noise, clustering
quality, and multivariate outlier scoring:

- X295 isotonic (PAV) calibration: the minimax closed form of the
  pool-adjacent-violators fit over X154's reliability deciles — the
  monotone regression used to calibrate classifier scores.
- X296 l-diversity audit: X173's k-anonymity extended to the
  sensitive-attribute axis — a k-anonymous group is still unsafe if
  everyone in it shares the same sensitive value.
- X297 seeded DP-style noisy counts: Laplace(1/eps) noise derived
  deterministically from md5-hash uniforms (X218's bootstrap idiom),
  inverse-CDF in closed form — differentially-private release shapes
  with replayable noise.
- X298 simplified silhouette: per-label clustering quality over the
  embeddings table with exact integer centroid distances (the
  (n*x - S)^2 cross-multiplication clears the mean denominator).
- X299 ECOD-style multivariate outliers: per-dimension ECDF tail
  probabilities multiplied across (order count, spend) — the
  parameter-free outlier detector, exact via integer tail counts.

Reference parity note: engine extensions per SURVEY.md §2.13; the
reference's validators (LASERInputValidator.java:135-155) have no
statistical surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laser_hadoop_spark.operators.cumulative import (
    closed_form_ntile,
    ordered_cumsum,
)
from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# --- X295: isotonic (PAV) calibration ----------------------------------------

_CAL_BINS_SQL = """
    v AS (
        SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
               NTILE(10) OVER (ORDER BY CAST(FLOOR(value * 100 + 0.5)
                                             AS BIGINT), event_id) AS bin
        FROM events
    ),
    bins AS (
        SELECT bin, COUNT(*) AS n, SUM(label) AS pos
        FROM v GROUP BY bin
    ),
    cums AS (
        SELECT bin, n, pos,
               SUM(n) OVER (ORDER BY bin) AS cn,
               SUM(pos) OVER (ORDER BY bin) AS cpos
        FROM bins
    ),
    pairs AS (
        SELECT j.bin AS j, k.bin AS k,
               10000 * (k.cpos - (j.cpos - j.pos))
                   // (k.cn - (j.cn - j.n)) AS avg_bp
        FROM cums j JOIN cums k ON j.bin <= k.bin
    ),
    inner_min AS (
        SELECT i.bin AS i, p.j, MIN(p.avg_bp) AS min_bp
        FROM bins i JOIN pairs p ON p.j <= i.bin AND p.k >= i.bin
        GROUP BY 1, 2
    )
"""


@register(
    "q_isotonic_fit",
    oracle="WITH "
    + _CAL_BINS_SQL
    + """
    SELECT CAST(m.i AS INT) AS bin,
           CAST(b.n AS BIGINT) AS n,
           CAST(b.pos AS BIGINT) AS n_pos,
           CAST(10000 * b.pos // b.n AS BIGINT) AS raw_bp,
           CAST(MAX(m.min_bp) AS BIGINT) AS fit_bp
    FROM inner_min m JOIN bins b ON b.bin = m.i
    GROUP BY 1, 2, 3, 4
    ORDER BY 1
    """,
)
def q_isotonic_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X295: isotonic regression (PAV) via the minimax closed form.

    Over X154's score-decile reliability table, the isotonic fit at
    bin i is max_{j<=i} min_{k>=i} avg(pos)/avg(n) over the block
    [j..k] — the minimax characterization of pool-adjacent-violators,
    which needs no sequential pooling loop: with only 10 bins the
    (i,j,k) triple space is 220 rows of pure integer arithmetic
    (block rates in basis points via integer DIV on prefix-sum
    differences). The fact-scale work is X118's closed-form ntile
    (no single-partition window over events); everything after the
    10-row bin table is constant-size.

    100 TB: one two-pass global rank (ordered_cumsum) + one decile
    aggregate; the PAV itself runs on a calendar-of-10 relation.
    """
    e = table(spark, sf_dir, "events")
    v = e.select(
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("score"),
        (F.col("event_type") == "purchase").cast("bigint").alias("label"),
        "event_id",
    )
    ranked = ordered_cumsum(v, order_by=["score", "event_id"], row_number_col="rn")
    n_row = v.agg(F.count("*").alias("n"))
    bin_ = closed_form_ntile()
    # the 10-row bin table is referenced four times below (cums j/k,
    # the i probe, the final join) — checkpoint it eagerly so the
    # fact-scale rank+aggregate upstream runs ONCE, not per reference
    bins = (
        ranked.crossJoin(F.broadcast(n_row))
        .select("label", bin_.cast("int").alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("n"), F.sum("label").alias("pos"))
        .localCheckpoint(eager=True)
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cums = bins.select(
        "bin",
        "n",
        "pos",
        F.sum("n").over(w).alias("cn"),
        F.sum("pos").over(w).alias("cpos"),
    )
    j, k = cums.alias("j"), cums.alias("k")
    p_num = 10000 * (F.col("k.cpos") - (F.col("j.cpos") - F.col("j.pos")))
    p_den = F.col("k.cn") - (F.col("j.cn") - F.col("j.n"))
    pairs = j.join(F.broadcast(k), F.col("j.bin") <= F.col("k.bin")).select(
        F.col("j.bin").alias("j"),
        F.col("k.bin").alias("k"),
        ((p_num - p_num % p_den) / p_den).cast("bigint").alias("avg_bp"),
    )
    i = bins.alias("i")
    inner = (
        i.join(
            F.broadcast(pairs),
            (F.col("j") <= F.col("i.bin")) & (F.col("k") >= F.col("i.bin")),
        )
        .groupBy(F.col("i.bin").alias("i"), "j")
        .agg(F.min("avg_bp").alias("min_bp"))
    )
    raw = 10000 * F.col("pos")
    return (
        inner.groupBy("i")
        .agg(F.max("min_bp").cast("bigint").alias("fit_bp"))
        .join(bins, F.col("i") == F.col("bin"))
        .select(
            F.col("i").cast("int").alias("bin"),
            F.col("n").cast("bigint").alias("n"),
            F.col("pos").cast("bigint").alias("n_pos"),
            ((raw - raw % F.col("n")) / F.col("n")).cast("bigint").alias("raw_bp"),
            "fit_bp",
        )
        .orderBy("bin")
    )


# --- X296: l-diversity audit --------------------------------------------------

_LDIV_L = 4


@register(
    "q_l_diversity",
    oracle=f"""
    WITH g AS (
        SELECT c_nationkey AS nation, c_mktsegment AS segment,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT))
                    AS BIGINT) AS l
        FROM customer GROUP BY 1, 2
    )
    SELECT CAST(nation AS INT) AS nation, segment, n, l,
           CASE WHEN l < {_LDIV_L} THEN 1 ELSE 0 END AS fails
    FROM g
    ORDER BY l, n DESC, nation, segment
    """,
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X296: l-diversity audit — k-anonymity's sensitive-value axis.

    X173 counts quasi-identifier group sizes (k); this counts DISTINCT
    sensitive values per group (l): a group can be k-anonymous yet
    leak the sensitive attribute outright if all members share it
    (homogeneity attack). Quasi-identifiers (nation, segment),
    sensitive attribute = account-balance band (floor(bal/1000));
    every QI group reports its l with a fails flag at l < 4 (the
    group census stays non-empty at any scale). One exact
    distinct-aggregate.

    100 TB: a single groupBy on the QI key with a distinct-count —
    partial-aggregated, and the distinct runs on (QI, band) pairs
    whose cardinality is bounded by |QI| * |bands|, not by rows.
    """
    c = table(spark, sf_dir, "customer")
    g = c.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.count_distinct(
            F.floor(F.col("c_acctbal") / 1000.0).cast("bigint")
        )
        .cast("bigint")
        .alias("l"),
    )
    return (
        g.select(
            F.col("nation").cast("int").alias("nation"),
            "segment",
            "n",
            "l",
            F.when(F.col("l") < _LDIV_L, 1).otherwise(0).alias("fails"),
        )
        .orderBy("l", F.desc("n"), "nation", "segment")
    )


# --- X297: seeded DP-style noisy counts --------------------------------------


@register(
    "q_dp_noisy_counts",
    oracle="""
    WITH counts AS (
        SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n
        FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1
    ),
    seeded AS (
        SELECT n_name, n,
               CAST(('0x' || substring(md5(n_name), 1, 15)) AS BIGINT)
                   % 1000000 AS u_micro
        FROM counts
    ),
    noise AS (
        SELECT n_name, n, u_micro,
               CAST(ROUND(-1000000.0
                          * SIGN(2 * u_micro + 1 - 1000000)
                          * LN((1000000.0
                                - ABS(2 * u_micro + 1 - 1000000))
                               / 1000000.0)) AS BIGINT) AS noise_micro
        FROM seeded
    )
    SELECT n_name, noise_micro,
           CAST(n * 1000000 + noise_micro AS BIGINT) AS noisy_count_micro
    FROM noise ORDER BY n_name
    """,
)
def q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X297: seeded Laplace(1/eps) noisy counts, eps = 1.

    The differential-privacy release shape with REPLAYABLE noise: the
    uniform comes from the md5 hash of the group key (X218's
    deterministic-bootstrap idiom), and the Laplace draw is the
    closed-form inverse CDF -sign(u - 1/2) * ln(1 - 2|u - 1/2|),
    micro-rounded once — so the noisy count is an exact integer both
    engines agree on. (True DP needs nondeterministic noise; the
    seeded variant is the testable pipeline plumbing — swap the hash
    for a secure RNG at release time.)

    100 TB: one partial-aggregated count per group + a broadcast
    dimension join; noise is a scalar expression on the group relation.
    """
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    counts = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    u = (
        F.conv(F.substring(F.md5(F.col("n_name")), 1, 15), 16, 10).cast("bigint")
        % 1000000
    )
    seeded = counts.select("n_name", "n", u.alias("u_micro"))
    dev = 2 * F.col("u_micro") + 1 - 1000000
    noise = F.round(
        -1000000.0
        * F.signum(dev.cast("double"))
        * F.log((1000000.0 - F.abs(dev)) / 1000000.0)
    ).cast("bigint")
    return (
        seeded.select(
            "n_name",
            noise.alias("noise_micro"),
            (F.col("n") * 1000000 + noise).cast("bigint").alias(
                "noisy_count_micro"
            ),
        )
        .orderBy("n_name")
    )


# --- X298: simplified silhouette ---------------------------------------------


@register(
    "q_silhouette",
    oracle="""
    WITH e AS (
        SELECT vec_id, label,
               list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5)
                             AS BIGINT)) AS v
        FROM embeddings
    ),
    cells AS (
        SELECT vec_id, label,
               UNNEST(generate_series(1, len(v))) - 1 AS dim,
               UNNEST(v) AS x
        FROM e
    ),
    cent AS (
        SELECT label AS clabel, dim, SUM(x) AS s, COUNT(*) AS n
        FROM cells GROUP BY 1, 2
    ),
    d2 AS (
        SELECT c.vec_id, c.label, t.clabel, t.n,
               SUM((t.n * c.x - t.s) * (t.n * c.x - t.s)) AS dd
        FROM cells c JOIN cent t ON t.dim = c.dim
        GROUP BY 1, 2, 3, 4
    ),
    ab AS (
        SELECT vec_id, label,
               MIN(CASE WHEN clabel = label
                   THEN SQRT(CAST(dd AS DOUBLE)) / n END) AS a,
               MIN(CASE WHEN clabel <> label
                   THEN SQRT(CAST(dd AS DOUBLE)) / n END) AS b
        FROM d2 GROUP BY 1, 2
    ),
    sil AS (
        SELECT label,
               CASE WHEN GREATEST(a, b) > 0
                    THEN CAST(ROUND(10000 * (b - a) / GREATEST(a, b))
                              AS BIGINT)
                    ELSE 0 END AS sil_bp
        FROM ab
    )
    SELECT CAST(label AS INT) AS label, CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(sil_bp) // COUNT(*) AS BIGINT) AS avg_sil_bp
    FROM sil GROUP BY label ORDER BY label
    """,
)
def q_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X298: simplified silhouette score per embedding label.

    Clustering quality without the O(n^2) pairwise matrix: each
    point's cohesion a = distance to OWN label centroid, separation
    b = distance to the NEAREST other centroid, silhouette =
    (b-a)/max(a,b). Centroid distances are exact integers via the
    (n*x - S)^2 cross-multiplication (X280's trick, vectorized over
    dims on milli-quantized coordinates) — sqrt and one ratio are the
    only floats, micro-rounded per point, then averaged as an integer
    sum. The full-silhouette O(n^2) is replaced by O(n*K) centroid
    probes — the form that scales.

    100 TB: centroid sums shuffle (label, dim) cells — bounded by
    K * dims, broadcast back; per-point distance terms aggregate
    scan-locally partial on (vec_id, other-label).
    """
    emb = table(spark, sf_dir, "embeddings")
    fixed = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * 1000 + 0.5).cast("bigint"),
    )
    cells = emb.select(
        "vec_id", "label", F.posexplode(fixed).alias("dim", "x")
    )
    cent = cells.groupBy(
        F.col("label").alias("clabel"), F.col("dim").alias("cdim")
    ).agg(F.sum("x").alias("s"), F.count("*").alias("n"))
    term = F.col("n") * F.col("x") - F.col("s")
    d2 = (
        cells.join(F.broadcast(cent), F.col("cdim") == F.col("dim"))
        .groupBy("vec_id", "label", "clabel", "n")
        .agg(F.sum(term * term).alias("dd"))
    )
    dval = F.sqrt(F.col("dd").cast("double")) / F.col("n")
    ab = d2.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("clabel") == F.col("label"), dval)).alias("a"),
        F.min(F.when(F.col("clabel") != F.col("label"), dval)).alias("b"),
    )
    sil = ab.select(
        "label",
        F.when(
            F.greatest("a", "b") > 0,
            F.round(
                10000 * (F.col("b") - F.col("a")) / F.greatest("a", "b")
            ).cast("bigint"),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("sil_bp"),
    )
    tot = F.sum("sil_bp")
    return (
        sil.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_points"),
            ((tot - tot % F.count("*")) / F.count("*"))
            .cast("bigint")
            .alias("avg_sil_bp"),
        )
        .select(F.col("label").cast("int").alias("label"), "n_points", "avg_sil_bp")
        .orderBy("label")
    )


# --- X299: ECOD-style multivariate outliers ----------------------------------

_ECOD_TOP = 20


@register(
    "q_ecod_outliers",
    oracle=f"""
    WITH cust AS (
        SELECT o_custkey,
               CAST(COUNT(*) AS BIGINT) AS x,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS y
        FROM orders GROUP BY 1
    ),
    nn AS (SELECT COUNT(*) AS n FROM cust),
    cx AS (
        SELECT x AS vx, COUNT(*) AS cnt,
               SUM(COUNT(*)) OVER (ORDER BY x) AS cum
        FROM cust GROUP BY x
    ),
    cy AS (
        SELECT y AS vy, COUNT(*) AS cnt,
               SUM(COUNT(*)) OVER (ORDER BY y) AS cum
        FROM cust GROUP BY y
    ),
    scored AS (
        SELECT c.o_custkey,
               CAST(ROUND(1000000 * LN(CAST(n.n AS DOUBLE)
                    / LEAST(cx.cum, n.n - cx.cum + cx.cnt))) AS BIGINT)
                   AS tx_micro,
               CAST(ROUND(1000000 * LN(CAST(n.n AS DOUBLE)
                    / LEAST(cy.cum, n.n - cy.cum + cy.cnt))) AS BIGINT)
                   AS ty_micro
        FROM cust c
        JOIN cx ON cx.vx = c.x
        JOIN cy ON cy.vy = c.y
        CROSS JOIN nn n
    )
    SELECT o_custkey, tx_micro, ty_micro,
           CAST(tx_micro + ty_micro AS BIGINT) AS score_micro
    FROM scored
    ORDER BY score_micro DESC, o_custkey LIMIT {_ECOD_TOP}
    """,
)
def q_ecod_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X299: ECOD-style multivariate outlier scores (exact tail counts).

    The parameter-free outlier detector (Li et al., ECOD): per
    dimension, a point's tail probability is the SMALLER of its left
    and right empirical-CDF tails; the score sums -ln(tail) across
    dimensions — here (order count, lifetime spend) per customer.
    Tail probabilities are exact integer count ratios from per-value
    censuses (cum <= v and n - cum + cnt >= v), each dimension's
    -ln micro-rounds once, and the score is an integer sum — X75's
    3-sigma flags assume Gaussian tails, this assumes nothing.

    100 TB: per-dim value censuses are partial-aggregated and their
    running counts live on the distinct-value relation (two-pass
    ordered_cumsum, no single-partition fact window); scoring joins
    are on value keys with the censuses broadcast.
    """
    o = table(spark, sf_dir, "orders")
    # customer-grain aggregate is referenced three times (two censuses
    # + the scoring probe) — checkpoint so the fact shuffle runs once
    cust = (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").cast("bigint").alias("x"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
            .cast("bigint")
            .alias("y"),
        )
        .localCheckpoint(eager=True)
    )
    nn = cust.agg(F.count("*").alias("n"))

    def census(col: str, vname: str) -> DataFrame:
        per_v = cust.groupBy(F.col(col).alias(vname)).agg(
            F.count("*").alias("cnt")
        )
        return ordered_cumsum(per_v, order_by=[vname], values={"cnt": "cum"})

    cx = census("x", "vx")
    cy = census("y", "vy")

    def tail(cum: F.Column, cnt: F.Column) -> F.Column:
        return F.round(
            1000000
            * F.log(
                F.col("n").cast("double")
                / F.least(cum, F.col("n") - cum + cnt)
            )
        ).cast("bigint")

    scored = (
        cust.join(F.broadcast(cx), F.col("vx") == F.col("x"))
        .withColumnRenamed("cum", "cumx")
        .withColumnRenamed("cnt", "cntx")
        .join(F.broadcast(cy), F.col("vy") == F.col("y"))
        .withColumnRenamed("cum", "cumy")
        .withColumnRenamed("cnt", "cnty")
        .crossJoin(F.broadcast(nn))
        .select(
            "o_custkey",
            tail(F.col("cumx"), F.col("cntx")).alias("tx_micro"),
            tail(F.col("cumy"), F.col("cnty")).alias("ty_micro"),
        )
    )
    return (
        scored.select(
            "o_custkey",
            "tx_micro",
            "ty_micro",
            (F.col("tx_micro") + F.col("ty_micro"))
            .cast("bigint")
            .alias("score_micro"),
        )
        .orderBy(F.desc("score_micro"), "o_custkey")
        .limit(_ECOD_TOP)
    )
