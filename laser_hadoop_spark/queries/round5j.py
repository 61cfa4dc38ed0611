"""Round-5 widening queries, tenth batch (SURVEY.md §2.13, X248-X252).

Graph spectra, ordered-dose inference, experiment hygiene, and
randomness testing:

- X248 HITS hubs/authorities: two exactly-verified mutual-
  reinforcement iterations over the customer->part purchase graph,
  integer-normalized after every step (X50's exactly-verified-
  iteration discipline on the other eigenvector algorithm).
- X249 local clustering-coefficient census: per-node triangle
  closure over the deterministic supplier graph, reported as a
  per-degree census — the community-structure profile next to X66's
  global triangle count and X117's degree distribution.
- X250 Cochran-Armitage trend test: ordered-dose association (does
  the high-value share rise monotonically with order priority?) as
  exact cross-multiplied integers through DECIMAL(38).
- X251 covariate-balance SMD table: standardized mean difference per
  covariate between md5 arms — the randomization-health check run
  BEFORE X77/X182/X235 read any effect.
- X252 Wald-Wolfowitz runs test: randomness of daily revenue's
  above/below-median sign sequence — regime clustering shows up as
  too few runs; exact counts with closed-form moments in micro.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# --- X248: HITS hubs/authorities --------------------------------------------

_HITS_TOPK = 10


@register(
    "q_hits_scores",
    oracle=f"""
    WITH edges AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    a1 AS (SELECT p, COUNT(*) AS s FROM edges GROUP BY p),
    a1n AS (
        SELECT p, 10000 * s // (SELECT MAX(s) FROM a1) AS sn FROM a1
    ),
    h1 AS (
        SELECT e.c, SUM(a.sn) AS s FROM edges e JOIN a1n a ON a.p = e.p
        GROUP BY e.c
    ),
    h1n AS (
        SELECT c, 10000 * s // (SELECT MAX(s) FROM h1) AS sn FROM h1
    ),
    a2 AS (
        SELECT e.p, SUM(h.sn) AS s FROM edges e JOIN h1n h ON h.c = e.c
        GROUP BY e.p
    ),
    a2n AS (
        SELECT p, 10000 * s // (SELECT MAX(s) FROM a2) AS sn FROM a2
    ),
    h2 AS (
        SELECT e.c, SUM(a.sn) AS s FROM edges e JOIN a2n a ON a.p = e.p
        GROUP BY e.c
    ),
    h2n AS (
        SELECT c, 10000 * s // (SELECT MAX(s) FROM h2) AS sn FROM h2
    ),
    ranked AS (
        SELECT 'authority' AS role, p AS node, sn,
               ROW_NUMBER() OVER (ORDER BY sn DESC, p) AS rk
        FROM a2n
        UNION ALL
        SELECT 'hub', c, sn, ROW_NUMBER() OVER (ORDER BY sn DESC, c)
        FROM h2n
    )
    SELECT role, CAST(node AS BIGINT) AS node, CAST(sn AS BIGINT) AS score_bp,
           CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= {_HITS_TOPK}
    """,
)
def q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X248: HITS hubs/authorities, two exactly-verified iterations.

    Mutual reinforcement over the bipartite customer->part purchase
    graph: a part is authoritative when bought by good hubs, a
    customer is a good hub when buying authoritative parts. Each
    half-step is one edge equi-join + aggregate; after every step the
    scores renormalize to basis points of the maximum (integer DIV of
    a 1-row broadcast max) — the float L2 normalization of textbook
    HITS replaced by an exact max-normalization that preserves the
    ranking and keeps every intermediate a bigint, so the classically
    float-only eigenvector iteration is hash-verifiable (X50's
    PageRank discipline, transposed).

    100 TB shape: the edge list reuses the order-line shuffle; each
    iteration is two key-partitioned aggregates + a broadcast scalar;
    top-k via rank windows over the already-aggregated node relations
    (two-level salted top-k when nodes outgrow one partition, X157).
    """
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def norm(df: DataFrame, key: str) -> DataFrame:
        # materialize each normalized score relation: every step is
        # referenced twice downstream (as the max source and the join
        # side), and without truncation the plan re-derives the whole
        # iteration chain per reference (measured 86 exchanges vs 2
        # per step with the checkpoint — X50's iteration discipline)
        mx = df.agg(F.max("s").alias("mx"))
        return (
            df.crossJoin(F.broadcast(mx))
            .select(key, F.expr("10000 * s DIV mx").alias("sn"))
            .localCheckpoint(eager=True)
        )

    a1 = edges.groupBy("p").agg(F.count("*").alias("s"))
    a1n = norm(a1, "p")
    h1 = (
        edges.join(a1n, "p").groupBy("c").agg(F.sum("sn").alias("s"))
    )
    h1n = norm(h1, "c")
    a2 = (
        edges.join(h1n, "c").groupBy("p").agg(F.sum("sn").alias("s"))
    )
    a2n = norm(a2, "p")
    h2 = (
        edges.join(a2n, "p").groupBy("c").agg(F.sum("sn").alias("s"))
    )
    h2n = norm(h2, "c")
    auth = a2n.select(
        F.lit("authority").alias("role"),
        F.col("p").alias("node"),
        "sn",
        F.row_number()
        .over(Window.orderBy(F.desc("sn"), "p"))
        .alias("rk"),
    )
    hub = h2n.select(
        F.lit("hub").alias("role"),
        F.col("c").alias("node"),
        "sn",
        F.row_number()
        .over(Window.orderBy(F.desc("sn"), "c"))
        .alias("rk"),
    )
    return (
        auth.unionAll(hub)
        .where(F.col("rk") <= _HITS_TOPK)
        .select(
            "role",
            F.col("node").cast("bigint").alias("node"),
            F.col("sn").cast("bigint").alias("score_bp"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


# --- X249: local clustering-coefficient census ------------------------------

_CC_EDGE_SQL = """
    WITH s AS (SELECT s_suppkey AS node FROM supplier),
    cnt AS (SELECT COUNT(*) AS n FROM s),
    raw AS (
        SELECT node AS src, (node * 7 + 3) % n AS dst FROM s CROSS JOIN cnt
        UNION ALL
        SELECT node, (node * 13 + 5) % n FROM s CROSS JOIN cnt
    ),
    e AS (
        SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM raw WHERE src <> dst
    )
"""


@register(
    "q_clustering_coefficient",
    oracle=_CC_EDGE_SQL
    + """
    , und AS (
        SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e
    ),
    deg AS (SELECT u, COUNT(*) AS d FROM und GROUP BY u),
    tri AS (
        SELECT x.a, x.b, y.b AS c
        FROM e x JOIN e y ON y.a = x.b
        JOIN e z ON z.a = x.a AND z.b = y.b
    ),
    tnodes AS (
        SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    ),
    tcnt AS (SELECT node, COUNT(*) AS t FROM tnodes GROUP BY node),
    percc AS (
        SELECT d.u, d.d, COALESCE(t.t, 0) AS t,
               CASE WHEN d.d >= 2
                    THEN 2000000 * COALESCE(t.t, 0) // (d.d * (d.d - 1))
                    ELSE 0 END AS cc_micro
        FROM deg d LEFT JOIN tcnt t ON t.node = d.u
    )
    SELECT CAST(d AS BIGINT) AS degree, CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(t) AS BIGINT) AS n_triangle_slots,
           CAST(SUM(cc_micro) // COUNT(*) AS BIGINT) AS avg_cc_micro
    FROM percc GROUP BY d
    """,
)
def q_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X249: local clustering coefficient, per-degree census.

    Per node of the deterministic supplier graph (same edge rule as
    X50/X66): cc(v) = 2*tri(v) / (deg(v)*(deg(v)-1)) in exact micro
    (the only division is one truncating DIV per node). Triangles per
    node come from the X66 ordered-triple enumeration exploded to its
    three corners. Reported as a per-degree census — the
    degree-vs-clustering profile that distinguishes hub-and-spoke
    from community structure, bounded output at any graph size.

    100 TB shape: edges materialize once (localCheckpoint, X66's
    measured fix); triangle enumeration is the two-equi-join ordered
    form; everything else aggregates on node keys. The census output
    is |distinct degrees| rows regardless of node count.
    """
    from laser_hadoop_spark.tables import register_views

    register_views(spark, sf_dir, names=("supplier",))
    e = spark.sql(
        _CC_EDGE_SQL + " SELECT a, b FROM e"
    ).localCheckpoint(eager=True)
    e.createOrReplaceTempView("cc_edges")
    und = e.selectExpr("a AS u", "b AS v").unionAll(
        e.selectExpr("b AS u", "a AS v")
    )
    deg = und.groupBy("u").agg(F.count("*").alias("d"))
    x = e.alias("x")
    y = e.alias("y")
    z = e.alias("z")
    tri = (
        x.join(y, F.col("y.a") == F.col("x.b"))
        .join(
            z,
            (F.col("z.a") == F.col("x.a")) & (F.col("z.b") == F.col("y.b")),
        )
        .select(
            F.col("x.a").alias("a"),
            F.col("x.b").alias("b"),
            F.col("y.b").alias("c"),
        )
    )
    tnodes = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    tcnt = tnodes.groupBy("node").agg(F.count("*").alias("t"))
    percc = deg.join(tcnt, deg.u == tcnt.node, "left").select(
        "d",
        F.coalesce(F.col("t"), F.lit(0)).alias("t"),
        F.when(
            F.col("d") >= 2,
            F.expr(
                "2000000 * COALESCE(t, 0) DIV (d * (d - 1))"
            ),
        )
        .otherwise(0)
        .alias("cc_micro"),
    )
    return percc.groupBy(F.col("d").cast("bigint").alias("degree")).agg(
        F.count("*").cast("bigint").alias("n_nodes"),
        F.sum("t").cast("bigint").alias("n_triangle_slots"),
        F.expr("CAST(SUM(cc_micro) DIV COUNT(*) AS BIGINT)").alias(
            "avg_cc_micro"
        ),
    )


# --- X250: Cochran-Armitage trend test --------------------------------------

_CA_HIGH = 15_000_000  # high-value order threshold, centi


@register(
    "q_cochran_armitage",
    oracle=f"""
    WITH base AS (
        SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS w,
               CASE WHEN CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                         > {_CA_HIGH} THEN 1 ELSE 0 END AS hi
        FROM orders
    ),
    dose AS (
        SELECT w, COUNT(*) AS ni, SUM(hi) AS ai FROM base GROUP BY w
    ),
    tot AS (
        SELECT SUM(ni) AS n, SUM(ai) AS a,
               SUM(w * ai) AS swa, SUM(w * ni) AS swn,
               SUM(w * w * ni) AS swwn
        FROM dose
    )
    SELECT CAST(n AS BIGINT) AS n, CAST(a AS BIGINT) AS n_high,
           CAST(n * swa - a * swn AS BIGINT) AS t_num,
           CAST(CAST(1000000 AS HUGEINT) * (n - 1)
                * CAST(n * swa - a * swn AS HUGEINT)
                * CAST(n * swa - a * swn AS HUGEINT)
                // (CAST(a AS HUGEINT) * (n - a)
                    * (n * swwn - swn * swn)) AS BIGINT) AS z2_micro
    FROM tot
    """,
)
def q_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X250: Cochran-Armitage trend test, exactly verified.

    Does the high-value share rise monotonically with order priority?
    Dose = the priority's leading digit (1-URGENT .. 5-LOW), response
    = order value > $150k. The trend statistic keeps everything
    integral: t_num = N*sum(w*a) - A*sum(w*n) (the N-scaled score
    covariance) and z2_micro = 1e6 * (N-1) * t_num^2 /
    (A*(N-A)*(N*sum(w^2 n) - sum(w n)^2)) — the squared trend z,
    computed through DECIMAL(38)/HUGEINT so the only rounding is the
    final truncating DIV. The ordered-alternative member of the
    X109 chi-squared family: chi2 spends power on ANY deviation, CA
    only on monotone trend.

    100 TB shape: one conditional-aggregate scan to |doses| rows; all
    statistic arithmetic on one row.
    """
    o = table(spark, sf_dir, "orders")
    centi = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = o.select(
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("w"),
        F.when(centi > _CA_HIGH, 1).otherwise(0).alias("hi"),
    )
    dose = base.groupBy("w").agg(
        F.count("*").alias("ni"), F.sum("hi").alias("ai")
    )
    tot = dose.agg(
        F.sum("ni").alias("n"),
        F.sum("ai").alias("a"),
        F.sum(F.col("w") * F.col("ai")).alias("swa"),
        F.sum(F.col("w") * F.col("ni")).alias("swn"),
        F.sum(F.col("w") * F.col("w") * F.col("ni")).alias("swwn"),
    )
    return tot.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("a").cast("bigint").alias("n_high"),
        (F.col("n") * F.col("swa") - F.col("a") * F.col("swn"))
        .cast("bigint")
        .alias("t_num"),
        F.expr(
            "CAST(CAST(1000000 AS DECIMAL(38,0)) * (n - 1)"
            " * CAST(n * swa - a * swn AS DECIMAL(38,0))"
            " * CAST(n * swa - a * swn AS DECIMAL(38,0))"
            " DIV (CAST(a AS DECIMAL(38,0)) * (n - a)"
            " * (n * swwn - swn * swn)) AS BIGINT)"
        ).alias("z2_micro"),
    )


# --- X251: covariate-balance SMD table --------------------------------------


@register(
    "q_covariate_balance",
    oracle="""
    WITH cov AS (
        SELECT c.c_custkey AS ck,
               ('0x' || substring(md5(CAST(c.c_custkey AS VARCHAR)), 1, 6))
                   ::BIGINT % 2 AS arm,
               CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal,
               COUNT(o.o_orderkey) AS n_orders,
               COALESCE(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5)
                                 AS BIGINT)), 0) // 100 AS revenue
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_acctbal
    ),
    long AS (
        SELECT arm, 'acctbal_centi' AS covariate, acctbal AS x FROM cov
        UNION ALL
        SELECT arm, 'n_orders', n_orders FROM cov
        UNION ALL
        SELECT arm, 'revenue_dollars', revenue FROM cov
    ),
    stats AS (
        SELECT covariate,
               SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
               SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
               SUM(CASE WHEN arm = 1 THEN x ELSE 0 END) AS s1,
               SUM(CASE WHEN arm = 0 THEN x ELSE 0 END) AS s0,
               SUM(CASE WHEN arm = 1 THEN CAST(x AS HUGEINT) * x
                        ELSE 0 END) AS q1,
               SUM(CASE WHEN arm = 0 THEN CAST(x AS HUGEINT) * x
                        ELSE 0 END) AS q0
        FROM long GROUP BY covariate
    )
    SELECT covariate,
           CAST(n1 AS BIGINT) AS n1, CAST(n0 AS BIGINT) AS n0,
           CAST(1000000 * s1 // n1 - 1000000 * s0 // n0 AS BIGINT)
               AS mean_diff_micro,
           CAST(CASE WHEN (n1 * q1 - CAST(s1 AS HUGEINT) * s1) // (n1 * (n1 - 1))
                     + (n0 * q0 - CAST(s0 AS HUGEINT) * s0) // (n0 * (n0 - 1)) = 0
                THEN 0
                ELSE 1000 * (1000000 * s1 // n1 - 1000000 * s0 // n0)
                     // (1000000 * CAST(FLOOR(SQRT(CAST(
                          ((n1 * q1 - CAST(s1 AS HUGEINT) * s1) // (n1 * (n1 - 1))
                           + (n0 * q0 - CAST(s0 AS HUGEINT) * s0) // (n0 * (n0 - 1)))
                          // 2 AS DOUBLE))) AS BIGINT))
                END AS BIGINT) AS smd_milli
    FROM stats
    """,
)
def q_covariate_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X251: covariate-balance (standardized mean difference) table.

    The randomization-health check run before any effect is read
    (X77/X182/X235 all assume it): per covariate (account balance,
    order count, revenue), SMD = (mean1 - mean0) / pooled_sd between
    the md5-parity arms. |SMD| > 0.1 flags imbalance. Means are exact
    micro fixed point; the pooled variance is exact integer
    arithmetic through HUGEINT/DECIMAL(38) with consistent truncating
    divisions; the single sqrt is IEEE-correctly-rounded on an
    identical exact integer, floored back to an integer — so even the
    classically float-soft SMD hash-matches.

    100 TB shape: one customer-grain left-join aggregate (the
    orders shuffle), a 3x stacked conditional aggregate to
    |covariates| rows, scalar arithmetic after.
    """
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    cov = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.expr(
                "COALESCE(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)"
                " AS BIGINT)), 0) DIV 100"
            ).alias("revenue"),
        )
        .select(
            F.expr(
                "CAST(conv(substring(md5(CAST(c_custkey AS STRING)), 1, 6),"
                " 16, 10) AS BIGINT) % 2"
            ).alias("arm"),
            F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("acctbal"),
            "n_orders",
            "revenue",
        )
    )
    long = (
        cov.select("arm", F.lit("acctbal_centi").alias("covariate"), F.col("acctbal").alias("x"))
        .unionAll(cov.select("arm", F.lit("n_orders"), F.col("n_orders")))
        .unionAll(cov.select("arm", F.lit("revenue_dollars"), F.col("revenue")))
    )
    stats = long.groupBy("covariate").agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("arm") == 1, F.col("x")).otherwise(0)).alias("s1"),
        F.sum(F.when(F.col("arm") == 0, F.col("x")).otherwise(0)).alias("s0"),
        F.sum(
            F.when(
                F.col("arm") == 1,
                (F.col("x") * F.col("x")).cast("decimal(38,0)"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("q1"),
        F.sum(
            F.when(
                F.col("arm") == 0,
                (F.col("x") * F.col("x")).cast("decimal(38,0)"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("q0"),
    )
    var1 = (
        "(n1 * q1 - CAST(s1 AS DECIMAL(38,0)) * s1) DIV (n1 * (n1 - 1))"
    )
    var0 = (
        "(n0 * q0 - CAST(s0 AS DECIMAL(38,0)) * s0) DIV (n0 * (n0 - 1))"
    )
    diff = "1000000 * s1 DIV n1 - 1000000 * s0 DIV n0"
    return stats.select(
        "covariate",
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n0").cast("bigint").alias("n0"),
        F.expr(f"CAST({diff} AS BIGINT)").alias("mean_diff_micro"),
        F.expr(
            f"CAST(CASE WHEN {var1} + {var0} = 0 THEN 0"
            f" ELSE 1000 * ({diff})"
            f" DIV (1000000 * CAST(FLOOR(SQRT(CAST(({var1} + {var0}) DIV 2"
            f" AS DOUBLE))) AS BIGINT)) END AS BIGINT)"
        ).alias("smd_milli"),
    )


# --- X252: Wald-Wolfowitz runs test -----------------------------------------


@register(
    "q_runs_test",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev
        FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ),
    ranked AS (
        SELECT d, rev, ROW_NUMBER() OVER (ORDER BY rev, d) AS rn,
               COUNT(*) OVER () AS n
        FROM daily
    ),
    med AS (SELECT rev AS m FROM ranked WHERE rn = (n + 1) // 2),
    signs AS (
        SELECT d, CASE WHEN rev > m.m THEN 1 ELSE 0 END AS s
        FROM daily CROSS JOIN med m WHERE rev <> m.m
    ),
    seq AS (
        SELECT s, LAG(s) OVER (ORDER BY d) AS prev FROM signs
    ),
    agg AS (
        SELECT COUNT(*) AS n,
               SUM(s) AS n1,
               SUM(1 - s) AS n0,
               1 + SUM(CASE WHEN prev IS NOT NULL AND s <> prev
                            THEN 1 ELSE 0 END) AS runs
        FROM seq
    )
    SELECT CAST(n AS BIGINT) AS n, CAST(n1 AS BIGINT) AS n_above,
           CAST(n0 AS BIGINT) AS n_below, CAST(runs AS BIGINT) AS n_runs,
           CAST(1000000 + 2000000 * n1 * n0 // n AS BIGINT)
               AS expected_runs_micro,
           CAST(2000000 * n1 * n0 * (2 * n1 * n0 - n)
                // (n * n * (n - 1)) AS BIGINT) AS var_runs_micro
    FROM agg
    """,
)
def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X252: Wald-Wolfowitz runs test on the daily revenue series.

    Is daily revenue's above/below-median sequence random, or does it
    cluster into regimes? Too few runs = positive serial dependence
    (trends/regimes), too many = oscillation. Median-ties drop (the
    standard convention); the run count and the closed-form null
    moments E[R] = 1 + 2*n1*n0/n and Var[R] = 2*n1*n0*(2*n1*n0-n) /
    (n^2*(n-1)) are exact integers in micro. The sequence-level
    randomness check next to the value-level two-sample family
    (X124/X125/X242) and the lag-1 autocorrelation (X126).

    100 TB shape: the series is the per-day aggregate (bounded by the
    calendar, thousands of rows at any corpus size) — the median
    order statistic, the lag, and the run count all run over that
    bounded relation; the fact table is touched by exactly one
    map-side-combining aggregate.
    """
    o = table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "bigint"
                )
            ).alias("rev")
        )
    )
    w = Window.orderBy("rev", "d")
    ranked = daily.select(
        "d",
        "rev",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    med = ranked.where(
        F.col("rn") == F.expr("(n + 1) DIV 2")
    ).select(F.col("rev").alias("m"))
    signs = (
        daily.crossJoin(F.broadcast(med))
        .where(F.col("rev") != F.col("m"))
        .select(
            "d", F.when(F.col("rev") > F.col("m"), 1).otherwise(0).alias("s")
        )
    )
    seq = signs.select(
        "s", F.lag("s").over(Window.orderBy("d")).alias("prev")
    )
    agg = seq.agg(
        F.count("*").alias("n"),
        F.sum("s").alias("n1"),
        F.sum(1 - F.col("s")).alias("n0"),
        (
            F.lit(1)
            + F.sum(
                F.when(
                    F.col("prev").isNotNull()
                    & (F.col("s") != F.col("prev")),
                    1,
                ).otherwise(0)
            )
        ).alias("runs"),
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("n1").cast("bigint").alias("n_above"),
        F.col("n0").cast("bigint").alias("n_below"),
        F.col("runs").cast("bigint").alias("n_runs"),
        F.expr("CAST(1000000 + 2000000 * n1 * n0 DIV n AS BIGINT)").alias(
            "expected_runs_micro"
        ),
        F.expr(
            "CAST(2000000 * n1 * n0 * (2 * n1 * n0 - n)"
            " DIV (n * n * (n - 1)) AS BIGINT)"
        ).alias("var_runs_micro"),
    )
