"""Round-4 widening queries, fourth batch (SURVEY.md §2.13, X131-X134).

Graph, anomaly, and changepoint shapes, each oracle-backed: bounded-hop
weighted shortest paths (Bellman-Ford iterations vs a recursive-CTE
min-cost oracle), rolling z-score anomaly counts with the comparison
cross-multiplied into pure integers, CUSUM changepoint detection over
the two-pass cumulative operator, and segment purchase-profile cosine
similarity with a squared-cosine integer core.

Cross-engine discipline unchanged: centi bigints, DIV == //, HUGEINT /
DECIMAL(38,0) where squares overflow int64, unique window tiebreakers,
identical aliases both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table


@register(
    "q_bellman_ford",
    oracle="""
    WITH RECURSIVE edges AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst,
               COUNT(*) AS w
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
    ),
    s AS (SELECT MIN(l_partkey) AS root FROM lineitem),
    walk AS (
        SELECT root AS node, CAST(0 AS BIGINT) AS cost, 0 AS hops FROM s
        UNION
        SELECT e.dst AS node, w.cost + e.w AS cost, w.hops + 1 AS hops
        FROM walk w JOIN edges e ON e.src = w.node
        WHERE w.hops < 3
    )
    SELECT CAST(node AS BIGINT) AS partkey,
           CAST(MIN(cost) AS BIGINT) AS min_cost
    FROM walk GROUP BY node
    """,
)
def q_bellman_ford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X131: bounded-hop weighted shortest paths (Bellman-Ford).

    Minimum-cost path (<= 3 hops) from the smallest partkey over the
    co-purchase graph, edge weight = co-occurrence count — the
    weighted sibling of X113's BFS, verified against DuckDB's
    recursive CTE taking MIN(cost) over all bounded walks. The Spark
    side runs 3 Bellman-Ford relaxations: each is one equi-join of the
    current best-costs against the cached weighted edge list plus a
    min-combine — never an all-walks enumeration, so while the
    oracle's walk closure is exponential in hops, the engine's work is
    O(hops * |edges|). Iteration k's state holds min cost over <= k
    hops, matching the CTE's group-wise MIN exactly (integer costs, no
    ordering ambiguity).
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
        .cache()
    )
    best = li.agg(F.min("l_partkey").alias("node")).select(
        "node", F.lit(0).cast("bigint").alias("cost")
    )
    for _ in range(3):
        relaxed = (
            best.join(edges, best.node == edges.src)
            .select(
                F.col("dst").alias("node"),
                (F.col("cost") + F.col("w")).alias("cost"),
            )
        )
        best = (
            best.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
        )
    return best.select(
        F.col("node").cast("bigint").alias("partkey"),
        F.col("cost").cast("bigint").alias("min_cost"),
    )


@register(
    "q_rolling_zscore",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS x,
               epoch_us(ts) AS t_us
        FROM events
    ),
    stats AS (
        SELECT user_id, event_id, x,
               COUNT(*) OVER w AS n,
               SUM(x) OVER w AS sx,
               SUM(x * x) OVER w AS sxx
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id
                     ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN n >= 4
                          AND CAST((n * x - sx) AS HUGEINT)
                              * CAST((n * x - sx) AS HUGEINT)
                              > 9 * CAST(n AS HUGEINT)
                                  * (CAST(n AS HUGEINT) * sxx
                                     - CAST(sx AS HUGEINT) * sx)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
           COUNT(*) AS n_events
    FROM stats GROUP BY user_id
    """,
)
def q_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X132: rolling z-score anomaly counts, pure-integer comparison.

    Events whose value deviates > 3 sigma from the mean/std of the
    user's previous <= 8 events (frame excludes the current row — no
    self-contamination). The |z| > 3 test cross-multiplies into
    integers: (n*x - sx)^2 > 9 * n * (n*sxx - sx^2) — no division, no
    sqrt, no float, so both engines count identical anomalies
    (HUGEINT/DECIMAL38 for the squares). Warm-up rows (n < 4) don't
    count. One user_id shuffle shared by the frame window and the
    final per-user rollup — the online-monitoring shape, batch form.
    """
    ev = table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("x"),
        F.unix_micros("ts").alias("t_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "event_id")
        .rowsBetween(-8, -1)
    )
    stats = e.select(
        "user_id",
        "x",
        F.count("*").over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
    )
    dec = lambda c: f"CAST({c} AS DECIMAL(38,0))"  # noqa: E731
    anomaly = F.expr(
        f"n >= 4 AND {dec('n * x - sx')} * {dec('n * x - sx')} "
        f"> 9 * {dec('n')} * ({dec('n')} * sxx - {dec('sx')} * sx)"
    )
    return stats.groupBy("user_id").agg(
        F.sum(F.when(anomaly, 1).otherwise(0)).cast("bigint").alias("n_anomalies"),
        F.count("*").alias("n_events"),
    )


@register(
    "q_cusum_changepoint",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev
        FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ),
    tot AS (SELECT COUNT(*) AS n, SUM(rev) AS srev FROM daily),
    cum AS (
        SELECT d,
               SUM(rev) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cumrev,
               ROW_NUMBER() OVER (ORDER BY d) AS rn
        FROM daily
    ),
    dev AS (
        SELECT d, ABS(CAST(t.n AS HUGEINT) * cumrev
                      - CAST(rn AS HUGEINT) * t.srev) AS s_abs
        FROM cum CROSS JOIN tot t
    )
    SELECT d AS changepoint_day,
           CAST(s_abs AS VARCHAR) AS s_abs_str
    FROM dev ORDER BY s_abs DESC, d LIMIT 1
    """,
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X133: CUSUM changepoint over the daily revenue series.

    The day t maximizing |S_t|, S_t = sum_{i<=t}(rev_i - mean) — the
    classic single-changepoint estimator. Scaled by n to stay
    integral: n*S_t = n*cumrev_t - t*total, an exact wide integer
    (HUGEINT / DECIMAL38 — cumrev * n overflows int64 at sf1), emitted
    as a string because a 96-bit magnitude can't ride a BIGINT column
    through the comparator. The cumulative revenue runs through the
    two-pass operator; argmax breaks ties to the earliest day. One
    ordered pass + one top-1.
    """
    from laser_hadoop_spark.operators.cumulative import ordered_cumsum

    o = table(spark, sf_dir, "orders")
    centi = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    daily = (
        o.select(F.col("o_orderdate").cast("date").alias("d"), centi.alias("rev"))
        .groupBy("d")
        .agg(F.sum("rev").alias("rev"))
    )
    cum = ordered_cumsum(
        daily, order_by=["d"], values={"rev": "cumrev"}, row_number_col="rn"
    )
    tot = daily.agg(F.count("*").alias("n"), F.sum("rev").alias("srev"))
    dec = lambda c: f"CAST({c} AS DECIMAL(38,0))"  # noqa: E731
    dev = cum.crossJoin(F.broadcast(tot)).select(
        "d",
        F.expr(f"ABS({dec('n')} * cumrev - {dec('rn')} * srev)").alias("s_abs"),
    )
    return (
        dev.orderBy(F.desc("s_abs"), F.asc("d"))
        .limit(1)
        .select(
            F.col("d").alias("changepoint_day"),
            F.col("s_abs").cast("decimal(38,0)").cast("string").alias("s_abs_str"),
        )
    )


@register(
    "q_profile_cosine",
    oracle="""
    WITH prof AS (
        SELECT c.c_mktsegment AS segment, o.o_orderpriority AS prio,
               COUNT(*) AS cnt
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY c.c_mktsegment, o.o_orderpriority
    ),
    dots AS (
        SELECT a.segment AS seg_a, b.segment AS seg_b,
               SUM(CAST(a.cnt AS HUGEINT) * b.cnt) AS dot
        FROM prof a JOIN prof b
          ON a.prio = b.prio AND a.segment < b.segment
        GROUP BY a.segment, b.segment
    ),
    norms AS (
        SELECT segment, SUM(CAST(cnt AS HUGEINT) * cnt) AS nrm FROM prof
        GROUP BY segment
    )
    SELECT d.seg_a, d.seg_b,
           CAST(d.dot * d.dot * 1000000 // (na.nrm * nb.nrm) AS BIGINT)
               AS cos2_micro
    FROM dots d
    JOIN norms na ON na.segment = d.seg_a
    JOIN norms nb ON nb.segment = d.seg_b
    """,
)
def q_profile_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X134: cosine similarity between segment purchase profiles.

    Each market segment's priority-count vector, compared pairwise by
    SQUARED cosine in micro-units: cos^2 = dot^2 / (|a|^2 * |b|^2) is
    a ratio of exact integers, so no sqrt ever runs — monotone in
    cosine for non-negative count vectors, hence the same similarity
    ranking, fully hash-verifiable (the trick the embedding-float
    cosine paths can't use). Wide-integer (HUGEINT / DECIMAL38)
    products; pairs via an equi-join on the vector index over the tiny
    profile aggregate.
    """
    from laser_hadoop_spark.tables import register_views

    register_views(spark, sf_dir, names=("orders", "customer"))
    dec = lambda c: f"CAST({c} AS DECIMAL(38,0))"  # noqa: E731
    return spark.sql(
        f"""
    WITH prof AS (
        SELECT c.c_mktsegment AS segment, o.o_orderpriority AS prio,
               COUNT(*) AS cnt
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY c.c_mktsegment, o.o_orderpriority
    ),
    dots AS (
        SELECT a.segment AS seg_a, b.segment AS seg_b,
               SUM({dec('a.cnt')} * b.cnt) AS dot
        FROM prof a JOIN prof b
          ON a.prio = b.prio AND a.segment < b.segment
        GROUP BY a.segment, b.segment
    ),
    norms AS (
        SELECT segment, SUM({dec('cnt')} * cnt) AS nrm FROM prof
        GROUP BY segment
    )
    SELECT d.seg_a, d.seg_b,
           CAST((d.dot * d.dot * 1000000
                 - (d.dot * d.dot * 1000000) % (na.nrm * nb.nrm))
                / (na.nrm * nb.nrm) AS BIGINT) AS cos2_micro
    FROM dots d
    JOIN norms na ON na.segment = d.seg_a
    JOIN norms nb ON nb.segment = d.seg_b
    """
    )
