"""Round-4 widening queries, third batch (SURVEY.md §2.13, X123-X130).

Distribution statistics and key-domain analyses, each oracle-backed:
empirical CDF probes, two-sample Kolmogorov-Smirnov (integer-scaled D
over the full value domain via the two-pass cumulative operator),
Mann-Whitney U with exact tie-corrected doubled ranks, lag-1
autocorrelation of the daily revenue series (HUGEINT/DECIMAL38 sums),
per-user 64-day activity bitmaps (bit_or/bit_count), key-gap islands
with a DISTRIBUTED lead (rank + rn+1 equi-join instead of a global
window), a 2D histogram, and per-group top-k WITH TIES (dense_rank).

Cross-engine discipline unchanged: centi-unit money bigints, one
fixed-point per float, DIV == //, unique window tiebreakers, columns
aliased identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# ECDF probe points: $50k .. $400k in centi (o_totalprice spans
# ~$1k..$500k at every SF of the driver data).
_ECDF_PROBES = [5_000_000, 10_000_000, 20_000_000, 30_000_000, 40_000_000]


@register(
    "q_ecdf",
    oracle=f"""
    WITH v AS (
        SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS centi
        FROM orders
    ),
    agg AS (
        SELECT COUNT(*) AS n,
               {", ".join(
                   f"SUM(CASE WHEN centi <= {p} THEN 1 ELSE 0 END) AS c{i}"
                   for i, p in enumerate(_ECDF_PROBES)
               )}
        FROM v
    )
    SELECT probe_centi, n_le, CAST(n_le * 10000 // n AS BIGINT) AS share_bp
    FROM (
        {" UNION ALL ".join(
            f"SELECT CAST({p} AS BIGINT) AS probe_centi,"
            f" CAST(c{i} AS BIGINT) AS n_le, n FROM agg"
            for i, p in enumerate(_ECDF_PROBES)
        )}
    ) u
    """,
)
def q_ecdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X123: empirical CDF at fixed probe points.

    P(order value <= x) for five probes — the distribution fingerprint
    monitoring systems track per ingest batch. All five probes
    evaluate as conditional counts in ONE aggregate pass over the scan
    (no probe x row fanout), then unpivot into (probe, count, bp)
    rows; shares via truncating integer division in basis points. One
    scalar-aggregate shuffle.
    """
    o = table(spark, sf_dir, "orders")
    centi = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    agg = o.select(centi.alias("centi")).agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.when(F.col("centi") <= p, 1).otherwise(0)).alias(f"c{i}")
            for i, p in enumerate(_ECDF_PROBES)
        ],
    )
    pairs = ", ".join(
        f"CAST({p} AS BIGINT), CAST(c{i} AS BIGINT)"
        for i, p in enumerate(_ECDF_PROBES)
    )
    return agg.select(
        F.expr(f"stack({len(_ECDF_PROBES)}, {pairs}) AS (probe_centi, n_le)"),
        "n",
    ).select(
        "probe_centi",
        "n_le",
        F.expr("CAST(n_le * 10000 DIV n AS BIGINT)").alias("share_bp"),
    )


def _two_sample_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared base for KS / Mann-Whitney: per distinct order-value
    centi, counts in sample 1 (BUILDING) and sample 2 (MACHINERY)."""
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    centi = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(
            centi.alias("v"),
            F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("s1"),
        )
    )
    return base.groupBy("v").agg(
        F.sum("s1").alias("c1"), F.sum(1 - F.col("s1")).alias("c2")
    )


_TWO_SAMPLE_SQL = """
    WITH base AS (
        SELECT CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS v,
               CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS s1
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
    ),
    vals AS (
        SELECT v, SUM(s1) AS c1, SUM(1 - s1) AS c2 FROM base GROUP BY v
    ),
    cum AS (
        SELECT v, c1, c2,
               SUM(c1) OVER w AS cum1, SUM(c2) OVER w AS cum2
        FROM vals
        WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ),
    tot AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM vals)
"""


@register(
    "q_ks_test",
    oracle=_TWO_SAMPLE_SQL
    + """
    SELECT CAST(MAX(ABS(cum1 * t.n2 - cum2 * t.n1)) AS BIGINT) AS d_scaled,
           CAST(MIN(t.n1) AS BIGINT) AS n1, CAST(MIN(t.n2) AS BIGINT) AS n2
    FROM cum CROSS JOIN tot t
    """,
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X124: two-sample Kolmogorov-Smirnov statistic, integer-scaled.

    D = max_v |F1(v) - F2(v)| between BUILDING and MACHINERY order
    values, reported as d_scaled = max |cum1*n2 - cum2*n1| (= D *
    n1 * n2 — an exact bigint, no division ever). The per-value
    cumulative counts run through the two-pass range-partitioned
    cumulative operator over the FULL distinct-value domain — the
    oracle's single-partition window spelling never appears in the
    Spark plan, so the statistic scales with the value domain. The
    distribution-drift detector for data pipelines, exactly
    verifiable.
    """
    from laser_hadoop_spark.operators.cumulative import ordered_cumsum

    vals = _two_sample_values(spark, sf_dir)
    cum = ordered_cumsum(
        vals, order_by=["v"], values={"c1": "cum1", "c2": "cum2"}
    )
    tot = vals.agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.max(
                F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
            )
            .cast("bigint")
            .alias("d_scaled"),
            F.min("n1").cast("bigint").alias("n1"),
            F.min("n2").cast("bigint").alias("n2"),
        )
    )


@register(
    "q_mann_whitney",
    oracle=_TWO_SAMPLE_SQL
    + """
    , ranked AS (
        SELECT c1, c2, cum1 + cum2 - c1 - c2 + 1 AS min_rank,
               c1 + c2 AS c
        FROM cum
    ),
    r1 AS (
        SELECT SUM(c1 * (2 * min_rank + c - 1)) AS two_r1 FROM ranked
    )
    SELECT CAST(two_r1 - t.n1 * (t.n1 + 1) AS BIGINT) AS u1_x2,
           CAST(2 * t.n1 * t.n2 - (two_r1 - t.n1 * (t.n1 + 1)) AS BIGINT)
               AS u2_x2,
           CAST(t.n1 AS BIGINT) AS n1, CAST(t.n2 AS BIGINT) AS n2
    FROM r1 CROSS JOIN tot t
    """,
)
def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X125: Mann-Whitney U with exact tie correction, doubled ranks.

    Rank-sum test between the same two samples as X124. Tied values
    share the average rank; doubling every rank keeps the arithmetic
    integral: 2*avg_rank(v) = 2*min_rank(v) + c(v) - 1, so
    2*R1 = sum(c1(v) * (2*min_rank + c - 1)) and U1*2 = 2*R1 -
    n1*(n1+1) are exact bigints (u1_x2 + u2_x2 == 2*n1*n2 by
    construction — a free internal consistency check). min_rank
    derives from the same two-pass cumulative as the KS statistic.
    """
    from laser_hadoop_spark.operators.cumulative import ordered_cumsum

    vals = _two_sample_values(spark, sf_dir)
    cum = ordered_cumsum(
        vals, order_by=["v"], values={"c1": "cum1", "c2": "cum2"}
    )
    ranked = cum.select(
        "c1",
        "c2",
        (F.col("cum1") + F.col("cum2") - F.col("c1") - F.col("c2") + 1).alias(
            "min_rank"
        ),
        (F.col("c1") + F.col("c2")).alias("c"),
    )
    r1 = ranked.agg(
        F.sum(
            F.col("c1") * (2 * F.col("min_rank") + F.col("c") - 1)
        ).alias("two_r1")
    )
    tot = vals.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    u1 = F.col("two_r1") - F.col("n1") * (F.col("n1") + 1)
    return (
        r1.crossJoin(F.broadcast(tot))
        .select(
            u1.cast("bigint").alias("u1_x2"),
            (2 * F.col("n1") * F.col("n2") - u1).cast("bigint").alias("u2_x2"),
            F.col("n1").cast("bigint").alias("n1"),
            F.col("n2").cast("bigint").alias("n2"),
        )
    )


def _autocorr_sql(cast_big: str) -> str:
    return f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev
        FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ),
    pairs AS (
        SELECT rev AS x,
               LEAD(rev) OVER (ORDER BY d) AS y
        FROM daily
    ),
    p AS (SELECT x, y FROM pairs WHERE y IS NOT NULL),
    s AS (
        SELECT COUNT(*) AS n,
               SUM({cast_big('x')}) AS sx, SUM({cast_big('y')}) AS sy,
               SUM({cast_big('x')} * {cast_big('x')}) AS sxx,
               SUM({cast_big('y')} * {cast_big('y')}) AS syy,
               SUM({cast_big('x')} * {cast_big('y')}) AS sxy
        FROM p
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           ROUND(CAST({cast_big('n')} * sxy - sx * sy AS DOUBLE)
                 / SQRT(CAST({cast_big('n')} * sxx - sx * sx AS DOUBLE)
                        * CAST({cast_big('n')} * syy - sy * sy AS DOUBLE)),
                 4) AS r_lag1
    FROM s
    """


@register(
    "q_autocorr_lag1",
    oracle=_autocorr_sql(lambda e: f"CAST({e} AS HUGEINT)"),
)
def q_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X126: lag-1 autocorrelation of the daily revenue series.

    Pearson r between consecutive observed days' exact centi revenue —
    the seasonality/momentum screen for any KPI series. All five sums
    accumulate in wide integers (HUGEINT / DECIMAL(38,0): daily centi
    revenue squared overflows int64), exactly as q_regression_stats
    (X52); the two IEEE divisions happen once on exact operands, then
    round(4). The lead window runs on the per-day aggregate — bounded
    by the date domain (~2.4k rows), the documented exception to the
    no-global-window rule (q_monthly_growth precedent).
    """
    from laser_hadoop_spark.tables import register_views

    register_views(spark, sf_dir, names=("orders",))
    return spark.sql(_autocorr_sql(lambda e: f"CAST({e} AS DECIMAL(38,0))"))


@register(
    "q_activity_bitmap",
    oracle="""
    WITH days AS (
        SELECT user_id,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_idx
        FROM events
    )
    SELECT user_id,
           CAST(day_idx // 64 AS BIGINT) AS block,
           CAST(BIT_OR(CAST(1 AS BIGINT) << CAST(day_idx % 64 AS INT))
                AS BIGINT) AS bitmap,
           CAST(COUNT(DISTINCT day_idx) AS BIGINT) AS n_active_days,
           CAST(MIN(day_idx) AS BIGINT) AS first_day,
           CAST(MAX(day_idx) AS BIGINT) AS last_day
    FROM days GROUP BY user_id, day_idx // 64
    """,
)
def q_activity_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X127: per-user 64-day activity bitmaps.

    One bigint per (user, 64-day block) with bit d set iff the user
    was active on day d — the compact activity index behind streak /
    retention / DAU queries (a bitmap AND answers "active both days",
    a popcount answers "days active"; the roaring-bitmap idea at
    bigint granularity). BIT_OR is the aggregate (order-insensitive,
    combiner-friendly); n_active_days is exact distinct-day count,
    which must equal bit_count(bitmap) — the pytest invariant. One
    (user, block) shuffle with map-side combine.
    """
    ev = table(spark, sf_dir, "events")
    day_idx = F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
    days = ev.select("user_id", day_idx.alias("day_idx"))
    return days.groupBy(
        "user_id", F.expr("day_idx DIV 64").cast("bigint").alias("block")
    ).agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(day_idx % 64 AS INT)))"
        )
        .cast("bigint")
        .alias("bitmap"),
        F.countDistinct("day_idx").cast("bigint").alias("n_active_days"),
        F.min("day_idx").cast("bigint").alias("first_day"),
        F.max("day_idx").cast("bigint").alias("last_day"),
    )


@register(
    "q_key_gap_islands",
    oracle="""
    WITH keyed AS (
        SELECT o_orderkey AS k FROM orders
        WHERE o_orderkey % 97 <> 0 AND o_orderkey % 89 <> 0
    ),
    nxt AS (
        SELECT k, LEAD(k) OVER (ORDER BY k) AS next_k FROM keyed
    )
    SELECT k + 1 AS gap_start, CAST(next_k - k - 1 AS BIGINT) AS gap_len
    FROM nxt
    WHERE next_k - k > 1
    ORDER BY gap_len DESC, gap_start
    LIMIT 10
    """,
)
def q_key_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X128: largest key-domain gaps via a DISTRIBUTED lead.

    The sequence-integrity audit ("which id ranges are missing after
    deletions?") over a key domain with simulated deletions (%97, %89
    keys removed, as in X111's snapshot). The oracle spells LEAD over
    a global order; the Spark plan instead computes a two-pass global
    row number (ordered_cumsum) and finds each row's successor by an
    EQUI-JOIN on rn+1 — lead-without-a-global-window, range-parallel
    at any key-domain size. Top-10 gaps via TakeOrderedAndProject
    (deterministic (len desc, start) order).
    """
    from laser_hadoop_spark.operators.cumulative import ordered_cumsum

    o = table(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
    keyed = o.where((F.col("k") % 97 != 0) & (F.col("k") % 89 != 0))
    ranked = ordered_cumsum(keyed, order_by=["k"], row_number_col="rn")
    a = ranked.alias("a")
    b = ranked.select(
        (F.col("rn") - 1).alias("rn_prev"), F.col("k").alias("next_k")
    ).alias("b")
    gaps = (
        a.join(b, F.col("a.rn") == F.col("b.rn_prev"))
        .where(F.col("next_k") - F.col("a.k") > 1)
        .select(
            (F.col("a.k") + 1).alias("gap_start"),
            (F.col("next_k") - F.col("a.k") - 1).cast("bigint").alias("gap_len"),
        )
    )
    return gaps.orderBy(F.desc("gap_len"), F.asc("gap_start")).limit(10)


@register(
    "q_histogram2d",
    oracle="""
    SELECT CAST(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                // 1000000 AS BIGINT) AS price_bin,
           CAST(CAST(l_quantity AS BIGINT) // 10 AS BIGINT) AS qty_bin,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_centi
    FROM lineitem
    GROUP BY CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) // 1000000,
             CAST(l_quantity AS BIGINT) // 10
    """,
)
def q_histogram2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X129: 2D histogram (price x quantity joint distribution).

    Joint binning — $10k price bins x 10-unit quantity bins with count
    and exact centi mass per cell — the heatmap / copula input X24's
    1D histogram can't provide. Pure scan-local floor-division keys,
    one combine-friendly aggregate; cardinality is bounded by the bin
    grid, not the data.
    """
    li = table(spark, sf_dir, "lineitem")
    centi = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
    return (
        li.select(
            centi.alias("centi"),
            F.col("l_quantity").cast("bigint").alias("qty"),
        )
        .groupBy(
            F.expr("centi DIV 1000000").cast("bigint").alias("price_bin"),
            F.expr("qty DIV 10").cast("bigint").alias("qty_bin"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("centi").cast("bigint").alias("sum_centi"),
        )
    )


@register(
    "q_topk_with_ties",
    oracle="""
    WITH vals AS (
        SELECT c.c_mktsegment AS segment,
               CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS centi,
               COUNT(*) AS n_orders
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY c.c_mktsegment, CAST(FLOOR(o.o_totalprice * 100 + 0.5)
                                      AS BIGINT)
    ),
    ranked AS (
        SELECT *, DENSE_RANK() OVER (PARTITION BY segment
                                     ORDER BY centi DESC) AS rnk
        FROM vals
    )
    SELECT segment, CAST(rnk AS BIGINT) AS rnk, centi, n_orders
    FROM ranked WHERE rnk <= 3
    """,
)
def q_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X130: top-k WITH TIES (dense_rank semantics).

    The 3 highest distinct order values per segment, KEEPING ties —
    the WITH TIES / dense_rank variant of X-series row_number top-k
    (W3), a genuinely different operator contract (output size is
    data-dependent). Ranking runs on the (segment, value) AGGREGATE
    (distinct values with counts), so the window input is the
    compressed domain, not the fact table; dense_rank over centi desc
    needs no tiebreaker because the partition key + ordering value is
    already unique per row.
    """
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    centi = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    vals = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"), centi.alias("centi")
        )
        .agg(F.count("*").alias("n_orders"))
    )
    w = Window.partitionBy("segment").orderBy(F.desc("centi"))
    return (
        vals.withColumn("rnk", F.dense_rank().over(w).cast("bigint"))
        .where(F.col("rnk") <= 3)
        .select("segment", "rnk", "centi", "n_orders")
    )
