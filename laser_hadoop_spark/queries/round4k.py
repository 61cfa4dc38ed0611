"""Round-4 widening queries, eleventh batch (SURVEY.md §2.12, X167-X170).

Distribution-shape and engagement-ratio closures: a log2 (powers-of-2)
histogram whose bucket key is computed from the BINARY STRING length
(no float log anywhere — the long-tail profile equi-width X24 and
equi-depth X118 both miss), the DAU/MAU stickiness ratio, corpus
type-token ratio per source (vocabulary richness), and the Fano
factor (variance-to-mean burstiness) of daily event counts.

Cross-engine discipline: bucket keys from length(bin(x)), ratios in
truncating-integer bp/micro, variance numerators cross-multiplied
(X52), DIV == //.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table


@register(
    "q_log2_histogram",
    oracle="""
    WITH v AS (
        SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS centi
        FROM orders
    )
    SELECT CAST(length(bin(centi)) - 1 AS INT) AS log2_bucket,
           COUNT(*) AS n_orders,
           CAST(MIN(centi) AS BIGINT) AS lo_centi,
           CAST(MAX(centi) AS BIGINT) AS hi_centi,
           CAST(SUM(centi) AS BIGINT) AS mass_centi
    FROM v GROUP BY log2_bucket
    """,
)
def q_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X167: powers-of-2 (log-scale) histogram of order values.

    The long-tail profile: equi-width bins (X24) starve the tail and
    equi-depth bins (X118) hide magnitude — log2 buckets show both.
    The bucket key floor(log2(x)) is computed as length(bin(x)) - 1,
    the bit length of the value's binary string — PURE integer/string
    arithmetic on both engines, no float log whose rounding could
    flip a 2^k boundary value. Scan-local key + one aggregate.
    """
    o = table(spark, sf_dir, "orders")
    centi = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    v = o.select(centi.alias("centi"))
    bucket = (F.length(F.bin("centi")) - 1).cast("int")
    return v.groupBy(bucket.alias("log2_bucket")).agg(
        F.count("*").alias("n_orders"),
        F.min("centi").cast("bigint").alias("lo_centi"),
        F.max("centi").cast("bigint").alias("hi_centi"),
        F.sum("centi").cast("bigint").alias("mass_centi"),
    )


@register(
    "q_dau_mau",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM ud),
    mau AS (
        SELECT d.day, COUNT(DISTINCT u.user_id) AS mau
        FROM dau d JOIN ud u
          ON u.day > d.day - 28 AND u.day <= d.day
        GROUP BY d.day
    )
    SELECT d.day, CAST(d.dau AS BIGINT) AS dau,
           CAST(m.mau AS BIGINT) AS mau,
           CAST(10000 * d.dau // m.mau AS BIGINT) AS stickiness_bp
    FROM dau d
    JOIN mau m ON m.day = d.day
    CROSS JOIN bounds b
    WHERE d.day >= b.lo + 27
    """,
)
def q_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X168: DAU/MAU stickiness ratio per day.

    The engagement ratio product dashboards lead with: daily actives
    over trailing-28-day actives, in exact basis points, full windows
    only. The trailing-28 distinct count uses X87's offset-explode
    shape: each deduped (user, day) row fans out to the 28 window-end
    days it contributes to, then distinct-counts per window day — an
    EQUI-shuffle costing 28x the user-day table (a pure range
    predicate would plan as a nested-loop join evaluating
    |days| x |user-days| pairs). The inner join back to dau restricts
    window days to actual activity days; the HLL sibling X151 applies
    identically when user cardinality explodes.
    """
    e = table(spark, sf_dir, "events")
    ud = e.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    dau = ud.groupBy("day").agg(F.count("*").alias("dau"))
    bounds = ud.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(27))).alias("off"),
        "day",
    ).select(
        "user_id", F.date_add(F.col("day"), F.col("off")).alias("day")
    )
    mau = contrib.groupBy("day").agg(
        F.count_distinct("user_id").alias("mau")
    )
    return (
        dau.join(mau, "day")
        .crossJoin(F.broadcast(bounds))
        .where(F.col("day") >= F.date_add(F.col("lo"), 27))
        .select(
            "day",
            F.col("dau").cast("bigint").alias("dau"),
            F.col("mau").cast("bigint").alias("mau"),
            F.expr("CAST(10000 * dau DIV mau AS BIGINT)").alias(
                "stickiness_bp"
            ),
        )
    )


@register(
    "q_type_token_ratio",
    oracle="""
    WITH toks AS (
        SELECT source, UNNEST(string_split(text, ' ')) AS token
        FROM documents
    )
    SELECT source, COUNT(*) AS n_tokens,
           COUNT(DISTINCT token) AS n_types,
           CAST(10000 * COUNT(DISTINCT token) // COUNT(*) AS BIGINT)
               AS ttr_bp
    FROM toks GROUP BY source
    """,
)
def q_type_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X169: corpus type-token ratio (vocabulary richness) per source.

    The source-level diversity signal mixture re-weighting (X136)
    should read next to volume: a source whose TTR collapses is
    boilerplate/templated text even when every individual document
    passes the per-doc quality gates (X162's rules are per-doc blind
    to cross-doc repetition). Exact distinct-over-count in bp; one
    exploded aggregate with partial distinct. At extreme source
    counts the HLL sibling (X56) swaps in for COUNT(DISTINCT).
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split("text", " ")).alias("token")
    )
    return toks.groupBy("source").agg(
        F.count("*").alias("n_tokens"),
        F.count_distinct("token").alias("n_types"),
        F.expr(
            "CAST(10000 * COUNT(DISTINCT token) DIV COUNT(*) AS BIGINT)"
        ).alias("ttr_bp"),
    )


@register(
    "q_fano_burstiness",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    s AS (
        SELECT event_type, COUNT(*) AS n, SUM(c) AS sx, SUM(c * c) AS sxx
        FROM daily GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           CAST(sx AS BIGINT) AS n_events,
           CAST(((n * sxx - sx * sx) * 1000000) // (n * sx) AS BIGINT)
               AS fano_micro
    FROM s
    """,
)
def q_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X170: Fano factor (variance-to-mean) of daily event counts.

    Burstiness per event type: Fano = population variance / mean of
    the daily count series — 1.0 for a Poisson process, above it for
    bursty arrivals (the capacity-planning signal for ingest sizing).
    Cleared denominators keep it exact: var/mean = (n*sxx - sx^2) /
    (n * sx), emitted in truncating integer micro-units — no float
    variance, no float mean, one integer division (X52's algebra with
    both divisions fused). One date-keyed aggregate of the fact
    table + a 5-row stats pass.
    """
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("c"))
    s = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("sx"),
        # power sum through DECIMAL(38,0): with ANSI off a bigint
        # product would silently wrap at scale while DuckDB's SUM
        # promotes to HUGEINT — the q_dims_variance discipline
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("sxx"),
    )
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.col("sx").cast("bigint").alias("n_events"),
        F.expr(
            "CAST(((CAST(n AS DECIMAL(38,0)) * sxx"
            "       - CAST(sx AS DECIMAL(38,0)) * sx) * 1000000)"
            "     div (CAST(n AS DECIMAL(38,0)) * sx) AS BIGINT)"
        ).alias("fano_micro"),
    )
