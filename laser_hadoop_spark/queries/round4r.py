"""Round-4 widening queries, eighteenth batch (SURVEY.md §2.12,
X194-X195).

Pipeline-health closure: an ingestion drift monitor (quality-rule
pass rates across doc_id-order deciles — the X162 gates turned into a
trend so a degrading source shows up BEFORE the corpus average moves)
and funnel stage-latency percentiles (X37 counted who converts, X88
bounded the window; this prices HOW LONG conversion takes, in exact
rank-selected seconds).

Cross-engine discipline: deciles via X118's closed-form ntile over
the two-pass rank, lower percentiles as (den*rank >= num*n) order
statistics, integer-second gaps from epoch micros with truncating
division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table


@register(
    "q_ingest_drift",
    oracle="""
    WITH m AS (
        SELECT doc_id,
               NTILE(10) OVER (ORDER BY doc_id) AS decile,
               len(string_split(text, ' ')) AS n_words,
               len(replace(text, ' ', '')) AS n_chars
        FROM documents
    ),
    f AS (
        SELECT decile,
               CASE WHEN n_words >= 50 AND n_words <= 100000
                    THEN 1 ELSE 0 END AS ok_wc,
               CASE WHEN 3 * n_words <= n_chars AND n_chars <= 10 * n_words
                    THEN 1 ELSE 0 END AS ok_mwl,
               n_words
        FROM m
    )
    SELECT CAST(decile AS INT) AS decile, COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS words,
           CAST(10000 * SUM(ok_wc) // COUNT(*) AS BIGINT) AS wc_pass_bp,
           CAST(10000 * SUM(ok_mwl) // COUNT(*) AS BIGINT) AS mwl_pass_bp
    FROM f GROUP BY decile
    """,
)
def q_ingest_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X194: ingestion drift monitor (quality pass rates by arrival
    decile).

    The X162 quality gates as a TREND: doc_id order stands in for
    ingestion order (the X147/X175 convention), docs bucket into ten
    equal-count arrival deciles via X118's closed-form ntile over the
    two-pass global rank, and each decile reports its rule pass rates
    in exact bp. A degrading crawl shows as a pass-rate slope long
    before the corpus-wide average moves — the alerting input for the
    X180 ingest plan's quality counter. One scan + the two-pass rank
    + one aggregate.
    """
    from laser_hadoop_spark.operators.cumulative import (
        closed_form_ntile,
        ordered_cumsum,
    )

    d = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    base = d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).alias(
            "n_chars"
        ),
    )
    ranked = ordered_cumsum(base, order_by=["doc_id"], row_number_col="rn")
    n_row = base.agg(F.count("*").alias("n"))
    decile = closed_form_ntile()
    f = ranked.crossJoin(F.broadcast(n_row)).select(
        decile.cast("int").alias("decile"),
        "n_words",
        ((F.col("n_words") >= 50) & (F.col("n_words") <= 100000))
        .cast("int")
        .alias("ok_wc"),
        (
            (3 * F.col("n_words") <= F.col("n_chars"))
            & (F.col("n_chars") <= 10 * F.col("n_words"))
        )
        .cast("int")
        .alias("ok_mwl"),
    )
    return f.groupBy("decile").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("words"),
        F.expr("CAST(10000 * SUM(ok_wc) DIV COUNT(*) AS BIGINT)").alias(
            "wc_pass_bp"
        ),
        F.expr("CAST(10000 * SUM(ok_mwl) DIV COUNT(*) AS BIGINT)").alias(
            "mwl_pass_bp"
        ),
    )


@register(
    "q_funnel_latency",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(epoch_us(ts)) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_purch
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= v.t_view
        GROUP BY e.user_id
    ),
    gaps AS (
        SELECT (p.t_purch - v.t_view) // 1000000 AS gap_s
        FROM v JOIN p ON p.user_id = v.user_id
    ),
    r AS (
        SELECT gap_s, ROW_NUMBER() OVER (ORDER BY gap_s) AS rn,
               COUNT(*) OVER () AS n
        FROM gaps
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM gaps) AS n_converted,
           (SELECT CAST(MIN(gap_s) AS BIGINT) FROM r
            WHERE 2 * rn >= n) AS p50_s,
           (SELECT CAST(MIN(gap_s) AS BIGINT) FROM r
            WHERE 10 * rn >= 9 * n) AS p90_s,
           (SELECT CAST(MAX(gap_s) AS BIGINT) FROM r) AS max_s
    """,
)
def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X195: funnel stage latency percentiles (view -> first purchase).

    X37's funnel counted who converts and X88 bounded the window; this
    prices HOW LONG conversion takes: per user, first view to first
    subsequent purchase, gaps in integer seconds (epoch-micros
    difference, truncating division — TZ-free), then the lower p50 /
    p90 via ONE histogram-prune pass (the X166 ordered_quantiles
    operator — no rank shuffle of the gap relation) and max from the
    same scan. The SLA twin of X83's order-to-ship latency on the
    event funnel; the oracle keeps the definitional
    (den*rank >= num*n) spelling, so the hash match re-proves the
    pruning on this relation too.
    """
    e = table(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("t_view"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .where(F.unix_micros("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("t_purch"))
    )
    gaps = v.join(p, "user_id").select(
        F.expr("(t_purch - t_view) DIV 1000000").alias("gap_s")
    )
    # both percentiles in ONE histogram-prune pass (ordered_quantiles —
    # the q_weighted_median/X166 operator) instead of a hand-rolled
    # rank selection over a range-shuffled cumulative
    from laser_hadoop_spark.operators.cumulative import ordered_quantiles

    qs = ordered_quantiles(
        gaps, value_col="gap_s", quantiles=[(1, 2), (9, 10)]
    )
    pivoted = (
        qs.groupBy()
        .pivot("q_num", [1, 9])
        .agg(F.min("quantile_value"))
        .select(F.col("`1`").alias("p50_s"), F.col("`9`").alias("p90_s"))
    )
    n_row = gaps.agg(
        F.count("*").alias("n"), F.max("gap_s").alias("max_s")
    )
    return n_row.crossJoin(pivoted).select(
        F.col("n").cast("bigint").alias("n_converted"),
        F.col("p50_s").cast("bigint").alias("p50_s"),
        F.col("p90_s").cast("bigint").alias("p90_s"),
        F.col("max_s").cast("bigint").alias("max_s"),
    )
