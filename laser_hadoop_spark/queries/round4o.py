"""Round-4 widening queries, fifteenth batch (SURVEY.md §2.12,
X184-X187).

Gaps-and-islands, mean-family, and cross-source audit shapes: the
longest consecutive-day purchase streak per user (the classic islands
interview problem as one partitioned-window pass), geometric and
harmonic means made hash-exact with the per-element micro-rounding
discipline, a rolling 7-day modal event type (order statistics meet
sliding frames), and a cross-source n-gram overlap audit (shared
phrasing between sources — the boilerplate/mirror leakage the
within-corpus dedup reports don't isolate).

Cross-engine discipline: date arithmetic on DATE values only, one
log10/reciprocal per VALUE micro-rounded before aggregation, mode
ties broken (count DESC, value), md5 fingerprints for dedup keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table


@register(
    "q_longest_streak",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        FROM events WHERE event_type = 'purchase'
    ),
    grp AS (
        SELECT user_id, day,
               day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                             ORDER BY day) AS INT) AS g
        FROM days
    ),
    streaks AS (
        SELECT user_id, COUNT(*) AS len,
               MIN(day) AS streak_start
        FROM grp GROUP BY user_id, g
    ),
    best AS (
        SELECT user_id, len, streak_start,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY len DESC, streak_start) AS rn
        FROM streaks
    )
    SELECT user_id, CAST(len AS BIGINT) AS longest_streak_days,
           streak_start
    FROM best WHERE rn = 1
    """,
)
def q_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X184: longest consecutive-day purchase streak per user.

    The canonical gaps-and-islands trick: on a user's DEDUPED purchase
    days, day - row_number() is constant exactly within a run of
    consecutive dates, so one partitioned window + one aggregate finds
    every streak; ties on length break to the earliest start. All
    windows partition by user_id (X103's run-length machinery on the
    date axis); the only fact-table work is the distinct user-day
    projection. Date-minus-integer arithmetic stays in the DATE
    domain on both engines — no timestamps, no TZ exposure.
    """
    e = table(spark, sf_dir, "events")
    days = (
        e.where(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    grp = days.select(
        "user_id",
        "day",
        F.date_sub(F.col("day"), F.row_number().over(w)).alias("g"),
    )
    streaks = grp.groupBy("user_id", "g").agg(
        F.count("*").alias("len"), F.min("day").alias("streak_start")
    )
    bw = Window.partitionBy("user_id").orderBy(
        F.col("len").desc(), F.col("streak_start")
    )
    return (
        streaks.withColumn("rn", F.row_number().over(bw))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("len").cast("bigint").alias("longest_streak_days"),
            "streak_start",
        )
    )


@register(
    "q_mean_family",
    oracle="""
    WITH v AS (
        SELECT o_orderpriority AS priority,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS centi
        FROM orders WHERE FLOOR(o_totalprice * 100 + 0.5) >= 1
    ),
    m AS (
        SELECT priority,
               CAST(centi AS BIGINT) AS centi,
               CAST(ROUND(LOG10(CAST(centi AS DOUBLE)) * 1000000) AS BIGINT)
                   AS log_micro,
               CAST(ROUND(1e12 / centi) AS BIGINT) AS inv_pico
        FROM v
    )
    SELECT priority, COUNT(*) AS n,
           CAST(SUM(centi) // COUNT(*) AS BIGINT) AS arith_centi,
           CAST(SUM(log_micro) // COUNT(*) AS BIGINT) AS mean_log_micro,
           CAST(SUM(inv_pico) AS BIGINT) AS sum_inv_pico,
           ROUND(POW(10, CAST(SUM(log_micro) // COUNT(*) AS DOUBLE)
                         / 1000000) / 100, 2) AS geo_mean_dollars,
           ROUND(CAST(COUNT(*) AS DOUBLE) * 1e12
                 / CAST(SUM(inv_pico) AS DOUBLE) / 100, 2)
               AS harm_mean_dollars
    FROM m GROUP BY priority
    """,
)
def q_mean_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X185: geometric + harmonic means, hash-exact to the last step.

    The mean family beyond the arithmetic (AM >= GM >= HM — a free
    sanity ordering in the output): per-value log10 and reciprocal are
    each micro/pico-rounded to integers BEFORE any aggregation (the
    q_text_lm_score discipline — float summation order can never
    differ because only integers are summed); the hash-pinned columns
    are those integer sums, and the two human-readable dollar means
    take one POW/division step each from identical integer inputs.
    Geometric mean prices the typical order under multiplicative
    spread; harmonic prices average-rate problems. Scan-local
    projections + one aggregate.
    """
    o = table(spark, sf_dir, "orders")
    centi = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    # guard on the FIXED-POINT domain (centi >= 1), not the raw float:
    # a price in (0, 0.005) floors to centi 0 — LOG10(0) aborts DuckDB
    # while Spark NULLs, an engine divergence
    m = o.where(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)) >= 1
    ).select(
        F.col("o_orderpriority").alias("priority"),
        centi.alias("centi"),
        F.round(F.log10(centi.cast("double")) * 1_000_000)
        .cast("bigint")
        .alias("log_micro"),
        F.round(F.lit(1e12) / centi).cast("bigint").alias("inv_pico"),
    )
    return m.groupBy("priority").agg(
        F.count("*").alias("n"),
        F.expr("CAST(SUM(centi) DIV COUNT(*) AS BIGINT)").alias(
            "arith_centi"
        ),
        F.expr("CAST(SUM(log_micro) DIV COUNT(*) AS BIGINT)").alias(
            "mean_log_micro"
        ),
        F.sum("inv_pico").cast("bigint").alias("sum_inv_pico"),
        F.round(
            F.pow(
                F.lit(10.0),
                F.expr("CAST(SUM(log_micro) DIV COUNT(*) AS DOUBLE)")
                / 1_000_000,
            )
            / 100,
            2,
        ).alias("geo_mean_dollars"),
        F.round(
            F.count("*").cast("double")
            * 1e12
            / F.sum("inv_pico").cast("double")
            / 100,
            2,
        ).alias("harm_mean_dollars"),
    )


@register(
    "q_rolling_mode",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS c
        FROM events GROUP BY CAST(ts AS DATE), event_type
    ),
    frames AS (
        SELECT a.day, b.event_type, SUM(b.c) AS c7
        FROM (SELECT DISTINCT day FROM daily) a
        JOIN daily b ON b.day BETWEEN a.day - 6 AND a.day
        GROUP BY a.day, b.event_type
    ),
    ranked AS (
        SELECT day, event_type, c7,
               ROW_NUMBER() OVER (PARTITION BY day
                                  ORDER BY c7 DESC, event_type) AS rn
        FROM frames
    )
    SELECT day, event_type AS mode_type, CAST(c7 AS BIGINT) AS n_events
    FROM ranked WHERE rn = 1
    """,
)
def q_rolling_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X186: rolling 7-day modal event type.

    Order statistics meet sliding frames (X152's rolling median found
    the middle VALUE; this finds the most frequent CATEGORY): per day,
    the event type with the highest trailing-7-day count, ties broken
    (count DESC, type) — X107's mode discipline inside a window. The
    frame materializes as the calendar-bounded date-range join over
    the DAILY per-type aggregate (|days| x 7 x |types| rows, never
    fact-scale); partial windows included by construction.
    """
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count("*").alias("c"))
    spine = daily.select("day").distinct()
    b = daily.select(
        F.col("day").alias("bday"), "event_type", "c"
    )
    frames = (
        spine.join(
            b,
            (F.col("bday") >= F.date_sub(F.col("day"), 6))
            & (F.col("bday") <= F.col("day")),
        )
        .groupBy("day", "event_type")
        .agg(F.sum("c").alias("c7"))
    )
    w = Window.partitionBy("day").orderBy(
        F.col("c7").desc(), F.col("event_type")
    )
    return (
        frames.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "day",
            F.col("event_type").alias("mode_type"),
            F.col("c7").cast("bigint").alias("n_events"),
        )
    )


@register(
    "q_cross_source_dupes",
    oracle="""
    WITH toks AS (
        SELECT source, string_split(text, ' ') AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT source,
               md5(UNNEST(list_transform(generate_series(1, len(t) - 2),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS h
        FROM toks WHERE len(t) >= 3
    ),
    per_n AS (SELECT source, COUNT(*) AS n_sh FROM sh GROUP BY source),
    pairs AS (
        SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS shared
        FROM sh a JOIN sh b ON b.h = a.h AND b.source > a.source
        GROUP BY a.source, b.source
    )
    SELECT p.src_a, p.src_b, CAST(p.shared AS BIGINT) AS n_shared_shingles,
           CAST(10000 * p.shared // LEAST(na.n_sh, nb.n_sh) AS BIGINT)
               AS containment_bp
    FROM pairs p
    JOIN per_n na ON na.source = p.src_a
    JOIN per_n nb ON nb.source = p.src_b
    """,
)
def q_cross_source_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X187: cross-source n-gram overlap audit (boilerplate leakage).

    Which SOURCE PAIRS share 3-gram shingles — the mirror-site /
    shared-template signal that within-corpus dedup totals (L1) and
    per-source quality profiles (X169) both hide (this corpus has zero
    exact cross-source duplicates, but plenty of shared phrasing — the
    realistic case). Shingles dedup to the (source, digest) level
    SCAN-LOCALLY (array_distinct before explode, the X147 lesson),
    the pair join keys on 16-byte digests with fanout bounded by
    sources-per-shingle^2 (|sources| = 20 here; at extreme source
    counts the X69 rare-token prefix filter applies), and the
    containment share normalizes by the smaller side's shingle
    vocabulary, exact bp.
    """
    d = table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    sh = (
        d.select("source", "text")
        .repartition(d.sparkSession.sparkContext.defaultParallelism)
        .where(F.size(t) >= 3)
        .select(
            "source",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(0), F.size(t) - 3),
                        lambda i: F.md5(
                            F.concat_ws(
                                " ",
                                F.element_at(t, i + 1),
                                F.element_at(t, i + 2),
                                F.element_at(t, i + 3),
                            )
                        ),
                    )
                )
            ).alias("h"),
        )
        .distinct()
        # pinned: consumed three times (per_n + both self-join sides) —
        # without the pin the explode+md5+distinct recomputes per
        # subtree (the q_binary_segmentation multi-consumer discipline)
        .localCheckpoint(eager=False)
    )
    per_n = sh.groupBy("source").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("b.h") == F.col("a.h"))
            & (F.col("b.source") > F.col("a.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count("*").alias("shared"))
    )
    na = per_n.select(F.col("source").alias("src_a"), F.col("n_sh").alias("na"))
    nb = per_n.select(F.col("source").alias("src_b"), F.col("n_sh").alias("nb"))
    return (
        pairs.join(F.broadcast(na), "src_a")
        .join(F.broadcast(nb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("shared").cast("bigint").alias("n_shared_shingles"),
            F.expr(
                "CAST(10000 * shared DIV LEAST(na, nb) AS BIGINT)"
            ).alias("containment_bp"),
        )
    )
