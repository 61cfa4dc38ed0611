"""Round-4 widening queries, seventh batch (SURVEY.md §2.12, X152-X156).

Forecast-eval and data-selection shapes: a 7-day rolling lower median
spelled as a calendar-bounded range self-join (order statistics in
frames without any global window), seasonal-naive forecast accuracy
(MAE/WMAPE) as pure integer report columns, a decile calibration
(reliability) table reusing X118's closed-form ntile over the two-pass
global rank, DSIR-style importance weights for targeted pretraining
data selection, and token-class mutual information for hashed-feature
selection — the last two in the same micro-fixed-point log10
discipline as the Naive Bayes stack (X72/X73).

Cross-engine discipline unchanged: integer centi/micro/bp fixed
points, per-cell log10 micro-rounded BEFORE any aggregation, DIV ==
//, identical aliases both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table


def _centi(col: str) -> F.Column:
    return F.floor(F.col(col) * 100 + F.lit(0.5)).cast("bigint")


@register(
    "q_rolling_median",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev
        FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ),
    pairs AS (
        SELECT a.day AS day, b.rev AS rev
        FROM daily a JOIN daily b ON b.day BETWEEN a.day - 6 AND a.day
    ),
    ranked AS (
        SELECT day, rev,
               ROW_NUMBER() OVER (PARTITION BY day ORDER BY rev) AS rn,
               COUNT(*) OVER (PARTITION BY day) AS n
        FROM pairs
    )
    SELECT day, CAST(n AS BIGINT) AS n_days,
           CAST(rev AS BIGINT) AS med_centi
    FROM ranked WHERE rn = (n + 1) // 2
    """,
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X152: 7-day rolling lower median of daily revenue.

    Order statistics inside a sliding frame — the robust smoother a
    mean-based rolling average (X31) can't give. No window-frame
    median exists in either engine, so the frame is materialized as a
    date-range self-join over the DAILY AGGREGATE (calendar-bounded:
    |days| x 7 rows regardless of fact cardinality — the X53/X145
    scale pattern) and the lower median is the (n+1) DIV 2 order
    statistic per day, deterministic over the value multiset. Ranking
    windows partition by day; the only fact-table work is one
    date-keyed aggregate.
    """
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.sum(_centi("o_totalprice")).alias("rev"))
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("b.day") >= F.date_sub(F.col("a.day"), 6))
        & (F.col("b.day") <= F.col("a.day")),
    ).select(F.col("a.day").alias("day"), F.col("b.rev").alias("rev"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("day").orderBy("rev")
    ranked = pairs.select(
        "day",
        "rev",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("day")).alias("n"),
    )
    return ranked.where(F.col("rn") == F.expr("(n + 1) DIV 2")).select(
        "day",
        F.col("n").cast("bigint").alias("n_days"),
        F.col("rev").cast("bigint").alias("med_centi"),
    )


@register(
    "q_forecast_accuracy",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS rev
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    joined AS (
        SELECT a.event_type, ABS(a.rev - f.rev) AS abs_err, a.rev AS actual
        FROM daily a JOIN daily f
          ON f.event_type = a.event_type AND f.day = a.day - 7
    )
    SELECT event_type, COUNT(*) AS n_days,
           CAST(SUM(abs_err) // COUNT(*) AS BIGINT) AS mae_centi,
           CAST(10000 * SUM(abs_err) // SUM(actual) AS BIGINT) AS wmape_bp
    FROM joined GROUP BY event_type
    """,
)
def q_forecast_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X153: seasonal-naive forecast accuracy (MAE + weighted MAPE).

    The baseline every forecasting model must beat: predict each day's
    revenue as the value 7 days earlier, then score it. MAE in exact
    centi-units and WMAPE in basis points — WMAPE (sum|err|/sum
    actual) deliberately replaces per-day MAPE so there is exactly ONE
    truncating division per group and no per-day ratio instability.
    Plan: one date-keyed aggregate of the fact table, a self-join on
    the tiny daily relation shifted by 7 days, one final aggregate —
    the evaluation harness for X112's EWMA or X145's trend as
    forecasters.
    """
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(_centi("value")).alias("rev"))
    a, f_ = daily.alias("a"), daily.alias("f")
    joined = a.join(
        f_,
        (F.col("f.event_type") == F.col("a.event_type"))
        & (F.col("f.day") == F.date_sub(F.col("a.day"), 7)),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.abs(F.col("a.rev") - F.col("f.rev")).alias("abs_err"),
        F.col("a.rev").alias("actual"),
    )
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.expr("CAST(SUM(abs_err) DIV COUNT(*) AS BIGINT)").alias("mae_centi"),
        F.expr("CAST(10000 * SUM(abs_err) DIV SUM(actual) AS BIGINT)").alias(
            "wmape_bp"
        ),
    )


@register(
    "q_calibration_bins",
    oracle="""
    WITH v AS (
        SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS score,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
               NTILE(10) OVER (ORDER BY CAST(FLOOR(value * 100 + 0.5)
                                             AS BIGINT), event_id) AS bin
        FROM events
    )
    SELECT CAST(bin AS INT) AS bin, COUNT(*) AS n,
           CAST(SUM(label) AS BIGINT) AS n_pos,
           CAST(10000 * SUM(label) // COUNT(*) AS BIGINT) AS pos_rate_bp,
           CAST(MIN(score) AS BIGINT) AS lo_centi,
           CAST(MAX(score) AS BIGINT) AS hi_centi
    FROM v GROUP BY bin
    """,
)
def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X154: calibration / reliability table over score deciles.

    The thresholded companion to X150's AUC: bucket the score axis
    into ten equal-count bins and report the observed positive rate
    per bin — the data behind a reliability diagram (and the lift/gain
    table marketers read). Bins reuse X118's closed-form ntile over
    the two-pass global rank (q = n DIV 10, r = n % 10 remainder
    arithmetic), so the fact-table ranking has no single-partition
    window; the oracle keeps DuckDB's NTILE spelling and hash equality
    proves the closed form again on a different relation.
    """
    from laser_hadoop_spark.operators.cumulative import (
        closed_form_ntile,
        ordered_cumsum,
    )

    e = table(spark, sf_dir, "events")
    v = e.select(
        _centi("value").alias("score"),
        (F.col("event_type") == "purchase").cast("bigint").alias("label"),
        "event_id",
    )
    ranked = ordered_cumsum(
        v, order_by=["score", "event_id"], row_number_col="rn"
    )
    n_row = v.agg(F.count("*").alias("n"))
    bin_ = closed_form_ntile()
    return (
        ranked.crossJoin(F.broadcast(n_row))
        .select("score", "label", bin_.cast("int").alias("bin"))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.sum("label").cast("bigint").alias("n_pos"),
            F.expr("CAST(10000 * SUM(label) DIV COUNT(*) AS BIGINT)").alias(
                "pos_rate_bp"
            ),
            F.min("score").cast("bigint").alias("lo_centi"),
            F.max("score").cast("bigint").alias("hi_centi"),
        )
    )


_DSIR_TOKS = """
    toks AS (
        SELECT doc_id, lang,
               CAST(CAST(('0x' || substring(md5(UNNEST(string_split(text, ' '))), 1, 15))
                    AS BIGINT) % 256 AS INT) AS bucket
        FROM documents
    )
"""


@register(
    "q_dsir_weights",
    oracle="WITH "
    + _DSIR_TOKS
    + """,
    tagged AS (
        SELECT doc_id, bucket,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_t
        FROM toks
    ),
    tot AS (
        SELECT SUM(is_t) AS n_t, SUM(1 - is_t) AS n_b FROM tagged
    ),
    counts AS (
        SELECT bucket, SUM(is_t) AS c_t, SUM(1 - is_t) AS c_b
        FROM tagged GROUP BY bucket
    ),
    delta AS (
        SELECT bucket,
               CAST(ROUND(LOG10(CAST(c_t + 1 AS DOUBLE) / (t.n_t + 256))
                          * 1000000) AS BIGINT)
               - CAST(ROUND(LOG10(CAST(c_b + 1 AS DOUBLE) / (t.n_b + 256))
                            * 1000000) AS BIGINT) AS delta_micro
        FROM counts CROSS JOIN tot t
    )
    SELECT g.doc_id, COUNT(*) AS n_tokens,
           CAST(SUM(d.delta_micro) AS BIGINT) AS dsir_micro
    FROM tagged g JOIN delta d ON d.bucket = g.bucket
    GROUP BY g.doc_id
    """,
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X155: DSIR-style importance weights for data selection.

    Data Selection via Importance Resampling (Xie et al. 2023, public
    method): score every document by the hashed-n-gram log-likelihood
    ratio log p_target(doc) - log p_background(doc), here with unigram
    features over the 256-bucket md5 feature space (X71's hashing
    trick), target = English corpus slice, background = the rest.
    Documents scoring high read like the target distribution and win
    the sampling lottery (X13's quota sampler consumes the weights).
    Exactness: both smoothed bucket log10-likelihoods micro-round
    BEFORE the per-doc sum (X72's discipline), so each doc's weight is
    a pure bigint dot product. Plan: two scalar totals, one 256-row
    broadcast delta table, one token-bucket aggregate per doc — no
    vocabulary state, one fact-table shuffle.
    """
    d = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("token")), 1, 15), 16, 10).cast("bigint")
        % 256
    ).cast("int")
    tagged = d.select(
        "doc_id",
        (F.col("lang") == "en").cast("bigint").alias("is_t"),
        F.explode(F.split("text", " ")).alias("token"),
    ).select("doc_id", "is_t", bucket.alias("bucket"))
    tot = tagged.agg(
        F.sum("is_t").alias("n_t"), F.sum(1 - F.col("is_t")).alias("n_b")
    )
    counts = tagged.groupBy("bucket").agg(
        F.sum("is_t").alias("c_t"), F.sum(1 - F.col("is_t")).alias("c_b")
    )
    micro = lambda num, den: F.round(  # noqa: E731
        F.log10(num.cast("double") / den) * 1_000_000
    ).cast("bigint")
    delta = counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            micro(F.col("c_t") + 1, F.col("n_t") + 256)
            - micro(F.col("c_b") + 1, F.col("n_b") + 256)
        ).alias("delta_micro"),
    )
    return (
        tagged.join(F.broadcast(delta), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("delta_micro").cast("bigint").alias("dsir_micro"),
        )
    )


@register(
    "q_mutual_info",
    oracle="WITH "
    + _DSIR_TOKS.replace("doc_id, lang,", "lang,")
    + """,
    n_tot AS (SELECT COUNT(*) AS n FROM toks),
    xy AS (SELECT lang, bucket, COUNT(*) AS n_xy FROM toks GROUP BY lang, bucket),
    x AS (SELECT lang, COUNT(*) AS n_x FROM toks GROUP BY lang),
    y AS (SELECT bucket, COUNT(*) AS n_y FROM toks GROUP BY bucket),
    cells AS (
        SELECT xy.bucket,
               xy.n_xy * CAST(ROUND(LOG10(CAST(t.n AS DOUBLE) * xy.n_xy
                                          / (x.n_x * y.n_y))
                                    * 1000000) AS BIGINT) AS term
        FROM xy
        JOIN x ON x.lang = xy.lang
        JOIN y ON y.bucket = xy.bucket
        CROSS JOIN n_tot t
    )
    SELECT bucket, CAST(SUM(term) // (SELECT n FROM n_tot) AS BIGINT)
               AS mi_micro
    FROM cells GROUP BY bucket
    """,
)
def q_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X156: token-bucket <-> language mutual information.

    Feature selection for the hashed-feature stack (X71/X72/X155):
    how much knowing a token's 256-space bucket tells you about the
    document language, as the per-bucket contribution to I(bucket;
    lang) = sum p(x,y) log(p(x,y)/(p(x)p(y))). The X108/X109 exactness
    pattern: every log argument is an exact integer ratio (N*n_xy /
    (n_x*n_y)), each cell's log10 micro-rounds to a bigint, cells are
    weighted by the integer count n_xy, and the single division by N
    truncates identically on both engines. Plan: three counting
    aggregates off one exploded scan (lang cardinality ~5, buckets
    256 — the joins are broadcasts), cells relation <= 5*256 rows.
    """
    d = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("token")), 1, 15), 16, 10).cast("bigint")
        % 256
    ).cast("int")
    toks = d.select(
        "lang", F.explode(F.split("text", " ")).alias("token")
    ).select("lang", bucket.alias("bucket"))
    n_tot = toks.agg(F.count("*").alias("n"))
    xy = toks.groupBy("lang", "bucket").agg(F.count("*").alias("n_xy"))
    x = toks.groupBy("lang").agg(F.count("*").alias("n_x"))
    y = toks.groupBy("bucket").agg(F.count("*").alias("n_y"))
    term = (
        F.col("n_xy")
        * F.round(
            F.log10(
                F.col("n").cast("double")
                * F.col("n_xy")
                / (F.col("n_x") * F.col("n_y"))
            )
            * 1_000_000
        ).cast("bigint")
    ).alias("term")
    cells = (
        xy.join(F.broadcast(x), "lang")
        .join(F.broadcast(y), "bucket")
        .crossJoin(F.broadcast(n_tot))
        .select("bucket", "n", term)
    )
    return cells.groupBy("bucket").agg(
        F.expr("CAST(SUM(term) DIV MIN(n) AS BIGINT)").alias("mi_micro")
    )
