"""Round-4 widening queries, twelfth batch (SURVEY.md §2.12, X171-X174).

Calendar-aware SLA math, the ML-eval completion, a data-governance
audit, and distribution shape beyond variance: business-day latency
via a closed-form weekday count (no calendar explode), per-class
precision/recall/F1 in exact bp from X73's confusion matrix,
k-anonymity risk counts over a quasi-identifier tuple, and exact
central-moment numerators (skewness/kurtosis) with every denominator
cleared into DECIMAL(38).

Cross-engine discipline: weekday numbering pinned via the X86
convention, ratios in truncating bp, cube/quartic power sums in
DECIMAL(38)/HUGEINT with documented domain bounds, one rounded float
per shape statistic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table


@register(
    "q_business_days",
    oracle="""
    WITH pairs AS (
        SELECT o.o_orderpriority AS priority,
               CAST(o.o_orderdate AS DATE) AS d0,
               CAST(l.l_shipdate AS DATE) AS d1
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE)
    ),
    bd AS (
        SELECT priority,
               date_diff('day', d0, d1) AS cal_days,
               -- f(d) = weekdays in (anchor_monday, d]; biz = f(d1)-f(d0)
               ((date_diff('day', DATE '1970-01-05', d1) // 7) * 5
                + LEAST(date_diff('day', DATE '1970-01-05', d1) % 7 + 1, 5))
               - ((date_diff('day', DATE '1970-01-05', d0) // 7) * 5
                  + LEAST(date_diff('day', DATE '1970-01-05', d0) % 7 + 1, 5))
                   AS biz_days
        FROM pairs
    )
    SELECT priority, COUNT(*) AS n_lines,
           CAST(SUM(cal_days) AS BIGINT) AS cal_day_sum,
           CAST(SUM(biz_days) AS BIGINT) AS biz_day_sum,
           CAST(10000 * SUM(biz_days) // SUM(cal_days) AS BIGINT)
               AS biz_share_bp
    FROM bd GROUP BY priority
    """,
)
def q_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X171: order-to-ship latency in business days (closed form).

    SLA latency that skips weekends — computed with PURE weekday
    arithmetic, never by exploding a calendar spine per row (at 100 TB
    a per-row 0..cal_days explode is a self-DoS). The closed form is
    an anchored prefix function: f(d) = weekdays since a fixed Monday
    (1970-01-05) = (z DIV 7)*5 + LEAST(z%7 + 1, 5) with z =
    datediff(d, anchor); business days in (d0, d1] = f(d1) - f(d0) —
    property-verified against the day-by-day walk for 2000 random
    spans. All-positive z keeps DIV/% truncation identical on both
    engines. The aggregate reports calendar vs business day mass per
    priority with the exact bp share.
    """
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("d1")
    )
    pairs = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .where(F.col("d1") >= F.col("o_orderdate").cast("date"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").cast("date").alias("d0"),
            "d1",
        )
    )

    def f(d: str):
        z = F.datediff(F.col(d), F.lit("1970-01-05").cast("date"))
        return F.expr(
            f"CAST(datediff({d}, DATE '1970-01-05') DIV 7 AS BIGINT) * 5"
        ) + F.least(z % 7 + 1, F.lit(5)).cast("bigint")

    bd = pairs.select(
        "priority",
        F.datediff("d1", "d0").cast("bigint").alias("cal_days"),
        (f("d1") - f("d0")).alias("biz_days"),
    )
    return bd.groupBy("priority").agg(
        F.count("*").alias("n_lines"),
        F.sum("cal_days").cast("bigint").alias("cal_day_sum"),
        F.sum("biz_days").cast("bigint").alias("biz_day_sum"),
        F.expr(
            "CAST(10000 * SUM(biz_days) DIV SUM(cal_days) AS BIGINT)"
        ).alias("biz_share_bp"),
    )


@register(
    "q_f1_scores",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang,
               CAST(CAST(('0x' || substring(md5(UNNEST(string_split(text, ' '))), 1, 15))
                    AS BIGINT) % 64 AS INT) AS bucket
        FROM documents
    ),
    class_tot AS (
        SELECT lang, COUNT(*) AS n_class FROM toks GROUP BY lang
    ),
    n_docs AS (SELECT COUNT(*) AS nd FROM documents),
    feat AS (
        SELECT lang, bucket, COUNT(*) AS n FROM toks GROUP BY lang, bucket
    ),
    grid AS (
        SELECT c.lang, b.bucket, c.n_class, COALESCE(f.n, 0) AS n
        FROM class_tot c
        CROSS JOIN (SELECT DISTINCT bucket FROM toks) b
        LEFT JOIN feat f ON f.lang = c.lang AND f.bucket = b.bucket
    ),
    model AS (
        SELECT lang, bucket,
               CAST(ROUND(LOG10(CAST(n + 1 AS DOUBLE) / (n_class + 64))
                          * 1000000) AS BIGINT) AS loglik_micro
        FROM grid
    ),
    prior AS (
        SELECT t.lang,
               CAST(ROUND(LOG10(CAST(COUNT(DISTINCT x.doc_id) AS DOUBLE)
                                / MIN(d.nd)) * 1000000) AS BIGINT)
                   AS prior_micro
        FROM class_tot t
        JOIN toks x ON x.lang = t.lang
        CROSS JOIN n_docs d
        GROUP BY t.lang
    ),
    doc_feat AS (
        SELECT doc_id, lang AS true_lang, bucket, COUNT(*) AS tf
        FROM toks GROUP BY doc_id, lang, bucket
    ),
    scores AS (
        SELECT d.doc_id, d.true_lang, m.lang AS cand,
               MIN(p.prior_micro) + SUM(d.tf * m.loglik_micro) AS score
        FROM doc_feat d
        JOIN model m ON m.bucket = d.bucket
        JOIN prior p ON p.lang = m.lang
        GROUP BY d.doc_id, d.true_lang, m.lang
    ),
    pred AS (
        SELECT doc_id, true_lang, cand AS pred_lang,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, cand) AS rn
        FROM scores
    ),
    cm AS (
        SELECT true_lang, pred_lang, COUNT(*) AS n
        FROM pred WHERE rn = 1 GROUP BY true_lang, pred_lang
    ),
    classes AS (SELECT DISTINCT lang FROM class_tot),
    stats AS (
        SELECT c.lang,
               COALESCE((SELECT SUM(n) FROM cm
                         WHERE true_lang = c.lang AND pred_lang = c.lang), 0)
                   AS tp,
               COALESCE((SELECT SUM(n) FROM cm WHERE pred_lang = c.lang), 0)
                   AS pred_n,
               COALESCE((SELECT SUM(n) FROM cm WHERE true_lang = c.lang), 0)
                   AS true_n
        FROM classes c
    )
    SELECT lang, CAST(tp AS BIGINT) AS tp,
           CAST(pred_n AS BIGINT) AS n_predicted,
           CAST(true_n AS BIGINT) AS n_actual,
           CAST(CASE WHEN pred_n = 0 THEN 0
                     ELSE 10000 * tp // pred_n END AS BIGINT) AS precision_bp,
           CAST(CASE WHEN true_n = 0 THEN 0
                     ELSE 10000 * tp // true_n END AS BIGINT) AS recall_bp,
           CAST(CASE WHEN pred_n + true_n = 0 THEN 0
                     ELSE 2 * 10000 * tp // (pred_n + true_n) END AS BIGINT)
               AS f1_bp
    FROM stats
    """,
)
def q_f1_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X172: per-class precision/recall/F1 from the NB confusion matrix.

    Completes the eval suite (X73 confusion counts, X150 AUC, X154
    calibration): per language, precision = tp/predicted, recall =
    tp/actual, and F1 spelled in its tp form — F1 = 2tp/(pred+actual)
    — so ALL three ratios are single truncating integer divisions
    into bp (the harmonic mean of two truncated ratios would compound
    rounding; the tp form never divides twice). Reuses X73's scoring
    pipeline verbatim (pure-bigint scores, deterministic argmax); the
    stats relation is |classes| rows.
    """
    toks = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "lang",
            F.explode(F.split("text", " ")).alias("token"),
        )
        .select(
            "doc_id",
            "lang",
            (
                F.conv(F.substring(F.md5("token"), 1, 15), 16, 10).cast(
                    "bigint"
                )
                % 64
            )
            .cast("int")
            .alias("bucket"),
        )
    )
    class_tot = toks.groupBy("lang").agg(F.count("*").alias("n_class"))
    n_docs = table(spark, sf_dir, "documents").agg(
        F.count("*").alias("nd")
    )
    feat = toks.groupBy("lang", "bucket").agg(F.count("*").alias("n"))
    buckets = toks.select("bucket").distinct()
    grid = (
        class_tot.crossJoin(buckets)
        .join(feat, ["lang", "bucket"], "left")
        .select(
            "lang",
            "bucket",
            "n_class",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        )
    )
    model = grid.select(
        "lang",
        "bucket",
        F.round(
            F.log10(
                (F.col("n") + 1).cast("double") / (F.col("n_class") + 64)
            )
            * 1_000_000
        )
        .cast("bigint")
        .alias("loglik_micro"),
    )
    prior = (
        toks.groupBy("lang")
        .agg(F.count_distinct("doc_id").alias("nd_class"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "lang",
            F.round(
                F.log10(F.col("nd_class").cast("double") / F.col("nd"))
                * 1_000_000
            )
            .cast("bigint")
            .alias("prior_micro"),
        )
    )
    doc_feat = toks.groupBy(
        "doc_id", F.col("lang").alias("true_lang"), "bucket"
    ).agg(F.count("*").alias("tf"))
    scores = (
        doc_feat.join(
            F.broadcast(model.select(F.col("lang").alias("cand"), "bucket", "loglik_micro")),
            "bucket",
        )
        .join(F.broadcast(prior.select(F.col("lang").alias("cand"), "prior_micro")), "cand")
        .groupBy("doc_id", "true_lang", "cand")
        .agg(
            (
                F.min("prior_micro")
                + F.sum(F.col("tf") * F.col("loglik_micro"))
            ).alias("score")
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("cand")
    )
    cm = (
        scores.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .groupBy("true_lang", F.col("cand").alias("pred_lang"))
        .agg(F.count("*").alias("n"))
    )
    classes = class_tot.select("lang")
    tp = cm.where(F.col("true_lang") == F.col("pred_lang")).select(
        F.col("true_lang").alias("lang"), F.col("n").alias("tp")
    )
    pred_n = cm.groupBy(F.col("pred_lang").alias("lang")).agg(
        F.sum("n").alias("pred_n")
    )
    true_n = cm.groupBy(F.col("true_lang").alias("lang")).agg(
        F.sum("n").alias("true_n")
    )
    stats = (
        classes.join(tp, "lang", "left")
        .join(pred_n, "lang", "left")
        .join(true_n, "lang", "left")
        .select(
            "lang",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            F.coalesce("pred_n", F.lit(0)).alias("pred_n"),
            F.coalesce("true_n", F.lit(0)).alias("true_n"),
        )
    )
    return stats.select(
        "lang",
        F.col("tp").cast("bigint").alias("tp"),
        F.col("pred_n").cast("bigint").alias("n_predicted"),
        F.col("true_n").cast("bigint").alias("n_actual"),
        F.expr(
            "CAST(CASE WHEN pred_n = 0 THEN 0"
            " ELSE 10000 * tp DIV pred_n END AS BIGINT)"
        ).alias("precision_bp"),
        F.expr(
            "CAST(CASE WHEN true_n = 0 THEN 0"
            " ELSE 10000 * tp DIV true_n END AS BIGINT)"
        ).alias("recall_bp"),
        F.expr(
            "CAST(CASE WHEN pred_n + true_n = 0 THEN 0"
            " ELSE 2 * 10000 * tp DIV (pred_n + true_n) END AS BIGINT)"
        ).alias("f1_bp"),
    )


@register(
    "q_k_anonymity",
    oracle="""
    WITH qi AS (
        SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
        FROM customer GROUP BY c_nationkey, c_mktsegment
    )
    SELECT COUNT(*) AS n_groups,
           CAST(MIN(n) AS BIGINT) AS min_group_size,
           CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS groups_below_k,
           CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
               AS rows_at_risk,
           CAST(10000 * SUM(CASE WHEN n < 5 THEN n ELSE 0 END)
                // SUM(n) AS BIGINT) AS risk_share_bp
    FROM qi
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X173: k-anonymity audit over a quasi-identifier tuple.

    Data-governance closure: before a table leaves the trust boundary,
    count equivalence classes of the quasi-identifier (nation,
    market segment) smaller than k=5 — each such class's rows are
    re-identifiable by linking on the QI alone (Sweeney's k-anonymity,
    public method). Reports group floor, classes below k, rows at
    risk, and the risk share in exact bp. One counting aggregate +
    one scalar pass; at 100 TB the QI histogram is the same shape as
    the X60/X161 planner inputs — governance and planning read the
    same sketch.
    """
    c = table(spark, sf_dir, "customer")
    qi = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("n")
    )
    return qi.agg(
        F.count("*").alias("n_groups"),
        F.min("n").cast("bigint").alias("min_group_size"),
        F.sum(F.when(F.col("n") < 5, 1).otherwise(0))
        .cast("bigint")
        .alias("groups_below_k"),
        F.sum(F.when(F.col("n") < 5, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("rows_at_risk"),
        F.expr(
            "CAST(10000 * SUM(CASE WHEN n < 5 THEN n ELSE 0 END)"
            " DIV SUM(n) AS BIGINT)"
        ).alias("risk_share_bp"),
    )


@register(
    "q_higher_moments",
    oracle="""
    WITH v AS (
        SELECT o_orderpriority AS priority,
               CAST(FLOOR(o_totalprice) AS BIGINT) AS x
        FROM orders
    ),
    mu AS (
        SELECT priority, SUM(x) // COUNT(*) AS mu0 FROM v GROUP BY priority
    ),
    d AS (
        SELECT v.priority, v.x - m.mu0 AS dx
        FROM v JOIN mu m ON m.priority = v.priority
    ),
    s AS (
        SELECT priority, COUNT(*) AS n, SUM(dx) AS d1,
               SUM(CAST(dx AS HUGEINT) * dx) AS d2,
               SUM(CAST(dx AS HUGEINT) * dx * dx) AS d3,
               SUM(CAST(dx AS HUGEINT) * dx * dx * dx) AS d4
        FROM d GROUP BY priority
    ),
    f AS (
        SELECT priority, n, d1, d2, d3, d4,
               CAST(n AS DOUBLE) AS nd, CAST(d1 AS DOUBLE) AS dd1,
               CAST(d2 AS DOUBLE) AS dd2, CAST(d3 AS DOUBLE) AS dd3,
               CAST(d4 AS DOUBLE) AS dd4
        FROM s
    )
    SELECT priority, CAST(n AS BIGINT) AS n,
           CAST(d1 AS BIGINT) AS d1,
           CAST(d2 AS VARCHAR) AS d2, CAST(d3 AS VARCHAR) AS d3,
           CAST(d4 AS VARCHAR) AS d4,
           ROUND((nd * dd3 * nd - 3 * nd * dd1 * dd2
                  + 2 * dd1 * dd1 * dd1)
                 / POW(nd * dd2 - dd1 * dd1, 1.5), 6) AS skewness,
           ROUND((nd * nd * nd * dd4 - 4 * nd * nd * dd1 * dd3
                  + 6 * nd * dd1 * dd1 * dd2 - 3 * dd1 * dd1 * dd1 * dd1)
                 / ((nd * dd2 - dd1 * dd1) * (nd * dd2 - dd1 * dd1)) - 3, 6)
               AS excess_kurtosis
    FROM f
    """,
)
def q_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X174: exact higher-moment sums per group + skewness/kurtosis.

    Distribution shape beyond X52's variance, with the overflow done
    RIGHT: raw power sums explode (n^3 * sum(x^4) passes DECIMAL(38)
    around bench scale), so values are first SHIFTED by the per-group
    integer mean mu0 = s1 DIV n — central moments are shift-invariant,
    and the centered power sums d1..d4 are orders of magnitude
    smaller (d4 ~ n * spread^4, exact in DECIMAL(38)/HUGEINT through
    ~sf100). Those four sums are the hash-pinned exact artifacts
    (d2..d4 as strings — beyond int64 by design). The huge binomial
    combinations m3n3 = n^2 d3 - 3n d1 d2 + 2 d1^3 and m4n4 = n^3 d4
    - ... are NOT materialized as integers; skewness = m3n3/m2n2^1.5
    and excess kurtosis = m4n4/m2n2^2 - 3 (numpy-verified algebra)
    evaluate in DOUBLE with the identical left-associated expression
    text on both engines — same IEEE ops over bit-identical integer
    inputs, rounded to 6. Two passes (mean, then moments), both
    map-side aggregates; the mean join is a 5-row broadcast.
    """
    o = table(spark, sf_dir, "orders")
    x = F.floor(F.col("o_totalprice")).cast("bigint")
    v = o.select(F.col("o_orderpriority").alias("priority"), x.alias("x"))
    mu = v.groupBy("priority").agg(
        F.expr("SUM(x) DIV COUNT(*)").alias("mu0")
    )
    d = v.join(F.broadcast(mu), "priority").select(
        "priority", (F.col("x") - F.col("mu0")).alias("dx")
    )
    ddx = F.col("dx").cast("decimal(38,0)")
    s = d.groupBy("priority").agg(
        F.count("*").alias("n"),
        F.sum("dx").alias("d1"),
        F.sum(ddx * F.col("dx")).alias("d2"),
        F.sum(ddx * F.col("dx") * F.col("dx")).alias("d3"),
        F.sum(ddx * F.col("dx") * F.col("dx") * F.col("dx")).alias("d4"),
    )
    f = s.select(
        "priority",
        "n",
        "d1",
        "d2",
        "d3",
        "d4",
        F.col("n").cast("double").alias("nd"),
        F.col("d1").cast("double").alias("dd1"),
        F.col("d2").cast("double").alias("dd2"),
        F.col("d3").cast("double").alias("dd3"),
        F.col("d4").cast("double").alias("dd4"),
    )
    return f.select(
        "priority",
        F.col("n").cast("bigint").alias("n"),
        F.col("d1").cast("bigint").alias("d1"),
        F.col("d2").cast("string").alias("d2"),
        F.col("d3").cast("string").alias("d3"),
        F.col("d4").cast("string").alias("d4"),
        F.round(
            F.expr(
                "(nd * dd3 * nd - 3 * nd * dd1 * dd2"
                " + 2 * dd1 * dd1 * dd1)"
                " / POW(nd * dd2 - dd1 * dd1, 1.5)"
            ),
            6,
        ).alias("skewness"),
        F.round(
            F.expr(
                "(nd * nd * nd * dd4 - 4 * nd * nd * dd1 * dd3"
                " + 6 * nd * dd1 * dd1 * dd2 - 3 * dd1 * dd1 * dd1 * dd1)"
                " / ((nd * dd2 - dd1 * dd1) * (nd * dd2 - dd1 * dd1)) - 3"
            ),
            6,
        ).alias("excess_kurtosis"),
    )
