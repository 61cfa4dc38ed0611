"""Round-4 widening queries, nineteenth batch (SURVEY.md §2.12,
X196-X198).

Growth accounting, distribution drift, and a third exact test: the
standard new/retained/resurrected/churned daily decomposition (the
growth-accounting identity every product review reads — X85's
new-vs-returning is its two-term shadow), the Population Stability
Index over reference-decile boundaries (THE model-monitoring drift
number, with each bucket's single log micro-rounded before the
integer-weighted sum), and Mood's median test (the rank-free
two-sample test completing X77's z-test and X125's rank-sum — all
three decided in cleared-denominator integers).

Cross-engine discipline: presence joins on (user, day) keys only,
decile boundaries as rank order statistics, ln micro-rounded per
BUCKET (10 of them, never per row), chi-square verdict by integer
cross-multiplication in DECIMAL(38).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table


@register(
    "q_growth_accounting",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    first_ AS (
        SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY user_id
    ),
    days AS (SELECT DISTINCT day FROM ud),
    tagged AS (
        SELECT u.day, u.user_id,
               CASE WHEN f.first_day = u.day THEN 1 ELSE 0 END AS is_new,
               CASE WHEN y.user_id IS NOT NULL THEN 1 ELSE 0 END
                   AS active_prev
        FROM ud u
        JOIN first_ f ON f.user_id = u.user_id
        LEFT JOIN ud y ON y.user_id = u.user_id AND y.day = u.day - 1
    ),
    churn AS (
        SELECT y.day + 1 AS day, COUNT(*) AS churned
        FROM ud y LEFT JOIN ud t
          ON t.user_id = y.user_id AND t.day = y.day + 1
        WHERE t.user_id IS NULL
        GROUP BY y.day + 1
    )
    SELECT t.day,
           CAST(SUM(t.is_new) AS BIGINT) AS new_users,
           CAST(SUM(CASE WHEN t.active_prev = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS retained,
           CAST(SUM(CASE WHEN t.is_new = 0 AND t.active_prev = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS resurrected,
           CAST(COALESCE(MIN(c.churned), 0) AS BIGINT) AS churned
    FROM tagged t LEFT JOIN churn c ON c.day = t.day
    GROUP BY t.day
    """,
)
def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X196: daily growth accounting (new/retained/resurrected/churned).

    The growth-accounting identity every product review reads:
    today's actives = new (first day today) + retained (also active
    yesterday) + resurrected (seen before, absent yesterday); churned
    = yesterday's actives missing today, attributed to today. X85's
    new-vs-returning is the two-term shadow; the four-way split plus
    churn closes the MAU-delta identity. All presence checks are
    (user, day) equi-joins on the deduped user-day relation — one
    first-seen aggregate, one next-day anti pattern, one prev-day
    left join, all sharing the user_id shuffle key.
    """
    e = table(spark, sf_dir, "events")
    ud = e.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    first = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    prev = ud.select("user_id", F.date_add("day", 1).alias("day")).withColumn(
        "__prev", F.lit(1)
    )
    tagged = (
        ud.join(first, "user_id")
        .join(prev, ["user_id", "day"], "left")
        .select(
            "day",
            (F.col("first_day") == F.col("day")).cast("int").alias("is_new"),
            F.coalesce("__prev", F.lit(0)).alias("active_prev"),
        )
    )
    nxt = ud.select("user_id", F.date_sub("day", 1).alias("day")).withColumn(
        "__next", F.lit(1)
    )
    churn = (
        ud.join(nxt, ["user_id", "day"], "left")
        .where(F.col("__next").isNull())
        .groupBy(F.date_add("day", 1).alias("day"))
        .agg(F.count("*").alias("churned"))
    )
    agg = tagged.groupBy("day").agg(
        F.sum("is_new").cast("bigint").alias("new_users"),
        F.sum(F.when(F.col("active_prev") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("retained"),
        F.sum(
            F.when((F.col("is_new") == 0) & (F.col("active_prev") == 0), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("resurrected"),
    )
    return agg.join(churn, "day", "left").select(
        "day",
        "new_users",
        "retained",
        "resurrected",
        F.coalesce("churned", F.lit(0)).cast("bigint").alias("churned"),
    )


@register(
    "q_psi",
    oracle="""
    WITH v AS (
        SELECT YEAR(o_orderdate) AS y,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS centi,
               o_orderkey
        FROM orders
    ),
    yrs AS (SELECT MAX(y) AS cur_y FROM v),
    ref AS (
        SELECT centi, NTILE(10) OVER (ORDER BY centi, o_orderkey) AS d
        FROM v CROSS JOIN yrs WHERE y = cur_y - 1
    ),
    bounds AS (SELECT d, MAX(centi) AS hi FROM ref GROUP BY d),
    ref_n AS (SELECT d, COUNT(*) AS n FROM ref GROUP BY d),
    ref_tot AS (SELECT COUNT(*) AS n FROM ref),
    cur AS (
        SELECT centi FROM v CROSS JOIN yrs WHERE y = cur_y
    ),
    cur_g AS (SELECT centi, COUNT(*) AS c FROM cur GROUP BY centi),
    cur_b AS (
        SELECT g.centi, g.c, COALESCE(MIN(b.d), 10) AS d
        FROM cur_g g LEFT JOIN bounds b ON g.centi <= b.hi
        GROUP BY g.centi, g.c
    ),
    cur_n AS (SELECT d, SUM(c) AS n FROM cur_b GROUP BY d),
    cur_tot AS (SELECT SUM(c) AS n FROM cur_b),
    shares AS (
        SELECT r.d,
               10000 * r.n // rt.n AS ref_bp,
               10000 * COALESCE(c.n, 0) // ct.n AS cur_bp
        FROM ref_n r
        LEFT JOIN cur_n c ON c.d = r.d
        CROSS JOIN ref_tot rt CROSS JOIN cur_tot ct
    ),
    terms AS (
        SELECT d, ref_bp, cur_bp,
               CASE WHEN cur_bp > 0 AND ref_bp > 0
                    THEN (cur_bp - ref_bp)
                         * CAST(ROUND(LN(CAST(cur_bp AS DOUBLE) / ref_bp)
                                      * 1000000) AS BIGINT)
                    ELSE 0 END AS term
        FROM shares
    )
    SELECT CAST(d AS INT) AS decile, CAST(ref_bp AS BIGINT) AS ref_bp,
           CAST(cur_bp AS BIGINT) AS cur_bp,
           CAST(term // 10000 AS BIGINT) AS psi_term_micro
    FROM terms
    """,
)
def q_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X197: Population Stability Index over reference deciles.

    THE model-monitoring drift number: bucket the CURRENT year's order
    values by the PRIOR year's decile boundaries and compare shares —
    PSI = sum (p_cur - p_ref) * ln(p_cur/p_ref); > 0.25 means the
    population the model was fit on no longer exists (X154 calibrates
    predictions; this monitors inputs). Exactness: shares are
    truncating bp integers, each bucket's SINGLE ln micro-rounds
    before the integer-weighted term (10 logs total, never per row —
    the X72 constant-not-row discipline), and per-decile terms are
    emitted so the hash pins the whole decomposition, not one sum.
    Reference deciles are rank order statistics; current-side
    bucketing is a 10-row broadcast range lookup.
    """
    o = table(spark, sf_dir, "orders")
    centi = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    v = o.select(
        F.year("o_orderdate").alias("y"), centi.alias("centi"), "o_orderkey"
    )
    cur_y = v.agg(F.max("y").alias("cur_y"))
    from laser_hadoop_spark.operators.cumulative import (
        closed_form_ntile,
        ordered_cumsum,
    )

    ref_rows = (
        v.crossJoin(F.broadcast(cur_y))
        .where(F.col("y") == F.col("cur_y") - 1)
        .select("centi", "o_orderkey")
    )
    ranked = ordered_cumsum(
        ref_rows, order_by=["centi", "o_orderkey"], row_number_col="rn"
    )
    nref = ref_rows.agg(F.count("*").alias("n"))
    # X118's closed-form ntile over the two-pass rank — the oracle
    # keeps the NTILE spelling; hash equality re-proves the closed
    # form on the reference year's relation
    decile_expr = closed_form_ntile()
    ref = ranked.crossJoin(F.broadcast(nref)).select(
        "centi", decile_expr.cast("int").alias("d")
    )
    bounds = ref.groupBy("d").agg(F.max("centi").alias("hi"))
    ref_n = ref.groupBy("d").agg(F.count("*").alias("rn"))
    ref_tot = ref.agg(F.count("*").alias("rt"))
    cur = (
        v.crossJoin(F.broadcast(cur_y))
        .where(F.col("y") == F.col("cur_y"))
        .select("centi")
    )
    # pre-group to the distinct-centi relation FIRST (the oracle's
    # cur_g shape): the <=10x range-join fanout then applies to
    # |distinct values| rows, not every order, and cur scans once
    cur_g = cur.groupBy("centi").agg(F.count("*").alias("c"))
    cur_b = (
        cur_g.join(F.broadcast(bounds), F.col("centi") <= F.col("hi"), "left")
        .groupBy("centi", "c")
        .agg(F.coalesce(F.min("d"), F.lit(10)).alias("d"))
    )
    cur_n = cur_b.groupBy("d").agg(F.sum("c").alias("cn"))
    cur_tot = cur_b.agg(F.sum("c").alias("ct"))
    shares = (
        ref_n.join(cur_n, "d", "left")
        .crossJoin(F.broadcast(ref_tot))
        .crossJoin(F.broadcast(cur_tot))
        .select(
            "d",
            F.expr("10000 * rn DIV rt").alias("ref_bp"),
            F.expr("10000 * COALESCE(cn, 0) DIV ct").alias("cur_bp"),
        )
    )
    term = (
        F.when(
            (F.col("cur_bp") > 0) & (F.col("ref_bp") > 0),
            (F.col("cur_bp") - F.col("ref_bp"))
            * F.round(
                F.log(F.col("cur_bp").cast("double") / F.col("ref_bp"))
                * 1_000_000
            ).cast("bigint"),
        )
        .otherwise(0)
        .alias("term")
    )
    return shares.select("d", "ref_bp", "cur_bp", term).select(
        F.col("d").cast("int").alias("decile"),
        F.col("ref_bp").cast("bigint").alias("ref_bp"),
        F.col("cur_bp").cast("bigint").alias("cur_bp"),
        F.expr("CAST(term DIV 10000 AS BIGINT)").alias("psi_term_micro"),
    )


@register(
    "q_mood_median_test",
    oracle="""
    WITH spend AS (
        SELECT user_id, user_id % 2 AS arm,
               SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS v
        FROM events GROUP BY user_id
    ),
    r AS (
        SELECT arm, v, ROW_NUMBER() OVER (ORDER BY v, user_id) AS rn,
               COUNT(*) OVER () AS n
        FROM spend
    ),
    med AS (SELECT MIN(v) AS m FROM r WHERE 2 * rn >= n),
    cell AS (
        SELECT SUM(CASE WHEN arm = 0 AND v > med.m THEN 1 ELSE 0 END) AS a,
               SUM(CASE WHEN arm = 0 AND v <= med.m THEN 1 ELSE 0 END) AS b,
               SUM(CASE WHEN arm = 1 AND v > med.m THEN 1 ELSE 0 END) AS c,
               SUM(CASE WHEN arm = 1 AND v <= med.m THEN 1 ELSE 0 END) AS d,
               COUNT(*) AS n
        FROM r CROSS JOIN med
    )
    SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
           CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
           (SELECT CAST(m AS BIGINT) FROM med) AS pooled_median_centi,
           CAST(CASE WHEN 1000 * CAST(n AS HUGEINT)
                              * (a * d - b * c) * (a * d - b * c)
                          > 3841 * CAST(a + b AS HUGEINT)
                            * (c + d) * (a + c) * (b + d)
                     THEN 1 ELSE 0 END AS INT) AS significant
    FROM cell
    """,
)
def q_mood_median_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X198: Mood's median test in cleared-denominator integers.

    The third exact two-sample test (X77 compared proportions, X125
    ranks; Mood's compares MEDIANS — robust when the spend
    distribution is heavy-tailed enough that mean tests mislead):
    classify each user's total purchase value against the pooled
    lower median, then the 2x2 chi-square verdict with every
    denominator cleared — 1000*N*(ad-bc)^2 > 3841*(row/col products)
    restates X^2 > 3.841 (alpha=0.05, df=1) in DECIMAL(38) integer
    cross-multiplication; no float can flip the verdict. The pooled
    median is a (2*rank >= n) order statistic.
    """
    e = table(spark, sf_dir, "events")
    centi = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    spend = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", centi).otherwise(0)
        ).alias("v")
    ).select((F.col("user_id") % 2).alias("arm"), "v", "user_id")
    # pooled lower median via the X166 histogram-prune operator — the
    # third hand-rolled (den*rank >= num*n) selection this round was
    # reviewed out of; no rank shuffle of the per-user relation
    from laser_hadoop_spark.operators.cumulative import ordered_weighted_quantile

    med = ordered_weighted_quantile(
        spend.select("v", F.lit(1).cast("bigint").alias("__w")),
        value_col="v",
        weight_col="__w",
    ).select(F.col("quantile_value").alias("m"))
    cell = (
        spend.crossJoin(F.broadcast(med))
        .agg(
            F.sum(
                F.when((F.col("arm") == 0) & (F.col("v") > F.col("m")), 1)
                .otherwise(0)
            ).alias("a"),
            F.sum(
                F.when((F.col("arm") == 0) & (F.col("v") <= F.col("m")), 1)
                .otherwise(0)
            ).alias("b"),
            F.sum(
                F.when((F.col("arm") == 1) & (F.col("v") > F.col("m")), 1)
                .otherwise(0)
            ).alias("c"),
            F.sum(
                F.when((F.col("arm") == 1) & (F.col("v") <= F.col("m")), 1)
                .otherwise(0)
            ).alias("d"),
            F.count("*").alias("n"),
            F.min("m").alias("m"),
        )
    )
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    lhs = (
        F.lit(1000).cast("decimal(38,0)")
        * dec("n")
        * (dec("a") * F.col("d") - dec("b") * F.col("c"))
        * (dec("a") * F.col("d") - dec("b") * F.col("c"))
    )
    rhs = (
        F.lit(3841).cast("decimal(38,0)")
        * (dec("a") + F.col("b"))
        * (dec("c") + F.col("d"))
        * (dec("a") + F.col("c"))
        * (dec("b") + F.col("d"))
    )
    return cell.select(
        F.col("a").cast("bigint").alias("a"),
        F.col("b").cast("bigint").alias("b"),
        F.col("c").cast("bigint").alias("c"),
        F.col("d").cast("bigint").alias("d"),
        F.col("m").cast("bigint").alias("pooled_median_centi"),
        (lhs > rhs).cast("int").alias("significant"),
    )
