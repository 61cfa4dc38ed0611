"""Round-4 widening queries, sixth batch (SURVEY.md §2.12, X144-X151).

Rank statistics, robust trends, retrieval fusion, and the stateful-scan
closed form: Spearman correlation and ROC AUC from the same doubled-
average-rank algebra as X125, a Theil-Sen median slope whose pair
enumeration is bounded by the calendar (not the fact table), reciprocal
rank fusion over two-pass global ranks, a first-seen shingle novelty
signal for corpus curation, a floor-at-zero running balance whose
Lindley closed form (two partitioned windows) is proven against the
recursive per-row definition, degree assortativity over the co-purchase
graph, and the per-day-HLL rolling-WAU sibling that the exact X87
query documents as its extreme-scale path.

Cross-engine discipline unchanged: integer centi/micro/bp fixed
points, doubled ranks for tie-exactness, two-pass cumulative wherever
a global order is walked, DIV == // (both truncate toward zero),
products through DECIMAL(38,0)/HUGEINT, identical aliases both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table


def _centi(col: str) -> F.Column:
    return F.floor(F.col(col) * 100 + F.lit(0.5)).cast("bigint")


def _two_avg_ranks(vals: DataFrame, value_col: str, out_col: str) -> DataFrame:
    """(value, 2*average_rank) for every distinct value of a relation.

    Ties share the average rank; doubling keeps it integral:
    2*avg_rank(v) = 2*min_rank(v) + c(v) - 1 = 2*cum(v) - c(v) + 1,
    where cum is the running count through v in value order (X125's
    algebra). The cumulative runs through the two-pass operator, so no
    single-partition window appears even when the value domain is
    large.
    """
    from laser_hadoop_spark.operators.cumulative import ordered_cumsum

    counts = vals.groupBy(value_col).agg(F.count("*").alias("__c"))
    cum = ordered_cumsum(counts, order_by=[value_col], values={"__c": "__cum"})
    return cum.select(
        value_col,
        (2 * F.col("__cum") - F.col("__c") + 1).alias(out_col),
    )


@register(
    "q_spearman_corr",
    oracle="""
    WITH cust AS (
        SELECT o_custkey, COUNT(*) AS x,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS y
        FROM orders GROUP BY o_custkey
    ),
    r AS (
        SELECT 2 * RANK() OVER (ORDER BY x)
                   + COUNT(*) OVER (PARTITION BY x) - 1 AS rx2,
               2 * RANK() OVER (ORDER BY y)
                   + COUNT(*) OVER (PARTITION BY y) - 1 AS ry2
        FROM cust
    ),
    s AS (
        SELECT COUNT(*) AS n, SUM(rx2) AS sx, SUM(ry2) AS sy,
               SUM(CAST(rx2 AS HUGEINT) * rx2) AS sxx,
               SUM(CAST(ry2 AS HUGEINT) * ry2) AS syy,
               SUM(CAST(rx2 AS HUGEINT) * ry2) AS sxy
        FROM r
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n * sxy - sx * sy AS BIGINT) AS num,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                    * SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS rho
    FROM s
    """,
)
def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X144: Spearman rank correlation, exact tie correction.

    Monotone association between a customer's order count and total
    spend. Pearson-on-average-ranks IS the tie-corrected Spearman rho,
    so the X125 doubled-rank trick makes the whole statistic exact
    until one final IEEE division: every rank is an integer (2*avg),
    all five power sums are exact (rank PRODUCTS and the final
    combinations both route through DECIMAL(38,0) — a bigint product
    wraps silently around a million distinct values), and the
    hash-checked `num` column pins the numerator bit-for-bit. Ranks
    come from grouped value counts + the two-pass cumulative, so the
    plan has one small-aggregate shuffle per variable and no
    single-partition window.
    """
    o = table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.count("*").alias("x"), F.sum(_centi("o_totalprice")).alias("y")
    )
    rx = _two_avg_ranks(cust.select("x"), "x", "rx2")
    ry = _two_avg_ranks(cust.select("y"), "y", "ry2")
    ranked = cust.join(rx, "x").join(ry, "y")
    dec_prod = lambda a, b: F.sum(  # noqa: E731  (sums exact at any sf:
        F.col(a).cast("decimal(38,0)") * F.col(b)
    )  # a bigint rx2*ry2 product wraps silently around n ~ 1.3e6 with
    # ANSI off while DuckDB promotes — route the PRODUCT through
    # decimal, not just the final n*Sxy combination)
    s = ranked.agg(
        F.count("*").alias("n"),
        F.sum("rx2").alias("sx"),
        F.sum("ry2").alias("sy"),
        dec_prod("rx2", "rx2").alias("sxx"),
        dec_prod("ry2", "ry2").alias("syy"),
        dec_prod("rx2", "ry2").alias("sxy"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = dec("n") * dec("sxy") - dec("sx") * dec("sy")
    den1 = dec("n") * dec("sxx") - dec("sx") * dec("sx")
    den2 = dec("n") * dec("syy") - dec("sy") * dec("sy")
    return s.select(
        F.col("n").cast("bigint").alias("n"),
        num.cast("bigint").alias("num"),
        F.round(
            num.cast("double")
            / (F.sqrt(den1.cast("double")) * F.sqrt(den2.cast("double"))),
            6,
        ).alias("rho"),
    )


@register(
    "q_theil_sen",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS rev
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    slopes AS (
        SELECT a.event_type,
               (b.rev - a.rev) * 1000000
                   // date_diff('day', a.day, b.day) AS slope_micro
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND b.day > a.day
    ),
    ranked AS (
        SELECT event_type, slope_micro,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY slope_micro) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM slopes
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
           CAST(slope_micro AS BIGINT) AS ts_slope_micro
    FROM ranked WHERE rn = (n + 1) // 2
    """,
)
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X145: Theil-Sen robust trend (median of pairwise slopes).

    Per event type, the median slope of daily revenue over all day
    pairs — the robust regression line a few outlier days cannot drag
    (X52's least-squares slope is the fragile sibling). Slopes are
    exact micro-units/day by truncating integer division (negative
    slopes truncate toward zero on both engines); the lower median is
    the value at rank (n+1) DIV 2, deterministic regardless of how
    row_number breaks slope ties — the k-th order statistic depends
    only on the multiset. The pair self-join is quadratic in DAYS PER
    GROUP (calendar-bounded, ~150 at any sf), never in the fact table:
    the X53 scale pattern. The ranking window partitions by event_type,
    so no global funnel.
    """
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(_centi("value")).alias("rev"))
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.day") > F.col("a.day")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.expr(
            "CAST((b.rev - a.rev) * 1000000 DIV datediff(b.day, a.day) AS BIGINT)"
        ).alias("slope_micro"),
    )
    w = Window.partitionBy("event_type").orderBy("slope_micro")
    ranked = slopes.select(
        "event_type",
        "slope_micro",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n"),
    )
    return ranked.where(F.col("rn") == F.expr("(n + 1) DIV 2")).select(
        "event_type",
        F.col("n").cast("bigint").alias("n_pairs"),
        F.col("slope_micro").cast("bigint").alias("ts_slope_micro"),
    )


@register(
    "q_rrf_fusion",
    oracle="""
    WITH m AS (
        SELECT doc_id, n_chars,
               len(list_distinct(string_split(text, ' '))) AS n_vocab
        FROM documents
    ),
    r AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS r_len,
               ROW_NUMBER() OVER (ORDER BY n_vocab DESC, doc_id) AS r_vocab
        FROM m
    )
    SELECT doc_id, CAST(r_len AS BIGINT) AS r_len,
           CAST(r_vocab AS BIGINT) AS r_vocab,
           CAST(1000000 // (60 + r_len)
                + 1000000 // (60 + r_vocab) AS BIGINT) AS rrf_micro
    FROM r
    ORDER BY rrf_micro DESC, doc_id
    LIMIT 20
    """,
)
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X146: reciprocal rank fusion of two document rankings.

    The standard hybrid-retrieval combiner (RRF, k=60): fuse a length
    ranking and a vocabulary-size ranking into one score without
    calibrating either — score = sum 1/(60+rank), here exact integer
    micro-units since every rank is an integer. Both global rankings
    are total orders (metric desc, doc_id) computed by the two-pass
    row number — at 100 TB each ranking is a range shuffle, not a
    single-partition window; the fused top-20 is TakeOrderedAndProject.
    In a real retrieval stack the two input rankings arrive from the
    BM25 (X122) and ANN (X2) branches — the fusion algebra is
    identical.
    """
    from laser_hadoop_spark.operators.cumulative import ordered_cumsum

    d = table(spark, sf_dir, "documents")
    m = d.select(
        "doc_id",
        "n_chars",
        F.size(F.array_distinct(F.split("text", " "))).alias("n_vocab"),
    )
    r1 = ordered_cumsum(
        m.select("doc_id", "n_chars"),
        order_by=[F.col("n_chars").desc(), F.col("doc_id")],
        row_number_col="r_len",
    ).select("doc_id", "r_len")
    r2 = ordered_cumsum(
        m.select("doc_id", "n_vocab"),
        order_by=[F.col("n_vocab").desc(), F.col("doc_id")],
        row_number_col="r_vocab",
    ).select("doc_id", "r_vocab")
    fused = r1.join(r2, "doc_id").select(
        "doc_id",
        F.col("r_len").cast("bigint").alias("r_len"),
        F.col("r_vocab").cast("bigint").alias("r_vocab"),
        F.expr(
            "CAST(1000000 DIV (60 + r_len) + 1000000 DIV (60 + r_vocab)"
            " AS BIGINT)"
        ).alias("rrf_micro"),
    )
    return fused.orderBy(F.col("rrf_micro").desc(), "doc_id").limit(20)


@register(
    "q_shingle_novelty",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               md5(UNNEST(list_transform(generate_series(1, len(t) - 2),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS h
        FROM toks WHERE len(t) >= 3
    ),
    fs AS (SELECT h, MIN(doc_id) AS first_doc FROM sh GROUP BY h)
    SELECT s.doc_id, COUNT(*) AS n_shingles,
           CAST(10000 * SUM(CASE WHEN f.first_doc = s.doc_id
                                 THEN 1 ELSE 0 END)
                // COUNT(*) AS BIGINT) AS novel_bp
    FROM sh s JOIN fs f ON f.h = s.h
    GROUP BY s.doc_id
    """,
)
def q_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X147: first-seen shingle novelty score per document.

    The memorization/redundancy curation signal: what fraction of a
    document's distinct 3-gram shingles appear in NO earlier document
    (doc_id order = ingestion order). Attribution is X37's first-seen
    pattern lifted to n-grams: MIN(doc_id) per shingle, joined back,
    counted in exact basis points. All shuffles move 32-byte md5
    digests (the same cross-engine hash every dedup query shares),
    never shingle text; at 100 TB this is two hash aggregates and one
    digest equi-join — the same shape as the X14 contamination check
    with the corpus on both sides.
    """
    d = table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    # Per-doc shingle dedup happens SCAN-LOCALLY (array_distinct on the
    # shingle array) — the naive explode-then-DISTINCT spelling
    # shuffles every (doc, 32-byte digest) pair just to dedup within
    # documents; array_distinct removes that whole exchange (only the
    # first-seen aggregate and the join-back shuffle remain). The raw
    # repartition is the PERF_NOTES small-file lesson: spread the
    # hashing across cores when the input is one sub-split file.
    sh = (
        d.select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
        .where(F.size(t) >= 3)
        .select(
            "doc_id",
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
    )
    fs = sh.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(fs, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.expr(
                "CAST(10000 * SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)"
                " DIV COUNT(*) AS BIGINT)"
            ).alias("novel_bp"),
        )
    )


@register(
    "q_clamped_balance",
    oracle="""
    WITH RECURSIVE ev AS (
        SELECT user_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id) AS rn,
               CASE WHEN event_type IN ('purchase', 'signup')
                    THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                    ELSE -CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
               END AS delta
        FROM events
    ),
    bal AS (
        SELECT user_id, rn, GREATEST(CAST(0 AS BIGINT), delta) AS b
        FROM ev WHERE rn = 1
        UNION ALL
        SELECT e.user_id, e.rn, GREATEST(CAST(0 AS BIGINT), bal.b + e.delta)
        FROM bal JOIN ev e
          ON e.user_id = bal.user_id AND e.rn = bal.rn + 1
    )
    SELECT user_id, COUNT(*) AS n_events,
           CAST(arg_max(b, rn) AS BIGINT) AS final_centi,
           CAST(MAX(b) AS BIGINT) AS peak_centi
    FROM bal GROUP BY user_id
    """,
)
def q_clamped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X148: floor-at-zero running balance — Lindley closed form.

    A wallet that cannot go negative: b_t = max(0, b_{t-1} + d_t)
    (credits from purchase/signup value, debits from the rest). The
    recurrence LOOKS inherently sequential — the oracle spells it as
    the literal per-row recursive CTE — but the Lindley/queueing
    closed form solves it with two ordinary windows:

        b_t = cum_t - LEAST(0, MIN(cum_s) for s <= t)

    so Spark computes it as a per-user cumulative sum plus a per-user
    running minimum: one shuffle on user_id, both windows PARTITIONED
    (no global order anywhere), embarrassingly parallel across users.
    Hash equality against the recursion proves the closed form — the
    X118/X128 discipline of verifying the scalable spelling against
    the definitional one.
    """
    e = table(spark, sf_dir, "events")
    delta = (
        F.when(
            F.col("event_type").isin("purchase", "signup"), _centi("value")
        ).otherwise(-_centi("value"))
    ).alias("delta")
    ev = e.select("user_id", "ts", "event_id", delta)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rn_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = F.sum("delta").over(w)
    stepped = ev.select(
        "user_id",
        F.row_number().over(rn_w).alias("rn"),
        (cum - F.least(F.lit(0).cast("bigint"), F.min(cum).over(w))).alias("b"),
    )
    return stepped.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.max_by("b", "rn").cast("bigint").alias("final_centi"),
        F.max("b").cast("bigint").alias("peak_centi"),
    )


@register(
    "q_degree_assortativity",
    tags=("pairs",),
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    deg AS (SELECT src AS node, COUNT(*) AS d FROM pairs GROUP BY src),
    ed AS (
        SELECT ds.d AS dx, dd.d AS dy
        FROM pairs p
        JOIN deg ds ON ds.node = p.src
        JOIN deg dd ON dd.node = p.dst
    ),
    s AS (
        SELECT COUNT(*) AS m, SUM(dx) AS sx, SUM(dy) AS sy,
               SUM(CAST(dx AS HUGEINT) * dx) AS sxx,
               SUM(CAST(dy AS HUGEINT) * dy) AS syy,
               SUM(CAST(dx AS HUGEINT) * dy) AS sxy
        FROM ed
    )
    SELECT CAST(m AS BIGINT) AS m_edges,
           CAST(m * sxy - sx * sy AS BIGINT) AS num,
           ROUND(CAST(m * sxy - sx * sy AS DOUBLE)
                 / (SQRT(CAST(m * sxx - sx * sx AS DOUBLE))
                    * SQRT(CAST(m * syy - sy * sy AS DOUBLE))), 6)
               AS assortativity
    FROM s
    """,
)
def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X149: degree assortativity of the co-purchase graph.

    Do high-degree parts co-purchase with other high-degree parts?
    Pearson correlation of endpoint degrees over the directed edge
    list (X117's edges — already symmetrized by the self-join, so this
    is the standard undirected estimator). Power sums are exact
    bigints (degrees are small integers); products go through
    DECIMAL(38,0); one final IEEE division + sqrt, with the integer
    numerator hash-pinned like X144. Plan: the X117 edge/degree
    relations plus two degree broadcast joins and one scalar
    aggregate — nothing quadratic beyond the per-order line fanout.
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )
    deg = pairs.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    ed = (
        pairs.join(deg.select(F.col("node").alias("src"), F.col("d").alias("dx")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("d").alias("dy")), "dst")
        .select("dx", "dy")
    )
    dec_prod = lambda a, b: F.sum(  # noqa: E731  (X144's overflow
        F.col(a).cast("decimal(38,0)") * F.col(b)
    )  # discipline: degree products wrap bigint on dense graphs)
    s = ed.agg(
        F.count("*").alias("m"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        dec_prod("dx", "dx").alias("sxx"),
        dec_prod("dy", "dy").alias("syy"),
        dec_prod("dx", "dy").alias("sxy"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = dec("m") * dec("sxy") - dec("sx") * dec("sy")
    den1 = dec("m") * dec("sxx") - dec("sx") * dec("sx")
    den2 = dec("m") * dec("syy") - dec("sy") * dec("sy")
    return s.select(
        F.col("m").cast("bigint").alias("m_edges"),
        num.cast("bigint").alias("num"),
        F.round(
            num.cast("double")
            / (F.sqrt(den1.cast("double")) * F.sqrt(den2.cast("double"))),
            6,
        ).alias("assortativity"),
    )


@register(
    "q_auc_exact",
    oracle="""
    WITH v AS (
        SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS score,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c1,
               SUM(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END) AS c2
        FROM events
        GROUP BY CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
    ),
    cum AS (
        SELECT c1, c2,
               SUM(c1) OVER (ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum1,
               SUM(c2) OVER (ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum2
        FROM v
    ),
    tot AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM v),
    r1 AS (
        SELECT SUM(c1 * (2 * (cum1 + cum2 - c1 - c2 + 1) + c1 + c2 - 1))
                   AS two_r1
        FROM cum
    )
    SELECT CAST(t.n1 AS BIGINT) AS n_pos, CAST(t.n2 AS BIGINT) AS n_neg,
           CAST(10000 * (two_r1 - t.n1 * (t.n1 + 1))
                // (2 * t.n1 * t.n2) AS BIGINT) AS auc_bp
    FROM r1 CROSS JOIN tot t
    """,
)
def q_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X150: exact ROC AUC in basis points (doubled-rank Mann-Whitney).

    AUC of "event value predicts purchase" — AUC == U1/(n1*n2), so the
    X125 doubled-rank machinery computes it EXACTLY with ties handled
    by the trapezoidal convention (tied scores contribute 1/2): no
    threshold sweep, no float accumulation, one truncating integer
    division into bp at the very end. The classifier-eval twin of
    X73's confusion matrix: together they give threshold-free and
    thresholded evaluation, both hash-checkable. Cumulative counts run
    through the two-pass operator over the grouped score relation.
    """
    from laser_hadoop_spark.operators.cumulative import ordered_cumsum

    e = table(spark, sf_dir, "events")
    is_pos = (F.col("event_type") == "purchase").cast("bigint")
    v = e.groupBy(_centi("value").alias("score")).agg(
        F.sum(is_pos).alias("c1"),
        F.sum(1 - is_pos).alias("c2"),
    )
    cum = ordered_cumsum(
        v, order_by=["score"], values={"c1": "cum1", "c2": "cum2"}
    )
    two_r1 = cum.agg(
        F.sum(
            F.col("c1").cast("decimal(38,0)")
            * (
                2 * (F.col("cum1") + F.col("cum2") - F.col("c1") - F.col("c2") + 1)
                + F.col("c1")
                + F.col("c2")
                - 1
            )
        ).alias("two_r1")
    )  # decimal: 2*R1 ~ 2*n1*N is quadratic in event count
    tot = v.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    u1_x2 = F.col("two_r1") - F.col("n1").cast("decimal(38,0)") * (
        F.col("n1") + 1
    )
    return (
        two_r1.crossJoin(F.broadcast(tot))
        .select(
            F.col("n1").cast("bigint").alias("n_pos"),
            F.col("n2").cast("bigint").alias("n_neg"),
            (10000 * u1_x2).alias("__num"),
        )
        .select(
            "n_pos",
            "n_neg",
            F.expr(
                "CAST(__num div (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg)"
                " AS BIGINT)"
            ).alias("auc_bp"),
        )
    )


@register("q_wau_hll", oracle=None)
def q_wau_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X151: rolling 7-day active users via mergeable per-day HLL
    sketches — the extreme-scale sibling X87 documents.

    Exact sliding COUNT(DISTINCT) costs 7x the deduped user-day table
    (q_rolling_active_users); this variant pays that fanout on ONE
    SKETCH PER DAY instead: hll_sketch_agg(user_id) per day (the only
    fact-table aggregate), then each day's ~KB-sized sketch binary is
    replicated to its 7 window ends and hll_union_agg merges them —
    the window-shuffle volume drops from |user-days| x 7 rows to
    |days| x 7 sketches, independent of user cardinality. Rows-only by
    nature (HLL is approximate); the pytest gate bounds per-day error
    vs the exact query at 5%.
    """
    e = table(spark, sf_dir, "events")
    user_days = e.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    daily = user_days.groupBy("day").agg(
        F.hll_sketch_agg("user_id").alias("sketch")
    )
    contrib = daily.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"), "day", "sketch"
    ).select(F.date_add(F.col("day"), F.col("off")).alias("window_day"), "sketch")
    bounds = user_days.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    return (
        contrib.crossJoin(F.broadcast(bounds))
        .where(
            (F.col("window_day") >= F.date_add(F.col("lo"), 6))
            & (F.col("window_day") <= F.col("hi"))
        )
        .groupBy("window_day")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch"))
            .cast("bigint")
            .alias("wau_approx")
        )
    )
