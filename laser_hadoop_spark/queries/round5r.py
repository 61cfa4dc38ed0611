"""Round-5 widening queries, eighteenth batch (SURVEY.md §2.13, X290-X294).

Rank correlation, paired tests, survival comparison, ranking quality,
and substring-level dedup:

- X290 Kendall tau-b: exact concordant/discordant/tie census over the
  daily (revenue, order-count) series — the rank correlation that
  X144's Spearman cannot replace when ties are heavy.
- X291 McNemar paired test: year-over-year customer activity flips
  (active'96 vs active'97) — the paired sibling of X77's two-sample
  z-test; only the discordant cells carry information.
- X292 two-group log-rank test: X224's survival framing split into an
  A/B cohort — observed-vs-expected event census on the shared
  at-risk table, the standard survival-curve comparison.
- X293 NDCG@10: graded-relevance ranking quality with fixed-point
  log2 discounts — completes X209's retrieval-metric surface (MRR and
  P@k are binary; NDCG is the graded industry default).
- X294 duplicated-span census: char-20-gram fingerprints that recur
  across documents, merged into maximal per-doc spans
  (gaps-and-islands) — the bounded-window form of suffix-array exact
  substring deduplication (Lee et al., "Deduplicating Training Data
  Makes Language Models Better"), reporting per-doc duplicated-char
  totals the way the suffix-array pipeline reports removable spans.

Reference parity note: the reference's validators stop at record-level
checks (LASERInputValidator.java:135-155); these are engine extensions
per SURVEY.md §2.13.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import spread_scan, table

# --- X290: Kendall tau-b -----------------------------------------------------


@register(
    "q_kendall_tau",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS rev_cents,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1
    ),
    pairs AS (
        SELECT a.rev_cents AS xa, a.n_orders AS ya,
               b.rev_cents AS xb, b.n_orders AS yb
        FROM daily a JOIN daily b ON a.d < b.d
    ),
    census AS (
        SELECT
            CAST(SUM(CASE WHEN (xa < xb AND ya < yb)
                            OR (xa > xb AND ya > yb)
                     THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
            CAST(SUM(CASE WHEN (xa < xb AND ya > yb)
                            OR (xa > xb AND ya < yb)
                     THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
            CAST(SUM(CASE WHEN xa = xb AND ya <> yb
                     THEN 1 ELSE 0 END) AS BIGINT) AS ties_x,
            CAST(SUM(CASE WHEN ya = yb AND xa <> xb
                     THEN 1 ELSE 0 END) AS BIGINT) AS ties_y,
            CAST(SUM(CASE WHEN xa = xb AND ya = yb
                     THEN 1 ELSE 0 END) AS BIGINT) AS ties_xy,
            CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM pairs
    )
    SELECT concordant, discordant, ties_x, ties_y, ties_xy, n_pairs,
           ROUND((concordant - discordant)
                 / SQRT(CAST(n_pairs - ties_x - ties_xy AS DOUBLE)
                        * (n_pairs - ties_y - ties_xy)), 4) AS tau_b
    FROM census
    """,
)
def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X290: Kendall tau-b rank correlation, exact pair census.

    Daily revenue (cents) vs daily order count over the orders fact:
    every unordered day pair is classified concordant / discordant /
    tied-in-x / tied-in-y / tied-in-both by pure integer comparisons,
    and tau-b = (C - D) / sqrt((n0 - Tx)(n0 - Ty)) is the only float
    (one expression over six exact integers, rounded 4 — no summation
    order exists to drift). Spearman (X144) needs a rank transform and
    mis-handles heavy ties; tau-b's pair census is the tie-robust form.

    100 TB: the pair join runs over the DAILY AGGREGATE, which is
    calendar-bounded (~2.4k rows regardless of fact scale) — one fact
    shuffle to build it, then a broadcast self-join over ~3M pairs
    whose conditional-sum census is a single partial-aggregated scan.
    """
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("rev_cents"),
        F.count("*").cast("bigint").alias("n_orders"),
    )
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = a.join(
        F.broadcast(b), F.col("a.d") < F.col("b.d"), "inner"
    ).select(
        F.col("a.rev_cents").alias("xa"),
        F.col("a.n_orders").alias("ya"),
        F.col("b.rev_cents").alias("xb"),
        F.col("b.n_orders").alias("yb"),
    )
    xa, ya, xb, yb = (F.col(c) for c in ("xa", "ya", "xb", "yb"))
    census = pairs.agg(
        F.sum(
            F.when((xa < xb) & (ya < yb) | (xa > xb) & (ya > yb), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("concordant"),
        F.sum(
            F.when((xa < xb) & (ya > yb) | (xa > xb) & (ya < yb), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("discordant"),
        F.sum(F.when((xa == xb) & (ya != yb), 1).otherwise(0))
        .cast("bigint")
        .alias("ties_x"),
        F.sum(F.when((ya == yb) & (xa != xb), 1).otherwise(0))
        .cast("bigint")
        .alias("ties_y"),
        F.sum(F.when((xa == xb) & (ya == yb), 1).otherwise(0))
        .cast("bigint")
        .alias("ties_xy"),
        F.count("*").cast("bigint").alias("n_pairs"),
    )
    return census.select(
        "concordant",
        "discordant",
        "ties_x",
        "ties_y",
        "ties_xy",
        "n_pairs",
        F.round(
            (F.col("concordant") - F.col("discordant"))
            / F.sqrt(
                (F.col("n_pairs") - F.col("ties_x") - F.col("ties_xy")).cast(
                    "double"
                )
                * (F.col("n_pairs") - F.col("ties_y") - F.col("ties_xy"))
            ),
            4,
        ).alias("tau_b"),
    )


# --- X291: McNemar paired test ------------------------------------------------

_MCNEMAR_Y1, _MCNEMAR_Y2 = 1996, 1997


@register(
    "q_mcnemar",
    oracle=f"""
    WITH y1 AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE YEAR(CAST(o_orderdate AS DATE)) = {_MCNEMAR_Y1}
    ),
    y2 AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE YEAR(CAST(o_orderdate AS DATE)) = {_MCNEMAR_Y2}
    ),
    cells AS (
        SELECT
            CAST(SUM(CASE WHEN a.o_custkey IS NOT NULL
                           AND b.o_custkey IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS b_cell,
            CAST(SUM(CASE WHEN a.o_custkey IS NULL
                           AND b.o_custkey IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS c_cell,
            CAST(SUM(CASE WHEN a.o_custkey IS NOT NULL
                           AND b.o_custkey IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS both_cell
        FROM y1 a FULL OUTER JOIN y2 b ON a.o_custkey = b.o_custkey
    )
    SELECT b_cell, c_cell, both_cell,
           CAST((b_cell - c_cell) * (b_cell - c_cell) * 1000000
                // (b_cell + c_cell) AS BIGINT) AS chi2_micro
    FROM cells
    """,
)
def q_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X291: McNemar test on paired year-over-year activity flips.

    Each customer is a PAIRED observation (active in 1996, active in
    1997); only the discordant cells — b = active-then-quiet, c =
    quiet-then-active — carry information, and the statistic
    (b-c)^2/(b+c) is exact integer micro (chi2_micro, integer DIV on
    nonnegative operands). X77's two-proportion z-test would be WRONG
    here: the two years share customers, so the samples aren't
    independent — this is the paired correction.

    100 TB: two distinct-key projections of the fact (each a
    partial-aggregated shuffle on custkey), one co-partitioned full
    outer join on the same key, then a single-row census.
    """
    o = table(spark, sf_dir, "orders")

    def active(year: int) -> DataFrame:
        return (
            o.where(F.year(F.col("o_orderdate").cast("date")) == year)
            .select("o_custkey")
            .distinct()
        )

    a = active(_MCNEMAR_Y1).withColumnRenamed("o_custkey", "k1")
    b = active(_MCNEMAR_Y2).withColumnRenamed("o_custkey", "k2")
    cells = a.join(b, a.k1 == b.k2, "full_outer").agg(
        F.sum(
            F.when(F.col("k1").isNotNull() & F.col("k2").isNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("b_cell"),
        F.sum(
            F.when(F.col("k1").isNull() & F.col("k2").isNotNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("c_cell"),
        F.sum(
            F.when(F.col("k1").isNotNull() & F.col("k2").isNotNull(), 1).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("both_cell"),
    )
    diff = F.col("b_cell") - F.col("c_cell")
    tot = F.col("b_cell") + F.col("c_cell")
    num = diff * diff * F.lit(1000000)
    return cells.select(
        "b_cell",
        "c_cell",
        "both_cell",
        ((num - num % tot) / tot).cast("bigint").alias("chi2_micro"),
    )


# --- X292: two-group log-rank test -------------------------------------------

_LOGRANK_CHURN_DAYS = 7


@register(
    "q_logrank",
    oracle=f"""
    WITH users AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS first_d,
               MAX(CAST(ts AS DATE)) AS last_d
        FROM events GROUP BY user_id
    ),
    horizon AS (SELECT MAX(last_d) AS m FROM users),
    durs AS (
        SELECT user_id % 2 AS grp,
               date_diff('day', first_d, last_d) AS dur,
               CASE WHEN date_diff('day', last_d, m)
                         >= {_LOGRANK_CHURN_DAYS}
                    THEN 1 ELSE 0 END AS churned
        FROM users CROSS JOIN horizon
    ),
    per_t AS (
        SELECT dur,
               COUNT(*) AS n_here,
               SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS n1_here,
               SUM(churned) AS d_here,
               SUM(CASE WHEN grp = 0 THEN churned ELSE 0 END) AS d1_here
        FROM durs GROUP BY dur
    ),
    risk AS (
        SELECT dur, d_here, d1_here,
               SUM(n_here) OVER (ORDER BY dur DESC) AS n_at_risk,
               SUM(n1_here) OVER (ORDER BY dur DESC) AS n1_at_risk
        FROM per_t
    ),
    terms AS (
        SELECT dur,
               CAST(ROUND(1000000.0 * (d1_here
                          - CAST(d_here * n1_at_risk AS DOUBLE) / n_at_risk))
                    AS BIGINT) AS oe_micro,
               CASE WHEN n_at_risk > 1 THEN
                   CAST(ROUND(1000000.0 * d_here * n1_at_risk
                              * (n_at_risk - n1_at_risk)
                              * (n_at_risk - d_here)
                              / (CAST(n_at_risk AS DOUBLE) * n_at_risk
                                 * (n_at_risk - 1))) AS BIGINT)
               ELSE 0 END AS var_micro
        FROM risk WHERE d_here > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_event_times,
           CAST(SUM(oe_micro) AS BIGINT) AS oe_sum_micro,
           CAST(SUM(var_micro) AS BIGINT) AS var_sum_micro,
           ROUND(CAST(SUM(oe_micro) AS DOUBLE) * SUM(oe_micro)
                 / SUM(var_micro) / 1000000.0, 4) AS logrank_chi2
    FROM terms
    """,
)
def q_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X292: two-group log-rank test over X224's survival framing.

    Users split into an A/B cohort by user_id parity (the assignment
    hash). At each event time t with d_t total churns: observed group-0
    events d1_t vs expected d_t * n1_t / n_t under the null, plus the
    hypergeometric variance — each time's O-E and V terms micro-round
    FIRST (X197's fixed-point discipline), so the sums are integer and
    no float ordering can flip the hash; the chi-square is one final
    expression over two exact integer sums, rounded 4.

    100 TB: one user aggregate (shuffle on user_id), then the whole
    test lives on the <= |distinct durations| relation — the at-risk
    counts are reverse cumulatives over the tiny per-duration table,
    exactly X224's shape with a second (group-0) census column.
    """
    e = table(spark, sf_dir, "events")
    users = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_d"),
        F.max(F.col("ts").cast("date")).alias("last_d"),
    )
    horizon = users.agg(F.max("last_d").alias("m"))
    durs = users.crossJoin(F.broadcast(horizon)).select(
        (F.col("user_id") % 2).alias("grp"),
        F.datediff("last_d", "first_d").alias("dur"),
        F.when(
            F.datediff(F.col("m"), F.col("last_d")) >= _LOGRANK_CHURN_DAYS, 1
        )
        .otherwise(0)
        .alias("churned"),
    )
    per_t = durs.groupBy("dur").agg(
        F.count("*").alias("n_here"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("n1_here"),
        F.sum("churned").alias("d_here"),
        F.sum(F.when(F.col("grp") == 0, F.col("churned")).otherwise(0)).alias(
            "d1_here"
        ),
    )
    w_desc = Window.orderBy(F.desc("dur")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = per_t.select(
        "dur",
        "d_here",
        "d1_here",
        F.sum("n_here").over(w_desc).alias("n_at_risk"),
        F.sum("n1_here").over(w_desc).alias("n1_at_risk"),
    )
    n, n1, d, d1 = (
        F.col("n_at_risk"),
        F.col("n1_at_risk"),
        F.col("d_here"),
        F.col("d1_here"),
    )
    terms = risk.where(d > 0).select(
        "dur",
        F.round(1000000.0 * (d1 - (d * n1).cast("double") / n))
        .cast("bigint")
        .alias("oe_micro"),
        F.when(
            n > 1,
            F.round(
                1000000.0
                * d
                * n1
                * (n - n1)
                * (n - d)
                / (n.cast("double") * n * (n - 1))
            ).cast("bigint"),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("var_micro"),
    )
    return terms.agg(
        F.count("*").cast("bigint").alias("n_event_times"),
        F.sum("oe_micro").cast("bigint").alias("oe_sum_micro"),
        F.sum("var_micro").cast("bigint").alias("var_sum_micro"),
        F.round(
            F.sum("oe_micro").cast("double")
            * F.sum("oe_micro")
            / F.sum("var_micro")
            / 1000000.0,
            4,
        ).alias("logrank_chi2"),
    )


# --- X293: NDCG@10 ------------------------------------------------------------

_NDCG_K = 10


@register(
    "q_ndcg",
    oracle=f"""
    WITH graded AS (
        SELECT source, doc_id, n_chars,
               CASE WHEN lang = 'en' THEN 3
                    WHEN lang = 'de' THEN 2 ELSE 1 END AS rel
        FROM documents
    ),
    ranked AS (
        SELECT source, rel,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS rnk,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY rel DESC, doc_id) AS ideal_rnk
        FROM graded
    ),
    scored AS (
        SELECT source,
               SUM(CASE WHEN rnk <= {_NDCG_K}
                   THEN rel * CAST(ROUND(1000000 / LOG2(rnk + 1)) AS BIGINT)
                   ELSE 0 END) AS dcg_micro,
               SUM(CASE WHEN ideal_rnk <= {_NDCG_K}
                   THEN rel * CAST(ROUND(1000000 / LOG2(ideal_rnk + 1))
                                   AS BIGINT)
                   ELSE 0 END) AS idcg_micro
        FROM ranked GROUP BY source
    )
    SELECT source, CAST(dcg_micro AS BIGINT) AS dcg_micro,
           CAST(idcg_micro AS BIGINT) AS idcg_micro,
           ROUND(CAST(dcg_micro AS DOUBLE) / idcg_micro, 4) AS ndcg
    FROM scored ORDER BY source
    """,
)
def q_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X293: NDCG@10 with fixed-point log2 discounts.

    Each source is a "query"; its docs rank by length (the predicted
    ordering) against graded relevance from language (en=3, de=2,
    else 1). The per-rank discount 1/log2(rank+1) micro-rounds FIRST,
    so DCG and ideal DCG are exact integer sums (rel * disc_micro) no
    summation order can flip; NDCG is one final division, rounded 4.
    Completes X209's retrieval surface: MRR and P@k are binary-
    relevance metrics, NDCG is the graded default.

    100 TB: grading is scan-local; both rankings are per-source
    windows (one shuffle on the query key — bounded by |sources|,
    and each group's top-10 discount sum is a partial aggregate).
    """
    d = table(spark, sf_dir, "documents")
    graded = d.select(
        "source",
        "doc_id",
        "n_chars",
        F.when(F.col("lang") == "en", 3)
        .when(F.col("lang") == "de", 2)
        .otherwise(1)
        .alias("rel"),
    )
    w_pred = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.col("doc_id")
    )
    w_ideal = Window.partitionBy("source").orderBy(
        F.desc("rel"), F.col("doc_id")
    )
    ranked = graded.select(
        "source",
        "rel",
        F.row_number().over(w_pred).alias("rnk"),
        F.row_number().over(w_ideal).alias("ideal_rnk"),
    )

    def disc(rank_col: str) -> F.Column:
        return F.round(1000000 / F.log2(F.col(rank_col) + 1)).cast("bigint")

    scored = ranked.groupBy("source").agg(
        F.sum(
            F.when(F.col("rnk") <= _NDCG_K, F.col("rel") * disc("rnk")).otherwise(
                0
            )
        ).alias("dcg_micro"),
        F.sum(
            F.when(
                F.col("ideal_rnk") <= _NDCG_K, F.col("rel") * disc("ideal_rnk")
            ).otherwise(0)
        ).alias("idcg_micro"),
    )
    return scored.select(
        "source",
        F.col("dcg_micro").cast("bigint").alias("dcg_micro"),
        F.col("idcg_micro").cast("bigint").alias("idcg_micro"),
        F.round(
            F.col("dcg_micro").cast("double") / F.col("idcg_micro"), 4
        ).alias("ndcg"),
    ).orderBy("source")


# --- X294: duplicated-span census --------------------------------------------

_SPAN_GRAM = 20
_SPAN_TOP = 25


@register(
    "q_dup_spans",
    tags=("pairs",),
    oracle=f"""
    WITH grams AS (
        SELECT doc_id, g.i AS pos,
               substr(text, g.i, {_SPAN_GRAM}) AS gram
        FROM documents,
             UNNEST(generate_series(
                 1, GREATEST(len(text) - {_SPAN_GRAM} + 1, 0))) AS g(i)
    ),
    dup_grams AS (
        SELECT gram FROM grams
        GROUP BY gram HAVING COUNT(DISTINCT doc_id) > 1
    ),
    hits AS (
        SELECT g.doc_id, g.pos FROM grams g
        JOIN dup_grams d ON d.gram = g.gram
    ),
    islands AS (
        SELECT doc_id, pos,
               CASE WHEN pos <= MAX(pos + {_SPAN_GRAM} - 1) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 0 ELSE 1 END AS is_start
        FROM hits
    ),
    spans AS (
        SELECT doc_id, pos,
               SUM(is_start) OVER (PARTITION BY doc_id ORDER BY pos)
                   AS span_id
        FROM islands
    ),
    sized AS (
        SELECT doc_id, span_id,
               MAX(pos) - MIN(pos) + {_SPAN_GRAM} AS span_chars
        FROM spans GROUP BY doc_id, span_id
    ),
    per_doc AS (
        SELECT s.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(SUM(span_chars) AS BIGINT) AS dup_chars,
               CAST(MAX(span_chars) AS BIGINT) AS longest_span
        FROM sized s GROUP BY s.doc_id
    )
    SELECT p.doc_id, n_spans, dup_chars, longest_span,
           CAST(dup_chars * 10000 // d.n_chars AS BIGINT) AS dup_ratio_bp
    FROM per_doc p JOIN documents d ON d.doc_id = p.doc_id
    ORDER BY dup_chars DESC, p.doc_id LIMIT {_SPAN_TOP}
    """,
)
def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X294: duplicated-span census — bounded-window exact substring dedup.

    The windowed form of suffix-array substring deduplication (Lee et
    al. 2022): every char 20-gram that occurs in MORE THAN ONE doc
    marks its positions; per doc, overlapping marked windows merge
    into maximal spans via gaps-and-islands (a span starts where the
    running max of previous window-ends can't reach), giving per-doc
    removable-duplicate char totals and a dup-ratio gate in basis
    points. X26's repetition ratio is within-doc; this is the
    cross-doc substring census the suffix-array pipeline feeds dedup.

    100 TB: gram extraction is scan-local (spread_scan's repartition
    is a no-op once the scan has >= cores splits); the only full
    shuffle carries (hash(gram), doc_id, pos) — 20-byte windows
    reduced to 8-byte xxhash64 fingerprints, never text (collision
    odds over corpus-scale gram counts are the standard 2^-64 regime,
    and the oracle's string-keyed check pins exactness at test scale).
    The duplicate-gram filter is a vectorized per-partition kernel
    over that single exchange (round 13 — the stream is exploded and
    hashed ONCE; the r12 aggregate+semi-join form consumed it twice);
    span merging is a per-doc window over hit positions only.
    """
    d = table(spark, sf_dir, "documents")
    # Round 13: the gram explode + per-char xxhash64 is the query's
    # dominant compute and it sat on the scan stage — ONE task on the
    # single-row-group test parquet (measured 1.83 s of the 3.5 s).
    # spread_scan parallelizes it across cores; guarded no-op at
    # corpus scale (see tables.spread_scan).
    grams = spread_scan(d.select("doc_id", "text"), "doc_id").select(
        "doc_id",
        F.posexplode(
            F.expr(
                # Guard: sequence(1, 0) DESCENDS in Spark ([1, 0]); a doc
                # shorter than the gram width must emit zero grams (the
                # DuckDB oracle's generate_series(1, n) is empty for n < 1).
                #
                # Round 12: xxhash64 runs INSIDE the transform, so the
                # exploded array is long[] — the generator and both its
                # consumers stream 8-byte fingerprints instead of 20-char
                # strings hashed in a later Project (guide §2.3 narrower
                # types; with the min/max dup test below: 3.77 -> 3.24 s
                # at sf0.1).
                f"transform(CASE WHEN length(text) >= {_SPAN_GRAM}"
                f"               THEN sequence(1, length(text) - {_SPAN_GRAM} + 1)"
                f"               ELSE array() END,"
                f" i -> xxhash64(substring(text, i, {_SPAN_GRAM})))"
            )
        ).alias("idx", "gram_h"),
    ).select(
        "doc_id",
        (F.col("idx") + 1).alias("pos"),
        "gram_h",
    )
    # Round 13 (guide §2.4 remove shuffles outright / §4.2 batch the
    # boundary): the r12 form consumed the gram stream TWICE — a
    # min/max dup-set aggregate plus a shuffle_hash semi-join probe —
    # so the explode + xxhash64 pass over every character ran twice
    # and the stream crossed two exchanges (grams by gram_h + the
    # partial-agg relation). Here the stream is exploded ONCE, crosses
    # ONE hash exchange on gram_h, and the "gram appears in >1 doc"
    # test runs as a vectorized per-partition numpy kernel: lexsort by
    # (gram_h, doc_id), a run of equal hashes is duplicated iff its
    # first and last doc differ (docs are sorted within the run — the
    # same min!=max test as the r12 aggregate). Measured 3.69 ->
    # 2.42 s noop best-of-3 at sf0.1 (plan: 2 Generate -> 1,
    # 3 Exchange -> 2, semi-join gone); hash-green vs the DuckDB
    # oracle at sf0.001/0.01/0.1.
    #
    # Partition-output determinism: a row's emission depends only on
    # the global multiset of (gram_h, doc_id) pairs sharing its hash —
    # all of which land in its partition — never on batch or partition
    # boundaries. The kernel holds one partition's gram slice
    # (~24 B/row); adaptive_kernel_partitions bounds that slice by
    # bytes at corpus scale (x24: Catalyst's estimate is the text scan
    # size, the gram stream is ~24 bytes per character) while pinning
    # the r12 defaultParallelism floor here, where AQE coalescing
    # would serialize the kernel stage.
    from laser_hadoop_spark.session import adaptive_kernel_partitions

    n_part = adaptive_kernel_partitions(grams, multiplier=24.0)

    def dup_hits(it):
        import pandas as pd

        chunks = [pdf for pdf in it if len(pdf)]
        if not chunks:
            return
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        gh = pdf["gram_h"].values
        doc = pdf["doc_id"].values
        order = np.lexsort((doc, gh))
        gh_s = gh[order]
        doc_s = doc[order]
        new_run = np.empty(len(gh_s), dtype=bool)
        new_run[0] = True
        np.not_equal(gh_s[1:], gh_s[:-1], out=new_run[1:])
        starts = np.flatnonzero(new_run)
        ends = np.concatenate((starts[1:], [len(gh_s)]))  # exclusive
        dup = doc_s[starts] != doc_s[ends - 1]
        sel = order[dup[np.cumsum(new_run) - 1]]
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].values[sel], "pos": pdf["pos"].values[sel]}
        )

    hits = grams.repartition(n_part, "gram_h").mapInPandas(
        dup_hits, "doc_id bigint, pos int"
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = hits.select(
        "doc_id",
        "pos",
        F.when(
            F.col("pos") <= F.max(F.col("pos") + _SPAN_GRAM - 1).over(w_prev),
            0,
        )
        .otherwise(1)
        .alias("is_start"),
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    spans = islands.select(
        "doc_id", "pos", F.sum("is_start").over(w_run).alias("span_id")
    )
    sized = spans.groupBy("doc_id", "span_id").agg(
        (F.max("pos") - F.min("pos") + _SPAN_GRAM).alias("span_chars")
    )
    per_doc = sized.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_spans"),
        F.sum("span_chars").cast("bigint").alias("dup_chars"),
        F.max("span_chars").cast("bigint").alias("longest_span"),
    )
    dc = F.col("dup_chars") * 10000
    joined = per_doc.join(d.select("doc_id", "n_chars"), "doc_id")
    return (
        joined.select(
            "doc_id",
            "n_spans",
            "dup_chars",
            "longest_span",
            ((dc - dc % F.col("n_chars")) / F.col("n_chars"))
            .cast("bigint")
            .alias("dup_ratio_bp"),
        )
        .orderBy(F.desc("dup_chars"), "doc_id")
        .limit(_SPAN_TOP)
    )
