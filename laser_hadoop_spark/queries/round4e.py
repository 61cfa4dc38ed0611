"""Round-4 widening queries, fifth batch (SURVEY.md §2.13, X137-X143).

Survival analysis and ML-data-prep shapes: Nelson-Aalen cumulative
hazard (additive, so it fixed-points exactly where Kaplan-Meier's
product cannot), deterministic negative-sampling pairs for contrastive
training, a reproducible hash-based train/val/test split, and a
compression-ratio text-quality signal (rows-only: zlib has no SQL
twin; exactness pinned by a pytest reference instead).

Cross-engine discipline unchanged: integer micro/bp fixed points, the
two-pass cumulative operator wherever a global order is walked,
DIV == //, identical aliases both sides.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table


@register(
    "q_nelson_aalen",
    oracle="""
    WITH signup AS (
        SELECT user_id, MIN(epoch_us(ts)) AS t0
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS t1
        FROM events e JOIN signup s ON s.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.t0
        GROUP BY e.user_id
    ),
    subj AS (
        SELECT s.user_id,
               CASE WHEN c.t1 IS NULL THEN 0 ELSE 1 END AS converted,
               COALESCE(c.t1 - s.t0, -1) AS dur_us
        FROM signup s LEFT JOIN conv c ON c.user_id = s.user_id
    ),
    n_tot AS (SELECT COUNT(*) AS n FROM subj),
    ev AS (
        SELECT dur_us, COUNT(*) AS d
        FROM subj WHERE converted = 1 GROUP BY dur_us
    ),
    ordered AS (
        SELECT dur_us, d,
               SUM(d) OVER (ORDER BY dur_us ROWS BETWEEN UNBOUNDED
                            PRECEDING AND CURRENT ROW) AS cum_d
        FROM ev
    ),
    hazard AS (
        SELECT dur_us, d,
               t.n - cum_d + d AS at_risk,
               SUM(d * 1000000 // (t.n - cum_d + d))
                   OVER (ORDER BY dur_us ROWS BETWEEN UNBOUNDED
                         PRECEDING AND CURRENT ROW) AS ch
        FROM ordered CROSS JOIN n_tot t
    )
    SELECT dur_us, CAST(d AS BIGINT) AS n_events,
           CAST(at_risk AS BIGINT) AS at_risk,
           CAST(ch AS BIGINT) AS cum_hazard_micro
    FROM hazard
    """,
)
def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X137: Nelson-Aalen cumulative hazard (signup -> purchase).

    Survival analysis with right-censoring: users who never purchase
    are censored (they leave the risk set only at +inf, so at-risk
    counts stay honest). Nelson-Aalen is the estimator CHOSEN FOR
    EXACTNESS: it is a running SUM of d_i/n_i — each term fixed-points
    to micro-units by truncating integer division and the sum stays in
    bigints — where Kaplan-Meier's PRODUCT of (1 - d_i/n_i) cannot be
    fixed-pointed without compounding rounding. Both cumulative walks
    (event counts for the risk set, then the hazard itself) run
    through the two-pass operator; the event-time relation is the
    distinct duration domain, not per-user rows.
    """
    from laser_hadoop_spark.operators.cumulative import ordered_cumsum

    ev = table(spark, sf_dir, "events")
    t_us = F.unix_micros("ts")
    signup = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(t_us).alias("t0"))
    )
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", t_us.alias("t1"))
        .join(signup, "user_id")
        .where(F.col("t1") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("t1").alias("t1"))
    )
    subj = signup.join(conv, "user_id", "left").select(
        "user_id",
        F.when(F.col("t1").isNull(), 0).otherwise(1).alias("converted"),
        F.coalesce(F.col("t1") - F.col("t0"), F.lit(-1)).alias("dur_us"),
    )
    n_tot = subj.agg(F.count("*").alias("n"))
    evts = (
        subj.where(F.col("converted") == 1)
        .groupBy("dur_us")
        .agg(F.count("*").alias("d"))
    )
    ordered = ordered_cumsum(evts, order_by=["dur_us"], values={"d": "cum_d"})
    with_risk = ordered.crossJoin(F.broadcast(n_tot)).select(
        "dur_us",
        "d",
        (F.col("n") - F.col("cum_d") + F.col("d")).alias("at_risk"),
        F.expr("d * 1000000 DIV (n - cum_d + d)").alias("term"),
    )
    hazard = ordered_cumsum(
        with_risk, order_by=["dur_us"], values={"term": "ch"}
    )
    return hazard.select(
        "dur_us",
        F.col("d").cast("bigint").alias("n_events"),
        F.col("at_risk").cast("bigint").alias("at_risk"),
        F.col("ch").cast("bigint").alias("cum_hazard_micro"),
    )


@register(
    "q_negative_pairs",
    tags=("pairs",),
    oracle="""
    WITH ranked AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS rnk,
               COUNT(*) OVER () AS n
        FROM documents
    ),
    negs AS (
        SELECT a.doc_id AS anchor_id, a.rnk, a.n, j.j,
               (a.rnk + j.j * 7919) % a.n AS neg_rnk
        FROM ranked a CROSS JOIN (SELECT UNNEST([1, 2]) AS j) j
    )
    SELECT n.anchor_id, CAST(n.j AS INT) AS neg_idx, b.doc_id AS negative_id
    FROM negs n JOIN ranked b ON b.rnk = n.neg_rnk
    WHERE b.doc_id <> n.anchor_id
    """,
)
def q_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X138: deterministic negative sampling for contrastive training.

    Every document paired with 2 pseudo-random negatives chosen by
    modular stride over the dense rank domain: neg_rank = (rank +
    j*7919) mod n — reproducible on any engine, any partitioning, any
    run (the property torch-style random.choice negatives never have),
    and stride 7919 (prime) decorrelates neighbors. The dense rank
    comes from the two-pass cumulative operator; pairing is an
    equi-join on the computed rank — no randomness, no collect, no
    skew (every rank appears exactly twice on the build side).
    Self-pairs (possible when n divides the stride pattern) are
    dropped on both engines.
    """
    from laser_hadoop_spark.operators.cumulative import ordered_cumsum

    d = table(spark, sf_dir, "documents").select("doc_id")
    ranked = ordered_cumsum(d, order_by=["doc_id"], row_number_col="rn")
    n_tot = d.agg(F.count("*").alias("n"))
    ranked = ranked.crossJoin(F.broadcast(n_tot)).select(
        "doc_id", (F.col("rn") - 1).alias("rnk"), "n"
    )
    negs = ranked.select(
        F.col("doc_id").alias("anchor_id"),
        "rnk",
        "n",
        F.explode(F.array(F.lit(1), F.lit(2))).alias("j"),
    ).select(
        "anchor_id",
        F.col("j").cast("int").alias("neg_idx"),
        F.expr("(rnk + j * 7919) % n").alias("neg_rnk"),
    )
    b = ranked.select(F.col("rnk").alias("neg_rnk"), F.col("doc_id").alias("negative_id"))
    return (
        negs.join(b, "neg_rnk")
        .where(F.col("negative_id") != F.col("anchor_id"))
        .select("anchor_id", "neg_idx", "negative_id")
    )


@register(
    "q_train_split",
    oracle="""
    WITH assigned AS (
        SELECT doc_id, n_chars,
               CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) % 100 AS bucket
        FROM documents
    ),
    labeled AS (
        SELECT CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split,
               n_chars
        FROM assigned
    )
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars
    FROM labeled GROUP BY split
    """,
)
def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X139: reproducible hash-based train/val/test split (80/10/10).

    Split membership = md5(doc_id) mod 100 — stable across engines,
    runs, partitionings, and INSERTIONS (a new document never moves an
    old one between splits, which a rank-based split cannot promise).
    The audit output is per-split doc and char counts; the same bucket
    expression is the filter a training exporter would push to the
    scan. Scan-local hashing, one 3-group aggregate.
    """
    d = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 100
    )
    labeled = d.select(
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
        "n_chars",
    )
    return labeled.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
    )


@register("q_compress_ratio", oracle=None)
def q_compress_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X140: zlib compression ratio as a text-quality signal
    (rows-only: no SQL twin for DEFLATE — exactness is pinned by the
    pytest reference against python zlib instead).

    Highly compressible text is boilerplate/repetition; nearly
    incompressible text is noise — pretraining curation keeps the
    middle band (the Gopher/RefinedWeb heuristic family, X26's
    repetition ratio measured a different way). ratio_bp =
    compressed_len * 10000 // raw_len at zlib level 6, computed in an
    Arrow-batched pandas UDF (CPU-bound per row, embarrassingly
    parallel; the same small-file repartition as every text kernel).
    Deterministic: zlib level 6 output length is fixed for fixed
    input.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def comp_len(texts: pd.Series) -> pd.Series:
        import zlib

        return texts.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), 6)) if t else 0
        )

    d = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    raw_len = F.length(F.col("text").cast("binary"))
    return d.select(
        "doc_id",
        raw_len.alias("raw_len"),
        comp_len("text").alias("compressed_len"),
    ).select(
        "doc_id",
        "raw_len",
        "compressed_len",
        F.expr("compressed_len * 10000 DIV raw_len").alias("ratio_bp"),
    )


@register(
    "q_quantile_normalize",
    oracle="""
    WITH v AS (
        SELECT l_returnflag AS grp,
               CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS p,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY CAST(FLOOR(l_extendedprice * 100
                                                      + 0.5) AS BIGINT),
                                           l_orderkey, l_linenumber) AS rn
        FROM lineitem
    ),
    ref AS (
        SELECT rn, CAST(SUM(p) AS BIGINT) AS sum_p,
               COUNT(*) AS n_grps
        FROM v GROUP BY rn
    )
    SELECT v.grp, v.rn AS rank_in_group, v.p AS orig_centi,
           CAST(ref.sum_p // ref.n_grps AS BIGINT) AS normalized_centi
    FROM v JOIN ref ON ref.rn = v.rn
    WHERE v.rn <= 100
    """,
)
def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X141: quantile normalization across groups.

    The bioinformatics normalization the reference's domain lives on
    (expression/genotype matrices): replace each group's k-th ranked
    value with the MEAN of k-th ranked values across all groups, so
    every group ends with an identical distribution. Ranks come from
    ONE two-pass global rank in (group, value, keys) order minus
    broadcast per-group offsets (the X116 shape — no 3-partition
    funnel); the reference distribution is a rank-keyed aggregate;
    truncating integer mean. Output limited to the first 100 ranks per
    group to keep the verified relation small — the full-width form is
    the same plan.
    """
    from laser_hadoop_spark.operators.cumulative import ordered_cumsum

    li = table(spark, sf_dir, "lineitem")
    p = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
    v = li.select(
        F.col("l_returnflag").alias("grp"),
        p.alias("p"),
        "l_orderkey",
        "l_linenumber",
    )
    ranked = ordered_cumsum(
        v,
        order_by=["grp", "p", "l_orderkey", "l_linenumber"],
        row_number_col="grn",
    )
    offs = ranked.groupBy("grp").agg(F.min("grn").alias("off"))
    v = ranked.join(F.broadcast(offs), "grp").select(
        "grp", "p", (F.col("grn") - F.col("off") + 1).alias("rn")
    )
    ref = v.groupBy("rn").agg(
        F.sum("p").cast("bigint").alias("sum_p"), F.count("*").alias("n_grps")
    )
    return (
        v.where(F.col("rn") <= 100)
        .join(ref, "rn")
        .select(
            "grp",
            F.col("rn").alias("rank_in_group"),
            F.col("p").alias("orig_centi"),
            F.expr("CAST(sum_p DIV n_grps AS BIGINT)").alias("normalized_centi"),
        )
    )


@register(
    "q_containment_pairs",
    tags=("pairs",),
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
        SELECT DISTINCT doc_id,
               UNNEST(list_transform(generate_series(1, len(t) - 2),
                                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                   AS g
        FROM toks WHERE len(t) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_g FROM grams GROUP BY doc_id),
    shared AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
        FROM grams a JOIN grams b
          ON a.g = b.g AND a.doc_id <> b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT s.doc_a, s.doc_b,
           CAST(s.n_shared AS BIGINT) AS n_shared,
           CAST(sa.n_g AS BIGINT) AS n_grams_a,
           CAST(s.n_shared * 10000 // sa.n_g AS BIGINT) AS containment_bp
    FROM shared s
    JOIN sizes sa ON sa.doc_id = s.doc_a
    WHERE s.n_shared * 10 >= sa.n_g * 9
    """,
)
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X142: asymmetric containment dedup (quote/subset detection).

    Pairs where >= 90% of document A's distinct 3-gram shingles appear
    in document B — the containment direction Jaccard misses entirely
    (a short document quoted inside a long one scores near-zero
    Jaccard but containment ~1; RefinedWeb-class pipelines need both).
    Candidates come from the shingle equi-join (the X-series dedup
    backbone: 8-byte-ish keys, never all-pairs); containment_bp is a
    truncating integer ratio against the CONTAINED side's shingle
    count. Asymmetric by construction: (a,b) and (b,a) are different
    rows with different thresholds.
    """
    d = table(spark, sf_dir, "documents").select("doc_id", "text").repartition(
        spark.sparkContext.defaultParallelism
    )
    t = F.split("text", " ")
    grams = (
        d.where(F.size(t) >= 3)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(0), F.size(t) - 3),
                        lambda i: F.concat_ws(
                            " ",
                            F.element_at(t, i + 1),
                            F.element_at(t, i + 2),
                            F.element_at(t, i + 3),
                        ),
                    )
                )
            ).alias("g"),
        )
        .hint("shuffle_hash")
    )
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n_g"))
    a = grams.alias("a")
    b = grams.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_g").alias("n_grams_a")
    )
    return (
        shared.join(sa, "doc_a")
        .where(F.col("n_shared") * 10 >= F.col("n_grams_a") * 9)
        .select(
            "doc_a",
            "doc_b",
            F.col("n_shared").cast("bigint").alias("n_shared"),
            F.col("n_grams_a").cast("bigint").alias("n_grams_a"),
            F.expr(
                "CAST(n_shared * 10000 DIV n_grams_a AS BIGINT)"
            ).alias("containment_bp"),
        )
    )


@register(
    "q_seasonal_residual",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(dayofweek(CAST(o_orderdate AS DATE)) AS INT) AS dow,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev
        FROM orders GROUP BY 1, 2
    ),
    dow_stats AS (
        SELECT dow, COUNT(*) AS n_dow, SUM(rev) AS sum_dow
        FROM daily GROUP BY dow
    )
    SELECT d.d AS day, CAST(d.rev AS BIGINT) AS rev_centi,
           CAST(d.rev * s.n_dow - s.sum_dow AS BIGINT) AS residual_scaled,
           CAST(s.n_dow AS BIGINT) AS n_dow
    FROM daily d JOIN dow_stats s ON s.dow = d.dow
    ORDER BY ABS(d.rev * s.n_dow - s.sum_dow) DESC, d.d
    LIMIT 10
    """,
)
def q_seasonal_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X143: deseasonalized residual anomalies (top-10 days).

    The days whose revenue deviates most from their own day-of-week
    mean — seasonality-aware anomaly detection (a Saturday is compared
    with Saturdays, X86's profile applied as a filter). The residual
    cross-multiplies into exact integers: rev*n_dow - sum_dow is the
    deviation scaled by the day count, so no mean division ever runs.
    Deterministic top-10 via (|residual|, date); TakeOrderedAndProject,
    two small aggregates, one broadcast join.
    """
    o = table(spark, sf_dir, "orders")
    centi = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    daily = (
        o.select(
            F.col("o_orderdate").cast("date").alias("d"),
            F.dayofweek(F.col("o_orderdate").cast("date")).cast("int").alias("dow"),
            centi.alias("rev"),
        )
        .groupBy("d", "dow")
        .agg(F.sum("rev").alias("rev"))
    )
    dow_stats = daily.groupBy("dow").agg(
        F.count("*").alias("n_dow"), F.sum("rev").alias("sum_dow")
    )
    joined = daily.join(F.broadcast(dow_stats), "dow").select(
        F.col("d").alias("day"),
        F.col("rev").alias("rev_centi"),
        (F.col("rev") * F.col("n_dow") - F.col("sum_dow"))
        .cast("bigint")
        .alias("residual_scaled"),
        F.col("n_dow").cast("bigint").alias("n_dow"),
    )
    return joined.orderBy(
        F.abs(F.col("residual_scaled")).desc(), F.asc("day")
    ).limit(10)
