"""Round-4 widening queries, fourth batch (SURVEY.md §2.13, X131-X134).

Graph, anomaly, and changepoint shapes, each oracle-backed: bounded-hop
weighted shortest paths (Bellman-Ford iterations vs a recursive-CTE
min-cost oracle), rolling z-score anomaly counts with the comparison
cross-multiplied into pure integers, CUSUM changepoint detection over
the two-pass cumulative operator, and segment purchase-profile cosine
similarity with a squared-cosine integer core.

Cross-engine discipline unchanged: centi bigints, DIV == //, HUGEINT /
DECIMAL(38,0) where squares overflow int64, unique window tiebreakers,
identical aliases both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table


@register(
    "q_bellman_ford",
    oracle="""
    WITH RECURSIVE edges AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst,
               COUNT(*) AS w
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
    ),
    s AS (SELECT MIN(l_partkey) AS root FROM lineitem),
    walk AS (
        SELECT root AS node, CAST(0 AS BIGINT) AS cost, 0 AS hops FROM s
        UNION
        SELECT e.dst AS node, w.cost + e.w AS cost, w.hops + 1 AS hops
        FROM walk w JOIN edges e ON e.src = w.node
        WHERE w.hops < 3
    )
    SELECT CAST(node AS BIGINT) AS partkey,
           CAST(MIN(cost) AS BIGINT) AS min_cost
    FROM walk GROUP BY node
    """,
)
def q_bellman_ford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X131: bounded-hop weighted shortest paths (Bellman-Ford).

    Minimum-cost path (<= 3 hops) from the smallest partkey over the
    co-purchase graph, edge weight = co-occurrence count — the
    weighted sibling of X113's BFS, verified against DuckDB's
    recursive CTE taking MIN(cost) over all bounded walks. The Spark
    side runs 3 Bellman-Ford relaxations: each is one equi-join of the
    current best-costs against the cached weighted edge list plus a
    min-combine — never an all-walks enumeration, so while the
    oracle's walk closure is exponential in hops, the engine's work is
    O(hops * |edges|). Iteration k's state holds min cost over <= k
    hops, matching the CTE's group-wise MIN exactly (integer costs, no
    ordering ambiguity).
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
        .cache()
    )
    best = li.agg(F.min("l_partkey").alias("node")).select(
        "node", F.lit(0).cast("bigint").alias("cost")
    )
    for _ in range(3):
        relaxed = (
            best.join(edges, best.node == edges.src)
            .select(
                F.col("dst").alias("node"),
                (F.col("cost") + F.col("w")).alias("cost"),
            )
        )
        best = (
            best.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
        )
    return best.select(
        F.col("node").cast("bigint").alias("partkey"),
        F.col("cost").cast("bigint").alias("min_cost"),
    )


@register(
    "q_rolling_zscore",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS x,
               epoch_us(ts) AS t_us
        FROM events
    ),
    stats AS (
        SELECT user_id, event_id, x,
               COUNT(*) OVER w AS n,
               SUM(x) OVER w AS sx,
               SUM(x * x) OVER w AS sxx
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id
                     ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN n >= 4
                          AND CAST((n * x - sx) AS HUGEINT)
                              * CAST((n * x - sx) AS HUGEINT)
                              > 9 * CAST(n AS HUGEINT)
                                  * (CAST(n AS HUGEINT) * sxx
                                     - CAST(sx AS HUGEINT) * sx)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
           COUNT(*) AS n_events
    FROM stats GROUP BY user_id
    """,
)
def q_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X132: rolling z-score anomaly counts, pure-integer comparison.

    Events whose value deviates > 3 sigma from the mean/std of the
    user's previous <= 8 events (frame excludes the current row — no
    self-contamination). The |z| > 3 test cross-multiplies into
    integers: (n*x - sx)^2 > 9 * n * (n*sxx - sx^2) — no division, no
    sqrt, no float, so both engines count identical anomalies
    (HUGEINT/DECIMAL38 for the squares). Warm-up rows (n < 4) don't
    count. One user_id shuffle shared by the frame window and the
    final per-user rollup — the online-monitoring shape, batch form.
    """
    ev = table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("x"),
        F.unix_micros("ts").alias("t_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "event_id")
        .rowsBetween(-8, -1)
    )
    stats = e.select(
        "user_id",
        "x",
        F.count("*").over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
    )
    dec = lambda c: f"CAST({c} AS DECIMAL(38,0))"  # noqa: E731
    anomaly = F.expr(
        f"n >= 4 AND {dec('n * x - sx')} * {dec('n * x - sx')} "
        f"> 9 * {dec('n')} * ({dec('n')} * sxx - {dec('sx')} * sx)"
    )
    return stats.groupBy("user_id").agg(
        F.sum(F.when(anomaly, 1).otherwise(0)).cast("bigint").alias("n_anomalies"),
        F.count("*").alias("n_events"),
    )


@register(
    "q_cusum_changepoint",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev
        FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ),
    tot AS (SELECT COUNT(*) AS n, SUM(rev) AS srev FROM daily),
    cum AS (
        SELECT d,
               SUM(rev) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cumrev,
               ROW_NUMBER() OVER (ORDER BY d) AS rn
        FROM daily
    ),
    dev AS (
        SELECT d, ABS(CAST(t.n AS HUGEINT) * cumrev
                      - CAST(rn AS HUGEINT) * t.srev) AS s_abs
        FROM cum CROSS JOIN tot t
    )
    SELECT d AS changepoint_day,
           CAST(s_abs AS VARCHAR) AS s_abs_str
    FROM dev ORDER BY s_abs DESC, d LIMIT 1
    """,
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X133: CUSUM changepoint over the daily revenue series.

    The day t maximizing |S_t|, S_t = sum_{i<=t}(rev_i - mean) — the
    classic single-changepoint estimator. Scaled by n to stay
    integral: n*S_t = n*cumrev_t - t*total, an exact wide integer
    (HUGEINT / DECIMAL38 — cumrev * n overflows int64 at sf1), emitted
    as a string because a 96-bit magnitude can't ride a BIGINT column
    through the comparator. The cumulative revenue runs through the
    two-pass operator; argmax breaks ties to the earliest day. One
    ordered pass + one top-1.
    """
    from laser_hadoop_spark.operators.cumulative import ordered_cumsum

    o = table(spark, sf_dir, "orders")
    centi = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    daily = (
        o.select(F.col("o_orderdate").cast("date").alias("d"), centi.alias("rev"))
        .groupBy("d")
        .agg(F.sum("rev").alias("rev"))
    )
    cum = ordered_cumsum(
        daily, order_by=["d"], values={"rev": "cumrev"}, row_number_col="rn"
    )
    tot = daily.agg(F.count("*").alias("n"), F.sum("rev").alias("srev"))
    dec = lambda c: f"CAST({c} AS DECIMAL(38,0))"  # noqa: E731
    dev = cum.crossJoin(F.broadcast(tot)).select(
        "d",
        F.expr(f"ABS({dec('n')} * cumrev - {dec('rn')} * srev)").alias("s_abs"),
    )
    return (
        dev.orderBy(F.desc("s_abs"), F.asc("d"))
        .limit(1)
        .select(
            F.col("d").alias("changepoint_day"),
            F.col("s_abs").cast("decimal(38,0)").cast("string").alias("s_abs_str"),
        )
    )


@register(
    "q_profile_cosine",
    oracle="""
    WITH prof AS (
        SELECT c.c_mktsegment AS segment, o.o_orderpriority AS prio,
               COUNT(*) AS cnt
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY c.c_mktsegment, o.o_orderpriority
    ),
    dots AS (
        SELECT a.segment AS seg_a, b.segment AS seg_b,
               SUM(CAST(a.cnt AS HUGEINT) * b.cnt) AS dot
        FROM prof a JOIN prof b
          ON a.prio = b.prio AND a.segment < b.segment
        GROUP BY a.segment, b.segment
    ),
    norms AS (
        SELECT segment, SUM(CAST(cnt AS HUGEINT) * cnt) AS nrm FROM prof
        GROUP BY segment
    )
    SELECT d.seg_a, d.seg_b,
           CAST(d.dot * d.dot * 1000000 // (na.nrm * nb.nrm) AS BIGINT)
               AS cos2_micro
    FROM dots d
    JOIN norms na ON na.segment = d.seg_a
    JOIN norms nb ON nb.segment = d.seg_b
    """,
)
def q_profile_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X134: cosine similarity between segment purchase profiles.

    Each market segment's priority-count vector, compared pairwise by
    SQUARED cosine in micro-units: cos^2 = dot^2 / (|a|^2 * |b|^2) is
    a ratio of exact integers, so no sqrt ever runs — monotone in
    cosine for non-negative count vectors, hence the same similarity
    ranking, fully hash-verifiable (the trick the embedding-float
    cosine paths can't use). Wide-integer (HUGEINT / DECIMAL38)
    products; pairs via an equi-join on the vector index over the tiny
    profile aggregate.
    """
    from laser_hadoop_spark.tables import register_views

    register_views(spark, sf_dir, names=("orders", "customer"))
    dec = lambda c: f"CAST({c} AS DECIMAL(38,0))"  # noqa: E731
    return spark.sql(
        f"""
    WITH prof AS (
        SELECT c.c_mktsegment AS segment, o.o_orderpriority AS prio,
               COUNT(*) AS cnt
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY c.c_mktsegment, o.o_orderpriority
    ),
    dots AS (
        SELECT a.segment AS seg_a, b.segment AS seg_b,
               SUM({dec('a.cnt')} * b.cnt) AS dot
        FROM prof a JOIN prof b
          ON a.prio = b.prio AND a.segment < b.segment
        GROUP BY a.segment, b.segment
    ),
    norms AS (
        SELECT segment, SUM({dec('cnt')} * cnt) AS nrm FROM prof
        GROUP BY segment
    )
    SELECT d.seg_a, d.seg_b,
           CAST((d.dot * d.dot * 1000000
                 - (d.dot * d.dot * 1000000) % (na.nrm * nb.nrm))
                / (na.nrm * nb.nrm) AS BIGINT) AS cos2_micro
    FROM dots d
    JOIN norms na ON na.segment = d.seg_a
    JOIN norms nb ON nb.segment = d.seg_b
    """
    )


def _minhash_band_sql() -> str:
    """Shared SQL skeleton for X135 (DuckDB side): signatures pivoted
    wide, 4 bands of 2 seeds, candidate pairs from band equality,
    estimated Jaccard from seed agreement."""
    return """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               UNNEST(list_transform(generate_series(1, len(t) - 2),
                                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                   AS shingle
        FROM toks WHERE len(t) >= 3
    ),
    seeds AS (SELECT UNNEST(generate_series(0, 7)) AS seed),
    sigs AS (
        SELECT doc_id, seed,
               MIN(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS mh
        FROM sh CROSS JOIN seeds GROUP BY doc_id, seed
    ),
    wide AS (
        SELECT doc_id,
               MIN(CASE WHEN seed = 0 THEN mh END) AS s0,
               MIN(CASE WHEN seed = 1 THEN mh END) AS s1,
               MIN(CASE WHEN seed = 2 THEN mh END) AS s2,
               MIN(CASE WHEN seed = 3 THEN mh END) AS s3,
               MIN(CASE WHEN seed = 4 THEN mh END) AS s4,
               MIN(CASE WHEN seed = 5 THEN mh END) AS s5,
               MIN(CASE WHEN seed = 6 THEN mh END) AS s6,
               MIN(CASE WHEN seed = 7 THEN mh END) AS s7
        FROM sigs GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, 0 AS band, s0 || '|' || s1 AS bv FROM wide
        UNION ALL SELECT doc_id, 1, s2 || '|' || s3 FROM wide
        UNION ALL SELECT doc_id, 2, s4 || '|' || s5 FROM wide
        UNION ALL SELECT doc_id, 3, s6 || '|' || s7 FROM wide
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           CAST((CASE WHEN wa.s0 = wb.s0 THEN 1 ELSE 0 END
               + CASE WHEN wa.s1 = wb.s1 THEN 1 ELSE 0 END
               + CASE WHEN wa.s2 = wb.s2 THEN 1 ELSE 0 END
               + CASE WHEN wa.s3 = wb.s3 THEN 1 ELSE 0 END
               + CASE WHEN wa.s4 = wb.s4 THEN 1 ELSE 0 END
               + CASE WHEN wa.s5 = wb.s5 THEN 1 ELSE 0 END
               + CASE WHEN wa.s6 = wb.s6 THEN 1 ELSE 0 END
               + CASE WHEN wa.s7 = wb.s7 THEN 1 ELSE 0 END)
               * 10000 // 8 AS BIGINT) AS est_jaccard_bp
    FROM cand c
    JOIN wide wa ON wa.doc_id = c.doc_a
    JOIN wide wb ON wb.doc_id = c.doc_b
    """


@register("q_minhash_band_pairs", oracle=_minhash_band_sql(), tags=("pairs",))
def q_minhash_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X135: MinHash LSH banding, exactly verified end-to-end.

    The full LSH candidate-generation pipeline on the ORACLE-BACKED
    signature matrix (X102's md5 MinHash): 4 bands x 2 seeds, candidate
    pairs from band-value equality, estimated Jaccard = seed-agreement
    fraction in bp. Where L2's pyspark.ml MinHashLSH is rows-only
    (library seeds), every stage here is bit-for-bit verifiable —
    banding probability, collision behavior, and the estimator itself
    become testable artifacts. Plan: the wide signature matrix computes
    scan-local (minhash_mins), bands explode 4x per doc, candidates
    come from a band-key equi-join (never all-pairs), and the pair
    scoring joins the 9-column signature rows — at 100 TB the shuffle
    carries 16-byte digests, never text.
    """
    from laser_hadoop_spark.queries.round4 import minhash_mins

    # localCheckpoint instead of cache: both pin the frame for the
    # multi-consumer plan (bands + two signature joins), but the
    # checkpointed RDD is reclaimed by the ContextCleaner as soon as
    # the DataFrame is garbage collected — a bare cache() accumulated
    # one pinned signature-matrix copy per invocation (review finding)
    wide = minhash_mins(spark, sf_dir).localCheckpoint(eager=False)
    band_exprs = ", ".join(
        f"{b}, concat(s{2*b}, '|', s{2*b+1})" for b in range(4)
    )
    bands = wide.select(
        "doc_id", F.expr(f"stack(4, {band_exprs}) AS (band, bv)")
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    wa = wide.alias("wa")
    wb = wide.alias("wb")
    agree = sum(
        F.when(F.col(f"wa.s{k}") == F.col(f"wb.s{k}"), 1).otherwise(0)
        for k in range(8)
    )
    return (
        cand.join(wa, F.col("doc_a") == F.col("wa.doc_id"))
        .join(wb, F.col("doc_b") == F.col("wb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (agree * 1250).cast("bigint").alias("est_jaccard_bp"),
        )
    )


@register(
    "q_mixture_weights",
    oracle="""
    WITH src AS (
        SELECT source, COUNT(*) AS n_docs, SUM(n_chars) AS n_chars
        FROM documents GROUP BY source
    ),
    tot AS (
        SELECT SUM(n_docs) AS total_docs, SUM(n_chars) AS total_chars
        FROM src
    )
    SELECT s.source, CAST(s.n_docs AS BIGINT) AS n_docs,
           CAST(s.n_chars AS BIGINT) AS n_chars,
           CAST(LEAST(CAST(10000 AS BIGINT),
                      CAST(s.n_chars AS BIGINT) * t.total_docs * 10000
                      // (t.total_chars * s.n_docs)) AS BIGINT) AS keep_bp,
           CAST(s.n_docs * LEAST(CAST(10000 AS BIGINT),
                      CAST(s.n_chars AS BIGINT) * t.total_docs * 10000
                      // (t.total_chars * s.n_docs)) // 10000 AS BIGINT)
               AS expected_kept
    FROM src s CROSS JOIN tot t
    """,
)
def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X136: corpus mixture re-weighting (data-mixing plan).

    Per-source keep probability that re-weights the corpus from its
    actual document-share toward a target share (here: proportional to
    each source's total characters — the "sample long-form sources up"
    policy): keep_bp = min(1, target_share / actual_share) in basis
    points, all truncating integer arithmetic. This is the sampling
    table a pretraining data-mixing stage feeds to X13's quota
    sampler; expected_kept makes the plan auditable before any
    sampling runs. One source-key aggregate + a broadcast scalar.
    """
    d = table(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("n_chars")
    )
    tot = src.agg(
        F.sum("n_docs").alias("total_docs"), F.sum("n_chars").alias("total_chars")
    )
    keep = F.expr(
        "LEAST(CAST(10000 AS BIGINT), "
        "CAST(n_chars AS BIGINT) * total_docs * 10000 "
        "DIV (total_chars * n_docs))"
    )
    return (
        src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_chars").cast("bigint").alias("n_chars"),
            keep.cast("bigint").alias("keep_bp"),
            F.expr(
                "CAST(n_docs * LEAST(CAST(10000 AS BIGINT), "
                "CAST(n_chars AS BIGINT) * total_docs * 10000 "
                "DIV (total_chars * n_docs)) DIV 10000 AS BIGINT)"
            ).alias("expected_kept"),
        )
    )
