"""Round-4 widening queries (SURVEY.md §2.13, X97-X106).

New operator shapes, each oracle-backed: PIVOT (the one relational op
the suite lacked), distributed weighted median (reusing
operators/cumulative.ordered_cumsum), interval-union sweep, skyline /
Pareto-front, bigram-PMI collocations, oracle-backed MinHash
signatures (md5-based so Spark and DuckDB agree bit-for-bit),
run-length encoding of event streams, bidirectional nearest-event
join, Zipf rank-frequency fit, and CDC latest-state compaction.

Cross-engine discipline as everywhere in this repo: money/weights in
exact centi-unit bigints, event time via unix_micros == epoch_us,
logs fixed-pointed to integer micro-units, every window ordered with a
unique tiebreaker, every computed column aliased identically on both
sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PIVOT_ALIASES = ["urgent_centi", "high_centi", "medium_centi", "notspec_centi", "low_centi"]


@register(
    "q_pivot_table",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(COALESCE(SUM(CASE WHEN o.o_orderpriority = '1-URGENT'
               THEN CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) END), 0)
               AS BIGINT) AS urgent_centi,
           CAST(COALESCE(SUM(CASE WHEN o.o_orderpriority = '2-HIGH'
               THEN CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) END), 0)
               AS BIGINT) AS high_centi,
           CAST(COALESCE(SUM(CASE WHEN o.o_orderpriority = '3-MEDIUM'
               THEN CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) END), 0)
               AS BIGINT) AS medium_centi,
           CAST(COALESCE(SUM(CASE WHEN o.o_orderpriority = '4-NOT SPECIFIED'
               THEN CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) END), 0)
               AS BIGINT) AS notspec_centi,
           CAST(COALESCE(SUM(CASE WHEN o.o_orderpriority = '5-LOW'
               THEN CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) END), 0)
               AS BIGINT) AS low_centi
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
)
def q_pivot_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X97: PIVOT — nation x order-priority revenue matrix.

    The one core relational operator the suite lacked (unpivot landed
    in round 1, X18). Spark's RelationalGroupedDataset.pivot with an
    EXPLICIT value list — never the value-discovering form, which runs
    a hidden distinct job and breaks down when the pivot column's
    cardinality surprises you at 100 TB. Revenue in exact centi
    bigints; absent cells coalesce to 0 on both engines. One shuffle
    (groupBy nation after two broadcast dim joins).
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cent = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(F.col("n_name").alias("nation"), F.col("o_orderpriority"), cent.alias("cent"))
    )
    pivoted = base.groupBy("nation").pivot("o_orderpriority", _PRIORITIES).sum("cent")
    return pivoted.select(
        "nation",
        *[
            F.coalesce(F.col(f"`{p}`"), F.lit(0)).cast("bigint").alias(a)
            for p, a in zip(_PRIORITIES, _PIVOT_ALIASES)
        ],
    )


@register(
    "q_weighted_median",
    oracle="""
    WITH v AS (
        SELECT CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS p,
               CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) AS w,
               l_orderkey, l_linenumber
        FROM lineitem
    ),
    c AS (
        SELECT p, SUM(w) OVER (ORDER BY p, l_orderkey, l_linenumber
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cw
        FROM v
    ),
    t AS (SELECT SUM(w) AS tot FROM v)
    SELECT CAST(MIN(p) AS BIGINT) AS median_price_centi,
           CAST(MIN(tot) AS BIGINT) AS total_weight_centi
    FROM c CROSS JOIN t WHERE 2 * cw >= tot
    """,
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X98: distributed weighted median (quantity-weighted price).

    The lower weighted median: smallest price whose cumulative weight
    reaches half the total. Both price and weight in exact centi
    bigints, via operators/cumulative.ordered_weighted_quantile's
    HISTOGRAM PRUNING: a map-side (min, max, total) pass, a map-side
    4096-bucket weight histogram, and an exact per-value walk over
    ONLY the crossing bucket — the fact table is never shuffled or
    checkpointed (the earlier ordered_cumsum spelling range-shuffled
    + materialized every row and windowed it; bench at sf0.1 dropped
    1.36 s -> ~0.85 s, bounded below by its two column-pruned fact
    scans, and at 100 TB the exact walk touches only the crossing
    bucket's values while everything else is scan + partial
    aggregation).
    """
    from laser_hadoop_spark.operators.cumulative import ordered_weighted_quantile

    li = table(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint").alias("p"),
        F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("bigint").alias("w"),
    )
    return ordered_weighted_quantile(
        li,
        value_col="p",
        weight_col="w",
    ).select(
        F.col("quantile_value").cast("bigint").alias("median_price_centi"),
        F.col("total_weight").cast("bigint").alias("total_weight_centi"),
    )


@register(
    "q_interval_union",
    oracle="""
    WITH iv AS (
        SELECT user_id, epoch_us(ts) AS s_us,
               epoch_us(ts) + 300000000 AS e_us, event_id
        FROM events
    ),
    m AS (
        SELECT *, MAX(e_us) OVER (PARTITION BY user_id
                                  ORDER BY s_us, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS prev_e
        FROM iv
    ),
    f AS (
        SELECT *, CASE WHEN prev_e IS NULL OR s_us > prev_e
                       THEN 1 ELSE 0 END AS new_i
        FROM m
    ),
    g AS (
        SELECT *, SUM(new_i) OVER (PARTITION BY user_id
                                   ORDER BY s_us, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS island
        FROM f
    ),
    isl AS (
        SELECT user_id, island, MAX(e_us) - MIN(s_us) AS cov
        FROM g GROUP BY user_id, island
    )
    SELECT user_id, COUNT(*) AS n_islands,
           CAST(SUM(cov) AS BIGINT) AS covered_us
    FROM isl GROUP BY user_id
    """,
)
def q_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X99: interval-union coverage (sweep-line gaps-and-islands).

    Each event opens a 5-minute activity interval; per user, the total
    UNION length (overlaps collapsed) and the island count — the
    "active time" metric naive SUM(duration) double-counts. Sweep:
    running max of interval end per user (one shuffle on user_id),
    island break where a start clears it, integer epoch-microsecond
    arithmetic end to end. q_max_concurrent sweeps the same shape for
    peak overlap; this one measures coverage.
    """
    ev = table(spark, sf_dir, "events")
    s = F.unix_micros("ts")
    iv = ev.select(
        "user_id", s.alias("s_us"), (s + F.lit(300_000_000)).alias("e_us"), "event_id"
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = iv.withColumn("prev_e", F.max("e_us").over(w_prev)).withColumn(
        "new_i",
        F.when(F.col("prev_e").isNull() | (F.col("s_us") > F.col("prev_e")), 1).otherwise(0),
    )
    islanded = marked.withColumn("island", F.sum("new_i").over(w_cum))
    islands = islanded.groupBy("user_id", "island").agg(
        (F.max("e_us") - F.min("s_us")).alias("cov")
    )
    return islands.groupBy("user_id").agg(
        F.count("*").alias("n_islands"),
        F.sum("cov").cast("bigint").alias("covered_us"),
    )


@register(
    "q_skyline",
    oracle="""
    WITH v AS (
        SELECT p_partkey,
               CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS price_centi,
               p_size
        FROM part
    )
    SELECT a.p_partkey, a.price_centi, CAST(a.p_size AS BIGINT) AS p_size
    FROM v a
    WHERE NOT EXISTS (
        SELECT 1 FROM v b
        WHERE b.price_centi <= a.price_centi AND b.p_size >= a.p_size
          AND (b.price_centi < a.price_centi OR b.p_size > a.p_size)
    )
    """,
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X100: skyline / Pareto-front (min price, max size).

    A part is on the skyline when no other part is at-most-as-expensive
    AND at-least-as-large with one strict. The ORACLE is the quadratic
    NOT EXISTS; the Spark side is the linear sweep: per distinct size,
    the min price; running min over strictly-larger sizes (a window
    over |distinct sizes| rows — bounded by the attribute domain, not
    the table); a part is dominated iff that running min is <= its
    price (strictly larger size) or a same-size part is strictly
    cheaper. Broadcast the per-size frontier back onto the scan — the
    fact side never shuffles.
    """
    p = table(spark, sf_dir, "part").select(
        "p_partkey",
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)).cast("bigint").alias(
            "price_centi"
        ),
        "p_size",
    )
    per_size = p.groupBy("p_size").agg(F.min("price_centi").alias("minp"))
    w_larger = (
        Window.orderBy(F.col("p_size").desc()).rowsBetween(Window.unboundedPreceding, -1)
    )
    # |distinct p_size| rows — the attribute domain (~50), not the table
    frontier = per_size.withColumn("min_larger", F.min("minp").over(w_larger))
    out = (
        p.join(F.broadcast(frontier), "p_size")
        .where(
            (F.col("min_larger").isNull() | (F.col("min_larger") > F.col("price_centi")))
            & (F.col("minp") == F.col("price_centi"))
        )
        .select("p_partkey", "price_centi", F.col("p_size").cast("bigint"))
    )
    return out


@register(
    "q_bigram_pmi",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    uni AS (
        SELECT UNNEST(t) AS w FROM toks
    ),
    uc AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
    n AS (SELECT SUM(c) AS n_tok FROM uc),
    big AS (
        SELECT UNNEST(list_transform(generate_series(1, len(t) - 1),
                                     i -> [t[i], t[i+1]])) AS pair
        FROM toks WHERE len(t) >= 2
    ),
    bc AS (
        SELECT pair[1] AS word_a, pair[2] AS word_b, COUNT(*) AS c_xy
        FROM big GROUP BY word_a, word_b
    )
    SELECT word_a, word_b, c_xy,
           CAST(ROUND(LOG10(CAST(c_xy AS DOUBLE) * n_tok
                            / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)))
                      * 1000000.0) AS BIGINT) AS pmi_micro
    FROM bc
    JOIN uc ca ON ca.w = word_a
    JOIN uc cb ON cb.w = word_b
    CROSS JOIN n
    ORDER BY c_xy DESC, word_a, word_b
    LIMIT 20
    """,
)
def q_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X101: collocation mining — top bigrams with pointwise mutual
    information.

    The classic phrase-detection signal for tokenizer/vocab curation:
    PMI = log10(c_xy * N / (c_x * c_y)) over corpus bigram and unigram
    counts. All counts are exact bigints; the single log10 runs on an
    identically-shaped double expression on both engines and is
    fixed-pointed to integer micro-units (the lm-score discipline), so
    the output is all ints and strings. Bigrams form per doc via one
    lead() window partitioned by doc_id (the tokenize shuffle); the
    two unigram lookups join on the word (AQE broadcasts the vocab
    side when it fits). Top-20 by support with full tiebreak.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    uc = toks.groupBy("w").agg(F.count("*").alias("c"))
    n_tok = uc.agg(F.sum("c").alias("n_tok"))
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    pairs = toks.withColumn("w_next", F.lead("w").over(w_doc)).where(
        F.col("w_next").isNotNull()
    )
    bc = pairs.groupBy(
        F.col("w").alias("word_a"), F.col("w_next").alias("word_b")
    ).agg(F.count("*").alias("c_xy"))
    ca = uc.select(F.col("w").alias("word_a"), F.col("c").alias("c_a"))
    cb = uc.select(F.col("w").alias("word_b"), F.col("c").alias("c_b"))
    pmi_micro = F.round(
        F.log10(
            F.col("c_xy").cast("double")
            * F.col("n_tok")
            / (F.col("c_a").cast("double") * F.col("c_b").cast("double"))
        )
        * F.lit(1_000_000.0)
    ).cast("bigint")
    return (
        bc.join(ca, "word_a")
        .join(cb, "word_b")
        .crossJoin(F.broadcast(n_tok))
        .select("word_a", "word_b", "c_xy", pmi_micro.alias("pmi_micro"))
        .orderBy(F.col("c_xy").desc(), "word_a", "word_b")
        .limit(20)
    )


@register(
    "q_minhash_signatures",
    oracle="""
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
    seeds AS (SELECT UNNEST(generate_series(0, 7)) AS seed)
    SELECT doc_id, CAST(seed AS BIGINT) AS seed,
           MIN(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS min_hash
    FROM sh CROSS JOIN seeds
    GROUP BY doc_id, seed
    """,
)
def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X102: oracle-backed MinHash signature matrix.

    The L2 near-dup path's MinHashLSH is rows-only by nature (library
    hash seeds); THIS variant pins the signature computation itself
    with a hash both engines share: signature[s] = MIN(md5(s || '|' ||
    shingle)) over the doc's distinct 3-gram shingles, for 8 seeds.
    Same min-over-hashed-universe structure as any MinHash — the
    Jaccard estimator applies unchanged — but bit-for-bit verifiable.

    Shape (reworked after the r04 sf0.1 bench showed the naive
    shingles x 8 seeds row explode at 5.7 s): each per-doc signature
    slot is array_min over the shingle array's md5s, computed ENTIRELY
    inside the scan projection — no explode, no join, no aggregate;
    the only plan nodes after the scan are a Project and the
    zero-shuffle stack unpivot (X18). MinHash is per-document math, so
    at 100 TB this is embarrassingly parallel over file splits — the
    textbook case for keeping work inside whole-stage codegen.
    (Duplicate shingles can't change a minimum, so no array_distinct
    pass is needed either.) The small-file repartition spreads the
    hashing across cores when the input is one sub-split parquet file
    (the bench case); on a real multi-split corpus it is a no-op-cost
    rebalance of pointers, and AQE coalesces it.
    """
    mins = minhash_mins(spark, sf_dir)
    pairs = ", ".join(f"CAST({s} AS BIGINT), s{s}" for s in range(8))
    return mins.select(
        "doc_id", F.expr(f"stack(8, {pairs}) AS (seed, min_hash)")
    )


def minhash_mins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide form of the X102 signature matrix: (doc_id, s0..s7) with
    s_k = MIN(md5(k || '|' || shingle)) — shared by q_minhash_signatures
    and the X135 band join."""
    d = table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    base = (
        d.select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
        .where(F.size(t) >= 3)
        .select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(0), F.size(t) - 3),
                lambda i: F.concat_ws(
                    " ", F.element_at(t, i + 1), F.element_at(t, i + 2), F.element_at(t, i + 3)
                ),
            ).alias("sh_arr"),
        )
    )

    def _seed_hash(s: int):
        prefix = F.lit(f"{s}|")
        return lambda x: F.md5(F.concat(prefix, x))

    return base.select(
        "doc_id",
        *[
            F.array_min(F.transform("sh_arr", _seed_hash(s))).alias(f"s{s}")
            for s in range(8)
        ],
    )


@register(
    "q_run_length",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS t_us, event_id,
               CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    r AS (
        SELECT *, SUM(brk) OVER (PARTITION BY user_id
                                 ORDER BY t_us, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS run_id
        FROM e
    )
    SELECT user_id, CAST(run_id AS BIGINT) AS run_id, event_type,
           COUNT(*) AS run_len,
           CAST(MIN(t_us) AS BIGINT) AS start_us,
           CAST(MAX(t_us) AS BIGINT) AS end_us
    FROM r GROUP BY user_id, run_id, event_type
    """,
)
def q_run_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X103: run-length encoding of per-user event streams.

    Gaps-and-islands state compression: consecutive same-type events
    collapse into one run with length and time bounds — the compact
    form session/state analyses consume (and the RLE the reference's
    row-oriented text pipelines never had). One shuffle on user_id
    shared by the lag window, the run-id running sum, and the final
    (user, run) aggregate.
    """
    ev = table(spark, sf_dir, "events")
    t_us = F.unix_micros("ts")
    e = ev.select("user_id", "event_type", t_us.alias("t_us"), "event_id").withColumn(
        "brk",
        F.when(
            ~F.lag("event_type").over(
                Window.partitionBy("user_id").orderBy("t_us", "event_id")
            ).eqNullSafe(F.col("event_type")),
            1,
        ).otherwise(0),
    )
    r = e.withColumn(
        "run_id",
        F.sum("brk").over(
            Window.partitionBy("user_id")
            .orderBy("t_us", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return r.groupBy("user_id", "run_id", "event_type").agg(
        F.count("*").alias("run_len"),
        F.min("t_us").cast("bigint").alias("start_us"),
        F.max("t_us").cast("bigint").alias("end_us"),
    )


@register(
    "q_nearest_event",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, event_id, epoch_us(ts) AS t_us
        FROM events WHERE event_type IN ('error', 'purchase')
    ),
    m AS (
        SELECT *,
               LAST_VALUE(CASE WHEN event_type = 'purchase' THEN t_us END
                          IGNORE NULLS) OVER wp AS prev_t,
               LAST_VALUE(CASE WHEN event_type = 'purchase' THEN event_id END
                          IGNORE NULLS) OVER wp AS prev_id,
               FIRST_VALUE(CASE WHEN event_type = 'purchase' THEN t_us END
                           IGNORE NULLS) OVER wn AS next_t,
               FIRST_VALUE(CASE WHEN event_type = 'purchase' THEN event_id END
                           IGNORE NULLS) OVER wn AS next_id
        FROM e
        WINDOW wp AS (PARTITION BY user_id ORDER BY t_us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               wn AS (PARTITION BY user_id ORDER BY t_us, event_id
                      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id AS error_id, user_id,
           CASE WHEN next_t IS NULL THEN prev_id
                WHEN prev_t IS NULL THEN next_id
                WHEN t_us - prev_t <= next_t - t_us THEN prev_id
                ELSE next_id END AS nearest_purchase_id,
           CAST(CASE WHEN next_t IS NULL THEN t_us - prev_t
                WHEN prev_t IS NULL THEN next_t - t_us
                WHEN t_us - prev_t <= next_t - t_us THEN t_us - prev_t
                ELSE next_t - t_us END AS BIGINT) AS delta_us
    FROM m
    WHERE event_type = 'error' AND (prev_t IS NOT NULL OR next_t IS NOT NULL)
    """,
)
def q_nearest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X104: bidirectional nearest-event join.

    For every error, the temporally NEAREST purchase by the same user —
    either direction, ties to the earlier one. The as-of join (J8)
    looks only backward; root-cause triage wants the closest context
    event on either side. One shuffle on user_id: two frame-bounded
    conditional window lookups (last purchase before / first after)
    replace what would naively be two range joins plus an argmin.
    """
    ev = table(spark, sf_dir, "events")
    e = ev.where(F.col("event_type").isin("error", "purchase")).select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("t_us")
    )
    base = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    wp = base.rowsBetween(Window.unboundedPreceding, -1)
    wn = base.rowsBetween(1, Window.unboundedFollowing)
    is_p = F.col("event_type") == "purchase"
    m = e.select(
        "*",
        F.last(F.when(is_p, F.col("t_us")), ignorenulls=True).over(wp).alias("prev_t"),
        F.last(F.when(is_p, F.col("event_id")), ignorenulls=True).over(wp).alias("prev_id"),
        F.first(F.when(is_p, F.col("t_us")), ignorenulls=True).over(wn).alias("next_t"),
        F.first(F.when(is_p, F.col("event_id")), ignorenulls=True).over(wn).alias("next_id"),
    )
    d_prev = F.col("t_us") - F.col("prev_t")
    d_next = F.col("next_t") - F.col("t_us")
    pick_prev = F.col("next_t").isNull() | (
        F.col("prev_t").isNotNull() & (d_prev <= d_next)
    )
    return (
        m.where(
            (F.col("event_type") == "error")
            & (F.col("prev_t").isNotNull() | F.col("next_t").isNotNull())
        )
        .select(
            F.col("event_id").alias("error_id"),
            "user_id",
            F.when(pick_prev, F.col("prev_id")).otherwise(F.col("next_id")).alias(
                "nearest_purchase_id"
            ),
            F.when(pick_prev, d_prev).otherwise(d_next).cast("bigint").alias("delta_us"),
        )
    )


@register(
    "q_zipf_fit",
    oracle="""
    WITH toks AS (
        SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
    ),
    uc AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY w),
    top AS (
        SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rnk
        FROM uc ORDER BY c DESC, w LIMIT 500
    ),
    xy AS (
        SELECT CAST(ROUND(LOG10(CAST(rnk AS DOUBLE)) * 1000000.0) AS BIGINT) AS x,
               CAST(ROUND(LOG10(CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT) AS y
        FROM top
    ),
    s AS (
        SELECT COUNT(*) AS k, SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sxx
        FROM xy
    )
    SELECT k AS n_tokens,
           ROUND(CAST(k * sxy - sx * sy AS DOUBLE)
                 / CAST(k * sxx - sx * sx AS DOUBLE), 4) AS zipf_slope
    FROM s
    """,
)
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X105: Zipf rank-frequency fit over the corpus vocabulary.

    Least-squares slope of log10(freq) vs log10(rank) across the top
    500 tokens — the corpus-health fingerprint (natural text ~ -1;
    boilerplate-heavy corpora flatten). Log values fix-point to integer
    micro-units so all five regression sums are exact bigints on both
    engines; the slope is one double division of identical integers.
    The rank window runs over 500 rows (post top-k), bounded by k, not
    the vocabulary.
    """
    d = table(spark, sf_dir, "documents")
    uc = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    top = uc.orderBy(F.col("c").desc(), "w").limit(500)
    # 500 rows — bounded by k, not |vocab|
    ranked = top.select(
        "c", F.row_number().over(Window.orderBy(F.col("c").desc(), "w")).alias("rnk")
    )
    x = F.round(F.log10(F.col("rnk").cast("double")) * F.lit(1_000_000.0)).cast("bigint")
    y = F.round(F.log10(F.col("c").cast("double")) * F.lit(1_000_000.0)).cast("bigint")
    xy = ranked.select(x.alias("x"), y.alias("y"))
    s = xy.agg(
        F.count("*").alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return s.select(
        F.col("k").alias("n_tokens"),
        F.round(
            (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"),
            4,
        ).alias("zipf_slope"),
    )


@register(
    "q_latest_state",
    oracle="""
    WITH r AS (
        SELECT user_id, event_type, value, epoch_us(ts) AS t_us, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts) DESC, event_id DESC)
                   AS rn
        FROM events
    )
    SELECT user_id, event_type AS last_type,
           CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS last_value_centi,
           CAST(t_us AS BIGINT) AS last_t_us
    FROM r WHERE rn = 1
    """,
)
def q_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X106: CDC latest-state compaction.

    The change-data-capture primitive: collapse an append-only change
    log to the newest row per key (row_number = 1 in reverse event-time
    order with the unique event_id tiebreak). This is the batch form of
    the streaming upsert sink's merge (ST9/X30) and the compaction any
    100 TB log table needs before serving point lookups. One shuffle on
    the key; AQE handles the skewed-key case.
    """
    ev = table(spark, sf_dir, "events")
    t_us = F.unix_micros("ts")
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy(t_us.desc(), F.col("event_id").desc())
    )
    return (
        ev.select(
            "user_id",
            F.col("event_type").alias("last_type"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias(
                "last_value_centi"
            ),
            t_us.cast("bigint").alias("last_t_us"),
            rn.alias("rn"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )
