"""Round-4 widening queries, second batch (SURVEY.md §2.13, X107-X122).

Sixteen more operator shapes, each oracle-backed: modal value per
group, Shannon entropy, chi-squared independence (exact HUGEINT /
DECIMAL(38) arithmetic), two-pass Misra-Gries heavy hitters, snapshot
table diff, exact geometric-decay EWMA (powers-of-two weights so the
whole computation stays in bigints), iterative BFS hop distances vs a
recursive-CTE oracle, exact md5-based SimHash signatures (converting
the SimHash family from rows-only to hash-verified), deterministic
hash-ordered stratified sampling, rank-based boxplot five-number
summaries, co-purchase degree distribution, equi-depth histograms,
order-insensitive partition checksums, re-aggregatable partial-state
merges, audience Jaccard similarity, and BM25 ranked search with a
fully rational integer scoring core.

Cross-engine discipline as everywhere in this repo: money in exact
centi-unit bigints, event time via unix_micros == epoch_us, md5 as the
shared hash (Spark ``conv(substring(md5(x),1,15),16,10)`` == DuckDB
``CAST('0x' || substring(md5(x),1,15) AS BIGINT)``), each log10
fixed-pointed to integer micro-units before any aggregation, integer
division via Spark ``DIV`` == DuckDB ``//`` (positive operands only),
every window ordered with a unique tiebreaker, every computed column
aliased identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import spread_scan, table


@register(
    "q_mode_per_group",
    oracle="""
    WITH counts AS (
        SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
               COUNT(*) AS n_orders
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY c.c_mktsegment, o.o_orderpriority
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY segment
                                     ORDER BY n_orders DESC, priority) AS rn
        FROM counts
    )
    SELECT segment, priority AS mode_priority, n_orders
    FROM ranked WHERE rn = 1
    """,
)
def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X107: modal value per group (MODE() aggregate).

    The most frequent order priority per market segment — the mode
    aggregate the suite lacked (min/max/argmin/argmax landed as
    X20). Deterministic tiebreak: highest count, then smallest
    priority string. Two-phase: one (segment, priority) count
    aggregate (partial map-side combine — the 100 TB shape), then a
    row_number window over the tiny 25-row aggregate. One real
    shuffle; the customer dim is broadcast.
    """
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    counts = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count("*").alias("n_orders"))
    )
    w = Window.partitionBy("segment").orderBy(F.desc("n_orders"), F.asc("priority"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("segment", F.col("priority").alias("mode_priority"), "n_orders")
    )


@register(
    "q_entropy",
    oracle="""
    WITH c AS (
        SELECT user_id % 16 AS bucket, event_type, COUNT(*) AS cnt
        FROM events GROUP BY user_id % 16, event_type
    ),
    t AS (
        SELECT bucket, cnt,
               CAST(FLOOR(LOG10(CAST(cnt AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
                   AS li
        FROM c
    )
    SELECT bucket, CAST(SUM(cnt) AS BIGINT) AS n_events,
           CAST(CAST(FLOOR(LOG10(CAST(SUM(cnt) AS DOUBLE)) * 1000000 + 0.5)
                     AS BIGINT)
                - SUM(cnt * li) // SUM(cnt) AS BIGINT) AS entropy_micro
    FROM t GROUP BY bucket
    """,
)
def q_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X108: Shannon entropy of a categorical distribution per group.

    H = log10(N) - (1/N) * sum(c_i * log10(c_i)) over the event-type
    distribution of each user bucket — the quality / diversity metric
    LLM corpus audits run per source shard. Fixed-point discipline:
    ONE log10 per distinct (bucket, type) cell, micro-rounded to a
    bigint before the weighted sum, so both engines aggregate
    identical integers; final division via truncating integer
    division (Spark DIV == DuckDB //, positive operands). One shuffle
    on the (bucket, type) aggregate.
    """
    ev = table(spark, sf_dir, "events")
    c = ev.groupBy(
        (F.col("user_id") % 16).alias("bucket"), "event_type"
    ).agg(F.count("*").alias("cnt"))
    li = F.floor(F.log10(F.col("cnt").cast("double")) * 1000000 + F.lit(0.5)).cast(
        "bigint"
    )
    t = c.withColumn("li", li)
    return t.groupBy("bucket").agg(
        F.sum("cnt").cast("bigint").alias("n_events"),
        (
            F.floor(
                F.log10(F.sum("cnt").cast("double")) * 1000000 + F.lit(0.5)
            ).cast("bigint")
            - F.expr("SUM(cnt * li) DIV SUM(cnt)")
        ).alias("entropy_micro"),
    )


def _chi2_sql(cast_big: str, intdiv: str) -> str:
    """Shared chi-squared SQL; dialect differs only in the wide-integer
    cast (DuckDB HUGEINT vs Spark DECIMAL(38,0)) and integer division
    operator (// vs DIV)."""
    return f"""
    WITH base AS (
        SELECT c.c_mktsegment AS seg, o.o_orderpriority AS prio
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    obs AS (SELECT seg, prio, COUNT(*) AS n_obs FROM base GROUP BY seg, prio),
    rt AS (SELECT seg, COUNT(*) AS n_row FROM base GROUP BY seg),
    ct AS (SELECT prio, COUNT(*) AS n_col FROM base GROUP BY prio),
    tot AS (SELECT COUNT(*) AS n FROM base),
    cells AS (
        SELECT {cast_big('o.n_obs')} * {cast_big('t.n')}
                   - {cast_big('r.n_row')} * {cast_big('c.n_col')} AS d,
               {cast_big('r.n_row')} * {cast_big('c.n_col')}
                   * {cast_big('t.n')} AS den
        FROM obs o
        JOIN rt r ON r.seg = o.seg
        JOIN ct c ON c.prio = o.prio
        CROSS JOIN tot t
    ),
    terms AS (
        SELECT {intdiv(f"d * d * {cast_big('1000000')}", 'den')} AS term_micro
        FROM cells
    )
    SELECT CAST(SUM(CAST(term_micro AS BIGINT)) AS BIGINT) AS chi2_micro,
           (SELECT CAST((COUNT(DISTINCT seg) - 1)
                        * (COUNT(DISTINCT prio) - 1) AS BIGINT)
            FROM base) AS dof,
           (SELECT CAST(n AS BIGINT) FROM tot) AS n_total
    FROM terms
    """


_CHI2_DUCK = _chi2_sql(
    lambda e: f"CAST({e} AS HUGEINT)", lambda a, b: f"(({a}) // ({b}))"
)
_CHI2_SPARK = _chi2_sql(
    lambda e: f"CAST({e} AS DECIMAL(38,0))",
    # exact floor division on DECIMAL(38,0): subtract the exact modulo
    # first so the division itself is integral (Spark's DIV is
    # integral-only and decimal / rounds to the result scale).
    lambda a, b: f"CAST((({a}) - (({a}) % ({b}))) / ({b}) AS DECIMAL(38,0))",
)


@register("q_chi_squared", oracle=_CHI2_DUCK)
def q_chi_squared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X109: chi-squared test of independence, exact wide-integer core.

    Pearson chi2 over the market-segment x order-priority contingency
    table: chi2 = sum((obs*N - rowTot*colTot)^2 / (N*rowTot*colTot)),
    each cell term computed ENTIRELY in wide integers (DuckDB HUGEINT,
    Spark DECIMAL(38,0) — obs*N reaches ~2e10 at sf0.1 and its square
    overflows int64) and floor-divided to micro-units before the final
    bigint sum — no float enters the statistic at all. One shuffle for
    the cell counts; marginals reuse the same base relation; the
    25-cell joins are trivially broadcast.
    """
    from laser_hadoop_spark.tables import register_views

    register_views(spark, sf_dir, names=("orders", "customer"))
    return spark.sql(_CHI2_SPARK)


@register(
    "q_heavy_hitters",
    oracle="""
    WITH toks AS (
        SELECT UNNEST(string_split(text, ' ')) AS token FROM documents
    ),
    t AS (SELECT token FROM toks WHERE token <> ''),
    tot AS (SELECT COUNT(*) AS n FROM t)
    SELECT token, COUNT(*) AS cnt
    FROM t CROSS JOIN tot
    GROUP BY token, tot.n
    HAVING COUNT(*) * 500 > tot.n
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X110: two-pass Misra-Gries heavy hitters with exact output.

    Tokens occurring in more than 1/500 of the corpus. Pass 1 runs a
    Misra-Gries summary (4096 counters) PER PARTITION inside
    mapInPandas — the classic guarantee (any token with global
    frequency > n/500 exceeds n_p/500 in at least one partition and
    survives a 4096 >= 500-counter summary) means the candidate union
    has no false negatives. Pass 2 recounts ONLY the candidates
    (broadcast semi-join) and filters by the exact threshold, so the
    output is exactly the oracle's full GROUP BY — but at 100 TB the
    shuffle carries only the few-thousand-candidate subset instead of
    every distinct token. Oracle equality proves the sketch pass is
    lossless for the reported set.
    """
    from laser_hadoop_spark.operators.sketches import heavy_hitters

    docs = table(spark, sf_dir, "documents").select("text")
    tok = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    ).where(F.col("token") != "")
    return heavy_hitters(tok, "token", threshold_denom=500, capacity=4096)


def _snapshot_diff_sql(md5_expr: str) -> str:
    """Shared snapshot-diff SQL; md5 input concat spelled per dialect."""
    return f"""
    WITH a AS (
        SELECT o_orderkey AS k, o_orderstatus, o_orderpriority,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS centi
        FROM orders
    ),
    b AS (
        SELECT k, o_orderstatus, o_orderpriority,
               CASE WHEN k % 89 = 0 THEN centi + 100 ELSE centi END AS centi
        FROM a WHERE k % 97 <> 0
        UNION ALL
        SELECT k + 100000000, o_orderstatus, o_orderpriority, centi
        FROM a WHERE k % 101 = 0
    ),
    af AS (SELECT k, {md5_expr} AS fp FROM a),
    bf AS (SELECT k, {md5_expr} AS fp FROM b),
    d AS (
        SELECT CASE WHEN af.k IS NULL THEN 'added'
                    WHEN bf.k IS NULL THEN 'removed'
                    WHEN af.fp <> bf.fp THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM af FULL OUTER JOIN bf ON af.k = bf.k
    )
    SELECT status, COUNT(*) AS n_rows FROM d GROUP BY status
    """


_DIFF_MD5 = (
    "md5(o_orderstatus || '|' || o_orderpriority || '|' "
    "|| CAST(centi AS VARCHAR))"
)
_DIFF_MD5_SPARK = (
    "md5(concat(o_orderstatus, '|', o_orderpriority, '|', "
    "CAST(centi AS STRING)))"
)


@register("q_table_diff", oracle=_snapshot_diff_sql(_DIFF_MD5))
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X111: snapshot table diff (added / removed / changed / unchanged).

    The data-engineering reconciliation operator: compare two table
    snapshots by primary key and classify every key. Snapshot B is a
    deterministic simulation of the next load (keys % 97 deleted,
    % 89 price-bumped, % 101 re-inserted under fresh keys). Rows are
    compared by an md5 row fingerprint so the full-outer join moves
    (key, 32-byte digest) instead of whole rows — the 100 TB shape;
    AQE turns the final 4-group count into a trivial aggregate.
    """
    from laser_hadoop_spark.tables import register_views

    register_views(spark, sf_dir, names=("orders",))
    return spark.sql(_snapshot_diff_sql(_DIFF_MD5_SPARK))


@register(
    "q_ewma",
    oracle="""
    WITH e AS (
        SELECT user_id,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v_centi,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts) DESC, event_id DESC)
                   AS rn
        FROM events
    )
    SELECT user_id, COUNT(*) AS n_used,
           CAST(SUM(v_centi * (CAST(1 AS BIGINT) << (16 - rn))) AS BIGINT)
               AS ewma_x32768
    FROM e WHERE rn <= 16 GROUP BY user_id
    """,
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X112: exact geometric-decay EWMA via powers-of-two weights.

    Per-user exponentially weighted value with decay 1/2 truncated to
    the 16 most recent events: EWMA * 2^15 = sum(v_centi * 2^(16-rn)).
    Choosing alpha = 1/2 makes every weight a power of two, so the
    whole computation is BIGINT-exact — the float summation-order
    problem that makes textbook EWMA unverifiable across engines
    simply never appears. One user_id shuffle shared by the recency
    window and the final aggregate; the rn <= 16 filter keeps state
    bounded regardless of per-user history length (the 100 TB
    property — this is the batch form of a streaming decayed counter).
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts").desc(), F.col("event_id").desc()
    )
    e = ev.select(
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("v_centi"),
        F.row_number().over(w).alias("rn"),
    ).where(F.col("rn") <= 16)
    return e.groupBy("user_id").agg(
        F.count("*").alias("n_used"),
        F.sum(
            F.col("v_centi") * F.expr("CAST(1 AS BIGINT) << (16 - rn)")
        ).cast("bigint").alias("ewma_x32768"),
    )


@register(
    "q_bfs_distances",
    oracle="""
    WITH RECURSIVE pairs AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    s AS (SELECT MIN(l_partkey) AS root FROM lineitem),
    bfs AS (
        SELECT root AS node, 0 AS d FROM s
        UNION
        SELECT p.dst AS node, b.d + 1 AS d
        FROM bfs b JOIN pairs p ON p.src = b.node
        WHERE b.d < 3
    )
    SELECT CAST(node AS BIGINT) AS partkey, CAST(MIN(d) AS INT) AS hops
    FROM bfs GROUP BY node
    """,
)
def q_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X113: BFS hop distances over the co-purchase graph.

    Shortest hop count (capped at 3) from the smallest partkey to
    every part reachable through shared orders — iterative frontier
    expansion in Spark checked against DuckDB's recursive CTE, the
    suite's second exactly-verified iterative graph algorithm after
    PageRank (X50). Each of the 3 rounds is one self-equi-join on the
    deduplicated edge list; the edge relation is built once with a
    single l_orderkey self-join and reused (cached) across rounds —
    at 100 TB the frontier join is an equi-shuffle on partkey, never
    an all-pairs expansion, and the depth cap bounds the iteration
    count independent of graph size.
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
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
        .cache()
    )
    root = li.agg(F.min("l_partkey").alias("node")).withColumn("d", F.lit(0))
    reached = root
    for _ in range(3):
        expand = (
            reached.where(F.col("d") < 3)
            .join(pairs, reached.node == pairs.src)
            .select(F.col("dst").alias("node"), (F.col("d") + 1).alias("d"))
        )
        reached = reached.unionByName(expand).groupBy("node").agg(
            F.min("d").alias("d")
        )
    return reached.select(
        F.col("node").cast("bigint").alias("partkey"),
        F.col("d").cast("int").alias("hops"),
    )


def _simhash_sql(hash2int: str, tokens: str, series: str, shift: str) -> str:
    """Shared exact-SimHash SQL; dialect differs in md5->int, token
    explode, bit-index series, and shift spelling."""
    return f"""
    WITH toks AS (
        SELECT DISTINCT doc_id, token FROM (
            SELECT doc_id, {tokens} AS token FROM documents
        ) x WHERE token <> ''
    ),
    hashed AS (SELECT doc_id, {hash2int} AS h FROM toks),
    bits AS (
        SELECT doc_id, b,
               CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END AS contrib
        FROM hashed CROSS JOIN ({series}) s
    ),
    bitsum AS (
        SELECT doc_id, b, SUM(contrib) AS s FROM bits GROUP BY doc_id, b
    ),
    sig AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN s > 0 THEN {shift} ELSE 0 END) AS BIGINT)
                   AS simhash32
        FROM bitsum GROUP BY doc_id
    ),
    ntok AS (SELECT doc_id, COUNT(*) AS n_tokens FROM toks GROUP BY doc_id)
    SELECT sig.doc_id, sig.simhash32, ntok.n_tokens
    FROM sig JOIN ntok ON ntok.doc_id = sig.doc_id
    """


_SIMHASH_DUCK = _simhash_sql(
    "CAST(('0x' || substring(md5(token), 1, 15)) AS BIGINT)",
    "UNNEST(string_split(text, ' '))",
    "SELECT UNNEST(generate_series(0, 31)) AS b",
    "(CAST(1 AS BIGINT) << b)",
)
@register("q_simhash_exact", oracle=_SIMHASH_DUCK)
def q_simhash_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X114: exact SimHash signatures, hash-verified across engines.

    32-bit SimHash per document from the md5 hash both engines share
    (the q_minhash_signatures trick applied to SimHash): each distinct
    token votes +1/-1 per bit position, the sign of the per-bit sum
    sets the bit, ties (sum = 0) resolve to 0. This converted the
    SimHash family from rows-only to bit-for-bit oracle-verified;
    round 7 finished the job by pinning q_dedup_simhash's banded PAIR
    extraction to a quadratic-hamming oracle with the same md5 digest.

    Shape (reworked after the r04 sf0.1 bench showed the x32 bit
    explode at 4.0 s): the per-bit votes are 32 conditional-sum
    AGGREGATE COLUMNS over the distinct (doc, token) relation — no
    bit fanout rows exist at all; the signature reassembles from the
    32 sums in one projection. The oracle keeps the explode spelling
    (clearer SQL, DuckDB-fast); hash equality proves the two shapes
    identical. One doc_id shuffle with map-side combine.
    """
    d = table(spark, sf_dir, "documents")
    # Round 13: the tokenize+explode ran on the one-task unsplittable
    # scan; spread_scan parallelizes it (guarded no-op at corpus
    # scale). Measured 1.15 -> 0.70 s noop at sf0.1.
    toks = (
        spread_scan(d.select("doc_id", "text"), "doc_id")
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
        .distinct()
    )
    h = F.conv(F.substring(F.md5("token"), 1, 15), 16, 10).cast("bigint")
    hashed = toks.select("doc_id", h.alias("h"))
    votes = hashed.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        *[
            F.sum(
                F.when(F.expr(f"((h >> {b}) & 1) = 1"), 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(32)
        ],
    )
    sig = None
    for b in range(32):
        term = F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return votes.select(
        "doc_id", sig.cast("bigint").alias("simhash32"), "n_tokens"
    )


@register(
    "q_sample_hash_stratified",
    oracle="""
    WITH ranked AS (
        SELECT c_custkey, c_mktsegment,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY md5(CAST(c_custkey AS VARCHAR)),
                                           c_custkey) AS sample_rank,
               COUNT(*) OVER (PARTITION BY c_mktsegment) AS n_seg
        FROM customer
    )
    SELECT c_custkey, c_mktsegment, sample_rank
    FROM ranked WHERE sample_rank * 10 <= n_seg + 9
    """,
)
def q_sample_hash_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X115: deterministic hash-ordered stratified sample (10%/stratum).

    ceil(10%) of each market segment chosen by md5(custkey) order —
    a reproducible stratified sample (same rows on every engine, every
    run, any partitioning) where X13's seeded sampleBy is
    rows-only-checkable by nature. md5 order is uniform, so the sample
    is unbiased within each stratum; the window is one shuffle on the
    stratum key, and at 100 TB the per-stratum ordering can fall back
    to the two-pass rank (operators/cumulative) if a stratum outgrows
    a partition.
    """
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.md5(F.col("c_custkey").cast("string")), F.col("c_custkey")
    )
    ranked = c.select(
        "c_custkey",
        "c_mktsegment",
        F.row_number().over(w).alias("sample_rank"),
        F.count("*").over(Window.partitionBy("c_mktsegment")).alias("n_seg"),
    )
    return ranked.where(F.col("sample_rank") * 10 <= F.col("n_seg") + 9).select(
        "c_custkey", "c_mktsegment", "sample_rank"
    )


@register(
    "q_boxplot_stats",
    oracle="""
    WITH v AS (
        SELECT l_returnflag AS flag,
               CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS p,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY CAST(FLOOR(l_extendedprice * 100
                                                      + 0.5) AS BIGINT),
                                           l_orderkey, l_linenumber) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem
    ),
    q AS (
        SELECT flag, MAX(n) AS n,
               MIN(CASE WHEN rn = (25 * n + 99) // 100 THEN p END) AS q1_centi,
               MIN(CASE WHEN rn = (50 * n + 99) // 100 THEN p END) AS med_centi,
               MIN(CASE WHEN rn = (75 * n + 99) // 100 THEN p END) AS q3_centi
        FROM v GROUP BY flag
    )
    SELECT q.flag, CAST(q.n AS BIGINT) AS n,
           q.q1_centi, q.med_centi, q.q3_centi,
           q.q3_centi - q.q1_centi AS iqr_centi,
           CAST(SUM(CASE WHEN 2 * v.p < 2 * q.q1_centi
                              - 3 * (q.q3_centi - q.q1_centi)
                           OR 2 * v.p > 2 * q.q3_centi
                              + 3 * (q.q3_centi - q.q1_centi)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM q JOIN v ON v.flag = q.flag
    GROUP BY q.flag, q.n, q.q1_centi, q.med_centi, q.q3_centi
    """,
)
def q_boxplot_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X116: boxplot five-number summary with percentile_disc semantics.

    Per return flag: exact rank-based quartiles (the value at row
    ceil(p*n) of the sorted extended price — percentile_disc, spelled
    as rank arithmetic so both engines agree without trusting either's
    percentile function), IQR, and the Tukey outlier count at 1.5*IQR
    whiskers. The whisker comparison is doubled (2*p vs 2*q1 - 3*iqr)
    so 1.5*IQR stays integral.

    Scale shape: l_returnflag has THREE values, so a per-flag rank
    window is a 3-task funnel over the whole fact table. The per-group
    rank instead derives from ONE two-pass global rank in (flag, p,
    keys) order (operators/cumulative.ordered_cumsum — fully
    range-parallel) minus the broadcast per-flag start offset; the
    oracle keeps the plain window spelling and hash equality proves
    the offset arithmetic.
    """
    from laser_hadoop_spark.operators.cumulative import ordered_cumsum

    li = table(spark, sf_dir, "lineitem")
    p = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
    v = li.select(
        F.col("l_returnflag").alias("flag"),
        p.alias("p"),
        "l_orderkey",
        "l_linenumber",
    )
    ranked = ordered_cumsum(
        v,
        order_by=["flag", "p", "l_orderkey", "l_linenumber"],
        row_number_col="grn",
    )
    offs = ranked.groupBy("flag").agg(
        F.min("grn").alias("off"), F.count("*").alias("n")
    )
    v = ranked.join(F.broadcast(offs), "flag").select(
        "flag", "p", (F.col("grn") - F.col("off") + 1).alias("rn"), "n"
    )
    q = v.groupBy("flag").agg(
        F.max("n").alias("n"),
        F.min(F.when(F.col("rn") == F.expr("(25 * n + 99) DIV 100"), F.col("p"))).alias(
            "q1_centi"
        ),
        F.min(F.when(F.col("rn") == F.expr("(50 * n + 99) DIV 100"), F.col("p"))).alias(
            "med_centi"
        ),
        F.min(F.when(F.col("rn") == F.expr("(75 * n + 99) DIV 100"), F.col("p"))).alias(
            "q3_centi"
        ),
    )
    joined = v.select("flag", "p").join(F.broadcast(q), "flag")
    iqr = F.col("q3_centi") - F.col("q1_centi")
    outlier = (2 * F.col("p") < 2 * F.col("q1_centi") - 3 * iqr) | (
        2 * F.col("p") > 2 * F.col("q3_centi") + 3 * iqr
    )
    return (
        joined.groupBy("flag", "n", "q1_centi", "med_centi", "q3_centi")
        .agg(F.sum(F.when(outlier, 1).otherwise(0)).cast("bigint").alias("n_outliers"))
        .select(
            "flag",
            F.col("n").cast("bigint").alias("n"),
            "q1_centi",
            "med_centi",
            "q3_centi",
            iqr.alias("iqr_centi"),
            "n_outliers",
        )
    )


@register(
    "q_copurchase_degree",
    tags=("pairs",),
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    nodes AS (SELECT DISTINCT l_partkey AS part FROM lineitem),
    deg AS (
        SELECT n.part, COUNT(p.dst) AS degree
        FROM nodes n LEFT JOIN pairs p ON p.src = n.part
        GROUP BY n.part
    )
    SELECT CAST(degree AS BIGINT) AS degree, COUNT(*) AS n_parts
    FROM deg GROUP BY degree
    """,
)
def q_copurchase_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X117: degree distribution of the co-purchase graph.

    How many parts have k distinct co-purchase neighbors — the graph
    profiling pass that sizes any downstream triangle / community /
    BFS job (and the skew detector for X113's frontier joins).
    Isolated nodes (parts never sharing an order) are kept at degree 0
    via the left join. The edge list is a single orderkey self-join
    deduplicated once; degrees are one partkey aggregate; the final
    histogram is a tiny second aggregate — three shuffles, all on
    keys, nothing quadratic beyond the per-order line fanout.
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
    )
    nodes = li.select(F.col("l_partkey").alias("part")).distinct()
    deg = (
        nodes.join(pairs, nodes.part == pairs.src, "left")
        .groupBy("part")
        .agg(F.count("dst").alias("degree"))
    )
    return deg.groupBy(F.col("degree").cast("bigint").alias("degree")).agg(
        F.count("*").alias("n_parts")
    )


@register(
    "q_equidepth_histogram",
    oracle="""
    WITH v AS (
        SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS centi,
               NTILE(10) OVER (ORDER BY CAST(FLOOR(o_totalprice * 100 + 0.5)
                                             AS BIGINT),
                               o_orderkey) AS bucket
        FROM orders
    )
    SELECT CAST(bucket AS INT) AS bucket, COUNT(*) AS n_orders,
           CAST(MIN(centi) AS BIGINT) AS lo_centi,
           CAST(MAX(centi) AS BIGINT) AS hi_centi
    FROM v GROUP BY bucket
    """,
)
def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X118: equi-depth histogram (10 equal-count buckets).

    Bucket boundaries that equalize row counts rather than value
    ranges — the statistics a cost-based optimizer or a range
    partitioner actually wants on skewed money columns (X24's
    q_histogram is the equi-width sibling). The oracle keeps DuckDB's
    NTILE spelling; the Spark side computes the IDENTICAL bucket
    assignment from a two-pass range-partitioned global rank
    (operators/cumulative.ordered_cumsum — no single-partition window
    anywhere, the 100 TB shape) and ntile's remainder arithmetic:
    with q = n DIV 10, r = n % 10, the first r buckets take q+1 rows.
    Hash equality proves the closed form matches the window function.
    """
    from laser_hadoop_spark.operators.cumulative import (
        closed_form_ntile,
        ordered_cumsum,
    )

    o = table(spark, sf_dir, "orders")
    centi = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    v = o.select(centi.alias("centi"), "o_orderkey")
    ranked = ordered_cumsum(
        v, order_by=["centi", "o_orderkey"], row_number_col="rn"
    )
    n_row = v.agg(F.count("*").alias("n"))
    bucket = closed_form_ntile()
    return (
        ranked.crossJoin(F.broadcast(n_row))
        .select("centi", bucket.cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("centi").alias("lo_centi"),
            F.max("centi").alias("hi_centi"),
        )
    )


def _checksum_sql(hash2int: str, month: str) -> str:
    return f"""
    WITH rows_fp AS (
        SELECT {month} AS month,
               {hash2int} AS h
        FROM orders
    )
    SELECT month, COUNT(*) AS n_rows,
           CAST(BIT_XOR(h) AS BIGINT) AS xor_checksum
    FROM rows_fp GROUP BY month
    """


_CKSUM_ROW_DUCK = (
    "CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR) || '|' "
    "|| o_orderstatus || '|' || CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) "
    "AS BIGINT) AS VARCHAR) || '|' || o_orderpriority), 1, 15)) AS BIGINT)"
)
_CKSUM_ROW_SPARK = (
    "CAST(conv(substring(md5(concat(CAST(o_orderkey AS STRING), '|', "
    "o_orderstatus, '|', CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) "
    "AS BIGINT) AS STRING), '|', o_orderpriority)), 1, 15), 16, 10) AS BIGINT)"
)


@register(
    "q_partition_checksum",
    oracle=_checksum_sql(_CKSUM_ROW_DUCK, "strftime(o_orderdate, '%Y-%m')"),
)
def q_partition_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X119: order-insensitive per-partition table checksums.

    One 60-bit XOR fingerprint per order month — the cross-system
    data-validation primitive: two engines (or two replication paths)
    agree on a partition iff row count AND checksum match, with no
    sort required because XOR is commutative/associative. Row identity
    is the md5 of a canonical field encoding (money in centi bigints).
    Scan-local hashing, one month-key aggregate with map-side combine
    — at 100 TB this is the cheapest possible full-table integrity
    pass, and it composes: partition checksums XOR into a table
    checksum.
    """
    from laser_hadoop_spark.tables import register_views

    register_views(spark, sf_dir, names=("orders",))
    return spark.sql(
        _checksum_sql(_CKSUM_ROW_SPARK, "date_format(o_orderdate, 'yyyy-MM')")
    )


@register(
    "q_incremental_merge",
    oracle="""
    WITH partials AS (
        SELECT o_orderkey % 2 AS batch_id, o_orderpriority AS priority,
               COUNT(*) AS n,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS sum_centi,
               MIN(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS min_centi,
               MAX(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS max_centi
        FROM orders GROUP BY o_orderkey % 2, o_orderpriority
    )
    SELECT priority, CAST(SUM(n) AS BIGINT) AS n,
           CAST(SUM(sum_centi) AS BIGINT) AS sum_centi,
           MIN(min_centi) AS min_centi, MAX(max_centi) AS max_centi,
           CAST(SUM(sum_centi) AS BIGINT) // CAST(SUM(n) AS BIGINT)
               AS avg_centi
    FROM partials GROUP BY priority
    """,
)
def q_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X120: re-aggregatable partial-state merge (incremental rollup).

    The incremental-view-maintenance shape: each ingest batch keeps a
    compact per-key state (n, sum, min, max) and the serving rollup is
    a MERGE of states, never a rescan of history. Batches are
    simulated by o_orderkey parity; the merged result must equal the
    direct aggregate (associativity/commutativity proof — the property
    that makes the state valid at 100 TB where history rescans are
    impossible). Average derives from merged sums via truncating
    integer division. Two narrow aggregates; the second runs over
    2 x |priorities| state rows.
    """
    o = table(spark, sf_dir, "orders")
    centi = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    partials = o.groupBy(
        (F.col("o_orderkey") % 2).alias("batch_id"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(
        F.count("*").alias("n"),
        F.sum(centi).alias("sum_centi"),
        F.min(centi).alias("min_centi"),
        F.max(centi).alias("max_centi"),
    )
    return partials.groupBy("priority").agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("sum_centi").cast("bigint").alias("sum_centi"),
        F.min("min_centi").alias("min_centi"),
        F.max("max_centi").alias("max_centi"),
        F.expr(
            "CAST(SUM(sum_centi) AS BIGINT) DIV CAST(SUM(n) AS BIGINT)"
        ).alias("avg_centi"),
    )


@register(
    "q_audience_jaccard",
    tags=("pairs",),
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    sizes AS (SELECT event_type, COUNT(*) AS n_users FROM ut GROUP BY event_type),
    inter AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS n_both
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT i.type_a, i.type_b,
           CAST(sa.n_users AS BIGINT) AS a_users,
           CAST(sb.n_users AS BIGINT) AS b_users,
           CAST(i.n_both AS BIGINT) AS both_users,
           (i.n_both * 1000000)
               // (sa.n_users + sb.n_users - i.n_both) AS jaccard_micro
    FROM inter i
    JOIN sizes sa ON sa.event_type = i.type_a
    JOIN sizes sb ON sb.event_type = i.type_b
    """,
)
def q_audience_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X121: Jaccard similarity between audience sets.

    |A AND B| / |A OR B| for every event-type pair, from exact
    distinct-user counts — the audience-overlap matrix of segmentation
    and the exact ground truth the MinHash stack (L2/X102)
    approximates. The intersection comes from a self-equi-join on
    user_id over the DEDUPLICATED (user, type) relation (|users| x
    |types|^2 worst case, never |events|^2); union sizes derive by
    inclusion-exclusion, so only one join runs. Jaccard is
    fixed-pointed by truncating integer division to micro-units.
    """
    ev = table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct().cache()
    sizes = ut.groupBy("event_type").agg(F.count("*").alias("n_users"))
    a = ut.alias("a")
    b = ut.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_both"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(F.broadcast(sa), F.col("type_a") == F.col("sa.event_type"))
        .join(F.broadcast(sb), F.col("type_b") == F.col("sb.event_type"))
        .select(
            "type_a",
            "type_b",
            F.col("sa.n_users").cast("bigint").alias("a_users"),
            F.col("sb.n_users").cast("bigint").alias("b_users"),
            F.col("n_both").cast("bigint").alias("both_users"),
            F.expr(
                "(n_both * 1000000) DIV (sa.n_users + sb.n_users - n_both)"
            ).alias("jaccard_micro"),
        )
    )


_BM25_TERMS = ("scan", "merge", "vector")


def _bm25_sql(tokens: str, terms_list: str, intdiv) -> str:
    """Shared BM25 SQL. k1 = 1.2, b = 0.75 kept RATIONAL: with
    T = total tokens, N = docs, dl = doc length, the per-term score
    tf*(k1+1) / (tf + k1*(1 - b + b*dl*N/T)) scales by 20*T into
    num = 44*T*tf, den = 20*T*tf + 6*T + 18*dl*N — pure bigints. Only
    idf = log10(N/df) touches a float, micro-rounded per term before
    the integer multiply-divide."""
    return f"""
    WITH toks AS (
        SELECT doc_id, {tokens} AS token FROM documents
    ),
    t AS (SELECT doc_id, token FROM toks WHERE token <> ''),
    dl AS (SELECT doc_id, COUNT(*) AS dlen FROM t GROUP BY doc_id),
    corpus AS (
        SELECT COUNT(*) AS total_tokens,
               COUNT(DISTINCT doc_id) AS n_docs
        FROM t
    ),
    q AS (SELECT term FROM ({terms_list}) qt),
    df AS (
        SELECT token AS term, COUNT(DISTINCT doc_id) AS n_df
        FROM t JOIN q ON q.term = t.token GROUP BY token
    ),
    idf AS (
        SELECT term, n_df,
               CAST(FLOOR(LOG10(CAST(c.n_docs AS DOUBLE) / n_df) * 1000000
                          + 0.5) AS BIGINT) AS idf_micro
        FROM df CROSS JOIN corpus c
    ),
    tf AS (
        SELECT t.doc_id, t.token AS term, COUNT(*) AS n_tf
        FROM t JOIN q ON q.term = t.token
        GROUP BY t.doc_id, t.token
    ),
    scored AS (
        SELECT tf.doc_id,
               {intdiv(
                   'i.idf_micro * (44 * c.total_tokens * tf.n_tf)',
                   '20 * c.total_tokens * tf.n_tf + 6 * c.total_tokens '
                   '+ 18 * d.dlen * c.n_docs'
               )} AS term_micro
        FROM tf
        JOIN idf i ON i.term = tf.term
        JOIN dl d ON d.doc_id = tf.doc_id
        CROSS JOIN corpus c
    )
    SELECT doc_id, CAST(SUM(term_micro) AS BIGINT) AS bm25_micro,
           COUNT(*) AS n_terms_matched
    FROM scored GROUP BY doc_id
    """


_BM25_DUCK = _bm25_sql(
    "UNNEST(string_split(text, ' '))",
    "SELECT UNNEST(['scan', 'merge', 'vector']) AS term",
    lambda a, b: f"(({a}) // ({b}))",
)
_BM25_SPARK = _bm25_sql(
    "explode(split(text, ' '))",
    "SELECT explode(array('scan', 'merge', 'vector')) AS term",
    lambda a, b: f"(({a}) DIV ({b}))",
)


@register("q_bm25_search", oracle=_BM25_DUCK)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X122: BM25 ranked search with a rational integer scoring core.

    Okapi BM25 (k1 = 1.2, b = 0.75) for a fixed 3-term query over the
    documents corpus — the retrieval scorer behind the inverted index
    (X54). The rational trick: k1 and b are exact fractions, so
    scaling the tf saturation term by 20*total_tokens turns the whole
    score into bigint multiply-divides; the single float (idf's log10)
    is micro-rounded per term BEFORE entering the integer pipeline —
    same lm-score discipline, applied to ranking. Plan: the corpus
    stats are one tiny aggregate broadcast everywhere, df/tf are
    semi-joined to the 3-term query list before grouping (the scan
    never aggregates unqueried tokens), and the final per-doc sum is
    one combine. At 100 TB with a query LIST, the same plan serves:
    terms broadcast, postings equi-join.
    """
    from laser_hadoop_spark.tables import register_views

    register_views(spark, sf_dir, names=("documents",))
    return spark.sql(_BM25_SPARK)
