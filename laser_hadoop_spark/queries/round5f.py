"""Round-5 widening queries, sixth batch (SURVEY.md §2.13, X228-X232).

- X228 lightweight-compression advisor: per-block frame-of-reference
  vs dictionary cost model over real column data — the storage-codec
  selection a columnar writer performs, exact in integer bits.
- X229 shuffle-partition skew planner: simulated hash-partition
  occupancy at candidate partition counts — the
  spark.sql.shuffle.partitions sizing input, engine-neutral hashing.
- X230 hierarchical percent-of-parent: nation revenue as share of
  region and of global in exact bp — the multi-level ratio-to-report
  every OLAP drill-down shows.
- X231 watermark-delay audit: per-user arrival-order lateness depth,
  log2-bucketed — the measurement that SIZES a streaming watermark
  (ST4's delay parameter) instead of guessing it.
- X232 as-of snapshot diff: latest-state reconstruction at two
  timestamps + added/changed/unchanged census — the bitemporal
  completion of X74 (PIT join) and X39 (SCD2 build).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# --- X228: lightweight-compression advisor ---------------------------------

_CBLOCK = 512


@register(
    "q_compression_advisor",
    oracle=f"""
    WITH src AS (
        SELECT o_orderkey // {_CBLOCK} AS blk,
               o_orderkey AS v, 'o_orderkey' AS col_name FROM orders
        UNION ALL
        SELECT o_orderkey // {_CBLOCK}, o_custkey, 'o_custkey' FROM orders
        UNION ALL
        SELECT o_orderkey // {_CBLOCK},
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT),
               'price_centi' FROM orders
    ),
    blocks AS (
        SELECT col_name, blk, COUNT(*) AS n,
               COUNT(DISTINCT v) AS nd,
               length(bin(MAX(v) - MIN(v))) AS for_bits,
               length(bin(COUNT(DISTINCT v) - 1)) AS dict_bits
        FROM src GROUP BY 1, 2
    ),
    costs AS (
        SELECT col_name,
               CAST(SUM(n) AS BIGINT) AS n_values,
               CAST(SUM(n * 64) AS BIGINT) AS plain_bits,
               CAST(SUM(n * for_bits + 64) AS BIGINT) AS for_bits,
               CAST(SUM(n * dict_bits + nd * 64) AS BIGINT) AS dict_bits
        FROM blocks GROUP BY 1
    )
    SELECT col_name,
           CAST(plain_bits * 1000 // n_values AS BIGINT) AS plain_mbits,
           CAST(for_bits * 1000 // n_values AS BIGINT) AS for_mbits,
           CAST(dict_bits * 1000 // n_values AS BIGINT) AS dict_mbits,
           CASE WHEN for_bits <= dict_bits AND for_bits <= plain_bits
                THEN 'for'
                WHEN dict_bits <= plain_bits THEN 'dict'
                ELSE 'plain' END AS best_scheme
    FROM costs
    """,
)
def q_compression_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X228: lightweight-compression scheme advisor, exact integer bits.

    The codec-selection pass a columnar writer (parquet encoder, DuckDB
    storage) runs per block: for each 512-row block and column, cost
    frame-of-reference encoding (bits to span max-min, + one 64-bit
    reference) against dictionary encoding (bits to index nd distinct
    values + the dictionary itself) against plain 64-bit. Bit widths
    are exact via length(bin(x)) — no float log2 — and costs roll up to
    milli-bits-per-value with the winning scheme per column. Sequential
    keys pick FOR, low-cardinality picks dict, random wide columns stay
    plain — measured, not assumed.

    100 TB: one unpivoted scan (3 stacked columns), one block-keyed
    aggregate with map-side combine, one per-column rollup; the
    expensive part (per-block distinct) is bounded by block size.
    """
    o = table(spark, sf_dir, "orders")
    src = o.selectExpr(
        f"o_orderkey DIV {_CBLOCK} AS blk",
        "stack(3, 'o_orderkey', o_orderkey, 'o_custkey', o_custkey, "
        "'price_centi', CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) "
        "AS (col_name, v)",
    )
    blocks = src.groupBy("col_name", "blk").agg(
        F.count("*").alias("n"),
        F.countDistinct("v").alias("nd"),
        F.length(F.bin(F.max("v") - F.min("v"))).alias("for_bits"),
        F.length(F.bin(F.countDistinct("v") - 1)).alias("dict_bits"),
    )
    costs = blocks.groupBy("col_name").agg(
        F.sum("n").cast("bigint").alias("n_values"),
        F.sum(F.col("n") * 64).cast("bigint").alias("plain_bits"),
        F.sum(F.col("n") * F.col("for_bits") + 64)
        .cast("bigint")
        .alias("for_bits"),
        F.sum(F.col("n") * F.col("dict_bits") + F.col("nd") * 64)
        .cast("bigint")
        .alias("dict_bits"),
    )
    best = (
        F.when(
            (F.col("for_bits") <= F.col("dict_bits"))
            & (F.col("for_bits") <= F.col("plain_bits")),
            "for",
        )
        .when(F.col("dict_bits") <= F.col("plain_bits"), "dict")
        .otherwise("plain")
    )
    return costs.select(
        "col_name",
        F.expr("plain_bits * 1000 DIV n_values")
        .cast("bigint")
        .alias("plain_mbits"),
        F.expr("for_bits * 1000 DIV n_values").cast("bigint").alias("for_mbits"),
        F.expr("dict_bits * 1000 DIV n_values")
        .cast("bigint")
        .alias("dict_mbits"),
        best.alias("best_scheme"),
    )


# --- X229: shuffle-partition skew planner ----------------------------------

_SKEW_KS = (8, 32, 128)


@register(
    "q_shuffle_skew_planner",
    oracle=f"""
    WITH hashed AS (
        SELECT ('0x' || substring(md5(CAST(l_suppkey AS VARCHAR)), 1, 12))::BIGINT
                   AS h
        FROM lineitem
    ),
    ks AS (SELECT UNNEST(ARRAY{list(_SKEW_KS)}) AS k),
    parts AS (
        SELECT k, h % k AS part, COUNT(*) AS n
        FROM hashed CROSS JOIN ks
        GROUP BY 1, 2
    ),
    tot AS (SELECT k, CAST(SUM(n) AS BIGINT) AS total FROM parts GROUP BY k)
    SELECT CAST(p.k AS INT) AS k,
           COUNT(*) AS n_parts_nonempty,
           CAST(MAX(p.n) AS BIGINT) AS max_rows,
           CAST(MIN(t.total) // p.k AS BIGINT) AS avg_rows,
           CAST(MAX(p.n) * 10000 // (MIN(t.total) // p.k) AS BIGINT)
               AS skew_bp
    FROM parts p JOIN tot t ON t.k = p.k
    GROUP BY p.k
    """,
)
def q_shuffle_skew_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X229: shuffle-partition skew planner.

    The sizing input for spark.sql.shuffle.partitions / AQE advisory
    size: simulate hash partitioning of the real join-key distribution
    (l_suppkey) at candidate partition counts {8, 32, 128} and report
    per k the nonempty partitions, the hottest partition, the ideal
    average, and the skew factor in bp (hottest/average). A skew_bp
    near 10000 means balanced; a large value at every k means the KEY
    is skewed (salting territory, X4) rather than the count being
    wrong. md5-derived hashing keeps both engines bit-identical — the
    planner's verdict, not Spark's private hash, is what's verified.

    100 TB: k candidate assignments in ONE scan (explode over a 3-row
    broadcast array), one (k, part) aggregate with map-side combine —
    the output is <= sum(k) rows regardless of fact size.
    """
    li = table(spark, sf_dir, "lineitem")
    hashed = li.select(
        F.expr(
            "CAST(conv(substring(md5(CAST(l_suppkey AS STRING)), 1, 12), "
            "16, 10) AS BIGINT)"
        ).alias("h")
    )
    ks = F.explode(F.array(*[F.lit(k) for k in _SKEW_KS])).alias("k")
    parts = (
        hashed.select("h", ks)
        .groupBy("k", (F.col("h") % F.col("k")).alias("part"))
        .agg(F.count("*").alias("n"))
    )
    tot = parts.groupBy("k").agg(F.sum("n").cast("bigint").alias("total"))
    return (
        parts.join(F.broadcast(tot), "k")
        .groupBy("k")
        .agg(
            F.count("*").alias("n_parts_nonempty"),
            F.max("n").cast("bigint").alias("max_rows"),
            F.expr("MIN(total) DIV k").cast("bigint").alias("avg_rows"),
            F.expr("MAX(n) * 10000 DIV (MIN(total) DIV k)")
            .cast("bigint")
            .alias("skew_bp"),
        )
        .select(
            F.col("k").cast("int").alias("k"),
            "n_parts_nonempty",
            "max_rows",
            "avg_rows",
            "skew_bp",
        )
    )


# --- X230: hierarchical percent-of-parent ----------------------------------


@register(
    "q_hierarchical_share",
    oracle="""
    WITH rev AS (
        SELECT c.c_nationkey AS nk,
               SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1
    ),
    named AS (
        SELECT n.n_name AS nation, n.n_regionkey AS rk, r.cents
        FROM rev r JOIN nation n ON n.n_nationkey = r.nk
    ),
    region_tot AS (
        SELECT rk, CAST(SUM(cents) AS BIGINT) AS region_cents
        FROM named GROUP BY rk
    ),
    global_tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS global_cents FROM named)
    SELECT nm.nation, rg.r_name AS region,
           CAST(nm.cents AS BIGINT) AS nation_centi,
           CAST(nm.cents * 10000 // rt.region_cents AS BIGINT)
               AS share_of_region_bp,
           CAST(nm.cents * 10000 // gt.global_cents AS BIGINT)
               AS share_of_global_bp
    FROM named nm
    JOIN region_tot rt ON rt.rk = nm.rk
    JOIN region rg ON rg.r_regionkey = nm.rk
    CROSS JOIN global_tot gt
    """,
)
def q_hierarchical_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X230: hierarchical percent-of-parent (nation within region
    within global), exact bp.

    The multi-level ratio-to-report every OLAP drill-down renders:
    nation revenue, its share of the region subtotal, and its share of
    the grand total — all integer cents and truncating bp, no float
    shares to drift. The share denominators come from re-aggregating
    the 25-row nation relation, not re-scanning the fact.

    100 TB: ONE fact shuffle (custkey join + nation aggregate);
    everything above the 25-row relation is broadcast joins of
    dimension-sized subtotals — the canonical rollup-reuse plan.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    cents = F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.sum(cents).alias("cents"))
    )
    named = rev.join(
        F.broadcast(n), F.col("nk") == F.col("n_nationkey")
    ).select(F.col("n_name").alias("nation"), F.col("n_regionkey").alias("rk"), "cents")
    region_tot = named.groupBy("rk").agg(
        F.sum("cents").cast("bigint").alias("region_cents")
    )
    global_tot = named.agg(F.sum("cents").cast("bigint").alias("global_cents"))
    return (
        named.join(F.broadcast(region_tot), "rk")
        .join(F.broadcast(r), F.col("rk") == F.col("r_regionkey"))
        .crossJoin(F.broadcast(global_tot))
        .select(
            "nation",
            F.col("r_name").alias("region"),
            F.col("cents").cast("bigint").alias("nation_centi"),
            F.expr("cents * 10000 DIV region_cents")
            .cast("bigint")
            .alias("share_of_region_bp"),
            F.expr("cents * 10000 DIV global_cents")
            .cast("bigint")
            .alias("share_of_global_bp"),
        )
    )


# --- X231: watermark-delay audit -------------------------------------------


@register(
    "q_watermark_audit",
    oracle="""
    WITH timed AS (
        SELECT user_id, event_id, epoch_us(ts) AS em,
               epoch_us(ts)
               + ('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 10))::BIGINT
                 % 43200000000 AS arrival_us
        FROM events
    ),
    arr AS (
        SELECT user_id, event_id, em,
               MAX(em) OVER (
                   PARTITION BY user_id ORDER BY arrival_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        FROM timed
    ),
    lateness AS (
        SELECT CASE WHEN prev_max IS NULL OR prev_max <= em THEN 0
                    ELSE (prev_max - em) // 1000000 END AS delay_s
        FROM arr
    )
    SELECT CAST(CASE WHEN delay_s = 0 THEN 0
                     ELSE length(bin(delay_s)) END AS INT) AS delay_bucket,
           COUNT(*) AS n_events,
           CAST(MAX(delay_s) AS BIGINT) AS max_delay_s
    FROM lateness GROUP BY 1
    """,
)
def q_watermark_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X231: watermark-delay (event-time disorder) audit.

    The measurement that SIZES a streaming watermark instead of
    guessing: within each user's ARRIVAL order, an event is late by
    (running max of prior event times - its own event time). Arrival =
    event time + a deterministic md5-derived transport delay of 0-12 h
    (the synthetic corpus is perfectly ordered, so the disorder under
    audit is injected reproducibly — both engines derive the identical
    arrival sequence). Lateness in whole seconds, log2-bucketed
    (bucket 0 = in order; bucket b covers [2^(b-1), 2^b) seconds), with
    the max per bucket — read the top occupied bucket off this table
    and you have the withWatermark() delay that loses nothing (ST4's
    parameter, measured). Epoch-micros arithmetic, TZ-proof.

    100 TB: one shuffle on user_id for the running-max window; the
    histogram is a map-side-combining aggregate to <= 40 rows.
    """
    e = table(spark, sf_dir, "events")
    em = F.unix_micros("ts")
    arrival = em + F.expr(
        "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 10), 16, 10) "
        "AS BIGINT) % 43200000000"
    )
    timed = e.select(
        "user_id", "event_id", em.alias("em"), arrival.alias("arrival_us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("arrival_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    arr = timed.select(
        "em",
        F.max("em").over(w).alias("prev_max"),
    )
    delay = F.when(
        F.col("prev_max").isNull() | (F.col("prev_max") <= F.col("em")), 0
    ).otherwise(F.expr("(prev_max - em) DIV 1000000"))
    lateness = arr.select(delay.alias("delay_s"))
    bucket = F.when(F.col("delay_s") == 0, 0).otherwise(
        F.length(F.bin(F.col("delay_s")))
    )
    return lateness.groupBy(bucket.cast("int").alias("delay_bucket")).agg(
        F.count("*").alias("n_events"),
        F.max("delay_s").cast("bigint").alias("max_delay_s"),
    )


# --- X232: as-of snapshot diff ---------------------------------------------

_SNAP_T1 = "1997-12-31"
_SNAP_T2 = "1999-12-31"
_DAY_PACK = 10_000_000_000


def _snapshot_sql(t: str) -> str:
    return f"""
        SELECT o_custkey AS ck,
               MAX((date_diff('day', DATE '1995-01-01',
                              CAST(o_orderdate AS DATE)) * {_DAY_PACK}
                    + o_orderkey) * 10
                   + CAST(substring(o_orderpriority, 1, 1) AS BIGINT))
                   % 10 AS prio
        FROM orders
        WHERE CAST(o_orderdate AS DATE) <= DATE '{t}'
        GROUP BY 1"""


@register(
    "q_snapshot_asof_diff",
    oracle=f"""
    WITH s1 AS ({_snapshot_sql(_SNAP_T1)}),
    s2 AS ({_snapshot_sql(_SNAP_T2)}),
    joined AS (
        SELECT s2.ck, s1.prio AS p1, s2.prio AS p2
        FROM s2 LEFT JOIN s1 ON s1.ck = s2.ck
    )
    SELECT CASE WHEN p1 IS NULL THEN 'added'
                WHEN p1 = p2 THEN 'unchanged'
                ELSE 'changed' END AS change_kind,
           COUNT(*) AS n_customers,
           CAST(MIN(ck) AS BIGINT) AS example_custkey
    FROM joined GROUP BY 1
    """,
)
def q_snapshot_asof_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X232: as-of snapshot reconstruction at two times + diff census.

    The bitemporal audit completing X74 (PIT join) and X39 (SCD2
    build): each customer's state = priority digit of their LATEST
    order as of T (latest by orderdate, ties to highest orderkey —
    ONE packed-integer MAX per snapshot, no window, no join-back:
    (days*1e10 + orderkey)*10 + prio, state = packed % 10).
    Reconstructs the T1 and T2 snapshots and classifies every
    T2 customer as added / changed / unchanged — the sanity check a
    CDC pipeline (X106) runs against its own compaction.

    100 TB: two filtered aggregates on the same key (one shuffle each,
    pushdown-pruned by the date predicate), one key equi-join of the
    per-customer states, 3-row census.
    """
    o = table(spark, sf_dir, "orders")

    def snapshot(t: str) -> DataFrame:
        packed = F.expr(
            f"(datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') "
            f"* {_DAY_PACK} + o_orderkey) * 10 "
            f"+ CAST(substring(o_orderpriority, 1, 1) AS BIGINT)"
        )
        return (
            o.where(F.col("o_orderdate").cast("date") <= F.lit(t))
            .groupBy(F.col("o_custkey").alias("ck"))
            .agg((F.max(packed) % 10).alias("prio"))
        )

    s1 = snapshot(_SNAP_T1).withColumnRenamed("prio", "p1")
    s2 = snapshot(_SNAP_T2).withColumnRenamed("prio", "p2")
    joined = s2.join(s1, "ck", "left")
    kind = (
        F.when(F.col("p1").isNull(), "added")
        .when(F.col("p1") == F.col("p2"), "unchanged")
        .otherwise("changed")
    )
    return joined.groupBy(kind.alias("change_kind")).agg(
        F.count("*").alias("n_customers"),
        F.min("ck").cast("bigint").alias("example_custkey"),
    )
