"""Round-5 widening queries, third batch (SURVEY.md §2.13, X214-X217).

- X214 nearest-hub (Voronoi) assignment census: every point assigned
  to its nearest of k broadcast hubs by exact integer distance — the
  k-partition assignment plan shape (IVF's X2 assignment step, made
  hash-verifiable).
- X215 2-core graph peeling, exactly verified: three unrolled
  degree-peel iterations (X50's verified-iteration discipline on the
  co-purchase graph) — the k-core decomposition inner loop.
- X216 KMV (k-minimum-values) distinct sketch audit: bottom-k md5
  hashes per group, estimator ((k-1)<<48) DIV h_k vs exact distinct —
  the third sketch family (X56 HLL, X206 CMS) made exactly
  verifiable, with its measured error.
- X217 checksum (Luhn) validation census: digit-transform checksum
  validation at scale, pure codegen — the data-quality gate for
  id-like columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# --- X214: nearest-hub (Voronoi) assignment census -------------------------

_GRID = 10_000
_N_HUBS = 20


@register(
    "q_nearest_hub",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey AS id,
               ('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 7))::BIGINT
                   % {_GRID} AS x,
               ('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 9, 7))::BIGINT
                   % {_GRID} AS y
        FROM customer
    ),
    hubs AS (
        SELECT h AS hub_id,
               ('0x' || substring(md5('hub|' || CAST(h AS VARCHAR)), 1, 7))::BIGINT
                   % {_GRID} AS hx,
               ('0x' || substring(md5('hub|' || CAST(h AS VARCHAR)), 9, 7))::BIGINT
                   % {_GRID} AS hy
        FROM (SELECT UNNEST(generate_series(0, {_N_HUBS - 1})) AS h)
    ),
    dists AS (
        SELECT p.id, h.hub_id,
               (p.x - h.hx) * (p.x - h.hx) + (p.y - h.hy) * (p.y - h.hy) AS d2
        FROM pts p CROSS JOIN hubs h
    ),
    best AS (
        SELECT id, MIN(d2 * {_N_HUBS} + hub_id) AS packed
        FROM dists GROUP BY id
    )
    SELECT CAST(packed % {_N_HUBS} AS INT) AS hub_id,
           COUNT(*) AS n_points,
           CAST(SUM(packed // {_N_HUBS}) AS BIGINT) AS sum_d2,
           CAST(MIN(id) AS BIGINT) AS example_id
    FROM best GROUP BY 1
    """,
)
def q_nearest_hub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X214: nearest-hub (Voronoi cell) assignment census, exact.

    Every md5-derived customer point assigned to the nearest of 20
    md5-derived hubs by exact integer squared distance, ties broken by
    hub id (the argmin packs (d2, hub_id) into one bigint — d2*k+id —
    so a single MIN aggregate is the whole argmin, no join-back);
    census per Voronoi cell: population, total squared distance,
    example. This is IVF's (X2) assignment step made hash-verifiable.

    100 TB: the hub table broadcasts (constant rows); assignment is
    scan-local arithmetic + one aggregate per point and one per cell —
    the canonical broadcast-NL + min_by plan for small-k assignment.
    """
    c = table(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        F.expr(
            f"CAST(conv(substring(md5(CAST(c_custkey AS STRING)), 1, 7), 16, 10) "
            f"AS BIGINT) % {_GRID}"
        ).alias("x"),
        F.expr(
            f"CAST(conv(substring(md5(CAST(c_custkey AS STRING)), 9, 7), 16, 10) "
            f"AS BIGINT) % {_GRID}"
        ).alias("y"),
    )
    hubs = spark.range(_N_HUBS).select(
        F.col("id").alias("hub_id"),
        F.expr(
            f"CAST(conv(substring(md5(concat('hub|', CAST(id AS STRING))), 1, 7), "
            f"16, 10) AS BIGINT) % {_GRID}"
        ).alias("hx"),
        F.expr(
            f"CAST(conv(substring(md5(concat('hub|', CAST(id AS STRING))), 9, 7), "
            f"16, 10) AS BIGINT) % {_GRID}"
        ).alias("hy"),
    )
    d2 = (F.col("x") - F.col("hx")) * (F.col("x") - F.col("hx")) + (
        F.col("y") - F.col("hy")
    ) * (F.col("y") - F.col("hy"))
    best = (
        pts.crossJoin(F.broadcast(hubs))
        .select("id", (d2 * _N_HUBS + F.col("hub_id")).alias("scored"))
        .groupBy("id")
        .agg(F.min("scored").alias("packed"))
    )
    return best.groupBy(
        (F.col("packed") % _N_HUBS).cast("int").alias("hub_id")
    ).agg(
        F.count("*").alias("n_points"),
        F.sum(F.expr(f"packed DIV {_N_HUBS}")).cast("bigint").alias("sum_d2"),
        F.min("id").cast("bigint").alias("example_id"),
    )


# --- X215: 2-core graph peeling, exactly verified --------------------------


def _core_oracle() -> str:
    """Three unrolled peel iterations of the 2-core decomposition over
    the co-purchase graph (same edge derivation as X117): drop nodes
    with degree < 2, recompute degrees on the induced subgraph,
    repeat."""
    steps = []
    prev = "e0"
    for t in (1, 2, 3):
        steps.append(
            f"""
    d{t} AS (
        SELECT node, COUNT(*) AS deg FROM (
            SELECT a AS node FROM {prev}
            UNION ALL SELECT b FROM {prev}
        ) GROUP BY node
    ),
    keep{t} AS (SELECT node FROM d{t} WHERE deg >= 2),
    e{t} AS (
        SELECT e.a, e.b FROM {prev} e
        JOIN keep{t} ka ON ka.node = e.a
        JOIN keep{t} kb ON kb.node = e.b
    )"""
        )
        prev = f"e{t}"
    return (
        """
    WITH pairs AS (
        SELECT DISTINCT l.l_partkey AS a, r.l_partkey AS b
        FROM lineitem l JOIN lineitem r
          ON r.l_orderkey = l.l_orderkey AND r.l_partkey > l.l_partkey
        WHERE l.l_orderkey % 20 = 0 AND r.l_orderkey % 20 = 0
    ),
    e0 AS (SELECT a, b FROM pairs),"""
        + ",".join(steps)
        + """
    SELECT 0 AS peel_step,
           (SELECT COUNT(*) FROM e0) AS n_edges,
           (SELECT COUNT(*) FROM d1) AS n_nodes
    UNION ALL SELECT 1, (SELECT COUNT(*) FROM e1),
                     (SELECT COUNT(*) FROM keep1)
    UNION ALL SELECT 2, (SELECT COUNT(*) FROM e2),
                     (SELECT COUNT(*) FROM keep2)
    UNION ALL SELECT 3, (SELECT COUNT(*) FROM e3),
                     (SELECT COUNT(*) FROM keep3)
    """
    )


@register("q_kcore_peel", oracle=_core_oracle())
def q_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X215: 2-core graph peeling, three exactly-verified iterations.

    The k-core decomposition inner loop on the co-purchase graph
    (X117's edge derivation, 5% order sample): each peel removes
    degree-<2 nodes and recomputes degrees on the induced subgraph.
    Reports edge/node counts per peel step — the convergence trace a
    real core decomposition monitors. The oracle unrolls the identical
    three iterations (X50's discipline).

    100 TB: each iteration is one degree aggregate + two semi-joins of
    the shrinking edge list against the <=|V|-row keep set; the edge
    list only ever shrinks, and lineage is truncated per iteration
    with localCheckpoint exactly like X12/X50.
    """
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 20 == 0)
    l, r = li.alias("l"), li.alias("r")
    edges = (
        l.join(
            r,
            (F.col("r.l_orderkey") == F.col("l.l_orderkey"))
            & (F.col("r.l_partkey") > F.col("l.l_partkey")),
        )
        .select(F.col("l.l_partkey").alias("a"), F.col("r.l_partkey").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    rows = []
    e = edges
    for t in (1, 2, 3):
        deg = (
            e.select(F.col("a").alias("node"))
            .unionAll(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        if t == 1:
            n0 = deg.agg(
                F.count("*").alias("n_nodes")
            ).crossJoin(e.agg(F.count("*").alias("n_edges"))).select(
                F.lit(0).alias("peel_step"), "n_edges", "n_nodes"
            )
            rows.append(n0)
        keep = deg.where(F.col("deg") >= 2).select("node")
        e = (
            e.join(
                keep.withColumnRenamed("node", "a"), "a"
            )
            .join(keep.withColumnRenamed("node", "b"), "b")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        step = e.agg(F.count("*").alias("n_edges")).crossJoin(
            keep.agg(F.count("*").alias("n_nodes"))
        ).select(F.lit(t).alias("peel_step"), "n_edges", "n_nodes")
        rows.append(step)
    res = rows[0]
    for df in rows[1:]:
        res = res.unionByName(df)
    return res


# --- X216: KMV (k-minimum-values) distinct sketch audit --------------------

_KMV_K = 64


@register(
    "q_kmv_distinct_audit",
    oracle=f"""
    WITH hashed AS (
        SELECT DISTINCT o_orderpriority AS grp,
               ('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 12))::BIGINT
                   AS h
        FROM orders
    ),
    ranked AS (
        SELECT grp, h,
               ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rk
        FROM hashed
    ),
    kth AS (
        SELECT grp, h AS hk FROM ranked WHERE rk = {_KMV_K}
    ),
    exact AS (
        SELECT o_orderpriority AS grp, COUNT(DISTINCT o_custkey) AS exact_n
        FROM orders GROUP BY 1
    )
    SELECT e.grp AS o_orderpriority, e.exact_n,
           CAST(({_KMV_K} - 1) * 281474976710656 // k.hk AS BIGINT) AS kmv_est,
           CAST(ABS(({_KMV_K} - 1) * 281474976710656 // k.hk - e.exact_n)
                * 10000 // e.exact_n AS BIGINT) AS err_bp
    FROM exact e JOIN kth k ON k.grp = e.grp
    """,
)
def q_kmv_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X216: KMV (k-minimum-values / bottom-k) distinct sketch audit,
    exactly verified.

    The third sketch family alongside HLL (X56) and count-min (X206):
    per group, the k=64 smallest 48-bit md5 hashes of the distinct
    keys; the estimator (k-1) * 2^48 DIV h_k (h_k = k-th smallest)
    estimates distinct cardinality; joined against the exact distinct
    count with the measured error in bp. 48-bit hashes keep
    (k-1)<<48 inside bigint on both engines — no HUGEINT needed.

    100 TB: the bottom-k per group is a (grp, h) distinct + per-group
    top-k (X157's salted two-level form at extreme skew); the sketch
    is mergeable (union = bottom-k of the union), the property that
    makes KMV a partial-aggregate at cluster scale.
    """
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    hashed = (
        o.select(
            F.col("o_orderpriority").alias("grp"),
            F.expr(
                "CAST(conv(substring(md5(CAST(o_custkey AS STRING)), 1, 12), "
                "16, 10) AS BIGINT)"
            ).alias("h"),
        )
        .distinct()
    )
    ranked = hashed.select(
        "grp",
        "h",
        F.row_number().over(Window.partitionBy("grp").orderBy("h")).alias("rk"),
    )
    kth = ranked.where(F.col("rk") == _KMV_K).select(
        "grp", F.col("h").alias("hk")
    )
    exact = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count_distinct("o_custkey").alias("exact_n")
    )
    est = F.expr(f"({_KMV_K} - 1) * 281474976710656 DIV hk")
    return (
        exact.join(F.broadcast(kth), "grp")
        .select(
            F.col("grp").alias("o_orderpriority"),
            "exact_n",
            est.cast("bigint").alias("kmv_est"),
            F.expr(
                f"ABS(({_KMV_K} - 1) * 281474976710656 DIV hk - exact_n) "
                f"* 10000 DIV exact_n"
            )
            .cast("bigint")
            .alias("err_bp"),
        )
    )


# --- X217: checksum (Luhn) validation census -------------------------------


@register(
    "q_luhn_checksum",
    oracle="""
    WITH ids AS (
        SELECT o_orderkey,
               lpad(CAST(o_orderkey AS VARCHAR), 12, '0')
                   || CAST(o_orderkey % 10 AS VARCHAR) AS acct
        FROM orders
    ),
    digits AS (
        SELECT o_orderkey, acct, i,
               CAST(acct[length(acct) - i + 1] AS BIGINT) AS d
        FROM ids, UNNEST(generate_series(1, 13)) AS u(i)
    ),
    terms AS (
        SELECT o_orderkey, acct,
               CASE WHEN i % 2 = 0
                    THEN CASE WHEN d * 2 > 9 THEN d * 2 - 9 ELSE d * 2 END
                    ELSE d END AS term
        FROM digits
    ),
    checked AS (
        SELECT o_orderkey, acct, SUM(term) AS s FROM terms
        GROUP BY o_orderkey, acct
    )
    SELECT CAST(CASE WHEN s % 10 = 0 THEN 1 ELSE 0 END AS INT) AS luhn_valid,
           COUNT(*) AS n_ids,
           CAST(MIN(o_orderkey) AS BIGINT) AS example_key
    FROM checked GROUP BY 1
    """,
)
def q_luhn_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X217: Luhn checksum validation census, pure codegen.

    Data-quality gate for id-like columns (card/IMEI/account formats):
    each synthetic 13-digit account id (zero-padded orderkey + a naive
    mod-10 suffix) is Luhn-checked — double every second digit from
    the right, subtract 9 above 9, sum, valid iff sum % 10 == 0 — and
    the census reports the valid/invalid split. The whole check is a
    scan-local digit transform + one aggregate: no UDF, no explode
    shuffle (the digit explode feeds a per-key combine in the same
    stage at scale the per-row sum folds into aggregate expressions).

    100 TB: scan-local arithmetic; output is a 2-row census.
    """
    o = table(spark, sf_dir, "orders")
    ids = o.select(
        "o_orderkey",
        F.concat(
            F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
            (F.col("o_orderkey") % 10).cast("string"),
        ).alias("acct"),
    )
    # sum Luhn terms with a scan-local array fold — no explode needed
    def digit(i):  # i-th digit from the right, 1-based
        return F.reverse(F.col("acct")).substr(i, F.lit(1)).cast("bigint")

    def term(i):
        dbl = digit(i) * 2
        return F.when(
            i % 2 == 0, F.when(dbl > 9, dbl - 9).otherwise(dbl)
        ).otherwise(digit(i))

    s = F.aggregate(
        F.transform(F.sequence(F.lit(1), F.lit(13)), term),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    checked = ids.select("o_orderkey", s.alias("s"))
    return checked.groupBy(
        F.when(F.col("s") % 10 == 0, 1).otherwise(0).cast("int").alias("luhn_valid")
    ).agg(
        F.count("*").alias("n_ids"),
        F.min("o_orderkey").cast("bigint").alias("example_key"),
    )
