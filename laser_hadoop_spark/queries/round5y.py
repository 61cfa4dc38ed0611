"""Round-5 widening queries, twenty-fifth batch (SURVEY.md §2.13, X329-X333).

Attribution game theory, order-statistic moments, species-richness
estimation, inventory cost layering, and hash-quality auditing:

- X329 exact Shapley channel attribution: coalition values from the
  observed touch-set masks (conversion rate per mask), Shapley credit
  per channel via the observed-mask decomposition (each observed mask
  contributes positively to its members at weight (s-1)!(n-s)! and
  negatively to its non-members at weight s!(n-1-s)!) — no 2^n
  enumeration, terms where both coalition values vanish never exist.
- X330 L-moments (lambda1..4, L-skew, L-kurt): the order-statistic
  moment family that is robust where classical moments (X174) explode
  — per-point binomial-weight terms micro-round on the two-pass
  global rank, lambda combinations as exact wide-integer sums.
- X331 Chao1 richness + Good's coverage: how many distinct tokens a
  source WOULD show with infinite sampling, from the singleton /
  doubleton census — the vocabulary-completeness audit next to X176's
  coverage curve and X253's Heaps fit.
- X332 FIFO cost layering: consume each part's supply layers in
  ship-date order against a half-of-total demand mark; full layers at
  face value, the boundary layer pro-rated — the inventory-accounting
  COGS allocation (keyed interval arithmetic, no self-join).
- X333 birthday-collision hash audit: 24-bit md5-prefix bucket
  collisions vs the n(n-1)/2^25 birthday expectation — the engine
  auditing the uniformity of its OWN partitioner/sampler hash family
  (complement of X324's rank-side Anderson-Darling).

Reference parity note: engine extensions per SURVEY.md §2.13.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laser_hadoop_spark.operators.cumulative import ordered_cumsum
from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# --- X329: exact Shapley channel attribution ---------------------------------


def _fact_expr(col: F.Column) -> F.Column:
    """0!..8! as a when-chain (coalition sizes are tiny by construction)."""
    expr = F.when(col == 0, 1)
    for k, f in [(1, 1), (2, 2), (3, 6), (4, 24), (5, 120), (6, 720), (7, 5040), (8, 40320)]:
        expr = expr.when(col == k, f)
    return expr.cast("bigint")


@register(
    "q_shapley_attribution",
    oracle="""
    WITH chans AS (
        SELECT event_type AS channel,
               ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS idx
        FROM (SELECT DISTINCT event_type FROM events
              WHERE event_type <> 'purchase')
    ),
    nch AS (SELECT COUNT(*) AS n FROM chans),
    touches AS (
        SELECT DISTINCT e.user_id, c.idx
        FROM events e JOIN chans c ON c.channel = e.event_type
    ),
    convs AS (
        SELECT user_id, MAX(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY user_id
    ),
    masks AS (
        SELECT user_id, SUM(1 << idx) AS mask FROM touches GROUP BY user_id
    ),
    user_mask AS (
        SELECT cv.user_id, COALESCE(m.mask, 0) AS mask, cv.conv
        FROM convs cv LEFT JOIN masks m ON m.user_id = cv.user_id
    ),
    mask_stats AS (
        SELECT mask, COUNT(*) AS n_users, SUM(conv) AS n_conv,
               CAST(ROUND(1000000.0 * SUM(conv) / COUNT(*)) AS BIGINT)
                   AS v_micro,
               CAST(bit_count(CAST(mask AS BIGINT)) AS BIGINT) AS s
        FROM user_mask GROUP BY mask
    ),
    fact(k, f) AS (VALUES (0, 1), (1, 1), (2, 2), (3, 6), (4, 24),
                          (5, 120), (6, 720), (7, 5040), (8, 40320)),
    terms AS (
        SELECT c.channel, c.idx,
               CASE WHEN (m.mask >> c.idx) & 1 = 1
                    THEN fp.f * fq.f * m.v_micro
                    ELSE -(fn.f * fm.f * m.v_micro) END AS term,
               CASE WHEN (m.mask >> c.idx) & 1 = 1
                    THEN m.n_users ELSE 0 END AS touched
        FROM mask_stats m
        CROSS JOIN chans c
        CROSS JOIN nch
        LEFT JOIN fact fp ON fp.k = m.s - 1
        LEFT JOIN fact fq ON fq.k = nch.n - m.s
        LEFT JOIN fact fn ON fn.k = m.s
        LEFT JOIN fact fm ON fm.k = nch.n - 1 - m.s
    ),
    nfact AS (SELECT f.f AS nf FROM nch JOIN fact f ON f.k = nch.n)
    SELECT t.channel,
           CAST(SUM(t.touched) AS BIGINT) AS n_touch_users,
           CAST(ROUND(CAST(SUM(t.term) AS DOUBLE) / nf.nf) AS BIGINT)
               AS shapley_micro
    FROM terms t CROSS JOIN nfact nf
    GROUP BY t.channel, nf.nf
    ORDER BY t.channel
    """,
)
def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X329: exact Shapley-value channel attribution.

    Coalition value v(S) = conversion rate (micro) among users whose
    touched-channel set is exactly S (unobserved coalitions contribute
    zero). Shapley credit per channel uses the observed-mask
    decomposition: phi_i = [ sum over observed masks M containing i of
    (|M|-1)!(n-|M|)! v(M)  -  sum over masks M not containing i of
    |M|!(n-1-|M|)! v(M) ] / n! — algebraically identical to the
    textbook subset sum but it only ever touches OBSERVED masks, so no
    2^n enumeration exists anywhere in the plan. All weights are exact
    integers; one float division per channel at the end.

    100 TB: one pass to per-user masks (conditional-bit aggregate),
    one shuffle to the <=2^n mask-stats relation; the Shapley join is
    |masks| x |channels| — constant-size, broadcast.
    """
    e = table(spark, sf_dir, "events")
    chans = (
        e.where(F.col("event_type") != "purchase")
        .select("event_type")
        .distinct()
        .select(
            F.col("event_type").alias("channel"),
            (F.row_number().over(Window.orderBy("event_type")) - 1).alias("idx"),
        )
        .localCheckpoint(eager=True)
    )
    n_ch = chans.count()
    touches = (
        e.join(F.broadcast(chans), e.event_type == chans.channel)
        .select("user_id", "idx")
        .distinct()
    )
    convs = e.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "conv"
        )
    )
    masks = touches.groupBy("user_id").agg(
        F.sum(F.expr("shiftleft(1, idx)")).alias("mask_raw")
    )
    user_mask = convs.join(masks, "user_id", "left").select(
        "user_id",
        F.coalesce(F.col("mask_raw"), F.lit(0)).cast("bigint").alias("mask"),
        "conv",
    )
    mask_stats = (
        user_mask.groupBy("mask")
        .agg(F.count("*").alias("n_users"), F.sum("conv").alias("n_conv"))
        .select(
            "mask",
            "n_users",
            F.round(F.lit(1000000.0) * F.col("n_conv") / F.col("n_users"))
            .cast("bigint")
            .alias("v_micro"),
            F.bit_count(F.col("mask")).cast("bigint").alias("s"),
        )
    )
    n_fact = [1, 1, 2, 6, 24, 120, 720, 5040, 40320][n_ch]
    terms = mask_stats.crossJoin(F.broadcast(chans)).select(
        "channel",
        F.when(
            F.expr("(mask >> idx) & 1 = 1"),
            _fact_expr(F.col("s") - 1)
            * _fact_expr(F.lit(n_ch) - F.col("s"))
            * F.col("v_micro"),
        )
        .otherwise(
            -(
                _fact_expr(F.col("s"))
                * _fact_expr(F.lit(n_ch) - 1 - F.col("s"))
                * F.col("v_micro")
            )
        )
        .alias("term"),
        F.when(F.expr("(mask >> idx) & 1 = 1"), F.col("n_users"))
        .otherwise(0)
        .alias("touched"),
    )
    return (
        terms.groupBy("channel")
        .agg(
            F.sum("touched").cast("bigint").alias("n_touch_users"),
            F.round(F.sum("term").cast("double") / F.lit(n_fact))
            .cast("bigint")
            .alias("shapley_micro"),
        )
        .orderBy("channel")
    )


# --- X330: L-moments ----------------------------------------------------------


@register(
    "q_l_moments",
    oracle="""
    WITH pts AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderkey
        FROM orders
    ),
    ranked AS (
        SELECT cents,
               CAST(ROW_NUMBER() OVER (ORDER BY cents, o_orderkey)
                    AS BIGINT) AS i
        FROM pts
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pts),
    terms AS (
        SELECT r.cents,
               CAST(ROUND((CAST((r.i - 1) AS DOUBLE) / (nn.n - 1))
                          * (r.cents * 1000000)) AS BIGINT) AS t1,
               CAST(ROUND((CAST((r.i - 1) * (r.i - 2) AS DOUBLE)
                           / ((nn.n - 1) * (nn.n - 2)))
                          * (r.cents * 1000000)) AS BIGINT) AS t2,
               CAST(ROUND((CAST((r.i - 1) * (r.i - 2) * (r.i - 3) AS DOUBLE)
                           / ((nn.n - 1) * (nn.n - 2) * (nn.n - 3)))
                          * (r.cents * 1000000)) AS BIGINT) AS t3
        FROM ranked r CROSS JOIN nn
    ),
    sums AS (
        SELECT SUM(cents * 1000000) AS s0, SUM(t1) AS s1,
               SUM(t2) AS s2, SUM(t3) AS s3
        FROM terms
    )
    SELECT nn.n,
           CAST(ROUND(CAST(sums.s0 AS DOUBLE) / nn.n) AS BIGINT)
               AS l1_micro,
           CAST(ROUND(CAST(2 * sums.s1 - sums.s0 AS DOUBLE) / nn.n)
                AS BIGINT) AS l2_micro,
           CAST(ROUND(CAST(6 * sums.s2 - 6 * sums.s1 + sums.s0 AS DOUBLE)
                      / nn.n) AS BIGINT) AS l3_micro,
           CAST(ROUND(CAST(20 * sums.s3 - 30 * sums.s2 + 12 * sums.s1
                           - sums.s0 AS DOUBLE) / nn.n) AS BIGINT)
               AS l4_micro,
           CAST(ROUND(1000000.0
                      * CAST(6 * sums.s2 - 6 * sums.s1 + sums.s0 AS DOUBLE)
                      / CAST(2 * sums.s1 - sums.s0 AS DOUBLE)) AS BIGINT)
               AS lskew_micro,
           CAST(ROUND(1000000.0
                      * CAST(20 * sums.s3 - 30 * sums.s2 + 12 * sums.s1
                             - sums.s0 AS DOUBLE)
                      / CAST(2 * sums.s1 - sums.s0 AS DOUBLE)) AS BIGINT)
               AS lkurt_micro
    FROM sums CROSS JOIN nn
    """,
)
def q_l_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X330: first four L-moments + L-skewness / L-kurtosis, exact.

    The order-statistic moment family (Hosking 1990): lambda1=b0,
    lambda2=2b1-b0, lambda3=6b2-6b1+b0, lambda4=20b3-30b2+12b1-b0 with
    b_r the unbiased probability-weighted moments. Where X174's
    classical skew/kurtosis are dominated by a handful of extreme
    orders, the L-ratios are bounded in [-1,1] and exist whenever the
    mean does — the robust shape summary hydrology standardized on.
    Each per-point binomial weight is ONE float division of exact
    integer products, micro-scaled against the cents value and rounded
    (X318's plotting-position discipline); the b_r sums ride as
    wide-decimal integers so lambda combinations stay exact until the
    final division.

    100 TB: the global rank is ordered_cumsum's two-pass range
    partitioning (zero single-partition windows); everything after is
    one 1-row aggregate.
    """
    o = table(spark, sf_dir, "orders")
    pts = o.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        "o_orderkey",
    )
    ranked = ordered_cumsum(
        pts, order_by=["cents", "o_orderkey"], row_number_col="i"
    ).select("cents", F.col("i").cast("bigint").alias("i"))
    nn = F.broadcast(pts.agg(F.count("*").cast("bigint").alias("n")))
    t = ranked.crossJoin(nn)
    i, n, cents = F.col("i"), F.col("n"), F.col("cents")
    micro = cents * F.lit(1000000)
    terms = t.select(
        "n",
        micro.alias("m0"),
        F.round(((i - 1).cast("double") / (n - 1)) * micro)
        .cast("bigint")
        .alias("t1"),
        F.round(
            (((i - 1) * (i - 2)).cast("double") / ((n - 1) * (n - 2))) * micro
        )
        .cast("bigint")
        .alias("t2"),
        F.round(
            (((i - 1) * (i - 2) * (i - 3)).cast("double")
             / ((n - 1) * (n - 2) * (n - 3)))
            * micro
        )
        .cast("bigint")
        .alias("t3"),
    )
    dec = "decimal(38,0)"
    sums = terms.groupBy("n").agg(
        F.sum(F.col("m0").cast(dec)).alias("s0"),
        F.sum(F.col("t1").cast(dec)).alias("s1"),
        F.sum(F.col("t2").cast(dec)).alias("s2"),
        F.sum(F.col("t3").cast(dec)).alias("s3"),
    )
    s0, s1, s2, s3 = F.col("s0"), F.col("s1"), F.col("s2"), F.col("s3")
    l2_num = (2 * s1 - s0).cast("double")
    l3_num = (6 * s2 - 6 * s1 + s0).cast("double")
    l4_num = (20 * s3 - 30 * s2 + 12 * s1 - s0).cast("double")
    return sums.select(
        "n",
        F.round(s0.cast("double") / F.col("n")).cast("bigint").alias("l1_micro"),
        F.round(l2_num / F.col("n")).cast("bigint").alias("l2_micro"),
        F.round(l3_num / F.col("n")).cast("bigint").alias("l3_micro"),
        F.round(l4_num / F.col("n")).cast("bigint").alias("l4_micro"),
        F.round(F.lit(1000000.0) * l3_num / l2_num)
        .cast("bigint")
        .alias("lskew_micro"),
        F.round(F.lit(1000000.0) * l4_num / l2_num)
        .cast("bigint")
        .alias("lkurt_micro"),
    )


# --- X331: Chao1 richness + Good's coverage ----------------------------------


@register(
    "q_chao1_richness",
    oracle="""
    WITH toks AS (
        SELECT source, UNNEST(string_split(text, ' ')) AS tok
        FROM documents
    ),
    census AS (
        SELECT source, tok, COUNT(*) AS k
        FROM toks GROUP BY source, tok
    ),
    stats AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS s_obs,
               CAST(SUM(k) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
               CAST(SUM(CASE WHEN k = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        FROM census GROUP BY source
    )
    SELECT source, s_obs, n_tokens, f1, f2,
           s_obs * 1000000
               + CAST(ROUND(1000000.0 * (f1 * (f1 - 1))
                            / (2 * (f2 + 1))) AS BIGINT) AS chao1_micro,
           CAST(ROUND(10000.0 * (n_tokens - f1) / n_tokens) AS BIGINT)
               AS coverage_bp
    FROM stats ORDER BY source
    """,
)
def q_chao1_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X331: Chao1 species-richness estimate + Good's coverage, per source.

    From the singleton/doubleton token census: Chao1 (bias-corrected)
    = S_obs + f1(f1-1)/(2(f2+1)) estimates how many distinct tokens
    the source would reveal with unbounded sampling, and Good's
    coverage 1 - f1/N says what fraction of the next token draw is
    already-seen mass. The vocabulary-completeness audit that tells a
    corpus curator whether X176's coverage curve has plateaued for
    real or the source is just undersampled (X253's Heaps exponent is
    the growth-rate view of the same question). Exact integer census;
    one float division per estimator.

    100 TB: scan-local tokenization, one (source, tok) combine, one
    |sources|-row aggregate — X253's exact plan shape.
    """
    d = table(spark, sf_dir, "documents")
    census = (
        d.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("k"))
    )
    stats = census.groupBy("source").agg(
        F.count("*").cast("bigint").alias("s_obs"),
        F.sum("k").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("k") == 1, 1).otherwise(0)).cast("bigint").alias("f1"),
        F.sum(F.when(F.col("k") == 2, 1).otherwise(0)).cast("bigint").alias("f2"),
    )
    f1, f2, n = F.col("f1"), F.col("f2"), F.col("n_tokens")
    return stats.select(
        "source",
        "s_obs",
        "n_tokens",
        "f1",
        "f2",
        (
            F.col("s_obs") * 1000000
            + F.round(F.lit(1000000.0) * (f1 * (f1 - 1)) / (2 * (f2 + 1))).cast(
                "bigint"
            )
        ).alias("chao1_micro"),
        F.round(F.lit(10000.0) * (n - f1) / n).cast("bigint").alias("coverage_bp"),
    ).orderBy("source")


# --- X332: FIFO cost layering -------------------------------------------------


@register(
    "q_fifo_cogs",
    oracle="""
    WITH layers AS (
        SELECT l_partkey,
               CAST(l_quantity AS BIGINT) AS qty,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS ext_cents,
               SUM(CAST(l_quantity AS BIGINT)) OVER (
                   PARTITION BY l_partkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_qty
        FROM lineitem
    ),
    tot AS (
        SELECT l_partkey, SUM(qty) AS t_qty FROM layers GROUP BY l_partkey
    ),
    alloc AS (
        SELECT l.l_partkey, l.qty, l.ext_cents,
               t.t_qty // 2 AS demand,
               LEAST(l.qty,
                     GREATEST(0, t.t_qty // 2 - (l.cum_qty - l.qty)))
                   AS used
        FROM layers l JOIN tot t ON t.l_partkey = l.l_partkey
    )
    SELECT l_partkey,
           CAST(MAX(demand) AS BIGINT) AS demand_units,
           CAST(SUM(CAST(ROUND(CAST(ext_cents * used AS DOUBLE) / qty)
                         AS BIGINT)) AS BIGINT) AS cogs_cents,
           CAST(SUM(CASE WHEN used > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_layers_used
    FROM alloc
    GROUP BY l_partkey
    HAVING MAX(demand) > 0
    ORDER BY l_partkey
    """,
)
def q_fifo_cogs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X332: FIFO inventory cost layering (COGS at the half-demand mark).

    Treat each part's lineitem rows, in ship-date order, as supply
    layers; consume floor(total/2) units first-in-first-out. A layer's
    contribution is its full face value while wholly consumed and
    pro-rated (one float division, rounded to cents) at the boundary
    — the inventory-accounting allocation (FIFO COGS) that otherwise
    tempts an O(n^2) self-join of sells against buys; here it is pure
    keyed cumulative arithmetic: used = clamp(demand - cum_before,
    0, qty).

    100 TB: the running quantity is a per-part window (bounded group
    size), totals are one keyed aggregate joined back on the same
    key — two shuffles on l_partkey, both AQE-coalesced.
    """
    li = table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    layers = li.select(
        "l_partkey",
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("ext_cents"),
    ).withColumn("cum_qty", F.sum("qty").over(w))
    tot = layers.groupBy("l_partkey").agg(F.sum("qty").alias("t_qty"))
    demand = F.floor(F.col("t_qty") / 2).cast("bigint")
    alloc = layers.join(tot, "l_partkey").select(
        "l_partkey",
        "qty",
        "ext_cents",
        demand.alias("demand"),
        F.least(
            F.col("qty"),
            F.greatest(F.lit(0), demand - (F.col("cum_qty") - F.col("qty"))),
        ).alias("used"),
    )
    return (
        alloc.groupBy("l_partkey")
        .agg(
            F.max("demand").cast("bigint").alias("demand_units"),
            F.sum(
                F.round(
                    (F.col("ext_cents") * F.col("used")).cast("double")
                    / F.col("qty")
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("cogs_cents"),
            F.sum(F.when(F.col("used") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_layers_used"),
        )
        .where(F.col("demand_units") > 0)
        .orderBy("l_partkey")
    )


# --- X333: birthday-collision hash audit -------------------------------------


@register(
    "q_hash_collision_audit",
    oracle="""
    WITH hashed AS (
        SELECT CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)),
                                       1, 6)) AS BIGINT) AS bucket
        FROM orders
    ),
    buckets AS (
        SELECT bucket, COUNT(*) AS k FROM hashed GROUP BY bucket
    ),
    stats AS (
        SELECT CAST(SUM(k) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
               CAST(SUM((k * (k - 1)) // 2) AS BIGINT) AS observed_pairs,
               CAST(MAX(k) AS BIGINT) AS max_bucket
        FROM buckets
    )
    SELECT n, n_buckets_used, observed_pairs, max_bucket,
           CAST(ROUND(1000000.0 * ((n * (n - 1)) // 2) / 16777216.0)
                AS BIGINT) AS expected_pairs_micro,
           CAST(ROUND((1000000.0 * (observed_pairs * 33554432))
                      / (n * (n - 1))) AS BIGINT) AS ratio_micro
    FROM stats
    """,
)
def q_hash_collision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X333: birthday-bound collision audit of the engine's hash family.

    Bucket every order key by its 24-bit md5 prefix and compare the
    observed colliding-pair count sum(C(k,2)) against the birthday
    expectation C(n,2)/2^24. ratio_micro ~ 1e6 certifies the hash the
    engine's samplers / salted joins / split assignment (X139, X115,
    X4) all lean on is pairwise-uniform at this prefix width; X324
    audits the same generator's rank spacings, this audits its
    bucketing. Exact integer pair counts; the expectation and ratio
    are each one float division.

    100 TB: scan-local hashing, one bucket combine (partial aggs make
    the shuffle |buckets|-bounded), 1-row output.
    """
    o = table(spark, sf_dir, "orders")
    hashed = o.select(
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 6), 16, 10)
        .cast("bigint")
        .alias("bucket")
    )
    buckets = hashed.groupBy("bucket").agg(F.count("*").alias("k"))
    k = F.col("k")
    stats = buckets.agg(
        F.sum(k).cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("n_buckets_used"),
        F.sum(F.expr("(k * (k - 1)) div 2")).cast("bigint").alias("observed_pairs"),
        F.max(k).cast("bigint").alias("max_bucket"),
    )
    n = F.col("n")
    return stats.select(
        "n",
        "n_buckets_used",
        "observed_pairs",
        "max_bucket",
        F.round(
            F.lit(1000000.0) * F.expr("(n * (n - 1)) div 2") / F.lit(16777216.0)
        )
        .cast("bigint")
        .alias("expected_pairs_micro"),
        F.round(
            (F.lit(1000000.0) * (F.col("observed_pairs") * 33554432))
            / (n * (n - 1))
        )
        .cast("bigint")
        .alias("ratio_micro"),
    )
