"""Round-5 widening queries, seventh batch (SURVEY.md §2.13, X233-X237).

- X233 Gini feature ranking: X70's split-impurity generalized to a
  multi-feature ranking table — the feature-selection pass before any
  tree model, exact rational arithmetic.
- X234 position-based (U-shaped) attribution: the 40/20/40 credit
  model completing X65's first/last-touch pair, exact-by-remainder
  integer credit allocation.
- X235 difference-in-differences: the pre/post x treat/control causal
  estimate in exact micro means — the quasi-experimental member of the
  X77/X182/X227 family.
- X236 functional-dependency miner: candidate A->B dependencies scored
  by violating-group counts — Metanome-style profiling for schema
  discovery.
- X237 percentile quarantine: per-month p99 order-statistic threshold
  + flag census — the distribution-relative DQ gate (X55 gates on
  absolute rules; this one adapts to each partition's own scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# --- X233: Gini feature ranking --------------------------------------------


@register(
    "q_gini_features",
    oracle="""
    WITH feats AS (
        SELECT 'priority_class' AS feature,
               substring(o_orderpriority, 1, 1) AS val,
               o_orderstatus AS label
        FROM orders
        UNION ALL
        SELECT 'order_dow', CAST(dayofweek(CAST(o_orderdate AS DATE))
                                 AS VARCHAR), o_orderstatus
        FROM orders
        UNION ALL
        SELECT 'cust_cohort', CAST(o_custkey % 10 AS VARCHAR), o_orderstatus
        FROM orders
    ),
    cells AS (
        SELECT feature, val, label, COUNT(*) AS nvc
        FROM feats GROUP BY 1, 2, 3
    ),
    vals AS (
        SELECT feature, val, CAST(SUM(nvc) AS BIGINT) AS nv,
               CAST(SUM(nvc * nvc) AS BIGINT) AS sq
        FROM cells GROUP BY 1, 2
    ),
    tot AS (SELECT feature, CAST(SUM(nv) AS BIGINT) AS n FROM vals GROUP BY 1)
    SELECT v.feature,
           COUNT(*) AS n_values,
           CAST(SUM((v.nv * v.nv - v.sq) * 1000000 // (v.nv * t.n))
                AS BIGINT) AS gini_micro
    FROM vals v JOIN tot t ON t.feature = v.feature
    GROUP BY v.feature
    """,
)
def q_gini_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X233: weighted-Gini feature ranking, exact rationals.

    X70 found the best split point of ONE feature; this ranks
    CANDIDATE FEATURES by the weighted Gini impurity of the partition
    they induce on the label (order status): G_f = sum_v (n_v/N)(1 -
    sum_c (n_vc/n_v)^2), evaluated per value as the exact integer
    (n_v^2 - sum n_vc^2) * 1e6 DIV (n_v * N) and summed — no float
    share ever exists, so the ranking is hash-stable. Lower = purer =
    better feature. The feature-selection pass before any tree model.

    100 TB: one stacked scan (3 features, same shape as X228's
    advisor), one (feature, value, label) aggregate with map-side
    combine, rollups over dimension-sized relations.
    """
    o = table(spark, sf_dir, "orders")
    feats = o.selectExpr(
        "stack(3, "
        "'priority_class', substring(o_orderpriority, 1, 1), "
        "'order_dow', CAST(dayofweek(CAST(o_orderdate AS DATE)) AS STRING), "
        "'cust_cohort', CAST(o_custkey % 10 AS STRING)) AS (feature, val)",
        "o_orderstatus AS label",
    )
    cells = feats.groupBy("feature", "val", "label").agg(
        F.count("*").alias("nvc")
    )
    vals = cells.groupBy("feature", "val").agg(
        F.sum("nvc").cast("bigint").alias("nv"),
        F.sum(F.col("nvc") * F.col("nvc")).cast("bigint").alias("sq"),
    )
    tot = vals.groupBy("feature").agg(F.sum("nv").cast("bigint").alias("n"))
    return (
        vals.join(F.broadcast(tot), "feature")
        .groupBy("feature")
        .agg(
            F.count("*").alias("n_values"),
            F.sum(F.expr("(nv * nv - sq) * 1000000 DIV (nv * n)"))
            .cast("bigint")
            .alias("gini_micro"),
        )
    )


# --- X234: position-based (U-shaped) attribution ---------------------------


@register(
    "q_position_attribution",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type, value, epoch_us(ts) AS em, event_id,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS pidx
        FROM events
    ),
    purchases AS (
        SELECT user_id, pidx,
               CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS v
        FROM seq WHERE event_type = 'purchase'
    ),
    touches AS (
        SELECT user_id, pidx + 1 AS pidx, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id, pidx
                                  ORDER BY em, event_id) AS rn_asc,
               ROW_NUMBER() OVER (PARTITION BY user_id, pidx
                                  ORDER BY em DESC, event_id DESC) AS rn_desc,
               COUNT(*) OVER (PARTITION BY user_id, pidx) AS n
        FROM seq WHERE event_type IN ('view', 'click')
    ),
    credited AS (
        SELECT t.event_type,
               CASE WHEN t.rn_asc = 1 THEN
                        p.v * 4 // 10
                        + (p.v
                           - p.v * 4 // 10
                           - CASE WHEN t.n >= 2 THEN p.v * 4 // 10 ELSE 0 END
                           - CASE WHEN t.n > 2
                                  THEN (p.v * 2 // 10 // (t.n - 2)) * (t.n - 2)
                                  ELSE 0 END)
                    WHEN t.rn_desc = 1 THEN p.v * 4 // 10
                    ELSE p.v * 2 // 10 // (t.n - 2) END AS credit
        FROM touches t
        JOIN purchases p ON p.user_id = t.user_id AND p.pidx = t.pidx
    )
    SELECT event_type AS touch, COUNT(*) AS n_touches,
           CAST(SUM(credit) AS BIGINT) AS credit_micro
    FROM credited GROUP BY 1
    """,
)
def q_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X234: position-based (U-shaped, 40/20/40) attribution, exact.

    Completes X65's first/last pair with the third standard model:
    each purchase's value credits its preceding touch sequence (the
    touches since the prior purchase) 40% to the first touch, 40% to
    the last, 20% split over the middles. Integer exactness by
    construction: middles get the truncating per-touch share, the
    last gets its truncated 40%, and the FIRST absorbs every rounding
    remainder — per purchase the credits sum to the purchase value to
    the micro. A 1-touch path gets 100%, a 2-touch path 60/40.

    100 TB: one shuffle on user_id serves the purchase-index
    cumulative window, both touch rank windows, and the
    purchase-touch equi-join; credit math is pure codegen.
    """
    e = table(spark, sf_dir, "events")
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seq = e.select(
        "user_id",
        "event_type",
        "value",
        F.unix_micros("ts").alias("em"),
        "event_id",
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .over(w_cum)
        .alias("pidx"),
    )
    purchases = seq.where(F.col("event_type") == "purchase").select(
        "user_id",
        "pidx",
        F.expr("CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)").alias("v"),
    )
    wt = Window.partitionBy("user_id", "pidx")
    touches = seq.where(F.col("event_type").isin("view", "click")).select(
        "user_id",
        (F.col("pidx") + 1).alias("pidx"),
        "event_type",
        F.row_number().over(wt.orderBy("em", "event_id")).alias("rn_asc"),
        F.row_number()
        .over(wt.orderBy(F.desc("em"), F.desc("event_id")))
        .alias("rn_desc"),
        F.count("*").over(wt).alias("n"),
    )
    credit = F.expr(
        "CASE WHEN rn_asc = 1 THEN "
        "         v * 4 DIV 10 "
        "         + (v - v * 4 DIV 10 "
        "            - CASE WHEN n >= 2 THEN v * 4 DIV 10 ELSE 0 END "
        "            - CASE WHEN n > 2 "
        "                   THEN (v * 2 DIV 10 DIV (n - 2)) * (n - 2) "
        "                   ELSE 0 END) "
        "     WHEN rn_desc = 1 THEN v * 4 DIV 10 "
        "     ELSE v * 2 DIV 10 DIV (n - 2) END"
    )
    credited = touches.join(purchases, ["user_id", "pidx"]).select(
        "event_type", credit.alias("credit")
    )
    return credited.groupBy(F.col("event_type").alias("touch")).agg(
        F.count("*").alias("n_touches"),
        F.sum("credit").cast("bigint").alias("credit_micro"),
    )


# --- X235: difference-in-differences ---------------------------------------

_DID_CUT = "1998-01-01"


@register(
    "q_diff_in_diff",
    oracle=f"""
    WITH cells AS (
        SELECT ('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 6))::BIGINT
                   % 2 AS treat,
               CASE WHEN CAST(o_orderdate AS DATE) >= DATE '{_DID_CUT}'
                    THEN 1 ELSE 0 END AS post,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
    ),
    means AS (
        SELECT treat, post,
               CAST(SUM(cents) * 1000000 // COUNT(*) AS BIGINT) AS mean_micro
        FROM cells GROUP BY 1, 2
    )
    SELECT CAST(c0.mean_micro AS BIGINT) AS control_pre,
           CAST(c1.mean_micro AS BIGINT) AS control_post,
           CAST(t0.mean_micro AS BIGINT) AS treat_pre,
           CAST(t1.mean_micro AS BIGINT) AS treat_post,
           CAST((t1.mean_micro - t0.mean_micro)
                - (c1.mean_micro - c0.mean_micro) AS BIGINT) AS did_micro
    FROM means c0, means c1, means t0, means t1
    WHERE c0.treat = 0 AND c0.post = 0 AND c1.treat = 0 AND c1.post = 1
      AND t0.treat = 1 AND t0.post = 0 AND t1.treat = 1 AND t1.post = 1
    """,
)
def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X235: difference-in-differences, exact micro means.

    The quasi-experimental member of the experimentation family (X77
    mean test, X182 CUPED, X227 QTE): md5-parity "treatment" customers
    vs control, pre/post a policy date; DiD = (treat_post - treat_pre)
    - (control_post - control_pre) on micro-fixed-point cell means
    (sum*1e6 DIV n — the division happens ONCE per cell, after the
    exact integer sums, so no float accumulation order exists).

    100 TB: one conditional aggregate to 4 cells; the "pivot" is a
    4-way self-join of a 4-row relation.
    """
    o = table(spark, sf_dir, "orders")
    cells = o.select(
        F.expr(
            "CAST(conv(substring(md5(CAST(o_custkey AS STRING)), 1, 6), "
            "16, 10) AS BIGINT) % 2"
        ).alias("treat"),
        F.when(
            F.col("o_orderdate").cast("date") >= F.lit(_DID_CUT), 1
        )
        .otherwise(0)
        .alias("post"),
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
    )
    means = cells.groupBy("treat", "post").agg(
        F.expr("SUM(cents) * 1000000 DIV COUNT(*)")
        .cast("bigint")
        .alias("mean_micro")
    )
    pick = lambda t, p, name: (  # noqa: E731
        means.where((F.col("treat") == t) & (F.col("post") == p)).select(
            F.col("mean_micro").alias(name)
        )
    )
    out = (
        pick(0, 0, "control_pre")
        .crossJoin(pick(0, 1, "control_post"))
        .crossJoin(pick(1, 0, "treat_pre"))
        .crossJoin(pick(1, 1, "treat_post"))
    )
    return out.select(
        "control_pre",
        "control_post",
        "treat_pre",
        "treat_post",
        (
            (F.col("treat_post") - F.col("treat_pre"))
            - (F.col("control_post") - F.col("control_pre"))
        )
        .cast("bigint")
        .alias("did_micro"),
    )


# --- X236: functional-dependency miner -------------------------------------

_FD_PAIRS = (
    ("customer", "c_nationkey", "c_mktsegment"),
    ("customer", "c_mktsegment", "c_nationkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("orders", "o_orderpriority", "o_orderstatus"),
    ("lineitem", "l_partkey", "l_suppkey"),
)


def _fd_oracle() -> str:
    parts = []
    for tbl, lhs, rhs in _FD_PAIRS:
        parts.append(
            f"""
    SELECT '{tbl}.{lhs} -> {rhs}' AS fd,
           COUNT(*) AS n_groups,
           CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating,
           CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) * 10000 // COUNT(*)
                AS BIGINT) AS violation_bp
    FROM (
        SELECT {lhs} AS a, COUNT(DISTINCT {rhs}) AS nd
        FROM {tbl} GROUP BY 1
    )"""
        )
    return "\n    UNION ALL".join(parts)


@register("q_fd_miner", oracle=_fd_oracle())
def q_fd_miner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X236: functional-dependency miner (profiling for schema
    discovery).

    Scores candidate A -> B dependencies by the number of A-groups
    holding more than one distinct B — a dependency HOLDS iff zero
    violate (Metanome/TANE-style exact validation, restricted to
    declared candidate pairs the way a profiler seeds from column
    types). Reports group counts and the violation rate in bp: the
    schema-discovery signal that tells you which "id-like" columns are
    really keys and which relationships are 1:N in disguise.

    100 TB: per pair, one (A, B) distinct-combine + one A-keyed
    aggregate — map-side combine makes the shuffle carry distinct
    pairs, not rows; pairs evaluate independently (union of branches).
    """
    dfs = []
    for tbl, lhs, rhs in _FD_PAIRS:
        t = table(spark, sf_dir, tbl)
        grouped = t.groupBy(F.col(lhs).alias("a")).agg(
            F.countDistinct(rhs).alias("nd")
        )
        viol = F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
        dfs.append(
            grouped.agg(
                F.count("*").alias("n_groups"),
                viol.cast("bigint").alias("n_violating"),
                F.expr(
                    "SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) * 10000 "
                    "DIV COUNT(*)"
                )
                .cast("bigint")
                .alias("violation_bp"),
            ).select(
                F.lit(f"{tbl}.{lhs} -> {rhs}").alias("fd"),
                "n_groups",
                "n_violating",
                "violation_bp",
            )
        )
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out


# --- X237: percentile quarantine (distribution-relative DQ gate) -----------


@register(
    "q_percentile_quarantine",
    oracle="""
    WITH v AS (
        SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS centi
        FROM orders
    ),
    ranked AS (
        SELECT month, centi,
               ROW_NUMBER() OVER (PARTITION BY month ORDER BY centi) AS rn,
               COUNT(*) OVER (PARTITION BY month) AS n
        FROM v
    ),
    thresholds AS (
        SELECT month, MIN(centi) AS p99_centi
        FROM ranked WHERE 100 * rn >= 99 * n
        GROUP BY month
    )
    SELECT CAST(v.month AS DATE) AS month,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN v.centi > t.p99_centi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flagged,
           CAST(MIN(t.p99_centi) AS BIGINT) AS p99_centi
    FROM v JOIN thresholds t ON t.month = v.month
    GROUP BY 1
    """,
)
def q_percentile_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X237: percentile quarantine — the distribution-relative DQ gate.

    X55's expectation suite gates on ABSOLUTE rules; this gate adapts
    to each partition's own scale: per calendar month, the p99 order
    statistic of order value (exact: smallest v with 100*rank >=
    99*n), and a census of how many orders exceed it — the rows a
    quarantine sink would divert for review. Order statistics via
    rank, never a float percentile.

    100 TB: one shuffle on the month key serves the rank window, the
    per-month count, and the census; the threshold relation
    (<= n_months rows) broadcasts back onto the same partitioning.
    """
    o = table(spark, sf_dir, "orders")
    v = o.select(
        F.date_trunc("month", F.col("o_orderdate").cast("date"))
        .cast("date")
        .alias("month"),
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
            "centi"
        ),
    )
    wm = Window.partitionBy("month")
    ranked = v.select(
        "month",
        "centi",
        F.row_number().over(wm.orderBy("centi")).alias("rn"),
        F.count("*").over(wm).alias("n"),
    )
    thresholds = (
        ranked.where(100 * F.col("rn") >= 99 * F.col("n"))
        .groupBy("month")
        .agg(F.min("centi").alias("p99_centi"))
    )
    return (
        v.join(F.broadcast(thresholds), "month")
        .groupBy("month")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(
                F.when(F.col("centi") > F.col("p99_centi"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_flagged"),
            F.min("p99_centi").cast("bigint").alias("p99_centi"),
        )
    )
