"""Round-5 widening queries, eleventh batch (SURVEY.md §2.13, X253-X257).

Corpus growth law, inventory ops, uplift evaluation, circular time
statistics, and experiment plumbing:

- X253 Heaps'-law vocabulary growth fit: the V = K*n^beta exponent
  from two corpus prefixes — the vocab-sizing model behind X176's
  empirical curve, micro-ln fixed point.
- X254 inventory turns / days-of-supply: demand vs stock ratios per
  brand in exact milli/days — the replenishment dashboard.
- X255 Qini uplift deciles: treatment-vs-control conversion gain by
  score decile through closed_form_ntile — the uplift-model
  evaluation curve next to ROC (X150) and calibration (X154).
- X256 circular peak-hour statistics: mean direction + resultant
  length of event times on the 24h circle — the statistically sound
  form of 'peak hour' (a plain argmax ignores wraparound; 23h and 1h
  average to midnight, not noon), micro-rounded trig.
- X257 sample-ratio-mismatch detector: per-salt arm-size chi-squared
  against 50/50 — the assignment-plumbing gate run before ANY
  experiment metric is trusted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

# --- X253: Heaps'-law vocabulary growth fit ---------------------------------


@register(
    "q_heaps_fit",
    oracle="""
    WITH half AS (SELECT MAX(doc_id) // 2 AS mid FROM documents),
    toks AS (
        SELECT d.doc_id, UNNEST(string_split(d.text, ' ')) AS tok
        FROM documents d
    ),
    p1 AS (
        SELECT COUNT(*) AS n1, COUNT(DISTINCT t.tok) AS v1
        FROM toks t CROSS JOIN half h WHERE t.doc_id <= h.mid
    ),
    p2 AS (SELECT COUNT(*) AS n2, COUNT(DISTINCT tok) AS v2 FROM toks)
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(v1 AS BIGINT) AS v1,
           CAST(n2 AS BIGINT) AS n2, CAST(v2 AS BIGINT) AS v2,
           CAST(1000 * (CAST(ROUND(LN(CAST(v2 AS DOUBLE)) * 1000000)
                             AS BIGINT)
                        - CAST(ROUND(LN(CAST(v1 AS DOUBLE)) * 1000000)
                               AS BIGINT))
                // (CAST(ROUND(LN(CAST(n2 AS DOUBLE)) * 1000000) AS BIGINT)
                    - CAST(ROUND(LN(CAST(n1 AS DOUBLE)) * 1000000)
                           AS BIGINT)) AS BIGINT) AS beta_milli
    FROM p1 CROSS JOIN p2
    """,
)
def q_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X253: Heaps'-law exponent from two corpus prefixes.

    V(n) = K * n^beta relates vocabulary size to corpus token count;
    beta (typically 0.4-0.6 for natural text) predicts how the
    type inventory grows with the corpus — the model behind sizing a
    tokenizer vocab for a 100 TB crawl from a 1 TB sample (X176
    measures the curve at fixed k; this fits its growth law).
    Two-point fit in fixed point: beta = (ln V2 - ln V1) /
    (ln n2 - ln n1) with every ln micro-rounded BEFORE the single
    integer division (X197 discipline) — cross-engine exact.

    100 TB shape: two prefix (token, distinct-type) aggregates over
    one tokenized scan — the prefix filter is a doc_id predicate, so
    both pass map-side; the fit arithmetic is 1-row.
    """
    d = table(spark, sf_dir, "documents")
    half = d.agg(F.expr("MAX(doc_id) DIV 2").alias("mid"))
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    p1 = (
        toks.crossJoin(F.broadcast(half))
        .where(F.col("doc_id") <= F.col("mid"))
        .agg(
            F.count("*").alias("n1"),
            F.countDistinct("tok").alias("v1"),
        )
    )
    p2 = toks.agg(
        F.count("*").alias("n2"), F.countDistinct("tok").alias("v2")
    )
    lnm = (
        lambda c: f"CAST(ROUND(LN(CAST({c} AS DOUBLE)) * 1000000) AS BIGINT)"
    )
    return p1.crossJoin(F.broadcast(p2)).select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("v1").cast("bigint").alias("v1"),
        F.col("n2").cast("bigint").alias("n2"),
        F.col("v2").cast("bigint").alias("v2"),
        F.expr(
            f"CAST(1000 * ({lnm('v2')} - {lnm('v1')})"
            f" DIV ({lnm('n2')} - {lnm('n1')}) AS BIGINT)"
        ).alias("beta_milli"),
    )


# --- X254: inventory turns / days-of-supply ---------------------------------


def _inventory_oracle() -> str:
    from laser_hadoop_spark.queries.tpch import _PARTSUPP_SQL

    return (
        "WITH "
        + _PARTSUPP_SQL
        + """
    , demand AS (
        SELECT p.p_brand AS brand,
               SUM(CAST(l.l_quantity AS BIGINT)) AS annual_qty
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand
    ),
    stock AS (
        SELECT p.p_brand AS brand, SUM(s.ps_availqty) AS on_hand
        FROM partsupp s JOIN part p ON p.p_partkey = s.ps_partkey
        GROUP BY p.p_brand
    )
    SELECT d.brand,
           CAST(d.annual_qty AS BIGINT) AS annual_demand_qty,
           CAST(s.on_hand AS BIGINT) AS on_hand_qty,
           CAST(1000 * d.annual_qty // s.on_hand AS BIGINT) AS turns_milli,
           CAST(365 * s.on_hand // d.annual_qty AS BIGINT) AS days_of_supply
    FROM demand d JOIN stock s ON s.brand = d.brand
    """
    )


@register("q_inventory_turns", oracle=_inventory_oracle())
def q_inventory_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X254: inventory turns and days-of-supply per brand.

    turns = annual demand / on-hand stock (milli), days-of-supply =
    365 * stock / demand — the two replenishment dashboard numbers,
    exact truncating integer ratios. Low turns + high days = capital
    tied up; the retail-ops sibling of X95's ABC classification
    (which ranks by revenue; this measures velocity).

    100 TB shape: two independent brand-grain aggregates (lineitem
    through the broadcast part dim; the X46 deterministic derived
    partsupp likewise) joined on the tiny brand key — the fact
    shuffle carries |brands| rows after map-side combine.
    """
    from laser_hadoop_spark.queries.tpch import derived_partsupp

    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    ps = derived_partsupp(spark, sf_dir).select("ps_partkey", "ps_availqty")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    demand = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("annual_qty"))
    )
    stock = (
        ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.sum("ps_availqty").alias("on_hand"))
    )
    return demand.join(stock, "brand").select(
        "brand",
        F.col("annual_qty").cast("bigint").alias("annual_demand_qty"),
        F.col("on_hand").cast("bigint").alias("on_hand_qty"),
        F.expr("CAST(1000 * annual_qty DIV on_hand AS BIGINT)").alias(
            "turns_milli"
        ),
        F.expr("CAST(365 * on_hand DIV annual_qty AS BIGINT)").alias(
            "days_of_supply"
        ),
    )


# --- X255: Qini uplift deciles ----------------------------------------------


@register(
    "q_qini_deciles",
    oracle="""
    WITH scored AS (
        SELECT c.c_custkey AS ck,
               CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT) AS score,
               ('0x' || substring(md5(CAST(c.c_custkey AS VARCHAR)), 1, 6))
                   ::BIGINT % 2 AS arm,
               CASE WHEN EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_custkey = c.c_custkey
                                   AND o.o_totalprice > 200000)
                    THEN 1 ELSE 0 END AS conv
        FROM customer c
    ),
    ranked AS (
        SELECT arm, conv,
               NTILE(10) OVER (ORDER BY score DESC, ck) AS decile
        FROM scored
    ),
    cells AS (
        SELECT decile,
               SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS nt,
               SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS nc,
               SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS ct,
               SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS cc
        FROM ranked GROUP BY decile
    ),
    cum AS (
        SELECT decile, nt, nc, ct, cc,
               SUM(nt) OVER w AS cnt, SUM(nc) OVER w AS cnc,
               SUM(ct) OVER w AS cct, SUM(cc) OVER w AS ccc
        FROM cells
        WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(nt AS BIGINT) AS n_treat, CAST(nc AS BIGINT) AS n_control,
           CAST(ct AS BIGINT) AS conv_treat,
           CAST(cc AS BIGINT) AS conv_control,
           CAST(CASE WHEN cnc = 0 THEN 0
                ELSE 10000 * (cct * cnc - ccc * cnt) // (cnt * cnc) END
                AS BIGINT) AS qini_bp
    FROM cum
    """,
)
def q_qini_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X255: Qini uplift curve by score decile, exactly verified.

    Uplift evaluation for a targeting model: customers ranked by
    score (account balance as the propensity proxy), md5-parity
    treatment arms, conversion = any order > $200k. Per cumulative
    decile, Qini = conv_treat - conv_control * Nt/Nc kept as ONE
    exact rational in bp: 10000*(cct*cnc - ccc*cnt) DIV (cnt*cnc) —
    the incremental-conversions curve whose area ranks uplift models
    (the causal sibling of X150's ROC: ROC scores prediction, Qini
    scores INTERVENTION value). Deciles come from the global row
    number + closed_form_ntile — no single-partition window.

    100 TB shape: conversion is a semi-join aggregate on the customer
    shuffle; ranking uses ordered_cumsum's two-pass row number; the
    decile/cumulative arithmetic runs on a 10-row relation.
    """
    from laser_hadoop_spark.operators.cumulative import (
        closed_form_ntile,
        ordered_cumsum,
    )

    c = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    conv_keys = (
        o.where(F.col("o_totalprice") > 200000)
        .select(F.col("o_custkey").alias("ck"))
        .distinct()
    )
    scored = (
        c.select(
            F.col("c_custkey").alias("ck"),
            F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("score"),
            F.expr(
                "CAST(conv(substring(md5(CAST(c_custkey AS STRING)), 1, 6),"
                " 16, 10) AS BIGINT) % 2"
            ).alias("arm"),
        )
        .join(
            conv_keys.withColumn("conv", F.lit(1)), "ck", "left"
        )
        .select(
            "arm",
            "score",
            "ck",
            F.coalesce(F.col("conv"), F.lit(0)).alias("conv"),
        )
    )
    # global rank without a single-partition window: negate score for
    # DESC order (ordered_cumsum sorts ascending), ck tiebreak
    ranked = ordered_cumsum(
        scored.withColumn("negscore", -F.col("score")),
        order_by=["negscore", "ck"],
        row_number_col="rn",
    )
    n_tot = scored.agg(F.count("*").alias("n"))
    with_decile = ranked.crossJoin(F.broadcast(n_tot)).withColumn(
        "decile", closed_form_ntile("rn", "n", 10)
    )
    cells = with_decile.groupBy("decile").agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("nt"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("nc"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0)).alias(
            "ct"
        ),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0)).alias(
            "cc"
        ),
    )
    cum = ordered_cumsum(
        cells,
        order_by=["decile"],
        values={"nt": "cnt", "nc": "cnc", "ct": "cct", "cc": "ccc"},
    )
    return cum.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("nt").cast("bigint").alias("n_treat"),
        F.col("nc").cast("bigint").alias("n_control"),
        F.col("ct").cast("bigint").alias("conv_treat"),
        F.col("cc").cast("bigint").alias("conv_control"),
        F.when(F.col("cnc") == 0, F.lit(0))
        .otherwise(
            F.expr(
                "10000 * (cct * cnc - ccc * cnt) DIV (cnt * cnc)"
            )
        )
        .cast("bigint")
        .alias("qini_bp"),
    )


# --- X256: circular peak-hour statistics ------------------------------------


@register(
    "q_circular_hours",
    oracle="""
    WITH hrs AS (
        SELECT event_type,
               CAST((epoch_us(ts) % 86400000000) // 3600000000 AS BIGINT)
                   AS hr
        FROM events
    ),
    cells AS (
        SELECT event_type, hr, COUNT(*) AS n FROM hrs GROUP BY event_type, hr
    ),
    vec AS (
        SELECT event_type,
               SUM(n) AS n,
               SUM(n * CAST(ROUND(COS(2 * PI() * hr / 24) * 1000000)
                            AS BIGINT)) AS sc,
               SUM(n * CAST(ROUND(SIN(2 * PI() * hr / 24) * 1000000)
                            AS BIGINT)) AS ss
        FROM cells GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(sc // n AS BIGINT) AS mean_cos_micro,
           CAST(ss // n AS BIGINT) AS mean_sin_micro,
           CAST(CAST(FLOOR(SQRT(CAST((sc // n) * (sc // n)
                                     + (ss // n) * (ss // n) AS DOUBLE)))
                     AS BIGINT) // 100 AS BIGINT) AS resultant_bp
    FROM vec
    """,
)
def q_circular_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X256: circular statistics of event hour-of-day per type.

    'Peak hour' done right: event times live on a 24h circle, so the
    mean direction is the vector mean of unit vectors at each hour
    angle — 23:00 and 01:00 average to midnight, where a linear mean
    says noon. The resultant length R in [0,1] measures concentration
    (10000 bp = all events at one hour, ~0 = uniform). The 24
    cos/sin values micro-round once each (the trig analogue of the
    X197 ln discipline); hour comes from epoch-microsecond MODULAR
    arithmetic — session-TZ-proof like X201. The statistically sound
    companion to X201's weekday x hour heatmap.

    100 TB shape: one (type, hour) aggregate — at most 24 cells per
    type after map-side combine; the vector arithmetic runs on
    |types| rows.
    """
    e = table(spark, sf_dir, "events")
    hrs = e.select(
        "event_type",
        F.expr(
            "CAST((unix_micros(ts) % 86400000000) DIV 3600000000 AS BIGINT)"
        ).alias("hr"),
    )
    cells = hrs.groupBy("event_type", "hr").agg(F.count("*").alias("n"))
    vec = cells.groupBy("event_type").agg(
        F.sum("n").alias("n"),
        F.sum(
            F.col("n")
            * F.expr(
                "CAST(ROUND(COS(2 * PI() * hr / 24) * 1000000) AS BIGINT)"
            )
        ).alias("sc"),
        F.sum(
            F.col("n")
            * F.expr(
                "CAST(ROUND(SIN(2 * PI() * hr / 24) * 1000000) AS BIGINT)"
            )
        ).alias("ss"),
    )
    return vec.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.expr("CAST(sc DIV n AS BIGINT)").alias("mean_cos_micro"),
        F.expr("CAST(ss DIV n AS BIGINT)").alias("mean_sin_micro"),
        F.expr(
            "CAST(CAST(FLOOR(SQRT(CAST((sc DIV n) * (sc DIV n)"
            " + (ss DIV n) * (ss DIV n) AS DOUBLE))) AS BIGINT)"
            " DIV 100 AS BIGINT)"
        ).alias("resultant_bp"),
    )


# --- X257: sample-ratio-mismatch detector -----------------------------------

_SRM_SALTS = ["exp_a", "exp_b", "exp_c"]


@register(
    "q_srm_detector",
    oracle=f"""
    WITH assigns AS (
        {" UNION ALL ".join(
            f"SELECT '{s}' AS salt,"
            f" ('0x' || substring(md5('{s}|' || CAST(c_custkey AS VARCHAR)),"
            f" 1, 6))::BIGINT % 2 AS arm FROM customer"
            for s in _SRM_SALTS
        )}
    ),
    counts AS (
        SELECT salt,
               SUM(arm) AS n1, SUM(1 - arm) AS n0
        FROM assigns GROUP BY salt
    )
    SELECT salt, CAST(n1 AS BIGINT) AS n_arm1, CAST(n0 AS BIGINT) AS n_arm0,
           CAST(1000000 * (n1 - n0) * (n1 - n0) // (n1 + n0) AS BIGINT)
               AS chi2_micro,
           CAST(CASE WHEN 1000000 * (n1 - n0) * (n1 - n0) // (n1 + n0)
                          > 10828000 THEN 1 ELSE 0 END AS BIGINT)
               AS srm_flag
    FROM counts
    """,
)
def q_srm_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X257: sample-ratio-mismatch detector across assignment salts.

    The first gate of every A/B readout: does the md5 assignment
    actually split 50/50? Per salt, the 1-df goodness-of-fit
    chi-squared (n1-n0)^2/(n1+n0) in exact micro; srm_flag fires
    above 10.828 (the p<0.001 critical value — the industry SRM
    threshold), meaning the assignment plumbing is broken and every
    downstream metric (X77/X182/X235/X255) is suspect. Three salts
    demonstrate the per-experiment check pattern.

    100 TB shape: one stacked conditional aggregate per salt over the
    customer scan (map-side combine to |salts| rows); no joins.
    """
    c = table(spark, sf_dir, "customer").select("c_custkey")
    parts = []
    for s in _SRM_SALTS:
        parts.append(
            c.select(
                F.lit(s).alias("salt"),
                F.expr(
                    f"CAST(conv(substring(md5('{s}|' ||"
                    f" CAST(c_custkey AS STRING)), 1, 6), 16, 10)"
                    f" AS BIGINT) % 2"
                ).alias("arm"),
            )
        )
    assigns = parts[0]
    for p in parts[1:]:
        assigns = assigns.unionAll(p)
    counts = assigns.groupBy("salt").agg(
        F.sum("arm").alias("n1"), F.sum(1 - F.col("arm")).alias("n0")
    )
    chi2 = "1000000 * (n1 - n0) * (n1 - n0) DIV (n1 + n0)"
    return counts.select(
        "salt",
        F.col("n1").cast("bigint").alias("n_arm1"),
        F.col("n0").cast("bigint").alias("n_arm0"),
        F.expr(f"CAST({chi2} AS BIGINT)").alias("chi2_micro"),
        F.expr(
            f"CAST(CASE WHEN {chi2} > 10828000 THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("srm_flag"),
    )
