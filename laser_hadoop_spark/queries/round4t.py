"""Round-4 widening queries, final batch (SURVEY.md §2.12, X199).

The Lorenz curve points behind X90's Gini scalar: cumulative revenue
share per customer decile — the concentration CURVE a dashboard draws
where the Gini compresses it to one number. Deciles via X118's
closed-form ntile over the two-pass rank (no single-partition window
over customers); shares in exact bp from DECIMAL-routed cumulative
sums; the oracle keeps the NTILE + window-SUM spelling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table


@register(
    "q_lorenz_points",
    oracle="""
    WITH cust AS (
        SELECT o_custkey,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev
        FROM orders GROUP BY o_custkey
    ),
    d AS (
        SELECT rev, NTILE(10) OVER (ORDER BY rev, o_custkey) AS decile
        FROM cust
    ),
    per AS (
        SELECT decile, COUNT(*) AS n_cust, SUM(rev) AS rev
        FROM d GROUP BY decile
    ),
    cum AS (
        SELECT decile, n_cust, rev,
               SUM(rev) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED
                              PRECEDING AND CURRENT ROW) AS cum_rev,
               SUM(rev) OVER () AS total
        FROM per
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(n_cust AS BIGINT) AS n_customers,
           CAST(rev AS BIGINT) AS rev_centi,
           CAST(10000 * cum_rev // total AS BIGINT) AS cum_share_bp
    FROM cum
    """,
)
def q_lorenz_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X199: Lorenz curve points (cumulative revenue share by decile).

    The concentration CURVE behind X90's Gini scalar and X82's single
    80/20 crossing: per customer-revenue decile (poorest first), the
    cumulative share of total revenue in exact bp — perfect equality
    is the diagonal (1000, 2000, ...); the bow below it is what the
    dashboard draws. Deciles come from X118's closed-form ntile over
    the two-pass global rank of the per-customer aggregate (the
    oracle keeps NTILE — hash equality re-proves the closed form a
    fourth time); the 10-row cumulative is trivial. One fact
    aggregate, one two-pass rank, one 10-row walk.
    """
    from laser_hadoop_spark.operators.cumulative import (
        closed_form_ntile,
        ordered_cumsum,
    )
    from pyspark.sql.window import Window

    o = table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("rev")
    )
    ranked = ordered_cumsum(
        cust, order_by=["rev", "o_custkey"], row_number_col="rn"
    )
    n_row = cust.agg(F.count("*").alias("n"))
    decile = closed_form_ntile()
    per = (
        ranked.crossJoin(F.broadcast(n_row))
        .select(decile.cast("int").alias("decile"), "rev")
        .groupBy("decile")
        .agg(F.count("*").alias("n_cust"), F.sum("rev").alias("rev"))
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    tw = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = per.select(
        "decile",
        "n_cust",
        "rev",
        F.sum("rev").over(w).alias("cum_rev"),
        F.sum("rev").over(tw).alias("total"),
    )
    return cum.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("n_cust").cast("bigint").alias("n_customers"),
        F.col("rev").cast("bigint").alias("rev_centi"),
        F.expr(
            "CAST(10000 * CAST(cum_rev AS DECIMAL(38,0)) div total"
            " AS BIGINT)"
        ).alias("cum_share_bp"),
    )
