"""Round-4 widening queries, tenth batch (SURVEY.md §2.12, X166).

One query: the multi-quantile histogram-prune operator driven end to
end — five percentile_disc points over the full fact table with two
scans and zero fact shuffles, against the definitional rank-arithmetic
oracle (so the hash match proves the pruning lossless at every
fraction simultaneously).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table

_FRACTIONS = [(1, 4), (1, 2), (3, 4), (9, 10), (99, 100)]


@register(
    "q_quantiles_pruned",
    oracle="""
    WITH v AS (
        SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS centi
        FROM orders
    ),
    r AS (
        SELECT centi, ROW_NUMBER() OVER (ORDER BY centi) AS rn,
               COUNT(*) OVER () AS n
        FROM v
    ),
    q AS (
        SELECT 1 AS num, 4 AS den UNION ALL
        SELECT 1, 2 UNION ALL
        SELECT 3, 4 UNION ALL
        SELECT 9, 10 UNION ALL
        SELECT 99, 100
    )
    SELECT CAST(q.num AS BIGINT) AS q_num, CAST(q.den AS BIGINT) AS q_den,
           CAST(MIN(r.centi) AS BIGINT) AS quantile_value,
           CAST(MIN(r.n) AS BIGINT) AS total_weight
    FROM r JOIN q ON q.den * r.rn >= q.num * r.n
    GROUP BY q.num, q.den
    """,
)
def q_quantiles_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X166: five percentile_disc points, two scans, no fact shuffle.

    p25/p50/p75/p90/p99 of the order value via
    operators/cumulative.ordered_quantiles — ONE fixed-width weight
    histogram (map-side partial aggregation), one cumulative walk over
    the tiny histogram to find each fraction's crossing bucket, one
    pruned re-scan covering the UNION of crossing buckets. The oracle
    is the definitional global-rank spelling (ROW_NUMBER over every
    row — exactly the single-partition plan the operator exists to
    avoid), so hash equality proves the pruning lossless at all five
    fractions at once. k quantiles cost 2 scans, not 2k and not one
    full-table sort: at 100 TB this replaces the classic
    sort-everything percentile job with two column-pruned passes.
    """
    from laser_hadoop_spark.operators.cumulative import ordered_quantiles

    o = table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("centi")
    )
    return ordered_quantiles(
        o, value_col="centi", quantiles=_FRACTIONS
    ).select(
        F.col("q_num").cast("bigint").alias("q_num"),
        F.col("q_den").cast("bigint").alias("q_den"),
        F.col("quantile_value").cast("bigint").alias("quantile_value"),
        F.col("total_weight").cast("bigint").alias("total_weight"),
    )
