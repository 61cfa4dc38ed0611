"""UDF-surface queries (SURVEY.md §2.10): the Python slow path, done right.

The reference's core pattern is grouped black-box compute — an opaque
per-chunk analysis scheduled via job descriptors
(LASERInputValidator.java:158-182, TRACEJobGenerator.java:44-93). Here
that becomes applyInPandas / Arrow-vectorized pandas UDFs: Python only
ever sees Arrow record batches, never single rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table


@register(
    "q_grouped_map_normalize",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND((l_extendedprice - AVG(l_extendedprice) OVER (PARTITION BY l_returnflag))
                 / STDDEV_SAMP(l_extendedprice) OVER (PARTITION BY l_returnflag),
                 4) AS z_price
    FROM lineitem
    """,
)
def q_grouped_map_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: grouped black-box compute via applyInPandas (per-group z-score).

    Deterministic stand-in for the reference's per-chunk PCA jobs: each
    group becomes one Arrow batch handed to a Python function. The
    oracle recomputes the same normalization with SQL window functions.
    """
    li = table(spark, sf_dir, "lineitem")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["l_extendedprice"]
        z = (x - x.mean()) / x.std(ddof=1)
        return pd.DataFrame(
            {
                "l_orderkey": pdf["l_orderkey"],
                "l_linenumber": pdf["l_linenumber"],
                "z_price": z.round(4),
            }
        )

    return (
        li.select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
        .groupBy("l_returnflag")
        .applyInPandas(zscore, "l_orderkey long, l_linenumber int, z_price double")
    )


@register(
    "q_scalar_udf",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(LN(1 + l_extendedprice), 4) AS log_price
    FROM lineitem
    """,
)
def q_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: Arrow-vectorized scalar pandas UDF (Series -> Series).

    ~10-100x faster than row-at-a-time Python UDFs; still slower than
    the builtin F.log1p — UDFs are for logic builtins can't express.
    """

    @pandas_udf("double")
    def log1p_round(x: pd.Series) -> pd.Series:
        return pd.Series(np.round(np.log1p(x.to_numpy()), 4))

    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        log1p_round("l_extendedprice").alias("log_price"),
    )


@register(
    "q_grouped_agg_udf",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4)
               AS weighted_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: grouped-aggregate pandas UDF (custom UDAF): weighted mean."""

    @pandas_udf("double")
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:
        return float(np.round(np.sum(price.to_numpy() * qty.to_numpy()) / np.sum(qty.to_numpy()), 4))

    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        weighted_avg("l_extendedprice", "l_quantity").alias("weighted_avg_price")
    )


@register(
    "q_python_udtf",
    oracle="""
    WITH per_nation AS (
        SELECT s_nationkey, COUNT(*) AS n_sup FROM supplier GROUP BY s_nationkey
    )
    SELECT s_nationkey,
           printf('%05d', CAST((start_i - 1) / 10 AS BIGINT)) AS batch_id,
           start_i,
           LEAST(start_i + 9, n_sup) AS end_i
    FROM (SELECT s_nationkey, n_sup,
                 UNNEST(generate_series(1, n_sup, 10)) AS start_i
          FROM per_nation)
    """,
)
def q_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: Python UDTF (Spark 4) — one meta row expands to N batch rows.

    The direct modern form of TRACEJobGenerator's descriptor loop
    (TRACEJobGenerator.java:58-93): a lateral table function turns each
    per-nation supplier count into [start,end] batches of 10 with
    %05d ids. The UDTF runs per input row executor-side (no driver
    loop, no collect); the declarative twin is explode(sequence(...))
    in q_ntile_batching — same semantics, and the UDTF form is the
    escape hatch when batch logic outgrows SQL expressions.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="batch_id: string, start_i: bigint, end_i: bigint")
    class BatchRanges:
        def eval(self, n: int, size: int):
            start, batch = 1, 0
            while start <= n:
                yield f"{batch:05d}", start, min(start + size - 1, n)
                start += size
                batch += 1

    spark.udtf.register("batch_ranges", BatchRanges)
    sup = table(spark, sf_dir, "supplier")
    sup.groupBy("s_nationkey").agg(F.count("*").alias("n_sup")).createOrReplaceTempView(
        "per_nation_counts"
    )
    return spark.sql(
        """
        SELECT p.s_nationkey, b.batch_id, b.start_i, b.end_i
        FROM per_nation_counts p,
             LATERAL batch_ranges(CAST(p.n_sup AS INT), 10) b
        """
    )
