"""One-pass dataset profiling (engine utility).

The engine-side generalization of the reference's validation counters
(MapReduceError.java enumerates 30 per-condition counts; the driver
reads them as a profile of the input — LASERInputValidator.java:142-145):
instead of fixed error counters, compute a full per-column statistical
profile in ONE scan — every statistic is a partial-aggregatable
expression, so the whole profile costs one map pass + one tiny exchange
regardless of column count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType


def _stats_for(df: DataFrame, col: str, exact_distinct: bool) -> list[Column]:
    dt = df.schema[col].dataType
    distinct = (
        F.count_distinct(F.col(col))
        if exact_distinct
        else F.approx_count_distinct(col, 0.01)
    )
    stats = [
        F.count(F.col(col)).alias(f"{col}__n_nonnull"),
        distinct.alias(f"{col}__n_distinct"),
    ]
    if isinstance(dt, NumericType):
        stats += [
            F.min(col).alias(f"{col}__min"),
            F.max(col).alias(f"{col}__max"),
            F.round(F.avg(col), 4).alias(f"{col}__avg"),
        ]
    elif isinstance(dt, StringType):
        stats += [
            F.min(F.length(col)).alias(f"{col}__min_len"),
            F.max(F.length(col)).alias(f"{col}__max_len"),
        ]
    return stats


def profile(
    df: DataFrame, columns: list[str] | None = None, *, exact_distinct: bool = False
) -> DataFrame:
    """Single-row, single-pass profile of the given columns.

    Numeric columns: nonnull/distinct/min/max/avg; strings: nonnull/
    distinct/length range. Default distinct counts are HyperLogLog
    (approx_count_distinct, mergeable sketch — the only form that holds
    at 100 TB); pass exact_distinct=True when the profile feeds an
    exactness gate like the reference's all-rows-same-arity check
    (LASERInputCheckMapper.java:170-174).
    """
    cols = columns if columns is not None else df.columns
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.extend(_stats_for(df, c, exact_distinct))
    return df.agg(*aggs)
