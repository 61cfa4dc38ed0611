"""Two-pass distributed cumulative aggregation (round-3 verdict item 8).

A cumulative sum / rank in a GLOBAL total order is usually written as
``Window.orderBy(...)`` with no partition spec — which Spark executes by
funneling every row through one task (``Exchange SinglePartition``).
Fine when the windowed relation is a small aggregate; a scale-killer
when the dimension grows 100x.

``ordered_cumsum`` produces identical output with no single-partition
exchange anywhere in the plan, using the classic two-pass offset shape
(the same discipline as operators/chunking.assign_chunks_offsets, which
is the row-number-only special case; this operator generalizes it to
arbitrary running sums and stays fully declarative — offsets come back
via a broadcast join, not a driver collect):

1. range-repartition + sort within partitions on the order columns —
   the only data shuffle, every partition sorts in parallel;
2. per-partition local running sums / local row numbers (a PARTITIONED
   window over ``__pid`` — parallel, no global funnel);
3. per-partition totals (one row per partition) are prefix-summed into
   start offsets by a triangular self-join over the tiny totals
   relation (n_partitions² pairs — bounded by a chosen constant, and
   deliberately NOT a global window so the no-SinglePartition invariant
   holds for the whole plan), then broadcast-joined back.

The range-partitioned frame is pinned with ``localCheckpoint`` before
the two consuming jobs: range-boundary sampling is re-seeded per
execution, so without pinning the totals job and the output job could
see different partition boundaries and mis-seam the offsets (the same
hazard assign_chunks_offsets documents).

Determinism contract: ``order_by`` must be a TOTAL order (include a
unique tiebreaker column) — then the output is independent of where
the range boundaries land, byte-identical to the single-partition
window form.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ordered_cumsum(
    df: DataFrame,
    *,
    order_by: Sequence[Column | str],
    values: Mapping[str, str] | None = None,
    row_number_col: str | None = None,
    n_partitions: int | None = None,
) -> DataFrame:
    """Running sums (and optionally a global row number) of ``df`` in
    the total order ``order_by``, without a single-partition window.

    ``values`` maps source column name -> output cumulative column
    name; each output holds SUM(source) over rows from the start of the
    order through the current row (inclusive). ``row_number_col`` adds
    the 1-based global row number. Output rows keep all input columns.
    """
    values = dict(values or {})
    if not values and row_number_col is None:
        raise ValueError("nothing to compute: pass values and/or row_number_col")
    spark = df.sparkSession
    n = n_partitions or spark.sparkContext.defaultParallelism
    pinned = (
        df.repartitionByRange(n, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    srcs = list(values)
    local_w = (
        Window.partitionBy("__pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rn_w = Window.partitionBy("__pid").orderBy(*order_by)
    proj = pinned.select(
        "*",
        *[F.sum(s).over(local_w).alias(f"__loc_{i}") for i, s in enumerate(srcs)],
        F.row_number().over(rn_w).alias("__loc_rn"),
    )
    parts = pinned.groupBy("__pid").agg(
        *[F.sum(s).alias(f"__p_{i}") for i, s in enumerate(srcs)],
        F.count("*").alias("__p_n"),
    )
    a, b = parts.alias("a"), parts.alias("b")
    offs = (
        a.join(b, F.col("b.__pid") < F.col("a.__pid"), "left")
        .groupBy(F.col("a.__pid").alias("__pid"))
        .agg(
            *[
                F.coalesce(F.sum(F.col(f"b.__p_{i}")), F.lit(0)).alias(f"__o_{i}")
                for i in range(len(srcs))
            ],
            F.coalesce(F.sum(F.col("b.__p_n")), F.lit(0)).alias("__o_n"),
        )
    )
    out = proj.join(F.broadcast(offs), "__pid")
    keep = [c for c in df.columns]
    cum_cols = [
        (F.col(f"__loc_{i}") + F.col(f"__o_{i}")).alias(values[s])
        for i, s in enumerate(srcs)
    ]
    rn_cols = (
        [(F.col("__loc_rn") + F.col("__o_n")).cast("int").alias(row_number_col)]
        if row_number_col
        else []
    )
    return out.select(*keep, *cum_cols, *rn_cols)
