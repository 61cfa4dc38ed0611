"""Row chunking and range batching (SURVEY.md §2.5 W1/W2).

The reference's two parallelism generators: 100-row seq chunks
(LASERInputCheckMapper.java:118-168; constant LASERInputValidator.java:18)
and [start,end] individual batches with %05d ids
(TRACEJobGenerator.java:52-93).

Scale note: a global row_number() funnels through one task for the
ordering; chunk assignment at 100 TB should therefore derive from a
pre-sorted unique key range (assign_chunks_by_key) or per-partition
offsets, not a global window. Both forms are provided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_CHUNK_SIZE = 100  # LASERInputValidator.java:18


def assign_chunks(
    df: DataFrame, order_col: str, chunk_size: int = DEFAULT_CHUNK_SIZE
) -> DataFrame:
    """W1: chunk id = floor(row_index / chunk_size), deterministic order.

    Exact reference semantics (contiguous chunks of exactly chunk_size
    in row order). The global window is the cost of exactness — use
    assign_chunks_by_key when approximate, key-ranged chunks suffice.
    """
    w = Window.orderBy(order_col)
    return df.withColumn(
        "chunk", F.floor((F.row_number().over(w) - 1) / chunk_size)
    )


def assign_chunks_offsets(
    df: DataFrame,
    order_col: str,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    n_partitions: int | None = None,
) -> DataFrame:
    """Scale-safe W1: global row-number chunking WITHOUT a global window.

    Output-identical to assign_chunks (chunk = floor(global_row/size)
    in order_col order; order_col must be unique for determinism), but
    the classic two-pass zipWithIndex shape instead of a
    single-partition window:

    1. range-repartition + sort within partitions on order_col — the
       only shuffle, and every partition sorts in parallel;
    2. a counts-only job reads per-partition row counts (one row per
       partition) and prefix-sums them into start offsets on the driver
       (bounded: n_partitions integers);
    3. an Arrow map over the SAME materialized partitions adds
       offset[pid] + local_index.

    The sorted frame is pinned with localCheckpoint before the two jobs:
    range-exchange boundary *sampling* is re-seeded per execution (the
    sampler seed derives from the physical RDD id), so without pinning
    the counts job and the output job can see DIFFERENT partition
    boundaries and mis-seam chunks at partition edges. The checkpoint is
    one materialization of data that both jobs consume — the same cost
    profile as RDD.zipWithIndex's two passes.

    At 100 TB this is ~P parallel sorts + one tiny counts collect; the
    global-window form funnels every row through one task.
    """
    import numpy as np

    spark = df.sparkSession
    if n_partitions is None:
        n_partitions = spark.sparkContext.defaultParallelism
    sorted_df = (
        df.repartitionByRange(n_partitions, order_col)
        .sortWithinPartitions(order_col)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["__pid"]: r["n"]
        for r in sorted_df.groupBy("__pid").agg(F.count("*").alias("n")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    b_off = spark.sparkContext.broadcast(offsets)

    out_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)

    def add_chunk(batches):
        seen = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["__pid"].iloc[0])
            base = b_off.value[pid] + seen
            out = pdf.drop(columns="__pid")
            out["chunk"] = np.arange(base, base + len(pdf)) // chunk_size
            seen += len(pdf)
            yield out

    return sorted_df.mapInPandas(add_chunk, f"{out_fields}, chunk bigint")


def assign_chunks_by_key(
    df: DataFrame, key_col: str, chunk_size: int = DEFAULT_CHUNK_SIZE
) -> DataFrame:
    """Scale form of W1: chunk by key range instead of global row number.

    For a dense integer key (e.g. a sequence id), chunk = key div size —
    no shuffle, no single-task ordering window; chunk sizes equal the
    reference's exactly when keys are dense.
    """
    return df.withColumn("chunk", F.floor(F.col(key_col) / chunk_size))


def chunk_counts(chunked: DataFrame) -> DataFrame:
    """Per-chunk row counts (the CHUNKS/INDIVIDUALS counters, A3)."""
    return chunked.groupBy("chunk").agg(F.count("*").alias("n_rows"))


def range_batches(df: DataFrame, batch_size: int) -> DataFrame:
    """W2/U4: tile 1..count(df) into [start,end] batches with %05d ids.

    Reference: TRACEJobGenerator.java:52-93 loops in the driver; here a
    1-row count explodes through sequence() — a table function, fully
    distributed, no driver loop.
    Output: (batch_id string, start_ind long, end_ind long).
    """
    n = df.agg(F.count("*").alias("n_ind"))
    return (
        n.select(
            F.explode(F.sequence(F.lit(1), F.col("n_ind"), F.lit(batch_size))).alias(
                "start_ind"
            ),
            "n_ind",
        )
        .select(
            F.format_string(
                "%05d", F.floor((F.col("start_ind") - 1) / batch_size)
            ).alias("batch_id"),
            "start_ind",
            F.least(F.col("start_ind") + batch_size - 1, F.col("n_ind")).alias(
                "end_ind"
            ),
        )
    )


def assign_to_batches(
    df: DataFrame, batches: DataFrame, value_col: str
) -> DataFrame:
    """J7: attach each row to its [start,end] batch (range join).

    batches is tiny (count/batch_size rows) -> broadcast nested loop.
    At scale prefer the closed form batch = (value-1) div batch_size
    when batches are uniform — an equi-computable key, no join at all.
    """
    cond = (F.col(value_col) >= F.col("start_ind")) & (
        F.col(value_col) <= F.col("end_ind")
    )
    return df.join(F.broadcast(batches), cond, "inner")
