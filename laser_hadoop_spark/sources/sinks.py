"""Sinks (SURVEY.md §2.1 S9-S13).

The reference's mappers write side-effect files straight to HDFS with
retries disabled to stay safe (LASERInputValidator.java:125;
LASERInputCheckMapper.java:148-168). Here every write goes through
Spark's committer, so task retries are safe by construction.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def write_chunked_text(
    df: DataFrame,
    out_dir: str,
    *,
    order_col: str,
    chunk_size: int = 100,
    value_col: str = "value",
    compression: str | None = "gzip",
) -> int:
    """S9: chunked text sink — rows into files of <= chunk_size rows.

    Reference: seq rows rolled into {chunk}.chunk.seq.gz files of 100
    individuals (LASERInputCheckMapper.java:148-168, rollover :155-161,
    chunk constant LASERInputValidator.java:18). Spark form: row_number
    over an explicit order -> chunk id -> write.partitionBy(chunk), one
    directory per chunk instead of one hand-rolled stream per chunk.
    Returns the chunk count (the CHUNKS counter analogue).
    """
    w = Window.orderBy(order_col)
    chunked = df.withColumn(
        "chunk", F.floor((F.row_number().over(w) - 1) / chunk_size)
    )
    writer = chunked.select(value_col, "chunk").write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.partitionBy("chunk").text(out_dir)
    return len(
        [d for d in os.listdir(out_dir) if d.startswith("chunk=")]
    )


def write_demux_by_arity(
    df: DataFrame,
    out_dir: str,
    *,
    value_col: str = "value",
    sep: str = "\t",
    small_name: str = "reference_pc_var.txt",
    large_name: str = "reference_pc.txt",
    arity_threshold: int = 2,
) -> dict[str, int]:
    """S10: predicate-demultiplexed sink.

    Reference: ReferencePCAOutputFormat routes rows with <= 2 fields to
    reference_pc_var.txt and the rest to reference_pc.txt
    (ReferencePCAOutputFormat.java:9-15). Two filtered writes sharing
    one cached scan; returns per-route row counts.
    """
    arity = F.size(F.split(F.col(value_col), sep))
    routed = df.withColumn(
        "__route", F.when(arity <= arity_threshold, "var").otherwise("pc")
    ).cache()
    try:
        counts = {
            r["__route"]: r["n"]
            for r in routed.groupBy("__route").agg(F.count("*").alias("n")).collect()
        }
        os.makedirs(out_dir, exist_ok=True)
        for route, fname in (("var", small_name), ("pc", large_name)):
            part_dir = os.path.join(out_dir, f"__{route}")
            routed.where(F.col("__route") == route).select(value_col).coalesce(
                1
            ).write.mode("overwrite").text(part_dir)
            part = next(
                f for f in os.listdir(part_dir) if f.startswith("part-")
            )
            shutil.move(os.path.join(part_dir, part), os.path.join(out_dir, fname))
            shutil.rmtree(part_dir)
        return {k: counts.get(k, 0) for k in ("var", "pc")}
    finally:
        routed.unpersist()


def write_json_metadata(metadata: dict, path: str) -> None:
    """S11: summary-JSON sink (TRACEInputValidator.java:240-247).

    Driver-side scalars (Individuals, Total loci, Shared loci, Format)
    — a plain JSON write, no Spark job needed.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(metadata, f, sort_keys=True)


def delete_consumed_source(path: str) -> bool:
    """S13: delete the original input once chunked
    (LASERInputValidator.java:186). Non-atomic in the reference too."""
    if os.path.isdir(path):
        shutil.rmtree(path)
        return True
    if os.path.exists(path):
        os.remove(path)
        return True
    return False


def write_partitioned_parquet(
    df: DataFrame,
    out_dir: str,
    *,
    partition_by: list[str],
    sort_within: list[str] | None = None,
    mode: str = "overwrite",
    compression: str = "snappy",
) -> None:
    """S14 at scale: directory-partitioned parquet layout.

    `partition_by` columns become the directory hierarchy so downstream
    scans get partition pruning for free (e.g. events laid out by
    event_date never scan irrelevant days at 100 TB). `sort_within`
    applies sortWithinPartitions (SURVEY.md §2.6 O2) before the write —
    no global sort, no extra shuffle — giving clustered row groups whose
    min/max statistics make parquet predicate pushdown selective on the
    sorted columns.
    """
    out = df
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    (
        out.write.mode(mode)
        .option("compression", compression)
        .partitionBy(*partition_by)
        .parquet(out_dir)
    )


def has_parquet_files(path: str) -> bool:
    """True if any parquet file exists under ``path`` (recursive).

    Recursive because a base written with write_partitioned_parquet
    keeps its files under key=value subdirectories, where a
    top-level-only listing would miss them and a caller could silently
    replace a whole table. Driver-local posix walk — on HDFS/S3 use
    the Hadoop FileSystem listing instead (same caveat as
    compact_parquet).
    """
    if not os.path.isdir(path):
        return False
    for _root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def upsert_parquet(
    spark: SparkSession,
    base_dir: str,
    updates: DataFrame,
    *,
    keys: list[str],
) -> None:
    """Keyed upsert (merge) into a parquet table: updates win over base.

    Without a transactional table format, merge = anti-join the base
    against the update keys, union the updates, rewrite atomically
    (write to a temp dir, then swap). Updates must be unique per key —
    enforced here with a dropDuplicates on the keys (last writer within
    a batch is arbitrary, so callers pre-aggregate when it matters).

    Scale notes: the anti-join shuffles on the merge keys only; at
    100 TB the rewrite cost makes THIS pattern the wrong default — it
    exists as the engine's merge primitive for modest dimension/state
    tables (and as the foreachBatch sink for streaming upserts, where
    each micro-batch's update set is small). Fact-scale mutation wants a
    partition-level rewrite: partition the base, restrict the anti-join
    + rewrite to partitions present in the updates.
    """
    up = updates.dropDuplicates(keys).localCheckpoint(eager=True)
    if has_parquet_files(base_dir):
        base = spark.read.parquet(base_dir)
        merged = base.join(up, on=keys, how="left_anti").unionByName(up)
    else:
        merged = up
    tmp_dir = base_dir.rstrip("/") + ".__tmp__"
    merged.write.mode("overwrite").parquet(tmp_dir)
    if os.path.isdir(base_dir):
        shutil.rmtree(base_dir)
    os.replace(tmp_dir, base_dir)


def write_orc(
    df: DataFrame,
    path: str,
    *,
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """ORC sink (optionally hive-partitioned). Pairs with
    readers.read_orc for the non-parquet columnar interchange path."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    *,
    target_mb: int = 128,
    sort_within: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~target_mb-sized files.

    The small-file problem: a streaming sink or over-parallel writer
    leaves thousands of KB-scale files, and at 100 TB the NameNode/
    listing cost plus per-file open overhead dominates scans. Compaction
    = read, repartition to ceil(bytes / target), optionally re-sort
    within partitions (to preserve a clustering like zorder_write's),
    write. The file count comes from the actual on-disk byte size (via
    the source's own file statuses), not a guess — no driver data
    round-trip, just metadata.

    Returns the number of output partitions chosen. The reference's
    chunked-gzip sink (TRACEWriter.java batching) is the row-count
    analogue; this is the byte-oriented engine-ops form.
    Sizes come from Hadoop FileSystem statuses of the scan's own input
    files, so the math holds on HDFS/S3/anything Spark reads — not
    just the local filesystem (round-3 ADVICE: an os.walk sizing
    returned 0 bytes off-local and collapsed the output into one
    partition). A local os.walk remains only as the fallback for
    JVM-less sessions (Spark Connect).
    """
    import math
    import os

    df = spark.read.parquet(src_path)
    try:
        hpath_cls = spark._jvm.org.apache.hadoop.fs.Path  # noqa: SLF001
        hconf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
        total_bytes = 0
        for f in df.inputFiles():
            p = hpath_cls(f)
            total_bytes += p.getFileSystem(hconf).getFileStatus(p).getLen()
    except Exception:  # noqa: BLE001 - no JVM gateway (Spark Connect)
        total_bytes = 0
        for root, _dirs, files in os.walk(src_path):
            for f in files:
                if f.endswith(".parquet"):
                    total_bytes += os.path.getsize(os.path.join(root, f))
    n_parts = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))
    if sort_within:
        df = df.repartitionByRange(n_parts, *sort_within).sortWithinPartitions(
            *sort_within
        )
    else:
        df = df.repartition(n_parts)
    df.write.mode("overwrite").parquet(dst_path)
    return n_parts
