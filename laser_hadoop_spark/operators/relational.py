"""Scale-aware join helpers — SURVEY.md §2.3 J1/J5 closure.

The reference's one join strategy is a hand-rolled broadcast hash join
(distributed-cache HashMap build, LASERInputCheckMapper.java:53-72);
Catalyst already covers broadcast/SMJ/shuffle-hash selection and AQE
covers runtime skew splitting. What it does NOT automate:

- deliberate key salting when a shuffle-hash join must survive extreme
  key skew (AQE skew-split only helps sort-merge joins), and
- bucketed table layout, which removes the shuffle from repeated
  co-located joins entirely — the dominant cost at 100 TB when the same
  fact-fact join runs per pipeline invocation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: list[str],
    *,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with deterministic key salting for skewed fact keys.

    The fact side scatters each row into one of n_salts sub-keys via a
    deterministic row hash (xxhash64 of all columns — stable across task
    retries, unlike rand()); the dim side replicates every row n_salts
    times. A hot key's rows thus spread over n_salts shuffle partitions
    instead of one straggler task, at the cost of a n_salts-x larger dim
    shuffle — use for large-large shuffle joins where the dim side is
    too big to broadcast but small enough to replicate.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]), F.lit(n_salts))
    f = facts.withColumn("__salt", salt.cast("int"))
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return f.join(d, on=on + ["__salt"], how=how).drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    *,
    keys: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table hash-bucketed by join keys (Parquet + metastore).

    Two tables bucketed by the same keys into the same bucket count
    join WITHOUT an exchange: each task reads matching bucket files
    from both sides. At 100 TB this converts every recurring fact-fact
    join from a full shuffle into a co-located scan — the Spark
    analogue of the reference pre-partitioning its inputs per batch
    file (TRACEInputValidator.java:174-189).
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; plan contains no shuffle exchange."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
