"""Loaders for the driver-generated test star schema (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under an sf directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always broadcast in joins.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table as a DataFrame (columnar parquet scan).

    `events.ts` has been generated both as parquet TIMESTAMP(NANOS)
    (which Spark refuses by default; read as a long via nanosAsLong and
    truncated to microseconds — the same conversion DuckDB applies) and
    as TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as TIMESTAMP_NTZ).
    Both are canonicalized to TIMESTAMP_LTZ whose epoch equals the
    stored wall-clock interpreted as UTC, so event-time expressions
    (unix_micros, window(), range frames) agree with the DuckDB oracle's
    naive-timestamp arithmetic. The NTZ path goes through an explicit
    epoch diff against an NTZ anchor — not a cast — so the result is
    independent of the session time zone.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # Deterministic event-time semantics regardless of the caller's
        # session defaults (the driver builds its own SparkSession).
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":  # TIMESTAMP(NANOS): truncate to micros
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":  # TIMESTAMP(MICROS), unadjusted
            df = df.withColumn(
                "ts",
                F.timestamp_micros(
                    F.expr(
                        "timestampdiff(MICROSECOND,"
                        " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                    )
                ),
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> None:
    """Register tables as temp views for the SQL API.

    Pass the subset a query actually reads — each view creation is a
    parquet relation build (listing + footer), so registering all ten
    tables costs ~1s of pure overhead per call.
    """
    for name in names:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
