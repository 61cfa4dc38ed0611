"""ANSI-SQL entry surface over the star schema.

The engine's queries are DataFrame-declared, but a user migrating from
any SQL warehouse expects to point a SQL string at the tables. This
module registers every star-schema table (tables.TABLE_NAMES, loaded
through tables.table so the events timestamp canonicalization applies)
as a temp view and hands back ``spark.sql`` — the full Catalyst SQL
surface (CTEs, window functions, GROUPING SETS, QUALIFY-less rank
filters, LATERAL, recursive CTEs on Spark 4) with zero engine code in
the loop.

Views are temp views in the session catalog: no Hive metastore
dependency, safe to re-register (CREATE OR REPLACE), and each view is
a lazy parquet scan — registering all ten costs nothing until a query
touches one. On a real cluster the same function would register
catalog tables (saveAsTable / external locations) instead; the query
surface is identical.

Reference analogue: the reference has NO query language — every
"query" is a hard-coded workflow step (SURVEY.md §3). This surface is
the capability-closure the north star asks for: the reference's fixed
pipelines become one-liners (see tests/test_sqlapi.py for the
shared-loci count spelled in SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from laser_hadoop_spark import tables
from laser_hadoop_spark.tables import TABLE_NAMES

# Memoization key: temp views are GLOBAL PER NAME within a session, so
# only the LAST registered sf_dir is live — a set of (session, dir)
# pairs would wrongly skip re-registration after switching dirs and
# silently query the other dir's data (round-4 advice). The marker
# lives as an attribute ON the session object itself: session-lifetime
# by construction (no id() reuse after GC), and naturally tracks only
# the latest dir. Each registration costs ~1s of parquet
# listing/footer overhead (see tables.register_views), hence the memo.
_MARKER = "_laser_hadoop_spark_registered_sf_dir"


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every star-schema table as a temp view; returns names.

    Delegates to tables.register_views (single implementation of the
    view wiring, events canonicalization included).
    """
    tables.register_views(spark, sf_dir)
    setattr(spark, _MARKER, sf_dir)
    return list(TABLE_NAMES)


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """One-shot SQL entry point: register views (skipped only when this
    session's CURRENT views already point at sf_dir), run the query
    lazily."""
    if getattr(spark, _MARKER, None) != sf_dir:
        register_views(spark, sf_dir)
    return spark.sql(sql)


def run_script(spark: SparkSession, sf_dir: str, script: str) -> DataFrame:
    """X288: SQL scripting entry point (Spark 4 procedural SQL).

    Runs a BEGIN ... END block — DECLARE variables, SET, IF/CASE,
    WHILE/REPEAT/FOR loops, ITERATE/LEAVE — against the registered
    star-schema views, returning the script's result relation. This is
    the stored-procedure-shaped surface a warehouse migration expects
    for maintenance jobs (batched backfills, convergence loops,
    conditional compaction) without a driver-language round trip per
    statement: the whole script plans and executes inside Spark's SQL
    engine, and loop bodies can reference any registered view.

    Scripting is gated behind spark.sql.scripting.enabled; enabling it
    per-call keeps vanilla sessions untouched elsewhere. The scripting
    runtime executes statements sequentially on the driver — each
    statement's PLAN is still fully distributed, so a WHILE loop over
    chunked work keys issues one distributed job per iteration (the
    TRACEJobGenerator.java:52-93 batching pattern, expressed in SQL
    instead of Java driver code).
    """
    if getattr(spark, _MARKER, None) != sf_dir:
        register_views(spark, sf_dir)
    prior = spark.conf.get("spark.sql.scripting.enabled", None)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        return spark.sql(script)
    finally:
        if prior is not None:
            spark.conf.set("spark.sql.scripting.enabled", prior)
        else:
            spark.conf.unset("spark.sql.scripting.enabled")
