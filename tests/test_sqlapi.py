"""SQL entry surface: ANSI SQL strings over the registered star
schema must agree with the DataFrame-declared engine queries and with
DuckDB on the same parquet."""

from __future__ import annotations

from laser_hadoop_spark import sqlapi
from laser_hadoop_spark.testing import duckdb_connect


def test_run_sql_matches_duckdb_aggregate(spark, sf_dir):
    sql = """
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS rev_centi
        FROM lineitem GROUP BY l_returnflag
    """
    got = {
        r["l_returnflag"]: (r["n"], r["rev_centi"])
        for r in sqlapi.run_sql(spark, sf_dir, sql).collect()
    }
    con = duckdb_connect(sf_dir)
    want = {
        f: (n, rev) for f, n, rev in con.sql(sql).fetchall()
    }
    assert got == want and got


def test_run_sql_window_and_join(spark, sf_dir):
    """The reference's shared-loci broadcast-join count (J1/A2) as one
    SQL string — the fixed workflow step become a query."""
    sql = """
        SELECT COUNT(*) AS total,
               SUM(CASE WHEN n.n_name IS NOT NULL THEN 1 ELSE 0 END) AS shared
        FROM customer c LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
    """
    row = sqlapi.run_sql(spark, sf_dir, sql).collect()[0]
    assert row["total"] >= row["shared"] > 0


def test_register_views_idempotent(spark, sf_dir):
    assert sqlapi.register_views(spark, sf_dir) == sqlapi.register_views(
        spark, sf_dir
    )
    assert spark.sql("SELECT COUNT(*) AS n FROM region").collect()[0]["n"] == 5
