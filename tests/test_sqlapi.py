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


def test_run_script_while_loop_batched_aggregate(spark, sf_dir):
    """X288: SQL scripting. A WHILE loop chunking customers into 4 key
    ranges accumulates the same total order count a single aggregate
    computes — the batched-maintenance pattern in pure SQL."""
    from laser_hadoop_spark.sqlapi import run_script, run_sql

    expected = run_sql(
        spark, sf_dir, "SELECT COUNT(*) AS n FROM orders"
    ).collect()[0]["n"]
    got = run_script(
        spark,
        sf_dir,
        """
        BEGIN
          DECLARE hi BIGINT;
          DECLARE chunk BIGINT;
          DECLARE lo BIGINT DEFAULT 0;
          DECLARE total BIGINT DEFAULT 0;
          SET hi = (SELECT MAX(o_custkey) + 1 FROM orders);
          SET chunk = hi DIV 4 + 1;
          WHILE lo < hi DO
            SET total = total + (
              SELECT COUNT(*) FROM orders
              WHERE o_custkey >= lo AND o_custkey < lo + chunk
            );
            SET lo = lo + chunk;
          END WHILE;
          SELECT total AS n;
        END
        """,
    ).collect()
    assert got[0]["n"] == expected


def test_run_script_if_and_convergence_loop(spark, sf_dir):
    """X288: control flow — integer bisection sqrt of a data-derived
    scalar inside REPEAT, plus IF/ELSE classification; result equals
    the closed form computed in Python."""
    import math

    from laser_hadoop_spark.sqlapi import run_script, run_sql

    n_orders = run_sql(
        spark, sf_dir, "SELECT COUNT(*) AS n FROM orders"
    ).collect()[0]["n"]
    flag_before = spark.conf.get("spark.sql.scripting.enabled")
    rows = run_script(
        spark,
        sf_dir,
        """
        BEGIN
          DECLARE n BIGINT;
          DECLARE lo BIGINT DEFAULT 0;
          DECLARE hi BIGINT;
          DECLARE mid BIGINT;
          DECLARE label STRING;
          SET n = (SELECT COUNT(*) FROM orders);
          SET hi = n + 1;
          REPEAT
            SET mid = (lo + hi + 1) DIV 2;
            IF mid * mid <= n THEN
              SET lo = mid;
            ELSE
              SET hi = mid - 1;
            END IF;
          UNTIL lo >= hi
          END REPEAT;
          IF lo * lo = n THEN
            SET label = 'perfect-square';
          ELSE
            SET label = 'not-square';
          END IF;
          SELECT lo AS isqrt_n, label;
        END
        """,
    ).collect()
    assert rows[0]["isqrt_n"] == math.isqrt(n_orders)
    assert rows[0]["label"] == (
        "perfect-square"
        if math.isqrt(n_orders) ** 2 == n_orders
        else "not-square"
    )
    # the per-call scripting flag restores whatever the session had
    # (Spark 4.1 defaults it to true; 4.0 shipped false — run_script
    # must work under either without leaving a residue)
    assert spark.conf.get("spark.sql.scripting.enabled") == flag_before
