"""Local oracle-comparison harness mirroring the driver's correctness gate.

Runs a registered query's Spark DataFrame and its DuckDB oracle SQL over
the same parquet tables, then compares row count, sorted column names,
and an order-insensitive canonical value multiset (stricter than a
hash: actual values).
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass, field
from decimal import Decimal
from typing import Any

from laser_hadoop_spark.tables import TABLE_NAMES


def duckdb_connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _canon(v: Any) -> Any:
    """Canonicalize one value for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse float noise below the query-level rounding (round 4);
        # +0.0 folds -0.0 into +0.0 (repr-distinct but ==-equal, which
        # desynchronizes the repr-sorted multisets)
        return round(v, 6) + 0.0
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def _rows_multiset(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int | None
    detail: str = ""
    mismatches: list[str] = field(default_factory=list)


def compare_query(spark, con, name: str, fn, oracle: str | None, sf_dir: str) -> CompareResult:
    sdf = fn(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns
    if oracle is None:
        return CompareResult(name, True, len(srows), None, detail="rows-only")
    rel = con.sql(oracle)
    ocols = rel.columns
    orows = rel.fetchall()
    problems: list[str] = []
    if sorted(scols) != sorted(ocols):
        problems.append(f"columns: spark={sorted(scols)} oracle={sorted(ocols)}")
    if len(srows) != len(orows):
        problems.append(f"rowcount: spark={len(srows)} oracle={len(orows)}")
    if not problems:
        sm = _rows_multiset(scols, [tuple(r) for r in srows])
        om = _rows_multiset(ocols, orows)
        if sm != om:
            diff_s = [r for r in sm if r not in om][:3]
            diff_o = [r for r in om if r not in sm][:3]
            problems.append(f"values: spark-only={diff_s} oracle-only={diff_o}")
    return CompareResult(
        name, not problems, len(srows), len(orows), mismatches=problems
    )
