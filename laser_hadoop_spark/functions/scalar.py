"""Deterministic numeric helpers for cross-engine (oracle) exactness.

Money-style inputs in the test schema are fixed-point values stored as
doubles (2 decimal places). Sums of their products are exact decimals
with <= 6 fractional digits, but summing doubles is order-dependent, and
round() at a coarser precision can straddle an exact .5 boundary
differently per engine. The fix: recover the exact decimal by casting
the (error << 5e-7) double product to DECIMAL(18,6), aggregate in
decimal (exact, order-independent), round, and cast back to double —
both engines then produce bit-identical doubles.

The matching DuckDB oracle spelling is
ROUND(SUM(CAST(expr AS DECIMAL(18,6))), 4)::DOUBLE.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec_exact(expr: Column, scale: int = 6) -> Column:
    """Snap a near-fixed-point double expression to its exact decimal."""
    return expr.cast(f"decimal(18,{scale})")


def dec_exact_double(expr: Column, scale: int = 6) -> Column:
    """Exact fixed-point value of a double product, back as double."""
    return dec_exact(expr, scale).cast("double")


def money_sum(expr: Column, scale: int = 6, out_scale: int = 4) -> Column:
    """Order-independent exact sum of a fixed-point double expression."""
    return F.round(F.sum(dec_exact(expr, scale)), out_scale).cast("double")


def revenue_expr(price: str = "l_extendedprice", discount: str = "l_discount") -> Column:
    return F.col(price) * (1 - F.col(discount))
