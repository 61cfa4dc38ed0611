"""As-of (nearest-earlier) join — SURVEY.md §2.3 J8.

Spark has no native ASOF JOIN. This is the union-and-carry composition:
tag both inputs, union them, and per key carry the most recent right-
side row forward with last(..., ignorenulls=True) over a running frame.

Why this shape at scale: one shuffle (by the join keys) and one ordered
window pass — no per-row point lookups, no range self-join blow-up.
A 100 TB probe stream against a large quote/state table shuffles each
side once on the key and streams through the sort; skewed keys fall to
AQE skew handling like any other exchange.

The reference has no as-of semantics (batch-only validation pipelines);
this closes the time-series capability (SURVEY.md §2.3 J8, events table
per /root/repo/BASELINE.json:6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ASOF_PREFIX = "asof_"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "inner",
    prefix: str = ASOF_PREFIX,
) -> DataFrame:
    """Join each left row to the latest right row with right_ts <= left_ts.

    Returns every left column plus, for each right value column v (all
    right columns except the keys and right_ts), a carried `{prefix}{v}`
    column, and `{prefix}ts` = the matched right row's timestamp. Ties
    at equal timestamps match (inclusive >=, the ASOF JOIN convention).
    how='inner' drops left rows with no earlier right row; how='left'
    keeps them with nulls.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join supports inner/left, got {how!r}")
    left_vals = [c for c in left.columns if c not in on]
    right_vals = [c for c in right.columns if c not in on and c != right_ts]
    ltypes, rtypes = dict(left.dtypes), dict(right.dtypes)

    carried_ts = f"{prefix}ts"
    l_part = left.select(
        *on,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__probe"),
        *[F.col(c) for c in left_vals],
        F.lit(None).cast(rtypes[right_ts]).alias(carried_ts),
        *[F.lit(None).cast(rtypes[c]).alias(f"{prefix}{c}") for c in right_vals],
    )
    r_part = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__probe"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in left_vals],
        F.col(right_ts).alias(carried_ts),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_vals],
    )
    # At equal __t the right row sorts first (__probe 0 < 1), so an
    # exactly-simultaneous right row is visible to the left probe.
    w = (
        Window.partitionBy(*on)
        .orderBy("__t", "__probe")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried_cols = [carried_ts] + [f"{prefix}{c}" for c in right_vals]
    carried = l_part.unionByName(r_part).select(
        *on,
        "__probe",
        *left_vals,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in carried_cols],
    )
    out = carried.where(F.col("__probe") == 1).drop("__probe")
    if how == "inner":
        out = out.where(F.col(carried_ts).isNotNull())
    return out
