"""Z-order (Morton) clustering — multi-dimensional data-skipping layout.

Parquet min/max footer statistics prune a scan only along the sort
order of the written files. Sorting by a Z-value — the bit-interleave
of two (or more) dimension keys — makes file-level min/max ranges
tight in BOTH dimensions at once, so selective predicates on either
column skip most files. This is the layout trick behind
Delta/Iceberg's OPTIMIZE ZORDER, restated as plain DataFrame ops:
compute the Z-value with pure codegen bit arithmetic, then
`repartitionByRange(z).sortWithinPartitions(z)` and write.

The interleave is the classic parallel-prefix bit spread (the
"magic numbers" of Morton encoding, public domain bit-twiddling):
spread16(x) inserts a zero between each of the low 16 bits in 4
shift-and-mask steps; z = spread16(a) | spread16(b) << 1. Everything
stays in whole-stage codegen — no UDF, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["spread16", "interleave16", "zorder_write"]

# (shift, mask) steps spreading the low 16 bits of a long across 32 bits.
_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _shl(col: Column, n: int) -> Column:
    return F.call_function("shiftleft", col, F.lit(n))


def spread16(col: Column) -> Column:
    """Spread the low 16 bits of an integer column: bit i -> bit 2i."""
    x = col.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(_shl(x, shift))).bitwiseAND(F.lit(mask))
    return x


def interleave16(a: Column, b: Column) -> Column:
    """32-bit Morton code of two 16-bit keys (a gets the even bits)."""
    return spread16(a).bitwiseOR(_shl(spread16(b), 1))


def zorder_write(df: DataFrame, path: str, a: str, b: str, *,
                 n_files: int = 32) -> None:
    """Write ``df`` as parquet clustered on the Z-order of (a, b).

    Each dimension is first min-max scaled to the full 16-bit range —
    raw Morton codes only balance dimensions of comparable bit width;
    without scaling, the wider column's high bits dominate the Z value
    and the narrower column degenerates to an ordinary sort
    (quantile/range normalization is the same reason Delta's OPTIMIZE
    ZORDER ranks columns first). The bounds come from ONE scalar
    aggregate broadcast to the scan — no global sort, no driver logic.

    Then range-partitions by the Z-value into ``n_files`` tasks and
    sorts within each, so every output file covers one contiguous Z
    range — parquet min/max footer stats then prune on either
    dimension. The Z column is dropped from the files; it is a layout
    key, not data.
    """
    bounds = df.agg(
        F.min(a).alias("__a_min"),
        F.max(a).alias("__a_max"),
        F.min(b).alias("__b_min"),
        F.max(b).alias("__b_max"),
    )

    def scale(col: str, lo: str, hi: str) -> Column:
        span = F.greatest(F.col(hi) - F.col(lo), F.lit(1)).cast("long")
        return ((F.col(col) - F.col(lo)).cast("long") * 65535 / span).cast("long")

    z = interleave16(scale(a, "__a_min", "__a_max"), scale(b, "__b_min", "__b_max"))
    (
        df.join(F.broadcast(bounds))
        .withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", "__a_min", "__a_max", "__b_min", "__b_max")
        .write.mode("overwrite")
        .parquet(path)
    )
