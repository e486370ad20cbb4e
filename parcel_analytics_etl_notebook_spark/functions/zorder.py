"""Z-order (Morton) clustering keys — multi-dimensional data layout.

Sorting a table by one column gives perfect file/row-group skipping on
that column and none on any other. Interleaving the bits of two (or
more) normalized columns into one sort key gives *good* skipping on
every participating column at once: files then hold small rectangles
of the key space, so min/max statistics prune scans filtered on either
dimension. This is the layout trick behind Delta/Iceberg OPTIMIZE
ZORDER, expressed here as a plain column function usable with any
``df.repartitionByRange(key).sortWithinPartitions(key)`` + parquet
write.

All bit math is JVM-side (`shiftleft`/`|`/`&`); no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _spread_bits(col: Column, bits: int) -> Column:
    """Spread the low ``bits`` bits of an int so consecutive bits land
    two apart (b_i moves to position 2i) — one dimension of a 2-D
    Morton code, built bit-by-bit (bits is small and static)."""
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(col, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return out


def zorder_key_2d(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton-interleave two non-negative integer columns (each
    truncated to ``bits`` low bits) into one sortable long.

    Normalize real columns to dense non-negative ints first (e.g. rank
    or epoch-day) — Z-order quality depends on both dimensions using
    comparable bit ranges. 2×16 bits fills 32 of the long's 63 usable
    bits; raise ``bits`` for finer grids, add dimensions by spreading
    every k-th bit instead.
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    mask = (1 << bits) - 1
    a_m = a.cast("long").bitwiseAND(F.lit(mask))
    b_m = b.cast("long").bitwiseAND(F.lit(mask))
    return _spread_bits(a_m, bits).bitwiseOR(
        F.shiftleft(_spread_bits(b_m, bits), 1)
    )
