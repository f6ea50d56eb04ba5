"""Z-order (Morton) clustering for multi-dimensional file pruning.

Sorting a table by one column gives parquet min/max stats that prune
scans on THAT column only; filters on a second column still read
every file. Interleaving the bits of both columns' quantized values
(the Z-order / Morton curve) and sorting by the interleaved key keeps
rows that are close in BOTH dimensions in the same files — every
row group covers a small bounding box of the (c1, c2) space, so
min/max stats prune selective filters on either column (or both).
This is the technique behind Delta/Iceberg ``ZORDER BY``; here it is
plain column arithmetic + a sorted write, nothing engine-specific.

Scale notes: quantization bounds come from a 1-row (min, max)
aggregate (one cheap pass — or pass known bounds to skip it); the
write is one range-repartition + in-partition sort, the same cost as
any clustered write. The z-key is 2×``bits`` wide — 16 bits per
dimension distinguishes 65k quantiles per axis, plenty for row-group
pruning granularity (a 100 TB table has ~10^6 row groups).

``tests/test_zorder.py`` asserts the property that matters, from the
parquet footers themselves: per-row-group min/max SPANS. A
single-column sort is tight on its sort key but full-span on the
other column (filters on it prune nothing); z-order bounds both
dimensions at ~sqrt(1/n_groups), which is what makes either-column
filters prune. (Raw bounding-box *area* is the wrong metric — a 1-D
sort minimizes it while being unprunable on the second dimension.)
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

ZORDER_BITS = 16


def _quantize(col: Column, vmin: Column, vmax: Column, bits: int) -> Column:
    """Scale ``col`` into [0, 2^bits) against (vmin, vmax) — constant
    input (vmax == vmin) maps to 0 instead of dividing by zero; NULL
    stays NULL (``greatest``/``least`` silently skip NULLs, which
    would otherwise cluster null-dimension rows onto the origin and
    inflate those row groups' spans — nulls are routed to their own
    trailing key range by ``write_zordered`` instead)."""
    top = F.lit((1 << bits) - 1)
    span = vmax.cast("double") - vmin.cast("double")
    scaled = F.when(span == 0, F.lit(0)).otherwise(
        F.floor((col.cast("double") - vmin) / span * top)
    )
    clamped = F.least(top, F.greatest(F.lit(0), scaled)).cast("long")
    return F.when(col.isNull(), F.lit(None).cast("long")).otherwise(clamped)


def zorder_key(q1: Column, q2: Column, bits: int = ZORDER_BITS) -> Column:
    """Interleave the low ``bits`` of two quantized columns into one
    Morton key (q1 on even bit positions, q2 on odd). Pure shift/and/or
    expressions — whole-stage codegen, no UDF. NULL in either input
    propagates to a NULL key. ``bits`` is capped at 31: at 32 the
    high odd bit would land on long's sign bit and negative keys
    would range-sort before the origin, silently destroying the
    clustering."""
    if not 1 <= bits <= 31:
        raise ValueError("zorder bits must be in [1, 31]")
    parts = []
    for b in range(bits):
        parts.append(F.shiftleft(F.shiftright(q1, b).bitwiseAND(F.lit(1)), 2 * b))
        parts.append(
            F.shiftleft(F.shiftright(q2, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def write_zordered(
    df: DataFrame,
    path: str,
    col1: str,
    col2: str,
    bits: int = ZORDER_BITS,
    n_files: int | None = None,
) -> None:
    """Write ``df`` clustered on the z-order of (col1, col2).

    One bounds pass (broadcast 1-row min/max), then range-repartition
    by the z-key (so files cover disjoint key ranges) and sort within
    partitions — each output file's rows are contiguous on the Morton
    curve, i.e. a small bounding box in (col1, col2) space.
    """
    bounds = df.agg(
        F.min(col1).alias("_min1"),
        F.max(col1).alias("_max1"),
        F.min(col2).alias("_min2"),
        F.max(col2).alias("_max2"),
    )
    q1 = _quantize(F.col(col1), F.col("_min1"), F.col("_max1"), bits)
    q2 = _quantize(F.col(col2), F.col("_min2"), F.col("_max2"), bits)
    # rows with a NULL dimension cluster into their own TRAILING key
    # range (beyond any Morton key) instead of polluting the origin
    # files' min/max stats
    keyed = df.crossJoin(F.broadcast(bounds)).withColumn(
        "_zkey",
        F.coalesce(zorder_key(q1, q2, bits), F.lit(1 << 62)),
    )
    out = (
        keyed.repartitionByRange(n_files, "_zkey")
        if n_files
        else keyed.repartitionByRange("_zkey")
    )
    (
        out.sortWithinPartitions("_zkey")
        .drop("_zkey", "_min1", "_max1", "_min2", "_max2")
        .write.mode("overwrite")
        .parquet(path)
    )
