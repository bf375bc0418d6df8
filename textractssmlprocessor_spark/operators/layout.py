"""Z-order (Morton) multi-dimension layout keys for scan pruning.

At 100 TB a table sorted by ONE column prunes file scans only on that
column, but corpus queries filter on several dimensions at once (host
AND crawl day; lang AND shard). The lakehouse remedy — Iceberg/Delta
`zorder by` — clusters files by a space-filling-curve key over both
dimensions so every file's min/max stats are tight on EITHER dimension.
This module is that key as pure native bit arithmetic: interleave the
two dimensions' bits (a 2-D Morton code) with the classic
shift-or-mask spread — five shifts and masks per dimension, all inside
whole-stage codegen, no UDF, no shuffle.

Usage shape: compute ``zorder_key(dim_a, dim_b)`` (each dimension first
reduced to a bounded non-negative int — a hash bucket, a day number, a
length bucket), then write with ``repartitionByRange(n_files, key)`` +
``sortWithinPartitions(key)``. Range partitioning gives each output
file a contiguous key interval; because the curve visits space in
nested quads, a contiguous key interval is a small set of rectangles in
(a, b) space — so min/max pruning works on both dimensions instead of
one. The key itself is deterministic (the repo's md5 bucket discipline
when hashing), so the DuckDB oracle replays it bit-for-bit.

Dimensions are clamped to 31 bits; the interleaved key uses bit
positions 0..61 of a signed 64-bit integer (never negative, safe to
range-partition and compare in both engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (shift, mask) chain spreading a 31-bit value onto even bit positions:
# after step k the value's bits sit 2^k apart within each group
SPREAD2_STEPS: tuple[tuple[int, int], ...] = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)

DIM_MASK = 0x7FFFFFFF  # 31-bit clamp per dimension


def spread_bits(col: Column) -> Column:
    """Spread a non-negative int's low 31 bits onto even bit positions
    (bit i of the input lands at bit 2i)."""
    x = col.cast("bigint").bitwiseAND(F.lit(DIM_MASK))
    for shift, mask in SPREAD2_STEPS:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def zorder_key(a: Column, b: Column) -> Column:
    """2-D Morton key: ``a``'s bits on even positions, ``b``'s on odd.
    Equal-range key intervals correspond to nested quads of (a, b)
    space — the property range-partitioned writes turn into two-sided
    min/max pruning."""
    return spread_bits(a).bitwiseOR(F.shiftleft(spread_bits(b), 1))


def spread_bits_py(v: int) -> int:
    """Pure-Python mirror of `spread_bits` (tests + planning code)."""
    x = v & DIM_MASK
    for shift, mask in SPREAD2_STEPS:
        x = (x | (x << shift)) & mask
    return x


def zorder_key_py(a: int, b: int) -> int:
    return spread_bits_py(a) | (spread_bits_py(b) << 1)


def zorder_write(
    df: DataFrame,
    path: str,
    dim_a: Column,
    dim_b: Column,
    n_files: int = 200,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` clustered on the 2-D Morton key: range-partition into
    ``n_files`` contiguous key intervals, sort within each, write one
    file per partition. Every output file then covers a nested-quad
    region of (dim_a, dim_b) space, so its footer min/max stats are
    tight on BOTH dimensions — a two-sided box predicate prunes row
    groups/files the way an Iceberg `zorder by` table does (pruning
    evidenced from real parquet footers in tests/test_layout.py).

    The key column itself is dropped from the output (it is a layout
    artifact, reconstructible from the dims). repartitionByRange samples
    to pick its bounds, so FILE BOUNDARIES are not bit-reproducible
    across runs — the row DATA is; never hash file layouts in oracles.
    """
    (
        df.withColumn("_zkey", zorder_key(dim_a, dim_b))
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.format(fmt)
        .mode("overwrite")
        .save(path)
    )
