"""Scalable corpus-global ordering primitives.

``Window.orderBy(...)`` with no ``partitionBy`` funnels the entire corpus
through ONE task — correct at test scale, fatal at 10^12 rows. Every global
ordering the engine needs (global part counters, running duration sums,
prev/next navigation, global ranks — reference ssml_processing.py:91-110,
timestamp.py:252-281, app.py:119-125) decomposes the same way:

1. pick a BLOCK key that is a monotone coarsening of the leading sort key
   (e.g. ``floor(doc_id / 4096)``, or the key itself when low-cardinality);
2. compute the per-block quantity with a PARTITIONED window (parallel,
   shuffle on block — the only corpus-sized exchange);
3. reduce one row per block (count / sum / first / last — map-side partial
   aggs) and prefix-scan that tiny table with a single-task window over
   #blocks rows, not #rows;
4. join the offsets back (AQE broadcasts the block table while it is small).

The result is bit-identical to the single-task global window. The prefix
scan is over #blocks rows; with ``block_size`` 4096 a 10^12-row corpus has
~2.4*10^8 blocks — recurse the same construction once (blocks of blocks)
if that ever exceeds one task's comfort; at every realistic scale one level
suffices and the block table stays in the AQE broadcast range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BLOCK_SIZE = 4096

_G = "_ord_block"
_G2 = "_ord_block_r"


def _join_blocks(blocked: DataFrame, per_block: DataFrame) -> DataFrame:
    """Join the per-block table back NULL-SAFELY: a NULL block key (a NULL
    sort key, or a non-matching regexp_extract key) forms its own block and
    keeps its rows — a plain inner join would silently drop them, while the
    single-task global window these primitives are bit-identical with keeps
    NULLs (nulls-first under Spark's default ASC ordering, which is also
    where the prefix-scan windows here place the NULL block)."""
    right = per_block.withColumnRenamed(_G, _G2)
    return blocked.join(
        right, F.col(_G).eqNullSafe(F.col(_G2)), "inner"
    ).drop(_G2)


def block_of(order_col: Column | str, block_size: int = DEFAULT_BLOCK_SIZE) -> Column:
    """Monotone block key for a numeric global sort key."""
    c = F.col(order_col) if isinstance(order_col, str) else order_col
    return F.floor(c / F.lit(block_size)).cast("bigint")


def _with_block(df: DataFrame, block: Column | str) -> DataFrame:
    b = F.col(block) if isinstance(block, str) else block
    return df.withColumn(_G, b)


def _block_offsets(blocked: DataFrame, agg: Column) -> DataFrame:
    """One row per block with the exclusive prefix scan of ``agg`` in block
    order. Single-task window, but over #blocks rows only."""
    scan = Window.orderBy(_G).rowsBetween(Window.unboundedPreceding, -1)
    return (
        blocked.groupBy(_G)
        .agg(agg.alias("_blk"))
        .withColumn("_offset", F.coalesce(F.sum("_blk").over(scan), F.lit(0)))
        .select(_G, "_offset")
    )


def blocked_row_number(
    df: DataFrame,
    block: Column | str,
    within: list,
    out: str = "rn",
) -> DataFrame:
    """Global ``row_number() over (order by block, *within)`` without a
    global window: per-block row_number + exclusive cumulative block counts."""
    blocked = _with_block(df, block)
    w = Window.partitionBy(_G).orderBy(*within)
    offsets = _block_offsets(blocked, F.count(F.lit(1)))
    return (
        _join_blocks(blocked.withColumn("_rn_in", F.row_number().over(w)), offsets)
        .withColumn(out, (F.col("_offset") + F.col("_rn_in")).cast("bigint"))
        .drop(_G, "_rn_in", "_offset")
    )


def blocked_running_sum(
    df: DataFrame,
    block: Column | str,
    within: list,
    value_col: str,
    out: str = "running",
) -> DataFrame:
    """Global inclusive running sum over (block, *within) order. Exact for
    integral value columns; for doubles the add order matches a sequential
    left fold within each block (differences vs a strict global fold are the
    usual float-reassociation ulps)."""
    blocked = _with_block(df, block)
    w = Window.partitionBy(_G).orderBy(*within).rowsBetween(
        Window.unboundedPreceding, 0
    )
    offsets = _block_offsets(blocked, F.sum(value_col))
    return (
        _join_blocks(blocked.withColumn("_run_in", F.sum(value_col).over(w)), offsets)
        .withColumn(out, F.col("_offset") + F.col("_run_in"))
        .drop(_G, "_run_in", "_offset")
    )


def blocked_lag_lead(
    df: DataFrame,
    block: Column | str,
    within: list,
    value_col: str,
    prev_out: str = "prev",
    next_out: str = "next",
) -> DataFrame:
    """Global ``lag/lead(value_col) over (order by block, *within)``:
    within-block lag/lead, with block-boundary values (last of the previous
    block / first of the next) carried through the tiny block table."""
    blocked = _with_block(df, block)
    order_key = F.struct(*[F.col(c) if isinstance(c, str) else c for c in within])
    w = Window.partitionBy(_G).orderBy(*within)
    scan = Window.orderBy(_G)
    boundaries = (
        blocked.groupBy(_G)
        .agg(
            F.min_by(value_col, order_key).alias("_first"),
            F.max_by(value_col, order_key).alias("_last"),
        )
        .select(
            _G,
            F.lag("_last").over(scan).alias("_prev_last"),
            F.lead("_first").over(scan).alias("_next_first"),
        )
    )
    return (
        _join_blocks(
            blocked.withColumn("_lag_in", F.lag(value_col).over(w))
            .withColumn("_lead_in", F.lead(value_col).over(w))
            .withColumn("_rn", F.row_number().over(w))
            .withColumn("_cnt", F.count(F.lit(1)).over(Window.partitionBy(_G))),
            boundaries,
        )
        .withColumn(
            prev_out,
            F.when(F.col("_rn") == 1, F.col("_prev_last")).otherwise(F.col("_lag_in")),
        )
        .withColumn(
            next_out,
            F.when(F.col("_rn") == F.col("_cnt"), F.col("_next_first")).otherwise(
                F.col("_lead_in")
            ),
        )
        .drop(_G, "_lag_in", "_lead_in", "_rn", "_cnt", "_prev_last", "_next_first")
    )
