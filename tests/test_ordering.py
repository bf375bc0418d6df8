"""Blocked global-ordering primitives vs the single-task global window:
bit-identical results for every block geometry — multi-row blocks, size-1
blocks, gaps in the key space (missing blocks), nulls in the value column,
and a block size larger than the corpus (degenerate single block)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from textractssmlprocessor_spark.operators.ordering import (
    block_of,
    blocked_lag_lead,
    blocked_row_number,
    blocked_running_sum,
)


@pytest.fixture(scope="module")
def data(spark):
    # deterministic irregular key space: gaps, dense runs, a null value
    rows = [
        (k, f"v{k}" if k % 7 != 0 else None, (k * 13) % 97)
        for k in [0, 1, 2, 3, 9, 10, 11, 40, 41, 42, 43, 44, 45, 120, 500, 501]
    ]
    return spark.createDataFrame(rows, "id long, s string, x long").cache()


@pytest.mark.parametrize("block_size", [1, 4, 1000])
def test_blocked_row_number_matches_global(spark, data, block_size):
    w = Window.orderBy("id")
    expected = {
        r["id"]: r["rn"]
        for r in data.select(
            "id", F.row_number().over(w).cast("bigint").alias("rn")
        ).collect()
    }
    got = {
        r["id"]: r["rn"]
        for r in blocked_row_number(
            data, block_of("id", block_size), ["id"]
        ).collect()
    }
    assert got == expected


@pytest.mark.parametrize("block_size", [1, 4, 1000])
def test_blocked_running_sum_matches_global(spark, data, block_size):
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    expected = {
        r["id"]: r["run"]
        for r in data.select("id", F.sum("x").over(w).alias("run")).collect()
    }
    got = {
        r["id"]: r["running"]
        for r in blocked_running_sum(
            data, block_of("id", block_size), ["id"], "x"
        ).collect()
    }
    assert got == expected


@pytest.mark.parametrize("block_size", [1, 4, 1000])
def test_blocked_lag_lead_matches_global(spark, data, block_size):
    w = Window.orderBy("id")
    expected = {
        r["id"]: (r["p"], r["n"])
        for r in data.select(
            "id", F.lag("s").over(w).alias("p"), F.lead("s").over(w).alias("n")
        ).collect()
    }
    got = {
        r["id"]: (r["prev"], r["next"])
        for r in blocked_lag_lead(
            data, block_of("id", block_size), ["id"], "s"
        ).collect()
    }
    assert got == expected
