"""Z-order layout keys (operators/layout.py): interleave correctness,
curve locality, clamping, plan purity."""

from __future__ import annotations

from pyspark.sql import functions as F


def _interleave_naive(a: int, b: int) -> int:
    out = 0
    for i in range(31):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_python_mirror_matches_naive_interleave():
    from textractssmlprocessor_spark.operators.layout import zorder_key_py

    vals = [0, 1, 2, 3, 7, 8, 255, 256, 1023, 65535, 2**31 - 1]
    for a in vals:
        for b in vals:
            assert zorder_key_py(a, b) == _interleave_naive(a, b), (a, b)


def test_spark_column_matches_python_mirror(spark):
    from textractssmlprocessor_spark.operators.layout import (
        zorder_key,
        zorder_key_py,
    )

    rows = [(a, b) for a in (0, 5, 1023, 2**31 - 1) for b in (0, 9, 4095)]
    df = spark.createDataFrame(rows, "a bigint, b bigint")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }
    assert got == {(a, b): zorder_key_py(a, b) for a, b in rows}


def test_clamps_to_31_bits_and_never_negative(spark):
    from textractssmlprocessor_spark.operators.layout import zorder_key_py

    # bit 31 and above are dropped, so the key never sets the sign bit
    assert zorder_key_py(2**31, 0) == 0
    assert zorder_key_py(2**32 - 1, 2**32 - 1) == zorder_key_py(
        2**31 - 1, 2**31 - 1
    )
    assert zorder_key_py(2**31 - 1, 2**31 - 1) > 0


def test_key_ranges_are_nested_quads(spark):
    # the locality property pruning relies on: each quadrant of an
    # aligned 2^k x 2^k cell occupies ONE contiguous quarter of the
    # cell's key interval
    from textractssmlprocessor_spark.operators.layout import zorder_key_py

    keys = sorted(
        (zorder_key_py(a, b), (a, b)) for a in range(8) for b in range(8)
    )
    # the first quarter of the 8x8 cell's interval is exactly the
    # low-low 4x4 quadrant
    first_quarter = {ab for _, ab in keys[:16]}
    assert first_quarter == {(a, b) for a in range(4) for b in range(4)}


def test_plan_is_pure_codegen(spark):
    from textractssmlprocessor_spark.operators.layout import zorder_key

    df = spark.range(100).select(
        F.col("id").alias("a"), (F.col("id") * 7 % 64).alias("b")
    )
    plan = (
        df.select(zorder_key(F.col("a"), F.col("b")).alias("z"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Exchange" not in plan


def test_zorder_write_enables_two_sided_rowgroup_pruning(spark, tmp_path):
    # evidence from REAL parquet footers: after zorder_write, a box
    # predicate on (a, b) excludes most row groups by min/max stats —
    # the same footers a row-order layout cannot prune at all
    import glob

    import pyarrow.parquet as pq

    from textractssmlprocessor_spark.operators.layout import zorder_write

    n = 1 << 14
    base = spark.range(n).select(
        (F.col("id") % 128).alias("a"),
        F.pmod((F.col("id") * 2654435761) % (2**31), F.lit(128)).alias("b"),
        F.col("id").alias("payload"),
    )
    zdir, rdir = str(tmp_path / "z"), str(tmp_path / "r")
    zorder_write(base, zdir, F.col("a"), F.col("b"), n_files=16)
    base.repartition(16).write.parquet(rdir)

    def survivors(d, a_lo, a_hi, b_lo, b_hi):
        total = kept = 0
        for f in sorted(glob.glob(f"{d}/part-*.parquet")):
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            ia, ib = names.index("a"), names.index("b")
            for g in range(md.num_row_groups):
                sa = md.row_group(g).column(ia).statistics
                sb = md.row_group(g).column(ib).statistics
                total += 1
                if not (
                    sa.max < a_lo
                    or sa.min > a_hi
                    or sb.max < b_lo
                    or sb.min > b_hi
                ):
                    kept += 1
        return kept, total

    zk, zt = survivors(zdir, 32, 47, 64, 79)
    rk, rt = survivors(rdir, 32, 47, 64, 79)
    # 16 files tile the 128x128 space in ~32x32 quads: a 16x16 box
    # touches at most 4 of them; the row-order layout prunes nothing
    assert zt >= 16 and zk <= 4, (zk, zt)
    assert rk == rt, (rk, rt)
    # and the data is identical either way
    assert (
        spark.read.parquet(zdir).agg(F.sum("payload")).first()[0]
        == spark.read.parquet(rdir).agg(F.sum("payload")).first()[0]
    )
