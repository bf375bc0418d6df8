"""Count-Min sketch (operators/sketch.py): upper-biased estimates,
exactness without collisions, cell-wise mergeability, plan shape."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog ate the cat food"),
    (3, "cat cat cat dog"),
    (4, None),
]


def _exact_counts() -> Counter:
    c: Counter = Counter()
    for _, t in DOCS:
        c.update((t or "").lower().split())
    return c


def _probes(spark, words):
    return spark.createDataFrame([(w,) for w in words], "probe string")


def test_estimates_never_undercount_even_under_collisions(spark):
    from textractssmlprocessor_spark.operators.sketch import (
        count_min_cells,
        count_min_estimate,
    )

    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    exact = _exact_counts()
    # width 4 forces collisions on an 8-word vocabulary
    cells = count_min_cells(df, depth=3, width=4)
    est = {
        r["probe"]: r["cms_est"]
        for r in count_min_estimate(
            cells, _probes(spark, list(exact)), depth=3, width=4
        ).collect()
    }
    assert all(est[w] >= exact[w] for w in exact), (est, exact)


def test_estimates_exact_without_collisions_and_zero_for_unseen(spark):
    from textractssmlprocessor_spark.operators.sketch import (
        count_min_cells,
        count_min_estimate,
    )

    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    exact = _exact_counts()
    cells = count_min_cells(df, depth=4, width=4096)
    est = {
        r["probe"]: r["cms_est"]
        for r in count_min_estimate(
            cells,
            _probes(spark, list(exact) + ["zebra"]),
            depth=4,
            width=4096,
        ).collect()
    }
    assert {w: est[w] for w in exact} == dict(exact)
    assert est["zebra"] == 0


def test_sketches_merge_by_cellwise_addition(spark):
    from textractssmlprocessor_spark.operators.sketch import count_min_cells

    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    whole = count_min_cells(df, depth=3, width=64)
    a = count_min_cells(df.filter("doc_id <= 2"), depth=3, width=64)
    b = count_min_cells(df.filter("doc_id > 2"), depth=3, width=64)
    merged = (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_plan_fixed_keyspace_agg_and_broadcast_probe_join(spark):
    from textractssmlprocessor_spark.operators.sketch import (
        count_min_cells,
        count_min_estimate,
    )

    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    cells = count_min_cells(df, depth=4, width=1024)
    plan = (
        count_min_estimate(cells, _probes(spark, ["cat"]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # the cells side reaches the probe join as a broadcast, and the cells
    # aggregation carries a map-side partial before its exchange
    assert "BroadcastHashJoin" in plan, plan
    assert "partial_count" in plan, plan


def test_count_min_cells_streams_in_complete_mode(spark, tmp_path):
    # the fixed d*w key space is what makes COMPLETE-mode streaming
    # aggregation viable at any corpus scale: state is <= depth*width
    # counters no matter how many documents arrive. Stream the same
    # docs in two files and require cell-exact equality with the batch
    # sketch (the stream==batch discipline of tests/test_streaming.py).
    from textractssmlprocessor_spark.operators.sketch import count_min_cells

    src = str(tmp_path / "docs")
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    df.filter("doc_id <= 2").write.parquet(src)
    df.filter("doc_id > 2").write.mode("append").parquet(src)

    stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
    q = (
        count_min_cells(stream, depth=3, width=64)
        .writeStream.format("memory")
        .queryName("cms_cells")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("SELECT * FROM cms_cells").collect()))
    want = sorted(map(tuple, count_min_cells(df, depth=3, width=64).collect()))
    assert got == want
