"""Streaming: micro-batch extraction equals the batch pipeline; watermarked
window agg equals the batch window agg; restart resumes exactly-once."""

from __future__ import annotations

from pyspark.sql import functions as F

from textractssmlprocessor_spark.corpus import pages_from_documents
from textractssmlprocessor_spark.operators.extract import extract_chunks
from textractssmlprocessor_spark.streaming.extract_stream import (
    extract_stream,
    stream_pages,
    windowed_event_counts,
)


def test_stream_extraction_matches_batch(spark, sf_dir, tmp_path):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    pages = pages_from_documents(spark, sf_dir)
    pages.write.mode("overwrite").parquet(landing)

    q = extract_stream(
        stream_pages(spark, landing), out, ckpt, num_partitions=8
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    expected = extract_chunks(spark.read.parquet(landing), num_partitions=8)
    assert got.count() == expected.count()
    # byte-identical content, order-insensitive
    key = lambda df: {  # noqa: E731
        (r["url"], r["chunk_number"]): (r["extracted_text"], r["ssml"])
        for r in df.collect()
    }
    assert key(got) == key(expected)

    # restart with the same checkpoint: no new data -> no duplicate output
    q2 = extract_stream(stream_pages(spark, landing), out, ckpt, num_partitions=8)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == expected.count()


def test_windowed_event_counts_matches_batch(spark, sf_dir, tmp_path):
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    # file stream source needs a directory of files
    events_dir = str(tmp_path / "events")
    batch.write.mode("overwrite").parquet(events_dir)
    batch = spark.read.parquet(events_dir)

    stream = spark.readStream.schema(batch.schema).parquet(events_dir)
    windowed = windowed_event_counts(stream, "1 hour", "2 hours")
    q = (
        windowed.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits windows the watermark has passed; every emitted
    # row must match the batch computation exactly
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in spark.sql("select * from win_counts").collect()
    }
    expected_df = (
        batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "s")
    )
    expected = {
        (r["ws"], r["event_type"]): (r["n"], round(r["s"], 6))
        for r in expected_df.collect()
    }
    assert got, "watermark emitted no windows"
    for k, v in got.items():
        assert expected[k] == v, k
