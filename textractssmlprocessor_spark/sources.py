"""Pages-table source abstraction: Iceberg catalog table or parquet path.

The north rule's production input is an Iceberg table of Common-Crawl-style
pages (url, warc_ts, html, text, lang) with hidden partitioning on
days(warc_ts)/bucket(url) — partition pruning and column pruning then happen
inside the Iceberg scan (SURVEY.md §4). This sandbox has no Iceberg runtime
jar, so the local path is parquet with identical schema; the format seam is
this one function, and everything downstream (extract, lineage, streaming)
is source-agnostic DataFrame code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .schema import PAGES_SCHEMA

PAGES_COLUMNS = [f.name for f in PAGES_SCHEMA.fields]


def read_pages(
    spark: SparkSession, source: str, format: str | None = None
) -> DataFrame:
    """Load the pages table.

    ``format``: "iceberg" (catalog table name), "parquet" (path), or None to
    infer — a source containing a path separator reads as parquet, otherwise
    as an Iceberg table identifier. Column pruning to the pages schema is
    applied so accidental extra columns never flow downstream.
    """
    fmt = format or (
        "parquet" if "/" in source or source.endswith(".parquet") else "iceberg"
    )
    if fmt == "iceberg":
        df = spark.read.format("iceberg").load(source)
    elif fmt == "parquet":
        df = spark.read.parquet(source)
    else:
        raise ValueError(f"unsupported pages source format: {fmt!r}")
    missing = [c for c in PAGES_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(
            f"pages source {source!r} is missing columns {missing}; "
            f"expected {PAGES_COLUMNS}"
        )
    return df.select(*PAGES_COLUMNS)


def write_pages_output(
    chunks: DataFrame, target: str, format: str | None = None
) -> None:
    """Write the extraction output table (url, chunk_number, extracted_text,
    ssml, spans). Iceberg targets get an overwritePartitions-style dynamic
    overwrite (idempotent reruns); parquet targets partition by url bucket
    via the lineage module instead (lineage.run_with_lineage)."""
    fmt = format or (
        "parquet" if "/" in target or target.endswith(".parquet") else "iceberg"
    )
    if fmt == "iceberg":
        chunks.writeTo(target).overwritePartitions()
    elif fmt == "parquet":
        chunks.write.mode("overwrite").parquet(target)
    else:
        raise ValueError(f"unsupported output format: {fmt!r}")
