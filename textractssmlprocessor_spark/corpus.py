"""Deterministic synthetic web-page corpus (url, warc_ts, html, text, lang).

Two generators, both seed-free/deterministic (pure functions of row ids):

- ``pages_from_documents``: derives pages from the driver-provided
  ``documents.parquet`` (doc_id, text, lang, source, n_chars), decorating a
  deterministic subset with the FIXTURES.md case classes (HTML wrappers,
  [Note:] blocks, ALL-CAPS headers, entities) so every reference code path is
  exercised on real table data.

- ``synthesize_pages``: pure ``spark.range``-based generator that scales to
  millions of rows JVM-side (no driver loops, no Python), with a skew tail —
  a configurable fraction of documents is ~100x median length and clustered
  on few hosts — to exercise salted repartitioning exactly as a 100 TB
  Common-Crawl slice would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_EPOCH = "2024-01-01 00:00:00"

_SENTENCE_BANK = [
    "The quick brown fox jumps over the lazy dog.",
    "Arma virumque cano Troiae qui primus ab oris.",
    "Data pipelines must scale without rewriting logic.",
    "He said that the chapter would end soon.",
    "Multi word sentences keep the chunker honest.",
    "Numbers like 42 and dates like 1066 appear here.",
    "A short one.",
    "Spark executes columnar batches over arrow buffers.",
]


def _decorate(text_col, doc_id_col):
    """Deterministically wrap a document in one of the fixture case classes,
    selected by doc_id % 8 (pure column expressions, JVM-side)."""
    case = doc_id_col % 8
    title = F.concat(F.lit("Section "), (doc_id_col % 97).cast("string"))
    return (
        F.when(
            case == 0,  # h4 title + paragraphs (HTML path, long em + strong)
            F.concat(
                F.lit("<h4>"), title, F.lit("</h4><p>"), text_col,
                F.lit("</p><em>"), F.substring(text_col, 1, 120),
                F.lit("</em><strong>Attribution</strong>"),
            ),
        )
        .when(
            case == 1,  # short em, strong deleted (HTML path)
            F.concat(
                F.lit("<p>"), text_col, F.lit("</p><em>brief quote</em>"),
                F.lit("<strong>dropped cite</strong><p>tail text.</p>"),
            ),
        )
        .when(
            case == 2,  # ALL-CAPS headers interleaved (plain-text path)
            F.concat(
                F.lit("CHAPTER HEADING\n"), text_col,
                F.lit("\nTHE RUNNING HEAD\nfinal line."),
            ),
        )
        .when(
            case == 3,  # [Note:] blocks incl. nesting
            F.concat(
                F.lit("intro [Note: drop [nested [deep]]] "), text_col,
                F.lit(" outro [stray bracket]"),
            ),
        )
        .when(
            case == 4,  # entities (HTML path so unescape round-trips)
            F.concat(
                F.lit("<p>Fish &amp; chips &#8217; "), text_col, F.lit("</p>"),
            ),
        )
        .otherwise(text_col)
    )


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the pages table from the driver's documents.parquet."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    decorated = _decorate(F.col("text"), F.col("doc_id"))
    is_html_case = (F.col("doc_id") % 8).isin(0, 1, 4)
    return docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.org/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        (
            F.to_timestamp(F.lit(WARC_EPOCH))
            + F.make_interval(secs=F.col("doc_id").cast("double"))
        ).alias("warc_ts"),
        F.when(is_html_case, F.encode(decorated, "UTF-8")).alias("html"),
        F.when(~is_html_case, decorated).alias("text"),
        F.col("lang"),
    )


def synthesize_pages(
    spark: SparkSession,
    n_docs: int,
    skew_fraction: float = 0.01,
    skew_multiplier: int = 64,
    n_hosts: int = 1000,
    sentences_per_doc: int = 24,
) -> DataFrame:
    """Scalable deterministic corpus: body text is a repeated rotation of the
    sentence bank (default ~1.5 KB/doc — a realistic Common-Crawl main-text
    size); ``skew_fraction`` of docs are ``skew_multiplier``x longer and all
    live on host 0 (host-level skew, the north-rule scenario)."""
    bank = F.array(*[F.lit(s) for s in _SENTENCE_BANK])
    base = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    is_skewed = (F.col("doc_id") % int(1 / skew_fraction)) == 0
    reps = F.when(
        is_skewed, F.lit(sentences_per_doc * skew_multiplier)
    ).otherwise(F.lit(sentences_per_doc))
    host = F.when(is_skewed, F.lit(0)).otherwise(F.col("doc_id") % n_hosts)
    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), reps - 1),
            lambda i: F.element_at(bank, ((i + F.col("doc_id")) % 8 + 1).cast("int")),
        ),
    )
    decorated = _decorate(body, F.col("doc_id"))
    is_html_case = (F.col("doc_id") % 8).isin(0, 1, 4)
    return base.select(
        F.concat(
            F.lit("https://host-"), host.cast("string"),
            F.lit(".example.org/page/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        (
            F.to_timestamp(F.lit(WARC_EPOCH))
            + F.make_interval(secs=(F.col("doc_id") % 86400).cast("double"))
        ).alias("warc_ts"),
        F.when(is_html_case, F.encode(decorated, "UTF-8")).alias("html"),
        F.when(~is_html_case, decorated).alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("la"), F.lit("en"), F.lit("de")),
            (F.col("doc_id") % 4 + 1).cast("int"),
        ).alias("lang"),
    )
