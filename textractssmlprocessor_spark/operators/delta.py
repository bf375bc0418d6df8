"""Incremental crawl processing: snapshot-to-snapshot deltas and
dedup-against-history.

A recurring crawl does not reprocess 10^12 documents per pass — it diffs
the new snapshot against the previous one and routes only added/changed
pages into the (expensive) extraction and dedup stages. Both operators are
single-join compositions: on an Iceberg layout bucketed by url (SURVEY
§4), the joins are co-partitioned storage joins with no shuffle; elsewhere
they are one AQE-planned shuffle join on a near-unique key (no skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import fingerprint


def crawl_delta(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Per-url status between two crawl snapshots: ``added`` (url only in
    new), ``removed`` (only in old), ``changed`` (present in both, content
    fingerprint differs), ``unchanged``. Returns (key, old_fp, new_fp,
    status). Content equality is the same whitespace/case-normalized md5
    used by exact dedup, so "changed" means the text a model would train
    on changed — not that a byte of markup moved."""
    o = old.select(
        F.col(key_col).alias("k"), fingerprint(F.col(text_col)).alias("old_fp")
    )
    n = new.select(
        F.col(key_col).alias("k"), fingerprint(F.col(text_col)).alias("new_fp")
    )
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        o.join(n, "k", "full_outer")
        .select(
            F.col("k").alias(key_col),
            "old_fp",
            "new_fp",
            status.alias("status"),
        )
    )


def new_against_history(
    new: DataFrame,
    seen_fingerprints: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Documents of the new snapshot whose content fingerprint has never
    been seen before — the incremental-dedup gate that keeps a recurring
    crawl from re-admitting content retired in an earlier pass.
    ``seen_fingerprints`` is a 1-column (fingerprint) table (e.g. the
    accumulated output of dedup_exact across prior passes). One left_anti
    join on the fingerprint; the history side is a narrow table that
    Iceberg bucket-layout co-partitions with the new snapshot's
    fingerprint column at scale."""
    fingerprinted = new.withColumn("fingerprint", fingerprint(F.col(text_col)))
    return fingerprinted.join(
        seen_fingerprints.select("fingerprint").distinct(),
        "fingerprint",
        "left_anti",
    )
