"""Streaming exact deduplication — emit each document the FIRST time its
content fingerprint appears on the stream, suppress every later copy.

The batch equivalent is operators.dedup.dedup_exact (min-id survivor per
fingerprint); the fingerprint expression is SHARED (textstats.fingerprint:
md5 over whitespace/case-normalized text) so stream and batch can never
disagree about what "identical content" means. On a stream, "first" is
arrival order: earliest micro-batch wins, lowest id within a batch breaks
ties deterministically — with all data in one trigger this is exactly the
batch survivor rule (the stream==batch equality test pins it).

State per distinct fingerprint is ONE boolean flag — the smallest possible
dedup state (bytes per distinct document; the fingerprint itself is the
state-store key). On an unbounded stream distinct-content cardinality grows
without limit, so ``ttl`` exposes the standard production trade: a
processing-time timeout evicts flags idle longer than the TTL, bounding the
store at the cost of re-admitting a duplicate that reappears after the
window (Bloom-filter-based dedupers make the same trade with false
positives instead; the reference has no streaming at all — SURVEY §2.8).

``dropDuplicates`` on the fingerprint column would give the keep-one
semantics but not the min-id tie-break nor the TTL knob in one place;
this operator also returns the survivor's id, which downstream joins use
to subset the corpus (the same (fingerprint, keep_id) shape as
dedup_exact).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DEDUP_OUT_SCHEMA = StructType(
    [
        StructField("fingerprint", StringType()),
        StructField("keep_id", LongType()),
    ]
)

_SEEN_SCHEMA = StructType([StructField("seen", BooleanType())])


def dedup_exact_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ttl: str | None = None,
) -> DataFrame:
    """Streaming side: (fingerprint, keep_id) rows, one per NEW distinct
    content fingerprint; repeats emit nothing. ``docs`` is a streaming
    DataFrame; ``ttl`` (e.g. "30 minutes") evicts idle flags via
    processing-time timeout — omit for exact dedup with unbounded state."""
    from textractssmlprocessor_spark.operators.textstats import fingerprint

    keyed = docs.select(
        fingerprint(F.col(text_col)).alias("fingerprint"),
        F.col(id_col).cast("long").alias("doc_id"),
    ).filter(F.col("fingerprint").isNotNull())

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl
        else GroupStateTimeout.NoTimeout
    )

    def dedup_fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # idle flag evicted; a late repeat re-admits
            return
        best = None
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf["doc_id"].min())
                best = m if best is None else min(best, m)
        if ttl:
            state.setTimeoutDuration(ttl)
        if state.exists or best is None:
            return  # repeat content (or an empty group invocation): drop
        state.update((True,))
        yield pd.DataFrame({"fingerprint": [key[0]], "keep_id": [best]})

    return keyed.groupBy("fingerprint").applyInPandasWithState(
        dedup_fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=_SEEN_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
