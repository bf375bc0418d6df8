"""Streaming sink into a snapshot-committed table (exactly-once appends).

``extract_stream``'s partition-overwrite pattern makes a REPLAYED batch
rewrite its own output dir — correct, but readers that list the output
mid-rewrite see a partial batch, and nothing ties the landed files into
the versioned table contract the batch pipeline publishes through
(snapshots.py). This sink closes that seam: each micro-batch commits
through ``snapshots.commit`` with a snapshot_id derived from the
STREAMING BATCH ID, so

- a replayed batch (foreachBatch is at-least-once; Spark's streaming
  checkpoint replays the last in-flight batch after a crash) finds its
  snapshot_id already published and is a no-op — the at-least-once
  delivery collapses to exactly-once at the table, the same trick the
  batch side uses for job re-runs;
- readers only ever see ATOMIC versions (a manifest publish is one
  O(1) rename), never a half-written batch directory;
- downstream incremental consumers diff table versions
  (``snapshots.history``) instead of scanning for new files.

The crashed-attempt leftovers are ordinary snapshot orphans
(``snapshots.orphan_dirs``) — GC them with the table's normal orphan
sweep, not a sink-specific one.

Scale: the sink adds ZERO extra shuffle — whatever plan the transform
gives the batch lands as-is via df.write.parquet inside commit(); the
manifest write is O(live files) JSON on the driver, the same bound the
batch pipeline already accepts (compact past ~10^6 files — see
snapshots.commit).

Reference seam: the reference app appends Textract output files to a
directory and re-lists it per request (app.py's upload/refresh cycle);
this is that directory's scale-honest replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from .. import snapshots


def batch_snapshot_id(prefix: str, batch_id: int) -> str:
    """Deterministic per-batch idempotency key. The streaming checkpoint
    guarantees batch ids are assigned once and replayed verbatim, so the
    (prefix, batch_id) pair is stable across restarts — exactly what
    commit() needs to dedup a replay.

    ``prefix`` is REQUIRED and must be unique per (query, checkpoint)
    writing into the table: batch ids restart at 0 for every new
    checkpoint, so a second query (or a rerun after deleting the
    checkpoint) reusing a prefix would collide with the first query's
    committed ids and have its batches silently dropped as replays.
    Name it after the checkpoint (e.g. the checkpoint dir's basename)."""
    return "%s-b%012d" % (prefix, batch_id)


def snapshot_sink_body(table: str, prefix: str):
    """The importable/unit-testable foreachBatch body: commit the batch
    DataFrame into ``table`` as an append snapshot keyed by batch id.
    See ``batch_snapshot_id`` for the prefix-uniqueness contract."""

    def body(batch_df: DataFrame, batch_id: int) -> None:
        snapshots.commit(
            batch_df, table, batch_snapshot_id(prefix, batch_id), mode="append"
        )

    return body


def stream_to_snapshots(
    stream_df: DataFrame,
    table: str,
    checkpoint_path: str,
    prefix: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Wire a (possibly transformed) streaming DataFrame into a
    snapshot-committed table. ``prefix`` must be unique per
    (query, checkpoint) on this table — see ``batch_snapshot_id``.
    ``available_now=True`` drains everything currently available and
    stops — the incremental-batch-job mode; pass False for a continuous
    micro-batch query."""
    writer = (
        stream_df.writeStream.foreachBatch(snapshot_sink_body(table, prefix))
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
