"""Gap-based event sessionization — custom stateful streaming operator.

The reference has no streaming (SURVEY §2.8); this is a training-pipeline
operator the brief asks for: per-user sessions over an event stream, where a
session closes once no event arrives within ``gap`` of the previous one.

Two equivalent forms:

- ``sessionize_events_batch``: native windows — lag over (user_id, ts) to
  mark gap breaks, running sum to number sessions, groupBy to aggregate.
  Fully Catalyst-planned (one shuffle on user_id; partial aggs map-side);
  this form is the DuckDB-oracle-checked query.
- ``sessionize_events_stream``: ``applyInPandasWithState`` with event-time
  timeout. State per user buffers the raw (ts, value) events that are not
  yet part of a provably-closed session; a session flushes exactly when the
  watermark passes ``session_end + gap`` (no in-order arrival can be
  assumed in a stream — an event arriving late-but-within-watermark may
  fall between, or before, buffered sessions, so sessions are re-derived
  from the buffer each batch). Rows older than the current watermark are
  dropped (the standard lateness contract). State is bounded per user by
  the events inside the (watermark - gap, ∞) horizon — at 10^9 users the
  state store holds active users' recent events only, never full history.

Both use the same break rule: an event extends the session iff
``ts - prev_ts <= gap`` (strict > breaks); stream == batch exactly for
every event that arrives within the watermark delay.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

# buffered not-yet-closed events: timestamps as int64 microseconds (exact;
# doubles lose sub-microsecond bits at 2024 epochs)
_STATE_SCHEMA = StructType(
    [
        StructField("ts_us", ArrayType(LongType())),
        StructField("values", ArrayType(DoubleType())),
    ]
)


def sessionize_events_batch(events: DataFrame, gap_seconds: float = 1800.0) -> DataFrame:
    """(user_id, session_start, session_end, n_events, sum_value), one row
    per gap-delimited session. Order within a user is (ts, event_id) so ties
    are deterministic. NULL-ts rows are dropped (not sessionizable; the
    streaming form does the same)."""
    events = events.filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact µs via NTZ-to-NTZ timestampdiff: no float drift, and no
    # session-timezone dependence (unix_micros(cast) would shear by the
    # session offset on non-UTC drivers; DuckDB's epoch_us is tz-free)
    t = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', "
        "cast(ts as timestamp_ntz))"
    )
    gap_us = int(gap_seconds * 1_000_000)
    is_break = (
        F.when(t - F.lag(t).over(w) <= F.lit(gap_us), F.lit(0))
        .otherwise(F.lit(1))  # first event (lag NULL) also starts a session
    )
    sess = events.withColumn(
        "session_no", F.sum(is_break).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            # coalesce: an all-NULL-value session sums to 0, matching the
            # streaming form's fillna(0) (plain F.sum would return NULL)
            F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 6).alias("sum_value"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "sum_value")
    )


def _split_sessions(
    ts_us: list, values: list, gap_us: int
) -> list[Tuple[int, int, int, float]]:
    """Greedy gap split over (sorted) event times: list of
    (start_us, end_us, n, sum) session tuples."""
    out = []
    start = end = ts_us[0]
    n, total = 1, values[0]
    for t, v in zip(ts_us[1:], values[1:]):
        if t - end <= gap_us:
            end, n, total = t, n + 1, total + v
        else:
            out.append((start, end, n, total))
            start = end = t
            n, total = 1, v
    out.append((start, end, n, total))
    return out


def sessionize_events_stream(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization with bounded per-user state.

    Emits a session row when the event-time timeout fires or a batch shows
    the watermark passed ``session_end + gap``. Input needs
    (ts timestamp, user_id long, value double). Rows with NULL ts are not
    sessionizable and are dropped (matching nothing in the batch form,
    which orders by ts — callers should filter them identically); NULL
    values count as events with value 0, matching ``F.sum``'s
    null-skipping in the batch aggregation.

    Requires ``spark.sql.session.timeZone=UTC``: Arrow hands the UDF
    tz-naive session-local timestamps while ``getCurrentWatermarkMs`` is
    UTC epoch, so any other session timezone would shear the lateness and
    timeout arithmetic by the UTC offset. Asserted at build time rather
    than silently corrupting sessions.

    Engine limitation (observed on Spark 4.1): the streaming watermark
    floors at epoch 0 and Spark evicts sub-watermark rows before they
    reach the state function, so events with pre-1970 timestamps never
    enter any session here (the batch form handles them fine).
    """
    tz = events_stream.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00"):
        raise ValueError(
            f"sessionize_events_stream requires spark.sql.session.timeZone=UTC "
            f"(got {tz!r}): pandas receives session-local naive timestamps but "
            f"watermark/timeout timestamps are UTC epoch"
        )
    gap_us = int(pd.Timedelta(gap).total_seconds() * 1_000_000)

    def fn(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        wm_us = state.getCurrentWatermarkMs() * 1000

        buf: list[Tuple[int, float]] = []
        if state.exists:
            # buffered events of still-open sessions are NEVER late, even
            # once their ts falls behind the advancing watermark
            ts_list, val_list = state.get
            buf.extend(zip(ts_list, val_list))
        for pdf in pdfs:
            pdf = pdf[pdf["ts"].notna()]  # NULL ts: not sessionizable
            if len(pdf):
                ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
                vals = pdf["value"].fillna(0.0).tolist()  # like F.sum(null)
                # lateness contract: incoming rows older than the watermark
                # are dropped (they could belong to a flushed session);
                # wm_us == 0 means "no watermark yet" (Spark's sentinel),
                # not the 1970 epoch — nothing is late then
                buf.extend(
                    e for e in zip(ts_us, vals) if wm_us == 0 or e[0] >= wm_us
                )
        if not buf:
            if state.exists:
                state.remove()
            return

        buf.sort()
        sessions = _split_sessions(
            [e[0] for e in buf], [e[1] for e in buf], gap_us
        )
        # a session is final once no within-watermark event can extend it:
        # every future row has ts >= watermark, so end + gap < watermark
        # seals it (never before the first real watermark: wm_us == 0 is
        # the no-watermark sentinel, and pre-1970 sessions must not flush)
        closed = [s for s in sessions if wm_us > 0 and s[1] + gap_us < wm_us]
        open_sessions = sessions[len(closed):]
        if open_sessions:
            keep_from = open_sessions[0][0]  # first still-open session start
            kept = [e for e in buf if e[0] >= keep_from]
            state.update(([e[0] for e in kept], [e[1] for e in kept]))
            # earliest possible flush: first open session's end + gap
            # (clamped past the watermark — Spark rejects stale timeouts)
            state.setTimeoutTimestamp(
                max(
                    open_sessions[0][1] // 1000 + gap_us // 1000,
                    wm_us // 1000 + 1,
                )
            )
        else:
            state.remove()
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "session_start": pd.to_datetime([c[0] for c in closed], unit="us"),
                    "session_end": pd.to_datetime([c[1] for c in closed], unit="us"),
                    "n_events": [c[2] for c in closed],
                    "sum_value": [round(c[3], 6) for c in closed],
                }
            )

    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.col("user_id"))
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
