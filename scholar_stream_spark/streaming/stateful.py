"""Custom stateful streaming operators (SURVEY §2.6 'Spark-native
design' column — semantics the reference never had but a streaming
training-data pipeline needs).

Two patterns, deliberately contrasted:

- **Built-in first**: gap-based sessionization IS expressible with the
  native ``session_window`` aggregate + a watermark — so that's what
  ``streaming_session_agg`` uses. State management, late-data merging,
  and eviction are the state store's problem, not ours.
- **applyInPandasWithState only where built-ins can't**: emit-on-change
  (CDC-style suppress-repeats) needs "compare this row to the PREVIOUS
  row of the same key, across micro-batches" — no built-in streaming
  operator carries per-key last-row state forward. The custom operator
  keeps exactly one tiny tuple per key (bounded state: |users| × a few
  bytes) and its batch analog (``operators/temporal.change_filter``,
  one ``lag`` window) is oracle-checked; a parity test pins streaming
  output == batch output on ordered input.

Scale notes: both operators shuffle once on user_id (the state key).
The state store partitions by key hash — skewed users cost state-store
I/O, not memory blowup (one tuple per key either way). At 100 TB/day of
events the state for change-filter is |distinct users|, not |events|.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from scholar_stream_spark.operators.temporal import SESSION_GAP_SECONDS

#: Output schema of the change filter — identical to the batch analog.
CHANGE_FILTER_SCHEMA = (
    "event_id long, user_id long, ts timestamp, "
    "event_type string, prev_type string"
)

#: Per-key state: the type of the key's latest event seen so far.
CHANGE_FILTER_STATE_SCHEMA = "last_type string"


def streaming_session_agg(
    events_stream: DataFrame,
    gap_seconds: int = SESSION_GAP_SECONDS,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Native streaming sessionization: ``session_window`` + watermark.

    A session closes (and emits, in append mode) once the event-time
    watermark passes its end; late events within ``watermark_delay``
    merge into — or bridge — existing sessions, which the batch
    lag/running-sum formulation (``operators/temporal.sessionize``)
    cannot do incrementally.

    Output shape matches the batch sessionizer except ``session_end``:
    the native window's end is ``last_event + gap`` by definition, so
    we also emit ``last_event_ts`` for exact batch parity.
    """
    sw = F.session_window(F.col("ts"), f"{gap_seconds} seconds")
    return (
        events_stream.withWatermark("ts", watermark_delay)
        .groupBy(sw.alias("sw"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("last_event_ts"),
        )
        .select(
            "user_id",
            "session_start",
            "last_event_ts",
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def _change_filter_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-key micro-batch handler: emit rows whose event_type differs
    from the key's previous event; carry the last type across batches.

    Rows inside a batch are sorted by (ts, event_id) — the same total
    order as the batch analog's lag window — so streaming == batch on
    in-order input. Cross-batch reordering (an event arriving after a
    later-ts event was already processed) is a documented divergence of
    any online change detector.
    """
    last_type: Any = state.get[0] if state.exists else None
    for pdf in pdfs:
        if pdf.empty:
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        keep_rows = []
        for row in pdf.itertuples(index=False):
            if last_type is None or row.event_type != last_type:
                keep_rows.append(
                    (row.event_id, row.user_id, row.ts, row.event_type, last_type)
                )
            last_type = row.event_type
        if keep_rows:
            yield pd.DataFrame(
                keep_rows,
                columns=["event_id", "user_id", "ts", "event_type", "prev_type"],
            )
    state.update((last_type,))


def stateful_change_filter(events_stream: DataFrame) -> DataFrame:
    """Streaming emit-on-change per user via ``applyInPandasWithState``.

    State is ONE tuple per user (the last seen event_type) — bounded by
    key cardinality, not stream length. ``NoTimeout``: a user's state
    is a few bytes and suppressing repeats after any idle gap is the
    desired semantics; swap to ``EventTimeTimeout`` + a TTL update for
    keyspaces that grow without bound (e.g. session-scoped keys).
    """
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _change_filter_fn,
        outputStructType=CHANGE_FILTER_SCHEMA,
        stateStructType=CHANGE_FILTER_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
