"""Streaming windowed aggregation + custom stateful operators.

Two Structured-Streaming surfaces over the transcript/observation
stream, complementing streaming/incremental.py's exactly-once ingest:

1. ``windowed_turn_counts`` — event-time windowed aggregation with a
   watermark: late turns inside the watermark still update their
   window; state for closed windows is dropped (bounded state — the
   streaming analogue of A4's per-period counts).
2. ``conversation_session_state`` — ``applyInPandasWithState``: a
   custom per-conversation stateful operator that accumulates turn
   count / first-last event time across micro-batches and emits the
   running session summary. With ``timeout_ms`` set, idle
   conversations are closed via processing-time timeout (bounded
   state at 10^12-turn scale: state lives only for active
   conversations); in drain mode (``Trigger.AvailableNow``) leave it
   unset — pending processing-time timeouts keep the drain alive with
   empty micro-batches until every key expires, which is
   non-deterministic wall-clock-coupled behavior.

Both run identically under ``Trigger.AvailableNow`` (cron drain) and
continuous micro-batching; tests drive them with a file source for
determinism.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def windowed_turn_counts(
    stream: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    key_col: str = "role",
) -> DataFrame:
    """Per-``key_col`` event counts in event-time windows with
    late-data tolerance = ``watermark``. Append-mode compatible
    (finalized windows emit once the watermark passes)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_turns",
        )
    )


SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_turns", T.LongType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
        T.StructField("closed", T.BooleanType()),
    ]
)


def _make_session_fn(timeout_ms: int | None):
    def _session_fn(
        key: Tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            n, first_ts, last_ts = state.get
            state.remove()
            yield pd.DataFrame(
                [{"conv_id": conv_id, "n_turns": n, "first_ts": first_ts,
                  "last_ts": last_ts, "closed": True}]
            )
            return
        n, first_ts, last_ts = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            lo, hi = pdf["ts"].min(), pdf["ts"].max()
            first_ts = lo if first_ts is None else min(first_ts, lo)
            last_ts = hi if last_ts is None else max(last_ts, hi)
        state.update((n, first_ts, last_ts))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)  # close idle conversations
        yield pd.DataFrame(
            [{"conv_id": conv_id, "n_turns": n, "first_ts": first_ts,
              "last_ts": last_ts, "closed": False}]
        )

    return _session_fn


def conversation_session_state(
    stream: DataFrame, timeout_ms: int | None = None
) -> DataFrame:
    """Running per-conversation session summaries via
    ``applyInPandasWithState`` (update mode). State is one small tuple
    per ACTIVE conversation. With ``timeout_ms``, idle conversations
    time out and emit a final ``closed`` row, so state size tracks
    concurrency, not history — use in continuous micro-batch mode
    only (see module docstring for the AvailableNow caveat)."""
    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        stream.select("conv_id", "ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_session_fn(timeout_ms),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout_conf,
        )
    )
