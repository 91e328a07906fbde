"""Streaming sessionization — the Structured-Streaming twin of
`operators/events.py:sessionize`, built on Spark's native
`session_window` (merging event-time session state, watermark-driven
eviction).

Semantics (pinned by `test_streaming_sessions.py`): Spark's session
window MERGES two events when their gap is <= gap (an event exactly at
prev + gap stays in the old session), i.e. it splits on diff > gap —
the SAME boundary contract as the batch operator's lag/cumsum split.
Session end is last event + gap (Spark's convention; the batch
operator reports duration = last - first instead).  Late data is
governed by the watermark: an event older than the current watermark
whose would-be session end has already been evicted starts a fresh
(wrong) session rather than merging — size `watermark` to the
stream's real disorder, as with any event-time stateful operator.
The native operator is the right call on an unbounded stream: state
is evicted by the watermark instead of growing per user forever, and
the same expression runs identically in batch mode — the equality
test drives both paths.

Scale shape: one shuffle on (user key) into the streaming session
state store; sink traffic is closed sessions only (append mode) or
touched sessions (update mode).  No distinct-count in the aggregate —
`countDistinct` is unsupported over streaming session windows; callers
needing type cardinality can add approx_count_distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.events import VALUE_QUANT


def stream_sessionize(
    events: DataFrame,
    gap_s: int = 1800,
    watermark: str = "0 seconds",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """streaming (user, ts, value) -> per-session aggregates keyed by
    the native merging session window.

    -> (user_id, start_us, end_us, n_events, value_q10) with start/end
    the session-window bounds in exact epoch-µs (end = last event +
    gap, Spark's convention), value_q10 the order-independent sum of
    per-event floor(value * 1024).

    Works identically on a batch DataFrame (no watermark applied then)
    — the stream==batch equality test drives both paths.
    """
    is_streaming = events.isStreaming
    e = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).cast("timestamp").alias("_ts"),
        F.floor(F.col(value_col) * F.lit(VALUE_QUANT))
        .cast("long")
        .alias("_vq"),
    )
    if is_streaming:
        e = e.withWatermark("_ts", watermark)
    win = F.session_window(F.col("_ts"), f"{int(gap_s)} seconds")
    return (
        e.groupBy(win.alias("_w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_vq").alias("value_q10"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("_w.start")).alias("start_us"),
            F.unix_micros(F.col("_w.end")).alias("end_us"),
            "n_events",
            "value_q10",
        )
    )
