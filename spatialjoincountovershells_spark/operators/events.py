"""Event-log sessionization — split each user's event stream into
sessions at inactivity gaps and aggregate per-session stats.

Part of the training-data / analytics pipeline surface (the reference
engine has no event-log operators; this extends the engine the same
way the dedup/corpus modules do).  The classic formulation: order a
user's events by time, start a new session whenever the gap to the
previous event exceeds `gap_s`, number sessions per user by a running
sum of the new-session flags, then aggregate.

Numerics contract: timestamps are compared in exact integer
MICROSECONDS (`unix_micros` / DuckDB `epoch_us`) — no float time
arithmetic anywhere; the event `value` column is per-event quantized
floor(value * 1024) BEFORE summing so the session sum is an exact
int64 independent of addition order (float sums are order-dependent
and would break the oracle hash).

Scale shape: ONE shuffle on the user key serves both the lag/cumsum
windows and (as a prefix of its grouping key) the final aggregation;
nothing global, no collect.  Per-user state is a sequential scan of
that user's events — the inherent shape of sessionization; a
pathological power-user key is bounded by one partition's worth of
rows, the same skew exposure as any per-entity window (AQE skew
handling does not apply to windows; if a single entity's history
outgrows an executor, pre-split by time range first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

VALUE_QUANT = 1024.0


def sessionize(
    events: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """-> one row per (user, session): (user_id, session_ord 1-based,
    n_events, n_types distinct event types, start_us epoch-µs,
    dur_us last-first, value_q10 sum of floor(value*1024)).

    Ordering within a user is (ts, event_id) — the id tiebreak makes
    the session split deterministic under equal timestamps."""
    gap_us = int(gap_s) * 1_000_000
    e = events.select(
        F.col(user_col).alias("user_id"),
        # cast handles TIMESTAMP_NTZ parquet columns (interpreted in the
        # session tz, which sjcs sessions pin to UTC — matching DuckDB's
        # epoch_us treatment of naive timestamps)
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        F.col(id_col).alias("_eid"),
        F.col(type_col).alias("_etype"),
        F.floor(F.col(value_col) * F.lit(VALUE_QUANT))
        .cast("long")
        .alias("_vq"),
    )
    w = Window.partitionBy("user_id").orderBy("_us", "_eid")
    prev = F.lag("_us").over(w)
    # two selects: window functions can't nest (flag, then its cumsum)
    flagged = e.select(
        "user_id", "_us", "_eid", "_etype", "_vq",
        (prev.isNull() | (F.col("_us") - prev > F.lit(gap_us)))
        .cast("long")
        .alias("_new_s"),
    )
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    s = flagged.select(
        "user_id", "_us", "_etype", "_vq",
        F.sum("_new_s").over(run).alias("session_ord"),
    )
    return s.groupBy("user_id", "session_ord").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("_etype").alias("n_types"),
        F.min("_us").alias("start_us"),
        (F.max("_us") - F.min("_us")).alias("dur_us"),
        F.sum("_vq").alias("value_q10"),
    )
