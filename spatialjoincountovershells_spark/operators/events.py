"""Event-log analytics — sessionization, ordered conversion funnels,
and retention cohorts over a (user, ts, type, value) event stream.

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


def _events_us(
    events: DataFrame, user_col: str, ts_col: str, type_col: str
) -> DataFrame:
    """(user_id, _us epoch-µs, _etype) projection — the shared exact
    integer-time base of funnel/retention (TIMESTAMP_NTZ-safe, same
    UTC contract as sessionize)."""
    return events.select(
        F.col(user_col).alias("user_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        F.col(type_col).alias("_etype"),
    )


def event_pairs_within(
    events: DataFrame,
    left_type: str,
    right_type: str,
    window_s: int,
    direction: str = "after",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user temporal interval join — every (left_type, right_type)
    event pair within `window_s` of each other (the attribution /
    impression->conversion join).  direction="after": right event in
    [t_left, t_left + W]; direction="both": |dt| <= W.  Bounds are
    INCLUSIVE in exact integer µs; identical events (same id) never
    pair with themselves when left_type == right_type.

    -> (user_id, l_event_id, r_event_id, dt_us = t_right - t_left).

    Scale shape: the 1-D analog of the engine's spatial cell-ring join
    (`cells.explode_ring`) — time is bucketed at the window width, the
    LEFT side fans out to its bucket ring (3 buckets for "both", 2 for
    "after"), and the join is a plain (user, bucket) equi-join + an
    exact µs predicate.  Candidate volume is bounded by events per
    (user, 2-3 windows), never the full per-user history — a bare
    per-user theta-join would be quadratic in power users."""
    if direction not in ("after", "both"):
        raise ValueError("direction must be 'after' or 'both'")
    w_us = int(window_s) * 1_000_000
    if w_us <= 0:
        raise ValueError("window_s must be positive")
    e = events.select(
        F.col(user_col).alias("user_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        F.col(id_col).alias("_eid"),
        F.col(type_col).alias("_etype"),
    )
    offsets = [0, 1] if direction == "after" else [-1, 0, 1]
    lhs = (
        e.where(F.col("_etype") == left_type)
        .select(
            "user_id",
            F.col("_us").alias("_lus"),
            F.col("_eid").alias("l_event_id"),
            F.explode(F.array(*[F.lit(o) for o in offsets])).alias("_o"),
        )
        .select(
            "user_id", "_lus", "l_event_id",
            (F.floor(F.col("_lus") / F.lit(w_us)) + F.col("_o"))
            .alias("_bucket"),
        )
    )
    rhs = e.where(F.col("_etype") == right_type).select(
        "user_id",
        F.col("_us").alias("_rus"),
        F.col("_eid").alias("r_event_id"),
        F.floor(F.col("_us") / F.lit(w_us)).alias("_bucket"),
    )
    dt = F.col("_rus") - F.col("_lus")
    pred = (
        (dt >= 0) & (dt <= F.lit(w_us))
        if direction == "after"
        else (dt >= -F.lit(w_us)) & (dt <= F.lit(w_us))
    )
    j = lhs.join(rhs, ["user_id", "_bucket"]).where(pred)
    if left_type == right_type:
        j = j.where(F.col("l_event_id") != F.col("r_event_id"))
    return j.select(
        "user_id", "l_event_id", "r_event_id", dt.alias("dt_us")
    )


def funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: a user completes step k when they
    have a step-k event STRICTLY after their earliest completion of
    step k-1 (the classic strictly-increasing-timestamp funnel; equal
    timestamps do NOT advance the funnel — exact integer µs, so the
    contract is deterministic).

    -> one row per step: (step_idx int 0-based, step string,
    n_users long, conv_ppm long) with conv_ppm = (n_users * 10^6)
    integer-DIV step-0 users (exact; 1_000_000 for step 0 itself,
    0 everywhere when step 0 has no users).

    Scale shape: k per-user min-aggregations, each joined back on the
    user key — the per-step completion tables shrink monotonically and
    AQE broadcasts them once they fit; the event table is scanned once
    per step but never self-joined.  Final output is k 1-row aggs
    unioned (k rows total)."""
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    e = _events_us(events, user_col, ts_col, type_col).persist()
    completed = (
        e.where(F.col("_etype") == steps[0])
        .groupBy("user_id")
        .agg(F.min("_us").alias("_t"))
    )
    per_step = [completed]
    for st in steps[1:]:
        completed = (
            e.where(F.col("_etype") == st)
            .join(completed, "user_id")
            .where(F.col("_us") > F.col("_t"))
            .groupBy("user_id")
            .agg(F.min("_us").alias("_t"))
        )
        per_step.append(completed)
    counts = None
    for k, (st, df) in enumerate(zip(steps, per_step)):
        row = df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(k).cast("int").alias("step_idx"),
            F.lit(st).alias("step"),
            F.col("n_users").cast("long").alias("n_users"),
        )
        counts = row if counts is None else counts.unionByName(row)
    base = counts.where(F.col("step_idx") == 0).select(
        F.col("n_users").alias("_base")
    )
    return (
        counts.crossJoin(F.broadcast(base))
        .select(
            "step_idx", "step", "n_users",
            # integer DIV keeps the ratio exact (no f64 rounding)
            F.when(F.col("_base") > 0,
                   F.expr("(n_users * 1000000) DIV _base"))
            .otherwise(F.lit(0)).cast("long").alias("conv_ppm"),
        )
    )


def retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    cohort_type: str | None = None,
) -> DataFrame:
    """Retention cohorts: cohort a user by the UTC day of their first
    event (optionally first event of `cohort_type`, e.g. "signup"),
    then count distinct users active at each whole-day offset.

    -> (cohort_day long days-since-epoch, day_offset long >= 0,
    n_users long).  Day boundaries are exact integer floor-division of
    epoch-µs (no timezone/DST arithmetic — the same UTC contract as
    the rest of the module); users whose first `cohort_type` event
    postdates some of their activity contribute only offsets >= 0.

    Scale shape: one per-user min-aggregation + one join back on the
    user key + one (cohort, offset) aggregation; countDistinct adds
    one dedup shuffle (exact by contract — approx_count_distinct is
    the knob at 10^9 users, not the default)."""
    day_us = 86_400_000_000
    e = _events_us(events, user_col, ts_col, type_col)
    first_src = e if cohort_type is None else e.where(
        F.col("_etype") == cohort_type
    )
    first = first_src.groupBy("user_id").agg(
        F.floor(F.min("_us") / F.lit(day_us)).alias("cohort_day")
    )
    return (
        e.join(first, "user_id")
        .select(
            "user_id", "cohort_day",
            (F.floor(F.col("_us") / F.lit(day_us))
             - F.col("cohort_day")).alias("day_offset"),
        )
        .where(F.col("day_offset") >= 0)
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .select(
            F.col("cohort_day").cast("long").alias("cohort_day"),
            F.col("day_offset").cast("long").alias("day_offset"),
            F.col("n_users").cast("long").alias("n_users"),
        )
    )


def asof_join(
    events: DataFrame,
    left_type: str,
    right_type: str,
    tolerance_s: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user AS-OF join (kdb `aj` / pandas `merge_asof` backward /
    Flink temporal join): every `left_type` event matched to the
    LATEST `right_type` event of the same user at-or-before it ->
    (user_col, id_col, ts_us, match_id, match_ts_us, lag_us), the
    match columns -1 when nothing qualifies.

    Deterministic contract: match = the right event maximizing
    (ts, event_id) with ts_r <= ts_l (exact-ts matches allowed; equal
    right timestamps break to the larger id); with `tolerance_s`, a
    match older than the tolerance is discarded (-1), matching
    merge_asof's tolerance= semantics.  All times exact epoch-µs.

    Scale shape: this is NOT a pair join — both event streams union
    into ONE user-key shuffle, a single running `last(..., ignorenulls)`
    window carries the latest right row forward, so cost is one sort
    per user partition regardless of how many rights precede each
    left (the interval-join op `event_pairs_within` is the one that
    pays per-pair; as-of never does).  Skewed users cost one
    partition's sort, not a blowup.
    """
    base = events.select(
        F.col(user_col),
        F.col(id_col).alias("_eid"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        F.col("event_type").alias("_etype"),
    ).where(F.col("_etype").isin([left_type, right_type]))
    # rights sort before lefts at equal ts (exact matches allowed);
    # equal-ts rights resolve to the larger id (the window's last row)
    tagged = base.select(
        user_col, "_eid", "_us",
        F.when(F.col("_etype") == right_type, 0).otherwise(1).alias("_tag"),
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy("_us", "_tag", "_eid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r_id = F.last(F.when(F.col("_tag") == 0, F.col("_eid")),
                  ignorenulls=True).over(w)
    r_us = F.last(F.when(F.col("_tag") == 0, F.col("_us")),
                  ignorenulls=True).over(w)
    out = (
        tagged.withColumn("_rid", r_id)
        .withColumn("_rus", r_us)
        .where(F.col("_tag") == 1)
    )
    if tolerance_s is not None:
        tol_us = int(tolerance_s) * 1_000_000
        keep = F.col("_rus").isNotNull() & (
            F.col("_us") - F.col("_rus") <= F.lit(tol_us)
        )
        out = out.withColumn("_rid", F.when(keep, F.col("_rid"))).withColumn(
            "_rus", F.when(keep, F.col("_rus"))
        )
    return out.select(
        F.col(user_col),
        F.col("_eid").alias(id_col),
        F.col("_us").alias("ts_us"),
        F.coalesce("_rid", F.lit(-1).cast("long")).alias("match_id"),
        F.coalesce("_rus", F.lit(-1).cast("long")).alias("match_ts_us"),
        F.coalesce(F.col("_us") - F.col("_rus"),
                   F.lit(-1).cast("long")).alias("lag_us"),
    )


def rolling_counts(
    events: DataFrame,
    windows_s: tuple[int, ...] = (3600, 86400),
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Trailing-window feature generation: for EVERY event, the
    count and quantized value-sum of the same user's events inside
    each trailing window -> (user_col, id_col, ts_us, then per window
    W: n_{W}s, vq_{W}s), all long — the rolling-aggregate step of an
    online-ML / abuse-detection feature pipeline ("events by this user
    in the last hour/day").

    Windows are RANGE frames over exact epoch-µs: an event at t
    includes events with ts in [t - W, t], endpoints inclusive, and at
    equal timestamps ALL tied events are included for every tied row
    (RANGE semantics — identical in Spark and ANSI SQL, no tie-order
    dependence).  The event's own row counts toward its features, so
    n_* >= 1.  Values enter as floor(value*1024) int64 BEFORE summing
    (order-independent exact sums, NULL value = 0).

    Scale shape: ONE shuffle on the user key serves every window (all
    frames share the same partition+sort); cost per user is one
    ordered scan regardless of window count.  This is the windowed
    TABLE the streaming analog would maintain with watermarked state;
    batch recompute like this is the backfill path.
    """
    base = events.select(
        F.col(user_col),
        F.col(id_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
        F.floor(F.coalesce(F.col(value_col), F.lit(0.0)) * 1024)
        .cast("long")
        .alias("_vq"),
    )
    cols = [F.col(user_col), F.col(id_col), F.col("ts_us")]
    for w_s in windows_s:
        w_us = int(w_s) * 1_000_000
        fr = (
            Window.partitionBy(user_col)
            .orderBy("ts_us")
            .rangeBetween(-w_us, 0)
        )
        cols.append(F.count(F.lit(1)).over(fr).alias(f"n_{w_s}s"))
        cols.append(F.sum("_vq").over(fr).alias(f"vq_{w_s}s"))
    return base.select(*cols)
