"""Streaming sessionization: stream == batch over the same files, and
the native gap semantics (merge on diff <= gap, split on diff > gap —
the same boundary contract as the batch operator) pinned explicitly.
"""

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from spatialjoincountovershells_spark.streaming.stream_sessions import (
    stream_sessionize,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
GAP_S = 60
SENTINEL_USER = 999


def _write(path, rows):
    us = [int((t - T0) / dt.timedelta(microseconds=1)) for _, t, _ in rows]
    base = int(T0.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
                "ts": pa.array(
                    [base + u for u in us], pa.timestamp("us", tz="UTC")
                ),
                "value": pa.array([v for _, _, v in rows], pa.float64()),
            }
        ),
        path,
    )


def _ev(user, off_s, value=1.0):
    return (user, T0 + dt.timedelta(seconds=off_s), value)


def test_stream_sessions_match_batch(spark, tmp_path):
    """Two file-source micro-batches; append-mode sessions flushed by
    a far-future sentinel event must equal the batch session_window
    result over the union of both files (minus the sentinel's own
    still-open session).  The watermark delay covers batch2's
    cross-batch session extension (the 150s event arrives after
    batch1's 200s max), the realistic bounded-disorder contract."""
    d = tmp_path / "ev"
    d.mkdir()
    batch1 = [
        _ev(1, 0), _ev(1, 30), _ev(1, 59),      # gaps 30, 29: one session
        _ev(1, 119),                             # 59 -> 119 = 60s: MERGES
        _ev(1, 180),                             # 119 -> 180 = 61s: splits
        _ev(2, 0, -0.25), _ev(2, 200, 2.5),      # two sessions
    ]
    batch2 = [
        _ev(1, 210),                             # extends user 1's 2nd
        _ev(3, 300),                             # single-event session
        _ev(SENTINEL_USER, 10_000_000),          # watermark flush
    ]
    _write(str(d / "a.parquet"), batch1)
    schema = "user_id long, ts timestamp, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d))
    )
    out = stream_sessionize(stream, gap_s=GAP_S, watermark="600 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("sess")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        _write(str(d / "b.parquet"), batch2)
        q.processAllAvailable()
        got = {
            (r.user_id, r.start_us): (r.end_us, r.n_events, r.value_q10)
            for r in spark.sql("SELECT * FROM sess").collect()
        }
    finally:
        q.stop()
    batch = spark.createDataFrame(batch1 + batch2, schema)
    want = {
        (r.user_id, r.start_us): (r.end_us, r.n_events, r.value_q10)
        for r in stream_sessionize(batch, gap_s=GAP_S).collect()
        if r.user_id != SENTINEL_USER
    }
    assert got == want
    base = int(T0.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    u1 = sorted(k[1] for k in want if k[0] == 1)
    assert [s - base for s in u1] == [0, 180_000_000]
    # diff == gap merged (0,30,59,119 one session, end = 119s + gap)
    assert want[(1, u1[0])] == (base + 179_000_000, 4, 4096)
    # diff > gap split; batch2's 210s event merged across micro-batches
    assert want[(1, u1[1])] == (base + 270_000_000, 2, 2048)
    # user 2: two single-event sessions, quantized values exact
    u2 = sorted((k[1], v) for k, v in want.items() if k[0] == 2)
    assert [v[1] for _, v in u2] == [1, 1]
    assert u2[0][1][2] == -256 and u2[1][1][2] == 2560
    assert (3, base + 300_000_000) in want
