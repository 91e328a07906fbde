"""Structured-Streaming ingestion of point/image rows.

The reference has no streaming semantics (its "pipelined" mode is
build/probe overlap — SURVEY §2.8); this module is the graft-scope
ingestion path: a stream of image rows is decoded, cell-assigned and
aggregated into per-cell occupancy — the maintenance job that keeps a
prepartitioned particle store fresh.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.phash import decode_phash
from ..operators.cells import with_cell


def stream_cell_occupancy(
    stream: DataFrame,
    ncells: int,
    box: float = 1000.0,
    ts_col: str | None = None,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """streaming (phash[, ts]) -> per-cell (windowed) counts.

    Without ts: complete-mode global per-cell counts.  With ts:
    watermarked tumbling-window counts (late rows beyond the watermark
    are dropped) — append-mode safe.
    """
    df = with_cell(decode_phash(stream), ncells, box)
    if ts_col is None:
        return df.groupBy("cell_id").agg(F.count(F.lit(1)).alias("n"))
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), "cell_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
