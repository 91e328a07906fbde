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


def stream_shell_counts(
    stream: DataFrame,
    halos: DataFrame,
    edges,
    box: float = 1000.0,
    dtype: str = "float32",
    id_col: str = "halo_id",
) -> DataFrame:
    """Streaming count-over-shells: incremental shell counts of a
    particle STREAM against a static halo table.

    The streaming analog of the reference's per-file accumulation loop
    (`src/astr_rcount/main.c` processes particle files one at a time,
    adding each file's counts into the running totals — SURVEY §3.1):
    here every micro-batch plays the role of one particle file.  The
    plan is the sql join plan (ring-explode the STATIC side, stream->
    static equi-join on cell_id — stream-static joins are append-safe)
    followed by a streaming groupBy; run it in update/complete mode and
    the sink holds the same running totals the reference prints at the
    end of its file loop.
    -> streaming (halo_id, shell_idx, cnt)
    """
    import numpy as np

    from ..functions.geometry import squared_distance_expr
    from ..functions.shells import shell_index_expr, squared_edges
    from ..operators.cells import explode_ring, grid_ncells
    from ..operators.shell_count import _H, _P

    edges = np.asarray(edges)
    rmax = float(edges[-1])
    if not rmax < box / 2:
        raise ValueError(f"r_max={rmax} must be < box/2={box / 2}")
    nc = grid_ncells(rmax, box)
    h = halos.select(
        F.col(id_col), *[F.col(c).alias(a) for c, a in zip(("x", "y", "z"), _H)]
    )
    h = explode_ring(h, nc, box, cols=_H, k=1, prune_radius=rmax)
    p = stream.select(
        *[F.col(c).alias(a) for c, a in zip(("x", "y", "z"), _P)]
    )
    from ..operators.cells import with_cell

    p = with_cell(p, nc, box, cols=_P)
    r2 = squared_edges(edges)
    d2 = squared_distance_expr(_H, _P, box, dtype)
    j = p.join(h, "cell_id")  # stream on the left: stream-static join
    proj = j.select(F.col(id_col), d2.alias("_d2")).where(
        F.col("_d2") < F.lit(float(r2[-1]))
    )
    sh = shell_index_expr(F.col("_d2"), r2).alias("shell_idx")
    return (
        proj.select(F.col(id_col), sh)
        .groupBy(id_col, "shell_idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
