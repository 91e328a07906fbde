"""Rectangle x rectangle overlap join (MBR join).

The reference's R-tree exists to answer exactly this predicate —
`checkOverlapMbr` (reference src/objects/RTree/Mbr.c:167-205, closed
per-dim interval overlap) — but its mains only ever probe it with
query boxes around points.  This operator exposes the general form:
join two rectangle tables on bounding-box intersection, the workload
an R-tree-join engine would serve natively.

Spark-first plan (the PBSM shape — Patel & DeWitt's partition-based
spatial-merge join, SIGMOD'96, re-expressed declaratively):

1. COVER   — each rectangle explodes into the level-`level` grid
             tiles it intersects (pure-JVM `sequence`+`explode`, same
             spans as `tile_cover`).  Output volume is bounded by
             rect-area/tile-area, so the caller picks `level` with
             tile size ~ median rect extent.
2. JOIN    — equi-join on the (tx, ty) tile key.  Catalyst picks
             broadcast vs sort-merge; dense tiles are ordinary join
             skew, handled by AQE.
3. FILTER  — exact closed-interval overlap test (the reference's
             cmpnlt semantics: touching edges DO overlap), plus the
             REFERENCE-POINT dedup: a pair that shares k tiles is
             emitted only from the tile containing the intersection's
             min corner (max of the two mins — a point inside both
             rects, hence inside both covers).  Each overlapping pair
             survives in exactly ONE task, so no `distinct` shuffle
             and no second pass over the pair table.

At 100 TB both sides stay distributed: nothing is collected, the only
shuffle is the tile-key join, and the cover fan-out is a constant
factor chosen by `level`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .tiling import _clamped_tile_coord


def box_overlap_join(
    a: DataFrame,
    b: DataFrame,
    level: int,
    box: float = 1000.0,
    ids: tuple[str, str] = ("a_id", "b_id"),
    bounds: tuple[str, str, str, str] = ("xmin", "xmax", "ymin", "ymax"),
) -> DataFrame:
    """All pairs (a, b) whose closed axis-aligned boxes intersect.

    -> (ids[0], ids[1], ix_xmin, ix_xmax, ix_ymin, ix_ymax): one row
    per overlapping pair with the intersection rectangle (touching
    edges yield a degenerate zero-extent intersection and still
    count, matching the reference's closed-MBR overlap).  Both inputs
    carry the same `bounds` column names; an inverted rectangle
    (min > max on either axis) covers nothing and joins nothing, the
    same guard as `tile_cover`.  Output is level-invariant: `level`
    only tunes the candidate volume."""
    xmin, xmax, ymin, ymax = bounds

    def _cover(df: DataFrame, idc: str, pre: str) -> DataFrame:
        sel = df.select(
            F.col(idc), *[F.col(c).alias(pre + c) for c in bounds]
        )

        def _span(lo: str, hi: str):
            tlo = _clamped_tile_coord(F.col(pre + lo), level, box)
            thi = _clamped_tile_coord(F.col(pre + hi), level, box)
            # guard on the RAW bounds: an inverted extent must cover
            # nothing even when flooring collapses it onto one tile
            return F.explode(
                F.when(F.col(pre + lo) <= F.col(pre + hi),
                       F.sequence(tlo, thi))
            )

        return (
            sel.withColumn("_tx", _span(xmin, xmax))
            .withColumn("_ty", _span(ymin, ymax))
        )

    ca = _cover(a, ids[0], "_a_")
    cb = _cover(b, ids[1], "_b_")
    j = ca.join(cb, on=["_tx", "_ty"])
    # exact closed-interval overlap (reference Mbr.c:167-205 semantics)
    overlap = (
        (F.col("_a_" + xmin) <= F.col("_b_" + xmax))
        & (F.col("_b_" + xmin) <= F.col("_a_" + xmax))
        & (F.col("_a_" + ymin) <= F.col("_b_" + ymax))
        & (F.col("_b_" + ymin) <= F.col("_a_" + ymax))
    )
    # reference-point dedup: report only from the tile holding the
    # intersection's min corner (inside both rects -> inside both
    # covers -> exactly one surviving tile per pair)
    ref_x = F.greatest(F.col("_a_" + xmin), F.col("_b_" + xmin))
    ref_y = F.greatest(F.col("_a_" + ymin), F.col("_b_" + ymin))
    dedup = (F.col("_tx") == _clamped_tile_coord(ref_x, level, box)) & (
        F.col("_ty") == _clamped_tile_coord(ref_y, level, box)
    )
    return j.where(overlap & dedup).select(
        F.col(ids[0]),
        F.col(ids[1]),
        ref_x.alias("ix_xmin"),
        F.least(F.col("_a_" + xmax), F.col("_b_" + xmax)).alias("ix_xmax"),
        ref_y.alias("ix_ymin"),
        F.least(F.col("_a_" + ymax), F.col("_b_" + ymax)).alias("ix_ymax"),
    )
