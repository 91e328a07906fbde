"""Point-in-polygon tile assignment (graft scope, SURVEY §7.2 M3).

Crossing-number (even-odd) test expressed as pure Spark SQL:

  polygons -> explode into directed edges (vertex i -> i+1, wrapping)
  points x edges (broadcast: polygon sets are small dims) with a
  bbox prefilter, per-pair crossing predicate, then
  groupBy(point, polygon).sum(crossing) % 2 == 1.

The per-edge predicate is the classic ray-cast:
  ((y1 > py) != (y2 > py)) AND px < x1 + (py - y1) * (x2 - x1) / (y2 - y1)

All arithmetic is float64 IEEE with a fixed expression tree, so any
engine evaluating the same formula (e.g. the DuckDB oracle) produces
bit-identical decisions — including degenerate/boundary cases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def polygon_edges(polygons: DataFrame, poly_id: str = "poly_id", vertices: str = "vertices") -> DataFrame:
    """(poly_id, vertices: array<struct<x,y>>) -> one row per directed edge."""
    n = F.size(vertices)
    rolled = F.concat(
        F.slice(F.col(vertices), 2, n - 1), F.array(F.col(vertices)[0])
    )
    z = F.arrays_zip(F.col(vertices).alias("a"), rolled.alias("b"))
    e = polygons.select(poly_id, F.explode(z).alias("_e"))
    return e.select(
        poly_id,
        F.col("_e.a.x").cast("double").alias("x1"),
        F.col("_e.a.y").cast("double").alias("y1"),
        F.col("_e.b.x").cast("double").alias("x2"),
        F.col("_e.b.y").cast("double").alias("y2"),
    )


def point_in_polygon(
    points: DataFrame,
    polygons: DataFrame,
    id_col: str = "point_id",
    poly_id: str = "poly_id",
    point_coords: tuple[str, str] = ("x", "y"),
    vertices: str = "vertices",
    grid: tuple[int, float] | None = None,
) -> DataFrame:
    """-> (id_col, poly_id) rows for strictly-inside points (even-odd rule).

    grid=(ncells, box): the LARGE-polygon-set path.  The default
    broadcast theta-join (points x polygon bboxes) is the right plan
    while the polygon dim is small, but it is a nested loop over every
    polygon per point and needs the bbox+edge tables to fit in a
    broadcast.  With grid set, polygon bboxes are tiled onto an
    ncells x ncells cell grid over [0, box)^2 (one row per covered
    cell), points take their single containing cell, and the candidate
    set comes from a plain shuffled EQUI-join on cell_id — both sides
    scale out, no broadcast.  Cell clamping is monotone, so a point
    inside a bbox always lands in a cell that bbox covers, and a point
    occupies exactly one cell so no (point, polygon) pair is emitted
    twice.  The crossing predicate and float64 expression tree are
    identical in both modes; results are bit-equal.
    """
    px, py = (F.col(c).cast("double") for c in point_coords)
    edges = polygon_edges(polygons, poly_id, vertices)
    bbox = edges.groupBy(poly_id).agg(
        F.min(F.least("x1", "x2")).alias("_bx0"),
        F.max(F.greatest("x1", "x2")).alias("_bx1"),
        F.min(F.least("y1", "y2")).alias("_by0"),
        F.max(F.greatest("y1", "y2")).alias("_by1"),
    )
    in_bbox = (
        (F.col("_px") >= F.col("_bx0"))
        & (F.col("_px") <= F.col("_bx1"))
        & (F.col("_py") >= F.col("_by0"))
        & (F.col("_py") <= F.col("_by1"))
    )
    pts = points.select(F.col(id_col), px.alias("_px"), py.alias("_py"))
    if grid is None:
        # bbox prefilter keeps the point x edge fanout proportional to hits
        cand = pts.join(F.broadcast(bbox), in_bbox)
        pe = cand.join(F.broadcast(edges), poly_id)
    else:
        nc, box = grid
        cs = float(box) / nc

        def cell(col):
            return F.least(
                F.greatest(F.floor(col / F.lit(cs)), F.lit(0)), F.lit(nc - 1)
            )

        poly_cells = (
            bbox.withColumn(
                "_cx", F.explode(F.sequence(cell(F.col("_bx0")), cell(F.col("_bx1"))))
            )
            .withColumn(
                "_cy", F.explode(F.sequence(cell(F.col("_by0")), cell(F.col("_by1"))))
            )
            .withColumn("_cell", F.col("_cx") * nc + F.col("_cy"))
            .drop("_cx", "_cy")
        )
        pts_c = pts.withColumn(
            "_cell", cell(F.col("_px")) * nc + cell(F.col("_py"))
        )
        cand = (
            pts_c.join(poly_cells, "_cell")
            .where(in_bbox)
            .drop("_cell")
        )
        pe = cand.join(edges, poly_id)
    crossing = (
        ((F.col("y1") > F.col("_py")) != (F.col("y2") > F.col("_py")))
        & (
            F.col("_px")
            < F.col("x1")
            + (F.col("_py") - F.col("y1"))
            * (F.col("x2") - F.col("x1"))
            / (F.col("y2") - F.col("y1"))
        )
    ).cast("int")
    return (
        pe.groupBy(id_col, poly_id)
        .agg(F.sum(crossing).alias("_cross"))
        .where(F.col("_cross") % 2 == 1)
        .select(id_col, poly_id)
    )


def point_in_polygon_np(px, py, verts) -> bool:
    """Scalar/vectorized numpy oracle of the same formula (tests)."""
    import numpy as np

    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape, dtype=np.int64)
    v = [(float(x), float(y)) for x, y in verts]
    for (x1, y1), (x2, y2) in zip(v, v[1:] + v[:1]):
        cond = (y1 > py) != (y2 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
        inside += (cond & (px < xint)).astype(np.int64)
    return inside % 2 == 1
