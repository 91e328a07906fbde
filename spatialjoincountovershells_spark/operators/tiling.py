"""Raster <-> vector tiling (graft scope, SURVEY §7.2 M3).

* vector -> raster: ``rasterize_points`` — aggregate a point table onto
  a regular 2D tile grid (counts + optional value sums).  Pure JVM.
* raster -> vector: ``image_tile_stats`` — decode the binary image
  payload of the images table and emit per-tile pixel statistics.
  Arrow-batched ``mapInPandas``; the decode itself is numpy for
  fmt='raw' (RGB8), and stubbed for compressed formats (no image
  codecs in this environment — the Spark-side plumbing is real).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tile_id_expr(x, y, res: int, box: float = 1000.0):
    """Compose (row, col) at `res` tiles per axis into one int64 tile id."""
    ts = box / res
    tx = F.least(F.greatest(F.floor(x / F.lit(ts)), F.lit(0)), F.lit(res - 1))
    ty = F.least(F.greatest(F.floor(y / F.lit(ts)), F.lit(0)), F.lit(res - 1))
    return (tx * res + ty).cast("long")


def rasterize_points(
    points: DataFrame,
    res: int,
    box: float = 1000.0,
    coords: tuple[str, str] = ("x", "y"),
    value_col: str | None = None,
) -> DataFrame:
    """-> (tile_id, n_points[, value_sum]) — vector->raster aggregation."""
    x, y = (F.col(c).cast("double") for c in coords)
    g = points.withColumn("tile_id", tile_id_expr(x, y, res, box)).groupBy("tile_id")
    aggs = [F.count(F.lit(1)).alias("n_points")]
    if value_col:
        aggs.append(F.sum(value_col).alias("value_sum"))
    return g.agg(*aggs)


def decode_image_np(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """-> (h, w, 3) uint8.  'raw' is a bare RGB8 buffer; 'dctq' is the
    built-in numpy lossy codec (functions/dctq.py); png/jpeg need
    codecs not present in this container and raise."""
    if fmt == "raw":
        a = np.frombuffer(data, dtype=np.uint8)
        if a.size != w * h * 3:
            raise ValueError(f"raw payload size {a.size} != {w}x{h}x3")
        return a.reshape(h, w, 3)
    if fmt == "dctq":
        from ..functions.dctq import decode_dctq

        return decode_dctq(bytes(data))
    try:  # pragma: no cover - codec not installed in this environment
        from PIL import Image  # noqa: F401
        import io

        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            f"fmt={fmt!r} needs an image codec (PIL) not present here"
        ) from e


def image_tile_stats(images: DataFrame, tiles_per_axis: int = 2) -> DataFrame:
    """raster->vector: per-image-tile mean channel intensities.

    -> (image_id, tile_row, tile_col, n_px, mean_r, mean_g, mean_b)
    with means scaled x1000 and floored to int (exact integer math so
    any oracle recomputation matches bit-for-bit).
    """
    t = tiles_per_axis

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "image_id": [],
                "tile_row": [],
                "tile_col": [],
                "n_px": [],
                "mean_r": [],
                "mean_g": [],
                "mean_b": [],
            }
            for img_id, data, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                a = decode_image_np(bytes(data), int(w), int(h), str(fmt))
                hh, ww = a.shape[0], a.shape[1]
                re = np.minimum((np.arange(hh) * t) // hh, t - 1)
                ce = np.minimum((np.arange(ww) * t) // ww, t - 1)
                tid = (re[:, None] * t + ce[None, :]).ravel()
                flat = a.reshape(-1, 3).astype(np.int64)
                npx = np.bincount(tid, minlength=t * t)
                sums = [
                    np.bincount(tid, weights=flat[:, c], minlength=t * t).astype(
                        np.int64
                    )
                    for c in range(3)
                ]
                for k in range(t * t):
                    if npx[k] == 0:
                        continue
                    rows["image_id"].append(img_id)
                    rows["tile_row"].append(k // t)
                    rows["tile_col"].append(k % t)
                    rows["n_px"].append(int(npx[k]))
                    rows["mean_r"].append(int(sums[0][k] * 1000 // npx[k]))
                    rows["mean_g"].append(int(sums[1][k] * 1000 // npx[k]))
                    rows["mean_b"].append(int(sums[2][k] * 1000 // npx[k]))
            yield pd.DataFrame(rows)

    schema = (
        "image_id string, tile_row int, tile_col int, n_px long, "
        "mean_r long, mean_g long, mean_b long"
    )
    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(op, schema)
