"""Distance expressions (JVM-side, codegen'd).

The reference computes squared L2 in float32 via SSE ``_mm_dp_ps``
(``include/objects/RTree/Distance.h:6-26``); for 3 components that
equals left-to-right f32 addition ``(dx2 + dy2) + dz2`` (SURVEY §2.11.3),
which is exactly how both these column expressions and the numpy
kernels accumulate.

Periodic boundary: the reference enumerates shifted halo images
(``src/objects/ArraySTR/MultiRangeCount.c:13-73``); for r_max < box/2
that is equivalent to the min-image convention
``d_axis = min(|a-b|, box-|a-b|)`` — see SURVEY §2.11.5 / FIXTURES §8.
Both strategies are implemented; min-image is the default (1 row per
halo instead of up to 8).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def flit(v: float, dtype: str) -> Column:
    """Literal in the kernel dtype; f32 literals are rounded once here."""
    if dtype == "float32":
        return F.lit(float(np.float32(v))).cast("float")
    return F.lit(float(v))


def axis_delta(a: Column, b: Column, box: float, dtype: str, periodic: bool = True) -> Column:
    d = F.abs(a - b)
    if not periodic:
        return d
    return F.least(d, flit(box, dtype) - d)


def squared_distance_expr(
    h_cols: tuple[str, str, str],
    p_cols: tuple[str, str, str],
    box: float,
    dtype: str = "float32",
    periodic: bool = True,
) -> Column:
    """((dx*dx + dy*dy) + dz*dz) in the kernel dtype."""
    dx, dy, dz = (
        axis_delta(F.col(h), F.col(p), box, dtype, periodic)
        for h, p in zip(h_cols, p_cols)
    )
    return (dx * dx + dy * dy) + dz * dz


def squared_distance_np(
    H: np.ndarray, P: np.ndarray, box: float, periodic: bool = True
) -> np.ndarray:
    """(m,3) x (n,3) -> (m,n) squared distances, dtype preserved (f32-safe)."""
    dt = H.dtype.type
    out = None
    for a in range(3):
        d = np.abs(H[:, a : a + 1] - P[None, :, a])
        if periodic:
            np.minimum(d, dt(box) - d, out=d)
        sq = d * d
        out = sq if out is None else out + sq  # (dx2+dy2)+dz2 order
    return out


def squared_distance_pairs_np(
    A: np.ndarray, B: np.ndarray, box: float, periodic: bool = True
) -> np.ndarray:
    """(k,3) x (k,3) ALIGNED rows -> (k,) squared distances — identical
    numerics ((dx2+dy2)+dz2, f32-safe min-image) to squared_distance_np
    but elementwise, for pair-list kernels."""
    dt = A.dtype.type
    out = None
    for a in range(3):
        d = np.abs(A[:, a] - B[:, a])
        if periodic:
            np.minimum(d, dt(box) - d, out=d)
        sq = d * d
        out = sq if out is None else out + sq
    return out
