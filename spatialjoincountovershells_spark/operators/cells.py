"""Uniform periodic cell grid — the engine's spatial index.

Replaces the reference's ArraySTR bulk-load / Guttman R-tree
(``src/objects/ArraySTR/Build.c:716-840``, ``src/objects/RTree/Build.c``)
with an H3/S2-style space-partitioning key: ``cell = floor(coord/cs)``
per axis, composed into one int64 join key.  With ``cs >= r_max`` the
candidate set for a radius-r_max probe is the 27-cell ring-1
neighborhood — the shuffle-native analog of the reference's MBR-overlap
descent (``checkOverlapMbr``, ``src/objects/RTree/Mbr.c:167-205``).

"Build" is O(1) per row (two column expressions), the grid needs no
global structure, and the join key co-partitions both sides — this is
the architecture change that makes the workload scale on a cluster.
Periodic wrap is handled by taking ring offsets mod ncells, dedup'd at
offset level in the driver (no shuffle needed for the dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_ncells(
    rmax: float,
    box: float = 1000.0,
    max_per_axis: int = 4096,
    n_hint: int | None = None,
) -> int:
    """Cells per axis: the finest grid with cell_size >= rmax (ring-1 safe).

    n_hint (optional row count): additionally cap at cbrt(n) so average
    occupancy stays >= ~1 — with a tiny radius on sparse data the finest
    grid mostly fans probes into empty cells and the 27x ring fanout
    overhead dominates the (near-zero) candidate work.  At production
    density (the 100 TB table) the rmax cap binds, not this one.
    """
    if rmax <= 0:
        raise ValueError("rmax must be positive")
    nc = max(1, int(box / rmax))  # rmax > box -> one cell covers the box
    while nc > 1 and nc * (box / nc) < box:  # paranoia vs float division
        nc -= 1
    if n_hint is not None and n_hint > 0:
        nc = min(nc, max(1, int(round(n_hint ** (1.0 / 3.0)))))
    return max(1, min(nc, max_per_axis))


def _axis_idx(col: str, cs: float, ncells: int):
    i = F.floor(F.col(col).cast("double") / F.lit(cs))
    # clamp: coords are in [0, box) but f32 edge rounding could hit ncells
    return F.least(F.greatest(i, F.lit(0)), F.lit(ncells - 1)).cast("long")


def with_cell(
    df: DataFrame,
    ncells: int,
    box: float = 1000.0,
    cols: tuple[str, str, str] = ("x", "y", "z"),
    out: str = "cell_id",
) -> DataFrame:
    """Add the composite int64 cell key (cx*nc + cy)*nc + cz."""
    cs = box / ncells
    cx, cy, cz = (_axis_idx(c, cs, ncells) for c in cols)
    nc = F.lit(ncells)
    return df.withColumn(out, (cx * nc + cy) * nc + cz)


def cell_stats(
    df: DataFrame,
    ncells: int,
    box: float = 1000.0,
    cols: tuple[str, str, str] = ("x", "y", "z"),
) -> DataFrame:
    """Per-cell occupancy + tight bounding box (A3 analog).

    The reference maintains per-node MBRs via element-wise min/max
    union during index build (``adjustMbrArraySTRNode``,
    ``src/objects/ArraySTR/Node.c:10-58``); here the same statistic is
    one grouped min/max aggregation over the cell key — used for
    pruning diagnostics and as the salting pre-pass input.
    -> (cell_id, n_points, min_x..max_z)
    """
    g = with_cell(df, ncells, box, cols=cols).groupBy("cell_id")
    aggs = [F.count(F.lit(1)).alias("n_points")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return g.agg(*aggs)


def ring_offsets(ncells: int, k: int = 1, shell_only: bool = False) -> list[tuple[int, int, int]]:
    """Chebyshev ring-<=k (or ==k) offsets, dedup'd modulo the grid size.

    Dedup-at-offset-level is valid because wrap is uniform:
    pmod(c + d1, nc) == pmod(c + d2, nc) for every c iff d1 ≡ d2 (mod nc).
    """
    seen: set[tuple[int, int, int]] = set()
    out: list[tuple[int, int, int]] = []
    r = range(-k, k + 1)
    for dx in r:
        for dy in r:
            for dz in r:
                if shell_only and max(abs(dx), abs(dy), abs(dz)) < k:
                    continue
                key = (dx % ncells, dy % ncells, dz % ncells)
                if key not in seen:
                    seen.add(key)
                    out.append(key)
    return sorted(out)


def expected_ring_cells(ratio: float) -> float:
    """E[ring-1 cells within prune radius] for ratio = rmax/cell_size.

    A uniformly-placed probe keeps its own cell + each face neighbor
    w.p. min(ratio,1), edge neighbor w.p. ~(pi/4)ratio^2, corner
    neighbor w.p. ~(4pi/3/8)ratio^3 (clipped) — used by the plan
    chooser to size per-plan candidate volumes under pruning.
    At ratio=1 (cs=rmax): ~20.6 of 27; at ratio 0.46: ~6.2 of 27.
    """
    import math

    f = min(ratio, 1.0)
    e = min(math.pi / 4.0 * ratio**2, 1.0)
    c = min(math.pi / 6.0 * ratio**3, 1.0)
    return 1.0 + 6.0 * f + 12.0 * e + 8.0 * c


def explode_ring(
    df: DataFrame,
    ncells: int,
    box: float = 1000.0,
    cols: tuple[str, str, str] = ("x", "y", "z"),
    k: int = 1,
    shell_only: bool = False,
    out: str = "cell_id",
    prune_radius: float | None = None,
) -> DataFrame:
    """Explode each row into its ring-k candidate cells (periodic wrap).

    The analog of the reference's query-box construction + periodic
    subset enumeration (``setQueryMbr`` + ``MultiRangeCount.c:31-71``):
    instead of probing a tree with up to 8 shifted boxes, each probe row
    fans out to its (dedup'd) neighbor cells and the join is a plain
    equi-join on cell_id.

    prune_radius: when the query is a ball of this radius, drop ring
    cells whose MINIMUM distance to the probe point exceeds it — the
    per-row analog of the reference's MBR-overlap test, one level
    tighter than the Chebyshev ring.  A corner-neighbor cell only
    matters when the probe sits within the radius of the shared corner
    (~52% of probes at cs=rmax; far fewer on coarser grids), so this
    cuts candidate pairs ~25% at cs=rmax and up to ~4x when cs >> r.
    Safe under the engine's strict d^2 < r^2 predicate: a pruned cell's
    points all sit at d >= d_min >= r (threshold inflated by 1e-9
    relative to swallow f64 boundary rounding).  Only valid for k == 1
    (raw offsets recoverable from their mod-nc dedup when nc >= 3).
    """
    cs = box / ncells
    cx, cy, cz = (_axis_idx(c, cs, ncells) for c in cols)
    offs = ring_offsets(ncells, k=k, shell_only=shell_only)
    arr = F.array(
        [
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"), F.lit(c).alias("c"))
            for a, b, c in offs
        ]
    )
    nc = F.lit(ncells)
    o = F.explode(arr).alias("_o")
    df = df.select("*", o)
    cell = (
        F.pmod(cx + F.col("_o.a"), nc) * nc + F.pmod(cy + F.col("_o.b"), nc)
    ) * nc + F.pmod(cz + F.col("_o.c"), nc)
    df = df.withColumn(out, cell)
    if prune_radius is not None and k == 1 and ncells >= 3:
        half = ncells // 2

        def axis_gap(coord: str, ci, off):
            # raw offset from its mod-nc representative: m<=nc/2 -> m, else m-nc
            raw = F.when(off <= F.lit(half), off).otherwise(off - nc)
            x = F.col(coord).cast("double")
            lo = (ci + raw) * F.lit(cs)  # candidate cell's lower face
            return (
                F.when(raw == 0, F.lit(0.0))
                .when(raw > 0, lo - x)
                .otherwise(x - (lo + F.lit(cs)))
            )
        gx = axis_gap(cols[0], cx, F.col("_o.a"))
        gy = axis_gap(cols[1], cy, F.col("_o.b"))
        gz = axis_gap(cols[2], cz, F.col("_o.c"))
        r2 = float(prune_radius) ** 2 * (1.0 + 1e-9)
        df = df.where(gx * gx + gy * gy + gz * gz < F.lit(r2))
    return df.drop("_o")
