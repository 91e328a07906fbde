"""Count-over-shells distance-band spatial join — the engine's core query.

Reference semantics (SURVEY §2.3 J1/J2, §2.4 A1, §2.11):
* for every halo, count particles in each concentric shell
  [r_{i-1}, r_i) around it, strict-``<`` first-match binning on
  ascending pre-squared float32 edges
  (``src/objects/ArraySTR/MultiRangeCount.c:85-115``);
* periodic boundary on the cube [0, box)^3
  (``MultiRangeCount.c:13-73``), valid while r_max < box/2;
* zero-distance pairs ARE counted (STR semantics, SURVEY §2.11.4).

Spark plan (both variants share the cell-grid candidate generation):

  halos --cell+ring explode--> (cell_id, halo_id, hx, hy, hz)   [27x rows]
  particles --cell assign----> (cell_id, px, py, pz)            [1x rows]
  equi-join on cell_id  ==  the reference's MBR-overlap pruning

* plan="sql": JVM-only — distance + binning as column expressions
  inside whole-stage codegen, then groupBy(halo_id, shell).count().
  Catalyst/AQE picks broadcast vs sort-merge; at cluster scale,
  pre-bucketing the particle table by cell_id makes the big side
  shuffle-free (see plans/pipeline.py).
* plan="fused": cogroup-per-cell Arrow kernel — candidate pairs never
  materialize in the shuffle; each cell computes a numpy distance
  matrix and emits per-(halo, shell) partial counts via np.bincount
  (the analog of the reference's in-place ``counts[i]++`` fusion,
  ``MultiRangeCount.c:110``).  Wins when pairs/cell is large.

Output: long-form (halo_id, shell_idx, cnt), nonzero rows only — the
dense (nhalos x nshells) matrix of the reference is a presentation
concern (see sources/report.py).
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geometry import flit, squared_distance_expr, squared_distance_np
from ..functions.shells import shell_index_expr, shell_index_np, squared_edges
from .cells import explode_ring, grid_ncells, with_cell

_H = ("_hx", "_hy", "_hz")
_P = ("_px", "_py", "_pz")


def apply_salting(
    h: DataFrame,
    p: DataFrame,
    salt_threshold: int,
    max_salt: int = 64,
    key: str = "cell_id",
) -> tuple[DataFrame, DataFrame, str]:
    """Split dense cells across sub-keys so no single reducer owns a hot cell.

    Explicit skew handling (BASELINE north_star) on top of AQE's runtime
    skew-join:  a cheap pre-pass counts particles per cell; cells above
    `salt_threshold` get factor = ceil(n/threshold) (capped) sub-keys.
    Particles pick a deterministic sub-key by xxhash64 of their coords;
    halo-ring rows fan out to ALL sub-keys of a hot cell (sequence +
    explode), so the join result is unchanged while the hot cell's work
    spreads over `factor` tasks.  Cold cells pay nothing (factor 1, no
    fanout).  Returns (salted_h, salted_p, new_key).

    Sizing: the broadcast hot-cell list is tiny (cells above threshold
    only); the halo fanout multiplies only ring rows that touch hot
    cells — bounded by 27 * max_salt per halo in the worst case.
    """
    hot = (
        p.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > salt_threshold)
        .select(
            key,
            F.least(
                F.ceil(F.col("_n") / F.lit(salt_threshold)), F.lit(max_salt)
            ).cast("int").alias("_factor"),
        )
    )
    skey = "_salted_cell_id"
    p2 = (
        p.join(F.broadcast(hot), key, "left")
        .withColumn("_factor", F.coalesce(F.col("_factor"), F.lit(1)))
        .withColumn(
            skey,
            F.col(key) * F.lit(max_salt)
            + F.pmod(F.xxhash64(*[F.col(c) for c in _P]), F.col("_factor")),
        )
        .drop("_factor")
    )
    h2 = (
        h.join(F.broadcast(hot), key, "left")
        .withColumn("_factor", F.coalesce(F.col("_factor"), F.lit(1)))
        .withColumn("_salt", F.explode(F.sequence(F.lit(0), F.col("_factor") - 1)))
        .withColumn(skey, F.col(key) * F.lit(max_salt) + F.col("_salt"))
        .drop("_factor", "_salt")
    )
    return h2, p2, skey


def _prep(
    halos: DataFrame,
    particles: DataFrame,
    edges: np.ndarray,
    box: float,
    id_col: str,
    h_coords: tuple[str, str, str],
    p_coords: tuple[str, str, str],
    ncells: int | None,
    extra_p: Iterable[str] = (),
):
    edges = np.asarray(edges)
    rmax = float(edges[-1])
    if not rmax < box / 2:
        # precondition of the subset-enumerated periodic search (§2.11.5)
        raise ValueError(f"r_max={rmax} must be < box/2={box / 2}")
    nc = ncells or grid_ncells(rmax, box)
    h = halos.select(
        F.col(id_col), *[F.col(c).alias(a) for c, a in zip(h_coords, _H)]
    )
    h = explode_ring(h, nc, box, cols=_H, k=1)
    p = particles.select(
        *[F.col(c).alias(a) for c, a in zip(p_coords, _P)],
        *[F.col(c) for c in extra_p],
    )
    p = with_cell(p, nc, box, cols=_P)
    return h, p, nc, edges


def choose_plan(
    n_halos: int,
    n_particles: int,
    ncells: int,
    parallelism: int,
    threshold_pairs_per_core: int = 8_000_000,
) -> str:
    """Pick 'fused' vs 'sql' from estimated candidate pairs per core.

    Measured crossover on this class of hardware (BENCH/BASELINE.md):
    the cogroup Arrow kernel ('fused', pairs never shuffle) wins when
    each core chews through a large pair volume (sf1 pinned-4-core:
    91s vs 131s at ~194M pairs/core); the pure-codegen join ('sql')
    wins when per-group Arrow overhead dominates small per-core work
    (sf0.1 local[32]: 2.7s vs 7.4s at ~0.24M pairs/core).  The
    threshold sits between the measured regimes (geometric mid ~7M).
    """
    est_pairs = n_halos * 27.0 * n_particles / float(ncells**3)
    return "fused" if est_pairs / max(parallelism, 1) > threshold_pairs_per_core else "sql"


def shell_count(
    halos: DataFrame,
    particles: DataFrame,
    edges: np.ndarray,
    box: float = 1000.0,
    dtype: str = "float32",
    id_col: str = "halo_id",
    h_coords: tuple[str, str, str] = ("x", "y", "z"),
    p_coords: tuple[str, str, str] = ("x", "y", "z"),
    ncells: int | None = None,
    plan: str = "sql",
    salt_threshold: int | None = None,
    max_salt: int = 64,
    n_halos_est: int | None = None,
    n_particles_est: int | None = None,
) -> DataFrame:
    """J1+J2+A1: -> (id_col, shell_idx int, cnt long), nonzero rows only.

    plan: 'sql' (codegen join), 'fused' (cogroup Arrow kernel), or
    'auto' — pick by estimated pairs/core (choose_plan).  'auto' needs
    row counts: pass n_halos_est / n_particles_est (free if the caller
    tracks table stats, as any catalog/Iceberg metadata does) or one
    count() pre-job per missing side runs here — at cluster scale,
    always pass the estimates.

    salt_threshold: if set, run the dense-cell salting pre-pass
    (apply_salting) so no hot cell serializes one reducer/task.
    """
    n_est = n_particles_est
    if plan == "auto":
        n_est = n_est or particles.count()
        n_h = n_halos_est or halos.count()
        rmax = float(np.asarray(edges)[-1])
        nc_sql = ncells or grid_ncells(rmax, box, n_hint=n_est)
        par = halos.sparkSession.sparkContext.defaultParallelism
        plan = choose_plan(n_h, n_est, nc_sql, par)
    if plan == "fused" and ncells is None:
        # the Arrow kernel amortizes per-group overhead over dense cells:
        # target ~128 particles/cell (measured sweet spot: the numpy
        # distance-matrix kernel tolerates the larger candidate volume of
        # a coarser grid far better than 10^5 tiny cogroups tolerate
        # per-group overhead) instead of the finest ring-1 grid
        n_est = n_est or particles.count()
        cap = max(2, int(round((n_est / 128) ** (1.0 / 3.0))))
        ncells = max(1, min(grid_ncells(float(np.asarray(edges)[-1]), box), cap))
    h, p, nc, edges = _prep(
        halos, particles, edges, box, id_col, h_coords, p_coords, ncells
    )
    join_key = "cell_id"
    if salt_threshold is not None:
        h, p, join_key = apply_salting(h, p, salt_threshold, max_salt)
    r2 = squared_edges(edges)
    if plan == "fused":
        return _fused_plan(h, p, r2, box, dtype, id_col, join_key)
    j = h.join(p, join_key)
    d2 = squared_distance_expr(_H, _P, box, dtype)
    # project d2 ONCE, then bin on the column reference — embedding the
    # distance expression inside every WHEN branch would re-evaluate it
    # per branch (and blow codegen limits at 40 shells)
    proj = j.select(F.col(id_col), d2.alias("_d2")).where(
        F.col("_d2") < F.lit(float(r2[-1]))
    )
    sh = shell_index_expr(F.col("_d2"), r2).alias("shell_idx")
    return (
        proj.select(F.col(id_col), sh)
        .groupBy(id_col, "shell_idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _fused_plan(h, p, r2, box, dtype, id_col, join_key: str = "cell_id") -> DataFrame:
    np_dtype = np.float32 if dtype == "float32" else np.float64
    r2k = np.asarray(r2, dtype=np_dtype)
    nr = len(r2k)
    bx = np_dtype(box)

    def kern(left: pd.DataFrame, right: pd.DataFrame):
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({id_col: [], "shell_idx": [], "cnt": []}).astype(
                {id_col: "int64", "shell_idx": "int32", "cnt": "int64"}
            )
        H = left[list(_H)].to_numpy(np_dtype)
        ids = left[id_col].to_numpy(np.int64)
        P = right[list(_P)].to_numpy(np_dtype)
        m, n = len(H), len(P)
        acc = np.zeros(m * nr, dtype=np.int64)
        # chunk the halo side so the (chunk x n) distance matrix stays small
        chunk = max(1, 4_000_000 // max(n, 1))
        for s in range(0, m, chunk):
            HH = H[s : s + chunk]
            d2 = squared_distance_np(HH, P, box=float(bx))
            sh = shell_index_np(d2.ravel(), r2k)
            keep = sh < nr
            if not keep.any():
                continue
            hidx = np.repeat(np.arange(s, s + len(HH)), n)[keep]
            acc += np.bincount(hidx * nr + sh[keep], minlength=m * nr)
        nz = np.nonzero(acc)[0]
        return pd.DataFrame(
            {
                id_col: ids[nz // nr],
                "shell_idx": (nz % nr).astype(np.int32),
                "cnt": acc[nz],
            }
        )

    out = (
        h.groupBy(join_key)
        .cogroup(p.groupBy(join_key))
        .applyInPandas(kern, schema=f"{id_col} long, shell_idx int, cnt long")
    )
    # per-cell partials -> final agg (the map-side-combine analog)
    return out.groupBy(id_col, "shell_idx").agg(F.sum("cnt").alias("cnt"))


def range_join_pairs(
    halos: DataFrame,
    particles: DataFrame,
    radius: float,
    box: float = 1000.0,
    dtype: str = "float32",
    id_col: str = "halo_id",
    particle_id_col: str = "particle_id",
    h_coords: tuple[str, str, str] = ("x", "y", "z"),
    p_coords: tuple[str, str, str] = ("x", "y", "z"),
    ncells: int | None = None,
    include_distance: bool = False,
) -> DataFrame:
    """J3: pair-emitting range join -> (halo_id, particle_id[, d2]).

    The reference's RangeSearch surface
    (``src/objects/ArraySTR/RangeSearch.c:11-52``) — same candidate
    pipeline as shell_count minus the aggregation.  Matches the useful
    interpretation of the reference's squared-radius convention: the
    predicate is strict ``d2 < radius^2`` (SURVEY §2.3 J3 note).
    """
    edges = np.asarray([radius], dtype=np.float32 if dtype == "float32" else np.float64)
    h, p, nc, edges = _prep(
        halos,
        particles,
        edges,
        box,
        id_col,
        h_coords,
        p_coords,
        ncells,
        extra_p=(particle_id_col,),
    )
    r2 = squared_edges(edges)
    j = h.join(p, "cell_id")
    d2 = squared_distance_expr(_H, _P, box, dtype)
    out = j.select(F.col(id_col), F.col(particle_id_col), d2.alias("d2")).where(
        F.col("d2") < F.lit(float(r2[0]))
    )
    return out if include_distance else out.drop("d2")


def shell_totals(counts: DataFrame, id_col: str = "halo_id") -> DataFrame:
    """A2 (corrected): grand total per shell over all halos.

    The reference's printed Total has an aliasing bug (``total =
    &counts[0]`` doubles halo 0, ``src/astr_rcount/main.c:400-429``);
    we compute the true total — SURVEY §2.11.6 says do not reproduce.
    """
    return counts.groupBy("shell_idx").agg(F.sum("cnt").alias("total"))
