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

from ..functions.geometry import squared_distance_expr, squared_distance_np
from ..functions.shells import shell_index_expr, shell_index_np, squared_edges
from .cells import explode_ring, grid_ncells, ring_offsets, with_cell  # noqa: F401

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
    cell_mult: int = 1,
    n_hint: int | None = None,
):
    edges = np.asarray(edges)
    rmax = float(edges[-1])
    if not rmax < box / 2:
        # precondition of the subset-enumerated periodic search (§2.11.5)
        raise ValueError(f"r_max={rmax} must be < box/2={box / 2}")
    # cell_mult >= 2: sub-rmax cells (size rmax/mult) probed with a
    # ring-mult neighborhood + the Euclidean prune.  Kept volume shrinks
    # from 20.6·rmax³ (ring-1) to 10.5·rmax³ at mult=2
    # (expected_ring_cells) — but for a row-materializing join the
    # fanout usually costs more than the pruned pairs save, so the
    # default is 1 (see shell_count's cell_mult note).
    # n_hint caps the grid at ~occupancy-1 on sparse data (same policy
    # the auto path uses) — the rmax/mult cap binds at production density.
    nc = ncells or grid_ncells(rmax / max(cell_mult, 1), box, n_hint=n_hint)
    # ring depth follows the grid: k*cell_size must cover rmax
    ring_k = max(1, int(np.ceil(rmax / (box / nc) - 1e-9)))
    h = halos.select(
        F.col(id_col), *[F.col(c).alias(a) for c, a in zip(h_coords, _H)]
    )
    # per-row Euclidean cell prune: the MBR-overlap analog, drops ring
    # cells no point of which can satisfy the strict d^2 < rmax^2 bound
    h = explode_ring(h, nc, box, cols=_H, k=ring_k, prune_radius=rmax)
    p = particles.select(
        *[F.col(c).alias(a) for c, a in zip(p_coords, _P)],
        *[F.col(c) for c in extra_p],
    )
    p = with_cell(p, nc, box, cols=_P)
    return h, p, nc, edges


# CPU-pinned per-core cost model fitted to the measured regimes
# (BENCH/BASELINE.md): the codegen join processes its (fine ring-1 grid)
# candidates at ~2.5M pairs/s/core; the cogroup Arrow kernel runs ~4.5x
# faster per pair (~11M) on its coarser 128-occupancy grid (more pairs)
# plus ~2.4 us/core per row shipped through the cogroup (particles +
# exploded halo-ring rows).  All four constants re-fit in round 4 after
# the BUCKETED cogroup rewrite (see _fused_plan: per-cell groups ->
# cell_id mod n_buckets groups dropped fused's per-row overhead from a
# measured ~13 us to ~2.4 us — that 13 us was per-GROUP cogroup cost
# amortized over tiny per-cell groups, not serialization), solving the
# 2x2 system from the pinned ref-shape (rmax 12.77) and headline
# (rmax 20) operating points at 6M x 600k.  Comparing each plan's own
# work at its own rates predicts the winner in every measured regime; a
# single pairs-per-core threshold does not.
R_SQL_PAIRS_PER_CORE_SEC = 2.5e6
R_FUSED_PAIRS_PER_CORE_SEC = 1.1e7
A_FUSED_SEC_PER_ROW = 2.4e-6
# per exploded halo-ring row (shuffled + hash-probed) on the sql plan
A_SQL_SEC_PER_ROW = 2.3e-6
# fused's fixed cost — Python-worker pool spinup + Arrow init, absent
# from the pure-JVM sql plan (measured: small shape 600k x 60k rmax=20
# pinned@4: sql 3.35s vs fused 4.58s, a ~1.2s wall gap the variable
# terms don't explain).  Keeps tiny jobs on sql.
F_FUSED_FIXED_CORE_SEC = 5.0


def choose_plan(
    n_halos: int,
    n_particles: int,
    rmax: float,
    box: float = 1000.0,
    ncells: int | None = None,
    fused_occupancy: int = 128,
    max_broadcast_bytes: int = 512 << 20,
    cell_mult: int = 1,
    weighted: bool = False,
) -> str:
    """Pick the physical plan for shell_count.

    'dgrid' whenever the DATA (particle) side fits the broadcast
    budget (~28 B/particle CSR payload + 4 B/cell dense offsets): the
    reference's own architecture — in-memory data grid, streamed
    probes — with no shuffle AND no aggregation; fastest in every
    CPU-pinned measurement at in-memory data scales
    (BENCH/BASELINE.md).

    Else 'bcast' whenever the probe (halo) side fits the budget
    (real payload: 3 coords + id + sorted key ≈ 40 B/halo, plus the
    dense CSR offsets array of ~4 B/cell; 512 MB covers ~12M probes —
    reference scale is 10M): the only plan that never shuffles the
    big table — at 100 TB (where the data side can't possibly fit)
    that dominates everything else.

    Otherwise 'fused' vs 'sql' by estimated per-plan runtime.  Each
    runs on a DIFFERENT grid: sql on the finest ring-1 grid
    (occupancy-capped — the same grid shell_count passes to the sql
    plan when 'auto' picks it, so the cost model and the executed
    plan agree), fused on a ~`fused_occupancy`-particles/cell grid
    that amortizes per-group Arrow overhead.  Estimated core-time =
    that plan's candidate-pair volume / its measured per-core rate;
    ties go to sql (lower fixed overhead, pure JVM).
    """
    from .cells import expected_ring_cells

    nc_bcast = grid_ncells(rmax, box)
    grid_bytes = min(nc_bcast**3, 16_000_000) * 4
    # a weight adds one int64 per particle to the dgrid payload; the
    # bcast plan stays count-only (its sort-reduce kernel has no
    # weighted twin — see shell_count docstring)
    per_particle = 36 if weighted else 28
    if n_particles * per_particle + grid_bytes <= max_broadcast_bytes:
        return "dgrid"
    if not weighted and n_halos * 40 + grid_bytes <= max_broadcast_bytes:
        return "bcast"

    nc_sql = ncells or grid_ncells(
        rmax / max(cell_mult, 1), box, n_hint=n_particles)
    nc_fused = max(
        2,
        min(grid_ncells(rmax, box),
            int(round((n_particles / fused_occupancy) ** (1.0 / 3.0)))),
    )

    def ring(nc: int) -> float:
        return expected_ring_cells(rmax / (box / nc))  # Euclidean cell prune

    def pairs(nc: int) -> float:
        return n_halos * ring(nc) * n_particles / float(nc**3)

    t_sql = (
        pairs(nc_sql) / R_SQL_PAIRS_PER_CORE_SEC
        + n_halos * ring(nc_sql) * A_SQL_SEC_PER_ROW
    )
    t_fused = (
        pairs(nc_fused) / R_FUSED_PAIRS_PER_CORE_SEC
        + (n_particles + n_halos * ring(nc_fused)) * A_FUSED_SEC_PER_ROW
        + F_FUSED_FIXED_CORE_SEC
    )
    return "sql" if t_sql <= t_fused else "fused"


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
    bcast_cell_mult: int = 2,
    cell_mult: int = 1,
    weight_col: str | None = None,
) -> DataFrame:
    """J1+J2+A1: -> (id_col, shell_idx int, cnt long), nonzero rows only.

    weight_col: optional integer weight column on the particle side —
    the output gains `wsum long` = sum of weights per (halo, shell)
    (mass-weighted radial profiles, the natural generalization of the
    reference's count-only A1).  Supported by the join plans
    ('sql'/'fused'), which aggregate arbitrary expressions for free,
    and by 'dgrid' (the broadcast data grid carries one int64 weight
    per particle; the kernel bincounts weights alongside counts with
    the same 2^53-exactness guard as the fused kernel).  'bcast'
    raises: there the weight lives on the streamed side and its
    sort-reduce kernel ships unit counts only.  `plan='auto'` with a
    weight considers dgrid/sql/fused.  Keep weights integer for
    bit-exact cross-engine sums.

    plan: 'sql' (codegen join), 'fused' (cogroup Arrow kernel), or
    'auto' — pick by estimated pairs/core (choose_plan).  'auto' needs
    row counts: pass n_halos_est / n_particles_est (free if the caller
    tracks table stats, as any catalog/Iceberg metadata does) or one
    count() pre-job per missing side runs here — at cluster scale,
    always pass the estimates.

    salt_threshold: if set, run the dense-cell salting pre-pass
    (apply_salting) so no hot cell serializes one reducer/task.

    bcast_cell_mult: grid-refinement factor for the broadcast plans —
    cells of size rmax/mult probed with ring-mult offsets + Euclidean
    slab pruning.  2 cuts candidate pairs ~2x vs ring-1 at matched
    correctness (measured, BENCH/BASELINE.md); ignored when `ncells`
    is passed explicitly.

    cell_mult: the same refinement for the 'sql' join plan.  Default 1
    — a MEASURED negative result (round 4, CPU-pinned ref shape): the
    join plan pays ~1 us per exploded halo-ring ROW (materialize +
    shuffle/broadcast-build + hash probe) against ~0.6 us saved per
    pruned PAIR inside codegen, so mult=2 (fanout 20.6 -> 84 rows/probe
    for a 2x pair cut) ran 32s -> 200+s.  The broadcast plans keep
    mult=2 because their ring bookkeeping is a few numpy ops per row
    INSIDE the kernel, never a row.  The knob stays for extreme-density
    regimes (ring-1 candidates/probe >~ 3000, where the pair term
    dominates the fanout term; choose_plan's cost model prices both).
    Ignored for 'fused' (occupancy-driven grid) and when `ncells` is
    passed explicitly.  What actually closed the r3 sql candidate-cost
    gap is the flat codegen-safe prune in explode_ring — the ring-1
    sql plan itself got 2.7x faster (see cells.py).
    """
    n_est = n_particles_est
    if plan == "auto":
        n_est = n_est or particles.count()
        n_h = n_halos_est or halos.count()
        rmax = float(np.asarray(edges)[-1])
        plan = choose_plan(
            n_h, n_est, rmax, box, ncells, cell_mult=cell_mult,
            weighted=weight_col is not None,
        )
    if weight_col is not None and plan == "bcast":
        raise ValueError(
            "weight_col is not supported by plan='bcast': its sort-"
            "reduce kernel ships unit counts only (the weight lives on "
            "the STREAMED side there, so a weighted twin would have to "
            "materialize per-pair weights — use 'dgrid' when the data "
            "side fits the broadcast budget, else 'sql'/'fused')"
        )
    if plan == "fused" and ncells is None:
        # the Arrow kernel wants dense cells: target ~128 particles/cell.
        # Still true after the round-4 bucketed-cogroup rewrite (which
        # removed per-GROUP overhead): on the fine ring-1 grid the
        # in-kernel per-CELL numpy dispatch + the 3.3x halo-ring fanout
        # dominate — measured 35.8s (nc=78) vs 16.6s (nc=36) at the
        # pinned ref shape; the distance-matrix kernel eats the coarser
        # grid's extra candidate volume at ~11M pairs/s/core instead
        n_est = n_est or particles.count()
        cap = max(2, int(round((n_est / 128) ** (1.0 / 3.0))))
        ncells = max(1, min(grid_ncells(float(np.asarray(edges)[-1]), box), cap))
    if plan in ("bcast", "dgrid"):
        # no shuffle at all -> salting is moot; empty cells are free in
        # the CSR layout, so a grid FINER than ring-1 (cells of size
        # rmax/cell_mult probed with a ring-cell_mult neighborhood) is
        # available via bcast_cell_mult: the Euclidean prune tightens
        # the candidate set from the (3*rmax)^3 ring-1 cube toward the
        # ball volume itself, at the price of more ring bookkeeping
        # per streamed row (VERDICT r2 top item: candidate volume)
        edges = np.asarray(edges)
        rmax = float(edges[-1])
        if not rmax < box / 2:
            raise ValueError(f"r_max={rmax} must be < box/2={box / 2}")
        nc = ncells or grid_ncells(rmax / bcast_cell_mult, box)
        # ring depth follows the grid: k*cell_size must cover rmax
        ring_k = max(1, int(np.ceil(rmax / (box / nc) - 1e-9)))
        if plan == "dgrid":
            return _dgrid_plan(
                halos, particles, squared_edges(edges), box, dtype, id_col,
                nc, h_coords, p_coords, ring_k=ring_k, weight_col=weight_col,
            )
        return _bcast_plan(
            halos, particles, squared_edges(edges), box, dtype, id_col, nc,
            h_coords, p_coords, ring_k=ring_k,
        )
    h, p, nc, edges = _prep(
        halos, particles, edges, box, id_col, h_coords, p_coords, ncells,
        extra_p=(weight_col,) if weight_col else (),
        # the sql plan executes on the same refined occupancy-capped grid
        # the cost model evaluated (ADVICE r2: chooser/plan grid agreement);
        # fused's grid was already fixed above (occupancy-driven)
        cell_mult=cell_mult if plan == "sql" else 1,
        n_hint=n_est,
    )
    join_key = "cell_id"
    if salt_threshold is not None:
        h, p, join_key = apply_salting(h, p, salt_threshold, max_salt)
    r2 = squared_edges(edges)
    if plan == "fused":
        return _fused_plan(h, p, r2, box, dtype, id_col, join_key,
                           weight_col=weight_col)
    j = h.join(p, join_key)
    d2 = squared_distance_expr(_H, _P, box, dtype)
    # project d2 ONCE, then bin on the column reference — embedding the
    # distance expression inside every WHEN branch would re-evaluate it
    # per branch (and blow codegen limits at 40 shells)
    wcols = [F.col(weight_col)] if weight_col else []
    proj = j.select(F.col(id_col), d2.alias("_d2"), *wcols).where(
        F.col("_d2") < F.lit(float(r2[-1]))
    )
    sh = shell_index_expr(F.col("_d2"), r2).alias("shell_idx")
    aggs = [F.count(F.lit(1)).alias("cnt")]
    if weight_col:
        aggs.append(F.sum(weight_col).cast("long").alias("wsum"))
    return (
        proj.select(F.col(id_col), sh, *wcols)
        .groupBy(id_col, "shell_idx")
        .agg(*aggs)
    )


def _fused_plan(h, p, r2, box, dtype, id_col, join_key: str = "cell_id",
                weight_col: str | None = None,
                n_buckets: int | None = None) -> DataFrame:
    """Cogroup Arrow kernel, bucketed.

    Cogrouping per CELL was the round-3 shape; per-group Python/Arrow
    overhead (a few ms x one group per cell) dominated at production
    grids (~27k cells -> fused 85.5s where sql ran 23.9s at the ref
    shape, BENCH/BASELINE.md).  Round 4: cogroup on `cell_id mod
    n_buckets` (a few hundred groups regardless of grid size) and
    segment per cell INSIDE the kernel — both sides sorted by cell key,
    searchsorted block boundaries, the same chunked distance-matrix
    kernel per common cell.  Pair math, f32 discipline and counting
    semantics are unchanged; only the grouping granularity moved, so
    all goldens/oracles are invariant.  Composes with salting: the
    salted key is cell_id*max_salt+salt, so pmod spreads a hot cell's
    sub-keys across consecutive buckets.
    """
    np_dtype = np.float32 if dtype == "float32" else np.float64
    r2k = np.asarray(r2, dtype=np_dtype)
    nr = len(r2k)
    bx = np_dtype(box)
    out_cols = [id_col, "shell_idx", "cnt"] + (["wsum"] if weight_col else [])
    if n_buckets is None:
        sp = h.sparkSession
        try:
            # the conf may be 'auto' under AQE-managed deployments
            conf_parts = int(sp.conf.get("spark.sql.shuffle.partitions", "200"))
        except ValueError:
            conf_parts = 256
        n_buckets = max(256, conf_parts)

    def _empty():
        return pd.DataFrame({c: [] for c in out_cols}).astype(
            {c: ("int32" if c == "shell_idx" else "int64")
             for c in out_cols}
        )

    def kern(left: pd.DataFrame, right: pd.DataFrame):
        if len(left) == 0 or len(right) == 0:
            return _empty()
        hkey = left[join_key].to_numpy(np.int64)
        pkey = right[join_key].to_numpy(np.int64)
        # introsort, NOT stable: per-(id, shell) integer counts are
        # invariant to row order within a cell block
        ho = np.argsort(hkey)
        po = np.argsort(pkey)
        hkey = hkey[ho]
        pkey = pkey[po]
        H = left[list(_H)].to_numpy(np_dtype)[ho]
        ids = left[id_col].to_numpy(np.int64)[ho]
        P = right[list(_P)].to_numpy(np_dtype)[po]
        if weight_col:
            w = right[weight_col].to_numpy(np.int64)[po]
        # exploded halo-ring rows repeat ids across cells: factorize once
        # per bucket so the accumulator is (distinct ids x shells)
        uids, id_idx = np.unique(ids, return_inverse=True)
        uc = np.intersect1d(
            hkey[np.r_[True, hkey[1:] != hkey[:-1]]],
            pkey[np.r_[True, pkey[1:] != pkey[:-1]]],
        )
        if len(uc) == 0:
            return _empty()
        hs = np.searchsorted(hkey, uc, "left")
        he = np.searchsorted(hkey, uc, "right")
        ps = np.searchsorted(pkey, uc, "left")
        pe = np.searchsorted(pkey, uc, "right")
        key_chunks: list[np.ndarray] = []
        w_chunks: list[np.ndarray] = []
        for i in range(len(uc)):
            PP = P[ps[i] : pe[i]]
            n = len(PP)
            HH_all = H[hs[i] : he[i]]
            hloc_all = id_idx[hs[i] : he[i]]
            # chunk the halo side so the (chunk x n) matrix stays small
            chunk = max(1, 4_000_000 // max(n, 1))
            for s in range(0, len(HH_all), chunk):
                HH = HH_all[s : s + chunk]
                d2 = squared_distance_np(HH, PP, box=float(bx))
                sh = shell_index_np(d2.ravel(), r2k)
                kidx = np.nonzero(sh < nr)[0]
                if len(kidx) == 0:
                    continue
                hloc = hloc_all[s : s + len(HH)][kidx // n]
                key_chunks.append(hloc * nr + sh[kidx])
                if weight_col:
                    # surviving pair -> its particle (flat pair % n)
                    w_chunks.append(w[ps[i] : pe[i]][kidx % n])
        if not key_chunks:
            return _empty()
        keys = np.concatenate(key_chunks)
        acc = np.bincount(keys, minlength=len(uids) * nr)
        if weight_col:
            wk = np.concatenate(w_chunks)
            if np.abs(wk).sum() < 2.0**53:
                # bincount's f64 partial sums are exact while every
                # intermediate stays under 2^53 — guaranteed by sum|w|
                # over the bucket — and ~10x faster than the scatter
                accw = np.bincount(
                    keys, weights=wk, minlength=len(uids) * nr
                ).astype(np.int64)
            else:  # astronomically heavy bucket: exact fallback
                accw = np.zeros(len(uids) * nr, dtype=np.int64)
                np.add.at(accw, keys, wk)
        nz = np.nonzero(acc)[0]
        cols = {
            id_col: uids[nz // nr],
            "shell_idx": (nz % nr).astype(np.int32),
            "cnt": acc[nz],
        }
        if weight_col:
            cols["wsum"] = accw[nz]
        return pd.DataFrame(cols)

    schema = f"{id_col} long, shell_idx int, cnt long" + (
        ", wsum long" if weight_col else ""
    )
    bkt = F.pmod(F.col(join_key), F.lit(n_buckets)).cast("int").alias("_bkt")
    hsel = [F.col(id_col), *[F.col(c) for c in _H], F.col(join_key), bkt]
    psel = [*[F.col(c) for c in _P], F.col(join_key), bkt] + (
        [F.col(weight_col)] if weight_col else []
    )
    out = (
        h.select(*hsel)
        .groupBy("_bkt")
        .cogroup(p.select(*psel).groupBy("_bkt"))
        .applyInPandas(kern, schema=schema)
    )
    # per-cell partials -> final agg (the map-side-combine analog)
    aggs = [F.sum("cnt").alias("cnt")]
    if weight_col:
        aggs.append(F.sum("wsum").alias("wsum"))
    return out.groupBy(id_col, "shell_idx").agg(*aggs)


def _build_grid(
    side: DataFrame,
    coords: tuple[str, str, str],
    id_col: str | None,
    ncells: int,
    box: float,
    np_dtype,
    weight_col: str | None = None,
):
    """Collect one side, CSR-index it by cell key on the driver,
    broadcast.

    The cell key is a codegen'd column expression (with_cell —
    identical f64 floor(x/cs) arithmetic to the kernels', so cell
    assignment is plan-invariant); the collect is an UNORDERED Arrow
    collect and the CSR ordering is a driver-side numpy argsort +
    gather.  A Spark range-partitioned sort before the collect was
    measured SLOWER end-to-end (the sort adds a full shuffle + sampling
    pass and the driver still has to collect every row afterwards;
    argsort+gather of 6M rows is ~0.8s vs ~3s of sort overhead) — and
    the serial work is bounded by the same broadcast budget that gates
    this plan, so it cannot grow past ~16M rows.  Dense CSR offsets
    over the nc^3 grid when it fits (64 MB int32 at 16M cells); the
    sorted key array is shipped ONLY for the searchsorted fallback on
    absurdly fine grids — with dense offsets the kernels never touch
    it, and dropping it cuts the broadcast ~35%.
    Returns (broadcast, n_rows)."""
    from .cells import with_cell

    cols = ([id_col] if id_col else []) + list(coords)
    if weight_col:
        cols.append(weight_col)
    keyed = with_cell(side.select(*cols), ncells, box, cols=coords)
    tbl = keyed.toArrow()
    key = np.asarray(tbl.column("cell_id"))
    n = len(key)
    # introsort, NOT stable: every kernel output is a per-id integer
    # count, invariant to row order within a cell, and default argsort
    # is ~2.4x faster than the stable radix at 6M keys (profiled)
    order = np.argsort(key)
    xs = [
        np.asarray(tbl.column(c)).astype(np_dtype, copy=False)[order]
        for c in coords
    ]
    payload = {"Hx": xs[0], "Hy": xs[1], "Hz": xs[2]}
    if id_col:
        payload["ids"] = np.asarray(tbl.column(id_col)).astype(
            np.int64, copy=False)[order]
    if weight_col:
        payload["W"] = np.asarray(tbl.column(weight_col)).astype(
            np.int64, copy=False)[order]
    nc = ncells
    if nc**3 <= 16_000_000:
        counts = np.bincount(key, minlength=nc**3)
        payload["starts"] = np.concatenate(([0], np.cumsum(counts))).astype(
            np.int32 if n < 2**31 else np.int64
        )
    else:
        payload["keys"] = key[order]
    return side.sparkSession.sparkContext.broadcast(payload), n


def _ring_geometry(nc: int, cs: float, kk: int, rmax2_infl: float):
    """Ring-k offsets (mod-dedup'd), offset-level Euclidean prune, the
    interior neighbor-key delta LUT, and the two fast-path gates."""
    offs = ring_offsets(nc, k=kk)
    half = nc // 2
    raw_offs = np.array(
        [[m if m <= half else m - nc for m in o] for o in offs], dtype=np.int64
    )
    if nc > 2 * kk:
        # a whole ring cell is out of range for EVERY probe point when
        # its min per-axis gap (|o|-1 full cells) already exceeds rmax
        # — e.g. the 8 corner cells at k=3
        omin = np.maximum(np.abs(raw_offs) - 1, 0) * cs
        raw_offs = raw_offs[(omin * omin).sum(axis=1) < rmax2_infl]
    doff = (raw_offs[:, 0] * nc + raw_offs[:, 1]) * nc + raw_offs[:, 2]
    prune_ok = nc >= 2 * kk + 1
    # interior pairs have |d|_axis <= (k+1)*cs <= 2box/5 < box/2 with a
    # wide margin, so the min-image fold can never flip within an ulp
    # of the box/2 boundary
    fastpath_ok = 2 * nc >= 5 * (kk + 1)
    return raw_offs, doff, prune_ok, fastpath_ok


def _bcast_plan(
    halos: DataFrame,
    particles: DataFrame,
    r2: np.ndarray,
    box: float,
    dtype: str,
    id_col: str,
    ncells: int,
    h_coords: tuple[str, str, str],
    p_coords: tuple[str, str, str],
    ring_k: int = 1,
) -> DataFrame:
    """Broadcast-halo-grid plan: stream the BIG table map-side only.

    The reference holds its whole index in memory per node and streams
    probes past it (``src/astr_rcount/main.c``); this is the same
    architecture with the sides flipped to fit Spark's broadcast model:
    the probe (halo) table — the small side by the workload's own shape
    (10M probes vs 3x100M particles in the published run) — is sorted
    by cell key into a CSR layout, broadcast once, and every particle
    partition counts against it in a numpy kernel.  The 100 TB particle
    table is NEVER shuffled, exploded, or cogrouped: one scan, map-side
    partial (halo, shell) counts, and a tiny final aggregation whose
    input is bounded by nonzero (halo, shell) cells per partition.
    Requires the halo side to fit in executor memory (~40 B/halo: 10M
    halos ≈ 400 MB — the same assumption the reference makes per node).

    Candidate work per particle = halos in the ring-k cell neighborhood
    around it (k = ring_k; cells of size rmax/k), cut by a per-probe
    Euclidean slab prune.  A finer-than-rmax grid (ring_k >= 2) trades
    a few more candidate CELLS for far fewer candidate PAIRS: the kept
    volume shrinks from the (3*rmax)^3 ring-1 cube toward the ball
    volume plus one cell-width shell — the closest Spark-shaped analog
    of the reference tree's tight MBR descent, and the r2-verdict fix
    for the candidates/probe gap.  Numerics are identical to the fused
    kernel (f32-safe
    (dx2+dy2)+dz2, strict-< first-match searchsorted binning), so the
    byte-exact golden tests hold for this plan too.

    Kernel hot-path design (profiled stage-by-stage, round 3): the
    per-candidate-cell bookkeeping — not the distance math — dominated
    the round-2 kernel (int64 ``% nc`` wrap + per-group np.repeat were
    ~60% of wall time).  Now:

    * particles whose cell is >= 1 from every box face (the vast
      majority; requires nc >= 5) take a FAST path: neighbor cell key
      is one add against a precomputed offset LUT (no modulo), and the
      pair distance skips the min-image fold entirely — exact, because
      every candidate pair then has per-axis separation <= 2*cs <=
      box/2, where ``min(|d|, box-|d|)`` provably picks ``|d|`` and
      ``|d|^2 == d^2`` in IEEE f32;
    * empty candidate cells are dropped before pair expansion, and the
      expansion builds the halo index in ONE np.repeat + one arange
      (was three repeats);
    * halo coords are broadcast as three CONTIGUOUS 1-D arrays so the
      per-pair gather is a flat ``np.take``, and the probe coords are
      np.repeat'ed values (4 B floats), never 8 B row indices;
    * pairs are pre-filtered with ``d2 < r2_max`` (typically only a few
      % survive at reference shapes) before the 40-edge searchsorted.
    """
    np_dtype = np.float32 if dtype == "float32" else np.float64
    spark = halos.sparkSession
    bc, m = _build_grid(halos, h_coords, id_col, ncells, box, np_dtype)
    nc = ncells
    cs = box / nc
    r2k = np.asarray(r2, dtype=np_dtype)
    r2max = r2k[-1]
    nr = len(r2k)
    rmax2_infl = float(np.asarray(r2, dtype=np.float64)[-1]) * (1.0 + 1e-9)
    kk = ring_k
    raw_offs, doff, prune_ok, fastpath_ok = _ring_geometry(
        nc, cs, kk, rmax2_infl)
    bx = np_dtype(box)

    # int32 wherever the bounds allow — halves the bytes every gather,
    # sort, and multiply touches vs int64 (profiled ~25% of kernel time)
    key_t = np.int32 if nc**3 < 2**31 - 1 else np.int64
    out_t = np.int32 if m * nr < 2**31 - 1 else np.int64
    doff_t = doff.astype(key_t)
    oidx = raw_offs + kk  # raw offset -k..+k -> gap-table column

    def _reduce(keys: np.ndarray, cnts: np.ndarray):
        o = np.argsort(keys, kind="stable")
        k, c = keys[o], cnts[o]
        b = np.nonzero(np.r_[True, k[1:] != k[:-1]])[0]
        return k[b], np.add.reduceat(c, b)

    def _count(keys: np.ndarray):
        # sort-reduce of unit counts: ~4x cheaper than a dense bincount
        # over the m*nr domain at typical keys/task volumes (measured),
        # and it never touches an O(m*nr) accumulator
        ks = np.sort(keys)
        b = np.nonzero(np.r_[True, ks[1:] != ks[:-1]])[0]
        return ks[b], np.diff(np.r_[b, len(ks)]).astype(np.int64)

    def kern(batches):
        import os as _os
        import time as _time

        prof = _os.environ.get("SJCS_KERN_PROF") == "1"
        cpu0 = _time.thread_time()
        data = bc.value
        Hx, Hy, Hz = data["Hx"], data["Hy"], data["Hz"]
        ids_s, keys_s = data["ids"], data.get("keys")
        starts = data.get("starts")
        st0 = st1 = None
        if starts is not None:
            st0, st1 = starts[:-1], starts[1:]
        comp: list[tuple[np.ndarray, np.ndarray]] = []
        raw: list[np.ndarray] = []
        raw_n = 0

        def flush():
            nonlocal raw, raw_n
            if not raw:
                return
            k = np.concatenate(raw)
            if len(k) * 4 > m * nr:
                b = np.bincount(k, minlength=m * nr)  # keys outnumber domain
                knz = np.nonzero(b)[0]
                comp.append((knz.astype(k.dtype), b[knz]))
            else:
                comp.append(_count(k))
            raw, raw_n = [], 0

        def run_cols(P, P64s, pc, fold):
            """Column-at-a-time ring sweep over one particle subset.

            One vectorized pass per ring offset (contiguous adds + two
            int32 gathers + the slab prune) beats the row-masked
            (n, noffs) variant ~2x: no 2-D boolean nonzero, no fancy
            (n, noffs) gap gathers, no int64 anywhere in the hot loop.
            fold=True takes the periodic min-image path (boundary
            cells); fold=False is exact without folding (interior,
            per-axis |d| <= (k+1)*cs < box/2)."""
            nonlocal raw_n
            n = len(P)
            if n == 0:
                return
            if prune_ok:
                # per-(axis, slab) squared gaps, contiguous in n:
                # gap to slab at offset |o| = within-cell face gap
                # plus |o|-1 full cells (the vectorized MBR prune)
                G = np.empty((3, 2 * kk + 1, n), dtype=np.float64)
                for a in range(3):
                    lo_f = pc[:, a].astype(np.float64) * cs
                    gm = P64s[:, a] - lo_f
                    gp = lo_f + cs - P64s[:, a]
                    G[a, kk] = 0.0
                    for j in range(1, kk + 1):
                        gmj = gm + (j - 1) * cs
                        gpj = gp + (j - 1) * cs
                        G[a, kk - j] = gmj * gmj
                        G[a, kk + j] = gpj * gpj
            pck = pc.astype(key_t)
            pkey = (pck[:, 0] * nc + pck[:, 1]) * nc + pck[:, 2]
            pis, los, cns = [], [], []
            for j in range(len(raw_offs)):
                if fold:
                    qc = (pc + raw_offs[j]) % nc
                    qk = (qc[:, 0] * nc + qc[:, 1]) * nc + qc[:, 2]
                else:
                    qk = pkey + doff_t[j]
                if st0 is not None:
                    lo_i = st0[qk]
                    cn = st1[qk] - lo_i
                else:
                    lo_i = np.searchsorted(keys_s, qk, side="left")
                    cn = np.searchsorted(keys_s, qk, side="right") - lo_i
                if prune_ok:
                    g2 = G[0, oidx[j, 0]] + G[1, oidx[j, 1]]
                    g2 += G[2, oidx[j, 2]]
                    keep = (cn > 0) & (g2 < rmax2_infl)
                else:
                    keep = cn > 0
                idx = np.nonzero(keep)[0]
                if len(idx) == 0:
                    continue
                pis.append(idx)
                los.append(lo_i[idx])
                cns.append(cn[idx])
            if not pis:
                return
            pi0 = np.concatenate(pis)
            lo_c = np.concatenate(los).astype(out_t)
            cnt = np.concatenate(cns).astype(np.int64)
            total = int(cnt.sum())
            if total == 0:
                return
            idx_t = out_t if total < 2**31 - 1 else np.int64
            c0 = np.cumsum(cnt) - cnt
            hidx = np.arange(total, dtype=idx_t)
            hidx += np.repeat((lo_c - c0).astype(idx_t), cnt)
            dx = np.take(Hx, hidx)
            dx -= np.repeat(P[pi0, 0], cnt)
            dy = np.take(Hy, hidx)
            dy -= np.repeat(P[pi0, 1], cnt)
            dz = np.take(Hz, hidx)
            dz -= np.repeat(P[pi0, 2], cnt)
            if fold:
                # min-image fold, f32-exact ((dx2+dy2)+dz2 order kept)
                np.abs(dx, out=dx)
                np.minimum(dx, bx - dx, out=dx)
                np.abs(dy, out=dy)
                np.minimum(dy, bx - dy, out=dy)
                np.abs(dz, out=dz)
                np.minimum(dz, bx - dz, out=dz)
            dx *= dx
            dy *= dy
            dz *= dz
            d2 = dx + dy
            d2 += dz
            inr = d2 < r2max  # cheap prefilter before the 40-edge bin
            if not inr.any():
                return
            sh = np.searchsorted(r2k, d2[inr], side="right").astype(out_t)
            keys = hidx[inr].astype(out_t) * out_t(nr) + sh
            raw.append(keys)
            raw_n += len(keys)
            if raw_n > 24_000_000:
                flush()

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            # bin from original precision (plan-invariant cells); the
            # kernel-dtype copy is used only for distances
            P64 = pdf[list(_P)].to_numpy(np.float64)
            P = P64.astype(np_dtype)
            pc = np.clip(np.floor(P64 / cs), 0, nc - 1).astype(np.int64)
            if fastpath_ok:
                interior = ((pc >= kk) & (pc <= nc - 1 - kk)).all(axis=1)
                ii = np.nonzero(interior)[0]
                bi = np.nonzero(~interior)[0]
                run_cols(P[ii], P64[ii], pc[ii], fold=False)
                run_cols(P[bi], P64[bi], pc[bi], fold=True)
            else:
                run_cols(P, P64, pc, fold=True)
        flush()
        if prof:
            # per-task kernel CPU (thread_time: immune to hypervisor
            # steal, unlike wall clock) -> driver stderr in local mode
            import json as _json
            import sys as _sys

            print("SJCS_KERN_PROF " + _json.dumps(
                {"task_cpu_s": round(_time.thread_time() - cpu0, 3)}),
                file=_sys.stderr, flush=True)
        if not comp:
            return
        k = np.concatenate([x[0] for x in comp])
        c = np.concatenate([x[1] for x in comp])
        k, c = _reduce(k, c)
        if len(k):
            yield pd.DataFrame(
                {
                    id_col: ids_s[(k // nr).astype(np.int64)],
                    "shell_idx": (k % nr).astype(np.int32),
                    "cnt": c.astype(np.int64),
                }
            )

    out = particles.select(
        *[F.col(c).alias(a) for c, a in zip(p_coords, _P)]
    ).mapInPandas(kern, schema=f"{id_col} long, shell_idx int, cnt long")
    return out.groupBy(id_col, "shell_idx").agg(F.sum("cnt").alias("cnt"))


def _dgrid_plan(
    halos: DataFrame,
    particles: DataFrame,
    r2: np.ndarray,
    box: float,
    dtype: str,
    id_col: str,
    ncells: int,
    h_coords: tuple[str, str, str],
    p_coords: tuple[str, str, str],
    ring_k: int = 1,
    weight_col: str | None = None,
) -> DataFrame:
    """Broadcast-DATA grid: the reference's architecture, sides as-is.

    ``astr_rcount`` holds the whole particle index in per-node memory
    and streams probes past it (``src/astr_rcount/main.c``); this plan
    is the 1:1 Spark analog: the PARTICLE table is cell-sorted into a
    CSR grid, broadcast once, and the (small) probe table streams
    through ``mapInPandas``.  Every probe's shell counts complete
    inside its own task, so the output needs NO shuffle and NO
    aggregation — the map output IS the result.  Two structural wins
    over plan='bcast' at in-memory data scales:

    * ring bookkeeping (neighbor keys, CSR lookups, slab prune) is per
      PROBE, and probes are typically 10x fewer than particles;
    * per-batch counts accumulate into a dense (batch x nshells)
      bincount and leave pre-aggregated — the JVM never hash-aggregates
      tens of millions of partial rows (measured at ~40% of plan=
      'bcast' wall time at the reference-matched shape).

    Scale envelope: the DATA side must fit executor memory (16-20 B/
    particle; the reference's own published run holds 3x100M particles
    ~5 GB per node the same way).  Beyond the broadcast budget use
    plan='bcast' (stream the 100 TB side); choose_plan gates on both
    budgets.  Numerics identical to the other plans (f32-safe
    (dx2+dy2)+dz2, strict-< searchsorted binning, min-image fold only
    where a pair can wrap) — pinned by the same golden tests.
    """
    np_dtype = np.float32 if dtype == "float32" else np.float64
    bc, n_data = _build_grid(particles, p_coords, None, ncells, box, np_dtype,
                             weight_col=weight_col)
    nc = ncells
    cs = box / nc
    r2k = np.asarray(r2, dtype=np_dtype)
    r2max = r2k[-1]
    nr = len(r2k)
    rmax2_infl = float(np.asarray(r2, dtype=np.float64)[-1]) * (1.0 + 1e-9)
    kk = ring_k
    raw_offs, doff, prune_ok, fastpath_ok = _ring_geometry(
        nc, cs, kk, rmax2_infl)
    bx = np_dtype(box)
    key_t = np.int32 if nc**3 < 2**31 - 1 else np.int64
    idx_t = np.int32 if n_data < 2**31 - 1 else np.int64
    doff_t = doff.astype(key_t)
    oidx = raw_offs + kk

    def kern(batches):
        import os as _os
        import time as _time

        prof = _os.environ.get("SJCS_KERN_PROF") == "1"
        cpu0 = _time.thread_time()
        data = bc.value
        Px, Py, Pz = data["Hx"], data["Hy"], data["Hz"]
        W = data.get("W")
        keys_s = data.get("keys")
        starts = data.get("starts")
        st0 = st1 = None
        if starts is not None:
            st0, st1 = starts[:-1], starts[1:]

        def sweep(H, H64s, pc, fold, acc, base_idx, accw=None):
            n = len(H)
            if n == 0:
                return
            if prune_ok:
                G = np.empty((3, 2 * kk + 1, n), dtype=np.float64)
                for a in range(3):
                    lo_f = pc[:, a].astype(np.float64) * cs
                    gm = H64s[:, a] - lo_f
                    gp = lo_f + cs - H64s[:, a]
                    G[a, kk] = 0.0
                    for j in range(1, kk + 1):
                        gmj = gm + (j - 1) * cs
                        gpj = gp + (j - 1) * cs
                        G[a, kk - j] = gmj * gmj
                        G[a, kk + j] = gpj * gpj
            pck = pc.astype(key_t)
            pkey = (pck[:, 0] * nc + pck[:, 1]) * nc + pck[:, 2]
            pis, los, cns = [], [], []
            for j in range(len(raw_offs)):
                if fold:
                    qc = (pc + raw_offs[j]) % nc
                    qk = (qc[:, 0] * nc + qc[:, 1]) * nc + qc[:, 2]
                else:
                    qk = pkey + doff_t[j]
                if st0 is not None:
                    lo_i = st0[qk]
                    cn = st1[qk] - lo_i
                else:
                    lo_i = np.searchsorted(keys_s, qk, side="left")
                    cn = np.searchsorted(keys_s, qk, side="right") - lo_i
                if prune_ok:
                    g2 = G[0, oidx[j, 0]] + G[1, oidx[j, 1]]
                    g2 += G[2, oidx[j, 2]]
                    keep = (cn > 0) & (g2 < rmax2_infl)
                else:
                    keep = cn > 0
                idx = np.nonzero(keep)[0]
                if len(idx) == 0:
                    continue
                pis.append(idx)
                los.append(lo_i[idx])
                cns.append(cn[idx])
            if not pis:
                return
            pi0 = np.concatenate(pis)
            lo_c = np.concatenate(los).astype(idx_t)
            cnt = np.concatenate(cns).astype(np.int64)
            total = int(cnt.sum())
            if total == 0:
                return
            et = idx_t if total < 2**31 - 1 else np.int64
            c0 = np.cumsum(cnt) - cnt
            didx = np.arange(total, dtype=et)
            didx += np.repeat((lo_c - c0).astype(et), cnt)
            dx = np.take(Px, didx)
            dx -= np.repeat(H[pi0, 0], cnt)
            dy = np.take(Py, didx)
            dy -= np.repeat(H[pi0, 1], cnt)
            dz = np.take(Pz, didx)
            dz -= np.repeat(H[pi0, 2], cnt)
            if fold:
                np.abs(dx, out=dx)
                np.minimum(dx, bx - dx, out=dx)
                np.abs(dy, out=dy)
                np.minimum(dy, bx - dy, out=dy)
                np.abs(dz, out=dz)
                np.minimum(dz, bx - dz, out=dz)
            dx *= dx
            dy *= dy
            dz *= dz
            d2 = dx + dy
            d2 += dz
            inr = d2 < r2max
            if not inr.any():
                return
            sh = np.searchsorted(r2k, d2[inr], side="right").astype(np.int64)
            # probe-local accumulation: batch_row * nr + shell, dense
            probe = np.repeat(base_idx[pi0], cnt)[inr]
            keys = probe * nr + sh
            acc += np.bincount(keys, minlength=len(acc))
            if accw is not None:
                # per-pair particle weights: same exactness guard as the
                # fused kernel — bincount's f64 partials are exact while
                # every intermediate stays under 2^53
                wk = W[didx[inr]]
                if np.abs(wk).sum() < 2.0**53:
                    accw += np.bincount(
                        keys, weights=wk, minlength=len(accw)
                    ).astype(np.int64)
                else:
                    np.add.at(accw, keys, wk)

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            H64 = pdf[list(_H)].to_numpy(np.float64)
            H = H64.astype(np_dtype)
            ids_b = pdf[id_col].to_numpy(np.int64)
            pc = np.clip(np.floor(H64 / cs), 0, nc - 1).astype(np.int64)
            acc = np.zeros(n * nr, dtype=np.int64)
            accw = np.zeros(n * nr, dtype=np.int64) if W is not None else None
            rows = np.arange(n, dtype=np.int64)
            if fastpath_ok:
                interior = ((pc >= kk) & (pc <= nc - 1 - kk)).all(axis=1)
                ii = np.nonzero(interior)[0]
                bi = np.nonzero(~interior)[0]
                sweep(H[ii], H64[ii], pc[ii], False, acc, rows[ii], accw)
                sweep(H[bi], H64[bi], pc[bi], True, acc, rows[bi], accw)
            else:
                sweep(H, H64, pc, True, acc, rows, accw)
            nz = np.nonzero(acc)[0]
            if len(nz):
                out_cols = {
                    id_col: ids_b[nz // nr],
                    "shell_idx": (nz % nr).astype(np.int32),
                    "cnt": acc[nz],
                }
                if accw is not None:
                    out_cols["wsum"] = accw[nz]
                yield pd.DataFrame(out_cols)
        if prof:
            import json as _json
            import sys as _sys

            print("SJCS_KERN_PROF " + _json.dumps(
                {"task_cpu_s": round(_time.thread_time() - cpu0, 3)}),
                file=_sys.stderr, flush=True)

    probes = halos.select(
        F.col(id_col), *[F.col(c).alias(a) for c, a in zip(h_coords, _H)]
    )
    # the probe table is small by this plan's contract, so Spark's scan
    # bin-packing often lands it in one or two partitions — spread it
    # over the cluster (a shuffle of the SMALL side only)
    par = halos.sparkSession.sparkContext.defaultParallelism
    if probes.rdd.getNumPartitions() < par:
        probes = probes.repartition(par)
    schema = f"{id_col} long, shell_idx int, cnt long" + (
        ", wsum long" if weight_col else "")
    return probes.mapInPandas(kern, schema=schema)


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


def range_anti_join(
    particles: DataFrame,
    sites: DataFrame,
    radius: float,
    box: float = 1000.0,
    dtype: str = "float32",
    p_coords: tuple[str, str, str] = ("x", "y", "z"),
    s_coords: tuple[str, str, str] = ("x", "y", "z"),
    ncells: int | None = None,
) -> DataFrame:
    """Exclusion-zone filter: rows of `particles` with NO site at
    strict d < radius (periodic min-image) — the negation of the J3
    range join (``range_join_pairs``), the geofencing scrub shape.
    Rows pass through with ALL their columns.

    Plan: the site table (the small side by workload shape) explodes
    its ring cover and broadcasts; ONE broadcast ``left_anti`` join
    keyed on cell_id carries the distance predicate in the join
    condition, so the big table is scanned exactly once, never
    shuffled, and emits survivors map-side.  A particle matching no
    ring cell never even evaluates the distance.  Semantics equal
    NOT EXISTS(site with d^2 < r^2): the ring cover contains every
    cell a violating site could occupy, so anti-join misses nothing."""
    edges = np.asarray(
        [radius], dtype=np.float32 if dtype == "float32" else np.float64
    )
    r2 = squared_edges(edges)
    rmax = float(edges[-1])
    if not rmax < box / 2:
        raise ValueError(f"radius={rmax} must be < box/2={box / 2}")
    nc = ncells or grid_ncells(rmax, box)
    s = sites.select(*[F.col(c).alias(a) for c, a in zip(s_coords, _H)])
    s = explode_ring(s, nc, box, cols=_H, k=1, prune_radius=rmax,
                     out="_scell")
    p = with_cell(particles, nc, box, cols=p_coords, out="_pcell")
    d2 = squared_distance_expr(_H, p_coords, box, dtype)
    cond = (F.col("_pcell") == F.col("_scell")) & (d2 < F.lit(float(r2[0])))
    return p.join(F.broadcast(s), cond, "left_anti").drop("_pcell")


def shell_totals(counts: DataFrame, id_col: str = "halo_id") -> DataFrame:
    """A2 (corrected): grand total per shell over all halos.

    The reference's printed Total has an aliasing bug (``total =
    &counts[0]`` doubles halo 0, ``src/astr_rcount/main.c:400-429``);
    we compute the true total — SURVEY §2.11.6 says do not reproduce.
    """
    return counts.groupBy("shell_idx").agg(F.sum("cnt").alias("total"))
