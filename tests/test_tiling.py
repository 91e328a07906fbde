"""Hierarchical Z-order (Morton) tile ops: three-engine agreement and
quadtree invariants (SURVEY §2.12 graft: raster<->vector / S2-style
encoding; reference analog is the flat cell grid of astr_rcount —
src/objects/MyStruct/MyStruct.h:24-52 — lifted to a multi-resolution
quadtree, which the C engine has no equivalent of)."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from spatialjoincountovershells_spark.operators.tiling import (
    morton_decode_np,
    morton_expr,
    morton_np,
    morton_sql_ctes,
    morton_tile_expr,
    tile_adaptive,
    tile_children,
    tile_cover,
    tile_dbscan,
    tile_getis_g,
    tile_join_counts,
    tile_kring_stats,
    tile_local_moran,
    tile_moran_i,
    tile_parent_expr,
    tile_rollup,
)


def test_morton_three_engine_agreement(spark):
    """Spark bit exprs, DuckDB CTE chain, and numpy produce the same
    Z-order id on the full 16-bit coordinate range."""
    rng = np.random.default_rng(7)
    tx = rng.integers(0, 65536, 3000)
    ty = rng.integers(0, 65536, 3000)
    # corners / diagonals on top of the random sweep
    tx = np.concatenate([tx, [0, 0, 65535, 65535, 1]])
    ty = np.concatenate([ty, [0, 65535, 0, 65535, 1]])
    want = morton_np(tx, ty)

    df = spark.createDataFrame(
        [(int(i), int(a), int(b)) for i, (a, b) in enumerate(zip(tx, ty))],
        "i long, tx long, ty long",
    )
    got = (
        df.select("i", morton_expr(F.col("tx"), F.col("ty")).alias("m"))
        .orderBy("i")
        .toPandas()["m"]
        .to_numpy()
    )
    assert np.array_equal(got, want)

    con = duckdb.connect()
    con.register("src", __import__("pandas").DataFrame(
        {"i": np.arange(len(tx)), "tx": tx, "ty": ty}))
    sql = f"WITH {morton_sql_ctes('src', 'tx', 'ty')} " \
          "SELECT tile_id FROM m5 ORDER BY i"
    got_sql = con.sql(sql).fetchnumpy()["tile_id"]
    assert np.array_equal(got_sql.astype(np.int64), want)


def test_morton_decode_and_hierarchy():
    rng = np.random.default_rng(11)
    tx = rng.integers(0, 65536, 2000)
    ty = rng.integers(0, 65536, 2000)
    m = morton_np(tx, ty)
    dx, dy = morton_decode_np(m)
    assert np.array_equal(dx, tx) and np.array_equal(dy, ty)
    # parent id is the morton of the halved coords (quadtree prefix)
    assert np.array_equal(m >> 2, morton_np(tx >> 1, ty >> 1))


def test_tile_parent_children_exprs(spark):
    df = spark.createDataFrame([(t,) for t in range(64)], "tile long")
    rows = df.select(
        "tile",
        tile_parent_expr(F.col("tile")).alias("parent"),
        tile_children(F.col("tile")).alias("kids"),
    ).collect()
    for r in rows:
        assert r.parent == r.tile >> 2
        assert list(r.kids) == [r.tile * 4 + i for i in range(4)]
        # every child's parent is the tile itself
        assert all(k >> 2 == r.tile for k in r.kids)


@pytest.mark.parametrize("max_level", [0, 3, 5])
def test_tile_rollup_vs_bruteforce(spark, max_level):
    rng = np.random.default_rng(13)
    pts = rng.uniform(0, 1000.0, size=(4000, 2))
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pts], "x double, y double"
    )
    got = {
        (r.level, r.tile_id): r.n_points
        for r in tile_rollup(df, max_level=max_level).collect()
    }
    want = {}
    for lvl in range(max_level + 1):
        res = 1 << lvl
        ts = 1000.0 / res
        tx = np.clip(np.floor(pts[:, 0] / ts).astype(np.int64), 0, res - 1)
        ty = np.clip(np.floor(pts[:, 1] / ts).astype(np.int64), 0, res - 1)
        m = morton_np(tx, ty)
        ids, counts = np.unique(m, return_counts=True)
        for i, c in zip(ids, counts):
            want[(lvl, int(i))] = int(c)
    assert got == want
    # conservation: every level sums to N
    for lvl in range(max_level + 1):
        assert sum(v for (l, _), v in got.items() if l == lvl) == len(pts)


@pytest.mark.parametrize("level,k", [(3, 1), (4, 2)])
def test_tile_kring_vs_bruteforce(spark, level, k):
    """kRing smoothing matches an exhaustive numpy grid walk, including
    edge truncation (no wraparound) and occupied-only output rows."""
    rng = np.random.default_rng(17)
    res = 1 << level
    # sparse enough that some ring neighbors are empty, dense enough
    # that rings overlap
    pts = rng.uniform(0, 1000.0, size=(300, 2))
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pts], "x double, y double"
    )
    got = {
        r.tile_id: (r.n_points, r.kring_sum, r.n_kring_tiles)
        for r in tile_kring_stats(df, level=level, k=k).collect()
    }
    ts = 1000.0 / res
    tx = np.clip(np.floor(pts[:, 0] / ts).astype(np.int64), 0, res - 1)
    ty = np.clip(np.floor(pts[:, 1] / ts).astype(np.int64), 0, res - 1)
    grid = np.zeros((res, res), dtype=np.int64)
    np.add.at(grid, (tx, ty), 1)
    want = {}
    for a in range(res):
        for b in range(res):
            if grid[a, b] == 0:
                continue
            xs = slice(max(a - k, 0), min(a + k, res - 1) + 1)
            ys = slice(max(b - k, 0), min(b + k, res - 1) + 1)
            sub = grid[xs, ys]
            tid = int(morton_np(np.array([a]), np.array([b]))[0])
            want[tid] = (int(grid[a, b]), int(sub.sum()),
                         int((sub > 0).sum()))
    assert got == want
    with pytest.raises(ValueError):
        tile_kring_stats(df, level=level, k=0)


def test_tile_kring_weighted_vs_bruteforce(spark):
    """weight_col= sums an integer mark (incl. negatives and zeros)
    instead of counts; occupancy stays point-presence so a zero-weight
    tile still emits its row."""
    level, k = 3, 1
    rng = np.random.default_rng(29)
    res = 1 << level
    pts = rng.uniform(0, 1000.0, size=(250, 2))
    wts = rng.integers(-3, 4, size=250)
    df = spark.createDataFrame(
        [(float(x), float(y), int(w)) for (x, y), w in zip(pts, wts)],
        "x double, y double, w long",
    )
    got = {
        r.tile_id: (r.n_points, r.kring_sum, r.n_kring_tiles)
        for r in tile_kring_stats(df, level=level, k=k,
                                  weight_col="w").collect()
    }
    ts = 1000.0 / res
    tx = np.clip(np.floor(pts[:, 0] / ts).astype(np.int64), 0, res - 1)
    ty = np.clip(np.floor(pts[:, 1] / ts).astype(np.int64), 0, res - 1)
    wgrid = np.zeros((res, res), dtype=np.int64)
    occ = np.zeros((res, res), dtype=bool)
    np.add.at(wgrid, (tx, ty), wts)
    occ[tx, ty] = True
    want = {}
    for a in range(res):
        for b in range(res):
            if not occ[a, b]:
                continue
            xs = slice(max(a - k, 0), min(a + k, res - 1) + 1)
            ys = slice(max(b - k, 0), min(b + k, res - 1) + 1)
            tid = int(morton_np(np.array([a]), np.array([b]))[0])
            want[tid] = (int(wgrid[a, b]), int(wgrid[xs, ys][occ[xs, ys]].sum()),
                         int(occ[xs, ys].sum()))
    assert want and got == want


def _grid_counts(pts, level):
    res = 1 << level
    ts = 1000.0 / res
    tx = np.clip(np.floor(pts[:, 0] / ts).astype(np.int64), 0, res - 1)
    ty = np.clip(np.floor(pts[:, 1] / ts).astype(np.int64), 0, res - 1)
    grid = np.zeros((res, res), dtype=np.int64)
    np.add.at(grid, (tx, ty), 1)
    return grid


def _blobby_points(seed=23, n_bg=120):
    """Gaussian blobs + sparse background: dense cores, borders, noise."""
    rng = np.random.default_rng(seed)
    blobs = [
        rng.normal(loc, 45.0, size=(150, 2))
        for loc in [(200, 200), (260, 280), (700, 300), (500, 800)]
    ]
    bg = rng.uniform(0, 1000.0, size=(n_bg, 2))
    return np.clip(np.vstack(blobs + [bg]), 0.0, 999.99)


def test_tile_dbscan_vs_bruteforce(spark):
    """Grid DBSCAN matches an exhaustive BFS over the count grid:
    same core components (min-Morton labels), same border adoption
    (min adjacent cluster), same noise set."""
    level, mp = 4, 4
    res = 1 << level
    pts = _blobby_points()
    grid = _grid_counts(pts, level)

    def mort(a, b):
        return int(morton_np(np.array([a]), np.array([b]))[0])

    core = grid >= mp
    comp = -np.ones((res, res), dtype=np.int64)
    want = {}
    # BFS components over 8-adjacent core tiles, label = min morton
    import collections
    cid = 0
    members = {}
    for a in range(res):
        for b in range(res):
            if not core[a, b] or comp[a, b] >= 0:
                continue
            q = collections.deque([(a, b)])
            comp[a, b] = cid
            cells = []
            while q:
                ca, cb = q.popleft()
                cells.append((ca, cb))
                for da in (-1, 0, 1):
                    for db in (-1, 0, 1):
                        na, nb = ca + da, cb + db
                        if (0 <= na < res and 0 <= nb < res
                                and core[na, nb] and comp[na, nb] < 0):
                            comp[na, nb] = cid
                            q.append((na, nb))
            members[cid] = min(mort(ca, cb) for ca, cb in cells)
            cid += 1
    for a in range(res):
        for b in range(res):
            if grid[a, b] == 0:
                continue
            if core[a, b]:
                want[mort(a, b)] = (int(grid[a, b]), "core",
                                    members[comp[a, b]])
                continue
            nbr = [
                members[comp[a + da, b + db]]
                for da in (-1, 0, 1) for db in (-1, 0, 1)
                if not (da == 0 and db == 0)
                and 0 <= a + da < res and 0 <= b + db < res
                and core[a + da, b + db]
            ]
            want[mort(a, b)] = (
                (int(grid[a, b]), "border", min(nbr)) if nbr
                else (int(grid[a, b]), "noise", -1)
            )
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pts], "x double, y double"
    )
    got = {
        r.tile_id: (r.n_points, r.role, r.cluster_id)
        for r in tile_dbscan(df, level=level, min_pts=mp).collect()
    }
    assert got == want
    roles = {v[1] for v in want.values()}
    assert roles == {"core", "border", "noise"}  # scenario is non-trivial
    assert len({v[2] for v in want.values() if v[1] == "core"}) >= 2


@pytest.mark.parametrize("level,seed", [(3, 23), (4, 5)])
def test_tile_moran_vs_bruteforce(spark, level, seed):
    """Moran's I matches exact-integer numpy over the FULL grid
    (empty cells included), queen weights, edge-truncated."""
    res = 1 << level
    pts = _blobby_points(seed=seed)
    grid = _grid_counts(pts, level)
    n_cells = res * res
    s = int(grid.sum())
    d = (n_cells * grid.astype(object) - s)  # python ints, exact
    c = 0
    dd = 0
    w = 0
    for a in range(res):
        for b in range(res):
            dd += int(d[a, b]) ** 2
            for da in (-1, 0, 1):
                for db in (-1, 0, 1):
                    if da == 0 and db == 0:
                        continue
                    na, nb = a + da, b + db
                    if 0 <= na < res and 0 <= nb < res:
                        c += int(d[a, b]) * int(d[na, nb])
                        w += 1
    want_iq = int(np.floor(
        ((float(c) / float(dd)) * float(n_cells)) / float(w) * 1048576.0
    ))
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pts], "x double, y double"
    )
    row = tile_moran_i(df, level=level).collect()
    assert len(row) == 1
    r = row[0]
    assert r.n_cells == n_cells
    assert r.n_points == s
    assert r.w_pairs == w
    assert r.n_occupied == int((grid > 0).sum())
    assert r.i_q20 == want_iq
    # blobby points are positively autocorrelated
    assert r.i_q20 > 0


@pytest.mark.parametrize("level,seed", [(3, 23), (4, 5)])
def test_tile_getis_vs_bruteforce(spark, level, seed):
    """Gi* matches exact-integer python math over the FULL grid
    (empty cells x=0), queen weights incl. self, edge-truncated;
    untouched cells are omitted from the output by contract."""
    import math

    res = 1 << level
    pts = _blobby_points(seed=seed)
    grid = _grid_counts(pts, level)
    n_cells = res * res
    s = int(grid.sum())
    s2 = int((grid.astype(object) ** 2).sum())
    b = n_cells * s2 - s * s
    want = {}
    for a_ in range(res):
        for b_ in range(res):
            swi = 0
            w = 0
            touched = False
            for da in (-1, 0, 1):
                for db in (-1, 0, 1):
                    na, nb = a_ + da, b_ + db
                    if 0 <= na < res and 0 <= nb < res:
                        w += 1
                        swi += int(grid[na, nb])
                        if grid[na, nb] > 0:
                            touched = True
            if not touched:
                continue
            num = n_cells * swi - s * w
            c = n_cells * w - w * w
            gi = float(num) / math.sqrt(float(b) * float(c)
                                        / float(n_cells - 1))
            key = int(morton_np(np.array([a_]), np.array([b_]))[0])
            want[key] = (int(grid[a_, b_]), swi, w,
                         int(np.floor(gi * 1048576.0)))
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pts], "x double, y double"
    )
    got = {
        r.tile_id: (r.n_points, r.ring_sum, r.w, r.gi_q20)
        for r in tile_getis_g(df, level=level).collect()
    }
    assert got == want
    # blobby data: at least one clear hot spot and one cold cell
    assert max(v[3] for v in want.values()) > 2 * 1048576
    assert min(v[3] for v in want.values()) < 0


@pytest.mark.parametrize("cap,max_level", [(8, 4), (3, 3), (10_000, 4), (5, 0)])
def test_tile_adaptive_vs_bruteforce(spark, cap, max_level):
    """Adaptive quadtree leaves match a literal recursive python
    splitter; leaves partition the points (counts sum to n, no leaf is
    another's ancestor); cap=10000 degenerates to the single root
    leaf; max_level=0 cannot split regardless of cap."""
    pts = _blobby_points(seed=77)
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pts], "x double, y double"
    )

    def tile_of(p, level):
        res = 1 << level
        tx = min(max(int(np.floor(p[0] / (1000.0 / res))), 0), res - 1)
        ty = min(max(int(np.floor(p[1] / (1000.0 / res))), 0), res - 1)
        return int(morton_np(np.array([tx]), np.array([ty]))[0])

    want = {}

    def split(level, tile, idx):
        if len(idx) == 0:
            return
        if len(idx) <= cap or level == max_level:
            want[(level, tile)] = len(idx)
            return
        for q in range(4):
            child = (tile << 2) | q
            sub = [i for i in idx if tile_of(pts[i], level + 1) == child]
            split(level + 1, child, sub)

    split(0, 0, list(range(len(pts))))
    got = {
        (r.level, r.tile_id): r.n_points
        for r in tile_adaptive(df, max_level=max_level, capacity=cap).collect()
    }
    assert got == want
    assert sum(got.values()) == len(pts)
    # no leaf is an ancestor of another
    keys = sorted(got)
    for la, ta in keys:
        for lb, tb in keys:
            if lb > la:
                assert tb >> (2 * (lb - la)) != ta or (la, ta) == (lb, tb)
    if cap == 10_000 or max_level == 0:
        assert got == {(0, 0): len(pts)}
    elif cap == 8:
        # blobby data at this shape really is depth-heterogeneous
        assert len({lv for lv, _ in got}) > 1


@pytest.mark.parametrize("level,seed", [(3, 23), (4, 5)])
def test_tile_local_moran_vs_bruteforce(spark, level, seed):
    """LISA matches exact-integer python math over the FULL grid:
    I_i = (n x_i - S)(n r_i - m_i S)/(n S2 - S^2), queen weights excl.
    self, quadrant from the exact integer signs; per-cell I_i sums to
    W * global I (Anselin's decomposition) up to the untouched-cell
    background terms."""
    res = 1 << level
    pts = _blobby_points(seed=seed)
    grid = _grid_counts(pts, level)
    n_cells = res * res
    s = int(grid.sum())
    s2 = int((grid.astype(object) ** 2).sum())
    b = n_cells * s2 - s * s
    want = {}
    for a_ in range(res):
        for b_ in range(res):
            r_sum = 0
            m = 0
            touched = grid[a_, b_] > 0
            for da in (-1, 0, 1):
                for db in (-1, 0, 1):
                    if da == 0 and db == 0:
                        continue
                    na, nb = a_ + da, b_ + db
                    if 0 <= na < res and 0 <= nb < res:
                        m += 1
                        r_sum += int(grid[na, nb])
                        if grid[na, nb] > 0:
                            touched = True
            if not touched:
                continue
            dx = n_cells * int(grid[a_, b_]) - s
            dr = n_cells * r_sum - m * s
            ii = float(dx * dr) / float(b)
            quad = (1 if dx > 0 and dr > 0 else
                    2 if dx <= 0 and dr <= 0 else
                    3 if dx > 0 else 4)
            key = int(morton_np(np.array([a_]), np.array([b_]))[0])
            want[key] = (int(grid[a_, b_]), r_sum, m, quad,
                         int(np.floor(ii * 1048576.0)))
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pts], "x double, y double"
    )
    got = {
        r.tile_id: (r.n_points, r.neigh_sum, r.m, r.quad, r.ii_q20)
        for r in tile_local_moran(df, level=level).collect()
    }
    assert got == want
    # blobby data exhibits all the interesting quadrants: hot cores
    # (HH, positive I) and cold background (LL, positive I)
    quads = {v[3] for v in want.values()}
    assert 1 in quads and 2 in quads


def test_tile_getis_weighted_vs_bruteforce(spark):
    """weight_col: Gi* over an integer mark sum per tile instead of the
    row count; occupancy still row-driven (a tile whose weights sum to
    0 is stamped and emitted)."""
    import math

    level, res = 3, 8
    pts = _blobby_points(seed=31)
    ws = [int(i % 7) - 1 for i in range(len(pts))]  # includes negatives
    n_cells = res * res
    grid = np.zeros((res, res), dtype=object)
    occ = np.zeros((res, res), dtype=bool)
    for (x, y), w in zip(pts, ws):
        a = min(max(int(np.floor(x / (1000.0 / res))), 0), res - 1)
        b = min(max(int(np.floor(y / (1000.0 / res))), 0), res - 1)
        grid[a, b] += w
        occ[a, b] = True
    s = int(grid.sum())
    s2 = int((grid ** 2).sum())
    bden = n_cells * s2 - s * s
    want = {}
    for a_ in range(res):
        for b_ in range(res):
            swi = 0
            w = 0
            touched = False
            for da in (-1, 0, 1):
                for db in (-1, 0, 1):
                    na, nb = a_ + da, b_ + db
                    if 0 <= na < res and 0 <= nb < res:
                        w += 1
                        swi += int(grid[na, nb])
                        if occ[na, nb]:
                            touched = True
            if not touched:
                continue
            num = n_cells * swi - s * w
            c = n_cells * w - w * w
            gi = float(num) / math.sqrt(float(bden) * float(c)
                                        / float(n_cells - 1))
            key = int(morton_np(np.array([a_]), np.array([b_]))[0])
            want[key] = (int(grid[a_, b_]), swi, w,
                         int(np.floor(gi * 1048576.0)))
    df = spark.createDataFrame(
        [(float(x), float(y), int(w)) for (x, y), w in zip(pts, ws)],
        "x double, y double, w long",
    )
    got = {
        r.tile_id: (r.n_points, r.ring_sum, r.w, r.gi_q20)
        for r in tile_getis_g(df, level=level, weight_col="w").collect()
    }
    assert got == want


@pytest.mark.parametrize("level,min_count", [(4, 3), (4, 1), (3, 10_000)])
def test_tile_join_counts_vs_bruteforce(spark, level, min_count):
    """BB/BW/WW join counts vs a literal python adjacency scan over
    the full grid (empty cells white); bb+bw+ww always equals the
    total queen joins; all-white degenerate case emits zeros."""
    res = 1 << level
    pts = _blobby_points(seed=41)
    grid = _grid_counts(pts, level)
    black = grid >= min_count
    bb = bw = ww = 0
    for a_ in range(res):
        for b_ in range(res):
            for da, db in ((0, 1), (1, -1), (1, 0), (1, 1)):
                na, nb = a_ + da, b_ + db
                if 0 <= na < res and 0 <= nb < res:
                    pair = int(black[a_, b_]) + int(black[na, nb])
                    if pair == 2:
                        bb += 1
                    elif pair == 1:
                        bw += 1
                    else:
                        ww += 1
    wp = (4 * res * (res - 1) + 4 * (res - 1) * (res - 1)) // 2
    assert bb + bw + ww == wp
    nb_ = int(black.sum())
    n_cells = res * res
    exp = int(np.floor(
        (float(wp) * float(nb_ * (nb_ - 1)) / (float(n_cells) * (n_cells - 1)))
        * 1048576.0
    ))
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pts], "x double, y double"
    )
    r = tile_join_counts(df, level=level, min_count=min_count).collect()
    assert len(r) == 1
    got = r[0]
    assert (got.n_cells, got.n_black, got.bb, got.bw, got.ww,
            got.exp_bb_q20) == (n_cells, nb_, bb, bw, ww, exp)
    if min_count == 10_000:
        assert (nb_, bb, bw) == (0, 0, 0) and ww == wp
    elif min_count == 3:
        # blobby data, sparse black set: observed BB >> expected
        assert 0 < nb_ < n_cells // 2
        assert got.bb * 1048576 > 2 * got.exp_bb_q20


def test_tile_cover_vs_bruteforce(spark):
    boxes = [
        (1, 100.0, 300.0, 50.0, 60.0),
        (2, 999.0, 999.5, 0.0, 1000.0),   # clamps at both borders
        (3, 0.0, 0.0, 0.0, 0.0),          # degenerate -> single tile
        (4, 900.0, 100.0, 0.0, 50.0),     # inverted (unsplit wrap) -> EMPTY,
    ]                                      # mirroring generate_series
    df = spark.createDataFrame(
        boxes, "box_id long, xmin double, xmax double, ymin double, ymax double"
    )
    level, res = 4, 16
    ts = 1000.0 / res
    got = sorted((r.box_id, r.tile_id)
                 for r in tile_cover(df, level=level).collect())
    want = []
    clamp = lambda v: min(max(int(np.floor(v / ts)), 0), res - 1)  # noqa: E731
    for bid, x0, x1, y0, y1 in boxes:
        for a in range(clamp(x0), clamp(x1) + 1):
            for b in range(clamp(y0), clamp(y1) + 1):
                want.append(
                    (bid, int(morton_np(np.array([a]), np.array([b]))[0]))
                )
    assert got == sorted(want)
    assert not any(bid == 4 for bid, _ in got)


def test_morton_tile_expr_level_bounds(spark):
    df = spark.createDataFrame([(500.0, 500.0)], "x double, y double")
    with pytest.raises(ValueError):
        df.select(morton_tile_expr(F.col("x"), F.col("y"), 17))
    # level 0 is the root tile for every in-box point
    assert df.select(
        morton_tile_expr(F.col("x"), F.col("y"), 0).alias("t")
    ).first().t == 0


def test_quadkey_three_engine_agreement(spark):
    """quadkey strings agree across Spark / DuckDB / numpy, and a
    parent's quadkey is the child's string prefix (the ancestor test
    quadkeys exist for)."""
    from spatialjoincountovershells_spark.operators.tiling import (
        quadkey_expr,
        quadkey_np,
        quadkey_sql,
    )

    rng = np.random.default_rng(3)
    level = 6
    m = rng.integers(0, 4 ** level, 2000)
    m = np.concatenate([m, [0, 4 ** level - 1, 1]])
    want = quadkey_np(m, level)

    df = spark.createDataFrame(
        [(int(i), int(t)) for i, t in enumerate(m)], "i long, tile long")
    got = (
        df.select("i", quadkey_expr(F.col("tile"), level).alias("q"))
        .orderBy("i").toPandas()["q"].to_numpy()
    )
    assert list(got) == list(want)

    con = duckdb.connect()
    con.register("src", __import__("pandas").DataFrame(
        {"i": np.arange(len(m)), "tile": m}))
    got_sql = con.sql(
        f"SELECT {quadkey_sql('tile', level)} AS q FROM src ORDER BY i"
    ).fetchnumpy()["q"]
    assert list(got_sql) == list(want)

    # prefix property: parent (level-1) quadkey prefixes the child's
    parents = quadkey_np(m >> 2, level - 1)
    assert all(c.startswith(p) for c, p in zip(want, parents))
