"""Geodetic operator tests (operators/geo.py).

The three-engine agreement test on the quantized unit-sphere embed is
the load-bearing one: it is what entitles the hash-comparing driver
gate to check the geo queries at all (cos/sin are the only
non-correctly-rounded steps in the whole module — see geo.py header).
Everything downstream of the embed is exact integer math, pinned here
against brute-force numpy twins and hand-checked geodesy facts.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spatialjoincountovershells_spark.operators.geo import (
    DEG2RAD,
    GEO_QUANT,
    R_EARTH_KM,
    chord_edges_km,
    geo_nearest_site,
    geo_shell_count,
    geo_tile_expr,
    geo_tile_sql,
    geo_tile_stats,
    geo_unit_exprs,
    geo_unit_np,
    geo_unit_sql,
    key_latlon_exprs,
    latlon_np,
    sql_latlon,
    with_key_latlon,
)
from spatialjoincountovershells_spark.operators.tiling import morton_np


def _latlon_df(spark, keys):
    df = spark.createDataFrame(pd.DataFrame({"k": keys}))
    return with_key_latlon(df, "k")


def test_geo_embed_three_engines(spark):
    """Spark == DuckDB == numpy on the full embed pipeline over a key
    range covering every table the contract queries touch."""
    keys = np.arange(1, 4001, dtype=np.int64)
    lat, lon = latlon_np(keys)
    want = geo_unit_np(lat, lon)

    sdf = _latlon_df(spark, keys)
    qx, qy, qz = geo_unit_exprs(F.col("lat"), F.col("lon"))
    got = (
        sdf.select("k", qx.alias("qx"), qy.alias("qy"), qz.alias("qz"))
        .orderBy("k").toPandas()[["qx", "qy", "qz"]].to_numpy()
    )
    np.testing.assert_array_equal(got, want)

    lat_sql, lon_sql = sql_latlon("k")
    ux, uy, uz = geo_unit_sql(lat_sql, lon_sql)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"k": keys}))
    got_duck = con.execute(
        f"SELECT {ux} AS qx, {uy} AS qy, {uz} AS qz FROM t ORDER BY k"
    ).df().to_numpy()
    np.testing.assert_array_equal(got_duck, want)


def _brute_counts(pk, pl, hk, hl, edges_km):
    """Exact quantized-chord brute force (the operator's numpy twin)."""
    P = geo_unit_np(*latlon_np(pk)) if pl is None else geo_unit_np(*pl)
    H = geo_unit_np(*latlon_np(hk)) if hl is None else geo_unit_np(*hl)
    ch = chord_edges_km(edges_km)
    c2 = ch * ch
    d = P[None, :, :] - H[:, None, :]
    d2 = (d[..., 0] ** 2 + d[..., 1] ** 2) + d[..., 2] ** 2
    out = {}
    for i in range(len(hk)):
        sh = np.searchsorted(c2, d2[i], side="right")
        inr = d2[i] < c2[-1]
        for s in range(len(c2)):
            n = int(np.sum(inr & (sh == s)))
            if n:
                out[(int(hk[i]), s)] = n
    return out


EDGES_KM = [50.0, 100.0, 200.0, 400.0]


@pytest.mark.parametrize("plan", ["sql", "bcast"])
def test_geo_shell_count_vs_bruteforce(spark, plan):
    hk = np.arange(1, 41, dtype=np.int64)
    pk = np.arange(1, 2001, dtype=np.int64)
    # 400 km shells see few neighbors at 2000 uniform points; widen to
    # guarantee nonzero shells: use a denser synthetic cluster too
    want = _brute_counts(pk, None, hk, None, EDGES_KM)
    probes = _latlon_df(spark, hk).withColumnRenamed("k", "probe_id")
    points = _latlon_df(spark, pk)
    got = {
        (r.probe_id, r.shell_idx): r.cnt
        for r in geo_shell_count(
            probes, points, EDGES_KM, plan=plan
        ).collect()
    }
    assert got == want


def test_geo_shell_count_dense_cluster(spark):
    """A dense cluster around one probe exercises every shell."""
    rng = np.random.default_rng(7)
    n = 500
    lat = 48.0 + rng.uniform(-4.0, 4.0, n)   # ~+-445 km in lat
    lon = 2.0 + rng.uniform(-6.0, 6.0, n)
    plat = np.array([48.0]); plon = np.array([2.0])
    want = _brute_counts(
        np.arange(n), (lat, lon), np.array([1]), (plat, plon), EDGES_KM)
    probes = spark.createDataFrame(
        pd.DataFrame({"probe_id": [1], "lat": plat, "lon": plon}))
    points = spark.createDataFrame(pd.DataFrame({"lat": lat, "lon": lon}))
    got = {
        (r.probe_id, r.shell_idx): r.cnt
        for r in geo_shell_count(probes, points, EDGES_KM).collect()
    }
    assert got == want
    assert len(got) == 4  # all four shells hit


def test_geo_known_distance_paris_london(spark):
    """Hand-checked geodesy: Paris->London great-circle ~343.5 km ->
    the [200, 400) shell, and nothing else."""
    probes = spark.createDataFrame(
        pd.DataFrame({"probe_id": [1], "lat": [48.8566], "lon": [2.3522]}))
    points = spark.createDataFrame(
        pd.DataFrame({"lat": [51.5074], "lon": [-0.1278]}))
    rows = geo_shell_count(probes, points, EDGES_KM).collect()
    assert [(r.probe_id, r.shell_idx, r.cnt) for r in rows] == [(1, 3, 1)]


def test_geo_wrap_safety_antipodes(spark):
    """Antipodal and far points must never enter a shell (the periodic
    box's wrap margin cannot alias them in)."""
    probes = spark.createDataFrame(
        pd.DataFrame({"probe_id": [1], "lat": [0.0], "lon": [0.0]}))
    points = spark.createDataFrame(pd.DataFrame({
        "lat": [0.0, 0.0, 89.9, -45.0],
        "lon": [180.0, 179.0, 0.0, 180.0],
    }))
    # even at the operator's maximum radius
    edges = [1000.0, 6000.0]
    assert geo_shell_count(probes, points, edges).count() == 0


def test_geo_dateline_continuity(spark):
    """Points straddling the antimeridian are ~2.2 km apart, not
    ~40000 km: lon 179.99 vs -179.99."""
    probes = spark.createDataFrame(
        pd.DataFrame({"probe_id": [1], "lat": [0.0], "lon": [179.99]}))
    points = spark.createDataFrame(
        pd.DataFrame({"lat": [0.0], "lon": [-179.99]}))
    rows = geo_shell_count(probes, points, [10.0, 100.0]).collect()
    assert [(r.shell_idx, r.cnt) for r in rows] == [(0, 1)]


def test_chord_edges_monotone_and_bounded():
    ch = chord_edges_km([1.0, 10.0, 100.0, 1000.0, 6000.0])
    assert np.all(np.diff(ch) > 0)
    assert ch[-1] <= GEO_QUANT
    with pytest.raises(ValueError):
        chord_edges_km([100.0, 7000.0])
    with pytest.raises(ValueError):
        chord_edges_km([100.0, 50.0])


def test_geo_nearest_site_vs_numpy(spark):
    rows_k = np.arange(1, 301, dtype=np.int64)
    site_k = np.arange(1, 26, dtype=np.int64)
    R = geo_unit_np(*latlon_np(rows_k))
    S = geo_unit_np(*latlon_np(site_k))
    d = R[:, None, :] - S[None, :, :]
    d2 = (d[..., 0] ** 2 + d[..., 1] ** 2) + d[..., 2] ** 2
    best = np.argmin(d2, axis=1)  # argmin takes first == smallest id
    want = {
        int(rows_k[i]): (int(site_k[best[i]]), int(d2[i, best[i]]))
        for i in range(len(rows_k))
    }
    rows = _latlon_df(spark, rows_k).withColumnRenamed("k", "row_id")
    sites = _latlon_df(spark, site_k).withColumnRenamed("k", "site_id")
    got = {
        r.row_id: (r.site_id, r.d2)
        for r in geo_nearest_site(rows, sites).collect()
    }
    assert got == want


def test_geo_knn_vs_numpy(spark):
    rows_k = np.arange(1, 31, dtype=np.int64)
    cand_k = np.arange(1, 1001, dtype=np.int64)
    R = geo_unit_np(*latlon_np(rows_k))
    C = geo_unit_np(*latlon_np(cand_k))
    d = R[:, None, :] - C[None, :, :]
    d2 = (d[..., 0] ** 2 + d[..., 1] ** 2) + d[..., 2] ** 2
    k = 4
    want = {}
    for i in range(len(rows_k)):
        order = np.lexsort((cand_k, d2[i]))[:k]
        want[int(rows_k[i])] = [
            (int(cand_k[j]), r + 1, int(d2[i, j]))
            for r, j in enumerate(order)
        ]
    from spatialjoincountovershells_spark.operators.geo import geo_knn
    rows = _latlon_df(spark, rows_k).withColumnRenamed("k", "row_id")
    cands = _latlon_df(spark, cand_k).withColumnRenamed("k", "neighbor_id")
    out = geo_knn(rows, cands, k=k).collect()
    got: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.row_id, r.rank)):
        got.setdefault(r.row_id, []).append(
            (r.neighbor_id, r.rank, int(r.d2)))
    assert got == want


def test_geo_equirect_bridges_tile_ops(spark):
    """The equirect projection feeds planar tile operators unchanged:
    per-tile counts off the projection equal a numpy twin."""
    from spatialjoincountovershells_spark.operators.geo import (
        geo_equirect_exprs,
    )
    from spatialjoincountovershells_spark.operators.tiling import (
        rasterize_points,
    )
    keys = np.arange(1, 801, dtype=np.int64)
    lat, lon = latlon_np(keys)
    x = ((lon + 180.0) / 360.0) * 1000.0
    y = ((90.0 - lat) / 180.0) * 1000.0
    res = 8
    tx = np.clip(np.floor(x / (1000.0 / res)), 0, res - 1).astype(np.int64)
    ty = np.clip(np.floor(y / (1000.0 / res)), 0, res - 1).astype(np.int64)
    want = {}
    for t in tx * res + ty:
        want[int(t)] = want.get(int(t), 0) + 1
    df = _latlon_df(spark, keys)
    ex, ey = geo_equirect_exprs(F.col("lat"), F.col("lon"))
    proj = df.select(ex.alias("x"), ey.alias("y"))
    out = rasterize_points(proj, res=res).collect()
    got = {r.tile_id: r.n_points for r in out}
    assert got == want


def test_geo_tile_three_engines(spark):
    keys = np.arange(1, 2001, dtype=np.int64)
    lat, lon = latlon_np(keys)
    level = 5
    res = 1 << level
    tx = np.clip(np.floor(((lon + 180.0) / 360.0) * float(res)), 0, res - 1)
    ty = np.clip(np.floor(((90.0 - lat) / 180.0) * float(res)), 0, res - 1)
    want = morton_np(tx.astype(np.int64), ty.astype(np.int64))

    sdf = _latlon_df(spark, keys)
    got = (
        sdf.select("k", geo_tile_expr(F.col("lat"), F.col("lon"), level)
                   .alias("t"))
        .orderBy("k").toPandas()["t"].to_numpy()
    )
    np.testing.assert_array_equal(got, want)

    lat_sql, lon_sql = sql_latlon("k")
    tx_sql, ty_sql = geo_tile_sql(lat_sql, lon_sql, level)
    from spatialjoincountovershells_spark.operators.tiling import (
        morton_sql_ctes,
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"k": keys}))
    sql = (
        "WITH " + morton_sql_ctes("t", tx_sql, ty_sql)
        + " SELECT tile_id FROM m5 ORDER BY k"
    )
    got_duck = con.execute(sql).df()["tile_id"].to_numpy()
    np.testing.assert_array_equal(got_duck, want)


def test_geo_tile_clamps_poles_and_dateline(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "lat": [-90.0, 90.0, 0.0, 0.0],
        "lon": [0.0, 0.0, 179.999, -180.0],
    }))
    level = 3
    res = 1 << level
    got = df.select(
        geo_tile_expr(F.col("lat"), F.col("lon"), level).alias("t")
    ).collect()
    tids = [r.t for r in got]
    assert all(0 <= t < res * res for t in tids)
    # south pole -> ty = res-1 (clamped), north pole -> ty = 0
    tx0 = res // 2  # lon 0 -> middle tile
    assert tids[0] == morton_np(np.array([tx0]), np.array([res - 1]))[0]
    assert tids[1] == morton_np(np.array([tx0]), np.array([0]))[0]
    # east edge: tx = res-1; west edge: tx = 0
    assert tids[2] == morton_np(np.array([res - 1]), np.array([res // 2]))[0]
    assert tids[3] == morton_np(np.array([0]), np.array([res // 2]))[0]


def test_geo_tile_stats_counts(spark):
    keys = np.arange(1, 501, dtype=np.int64)
    df = _latlon_df(spark, keys)
    out = geo_tile_stats(df, level=2, latlon=("lat", "lon")).collect()
    assert sum(r.n for r in out) == 500
    assert all(0 <= r.tile_id < 16 for r in out)
    # weighted variant
    dfw = df.withColumn("w", (F.col("k") % 7).cast("long"))
    outw = geo_tile_stats(dfw, level=2, weight_col="w").collect()
    assert sum(r.wsum for r in outw) == int(sum(k % 7 for k in keys))


def test_geo_shell_count_weight_col_passthrough(spark):
    """ADVICE r3: weight_col must survive the lat/lon->lattice embedding
    — wsum per (probe, shell) equals the sum of point weights that the
    unweighted brute force puts in that shell."""
    hk = np.arange(1, 21, dtype=np.int64)
    pk = np.arange(1, 801, dtype=np.int64)
    w = (pk * 7) % 100
    want_c = _brute_counts(pk, None, hk, None, EDGES_KM)
    # weighted brute force over the same shell assignment
    from spatialjoincountovershells_spark.operators.geo import (
        chord_edges_km,
        geo_unit_np,
    )
    P = geo_unit_np(*latlon_np(pk))
    H = geo_unit_np(*latlon_np(hk))
    c2 = chord_edges_km(EDGES_KM) ** 2
    d = P[None, :, :] - H[:, None, :]
    d2 = (d[..., 0] ** 2 + d[..., 1] ** 2) + d[..., 2] ** 2
    want_w = {}
    for i in range(len(hk)):
        sh = np.searchsorted(c2, d2[i], side="right")
        for s in range(len(c2)):
            m = (d2[i] < c2[-1]) & (sh == s)
            if m.any():
                want_w[(int(hk[i]), s)] = int(w[m].sum())
    probes = _latlon_df(spark, hk).withColumnRenamed("k", "probe_id")
    points = _latlon_df(spark, pk).withColumn(
        "wt", (F.col("k") * 7 % 100).cast("long"))
    rows = geo_shell_count(
        probes, points, EDGES_KM, weight_col="wt").collect()
    got_c = {(r.probe_id, r.shell_idx): r.cnt for r in rows}
    got_w = {(r.probe_id, r.shell_idx): r.wsum for r in rows}
    assert got_c == want_c
    assert got_w == want_w


def test_latlon_np_rejects_negative_keys():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="nonnegative"):
        latlon_np(np.array([-1, 2], dtype=np.int64))


def test_trajectory_stats_vs_bruteforce(spark):
    """trajectory_stats == a numpy replay of the same lattice hops,
    including single-ping users (path_len/max_hop 0, n_moves 0)."""
    import pandas as pd
    from spatialjoincountovershells_spark.operators.geo import (
        geo_unit_np,
        latlon_np,
        trajectory_stats,
    )

    rng = np.random.default_rng(13)
    n = 2000
    keys = np.arange(n, dtype=np.int64) * 31 + 5
    users = rng.integers(0, 60, n)
    users[0] = 61  # one single-ping user
    ts = rng.permutation(n).astype(np.int64)
    pdf = pd.DataFrame({"event_id": keys, "user_id": users, "ts": ts})
    df = spark.createDataFrame(pdf)
    from spatialjoincountovershells_spark.operators.geo import with_key_latlon

    got = {
        r["user_id"]: (r["n_pings"], r["path_len"], r["max_hop"],
                       r["n_moves"], r["n_stays"])
        for r in trajectory_stats(with_key_latlon(df, "event_id")).collect()
    }

    U = geo_unit_np(*latlon_np(keys))
    want = {}
    for u in np.unique(users):
        idx = np.nonzero(users == u)[0]
        order = idx[np.lexsort((keys[idx], ts[idx]))]
        P = U[order]
        if len(P) > 1:
            d = P[1:] - P[:-1]
            hops = np.floor(np.sqrt(
                (d[:, 0] ** 2 + d[:, 1] ** 2) + d[:, 2] ** 2)).astype(np.int64)
        else:
            hops = np.array([], dtype=np.int64)
        want[int(u)] = (len(P), int(hops.sum()), int(hops.max()) if len(hops)
                        else 0, len(hops), int((hops < 1000).sum()))
    assert got == want
    assert got[61][3] == 0  # the single-ping user has no moves
