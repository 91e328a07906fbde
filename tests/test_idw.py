"""idw_interpolate vs a literal numpy all-pairs recomputation."""

from __future__ import annotations

import numpy as np
import pytest

from spatialjoincountovershells_spark.operators.idw import idw_interpolate

BOX = 1000.0


def _min_image_d2(q, d):
    dd = np.abs(q[:, None, :] - d[None, :, :])
    dd = np.minimum(dd, BOX - dd)
    # the operator's fixed tree is (dx2 + dy2) + dz2 in f64
    return (dd[..., 0] ** 2 + dd[..., 1] ** 2) + dd[..., 2] ** 2


def _brute_idw(q, d, v, radius, power, wshift=30, oshift=10):
    d2 = _min_image_d2(q, d)
    out = {}
    for i in range(len(q)):
        m = d2[i] < radius * radius
        if not m.any():
            continue
        sel = d2[i][m]
        vals = v[m]
        exact = sel == 0.0
        if exact.any():
            est = np.floor(
                (float(vals[exact].sum()) / float(exact.sum())) * 2.0**oshift
            )
        else:
            if power == 1:
                den = np.sqrt(sel)
            elif power == 2:
                den = sel
            elif power == 3:
                den = sel * np.sqrt(sel)
            else:
                den = sel * sel
            wq = np.minimum(
                np.floor(2.0**wshift / den), float(1 << 62)
            ).astype(np.int64)
            num = int((wq.astype(object) * vals.astype(object)).sum())
            est = np.floor((float(num) / float(int(wq.sum()))) * 2.0**oshift)
        out[i] = (int(m.sum()), int(est))
    return out


@pytest.mark.parametrize("power", [1, 2, 3])
def test_idw_vs_bruteforce(spark, power):
    rng = np.random.default_rng(11)
    q = rng.uniform(0, BOX, size=(60, 3))
    d = rng.uniform(0, BOX, size=(800, 3))
    # plant exact collisions: queries 0 and 1 sit on data points
    d[5] = q[0]
    d[6] = q[0]
    d[7] = q[1]
    v = rng.integers(-50, 500, size=800)
    sq = spark.createDataFrame(
        [(i, float(x), float(y), float(z)) for i, (x, y, z) in enumerate(q)],
        "halo_id long, x double, y double, z double",
    )
    sd = spark.createDataFrame(
        [(float(x), float(y), float(z), int(w))
         for (x, y, z), w in zip(d, v)],
        "x double, y double, z double, v long",
    )
    got = {
        r.halo_id: (r.n_neighbors, r.idw_q)
        for r in idw_interpolate(
            sq, sd, radius=150.0, value_col="v", power=power
        ).collect()
    }
    want = _brute_idw(q, d, v, 150.0, power)
    assert got == want and len(want) > 40
    # the planted coincident queries resolve to their exact-hit means
    assert got[0][1] == int(np.floor((v[5] + v[6]) / 2.0 * 1024.0))
    assert got[1][1] == v[7] * 1024


def test_idw_rejects_bad_power(spark):
    sq = spark.createDataFrame([(1, 1.0, 1.0, 1.0)],
                               "halo_id long, x double, y double, z double")
    with pytest.raises(ValueError):
        idw_interpolate(sq, sq.withColumn("v", sq.halo_id), 10.0,
                        value_col="v", power=5).collect()
