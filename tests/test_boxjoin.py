"""box_overlap_join vs a literal numpy all-pairs overlap scan."""

from __future__ import annotations

import numpy as np
import pytest

from spatialjoincountovershells_spark.operators.boxjoin import box_overlap_join


def _rects(rng, n, max_ext=60.0):
    """Random rects in [0,1000)^2; extents may cross the box edge."""
    lo = rng.uniform(0, 1000.0, size=(n, 2))
    ext = rng.uniform(0, max_ext, size=(n, 2))
    return np.hstack([lo, lo + ext])  # xmin, ymin, xmax, ymax


def _brute_pairs(ra, rb):
    out = set()
    for i, (axn, ayn, axx, ayx) in enumerate(ra):
        hit = (
            (axn <= rb[:, 2]) & (rb[:, 0] <= axx)
            & (ayn <= rb[:, 3]) & (rb[:, 1] <= ayx)
        )
        for j in np.nonzero(hit)[0]:
            out.add((i, int(j)))
    return out


def _df(spark, r):
    return spark.createDataFrame(
        [(i, float(x0), float(x1), float(y0), float(y1))
         for i, (x0, y0, x1, y1) in enumerate(r)],
        "rid long, xmin double, xmax double, ymin double, ymax double",
    )


@pytest.mark.parametrize("level", [2, 5])
def test_box_join_vs_bruteforce(spark, level):
    """Pair set matches brute force and is level-invariant; each pair
    appears exactly once (reference-point dedup, no distinct)."""
    rng = np.random.default_rng(57)
    ra, rb = _rects(rng, 200), _rects(rng, 150)
    got_rows = box_overlap_join(
        _df(spark, ra).withColumnRenamed("rid", "a_id"),
        _df(spark, rb).withColumnRenamed("rid", "b_id"),
        level=level,
    ).collect()
    got = [(r.a_id, r.b_id) for r in got_rows]
    want = _brute_pairs(ra, rb)
    assert len(got) == len(set(got)), "pair emitted more than once"
    assert set(got) == want and len(want) > 50
    # intersection rectangle is the exact clip
    for r in got_rows:
        i, j = r.a_id, r.b_id
        assert r.ix_xmin == max(ra[i][0], rb[j][0])
        assert r.ix_xmax == min(ra[i][2], rb[j][2])
        assert r.ix_ymin == max(ra[i][1], rb[j][1])
        assert r.ix_ymax == min(ra[i][3], rb[j][3])


def test_box_join_edges_and_degenerates(spark):
    """Touching edges overlap (closed intervals, the reference's
    cmpnlt semantics); zero-extent rects (points) join; an inverted
    rect joins nothing."""
    a = [(1, 10.0, 20.0, 10.0, 20.0),   # base
         (2, 30.0, 30.0, 30.0, 30.0),   # degenerate point
         (3, 50.0, 40.0, 0.0, 5.0)]     # inverted (xmin > xmax)
    b = [(10, 20.0, 25.0, 15.0, 18.0),  # touches a1's right edge
         (11, 25.0, 35.0, 25.0, 35.0),  # contains the point a2
         (12, 40.0, 60.0, 0.0, 10.0)]   # overlaps a3's span if valid
    sa = spark.createDataFrame(
        a, "a_id long, xmin double, xmax double, ymin double, ymax double")
    sb = spark.createDataFrame(
        b, "b_id long, xmin double, xmax double, ymin double, ymax double")
    got = {(r.a_id, r.b_id)
           for r in box_overlap_join(sa, sb, level=4).collect()}
    assert got == {(1, 10), (2, 11)}
