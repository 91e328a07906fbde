"""Tests for operators/sketches.py — KMV distinct-count sketch."""

import numpy as np

from spatialjoincountovershells_spark.functions.texthash import P, affine_consts
from spatialjoincountovershells_spark.operators.sketches import kmv_distinct

A0, C0 = affine_consts(0)


def _h(x: int) -> int:
    return (A0 * (((x % P) + P) % P) + C0) % P


def _brute_kmv(values, k):
    hs = sorted({_h(v) for v in values})
    n_kept = min(len(hs), k)
    kth = hs[n_kept - 1]
    est = n_kept if n_kept < k else ((k - 1) * P) // kth
    return n_kept, kth, est


def test_kmv_matches_brute_force(spark):
    rng = np.random.default_rng(7)
    rows = [("g%d" % (i % 3), int(rng.integers(0, 500))) for i in range(4000)]
    df = spark.createDataFrame(rows, "grp string, v long")
    got = {
        r["grp"]: (r["n_kept"], r["kth_hash"], r["est_distinct"])
        for r in kmv_distinct(df, ["grp"], "v", k=16).collect()
    }
    for g in ("g0", "g1", "g2"):
        vals = [v for gg, v in rows if gg == g]
        assert got[g] == _brute_kmv(vals, 16), g


def test_kmv_exact_branch_below_k(spark):
    """Fewer distinct values than k: the sketch IS the exact count."""
    rows = [("a", v) for v in [1, 2, 3, 2, 1]] + [("b", 9)]
    df = spark.createDataFrame(rows, "grp string, v long")
    got = {r["grp"]: r["est_distinct"]
           for r in kmv_distinct(df, ["grp"], "v", k=8).collect()}
    assert got == {"a": 3, "b": 1}


def test_kmv_partition_independent_and_duplicate_insensitive(spark):
    """The estimate is a pure function of the distinct value SET:
    repartitioning and duplicating rows change nothing (the merge
    rule: union hash sets, re-take k smallest)."""
    rows = [("g", int(v)) for v in range(300)]
    df = spark.createDataFrame(rows, "grp string, v long")
    base = kmv_distinct(df, ["grp"], "v", k=24).collect()[0]
    rep = kmv_distinct(df.repartition(17), ["grp"], "v", k=24).collect()[0]
    dup = kmv_distinct(df.union(df).union(df), ["grp"], "v", k=24).collect()[0]
    assert tuple(base) == tuple(rep) == tuple(dup)


def test_kmv_estimate_accuracy(spark):
    """~1/sqrt(k) relative error: at k=64 over 5000 distinct values the
    estimate should land within 40% (generous 3-sigma-ish bound —
    deterministic here, the margin is for the fixed hash draw)."""
    rows = [("g", int(v) * 7919 + 13) for v in range(5000)]
    df = spark.createDataFrame(rows, "grp string, v long")
    est = kmv_distinct(df, ["grp"], "v", k=64).collect()[0]["est_distinct"]
    assert 3000 <= est <= 7000, est


# ------------------------------------------------------------- count-min

def test_countmin_never_undercounts(spark):
    """CM guarantee: est >= true for every queried value, and exact
    when w is large relative to distinct values (no collisions
    likely); absent values may read > 0 but never negative."""
    from spatialjoincountovershells_spark.operators.sketches import (
        countmin_estimate,
        countmin_sketch,
    )

    rng = np.random.default_rng(13)
    vocab = [f"tok{i}" for i in range(60)]
    weights = np.array([1.0 / (i + 1) for i in range(60)])
    stream = list(rng.choice(vocab, size=5000, p=weights / weights.sum()))
    true = {t: stream.count(t) for t in vocab}
    df = spark.createDataFrame([(t,) for t in stream], "tok string")
    sk = countmin_sketch(df, "tok", d=4, w=256)
    qs = spark.createDataFrame(
        [(t,) for t in vocab + ["never_seen"]], "term string"
    )
    est = {
        r["term"]: r["est_count"]
        for r in countmin_estimate(sk, qs, d=4, w=256).collect()
    }
    for t in vocab:
        assert est[t] >= true[t], t
    # 60 distinct over 4x256 buckets: overshoot should be tiny
    assert sum(est[t] - true[t] for t in vocab) <= 200
    assert est["never_seen"] >= 0


def test_countmin_sketch_bounded_and_mergeable(spark):
    """Grid never exceeds d*w rows however large the input, and
    sketch(A union B) == cellwise sum of sketch(A) + sketch(B)."""
    from spatialjoincountovershells_spark.operators.sketches import (
        countmin_sketch,
    )

    a = spark.createDataFrame([(f"x{i % 7}",) for i in range(900)], "v string")
    b = spark.createDataFrame([(f"y{i % 5}",) for i in range(600)], "v string")
    d, w = 3, 64
    ga = {(r["row"], r["bucket"]): r["cnt"]
          for r in countmin_sketch(a, "v", d=d, w=w).collect()}
    gb = {(r["row"], r["bucket"]): r["cnt"]
          for r in countmin_sketch(b, "v", d=d, w=w).collect()}
    gu = {(r["row"], r["bucket"]): r["cnt"]
          for r in countmin_sketch(a.union(b), "v", d=d, w=w).collect()}
    assert len(gu) <= d * w
    merged = dict(ga)
    for kk, v in gb.items():
        merged[kk] = merged.get(kk, 0) + v
    assert merged == gu


def test_bloom_never_false_negative_and_merge(spark):
    """Every inserted key must hit; absent keys hit rarely; the sketch
    of a union equals the bit_or merge of the parts' sketches."""
    from pyspark.sql import functions as F

    from spatialjoincountovershells_spark.operators.sketches import (
        bloom_might_contain,
        bloom_words,
    )

    rows = [("g1", i) for i in range(200)] + [("g2", i) for i in range(50, 80)]
    df = spark.createDataFrame(rows, "grp string, uid long")
    sk = bloom_words(df, ["grp"], "uid", m_words=8, k=4)
    grid = {(r.grp, r.word_idx): r.word for r in sk.collect()}
    assert len(grid) == 16  # full 8-word grid for both groups

    # no false negatives
    probes = spark.createDataFrame(rows, "grp string, uid long").distinct()
    got = bloom_might_contain(sk, probes, ["grp"], "uid", m_words=8, k=4)
    assert got.where(F.col("hit") == 0).count() == 0

    # absent keys: g2 only inserted 30 keys into 504 bits -> low fp
    absent = spark.createDataFrame(
        [("g2", i) for i in range(10_000, 10_400)], "grp string, uid long"
    )
    fp = bloom_might_contain(sk, absent, ["grp"], "uid", m_words=8, k=4)
    fp_rate = fp.where(F.col("hit") == 1).count() / 400
    assert fp_rate < 0.10, fp_rate

    # mergeability: bit_or of the halves' grids == grid of the union
    h1 = bloom_words(df.where(F.col("uid") < 100), ["grp"], "uid")
    h2 = bloom_words(df.where(F.col("uid") >= 100), ["grp"], "uid")
    merged = (
        h1.unionAll(h2)
        .groupBy("grp", "word_idx")
        .agg(F.expr("bit_or(word)").alias("word"))
    )
    assert {(r.grp, r.word_idx): r.word for r in merged.collect()} == grid


def test_hist_quantiles_vs_bruteforce(spark):
    """hist_quantiles vs a python brute force of its own contract, and
    vs numpy's inverted-CDF quantile at the bin level.  Pinned: the
    row's bin is the smallest with cum >= ceil(q*n); clamping at 0 and
    n_bins-1; NULLs dropped; every group emits every quantile."""
    import math

    from spatialjoincountovershells_spark.operators.sketches import (
        hist_quantiles,
    )

    vals = {
        "a": [0.01 * i for i in range(100)] + [5.0] * 17 + [-3.0, 1e9],
        "b": [0.5],
    }
    rows = [(g, v) for g, vs in vals.items() for v in vs] + [("a", None)]
    df = spark.createDataFrame(rows, "grp string, value double")
    qs = (500000, 950000, 990000)
    got = {
        (r.grp, r.q_ppm): (r.bin, r.n_le, r.n_total)
        for r in hist_quantiles(df, ["grp"], "value", qs_ppm=qs).collect()
    }
    assert len(got) == 2 * len(qs)
    for g, vs in vals.items():
        bins = sorted(min(max(math.floor(v * 8), 0), 511) for v in vs)
        n = len(bins)
        for q in qs:
            k = (q * n + 999999) // 1000000
            want_bin = bins[k - 1]
            n_le = sum(1 for b in bins if b <= want_bin)
            assert got[(g, q)] == (want_bin, n_le, n), (g, q)
    # clamp pins: -3.0 -> bin 0 present in group a's histogram; 1e9 ->
    # bin 511 is a's p99+ tail only if ceil(.99*119)=118th value
    assert got[("b", 500000)] == (4, 1, 1)  # floor(0.5*8)=4
