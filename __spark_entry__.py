"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry runs an engine operator from SURVEY.md §2 over
the driver's parquet tables; ``oracle_sql()`` holds the DuckDB-runnable
ANSI-SQL equivalent.  Cross-engine determinism strategy: spatial
coordinates are derived from integer keys as exact multiples of 1/64
(functions/keycoords.py), so every float64 comparison is exact and the
two engines agree bit-for-bit; non-spatial queries output only
integers/strings.  String/embedding hash operators (minhash, simhash,
fingerprint, LSH) use the SQL-derivable texthash family
(functions/texthash.py), so they are fully oracle-backed too; the only
rows-only entries left are image-payload ones (sjcs_images f32 —
pinned instead by byte-exact reference goldens — and image_roundtrip's
PSNR property, which has no reasonable SQL twin).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spatialjoincountovershells_spark.functions.keycoords import (  # noqa: E402
    CONSTS as KEY_CONSTS,
    sql_coord,
    with_key_coords,
)
from spatialjoincountovershells_spark.operators.boxjoin import (  # noqa: E402
    box_overlap_join,
)
from spatialjoincountovershells_spark.operators.idw import (  # noqa: E402
    idw_interpolate,
)
from spatialjoincountovershells_spark.functions.phash import decode_phash  # noqa: E402
from spatialjoincountovershells_spark.operators.cells import cell_stats, with_cell  # noqa: E402
from spatialjoincountovershells_spark.operators.dedup import (  # noqa: E402
    exact_dedup,
    dedup_clusters,
    dup_spans,
    minhash_lsh_pairs,
    simhash_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from spatialjoincountovershells_spark.operators.corpus import (  # noqa: E402
    corpus_clean,
    corpus_clean_stats,
    decontaminate,
    pack_sequences,
    split_assign,
    stratified_sample,
)
from spatialjoincountovershells_spark.operators.clustering import (  # noqa: E402
    dbscan_points,
    lloyd_kmeans,
    pq_ann_topk,
    pq_encode,
    semantic_dedup,
)
from spatialjoincountovershells_spark.operators.geo import (  # noqa: E402
    chord_edges_km,
    geo_equirect_exprs,
    geo_equirect_sql,
    geo_knn,
    geo_nearest_site,
    geo_shell_count,
    geo_tile_expr,
    geo_tile_sql,
    geo_tile_stats,
    geo_unit_sql,
    sql_latlon,
    trajectory_stats,
    with_key_latlon,
)
from spatialjoincountovershells_spark.operators.knn import knn  # noqa: E402
from spatialjoincountovershells_spark.operators.pip import point_in_polygon  # noqa: E402
from spatialjoincountovershells_spark.operators.semi_join import filter_halos  # noqa: E402
from spatialjoincountovershells_spark.operators.sketches import (  # noqa: E402
    bloom_might_contain,
    bloom_words,
    countmin_estimate,
    countmin_sketch,
    hist_quantiles,
    kmv_distinct,
    kmv_hash_sql,
)
from spatialjoincountovershells_spark.operators.correlation import (  # noqa: E402
    landy_szalay_xi,
    nn_dist_cdf,
    ripley_k,
    pair_totals,
)
from spatialjoincountovershells_spark.operators.shell_count import (  # noqa: E402
    range_anti_join,
    range_join_pairs,
    shell_count,
    shell_totals,
)
from spatialjoincountovershells_spark.operators.images import (  # noqa: E402
    crossmodal_dup_pairs,
    image_augment,
    image_features,
    image_knn_hist,
    image_quality,
    image_roundtrip_metrics,
    phash_near_dup,
    transcode,
)
from spatialjoincountovershells_spark.operators.similarity import (  # noqa: E402
    ann_cosine_topk,
    ann_ivf_topk,
    ann_l2_topk,
    cosine_dedup_pairs,
    lsh_cosine_pairs,
)
from spatialjoincountovershells_spark.operators.text import (  # noqa: E402
    bm25_scores,
    chunk_documents,
    doc_fingerprint,
    lang_guess,
    lm_familiarity,
    pii_scrub,
    quality_score,
    repetition_stats,
    text_stats,
    token_topk,
)
from spatialjoincountovershells_spark.operators.tiling import (  # noqa: E402
    image_tile_stats,
    morton_sql_ctes,
    morton_tile_expr,
    quadkey_expr,
    quadkey_sql,
    rasterize_points,
    tile_cover,
    tile_dbscan,
    tile_adaptive,
    tile_getis_g,
    tile_join_counts,
    tile_kring_stats,
    tile_local_moran,
    tile_moran_i,
    tile_rollup,
)
from spatialjoincountovershells_spark.operators.hexgrid import (  # noqa: E402
    geohash_cells,
    geohash_sql,
    hex_axial_ctes,
    hex_dbscan,
    hex_key_sql,
    hex_kring_stats,
    hex_ring_offsets,
    hex_rollup,
)
from spatialjoincountovershells_spark.operators.events import (  # noqa: E402
    asof_join,
    rolling_counts,
    event_pairs_within,
    funnel,
    retention,
    sessionize,
)
from spatialjoincountovershells_spark.operators.media import (  # noqa: E402
    audio_window_stats,
    frame_stats,
)
from spatialjoincountovershells_spark.sources.synth import (  # noqa: E402
    _caption_word_key,
    synth_audio,
    synth_captioned_points,
    synth_images,
    synth_points,
    synth_videos,
)

BOX = 1000.0
EDGES = np.array([25.0, 50.0, 100.0, 200.0])  # exact f64; squared: 625..40000
R2 = [625.0, 2500.0, 10000.0, 40000.0]

POLYGONS = {
    1: [(100.5, 100.25), (800.25, 150.75), (700.125, 850.5), (150.0, 700.0)],
    2: [
        (200.5, 200.5), (600.25, 200.5), (600.25, 400.75),
        (400.125, 400.75), (400.125, 600.5), (200.5, 600.5),
    ],
}


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _halos(spark, sf_dir, table="customer", key="c_custkey") -> DataFrame:
    df = _read(spark, sf_dir, table).select(F.col(key).alias("halo_id"))
    return with_key_coords(df, "halo_id")


def _parts(spark, sf_dir, table="orders", key="o_orderkey") -> DataFrame:
    df = _read(spark, sf_dir, table).select(F.col(key).alias("particle_id"))
    return with_key_coords(df, "particle_id")


def _halos_cte(table="customer", key="c_custkey", alias="halo_id") -> str:
    return (
        f"SELECT {key} AS {alias}, {sql_coord(key, 0)} AS x, "
        f"{sql_coord(key, 1)} AS y, {sql_coord(key, 2)} AS z FROM {table}"
    )


_D2 = (
    "(least(abs(h.x - p.x), 1000.0 - abs(h.x - p.x)) * least(abs(h.x - p.x), 1000.0 - abs(h.x - p.x))"
    " + least(abs(h.y - p.y), 1000.0 - abs(h.y - p.y)) * least(abs(h.y - p.y), 1000.0 - abs(h.y - p.y)))"
    " + least(abs(h.z - p.z), 1000.0 - abs(h.z - p.z)) * least(abs(h.z - p.z), 1000.0 - abs(h.z - p.z))"
)

_SHELL_CASE = (
    f"CASE WHEN d2 < {R2[0]} THEN 0 WHEN d2 < {R2[1]} THEN 1 "
    f"WHEN d2 < {R2[2]} THEN 2 WHEN d2 < {R2[3]} THEN 3 END"
)


# ---------------------------------------------------------------- queries

def q_shell_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shell_count(
        _halos(spark, sf_dir), _parts(spark, sf_dir), EDGES, dtype="float64"
    )


def q_two_point_xi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Landy-Szalay 2-point correlation workflow: DD/DR/RR shell
    totals composed from shell_count, xi quantized to floor(xi*2^20).
    Data = part table; randoms = 2000 deterministic splitmix64 points
    (seed 31), both f64 — the oracle re-derives the randoms in SQL via
    the same _phash_cte used by the sjcs_images_f64 twin."""
    data = _parts(spark, sf_dir, table="part", key="p_partkey")
    randoms = decode_phash(
        synth_points(spark, 2000, seed=31, id_col="rid"), dtype="float64"
    )
    return landy_szalay_xi(data, randoms, EDGES, n_randoms=2000)


def q_weighted_shells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mass-weighted radial profiles: count AND integer weight sum per
    (halo, shell) — shell_count(weight_col=) on the sql plan."""
    h = _halos(spark, sf_dir)
    p = _parts(spark, sf_dir).withColumn(
        "w", (F.col("particle_id") % 97).cast("long")
    )
    return shell_count(h, p, EDGES, dtype="float64", plan="sql",
                       id_col="halo_id", weight_col="w")


def q_ripley_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ripley's K at each shell edge: cumulative self-join pair counts
    normalized by V/(n(n-1)), K quantized to floor(K * 2^10).  The
    cumulative, always-emits-every-shell twin of autocorr_shells.
    plan='dgrid' (broadcast-data kernel; the sql/fused plans are
    pinned equal by the brute-force test — autocorr_shells keeps the
    both-sides-large sql path exercised in the gate)."""
    p = _parts(spark, sf_dir, table="part", key="p_partkey")
    return ripley_k(p, EDGES, box=BOX, plan="dgrid", dtype="float64")


def q_cross_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate (cross-type) Ripley's K: clustering of customer-keyed
    points around part-keyed points — same cumulative-window shape as
    ripley_k but a cross join (no self-pair subtraction) normalized by
    V/(n_a n_b)."""
    a = _parts(spark, sf_dir, table="part", key="p_partkey")
    b = _parts(spark, sf_dir, table="customer", key="c_custkey")
    return ripley_k(a, EDGES, box=BOX, plan="dgrid", dtype="float64",
                    other=b)


def q_g_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-function: CDF of each point's 1-NN distance at the shell
    edges (self excluded by id), censored beyond edges[-1]; exact
    integer counts + integer-DIV ppm.  plan='dgrid': the broadcast-grid
    min-kernel (the sql join plan is pinned equal by the brute-force
    test)."""
    p = _parts(spark, sf_dir, table="part", key="p_partkey")
    return nn_dist_cdf(p, EDGES, box=BOX, id_col="particle_id",
                       plan="dgrid")


def q_f_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F (empty-space) function: CDF of the distance from customer-
    keyed reference probes to the nearest part-keyed data point."""
    p = _parts(spark, sf_dir, table="part", key="p_partkey")
    r = _parts(spark, sf_dir, table="customer", key="c_custkey")
    return nn_dist_cdf(p, EDGES, box=BOX, ref=r, plan="dgrid")


def q_autocorr_shells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auto-correlation pair counts DD(r): shell_count in big x big
    SELF-join mode (both sides the same table — the 2-point correlation
    estimator, the classic astro workload the reference's halo x particle
    query generalizes to).  Ordered pairs; the N self-pairs (d=0, always
    shell 0 since edges[0] > 0) are subtracted from shell 0.  Exercises
    the sql plan's both-sides-large path: cell-grid equi-join, no
    broadcast requirement on either side."""
    p = _parts(spark, sf_dir, table="part", key="p_partkey")
    h = p.select(F.col("particle_id").alias("halo_id"), "x", "y", "z")
    tot = pair_totals(h, p, EDGES, box=BOX, plan="sql", dtype="float64",
                      id_col="halo_id", subtract_self=p.count())
    # a shell left with only self-pairs vanishes, matching the
    # oracle's GROUP BY (which never sees them)
    return tot.select(
        "shell_idx", F.col("n").cast("long").alias("n_pairs")
    ).where(F.col("n_pairs") > 0)


def q_shell_count_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shell_count(
        _halos(spark, sf_dir), _parts(spark, sf_dir), EDGES,
        dtype="float64", plan="fused",
    )


def q_shell_count_bcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The zero-shuffle plan: broadcast halo grid, stream particles."""
    return shell_count(
        _halos(spark, sf_dir), _parts(spark, sf_dir), EDGES,
        dtype="float64", plan="bcast",
    )


def q_shell_count_dgrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The no-aggregation plan: broadcast particle grid, stream probes."""
    return shell_count(
        _halos(spark, sf_dir), _parts(spark, sf_dir), EDGES,
        dtype="float64", plan="dgrid",
    )


def q_shell_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shell_totals(q_shell_count(spark, sf_dir))


def q_range_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _halos(spark, sf_dir, "supplier", "s_suppkey")
    return range_join_pairs(
        h, _parts(spark, sf_dir), radius=80.0, dtype="float64"
    )


def q_semi_filtered_shell_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ids = _read(spark, sf_dir, "supplier").select("s_suppkey")
    h = filter_halos(_halos(spark, sf_dir), ids)
    return shell_count(h, _parts(spark, sf_dir), EDGES, dtype="float64")


def q_cell_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = with_cell(_parts(spark, sf_dir), ncells=8, box=BOX)
    return p.groupBy("cell_id").agg(F.count(F.lit(1)).alias("n_points"))


def q_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: per-cell occupancy + tight min/max bounding box."""
    return cell_stats(_parts(spark, sf_dir).drop("particle_id"), ncells=8)


def q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _halos(spark, sf_dir, "supplier", "s_suppkey")
    res = knn(h, _parts(spark, sf_dir), k=3, dtype="float64", ncells=16)
    return res.select("halo_id", "particle_id", "rank")


def q_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _parts(spark, sf_dir).withColumnRenamed("particle_id", "point_id")
    polys = spark.createDataFrame(
        [(pid, [{"x": float(x), "y": float(y)} for x, y in verts])
         for pid, verts in POLYGONS.items()],
        "poly_id long, vertices array<struct<x: double, y: double>>",
    )
    return point_in_polygon(pts, polys, id_col="point_id")


def q_point_in_polygon_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-tiled PIP scale path (equi-join on cell_id; no broadcast).
    Bit-identical semantics to q_point_in_polygon — shares its oracle."""
    pts = _parts(spark, sf_dir).withColumnRenamed("particle_id", "point_id")
    polys = spark.createDataFrame(
        [(pid, [{"x": float(x), "y": float(y)} for x, y in verts])
         for pid, verts in POLYGONS.items()],
        "poly_id long, vertices array<struct<x: double, y: double>>",
    )
    return point_in_polygon(pts, polys, id_col="point_id", grid=(8, BOX))


def q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rasterize_points(_parts(spark, sf_dir), res=16, box=BOX)


def q_tile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution Z-order (Morton) count pyramid, levels 0..6."""
    return tile_rollup(_parts(spark, sf_dir), max_level=6, box=BOX)


def q_tile_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive quadtree leaves: split tiles over 64 points until
    level 6 — dense regions refine, sparse regions stay coarse; leaves
    partition the point set."""
    return tile_adaptive(_parts(spark, sf_dir), max_level=6, capacity=64,
                         box=BOX)


def q_tile_kring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3-style kRing smoothing at level 5 (32x32 grid, k=1): per
    occupied tile, own count + 3x3-ring count sum + occupied-ring-tile
    count, edge rings truncated."""
    return tile_kring_stats(_parts(spark, sf_dir), level=5, k=1, box=BOX)


def q_hex_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3-style hexagonal cell rollup (pointy-top axial lattice, cube
    rounding, circumradius 31.25): occupied hex -> point count.  The
    hex assignment is one fixed f64 IEEE tree shared verbatim with the
    oracle."""
    p = _parts(spark, sf_dir).select("x", "y")
    return hex_rollup(p, 31.25)


def q_hex_kring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hex k-ring smoothing (k=1, 6 equidistant neighbors + self) —
    scatter-gather over the per-hex aggregate, no lattice self-join."""
    p = _parts(spark, sf_dir).select("x", "y")
    return hex_kring_stats(p, 31.25, k=1)


def q_tile_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct visitors per slippy tile via the per-group KMV sketch
    (k=16, estimator branch live on most tiles): the unique-users-per-
    map-cell pattern with bounded per-tile state — exact distinct
    would shuffle every (tile, user) pair; the sketch shuffles at most
    k hashes per tile."""
    ev = _read(spark, sf_dir, "events").select("event_id", "user_id")
    ev = with_key_latlon(ev, "event_id")
    t = ev.select(
        geo_tile_expr(F.col("lat"), F.col("lon"), 4).alias("tile_id"),
        "user_id",
    )
    return kmv_distinct(t, ["tile_id"], "user_id", k=16)


def _tile_distinct_sql(k: int = 16) -> str:
    """DuckDB twin of q_tile_distinct: the geo-tile Morton CTEs feed
    the shared-text KMV pipeline keyed by tile_id."""
    from spatialjoincountovershells_spark.functions.texthash import P
    from spatialjoincountovershells_spark.operators.sketches import kmv_hash_sql

    h = kmv_hash_sql("user_id")
    lat, lon = sql_latlon("event_id")
    return (
        f"WITH g0 AS (SELECT user_id, {lat} AS lat, {lon} AS lon FROM events),\n"
        + morton_sql_ctes("g0", *geo_tile_sql("lat", "lon", 4))
        + f""",
dh AS (SELECT tile_id, {h} AS h FROM m5 GROUP BY 1, 2),
r AS (SELECT tile_id, h,
      row_number() OVER (PARTITION BY tile_id ORDER BY h) AS rn FROM dh),
a AS (SELECT tile_id, CAST(count(*) AS INTEGER) AS n_kept,
             CAST(max(h) AS BIGINT) AS kth_hash
      FROM r WHERE rn <= {k} GROUP BY 1)
SELECT tile_id, n_kept, kth_hash,
  CAST(CASE WHEN n_kept < {k} THEN n_kept
       ELSE {(k - 1) * P} // kth_hash END AS BIGINT) AS est_distinct
FROM a
"""
    )


def q_quadkey_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bing-style quadkey rollup at level 5 over geo-tagged rows: the
    string interchange form of the Morton quadtree key (parent =
    string prefix)."""
    df = _geo_rows(spark, sf_dir, "orders", "o_orderkey", "img_id")
    tile = geo_tile_expr(F.col("lat"), F.col("lon"), 5)
    return (
        df.select(quadkey_expr(tile, 5).alias("quadkey"))
        .groupBy("quadkey")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )


def q_hex_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hex-lattice DBSCAN (min_pts=40): density clustering with
    edge-only 6-neighbor adjacency, min-packed-key canonical labels,
    shared pointer-jumping components engine."""
    p = _parts(spark, sf_dir).select("x", "y")
    return hex_dbscan(p, 31.25, min_pts=40)


def q_geohash_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base-32 geohash rollup (precision 3, ~156 km cells) over
    geo-tagged rows: geohash = Z-order interleave (lon first) through
    the same spread-bits exprs as the Morton tiles."""
    df = _geo_rows(spark, sf_dir, "orders", "o_orderkey", "img_id")
    return geohash_cells(df, precision=3)


def q_tile_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid DBSCAN at level 5 (32x32), min_pts=17: density clustering
    of the order-point tile grid into core/border/noise with min-Morton
    canonical cluster ids (62 clusters at sf0.01)."""
    return tile_dbscan(_parts(spark, sf_dir), level=5, min_pts=17, box=BOX)


def q_tile_moran(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Moran's I spatial autocorrelation of per-tile counts at
    level 5, queen contiguity, exact integer sums + one f64 tree."""
    return tile_moran_i(_parts(spark, sf_dir), level=5, box=BOX)


def q_tile_getis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord Gi* hot-spot z-scores per level-5 tile (queen weights
    incl. self, full-grid population, exact integer sums + one f64
    tree, gi quantized to floor(Gi* * 2^20))."""
    return tile_getis_g(_parts(spark, sf_dir), level=5, box=BOX)


def q_tile_getis_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted Getis-Ord Gi*: hot spots of an integer MARK (particle_id
    mod 97 as the stand-in value column) instead of point counts —
    exercises weight_col through _tile_counts/_cell_ring_table."""
    p = _parts(spark, sf_dir).withColumn(
        "w", (F.col("particle_id") % 97).cast("long")
    )
    return tile_getis_g(p, level=5, box=BOX, weight_col="w")


def q_tile_lisa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local Moran's I (LISA) per level-5 tile: hot/cold/outlier
    quadrant + floor(I_i * 2^20), exact integer sums over the full
    grid, one f64 division."""
    return tile_local_moran(_parts(spark, sf_dir), level=5, box=BOX)


def q_range_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exclusion zones: order-keyed points with NO site (every 50th
    customer, 30 sites) within strict d < 100; survivors pass through,
    coords integer-quantized x64 for the hash check."""
    sites = _halos(spark, sf_dir).where(F.col("halo_id") % 50 == 0)
    p = _parts(spark, sf_dir)
    out = range_anti_join(p, sites, radius=float(EDGES[2]), box=BOX,
                          dtype="float64")
    return out.select(
        "particle_id",
        (F.col("x") * 64).cast("long").alias("xq"),
        (F.col("y") * 64).cast("long").alias("yq"),
        (F.col("z") * 64).cast("long").alias("zq"),
    )


def q_idw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-distance-weighted interpolation (power=2, r=50) of the
    integer mark o_orderkey % 97 at the customer-keyed query points;
    exact decimal sums of floor(2^30/d^2) weights, estimate quantized
    to floor(est * 2^10).  Exact key collisions (c_custkey ==
    o_orderkey gives identical coords) exercise the d=0 branch."""
    q = _halos(spark, sf_dir)
    d = _parts(spark, sf_dir).withColumn(
        "v", (F.col("particle_id") % 97).cast("long")
    )
    return idw_interpolate(q, d, radius=float(EDGES[1]), value_col="v",
                           power=2, box=BOX, dtype="float64")


def q_tile_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-count statistics at level 5 for the binary mark 'tile holds
    >= 15 points': unordered BB/BW/WW adjacent pair counts + the
    hypergeometric expected BB."""
    return tile_join_counts(_parts(spark, sf_dir), level=5, box=BOX,
                            min_count=15)


def _rects_tbl(spark: SparkSession, sf_dir: str, table: str, key: str,
               idc: str) -> DataFrame:
    """Deterministic rectangles keyed off a TPC-H table: mins from the
    keycoords lanes 0/1, extents in [0, 40) from two sub-streams of
    lane 2.  Every bound is an exact multiple of 1/64 (see
    functions/keycoords.py), so overlap tests and intersection areas
    are bit-exact in both engines."""
    df = _read(spark, sf_dir, table).select(F.col(key).alias(idc))
    k = F.col(idc)
    # Column API, not selectExpr: Spark SQL parses the 64.0 literal as
    # DECIMAL(3,1) and silently runs the pipeline in decimal arithmetic
    x0 = ((k * F.lit(KEY_CONSTS[0])) % F.lit(64000)) / F.lit(64.0)
    y0 = ((k * F.lit(KEY_CONSTS[1])) % F.lit(64000)) / F.lit(64.0)
    w = ((k * F.lit(KEY_CONSTS[2])) % F.lit(2560)) / F.lit(64.0)
    h = (
        F.expr(f"({idc} * {KEY_CONSTS[2]}) DIV 2560") % F.lit(2560)
    ) / F.lit(64.0)
    return df.select(
        k, x0.alias("xmin"), (x0 + w).alias("xmax"),
        y0.alias("ymin"), (y0 + h).alias("ymax"),
    )


def q_box_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MBR x MBR overlap join (the reference R-tree's native predicate,
    Mbr.c:167-205) between order-keyed and customer-keyed rectangle
    tables: PBSM tile partitioning at level 5 + reference-point dedup,
    intersection area quantized to 1/4096 units (exact — all bounds
    are 1/64 multiples)."""
    a = _rects_tbl(spark, sf_dir, "orders", "o_orderkey", "a_id")
    b = _rects_tbl(spark, sf_dir, "customer", "c_custkey", "b_id")
    j = box_overlap_join(a, b, level=5, box=BOX)
    return j.select(
        "a_id", "b_id",
        ((F.col("ix_xmax") - F.col("ix_xmin"))
         * (F.col("ix_ymax") - F.col("ix_ymin"))
         * F.lit(4096.0)).cast("long").alias("ix_area_q12"),
    )


def q_tile_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2-style bbox covering of the PIP polygons at level 5."""
    verts = spark.createDataFrame(
        [(pid, float(x), float(y))
         for pid, vs in POLYGONS.items() for x, y in vs],
        "poly_id long, x double, y double",
    )
    boxes = verts.groupBy("poly_id").agg(
        F.min("x").alias("xmin"), F.max("x").alias("xmax"),
        F.min("y").alias("ymin"), F.max("y").alias("ymax"),
    )
    return tile_cover(boxes, level=5, box=BOX, id_col="poly_id")


def q_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup pairs on a synth images table with
    planted distance-1 and distance-2 variants (bit flips within the
    48 populated phash bits).  Banded Hamming join, pigeonhole-exact
    recall at max_hamming=2 < bands=3; oracle is the all-pairs
    bit_count join in DuckDB over the identical splitmix64 phashes."""
    base = synth_points(spark, 2000, seed=21, id_col="image_id")
    flip1 = "phash ^ shiftleft(CAST(1 AS BIGINT), CAST(image_id % 16 AS INT))"
    v1 = base.where(F.col("image_id") % 10 == 0).select(
        (F.col("image_id") + F.lit(1000000)).alias("image_id"),
        F.expr(flip1).alias("phash"),
    )
    v2 = base.where(F.col("image_id") % 25 == 0).select(
        (F.col("image_id") + F.lit(2000000)).alias("image_id"),
        F.expr(
            f"({flip1}) ^ shiftleft(CAST(1 AS BIGINT), "
            "CAST(16 + image_id % 16 AS INT))"
        ).alias("phash"),
    )
    return phash_near_dup(base.unionByName(v1).unionByName(v2))


def q_image_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third pair source through the same clustering: connected
    components over the phash near-dup graph (planted variants collapse
    onto their base image's cluster)."""
    return dedup_clusters(
        q_phash_near_dup(spark, sf_dir),
        id_a="image_a", id_b="image_b", out_id="image_id",
    )


def q_crossmodal_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint caption+image near-dup classification on a captioned
    images table with three planted variant families:
      v1 (+1e6, every 10th): 1-bit phash flip, SAME caption  -> 'both'
      v2 (+2e6, every 25th): 2-bit phash flip, OTHER caption -> 'image_only'
      v3 (+3e6, every 20th): unrelated phash,  SAME caption  -> 'caption_only'
    Oracle: the identical splitmix64 caption/phash CTEs, the
    minhash-band SQL over captions, the all-pairs bit_count join over
    phashes, FULL OUTER joined the same way."""
    base = synth_captioned_points(spark, 2000, seed=21)
    flip1 = "phash ^ shiftleft(CAST(1 AS BIGINT), CAST(image_id % 16 AS INT))"
    cols = ["image_id", "phash", "caption"]
    v1 = base.where(F.col("image_id") % 10 == 0).select(
        (F.col("image_id") + F.lit(1_000_000)).alias("image_id"),
        F.expr(flip1).alias("phash"),
        "caption",
    )
    v2 = base.where(F.col("image_id") % 25 == 0).select(
        (F.col("image_id") + F.lit(2_000_000)).alias("image_id"),
        F.expr(
            f"({flip1}) ^ shiftleft(CAST(1 AS BIGINT), "
            "CAST(16 + image_id % 16 AS INT))"
        ).alias("phash"),
        F.col("caption_alt").alias("caption"),
    )
    v3 = base.where(F.col("image_id") % 20 == 0).select(
        (F.col("image_id") + F.lit(3_000_000)).alias("image_id"),
        F.col("phash_alt").alias("phash"),
        "caption",
    )
    t = base.select(*cols).unionByName(v1).unionByName(v2).unionByName(v3)
    return crossmodal_dup_pairs(t)


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(_read(spark, sf_dir, "documents"))


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_stats(_read(spark, sf_dir, "documents"))


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(_read(spark, sf_dir, "documents"))


def q_lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_guess(_read(spark, sf_dir, "documents"))


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(_read(spark, sf_dir, "documents"))


def q_ann_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_l2_topk(_read(spark, sf_dir, "embeddings"), k=3)


def q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionize the event log at an 8h inactivity gap (the synthetic
    per-user median gap is ~7.3h, so the split is non-trivial both
    ways): per-session event/type counts, exact µs start/duration,
    order-independent quantized value sum."""
    return sessionize(_read(spark, sf_dir, "events"), gap_s=28800)


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view -> click -> purchase conversion funnel: each step
    completed only by an event strictly after the user's earliest
    completion of the previous step; conv_ppm exact integer DIV."""
    return funnel(_read(spark, sf_dir, "events"),
                  steps=("view", "click", "purchase"))


def q_event_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohorts: users cohorted by UTC day of first event,
    distinct active users per (cohort_day, day_offset)."""
    return retention(_read(spark, sf_dir, "events"))


def q_event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal interval join: every (click, purchase) pair per user
    with the purchase in [click, click + 4h] — the 1-D bucket-ring
    analog of the spatial cell join."""
    return event_pairs_within(_read(spark, sf_dir, "events"),
                              "click", "purchase", window_s=14400)


def q_event_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF backward join (kdb aj / merge_asof): every purchase
    matched to the user's latest click at-or-before it, 1h tolerance;
    one union + one user-key window, never a pair join."""
    return asof_join(_read(spark, sf_dir, "events"),
                     "purchase", "click", tolerance_s=3600)


def q_event_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    bucket = F.floor(F.unix_timestamp("ts") / F.lit(3600)).alias("bucket")
    return ev.groupBy(bucket, "event_type").agg(F.count(F.lit(1)).alias("n"))


# ------- hash-family entries — oracle-backed since round 2 via the
# SQL-derivable poly/affine hashes in functions/texthash.py (each has a
# bit-exact DuckDB twin in oracle_sql(), hash-checked by the gate)

def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(_read(spark, sf_dir, "documents"))


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the minhash-LSH near-dup pair graph."""
    return dedup_clusters(minhash_lsh_pairs(_read(spark, sf_dir, "documents")))


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer fixed-point PageRank (3 unrolled rounds) over the
    minhash-LSH near-dup pair graph — centrality for canonical-doc
    selection inside near-dup families."""
    from spatialjoincountovershells_spark.operators.graph import pagerank

    return pagerank(minhash_lsh_pairs(_read(spark, sf_dir, "documents")),
                    iters=3)


def q_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed corpus-survivor pipeline: quality + language + exact
    dedup + near-dup cluster canonicalization, oracle-checked
    end-to-end (recursive-CTE connected components on the DuckDB side)."""
    return corpus_clean(_read(spark, sf_dir, "documents"))


def q_corpus_clean_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaning funnel as one row: independent per-gate drop counts
    plus the surviving-document count."""
    return corpus_clean_stats(_read(spark, sf_dir, "documents"))


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(_read(spark, sf_dir, "documents"))


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_pairs(_read(spark, sf_dir, "documents"))


def q_ann_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    qs = emb.orderBy("vec_id").limit(8).select("vec_id", "embedding").toPandas()
    return ann_cosine_topk(emb, qs, k=3)


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_fingerprint(_read(spark, sf_dir, "documents"))


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window passage extraction (128-char chunks, 16 overlap)."""
    return chunk_documents(_read(spark, sf_dir, "documents"),
                           chunk_chars=128, overlap=16)


def q_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: 50% of predicted-en docs,
    25% of everything else — the data-mixing step, RNG-free."""
    return stratified_sample(_read(spark, sf_dir, "documents"),
                             {"en": 500_000}, default_rate_1e6=250_000)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs with id % 20 == 7 play the eval
    set; every remaining (training) doc gets its distinct-8-gram
    overlap count vs that set and a contaminated flag at >= 128
    (threshold chosen so the tiny-vocabulary synthetic corpus splits
    into both classes; the operator default is 2)."""
    docs = _read(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 20 == 7)
    train = docs.where(F.col("doc_id") % 20 != 7)
    return decontaminate(train, bench, min_overlap=128)


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document (word/bigram
    duplication fractions, integer per-mille)."""
    return repetition_stats(_read(spark, sf_dir, "documents"))


def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring coverage per doc (Lee et al. 2021
    substring dedup): corpus-duplicated 24-gram seeds merged into
    maximal spans, coverage in chars."""
    return dup_spans(_read(spark, sf_dir, "documents"), k=24)


def q_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact vocabulary head per language: 16 most frequent [a-z0-9]+
    tokens, occurrence + document counts, lexicographic tie-break."""
    return token_topk(_read(spark, sf_dir, "documents"), k=16, by="lang")


def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test assignment: 80/10/10 keyed by the
    source domain (every source's docs land in one split), pure
    hash function of the key — reproducible, partition-independent."""
    return split_assign(
        _read(spark, sf_dir, "documents"),
        {"train": 800000, "val": 100000, "test": 100000},
        group_col="source",
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: concat-and-chunk placement of every
    document in the global id-ordered token stream, 512-token training
    sequences.  range_size=64 forces the multi-bucket distributed
    prefix-sum path at gate scale (sf0.01's 500 docs -> 8 buckets)."""
    return pack_sequences(
        _read(spark, sf_dir, "documents"), seq_tokens=512, range_size=64
    )


def _pii_inject_sql(str_t: str) -> str:
    """Dialect-portable expression planting deterministic PII into the
    (digit-free word-soup) document text: h = (doc_id * 1000003) % 2^20
    decides which of email / phone / IPv4 snippets are spliced in at
    character offset h % 40, so every class occurs in a controlled,
    partition-independent fraction of docs.  `str_t` is the dialect's
    string type name (STRING for Spark, VARCHAR for DuckDB); everything
    else — concat/substr/lpad/CASE/% — parses identically in both."""
    def c(x: str) -> str:
        return f"CAST({x} AS {str_t})"

    h = "((doc_id * 1000003) % 1048576)"
    email = (
        f"CASE WHEN {h} % 3 = 0 THEN concat(' user', {c(f'{h} % 9973')}, "
        f"'@mail', {c(f'{h} % 7')}, '.example.com') ELSE '' END"
    )
    phone = (
        f"CASE WHEN {h} % 5 < 2 THEN concat(' call ', "
        f"lpad({c(f'{h} % 1000')}, 3, '0'), '-', "
        f"lpad({c(f'({h} * 13) % 1000')}, 3, '0'), '-', "
        f"lpad({c(f'({h} * 31) % 10000')}, 4, '0')) ELSE '' END"
    )
    ip = (
        f"CASE WHEN {h} % 7 < 3 THEN concat(' host ', {c(f'{h} % 256')}, '.', "
        f"{c(f'({h} * 3) % 256')}, '.', {c(f'({h} * 5) % 256')}, '.', "
        f"{c(f'({h} * 7) % 256')}) ELSE '' END"
    )
    t = "coalesce(text, '')"
    pos = f"CAST({h} % 40 AS INT)"
    return (
        f"concat(substr({t}, 1, {pos}), {email}, {phone}, {ip}, ' ', "
        f"substr({t}, {pos} + 1))"
    )


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction over documents with deterministically
    planted email/phone/IPv4 spans (see _pii_inject_sql) -> per-doc
    class counts + the redacted text.  The oracle plants the identical
    spans in SQL and re-applies the same ordered count+redact rules
    (operators/text.py PII_RULES), hash-checking the scrubbed strings."""
    docs = _read(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id", F.expr(_pii_inject_sql("STRING")).alias("text")
    )
    return pii_scrub(injected)


def q_sjcs_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship graft pipeline on the synthetic images table."""
    parts = decode_phash(synth_images(spark, 20000, seed=7, with_payload=False))
    halos = decode_phash(synth_points(spark, 500, seed=8))
    edges = np.logspace(0, np.log2(80.0), 8, base=2.0).astype(np.float32)
    return shell_count(halos, parts, edges)


_F64_EDGES = np.logspace(0, np.log2(80.0), 8, base=2.0)  # float64


def q_sjcs_images_f64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship pipeline, float64 kernel — bit-exact DuckDB oracle twin.

    Same tables as q_sjcs_images (positions dequantized from phash are
    exact multiples of 125/8192, so every f64 distance/threshold op is
    exact); the oracle re-derives phash in pure SQL (splitmix64 via
    staged CTEs + 32-bit-split modular multiply).
    """
    parts = decode_phash(
        synth_images(spark, 20000, seed=7, with_payload=False), dtype="float64"
    )
    halos = decode_phash(synth_points(spark, 500, seed=8), dtype="float64")
    return shell_count(halos, parts, _F64_EDGES, dtype="float64")


# --- pure-SQL splitmix64/phash derivation for the oracle ----------------

_M64 = "18446744073709551616"  # 2^64
_H32 = "4294967296"            # 2^32


def _sql_mulmod(a: str, b: int) -> str:
    """(a * b) mod 2^64 with 32-bit-split partial products (INT128-safe)."""
    bh, bl = b >> 32, b & 0xFFFFFFFF
    return (
        f"(((({a}) % {_H32}) * {bl} + "
        f"((((({a}) % {_H32}) * {bh} + (({a}) // {_H32}) * {bl}) % {_H32})"
        f" * {_H32})) % {_M64})"
    )


from spatialjoincountovershells_spark.functions.texthash import (  # noqa: E402
    P as _TH_P,
    POWS as _TH_POWS,
    affine_sql,
    band_key_sql,
    poly_hash_duck,
    poly_hash_fixed_duck,
)


def _shingle_cte(
    shingle_n: int = 8,
    max_df: int | None = None,
    min_len: int | None = None,
    src: str = "documents",
) -> str:
    """sh(doc_id, shingle) — distinct char n-grams, mirroring
    operators/dedup.py shingles(); optional document-frequency cap and
    optional min-length doc guard (mirrors minhash_lsh_pairs' exclusion
    of NULL/sub-shingle docs).  `src` is any table/CTE exposing
    (doc_id, text) — the crossmodal oracle passes its caption CTE."""
    guard = (
        f"WHERE text IS NOT NULL AND length(text) >= {min_len}"
        if min_len is not None
        else ""
    )
    base = f"""
sh0 AS (SELECT DISTINCT doc_id, substr(text, u, {shingle_n}) AS shingle
  FROM (SELECT doc_id, text,
        unnest(generate_series(1, greatest(length(text) - {shingle_n - 1}, 1))) AS u
        FROM {src} {guard}))"""
    if max_df is None:
        return base + ",\nsh AS (SELECT * FROM sh0)"
    return base + f""",
rare AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= {max_df}),
sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN rare USING (shingle))"""


def _minhash_lsh_sql(
    n_hashes: int = 32, bands: int = 8, shingle_n: int = 8,
    src: str = "documents", max_bucket: int = 512,
) -> str:
    r = n_hashes // bands
    mins = ",\n  ".join(
        f"min({affine_sql('base', i)}) AS mh_{i}" for i in range(n_hashes)
    )
    band_selects = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, {b} AS band, "
        f"{band_key_sql([f'mh_{b * r + j}' for j in range(r)])} AS key FROM sig"
        for b in range(bands)
    )
    # bands0->bands window filter = the max_bucket hot-bucket drop of
    # operators/dedup.py bucket_pairs (round-4 VERDICT cap)
    return f"""
WITH {_shingle_cte(shingle_n, min_len=shingle_n, src=src)},
hb AS (SELECT doc_id, {poly_hash_fixed_duck("shingle", shingle_n)} AS base FROM sh),
sig AS (SELECT doc_id, {mins} FROM hb GROUP BY doc_id),
bands0 AS ({band_selects}),
bands AS (SELECT * FROM bands0
  QUALIFY count(*) OVER (PARTITION BY band, key) <= {max_bucket})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands_hit
FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


def _dup_spans_sql(k: int = 24, min_count: int = 2) -> str:
    """DuckDB twin of operators/dedup.py dup_spans(): same k-gram hash
    family, same count-over-window seed rule, same gap<=k island merge."""
    h = poly_hash_fixed_duck(f"substr(text, u, {k})", k)
    return f"""
WITH g AS (SELECT doc_id, u, {h} AS h
  FROM (SELECT doc_id, text,
        unnest(generate_series(1, length(text) - {k - 1})) AS u
        FROM documents WHERE length(text) >= {k})),
c AS (SELECT doc_id, u, count(*) OVER (PARTITION BY h) AS cnt FROM g),
s AS (SELECT doc_id, u,
        CASE WHEN lag(u) OVER w IS NULL OR u - lag(u) OVER w > {k}
             THEN 1 ELSE 0 END AS ns
      FROM c WHERE cnt >= {min_count}
      WINDOW w AS (PARTITION BY doc_id ORDER BY u)),
si AS (SELECT doc_id, u,
        sum(ns) OVER (PARTITION BY doc_id ORDER BY u
                      ROWS UNBOUNDED PRECEDING) AS sid FROM s),
sp AS (SELECT doc_id, sid, max(u) - min(u) + {k} AS len
       FROM si GROUP BY 1, 2),
a AS (SELECT doc_id, count(*) AS n, sum(len) AS chars, max(len) AS mx
      FROM sp GROUP BY 1)
SELECT d.doc_id,
       CAST(COALESCE(n, 0) AS BIGINT) AS n_dup_spans,
       CAST(COALESCE(chars, 0) AS BIGINT) AS dup_chars,
       CAST(COALESCE(mx, 0) AS BIGINT) AS max_span_chars
FROM documents d LEFT JOIN a USING (doc_id)
"""



def _pagerank_sql(iters: int = 3, damping: int = 850) -> str:
    """DuckDB twin of q_pagerank: the same unrolled integer rounds over
    the _minhash_lsh_sql pair graph (sum is HUGEINT in DuckDB — cast
    back to BIGINT each round)."""
    base_pm = (1000 - damping) * 1000
    ctes = f"""
p AS (SELECT doc_a, doc_b FROM ({_minhash_lsh_sql()}) mp),
e AS (SELECT doc_a AS s, doc_b AS d FROM p
      UNION ALL SELECT doc_b, doc_a FROM p),
deg AS (SELECT s, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
r0 AS (SELECT s AS id, 1000000::BIGINT AS r FROM deg)"""
    prev = "r0"
    for t in range(1, iters + 1):
        ctes += f""",
r{t} AS (SELECT e.d AS id,
    CAST({base_pm} + ({damping} * sum({prev}.r // deg.deg)) // 1000
         AS BIGINT) AS r
  FROM e JOIN {prev} ON {prev}.id = e.s JOIN deg ON deg.s = e.s
  GROUP BY 1)"""
        prev = f"r{t}"
    return f"WITH {ctes}\nSELECT id AS doc_id, r AS pr_q FROM {prev}"


def _dedup_clusters_ctes(pairs_sql: str | None = None) -> str:
    """WITH-RECURSIVE body ending in clus(doc_id, cluster_id):
    connected components over a pair graph (default: the minhash-LSH
    pairs) via transitive closure + min reachable id — the declarative
    twin of operators/dedup.py dedup_clusters' min-label propagation."""
    mh = pairs_sql if pairs_sql is not None else _minhash_lsh_sql()
    # p/e MATERIALIZED: DuckDB otherwise re-inlines the whole pair
    # pipeline into every transitive-closure iteration (the
    # embed_dedup_clusters oracle ran 133s at sf0.01 vs 4s materialized,
    # same rows - VERDICT r3 #3, keep the gate affordable)
    return f"""
p AS MATERIALIZED (SELECT doc_a, doc_b FROM ({mh}) mp),
e AS MATERIALIZED (SELECT doc_a AS s, doc_b AS d FROM p UNION SELECT doc_b, doc_a FROM p),
reach(s, d) AS (
  SELECT s, d FROM e
  UNION
  SELECT r.s, e2.d FROM reach r JOIN e e2 ON r.d = e2.s
),
clus AS (SELECT s AS doc_id, least(s, min(d)) AS cluster_id FROM reach GROUP BY s)"""


def _dedup_clusters_sql() -> str:
    return (
        f"WITH RECURSIVE {_dedup_clusters_ctes()}\n"
        "SELECT doc_id, cluster_id FROM clus"
    )


def _embed_dedup_clusters_sql() -> str:
    """Connected components over the embedding cosine near-dup graph —
    the same recursive-CTE twin, pair source swapped for the
    LSH-candidates + exact-cosine re-rank pairs."""
    return (
        f"WITH RECURSIVE {_dedup_clusters_ctes(_cosine_dedup_sql())}\n"
        "SELECT doc_id AS vec_id, cluster_id FROM clus"
    )


def _corpus_gated_ctes(
    tokens: str,
    lang_case: str,
    q_min: int = 175,
    keep_langs: tuple[str, ...] = ("en", "de", "fr", "es"),
) -> str:
    """CTE chain ending in g(doc_id, quality_1000, lang_pred,
    cluster_id, q_ok, lang_ok, exact_ok, rep) — the declarative twin of
    operators/corpus.py _gated: NULL text coalesced to empty (fails the
    quality gate instead of vanishing from the funnel), and the
    near-dup representative = min id among the cluster's ELIGIBLE
    (q+lang+exact) members."""
    langs = ", ".join(f"'{lang}'" for lang in keep_langs)
    quality = (
        f"CAST(floor(least((1000 * CAST({tokens} AS BIGINT)) / "
        f"(CAST(length(text) AS BIGINT) + 1), 1000.0)) AS BIGINT)"
    )
    return f"""{_dedup_clusters_ctes()},
norm AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
flags AS (SELECT doc_id, {quality} AS quality_1000, {lang_case} AS lang_pred,
          min(doc_id) OVER (PARTITION BY md5(text)) AS exact_min
          FROM norm),
g0 AS (SELECT f.doc_id, f.quality_1000, f.lang_pred, c.cluster_id,
       (f.quality_1000 >= {q_min}) AS q_ok,
       (f.lang_pred IN ({langs})) AS lang_ok,
       (f.exact_min = f.doc_id) AS exact_ok
       FROM flags f LEFT JOIN clus c ON f.doc_id = c.doc_id),
g AS (SELECT *,
      min(CASE WHEN q_ok AND lang_ok AND exact_ok THEN doc_id END)
        OVER (PARTITION BY coalesce(cluster_id, doc_id)) AS rep
      FROM g0)"""


def _corpus_clean_sql(
    tokens: str,
    lang_case: str,
    q_min: int = 175,
    keep_langs: tuple[str, ...] = ("en", "de", "fr", "es"),
) -> str:
    """Composed corpus-survivor oracle mirroring operators/corpus.py:
    quality gate + language gate + exact-dup min-id (grouped by text
    digest) + eligible-representative near-dup gate over the
    recursive-CTE components."""
    return f"""
WITH RECURSIVE {_corpus_gated_ctes(tokens, lang_case, q_min, keep_langs)}
SELECT doc_id, lang_pred, quality_1000 FROM g
WHERE q_ok AND lang_ok AND exact_ok
  AND (cluster_id IS NULL OR rep IS NULL OR rep = doc_id)
"""


def _doc_chunks_sql(chunk_chars: int = 128, overlap: int = 16) -> str:
    """Sliding-window chunk oracle mirroring operators/text.py
    chunk_documents: same ceil/stride arithmetic, same substr bounds."""
    stride = chunk_chars - overlap
    nck = (
        f"CAST(ceil(greatest(length(text) - {overlap}, 1) / {stride}.0) AS INT)"
    )
    piece = f"substr(text, k * {stride} + 1, {chunk_chars})"
    return f"""
WITH c AS (SELECT doc_id, text,
  unnest(generate_series(0, {nck} - 1)) AS k FROM documents)
SELECT doc_id, CAST(k AS INTEGER) AS chunk_idx, {piece} AS chunk_text,
       CAST(length({piece}) AS BIGINT) AS n_chars
FROM c
"""


def _corpus_sample_sql(
    lang_case: str,
    rates_1e6: dict[str, int] | None = None,
    default_rate_1e6: int = 250_000,
    stream: int = 97,
) -> str:
    """Stratified-sample oracle: identical affine hash of (doc_id % P)
    and identical per-language rate CASE."""
    from spatialjoincountovershells_spark.functions.texthash import (
        P,
        affine_consts,
    )

    rates_1e6 = rates_1e6 if rates_1e6 is not None else {"en": 500_000}
    a, c = affine_consts(stream)
    h = f"((({a} * (doc_id % {P}) + {c}) % {P}) % 1000000)"
    whens = " ".join(
        f"WHEN ({lang_case}) = '{lg}' THEN {int(r)}"
        for lg, r in sorted(rates_1e6.items())
    )
    rate = f"(CASE {whens} ELSE {int(default_rate_1e6)} END)"
    return f"""
SELECT doc_id, {lang_case} AS lang_pred
FROM documents WHERE {h} < {rate}
"""


def _pii_scrub_sql() -> str:
    """Oracle twin of q_pii_scrub: identical injection expression
    (VARCHAR dialect), then the same ordered count+redact stages as
    operators/text.py pii_scrub — class k counted on the text with
    classes 1..k-1 already redacted.  RE2 and Java agree on the
    restricted pattern subset (pinned by test_pii_regex_portability)."""
    from spatialjoincountovershells_spark.operators.text import PII_RULES

    (_, e_pat, e_tok), (_, p_pat, p_tok), (_, i_pat, i_tok) = PII_RULES
    return f"""
WITH inj AS (SELECT doc_id, {_pii_inject_sql("VARCHAR")} AS t FROM documents),
s1 AS (SELECT doc_id, len(regexp_extract_all(t, '{e_pat}')) AS n_email,
       regexp_replace(t, '{e_pat}', '{e_tok}', 'g') AS t FROM inj),
s2 AS (SELECT doc_id, n_email, len(regexp_extract_all(t, '{p_pat}')) AS n_phone,
       regexp_replace(t, '{p_pat}', '{p_tok}', 'g') AS t FROM s1),
s3 AS (SELECT doc_id, n_email, n_phone,
       len(regexp_extract_all(t, '{i_pat}')) AS n_ipv4,
       regexp_replace(t, '{i_pat}', '{i_tok}', 'g') AS t FROM s2)
SELECT doc_id, CAST(n_email AS BIGINT) AS n_email,
       CAST(n_phone AS BIGINT) AS n_phone, CAST(n_ipv4 AS BIGINT) AS n_ipv4,
       t AS clean
FROM s3
"""


def _phash_band_pairs_ctes(
    out_cte: str, src: str = "t", bands: int = 3, max_hamming: int = 2,
    max_bucket: int = 512, out_a: str = "image_a", out_b: str = "image_b",
) -> str:
    """CTE chain ending in {out_cte}(out_a, out_b, hamming): banded-
    Hamming pairs over {src}(image_id, phash) — the structural twin of
    operators/dedup.py hamming_pairs (16-bit slices of the 48-bit
    packed phash, hot-bucket cap, exact bit_count min over colliding
    bands).  Pigeonhole-exact vs the old all-pairs form for
    max_hamming < bands, EXCEPT that oversized buckets are dropped —
    the round-4 VERDICT cap, mirrored here."""
    w = 48 // bands
    mask = (1 << w) - 1
    band_selects = "\n  UNION ALL\n  ".join(
        f"SELECT image_id, phash, {b} AS band, "
        f"(phash >> {w * b}) & {mask} AS key FROM {src}"
        for b in range(bands)
    )
    return f"""
pb0 AS ({band_selects}),
pb AS (SELECT * FROM pb0
  QUALIFY count(*) OVER (PARTITION BY band, key) <= {max_bucket}),
ppr AS (
  SELECT a.image_id AS {out_a}, b.image_id AS {out_b},
         bit_count(xor(a.phash, b.phash)) AS h
  FROM pb a JOIN pb b
    ON a.band = b.band AND a.key = b.key AND a.image_id < b.image_id),
{out_cte} AS (
  SELECT {out_a}, {out_b}, CAST(min(h) AS BIGINT) AS hamming
  FROM ppr GROUP BY 1, 2 HAVING min(h) <= {max_hamming})"""


def _phash_near_dup_sql() -> str:
    """Banded bit_count Hamming oracle over the identical splitmix64
    phashes + planted 1/2-bit variants (mirrors q_phash_near_dup,
    including hamming_pairs' banding and max_bucket cap)."""
    return f"""
WITH {_phash_cte("q", 2000, 21)},
base AS (SELECT CAST(i AS BIGINT) AS image_id,
  CAST((ax // 281474976710656) * 4294967296
     + (ay // 281474976710656) * 65536
     + (az // 281474976710656) AS BIGINT) AS phash FROM q_6),
v1 AS (SELECT image_id + 1000000 AS image_id,
  xor(phash, (CAST(1 AS BIGINT) << CAST(image_id % 16 AS INT))) AS phash
  FROM base WHERE image_id % 10 = 0),
v2 AS (SELECT image_id + 2000000 AS image_id,
  xor(xor(phash, (CAST(1 AS BIGINT) << CAST(image_id % 16 AS INT))),
      (CAST(1 AS BIGINT) << CAST(16 + image_id % 16 AS INT))) AS phash
  FROM base WHERE image_id % 25 = 0),
t AS (SELECT * FROM base UNION ALL SELECT * FROM v1 UNION ALL SELECT * FROM v2),
{_phash_band_pairs_ctes("phpairs")}
SELECT image_a, image_b, hamming FROM phpairs
"""


def _image_dedup_clusters_sql() -> str:
    """Connected components over the phash near-dup graph — third pair
    source (text minhash / embedding cosine / image phash) through the
    same recursive-CTE twin."""
    pairs = (
        "SELECT image_a AS doc_a, image_b AS doc_b FROM "
        f"({_phash_near_dup_sql()}) pp"
    )
    return (
        f"WITH RECURSIVE {_dedup_clusters_ctes(pairs)}\n"
        "SELECT doc_id AS image_id, cluster_id FROM clus"
    )


def _caption_ctes(name: str, n: int, seed: int) -> str:
    """CTE chain -> {name}(image_id BIGINT, caption, caption_alt):
    the pure-SQL mirror of sources/synth.py synth_captioned_points'
    caption columns — six splitmix64 word streams (xor keys inlined
    as compile-time literals via _caption_word_key), rendered as
    decimal, three words per text."""
    parts = [
        f"{name}_ids AS (SELECT CAST(range AS HUGEINT) AS i FROM range(0, {n}))"
    ]
    prev = f"{name}_ids"
    carried: list[str] = ["i"]
    for j in range(6):
        cj = _caption_word_key(seed, j)
        cy = ", ".join(carried)
        parts.append(
            f"{name}_w{j}_0 AS (SELECT {cy}, xor(i, {cj}) AS w{j} FROM {prev}),"
            + _sm64_cte(f"{name}_w{j}", f"{name}_w{j}_0", list(carried), f"w{j}")
        )
        carried.append(f"w{j}")
        prev = f"{name}_w{j}"

    def words(tag: str, js: list[int]) -> str:
        body = " || ' ' || ".join(f"CAST(w{j} AS VARCHAR)" for j in js)
        return f"'{tag} ' || {body}"

    parts.append(
        f"{name} AS (SELECT CAST(i AS BIGINT) AS image_id, "
        f"{words('cap', [0, 1, 2])} AS caption, "
        f"{words('alt', [3, 4, 5])} AS caption_alt FROM {prev})"
    )
    return ",".join(parts)


def _crossmodal_dup_sql(n: int = 2000, seed: int = 21) -> str:
    """Joint caption+image near-dup oracle (mirrors q_crossmodal_dup):
    identical splitmix64 caption/phash CTEs + planted v1/v2/v3
    variants, minhash-band SQL over captions, all-pairs bit_count join
    over phashes, FULL OUTER joined on the ordered pair key.  The
    shared CTEs are MATERIALIZED: DuckDB otherwise inlines the
    splitmix64 caption chain into every consumer (t is read three
    times) and the oracle took 38s at sf0.01 vs 0.7s materialized —
    same 520 rows (VERDICT r3 #3: keep the driver gate affordable)."""
    pack = (
        "CAST((ax // 281474976710656) * 4294967296"
        " + (ay // 281474976710656) * 65536"
        " + (az // 281474976710656) AS BIGINT)"
    )
    bit = "(CAST(1 AS BIGINT) << CAST(image_id % 16 AS INT))"
    bit16 = "(CAST(1 AS BIGINT) << CAST(16 + image_id % 16 AS INT))"
    return f"""
WITH {_phash_cte("q", n, seed)},
{_phash_cte("r", n, seed + 1)},
{_caption_ctes("capt", n, seed)},
base_p AS (SELECT CAST(i AS BIGINT) AS image_id, {pack} AS phash FROM q_6),
alt_p AS (SELECT CAST(i AS BIGINT) AS image_id, {pack} AS phash FROM r_6),
base AS MATERIALIZED (SELECT b.image_id, b.phash, c.caption, c.caption_alt
  FROM base_p b JOIN capt c USING (image_id)),
v1 AS (SELECT image_id + 1000000 AS image_id,
  xor(phash, {bit}) AS phash, caption
  FROM base WHERE image_id % 10 = 0),
v2 AS (SELECT image_id + 2000000 AS image_id,
  xor(xor(phash, {bit}), {bit16}) AS phash, caption_alt AS caption
  FROM base WHERE image_id % 25 = 0),
v3 AS (SELECT b.image_id + 3000000 AS image_id, a.phash, b.caption
  FROM base b JOIN alt_p a USING (image_id) WHERE b.image_id % 20 = 0),
t AS MATERIALIZED (SELECT image_id, phash, caption FROM base
  UNION ALL SELECT * FROM v1 UNION ALL SELECT * FROM v2
  UNION ALL SELECT * FROM v3),
{_phash_band_pairs_ctes("ip").lstrip()},
caps AS MATERIALIZED (SELECT image_id AS doc_id, caption AS text FROM t),
cp AS (SELECT doc_a AS image_a, doc_b AS image_b,
  CAST(n_bands_hit AS BIGINT) AS n_caption_bands
  FROM ({_minhash_lsh_sql(src="caps")}) m)
SELECT coalesce(cp.image_a, ip.image_a) AS image_a,
       coalesce(cp.image_b, ip.image_b) AS image_b,
       coalesce(cp.n_caption_bands, 0) AS n_caption_bands,
       coalesce(ip.hamming, -1) AS hamming,
       CASE WHEN cp.image_a IS NOT NULL AND ip.image_a IS NOT NULL THEN 'both'
            WHEN cp.image_a IS NOT NULL THEN 'caption_only'
            ELSE 'image_only' END AS match_kind
FROM cp FULL OUTER JOIN ip
  ON cp.image_a = ip.image_a AND cp.image_b = ip.image_b
"""


def _corpus_clean_stats_sql(
    tokens: str,
    lang_case: str,
    q_min: int = 175,
    keep_langs: tuple[str, ...] = ("en", "de", "fr", "es"),
) -> str:
    """Funnel-summary oracle mirroring corpus_clean_stats: independent
    per-gate drop counts + the surviving conjunction, one row."""
    near_ok = "(cluster_id IS NULL OR rep IS NULL OR rep = doc_id)"
    return f"""
WITH RECURSIVE {_corpus_gated_ctes(tokens, lang_case, q_min, keep_langs)}
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN NOT q_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality,
       CAST(sum(CASE WHEN NOT lang_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_wrong_lang,
       CAST(sum(CASE WHEN NOT exact_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup,
       CAST(sum(CASE WHEN NOT {near_ok} THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup,
       CAST(sum(CASE WHEN q_ok AND lang_ok AND exact_ok AND {near_ok} THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors
FROM g
"""


def _simhash_sql() -> str:
    bitsums = ",\n  ".join(
        f"sum(CASE WHEN {affine_sql('base', b)} % 2 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(64)
    )
    assemble = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN {2**b if b < 63 else -(2**63)} ELSE 0 END)"
        for b in range(64)
    )
    return f"""
WITH tok0 AS (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok FROM documents),
tok AS (SELECT doc_id, tok FROM tok0 WHERE length(tok) > 0),
hb AS (SELECT doc_id, {poly_hash_duck("tok")} AS base FROM tok),
bits AS (SELECT doc_id, {bitsums} FROM hb GROUP BY doc_id)
SELECT doc_id, CAST({assemble} AS BIGINT) AS simhash FROM bits
"""


def _simhash_pairs_sql(
    bands: int = 4, max_hamming: int = 3, max_bucket: int = 512
) -> str:
    """Banded-SimHash pairs oracle: shares the simhash CTE; band key is
    (simhash >> 16b) & 0xffff — arithmetic shift + mask is identical in
    Spark and DuckDB, as is two's-complement bit_count of the xor.
    The bands0->bands window filter mirrors hamming_pairs' max_bucket
    hot-bucket drop."""
    w = 64 // bands
    mask = (1 << w) - 1
    band_selects = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, simhash, {b} AS band, "
        f"(simhash >> {w * b}) & {mask} AS key FROM sims"
        for b in range(bands)
    )
    return f"""
WITH sims AS ({_simhash_sql()}),
bands0 AS ({band_selects}),
bands AS (SELECT * FROM bands0
  QUALIFY count(*) OVER (PARTITION BY band, key) <= {max_bucket}),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         bit_count(xor(a.simhash, b.simhash)) AS h
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(min(h) AS BIGINT) AS hamming
FROM pairs GROUP BY 1, 2 HAVING min(h) <= {max_hamming}
"""


def _ann_cosine_sql(n_queries: int = 8, k: int = 3, scale: int = 1024) -> str:
    qexpr = f"CAST(floor(ea * {float(scale)}) AS BIGINT)"
    nexpr = f"CAST(floor(eb * {float(scale)}) AS BIGINT)"
    return f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {n_queries}),
pr AS (SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
       unnest(q.embedding) AS ea, unnest(b.embedding) AS eb
       FROM q JOIN embeddings b ON q.vec_id <> b.vec_id),
d AS (SELECT query_id, neighbor_id,
      sum({qexpr} * {nexpr}) AS dot,
      sum({qexpr} * {qexpr}) AS na2,
      sum({nexpr} * {nexpr}) AS nb2
      FROM pr GROUP BY query_id, neighbor_id),
s AS (SELECT query_id, neighbor_id,
      CASE WHEN na2 * nb2 = 0 THEN 0
      ELSE CAST(floor((CAST(dot AS DOUBLE) / sqrt(CAST(na2 * nb2 AS DOUBLE))) * 1000000.0) AS BIGINT)
      END AS sim_1e6
      FROM d)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim_1e6 DESC, neighbor_id) AS INTEGER) AS rank,
       sim_1e6
FROM s QUALIFY rank <= {k}
"""


def _embed_lsh_sql(n_planes: int = 8, bands: int = 4, seed: int = 7,
                   dim: int = 64, scale: int = 1024,
                   max_bucket: int = 512) -> str:
    from spatialjoincountovershells_spark.operators.similarity import lsh_planes

    W = lsh_planes(n_planes, bands, dim, seed)
    band_selects = []
    for b in range(bands):
        plane_terms = []
        for p in range(n_planes):
            arr = "[" + ", ".join(f"{int(w)}::BIGINT" for w in W[b, p]) + "]"
            dot = (
                f"list_sum(list_transform(generate_series(1, {dim}), "
                f"d -> q[d] * ({arr})[d]))"
            )
            plane_terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
        band_selects.append(
            f"SELECT vec_id, {b} AS band, CAST({' + '.join(plane_terms)} AS BIGINT) AS bucket FROM qv"
        )
    return f"""
WITH qv AS (SELECT vec_id,
            list_transform(embedding, e -> CAST(floor(e * {float(scale)}) AS BIGINT)) AS q
            FROM embeddings),
bk0 AS ({chr(10).join("  UNION ALL " + s if i else s for i, s in enumerate(band_selects))}),
bk AS (SELECT * FROM bk0
  QUALIFY count(*) OVER (PARTITION BY band, bucket) <= {max_bucket})
SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
"""


def _cosine_dedup_sql(min_sim_1e6: int = 200_000) -> str:
    return f"""
WITH cand AS ({_embed_lsh_sql()}),
qv AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(x * 1024.0) AS BIGINT)) AS q
       FROM embeddings),
s AS (SELECT doc_a, doc_b,
  list_sum(list_transform(generate_series(1, 64), d -> a.q[d] * b.q[d])) AS dot,
  list_sum(list_transform(generate_series(1, 64), d -> a.q[d] * a.q[d])) AS na2,
  list_sum(list_transform(generate_series(1, 64), d -> b.q[d] * b.q[d])) AS nb2
  FROM cand JOIN qv a ON a.vec_id = cand.doc_a JOIN qv b ON b.vec_id = cand.doc_b)
SELECT doc_a, doc_b,
  CASE WHEN na2 * nb2 = 0 THEN 0
  ELSE CAST(floor((CAST(dot AS DOUBLE) / sqrt(CAST(na2 * nb2 AS DOUBLE))) * 1000000.0) AS BIGINT)
  END AS sim_1e6
FROM s
WHERE (CASE WHEN na2 * nb2 = 0 THEN 0
       ELSE CAST(floor((CAST(dot AS DOUBLE) / sqrt(CAST(na2 * nb2 AS DOUBLE))) * 1000000.0) AS BIGINT)
       END) >= {min_sim_1e6}
"""


def _ann_ivf_sql(k: int = 3, n_probe: int = 4,
                 dim: int = 64, scale: float = 1024.0) -> str:
    """IVF oracle: identical quantize/assign/probe/re-rank tree to
    operators/similarity.py ivf_candidates + ann_l2_topk(candidates=).

    The centroid count is max(16, floor(sqrt(n))) — the same
    size-derived rule q_ann_ivf applies (matches Python's isqrt for
    the table sizes at play), so the oracle tracks the Spark query at
    any scale factor.  Centroid seeding replays ivf_candidates'
    hash-threshold sample exactly: affine stream 31 over vec_id % P,
    ~8x-oversampled rate, then the ncents smallest sampled ids."""
    from spatialjoincountovershells_spark.functions.texthash import (
        P as _THP, affine_sql as _aff,
    )
    from spatialjoincountovershells_spark.operators.similarity import (
        _CENTROID_STREAM,
    )

    l2 = (f"CAST(list_sum(list_transform(generate_series(1, {dim}), "
          f"i -> (a.q[i] - c.cq[i]) * (a.q[i] - c.cq[i]))) AS BIGINT)")
    ncents_expr = "greatest(16, CAST(floor(sqrt(count(*))) AS BIGINT))"
    h = f"({_aff(f'(vec_id % {_THP})', _CENTROID_STREAM)} % 1000000)"
    return f"""
WITH qv AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(x * {scale}) AS BIGINT)) AS q
       FROM embeddings),
cs AS (SELECT {ncents_expr} AS ncents,
       least(1000000, (8000000 * {ncents_expr}) // greatest(count(*), 1) + 1) AS rate
       FROM embeddings),
cents AS (SELECT vec_id AS cent_id, q AS cq FROM qv, cs
          WHERE {h} < cs.rate
          ORDER BY vec_id LIMIT (SELECT ncents FROM cs)),
ad AS (SELECT a.vec_id AS vid, c.cent_id, {l2} AS d2c FROM qv a CROSS JOIN cents c),
inv AS (SELECT vid AS neighbor_id, cent_id FROM ad
        QUALIFY row_number() OVER (PARTITION BY vid ORDER BY d2c, cent_id) = 1),
probes AS (SELECT vid AS query_id, cent_id FROM ad
           QUALIFY row_number() OVER (PARTITION BY vid ORDER BY d2c, cent_id) <= {n_probe}),
cand AS (SELECT query_id, neighbor_id FROM probes JOIN inv USING (cent_id)
         WHERE query_id <> neighbor_id),
d AS (SELECT query_id, neighbor_id,
      CAST(list_sum(list_transform(generate_series(1, {dim}),
               i -> (a.q[i] - b.q[i]) * (a.q[i] - b.q[i]))) AS BIGINT) AS qd2
      FROM cand JOIN qv a ON a.vec_id = cand.query_id
                JOIN qv b ON b.vec_id = cand.neighbor_id)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY qd2, neighbor_id) AS INTEGER) AS rank,
       qd2
FROM d QUALIFY rank <= {k}
"""


def _ann_l2_lsh_sql(k: int = 3, dim: int = 64, scale: float = 1024.0) -> str:
    return f"""
WITH cand0 AS ({_embed_lsh_sql()}),
cand AS (SELECT doc_a AS query_id, doc_b AS neighbor_id FROM cand0
         UNION ALL
         SELECT doc_b AS query_id, doc_a AS neighbor_id FROM cand0),
qv AS (SELECT vec_id, list_transform(embedding, e -> CAST(floor(e * {scale}) AS BIGINT)) AS q
       FROM embeddings),
d AS (SELECT query_id, neighbor_id,
      CAST(list_sum(list_transform(generate_series(1, {dim}),
               i -> (a.q[i] - b.q[i]) * (a.q[i] - b.q[i]))) AS BIGINT) AS qd2
      FROM cand JOIN qv a ON a.vec_id = cand.query_id
                JOIN qv b ON b.vec_id = cand.neighbor_id)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY qd2, neighbor_id) AS INTEGER) AS rank,
       qd2
FROM d QUALIFY rank <= {k}
"""


def _doc_fingerprint_sql(window: int = 16) -> str:
    terms = " + ".join(
        f"(CASE WHEN u + {j} <= length(text) THEN ord(substr(text, u + {j}, 1)) ELSE 0 END)::BIGINT"
        f" * {_TH_POWS[j]}::BIGINT"
        for j in range(window)
    )
    return f"""
SELECT doc_id, CAST(list_min(list_transform(
  generate_series(1, greatest(length(text) - {window - 1}, 1)),
  u -> ({terms}) % {_TH_P})) AS BIGINT) AS fingerprint
FROM documents
"""


def _sm64_cte(name: str, src: str, carry: list[str], col: str) -> str:
    """CTE chain applying splitmix64 in place to HUGEINT column `col` of
    CTE `src` (value already offset by the caller — this is the mixer
    only, matching sources/synth.py splitmix64), carrying `carry`
    columns through.  Final CTE is `name`."""
    cy = "".join(f"{c}, " for c in carry)
    s = col
    return f"""
{name}_1 AS (SELECT {cy}(({s} + 11400714819323198485) % {_M64}) AS {s} FROM {src}),
{name}_2 AS (SELECT {cy}xor({s}, {s} // 1073741824) AS {s} FROM {name}_1),
{name}_3 AS (SELECT {cy}{_sql_mulmod(s, 0xBF58476D1CE4E5B9)} AS {s} FROM {name}_2),
{name}_4 AS (SELECT {cy}xor({s}, {s} // 134217728) AS {s} FROM {name}_3),
{name}_5 AS (SELECT {cy}{_sql_mulmod(s, 0x94D049BB133111EB)} AS {s} FROM {name}_4),
{name} AS (SELECT {cy}xor({s}, {s} // 2147483648) AS {s} FROM {name}_5)"""


def _byte_cte(name: str, n: int, seed: int, nbytes: int,
              salt: int = 0xB10C) -> str:
    """CTE chain -> {name}(i HUGEINT, p BIGINT, byte BIGINT): the
    pure-SQL mirror of sources/synth.py _byte_stream (splitmix64 word
    stream, little-endian byte view).  Emits whole 8-byte words —
    filter p < nbytes downstream."""
    nw = (nbytes + 7) // 8
    byte_div = ", ".join(f"({j}, {256 ** j})" for j in range(8))
    return f"""
{name}_ids AS (SELECT CAST(range AS HUGEINT) AS i FROM range(0, {n})),
{name}_s0 AS (SELECT i, xor(xor(CAST({seed} AS HUGEINT), i), {salt}) AS s FROM {name}_ids),{_sm64_cte(f"{name}_s", f"{name}_s0", ["i"], "s")},
{name}_w0 AS (SELECT i, CAST(kr.range AS HUGEINT) AS k,
              ((CAST(kr.range AS HUGEINT) + s) % {_M64}) AS v
              FROM {name}_s, range(0, {nw}) kr),{_sm64_cte(f"{name}_w", f"{name}_w0", ["i", "k"], "v")},
{name} AS (SELECT i, CAST(k * 8 AS BIGINT) + jd.j AS p,
           CAST((v // jd.d) % 256 AS BIGINT) AS byte
           FROM {name}_w, (VALUES {byte_div}) AS jd(j, d))"""


def _payload_cte(name: str, n: int, seed: int, w: int = 8, h: int = 8) -> str:
    """CTE chain -> {name}(i HUGEINT, px_id BIGINT, r/g/b BIGINT): the
    byte stream + the raw-RGB8 decode of tiling.py."""
    return f"""{_byte_cte(f"{name}_b", n, seed, w * h * 3)},
{name}_px AS (SELECT i, p // 3 AS px_id, p % 3 AS ch, byte
              FROM {name}_b WHERE p < {w * h * 3}),
{name} AS (SELECT i, px_id,
           max(CASE WHEN ch = 0 THEN byte END) AS r,
           max(CASE WHEN ch = 1 THEN byte END) AS g,
           max(CASE WHEN ch = 2 THEN byte END) AS b
           FROM {name}_px GROUP BY i, px_id)"""


def _img_id_sql(i_expr: str, prefix: str = "img") -> str:
    return f"'{prefix}' || lpad(CAST(CAST({i_expr} AS BIGINT) AS VARCHAR), 12, '0')"


def _video_frames_sql(n: int = 200, seed: int = 21, w: int = 8, h: int = 8,
                      n_frames: int = 6, stride: int = 2) -> str:
    """frame-sample oracle: a rawv payload is _payload at height
    h*n_frames; frame_idx = px_id // (w*h), sampled every `stride`."""
    npx = w * h
    return f"""
WITH {_payload_cte("vp", n, seed, w, h * n_frames)},
fr AS (SELECT i, px_id // {npx} AS frame_idx, r, g, b FROM vp)
SELECT {_img_id_sql("i", "vid")} AS video_id,
  CAST(frame_idx AS INTEGER) AS frame_idx,
  CAST(sum(r) * 1000 // {npx} AS BIGINT) AS mean_r,
  CAST(sum(g) * 1000 // {npx} AS BIGINT) AS mean_g,
  CAST(sum(b) * 1000 // {npx} AS BIGINT) AS mean_b
FROM fr WHERE frame_idx % {stride} = 0
GROUP BY i, frame_idx
"""


def _audio_stats_sql(n: int = 300, seed: int = 23, n_samples: int = 512,
                     win: int = 120) -> str:
    """audio-window oracle: s16le samples from the salted byte stream
    (low byte at even p), signed two's-complement, windows of `win`
    with a partial tail (512 = 4*120 + 32 exercises it)."""
    from spatialjoincountovershells_spark.sources.synth import AUDIO_SALT

    return f"""
WITH {_byte_cte("ab", n, seed, 2 * n_samples, salt=AUDIO_SALT)},
smp AS (SELECT i, p // 2 AS k,
        sum(byte * (CASE WHEN p % 2 = 0 THEN 1 ELSE 256 END)) AS su
        FROM ab WHERE p < {2 * n_samples} GROUP BY i, p // 2),
sgn AS (SELECT i, k, CASE WHEN su >= 32768 THEN su - 65536 ELSE su END AS s
        FROM smp)
SELECT {_img_id_sql("i", "aud")} AS audio_id,
  CAST(k // {win} AS INTEGER) AS win_idx,
  CAST(count(*) AS BIGINT) AS n,
  CAST(min(s) AS BIGINT) AS vmin,
  CAST(max(s) AS BIGINT) AS vmax,
  CAST(sum(abs(s)) AS BIGINT) AS sum_abs
FROM sgn GROUP BY i, k // {win}
"""


def _image_features_sql(n: int = 256, seed: int = 14, w: int = 8, h: int = 8,
                        bins: int = 16) -> str:
    npx = w * h
    hist_cols = ",\n  ".join(
        f"CAST(sum(CASE WHEN l // {256 // bins} = {b} THEN 1 ELSE 0 END) AS BIGINT) AS hist_{b}"
        for b in range(bins)
    )
    return f"""
WITH {_payload_cte("pl", n, seed, w, h)},
lum AS (SELECT i, r, g, b, (r*299 + g*587 + b*114) // 1000 AS l FROM pl)
SELECT {_img_id_sql("i")} AS image_id,
  CAST(sum(r) * 1000 // {npx} AS BIGINT) AS mean_r,
  CAST(sum(g) * 1000 // {npx} AS BIGINT) AS mean_g,
  CAST(sum(b) * 1000 // {npx} AS BIGINT) AS mean_b,
  CAST(floor(sqrt((1000000.0 * CAST({npx} * sum(l*l) - sum(l) * sum(l) AS DOUBLE)) / {float(npx * npx)})) AS BIGINT) AS std_luma,
  {hist_cols}
FROM lum GROUP BY i
"""


def _quality_metrics_sql(q: str, lo: int = 10, hi: int = 245) -> str:
    """Quality-metric CTE tail over a relation ``q(i, px_id, l, w2)``
    (integer luma per destination pixel; w2 = that image's width, which
    may vary per row after rot90).  Mirrors images.py image_quality:
    neighbor gradients via px_id+1 / px_id+w2 self-joins, all-integer."""
    return f"""
gh AS (SELECT a.i, sum(abs(b.l - a.l)) AS s, count(*) AS n
       FROM {q} a JOIN {q} b ON b.i = a.i AND b.px_id = a.px_id + 1
       WHERE a.px_id % a.w2 < a.w2 - 1 GROUP BY a.i),
gv AS (SELECT a.i, sum(abs(b.l - a.l)) AS s, count(*) AS n
       FROM {q} a JOIN {q} b ON b.i = a.i AND b.px_id = a.px_id + a.w2
       GROUP BY a.i),
st AS (SELECT i, sum(l) AS sl, max(l) AS mx, min(l) AS mn,
       sum(CASE WHEN l <= {lo} THEN 1 ELSE 0 END) AS clo,
       sum(CASE WHEN l >= {hi} THEN 1 ELSE 0 END) AS chi,
       count(*) AS n FROM {q} GROUP BY i)
SELECT {_img_id_sql("st.i")} AS image_id,
  CAST(st.sl * 1000 // st.n AS BIGINT) AS mean_luma_x1000,
  CAST(st.mx - st.mn AS BIGINT) AS contrast,
  CAST(st.clo AS BIGINT) AS n_clip_lo,
  CAST(st.chi AS BIGINT) AS n_clip_hi,
  CAST(gh.s * 1000 // gh.n AS BIGINT) AS grad_h_x1000,
  CAST(gv.s * 1000 // gv.n AS BIGINT) AS grad_v_x1000,
  CAST((gh.s + gv.s) * 1000 // (gh.n + gv.n) AS BIGINT) AS sharpness_x1000
FROM st JOIN gh ON gh.i = st.i JOIN gv ON gv.i = st.i"""


def _image_quality_sql(n: int = 256, seed: int = 14, w: int = 8,
                       h: int = 8) -> str:
    return f"""
WITH {_payload_cte("pl", n, seed, w, h)},
lum AS (SELECT i, px_id, (r*299 + g*587 + b*114) // 1000 AS l,
        {w} AS w2 FROM pl),
{_quality_metrics_sql("lum")}
"""


def _image_augment_sql(n: int = 256, seed: int = 17, w: int = 10, h: int = 6,
                       crop: int = 1, flip_mod: int = 2,
                       rot_mod: int = 4) -> str:
    """Oracle for image_quality(image_augment(...)): value-checks the
    TRANSFORMED pixels by inverse coordinate remap (dst -> pre-rot ->
    pre-flip -> +crop origin -> source px_id), then runs the shared
    quality-metric tail over the remapped luma.  The rot90 inverse per
    quarter-turn k matches numpy's CCW convention (out[i,j]=in[j,W-1-i])
    exactly — see operators/images.py image_augment."""
    cw, ch = w - crop, h - crop
    return f"""
WITH {_payload_cte("pl", n, seed, w, h)},
prm AS (SELECT CAST(range AS HUGEINT) AS i,
        range % {crop + 1} AS x0, (range // 2) % {crop + 1} AS y0,
        range % {flip_mod} AS fl, range % {rot_mod} AS k
        FROM range(0, {n})),
dims AS (SELECT *, CASE WHEN k % 2 = 1 THEN {ch} ELSE {cw} END AS w2
         FROM prm),
dst AS (SELECT d.*, CAST(g.range AS BIGINT) AS dp,
        CAST(g.range % w2 AS BIGINT) AS xd,
        CAST(g.range // w2 AS BIGINT) AS yd
        FROM dims d, range(0, {cw * ch}) g),
mapr AS (SELECT i, dp, w2, fl, x0, y0,
         CASE WHEN k = 0 THEN yd WHEN k = 1 THEN xd
              WHEN k = 2 THEN {ch} - 1 - yd ELSE {ch} - 1 - xd END AS yc,
         CASE WHEN k = 0 THEN xd WHEN k = 1 THEN {cw} - 1 - yd
              WHEN k = 2 THEN {cw} - 1 - xd ELSE yd END AS xc
         FROM dst),
srcm AS (SELECT i, dp, w2,
         (y0 + yc) * {w}
           + (x0 + CASE WHEN fl = 1 THEN {cw} - 1 - xc ELSE xc END) AS sp
         FROM mapr),
lum AS (SELECT s.i, s.dp AS px_id,
        (pl.r*299 + pl.g*587 + pl.b*114) // 1000 AS l, s.w2
        FROM srcm s JOIN pl ON pl.i = s.i AND pl.px_id = s.sp),
{_quality_metrics_sql("lum")}
"""


def _image_knn_hist_sql(n: int = 256, seed: int = 14, nq: int = 16,
                        k: int = 3, bins: int = 16) -> str:
    dist = " + ".join(f"abs(q.hist_{b} - c.hist_{b})" for b in range(bins))
    return f"""
WITH feats AS ({_image_features_sql(n, seed, bins=bins)}),
d AS (SELECT q.image_id AS query_id, c.image_id AS image_id,
      CAST({dist} AS BIGINT) AS l1_dist
      FROM feats q JOIN feats c ON c.image_id <> q.image_id
      WHERE CAST(substr(q.image_id, 4) AS BIGINT) < {nq}),
r AS (SELECT *, row_number() OVER
      (PARTITION BY query_id ORDER BY l1_dist, image_id) AS rk FROM d)
SELECT query_id, image_id, l1_dist, CAST(rk AS BIGINT) AS rank
FROM r WHERE rk <= {k}
"""


def _image_tiles_sql(n: int = 200, seed: int = 11, w: int = 8, h: int = 8,
                     t: int = 2) -> str:
    return f"""
WITH {_payload_cte("pl", n, seed, w, h)},
px AS (SELECT i, px_id // {w} AS row_, px_id % {w} AS col_, r, g, b FROM pl),
tl AS (SELECT i, least((row_ * {t}) // {h}, {t - 1}) AS tile_row,
       least((col_ * {t}) // {w}, {t - 1}) AS tile_col, r, g, b FROM px)
SELECT {_img_id_sql("i")} AS image_id,
  CAST(tile_row AS INTEGER) AS tile_row, CAST(tile_col AS INTEGER) AS tile_col,
  CAST(count(*) AS BIGINT) AS n_px,
  CAST(sum(r) * 1000 // count(*) AS BIGINT) AS mean_r,
  CAST(sum(g) * 1000 // count(*) AS BIGINT) AS mean_g,
  CAST(sum(b) * 1000 // count(*) AS BIGINT) AS mean_b
FROM tl GROUP BY i, tile_row, tile_col
"""


def _phash_cte(name: str, n: int, seed: int) -> str:
    """CTE chain: ids 0..n-1 -> (i, x, y, z) positions, exactly mirroring
    sources/synth.py (_u16/_phash) + functions/phash.py (f64 decode)."""
    from spatialjoincountovershells_spark.sources.synth import splitmix64

    ks = {
        ax: int(splitmix64(np.uint64(seed) + np.uint64(s) * np.uint64(0x9E37)))
        for ax, s in (("ax", 1), ("ay", 2), ("az", 3))
    }
    cols = list(ks)

    def allcols(expr_of):
        return ", ".join(f"{expr_of(c)} AS {c}" for c in cols)

    sc = "(1000.0/65536)"
    return f"""
{name}_ids AS (SELECT CAST(range AS HUGEINT) AS i FROM range(0, {n})),
{name}_0 AS (SELECT i, {", ".join(f"xor(i, {k}) AS {c}" for c, k in ks.items())} FROM {name}_ids),
{name}_1 AS (SELECT i, {allcols(lambda c: f"(({c} + 11400714819323198485) % {_M64})")} FROM {name}_0),
{name}_2 AS (SELECT i, {allcols(lambda c: f"xor({c}, {c} // 1073741824)")} FROM {name}_1),
{name}_3 AS (SELECT i, {allcols(lambda c: _sql_mulmod(c, 0xBF58476D1CE4E5B9))} FROM {name}_2),
{name}_4 AS (SELECT i, {allcols(lambda c: f"xor({c}, {c} // 134217728)")} FROM {name}_3),
{name}_5 AS (SELECT i, {allcols(lambda c: _sql_mulmod(c, 0x94D049BB133111EB))} FROM {name}_4),
{name}_6 AS (SELECT i, {allcols(lambda c: f"xor({c}, {c} // 2147483648)")} FROM {name}_5),
{name} AS (SELECT CAST(i AS BIGINT) AS id,
        CAST(ax // 281474976710656 AS DOUBLE) * {sc} AS x,
        CAST(ay // 281474976710656 AS DOUBLE) * {sc} AS y,
        CAST(az // 281474976710656 AS DOUBLE) * {sc} AS z FROM {name}_6)"""


def _sjcs_images_f32_sql() -> str:
    """Bit-exact FLOAT32 oracle for the flagship q_sjcs_images (which
    was rows-only through round 4 — VERDICT r4 #5).

    DuckDB evaluates mixed/FLOAT expressions in DOUBLE, so each
    arithmetic step is wrapped in CAST(... AS FLOAT): a single f64 op
    on two f32 operands is exact, and rounding the exact value to f32
    IS the IEEE f32 op — so the staged ad->m->s chain reproduces the
    Spark kernel's ((dx2+dy2)+dz2) float32 tree bit-for-bit (pinned by
    the bitwise d2 check in test_reference_parity-style prototyping and
    by the hash gate itself).  Edges are the f32 squares widened to f64
    literals; comparing FLOAT d2 against them promotes exactly, which
    matches shell_index_expr's widened-literal strict-< binning."""
    e32 = _F64_EDGES.astype(np.float32)
    r2 = [repr(float(v)) for v in (e32 * e32)]
    shell_case = "CASE " + " ".join(
        f"WHEN d2 < {v} THEN {i}" for i, v in enumerate(r2)
    ) + " END"

    def fx(e: str) -> str:
        return f"CAST({e} AS FLOAT)"

    axes = ", ".join(
        f"{fx(f'abs(h.{c} - p.{c})')} AS a{c}" for c in ("x", "y", "z")
    )
    mins = ", ".join(
        f"{fx(f'least(a{c}, ' + fx(f'CAST(1000.0 AS FLOAT) - a{c}') + ')')} AS m{c}"
        for c in ("x", "y", "z")
    )
    d2 = fx(
        fx(fx("mx*mx") + " + " + fx("my*my")) + " + " + fx("mz*mz")
    )
    return f"""
WITH {_phash_cte("p0", 20000, 7)},
{_phash_cte("h0", 500, 8)},
p AS (SELECT id, {fx('x')} AS x, {fx('y')} AS y, {fx('z')} AS z FROM p0),
h AS (SELECT id, {fx('x')} AS x, {fx('y')} AS y, {fx('z')} AS z FROM h0),
ad AS (SELECT h.id AS halo_id, {axes} FROM h, p),
m AS (SELECT halo_id, {mins} FROM ad),
s AS (SELECT halo_id, {d2} AS d2 FROM m)
SELECT halo_id, {shell_case} AS shell_idx, count(*) AS cnt
FROM s WHERE d2 < {r2[-1]} GROUP BY halo_id, shell_idx
"""


def _sjcs_images_f64_sql() -> str:
    r2 = [repr(float(v)) for v in _F64_EDGES * _F64_EDGES]
    shell_case = "CASE " + " ".join(
        f"WHEN d2 < {v} THEN {i}" for i, v in enumerate(r2)
    ) + " END"
    d2 = (
        "(least(abs(h.x - p.x), 1000.0 - abs(h.x - p.x)) * least(abs(h.x - p.x), 1000.0 - abs(h.x - p.x))"
        " + least(abs(h.y - p.y), 1000.0 - abs(h.y - p.y)) * least(abs(h.y - p.y), 1000.0 - abs(h.y - p.y)))"
        " + least(abs(h.z - p.z), 1000.0 - abs(h.z - p.z)) * least(abs(h.z - p.z), 1000.0 - abs(h.z - p.z))"
    )
    return f"""
WITH {_phash_cte("p", 20000, 7)},
{_phash_cte("h", 500, 8)},
d AS (SELECT h.id AS halo_id, {d2} AS d2 FROM h, p)
SELECT halo_id, {shell_case} AS shell_idx, count(*) AS cnt
FROM d WHERE d2 < {r2[-1]} GROUP BY halo_id, shell_idx
"""


def q_image_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return image_tile_stats(synth_images(spark, 200, seed=11), tiles_per_axis=2)


def q_image_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row payload invariant: PSNR>=40dB + caption equality — over
    BOTH codec classes: 128 lossless raw rows (bit-exact, psnr=-1=inf)
    and 128 rows transcoded to the numpy dctq lossy codec (finite
    PSNR, still >= 40dB).

    Output is the INVARIANT VERDICT per row (codec, bit_exact,
    caption_ok, psnr_ok) so the driver hash gate can compare it against
    a closed-form expected table (VERDICT r4 #5 — this query was
    rows-only through round 4): the dctq codec's einsum DCT has no
    fixed IEEE evaluation tree, so raw psnr_x100 values cannot have a
    bit-exact SQL twin; the exact values stay pytest-pinned
    (test_operators.py test_roundtrip_lossy_transcode_invariant)."""
    raw = synth_images(spark, 128, seed=13)
    lossless = image_roundtrip_metrics(raw).withColumn("codec", F.lit("raw"))
    lossy = image_roundtrip_metrics(
        transcode(synth_images(spark, 128, seed=13, id_prefix="dct"), "raw"),
        via_fmt="dctq",
    ).withColumn("codec", F.lit("dctq"))
    u = lossless.unionByName(lossy)
    return u.select(
        "image_id",
        "codec",
        "bit_exact",
        "caption_ok",
        ((F.col("psnr_x100") == -1) | (F.col("psnr_x100") >= 4000)).alias(
            "psnr_ok"
        ),
    )


def _image_roundtrip_sql() -> str:
    """Expected-verdict table for q_image_roundtrip: every raw row is
    bit-exact; every dctq row is lossy-but->=40dB (deterministic for
    the fixed seed-13 payload + flat q=4 quantizer — functions/dctq.py
    puts per-coefficient error <= q/2 ~ 47dB on this payload, and the
    quantizer never rounds every coefficient exactly, so bit_exact is
    false on all 128)."""
    return """
WITH ids AS (SELECT lpad(CAST(range AS VARCHAR), 12, '0') AS sfx
             FROM range(0, 128))
SELECT 'img' || sfx AS image_id, 'raw' AS codec,
       true AS bit_exact, true AS caption_ok, true AS psnr_ok FROM ids
UNION ALL
SELECT 'dct' || sfx, 'dctq', false, true, true FROM ids
"""


def q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return image_features(synth_images(spark, 256, seed=14))


def q_image_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return image_quality(synth_images(spark, 256, seed=14))


def q_image_augment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Augment then re-measure: the quality metrics of the TRANSFORMED
    payloads are the value check (grad_h/grad_v swap under odd rot90)."""
    imgs = synth_images(spark, 256, seed=17, w=10, h=6)
    return image_quality(image_augment(imgs))


def q_image_knn_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = synth_images(spark, 256, seed=14)
    queries = synth_images(spark, 16, seed=14)
    return image_knn_hist(corpus, queries, k=3)


def q_geo_tile_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both graft axes in one query: decode the image payload into
    per-image features (Arrow mapInPandas), decode the geo position
    from phash, assign each image to a Morton tile, and aggregate the
    integer-quantized features per tile.  At scale this is one pass
    over the payload table (features + tile key are both per-row) and
    one tile-key shuffle of the small feature rows — never the bytes."""
    imgs = synth_images(spark, 256, seed=14)
    feats = image_features(imgs)
    pos = decode_phash(
        imgs.select("image_id", "phash"), dtype="float64"
    ).select("image_id", "x", "y")
    t = feats.join(pos, "image_id").withColumn(
        "tile_id", morton_tile_expr(F.col("x"), F.col("y"), 3, BOX)
    )
    return t.groupBy("tile_id").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum("mean_r").alias("sum_mean_r"),
        F.sum("mean_g").alias("sum_mean_g"),
        F.sum("mean_b").alias("sum_mean_b"),
        F.sum("std_luma").alias("sum_std_luma"),
    )


def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample + per-frame integer channel means over the rawv
    container (operators/media.py) — codec formats are stubbed, the
    mapInPandas plumbing and the sampling arithmetic are oracle-checked."""
    return frame_stats(synth_videos(spark, 200, seed=21), stride=2)


def q_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed integer stats over s16le PCM (partial tail window
    included: 512 = 4*120 + 32)."""
    return audio_window_stats(synth_audio(spark, 300, seed=23), win=120)


def q_cosine_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed near-dup scale path: banded-LSH candidates + exact
    integer-cosine re-rank (threshold chosen to exercise both stages
    on the synthetic embeddings)."""
    emb = _read(spark, sf_dir, "embeddings")
    return cosine_dedup_pairs(emb, min_sim_1e6=200_000, dim=64)


def q_embed_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_clusters generalizes to ANY pair graph: connected
    components over the embedding cosine near-dup pairs."""
    emb = _read(spark, sf_dir, "embeddings")
    return dedup_clusters(
        cosine_dedup_pairs(emb, min_sim_1e6=200_000, dim=64), out_id="vec_id"
    )


def q_embed_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup candidates via banded hyperplane LSH."""
    emb = _read(spark, sf_dir, "embeddings")
    return lsh_cosine_pairs(emb, n_planes=8, bands=4, dim=64)


def q_ann_l2_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-scale ANN route: banded-LSH candidates expanded to both
    directions + exact integer-L2 re-rank via ann_l2_topk(candidates=)
    — no O(n*m) distance block anywhere (VERDICT r2 item 5)."""
    emb = _read(spark, sf_dir, "embeddings")
    cand = lsh_cosine_pairs(emb, n_planes=8, bands=4, dim=64)
    both = cand.selectExpr("doc_a AS query_id", "doc_b AS neighbor_id").union(
        cand.selectExpr("doc_b AS query_id", "doc_a AS neighbor_id")
    )
    return ann_l2_topk(emb, k=3, candidates=both)


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer candidates + exact integer-L2 re-rank —
    the clustered-corpus ANN scale path (inverted lists on cent_id).

    n_centroids scales as sqrt(n): with a FIXED centroid count the
    probed-list sizes grow linearly in the corpus and the re-rank is
    O(n^2/c); at c ~ sqrt(n) candidate volume is O(n_probe * n^1.5)
    — the standard IVF sizing.  The count() here is one cheap action
    on the small embeddings table (a catalog row-count at scale)."""
    emb = _read(spark, sf_dir, "embeddings")
    import math

    n_cent = max(16, math.isqrt(emb.count()))
    return ann_ivf_topk(emb, k=3, n_centroids=n_cent, n_probe=4)


def q_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-level DBSCAN (eps=65, min_pts=4) over 2000 pseudo-random
    synth points (seed 44, the same splitmix64 stream the oracle
    re-derives via _phash_cte).  eps is chosen sub-percolation (mean
    degree ~2.3) so the run exercises all three point classes — at
    sf0.01: 793 core / 556 border / 651 noise across 152 clusters —
    without a giant component blowing up the oracle's transitive
    closure."""
    pts = decode_phash(
        synth_points(spark, 2000, seed=44, id_col="point_id"),
        dtype="float64",
    )
    return dbscan_points(pts, eps=65.0, min_pts=4, id_col="point_id")


def q_kmeans_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-lattice Lloyd k-means over the embeddings table (k=8,
    2 assignment rounds) — the deterministic semantic-clustering step
    (domain balancing / semantic dedup) with a bit-exact unrolled-CTE
    DuckDB twin."""
    return lloyd_kmeans(_read(spark, sf_dir, "embeddings"), k=8, iters=2)


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: k-means partition (k=8,
    2 rounds) + within-cluster exact integer-cosine near-dup with the
    deterministic keep-min-id rule — the cluster-bounded alternative
    to the LSH-banded cosine_dedup path.  Threshold 0.43: the synth
    embeddings carry no planted duplicates (max pairwise cosine
    ~0.513 at sf0.01), so the paper's 0.95+ would be vacuous here;
    0.43 exercises both keep branches and the co-clustering gate."""
    return semantic_dedup(
        _read(spark, sf_dir, "embeddings"), k=8, iters=2,
        min_sim_1e6=430_000,
    )


def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes over the embeddings table (m=4
    subspaces of 16 dims, 16 codewords each, 2 Lloyd rounds) — the
    IVF+PQ compression companion of ann_ivf."""
    return pq_encode(_read(spark, sf_dir, "embeddings"),
                     m=4, k=16, iters=2, dim=64)


def _pq_sql(m: int = 4, k: int = 16, iters: int = 2, dim: int = 64,
            scale: int = 1024) -> str:
    """DuckDB twin of q_pq_encode: m prefixed copies of the shared
    unrolled-Lloyd CTE chain, one per embedding slice, joined on
    vec_id."""
    d = dim // m
    chains = ",\n".join(
        _kmeans_ctes(k, iters, d, scale, prefix=f"s{j}_", slice_off=j * d)
        for j in range(m)
    )
    cols = ", ".join(
        f"CAST(s{j}_a{iters}.cl AS BIGINT) AS code_{j}" for j in range(m)
    )
    total = " + ".join(f"s{j}_a{iters}.dist2" for j in range(m))
    joins = " ".join(
        f"JOIN s{j}_a{iters} USING (vec_id)" for j in range(1, m)
    )
    return (
        f"WITH {chains}\n"
        f"SELECT vec_id, {cols}, CAST({total} AS BIGINT) AS dist2\n"
        f"FROM s0_a{iters} {joins}"
    )


def q_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exhaustive PQ asymmetric-distance top-3 self-search over the
    embeddings table (m=4 x k=16 codebooks) — the ADC correctness
    anchor; the candidate-bounded IVF+PQ composition is pinned by
    test_pq_ann_ivf_candidates_subset."""
    return pq_ann_topk(_read(spark, sf_dir, "embeddings"),
                       k_nn=3, m=4, k=16, iters=2, dim=64)


def _pq_ann_sql(k_nn: int = 3, m: int = 4, k: int = 16, iters: int = 2,
                dim: int = 64, scale: int = 1024) -> str:
    """DuckDB twin of q_pq_ann: the m prefixed Lloyd chains again,
    plus per-subspace LUTs (query slice x final codebook c_{iters-1})
    and the m-lookup ADC sum."""
    d = dim // m
    chains = ",\n".join(
        _kmeans_ctes(k, iters, d, scale, prefix=f"s{j}_", slice_off=j * d)
        for j in range(m)
    )
    code_cols = ", ".join(f"s{j}_a{iters}.cl AS code_{j}" for j in range(m))
    code_joins = " ".join(
        f"JOIN s{j}_a{iters} USING (vec_id)" for j in range(1, m)
    )
    luts = ",\n".join(
        f"lut{j} AS (SELECT q.vec_id AS query_id, c.cl, "
        f"CAST(list_sum(list_transform(generate_series(1, {d}), "
        f"i -> (q.q[i] - c.c[i]) * (q.q[i] - c.c[i]))) AS BIGINT) AS d "
        f"FROM s{j}_q q, s{j}_c{iters - 1} c)"
        for j in range(m)
    )
    lut_joins = " ".join(
        f"JOIN lut{j} l{j} ON l{j}.cl = n.code_{j} "
        f"AND l{j}.query_id = l0.query_id"
        for j in range(1, m)
    )
    total = " + ".join(f"l{j}.d" for j in range(m))
    return f"""
WITH {chains},
codes AS (SELECT vec_id AS neighbor_id, {code_cols}
  FROM s0_a{iters} {code_joins}),
{luts},
adc AS (SELECT l0.query_id, n.neighbor_id, {total} AS adc_d2
  FROM codes n JOIN lut0 l0 ON l0.cl = n.code_0 {lut_joins}
  WHERE l0.query_id <> n.neighbor_id)
SELECT query_id, neighbor_id,
       CAST(rnk AS INTEGER) AS rank, CAST(adc_d2 AS BIGINT) AS adc_d2
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY adc_d2, neighbor_id) AS rnk FROM adc)
WHERE rnk <= {k_nn}
"""


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-user sketch per event_type (k=32; true cardinality
    150 per group at sf0.01, so the estimator branch is live) — the
    deterministic mergeable-sketch analog of approx_count_distinct."""
    return kmv_distinct(_read(spark, sf_dir, "events"),
                        ["event_type"], "user_id", k=32)


def _kmv_sql(k: int = 32) -> str:
    """DuckDB twin of q_kmv_distinct: kmv_hash_sql emits SQL valid in
    both engines, so the hash expression is literally shared."""
    from spatialjoincountovershells_spark.functions.texthash import P

    h = kmv_hash_sql("user_id")
    return f"""
WITH dh AS (SELECT event_type, {h} AS h FROM events GROUP BY 1, 2),
r AS (SELECT event_type, h,
      row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM dh),
a AS (SELECT event_type, CAST(count(*) AS INTEGER) AS n_kept,
             CAST(max(h) AS BIGINT) AS kth_hash
      FROM r WHERE rn <= {k} GROUP BY 1)
SELECT event_type, n_kept, kth_hash,
  CAST(CASE WHEN n_kept < {k} THEN n_kept
       ELSE {(k - 1) * P} // kth_hash END AS BIGINT) AS est_distinct
FROM a
"""


CM_TERMS = ("spark", "hash", "window", "vector", "join",
            "zzz_absent", "q7")
CM_D, CM_W = 4, 512


def q_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min token-frequency estimates over the documents corpus
    for 7 probe terms (5 real, 1 absent, 1 short-rare) — the bounded-
    state frequency sketch; est >= true always, pinned by
    test_countmin_never_undercounts."""
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.expr(
        "filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')"
    )).alias("tok"))
    sk = countmin_sketch(toks, "tok", d=CM_D, w=CM_W)
    qs = spark.createDataFrame([(t,) for t in CM_TERMS], "term string")
    return countmin_estimate(sk, qs, "term", d=CM_D, w=CM_W)


def _countmin_sql(terms=CM_TERMS, d: int = CM_D, w: int = CM_W) -> str:
    """DuckDB twin of q_countmin: same poly+affine buckets via
    poly_hash_duck / affine_sql (the affine text is engine-shared)."""
    from spatialjoincountovershells_spark.functions.texthash import (
        affine_sql,
        poly_hash_duck,
    )

    base_tok = poly_hash_duck("tok")
    base_term = poly_hash_duck("term")
    tok_rows = "\n  UNION ALL\n  ".join(
        f"SELECT {i} AS row, {affine_sql(base_tok, i)} % {w} AS bucket FROM toks"
        for i in range(d)
    )
    probe_rows = "\n  UNION ALL\n  ".join(
        f"SELECT term, {i} AS row, {affine_sql(base_term, i)} % {w} AS bucket "
        f"FROM terms"
        for i in range(d)
    )
    vals = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH toks0 AS (SELECT unnest(list_filter(
    string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS tok
  FROM documents),
toks AS (SELECT tok FROM toks0),
grid0 AS ({tok_rows}),
grid AS (SELECT row, bucket, CAST(count(*) AS BIGINT) AS cnt
         FROM grid0 GROUP BY 1, 2),
terms AS (SELECT * FROM (VALUES {vals}) AS t(term)),
probes AS ({probe_rows})
SELECT p.term,
       CAST(min(coalesce(g.cnt, 0)) AS BIGINT) AS est_count
FROM probes p LEFT JOIN grid g USING (row, bucket)
GROUP BY 1
"""


def q_lm_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-backed corpus-familiarity quality score per document
    (the CCNet-style LM-filter proxy): train the sketch on the corpus,
    score every doc by its tokens' average estimated frequency —
    all-integer contract."""
    docs = _read(spark, sf_dir, "documents")
    return lm_familiarity(docs, d=CM_D, w=CM_W)


def _lm_familiarity_sql(d: int = CM_D, w: int = CM_W) -> str:
    """DuckDB twin of q_lm_familiarity: _countmin_sql's grid + a
    distinct-vocab probe joined back to token occurrences."""
    from spatialjoincountovershells_spark.functions.texthash import (
        affine_sql,
        poly_hash_duck,
    )

    base_tok = poly_hash_duck("tok")
    base_term = poly_hash_duck("term")
    tok_rows = "\n  UNION ALL\n  ".join(
        f"SELECT {i} AS row, {affine_sql(base_tok, i)} % {w} AS bucket FROM toks"
        for i in range(d)
    )
    probe_rows = "\n  UNION ALL\n  ".join(
        f"SELECT term, {i} AS row, {affine_sql(base_term, i)} % {w} AS bucket "
        f"FROM vocab"
        for i in range(d)
    )
    return f"""
WITH toks0 AS (SELECT doc_id, unnest(list_filter(
    string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS tok
  FROM documents),
toks AS (SELECT doc_id, tok FROM toks0),
grid0 AS ({tok_rows}),
grid AS (SELECT row, bucket, CAST(count(*) AS BIGINT) AS cnt
         FROM grid0 GROUP BY 1, 2),
vocab AS (SELECT DISTINCT tok AS term FROM toks),
probes AS ({probe_rows}),
est AS (SELECT term, CAST(min(coalesce(g.cnt, 0)) AS BIGINT) AS est_count
        FROM probes p LEFT JOIN grid g USING (row, bucket) GROUP BY 1),
occ AS (SELECT t.doc_id, e.est_count FROM toks t
        JOIN est e ON e.term = t.tok)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
       CAST(sum(est_count) AS BIGINT) AS sum_est,
       CAST(sum(est_count) // count(*) AS BIGINT) AS fam
FROM occ GROUP BY doc_id
"""


def q_rolling_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1h/24h per-user event features for every event (RANGE
    frames over exact epoch-µs; quantized value sums) — the rolling-
    aggregate backfill of an online feature pipeline."""
    return rolling_counts(_read(spark, sf_dir, "events"),
                          windows_s=(3600, 86400))


def q_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter of each event_type's user set, materialized as its
    8 int64 words (63 usable bits each) — the mergeable join-pruning
    membership sketch."""
    return bloom_words(_read(spark, sf_dir, "events"),
                       ["event_type"], "user_id", m_words=8, k=4)


def q_bloom_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership probes (user ids 0..399 x every event_type) against
    the q_bloom_filter sketches: hit=1 may-contain, hit=0 definitely
    absent — no false negatives by construction."""
    ev = _read(spark, sf_dir, "events")
    sk = bloom_words(ev, ["event_type"], "user_id", m_words=8, k=4)
    probes = (
        ev.select("event_type").distinct()
        .crossJoin(spark.range(400).select(F.col("id").alias("uid")))
    )
    return bloom_might_contain(sk, probes, ["event_type"], "uid",
                               m_words=8, k=4)


def q_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P50/P95/P99 of the event value per event_type via the mergeable
    fixed-bin histogram (bin = clamp(floor(v*8), 0, 511)) — the
    bounded-state quantile shape that survives 100 TB."""
    return hist_quantiles(_read(spark, sf_dir, "events"),
                          ["event_type"], "value")


def _bloom_bits_duck(base: str, m_words: int = 8, k: int = 4,
                     stream0: int = 64) -> list[tuple[str, str]]:
    """(word_idx_sql, mask_sql) per hash — DuckDB twin of the bloom
    bit layout (63 usable bits/word; 1<<63 range-checks in DuckDB)."""
    nbits = 63 * m_words
    out = []
    for i in range(k):
        h = f"({affine_sql(base, stream0 + i)} % {nbits})"
        out.append((
            f"CAST({h} // 63 AS INTEGER)",
            f"(1::BIGINT << CAST({h} % 63 AS INTEGER))",
        ))
    return out


def _bloom_filter_sql() -> str:
    bits = _bloom_bits_duck("base")
    rows = "\n  UNION ALL\n  ".join(
        f"SELECT event_type, {w} AS word_idx, {m} AS mask FROM b"
        for w, m in bits
    )
    return f"""
WITH b AS (SELECT event_type, ((user_id % 2147483647) + 2147483647)
                  % 2147483647 AS base FROM events),
bits AS ({rows}),
w AS (SELECT event_type, word_idx, bit_or(mask) AS word
      FROM bits GROUP BY 1, 2),
grid AS (SELECT DISTINCT event_type, CAST(g.i AS INTEGER) AS word_idx
         FROM events, generate_series(0, 7) g(i))
SELECT grid.event_type, grid.word_idx,
       CAST(COALESCE(w.word, 0) AS BIGINT) AS word
FROM grid LEFT JOIN w USING (event_type, word_idx)
"""


def _bloom_probe_sql() -> str:
    bits = _bloom_bits_duck("base")
    rows = "\n  UNION ALL\n  ".join(
        f"SELECT event_type, uid, {w} AS word_idx, {m} AS mask FROM p"
        for w, m in bits
    )
    return f"""
WITH sk AS ({_bloom_filter_sql()}),
p AS (SELECT DISTINCT event_type, g.uid,
             ((g.uid % 2147483647) + 2147483647) % 2147483647 AS base
      FROM events, generate_series(0, 399) g(uid)),
bits AS ({rows})
SELECT b.event_type, CAST(b.uid AS BIGINT) AS uid,
       CAST(min(CASE WHEN (sk.word & b.mask) = b.mask THEN 1 ELSE 0 END)
            AS INTEGER) AS hit
FROM bits b JOIN sk ON sk.event_type = b.event_type
                   AND sk.word_idx = b.word_idx
GROUP BY 1, 2
"""


BM25_TERMS = ("spark", "hash", "window", "vector")


def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed 4-term
    query — the retrieval-quality scoring step (all-integer quantized
    contract, see text.bm25_scores)."""
    return bm25_scores(_read(spark, sf_dir, "documents"), list(BM25_TERMS))


def _bm25_sql(terms=BM25_TERMS) -> str:
    """DuckDB twin of q_bm25: identical tokenize/avgdl/idf/tf-part
    integer pipeline, `//` mirroring Spark's DIV (all operands
    positive, so truncating and floor division agree)."""
    inlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH toks AS (SELECT doc_id,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS t
  FROM documents),
lens AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST((16 * sum(dl)) // count(*) AS BIGINT) AS a FROM lens),
hits AS (SELECT doc_id, unnest(t) AS term FROM toks),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM hits
       WHERE term IN ({inlist}) GROUP BY 1, 2),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
s AS (SELECT tf.doc_id,
    ((2 * n_docs - 2 * df + 1) * 1024) // (2 * df + 1) AS idf,
    (22 * tf * a * 1024) // (10 * tf * a + 3 * a + 144 * dl) AS tfp
  FROM tf JOIN dfreq USING (term) JOIN lens USING (doc_id) CROSS JOIN stats)
SELECT doc_id, CAST(count(*) AS INTEGER) AS n_hit,
       CAST(sum(idf * tfp) AS BIGINT) AS score_q
FROM s GROUP BY doc_id
"""


def _dbscan_sql(eps: float = 65.0, min_pts: int = 4,
                n: int = 2000, seed: int = 44) -> str:
    """DuckDB twin of q_dbscan: cross-join eps-neighborhoods, closed-
    ball core rule, recursive-CTE components over core-core edges
    labeled by min reachable core id, border = min core-neighbor
    label, noise = -1."""
    return f"""
WITH RECURSIVE {_phash_cte("pts0", n, seed)},
pts AS (SELECT id AS pid, x, y, z FROM pts0),
pr AS (SELECT h.pid AS pa, p.pid AS pb FROM pts h, pts p
       WHERE h.pid <> p.pid AND {_D2} < {eps * eps!r}),
deg AS (SELECT pa AS pid, count(*) AS n FROM pr GROUP BY 1),
core AS (SELECT pid FROM deg WHERE n + 1 >= {min_pts}),
ce AS (SELECT pa, pb FROM pr
       WHERE pa IN (SELECT pid FROM core) AND pb IN (SELECT pid FROM core)
         AND pa < pb),
e AS (SELECT pa AS s, pb AS d FROM ce UNION SELECT pb, pa FROM ce),
reach(s, d) AS (
  SELECT s, d FROM e
  UNION
  SELECT r.s, e2.d FROM reach r JOIN e e2 ON r.d = e2.s
),
clus AS (SELECT s AS pid, least(s, min(d)) AS cl FROM reach GROUP BY s),
corelab AS (SELECT c.pid, coalesce(clus.cl, c.pid) AS cluster_id
            FROM core c LEFT JOIN clus ON c.pid = clus.pid),
border AS (SELECT pr.pa AS pid, min(cb.cluster_id) AS cluster_id
           FROM pr JOIN corelab cb ON pr.pb = cb.pid
           WHERE pr.pa NOT IN (SELECT pid FROM core) GROUP BY pr.pa),
lab AS (SELECT pid, cluster_id, 1 AS is_core FROM corelab
        UNION ALL
        SELECT pid, cluster_id, 0 AS is_core FROM border)
SELECT p.pid AS point_id,
       CAST(coalesce(l.cluster_id, -1) AS BIGINT) AS cluster_id,
       CAST(coalesce(l.is_core, 0) AS INTEGER) AS is_core
FROM pts p LEFT JOIN lab l ON p.pid = l.pid
"""


def _kmeans_ctes(k: int = 8, iters: int = 2, dim: int = 64,
                 scale: int = 1024, prefix: str = "",
                 slice_off: int = 0) -> str:
    """CTE chain of the unrolled Lloyd loop (quantize `{p}q`, init
    `{p}c0`, assignment `{p}a1..a{iters}` with integer-floor centroid
    updates between) — shared by the kmeans_embed / semantic_dedup /
    pq_encode oracles; every step exact int64 (CLAUDE.md determinism
    contract).  `prefix` namespaces the CTEs so several chains coexist
    in one query (PQ subspaces); `slice_off`+`dim` select the
    1-based-inclusive embedding slice [off+1 .. off+dim]."""
    p = prefix
    dist2 = (
        f"list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> ({p}q.q[i] - {{c}}.c[i]) * ({p}q.q[i] - {{c}}.c[i])))"
    )

    def assign(name: str, cent: str) -> str:
        d2 = dist2.format(c=cent)
        return (
            f"{name} AS (SELECT {p}q.vec_id, {cent}.cl, CAST({d2} AS BIGINT) AS dist2\n"
            f"  FROM {p}q, {cent}\n"
            f"  QUALIFY row_number() OVER (PARTITION BY {p}q.vec_id "
            f"ORDER BY dist2, {cent}.cl) = 1)"
        )

    def update(name: str, asg: str) -> str:
        return (
            f"{name}_ex AS (SELECT {asg}.cl, u.d, {p}q.q[u.d] AS v\n"
            f"  FROM {asg} JOIN {p}q USING (vec_id),\n"
            f"  (SELECT unnest(generate_series(1, {dim})) AS d) u),\n"
            f"{name}_s AS (SELECT cl, d, sum(v) AS sv, count(*) AS n "
            f"FROM {name}_ex GROUP BY 1, 2),\n"
            f"{name} AS (SELECT cl, array_agg(CAST(floor(CAST(sv AS DOUBLE) / n) "
            f"AS BIGINT) ORDER BY d) AS c FROM {name}_s GROUP BY cl)"
        )

    vec = (f"embedding[{slice_off + 1}:{slice_off + dim}]"
           if slice_off or dim != 64 else "embedding")
    parts = [
        f"{p}q AS (SELECT vec_id, list_transform({vec}, "
        f"x -> CAST(floor(CAST(x AS DOUBLE) * {scale}.0) AS BIGINT)) AS q "
        f"FROM embeddings)",
        f"{p}c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) "
        f"AS cl, q AS c FROM (SELECT * FROM {p}q ORDER BY vec_id LIMIT {k}))",
    ]
    for i in range(iters):
        parts.append(assign(f"{p}a{i + 1}", f"{p}c{i}"))
        if i < iters - 1:
            parts.append(update(f"{p}c{i + 1}", f"{p}a{i + 1}"))
    return ",\n".join(parts)


def _kmeans_sql(k: int = 8, iters: int = 2, dim: int = 64,
                scale: int = 1024) -> str:
    """DuckDB twin of q_kmeans_embed."""
    return (
        f"WITH {_kmeans_ctes(k, iters, dim, scale)}\n"
        f"SELECT vec_id, CAST(cl AS BIGINT) AS cluster_id, dist2 FROM a{iters}"
    )


def _semantic_dedup_sql(k: int = 8, iters: int = 2, min_sim_1e6: int = 430_000,
                        dim: int = 64, scale: int = 1024) -> str:
    """DuckDB twin of q_semantic_dedup: the shared Lloyd CTEs + a
    within-cluster smaller-id pair scan with the engine's pinned
    integer-cosine tree (verbatim mirror of _cosine_dedup_sql's
    expression)."""
    sim = ("CASE WHEN na2 * nb2 = 0 THEN 0 "
           "ELSE CAST(floor((CAST(dot AS DOUBLE) / sqrt(CAST(na2 * nb2 AS DOUBLE)))"
           " * 1000000.0) AS BIGINT) END")
    return f"""
WITH {_kmeans_ctes(k, iters, dim, scale)},
asg AS (SELECT vec_id, CAST(cl AS BIGINT) AS cluster_id FROM a{iters}),
mm AS (SELECT asg.vec_id, asg.cluster_id, q.q FROM asg JOIN q USING (vec_id)),
pr AS (SELECT a.vec_id AS ida, b.vec_id AS idb,
  list_sum(list_transform(generate_series(1, {dim}), d -> a.q[d] * b.q[d])) AS dot,
  list_sum(list_transform(generate_series(1, {dim}), d -> a.q[d] * a.q[d])) AS na2,
  list_sum(list_transform(generate_series(1, {dim}), d -> b.q[d] * b.q[d])) AS nb2
  FROM mm a JOIN mm b ON a.cluster_id = b.cluster_id AND b.vec_id < a.vec_id),
dup AS (SELECT ida, min(idb) AS dup_of FROM pr
        WHERE ({sim}) >= {min_sim_1e6} GROUP BY ida)
SELECT asg.vec_id, asg.cluster_id,
       CAST(CASE WHEN dup.dup_of IS NULL THEN 1 ELSE 0 END AS INTEGER) AS keep,
       CAST(coalesce(dup.dup_of, -1) AS BIGINT) AS dup_of
FROM asg LEFT JOIN dup ON asg.vec_id = dup.ida
"""


# ------------------------------------------------- geodetic (lat/lon) ops

GEO_EDGES_KM = np.array([50.0, 100.0, 200.0, 400.0])
_GEO_C2 = [float(v * v) for v in chord_edges_km(GEO_EDGES_KM)]
_GEO_SHELL_CASE = (
    f"CASE WHEN d2 < {_GEO_C2[0]!r} THEN 0 WHEN d2 < {_GEO_C2[1]!r} THEN 1 "
    f"WHEN d2 < {_GEO_C2[2]!r} THEN 2 WHEN d2 < {_GEO_C2[3]!r} THEN 3 END"
)


def _geo_rows(spark, sf_dir, table, key, alias) -> DataFrame:
    df = _read(spark, sf_dir, table).select(F.col(key).cast("long").alias(alias))
    return with_key_latlon(df, alias)


def _geo_cte(table: str, key: str, alias: str) -> str:
    """(alias, x, y, z) on the quantized unit-sphere lattice, from keys."""
    lat_sql, lon_sql = sql_latlon(key)
    ux, uy, uz = geo_unit_sql(lat_sql, lon_sql)
    return (
        f"SELECT CAST({key} AS BIGINT) AS {alias}, {ux} AS x, {uy} AS y, "
        f"{uz} AS z FROM {table}"
    )


_GEO_D2 = (
    "((h.x - p.x) * (h.x - p.x) + (h.y - p.y) * (h.y - p.y))"
    " + (h.z - p.z) * (h.z - p.z)"
)


def q_geo_shells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle count-over-shells on geo-tagged rows (the north-star
    input shape): lat/lon embed on the quantized unit sphere, chord-
    transformed edges, then the UNCHANGED shell_count kernel."""
    probes = _geo_rows(spark, sf_dir, "customer", "c_custkey", "probe_id")
    points = _geo_rows(spark, sf_dir, "orders", "o_orderkey", "point_id")
    return geo_shell_count(probes, points, GEO_EDGES_KM, id_col="probe_id")


def q_geo_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse geocode: nearest of 25 broadcast sites per customer row,
    exact integer chord d2, map-side-combined min(struct) — no pair
    shuffle."""
    rows = _geo_rows(spark, sf_dir, "customer", "c_custkey", "row_id")
    sites = _geo_rows(spark, sf_dir, "nation", "n_nationkey", "site_id")
    return geo_nearest_site(rows, sites)


def q_geo_latlon_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equirectangular slippy tiles at level 5 (Z-order ids) over a
    geo-tagged table: one map-side-combined groupBy on the tile key."""
    df = _geo_rows(spark, sf_dir, "part", "p_partkey", "img_id")
    return geo_tile_stats(df, level=5)


def q_geo_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact great-circle kNN (k=3) via ring widening on the chord
    lattice; d2 = exact integer squared chord."""
    rows = _geo_rows(spark, sf_dir, "supplier", "s_suppkey", "row_id")
    cands = _geo_rows(spark, sf_dir, "orders", "o_orderkey", "neighbor_id")
    res = geo_knn(rows, cands, k=3)
    return res.select("row_id", "neighbor_id", "rank",
                      F.col("d2").cast("long").alias("d2"))


def q_geo_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord Gi* hot spots of geo-tagged rows: equirect projection
    bridges lat/lon onto the planar tile grid, then the UNCHANGED
    tile_getis_g operator (the 'where do images cluster' map)."""
    df = _geo_rows(spark, sf_dir, "orders", "o_orderkey", "img_id")
    x, y = geo_equirect_exprs(F.col("lat"), F.col("lon"), BOX)
    return tile_getis_g(df.select(x.alias("x"), y.alias("y")),
                        level=5, box=BOX)


def q_geo_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3-style hex k-ring smoothing of GEO-TAGGED rows (the literal
    north-star shape: H3 cells over lat/lon image rows): equirect
    projection bridges lat/lon into the plane, then the unchanged
    hexagonal-lattice operator."""
    df = _geo_rows(spark, sf_dir, "orders", "o_orderkey", "img_id")
    x, y = geo_equirect_exprs(F.col("lat"), F.col("lon"), BOX)
    return hex_kring_stats(df.select(x.alias("x"), y.alias("y")), 31.25, k=1)


def q_trajectory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user geo trajectory over the time-ordered event stream:
    great-circle hop lengths on the quantized chord lattice (one
    user-key window shuffle), path length / max hop / dwell counts —
    all-int64 contract."""
    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    return trajectory_stats(with_key_latlon(ev, "event_id"))


# ---------------------------------------------------------------- contract

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_shell_count(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "shell_count": q_shell_count,
        "shell_count_fused": q_shell_count_fused,
        "shell_count_bcast": q_shell_count_bcast,
        "shell_count_dgrid": q_shell_count_dgrid,
        "shell_totals": q_shell_totals,
        "autocorr_shells": q_autocorr_shells,
        "ripley_k": q_ripley_k,
        "cross_k": q_cross_k,
        "g_function": q_g_function,
        "f_function": q_f_function,
        "weighted_shells": q_weighted_shells,
        "two_point_xi": q_two_point_xi,
        "range_pairs": q_range_pairs,
        "range_anti": q_range_anti,
        "semi_filtered_shell_count": q_semi_filtered_shell_count,
        "cell_assign": q_cell_assign,
        "cell_stats": q_cell_stats,
        "knn": q_knn,
        "point_in_polygon": q_point_in_polygon,
        "point_in_polygon_grid": q_point_in_polygon_grid,
        "tile_assign": q_tile_assign,
        "tile_rollup": q_tile_rollup,
        "tile_adaptive": q_tile_adaptive,
        "tile_kring": q_tile_kring,
        "hex_rollup": q_hex_rollup,
        "hex_kring": q_hex_kring,
        "hex_dbscan": q_hex_dbscan,
        "geohash_cells": q_geohash_cells,
        "tile_dbscan": q_tile_dbscan,
        "tile_moran": q_tile_moran,
        "tile_getis": q_tile_getis,
        "tile_getis_w": q_tile_getis_w,
        "tile_lisa": q_tile_lisa,
        "tile_joins": q_tile_joins,
        "tile_cover": q_tile_cover,
        "box_join": q_box_join,
        "idw": q_idw,
        "dedup_exact": q_dedup_exact,
        "text_stats": q_text_stats,
        "quality_score": q_quality_score,
        "lang_guess": q_lang_guess,
        "ngram_jaccard": q_ngram_jaccard,
        "ann_l2": q_ann_l2,
        "event_window": q_event_window,
        "event_sessions": q_event_sessions,
        "event_funnel": q_event_funnel,
        "event_retention": q_event_retention,
        "event_attribution": q_event_attribution,
        "event_asof": q_event_asof,
        "minhash_lsh": q_minhash_lsh,
        "dedup_clusters": q_dedup_clusters,
        "pagerank": q_pagerank,
        "corpus_clean": q_corpus_clean,
        "corpus_clean_stats": q_corpus_clean_stats,
        "simhash": q_simhash,
        "simhash_pairs": q_simhash_pairs,
        "phash_near_dup": q_phash_near_dup,
        "image_dedup_clusters": q_image_dedup_clusters,
        "crossmodal_dup": q_crossmodal_dup,
        "ann_cosine": q_ann_cosine,
        "doc_fingerprint": q_doc_fingerprint,
        "doc_chunks": q_doc_chunks,
        "corpus_sample": q_corpus_sample,
        "decontaminate": q_decontaminate,
        "repetition_stats": q_repetition_stats,
        "dup_spans": q_dup_spans,
        "token_topk": q_token_topk,
        "split_assign": q_split_assign,
        "pii_scrub": q_pii_scrub,
        "pack_sequences": q_pack_sequences,
        "sjcs_images": q_sjcs_images,
        "sjcs_images_f64": q_sjcs_images_f64,
        "image_tiles": q_image_tiles,
        "image_roundtrip": q_image_roundtrip,
        "image_features": q_image_features,
        "image_quality": q_image_quality,
        "image_augment": q_image_augment,
        "image_knn_hist": q_image_knn_hist,
        "geo_tile_features": q_geo_tile_features,
        "video_frames": q_video_frames,
        "audio_stats": q_audio_stats,
        "embed_lsh_pairs": q_embed_lsh_pairs,
        "ann_l2_lsh": q_ann_l2_lsh,
        "ann_ivf": q_ann_ivf,
        "cosine_dedup": q_cosine_dedup,
        "embed_dedup_clusters": q_embed_dedup_clusters,
        "dbscan": q_dbscan,
        "kmeans_embed": q_kmeans_embed,
        "semantic_dedup": q_semantic_dedup,
        "bm25": q_bm25,
        "lm_familiarity": q_lm_familiarity,
        "pq_encode": q_pq_encode,
        "pq_ann": q_pq_ann,
        "kmv_distinct": q_kmv_distinct,
        "countmin": q_countmin,
        "rolling_features": q_rolling_features,
        "bloom_filter": q_bloom_filter,
        "bloom_probe": q_bloom_probe,
        "value_quantiles": q_value_quantiles,
        "geo_shells": q_geo_shells,
        "geo_nearest": q_geo_nearest,
        "geo_latlon_tiles": q_geo_latlon_tiles,
        "geo_knn": q_geo_knn,
        "geo_hotspots": q_geo_hotspots,
        "geo_hex": q_geo_hex,
        "quadkey_cells": q_quadkey_cells,
        "tile_distinct": q_tile_distinct,
        "trajectory": q_trajectory,
    }


def _shell_count_sql(halos_cte: str, extra_where: str = "") -> str:
    return f"""
WITH h AS ({halos_cte}),
p AS (SELECT o_orderkey AS particle_id, {sql_coord("o_orderkey", 0)} AS x,
      {sql_coord("o_orderkey", 1)} AS y, {sql_coord("o_orderkey", 2)} AS z FROM orders),
d AS (SELECT h.halo_id, {_D2} AS d2 FROM h, p {extra_where})
SELECT halo_id, {_SHELL_CASE} AS shell_idx, count(*) AS cnt
FROM d WHERE d2 < {R2[-1]} GROUP BY halo_id, shell_idx
"""


def oracle_sql() -> dict[str, str]:
    shell_sql = _shell_count_sql(_halos_cte())
    tokens = (
        "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE "
        "length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 END"
    )
    lang_case = (
        "CASE WHEN instr(' ' || text || ' ', ' der ') > 0 THEN 'de' "
        "WHEN instr(' ' || text || ' ', ' und ') > 0 THEN 'de' "
        "WHEN instr(' ' || text || ' ', ' le ') > 0 THEN 'fr' "
        "WHEN instr(' ' || text || ' ', ' et ') > 0 THEN 'fr' "
        "WHEN instr(' ' || text || ' ', ' el ') > 0 THEN 'es' "
        "WHEN instr(' ' || text || ' ', ' y ') > 0 THEN 'es' "
        "WHEN instr(' ' || text || ' ', ' de ') > 0 THEN 'zh' "
        "WHEN instr(' ' || text || ' ', ' the ') > 0 THEN 'en' "
        "ELSE 'und' END"
    )
    crossing = []
    for pid, verts in POLYGONS.items():
        terms = []
        for (x1, y1), (x2, y2) in zip(verts, verts[1:] + verts[:1]):
            terms.append(
                f"(CASE WHEN (({y1} > py) <> ({y2} > py)) AND "
                f"px < {x1} + (py - {y1}) * ({x2} - {x1}) / ({y2} - {y1}) "
                f"THEN 1 ELSE 0 END)"
            )
        crossing.append(
            f"SELECT point_id, CAST({pid} AS BIGINT) AS poly_id "
            f"FROM pts WHERE ({' + '.join(terms)}) % 2 = 1"
        )
    pip_sql = f"""
WITH pts AS (SELECT o_orderkey AS point_id, {sql_coord("o_orderkey", 0)} AS px,
             {sql_coord("o_orderkey", 1)} AS py FROM orders)
{" UNION ALL ".join(crossing)}
"""
    return {
        "shell_count": shell_sql,
        "shell_count_fused": shell_sql,
        "shell_count_bcast": shell_sql,
        "shell_count_dgrid": shell_sql,
        "two_point_xi": f"""
WITH dp AS (SELECT p_partkey AS id, {sql_coord("p_partkey", 0)} AS x,
      {sql_coord("p_partkey", 1)} AS y, {sql_coord("p_partkey", 2)} AS z FROM part),
{_phash_cte("rnd", 2000, 31)},
nd AS (SELECT count(*) AS n FROM dp),
ddt AS (SELECT {_SHELL_CASE} AS shell_idx, count(*) AS dd
  FROM (SELECT {_D2} AS d2 FROM dp h JOIN dp p ON h.id != p.id)
  WHERE d2 < {R2[-1]} GROUP BY shell_idx),
drt AS (SELECT {_SHELL_CASE} AS shell_idx, count(*) AS dr
  FROM (SELECT {_D2} AS d2 FROM dp h, rnd p)
  WHERE d2 < {R2[-1]} GROUP BY shell_idx),
rrt AS (SELECT {_SHELL_CASE} AS shell_idx, count(*) AS rr
  FROM (SELECT {_D2} AS d2 FROM rnd h JOIN rnd p ON h.id != p.id)
  WHERE d2 < {R2[-1]} GROUP BY shell_idx),
j AS (SELECT COALESCE(a.shell_idx, b.shell_idx, c.shell_idx) AS shell_idx,
      COALESCE(dd, 0) AS dd, COALESCE(dr, 0) AS dr, COALESCE(rr, 0) AS rr
  FROM ddt a FULL JOIN drt b ON a.shell_idx = b.shell_idx
  FULL JOIN rrt c ON COALESCE(a.shell_idx, b.shell_idx) = c.shell_idx)
SELECT shell_idx, dd, dr, rr,
  CAST(floor(((CAST(dd AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))
    - 2.0 * (CAST(dr AS DOUBLE) / (CAST(n AS DOUBLE) * 2000.0))
    + CAST(rr AS DOUBLE) / (2000.0 * 1999.0))
    / (CAST(rr AS DOUBLE) / (2000.0 * 1999.0))) * 1048576.0) AS BIGINT) AS xi_q
FROM j, nd WHERE rr > 0
""",
        "weighted_shells": f"""
WITH h AS ({_halos_cte()}),
p AS (SELECT o_orderkey % 97 AS w, {sql_coord("o_orderkey", 0)} AS x,
      {sql_coord("o_orderkey", 1)} AS y, {sql_coord("o_orderkey", 2)} AS z FROM orders),
d AS (SELECT h.halo_id, p.w, {_D2} AS d2 FROM h, p)
SELECT halo_id, {_SHELL_CASE} AS shell_idx, count(*) AS cnt,
       CAST(sum(w) AS BIGINT) AS wsum
FROM d WHERE d2 < {R2[-1]} GROUP BY halo_id, shell_idx
""",
        "autocorr_shells": f"""
WITH pp AS (SELECT p_partkey AS id, {sql_coord("p_partkey", 0)} AS x,
      {sql_coord("p_partkey", 1)} AS y, {sql_coord("p_partkey", 2)} AS z FROM part),
d AS (SELECT {_D2} AS d2 FROM pp h JOIN pp p ON h.id != p.id)
SELECT {_SHELL_CASE} AS shell_idx, CAST(count(*) AS BIGINT) AS n_pairs
FROM d WHERE d2 < {R2[-1]} GROUP BY shell_idx
""",
        "ripley_k": f"""
WITH pp AS (SELECT p_partkey AS id, {sql_coord("p_partkey", 0)} AS x,
      {sql_coord("p_partkey", 1)} AS y, {sql_coord("p_partkey", 2)} AS z FROM part),
d AS (SELECT {_D2} AS d2 FROM pp h JOIN pp p ON h.id != p.id),
cnt AS (SELECT {_SHELL_CASE} AS shell_idx, count(*) AS np
        FROM d WHERE d2 < {R2[-1]} GROUP BY shell_idx),
shells AS (SELECT CAST(unnest(generate_series(0, {len(EDGES) - 1})) AS INTEGER)
           AS shell_idx),
c AS (SELECT s.shell_idx, coalesce(cnt.np, 0) AS np
      FROM shells s LEFT JOIN cnt USING (shell_idx)),
t AS (SELECT count(*) AS n FROM pp),
cum AS (SELECT shell_idx, sum(np) OVER (ORDER BY shell_idx) AS cum FROM c)
SELECT shell_idx, CAST(cum AS BIGINT) AS cum_pairs,
       CAST(floor((CAST(cum AS DOUBLE) * 1000000000.0
                   / CAST(n * (n - 1) AS DOUBLE)) * 1024.0) AS BIGINT) AS k_q10
FROM cum, t
""",
        "cross_k": f"""
WITH aa AS (SELECT {sql_coord("p_partkey", 0)} AS x, {sql_coord("p_partkey", 1)} AS y,
                   {sql_coord("p_partkey", 2)} AS z FROM part),
bb AS (SELECT {sql_coord("c_custkey", 0)} AS x, {sql_coord("c_custkey", 1)} AS y,
              {sql_coord("c_custkey", 2)} AS z FROM customer),
d AS (SELECT {_D2} AS d2 FROM aa h CROSS JOIN bb p),
cnt AS (SELECT {_SHELL_CASE} AS shell_idx, count(*) AS np
        FROM d WHERE d2 < {R2[-1]} GROUP BY shell_idx),
shells AS (SELECT CAST(unnest(generate_series(0, {len(EDGES) - 1})) AS INTEGER)
           AS shell_idx),
c AS (SELECT s.shell_idx, coalesce(cnt.np, 0) AS np
      FROM shells s LEFT JOIN cnt USING (shell_idx)),
t AS (SELECT (SELECT count(*) FROM aa) * (SELECT count(*) FROM bb) AS nn),
cum AS (SELECT shell_idx, sum(np) OVER (ORDER BY shell_idx) AS cum FROM c)
SELECT shell_idx, CAST(cum AS BIGINT) AS cum_pairs,
       CAST(floor((CAST(cum AS DOUBLE) * 1000000000.0
                   / CAST(nn AS DOUBLE)) * 1024.0) AS BIGINT) AS k_q10
FROM cum, t
""",
        "g_function": f"""
WITH pp AS (SELECT p_partkey AS id, {sql_coord("p_partkey", 0)} AS x,
      {sql_coord("p_partkey", 1)} AS y, {sql_coord("p_partkey", 2)} AS z FROM part),
mins AS (SELECT h.id AS qid, min({_D2}) AS d2
         FROM pp h JOIN pp p ON h.id != p.id GROUP BY h.id),
cnt AS (SELECT {_SHELL_CASE} AS shell_idx, count(*) AS c
        FROM mins WHERE d2 < {R2[-1]} GROUP BY shell_idx),
shells AS (SELECT CAST(unnest(generate_series(0, {len(EDGES) - 1})) AS INTEGER)
           AS shell_idx),
j AS (SELECT s.shell_idx, coalesce(cnt.c, 0) AS c
      FROM shells s LEFT JOIN cnt USING (shell_idx)),
t AS (SELECT count(*) AS n FROM pp),
cum AS (SELECT shell_idx, sum(c) OVER (ORDER BY shell_idx) AS cum FROM j)
SELECT shell_idx, CAST(cum AS BIGINT) AS n_lt,
       CAST((cum * 1000000) // n AS BIGINT) AS g_ppm
FROM cum, t
""",
        "f_function": f"""
WITH pp AS (SELECT {sql_coord("p_partkey", 0)} AS x, {sql_coord("p_partkey", 1)} AS y,
                   {sql_coord("p_partkey", 2)} AS z FROM part),
cc AS (SELECT c_custkey AS id, {sql_coord("c_custkey", 0)} AS x,
              {sql_coord("c_custkey", 1)} AS y, {sql_coord("c_custkey", 2)} AS z FROM customer),
mins AS (SELECT h.id AS qid, min({_D2}) AS d2
         FROM cc h CROSS JOIN pp p GROUP BY h.id),
cnt AS (SELECT {_SHELL_CASE} AS shell_idx, count(*) AS c
        FROM mins WHERE d2 < {R2[-1]} GROUP BY shell_idx),
shells AS (SELECT CAST(unnest(generate_series(0, {len(EDGES) - 1})) AS INTEGER)
           AS shell_idx),
j AS (SELECT s.shell_idx, coalesce(cnt.c, 0) AS c
      FROM shells s LEFT JOIN cnt USING (shell_idx)),
t AS (SELECT count(*) AS n FROM cc),
cum AS (SELECT shell_idx, sum(c) OVER (ORDER BY shell_idx) AS cum FROM j)
SELECT shell_idx, CAST(cum AS BIGINT) AS n_lt,
       CAST((cum * 1000000) // n AS BIGINT) AS g_ppm
FROM cum, t
""",
        "shell_totals": f"""
WITH base AS ({shell_sql})
SELECT shell_idx, CAST(sum(cnt) AS BIGINT) AS total FROM base GROUP BY shell_idx
""",
        "range_pairs": f"""
WITH h AS ({_halos_cte("supplier", "s_suppkey")}),
p AS (SELECT o_orderkey AS particle_id, {sql_coord("o_orderkey", 0)} AS x,
      {sql_coord("o_orderkey", 1)} AS y, {sql_coord("o_orderkey", 2)} AS z FROM orders)
SELECT h.halo_id, p.particle_id FROM h, p WHERE {_D2} < 6400.0
""",
        "range_anti": f"""
WITH h AS ({_halos_cte()} WHERE c_custkey % 50 = 0),
p AS (SELECT o_orderkey AS particle_id, {sql_coord("o_orderkey", 0)} AS x,
      {sql_coord("o_orderkey", 1)} AS y, {sql_coord("o_orderkey", 2)} AS z FROM orders)
SELECT p.particle_id, CAST(p.x * 64 AS BIGINT) AS xq,
       CAST(p.y * 64 AS BIGINT) AS yq, CAST(p.z * 64 AS BIGINT) AS zq
FROM p WHERE NOT EXISTS (SELECT 1 FROM h WHERE {_D2} < 10000.0)
""",
        "semi_filtered_shell_count": _shell_count_sql(
            _halos_cte()
            + " WHERE c_custkey IN (SELECT s_suppkey FROM supplier)"
        ),
        "cell_assign": f"""
WITH p AS (SELECT {sql_coord("o_orderkey", 0)} AS x, {sql_coord("o_orderkey", 1)} AS y,
           {sql_coord("o_orderkey", 2)} AS z FROM orders)
SELECT (least(greatest(CAST(floor(x / 125.0) AS BIGINT), 0), 7) * 8
      + least(greatest(CAST(floor(y / 125.0) AS BIGINT), 0), 7)) * 8
      + least(greatest(CAST(floor(z / 125.0) AS BIGINT), 0), 7) AS cell_id,
      count(*) AS n_points
FROM p GROUP BY cell_id
""",
        "cell_stats": f"""
WITH p AS (SELECT {sql_coord("o_orderkey", 0)} AS x, {sql_coord("o_orderkey", 1)} AS y,
           {sql_coord("o_orderkey", 2)} AS z FROM orders)
SELECT (least(greatest(CAST(floor(x / 125.0) AS BIGINT), 0), 7) * 8
      + least(greatest(CAST(floor(y / 125.0) AS BIGINT), 0), 7)) * 8
      + least(greatest(CAST(floor(z / 125.0) AS BIGINT), 0), 7) AS cell_id,
      count(*) AS n_points,
      min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y,
      min(z) AS min_z, max(z) AS max_z
FROM p GROUP BY cell_id
""",
        "knn": f"""
WITH h AS ({_halos_cte("supplier", "s_suppkey")}),
p AS (SELECT o_orderkey AS particle_id, {sql_coord("o_orderkey", 0)} AS x,
      {sql_coord("o_orderkey", 1)} AS y, {sql_coord("o_orderkey", 2)} AS z FROM orders),
d AS (SELECT h.halo_id, p.particle_id, {_D2} AS d2 FROM h, p)
SELECT halo_id, particle_id,
       CAST(row_number() OVER (PARTITION BY halo_id ORDER BY d2, particle_id) AS INTEGER) AS rank
FROM d QUALIFY rank <= 3
""",
        "point_in_polygon": pip_sql,
        "point_in_polygon_grid": pip_sql,
        "tile_assign": f"""
WITH p AS (SELECT {sql_coord("o_orderkey", 0)} AS x, {sql_coord("o_orderkey", 1)} AS y FROM orders)
SELECT least(greatest(CAST(floor(x / 62.5) AS BIGINT), 0), 15) * 16
     + least(greatest(CAST(floor(y / 62.5) AS BIGINT), 0), 15) AS tile_id,
     count(*) AS n_points
FROM p GROUP BY tile_id
""",
        "tile_rollup": f"""
WITH p AS (SELECT {sql_coord("o_orderkey", 0)} AS x, {sql_coord("o_orderkey", 1)} AS y FROM orders),
t AS (SELECT least(greatest(CAST(floor(x / 15.625) AS BIGINT), 0), 63) AS tx,
             least(greatest(CAST(floor(y / 15.625) AS BIGINT), 0), 63) AS ty FROM p),
{morton_sql_ctes("t", "tx", "ty")},
f AS (SELECT tile_id, count(*) AS n FROM m5 GROUP BY tile_id),
lv AS (SELECT unnest(generate_series(0, 6)) AS level)
SELECT CAST(lv.level AS INTEGER) AS level,
       f.tile_id >> (2 * (6 - lv.level)) AS tile_id,
       CAST(sum(f.n) AS BIGINT) AS n_points
FROM f, lv GROUP BY 1, 2
""",
        "tile_adaptive": f"""
WITH p AS (SELECT {sql_coord("o_orderkey", 0)} AS x, {sql_coord("o_orderkey", 1)} AS y FROM orders),
t AS (SELECT least(greatest(CAST(floor(x / 15.625) AS BIGINT), 0), 63) AS tx,
             least(greatest(CAST(floor(y / 15.625) AS BIGINT), 0), 63) AS ty FROM p),
{morton_sql_ctes("t", "tx", "ty")},
f AS (SELECT tile_id, count(*) AS n FROM m5 GROUP BY tile_id),
lv AS (SELECT unnest(generate_series(0, 6)) AS level),
pyr AS (SELECT lv.level AS level, f.tile_id >> (2 * (6 - lv.level)) AS tile_id,
               sum(f.n) AS n
        FROM f, lv GROUP BY 1, 2)
SELECT CAST(c.level AS INTEGER) AS level, c.tile_id AS tile_id,
       CAST(c.n AS BIGINT) AS n_points
FROM pyr c LEFT JOIN pyr pa
  ON pa.level = c.level - 1 AND pa.tile_id = c.tile_id >> 2
WHERE (c.n <= 64 OR c.level = 6) AND (c.level = 0 OR pa.n > 64)
""",
        "tile_kring": f"""
WITH p AS (SELECT {sql_coord("o_orderkey", 0)} AS x, {sql_coord("o_orderkey", 1)} AS y FROM orders),
t AS (SELECT least(greatest(CAST(floor(x / 31.25) AS BIGINT), 0), 31) AS tx,
             least(greatest(CAST(floor(y / 31.25) AS BIGINT), 0), 31) AS ty FROM p),
tc AS (SELECT tx, ty, count(*) AS n FROM t GROUP BY tx, ty),
offs AS (SELECT gx.dx AS dx, gy.dy AS dy
         FROM unnest(generate_series(-1, 1)) AS gx(dx),
              unnest(generate_series(-1, 1)) AS gy(dy)),
scat AS (SELECT tx + dx AS rx, ty + dy AS ry, n,
                CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END AS own
         FROM tc, offs
         WHERE tx + dx BETWEEN 0 AND 31 AND ty + dy BETWEEN 0 AND 31),
g AS (SELECT rx AS tx, ry AS ty,
             sum(own * n) AS n_points, sum(n) AS kring_sum,
             count(*) AS n_kring_tiles, max(own) AS occ
      FROM scat GROUP BY rx, ry),
o AS (SELECT * FROM g WHERE occ = 1),
{morton_sql_ctes("o", "tx", "ty")}
SELECT tile_id, CAST(n_points AS BIGINT) AS n_points,
       CAST(kring_sum AS BIGINT) AS kring_sum,
       CAST(n_kring_tiles AS BIGINT) AS n_kring_tiles
FROM m5
""",
        "hex_rollup": f"""
WITH p AS (SELECT {sql_coord("o_orderkey", 0)} AS x, {sql_coord("o_orderkey", 1)} AS y FROM orders),
{hex_axial_ctes("p", "x", "y", 31.25)}
SELECT hq, hr, count(*) AS n_points FROM hx2 GROUP BY hq, hr
""",
        "hex_kring": f"""
WITH p AS (SELECT {sql_coord("o_orderkey", 0)} AS x, {sql_coord("o_orderkey", 1)} AS y FROM orders),
{hex_axial_ctes("p", "x", "y", 31.25)},
hc AS (SELECT hq, hr, count(*) AS n FROM hx2 GROUP BY hq, hr),
offs(dq, dr) AS (VALUES {", ".join(f"({a}, {b})" for a, b in hex_ring_offsets(1))}),
scat AS (SELECT hq + dq AS rq, hr + dr AS rr, n,
                CASE WHEN dq = 0 AND dr = 0 THEN 1 ELSE 0 END AS own
         FROM hc, offs),
g AS (SELECT rq, rr, sum(own * n) AS n_points, sum(n) AS kring_sum,
             count(*) AS n_kring_cells, max(own) AS occ
      FROM scat GROUP BY rq, rr)
SELECT rq AS hq, rr AS hr, CAST(n_points AS BIGINT) AS n_points,
       CAST(kring_sum AS BIGINT) AS kring_sum,
       CAST(n_kring_cells AS BIGINT) AS n_kring_cells
FROM g WHERE occ = 1
""",
        "quadkey_cells": (
            "WITH g0 AS (SELECT "
            + "{} AS lat, {} AS lon FROM orders),\n".format(
                *sql_latlon("o_orderkey"))
            + morton_sql_ctes("g0", *geo_tile_sql("lat", "lon", 5))
            + f"\nSELECT {quadkey_sql('tile_id', 5)} AS quadkey, "
            "count(*) AS n_points FROM m5 GROUP BY 1"
        ),
        "hex_dbscan": f"""
WITH RECURSIVE
p AS (SELECT {sql_coord("o_orderkey", 0)} AS x, {sql_coord("o_orderkey", 1)} AS y FROM orders),
{hex_axial_ctes("p", "x", "y", 31.25)},
tc AS (SELECT hq, hr, count(*) AS n, {hex_key_sql("hq", "hr")} AS key
       FROM hx2 GROUP BY hq, hr),
core AS (SELECT * FROM tc WHERE n >= 40),
offs(dq, dr) AS (VALUES {", ".join(f"({a}, {b})" for a, b in hex_ring_offsets(1, include_self=False))}),
adj AS (SELECT a.key AS src, b.key AS dst
        FROM core a, offs o, core b
        WHERE b.hq = a.hq + o.dq AND b.hr = a.hr + o.dr),
reach(a, b) AS (SELECT key, key FROM core
                UNION
                SELECT r.a, e.dst FROM reach r JOIN adj e ON r.b = e.src),
lbl AS (SELECT a AS key, min(b) AS cluster_id FROM reach GROUP BY a),
corerows AS (SELECT c.hq, c.hr, CAST(c.n AS BIGINT) AS n_points,
                    'core' AS role, l.cluster_id
             FROM core c JOIN lbl l USING (key)),
bl AS (SELECT t.key, min(l.cluster_id) AS cluster_id
       FROM tc t, offs o, core c
       JOIN lbl l ON l.key = c.key
       WHERE t.n < 40 AND c.hq = t.hq + o.dq AND c.hr = t.hr + o.dr
       GROUP BY t.key),
rest AS (SELECT t.hq, t.hr, CAST(t.n AS BIGINT) AS n_points,
                CASE WHEN b.cluster_id IS NOT NULL THEN 'border'
                     ELSE 'noise' END AS role,
                coalesce(b.cluster_id, -1) AS cluster_id
         FROM tc t LEFT JOIN bl b USING (key) WHERE t.n < 40)
SELECT hq, hr, n_points, role, CAST(cluster_id AS BIGINT) AS cluster_id
FROM corerows
UNION ALL
SELECT hq, hr, n_points, role, CAST(cluster_id AS BIGINT) AS cluster_id
FROM rest
""",
        "geohash_cells": (
            "WITH src AS (SELECT {} AS lat, {} AS lon FROM orders),\n"
            .format(*sql_latlon("o_orderkey"))
            + geohash_sql("lat", "lon", 3)
            + "\nSELECT geohash, count(*) AS n_points FROM ghf GROUP BY geohash"
        ),
        "tile_dbscan": f"""
WITH RECURSIVE
p AS (SELECT {sql_coord("o_orderkey", 0)} AS x, {sql_coord("o_orderkey", 1)} AS y FROM orders),
t AS (SELECT least(greatest(CAST(floor(x / 31.25) AS BIGINT), 0), 31) AS tx,
             least(greatest(CAST(floor(y / 31.25) AS BIGINT), 0), 31) AS ty FROM p),
tcnt AS (SELECT tx, ty, count(*) AS n FROM t GROUP BY tx, ty),
{morton_sql_ctes("tcnt", "tx", "ty", out="mk")},
tc AS (SELECT tx, ty, n, tile_id FROM mk5),
core AS (SELECT * FROM tc WHERE n >= 17),
adj AS (SELECT a.tile_id AS src, b.tile_id AS dst FROM core a JOIN core b
        ON abs(a.tx - b.tx) <= 1 AND abs(a.ty - b.ty) <= 1
           AND NOT (a.tx = b.tx AND a.ty = b.ty)),
reach(a, b) AS (SELECT tile_id, tile_id FROM core
                UNION
                SELECT r.a, e.dst FROM reach r JOIN adj e ON r.b = e.src),
lbl AS (SELECT a AS tile_id, min(b) AS cluster_id FROM reach GROUP BY a),
corerows AS (SELECT c.tile_id, CAST(c.n AS BIGINT) AS n_points,
                    'core' AS role, l.cluster_id
             FROM core c JOIN lbl l USING (tile_id)),
bl AS (SELECT o.tile_id, min(l.cluster_id) AS cluster_id
       FROM tc o JOIN core c
         ON abs(o.tx - c.tx) <= 1 AND abs(o.ty - c.ty) <= 1
            AND NOT (o.tx = c.tx AND o.ty = c.ty)
       JOIN lbl l ON l.tile_id = c.tile_id
       WHERE o.n < 17 GROUP BY o.tile_id),
rest AS (SELECT o.tile_id, CAST(o.n AS BIGINT) AS n_points,
                CASE WHEN bl.cluster_id IS NOT NULL THEN 'border'
                     ELSE 'noise' END AS role,
                coalesce(bl.cluster_id, -1) AS cluster_id
         FROM tc o LEFT JOIN bl USING (tile_id) WHERE o.n < 17)
SELECT * FROM corerows UNION ALL SELECT * FROM rest
""",
        "tile_moran": f"""
WITH p AS (SELECT {sql_coord("o_orderkey", 0)} AS x, {sql_coord("o_orderkey", 1)} AS y FROM orders),
t AS (SELECT least(greatest(CAST(floor(x / 31.25) AS BIGINT), 0), 31) AS tx,
             least(greatest(CAST(floor(y / 31.25) AS BIGINT), 0), 31) AS ty FROM p),
tc AS (SELECT tx, ty, count(*) AS n FROM t GROUP BY tx, ty),
cells AS (SELECT gx.a AS tx, gy.b AS ty
          FROM unnest(generate_series(0, 31)) AS gx(a),
               unnest(generate_series(0, 31)) AS gy(b)),
xg AS (SELECT c.tx, c.ty, coalesce(tc.n, 0) AS n
       FROM cells c LEFT JOIN tc USING (tx, ty)),
tot AS (SELECT CAST(sum(n) AS HUGEINT) AS s,
               sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS n_occ FROM xg),
d AS (SELECT tx, ty,
             CAST(1024 AS HUGEINT) * CAST(n AS HUGEINT) - tot.s AS d
      FROM xg, tot),
cross_t AS (SELECT sum(a.d * b.d) AS c FROM d a JOIN d b
            ON abs(a.tx - b.tx) <= 1 AND abs(a.ty - b.ty) <= 1
               AND NOT (a.tx = b.tx AND a.ty = b.ty)),
var_t AS (SELECT sum(d * d) AS dd FROM d)
SELECT CAST(1024 AS BIGINT) AS n_cells,
       CAST(tot.n_occ AS BIGINT) AS n_occupied,
       CAST(tot.s AS BIGINT) AS n_points,
       CAST(7812 AS BIGINT) AS w_pairs,
       CAST(floor(((CAST(cross_t.c AS DOUBLE) / CAST(var_t.dd AS DOUBLE))
                    * 1024.0) / 7812.0 * 1048576.0) AS BIGINT) AS i_q20
FROM tot, cross_t, var_t
""",
        "tile_getis": f"""
WITH p AS (SELECT {sql_coord("o_orderkey", 0)} AS x, {sql_coord("o_orderkey", 1)} AS y FROM orders),
t AS (SELECT least(greatest(CAST(floor(x / 31.25) AS BIGINT), 0), 31) AS tx,
             least(greatest(CAST(floor(y / 31.25) AS BIGINT), 0), 31) AS ty FROM p),
tcnt AS (SELECT tx, ty, count(*) AS n FROM t GROUP BY tx, ty),
offs AS (SELECT gx.a AS dx, gy.b AS dy
         FROM unnest(generate_series(-1, 1)) AS gx(a),
              unnest(generate_series(-1, 1)) AS gy(b)),
scat AS (SELECT tx + dx AS rx, ty + dy AS ry, n,
                CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END AS own
         FROM tcnt, offs
         WHERE tx + dx BETWEEN 0 AND 31 AND ty + dy BETWEEN 0 AND 31),
cell AS (SELECT rx, ry, sum(own * n) AS cx, sum((1 - own) * n) AS cr
         FROM scat GROUP BY rx, ry),
cm AS (SELECT rx, ry, cx, cr,
              (least(rx + 1, 31) - greatest(rx - 1, 0) + 1)
            * (least(ry + 1, 31) - greatest(ry - 1, 0) + 1) AS w FROM cell),
tot AS (SELECT CAST(sum(cx) AS HUGEINT) AS s,
               sum(CAST(cx AS HUGEINT) * CAST(cx AS HUGEINT)) AS s2 FROM cell),
{morton_sql_ctes("cm", "rx", "ry", out="mg")},
g AS (SELECT tile_id, cx, cr, w,
             CAST(1024 AS HUGEINT) * (CAST(cx AS HUGEINT) + CAST(cr AS HUGEINT))
               - tot.s * CAST(w AS HUGEINT) AS a,
             CAST(1024 AS HUGEINT) * tot.s2 - tot.s * tot.s AS b,
             CAST(1024 AS HUGEINT) * CAST(w AS HUGEINT)
               - CAST(w AS HUGEINT) * CAST(w AS HUGEINT) AS c
      FROM mg5, tot)
SELECT tile_id, CAST(cx AS BIGINT) AS n_points,
       CAST(cx + cr AS BIGINT) AS ring_sum, CAST(w AS BIGINT) AS w,
       CAST(floor((CAST(a AS DOUBLE)
                   / sqrt(CAST(b AS DOUBLE) * CAST(c AS DOUBLE) / 1023.0))
                  * 1048576.0) AS BIGINT) AS gi_q20
FROM g
""",
        "tile_getis_w": f"""
WITH p AS (SELECT {sql_coord("o_orderkey", 0)} AS x, {sql_coord("o_orderkey", 1)} AS y,
                  o_orderkey % 97 AS w FROM orders),
t AS (SELECT least(greatest(CAST(floor(x / 31.25) AS BIGINT), 0), 31) AS tx,
             least(greatest(CAST(floor(y / 31.25) AS BIGINT), 0), 31) AS ty,
             w FROM p),
tcnt AS (SELECT tx, ty, sum(w) AS n FROM t GROUP BY tx, ty),
offs AS (SELECT gx.a AS dx, gy.b AS dy
         FROM unnest(generate_series(-1, 1)) AS gx(a),
              unnest(generate_series(-1, 1)) AS gy(b)),
scat AS (SELECT tx + dx AS rx, ty + dy AS ry, n,
                CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END AS own
         FROM tcnt, offs
         WHERE tx + dx BETWEEN 0 AND 31 AND ty + dy BETWEEN 0 AND 31),
cell AS (SELECT rx, ry, sum(own * n) AS cx, sum((1 - own) * n) AS cr
         FROM scat GROUP BY rx, ry),
cm AS (SELECT rx, ry, cx, cr,
              (least(rx + 1, 31) - greatest(rx - 1, 0) + 1)
            * (least(ry + 1, 31) - greatest(ry - 1, 0) + 1) AS w FROM cell),
tot AS (SELECT CAST(sum(cx) AS HUGEINT) AS s,
               sum(CAST(cx AS HUGEINT) * CAST(cx AS HUGEINT)) AS s2 FROM cell),
{morton_sql_ctes("cm", "rx", "ry", out="mw")},
g AS (SELECT tile_id, cx, cr, w,
             CAST(1024 AS HUGEINT) * (CAST(cx AS HUGEINT) + CAST(cr AS HUGEINT))
               - tot.s * CAST(w AS HUGEINT) AS a,
             CAST(1024 AS HUGEINT) * tot.s2 - tot.s * tot.s AS b,
             CAST(1024 AS HUGEINT) * CAST(w AS HUGEINT)
               - CAST(w AS HUGEINT) * CAST(w AS HUGEINT) AS c
      FROM mw5, tot)
SELECT tile_id, CAST(cx AS BIGINT) AS n_points,
       CAST(cx + cr AS BIGINT) AS ring_sum, CAST(w AS BIGINT) AS w,
       CAST(floor((CAST(a AS DOUBLE)
                   / sqrt(CAST(b AS DOUBLE) * CAST(c AS DOUBLE) / 1023.0))
                  * 1048576.0) AS BIGINT) AS gi_q20
FROM g
""",
        "tile_lisa": f"""
WITH p AS (SELECT {sql_coord("o_orderkey", 0)} AS x, {sql_coord("o_orderkey", 1)} AS y FROM orders),
t AS (SELECT least(greatest(CAST(floor(x / 31.25) AS BIGINT), 0), 31) AS tx,
             least(greatest(CAST(floor(y / 31.25) AS BIGINT), 0), 31) AS ty FROM p),
tcnt AS (SELECT tx, ty, count(*) AS n FROM t GROUP BY tx, ty),
offs AS (SELECT gx.a AS dx, gy.b AS dy
         FROM unnest(generate_series(-1, 1)) AS gx(a),
              unnest(generate_series(-1, 1)) AS gy(b)),
scat AS (SELECT tx + dx AS rx, ty + dy AS ry, n,
                CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END AS own
         FROM tcnt, offs
         WHERE tx + dx BETWEEN 0 AND 31 AND ty + dy BETWEEN 0 AND 31),
cell AS (SELECT rx, ry, sum(own * n) AS cx, sum((1 - own) * n) AS cr
         FROM scat GROUP BY rx, ry),
cm AS (SELECT rx, ry, cx, cr,
              (least(rx + 1, 31) - greatest(rx - 1, 0) + 1)
            * (least(ry + 1, 31) - greatest(ry - 1, 0) + 1) - 1 AS m FROM cell),
tot AS (SELECT CAST(sum(cx) AS HUGEINT) AS s,
               sum(CAST(cx AS HUGEINT) * CAST(cx AS HUGEINT)) AS s2 FROM cell),
{morton_sql_ctes("cm", "rx", "ry", out="ml")},
g AS (SELECT tile_id, cx, cr, m,
             CAST(1024 AS HUGEINT) * CAST(cx AS HUGEINT) - tot.s AS dx,
             CAST(1024 AS HUGEINT) * CAST(cr AS HUGEINT)
               - tot.s * CAST(m AS HUGEINT) AS dr,
             CAST(1024 AS HUGEINT) * tot.s2 - tot.s * tot.s AS b
      FROM ml5, tot)
SELECT tile_id, CAST(cx AS BIGINT) AS n_points,
       CAST(cr AS BIGINT) AS neigh_sum, CAST(m AS BIGINT) AS m,
       CAST(CASE WHEN dx > 0 AND dr > 0 THEN 1
                 WHEN dx <= 0 AND dr <= 0 THEN 2
                 WHEN dx > 0 THEN 3 ELSE 4 END AS INTEGER) AS quad,
       CAST(floor((CAST(dx * dr AS DOUBLE) / CAST(b AS DOUBLE))
                  * 1048576.0) AS BIGINT) AS ii_q20
FROM g
""",
        "tile_joins": f"""
WITH p AS (SELECT {sql_coord("o_orderkey", 0)} AS x, {sql_coord("o_orderkey", 1)} AS y FROM orders),
t AS (SELECT least(greatest(CAST(floor(x / 31.25) AS BIGINT), 0), 31) AS tx,
             least(greatest(CAST(floor(y / 31.25) AS BIGINT), 0), 31) AS ty FROM p),
blk AS (SELECT tx, ty FROM t GROUP BY tx, ty HAVING count(*) >= 15),
offs AS (SELECT gx.a AS dx, gy.b AS dy
         FROM unnest(generate_series(-1, 1)) AS gx(a),
              unnest(generate_series(-1, 1)) AS gy(b)),
scat AS (SELECT tx + dx AS rx, ty + dy AS ry,
                CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END AS own
         FROM blk, offs
         WHERE tx + dx BETWEEN 0 AND 31 AND ty + dy BETWEEN 0 AND 31),
cell AS (SELECT rx, ry, sum(own) AS x, sum(1 - own) AS r
         FROM scat GROUP BY rx, ry),
cm AS (SELECT x, r,
              (least(rx + 1, 31) - greatest(rx - 1, 0) + 1)
            * (least(ry + 1, 31) - greatest(ry - 1, 0) + 1) - 1 AS m FROM cell),
a AS (SELECT coalesce(sum(x), 0) AS b, coalesce(sum(x * r), 0) AS a2,
             coalesce(sum(x * (m - r)), 0) AS bw FROM cm)
SELECT CAST(1024 AS BIGINT) AS n_cells, CAST(b AS BIGINT) AS n_black,
       CAST(a2 // 2 AS BIGINT) AS bb, CAST(bw AS BIGINT) AS bw,
       CAST(3906 - a2 // 2 - bw AS BIGINT) AS ww,
       CAST(floor((3906.0 * CAST(b * (b - 1) AS DOUBLE) / 1047552.0)
                  * 1048576.0) AS BIGINT) AS exp_bb_q20
FROM a
""",
        "tile_cover": f"""
WITH v(poly_id, x, y) AS (VALUES {", ".join(
    f"(CAST({pid} AS BIGINT), {float(x)}, {float(y)})"
    for pid, vs in POLYGONS.items() for x, y in vs)}),
b AS (SELECT poly_id, min(x) AS xmin, max(x) AS xmax,
             min(y) AS ymin, max(y) AS ymax FROM v GROUP BY poly_id),
r AS (SELECT poly_id,
  least(greatest(CAST(floor(xmin / 31.25) AS BIGINT), 0), 31) AS tx0,
  least(greatest(CAST(floor(xmax / 31.25) AS BIGINT), 0), 31) AS tx1,
  least(greatest(CAST(floor(ymin / 31.25) AS BIGINT), 0), 31) AS ty0,
  least(greatest(CAST(floor(ymax / 31.25) AS BIGINT), 0), 31) AS ty1 FROM b),
g AS (SELECT poly_id, gx.tx AS tx, gy.ty AS ty FROM r,
      unnest(generate_series(tx0, tx1)) AS gx(tx),
      unnest(generate_series(ty0, ty1)) AS gy(ty)),
{morton_sql_ctes("g", "tx", "ty")}
SELECT poly_id, tile_id FROM m5
""",
        "idw": f"""
WITH h AS ({_halos_cte()}),
p AS (SELECT o_orderkey AS particle_id, {sql_coord("o_orderkey", 0)} AS x,
             {sql_coord("o_orderkey", 1)} AS y, {sql_coord("o_orderkey", 2)} AS z,
             o_orderkey % 97 AS v FROM orders),
j AS (SELECT h.halo_id, p.v, {_D2} AS d2 FROM h, p),
f AS (SELECT * FROM j WHERE d2 < 2500.0),
w AS (SELECT halo_id, v, (d2 = 0.0) AS ex,
             CASE WHEN d2 = 0.0 THEN NULL
                  ELSE CAST(floor(least(1073741824.0 / d2,
                                        4.611686018427387904e18)) AS BIGINT)
             END AS wq
      FROM f),
a AS (SELECT halo_id, count(*) AS nn,
             sum(CASE WHEN ex THEN 1 ELSE 0 END) AS nx,
             sum(CASE WHEN ex THEN v END) AS vx,
             sum(CASE WHEN NOT ex THEN CAST(wq AS HUGEINT) END) AS den,
             sum(CASE WHEN NOT ex THEN CAST(wq AS HUGEINT) * v END) AS num
      FROM w GROUP BY halo_id)
SELECT halo_id, CAST(nn AS BIGINT) AS n_neighbors,
       CAST(CASE WHEN nx > 0
                 THEN floor((CAST(vx AS DOUBLE) / CAST(nx AS DOUBLE)) * 1024.0)
                 ELSE floor((CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) * 1024.0)
            END AS BIGINT) AS idw_q
FROM a
""",
        "box_join": f"""
WITH ra AS (SELECT o_orderkey AS a_id,
                   {sql_coord("o_orderkey", 0)} AS _x0,
                   {sql_coord("o_orderkey", 1)} AS _y0,
                   ((o_orderkey * {KEY_CONSTS[2]}) % 2560) / 64.0 AS _w,
                   (((o_orderkey * {KEY_CONSTS[2]}) // 2560) % 2560) / 64.0 AS _h
            FROM orders),
a AS (SELECT a_id, _x0 AS xmin, _x0 + _w AS xmax,
             _y0 AS ymin, _y0 + _h AS ymax FROM ra),
rb AS (SELECT c_custkey AS b_id,
                   {sql_coord("c_custkey", 0)} AS _x0,
                   {sql_coord("c_custkey", 1)} AS _y0,
                   ((c_custkey * {KEY_CONSTS[2]}) % 2560) / 64.0 AS _w,
                   (((c_custkey * {KEY_CONSTS[2]}) // 2560) % 2560) / 64.0 AS _h
            FROM customer),
b AS (SELECT b_id, _x0 AS xmin, _x0 + _w AS xmax,
             _y0 AS ymin, _y0 + _h AS ymax FROM rb)
SELECT a.a_id, b.b_id,
       CAST((least(a.xmax, b.xmax) - greatest(a.xmin, b.xmin))
          * (least(a.ymax, b.ymax) - greatest(a.ymin, b.ymin))
          * 4096.0 AS BIGINT) AS ix_area_q12
FROM a, b
WHERE a.xmin <= b.xmax AND b.xmin <= a.xmax
  AND a.ymin <= b.ymax AND b.ymin <= a.ymax
""",
        "dedup_exact": """
SELECT CAST(min(doc_id) AS BIGINT) AS canonical_id, count(*) AS n_copies
FROM documents GROUP BY text
""",
        "text_stats": f"""
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
       CAST({tokens} AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text,
            '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r]+|[ \t\n\r]+'
       )) AS BIGINT) AS n_tokens_bpe,
       CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces,
       CAST(length(text) - length(replace(text, ',', '')) AS BIGINT) AS n_commas
FROM documents
""",
        "quality_score": f"""
SELECT doc_id, CAST(floor(least((1000 * CAST({tokens} AS BIGINT)) / (CAST(length(text) AS BIGINT) + 1), 1000.0)) AS BIGINT) AS quality_1000
FROM documents
""",
        "lang_guess": f"SELECT doc_id, {lang_case} AS lang_pred FROM documents",
        "ngram_jaccard": f"""
WITH {_shingle_cte(8, max_df=256)},
sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(floor((1000 * n_inter) / (sa.n_sh + sb.n_sh - n_inter)) AS BIGINT) AS jac_1000
FROM inter
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE CAST(floor((1000 * n_inter) / (sa.n_sh + sb.n_sh - n_inter)) AS BIGINT) >= 200
""",
        "ann_l2": """
WITH pr AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         unnest(a.embedding) AS ea, unnest(b.embedding) AS eb
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
d AS (
  SELECT query_id, neighbor_id,
         CAST(sum(CAST((floor(ea * 1024.0) - floor(eb * 1024.0))
                     * (floor(ea * 1024.0) - floor(eb * 1024.0)) AS BIGINT)) AS BIGINT) AS qd2
  FROM pr GROUP BY query_id, neighbor_id
)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY qd2, neighbor_id) AS INTEGER) AS rank,
       qd2
FROM d QUALIFY rank <= 3
""",
        "event_window": """
SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket, event_type, count(*) AS n
FROM events GROUP BY bucket, event_type
""",
        "event_sessions": """
WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
                  CAST(floor(value * 1024.0) AS BIGINT) AS vq FROM events),
l AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
             AS prev FROM e),
f AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 28800000000
                     THEN 1 ELSE 0 END AS new_s FROM l),
s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_ord
      FROM f)
SELECT user_id, CAST(session_ord AS BIGINT) AS session_ord,
       count(*) AS n_events,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
       min(us) AS start_us, max(us) - min(us) AS dur_us,
       CAST(sum(vq) AS BIGINT) AS value_q10
FROM s GROUP BY user_id, session_ord
""",
        "event_funnel": """
WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type AS et FROM events),
s0 AS (SELECT user_id, min(us) AS t FROM e WHERE et = 'view' GROUP BY user_id),
s1 AS (SELECT e.user_id, min(e.us) AS t FROM e JOIN s0 ON e.user_id = s0.user_id
       WHERE e.et = 'click' AND e.us > s0.t GROUP BY e.user_id),
s2 AS (SELECT e.user_id, min(e.us) AS t FROM e JOIN s1 ON e.user_id = s1.user_id
       WHERE e.et = 'purchase' AND e.us > s1.t GROUP BY e.user_id),
c AS (SELECT CAST(0 AS INTEGER) AS step_idx, 'view' AS step, count(*) AS n FROM s0
      UNION ALL SELECT 1, 'click', count(*) FROM s1
      UNION ALL SELECT 2, 'purchase', count(*) FROM s2),
b AS (SELECT n AS base FROM c WHERE step_idx = 0)
SELECT step_idx, step, CAST(n AS BIGINT) AS n_users,
       CAST(CASE WHEN base > 0 THEN (n * 1000000) // base ELSE 0 END
            AS BIGINT) AS conv_ppm
FROM c, b
""",
        "event_retention": """
WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
f AS (SELECT user_id, CAST(floor(min(us) / 86400000000) AS BIGINT)
             AS cohort_day FROM e GROUP BY user_id),
j AS (SELECT e.user_id, f.cohort_day,
             CAST(floor(e.us / 86400000000) AS BIGINT) - f.cohort_day
             AS day_offset
      FROM e JOIN f ON e.user_id = f.user_id)
SELECT cohort_day, day_offset,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM j WHERE day_offset >= 0 GROUP BY cohort_day, day_offset
""",
        "event_asof": """
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                  CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS tag
           FROM events WHERE event_type IN ('click', 'purchase')),
w AS (SELECT user_id, event_id, us, tag,
        last_value(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY us, tag, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rid,
        last_value(CASE WHEN tag = 0 THEN us END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY us, tag, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rus
      FROM e),
k AS (SELECT user_id, event_id, us,
        CASE WHEN rus IS NOT NULL AND us - rus <= 3600000000
             THEN rid END AS rid,
        CASE WHEN rus IS NOT NULL AND us - rus <= 3600000000
             THEN rus END AS rus
      FROM w WHERE tag = 1)
SELECT user_id, event_id, us AS ts_us,
       COALESCE(rid, -1) AS match_id,
       COALESCE(rus, -1) AS match_ts_us,
       COALESCE(us - rus, -1) AS lag_us
FROM k
""",
        "event_attribution": """
WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events),
l AS (SELECT user_id, us AS lus, event_id AS l_event_id FROM e
      WHERE event_type = 'click'),
r AS (SELECT user_id, us AS rus, event_id AS r_event_id FROM e
      WHERE event_type = 'purchase')
SELECT l.user_id, l_event_id, r_event_id, rus - lus AS dt_us
FROM l JOIN r ON l.user_id = r.user_id
WHERE rus >= lus AND rus <= lus + 14400000000
""",
        "sjcs_images": _sjcs_images_f32_sql(),
        "sjcs_images_f64": _sjcs_images_f64_sql(),
        "image_roundtrip": _image_roundtrip_sql(),
        "image_features": _image_features_sql(),
        "image_quality": _image_quality_sql(),
        "image_augment": _image_augment_sql(),
        "image_knn_hist": _image_knn_hist_sql(),
        "geo_tile_features": f"""
WITH feats AS ({_image_features_sql(256, 14)}),
{_phash_cte("pp", 256, 14)},
pos AS (SELECT {_img_id_sql("id")} AS image_id, x, y FROM pp),
b AS (SELECT f.*, least(greatest(CAST(floor(p.x / 125.0) AS BIGINT), 0), 7) AS tx,
      least(greatest(CAST(floor(p.y / 125.0) AS BIGINT), 0), 7) AS ty
      FROM feats f JOIN pos p USING (image_id)),
{morton_sql_ctes("b", "tx", "ty")}
SELECT tile_id, CAST(count(*) AS BIGINT) AS n_images,
  CAST(sum(mean_r) AS BIGINT) AS sum_mean_r,
  CAST(sum(mean_g) AS BIGINT) AS sum_mean_g,
  CAST(sum(mean_b) AS BIGINT) AS sum_mean_b,
  CAST(sum(std_luma) AS BIGINT) AS sum_std_luma
FROM m5 GROUP BY tile_id
""",
        "video_frames": _video_frames_sql(),
        "audio_stats": _audio_stats_sql(),
        "image_tiles": _image_tiles_sql(),
        "minhash_lsh": _minhash_lsh_sql(),
        "dedup_clusters": _dedup_clusters_sql(),
        "pagerank": _pagerank_sql(),
        "corpus_clean": _corpus_clean_sql(tokens, lang_case),
        "corpus_clean_stats": _corpus_clean_stats_sql(tokens, lang_case),
        "doc_chunks": _doc_chunks_sql(),
        "corpus_sample": _corpus_sample_sql(lang_case),
        "decontaminate": """
WITH sh0 AS (SELECT DISTINCT doc_id, substr(text, u, 8) AS shingle
  FROM (SELECT doc_id, text,
        unnest(generate_series(1, greatest(length(text) - 7, 1))) AS u
        FROM documents)),
bsh AS (SELECT DISTINCT shingle FROM sh0 WHERE doc_id % 20 = 7),
hits AS (SELECT doc_id, count(*) AS n_hit FROM sh0 JOIN bsh USING (shingle)
         WHERE sh0.doc_id % 20 <> 7 GROUP BY doc_id)
SELECT d.doc_id,
       CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit_shingles,
       CAST(CASE WHEN coalesce(h.n_hit, 0) >= 128 THEN 1 ELSE 0 END AS INT) AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % 20 <> 7
""",
        "repetition_stats": """
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (
  SELECT doc_id, 'w' AS kind, unnest(w) AS gram FROM ws
  UNION ALL
  SELECT doc_id, 'b' AS kind,
         unnest(list_transform(generate_series(1, len(w) - 1),
                               i -> w[i] || ' ' || w[i + 1])) AS gram
  FROM ws WHERE len(w) >= 2
),
c AS (SELECT doc_id, kind, gram, count(*) AS cnt FROM g GROUP BY 1, 2, 3),
p AS (SELECT doc_id,
  sum(CASE WHEN kind = 'w' THEN cnt END) AS n_words,
  sum(CASE WHEN kind = 'w' THEN 1 END) AS n_distinct_words,
  max(CASE WHEN kind = 'w' THEN cnt END) AS max_w,
  sum(CASE WHEN kind = 'w' AND cnt > 1 THEN cnt ELSE 0 END) AS dup_w,
  sum(CASE WHEN kind = 'b' THEN cnt END) AS n_bi,
  max(CASE WHEN kind = 'b' THEN cnt END) AS max_b
  FROM c GROUP BY 1)
SELECT doc_id,
  CAST(n_words AS BIGINT) AS n_words,
  CAST(n_distinct_words AS BIGINT) AS n_distinct_words,
  CAST((1000 * dup_w) // n_words AS BIGINT) AS dup_word_frac_q,
  CAST((1000 * max_w) // n_words AS BIGINT) AS top_word_frac_q,
  CAST(CASE WHEN n_bi IS NULL THEN 0 ELSE (1000 * max_b) // n_bi END AS BIGINT) AS top_bigram_frac_q
FROM p
""",
        "pii_scrub": _pii_scrub_sql(),
        "dup_spans": _dup_spans_sql(k=24),
        "token_topk": """
WITH toks AS (SELECT lang, doc_id,
    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       t -> t <> '')) AS token
  FROM documents),
c AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS n_occurrences,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM toks GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY lang
        ORDER BY n_occurrences DESC, token ASC) AS rk FROM c)
SELECT lang, CAST(rk AS INTEGER) AS rank, token, n_occurrences, n_docs
FROM r WHERE rk <= 16
""",
        "split_assign": f"""
WITH h AS (SELECT doc_id,
    ({affine_sql(poly_hash_duck("source"), 113)} % 1000000) AS hv
  FROM documents)
SELECT doc_id,
  CASE WHEN hv < 800000 THEN 'train'
       WHEN hv < 900000 THEN 'val'
       ELSE 'test' END AS split
FROM h
""",
        "pack_sequences": f"""
WITH t AS (SELECT doc_id, CAST({tokens} AS BIGINT) AS n_tokens FROM documents),
o AS (SELECT doc_id, n_tokens,
      CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        AS tok_offset
      FROM t)
SELECT doc_id, n_tokens, tok_offset,
  CAST(tok_offset // 512 AS BIGINT) AS seq_id,
  CAST(tok_offset % 512 AS BIGINT) AS seq_pos,
  CAST((tok_offset + greatest(n_tokens, 1) - 1) // 512
       - tok_offset // 512 + 1 AS BIGINT) AS n_seq_spans
FROM o
""",
        "simhash": _simhash_sql(),
        "simhash_pairs": _simhash_pairs_sql(),
        "phash_near_dup": _phash_near_dup_sql(),
        "image_dedup_clusters": _image_dedup_clusters_sql(),
        "crossmodal_dup": _crossmodal_dup_sql(),
        "doc_fingerprint": _doc_fingerprint_sql(),
        "ann_cosine": _ann_cosine_sql(),
        "embed_lsh_pairs": _embed_lsh_sql(),
        "ann_l2_lsh": _ann_l2_lsh_sql(),
        "ann_ivf": _ann_ivf_sql(),
        "cosine_dedup": _cosine_dedup_sql(),
        "embed_dedup_clusters": _embed_dedup_clusters_sql(),
        "dbscan": _dbscan_sql(),
        "kmeans_embed": _kmeans_sql(),
        "semantic_dedup": _semantic_dedup_sql(),
        "bm25": _bm25_sql(),
        "pq_encode": _pq_sql(),
        "pq_ann": _pq_ann_sql(),
        "kmv_distinct": _kmv_sql(),
        "tile_distinct": _tile_distinct_sql(),
        "countmin": _countmin_sql(),
        "lm_familiarity": _lm_familiarity_sql(),
        "rolling_features": """
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                  CAST(floor(coalesce(value, 0) * 1024) AS BIGINT) AS vq
           FROM events)
SELECT user_id, event_id, ts_us,
  CAST(count(*) OVER w1 AS BIGINT) AS n_3600s,
  CAST(sum(vq) OVER w1 AS BIGINT) AS vq_3600s,
  CAST(count(*) OVER w2 AS BIGINT) AS n_86400s,
  CAST(sum(vq) OVER w2 AS BIGINT) AS vq_86400s
FROM e
WINDOW w1 AS (PARTITION BY user_id ORDER BY ts_us
              RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW),
       w2 AS (PARTITION BY user_id ORDER BY ts_us
              RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
""",
        "bloom_filter": _bloom_filter_sql(),
        "bloom_probe": _bloom_probe_sql(),
        "value_quantiles": """
WITH h AS (SELECT event_type,
        CAST(least(greatest(floor(value * 8.0), 0), 511) AS BIGINT) AS bin,
        CAST(count(*) AS BIGINT) AS cnt
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
c AS (SELECT event_type, bin, cnt,
        CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY bin)
             AS BIGINT) AS cum,
        CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS tot
      FROM h),
x AS (SELECT c.*, q.q_ppm FROM c,
      (VALUES (500000::BIGINT), (950000::BIGINT), (990000::BIGINT))
        q(q_ppm))
SELECT event_type, q_ppm, bin, cum AS n_le, tot AS n_total
FROM x
WHERE cum >= (q_ppm * tot + 999999) // 1000000
  AND cum - cnt < (q_ppm * tot + 999999) // 1000000
""",
        "geo_shells": f"""
WITH h AS ({_geo_cte("customer", "c_custkey", "probe_id")}),
p AS ({_geo_cte("orders", "o_orderkey", "point_id")}),
d AS (SELECT h.probe_id, {_GEO_D2} AS d2 FROM h, p)
SELECT probe_id, {_GEO_SHELL_CASE} AS shell_idx, count(*) AS cnt
FROM d WHERE d2 < {_GEO_C2[-1]!r} GROUP BY probe_id, shell_idx
""",
        "geo_nearest": f"""
WITH h AS ({_geo_cte("customer", "c_custkey", "row_id")}),
p AS ({_geo_cte("nation", "n_nationkey", "site_id")}),
d AS (SELECT h.row_id, p.site_id, CAST({_GEO_D2} AS BIGINT) AS d2,
      row_number() OVER (PARTITION BY h.row_id
                         ORDER BY {_GEO_D2}, p.site_id) AS rn
      FROM h, p)
SELECT row_id, site_id, d2 FROM d WHERE rn = 1
""",
        "geo_latlon_tiles": (
            "WITH g0 AS (SELECT p_partkey, "
            + "{} AS lat, {} AS lon FROM part),\n".format(*sql_latlon("p_partkey"))
            + morton_sql_ctes("g0", *geo_tile_sql("lat", "lon", 5))
            + "\nSELECT tile_id, count(*) AS n FROM m5 GROUP BY tile_id"
        ),
        "geo_knn": f"""
WITH h AS ({_geo_cte("supplier", "s_suppkey", "row_id")}),
p AS ({_geo_cte("orders", "o_orderkey", "neighbor_id")}),
d AS (SELECT h.row_id, p.neighbor_id, CAST({_GEO_D2} AS BIGINT) AS d2 FROM h, p)
SELECT row_id, neighbor_id,
       CAST(row_number() OVER (PARTITION BY row_id
                               ORDER BY d2, neighbor_id) AS INTEGER) AS rank,
       d2
FROM d QUALIFY rank <= 3
""",
        "geo_hotspots": f"""
WITH g AS (SELECT {sql_latlon("o_orderkey")[0]} AS lat,
                  {sql_latlon("o_orderkey")[1]} AS lon FROM orders),
p AS (SELECT {geo_equirect_sql("lat", "lon", 1000.0)[0]} AS x,
             {geo_equirect_sql("lat", "lon", 1000.0)[1]} AS y FROM g),
t AS (SELECT least(greatest(CAST(floor(x / 31.25) AS BIGINT), 0), 31) AS tx,
             least(greatest(CAST(floor(y / 31.25) AS BIGINT), 0), 31) AS ty FROM p),
tcnt AS (SELECT tx, ty, count(*) AS n FROM t GROUP BY tx, ty),
offs AS (SELECT gx.a AS dx, gy.b AS dy
         FROM unnest(generate_series(-1, 1)) AS gx(a),
              unnest(generate_series(-1, 1)) AS gy(b)),
scat AS (SELECT tx + dx AS rx, ty + dy AS ry, n,
                CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END AS own
         FROM tcnt, offs
         WHERE tx + dx BETWEEN 0 AND 31 AND ty + dy BETWEEN 0 AND 31),
cell AS (SELECT rx, ry, sum(own * n) AS cx, sum((1 - own) * n) AS cr
         FROM scat GROUP BY rx, ry),
cm AS (SELECT rx, ry, cx, cr,
              (least(rx + 1, 31) - greatest(rx - 1, 0) + 1)
            * (least(ry + 1, 31) - greatest(ry - 1, 0) + 1) AS w FROM cell),
tot AS (SELECT CAST(sum(cx) AS HUGEINT) AS s,
               sum(CAST(cx AS HUGEINT) * CAST(cx AS HUGEINT)) AS s2 FROM cell),
{morton_sql_ctes("cm", "rx", "ry", out="gh")},
g2 AS (SELECT tile_id, cx, cr, w,
             CAST(1024 AS HUGEINT) * (CAST(cx AS HUGEINT) + CAST(cr AS HUGEINT))
               - tot.s * CAST(w AS HUGEINT) AS a,
             CAST(1024 AS HUGEINT) * tot.s2 - tot.s * tot.s AS b,
             CAST(1024 AS HUGEINT) * CAST(w AS HUGEINT)
               - CAST(w AS HUGEINT) * CAST(w AS HUGEINT) AS c
      FROM gh5, tot)
SELECT tile_id, CAST(cx AS BIGINT) AS n_points,
       CAST(cx + cr AS BIGINT) AS ring_sum, CAST(w AS BIGINT) AS w,
       CAST(floor((CAST(a AS DOUBLE)
                   / sqrt(CAST(b AS DOUBLE) * CAST(c AS DOUBLE) / 1023.0))
                  * 1048576.0) AS BIGINT) AS gi_q20
FROM g2
""",
        "geo_hex": f"""
WITH g AS (SELECT {sql_latlon("o_orderkey")[0]} AS lat,
                  {sql_latlon("o_orderkey")[1]} AS lon FROM orders),
p AS (SELECT {geo_equirect_sql("lat", "lon", 1000.0)[0]} AS x,
             {geo_equirect_sql("lat", "lon", 1000.0)[1]} AS y FROM g),
{hex_axial_ctes("p", "x", "y", 31.25)},
hc AS (SELECT hq, hr, count(*) AS n FROM hx2 GROUP BY hq, hr),
offs(dq, dr) AS (VALUES {", ".join(f"({a}, {b})" for a, b in hex_ring_offsets(1))}),
scat AS (SELECT hq + dq AS rq, hr + dr AS rr, n,
                CASE WHEN dq = 0 AND dr = 0 THEN 1 ELSE 0 END AS own
         FROM hc, offs),
g2 AS (SELECT rq, rr, sum(own * n) AS n_points, sum(n) AS kring_sum,
              count(*) AS n_kring_cells, max(own) AS occ
       FROM scat GROUP BY rq, rr)
SELECT rq AS hq, rr AS hr, CAST(n_points AS BIGINT) AS n_points,
       CAST(kring_sum AS BIGINT) AS kring_sum,
       CAST(n_kring_cells AS BIGINT) AS n_kring_cells
FROM g2 WHERE occ = 1
""",
        "trajectory": f"""
WITH src AS (SELECT user_id, ts, event_id,
                    {sql_latlon("event_id")[0]} AS lat,
                    {sql_latlon("event_id")[1]} AS lon FROM events),
u AS (SELECT user_id, ts, event_id,
             {geo_unit_sql("lat", "lon")[0]} AS qx,
             {geo_unit_sql("lat", "lon")[1]} AS qy,
             {geo_unit_sql("lat", "lon")[2]} AS qz FROM src),
h AS (SELECT user_id,
             floor(sqrt(((qx - lag(qx) OVER w) * (qx - lag(qx) OVER w)
                         + (qy - lag(qy) OVER w) * (qy - lag(qy) OVER w))
                        + (qz - lag(qz) OVER w) * (qz - lag(qz) OVER w)))
               AS hop
      FROM u WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, count(*) AS n_pings,
       CAST(coalesce(sum(hop), 0) AS BIGINT) AS path_len,
       CAST(coalesce(max(hop), 0) AS BIGINT) AS max_hop,
       count(hop) AS n_moves,
       CAST(coalesce(sum(CASE WHEN hop < 1000 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_stays
FROM h GROUP BY user_id
""",
    }
