"""sjcs_spark — a from-scratch PySpark-native spatial analytics engine.

Re-implements the query semantics of ryumt/SpatialJoinCountOverShells
(reference at /root/reference, C + SSE4.2 + pthreads) as an idiomatic
Spark DataFrame library:

* count-over-shells distance-band spatial join (J1) with periodic
  boundary conditions (J2) on the cube [0, box)^3,
* pair-emitting range join (J3), halo semi-join filter (J4),
* grid-cell (H3/S2-style) indexing replacing the reference's
  ArraySTR / Guttman R-tree (X1/X2),
* kNN via iterative cell-ring widening, point-in-polygon tile
  assignment, raster<->vector tiling (graft scope),
* S2-style quadtree Z-order (Morton) tiles: encode / parent /
  children / multi-resolution rollup / bbox covering, plus a
  Z-order-clustered table layout (plans/pipeline.py:cluster_by_tile),
* auto-correlation pair counts DD(r) (shell_count self-joined),
* geodetic lat/lon operators (operators/geo.py): great-circle
  count-over-shells / kNN / nearest-site on a quantized unit-sphere
  chord lattice (the unchanged spatial kernels run on transformed
  coordinates), equirectangular slippy tiles on the Morton hierarchy,
  and the equirect bridge that runs every planar tile operator on
  geo-tagged rows — with streaming twins (stream_geo_tile_counts,
  stream_geo_shell_counts, stateful stream_trajectory_stats),
* hexagonal H3-style lattice (operators/hexgrid.py): axial hex cells
  via cube rounding, hex rollup / k-ring / DBSCAN, base-32 geohash
  strings on the Morton spread-bits machinery, and per-user
  great-circle trajectory statistics (trajectory_stats),
* dedup / similarity / text-analysis operators for training-data
  pipelines, incl. perceptual-hash near-dup pairs on the images table,
  connected-component clustering of near-dup pairs (dedup_clusters,
  pointer-jumping min-label propagation), the composed corpus_clean
  survivor pipeline + its corpus_clean_stats drop funnel, benchmark
  decontamination (n-gram overlap vs an eval set) and Gopher-style
  repetition filters, and streaming near-dup flagging against a
  static corpus (streaming/stream_dedup.py).

Design notes: SURVEY.md §7.  All hot kernels are either pure Spark SQL
expressions (whole-stage codegen) or Arrow-batched pandas UDFs — no
per-row Python anywhere.
"""

from .session import get_spark
from .functions.shells import logspace_edges, squared_edges
from .functions.phash import decode_phash, encode_phash_np, decode_phash_np
from .operators.cells import grid_ncells, with_cell, explode_ring, ring_offsets
from .operators.shell_count import shell_count, range_join_pairs, shell_totals
from .operators.correlation import landy_szalay_xi
from .operators.semi_join import filter_halos
from .operators.knn import knn
from .operators.pip import point_in_polygon, polygon_edges
from .operators.tiling import (
    rasterize_points,
    image_tile_stats,
    morton_tile_expr,
    tile_rollup,
    tile_cover,
    tile_parent_expr,
    tile_children,
)
from .operators.images import (
    image_roundtrip_metrics,
    image_features,
    resize_nearest,
    phash_near_dup,
)
from .operators.media import sample_frames, frame_stats, audio_window_stats
from .operators.dedup import dedup_clusters, exact_dedup, minhash_lsh_pairs
from .operators.corpus import (
    corpus_clean,
    corpus_clean_stats,
    decontaminate,
    stratified_sample,
)
from .operators.text import chunk_documents, lm_familiarity, repetition_stats
from .operators.geo import (
    geo_knn,
    geo_nearest_site,
    geo_shell_count,
    geo_tile_expr,
    geo_tile_stats,
    trajectory_stats,
)
from .operators.hexgrid import (
    geohash_cells,
    geohash_expr,
    hex_dbscan,
    hex_kring_stats,
    hex_rollup,
    with_hex,
)
from .operators.similarity import (
    ann_l2_topk,
    ann_cosine_topk,
    ann_ivf_topk,
    ivf_candidates,
    cosine_dedup_pairs,
    lsh_cosine_pairs,
)
from .operators.clustering import (
    dbscan_points,
    lloyd_kmeans,
    semantic_dedup,
    pq_encode,
    pq_ann_topk,
)
from .operators.dedup import (
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
    hamming_pairs,
    dup_spans,
)
from .operators.sketches import (
    kmv_distinct,
    countmin_sketch,
    countmin_estimate,
    bloom_words,
    bloom_might_contain,
    hist_quantiles,
)
from .operators.graph import pagerank
from .operators.text import (
    quality_score,
    lang_guess,
    doc_fingerprint,
    pii_scrub,
    bm25_scores,
    token_topk,
)
from .operators.events import (
    sessionize,
    funnel,
    retention,
    asof_join,
    rolling_counts,
)
from .operators.corpus import pack_sequences, split_assign
from .operators.boxjoin import box_overlap_join

__all__ = [
    "dedup_clusters",
    "exact_dedup",
    "minhash_lsh_pairs",
    "corpus_clean",
    "corpus_clean_stats",
    "decontaminate",
    "stratified_sample",
    "chunk_documents",
    "repetition_stats",
    "get_spark",
    "logspace_edges",
    "squared_edges",
    "decode_phash",
    "encode_phash_np",
    "decode_phash_np",
    "grid_ncells",
    "with_cell",
    "explode_ring",
    "ring_offsets",
    "shell_count",
    "range_join_pairs",
    "shell_totals",
    "landy_szalay_xi",
    "filter_halos",
    "knn",
    "point_in_polygon",
    "polygon_edges",
    "rasterize_points",
    "image_tile_stats",
    "morton_tile_expr",
    "tile_rollup",
    "tile_cover",
    "tile_parent_expr",
    "tile_children",
    "image_roundtrip_metrics",
    "image_features",
    "resize_nearest",
    "phash_near_dup",
    "sample_frames",
    "frame_stats",
    "audio_window_stats",
    "geo_knn",
    "geo_nearest_site",
    "geo_shell_count",
    "geo_tile_expr",
    "geo_tile_stats",
    "trajectory_stats",
    "lm_familiarity",
    "geohash_cells",
    "geohash_expr",
    "hex_dbscan",
    "hex_kring_stats",
    "hex_rollup",
    "with_hex",
    "ann_l2_topk",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ivf_candidates",
    "cosine_dedup_pairs",
    "lsh_cosine_pairs",
    "dbscan_points",
    "lloyd_kmeans",
    "semantic_dedup",
    "pq_encode",
    "pq_ann_topk",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_pairs",
    "hamming_pairs",
    "dup_spans",
    "kmv_distinct",
    "countmin_sketch",
    "countmin_estimate",
    "bloom_words",
    "bloom_might_contain",
    "hist_quantiles",
    "pagerank",
    "quality_score",
    "lang_guess",
    "doc_fingerprint",
    "pii_scrub",
    "bm25_scores",
    "token_topk",
    "sessionize",
    "funnel",
    "retention",
    "asof_join",
    "rolling_counts",
    "pack_sequences",
    "split_assign",
    "box_overlap_join",
]

__version__ = "0.1.0"
