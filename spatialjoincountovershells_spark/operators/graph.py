"""Graph analytics over candidate-pair graphs.

The dedup operators emit pair EDGES (minhash-LSH, simhash, phash,
embedding-cosine); ``dedup.dedup_clusters`` already turns them into
connected components.  This module adds the other classic pair-graph
query — PageRank-style centrality — useful for picking the canonical
representative inside big near-dup families and for weighting
crawl-graph nodes in corpus curation.

Determinism contract (CLAUDE.md): fixed iteration count, all-integer
fixed-point arithmetic (no float sums — integer addition commutes, so
results are partition- and order-independent), which is what lets the
oracle unroll the same iterations as plain SQL CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    pairs: DataFrame,
    iters: int = 3,
    damping_pm: int = 850,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected pair graph ->
    (id_col, pr_q long), rank in parts-per-million fixed point.

    Each undirected pair contributes an edge BOTH ways; every node
    therefore has degree >= 1 (no dangling-mass term).  Ranks start at
    1,000,000 and iterate

        r'(v) = (1000 - damping_pm) * 1000
              + (damping_pm * sum_{u->v} (r(u) DIV deg(u))) DIV 1000

    for exactly `iters` rounds — all int64, every step exact, so the
    result is independent of partitioning and addition order and the
    DuckDB oracle can replay the same unrolled iterations.  (The DIVs
    shed sub-ppm mass deterministically; this is a ranking signal, not
    a probability distribution.)

    Scale shape: the classic Pregel-on-DataFrames loop — per round ONE
    shuffle join of the node-sized rank table onto the edge list (on
    the source key) and one map-side-combined groupBy on the
    destination; edges and degrees are PERSISTED before the loop, so
    the upstream pair pipeline (often a full LSH candidate generation)
    executes once, not once per round per reference (round-4 VERDICT:
    the unpersisted loop re-ran it ~2x per iteration).  `iters` is a
    plan-size constant (unrolled lineage), the right shape for the
    small fixed round counts centrality needs; for long walks,
    checkpoint between rounds like dedup_clusters does.  The persisted
    tables stay cached for the job's lifetime (same policy as
    dbscan_points' pair table, clustering.py) — edge/degree tables are
    node/edge-sized, orders smaller than the corpora they came from.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    base_pm = (1000 - int(damping_pm)) * 1000
    p = pairs.select(F.col(a_col).alias("s"), F.col(b_col).alias("d"))
    edges = p.unionAll(
        p.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).persist()
    deg = edges.groupBy("s").agg(F.count(F.lit(1)).alias("deg")).persist()
    ranks = deg.select(
        F.col("s").alias("id"), F.lit(1_000_000).cast("long").alias("r")
    )
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges["s"] == ranks["id"])
            .join(deg, "s")
            .select(F.col("d"), F.expr("r DIV deg").alias("_c"))
            .groupBy("d")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = contrib.select(
            F.col("d").alias("id"),
            (
                F.lit(base_pm)
                + F.expr(f"({int(damping_pm)} * _in) DIV 1000")
            )
            .cast("long")
            .alias("r"),
        )
    return ranks.select(F.col("id").alias(id_col), F.col("r").alias("pr_q"))
