"""Similarity search over embedding columns (array<float>).

* ann_l2_topk      — exact top-k by L2 on quantized-integer vectors;
                     all math is exact int64, so an ANSI-SQL oracle
                     matches bit-for-bit.  Brute force (the baseline).
* ann_cosine_topk  — brute-force cosine top-k via an Arrow matmul
                     kernel against a broadcast query matrix (the
                     vectorized scale path for a moderate query set).
* lsh_cosine_pairs — random-hyperplane (SimHash) bucketed candidate
                     pairs: the scale path for all-pairs near-dup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.synth import splitmix64


def _quant(col, scale: int):
    # floor(x * scale) in float64: IEEE-identical across engines
    return F.floor(col.cast("double") * F.lit(float(scale))).cast("long")


def ann_l2_topk(
    emb: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant_scale: int = 1024,
    queries: DataFrame | None = None,
) -> DataFrame:
    """-> (query_id, neighbor_id, rank, qd2) exact integer L2 top-k.

    Vectors are quantized per element to floor(x*scale) (int64); the
    squared distance is then exact integer arithmetic.  Ties break by
    neighbor id.  O(n^2) by design — the correctness baseline the LSH
    path is validated against.

    Execution: the neighbor matrix is broadcast (numpy int-quantized)
    and each Arrow batch of queries computes a distance BLOCK via
    ||a||^2 + ||b||^2 - 2ab float64 matmul — exact because quantized
    magnitudes keep every intermediate < 2^53 (values <= scale, dims
    bounded), so the float64 arithmetic is integer-exact.  ~100x the
    zip_with/aggregate Catalyst formulation, same bit-exact result.
    Per-batch top-k partials are re-ranked by one final window.
    """
    npart = emb.sparkSession.sparkContext.defaultParallelism
    neigh = emb.select(id_col, vec_col).toPandas()
    N = np.floor(np.stack(neigh[vec_col].to_numpy()).astype(np.float64) * quant_scale)
    nids = neigh[id_col].to_numpy(np.int64)
    dim = N.shape[1]
    assert quant_scale**2 * dim < 2**52, "quantized math would lose exactness"
    n2 = (N * N).sum(axis=1)  # exact: <= dim * scale^2

    def op(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = np.floor(
                np.stack(pdf[vec_col].to_numpy()).astype(np.float64) * quant_scale
            )
            qids = pdf[id_col].to_numpy(np.int64)
            q2 = (Q * Q).sum(axis=1)
            d2 = q2[:, None] + n2[None, :] - 2.0 * (Q @ N.T)  # exact int in f64
            d2[qids[:, None] == nids[None, :]] = np.inf  # self-match out
            # keep EVERYTHING within the kth-smallest distance per row —
            # boundary ties included, so the final (qd2, neighbor_id)
            # window sees every candidate it might rank into the top-k
            kk = min(k, d2.shape[1]) - 1
            thresh = np.partition(d2, kk, axis=1)[:, kk]
            ri, ci = np.nonzero(d2 <= thresh[:, None])
            vals = d2[ri, ci]
            fin = np.isfinite(vals)
            yield pd.DataFrame(
                {
                    "query_id": qids[ri[fin]],
                    "neighbor_id": nids[ci[fin]],
                    "qd2": vals[fin].astype(np.int64),
                }
            )

    src = (queries or emb).select(id_col, vec_col)
    partials = src.repartition(npart).mapInPandas(
        op, schema="query_id long, neighbor_id long, qd2 long"
    )
    w = Window.partitionBy("query_id").orderBy("qd2", "neighbor_id")
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "qd2")
    )


def ann_cosine_topk(
    emb: DataFrame,
    queries_pdf: pd.DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k of a broadcast query set vs the table.

    queries_pdf: pandas (id, vector) — small enough to broadcast.
    The kernel is one numpy matmul per Arrow batch (no per-row Python);
    per-batch top-k partials are reduced by a final window.
    -> (query_id, neighbor_id, rank, sim_1e6)
    """
    Q = np.stack(queries_pdf[vec_col].to_numpy()).astype(np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-30)
    qids = queries_pdf[id_col].to_numpy(np.int64)

    def op(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
            sims = Qn @ Xn.T  # (nq, nb)
            nids = pdf[id_col].to_numpy(np.int64)
            # mask self-matches BEFORE top-k so they don't eat a slot
            sims[qids[:, None] == nids[None, :]] = -np.inf
            kk = min(k, sims.shape[1])
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            out = {
                "query_id": np.repeat(qids, kk),
                "neighbor_id": nids[idx].ravel(),
                "sim_1e6": np.floor(
                    sims[np.arange(len(qids))[:, None], idx] * 1e6
                ).astype(np.int64).ravel(),
            }
            yield pd.DataFrame(out)

    partials = emb.select(id_col, vec_col).mapInPandas(
        op, schema="query_id long, neighbor_id long, sim_1e6 long"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim_1e6"), F.col("neighbor_id")
    )
    return (
        partials.where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def lsh_cosine_pairs(
    emb: DataFrame,
    n_planes: int = 16,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Random-hyperplane LSH buckets -> candidate pairs (doc_a, doc_b).

    Bucket key = sign-bit signature against n_planes deterministic
    (splitmix64-seeded) hyperplanes, computed in one Arrow kernel.
    Pairs sharing a bucket are near-duplicate candidates; verify with
    exact cosine downstream.
    """
    def planes_for(d: int) -> np.ndarray:
        raw = splitmix64(
            np.arange(n_planes * d, dtype=np.uint64) + np.uint64(seed * 0x9E3779B9)
        )
        # uniform in [-1, 1): enough for sign-hash purposes
        return (raw.astype(np.float64) / 2**63 - 1.0).reshape(n_planes, d)

    def op(batches):
        P = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if P is None:
                P = planes_for(X.shape[1])
            bits = (X @ P.T) > 0  # (n, planes)
            key = np.zeros(len(X), dtype=np.int64)
            for b in range(n_planes):
                key |= bits[:, b].astype(np.int64) << b
            yield pd.DataFrame(
                {"vid": pdf[id_col].to_numpy(np.int64), "bucket": key}
            )

    buckets = emb.select(id_col, vec_col).mapInPandas(
        op, schema="vid long, bucket long"
    )
    l = buckets.select(F.col("vid").alias("doc_a"), "bucket")
    r = buckets.select(F.col("vid").alias("doc_b"), "bucket")
    return (
        l.join(r, "bucket")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
