"""Mergeable aggregation sketches with deterministic, oracle-checkable
semantics.

Classic streaming sketches (HLL, theta) rely on engine-specific hashes
and float registers, so no cross-engine gate can check them.  These
variants keep the sketch *property* — bounded per-group state, merge =
set-union-then-shrink, one-pass — while every step is exact int64 on
the shared SQL-derivable hash family (``functions/texthash.py``), so
DuckDB reproduces them bit-for-bit.

* kmv_distinct — K-Minimum-Values distinct-count estimator
  (Bar-Yossef et al. 2002; Beyer et al. 2007 "On synopses for
  distinct-value estimation under multiset operations").
* countmin_sketch / countmin_estimate — Count-Min frequency sketch
  (Cormode & Muthukrishnan 2005): a d x w counter grid + point
  queries that never undercount.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.texthash import P, affine_sql

__all__ = ["kmv_distinct", "kmv_hash_sql", "countmin_sketch",
           "countmin_estimate"]


def kmv_hash_sql(value: str) -> str:
    """The KMV hash as SQL text valid in BOTH Spark and DuckDB: the
    shared affine stream 0 over the value folded into [0, P)."""
    return affine_sql(f"(((CAST({value} AS BIGINT) % {P}) + {P}) % {P})", 0)


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value: str,
    k: int = 64,
) -> DataFrame:
    """KMV distinct-count sketch per group -> (group_cols..., n_kept
    int, kth_hash long, est_distinct long).

    The sketch keeps the k smallest DISTINCT hash values of `value`
    (a SQL expression) per group; with fewer than k distinct hashes
    the count is exact, otherwise the k-th smallest hash h_k yields
    the unbiased-family estimate

        est = ((k - 1) * P) DIV h_k

    (relative error ~ 1/sqrt(k)).  Hash collisions under-count like
    in any KMV — estimator semantics, deterministic either way.
    Merging two groups' sketches = union the hash sets, re-take the k
    smallest — exactly what the groupBy computes, which is why the
    result is partition- and order-independent.

    Scale shape: the (group, hash) dedup is a partial-aggregated
    groupBy — map-side combine collapses repeats before the shuffle,
    so shuffle volume is per-partition-distinct, not row count; the
    window then ranks within the same hash-partitioning (no second
    shuffle) and everything past rank k is dropped before the final
    tiny agg.  For groups whose DISTINCT cardinality itself is too
    large to shuffle, cap per-partition state first with a
    mapInPandas min-k pass — the merge rule above makes that refine,
    not change, the result.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    h = F.expr(kmv_hash_sql(value))
    dh = (
        df.select(*group_cols, h.alias("_h"))
        .groupBy(*group_cols, "_h")
        .agg(F.count(F.lit(1)).alias("_n"))
        .drop("_n")
    )
    w = Window.partitionBy(*group_cols).orderBy("_h")
    ranked = dh.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= k
    )
    agg = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("int").alias("n_kept"),
        F.max("_h").alias("kth_hash"),
    )
    # (k-1)*P precomputed: as a SQL literal int*int would overflow int32
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("long")
    ).otherwise(F.expr(f"{(k - 1) * P} DIV kth_hash"))
    return agg.select(*group_cols, "n_kept", "kth_hash",
                      est.alias("est_distinct"))


def countmin_sketch(
    values: DataFrame,
    value_col: str,
    d: int = 4,
    w: int = 512,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of a stream of
    string values -> the full counter grid (row int, bucket long, cnt
    long), at most d*w rows regardless of input size.

    Row i's bucket for value v is h_i(base(v)) % w on the shared
    poly+affine hash family, so the sketch is identical in DuckDB.
    Counters are plain sums — the sketch merges by adding grids, and
    the groupBy's map-side combine means shuffle volume is bounded by
    d*w per partition, the textbook bounded-state shape.
    """
    from ..functions.texthash import poly_hash_spark

    base = poly_hash_spark(value_col)
    rows = [
        F.struct(
            F.lit(i).alias("row"),
            F.expr(f"{affine_sql(base, i)} % {w}").alias("bucket"),
        )
        for i in range(d)
    ]
    return (
        values.select(F.explode(F.array(*rows)).alias("_rb"))
        .select("_rb.row", "_rb.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    query_col: str = "term",
    d: int = 4,
    w: int = 512,
) -> DataFrame:
    """Point-query the Count-Min grid -> (query_col, est_count long).

    est = min over rows i of counter[i, h_i(q) % w]; counters the
    query never incremented read 0 (missing grid cells coalesce).
    Guarantees est >= true count, with overshoot ~ n/w per row whp —
    pinned by test_countmin_never_undercounts.

    Scale shape: the sketch is <= d*w rows — broadcast; queries flow
    through one broadcast join per hash row and a per-query min agg.
    """
    from ..functions.texthash import poly_hash_spark

    base = poly_hash_spark(query_col)
    rows = [
        F.struct(
            F.lit(i).alias("row"),
            F.expr(f"{affine_sql(base, i)} % {w}").alias("bucket"),
        )
        for i in range(d)
    ]
    probes = queries.select(
        F.col(query_col), F.explode(F.array(*rows)).alias("_rb")
    ).select(query_col, "_rb.row", "_rb.bucket")
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(query_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0).cast("long"))).alias("est_count"))
    )
